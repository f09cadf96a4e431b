"""The flagship KG-construction pipeline (north-star, BASELINE.json).

    source_files ── extract ─▶ triples
        │ pass 1 (ONE scan): rule-relevant (subject,type) pairs
        │                    + optimistic link map — driver folds, no shuffle
        ▼
    CompiledMatcher (rules × index) ── ray.put ──▶ broadcast
        │ pass 2: pseudonymize as stateless tasks (fuses with extract
        ▼          upstream and canonicalize downstream into one task chain)
    canonicalize (broadcast {mention key → canonical})
        │
        ▼
    materialize: split dedup (shuffle only duplicate candidates) → Parquet

Two-pass structure mirrors the reference (index first so pass 2 is a pure
stream — docs/tutorial.md:13-16). The only materialization barriers are the
small driver-side folds and the optional per-stage checkpoints
(state/checkpoint.py manifests — what makes a rerun resume instead of
recompute). Physical-plan alternatives behind the same semantics:
``stages.pseudo.pseudonymize`` (actor pool), ``pseudonymize_join``
(hash-partitioned joins for indexes too big to broadcast), and the
``bucketed``/``sorted`` materialize layouts.

Default rules exercise all three reference rule kinds over the code KG:
repository URIs are sensitive nodes (``of_type``), author literals are
masked everywhere (``on_predicate``), and commit hashes are masked only on
File subjects (``on_type_predicate``).
"""

from __future__ import annotations

import os

from ..sources.synth import read_source_files
from ..stages.extract import NS, extract_triples
from ..stages.materialize import materialize
from ..stages.pseudo import broadcast_matcher, compile_matcher, pseudonymize_tasks

DEFAULT_RULES = {
    "nodes": {"of_type": [f"<{NS}Repository>"]},
    "objects": {
        "on_predicate": [f"<{NS}author>"],
        "on_type_predicate": {f"<{NS}File>": [f"<{NS}commitHash>"]},
    },
}

# Deterministic well-known salt for ORACLE/TEST FIXTURES ONLY (the DuckDB
# correctness oracle renders sha256(salt || value) with this literal). Real
# runs must not default to it: sha256 over a known salt is dictionary-
# reversible for low-entropy values — kg_pipeline defaults to a
# driver-generated random secret instead (salt=None).
DEFAULT_SALT = "tripsu-ray-default-salt"


def kg_pipeline(
    sf_dir: str,
    *,
    rules_cfg: dict | None = None,
    salt: str | None = None,
    algorithm: str = "sha256-salted",
    link: bool = True,
    sort: bool = True,
    output_path: str | None = None,
    checkpoint_dir: str | None = None,
    batch_size=None,
    stage_log=None,
    source_ds=None,
):
    """Run extract → index → pseudo → link → materialize; returns the final Dataset.

    ``source_ds`` overrides the corpus: any Dataset of SOURCE_FILES shape
    (a user's own ``read_parquet`` of a real corpus) instead of the
    ``sf_dir`` synth reader. Checkpoint lineage keys on ``sf_dir``, which
    an in-memory Dataset doesn't have — combine ``source_ds`` with
    ``checkpoint_dir`` only when ``sf_dir`` still identifies the input.

    With ``checkpoint_dir``, the triple stream is pinned to Parquet after
    extraction and after pseudonymization (per-partition files → resumable;
    see state/checkpoint.py), and the multi-consumer stages (index build,
    link-map build, final pass) re-read those checkpoints instead of
    re-executing upstream stages.
    """
    import ray
    import ray.data

    from ..functions.engine import node_rewrites_any_prefix
    from ..stages.folds import (
        fold_pass,
        fold_pass_compiled,
        relevant_types_of,
        risk_predicates_of,
    )
    from ..stages.link import LINKABLE_PREFIXES, canonicalize_tasks, fold_link_map
    from ..state.checkpoint import CheckpointManager
    from ..state.metrics import StageLog

    from ..functions.crypto import resolve_secret

    log = stage_log if stage_log is not None else StageLog()
    rules_cfg = DEFAULT_RULES if rules_cfg is None else rules_cfg
    salt = resolve_secret(salt)  # ONE secret for the whole distributed job
    ckpt = CheckpointManager(checkpoint_dir) if checkpoint_dir else None
    # Stage lineage params. NEVER the raw secret: manifests persist params
    # in cleartext on shared disk, and a per-run random secret would change
    # the lineage hash of even salt-independent stages, defeating resume.
    # A salt FINGERPRINT keys the salt-dependent stages instead; the
    # extract and fold stages carry only what they actually depend on.
    import hashlib as _hashlib

    _salt_bytes = salt.encode("utf-8") if isinstance(salt, str) else bytes(salt)
    salt_fp = _hashlib.sha256(_salt_bytes).hexdigest()[:16]
    extract_params = {"sf_dir": sf_dir}
    fold_params = {"sf_dir": sf_dir, "rules": rules_cfg}
    params = {"sf_dir": sf_dir, "rules": rules_cfg, "salt_fp": salt_fp, "algorithm": algorithm}

    def raw_triples():
        return extract_triples(
            source_ds if source_ds is not None else read_source_files(sf_dir)
        )

    if ckpt:
        triples_ds = ckpt.dataset_stage("triples", raw_triples, extract_params)
        triples = lambda: triples_ds  # noqa: E731
    else:
        triples = raw_triples

    # pass 1 (ONE scan): rule-relevant type pairs + optimistic link map +
    # the object-rule risk counter, all associative partial aggregates
    # tree-reduced with a remote finalize — no shuffle. The checkpointed
    # path keeps the driver-side fold (its artifacts must be picklable to
    # the stage manifest); the streaming path hands the finalize task's
    # return refs straight to pass 2.
    with log.stage("fold_index_linkmap", checkpointed=bool(ckpt)) as rec:
        if ckpt:

            def fold():
                return fold_pass(
                    triples(),
                    relevant_types_of(rules_cfg),
                    risk_predicates=risk_predicates_of(rules_cfg),
                    risk_prefixes=LINKABLE_PREFIXES,
                )

            pairs_df, key_map, _n, n_risk = ckpt.value_stage("folds", fold, fold_params)
            matcher = compile_matcher(rules_cfg, pairs_df)
            matcher_ref = broadcast_matcher(matcher)
            node_risky = node_rewrites_any_prefix(matcher, LINKABLE_PREFIXES)
            key_map_ref = ray.put(key_map)
        else:
            matcher_ref, key_map_ref, _n, n_risk, node_risky = fold_pass_compiled(
                triples(), rules_cfg, link_prefixes=LINKABLE_PREFIXES
            )
        rec["triples"] = int(_n)
        rec["risk_rows"] = int(n_risk)

    # pass 2: rule engine (stateless tasks over the broadcast matcher —
    # fuses with extract upstream and canonicalize downstream)
    def pseudo_stream():
        return pseudonymize_tasks(
            triples(), matcher_ref, algorithm=algorithm, secret=salt, batch_size=batch_size
        )

    if ckpt:
        pseudo_ds = ckpt.dataset_stage("pseudo", pseudo_stream, params)
        pseudo_stream = lambda: pseudo_ds  # noqa: E731

    out = pseudo_stream()
    if link:
        # the optimistic (raw-stream) link map is exact iff the rules never
        # rewrite a linkable-namespace IRI. Node rules / invert are decided
        # statically; object rules are decided AGAINST THE DATA by the fold's
        # risk counter (zero risk rows ⇒ no object rule ever met an IRI
        # object in a linkable namespace — type-gating ignored, so this only
        # over-triggers, never under-triggers). Otherwise recompute the map
        # from the pseudonymized stream (exact fallback), pinning that stream
        # first so extract+pseudo don't run twice.
        if node_risky or n_risk > 0:
            with log.stage("linkmap_fallback"):
                if not ckpt:
                    pseudo_ds = pseudo_stream().materialize()
                    pseudo_stream = lambda: pseudo_ds  # noqa: E731
                key_map_ref = ray.put(fold_link_map(pseudo_stream()))
        out = canonicalize_tasks(pseudo_stream(), key_map_ref, batch_size=batch_size)

    # the materialize barrier only blocks (and so only has a meaningful
    # wall time) when it writes; the bucketed layout stays a lazy Dataset
    # for the caller to consume, so its record carries layout only.
    layout = "split" if output_path else "bucketed"
    with log.stage("materialize", layout=layout, blocking=bool(output_path)):
        result = materialize(out, output_path, sort=sort, layout=layout)
    if ckpt:
        ckpt.finish(sf_dir=sf_dir, output=output_path)
    return result


def _split_source(src, delta_mod: int, take_delta: bool):
    """Deterministic (repo, path)-hash split of the source corpus:
    files with ``hash % delta_mod == 0`` form the DELTA (new repos AND new
    files of existing repos, so delta entities genuinely interact with
    base types and link keys)."""
    import pandas as pd
    import pyarrow as pa

    def f(batch: pa.Table) -> pa.Table:
        key = (
            batch["repo"].to_pandas().astype(object)
            + "/"
            + batch["path"].to_pandas().astype(object)
        )
        h = pd.util.hash_array(key.to_numpy(dtype=object)) % delta_mod
        m = (h == 0) if take_delta else (h != 0)
        return batch.filter(pa.array(m))

    return src.map_batches(f, batch_format="pyarrow")


def kg_pipeline_incremental(
    sf_dir: str,
    *,
    rules_cfg: dict | None = None,
    salt: str | None = None,
    algorithm: str = "sha256-salted",
    delta_mod: int = 5,
    sort: bool = False,
):
    """Deterministic-split driver for :func:`incremental_update` over one
    corpus directory — see :func:`_incremental_from_triples` for the
    semantics and proof obligations. The driver correctness gate compares
    this result against the full-corpus kg_pipeline oracle.

    The corpus is read and regex-extracted ONCE: a tagged extract pass
    emits each file's triples with a ``_delta`` split flag, and the two
    sides are cheap column filters over that one materialized stream
    (reading + extracting twice was pure wasted I/O)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..schema import TRIPLES
    from ..stages.extract import extract_batch

    tagged_schema = TRIPLES.append(pa.field("_delta", pa.int8()))

    def tagged(batch: pa.Table) -> pa.Table:
        key = (
            batch["repo"].to_pandas().astype(object)
            + "/"
            + batch["path"].to_pandas().astype(object)
        )
        m = (pd.util.hash_array(key.to_numpy(dtype=object)) % delta_mod) == 0
        parts = []
        for flag, mask in ((0, ~m), (1, m)):
            sub = batch.filter(pa.array(mask))
            if sub.num_rows:
                t = extract_batch(sub)
                parts.append(
                    t.append_column(
                        "_delta", pa.array(np.full(t.num_rows, flag, np.int8))
                    )
                )
        return pa.concat_tables(parts) if parts else tagged_schema.empty_table()

    all_t = (
        read_source_files(sf_dir)
        .map_batches(tagged, batch_format="pyarrow")
        .materialize()
    )

    def side(flag: int):
        def f(b: pa.Table) -> pa.Table:
            return b.filter(pc.equal(b["_delta"], flag)).drop_columns(["_delta"])

        return all_t.map_batches(f, batch_format="pyarrow")

    # both side folds in ONE scan of the tagged stream (fold_pass per
    # side would re-read all_t twice — a full scan is the unit of cost)
    from ..stages.folds import fold_pass_sided, relevant_types_of, risk_predicates_of
    from ..stages.link import LINKABLE_PREFIXES

    _cfg = DEFAULT_RULES if rules_cfg is None else rules_cfg
    base_fold, delta_fold = fold_pass_sided(
        all_t,
        relevant_types_of(_cfg),
        side_col="_delta",
        risk_predicates=risk_predicates_of(_cfg),
        risk_prefixes=LINKABLE_PREFIXES,
    )

    return _incremental_from_triples(
        side(0),
        side(1),
        rules_cfg=rules_cfg,
        salt=salt,
        algorithm=algorithm,
        sort=sort,
        base_state=base_fold,
        delta_state=delta_fold,
    )


def incremental_update(
    base_src,
    delta_src,
    *,
    rules_cfg: dict | None = None,
    salt: str | None = None,
    algorithm: str = "sha256-salted",
    sort: bool = False,
):
    """Incremental update from two SOURCE_FILES-shaped Datasets (a user's
    own base/delta corpus reads) — see :func:`_incremental_from_triples`."""
    return _incremental_from_triples(
        extract_triples(base_src),
        extract_triples(delta_src),
        rules_cfg=rules_cfg,
        salt=salt,
        algorithm=algorithm,
        sort=sort,
    )


def _incremental_from_triples(
    base_triples_ds,
    delta_triples_ds,
    *,
    rules_cfg: dict | None = None,
    salt: str | None = None,
    algorithm: str = "sha256-salted",
    sort: bool = False,
    base_state: tuple | None = None,
    delta_state: tuple | None = None,
    base_out=None,
    return_state: bool = False,
):
    """Incremental KG update: full pipeline on the BASE split, then an
    append-only DELTA applied by re-rendering ONLY affected triples —
    provably equal to a full recompute (the driver checks this result
    against the very same full-corpus SQL oracle as ``kg_pipeline``).

    Why a triple's rendering can change when files are appended:

    1. an entity gains a rule-relevant type → its of_type node rewrite
       flips (and, via on_type_predicate, its triples' OBJECT rewrites);
    2. a link key gains a lexicographically smaller mention → the
       canonical for that key changes for EVERY member mention.

    Nothing else can change (on_predicate depends only on the static
    predicate; the secret is fixed), PROVIDED pseudo and link touch
    disjoint IRI sets — the same optimistic condition the main pipeline
    verifies with its static node check + data-side risk counter. When
    the condition fails this raises and the caller falls back to a full
    recompute (correct by construction, never silently wrong).

    The affected set is therefore: every IRI appearing in the delta
    (covers 1 — new pairs only come from delta subjects) plus every
    mention whose link KEY's canonical changed (covers 2; detected by
    MIN-merging the associative per-split link maps and diffing — the
    key map is already driver-size state). Base-OUTPUT rows to drop are
    found by rendering the affected entities through the REAL base
    engine (a dummy batch through pseudonymize_batch + CanonicalizeActor
    — no duplicated rendering logic) and probing rendered
    subject/object values plus mention keys; base RAW rows to re-render
    are found by the same probe on raw values. Work ∝ |delta| + |triples
    touching affected entities|, never ∝ |base|; the only full-base pass
    is ONE fused routed map (rendered base ∪ raw base ∪ delta, tagged)
    that emits surviving rendered rows and re-renders affected raw rows
    in place.
    """
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    from ..functions.crypto import new_pseudonymizer, resolve_secret
    from ..functions.engine import node_rewrites_any_prefix, pseudonymize_batch
    from ..schema import KIND_IRI, KIND_LITERAL, TRIPLES
    from ..stages.folds import (
        fold_pass,
        relevant_types_of,
        risk_predicates_of,
        tree_fold_tables,
    )
    from ..stages.link import (
        LINKABLE_PREFIXES,
        CanonicalizeActor,
        canonicalize_tasks,
        mention_keys,
    )
    from ..stages.materialize import materialize
    from ..stages.pseudo import broadcast_matcher, compile_matcher, pseudonymize_tasks

    rules_cfg = DEFAULT_RULES if rules_cfg is None else rules_cfg
    salt = resolve_secret(salt)

    base_triples = base_triples_ds.materialize()
    delta_triples = delta_triples_ds.materialize()

    rt = relevant_types_of(rules_cfg)
    rp = risk_predicates_of(rules_cfg)
    if base_state is not None:
        # the persisted fold of a prior checkpointed run (cli `update`)
        base_pairs, base_map, _nb, base_risk = base_state
    else:
        base_pairs, base_map, _nb, base_risk = fold_pass(
            base_triples, rt, risk_predicates=rp, risk_prefixes=LINKABLE_PREFIXES
        )
    if delta_state is not None:
        # pre-fused with the base fold in one scan (fold_pass_sided)
        delta_pairs, delta_map, _nd, delta_risk = delta_state
    else:
        delta_pairs, delta_map, _nd, delta_risk = fold_pass(
            delta_triples, rt, risk_predicates=rp, risk_prefixes=LINKABLE_PREFIXES
        )

    base_matcher = compile_matcher(rules_cfg, base_pairs)
    merged_pairs = pd.concat([base_pairs, delta_pairs], ignore_index=True).drop_duplicates(
        ignore_index=True
    )
    merged_matcher = compile_matcher(rules_cfg, merged_pairs)
    if (
        base_risk
        or delta_risk
        or node_rewrites_any_prefix(base_matcher, LINKABLE_PREFIXES)
        or node_rewrites_any_prefix(merged_matcher, LINKABLE_PREFIXES)
    ):
        raise NotImplementedError(
            "incremental update requires pseudo/link independence "
            "(the optimistic condition); fall back to kg_pipeline"
        )

    # associative MIN-merge of the two link maps; diff = changed keys
    merged_map = dict(base_map)
    for k, c in delta_map.items():
        b = merged_map.get(k)
        merged_map[k] = c if b is None or c < b else b
    k_changed = frozenset(k for k, c in base_map.items() if merged_map[k] != c)

    if base_out is None:
        # the base run (what a prior job would have produced and persisted)
        base_out = materialize(
            canonicalize_tasks(
                pseudonymize_tasks(
                    base_triples, broadcast_matcher(base_matcher),
                    algorithm=algorithm, secret=salt,
                ),
                ray.put(base_map),
            ),
            None, sort=False, layout="bucketed",
        ).materialize()

    # ---- affected entities: every IRI the delta mentions -------------------
    # rdf:type OBJECTS (class IRIs) are excluded: a class IRI in a delta
    # type triple does NOT make every base instance of that class affected
    # (the instance's sensitivity changes via its OWN new pair — the
    # delta SUBJECT probe — and the class IRI's own rendering can only
    # change via a delta triple with the class as subject, also covered).
    # Without this, any delta marks ~every base type triple affected and
    # the work ∝ delta bound collapses.
    from ..schema import RDF_TYPE as _RDF_TYPE

    def iri_partial(b: pa.Table) -> pd.DataFrame:
        s = b["subject"].combine_chunks().filter(
            pc.equal(b["subject_kind"].combine_chunks(), KIND_IRI)
        )
        o = b["object_value"].combine_chunks().filter(
            pc.and_(
                pc.equal(b["object_kind"].combine_chunks(), KIND_IRI),
                pc.not_equal(b["predicate"].combine_chunks(), _RDF_TYPE),
            )
        )
        u = pc.unique(pa.concat_arrays([pc.unique(s), pc.unique(o)]))
        return pd.DataFrame(
            {"iri": pd.Series(u.to_numpy(zero_copy_only=False), dtype=object)}
        )

    ents = tree_fold_tables(
        delta_triples.map_batches(iri_partial, batch_format="pyarrow"),
        lambda fs: pd.concat(fs, ignore_index=True).drop_duplicates(),
    )
    a_ent = (
        np.array(sorted(ents["iri"]), dtype=object)
        if ents is not None and len(ents)
        else np.array([], dtype=object)
    )

    # ---- their BASE renderings, via the real engine on a dummy batch -------
    f_ent = set(a_ent)
    if len(a_ent):
        n = len(a_ent)
        dummy = pa.table(
            {
                "subject": pa.array(a_ent, pa.string()),
                "subject_kind": pa.array(np.full(n, KIND_IRI, np.int8)),
                "predicate": pa.array([f"{NS}__probe__"] * n, pa.string()),
                "object_value": pa.array([""] * n, pa.string()),
                "object_kind": pa.array(np.full(n, KIND_LITERAL, np.int8)),
                "object_lang": pa.array([None] * n, pa.string()),
                "object_datatype": pa.array([None] * n, pa.string()),
            },
            schema=TRIPLES,
        )
        rendered = CanonicalizeActor(base_map)(
            pseudonymize_batch(dummy, base_matcher, new_pseudonymizer(algorithm, salt))
        )
        f_ent |= set(rendered["subject"].to_pylist())

    f_ref = ray.put(frozenset(f_ent))
    k_ref = ray.put(k_changed)

    def _touch_mask(batch: pa.Table, values: frozenset, keys: frozenset) -> np.ndarray:
        """Affected probe, applied identically to raw and rendered rows.

        LINKABLE IRIs are probed by mention KEY against the
        changed-canonical set only: under the optimistic guard they are
        never pseudonymized, so their rendering changes iff their key's
        canonical changed — and the key is the probe stable across raw
        mention / canonical forms (a value probe would be asymmetric:
        the rendered form is the canonical, the raw form any member).
        NON-linkable values are probed by value against F (raw ∪
        base-rendered forms of the delta-touched entities)."""
        s = pd.Series(batch["subject"].to_numpy(zero_copy_only=False), dtype=object)
        o = pd.Series(batch["object_value"].to_numpy(zero_copy_only=False), dtype=object)
        o_iri = batch["object_kind"].to_numpy(zero_copy_only=False) == KIND_IRI
        sk = mention_keys(s)
        ok = mention_keys(o.where(pd.Series(o_iri)))
        hit = (s.isin(values) & sk.isna()).to_numpy()
        hit |= (o.isin(values) & ok.isna()).to_numpy() & o_iri
        if keys:
            hit |= sk.isin(keys).to_numpy()
            hit |= ok.isin(keys).to_numpy()
        return hit

    # ---- ONE fused full-base pass -----------------------------------------
    # The three inputs (rendered base output, raw base triples, raw delta)
    # union into a single tagged stream; one routed map emits BOTH sides —
    # surviving rendered rows pass through, affected raw rows re-render
    # in place (pseudonymize_batch + CanonicalizeActor via the same
    # per-process caches the task-pool stages use). vs the previous
    # drop_affected/keep_affected pair + separate pseudo/canon/union
    # chain: each base row crosses ONE operator instead of the filter →
    # union → materialize-input hops, and the streaming executor schedules
    # a single stage over the whole base instead of two.
    from ..stages.pseudo import _cache_latest, _cached_pseudonymizer

    matcher_ref = broadcast_matcher(merged_matcher)
    map_ref = ray.put(merged_map)

    def _tagged(ds, k: int):
        def f(b: pa.Table) -> pa.Table:
            return b.append_column(
                "_k", pa.array(np.full(b.num_rows, k, np.int8))
            )

        return ds.map_batches(f, batch_format="pyarrow")

    TAG_RAW_BASE, TAG_RENDERED, TAG_RAW_DELTA = 0, 1, 2
    fused_in = (
        _tagged(base_out, TAG_RENDERED)
        .union(_tagged(base_triples, TAG_RAW_BASE))
        .union(_tagged(delta_triples, TAG_RAW_DELTA))
    )

    def route(batch: pa.Table, _f=f_ref, _kc=k_ref) -> pa.Table:
        values, keys = ray.get(_f), ray.get(_kc)
        karr = batch.column("_k").to_numpy(zero_copy_only=False)
        t = batch.drop_columns(["_k"])
        out = []
        m = karr == TAG_RENDERED
        if m.any():
            ren = t.filter(pa.array(m)) if not m.all() else t
            out.append(ren.filter(pa.array(~_touch_mask(ren, values, keys))))
        redo = []
        m = karr == TAG_RAW_BASE
        if m.any():
            rb = t.filter(pa.array(m)) if not m.all() else t
            redo.append(rb.filter(pa.array(_touch_mask(rb, values, keys))))
        m = karr == TAG_RAW_DELTA
        if m.any():
            redo.append(t.filter(pa.array(m)) if not m.all() else t)
        redo = [r for r in redo if r.num_rows]
        if redo:
            mkey = matcher_ref.hex() if hasattr(matcher_ref, "hex") else id(matcher_ref)
            matcher = _cache_latest("matcher", mkey, lambda: ray.get(matcher_ref))
            pseudo = _cached_pseudonymizer(algorithm, salt)
            ckey = map_ref.hex() if hasattr(map_ref, "hex") else id(map_ref)
            canon = _cache_latest("keymap", ckey, lambda: CanonicalizeActor(map_ref))
            out.extend(
                canon(pseudonymize_batch(r, matcher, pseudo)) for r in redo
            )
        out = [o for o in out if o.num_rows]
        if not out:
            return TRIPLES.empty_table()
        return pa.concat_tables(out, promote_options="permissive")

    result = materialize(
        fused_in.map_batches(route, batch_format="pyarrow"),
        None, sort=sort, layout="bucketed",
    )
    if return_state:
        # the merged fold state IS the next update's base state (chaining)
        merged_state = (merged_pairs, merged_map, int(_nb) + int(_nd), 0)
        return result, merged_state
    return result
