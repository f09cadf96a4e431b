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
):
    """Run extract → index → pseudo → link → materialize; returns the final Dataset.

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
        return extract_triples(read_source_files(sf_dir))

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
