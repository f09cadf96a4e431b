"""Pass 2 — rule-based pseudonymization as an actor-pool map_batches stage.

Reference shape: a single-threaded loop holding rules + index + key
(src/pseudo.rs:47-78). Ray shape: the (rules × index) probe sets are
compiled ONCE on the driver (vectorized — see CompiledMatcher), ``ray.put``
into the object store, and every pool actor resolves the ObjectRef once in
``__init__``; ``__call__`` applies the vectorized mask + rewrite per Arrow
batch.

Scale notes: the broadcast matcher holds to ~10^7 sensitive/otp entries;
past that the same semantics run as two hash-partitioned semi-joins
(triples ⋈ sensitive-set on subject, then on object) — same rule
semantics, different physical plan.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.crypto import new_pseudonymizer
from ..functions.engine import CompiledMatcher, pseudonymize_batch
from ..functions.rules import Rules


def compile_matcher(rules_cfg, index) -> CompiledMatcher:
    """Driver-side compile: rules (dict|Rules) × index (DataFrame|dict)."""
    rules = Rules.from_dict(rules_cfg) if isinstance(rules_cfg, dict) else rules_cfg
    return CompiledMatcher(rules, index)


def broadcast_matcher(matcher: CompiledMatcher):
    import ray

    return ray.put(matcher)


_STATE_CACHE: dict = {}


def _require_secret(secret) -> None:
    """Distributed stages need a driver-materialized secret.

    ``secret=None`` would make each worker process (or each batch, in the
    join plan) draw its OWN random salt/key — the same IRI would then hash
    differently across batches, corrupting referential consistency. The
    reference derives its random key once in its single process
    (src/crypto.rs:108-109); the distributed analogue is
    ``functions.crypto.resolve_secret`` on the driver.
    """
    if secret is None:
        raise ValueError(
            "secret must be resolved on the driver before a distributed "
            "pseudonymization stage (use functions.crypto.resolve_secret)"
        )


def pseudonymize_tasks(
    triples,
    matcher_ref,
    *,
    algorithm: str = "sha256-salted",
    secret,
    batch_size=None,
):
    """Task-pool variant of :func:`pseudonymize` (same semantics).

    The broadcast matcher is fetched from the local object store once per
    worker PROCESS (module-level cache keyed by ObjectRef) instead of once
    per actor. Why both exist: consecutive task-pool ``map_batches`` stages
    FUSE into a single Ray task chain (read → pseudo → canon → dedup in one
    pass through the object store), while actor-pool operators are fusion
    barriers — every hop re-materializes the stream in plasma. On a single
    node the extra hops are pure overhead; the actor-pool form remains for
    stages whose state is too big/expensive to cache per process.
    """
    import ray

    _require_secret(secret)

    def fn(batch: pa.Table) -> pa.Table:
        key = ("matcher", matcher_ref.hex() if hasattr(matcher_ref, "hex") else id(matcher_ref))
        matcher = _STATE_CACHE.get(key)
        if matcher is None:
            matcher = (
                ray.get(matcher_ref)
                if not isinstance(matcher_ref, CompiledMatcher)
                else matcher_ref
            )
            _STATE_CACHE[key] = matcher
        pkey = ("pseudo", algorithm, secret if isinstance(secret, (str, bytes)) else id(secret))
        pseudo = _STATE_CACHE.get(pkey)
        if pseudo is None:
            pseudo = new_pseudonymizer(algorithm, secret)
            _STATE_CACHE[pkey] = pseudo
        return pseudonymize_batch(batch, matcher, pseudo)

    return triples.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


def pseudonymize_join(
    triples,
    rules_cfg,
    index_pairs,
    *,
    algorithm: str = "sha256-salted",
    secret,
    num_partitions: int = 32,
):
    """Pass 2 via hash-partitioned joins — the huge-index physical plan.

    When the type index no longer fits one object-store object (≳10^7–10^8
    typed subjects), the broadcast matcher is replaced by the SAME rule
    semantics as relational joins (SURVEY.md §2.4 A2):

    - ``sens``: subjects whose indexed type ∈ of_type (rules side is tiny →
      map-side filter of the index pairs; no shuffle),
    - triples ⟕ sens on the subject term key → S flag,
    - triples ⟕ sens on the object term key → O-as-node flag,
    - triples ⟕ otp (subject⨝rule-pairs) on subject+predicate → O flag,
    - ``on_predicate`` stays a broadcast set (always tiny),
    - final map applies the mask exactly like the broadcast path
      (kind-gating before invert — bit-identical semantics).

    Three all-to-all exchanges of the stream vs zero for the broadcast
    path — use only when the index forces it. Both plans live behind the
    same module so callers switch on index size, not semantics.
    """
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..functions.engine import rewrite_batch
    from ..functions.rdf import format_predicate, format_subject
    from ..schema import KIND_IRI

    _require_secret(secret)
    rules = Rules.from_dict(rules_cfg) if isinstance(rules_cfg, dict) else rules_cfg
    of_type = pa.array(sorted(rules.node_of_type), pa.string())
    otp_rules = pd.DataFrame(
        [(t, p) for t, ps in rules.obj_on_type_predicate.items() for p in ps],
        columns=["type", "pred"],
    )

    def to_sens(batch: pa.Table) -> pa.Table:
        if len(of_type) == 0:
            return pa.table({"sens_key": pa.array([], pa.string())})
        m = pc.is_in(batch["type"], value_set=of_type)
        subj = pc.unique(batch.filter(m)["subject"].combine_chunks())
        return pa.table({"sens_key": subj})

    otp_types = pa.array(sorted(otp_rules["type"].unique()) if not otp_rules.empty else [], pa.string())

    def to_otp(batch: pa.Table) -> pa.Table:
        if otp_rules.empty:
            return pa.table({"otp_key": pa.array([], pa.string())})
        # Arrow-side prefilter: the index is huge, the rule-relevant subset
        # tiny — only rows whose type a rule names ever reach pandas
        sel = batch.filter(pc.is_in(batch["type"], value_set=otp_types))
        if sel.num_rows == 0:
            return pa.table({"otp_key": pa.array([], pa.string())})
        df = sel.to_pandas().merge(otp_rules, on="type")
        key = (df["subject"] + "\x1f" + df["pred"]).drop_duplicates()
        return pa.table({"otp_key": pa.array(key, pa.string())})

    # join sides must be GLOBALLY distinct — duplicate right-side keys would
    # multiply left rows (local per-batch dedup alone is not enough)
    sens = (
        index_pairs.map_batches(to_sens, batch_format="pyarrow")
        .groupby("sens_key")
        .count()
        .select_columns(["sens_key"])
    )
    otp = (
        index_pairs.map_batches(to_otp, batch_format="pyarrow")
        .groupby("otp_key")
        .count()
        .select_columns(["otp_key"])
    )
    sens_o = sens.map_batches(
        lambda b: pa.table({"sens_okey": b["sens_key"], "_fo": pa.nulls(b.num_rows, pa.int8()).fill_null(1)}),
        batch_format="pyarrow",
    )
    sens_s = sens.map_batches(
        lambda b: pa.table({"sens_skey": b["sens_key"], "_fs": pa.nulls(b.num_rows, pa.int8()).fill_null(1)}),
        batch_format="pyarrow",
    )
    otp_f = otp.map_batches(
        lambda b: pa.table({"otp_k": b["otp_key"], "_ftp": pa.nulls(b.num_rows, pa.int8()).fill_null(1)}),
        batch_format="pyarrow",
    )

    def add_keys(batch: pa.Table) -> pa.Table:
        skey = format_subject(batch["subject"].combine_chunks(), batch["subject_kind"].combine_chunks())
        pkey = format_predicate(batch["predicate"].combine_chunks())
        okey = pc.if_else(
            pc.equal(batch["object_kind"].combine_chunks(), KIND_IRI),
            pc.binary_join_element_wise("<", batch["object_value"].combine_chunks(), ">", ""),
            pa.scalar("", pa.string()),
        )
        combined = pc.binary_join_element_wise(skey, pkey, "\x1f")
        return (
            batch.append_column("_skey", skey)
            .append_column("_okey", okey)
            .append_column("_ck", combined)
        )

    keyed = triples.map_batches(add_keys, batch_format="pyarrow")
    j = keyed.join(sens_s, "left_outer", num_partitions, on=("_skey",), right_on=("sens_skey",))
    j = j.join(sens_o, "left_outer", num_partitions, on=("_okey",), right_on=("sens_okey",))
    j = j.join(otp_f, "left_outer", num_partitions, on=("_ck",), right_on=("otp_k",))

    on_pred = pa.array(sorted(rules.obj_on_predicate), pa.string())
    invert = rules.invert

    def finish(batch: pa.Table) -> pa.Table:
        import numpy as np

        # pseudonymizer hoisted to the per-process cache (was per batch)
        pkey = ("pseudo", algorithm, secret if isinstance(secret, (str, bytes)) else id(secret))
        pseudo = _STATE_CACHE.get(pkey)
        if pseudo is None:
            pseudo = new_pseudonymizer(algorithm, secret)
            _STATE_CACHE[pkey] = pseudo

        n = batch.num_rows
        subj_is_iri = pc.equal(batch["subject_kind"], KIND_IRI).to_numpy(zero_copy_only=False)
        obj_is_iri = pc.equal(batch["object_kind"], KIND_IRI).to_numpy(zero_copy_only=False)
        f = lambda c: pc.fill_null(batch[c], 0).to_numpy(zero_copy_only=False).astype(bool)
        mask_s = f("_fs") & subj_is_iri
        mask_o = (f("_fo") & obj_is_iri) | f("_ftp")
        if len(on_pred):
            pkey = format_predicate(batch["predicate"].combine_chunks())
            mask_o |= pc.is_in(pkey, value_set=on_pred).to_numpy(zero_copy_only=False)
        if invert:
            mask_s, mask_o = ~mask_s, ~mask_o
        core = batch.select(
            ["subject", "subject_kind", "predicate", "object_value",
             "object_kind", "object_lang", "object_datatype"]
        )
        return rewrite_batch(core, mask_s, mask_o, pseudo)

    return j.map_batches(finish, batch_format="pyarrow")


class PseudonymizeActor:
    def __init__(self, matcher_ref, algorithm: str, secret):
        import ray

        _require_secret(secret)
        self.matcher = (
            ray.get(matcher_ref)
            if not isinstance(matcher_ref, CompiledMatcher)
            else matcher_ref
        )
        self.pseudo = new_pseudonymizer(algorithm, secret)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return pseudonymize_batch(batch, self.matcher, self.pseudo)


def pseudonymize(
    triples,
    matcher_ref,
    *,
    algorithm: str = "sha256-salted",
    secret,
    batch_size: int = 16384,
    concurrency=4,
):
    """triples Dataset → pseudonymized triples Dataset (actor pool).

    ``concurrency`` int N becomes an autoscaling pool (1, N): the pool only
    grows when batches queue up, so it never reserves the whole cluster away
    from upstream read/extract tasks (fixed pools that sum to the CPU count
    deadlock the streaming executor's admission).
    """
    if isinstance(concurrency, int):
        concurrency = (1, concurrency)
    return triples.map_batches(
        PseudonymizeActor,
        fn_constructor_args=(matcher_ref, algorithm, secret),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
