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


def _cache_latest(kind: str, key, build):
    """Per-process cache holding at most ONE entry per kind.

    Long-lived workers see a fresh broadcast ref (new key) per job; keeping
    every old value (a compiled matcher can be GBs) would grow worker RSS
    monotonically across jobs — so inserting a new key evicts the kind's
    previous entry.
    """
    full = (kind, key)
    val = _STATE_CACHE.get(full)
    if val is None:
        val = build()
        for k in [k for k in _STATE_CACHE if k[0] == kind and k != full]:
            del _STATE_CACHE[k]
        _STATE_CACHE[full] = val
    return val


def _cached_pseudonymizer(algorithm, secret):
    """Shared per-process pseudonymizer cache (task plan + join finish)."""
    key = (algorithm, secret if isinstance(secret, (str, bytes)) else id(secret))
    return _cache_latest("pseudo", key, lambda: new_pseudonymizer(algorithm, secret))


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
        key = matcher_ref.hex() if hasattr(matcher_ref, "hex") else id(matcher_ref)
        matcher = _cache_latest(
            "matcher",
            key,
            lambda: (
                ray.get(matcher_ref)
                if not isinstance(matcher_ref, CompiledMatcher)
                else matcher_ref
            ),
        )
        pseudo = _cached_pseudonymizer(algorithm, secret)
        return pseudonymize_batch(batch, matcher, pseudo)

    return triples.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


def _shard_keys(key_ds, column: str, num_partitions: int, part_of=None) -> list:
    """Key column Dataset → ``num_partitions`` sorted-unique Arrow-array
    ObjectRefs, sharded by the deterministic pandas hash (NEVER the builtin
    ``hash`` — per-process randomized). Shape mirrors the census
    (folds.partitioned_hot_hashes): each block task splits its keys into
    per-shard returns, one merge task per shard concats + uniques — the
    shard objects live in the object store end to end; the driver holds
    only refs.

    ``part_of(keys) -> partition ids`` overrides the shard function — used
    to co-partition the otp (subject␟pred) set by its SUBJECT part so it
    probes inside the stream's subject-hash partitioning.
    """
    import numpy as np
    import pandas as pd
    import ray

    P = num_partitions

    @ray.remote(num_returns=P)
    def _split(*tables):
        ks = np.concatenate(
            [t[column].to_numpy(zero_copy_only=False) for t in tables]
        )
        part = part_of(ks) if part_of is not None else pd.util.hash_array(ks) % P
        order = np.argsort(part, kind="stable")
        ks, part = ks[order], part[order]
        bounds = np.searchsorted(part, np.arange(1, P))
        parts = tuple(np.split(ks, bounds))
        return parts if P > 1 else parts[0]

    @ray.remote
    def _merge(*pieces):
        if not pieces:
            return pa.array([], pa.string())
        return pa.array(np.unique(np.concatenate(pieces)), pa.string())

    refs = key_ds.to_arrow_refs()
    if not refs:
        empty = pa.array([], pa.string())
        return [ray.put(empty) for _ in range(P)]
    n_leaves = max(1, min(len(refs), 2 * int(ray.cluster_resources().get("CPU", 16))))
    chunk = -(-len(refs) // n_leaves)
    leaf = [_split.remote(*refs[i : i + chunk]) for i in range(0, len(refs), chunk)]
    if P == 1:
        # num_returns=1 remotes yield a bare ObjectRef (not indexable)
        return [_merge.remote(*leaf)]
    return [_merge.remote(*[lo[p] for lo in leaf]) for p in range(P)]


_BLOOM_K = 4
_BLOOM_KEY2 = "fedcba98765432100123456789abcdef"[:16]


def _bloom_hashes(keys: "np.ndarray", m: int):
    """Double-hashing g_i = (h1 + i·h2) mod m over pandas' deterministic
    SipHash (two independent 16-byte hash keys)."""
    import numpy as np
    import pandas as pd

    h1 = pd.util.hash_array(keys)
    h2 = pd.util.hash_array(keys, hash_key=_BLOOM_KEY2)
    return [((h1 + np.uint64(i) * h2) % np.uint64(m)) for i in range(_BLOOM_K)]


def _build_bloom(shard_refs: list):
    """Bloom filter of the union of key shards → (packed-bits ref, m).

    ~16 bits/key, k=4 → ≈0.24% false positives: the summary is ~50×
    smaller than the key set, so it broadcasts even when the set itself
    must stay sharded (10^8 keys → ~200 MB bloom vs ~5 GB of keys). False
    positives only cost a row a trip through the exchange — the exact
    ``is_in`` there decides; false negatives are impossible, so bypassed
    rows are exactly the definite misses.
    """
    import numpy as np
    import ray

    @ray.remote
    def _size(shard):
        return len(shard)

    n = max(1, sum(ray.get([_size.remote(s) for s in shard_refs])))
    m = 1 << max(14, int(np.ceil(np.log2(16 * n))))

    @ray.remote
    def _bloom_of(shard):
        arr = np.zeros(m // 64, np.uint64)
        if len(shard):
            keys = shard.to_numpy(zero_copy_only=False)
            for g in _bloom_hashes(keys, m):
                np.bitwise_or.at(arr, g >> np.uint64(6), np.uint64(1) << (g & np.uint64(63)))
        return arr

    @ray.remote
    def _or(*arrs):
        out = arrs[0].copy()
        for a in arrs[1:]:
            out |= a
        return out

    return _or.remote(*[_bloom_of.remote(s) for s in shard_refs]), m


def _bloom_maybe(keys: "np.ndarray", bloom: "np.ndarray", m: int) -> "np.ndarray":
    import numpy as np

    res = np.ones(len(keys), dtype=bool)
    for g in _bloom_hashes(keys, m):
        res &= ((bloom[g >> np.uint64(6)] >> (g & np.uint64(63))) & np.uint64(1)).astype(bool)
    return res


def _flag_pass(stream, part_col: str, probes: list, num_partitions: int, drop_after=(), blooms=None):
    """Append boolean flags = (row's key ∈ right-side set), several probes
    per exchange.

    ONE manual hash exchange of the stream on ``hash(part_col) % P``:
    split tasks slice each block into per-partition pieces
    (``num_returns=P`` — the census shape, folds.partitioned_hot_hashes),
    one gather task per partition concats its pieces and probes them with
    Arrow ``is_in`` against ONLY its shards. Every
    ``(key_col, flag_name, shard_refs)`` probe whose shards are
    co-partitioned with ``part_col`` rides the same exchange.

    With ``blooms`` (one ``_build_bloom`` result per probe), the split
    tasks consult the broadcast Bloom summaries first: rows whose every
    key is a definite miss bypass the exchange entirely with false flags
    (an extra ``num_returns`` slot), so the exchanged volume collapses to
    (matching + ~0.24% false-positive) rows — the right shape when the
    rule-relevant subset is a sliver of the stream.

    Why manual: Ray 2.49's hash-shuffle join backend wedges/errors here
    (num_partitions ≥ 8), and the sort-based ``groupby(part).map_groups``
    alternative pays a full range sort for a P-valued key (~7 s per
    exchange at 6M rows vs ~2 s for this). Memory per gather is one stream
    partition + its shards — pick ``num_partitions`` ≈ stream bytes /
    256 MB at scale.
    """
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc
    import ray
    import ray.data

    P = num_partitions
    n_probes = len(probes)
    key_cols = [kc for kc, _, _ in probes]
    flag_names = [fn for _, fn, _ in probes]
    drop_after = list(drop_after)
    with_bloom = blooms is not None
    bloom_ms = [m for _, m in blooms] if with_bloom else []

    def _finish_table(tbl: pa.Table, flags: list) -> pa.Table:
        for name, arr in zip(flag_names, flags):
            tbl = tbl.append_column(name, arr)
        return tbl.drop_columns(drop_after) if drop_after else tbl

    @ray.remote(num_returns=P + 1 if with_bloom else P)
    def _split(*args):
        bloom_arrs, tables = args[:len(bloom_ms)], args[len(bloom_ms):]
        tbl = pa.concat_tables(tables) if len(tables) > 1 else tables[0]
        bypass = None
        if with_bloom:
            maybe = np.zeros(tbl.num_rows, dtype=bool)
            for key_col, barr, m in zip(key_cols, bloom_arrs, bloom_ms):
                k = tbl[key_col].to_numpy(zero_copy_only=False)
                maybe |= _bloom_maybe(k, barr, m)
            bp = tbl.filter(pa.array(~maybe))
            false_flags = [pa.array(np.zeros(bp.num_rows, dtype=bool))] * n_probes
            bypass = _finish_table(bp, false_flags)
            tbl = tbl.filter(pa.array(maybe))
        k = tbl[part_col].to_numpy(zero_copy_only=False)
        part = (pd.util.hash_array(k) % P).astype(np.int64)
        order = np.argsort(part, kind="stable")
        tbl = tbl.take(pa.array(order))
        bounds = np.searchsorted(part[order], np.arange(1, P))
        offs = np.concatenate([[0], bounds, [len(part)]])
        parts = tuple(tbl.slice(offs[i], offs[i + 1] - offs[i]) for i in range(P))
        if with_bloom:
            return (*parts, bypass)
        return parts if P > 1 else parts[0]

    @ray.remote
    def _gather_probe(*args):
        shards, pieces = args[:n_probes], list(args[n_probes:])
        out = pa.concat_tables(pieces)  # empty pieces concat to 0 rows, schema kept
        flags = []
        for key_col, shard in zip(key_cols, shards):
            if len(shard) == 0:
                flags.append(pa.array(np.zeros(out.num_rows, dtype=bool)))
            else:
                flags.append(pc.is_in(out[key_col].combine_chunks(), value_set=shard))
        return _finish_table(out, flags)

    bloom_refs = [r for r, _ in blooms] if with_bloom else []
    # rolling split: launch as upstream blocks materialize, ~1 block each
    split_outs = []
    for bundle in stream.iter_internal_ref_bundles():
        for block_ref in bundle.block_refs:
            split_outs.append(_split.remote(*bloom_refs, block_ref))
    if not split_outs:
        return stream  # empty stream: no flags needed downstream anyway
    # P=1 without blooms: num_returns=1 → each split out is a bare,
    # non-indexable ObjectRef holding partition 0 itself
    bare = P == 1 and not with_bloom
    gathered = [
        _gather_probe.remote(
            *[shard_refs[p] for _, _, shard_refs in probes],
            *[(s if bare else s[p]) for s in split_outs],
        )
        for p in range(P)
    ]
    if with_bloom:
        gathered += [s[P] for s in split_outs]
    return ray.data.from_arrow_refs(gathered)


def pseudonymize_join(
    triples,
    rules_cfg,
    index_pairs,
    *,
    algorithm: str = "sha256-salted",
    secret,
    num_partitions: int = 32,
):
    """Pass 2 via partitioned semi-join probes — the huge-index physical plan.

    When the type index no longer fits one object-store object (≳10^7–10^8
    typed subjects), the broadcast matcher is replaced by the SAME rule
    semantics as hash-partitioned set probes (SURVEY.md §2.4 A2):

    - ``sens``: subjects whose indexed type ∈ of_type (rules side is tiny →
      map-side filter of the index pairs; no shuffle), sharded by key hash
      into ``num_partitions`` object-store arrays (``_shard_keys``),
    - stream ∋ sens on the subject term key → S flag (``_flag_pass``),
    - stream ∋ sens on the object term key → O-as-node flag,
    - stream ∋ otp (subject⨝rule-pairs) on subject+predicate → O flag,
    - ``on_predicate`` stays a broadcast set (always tiny),
    - final map applies the mask exactly like the broadcast path
      (kind-gating before invert — bit-identical semantics).

    Three sort-partitioned exchanges of the stream vs zero for the
    broadcast path — use only when the index forces it. Both plans live
    behind the same module so callers switch on index size, not semantics.
    (A single shared partitioning for all three probes would need stable
    row ids to re-attach flags — i.e. a materialized stream; three passes
    is the standard shape without one.)
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

    def add_subject_keys(batch: pa.Table) -> pa.Table:
        skey = format_subject(batch["subject"].combine_chunks(), batch["subject_kind"].combine_chunks())
        pkey = format_predicate(batch["predicate"].combine_chunks())
        combined = pc.binary_join_element_wise(skey, pkey, "\x1f")
        return batch.append_column("_skey", skey).append_column("_ck", combined)

    def add_object_key(batch: pa.Table) -> pa.Table:
        okey = pc.if_else(
            pc.equal(batch["object_kind"].combine_chunks(), KIND_IRI),
            pc.binary_join_element_wise("<", batch["object_value"].combine_chunks(), ">", ""),
            pa.scalar("", pa.string()),
        )
        return batch.append_column("_okey", okey)

    # right sides as hash shards (no global distinct needed — membership
    # probes tolerate duplicate keys, unlike a left join which would
    # multiply rows). The stream partitions through the sort-based groupby
    # TWICE, not three times: the otp set is sharded by the SUBJECT part of
    # its (subject␟pred) key, so the subject probe and the type-predicate
    # probe share one subject-hash exchange; only the object probe needs
    # its own. Key columns are added just before — and dropped right
    # after — the exchange that uses them, so each exchange moves the
    # minimum bytes. (Dataset.join was dropped: Ray 2.49's hash-shuffle
    # join backend wedges/errors on this setup for num_partitions ≥ 8 —
    # see BASELINE.md; the grouped probe uses only primitives proven at
    # scale here.)
    import pandas as _pd

    P = num_partitions

    def _subject_part_of(keys):
        subj = _pd.Series(keys).str.split("\x1f", n=1).str[0].to_numpy()
        return _pd.util.hash_array(subj) % P

    sens_shards = _shard_keys(
        index_pairs.map_batches(to_sens, batch_format="pyarrow"), "sens_key", P
    )
    otp_shards = _shard_keys(
        index_pairs.map_batches(to_otp, batch_format="pyarrow"), "otp_key", P,
        part_of=_subject_part_of,
    )

    sens_bloom = _build_bloom(sens_shards)
    otp_bloom = _build_bloom(otp_shards)

    keyed = triples.map_batches(add_subject_keys, batch_format="pyarrow")
    j = _flag_pass(
        keyed, "_skey",
        [("_skey", "_fs", sens_shards), ("_ck", "_ftp", otp_shards)],
        P, drop_after=("_skey", "_ck"), blooms=[sens_bloom, otp_bloom],
    )
    j = _flag_pass(
        j.map_batches(add_object_key, batch_format="pyarrow"),
        "_okey", [("_okey", "_fo", sens_shards)], P, drop_after=("_okey",),
        blooms=[sens_bloom],
    )

    on_pred = pa.array(sorted(rules.obj_on_predicate), pa.string())
    invert = rules.invert

    def finish(batch: pa.Table) -> pa.Table:
        import numpy as np

        # pseudonymizer hoisted to the per-process cache (was per batch)
        pseudo = _cached_pseudonymizer(algorithm, secret)

        n = batch.num_rows
        subj_is_iri = pc.equal(batch["subject_kind"], KIND_IRI).to_numpy(zero_copy_only=False)
        obj_is_iri = pc.equal(batch["object_kind"], KIND_IRI).to_numpy(zero_copy_only=False)
        f = lambda c: batch[c].to_numpy(zero_copy_only=False).astype(bool)
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
