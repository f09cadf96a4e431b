"""Combined partial-aggregate pass: type-index pairs + link-map in ONE scan.

Both pass-1 artifacts are associative partial aggregates over the same
triple stream (distinct (subject, type) pairs; per-key MIN canonical IRI).
Folding them in one ``map_batches`` pass halves the number of full scans —
at 10^12 scale a full scan is the unit of cost, so never pay two where one
suffices.

Pushdown: the compiled matcher only consumes (subject, type) pairs whose
type is referenced by the rules (``of_type`` ∪ ``on_type_predicate`` keys);
``relevant_types`` prunes everything else before rows ever reach the driver
fold — the fold's memory is then bounded by rule-relevant subjects, not all
typed subjects.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .index import _typed_pairs
from .link import _batch_key_min

TAG_PAIR = 0
TAG_LINK = 1
TAG_COUNT = 2
TAG_RISK = 3


def _risk_count(batch: pa.Table, risk_predicates, risk_prefixes) -> int:
    """Rows whose OBJECT is an IRI under a protected prefix AND whose
    predicate is named by an object rule — an over-approximation (type
    gating ignored) of 'this object rule rewrites a linkable IRI'. Zero
    PROVES the optimistic raw-stream link map exact for these rules."""
    import pyarrow.compute as pc

    from ..schema import KIND_IRI

    if not risk_predicates or not risk_prefixes:
        return 0
    # cheap masks first (int8 equality + hash-set probe), then run the
    # per-prefix starts_with string passes over only the surviving rows —
    # risk-predicate IRI objects are typically a sliver of the stream, so
    # this keeps the counter's cost proportional to candidates, not batch
    m = pc.and_(
        pc.equal(batch["object_kind"], KIND_IRI),
        pc.is_in(batch["predicate"], value_set=pa.array(risk_predicates, pa.string())),
    )
    if not pc.any(m).as_py():
        return 0
    obj = batch["object_value"].filter(m).combine_chunks()
    pref = pc.starts_with(obj, risk_prefixes[0])
    for p in risk_prefixes[1:]:
        pref = pc.or_(pref, pc.starts_with(obj, p))
    return pc.sum(pref).as_py() or 0


def _fold_batch(
    batch: pa.Table,
    relevant_types: list[str] | None,
    risk_predicates: list[str] | None = None,
    risk_prefixes: tuple = (),
) -> pa.Table:
    pairs = _typed_pairs(batch)
    if relevant_types is not None and pairs.num_rows:
        import pyarrow.compute as pc

        mask = pc.is_in(pairs["type"], value_set=pa.array(relevant_types, pa.string()))
        pairs = pairs.filter(mask)
    links = _batch_key_min(batch)
    n_risk = _risk_count(batch, risk_predicates, risk_prefixes)
    n_p, n_l = pairs.num_rows, links.num_rows
    return pa.table(
        {
            "tag": pa.array(
                np.concatenate(
                    [np.full(n_p, TAG_PAIR, np.int8), np.full(n_l, TAG_LINK, np.int8),
                     np.array([TAG_COUNT, TAG_RISK], np.int8)]
                )
            ),
            "a": pa.concat_arrays(
                [pairs["subject"].combine_chunks().cast(pa.string()),
                 links["key"].combine_chunks().cast(pa.string()),
                 pa.array([str(batch.num_rows), str(n_risk)], pa.string())]
            ),
            "b": pa.concat_arrays(
                [pairs["type"].combine_chunks().cast(pa.string()),
                 links["canonical"].combine_chunks().cast(pa.string()),
                 pa.array(["", ""], pa.string())]
            ),
        }
    )


def fold_pass(
    triples,
    relevant_types: list[str] | None = None,
    *,
    risk_predicates: list[str] | None = None,
    risk_prefixes: tuple = (),
    timings: dict | None = None,
):
    """One scan → (type_pairs_df, link_map dict, total_rows, risk_rows).

    ``risk_rows`` counts triples whose IRI object lies under a
    ``risk_prefixes`` namespace while the predicate is in
    ``risk_predicates`` (the object-rule predicates): zero proves — against
    the data, not just the rules — that object rules never rewrite a
    linkable IRI, so the link map folded from this same (raw) scan is exact.

    The per-block partials are combined by a TREE REDUCE (see
    :func:`tree_fold_tables`): per-block combine already ran inside
    ``_fold_batch`` (dedup/min), intermediate combiner tasks merge ~FANIN
    blocks each, and the driver only folds the few pre-reduced roots — the
    driver-side serial term is O(distinct keys / FANIN-compressed), no
    longer the full concat of every block's partial.
    """
    ds = triples.map_batches(
        _fold_batch,
        fn_kwargs={
            "relevant_types": relevant_types,
            "risk_predicates": risk_predicates,
            "risk_prefixes": tuple(risk_prefixes),
        },
        batch_format="pyarrow",
    )
    df = tree_fold_tables(ds, _combine_fold_frames, timings=timings)
    if df is None or not len(df):
        return pd.DataFrame({"subject": [], "type": []}), {}, 0, 0
    pairs = df[df["tag"] == TAG_PAIR].rename(columns={"a": "subject", "b": "type"})
    pairs = pairs[["subject", "type"]].drop_duplicates(ignore_index=True)
    links = df[df["tag"] == TAG_LINK]
    link_map = links.groupby("a")["b"].min().to_dict()
    n_rows = int(df.loc[df["tag"] == TAG_COUNT, "a"].astype("int64").sum())
    n_risk = int(df.loc[df["tag"] == TAG_RISK, "a"].astype("int64").sum())
    return pairs, link_map, n_rows, n_risk


def fold_pass_sided(
    triples,
    relevant_types: list[str] | None = None,
    *,
    side_col: str = "_delta",
    risk_predicates: list[str] | None = None,
    risk_prefixes: tuple = (),
    timings: dict | None = None,
):
    """ONE scan over a side-tagged triple stream (``side_col`` ∈ {0, 1})
    → :func:`fold_pass`'s result tuple for EACH side.

    The incremental pipeline needs independent base and delta folds; two
    ``fold_pass`` calls over the filtered sides each re-read the whole
    tagged stream — two full scans where one suffices (this module's
    founding rule). Here ``_fold_batch`` runs per side sub-batch inside a
    single pass, partial rows carry a ``side`` column, and the tree
    combine dedups/mins/sums per (side, tag).
    """
    def fold2(batch: pa.Table) -> pa.Table:
        karr = batch.column(side_col).to_numpy(zero_copy_only=False)
        t = batch.drop_columns([side_col])
        parts = []
        for side in (0, 1):
            m = karr == side
            if m.any():
                p = _fold_batch(
                    t.filter(pa.array(m)) if not m.all() else t,
                    relevant_types, risk_predicates, tuple(risk_prefixes),
                )
                parts.append(
                    p.append_column(
                        "side", pa.array(np.full(p.num_rows, side, np.int8))
                    )
                )
        if not parts:
            return pa.table(
                {"tag": pa.array([], pa.int8()), "a": pa.array([], pa.string()),
                 "b": pa.array([], pa.string()), "side": pa.array([], pa.int8())}
            )
        return pa.concat_tables(parts)

    ds = triples.map_batches(fold2, batch_format="pyarrow")
    df = tree_fold_tables(ds, _combine_fold_frames_sided, timings=timings)
    out = []
    for side in (0, 1):
        sub = df[df["side"] == side] if df is not None else None
        if sub is None or not len(sub):
            out.append((pd.DataFrame({"subject": [], "type": []}), {}, 0, 0))
            continue
        pairs = sub[sub["tag"] == TAG_PAIR].rename(
            columns={"a": "subject", "b": "type"}
        )
        pairs = pairs[["subject", "type"]].drop_duplicates(ignore_index=True)
        links = sub[sub["tag"] == TAG_LINK]
        link_map = links.groupby("a")["b"].min().to_dict()
        n_rows = int(sub.loc[sub["tag"] == TAG_COUNT, "a"].astype("int64").sum())
        n_risk = int(sub.loc[sub["tag"] == TAG_RISK, "a"].astype("int64").sum())
        out.append((pairs, link_map, n_rows, n_risk))
    return tuple(out)


def _combine_fold_frames_sided(frames: list[pd.DataFrame]) -> pd.DataFrame:
    """Per-(side, tag) associative combine — :func:`_combine_fold_frames`
    with the side key threaded through dedup/min/sum."""
    df = pd.concat(frames, ignore_index=True)
    pairs = df[df["tag"] == TAG_PAIR].drop_duplicates(["side", "a", "b"])
    links = (
        df[df["tag"] == TAG_LINK]
        .groupby(["side", "a"], sort=False, as_index=False)["b"]
        .min()
        .assign(tag=TAG_LINK)
    )
    sums = []
    for side in sorted(df["side"].unique()):
        sdf = df[df["side"] == side]
        for tag in (TAG_COUNT, TAG_RISK):
            total = sdf.loc[sdf["tag"] == tag, "a"].astype("int64").sum()
            sums.append((tag, str(int(total)), "", side))
    sums_df = pd.DataFrame(sums, columns=["tag", "a", "b", "side"])
    out = pd.concat(
        [pairs, links[["tag", "a", "b", "side"]], sums_df], ignore_index=True
    )
    out["tag"] = out["tag"].astype("int8")
    out["side"] = out["side"].astype("int8")
    return out


def fold_pass_compiled(
    triples,
    rules_cfg,
    *,
    link_prefixes: tuple = (),
    timings: dict | None = None,
):
    """One scan → (matcher_ref, link_map_ref, n_triples, n_risk, node_risky).

    Same scan as :func:`fold_pass`, but the serial tail — final combine,
    ``CompiledMatcher`` compile, link-map build, and the node-rule static
    analysis — runs in ONE remote finalize task whose return refs are
    handed straight to pass 2 as the broadcast objects. The index never
    materializes on the driver (fold_pass's combine → re-dedup → compile →
    ``ray.put`` chain was three redundant serial passes over the pair set,
    the last serial term in the 4→16 scaling profile); the driver fetches
    only a stats tuple.

    ``node_risky`` is :func:`~tripsu_ray.functions.engine.node_rewrites_any_prefix`
    over ``link_prefixes`` — computed in the finalize task because it scans
    the sensitive set.
    """
    import ray

    from ..functions.engine import CompiledMatcher, node_rewrites_any_prefix
    from ..functions.rules import Rules

    rules = Rules.from_dict(rules_cfg) if isinstance(rules_cfg, dict) else rules_cfg
    relevant = relevant_types_of(rules)
    risk_preds = risk_predicates_of(rules)
    ds = triples.map_batches(
        _fold_batch,
        fn_kwargs={
            "relevant_types": relevant,
            "risk_predicates": risk_preds,
            "risk_prefixes": tuple(link_prefixes),
        },
        batch_format="pyarrow",
    )

    @ray.remote(num_returns=3)
    def _finalize(*tables):
        frames = [t.to_pandas() if isinstance(t, pa.Table) else t for t in tables]
        frames = [f for f in frames if len(f.columns)]  # see _merge
        if not frames:
            frames = [pd.DataFrame({"tag": [], "a": [], "b": []})]
        df = _combine_fold_frames(frames)
        # _combine_fold_frames output is already deduped/min-combined
        pairs = df[df["tag"] == TAG_PAIR].rename(columns={"a": "subject", "b": "type"})
        links = df[df["tag"] == TAG_LINK]
        link_map = dict(zip(links["a"], links["b"]))
        n_rows = int(df.loc[df["tag"] == TAG_COUNT, "a"].astype("int64").sum())
        n_risk = int(df.loc[df["tag"] == TAG_RISK, "a"].astype("int64").sum())
        matcher = CompiledMatcher(rules, pairs[["subject", "type"]])
        node_risky = node_rewrites_any_prefix(matcher, tuple(link_prefixes))
        return matcher, link_map, (n_rows, n_risk, node_risky)

    import time as _time

    refs = _rolling_tree_refs(ds, _combine_fold_frames, timings=timings)
    _t0 = _time.perf_counter()
    if not refs:
        matcher = CompiledMatcher(rules, pd.DataFrame({"subject": [], "type": []}))
        return ray.put(matcher), ray.put({}), 0, 0, False
    matcher_ref, link_map_ref, stats_ref = _finalize.remote(*refs)
    n_rows, n_risk, node_risky = ray.get(stats_ref)
    if timings is not None:
        timings["fold_tail"] = _time.perf_counter() - _t0
    return matcher_ref, link_map_ref, n_rows, n_risk, node_risky


def _combine_fold_frames(frames: list[pd.DataFrame]) -> pd.DataFrame:
    """Associative combine for fold_pass partials (any subset of blocks).

    Dedup the PAIR rows, MIN-reduce the LINK rows, SUM the COUNT/RISK rows —
    each is associative+commutative, so combining in any tree shape is exact.
    """
    df = pd.concat(frames, ignore_index=True)
    pairs = df[df["tag"] == TAG_PAIR].drop_duplicates(["a", "b"])
    links = (
        df[df["tag"] == TAG_LINK]
        .groupby("a", sort=False, as_index=False)["b"]
        .min()
        .assign(tag=TAG_LINK)
    )
    sums = []
    for tag in (TAG_COUNT, TAG_RISK):
        total = df.loc[df["tag"] == tag, "a"].astype("int64").sum()
        sums.append((tag, str(int(total)), ""))
    sums_df = pd.DataFrame(sums, columns=["tag", "a", "b"])
    out = pd.concat([pairs, links[["tag", "a", "b"]], sums_df], ignore_index=True)
    out["tag"] = out["tag"].astype("int8")
    return out


def partitioned_hot_hashes(items, *, column: str = "_h", num_partitions: int = 16):
    """Hashes occurring ≥2 times across blocks, via a range-partitioned merge.

    The tree-reduce census anti-scaled: every merge level re-sorts the FULL
    (still ~distinct) hash set, so adding CPUs just adds contention around a
    big serial root. Here the 64-bit hash space is cut into
    ``num_partitions`` contiguous ranges: each leaf task np.uniques its
    input (sorted output → partition boundaries are free ``searchsorted``
    slices), each range merges across all leaves in ONE parallel task, and
    the driver concatenates only the tiny hot arrays (already in global
    order, ranges being contiguous). All-to-all traffic is 8 bytes/distinct
    row; no stage touches more than 1/num_partitions of the key space.

    ``items`` is a list of Arrow-table ObjectRefs OR parquet file paths
    (paths skip the Dataset executor entirely: leaves read just ``column``
    with parquet column pruning). ``num_partitions`` must be a power of two.
    """
    import ray

    shift = np.uint64(64 - int(num_partitions).bit_length() + 1)
    if (1 << (64 - int(shift))) != num_partitions:
        raise ValueError("num_partitions must be a power of two")

    @ray.remote(num_returns=num_partitions)
    def _leaf(*ts):
        arrs = []
        for t in ts:
            if isinstance(t, str):
                import pyarrow.parquet as pq

                t = pq.read_table(t, columns=[column])
            arrs.append(t[column].to_numpy(zero_copy_only=False))
        uniq, cnt = np.unique(np.concatenate(arrs), return_counts=True)
        cnt = np.minimum(cnt, 2).astype(np.uint8)
        bounds = np.searchsorted(
            uniq, np.arange(1, num_partitions, dtype=np.uint64) << shift
        )
        parts = tuple(
            (u, c) for u, c in zip(np.split(uniq, bounds), np.split(cnt, bounds))
        )
        return parts if num_partitions > 1 else parts[0]

    @ray.remote
    def _hot(*parts):
        hs = np.concatenate([p[0] for p in parts])
        cs = np.concatenate([p[1] for p in parts]).astype(np.int64)
        order = np.argsort(hs, kind="stable")
        hs, cs = hs[order], cs[order]
        uniq, idx = np.unique(hs, return_index=True)
        tot = np.add.reduceat(cs, idx) if len(hs) else cs
        return uniq[tot > 1]

    items = list(items)
    if not items:
        return np.array([], dtype=np.uint64)
    # chunk blocks into ~2×CPU leaf tasks: hundreds of tiny leaves × P
    # returns each made driver-side ref bookkeeping the census's fixed cost
    n_leaves = min(len(items), 2 * int(ray.cluster_resources().get("CPU", 16)))
    chunk = -(-len(items) // n_leaves)
    leaf_outs = [
        _leaf.remote(*items[i : i + chunk]) for i in range(0, len(items), chunk)
    ]
    if num_partitions == 1:
        # num_returns=1 remotes yield a bare ObjectRef (not indexable)
        hot_parts = ray.get([_hot.remote(*leaf_outs)])
    else:
        hot_parts = ray.get(
            [_hot.remote(*[lo[p] for lo in leaf_outs]) for p in range(num_partitions)]
        )
    return np.concatenate(hot_parts)  # ranges are contiguous → already sorted


def _rolling_tree_refs(ds, combine_frames, *, fanin: int = 16, timings: dict | None = None):
    """Rolling tree reduce over a Dataset's blocks; returns ObjectRefs.

    Merge tasks launch as soon as ``fanin`` block refs materialize,
    overlapping the reduction with upstream execution (the same overlap a
    streaming driver fold has, without its single-process linear concat).
    Returns the ≤ 2×fanin refs still outstanding — merge-task results plus
    a sub-fanin tail of raw block refs (Arrow or pandas) — for the caller
    to finalize; empty list for an empty dataset.
    """
    import time as _time

    import ray

    @ray.remote
    def _merge(*tables):
        frames = [t.to_pandas() if isinstance(t, pa.Table) else t for t in tables]
        # Ray emits 0-row blocks with an EMPTY schema (no columns) for
        # map_batches stages whose input block was empty — they would break
        # column-based combines, so drop them before folding
        frames = [f for f in frames if len(f.columns)]
        return combine_frames(frames) if frames else pd.DataFrame()

    _t0 = _time.perf_counter()
    pending: list = []
    merged: list = []
    for bundle in ds.iter_internal_ref_bundles():
        for block_ref in bundle.block_refs:
            pending.append(block_ref)
            if len(pending) >= fanin:
                merged.append(_merge.remote(*pending))
                pending = []
                if len(merged) >= fanin:  # second rolling level
                    merged = [_merge.remote(*merged)]
    if timings is not None:
        timings["fold_consume"] = _time.perf_counter() - _t0
    return merged + pending


def tree_fold_tables(ds, combine_frames, *, fanin: int = 16, timings: dict | None = None):
    """Fold a (small-rows) Dataset to ONE driver-side pandas DataFrame via
    :func:`_rolling_tree_refs`. Returns None for an empty dataset.

    ``combine_frames(list[pd.DataFrame]) -> pd.DataFrame`` must be
    associative + commutative.
    """
    import time as _time

    import ray

    refs = _rolling_tree_refs(ds, combine_frames, fanin=fanin, timings=timings)
    _t0 = _time.perf_counter()
    if not refs:
        return None
    frames = [
        t.to_pandas() if isinstance(t, pa.Table) else t for t in ray.get(refs)
    ]
    frames = [f for f in frames if len(f.columns)]  # see _merge
    if not frames:
        return None
    out = combine_frames(frames)
    if timings is not None:
        timings["fold_tail"] = _time.perf_counter() - _t0
    return out


def relevant_types_of(rules_cfg: dict) -> list[str]:
    """Bracketed type keys the rules reference (for the pushdown filter)."""
    from ..functions.rules import Rules

    rules = Rules.from_dict(rules_cfg) if isinstance(rules_cfg, dict) else rules_cfg
    return sorted(set(rules.node_of_type) | set(rules.obj_on_type_predicate))


def risk_predicates_of(rules_cfg) -> list[str]:
    """BARE predicate IRIs named by object rules (for the risk counter).

    on_predicate / on_type_predicate rewrite whatever object the matched
    triple carries — IRI objects included (src/crypto.rs:19-46). The fold's
    risk counter checks these predicates against IRI objects in protected
    namespaces; the ``predicate`` column stores bare IRIs, so strip the
    brackets the rules keep for term-key matching.
    """
    from ..functions.rules import Rules

    rules = Rules.from_dict(rules_cfg) if isinstance(rules_cfg, dict) else rules_cfg
    keys = set(rules.obj_on_predicate)
    for ps in rules.obj_on_type_predicate.values():
        keys |= set(ps)
    return sorted(k[1:-1] if k.startswith("<") and k.endswith(">") else k for k in keys)
