"""Final graph materialize: exact dedup + deterministic sort + Parquet sink.

The reference preserves input order and passes duplicates through (no dedup
/ sort operators exist — SURVEY.md §2.4); the north rule adds a *sorted,
deduplicated* materialize so distributed output is deterministic regardless
of block scheduling.

Dedup strategy (scale-first): a vectorized per-batch dedup (partial
combine) shrinks the stream, then one hash-partition shuffle on the full
triple key groups exact duplicates; ``map_groups`` keeps the first row of
each group. Sort is Ray Data's range-partitioned sort on (subject,
predicate, object_value).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
from ..sources import read_parquet_clean as _read_parquet_clean

SORT_KEYS = [
    "subject", "predicate", "object_value", "object_kind",
    "object_lang", "object_datatype",  # full identity: literal variants order deterministically
]
_SEP = "\x1f"


def _triple_key(batch: pa.Table) -> pa.Array:
    return pc.binary_join_element_wise(
        batch["subject"].combine_chunks(),
        pc.cast(batch["subject_kind"].combine_chunks(), pa.string()),
        batch["predicate"].combine_chunks(),
        batch["object_value"].combine_chunks(),
        pc.cast(batch["object_kind"].combine_chunks(), pa.string()),
        pc.fill_null(batch["object_lang"].combine_chunks(), "\x00"),
        pc.fill_null(batch["object_datatype"].combine_chunks(), "\x00"),
        _SEP,
    )


def _dedup_batch(batch: pa.Table) -> pa.Table:
    """Local exact dedup (partial combine before the shuffle)."""
    import numpy as np

    key = _triple_key(batch)
    _, idx = np.unique(key.to_numpy(zero_copy_only=False), return_index=True)
    return batch.take(pa.array(np.sort(idx)))


def dedup_exact(triples) -> "ray.data.Dataset":
    """Distinct triples: local dedup → one shuffle grouped on the triple key.

    Rows sharing the key are byte-identical, so keeping the first row of
    each group is exact; the local pass bounds what the shuffle moves.
    """
    local = triples.map_batches(_dedup_batch, batch_format="pyarrow")
    return _global_dedup(local)


def _global_dedup(local, num_buckets: int = 256, group_fn=None):
    """Group by a hash bucket of the key; dedup each bucket vectorized.

    A per-triple ``map_groups`` would pay Python per group; bucketing by
    ``hash64(key) % B`` gives ~B groups whose bodies dedup with one
    vectorized np.unique each — same single shuffle, no per-row Python.
    The hash is pandas' deterministic SipHash (stable across worker
    processes — the Python builtin ``hash`` is NOT and must never be used
    for partitioning). ``group_fn`` overrides the per-bucket transform
    (default: exact dedup) — the 'bucketed' layout passes a dedup+sort.
    """
    import numpy as np
    import pandas as pd

    def add_bucket(batch: pa.Table) -> pa.Table:
        key = _triple_key(batch)
        h = pd.util.hash_array(key.to_numpy(zero_copy_only=False)) % num_buckets
        return batch.append_column("_bucket", pa.array(h.astype(np.int64)))

    bucketed = local.map_batches(add_bucket, batch_format="pyarrow")
    out = bucketed.groupby("_bucket").map_groups(
        group_fn or _dedup_batch, batch_format="pyarrow"
    )
    return out.drop_columns(["_bucket"])


def dedup_split(
    triples,
    work_dir: str,
    *,
    num_buckets: int = 64,
    timings: dict | None = None,
    output_path: str | None = None,
):
    """Exact global dedup that shuffles only the duplicate candidates.

    The classic full-stream groupby moves EVERY row through an all-to-all to
    remove a tiny fraction of cross-block duplicates. Instead:

    1. checkpoint the locally-deduped stream to Parquet (doubles as the
       resumable stage checkpoint),
    2. census: one map pass emits a 64-bit hash per row; a range-partitioned
       parallel merge finds the duplicated hashes (~8B/row — bounded and
       tiny next to the stream),
    3. split: rows whose hash count == 1 are PROVABLY globally unique and
       bypass the shuffle entirely; only hash-count ≥ 2 rows (true
       duplicates + rare hash collisions) go through the exact grouped
       dedup.

    Collision-safety: a collision between two different rows only promotes
    both to the hot side, where dedup groups by the FULL key — correctness
    never depends on hash uniqueness. Skew-safety: a pathological corpus
    that is mostly duplicates degrades to the full shuffle, never worse.

    With ``output_path`` the split pass reads the checkpoint ONCE: cold
    rows stream straight into the output Parquet while each task spills
    its (few) hot rows to side files, which are then exactly deduped and
    appended to the same output directory — one full read instead of two.
    Returns the re-read output Dataset in that mode, else the lazy union.
    """
    import numpy as np
    import pandas as pd
    import ray.data

    t_path = f"{work_dir}/transformed"

    # write_parquet APPENDS uniquely-named files: stale part-files from a
    # crashed/previous run in any of our directories would silently merge
    # into the "exact dedup" result — start from clean directories (the
    # resumable path's skip-if-complete lives in state/checkpoint.py, which
    # only re-enters here when the stage must actually re-execute)
    import os as _os
    import shutil as _shutil

    for _d in (t_path, f"{work_dir}/hot", output_path):
        if _d and _os.path.isdir(_d):
            _shutil.rmtree(_d)

    def dedup_and_hash(batch: pa.Table) -> pa.Table:
        batch = _dedup_batch(batch)
        h = pd.util.hash_array(_triple_key(batch).to_numpy(zero_copy_only=False))
        return batch.append_column("_h", pa.array(h.astype(np.uint64)))

    import time as _time

    _t0 = _time.perf_counter()
    # lz4 for the checkpoint tier: measured ≈ snappy in wall time but the
    # cheapest encode of the codecs tried (snappy/lz4/none interleaved A/B)
    # and ~42% smaller than uncompressed — right trade for a RAM/odstore
    # staging tier whose files are read back exactly once
    triples.map_batches(dedup_and_hash, batch_format="pyarrow").write_parquet(
        t_path, compression="lz4"
    )
    T = _read_parquet_clean(t_path)
    if timings is not None:
        timings["ckpt_write"] = _time.perf_counter() - _t0
    _t0 = _time.perf_counter()

    # census reads ONLY the stored hash column (parquet column pruning) and
    # finds duplicated hashes with a range-partitioned parallel merge
    # (``partitioned_hot_hashes``): leaves np.unique their block and slice
    # it into contiguous hash ranges for free, one task per range merges
    # across leaves, the driver concatenates only the tiny hot arrays.
    # (History: a distributed groupby-count was 7× slower than folding;
    # the driver fold then the tree reduce were the round-1/2 serial
    # bottlenecks — the tree's merge levels re-sorted the full key set and
    # anti-scaled 4→16. Counts saturate at 2: the split only needs "seen
    # once vs more", and saturation is preserved under merge.)
    from .folds import partitioned_hot_hashes

    import glob as _glob

    files = sorted(_glob.glob(f"{t_path}/*.parquet")) or sorted(
        _glob.glob(f"{t_path}/**/*.parquet", recursive=True)
    )
    if not files:  # non-local checkpoint store: fall back to dataset block refs
        files = _read_parquet_clean(t_path, columns=["_h"]).to_arrow_refs()
    hot = partitioned_hot_hashes(files, column="_h")
    if timings is not None:
        timings["census"] = _time.perf_counter() - _t0
    import ray as _ray

    hot_ref = _ray.put(hot)

    def _is_hot(batch: pa.Table) -> "np.ndarray":
        hot_arr = _ray.get(hot_ref)
        h = batch["_h"].to_numpy(zero_copy_only=False)
        if len(hot_arr) == 0:
            return np.zeros(len(h), dtype=bool)
        idx = np.searchsorted(hot_arr, h)
        idx[idx >= len(hot_arr)] = 0
        return hot_arr[idx] == h

    def split(batch: pa.Table, keep_hot: bool) -> pa.Table:
        mask = _is_hot(batch)
        if not keep_hot:
            mask = ~mask
        return batch.filter(pa.array(mask)).drop_columns(["_h"])

    if output_path is not None:
        # single-read INVERTED split (VERDICT r2 #9 made multi-node-safe):
        # the one pass over the checkpoint writes its COLD rows straight
        # into the output through pyarrow's filesystem layer (resolved
        # from the path/URI, so object stores work — the same contract
        # write_parquet's own tasks rely on) and RETURNS the (few) hot
        # rows as the mapped Dataset — nothing ever lands on task-local
        # disk and the driver never globs (the previous plan's hot-side
        # spill files were only visible on the driver's local fs).
        import uuid as _uuid

        from pyarrow import fs as _pafs

        out_fs, out_base = _pafs.FileSystem.from_uri(output_path) if "://" in str(
            output_path
        ) else (_pafs.LocalFileSystem(), str(output_path))
        out_fs.create_dir(out_base, recursive=True)

        def split_route(batch: pa.Table) -> pa.Table:
            import pyarrow.parquet as _pq

            mask = _is_hot(batch)
            cold_part = batch.filter(pa.array(~mask)).drop_columns(["_h"])
            if cold_part.num_rows:
                with out_fs.open_output_stream(
                    f"{out_base}/{_uuid.uuid4().hex}.parquet"
                ) as f:
                    _pq.write_table(cold_part, f)
            return batch.filter(pa.array(mask)).drop_columns(["_h"])

        hot_side = T.map_batches(split_route, batch_format="pyarrow")
        if len(hot) < 100_000:
            # consuming the stream here IS what drives the cold writes
            hot_tbl = pa.concat_tables(
                list(hot_side.iter_batches(batch_size=1 << 20, batch_format="pyarrow"))
            )
            if hot_tbl.num_rows:
                ray.data.from_arrow(_dedup_batch(hot_tbl)).write_parquet(output_path)
        else:
            _global_dedup(hot_side, num_buckets=num_buckets).write_parquet(output_path)
        return _read_parquet_clean(output_path)

    cold = T.map_batches(split, fn_kwargs={"keep_hot": False}, batch_format="pyarrow")
    hot_ds = T.map_batches(split, fn_kwargs={"keep_hot": True}, batch_format="pyarrow")
    if len(hot) < 100_000:
        # tiny hot set (the common case): driver-side exact dedup beats
        # spinning up a whole distributed sort for a few thousand rows
        hot_tbl = pa.concat_tables(
            list(hot_ds.iter_batches(batch_size=1 << 20, batch_format="pyarrow"))
        ) if hot.size else None
        if hot_tbl is None or hot_tbl.num_rows == 0:
            return cold
        hot_dedup = ray.data.from_arrow(_dedup_batch(hot_tbl))
    else:
        hot_dedup = _global_dedup(hot_ds, num_buckets=num_buckets)
    return cold.union(hot_dedup)


def materialize(
    triples,
    output_path: str | None = None,
    *,
    sort: bool = True,
    layout: str = "bucketed",
    num_buckets: int = 256,
    timings: dict | None = None,
):
    """Deduplicated, deterministically-ordered graph materialize.

    ``layout="bucketed"`` (default, scale path): ONE all-to-all — rows hash-
    partition on the full triple key; each bucket dedups + sorts internally
    (vectorized). Output is deterministic (bucket id + intra-bucket order are
    pure functions of row content) and bucket-partitioned, which is what
    makes reruns resumable per partition and downstream subject-joins
    co-partitioned. ``layout="sorted"`` adds a global range sort (second
    all-to-all) for totally-ordered output.
    """
    if layout == "split":
        if output_path is None:
            raise ValueError("layout='split' needs output_path (for its work dir)")
        import time as _time

        _t0 = _time.perf_counter()
        out = dedup_split(
            triples,
            f"{output_path}_work",
            num_buckets=num_buckets,
            timings=timings,
            output_path=output_path,
        )
        if timings is not None:
            timings["split_write"] = _time.perf_counter() - _t0 - sum(
                timings.get(k, 0.0) for k in ("ckpt_write", "census")
            )
        return out
    elif layout == "sorted":
        out = dedup_exact(triples)
        if sort:
            out = out.sort(SORT_KEYS)
    else:
        local = triples.map_batches(_dedup_batch, batch_format="pyarrow")

        def dedup_sort_bucket(group: pa.Table) -> pa.Table:
            group = _dedup_batch(group)
            order = pc.sort_indices(
                group, sort_keys=[(k, "ascending") for k in SORT_KEYS]
            )
            return group.take(order)

        out = _global_dedup(local, num_buckets=num_buckets, group_fn=dedup_sort_bucket)

    if output_path is not None:
        import os as _os
        import shutil as _shutil
        import time as _time

        # write_parquet appends unique file names — never merge into stale
        # part-files from a previous run
        if _os.path.isdir(output_path):
            _shutil.rmtree(output_path)
        _t0 = _time.perf_counter()
        out.write_parquet(output_path)
        if timings is not None:
            timings["split_write"] = _time.perf_counter() - _t0
        import ray.data

        return _read_parquet_clean(output_path)
    return out
