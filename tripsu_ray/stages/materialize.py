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

SORT_KEYS = ["subject", "predicate", "object_value", "object_kind"]
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


def _global_dedup(local, num_buckets: int = 256):
    """Group by a hash bucket of the key; dedup each bucket vectorized.

    A per-triple ``map_groups`` would pay Python per group; bucketing by
    ``hash64(key) % B`` gives ~B groups whose bodies dedup with one
    vectorized np.unique each — same single shuffle, no per-row Python.
    The hash is pandas' deterministic SipHash (stable across worker
    processes — the Python builtin ``hash`` is NOT and must never be used
    for partitioning).
    """
    import numpy as np
    import pandas as pd

    def add_bucket(batch: pa.Table) -> pa.Table:
        key = _triple_key(batch)
        h = pd.util.hash_array(key.to_numpy(zero_copy_only=False)) % num_buckets
        return batch.append_column("_bucket", pa.array(h.astype(np.int64)))

    def dedup_bucket(group: pa.Table) -> pa.Table:
        return _dedup_batch(group)

    bucketed = local.map_batches(add_bucket, batch_format="pyarrow")
    out = bucketed.groupby("_bucket").map_groups(dedup_bucket, batch_format="pyarrow")
    return out.drop_columns(["_bucket"])


def materialize(triples, output_path: str | None = None, *, sort: bool = True):
    """dedup → sort → (optionally) write partitioned Parquet; returns Dataset."""
    out = dedup_exact(triples)
    if sort:
        out = out.sort(SORT_KEYS)
    if output_path is not None:
        out.write_parquet(output_path)
        import ray.data

        return ray.data.read_parquet(output_path)
    return out
