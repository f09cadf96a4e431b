"""Skew-aware aggregation helpers (hub keys / hot partitions).

Two complementary strategies, both exact for associative+commutative
aggregations:

1. **Partial combine** (preferred): aggregate inside ``map_batches`` before
   the groupby — bounds each key's shuffle volume at #batches rows no
   matter how hot the key is. Used by the type-index and link-map folds.
2. **Salting** (this module): when per-group work itself must be
   distributed (a single reducer for a hub key would still be hot — e.g.
   heavy per-group computation), split each key into ``salt_factor``
   sub-keys with a deterministic row hash, aggregate (key, salt) groups,
   then merge the (few × salt_factor) partials in a second, tiny groupby.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_AGGS = {"sum": "sum", "min": "min", "max": "max", "count": "sum"}


def salted_aggregate(ds, key: str, value: str, agg: str, *, salt_factor: int = 8):
    """groupby(key).agg over a salted two-stage plan; exact for sum/min/max/count.

    Salt is the row position within the batch modulo ``salt_factor`` —
    deterministic per block (a retried block task replays the same rows in
    the same order) and, unlike a value hash, it spreads a hub key even
    when all its rows carry the SAME value (the common count/flag case,
    where a value hash would put the whole hub in one salt bucket). Never
    ``random`` (retries must reproduce the assignment) and never Python
    ``hash`` (per-process randomized). The aggregate result is
    salt-assignment-independent for these associative aggs regardless.
    """
    from ray.data.aggregate import Max, Min, Sum

    if agg not in _AGGS:
        raise ValueError(f"unsupported agg {agg!r}; one of {sorted(_AGGS)}")

    def add_salt_and_partial(batch: pd.DataFrame) -> pd.DataFrame:
        salt = np.arange(len(batch), dtype="int64") % salt_factor
        col = batch[value] if agg != "count" else pd.Series(np.ones(len(batch), dtype="int64"))
        df = pd.DataFrame({key: batch[key], "_salt": salt.astype("int64"), "_v": col})
        return (
            df.groupby([key, "_salt"], sort=False)["_v"]
            .agg(_AGGS[agg] if agg != "count" else "sum")
            .reset_index()
        )

    partial = ds.map_batches(add_salt_and_partial, batch_format="pandas")
    stage1 = {
        "sum": Sum("_v", alias_name="_v"),
        "count": Sum("_v", alias_name="_v"),
        "min": Min("_v", alias_name="_v"),
        "max": Max("_v", alias_name="_v"),
    }[agg]
    salted = partial.groupby([key, "_salt"]).aggregate(stage1)
    merged = salted.groupby(key).aggregate(
        {
            "sum": Sum("_v", alias_name=agg),
            "count": Sum("_v", alias_name=agg),
            "min": Min("_v", alias_name=agg),
            "max": Max("_v", alias_name=agg),
        }[agg]
    )
    return merged
