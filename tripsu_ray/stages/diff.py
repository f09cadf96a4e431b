"""Distributed symmetric difference of two Datasets — the graph-diff /
snapshot-audit primitive (which triples did this commit add/remove?).

Plan: the two streams union with a side tag (one schema), co-partition on
the hash of the FULL key row (equal rows co-locate — exactness argument
identical to the dedup exchange), and each partition classifies its keys
vectorized: present on one side only → emitted with ``side = "added"`` /
``"removed"``. Shuffle volume is both inputs once; no driver state; the
common subset (usually the overwhelming mass of a snapshot diff) is
dropped inside the partitions, never re-shipped.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def symmetric_diff(
    ds_old,
    ds_new,
    key_cols: list[str],
    *,
    num_partitions: int = 16,
    added: str = "added",
    removed: str = "removed",
):
    """Rows (DISTINCT over ``key_cols``) in exactly one input → those
    columns + ``side`` (``added`` = only in ``ds_new``, ``removed`` =
    only in ``ds_old``)."""

    def tag(side):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            df = df[key_cols].drop_duplicates()
            out = df.astype(object)
            out["_side"] = np.int8(side)
            key = out[key_cols[0]].astype(str)
            for c in key_cols[1:]:
                key = key + "\x00" + out[c].astype(str)
            out["_part"] = (
                pd.util.hash_array(key.to_numpy(dtype=object)) % num_partitions
            ).astype("int64")
            return out

        return f

    def classify(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {**{c: pd.Series([], dtype=object) for c in key_cols},
             "side": pd.Series([], dtype=object)}
        )
        if not len(g) or "_side" not in g.columns:
            return empty
        old = g[g["_side"] == 0][key_cols].drop_duplicates()
        new = g[g["_side"] == 1][key_cols].drop_duplicates()
        m = old.merge(new, on=key_cols, how="outer", indicator=True)
        only_old = m[m["_merge"] == "left_only"][key_cols].astype(object)
        only_new = m[m["_merge"] == "right_only"][key_cols].astype(object)
        only_old["side"] = removed
        only_new["side"] = added
        return pd.concat([only_old, only_new], ignore_index=True)

    u = ds_old.map_batches(tag(0), batch_format="pandas").union(
        ds_new.map_batches(tag(1), batch_format="pandas")
    )
    return u.groupby("_part").map_groups(classify, batch_format="pandas")
