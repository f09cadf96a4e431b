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


def _fold_batch(batch: pa.Table, relevant_types: list[str] | None) -> pa.Table:
    pairs = _typed_pairs(batch)
    if relevant_types is not None and pairs.num_rows:
        import pyarrow.compute as pc

        mask = pc.is_in(pairs["type"], value_set=pa.array(relevant_types, pa.string()))
        pairs = pairs.filter(mask)
    links = _batch_key_min(batch)
    n_p, n_l = pairs.num_rows, links.num_rows
    return pa.table(
        {
            "tag": pa.array(
                np.concatenate(
                    [np.full(n_p, TAG_PAIR, np.int8), np.full(n_l, TAG_LINK, np.int8),
                     np.full(1, TAG_COUNT, np.int8)]
                )
            ),
            "a": pa.concat_arrays(
                [pairs["subject"].combine_chunks().cast(pa.string()),
                 links["key"].combine_chunks().cast(pa.string()),
                 pa.array([str(batch.num_rows)], pa.string())]
            ),
            "b": pa.concat_arrays(
                [pairs["type"].combine_chunks().cast(pa.string()),
                 links["canonical"].combine_chunks().cast(pa.string()),
                 pa.array([""], pa.string())]
            ),
        }
    )


def fold_pass(triples, relevant_types: list[str] | None = None):
    """One scan → (type_pairs_df, link_map dict, total_row_count)."""
    ds = triples.map_batches(
        _fold_batch,
        fn_kwargs={"relevant_types": relevant_types},
        batch_format="pyarrow",
    )
    frames = [
        b.to_pandas()
        for b in ds.iter_batches(batch_size=1 << 20, batch_format="pyarrow")
    ]
    if not frames:
        return pd.DataFrame({"subject": [], "type": []}), {}, 0
    df = pd.concat(frames, ignore_index=True)
    pairs = df[df["tag"] == TAG_PAIR].rename(columns={"a": "subject", "b": "type"})
    pairs = pairs[["subject", "type"]].drop_duplicates(ignore_index=True)
    links = df[df["tag"] == TAG_LINK]
    link_map = links.groupby("a")["b"].min().to_dict()
    n_rows = int(df.loc[df["tag"] == TAG_COUNT, "a"].astype("int64").sum())
    return pairs, link_map, n_rows


def relevant_types_of(rules_cfg: dict) -> list[str]:
    """Bracketed type keys the rules reference (for the pushdown filter)."""
    from ..functions.rules import Rules

    rules = Rules.from_dict(rules_cfg) if isinstance(rules_cfg, dict) else rules_cfg
    return sorted(set(rules.node_of_type) | set(rules.obj_on_type_predicate))
