"""Pass 1 — rdf:type index build (reference: src/index.rs:95-112).

The reference mutates an in-RAM HashMap per triple; here the same result is
a Dataset pipeline: filter ``predicate == rdf:type`` → vectorized term-key
formatting → **per-batch dedup (partial combine)** → global distinct via
``groupby``. The per-batch dedup collapses the heavy repetition of (subject,
type) pairs (every Module row repeats per import) before the shuffle — the
shuffle then moves only near-distinct pairs.

The index is the *small side* of the pass-2 broadcast hash semi-join
(SURVEY.md §2.4 A2): ``collect_index`` folds it into a plain dict and
``ray.put``s it once; every pseudonymization actor resolves the ObjectRef in
``__init__``. For an index too large for one object, the documented fallback
is a hash-partitioned join on the same keys (same semantics, different
plan) — see stages/pseudo.py.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..functions.rdf import format_object, format_subject
from ..schema import RDF_TYPE, TYPE_INDEX


def _typed_pairs(batch: pa.Table) -> pa.Table:
    """Filter rdf:type triples → distinct (subject-key, type-key) pairs."""
    mask = pc.equal(batch["predicate"], RDF_TYPE)
    typed = batch.filter(mask)
    if typed.num_rows == 0:
        return TYPE_INDEX.empty_table()
    subj = format_subject(
        typed["subject"].combine_chunks(), typed["subject_kind"].combine_chunks()
    )
    typ = format_object(
        typed["object_value"].combine_chunks(),
        typed["object_kind"].combine_chunks(),
        typed["object_lang"].combine_chunks(),
        typed["object_datatype"].combine_chunks(),
    )
    pairs = pa.table({"subject": subj, "type": typ}, schema=TYPE_INDEX)
    # partial combine: local dedup before the groupby shuffle
    return pairs.group_by(["subject", "type"]).aggregate([])


def build_type_index(triples, *, num_parts: int = 32) -> "ray.data.Dataset":
    """triples Dataset → globally-distinct (subject, type) Dataset.

    Use this when the index itself is the output (write_parquet / the
    kg_type_index query). For the broadcast path use :func:`collect_index`
    on :func:`type_index_pairs` — the driver fold dedups anyway, so the
    groupby shuffle would be pure overhead.

    Global distinct = coarse hash partition on the pair + vectorized
    per-partition dedup. A direct multi-key ``groupby().count()`` over
    millions of near-singleton (subject, type) groups wedges Ray 2.49's
    sort-based aggregate (measured: hangs at ~3M groups), so the wide step
    is a single-int-key groupby over ``num_parts`` coarse partitions.
    """
    import pandas as pd

    def add_part(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.copy()
        h = pd.util.hash_array(
            (df["subject"] + "\x00" + df["type"]).to_numpy(dtype=object)
        )
        df["_part"] = (h % num_parts).astype("int64")
        return df

    def dedup_part(g: "pd.DataFrame") -> "pd.DataFrame":
        return g[["subject", "type"]].drop_duplicates(ignore_index=True)

    return (
        type_index_pairs(triples)
        .map_batches(add_part, batch_format="pandas")
        .groupby("_part")
        .map_groups(dedup_part, batch_format="pandas")
    )


def type_index_pairs(triples) -> "ray.data.Dataset":
    """Locally-deduped (subject, type) pairs — no global shuffle."""
    return triples.map_batches(_typed_pairs, batch_format="pyarrow")


def _combine_pair_frames(frames):
    import pandas as pd

    return pd.concat(frames, ignore_index=True).drop_duplicates(ignore_index=True)


def collect_index_df(pairs_ds) -> "pd.DataFrame":
    """Fold (subject, type) pairs into a distinct two-column DataFrame.

    Accepts either the shuffled (build_type_index) or the shuffle-free
    (type_index_pairs) dataset. Distinct-set union is associative, so the
    per-block partials are TREE-reduced (intermediate dedup tasks →
    driver folds only the roots — see stages.folds.tree_fold_tables); the
    driver's serial term is bounded by #distinct typed subjects / fan-in,
    not by #blocks × per-block rows. This relational form feeds the
    vectorized CompiledMatcher build directly.
    """
    import pandas as pd

    from .folds import tree_fold_tables

    df = tree_fold_tables(pairs_ds, _combine_pair_frames)
    if df is None or not len(df):
        return pd.DataFrame({"subject": [], "type": []})
    return df.drop_duplicates(ignore_index=True)


def collect_index(pairs_ds) -> dict[str, tuple[str, ...]]:
    """{subject_key: (type_key, ...)} dict view (tests / small indexes)."""
    df = collect_index_df(pairs_ds)
    return {s: tuple(g) for s, g in df.groupby("subject", sort=False)["type"]}


def broadcast_index(index: dict):
    """ray.put once; actors resolve the ObjectRef in __init__ (zero re-ship)."""
    import ray

    return ray.put(index)
