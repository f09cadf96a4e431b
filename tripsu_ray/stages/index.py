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


def build_type_index(triples) -> "ray.data.Dataset":
    """triples Dataset → distinct (subject, type) Dataset (the type index)."""
    pairs = triples.map_batches(_typed_pairs, batch_format="pyarrow")
    # global distinct (shuffle on subject+type; input already locally deduped)
    return pairs.groupby(["subject", "type"]).count().select_columns(["subject", "type"])


def collect_index(index_ds) -> dict[str, tuple[str, ...]]:
    """Fold the index Dataset into {subject_key: (type_key, ...)} on the driver.

    Streaming consumption (iter_batches) — never take_all on raw triples;
    the index is bounded by #distinct typed subjects, not corpus size.
    """
    index: dict[str, tuple[str, ...]] = {}
    for batch in index_ds.iter_batches(batch_size=65536, batch_format="pyarrow"):
        for s, t in zip(batch["subject"].to_pylist(), batch["type"].to_pylist()):
            cur = index.get(s, ())
            if t not in cur:
                index[s] = cur + (t,)
    return index


def broadcast_index(index: dict):
    """ray.put once; actors resolve the ObjectRef in __init__ (zero re-ship)."""
    import ray

    return ray.put(index)
