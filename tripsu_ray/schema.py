"""Arrow schemas shared across stages.

The triple table is the engine's interchange format. The reference engine
(tripsu) streams RDF triples as sum-typed Rust structs
(``/root/reference/src/rdf_types.rs:17-69``); Arrow has no sum types, so we
flatten to a discriminator (``*_kind``) + nullable payload columns — the
idiomatic columnar encoding (see SURVEY.md §1.3).

Values are stored *bare* (no angle brackets, no ``_:`` prefix, no quotes);
N-Triples serialization and the bracketed "term key" used for rule matching
(reference matches on serialized term strings — src/rules.rs:168-208) are
produced vectorized at the boundary by :mod:`tripsu_ray.functions.rdf`.
"""

from __future__ import annotations

import pyarrow as pa

# --- discriminators ---------------------------------------------------------
KIND_IRI = 0
KIND_BLANK = 1
KIND_LITERAL = 2

KIND_LABELS = {KIND_IRI: "iri", KIND_BLANK: "blank", KIND_LITERAL: "literal"}

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

# --- schemas ----------------------------------------------------------------

#: One row per RDF triple (cf. reference Triple struct, src/rdf_types.rs:17-21).
TRIPLES = pa.schema(
    [
        pa.field("subject", pa.string()),
        pa.field("subject_kind", pa.int8()),  # KIND_IRI | KIND_BLANK
        pa.field("predicate", pa.string()),  # always an IRI
        pa.field("object_value", pa.string()),
        pa.field("object_kind", pa.int8()),  # KIND_IRI | KIND_BLANK | KIND_LITERAL
        pa.field("object_lang", pa.string()),  # nullable; only for literals
        pa.field("object_datatype", pa.string()),  # nullable; only for literals
    ]
)

#: Input corpus per BASELINE.json input_hint: one row per source file.
SOURCE_FILES = pa.schema(
    [
        pa.field("repo", pa.string()),
        pa.field("path", pa.string()),
        pa.field("commit", pa.string()),
        pa.field("lang", pa.string()),
        pa.field("content", pa.string()),
    ]
)

#: Pass-1 type index as a table: one row per (subject term key, type term key)
#: pair (reference materializes subject→[type] JSON, src/index.rs:20-24; we
#: keep the relational form so it can be written/read as Parquet and folded
#: into a broadcast dict).
TYPE_INDEX = pa.schema(
    [
        pa.field("subject", pa.string()),  # bracketed term key, e.g. "<http://…>" / "_:b0"
        pa.field("type", pa.string()),  # bracketed term key of the type IRI
    ]
)


def empty_triples_table() -> pa.Table:
    return TRIPLES.empty_table()


def strip_schema_metadata(batch: pa.Table) -> pa.Table:
    """Zero-copy removal of schema/field metadata from an Arrow batch.

    Parquet files written by pandas carry a ``b"pandas"`` schema-metadata
    blob; a ``pa.Schema`` with ANY metadata is unhashable ("unhashable
    type: 'dict'"), which defeats Ray Data's block-schema deduplication in
    every reduce task (transform_pyarrow.py falls back to a full
    ``unify_schemas`` pass per reduce and logs a warning). Stripping costs
    one schema object — the column buffers are untouched.
    """
    if batch.schema.metadata:
        batch = batch.replace_schema_metadata(None)
    if any(f.metadata for f in batch.schema):
        batch = batch.cast(pa.schema([f.remove_metadata() for f in batch.schema]))
    return batch
