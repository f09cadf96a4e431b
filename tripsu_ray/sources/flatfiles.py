"""JSONL and TSV triple sources/sinks — interchange formats beyond the
reference's N-Triples-only wire (src/io.rs:24-43; README.md:25-26 states
N-Triples is the ONLY supported format — these are new surface, kept
byte-round-trip-exact so they compose with every stage).

Both are newline-delimited, so reads reuse the byte-range chunk machinery
from :mod:`.ntriples` (offset read + line-boundary snap): read parallelism
is corpus bytes / chunk size, independent of the file count.

- **JSONL**: one JSON object per line with the full TRIPLES schema
  (subject, subject_kind, predicate, object_value, object_kind,
  object_lang, object_datatype). JSON escaping makes any literal content
  line-safe; kinds are plain ints.
- **TSV**: three tab-separated columns holding the N-Triples TERM
  serializations (``<iri>`` / ``_:id`` / quoted literal with lang/datatype
  tag) — the bracketed forms the rule engine matches on (§2.8.9). The
  N-Triples escaper already removes raw newlines; raw TABS inside literals
  (which the reference's byte format leaves unescaped, rdf_types.rs:242-255)
  are additionally escaped as ``\\t`` (an ECHAR the parser unescapes), so
  columns can never split. Reading rejoins the terms into a line and
  reuses the vectorized N-Triples parser — one code path owns term syntax.
"""

from __future__ import annotations

import io

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.rdf import (
    format_object,
    format_predicate,
    format_subject,
    parse_ntriples_lines,
)
from ..schema import TRIPLES
from .ntriples import _expand_paths, _nt_chunk_specs, _read_nt_chunk

_COLS = list(TRIPLES.names)


def _chunked_lines(paths, suffix: str, target_chunk_bytes: int | None):
    """paths → Dataset of line batches (column ``text``), byte-range split;
    None when the paths aren't locally stat-able (caller falls back)."""
    import ray
    import ray.data

    try:
        plain, gz = _expand_paths(paths, suffix)
        specs = []
        if plain:
            if target_chunk_bytes is None:
                total = sum(
                    s[2] - s[1] for s in _nt_chunk_specs(plain, 1 << 62, suffix)
                )
                cpus = (
                    int(ray.cluster_resources().get("CPU", 8))
                    if ray.is_initialized()
                    else 8
                )
                target_chunk_bytes = min(64 << 20, max(4 << 20, total // (4 * cpus)))
            specs = _nt_chunk_specs(plain, target_chunk_bytes, suffix)
    except OSError:
        return None
    # gz shards: one streaming decode per file (not range-splittable) — same
    # contract as read_ntriples' gz branch
    gz_ds = ray.data.read_text(gz) if gz else None
    if not specs:
        return gz_ds

    def read_chunk(batch: pa.Table) -> pa.Table:
        lines: list[str] = []
        for file, start, end in zip(
            batch["file"].to_pylist(),
            batch["start"].to_pylist(),
            batch["end"].to_pylist(),
        ):
            lines.extend(_read_nt_chunk(file, start, end))
        return pa.table({"text": pa.array(lines, pa.string())})

    specs_ds = ray.data.from_arrow(
        pa.table(
            {
                "file": pa.array([s[0] for s in specs], pa.string()),
                "start": pa.array([s[1] for s in specs], pa.int64()),
                "end": pa.array([s[2] for s in specs], pa.int64()),
            }
        )
    ).repartition(len(specs))
    lines = specs_ds.map_batches(read_chunk, batch_size=1, batch_format="pyarrow")
    return lines.union(gz_ds) if gz_ds is not None else lines


# --- JSONL -----------------------------------------------------------------


def _parse_jsonl_batch(batch: pa.Table) -> pa.Table:
    lines = batch["text"].to_pylist()
    if not lines:
        return pa.table(
            {c: pa.array([], TRIPLES.field(c).type) for c in _COLS}
        )
    df = pd.read_json(
        io.StringIO("\n".join(lines)), lines=True, dtype=False
    )
    for c in _COLS:
        if c not in df.columns:
            df[c] = None
    arrays = []
    for c in _COLS:
        t = TRIPLES.field(c).type
        col = df[c]
        if pa.types.is_int8(t):
            arrays.append(pa.array(col.to_numpy(dtype="int64"), pa.int8()))
        else:
            vals = col.astype(object).where(col.notna(), None)
            arrays.append(pa.array(vals, pa.string()))
    out = dict(zip(_COLS, arrays))
    if "graph" in df.columns:  # quad-aware: the 4th term has a jsonl slot
        g = df["graph"]
        out["graph"] = pa.array(g.astype(object).where(g.notna(), None), pa.string())
    return pa.table(out)


def read_jsonl(paths, *, target_chunk_bytes: int | None = None):
    """JSONL triples → TRIPLES Dataset (byte-range split within files)."""
    import ray.data

    lines = _chunked_lines(paths, ".jsonl", target_chunk_bytes)
    if lines is None:
        lines = ray.data.read_text(paths)
    return lines.map_batches(_parse_jsonl_batch, batch_format="pyarrow")


def write_jsonl(triples, path: str) -> None:
    """triples Dataset → directory of .jsonl shard files."""
    from ray.data.block import BlockAccessor
    from ray.data.datasource import BlockBasedFileDatasink

    class JsonlDatasink(BlockBasedFileDatasink):
        def __init__(self, p):
            super().__init__(p, file_format="jsonl")

        def write_block_to_file(self, block: BlockAccessor, file) -> None:
            df = block.to_pandas()
            cols = _COLS + ["graph"] if "graph" in df.columns else _COLS
            payload = df[cols].to_json(orient="records", lines=True)
            if len(df) and not payload.endswith("\n"):
                payload += "\n"
            file.write(payload.encode("utf-8"))

    triples.write_datasink(JsonlDatasink(path))


# --- TSV -------------------------------------------------------------------


def _tsv_rows(batch: pa.Table) -> pa.Table:
    subj = format_subject(
        batch["subject"].combine_chunks(), batch["subject_kind"].combine_chunks()
    )
    pred = format_predicate(batch["predicate"].combine_chunks())
    obj = format_object(
        batch["object_value"].combine_chunks(),
        batch["object_kind"].combine_chunks(),
        batch["object_lang"].combine_chunks(),
        batch["object_datatype"].combine_chunks(),
    )
    # raw tabs only ever occur inside literal lexical forms; escape as the
    # ECHAR \t so the three columns can never split (parser restores them)
    obj = pc.replace_substring(obj, "\t", "\\t")
    line = pc.binary_join_element_wise(subj, pred, obj, "\t")
    return pa.table({"line": line})


def _parse_tsv_batch(batch: pa.Table) -> pa.Table:
    text = batch["text"]
    # rejoin terms into an N-Triples line; one parser owns term syntax
    line = pc.binary_join_element_wise(
        pc.replace_substring(text, "\t", " "), ".", " "
    )
    return parse_ntriples_lines(pa.table({"text": line}))


def read_tsv(paths, *, target_chunk_bytes: int | None = None):
    """TSV triples (N-Triples term columns) → TRIPLES Dataset."""
    import ray.data

    lines = _chunked_lines(paths, ".tsv", target_chunk_bytes)
    if lines is None:
        lines = ray.data.read_text(paths)
    return lines.map_batches(_parse_tsv_batch, batch_format="pyarrow")


def write_tsv(triples, path: str) -> None:
    """triples Dataset → directory of .tsv shard files."""
    from ray.data.block import BlockAccessor
    from ray.data.datasource import BlockBasedFileDatasink

    class TsvDatasink(BlockBasedFileDatasink):
        def __init__(self, p):
            super().__init__(p, file_format="tsv")

        def write_block_to_file(self, block: BlockAccessor, file) -> None:
            lines = _tsv_rows(block.to_arrow())["line"]
            payload = "\n".join(lines.to_pylist()) + "\n" if len(lines) else ""
            file.write(payload.encode("utf-8"))

    triples.write_datasink(TsvDatasink(path))


# --- N-Quads ----------------------------------------------------------------


def read_nquads(
    paths, *, on_error: str = "raise", counter=None, target_chunk_bytes: int | None = None
):
    """N-Quads → (TRIPLES + nullable graph) Dataset, byte-range split.

    ``counter`` (a JobCounters handle) receives ``malformed_lines`` under the
    skip policy, matching ``read_ntriples``."""
    import ray.data

    from ..functions.rdf import parse_nquads_lines

    lines = _chunked_lines(paths, ".nq", target_chunk_bytes)
    if lines is None:
        lines = ray.data.read_text(paths)
    return lines.map_batches(
        parse_nquads_lines,
        fn_kwargs={"on_error": on_error, "counter": counter},
        batch_format="pyarrow",
    )


def write_nquads(quads, path: str) -> None:
    """(TRIPLES + nullable graph) Dataset → directory of .nq shard files."""
    from ray.data.block import BlockAccessor
    from ray.data.datasource import BlockBasedFileDatasink

    from ..functions.rdf import serialize_nquads

    class NQuadsDatasink(BlockBasedFileDatasink):
        def __init__(self, p):
            super().__init__(p, file_format="nq")

        def write_block_to_file(self, block: BlockAccessor, file) -> None:
            lines = serialize_nquads(block.to_arrow())["line"]
            payload = "\n".join(lines.to_pylist()) + "\n" if len(lines) else ""
            file.write(payload.encode("utf-8"))

    quads.write_datasink(NQuadsDatasink(path))
