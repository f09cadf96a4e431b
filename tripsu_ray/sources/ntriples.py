"""N-Triples source/sink — tripsu's wire format (reference src/io.rs:24-43).

Reading: ``ray.data.read_text`` shards line files across read tasks; a
vectorized single-regex parse per batch turns lines into the TRIPLES schema
(reference panics on malformed lines, src/pseudo.rs:73-75 — here the policy
is explicit: ``on_error="raise" | "skip"``).

Writing: serialized vectorized (pyarrow join kernels) and written through a
``BlockBasedFileDatasink`` producing ``.nt`` shards — one file per block,
the distributed analogue of the reference's single stdout stream. Byte-level
format (brackets, ``_:``, quoting, escaping) matches src/rdf_types.rs:71-128.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.rdf import parse_ntriples_lines, serialize_ntriples


def read_ntriples(paths, *, on_error: str = "raise", counter=None):
    """``counter``: optional JobCounters handle — with ``on_error="skip"``,
    dropped malformed lines increment its ``malformed_lines`` count."""
    import ray.data

    ds = ray.data.read_text(paths)
    return ds.map_batches(
        parse_ntriples_lines,
        fn_kwargs={"on_error": on_error, "counter": counter},
        batch_format="pyarrow",
    )


def write_ntriples(triples, path: str) -> None:
    """triples Dataset → directory of .nt shard files."""
    from ray.data.datasource import BlockBasedFileDatasink
    from ray.data.block import BlockAccessor

    class NTriplesDatasink(BlockBasedFileDatasink):
        def __init__(self, p):
            super().__init__(p, file_format="nt")

        def write_block_to_file(self, block: BlockAccessor, file) -> None:
            table = block.to_arrow()
            lines = serialize_ntriples(table)["line"]
            payload = "\n".join(lines.to_pylist()) + "\n" if len(lines) else ""
            file.write(payload.encode("utf-8"))

    triples.write_datasink(NTriplesDatasink(path))
