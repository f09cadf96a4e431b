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


def _nt_chunk_specs(
    paths, target_chunk_bytes: int, suffix: str = ".nt"
) -> list[tuple[str, int, int]]:
    """(file, start, end) byte ranges covering every line file, ~target each.

    Format-agnostic (the ownership protocol in :func:`_read_nt_chunk` only
    needs newline-delimited records): the JSONL/TSV sources reuse it with
    their own ``suffix``.
    """
    import os

    if isinstance(paths, str):
        paths = [paths]
    files: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            files.extend(
                os.path.join(p, f) for f in sorted(os.listdir(p)) if f.endswith(suffix)
            )
        else:
            files.append(p)
    specs = []
    for f in files:
        size = os.path.getsize(f)
        n = max(1, -(-size // target_chunk_bytes))
        step = -(-size // n)
        specs.extend((f, i * step, min(size, (i + 1) * step)) for i in range(n))
    return specs


def _expand_paths(paths, suffix: str) -> tuple[list[str], list[str]]:
    """paths → (plain_files, gz_files) for one line format.

    Directories contribute their ``{suffix}`` members to the plain list and
    ``{suffix}.gz`` members to the gz list (previously compressed shards in
    a mixed directory were silently ignored). Explicit ``.gz`` paths go gz;
    everything else plain. Raises OSError for non-stat-able paths (remote
    URIs) — callers fall back to ``read_text`` on the raw input.
    """
    import os

    if isinstance(paths, str):
        paths = [paths]
    plain: list[str] = []
    gz: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            for f in sorted(os.listdir(p)):
                if f.endswith(suffix):
                    plain.append(os.path.join(p, f))
                elif f.endswith(suffix + ".gz"):
                    gz.append(os.path.join(p, f))
        elif str(p).endswith(".gz"):
            os.stat(p)
            gz.append(str(p))
        else:
            os.stat(p)
            plain.append(str(p))
    return plain, gz


def _read_nt_chunk(file: str, start: int, end: int) -> list[str]:
    """Read [start, end) snapped to line boundaries.

    Ownership protocol (the classic split-text contract): a line belongs to
    the chunk containing its FIRST byte. A chunk starting mid-file drops
    everything up to its first newline (the previous chunk finishes that
    line); the last line is completed by reading past ``end``.
    """
    with open(file, "rb") as fh:
        if start > 0:
            fh.seek(start - 1)
            prev = fh.read(1)
        else:
            fh.seek(start)
            prev = b"\n"
        data = fh.read(end - start)
        if prev != b"\n":  # mid-line start: the previous chunk owns this line
            nl = data.find(b"\n")
            data = data[nl + 1 :] if nl >= 0 else b""
        if data and not data.endswith(b"\n"):
            while True:
                more = fh.read(1 << 20)
                if not more:
                    break
                nl = more.find(b"\n")
                if nl >= 0:
                    data += more[: nl + 1]
                    break
                data += more
    return [ln for ln in data.decode("utf-8").split("\n") if ln]


def read_ntriples(
    paths,
    *,
    on_error: str = "raise",
    counter=None,
    target_chunk_bytes: int | None = None,
):
    """N-Triples → TRIPLES Dataset, split WITHIN files by byte range.

    ``read_text``'s parallelism is bounded by the file count — a handful of
    big .nt files (the reference's own workload shape: one DBLP dump) caps
    the whole pipeline regardless of cluster size. Here each file is cut
    into ~``target_chunk_bytes`` ranges (the same offset-read trick parquet
    readers use); each task seeks, snaps to line boundaries, and parses its
    chunk in place — read parallelism = corpus bytes / chunk size,
    independent of how the corpus is sharded into files. Works on any
    POSIX-readable store (local disk, NFS, FUSE-mounted object store);
    non-path inputs fall back to ``read_text``.

    ``counter``: optional JobCounters handle — with ``on_error="skip"``,
    dropped malformed lines increment its ``malformed_lines`` count.
    ``target_chunk_bytes`` defaults adaptively: corpus bytes / (4 × cluster
    CPUs), clamped to [4 MB, 64 MB], so small corpora still fan out and
    huge ones don't flood the scheduler with tiny tasks.
    """
    import ray
    import ray.data

    kwargs = {"on_error": on_error, "counter": counter}
    try:
        plain, gz = _expand_paths(paths, ".nt")
        specs = []
        if plain:
            if target_chunk_bytes is None:
                total = sum(s[2] - s[1] for s in _nt_chunk_specs(plain, 1 << 62))
                cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
                target_chunk_bytes = min(64 << 20, max(4 << 20, total // (4 * cpus)))
            specs = _nt_chunk_specs(plain, target_chunk_bytes)
    except OSError:
        specs, gz = [], []
    if not specs and not gz:  # remote URIs etc. — read_text still shards by file
        return ray.data.read_text(paths).map_batches(
            parse_ntriples_lines, fn_kwargs=kwargs, batch_format="pyarrow"
        )
    # gzip shards are not byte-range splittable: one streaming decode task
    # per file (read_text infers the codec from the extension). Parallelism
    # on this branch = file count — shard compressed dumps at ingest.
    gz_ds = (
        ray.data.read_text(gz).map_batches(
            parse_ntriples_lines, fn_kwargs=kwargs, batch_format="pyarrow"
        )
        if gz
        else None
    )
    if not specs:
        return gz_ds

    def parse_chunk(batch: pa.Table) -> pa.Table:
        out = []
        for file, start, end in zip(
            batch["file"].to_pylist(), batch["start"].to_pylist(), batch["end"].to_pylist()
        ):
            lines = _read_nt_chunk(file, start, end)
            out.append(
                parse_ntriples_lines(
                    pa.table({"text": pa.array(lines, pa.string())}), **kwargs
                )
            )
        return pa.concat_tables(out)

    specs_ds = ray.data.from_arrow(
        pa.table(
            {
                "file": pa.array([s[0] for s in specs], pa.string()),
                "start": pa.array([s[1] for s in specs], pa.int64()),
                "end": pa.array([s[2] for s in specs], pa.int64()),
            }
        )
    ).repartition(len(specs))
    chunked = specs_ds.map_batches(parse_chunk, batch_size=1, batch_format="pyarrow")
    return chunked.union(gz_ds) if gz_ds is not None else chunked


def write_ntriples(triples, path: str, *, compression: str | None = None) -> None:
    """triples Dataset → directory of .nt (or .nt.gz) shard files.

    ``compression="gzip"`` emits one gzip stream per shard (the codec is
    applied by the datasink's output stream, inferred from the ``.nt.gz``
    file extension).
    """
    from ray.data.datasource import BlockBasedFileDatasink
    from ray.data.block import BlockAccessor

    if compression not in (None, "gzip"):
        raise ValueError(f"unsupported compression: {compression!r}")

    class NTriplesDatasink(BlockBasedFileDatasink):
        def __init__(self, p):
            super().__init__(p, file_format="nt.gz" if compression else "nt")

        def write_block_to_file(self, block: BlockAccessor, file) -> None:
            # the datasink's output stream already gzip-compresses when the
            # file name ends .gz (codec inferred from the extension), so the
            # payload is written plain on both paths
            table = block.to_arrow()
            lines = serialize_ntriples(table)["line"]
            payload = "\n".join(lines.to_pylist()) + "\n" if len(lines) else ""
            file.write(payload.encode("utf-8"))

    triples.write_datasink(NTriplesDatasink(path))
