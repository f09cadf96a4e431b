"""Readers/writers and the deterministic source_files synthesizer."""


def _clean_footer_schema(path):
    """Metadata-stripped footer schema of ``path`` (file or dir), or None.

    Passing an explicit clean ``schema`` to ``read_parquet`` keeps the
    pandas parquet metadata (an unhashable dict) out of the read tasks'
    block schemas entirely — without it, Ray's per-RefBundle schema
    dedup logs "Failed to hash the schemas" once per read task before
    the strip stage runs.
    """
    import os

    import pyarrow.parquet as pq

    try:
        p = path[0] if isinstance(path, (list, tuple)) else path
        if os.path.isdir(p):
            names = sorted(n for n in os.listdir(p) if n.endswith(".parquet"))
            if not names:
                return None
            p = os.path.join(p, names[0])
        return pq.read_schema(p).remove_metadata()
    except Exception:
        return None  # non-local paths / odd layouts: fall back to strip-only


def read_parquet_clean(*args, **kwargs):
    """``ray.data.read_parquet`` + metadata strip (hashable block schemas).

    Every read in this repo goes through here: a clean footer schema is
    passed to the read (so read-task block schemas are hashable at the
    source), and the strip task fuses with whatever map_batches follows
    as a free belt-and-suspenders pass (field-level metadata, appended
    files with divergent footers). See
    :func:`tripsu_ray.schema.strip_schema_metadata`.
    """
    import ray.data

    from ..schema import strip_schema_metadata

    if "schema" not in kwargs and args:
        sch = _clean_footer_schema(args[0])
        cols = kwargs.get("columns")
        if sch is not None and cols is not None:
            # blocks come out in columns= order; the declared schema must too
            try:
                import pyarrow as pa

                sch = pa.schema([sch.field(c) for c in cols])
            except KeyError:
                sch = None
        if sch is not None:
            kwargs["schema"] = sch
    return ray.data.read_parquet(*args, **kwargs).map_batches(
        strip_schema_metadata, batch_format="pyarrow", batch_size=None
    )
