"""Readers/writers and the deterministic source_files synthesizer."""

def read_parquet_clean(*args, **kwargs):
    """``ray.data.read_parquet`` + metadata strip (hashable block schemas).

    Every read in this repo goes through here: the strip task fuses with
    whatever map_batches follows, so it is free, and it keeps pandas'
    parquet metadata from reaching shuffles (see
    :func:`tripsu_ray.schema.strip_schema_metadata`).
    """
    import ray.data

    from ..schema import strip_schema_metadata

    return ray.data.read_parquet(*args, **kwargs).map_batches(
        strip_schema_metadata, batch_format="pyarrow", batch_size=None
    )
