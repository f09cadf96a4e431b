"""tripsu_ray — a Ray-Data-native knowledge-graph construction engine.

A from-scratch re-expression of the query/data-processing capabilities of
sdsc-ordes/tripsu (reference at /root/reference, studied for semantics only),
extended to a full KG-construction pipeline over Parquet tables of source
code: triple extraction → type index (groupby) → rule-based pseudonymization
(actor pool) → entity linking/canonicalization (hash-partitioned shuffle) →
sorted, deduplicated materialize — all expressed as ray.data.Dataset
transforms over zero-copy Arrow batches.

Package layout
--------------
- ``schema``     Arrow schemas for the triple / source-file / index tables
- ``functions``  pure, Ray-free kernels: rdf terms, rules, crypto, text
- ``sources``    readers/writers (Parquet, N-Triples) + deterministic synth
- ``stages``     Dataset → Dataset transforms (extract, index, pseudo, link,
                 materialize, dedup, similarity, multimodal)
- ``pipelines``  end-to-end compositions (the flagship KG pipeline)
- ``state``      broadcast helpers, checkpoints/manifests, metrics

No module in this package calls ``ray.init``/``ray.shutdown``; sessions are
owned by the CLI, bench.py and the test fixture.
"""

__version__ = "0.1.0"


def _install_empty_schema_log_filter() -> None:
    """Drop Ray's benign schemaless-empty-block warning, and ONLY it.

    Ray 2.49's sort-based exchanges (groupby/sort) emit 0-row output
    blocks with NO schema for empty key ranges, and its map operators
    skip the UDF for 0-row inputs, forwarding those blocks untouched —
    Ray's own source marks this as a known internal workaround
    (plan_udf_map_op.py: "TODO(hchen): ... some all-to-all operators
    output empty blocks with no schema"). Every partitioned exchange
    with more output ranges than populated keys therefore triggers
    `streaming_executor_state.py`'s "Operator produced a RefBundle with
    a different schema… new schema: PandasBlockSchema(names=[])"
    warning, no matter what the partition fns return (they are never
    called on those blocks — verified empirically; see
    pipelines/joins.py `_sentinel_rows`). The condition is harmless
    (empty blocks carry no rows to misinterpret), so this filter
    suppresses exactly that message — real schema-mismatch warnings
    (non-empty names lists on both sides) still surface.
    """
    import logging

    class _F(logging.Filter):
        def filter(self, record: logging.LogRecord) -> bool:
            try:
                msg = record.getMessage()
            except Exception:
                return True
            return "names=[], types=[]" not in msg

    logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    ).addFilter(_F())


_install_empty_schema_log_filter()
