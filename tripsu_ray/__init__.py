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
