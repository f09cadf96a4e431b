"""Entity linking + canonicalization (north-star scope; not in reference).

Module *mentions* surface under different forms across languages: python/rust
import ``mod_7`` while JS requires ``'mod_7.js'``, and call edges reference a
``call/`` entity with the bare name. Linking reconciles them:

- mention key: for IRIs in the linkable namespaces (``mod/``, ``call/``) the
  key is the last path segment, lowercased, with a ``.js/.py/.rs`` extension
  stripped. Other IRIs are never linked (files ≠ modules even when named
  alike).
- canonical entity per key: lexicographic MIN of the member IRIs —
  deterministic, associative, and therefore shuffle-friendly.

Skew handling (hub entities — ``core`` appears in half of all files): the
per-batch partial aggregate reduces every batch to ≤ 1 row per key *before*
the groupby shuffle, which is strictly stronger than salting a hot key into
k sub-partitions (the combiner bounds each hub key's shuffle volume at
#batches rows, independent of corpus size). MIN's associativity is what
makes this exact.

The resulting {iri → canonical} mapping (≪ triple count; only non-identity
entries kept) is broadcast via ``ray.put`` and applied map-side — no second
shuffle. At 10^9+ distinct mentions the apply step becomes a
hash-partitioned join on the same key; semantics unchanged.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..schema import KIND_IRI, TRIPLES

LINKABLE_PREFIXES = ("http://kg.example/mod/", "http://kg.example/call/")
_EXT_RE = r"\.(js|py|rs)$"


def mention_keys(iris: pd.Series) -> pd.Series:
    """IRI → normalized mention key (None when not linkable).

    The regex only runs on the linkable subset — most IRIs in a code KG are
    files/symbols, and regexing all of them dominated the whole stage.
    """
    linkable = iris.str.startswith(LINKABLE_PREFIXES[0]) | iris.str.startswith(
        LINKABLE_PREFIXES[1]
    )
    key = pd.Series(None, index=iris.index, dtype=object)
    sub = iris[linkable]
    if len(sub):
        seg = sub.str.extract(r"([^/#]+)$", expand=False)
        key.loc[linkable] = seg.str.replace(_EXT_RE, "", regex=True).str.lower()
    return key


def _batch_key_min(batch: pa.Table) -> pa.Table:
    """Partial aggregate: distinct (key, min(iri)) pairs within a batch."""
    iris = pd.concat(
        [
            batch.filter(pc.equal(batch["subject_kind"], KIND_IRI))["subject"].to_pandas(),
            batch.filter(pc.equal(batch["object_kind"], KIND_IRI))["object_value"].to_pandas(),
        ],
        ignore_index=True,
    )
    keys = mention_keys(iris)
    df = pd.DataFrame({"key": keys, "iri": iris}).dropna(subset=["key"])
    if df.empty:
        return pa.table({"key": pa.array([], pa.string()), "canonical": pa.array([], pa.string())})
    agg = df.groupby("key", sort=False)["iri"].min().reset_index()
    return pa.table({"key": agg["key"], "canonical": agg["iri"]})


def build_link_map(triples) -> "ray.data.Dataset":
    """triples Dataset → (key, canonical) Dataset."""
    from ray.data.aggregate import Min

    partial = triples.map_batches(_batch_key_min, batch_format="pyarrow")
    return partial.groupby("key").aggregate(Min("canonical", alias_name="canonical"))


def collect_link_map(link_ds) -> dict[str, str]:
    """Fold a (key, canonical) Dataset to {key → canonical}."""
    mapping: dict[str, str] = {}
    for batch in link_ds.iter_batches(batch_size=65536, batch_format="pyarrow"):
        for k, c in zip(batch["key"].to_pylist(), batch["canonical"].to_pylist()):
            mapping[k] = c
    return mapping


def fold_link_map(triples) -> dict[str, str]:
    """Shuffle-free link map: per-batch partial MIN → vectorized driver fold.

    MIN is associative, so folding the per-batch partials on the driver is
    exact and skips the groupby shuffle entirely — the partials are bounded
    by (#batches × #distinct keys per batch), tiny next to the stream.
    Use build_link_map when the map itself must be a distributed Dataset.
    """
    partial = triples.map_batches(_batch_key_min, batch_format="pyarrow")
    frames = [
        b.to_pandas()
        for b in partial.iter_batches(batch_size=1 << 20, batch_format="pyarrow")
    ]
    if not frames:
        return {}
    df = pd.concat(frames, ignore_index=True)
    return df.groupby("key")["canonical"].min().to_dict()


_KM_CACHE: dict = {}


def canonicalize_tasks(triples, key_map_ref, *, batch_size=None):
    """Task-pool variant of :func:`canonicalize` (fuses with adjacent task
    stages — see stages/pseudo.py ``pseudonymize_tasks`` for why)."""
    import ray

    def fn(batch: pa.Table) -> pa.Table:
        key = key_map_ref.hex() if hasattr(key_map_ref, "hex") else id(key_map_ref)
        actor = _KM_CACHE.get(key)
        if actor is None:
            actor = CanonicalizeActor(key_map_ref)
            _KM_CACHE[key] = actor
        return actor(batch)

    return triples.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


class CanonicalizeActor:
    """Rewrite subject/object IRIs to their canonical entity (map-side apply)."""

    def __init__(self, key_map_ref):
        import ray

        self.key_map: dict[str, str] = (
            ray.get(key_map_ref) if not isinstance(key_map_ref, dict) else key_map_ref
        )

    def _rewrite(self, values: pd.Series, kinds: np.ndarray) -> pd.Series:
        is_iri = kinds == KIND_IRI
        iris = values[is_iri]
        # entities repeat heavily: factorize → key/lookup once per DISTINCT iri
        codes, uniques = pd.factorize(iris)
        ukeys = mention_keys(pd.Series(uniques, dtype=object))
        ucanon = ukeys.map(self.key_map)
        ucanon = ucanon.where(ucanon.notna(), pd.Series(uniques, dtype=object))
        if (ucanon.to_numpy() != uniques).any():
            values = values.copy()
            values.loc[iris.index] = ucanon.to_numpy(dtype=object)[codes]
        return values

    def __call__(self, batch: pa.Table) -> pa.Table:
        subj = batch["subject"].to_pandas()
        obj = batch["object_value"].to_pandas()
        subj = self._rewrite(subj, batch["subject_kind"].to_numpy(zero_copy_only=False))
        obj = self._rewrite(obj, batch["object_kind"].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "subject": pa.array(subj, pa.string()),
                "subject_kind": batch["subject_kind"],
                "predicate": batch["predicate"],
                "object_value": pa.array(obj, pa.string()),
                "object_kind": batch["object_kind"],
                "object_lang": batch["object_lang"],
                "object_datatype": batch["object_datatype"],
            },
            schema=TRIPLES,
        )


def canonicalize(triples, key_map_ref, *, batch_size: int = 16384, concurrency=4):
    if isinstance(concurrency, int):
        concurrency = (1, concurrency)  # autoscale: don't reserve the cluster
    return triples.map_batches(
        CanonicalizeActor,
        fn_constructor_args=(key_map_ref,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def link_entities(triples, *, batch_size: int = 65536, concurrency=4):
    """Full linking stage: partial-agg map build → broadcast → map-side apply."""
    import ray

    key_map = fold_link_map(triples)
    ref = ray.put(key_map)
    return canonicalize(triples, ref, batch_size=batch_size, concurrency=concurrency)
