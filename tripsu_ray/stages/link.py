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
        # lowercase BEFORE stripping so Core.JS and core unify (the
        # extension alternation is lowercase; mirrored in oracle.py SQL)
        key.loc[linkable] = seg.str.lower().str.replace(_EXT_RE, "", regex=True)
    return key


def _linkable_unique(batch: pa.Table) -> pd.Series:
    """Distinct linkable IRIs of a batch, via pure-Arrow prefilter + unique.

    Only the (small) distinct linkable subset is ever converted to Python —
    pandas-converting the full subject/object columns dominated this stage.
    """

    def side(col: pa.ChunkedArray, kind: pa.ChunkedArray) -> pa.Array:
        col = col.combine_chunks()
        mask = pc.and_(
            pc.equal(kind.combine_chunks(), KIND_IRI),
            pc.or_(
                pc.starts_with(col, LINKABLE_PREFIXES[0]),
                pc.starts_with(col, LINKABLE_PREFIXES[1]),
            ),
        )
        return pc.unique(col.filter(mask))

    s = side(batch["subject"], batch["subject_kind"])
    o = side(batch["object_value"], batch["object_kind"])
    u = pc.unique(pa.concat_arrays([s, o]))
    return pd.Series(u.to_numpy(zero_copy_only=False), dtype=object)


def _batch_key_min(batch: pa.Table) -> pa.Table:
    """Partial aggregate: distinct (key, min(iri)) pairs within a batch."""
    iris = _linkable_unique(batch)
    if iris.empty:
        return pa.table({"key": pa.array([], pa.string()), "canonical": pa.array([], pa.string())})
    keys = mention_keys(iris)
    df = pd.DataFrame({"key": keys, "iri": iris}).dropna(subset=["key"])
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


def _combine_link_frames(frames: list[pd.DataFrame]) -> pd.DataFrame:
    """Associative MIN-combine of (key, canonical) partials."""
    df = pd.concat(frames, ignore_index=True)
    return df.groupby("key", sort=False, as_index=False)["canonical"].min()


def fold_link_map(triples) -> dict[str, str]:
    """Shuffle-free link map: per-batch partial MIN → tree-reduced fold.

    MIN is associative, so the per-batch partials combine exactly in any
    tree shape: intermediate tasks merge ~16 block partials each
    (stages.folds.tree_fold_tables) and the driver folds only the few
    pre-reduced roots — no driver-side concat of every block (the round-1
    serial scaling term). Use build_link_map when the map itself must be a
    distributed Dataset.
    """
    from .folds import tree_fold_tables

    partial = triples.map_batches(_batch_key_min, batch_format="pyarrow")
    df = tree_fold_tables(partial, _combine_link_frames)
    if df is None or not len(df):
        return {}
    return df.groupby("key")["canonical"].min().to_dict()


def canonicalize_tasks(triples, key_map_ref, *, batch_size=None):
    """Task-pool variant of :func:`canonicalize` (fuses with adjacent task
    stages — see stages/pseudo.py ``pseudonymize_tasks`` for why).

    Per-process state goes through pseudo's ``_cache_latest`` (one entry
    per kind) so successive jobs on a long-lived worker don't pin every
    past key map in memory."""
    from .pseudo import _cache_latest

    def fn(batch: pa.Table) -> pa.Table:
        key = key_map_ref.hex() if hasattr(key_map_ref, "hex") else id(key_map_ref)
        actor = _cache_latest("keymap", key, lambda: CanonicalizeActor(key_map_ref))
        return actor(batch)

    return triples.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


class CanonicalizeActor:
    """Rewrite subject/object IRIs to their canonical entity (map-side apply)."""

    def __init__(self, key_map_ref):
        import ray

        self.key_map: dict[str, str] = (
            ray.get(key_map_ref) if not isinstance(key_map_ref, dict) else key_map_ref
        )

    def _rewrite(self, col: pa.ChunkedArray, kind: pa.ChunkedArray) -> pa.Array:
        """Arrow-native apply: probe only the distinct linkable subset.

        The full column never converts to Python objects; rewrites go back
        in via ``pc.replace_with_mask`` over an ``is_in`` selection of the
        (small) set of IRIs that actually change.
        """
        col = col.combine_chunks()
        linkable = pc.and_(
            pc.equal(kind.combine_chunks(), KIND_IRI),
            pc.or_(
                pc.starts_with(col, LINKABLE_PREFIXES[0]),
                pc.starts_with(col, LINKABLE_PREFIXES[1]),
            ),
        )
        uniq = pc.unique(col.filter(linkable))
        if len(uniq) == 0:
            return col
        useries = pd.Series(uniq.to_numpy(zero_copy_only=False), dtype=object)
        ucanon = mention_keys(useries).map(self.key_map)
        changed = ucanon.notna() & (ucanon != useries)
        if not changed.any():
            return col
        old_new = dict(zip(useries[changed], ucanon[changed]))
        sel = pc.and_(linkable, pc.is_in(col, value_set=pa.array(list(old_new), pa.string())))
        old_vals = col.filter(sel).to_numpy(zero_copy_only=False)
        repl = pa.array([old_new[v] for v in old_vals], pa.string())
        return pc.replace_with_mask(col, sel, repl)

    def __call__(self, batch: pa.Table) -> pa.Table:
        subj = self._rewrite(batch["subject"], batch["subject_kind"])
        obj = self._rewrite(batch["object_value"], batch["object_kind"])
        return pa.table(
            {
                "subject": subj,
                "subject_kind": batch["subject_kind"],
                "predicate": batch["predicate"],
                "object_value": obj,
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
