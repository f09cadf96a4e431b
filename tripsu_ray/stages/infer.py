"""RDFS forward-chaining inference over the triple stream.

The classic KG-construction enrichment step (RDFS entailment rule rdfs9:
``(?s type ?c) ∧ (?c subClassOf ?sup) ⇒ (?s type ?sup)`` under the
TRANSITIVE closure of subClassOf — W3C RDF Schema §2.3). tripsu has no
reasoner; a pipeline that constructs a typed graph materializes inferred
types so downstream type-filtered queries (and tripsu-style type-based
pseudonymization rules!) see the full hierarchy.

Distributed shape: the ontology (class hierarchy) is ALWAYS tiny relative
to instances — its transitive closure is computed on the driver (BFS per
class over a dict) and broadcast; ONE map pass over the rdf:type stream
emits asserted + inferred (subject, type) pairs; the per-type distinct-
subject census needs ONE pair-hash exchange (equal pairs co-locate →
exact global dedup) with per-partition counts tree-summed. Instance data
never joins against itself; the only shuffle is the deduped pair stream.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..schema import RDF_TYPE

#: the demo ontology over the extractor's classes (stages/extract.py emits
#: File/Repository/Module/Function/Class as rdf:type objects) — in a real
#: deployment this comes from a schema file; the shape of the computation
#: (driver closure + broadcast) is identical
def default_ontology(ns: str) -> list[tuple[str, str]]:
    return [
        (ns + "Function", ns + "Symbol"),
        (ns + "Class", ns + "Symbol"),
        (ns + "Symbol", ns + "Entity"),
        (ns + "File", ns + "Resource"),
        (ns + "Repository", ns + "Resource"),
        (ns + "Module", ns + "Resource"),
        (ns + "Resource", ns + "Entity"),
    ]


def subclass_closure(pairs: list[tuple[str, str]]) -> dict[str, tuple[str, ...]]:
    """Transitive closure {class → all strict superclasses} (driver-side:
    the ontology is query-text-sized). Deterministic order; cycles are
    tolerated (a class never lists itself)."""
    direct: dict[str, set[str]] = {}
    for c, sup in pairs:
        direct.setdefault(c, set()).add(sup)
    out: dict[str, tuple[str, ...]] = {}
    for c in direct:
        seen: set[str] = set()
        frontier = set(direct[c])
        while frontier:
            seen |= frontier
            frontier = {
                s for f in frontier for s in direct.get(f, ()) if s not in seen
            }
        seen.discard(c)
        out[c] = tuple(sorted(seen))
    return out


def rdfs_type_census(
    triples, ontology: list[tuple[str, str]], *, num_partitions: int = 16
):
    """(type, n_subjects) census AFTER RDFS subclass inference.

    One pass + one exchange; see module docstring for the plan.
    """
    import ray

    closure = subclass_closure(ontology)
    clo_ref = ray.put(closure)

    def expand(batch: pa.Table) -> pd.DataFrame:
        clo = ray.get(clo_ref)
        m = batch["predicate"].to_numpy(zero_copy_only=False) == RDF_TYPE
        s = batch["subject"].to_numpy(zero_copy_only=False)[m]
        t = batch["object_value"].to_numpy(zero_copy_only=False)[m]
        df = pd.DataFrame(
            {"t": pd.Series(t, dtype=object), "s": pd.Series(s, dtype=object)}
        ).drop_duplicates()
        # inferred pairs: one numpy repeat per asserted type present in the
        # batch (class vocabulary is tiny — this loop is over CLASSES)
        extra_t: list[np.ndarray] = []
        extra_s: list[np.ndarray] = []
        for cls, sups in clo.items():
            if not sups:
                continue
            subj = df["s"][df["t"] == cls].to_numpy(dtype=object)
            if not len(subj):
                continue
            extra_t.append(np.repeat(np.array(sups, dtype=object), len(subj)))
            extra_s.append(np.tile(subj, len(sups)))
        if extra_t:
            df = pd.concat(
                [
                    df,
                    pd.DataFrame(
                        {
                            "t": np.concatenate(extra_t),
                            "s": np.concatenate(extra_s),
                        }
                    ),
                ],
                ignore_index=True,
            ).drop_duplicates()
        df["_part"] = (
            pd.util.hash_array(
                (df["t"].astype(str) + "\x00" + df["s"].astype(str)).to_numpy(
                    dtype=object
                )
            )
            % num_partitions
        ).astype("int64")
        return df

    def census(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"type": pd.Series([], dtype=object), "n": pd.Series([], dtype="int64")}
        )
        if not len(g) or "t" not in g.columns:
            return empty
        d = g[["t", "s"]].drop_duplicates()
        out = d.groupby("t", sort=False, as_index=False).size()
        return pd.DataFrame(
            {"type": out["t"].astype(object), "n": out["size"].astype("int64")}
        )

    partial = (
        triples.map_batches(expand, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(census, batch_format="pandas")
    )

    # per-partition counts are over DISJOINT (type, subject) pairs — a tiny
    # (types × partitions)-row stream; sum per type in one small groupby
    def fold(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("type", sort=False, as_index=False)["n"].sum()
        out["type"] = out["type"].astype(object)
        return out.astype({"n": "int64"})

    return partial.repartition(1).map_batches(fold, batch_format="pandas")


#: demo property axioms over the extractor's predicates (a real deployment
#: reads these from the schema file, like the class ontology above)
def default_property_axioms(ns: str):
    domains = {
        ns + "imports": ns + "File",
        ns + "inRepo": ns + "File",
        ns + "defines": ns + "File",
        ns + "calls": ns + "File",
        ns + "language": ns + "File",
        ns + "author": ns + "Repository",
        ns + "license": ns + "Repository",
    }
    ranges = {
        ns + "imports": ns + "Module",
        ns + "inRepo": ns + "Repository",
    }
    return domains, ranges


def rdfs_domain_range_census(
    triples,
    ontology: list[tuple[str, str]],
    domains: dict[str, str],
    ranges: dict[str, str],
    *,
    num_partitions: int = 16,
):
    """(type, n_subjects) census under rdfs2 + rdfs3 + rdfs9:

        rdfs2: (?s ?p ?o) ∧ (?p domain C) ⇒ ?s rdf:type C
        rdfs3: (?s ?p ?o) ∧ (?p range  C) ∧ ?o is IRI ⇒ ?o rdf:type C
        rdfs9: subclass closure over everything derived above

    Same distributed shape as :func:`rdfs_type_census` — the property
    axioms are query-text-sized like the class ontology (driver +
    broadcast), one map pass emits the (type, node) pairs, one pair-hash
    exchange makes the per-type distinct-node census exact.
    """
    import ray

    closure = subclass_closure(ontology)
    state = ray.put((closure, dict(domains), dict(ranges)))

    def expand(batch: pa.Table) -> pd.DataFrame:
        clo, dom, rng = ray.get(state)
        p = batch["predicate"].to_numpy(zero_copy_only=False)
        s = batch["subject"].to_numpy(zero_copy_only=False)
        o = batch["object_value"].to_numpy(zero_copy_only=False)
        ok = batch["object_kind"].to_numpy(zero_copy_only=False)
        frames = []
        m_type = p == RDF_TYPE
        if m_type.any():
            frames.append(pd.DataFrame({"t": o[m_type], "s": s[m_type]}))
        # rdfs2/rdfs3: one vectorized mask per axiom (axioms ≪ rows)
        for pred, cls in dom.items():
            m = p == pred
            if m.any():
                frames.append(pd.DataFrame({"t": cls, "s": s[m]}))
        from ..schema import KIND_IRI

        for pred, cls in rng.items():
            m = (p == pred) & (ok == KIND_IRI)
            if m.any():
                frames.append(pd.DataFrame({"t": cls, "s": o[m]}))
        if not frames:
            return pd.DataFrame(
                {
                    "t": pd.Series([], dtype=object),
                    "s": pd.Series([], dtype=object),
                    "_part": pd.Series([], dtype="int64"),
                }
            )
        df = pd.concat(frames, ignore_index=True).drop_duplicates()
        df["t"] = df["t"].astype(object)
        df["s"] = df["s"].astype(object)
        extra_t: list[np.ndarray] = []
        extra_s: list[np.ndarray] = []
        for cls, sups in clo.items():
            if not sups:
                continue
            subj = df["s"][df["t"] == cls].to_numpy(dtype=object)
            if not len(subj):
                continue
            extra_t.append(np.repeat(np.array(sups, dtype=object), len(subj)))
            extra_s.append(np.tile(subj, len(sups)))
        if extra_t:
            df = pd.concat(
                [
                    df,
                    pd.DataFrame(
                        {"t": np.concatenate(extra_t), "s": np.concatenate(extra_s)}
                    ),
                ],
                ignore_index=True,
            ).drop_duplicates()
        df["_part"] = (
            pd.util.hash_array(
                (df["t"].astype(str) + "\x00" + df["s"].astype(str)).to_numpy(
                    dtype=object
                )
            )
            % num_partitions
        ).astype("int64")
        return df

    def census(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"type": pd.Series([], dtype=object), "n": pd.Series([], dtype="int64")}
        )
        if not len(g) or "t" not in g.columns:
            return empty
        d = g[["t", "s"]].drop_duplicates()
        out = d.groupby("t", sort=False, as_index=False).size()
        return pd.DataFrame(
            {"type": out["t"].astype(object), "n": out["size"].astype("int64")}
        )

    partial = (
        triples.map_batches(expand, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(census, batch_format="pandas")
    )

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("type", sort=False, as_index=False)["n"].sum()
        out["type"] = out["type"].astype(object)
        return out.astype({"n": "int64"})

    return partial.repartition(1).map_batches(fold, batch_format="pandas")
