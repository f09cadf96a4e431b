"""SPARQL 1.1 property-path evaluation over the triple stream.

tripsu itself has no query engine; paths are the reachability half of
SPARQL that a constructed KG is queried with (spec §9.1: ``^p`` inverse,
``p1|p2`` alternation, ``p1/p2`` sequence, ``p+`` one-or-more). A path
expression here is a small nested-tuple AST:

    ("pred", iri)        one predicate step (subject → object)
    ("npred", p1, p2, …) negated property set !(p1|p2|…): any OTHER predicate
    ("inv", expr)        inverse: swap direction
    ("alt", e1, e2, ...) alternation: union of the step relations
    ("seq", e1, e2)      sequence: relational join on the midpoint
    ("range", e, lo, hi) bounded repetition e{lo,hi} (lo >= 1), powers
                         composed from the DISTINCT base relation

``compile_path`` renders any inv/alt/seq composition to a DISTINCT edge
Dataset ``(a, b)`` — each step is a map-only selection over the triples,
alternation is a Dataset union, sequence is the union-tag hash exchange
from the BGP engine. Sequence joins and global DISTINCTs are size-gated
(``_PATH_DRIVER_MAX``): at or under the gate they run as one in-process
pandas pass (the stages/graph.py ``driver_max`` precedent — bit-equal,
tested vs the forced distributed plan), above it both sides stream
through a data-sized hash exchange.

``p+`` (``path_plus``) is evaluated ANCHORED at a seed set, the shape
every distributed engine uses for transitive closure: level-synchronous
frontier expansion — per round the frontier (a set, ``ray.put`` once)
probes the compiled edge stream in one map pass, per-batch distinct
neighbors tree-fold, unseen ones get ``dist = round``. Driver state is
the reached-node map (node-class budget, same as stages/graph.py::
bfs_distances); an unanchored ``?x p+ ?y`` is O(n²) output by definition
and is rejected — anchor it or use connected components.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_P = 16


def _pred_edges(triples, pred: str, *, inverse: bool):
    """One predicate step → (a, b) edge batches, locally DISTINCT."""

    def sel(batch: pa.Table) -> pd.DataFrame:
        m = batch["predicate"].to_numpy(zero_copy_only=False) == pred
        s = batch["subject"].to_numpy(zero_copy_only=False)[m]
        o = batch["object_value"].to_numpy(zero_copy_only=False)[m]
        a, b = (o, s) if inverse else (s, o)
        return pd.DataFrame(
            {"a": pd.Series(a, dtype=object), "b": pd.Series(b, dtype=object)}
        ).drop_duplicates(ignore_index=True)

    return triples.map_batches(sel, batch_format="pyarrow")


def _npred_edges(triples, preds, *, inverse: bool):
    """Negated property set ``!(p1|p2|…)`` → (a, b) edges over every
    OTHER predicate (SPARQL 1.1 §9.1 NPS), locally DISTINCT. Map-only:
    the membership test is one vectorized isin per batch."""
    excluded = np.array(sorted(preds), dtype=object)

    def sel(batch: pa.Table) -> pd.DataFrame:
        p = batch["predicate"].to_numpy(zero_copy_only=False)
        m = ~np.isin(p, excluded)
        s = batch["subject"].to_numpy(zero_copy_only=False)[m]
        o = batch["object_value"].to_numpy(zero_copy_only=False)[m]
        a, b = (o, s) if inverse else (s, o)
        return pd.DataFrame(
            {"a": pd.Series(a, dtype=object), "b": pd.Series(b, dtype=object)}
        ).drop_duplicates(ignore_index=True)

    return triples.map_batches(sel, batch_format="pyarrow")


# Same driver-size gate as stages/graph.py (connected_components_str /
# _local_triangle_core precedent): at or under the gate the edge relation is
# driver-sized by definition, so the distributed exchange buys nothing but
# fixed per-stage cost at the correctness gate's scale. Every gated local
# path below computes the identical frame (bit-equality tested vs the
# forced distributed plan); ``num_partitions`` stays the scale-out ceiling.
_PATH_DRIVER_MAX = 1 << 20


def _seq_join(e1, e2, *, num_partitions: int, driver_max: int = _PATH_DRIVER_MAX):
    """(a→x) ⋈ (x→b): the union-tag midpoint exchange (both sides big).

    Size-gated: both sides are pinned to count them (the join consumes
    them either way); at or under ``driver_max`` combined rows the join
    runs as one in-process merge, else the midpoint exchange runs with a
    data-sized partition count."""
    import ray
    import ray.data

    e1 = e1.materialize()
    e2 = e2.materialize()
    n = e1.count() + e2.count()
    if n <= driver_max:
        empty = pd.DataFrame({c: pd.Series([], dtype=object) for c in ("a", "b")})
        l = e1.to_pandas()
        r = e2.to_pandas()
        if "a" not in l.columns or "a" not in r.columns:  # empty side lost schema
            return ray.data.from_pandas(empty)
        out = (
            l.rename(columns={"b": "mid"})
            .merge(r.rename(columns={"a": "mid"}), on="mid")[["a", "b"]]
            .drop_duplicates(ignore_index=True)
        )
        return ray.data.from_pandas(out if len(out) else empty)
    num_partitions = max(4, min(num_partitions, n // 2500 + 1))

    def tag(side):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            key = df["b"] if side == 0 else df["a"]
            out = pd.DataFrame(
                {
                    "u": df["a"].astype(object) if side == 0 else df["b"].astype(object),
                    "mid": key.astype(object),
                    "_side": np.int8(side),
                }
            ).drop_duplicates()
            out["_part"] = (
                pd.util.hash_array(out["mid"].to_numpy(dtype=object)) % num_partitions
            ).astype("int64")
            return out

        return f

    def join_part(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({c: pd.Series([], dtype=object) for c in ("a", "b")})
        if not len(g):
            return empty
        left = g[g["_side"] == 0][["u", "mid"]].drop_duplicates()
        right = g[g["_side"] == 1][["u", "mid"]].drop_duplicates()
        if not len(left) or not len(right):
            return empty
        m = left.merge(right, on="mid", suffixes=("_a", "_b"))
        return (
            m[["u_a", "u_b"]]
            .rename(columns={"u_a": "a", "u_b": "b"})
            .drop_duplicates(ignore_index=True)
        )

    u = e1.map_batches(tag(0), batch_format="pandas").union(
        e2.map_batches(tag(1), batch_format="pandas")
    )
    return u.groupby("_part").map_groups(join_part, batch_format="pandas")


def compile_path(triples, expr, *, num_partitions: int = _P,
                 driver_max: int = _PATH_DRIVER_MAX, _inverse: bool = False):
    """Path AST (inv/alt/seq over predicate steps) → edge Dataset (a, b).

    Dedup is batch-local; consumers do their own global DISTINCT
    (path_plus dedups via its seen-set; a top-level path query ends with
    one row-hash exchange).
    """
    op = expr[0]
    if op == "pred":
        return _pred_edges(triples, expr[1], inverse=_inverse)
    if op == "npred":
        return _npred_edges(triples, expr[1:], inverse=_inverse)
    if op == "inv":
        return compile_path(
            triples, expr[1], num_partitions=num_partitions, driver_max=driver_max, _inverse=not _inverse
        )
    if op == "alt":
        parts = [
            compile_path(triples, e, num_partitions=num_partitions, driver_max=driver_max, _inverse=_inverse)
            for e in expr[1:]
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.union(p)
        return out
    if op == "seq":
        e1, e2 = expr[1], expr[2]
        if _inverse:  # ^(p/q) ≡ ^q/^p
            e1, e2 = e2, e1
            e1 = ("inv", e1)
            e2 = ("inv", e2)
        return _seq_join(
            compile_path(triples, e1, num_partitions=num_partitions, driver_max=driver_max),
            compile_path(triples, e2, num_partitions=num_partitions, driver_max=driver_max),
            num_partitions=num_partitions, driver_max=driver_max,
        )
    if op == "plus":
        raise ValueError(
            "p+ must be evaluated anchored: use path_plus(triples, expr[1], seeds)"
        )
    if op == "range":
        # p{lo,hi} bounded repetition (lo >= 1; zero-length belongs to
        # path_star): powers built by seq-joining the DISTINCT base —
        # distinct-between-powers is the consumer's top-level exchange.
        e, lo, hi = expr[1], int(expr[2]), int(expr[3])
        if _inverse:  # ^(p{l,h}) ≡ (^p){l,h}
            e = ("inv", e)
        if not (1 <= lo <= hi):
            raise ValueError(f"range bounds must satisfy 1 <= lo <= hi: {lo},{hi}")
        base = path_distinct(
            compile_path(triples, e, num_partitions=num_partitions, driver_max=driver_max),
            num_partitions=num_partitions, driver_max=driver_max,
        ).materialize()
        powers = [base]
        for i in range(hi - 1):
            nxt = _seq_join(powers[-1], base, num_partitions=num_partitions, driver_max=driver_max)
            if i < hi - 2:
                # intermediate powers are REUSED (joined with base next
                # round): distinct+pin keeps the join input minimal. The
                # last power feeds only the union — the consumer's
                # top-level distinct covers it, so skip the extra
                # exchange + materialization there.
                nxt = path_distinct(nxt, num_partitions=num_partitions, driver_max=driver_max).materialize()
            powers.append(nxt)
        out = powers[lo - 1]
        for p in powers[lo:]:
            out = out.union(p)
        return out
    raise ValueError(f"unknown path op: {op!r}")


def path_distinct(edges, *, num_partitions: int = _P, driver_max: int = _PATH_DRIVER_MAX):
    """Globally DISTINCT (a, b) — one row-hash exchange over the edges.

    Size-gated like :func:`_seq_join`: a top-level path result at or
    under ``driver_max`` rows is driver-destined anyway, so the local
    drop_duplicates is exchange-free and bit-equal."""
    import ray
    import ray.data

    edges = edges.materialize()
    n = edges.count()
    if n <= driver_max:
        out = edges.to_pandas()
        if not len(out):
            out = pd.DataFrame({c: pd.Series([], dtype=object) for c in ("a", "b")})
        out = out[["a", "b"]].drop_duplicates(ignore_index=True)
        return ray.data.from_pandas(out)
    num_partitions = max(4, min(num_partitions, n // 2500 + 1))

    def redist(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(ignore_index=True)
        df["_part"] = (
            pd.util.hash_array(
                (df["a"].astype(str) + "\x00" + df["b"].astype(str)).to_numpy(dtype=object)
            )
            % num_partitions
        ).astype("int64")
        return df

    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({c: pd.Series([], dtype=object) for c in ("a", "b")})
        if not len(g) or "a" not in g.columns:
            return empty
        return g[["a", "b"]].drop_duplicates(ignore_index=True)

    return (
        edges.map_batches(redist, batch_format="pandas")
        .groupby("_part")
        .map_groups(dedup, batch_format="pandas")
    )


def path_plus(
    triples,
    expr,
    seeds,
    *,
    max_rounds: int = 64,
    num_partitions: int = _P,
) -> pd.DataFrame:
    """``seed expr+ ?x`` — min-hop reachability (≥1 step, DIRECTED per the
    compiled expression) from a seed set.

    Returns (node, dist ≥ 1) for reached nodes, sorted by node; a seed
    appears only if a cycle returns to it (SPARQL p+ semantics). Raises
    if the frontier outlives ``max_rounds`` (a silently capped closure
    would claim exactness it doesn't have — same policy as
    stages/graph.py::bfs_distances).
    """
    import ray

    from ..stages.folds import tree_fold_tables

    edges = compile_path(triples, expr, num_partitions=num_partitions).materialize()
    seen: dict[str, int] = {}
    frontier = frozenset(seeds)
    if not frontier:
        return pd.DataFrame(
            {"node": pd.Series([], dtype=object), "dist": pd.Series([], dtype="int64")}
        )

    for r in range(1, max_rounds + 1):
        f_ref = ray.put(frontier)

        def probe(df: pd.DataFrame, _f=f_ref) -> pa.Table:
            fs = ray.get(_f)
            vals = pd.unique(df["b"][df["a"].isin(fs)])
            # Arrow out: a zero-row object-dtype pandas block trips Ray's
            # size estimator (np.vectorize on empty input) — string-typed
            # Arrow is unambiguous at any length
            return pa.table({"b": pa.array(vals, type=pa.string())})

        def combine(frames):
            return pd.concat(frames, ignore_index=True).drop_duplicates(
                ignore_index=True
            )

        nbrs = tree_fold_tables(
            edges.map_batches(probe, batch_format="pandas"), combine
        )
        touched = set(nbrs["b"]) if nbrs is not None and len(nbrs) else set()
        new = touched - seen.keys()
        if not new:
            return pd.DataFrame(
                {"node": sorted(seen), "dist": [seen[n] for n in sorted(seen)]}
            ).astype({"dist": "int64"})
        for n in new:
            seen[n] = r
        frontier = frozenset(new)
    raise RuntimeError(
        f"path_plus frontier still live after {max_rounds} rounds — raise max_rounds"
    )


def q_kg_path_seq(sf_dir: str, *, num_partitions: int = _P):
    """Sequence + inverse path showcase — which modules does each REPO
    import (through its files):

        ?r (^<inRepo>/<imports>) ?m

    Compiles to inv(inRepo) ⋈ imports on the file midpoint (one
    union-tag exchange), then one global DISTINCT. DuckDB oracle: the
    two-way self-join on the file."""
    from ..sources.synth import read_source_files
    from ..stages.extract import NS, extract_triples

    from .queries import _extracted

    triples = _extracted(sf_dir)
    edges = compile_path(
        triples,
        ("seq", ("inv", ("pred", NS + "inRepo")), ("pred", NS + "imports")),
        num_partitions=num_partitions,
    )
    out = path_distinct(edges, num_partitions=num_partitions)

    def rename(df: pd.DataFrame) -> pd.DataFrame:
        return df.rename(columns={"a": "r", "b": "m"})

    return out.map_batches(rename, batch_format="pandas")


def sql_kg_path_seq() -> str:
    from ..sources.synth import SOURCE_FILES_SQL
    from ..stages.extract import NS
    from .oracle import _q, _with, build_raw_triples_cte, files_cte, syms_cte

    return (
        _with(SOURCE_FILES_SQL, files_cte(), syms_cte(), build_raw_triples_cte())
        + f"""
SELECT DISTINCT t1.o AS r, t2.o AS m
FROM raw_triples t1
JOIN raw_triples t2 ON t2.s = t1.s AND t2.p = {_q(NS + "imports")}
WHERE t1.p = {_q(NS + "inRepo")}
ORDER BY r, m"""
    )


def q_kg_path_plus(sf_dir: str, *, num_partitions: int = _P) -> pd.DataFrame:
    """Transitive path showcase — everything reachable from the hub
    module over import edges in EITHER direction, with min hop count:

        mod/core (<imports>|^<imports>)+ ?x

    (core → files importing it → their other modules → files importing
    those → … — genuinely multi-hop.) Anchored frontier BFS over the
    compiled alternation; DuckDB oracle: capped recursive CTE with
    min(dist), exact while the true eccentricity < the cap (the Ray side
    RAISES past the cap — a silent capped-but-agreeing match cannot
    happen)."""
    from ..sources.synth import read_source_files
    from ..stages.extract import MOD_NS, NS, extract_triples

    from .queries import _extracted

    triples = _extracted(sf_dir)
    return path_plus(
        triples,
        ("alt", ("pred", NS + "imports"), ("inv", ("pred", NS + "imports"))),
        [MOD_NS + "core"],
        num_partitions=num_partitions,
    )


def sql_kg_path_plus() -> str:
    from ..sources.synth import SOURCE_FILES_SQL
    from ..stages.extract import MOD_NS, NS
    from .oracle import _q, build_raw_triples_cte, files_cte, syms_cte

    return (
        "WITH RECURSIVE "
        + ",\n".join(
            (SOURCE_FILES_SQL, files_cte(), syms_cte(), build_raw_triples_cte())
        )
        + f""",
ie AS (
  SELECT DISTINCT s AS a, o AS b FROM raw_triples WHERE p = {_q(NS + "imports")}
),
sym AS (SELECT a, b FROM ie UNION SELECT b AS a, a AS b FROM ie),
walk AS (
  SELECT b AS node, 1 AS dist FROM sym WHERE a = {_q(MOD_NS + "core")}
  UNION
  SELECT s.b AS node, w.dist + 1 AS dist
  FROM walk w JOIN sym s ON s.a = w.node WHERE w.dist < 64
)
SELECT node, CAST(min(dist) AS BIGINT) AS dist
FROM walk GROUP BY node ORDER BY node"""
    )


def path_star(triples, expr, seeds, *, max_rounds: int = 64, num_partitions: int = _P) -> pd.DataFrame:
    """``seed expr* ?x`` — zero-or-more: the seeds at dist 0 plus the
    ``p+`` closure (a seed re-reached via a cycle keeps dist 0; SPARQL
    ``p*`` always includes the subject itself)."""
    plus = path_plus(
        triples, expr, seeds, max_rounds=max_rounds, num_partitions=num_partitions
    )
    seeds = sorted(set(seeds))
    out = pd.concat(
        [
            pd.DataFrame({"node": seeds, "dist": np.int64(0)}),
            plus[~plus["node"].isin(seeds)],
        ],
        ignore_index=True,
    ).sort_values("node", ignore_index=True)
    return out.astype({"dist": "int64"})


def q_kg_path_star(sf_dir: str, *, num_partitions: int = _P) -> pd.DataFrame:
    """Zero-or-more path showcase — ``mod/core (<imports>|^<imports>)* ?x``:
    the hub module itself (dist 0, SPARQL ``p*`` reflexivity) plus its
    full undirected import closure with min hop counts (the ``p+`` query's
    result). Oracle: the path_plus recursive CTE seeded at dist 0."""
    from ..stages.extract import MOD_NS, NS

    from .queries import _extracted

    return path_star(
        _extracted(sf_dir),
        ("alt", ("pred", NS + "imports"), ("inv", ("pred", NS + "imports"))),
        [MOD_NS + "core"],
        num_partitions=num_partitions,
    )


def sql_kg_path_star() -> str:
    from ..sources.synth import SOURCE_FILES_SQL
    from ..stages.extract import MOD_NS, NS
    from .oracle import _q, build_raw_triples_cte, files_cte, syms_cte

    return (
        "WITH RECURSIVE "
        + ",\n".join(
            (SOURCE_FILES_SQL, files_cte(), syms_cte(), build_raw_triples_cte())
        )
        + f""",
ie AS (
  SELECT DISTINCT s AS a, o AS b FROM raw_triples WHERE p = {_q(NS + "imports")}
),
sym AS (SELECT a, b FROM ie UNION SELECT b AS a, a AS b FROM ie),
walk AS (
  SELECT {_q(MOD_NS + "core")} AS node, 0 AS dist
  UNION
  SELECT s.b AS node, w.dist + 1 AS dist
  FROM walk w JOIN sym s ON s.a = w.node WHERE w.dist < 64
)
SELECT node, CAST(min(dist) AS BIGINT) AS dist
FROM walk GROUP BY node ORDER BY node"""
    )


def path_opt(
    triples, expr, seeds, *, num_partitions: int = _P
) -> pd.DataFrame:
    """``seed expr? ?x`` — zero-or-one step (SPARQL 1.1 ``p?``): the seeds
    at dist 0 plus their DIRECT neighbors at dist 1 (a seed re-reached in
    one step keeps dist 0 — min-dist semantics, same as ``path_star``).

    One map pass over the compiled edge stream (seed set ``ray.put``
    once) + a tree-fold of per-batch distinct neighbors — no rounds, no
    closure state."""
    import ray

    from ..stages.folds import tree_fold_tables

    seeds = sorted(set(seeds))
    if not seeds:
        return pd.DataFrame(
            {"node": pd.Series([], dtype=object), "dist": pd.Series([], dtype="int64")}
        )
    edges = compile_path(triples, expr, num_partitions=num_partitions)
    f_ref = ray.put(frozenset(seeds))

    def probe(df: pd.DataFrame, _f=f_ref) -> pa.Table:
        fs = ray.get(_f)
        vals = pd.unique(df["b"][df["a"].isin(fs)])
        return pa.table({"b": pa.array(vals, type=pa.string())})

    def combine(frames):
        return pd.concat(frames, ignore_index=True).drop_duplicates(ignore_index=True)

    nbrs = tree_fold_tables(edges.map_batches(probe, batch_format="pandas"), combine)
    touched = sorted(set(nbrs["b"]) - set(seeds)) if nbrs is not None and len(nbrs) else []
    out = pd.concat(
        [
            pd.DataFrame({"node": seeds, "dist": np.int64(0)}),
            pd.DataFrame({"node": touched, "dist": np.int64(1)}),
        ],
        ignore_index=True,
    ).sort_values("node", ignore_index=True)
    return out.astype({"dist": "int64"})


def q_kg_path_npred(sf_dir: str, *, num_partitions: int = _P):
    """Negated-property-set showcase — every edge that is NOT a
    structural one:

        ?x !(rdf:type | <imports> | <inRepo>) ?y

    (leaves defines/calls/author/license/language/name/commitHash —
    the "content" facts of the KG.) One vectorized anti-membership pass
    + the global DISTINCT exchange. DuckDB oracle: ``p NOT IN (…)``."""
    from ..sources.synth import read_source_files
    from ..schema import RDF_TYPE
    from ..stages.extract import NS, extract_triples

    from .queries import _extracted

    triples = _extracted(sf_dir)
    edges = compile_path(
        triples,
        ("npred", RDF_TYPE, NS + "imports", NS + "inRepo"),
        num_partitions=num_partitions,
    )
    out = path_distinct(edges, num_partitions=num_partitions)

    def rename(df: pd.DataFrame) -> pd.DataFrame:
        return df.rename(columns={"a": "x", "b": "y"})

    return out.map_batches(rename, batch_format="pandas")


def sql_kg_path_npred() -> str:
    from ..schema import RDF_TYPE
    from ..sources.synth import SOURCE_FILES_SQL
    from ..stages.extract import NS
    from .oracle import _q, _with, build_raw_triples_cte, files_cte, syms_cte

    excl = ", ".join(_q(p) for p in (RDF_TYPE, NS + "imports", NS + "inRepo"))
    return (
        _with(SOURCE_FILES_SQL, files_cte(), syms_cte(), build_raw_triples_cte())
        + f"""
SELECT DISTINCT s AS x, o AS y
FROM raw_triples WHERE p NOT IN ({excl})
ORDER BY x, y"""
    )


def q_kg_path_range(sf_dir: str, *, num_partitions: int = _P):
    """Bounded path repetition — SPARQL p{1,2}:

        ?a (^<imports>/<imports>){1,2} ?b

    module pairs within one or two co-import steps (modules sharing a
    file, or linked through an intermediate module). The co-import base
    relation is module-domain-sized (vocabulary class), so its bounded
    powers stay small even when the file corpus is huge — the reason
    {n,m} is evaluated relation-composed rather than anchored-BFS like
    p+."""
    from ..sources.synth import read_source_files
    from ..stages.extract import NS, extract_triples

    from .queries import _extracted

    triples = _extracted(sf_dir)
    edges = compile_path(
        triples,
        ("range",
         ("seq", ("inv", ("pred", NS + "imports")), ("pred", NS + "imports")),
         1, 2),
        num_partitions=num_partitions,
    )
    return path_distinct(edges, num_partitions=num_partitions)


def sql_kg_path_range() -> str:
    from ..sources.synth import SOURCE_FILES_SQL
    from ..stages.extract import NS
    from .oracle import _q, _with, build_raw_triples_cte, files_cte, syms_cte

    return (
        _with(SOURCE_FILES_SQL, files_cte(), syms_cte(), build_raw_triples_cte())
        + f""",
ie AS (
  SELECT DISTINCT s AS f, o AS m FROM raw_triples WHERE p = {_q(NS + "imports")}
),
co AS (
  SELECT DISTINCT i1.m AS a, i2.m AS b
  FROM ie i1 JOIN ie i2 ON i1.f = i2.f
),
co2 AS (
  SELECT DISTINCT c1.a, c2.b FROM co c1 JOIN co c2 ON c1.b = c2.a
)
SELECT a, b FROM (SELECT a, b FROM co UNION SELECT a, b FROM co2)
ORDER BY a, b"""
    )
