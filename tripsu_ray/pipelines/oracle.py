"""DuckDB oracle SQL for the KG pipeline — the same spec, SQL rendering.

Each CTE mirrors one Ray stage 1:1 (synth → extract → type index → pseudo →
link → materialize). Regex patterns and namespaces are imported from
``stages.extract`` so Python and SQL cannot drift apart. The driver runs
these against the pre-registered parquet views at sf=0.01 and compares
row-count + schema + order-insensitive value hashes with the Ray results.

All IRIs here are *bare* strings: the synthetic corpus contains no blank
nodes or tagged literals, so the bracketed term-key disambiguation the Ray
engine uses internally is the identity at this boundary.
"""

from __future__ import annotations

from ..sources.synth import SOURCE_FILES_SQL
from ..stages.extract import (
    AUTHOR_PATTERNS,
    CALL_NS,
    CALL_PATTERNS,
    CLASS_PATTERNS,
    FILE_NS,
    FUNC_PATTERNS,
    IMPORT_PATTERNS,
    LANGS,
    LICENSE_PATTERNS,
    MOD_NS,
    NS,
    REPO_NS,
    SYM_NS,
)
from ..pipelines.kg import DEFAULT_RULES, DEFAULT_SALT
from ..schema import RDF_TYPE


def _q(s: str) -> str:
    """SQL single-quote a string literal."""
    return "'" + s.replace("'", "''") + "'"


def _unnest_select(pred_expr: str, obj_expr: str, kind: str, pattern: str, lang: str,
                   sfx: str = "") -> str:
    return (
        f"SELECT file_iri AS s, {pred_expr} AS p, {obj_expr} AS o, '{kind}' AS k\n"
        f"  FROM (SELECT file_iri, sym_base, unnest(regexp_extract_all(content, {_q(pattern)}, 1)) AS m\n"
        f"        FROM files{sfx} WHERE lang = '{lang}')"
    )


def files_cte(sfx: str = "") -> str:
    # ``sfx`` renders the same extraction over an alternate source table
    # (source_files{sfx}) under distinct CTE names — used by the graph-diff
    # oracle, which needs the pipeline run twice in one query
    return (
        f"files{sfx} AS (\n"
        "  SELECT repo, path, commit, lang, content,\n"
        f"    {_q(FILE_NS)} || repo || '/' || path AS file_iri,\n"
        f"    {_q(REPO_NS)} || repo AS repo_iri,\n"
        f"    {_q(SYM_NS)} || repo || '/' || path || '#' AS sym_base\n"
        f"  FROM source_files{sfx}\n"
        ")"
    )


def syms_cte(sfx: str = "") -> str:
    parts = []
    for lg in LANGS:
        for pats, cls in ((FUNC_PATTERNS, "Function"), (CLASS_PATTERNS, "Class")):
            parts.append(
                f"SELECT file_iri, sym_base || m AS sym, m AS name, {_q(NS + cls)} AS cls\n"
                f"  FROM (SELECT file_iri, sym_base, unnest(regexp_extract_all(content, {_q(pats[lg])}, 1)) AS m\n"
                f"        FROM files{sfx} WHERE lang = '{lg}')"
            )
    return f"syms{sfx} AS (\n  " + "\n  UNION ALL\n  ".join(parts) + "\n)"


def build_raw_triples_cte(sfx: str = "") -> str:
    """files + syms → raw_triples (one UNION ALL branch per emission rule)."""
    parts = [
        f"SELECT file_iri AS s, {_q(RDF_TYPE)} AS p, {_q(NS + 'File')} AS o, 'iri' AS k FROM files{sfx}",
        f"SELECT file_iri, {_q(NS + 'inRepo')}, repo_iri, 'iri' FROM files{sfx}",
        f"SELECT repo_iri, {_q(RDF_TYPE)}, {_q(NS + 'Repository')}, 'iri' FROM files{sfx}",
        f"SELECT file_iri, {_q(NS + 'language')}, lang, 'literal' FROM files{sfx}",
        f"SELECT file_iri, {_q(NS + 'commitHash')}, commit, 'literal' FROM files{sfx}",
        f"SELECT file_iri, {_q(NS + 'sha256')}, sha256(content), 'literal' FROM files{sfx}",
        # defs from the syms CTE
        f"SELECT file_iri, {_q(NS + 'defines')}, sym, 'iri' FROM syms{sfx}",
        f"SELECT sym, {_q(RDF_TYPE)}, cls, 'iri' FROM syms{sfx}",
        f"SELECT sym, {_q(NS + 'name')}, name, 'literal' FROM syms{sfx}",
    ]
    for lg in LANGS:
        parts.append(
            f"SELECT repo_iri, {_q(NS + 'author')}, regexp_extract(content, {_q(AUTHOR_PATTERNS[lg])}, 1), 'literal' "
            f"FROM files{sfx} WHERE lang = '{lg}' AND regexp_matches(content, {_q(AUTHOR_PATTERNS[lg])})"
        )
        parts.append(
            f"SELECT repo_iri, {_q(NS + 'license')}, regexp_extract(content, {_q(LICENSE_PATTERNS[lg])}, 1), 'literal' "
            f"FROM files{sfx} WHERE lang = '{lg}' AND regexp_matches(content, {_q(LICENSE_PATTERNS[lg])})"
        )
        for pat in IMPORT_PATTERNS[lg]:
            parts.append(_unnest_select(_q(NS + "imports"), f"{_q(MOD_NS)} || m", "iri", pat, lg, sfx))
            parts.append(
                f"SELECT {_q(MOD_NS)} || m AS s, {_q(RDF_TYPE)} AS p, {_q(NS + 'Module')} AS o, 'iri' AS k\n"
                f"  FROM (SELECT unnest(regexp_extract_all(content, {_q(pat)}, 1)) AS m\n"
                f"        FROM files{sfx} WHERE lang = '{lg}')"
            )
        parts.append(_unnest_select(_q(NS + "calls"), f"{_q(CALL_NS)} || m", "iri", CALL_PATTERNS[lg], lg, sfx))
    return f"raw_triples{sfx} AS (\n  " + "\n  UNION ALL\n  ".join(parts) + "\n)"


def pseudo_ctes(rules: dict | None = None, salt: str = DEFAULT_SALT) -> str:
    rules = DEFAULT_RULES if rules is None else rules
    of_type = [u.strip("<>") for u in rules.get("nodes", {}).get("of_type", [])]
    on_pred = [u.strip("<>") for u in rules.get("objects", {}).get("on_predicate", [])]
    otp = {
        t.strip("<>"): [p.strip("<>") for p in ps]
        for t, ps in rules.get("objects", {}).get("on_type_predicate", {}).items()
    }
    salt_q = _q(salt)

    of_type_list = ", ".join(_q(u) for u in of_type) or "''"
    on_pred_list = ", ".join(_q(u) for u in on_pred) or "''"
    otp_values = (
        ", ".join(f"({_q(t)}, {_q(p)})" for t, ps in otp.items() for p in ps)
        or "('', '')"
    )
    return f"""
type_index AS (
  SELECT DISTINCT s AS subject, o AS type FROM raw_triples WHERE p = {_q(RDF_TYPE)}
),
sensitive AS (
  SELECT DISTINCT subject FROM type_index WHERE type IN ({of_type_list})
),
otp_pairs AS (
  SELECT DISTINCT ti.subject, r.pred
  FROM type_index ti JOIN (VALUES {otp_values}) AS r(typ, pred) ON ti.type = r.typ
),
masked AS (
  SELECT t.s, t.p, t.o, t.k,
    (t.s IN (SELECT subject FROM sensitive)) AS ms,
    ((t.k = 'iri' AND t.o IN (SELECT subject FROM sensitive))
      OR t.p IN ({on_pred_list})
      OR EXISTS (SELECT 1 FROM otp_pairs op WHERE op.subject = t.s AND op.pred = t.p)) AS mo
  FROM raw_triples t
),
pseudo AS (
  SELECT
    CASE WHEN ms THEN regexp_extract(s, '^(.*[/#])', 1) || sha256({salt_q} || s) ELSE s END AS s,
    p,
    CASE WHEN mo THEN
      CASE WHEN k = 'iri' THEN regexp_extract(o, '^(.*[/#])', 1) || sha256({salt_q} || o)
           ELSE sha256({salt_q} || o) END
    ELSE o END AS o,
    k
  FROM masked
)
""".strip()


LINK_CTES = f"""
link_keys AS (
  SELECT iri,
         regexp_replace(lower(regexp_extract(iri, '([^/#]+)$', 1)), '\\.(js|py|rs)$', '') AS key
  FROM (SELECT DISTINCT iri FROM (
          SELECT s AS iri FROM pseudo
          UNION SELECT o FROM pseudo WHERE k = 'iri'))
  WHERE iri LIKE {_q(MOD_NS + '%')} OR iri LIKE {_q(CALL_NS + '%')}
),
canon AS (
  SELECT key, min(iri) AS canonical FROM link_keys GROUP BY key
),
link_map AS (
  SELECT lk.iri, c.canonical FROM link_keys lk JOIN canon c USING (key)
),
linked AS (
  SELECT coalesce(m1.canonical, p.s) AS s, p.p,
         CASE WHEN p.k = 'iri' THEN coalesce(m2.canonical, p.o) ELSE p.o END AS o,
         p.k
  FROM pseudo p
  LEFT JOIN link_map m1 ON p.s = m1.iri
  LEFT JOIN link_map m2 ON p.k = 'iri' AND p.o = m2.iri
)
""".strip()


def _with(*ctes: str) -> str:
    return "WITH " + ",\n".join(ctes)


def sql_source_files() -> str:
    return (
        _with(SOURCE_FILES_SQL)
        + "\nSELECT repo, path, commit, lang, sha256(content) AS content_sha256"
        + "\nFROM source_files ORDER BY repo, path"
    )


def sql_extract() -> str:
    return (
        _with(SOURCE_FILES_SQL, files_cte(), syms_cte(), build_raw_triples_cte())
        + "\nSELECT DISTINCT s AS subject, p AS predicate, o AS object_value, k AS object_kind"
        + "\nFROM raw_triples ORDER BY 1, 2, 3"
    )


def sql_type_index() -> str:
    return (
        _with(SOURCE_FILES_SQL, files_cte(), syms_cte(), build_raw_triples_cte())
        + f"\nSELECT DISTINCT s AS subject, o AS type FROM raw_triples WHERE p = {_q(RDF_TYPE)}"
        + "\nORDER BY 1, 2"
    )


def sql_pseudo() -> str:
    return (
        _with(SOURCE_FILES_SQL, files_cte(), syms_cte(), build_raw_triples_cte(), pseudo_ctes())
        + "\nSELECT DISTINCT s AS subject, p AS predicate, o AS object_value, k AS object_kind"
        + "\nFROM pseudo ORDER BY 1, 2, 3"
    )


def sql_link_map() -> str:
    return (
        _with(
            SOURCE_FILES_SQL, files_cte(), syms_cte(), build_raw_triples_cte(), pseudo_ctes(), LINK_CTES
        )
        + "\nSELECT key, canonical FROM canon ORDER BY key"
    )


def sql_degrees() -> str:
    return (
        _with(SOURCE_FILES_SQL, files_cte(), syms_cte(), build_raw_triples_cte())
        + ",\ndt AS (SELECT DISTINCT s, p, o, k FROM raw_triples)"
        + "\nSELECT s AS subject, CAST(count(*) AS BIGINT) AS out_degree,"
        + "\n       CAST(count(DISTINCT p) AS BIGINT) AS n_predicates"
        + "\nFROM dt GROUP BY s ORDER BY s"
    )


def sql_pred_census() -> str:
    return (
        _with(SOURCE_FILES_SQL, files_cte(), syms_cte(), build_raw_triples_cte())
        + ",\ndt AS (SELECT DISTINCT s, p, o, k FROM raw_triples)"
        + "\nSELECT p AS predicate, CAST(count(*) AS BIGINT) AS n_triples,"
        + "\n       CAST(count(DISTINCT s) AS BIGINT) AS n_subjects"
        + "\nFROM dt GROUP BY p ORDER BY p"
    )


def sql_co_neighbors() -> str:
    return (
        _with(SOURCE_FILES_SQL, files_cte(), syms_cte(), build_raw_triples_cte())
        + f""",
edges AS (
  SELECT DISTINCT s AS a, o AS b FROM raw_triples
  WHERE k = 'iri' AND p <> {_q(RDF_TYPE)} AND s <> o
),
two AS (SELECT DISTINCT e1.a AS a, e2.a AS c
        FROM edges e1 JOIN edges e2 ON e1.b = e2.b AND e1.a <> e2.a)
SELECT a AS node, CAST(count(*) AS BIGINT) AS n_co_neighbors
FROM two GROUP BY a ORDER BY a"""
    )


def sql_butterflies() -> str:
    return (
        _with(SOURCE_FILES_SQL, files_cte(), syms_cte(), build_raw_triples_cte())
        + f""",
edges AS (
  SELECT DISTINCT s AS a, o AS b FROM raw_triples
  WHERE k = 'iri' AND p <> {_q(RDF_TYPE)} AND s <> o
),
-- degree-census hub cap, the engine's exact rank rule (graph.py::
-- target_degree_cap): d_q = ascending distinct-target-degree list at
-- 1-based rank ceil(0.99 n); cap = greatest(64, 4 * d_q)
deg AS (SELECT b, count(*) AS d FROM edges GROUP BY b),
cap AS (
  SELECT greatest(64, 4 * max(CASE WHEN rn = CAST(ceil(0.99 * cnt) AS BIGINT)
                              THEN d END)) AS c
  FROM (SELECT d, row_number() OVER (ORDER BY d) AS rn,
               count(*) OVER () AS cnt FROM deg)
),
pe AS (
  SELECT e.a, e.b FROM edges e JOIN deg ON deg.b = e.b, cap
  WHERE deg.d <= cap.c
),
codeg AS (
  SELECT e1.a AS u, e2.a AS v, count(*) AS c
  FROM pe e1 JOIN pe e2 ON e1.b = e2.b AND e1.a < e2.a
  GROUP BY 1, 2 HAVING count(*) >= 2
),
per AS (
  SELECT u AS node, c * (c - 1) / 2 AS bf FROM codeg
  UNION ALL
  SELECT v AS node, c * (c - 1) / 2 AS bf FROM codeg
)
SELECT node, CAST(sum(bf) AS BIGINT) AS n_butterflies
FROM per GROUP BY node ORDER BY node"""
    )


def sql_pagerank_q(*, n_iter: int = 8, scale: int = 10**12,
                   damp_num: int = 85, damp_den: int = 100,
                   top_k: int = 50) -> str:
    """Quantized PageRank oracle — K UNROLLED round CTEs, each applying
    the IDENTICAL integer update rule as
    ``stages.graph.pagerank_quantized`` (see its docstring; integer
    division is bit-identical across engines, closing the round-2
    'kg_pagerank has no SQL oracle' gap). Standard SQL forbids GROUP BY
    in a recursive term, so the fixed round count unrolls instead —
    the oracle is generated Python, so K CTEs cost nothing."""
    rounds = []
    prev = "r0"
    for k in range(1, n_iter + 1):
        cur = f"r{k}"
        # MATERIALIZED: each round references the previous twice (dangling
        # sum + contribution join); inlining would expand the chain 2^K-fold
        rounds.append(f""",
{cur} AS MATERIALIZED (
  SELECT nd.node, nd.deg,
         CAST({(damp_den - damp_num) * scale} // ({damp_den} * cnt.n)
              + ({damp_num} * (coalesce(c.s, 0)
                 + (SELECT coalesce(sum(q), 0) FROM {prev} WHERE deg = 0) // cnt.n))
              // {damp_den} AS BIGINT) AS q
  FROM nd CROSS JOIN cnt
  LEFT JOIN (SELECT e.b AS node, sum(r.q // r.deg) AS s
             FROM edges e JOIN {prev} r ON r.node = e.a AND r.deg > 0
             GROUP BY e.b) c ON c.node = nd.node
)""")
        prev = cur
    return (
        _with(SOURCE_FILES_SQL, files_cte(), syms_cte(), build_raw_triples_cte())
        + f""",
edges AS MATERIALIZED (
  SELECT DISTINCT s AS a, o AS b FROM raw_triples
  WHERE k = 'iri' AND p <> {_q(RDF_TYPE)} AND s <> o
),
odeg AS (SELECT a AS node, count(*) AS deg FROM edges GROUP BY a),
allnodes AS (SELECT DISTINCT node FROM
             (SELECT a AS node FROM edges UNION ALL SELECT b FROM edges)),
nd AS MATERIALIZED (SELECT an.node, CAST(coalesce(odeg.deg, 0) AS BIGINT) AS deg
       FROM allnodes an LEFT JOIN odeg USING (node)),
cnt AS MATERIALIZED (SELECT count(*) AS n FROM nd),
r0 AS MATERIALIZED (
  SELECT node, deg, CAST({scale} // cnt.n AS BIGINT) AS q FROM nd, cnt)"""
        + "".join(rounds)
        + f"""
SELECT node, q AS rank_q FROM {prev}
ORDER BY rank_q DESC, node ASC LIMIT {top_k}"""
    )


def sql_hits_q(*, n_iter: int = 4, scale: int = 10**9) -> str:
    """Quantized HITS oracle — K UNROLLED round CTEs applying the
    IDENTICAL integer update rule as ``stages.graph.hits_quantized``
    (see its docstring: L1-normalized mutual reinforcement, all floor
    divisions). The norm multiply runs in HUGEINT — araw·scale overflows
    BIGINT exactly as it overflows int64, which is why the engine
    normalizes in Python ints; the stored scores are ≤ scale and cast
    back to BIGINT. Same unroll rationale as ``sql_pagerank_q``."""
    rounds = []
    prev_h = "h0"
    for k in range(1, n_iter + 1):
        rounds.append(f""",
araw{k} AS MATERIALIZED (
  SELECT e.b AS node, sum(h.q) AS s
  FROM edges e JOIN {prev_h} h ON h.node = e.a GROUP BY e.b
),
a{k} AS MATERIALIZED (
  SELECT an.node,
         CAST(CAST(coalesce(r.s, 0) AS HUGEINT) * {scale}
              // greatest((SELECT sum(s) FROM araw{k}), 1) AS BIGINT) AS q
  FROM allnodes an LEFT JOIN araw{k} r ON r.node = an.node
),
hraw{k} AS MATERIALIZED (
  SELECT e.a AS node, sum(a.q) AS s
  FROM edges e JOIN a{k} a ON a.node = e.b GROUP BY e.a
),
h{k} AS MATERIALIZED (
  SELECT an.node,
         CAST(CAST(coalesce(r.s, 0) AS HUGEINT) * {scale}
              // greatest((SELECT sum(s) FROM hraw{k}), 1) AS BIGINT) AS q
  FROM allnodes an LEFT JOIN hraw{k} r ON r.node = an.node
)""")
        prev_h = f"h{k}"
    return (
        _with(SOURCE_FILES_SQL, files_cte(), syms_cte(), build_raw_triples_cte())
        + f""",
edges AS MATERIALIZED (
  SELECT DISTINCT s AS a, o AS b FROM raw_triples
  WHERE k = 'iri' AND p <> {_q(RDF_TYPE)} AND s <> o
),
allnodes AS MATERIALIZED (SELECT DISTINCT node FROM
             (SELECT a AS node FROM edges UNION ALL SELECT b FROM edges)),
h0 AS (SELECT node, CAST({scale} AS BIGINT) AS q FROM allnodes)"""
        + "".join(rounds)
        + f"""
SELECT n.node AS node, h.q AS hub_q, a.q AS auth_q
FROM allnodes n JOIN h{n_iter} h ON h.node = n.node
JOIN a{n_iter} a ON a.node = n.node
ORDER BY auth_q DESC, hub_q DESC, n.node ASC"""
    )


def sql_random_walks(*, num_walks: int = 2, walk_len: int = 4) -> str:
    """Walk-corpus oracle — K UNROLLED step CTEs replaying the IDENTICAL
    seed + step formula as ``stages.graph.random_walks``: per-walk seed
    ``('0x' || substr(sha256(start||US||walk_no), 1, 15))::BIGINT``
    (bit-equal to Python's ``int(hexdigest[:15], 16)``, verified in
    test), step k picks neighbor rank ``xor(seed, k·C) % degree`` into
    the nbr-ascending ROW_NUMBER ranking — the closure that moved
    kg_random_walks from rows-only to hash-checked."""
    from ..stages.graph import _WALK_STEP_C

    if walk_len > 12:  # same budget as random_walks' guard (k·C ≤ 2^63)
        raise ValueError(f"walk_len={walk_len} exceeds the oracle's BIGINT "
                         f"step-constant budget (max 12)")
    steps = []
    prev = "w0"
    for k in range(1, walk_len + 1):
        cur = f"w{k}"
        steps.append(f""",
{cur} AS MATERIALIZED (
  SELECT w.start, w.walk_no, w.path || '>' || a.nbr AS path, a.nbr AS cur,
         w.seed
  FROM {prev} w JOIN adj a
    ON a.node = w.cur AND a.rk = xor(w.seed, {k * _WALK_STEP_C}) % a.deg
)""")
        prev = cur
    return (
        _with(SOURCE_FILES_SQL, files_cte(), syms_cte(), build_raw_triples_cte())
        + f""",
edges AS MATERIALIZED (
  SELECT DISTINCT s AS a, o AS b FROM raw_triples
  WHERE k = 'iri' AND p <> {_q(RDF_TYPE)} AND s <> o
),
sym AS (SELECT a AS node, b AS nbr FROM edges
        UNION SELECT b AS node, a AS nbr FROM edges),
adj AS MATERIALIZED (
  SELECT node, nbr,
         ROW_NUMBER() OVER (PARTITION BY node ORDER BY nbr) - 1 AS rk,
         count(*) OVER (PARTITION BY node) AS deg
  FROM sym
),
w0 AS MATERIALIZED (
  SELECT n.node AS start, wn.wn AS walk_no, n.node AS path, n.node AS cur,
         ('0x' || substr(sha256(n.node || chr(31) || CAST(wn.wn AS VARCHAR)),
                         1, 15))::BIGINT AS seed
  FROM (SELECT DISTINCT node FROM sym) n
  CROSS JOIN (SELECT unnest(generate_series(0, {num_walks - 1})) AS wn) wn
)"""
        + "".join(steps)
        + f"""
SELECT start, CAST(walk_no AS BIGINT) AS walk_no, path AS walk
FROM {prev} ORDER BY start, walk_no"""
    )


def sql_bfs() -> str:
    # Capped recursive-CTE BFS walk: UNION-dedup on (node, dist) pairs;
    # min(dist) per node = hop distance. The dist < 64 cap bounds the
    # recursion on cycles (exact while eccentricity < 64 — the Ray side's
    # level count is the witness). sf-small anchor for the distributed
    # frontier expansion in stages/graph.py.
    return (
        "WITH RECURSIVE "
        + ",\n".join(
            (SOURCE_FILES_SQL, files_cte(), syms_cte(), build_raw_triples_cte())
        )
        + f""",
edges AS (
  SELECT DISTINCT s AS a, o AS b FROM raw_triples
  WHERE k = 'iri' AND p <> {_q(RDF_TYPE)} AND s <> o
),
sym AS (SELECT a, b FROM edges UNION SELECT b AS a, a AS b FROM edges),
walk AS (
  SELECT (SELECT min(x) FROM (SELECT a AS x FROM edges
                              UNION SELECT b AS x FROM edges)) AS node,
         0 AS dist
  UNION
  SELECT s.b AS node, w.dist + 1 AS dist
  FROM walk w JOIN sym s ON s.a = w.node WHERE w.dist < 64
)
SELECT node, CAST(min(dist) AS BIGINT) AS dist
FROM walk GROUP BY node ORDER BY node"""
    )


def sql_eccentricity(*, num_seeds: int = 4) -> str:
    """Seed-tagged BFS-walk oracle for ``stages.graph.eccentricity_census``
    — sql_bfs's recursive CTE carrying a seed column, grouped twice
    (min dist per (seed, node), then max/count per seed)."""
    return (
        "WITH RECURSIVE "
        + ",\n".join(
            (SOURCE_FILES_SQL, files_cte(), syms_cte(), build_raw_triples_cte())
        )
        + f""",
edges AS (
  SELECT DISTINCT s AS a, o AS b FROM raw_triples
  WHERE k = 'iri' AND p <> {_q(RDF_TYPE)} AND s <> o
),
sym AS (SELECT a, b FROM edges UNION SELECT b AS a, a AS b FROM edges),
seeds AS (SELECT x AS node FROM (SELECT a AS x FROM sym UNION SELECT b FROM sym)
          ORDER BY x LIMIT {num_seeds}),
walk AS (
  SELECT node AS seed, node, 0 AS dist FROM seeds
  UNION
  SELECT w.seed, s.b AS node, w.dist + 1 AS dist
  FROM walk w JOIN sym s ON s.a = w.node WHERE w.dist < 64
),
mind AS (SELECT seed, node, min(dist) AS d FROM walk GROUP BY seed, node)
SELECT seed, CAST(max(d) AS BIGINT) AS ecc, CAST(count(*) AS BIGINT) AS n_reached
FROM mind GROUP BY seed ORDER BY seed"""
    )


def sql_core_numbers(*, n_iter: int = 64) -> str:
    """Exact coreness oracle — K UNROLLED iterated-H-index rounds, same
    update rule as ``stages.graph.core_numbers`` (Lü et al. 2016: init
    est = distinct-neighbor degree; per round est[v] ← H-index of the
    neighbors' estimates, where H = max_i min(i, c_(i)) over the
    descending-sorted values). The H operator is IDEMPOTENT at the
    fixpoint, so any K at or past the convergence round yields the exact
    coreness — the engine converges in far fewer rounds at oracle scale
    (its ``max_rounds`` raise is the witness), and extra SQL rounds are
    no-ops. Standard SQL forbids GROUP BY in a recursive term, so the
    fixed round count unrolls (generated Python; K CTEs cost nothing).
    Closes the round-2 'kg_core_numbers has no SQL oracle' gap the same
    way sql_pagerank_q closed PageRank's."""
    rounds = []
    prev = "h0"
    for i in range(1, n_iter + 1):
        cur = f"h{i}"
        rounds.append(f""",
{cur} AS MATERIALIZED (
  SELECT v, CAST(max(least(rn, c)) AS BIGINT) AS est FROM (
    SELECT n.v, p.est AS c,
           row_number() OVER (PARTITION BY n.v ORDER BY p.est DESC) AS rn
    FROM sym n JOIN {prev} p ON p.v = n.u
  ) GROUP BY v
)""")
        prev = cur
    return (
        _with(SOURCE_FILES_SQL, files_cte(), syms_cte(), build_raw_triples_cte())
        + f""",
edges AS MATERIALIZED (
  SELECT DISTINCT s AS a, o AS b FROM raw_triples
  WHERE k = 'iri' AND p <> {_q(RDF_TYPE)} AND s <> o
),
sym AS MATERIALIZED (
  SELECT a AS v, b AS u FROM edges UNION SELECT b AS v, a AS u FROM edges
),
h0 AS MATERIALIZED (
  SELECT v, CAST(count(*) AS BIGINT) AS est FROM sym GROUP BY v
)"""
        + "".join(rounds)
        + f"""
SELECT v AS node, est AS core FROM {prev} ORDER BY node"""
    )


def sql_components() -> str:
    # Reachability-closure connected components (UNION-dedup recursive CTE):
    # exact but O(sum comp_size^2) rows — the sf0.01 oracle anchor for the
    # distributed min-label propagation in stages/graph.py.
    return (
        "WITH RECURSIVE "
        + ",\n".join(
            (SOURCE_FILES_SQL, files_cte(), syms_cte(), build_raw_triples_cte())
        )
        + f""",
edges AS (
  SELECT DISTINCT s AS a, o AS b FROM raw_triples
  WHERE k = 'iri' AND p <> {_q(RDF_TYPE)} AND s <> o
),
sym AS (SELECT a, b FROM edges UNION SELECT b AS a, a AS b FROM edges),
reach AS (
  SELECT a AS n, b AS m FROM sym
  UNION
  SELECT r.n, s.b AS m FROM reach r JOIN sym s ON r.m = s.a
)
SELECT n AS node, least(n, min(m)) AS component
FROM reach GROUP BY n ORDER BY n"""
    )


def sql_lpa_communities(rounds: int = 4) -> str:
    """Unrolled synchronous label-propagation oracle — exact dual of
    ``stages/graph.py::lpa_communities``: lab0(n)=n, then ``rounds``
    simultaneous mode-of-neighbor-labels updates with (count desc, label
    asc) tie-breaks rendered as a row_number window. Each lab CTE is
    MATERIALIZED (referenced by the next round's join)."""
    parts = [
        ",\n".join(
            (SOURCE_FILES_SQL, files_cte(), syms_cte(), build_raw_triples_cte())
        )
        + f""",
edges AS (
  SELECT DISTINCT s AS a, o AS b FROM raw_triples
  WHERE k = 'iri' AND p <> {_q(RDF_TYPE)} AND s <> o
),
sym AS MATERIALIZED (SELECT a, b FROM edges UNION SELECT b AS a, a AS b FROM edges),
lab0 AS MATERIALIZED (SELECT DISTINCT a AS n, a AS lab FROM sym)"""
    ]
    for r in range(rounds):
        parts.append(
            f""",
lab{r + 1} AS MATERIALIZED (
  SELECT n, lab FROM (
    SELECT s.a AS n, l.lab, count(*) AS c,
           row_number() OVER (PARTITION BY s.a
                              ORDER BY count(*) DESC, l.lab) AS rn
    FROM sym s JOIN lab{r} l ON l.n = s.b
    GROUP BY s.a, l.lab
  ) WHERE rn = 1
)"""
        )
    parts.append(
        f"""
SELECT n AS node, lab AS community FROM lab{rounds} ORDER BY n"""
    )
    return ("WITH " + "".join(parts)).strip()


def sql_char_sets() -> str:
    return (
        _with(SOURCE_FILES_SQL, files_cte(), syms_cte(), build_raw_triples_cte())
        + """,
dt AS (SELECT DISTINCT s, p, o, k FROM raw_triples),
per AS (
  SELECT s, string_agg(DISTINCT p, '|' ORDER BY p) AS signature,
         count(*) AS nt
  FROM dt GROUP BY s
)
SELECT signature, CAST(count(*) AS BIGINT) AS n_subjects,
       CAST(sum(nt) AS BIGINT) AS n_triples
FROM per GROUP BY 1 ORDER BY 1"""
    )


def sql_repo_profile() -> str:
    """2-hop repo profile: LEFT JOINs multiply rows, count(DISTINCT …)
    restores set semantics — the small-scale anchor for the two-exchange
    Ray plan."""
    return (
        _with(SOURCE_FILES_SQL, files_cte(), syms_cte(), build_raw_triples_cte())
        + f""",
dt AS (SELECT DISTINCT s, p, o, k FROM raw_triples),
inrepo AS (SELECT DISTINCT s AS f, o AS r FROM dt WHERE p = {_q(NS + 'inRepo')})
SELECT ir.r AS repo,
  CAST(count(DISTINCT ir.f) AS BIGINT) AS n_files,
  CAST(count(DISTINCT lg.o) AS BIGINT) AS n_langs,
  CAST(count(DISTINCT im.o) AS BIGINT) AS n_modules,
  CAST(count(DISTINCT df.o) AS BIGINT) AS n_symbols
FROM inrepo ir
LEFT JOIN dt lg ON lg.s = ir.f AND lg.p = {_q(NS + 'language')}
LEFT JOIN dt im ON im.s = ir.f AND im.p = {_q(NS + 'imports')}
LEFT JOIN dt df ON df.s = ir.f AND df.p = {_q(NS + 'defines')}
GROUP BY 1 ORDER BY 1"""
    )


def sql_typo_candidates() -> str:
    """Distinct Module local names within Levenshtein ≤ 1 — the exact
    small-scale anchor for the SymSpell deletion-neighborhood join."""
    return (
        _with(SOURCE_FILES_SQL, files_cte(), syms_cte(), build_raw_triples_cte())
        + f""",
modnames AS (
  SELECT DISTINCT regexp_extract(s, '([^/]+)$', 1) AS name
  FROM raw_triples WHERE p = {_q(RDF_TYPE)} AND o = {_q(NS + 'Module')}
)
SELECT a.name AS name_a, b.name AS name_b
FROM modnames a JOIN modnames b
  ON a.name < b.name AND levenshtein(a.name, b.name) <= 1
ORDER BY 1, 2"""
    )


def sql_validate() -> str:
    """SHACL-lite census oracle: the same 8 shapes as stages/validate.py,
    each rendered as scalar-subquery counts over the distinct triples."""
    rt = RDF_TYPE
    ctes = f""",
dt AS (SELECT DISTINCT s, p, o, k FROM raw_triples),
vfiles AS (SELECT s FROM dt WHERE p = {_q(rt)} AND o = {_q(NS + 'File')}),
vrepos AS (SELECT s FROM dt WHERE p = {_q(rt)} AND o = {_q(NS + 'Repository')}),
vmods AS (SELECT s FROM dt WHERE p = {_q(rt)} AND o = {_q(NS + 'Module')}),
vlang AS (SELECT DISTINCT s FROM dt WHERE p = {_q(NS + 'language')}),
vcommits AS (SELECT s, count(DISTINCT o) AS c FROM dt WHERE p = {_q(NS + 'commitHash')} GROUP BY s),
vimp_s AS (SELECT DISTINCT s FROM dt WHERE p = {_q(NS + 'imports')}),
vimp_o AS (SELECT DISTINCT o FROM dt WHERE p = {_q(NS + 'imports')} AND k = 'iri'),
vdefined AS (SELECT DISTINCT o FROM dt WHERE p = {_q(NS + 'defines')} AND k = 'iri'),
vnamed AS (SELECT DISTINCT s FROM dt WHERE p = {_q(NS + 'name')}),
vauth AS (SELECT s, count(DISTINCT o) AS c FROM dt WHERE p = {_q(NS + 'author')} GROUP BY s),
vlic AS (SELECT s, count(DISTINCT o) AS c FROM dt WHERE p = {_q(NS + 'license')} GROUP BY s),
vsha AS (SELECT s, o FROM dt WHERE p = {_q(NS + 'sha256')})"""
    rows = f"""
SELECT 'defines_range_named' AS constraint_name,
  CAST((SELECT count(*) FROM vdefined) AS BIGINT) AS n_checked,
  CAST((SELECT count(*) FROM vdefined d
        WHERE d.o NOT IN (SELECT s FROM vnamed)) AS BIGINT) AS n_violations
UNION ALL
SELECT 'file_has_language',
  CAST((SELECT count(*) FROM vfiles) AS BIGINT),
  CAST((SELECT count(*) FROM vfiles f
        WHERE f.s NOT IN (SELECT s FROM vlang)) AS BIGINT)
UNION ALL
SELECT 'file_single_commit',
  CAST((SELECT count(*) FROM vfiles) AS BIGINT),
  CAST((SELECT count(*) FROM vfiles f
        WHERE coalesce((SELECT c FROM vcommits v WHERE v.s = f.s), 0) <> 1) AS BIGINT)
UNION ALL
SELECT 'imports_domain_is_file',
  CAST((SELECT count(*) FROM vimp_s) AS BIGINT),
  CAST((SELECT count(*) FROM vimp_s i
        WHERE i.s NOT IN (SELECT s FROM vfiles)) AS BIGINT)
UNION ALL
SELECT 'imports_range_is_module',
  CAST((SELECT count(*) FROM vimp_o) AS BIGINT),
  CAST((SELECT count(*) FROM vimp_o i
        WHERE i.o NOT IN (SELECT s FROM vmods)) AS BIGINT)
UNION ALL
SELECT 'repo_single_author',
  CAST((SELECT count(*) FROM vrepos) AS BIGINT),
  CAST((SELECT count(*) FROM vrepos r
        WHERE coalesce((SELECT c FROM vauth v WHERE v.s = r.s), 0) > 1) AS BIGINT)
UNION ALL
SELECT 'repo_single_license',
  CAST((SELECT count(*) FROM vrepos) AS BIGINT),
  CAST((SELECT count(*) FROM vrepos r
        WHERE coalesce((SELECT c FROM vlic v WHERE v.s = r.s), 0) > 1) AS BIGINT)
UNION ALL
SELECT 'sha256_wellformed',
  CAST((SELECT count(*) FROM vsha) AS BIGINT),
  CAST((SELECT count(*) FROM vsha
        WHERE NOT regexp_matches(o, '^[0-9a-f]{{64}}$')) AS BIGINT)
ORDER BY 1"""
    return (
        _with(SOURCE_FILES_SQL, files_cte(), syms_cte(), build_raw_triples_cte())
        + ctes
        + rows
    )


def sql_pipeline() -> str:
    return (
        _with(
            SOURCE_FILES_SQL, files_cte(), syms_cte(), build_raw_triples_cte(), pseudo_ctes(), LINK_CTES
        )
        + "\nSELECT DISTINCT s AS subject, p AS predicate, o AS object_value, k AS object_kind"
        + "\nFROM linked ORDER BY 1, 2, 3"
    )


def sql_rdfs_types() -> str:
    """Recursive subclass closure + rdfs9 type inference + census — the
    oracle anchor for stages/infer.py::rdfs_type_census."""
    from ..stages.infer import default_ontology

    onto = default_ontology(NS)
    vals = ", ".join(f"({_q(c)}, {_q(sup)})" for c, sup in onto)
    return (
        "WITH RECURSIVE "
        + ",\n".join(
            (SOURCE_FILES_SQL, files_cte(), syms_cte(), build_raw_triples_cte())
        )
        + f""",
sub(c, sup) AS (VALUES {vals}),
clo AS (
  SELECT c, sup FROM sub
  UNION
  SELECT clo.c, sub.sup FROM clo JOIN sub ON clo.sup = sub.c
),
typed AS (
  SELECT DISTINCT s, o AS t FROM raw_triples WHERE p = {_q(RDF_TYPE)}
),
all_types AS (
  SELECT s, t FROM typed
  UNION
  SELECT ty.s, c.sup AS t FROM typed ty JOIN clo c ON c.c = ty.t
)
SELECT t AS type, CAST(count(DISTINCT s) AS BIGINT) AS n
FROM all_types GROUP BY 1 ORDER BY 1"""
    )


def sql_graph_diff() -> str:
    """The v1→v2 perturbation (queries.DIFF_EXTRA) rendered in SQL, both
    extractions run in one query, EXCEPT both ways."""
    from .queries import DIFF_EXTRA

    def lit(s: str) -> str:
        # the appended lines contain quotes + newlines: escape '' and chr(10)
        return " || chr(10) || ".join(_q(part) for part in s.rstrip("\n").split("\n")) + " || chr(10)"

    extra = (
        "CASE lang WHEN 'py' THEN " + lit(DIFF_EXTRA["py"])
        + " WHEN 'js' THEN " + lit(DIFF_EXTRA["js"])
        + " ELSE " + lit(DIFF_EXTRA["rs"]) + " END"
    )
    sf2 = f"""
source_files2 AS (
  SELECT d, repo, path, lang, commit,
         content || CASE WHEN d % 9 = 0 THEN {extra} ELSE '' END AS content
  FROM source_files WHERE d % 9 <> 5
)""".strip()
    return (
        _with(
            SOURCE_FILES_SQL,
            files_cte(),
            syms_cte(),
            build_raw_triples_cte(),
            sf2,
            files_cte("2"),
            syms_cte("2"),
            build_raw_triples_cte("2"),
        )
        + """
, a AS (SELECT DISTINCT s, p, o FROM raw_triples),
b AS (SELECT DISTINCT s, p, o FROM raw_triples2)
SELECT s, p, o, 'removed' AS side FROM (SELECT * FROM a EXCEPT SELECT * FROM b)
UNION ALL
SELECT s, p, o, 'added' AS side FROM (SELECT * FROM b EXCEPT SELECT * FROM a)
ORDER BY s, p, o, side"""
    )


def sql_link_scores() -> str:
    return (
        _with(SOURCE_FILES_SQL, files_cte(), syms_cte(), build_raw_triples_cte())
        + f""",
edges AS (
  SELECT DISTINCT s AS a, o AS b FROM raw_triples
  WHERE k = 'iri' AND p <> {_q(RDF_TYPE)} AND s <> o
),
deg AS (SELECT a, count(*) AS d FROM edges GROUP BY a),
pairs AS (
  SELECT e1.a AS a1, e2.a AS a2, count(*) AS n_common
  FROM edges e1 JOIN edges e2 ON e1.b = e2.b AND e1.a < e2.a
  GROUP BY 1, 2 HAVING count(*) >= 2
)
SELECT a1, a2, CAST(n_common AS BIGINT) AS n_common,
       CAST(d1.d + d2.d - n_common AS BIGINT) AS n_union
FROM pairs JOIN deg d1 ON d1.a = a1 JOIN deg d2 ON d2.a = a2
ORDER BY a1, a2"""
    )


def sql_code_stats() -> str:
    from ..stages.extract import CODE_COMMENT_RE, CODE_NEWLINE_RE

    return (
        _with(SOURCE_FILES_SQL)
        + f"""
SELECT repo, lang,
       CAST(count(*) AS BIGINT) AS n_files,
       CAST(sum(len(regexp_extract_all(content, '{CODE_NEWLINE_RE}')))
            AS BIGINT) AS n_lines,
       CAST(sum(len(regexp_extract_all(content, '{CODE_COMMENT_RE}')))
            AS BIGINT) AS n_comment_lines,
       CAST((1000000 * sum(len(regexp_extract_all(content, '{CODE_COMMENT_RE}'))))
            // greatest(sum(len(regexp_extract_all(content, '{CODE_NEWLINE_RE}'))), 1)
            AS BIGINT) AS comment_ratio_q,
       CAST((1000000 * sum(len(regexp_extract_all(content, '{CODE_NEWLINE_RE}'))))
            // count(*) AS BIGINT) AS avg_lines_q
FROM source_files GROUP BY 1, 2 ORDER BY 1, 2"""
    )


def sql_assortativity() -> str:
    return (
        _with(SOURCE_FILES_SQL, files_cte(), syms_cte(), build_raw_triples_cte())
        + f""",
edges AS (
  SELECT DISTINCT s AS a, o AS b FROM raw_triples
  WHERE k = 'iri' AND p <> {_q(RDF_TYPE)} AND s <> o
),
od AS (SELECT a, count(*) AS d FROM edges GROUP BY 1),
idg AS (SELECT b, count(*) AS d FROM edges GROUP BY 1),
xy AS (
  SELECT od.d AS x, idg.d AS y
  FROM edges JOIN od USING (a) JOIN idg USING (b)
),
m AS (
  SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
  FROM xy
)
SELECT CAST(n AS BIGINT) AS n_edges,
       CAST(floor(1000000 * (CAST(n * sxy - sx * sy AS DOUBLE)
            / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                   * CAST(n * syy - sy * sy AS DOUBLE)))) AS BIGINT)
         AS assortativity_q
FROM m"""
    )


def sql_void_stats() -> str:
    return (
        _with(SOURCE_FILES_SQL, files_cte(), syms_cte(), build_raw_triples_cte())
        + f""",
dt AS (SELECT DISTINCT s, p, o, k FROM raw_triples)
SELECT 'classes' AS metric,
       CAST(count(DISTINCT o) AS BIGINT) AS value
FROM dt WHERE p = {_q(RDF_TYPE)}
UNION ALL
SELECT 'distinct_objects', count(DISTINCT o) FROM dt
UNION ALL
SELECT 'distinct_subjects', count(DISTINCT s) FROM dt
UNION ALL
SELECT 'entities', count(DISTINCT iri) FROM (
  SELECT s AS iri FROM dt UNION SELECT o FROM dt WHERE k = 'iri'
)
UNION ALL
SELECT 'properties', count(DISTINCT p) FROM dt
UNION ALL
SELECT 'triples', count(*) FROM dt
ORDER BY metric"""
    )


def sql_namespace_census() -> str:
    return (
        _with(SOURCE_FILES_SQL, files_cte(), syms_cte(), build_raw_triples_cte())
        + """,
iris AS (
  SELECT s AS iri FROM raw_triples
  UNION ALL
  SELECT o FROM raw_triples WHERE k = 'iri'
),
occ AS (
  SELECT coalesce(regexp_extract(iri, '^(.*[#/])', 1), '') AS namespace,
         count(*) AS n_occurrences
  FROM iris GROUP BY 1
),
ent AS (
  SELECT coalesce(regexp_extract(iri, '^(.*[#/])', 1), '') AS namespace,
         count(*) AS n_entities
  FROM (SELECT DISTINCT iri FROM iris) GROUP BY 1
)
SELECT occ.namespace,
       CAST(coalesce(ent.n_entities, 0) AS BIGINT) AS n_entities,
       CAST(occ.n_occurrences AS BIGINT) AS n_occurrences
FROM occ LEFT JOIN ent USING (namespace)
ORDER BY namespace"""
    )


def sql_property_cardinality() -> str:
    return (
        _with(SOURCE_FILES_SQL, files_cte(), syms_cte(), build_raw_triples_cte())
        + f""",
dt AS (SELECT DISTINCT s, p, o, k FROM raw_triples),
types AS (SELECT DISTINCT s, o AS type FROM dt WHERE p = {_q(RDF_TYPE)}),
cnt AS (
  SELECT s, p AS predicate, count(*) AS c
  FROM dt WHERE p <> {_q(RDF_TYPE)} GROUP BY 1, 2
)
SELECT t.type, c.predicate,
       CAST(count(*) AS BIGINT) AS n_subjects,
       CAST(sum(c.c) AS BIGINT) AS sum_c,
       CAST(min(c.c) AS BIGINT) AS min_c,
       CAST(max(c.c) AS BIGINT) AS max_c,
       CAST((1000000 * sum(c.c)) // count(*) AS BIGINT) AS avg_q
FROM types t JOIN cnt c USING (s)
GROUP BY 1, 2 ORDER BY 1, 2"""
    )


def sql_predicate_pmi() -> str:
    return (
        _with(SOURCE_FILES_SQL, files_cte(), syms_cte(), build_raw_triples_cte())
        + """,
sp AS (SELECT DISTINCT s, p FROM raw_triples),
np AS (SELECT p, count(*) AS n FROM sp GROUP BY 1),
tot AS (SELECT count(DISTINCT s) AS n FROM sp),
pq AS (
  SELECT a.p AS p1, b.p AS p2, count(*) AS n_pq
  FROM sp a JOIN sp b ON a.s = b.s AND a.p < b.p
  GROUP BY 1, 2
)
SELECT pq.p1, pq.p2, CAST(pq.n_pq AS BIGINT) AS n_pq,
       CAST(floor(1000000 * (ln(pq.n_pq) + ln(tot.n) - ln(n1.n) - ln(n2.n)))
            AS BIGINT) AS pmi_q
FROM pq JOIN np n1 ON n1.p = pq.p1 JOIN np n2 ON n2.p = pq.p2 CROSS JOIN tot
ORDER BY p1, p2"""
    )


def sql_adamic_adar() -> str:
    return (
        _with(SOURCE_FILES_SQL, files_cte(), syms_cte(), build_raw_triples_cte())
        + f""",
edges AS (
  SELECT DISTINCT s AS a, o AS b FROM raw_triples
  WHERE k = 'iri' AND p <> {_q(RDF_TYPE)} AND s <> o
),
tdeg AS (SELECT b, count(*) AS s FROM edges GROUP BY b)
SELECT e1.a AS a1, e2.a AS a2, CAST(count(*) AS BIGINT) AS n_common,
       CAST(sum(CAST(floor(1000000 / ln(t.s)) AS BIGINT)) AS BIGINT) AS aa_q
FROM edges e1
JOIN edges e2 ON e1.b = e2.b AND e1.a < e2.a
JOIN tdeg t ON t.b = e1.b
GROUP BY 1, 2 HAVING count(*) >= 2
ORDER BY a1, a2"""
    )


def sql_triangles() -> str:
    from ..stages.extract import NS

    return (
        _with(SOURCE_FILES_SQL, files_cte(), syms_cte(), build_raw_triples_cte())
        + f""",
ca AS (
  SELECT DISTINCT t1.o AS a, t2.o AS b
  FROM raw_triples t1
  JOIN raw_triples t2 ON t2.s = t1.s AND t2.p = {_q(NS + "author")} AND t1.o < t2.o
  WHERE t1.p = {_q(NS + "author")}
),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM ca e1
  JOIN ca e2 ON e2.a = e1.b
  JOIN ca e3 ON e3.a = e1.a AND e3.b = e2.b
),
mem AS (
  SELECT x AS node FROM tri
  UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri
)
SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
FROM mem GROUP BY node ORDER BY node"""
    )


def sql_clustering() -> str:
    from ..stages.extract import NS

    return (
        _with(SOURCE_FILES_SQL, files_cte(), syms_cte(), build_raw_triples_cte())
        + f""",
ca AS (
  SELECT DISTINCT t1.o AS a, t2.o AS b
  FROM raw_triples t1
  JOIN raw_triples t2 ON t2.s = t1.s AND t2.p = {_q(NS + "author")} AND t1.o < t2.o
  WHERE t1.p = {_q(NS + "author")}
),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM ca e1
  JOIN ca e2 ON e2.a = e1.b
  JOIN ca e3 ON e3.a = e1.a AND e3.b = e2.b
),
mem AS (
  SELECT x AS node FROM tri
  UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri
),
tric AS (SELECT node, count(*) AS t FROM mem GROUP BY node),
deg AS (
  SELECT node, count(*) AS d
  FROM (SELECT a AS node FROM ca UNION ALL SELECT b AS node FROM ca)
  GROUP BY 1
)
SELECT deg.node, CAST(deg.d AS BIGINT) AS degree,
       CAST(coalesce(tric.t, 0) AS BIGINT) AS n_triangles,
       CASE WHEN deg.d >= 2
            THEN CAST(floor(1000000 * (CAST(2 * coalesce(tric.t, 0) AS DOUBLE)
                                       / CAST(deg.d * (deg.d - 1) AS DOUBLE)))
                 AS BIGINT)
            ELSE 0 END AS cc_q
FROM deg LEFT JOIN tric USING (node) ORDER BY node"""
    )


def sql_rdfs_domain_range() -> str:
    """rdfs2 + rdfs3 + recursive rdfs9 closure + census — the oracle
    anchor for stages/infer.py::rdfs_domain_range_census."""
    from ..stages.infer import default_ontology, default_property_axioms

    onto = default_ontology(NS)
    domains, ranges = default_property_axioms(NS)
    vals = ", ".join(f"({_q(c)}, {_q(sup)})" for c, sup in onto)
    dvals = ", ".join(f"({_q(p)}, {_q(c)})" for p, c in sorted(domains.items()))
    rvals = ", ".join(f"({_q(p)}, {_q(c)})" for p, c in sorted(ranges.items()))
    return (
        "WITH RECURSIVE "
        + ",\n".join(
            (SOURCE_FILES_SQL, files_cte(), syms_cte(), build_raw_triples_cte())
        )
        + f""",
sub(c, sup) AS (VALUES {vals}),
clo AS (
  SELECT c, sup FROM sub
  UNION
  SELECT clo.c, sub.sup FROM clo JOIN sub ON clo.sup = sub.c
),
dom(p, c) AS (VALUES {dvals}),
rng(p, c) AS (VALUES {rvals}),
base AS (
  SELECT DISTINCT s, o AS t FROM raw_triples WHERE p = {_q(RDF_TYPE)}
  UNION
  SELECT DISTINCT t.s, d.c AS t FROM raw_triples t JOIN dom d ON d.p = t.p
  UNION
  SELECT DISTINCT t.o AS s, r.c AS t
  FROM raw_triples t JOIN rng r ON r.p = t.p WHERE t.k = 'iri'
),
all_types AS (
  SELECT s, t FROM base
  UNION
  SELECT b.s, c.sup AS t FROM base b JOIN clo c ON c.c = b.t
)
SELECT t AS type, CAST(count(DISTINCT s) AS BIGINT) AS n
FROM all_types GROUP BY 1 ORDER BY 1"""
    )


def sql_truss_support() -> str:
    from ..stages.extract import NS

    return (
        _with(SOURCE_FILES_SQL, files_cte(), syms_cte(), build_raw_triples_cte())
        + f""",
ca AS (
  SELECT DISTINCT t1.o AS a, t2.o AS b
  FROM raw_triples t1
  JOIN raw_triples t2 ON t2.s = t1.s AND t2.p = {_q(NS + "author")} AND t1.o < t2.o
  WHERE t1.p = {_q(NS + "author")}
),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM ca e1
  JOIN ca e2 ON e2.a = e1.b
  JOIN ca e3 ON e3.a = e1.a AND e3.b = e2.b
),
contrib AS (
  SELECT x AS a, y AS b FROM tri
  UNION ALL SELECT x, z FROM tri
  UNION ALL SELECT y, z FROM tri
),
sup AS (SELECT a, b, count(*) AS s FROM contrib GROUP BY a, b)
SELECT e.a, e.b, CAST(coalesce(sup.s, 0) AS BIGINT) AS support
FROM ca e LEFT JOIN sup ON sup.a = e.a AND sup.b = e.b
ORDER BY e.a, e.b"""
    )


def sql_negative_samples(k: int = 3) -> str:
    from ..stages.extract import NS
    from ..stages.graph import NEG_A, NEG_B, NEG_P

    return (
        _with(SOURCE_FILES_SQL, files_cte(), syms_cte(), build_raw_triples_cte())
        + f""",
e AS (SELECT DISTINCT s AS f, o AS m FROM raw_triples WHERE p = {_q(NS + "imports")}),
srcs AS (
  SELECT f, row_number() OVER (ORDER BY f) AS fc
  FROM (SELECT DISTINCT f FROM e)
),
tgts AS (
  SELECT m, row_number() OVER (ORDER BY m) AS mc
  FROM (SELECT DISTINCT m FROM e)
),
cand AS (
  SELECT s.f, t.m, (s.fc * {NEG_A} + t.mc * {NEG_B}) % {NEG_P} AS h
  FROM srcs s CROSS JOIN tgts t
  WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.f = s.f AND e.m = t.m)
),
ranked AS (
  SELECT f, m, h, row_number() OVER (PARTITION BY f ORDER BY h, m) AS r
  FROM cand
)
SELECT f, m, CAST(h AS BIGINT) AS h FROM ranked WHERE r <= {k}
ORDER BY f, h, m"""
    )
