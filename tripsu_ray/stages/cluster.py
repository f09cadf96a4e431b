"""Distributed k-means over the embedding corpus (curation clustering).

The SemDeDup / cluster-then-sample curation step: partition the embedding
space with Lloyd's algorithm, then report the cluster × ground-truth-label
census. Built as the canonical *broadcast-iterate* plan — the mirror image
of PageRank (`stages/graph.py::pagerank`):

- the k×d centroid matrix is tiny and rides `ray.put` once per round;
- each round is ONE map-only pass: every batch assigns its vectors
  (vectorized int64 Gram expansion) and emits k partial rows
  (cluster, count, per-dim sums) — shuffle volume per round is
  ``k × #batches`` rows regardless of corpus size;
- a small `groupby(cluster).sum()` folds the partials; the driver touches
  only the k×(d+1) result matrix per round. NO all-to-all ever happens on
  the corpus itself, and the corpus stream re-scans per round (at 100 TB
  a compact quantized materialization would be pinned instead — same plan).

Exactness discipline: embeddings are quantized to int64 fixed-point
(``floor(x·10⁶)``) ONCE, distances and sums are exact integers, centroid
updates are floor-divisions — so the result is bit-identical under any
partitioning/reduction order AND expressible as an (unrolled) SQL oracle,
unlike float k-means whose reductions drift per schedule. Ties break to
the lowest cluster id in both engines.

Reference scope: clustering is beyond tripsu (the reference ships no ML
ops); this is north-star training-data-pipeline surface.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..sources import read_parquet_clean as _read_parquet_clean

SCALE = 1_000_000


def _quantize(col: pd.Series) -> np.ndarray:
    m = np.stack(col.to_numpy()).astype(np.float64)
    return np.floor(m * SCALE).astype(np.int64)


def _assign(q: np.ndarray, cen: np.ndarray) -> np.ndarray:
    """argmin_c Σ_d (q−cen)² with ties to the lowest c — exact int64.

    Gram expansion keeps the per-batch cost at one (n×d)·(d×k) integer
    matmul; |q|,|cen| ≤ ~2·10⁵ so every term is far inside int64.
    """
    cross = q @ cen.T  # (n, k) int64
    c2 = np.einsum("kd,kd->k", cen, cen)  # (k,)
    # q² is constant per row — irrelevant to the argmin, skip it
    dist = c2[None, :] - 2 * cross
    return np.argmin(dist, axis=1)  # first occurrence = lowest c


def kmeans_census(
    sf_dir: str,
    *,
    k: int = 8,
    iters: int = 4,
):
    """Run ``iters`` exact Lloyd rounds, return the (cluster_id, label, n)
    census Dataset. Init = the k lowest-``vec_id`` vectors (deterministic
    and SQL-expressible; k-means|| would replace it at real scale)."""
    import ray

    from ray.data.aggregate import Sum

    ds, cen = kmeans_fit(sf_dir, k=k, iters=iters)
    cen_ref = ray.put(cen)

    def census(b: pd.DataFrame, _c=cen_ref) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame(
                {c: pd.Series([], dtype="int64") for c in ("cluster_id", "label", "n")}
            )
        a = _assign(_quantize(b["embedding"]), ray.get(_c))
        return (
            pd.DataFrame(
                {
                    "cluster_id": a.astype(np.int64),
                    "label": b["label"].to_numpy().astype(np.int64),
                    "n": np.int64(1),
                }
            )
            .groupby(["cluster_id", "label"], sort=False, as_index=False)["n"]
            .sum()
        )

    return (
        ds.map_batches(census, batch_format="pandas")
        .groupby(["cluster_id", "label"])
        .aggregate(Sum("n", alias_name="n"))
    )


def _bottom_k_vectors(ds, k: int) -> pd.DataFrame:
    """Global k lowest-``vec_id`` rows of ``ds`` without a driver table
    read: per-batch bottom-k partials folded by re-selection. Returns a
    (vec_id, embedding) DataFrame sorted ascending by vec_id."""
    from .folds import tree_fold_tables

    def bottom(b: pd.DataFrame) -> pd.DataFrame:
        b = b[["vec_id", "embedding"]]
        if len(b) <= k:
            return b
        return b.nsmallest(k, "vec_id")

    def _combine(frames: list[pd.DataFrame]) -> pd.DataFrame:
        cat = pd.concat(frames, ignore_index=True)
        return cat.nsmallest(min(k, len(cat)), "vec_id")

    folded = tree_fold_tables(ds.map_batches(bottom, batch_format="pandas"), _combine)
    if folded is None or not len(folded):
        raise ValueError("k-means init: embeddings table is empty")
    return folded.sort_values("vec_id", ignore_index=True)


# The Lloyd fit is the shared prefix of FIVE gate queries (ml_kmeans /
# ml_semdedup / ml_dbscan / ml_silhouette at k=8 and ann_ivf at k=64) —
# memoize the centroid matrix per (sf_dir, k, iters, file fingerprint),
# the _TOP_COMPONENT_CACHE discipline (fingerprint invalidates rewritten
# tmp dirs). The dataset handle is rebuilt per call (cheap lazy plan).
_KMEANS_CACHE: dict = {}


def kmeans_fit(sf_dir: str, *, k: int = 8, iters: int = 4,
               dims: tuple[int, int] | None = None):
    """``iters`` exact Lloyd rounds; returns ``(dataset, centroids)`` with
    the int64 fixed-point centroid matrix after the final update.
    ``dims=(lo, hi)`` clusters only that embedding slice (the PQ
    per-subspace trainer) — same seeds, same integer algebra, so the
    sliced oracle (`_lloyd_ctes(lo=, hi=)`) replays it."""
    import ray

    ds = _read_parquet_clean(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding", "label"]
    )
    cache_key = (
        sf_dir, k, iters, dims, _file_fingerprint(f"{sf_dir}/embeddings.parquet")
    )
    cached = _KMEANS_CACHE.get(cache_key)
    if cached is not None:
        return ds, cached.copy()

    # --- init: k lowest vec_ids, computed DISTRIBUTED ---------------------
    # Per-batch bottom-k partials + tree fold (the rel_stratified_sample
    # pattern): every batch keeps only its k lowest-vec_id rows, the fold
    # re-selects the global bottom k — the driver only ever holds ≤ fanin·k
    # candidate rows, never the table. Bottom-k is associative/commutative
    # with unique vec_ids, so the selection is bit-identical to the old
    # whole-table argsort at any partitioning.
    init = _bottom_k_vectors(ds, k)
    cen = np.floor(
        np.stack(init["embedding"].to_numpy()).astype(np.float64) * SCALE
    ).astype(np.int64)
    if dims is not None:
        cen = cen[:, dims[0] : dims[1]].copy()
    d = cen.shape[1]
    sum_cols = [f"s{j}" for j in range(d)]

    for _ in range(iters):
        cen_ref = ray.put(cen)

        def partials(b: pd.DataFrame, _c=cen_ref) -> pd.DataFrame:
            if not len(b):
                return pd.DataFrame(
                    {c: pd.Series([], dtype="int64") for c in ["cluster_id", "n", *sum_cols]}
                )
            c = ray.get(_c)
            q = _quantize(b["embedding"])
            if dims is not None:
                q = q[:, dims[0] : dims[1]]
            a = _assign(q, c)
            n = np.bincount(a, minlength=len(c)).astype(np.int64)
            sums = np.zeros((len(c), q.shape[1]), dtype=np.int64)
            np.add.at(sums, a, q)
            out = pd.DataFrame(sums, columns=sum_cols)
            out.insert(0, "n", n)
            out.insert(0, "cluster_id", np.arange(len(c), dtype=np.int64))
            return out[out["n"] > 0]

        # k×#blocks partial rows → rolling tree reduce (the repo's blessed
        # fold for tiny associative partials; a 65-column Ray groupby
        # shuffle costs ~3 s/round of pure overhead at any scale)
        from .folds import tree_fold_tables

        def _combine(frames: list[pd.DataFrame]) -> pd.DataFrame:
            return (
                pd.concat(frames, ignore_index=True)
                .groupby("cluster_id", sort=False, as_index=False)
                .sum()
            )

        folded = tree_fold_tables(
            ds.map_batches(partials, batch_format="pandas"), _combine
        )
        if folded is None or not len(folded):
            return ds, cen
        new = cen.copy()  # empty clusters keep their centroid
        cids = folded["cluster_id"].to_numpy().astype(np.int64)
        counts = folded["n"].to_numpy().astype(np.int64)
        sums = folded[sum_cols].to_numpy().astype(np.int64)
        # floor division on exact ints == the oracle's floor(sum/n) in
        # double (quotient error ≪ 1/n at these magnitudes)
        new[cids] = sums // counts[:, None]
        cen = new

    _KMEANS_CACHE[cache_key] = cen.copy()
    return ds, cen


SIL_SCALE = 100_000


def silhouette_scores(sf_dir: str, *, k: int = 8, iters: int = 4):
    """Simplified (centroid-based) silhouette per vector — the standard
    O(n·k) cluster-quality diagnostic (full silhouette is O(n²); the
    centroid form is the one production pipelines run at scale):

        a = |q − c_own|²,  b = min over other centroids |q − c|²,
        sil_q = floor(10⁵·(b − a) / max(b, 1))  ∈ [0, 10⁵]

    (b ≥ a always, because assignment IS nearest-centroid.) Exact-integer
    end to end on the quantized corpus: distances are int64 sums
    (≤ 64·(4·10⁵)² ≈ 10¹³), the numerator ≤ 10¹⁸ stays in int64, and
    floor division on non-negative operands matches DuckDB's ``//`` —
    so ``silhouette_sql`` hash-matches bit-for-bit. One map-only pass
    against the broadcast centroids; no exchange at all.

    Returns (vec_id, cluster_id, sil_q)."""
    import ray

    if k < 2:
        # b = "nearest OTHER centroid" needs one to exist; the engine's
        # int64-max sentinel would silently overflow and the SQL oracle's
        # inner join would return zero rows — raise loudly instead (the
        # repo's no-silent-caps convention)
        raise ValueError(f"silhouette needs k >= 2 clusters (got k={k})")
    ds, cen = kmeans_fit(sf_dir, k=k, iters=iters)
    cen_ref = ray.put(cen)

    def score(b: pd.DataFrame, _c=cen_ref) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame(
                {c: pd.Series([], dtype="int64")
                 for c in ("vec_id", "cluster_id", "sil_q")}
            )
        c = ray.get(_c)
        q = _quantize(b["embedding"])
        c2 = np.einsum("kd,kd->k", c, c)
        q2 = np.einsum("nd,nd->n", q, q)
        d2 = q2[:, None] - 2 * (q @ c.T) + c2[None, :]  # exact int64
        own = np.argmin(d2, axis=1)  # ties → lowest c, same as _assign
        rows = np.arange(len(q))
        a = d2[rows, own].copy()
        d2[rows, own] = np.iinfo(np.int64).max
        bb = d2.min(axis=1)
        sil = (SIL_SCALE * (bb - a)) // np.maximum(bb, 1)
        return pd.DataFrame(
            {
                "vec_id": b["vec_id"].to_numpy().astype(np.int64),
                "cluster_id": own.astype(np.int64),
                "sil_q": sil.astype(np.int64),
            }
        )

    return ds.map_batches(score, batch_format="pandas")


def silhouette_sql(*, k: int = 8, iters: int = 4) -> str:
    """Unrolled-Lloyd oracle for :func:`silhouette_scores` — dist{N}.dd
    is already the FULL |q−c|² (q² included), so own/other distances
    fall straight out of the final assignment round."""
    n = iters + 1
    parts = _lloyd_ctes(k=k, iters=iters)
    parts.append(
        f""",
own AS (
  SELECT d.vec_id, a.c, d.dd AS da
  FROM dist{n} d JOIN asg{n} a ON a.vec_id = d.vec_id AND a.c = d.c
),
oth AS (
  SELECT d.vec_id, min(d.dd) AS db
  FROM dist{n} d JOIN asg{n} a ON a.vec_id = d.vec_id AND a.c <> d.c
  GROUP BY d.vec_id
)
SELECT o.vec_id, CAST(o.c AS BIGINT) AS cluster_id,
       CAST(({SIL_SCALE} * (t.db - o.da)) // greatest(t.db, 1) AS BIGINT) AS sil_q
FROM own o JOIN oth t USING (vec_id)
ORDER BY o.vec_id"""
    )
    return "".join(parts).strip()


def kmeans_fit_slices(sf_dir: str, *, k: int, iters: int, m: int):
    """The m per-subspace Lloyd fits of :func:`kmeans_fit(dims=...)`
    computed JOINTLY — one corpus pass per round instead of m (the PQ
    trainer made m·iters full scans; a full scan is the unit of cost).
    Each slice's rounds are the independent sliced Lloyd by construction
    (per-slice assign + per-slice sums share only the scan), so results
    are bit-identical to m separate ``kmeans_fit(dims=(j·dsub,(j+1)·
    dsub))`` calls — pytest-pinned — and the per-slice `_lloyd_ctes`
    oracles still replay them. Returns a list of m centroid matrices."""
    import ray

    ds = _read_parquet_clean(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding", "label"]
    )
    fp = _file_fingerprint(f"{sf_dir}/embeddings.parquet")
    keys = []
    dims_list = None  # resolved after we know d
    # serve everything from the per-slice cache when possible
    init = _bottom_k_vectors(ds, k)
    cen_full = np.floor(
        np.stack(init["embedding"].to_numpy()).astype(np.float64) * SCALE
    ).astype(np.int64)
    d = cen_full.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    dims_list = [(j * dsub, (j + 1) * dsub) for j in range(m)]
    keys = [(sf_dir, k, iters, dims, fp) for dims in dims_list]
    if all(key in _KMEANS_CACHE for key in keys):
        return [_KMEANS_CACHE[key].copy() for key in keys]

    cens = [cen_full[:, lo:hi].copy() for lo, hi in dims_list]
    sum_cols = [f"s{j}" for j in range(dsub)]

    from .folds import tree_fold_tables

    for _ in range(iters):
        cen_ref = ray.put(cens)

        def partials(b: pd.DataFrame, _c=cen_ref) -> pd.DataFrame:
            cols = ["slice", "cluster_id", "n", *sum_cols]
            if not len(b):
                return pd.DataFrame({c: pd.Series([], dtype="int64") for c in cols})
            cs = ray.get(_c)
            q = _quantize(b["embedding"])
            frames = []
            for j, (lo, hi) in enumerate(dims_list):
                qs = q[:, lo:hi]
                a = _assign(qs, cs[j])
                n = np.bincount(a, minlength=k).astype(np.int64)
                sums = np.zeros((k, dsub), dtype=np.int64)
                np.add.at(sums, a, qs)
                out = pd.DataFrame(sums, columns=sum_cols)
                out.insert(0, "n", n)
                out.insert(0, "cluster_id", np.arange(k, dtype=np.int64))
                out.insert(0, "slice", np.int64(j))
                frames.append(out[out["n"] > 0])
            return pd.concat(frames, ignore_index=True)

        def _combine(frames: list[pd.DataFrame]) -> pd.DataFrame:
            return (
                pd.concat(frames, ignore_index=True)
                .groupby(["slice", "cluster_id"], sort=False, as_index=False)
                .sum()
            )

        folded = tree_fold_tables(
            ds.map_batches(partials, batch_format="pandas"), _combine
        )
        if folded is None or not len(folded):
            break
        for j in range(m):
            part = folded[folded["slice"] == j]
            if not len(part):
                continue
            new = cens[j].copy()
            cids = part["cluster_id"].to_numpy().astype(np.int64)
            counts = part["n"].to_numpy().astype(np.int64)
            sums = part[sum_cols].to_numpy().astype(np.int64)
            new[cids] = sums // counts[:, None]
            cens[j] = new

    for key, cen in zip(keys, cens):
        _KMEANS_CACHE[key] = cen.copy()
    return [c.copy() for c in cens]


def semdedup(sf_dir: str, *, k: int = 8, iters: int = 4, tau_pct: int = 45):
    """SemDeDup (Abbas et al. 2023): semantic dedup WITHIN k-means
    clusters — the cluster assignment prunes the O(n²) pair space to
    O(Σ m_c²), then each cluster is judged independently.

    Plan: Lloyd fit (broadcast-iterate, see `kmeans_fit`) → final map
    pass assigns clusters → ONE cluster-key exchange → per-cluster
    vectorized pairwise judgment. k=8 here keeps the oracle tractable;
    the paper's regime is k≈10⁴–10⁵, where one cluster ↦ one partition
    is exactly the layout this exchange produces (hot clusters would be
    sub-partitioned by vec_id range with cross-chunk pair passes).

    Dup rule (deterministic, parallel-friendly, SQL-expressible): vector
    i is a duplicate iff some EARLIER vector j < i in the same cluster
    has cos(i,j) ≥ tau. The threshold test is EXACT integer algebra:
    cos ≥ tau  ⇔  dot > 0 ∧ 10⁴·dot² ≥ tau_pct²·|i|²·|j|², evaluated in
    arbitrary-precision Python ints for the float-boundary pairs (the
    float64 prefilter is ~10⁻¹⁵ accurate; only pairs within 10⁻⁹ of tau
    are re-judged) — so the flags are bit-stable and hash-match SQL."""
    import ray

    ds, cen = kmeans_fit(sf_dir, k=k, iters=iters)
    cen_ref = ray.put(cen)
    tau = tau_pct / 100.0

    def tag(b: pd.DataFrame, _c=cen_ref) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame(
                {
                    "vec_id": pd.Series([], dtype="int64"),
                    "cluster_id": pd.Series([], dtype="int64"),
                    "q": pd.Series([], dtype=object),
                }
            )
        q = _quantize(b["embedding"])
        a = _assign(q, ray.get(_c))
        return pd.DataFrame(
            {
                "vec_id": b["vec_id"].to_numpy().astype(np.int64),
                "cluster_id": a.astype(np.int64),
                "q": [r.tobytes() for r in q],
            }
        )

    def judge(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {c: pd.Series([], dtype="int64") for c in ("vec_id", "cluster_id", "is_dup")}
        )
        if not len(g) or "vec_id" not in g.columns:
            return empty
        g = g.sort_values("vec_id", ignore_index=True)
        q = np.frombuffer(b"".join(g["q"]), dtype=np.int64).reshape(len(g), -1)
        dots = q @ q.T  # exact int64 (≤ d·SCALE² ≈ 4·10¹²)
        n2 = np.einsum("id,id->i", q, q)
        nf = np.sqrt(n2.astype(np.float64))
        sim = dots / (nf[:, None] * nf[None, :])
        earlier = np.tril(np.ones(len(g), dtype=bool), k=-1)  # j < i
        hit = (sim >= tau) & (dots > 0) & earlier
        border = (np.abs(sim - tau) < 1e-9) & (dots > 0) & earlier
        # exact re-judgment of boundary pairs in Python big-ints
        for i, j in zip(*np.nonzero(border)):
            d2 = int(dots[i, j])
            hit[i, j] = d2 > 0 and 10_000 * d2 * d2 >= (
                tau_pct * tau_pct * int(n2[i]) * int(n2[j])
            )
        return pd.DataFrame(
            {
                "vec_id": g["vec_id"].astype("int64"),
                "cluster_id": g["cluster_id"].astype("int64"),
                "is_dup": hit.any(axis=1).astype("int64"),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pandas")
        .groupby("cluster_id")
        .map_groups(judge, batch_format="pandas")
    )


def _lloyd_ctes(*, k: int, iters: int, lo: int | None = None,
                hi: int | None = None, prefix: str = "") -> list[str]:
    """Shared WITH-chain: quantized corpus, seeded centroids, ``iters``
    unrolled Lloyd rounds, and the closing assignment ``asg{iters+1}``.

    ``lo``/``hi`` restrict to an embedding slice (dim index rebased to 0
    — the PQ per-subspace trainer's dual) and ``prefix`` namespaces every
    CTE so several chains coexist in one WITH; defaults render the
    original full-dim chain byte-identically."""
    x = prefix
    if lo is None:
        q_cte = f"""{x}q AS (
  SELECT vec_id, CAST(label AS BIGINT) AS label,
         unnest(range(len(embedding))) AS d,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {SCALE}) AS BIGINT) AS v
  FROM embeddings
)"""
    else:
        q_cte = f"""{x}q AS (
  SELECT vec_id, label, d - {lo} AS d, v FROM (
    SELECT vec_id, CAST(label AS BIGINT) AS label,
           unnest(range(len(embedding))) AS d,
           CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {SCALE}) AS BIGINT) AS v
    FROM embeddings
  ) WHERE d >= {lo} AND d < {hi}
)"""
    parts = [
        f"""
WITH {q_cte},
{x}seed AS (
  SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS c
  FROM embeddings ORDER BY vec_id LIMIT {k}
),
{x}cen0 AS (SELECT s.c, q.d, q.v FROM {x}seed s JOIN {x}q q ON q.vec_id = s.vec_id)"""
    ]
    # asg{t} assigns with cen{t-1}; cen{t} is the t-th update. The census
    # is the FINAL assignment under cen{iters}, i.e. asg{iters+1} — one
    # extra dist/asg pair past the last update (the Ray path's closing
    # census pass).
    for t in range(1, iters + 2):
        p = t - 1
        parts.append(
            f""",
{x}dist{t} AS (
  SELECT q.vec_id, c.c, sum((q.v - c.v) * (q.v - c.v)) AS dd
  FROM {x}q q JOIN {x}cen{p} c ON q.d = c.d GROUP BY 1, 2
),
{x}asg{t} AS (
  SELECT vec_id, c FROM (
    SELECT vec_id, c,
           row_number() OVER (PARTITION BY vec_id ORDER BY dd, c) AS rn
    FROM {x}dist{t}) WHERE rn = 1
)"""
        )
        if t <= iters:
            parts.append(
                f""",
{x}cen{t} AS (
  SELECT prev.c, prev.d, COALESCE(u.v, prev.v) AS v
  FROM {x}cen{p} prev LEFT JOIN (
    SELECT a.c, q.d,
           CAST(floor(CAST(sum(q.v) AS DOUBLE) / count(*)) AS BIGINT) AS v
    FROM {x}asg{t} a JOIN {x}q q ON q.vec_id = a.vec_id GROUP BY 1, 2
  ) u ON u.c = prev.c AND u.d = prev.d
)"""
            )
    return parts


def kmeans_census_sql(*, k: int = 8, iters: int = 4) -> str:
    """The same ``iters`` Lloyd rounds, unrolled into chained CTEs —
    DuckDB replays the exact integer algebra, so the census hash-matches
    bit-for-bit."""
    parts = _lloyd_ctes(k=k, iters=iters)
    parts.append(
        f"""
SELECT a.c AS cluster_id, CAST(e.label AS BIGINT) AS label,
       CAST(count(*) AS BIGINT) AS n
FROM asg{iters + 1} a JOIN embeddings e USING (vec_id)
GROUP BY 1, 2 ORDER BY 1, 2"""
    )
    return "".join(parts).strip()


def semdedup_sql(*, k: int = 8, iters: int = 4, tau_pct: int = 45) -> str:
    """SemDeDup oracle: the Lloyd chain plus an in-cluster pairwise
    judgment in HUGEINT (10⁴·dot² vs tau²·|i|²·|j|² — the same exact
    integers the Ray path evaluates)."""
    parts = _lloyd_ctes(k=k, iters=iters)
    a = f"asg{iters + 1}"
    parts.append(
        f""",
nrm AS (SELECT vec_id, sum(v * v) AS n2 FROM q GROUP BY 1),
pair AS (
  SELECT ma.vec_id AS i, mb.vec_id AS j, sum(qa.v * qb.v) AS dot
  FROM {a} ma JOIN {a} mb ON ma.c = mb.c AND mb.vec_id < ma.vec_id
  JOIN q qa ON qa.vec_id = ma.vec_id
  JOIN q qb ON qb.vec_id = mb.vec_id AND qb.d = qa.d
  GROUP BY 1, 2
),
dup AS (
  SELECT DISTINCT p.i AS vec_id
  FROM pair p JOIN nrm na ON na.vec_id = p.i JOIN nrm nb ON nb.vec_id = p.j
  WHERE p.dot > 0
    AND 10000 * p.dot * p.dot >= {tau_pct * tau_pct} * na.n2 * nb.n2
)
SELECT m.vec_id, m.c AS cluster_id,
       CAST(m.vec_id IN (SELECT vec_id FROM dup) AS BIGINT) AS is_dup
FROM {a} m ORDER BY 1"""
    )
    return "".join(parts).strip()


def dbscan(sf_dir: str, *, tau_q: int = 450_000, min_pts: int = 4):
    """Density-based clustering (DBSCAN) over the embedding corpus with a
    COSINE eps-neighborhood: neighbors are pairs with quantized cosine
    ≥ ``tau_q`` (the ``sim_threshold_join`` relation — its exact
    probe-chunk plan is the pair generator and the shared oracle
    convention); a point is CORE iff it has ≥ ``min_pts − 1`` neighbors
    (minPts counts the point itself, per the paper); clusters are the
    connected components of the core-core subgraph (distributed min-label
    propagation); non-core points adjacent to ≥1 core join the MIN
    cluster among their core neighbors (BORDER — standard DBSCAN leaves
    this arbitrary, fixing min makes the result deterministic and
    SQL-expressible); everything else is NOISE.

    Output: (vec_id, role ∈ {0 noise, 1 border, 2 core}, cluster;
    −1 for noise). Exact — recursive-closure + degree-census oracle."""
    import ray

    from ..stages.folds import tree_fold_tables
    from ..stages.graph import connected_components_str
    from ..stages.similarity import sim_threshold_join

    pairs = sim_threshold_join(sf_dir, tau_q=tau_q).materialize()

    def deg_partial(b: pd.DataFrame) -> pd.DataFrame:
        both = np.concatenate([b["a"].to_numpy(), b["b"].to_numpy()])
        k, n = np.unique(both, return_counts=True)
        return pd.DataFrame({"k": k.astype("int64"), "n": n.astype("int64")})

    def deg_combine(frames):
        df = pd.concat(frames, ignore_index=True)
        return df.groupby("k", sort=False, as_index=False)["n"].sum()

    folded = tree_fold_tables(
        pairs.map_batches(deg_partial, batch_format="pandas"), deg_combine
    )
    deg = (
        {int(k): int(n) for k, n in zip(folded["k"], folded["n"])}
        if folded is not None
        else {}
    )
    core = frozenset(k for k, n in deg.items() if n >= min_pts - 1)
    core_ref = ray.put(core)

    W = 12  # zero-pad width: lexicographic label order == numeric order

    def core_edges(b: pd.DataFrame, _c=core_ref) -> pd.DataFrame:
        cs = np.fromiter(ray.get(_c), dtype=np.int64)
        a = b["a"].to_numpy()
        bb = b["b"].to_numpy()
        m = np.isin(a, cs) & np.isin(bb, cs)
        return pd.DataFrame(
            {
                "a": pd.Series([f"{x:0{W}d}" for x in a[m]], dtype=object),
                "b": pd.Series([f"{x:0{W}d}" for x in bb[m]], dtype=object),
            }
        )

    labels = connected_components_str(pairs.map_batches(core_edges, batch_format="pandas"))
    cluster_of = {int(k): int(v) for k, v in labels.items()}
    for c in core:  # isolated cores: singleton clusters labeled by own id
        cluster_of.setdefault(c, c)
    cl_ref = ray.put((core, cluster_of))

    def border_partial(b: pd.DataFrame, _s=cl_ref) -> pd.DataFrame:
        cs, cl = ray.get(_s)
        ca = np.fromiter(cs, dtype=np.int64)
        a = b["a"].to_numpy()
        bb = b["b"].to_numpy()
        rows = {"vec": [], "cluster": []}
        for x, y in ((a, bb), (bb, a)):
            m = ~np.isin(x, ca) & np.isin(y, ca)
            rows["vec"].extend(x[m])
            rows["cluster"].extend(pd.Series(y[m]).map(cl))
        return pd.DataFrame(rows).astype("int64")

    def border_combine(frames):
        df = pd.concat(frames, ignore_index=True)
        return df.groupby("vec", sort=False, as_index=False)["cluster"].min()

    bf = tree_fold_tables(
        pairs.map_batches(border_partial, batch_format="pandas"), border_combine
    )
    border = (
        {int(v): int(c) for v, c in zip(bf["vec"], bf["cluster"])}
        if bf is not None
        else {}
    )

    ids = (
        _read_parquet_clean(f"{sf_dir}/embeddings.parquet", columns=["vec_id"])
        .to_pandas()["vec_id"]
        .astype("int64")
        .sort_values(ignore_index=True)
    )
    role = np.zeros(len(ids), dtype=np.int64)
    cluster = np.full(len(ids), -1, dtype=np.int64)
    for i, v in enumerate(ids):
        v = int(v)
        if v in core:
            role[i] = 2
            cluster[i] = cluster_of[v]
        elif v in border:
            role[i] = 1
            cluster[i] = border[v]
    return pd.DataFrame({"vec_id": ids, "role": role, "cluster": cluster})


def dbscan_sql(*, tau_q: int = 450_000, min_pts: int = 4) -> str:
    return f"""
WITH RECURSIVE v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
),
pairs AS (
  SELECT a.vec_id AS a, b.vec_id AS b
  FROM v a JOIN v b ON a.vec_id < b.vec_id
  WHERE floor(list_cosine_similarity(a.e, b.e) * 1000000) >= {tau_q}
),
sym AS (SELECT a, b FROM pairs UNION SELECT b AS a, a AS b FROM pairs),
deg AS (SELECT a, count(*) AS n FROM sym GROUP BY a),
core AS (SELECT a FROM deg WHERE n >= {min_pts} - 1),
ce AS (
  SELECT s.a, s.b FROM sym s
  WHERE s.a IN (SELECT a FROM core) AND s.b IN (SELECT a FROM core)
),
reach AS (
  SELECT a AS n, b AS m FROM ce
  UNION
  SELECT r.n, s.b AS m FROM reach r JOIN ce s ON r.m = s.a
),
corecl AS (
  SELECT c.a AS node, coalesce(least(c.a, min(r.m)), c.a) AS cluster
  FROM core c LEFT JOIN reach r ON r.n = c.a GROUP BY c.a
),
border AS (
  SELECT s.a AS vec, min(cc.cluster) AS cluster
  FROM sym s JOIN corecl cc ON cc.node = s.b
  WHERE s.a NOT IN (SELECT a FROM core)
  GROUP BY s.a
)
SELECT e.vec_id,
       CAST(CASE WHEN cc.node IS NOT NULL THEN 2
                 WHEN b.vec IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS role,
       CAST(coalesce(cc.cluster, b.cluster, -1) AS BIGINT) AS cluster
FROM embeddings e
LEFT JOIN corecl cc ON cc.node = e.vec_id
LEFT JOIN border b ON b.vec = e.vec_id
ORDER BY e.vec_id
""".strip()


def label_centroids(sf_dir: str):
    """Per-label mean-pooled embedding (the class-prototype / GNN-readout
    pooling op): dim-wise ``floor(10⁶·x)`` quantization FIRST, then exact
    int64 partial sums per (label) per batch (shuffle ≤ labels × batches
    rows, each carrying a d-vector) → tree-fold → floor-division means.
    Quantize-before-sum keeps the reduction associative (float sums drift
    per schedule), so the unnest-and-aggregate DuckDB oracle hash-matches.
    Output long-form (label, dim, mean_q, n) — 8 labels × 64 dims rows."""
    from ..stages.folds import tree_fold_tables

    ds = _read_parquet_clean(
        f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"]
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        q = _quantize(b["embedding"])
        lab = b["label"].to_numpy().astype(np.int64)
        rows = []
        for l in np.unique(lab):
            m = lab == l
            rows.append((int(l), int(m.sum()), q[m].sum(axis=0).tobytes()))
        return pd.DataFrame(rows, columns=["label", "n", "s"])

    def combine(frames):
        df = pd.concat(frames, ignore_index=True)
        out = []
        for l, g in df.groupby("label", sort=False):
            sums = np.sum(
                [np.frombuffer(x, dtype=np.int64) for x in g["s"]], axis=0
            )
            out.append((int(l), int(g["n"].sum()), sums.tobytes()))
        return pd.DataFrame(out, columns=["label", "n", "s"])

    folded = tree_fold_tables(ds.map_batches(partial, batch_format="pandas"), combine)
    rows = {"label": [], "dim": [], "mean_q": [], "n": []}
    if folded is not None:
        for l, n, s in folded.sort_values("label").itertuples(index=False):
            sums = np.frombuffer(s, dtype=np.int64)
            means = sums // n  # floor division — matches SQL `//`
            rows["label"].extend([int(l)] * len(sums))
            rows["dim"].extend(range(len(sums)))
            rows["mean_q"].extend(int(x) for x in means)
            rows["n"].extend([int(n)] * len(sums))
    return pd.DataFrame(rows).astype("int64")


def label_centroids_sql() -> str:
    return f"""
WITH ex AS (
  SELECT label, t.dim - 1 AS dim,
         CAST(floor(CAST(embedding[t.dim] AS DOUBLE) * {SCALE}) AS BIGINT) AS q
  FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(dim)
)
SELECT CAST(label AS BIGINT) AS label, CAST(dim AS BIGINT) AS dim,
       -- FLOOR division (numpy //); DuckDB's integer // truncates toward
       -- zero on negatives. |sum| ≤ n·10⁶ ≪ 2^53 so the double is exact.
       CAST(floor(CAST(sum(q) AS DOUBLE) / count(*)) AS BIGINT) AS mean_q,
       CAST(count(*) AS BIGINT) AS n
FROM ex GROUP BY label, dim ORDER BY label, dim
""".strip()


def knn_classify(sf_dir: str, *, k: int = 15, num_queries: int = 20):
    """k-NN majority-vote classification: the first ``num_queries`` vec_ids
    are held-out queries, classified against the labeled remainder of the
    corpus by exact cosine top-k (the auto-labeling / weak-supervision op
    of a curation pipeline).

    Same physical plan as ``similarity.ann_topk`` — the query matrix is a
    pruned filter-pushdown read broadcast once via ``ray.put``; each
    streamed batch emits its LOCAL top-k (with labels) per query; the
    global reduce sees only k × queries × batches rows. The vote is
    driver-side over k × queries rows. Ranking key (simq DESC, vec_id ASC)
    and vote key (votes DESC, label ASC) are total orders shared with the
    DuckDB oracle, so the prediction is deterministic and hash-checked.

    Beyond-reference scope (north-star training-data op); quantized-sim
    discipline per ``stages/similarity.py``.
    """
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    path = f"{sf_dir}/embeddings.parquet"
    qdf = (
        _read_parquet_clean(
            path,
            columns=["vec_id", "label", "embedding"],
            filter=pc.field("vec_id") < num_queries,
        )
        .to_pandas()
        .sort_values("vec_id", ignore_index=True)
    )
    Q = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    Q = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
    q_ref = ray.put((qdf["vec_id"].to_numpy(np.int64), Q))

    corpus = _read_parquet_clean(
        path,
        columns=["vec_id", "label", "embedding"],
        filter=pc.field("vec_id") >= num_queries,
    )

    def local_topk(b: pd.DataFrame) -> pd.DataFrame:
        out = {"query_id": [], "vec_id": [], "label": [], "simq": []}
        if len(b):
            q_ids, Qm = ray.get(q_ref)
            vm = np.stack(b["embedding"].to_numpy()).astype(np.float64)
            vm = vm / np.maximum(np.linalg.norm(vm, axis=1, keepdims=True), 1e-12)
            sims = Qm @ vm.T
            vids = b["vec_id"].to_numpy(np.int64)
            labs = b["label"].to_numpy(np.int64)
            for qi, qid in enumerate(q_ids):
                simq = np.floor(sims[qi] * SCALE).astype(np.int64)
                order = np.lexsort((vids, -simq))[:k]
                out["query_id"].extend([qid] * len(order))
                out["vec_id"].extend(vids[order])
                out["label"].extend(labs[order])
                out["simq"].extend(simq[order])
        return pd.DataFrame(out).astype("int64")

    partials = corpus.map_batches(local_topk, batch_format="pandas").to_pandas()
    topk = (
        partials.sort_values(
            ["query_id", "simq", "vec_id"], ascending=[True, False, True]
        )
        .groupby("query_id", sort=True)
        .head(k)
    )
    votes = (
        topk.groupby(["query_id", "label"], sort=False)
        .size()
        .reset_index(name="votes")
        .sort_values(["query_id", "votes", "label"], ascending=[True, False, True])
        .groupby("query_id", sort=True)
        .head(1)
        .rename(columns={"label": "pred_label"})
    )
    out = votes.merge(
        qdf[["vec_id", "label"]].rename(
            columns={"vec_id": "query_id", "label": "true_label"}
        ),
        on="query_id",
    )[["query_id", "true_label", "pred_label", "votes"]]
    return rd.from_pandas(out.astype("int64").reset_index(drop=True))


def knn_classify_sql(k: int = 15, num_queries: int = 20) -> str:
    return f"""
WITH v AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
), q AS (
  SELECT vec_id AS query_id, label AS true_label, e AS qe
  FROM v WHERE vec_id < {num_queries}
), scored AS (
  SELECT q.query_id, q.true_label, c.vec_id, c.label,
         CAST(floor(list_cosine_similarity(q.qe, c.e) * {SCALE}) AS BIGINT) AS simq
  FROM q JOIN v c ON c.vec_id >= {num_queries}
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY simq DESC, vec_id) AS rnk
  FROM scored
), votes AS (
  SELECT query_id, true_label, label, count(*) AS votes
  FROM ranked WHERE rnk <= {k} GROUP BY 1, 2, 3
), best AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY votes DESC, label) AS r
  FROM votes
)
SELECT CAST(query_id AS BIGINT) AS query_id,
       CAST(true_label AS BIGINT) AS true_label,
       CAST(label AS BIGINT) AS pred_label,
       CAST(votes AS BIGINT) AS votes
FROM best WHERE r = 1 ORDER BY query_id
""".strip()


# --- dominant principal direction (quantized power iteration) ---------------

# the synthetic corpus has a near-degenerate spectrum (λ1/λ2 ≈ 1.07), so
# the iteration needs ~O(1/ln(λ1/λ2)) rounds: 96 reaches cosine ≥ 0.995
# vs the true eigenvector at both test sfs (measured); each round is one
# d×d integer mat-vec on the driver and one 64-row join CTE in the oracle
TOP_COMPONENT_ITERS = 96


# the moment fold + 96-round iteration is the family's priciest stage and
# BOTH ml_top_component and ml_pca_scores need it in one gate run — memoize
# per (sf_dir, n_iter, file fingerprint), the _entity_edges/_extracted
# rationale; the (mtime_ns, size) fingerprint invalidates the entry if the
# parquet under sf_dir is rewritten within one process (reused tmp dirs)
_TOP_COMPONENT_CACHE: dict = {}


def _file_fingerprint(path: str) -> tuple:
    import os

    try:
        st = os.stat(path)
        return (st.st_mtime_ns, st.st_size)
    except OSError:
        return (0, 0)


def top_component(sf_dir: str, *, n_iter: int = TOP_COMPONENT_ITERS,
                  chunk: int = 512):
    """Dominant principal direction of the embedding corpus (uncentered —
    the top eigenvector of the second-moment matrix Σ xxᵀ), the PCA-prep
    primitive, computed with the repo's quantized-fold discipline so the
    SQL oracle hash-matches exactly:

    1. ONE map pass folds the d×d moment matrix in EXACT int64 — every
       per-row product quantizes to ``floor(10⁶·x_i·x_j)`` BEFORE the
       sum (association-free); a d²-entry partial leaves each batch, the
       corpus never does. Rows are processed in ``chunk``-sized slices so
       the (chunk, d, d) float intermediate stays small at any batch size.
    2. The d×d integer matrix power-iterates ON THE DRIVER in
       arbitrary-precision Python ints (d² is config-sized — the same
       budget class as a rules table): w = A·v, then the L∞-normalized
       ``v'_i = sign(w_i)·(|w_i|·10⁶ // max|w|)``. The |·| routing is
       deliberate: DuckDB ``//`` truncates toward zero while Python
       floors, so negative numerators would diverge — on nonnegative
       operands the two agree (``cluster.top_component_sql`` mirrors the
       CASE/abs form verbatim).

    Returns (dim, v_q) with v_q ∈ [−10⁶, 10⁶], sorted by dim. Sign is the
    iteration's own (deterministic; parity is what the oracle checks).
    """
    from .folds import tree_fold_tables

    cache_key = (
        sf_dir, n_iter, _file_fingerprint(f"{sf_dir}/embeddings.parquet")
    )
    cached = _TOP_COMPONENT_CACHE.get(cache_key)
    if cached is not None:
        return cached.copy()

    ds = _read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                             columns=["embedding"])

    def moment_partial(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame({"i": pd.Series([], dtype="int64"),
                                 "j": pd.Series([], dtype="int64"),
                                 "a": pd.Series([], dtype="int64")})
        x = np.stack(b["embedding"].to_numpy()).astype(np.float64)
        d = x.shape[1]
        acc = np.zeros((d, d), dtype=np.int64)
        for s in range(0, len(x), chunk):
            c = x[s : s + chunk]
            acc += np.floor(
                SCALE * (c[:, :, None] * c[:, None, :])
            ).astype(np.int64).sum(axis=0)
        ii, jj = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")
        return pd.DataFrame({"i": ii.reshape(-1), "j": jj.reshape(-1),
                             "a": acc.reshape(-1)})

    def combine(frames):
        df = pd.concat(frames, ignore_index=True)
        return df.groupby(["i", "j"], sort=False, as_index=False)["a"].sum()

    folded = tree_fold_tables(
        ds.map_batches(moment_partial, batch_format="pandas"), combine
    )
    if folded is None or not len(folded):
        return pd.DataFrame({"dim": pd.Series([], dtype="int64"),
                             "v_q": pd.Series([], dtype="int64")})
    d = int(folded["i"].max()) + 1
    a = [[0] * d for _ in range(d)]
    for i, j, v in zip(folded["i"], folded["j"], folded["a"]):
        a[int(i)][int(j)] = int(v)

    v = [SCALE] * d
    for _ in range(n_iter):
        w = [sum(a[i][j] * v[j] for j in range(d)) for i in range(d)]
        m = max(max(abs(x) for x in w), 1)
        v = [
            -((-x) * SCALE // m) if x < 0 else (x * SCALE // m)
            for x in w
        ]
    out = pd.DataFrame({"dim": np.arange(d, dtype=np.int64),
                        "v_q": np.array(v, dtype=np.int64)})
    _TOP_COMPONENT_CACHE[cache_key] = out
    return out.copy()


def top_component_sql(*, n_iter: int = TOP_COMPONENT_ITERS, dim: int = 64) -> str:
    """Unrolled-CTE oracle for :func:`top_component` — identical integer
    update rule (see its docstring for the abs-routed division)."""
    rounds = []
    prev = "v0"
    for k in range(1, n_iter + 1):
        rounds.append(f""",
w{k} AS MATERIALIZED (
  SELECT m.i, sum(CAST(m.a AS HUGEINT) * v.q) AS w
  FROM mom m JOIN {prev} v ON v.i = m.j GROUP BY m.i
),
v{k} AS MATERIALIZED (
  SELECT i, CASE WHEN w < 0 THEN -((-w) * {SCALE} // mx.m)
                 ELSE (w * {SCALE} // mx.m) END AS q
  FROM w{k}, (SELECT greatest(max(abs(w)), 1) AS m FROM w{k}) mx
)""")
        prev = f"v{k}"
    return f"""
WITH dims AS (SELECT unnest(generate_series(0, {dim - 1})) AS i),
emb AS (
  SELECT vec_id, d.i, embedding[d.i + 1]::DOUBLE AS x
  FROM embeddings, dims d
),
mom AS MATERIALIZED (
  -- parentheses are load-bearing: the engine computes SCALE * (x_i * x_j)
  -- and left-assoc (SCALE * x_i) * x_j can floor to a DIFFERENT integer
  -- (~1e-10 of products) — invisible at gate scale, divergent at corpus scale
  SELECT xi.i AS i, xj.i AS j,
         sum(CAST(floor({SCALE} * (xi.x * xj.x)) AS BIGINT)) AS a
  FROM emb xi JOIN emb xj USING (vec_id) GROUP BY xi.i, xj.i
),
v0 AS (SELECT i, CAST({SCALE} AS HUGEINT) AS q FROM dims){"".join(rounds)}
SELECT CAST(i AS BIGINT) AS dim, CAST(q AS BIGINT) AS v_q
FROM {prev} ORDER BY dim
""".strip()


def pca_scores(sf_dir: str, *, n_iter: int = TOP_COMPONENT_ITERS):
    """Per-vector projection onto the corpus's dominant principal
    direction — the apply step of :func:`top_component` (learn once on
    the driver, broadcast the d-vector, ONE stateless map pass):
    ``proj_q = Σ_i floor(10⁶·x_i) · v_i`` in exact int64 (|x_q| ≤ ~10⁶,
    |v| ≤ 10⁶, d = 64 ⇒ far inside int64), the 1-D embedding a curation
    pipeline sorts/buckets on. Oracle: the top_component CTE chain plus
    one projection join (``cluster.pca_scores_sql``)."""
    import ray

    comp = top_component(sf_dir, n_iter=n_iter)
    v = comp["v_q"].to_numpy(dtype=np.int64)
    v_ref = ray.put(v)

    ds = _read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                             columns=["vec_id", "embedding"])

    def project(b: pd.DataFrame, _v=v_ref) -> pd.DataFrame:
        vq = ray.get(_v)
        if not len(b):
            return pd.DataFrame({"vec_id": pd.Series([], dtype="int64"),
                                 "proj_q": pd.Series([], dtype="int64")})
        xq = _quantize(b["embedding"])
        return pd.DataFrame(
            {"vec_id": b["vec_id"].astype("int64"),
             "proj_q": (xq @ vq).astype("int64")}
        )

    return ds.map_batches(project, batch_format="pandas")


def pca_scores_sql(*, n_iter: int = TOP_COMPONENT_ITERS, dim: int = 64) -> str:
    base = top_component_sql(n_iter=n_iter, dim=dim)
    # swap the final projection of the component chain for the score join
    head, _, _tail = base.rpartition("SELECT CAST(i AS BIGINT) AS dim")
    return head + f"""SELECT e.vec_id,
       CAST(sum(CAST(floor({SCALE} * e.x) AS BIGINT) * v.q) AS BIGINT) AS proj_q
FROM emb e JOIN v{n_iter} v ON v.i = e.i
GROUP BY e.vec_id ORDER BY e.vec_id
""".strip()
