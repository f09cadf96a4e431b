"""Similarity search over the ``embeddings`` table (list<float> column).

- brute-force cosine top-k: the exact baseline. Query matrix is broadcast
  once (``ray.put``); each batch computes a float64 matmul against it and
  emits its LOCAL top-k per query; the global top-k reduces over the tiny
  per-batch partials (k × queries × batches rows — never the full score
  matrix).
- threshold self-join: all pairs with cosine ≥ τ. Brute per-batch × the
  broadcast normalized matrix here (fine to ~10^5 vectors); the scale path
  is the hyperplane-LSH bucketing used by ``ann_lsh`` / dedup_embedding
  (bucket groupby, exact rerank inside buckets).
- ann_lsh: approximate top-k restricted to hyperplane-bucket candidates
  (multi-probe: exact Hamming-adjacent buckets), exact rerank.

Similarities are emitted quantized (``simq = floor(cos · 10^6)`` as int64)
so results are portable across float implementations (numpy vs DuckDB) and
value-hash comparable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

QUANT = 1_000_000


def _normalized_matrix(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """Driver-side load of the (small) embedding matrix, float64-normalized.

    At 10^9+ vectors the matrix no longer fits: the query side stays
    broadcast and the corpus side streams (exactly what ann_topk's
    per-batch plan below does — this helper only feeds query vectors and
    the threshold join's broadcast side).
    """
    import ray.data

    df = (
        ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
        .to_pandas()
        .sort_values("vec_id", ignore_index=True)
    )
    m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    return df["vec_id"].to_numpy(), m


def ann_topk(sf_dir: str, *, k: int = 10, num_queries: int = 5):
    """Exact cosine top-k for the first ``num_queries`` vec_ids.

    Returns (query_id, vec_id, simq, rank); self-matches excluded; ties
    broken by vec_id ascending — fully deterministic.
    """
    import ray
    import ray.data

    ids, m = _normalized_matrix(sf_dir)
    q_sel = ids < num_queries
    q_ids, Q = ids[q_sel], m[q_sel]
    q_ref = ray.put((q_ids, Q))

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def local_topk(batch: pd.DataFrame) -> pd.DataFrame:
        q_ids_, Q_ = ray.get(q_ref)
        vm = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        vm /= np.maximum(np.linalg.norm(vm, axis=1, keepdims=True), 1e-12)
        sims = Q_ @ vm.T  # queries × batch
        vids = batch["vec_id"].to_numpy()
        rows = {"query_id": [], "vec_id": [], "simq": []}
        for qi, qid in enumerate(q_ids_):
            s = sims[qi]
            mask = vids != qid
            cand_ids, cand_s = vids[mask], s[mask]
            # local top-k on quantized sim, tie-break vec_id asc
            simq = np.floor(cand_s * QUANT).astype(np.int64)
            order = np.lexsort((cand_ids, -simq))[:k]
            rows["query_id"].extend([qid] * len(order))
            rows["vec_id"].extend(cand_ids[order])
            rows["simq"].extend(simq[order])
        return pd.DataFrame(rows).astype("int64")

    partials = ds.map_batches(local_topk, batch_format="pandas").to_pandas()
    out = (
        partials.sort_values(["query_id", "simq", "vec_id"], ascending=[True, False, True])
        .groupby("query_id", sort=True)
        .head(k)
        .reset_index(drop=True)
    )
    out["rank"] = out.groupby("query_id").cumcount() + 1
    import ray.data as rd

    return rd.from_pandas(out.astype("int64"))


def sim_threshold_join(sf_dir: str, *, tau_q: int = 400_000):
    """All vector pairs (a < b) with quantized cosine ≥ tau_q."""
    import ray
    import ray.data

    ids, m = _normalized_matrix(sf_dir)
    ref = ray.put((ids, m))

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def pairs(batch: pd.DataFrame) -> pd.DataFrame:
        all_ids, M = ray.get(ref)
        vm = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        vm /= np.maximum(np.linalg.norm(vm, axis=1, keepdims=True), 1e-12)
        bids = batch["vec_id"].to_numpy()
        sims = vm @ M.T
        simq = np.floor(sims * QUANT).astype(np.int64)
        ai, bi = np.where(simq >= tau_q)
        a, b = bids[ai], all_ids[bi]
        keep = a < b  # each unordered pair exactly once
        return pd.DataFrame({"a": a[keep], "b": b[keep], "simq": simq[ai[keep], bi[keep]]}).astype(
            "int64"
        )

    return ds.map_batches(pairs, batch_format="pandas")


def ann_lsh(sf_dir: str, *, k: int = 10, num_queries: int = 5, num_planes: int = 4, seed: int = 11):
    """Approximate top-k: hyperplane-bucketed candidates, exact rerank.

    Scale path of ann_topk: candidates are restricted to vectors whose
    LSH bucket is within Hamming distance 1 of the query's bucket
    (multi-probe), so per-query work is a small fraction of the corpus.
    Approximate by construction → rows-only correctness check; recall vs
    the exact baseline is asserted in tests.
    """
    import ray
    import ray.data

    ids, m = _normalized_matrix(sf_dir)
    rng = np.random.RandomState(seed)
    planes = rng.randn(m.shape[1], num_planes)
    buckets = ((m @ planes > 0) @ (1 << np.arange(num_planes))).astype(np.int64)
    q_sel = ids < num_queries
    q_ids, Q, q_buckets = ids[q_sel], m[q_sel], buckets[q_sel]
    probe = {
        int(qb) ^ (1 << p) for qb in q_buckets for p in range(num_planes)
    } | {int(qb) for qb in q_buckets}
    ref = ray.put((q_ids, Q, q_buckets, planes))

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def local(batch: pd.DataFrame) -> pd.DataFrame:
        q_ids_, Q_, qb_, planes_ = ray.get(ref)
        vm = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        vm /= np.maximum(np.linalg.norm(vm, axis=1, keepdims=True), 1e-12)
        vb = ((vm @ planes_ > 0) @ (1 << np.arange(planes_.shape[1]))).astype(np.int64)
        vids = batch["vec_id"].to_numpy()
        rows = {"query_id": [], "vec_id": [], "simq": []}
        for qi, qid in enumerate(q_ids_):
            cand = (vb == qb_[qi])
            for p in range(planes_.shape[1]):
                cand |= vb == (int(qb_[qi]) ^ (1 << p))
            cand &= vids != qid
            if not cand.any():
                continue
            s = Q_[qi] @ vm[cand].T
            simq = np.floor(s * QUANT).astype(np.int64)
            cids = vids[cand]
            order = np.lexsort((cids, -simq))[:k]
            rows["query_id"].extend([qid] * len(order))
            rows["vec_id"].extend(cids[order])
            rows["simq"].extend(simq[order])
        return pd.DataFrame(rows).astype("int64")

    partials = ds.map_batches(local, batch_format="pandas").to_pandas()
    out = (
        partials.sort_values(["query_id", "simq", "vec_id"], ascending=[True, False, True])
        .groupby("query_id", sort=True)
        .head(k)
        .reset_index(drop=True)
    )
    out["rank"] = out.groupby("query_id").cumcount() + 1
    import ray.data as rd

    return rd.from_pandas(out.astype("int64"))
