"""Deduplication stages over the ``documents`` table.

Five strategies, each expressed Ray-Data-first:

- exact: fingerprint (sha256 of normalized text) → keep min(doc_id) per
  group. Hash-partitioned groupby; SQL-oracle-checkable.
- MinHash + LSH: per-doc signatures vectorized in one map pass, band →
  bucket groupby, candidate pairs verified with exact Jaccard, clusters =
  connected components (union-find over the verified pair set, which is
  ≪ corpus; at 10^12 scale the component step becomes iterated min-label
  propagation — a few groupby rounds — documented below).
- SimHash: 64-bit signatures; Hamming-≤k candidates via 4-block banding
  (pigeonhole: any pair within distance 3 shares an exact 16-bit block).
- n-gram Jaccard: exact verify kernel used by both MinHash and SimHash
  candidate sets (word n-gram sets).
- embedding cosine: random-hyperplane LSH buckets → exact cosine within
  bucket → threshold pairs → components.

All randomness is seeded/deterministic (fixed hash seeds, fixed hyperplane
RNG) so every run — and every retry of a failed task — produces identical
output.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from .text import TOKEN_RE, _token_pat, fingerprint_batch

MERSENNE = (1 << 61) - 1


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------


def dedup_exact_docs(sf_dir: str):
    """documents → (fingerprint, doc_id=min per group): the kept set."""
    import ray.data
    from ray.data.aggregate import Min

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    fps = docs.map_batches(fingerprint_batch, batch_format="pandas")
    return fps.groupby("fingerprint").aggregate(Min("doc_id", alias_name="doc_id"))


# --------------------------------------------------------------------------
# token hashing (shared by minhash / simhash / jaccard)
# --------------------------------------------------------------------------


def _token_hashes(texts: pd.Series) -> list[np.ndarray]:
    """Per doc: sorted unique 64-bit token hashes (sha256-based, stable)."""
    out = []
    cache: dict[str, int] = {}
    for t in texts:
        toks = set(_token_pat.findall(t.lower()))
        hs = np.empty(len(toks), dtype=np.uint64)
        for i, tok in enumerate(toks):
            h = cache.get(tok)
            if h is None:
                h = int.from_bytes(hashlib.sha256(tok.encode()).digest()[:8], "big")
                cache[tok] = h
            hs[i] = h
        out.append(np.sort(hs))
    return out


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard of two sorted unique hash arrays."""
    if len(a) == 0 and len(b) == 0:
        return 1.0
    inter = len(np.intersect1d(a, b, assume_unique=True))
    return inter / (len(a) + len(b) - inter)


# --------------------------------------------------------------------------
# MinHash + LSH
# --------------------------------------------------------------------------


def _perm_params(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signatures_batch(
    batch: pd.DataFrame, num_perm: int = 64
) -> pd.DataFrame:
    """One map pass: doc → num_perm minhash values (vectorized outer product)."""
    a, b = _perm_params(num_perm)
    sigs = np.empty((len(batch), num_perm), dtype=np.uint64)
    for i, hs in enumerate(_token_hashes(batch["text"])):
        if len(hs) == 0:
            sigs[i] = np.uint64(MERSENNE)
            continue
        # (a * h + b) mod p for all perms × tokens, then min over tokens
        m = (hs[None, :] * a[:, None] + b[:, None]) % np.uint64(MERSENNE)
        sigs[i] = m.min(axis=1)
    return pd.DataFrame(
        {"doc_id": batch["doc_id"], "sig": [s.tobytes() for s in sigs]}
    )


def _band_rows(sig_df: pd.DataFrame, num_perm: int, bands: int) -> pd.DataFrame:
    r = num_perm // bands
    rows = {"band": [], "bucket": [], "doc_id": []}
    for _, row in sig_df.iterrows():
        sig = np.frombuffer(row["sig"], dtype=np.uint64)
        for bi in range(bands):
            chunk = sig[bi * r : (bi + 1) * r].tobytes()
            rows["band"].append(bi)
            rows["bucket"].append(hashlib.sha256(chunk).hexdigest()[:16])
            rows["doc_id"].append(row["doc_id"])
    return pd.DataFrame(rows)


def _bucket_candidates(df: pd.DataFrame, keys: list[str], id_col: str = "doc_id") -> pd.DataFrame:
    """(bucket-row table) → distinct candidate pairs (a < b), vectorized.

    A ``map_groups`` over thousands of mostly-singleton buckets pays Python
    per group; a duplicated-filter + self-merge is one vectorized pass. The
    bucket table is #rows × #bands ≪ corpus, so folding it is bounded; at
    10^12 scale the duplicated-filter becomes a groupby count>1 + semi-join
    (same semantics) before the fold.
    """
    dup = df[df.duplicated(keys, keep=False)]
    if dup.empty:
        return pd.DataFrame({"a": pd.Series([], dtype="int64"), "b": pd.Series([], dtype="int64")})
    m = dup.merge(dup, on=keys, suffixes=("_a", "_b"))
    m = m[m[f"{id_col}_a"] < m[f"{id_col}_b"]]
    out = m.rename(columns={f"{id_col}_a": "a", f"{id_col}_b": "b"})[["a", "b"]]
    return out.drop_duplicates(ignore_index=True).astype("int64")


class _UnionFind:
    def __init__(self):
        self.parent: dict = {}

    def find(self, x):
        root = x
        while self.parent.setdefault(root, root) != root:
            root = self.parent[root]
        while x != root:  # path compression
            self.parent[x], x = root, self.parent[x]
        return root

    def union(self, x, y):
        rx, ry = self.find(x), self.find(y)
        if rx != ry:
            # deterministic: smaller id wins as root
            lo, hi = (rx, ry) if rx < ry else (ry, rx)
            self.parent[hi] = lo


def _components(pairs: list[tuple]) -> dict:
    uf = _UnionFind()
    for x, y in pairs:
        uf.union(x, y)
    return {x: uf.find(x) for x in list(uf.parent)}


def dedup_minhash(sf_dir: str, *, num_perm: int = 64, bands: int = 16, tau: float = 0.5):
    """MinHash-LSH near-dedup → Dataset (doc_id, cluster_id).

    Plan: signatures (map) → band explode (map) → groupby(band, bucket) →
    candidate pairs → exact Jaccard verify (second map over candidate doc
    pairs with texts rebroadcast) → union-find on the verified pairs
    (driver; the pair set is ≪ corpus — at larger scale replace with
    iterated min-label propagation: cluster_id ← min(cluster_id of
    neighbors) until fixpoint, each round a groupby).
    """
    import ray
    import ray.data

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    sigs = docs.map_batches(
        minhash_signatures_batch, fn_kwargs={"num_perm": num_perm}, batch_format="pandas"
    )
    band_rows = sigs.map_batches(
        _band_rows, fn_kwargs={"num_perm": num_perm, "bands": bands}, batch_format="pandas"
    )

    cand = _bucket_candidates(band_rows.to_pandas(), ["band", "bucket"])

    # exact verify: fetch the candidate docs' token sets once (candidate
    # doc count ≪ corpus), verify pairwise Jaccard
    texts = {}
    if len(cand):
        wanted = set(cand["a"]) | set(cand["b"])
        for b in docs.iter_batches(batch_size=65536, batch_format="pandas"):
            sel = b[b["doc_id"].isin(wanted)]
            hashes = _token_hashes(sel["text"])
            for d, hs in zip(sel["doc_id"], hashes):
                texts[d] = hs
    verified = [
        (r.a, r.b)
        for r in cand.itertuples()
        if jaccard(texts[r.a], texts[r.b]) >= tau
    ]
    comp = _components(verified)
    all_ids = docs.select_columns(["doc_id"]).to_pandas()["doc_id"]
    cluster = all_ids.map(lambda d: comp.get(d, d)).astype("int64")
    return ray.data.from_pandas(pd.DataFrame({"doc_id": all_ids, "cluster_id": cluster}))


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------


def simhash_signatures_batch(batch: pd.DataFrame) -> pd.DataFrame:
    sigs = np.empty(len(batch), dtype=np.uint64)
    for i, hs in enumerate(_token_hashes(batch["text"])):
        if len(hs) == 0:
            sigs[i] = 0
            continue
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
            np.int64
        )
        v = (2 * bits - 1).sum(axis=0)
        sigs[i] = np.packbits((v > 0)[::-1]).view(">u8")[0]
    return pd.DataFrame({"doc_id": batch["doc_id"], "simhash": sigs})


def dedup_simhash(sf_dir: str, *, max_hamming: int = 3):
    """SimHash near-dedup → Dataset (doc_id, cluster_id).

    Candidates via 4-block banding (pigeonhole for Hamming ≤ 3: at least
    one 16-bit block matches exactly), verified by true Hamming distance.
    """
    import ray
    import ray.data

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    sigs = docs.map_batches(simhash_signatures_batch, batch_format="pandas")

    def blocks(batch: pd.DataFrame) -> pd.DataFrame:
        out = {"block": [], "key": [], "doc_id": [], "simhash": []}
        for d, s in zip(batch["doc_id"], batch["simhash"]):
            s = int(s)
            for bi in range(4):
                out["block"].append(bi)
                out["key"].append((s >> (16 * bi)) & 0xFFFF)
                out["doc_id"].append(d)
                out["simhash"].append(s)
        return pd.DataFrame(out)

    block_df = sigs.map_batches(blocks, batch_format="pandas").to_pandas()
    cand = _bucket_candidates(block_df, ["block", "key"])
    sig_map = dict(
        zip(block_df["doc_id"].astype("int64"), block_df["simhash"].astype("uint64"))
    )
    verified = [
        (r.a, r.b)
        for r in cand.itertuples()
        if bin(int(sig_map[r.a]) ^ int(sig_map[r.b])).count("1") <= max_hamming
    ]
    comp = _components(verified)
    all_ids = docs.select_columns(["doc_id"]).to_pandas()["doc_id"]
    cluster = all_ids.map(lambda d: comp.get(d, d)).astype("int64")
    return ray.data.from_pandas(pd.DataFrame({"doc_id": all_ids, "cluster_id": cluster}))


# --------------------------------------------------------------------------
# n-gram Jaccard (exact pairwise within LSH candidates — exposed directly)
# --------------------------------------------------------------------------


def ngram_jaccard_pairs(sf_dir: str, *, tau: float = 0.8, num_perm: int = 64, bands: int = 16):
    """Verified near-duplicate pairs (a, b, jacq) at word-set Jaccard ≥ tau.

    jacq = floor(jaccard * 10^6) as int64 (quantized → hashable/portable).
    """
    import ray
    import ray.data

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    sigs = docs.map_batches(
        minhash_signatures_batch, fn_kwargs={"num_perm": num_perm}, batch_format="pandas"
    )
    band_rows = sigs.map_batches(
        _band_rows, fn_kwargs={"num_perm": num_perm, "bands": bands}, batch_format="pandas"
    )

    cand = _bucket_candidates(band_rows.to_pandas(), ["band", "bucket"])
    texts = {}
    if len(cand):
        wanted = set(cand["a"]) | set(cand["b"])
        for b in docs.iter_batches(batch_size=65536, batch_format="pandas"):
            sel = b[b["doc_id"].isin(wanted)]
            for d, hs in zip(sel["doc_id"], _token_hashes(sel["text"])):
                texts[d] = hs
    rows = []
    for r in cand.itertuples():
        j = jaccard(texts[r.a], texts[r.b])
        if j >= tau:
            rows.append((r.a, r.b, int(j * 1_000_000)))
    df = pd.DataFrame(rows, columns=["a", "b", "jacq"]).astype("int64")
    return ray.data.from_pandas(df.sort_values(["a", "b"], ignore_index=True))


# --------------------------------------------------------------------------
# embedding cosine near-dedup
# --------------------------------------------------------------------------


def dedup_embedding(sf_dir: str, *, tau: float = 0.45, num_planes: int = 8, seed: int = 11):
    """Embedding near-dedup: hyperplane LSH buckets → exact cosine → clusters."""
    import ray
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def normalize(batch: pd.DataFrame) -> pd.DataFrame:
        m = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        rng = np.random.RandomState(seed)
        planes = rng.randn(m.shape[1], num_planes)
        sig = (m @ planes > 0) @ (1 << np.arange(num_planes))
        return pd.DataFrame(
            {"vec_id": batch["vec_id"], "bucket": sig.astype("int64"),
             "vec": [row.tobytes() for row in m]}
        )

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("vec_id")
        ids = g["vec_id"].to_numpy()
        if len(ids) < 2:
            return pd.DataFrame({"a": [], "b": []}).astype("int64")
        m = np.stack([np.frombuffer(v, dtype=np.float64) for v in g["vec"]])
        sims = m @ m.T
        ai, bi = np.triu_indices(len(ids), k=1)
        keep = sims[ai, bi] >= tau
        return pd.DataFrame({"a": ids[ai[keep]], "b": ids[bi[keep]]})

    pairs = (
        ds.map_batches(normalize, batch_format="pandas")
        .groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pandas")
        .to_pandas()
        .drop_duplicates(ignore_index=True)
    )
    comp = _components([(r.a, r.b) for r in pairs.itertuples()])
    all_ids = ds.select_columns(["vec_id"]).to_pandas()["vec_id"]
    cluster = all_ids.map(lambda d: comp.get(d, d)).astype("int64")
    return ray.data.from_pandas(pd.DataFrame({"vec_id": all_ids, "cluster_id": cluster}))
