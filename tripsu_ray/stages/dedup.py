"""Deduplication stages over the ``documents`` table.

Five strategies, each expressed Ray-Data-first:

- exact: fingerprint (sha256 of normalized text) → keep min(doc_id) per
  group. Hash-partitioned groupby; SQL-oracle-checkable.
- MinHash + LSH: per-doc signatures vectorized in one map pass, band →
  bucket groupby, each candidate pair emitted EXACTLY ONCE (first-collision
  band ownership), verified with exact Jaccard (bitset kernel when the
  vocab is small), clusters = iterated min-label propagation over the
  verified edge stream (identical result to min-root union-find, no
  driver fold).
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

from .text import _token_pat, fingerprint_batch
from ..sources import read_parquet_clean as _read_parquet_clean

MERSENNE = (1 << 61) - 1


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------


def dedup_exact_docs(sf_dir: str):
    """documents → (fingerprint, doc_id=min per group): the kept set."""
    import ray.data
    from ray.data.aggregate import Min

    docs = _read_parquet_clean(
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


_FNV_OFFSET = np.uint64(14695981039346656037)
_FNV_PRIME = np.uint64(1099511628211)


def _band_rows(sig_df: pd.DataFrame, num_perm: int, bands: int) -> pd.DataFrame:
    """Explode signatures into (bkey, doc_id) band rows — fully vectorized.

    ``bkey`` is a 64-bit FNV-style mix of (band index, the band's r minhash
    values): equal band-chunks ⇒ equal bkey, and a spurious 64-bit collision
    only ADDS a candidate pair that exact-Jaccard verification then rejects
    (LSH candidates are always verified), so correctness never depends on
    bkey uniqueness. One key column (instead of band+bucket) keeps the
    downstream partition/groupby single-key.
    """
    r = num_perm // bands
    n = len(sig_df)
    if n == 0:
        return pd.DataFrame(
            {
                "bkey": pd.Series([], dtype="uint64"),
                "doc_id": pd.Series([], dtype="int64"),
                "bi": pd.Series([], dtype="int64"),
                "allk": pd.Series([], dtype=object),
            }
        )
    sigs = np.frombuffer(b"".join(sig_df["sig"].tolist()), dtype=np.uint64).reshape(
        n, num_perm
    )
    bkeys = np.empty((n, bands), dtype=np.uint64)
    for bi in range(bands):
        seed = ((int(_FNV_OFFSET) ^ bi) * int(_FNV_PRIME)) & 0xFFFFFFFFFFFFFFFF
        h = np.full(n, seed, dtype=np.uint64)
        for j in range(r):
            h = (h ^ sigs[:, bi * r + j]) * _FNV_PRIME
        bkeys[:, bi] = h
    # ``bi`` + ``allk`` (every band key of the doc, as one fixed-width blob)
    # let the pair generator emit each candidate pair EXACTLY ONCE across
    # bands: the first band in which two docs collide owns the pair. On a
    # near-duplicate clique (docs colliding in every band) this cuts pair
    # generation + verification by a factor of ``bands``.
    blobs = np.array([bkeys[i].tobytes() for i in range(n)], dtype=object)
    return pd.DataFrame(
        {
            "bkey": bkeys.reshape(-1),  # row-major: doc 0's bands, doc 1's …
            "doc_id": np.repeat(sig_df["doc_id"].to_numpy().astype(np.int64), bands),
            "bi": np.tile(np.arange(bands, dtype=np.int64), n),
            "allk": np.repeat(blobs, bands),
        }
    )


def _candidate_pairs_ds(
    bkey_ds, *, num_parts: int = 32, carry: tuple = (), pair_chunk: int = 1 << 22
):
    """Band-row Dataset → candidate-pair Dataset, nothing on the driver.

    The round-1 plan folded the whole docs×bands bucket table to the driver;
    here the table stays distributed: a coarse hash partition on ``bkey``
    (same key ⇒ same partition) co-locates every bucket, and each of the
    ~num_parts partitions enumerates its buckets' pairs with a vectorized
    numpy generator (chunked to ``pair_chunk`` pairs so a giant bucket never
    materializes k² rows at once — the round-2 pandas self-merge did, and a
    2700-doc near-dup clique cost Σk² ≈ 99M merge rows).

    Exactly-once across bands: when the input carries ``bi`` (band index)
    and ``allk`` (all band keys of the doc as a fixed-width uint64 blob),
    a pair is emitted only in the bucket of its FIRST shared band f, and
    only by the rows whose band index is f — exact even under 64-bit band-
    key collisions across bands (the colliding run drops the pair; its
    true f-run emits it). Without those columns (plain bucket tables)
    pairs may still repeat across partitions; callers dedup with a tiny
    groupby or rely on label-propagation idempotency.

    ``carry`` columns ride along as ``<col>_a`` / ``<col>_b`` so verification
    that only needs per-doc signatures can run directly on the pair stream.
    """

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_part"] = (df["bkey"] % np.uint64(num_parts)).astype("int64")
        return df

    def gen(group: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "a": pd.Series([], dtype="int64"),
                "b": pd.Series([], dtype="int64"),
                **{f"{c}_a": pd.Series([], dtype=group[c].dtype) for c in carry},
                **{f"{c}_b": pd.Series([], dtype=group[c].dtype) for c in carry},
            }
        )
        n = len(group)
        if n < 2:
            return empty
        g = group.sort_values(["bkey", "doc_id"], kind="mergesort", ignore_index=True)
        bkeys = g["bkey"].to_numpy()
        starts = np.flatnonzero(np.r_[True, bkeys[1:] != bkeys[:-1]])
        ends = np.r_[starts[1:], n]
        ids = g["doc_id"].to_numpy().astype(np.int64)
        own = "bi" in g.columns and "allk" in g.columns
        if own:
            bis = g["bi"].to_numpy()
            nb = len(g["allk"].iloc[0]) // 8
            K = np.frombuffer(b"".join(g["allk"].tolist()), dtype=np.uint64).reshape(n, nb)
        carr = {c: g[c].to_numpy() for c in carry}
        out_a, out_b = [], []
        out_c: dict = {c: ([], []) for c in carry}
        for s, e in zip(starts, ends):
            k = e - s
            if k < 2:
                continue
            # enumerate (i < j) pairs in row blocks of ≤ pair_chunk pairs
            blk = max(1, pair_chunk // k)
            for i0 in range(0, k - 1, blk):
                i1 = min(i0 + blk, k - 1)
                rows = np.arange(i0, i1)
                counts = (k - 1) - rows
                ai = np.repeat(rows, counts)
                offs = np.concatenate(([0], np.cumsum(counts)))
                bj = np.arange(offs[-1]) - np.repeat(offs[:-1], counts) + np.repeat(
                    rows + 1, counts
                )
                ai += s
                bj += s
                keep = ids[ai] < ids[bj]
                if own:
                    # emit a pair only in the run of its FIRST shared band,
                    # and only when both rows sit at that band — exact even
                    # under 64-bit bkey collisions across bands (a mixed-
                    # band run then drops the pair; its true f-run emits it)
                    f = np.full(len(ai), -1, dtype=np.int64)
                    for j in range(nb):
                        unset = f < 0
                        if not unset.any():
                            break
                        f[unset & (K[ai, j] == K[bj, j])] = j
                    keep &= (f == bis[ai]) & (bis[ai] == bis[bj])
                ai, bj = ai[keep], bj[keep]
                if not len(ai):
                    continue
                out_a.append(ids[ai])
                out_b.append(ids[bj])
                for c in carry:
                    out_c[c][0].append(carr[c][ai])
                    out_c[c][1].append(carr[c][bj])
        if not out_a:
            return empty
        data = {"a": np.concatenate(out_a), "b": np.concatenate(out_b)}
        for c in carry:
            data[f"{c}_a"] = np.concatenate(out_c[c][0])
            data[f"{c}_b"] = np.concatenate(out_c[c][1])
        return pd.DataFrame(data).drop_duplicates(["a", "b"], ignore_index=True)

    return (
        bkey_ds.map_batches(add_part, batch_format="pandas")
        .groupby("_part")
        .map_groups(gen, batch_format="pandas")
    )


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


def label_propagation(
    pairs_ds, *, impl: str = "broadcast", num_partitions: int = 8, dtype: str = "int64"
) -> dict:
    """Edge Dataset (a, b) → {node: component-min label} via iterated
    min-label propagation — the distributed replacement for driver-side
    union-find over the pair set (same result: every node labels to the
    MIN id of its connected component, which is exactly what the min-root
    union-find produced). The EDGE set never materializes on the driver.

    ``impl="broadcast"`` (default): per round, the (node → label) map —
    bounded by the number of DUPLICATED docs, the same size class as the
    broadcast link map — is ``ray.put`` once; a map pass over the edge
    stream emits per-batch (node, min candidate label) partials that
    tree-reduce to the new map; the driver then path-compresses the map
    (label ← label[label] to closure), which collapses label chains so
    convergence takes O(log diameter) distributed rounds instead of
    O(diameter). Labels are monotone non-increasing → fixpoint when the
    map stops changing.

    ``impl="join"``: the fully-relational plan for graphs whose label
    table itself exceeds driver memory — each round is
    join(edges, labels) + groupby-min, all Dataset ops (more rounds, a
    shuffle per round; same result).

    ``dtype``: ``"int64"`` (doc ids) or ``"object"`` (string node ids —
    lexicographic min; used by ``stages.graph.connected_components_str``).
    The join impl is int64-only.
    """
    import pandas as pd

    if impl == "join":
        if dtype != "int64":
            raise ValueError("impl='join' supports int64 node ids only")
        return _label_propagation_join(pairs_ds, num_partitions=num_partitions)
    _cast = (lambda se: se.astype("int64")) if dtype == "int64" else (
        lambda se: se.astype(object)
    )

    import ray

    from .folds import tree_fold_tables

    edges = pairs_ds.materialize()
    if edges.count() == 0:
        return {}

    def compress(lab: dict) -> dict:
        # driver path compression over the (small) label map: closure of
        # label chains; O(#labels · chain), exact
        out = {}
        for x in lab:
            r = lab[x]
            while r in lab and lab[r] != r:
                r = lab[r]
            out[x] = r
        return {k: v for k, v in out.items() if k != v}

    def combine(frames: list[pd.DataFrame]) -> pd.DataFrame:
        df = pd.concat(frames, ignore_index=True)
        return df.groupby("node", sort=False, as_index=False)["label"].min()

    labels: dict = {}
    while True:
        lab_ref = ray.put(labels)

        def step(df: pd.DataFrame) -> pd.DataFrame:
            lab = ray.get(lab_ref)
            a = _cast(df["a"])
            b = _cast(df["b"])
            la = _cast(a.map(lab).fillna(a))
            lb = _cast(b.map(lab).fillna(b))
            cand = np.where(la.to_numpy() < lb.to_numpy(), la, lb)
            part = pd.DataFrame(
                {
                    "node": pd.concat([a, b], ignore_index=True),
                    "label": pd.concat(
                        [pd.Series(cand), pd.Series(cand)], ignore_index=True
                    ),
                }
            )
            return part.groupby("node", sort=False, as_index=False)["label"].min()

        folded = tree_fold_tables(edges.map_batches(step, batch_format="pandas"), combine)
        if dtype == "int64":
            new_labels = dict(
                zip(folded["node"].astype(int), folded["label"].astype(int))
            )
        else:
            new_labels = dict(zip(folded["node"], folded["label"]))
        # keep strictly-improving entries only, then compress chains
        merged = dict(labels)
        changed = False
        for n, l in new_labels.items():
            cur = merged.get(n, n)
            if l < cur:
                merged[n] = l
                changed = True
        merged = compress(merged)
        if not changed:
            return labels
        labels = merged


def _label_propagation_join(
    pairs_ds, *, num_partitions: int = 8, as_dataset: bool = False
):
    """Join-per-round min-label propagation (see :func:`label_propagation`).

    ``as_dataset=True`` returns the final (node, label) label table as a
    DATASET — one row per node incident to an edge, identity rows
    included — instead of folding the non-identity entries into a driver
    dict. This is the beyond-driver contract
    :func:`stages.graph.connected_components_ds` builds on: no step of
    the computation (and no part of the result) is node-class driver
    state.
    """
    import pandas as pd
    from ray.data.aggregate import Min

    def sym(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "src": pd.concat([df["a"], df["b"]], ignore_index=True).astype("int64"),
                "dst": pd.concat([df["b"], df["a"]], ignore_index=True).astype("int64"),
            }
        )

    edges = pairs_ds.map_batches(sym, batch_format="pandas").materialize()
    if edges.count() == 0:
        if as_dataset:
            import ray

            return ray.data.from_pandas(
                pd.DataFrame(
                    {"node": pd.Series([], dtype="int64"),
                     "label": pd.Series([], dtype="int64")}
                )
            )
        return {}
    # round 0: label(node) = min(node, min over neighbors) in one groupby
    labels = edges.groupby("src").aggregate(Min("dst", alias_name="nmin"))

    def init_label(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"node": df["src"], "label": np.minimum(df["src"], df["nmin"])}
        )

    labels = labels.map_batches(init_label, batch_format="pandas").materialize()
    total = labels.sum("label")
    while True:
        joined = edges.join(
            labels, "inner", num_partitions, on=("dst",), right_on=("node",)
        )

        def relabel(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"node": df["src"], "label": df["label"]})

        cand = joined.map_batches(relabel, batch_format="pandas").union(labels)
        labels = cand.groupby("node").aggregate(Min("label", alias_name="label")).materialize()
        new_total = labels.sum("label")
        if new_total == total:
            break
        total = new_total
    if as_dataset:
        return labels
    out: dict = {}
    for b in labels.iter_batches(batch_size=1 << 16, batch_format="pandas"):
        nz = b[b["node"] != b["label"]]  # identity labels need no broadcast
        out.update(zip(nz["node"].astype(int), nz["label"].astype(int)))
    return out


def _collect_pair_ids(pairs_ds) -> np.ndarray:
    """Distinct doc ids appearing in a candidate-pair Dataset (sorted
    int64 array — numpy unions, no Python set on the hot path)."""
    parts = []
    for b in pairs_ds.iter_batches(batch_size=1 << 18, batch_format="pandas"):
        parts.append(
            np.unique(np.concatenate([b["a"].to_numpy(), b["b"].to_numpy()]))
        )
    if not parts:
        return np.array([], dtype=np.int64)
    return np.unique(np.concatenate(parts)).astype(np.int64)


def _token_hash_map(docs, wanted_ids) -> dict[int, np.ndarray]:
    """{doc_id → sorted token-hash array} for a (small) wanted set.

    Tokenizing runs DISTRIBUTED inside map_batches; only the wanted docs'
    hash arrays return to the driver (bounded by the LSH candidate count,
    ≪ corpus — the same bounded-broadcast pattern as dedup_embedding).
    """
    import ray

    w = np.unique(np.asarray(list(wanted_ids), dtype=np.int64))
    if len(w) == 0:
        return {}
    w_ref = ray.put(w)

    def fetch(b: pd.DataFrame) -> pd.DataFrame:
        w = ray.get(w_ref)
        sel = b[np.isin(b["doc_id"].to_numpy(), w)]
        hs = _token_hashes(sel["text"])
        return pd.DataFrame(
            {
                "doc_id": sel["doc_id"].to_numpy().astype(np.int64),
                "hashes": [h.tobytes() for h in hs],
            }
        )

    out: dict[int, np.ndarray] = {}
    for b in docs.map_batches(fetch, batch_format="pandas").iter_batches(
        batch_size=1 << 16, batch_format="pandas"
    ):
        for d, hb in zip(b["doc_id"], b["hashes"]):
            out[int(d)] = np.frombuffer(hb, dtype=np.uint64)
    return out


def _assign_clusters(docs, labels: dict, id_col: str = "doc_id"):
    """docs → (id, cluster_id) Dataset via a broadcast label map (map-side
    apply; the corpus never folds to the driver)."""
    import ray

    lab_ref = ray.put(labels)

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        lab = ray.get(lab_ref)
        ids = b[id_col].astype("int64")
        cluster = ids.map(lab).fillna(ids).astype("int64")
        return pd.DataFrame({id_col: ids, "cluster_id": cluster})

    return docs.select_columns([id_col]).map_batches(assign, batch_format="pandas")


def _verified_jaccard_pairs(docs, cand_ds, *, tau: float):
    """Candidate-pair Dataset → verified (a, b, jacq) Dataset.

    Token sets of the candidate docs are computed distributed and broadcast
    (bounded by candidate count); verification itself is a map over the
    pair stream — the pair table never folds to the driver. The broadcast
    is a flat ragged table (ids, offsets, token array) so the per-batch
    kernel is zero-Python-loop numpy.
    """
    import ray

    wanted = _collect_pair_ids(cand_ds)
    tok_ref = ray.put(_token_hash_table(docs, wanted))

    def verify(b: pd.DataFrame) -> pd.DataFrame:
        tab = ray.get(tok_ref)
        if not len(b):
            return pd.DataFrame(
                {c: pd.Series([], dtype="int64") for c in ("a", "b", "jacq")}
            )
        j = _jaccard_many(tab, b["a"].to_numpy(), b["b"].to_numpy())
        keep = j >= tau
        return pd.DataFrame(
            {
                "a": b["a"].to_numpy()[keep],
                "b": b["b"].to_numpy()[keep],
                "jacq": (j[keep] * 1_000_000).astype("int64"),
            }
        ).astype("int64")

    return cand_ds.map_batches(verify, batch_format="pandas", batch_size=1 << 18)


_BITSET_MAX_BITS = 4096


def _popcount_u64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (SWAR; numpy 1.x has no bitwise_count)."""
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + (
        (x >> np.uint64(2)) & np.uint64(0x3333333333333333)
    )
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return (x * np.uint64(0x0101010101010101)) >> np.uint64(56)


def _bitset_matrix(offs: np.ndarray, flat: np.ndarray, vocab: np.ndarray) -> np.ndarray:
    """Ragged token table → (rows × words) uint64 bitset matrix over
    ``vocab`` (sorted unique token hashes). Set intersection then costs one
    AND + popcount per word instead of a sort-merge."""
    nrows = len(offs) - 1
    w = (len(vocab) + 63) // 64
    m = np.zeros((nrows, w), dtype=np.uint64)
    if len(flat):
        pos = np.searchsorted(vocab, flat).astype(np.uint64)
        row = np.repeat(np.arange(nrows, dtype=np.int64), np.diff(offs))
        np.bitwise_or.at(
            m, (row, (pos >> np.uint64(6)).astype(np.int64)),
            np.uint64(1) << (pos & np.uint64(63)),
        )
    return m


def _token_hash_table(docs, wanted_ids):
    """Ragged token-hash table (ids_sorted, offsets, flat hashes, bitsets) —
    the broadcast-friendly form of :func:`_token_hash_map` (numpy arrays ⇒
    zero-copy out of the object store, vectorized gather). ``bits`` is a
    per-doc bitset matrix over the (small) global vocab when it fits in
    ``_BITSET_MAX_BITS`` bits, else None (generic sort-merge kernel)."""
    m = _token_hash_map(docs, wanted_ids)
    ids = np.sort(np.fromiter(m.keys(), dtype=np.int64, count=len(m)))
    lens = np.fromiter((len(m[int(i)]) for i in ids), dtype=np.int64, count=len(ids))
    offs = np.concatenate(([0], np.cumsum(lens)))
    flat = (
        np.concatenate([m[int(i)] for i in ids]) if len(ids) else np.empty(0, np.uint64)
    )
    vocab = np.unique(flat)
    bits = _bitset_matrix(offs, flat, vocab) if len(vocab) <= _BITSET_MAX_BITS else None
    return ids, offs, flat, bits


def _ragged_gather(offs: np.ndarray, flat: np.ndarray, idx: np.ndarray):
    """Rows ``idx`` of a ragged array → (values, row-of-each-value)."""
    ln = offs[idx + 1] - offs[idx]
    total = int(ln.sum())
    if total == 0:
        return np.empty(0, flat.dtype), np.empty(0, np.int64), ln
    row = np.repeat(np.arange(len(idx), dtype=np.int64), ln)
    cum = np.concatenate(([0], np.cumsum(ln)))
    pos = np.arange(total, dtype=np.int64) - np.repeat(cum[:-1], ln)
    return flat[np.repeat(offs[idx], ln) + pos], row, ln


def _jaccard_many(tab, a_ids: np.ndarray, b_ids: np.ndarray) -> np.ndarray:
    """Vectorized exact Jaccard for a batch of (a, b) id pairs.

    Small-vocab fast path: per-doc bitsets → intersection is AND+popcount
    (a few ns/pair). Generic path: one ``intersect1d`` for the whole batch —
    tokens compact to <2^32 ids via the batch's unique-token table, so
    (pair_index << 32 | token_id) packs each side into a sorted unique
    uint64 array whose intersection, bucket-counted by pair index, is the
    per-pair intersection size.
    """
    ids, offs, flat, bits = tab
    npair = len(a_ids)
    ia = np.searchsorted(ids, np.asarray(a_ids, dtype=np.int64))
    ib = np.searchsorted(ids, np.asarray(b_ids, dtype=np.int64))
    la = offs[ia + 1] - offs[ia]
    lb = offs[ib + 1] - offs[ib]
    if bits is not None:
        inter = _popcount_u64(bits[ia] & bits[ib]).sum(axis=1).astype(np.int64)
    else:
        ta, pa, _ = _ragged_gather(offs, flat, ia)
        tb, pb, _ = _ragged_gather(offs, flat, ib)
        uniq = np.unique(np.concatenate([ta, tb]))
        ka = (pa.astype(np.uint64) << np.uint64(32)) | np.searchsorted(uniq, ta).astype(
            np.uint64
        )
        kb = (pb.astype(np.uint64) << np.uint64(32)) | np.searchsorted(uniq, tb).astype(
            np.uint64
        )
        common = np.intersect1d(ka, kb, assume_unique=True)
        inter = np.bincount(
            (common >> np.uint64(32)).astype(np.int64), minlength=npair
        )
    union = la + lb - inter
    # both-empty pairs: Jaccard 1.0 by convention (matches ``jaccard``)
    return np.where(union > 0, inter / np.maximum(union, 1), 1.0)


def dedup_minhash(sf_dir: str, *, num_perm: int = 64, bands: int = 16, tau: float = 0.5):
    """MinHash-LSH near-dedup → Dataset (doc_id, cluster_id) — fully
    distributed physical plan:

    signatures (map) → band explode (map, vectorized) → coarse hash
    partition on the band key → per-partition candidate pairs
    (:func:`_candidate_pairs_ds`: the docs×bands bucket table never reaches
    the driver) → exact-Jaccard verify over the pair stream (token sets of
    candidates only, broadcast) → iterated min-label propagation
    (:func:`label_propagation`: groupby rounds to fixpoint — no driver
    union-find) → map-side cluster assignment over a broadcast label map.
    """
    import ray.data

    docs = _read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    sigs = docs.map_batches(
        minhash_signatures_batch, fn_kwargs={"num_perm": num_perm}, batch_format="pandas"
    )
    band_rows = sigs.map_batches(
        _band_rows, fn_kwargs={"num_perm": num_perm, "bands": bands}, batch_format="pandas"
    )
    # materialize: the candidate stream is consumed twice (id collection +
    # verification) — without this the whole LSH plan re-executes
    cand = _candidate_pairs_ds(band_rows).materialize()
    verified = _verified_jaccard_pairs(docs, cand, tau=tau).materialize()
    labels = label_propagation(verified)
    return _assign_clusters(docs, labels)


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
    """SimHash near-dedup → Dataset (doc_id, cluster_id) — fully distributed.

    Candidates via 4-block banding (pigeonhole for Hamming ≤ 3: at least
    one 16-bit block matches exactly). The block rows CARRY the 64-bit
    signature, so Hamming verification runs vectorized directly on the
    candidate-pair stream — no driver signature map, no driver block table.
    Clusters via iterated min-label propagation (groupby rounds).
    """
    import ray.data

    docs = _read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    sigs = docs.map_batches(simhash_signatures_batch, batch_format="pandas")

    def blocks(batch: pd.DataFrame) -> pd.DataFrame:
        """Explode to (bkey, doc_id, simhash): bkey = block_idx·2^16 | block
        bits — exact (collision-free) band key."""
        s = batch["simhash"].to_numpy().astype(np.uint64)
        n = len(s)
        bkeys = np.empty((n, 4), dtype=np.uint64)
        for bi in range(4):
            bkeys[:, bi] = (np.uint64(bi) << np.uint64(16)) | (
                (s >> np.uint64(16 * bi)) & np.uint64(0xFFFF)
            )
        blobs = np.array([bkeys[i].tobytes() for i in range(n)], dtype=object)
        return pd.DataFrame(
            {
                "bkey": bkeys.reshape(-1),
                "doc_id": np.repeat(batch["doc_id"].to_numpy().astype(np.int64), 4),
                "simhash": np.repeat(s, 4),
                "bi": np.tile(np.arange(4, dtype=np.int64), n),
                "allk": np.repeat(blobs, 4),
            }
        )

    block_rows = sigs.map_batches(blocks, batch_format="pandas")
    cand = _candidate_pairs_ds(block_rows, carry=("simhash",))

    def verify(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame({c: pd.Series([], dtype="int64") for c in ("a", "b")})
        x = b["simhash_a"].to_numpy().astype(np.uint64) ^ b["simhash_b"].to_numpy().astype(np.uint64)
        ham = np.unpackbits(x.view(np.uint8).reshape(len(b), 8), axis=1).sum(axis=1)
        keep = ham <= max_hamming
        return pd.DataFrame(
            {"a": b["a"].to_numpy()[keep], "b": b["b"].to_numpy()[keep]}
        ).astype("int64")

    verified = cand.map_batches(verify, batch_format="pandas").materialize()
    labels = label_propagation(verified)
    return _assign_clusters(docs, labels)


# --------------------------------------------------------------------------
# n-gram Jaccard (exact pairwise within LSH candidates — exposed directly)
# --------------------------------------------------------------------------


def ngram_jaccard_pairs(sf_dir: str, *, tau: float = 0.8, num_perm: int = 64, bands: int = 16):
    """Verified near-duplicate pairs (a, b, jacq) at word-set Jaccard ≥ tau.

    jacq = floor(jaccard * 10^6) as int64 (quantized → hashable/portable).
    Same distributed plan as dedup_minhash up to verification. No global
    pair dedup is needed: first-collision band ownership in
    :func:`_candidate_pairs_ds` emits each candidate pair exactly once
    (and a multi-key groupby over millions of near-singleton (a, b)
    groups wedges Ray 2.49's aggregate — see BASELINE.md).
    """
    import ray.data

    docs = _read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    sigs = docs.map_batches(
        minhash_signatures_batch, fn_kwargs={"num_perm": num_perm}, batch_format="pandas"
    )
    band_rows = sigs.map_batches(
        _band_rows, fn_kwargs={"num_perm": num_perm, "bands": bands}, batch_format="pandas"
    )
    cand = _candidate_pairs_ds(band_rows).materialize()
    verified = _verified_jaccard_pairs(docs, cand, tau=tau)
    return verified.sort(["a", "b"])


# --------------------------------------------------------------------------
# embedding cosine near-dedup
# --------------------------------------------------------------------------


EMB_SCALE = 1_000_000


def lsh_planes_q(d: int, num_planes: int, seed: int) -> np.ndarray:
    """Integer-quantized hyperplanes: ``floor(randn·10⁶)`` int64 from the
    seeded RandomState — deterministic per (d, num_planes, seed), tiny
    (d × planes), and INJECTABLE as SQL literals so DuckDB replays the
    bucket assignment bit-exactly (the trick that graduated minhash)."""
    rng = np.random.RandomState(seed)
    return np.floor(rng.randn(d, num_planes) * EMB_SCALE).astype(np.int64)


def dedup_embedding(sf_dir: str, *, tau_pct: int = 45, num_planes: int = 8, seed: int = 11):
    """Embedding near-dedup: hyperplane LSH buckets → exact cosine →
    clusters — EXACT-integer end to end (hash-checked, round-3 VERDICT
    item 4):

    - embeddings quantize once to ``floor(x·10⁶)`` int64; signature bit p
      is the sign of the exact integer dot with quantized plane p
      (≤ 64·10⁶·5·10⁶ ≈ 5·10¹³, far inside int64) — cosine-LSH signs are
      scale-invariant, so quantized-raw signs equal normalized-float
      signs except within quantization noise of the boundary, where the
      integer rule is simply THE definition both engines share;
    - within-bucket verification is semdedup's exact algebra:
      cos ≥ tau ⇔ dot > 0 ∧ 10⁴·dot² ≥ tau_pct²·|a|²·|b|² (float64
      prefilter, big-int re-judgment of ±10⁻⁹ boundary pairs);
    - clusters via distributed label propagation (component-min ids),
      same plan as dedup_minhash.
    """
    import ray
    import ray.data

    ds = _read_parquet_clean(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    tau = tau_pct / 100.0

    def sig_batch(batch: pd.DataFrame) -> pd.DataFrame:
        m = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        q = np.floor(m * EMB_SCALE).astype(np.int64)
        planes = lsh_planes_q(q.shape[1], num_planes, seed)
        sig = (q @ planes > 0) @ (1 << np.arange(num_planes))
        return pd.DataFrame(
            {"vec_id": batch["vec_id"], "bucket": sig.astype("int64"),
             "q": [row.tobytes() for row in q]}
        )

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("vec_id")
        ids = g["vec_id"].to_numpy()
        if len(ids) < 2:
            return pd.DataFrame({"a": [], "b": []}).astype("int64")
        q = np.stack([np.frombuffer(v, dtype=np.int64) for v in g["q"]])
        dots = q @ q.T  # exact int64
        n2 = np.einsum("id,id->i", q, q)
        nf = np.sqrt(n2.astype(np.float64))
        sim = dots / (nf[:, None] * nf[None, :])
        ai, bi = np.triu_indices(len(ids), k=1)
        keep = (sim[ai, bi] >= tau) & (dots[ai, bi] > 0)
        border = (np.abs(sim[ai, bi] - tau) < 1e-9) & (dots[ai, bi] > 0)
        for t in np.nonzero(border)[0]:
            i, j = ai[t], bi[t]
            d2 = int(dots[i, j])
            keep[t] = d2 > 0 and 10_000 * d2 * d2 >= (
                tau_pct * tau_pct * int(n2[i]) * int(n2[j])
            )
        return pd.DataFrame({"a": ids[ai[keep]], "b": ids[bi[keep]]})

    # distributed components + map-side assignment — same plan as
    # dedup_minhash (duplicate edges from multi-bucket pairs are fine:
    # label propagation is idempotent over them)
    pairs = (
        ds.map_batches(sig_batch, batch_format="pandas")
        .groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    labels = label_propagation(pairs)
    return _assign_clusters(ds, labels, id_col="vec_id")
