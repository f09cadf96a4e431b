"""Distributed exact-integer k-means vs a single-process replica."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from tripsu_ray.stages import cluster as C

SF = "/root/testdata/sf0.001"


def _local_census(sf_dir: str, k: int, iters: int) -> pd.DataFrame:
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    vid = t["vec_id"].to_numpy()
    lab = t["label"].to_numpy().astype(np.int64)
    emb = np.stack([np.asarray(x, dtype=np.float64) for x in t["embedding"].to_pylist()])
    q = np.floor(emb * C.SCALE).astype(np.int64)
    cen = q[np.argsort(vid)[:k]].copy()
    for _ in range(iters):
        a = C._assign(q, cen)
        n = np.bincount(a, minlength=k)
        s = np.zeros((k, q.shape[1]), dtype=np.int64)
        np.add.at(s, a, q)
        new = cen.copy()
        nz = n > 0
        new[nz] = s[nz] // n[nz][:, None]
        cen = new
    a = C._assign(q, cen)
    return (
        pd.DataFrame({"cluster_id": a.astype(np.int64), "label": lab, "n": 1})
        .groupby(["cluster_id", "label"], as_index=False)["n"]
        .sum()
        .sort_values(["cluster_id", "label"], ignore_index=True)
        .astype("int64")
    )


def test_kmeans_census_matches_local_replica():
    got = (
        C.kmeans_census(SF)
        .to_pandas()
        .sort_values(["cluster_id", "label"], ignore_index=True)
        .astype("int64")
    )
    want = _local_census(SF, k=8, iters=4)
    pd.testing.assert_frame_equal(got, want)
    # every vector lands in exactly one cluster
    n_vec = pq.read_metadata(f"{SF}/embeddings.parquet").num_rows
    assert int(got["n"].sum()) == n_vec


def test_bottom_k_init_is_distributed_and_exact(monkeypatch):
    """The init must never read the embeddings table onto the driver
    (round-3 VERDICT item 1): ``pq.read_table`` is poisoned on the driver
    for the duration and the distributed bottom-k fold must still produce
    exactly the k lowest-vec_id vectors."""
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    vid = t["vec_id"].to_numpy()
    order = np.argsort(vid)[:8]
    want_ids = vid[order]
    want_emb = np.stack(
        [np.asarray(t["embedding"].to_pylist()[i], dtype=np.float64) for i in order]
    )

    def _poisoned(*a, **kw):  # driver-side table read = the bug we fixed
        raise AssertionError("driver-side pq.read_table during kmeans init")

    monkeypatch.setattr(pq, "read_table", _poisoned)
    _, cen = C.kmeans_fit(SF, k=8, iters=0)
    assert cen.shape == (8, want_emb.shape[1])
    np.testing.assert_array_equal(
        cen, np.floor(want_emb * C.SCALE).astype(np.int64)
    )
    # and the helper returns the rows in vec_id order
    from tripsu_ray.sources import read_parquet_clean

    ds = read_parquet_clean(
        f"{SF}/embeddings.parquet", columns=["vec_id", "embedding", "label"]
    )
    got = C._bottom_k_vectors(ds, 8)
    np.testing.assert_array_equal(got["vec_id"].to_numpy(), np.sort(want_ids))


def test_kmeans_census_structure():
    """Structural invariants (the corpus labels are NOT embedding-derived,
    so no quality bound applies): ids in range, partition is non-trivial,
    every ground-truth label accounted for."""
    got = C.kmeans_census(SF).to_pandas()
    assert got["cluster_id"].between(0, 7).all()
    assert got["cluster_id"].nunique() >= 2
    assert set(got["label"].unique()) == set(range(10))
    assert (got["n"] > 0).all()


def test_assign_tie_breaks_to_lowest_cluster():
    q = np.array([[0, 0]], dtype=np.int64)
    cen = np.array([[1, 0], [-1, 0], [0, 1]], dtype=np.int64)  # all dist 1
    assert C._assign(q, cen)[0] == 0


def test_assign_exact_on_large_magnitudes():
    rng = np.random.default_rng(7)
    q = rng.integers(-200_000, 200_000, size=(64, 32), dtype=np.int64)
    cen = rng.integers(-200_000, 200_000, size=(8, 32), dtype=np.int64)
    a = C._assign(q, cen)
    full = ((q[:, None, :] - cen[None, :, :]) ** 2).sum(axis=2)
    assert (a == np.argmin(full, axis=1)).all()


def test_semdedup_matches_brute_force():
    """Distributed within-cluster dedup vs a local brute-force replica
    (same fit, float pairwise with exact boundary semantics)."""
    got = (
        C.semdedup(SF)
        .to_pandas()
        .sort_values("vec_id", ignore_index=True)
        .astype("int64")
    )
    t = pq.read_table(f"{SF}/embeddings.parquet")
    vid = t["vec_id"].to_numpy()
    emb = np.stack([np.asarray(x, dtype=np.float64) for x in t["embedding"].to_pylist()])
    q = np.floor(emb * C.SCALE).astype(np.int64)
    cen = q[np.argsort(vid)[:8]].copy()
    for _ in range(4):
        a = C._assign(q, cen)
        n = np.bincount(a, minlength=8)
        s = np.zeros((8, q.shape[1]), dtype=np.int64)
        np.add.at(s, a, q)
        new = cen.copy()
        new[n > 0] = s[n > 0] // n[n > 0][:, None]
        cen = new
    a = C._assign(q, cen)
    order = np.argsort(vid)
    dup = {}
    for c in range(8):
        members = [i for i in order if a[i] == c]
        for x, i in enumerate(members):
            flag = 0
            for j in members[:x]:
                dot = int(q[i] @ q[j])
                if dot > 0 and 10_000 * dot * dot >= 2025 * int(q[i] @ q[i]) * int(
                    q[j] @ q[j]
                ):
                    flag = 1
                    break
            dup[int(vid[i])] = flag
    want = pd.DataFrame(
        {
            "vec_id": sorted(dup),
            "is_dup": [dup[v] for v in sorted(dup)],
        }
    ).astype("int64")
    pd.testing.assert_frame_equal(got[["vec_id", "is_dup"]], want)
    assert len(got) == len(vid)


def test_semdedup_flags_planted_duplicate(tmp_path):
    """Two identical vectors (and one scaled copy, cos=1) must flag the
    later ids; orthogonal vectors must not."""
    rng = np.random.default_rng(3)
    base = rng.normal(size=(30, 16)).astype(np.float32)
    base[17] = base[5]          # exact duplicate, later id
    base[23] = base[5] * 0.5    # colinear → cos = 1
    import pyarrow as pa

    pq.write_table(
        pa.table(
            {
                "vec_id": np.arange(30, dtype=np.int64),
                "embedding": list(base),
                "label": np.zeros(30, dtype=np.int32),
            }
        ),
        tmp_path / "embeddings.parquet",
    )
    out = (
        C.semdedup(str(tmp_path), k=2, iters=2, tau_pct=95)
        .to_pandas()
        .set_index("vec_id")["is_dup"]
    )
    assert out[17] == 1 and out[23] == 1
    assert out[5] == 0
    assert int(out.sum()) == 2


@pytest.mark.usefixtures("ray_session")
class TestDBSCAN:
    @staticmethod
    def _reference(ids, X, tau, min_pts):
        """Sequential DBSCAN with the same determinizations (min-label
        component, min-cluster border)."""
        import numpy as np

        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        simq = np.floor(Xn @ Xn.T * 1_000_000).astype(np.int64)
        n = len(ids)
        adj = {int(ids[i]): set() for i in range(n)}
        for i in range(n):
            for j in range(i + 1, n):
                if simq[i, j] >= tau:
                    adj[int(ids[i])].add(int(ids[j]))
                    adj[int(ids[j])].add(int(ids[i]))
        core = {v for v, ns in adj.items() if len(ns) >= min_pts - 1}
        # components over core-core edges
        cluster = {}
        for v in sorted(core):
            if v in cluster:
                continue
            comp, stack = {v}, [v]
            while stack:
                u = stack.pop()
                for w in adj[u]:
                    if w in core and w not in comp:
                        comp.add(w)
                        stack.append(w)
            label = min(comp)
            for u in comp:
                cluster[u] = label
        rows = []
        for v in sorted(map(int, ids)):
            if v in core:
                rows.append((v, 2, cluster[v]))
            else:
                cn = [cluster[u] for u in adj[v] if u in core]
                rows.append((v, 1, min(cn)) if cn else (v, 0, -1))
        import pandas as pd

        return pd.DataFrame(rows, columns=["vec_id", "role", "cluster"]).astype(
            "int64"
        )

    def test_matches_sequential_reference(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from tripsu_ray.stages.cluster import dbscan

        rng = np.random.default_rng(7)
        # three tight blobs + scattered noise
        centers = rng.normal(size=(3, 16))
        pts = [c + 0.05 * rng.normal(size=(12, 16)) for c in centers]
        noise = rng.normal(size=(10, 16))
        X = np.vstack(pts + [noise]).astype(np.float32)
        ids = np.arange(len(X), dtype=np.int64)
        tbl = pa.table(
            {
                "vec_id": ids,
                "embedding": pa.array([r.tolist() for r in X], pa.list_(pa.float32())),
                "label": pa.array(np.zeros(len(X), dtype=np.int32)),
            }
        )
        pq.write_table(tbl, tmp_path / "embeddings.parquet")
        got = dbscan(str(tmp_path), tau_q=900_000, min_pts=4)
        want = self._reference(ids, X.astype(np.float64), 900_000, 4)
        pd.testing.assert_frame_equal(got, want)
        # structure sanity: ≥2 clusters found, noise present
        assert got[got["role"] == 2]["cluster"].nunique() >= 2
        assert (got["role"] == 0).any()


@pytest.mark.usefixtures("ray_session")
def test_label_centroids_exact_vs_local(tmp_path):
    import pyarrow as pa

    from tripsu_ray.stages.cluster import label_centroids

    rng = np.random.default_rng(11)
    X = rng.normal(size=(60, 8)).astype(np.float32)
    labels = rng.integers(0, 3, 60).astype(np.int32)
    tbl = pa.table(
        {
            "vec_id": np.arange(60, dtype=np.int64),
            "embedding": pa.array([r.tolist() for r in X], pa.list_(pa.float32())),
            "label": pa.array(labels),
        }
    )
    import pyarrow.parquet as pq_

    pq_.write_table(tbl, tmp_path / "embeddings.parquet")
    got = label_centroids(str(tmp_path))
    q = np.floor(X.astype(np.float64) * C.SCALE).astype(np.int64)
    for l in np.unique(labels):
        m = labels == l
        want = np.floor_divide(q[m].sum(axis=0), m.sum())
        sub = got[got["label"] == l].sort_values("dim")
        assert (sub["mean_q"].to_numpy() == want).all()
        assert (sub["n"] == m.sum()).all()


@pytest.mark.usefixtures("ray_session")
def test_knn_classify_matches_brute_force(tmp_path):
    """Distributed k-NN vote == single-process numpy replica (same total
    orders: simq DESC / vec_id ASC for the neighborhood, votes DESC /
    label ASC for the prediction)."""
    import pyarrow as pa
    import pyarrow.parquet as pq_

    from tripsu_ray.stages.cluster import knn_classify

    rng = np.random.default_rng(7)
    n, d, nq, k = 80, 8, 6, 5
    X = rng.normal(size=(n, d)).astype(np.float32)
    labels = rng.integers(0, 4, n).astype(np.int32)
    pq_.write_table(
        pa.table(
            {
                "vec_id": np.arange(n, dtype=np.int64),
                "embedding": pa.array([r.tolist() for r in X], pa.list_(pa.float32())),
                "label": pa.array(labels),
            }
        ),
        tmp_path / "embeddings.parquet",
    )
    got = (
        knn_classify(str(tmp_path), k=k, num_queries=nq)
        .to_pandas()
        .sort_values("query_id", ignore_index=True)
    )

    Xn = X.astype(np.float64)
    Xn = Xn / np.maximum(np.linalg.norm(Xn, axis=1, keepdims=True), 1e-12)
    sims = Xn[:nq] @ Xn[nq:].T
    simq = np.floor(sims * C.SCALE).astype(np.int64)
    vids = np.arange(nq, n)
    for qi in range(nq):
        order = np.lexsort((vids, -simq[qi]))[:k]
        neigh_labels = labels[nq:][order]
        vals, counts = np.unique(neigh_labels, return_counts=True)
        best = vals[np.lexsort((vals, -counts))][0]
        row = got.iloc[qi]
        assert row["query_id"] == qi
        assert row["true_label"] == labels[qi]
        assert row["pred_label"] == best
        assert row["votes"] == counts[vals == best][0]


@pytest.mark.usefixtures("ray_session")
def test_top_component_matches_local_replica_and_eigvec():
    got = C.top_component(SF)
    # exact replay: quantized moment matrix + integer power iteration
    t = pq.read_table(f"{SF}/embeddings.parquet")
    x = np.stack(
        [np.asarray(v, dtype=np.float64) for v in t["embedding"].to_pylist()]
    )
    a = np.floor(C.SCALE * (x[:, :, None] * x[:, None, :])).astype(np.int64).sum(
        axis=0
    )
    d = a.shape[0]
    v = [C.SCALE] * d
    for _ in range(C.TOP_COMPONENT_ITERS):
        w = [sum(int(a[i][j]) * v[j] for j in range(d)) for i in range(d)]
        m = max(max(abs(q) for q in w), 1)
        v = [-((-q) * C.SCALE // m) if q < 0 else (q * C.SCALE // m) for q in w]
    want = pd.DataFrame(
        {"dim": np.arange(d, dtype=np.int64), "v_q": np.array(v, dtype=np.int64)}
    )
    pd.testing.assert_frame_equal(got, want)
    # and the quantized iterate tracks the true dominant eigenvector
    evals, evecs = np.linalg.eigh(a.astype(np.float64))
    top = evecs[:, np.argmax(np.abs(evals))]
    g = got["v_q"].to_numpy().astype(np.float64)
    cos = abs(g @ top) / (np.linalg.norm(g) * np.linalg.norm(top))
    assert cos > 0.99, cos


@pytest.mark.usefixtures("ray_session")
def test_top_component_empty(tmp_path):
    import pyarrow as pa

    pq.write_table(
        pa.table({"vec_id": pa.array([], pa.int64()),
                  "embedding": pa.array([], pa.list_(pa.float32())),
                  "label": pa.array([], pa.int32())}),
        tmp_path / "embeddings.parquet",
    )
    out = C.top_component(str(tmp_path))
    assert list(out.columns) == ["dim", "v_q"] and len(out) == 0


@pytest.mark.usefixtures("ray_session")
def test_pca_scores_match_quantized_projection():
    comp = C.top_component(SF)
    got = C.pca_scores(SF).to_pandas().sort_values("vec_id", ignore_index=True)
    t = pq.read_table(f"{SF}/embeddings.parquet")
    x = np.stack([np.asarray(v, dtype=np.float64) for v in t["embedding"].to_pylist()])
    xq = np.floor(x * C.SCALE).astype(np.int64)
    v = comp["v_q"].to_numpy(dtype=np.int64)
    want = pd.DataFrame(
        {"vec_id": t["vec_id"].to_numpy().astype(np.int64), "proj_q": xq @ v}
    ).sort_values("vec_id", ignore_index=True).astype({"proj_q": "int64"})
    pd.testing.assert_frame_equal(got, want)


def test_silhouette_matches_brute_force():
    """Engine silhouette vs a single-process integer replica (full
    distances against the kmeans_fit centroids)."""
    got = (
        C.silhouette_scores(SF)
        .to_pandas()
        .sort_values("vec_id", ignore_index=True)
        .astype("int64")
    )
    t = pq.read_table(f"{SF}/embeddings.parquet")
    vid = t["vec_id"].to_numpy()
    emb = np.stack([np.asarray(x, dtype=np.float64) for x in t["embedding"].to_pylist()])
    q = np.floor(emb * C.SCALE).astype(np.int64)
    _, cen = C.kmeans_fit(SF, k=8, iters=4)
    c2 = np.einsum("kd,kd->k", cen, cen)
    q2 = np.einsum("nd,nd->n", q, q)
    d2 = q2[:, None] - 2 * (q @ cen.T) + c2[None, :]
    own = np.argmin(d2, axis=1)
    rows = np.arange(len(q))
    a = d2[rows, own].copy()
    d2[rows, own] = np.iinfo(np.int64).max
    bb = d2.min(axis=1)
    sil = (C.SIL_SCALE * (bb - a)) // np.maximum(bb, 1)
    want = (
        pd.DataFrame({"vec_id": vid.astype("int64"),
                      "cluster_id": own.astype("int64"),
                      "sil_q": sil.astype("int64")})
        .sort_values("vec_id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, want)
    assert got["sil_q"].between(0, C.SIL_SCALE).all()


def test_fused_slice_fit_bit_equal_to_separate_fits():
    """kmeans_fit_slices (one scan per round for all m subspaces) must be
    bit-identical to m separate kmeans_fit(dims=...) calls."""
    C._KMEANS_CACHE.clear()
    fused = C.kmeans_fit_slices(SF, k=16, iters=2, m=4)
    C._KMEANS_CACHE.clear()
    for j, cen in enumerate(fused):
        _, want = C.kmeans_fit(SF, k=16, iters=2, dims=(j * 16, (j + 1) * 16))
        np.testing.assert_array_equal(cen, want)
