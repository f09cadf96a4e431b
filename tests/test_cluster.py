"""Distributed exact-integer k-means vs a single-process replica."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

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
