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
