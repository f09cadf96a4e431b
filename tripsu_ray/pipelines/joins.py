"""The join family Ray Data lacks: as-of, range (interval), anti, semi.

All four share the repo's proven exchange shape (see
``docops.q_rel_shuffle_join``): tag every input stream to ONE shared
schema, union, hash-partition on a single int ``_part`` key
(``Dataset.join`` is broken at ≥8 partitions on Ray 2.49 — BASELINE.md),
then a vectorized per-partition kernel. Co-partitioning is exact because
every side hashes the same join key, so each kernel sees ALL rows for
its keys and the join is partition-local — the partitioning assumption
each operator relies on.

Time columns travel as int64 epoch-microseconds (exact integer algebra,
engine-portable value hashes — the same discipline as the cents columns
everywhere else in this repo).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..sources import read_parquet_clean as _read_parquet_clean

_P = 32  # partitions per exchange

_HOUR_US = 3_600_000_000


def _part_of(keys: np.ndarray) -> np.ndarray:
    return (pd.util.hash_array(keys.astype(np.int64)) % _P).astype("int64")


def _ts_us(ts: pd.Series) -> np.ndarray:
    return ts.astype("datetime64[us]").astype("int64").to_numpy()


def _sentinel_rows(dtypes: dict, side_col: str = "side"):
    """One ``side = -1`` row per partition id, in the exchange's shared
    schema (``dtypes``: column → numpy dtype string, ``_part`` excluded).

    Why: Ray skips a map UDF entirely for 0-row input blocks and emits a
    SCHEMALESS empty block instead (plan_udf_map_op's empty-block fast
    path) — so an empty exchange partition yields
    ``PandasBlockSchema(names=[])`` RefBundles and per-operator schema
    warnings. With one sentinel per partition, every partition fn runs
    and returns a TYPED frame; the fns ignore the sentinels by side
    selection (no real row has ``side = -1``)."""
    import ray.data

    sent = pd.DataFrame(
        {c: np.zeros(_P, dtype="int64").astype(t) for c, t in dtypes.items()}
    )
    sent[side_col] = np.full(_P, -1, dtype=dtypes[side_col])
    sent["_part"] = np.arange(_P, dtype=np.int64)
    return ray.data.from_pandas(sent)


def _events_stream(sf_dir: str, event_type: str, extra: list | None = None,
                   xform=None):
    """Filtered event stream; ``xform`` (the exchange tagger) fuses INTO
    the filter UDF — a separate chained map_batches would be skipped by
    Ray whenever the filter empties a block, emitting schemaless empties
    (see :func:`_sentinel_rows`)."""
    cols = ["user_id", "ts", "event_type"] + (extra or [])
    ds = _read_parquet_clean(f"{sf_dir}/events.parquet", columns=cols)

    def keep(b: pd.DataFrame) -> pd.DataFrame:
        out = b[b["event_type"] == event_type].drop(columns=["event_type"])
        return xform(out) if xform is not None else out

    return ds.map_batches(keep, batch_format="pandas")


def q_rel_asof_join(sf_dir: str):
    """Backward as-of join: every purchase event matched to the SAME
    user's latest click at-or-before it (the classic attribution join).

    Plan: both filtered event streams tag to one schema
    (u, t, ev, cents, side), union, ONE user-hash exchange, then
    ``pd.merge_asof(by=user, on=ts, direction='backward')`` per
    partition — exact because (user_id, ts) is unique in the corpus and
    every row of a user lives in one partition. Inner semantics:
    purchases with no prior click drop. Output
    (event_id, click_ts_us, click_value_cents), all int64.
    """
    def tag_p(b: pd.DataFrame) -> pd.DataFrame:
        u = b["user_id"].to_numpy().astype(np.int64)
        return pd.DataFrame(
            {"u": u, "t": _ts_us(b["ts"]),
             "ev": b["event_id"].astype("int64"),
             "cents": np.full(len(b), 0, dtype=np.int64),
             "side": np.full(len(b), 1, dtype=np.int8), "_part": _part_of(u)}
        )

    def tag_c(b: pd.DataFrame) -> pd.DataFrame:
        u = b["user_id"].to_numpy().astype(np.int64)
        return pd.DataFrame(
            {"u": u, "t": _ts_us(b["ts"]),
             "ev": np.full(len(b), 0, dtype=np.int64),
             "cents": (b["value"] * 100).round().astype("int64"),
             "side": np.full(len(b), 0, dtype=np.int8), "_part": _part_of(u)}
        )

    p = _events_stream(sf_dir, "purchase", ["event_id"], xform=tag_p)
    c = _events_stream(sf_dir, "click", ["value"], xform=tag_c)
    both = p.union(c).union(
        _sentinel_rows(
            {"u": "int64", "t": "int64", "ev": "int64",
             "cents": "int64", "side": "int8"}
        )
    )

    def asof_part(g: pd.DataFrame) -> pd.DataFrame:
        pur = g[g["side"] == 1][["u", "t", "ev"]].sort_values("t", kind="stable")
        cli = g[g["side"] == 0][["u", "t", "cents"]].sort_values("t", kind="stable")
        # merge_asof keeps only the left's on-key, so the click's own
        # timestamp rides along as a plain data column
        cli = cli.assign(ct=cli["t"].to_numpy())
        m = pd.merge_asof(
            pur, cli, on="t", by="u", direction="backward",
            allow_exact_matches=True,
        )
        m = m[m["ct"].notna()]  # inner: purchases with no prior click drop
        return pd.DataFrame(
            {"event_id": m["ev"].astype("int64"),
             "click_ts_us": m["ct"].astype("int64"),
             "click_value_cents": m["cents"].astype("int64")}
        )

    return both.groupby("_part").map_groups(asof_part, batch_format="pandas")


def q_rel_range_join(sf_dir: str):
    """Interval (range) join: per purchase event, the count of the SAME
    user's view events in the hour before it — ``v.ts ∈ [p.ts−1h, p.ts)``.

    Plan: one user-hash exchange co-locates each user's views and
    purchases, then a packed-int64 ``np.searchsorted`` kernel per
    partition: user codes are factorized locally and packed as
    ``code·base + (ts − ts_min)`` with ``base = span + window + 2``, so
    a purchase's window ``[pack−W, pack)`` can never cross into another
    user's code range and both bounds resolve with two vectorized
    binary searches — no per-row loop, no m:n merge explosion. Inner
    semantics (only purchases with ≥1 view in window). Output
    (event_id, n_views), int64.
    """
    def tag(side: int, with_ev: bool):
        def f(b: pd.DataFrame) -> pd.DataFrame:
            u = b["user_id"].to_numpy().astype(np.int64)
            ev = b["event_id"].astype("int64") if with_ev else np.zeros(len(b), np.int64)
            return pd.DataFrame(
                {"u": u, "t": _ts_us(b["ts"]), "ev": ev,
                 "side": np.full(len(b), side, dtype=np.int8), "_part": _part_of(u)}
            )

        return f

    p = _events_stream(sf_dir, "purchase", ["event_id"], xform=tag(1, True))
    v = _events_stream(sf_dir, "view", xform=tag(0, False))
    both = p.union(v).union(
        _sentinel_rows({"u": "int64", "t": "int64", "ev": "int64", "side": "int8"})
    )

    def range_part(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"event_id": pd.Series([], dtype="int64"),
             "n_views": pd.Series([], dtype="int64")}
        )
        if len(g):
            g = g[g["side"] != -1]  # partition-fill sentinels
        if not len(g):
            return empty
        code = pd.factorize(g["u"])[0].astype(np.int64)
        t = g["t"].to_numpy()
        rel = t - t.min()
        base = int(rel.max()) + _HOUR_US + 2
        pack = code * base + rel
        is_p = (g["side"] == 1).to_numpy()
        vp = np.sort(pack[~is_p])
        pp = pack[is_p]
        lo = np.searchsorted(vp, pp - _HOUR_US, side="left")
        hi = np.searchsorted(vp, pp, side="left")
        n = hi - lo
        keep = n > 0
        return pd.DataFrame(
            {"event_id": g["ev"].to_numpy()[is_p][keep],
             "n_views": n[keep].astype("int64")}
        )

    return both.groupby("_part").map_groups(range_part, batch_format="pandas")


def _key_filter_join(sf_dir: str, *, anti: bool):
    """Shuffle anti/semi join: customers WITHOUT (anti) / WITH (semi) at
    least one URGENT-priority order, where neither side broadcasts.

    (Every customer has SOME order in this corpus, so the probe side is
    the urgent subset — that keeps both variants non-degenerate.) The
    probe side filters at the read and pre-dedups per batch (distinct
    o_custkey — the partial-combine discipline), so the exchange moves
    ≤ #batches rows per customer key no matter how many orders a
    customer has.
    """
    cust = _read_parquet_clean(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_acctbal"]
    )
    orders = _read_parquet_clean(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderpriority"]
    )

    def tag_cust(b: pd.DataFrame) -> pd.DataFrame:
        k = b["c_custkey"].to_numpy().astype(np.int64)
        return pd.DataFrame(
            {"k": k, "cents": (b["c_acctbal"] * 100).round().astype("int64"),
             "side": np.full(len(b), 0, dtype=np.int8), "_part": _part_of(k)}
        )

    def tag_orders(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["o_orderpriority"] == "1-URGENT"]
        k = np.unique(b["o_custkey"].to_numpy().astype(np.int64))
        return pd.DataFrame(
            {"k": k, "cents": np.zeros(len(k), np.int64),
             "side": np.ones(len(k), np.int8), "_part": _part_of(k)}
        )

    both = (
        cust.map_batches(tag_cust, batch_format="pandas")
        .union(orders.map_batches(tag_orders, batch_format="pandas"))
        .union(_sentinel_rows({"k": "int64", "cents": "int64", "side": "int8"}))
    )

    def filter_part(g: pd.DataFrame) -> pd.DataFrame:
        c = g[g["side"] == 0]
        seen = g.loc[g["side"] == 1, "k"].to_numpy()
        hit = np.isin(c["k"].to_numpy(), seen)
        out = c[~hit] if anti else c[hit]
        return pd.DataFrame(
            {"c_custkey": out["k"].astype("int64"),
             "c_acctbal_cents": out["cents"].astype("int64")}
        )

    return both.groupby("_part").map_groups(filter_part, batch_format="pandas")


def q_rel_anti_join(sf_dir: str):
    """Customers with no urgent order (NOT EXISTS) — :func:`_key_filter_join`."""
    return _key_filter_join(sf_dir, anti=True)


def q_rel_semi_join(sf_dir: str):
    """Customers with ≥1 urgent order (EXISTS) — :func:`_key_filter_join`."""
    return _key_filter_join(sf_dir, anti=False)


def sql_rel_asof_join() -> str:
    return """
WITH p AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'),
     c AS (SELECT user_id, ts, value FROM events WHERE event_type = 'click')
SELECT event_id, click_ts_us, click_value_cents FROM (
  SELECT p.event_id AS event_id,
         CAST(epoch_us(c.ts) AS BIGINT) AS click_ts_us,
         CAST(round(c.value * 100) AS BIGINT) AS click_value_cents,
         row_number() OVER (PARTITION BY p.event_id ORDER BY c.ts DESC) AS rn
  FROM p JOIN c ON c.user_id = p.user_id AND c.ts <= p.ts
) WHERE rn = 1
"""


def sql_rel_range_join() -> str:
    return """
WITH p AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'),
     v AS (SELECT user_id, ts FROM events WHERE event_type = 'view')
SELECT p.event_id AS event_id, CAST(count(*) AS BIGINT) AS n_views
FROM p JOIN v ON v.user_id = p.user_id
             AND v.ts >= p.ts - INTERVAL 1 HOUR AND v.ts < p.ts
GROUP BY 1
"""


def sql_rel_anti_join() -> str:
    return """
SELECT c_custkey, CAST(round(c_acctbal * 100) AS BIGINT) AS c_acctbal_cents
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
"""


def sql_rel_semi_join() -> str:
    return """
SELECT c_custkey, CAST(round(c_acctbal * 100) AS BIGINT) AS c_acctbal_cents
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderpriority = '1-URGENT')
"""


def q_rel_full_outer_join(sf_dir: str):
    """FULL OUTER join: per-customer order spend in the early period
    (< 1998) vs the late period (≥ 1998) — customers active in only one
    period surface with NULL on the other side, completing the join
    family (inner via shuffle_join, left via BGP OPTIONAL, anti/semi
    here).

    Plan: both period streams are per-key AGGREGATES of the same scan, so
    the full-outer join collapses into ONE custkey exchange — per-batch
    (custkey, period) partial sums, co-partition on custkey, vectorized
    per-partition combine + early/late pivot with pandas nullable Int64
    for the unmatched sides (hash-compatible with SQL NULL)."""
    from ..sources import read_parquet_clean as _read_parquet_clean

    ds = _read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_totalprice", "o_orderdate"],
    )
    cut = pd.Timestamp("1998-01-01")
    _P = 32

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = (
            pd.DataFrame(
                {
                    "o_custkey": b["o_custkey"].astype("int64"),
                    "late": (b["o_orderdate"] >= cut).astype("int8"),
                    "cents": (b["o_totalprice"] * 100).round().astype("int64"),
                }
            )
            .groupby(["o_custkey", "late"], sort=False, as_index=False)["cents"]
            .sum()
        )
        g["_part"] = (g["o_custkey"].to_numpy() % _P).astype("int64")
        return g

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        if "o_custkey" not in g.columns or not len(g):
            return pd.DataFrame(
                {
                    "o_custkey": pd.Series([], dtype="int64"),
                    "early_cents": pd.Series([], dtype="Int64"),
                    "late_cents": pd.Series([], dtype="Int64"),
                }
            )
        t = g.groupby(["o_custkey", "late"], sort=False, as_index=False)["cents"].sum()
        # convert to nullable Int64 BEFORE the outer merge: a plain int64
        # column would round-trip through float64 on the unmatched side
        # (silent precision loss past 2^53)
        e = t[t["late"] == 0][["o_custkey", "cents"]].rename(
            columns={"cents": "early_cents"}
        )
        l = t[t["late"] == 1][["o_custkey", "cents"]].rename(
            columns={"cents": "late_cents"}
        )
        e["early_cents"] = e["early_cents"].astype("Int64")
        l["late_cents"] = l["late_cents"].astype("Int64")
        out = e.merge(l, on="o_custkey", how="outer")
        return out.astype({"o_custkey": "int64"}).reset_index(drop=True)

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("_part")
        .map_groups(finish, batch_format="pandas")
    )


def sql_rel_full_outer_join() -> str:
    return """
WITH e AS (
  SELECT o_custkey, CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS early_cents
  FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01' GROUP BY 1
), l AS (
  SELECT o_custkey, CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS late_cents
  FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01' GROUP BY 1
)
SELECT o_custkey, e.early_cents, l.late_cents
FROM e FULL OUTER JOIN l USING (o_custkey)
ORDER BY 1
""".strip()
