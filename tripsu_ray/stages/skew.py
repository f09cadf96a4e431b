"""Skew-aware aggregation helpers (hub keys / hot partitions).

Two complementary strategies, both exact for associative+commutative
aggregations:

1. **Partial combine** (preferred): aggregate inside ``map_batches`` before
   the groupby — bounds each key's shuffle volume at #batches rows no
   matter how hot the key is. Used by the type-index and link-map folds.
2. **Salting** (this module): when per-group work itself must be
   distributed (a single reducer for a hub key would still be hot — e.g.
   heavy per-group computation), split each key into ``salt_factor``
   sub-keys with a deterministic row hash, aggregate (key, salt) groups,
   then merge the (few × salt_factor) partials in a second, tiny groupby.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_AGGS = {"sum": "sum", "min": "min", "max": "max", "count": "sum"}


def salted_aggregate(ds, key: str, value: str, agg: str, *, salt_factor: int = 8):
    """groupby(key).agg over a salted two-stage plan; exact for sum/min/max/count.

    Salt is the row position within the batch modulo ``salt_factor`` —
    deterministic per block (a retried block task replays the same rows in
    the same order) and, unlike a value hash, it spreads a hub key even
    when all its rows carry the SAME value (the common count/flag case,
    where a value hash would put the whole hub in one salt bucket). Never
    ``random`` (retries must reproduce the assignment) and never Python
    ``hash`` (per-process randomized).

    NOTE: for these four associative aggs the in-batch partial combine
    already bounds per-key shuffle volume, so the salt stage demonstrates
    the PATTERN (for heavy per-group work that must itself distribute)
    rather than buying throughput here. Both merge stages run inside ONE
    coarse single-int-key exchange — Ray 2.49's multi-key
    ``groupby([k, salt]).aggregate`` hangs outright at millions of
    near-singleton groups (see BASELINE.md), so it must never be used for
    the (key, salt) merge. Null keys are kept as their own group
    (``dropna=False``), matching SQL GROUP BY; ``count`` counts NON-NULL
    values of ``value`` (SQL ``count(col)``), not rows.
    """
    if agg not in _AGGS:
        raise ValueError(f"unsupported agg {agg!r}; one of {sorted(_AGGS)}")
    fn = _AGGS[agg]
    num_parts = 32

    def add_salt_and_partial(batch: pd.DataFrame) -> pd.DataFrame:
        salt = np.arange(len(batch), dtype="int64") % salt_factor
        col = (
            batch[value].to_numpy()
            if agg != "count"
            else batch[value].notna().to_numpy().astype("int64")
        )
        df = pd.DataFrame({key: batch[key].to_numpy(), "_salt": salt, "_v": col})
        out = (
            df.groupby([key, "_salt"], sort=False, dropna=False)["_v"]
            .agg(fn)
            .reset_index()
        )
        out["_part"] = (pd.util.hash_array(out[key].to_numpy()) % num_parts).astype(
            "int64"
        )
        return out

    def merge_part(g: pd.DataFrame) -> pd.DataFrame:
        # stage 1 ((key, salt) merge) and stage 2 (key merge) are both
        # vectorized pandas groupbys inside one co-located partition
        s1 = g.groupby([key, "_salt"], sort=False, dropna=False, as_index=False)[
            "_v"
        ].agg(fn)
        s2 = s1.groupby(key, sort=False, dropna=False, as_index=False)["_v"].agg(fn)
        return s2.rename(columns={"_v": agg})

    return (
        ds.map_batches(add_salt_and_partial, batch_format="pandas")
        .groupby("_part")
        .map_groups(merge_part, batch_format="pandas")
    )


# --- exact order statistics without a global sort --------------------------


def exact_quantiles(
    ds,
    column: str,
    qs: tuple,
    *,
    num_buckets: int = 1 << 16,
    max_collect: int = 2_000_000,
    _depth: int = 0,
    _ranks: dict | None = None,
):
    """Exact quantiles of an int64 column via histogram selection — the
    scale-idiomatic alternative to ``ds.sort`` (which is an all-to-all
    range exchange of EVERY row for a handful of order statistics).

    Convention matches DuckDB ``quantile_disc``: the q-quantile of n
    values is the element at 0-based index ``ceil(q*n) - 1`` in sorted
    order (fuzz-verified against DuckDB over random inputs).

    Three streaming passes, none of which shuffles:
      1. (min, max, count) partial fold,
      2. fixed-width bucket histogram (per-batch ``np.bincount`` partials
         → tree fold; ≤ ``num_buckets`` rows ever reach the driver),
      3. a pruned re-read that keeps ONLY rows in the buckets containing
         the wanted ranks (bounded by the bucket populations).
    A bucket whose population exceeds ``max_collect`` recurses with a
    finer histogram restricted to that bucket's value range.
    """
    import math

    from .folds import tree_fold_tables

    def mmc_partial(b: pd.DataFrame) -> pd.DataFrame:
        v = b[column].to_numpy()
        if not len(v):
            return pd.DataFrame({"mn": [], "mx": [], "n": []}, dtype="int64")
        return pd.DataFrame(
            {"mn": [int(v.min())], "mx": [int(v.max())], "n": [len(v)]}
        )

    def mmc_combine(frames):
        df = pd.concat(frames, ignore_index=True)
        return pd.DataFrame(
            {"mn": [df.mn.min()], "mx": [df.mx.max()], "n": [df.n.sum()]}
        )

    mmc = tree_fold_tables(ds.map_batches(mmc_partial, batch_format="pandas"), mmc_combine)
    if mmc is None or not int(mmc.n.iloc[0]):
        return {q: None for q in qs}
    lo, hi, n = int(mmc.mn.iloc[0]), int(mmc.mx.iloc[0]), int(mmc.n.iloc[0])
    # recursion passes integer ranks directly — re-deriving them from a
    # float sub-quantile would risk an off-by-one at the ceil boundary
    ks = _ranks if _ranks is not None else {q: max(0, math.ceil(q * n) - 1) for q in qs}
    if lo == hi:
        return {q: lo for q in ks}

    width = max(1, -(-(hi - lo + 1) // num_buckets))

    # lo as a wrapped uint64: (uint64)v - (uint64)lo mod 2^64 equals the
    # true non-negative difference for any int64 pair with v >= lo — plain
    # int64 subtraction would overflow when the column spans >= 2^63
    # (e.g. signed views of 64-bit hashes)
    lo_u = np.uint64(lo % (1 << 64))
    width_u = np.uint64(width)

    def hist_partial(b: pd.DataFrame) -> pd.DataFrame:
        v = b[column].to_numpy()
        if not len(v):
            return pd.DataFrame({"bucket": [], "cnt": []}, dtype="int64")
        idx = ((v.astype(np.int64).view(np.uint64) - lo_u) // width_u).astype(np.int64)
        cnt = np.bincount(idx, minlength=0)
        nz = np.nonzero(cnt)[0]
        return pd.DataFrame({"bucket": nz.astype("int64"), "cnt": cnt[nz].astype("int64")})

    def hist_combine(frames):
        df = pd.concat(frames, ignore_index=True)
        return df.groupby("bucket", sort=True, as_index=False)["cnt"].sum()

    hist = tree_fold_tables(ds.map_batches(hist_partial, batch_format="pandas"), hist_combine)
    hist = hist.sort_values("bucket", ignore_index=True)
    cum = hist.cnt.cumsum().to_numpy()
    buckets = hist.bucket.to_numpy()

    out: dict = {}
    need: dict = {}  # bucket idx -> list of (q, local_rank)
    for q, k in ks.items():
        i = int(np.searchsorted(cum, k + 1))
        before = int(cum[i - 1]) if i else 0
        need.setdefault(int(buckets[i]), []).append((q, k - before))

    collect: dict = {}  # buckets whose rows we pull, resolved in ONE pass
    for b, wants in need.items():
        # clamp to hi so the filter literal stays inside int64 when the
        # value range nearly spans the full int64 domain
        b_lo, b_hi = lo + b * width, min(hi, lo + (b + 1) * width - 1)
        cnt_b = int(hist.cnt[hist.bucket == b].iloc[0])
        if b_lo == b_hi:
            # single-value bucket: the answer needs no collection at all
            # (a pathological hub value would otherwise pull cnt_b rows)
            for q, _ in wants:
                out[q] = b_lo
            continue
        if cnt_b > max_collect and width > 1 and _depth < 3:
            sub = ds.filter(expr=f"{column} >= {b_lo} and {column} <= {b_hi}")
            out.update(
                exact_quantiles(
                    sub, column, tuple(q for q, _ in wants),
                    num_buckets=num_buckets, max_collect=max_collect,
                    _depth=_depth + 1, _ranks={q: r for q, r in wants},
                )
            )
            continue
        collect[b] = (b_lo, b_hi, wants)
    if collect:
        # one pruned pass for ALL collected buckets (each filter would
        # otherwise re-execute the upstream pipeline per bucket)
        expr = " or ".join(
            f"({column} >= {blo} and {column} <= {bhi})"
            for blo, bhi, _ in collect.values()
        )
        sub = ds.filter(expr=expr)
        vals = np.sort(
            np.concatenate(
                [c[column] for c in sub.iter_batches(batch_format="numpy", batch_size=1 << 20)]
                or [np.empty(0, np.int64)]
            )
        )
        for b, (b_lo, b_hi, wants) in collect.items():
            in_b = vals[(vals >= b_lo) & (vals <= b_hi)]
            for q, r in wants:
                out[q] = int(in_b[r])
    return out


# --- HyperLogLog: mergeable distinct-count sketch --------------------------

HLL_P = 14  # 2^14 registers = 16 KiB/sketch, ~0.8% standard error


def hll_partial(values: np.ndarray, p: int = HLL_P) -> np.ndarray:
    """uint8 register array for one batch of values.

    Hash = pd.util.hash_array — deterministic across worker processes
    (unlike builtin hash). NOTE: only OBJECT (string) arrays go through
    its keyed SipHash; numeric arrays use pandas' unkeyed integer
    bit-mixer, so ``hash_key`` has no effect on the int64 path — do not
    build an "independent second hash" from it here (the bloom exchange
    does that trick on STRING keys only). Register j = top p bits;
    rho = 1 + leading zeros of the remaining (64-p) bits.
    """
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if not len(values):
        return regs
    h = pd.util.hash_array(np.asarray(values))
    j = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = h << np.uint64(p)  # remaining bits, left-aligned
    # leading zeros of a left-aligned uint64 via float64 exponent trick is
    # lossy; use a vectorized bit-scan: 64-p bits max
    rho = np.full(len(h), 64 - p + 1, dtype=np.uint8)
    nz = rest != 0
    r = rest[nz]
    # leading zeros via float64 log2 with exact off-by-one correction
    # (float rounding near powers of two can over/under-shoot by 1)
    msb_nz = np.int64(63) - (np.log2(r.astype(np.float64)).astype(np.int64))
    msb_nz = np.clip(msb_nz, 0, 63)
    cand = np.uint64(1) << np.uint64(63 - msb_nz)
    msb_nz = msb_nz + (cand > r).astype(np.int64)
    rho[nz] = (msb_nz + 1).astype(np.uint8)
    np.maximum.at(regs, j, rho)
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimator with linear-counting small-range correction.

    The harmonic sum is computed EXACTLY as the integer
    ``S = Σ 2^(R−rho)`` (R = max rho) and converted to float once —
    ``Σ 2^−rho = S / 2^R`` with a power-of-two divisor, so the only
    rounding is the single int→double conversion of S, identical in
    numpy and DuckDB. A float Σ of 2^−rho terms would be
    summation-ORDER-dependent once max rho exceeds ~39 (the 53-bit
    mantissa), which breaks the oracle hash at large cardinalities."""
    m = float(len(regs))
    p = int(len(regs)).bit_length() - 1
    R = 64 - p + 1  # max rho
    alpha = 0.7213 / (1 + 1.079 / m)
    counts = np.bincount(regs, minlength=R + 1)
    S = sum(int(c) << (R - r) for r, c in enumerate(counts))  # exact int
    denom = float(S) / float(1 << R)  # one rounding; 2^R divisor is exact
    est = alpha * m * m / denom
    zeros = int(np.sum(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting
    return float(est)


def approx_distinct(ds, column: str, *, p: int = HLL_P) -> float:
    """Distributed distinct-count estimate: per-batch registers → tree
    fold with elementwise max (associative+commutative) → one estimator
    call. 16 KiB crosses the wire per block regardless of cardinality."""
    from .folds import tree_fold_tables

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"regs": [hll_partial(b[column].to_numpy(), p).tobytes()]})

    def combine(frames):
        arrs = [
            np.frombuffer(r, dtype=np.uint8)
            for f in frames
            for r in f["regs"]
        ]
        return pd.DataFrame({"regs": [np.maximum.reduce(arrs).tobytes()]})

    folded = tree_fold_tables(ds.map_batches(partial, batch_format="pandas"), combine)
    if folded is None:
        return 0.0
    regs = np.maximum.reduce(
        [np.frombuffer(r, dtype=np.uint8) for r in folded["regs"]]
    )
    return hll_estimate(regs)


# --- KMV (k-minimum-values / bottom-k): mergeable distinct sketch ----------
# Unlike HLL the sketch state is EXACT integers (the k smallest distinct
# hash values under a fixed multiplicative hash), so the whole sketch —
# including its estimate — has a bit-identical SQL rendering and the
# oracle can hash-match it. Merge = union + re-take bottom-k (associative
# + commutative), the property that makes it a distributed sketch.

KMV_MULT = 2654435761  # Knuth multiplicative constant (shared with rel_sample)
KMV_MOD = 1 << 32
KMV_K = 1024


def kmv_partial(values: np.ndarray, k: int = KMV_K) -> np.ndarray:
    """Bottom-k distinct hashes of one batch of int64 keys (sorted asc)."""
    if not len(values):
        return np.empty(0, dtype=np.int64)
    hv = (values.astype(np.int64) * KMV_MULT) % KMV_MOD
    return np.unique(hv)[:k]  # unique sorts ascending


def kmv_merge(arrays, k: int = KMV_K) -> np.ndarray:
    """Union of bottom-k sets → bottom-k of the union."""
    arrays = [a for a in arrays if len(a)]
    if not arrays:
        return np.empty(0, dtype=np.int64)
    return np.unique(np.concatenate(arrays))[:k]


def kmv_estimate(bottom: np.ndarray, k: int = KMV_K) -> int:
    """(k-1) / kth-min-normalized — in INTEGER arithmetic so the SQL
    oracle reproduces it bit-for-bit: ``(k-1) * 2^32 // kth``. Fewer than
    k distinct hashes means the sketch IS the exact distinct set."""
    if len(bottom) < k:
        return int(len(bottom))
    return int((k - 1) * KMV_MOD // int(bottom[k - 1]))


def kmv_distinct(ds, column: str, *, k: int = KMV_K) -> pd.DataFrame:
    """Distributed KMV sketch: per-batch bottom-k partials (≤ k int64 per
    block regardless of cardinality) → tree-fold union-merge → one-row
    summary (k_used, kth_hash, est_distinct)."""
    from .folds import tree_fold_tables

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"hv": kmv_partial(b[column].to_numpy(), k)})

    def combine(frames):
        return pd.DataFrame(
            {"hv": kmv_merge([f["hv"].to_numpy() for f in frames], k)}
        )

    folded = tree_fold_tables(ds.map_batches(partial, batch_format="pandas"), combine)
    bottom = (
        kmv_merge([folded["hv"].to_numpy()], k)
        if folded is not None
        else np.empty(0, dtype=np.int64)
    )
    n = len(bottom)
    return pd.DataFrame(
        {
            "k_used": np.array([n], dtype="int64"),
            "kth_hash": np.array([int(bottom[-1]) if n else 0], dtype="int64"),
            "est_distinct": np.array([kmv_estimate(bottom, k)], dtype="int64"),
        }
    )


# --- Count-min sketch: mergeable frequency sketch --------------------------
# d pairwise-independent hash rows × w counters; per-batch partial
# sketches SUM (associative), so the fold ships d*w int64 per block no
# matter how many keys stream through. Point estimate = min over rows —
# an OVER-estimate only (collisions only add). The hash family is
# ((a_j * key + b_j) mod P) mod w with P = 2^31 - 1, so every step stays
# inside int64 in BOTH numpy and the SQL oracle (key < 2^31 ⇒ products
# < 2^62).

CMS_D = 4
CMS_W = 2048
CMS_P = 2147483647  # 2^31 - 1 (Mersenne prime)
CMS_A = (1103515245, 12345679, 766245317, 630360016)
CMS_B = (12345, 67890, 424242, 999983)


def cms_hash(keys: np.ndarray, j: int, w: int = CMS_W) -> np.ndarray:
    return ((keys.astype(np.int64) * CMS_A[j] + CMS_B[j]) % CMS_P) % w


def cms_partial(keys: np.ndarray, *, d: int = CMS_D, w: int = CMS_W) -> np.ndarray:
    """(d, w) int64 counter matrix for one batch of int64 keys."""
    m = np.zeros((d, w), dtype=np.int64)
    if len(keys):
        for j in range(d):
            m[j] = np.bincount(cms_hash(keys, j, w), minlength=w)
    return m


def cms_query(sketch: np.ndarray, keys: np.ndarray, *, w: int = CMS_W) -> np.ndarray:
    """Point estimates for int64 probe keys: min over the d rows."""
    ests = np.stack(
        [sketch[j, cms_hash(keys, j, w)] for j in range(sketch.shape[0])]
    )
    return ests.min(axis=0).astype(np.int64)


def cms_counts(ds, column: str, probe_keys, *, d: int = CMS_D, w: int = CMS_W) -> pd.DataFrame:
    """Distributed CMS build + point query: per-batch partial sketches →
    tree-fold elementwise sum (d·w·8 bytes per block) → driver probes the
    final (tiny) matrix for ``probe_keys``."""
    from .folds import tree_fold_tables

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"m": [cms_partial(b[column].to_numpy(), d=d, w=w).tobytes()]})

    def combine(frames):
        mats = [
            np.frombuffer(r, dtype=np.int64).reshape(d, w)
            for f in frames
            for r in f["m"]
        ]
        return pd.DataFrame({"m": [np.sum(mats, axis=0).tobytes()]})

    folded = tree_fold_tables(ds.map_batches(partial, batch_format="pandas"), combine)
    sketch = (
        np.sum(
            [np.frombuffer(r, dtype=np.int64).reshape(d, w) for r in folded["m"]],
            axis=0,
        )
        if folded is not None
        else np.zeros((d, w), dtype=np.int64)
    )
    keys = np.asarray(sorted(probe_keys), dtype=np.int64)
    return pd.DataFrame(
        {column: keys, "est_count": cms_query(sketch, keys, w=w)}
    ).astype({column: "int64", "est_count": "int64"})
