"""Driver-facing queries for training-data ops + relational engine showcase.

Float discipline for oracle-checkable results: aggregates over monetary
columns are emitted as int64 cents (``round(x*100)`` per row, then sum —
integer sums are associativity-independent, unlike double sums whose value
hash would depend on reduction order); similarities are quantized to
``floor(cos·10^6)`` int64.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..stages import dedup, multimodal, similarity, text
from ..sources import read_parquet_clean as _read_parquet_clean


# --- text analysis ---------------------------------------------------------

q_text_stats = text.text_stats
q_text_langid = text.text_langid
q_text_fingerprint = text.text_fingerprint
q_text_rolling_fp = text.text_rolling_fingerprint
q_text_tokens = text.text_tokens
q_text_quality = text.text_quality
q_text_dup_spans = text.text_dup_spans
q_text_pii = text.text_pii
q_text_vocab = text.text_vocab
q_text_top_terms = text.text_top_terms
q_text_tfidf = text.text_tfidf
q_text_naive_bayes = text.text_naive_bayes
q_text_lang_divergence = text.text_lang_divergence
q_text_vocab_richness = text.text_vocab_richness
q_text_collocations = text.text_collocations
q_text_compressibility = text.text_compressibility
q_text_boilerplate = text.text_boilerplate
q_text_nb_confusion = text.text_nb_confusion
q_text_mixture = text.text_mixture
q_text_decontaminate = text.text_decontaminate
q_text_unigram_logprob = text.text_unigram_logprob
q_text_readability = text.text_readability
q_text_dsir = text.text_dsir
q_text_shard_pack = text.text_shard_pack
q_text_repetition = text.text_repetition
q_text_curate = text.text_curate
q_text_inverted_index = text.text_inverted_index
q_text_search = text.text_search


# --- dedup -----------------------------------------------------------------

q_dedup_exact = dedup.dedup_exact_docs
q_dedup_minhash = dedup.dedup_minhash
q_dedup_simhash = dedup.dedup_simhash
q_dedup_embedding = dedup.dedup_embedding


def q_jaccard_pairs(sf_dir: str, *, tau: float = 0.8, chunk_rows: int = 16384):
    """Exact all-pairs word-set Jaccard ≥ tau (oracle-checkable ANCHOR).

    Probe-chunk plan (exact threshold joins are inherently O(n²) compute;
    driver memory stays O(chunk) + 8 bytes per doc id): the corpus is
    tokenized ONCE into a materialized (doc_id, token-hash blob) dataset;
    per chunk of ``chunk_rows`` ACTUAL doc ids (no contiguity assumed) the
    chunk's hash arrays are fetched and broadcast, and the tokenized
    corpus streams against them. A pair (a<b) is emitted only in the pass
    whose chunk contains ``a`` → passes are disjoint, their union exact.
    The LSH-candidate path (``dedup.ngram_jaccard_pairs``, exposed as
    ``jaccard_pairs_lsh``) is the linear-work scale plan for the same
    semantics.
    """
    import ray
    import ray.data

    docs = _read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def tokenize(b: pd.DataFrame) -> pd.DataFrame:
        hs = dedup._token_hashes(b["text"])
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].to_numpy().astype(np.int64),
                "hashes": [h.tobytes() for h in hs],
            }
        )

    # tokenize once (object store), not once per chunk pass; repartition so
    # the O(n²) probe stage parallelizes even when the source parquet is a
    # single row group (1 block = 1 task otherwise)
    n_docs = docs.count()  # parquet metadata, no scan
    n_blocks = int(np.clip(n_docs // 64, 1, 256))
    tok = (
        docs.map_batches(tokenize, batch_format="pandas")
        .repartition(n_blocks)
        .materialize()
    )

    def _hashes_for(wanted: np.ndarray) -> dict[int, np.ndarray]:
        w_ref = ray.put(np.asarray(wanted, dtype=np.int64))

        def fetch(b: pd.DataFrame, _w=w_ref) -> pd.DataFrame:
            w = ray.get(_w)
            return b[np.isin(b["doc_id"].to_numpy(), w)]

        out: dict[int, np.ndarray] = {}
        # iter_batches, NOT take_all (row-wise take of binary columns is
        # pathologically slow in Ray 2.49 — ~4.5 s for 5k tiny rows)
        for b in tok.map_batches(fetch, batch_format="pandas").iter_batches(
            batch_size=1 << 16, batch_format="pandas"
        ):
            for d, hb in zip(b["doc_id"], b["hashes"]):
                out[int(d)] = np.frombuffer(hb, dtype=np.uint64)
        return out

    id_batches = [
        b["doc_id"]
        for b in tok.select_columns(["doc_id"]).iter_batches(
            batch_format="numpy", batch_size=1 << 20
        )
    ]
    ids = np.sort(np.concatenate(id_batches)) if id_batches else np.empty(0, np.int64)

    out = None
    for lo in range(0, len(ids), chunk_rows):
        chunk_map = _hashes_for(ids[lo : lo + chunk_rows])
        c_ids = np.sort(np.fromiter(chunk_map.keys(), dtype=np.int64, count=len(chunk_map)))
        c_lens = np.fromiter(
            (len(chunk_map[int(i)]) for i in c_ids), dtype=np.int64, count=len(c_ids)
        )
        c_offs = np.concatenate(([0], np.cumsum(c_lens)))
        c_flat = (
            np.concatenate([chunk_map[int(i)] for i in c_ids])
            if len(c_ids)
            else np.empty(0, np.uint64)
        )
        # NB: bind the chunk's ref as a DEFAULT ARG — Ray Data plans execute
        # lazily, so a plain closure over the loop variable would serialize
        # every pass with the LAST chunk's broadcast.
        ref = ray.put((c_ids, c_offs, c_flat))

        def pairs(batch: pd.DataFrame, _ref=ref) -> pd.DataFrame:
            cids, coffs, cflat = ray.get(_ref)
            empty = pd.DataFrame(
                {c: pd.Series([], dtype="int64") for c in ("a", "b", "jacq")}
            )
            bh = [np.frombuffer(x, np.uint64) for x in batch["hashes"]]
            bids = batch["doc_id"].to_numpy().astype(np.int64)
            if not len(cids) or not len(bids):
                return empty
            b_lens = np.fromiter(map(len, bh), dtype=np.int64, count=len(bh))
            b_flat = np.concatenate(bh) if len(bh) else np.empty(0, np.uint64)
            vocab = np.unique(np.concatenate([cflat, b_flat]))
            if len(vocab) <= dedup._BITSET_MAX_BITS:
                # bitset cross product: intersection = AND + popcount per word
                b_offs = np.concatenate(([0], np.cumsum(b_lens)))
                cm = dedup._bitset_matrix(coffs, cflat, vocab)
                bm = dedup._bitset_matrix(b_offs, b_flat, vocab)
                outs = []
                step = max(1, (1 << 21) // len(bids))  # bound the slice matrix
                for s in range(0, len(cids), step):
                    e = min(s + step, len(cids))
                    inter = np.zeros((e - s, len(bids)), dtype=np.int64)
                    for w in range(cm.shape[1]):
                        inter += dedup._popcount_u64(
                            cm[s:e, w][:, None] & bm[:, w][None, :]
                        ).astype(np.int64)
                    # lens derived from the broadcast offsets — NOT the loop
                    # variable (closure would ship the last chunk's lens)
                    union = (coffs[s + 1 : e + 1] - coffs[s:e])[:, None] + b_lens[
                        None, :
                    ] - inter
                    jac = np.where(union > 0, inter / np.maximum(union, 1), 1.0)
                    valid = (cids[s:e][:, None] < bids[None, :]) & (jac >= tau)
                    ii, jj = np.nonzero(valid)
                    if len(ii):
                        outs.append(
                            pd.DataFrame(
                                {
                                    "a": cids[s:e][ii],
                                    "b": bids[jj],
                                    "jacq": (jac[ii, jj] * 1_000_000).astype("int64"),
                                }
                            )
                        )
                return (
                    pd.concat(outs, ignore_index=True).astype("int64") if outs else empty
                )
            # generic-vocab fallback: per-pair sorted-merge
            rows = []
            for j, b in enumerate(bids):
                hb = bh[j]
                for i, a in enumerate(cids):
                    if a >= b:
                        break  # cids sorted: chunk side is always the smaller id
                    jac = dedup.jaccard(cflat[coffs[i] : coffs[i + 1]], hb)
                    if jac >= tau:
                        rows.append((a, b, int(jac * 1_000_000)))
            return pd.DataFrame(rows, columns=["a", "b", "jacq"]).astype("int64")

        part = tok.map_batches(pairs, batch_format="pandas")
        out = part if out is None else out.union(part)
    return out


def q_jaccard_pairs_lsh(sf_dir: str):
    """LSH-candidate near-duplicate pairs — the scale plan for
    ``jaccard_pairs`` (precision 1.0 by exact verification; recall ≥ 0.8
    asserted in tests vs the exact anchor). Rows-only correctness check."""
    return dedup.ngram_jaccard_pairs(sf_dir, tau=0.8)


# --- similarity ------------------------------------------------------------

q_ann_topk = similarity.ann_topk
q_ann_filtered = similarity.ann_filtered
q_ann_lsh = similarity.ann_lsh
q_ann_ivf = similarity.ann_ivf
q_sim_threshold = similarity.sim_threshold_join
q_sim_threshold_lsh = similarity.sim_threshold_lsh
q_ann_knn_graph = similarity.ann_knn_graph


# --- multimodal ------------------------------------------------------------


def q_multimodal_dims(sf_dir: str):
    """Decoded payload dimensions (SQL-checkable projection of the stage)."""
    return multimodal.image_features(sf_dir).select_columns(["doc_id", "width", "height"])


def q_multimodal_resize(sf_dir: str):
    """Nearest-neighbor resize stage; dims + payload length are SQL-checkable
    (the binary payload itself is dropped from the driver-facing result)."""
    return multimodal.image_resize(sf_dir).drop_columns(["payload"])


def q_multimodal_frames(sf_dir: str):
    """Video frame-sampling fanout; (doc_id, frame_idx, n_frames, frame_bytes)
    are SQL-checkable via generate_series over the fake-codec formulas."""
    return multimodal.video_frame_sample(sf_dir).drop_columns(["payload"])


def q_multimodal_scene_cuts(sf_dir: str):
    """Shot-boundary census over the fake-video corpus (actor pool,
    exact-integer cut test — stages/multimodal.py::SceneCutDetector)."""
    return multimodal.video_scene_cuts(sf_dir)


def q_multimodal_curate(sf_dir: str):
    """Media-curation capstone (stages/multimodal.py::media_curate —
    phash-dup + static-video + silent-audio gates composed into one
    keep decision per doc)."""
    return multimodal.media_curate(sf_dir)


def q_multimodal_vad(sf_dir: str):
    """Voice-activity segment census over the fake-audio corpus
    (stages/multimodal.py::VoiceActivityDetector — integer energy gate +
    run-length reduction)."""
    return multimodal.audio_vad(sf_dir)


def q_multimodal_audio(sf_dir: str):
    """Audio meta projection (sample rate / sample count / duration /
    window count — SQL-checkable doc_id formulas; the RMS energy vector
    itself is kernel-tested in pytest)."""
    return multimodal.audio_features(sf_dir).drop_columns(["energy"])


def q_multimodal_features(sf_dir: str):
    """Featurize output in the hash-checkable long format: the RAW
    integer 16-bin byte histogram, one row per (doc, bin) — graduated
    from rows-only (the float32 normalized vector has no stable SQL
    rendering; its integer numerators do, and the DuckDB oracle
    recomputes them from the sha256 tiling weights)."""
    import pyarrow as pa

    ds = multimodal.image_features(sf_dir)

    def explode(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        counts = np.array(
            [c for c in batch["counts"].to_pylist()], dtype=np.int64
        ).reshape(n, 16)
        return pa.table(
            {
                "doc_id": pa.array(
                    np.repeat(batch["doc_id"].to_numpy(), 16), pa.int64()
                ),
                "width": pa.array(
                    np.repeat(batch["width"].to_numpy(), 16), pa.int32()
                ),
                "height": pa.array(
                    np.repeat(batch["height"].to_numpy(), 16), pa.int32()
                ),
                "bin": pa.array(np.tile(np.arange(16), n), pa.int64()),
                "n": pa.array(counts.reshape(-1), pa.int64()),
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow")


# --- relational engine showcase (core Dataset operators) -------------------


def q_rel_lineitem_agg(sf_dir: str):
    """TPC-H Q1-shaped aggregate: per-batch partial sums (int cents) → tiny
    groupby. Demonstrates partial pre-aggregation before the shuffle."""
    import ray.data

    ds = _read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"],
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.assign(
            qty=batch["l_quantity"].round().astype("int64"),
            price_cents=(batch["l_extendedprice"] * 100).round().astype("int64"),
            n=1,
        )
        g = (
            batch.groupby(["l_returnflag", "l_linestatus"], sort=False)
            .agg(sum_qty=("qty", "sum"), sum_price_cents=("price_cents", "sum"), n=("n", "sum"))
            .reset_index()
        )
        return g

    from ray.data.aggregate import Sum

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("sum_price_cents", alias_name="sum_price_cents"),
            Sum("n", alias_name="n"),
        )
    )


def q_rel_join_revenue(sf_dir: str):
    """Revenue per nation: broadcast hash join (small dims via ray.put) +
    partial aggregation — the map-side-join pattern for star schemas."""
    import ray
    import ray.data

    cust = _read_parquet_clean(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).to_pandas()
    nation = _read_parquet_clean(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    cust_nation = cust.merge(
        nation, left_on="c_nationkey", right_on="n_nationkey"
    ).set_index("c_custkey")["n_name"]
    ref = ray.put(cust_nation)

    orders = _read_parquet_clean(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        cn = ray.get(ref)
        n_name = batch["o_custkey"].map(cn)
        cents = (batch["o_totalprice"] * 100).round().astype("int64")
        g = (
            pd.DataFrame({"n_name": n_name, "revenue_cents": cents, "n_orders": 1})
            .groupby("n_name", sort=False)
            .sum()
            .reset_index()
        )
        return g

    from ray.data.aggregate import Sum

    return (
        orders.map_batches(partial, batch_format="pandas")
        .groupby("n_name")
        .aggregate(
            Sum("revenue_cents", alias_name="revenue_cents"),
            Sum("n_orders", alias_name="n_orders"),
        )
    )


def q_rel_events_window(sf_dir: str):
    """Tumbling 1-hour window per user: event count + value cents sum.

    Windowing = key-partitioned grouped aggregate on (user, floor(ts)) —
    partials per batch, tiny groupby after."""
    import ray.data

    ds = _read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        # epoch-seconds int64 window key: portable across engines (pandas
        # ns vs DuckDB us timestamp units hash differently)
        w = (batch["ts"].dt.floor("h").astype("datetime64[s]").astype("int64"))
        cents = (batch["value"] * 100).round().astype("int64")
        g = (
            pd.DataFrame({"user_id": batch["user_id"], "window_start": w,
                          "value_cents": cents, "n_events": 1})
            .groupby(["user_id", "window_start"], sort=False)
            .sum()
            .reset_index()
        )
        return g

    # wide step: coarse hash partition on user_id (all of a user's windows
    # co-locate) + vectorized per-partition groupby-sum — Ray 2.49's
    # multi-key groupby.aggregate degrades badly at ~100k groups and hangs
    # in the millions (BASELINE.md), so the shuffle key is a single int.
    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_part"] = (pd.util.hash_array(df["user_id"].to_numpy()) % 32).astype(
            "int64"
        )
        return df

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.groupby(["user_id", "window_start"], sort=False, as_index=False)[
                ["value_cents", "n_events"]
            ].sum()
        )

    return (
        ds.map_batches(partial, batch_format="pandas")
        .map_batches(add_part, batch_format="pandas")
        .groupby("_part")
        .map_groups(finish, batch_format="pandas")
    )


def q_rel_quantiles(sf_dir: str):
    """Exact p50/p95/p99 of lineitem price cents WITHOUT a global sort:
    histogram selection (``skew.exact_quantiles``) — 3 streaming passes,
    no shuffle, matching DuckDB ``quantile_disc`` exactly."""
    from ..stages.skew import exact_quantiles

    li = _read_parquet_clean(
        f"{sf_dir}/lineitem.parquet", columns=["l_extendedprice"]
    )

    def cents(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"c": (b["l_extendedprice"] * 100).round().astype("int64")}
        )

    qv = exact_quantiles(li.map_batches(cents, batch_format="pandas"), "c", (0.5, 0.95, 0.99))
    return pd.DataFrame({"p50": [qv[0.5]], "p95": [qv[0.95]], "p99": [qv[0.99]]})


def q_rel_approx_distinct(sf_dir: str):
    """HyperLogLog distinct-order estimate (rows-only: the sketch is
    deterministic but not SQL-reproducible; tests bound its error vs the
    exact count at <2%)."""
    from ..stages.skew import approx_distinct

    li = _read_parquet_clean(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey"])
    est = approx_distinct(li, "l_orderkey")
    return pd.DataFrame({"approx_distinct_orders": [int(round(est))]})


def q_rel_topk_parts(sf_dir: str):
    """Top-10 parts by retail price (sort + limit), price as cents."""
    import ray.data

    ds = _read_parquet_clean(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name", "p_retailprice"]
    )

    def cents(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "p_partkey": batch["p_partkey"],
                "p_name": batch["p_name"],
                "price_cents": (batch["p_retailprice"] * 100).round().astype("int64"),
            }
        )

    out = ds.map_batches(cents, batch_format="pandas").sort(
        ["price_cents", "p_partkey"], descending=[True, False]
    )
    return out.limit(10)


def q_rel_heavy_hitters(sf_dir: str, *, k: int = 10):
    """Top-k most-ORDERED parts (frequency heavy hitters), exact.

    Partial value_counts inside map_batches bound each key's shuffle
    volume at #batches rows no matter how hot the key is (the
    partial-combine discipline); the tree fold then sums ≤ #batches
    small frames and the driver keeps only the top k. Ties break on the
    smaller partkey (mirrored in the oracle) so output is deterministic.
    """
    from ..stages.folds import tree_fold_tables

    ds = _read_parquet_clean(f"{sf_dir}/lineitem.parquet", columns=["l_partkey"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        vc = b["l_partkey"].value_counts()
        return pd.DataFrame(
            {"l_partkey": vc.index.astype("int64"), "n_orders": vc.to_numpy().astype("int64")}
        )

    def combine(frames):
        df = pd.concat(frames, ignore_index=True)
        return df.groupby("l_partkey", sort=False, as_index=False)["n_orders"].sum()

    folded = tree_fold_tables(ds.map_batches(partial, batch_format="pandas"), combine)
    if folded is None:
        return pd.DataFrame({"l_partkey": [], "n_orders": []}, dtype="int64")
    out = folded.sort_values(
        ["n_orders", "l_partkey"], ascending=[False, True], ignore_index=True
    ).head(k)
    return out.astype({"l_partkey": "int64", "n_orders": "int64"})


def q_rel_distinct_segments(sf_dir: str):
    """Distinct values of one column (the `unique` operator — a shuffle)."""
    import ray.data

    ds = _read_parquet_clean(f"{sf_dir}/customer.parquet", columns=["c_mktsegment"])
    vals = sorted(ds.unique("c_mktsegment"))
    return pd.DataFrame({"c_mktsegment": vals})


def q_rel_mode(sf_dir: str):
    """Per-segment modal order priority (ties → lexicographically
    smallest) — the MODE aggregate via associative (segment, priority)
    count partials: one small fold (domain ≤ segments × priorities), the
    argmax happens on the fold result. Joins orders→customer segment via
    the broadcast-dim pattern of rel_join_revenue."""
    import ray

    from ..stages.folds import tree_fold_tables

    cust = _read_parquet_clean(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    ).to_pandas()
    seg_ref = ray.put(dict(zip(cust["c_custkey"], cust["c_mktsegment"])))
    ds = _read_parquet_clean(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderpriority"]
    )

    def partial(b: pd.DataFrame, _s=seg_ref) -> pd.DataFrame:
        seg = b["o_custkey"].map(ray.get(_s))
        return (
            pd.DataFrame({"c_mktsegment": seg, "o_orderpriority": b["o_orderpriority"]})
            .groupby(["c_mktsegment", "o_orderpriority"], sort=False)
            .size()
            .reset_index(name="n")
        )

    def combine(frames):
        df = pd.concat(frames, ignore_index=True)
        return df.groupby(
            ["c_mktsegment", "o_orderpriority"], sort=False, as_index=False
        )["n"].sum()

    folded = tree_fold_tables(ds.map_batches(partial, batch_format="pandas"), combine)
    if folded is None or not len(folded):
        return pd.DataFrame(
            {"c_mktsegment": pd.Series([], dtype=object),
             "mode_priority": pd.Series([], dtype=object),
             "n": pd.Series([], dtype="int64")}
        )
    out = (
        folded.sort_values(
            ["c_mktsegment", "n", "o_orderpriority"], ascending=[True, False, True]
        )
        .groupby("c_mktsegment", as_index=False)
        .first()
        .rename(columns={"o_orderpriority": "mode_priority"})
    )
    return out[["c_mktsegment", "mode_priority", "n"]].astype({"n": "int64"})


def q_rel_rank_window(sf_dir: str, *, top_k: int = 3):
    """Top-k orders per customer segment by total price with their exact
    integer rank — the ranking-window operator (row_number over a
    partition) as ONE segment-hash exchange + per-partition vectorized
    sort/rank; ties broken by orderkey so the rank is total and
    hash-comparable. Only k × segments rows leave the shuffle."""
    import numpy as np
    import ray

    cust = _read_parquet_clean(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    ).to_pandas()
    seg_ref = ray.put(dict(zip(cust["c_custkey"], cust["c_mktsegment"])))
    ds = _read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    )

    def tag(b: pd.DataFrame, _s=seg_ref) -> pd.DataFrame:
        seg = b["o_custkey"].map(ray.get(_s)).astype(object)
        cents = (b["o_totalprice"] * 100).round().astype("int64")
        out = pd.DataFrame(
            {"c_mktsegment": seg, "o_orderkey": b["o_orderkey"], "cents": cents}
        )
        # partial top-k per batch: only k rows per (batch, segment) shuffle
        out = out.sort_values(["c_mktsegment", "cents", "o_orderkey"],
                              ascending=[True, False, True])
        out = out.groupby("c_mktsegment").head(top_k)
        out["_part"] = pd.util.hash_array(out["c_mktsegment"].to_numpy(dtype=object)) % 16
        return out

    def rank_part(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame(
                {"c_mktsegment": pd.Series([], dtype=object),
                 "rank": pd.Series([], dtype="int64"),
                 "o_orderkey": pd.Series([], dtype="int64"),
                 "cents": pd.Series([], dtype="int64")}
            )
        g = g.sort_values(["c_mktsegment", "cents", "o_orderkey"],
                          ascending=[True, False, True])
        g["rank"] = (g.groupby("c_mktsegment").cumcount() + 1).astype("int64")
        g = g[g["rank"] <= top_k]
        return g[["c_mktsegment", "rank", "o_orderkey", "cents"]].astype(
            {"o_orderkey": "int64", "cents": "int64"}
        )

    return (
        ds.map_batches(tag, batch_format="pandas")
        .groupby("_part")
        .map_groups(rank_part, batch_format="pandas")
    )


def q_rel_shuffle_join(sf_dir: str, *, num_partitions: int = 32):
    """Revenue per order priority via a BIG-both-sides hash join —
    lineitem ⋈ orders on orderkey where neither side is broadcastable
    (the complement of ``rel_join_revenue``'s map-side broadcast join).

    Plan: tag both inputs to ONE shared schema (k, cents, pri, side),
    union the streams, hash-partition on the single int ``_part`` key
    (``Dataset.join`` is broken at ≥8 partitions on Ray 2.49 — BASELINE;
    the union+groupby exchange uses only primitives proven here), then
    per partition: vectorized pandas merge + PARTIAL aggregation by
    priority — so the second shuffle moves ≤ #partitions × #priorities
    rows. Co-partitioning is exact because both sides hash the same key.
    """
    from ray.data.aggregate import Sum

    li = _read_parquet_clean(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_extendedprice"]
    )
    orders = _read_parquet_clean(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    )

    def part_of(keys: np.ndarray) -> np.ndarray:
        return (pd.util.hash_array(keys.astype(np.int64)) % num_partitions).astype(
            "int64"
        )

    def tag_li(b: pd.DataFrame) -> pd.DataFrame:
        k = b["l_orderkey"].to_numpy().astype(np.int64)
        return pd.DataFrame(
            {
                "k": k,
                "cents": (b["l_extendedprice"] * 100).round().astype("int64"),
                "pri": pd.Series([None] * len(b), dtype="string"),
                "_part": part_of(k),
            }
        )

    def tag_orders(b: pd.DataFrame) -> pd.DataFrame:
        k = b["o_orderkey"].to_numpy().astype(np.int64)
        return pd.DataFrame(
            {
                "k": k,
                "cents": np.full(len(b), -1, dtype=np.int64),  # sentinel: dim row
                "pri": b["o_orderpriority"].astype("string"),
                "_part": part_of(k),
            }
        )

    both = li.map_batches(tag_li, batch_format="pandas").union(
        orders.map_batches(tag_orders, batch_format="pandas")
    )

    def join_part(g: pd.DataFrame) -> pd.DataFrame:
        dim = g[g["pri"].notna()][["k", "pri"]]
        fact = g[g["pri"].isna()][["k", "cents"]]
        j = fact.merge(dim, on="k")
        out = (
            j.assign(n_lineitems=1)
            .groupby("pri", sort=False)
            .agg(revenue_cents=("cents", "sum"), n_lineitems=("n_lineitems", "sum"))
            .reset_index()
            .rename(columns={"pri": "o_orderpriority"})
        )
        out["o_orderpriority"] = out["o_orderpriority"].astype(object)
        return out.astype({"revenue_cents": "int64", "n_lineitems": "int64"})

    return (
        both.groupby("_part")
        .map_groups(join_part, batch_format="pandas")
        .groupby("o_orderpriority")
        .aggregate(
            Sum("revenue_cents", alias_name="revenue_cents"),
            Sum("n_lineitems", alias_name="n_lineitems"),
        )
    )


def q_rel_anomalies(sf_dir: str):
    """Per-user outlier windows: hourly value sums whose z-score vs the
    user's own window distribution exceeds 3 — the monitoring primitive,
    in EXACT integer algebra so the oracle hash-matches:

        |x − S/n| > 3σ  ⇔  (n·x − S)² > 9·(n·Q − S²)

    with S = Σx, Q = Σx² over the user's windows (population variance),
    no float thresholds anywhere. Plan: per-batch window partials →
    ONE user-hash exchange → per-partition window sums + per-user
    (n, S, Q) + the integer flag, all vectorized.
    """
    ds = _read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"]
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        w = b["ts"].dt.floor("h").astype("datetime64[s]").astype("int64")
        cents = (b["value"] * 100).round().astype("int64")
        g = (
            pd.DataFrame({"user_id": b["user_id"], "window_start": w, "value_cents": cents})
            .groupby(["user_id", "window_start"], sort=False, as_index=False)["value_cents"]
            .sum()
        )
        g["_part"] = (pd.util.hash_array(g["user_id"].to_numpy()) % 32).astype("int64")
        return g

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        w = g.groupby(["user_id", "window_start"], sort=False, as_index=False)[
            "value_cents"
        ].sum()
        st = w.groupby("user_id", sort=False).agg(
            n=("value_cents", "size"), S=("value_cents", "sum")
        )
        st["Q"] = w.assign(sq=w["value_cents"] ** 2).groupby("user_id", sort=False)[
            "sq"
        ].sum()
        m = w.merge(st, on="user_id")
        lhs = (m["n"] * m["value_cents"] - m["S"]) ** 2
        rhs = 9 * (m["n"] * m["Q"] - m["S"] ** 2)
        out = m[(m["n"] >= 2) & (lhs > rhs)][["user_id", "window_start", "value_cents"]]
        return out.astype("int64")

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("_part")
        .map_groups(finish, batch_format="pandas")
    )


def q_rel_rollup(sf_dir: str):
    """ROLLUP-style multi-level aggregate: revenue by (returnflag,
    linestatus), by returnflag, and grand total in ONE result — computed
    as a single partial-aggregation pass whose finest-level partials are
    re-aggregated driver-side for the coarser levels (the partials are
    associative sums, so coarse levels cost nothing extra — no second
    scan, no extra shuffle). NULL level keys render as '' to keep the
    value-hash engine-portable.
    """
    from ..stages.folds import tree_fold_tables

    ds = _read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_extendedprice"],
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = (
            b.assign(price_cents=(b["l_extendedprice"] * 100).round().astype("int64"), n=1)
            .groupby(["l_returnflag", "l_linestatus"], sort=False)
            .agg(price_cents=("price_cents", "sum"), n=("n", "sum"))
            .reset_index()
        )
        return g

    def combine(frames):
        df = pd.concat(frames, ignore_index=True)
        return df.groupby(["l_returnflag", "l_linestatus"], sort=False, as_index=False)[
            ["price_cents", "n"]
        ].sum()

    fine = tree_fold_tables(ds.map_batches(partial, batch_format="pandas"), combine)
    if fine is None:
        fine = pd.DataFrame(
            {"l_returnflag": [], "l_linestatus": [], "price_cents": [], "n": []}
        )
    mid = (
        fine.groupby("l_returnflag", as_index=False)[["price_cents", "n"]]
        .sum()
        .assign(l_linestatus="")
    )
    top = pd.DataFrame(
        {
            "l_returnflag": [""],
            "l_linestatus": [""],
            "price_cents": [fine["price_cents"].sum()],
            "n": [fine["n"].sum()],
        }
    )
    out = pd.concat([fine, mid, top], ignore_index=True)
    return out.sort_values(
        ["l_returnflag", "l_linestatus"], ignore_index=True
    ).astype({"price_cents": "int64", "n": "int64"})


def q_rel_pivot(sf_dir: str):
    """PIVOT / crosstab: revenue cents and row counts by returnflag
    (rows) × linestatus (columns, fixed domain {F, O}) — the wide-format
    report shape. One partial-aggregation pass (same fold discipline as
    q_rel_rollup); the long→wide reshape happens on the ≤|domain|² fold
    result, never on the raw stream. Fixed column domain keeps the output
    schema static — a dynamic-domain pivot would need a domain-census
    pass first (the distinct-segments query is that primitive).
    """
    from ..stages.folds import tree_fold_tables

    ds = _read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_extendedprice"],
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return (
            b.assign(cents=(b["l_extendedprice"] * 100).round().astype("int64"), n=1)
            .groupby(["l_returnflag", "l_linestatus"], sort=False)
            .agg(cents=("cents", "sum"), n=("n", "sum"))
            .reset_index()
        )

    def combine(frames):
        df = pd.concat(frames, ignore_index=True)
        return df.groupby(
            ["l_returnflag", "l_linestatus"], sort=False, as_index=False
        )[["cents", "n"]].sum()

    fine = tree_fold_tables(ds.map_batches(partial, batch_format="pandas"), combine)
    flags = sorted(fine["l_returnflag"].unique()) if fine is not None else []
    rows = []
    for f in flags:
        sub = fine[fine["l_returnflag"] == f].set_index("l_linestatus")
        rows.append(
            {
                "l_returnflag": f,
                "f_cents": int(sub["cents"].get("F", 0)),
                "f_n": int(sub["n"].get("F", 0)),
                "o_cents": int(sub["cents"].get("O", 0)),
                "o_n": int(sub["n"].get("O", 0)),
            }
        )
    return pd.DataFrame(
        rows, columns=["l_returnflag", "f_cents", "f_n", "o_cents", "o_n"]
    ).astype({c: "int64" for c in ["f_cents", "f_n", "o_cents", "o_n"]})


def q_rel_group_quantiles(sf_dir: str, *, qs=(0.5, 0.95)):
    """Exact per-user p50/p95 of event value cents.

    Grouped quantiles can't use partial combine (quantiles don't compose),
    so the plan co-locates each user's rows with ONE single-int-key hash
    exchange (the proven shuffle primitive here — multi-key groupby
    hazard, BASELINE.md), then picks ranks vectorized per partition: one
    sort of the partition + ``np.unique`` group offsets + ceil-rank
    gather, no per-group Python. Convention = DuckDB ``quantile_disc``
    (0-based index ``ceil(q·n)−1``), same as ``skew.exact_quantiles``.
    """
    ds = _read_parquet_clean(f"{sf_dir}/events.parquet", columns=["user_id", "value"])

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": b["user_id"].astype("int64"),
                "cents": (b["value"] * 100).round().astype("int64"),
                "_part": (pd.util.hash_array(b["user_id"].to_numpy()) % 32).astype(
                    "int64"
                ),
            }
        )

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        df = g.sort_values(["user_id", "cents"], ignore_index=True)
        users, offs = np.unique(df["user_id"].to_numpy(), return_index=True)
        cnts = np.diff(np.append(offs, len(df)))
        vals = df["cents"].to_numpy()
        out = {"user_id": users.astype("int64")}
        for q in qs:
            idx = offs + np.maximum(np.ceil(q * cnts).astype(np.int64) - 1, 0)
            out[f"p{int(q * 100)}_cents"] = vals[idx]
        return pd.DataFrame(out)

    return (
        ds.map_batches(prep, batch_format="pandas")
        .groupby("_part")
        .map_groups(finish, batch_format="pandas")
    )


STRAT_K = 10


def q_rel_stratified_sample(sf_dir: str, *, k: int = STRAT_K):
    """Deterministic stratified sample: the k customers with the smallest
    multiplicative hash PER market segment (per-stratum quota sampling —
    the balanced-subset primitive for eval sets).

    Per-batch top-k partials (each batch contributes ≤ k rows per
    segment) → tree-fold re-selection — shuffle-free, and the same rows
    win under any partitioning because the (hash, key) order is total.
    """
    from ..stages.folds import tree_fold_tables

    ds = _read_parquet_clean(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values(["c_mktsegment", "sample_hash", "c_custkey"])
            .groupby("c_mktsegment", sort=False)
            .head(k)
        )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        key = b["c_custkey"].to_numpy().astype(np.uint64)
        h = (key * np.uint64(SAMPLE_MULT)) % np.uint64(SAMPLE_MOD)
        return topk(
            pd.DataFrame(
                {
                    "c_mktsegment": b["c_mktsegment"],
                    "c_custkey": b["c_custkey"].astype("int64"),
                    "sample_hash": h.astype("int64"),
                }
            )
        )

    def combine(frames):
        return topk(pd.concat(frames, ignore_index=True))

    folded = tree_fold_tables(ds.map_batches(partial, batch_format="pandas"), combine)
    if folded is None:
        return pd.DataFrame(
            {
                "c_mktsegment": pd.Series([], dtype=object),
                "c_custkey": pd.Series([], dtype="int64"),
                "sample_hash": pd.Series([], dtype="int64"),
            }
        )
    return folded.sort_values(
        ["c_mktsegment", "c_custkey"], ignore_index=True
    )


SAMPLE_MULT = 2654435761  # Knuth multiplicative hash constant
SAMPLE_MOD = 1 << 32
SAMPLE_RATE_NUM = SAMPLE_MOD // 10  # 10% Bernoulli


def q_rel_sample(sf_dir: str):
    """Deterministic 10% Bernoulli sample of orders via a multiplicative
    integer hash — the reproducible-sampling primitive a training-data
    pipeline needs (eval holdouts, ablation subsets): the same row is
    in/out of the sample on every run, every engine, any partitioning.

    ``keep ⇔ (key * 2654435761) mod 2^32 < rate·2^32`` — pure int64
    arithmetic, so the DuckDB oracle reproduces it bit-for-bit (no RNG,
    no float). Stateless map_batches filter → shards trivially. (Keys
    here are < 2^31 so the signed-SQL and uint64-numpy products agree;
    a 64-bit-key corpus would use the same formula mod 2^61-1.)
    """
    ds = _read_parquet_clean(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    )

    def pick(b: pd.DataFrame) -> pd.DataFrame:
        k = b["o_orderkey"].to_numpy().astype(np.uint64)
        h = (k * np.uint64(SAMPLE_MULT)) % np.uint64(SAMPLE_MOD)
        m = h < np.uint64(SAMPLE_RATE_NUM)
        return pd.DataFrame(
            {
                "o_orderkey": b["o_orderkey"].to_numpy()[m].astype("int64"),
                "price_cents": (b["o_totalprice"].to_numpy()[m] * 100)
                .round()
                .astype("int64"),
                "sample_hash": h[m].astype("int64"),
            }
        )

    return ds.map_batches(pick, batch_format="pandas")


def q_rel_lead_lag(sf_dir: str):
    """Per-user LEAD/LAG inter-event gaps in exact integer microseconds —
    the offset-window primitive (the sessions query consumes gaps; this
    EXPOSES them). One user-hash exchange; per-group ts sort + int64
    shift; boundary rows get -1 (not NULL) so the value-hash is
    engine-portable."""

    ds = _read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )

    def gaps(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["ts", "event_id"], ignore_index=True)
        us = g["ts"].astype("int64")
        prev = us.diff().fillna(-1).astype("int64")
        nxt = (-us.diff(-1)).fillna(-1).astype("int64")
        return pd.DataFrame(
            {
                "event_id": g["event_id"].astype("int64"),
                "user_id": g["user_id"].astype("int64"),
                "prev_gap_us": prev,
                "next_gap_us": nxt,
            }
        )

    return ds.groupby("user_id").map_groups(gaps, batch_format="pandas")


def q_rel_sessions(sf_dir: str, *, gap_minutes: int = 30):
    """Session windows per user (gaps-and-islands): events within
    ``gap_minutes`` of the previous event share a session.

    The stream-shaped pattern: ``groupby(key).map_groups`` over the
    ts-sorted group — per-key stateful windowing with pandas inside the
    group (Ray Data has no event-time watermarks; the ordering assumption
    is per-key sort within the group)."""
    import ray.data

    ds = _read_parquet_clean(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def sessionize(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("ts")
        gap = g["ts"].diff() > pd.Timedelta(minutes=gap_minutes)
        sid = gap.cumsum()
        out = (
            g.assign(_sid=sid)
            .groupby("_sid")
            .agg(
                user_id=("user_id", "first"),
                session_start=("ts", "min"),
                n_events=("ts", "size"),
            )
            .reset_index(drop=True)
        )
        out["session_start"] = (
            out["session_start"].astype("datetime64[s]").astype("int64")
        )
        out["n_events"] = out["n_events"].astype("int64")
        return out[["user_id", "session_start", "n_events"]]

    return ds.groupby("user_id").map_groups(sessionize, batch_format="pandas")


def q_rel_coverage(sf_dir: str, *, window_s: int = 300):
    """Interval-union coverage per user: each event opens a
    ``[ts, ts+window)`` activity interval; report the user's TOTAL
    covered seconds after merging overlaps (the billing / uptime /
    engagement-minutes op — naive Σ window over-counts overlaps).

    One user-hash exchange; merging is the gaps-and-islands cummax trick
    on the ts-sorted group (an interval starts a new island when its
    start exceeds the running max end), all exact integer seconds."""
    ds = _read_parquet_clean(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def cover(group: pd.DataFrame) -> pd.DataFrame:
        ts = np.sort(
            group["ts"].astype("datetime64[s]").astype("int64").to_numpy()
        )
        start, end = ts, ts + window_s
        run_end = np.maximum.accumulate(end)
        new_island = np.ones(len(ts), dtype=bool)
        new_island[1:] = start[1:] > run_end[:-1]
        island = np.cumsum(new_island) - 1
        first = np.flatnonzero(new_island)
        last_end = np.maximum.reduceat(end, first)
        covered = int((last_end - start[first]).sum())
        return pd.DataFrame(
            {"user_id": [int(group["user_id"].iloc[0])],
             "covered_s": [covered],
             "n_intervals": [int(island[-1]) + 1],
             "n_events": [len(ts)]}
        ).astype("int64")

    return ds.groupby("user_id").map_groups(cover, batch_format="pandas")


def q_rel_latest(sf_dir: str):
    """CDC keep-latest dedup: the most recent event per (user, type) by
    (ts, event_id) — the snapshot-compaction op of a change-data stream
    (distinct from the tumbling-window dedup: exactly ONE survivor per
    key, however old). One user-hash exchange, vectorized tail-of-sorted
    per group."""
    ds = _read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type", "value"],
    )

    def latest(group: pd.DataFrame) -> pd.DataFrame:
        g = group.copy()
        # order on TRUNCATED seconds + event_id — the oracle's total order
        # (full-precision ts would break ties differently within a second)
        g["ts_s"] = g["ts"].astype("datetime64[s]").astype("int64")
        g = g.sort_values(["event_type", "ts_s", "event_id"], ignore_index=True)
        top = g.groupby("event_type", sort=False).tail(1)
        return pd.DataFrame(
            {"user_id": top["user_id"].astype("int64"),
             "event_type": top["event_type"].astype(object),
             "event_id": top["event_id"].astype("int64"),
             "ts_s": top["ts_s"].astype("int64"),
             "value_cents": (top["value"] * 100).round().astype("int64")}
        ).reset_index(drop=True)

    return ds.groupby("user_id").map_groups(latest, batch_format="pandas")


def q_rel_calendar_profile(sf_dir: str):
    """Day-of-week × hour-of-day activity profile (the ops-dashboard
    heatmap): event count and revenue cents per (dow, hour) cell — one
    constant-domain (≤168 cells) tree-fold of per-batch censuses.
    ISO dow (Mon=1..Sun=7) shared with the oracle."""
    from ..stages.folds import tree_fold_tables

    ds = _read_parquet_clean(f"{sf_dir}/events.parquet", columns=["ts", "value"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        ts = pd.to_datetime(b["ts"])
        return (
            pd.DataFrame(
                {"dow": (ts.dt.dayofweek + 1).astype("int64"),  # ISO Mon=1
                 "hour": ts.dt.hour.astype("int64"),
                 "n": 1,
                 "cents": (b["value"] * 100).round().astype("int64")}
            )
            .groupby(["dow", "hour"], sort=False)
            .sum()
            .reset_index()
        )

    def combine(frames):
        df = pd.concat(frames, ignore_index=True)
        return df.groupby(["dow", "hour"], sort=False, as_index=False)[
            ["n", "cents"]
        ].sum()

    folded = tree_fold_tables(ds.map_batches(partial, batch_format="pandas"), combine)
    cols = ["dow", "hour", "n", "cents"]
    if folded is None or not len(folded):
        return pd.DataFrame({c: pd.Series([], dtype="int64") for c in cols})
    return (
        folded[cols].sort_values(["dow", "hour"], ignore_index=True).astype("int64")
    )


def q_rel_cusum(sf_dir: str):
    """CUSUM change-point detection per user: the event-time position
    where the cumulative deviation from the GLOBAL mean value peaks —
    the drift/regression detector of a metrics pipeline.

    Two passes: a (Σ, n) global-moment fold fixes the scaled mean
    ``mean_s = (10⁶·Σcents)//N`` ONCE as an exact integer, then one
    user-hash exchange computes each user's integer cusum walk
    ``s_i = Σ(10⁶·cents_j − mean_s)`` and reports argmax |s_i|
    (ties → earliest). Everything int64-exact, shared with the
    window-function oracle."""
    from ..stages.folds import tree_fold_tables

    ds = _read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "value"]
    )

    def mpart(b: pd.DataFrame) -> pd.DataFrame:
        cents = (b["value"] * 100).round().astype("int64")
        return pd.DataFrame({"s": [int(cents.sum())], "n": [len(b)]})

    def mcombine(frames):
        df = pd.concat(frames, ignore_index=True)
        return pd.DataFrame({"s": [int(df["s"].map(int).sum())],
                             "n": [int(df["n"].sum())]})

    m = tree_fold_tables(ds.map_batches(mpart, batch_format="pandas"), mcombine)
    empty = pd.DataFrame(
        {"user_id": pd.Series([], dtype="int64"),
         "peak_ts_s": pd.Series([], dtype="int64"),
         "peak_cusum": pd.Series([], dtype="int64"),
         "n_events": pd.Series([], dtype="int64")}
    )
    if m is None or not int(m["n"].iloc[0]):
        return empty
    mean_s = (1_000_000 * int(m["s"].iloc[0])) // int(m["n"].iloc[0])

    def walk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["ts", "event_id"], ignore_index=True)
        cents = (g["value"] * 100).round().astype("int64").to_numpy()
        dev = 1_000_000 * cents - mean_s
        s = np.cumsum(dev)
        i = int(np.argmax(np.abs(s)))  # first occurrence = earliest tie
        ts_s = g["ts"].astype("datetime64[s]").astype("int64").to_numpy()
        return pd.DataFrame(
            {"user_id": [int(g["user_id"].iloc[0])],
             "peak_ts_s": [int(ts_s[i])],
             "peak_cusum": [int(s[i])],
             "n_events": [len(g)]}
        ).astype("int64")

    return ds.groupby("user_id").map_groups(walk, batch_format="pandas")


def q_rel_scd2(sf_dir: str):
    """Type-2 slowly-changing-dimension build: collapse each user's
    event-type stream into validity intervals — one row per RUN of equal
    consecutive states, (user_id, state, valid_from, valid_to, n_events),
    open intervals closed at +∞ (sentinel -1) — the warehousing history
    table every dimension load produces.

    One user-hash exchange; runs are a vectorized shift-compare cumsum
    inside the ts-sorted group (the sessions gaps-and-islands shape with
    state-change boundaries instead of time gaps)."""
    ds = _read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "event_type"]
    )

    def intervals(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["ts", "event_id"], ignore_index=True)
        ts_s = g["ts"].astype("datetime64[s]").astype("int64")
        new_run = (g["event_type"] != g["event_type"].shift(1)).cumsum()
        out = (
            pd.DataFrame(
                {"user_id": g["user_id"], "state": g["event_type"],
                 "ts_s": ts_s, "run": new_run}
            )
            .groupby("run", sort=True)
            .agg(user_id=("user_id", "first"), state=("state", "first"),
                 valid_from=("ts_s", "min"), n_events=("ts_s", "size"))
            .reset_index(drop=True)
        )
        out["valid_to"] = out["valid_from"].shift(-1).fillna(-1).astype("int64")
        return out[["user_id", "state", "valid_from", "valid_to", "n_events"]].astype(
            {"user_id": "int64", "valid_from": "int64", "n_events": "int64"}
        )

    return ds.groupby("user_id").map_groups(intervals, batch_format="pandas")


def q_rel_benford(sf_dir: str):
    """Benford first-digit census over event values (the classic
    fabricated-data / instrumentation-bug detector): observed count per
    leading digit vs the quantized Benford expectation
    ``floor(10⁶·log10(1 + 1/d))``. Counts are one tiny tree-fold of
    per-batch digit censuses; the expectation column is driver-side libm.
    Zero/negative amounts are excluded (they have no Benford digit)."""
    import math

    from ..stages.folds import tree_fold_tables

    ds = _read_parquet_clean(f"{sf_dir}/events.parquet", columns=["value"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        cents = (b["value"] * 100).round().astype("int64")
        cents = cents[cents > 0]
        if not len(cents):
            return pd.DataFrame({"digit": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64")})
        digit = cents.astype(str).str[0].astype("int64")
        vc = digit.value_counts()
        return pd.DataFrame({"digit": vc.index.astype("int64"),
                             "n": vc.to_numpy().astype("int64")})

    def combine(frames):
        df = pd.concat(frames, ignore_index=True)
        return df.groupby("digit", sort=False, as_index=False)["n"].sum()

    folded = tree_fold_tables(ds.map_batches(partial, batch_format="pandas"), combine)
    digits = list(range(1, 10))
    n = {int(d): 0 for d in digits}
    if folded is not None:
        for d, c in folded.itertuples(index=False):
            n[int(d)] = int(c)
    total = sum(n.values())
    out = pd.DataFrame(
        {"digit": digits,
         "n": [n[d] for d in digits],
         "observed_q": [(1_000_000 * n[d]) // total if total else 0 for d in digits],
         "benford_q": [int(math.floor(1_000_000 * math.log10(1.0 + 1.0 / d)))
                       for d in digits]}
    )
    return out.astype("int64")


def q_rel_lift(sf_dir: str):
    """Market-basket association census over per-user event-type sets:
    for every unordered event-type pair, support counts plus quantized
    confidence and lift — the classic rules (A⇒B) statistic, with users
    as baskets.

    One user-hash exchange localizes each user's distinct type set; pair,
    marginal and total partials ride the SAME exchange and reduce in one
    tree-fold over the tiny type-pair domain. conf/lift quantize on the
    driver from exact integers with one shared IEEE sequence:
    ``lift = (n_ab·N)/(n_a·n_b)`` as doubles, floor(10⁶·x)."""
    from ..stages.folds import tree_fold_tables

    ds = _read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )

    def project(b: pd.DataFrame) -> pd.DataFrame:
        df = b.drop_duplicates()
        df = df.assign(
            _part=(pd.util.hash_pandas_object(df["user_id"], index=False) % 32).astype(
                "int64"
            )
        )
        return df

    def census(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"kind": pd.Series([], dtype="int8"),
             "a": pd.Series([], dtype=object), "b": pd.Series([], dtype=object),
             "n": pd.Series([], dtype="int64")}
        )
        if not len(g):
            return empty
        ut = g[["user_id", "event_type"]].drop_duplicates()
        marg = ut.groupby("event_type", sort=False).size().reset_index(name="n")
        rows = [
            pd.DataFrame({"kind": np.int8(0), "a": marg["event_type"].astype(object),
                          "b": "", "n": marg["n"].astype("int64")}),
            pd.DataFrame({"kind": [np.int8(2)], "a": [""], "b": [""],
                          "n": [np.int64(ut["user_id"].nunique())]}),
        ]
        m = ut.merge(ut, on="user_id")
        m = m[m["event_type_x"] < m["event_type_y"]]
        if len(m):
            pq = m.groupby(["event_type_x", "event_type_y"], sort=False).size()
            pq = pq.reset_index(name="n")
            rows.append(
                pd.DataFrame({"kind": np.int8(1),
                              "a": pq["event_type_x"].astype(object),
                              "b": pq["event_type_y"].astype(object),
                              "n": pq["n"].astype("int64")})
            )
        return pd.concat(rows, ignore_index=True)

    def combine(frames):
        df = pd.concat(frames, ignore_index=True)
        return df.groupby(["kind", "a", "b"], sort=False, as_index=False)["n"].sum()

    folded = tree_fold_tables(
        ds.map_batches(project, batch_format="pandas")
        .groupby("_part")
        .map_groups(census, batch_format="pandas"),
        combine,
    )
    cols = {"type_a": object, "type_b": object, "n_ab": "int64",
            "conf_q": "int64", "lift_q": "int64"}
    if folded is None or not len(folded):
        return pd.DataFrame({c: pd.Series([], dtype=t) for c, t in cols.items()})
    import math

    marg = dict(zip(folded.loc[folded["kind"] == 0, "a"],
                    folded.loc[folded["kind"] == 0, "n"].astype(int)))
    total = float(folded.loc[folded["kind"] == 2, "n"].sum())
    pq = folded[folded["kind"] == 1]
    rows = []
    for a, b, n in zip(pq["a"], pq["b"], pq["n"].astype(int)):
        conf = float(n) / float(marg[a])  # P(B|A)
        lift = (float(n) * total) / (float(marg[a]) * float(marg[b]))
        rows.append((a, b, n, int(math.floor(1e6 * conf)),
                     int(math.floor(1e6 * lift))))
    return (
        pd.DataFrame(rows, columns=list(cols))
        .sort_values(["type_a", "type_b"], ignore_index=True)
        .astype({"n_ab": "int64", "conf_q": "int64", "lift_q": "int64"})
    )


def q_rel_decay_sum(sf_dir: str, *, half_life_days: int = 30):
    """Exponentially time-decayed value per user (recency-weighted LTV):
    each event contributes ``value_cents · w_q(age_days)`` with
    ``w_q = floor(10⁶·exp(−age/half_life))``; age anchors at the table's
    max timestamp so the result is a pure function of the data.

    Float discipline: exp() is evaluated ONLY on the driver over the
    tiny distinct-day domain (math.exp = C libm, the same library DuckDB
    calls — numpy's SIMD exp may differ by 1 ulp, so it stays out of the
    plan); the weight table broadcasts and the per-event contribution and
    user sums are exact int64. Two passes: a max-ts fold, then one
    user-hash exchange of per-batch (user, sum) partials."""
    import math

    import ray

    from ..stages.folds import tree_fold_tables

    ds = _read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"]
    )

    def ts_partial(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame({"m": pd.Series([], dtype="int64")})
        return pd.DataFrame(
            {"m": [b["ts"].astype("datetime64[s]").astype("int64").max()]}
        )

    def ts_combine(frames):
        df = pd.concat(frames, ignore_index=True)
        return pd.DataFrame({"m": [df["m"].max()]})

    folded = tree_fold_tables(
        ds.map_batches(ts_partial, batch_format="pandas"), ts_combine
    )
    empty = pd.DataFrame(
        {"user_id": pd.Series([], dtype="int64"),
         "decayed_cents_q": pd.Series([], dtype="int64"),
         "n_events": pd.Series([], dtype="int64")}
    )
    if folded is None or not len(folded):
        return empty
    ref_ts = int(folded["m"].iloc[0])
    # driver-side weight table over the distinct-day domain (≤ age range)
    max_days = 4000
    w = np.array(
        [int(math.floor(1_000_000 * math.exp(-d / float(half_life_days))))
         for d in range(max_days + 1)],
        dtype=np.int64,
    )
    w_ref = ray.put(w)

    def partial(b: pd.DataFrame, _w=w_ref) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame(
                {"user_id": pd.Series([], dtype="int64"),
                 "s": pd.Series([], dtype="int64"),
                 "n": pd.Series([], dtype="int64")}
            )
        wt = ray.get(_w)
        ts_s = b["ts"].astype("datetime64[s]").astype("int64").to_numpy()
        day = np.minimum((ref_ts - ts_s) // 86400, len(wt) - 1)
        cents = (b["value"] * 100).round().astype("int64").to_numpy()
        contrib = cents * wt[day]
        return (
            pd.DataFrame({"user_id": b["user_id"].astype("int64"),
                          "s": contrib, "n": 1})
            .groupby("user_id", sort=False, as_index=False)
            .sum()
            .astype({"s": "int64", "n": "int64"})
        )

    def combine(frames):
        df = pd.concat(frames, ignore_index=True)
        return df.groupby("user_id", sort=False, as_index=False)[["s", "n"]].sum()

    out = tree_fold_tables(ds.map_batches(partial, batch_format="pandas"), combine)
    if out is None or not len(out):
        return empty
    return (
        out.rename(columns={"s": "decayed_cents_q", "n": "n_events"})
        .sort_values("user_id", ignore_index=True)
        .astype({"user_id": "int64", "decayed_cents_q": "int64", "n_events": "int64"})
    )


def q_rel_window_dedup(sf_dir: str, *, window_s: int = 300):
    """Tumbling-window event dedup: keep the FIRST event (ts, event_id
    order) per (user, event_type, 5-minute bucket) — the
    bot-retry / double-fire suppression op of an event pipeline.
    One user-hash exchange; bucket arithmetic is exact integer epoch
    division shared with the oracle."""
    ds = _read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type"],
    )

    def keep_first(group: pd.DataFrame) -> pd.DataFrame:
        g = group.copy()
        ts_s = g["ts"].astype("datetime64[s]").astype("int64")
        g["ts_s"] = ts_s
        g["bucket"] = ts_s // window_s
        g = g.sort_values(["event_type", "bucket", "ts_s", "event_id"])
        top = g.groupby(["event_type", "bucket"], sort=False).head(1)
        return pd.DataFrame(
            {
                "event_id": top["event_id"].astype("int64"),
                "user_id": top["user_id"].astype("int64"),
                "event_type": top["event_type"].astype(object),
                "ts_s": top["ts_s"].astype("int64"),
                "bucket": top["bucket"].astype("int64"),
            }
        ).reset_index(drop=True)

    return ds.groupby("user_id").map_groups(keep_first, batch_format="pandas")


def q_rel_attribution(sf_dir: str):
    """Last-touch marketing attribution: each purchase is credited to the
    user's most recent PRECEDING touch event (click/view) in the user's
    event-time order — the standard attribution window op.

    One user_id exchange (``groupby.map_groups``), then pure vectorized
    forward-fill inside the ts-sorted group: the touch ids/types are
    carried forward with ``ffill`` shifted by one so a purchase never
    attributes to itself or to a later touch. Purchases with no prior
    touch credit the sentinel (-1, ''). Total order (ts, event_id) is
    shared with the oracle's window frame, so results hash-match."""
    ds = _read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type", "value"],
    )

    def attribute(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["ts", "event_id"], ignore_index=True)
        is_touch = g["event_type"].isin(("click", "view"))
        tid = pd.Series(
            np.where(is_touch, g["event_id"], np.nan), index=g.index
        ).ffill().shift(1)
        ttype = pd.Series(
            np.where(is_touch, g["event_type"], None), index=g.index, dtype=object
        ).ffill().shift(1)
        buy = g["event_type"] == "purchase"
        out = pd.DataFrame(
            {
                "event_id": g.loc[buy, "event_id"].astype("int64"),
                "user_id": g.loc[buy, "user_id"].astype("int64"),
                "touch_event_id": tid[buy].fillna(-1).astype("int64"),
                "touch_type": ttype[buy].fillna("").astype(object),
                "value_cents": (g.loc[buy, "value"] * 100)
                .round()
                .astype("int64"),
            }
        )
        return out.reset_index(drop=True)

    return ds.groupby("user_id").map_groups(attribute, batch_format="pandas")


def q_rel_grouping_sets(sf_dir: str):
    """Arbitrary GROUPING SETS — ((status, priority), (priority, year),
    (status)) — a non-lattice set list that neither ROLLUP nor CUBE
    expresses. ONE partial-aggregation pass at the finest grain
    (status × priority × year); every requested set re-aggregates from
    the fold result (associative sums) at zero extra scan/shuffle.
    Absent keys render as '' / -1 (engine-portable hash); ``gset`` tags
    the originating set."""
    from ..stages.folds import tree_fold_tables

    ds = _read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderstatus", "o_orderpriority", "o_orderdate", "o_totalprice"],
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return (
            b.assign(
                o_year=pd.to_datetime(b["o_orderdate"]).dt.year.astype("int64"),
                price_cents=(b["o_totalprice"] * 100).round().astype("int64"),
                n=1,
            )
            .groupby(["o_orderstatus", "o_orderpriority", "o_year"], sort=False)
            .agg(price_cents=("price_cents", "sum"), n=("n", "sum"))
            .reset_index()
        )

    def combine(frames):
        df = pd.concat(frames, ignore_index=True)
        return df.groupby(
            ["o_orderstatus", "o_orderpriority", "o_year"], sort=False, as_index=False
        )[["price_cents", "n"]].sum()

    fine = tree_fold_tables(ds.map_batches(partial, batch_format="pandas"), combine)
    cols = ["gset", "o_orderstatus", "o_orderpriority", "o_year", "price_cents", "n"]
    if fine is None or not len(fine):
        return pd.DataFrame({c: pd.Series([], dtype="int64" if c not in
                             ("o_orderstatus", "o_orderpriority") else object)
                             for c in cols})
    s1 = (
        fine.groupby(["o_orderstatus", "o_orderpriority"], as_index=False)[
            ["price_cents", "n"]
        ].sum()
        .assign(gset=1, o_year=-1)
    )
    s2 = (
        fine.groupby(["o_orderpriority", "o_year"], as_index=False)[
            ["price_cents", "n"]
        ].sum()
        .assign(gset=2, o_orderstatus="")
    )
    s3 = (
        fine.groupby("o_orderstatus", as_index=False)[["price_cents", "n"]]
        .sum()
        .assign(gset=3, o_orderpriority="", o_year=-1)
    )
    out = pd.concat([s1[cols], s2[cols], s3[cols]], ignore_index=True)
    return out.astype(
        {"gset": "int64", "o_year": "int64", "price_cents": "int64", "n": "int64"}
    ).sort_values(cols[:4], ignore_index=True)


def q_rel_chi2(sf_dir: str):
    """Chi-square independence census for (o_orderstatus ×
    o_orderpriority): per-cell observed count, expected count and χ²
    contribution — the categorical-drift / feature-correlation check of
    a data-quality pipeline.

    Plan: ONE tree-fold of per-batch contingency partials (the cell
    domain is |status|×|priority| — constant-size driver state); margins
    and per-cell doubles are computed once on the driver. Float
    discipline: both engines evaluate the SAME IEEE sequence over the
    SAME exact int64 counts — exp = (double(row)·double(col))/double(N),
    contrib = (n−exp)²/exp — then quantize floor(10⁶·x), so the hash
    matches without any cross-cell float summation (contributions are
    reported per cell, never summed in float). Cells with zero observed
    count are omitted (both engines build cells from observed rows)."""
    from ..stages.folds import tree_fold_tables

    ds = _read_parquet_clean(
        f"{sf_dir}/orders.parquet", columns=["o_orderstatus", "o_orderpriority"]
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return (
            b.groupby(["o_orderstatus", "o_orderpriority"], sort=False)
            .size()
            .reset_index(name="n")
            .astype({"n": "int64"})
        )

    def combine(frames):
        df = pd.concat(frames, ignore_index=True)
        return df.groupby(
            ["o_orderstatus", "o_orderpriority"], sort=False, as_index=False
        )["n"].sum()

    cells = tree_fold_tables(ds.map_batches(partial, batch_format="pandas"), combine)
    if cells is None or not len(cells):
        return pd.DataFrame(
            {"o_orderstatus": pd.Series([], dtype=object),
             "o_orderpriority": pd.Series([], dtype=object),
             "n": pd.Series([], dtype="int64"),
             "exp_q": pd.Series([], dtype="int64"),
             "contrib_q": pd.Series([], dtype="int64")}
        )
    cells = cells.sort_values(
        ["o_orderstatus", "o_orderpriority"], ignore_index=True
    )
    row_t = cells.groupby("o_orderstatus")["n"].sum()
    col_t = cells.groupby("o_orderpriority")["n"].sum()
    total = float(cells["n"].sum())
    r = cells["o_orderstatus"].map(row_t).to_numpy(np.float64)
    c = cells["o_orderpriority"].map(col_t).to_numpy(np.float64)
    n = cells["n"].to_numpy(np.float64)
    exp = (r * c) / total
    contrib = ((n - exp) * (n - exp)) / exp
    cells["exp_q"] = np.floor(1_000_000 * exp).astype("int64")
    cells["contrib_q"] = np.floor(1_000_000 * contrib).astype("int64")
    return cells.astype({"n": "int64"})


def q_rel_ols(sf_dir: str):
    """Per-group ordinary-least-squares fit (price ~ quantity) from the
    SAME exact-integer moment machinery as :func:`q_rel_corr` — the
    distributed-regression pattern: per-batch int64 partials, Python-int
    tree-fold (overflow-free at any scale), closed-form slope/intercept
    computed once per group on the driver. Both engines run the identical
    IEEE sequence over identical exact integers before the single
    floor(10⁶·x) quantization, so the hash matches."""
    from ..stages.folds import tree_fold_tables

    ds = _read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"],
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        x = b["l_quantity"].round().astype("int64")
        y = (b["l_extendedprice"] * 100).round().astype("int64")
        return (
            pd.DataFrame(
                {
                    "l_returnflag": b["l_returnflag"],
                    "l_linestatus": b["l_linestatus"],
                    "n": 1,
                    "sx": x,
                    "sy": y,
                    "sxy": x * y,
                    "sxx": x * x,
                }
            )
            .groupby(["l_returnflag", "l_linestatus"], sort=False)
            .sum()
            .reset_index()
        )

    def combine(frames):
        df = pd.concat(frames, ignore_index=True)
        for c in ("n", "sx", "sy", "sxy", "sxx"):
            df[c] = df[c].map(int)
        return df.groupby(
            ["l_returnflag", "l_linestatus"], sort=False, as_index=False
        )[["n", "sx", "sy", "sxy", "sxx"]].sum()

    m = tree_fold_tables(
        ds.map_batches(partial, batch_format="pandas", batch_size=16384), combine
    )
    if m is None:
        return pd.DataFrame(
            {"l_returnflag": pd.Series([], dtype=object),
             "l_linestatus": pd.Series([], dtype=object),
             "n": pd.Series([], dtype="int64"),
             "slope_q": pd.Series([], dtype="int64"),
             "intercept_q": pd.Series([], dtype="int64")}
        )

    import math

    def fit(row):
        n, sx, sy = int(row["n"]), int(row["sx"]), int(row["sy"])
        sxy, sxx = int(row["sxy"]), int(row["sxx"])
        num = n * sxy - sx * sy
        den = n * sxx - sx * sx
        if not den:
            return pd.Series({"slope_q": 0, "intercept_q": 0})
        slope = float(num) / float(den)
        intercept = (float(sy) - slope * float(sx)) / float(n)
        return pd.Series(
            {"slope_q": int(math.floor(1e6 * slope)),
             "intercept_q": int(math.floor(1e6 * intercept))}
        )

    out = pd.concat([m, m.apply(fit, axis=1)], axis=1)
    return (
        out[["l_returnflag", "l_linestatus", "n", "slope_q", "intercept_q"]]
        .sort_values(["l_returnflag", "l_linestatus"], ignore_index=True)
        .astype({"n": "int64", "slope_q": "int64", "intercept_q": "int64"})
    )


def q_rel_corr(sf_dir: str):
    """Per-group Pearson correlation (quantity vs price) from EXACT integer
    moments — the distributed-moments pattern: per-batch int64 partial sums
    (n, Σx, Σy, Σxy, Σx², Σy²; batch_size capped at 16384 so Σy² stays far
    inside int64), tree-fold combine in PYTHON ints (arbitrary precision —
    no overflow at any scale), final corr computed once per group on the
    driver from the exact moments. Engine-portable float discipline: both
    engines evaluate floor(10^6 · num/sqrt(double(d1)·double(d2))) over the
    SAME exact integers, so every IEEE rounding step coincides and the
    value hash matches (`rel_corr`)."""
    import math

    from ..stages.folds import tree_fold_tables

    ds = _read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"],
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        x = b["l_quantity"].round().astype("int64")
        y = (b["l_extendedprice"] * 100).round().astype("int64")
        g = (
            pd.DataFrame(
                {
                    "l_returnflag": b["l_returnflag"],
                    "l_linestatus": b["l_linestatus"],
                    "n": 1,
                    "sx": x,
                    "sy": y,
                    "sxy": x * y,
                    "sxx": x * x,
                    "syy": y * y,
                }
            )
            .groupby(["l_returnflag", "l_linestatus"], sort=False)
            .sum()
            .reset_index()
        )
        return g

    def combine(frames):
        df = pd.concat(frames, ignore_index=True)
        # Python-int accumulation: moment sums exceed int64 long before the
        # row stream does; the fold rows are few, so object dtype is free
        for c in ("n", "sx", "sy", "sxy", "sxx", "syy"):
            df[c] = df[c].map(int)
        return df.groupby(["l_returnflag", "l_linestatus"], sort=False, as_index=False)[
            ["n", "sx", "sy", "sxy", "sxx", "syy"]
        ].sum()

    m = tree_fold_tables(
        ds.map_batches(partial, batch_format="pandas", batch_size=16384), combine
    )
    if m is None:
        return pd.DataFrame(
            {
                "l_returnflag": pd.Series([], dtype=object),
                "l_linestatus": pd.Series([], dtype=object),
                "n": pd.Series([], dtype="int64"),
                "sum_qty": pd.Series([], dtype="int64"),
                "sum_price_cents": pd.Series([], dtype="int64"),
                "corr_q": pd.Series([], dtype="int64"),
            }
        )

    def corr_q(row) -> int:
        n, sx, sy = int(row["n"]), int(row["sx"]), int(row["sy"])
        sxy, sxx, syy = int(row["sxy"]), int(row["sxx"]), int(row["syy"])
        num = n * sxy - sx * sy
        d1 = n * sxx - sx * sx
        d2 = n * syy - sy * sy
        den = math.sqrt(float(d1) * float(d2))
        return int(math.floor(1e6 * (float(num) / den))) if den else 0

    out = m.assign(corr_q=m.apply(corr_q, axis=1)).rename(
        columns={"sx": "sum_qty", "sy": "sum_price_cents"}
    )[["l_returnflag", "l_linestatus", "n", "sum_qty", "sum_price_cents", "corr_q"]]
    return out.sort_values(["l_returnflag", "l_linestatus"], ignore_index=True).astype(
        {"n": "int64", "sum_qty": "int64", "sum_price_cents": "int64", "corr_q": "int64"}
    )


def q_rel_cube(sf_dir: str):
    """CUBE grouping sets: revenue/count at ALL FOUR levels of the
    (returnflag × linestatus) lattice from ONE partial-aggregation pass —
    the fine-grain partials are associative sums, so the three coarser
    grouping sets re-aggregate from the ≤|domain|² fold result at zero
    extra scan/shuffle cost (the ROLLUP plan plus the (ALL, status) set).
    NULL level keys render as '' (engine-portable hash)."""
    from ..stages.folds import tree_fold_tables

    ds = _read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_extendedprice"],
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return (
            b.assign(
                price_cents=(b["l_extendedprice"] * 100).round().astype("int64"), n=1
            )
            .groupby(["l_returnflag", "l_linestatus"], sort=False)
            .agg(price_cents=("price_cents", "sum"), n=("n", "sum"))
            .reset_index()
        )

    def combine(frames):
        df = pd.concat(frames, ignore_index=True)
        return df.groupby(
            ["l_returnflag", "l_linestatus"], sort=False, as_index=False
        )[["price_cents", "n"]].sum()

    fine = tree_fold_tables(ds.map_batches(partial, batch_format="pandas"), combine)
    if fine is None:
        fine = pd.DataFrame(
            {"l_returnflag": [], "l_linestatus": [], "price_cents": [], "n": []}
        )
    by_flag = (
        fine.groupby("l_returnflag", as_index=False)[["price_cents", "n"]]
        .sum()
        .assign(l_linestatus="")
    )
    by_status = (
        fine.groupby("l_linestatus", as_index=False)[["price_cents", "n"]]
        .sum()
        .assign(l_returnflag="")
    )
    top = pd.DataFrame(
        {
            "l_returnflag": [""],
            "l_linestatus": [""],
            "price_cents": [fine["price_cents"].sum()],
            "n": [fine["n"].sum()],
        }
    )
    out = pd.concat([fine, by_flag, by_status, top], ignore_index=True)[
        ["l_returnflag", "l_linestatus", "price_cents", "n"]
    ]
    return out.sort_values(
        ["l_returnflag", "l_linestatus"], ignore_index=True
    ).astype({"price_cents": "int64", "n": "int64"})


def q_rel_moving_sum(sf_dir: str):
    """Rows-frame moving window: per-user 3-row moving sum of event value
    (ROWS BETWEEN 2 PRECEDING AND CURRENT ROW, ordered by ts, event_id) —
    ONE user-hash exchange co-locates each user, then a vectorized
    per-partition sort + grouped rolling sum in integer cents; no global
    sort. Window oracle hash-matched (`rel_moving_sum`)."""
    ds = _read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "value"]
    )

    _P = 32

    def add_part(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "event_id": b["event_id"].astype("int64"),
                "ts": b["ts"],
                "user_id": b["user_id"].astype("int64"),
                "value_cents": (b["value"] * 100).round().astype("int64"),
            }
        )
        out["_part"] = (out["user_id"].to_numpy() % _P).astype("int64")
        return out

    def window(g: pd.DataFrame) -> pd.DataFrame:
        if "user_id" not in g.columns or not len(g):
            return pd.DataFrame(
                {
                    "user_id": pd.Series([], dtype="int64"),
                    "event_id": pd.Series([], dtype="int64"),
                    "mov_cents": pd.Series([], dtype="int64"),
                }
            )
        g = g.sort_values(["user_id", "ts", "event_id"], ignore_index=True)
        mov = (
            g.groupby("user_id", sort=False)["value_cents"]
            .rolling(3, min_periods=1)
            .sum()
            .reset_index(drop=True)
        )
        return pd.DataFrame(
            {
                "user_id": g["user_id"],
                "event_id": g["event_id"],
                "mov_cents": mov.astype("int64"),
            }
        )

    return (
        ds.map_batches(add_part, batch_format="pandas")
        .groupby("_part")
        .map_groups(window, batch_format="pandas")
    )


_Q5_CUSTOMER_BROADCAST_MAX = 5_000_000


def q_rel_q5_revenue(sf_dir: str, *, num_partitions: int = 32,
                     customer_broadcast_max: int = _Q5_CUSTOMER_BROADCAST_MAX):
    """TPC-H Q5-shaped 6-table join (region ⋈ nation ⋈ customer ⋈ orders ⋈
    lineitem ⋈ supplier, ASIA, revenue per nation) — the mixed
    broadcast+shuffle plan every warehouse query compiles to:

    - the two BIG tables (lineitem, orders) co-partition on orderkey via
      the union-tag exchange (one shuffle, `Dataset.join` avoided);
    - the CONSTANT-SIZE tables (nation, region, supplier) collapse into
      dense int lookup arrays (suppkey→nationkey, nationkey→name/is-ASIA)
      `ray.put` ONCE and probed vectorized inside each partition;
    - customer GROWS with the corpus, so it is size-gated (parquet
      metadata row count, no data read): at or under
      ``customer_broadcast_max`` rows it rides the same dense-array
      broadcast (probed in tag_orders), above it a SECOND union-tag
      exchange on custkey (the ``rel_shuffle_join`` plan) annotates each
      order with its c_nationkey before the orderkey exchange — both
      paths feed identical (orderkey, c_nationkey) rows downstream and
      are bit-equality pytest-pinned;
    - the cross-dimension predicate c_nationkey = s_nationkey is applied
      INSIDE the partition right after the merge, so only matching rows
      reach the per-partition partial aggregate (≤ #nations rows leave
      each partition).
    """
    import pyarrow.parquet as pq
    import ray

    from ray.data.aggregate import Sum

    supp = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    nat = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name", "n_regionkey"]
    )
    reg = pq.read_table(f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"])

    def dense(keys, vals, fill=-1):
        keys = np.asarray(keys, dtype=np.int64)
        arr = np.full(int(keys.max()) + 1 if len(keys) else 1, fill, dtype=object if vals.dtype == object else np.int64)
        arr[keys] = vals
        return arr

    s_nat = dense(supp["s_suppkey"].to_numpy(), supp["s_nationkey"].to_numpy())
    nkeys = nat["n_nationkey"].to_numpy()
    n_name = dense(nkeys, np.array(nat["n_name"].to_pylist(), dtype=object), fill="")
    asia_regions = {
        rk
        for rk, rn in zip(reg["r_regionkey"].to_pylist(), reg["r_name"].to_pylist())
        if rn == "ASIA"
    }
    is_asia = dense(
        nkeys,
        np.array(
            [int(rk in asia_regions) for rk in nat["n_regionkey"].to_pylist()],
            dtype=np.int64,
        ),
        fill=0,
    )
    dims_ref = ray.put((s_nat, n_name, is_asia))

    li = _read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    orders = _read_parquet_clean(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )

    def part_of(keys: np.ndarray) -> np.ndarray:
        return (pd.util.hash_array(keys.astype(np.int64)) % num_partitions).astype(
            "int64"
        )

    n_cust = pq.read_metadata(f"{sf_dir}/customer.parquet").num_rows
    if n_cust <= customer_broadcast_max:
        cust = pq.read_table(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
        )
        c_nat = dense(cust["c_custkey"].to_numpy(), cust["c_nationkey"].to_numpy())
        c_nat_ref = ray.put(c_nat)

        def orders_cn_batch(b: pd.DataFrame, _c=c_nat_ref) -> pd.DataFrame:
            cn_map = ray.get(_c)
            ck = b["o_custkey"].to_numpy().astype(np.int64)
            cn = np.where(ck < len(cn_map), cn_map[np.minimum(ck, len(cn_map) - 1)], -1)
            return pd.DataFrame(
                {"k": b["o_orderkey"].to_numpy().astype(np.int64),
                 "cn": cn.astype(np.int64)}
            )

        orders_cn = orders.map_batches(orders_cn_batch, batch_format="pandas")
    else:
        # customer above the broadcast bound: co-partition it with orders
        # on custkey (the rel_shuffle_join union-tag exchange) to annotate
        # each order with c_nationkey — one extra shuffle, zero driver state
        cust_ds = _read_parquet_clean(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
        )

        def tag_cust(b: pd.DataFrame) -> pd.DataFrame:
            k = b["c_custkey"].to_numpy().astype(np.int64)
            return pd.DataFrame(
                {"ck": k, "v": b["c_nationkey"].to_numpy().astype(np.int64),
                 "side": np.int8(0), "_part": part_of(k)}
            )

        def tag_ord(b: pd.DataFrame) -> pd.DataFrame:
            k = b["o_custkey"].to_numpy().astype(np.int64)
            return pd.DataFrame(
                {"ck": k, "v": b["o_orderkey"].to_numpy().astype(np.int64),
                 "side": np.int8(1), "_part": part_of(k)}
            )

        def cust_join(g: pd.DataFrame) -> pd.DataFrame:
            empty = pd.DataFrame({"k": pd.Series([], dtype="int64"),
                                  "cn": pd.Series([], dtype="int64")})
            if not len(g) or "side" not in g.columns:
                return empty
            dim = g[g["side"] == 0][["ck", "v"]].rename(columns={"v": "cn"})
            fact = g[g["side"] == 1][["ck", "v"]].rename(columns={"v": "k"})
            if not len(dim) or not len(fact):
                return empty
            j = fact.merge(dim, on="ck")
            return j[["k", "cn"]].astype({"k": "int64", "cn": "int64"})

        orders_cn = (
            cust_ds.map_batches(tag_cust, batch_format="pandas")
            .union(orders.map_batches(tag_ord, batch_format="pandas"))
            .groupby("_part")
            .map_groups(cust_join, batch_format="pandas")
        )

    def tag_li(b: pd.DataFrame) -> pd.DataFrame:
        k = b["l_orderkey"].to_numpy().astype(np.int64)
        return pd.DataFrame(
            {
                "k": k,
                "other": b["l_suppkey"].to_numpy().astype(np.int64),
                # floor(v+0.5) = DuckDB's round-half-away for the non-negative
                # revenue product (numpy .round() is half-even and diverges on
                # the exact-.5 values this 3-factor product does hit).
                "rev": np.floor(
                    (b["l_extendedprice"] * (1 - b["l_discount"]) * 100).to_numpy()
                    + 0.5
                ).astype("int64"),
                "side": np.int8(0),
                "_part": part_of(k),
            }
        )

    def tag_orders(b: pd.DataFrame) -> pd.DataFrame:
        k = b["k"].to_numpy().astype(np.int64)
        return pd.DataFrame(
            {
                "k": k,
                "other": b["cn"].to_numpy().astype(np.int64),
                "rev": np.full(len(b), 0, dtype=np.int64),
                "side": np.int8(1),
                "_part": part_of(k),
            }
        )

    both = li.map_batches(tag_li, batch_format="pandas").union(
        orders_cn.map_batches(tag_orders, batch_format="pandas")
    )

    def join_part(g: pd.DataFrame, _dims=dims_ref) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "n_name": pd.Series([], dtype=object),
                "revenue_cents": pd.Series([], dtype="int64"),
                "n": pd.Series([], dtype="int64"),
            }
        )
        if not len(g) or "side" not in g.columns:
            return empty
        s_nat, n_name, is_asia = ray.get(_dims)
        fact = g[g["side"] == 0][["k", "other", "rev"]].rename(
            columns={"other": "suppkey"}
        )
        dim = g[g["side"] == 1][["k", "other"]].rename(columns={"other": "cn"})
        if not len(fact) or not len(dim):
            return empty
        j = fact.merge(dim, on="k")
        cn = j["cn"].to_numpy().astype(np.int64)
        sn = s_nat[j["suppkey"].to_numpy()].astype(np.int64)
        m = (cn == sn) & (cn >= 0) & (is_asia[sn] == 1)
        if not m.any():
            return empty
        out = (
            pd.DataFrame(
                {"n_name": n_name[sn[m]], "revenue_cents": j["rev"].to_numpy()[m], "n": 1}
            )
            .groupby("n_name", sort=False, as_index=False)[["revenue_cents", "n"]]
            .sum()
        )
        out["n_name"] = out["n_name"].astype(object)
        return out.astype({"revenue_cents": "int64", "n": "int64"})

    return (
        both.groupby("_part")
        .map_groups(join_part, batch_format="pandas")
        .groupby("n_name")
        .aggregate(
            Sum("revenue_cents", alias_name="revenue_cents"),
            Sum("n", alias_name="n"),
        )
    )


def q_rel_resample(sf_dir: str, *, num_partitions: int = 32):
    """Per-user dense hourly resample with gap-fill — the generate_series /
    time-grid operator Ray Data has no primitive for (the output has MORE
    rows than the input: every hour between a user's first and last event
    exists, observed or not):

    - map pass folds events to (user, hour, n, cents) partials per batch
      (shuffle volume = observed user-hours, not events);
    - ONE user-hash exchange co-locates each user's history;
    - per partition the dense grid is built VECTORIZED for all users at
      once (np.repeat + cumulative-offset arange, no per-user Python
      loop), observed rows scatter into their grid slots by integer
      position, and forward-fill is one pandas grouped ffill.

    Gap hours report n_events=0 / sum_cents=0; ff_cents carries the most
    recent observed hour's sum (first grid hour is always observed, so no
    nulls and the schema stays int64). Grid amplification is bounded per
    partition by that partition's user time-spans — at 100 TB the hour
    granularity and the per-user span cap the fanout, and partitions
    stream independently.
    """
    ds = _read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"]
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame(
                {
                    "user_id": pd.Series([], dtype="int64"),
                    "hour_start": pd.Series([], dtype="int64"),
                    "n_events": pd.Series([], dtype="int64"),
                    "sum_cents": pd.Series([], dtype="int64"),
                    "_part": pd.Series([], dtype="int64"),
                }
            )
        h = b["ts"].dt.floor("h").astype("datetime64[s]").astype("int64")
        g = (
            pd.DataFrame(
                {
                    "user_id": b["user_id"].astype("int64"),
                    "hour_start": h,
                    "n_events": np.int64(1),
                    "sum_cents": (b["value"] * 100).round().astype("int64"),
                }
            )
            .groupby(["user_id", "hour_start"], sort=False, as_index=False)
            .sum()
        )
        g["_part"] = (pd.util.hash_array(g["user_id"].to_numpy()) % num_partitions).astype(
            "int64"
        )
        return g

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "user_id": pd.Series([], dtype="int64"),
                "hour_start": pd.Series([], dtype="int64"),
                "n_events": pd.Series([], dtype="int64"),
                "sum_cents": pd.Series([], dtype="int64"),
                "ff_cents": pd.Series([], dtype="int64"),
            }
        )
        if not len(g) or "user_id" not in g.columns:
            return empty
        obs = (
            g.groupby(["user_id", "hour_start"], sort=False, as_index=False)[
                ["n_events", "sum_cents"]
            ]
            .sum()
            .sort_values(["user_id", "hour_start"], ignore_index=True)
        )
        HOUR = 3600
        uids = obs["user_id"].to_numpy()
        hrs = obs["hour_start"].to_numpy()
        first = np.concatenate(([True], uids[1:] != uids[:-1]))
        u_idx = np.cumsum(first) - 1  # dense 0..U-1 per observed row
        lo = hrs[first]
        hi = np.maximum.reduceat(hrs, np.flatnonzero(first))
        span = (hi - lo) // HOUR + 1  # grid rows per user
        offset = np.concatenate(([0], np.cumsum(span)[:-1]))
        total = int(span.sum())
        # dense grid, all users at once: repeat lo, add a per-user ramp
        ramp = np.arange(total) - np.repeat(offset, span)
        grid_hour = np.repeat(lo, span) + ramp * HOUR
        grid_user = np.repeat(uids[first], span)
        n = np.zeros(total, dtype=np.int64)
        s = np.zeros(total, dtype=np.int64)
        pos = offset[u_idx] + (hrs - lo[u_idx]) // HOUR
        n[pos] = obs["n_events"].to_numpy()
        s[pos] = obs["sum_cents"].to_numpy()
        out = pd.DataFrame(
            {
                "user_id": grid_user,
                "hour_start": grid_hour,
                "n_events": n,
                "sum_cents": s,
            }
        )
        ff = out["sum_cents"].where(out["n_events"] > 0)
        out["ff_cents"] = (
            ff.groupby(out["user_id"], sort=False).ffill().astype("int64")
        )
        return out

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("_part")
        .map_groups(finish, batch_format="pandas")
    )


def q_rel_retention(sf_dir: str, *, num_partitions: int = 32):
    """Cohort retention matrix — (cohort_week, week_offset, n_users) where
    a user's cohort is the Monday-truncated week of their FIRST event and
    offset counts weeks until each active week. The product-analytics
    staple whose SQL form needs two self-referential aggregations; here it
    is ONE user-hash exchange:

    - map pass dedups (user, week) inside each batch (shuffle volume =
      observed user-weeks, not events);
    - per partition each user's full history is local, so cohort (min
      week) and distinct active weeks are exact with no second shuffle;
    - the (cohort, offset, n) partials fold in a final census groupby
      whose domain is #cohorts × #offsets — tiny by construction.

    Week truncation is Monday-anchored epoch math (day 0 = Thursday), the
    same boundary DuckDB's date_trunc('week') uses.
    """
    ds = _read_parquet_clean(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def week_start(ts: pd.Series) -> np.ndarray:
        days = ts.astype("datetime64[s]").astype("int64") // 86400
        monday = days - (days + 3) % 7
        return monday * 86400

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame(
                {
                    "user_id": pd.Series([], dtype="int64"),
                    "week": pd.Series([], dtype="int64"),
                    "_part": pd.Series([], dtype="int64"),
                }
            )
        g = pd.DataFrame(
            {
                "user_id": b["user_id"].astype("int64"),
                "week": week_start(b["ts"]),
            }
        ).drop_duplicates(ignore_index=True)
        g["_part"] = (pd.util.hash_array(g["user_id"].to_numpy()) % num_partitions).astype(
            "int64"
        )
        return g

    def census(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                c: pd.Series([], dtype="int64")
                for c in ("cohort_week", "week_offset", "n_users")
            }
        )
        if not len(g) or "user_id" not in g.columns:
            return empty
        uw = g[["user_id", "week"]].drop_duplicates()
        cohort = uw.groupby("user_id")["week"].transform("min")
        out = pd.DataFrame(
            {
                "cohort_week": cohort.to_numpy(),
                "week_offset": (uw["week"].to_numpy() - cohort.to_numpy()) // 604800,
                "n_users": np.int64(1),
            }
        )
        # one row per (user, week) → n_users counts distinct users exactly
        return (
            out.groupby(["cohort_week", "week_offset"], sort=False, as_index=False)[
                "n_users"
            ]
            .sum()
            .astype("int64")
        )

    from ray.data.aggregate import Sum

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("_part")
        .map_groups(census, batch_format="pandas")
        .groupby(["cohort_week", "week_offset"])
        .aggregate(Sum("n_users", alias_name="n_users"))
    )


def q_rel_funnel(sf_dir: str, *, num_partitions: int = 32):
    """Ordered conversion funnel (view → click → purchase, strictly
    increasing timestamps): n_users reaching each step. The sequential
    "first B after first A" dependency defeats per-batch pre-reduction
    for the later steps (any click can be the first-after-view for some
    t1), so the plan ships only the three funnel event types — (user,
    ts, step-code), columns pruned at the read — through ONE user-hash
    exchange; per partition each user's times resolve vectorized
    (masked groupby mins, no per-user loop) and only (step, n) partials
    leave. View mins ARE batch-reducible and get pre-folded."""
    ds = _read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"]
    )
    steps = {"view": 1, "click": 2, "purchase": 3}

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "user_id": pd.Series([], dtype="int64"),
                "t": pd.Series([], dtype="int64"),
                "step": pd.Series([], dtype="int8"),
                "_part": pd.Series([], dtype="int64"),
            }
        )
        if not len(b):
            return empty
        m = b["event_type"].isin(steps)
        if not m.any():
            return empty
        f = b[m]
        out = pd.DataFrame(
            {
                "user_id": f["user_id"].astype("int64"),
                "t": f["ts"].astype("datetime64[us]").astype("int64"),
                "step": f["event_type"].map(steps).astype("int8"),
            }
        )
        # step-1 partial fold: only the per-user min view survives the batch
        views = out[out["step"] == 1].groupby("user_id", as_index=False)["t"].min()
        views["step"] = np.int8(1)
        out = pd.concat([views[["user_id", "t", "step"]], out[out["step"] != 1]],
                        ignore_index=True)
        out["_part"] = (
            pd.util.hash_array(out["user_id"].to_numpy()) % num_partitions
        ).astype("int64")
        return out

    def census(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"step": pd.Series([], dtype="int64"), "n_users": pd.Series([], dtype="int64")}
        )
        if not len(g) or "step" not in g.columns:
            return empty
        t1 = g[g["step"] == 1].groupby("user_id")["t"].min()
        c = g[g["step"] == 2].copy()
        c["t1"] = c["user_id"].map(t1)
        t2 = c[c["t"] > c["t1"]].groupby("user_id")["t"].min()
        p = g[g["step"] == 3].copy()
        p["t2"] = p["user_id"].map(t2)
        t3 = p[p["t"] > p["t2"]].groupby("user_id")["t"].min()
        return pd.DataFrame(
            {
                "step": np.array([1, 2, 3], dtype=np.int64),
                "n_users": np.array([len(t1), len(t2), len(t3)], dtype=np.int64),
            }
        )

    from ray.data.aggregate import Sum

    return (
        ds.map_batches(tag, batch_format="pandas")
        .groupby("_part")
        .map_groups(census, batch_format="pandas")
        .groupby("step")
        .aggregate(Sum("n_users", alias_name="n_users"))
    )


def _pareto_min(df: pd.DataFrame) -> pd.DataFrame:
    """Vectorized 2-D Pareto-minimal filter on (price_cents, p_size):
    keep p iff no q has both coords ≤ with one strict. Sorted by price,
    a point survives iff its size is (a) minimal within its own price
    group and (b) strictly below the running min over all smaller
    prices. Duplicate (price, size) points co-survive (no strict
    dominance between equals)."""
    d = df.sort_values(["price_cents", "p_size"], ignore_index=True)
    grp_min = d.groupby("price_cents", sort=False)["p_size"].transform("min")
    # per-price-group min, price-sorted → prefix-min over STRICTLY
    # smaller prices via cummin + shift on the GROUP-level series
    g = d.groupby("price_cents", sort=True)["p_size"].min()
    run = d["price_cents"].map(g.cummin().shift()).fillna(np.inf)
    keep = (d["p_size"].to_numpy() == grp_min.to_numpy()) & (
        d["p_size"].to_numpy() < run.to_numpy()
    )
    return d[keep]


def q_rel_skyline(sf_dir: str):
    """Pareto-optimal set (skyline) over parts, minimizing (price, size)
    — the preference-query operator with a textbook distribution story:
    the skyline of a union is contained in the union of local skylines,
    so each batch emits its local Pareto front (vectorized sort +
    grouped running-min, no O(n²)), the tiny candidate union tree-folds,
    and one final local pass is exact. Random 2-D fronts are O(log n)
    per batch, so the fold sees ~log-sized leaves regardless of corpus
    size. NOT EXISTS dominance oracle hash-matched (`rel_skyline`)."""
    from ..stages.folds import tree_fold_tables

    ds = _read_parquet_clean(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_size", "p_retailprice"]
    )

    def local(b: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "p_partkey": pd.Series([], dtype="int64"),
                "price_cents": pd.Series([], dtype="int64"),
                "p_size": pd.Series([], dtype="int64"),
            }
        )
        if not len(b):
            return empty
        d = pd.DataFrame(
            {
                "p_partkey": b["p_partkey"].astype("int64"),
                "price_cents": (b["p_retailprice"] * 100).round().astype("int64"),
                "p_size": b["p_size"].astype("int64"),
            }
        )
        return _pareto_min(d)

    def combine(frames):
        return _pareto_min(pd.concat(frames, ignore_index=True))

    folded = tree_fold_tables(ds.map_batches(local, batch_format="pandas"), combine)
    if folded is None:
        return pd.DataFrame(
            {
                "p_partkey": pd.Series([], dtype="int64"),
                "price_cents": pd.Series([], dtype="int64"),
                "p_size": pd.Series([], dtype="int64"),
            }
        )
    return folded.sort_values("p_partkey", ignore_index=True).astype(
        {"p_partkey": "int64", "price_cents": "int64", "p_size": "int64"}
    )


_BLOOM_BITS = 1 << 20  # 128 KiB bitset; size ∝ build-side cardinality at scale
_BLOOM_K = 4


def _bloom_indices(keys: np.ndarray) -> list[np.ndarray]:
    """k=4 double-hashed bit positions per key (h1 + i·h2 mod m)."""
    h1 = pd.util.hash_array(keys.astype(np.int64))
    h2 = pd.util.hash_array(keys.astype(np.int64), hash_key="fedcba9876543210")
    return [((h1 + np.uint64(i) * h2) % np.uint64(_BLOOM_BITS)).astype(np.int64)
            for i in range(_BLOOM_K)]


def q_rel_bloom_semi_join(sf_dir: str, *, num_partitions: int = 32):
    """Bloom-pruned semi-join aggregate — revenue/count per linestatus of
    lineitems belonging to URGENT orders. The pattern that makes big⋈big
    semi-joins cheap at 100 TB: a Bloom filter of the build side prunes
    the probe stream BEFORE the shuffle, so the exchange ships ~the
    matching rows (+FP ≈ 1%) instead of the whole fact table.

    - build pass: urgent orderkeys fold into a 2²⁰-bit Bloom bitset by
      per-batch OR partials (tree-fold of 128 KiB blocks), `ray.put` once;
    - probe pass: vectorized double-hash membership test per batch drops
      ~4/5 of lineitem rows pre-exchange;
    - survivors + build keys co-partition via the union-tag exchange and
      the per-partition semi-join is EXACT — Bloom false positives die
      there, so the result is oracle-identical at any FP rate (the filter
      is a physical optimization, not a semantic one).
    """
    li = _read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linestatus", "l_extendedprice"],
    )
    orders = _read_parquet_clean(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    )
    from ..stages.folds import tree_fold_tables

    def build_partial(b: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(_BLOOM_BITS >> 3, dtype=np.uint8)
        k = b[b["o_orderpriority"] == "1-URGENT"]["o_orderkey"].to_numpy()
        if len(k):
            for idx in _bloom_indices(k):
                np.bitwise_or.at(bits, idx >> 3, np.uint8(1) << (idx & 7).astype(np.uint8))
        return pd.DataFrame({"bloom": [bits.tobytes()]})

    def or_combine(frames):
        arrs = [
            np.frombuffer(x, dtype=np.uint8)
            for f in frames
            if "bloom" in f.columns
            for x in f["bloom"]
        ]
        out = np.bitwise_or.reduce(arrs) if arrs else np.zeros(_BLOOM_BITS >> 3, np.uint8)
        return pd.DataFrame({"bloom": [out.tobytes()]})

    folded = tree_fold_tables(
        orders.map_batches(build_partial, batch_format="pandas"), or_combine
    )
    import ray

    bloom_ref = ray.put(
        np.frombuffer(folded["bloom"].iloc[0], dtype=np.uint8)
        if folded is not None and len(folded)
        else np.zeros(_BLOOM_BITS >> 3, np.uint8)
    )

    def part_of(keys: np.ndarray) -> np.ndarray:
        return (pd.util.hash_array(keys.astype(np.int64)) % num_partitions).astype("int64")

    def probe(b: pd.DataFrame, _bits=bloom_ref) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "k": pd.Series([], dtype="int64"),
                "status": pd.Series([], dtype=object),
                "cents": pd.Series([], dtype="int64"),
                "side": pd.Series([], dtype="int8"),
                "_part": pd.Series([], dtype="int64"),
            }
        )
        if not len(b):
            return empty
        bits = ray.get(_bits)
        keys = b["l_orderkey"].to_numpy().astype(np.int64)
        member = np.ones(len(keys), dtype=bool)
        for idx in _bloom_indices(keys):
            member &= (bits[idx >> 3] >> (idx & 7).astype(np.uint8)) & 1 > 0
        if not member.any():
            return empty
        f = b[member]
        keys = keys[member]
        return pd.DataFrame(
            {
                "k": keys,
                "status": f["l_linestatus"].astype(object),
                "cents": (f["l_extendedprice"] * 100).round().astype("int64"),
                "side": np.int8(0),
                "_part": part_of(keys),
            }
        )

    def build_keys(b: pd.DataFrame) -> pd.DataFrame:
        k = b[b["o_orderpriority"] == "1-URGENT"]["o_orderkey"].to_numpy().astype(np.int64)
        return pd.DataFrame(
            {
                "k": k,
                "status": "",
                "cents": np.zeros(len(k), dtype=np.int64),
                "side": np.full(len(k), 1, dtype=np.int8),
                "_part": part_of(k),
            }
        )

    both = li.map_batches(probe, batch_format="pandas").union(
        orders.map_batches(build_keys, batch_format="pandas")
    )

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "l_linestatus": pd.Series([], dtype=object),
                "n": pd.Series([], dtype="int64"),
                "sum_cents": pd.Series([], dtype="int64"),
            }
        )
        if not len(g) or "side" not in g.columns:
            return empty
        keys = set(g[g["side"] == 1]["k"].to_numpy())
        f = g[g["side"] == 0]
        f = f[f["k"].isin(keys)]
        if not len(f):
            return empty
        out = (
            f.assign(n=1)
            .groupby("status", sort=False, as_index=False)
            .agg(n=("n", "sum"), sum_cents=("cents", "sum"))
            .rename(columns={"status": "l_linestatus"})
        )
        out["l_linestatus"] = out["l_linestatus"].astype(object)
        return out.astype({"n": "int64", "sum_cents": "int64"})

    from ray.data.aggregate import Sum

    return (
        both.groupby("_part")
        .map_groups(verify, batch_format="pandas")
        .groupby("l_linestatus")
        .aggregate(Sum("n", alias_name="n"), Sum("sum_cents", alias_name="sum_cents"))
    )


_Z_BITS = 16  # 16+16 → 32-bit Morton codes
_Z_BUCKET_SHIFT = 14  # zone buckets; sf-scale key domains give ~2^22 codes


def _morton(p: np.ndarray, s: np.ndarray) -> np.ndarray:
    """Interleave the low 16 bits of two int64 arrays (p even lanes,
    s odd lanes) — vectorized, no per-row Python."""
    out = np.zeros(len(p), dtype=np.int64)
    for i in range(_Z_BITS):
        out |= ((p >> i) & 1) << (2 * i)
        out |= ((s >> i) & 1) << (2 * i + 1)
    return out


def q_rel_zorder(sf_dir: str):
    """Z-order (Morton) layout statistics — the space-filling-curve
    clustering behind OPTIMIZE ZORDER: interleaving (partkey, suppkey)
    bits gives a 1-D sort key under which both columns stay range-local,
    so min/max zone maps prune 2-D predicates. The layout rewrite itself
    is `sort by z` + partitioned write; the oracle-checkable artifact is
    the zone-map census over the code-prefix buckets: (bucket, n,
    zmin, zmax) — per-batch associative partials, one tiny ≤256-key
    aggregate, no row-level shuffle."""
    from ray.data.aggregate import Max, Min, Sum

    ds = _read_parquet_clean(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_suppkey"]
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {c: pd.Series([], dtype="int64") for c in ("bucket", "n", "zmin", "zmax")}
        )
        if not len(b):
            return empty
        z = _morton(
            b["l_partkey"].to_numpy().astype(np.int64),
            b["l_suppkey"].to_numpy().astype(np.int64),
        )
        g = (
            pd.DataFrame({"bucket": z >> _Z_BUCKET_SHIFT, "z": z})
            .groupby("bucket", sort=False)["z"]
            .agg(n="size", zmin="min", zmax="max")
            .reset_index()
        )
        return g.astype("int64")

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("bucket")
        .aggregate(
            Sum("n", alias_name="n"),
            Min("zmin", alias_name="zmin"),
            Max("zmax", alias_name="zmax"),
        )
    )


def q_rel_merge_upsert(sf_dir: str, *, num_partitions: int = 32):
    """MERGE INTO (CDC upsert) — apply a keyed change stream to a base
    table and report the post-merge census. The delta here is derived
    deterministically from the corpus so the oracle can replay it
    (DELETE keys ≡ 0 mod 17; UPDATE keys ≡ 0 mod 10 get +10% price;
    INSERT clones keys ≡ 0 mod 13 shifted by 10⁹), but the PLAN is the
    general one: base and delta are two independent streams that
    co-partition on the key via the union-tag exchange, and each
    partition applies precedence (DELETE ∘ UPDATE ∘ INSERT) vectorized —
    no driver-side key set, shuffle = base + delta rows, exactly how a
    lakehouse MERGE executes. Census output keeps the result
    hash-checkable without materializing the merged table.
    """
    base = _read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority", "o_totalprice"],
    )
    delta = _read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority", "o_totalprice"],
    )

    def part_of(k: np.ndarray) -> np.ndarray:
        return (pd.util.hash_array(k.astype(np.int64)) % num_partitions).astype("int64")

    def tag_base(b: pd.DataFrame) -> pd.DataFrame:
        k = b["o_orderkey"].to_numpy().astype(np.int64)
        cents = np.floor(b["o_totalprice"].to_numpy() * 100 + 0.5).astype(np.int64)
        return pd.DataFrame(
            {
                "k": k,
                "prio": b["o_orderpriority"].astype(object),
                "cents": cents,
                "op": np.int8(0),  # base row
                "_part": part_of(k),
            }
        )

    def tag_delta(b: pd.DataFrame) -> pd.DataFrame:
        k = b["o_orderkey"].to_numpy().astype(np.int64)
        price = b["o_totalprice"].to_numpy()
        prio = b["o_orderpriority"].to_numpy(dtype=object)
        frames = []
        d = k[k % 17 == 0]
        if len(d):
            frames.append(
                pd.DataFrame(
                    {"k": d, "prio": "", "cents": np.int64(0), "op": np.int8(1)}
                )
            )
        um = k % 10 == 0
        if um.any():
            frames.append(
                pd.DataFrame(
                    {
                        "k": k[um],
                        "prio": prio[um],
                        # +10%: half-away rounding (see q_rel_q5_revenue)
                        "cents": np.floor(price[um] * 110 + 0.5).astype(np.int64),
                        "op": np.int8(2),
                    }
                )
            )
        im = k % 13 == 0
        if im.any():
            frames.append(
                pd.DataFrame(
                    {
                        "k": k[im] + 1_000_000_000,
                        "prio": prio[im],
                        "cents": np.floor(price[im] * 100 + 0.5).astype(np.int64),
                        "op": np.int8(3),
                    }
                )
            )
        if not frames:
            return pd.DataFrame(
                {
                    "k": pd.Series([], dtype="int64"),
                    "prio": pd.Series([], dtype=object),
                    "cents": pd.Series([], dtype="int64"),
                    "op": pd.Series([], dtype="int8"),
                    "_part": pd.Series([], dtype="int64"),
                }
            )
        out = pd.concat(frames, ignore_index=True)
        out["_part"] = part_of(out["k"].to_numpy())
        return out

    both = base.map_batches(tag_base, batch_format="pandas").union(
        delta.map_batches(tag_delta, batch_format="pandas")
    )

    def apply_ops(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "o_orderpriority": pd.Series([], dtype=object),
                "n": pd.Series([], dtype="int64"),
                "sum_cents": pd.Series([], dtype="int64"),
            }
        )
        if not len(g) or "op" not in g.columns:
            return empty
        dels = set(g[g["op"] == 1]["k"].to_numpy())
        upd = g[g["op"] == 2].set_index("k")
        rows = g[g["op"] == 0].copy()
        rows = rows[~rows["k"].isin(dels)]
        m = rows["k"].isin(upd.index)
        rows.loc[m, "cents"] = upd["cents"].reindex(rows.loc[m, "k"]).to_numpy()
        ins = g[g["op"] == 3]
        merged = pd.concat([rows, ins], ignore_index=True)
        if not len(merged):
            return empty
        out = (
            merged.assign(n=1)
            .groupby("prio", sort=False, as_index=False)
            .agg(n=("n", "sum"), sum_cents=("cents", "sum"))
            .rename(columns={"prio": "o_orderpriority"})
        )
        out["o_orderpriority"] = out["o_orderpriority"].astype(object)
        return out.astype({"n": "int64", "sum_cents": "int64"})

    from ray.data.aggregate import Sum

    return (
        both.groupby("_part")
        .map_groups(apply_ops, batch_format="pandas")
        .groupby("o_orderpriority")
        .aggregate(Sum("n", alias_name="n"), Sum("sum_cents", alias_name="sum_cents"))
    )


def q_rel_sliding_distinct(sf_dir: str, *, window_hours: int = 24, num_partitions: int = 32):
    """Sliding-window COUNT DISTINCT — per 24 h window (hour-granular
    starts), the number of distinct active users. The op resists naive
    distribution (a user must count once per window, windows overlap),
    but has an EXACT linear plan via interval algebra:

    - distinct (user, hour) pairs dedup per batch, ONE user-hash
      exchange co-locates each user's hours;
    - a user active at hour h covers window starts [h−23, h]; the
      per-user union of these ranges (vectorized gap-split on sorted
      hours) becomes ±1 DIFF EVENTS at interval boundaries — rows
      leaving the partition collapse from user-hours to interval ends;
    - the tiny event stream tree-folds; one prefix sum over the hour
      domain (thousands of rows even at decade span) finishes on the
      driver, clipped to [first, last] active hour.

    The same trick evaluates any sliding count-distinct (IPs per minute,
    repos per day) — window length only changes the covering range."""
    from ..stages.folds import tree_fold_tables

    HOUR = 3600
    W = window_hours
    ds = _read_parquet_clean(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def uh_partial(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame(
                {
                    "user_id": pd.Series([], dtype="int64"),
                    "h": pd.Series([], dtype="int64"),
                    "_part": pd.Series([], dtype="int64"),
                }
            )
        g = pd.DataFrame(
            {
                "user_id": b["user_id"].astype("int64"),
                "h": b["ts"].dt.floor("h").astype("datetime64[s]").astype("int64"),
            }
        ).drop_duplicates(ignore_index=True)
        g["_part"] = (pd.util.hash_array(g["user_id"].to_numpy()) % num_partitions).astype(
            "int64"
        )
        return g

    def events(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "kind": pd.Series([], dtype="int8"),
                "w": pd.Series([], dtype="int64"),
                "d": pd.Series([], dtype="int64"),
            }
        )
        if not len(g) or "user_id" not in g.columns:
            return empty
        d = (
            g[["user_id", "h"]]
            .drop_duplicates()
            .sort_values(["user_id", "h"], ignore_index=True)
        )
        uid = d["user_id"].to_numpy()
        h = d["h"].to_numpy()
        new_user = np.concatenate(([True], uid[1:] != uid[:-1]))
        # split where the gap exceeds the covering range (W hours)
        gap = np.concatenate(([True], (h[1:] - h[:-1]) > (W - 1) * HOUR))
        start = new_user | gap
        ends_mask = np.concatenate((start[1:], [True]))
        starts = h[start] - (W - 1) * HOUR  # first window start covered
        ends = h[ends_mask] + HOUR  # one past the last covered start
        ev = pd.DataFrame(
            {
                "w": np.concatenate([starts, ends]),
                "d": np.concatenate(
                    [np.ones(len(starts), np.int64), -np.ones(len(ends), np.int64)]
                ),
                "kind": np.int8(0),
            }
        )
        # active-hour bounds ride as kind-1 rows for the final clip
        bounds = pd.DataFrame(
            {"w": [h.min(), h.max()], "d": np.zeros(2, dtype=np.int64),
             "kind": np.int8(1)}
        )
        ev = pd.concat([ev, bounds], ignore_index=True)
        return ev.groupby(["kind", "w"], sort=False, as_index=False)["d"].sum()

    def combine(frames):
        return (
            pd.concat(frames, ignore_index=True)
            .groupby(["kind", "w"], sort=False, as_index=False)["d"]
            .sum()
        )

    folded = tree_fold_tables(
        ds.map_batches(uh_partial, batch_format="pandas")
        .groupby("_part")
        .map_groups(events, batch_format="pandas"),
        combine,
    )
    out_empty = pd.DataFrame(
        {
            "window_start": pd.Series([], dtype="int64"),
            "n_users": pd.Series([], dtype="int64"),
        }
    )
    if folded is None or not len(folded):
        return out_empty
    bounds = folded[folded["kind"] == 1]
    ev = folded[folded["kind"] == 0].sort_values("w", ignore_index=True)
    if not len(bounds) or not len(ev):
        return out_empty
    lo, hi = int(bounds["w"].min()), int(bounds["w"].max())
    w = ev["w"].to_numpy()
    run = ev["d"].cumsum().to_numpy()
    # dense hourly domain [lo, hi], value = running sum at the last event ≤ w
    grid = np.arange(lo, hi + 1, HOUR)
    idx = np.searchsorted(w, grid, side="right") - 1
    n = np.where(idx >= 0, run[np.maximum(idx, 0)], 0).astype(np.int64)
    out = pd.DataFrame({"window_start": grid, "n_users": n})
    # inner-join semantics: a >W-hour global activity gap yields zero
    # windows, which the oracle's join omits
    return out[out["n_users"] > 0].reset_index(drop=True)


def q_rel_transitions(sf_dir: str, *, num_partitions: int = 32):
    """Event-sequence transition census — (prev_type, next_type, n) over
    each user's time-ordered stream (the Markov-chain / clickstream-path
    mining primitive). Order is (ts, event_id) so equal timestamps break
    deterministically. ONE user-hash exchange; per partition every user's
    stream sorts once and the lag is a vectorized shift (transitions
    where the user changes are masked out); only the ≤|types|² census
    leaves each partition."""
    ds = _read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id", "event_type"]
    )

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame(
                {
                    "user_id": pd.Series([], dtype="int64"),
                    "t": pd.Series([], dtype="int64"),
                    "eid": pd.Series([], dtype="int64"),
                    "typ": pd.Series([], dtype=object),
                    "_part": pd.Series([], dtype="int64"),
                }
            )
        out = pd.DataFrame(
            {
                "user_id": b["user_id"].astype("int64"),
                "t": b["ts"].astype("datetime64[us]").astype("int64"),
                "eid": b["event_id"].astype("int64"),
                "typ": b["event_type"].astype(object),
            }
        )
        out["_part"] = (
            pd.util.hash_array(out["user_id"].to_numpy()) % num_partitions
        ).astype("int64")
        return out

    def census(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "prev_type": pd.Series([], dtype=object),
                "next_type": pd.Series([], dtype=object),
                "n": pd.Series([], dtype="int64"),
            }
        )
        if not len(g) or "typ" not in g.columns:
            return empty
        d = g.sort_values(["user_id", "t", "eid"], ignore_index=True)
        same = d["user_id"].eq(d["user_id"].shift())
        out = pd.DataFrame(
            {
                "prev_type": d["typ"].shift().astype(object),
                "next_type": d["typ"].astype(object),
                "n": np.int64(1),
            }
        )[same.to_numpy()]
        if not len(out):
            return empty
        return (
            out.groupby(["prev_type", "next_type"], sort=False, as_index=False)["n"]
            .sum()
            .astype({"n": "int64"})
        )

    from ray.data.aggregate import Sum

    return (
        ds.map_batches(tag, batch_format="pandas")
        .groupby("_part")
        .map_groups(census, batch_format="pandas")
        .groupby(["prev_type", "next_type"])
        .aggregate(Sum("n", alias_name="n"))
    )


def q_rel_listagg(sf_dir: str, *, k: int = 5):
    """Ordered LISTAGG / string_agg — per order priority, the first k
    orderkeys ascending rendered as a comma list. List aggregation is
    order-sensitive, so the distributed form must fix the order BEFORE
    concatenation: per-batch min-k partials (≤ k×priorities rows per
    batch) tree-fold by re-selection, the string renders ONCE on the
    tiny fold result — never concatenate partial strings."""
    from ..stages.folds import tree_fold_tables

    ds = _read_parquet_clean(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame(
                {
                    "o_orderpriority": pd.Series([], dtype=object),
                    "k_": pd.Series([], dtype="int64"),
                }
            )
        return (
            pd.DataFrame(
                {
                    "o_orderpriority": b["o_orderpriority"].astype(object),
                    "k_": b["o_orderkey"].astype("int64"),
                }
            )
            .sort_values("k_")
            .groupby("o_orderpriority", sort=False)
            .head(k)
        )

    def combine(frames):
        df = pd.concat(frames, ignore_index=True)
        return df.sort_values("k_").groupby("o_orderpriority", sort=False).head(k)

    folded = tree_fold_tables(ds.map_batches(partial, batch_format="pandas"), combine)
    if folded is None or not len(folded):
        return pd.DataFrame(
            {
                "o_orderpriority": pd.Series([], dtype=object),
                "first_keys": pd.Series([], dtype=object),
            }
        )
    out = (
        folded.sort_values("k_")
        .groupby("o_orderpriority", sort=True)["k_"]
        .agg(lambda s: ",".join(map(str, s)))
        .rename("first_keys")
        .reset_index()
    )
    out["o_orderpriority"] = out["o_orderpriority"].astype(object)
    out["first_keys"] = out["first_keys"].astype(object)
    return out


def q_rel_json_extract(sf_dir: str):
    """JSON column processing — parse ``events.props`` (JSON objects) and
    aggregate the ``k`` field per event type. The parse is per-batch
    vectorized DuckDB-over-Arrow? No — plain pandas str JSON decoding is
    a Python loop; instead the fixed object shape lets a compiled regex
    extract the field zero-copy per batch, with a json.loads fallback for
    rows the regex misses (robustness without the hot-path cost). Partial
    (type, n, sum, max) folds → tiny aggregate."""
    import re as _re

    from ray.data.aggregate import Max, Sum

    pat = _re.compile(r'"k"\s*:\s*(-?\d+)')
    ds = _read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_type", "props"]
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "event_type": pd.Series([], dtype=object),
                "n": pd.Series([], dtype="int64"),
                "sum_k": pd.Series([], dtype="int64"),
                "max_k": pd.Series([], dtype="int64"),
            }
        )
        if not len(b):
            return empty
        ext = b["props"].str.extract(pat, expand=False)
        miss = ext.isna()
        if miss.any():  # fallback: real JSON decode for irregular rows
            import json as _json

            ext = ext.copy()
            ext[miss] = [
                str(_json.loads(x).get("k")) if x else None
                for x in b["props"][miss]
            ]
        kv = ext.astype("int64")
        g = (
            pd.DataFrame({"event_type": b["event_type"].astype(object), "kv": kv})
            .groupby("event_type", sort=False)["kv"]
            .agg(n="size", sum_k="sum", max_k="max")
            .reset_index()
        )
        return g.astype({"n": "int64", "sum_k": "int64", "max_k": "int64"})

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("event_type")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sum_k", alias_name="sum_k"),
            Max("max_k", alias_name="max_k"),
        )
    )


def q_rel_histogram(sf_dir: str, *, num_buckets: int = 16):
    """Equi-width histogram of l_extendedprice — the profiling primitive
    whose bucket bounds depend on GLOBAL data extent, so it is inherently
    two-pass: (1) per-batch (min, max) partials fold to the global extent
    on the driver (two ints — broadcast as plain closure args), (2) one
    map pass buckets every row in exact integer math
    ``(cents − lo) · nb // (hi − lo + 1)`` (never a float width) and
    emits per-batch censuses; the ≤ nb·batches partial rows fold in one
    tiny final groupby. Identical integer formula in the SQL oracle."""
    ds = _read_parquet_clean(f"{sf_dir}/lineitem.parquet", columns=["l_extendedprice"])

    def extent(b: pd.DataFrame) -> pd.DataFrame:
        cents = (b["l_extendedprice"] * 100).round().astype("int64")
        return pd.DataFrame({"lo": [cents.min()], "hi": [cents.max()]})

    ext = ds.map_batches(extent, batch_format="pandas").to_pandas()
    lo, hi = int(ext["lo"].min()), int(ext["hi"].max())
    span = hi - lo + 1

    def census(b: pd.DataFrame) -> pd.DataFrame:
        cents = (b["l_extendedprice"] * 100).round().astype("int64")
        bucket = (cents - lo) * num_buckets // span
        g = (
            pd.DataFrame({"bucket": bucket, "cents": cents})
            .groupby("bucket", sort=False)["cents"]
            .agg(n_rows="size", lo_cents="min", hi_cents="max")
            .reset_index()
        )
        return g.astype("int64")

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        out = (
            df.groupby("bucket", sort=True)
            .agg(
                n_rows=("n_rows", "sum"),
                lo_cents=("lo_cents", "min"),
                hi_cents=("hi_cents", "max"),
            )
            .reset_index()
        )
        return out.astype("int64")

    return (
        ds.map_batches(census, batch_format="pandas")
        .repartition(1)
        .map_batches(fold, batch_format="pandas")
    )


def q_rel_row_number(sf_dir: str, *, num_partitions: int = 32):
    """Global ``ROW_NUMBER() OVER (ORDER BY o_orderkey)`` WITHOUT a
    single-node sort — the range-partitioned rank plan every distributed
    sort uses: (1) a two-int extent fold fixes equal-width integer key
    ranges (o_orderkey is uniform; skewed keys would take sampled-quantile
    bounds instead — documented), (2) a per-range count census folds to
    DRIVER prefix offsets (num_partitions ints), (3) each range partition
    sorts locally and adds its offset. Shuffle = the rows once, keyed by
    range — already sorted BETWEEN partitions by construction."""
    ds = _read_parquet_clean(f"{sf_dir}/orders.parquet", columns=["o_orderkey"])

    def extent(b: pd.DataFrame) -> pd.DataFrame:
        k = b["o_orderkey"].astype("int64")
        return pd.DataFrame({"lo": [k.min()], "hi": [k.max()]})

    ext = ds.map_batches(extent, batch_format="pandas").to_pandas()
    lo, hi = int(ext["lo"].min()), int(ext["hi"].max())
    span = hi - lo + 1

    def census(b: pd.DataFrame) -> pd.DataFrame:
        k = b["o_orderkey"].astype("int64")
        part = (k - lo) * num_partitions // span
        g = part.value_counts().sort_index()
        return pd.DataFrame({"part": g.index.astype("int64"), "n": g.to_numpy("int64")})

    cens = ds.map_batches(census, batch_format="pandas").to_pandas()
    sizes = cens.groupby("part")["n"].sum().reindex(range(num_partitions), fill_value=0)
    offsets = sizes.cumsum().shift(fill_value=0).astype("int64").to_dict()

    def rank_part(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame(
                {"o_orderkey": pd.Series([], dtype="int64"),
                 "rn": pd.Series([], dtype="int64")}
            )
        k = g["o_orderkey"].sort_values(ignore_index=True).astype("int64")
        off = offsets[int(g["_part"].iloc[0])]
        return pd.DataFrame(
            {"o_orderkey": k, "rn": np.arange(1, len(k) + 1, dtype="int64") + off}
        )

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        k = b["o_orderkey"].astype("int64")
        return pd.DataFrame(
            {"o_orderkey": k, "_part": ((k - lo) * num_partitions // span).astype("int64")}
        )

    return (
        ds.map_batches(tag, batch_format="pandas")
        .groupby("_part")
        .map_groups(rank_part, batch_format="pandas")
    )


def q_rel_kmv_distinct(sf_dir: str):
    """KMV (bottom-k) distinct-part sketch — the mergeable distinct
    sketch whose state is EXACT integers, so unlike the HLL twin
    (``rel_approx_distinct``) the estimate itself hash-matches a DuckDB
    rendering of the same bottom-k + integer-division estimator."""
    from ..stages.skew import kmv_distinct

    li = _read_parquet_clean(f"{sf_dir}/lineitem.parquet", columns=["l_partkey"])
    return kmv_distinct(li, "l_partkey")


def q_rel_cms_counts(sf_dir: str, *, keys=tuple(range(1, 16))):
    """Count-min sketch point estimates of per-customer order counts.

    The sketch folds as d·w int64 per block (frequency analogue of the
    KMV/HLL discipline); estimates are deterministic over-counts whose
    SQL twin renders each hash row as a collision-class count and takes
    LEAST(...) — bit-identical, so the oracle hash-matches."""
    from ..stages.skew import cms_counts

    orders = _read_parquet_clean(f"{sf_dir}/orders.parquet", columns=["o_custkey"])
    return cms_counts(orders, "o_custkey", keys)


def q_text_bigram_logprob(sf_dir: str):
    """Per-doc bigram-LM score (stages/text.py::text_bigram_logprob —
    quantized integer conditional log-probs, bigram-table broadcast)."""
    from ..stages.text import text_bigram_logprob

    return text_bigram_logprob(sf_dir)


def q_rel_ntile(sf_dir: str, *, k: int = 4, num_partitions: int = 32):
    """Global ``NTILE(4) OVER (ORDER BY price_cents, c_custkey)`` —
    equal-height bucketing over a distributed order, on the same
    range-partitioned rank plan as ``rel_row_number``: extent fold →
    integer key ranges (ties share a range, so the cross-partition order
    is total) → per-range census → driver prefix offsets → per-range
    local sort + the exact SQL NTILE split (the first ``N % k`` tiles get
    one extra row). Rows shuffle once."""
    ds = _read_parquet_clean(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_acctbal"]
    )

    def to_cents(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "c_custkey": b["c_custkey"].astype("int64"),
                "price_cents": (b["c_acctbal"] * 100).round().astype("int64"),
            }
        )

    cents = ds.map_batches(to_cents, batch_format="pandas")

    def extent(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"lo": [b["price_cents"].min()], "hi": [b["price_cents"].max()]}
        )

    ext = cents.map_batches(extent, batch_format="pandas").to_pandas()
    lo, hi = int(ext["lo"].min()), int(ext["hi"].max())
    span = hi - lo + 1

    def census(b: pd.DataFrame) -> pd.DataFrame:
        part = (b["price_cents"].astype("int64") - lo) * num_partitions // span
        g = part.value_counts().sort_index()
        return pd.DataFrame({"part": g.index.astype("int64"), "n": g.to_numpy("int64")})

    cens = cents.map_batches(census, batch_format="pandas").to_pandas()
    sizes = cens.groupby("part")["n"].sum().reindex(
        range(num_partitions), fill_value=0
    )
    offsets = sizes.cumsum().shift(fill_value=0).astype("int64").to_dict()
    n_total = int(sizes.sum())
    size_small = n_total // k
    n_big = n_total % k
    cut = n_big * (size_small + 1)

    def tile_of(r: np.ndarray) -> np.ndarray:
        """1-based global rank → SQL NTILE bucket (exact split)."""
        big = (r - 1) // (size_small + 1) + 1
        small = n_big + (r - 1 - cut) // max(size_small, 1) + 1
        return np.where(r <= cut, big, small).astype("int64")

    def rank_part(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame(
                {
                    "c_custkey": pd.Series([], dtype="int64"),
                    "price_cents": pd.Series([], dtype="int64"),
                    "tile": pd.Series([], dtype="int64"),
                }
            )
        s = g.sort_values(["price_cents", "c_custkey"], ignore_index=True)
        off = offsets[int(g["_part"].iloc[0])]
        r = np.arange(1, len(s) + 1, dtype="int64") + off
        return pd.DataFrame(
            {
                "c_custkey": s["c_custkey"].astype("int64"),
                "price_cents": s["price_cents"].astype("int64"),
                "tile": tile_of(r),
            }
        )

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["_part"] = (
            (b["price_cents"].astype("int64") - lo) * num_partitions // span
        ).astype("int64")
        return b

    return (
        cents.map_batches(tag, batch_format="pandas")
        .groupby("_part")
        .map_groups(rank_part, batch_format="pandas")
    )


def q_ann_pq(sf_dir: str):
    """Product-quantization ANN (stages/similarity.py::ann_pq — codes not
    vectors cross the scan at scale; exact rerank of ADC survivors).
    Rows-only; recall vs the exact ann_topk asserted in tests."""
    from ..stages.similarity import ann_pq

    return ann_pq(sf_dir)


def q_text_bpe_train(sf_dir: str):
    """Corpus BPE merge learning (stages/text.py::text_bpe_train — word
    census fold + deterministic driver merge loop). Rows-only; sequential
    whole-corpus replay asserted in tests."""
    from ..stages.text import text_bpe_train

    return text_bpe_train(sf_dir)


def q_rel_winsorize(sf_dir: str):
    """Winsorization census — the outlier-trim preprocessing op: clip
    l_extendedprice cents to its [p05, p95] and report the clip counts +
    winsorized sum. Composes the histogram-selection exact quantiles
    (``skew.exact_quantiles`` — quantile_disc convention, no global sort)
    with ONE stateless clip pass whose per-batch integer partials
    tree-fold to a single row. DuckDB oracle: quantile_disc + CASE sums."""
    from ..stages.folds import tree_fold_tables
    from ..stages.skew import exact_quantiles

    ds = _read_parquet_clean(
        f"{sf_dir}/lineitem.parquet", columns=["l_extendedprice"]
    )

    def cents(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"c": (b["l_extendedprice"] * 100).round().astype("int64")}
        )

    cds = ds.map_batches(cents, batch_format="pandas").materialize()
    qs = exact_quantiles(cds, "c", [0.05, 0.95])
    lo, hi = int(qs[0.05]), int(qs[0.95])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        c = b["c"].to_numpy()
        return pd.DataFrame(
            {
                "n_lo": [int((c < lo).sum())],
                "n_hi": [int((c > hi).sum())],
                "sum_wins": [int(np.clip(c, lo, hi).sum())],
            }
        )

    def combine(frames):
        df = pd.concat(frames, ignore_index=True)
        return pd.DataFrame(
            {
                "n_lo": [int(df["n_lo"].sum())],
                "n_hi": [int(df["n_hi"].sum())],
                "sum_wins": [int(df["sum_wins"].sum())],
            }
        )

    folded = tree_fold_tables(cds.map_batches(partial, batch_format="pandas"), combine)
    return pd.DataFrame(
        {
            "p05_cents": np.array([lo], dtype="int64"),
            "p95_cents": np.array([hi], dtype="int64"),
            "n_clipped_lo": np.array([folded["n_lo"][0]], dtype="int64"),
            "n_clipped_hi": np.array([folded["n_hi"][0]], dtype="int64"),
            "sum_winsorized_cents": np.array([folded["sum_wins"][0]], dtype="int64"),
        }
    )


def q_rel_time_weighted(sf_dir: str):
    """Per-user TIME-WEIGHTED average event value — the metric where each
    observation holds until the next one (billing/telemetry semantics):
    Σ value·Δt / Σ Δt over (ts, event_id)-ordered events, users with ≥2
    events. ONE user-hash exchange; per-partition vectorized shift with
    user-boundary masking (the ``rel_transitions`` ordering discipline);
    the average stays EXACT as an integer (num, den) pair + floor-division
    quotient, so the LEAD-window oracle hash-matches."""
    ds = _read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "value"]
    )
    P = 32

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": b["user_id"].astype("int64"),
                "event_id": b["event_id"].astype("int64"),
                # truncate-to-seconds via datetime64[s] (the established
                # engine-portable convention; matches floor(epoch(ts)))
                "epoch": b["ts"].astype("datetime64[s]").astype("int64"),
                "cents": (b["value"] * 100).round().astype("int64"),
                "_part": (b["user_id"].astype("int64") % P),
            }
        )

    def twa_part(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "user_id": pd.Series([], dtype="int64"),
                "num": pd.Series([], dtype="int64"),
                "den": pd.Series([], dtype="int64"),
                "twa_q": pd.Series([], dtype="int64"),
            }
        )
        if not len(g):
            return empty
        s = g.sort_values(["user_id", "epoch", "event_id"], ignore_index=True)
        u = s["user_id"].to_numpy()
        e = s["epoch"].to_numpy()
        c = s["cents"].to_numpy()
        same = u[:-1] == u[1:]
        dt = (e[1:] - e[:-1])[same]
        num = c[:-1][same] * dt
        uu = u[:-1][same]
        df = pd.DataFrame({"u": uu, "num": num, "den": dt})
        agg = df.groupby("u", sort=False, as_index=False).sum()
        agg = agg[agg["den"] > 0]
        if not len(agg):
            return empty
        return pd.DataFrame(
            {
                "user_id": agg["u"].astype("int64"),
                "num": agg["num"].astype("int64"),
                "den": agg["den"].astype("int64"),
                "twa_q": (agg["num"] // agg["den"]).astype("int64"),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pandas")
        .groupby("_part")
        .map_groups(twa_part, batch_format="pandas")
    )


def q_rel_key_skew(sf_dir: str):
    """Key-distribution skew diagnostic — the reconnaissance a
    partitioner runs before choosing salts: distinct-key count, top-1 key
    share, and the Gini coefficient of the l_partkey frequency
    distribution, ALL as exact integers (Gini as its numerator /
    denominator pair: Σ(2i−n−1)·x_(i) over count-ascending order is
    tie-order-independent). Per-batch value_counts partials tree-fold to
    the key-class count table (the heavy-hitters discipline); the
    statistics evaluate once on the fold. Window-function oracle."""
    from ..stages.folds import tree_fold_tables

    ds = _read_parquet_clean(f"{sf_dir}/lineitem.parquet", columns=["l_partkey"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        vc = b["l_partkey"].value_counts()
        return pd.DataFrame(
            {"k": vc.index.astype("int64"), "n": vc.to_numpy().astype("int64")}
        )

    def combine(frames):
        df = pd.concat(frames, ignore_index=True)
        return df.groupby("k", sort=False, as_index=False)["n"].sum()

    folded = tree_fold_tables(ds.map_batches(partial, batch_format="pandas"), combine)
    if folded is None or not len(folded):
        z = np.array([0], dtype="int64")
        return pd.DataFrame(
            {"n_keys": z, "n_rows": z, "top1_share_q": z, "gini_num": z, "gini_den": z}
        )
    x = np.sort(folded["n"].to_numpy(dtype=np.int64))
    n = len(x)
    total = int(x.sum())
    i = np.arange(1, n + 1, dtype=np.int64)
    gini_num = int(((2 * i - n - 1) * x).sum())
    gini_den = n * total
    return pd.DataFrame(
        {
            "n_keys": np.array([n], dtype="int64"),
            "n_rows": np.array([total], dtype="int64"),
            "top1_share_q": np.array([1_000_000 * int(x[-1]) // total], dtype="int64"),
            "gini_num": np.array([gini_num], dtype="int64"),
            "gini_den": np.array([gini_den], dtype="int64"),
        }
    )


def q_multimodal_phash_near_dup(sf_dir: str):
    """Near-duplicate image PAIRS by banded perceptual-hash Hamming LSH
    with exact popcount rerank (stages/multimodal.py::image_phash_near_dup
    — exact recall at the radius by pigeonhole). Rows-only check: the
    near-dup set is NOT SQL-expressible here — aHashes of the
    sha-repeated fake payloads are structured, so genuine 1-3-bit
    near-collisions occur between DISTINCT texts (measured: 52 pairs vs
    8 same-text pairs at sf0.1); exactness is asserted in tests against
    a brute-force popcount."""
    import pandas as pd

    from ..stages.multimodal import image_phash_near_dup

    out = image_phash_near_dup(sf_dir).materialize()
    if out.count() == 0:
        # Ray 2.49 drops the schema of an empty Dataset — hand back the
        # typed empty frame so the comparison keeps its columns
        return pd.DataFrame(
            {c: pd.Series([], dtype="int64") for c in ("a", "b", "hamming")}
        )
    return out


def q_multimodal_phash_dedup(sf_dir: str):
    """Perceptual-hash image dedup clusters (stages/multimodal.py::
    image_phash_dedup — aHash64 actor pool + one integer-key exchange);
    oracle groups by source text (identical payloads ⟺ identical text on
    this deterministic corpus)."""
    from ..stages.multimodal import image_phash_dedup

    return image_phash_dedup(sf_dir)


def q_rel_mad(sf_dir: str):
    """Median absolute deviation of l_extendedprice cents — the robust
    dispersion statistic: median m (histogram-selection exact quantile,
    no global sort), then the median of |x − m| via a SECOND quantile
    pass over the deviation stream (quantiles don't compose, so the
    two-pass shape is forced — each pass is the 3-scan
    ``skew.exact_quantiles`` plan). quantile_disc convention both times;
    DuckDB oracle: nested quantile_disc."""
    from ..stages.skew import exact_quantiles

    ds = _read_parquet_clean(
        f"{sf_dir}/lineitem.parquet", columns=["l_extendedprice"]
    )

    def cents(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"c": (b["l_extendedprice"] * 100).round().astype("int64")}
        )

    cds = ds.map_batches(cents, batch_format="pandas").materialize()
    med = int(exact_quantiles(cds, "c", [0.5])[0.5])

    def dev(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"d": (b["c"] - med).abs().astype("int64")})

    dds = cds.map_batches(dev, batch_format="pandas")
    mad = int(exact_quantiles(dds, "d", [0.5])[0.5])
    return pd.DataFrame(
        {
            "median_cents": np.array([med], dtype="int64"),
            "mad_cents": np.array([mad], dtype="int64"),
        }
    )


_PROFILE_COLS = (
    ("o_orderkey", "int"),
    ("o_custkey", "int"),
    ("o_orderstatus", "str"),
    ("o_orderpriority", "str"),
    ("o_totalprice", "cents"),
)


def q_rel_table_profile(sf_dir: str, *, num_partitions: int = 16):
    """ANALYZE-style per-column statistics census over ``orders`` —
    (column, n_rows, n_null, n_distinct, min_repr, max_repr), the
    optimizer-statistics op every engine ships.

    Counts + min/max fold as per-batch partials (tiny). EXACT multi-column
    distinct uses ONE exchange total: every batch emits its deduped
    (column, value-string) pairs, rows co-partition on the pair hash, and
    per-partition distinct counts per column sum — shuffle volume is the
    Σ-distinct payload itself, never column × pass. min/max evaluate on
    the NATIVE type before string rendering (string min of int renders
    would be wrong). DuckDB oracle: per-column UNION ALL aggregates."""
    from ..stages.folds import tree_fold_tables

    cols = [c for c, _ in _PROFILE_COLS]
    ds = _read_parquet_clean(f"{sf_dir}/orders.parquet", columns=cols)

    def native(b: pd.DataFrame, name: str, kind: str) -> pd.Series:
        if kind == "cents":
            return (b[name] * 100).round().astype("Int64")
        if kind == "int":
            # a nullable int column crosses Arrow→pandas as float64 (NaN
            # for null) — pin the nullable-int dtype so renders are "7",
            # never "7.0"
            return b[name].astype("Int64")
        return b[name]

    def mmn_partial(b: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for name, kind in _PROFILE_COLS:
            s = native(b, name, kind)
            nn = int(s.isna().sum())
            sv = s.dropna()
            rows.append(
                (
                    name,
                    len(b),
                    nn,
                    str(sv.min()) if len(sv) else None,
                    str(sv.max()) if len(sv) else None,
                    "int" if kind != "str" else "str",
                )
            )
        return pd.DataFrame(
            rows, columns=["column", "n", "n_null", "mn", "mx", "kind"]
        )

    def mmn_combine(frames):
        df = pd.concat(frames, ignore_index=True)

        def fold(g: pd.DataFrame) -> pd.Series:
            kind = g["kind"].iloc[0]
            mn = g["mn"].dropna()
            mx = g["mx"].dropna()
            key = (lambda s: s.astype("int64")) if kind == "int" else (lambda s: s)
            return pd.Series(
                {
                    "n": int(g["n"].sum()),
                    "n_null": int(g["n_null"].sum()),
                    "mn": str(key(mn).min()) if len(mn) else None,
                    "mx": str(key(mx).max()) if len(mx) else None,
                    "kind": kind,
                }
            )

        return df.groupby("column", sort=False).apply(fold).reset_index()

    mmn = tree_fold_tables(ds.map_batches(mmn_partial, batch_format="pandas"), mmn_combine)

    def pair_partial(b: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for name, kind in _PROFILE_COLS:
            vals = native(b, name, kind).dropna().astype(str).drop_duplicates()
            frames.append(pd.DataFrame({"column": name, "v": vals.to_numpy(dtype=object)}))
        out = pd.concat(frames, ignore_index=True)
        out["_part"] = (
            pd.util.hash_array(
                (out["column"] + "\x00" + out["v"]).to_numpy(dtype=object)
            )
            % num_partitions
        ).astype("int64")
        return out

    def distinct_part(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"column": pd.Series([], dtype=object), "nd": pd.Series([], dtype="int64")}
        )
        if not len(g) or "column" not in g.columns:
            return empty
        d = g[["column", "v"]].drop_duplicates()
        out = d.groupby("column", sort=False, as_index=False).size()
        return pd.DataFrame(
            {"column": out["column"].astype(object), "nd": out["size"].astype("int64")}
        )

    def nd_combine(frames):
        df = pd.concat(frames, ignore_index=True)
        return df.groupby("column", sort=False, as_index=False)["nd"].sum()

    nd = tree_fold_tables(
        ds.map_batches(pair_partial, batch_format="pandas")
        .groupby("_part")
        .map_groups(distinct_part, batch_format="pandas"),
        nd_combine,
    )
    ndm = dict(zip(nd["column"], nd["nd"])) if nd is not None else {}
    out = mmn.sort_values("column", ignore_index=True)
    return pd.DataFrame(
        {
            "column": out["column"].astype(object),
            "n_rows": out["n"].astype("int64"),
            "n_null": out["n_null"].astype("int64"),
            "n_distinct": np.array(
                [int(ndm.get(c, 0)) for c in out["column"]], dtype="int64"
            ),
            "min_repr": out["mn"].astype(object),
            "max_repr": out["mx"].astype(object),
        }
    )


def q_text_chunk(sf_dir: str):
    """Overlapping token-window chunking for RAG/context prep
    (stages/text.py::text_chunk — in-batch fanout, content-pinning sha)."""
    from ..stages.text import text_chunk

    return text_chunk(sf_dir)
