"""Graph analytics stages (stages/graph.py) + the new text/rel ops.

Components are verified against an in-process union-find over the same
edges (the sequential oracle); censuses against pandas references computed
from the same synthetic triple frame.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tripsu_ray.schema import KIND_IRI, KIND_LITERAL, RDF_TYPE
from tripsu_ray.stages import graph
from tripsu_ray.stages.dedup import _components


def _triples_df(rng: np.random.Generator, n: int = 400) -> pd.DataFrame:
    subs = [f"http://x/s{i}" for i in rng.integers(0, 40, n)]
    preds = [f"http://x/p{i}" for i in rng.integers(0, 6, n)]
    kinds = rng.integers(0, 2, n)  # iri | literal objects
    objs = [
        f"http://x/o{i}" if k == 0 else f"lit{i}"
        for i, k in zip(rng.integers(0, 50, n), kinds)
    ]
    df = pd.DataFrame(
        {
            "subject": subs,
            "subject_kind": np.zeros(n, np.int8),
            "predicate": preds,
            "object_value": objs,
            "object_kind": np.where(kinds == 0, KIND_IRI, KIND_LITERAL).astype(np.int8),
            "object_lang": pd.Series([None] * n, dtype="string"),
            "object_datatype": pd.Series([None] * n, dtype="string"),
        }
    )
    # inject duplicates across future batches to exercise the global dedup
    return pd.concat([df, df.iloc[: n // 3]], ignore_index=True)


def _ds(df: pd.DataFrame, blocks: int = 5):
    import pyarrow as pa
    import ray.data

    from tripsu_ray.schema import TRIPLES

    if set(df.columns) == set(TRIPLES.names):
        # explicit Arrow schema: an all-null pandas column otherwise
        # converts to Arrow null type and breaks string kernels
        tbl = pa.Table.from_pandas(df, schema=TRIPLES, preserve_index=False)
        return ray.data.from_arrow(tbl).repartition(blocks)
    return ray.data.from_pandas(df).repartition(blocks)


@pytest.mark.usefixtures("ray_session")
class TestGraphStages:
    def test_degree_census_matches_pandas(self):
        df = _triples_df(np.random.default_rng(3))
        got = graph.degree_census(_ds(df)).to_pandas()
        dt = df.drop_duplicates(
            ["subject", "predicate", "object_value", "object_kind"]
        )
        want = (
            dt.groupby("subject")
            .agg(out_degree=("predicate", "size"), n_predicates=("predicate", "nunique"))
            .reset_index()
        )
        got = got.sort_values("subject", ignore_index=True)
        want = want.sort_values("subject", ignore_index=True).astype(
            {"out_degree": "int64", "n_predicates": "int64"}
        )
        pd.testing.assert_frame_equal(got, want)

    def test_predicate_census_matches_pandas(self):
        df = _triples_df(np.random.default_rng(4))
        got = graph.predicate_census(_ds(df)).to_pandas()
        dt = df.drop_duplicates(
            ["subject", "predicate", "object_value", "object_kind"]
        )
        want = (
            dt.groupby("predicate")
            .agg(n_triples=("subject", "size"), n_subjects=("subject", "nunique"))
            .reset_index()
            .astype({"n_triples": "int64", "n_subjects": "int64"})
        )
        got = got.sort_values("predicate", ignore_index=True)
        want = want.sort_values("predicate", ignore_index=True)
        pd.testing.assert_frame_equal(got, want)

    def test_entity_edges_excludes_type_literals_selfloops(self):
        df = pd.DataFrame(
            {
                "subject": ["http://x/a", "http://x/a", "http://x/b", "http://x/c"],
                "subject_kind": np.zeros(4, np.int8),
                "predicate": ["http://x/p", RDF_TYPE, "http://x/p", "http://x/p"],
                "object_value": ["http://x/b", "http://x/T", "lit", "http://x/c"],
                "object_kind": np.array(
                    [KIND_IRI, KIND_IRI, KIND_LITERAL, KIND_IRI], np.int8
                ),
                "object_lang": pd.Series([None] * 4, dtype="string"),
                "object_datatype": pd.Series([None] * 4, dtype="string"),
            }
        )
        got = graph.entity_edges(_ds(df, blocks=2)).to_pandas()
        assert got.to_records(index=False).tolist() == [("http://x/a", "http://x/b")]

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_components_equal_union_find(self, seed):
        rng = np.random.default_rng(seed)
        n_edges = 300
        a = [f"n{i:03d}" for i in rng.integers(0, 120, n_edges)]
        b = [f"n{i:03d}" for i in rng.integers(0, 120, n_edges)]
        pairs = [(x, y) for x, y in zip(a, b) if x != y]
        df = pd.DataFrame(pairs, columns=["a", "b"])
        got = graph.connected_components_str(_ds(df, blocks=4))
        uf = _components(pairs)
        # union-find returns min-root labels for every touched node
        assert got == uf

    def test_components_table_empty(self):
        df = pd.DataFrame({"a": pd.Series([], dtype=object), "b": pd.Series([], dtype=object)})
        out = graph.components_table(_ds(df, blocks=1))
        assert len(out) == 0 and list(out.columns) == ["node", "component"]

    def test_chain_collapses_to_one_component(self):
        # long chain exercises the log-round compression (diameter ≫ rounds)
        nodes = [f"c{i:04d}" for i in range(200)]
        df = pd.DataFrame({"a": nodes[:-1], "b": nodes[1:]})
        got = graph.connected_components_str(_ds(df, blocks=6))
        assert set(got.values()) == {"c0000"}
        assert len(got) == 200


@pytest.mark.usefixtures("ray_session")
class TestNewTextRelOps:
    def test_vocab_matches_pandas(self, tmp_path):
        docs = pd.DataFrame(
            {
                "doc_id": np.arange(6, dtype=np.int64),
                "text": [
                    "the cat and the hat",
                    "a cat, a hat!",
                    "Dogs and CATS",
                    "",
                    "cat cat cat",
                    "42 cats 42",
                ],
            }
        )
        docs.to_parquet(tmp_path / "documents.parquet")
        from tripsu_ray.stages.text import _token_pat, text_vocab

        got = text_vocab(str(tmp_path))
        flat = docs["text"].str.lower().str.findall(_token_pat).explode().dropna()
        want = (
            flat.value_counts()
            .rename_axis("token")
            .reset_index(name="n")
            .sort_values(["n", "token"], ascending=[False, True], ignore_index=True)
            .astype({"n": "int64"})
        )
        pd.testing.assert_frame_equal(got.reset_index(drop=True), want)

    def test_decontaminate_self_and_cross_hits(self, tmp_path):
        from tripsu_ray.stages import text as T

        snippet_src = "x" * T.BENCH_OFF + "NEEDLE" * 11  # 66 chars ≥ BENCH_LEN
        snippet = snippet_src[T.BENCH_OFF : T.BENCH_OFF + T.BENCH_LEN]
        docs = pd.DataFrame(
            {
                "doc_id": np.array([0, 1, 2], dtype=np.int64),
                "text": [snippet_src, "clean document", "prefix " + snippet + " suffix"],
            }
        )
        docs.to_parquet(tmp_path / "documents.parquet")
        out = (
            T.text_decontaminate(str(tmp_path))
            .to_pandas()
            .sort_values("doc_id", ignore_index=True)
        )
        assert out["n_bench_hits"].tolist() == [1, 0, 1]
        assert out["contaminated"].tolist() == [1, 0, 1]

    def test_snippet_scan_kernel_equals_contains_loop(self):
        """The rolling-hash multi-pattern kernel (the above-gate scale
        path) must be bit-identical to the per-snippet contains loop —
        incl. duplicate snippets (count per list entry), repeated
        occurrences in one doc (count once), variable lengths, and
        windows spanning doc boundaries (must not match)."""
        from tripsu_ray.stages.text import SnippetScanKernel

        rng = np.random.default_rng(31)
        alpha = list("abcde ")
        texts = [
            "".join(rng.choice(alpha, size=int(n))) for n in rng.integers(0, 400, 60)
        ]
        # snippets: some carved from the texts (guaranteed hits, various
        # lengths), one duplicated, some random misses
        snips = [t[5:5 + L] for t, L in zip(texts[:8], (7, 7, 12, 20, 3, 9, 31, 16))
                 if len(t) > 40]
        snips += snips[:1]  # duplicate entry counts double
        snips += ["zzzz", "qqq"]  # guaranteed misses
        # a boundary-spanning probe: end of texts[0] + start of texts[1]
        if len(texts[0]) >= 4 and len(texts[1]) >= 4:
            snips.append(texts[0][-4:] + texts[1][:4])
        texts.append(texts[0])  # duplicate doc
        texts.append("")        # empty doc

        k = SnippetScanKernel(snips)
        got = k.count_hits(pd.Series(texts))
        want = np.zeros(len(texts), dtype=np.int64)
        se = pd.Series(texts)
        for s in snips:
            want += se.str.contains(s, regex=False).to_numpy()
        assert got.tolist() == want.tolist()
        assert want.sum() > 0  # the fixture actually exercises hits

    def test_snippet_scan_beats_contains_at_1e4_snippets(self):
        """At 10^4 snippets one rolling-hash pass must beat 10^4
        vectorized contains passes (the documented crossover)."""
        import time

        from tripsu_ray.stages.text import SnippetScanKernel

        rng = np.random.default_rng(7)
        alpha = list("abcdefgh ")
        texts = pd.Series(
            ["".join(rng.choice(alpha, size=500)) for _ in range(50)]
        )
        snips = ["".join(rng.choice(alpha, size=24)) for _ in range(10_000)]
        k = SnippetScanKernel(snips)  # build cost excluded: once per actor
        t0 = time.perf_counter()
        got = k.count_hits(texts)
        t_scan = time.perf_counter() - t0
        t0 = time.perf_counter()
        want = np.zeros(len(texts), dtype=np.int64)
        for s in snips:
            want += texts.str.contains(s, regex=False).to_numpy()
        t_contains = time.perf_counter() - t0
        assert got.tolist() == want.tolist()
        assert t_scan < t_contains, (t_scan, t_contains)

    def test_decontaminate_scale_path_equals_contains(self, tmp_path, monkeypatch):
        """Forcing the gate to 0 sends text_decontaminate through the
        actor-pool kernel; results must match the contains path exactly."""
        from tripsu_ray.stages import text as T

        rng = np.random.default_rng(11)
        base = "x" * T.BENCH_OFF
        texts = [
            base + "".join(rng.choice(list("abc "), size=200)) for _ in range(200)
        ]
        docs = pd.DataFrame(
            {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
        )
        docs.to_parquet(tmp_path / "documents.parquet")
        want = (
            T.text_decontaminate(str(tmp_path))
            .to_pandas().sort_values("doc_id", ignore_index=True)
        )
        monkeypatch.setattr(T, "_DECON_CONTAINS_MAX", 0)
        got = (
            T.text_decontaminate(str(tmp_path))
            .to_pandas().sort_values("doc_id", ignore_index=True)
        )
        pd.testing.assert_frame_equal(got, want)
        assert want["contaminated"].sum() > 0

    def test_rel_sample_formula(self, tmp_path):
        from tripsu_ray.pipelines.docops import (
            SAMPLE_MOD,
            SAMPLE_MULT,
            SAMPLE_RATE_NUM,
            q_rel_sample,
        )

        keys = np.arange(1, 4001, dtype=np.int64)
        orders = pd.DataFrame(
            {"o_orderkey": keys, "o_totalprice": keys * 1.5}
        )
        orders.to_parquet(tmp_path / "orders.parquet")
        got = q_rel_sample(str(tmp_path)).to_pandas().sort_values(
            "o_orderkey", ignore_index=True
        )
        want_keys = [int(k) for k in keys if (k * SAMPLE_MULT) % SAMPLE_MOD < SAMPLE_RATE_NUM]
        assert got["o_orderkey"].tolist() == want_keys
        # ~10% of 4000, not degenerate
        assert 250 < len(got) < 550
        assert (got["sample_hash"] < SAMPLE_RATE_NUM).all()


@pytest.mark.usefixtures("ray_session")
class TestGroupQuantilesLMStratified:
    def test_group_quantiles_match_numpy(self, tmp_path):
        from tripsu_ray.pipelines.docops import q_rel_group_quantiles

        rng = np.random.default_rng(9)
        n = 5000
        events = pd.DataFrame(
            {
                "user_id": rng.integers(0, 40, n).astype(np.int64),
                "value": rng.uniform(0, 100, n).round(2),
            }
        )
        events.to_parquet(tmp_path / "events.parquet")
        got = (
            q_rel_group_quantiles(str(tmp_path))
            .to_pandas()
            .sort_values("user_id", ignore_index=True)
        )
        cents = (events["value"] * 100).round().astype("int64")
        rows = []
        for u, grp in cents.groupby(events["user_id"]):
            v = np.sort(grp.to_numpy())
            pick = lambda q: v[max(0, int(np.ceil(q * len(v))) - 1)]
            rows.append((u, pick(0.5), pick(0.95)))
        want = pd.DataFrame(rows, columns=["user_id", "p50_cents", "p95_cents"]).astype(
            "int64"
        )
        pd.testing.assert_frame_equal(got, want)

    def test_unigram_logprob_matches_reference(self, tmp_path):
        import math

        from tripsu_ray.stages.text import _token_pat, text_unigram_logprob

        docs = pd.DataFrame(
            {
                "doc_id": np.arange(4, dtype=np.int64),
                "text": ["the cat", "the the the", "", "rare token zyx"],
            }
        )
        docs.to_parquet(tmp_path / "documents.parquet")
        got = (
            text_unigram_logprob(str(tmp_path))
            .to_pandas()
            .sort_values("doc_id", ignore_index=True)
        )
        toks = docs["text"].str.lower().str.findall(_token_pat)
        flat = toks.explode().dropna()
        counts = flat.value_counts()
        N = float(counts.sum())
        lq = {t: math.floor(1e6 * (math.log(float(c)) - math.log(N))) for t, c in counts.items()}
        want_lp = [sum(lq[t] for t in ts) for ts in toks]
        assert got["logprob_q"].tolist() == want_lp
        assert got["n_tokens"].tolist() == [len(t) for t in toks]
        # higher-frequency docs score higher (the actual quality signal)
        assert got.loc[1, "logprob_q"] > got.loc[3, "logprob_q"]

    def test_stratified_sample_quota_and_determinism(self, tmp_path):
        from tripsu_ray.pipelines.docops import (
            SAMPLE_MOD,
            SAMPLE_MULT,
            STRAT_K,
            q_rel_stratified_sample,
        )

        rng = np.random.default_rng(5)
        n = 2000
        cust = pd.DataFrame(
            {
                "c_custkey": np.arange(1, n + 1, dtype=np.int64),
                "c_mktsegment": rng.choice(["A", "B", "C"], n),
            }
        )
        cust.to_parquet(tmp_path / "customer.parquet")
        got = q_rel_stratified_sample(str(tmp_path))
        assert (got.groupby("c_mktsegment").size() == STRAT_K).all()
        # reference selection: global sort by (segment, hash, key), head K
        h = (cust["c_custkey"].to_numpy().astype(np.uint64) * np.uint64(SAMPLE_MULT)) % np.uint64(SAMPLE_MOD)
        ref = (
            cust.assign(sample_hash=h.astype("int64"))
            .sort_values(["c_mktsegment", "sample_hash", "c_custkey"])
            .groupby("c_mktsegment")
            .head(STRAT_K)
            .sort_values(["c_mktsegment", "c_custkey"], ignore_index=True)
        )[["c_mktsegment", "c_custkey", "sample_hash"]]
        pd.testing.assert_frame_equal(got, ref)


@pytest.mark.usefixtures("ray_session")
class TestPagerankShuffleJoin:
    def _local_pagerank(self, pairs, d=0.85, n_iter=20):
        nodes = sorted({x for p in pairs for x in p})
        n = len(nodes)
        deg = {x: 0 for x in nodes}
        for a, _ in pairs:
            deg[a] += 1
        r = {x: 1.0 / n for x in nodes}
        for _ in range(n_iter):
            inflow = {x: 0.0 for x in nodes}
            for a, b in pairs:
                inflow[b] += r[a] / deg[a]
            dangling = sum(r[x] for x in nodes if deg[x] == 0)
            base = (1 - d) / n + d * dangling / n
            r = {x: base + d * inflow[x] for x in nodes}
        return r

    @pytest.mark.parametrize("seed", [0, 7])
    def test_pagerank_matches_local_power_iteration(self, seed):
        rng = np.random.default_rng(seed)
        pairs = list(
            {
                (f"v{a:02d}", f"v{b:02d}")
                for a, b in zip(rng.integers(0, 60, 400), rng.integers(0, 60, 400))
                if a != b
            }
        )
        df = pd.DataFrame(pairs, columns=["a", "b"])
        got = graph.pagerank(_ds(df, blocks=4))
        ref = self._local_pagerank(pairs)
        got_map = dict(zip(got["node"], got["rank"]))
        assert set(got_map) == set(ref)
        assert np.allclose(
            [got_map[x] for x in sorted(ref)], [ref[x] for x in sorted(ref)],
            rtol=1e-9, atol=1e-12,
        )
        # ranks sum to 1 (dangling mass conserved)
        assert abs(got["rank"].sum() - 1.0) < 1e-9

    def test_shuffle_join_matches_pandas(self, tmp_path):
        from tripsu_ray.pipelines.docops import q_rel_shuffle_join

        rng = np.random.default_rng(11)
        orders = pd.DataFrame(
            {
                "o_orderkey": np.arange(1, 501, dtype=np.int64),
                "o_orderpriority": rng.choice(["1-URGENT", "2-HIGH", "3-LOW"], 500),
            }
        )
        li = pd.DataFrame(
            {
                # some orderkeys without lineitems and vice versa (inner-join
                # semantics exercised)
                "l_orderkey": rng.integers(1, 601, 3000).astype(np.int64),
                "l_extendedprice": rng.uniform(1, 1000, 3000).round(2),
            }
        )
        orders.to_parquet(tmp_path / "orders.parquet")
        li.to_parquet(tmp_path / "lineitem.parquet")
        got = (
            q_rel_shuffle_join(str(tmp_path))
            .to_pandas()
            .sort_values("o_orderpriority", ignore_index=True)
        )
        j = li.assign(cents=(li["l_extendedprice"] * 100).round().astype("int64")).merge(
            orders, left_on="l_orderkey", right_on="o_orderkey"
        )
        want = (
            j.assign(n_lineitems=1)
            .groupby("o_orderpriority", as_index=False)
            .agg(revenue_cents=("cents", "sum"), n_lineitems=("n_lineitems", "sum"))
            .astype({"revenue_cents": "int64", "n_lineitems": "int64"})
        )
        pd.testing.assert_frame_equal(got, want)


@pytest.mark.usefixtures("ray_session")
class TestShardPack:
    def test_prefix_sum_sparse_multibucket(self, tmp_path):
        from tripsu_ray.stages.text import _PACK_BUCKET, text_shard_pack

        rng = np.random.default_rng(13)
        # sparse non-contiguous ids spanning several ordered buckets
        ids = np.sort(
            rng.choice(np.arange(0, _PACK_BUCKET * 5, dtype=np.int64), 800, replace=False)
        )
        texts = ["tok " * int(k) for k in rng.integers(0, 50, len(ids))]
        docs = pd.DataFrame({"doc_id": ids, "text": texts})
        docs.to_parquet(tmp_path / "documents.parquet")
        budget = 100
        got = (
            text_shard_pack(str(tmp_path), budget=budget)
            .to_pandas()
            .sort_values("doc_id", ignore_index=True)
        )
        n_tok = docs["text"].str.count(r"[a-z0-9]+").astype("int64")
        excl = n_tok.cumsum() - n_tok
        want = pd.DataFrame(
            {"doc_id": ids, "n_tokens": n_tok, "shard_id": (excl // budget).astype("int64")}
        )
        pd.testing.assert_frame_equal(got, want)
        # shards fill in doc order: shard_id nondecreasing
        assert got["shard_id"].is_monotonic_increasing


@pytest.mark.usefixtures("ray_session")
class TestPagerankJoinVariant:
    def test_join_variant_equals_broadcast(self):
        rng = np.random.default_rng(21)
        pairs = list(
            {
                (f"w{a:02d}", f"w{b:02d}")
                for a, b in zip(rng.integers(0, 30, 150), rng.integers(0, 30, 150))
                if a != b
            }
        )
        df = pd.DataFrame(pairs, columns=["a", "b"])
        bc = graph.pagerank(_ds(df, blocks=3), n_iter=5)
        jn = graph.pagerank_join(_ds(df, blocks=3), n_iter=5, num_partitions=4)
        b_map = dict(zip(bc["node"], bc["rank"]))
        j_map = dict(zip(jn["node"], jn["rank"]))
        assert set(b_map) == set(j_map)
        ks = sorted(b_map)
        assert np.allclose([b_map[k] for k in ks], [j_map[k] for k in ks],
                           rtol=1e-9, atol=1e-12)

    def test_quantized_join_bit_equals_broadcast_and_gate(self):
        """pagerank_quantized ≡ pagerank_quantized_join BIT-equal (all
        integer arithmetic), and pagerank_auto's size gate dispatches to
        the join plan above driver_max with an identical result."""
        rng = np.random.default_rng(33)
        pairs = list(
            {
                (f"w{a:02d}", f"w{b:02d}")
                for a, b in zip(rng.integers(0, 25, 120), rng.integers(0, 25, 120))
                if a != b
            }
        )
        df = pd.DataFrame(pairs, columns=["a", "b"])
        bc = graph.pagerank_quantized(_ds(df, blocks=3), n_iter=6)
        jn = graph.pagerank_quantized_join(
            _ds(df, blocks=3), n_iter=6, num_partitions=4
        )
        pd.testing.assert_frame_equal(bc, jn)
        # gate: driver_max=0 forces the join plan; default takes broadcast
        auto_join = graph.pagerank_auto(_ds(df, blocks=3), driver_max=0, n_iter=6,
                                        num_partitions=4)
        auto_bc = graph.pagerank_auto(_ds(df, blocks=3), n_iter=6)
        pd.testing.assert_frame_equal(auto_join, bc)
        pd.testing.assert_frame_equal(auto_bc, bc)

    def test_hits_quantized_join_bit_equals_broadcast_and_gate(self):
        """hits_quantized ≡ hits_quantized_join BIT-equal (all integer
        arithmetic incl. the Python-int L1 norms), hits_auto's size gate
        dispatches both ways, and both match a sequential big-int
        reference of the documented update rule."""
        rng = np.random.default_rng(55)
        pairs = sorted(
            {
                (f"w{a:02d}", f"w{b:02d}")
                for a, b in zip(rng.integers(0, 25, 120), rng.integers(0, 25, 120))
                if a != b
            }
        )
        df = pd.DataFrame(pairs, columns=["a", "b"])
        bc = graph.hits_quantized(_ds(df, blocks=3), n_iter=4)
        jn = graph.hits_quantized_join(_ds(df, blocks=3), n_iter=4, num_partitions=4)
        pd.testing.assert_frame_equal(bc, jn)
        auto_join = graph.hits_auto(_ds(df, blocks=3), driver_max=0, n_iter=4,
                                    num_partitions=4)
        auto_bc = graph.hits_auto(_ds(df, blocks=3), n_iter=4)
        pd.testing.assert_frame_equal(auto_join, bc)
        pd.testing.assert_frame_equal(auto_bc, bc)
        # sequential arbitrary-precision reference (the docstring rule)
        scale = 10**9
        nodes = sorted({x for p in pairs for x in p})
        h = {x: scale for x in nodes}
        a: dict = {}
        for _ in range(4):
            araw: dict = {}
            for s, t in pairs:
                araw[t] = araw.get(t, 0) + h.get(s, 0)
            tot = max(sum(araw.values()), 1)
            a = {y: (v * scale) // tot for y, v in araw.items()}
            hraw: dict = {}
            for s, t in pairs:
                hraw[s] = hraw.get(s, 0) + a.get(t, 0)
            tot = max(sum(hraw.values()), 1)
            h = {x: (v * scale) // tot for x, v in hraw.items()}
        ref = (
            pd.DataFrame(
                {"node": nodes,
                 "hub_q": [h.get(x, 0) for x in nodes],
                 "auth_q": [a.get(x, 0) for x in nodes]}
            )
            .astype({"hub_q": "int64", "auth_q": "int64"})
            .sort_values(["auth_q", "hub_q", "node"],
                         ascending=[False, False, True], ignore_index=True)
        )
        pd.testing.assert_frame_equal(bc, ref)

    def test_hits_zero_iters_join_equals_broadcast(self):
        """n_iter=0 must mirror across plans (hub=scale, auth=0) — the
        join plan used to crash on its uninitialized auth table."""
        df = pd.DataFrame([("a", "b"), ("b", "c")], columns=["a", "b"])
        bc = graph.hits_quantized(_ds(df, blocks=2), n_iter=0)
        jn = graph.hits_quantized_join(_ds(df, blocks=2), n_iter=0,
                                       num_partitions=2)
        pd.testing.assert_frame_equal(bc, jn)
        assert (bc["hub_q"] == 10**9).all() and (bc["auth_q"] == 0).all()

    def test_hits_empty_edges(self):
        df = pd.DataFrame({"a": pd.Series([], dtype=object),
                           "b": pd.Series([], dtype=object)})
        out = graph.hits_quantized(_ds(df, blocks=1))
        assert list(out.columns) == ["node", "hub_q", "auth_q"]
        assert len(out) == 0

    def test_quantized_tracks_float_ranks(self):
        """Quantized integer ranks approximate the float iteration to
        ~1/scale: rank ordering of the clear top node agrees."""
        df = pd.DataFrame(
            {"a": ["x", "y", "z", "w", "q"], "b": ["hub", "hub", "hub", "hub", "x"]}
        )
        fl = graph.pagerank(_ds(df, blocks=2), n_iter=8)
        qz = graph.pagerank_quantized(_ds(df, blocks=2), n_iter=8)
        assert fl.iloc[0]["node"] == qz.iloc[0]["node"] == "hub"
        top = qz.iloc[0]
        assert abs(top["rank_q"] / 1e12 - fl.iloc[0]["rank"]) < 1e-3


@pytest.mark.usefixtures("ray_session")
class TestRepetition:
    def test_repetition_signals(self, tmp_path):
        from tripsu_ray.stages.text import text_repetition

        docs = pd.DataFrame(
            {
                "doc_id": np.arange(4, dtype=np.int64),
                "text": [
                    "a b c a b c a b c",   # heavy 3-gram repetition
                    "one two three four five six",  # all distinct
                    "x y",                  # < n tokens → 0 ngrams
                    "",
                ],
            }
        )
        docs.to_parquet(tmp_path / "documents.parquet")
        out = (
            text_repetition(str(tmp_path))
            .to_pandas()
            .sort_values("doc_id", ignore_index=True)
        )
        # doc0: 7 3-grams, 3 distinct ("a b c","b c a","c a b") → 4 dups
        assert out.loc[0, "n_ngrams"] == 7 and out.loc[0, "dup_ngrams"] == 4
        assert abs(out.loc[0, "top_ngram_share"] - 3 / 7) < 1e-12
        assert out.loc[1, "dup_ngrams"] == 0 and out.loc[1, "n_ngrams"] == 4
        assert (out.loc[2:, ["n_ngrams", "dup_ngrams"]].to_numpy() == 0).all()
        assert (out.loc[2:, "dup_ratio"] == 0).all()


@pytest.mark.usefixtures("ray_session")
class TestKnnGraph:
    def test_knn_graph_matches_numpy(self, tmp_path):
        from tripsu_ray.stages.similarity import QUANT, ann_knn_graph

        rng = np.random.default_rng(17)
        n, d, k = 80, 16, 4
        M = rng.normal(size=(n, d))
        import pyarrow as pa
        import pyarrow.parquet as pq

        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array(np.arange(n), pa.int64()),
                    "embedding": pa.array([list(map(float, r)) for r in M],
                                          pa.list_(pa.float32())),
                }
            ),
            str(tmp_path / "embeddings.parquet"),
        )
        got = ann_knn_graph(str(tmp_path), k=k, chunk=32).to_pandas()
        # reference: float32-read matrix, full cosine, same quantization
        Mf = M.astype(np.float32).astype(np.float64)
        Mn = Mf / np.linalg.norm(Mf, axis=1, keepdims=True)
        S = np.floor(Mn @ Mn.T * QUANT).astype(np.int64)
        np.fill_diagonal(S, -(1 << 62))
        for q in range(n):
            order = np.lexsort((np.arange(n), -S[q]))[:k]
            sub = got[got["query_id"] == q].sort_values("rank")
            assert sub["vec_id"].tolist() == list(order)
            assert sub["simq"].tolist() == S[q][order].tolist()
        assert len(got) == n * k


class TestAudioKernels:
    def test_codec_roundtrip_and_rms(self):
        from tripsu_ray.stages.multimodal import (
            AUDIO_WINDOW,
            decode_audio,
            encode_audio,
            rms_windows,
        )

        payload = encode_audio(37, "hello audio")
        rate, n, pcm = decode_audio(payload)
        assert rate == 8000 * (1 + 37 % 2) and n == 256 + 37 % 4096
        assert len(pcm) == n and pcm.dtype == np.dtype("<i2")
        e = rms_windows(pcm)
        assert len(e) == (n + AUDIO_WINDOW - 1) // AUDIO_WINDOW
        # reference RMS of the first full window
        ref = np.sqrt((pcm[:AUDIO_WINDOW].astype(np.float64) ** 2).mean())
        assert abs(float(e[0]) - ref) < 1e-2
        # deterministic: same inputs → same payload bytes
        assert payload == encode_audio(37, "hello audio")

    def test_rms_zero_and_constant_signals(self):
        from tripsu_ray.stages.multimodal import rms_windows

        assert rms_windows(np.zeros(300, dtype=np.int16)).tolist()[:1] == [0.0]
        const = np.full(256, 1000, dtype=np.int16)
        assert abs(float(rms_windows(const)[0]) - 1000.0) < 1e-3


@pytest.mark.usefixtures("ray_session")
class TestCoNeighbors:
    def test_co_neighbors_match_pandas(self):
        rng = np.random.default_rng(23)
        df = pd.DataFrame(
            {
                "a": [f"f{i}" for i in rng.integers(0, 40, 200)],
                "b": [f"m{i}" for i in rng.integers(0, 12, 200)],
            }
        ).drop_duplicates(ignore_index=True)
        from tripsu_ray.stages.graph import co_neighbor_counts

        got = (
            co_neighbor_counts(_ds(df, blocks=4), num_partitions=4)
            .to_pandas()
            .sort_values("node", ignore_index=True)
        )
        j = df.merge(df, on="b")
        j = j[j["a_x"] != j["a_y"]][["a_x", "a_y"]].drop_duplicates()
        want = (
            j.groupby("a_x").size().reset_index(name="n_co_neighbors")
            .rename(columns={"a_x": "node"})
            .sort_values("node", ignore_index=True)
            .astype({"n_co_neighbors": "int64"})
        )
        pd.testing.assert_frame_equal(got, want)

    def test_butterflies_match_pandas(self):
        rng = np.random.default_rng(31)
        df = pd.DataFrame(
            {
                "a": [f"f{i}" for i in rng.integers(0, 40, 260)],
                "b": [f"m{i}" for i in rng.integers(0, 12, 260)],
            }
        ).drop_duplicates(ignore_index=True)
        from tripsu_ray.stages.graph import butterfly_counts

        got = butterfly_counts(_ds(df, blocks=4), num_partitions=4).sort_values(
            "node", ignore_index=True
        )
        j = df.merge(df, on="b")
        j = j[j["a_x"] < j["a_y"]]
        codeg = j.groupby(["a_x", "a_y"]).size()
        bf = (codeg * (codeg - 1) // 2)[codeg >= 2]
        per = pd.concat(
            [
                bf.groupby(level=0).sum(),
                bf.groupby(level=1).sum(),
            ]
        )
        want = (
            per.groupby(level=0).sum().rename_axis("node")
            .reset_index(name="n_butterflies")
            .sort_values("node", ignore_index=True)
            .astype({"n_butterflies": "int64"})
        )
        pd.testing.assert_frame_equal(got, want)

    def test_butterflies_known_square(self):
        # K_{2,2} = exactly one butterfly; each left node participates once
        df = pd.DataFrame(
            {"a": ["u", "u", "v", "v", "w"], "b": ["m1", "m2", "m1", "m2", "m1"]}
        )
        from tripsu_ray.stages.graph import butterfly_counts

        got = butterfly_counts(_ds(df, blocks=2), num_partitions=3).sort_values(
            "node", ignore_index=True
        )
        want = pd.DataFrame({"node": ["u", "v"], "n_butterflies": [1, 1]}).astype(
            {"n_butterflies": "int64"}
        )
        pd.testing.assert_frame_equal(got, want)

    @staticmethod
    def _local_core(pairs) -> dict:
        """Classic sequential peeling: core[v] = k at removal time."""
        from collections import defaultdict

        adj = defaultdict(set)
        for a, b in pairs:
            if a != b:
                adj[a].add(b)
                adj[b].add(a)
        deg = {v: len(ns) for v, ns in adj.items()}
        core = {}
        k = 0
        while deg:
            v = min(deg, key=lambda x: (deg[x], x))
            k = max(k, deg[v])
            core[v] = k
            for u in adj[v]:
                if u in deg:
                    deg[u] -= 1
            adj_v = adj.pop(v)
            for u in adj_v:
                adj[u].discard(v)
            del deg[v]
        return core

    @pytest.mark.parametrize("seed", [3, 11])
    def test_core_numbers_match_peeling(self, seed):
        rng = np.random.default_rng(seed)
        df = pd.DataFrame(
            {
                "a": [f"n{i}" for i in rng.integers(0, 60, 300)],
                "b": [f"n{i}" for i in rng.integers(0, 60, 300)],
            }
        ).drop_duplicates(ignore_index=True)
        from tripsu_ray.stages.graph import core_numbers

        got = core_numbers(_ds(df, blocks=4))
        want_map = self._local_core(list(zip(df["a"], df["b"])))
        want = (
            pd.DataFrame(
                {"node": list(want_map), "core": [want_map[x] for x in want_map]}
            )
            .sort_values("node", ignore_index=True)
            .astype({"core": "int64"})
        )
        pd.testing.assert_frame_equal(got, want)

    def test_core_numbers_known_graph(self):
        # triangle (core 2) + pendant chain (core 1)
        df = pd.DataFrame(
            {
                "a": ["x", "y", "z", "x", "p"],
                "b": ["y", "z", "x", "p", "q"],
            }
        )
        from tripsu_ray.stages.graph import core_numbers

        got = core_numbers(_ds(df, blocks=2))
        want = pd.DataFrame(
            {"node": ["p", "q", "x", "y", "z"], "core": [1, 1, 2, 2, 2]}
        ).astype({"core": "int64"})
        pd.testing.assert_frame_equal(got, want)

    @pytest.mark.parametrize("seed", [7, 19])
    def test_bfs_matches_local(self, seed):
        from collections import deque

        rng = np.random.default_rng(seed)
        df = pd.DataFrame(
            {
                "a": [f"n{i:02d}" for i in rng.integers(0, 50, 120)],
                "b": [f"n{i:02d}" for i in rng.integers(0, 50, 120)],
            }
        ).drop_duplicates(ignore_index=True)
        from tripsu_ray.stages.graph import bfs_distances

        got = bfs_distances(_ds(df, blocks=4))
        adj: dict = {}
        for a, b in zip(df["a"], df["b"]):
            if a != b:
                adj.setdefault(a, set()).add(b)
                adj.setdefault(b, set()).add(a)
        src = min(set(df["a"]) | set(df["b"]))
        dist = {src: 0}
        q = deque([src])
        while q:
            v = q.popleft()
            for u in sorted(adj.get(v, ())):
                if u not in dist:
                    dist[u] = dist[v] + 1
                    q.append(u)
        want = (
            pd.DataFrame({"node": sorted(dist), "dist": [dist[x] for x in sorted(dist)]})
            .astype({"dist": "int64"})
        )
        pd.testing.assert_frame_equal(got, want)


@pytest.mark.usefixtures("ray_session")
class TestCurate:
    def test_curate_composition(self, tmp_path):
        from tripsu_ray.stages import text as T

        rng = np.random.default_rng(31)
        # quality-passing base text (long, stopword-rich, varied tokens)
        def good(i):
            words = [f"word{rng.integers(0, 400)}" for _ in range(40)]
            return "the quick value of " + " ".join(words) + " and the end to go"

        texts = [good(i) for i in range(40)]
        texts[6] = texts[5]            # exact duplicate pair → keep 5, drop 6
        texts[3] = texts[0]            # duplicate of the SNIPPET SOURCE doc
        texts[7] = "short"             # fails quality (min tokens)
        texts[9] = "!!!! ???? ;;;; " * 30  # fails punctuation gate
        docs = pd.DataFrame({"doc_id": np.arange(40, dtype=np.int64), "text": texts})
        docs.to_parquet(tmp_path / "documents.parquet")
        budget = 120
        got = (
            T.text_curate(str(tmp_path), budget=budget)
            .to_pandas()
            .sort_values("doc_id", ignore_index=True)
        )
        ids = set(got["doc_id"])
        assert 5 in ids and 6 not in ids       # dedup kept the min doc_id
        assert 7 not in ids and 9 not in ids   # quality gates dropped
        # doc 0 (doc_id % 50 == 0, ≥96 chars) sources a benchmark snippet,
        # so decontamination drops doc 0 AND its duplicate doc 3
        assert 0 not in ids and 3 not in ids
        # shard ids: exclusive prefix sum // budget, nondecreasing
        n_tok = got["n_tokens"].to_numpy()
        excl = np.concatenate(([0], np.cumsum(n_tok)[:-1]))
        assert (got["shard_id"].to_numpy() == excl // budget).all()


@pytest.mark.usefixtures("ray_session")
class TestFaultTolerance:
    def test_transient_task_failure_retries_transparently(self, tmp_path):
        """Ray retries failed tasks with lineage re-execution — a transient
        per-task fault must not surface to the pipeline (the fault-tolerance
        half of the resumability story; checkpoint tests cover the other)."""
        import ray
        import ray.data

        flag = tmp_path / "failed_once"

        def flaky(b: pd.DataFrame) -> pd.DataFrame:
            import os

            if not flag.exists():
                flag.touch()
                # hard worker death (user exceptions are NOT retried by
                # design; process loss IS — lineage re-executes the task)
                os._exit(1)
            return b

        ds = ray.data.from_pandas(
            pd.DataFrame({"x": np.arange(200, dtype=np.int64)})
        ).repartition(4).map_batches(flaky, batch_format="pandas")
        out = ds.to_pandas()
        assert sorted(out["x"]) == list(range(200))


def test_new_kernels_cross_engine_hypothesis():
    """The new text kernels' scalar definitions must agree with their
    DuckDB renderings on arbitrary (incl. non-ASCII) text: substring
    slicing + contains (decontaminate), n-gram join keys (repetition),
    and the ln-quantization used by the unigram LM (on the engines'
    shared libm)."""
    import math

    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from tripsu_ray.stages.text import _token_pat

    con = duckdb.connect()
    alphabet = st.sampled_from(
        list("the cat and dog ab01.,!?") + ["é", "中", " ", "\n", " "]
    )
    texts = st.text(alphabet=alphabet, max_size=50)

    @settings(max_examples=150, deadline=None)
    @given(texts, st.integers(min_value=1, max_value=20))
    def check(t, off):
        # substring semantics: Python slice == DuckDB substring (chars)
        py = t[off : off + 8]
        sql = con.execute("SELECT substring(?, ?, 8)", [t, off + 1]).fetchone()[0]
        assert (sql or "") == py
        # contains == Python `in`
        if py:
            assert con.execute("SELECT contains(?, ?)", [t, py]).fetchone()[0] == (
                py in t
            )
        # 3-gram join keys: space-joined token windows agree
        toks = _token_pat.findall(t.lower())
        grams_py = [" ".join(toks[i : i + 3]) for i in range(max(0, len(toks) - 2))]
        grams_sql = con.execute(
            """
            SELECT coalesce(list(array_to_string(ts[i:i+2], ' ')), [])
            FROM (SELECT regexp_extract_all(lower(?), '[a-z0-9]+') AS ts),
                 unnest(generate_series(1, len(ts) - 2)) AS t(i)
            """,
            [t],
        ).fetchone()[0]
        assert grams_sql == grams_py

    check()

    # ln quantization parity on the actual count domain (1..10^7)
    for n, N in [(1, 7), (3, 1000), (999983, 10_000_000), (1, 10_000_000)]:
        py = math.floor(1_000_000 * (math.log(float(n)) - math.log(float(N))))
        sql = con.execute(
            "SELECT CAST(floor(1000000 * (ln(CAST(? AS DOUBLE)) - ln(CAST(? AS DOUBLE)))) AS BIGINT)",
            [n, N],
        ).fetchone()[0]
        assert sql == py, (n, N)


@pytest.mark.usefixtures("ray_session")
class TestRollup:
    def test_rollup_levels_consistent(self, tmp_path):
        from tripsu_ray.pipelines.docops import q_rel_rollup

        rng = np.random.default_rng(41)
        li = pd.DataFrame(
            {
                "l_returnflag": rng.choice(["A", "N", "R"], 500),
                "l_linestatus": rng.choice(["F", "O"], 500),
                "l_extendedprice": rng.uniform(1, 100, 500).round(2),
            }
        )
        li.to_parquet(tmp_path / "lineitem.parquet")
        out = q_rel_rollup(str(tmp_path))
        total = out[(out["l_returnflag"] == "") & (out["l_linestatus"] == "")]
        fine = out[(out["l_returnflag"] != "") & (out["l_linestatus"] != "")]
        mid = out[(out["l_returnflag"] != "") & (out["l_linestatus"] == "")]
        assert total["n"].iloc[0] == 500 == fine["n"].sum() == mid["n"].sum()
        assert total["price_cents"].iloc[0] == fine["price_cents"].sum()
        want_cents = int((li["l_extendedprice"] * 100).round().astype("int64").sum())
        assert total["price_cents"].iloc[0] == want_cents


@pytest.mark.usefixtures("ray_session")
class TestAnomalies:
    def test_integer_zscore_flags_planted_outlier(self, tmp_path):
        from tripsu_ray.pipelines.docops import q_rel_anomalies

        base = pd.Timestamp("2025-01-01 00:00:00")
        rows = []
        # user 1: 20 quiet hours + one 100× spike → exactly one anomaly
        for h in range(20):
            rows.append((1, base + pd.Timedelta(hours=h), 10.0))
        rows.append((1, base + pd.Timedelta(hours=20), 1000.0))
        # user 2: constant → zero variance, nothing flagged
        for h in range(10):
            rows.append((2, base + pd.Timedelta(hours=h), 5.0))
        ev = pd.DataFrame(rows, columns=["user_id", "ts", "value"])
        ev["user_id"] = ev["user_id"].astype("int64")
        ev.to_parquet(tmp_path / "events.parquet")
        out = q_rel_anomalies(str(tmp_path)).to_pandas()
        assert len(out) == 1
        assert out.iloc[0]["user_id"] == 1 and out.iloc[0]["value_cents"] == 100000


@pytest.mark.usefixtures("ray_session")
class TestGraphReviewFixes:
    def test_co_neighbors_empty_edges(self):
        df = pd.DataFrame({"a": pd.Series([], dtype=object), "b": pd.Series([], dtype=object)})
        from tripsu_ray.stages.graph import co_neighbor_counts

        out = co_neighbor_counts(_ds(df, blocks=1))
        import pandas as _pd

        assert isinstance(out, _pd.DataFrame)  # typed empty frame (see stage)
        assert len(out) == 0 and list(out.columns) == ["node", "n_co_neighbors"]

    def test_co_neighbors_no_shared_targets(self):
        df = pd.DataFrame({"a": ["x", "y"], "b": ["t1", "t2"]})
        from tripsu_ray.stages.graph import co_neighbor_counts

        out = co_neighbor_counts(_ds(df, blocks=1)).to_pandas()
        assert len(out) == 0

    def test_components_self_loops_are_singletons(self):
        df = pd.DataFrame({"a": ["s", "p", "q"], "b": ["s", "q", "p"]})
        got = graph.connected_components_str(_ds(df, blocks=1))
        assert got == {"p": "p", "q": "p"}

    def test_entity_edges_drop_blank_subjects(self):
        from tripsu_ray.schema import KIND_BLANK

        df = pd.DataFrame(
            {
                "subject": ["b0", "http://x/a"],
                "subject_kind": np.array([KIND_BLANK, KIND_IRI], np.int8),
                "predicate": ["http://x/p", "http://x/p"],
                "object_value": ["http://x/o", "http://x/o"],
                "object_kind": np.array([KIND_IRI, KIND_IRI], np.int8),
                "object_lang": pd.Series([None] * 2, dtype="string"),
                "object_datatype": pd.Series([None] * 2, dtype="string"),
            }
        )
        got = graph.entity_edges(_ds(df, blocks=1)).to_pandas()
        assert got.to_records(index=False).tolist() == [("http://x/a", "http://x/o")]


@pytest.mark.usefixtures("ray_session")
class TestSkewPolicies:
    def _bipartite(self, seed=41, hub=True):
        rng = np.random.default_rng(seed)
        df = pd.DataFrame(
            {
                "a": [f"f{i}" for i in rng.integers(0, 30, 150)],
                "b": [f"m{i}" for i in rng.integers(0, 8, 150)],
            }
        )
        if hub:  # one target shared by (almost) everyone
            df = pd.concat(
                [df, pd.DataFrame({"a": [f"f{i}" for i in range(30)], "b": "HUB"})],
                ignore_index=True,
            )
        return df.drop_duplicates(ignore_index=True)

    def test_hub_cap_noop_when_above_max_degree(self):
        from tripsu_ray.stages.graph import butterfly_counts, co_neighbor_counts

        df = self._bipartite()
        def _pd(x):
            return x.to_pandas() if hasattr(x, "to_pandas") else x

        for fn in (co_neighbor_counts, butterfly_counts):
            exact = _pd(fn(_ds(df, blocks=3), num_partitions=4))
            capped = _pd(fn(_ds(df, blocks=3), num_partitions=4, hub_cap=10_000))
            pd.testing.assert_frame_equal(
                exact.sort_values("node", ignore_index=True),
                capped.sort_values("node", ignore_index=True),
            )

    def test_hub_cap_drops_hub_groups_exactly(self):
        from tripsu_ray.stages.graph import co_neighbor_counts

        df = self._bipartite()
        cap = 20
        got = (
            co_neighbor_counts(_ds(df, blocks=3), num_partitions=4, hub_cap=cap)
            .to_pandas()
            .sort_values("node", ignore_index=True)
        )
        # pandas reference with the SAME policy: drop targets above the cap
        deg = df.groupby("b").size()
        kept = df[df["b"].map(deg) <= cap]
        j = kept.merge(kept, on="b")
        j = j[j["a_x"] != j["a_y"]][["a_x", "a_y"]].drop_duplicates()
        want = (
            j.groupby("a_x").size().reset_index(name="n_co_neighbors")
            .rename(columns={"a_x": "node"})
            .sort_values("node", ignore_index=True)
            .astype({"n_co_neighbors": "int64"})
        )
        pd.testing.assert_frame_equal(got, want)
        assert deg.max() > cap  # the hub really existed

    def test_pagerank_tol_early_stop_matches_full(self):
        from tripsu_ray.stages.graph import pagerank

        rng = np.random.default_rng(13)
        df = pd.DataFrame(
            {
                "a": [f"n{i}" for i in rng.integers(0, 25, 120)],
                "b": [f"n{i}" for i in rng.integers(0, 25, 120)],
            }
        ).drop_duplicates(ignore_index=True)
        full = pagerank(_ds(df, blocks=3), n_iter=40)
        early = pagerank(_ds(df, blocks=3), n_iter=40, tol=1e-10)
        m = full.merge(early, on="node", suffixes=("_f", "_e"))
        assert len(m) == len(full)
        assert np.allclose(m["rank_f"], m["rank_e"], atol=1e-8)


@pytest.mark.usefixtures("ray_session")
class TestRepoProfile:
    def test_matches_pandas_two_hop(self):
        from tripsu_ray.schema import RDF_TYPE
        from tripsu_ray.stages.extract import NS

        def t(s, p, o, k=KIND_IRI):
            return dict(
                subject=s, subject_kind=np.int8(0), predicate=p,
                object_value=o, object_kind=np.int8(k),
                object_lang=None, object_datatype=None,
            )

        rows = [
            t("f1", NS + "inRepo", "r1"),
            t("f2", NS + "inRepo", "r1"),
            t("f3", NS + "inRepo", "r2"),
            t("f1", NS + "language", "py", KIND_LITERAL),
            t("f2", NS + "language", "py", KIND_LITERAL),  # same lang → 1
            t("f3", NS + "language", "js", KIND_LITERAL),
            t("f1", NS + "imports", "m1"),
            t("f1", NS + "imports", "m2"),
            t("f2", NS + "imports", "m1"),  # shared module → distinct 2
            t("f1", NS + "defines", "s1"),
            t("f2", NS + "defines", "s2"),
            # noise the profile must ignore
            t("f1", RDF_TYPE, NS + "File"),
            t("x", "other", "y"),
        ]
        df = pd.DataFrame(rows * 2)  # duplicates must not double-count
        got = (
            graph.repo_profile(_ds(df), num_partitions=8)
            .to_pandas()
            .sort_values("repo", ignore_index=True)
        )
        want = pd.DataFrame(
            {
                "repo": ["r1", "r2"],
                "n_files": [2, 1],
                "n_langs": [1, 1],
                "n_modules": [2, 0],
                "n_symbols": [2, 0],
            }
        )
        pd.testing.assert_frame_equal(
            got.astype({c: "int64" for c in want.columns[1:]}), want
        )


@pytest.mark.usefixtures("ray_session")
class TestCorr:
    def test_rel_corr_matches_exact_reference(self):
        from tripsu_ray.pipelines.docops import q_rel_corr

        got = q_rel_corr("/root/testdata/sf0.001")
        df = pd.read_parquet(
            "/root/testdata/sf0.001/lineitem.parquet",
            columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"],
        )
        df = df.assign(
            x=df["l_quantity"].round().astype("int64"),
            y=(df["l_extendedprice"] * 100).round().astype("int64"),
        )
        import math

        for _, row in got.iterrows():
            sub = df[
                (df["l_returnflag"] == row["l_returnflag"])
                & (df["l_linestatus"] == row["l_linestatus"])
            ]
            x = [int(v) for v in sub["x"]]
            y = [int(v) for v in sub["y"]]
            n = len(x)
            assert row["n"] == n
            assert row["sum_qty"] == sum(x)
            assert row["sum_price_cents"] == sum(y)
            num = n * sum(a * b for a, b in zip(x, y)) - sum(x) * sum(y)
            d1 = n * sum(a * a for a in x) - sum(x) ** 2
            d2 = n * sum(b * b for b in y) - sum(y) ** 2
            want_q = math.floor(1e6 * (float(num) / math.sqrt(float(d1) * float(d2))))
            assert row["corr_q"] == want_q
            # and the quantized value is the true Pearson r to ~1e-6
            r = np.corrcoef(np.array(x, dtype=float), np.array(y, dtype=float))[0, 1]
            assert abs(row["corr_q"] / 1e6 - r) < 2e-6


@pytest.mark.usefixtures("ray_session")
class TestCube:
    def test_cube_levels_consistent(self):
        from tripsu_ray.pipelines.docops import q_rel_cube

        out = q_rel_cube("/root/testdata/sf0.001")
        fine = out[(out["l_returnflag"] != "") & (out["l_linestatus"] != "")]
        by_flag = out[(out["l_returnflag"] != "") & (out["l_linestatus"] == "")]
        by_status = out[(out["l_returnflag"] == "") & (out["l_linestatus"] != "")]
        top = out[(out["l_returnflag"] == "") & (out["l_linestatus"] == "")]
        assert len(top) == 1
        for col in ("price_cents", "n"):
            assert by_flag[col].sum() == fine[col].sum() == top[col].iloc[0]
            assert by_status[col].sum() == fine[col].sum()
        # each marginal equals the sum of its fine cells
        for flag, grp in fine.groupby("l_returnflag"):
            assert (
                by_flag.loc[by_flag["l_returnflag"] == flag, "n"].iloc[0]
                == grp["n"].sum()
            )
        for st, grp in fine.groupby("l_linestatus"):
            assert (
                by_status.loc[by_status["l_linestatus"] == st, "n"].iloc[0]
                == grp["n"].sum()
            )


@pytest.mark.usefixtures("ray_session")
class TestCharSets:
    def test_matches_pandas(self):
        df = _triples_df(np.random.default_rng(9))
        got = (
            graph.characteristic_sets(_ds(df), num_partitions=8)
            .to_pandas()
            .sort_values("signature", ignore_index=True)
        )
        dt = df.drop_duplicates(subset=["subject", "predicate", "object_value"])
        per = dt.groupby("subject").agg(
            signature=("predicate", lambda s: "|".join(sorted(set(s)))),
            nt=("predicate", "size"),
        )
        want = (
            per.groupby("signature")
            .agg(n_subjects=("nt", "size"), n_triples=("nt", "sum"))
            .reset_index()
            .astype({"n_subjects": "int64", "n_triples": "int64"})
            .sort_values("signature", ignore_index=True)
        )
        pd.testing.assert_frame_equal(got, want)


@pytest.mark.usefixtures("ray_session")
class TestMovingSum:
    def test_matches_pandas_window(self):
        from tripsu_ray.pipelines.docops import q_rel_moving_sum

        got = (
            q_rel_moving_sum("/root/testdata/sf0.001")
            .to_pandas()
            .sort_values(["user_id", "event_id"], ignore_index=True)
        )
        ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
        ev = ev.assign(v=(ev["value"] * 100).round().astype("int64")).sort_values(
            ["user_id", "ts", "event_id"], ignore_index=True
        )
        ev["mov_cents"] = (
            ev.groupby("user_id", sort=False)["v"]
            .rolling(3, min_periods=1)
            .sum()
            .reset_index(drop=True)
            .astype("int64")
        )
        want = ev[["user_id", "event_id", "mov_cents"]].sort_values(
            ["user_id", "event_id"], ignore_index=True
        )
        pd.testing.assert_frame_equal(got, want)


@pytest.mark.usefixtures("ray_session")
class TestEccentricity:
    def test_matches_sequential_bfs(self):
        import collections

        import ray.data

        rng = np.random.default_rng(11)
        edges = sorted(
            {(f"v{i:02d}", f"v{j:02d}") for i, j in rng.integers(0, 30, (90, 2)) if i != j}
        )
        ds = ray.data.from_pandas(pd.DataFrame(edges, columns=["a", "b"])).repartition(3)
        got = graph.eccentricity_census(ds, num_seeds=3)

        adj: dict[str, set] = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        seeds = sorted(adj)[:3]
        rows = []
        for s in seeds:
            dist = {s: 0}
            q = collections.deque([s])
            while q:
                u = q.popleft()
                for v in adj[u]:
                    if v not in dist:
                        dist[v] = dist[u] + 1
                        q.append(v)
            rows.append((s, max(dist.values()), len(dist)))
        want = pd.DataFrame(rows, columns=["seed", "ecc", "n_reached"]).astype(
            {"ecc": "int64", "n_reached": "int64"}
        )
        pd.testing.assert_frame_equal(got, want)

    def test_empty_edges(self):
        import ray.data

        df = pd.DataFrame({"a": pd.Series([], dtype=object),
                           "b": pd.Series([], dtype=object)})
        out = graph.eccentricity_census(ray.data.from_pandas(df))
        assert list(out.columns) == ["seed", "ecc", "n_reached"] and len(out) == 0

    def test_ecc_exactly_max_rounds_succeeds(self):
        """Round-3 ADVICE: a BFS whose final layer lands exactly at round
        ``max_rounds`` is complete, not an overflow — only onward
        expansion past max_rounds may raise."""
        import ray.data

        # path v0 - v1 - ... - v5: ecc(v0) == 5
        edges = [(f"v{i}", f"v{i+1}") for i in range(5)]
        ds = ray.data.from_pandas(pd.DataFrame(edges, columns=["a", "b"]))
        out = graph.eccentricity_census(ds, num_seeds=1, max_rounds=5)
        assert out.loc[0, "ecc"] == 5 and out.loc[0, "n_reached"] == 6
        with pytest.raises(RuntimeError, match="frontier still active"):
            graph.eccentricity_census(ds, num_seeds=1, max_rounds=4)


@pytest.mark.usefixtures("ray_session")
class TestRandomWalks:
    def _edges_ds(self, edges):
        import ray.data

        df = pd.DataFrame(edges, columns=["a", "b"])
        return ray.data.from_pandas(df).repartition(3)

    @staticmethod
    def _reference(edges, num_walks=2, walk_len=4):
        # sequential replay of the exact same seed + step formula
        import hashlib

        from tripsu_ray.stages.graph import _WALK_STEP_C

        adj: dict[str, list[str]] = {}
        sym = set()
        for a, b in edges:
            sym.add((a, b))
            sym.add((b, a))
        for a, b in sorted(sym):
            adj.setdefault(a, []).append(b)
        rows = []
        for start in sorted(adj):
            for wno in range(num_walks):
                seed = int(
                    hashlib.sha256(f"{start}\x1f{wno}".encode()).hexdigest()[:15], 16
                )
                cur, path = start, start
                for step in range(1, walk_len + 1):
                    nbrs = adj[cur]
                    cur = nbrs[(seed ^ (step * _WALK_STEP_C)) % len(nbrs)]
                    path += ">" + cur
                rows.append((start, wno, path))
        return pd.DataFrame(rows, columns=["start", "walk_no", "walk"])

    def test_matches_sequential_replay(self):
        rng = np.random.default_rng(21)
        edges = list(
            {
                (f"n{i}", f"n{j}")
                for i, j in rng.integers(0, 25, (80, 2))
                if i != j
            }
        )
        got = (
            graph.random_walks(self._edges_ds(edges), num_partitions=8)
            .to_pandas()
            .sort_values(["start", "walk_no"], ignore_index=True)
        )
        want = self._reference(edges).sort_values(
            ["start", "walk_no"], ignore_index=True
        )
        pd.testing.assert_frame_equal(
            got.astype({"walk_no": "int64"}), want.astype({"walk_no": "int64"})
        )

    def test_walk_len_budget_guard(self):
        """k·_WALK_STEP_C must fit BIGINT in both engines — walk_len > 12
        refuses loudly instead of diverging/overflowing quietly."""
        from tripsu_ray.pipelines.oracle import sql_random_walks

        edges = [("a", "b"), ("b", "a")]
        with pytest.raises(ValueError, match="walk_len"):
            graph.random_walks(self._edges_ds(edges), walk_len=13)
        with pytest.raises(ValueError, match="walk_len"):
            sql_random_walks(walk_len=13)

    def test_walk_shape_and_determinism(self):
        edges = [("a", "b"), ("b", "c"), ("c", "a")]
        r1 = (
            graph.random_walks(self._edges_ds(edges), num_walks=3, walk_len=5)
            .to_pandas()
            .sort_values(["start", "walk_no"], ignore_index=True)
        )
        assert len(r1) == 3 * 3  # every node × num_walks
        assert (r1["walk"].str.count(">") == 5).all()
        r2 = (
            graph.random_walks(self._edges_ds(edges), num_walks=3, walk_len=5)
            .to_pandas()
            .sort_values(["start", "walk_no"], ignore_index=True)
        )
        pd.testing.assert_frame_equal(r1, r2)


@pytest.mark.usefixtures("ray_session")
class TestLinkScores:
    @staticmethod
    def _reference(df: pd.DataFrame, min_common: int, hub_cap=None) -> pd.DataFrame:
        e = df.drop_duplicates(ignore_index=True)
        deg = e.groupby("a").size()
        pe = e
        if hub_cap is not None:
            tsz = e.groupby("b")["a"].nunique()
            pe = e[e["b"].map(tsz) <= hub_cap]
        j = pe.merge(pe, on="b")
        j = j[j["a_x"] < j["a_y"]]
        pairs = (
            j.groupby(["a_x", "a_y"]).size().reset_index(name="n_common")
        )
        pairs = pairs[pairs["n_common"] >= min_common]
        pairs["n_union"] = (
            pairs["a_x"].map(deg) + pairs["a_y"].map(deg) - pairs["n_common"]
        )
        return (
            pairs.rename(columns={"a_x": "a1", "a_y": "a2"})
            .sort_values(["a1", "a2"], ignore_index=True)
            .astype({"n_common": "int64", "n_union": "int64"})
        )

    def test_matches_pandas(self):
        from tripsu_ray.stages.graph import neighbor_overlap_scores

        rng = np.random.default_rng(41)
        df = pd.DataFrame(
            {
                "a": [f"f{i}" for i in rng.integers(0, 30, 300)],
                "b": [f"m{i}" for i in rng.integers(0, 10, 300)],
            }
        ).drop_duplicates(ignore_index=True)
        got = (
            neighbor_overlap_scores(_ds(df, blocks=4), min_common=2, num_partitions=4)
            .to_pandas()
            .sort_values(["a1", "a2"], ignore_index=True)
        )
        pd.testing.assert_frame_equal(got, self._reference(df, 2))

    def test_duplicate_edges_do_not_double_count(self):
        from tripsu_ray.stages.graph import neighbor_overlap_scores

        df = pd.DataFrame(
            {
                "a": ["x", "x", "y", "y", "x", "y"],
                "b": ["m1", "m1", "m1", "m2", "m2", "m2"],
            }
        )
        got = (
            neighbor_overlap_scores(_ds(df, blocks=3), min_common=2, num_partitions=4)
            .to_pandas()
            .sort_values(["a1", "a2"], ignore_index=True)
        )
        want = pd.DataFrame(
            {"a1": ["x"], "a2": ["y"], "n_common": np.int64(2), "n_union": np.int64(2)}
        )
        pd.testing.assert_frame_equal(got, want)

    def test_hub_cap_policy(self):
        from tripsu_ray.stages.graph import neighbor_overlap_scores

        rng = np.random.default_rng(43)
        df = pd.DataFrame(
            {
                "a": [f"f{i}" for i in rng.integers(0, 25, 400)],
                "b": [f"m{i}" for i in rng.integers(0, 6, 400)],
            }
        ).drop_duplicates(ignore_index=True)
        res = neighbor_overlap_scores(
            _ds(df, blocks=4), min_common=1, num_partitions=4, hub_cap=15
        )
        got = (res.to_pandas() if hasattr(res, "to_pandas") else res).sort_values(
            ["a1", "a2"], ignore_index=True
        )
        pd.testing.assert_frame_equal(got, self._reference(df, 1, hub_cap=15))
        # a cap admitting some targets still matches the same-policy reference
        res2 = neighbor_overlap_scores(
            _ds(df, blocks=4), min_common=1, num_partitions=4, hub_cap=22
        )
        got2 = (res2.to_pandas() if hasattr(res2, "to_pandas") else res2).sort_values(
            ["a1", "a2"], ignore_index=True
        )
        pd.testing.assert_frame_equal(got2, self._reference(df, 1, hub_cap=22))


@pytest.mark.usefixtures("ray_session")
class TestBigramLM:
    def test_bigram_logprob_matches_reference(self, tmp_path):
        import math

        from tripsu_ray.stages.text import _token_pat, text_bigram_logprob

        docs = pd.DataFrame(
            {
                "doc_id": np.arange(5, dtype=np.int64),
                "text": [
                    "the cat sat on the mat",
                    "the cat ran",
                    "",
                    "one",
                    "the cat sat",
                ],
            }
        )
        docs.to_parquet(tmp_path / "documents.parquet")
        got = (
            text_bigram_logprob(str(tmp_path))
            .to_pandas()
            .sort_values("doc_id", ignore_index=True)
        )
        toks = docs["text"].str.lower().str.findall(_token_pat)
        from collections import Counter

        bg = Counter()
        for ts in toks:
            bg.update(zip(ts[:-1], ts[1:]))
        cw = Counter()
        for (w1, _), c in bg.items():
            cw[w1] += c
        lq = {
            p: math.floor(1e6 * (math.log(float(c)) - math.log(float(cw[p[0]]))))
            for p, c in bg.items()
        }
        want_lp = [sum(lq[p] for p in zip(ts[:-1], ts[1:])) for ts in toks]
        assert got["logprob_q"].tolist() == want_lp
        assert got["n_bigrams"].tolist() == [max(len(t) - 1, 0) for t in toks]
        # "the cat" always precedes distinct continuations; the doc repeating
        # the corpus's dominant transitions scores no lower than the rare one
        assert got.loc[4, "logprob_q"] >= got.loc[1, "logprob_q"]

    def test_no_cross_document_bigrams(self, tmp_path):
        from tripsu_ray.stages.text import _batch_bigrams

        w1, w2, pos, nbg = _batch_bigrams(
            pd.Series(["a b", "c d", "", "e"])
        )
        assert list(zip(w1, w2)) == [("a", "b"), ("c", "d")]
        assert pos.tolist() == [0, 1]
        assert nbg.tolist() == [1, 1, 0, 0]

    def test_probe_join_plan_equals_broadcast(self):
        """broadcast_max=0 forces the co-partitioned probe join; the
        broadcast gate path must agree bit-exactly (integer scores)."""
        import ray

        from tripsu_ray.stages.text import bigram_logprob

        rng = np.random.default_rng(23)
        vocab = [f"w{i}" for i in range(40)]
        texts = [
            " ".join(rng.choice(vocab, size=int(n)))
            for n in rng.integers(0, 30, 80)
        ]
        docs = pd.DataFrame(
            {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
        )
        ds = ray.data.from_pandas(docs).repartition(5)
        bc = (
            bigram_logprob(ds)
            .to_pandas().sort_values("doc_id", ignore_index=True)
        )
        jn = (
            bigram_logprob(ds, broadcast_max=0, num_partitions=4)
            .to_pandas().sort_values("doc_id", ignore_index=True)
        )
        pd.testing.assert_frame_equal(jn, bc)
        assert len(bc) == len(docs)


@pytest.mark.usefixtures("ray_session")
class TestTriangles:
    @staticmethod
    def _reference(edges: pd.DataFrame) -> pd.DataFrame:
        e = edges.drop_duplicates(ignore_index=True)
        adj: dict = {}
        for a, b in e.itertuples(index=False):
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        from collections import Counter

        tri = Counter()
        nodes = sorted(adj)
        for x in nodes:
            for y in (n for n in adj[x] if n > x):
                for z in adj[x] & adj[y]:
                    if z > y:
                        tri[x] += 1
                        tri[y] += 1
                        tri[z] += 1
        return pd.DataFrame(
            sorted(tri.items()), columns=["node", "n_triangles"]
        ).astype({"n_triangles": "int64"})

    @pytest.mark.parametrize("seed", [0, 7])
    def test_matches_bruteforce(self, seed):
        from tripsu_ray.stages.graph import triangle_counts

        rng = np.random.default_rng(seed)
        raw = pd.DataFrame(
            {
                "x": [f"n{i:02d}" for i in rng.integers(0, 25, 260)],
                "y": [f"n{i:02d}" for i in rng.integers(0, 25, 260)],
            }
        )
        raw = raw[raw["x"] != raw["y"]]
        edges = pd.DataFrame(
            {
                "a": np.minimum(raw["x"], raw["y"]),
                "b": np.maximum(raw["x"], raw["y"]),
            }
        )  # canonical, duplicates left in on purpose
        got = triangle_counts(_ds(edges, blocks=4), num_partitions=4)
        pd.testing.assert_frame_equal(got, self._reference(edges))

    def test_k4_and_chain(self):
        from tripsu_ray.stages.graph import triangle_counts

        k4 = [(a, b) for i, a in enumerate("abcd") for b in "abcd"[i + 1 :]]
        got = triangle_counts(
            _ds(pd.DataFrame(k4, columns=["a", "b"]), blocks=2), num_partitions=4
        )
        # K4: each node sits in C(3,2) = 3 triangles
        assert got["n_triangles"].tolist() == [3, 3, 3, 3]
        chain = pd.DataFrame({"a": ["a", "b", "c"], "b": ["b", "c", "d"]})
        res = triangle_counts(_ds(chain, blocks=2), num_partitions=4)
        assert len(res) == 0


@pytest.mark.usefixtures("ray_session")
class TestTruss:
    @staticmethod
    def _support_ref(edges: pd.DataFrame) -> pd.DataFrame:
        e = edges.drop_duplicates(ignore_index=True)
        adj: dict = {}
        for a, b in e.itertuples(index=False):
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        rows = [
            (a, b, len(adj[a] & adj[b])) for a, b in e.itertuples(index=False)
        ]
        return pd.DataFrame(rows, columns=["a", "b", "support"]).sort_values(
            ["a", "b"], ignore_index=True
        ).astype({"support": "int64"})

    @staticmethod
    def _truss_ref(edges: pd.DataFrame, k: int) -> set:
        """Sequential peeling for fixed k."""
        es = set(map(tuple, edges.drop_duplicates().to_numpy()))
        changed = True
        while changed and es:
            adj: dict = {}
            for a, b in es:
                adj.setdefault(a, set()).add(b)
                adj.setdefault(b, set()).add(a)
            drop = {e for e in es if len(adj[e[0]] & adj[e[1]]) < k - 2}
            changed = bool(drop)
            es -= drop
        return es

    @pytest.mark.parametrize("seed", [3, 9])
    def test_edge_supports_match_bruteforce(self, seed):
        from tripsu_ray.stages.graph import edge_supports

        rng = np.random.default_rng(seed)
        raw = pd.DataFrame(
            {
                "x": [f"n{i:02d}" for i in rng.integers(0, 22, 240)],
                "y": [f"n{i:02d}" for i in rng.integers(0, 22, 240)],
            }
        )
        raw = raw[raw["x"] != raw["y"]]
        edges = pd.DataFrame(
            {"a": np.minimum(raw["x"], raw["y"]), "b": np.maximum(raw["x"], raw["y"])}
        )
        got = edge_supports(_ds(edges, blocks=4), num_partitions=4)
        pd.testing.assert_frame_equal(got, self._support_ref(edges))

    def test_k_truss_equals_sequential_peel(self):
        from tripsu_ray.stages.graph import k_truss

        rng = np.random.default_rng(17)
        raw = pd.DataFrame(
            {
                "x": [f"n{i:02d}" for i in rng.integers(0, 18, 200)],
                "y": [f"n{i:02d}" for i in rng.integers(0, 18, 200)],
            }
        )
        raw = raw[raw["x"] != raw["y"]]
        edges = pd.DataFrame(
            {"a": np.minimum(raw["x"], raw["y"]), "b": np.maximum(raw["x"], raw["y"])}
        ).drop_duplicates(ignore_index=True)
        for k in (3, 4, 5):
            got = k_truss(_ds(edges, blocks=3), k, num_partitions=4)
            assert set(map(tuple, got.to_numpy())) == self._truss_ref(edges, k)

    def test_k_truss_k4_on_known_graph(self):
        from tripsu_ray.stages.graph import k_truss

        # K4 plus a pendant triangle: 4-truss = exactly the K4's 6 edges
        k4 = [(a, b) for i, a in enumerate("abcd") for b in "abcd"[i + 1 :]]
        extra = [("d", "e"), ("d", "f"), ("e", "f")]
        edges = pd.DataFrame(k4 + extra, columns=["a", "b"])
        got = k_truss(_ds(edges, blocks=2), 4, num_partitions=4)
        assert set(map(tuple, got.to_numpy())) == set(k4)


@pytest.mark.usefixtures("ray_session")
def test_components_distributed_path_equals_driver_gate():
    """driver_max=0 forces the label-propagation rounds; the size-gated
    union-find fast path must agree exactly."""
    rng = np.random.default_rng(6)
    a = [f"n{i:03d}" for i in rng.integers(0, 90, 250)]
    b = [f"n{i:03d}" for i in rng.integers(0, 90, 250)]
    df = pd.DataFrame([(x, y) for x, y in zip(a, b)], columns=["a", "b"])
    fast = graph.connected_components_str(_ds(df, blocks=4))
    slow = graph.connected_components_str(_ds(df, blocks=4), driver_max=0)
    assert fast == slow


@pytest.mark.usefixtures("ray_session")
def test_components_ds_path_equals_driver_gate():
    """connected_components_ds (factorize + join-LPA + decode, zero
    node-class driver state) must agree exactly with the union-find gate
    — including identity rows for component minima and no singleton
    rows (self-loop-only nodes)."""
    rng = np.random.default_rng(17)
    a = [f"n{i:03d}" for i in rng.integers(0, 120, 300)]
    b = [f"n{i:03d}" for i in rng.integers(0, 120, 300)]
    df = pd.DataFrame({"a": a, "b": b})
    # a guaranteed self-loop-only node: must not appear in either result
    df = pd.concat(
        [df, pd.DataFrame({"a": ["zzz_solo"], "b": ["zzz_solo"]})],
        ignore_index=True,
    )
    gate = graph.connected_components_str(_ds(df, blocks=4))
    got = graph.connected_components_ds(_ds(df, blocks=4), num_partitions=4).to_pandas()
    assert dict(zip(got["node"], got["component"])) == gate
    assert len(got) == len(gate)  # one row per node, no dupes
    assert "zzz_solo" not in gate


@pytest.mark.usefixtures("ray_session")
class TestNegativeSamples:
    def test_no_true_edges_and_exact_formula(self):
        from tripsu_ray.stages.graph import NEG_A, NEG_B, NEG_P, negative_samples

        rng = np.random.default_rng(21)
        df = pd.DataFrame(
            {
                "a": [f"f{i:02d}" for i in rng.integers(0, 15, 120)],
                "b": [f"m{i}" for i in rng.integers(0, 9, 120)],
            }
        ).drop_duplicates(ignore_index=True)
        got = (
            negative_samples(_ds(df, blocks=3), k=2, num_partitions=4)
            .to_pandas()
            .sort_values(["f", "h", "m"], ignore_index=True)
        )
        true = set(map(tuple, df.to_numpy()))
        assert not any((f, m) in true for f, m in zip(got["f"], got["m"]))
        # exact per-source replay of the hash ranking
        files = sorted(df["a"].unique())
        mods = sorted(df["b"].unique())
        for f in files:
            fc = files.index(f) + 1
            cands = [
                (int((fc * NEG_A + (mods.index(m) + 1) * NEG_B) % NEG_P), m)
                for m in mods
                if (f, m) not in true
            ]
            want = sorted(cands)[:2]
            sub = got[got["f"] == f]
            assert list(zip(sub["h"], sub["m"])) == want

    def test_deterministic_across_partitionings(self):
        from tripsu_ray.stages.graph import negative_samples

        # each file imports 3 of 6 modules → 3 negatives per file exist
        df = pd.DataFrame(
            {"a": [f"f{i}" for i in range(8) for _ in range(3)],
             "b": [f"m{(i + j) % 6}" for i in range(8) for j in range(3)]}
        )
        a = negative_samples(_ds(df, blocks=2), k=2, num_partitions=2).to_pandas()
        b = negative_samples(_ds(df, blocks=6), k=2, num_partitions=8).to_pandas()
        key = lambda d: d.sort_values(["f", "h", "m"], ignore_index=True)
        pd.testing.assert_frame_equal(key(a), key(b))

    def test_distributed_rank_path_bit_equal(self):
        """The beyond-driver source-rank exchange (driver_max=0) must be
        bit-equal to the gated broadcast path (round-3 VERDICT item 2) —
        the components/paths gate-test template."""
        from tripsu_ray.stages.graph import _source_rank_exchange, negative_samples

        rng = np.random.default_rng(33)
        df = pd.DataFrame(
            {
                "a": [f"f{i:02d}" for i in rng.integers(0, 23, 200)],
                "b": [f"m{i}" for i in rng.integers(0, 11, 200)],
            }
        ).drop_duplicates(ignore_index=True)
        gated = negative_samples(_ds(df, blocks=3), k=3, num_partitions=4).to_pandas()
        dist = negative_samples(
            _ds(df, blocks=5), k=3, num_partitions=4, driver_max=0
        ).to_pandas()
        key = lambda d: d.sort_values(["f", "h", "m"], ignore_index=True)
        pd.testing.assert_frame_equal(key(gated), key(dist))
        # the rank exchange itself equals the sorted-unique rank array
        ranked = (
            _source_rank_exchange(_ds(df, blocks=4), num_partitions=4)
            .to_pandas()
            .sort_values("fcode", ignore_index=True)
        )
        files = sorted(df["a"].unique())
        assert list(ranked["f"]) == files
        assert list(ranked["fcode"]) == list(range(len(files)))


@pytest.mark.usefixtures("ray_session")
class TestAdamicAdar:
    @staticmethod
    def _reference(e: pd.DataFrame, min_common: int) -> pd.DataFrame:
        e = e.drop_duplicates()
        tsz = e.groupby("b")["a"].nunique()
        wq = np.floor(1_000_000 / np.log(tsz.astype(float))).where(tsz >= 2, 0)
        j = e.merge(e, on="b")
        j = j[j["a_x"] < j["a_y"]]
        j["wq"] = j["b"].map(wq).astype("int64")
        pairs = (
            j.groupby(["a_x", "a_y"])
            .agg(n_common=("b", "size"), aa_q=("wq", "sum"))
            .reset_index()
        )
        pairs = pairs[pairs["n_common"] >= min_common]
        return (
            pairs.rename(columns={"a_x": "a1", "a_y": "a2"})
            .sort_values(["a1", "a2"], ignore_index=True)
            .astype({"n_common": "int64", "aa_q": "int64"})
        )

    def test_matches_pandas(self):
        from tripsu_ray.stages.graph import adamic_adar_scores

        rng = np.random.default_rng(43)
        df = pd.DataFrame(
            {
                "a": [f"f{i}" for i in rng.integers(0, 30, 300)],
                "b": [f"m{i}" for i in rng.integers(0, 12, 300)],
            }
        ).drop_duplicates(ignore_index=True)
        got = (
            adamic_adar_scores(_ds(df, blocks=4), min_common=2, num_partitions=4)
            .to_pandas()
            .sort_values(["a1", "a2"], ignore_index=True)
        )
        pd.testing.assert_frame_equal(got, self._reference(df, 2))

    def test_rare_target_outweighs_hub(self):
        """A pair sharing one rare target (s=2) must outscore a pair
        sharing one huge hub, even though both have n_common=1."""
        from tripsu_ray.stages.graph import adamic_adar_scores

        rows = [("x", "rare"), ("y", "rare")]
        rows += [(f"h{i}", "hub") for i in range(50)]
        df = pd.DataFrame(rows, columns=["a", "b"])
        got = adamic_adar_scores(
            _ds(df, blocks=2), min_common=1, num_partitions=4
        ).to_pandas()
        rare = got[(got["a1"] == "x") & (got["a2"] == "y")]["aa_q"].iloc[0]
        hub = got[got["a1"] == "h0"]["aa_q"].iloc[0]
        assert rare > hub


@pytest.mark.usefixtures("ray_session")
class TestPredicatePMI:
    def test_matches_pandas(self):
        import math

        from tripsu_ray.stages.graph import predicate_pmi

        rng = np.random.default_rng(5)
        preds = [f"p{i}" for i in range(6)]
        rows = []
        for s in range(40):
            for p in rng.choice(preds, size=rng.integers(1, 5), replace=False):
                rows.append((f"s{s}", p))
        df = pd.DataFrame(rows, columns=["subject", "predicate"])
        import ray.data as rd

        got = (
            predicate_pmi(rd.from_pandas(df).repartition(4), num_partitions=4)
            .sort_values(["p1", "p2"], ignore_index=True)
        )
        sp = df.drop_duplicates()
        n_p = sp.groupby("predicate").size()
        N = sp["subject"].nunique()
        m = sp.merge(sp, on="subject")
        m = m[m["predicate_x"] < m["predicate_y"]]
        pq = m.groupby(["predicate_x", "predicate_y"]).size().reset_index(name="n_pq")
        pmi = [
            int(math.floor(1e6 * (math.log(float(n)) + math.log(float(N))
                                  - math.log(float(n_p[a]))
                                  - math.log(float(n_p[b])))))
            for a, b, n in zip(pq["predicate_x"], pq["predicate_y"], pq["n_pq"])
        ]
        want = pd.DataFrame(
            {"p1": pq["predicate_x"].astype(object),
             "p2": pq["predicate_y"].astype(object),
             "n_pq": pq["n_pq"].astype("int64"),
             "pmi_q": pd.Series(pmi, dtype="int64")}
        ).sort_values(["p1", "p2"], ignore_index=True)
        pd.testing.assert_frame_equal(got, want)


@pytest.mark.usefixtures("ray_session")
class TestPropertyCardinality:
    def test_hand_built(self):
        from tripsu_ray.schema import RDF_TYPE
        from tripsu_ray.stages.graph import property_cardinality

        rows = [
            ("a", RDF_TYPE, "T"), ("a", "p", "x"), ("a", "p", "y"),
            ("b", RDF_TYPE, "T"), ("b", "p", "x"),
            ("b", RDF_TYPE, "U"),  # multi-typed: counts under both types
            ("c", RDF_TYPE, "U"), ("c", "q", "z"), ("c", "q", "z"),  # dup triple
        ]
        df = pd.DataFrame(rows, columns=["subject", "predicate", "object_value"])
        df["subject_kind"] = np.int8(0)
        df["object_kind"] = np.int8(0)
        df["object_lang"] = pd.Series([None] * len(df), dtype="string")
        df["object_datatype"] = pd.Series([None] * len(df), dtype="string")
        got = property_cardinality(
            _ds(df, blocks=3), num_partitions=4
        ).set_index(["type", "predicate"])
        assert got.loc[("T", "p"), "n_subjects"] == 2
        assert got.loc[("T", "p"), "sum_c"] == 3
        assert got.loc[("T", "p"), "min_c"] == 1
        assert got.loc[("T", "p"), "max_c"] == 2
        assert got.loc[("T", "p"), "avg_q"] == 1_500_000
        assert got.loc[("U", "p"), "n_subjects"] == 1  # b under U too
        # duplicate (c, q, z) rows count ONCE (distinct-triple semantics)
        assert got.loc[("U", "q"), "sum_c"] == 1


@pytest.mark.usefixtures("ray_session")
class TestClusteringCoefficients:
    def test_k4_with_pendant(self):
        """K4 plus a pendant node: K4 members have cc=1 except the one
        attached to the pendant (cc = 3/ (4*3/2) = 0.5)."""
        import ray.data as rd

        from tripsu_ray.stages.graph import clustering_coefficients

        k4 = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d")]
        edges = pd.DataFrame(k4 + [("a", "p")], columns=["a", "b"])
        got = clustering_coefficients(
            rd.from_pandas(edges).repartition(3), num_partitions=4
        ).set_index("node")
        assert got.loc["b", "cc_q"] == 1_000_000
        assert got.loc["a", "degree"] == 4
        assert got.loc["a", "n_triangles"] == 3
        assert got.loc["a", "cc_q"] == 500_000
        assert got.loc["p", "degree"] == 1 and got.loc["p", "cc_q"] == 0

    def test_matches_bruteforce(self):
        import itertools

        import ray.data as rd

        from tripsu_ray.stages.graph import clustering_coefficients

        rng = np.random.default_rng(17)
        nodes = [f"n{i}" for i in range(14)]
        edges = pd.DataFrame(
            [(a, b) for a, b in itertools.combinations(nodes, 2) if rng.random() < 0.3],
            columns=["a", "b"],
        )
        got = clustering_coefficients(
            rd.from_pandas(edges).repartition(3), num_partitions=4
        ).set_index("node")
        adj = {n: set() for n in nodes}
        for a, b in edges.itertuples(index=False):
            adj[a].add(b)
            adj[b].add(a)
        for n in nodes:
            d = len(adj[n])
            if d == 0:
                assert n not in got.index
                continue
            tri = sum(
                1 for u, v in itertools.combinations(sorted(adj[n]), 2) if v in adj[u]
            )
            assert got.loc[n, "degree"] == d
            assert got.loc[n, "n_triangles"] == tri
            want = (
                int(np.floor(1e6 * ((2.0 * tri) / (d * (d - 1.0))))) if d >= 2 else 0
            )
            assert got.loc[n, "cc_q"] == want


@pytest.mark.usefixtures("ray_session")
class TestNamespaceCensus:
    def test_prefix_rule_and_counts(self):
        from tripsu_ray.schema import KIND_IRI, KIND_LITERAL
        from tripsu_ray.stages.graph import namespace_census

        rows = [
            # (subject, predicate, object_value, object_kind)
            ("http://a/x#p1", "http://p/q", "http://a/x#p2", KIND_IRI),
            ("http://a/x#p1", "http://p/q", "lit", KIND_LITERAL),
            ("http://b/y/z", "http://p/q", "http://a/x#p1", KIND_IRI),
            ("urnlike:noslashsafter", "http://p/q", "lit2", KIND_LITERAL),
        ]
        df = pd.DataFrame(
            rows, columns=["subject", "predicate", "object_value", "object_kind"]
        )
        df["subject_kind"] = np.int8(KIND_IRI)
        df["object_kind"] = df["object_kind"].astype(np.int8)
        df["object_lang"] = pd.Series([None] * len(df), dtype="string")
        df["object_datatype"] = pd.Series([None] * len(df), dtype="string")
        got = namespace_census(_ds(df, blocks=2), num_partitions=4).set_index(
            "namespace"
        )
        # prefix = up to LAST '#' or '/'
        assert got.loc["http://a/x#", "n_entities"] == 2
        assert got.loc["http://a/x#", "n_occurrences"] == 4  # p1 ×3 + p2 ×1
        assert got.loc["http://b/y/", "n_entities"] == 1
        # prefixless IRI buckets under '' (reference panics; documented policy)
        assert got.loc["urnlike:noslashsafter"[:0], "n_entities"] == 1


@pytest.mark.usefixtures("ray_session")
def test_void_stats_hand_built():
    from tripsu_ray.schema import KIND_IRI, KIND_LITERAL, RDF_TYPE
    from tripsu_ray.stages.graph import void_stats

    rows = [
        ("s1", RDF_TYPE, "C1", KIND_IRI),
        ("s2", RDF_TYPE, "C1", KIND_IRI),
        ("s1", "p1", "o1", KIND_IRI),
        ("s1", "p1", "o1", KIND_IRI),  # duplicate row: counts once after dedup
        ("s2", "p2", "litx", KIND_LITERAL),
    ]
    df = pd.DataFrame(rows, columns=["subject", "predicate", "object_value", "object_kind"])
    df["subject_kind"] = np.int8(KIND_IRI)
    df["object_kind"] = df["object_kind"].astype(np.int8)
    df["object_lang"] = pd.Series([None] * len(df), dtype="string")
    df["object_datatype"] = pd.Series([None] * len(df), dtype="string")
    got = void_stats(_ds(df, blocks=2), num_partitions=4).set_index("metric")[
        "value"
    ]
    assert got["triples"] == 4
    assert got["distinct_subjects"] == 2
    assert got["properties"] == 3  # rdf:type, p1, p2
    assert got["classes"] == 1
    assert got["distinct_objects"] == 3  # C1, o1, litx
    assert got["entities"] == 4  # s1, s2, C1, o1 (litx excluded)


@pytest.mark.usefixtures("ray_session")
class TestAssortativity:
    def test_matches_numpy_replica(self):
        import math

        import ray.data as rd

        from tripsu_ray.stages.graph import degree_assortativity

        rng = np.random.default_rng(23)
        df = pd.DataFrame(
            {"a": [f"s{i}" for i in rng.integers(0, 25, 400)],
             "b": [f"t{i}" for i in rng.integers(0, 15, 400)]}
        )
        # duplicates across blocks must not bias moments or degrees
        df = pd.concat([df, df.head(100)], ignore_index=True)
        got = degree_assortativity(
            rd.from_pandas(df).repartition(4), num_partitions=4
        )
        e = df.drop_duplicates(ignore_index=True)
        od = e.groupby("a").size()
        idg = e.groupby("b").size()
        x = e["a"].map(od).to_numpy(np.int64)
        y = e["b"].map(idg).to_numpy(np.int64)
        n = len(e)
        num = n * int((x * y).sum()) - int(x.sum()) * int(y.sum())
        d1 = n * int((x * x).sum()) - int(x.sum()) ** 2
        d2 = n * int((y * y).sum()) - int(y.sum()) ** 2
        den = math.sqrt(float(d1) * float(d2))
        want = int(math.floor(1e6 * (float(num) / den))) if den else 0
        assert got["n_edges"].iloc[0] == n
        assert got["assortativity_q"].iloc[0] == want


@pytest.mark.usefixtures("ray_session")
def test_triangle_family_distributed_path_equals_driver_gate():
    """driver_max=0 forces the compact-forward distributed plan for
    triangle_counts / edge_supports / clustering_coefficients; the
    size-gated in-process fast path (_local_triangle_core) must be
    bit-equal — triangle membership and edge support are
    orientation-invariant, so any fixed total order closes the same
    triangles."""
    from tripsu_ray.stages.graph import (
        clustering_coefficients,
        edge_supports,
        triangle_counts,
    )

    rng = np.random.default_rng(33)
    raw = pd.DataFrame(
        {
            "x": [f"n{i:02d}" for i in rng.integers(0, 40, 500)],
            "y": [f"n{i:02d}" for i in rng.integers(0, 40, 500)],
        }
    )
    raw = raw[raw["x"] != raw["y"]]
    edges = pd.DataFrame(
        {"a": np.minimum(raw["x"], raw["y"]), "b": np.maximum(raw["x"], raw["y"])}
    ).drop_duplicates(ignore_index=True)
    for fn in (triangle_counts, edge_supports, clustering_coefficients):
        fast = fn(_ds(edges, blocks=4), num_partitions=4)
        slow = fn(_ds(edges, blocks=4), num_partitions=4, driver_max=0)
        pd.testing.assert_frame_equal(fast, slow)


@pytest.mark.usefixtures("ray_session")
def test_core_numbers_sql_oracle_matches_engine():
    """The unrolled H-index SQL oracle (oracle.sql_core_numbers) must equal
    the engine's q_core_numbers frame exactly — the H operator is
    idempotent at the fixpoint, so the fixed SQL unroll past convergence
    yields the same coreness the distributed fixpoint does."""
    import duckdb

    from tripsu_ray.pipelines.oracle import sql_core_numbers
    from tripsu_ray.pipelines.queries import q_core_numbers

    sf = "/root/testdata/sf0.001"
    got = q_core_numbers(sf)
    if hasattr(got, "to_pandas"):
        got = got.to_pandas()
    got = got.sort_values("node", ignore_index=True).astype({"core": "int64"})

    con = duckdb.connect()
    for t in ("documents",):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    want = (
        con.execute(sql_core_numbers())
        .df()
        .sort_values("node", ignore_index=True)
        .astype({"core": "int64"})
    )
    pd.testing.assert_frame_equal(got[["node", "core"]], want[["node", "core"]])


@pytest.mark.usefixtures("ray_session")
class TestLPACommunities:
    def test_matches_sequential_reference(self):
        import collections

        import ray.data

        from tripsu_ray.stages.graph import lpa_communities

        rng = np.random.default_rng(17)
        edges = sorted(
            {(f"v{i:02d}", f"v{j:02d}")
             for i, j in rng.integers(0, 24, (70, 2)) if i != j}
        )
        ds = ray.data.from_pandas(pd.DataFrame(edges, columns=["a", "b"])).repartition(3)
        got = lpa_communities(ds, rounds=4)

        adj: dict[str, set] = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        lab = {v: v for v in adj}
        for _ in range(4):
            new = {}
            for v in adj:
                cnt = collections.Counter(lab[m] for m in adj[v])
                best = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
                new[v] = best
            lab = new
        want = pd.DataFrame(
            {"node": sorted(lab), "community": [lab[n] for n in sorted(lab)]}
        )
        pd.testing.assert_frame_equal(got.reset_index(drop=True), want)

    def test_two_cliques_separate(self):
        import ray.data

        from tripsu_ray.stages.graph import lpa_communities

        clique = lambda pre, n: [
            (f"{pre}{i}", f"{pre}{j}") for i in range(n) for j in range(i + 1, n)
        ]
        edges = clique("x", 4) + clique("y", 4) + [("x0", "y0")]  # one bridge
        ds = ray.data.from_pandas(pd.DataFrame(edges, columns=["a", "b"]))
        out = lpa_communities(ds, rounds=4).set_index("node")["community"]
        # each clique converges to its own min label
        assert all(out[f"x{i}"] == out["x1"] for i in range(1, 4))
        assert all(out[f"y{i}"] == out["y1"] for i in range(1, 4))
        assert out["x1"] != out["y1"]

    def test_empty(self):
        import ray.data

        from tripsu_ray.stages.graph import lpa_communities

        df = pd.DataFrame({"a": pd.Series([], dtype=object),
                           "b": pd.Series([], dtype=object)})
        out = lpa_communities(ray.data.from_pandas(df))
        assert list(out.columns) == ["node", "community"] and len(out) == 0

    def test_join_impl_bit_equal(self):
        """The beyond-driver join-per-round plan must be bit-equal to the
        broadcast plan (the pagerank_auto gate-test template)."""
        import ray.data

        from tripsu_ray.stages.graph import lpa_communities

        rng = np.random.default_rng(23)
        edges = sorted(
            {(f"v{i:02d}", f"v{j:02d}")
             for i, j in rng.integers(0, 30, (110, 2)) if i != j}
        )
        ds = ray.data.from_pandas(pd.DataFrame(edges, columns=["a", "b"])).repartition(4)
        bc = lpa_communities(ds, rounds=4, impl="broadcast")
        jn = lpa_communities(ds, rounds=4, impl="join")
        pd.testing.assert_frame_equal(bc.reset_index(drop=True),
                                      jn.reset_index(drop=True))
        # driver_max=0 routes auto to join
        auto = lpa_communities(ds, rounds=4, driver_max=0)
        pd.testing.assert_frame_equal(bc.reset_index(drop=True),
                                      auto.reset_index(drop=True))
