"""BGP executor (pipelines/bgp.py) — handcrafted graphs vs pandas joins."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tripsu_ray.pipelines.bgp import bgp
from tripsu_ray.schema import KIND_IRI, KIND_LITERAL


def _triples(rows):
    import pyarrow as pa
    import ray.data

    from tripsu_ray.schema import TRIPLES

    df = pd.DataFrame(rows, columns=["subject", "predicate", "object_value", "object_kind"])
    df["subject_kind"] = np.int8(KIND_IRI)
    df["object_lang"] = pd.Series([None] * len(df), dtype="string")
    df["object_datatype"] = pd.Series([None] * len(df), dtype="string")
    tbl = pa.Table.from_pandas(df[list(TRIPLES.names)], schema=TRIPLES, preserve_index=False)
    return ray.data.from_arrow(tbl).repartition(3)


@pytest.mark.usefixtures("ray_session")
class TestBGP:
    def test_two_hop_path_join(self):
        t = _triples(
            [
                ("a", "knows", "b", KIND_IRI),
                ("b", "knows", "c", KIND_IRI),
                ("a", "knows", "c", KIND_IRI),
                ("c", "knows", "a", KIND_IRI),
                # duplicate triple: set semantics must collapse it
                ("a", "knows", "b", KIND_IRI),
                ("a", "age", "9", KIND_LITERAL),
            ]
        )
        out = (
            bgp(t, [("?x", "knows", "?y"), ("?y", "knows", "?z")], num_partitions=4)
            .to_pandas()
            .sort_values(["x", "y", "z"], ignore_index=True)
        )
        e = pd.DataFrame(
            [("a", "b"), ("b", "c"), ("a", "c"), ("c", "a")], columns=["s", "o"]
        )
        want = (
            e.merge(e, left_on="o", right_on="s", suffixes=("1", "2"))[["s1", "o1", "o2"]]
            .rename(columns={"s1": "x", "o1": "y", "o2": "z"})
            .drop_duplicates()
            .sort_values(["x", "y", "z"], ignore_index=True)
        )
        pd.testing.assert_frame_equal(out, want)

    def test_constant_object_and_literal_binding(self):
        t = _triples(
            [
                ("f1", "lang", "py", KIND_LITERAL),
                ("f2", "lang", "js", KIND_LITERAL),
                ("f1", "size", "10", KIND_LITERAL),
                ("f2", "size", "20", KIND_LITERAL),
            ]
        )
        out = (
            bgp(t, [("?f", "lang", "py"), ("?f", "size", "?n")], num_partitions=4)
            .to_pandas()
            .sort_values(["f", "n"], ignore_index=True)
        )
        pd.testing.assert_frame_equal(out, pd.DataFrame({"f": ["f1"], "n": ["10"]}))

    def test_cross_product_rejected(self):
        t = _triples([("a", "p", "b", KIND_IRI)])
        with pytest.raises(ValueError, match="cross product"):
            bgp(t, [("?x", "p", "?y"), ("?u", "p", "?v")])

    def test_variable_predicate(self):
        t = _triples(
            [
                ("a", "p1", "b", KIND_IRI),
                ("a", "p2", "b", KIND_IRI),
                ("b", "p1", "a", KIND_IRI),
            ]
        )
        out = (
            bgp(t, [("a", "?p", "?o"), ("?o", "p1", "?z")], num_partitions=2)
            .to_pandas()
            .sort_values(["p", "o", "z"], ignore_index=True)
        )
        want = pd.DataFrame(
            {"o": ["b", "b"], "p": ["p1", "p2"], "z": ["a", "a"]}
        ).sort_values(["p", "o", "z"], ignore_index=True)
        pd.testing.assert_frame_equal(out, want)


@pytest.mark.usefixtures("ray_session")
def test_bgp_random_graphs_match_pandas_joins():
    """Property check: random 2-pattern BGPs over random graphs equal the
    pandas natural-join reference (set semantics)."""
    rng = np.random.default_rng(17)
    for trial in range(4):
        n_nodes, n_preds = 12, 3
        rows = [
            (
                f"n{rng.integers(n_nodes)}",
                f"p{rng.integers(n_preds)}",
                f"n{rng.integers(n_nodes)}",
                KIND_IRI,
            )
            for _ in range(80)
        ]
        t = _triples(rows)
        p1 = f"p{rng.integers(n_preds)}"
        p2 = f"p{rng.integers(n_preds)}"
        out = (
            bgp(t, [("?x", p1, "?y"), ("?y", p2, "?z")], num_partitions=3)
            .to_pandas()
            .sort_values(["x", "y", "z"], ignore_index=True)
        )
        df = pd.DataFrame(rows, columns=["s", "p", "o", "k"]).drop_duplicates()
        l = df[df["p"] == p1][["s", "o"]].drop_duplicates()
        r = df[df["p"] == p2][["s", "o"]].drop_duplicates()
        want = (
            l.merge(r, left_on="o", right_on="s", suffixes=("1", "2"))[
                ["s1", "o1", "o2"]
            ]
            .rename(columns={"s1": "x", "o1": "y", "o2": "z"})
            .drop_duplicates()
            .sort_values(["x", "y", "z"], ignore_index=True)
        )
        if len(want) == 0:
            assert len(out) == 0, f"trial {trial}: expected empty"
        else:
            pd.testing.assert_frame_equal(out, want)


@pytest.mark.usefixtures("ray_session")
def test_bgp_repeated_var_and_deferred_order():
    t = _triples(
        [
            ("a", "knows", "a", KIND_IRI),  # self-loop
            ("a", "knows", "b", KIND_IRI),
            ("b", "r", "c", KIND_IRI),
            ("c", "q", "d", KIND_IRI),
        ]
    )
    # repeated variable inside one pattern = self-loop constraint
    out = bgp(t, [("?x", "knows", "?x")], num_partitions=2).to_pandas()
    assert out["x"].tolist() == ["a"]
    # connected BGP given in non-adjacent order must still evaluate
    out2 = (
        bgp(
            t,
            [("?a", "knows", "?b"), ("?c", "q", "?d"), ("?b", "r", "?c")],
            num_partitions=2,
        )
        .to_pandas()
        .sort_values(["a", "b", "c", "d"], ignore_index=True)
    )
    assert out2.values.tolist() == [["a", "b", "c", "d"]]
    # genuinely disconnected still rejected
    with pytest.raises(ValueError, match="cross product"):
        bgp(t, [("?x", "knows", "?y"), ("?u", "q", "?v")])


@pytest.mark.usefixtures("ray_session")
class TestOptionalAndFilters:
    GRAPH = [
        ("a", "type", "P", KIND_IRI),
        ("b", "type", "P", KIND_IRI),
        ("c", "type", "P", KIND_IRI),
        ("a", "email", "a@x", KIND_LITERAL),
        ("b", "email", "b@y", KIND_LITERAL),
        # c has no email → OPTIONAL leaves None
        ("a", "age", "9", KIND_LITERAL),
        ("b", "age", "12", KIND_LITERAL),
        ("c", "age", "30", KIND_LITERAL),
    ]

    def test_optional_keeps_unmatched_with_none(self):
        out = (
            bgp(
                _triples(self.GRAPH),
                [("?p", "type", "P")],
                optional=[[("?p", "email", "?e")]],
                num_partitions=4,
            )
            .to_pandas()
            .sort_values("p", ignore_index=True)
        )
        want = pd.DataFrame(
            {"e": ["a@x", "b@y", None], "p": ["a", "b", "c"]}
        )
        pd.testing.assert_frame_equal(out, want)

    def test_optional_group_filter_applies_before_left_join(self):
        # FILTER inside OPTIONAL: b's email fails the prefix filter, so b
        # gets None (it does NOT disappear — that would be top-level filter
        # semantics)
        out = (
            bgp(
                _triples(self.GRAPH),
                [("?p", "type", "P")],
                optional=[([("?p", "email", "?e")], [("e", "prefix", "a@")])],
                num_partitions=4,
            )
            .to_pandas()
            .sort_values("p", ignore_index=True)
        )
        assert list(out["p"]) == ["a", "b", "c"]
        assert list(out["e"]) == ["a@x", None, None]

    def test_top_level_filter_fails_unbound(self):
        # top-level FILTER on the optional variable: None rows drop (SQL
        # NULL / SPARQL type-error semantics)
        out = (
            bgp(
                _triples(self.GRAPH),
                [("?p", "type", "P")],
                optional=[[("?p", "email", "?e")]],
                filters=[("e", "!=", "b@y")],
                num_partitions=4,
            )
            .to_pandas()
        )
        assert list(out["p"]) == ["a"]

    def test_string_order_filter(self):
        out = (
            bgp(
                _triples(self.GRAPH),
                [("?p", "age", "?a")],
                filters=[("a", "<", "2")],  # lexicographic on strings
                num_partitions=4,
            )
            .to_pandas()
            .sort_values("p", ignore_index=True)
        )
        assert list(out["p"]) == ["b"]  # "12" < "2"; "9" and "30" not

    def test_optional_must_join_on_required_vars(self):
        with pytest.raises(ValueError, match="required"):
            bgp(
                _triples(self.GRAPH),
                [("?p", "type", "P")],
                optional=[
                    [("?p", "email", "?e")],
                    [("?x", "email", "?e")],  # joins only on optional ?e
                ],
                num_partitions=4,
            )

    def test_optional_matches_pandas_left_join(self):
        rng = np.random.default_rng(7)
        rows = [("s%d" % i, "knows", "s%d" % j, KIND_IRI)
                for i, j in rng.integers(0, 12, (60, 2)) if i != j]
        rows += [("s%d" % i, "label", "L%d" % (i % 3), KIND_LITERAL)
                 for i in range(0, 12, 2)]
        out = (
            bgp(
                _triples(rows),
                [("?x", "knows", "?y")],
                optional=[[("?x", "label", "?l")]],
                num_partitions=4,
            )
            .to_pandas()
            .sort_values(["x", "y", "l"], ignore_index=True)
        )
        e = pd.DataFrame(
            [(s, o) for s, p, o, _ in rows if p == "knows"], columns=["x", "y"]
        ).drop_duplicates()
        lab = pd.DataFrame(
            [(s, o) for s, p, o, _ in rows if p == "label"], columns=["x", "l"]
        ).drop_duplicates()
        want = (
            e.merge(lab, on="x", how="left")
            .astype(object)
            .where(lambda d: d.notna(), None)
            .drop_duplicates()[["l", "x", "y"]]
            .sort_values(["x", "y", "l"], ignore_index=True)
        )
        pd.testing.assert_frame_equal(
            out[["l", "x", "y"]].sort_values(["x", "y", "l"], ignore_index=True), want
        )


@pytest.mark.usefixtures("ray_session")
def test_bgp_agg_matches_pandas():
    """GROUP BY over the match relation vs a pandas groupby of the
    (already-verified) BGP result."""
    from tripsu_ray.pipelines import bgp as B

    SF = "/root/testdata/sf0.001"
    matches = B.q_kg_bgp(SF).to_pandas()
    got = (
        B.q_kg_bgp_agg(SF)
        .to_pandas()
        .sort_values("author", ignore_index=True)
        .astype({"n_matches": "int64", "n_modules": "int64"})
    )
    want = (
        matches.groupby("a")
        .agg(n_matches=("m", "size"), n_modules=("m", "nunique"))
        .reset_index()
        .rename(columns={"a": "author"})
        .sort_values("author", ignore_index=True)
        .astype({"n_matches": "int64", "n_modules": "int64"})
    )
    pd.testing.assert_frame_equal(got[["author", "n_matches", "n_modules"]], want)


def test_var_var_filter():
    """FILTER(?a < ?b) var-to-var comparison, including unbound fails."""
    from tripsu_ray.pipelines.bgp import _apply_filters

    df = pd.DataFrame(
        {"a": ["x", "z", None, "m"], "b": ["y", "a", "q", None]}, dtype=object
    )
    out = _apply_filters(df, [("a", "<", "?b")])
    assert out["a"].tolist() == ["x"]  # z<a false; None rows fail


@pytest.mark.usefixtures("ray_session")
def test_kg_construct_canonical_pairs():
    """CONSTRUCT output: canonical (s<o) co-author pairs, distinct, and
    consistent with a pandas self-join on the extracted stream."""
    from tripsu_ray.pipelines import bgp as B
    from tripsu_ray.stages.extract import NS, extract_triples
    from tripsu_ray.sources.synth import read_source_files

    SF = "/root/testdata/sf0.001"
    got = B.q_kg_construct(SF).to_pandas().sort_values(["s", "o"], ignore_index=True)
    t = extract_triples(read_source_files(SF)).to_pandas()
    au = t[t["predicate"] == NS + "author"][["subject", "object_value"]].drop_duplicates()
    j = au.merge(au, on="subject")
    j = j[j["object_value_x"] < j["object_value_y"]]
    want = (
        j[["object_value_x", "object_value_y"]]
        .drop_duplicates()
        .rename(columns={"object_value_x": "s", "object_value_y": "o"})
        .assign(p=NS + "coAuthor")[["s", "p", "o"]]
        .sort_values(["s", "o"], ignore_index=True)
        .astype(object)
    )
    pd.testing.assert_frame_equal(got.astype(object), want)
    assert (got["s"] < got["o"]).all()


@pytest.mark.usefixtures("ray_session")
def test_kg_describe_one_hop_semantics():
    """DESCRIBE = exactly the triples touching a seed node, vs pandas."""
    from tripsu_ray.pipelines import bgp as B
    from tripsu_ray.stages.extract import NS, extract_triples
    from tripsu_ray.sources.synth import read_source_files

    SF = "/root/testdata/sf0.001"
    got = (
        B.q_kg_describe(SF)
        .to_pandas()
        .sort_values(["s", "p", "o"], ignore_index=True)
        .astype(object)
    )
    t = extract_triples(read_source_files(SF)).to_pandas()
    seeds = set(
        t[(t["predicate"] == NS + "license") & (t["object_value"] == "MIT")]["subject"]
    )
    m = t["subject"].isin(seeds) | t["object_value"].isin(seeds)
    want = (
        t[m][["subject", "predicate", "object_value"]]
        .drop_duplicates()
        .rename(columns={"subject": "s", "predicate": "p", "object_value": "o"})
        .sort_values(["s", "p", "o"], ignore_index=True)
        .astype(object)
    )
    pd.testing.assert_frame_equal(got, want)
    assert len(seeds) > 0 and len(got) > len(seeds)  # non-trivial neighborhood


@pytest.mark.usefixtures("ray_session")
class TestUnionMinusValues:
    def _graph(self):
        return _triples(
            [
                ("f1", "lang", "py", KIND_LITERAL),
                ("f2", "lang", "rs", KIND_LITERAL),
                ("f3", "lang", "py", KIND_LITERAL),
                ("f1", "imports", "core", KIND_IRI),
                ("f3", "imports", "other", KIND_IRI),
                ("f1", "inRepo", "r1", KIND_IRI),
                ("f2", "inRepo", "r1", KIND_IRI),
                ("f3", "inRepo", "r2", KIND_IRI),
            ]
        )

    def test_union_same_vars(self):
        from tripsu_ray.pipelines.bgp import bgp_union

        out = (
            bgp_union(
                self._graph(),
                [
                    [("?f", "imports", "core"), ("?f", "inRepo", "?r")],
                    [("?f", "lang", "rs"), ("?f", "inRepo", "?r")],
                ],
                num_partitions=4,
            )
            .to_pandas()
            .sort_values(["f", "r"], ignore_index=True)
        )
        want = pd.DataFrame({"f": ["f1", "f2"], "r": ["r1", "r1"]})
        pd.testing.assert_frame_equal(out, want)

    def test_union_disjoint_vars_pad_none(self):
        # branches binding different variables: missing ones pad to None
        from tripsu_ray.pipelines.bgp import bgp_union

        out = (
            bgp_union(
                self._graph(),
                [
                    [("?f", "imports", "core")],
                    [("?g", "lang", "rs")],
                ],
                num_partitions=4,
            )
            .to_pandas()
            .sort_values(["f", "g"], ignore_index=True, na_position="last")
        )
        assert list(out.columns) == ["f", "g"]
        rows = {(r["f"], r["g"]) for _, r in out.iterrows()}
        assert rows == {("f1", None), (None, "f2")}

    def test_union_dedups_across_groups(self):
        from tripsu_ray.pipelines.bgp import bgp_union

        out = (
            bgp_union(
                self._graph(),
                [[("?f", "lang", "py")], [("?f", "inRepo", "r1")]],
                num_partitions=4,
            )
            .to_pandas()
            .sort_values("f", ignore_index=True)
        )
        # f1 matches BOTH branches — exactly once in the set union
        pd.testing.assert_frame_equal(out, pd.DataFrame({"f": ["f1", "f2", "f3"]}))

    def test_minus_anti_join(self):
        out = (
            bgp(
                self._graph(),
                [("?f", "lang", "?lang")],
                minus=[[("?f", "imports", "core")]],
                num_partitions=4,
            )
            .to_pandas()
            .sort_values("f", ignore_index=True)
        )
        want = pd.DataFrame({"f": ["f2", "f3"], "lang": ["rs", "py"]})
        pd.testing.assert_frame_equal(out, want)

    def test_minus_empty_group_removes_nothing(self):
        out = (
            bgp(
                self._graph(),
                [("?f", "lang", "?lang")],
                minus=[[("?f", "imports", "nosuch")]],
                num_partitions=4,
            )
            .to_pandas()
        )
        assert len(out) == 3

    def test_minus_unbound_shared_var_kept(self):
        # OPTIONAL leaves ?m unbound for f2/f3; MINUS on ?m must keep
        # unbound rows (no common-domain overlap)
        out = (
            bgp(
                self._graph(),
                [("?f", "lang", "?lang")],
                optional=[[("?f", "imports", "?m")]],
                minus=[[("?x", "imports", "?m")]],
                num_partitions=4,
            )
            .to_pandas()
            .sort_values("f", ignore_index=True)
        )
        # f1 (m=core) and f3 (m=other) are removed (a compatible match
        # exists); f2 (m unbound) survives
        assert list(out["f"]) == ["f2"]

    def test_values_restricts_bindings(self):
        out = (
            bgp(
                self._graph(),
                [("?f", "lang", "?lang")],
                values=(("?lang",), [("py",), ("go",)]),
                num_partitions=4,
            )
            .to_pandas()
            .sort_values("f", ignore_index=True)
        )
        want = pd.DataFrame({"f": ["f1", "f3"], "lang": ["py", "py"]})
        pd.testing.assert_frame_equal(out, want)

    def test_values_disjoint_rejected(self):
        with pytest.raises(ValueError, match="VALUES"):
            bgp(
                self._graph(),
                [("?f", "lang", "?lang")],
                values=(("?nope",), [("x",)]),
            )


@pytest.mark.usefixtures("ray_session")
class TestPropertyPaths:
    def _graph(self):
        # directed chain with a side branch and a 2-cycle back to a:
        # a→b→c→d, b→e, c→a
        return _triples(
            [
                ("a", "next", "b", KIND_IRI),
                ("b", "next", "c", KIND_IRI),
                ("c", "next", "d", KIND_IRI),
                ("b", "side", "e", KIND_IRI),
                ("c", "next", "a", KIND_IRI),
            ]
        )

    def test_seq_and_inverse(self):
        from tripsu_ray.pipelines.paths import compile_path, path_distinct

        # ^next/side : x ←next— y —side→ z  ⇒ pairs (b→…)? inv(next)
        # gives (b,a),(c,b),(d,c),(a,c); seq with side (b,e) ⇒ (c→… mid b)
        edges = path_distinct(
            compile_path(
                self._graph(), ("seq", ("inv", ("pred", "next")), ("pred", "side")),
                num_partitions=4,
            ),
            num_partitions=4,
        ).to_pandas().sort_values(["a", "b"], ignore_index=True)
        pd.testing.assert_frame_equal(
            edges, pd.DataFrame({"a": ["c"], "b": ["e"]})
        )

    def test_inverse_of_sequence_swaps_and_inverts(self):
        from tripsu_ray.pipelines.paths import compile_path, path_distinct

        fwd = path_distinct(
            compile_path(self._graph(), ("seq", ("pred", "next"), ("pred", "side")),
                         num_partitions=4), num_partitions=4,
        ).to_pandas()
        rev = path_distinct(
            compile_path(self._graph(),
                         ("inv", ("seq", ("pred", "next"), ("pred", "side"))),
                         num_partitions=4), num_partitions=4,
        ).to_pandas()
        want = set(map(tuple, fwd[["b", "a"]].to_numpy()))
        assert set(map(tuple, rev[["a", "b"]].to_numpy())) == want

    def test_alt_unions_steps(self):
        from tripsu_ray.pipelines.paths import compile_path, path_distinct

        edges = path_distinct(
            compile_path(self._graph(), ("alt", ("pred", "next"), ("pred", "side")),
                         num_partitions=4),
            num_partitions=4,
        ).to_pandas()
        assert len(edges) == 5

    def test_plus_min_hop_and_cycle_back_to_seed(self):
        from tripsu_ray.pipelines.paths import path_plus

        out = path_plus(self._graph(), ("pred", "next"), ["a"], num_partitions=4)
        got = dict(zip(out["node"], out["dist"]))
        # a→b(1)→c(2)→{d,a}(3): the seed reappears via the cycle
        assert got == {"b": 1, "c": 2, "d": 3, "a": 3}

    def test_plus_seed_set_min_dist(self):
        from tripsu_ray.pipelines.paths import path_plus

        out = path_plus(self._graph(), ("pred", "next"), ["a", "b"], num_partitions=4)
        got = dict(zip(out["node"], out["dist"]))
        assert got == {"b": 1, "c": 1, "d": 2, "a": 2}

    def test_plus_round_cap_raises(self):
        from tripsu_ray.pipelines.paths import path_plus

        with pytest.raises(RuntimeError, match="max_rounds"):
            path_plus(self._graph(), ("pred", "next"), ["a"],
                      max_rounds=2, num_partitions=4)

    def test_unanchored_plus_rejected(self):
        from tripsu_ray.pipelines.paths import compile_path

        with pytest.raises(ValueError, match="anchored"):
            compile_path(self._graph(), ("plus", ("pred", "next")))

    def test_star_includes_seed_at_zero(self):
        from tripsu_ray.pipelines.paths import path_star

        out = path_star(self._graph(), ("pred", "next"), ["a"], num_partitions=4)
        got = dict(zip(out["node"], out["dist"]))
        # seed at 0 (even though the cycle re-reaches it at 3)
        assert got == {"a": 0, "b": 1, "c": 2, "d": 3}


@pytest.mark.usefixtures("ray_session")
class TestTopK:
    def test_order_by_limit(self):
        from tripsu_ray.pipelines.bgp import bgp_topk

        t = _triples(
            [(f"s{i}", "v", str(100 + i), KIND_LITERAL) for i in range(30)]
        )
        out = bgp_topk(
            t, [("?s", "v", "?x")], order_by="?x", limit=5, num_partitions=4
        ).to_pandas()
        assert list(out["x"]) == [str(100 + i) for i in range(5)]
        out_desc = bgp_topk(
            t, [("?s", "v", "?x")], order_by="?x", ascending=False, limit=3,
            num_partitions=4,
        ).to_pandas()
        assert list(out_desc["x"]) == ["129", "128", "127"]

    def test_tie_break_deterministic(self):
        from tripsu_ray.pipelines.bgp import bgp_topk

        t = _triples([(f"s{i}", "v", "same", KIND_LITERAL) for i in range(10)])
        out = bgp_topk(
            t, [("?s", "v", "?x")], order_by="?x", limit=4, num_partitions=4
        ).to_pandas()
        # ties broken by the remaining vars lexicographically
        assert list(out["s"]) == ["s0", "s1", "s2", "s3"]

    def test_unknown_order_var_rejected(self):
        from tripsu_ray.pipelines.bgp import bgp_topk

        t = _triples([("a", "p", "b", KIND_IRI)])
        with pytest.raises(ValueError, match="ORDER BY"):
            bgp_topk(t, [("?x", "p", "?y")], order_by="?nope", limit=1)


@pytest.mark.usefixtures("ray_session")
class TestBindAsk:
    def test_bind_expressions(self):
        from tripsu_ray.pipelines.bgp import bgp

        t = _triples(
            [
                ("f1", "imports", "http://kg.example/mod/core", KIND_IRI),
                ("f2", "imports", "http://kg.example/mod/utils.io", KIND_IRI),
                ("f2", "imports", "plainname", KIND_IRI),
            ]
        )
        out = (
            bgp(
                t,
                [("?f", "imports", "?m")],
                bind=[
                    ("name", ("strafter", "?m", "http://kg.example/mod/")),
                    ("tag", ("concat", "?f", "#", "?name")),
                    ("up", ("ucase", "?name")),
                ],
                num_partitions=4,
            )
            .to_pandas()
            .sort_values(["f", "m"], ignore_index=True)
        )
        # strafter: "" when the separator is absent (SPARQL STRAFTER)
        assert list(out["name"]) == ["core", "utils.io", ""]
        assert list(out["tag"]) == ["f1#core", "f2#utils.io", "f2#"]
        assert list(out["up"]) == ["CORE", "UTILS.IO", ""]

    def test_bind_strbefore_replace_strlen(self):
        from tripsu_ray.pipelines.bgp import _apply_binds

        df = pd.DataFrame({"v": pd.Series(["a.b.c", "nodot", None], dtype=object)})
        out = _apply_binds(
            df,
            [
                ("before", ("strbefore", "?v", ".")),
                ("repl", ("replace", "?v", ".", "_")),
            ],
        )
        assert list(out["before"]) == ["a", "", None]
        assert list(out["repl"]) == ["a_b_c", "nodot", None]
        bound = _apply_binds(
            pd.DataFrame({"v": pd.Series(["ab", "c"], dtype=object)}),
            [("n", ("strlen", "?v"))],
        )
        assert list(bound["n"]) == [2, 1] and bound["n"].dtype == np.dtype("int64")

    def test_bind_unbound_propagates_none(self):
        from tripsu_ray.pipelines.bgp import bgp

        t = _triples(
            [
                ("f1", "lang", "py", KIND_LITERAL),
                ("f2", "lang", "js", KIND_LITERAL),
                ("f1", "imports", "m1", KIND_IRI),
            ]
        )
        out = (
            bgp(
                t,
                [("?f", "lang", "?lang")],
                optional=[[("?f", "imports", "?m")]],
                bind=[("tag", ("concat", "?f", ":", "?m"))],
                num_partitions=4,
            )
            .to_pandas()
            .sort_values("f", ignore_index=True)
        )
        assert list(out["tag"]) == ["f1:m1", None]

    def test_bind_rejects_rebinding(self):
        from tripsu_ray.pipelines.bgp import bgp

        t = _triples([("a", "p", "b", KIND_IRI)])
        with pytest.raises(ValueError, match="already bound"):
            bgp(t, [("?x", "p", "?y")], bind=[("x", ("ucase", "?y"))])

    def test_ask(self):
        from tripsu_ray.pipelines.bgp import bgp_ask

        t = _triples(
            [
                ("f1", "lang", "py", KIND_LITERAL),
                ("f1", "imports", "m1", KIND_IRI),
                ("f2", "lang", "js", KIND_LITERAL),
            ]
        )
        assert bgp_ask(t, [("?f", "lang", "py"), ("?f", "imports", "?m")]) is True
        assert bgp_ask(t, [("?f", "lang", "cobol")]) is False
        # join-level emptiness (each pattern matches, the join doesn't)
        assert bgp_ask(t, [("?f", "lang", "js"), ("?f", "imports", "?m")]) is False
        # filter-level emptiness
        assert (
            bgp_ask(t, [("?f", "lang", "?l")], filters=[("l", "==", "rs")]) is False
        )


@pytest.mark.usefixtures("ray_session")
class TestNpredAndOpt:
    def _graph(self):
        return _triples(
            [
                ("a", "next", "b", KIND_IRI),
                ("b", "next", "c", KIND_IRI),
                ("b", "side", "e", KIND_IRI),
                ("a", "other", "f", KIND_IRI),
            ]
        )

    def test_npred_excludes_named_predicates(self):
        from tripsu_ray.pipelines.paths import compile_path, path_distinct

        out = (
            path_distinct(
                compile_path(self._graph(), ("npred", "next"), num_partitions=4),
                num_partitions=4,
            )
            .to_pandas()
            .sort_values(["a", "b"], ignore_index=True)
        )
        pd.testing.assert_frame_equal(
            out, pd.DataFrame({"a": ["a", "b"], "b": ["f", "e"]})
        )

    def test_npred_inverse(self):
        from tripsu_ray.pipelines.paths import compile_path, path_distinct

        out = (
            path_distinct(
                compile_path(
                    self._graph(), ("inv", ("npred", "next", "side")), num_partitions=4
                ),
                num_partitions=4,
            )
            .to_pandas()
            .sort_values(["a", "b"], ignore_index=True)
        )
        pd.testing.assert_frame_equal(out, pd.DataFrame({"a": ["f"], "b": ["a"]}))

    def test_path_opt_zero_or_one(self):
        from tripsu_ray.pipelines.paths import path_opt

        out = path_opt(self._graph(), ("pred", "next"), ["a", "e"], num_partitions=4)
        # seeds at 0; only DIRECT neighbors at 1 (c is 2 steps — absent);
        # e has no outgoing next edge but stays as a dist-0 seed
        pd.testing.assert_frame_equal(
            out,
            pd.DataFrame(
                {"node": ["a", "b", "e"], "dist": np.array([0, 1, 0], dtype="int64")}
            ),
        )

    def test_path_opt_seed_cycle_keeps_zero(self):
        from tripsu_ray.pipelines.paths import path_opt

        t = _triples([("a", "next", "a", KIND_IRI), ("a", "next", "b", KIND_IRI)])
        out = path_opt(t, ("pred", "next"), ["a"], num_partitions=4)
        pd.testing.assert_frame_equal(
            out,
            pd.DataFrame({"node": ["a", "b"], "dist": np.array([0, 1], dtype="int64")}),
        )


@pytest.mark.usefixtures("ray_session")
class TestExistsFilters:
    def _graph(self):
        return _triples(
            [
                ("f1", "lang", "py", KIND_LITERAL),
                ("f2", "lang", "js", KIND_LITERAL),
                ("f3", "lang", "py", KIND_LITERAL),
                ("f1", "imports", "mod/utils.io", KIND_IRI),
                ("f1", "imports", "mod/core", KIND_IRI),
                ("f2", "imports", "mod/utils.fmt", KIND_IRI),
                ("f3", "imports", "mod/other", KIND_IRI),
            ]
        )

    def test_exists_semi_join(self):
        out = (
            bgp(
                self._graph(),
                [("?f", "lang", "?l")],
                exists=[
                    ([("?f", "imports", "?m")], [("m", "prefix", "mod/utils")])
                ],
                num_partitions=4,
            )
            .to_pandas()
            .sort_values("f", ignore_index=True)
        )
        assert out["f"].tolist() == ["f1", "f2"]

    def test_not_exists_anti_join(self):
        out = (
            bgp(
                self._graph(),
                [("?f", "lang", "?l")],
                not_exists=[
                    ([("?f", "imports", "?m")], [("m", "prefix", "mod/core")])
                ],
                num_partitions=4,
            )
            .to_pandas()
            .sort_values("f", ignore_index=True)
        )
        assert out["f"].tolist() == ["f2", "f3"]

    def test_exists_and_not_exists_compose(self):
        out = (
            bgp(
                self._graph(),
                [("?f", "lang", "?l")],
                exists=[([("?f", "imports", "?m")], [("m", "prefix", "mod/utils")])],
                not_exists=[([("?f", "imports", "?h")], [("h", "prefix", "mod/core")])],
                num_partitions=4,
            )
            .to_pandas()
            .sort_values("f", ignore_index=True)
        )
        assert out["f"].tolist() == ["f2"]

    def test_disjoint_exists_is_global_gate(self):
        # no shared variable: EXISTS keeps everything iff the group matches
        # at all; NOT EXISTS wipes — the corner where MINUS removes NOTHING
        t = self._graph()
        kept = bgp(
            t,
            [("?f", "lang", "?l")],
            exists=[[("?x", "imports", "mod/core")]],
            num_partitions=4,
        ).to_pandas()
        assert len(kept) == 3
        wiped = bgp(
            t,
            [("?f", "lang", "?l")],
            not_exists=[[("?x", "imports", "mod/core")]],
            num_partitions=4,
        ).to_pandas()
        assert len(wiped) == 0
        # an unmatched disjoint group gates the other way
        kept2 = bgp(
            t,
            [("?f", "lang", "?l")],
            not_exists=[[("?x", "imports", "mod/nope")]],
            num_partitions=4,
        ).to_pandas()
        assert len(kept2) == 3

    def test_exists_vs_pandas_random(self):
        rng = np.random.default_rng(19)
        edges = [
            (f"s{i}", "p", f"o{j}", KIND_IRI)
            for i, j in zip(rng.integers(0, 20, 120), rng.integers(0, 8, 120))
        ]
        tags = [(f"s{i}", "tag", "t", KIND_LITERAL) for i in range(20)]
        t = _triples(edges + tags)
        out = (
            bgp(
                t,
                [("?s", "tag", "?g")],
                exists=[[("?s", "p", "o3")]],
                num_partitions=4,
            )
            .to_pandas()["s"]
            .sort_values(ignore_index=True)
        )
        e = pd.DataFrame([r[:3] for r in edges], columns=["s", "p", "o"])
        want = sorted(set(e[e["o"] == "o3"]["s"]))
        assert out.tolist() == want


@pytest.mark.usefixtures("ray_session")
def test_bgp_group_concat_order_and_distinct():
    from tripsu_ray.pipelines.bgp import q_kg_bgp_group_concat  # noqa: F401 (smoke import)
    from tripsu_ray.pipelines.bgp import bgp

    # order discipline verified on the kernel shape: distinct + sorted
    # before ONE render (the showcase itself is oracle-checked at sf0.01)
    t = _triples(
        [
            ("r1", "author", "alice", KIND_IRI),
            ("f1", "inRepo", "r1", KIND_IRI),
            ("f1", "imports", "zmod", KIND_IRI),
            ("f1", "imports", "amod", KIND_IRI),
            ("f2", "inRepo", "r1", KIND_IRI),
            ("f2", "imports", "amod", KIND_IRI),  # duplicate across files
        ]
    )
    matches = bgp(
        t,
        [("?r", "author", "?a"), ("?f", "inRepo", "?r"), ("?f", "imports", "?m")],
        num_partitions=4,
    ).to_pandas()
    d = matches[["a", "m"]].drop_duplicates().sort_values(["a", "m"])
    assert ",".join(d[d["a"] == "alice"]["m"]) == "amod,zmod"


@pytest.mark.usefixtures("ray_session")
def test_bgp_topk_offset_paging():
    from tripsu_ray.pipelines.bgp import bgp_topk

    t = _triples([(f"s{i:02d}", "v", str(100 + i), KIND_LITERAL) for i in range(30)])
    page = bgp_topk(
        t, [("?s", "v", "?x")], order_by="?x", limit=5, offset=10, num_partitions=4
    ).to_pandas()
    assert list(page["x"]) == [str(110 + i) for i in range(5)]
    # offset past the end → empty page, schema intact
    tail = bgp_topk(
        t, [("?s", "v", "?x")], order_by="?x", limit=5, offset=29, num_partitions=4
    ).to_pandas()
    assert list(tail["x"]) == ["129"]


@pytest.mark.usefixtures("ray_session")
def test_bgp_subquery_top_module_per_repo():
    """Inner aggregate subquery + per-repo winner vs a pandas replica of
    the same (n DESC, module ASC) total order."""
    from tripsu_ray.pipelines.bgp import bgp, q_kg_bgp_subquery
    from tripsu_ray.sources.synth import read_source_files
    from tripsu_ray.stages.extract import NS, extract_triples

    sf = "/root/testdata/sf0.001"
    got = (
        q_kg_bgp_subquery(sf)
        .to_pandas()
        .sort_values("repo", ignore_index=True)
    )
    matches = bgp(
        extract_triples(read_source_files(sf)).materialize(),
        [("?f", f"{NS}imports", "?m"), ("?f", f"{NS}inRepo", "?r")],
        num_partitions=4,
    ).to_pandas()
    agg = matches.groupby(["r", "m"]).size().reset_index(name="n")
    agg = agg.sort_values(["r", "n", "m"], ascending=[True, False, True])
    want = (
        agg.groupby("r").head(1)
        .rename(columns={"r": "repo", "m": "top_module", "n": "n_files"})
        .sort_values("repo", ignore_index=True)
        .astype({"n_files": "int64"})
    )
    pd.testing.assert_frame_equal(got, want[["repo", "top_module", "n_files"]])


@pytest.mark.usefixtures("ray_session")
def test_path_range_bounded_repetition():
    """p{1,2} over a chain graph: exactly 1- and 2-hop pairs, no 3-hop."""
    from tripsu_ray.pipelines.paths import compile_path, path_distinct

    t = _triples(
        [
            ("a", "p", "b", KIND_IRI),
            ("b", "p", "c", KIND_IRI),
            ("c", "p", "d", KIND_IRI),
            ("a", "q", "x", KIND_IRI),  # other predicate: never traversed
        ]
    )
    got = path_distinct(
        compile_path(t, ("range", ("pred", "p"), 1, 2), num_partitions=4),
        num_partitions=4,
    ).to_pandas()
    pairs = set(map(tuple, got[["a", "b"]].values))
    assert pairs == {("a", "b"), ("b", "c"), ("c", "d"), ("a", "c"), ("b", "d")}
    # lo=2 drops the 1-hop pairs
    got2 = path_distinct(
        compile_path(t, ("range", ("pred", "p"), 2, 2), num_partitions=4),
        num_partitions=4,
    ).to_pandas()
    assert set(map(tuple, got2[["a", "b"]].values)) == {("a", "c"), ("b", "d")}
    # inverse distributes over the bounded power
    got3 = path_distinct(
        compile_path(t, ("inv", ("range", ("pred", "p"), 1, 2)), num_partitions=4),
        num_partitions=4,
    ).to_pandas()
    assert set(map(tuple, got3[["a", "b"]].values)) == {
        ("b", "a"), ("c", "b"), ("d", "c"), ("c", "a"), ("d", "b")
    }


@pytest.mark.usefixtures("ray_session")
def test_path_gated_local_equals_forced_distributed():
    """The _PATH_DRIVER_MAX local fast path (seq join, range powers, global
    distinct) must be bit-equal to the forced distributed exchanges
    (driver_max=0 disables every gate)."""
    from tripsu_ray.pipelines.paths import compile_path, path_distinct

    t = _triples(
        [
            ("a", "p", "b", KIND_IRI),
            ("b", "p", "c", KIND_IRI),
            ("c", "p", "d", KIND_IRI),
            ("d", "p", "a", KIND_IRI),
            ("b", "q", "e", KIND_IRI),
            ("c", "q", "e", KIND_IRI),
            ("a", "p", "b", KIND_IRI),  # duplicate edge: distinct must fold it
        ]
    )
    for expr in (
        ("seq", ("pred", "p"), ("pred", "q")),
        ("range", ("seq", ("inv", ("pred", "p")), ("pred", "p")), 1, 2),
        ("inv", ("range", ("pred", "p"), 2, 3)),
    ):
        local = path_distinct(
            compile_path(t, expr, num_partitions=4), num_partitions=4
        ).to_pandas().sort_values(["a", "b"], ignore_index=True)
        dist = path_distinct(
            compile_path(t, expr, num_partitions=4, driver_max=0),
            num_partitions=4, driver_max=0,
        ).to_pandas().sort_values(["a", "b"], ignore_index=True)
        pd.testing.assert_frame_equal(local, dist)
        assert len(local) > 0


@pytest.mark.usefixtures("ray_session")
def test_bgp_coalesce_unbound_rows_fold_into_sentinel():
    """Repos without an author row land in the 'unknown' bucket; total
    repo count is conserved across buckets."""
    from tripsu_ray.pipelines.bgp import q_kg_bgp_coalesce
    from tripsu_ray.sources.synth import read_source_files
    from tripsu_ray.stages.extract import NS, extract_triples

    sf = "/root/testdata/sf0.001"
    got = q_kg_bgp_coalesce(sf).to_pandas()
    triples = extract_triples(read_source_files(sf)).materialize().to_pandas()
    repos = set(
        triples.loc[
            (triples["predicate"].str.endswith("#type")
             | triples["predicate"].str.contains("rdf-syntax-ns#type"))
            & (triples["object_value"] == NS + "Repository"),
            "subject",
        ]
    )
    authored = triples[triples["predicate"] == NS + "author"][["subject", "object_value"]]
    authored = authored[authored["subject"].isin(repos)].drop_duplicates()
    n_unknown = len(repos - set(authored["subject"]))
    assert got["n_repos"].sum() == len(authored.groupby(["subject", "object_value"])) + n_unknown
    if n_unknown:
        assert got.set_index("author").loc["unknown", "n_repos"] == n_unknown
