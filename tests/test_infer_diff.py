"""RDFS inference (stages/infer.py), symmetric diff (stages/diff.py),
and the two-pass histogram — handcrafted graphs vs manual expectations."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tripsu_ray.schema import KIND_IRI, KIND_LITERAL, RDF_TYPE
from tripsu_ray.stages.infer import rdfs_type_census, subclass_closure


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


class TestSubclassClosure:
    def test_transitive(self):
        clo = subclass_closure([("A", "B"), ("B", "C"), ("C", "D")])
        assert clo["A"] == ("B", "C", "D")
        assert clo["B"] == ("C", "D")
        assert clo["C"] == ("D",)

    def test_diamond(self):
        clo = subclass_closure([("A", "B"), ("A", "C"), ("B", "D"), ("C", "D")])
        assert clo["A"] == ("B", "C", "D")

    def test_cycle_tolerated_no_self(self):
        clo = subclass_closure([("A", "B"), ("B", "A")])
        assert clo["A"] == ("B",) and clo["B"] == ("A",)


@pytest.mark.usefixtures("ray_session")
class TestRdfsCensus:
    def test_inferred_counts(self):
        t = _triples(
            [
                ("f1", RDF_TYPE, "Function", KIND_IRI),
                ("f2", RDF_TYPE, "Function", KIND_IRI),
                ("c1", RDF_TYPE, "Class", KIND_IRI),
                # c1 ALSO directly asserted as Symbol: the inferred Symbol
                # must not double-count it
                ("c1", RDF_TYPE, "Symbol", KIND_IRI),
                ("x", "other", "y", KIND_IRI),
            ]
        )
        onto = [("Function", "Symbol"), ("Class", "Symbol"), ("Symbol", "Entity")]
        out = (
            rdfs_type_census(t, onto, num_partitions=4)
            .to_pandas()
            .sort_values("type", ignore_index=True)
        )
        want = pd.DataFrame(
            {
                "type": ["Class", "Entity", "Function", "Symbol"],
                "n": [1, 3, 2, 3],
            }
        ).astype({"n": "int64"})
        pd.testing.assert_frame_equal(out, want)

    def test_duplicate_assertions_across_partitions(self):
        rows = [("s%d" % (i % 4), RDF_TYPE, "Function", KIND_IRI) for i in range(40)]
        out = rdfs_type_census(_triples(rows), [("Function", "Symbol")], num_partitions=4)
        got = dict(zip(*(lambda d: (d["type"], d["n"]))(out.to_pandas())))
        assert got == {"Function": 4, "Symbol": 4}


@pytest.mark.usefixtures("ray_session")
class TestSymmetricDiff:
    def _ds(self, rows):
        import ray.data

        return ray.data.from_pandas(
            pd.DataFrame(rows, columns=["a", "b"]).astype(object)
        ).repartition(3)

    def test_added_removed_common_dropped(self):
        from tripsu_ray.stages.diff import symmetric_diff

        old = self._ds([("x", "1"), ("y", "2"), ("z", "3")])
        new = self._ds([("y", "2"), ("z", "9"), ("w", "4")])
        out = (
            symmetric_diff(old, new, ["a", "b"], num_partitions=4)
            .to_pandas()
            .sort_values(["a", "b", "side"], ignore_index=True)
        )
        want = pd.DataFrame(
            [
                ("w", "4", "added"),
                ("x", "1", "removed"),
                ("z", "3", "removed"),
                ("z", "9", "added"),
            ],
            columns=["a", "b", "side"],
        ).astype(object)
        pd.testing.assert_frame_equal(out.astype(object), want)

    def test_duplicates_collapse(self):
        from tripsu_ray.stages.diff import symmetric_diff

        old = self._ds([("x", "1")] * 7)
        new = self._ds([("x", "1"), ("q", "0"), ("q", "0")])
        out = symmetric_diff(old, new, ["a", "b"], num_partitions=4).to_pandas()
        assert len(out) == 1 and out.iloc[0]["side"] == "added"

    def test_identical_inputs_empty(self):
        from tripsu_ray.stages.diff import symmetric_diff

        old = self._ds([("x", "1"), ("y", "2")])
        new = self._ds([("y", "2"), ("x", "1")])
        assert symmetric_diff(old, new, ["a", "b"], num_partitions=4).count() == 0


@pytest.mark.usefixtures("ray_session")
class TestHistogram:
    SF = "/root/testdata/sf0.001"

    def test_matches_pandas(self):
        from tripsu_ray.pipelines.docops import q_rel_histogram

        out = q_rel_histogram(self.SF).to_pandas().sort_values("bucket", ignore_index=True)
        li = pd.read_parquet(f"{self.SF}/lineitem.parquet", columns=["l_extendedprice"])
        cents = (li["l_extendedprice"] * 100).round().astype("int64")
        lo, hi = cents.min(), cents.max()
        bucket = (cents - lo) * 16 // (hi - lo + 1)
        want = (
            pd.DataFrame({"bucket": bucket, "cents": cents})
            .groupby("bucket", sort=True)["cents"]
            .agg(n_rows="size", lo_cents="min", hi_cents="max")
            .reset_index()
            .astype("int64")
        )
        pd.testing.assert_frame_equal(out, want)
        assert out["bucket"].between(0, 15).all()
        assert out["n_rows"].sum() == len(li)


@pytest.mark.usefixtures("ray_session")
class TestRowNumber:
    SF = "/root/testdata/sf0.001"

    def test_matches_window_function(self):
        from tripsu_ray.pipelines.docops import q_rel_row_number

        out = (
            q_rel_row_number(self.SF, num_partitions=8)
            .to_pandas()
            .sort_values("o_orderkey", ignore_index=True)
        )
        keys = pd.read_parquet(f"{self.SF}/orders.parquet", columns=["o_orderkey"])[
            "o_orderkey"
        ].sort_values(ignore_index=True)
        want = pd.DataFrame(
            {"o_orderkey": keys.astype("int64"),
             "rn": np.arange(1, len(keys) + 1, dtype="int64")}
        )
        pd.testing.assert_frame_equal(out, want)


@pytest.mark.usefixtures("ray_session")
class TestDomainRange:
    def test_rules_and_closure_compose(self):
        import ray.data

        from tripsu_ray.functions.rdf import triples_table
        from tripsu_ray.schema import KIND_IRI, KIND_LITERAL, RDF_TYPE
        from tripsu_ray.stages.infer import rdfs_domain_range_census

        rows = [
            # f1 asserted File; f2 untyped but subjects an `imports` triple
            ("f1", 0, RDF_TYPE, "File", KIND_IRI, None, None),
            ("f1", 0, "imports", "m1", KIND_IRI, None, None),
            ("f2", 0, "imports", "m2", KIND_IRI, None, None),
            # literal object: range rule must NOT fire
            ("r1", 0, "author", "alice", KIND_LITERAL, None, None),
        ]
        t = ray.data.from_arrow(triples_table(rows)).repartition(2)
        out = (
            rdfs_domain_range_census(
                t,
                [("File", "Resource"), ("Module", "Resource")],
                {"imports": "File", "author": "Repository"},
                {"imports": "Module", "author": "Person"},
            )
            .to_pandas()
            .sort_values("type", ignore_index=True)
        )
        want = pd.DataFrame(
            {
                # File: f1 (asserted + domain), f2 (domain) → 2
                # Module: m1, m2 (range) → 2; Repository: r1 (domain) → 1
                # Resource: superclass of File ∪ Module → f1 f2 m1 m2 → 4
                # Person: author object is a LITERAL → rule must not fire
                "type": ["File", "Module", "Repository", "Resource"],
                "n": np.array([2, 2, 1, 4], dtype="int64"),
            }
        )
        pd.testing.assert_frame_equal(out, want)

    def test_no_double_count_across_rules(self):
        import ray.data

        from tripsu_ray.functions.rdf import triples_table
        from tripsu_ray.schema import KIND_IRI, RDF_TYPE
        from tripsu_ray.stages.infer import rdfs_domain_range_census

        # f typed File by ASSERTION and by TWO domain rules and duplicated
        # across partitions: census must count it once
        rows = [
            ("f", 0, RDF_TYPE, "File", KIND_IRI, None, None),
            ("f", 0, "imports", "m", KIND_IRI, None, None),
            ("f", 0, "inRepo", "r", KIND_IRI, None, None),
            ("f", 0, "imports", "m2", KIND_IRI, None, None),
        ]
        t = ray.data.from_arrow(triples_table(rows)).repartition(3)
        out = rdfs_domain_range_census(
            t, [], {"imports": "File", "inRepo": "File"}, {}
        ).to_pandas()
        assert out.set_index("type")["n"]["File"] == 1
