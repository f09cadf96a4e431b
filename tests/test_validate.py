"""SHACL-lite graph validation (stages/validate.py).

Two angles: a hand-built graph with KNOWN violations per constraint (the
census must match exactly), and the synthetic corpus (non-zero
repo-single-author / repo-single-license violations by construction; all
other shapes clean) cross-checked against an independent pandas recompute
over the same distinct triples.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tripsu_ray.schema import KIND_IRI, KIND_LITERAL
from tripsu_ray.schema import RDF_TYPE
from tripsu_ray.stages.extract import NS
from tripsu_ray.stages.validate import CONSTRAINTS, validate_graph

from tests.test_graph import _ds


def _t(s, p, o, k=KIND_IRI):
    return {
        "subject": s,
        "subject_kind": np.int8(0),
        "predicate": p,
        "object_value": o,
        "object_kind": np.int8(k),
        "object_lang": None,
        "object_datatype": None,
    }


GOOD_SHA = "a" * 64


def _violating_graph() -> pd.DataFrame:
    F, R, M = NS + "File", NS + "Repository", NS + "Module"
    rows = [
        # f1: fully clean file
        _t("f1", RDF_TYPE, F),
        _t("f1", NS + "language", "py", KIND_LITERAL),
        _t("f1", NS + "commitHash", "c1", KIND_LITERAL),
        _t("f1", NS + "sha256", GOOD_SHA, KIND_LITERAL),
        _t("f1", NS + "imports", "m1"),
        _t("m1", RDF_TYPE, M),
        _t("f1", NS + "defines", "sym1"),
        _t("sym1", NS + "name", "fn", KIND_LITERAL),
        # f2: no language, TWO commit hashes, imports a non-module,
        # defines an unnamed symbol, malformed sha
        _t("f2", RDF_TYPE, F),
        _t("f2", NS + "commitHash", "c2", KIND_LITERAL),
        _t("f2", NS + "commitHash", "c3", KIND_LITERAL),
        _t("f2", NS + "sha256", "NOT-HEX", KIND_LITERAL),
        _t("f2", NS + "imports", "notmod"),
        _t("f2", NS + "defines", "sym2"),
        # r1: two authors, one license → one author violation
        _t("r1", RDF_TYPE, R),
        _t("r1", NS + "author", "alice", KIND_LITERAL),
        _t("r1", NS + "author", "bob", KIND_LITERAL),
        _t("r1", NS + "license", "MIT", KIND_LITERAL),
        # r2: clean repo
        _t("r2", RDF_TYPE, R),
        _t("r2", NS + "author", "carol", KIND_LITERAL),
        # g1: untyped subject that imports → domain violation
        _t("g1", NS + "imports", "m1"),
    ]
    df = pd.DataFrame(rows)
    # duplicate every row across blocks: the census must not double-count
    return pd.concat([df, df], ignore_index=True)


EXPECTED = {
    #                      (n_checked, n_violations)
    "defines_range_named": (2, 1),  # sym1 named, sym2 not
    "file_has_language": (2, 1),  # f2
    "file_single_commit": (2, 1),  # f2 has two
    "imports_domain_is_file": (3, 1),  # f1, f2, g1 — g1 untyped
    "imports_range_is_module": (2, 1),  # m1 ok, notmod untyped
    "repo_single_author": (2, 1),  # r1
    "repo_single_license": (2, 0),
    "sha256_wellformed": (2, 1),  # f2's NOT-HEX
}


@pytest.mark.usefixtures("ray_session")
class TestValidate:
    def test_census_on_violating_graph(self):
        got = validate_graph(_ds(_violating_graph(), blocks=4))
        assert list(got["constraint_name"]) == list(CONSTRAINTS)
        for _, row in got.iterrows():
            assert (row["n_checked"], row["n_violations"]) == EXPECTED[
                row["constraint_name"]
            ], row["constraint_name"]

    def test_empty_graph_census_is_zero(self):
        got = validate_graph(_ds(_violating_graph().iloc[:0], blocks=1))
        assert list(got["constraint_name"]) == list(CONSTRAINTS)
        assert (got["n_checked"] == 0).all()
        assert (got["n_violations"] == 0).all()

    def test_synthetic_corpus_shapes(self):
        from tripsu_ray.sources.synth import read_source_files
        from tripsu_ray.stages.extract import extract_triples

        got = validate_graph(
            extract_triples(read_source_files("/root/testdata/sf0.001"))
        ).set_index("constraint_name")

        # corpus-by-construction: repos mix authors (d%11) and licenses
        # (d%3) across their files; every other shape is clean
        assert got.loc["repo_single_author", "n_violations"] > 0
        assert got.loc["repo_single_license", "n_violations"] > 0
        for clean in (
            "defines_range_named",
            "file_has_language",
            "file_single_commit",
            "imports_domain_is_file",
            "imports_range_is_module",
            "sha256_wellformed",
        ):
            assert got.loc[clean, "n_violations"] == 0, clean
            assert got.loc[clean, "n_checked"] > 0, clean
        # every file carries exactly one commit hash → checked == #files
        assert (
            got.loc["file_single_commit", "n_checked"]
            == got.loc["file_has_language", "n_checked"]
        )
