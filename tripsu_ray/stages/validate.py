"""SHACL-lite graph validation: declarative shape constraints checked in
ONE node-partitioned pass over the triple stream.

The reference pipeline trusts its input graph (tripsu validates only the
rules *config* — src/rules.rs load-time checks, SURVEY.md §2.6/U5); a KG
construction pipeline at corpus scale also needs to validate the *graph it
built* — cardinality shapes ("a file has exactly one commit hash"),
domain/range shapes ("only File nodes import", "imports point at Module
nodes"), and datatype shapes ("sha256 literals are 64 lowercase hex
chars") — the core of SHACL / ShEx, re-expressed Ray-Data-first.

Scale plan (the classic "gather per entity, then validate" shape):

- one map pass over locally-deduped triples emits compact *messages*
  ``(node, code, value)`` keyed by the node each constraint judges — a
  triple like ``(f, imports, m)`` feeds two constraints, so it emits one
  message keyed by ``f`` (domain check) and one keyed by ``m`` (range
  check). Type facts travel as messages too, so a node's partition holds
  everything needed to judge it.
- ONE hash exchange on the node co-locates each node's messages;
  duplicates (the triple stream is only locally deduped) collapse with a
  per-partition ``drop_duplicates`` — exact, because equal messages share
  a partition.
- each partition evaluates every constraint vectorized (set algebra +
  ``groupby().nunique()`` — no per-row Python) and emits a census partial
  ``(constraint_name, n_checked, n_violations)``; a tree fold sums the
  tiny partials.

Output: one row per constraint — conformance census, not just the
violation list, so clean constraints are still visible as checked-and-zero.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..schema import KIND_IRI, RDF_TYPE
from .extract import NS
from .folds import tree_fold_tables
from .materialize import _dedup_batch

_HASH_PARTS = 64

# message codes (int8): what a triple contributes to some node's judgement
_T_FILE, _T_REPO, _T_MOD = 0, 1, 2
_LANG, _COMMIT, _AUTHOR, _LICENSE = 3, 4, 5, 6
_IMPORTS_SUBJ, _IMPORTED_OBJ = 7, 8
_SHA = 9
_DEFINED_OBJ, _HAS_NAME = 10, 11

#: constraint names in output order (sorted)
CONSTRAINTS = (
    "defines_range_named",
    "file_has_language",
    "file_single_commit",
    "imports_domain_is_file",
    "imports_range_is_module",
    "repo_single_author",
    "repo_single_license",
    "sha256_wellformed",
)

_SHA_RE = r"^[0-9a-f]{64}$"


def _messages(batch: pa.Table) -> pd.DataFrame:
    """TRIPLES batch → (node, code, value) message rows (vectorized masks)."""
    s = batch["subject"].to_numpy(zero_copy_only=False)
    p = batch["predicate"].to_numpy(zero_copy_only=False)
    o = batch["object_value"].to_numpy(zero_copy_only=False)
    k = batch["object_kind"].to_numpy(zero_copy_only=False)

    nodes, codes, values = [], [], []

    def emit(node_arr, code, value_arr=None):
        n = len(node_arr)
        if not n:
            return
        nodes.append(node_arr)
        codes.append(np.full(n, code, dtype=np.int8))
        values.append(
            value_arr if value_arr is not None else np.full(n, "", dtype=object)
        )

    is_type = p == RDF_TYPE
    emit(s[is_type & (o == NS + "File")], _T_FILE)
    emit(s[is_type & (o == NS + "Repository")], _T_REPO)
    emit(s[is_type & (o == NS + "Module")], _T_MOD)

    for pred, code in (
        ("language", _LANG),
        ("commitHash", _COMMIT),
        ("author", _AUTHOR),
        ("license", _LICENSE),
        ("sha256", _SHA),
    ):
        m = p == NS + pred
        emit(s[m], code, o[m])

    imp = p == NS + "imports"
    emit(s[imp], _IMPORTS_SUBJ)
    emit(o[imp & (k == KIND_IRI)], _IMPORTED_OBJ)

    dfn = p == NS + "defines"
    emit(o[dfn & (k == KIND_IRI)], _DEFINED_OBJ)
    emit(s[p == NS + "name"], _HAS_NAME)

    if not nodes:
        return pd.DataFrame(
            {
                "node": pd.Series([], dtype=object),
                "code": pd.Series([], dtype=np.int8),
                "value": pd.Series([], dtype=object),
            }
        )
    df = pd.DataFrame(
        {
            "node": np.concatenate(nodes),
            "code": np.concatenate(codes),
            "value": np.concatenate(values),
        }
    )
    df["_part"] = pd.util.hash_array(df["node"].to_numpy(dtype=object)) % _HASH_PARTS
    return df


def _census_rows(checked: int, violations: int, name: str) -> dict:
    return {
        "constraint_name": name,
        "n_checked": int(checked),
        "n_violations": int(violations),
    }


def _evaluate_partition(g: pd.DataFrame) -> pd.DataFrame:
    """All messages of this partition's nodes → census partial (8 rows)."""
    g = g.drop(columns=["_part"]).drop_duplicates()
    rows = []

    def nodes_of(code) -> pd.Index:
        return pd.Index(g.loc[g["code"] == code, "node"].unique())

    def nunique_of(code) -> pd.Series:
        sub = g[g["code"] == code]
        return sub.groupby("node", sort=False)["value"].nunique()

    files, repos, mods = nodes_of(_T_FILE), nodes_of(_T_REPO), nodes_of(_T_MOD)

    defined, named = nodes_of(_DEFINED_OBJ), nodes_of(_HAS_NAME)
    rows.append(
        _census_rows(len(defined), len(defined.difference(named)), "defines_range_named")
    )
    rows.append(
        _census_rows(
            len(files),
            len(files.difference(nodes_of(_LANG))),
            "file_has_language",
        )
    )
    commits = nunique_of(_COMMIT).reindex(files, fill_value=0)
    rows.append(
        _census_rows(len(files), int((commits != 1).sum()), "file_single_commit")
    )
    imp_s = nodes_of(_IMPORTS_SUBJ)
    rows.append(
        _census_rows(
            len(imp_s), len(imp_s.difference(files)), "imports_domain_is_file"
        )
    )
    imp_o = nodes_of(_IMPORTED_OBJ)
    rows.append(
        _census_rows(
            len(imp_o), len(imp_o.difference(mods)), "imports_range_is_module"
        )
    )
    authors = nunique_of(_AUTHOR).reindex(repos, fill_value=0)
    rows.append(
        _census_rows(len(repos), int((authors > 1).sum()), "repo_single_author")
    )
    licenses = nunique_of(_LICENSE).reindex(repos, fill_value=0)
    rows.append(
        _census_rows(len(repos), int((licenses > 1).sum()), "repo_single_license")
    )
    sha = g[g["code"] == _SHA]
    ok = sha["value"].str.fullmatch(_SHA_RE[1:-1]) if len(sha) else pd.Series([], dtype=bool)
    rows.append(_census_rows(len(sha), int((~ok).sum()), "sha256_wellformed"))

    return pd.DataFrame(rows)


def validate_graph(triples) -> pd.DataFrame:
    """Triple Dataset → conformance census DataFrame
    (constraint_name, n_checked, n_violations), one row per constraint.

    Each per-node constraint is judged inside the node's own partition, so
    the partial censuses are disjoint node sets and their sums are exact.
    """
    local = triples.map_batches(_dedup_batch, batch_format="pyarrow")
    msgs = local.map_batches(_messages, batch_format="pyarrow")
    partials = msgs.groupby("_part").map_groups(
        _evaluate_partition, batch_format="pandas"
    )

    def combine(frames):
        df = pd.concat(frames, ignore_index=True)
        return df.groupby("constraint_name", sort=False, as_index=False)[
            ["n_checked", "n_violations"]
        ].sum()

    out = tree_fold_tables(partials, combine)
    if out is None:
        out = pd.DataFrame(
            {
                "constraint_name": list(CONSTRAINTS),
                "n_checked": [0] * len(CONSTRAINTS),
                "n_violations": [0] * len(CONSTRAINTS),
            }
        )
    return (
        out.sort_values("constraint_name", ignore_index=True)
        .astype({"n_checked": "int64", "n_violations": "int64"})
    )
