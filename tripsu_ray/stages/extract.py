"""Triple extraction from source files (the north-star's new scope).

``TripleExtractor`` is an actor-pool ``map_batches`` stage: regexes compile
once per actor in ``__init__``; ``__call__`` turns a SOURCE_FILES batch into
a TRIPLES batch. Emits, per file: repo/file/type facts, language + commit +
content-sha256 literals (the per-row invariant vs the reference corpus),
author/license facts on the repo, import edges (+ Module type nodes),
def edges (+ Function/Class symbol nodes with name literals), and call
edges.

The regex patterns are module-level constants shared verbatim with the
DuckDB oracle SQL (``tripsu_ray.pipelines.oracle``) — one spec, two
renderings. All patterns are RE2-compatible.

The ``content`` column is dropped here: downstream shuffles move only
triples (SURVEY.md §7.4 — wide-content risk).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.crypto import content_sha256
from ..schema import KIND_IRI, KIND_LITERAL, RDF_TYPE, TRIPLES

NS = "http://kg.example/ns#"
FILE_NS = "http://kg.example/file/"
REPO_NS = "http://kg.example/repo/"
MOD_NS = "http://kg.example/mod/"
SYM_NS = "http://kg.example/sym/"
CALL_NS = "http://kg.example/call/"

# --- extraction patterns (single spec, also rendered into oracle SQL) ------
IMPORT_PATTERNS: dict[str, list[str]] = {
    "py": [r"(?m)^import ([A-Za-z_][A-Za-z0-9_.]*)$", r"(?m)^from ([A-Za-z_][A-Za-z0-9_.]*) import"],
    "js": [r"require\('([^']+)'\)", r"from '([^']+)'"],
    "rs": [r"(?m)^use ([A-Za-z_][A-Za-z0-9_]*)"],
}
FUNC_PATTERNS: dict[str, str] = {
    "py": r"(?m)^def ([A-Za-z_][A-Za-z0-9_]*)",
    "js": r"(?m)^function ([A-Za-z_][A-Za-z0-9_]*)",
    "rs": r"(?m)^fn ([A-Za-z_][A-Za-z0-9_]*)",
}
CLASS_PATTERNS: dict[str, str] = {
    "py": r"(?m)^class ([A-Za-z_][A-Za-z0-9_]*)",
    "js": r"(?m)^class ([A-Za-z_][A-Za-z0-9_]*)",
    "rs": r"(?m)^struct ([A-Za-z_][A-Za-z0-9_]*)",
}
CALL_PATTERNS: dict[str, str] = {
    "py": r"([A-Za-z_][A-Za-z0-9_]*)\.run\(",
    "js": r"([A-Za-z_][A-Za-z0-9_]*)\.run\(",
    "rs": r"([A-Za-z_][A-Za-z0-9_]*)::run\(",
}
AUTHOR_PATTERNS: dict[str, str] = {
    "py": r"(?m)^# Author: (.+)$",
    "js": r"(?m)^// Author: (.+)$",
    "rs": r"(?m)^// Author: (.+)$",
}
LICENSE_PATTERNS: dict[str, str] = {
    "py": r"(?m)^# License: (.+)$",
    "js": r"(?m)^// License: (.+)$",
    "rs": r"(?m)^// License: (.+)$",
}

LANGS = ("py", "js", "rs")


def _triples_from_cols(s, o, pred: str, o_kind: int) -> dict:
    n = len(s)
    return {
        "subject": np.asarray(s, dtype=object),
        "predicate": np.full(n, pred, dtype=object),
        "object_value": np.asarray(o, dtype=object),
        "object_kind": np.full(n, o_kind, dtype=np.int8),
    }


class TripleExtractor:
    """Stateful extraction stage — compile once per actor, vectorize per batch."""

    def __init__(self):
        self.imports = {lg: [re.compile(p) for p in IMPORT_PATTERNS[lg]] for lg in LANGS}
        self.funcs = {lg: re.compile(FUNC_PATTERNS[lg]) for lg in LANGS}
        self.classes = {lg: re.compile(CLASS_PATTERNS[lg]) for lg in LANGS}
        self.calls = {lg: re.compile(CALL_PATTERNS[lg]) for lg in LANGS}
        self.authors = {lg: re.compile(AUTHOR_PATTERNS[lg]) for lg in LANGS}
        self.licenses = {lg: re.compile(LICENSE_PATTERNS[lg]) for lg in LANGS}

    def __call__(self, batch: pa.Table) -> pa.Table:
        repo = batch["repo"].to_pandas()
        path = batch["path"].to_pandas()
        commit = batch["commit"].to_pandas()
        lang = batch["lang"].to_pandas()
        content = batch["content"].to_pandas()

        file_iri = (FILE_NS + repo + "/" + path).to_numpy(dtype=object)
        repo_iri = (REPO_NS + repo).to_numpy(dtype=object)
        sha = content_sha256(content.to_numpy(dtype=object))

        parts: list[dict] = [
            _triples_from_cols(file_iri, np.full(len(repo), NS + "File", dtype=object), RDF_TYPE, KIND_IRI),
            _triples_from_cols(file_iri, repo_iri, NS + "inRepo", KIND_IRI),
            _triples_from_cols(repo_iri, np.full(len(repo), NS + "Repository", dtype=object), RDF_TYPE, KIND_IRI),
            _triples_from_cols(file_iri, lang.to_numpy(dtype=object), NS + "language", KIND_LITERAL),
            _triples_from_cols(file_iri, commit.to_numpy(dtype=object), NS + "commitHash", KIND_LITERAL),
            _triples_from_cols(file_iri, sha, NS + "sha256", KIND_LITERAL),
        ]

        # per-lang vectorized regex extraction
        for lg in LANGS:
            sel = (lang == lg).to_numpy()
            if not sel.any():
                continue
            c = content[sel]
            f_iri = file_iri[sel]
            r_iri = repo_iri[sel]
            rp, pt = repo[sel], path[sel]

            # author / license → repo facts
            for pat, pred in ((self.authors[lg], "author"), (self.licenses[lg], "license")):
                vals = c.str.extract(pat, expand=False)
                ok = vals.notna().to_numpy()
                if ok.any():
                    parts.append(
                        _triples_from_cols(
                            r_iri[ok], vals.to_numpy(dtype=object)[ok], NS + pred, KIND_LITERAL
                        )
                    )

            # imports → (file, imports, mod) + (mod, rdf:type, Module)
            for rex in self.imports[lg]:
                lists = c.str.findall(rex)
                counts = lists.str.len().to_numpy()
                if counts.sum() == 0:
                    continue
                mods = np.array(
                    [MOD_NS + m for ms in lists for m in ms], dtype=object
                )
                files_rep = np.repeat(f_iri, counts)
                parts.append(_triples_from_cols(files_rep, mods, NS + "imports", KIND_IRI))
                parts.append(
                    _triples_from_cols(
                        mods, np.full(len(mods), NS + "Module", dtype=object), RDF_TYPE, KIND_IRI
                    )
                )

            # defs → (file, defines, sym) + (sym, type, Function|Class) + (sym, name, lit)
            sym_base = (SYM_NS + rp + "/" + pt + "#").to_numpy(dtype=object)
            for rex, cls in ((self.funcs[lg], "Function"), (self.classes[lg], "Class")):
                lists = c.str.findall(rex)
                counts = lists.str.len().to_numpy()
                if counts.sum() == 0:
                    continue
                names = np.array([m for ms in lists for m in ms], dtype=object)
                syms = np.repeat(sym_base, counts) + names
                files_rep = np.repeat(f_iri, counts)
                parts.append(_triples_from_cols(files_rep, syms, NS + "defines", KIND_IRI))
                parts.append(
                    _triples_from_cols(
                        syms, np.full(len(syms), NS + cls, dtype=object), RDF_TYPE, KIND_IRI
                    )
                )
                parts.append(_triples_from_cols(syms, names, NS + "name", KIND_LITERAL))

            # calls → (file, calls, call-entity)
            lists = c.str.findall(self.calls[lg])
            counts = lists.str.len().to_numpy()
            if counts.sum() > 0:
                tgts = np.array([CALL_NS + m for ms in lists for m in ms], dtype=object)
                parts.append(
                    _triples_from_cols(np.repeat(f_iri, counts), tgts, NS + "calls", KIND_IRI)
                )

        subject = np.concatenate([p["subject"] for p in parts])
        predicate = np.concatenate([p["predicate"] for p in parts])
        object_value = np.concatenate([p["object_value"] for p in parts])
        object_kind = np.concatenate([p["object_kind"] for p in parts])
        n = len(subject)
        return pa.table(
            {
                "subject": pa.array(subject, pa.string()),
                "subject_kind": pa.array(np.zeros(n, dtype=np.int8)),
                "predicate": pa.array(predicate, pa.string()),
                "object_value": pa.array(object_value, pa.string()),
                "object_kind": pa.array(object_kind, pa.int8()),
                "object_lang": pa.nulls(n, pa.string()),
                "object_datatype": pa.nulls(n, pa.string()),
            },
            schema=TRIPLES,
        )


_EXTRACTOR: TripleExtractor | None = None


def extract_batch(batch: pa.Table) -> pa.Table:
    """Stateless-task entry: compiled patterns cached once per worker process.

    Extraction has no per-job state, so a task pool (elastic, no CPU
    reservation) beats an actor pool here — a fixed pool large enough to buy
    throughput starves the read stage on small clusters (two pools of 4 on
    8 CPUs deadlock the streaming executor's admission).
    """
    global _EXTRACTOR
    if _EXTRACTOR is None:
        _EXTRACTOR = TripleExtractor()
    return _EXTRACTOR(batch)


def extract_triples(source_files, *, batch_size=None):
    """source_files Dataset → triples Dataset (stateless tasks; content dropped)."""
    return source_files.map_batches(
        extract_batch, batch_format="pyarrow", batch_size=batch_size
    )


CODE_COMMENT_RE = r"(?m)^\s*(?:#|//)"
CODE_NEWLINE_RE = r"\n"


def code_stats(files_ds):
    """Per-(repo, lang) source-code shape profile: file/line/comment-line
    counts, comment ratio and mean file length — the corpus-quality gate
    for a code-training pipeline (a repo whose comment ratio collapses is
    minified/generated code; one whose mean file length explodes is
    vendored bundles).

    Pure per-batch pandas-str partials (both regexes shared verbatim with
    the RE2 oracle; ``re.ASCII`` pins \\s to the RE2 semantics) → one tiny
    (repo, lang) tree-fold. Ratios are exact-integer floor divisions."""
    import re as _re

    from .folds import tree_fold_tables

    comment_pat = _re.compile(CODE_COMMENT_RE, _re.ASCII)
    newline_pat = _re.compile(CODE_NEWLINE_RE, _re.ASCII)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return (
            pd.DataFrame(
                {
                    "repo": b["repo"],
                    "lang": b["lang"],
                    "n_files": 1,
                    "n_lines": b["content"].str.count(newline_pat).astype("int64"),
                    "n_comment_lines": b["content"]
                    .str.count(comment_pat)
                    .astype("int64"),
                }
            )
            .groupby(["repo", "lang"], sort=False)
            .sum()
            .reset_index()
        )

    def combine(frames):
        df = pd.concat(frames, ignore_index=True)
        return df.groupby(["repo", "lang"], sort=False, as_index=False)[
            ["n_files", "n_lines", "n_comment_lines"]
        ].sum()

    folded = tree_fold_tables(
        files_ds.map_batches(partial, batch_format="pandas"), combine
    )
    cols = ["repo", "lang", "n_files", "n_lines", "n_comment_lines",
            "comment_ratio_q", "avg_lines_q"]
    if folded is None or not len(folded):
        return pd.DataFrame(
            {c: pd.Series([], dtype=object if c in ("repo", "lang") else "int64")
             for c in cols}
        )
    # a group whose files all lack a trailing newline can have n_lines == 0;
    # clip the denominator (mirrored as greatest(n_lines, 1) in the oracle)
    folded["comment_ratio_q"] = (
        1_000_000 * folded["n_comment_lines"].astype("int64")
    ) // folded["n_lines"].astype("int64").clip(lower=1)
    folded["avg_lines_q"] = (
        1_000_000 * folded["n_lines"].astype("int64")
    ) // folded["n_files"].astype("int64")
    return (
        folded[cols]
        .sort_values(["repo", "lang"], ignore_index=True)
        .astype({c: "int64" for c in cols[2:]})
    )
