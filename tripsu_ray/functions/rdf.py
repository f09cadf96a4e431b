"""Vectorized RDF term formatting and N-Triples parse/serialize.

Semantics mirror the reference's hand-rolled serializers
(``/root/reference/src/rdf_types.rs:71-128`` — ``<iri>``, ``_:id``,
``"literal"``, ``"v"@lang``, ``"v"^^<dt>``) and its N-Triples escaping of
``\\n \\r " \\\\`` (``src/rdf_types.rs:242-255``), re-expressed as
pyarrow.compute / numpy kernels over whole columns — never per-row Python in
the hot path (literal escape/unescape runs only over the literal subset).

All functions take/return Arrow arrays or pyarrow.Table so map_batches
stages stay zero-copy.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..schema import KIND_BLANK, KIND_IRI, KIND_LITERAL, TRIPLES

# ---------------------------------------------------------------------------
# escaping (reference fmt_quoted_str, src/rdf_types.rs:242-255)
# ---------------------------------------------------------------------------


def escape_literal(arr: pa.Array) -> pa.Array:
    """N-Triples-escape literal lexical forms: ``\\ " \\n \\r`` (backslash first)."""
    out = pc.replace_substring(arr, pattern="\\", replacement="\\\\")
    out = pc.replace_substring(out, pattern='"', replacement='\\"')
    out = pc.replace_substring(out, pattern="\n", replacement="\\n")
    out = pc.replace_substring(out, pattern="\r", replacement="\\r")
    return out


_UNESCAPE_RE = re.compile(r"\\(u[0-9a-fA-F]{4}|U[0-9a-fA-F]{8}|.)")
_UNESCAPE_MAP = {"n": "\n", "r": "\r", "t": "\t", "b": "\b", "f": "\f", '"': '"', "'": "'", "\\": "\\"}


def _unescape_one(s: str) -> str:
    # ECHAR plus UCHAR (\uXXXX / \UXXXXXXXX) per the N-Triples grammar —
    # rio's parser decodes these; dropping them would corrupt literals
    def sub(m: "re.Match") -> str:
        g = m.group(1)
        if g[0] in "uU" and len(g) > 1:
            return chr(int(g[1:], 16))
        return _UNESCAPE_MAP.get(g, g)

    return _UNESCAPE_RE.sub(sub, s)


def unescape_literals(values: np.ndarray) -> np.ndarray:
    """Unescape parsed literal lexical forms (single pass, handles ``\\\\n``)."""
    # only called on the literal subset of a batch; a compiled-regex map is
    # the correct single-pass unescape (chained replaces would corrupt "\\n")
    return np.array(
        [_unescape_one(s) if s is not None and "\\" in s else s for s in values],
        dtype=object,
    )


# ---------------------------------------------------------------------------
# term formatting (vectorized)
# ---------------------------------------------------------------------------


def _join(*parts) -> pa.Array:
    return pc.binary_join_element_wise(*parts, "")


def format_subject(value: pa.Array, kind: pa.Array) -> pa.Array:
    """Bare value + kind → serialized term key (``<iri>`` or ``_:id``)."""
    iri_form = _join("<", value, ">")
    blank_form = _join("_:", value)
    return pc.if_else(pc.equal(kind, KIND_IRI), iri_form, blank_form)


def format_predicate(value: pa.Array) -> pa.Array:
    return _join("<", value, ">")


def format_object(
    value: pa.Array,
    kind: pa.Array,
    lang: pa.Array,
    datatype: pa.Array,
) -> pa.Array:
    """Serialized object term: IRI / blank / (lang-tagged, typed, simple) literal."""
    iri_form = _join("<", value, ">")
    blank_form = _join("_:", value)
    esc = escape_literal(value)
    plain = _join('"', esc, '"')
    lang_filled = pc.fill_null(lang, "")
    dt_filled = pc.fill_null(datatype, "")
    lang_form = _join('"', esc, '"@', lang_filled)
    typed_form = _join('"', esc, '"^^<', dt_filled, ">")
    lit_form = pc.if_else(
        pc.is_valid(lang),
        lang_form,
        pc.if_else(pc.is_valid(datatype), typed_form, plain),
    )
    return pc.if_else(
        pc.equal(kind, KIND_IRI),
        iri_form,
        pc.if_else(pc.equal(kind, KIND_BLANK), blank_form, lit_form),
    )


def serialize_ntriples(batch: pa.Table) -> pa.Table:
    """Triple batch → one-column table ``line`` of N-Triples lines (no newline)."""
    subj = format_subject(batch["subject"].combine_chunks(), batch["subject_kind"].combine_chunks())
    pred = format_predicate(batch["predicate"].combine_chunks())
    obj = format_object(
        batch["object_value"].combine_chunks(),
        batch["object_kind"].combine_chunks(),
        batch["object_lang"].combine_chunks(),
        batch["object_datatype"].combine_chunks(),
    )
    line = pc.binary_join_element_wise(subj, pred, obj, ".", " ")
    return pa.table({"line": line})


# ---------------------------------------------------------------------------
# N-Triples line parsing (vectorized via one regex extract)
# ---------------------------------------------------------------------------

# groups: 1 subj-iri | 2 subj-blank ; 3 pred ; 4 obj-iri | 5 obj-blank |
#         6 literal (escaped) with optional 7 lang / 8 datatype
_NT_LINE = (
    r"^\s*"
    r"(?:<([^>]*)>|_:(\S+))"  # subject
    r"\s+<([^>]*)>\s+"  # predicate
    r'(?:<([^>]*)>|_:(\S+)|"((?:[^"\\]|\\.)*)"(?:@([A-Za-z][A-Za-z0-9\-]*)|\^\^<([^>]*)>)?)'
    r"\s*\.\s*$"
)
_NT_LINE_RE = re.compile(_NT_LINE)


def _malformed_error(fmt: str, line: str) -> ValueError:
    """Error for an unparseable line, with an RDF-star-specific message.

    The reference explicitly panics on quoted triples ("RDF-star is not
    supported", src/rules.rs:170,209; src/rdf_types.rs:146); mirror that
    specificity when the offending term is a ``<<...>>`` quoted triple
    instead of reporting it as generically malformed.
    """
    stripped = line.lstrip()
    if stripped.startswith("<<") or " <<" in line:
        return ValueError(
            f"RDF-star quoted triples are not supported ({fmt} line: {line!r})"
        )
    return ValueError(f"malformed {fmt} line: {line!r}")


def parse_ntriples_lines(batch: pa.Table, *, on_error: str = "raise", counter=None) -> pa.Table:
    """Parse a batch of N-Triples lines (column ``text`` or ``line``) → TRIPLES.

    Reference parses with rio's streaming NTriplesParser and panics on
    malformed lines (src/pseudo.rs:73-75); our explicit policy is
    ``on_error="raise"`` (default) or ``"skip"``. Skipped lines are COUNTED:
    pass a ``state.metrics.JobCounters`` actor handle as ``counter`` and the
    per-batch malformed total increments ``"malformed_lines"`` (one
    fire-and-forget actor call per batch with drops, never per row).

    Uses pandas ``str.extract`` (a single vectorized regex pass) rather than a
    Python loop; literal unescaping runs only on the literal subset.
    """
    import pandas as pd

    col = "text" if "text" in batch.column_names else "line"
    lines = batch[col].to_pandas()
    # drop comment / empty lines (N-Triples allows them)
    mask = ~(lines.str.strip().eq("") | lines.str.strip().str.startswith("#"))
    lines = lines[mask]
    ext = lines.str.extract(_NT_LINE, expand=True)
    bad = ext[0].isna() & ext[1].isna()
    if bad.any():
        if on_error == "raise":
            raise _malformed_error("N-Triples", lines[bad].iloc[0])
        if counter is not None:
            counter.add.remote("malformed_lines", int(bad.sum()))
        ext = ext[~bad]
    subj_iri, subj_blank = ext[0], ext[1]
    subject = subj_iri.fillna(subj_blank)
    subject_kind = np.where(subj_iri.notna(), KIND_IRI, KIND_BLANK).astype(np.int8)
    predicate = ext[2]
    obj_iri, obj_blank, lit, lang, dtype = ext[3], ext[4], ext[5], ext[6], ext[7]
    object_kind = np.where(
        obj_iri.notna(), KIND_IRI, np.where(obj_blank.notna(), KIND_BLANK, KIND_LITERAL)
    ).astype(np.int8)
    lit_vals = lit.to_numpy(dtype=object)
    lit_mask = object_kind == KIND_LITERAL
    lit_vals[lit_mask] = unescape_literals(lit_vals[lit_mask])
    object_value = np.where(
        obj_iri.notna(), obj_iri, np.where(obj_blank.notna(), obj_blank, lit_vals)
    )
    object_lang = pd.Series(np.where(lit_mask, lang, None), dtype=object)
    object_datatype = pd.Series(np.where(lit_mask, dtype, None), dtype=object)
    return pa.table(
        {
            "subject": pa.array(subject, type=pa.string()),
            "subject_kind": pa.array(subject_kind),
            "predicate": pa.array(predicate, type=pa.string()),
            "object_value": pa.array(object_value, type=pa.string()),
            "object_kind": pa.array(object_kind),
            "object_lang": pa.array(object_lang, type=pa.string()),
            "object_datatype": pa.array(object_datatype, type=pa.string()),
        },
        schema=TRIPLES,
    )


def triples_table(rows: list[tuple]) -> pa.Table:
    """Build a TRIPLES table from python tuples (tests / tiny fixtures).

    Each row: (subject, subject_kind, predicate, object_value, object_kind,
    object_lang, object_datatype).
    """
    cols = list(zip(*rows)) if rows else [[] for _ in range(7)]
    arrays = [
        pa.array(cols[0], type=pa.string()),
        pa.array(cols[1], type=pa.int8()),
        pa.array(cols[2], type=pa.string()),
        pa.array(cols[3], type=pa.string()),
        pa.array(cols[4], type=pa.int8()),
        pa.array(cols[5], type=pa.string()),
        pa.array(cols[6], type=pa.string()),
    ]
    return pa.Table.from_arrays(arrays, schema=TRIPLES)


# ---------------------------------------------------------------------------
# N-Quads (the 4th, optional graph term — RDF datasets at scale ship as .nq)
# ---------------------------------------------------------------------------

# same term grammar; group 9 iri / 10 blank = the optional graph label
_NQ_LINE = (
    r"^\s*"
    r"(?:<([^>]*)>|_:(\S+))"  # subject
    r"\s+<([^>]*)>\s+"  # predicate
    r'(?:<([^>]*)>|_:(\S+)|"((?:[^"\\]|\\.)*)"(?:@([A-Za-z][A-Za-z0-9\-]*)|\^\^<([^>]*)>)?)'
    r"(?:\s+(?:<([^>]*)>|_:(\S+)))?"  # graph (optional → default graph)
    r"\s*\.\s*$"
)
_NQ_LINE_RE = re.compile(_NQ_LINE)


def parse_nquads_lines(batch: pa.Table, *, on_error: str = "raise", counter=None) -> pa.Table:
    """Parse N-Quads lines → TRIPLES columns + a nullable ``graph`` column
    (None = the default graph). Same vectorized single-regex pass and
    skip/raise policy as :func:`parse_ntriples_lines`; a graph-less line
    is a valid quad (N-Quads ⊇ N-Triples)."""
    import pandas as pd

    col = "text" if "text" in batch.column_names else "line"
    lines = batch[col].to_pandas()
    mask = ~(lines.str.strip().eq("") | lines.str.strip().str.startswith("#"))
    lines = lines[mask]
    ext = lines.str.extract(_NQ_LINE, expand=True)
    bad = ext[0].isna() & ext[1].isna()
    if bad.any():
        if on_error == "raise":
            raise _malformed_error("N-Quads", lines[bad].iloc[0])
        if counter is not None:
            counter.add.remote("malformed_lines", int(bad.sum()))
        ext = ext[~bad]
    subj_iri, subj_blank = ext[0], ext[1]
    subject = subj_iri.fillna(subj_blank)
    subject_kind = np.where(subj_iri.notna(), KIND_IRI, KIND_BLANK).astype(np.int8)
    predicate = ext[2]
    obj_iri, obj_blank, lit, lang, dtype = ext[3], ext[4], ext[5], ext[6], ext[7]
    # Blank-node graph labels keep their ``_:`` prefix in the stored column so
    # the term kind survives the round trip (an IRI label is stored bare);
    # serialize_nquads branches on the prefix to emit ``_:label`` vs ``<iri>``.
    graph = ext[8].where(ext[8].notna(), "_:" + ext[9])
    object_kind = np.where(
        obj_iri.notna(), KIND_IRI, np.where(obj_blank.notna(), KIND_BLANK, KIND_LITERAL)
    ).astype(np.int8)
    lit_vals = lit.to_numpy(dtype=object)
    lit_mask = object_kind == KIND_LITERAL
    lit_vals[lit_mask] = unescape_literals(lit_vals[lit_mask])
    object_value = np.where(
        obj_iri.notna(), obj_iri, np.where(obj_blank.notna(), obj_blank, lit_vals)
    )
    object_lang = pd.Series(np.where(lit_mask, lang, None), dtype=object)
    object_datatype = pd.Series(np.where(lit_mask, dtype, None), dtype=object)
    return pa.table(
        {
            "subject": pa.array(subject, type=pa.string()),
            "subject_kind": pa.array(subject_kind),
            "predicate": pa.array(predicate, type=pa.string()),
            "object_value": pa.array(object_value, type=pa.string()),
            "object_kind": pa.array(object_kind),
            "object_lang": pa.array(object_lang, type=pa.string()),
            "object_datatype": pa.array(object_datatype, type=pa.string()),
            "graph": pa.array(graph.astype(object).where(graph.notna(), None), type=pa.string()),
        }
    )


def serialize_nquads(batch: pa.Table) -> pa.Table:
    """(TRIPLES + nullable ``graph``) → one-column ``line`` of N-Quads
    lines; a None graph serializes as a plain triple (default graph)."""
    subj = format_subject(batch["subject"].combine_chunks(), batch["subject_kind"].combine_chunks())
    pred = format_predicate(batch["predicate"].combine_chunks())
    obj = format_object(
        batch["object_value"].combine_chunks(),
        batch["object_kind"].combine_chunks(),
        batch["object_lang"].combine_chunks(),
        batch["object_datatype"].combine_chunks(),
    )
    g = batch["graph"].combine_chunks() if "graph" in batch.column_names else None
    import pandas as pd

    base = pd.Series(
        pc.binary_join_element_wise(subj, pred, obj, " ").to_pandas(), dtype=object
    )
    if g is not None:
        gs = g.to_pandas()
        has = gs.notna()
        blank = has & gs.str.startswith("_:", na=False)
        iri = has & ~blank
        base[iri] = base[iri] + " <" + gs[iri] + ">"
        base[blank] = base[blank] + " " + gs[blank]
    line = (base + " .").to_numpy(dtype=object)
    return pa.table({"line": pa.array(line, pa.string())})
