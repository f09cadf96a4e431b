"""N-Triples parse/serialize round-trips (reference src/rdf_types.rs:71-128,242-255)."""

import pyarrow as pa
import pytest

from tripsu_ray.functions.rdf import (
    escape_literal,
    parse_ntriples_lines,
    serialize_ntriples,
    triples_table,
)
from tripsu_ray.schema import KIND_BLANK, KIND_IRI, KIND_LITERAL

LINES = [
    '<http://example.org/Alice> <http://schema.org/name> "Alice" .',
    "<http://example.org/Alice> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://xmlns.com/foaf/0.1/Person> .",
    '_:b0 <http://schema.org/name> "blank subject" .',
    "<http://example.org/x> <http://example.org/p> _:b1 .",
    '<http://example.org/x> <http://example.org/p> "hola"@es .',
    '<http://example.org/x> <http://example.org/p> "42"^^<http://www.w3.org/2001/XMLSchema#integer> .',
    '<http://example.org/x> <http://example.org/p> "line\\nbreak \\"quoted\\" back\\\\slash" .',
]


def lines_table(lines):
    return pa.table({"text": lines})


def test_parse_basic():
    t = parse_ntriples_lines(lines_table(LINES))
    assert t.num_rows == len(LINES)
    assert t["subject"][0].as_py() == "http://example.org/Alice"
    assert t["subject_kind"][0].as_py() == KIND_IRI
    assert t["object_value"][0].as_py() == "Alice"
    assert t["object_kind"][0].as_py() == KIND_LITERAL
    assert t["subject_kind"][2].as_py() == KIND_BLANK
    assert t["subject"][2].as_py() == "b0"
    assert t["object_kind"][3].as_py() == KIND_BLANK
    assert t["object_lang"][4].as_py() == "es"
    assert t["object_datatype"][5].as_py() == "http://www.w3.org/2001/XMLSchema#integer"
    # unescaping
    assert t["object_value"][6].as_py() == 'line\nbreak "quoted" back\\slash'


def test_roundtrip_byte_identical():
    t = parse_ntriples_lines(lines_table(LINES))
    out = serialize_ntriples(t)
    assert out["line"].to_pylist() == LINES


def test_comments_and_blank_lines_skipped():
    t = parse_ntriples_lines(lines_table(["# comment", "", LINES[0]]))
    assert t.num_rows == 1


def test_malformed_raises_and_skips():
    bad = lines_table(["not a triple"])
    with pytest.raises(ValueError):
        parse_ntriples_lines(bad)
    assert parse_ntriples_lines(bad, on_error="skip").num_rows == 0


def test_rdf_star_explicit_reject():
    # Reference panics specifically on quoted triples (src/rules.rs:170,209);
    # both the subject and object position should surface the RDF-star cause.
    subj = lines_table(['<< <s> <p> <o> >> <q> "v" .'])
    obj = lines_table(['<s> <q> << <s2> <p2> <o2> >> .'])
    for bad in (subj, obj):
        with pytest.raises(ValueError, match="RDF-star"):
            parse_ntriples_lines(bad)
        assert parse_ntriples_lines(bad, on_error="skip").num_rows == 0


def test_escape_literal():
    arr = pa.array(['a"b', "x\\y", "n\nl", "r\rl"])
    assert escape_literal(arr).to_pylist() == ['a\\"b', "x\\\\y", "n\\nl", "r\\rl"]


def test_serialize_lang_and_datatype():
    t = triples_table(
        [
            ("s", KIND_IRI, "p", "v", KIND_LITERAL, "en", None),
            ("s", KIND_IRI, "p", "v", KIND_LITERAL, None, "http://dt"),
            ("s", KIND_IRI, "p", "o", KIND_IRI, None, None),
            ("b", KIND_BLANK, "p", "c", KIND_BLANK, None, None),
        ]
    )
    lines = serialize_ntriples(t)["line"].to_pylist()
    assert lines == [
        '<s> <p> "v"@en .',
        '<s> <p> "v"^^<http://dt> .',
        "<s> <p> <o> .",
        "_:b <p> _:c .",
    ]
