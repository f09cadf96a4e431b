"""Property tests (hypothesis): serialization round-trips, mask algebra,
pseudonym consistency — the §2.8 conformance contract under random input."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from tripsu_ray.functions.crypto import Sha256Salted
from tripsu_ray.functions.engine import CompiledMatcher, pseudonymize_batch
from tripsu_ray.functions.rdf import (
    parse_ntriples_lines,
    serialize_ntriples,
    triples_table,
)
from tripsu_ray.functions.rules import Rules
from tripsu_ray.schema import KIND_BLANK, KIND_IRI, KIND_LITERAL

# -- strategies -------------------------------------------------------------

iri = st.from_regex(r"[a-z]{1,8}://[a-z0-9._\-]{1,12}(/[a-z0-9._\-]{0,10}){0,3}(#[a-z0-9]{0,8})?", fullmatch=True)
blank_id = st.from_regex(r"[A-Za-z0-9]{1,10}", fullmatch=True)
literal = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="\x00"),
    max_size=40,
)
lang = st.from_regex(r"[a-z]{2}(-[A-Za-z0-9]{1,6})?", fullmatch=True)

subject = st.one_of(
    st.tuples(iri, st.just(KIND_IRI)), st.tuples(blank_id, st.just(KIND_BLANK))
)
obj = st.one_of(
    st.tuples(iri, st.just(KIND_IRI), st.none(), st.none()),
    st.tuples(blank_id, st.just(KIND_BLANK), st.none(), st.none()),
    st.tuples(literal, st.just(KIND_LITERAL), st.none(), st.none()),
    st.tuples(literal, st.just(KIND_LITERAL), lang, st.none()),
    st.tuples(literal, st.just(KIND_LITERAL), st.none(), iri),
)
triple = st.tuples(subject, iri, obj)


def to_table(triples):
    rows = [
        (s, sk, p, ov, ok, ol, od)
        for (s, sk), p, (ov, ok, ol, od) in triples
    ]
    return triples_table(rows)


# -- properties -------------------------------------------------------------


@settings(max_examples=60, deadline=None)
@given(st.lists(triple, min_size=1, max_size=20))
def test_serialize_parse_roundtrip(triples):
    t = to_table(triples)
    lines = serialize_ntriples(t)
    back = parse_ntriples_lines(pa.table({"text": lines["line"]}))
    lines2 = serialize_ntriples(back)
    assert lines["line"].to_pylist() == lines2["line"].to_pylist()
    # and the parsed columns equal the originals
    assert back.to_pydict() == t.to_pydict()


@settings(max_examples=30, deadline=None)
@given(st.lists(triple, min_size=1, max_size=20))
def test_empty_rules_identity(triples):
    t = to_table(triples)
    out = pseudonymize_batch(t, CompiledMatcher(Rules.from_dict({}), {}), Sha256Salted("k"))
    assert out.to_pydict() == t.to_pydict()


@settings(max_examples=30, deadline=None)
@given(st.lists(triple, min_size=1, max_size=20))
def test_invert_twice_is_identity_on_masks(triples):
    t = to_table(triples)
    rules_cfg = {
        "nodes": {"of_type": ["<urn:ns:T>"]},
        "objects": {"on_predicate": ["<urn:ns:p>"]},
    }
    plain = CompiledMatcher(Rules.from_dict(rules_cfg), {})
    inv = CompiledMatcher(Rules.from_dict({**rules_cfg, "invert": True}), {})
    ms_p, mo_p = plain.masks(t)
    ms_i, mo_i = inv.masks(t)
    assert (ms_p == ~ms_i).all() and (mo_p == ~mo_i).all()


@settings(max_examples=30, deadline=None)
@given(st.lists(triple, min_size=2, max_size=20), st.integers(1, 10))
def test_same_entity_same_pseudonym_across_batches(triples, split):
    """Splitting a batch arbitrarily (≈ distributing over partitions) never
    changes any rewritten value — pseudonyms are pure functions of (key,
    bytes)."""
    t = to_table(triples)
    rules = Rules.from_dict({"invert": True})  # rewrite everything rewritable
    m = CompiledMatcher(rules, {})
    p = Sha256Salted("fixed")
    whole = pseudonymize_batch(t, m, p)
    k = min(split, t.num_rows - 1)
    parts = [pseudonymize_batch(t.slice(0, k), m, p), pseudonymize_batch(t.slice(k), m, p)]
    joined = pa.concat_tables(parts)
    assert whole.to_pydict() == joined.to_pydict()


@settings(max_examples=30, deadline=None)
@given(literal)
def test_literal_escape_roundtrip(value):
    t = triples_table([("s", KIND_IRI, "p", value, KIND_LITERAL, None, None)])
    lines = serialize_ntriples(t)
    back = parse_ntriples_lines(pa.table({"text": lines["line"]}))
    assert back["object_value"][0].as_py() == value
