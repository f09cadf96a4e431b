"""tripsu JSON type-index interop (S6/S7): SipHash parity, JSON round-trip,
and bit-for-bit mask equality between the hash-probing matcher (reference
JSON index) and the native Parquet-path CompiledMatcher.

``tests/data/type_index.json`` is the reference repo's own fixture
(tests/data/type_index.json), written by the Rust binary's serde — its map
keys are golden DefaultHasher (SipHash-1-3) values for the graph.nt
subjects.
"""

import json

import numpy as np
import pyarrow as pa

from tripsu_ray.functions.engine import CompiledMatcher
from tripsu_ray.functions.rdf import parse_ntriples_lines
from tripsu_ray.functions.rules import Rules
from tripsu_ray.functions.siphash import rust_default_hash_str, siphash13
from tripsu_ray.functions.tripsu_index import HashIndexMatcher, TripsuIndex

GRAPH = "tests/data/graph.nt"
FIXTURE = "tests/data/type_index.json"
RULES = "tests/data/rules.yaml"


def _parse_graph() -> pa.Table:
    lines = open(GRAPH).read().splitlines()
    return parse_ntriples_lines(pa.table({"line": lines}))


def _pairs_df(triples: pa.Table):
    """(subject, type) term-key pairs, input order (pure, no Ray)."""
    import pandas as pd

    from tripsu_ray.functions.rdf import format_object, format_subject
    from tripsu_ray.schema import RDF_TYPE

    import pyarrow.compute as pc

    typed = triples.filter(pc.equal(triples["predicate"], RDF_TYPE))
    subj = format_subject(typed["subject"].combine_chunks(), typed["subject_kind"].combine_chunks())
    typ = format_object(
        typed["object_value"].combine_chunks(),
        typed["object_kind"].combine_chunks(),
        typed["object_lang"].combine_chunks(),
        typed["object_datatype"].combine_chunks(),
    )
    return pd.DataFrame({"subject": subj.to_pylist(), "type": typ.to_pylist()})


class TestSipHash:
    def test_reference_fixture_hashes_golden(self):
        """Every subject of graph.nt hashes to a key present in the
        reference-written JSON — DefaultHasher (SipHash-1-3, zero keys,
        str 0xff terminator) reproduced byte-for-byte."""
        fixture_keys = set(map(int, json.load(open(FIXTURE))["map"]))
        subjects = [
            "<http://example.org/Alice>",
            "<http://example.org/Alice-Bank-Account>",
            "<http://example.org/Bob>",
            "<http://example.org/Bob-Bank-Account>",
            "<http://example.org/Bank>",
        ]
        hashes = {rust_default_hash_str(s) for s in subjects}
        assert hashes == fixture_keys
        assert rust_default_hash_str("<http://example.org/Alice>") == 130358124972442050

    def test_length_boundaries(self):
        # exercise 0..17-byte inputs (tail handling + multi-block)
        seen = {siphash13(bytes(range(n))) for n in range(18)}
        assert len(seen) == 18  # distinct and deterministic

    def test_deterministic(self):
        assert siphash13(b"abc") == siphash13(b"abc")
        assert siphash13(b"abc") != siphash13(b"abd")


class TestTripsuIndexJson:
    def test_read_reference_fixture(self):
        idx = TripsuIndex.from_json(FIXTURE)
        assert idx.get("<http://example.org/Alice>") == ["<http://xmlns.com/foaf/0.1/Person>"]
        assert idx.get("<http://example.org/Alice-Bank-Account>") == [
            "<http://xmlns.com/foaf/OnlineAccount>"
        ]
        assert idx.get("<http://example.org/nobody>") is None

    def test_roundtrip_matches_reference_semantics(self):
        """Index built from graph.nt serializes to JSON semantically equal
        to the reference-written fixture (same hash keys, same resolved
        type lists; types-table order is insertion-dependent)."""
        ours = TripsuIndex.from_pairs(_pairs_df(_parse_graph()))
        ref = TripsuIndex.from_json(FIXTURE)
        assert set(ours.map) == set(ref.map)
        for h in ref.map:
            assert [ours.types[i] for i in ours.map[h]] == [ref.types[i] for i in ref.map[h]]
        # wire round-trip
        again = TripsuIndex.from_json(ours.to_json())
        assert again.map == ours.map and again.types == ours.types

    def test_insert_dedups_types_and_entries(self):
        idx = TripsuIndex([], {})
        idx.insert("<urn:a>", "<urn:T>")
        idx.insert("<urn:a>", "<urn:T>")
        idx.insert("<urn:b>", "<urn:T>")
        assert idx.types == ["<urn:T>"]
        assert idx.get("<urn:a>") == ["<urn:T>"]


class TestHashIndexMatcherParity:
    def _masks_both(self, rules_cfg):
        rules = (
            Rules.from_yaml(open(RULES).read())
            if rules_cfg == "fixture"
            else Rules.from_dict(rules_cfg)
        )
        triples = _parse_graph()
        pairs = _pairs_df(triples)
        compiled = CompiledMatcher(rules, pairs)
        hashed = HashIndexMatcher(rules, TripsuIndex.from_json(FIXTURE))
        return compiled.masks(triples), hashed.masks(triples)

    def test_fixture_rules_masks_bit_equal(self):
        (cs, co), (hs, ho) = self._masks_both("fixture")
        assert np.array_equal(cs, hs) and np.array_equal(co, ho)

    def test_type_rule_masks_bit_equal(self):
        cfg = {"nodes": {"of_type": ["<http://xmlns.com/foaf/0.1/Person>"]}}
        (cs, co), (hs, ho) = self._masks_both(cfg)
        assert cs.any()  # rule actually fires on this graph
        assert np.array_equal(cs, hs) and np.array_equal(co, ho)

    def test_otp_and_invert_masks_bit_equal(self):
        cfg = {
            "invert": True,
            "objects": {
                "on_predicate": ["<http://schema.org/accessCode>"],
                "on_type_predicate": {
                    "<http://xmlns.com/foaf/0.1/Person>": ["<http://schema.org/name>"]
                },
            },
        }
        (cs, co), (hs, ho) = self._masks_both(cfg)
        assert np.array_equal(cs, hs) and np.array_equal(co, ho)
