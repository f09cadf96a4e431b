"""Rule-matching mask conformance + rewrite semantics.

Golden mask cases mirror the reference's 5-case matrix
(src/rules.rs:353-390); the end-to-end conformance test runs the mirrored
tests/data fixture graph (tests/data/{graph.nt,rules.yaml}) and asserts the
documented expected transformations — including the fixture quirk where the
accounts' type URI does NOT match the rules' expanded CURIEs (FIXTURES.md §3).
"""

from pathlib import Path

import pyarrow as pa
import pytest

from tripsu_ray.functions.crypto import Sha256Salted
from tripsu_ray.functions.engine import CompiledMatcher, pseudonymize_batch
from tripsu_ray.functions.rdf import parse_ntriples_lines, serialize_ntriples
from tripsu_ray.functions.rules import Rules
from tripsu_ray.schema import KIND_BLANK, KIND_IRI, KIND_LITERAL

DATA = Path(__file__).parent / "data"

GOLDEN_RULES = Rules.from_dict(
    {
        "nodes": {"of_type": ["<urn:Person>"]},
        "objects": {
            "on_predicate": ["<urn:hasLastName>"],
            "on_type_predicate": {"<urn:Person>": ["<urn:hasAge>"]},
        },
    }
)
GOLDEN_INDEX = {
    "<urn:Alice>": ("<urn:Person>",),
    "<urn:Bob>": ("<urn:Person>",),
    "<urn:ACME>": ("<urn:Organization>",),
}

GOLDEN_CASES = [
    ('<urn:Alice> <urn:hasAge> "42" .', True, True),
    ('<urn:Alice> <urn:hasLastName> "Foobar" .', True, True),
    ("<urn:Alice> <urn:hasFriend> <urn:Bob> .", True, True),
    ("<urn:ACME> <urn:hasEmployee> <urn:Bob> .", False, True),
    ('<urn:ACME> <urn:hasAge> "200" .', False, False),
]


@pytest.mark.parametrize("line,want_s,want_o", GOLDEN_CASES)
def test_golden_masks(line, want_s, want_o):
    t = parse_ntriples_lines(pa.table({"text": [line]}))
    m = CompiledMatcher(GOLDEN_RULES, GOLDEN_INDEX)
    mask_s, mask_o = m.masks(t)
    assert (bool(mask_s[0]), bool(mask_o[0])) == (want_s, want_o)


def test_golden_masks_inverted():
    inv_rules = Rules.from_dict(
        {
            "invert": True,
            "nodes": {"of_type": ["<urn:Person>"]},
            "objects": {
                "on_predicate": ["<urn:hasLastName>"],
                "on_type_predicate": {"<urn:Person>": ["<urn:hasAge>"]},
            },
        }
    )
    t = parse_ntriples_lines(pa.table({"text": [c[0] for c in GOLDEN_CASES]}))
    m = CompiledMatcher(inv_rules, GOLDEN_INDEX)
    mask_s, mask_o = m.masks(t)
    for i, (_, want_s, want_o) in enumerate(GOLDEN_CASES):
        assert bool(mask_s[i]) == (not want_s)
        assert bool(mask_o[i]) == (not want_o)


def _load_fixture_graph():
    lines = (DATA / "graph.nt").read_text().strip().splitlines()
    return parse_ntriples_lines(pa.table({"text": lines})), lines


def _build_index(triples: pa.Table) -> dict:
    """Driver-side index build for the tiny fixture (the Ray path is tested elsewhere)."""
    from tripsu_ray.functions.rdf import format_object, format_subject

    import pyarrow.compute as pc

    rdf_type = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    typed = triples.filter(pc.equal(triples["predicate"], rdf_type))
    subj = format_subject(typed["subject"].combine_chunks(), typed["subject_kind"].combine_chunks())
    obj = format_object(
        typed["object_value"].combine_chunks(),
        typed["object_kind"].combine_chunks(),
        typed["object_lang"].combine_chunks(),
        typed["object_datatype"].combine_chunks(),
    )
    index: dict[str, tuple[str, ...]] = {}
    for s, t in zip(subj.to_pylist(), obj.to_pylist()):
        cur = index.get(s, ())
        if t not in cur:
            index[s] = cur + (t,)
    return index


def test_fixture_index_contents():
    triples, _ = _load_fixture_graph()
    index = _build_index(triples)
    assert len(index) == 5
    assert index["<http://example.org/Alice>"] == ("<http://xmlns.com/foaf/0.1/Person>",)
    assert index["<http://example.org/Alice-Bank-Account>"] == (
        "<http://xmlns.com/foaf/OnlineAccount>",
    )
    assert index["<http://example.org/Bank>"] == ("<http://xmlns.com/foaf/0.1/Organization>",)


def test_fixture_graph_conformance():
    """FIXTURE QUIRK (verified against reference expansion semantics,
    src/uris.rs:135-169): the shipped rules.yaml expands ":Person" →
    <http://example.org/Person> and "foaf:OnlineAccount" →
    <http://xmlns.com/foaf/0.1/OnlineAccount>, but the data types Alice/Bob as
    <http://xmlns.com/foaf/0.1/Person> and the accounts as
    <http://xmlns.com/foaf/OnlineAccount> (no 0.1). Under exact-match
    semantics (src/rules.rs:220-226) the of_type rule therefore matches
    NOTHING in this graph; only on_predicate (accessCode) and
    on_type_predicate (foaf:Person × schema:name) fire."""
    triples, lines = _load_fixture_graph()
    rules = Rules.from_yaml(str(DATA / "rules.yaml"))
    index = _build_index(triples)
    pseudo = Sha256Salted("conformance-fixed-salt")
    out = pseudonymize_batch(triples, CompiledMatcher(rules, index), pseudo)
    got = serialize_ntriples(out)["line"].to_pylist()
    assert len(got) == len(lines)

    joined = "\n".join(got)
    # of_type matches nothing (quirk): all URIs untouched
    assert "<http://example.org/Alice>" in joined
    assert "<http://example.org/Bob>" in joined
    assert "<http://example.org/Alice-Bank-Account>" in joined
    # accessCode literals rewritten (on_predicate)
    assert '"secret-123"' not in joined and '"secret-456"' not in joined
    assert f'"{pseudo.pseudo_bytes(b"secret-123")}"' in joined
    # Person names rewritten (on_type_predicate foaf:Person + schema:name)
    assert '"Alice"' not in joined and '"Bob"' not in joined
    # account names untouched (account type lacks the 0.1)
    assert '"my_account32"' in joined and '"my_account12"' in joined
    # Organization untouched; predicates never rewritten
    assert "<http://example.org/Bank>" in joined and '"Bank"' in joined
    assert "<http://xmlns.com/foaf/0.1/holdsAccount>" in joined


def test_of_type_rewrites_subject_and_object_positions():
    """Tutorial case 1 (docs/tutorial.md:62-84): of_type on the real data
    type rewrites the node URI everywhere it appears, prefix preserved,
    same pseudonym in subject and object position."""
    triples, _ = _load_fixture_graph()
    rules = Rules.from_dict(
        {"nodes": {"of_type": ["<http://xmlns.com/foaf/0.1/Person>"]}}
    )
    index = _build_index(triples)
    pseudo = Sha256Salted("fixed")
    out = pseudonymize_batch(triples, CompiledMatcher(rules, index), pseudo)
    got = serialize_ntriples(out)["line"].to_pylist()
    joined = "\n".join(got)
    alice_hash = pseudo.pseudo_bytes(b"http://example.org/Alice")
    assert "<http://example.org/Alice>" not in joined
    assert f"<http://example.org/{alice_hash}>" in joined
    # Alice appears 3× as subject + 1× as object (Bob knows Alice)
    assert sum(alice_hash in l for l in got) == 4
    # literals untouched by a pure node rule
    assert '"Alice"' in joined and '"secret-123"' in joined


def test_unmatched_rows_byte_identical():
    triples, lines = _load_fixture_graph()
    empty_rules = Rules.from_dict({})
    out = pseudonymize_batch(
        triples, CompiledMatcher(empty_rules, {}), Sha256Salted("x")
    )
    assert serialize_ntriples(out)["line"].to_pylist() == [l for l in lines if l.strip()]


def test_invert_blank_nodes_survive():
    t = parse_ntriples_lines(
        pa.table({"text": ['_:b0 <http://p> _:b1 .', '_:b0 <http://p> "lit" .']})
    )
    rules = Rules.from_dict({"invert": True})  # everything masked
    out = pseudonymize_batch(t, CompiledMatcher(rules, {}), Sha256Salted("x"))
    # blank nodes identity even under invert (src/crypto.rs:71-73)
    assert out["subject"].to_pylist() == ["b0", "b0"]
    assert out["object_value"][0].as_py() == "b1"
    # literal IS rewritten under invert
    assert out["object_value"][1].as_py() != "lit"


def test_blank_subject_on_type_predicate():
    # blank-node subjects ARE looked up for on_type_predicate (src/rules.rs:203-208)
    t = parse_ntriples_lines(pa.table({"text": ['_:b0 <urn:hasAge> "9" .']}))
    rules = Rules.from_dict(
        {"objects": {"on_type_predicate": {"<urn:Person>": ["<urn:hasAge>"]}}}
    )
    index = {"_:b0": ("<urn:Person>",)}
    mask_s, mask_o = CompiledMatcher(rules, index).masks(t)
    assert not mask_s[0] and mask_o[0]
    # but never by of_type (src/rules.rs:169)
    rules2 = Rules.from_dict({"nodes": {"of_type": ["<urn:Person>"]}})
    mask_s2, _ = CompiledMatcher(rules2, index).masks(t)
    assert not mask_s2[0]


# --- reference rule-unit matrices (src/rules.rs:284-351, rstest port) ------

NODE = "urn:Alice"  # bare IRI; term key "<urn:Alice>"
PRED = "urn:hasName"


def _mask_for(line_rules: dict, index: dict, subject=NODE, predicate=PRED):
    t = parse_ntriples_lines(
        pa.table({"text": [f'<{subject}> <{predicate}> "v" .']})
    )
    return CompiledMatcher(Rules.from_dict(line_rules), index).masks(t)


@pytest.mark.parametrize(
    "index,rule_type,expected",
    [
        ({f"<{NODE}>": ("<urn:Person>",)}, "<urn:Person>", True),  # in rules & index
        ({f"<{NODE}>": ("<urn:Person>",)}, "<urn:Bank>", False),  # index yes, rules no
        ({"<urn:BankName>": ("<urn:Bank>",)}, "<urn:Bank>", False),  # not in index
    ],
)
def test_type_rule_matrix(index, rule_type, expected):
    ms, _ = _mask_for({"nodes": {"of_type": [rule_type]}}, index)
    assert bool(ms[0]) == expected


@pytest.mark.parametrize(
    "rule_pred,expected",
    [(f"<{PRED}>", True), ("<urn:hasAge>", False)],
)
def test_predicate_rule_matrix(rule_pred, expected):
    _, mo = _mask_for({"objects": {"on_predicate": [rule_pred]}}, {})
    assert bool(mo[0]) == expected


@pytest.mark.parametrize(
    "rule_type,rule_pred,index,expected",
    [
        ("<urn:Person>", f"<{PRED}>", {f"<{NODE}>": ("<urn:Person>",)}, True),
        ("<urn:Person>", "<urn:hasAge>", {f"<{NODE}>": ("<urn:Person>",)}, False),
        ("<urn:Bob>", "<urn:hasAge>", {f"<{NODE}>": ("<urn:Person>",)}, False),
        ("<urn:Bob>", "<urn:hasAge>", {"<urn:Bob>": ("<urn:Person>",)}, False),
    ],
)
def test_type_predicate_rule_matrix(rule_type, rule_pred, index, expected):
    _, mo = _mask_for(
        {"objects": {"on_type_predicate": {rule_type: [rule_pred]}}}, index
    )
    assert bool(mo[0]) == expected
