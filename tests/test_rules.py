"""Rules loading / CURIE expansion (reference src/rules.rs:391-466, src/uris.rs)."""

import pytest

from tripsu_ray.functions.rules import PrefixMap, RuleConfigError, Rules

FIXTURE_YAML = """
invert: false
prefixes:
  "": "<http://example.org/>"
  foaf: "<http://xmlns.com/foaf/0.1/>"
nodes:
  of_type:
    - ":Person"
    - "foaf:OnlineAccount"
objects:
  on_predicate:
    - "<http://schema.org/accessCode>"
  on_type_predicate:
    ":OnlineAccount":
      - "<http://schema.org/name>"
    "foaf:Person":
      - "<http://schema.org/name>"
"""


def test_fixture_rules_expand():
    r = Rules.from_yaml(FIXTURE_YAML)
    assert r.invert is False
    assert r.node_of_type == frozenset(
        {"<http://example.org/Person>", "<http://xmlns.com/foaf/0.1/OnlineAccount>"}
    )
    assert r.obj_on_predicate == frozenset({"<http://schema.org/accessCode>"})
    assert r.obj_on_type_predicate == {
        "<http://example.org/OnlineAccount>": frozenset({"<http://schema.org/name>"}),
        "<http://xmlns.com/foaf/0.1/Person>": frozenset({"<http://schema.org/name>"}),
    }


def test_default_prefix_expansion():
    pm = PrefixMap.from_config({"": "<http://example.org/>"})
    assert pm.expand(":Person") == "<http://example.org/Person>"


def test_full_uri_passthrough():
    pm = PrefixMap.from_config({})
    assert pm.expand("<http://a.b/c>") == "<http://a.b/c>"


def test_unknown_prefix_errors():
    pm = PrefixMap.from_config({"foaf": "<http://xmlns.com/foaf/0.1/>"})
    with pytest.raises(RuleConfigError):
        pm.expand("unknown:thing")


def test_invalid_uri_errors():
    with pytest.raises(RuleConfigError):
        Rules.from_dict({"nodes": {"of_type": ["not a uri at all"]}})


def test_bad_iri_in_brackets_errors():
    with pytest.raises(RuleConfigError):
        Rules.from_dict({"nodes": {"of_type": ["<has space>"]}})


def test_curie_without_prefixes_errors():
    with pytest.raises(RuleConfigError):
        Rules.from_dict({"nodes": {"of_type": ["foaf:Person"]}})


def test_empty_and_defaults():
    r = Rules.from_dict({})
    assert r.is_empty() and r.invert is False
    r2 = Rules.from_dict({"invert": True})
    assert r2.invert is True
