"""Driver-contract invariants of __ray_entry__ (no Ray session needed —
queries()/oracle_sql() build registries without executing pipelines)."""

import sys

sys.path.insert(0, "/root/repo")

import __ray_entry__ as entry


def test_gate_interleave_is_pure_reordering():
    reg = entry.queries()
    # rebuild the raw registry by applying the interleave to itself: a
    # second application must be a no-op permutation of the same keys
    again = entry._gate_interleave(reg)
    assert set(again) == set(reg)
    assert len(again) == len(reg)


def test_flagship_block_pinned_first():
    ks = list(entry.queries())
    assert tuple(ks[: len(entry._FLAGSHIP)]) == entry._FLAGSHIP


def test_prefixes_sample_every_family():
    ks = list(entry.queries())
    families = {k.split("_", 1)[0] for k in ks}
    # any 50-entry prefix (round 2's observed gate budget) must contain at
    # least one query from every family
    prefix_fams = {k.split("_", 1)[0] for k in ks[:50]}
    assert prefix_fams == families, families - prefix_fams


def test_costly_entries_exist_and_sink():
    ks = list(entry.queries())
    reg = set(ks)
    assert entry._COSTLY <= reg, entry._COSTLY - reg
    # within each family AND certification tier the costly members must
    # come after every cheap one (the round-5 rotation orders by
    # (certified, costly) per family, so cost sinks within each tier)
    pos = {k: i for i, k in enumerate(ks)}
    for k in entry._COSTLY:
        fam = k.split("_", 1)[0]
        cheap_same = [
            m for m in ks
            if m.split("_", 1)[0] == fam
            and m not in entry._COSTLY
            and m not in entry._FLAGSHIP
            and (m in entry._DRIVER_CERTIFIED) == (k in entry._DRIVER_CERTIFIED)
        ]
        assert all(pos[m] < pos[k] for m in cheap_same), k


def test_gate_prefix_certifies_new_surface():
    """The 50-query gate prefix must majority-sample queries without a
    round-3/4 driver row (VERDICT r4 item 10) while still covering every
    family."""
    ks = list(entry.queries())
    pref = ks[:50]
    new = [k for k in pref if k not in entry._DRIVER_CERTIFIED]
    assert len(new) >= 25, len(new)
    fams = {k.split("_", 1)[0] for k in ks}
    assert {k.split("_", 1)[0] for k in pref} == fams


def test_every_oracle_has_a_query():
    q = set(entry.queries())
    o = set(entry.oracle_sql())
    assert o <= q, o - q
