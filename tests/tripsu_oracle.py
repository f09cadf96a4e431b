"""An INDEPENDENT per-triple Python oracle of the reference's semantics.

Deliberately written as the reference writes it — one triple at a time,
dict probes, string matching on bracketed serialized terms (mirrors
src/rules.rs:154-252 + src/crypto.rs:19-73 control flow) — so that
agreement with the vectorized Arrow engine is meaningful evidence, not two
copies of the same code. Used by tests to compute precision/recall of the
engine's output triples against oracle output triples (BASELINE.json's
P/R ≥ 0.95 gate; we assert equality, P = R = 1.0).
"""

from __future__ import annotations

from tripsu_ray.schema import KIND_BLANK, KIND_IRI, KIND_LITERAL


def _term_key(value: str, kind: int) -> str:
    return f"<{value}>" if kind == KIND_IRI else f"_:{value}"


def match_rules(row: dict, rules, index: dict) -> tuple[bool, bool]:
    """(mask_subject, mask_object) for one triple — reference control flow."""
    s_key = _term_key(row["subject"], row["subject_kind"])
    p_key = f"<{row['predicate']}>"

    def match_type(key: str) -> bool:
        types = index.get(key, ())
        return any(t in rules.node_of_type for t in types)

    # match_node_rules (src/rules.rs:166-188)
    ms = row["subject_kind"] == KIND_IRI and match_type(s_key)
    mo = row["object_kind"] == KIND_IRI and match_type(f"<{row['object_value']}>")

    # match_object_rules (src/rules.rs:191-217)
    if p_key in rules.obj_on_predicate:
        mo = True
    else:
        for t in index.get(s_key, ()):  # named OR blank subjects probed
            if p_key in rules.obj_on_type_predicate.get(t, frozenset()):
                mo = True
                break

    if rules.invert:
        ms, mo = not ms, not mo
    return ms, mo


def pseudo_iri(pseudo, iri: str) -> str:
    cut = max(iri.rfind("#"), iri.rfind("/"))
    return iri[: cut + 1] + pseudo.pseudo_bytes(iri.encode("utf-8"))


def process_triple(row: dict, rules, index: dict, pseudo) -> dict:
    """One-triple pseudonymization (reference process_triple / pseudo_triple)."""
    ms, mo = match_rules(row, rules, index)
    out = dict(row)
    if ms and row["subject_kind"] == KIND_IRI:
        out["subject"] = pseudo_iri(pseudo, row["subject"])
    if mo:
        if row["object_kind"] == KIND_IRI:
            out["object_value"] = pseudo_iri(pseudo, row["object_value"])
        elif row["object_kind"] == KIND_LITERAL:
            out["object_value"] = pseudo.pseudo_bytes(row["object_value"].encode("utf-8"))
            out["object_lang"] = None
            out["object_datatype"] = None
        # blank objects: identity
    return out


def build_index(rows: list[dict]) -> dict:
    """Reference pass-1: subject → ordered distinct types (src/index.rs:95-112)."""
    from tripsu_ray.schema import RDF_TYPE

    index: dict[str, tuple[str, ...]] = {}
    for r in rows:
        if r["predicate"] != RDF_TYPE:
            continue
        s = _term_key(r["subject"], r["subject_kind"])
        if r["object_kind"] == KIND_IRI:
            t = f"<{r['object_value']}>"
        elif r["object_kind"] == KIND_BLANK:
            t = f"_:{r['object_value']}"
        else:
            t = f'"{r["object_value"]}"'
        cur = index.get(s, ())
        if t not in cur:
            index[s] = cur + (t,)
    return index
