"""Pseudonymization rules: YAML schema, CURIE expansion, validation.

Mirrors the reference's rules/uris modules
(``/root/reference/src/rules.rs:8-150``, ``src/uris.rs:42-194``):

- YAML schema: ``invert``, ``prefixes`` (prefix → bracketed URI; ``""`` is the
  default prefix), ``nodes.of_type``, ``objects.on_predicate``,
  ``objects.on_type_predicate`` (type → [predicates]).
- A rule URI is either a *full* URI in angle brackets (``<http://…>``) or a
  CURIE (``prefix:local``, classified by the same regex as src/uris.rs:45);
  anything else is invalid.
- After expansion all rule URIs are stored as **bracketed serialized strings**
  (``"<http://…>"``) because matching operates on serialized term keys
  (src/rules.rs:168-208, src/uris.rs:63-70).

Runs once on the driver; pure Python by design (config-time, not hot path).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import yaml

# same classification regex as reference src/uris.rs:45
_CURIE_RE = re.compile(r"^([A-Za-z_][A-Za-z0-9_.\-]*)?\:([^\s:/][^\s]*)$")
# light IRI sanity check (reference delegates to sophia_iri): scheme + no ws/brackets
_IRI_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*:[^\s<>\"{}|^`]*$")


class RuleConfigError(ValueError):
    """Invalid rules config (bad URI/CURIE, unknown prefix, bad secret…)."""


def _classify(uri: str) -> tuple[str, str]:
    """Return ("full", bare_iri) or ("curie", curie) — reference Uri::try_from."""
    if uri.startswith("<") and uri.endswith(">"):
        bare = uri[1:-1]
        if not _IRI_RE.match(bare):
            raise RuleConfigError(f"invalid IRI: {uri!r}")
        return ("full", bare)
    if _CURIE_RE.match(uri):
        return ("curie", uri)
    raise RuleConfigError(
        f"Input should be either a URI enclosed in '<>' or a CURIE. Found: {uri}"
    )


@dataclass
class PrefixMap:
    """prefix → bare base URI; key ``""`` is the default prefix (src/uris.rs:135-152)."""

    mapping: dict[str, str] = field(default_factory=dict)

    @classmethod
    def from_config(cls, prefixes: dict[str | None, str]) -> "PrefixMap":
        m: dict[str, str] = {}
        for k, v in (prefixes or {}).items():
            kind, bare = _classify(v)
            if kind != "full":
                raise RuleConfigError(f"prefix value must be a full URI in <>: {v!r}")
            m["" if k is None else str(k)] = bare
        return cls(m)

    def expand(self, uri: str) -> str:
        """Expand one rule URI to its bracketed serialized form ``"<iri>"``."""
        kind, val = _classify(uri)
        if kind == "full":
            return f"<{val}>"
        prefix, local = val.split(":", 1)
        if prefix not in self.mapping:
            raise RuleConfigError(f"unknown prefix {prefix!r} in CURIE {uri!r}")
        return f"<{self.mapping[prefix]}{local}>"


@dataclass
class Rules:
    """Expanded rules; all URI strings bracketed (matching-ready).

    Semantics contract (SURVEY.md §2.8, reference src/rules.rs:154-252):

    1. subject masked iff it is a named node with an indexed type in
       ``node_of_type``; 2. object-as-named-node masked by the same set;
    3. object masked if predicate in ``obj_on_predicate``; 4. object masked
    if subject (named OR blank) has a type T with predicate in
    ``obj_on_type_predicate[T]``; 5. ``invert`` flips the final mask.
    """

    invert: bool = False
    node_of_type: frozenset[str] = frozenset()
    obj_on_predicate: frozenset[str] = frozenset()
    obj_on_type_predicate: dict[str, frozenset[str]] = field(default_factory=dict)

    @classmethod
    def from_dict(cls, cfg: dict) -> "Rules":
        cfg = cfg or {}
        pm = PrefixMap.from_config(cfg.get("prefixes") or {})
        has_prefixes = bool(cfg.get("prefixes"))

        def expand(uri: str) -> str:
            kind, val = _classify(uri)
            if kind == "full":
                return f"<{val}>"
            if not has_prefixes:
                # reference: CURIEs without a prefix map fail at check time
                # only when expansion is attempted; keep strict here
                raise RuleConfigError(f"CURIE {uri!r} used without prefixes")
            return pm.expand(uri)

        nodes = cfg.get("nodes") or {}
        objects = cfg.get("objects") or {}
        of_type = frozenset(expand(u) for u in (nodes.get("of_type") or []))
        on_pred = frozenset(expand(u) for u in (objects.get("on_predicate") or []))
        otp = {
            expand(t): frozenset(expand(p) for p in (preds or []))
            for t, preds in (objects.get("on_type_predicate") or {}).items()
        }
        return cls(
            invert=bool(cfg.get("invert", False)),
            node_of_type=of_type,
            obj_on_predicate=on_pred,
            obj_on_type_predicate=otp,
        )

    @classmethod
    def from_yaml(cls, text_or_path: str) -> "Rules":
        if "\n" not in text_or_path and text_or_path.endswith((".yaml", ".yml")):
            with open(text_or_path) as f:
                cfg = yaml.safe_load(f)
        else:
            cfg = yaml.safe_load(text_or_path)
        return cls.from_dict(cfg)

    def is_empty(self) -> bool:
        return not (self.node_of_type or self.obj_on_predicate or self.obj_on_type_predicate)
