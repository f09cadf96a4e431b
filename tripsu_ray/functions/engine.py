"""Vectorized rule matching + pseudonymization over Arrow triple batches.

This is the columnar re-expression of the reference's per-triple loop
(``/root/reference/src/pseudo.rs:20-45`` → ``src/rules.rs:154-252`` →
``src/crypto.rs:19-37``): instead of probing a HashMap per triple, we
precompile the (rules × type-index) join into three probe sets once per
worker, then evaluate every batch with ``pyarrow.compute`` set-membership
kernels:

- ``sensitive``: term keys of subjects whose indexed types intersect
  ``nodes.of_type`` — probed by both the subject column (src/rules.rs:167-171)
  and the named-node object column (src/rules.rs:172-177).
- ``on_predicate``: predicate term keys (src/rules.rs:192-194).
- ``otp``: per rule type T, the pair (subjects-of-T value set, otp[T]
  predicate value set); the O bit fires when subject ∈ set AND predicate ∈
  set, OR-ed over the (few) rule types (src/rules.rs:196-210). This
  factored form replaces a subject×predicate cross-product string table —
  ~half the broadcast bytes and no per-row string concatenation per batch.

Mask algebra (src/model.rs:13-31): two boolean columns (S, O); the
PREDICATE bit exists in the reference but is never acted on — rewrites only
ever touch subject/object (src/crypto.rs:19-37). ``invert`` flips both
columns; blank nodes survive even under invert because the blank rewrite is
the identity (src/crypto.rs:40-46,71-73).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..schema import KIND_IRI, KIND_LITERAL, TRIPLES
from .crypto import Pseudonymizer
from .rdf import format_predicate, format_subject
from .rules import Rules

_SEP = "\x1f"


class CompiledMatcher:
    """rules × type-index → Arrow value-sets for O(1) vectorized probes.

    ``index`` is either a dict {subject term key → iterable of type term
    keys} (tiny fixtures / tests) or a two-column DataFrame of distinct
    (subject, type) term-key pairs (the production path — the probe sets
    derive via vectorized isin/merge, no per-subject Python loop).

    Compile ONCE on the driver, ``ray.put`` the matcher, and hand the
    ObjectRef to the actor pool: N actors then share one compilation
    instead of each re-deriving the sets from a broadcast index dict.
    """

    def __init__(self, rules: Rules, index):
        import pandas as pd

        self.rules = rules
        if not isinstance(index, pd.DataFrame):
            index = pd.DataFrame(
                [(s, t) for s, types in index.items() for t in types],
                columns=["subject", "type"],
            )
        sensitive = index.loc[
            index["type"].isin(rules.node_of_type), "subject"
        ].unique()
        # factored otp probe: [(subjects-of-T set, preds set)] per rule type;
        # types sorted so mask evaluation order (and thus results under any
        # future short-circuiting) is deterministic
        self._otp_groups: list[tuple[pa.Array, pa.Array]] = []
        if rules.obj_on_type_predicate and len(index):
            for t in sorted(rules.obj_on_type_predicate):
                preds = rules.obj_on_type_predicate[t]
                subs = index.loc[index["type"] == t, "subject"].unique()
                if len(subs) and preds:
                    self._otp_groups.append(
                        (pa.array(subs, pa.string()), pa.array(sorted(preds), pa.string()))
                    )
        self._sensitive = pa.array(sensitive, type=pa.string())
        self._on_pred = pa.array(sorted(rules.obj_on_predicate), type=pa.string())
        self.invert = rules.invert

    def masks(self, batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        """Return (mask_subject, mask_object) boolean numpy arrays."""
        n = batch.num_rows
        subj = batch["subject"].combine_chunks()
        subj_kind = batch["subject_kind"].combine_chunks()
        obj_kind = batch["object_kind"].combine_chunks()
        subj_key = format_subject(subj, subj_kind)
        pred_key = format_predicate(batch["predicate"].combine_chunks())

        false_arr = np.zeros(n, dtype=bool)

        def probe(keys: pa.Array, value_set: pa.Array) -> np.ndarray:
            if len(value_set) == 0:
                return false_arr
            return pc.is_in(keys, value_set=value_set).to_numpy(zero_copy_only=False)

        subj_is_iri = pc.equal(subj_kind, KIND_IRI).to_numpy(zero_copy_only=False)
        obj_is_iri = pc.equal(obj_kind, KIND_IRI).to_numpy(zero_copy_only=False)

        mask_s = probe(subj_key, self._sensitive) & subj_is_iri

        # object-as-node probe: serialize object as "<iri>" only where iri
        obj_key = pc.if_else(
            pc.equal(obj_kind, KIND_IRI),
            pc.binary_join_element_wise("<", batch["object_value"].combine_chunks(), ">", ""),
            pa.scalar(None, pa.string()),
        )
        mask_o = probe(obj_key, self._sensitive) & obj_is_iri
        mask_o |= probe(pred_key, self._on_pred)
        for subjects, preds in self._otp_groups:
            mask_o |= probe(subj_key, subjects) & probe(pred_key, preds)

        if self.invert:
            mask_s, mask_o = ~mask_s, ~mask_o
        return mask_s, mask_o


def _replace_masked(col: pa.Array, sel: np.ndarray, fn) -> pa.Array:
    """Rewrite only the selected rows of an Arrow column.

    The unselected majority never leaves Arrow — converting full columns to
    Python strings was the dominant memory cost of this stage.
    """
    mask = pa.array(sel)
    masked_vals = col.filter(mask).to_numpy(zero_copy_only=False).astype(object)
    replacements = pa.array(fn(masked_vals), type=pa.string())
    return pc.replace_with_mask(col, mask, replacements)


def rewrite_batch(
    batch: pa.Table,
    mask_s: np.ndarray,
    mask_o: np.ndarray,
    pseudo: Pseudonymizer,
) -> pa.Table:
    """Apply the mask: rewrite subject/object columns, zero-copy passthrough rows.

    Rewrite semantics per src/crypto.rs:19-73 — IRIs keep their namespace
    prefix; literals collapse to simple literals; blank nodes are identity.
    Hashing dedupes values first (entities repeat heavily in a graph); only
    masked rows are ever materialized as Python objects.
    """
    if not (mask_s.any() or mask_o.any()):
        return batch

    subj_kind = batch["subject_kind"].to_numpy(zero_copy_only=False)
    obj_kind = batch["object_kind"].to_numpy(zero_copy_only=False)
    subj = batch["subject"].combine_chunks()
    obj = batch["object_value"].combine_chunks()
    lang = batch["object_lang"].combine_chunks()
    dtype = batch["object_datatype"].combine_chunks()

    s_sel = mask_s & (subj_kind == KIND_IRI)  # blank subjects: identity
    if s_sel.any():
        subj = _replace_masked(subj, s_sel, pseudo.pseudo_iris)

    o_iri = mask_o & (obj_kind == KIND_IRI)
    o_lit = mask_o & (obj_kind == KIND_LITERAL)
    if o_iri.any():
        obj = _replace_masked(obj, o_iri, pseudo.pseudo_iris)
    if o_lit.any():
        obj = _replace_masked(obj, o_lit, pseudo.pseudo_unique)
        # literal rewrite yields a *simple* literal: drop lang/datatype
        null_mask = pa.array(o_lit)
        lang = pc.if_else(null_mask, pa.scalar(None, pa.string()), lang)
        dtype = pc.if_else(null_mask, pa.scalar(None, pa.string()), dtype)

    cols = {
        "subject": subj,
        "subject_kind": batch["subject_kind"],
        "predicate": batch["predicate"],
        "object_value": obj,
        "object_kind": batch["object_kind"],
        "object_lang": lang,
        "object_datatype": dtype,
    }
    extras = [c for c in batch.column_names if c not in cols]
    if not extras:
        return pa.table(cols, schema=TRIPLES)
    # pass-through any extra columns (e.g. the N-Quads ``graph`` term —
    # graph labels are never pseudonymized, mirroring predicates)
    for c in extras:
        cols[c] = batch[c]
    return pa.table(cols)


def node_rewrites_any_prefix(matcher: CompiledMatcher, prefixes) -> bool:
    """True if *node* rules (the sensitive set / invert) can rewrite an IRI
    under any given prefix. Object rules are NOT covered — see
    :func:`rewrites_any_prefix` / :func:`obj_rule_predicates`."""
    if matcher.invert:
        return True
    import pyarrow.compute as pc

    # stays in Arrow: the sensitive set can be millions of keys
    return any(
        bool(pc.any(pc.starts_with(matcher._sensitive, "<" + p)).as_py())
        for p in prefixes
    )


def obj_rule_predicates(matcher: CompiledMatcher) -> list[str]:
    """Bracketed predicate keys whose object rules could rewrite an object.

    ``on_predicate`` and ``on_type_predicate`` rewrite whatever OBJECT the
    matched triple carries — an IRI object is rewritten too (pseudo_triple
    dispatches on the object kind, src/crypto.rs:19-46; only blank nodes
    pass through). Callers that need to prove "no IRI under prefix P is
    rewritten" must therefore check, against the DATA, that no triple with
    one of these predicates has an IRI object under P (see
    stages.folds.fold_pass's risk counter).
    """
    preds = set(matcher._on_pred.to_pylist())
    for _, p_arr in matcher._otp_groups:
        preds.update(p_arr.to_pylist())
    # rules may name otp predicates for types with no indexed subjects (the
    # otp group is then dropped from the compiled probe) — still include
    # them from the raw rules: the compile prunes against ONE index snapshot
    preds.update(matcher.rules.obj_on_predicate)
    for ps in matcher.rules.obj_on_type_predicate.values():
        preds.update(ps)
    return sorted(preds)


def rewrites_any_prefix(matcher: CompiledMatcher, prefixes) -> bool:
    """Conservative: True if the rules COULD rewrite an IRI under any prefix.

    Node rules rewrite sensitive IRIs everywhere they appear; under
    ``invert`` every non-match is rewritten; and object rules
    (on_predicate / on_type_predicate) rewrite IRI objects of matched
    triples (src/crypto.rs:19-46) — statically we cannot know whether the
    matched triples carry IRI objects under the prefixes, so any non-empty
    object rule returns True. For the refined data-dependent check use
    :func:`node_rewrites_any_prefix` + the fold_pass risk counter over
    :func:`obj_rule_predicates`.
    """
    if node_rewrites_any_prefix(matcher, prefixes):
        return True
    return bool(obj_rule_predicates(matcher))


def pseudonymize_batch(
    batch: pa.Table, matcher: CompiledMatcher, pseudo: Pseudonymizer
) -> pa.Table:
    """match_rules + pseudo_triple for a whole batch (cf. src/pseudo.rs:20-45)."""
    mask_s, mask_o = matcher.masks(batch)
    return rewrite_batch(batch, mask_s, mask_o, pseudo)
