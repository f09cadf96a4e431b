"""tripsu ``{types, map}`` JSON type-index interop (S6/S7 parity).

The reference serializes its ``TypeIndex`` as JSON (``src/index.rs:20-24``,
write ``src/index.rs:111``, read ``src/io.rs:58-63``): a deduplicated
``types`` string table plus ``map: {u64_hash_as_string: [type_idx]}``,
keyed by ``DefaultHasher`` (SipHash-1-3, zero keys) hashes of the
BRACKETED subject term (``src/index.rs:27-31,87``). This module reads and
writes that exact format — an index written by the Rust binary drives this
engine's pass 2 and vice versa — and provides :class:`HashIndexMatcher`,
a drop-in ``masks(batch)`` provider (same contract as
``engine.CompiledMatcher``) that probes the hash-keyed map directly.

The hash map cannot be inverted to subject strings, so the matcher works
in hash space: rule-relevant entries are collapsed ONCE into u64 hash
sets (sensitive subjects, per-otp-type subjects), and each batch hashes
its UNIQUE term keys (pure-Python SipHash over deduped values — the
config/interop path; the native Parquet index path stays fully
vectorized).
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .rdf import format_predicate, format_subject
from .rules import Rules
from .siphash import hash_term_keys, rust_default_hash_str


class TripsuIndex:
    """In-memory view of the reference's TypeIndex JSON."""

    def __init__(self, types: list[str], mapping: dict[int, list[int]]):
        self.types = list(types)
        self.map = {int(k): list(v) for k, v in mapping.items()}

    # -- reference-parity API (src/index.rs:50-82) --------------------------

    def insert(self, subject_key: str, type_key: str) -> None:
        """Insertion-order dedup semantics of TypeIndex::insert."""
        key = rust_default_hash_str(subject_key)
        if type_key in self.types:
            idx = self.types.index(type_key)
        else:
            idx = len(self.types)
            self.types.append(type_key)
        lst = self.map.setdefault(key, [])
        if idx not in lst:
            lst.append(idx)

    def get(self, subject_key: str) -> list[str] | None:
        """Type strings for a bracketed subject term (src/index.rs:77-82)."""
        idxs = self.map.get(rust_default_hash_str(subject_key))
        if idxs is None:
            return None
        return [self.types[i] for i in idxs]

    # -- JSON wire format ---------------------------------------------------

    @classmethod
    def from_json(cls, path_or_text: str) -> "TripsuIndex":
        if "\n" not in path_or_text and path_or_text.endswith(".json"):
            with open(path_or_text) as f:
                obj = json.load(f)
        else:
            obj = json.loads(path_or_text)
        return cls(obj["types"], {int(k): v for k, v in obj["map"].items()})

    def to_json(self, path: str | None = None) -> str:
        # serde_json renders u64 map keys as decimal strings
        obj = {"types": self.types, "map": {str(k): v for k, v in self.map.items()}}
        text = json.dumps(obj)
        if path is not None:
            with open(path, "w") as f:
                f.write(text)
        return text

    @classmethod
    def from_pairs(cls, pairs_df) -> "TripsuIndex":
        """Build from the native (subject, type) term-key pairs (first-seen
        type order, like the reference's streaming insert)."""
        idx = cls([], {})
        for s, t in zip(pairs_df["subject"], pairs_df["type"]):
            idx.insert(s, t)
        return idx


class HashIndexMatcher:
    """Rule matcher probing a hash-keyed TripsuIndex (masks-compatible with
    ``engine.CompiledMatcher`` — hand it to ``pseudonymize_batch`` /
    ``pseudonymize_tasks`` unchanged).

    Rule semantics identical to the compiled matcher (SURVEY.md §2.8):
    sensitive = subjects (by hash) whose indexed type ∈ of_type, probed at
    subject AND object-as-IRI position; on_predicate by string set; otp by
    (subjects-of-T hash set × predicate set), blank subjects included.
    """

    def __init__(self, rules: Rules, index: TripsuIndex):
        self.rules = rules
        self.invert = rules.invert
        type_idx_of = {t: i for i, t in enumerate(index.types)}
        sens_idx = {type_idx_of[t] for t in rules.node_of_type if t in type_idx_of}
        sens = [h for h, idxs in index.map.items() if sens_idx.intersection(idxs)]
        self._sensitive_hashes = np.sort(np.array(sens, dtype=np.uint64))
        self._on_pred = pa.array(sorted(rules.obj_on_predicate), type=pa.string())
        self._otp_groups: list[tuple[np.ndarray, pa.Array]] = []
        for t in sorted(rules.obj_on_type_predicate):
            preds = rules.obj_on_type_predicate[t]
            ti = type_idx_of.get(t)
            if ti is None or not preds:
                continue
            subs = [h for h, idxs in index.map.items() if ti in idxs]
            if subs:
                self._otp_groups.append(
                    (
                        np.sort(np.array(subs, dtype=np.uint64)),
                        pa.array(sorted(preds), type=pa.string()),
                    )
                )

    def masks(self, batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        from ..schema import KIND_IRI

        n = batch.num_rows
        subj_kind = batch["subject_kind"].combine_chunks()
        obj_kind = batch["object_kind"].combine_chunks()
        subj_key = format_subject(batch["subject"].combine_chunks(), subj_kind)
        pred_key = format_predicate(batch["predicate"].combine_chunks())

        subj_hash = hash_term_keys(subj_key.to_numpy(zero_copy_only=False))
        subj_is_iri = pc.equal(subj_kind, KIND_IRI).to_numpy(zero_copy_only=False)
        obj_is_iri = pc.equal(obj_kind, KIND_IRI).to_numpy(zero_copy_only=False)

        false_arr = np.zeros(n, dtype=bool)

        def hprobe(hashes: np.ndarray, hset: np.ndarray) -> np.ndarray:
            if len(hset) == 0:
                return false_arr
            pos = np.searchsorted(hset, hashes)
            pos[pos >= len(hset)] = 0
            return hset[pos] == hashes

        mask_s = hprobe(subj_hash, self._sensitive_hashes) & subj_is_iri

        obj_key = pc.if_else(
            pc.equal(obj_kind, KIND_IRI),
            pc.binary_join_element_wise(
                "<", batch["object_value"].combine_chunks(), ">", ""
            ),
            pa.scalar("", pa.string()),  # hashed but never matched (kind gate)
        )
        obj_hash = hash_term_keys(obj_key.to_numpy(zero_copy_only=False))
        mask_o = hprobe(obj_hash, self._sensitive_hashes) & obj_is_iri
        if len(self._on_pred):
            mask_o |= pc.is_in(pred_key, value_set=self._on_pred).to_numpy(
                zero_copy_only=False
            )
        for sub_hashes, preds in self._otp_groups:
            mask_o |= hprobe(subj_hash, sub_hashes) & pc.is_in(
                pred_key, value_set=preds
            ).to_numpy(zero_copy_only=False)

        if self.invert:
            mask_s, mask_o = ~mask_s, ~mask_o
        return mask_s, mask_o
