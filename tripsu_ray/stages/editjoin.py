"""Edit-distance similarity join (Levenshtein ≤ 1) via SymSpell-style
deletion-neighborhood bucketing — typosquat-candidate detection for a
code KG (near-miss module/package names), and a general string-similarity
join the reference lacks.

Exactness argument (the SymSpell lemma for distance 1): two DISTINCT
strings s, t with lev(s,t) ≤ 1 always share a key in ``{x} ∪ D1(x)``
(the string plus all single-character deletions) — substitution at
position i gives a common deletion; insertion/deletion makes one string a
D1 member of the other. So bucketing every name on its deletion
neighborhood finds ALL qualifying pairs (completeness). The converse does
NOT hold — a transposition (``core_12``/``core_21``) shares the deletion
key ``core_2`` at distance 2 — so an exact per-pair verification inside
each bucket removes the false candidates (soundness). Work per name is O(len²) characters of key material — no
all-pairs scan; candidate enumeration is quadratic only WITHIN a bucket
(names sharing a deletion variant), which is the standard SymSpell cost
model.

Plan: global distinct on the name (one name-hash exchange) → per-batch
deletion-key explode → ONE bucket-key exchange, per-bucket pair
enumeration + exact ``lev ≤ 1`` verify → ONE pair-key exchange for the
exactly-once dedup (a pair can collide in several buckets).

The key-generation loop is per-row Python (string slicing has no
numpy/arrow kernel), same justification as the rolling fingerprint:
O(chars) work per row, embarrassingly parallel, stateless.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_HASH_PARTS = 64


def _lev_le1(a: str, b: str) -> bool:
    """Exact lev(a,b) ≤ 1 for a != b (O(len) — no DP table needed)."""
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:
        return sum(1 for x, y in zip(a, b) if x != y) <= 1
    if la > lb:
        a, b, la = b, a, lb
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1 :]


def _deletion_keys(name: str) -> set[str]:
    return {name} | {name[:i] + name[i + 1 :] for i in range(len(name))}


def edit_distance_pairs(names_ds, *, col: str = "name", num_partitions: int = _HASH_PARTS):
    """Dataset with a string column ``col`` → Dataset (name_a, name_b) of
    all DISTINCT value pairs with Levenshtein distance ≤ 1 (name_a < name_b),
    each pair exactly once."""

    def _empty(*cols: str) -> pd.DataFrame:
        # Ray 2.49 empty blocks arrive schema-less (BASELINE.md quirk)
        out = pd.DataFrame({c: pd.Series([], dtype=object) for c in cols})
        out["_part"] = pd.Series([], dtype="int64")
        return out

    def local_distinct(df: pd.DataFrame) -> pd.DataFrame:
        if col not in df.columns:
            return _empty(col)
        df = df[[col]].drop_duplicates()
        df["_part"] = pd.util.hash_array(df[col].to_numpy(dtype=object)) % num_partitions
        return df

    def part_distinct(g: pd.DataFrame) -> pd.DataFrame:
        if col not in g.columns:
            return pd.DataFrame({col: pd.Series([], dtype=object)})
        return g[[col]].drop_duplicates(ignore_index=True)

    distinct = (
        names_ds.map_batches(local_distinct, batch_format="pandas")
        .groupby("_part")
        .map_groups(part_distinct, batch_format="pandas")
    )

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        names_out: list[str] = []
        keys: list[str] = []
        for nm in (df[col].tolist() if col in df.columns else []):
            ks = _deletion_keys(nm)
            keys.extend(ks)
            names_out.extend([nm] * len(ks))
        out = pd.DataFrame({"name": pd.Series(names_out, dtype=object),
                            "key": pd.Series(keys, dtype=object)})
        out["_bpart"] = pd.util.hash_array(out["key"].to_numpy(dtype=object)) % num_partitions
        return out

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        a_out: list[str] = []
        b_out: list[str] = []
        groups = g.groupby("key", sort=False) if "key" in g.columns else ()
        for _, grp in groups:
            names = grp["name"].unique()
            if len(names) < 2:
                continue
            names = np.sort(names)
            for i in range(len(names) - 1):
                for j in range(i + 1, len(names)):
                    if _lev_le1(names[i], names[j]):
                        a_out.append(names[i])
                        b_out.append(names[j])
        out = pd.DataFrame(
            {"name_a": pd.Series(a_out, dtype=object), "name_b": pd.Series(b_out, dtype=object)}
        ).drop_duplicates()
        out["_ppart"] = (
            pd.util.hash_array(
                (out["name_a"] + "\x00" + out["name_b"]).to_numpy(dtype=object)
            )
            % num_partitions
        )
        return out

    def pair_dedup(g: pd.DataFrame) -> pd.DataFrame:
        if "name_a" not in g.columns:
            return pd.DataFrame(
                {c: pd.Series([], dtype=object) for c in ("name_a", "name_b")}
            )
        return g[["name_a", "name_b"]].drop_duplicates(ignore_index=True)

    return (
        distinct.map_batches(explode, batch_format="pandas")
        .groupby("_bpart")
        .map_groups(bucket_pairs, batch_format="pandas")
        .groupby("_ppart")
        .map_groups(pair_dedup, batch_format="pandas")
    )
