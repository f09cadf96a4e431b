"""Text analysis stages over the ``documents`` table (training-data ops).

All stages are stateless, fully-vectorized ``map_batches`` transforms over
pandas batches (string kernels) — at 100 TB these shard trivially since no
stage needs cross-document state. Every computed column is defined so the
DuckDB oracle can reproduce it bit-for-bit (integer counts; doubles only as
a final division of identical integers, which is IEEE-deterministic).

Definitions (mirrored in pipelines/doc_oracle.py):

- token: a maximal run of ``[a-z0-9]+`` in ``lower(text)``
- n_tokens / n_uniq_tokens: total / distinct token count
- alpha_chars: total token characters (= len after stripping non-[a-z0-9])
- stop_count: occurrences of the stopword set {the, a, of, to, and} as
  whole tokens
- stop_ratio, mean_token_len: double divisions of the above
- langid: stopword-profile heuristic — 'en' if stop_ratio > 0.02 else
  'unknown' (the synthetic corpus is English-shaped; the stage demonstrates
  the plumbing and the heuristic is deterministic + oracle-checkable)
- fingerprint: sha256 of the normalized text (lower, whitespace collapsed
  to single spaces, trimmed) — the exact-dedup key
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

TOKEN_RE = r"[a-z0-9]+"
STOPWORDS = ("the", "a", "of", "to", "and")
STOP_RE = r"\b(?:the|a|of|to|and)\b"
NORM_WS_RE = r"\s+"
LANGID_THRESHOLD = 0.02

_token_pat = re.compile(TOKEN_RE)
_stop_pat = re.compile(STOP_RE)


def text_stats_batch(batch: pd.DataFrame) -> pd.DataFrame:
    low = batch["text"].str.lower()
    n_tokens = low.str.count(TOKEN_RE).astype("int64")
    toks = low.str.findall(_token_pat)
    n_uniq = toks.map(lambda ts: len(set(ts))).astype("int64")
    alpha_chars = low.str.replace(r"[^a-z0-9]", "", regex=True).str.len().astype("int64")
    stop_count = low.str.count(STOP_RE).astype("int64")
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": n_tokens,
            "n_uniq_tokens": n_uniq,
            "alpha_chars": alpha_chars,
            "stop_count": stop_count,
            "stop_ratio": stop_count / n_tokens.clip(lower=1),
            "mean_token_len": alpha_chars / n_tokens.clip(lower=1),
        }
    )


def langid_batch(batch: pd.DataFrame) -> pd.DataFrame:
    low = batch["text"].str.lower()
    n_tokens = low.str.count(TOKEN_RE).astype("int64").clip(lower=1)
    stop_count = low.str.count(STOP_RE).astype("int64")
    ratio = stop_count / n_tokens
    pred = np.where(ratio > LANGID_THRESHOLD, "en", "unknown")
    return pd.DataFrame({"doc_id": batch["doc_id"], "lang_pred": pred})


def fingerprint_batch(batch: pd.DataFrame) -> pd.DataFrame:
    norm = (
        batch["text"].str.lower().str.replace(NORM_WS_RE, " ", regex=True).str.strip()
    )
    fp = np.array(
        [hashlib.sha256(t.encode("utf-8")).hexdigest() for t in norm], dtype=object
    )
    return pd.DataFrame({"doc_id": batch["doc_id"], "fingerprint": fp})


def rolling_fingerprint_batch(batch: pd.DataFrame, window: int = 8) -> pd.DataFrame:
    """Polynomial rolling hash over token streams (content-defined docs ID).

    Winnowing-style document fingerprint: min of rolling window hashes over
    the token sequence, base-257 polynomial mod 2^61-1. Not SQL-expressible
    → rows-only correctness check; unit-tested for determinism.
    """
    P = (1 << 61) - 1
    B = 257

    def fp(text: str) -> int:
        toks = _token_pat.findall(text.lower())
        hs = [hash_token(t) for t in toks]
        if not hs:
            return 0
        if len(hs) < window:
            acc = 0
            for h in hs:
                acc = (acc * B + h) % P
            return acc
        best = None
        acc = 0
        pw = pow(B, window - 1, P)
        for i, h in enumerate(hs):
            if i < window:
                acc = (acc * B + h) % P
                if i == window - 1 and (best is None or acc < best):
                    best = acc
            else:
                acc = ((acc - hs[i - window] * pw) * B + h) % P
                if best is None or acc < best:
                    best = acc
        return best

    def hash_token(t: str) -> int:
        return int.from_bytes(hashlib.sha256(t.encode()).digest()[:8], "big") % P

    vals = np.array([fp(t) for t in batch["text"]], dtype=np.uint64)
    return pd.DataFrame({"doc_id": batch["doc_id"], "rolling_fp": vals})


def _docs(sf_dir: str, columns=("doc_id", "text")):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=list(columns))


def text_stats(sf_dir: str):
    return _docs(sf_dir).map_batches(text_stats_batch, batch_format="pandas")


def text_langid(sf_dir: str):
    return _docs(sf_dir).map_batches(langid_batch, batch_format="pandas")


def text_fingerprint(sf_dir: str):
    return _docs(sf_dir).map_batches(fingerprint_batch, batch_format="pandas")


def text_rolling_fingerprint(sf_dir: str):
    return _docs(sf_dir).map_batches(rolling_fingerprint_batch, batch_format="pandas")
