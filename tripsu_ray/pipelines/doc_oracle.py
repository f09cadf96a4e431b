"""DuckDB oracle SQL for the training-data + relational queries.

Shares the literal definitions (token regex, stopword set, thresholds,
quantization) with the stage code via imported constants.
"""

from __future__ import annotations

from ..stages.text import (
    BPE_RE,
    LANGID_THRESHOLD,
    PUNCT_RE,
    QUALITY_MIN_TOKENS,
    STOPWORDS,
    TOKEN_RE,
    WS_TOKEN_RE,
)

# DuckDB/RE2 rendering of the shared patterns
_TOK = TOKEN_RE
_STOP = r"\b(?:" + "|".join(STOPWORDS) + r")\b"
# SQL string literal escaping (BPE_RE contains a single quote)
_BPE = BPE_RE.replace("'", "''")


def sql_text_stats() -> str:
    return f"""
SELECT
  doc_id,
  len(regexp_extract_all(lower(text), '{_TOK}')) AS n_tokens,
  len(list_distinct(regexp_extract_all(lower(text), '{_TOK}'))) AS n_uniq_tokens,
  length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS alpha_chars,
  len(regexp_extract_all(lower(text), '{_STOP}')) AS stop_count,
  CAST(len(regexp_extract_all(lower(text), '{_STOP}')) AS DOUBLE)
    / greatest(len(regexp_extract_all(lower(text), '{_TOK}')), 1) AS stop_ratio,
  CAST(length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS DOUBLE)
    / greatest(len(regexp_extract_all(lower(text), '{_TOK}')), 1) AS mean_token_len
FROM documents ORDER BY doc_id
""".strip()


def sql_text_langid() -> str:
    return f"""
SELECT doc_id,
  CASE WHEN CAST(len(regexp_extract_all(lower(text), '{_STOP}')) AS DOUBLE)
            / greatest(len(regexp_extract_all(lower(text), '{_TOK}')), 1)
            > {LANGID_THRESHOLD}
       THEN 'en' ELSE 'unknown' END AS lang_pred
FROM documents ORDER BY doc_id
""".strip()


def sql_text_tokens() -> str:
    return f"""
SELECT doc_id,
  len(regexp_extract_all(text, '{WS_TOKEN_RE}')) AS n_ws_tokens,
  len(regexp_extract_all(text, '{_BPE}')) AS n_bpe_tokens,
  len(list_distinct(regexp_extract_all(text, '{_BPE}'))) AS n_bpe_uniq
FROM documents ORDER BY doc_id
""".strip()


def sql_text_quality() -> str:
    # Integer-only gate arithmetic — identical to stages/text.py:quality_batch.
    return f"""
WITH sig AS (
  SELECT doc_id,
    length(text) AS n_chars,
    len(regexp_extract_all(lower(text), '{_TOK}')) AS n_tokens,
    len(list_distinct(regexp_extract_all(lower(text), '{_TOK}'))) AS n_uniq,
    length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS alpha_chars,
    len(regexp_extract_all(lower(text), '{_STOP}')) AS stop_count,
    len(regexp_extract_all(text, '{PUNCT_RE}')) AS punct_chars
  FROM documents
), gates AS (
  SELECT doc_id, n_chars, punct_chars,
    CAST(n_tokens >= {QUALITY_MIN_TOKENS} AS BIGINT)
    + CAST(alpha_chars >= 2*n_tokens AND alpha_chars <= 12*n_tokens AS BIGINT)
    + CAST(stop_count*100 > n_tokens AS BIGINT)
    + CAST(punct_chars*5 < greatest(n_chars, 1) AS BIGINT)
    + CAST(n_uniq*5 > n_tokens AS BIGINT) AS quality_score
  FROM sig
)
SELECT doc_id, n_chars, punct_chars, quality_score,
       CAST(quality_score = 5 AS BIGINT) AS quality_keep
FROM gates ORDER BY doc_id
""".strip()


def sql_text_pii() -> str:
    from ..stages.text import EMAIL_RE, EMAIL_TOKEN, URL_RE, URL_TOKEN

    em, ur = EMAIL_RE.replace("'", "''"), URL_RE.replace("'", "''")
    return f"""
SELECT doc_id,
  len(regexp_extract_all(text, '{em}')) AS n_emails,
  len(regexp_extract_all(text, '{ur}')) AS n_urls,
  sha256(regexp_replace(regexp_replace(text, '{em}', '{EMAIL_TOKEN}', 'g'),
                        '{ur}', '{URL_TOKEN}', 'g')) AS redacted_sha
FROM documents ORDER BY doc_id
""".strip()


def sql_text_dup_spans() -> str:
    # Mirror of stages/text.py dup-span census: sha256 over space-joined
    # token windows; a window is "dup" when its content occurs in >= 2
    # distinct docs. DuckDB list slicing ts[i:i+W-1] is 1-based inclusive.
    from ..stages.text import DUP_SPAN_WINDOW as W

    return f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{_TOK}') AS ts FROM documents
), wins AS (
  SELECT doc_id, sha256(array_to_string(ts[i:i+{W - 1}], ' ')) AS k
  FROM toks, unnest(generate_series(1, len(ts) - {W - 1})) AS t(i)
), dup AS (
  SELECT k FROM (SELECT DISTINCT k, doc_id FROM wins)
  GROUP BY k HAVING count(*) >= 2
), per_doc AS (
  SELECT doc_id, count(*) AS n_windows,
         count(*) FILTER (WHERE k IN (SELECT k FROM dup)) AS n_dup_windows
  FROM wins GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(p.n_windows, 0) AS n_windows,
       COALESCE(p.n_dup_windows, 0) AS n_dup_windows
FROM documents d LEFT JOIN per_doc p USING (doc_id)
ORDER BY d.doc_id
""".strip()


def sql_text_vocab() -> str:
    from ..stages.text import VOCAB_TOP_K

    return f"""
SELECT tok AS token, CAST(count(*) AS BIGINT) AS n
FROM (SELECT unnest(regexp_extract_all(lower(text), '{_TOK}')) AS tok FROM documents)
GROUP BY tok ORDER BY n DESC, tok LIMIT {VOCAB_TOP_K}
""".strip()


def sql_text_top_terms() -> str:
    from ..stages.text import TOP_TERMS_K

    return f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{_TOK}')) AS token
  FROM documents
),
tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2),
df AS (SELECT token, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
ranked AS (
  SELECT tf.doc_id, tf.token, tf.tf, df.df,
    row_number() OVER (
      PARTITION BY tf.doc_id
      ORDER BY tf.tf DESC, df.df ASC, tf.token ASC
    ) AS rank
  FROM tf JOIN df USING (token)
)
SELECT doc_id, CAST(rank AS BIGINT) AS rank, token,
       CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df
FROM ranked WHERE rank <= {TOP_TERMS_K}
ORDER BY doc_id, rank
""".strip()


def sql_text_tfidf() -> str:
    from ..stages.text import TFIDF_K

    return f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{_TOK}')) AS token
  FROM documents
),
tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2),
df AS (SELECT token, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
idf AS (
  SELECT token,
         CAST(floor(1000000 * (ln((SELECT count(*) FROM documents))
                               - ln(df))) AS BIGINT) AS idf_q
  FROM df
),
scored AS (
  SELECT tf.doc_id, tf.token, tf.tf, idf.idf_q,
         CAST(tf.tf AS BIGINT) * idf.idf_q AS tfidf_q
  FROM tf JOIN idf USING (token)
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id ORDER BY tfidf_q DESC, token ASC
  ) AS rank
  FROM scored
)
SELECT doc_id, CAST(rank AS BIGINT) AS rank, token,
       CAST(tf AS BIGINT) AS tf, idf_q, tfidf_q
FROM ranked WHERE rank <= {TFIDF_K}
ORDER BY doc_id, rank
""".strip()


def sql_text_naive_bayes() -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{_TOK}')) AS token
  FROM documents
),
tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2),
langs AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY 1),
cnt AS (
  SELECT d.lang, t.token, count(*) AS c
  FROM toks t JOIN documents d USING (doc_id) GROUP BY 1, 2
),
tot AS (SELECT lang, sum(c) AS t FROM cnt GROUP BY 1),
vocab AS (SELECT count(DISTINCT token) AS v FROM toks),
lmodel AS (
  SELECT l.lang,
         CAST(floor(1000000 * (ln(l.n_docs)
              - ln((SELECT count(*) FROM documents)))) AS BIGINT) AS prior_q,
         tot.t + (SELECT v FROM vocab) AS denom
  FROM langs l JOIN tot USING (lang)
),
scored AS (
  SELECT tf.doc_id, m.lang,
         m.prior_q + sum(tf.tf * CAST(floor(1000000 *
             (ln(coalesce(c.c, 0) + 1) - ln(m.denom))) AS BIGINT)) AS score_q
  FROM tf CROSS JOIN lmodel m
  LEFT JOIN cnt c ON c.lang = m.lang AND c.token = tf.token
  GROUP BY tf.doc_id, m.lang, m.prior_q
),
best AS (
  SELECT doc_id, lang AS pred_lang, score_q,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score_q DESC, lang ASC) AS r
  FROM scored
)
SELECT b.doc_id, d.lang AS true_lang, b.pred_lang,
       CAST(b.score_q AS BIGINT) AS score_q
FROM best b JOIN documents d ON d.doc_id = b.doc_id
WHERE b.r = 1 ORDER BY b.doc_id
""".strip()


def sql_text_vocab_richness() -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{_TOK}')) AS token
  FROM documents
),
cnt AS (
  SELECT d.lang, t.token, count(*) AS c
  FROM toks t JOIN documents d USING (doc_id) GROUP BY 1, 2
)
SELECT lang,
       CAST(sum(c) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS vocab,
       CAST(count(*) FILTER (WHERE c = 1) AS BIGINT) AS hapax,
       CAST((1000000 * count(*)) // sum(c) AS BIGINT) AS ttr_q,
       CAST((1000000 * count(*) FILTER (WHERE c = 1)) // count(*) AS BIGINT)
         AS hapax_ratio_q
FROM cnt GROUP BY lang ORDER BY lang
""".strip()


def sql_text_collocations() -> str:
    from ..stages.text import COLLOC_MIN_COUNT, COLLOC_TOP_K

    return f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{_TOK}') AS ts FROM documents
), grams AS (
  SELECT ts[i] AS w1, ts[i + 1] AS w2
  FROM toks, unnest(generate_series(1, len(ts) - 1)) AS t(i)
), bg AS (
  SELECT w1, w2, count(*) AS c FROM grams GROUP BY w1, w2
), cx AS (SELECT w1, sum(c) AS n FROM bg GROUP BY 1),
   cy AS (SELECT w2, sum(c) AS n FROM bg GROUP BY 1),
   tot AS (SELECT sum(c) AS n FROM bg),
scored AS (
  SELECT bg.w1, bg.w2, CAST(bg.c AS BIGINT) AS c,
         CAST(floor(1000000 * (ln(bg.c) + ln(tot.n) - ln(cx.n) - ln(cy.n)))
              AS BIGINT) AS pmi_q
  FROM bg JOIN cx USING (w1) JOIN cy USING (w2) CROSS JOIN tot
  WHERE bg.c >= {COLLOC_MIN_COUNT}
)
SELECT w1, w2, c, pmi_q FROM scored
ORDER BY pmi_q DESC, w1, w2 LIMIT {COLLOC_TOP_K}
""".strip()


def sql_text_nb_confusion() -> str:
    inner = sql_text_naive_bayes()
    return f"""
SELECT true_lang, pred_lang, CAST(count(*) AS BIGINT) AS n
FROM ({inner})
GROUP BY 1, 2 ORDER BY 1, 2
""".strip()


def sql_text_lang_divergence() -> str:
    from ..stages.text import JSD_SCALE

    return f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{_TOK}')) AS token
  FROM documents
),
cnt AS (
  SELECT d.lang, t.token, count(*) AS c
  FROM toks t JOIN documents d USING (doc_id) GROUP BY 1, 2
),
tot AS (SELECT lang, sum(c) AS t FROM cnt GROUP BY 1),
langs AS (SELECT DISTINCT lang FROM cnt),
pairs AS (
  SELECT a.lang AS lang1, b.lang AS lang2
  FROM langs a JOIN langs b ON a.lang < b.lang
),
vocab AS (SELECT DISTINCT token FROM cnt),
grid AS (
  SELECT p.lang1, p.lang2,
         coalesce(c1.c, 0) AS c1, coalesce(c2.c, 0) AS c2, t1.t AS t1, t2.t AS t2
  FROM pairs p
  CROSS JOIN vocab v
  LEFT JOIN cnt c1 ON c1.lang = p.lang1 AND c1.token = v.token
  LEFT JOIN cnt c2 ON c2.lang = p.lang2 AND c2.token = v.token
  JOIN tot t1 ON t1.lang = p.lang1
  JOIN tot t2 ON t2.lang = p.lang2
  WHERE coalesce(c1.c, 0) + coalesce(c2.c, 0) > 0
),
contrib AS (
  SELECT lang1, lang2,
    CAST(floor({JSD_SCALE} * (
      (CASE WHEN c1 = 0 THEN 0.0
            ELSE 0.5 * (CAST(c1 AS DOUBLE) / CAST(t1 AS DOUBLE))
                 * ln((CAST(c1 AS DOUBLE) / CAST(t1 AS DOUBLE))
                      / (((CAST(c1 AS DOUBLE) / CAST(t1 AS DOUBLE))
                          + (CAST(c2 AS DOUBLE) / CAST(t2 AS DOUBLE))) / 2.0))
       END)
      + (CASE WHEN c2 = 0 THEN 0.0
              ELSE 0.5 * (CAST(c2 AS DOUBLE) / CAST(t2 AS DOUBLE))
                   * ln((CAST(c2 AS DOUBLE) / CAST(t2 AS DOUBLE))
                        / (((CAST(c1 AS DOUBLE) / CAST(t1 AS DOUBLE))
                            + (CAST(c2 AS DOUBLE) / CAST(t2 AS DOUBLE))) / 2.0))
         END))) AS BIGINT) AS cq
  FROM grid
)
SELECT lang1, lang2, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(cq) AS BIGINT) AS jsd_q
FROM contrib GROUP BY 1, 2 ORDER BY 1, 2
""".strip()


def sql_text_mixture() -> str:
    from ..stages.text import _MIX_DEFAULT_STRIDE, MIX_STRIDES

    case = " ".join(
        f"WHEN '{k}' THEN {v}" for k, v in sorted(MIX_STRIDES.items())
    )
    return f"""
WITH r AS (
  SELECT doc_id, lang,
    row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS lang_rank
  FROM documents
),
v AS (
  SELECT doc_id, lang, lang_rank,
    lang_rank * CASE lang {case} ELSE {_MIX_DEFAULT_STRIDE} END AS vkey
  FROM r
)
SELECT doc_id, lang, CAST(lang_rank AS BIGINT) AS lang_rank,
  CAST(vkey AS BIGINT) AS vkey,
  CAST(row_number() OVER (ORDER BY vkey, lang, doc_id) AS BIGINT) AS mix_pos
FROM v ORDER BY doc_id
""".strip()


def sql_text_decontaminate() -> str:
    from ..stages.text import BENCH_EVERY, BENCH_LEN, BENCH_MIN_CHARS, BENCH_OFF

    return f"""
WITH bench AS (
  SELECT substring(text, {BENCH_OFF + 1}, {BENCH_LEN}) AS snippet
  FROM documents
  WHERE doc_id % {BENCH_EVERY} = 0 AND length(text) >= {BENCH_MIN_CHARS}
)
SELECT d.doc_id,
  CAST((SELECT count(*) FROM bench b WHERE contains(d.text, b.snippet)) AS BIGINT)
    AS n_bench_hits,
  CAST((SELECT count(*) FROM bench b WHERE contains(d.text, b.snippet)) > 0 AS BIGINT)
    AS contaminated
FROM documents d ORDER BY d.doc_id
""".strip()


def sql_text_fingerprint() -> str:
    return r"""
SELECT doc_id,
       sha256(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint
FROM documents ORDER BY doc_id
""".strip()


def sql_dedup_exact() -> str:
    return r"""
SELECT sha256(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint,
       min(doc_id) AS doc_id
FROM documents GROUP BY 1 ORDER BY 1
""".strip()


def sql_jaccard_pairs() -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, list_distinct(regexp_extract_all(lower(text), '{_TOK}')) AS t
  FROM documents
)
SELECT a.doc_id AS a, b.doc_id AS b,
       CAST(floor(1000000.0 * len(list_intersect(a.t, b.t))
            / (len(a.t) + len(b.t) - len(list_intersect(a.t, b.t)))) AS BIGINT) AS jacq
FROM toks a JOIN toks b ON a.doc_id < b.doc_id
WHERE 1000000.0 * len(list_intersect(a.t, b.t))
      / (len(a.t) + len(b.t) - len(list_intersect(a.t, b.t))) >= 800000
ORDER BY 1, 2
""".strip()


def sql_ann_topk(k: int = 10, num_queries: int = 5) -> str:
    return f"""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
), q AS (
  SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < {num_queries}
), scored AS (
  SELECT q.query_id, v.vec_id,
         CAST(floor(list_cosine_similarity(q.qe, v.e) * 1000000) AS BIGINT) AS simq
  FROM q JOIN v ON v.vec_id <> q.query_id
), ranked AS (
  SELECT query_id, vec_id, simq,
         row_number() OVER (PARTITION BY query_id ORDER BY simq DESC, vec_id) AS rank
  FROM scored
)
SELECT query_id, vec_id, simq, rank FROM ranked WHERE rank <= {k}
ORDER BY query_id, rank
""".strip()


def sql_ann_lsh(k: int = 10, num_queries: int = 5, num_planes: int = 4,
                num_tables: int = 8, seed: int = 11, dim: int = 64) -> str:
    """Multi-table hyperplane ANN oracle — the exact dual of
    ``stages/similarity.py::ann_lsh`` now that its planes are
    integer-quantized (round-3 VERDICT item 4): plane literals replay the
    per-table integer sign signatures exactly, the ≤1-bit multiprobe is
    ``bit_count(xor(...)) <= 1`` over any table, and the rerank is the
    identical floor(10⁶·cos) scoring ``sql_ann_topk`` already
    hash-matches. ``dim`` pins the corpus embedding width."""
    from ..stages.dedup import lsh_planes_q

    planes = lsh_planes_q(dim, num_tables * num_planes, seed)
    vals = ", ".join(
        f"({d}, {c // num_planes}, {c % num_planes}, {int(planes[d, c])})"
        for d in range(dim) for c in range(num_tables * num_planes)
    )
    return f"""
WITH qv AS MATERIALIZED (
  SELECT vec_id, unnest(range(len(embedding))) AS d,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT) AS v
  FROM embeddings
), planes(d, t, p, w) AS (VALUES {vals}),
dots AS (
  SELECT q.vec_id, pl.t, pl.p, sum(q.v * pl.w) AS dp
  FROM qv q JOIN planes pl USING (d) GROUP BY q.vec_id, pl.t, pl.p
), sig AS MATERIALIZED (
  SELECT vec_id, t,
         sum(CASE WHEN dp > 0 THEN (1::BIGINT << p) ELSE 0 END) AS s
  FROM dots GROUP BY vec_id, t
), cand AS (
  SELECT qs.vec_id AS query_id, vs.vec_id
  FROM sig qs JOIN sig vs ON qs.t = vs.t
  WHERE qs.vec_id < {num_queries} AND vs.vec_id <> qs.vec_id
    AND bit_count(xor(CAST(qs.s AS UBIGINT), CAST(vs.s AS UBIGINT))) <= 1
  GROUP BY qs.vec_id, vs.vec_id
), v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
), scored AS (
  SELECT c.query_id, c.vec_id,
         CAST(floor(list_cosine_similarity(q.e, w.e) * 1000000) AS BIGINT) AS simq
  FROM cand c JOIN v q ON q.vec_id = c.query_id JOIN v w ON w.vec_id = c.vec_id
), ranked AS (
  SELECT query_id, vec_id, simq,
         row_number() OVER (PARTITION BY query_id ORDER BY simq DESC, vec_id) AS rank
  FROM scored
)
SELECT query_id, vec_id, simq, rank FROM ranked WHERE rank <= {k}
ORDER BY query_id, rank
""".strip()


def sql_sim_threshold_lsh(tau_q: int = 400_000, num_tables: int = 12,
                          planes_per_table: int = 4, seed: int = 11,
                          dim: int = 64) -> str:
    """Banded-LSH threshold-join oracle — exact dual of
    ``stages/similarity.py::sim_threshold_lsh`` (integer-quantized
    planes, same graduation as sql_ann_lsh): candidates are pairs whose
    per-table integer sign signatures collide in ANY table, verified with
    sim_threshold's hash-matched floor(10⁶·cos) ≥ tau_q."""
    from ..stages.dedup import lsh_planes_q

    planes = lsh_planes_q(dim, num_tables * planes_per_table, seed)
    vals = ", ".join(
        f"({d}, {c // planes_per_table}, {c % planes_per_table}, {int(planes[d, c])})"
        for d in range(dim) for c in range(num_tables * planes_per_table)
    )
    return f"""
WITH qv AS MATERIALIZED (
  SELECT vec_id, unnest(range(len(embedding))) AS d,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT) AS v
  FROM embeddings
), planes(d, t, p, w) AS (VALUES {vals}),
dots AS (
  SELECT q.vec_id, pl.t, pl.p, sum(q.v * pl.w) AS dp
  FROM qv q JOIN planes pl USING (d) GROUP BY q.vec_id, pl.t, pl.p
), sig AS MATERIALIZED (
  SELECT vec_id, t,
         sum(CASE WHEN dp > 0 THEN (1::BIGINT << p) ELSE 0 END) AS s
  FROM dots GROUP BY vec_id, t
), cand AS (
  SELECT x.vec_id AS a, y.vec_id AS b
  FROM sig x JOIN sig y ON x.t = y.t AND x.s = y.s AND x.vec_id < y.vec_id
  GROUP BY x.vec_id, y.vec_id
), v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
)
SELECT c.a, c.b,
       CAST(floor(list_cosine_similarity(va.e, vb.e) * 1000000) AS BIGINT) AS simq
FROM cand c JOIN v va ON va.vec_id = c.a JOIN v vb ON vb.vec_id = c.b
WHERE floor(list_cosine_similarity(va.e, vb.e) * 1000000) >= {tau_q}
ORDER BY c.a, c.b
""".strip()


def sql_sim_threshold(tau_q: int = 400_000) -> str:
    return f"""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
)
SELECT a.vec_id AS a, b.vec_id AS b,
       CAST(floor(list_cosine_similarity(a.e, b.e) * 1000000) AS BIGINT) AS simq
FROM v a JOIN v b ON a.vec_id < b.vec_id
WHERE floor(list_cosine_similarity(a.e, b.e) * 1000000) >= {tau_q}
ORDER BY 1, 2
""".strip()


def sql_multimodal_features() -> str:
    """Integer byte-histogram oracle — exact dual of
    ``docops.q_multimodal_features``: the payload body is the sha256
    digest tiled to w·h·3 bytes, so digest byte j appears
    ``nbytes // 32 + (j < nbytes % 32)`` times; bin = byte // 16; bins
    with no mass still emit a 0 row (the numpy histogram does)."""
    return """
WITH meta AS (
  SELECT doc_id, 16 + (doc_id % 48) AS w, 16 + (doc_id % 32) AS h,
         sha256(text) AS hx
  FROM documents
), m2 AS (SELECT doc_id, w, h, w * h * 3 AS nb, hx FROM meta),
dig AS (
  SELECT doc_id, nb,
         ('0x' || substr(hx, 2 * j + 1, 2))::BIGINT // 16 AS bin,
         nb // 32 + CASE WHEN j < nb % 32 THEN 1 ELSE 0 END AS wgt
  FROM m2, unnest(generate_series(0, 31)) t(j)
), cnt AS (
  SELECT doc_id, bin, sum(wgt) AS n FROM dig GROUP BY doc_id, bin
)
SELECT m.doc_id, CAST(m.w AS INTEGER) AS width, CAST(m.h AS INTEGER) AS height,
       b.b AS bin, CAST(coalesce(c.n, 0) AS BIGINT) AS n
FROM m2 m
CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS b) b
LEFT JOIN cnt c ON c.doc_id = m.doc_id AND c.bin = b.b
ORDER BY m.doc_id, b.b
""".strip()


def sql_multimodal_curate() -> str:
    """Media-curation-capstone oracle — composes the three byte-exact
    media renderings this module already ships: `_phash_ctes` (dup =
    not the min-doc representative of the aHash cluster), the scene-cut
    census (static = 0 cuts), and the VAD census (silent = 0 active
    windows); keep = none fire."""
    from ..stages.multimodal import (
        SCENE_CUT_TAU_MILLI,
        VAD_TAU_MEANSQ,
        VAD_WINDOW,
        VIDEO_MAX_FRAMES,
    )

    W = VAD_WINDOW
    return f"""
WITH {_phash_ctes()},
dup AS (
  SELECT p.doc_id,
         CASE WHEN p.doc_id = min(p.doc_id) OVER (PARTITION BY p.phash)
              THEN 0 ELSE 1 END AS dup_image
  FROM ph p
),
vid AS (
  SELECT doc_id,
         (8 + doc_id % 24) * (8 + doc_id % 16) * 3 AS fl,
         1 + doc_id % {VIDEO_MAX_FRAMES} AS nf,
         sha256(text) AS hx
  FROM documents
), vdig AS MATERIALIZED (
  SELECT doc_id, j, ('0x' || substr(hx, 2 * j + 1, 2))::BIGINT AS b
  FROM vid, unnest(generate_series(0, 31)) t(j)
), bounds AS (
  SELECT doc_id, fl, f
  FROM vid, unnest(generate_series(1, nf - 1)) t(f)
  WHERE nf >= 2
), diffs AS (
  SELECT bo.doc_id, bo.f, bo.fl, sum(abs(d1.b - d2.b)) AS s
  FROM bounds bo, unnest(generate_series(0, bo.fl - 1)) t(i)
  JOIN vdig d1 ON d1.doc_id = bo.doc_id AND d1.j = ((bo.f - 1) * bo.fl + i) % 32
  JOIN vdig d2 ON d2.doc_id = bo.doc_id AND d2.j = (bo.f * bo.fl + i) % 32
  GROUP BY bo.doc_id, bo.f, bo.fl
), cut_census AS (
  SELECT doc_id,
         count(*) FILTER (1000 * s >= {SCENE_CUT_TAU_MILLI} * fl) AS n_cuts
  FROM diffs GROUP BY doc_id
),
au AS (
  SELECT doc_id, 256 + doc_id % 4096 AS n, sha256(text) AS hx FROM documents
), adig AS MATERIALIZED (
  SELECT doc_id, j, ('0x' || substr(hx, 2 * j + 1, 2))::BIGINT AS b
  FROM au, unnest(generate_series(0, 31)) t(j)
), smp AS (
  SELECT m.doc_id, t.s // {W} AS w,
         CASE WHEN d1.b + 256 * d2.b >= 32768
              THEN d1.b + 256 * d2.b - 65536
              ELSE d1.b + 256 * d2.b END AS x
  FROM au m, unnest(generate_series(0, m.n - 1)) t(s)
  JOIN adig d1 ON d1.doc_id = m.doc_id AND d1.j = (2 * t.s) % 32
  JOIN adig d2 ON d2.doc_id = m.doc_id AND d2.j = (2 * t.s + 1) % 32
), win AS (
  SELECT doc_id, w, sum(x * x) AS e FROM smp GROUP BY doc_id, w
), vad_census AS (
  SELECT doc_id, count(*) AS n_active
  FROM win WHERE e >= {VAD_TAU_MEANSQ}::BIGINT * {W} GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(du.dup_image AS BIGINT) AS dup_image,
       CAST(CASE WHEN coalesce(cc.n_cuts, 0) = 0 THEN 1 ELSE 0 END AS BIGINT)
         AS static_video,
       CAST(CASE WHEN coalesce(vc.n_active, 0) = 0 THEN 1 ELSE 0 END AS BIGINT)
         AS silent_audio,
       CAST(CASE WHEN du.dup_image = 0 AND coalesce(cc.n_cuts, 0) > 0
                  AND coalesce(vc.n_active, 0) > 0 THEN 1 ELSE 0 END AS BIGINT)
         AS keep
FROM documents d
JOIN dup du USING (doc_id)
LEFT JOIN cut_census cc USING (doc_id)
LEFT JOIN vad_census vc USING (doc_id)
ORDER BY d.doc_id
""".strip()


def sql_multimodal_dims() -> str:
    # width/height are pure functions of doc_id (FakePayloadCodec.encode)
    return """
SELECT doc_id,
       CAST(16 + (doc_id % 48) AS INTEGER) AS width,
       CAST(16 + (doc_id % 32) AS INTEGER) AS height
FROM documents ORDER BY doc_id
""".strip()


def sql_multimodal_resize() -> str:
    # Mirror of FakePayloadCodec.encode dims + resize_nearest integer math
    from ..stages.multimodal import RESIZE_MAX_SIDE as S

    return f"""
WITH dims AS (
  SELECT doc_id, 16 + (doc_id % 48) AS w, 16 + (doc_id % 32) AS h
  FROM documents
), scaled AS (
  SELECT doc_id, w, h,
    CASE WHEN greatest(w, h) <= {S} THEN w
         ELSE greatest(1, (w * {S}) // greatest(w, h)) END AS ow,
    CASE WHEN greatest(w, h) <= {S} THEN h
         ELSE greatest(1, (h * {S}) // greatest(w, h)) END AS oh
  FROM dims
)
SELECT doc_id,
       CAST(w AS INTEGER) AS in_width, CAST(h AS INTEGER) AS in_height,
       CAST(ow AS INTEGER) AS out_width, CAST(oh AS INTEGER) AS out_height,
       8 + ow * oh * 3 AS payload_bytes
FROM scaled ORDER BY doc_id
""".strip()


def sql_multimodal_frames() -> str:
    # Mirror of FakePayloadCodec.encode_video + VideoFrameSampler stride
    from ..stages.multimodal import FRAME_STRIDE, VIDEO_MAX_FRAMES

    return f"""
SELECT doc_id,
  CAST(unnest(generate_series(0, (1 + doc_id % {VIDEO_MAX_FRAMES}) - 1,
                              {FRAME_STRIDE})) AS INTEGER) AS frame_idx,
  CAST(1 + doc_id % {VIDEO_MAX_FRAMES} AS INTEGER) AS n_frames,
  8 + (8 + doc_id % 24) * (8 + doc_id % 16) * 3 AS frame_bytes
FROM documents ORDER BY doc_id, frame_idx
""".strip()


def sql_multimodal_scene_cuts() -> str:
    """Shot-boundary-census oracle — exact dual of
    ``stages/multimodal.py::SceneCutDetector`` over the synthetic video
    corpus: the payload body is the sha256(text) digest tiled to
    n_frames×frame_len, so frame byte (f, i) = digest[(f·fl + i) % 32];
    the oracle regenerates every boundary byte pair, sums |b1−b2| in
    exact integers, and mirrors the division-free cut test
    ``1000·sum ≥ tau·fl``. Docs whose frame_len ≡ 0 (mod 32) tile
    identically → 0 cuts; the rest sit near the uniform-pair mean
    (≈85/byte) — the two regimes the threshold separates."""
    from ..stages.multimodal import SCENE_CUT_TAU_MILLI, VIDEO_MAX_FRAMES

    return f"""
WITH vid AS (
  SELECT doc_id,
         (8 + doc_id % 24) * (8 + doc_id % 16) * 3 AS fl,
         1 + doc_id % {VIDEO_MAX_FRAMES} AS nf,
         sha256(text) AS hx
  FROM documents
), dig AS MATERIALIZED (
  SELECT doc_id, j, ('0x' || substr(hx, 2 * j + 1, 2))::BIGINT AS b
  FROM vid, unnest(generate_series(0, 31)) t(j)
), bounds AS (
  SELECT doc_id, fl, f
  FROM vid, unnest(generate_series(1, nf - 1)) t(f)
  WHERE nf >= 2
), diffs AS (
  SELECT bo.doc_id, bo.f, bo.fl, sum(abs(d1.b - d2.b)) AS s
  FROM bounds bo, unnest(generate_series(0, bo.fl - 1)) t(i)
  JOIN dig d1 ON d1.doc_id = bo.doc_id AND d1.j = ((bo.f - 1) * bo.fl + i) % 32
  JOIN dig d2 ON d2.doc_id = bo.doc_id AND d2.j = (bo.f * bo.fl + i) % 32
  GROUP BY bo.doc_id, bo.f, bo.fl
), census AS (
  SELECT doc_id,
         count(*) FILTER (1000 * s >= {SCENE_CUT_TAU_MILLI} * fl) AS n_cuts,
         max(1000 * s // fl) AS max_diff_milli
  FROM diffs GROUP BY doc_id
)
SELECT v.doc_id, CAST(v.nf AS BIGINT) AS n_frames,
       CAST(coalesce(c.n_cuts, 0) AS BIGINT) AS n_cuts,
       CAST(coalesce(c.max_diff_milli, 0) AS BIGINT) AS max_diff_milli
FROM vid v LEFT JOIN census c USING (doc_id)
ORDER BY v.doc_id
""".strip()


def _wmul64(expr: str, mult: int) -> str:
    """Wrapping 64-bit multiply ``(expr · mult) mod 2⁶⁴`` without INT128
    overflow (the full product of two ~2⁶⁴ values exceeds HUGEINT):
    split the multiplicand at 32 bits — every intermediate ≤ 2⁹⁶."""
    TWO64, TWO32 = 1 << 64, 1 << 32
    return (f"CAST(((((({expr}) >> 32)::HUGEINT * {mult}) % {TWO32}) * {TWO32}"
            f" + ((({expr}) % {TWO32}::UBIGINT)::HUGEINT * {mult})) % {TWO64}"
            f" AS UBIGINT)")


def sql_rel_approx_distinct(p: int = 14) -> str:
    """HyperLogLog oracle — exact dual of
    ``stages/skew.py::approx_distinct``, graduating the last sketch from
    rows-only: pandas' int64 hash is the splitmix64 FINALIZER (two
    xor-shifts around two wrapping multiplies — verified value-equal in
    test), rendered with `_wmul64`; register j = top p bits, rho = 1 +
    clz of the low 64−p bits left-aligned (``low·2^p`` never wraps, so
    no overflowing shift), clz via a 64-row msb powers table. The
    estimator is the same float expression on both sides — every 2^−rho
    term is an exact dyadic and the single scalar ln() in the
    linear-counting branch hits the same libm; deterministic on the
    fixed corpus (the phash-oracle determinism argument)."""
    M1, M2 = 0xBF58476D1CE4E5B9, 0x94D049BB133111EB
    m = 1 << p
    maxrho = 64 - p + 1
    pw = ", ".join(f"({e}, {1 << e}::UBIGINT)" for e in range(64))
    return f"""
WITH vals AS (SELECT DISTINCT CAST(l_orderkey AS UBIGINT) AS x FROM lineitem),
h1 AS (SELECT {_wmul64('xor(x, x >> 30)', M1)} AS a FROM vals),
h2 AS (SELECT {_wmul64('xor(a, a >> 27)', M2)} AS a FROM h1),
h AS (SELECT xor(a, a >> 31) AS a FROM h2),
parts AS (
  SELECT CAST(a >> {64 - p} AS BIGINT) AS j,
         (a % {1 << (64 - p)}::UBIGINT) * {1 << p}::UBIGINT AS rest
  FROM h
),
pw(e, v) AS (VALUES {pw}),
rho AS (
  SELECT p2.j,
         CASE WHEN p2.rest = 0::UBIGINT THEN {maxrho}
              ELSE 64 - (SELECT max(e) FROM pw WHERE pw.v <= p2.rest) END AS r
  FROM parts p2
),
regs AS (SELECT j, max(r) AS r FROM rho GROUP BY j),
agg AS (
  -- EXACT integer harmonic numerator S = Σ 2^(R−rho): absent registers
  -- (rho 0) contribute 2^R each; ONE int→double conversion of S is the
  -- only rounding, mirroring hll_estimate — a float Σ of 2^−rho terms
  -- would be summation-order-dependent past rho ≈ 39
  SELECT count(*) AS npres,
         sum(CAST(p3.v AS HUGEINT)) AS s_present
  FROM regs JOIN pw p3 ON p3.e = {maxrho} - regs.r
),
est AS (
  SELECT (0.7213 / (1 + 1.079 / {m}.0)) * {m}.0 * {m}.0
         / (CAST(s_present + ({m} - npres) * CAST({1 << maxrho} AS HUGEINT)
                 AS DOUBLE) / {float(1 << maxrho)}) AS raw,
         {m} - npres AS zeros
  FROM agg
)
SELECT CAST(round(CASE WHEN raw <= 2.5 * {m} AND zeros > 0
                       THEN {m}.0 * ln({m}.0 / zeros)
                       ELSE raw END) AS BIGINT) AS approx_distinct_orders
FROM est
""".strip()


def sql_rel_quantiles() -> str:
    return """
SELECT quantile_disc(c, 0.5) AS p50,
       quantile_disc(c, 0.95) AS p95,
       quantile_disc(c, 0.99) AS p99
FROM (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS c FROM lineitem)
""".strip()


def sql_rel_lineitem_agg() -> str:
    return """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
       count(*) AS n
FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2
""".strip()


def sql_rel_join_revenue() -> str:
    return """
SELECT n.n_name,
       CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
       count(*) AS n_orders
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY 1 ORDER BY 1
""".strip()


def sql_rel_events_window() -> str:
    return """
SELECT user_id, CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS window_start,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents,
       count(*) AS n_events
FROM events GROUP BY 1, 2 ORDER BY 1, 2
""".strip()


def sql_rel_heavy_hitters() -> str:
    return """
SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_orders
FROM lineitem GROUP BY l_partkey
ORDER BY n_orders DESC, l_partkey LIMIT 10
""".strip()


def sql_rel_topk_parts() -> str:
    return """
SELECT p_partkey, p_name, CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents
FROM part ORDER BY price_cents DESC, p_partkey LIMIT 10
""".strip()


def sql_rel_distinct_segments() -> str:
    return "SELECT DISTINCT c_mktsegment FROM customer ORDER BY 1"


def sql_rel_sample() -> str:
    from .docops import SAMPLE_MOD, SAMPLE_MULT, SAMPLE_RATE_NUM

    return f"""
SELECT o_orderkey,
       CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
       (o_orderkey * {SAMPLE_MULT}) % {SAMPLE_MOD} AS sample_hash
FROM orders
WHERE (o_orderkey * {SAMPLE_MULT}) % {SAMPLE_MOD} < {SAMPLE_RATE_NUM}
ORDER BY o_orderkey
""".strip()


def sql_rel_shuffle_join() -> str:
    return """
SELECT o.o_orderpriority,
       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents,
       count(*) AS n_lineitems
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY 1 ORDER BY 1
""".strip()


def sql_rel_group_quantiles() -> str:
    return """
SELECT user_id,
       quantile_disc(c, 0.5) AS p50_cents,
       quantile_disc(c, 0.95) AS p95_cents
FROM (SELECT user_id, CAST(round(value * 100) AS BIGINT) AS c FROM events)
GROUP BY user_id ORDER BY user_id
""".strip()


def sql_rel_stratified_sample() -> str:
    from .docops import SAMPLE_MOD, SAMPLE_MULT, STRAT_K

    return f"""
SELECT c_mktsegment, c_custkey,
       (c_custkey * {SAMPLE_MULT}) % {SAMPLE_MOD} AS sample_hash
FROM customer
QUALIFY row_number() OVER (
  PARTITION BY c_mktsegment
  ORDER BY (c_custkey * {SAMPLE_MULT}) % {SAMPLE_MOD}, c_custkey
) <= {STRAT_K}
ORDER BY c_mktsegment, c_custkey
""".strip()


def sql_text_unigram_logprob() -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{_TOK}')) AS tok
  FROM documents
), vocab AS (
  SELECT tok, count(*) AS n FROM toks GROUP BY tok
), tot AS (
  SELECT CAST(sum(n) AS DOUBLE) AS N FROM vocab
), scored AS (
  SELECT t.doc_id, count(*) AS n_tokens,
         sum(CAST(floor(1000000 * (ln(CAST(v.n AS DOUBLE)) - ln((SELECT N FROM tot))))
                  AS BIGINT)) AS lp
  FROM toks t JOIN vocab v USING (tok) GROUP BY t.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(s.n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(coalesce(s.lp, 0) AS BIGINT) AS logprob_q
FROM documents d LEFT JOIN scored s USING (doc_id)
ORDER BY d.doc_id
""".strip()


def _minhash_cand_ctes(num_perm: int, bands: int) -> str:
    """Shared CTE chain: sha token hashes → HUGEINT permutation replay →
    (band, r-chunk) candidate pairs → per-pair intersection/sizes. Used by
    sql_dedup_minhash (clusters) and sql_jaccard_pairs_lsh (pairs)."""
    from ..stages.dedup import MERSENNE, _perm_params

    pa_, pb_ = _perm_params(num_perm)
    perms = ", ".join(
        f"({k}, CAST({int(pa_[k])} AS HUGEINT), CAST({int(pb_[k])} AS HUGEINT))"
        for k in range(num_perm)
    )
    r = num_perm // bands
    two64 = 1 << 64
    return f"""toks AS (
  SELECT doc_id, unnest(list_distinct(regexp_extract_all(lower(text), '{_TOK}'))) AS tok
  FROM documents
), th AS (
  SELECT DISTINCT doc_id, ('0x' || substr(sha256(tok), 1, 16))::UBIGINT AS h
  FROM toks
), perms(k, pa, pb) AS (VALUES {perms}),
mh0 AS (
  SELECT t.doc_id, p.k,
         min(((p.pa * CAST(t.h AS HUGEINT)) % {two64} + p.pb)
             % {two64} % {MERSENNE}) AS v
  FROM th t CROSS JOIN perms p GROUP BY t.doc_id, p.k
), mh AS (
  SELECT d.doc_id, p.k, coalesce(m.v, {MERSENNE}) AS v
  FROM documents d CROSS JOIN perms p
  LEFT JOIN mh0 m ON m.doc_id = d.doc_id AND m.k = p.k
), bandstr AS (
  SELECT doc_id, k // {r} AS bi,
         string_agg(CAST(v AS VARCHAR), ',' ORDER BY k) AS bs
  FROM mh GROUP BY doc_id, k // {r}
), cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM bandstr x JOIN bandstr y ON x.bi = y.bi AND x.bs = y.bs
                                AND x.doc_id < y.doc_id
), sizes AS (SELECT doc_id, count(*) AS n FROM th GROUP BY doc_id),
inter AS (
  SELECT c.a, c.b, count(*) AS i
  FROM cand c JOIN th ta ON ta.doc_id = c.a
              JOIN th tb ON tb.doc_id = c.b AND tb.h = ta.h
  GROUP BY c.a, c.b
)"""


def sql_jaccard_pairs_lsh(num_perm: int = 64, bands: int = 16) -> str:
    """LSH-candidate verified-pair oracle — sql_dedup_minhash's candidate
    chain with the pair projection instead of clustering: keep tau=0.8 as
    the exact-integer ``5·inter ≥ 4·union`` (the float compare against
    0.8 cannot flip — rationals near 4/5 are ≥ 1/(5·union) apart, far
    above ulp), jacq replays the engine's two float ops verbatim
    (correctly-rounded i/u then ×10⁶, truncated). Moves jaccard_pairs_lsh
    from rows-only to hash-checked."""
    return f"""
WITH {_minhash_cand_ctes(num_perm, bands)}
SELECT c.a, c.b,
  CAST(CASE WHEN coalesce(sa.n, 0) + coalesce(sb.n, 0) = 0 THEN 1000000
       ELSE floor((CAST(coalesce(i.i, 0) AS DOUBLE)
                   / (coalesce(sa.n, 0) + coalesce(sb.n, 0)
                      - coalesce(i.i, 0))) * 1000000) END AS BIGINT) AS jacq
FROM cand c
LEFT JOIN sizes sa ON sa.doc_id = c.a
LEFT JOIN sizes sb ON sb.doc_id = c.b
LEFT JOIN inter i ON i.a = c.a AND i.b = c.b
WHERE coalesce(sa.n, 0) + coalesce(sb.n, 0) = 0
   OR 5 * coalesce(i.i, 0)
      >= 4 * (coalesce(sa.n, 0) + coalesce(sb.n, 0) - coalesce(i.i, 0))
ORDER BY c.a, c.b
""".strip()


def _min_label_cc_ctes(rounds: int = 16) -> str:
    """Connected components over a ``symp`` (symmetrized-edges) CTE as an
    UNROLLED iterated min-label chain — replaces the reachability-closure
    recursive CTE (round-3 ADVICE): the closure materializes O(k²) rows
    per near-dup cluster, while this keeps ONE (node, current-min) row per
    node per round, exactly mirroring the engine's label-propagation
    fixpoint (`stages/dedup.py::_cc_labels`).

    Each round relaxes against (a) the neighbors' labels and (b) the
    label OF the current label (pointer jumping), so convergence is
    O(log diameter) rounds — 16 covers diameter 2¹⁶, far beyond any
    corpus this oracle will see; under-convergence can only surface as a
    hash MISMATCH vs the engine, never a silent pass. Emits
    ``lab(n, cluster_id)``; nodes without a verified edge are absent
    (callers coalesce to the singleton id). Every round CTE is
    ``MATERIALIZED``: each references its predecessor three times, and
    DuckDB's default inlining would expand the chain to 3^rounds copies
    of lab0 (observed as an fd explosion)."""
    parts = [
        "nodes AS (SELECT DISTINCT a AS n FROM symp)",
        "lab0 AS MATERIALIZED (SELECT x.n, least(x.n, min(s.b)) AS l"
        " FROM nodes x JOIN symp s ON s.a = x.n GROUP BY x.n)",
    ]
    for r in range(rounds):
        parts.append(
            f"lab{r + 1} AS MATERIALIZED (\n"
            f"  SELECT g.n,\n"
            f"         least(min(g.l), coalesce(min(nl.l), min(g.l)),\n"
            f"               coalesce(min(pl.l), min(g.l))) AS l\n"
            f"  FROM lab{r} g\n"
            f"  LEFT JOIN symp s ON s.a = g.n\n"
            f"  LEFT JOIN lab{r} nl ON nl.n = s.b\n"
            f"  LEFT JOIN lab{r} pl ON pl.n = g.l\n"
            f"  GROUP BY g.n)"
        )
    parts.append(f"lab AS (SELECT n, l AS cluster_id FROM lab{rounds})")
    return ",\n".join(parts)


def sql_dedup_embedding(tau_pct: int = 45, num_planes: int = 8, seed: int = 11,
                        dim: int = 64) -> str:
    """Hyperplane-LSH embedding-dedup oracle — the exact dual of
    ``stages/dedup.py::dedup_embedding`` now that the planes are
    integer-quantized (round-3 VERDICT item 4): the d×planes int64 plane
    matrix is INJECTED as literals (the minhash (a,b)-array trick), so
    bucket assignment is an exact integer sign test in both engines;
    verification replays semdedup's exact algebra in HUGEINT
    (``dot > 0 ∧ 10⁴·dot² ≥ tau_pct²·|a|²·|b|²`` — dot² ≤ ~7·10²⁴ and
    the norm product ≤ ~7·10²⁴ both sit far inside HUGEINT); clusters
    via the unrolled min-label propagation. ``dim`` pins the corpus
    embedding width (64 for the test tables, cf. top_component_sql)."""
    from ..stages.dedup import lsh_planes_q

    planes = lsh_planes_q(dim, num_planes, seed)
    vals = ", ".join(
        f"({d}, {p}, {int(planes[d, p])})"
        for d in range(dim) for p in range(num_planes)
    )
    t2 = tau_pct * tau_pct
    return f"""
WITH qv AS MATERIALIZED (
  SELECT vec_id, unnest(range(len(embedding))) AS d,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT) AS v
  FROM embeddings
), planes(d, p, w) AS (VALUES {vals}),
dots AS (
  SELECT q.vec_id, pl.p, sum(q.v * pl.w) AS dp
  FROM qv q JOIN planes pl USING (d) GROUP BY q.vec_id, pl.p
), sig AS MATERIALIZED (
  SELECT vec_id,
         sum(CASE WHEN dp > 0 THEN (1::BIGINT << p) ELSE 0 END) AS bucket
  FROM dots GROUP BY vec_id
), n2 AS MATERIALIZED (
  SELECT vec_id, sum(v * v) AS n2 FROM qv GROUP BY vec_id
), pairs AS (
  SELECT sa.vec_id AS a, sb.vec_id AS b
  FROM sig sa JOIN sig sb ON sa.bucket = sb.bucket AND sa.vec_id < sb.vec_id
), pdot AS (
  SELECT p.a, p.b, sum(x.v * y.v) AS dot
  FROM pairs p
  JOIN qv x ON x.vec_id = p.a
  JOIN qv y ON y.vec_id = p.b AND y.d = x.d
  GROUP BY p.a, p.b
), verified AS (
  SELECT pd2.a, pd2.b
  FROM pdot pd2
  JOIN n2 na ON na.vec_id = pd2.a
  JOIN n2 nb ON nb.vec_id = pd2.b
  WHERE pd2.dot > 0
    AND 10000 * CAST(pd2.dot AS HUGEINT) * CAST(pd2.dot AS HUGEINT)
        >= {t2} * CAST(na.n2 AS HUGEINT) * CAST(nb.n2 AS HUGEINT)
), symp AS MATERIALIZED (SELECT a, b FROM verified UNION SELECT b AS a, a AS b FROM verified),
{_min_label_cc_ctes()}
SELECT e.vec_id, CAST(coalesce(l.cluster_id, e.vec_id) AS BIGINT) AS cluster_id
FROM embeddings e LEFT JOIN lab l ON l.n = e.vec_id
ORDER BY e.vec_id
""".strip()


def sql_dedup_minhash(num_perm: int = 64, bands: int = 16) -> str:
    """MinHash-LSH near-dedup oracle — the exact dual of
    ``stages/dedup.py::dedup_minhash`` on this corpus: per-doc minhash
    values replay the engine's uint64-wrapping permutations in HUGEINT
    (``((a·h) % 2⁶⁴ + b) % 2⁶⁴ % MERSENNE`` — the (a, b) arrays are
    INJECTED as literals, so no RNG lives in SQL), token hashes are the
    shared sha256 lane parse, empty docs take the engine's all-MERSENNE
    signature via the coalesce fill. Candidates join on the EXACT
    (band, r-value-chunk) — equal to the engine's FNV band buckets except
    under a ~2⁻⁶⁴ cross-key collision, which this fixed corpus does not
    contain (same determinism argument as the phash-dedup oracle); a
    collision would only surface as a hash mismatch, never a silent pass.
    Verification mirrors exact Jaccard ≥ tau=0.5 as pure integers
    (``2·inter ≥ union``; the float quotient cannot round across 0.5 —
    adjacent rationals near ½ are ≥ 1/union² apart, far above ulp), with
    the both-empty ⇒ 1.0 convention. Clusters via the unrolled min-label
    propagation (`_min_label_cc_ctes` — linear rows per round, no O(k²)
    closure). Moves dedup_minhash from rows-only to hash-checked."""
    return f"""
WITH {_minhash_cand_ctes(num_perm, bands)}, verified AS (
  SELECT c.a, c.b
  FROM cand c
  LEFT JOIN sizes sa ON sa.doc_id = c.a
  LEFT JOIN sizes sb ON sb.doc_id = c.b
  LEFT JOIN inter i ON i.a = c.a AND i.b = c.b
  WHERE coalesce(sa.n, 0) + coalesce(sb.n, 0) = 0
     OR 2 * coalesce(i.i, 0)
        >= coalesce(sa.n, 0) + coalesce(sb.n, 0) - coalesce(i.i, 0)
), symp AS MATERIALIZED (SELECT a, b FROM verified UNION SELECT b AS a, a AS b FROM verified),
{_min_label_cc_ctes()}
SELECT d.doc_id, CAST(coalesce(l.cluster_id, d.doc_id) AS BIGINT) AS cluster_id
FROM documents d LEFT JOIN lab l ON l.n = d.doc_id
ORDER BY d.doc_id
""".strip()


def sql_dedup_simhash(max_hamming: int = 3) -> str:
    """SimHash near-dedup oracle — the EXACT dual of
    ``stages/dedup.py::dedup_simhash`` end to end: per-doc 64-bit SimHash
    from sha256 token hashes (same ('0x'||substr(sha256,1,16))::UBIGINT
    lane parse as sql_text_rolling_fp; bit j = sign of Σ(2·bit_j−1) over
    DISTINCT tokens, ties → 0, empty docs → signature 0), candidates via
    the identical 4×16-bit block pigeonhole, Hamming ≤ max_hamming verify
    via bit_count(xor(...)), then connected components by the unrolled
    min-label propagation (`_min_label_cc_ctes`) with cluster_id =
    component min — matching label_propagation's fixpoint.
    Singletons keep their own id. Moves dedup_simhash from rows-only to
    hash-checked (the banding is pigeonhole-EXACT at this radius, so the
    'approximate by construction' exemption never applied to simhash the
    way it does to MinHash)."""
    pow2 = ", ".join(f"({j}, CAST({1 << j} AS HUGEINT))" for j in range(64))
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(list_distinct(regexp_extract_all(lower(text), '{_TOK}'))) AS tok
  FROM documents
), th AS (
  SELECT doc_id, ('0x' || substr(sha256(tok), 1, 16))::UBIGINT AS h FROM toks
), pow2(j, p) AS (VALUES {pow2}),
bits AS (
  SELECT t.doc_id, p.j,
         sum(CASE WHEN (t.h >> p.j) & 1::UBIGINT = 1::UBIGINT
                  THEN 1 ELSE -1 END) AS v
  FROM th t CROSS JOIN pow2 p GROUP BY t.doc_id, p.j
), sig AS (
  SELECT b.doc_id,
         CAST(coalesce(sum(CASE WHEN b.v > 0 THEN p.p END), 0) AS UBIGINT) AS s
  FROM bits b JOIN pow2 p USING (j) GROUP BY b.doc_id
), sig0 AS (
  SELECT d.doc_id, coalesce(g.s, 0::UBIGINT) AS s
  FROM documents d LEFT JOIN sig g USING (doc_id)
), blk AS (
  SELECT doc_id, s, bi, (s >> (16 * bi)) & 65535::UBIGINT AS bval
  FROM sig0, unnest(generate_series(0, 3)) t(bi)
), simedges AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM blk x JOIN blk y ON x.bi = y.bi AND x.bval = y.bval
                        AND x.doc_id < y.doc_id
  WHERE bit_count(xor(x.s, y.s)) <= {max_hamming}
), symp AS MATERIALIZED (SELECT a, b FROM simedges UNION SELECT b AS a, a AS b FROM simedges),
{_min_label_cc_ctes()}
SELECT d.doc_id, CAST(coalesce(l.cluster_id, d.doc_id) AS BIGINT) AS cluster_id
FROM documents d LEFT JOIN lab l ON l.n = d.doc_id
ORDER BY d.doc_id
""".strip()


def sql_text_rolling_fp(window: int = 8) -> str:
    """Winnowing-fingerprint oracle — the EXACT dual of
    ``stages/text.py::rolling_fingerprint_batch``: per-token 31-bit lanes
    from sha256 (DuckDB's ``('0x'||substr(sha256(tok),1,16))::UBIGINT``
    is bit-equal to Python's big-endian first-8-bytes parse — verified in
    test), window hash Σ lane·B^(w−1−m) mod P per lane via an inline
    modpow lookup (w ≤ window, so the power table is constant-sized),
    combined (lane1·2³¹ + lane2 ≡ lane1<<31 | lane2 — lanes < 2³¹ so the
    OR is addition), min per doc; short docs use one full-length window,
    empty docs → 0. Moves text_rolling_fp from rows-only to hash-checked.
    """
    from ..stages.text import _FP_B1, _FP_B2, _FP_P

    pows = ", ".join(
        f"({e}, {pow(_FP_B1, e, _FP_P)}::HUGEINT, {pow(_FP_B2, e, _FP_P)}::HUGEINT)"
        for e in range(window)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{_TOK}') AS ts FROM documents
), pows(e, p1, p2) AS (VALUES {pows}),
wins AS (
  SELECT doc_id, i, {window} AS w, ts
  FROM toks, unnest(generate_series(1, len(ts) - {window} + 1)) t(i)
  WHERE len(ts) >= {window}
  UNION ALL
  SELECT doc_id, 1 AS i, len(ts) AS w, ts FROM toks
  WHERE len(ts) > 0 AND len(ts) < {window}
), terms AS (
  SELECT doc_id, i, w, m,
    ('0x' || substr(sha256(ts[i + m]), 1, 16))::UBIGINT % {_FP_P} AS l1,
    ('0x' || substr(sha256(ts[i + m]), 17, 16))::UBIGINT % {_FP_P} AS l2
  FROM wins, unnest(generate_series(0, w - 1)) tt(m)
), whash AS (
  SELECT t.doc_id, t.i,
    CAST(sum(CAST(t.l1 AS HUGEINT) * p.p1) % {_FP_P} AS BIGINT) AS lane1,
    CAST(sum(CAST(t.l2 AS HUGEINT) * p.p2) % {_FP_P} AS BIGINT) AS lane2
  FROM terms t JOIN pows p ON p.e = t.w - 1 - t.m
  GROUP BY t.doc_id, t.i
), perdoc AS (
  SELECT doc_id, min(lane1 * 2147483648 + lane2) AS fp FROM whash GROUP BY doc_id
)
SELECT d.doc_id, CAST(coalesce(p.fp, 0) AS BIGINT) AS rolling_fp
FROM documents d LEFT JOIN perdoc p USING (doc_id)
ORDER BY d.doc_id
""".strip()


def sql_text_readability() -> str:
    # Mirror of stages/text.py::readability_batch — Flesch coefficients
    # ×1000, all floor divisions over nonnegative ints.
    from ..stages.text import SENT_RE, SYL_RE

    return f"""
WITH sig AS (
  SELECT doc_id,
    len(regexp_extract_all(lower(text), '{_TOK}')) AS n_words,
    len(regexp_extract_all(text, '{SENT_RE.replace("'", "''")}')) AS n_sentences,
    len(regexp_extract_all(lower(text), '{SYL_RE}')) AS n_syllables
  FROM documents
)
SELECT doc_id,
  CAST(n_words AS BIGINT) AS n_words,
  CAST(n_sentences AS BIGINT) AS n_sentences,
  CAST(n_syllables AS BIGINT) AS n_syllables,
  CAST(206835 - (1015 * n_words) // greatest(n_sentences, 1)
             - (84600 * n_syllables) // greatest(n_words, 1) AS BIGINT) AS flesch_q
FROM sig ORDER BY doc_id
""".strip()


def sql_text_dsir() -> str:
    # Mirror of stages/text.py::text_dsir — add-one-smoothed target-vs-raw
    # unigram log-likelihood ratio, per-token quantities floor-quantized
    # BEFORE subtraction/summation (same ln/floor trust as unigram LM).
    from ..stages.text import DSIR_TARGET_LANG

    return f"""
WITH toks AS (
  SELECT doc_id, lang, unnest(regexp_extract_all(lower(text), '{_TOK}')) AS tok
  FROM documents
), vocab AS (
  SELECT tok, count(*) AS n_all,
         sum(CASE WHEN lang = '{DSIR_TARGET_LANG}' THEN 1 ELSE 0 END) AS n_tgt
  FROM toks GROUP BY tok
), consts AS (
  SELECT count(*) AS v_sz, sum(n_all) AS na, sum(n_tgt) AS nt FROM vocab
), delta AS (
  SELECT tok,
    CAST(floor(1000000 * (ln(CAST(n_tgt + 1 AS DOUBLE))
                          - ln(CAST(nt + v_sz AS DOUBLE)))) AS BIGINT)
  - CAST(floor(1000000 * (ln(CAST(n_all + 1 AS DOUBLE))
                          - ln(CAST(na + v_sz AS DOUBLE)))) AS BIGINT) AS dq
  FROM vocab, consts
), scored AS (
  SELECT t.doc_id, count(*) AS n_tokens, sum(d.dq) AS w
  FROM toks t JOIN delta d USING (tok) GROUP BY t.doc_id
)
SELECT d.doc_id,
  CAST(coalesce(s.n_tokens, 0) AS BIGINT) AS n_tokens,
  CAST(coalesce(s.w, 0) AS BIGINT) AS dsir_q
FROM documents d LEFT JOIN scored s USING (doc_id)
ORDER BY d.doc_id
""".strip()


def sql_text_repetition() -> str:
    from ..stages.text import REP_NGRAM as N

    return f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{_TOK}') AS ts FROM documents
), grams AS (
  SELECT doc_id, array_to_string(ts[i:i+{N - 1}], ' ') AS g
  FROM toks, unnest(generate_series(1, len(ts) - {N - 1})) AS t(i)
), per_doc AS (
  SELECT doc_id, count(*) AS n_ngrams,
         count(DISTINCT g) AS n_distinct,
         max(cnt) AS top_count
  FROM (SELECT doc_id, g, count(*) OVER (PARTITION BY doc_id, g) AS cnt FROM grams)
  GROUP BY doc_id
)
SELECT d.doc_id,
  CAST(coalesce(p.n_ngrams, 0) AS BIGINT) AS n_ngrams,
  CAST(coalesce(p.n_ngrams - p.n_distinct, 0) AS BIGINT) AS dup_ngrams,
  CAST(coalesce(p.n_ngrams - p.n_distinct, 0) AS DOUBLE)
    / greatest(coalesce(p.n_ngrams, 0), 1) AS dup_ratio,
  CAST(coalesce(p.top_count, 0) AS DOUBLE)
    / greatest(coalesce(p.n_ngrams, 0), 1) AS top_ngram_share
FROM documents d LEFT JOIN per_doc p USING (doc_id)
ORDER BY d.doc_id
""".strip()


def sql_text_shard_pack() -> str:
    from ..stages.text import SHARD_TOKEN_BUDGET

    return f"""
WITH counted AS (
  SELECT doc_id, len(regexp_extract_all(lower(text), '{_TOK}')) AS n_tokens
  FROM documents
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST((sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
             - n_tokens) // {SHARD_TOKEN_BUDGET} AS BIGINT) AS shard_id
FROM counted ORDER BY doc_id
""".strip()


def sql_rel_sessions(gap_minutes: int = 30) -> str:
    return f"""
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL {gap_minutes} MINUTE
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
), numbered AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
)
SELECT user_id,
       CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start,
       count(*) AS n_events
FROM numbered GROUP BY user_id, sid ORDER BY user_id, session_start
""".strip()


def sql_rel_ols() -> str:
    return """
WITH base AS (
  SELECT l_returnflag, l_linestatus,
         CAST(round(l_quantity) AS BIGINT) AS x,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS y
  FROM lineitem
), m AS (
  SELECT l_returnflag, l_linestatus, count(*) AS n,
         sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sxx
  FROM base GROUP BY 1, 2
), f AS (
  SELECT l_returnflag, l_linestatus, n,
         CAST(n * sxy - sx * sy AS DOUBLE)
           / CAST(n * sxx - sx * sx AS DOUBLE) AS slope,
         sx, sy
  FROM m
)
SELECT l_returnflag, l_linestatus, CAST(n AS BIGINT) AS n,
       CAST(floor(1000000 * slope) AS BIGINT) AS slope_q,
       CAST(floor(1000000 * ((CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE))
                             / CAST(n AS DOUBLE))) AS BIGINT) AS intercept_q
FROM f ORDER BY l_returnflag, l_linestatus
""".strip()


def sql_rel_grouping_sets() -> str:
    return """
WITH base AS (
  SELECT o_orderstatus, o_orderpriority,
         CAST(year(o_orderdate) AS BIGINT) AS o_year,
         CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
  FROM orders
)
SELECT CAST(1 AS BIGINT) AS gset, o_orderstatus, o_orderpriority,
       CAST(-1 AS BIGINT) AS o_year,
       CAST(sum(price_cents) AS BIGINT) AS price_cents,
       CAST(count(*) AS BIGINT) AS n
FROM base GROUP BY o_orderstatus, o_orderpriority
UNION ALL
SELECT 2, '', o_orderpriority, o_year,
       CAST(sum(price_cents) AS BIGINT), count(*)
FROM base GROUP BY o_orderpriority, o_year
UNION ALL
SELECT 3, o_orderstatus, '', -1,
       CAST(sum(price_cents) AS BIGINT), count(*)
FROM base GROUP BY o_orderstatus
ORDER BY gset, o_orderstatus, o_orderpriority, o_year
""".strip()


def sql_rel_chi2() -> str:
    return """
WITH c AS (
  SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS n
  FROM orders GROUP BY 1, 2
), m AS (SELECT o_orderstatus, sum(n) AS row_t FROM c GROUP BY 1),
   p AS (SELECT o_orderpriority, sum(n) AS col_t FROM c GROUP BY 1),
   t AS (SELECT sum(n) AS total FROM c),
   e AS (
  SELECT c.o_orderstatus, c.o_orderpriority, c.n,
         (CAST(m.row_t AS DOUBLE) * CAST(p.col_t AS DOUBLE))
           / CAST(t.total AS DOUBLE) AS exp
  FROM c JOIN m USING (o_orderstatus)
         JOIN p USING (o_orderpriority)
         CROSS JOIN t
)
SELECT o_orderstatus, o_orderpriority, n,
       CAST(floor(1000000 * exp) AS BIGINT) AS exp_q,
       CAST(floor(1000000 * ((CAST(n AS DOUBLE) - exp)
                             * (CAST(n AS DOUBLE) - exp) / exp)) AS BIGINT)
         AS contrib_q
FROM e ORDER BY o_orderstatus, o_orderpriority
""".strip()


def sql_rel_coverage(window_s: int = 300) -> str:
    return f"""
WITH e AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS s FROM events
), iv AS (SELECT user_id, s, s + {window_s} AS e FROM e),
m AS (
  SELECT *, max(e) OVER (PARTITION BY user_id ORDER BY s, e
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
            AS prev_max
  FROM iv
), isl AS (
  SELECT *, sum(CASE WHEN prev_max IS NULL OR s > prev_max THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id ORDER BY s, e
                    ROWS UNBOUNDED PRECEDING) AS island
  FROM m
), agg AS (
  SELECT user_id, island, max(e) - min(s) AS len, count(*) AS n
  FROM isl GROUP BY 1, 2
)
SELECT user_id, CAST(sum(len) AS BIGINT) AS covered_s,
       CAST(count(*) AS BIGINT) AS n_intervals,
       CAST(sum(n) AS BIGINT) AS n_events
FROM agg GROUP BY 1 ORDER BY 1
""".strip()


def sql_rel_latest() -> str:
    return """
WITH e AS (
  SELECT event_id, user_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
         CAST(round(value * 100) AS BIGINT) AS value_cents
  FROM events
), r AS (
  SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                               ORDER BY ts_s DESC, event_id DESC) AS rk
  FROM e
)
SELECT user_id, event_type, event_id, ts_s, value_cents
FROM r WHERE rk = 1 ORDER BY user_id, event_type
""".strip()


def sql_text_boilerplate() -> str:
    from ..stages.text import BOILERPLATE_MIN_DOCS

    return f"""
WITH nl AS (
  SELECT doc_id, line
  FROM (SELECT doc_id, unnest(string_split(text, chr(10))) AS line
        FROM documents)
  WHERE trim(line) <> ''
),
dfl AS (SELECT line, count(DISTINCT doc_id) AS df FROM nl GROUP BY 1),
per AS (
  SELECT doc_id, count(*) AS n_lines,
         count(*) FILTER (WHERE line IN
           (SELECT line FROM dfl WHERE df >= {BOILERPLATE_MIN_DOCS}))
           AS n_boilerplate
  FROM nl GROUP BY 1
)
SELECT d.doc_id,
       CAST(coalesce(p.n_lines, 0) AS BIGINT) AS n_lines,
       CAST(coalesce(p.n_boilerplate, 0) AS BIGINT) AS n_boilerplate,
       CAST((1000000 * coalesce(p.n_boilerplate, 0))
            // greatest(coalesce(p.n_lines, 0), 1) AS BIGINT)
         AS boiler_ratio_q
FROM documents d LEFT JOIN per p USING (doc_id)
ORDER BY d.doc_id
""".strip()


def sql_rel_calendar_profile() -> str:
    return """
SELECT CAST(isodow(ts) AS BIGINT) AS dow,
       CAST(hour(ts) AS BIGINT) AS hour,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
FROM events GROUP BY 1, 2 ORDER BY 1, 2
""".strip()


def sql_rel_cusum() -> str:
    return """
WITH e AS (
  SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
), m AS (SELECT (1000000 * sum(cents)) // count(*) AS mean_s FROM e),
w AS (
  SELECT user_id, ts_s, event_id,
         sum(1000000 * cents - m.mean_s)
           OVER (PARTITION BY user_id ORDER BY ts_s, event_id
                 ROWS UNBOUNDED PRECEDING) AS s,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM e CROSS JOIN m
), r AS (
  SELECT *, row_number() OVER (PARTITION BY user_id
                               ORDER BY abs(s) DESC, ts_s, event_id) AS rk
  FROM w
)
SELECT user_id, CAST(ts_s AS BIGINT) AS peak_ts_s,
       CAST(s AS BIGINT) AS peak_cusum, CAST(n AS BIGINT) AS n_events
FROM r WHERE rk = 1 ORDER BY user_id
""".strip()


def sql_rel_scd2() -> str:
    return """
WITH e AS (
  SELECT event_id, user_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
  FROM events
), marked AS (
  SELECT *, CASE WHEN event_type = lag(event_type)
                      OVER (PARTITION BY user_id ORDER BY ts_s, event_id)
                 THEN 0 ELSE 1 END AS new_run
  FROM e
), runs AS (
  SELECT *, sum(new_run) OVER (PARTITION BY user_id ORDER BY ts_s, event_id
                               ROWS UNBOUNDED PRECEDING) AS run
  FROM marked
), agg AS (
  SELECT user_id, run, min(event_type) AS state,
         min(ts_s) AS valid_from, count(*) AS n_events
  FROM runs GROUP BY user_id, run
)
SELECT user_id, state,
       CAST(valid_from AS BIGINT) AS valid_from,
       CAST(coalesce(lead(valid_from) OVER (PARTITION BY user_id ORDER BY run),
                     -1) AS BIGINT) AS valid_to,
       CAST(n_events AS BIGINT) AS n_events
FROM agg ORDER BY user_id, valid_from
""".strip()


def sql_rel_benford() -> str:
    return """
WITH cents AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS c FROM events
  WHERE CAST(round(value * 100) AS BIGINT) > 0
),
obs AS (
  SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS BIGINT) AS digit,
         count(*) AS n
  FROM cents GROUP BY 1
),
digits AS (SELECT unnest(generate_series(1, 9)) AS digit),
tot AS (SELECT sum(n) AS t FROM obs)
SELECT d.digit,
       CAST(coalesce(o.n, 0) AS BIGINT) AS n,
       CAST((1000000 * coalesce(o.n, 0)) // tot.t AS BIGINT) AS observed_q,
       CAST(floor(1000000 * log10(1.0 + 1.0 / d.digit)) AS BIGINT) AS benford_q
FROM digits d LEFT JOIN obs o USING (digit) CROSS JOIN tot
ORDER BY d.digit
""".strip()


def sql_rel_lift() -> str:
    return """
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
marg AS (SELECT event_type, count(*) AS n FROM ut GROUP BY 1),
tot AS (SELECT count(DISTINCT user_id) AS n FROM ut),
pq AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, count(*) AS n_ab
  FROM ut a JOIN ut b ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT type_a, type_b, CAST(n_ab AS BIGINT) AS n_ab,
       CAST(floor(1000000 * (CAST(n_ab AS DOUBLE) / CAST(ma.n AS DOUBLE)))
            AS BIGINT) AS conf_q,
       CAST(floor(1000000 * ((CAST(n_ab AS DOUBLE) * CAST(tot.n AS DOUBLE))
                             / (CAST(ma.n AS DOUBLE) * CAST(mb.n AS DOUBLE))))
            AS BIGINT) AS lift_q
FROM pq
JOIN marg ma ON ma.event_type = type_a
JOIN marg mb ON mb.event_type = type_b
CROSS JOIN tot
ORDER BY type_a, type_b
""".strip()


def sql_rel_decay_sum(half_life_days: int = 30) -> str:
    return f"""
WITH e AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
), ref AS (SELECT max(ts_s) AS m FROM e),
w AS (
  SELECT e.user_id,
         e.cents * CAST(floor(1000000 * exp(
             -CAST((ref.m - e.ts_s) // 86400 AS DOUBLE)
             / {float(half_life_days)})) AS BIGINT) AS contrib
  FROM e CROSS JOIN ref
)
SELECT user_id, CAST(sum(contrib) AS BIGINT) AS decayed_cents_q,
       CAST(count(*) AS BIGINT) AS n_events
FROM w GROUP BY 1 ORDER BY 1
""".strip()


def sql_rel_window_dedup(window_s: int = 300) -> str:
    return f"""
WITH e AS (
  SELECT event_id, user_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
  FROM events
), b AS (
  SELECT *, ts_s // {window_s} AS bucket,
         row_number() OVER (PARTITION BY user_id, event_type, ts_s // {window_s}
                            ORDER BY ts_s, event_id) AS rnk
  FROM e
)
SELECT event_id, user_id, event_type, ts_s, CAST(bucket AS BIGINT) AS bucket
FROM b WHERE rnk = 1 ORDER BY event_id
""".strip()


def sql_rel_attribution() -> str:
    return """
WITH e AS (
  SELECT event_id, user_id, ts, event_type,
         CAST(round(value * 100) AS BIGINT) AS value_cents
  FROM events
), w AS (
  SELECT *,
    last_value(CASE WHEN event_type IN ('click', 'view')
                    THEN event_id END IGNORE NULLS)
      OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      AS touch_event_id,
    last_value(CASE WHEN event_type IN ('click', 'view')
                    THEN event_type END IGNORE NULLS)
      OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      AS touch_type
  FROM e
)
SELECT event_id, user_id,
       CAST(coalesce(touch_event_id, -1) AS BIGINT) AS touch_event_id,
       coalesce(touch_type, '') AS touch_type,
       value_cents
FROM w WHERE event_type = 'purchase' ORDER BY event_id
""".strip()


def sql_ann_knn_graph(k: int = 5) -> str:
    return f"""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
), scored AS (
  SELECT a.vec_id AS query_id, b.vec_id,
         CAST(floor(list_cosine_similarity(a.e, b.e) * 1000000) AS BIGINT) AS simq
  FROM v a JOIN v b ON b.vec_id <> a.vec_id
), ranked AS (
  SELECT query_id, vec_id, simq,
         row_number() OVER (PARTITION BY query_id ORDER BY simq DESC, vec_id) AS rank
  FROM scored
)
SELECT query_id, vec_id, simq, rank FROM ranked WHERE rank <= {k}
ORDER BY query_id, rank
""".strip()


def sql_multimodal_audio() -> str:
    # Mirror of encode_audio formulas + the window count
    from ..stages.multimodal import AUDIO_WINDOW as W

    return f"""
WITH meta AS (
  SELECT doc_id,
         8000 * (1 + doc_id % 2) AS sample_rate,
         256 + doc_id % 4096 AS n_samples
  FROM documents
)
SELECT doc_id,
       CAST(sample_rate AS INTEGER) AS sample_rate,
       CAST(n_samples AS BIGINT) AS n_samples,
       CAST(n_samples * 1000 // sample_rate AS BIGINT) AS duration_ms,
       CAST((n_samples + {W - 1}) // {W} AS BIGINT) AS n_windows
FROM meta ORDER BY doc_id
""".strip()


def sql_multimodal_vad() -> str:
    """Voice-activity-census oracle — exact dual of
    ``stages/multimodal.py::VoiceActivityDetector``: samples regenerate
    from the sha256 tiling (int16 LE: lo byte at digest[(2s)%32], hi at
    digest[(2s+1)%32]), window energies are exact integer Σx², the
    active test is division-free, and the run reduction is the classic
    gaps-and-islands window query (w − row_number() groups consecutive
    active windows)."""
    from ..stages.multimodal import VAD_TAU_MEANSQ, VAD_WINDOW

    W = VAD_WINDOW
    return f"""
WITH meta AS (
  SELECT doc_id, 256 + doc_id % 4096 AS n, sha256(text) AS hx FROM documents
), dig AS MATERIALIZED (
  SELECT doc_id, j, ('0x' || substr(hx, 2 * j + 1, 2))::BIGINT AS b
  FROM meta, unnest(generate_series(0, 31)) t(j)
), smp AS (
  SELECT m.doc_id, t.s // {W} AS w,
         CASE WHEN d1.b + 256 * d2.b >= 32768
              THEN d1.b + 256 * d2.b - 65536
              ELSE d1.b + 256 * d2.b END AS x
  FROM meta m, unnest(generate_series(0, m.n - 1)) t(s)
  JOIN dig d1 ON d1.doc_id = m.doc_id AND d1.j = (2 * t.s) % 32
  JOIN dig d2 ON d2.doc_id = m.doc_id AND d2.j = (2 * t.s + 1) % 32
), win AS MATERIALIZED (
  SELECT doc_id, w, sum(x * x) AS e FROM smp GROUP BY doc_id, w
), act AS MATERIALIZED (
  SELECT doc_id, w FROM win WHERE e >= {VAD_TAU_MEANSQ}::BIGINT * {W}
), isl AS (
  SELECT doc_id, w,
         w - row_number() OVER (PARTITION BY doc_id ORDER BY w) AS grp
  FROM act
), runs AS (
  SELECT doc_id, count(*) AS len FROM isl GROUP BY doc_id, grp
), census AS (
  SELECT a.doc_id, count(*) AS n_active, min(a.w) AS first_active
  FROM act a GROUP BY a.doc_id
), longest AS (
  SELECT doc_id, max(len) AS longest_run FROM runs GROUP BY doc_id
)
SELECT m.doc_id,
       CAST((m.n + {W - 1}) // {W} AS BIGINT) AS n_windows,
       CAST(coalesce(c.n_active, 0) AS BIGINT) AS n_active,
       CAST(coalesce(l.longest_run, 0) AS BIGINT) AS longest_run,
       CAST(coalesce(c.first_active, -1) AS BIGINT) AS first_active
FROM meta m
LEFT JOIN census c USING (doc_id)
LEFT JOIN longest l USING (doc_id)
ORDER BY m.doc_id
""".strip()


def sql_text_curate() -> str:
    # Composition of the quality / decontaminate / fingerprint-dedup /
    # prefix-sum oracles — mirrors stages/text.py::text_curate stage for
    # stage (filter → dedup-among-survivors → pack by doc_id order).
    from ..stages.text import (
        BENCH_EVERY,
        BENCH_LEN,
        BENCH_MIN_CHARS,
        BENCH_OFF,
        QUALITY_MIN_TOKENS,
        SHARD_TOKEN_BUDGET,
    )

    return f"""
WITH sig AS (
  SELECT doc_id, text,
    length(text) AS n_chars,
    len(regexp_extract_all(lower(text), '{_TOK}')) AS n_tokens,
    len(list_distinct(regexp_extract_all(lower(text), '{_TOK}'))) AS n_uniq,
    length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS alpha_chars,
    len(regexp_extract_all(lower(text), '{_STOP}')) AS stop_count,
    len(regexp_extract_all(text, '{PUNCT_RE}')) AS punct_chars,
    sha256(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
  FROM documents
), bench AS (
  SELECT substring(text, {BENCH_OFF + 1}, {BENCH_LEN}) AS snippet
  FROM documents
  WHERE doc_id % {BENCH_EVERY} = 0 AND length(text) >= {BENCH_MIN_CHARS}
), clean AS (
  SELECT doc_id, n_tokens, fingerprint FROM sig
  WHERE n_tokens >= {QUALITY_MIN_TOKENS}
    AND alpha_chars >= 2*n_tokens AND alpha_chars <= 12*n_tokens
    AND stop_count*100 > n_tokens
    AND punct_chars*5 < greatest(n_chars, 1)
    AND n_uniq*5 > n_tokens
    AND NOT EXISTS (SELECT 1 FROM bench b WHERE contains(sig.text, b.snippet))
), surv AS (
  SELECT doc_id, n_tokens FROM (
    SELECT doc_id, n_tokens,
           row_number() OVER (PARTITION BY fingerprint ORDER BY doc_id) AS rn
    FROM clean
  ) WHERE rn = 1
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST((sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
             - n_tokens) // {SHARD_TOKEN_BUDGET} AS BIGINT) AS shard_id
FROM surv ORDER BY doc_id
""".strip()


def sql_rel_lead_lag() -> str:
    return """
SELECT event_id, user_id,
  CAST(COALESCE(date_diff('microseconds', lag(ts) OVER w, ts), -1) AS BIGINT)
    AS prev_gap_us,
  CAST(COALESCE(date_diff('microseconds', ts, lead(ts) OVER w), -1) AS BIGINT)
    AS next_gap_us
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY user_id, event_id
""".strip()


def sql_rel_mode() -> str:
    return """
WITH counts AS (
  SELECT c.c_mktsegment, o.o_orderpriority, count(*) AS n
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY c_mktsegment ORDER BY n DESC, o_orderpriority ASC
  ) AS rn
  FROM counts
)
SELECT c_mktsegment, o_orderpriority AS mode_priority, CAST(n AS BIGINT) AS n
FROM ranked WHERE rn = 1 ORDER BY c_mktsegment
""".strip()


def sql_rel_rank_window() -> str:
    return """
WITH ranked AS (
  SELECT c.c_mktsegment, o.o_orderkey,
    CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents,
    row_number() OVER (
      PARTITION BY c.c_mktsegment
      ORDER BY round(o.o_totalprice * 100) DESC, o.o_orderkey ASC
    ) AS rank
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
)
SELECT c_mktsegment, CAST(rank AS BIGINT) AS rank, o_orderkey, cents
FROM ranked WHERE rank <= 3 ORDER BY c_mktsegment, rank
""".strip()


def sql_rel_pivot() -> str:
    return """
SELECT l_returnflag,
  CAST(sum(CASE WHEN l_linestatus = 'F'
       THEN CAST(round(l_extendedprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS f_cents,
  CAST(sum(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS f_n,
  CAST(sum(CASE WHEN l_linestatus = 'O'
       THEN CAST(round(l_extendedprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS o_cents,
  CAST(sum(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS o_n
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""".strip()


def sql_rel_rollup() -> str:
    return """
SELECT coalesce(l_returnflag, '') AS l_returnflag,
       coalesce(l_linestatus, '') AS l_linestatus,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS price_cents,
       count(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY 1, 2
""".strip()


def sql_rel_anomalies() -> str:
    return """
WITH w AS (
  SELECT user_id, CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS window_start,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
  FROM events GROUP BY 1, 2
), st AS (
  SELECT user_id, count(*) AS n, sum(value_cents) AS S,
         sum(value_cents * value_cents) AS Q
  FROM w GROUP BY 1
)
SELECT w.user_id, w.window_start, w.value_cents
FROM w JOIN st USING (user_id)
WHERE st.n >= 2
  AND (st.n * w.value_cents - st.S) * (st.n * w.value_cents - st.S)
      > 9 * (st.n * st.Q - st.S * st.S)
ORDER BY 1, 2
""".strip()


def sql_rel_corr() -> str:
    # HUGEINT keeps every moment exact; the float expression mirrors the
    # Ray side operation-for-operation (convert → multiply → sqrt →
    # divide → ×1e6 → floor) so IEEE rounding coincides
    return """
WITH m AS (
  SELECT l_returnflag, l_linestatus,
    CAST(count(*) AS HUGEINT) AS n,
    sum(CAST(round(l_quantity) AS HUGEINT)) AS sx,
    sum(CAST(round(l_extendedprice * 100) AS HUGEINT)) AS sy,
    sum(CAST(round(l_quantity) AS HUGEINT)
        * CAST(round(l_extendedprice * 100) AS HUGEINT)) AS sxy,
    sum(CAST(round(l_quantity) AS HUGEINT)
        * CAST(round(l_quantity) AS HUGEINT)) AS sxx,
    sum(CAST(round(l_extendedprice * 100) AS HUGEINT)
        * CAST(round(l_extendedprice * 100) AS HUGEINT)) AS syy
  FROM lineitem GROUP BY 1, 2
)
SELECT l_returnflag, l_linestatus,
  CAST(n AS BIGINT) AS n,
  CAST(sx AS BIGINT) AS sum_qty,
  CAST(sy AS BIGINT) AS sum_price_cents,
  CAST(floor(1e6 * (CAST(n * sxy - sx * sy AS DOUBLE)
      / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
             * CAST(n * syy - sy * sy AS DOUBLE)))) AS BIGINT) AS corr_q
FROM m ORDER BY 1, 2
""".strip()


def sql_rel_cube() -> str:
    return """
SELECT coalesce(l_returnflag, '') AS l_returnflag,
       coalesce(l_linestatus, '') AS l_linestatus,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS price_cents,
       count(*) AS n
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY 1, 2
""".strip()


def sql_rel_moving_sum() -> str:
    return """
SELECT user_id, event_id,
  CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS mov_cents
FROM events ORDER BY user_id, event_id
""".strip()


def sql_rel_q5_revenue() -> str:
    return """
SELECT n_name,
  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
       AS BIGINT) AS revenue_cents,
  CAST(count(*) AS BIGINT) AS n
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
GROUP BY 1 ORDER BY 1
""".strip()


def sql_rel_resample() -> str:
    return """
WITH hourly AS (
  SELECT user_id, date_trunc('hour', ts) AS h,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
  FROM events GROUP BY 1, 2
),
bounds AS (SELECT user_id, min(h) AS lo, max(h) AS hi FROM hourly GROUP BY 1),
grid AS (
  SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
  FROM bounds
)
SELECT g.user_id,
  CAST(epoch(g.h) AS BIGINT) AS hour_start,
  COALESCE(y.n_events, 0) AS n_events,
  COALESCE(y.sum_cents, 0) AS sum_cents,
  CAST(last_value(y.sum_cents IGNORE NULLS) OVER (
    PARTITION BY g.user_id ORDER BY g.h
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ff_cents
FROM grid g LEFT JOIN hourly y ON g.user_id = y.user_id AND g.h = y.h
ORDER BY 1, 2
""".strip()


def sql_rel_retention() -> str:
    return """
WITH uw AS (
  SELECT user_id, date_trunc('week', ts) AS w FROM events GROUP BY 1, 2
),
coh AS (SELECT user_id, min(w) AS cw FROM uw GROUP BY 1)
SELECT CAST(epoch(c.cw) AS BIGINT) AS cohort_week,
       CAST((epoch(u.w) - epoch(c.cw)) // 604800 AS BIGINT) AS week_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM uw u JOIN coh c USING (user_id)
GROUP BY 1, 2 ORDER BY 1, 2
""".strip()


def sql_rel_funnel() -> str:
    return """
WITH v AS (
  SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY 1
),
c AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN v ON v.user_id = e.user_id AND e.ts > v.t1
  WHERE e.event_type = 'click' GROUP BY 1
),
p AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN c ON c.user_id = e.user_id AND e.ts > c.t2
  WHERE e.event_type = 'purchase' GROUP BY 1
)
SELECT CAST(1 AS BIGINT) AS step, CAST(count(*) AS BIGINT) AS n_users FROM v
UNION ALL SELECT 2, count(*) FROM c
UNION ALL SELECT 3, count(*) FROM p
ORDER BY 1
""".strip()


def sql_text_inverted_index() -> str:
    return f"""
WITH tt AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{_TOK}')) AS token
  FROM documents
),
tf AS (
  SELECT token, doc_id, CAST(count(*) AS BIGINT) AS tf FROM tt GROUP BY 1, 2
)
SELECT token, df, tf_total, doc_id AS top_doc, tf AS top_tf FROM (
  SELECT token, doc_id, tf,
         CAST(count(*) OVER (PARTITION BY token) AS BIGINT) AS df,
         CAST(sum(tf) OVER (PARTITION BY token) AS BIGINT) AS tf_total,
         row_number() OVER (PARTITION BY token ORDER BY tf DESC, doc_id) AS rn
  FROM tf)
WHERE rn = 1 ORDER BY token
""".strip()


def sql_rel_skyline() -> str:
    return """
WITH p AS (
  SELECT p_partkey,
         CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents,
         CAST(p_size AS BIGINT) AS p_size
  FROM part
)
SELECT p_partkey, price_cents, p_size FROM p a
WHERE NOT EXISTS (
  SELECT 1 FROM p b
  WHERE b.price_cents <= a.price_cents AND b.p_size <= a.p_size
    AND (b.price_cents < a.price_cents OR b.p_size < a.p_size)
)
ORDER BY p_partkey
""".strip()


def sql_text_search() -> str:
    from ..stages.text import SEARCH_QUERY, SEARCH_TOP_K, _IDF_SCALE

    vals = ", ".join(f"('{t}')" for t in SEARCH_QUERY)
    return f"""
WITH qt(token) AS (VALUES {vals}),
tt AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{_TOK}')) AS token
  FROM documents
),
tf AS (
  SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
  FROM tt WHERE token IN (SELECT token FROM qt) GROUP BY 1, 2
),
dfs AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
sc AS (
  SELECT tf.doc_id,
         CAST(sum(tf.tf * ({_IDF_SCALE} // dfs.df)) AS BIGINT) AS score
  FROM tf JOIN dfs USING (token) GROUP BY 1
)
SELECT doc_id, score FROM sc ORDER BY score DESC, doc_id LIMIT {SEARCH_TOP_K}
""".strip()


def sql_rel_bloom_semi_join() -> str:
    return """
SELECT l_linestatus,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS sum_cents
FROM lineitem
WHERE l_orderkey IN (
  SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
)
GROUP BY 1 ORDER BY 1
""".strip()


def sql_rel_zorder() -> str:
    from .docops import _Z_BITS, _Z_BUCKET_SHIFT

    terms = []
    for i in range(_Z_BITS):
        terms.append(f"(((CAST(l_partkey AS BIGINT) >> {i}) & 1) << {2 * i})")
        terms.append(f"(((CAST(l_suppkey AS BIGINT) >> {i}) & 1) << {2 * i + 1})")
    z = " | ".join(terms)
    return f"""
WITH m AS (SELECT {z} AS z FROM lineitem)
SELECT CAST(z >> {_Z_BUCKET_SHIFT} AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n,
       CAST(min(z) AS BIGINT) AS zmin,
       CAST(max(z) AS BIGINT) AS zmax
FROM m GROUP BY 1 ORDER BY 1
""".strip()


def sql_rel_merge_upsert() -> str:
    return """
WITH merged AS (
  SELECT o_orderpriority,
         CASE WHEN o_orderkey % 10 = 0
              THEN CAST(round(o_totalprice * 110) AS BIGINT)
              ELSE CAST(round(o_totalprice * 100) AS BIGINT) END AS cents
  FROM orders WHERE o_orderkey % 17 <> 0
  UNION ALL
  SELECT o_orderpriority, CAST(round(o_totalprice * 100) AS BIGINT)
  FROM orders WHERE o_orderkey % 13 = 0
)
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(cents) AS BIGINT) AS sum_cents
FROM merged GROUP BY 1 ORDER BY 1
""".strip()


def sql_rel_sliding_distinct() -> str:
    return """
WITH uh AS (
  SELECT DISTINCT user_id, date_trunc('hour', ts) AS h FROM events
),
b AS (SELECT min(h) AS lo, max(h) AS hi FROM uh),
w AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS ws FROM b)
SELECT CAST(epoch(ws) AS BIGINT) AS window_start,
       CAST(count(DISTINCT uh.user_id) AS BIGINT) AS n_users
FROM w JOIN uh ON uh.h >= ws AND uh.h < ws + INTERVAL 24 HOUR
GROUP BY 1 ORDER BY 1
""".strip()


def sql_rel_transitions() -> str:
    return """
WITH s AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
)
SELECT prev_type, event_type AS next_type, CAST(count(*) AS BIGINT) AS n
FROM s WHERE prev_type IS NOT NULL
GROUP BY 1, 2 ORDER BY 1, 2
""".strip()


def sql_rel_listagg(k: int = 5) -> str:
    return f"""
WITH ranked AS (
  SELECT o_orderpriority, o_orderkey,
         row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_orderkey)
           AS rn
  FROM orders
)
SELECT o_orderpriority,
       string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey)
         AS first_keys
FROM ranked WHERE rn <= {k}
GROUP BY 1 ORDER BY 1
""".strip()


def sql_rel_json_extract() -> str:
    return """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(max(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
FROM events GROUP BY 1 ORDER BY 1
""".strip()


def sql_rel_histogram(num_buckets: int = 16) -> str:
    return f"""
WITH t AS (
  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents FROM lineitem
),
b AS (SELECT min(cents) AS lo, max(cents) AS hi FROM t)
SELECT ((cents - lo) * {num_buckets}) // (hi - lo + 1) AS bucket,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(min(cents) AS BIGINT) AS lo_cents,
       CAST(max(cents) AS BIGINT) AS hi_cents
FROM t, b GROUP BY 1 ORDER BY 1"""


def sql_rel_row_number() -> str:
    return """
SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
       CAST(ROW_NUMBER() OVER (ORDER BY o_orderkey) AS BIGINT) AS rn
FROM orders ORDER BY o_orderkey"""


def sql_rel_kmv_distinct() -> str:
    from ..stages.skew import KMV_K, KMV_MOD, KMV_MULT

    return f"""
WITH h AS (
  SELECT DISTINCT (l_partkey * {KMV_MULT}) % {KMV_MOD} AS hv FROM lineitem
),
b AS (SELECT hv FROM h ORDER BY hv LIMIT {KMV_K})
SELECT CAST(count(*) AS BIGINT) AS k_used,
       CAST(coalesce(max(hv), 0) AS BIGINT) AS kth_hash,
       CAST(CASE WHEN count(*) < {KMV_K} THEN count(*)
                 ELSE ({KMV_K} - 1) * {KMV_MOD} // max(hv) END AS BIGINT)
         AS est_distinct
FROM b
""".strip()


def sql_rel_cms_counts(keys=tuple(range(1, 16))) -> str:
    from ..stages.skew import CMS_A, CMS_B, CMS_D, CMS_P, CMS_W

    probe = ", ".join(f"(CAST({k} AS BIGINT))" for k in sorted(keys))
    rows = ",\n  ".join(
        f"(SELECT count(*) FROM orders WHERE ((o_custkey * {CMS_A[j]} + {CMS_B[j]}) % {CMS_P}) % {CMS_W}"
        f" = ((p.k * {CMS_A[j]} + {CMS_B[j]}) % {CMS_P}) % {CMS_W})"
        for j in range(CMS_D)
    )
    return f"""
WITH probe(k) AS (VALUES {probe})
SELECT p.k AS o_custkey,
       CAST(LEAST(
  {rows}
       ) AS BIGINT) AS est_count
FROM probe p ORDER BY o_custkey
""".strip()


def sql_text_bigram_logprob() -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{_TOK}') AS ts FROM documents
), grams AS (
  SELECT doc_id, ts[i] AS w1, ts[i + 1] AS w2
  FROM toks, unnest(generate_series(1, len(ts) - 1)) AS t(i)
), bg AS (
  SELECT w1, w2, count(*) AS c FROM grams GROUP BY w1, w2
), firsts AS (
  SELECT w1, sum(c) AS cw FROM bg GROUP BY w1
), scored AS (
  SELECT g.doc_id, count(*) AS n_bigrams,
         sum(CAST(floor(1000000 * (ln(CAST(b.c AS DOUBLE)) - ln(CAST(f.cw AS DOUBLE))))
                  AS BIGINT)) AS lp
  FROM grams g JOIN bg b USING (w1, w2) JOIN firsts f USING (w1)
  GROUP BY g.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(s.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       CAST(coalesce(s.lp, 0) AS BIGINT) AS logprob_q
FROM documents d LEFT JOIN scored s USING (doc_id)
ORDER BY d.doc_id
""".strip()


def sql_rel_ntile(k: int = 4) -> str:
    return f"""
SELECT c_custkey,
       CAST(round(c_acctbal * 100) AS BIGINT) AS price_cents,
       CAST(NTILE({k}) OVER (ORDER BY CAST(round(c_acctbal * 100) AS BIGINT), c_custkey)
            AS BIGINT) AS tile
FROM customer ORDER BY price_cents, c_custkey
""".strip()


def sql_rel_winsorize() -> str:
    return """
WITH c AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS v FROM lineitem),
q AS (SELECT quantile_disc(v, 0.05) AS lo, quantile_disc(v, 0.95) AS hi FROM c)
SELECT CAST(q.lo AS BIGINT) AS p05_cents,
       CAST(q.hi AS BIGINT) AS p95_cents,
       CAST(count(*) FILTER (WHERE c.v < q.lo) AS BIGINT) AS n_clipped_lo,
       CAST(count(*) FILTER (WHERE c.v > q.hi) AS BIGINT) AS n_clipped_hi,
       CAST(sum(LEAST(GREATEST(c.v, q.lo), q.hi)) AS BIGINT) AS sum_winsorized_cents
FROM c, q GROUP BY q.lo, q.hi
""".strip()


def sql_rel_time_weighted() -> str:
    return """
WITH e AS (
  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ep,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
), stepped AS (
  SELECT user_id, cents, ep,
         lead(ep) OVER (PARTITION BY user_id ORDER BY ep, event_id) AS nxt
  FROM e
), agg AS (
  SELECT user_id,
         sum(cents * (nxt - ep)) AS num,
         sum(nxt - ep) AS den
  FROM stepped WHERE nxt IS NOT NULL GROUP BY user_id
)
SELECT user_id, CAST(num AS BIGINT) AS num, CAST(den AS BIGINT) AS den,
       CAST(num // den AS BIGINT) AS twa_q
FROM agg WHERE den > 0 ORDER BY user_id
""".strip()


def sql_rel_key_skew() -> str:
    return """
WITH counts AS (
  SELECT l_partkey, count(*) AS n FROM lineitem GROUP BY l_partkey
), ranked AS (
  SELECT n, row_number() OVER (ORDER BY n, l_partkey) AS i,
         count(*) OVER () AS nk, sum(n) OVER () AS total
  FROM counts
)
SELECT CAST(max(nk) AS BIGINT) AS n_keys,
       CAST(max(total) AS BIGINT) AS n_rows,
       CAST(1000000 * max(n) // max(total) AS BIGINT) AS top1_share_q,
       CAST(sum((2 * i - nk - 1) * n) AS BIGINT) AS gini_num,
       CAST(max(nk) * max(total) AS BIGINT) AS gini_den
FROM ranked
""".strip()


def _phash_ctes() -> str:
    """Shared WITH-chain rendering the exact-integer aHash64 of every
    content payload (``stages/multimodal.py::ahash64``): the 64 grid
    cells are SAMPLED pixels (nearest 8×8), so each bit replays from 3
    digest-byte lookups and the integer compare ``64·s_i > Σ s_j``.
    Emits ``ph(doc_id, phash UBIGINT)``."""
    return """
meta AS (
  SELECT doc_id, sha256(text) AS hx FROM documents
), dims AS MATERIALIZED (
  SELECT doc_id, hx,
         16 + ('0x' || substr(hx, 1, 2))::BIGINT % 48 AS w,
         16 + ('0x' || substr(hx, 3, 2))::BIGINT % 32 AS h
  FROM meta
), dig AS MATERIALIZED (
  SELECT doc_id, j, ('0x' || substr(hx, 2 * j + 1, 2))::BIGINT AS b
  FROM dims, unnest(generate_series(0, 31)) t(j)
), cells AS (
  SELECT d.doc_id, k.k * 8 + l.l AS i, dg0.b + dg1.b + dg2.b AS s
  FROM dims d,
       unnest(generate_series(0, 7)) k(k),
       unnest(generate_series(0, 7)) l(l)
  JOIN dig dg0 ON dg0.doc_id = d.doc_id
              AND dg0.j = (((k.k * d.h) // 8) * d.w * 3 + ((l.l * d.w) // 8) * 3) % 32
  JOIN dig dg1 ON dg1.doc_id = d.doc_id
              AND dg1.j = (((k.k * d.h) // 8) * d.w * 3 + ((l.l * d.w) // 8) * 3 + 1) % 32
  JOIN dig dg2 ON dg2.doc_id = d.doc_id
              AND dg2.j = (((k.k * d.h) // 8) * d.w * 3 + ((l.l * d.w) // 8) * 3 + 2) % 32
), tot AS (
  SELECT doc_id, sum(s) AS t FROM cells GROUP BY doc_id
), ph AS MATERIALIZED (
  SELECT c.doc_id,
         CAST(sum(CASE WHEN 64 * c.s > t.t
                       THEN (1::UBIGINT << (63 - c.i)) ELSE 0 END) AS UBIGINT) AS phash
  FROM cells c JOIN tot t USING (doc_id) GROUP BY c.doc_id
)""".strip()


def sql_multimodal_phash_near_dup(max_hamming: int = 3) -> str:
    """Banded-Hamming near-dup-pairs oracle — exact dual of
    ``stages/multimodal.py::image_phash_near_dup`` now that aHash is
    exact-integer (`_phash_ctes`); the engine's band-join has EXACT
    recall at the radius (pigeonhole), so the oracle can take the direct
    all-pairs ``bit_count(xor) ≤ h`` form — same set by construction."""
    return f"""
WITH {_phash_ctes()}
SELECT x.doc_id AS a, y.doc_id AS b,
       CAST(bit_count(xor(x.phash, y.phash)) AS BIGINT) AS hamming
FROM ph x JOIN ph y ON x.doc_id < y.doc_id
WHERE bit_count(xor(x.phash, y.phash)) <= {max_hamming}
ORDER BY a, b
""".strip()


def sql_multimodal_phash_dedup() -> str:
    """Groups by the COMPUTED exact-integer aHash (`_phash_ctes`) — the
    true dual of the engine's phash-keyed exchange. (The former
    group-by-text form assumed hash-equality ⟺ text-equality; the exact
    compare surfaced a genuine 64-bit collision between two distinct
    texts — the sampled cells touch ≤ 32 digest positions, so effective
    hash entropy is far below 64 bits — and both engines must merge such
    colliding docs identically.)"""
    return f"""
WITH {_phash_ctes()}
SELECT CAST(min(doc_id) AS BIGINT) AS doc_id,
       CAST(count(*) AS BIGINT) AS n_images
FROM ph GROUP BY phash ORDER BY doc_id
""".strip()


def sql_rel_mad() -> str:
    return """
WITH c AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS v FROM lineitem),
m AS (SELECT quantile_disc(v, 0.5) AS med FROM c)
SELECT CAST(m.med AS BIGINT) AS median_cents,
       CAST(quantile_disc(abs(c.v - m.med), 0.5) AS BIGINT) AS mad_cents
FROM c, m GROUP BY m.med
""".strip()


def sql_rel_table_profile() -> str:
    from .docops import _PROFILE_COLS

    parts = []
    for name, kind in _PROFILE_COLS:
        expr = (
            f"CAST(round({name} * 100) AS BIGINT)" if kind == "cents" else name
        )
        parts.append(
            f"""SELECT '{name}' AS "column", CAST(count(*) AS BIGINT) AS n_rows,
  CAST(count(*) - count({expr}) AS BIGINT) AS n_null,
  CAST(count(DISTINCT {expr}) AS BIGINT) AS n_distinct,
  CAST(min({expr}) AS VARCHAR) AS min_repr,
  CAST(max({expr}) AS VARCHAR) AS max_repr
FROM orders"""
        )
    return "\nUNION ALL\n".join(parts) + '\nORDER BY "column"'


def sql_text_chunk() -> str:
    from ..stages.text import CHUNK_STRIDE as ST, CHUNK_TOKENS as SZ

    return f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{_TOK}') AS ts FROM documents
), bounds AS (
  SELECT doc_id, ts, len(ts) AS n,
         CASE WHEN len(ts) <= {SZ} THEN 0
              ELSE (len(ts) - {SZ} + {ST} - 1) // {ST} END AS last_c
  FROM toks WHERE len(ts) > 0
), chunks AS (
  SELECT doc_id, c.c AS chunk_no,
         ts[c.c * {ST} + 1 : least(c.c * {ST} + {SZ}, n)] AS w
  FROM bounds, unnest(generate_series(0, last_c)) AS c(c)
)
SELECT doc_id, CAST(chunk_no AS BIGINT) AS chunk_no,
       CAST(len(w) AS BIGINT) AS n_tokens,
       sha256(array_to_string(w, ' ')) AS chunk_sha256
FROM chunks ORDER BY doc_id, chunk_no
""".strip()
