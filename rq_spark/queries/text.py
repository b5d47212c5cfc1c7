"""Text-analysis pack over the `documents` table: token stats,
language ID, quality scoring. Pure-expression operators
(operators/text.py) mirrored exactly in the SQL oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import text as X
from .helpers import spread, table

_NORM_SQL = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"


_TOKEN_SQL = f"""
SELECT doc_id,
       LENGTH(text) AS n_chars_raw,
       len(string_split({_NORM_SQL}, ' ')) AS n_words,
       len(regexp_extract_all(text, '\\w+')) AS n_tokens,
       len(list_distinct(string_split({_NORM_SQL}, ' '))) AS n_uniq_words
FROM documents
"""


def _sql_word_count(word: str) -> str:
    target = f" {word} "
    width = len(target) - 1
    padded = f"' ' || {_NORM_SQL} || ' '"
    return (
        f"CAST((LENGTH({padded}) - LENGTH(REPLACE({padded}, '{target}', ' ')))"
        f" / {width} AS INT)"
    )


def _sql_lang_score(lang: str) -> str:
    return " + ".join(_sql_word_count(w) for w in X.LANG_MARKERS[lang])


def _sql_lang_cols() -> str:
    """Per-language score COLUMNS — evaluated once in a CTE so the
    CASE walk below duplicates only cheap column refs, never the
    string-op trees (the inline walk was a 2^n blowup on both
    engines)."""
    return ", ".join(
        f"({_sql_lang_score(lang)}) AS s_{lang}" for lang in X.LANG_MARKERS
    )


def _sql_lang_case() -> str:
    """Strictly-greater displacement walk over the s_<lang> columns —
    identical tie/und semantics to operators.text.lang_id (all-int
    comparisons, so any faithful argmax formulation hash-matches)."""
    best, best_score = "'und'", "0"
    for lang in X.LANG_MARKERS:
        s = f"s_{lang}"
        best = f"CASE WHEN ({s}) > ({best_score}) THEN '{lang}' ELSE {best} END"
        best_score = f"CASE WHEN ({s}) > ({best_score}) THEN ({s}) ELSE ({best_score}) END"
    return best


def _lang_id_sql() -> str:
    return f"""
WITH s AS (SELECT doc_id, {_sql_lang_cols()} FROM documents)
SELECT doc_id, {_sql_lang_case()} AS lang_guess FROM s
"""


_QUALITY_SQL = f"""
WITH f AS (
  SELECT doc_id,
         LENGTH(text) AS n_chars,
         LENGTH(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
           / CAST(LENGTH(text) AS DOUBLE) AS alpha_ratio,
         LENGTH(regexp_replace(text, '[^0-9]', '', 'g'))
           / CAST(LENGTH(text) AS DOUBLE) AS digit_ratio,
         LENGTH(regexp_replace(text, '[^.,;:!?]', '', 'g'))
           / CAST(LENGTH(text) AS DOUBLE) AS punct_ratio,
         LENGTH(regexp_replace(text, '[^ ]', '', 'g'))
           / CAST(LENGTH(text) AS DOUBLE) AS space_ratio,
         CAST(LENGTH(list_aggregate(string_split({_NORM_SQL}, ' '), 'string_agg', ''))
              AS DOUBLE)
           / len(string_split({_NORM_SQL}, ' ')) AS mean_word_len,
         CAST(len(list_distinct(string_split({_NORM_SQL}, ' '))) AS DOUBLE)
           / len(string_split({_NORM_SQL}, ' ')) AS uniq_ratio
  FROM documents
)
SELECT doc_id, n_chars, alpha_ratio, space_ratio, uniq_ratio, mean_word_len,
       alpha_ratio * 0.5 + uniq_ratio * 0.3
         + (1.0 - digit_ratio) * 0.1 + (1.0 - punct_ratio) * 0.1 AS quality
FROM f
"""


def corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end curation filter a training-data pipeline runs:
    keep documents that (a) look like the target language, (b) clear
    the quality score, (c) fall inside a token-count band — one
    composed expression tree, all JVM-side, filters evaluated in a
    single scan pass."""
    d = spread(table(spark, sf_dir, "documents"))
    t = F.col("text")
    lang = X.lang_id(t)
    qual = X.quality_score(t)
    n_words = F.size(F.split(X.normalize_text(t), " "))
    # The keep-flag carries a nondeterministic no-op term: without it,
    # Catalyst inlines the flag and pushes the conjuncts below the
    # repartition onto the (single, local) scan partition, evaluating
    # the full lang/quality trees twice AND serially — measured 10×
    # slower. Tainted, the expensive trees are evaluated exactly once,
    # in the parallel project, and the filter sees a boolean column.
    keep = (
        (lang == "en")
        & (qual >= 0.55)
        & (n_words >= 20)
        & (n_words <= 120)
        & (F.monotonically_increasing_id() >= 0)
    )
    return (
        d.select(
            "doc_id",
            lang.alias("lang_guess"),
            qual.alias("quality"),
            n_words.alias("n_words"),
            keep.alias("_keep"),
        )
        .filter("_keep")
        .drop("_keep")
    )


def _curation_sql() -> str:
    return f"""
WITH s AS (
  SELECT doc_id, text, {_sql_lang_cols()} FROM documents
), f AS (
  SELECT doc_id,
         {_sql_lang_case()} AS lang_guess,
         LENGTH(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
           / CAST(LENGTH(text) AS DOUBLE) AS alpha_ratio,
         LENGTH(regexp_replace(text, '[^0-9]', '', 'g'))
           / CAST(LENGTH(text) AS DOUBLE) AS digit_ratio,
         LENGTH(regexp_replace(text, '[^.,;:!?]', '', 'g'))
           / CAST(LENGTH(text) AS DOUBLE) AS punct_ratio,
         CAST(len(list_distinct(string_split({_NORM_SQL}, ' '))) AS DOUBLE)
           / len(string_split({_NORM_SQL}, ' ')) AS uniq_ratio,
         len(string_split({_NORM_SQL}, ' ')) AS n_words
  FROM s
)
SELECT doc_id, lang_guess,
       alpha_ratio * 0.5 + uniq_ratio * 0.3
         + (1.0 - digit_ratio) * 0.1 + (1.0 - punct_ratio) * 0.1 AS quality,
       n_words
FROM f
WHERE lang_guess = 'en'
  AND alpha_ratio * 0.5 + uniq_ratio * 0.3
        + (1.0 - digit_ratio) * 0.1 + (1.0 - punct_ratio) * 0.1 >= 0.55
  AND n_words BETWEEN 20 AND 120
"""


# GPT-2-style pretokenizer, minus the \s+(?!\S) lookahead (RE2 — the
# oracle's regex engine — has no lookahead; Java and RE2 agree on
# everything kept): contractions, space-prefixed letter runs, digit
# runs, punctuation runs, residual whitespace. Token COUNT under this
# split is the standard pre-BPE budget estimate (BPE merges only
# subdivide within these pieces, never across).
_BPE_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s']+|\s+"


_BPE_SQL = f"""
SELECT doc_id,
       len(regexp_extract_all(text, '\\S+')) AS n_ws_tokens,
       len(regexp_extract_all(text, '{_BPE_RE.replace("'", "''")}')) AS n_bpe_tokens
FROM documents
"""

_FP_SQL = f"SELECT doc_id, md5({_NORM_SQL}) AS fp FROM documents"


def text_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every per-document text signal in ONE single-scan projection
    (former text_token_stats + text_lang_id + text_quality_score +
    text_bpe_token_count + text_fingerprint, column-merged): token
    stats, language ID, quality features + score, whitespace/BPE-ish
    token budgets, and the md5 fingerprint. All codegen'd expressions,
    no Python, no shuffle — at 100 TB this is the 'score every document
    once' pass, and reading the corpus once instead of five times is
    the difference that matters. Every former output column is still
    present and hash-checked."""
    d = spread(table(spark, sf_dir, "documents"))
    t = F.col("text")
    feats = X.quality_features(t)
    return X.token_stats(
        d,
        "text",
        "doc_id",
        X.lang_id(t).alias("lang_guess"),
        feats["n_chars"].alias("n_chars"),
        feats["alpha_ratio"].alias("alpha_ratio"),
        feats["space_ratio"].alias("space_ratio"),
        feats["uniq_ratio"].alias("uniq_ratio"),
        feats["mean_word_len"].alias("mean_word_len"),
        X.quality_score(t).alias("quality"),
        F.regexp_count(t, F.lit(r"\S+")).alias("n_ws_tokens"),
        F.regexp_count(t, F.lit(_BPE_RE)).alias("n_bpe_tokens"),
        X.fingerprint(t).alias("fp"),
    )


def _text_metrics_sql() -> str:
    """Join the former standalone oracles on doc_id — each branch's SQL
    text is reused verbatim as a CTE, so a divergence in any branch
    still flips the merged hash."""
    return f"""
WITH t AS ({_TOKEN_SQL}),
     l AS ({_lang_id_sql()}),
     q AS ({_QUALITY_SQL}),
     b AS ({_BPE_SQL}),
     fp AS ({_FP_SQL})
SELECT t.doc_id, t.n_chars_raw, t.n_words, t.n_tokens, t.n_uniq_words,
       l.lang_guess,
       q.n_chars, q.alpha_ratio, q.space_ratio, q.uniq_ratio,
       q.mean_word_len, q.quality,
       b.n_ws_tokens, b.n_bpe_tokens,
       fp.fp
FROM t
JOIN l  USING (doc_id)
JOIN q  USING (doc_id)
JOIN b  USING (doc_id)
JOIN fp USING (doc_id)
"""


QUERIES = {
    "text_metrics": text_metrics,
    "corpus_curation": corpus_curation,
}

ORACLE = {
    "text_metrics": _text_metrics_sql(),
    "corpus_curation": _curation_sql(),
}
