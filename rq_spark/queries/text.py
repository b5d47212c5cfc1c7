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


def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return X.token_stats(spread(table(spark, sf_dir, "documents")), "text", "doc_id")


_TOKEN_SQL = f"""
SELECT doc_id,
       LENGTH(text) AS n_chars_raw,
       len(string_split({_NORM_SQL}, ' ')) AS n_words,
       len(regexp_extract_all(text, '\\w+')) AS n_tokens,
       len(list_distinct(string_split({_NORM_SQL}, ' '))) AS n_uniq_words
FROM documents
"""


def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(table(spark, sf_dir, "documents"))  # 13 marker-word
    # count walks per row: parallelize the narrow chain on local 1-file scans
    return d.select("doc_id", X.lang_id(F.col("text")).alias("lang_guess"))


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


def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(table(spark, sf_dir, "documents"))
    feats = X.quality_features(F.col("text"))
    return d.select(
        "doc_id",
        feats["n_chars"].alias("n_chars"),
        feats["alpha_ratio"].alias("alpha_ratio"),
        feats["space_ratio"].alias("space_ratio"),
        feats["uniq_ratio"].alias("uniq_ratio"),
        feats["mean_word_len"].alias("mean_word_len"),
        X.quality_score(F.col("text")).alias("quality"),
    )


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


def text_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token budgets: whitespace words vs BPE-ish
    pretokenizer pieces (the training-cost estimator). Narrow
    single-pass expression — codegen'd, no Python, no shuffle."""
    d = spread(table(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(r"\S+")).alias("n_ws_tokens"),
        F.regexp_count(F.col("text"), F.lit(_BPE_RE)).alias("n_bpe_tokens"),
    )


_BPE_SQL = f"""
SELECT doc_id,
       len(regexp_extract_all(text, '\\S+')) AS n_ws_tokens,
       len(regexp_extract_all(text, '{_BPE_RE.replace("'", "''")}')) AS n_bpe_tokens
FROM documents
"""


QUERIES = {
    "text_token_stats": text_token_stats,
    "text_lang_id": text_lang_id,
    "text_quality_score": text_quality_score,
    "text_bpe_token_count": text_bpe_token_count,
    "corpus_curation": corpus_curation,
}

ORACLE = {
    "text_token_stats": _TOKEN_SQL,
    "text_lang_id": _lang_id_sql(),
    "text_quality_score": _QUALITY_SQL,
    "text_bpe_token_count": _BPE_SQL,
    "corpus_curation": _curation_sql(),
}
