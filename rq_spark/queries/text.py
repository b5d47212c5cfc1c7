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


def _lang_id_sql() -> str:
    # same walk as operators.text.lang_id: strictly-greater displaces
    exprs = {lang: _sql_lang_score(lang) for lang in X.LANG_MARKERS}
    best, best_score = "'und'", "0"
    for lang in X.LANG_MARKERS:
        s = exprs[lang]
        best = f"CASE WHEN ({s}) > ({best_score}) THEN '{lang}' ELSE {best} END"
        best_score = f"CASE WHEN ({s}) > ({best_score}) THEN ({s}) ELSE ({best_score}) END"
    return f"SELECT doc_id, {best} AS lang_guess FROM documents"


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


QUERIES = {
    "text_token_stats": text_token_stats,
    "text_lang_id": text_lang_id,
    "text_quality_score": text_quality_score,
}

ORACLE = {
    "text_token_stats": _TOKEN_SQL,
    "text_lang_id": _lang_id_sql(),
    "text_quality_score": _QUALITY_SQL,
}
