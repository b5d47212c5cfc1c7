"""Nested-data pack (SURVEY.md §2.2 `flatten`/`explode`,
`with_field`/`drop_field`).

The reference's record model is a nested Value tree (SURVEY §1.2:
Sequence → ArrayType, Map → StructType); these operators are the
Spark-side manipulation surface for those shapes. rq itself only
transcodes nested records (src/value/mod.rs:41-45); editing them is
extension-layer.

Scale notes:
* explode is a narrow transformation — no shuffle; each task unnests
  its own partition. Row-count amplification (×dim here) happens
  inside whole-stage codegen, never at a shuffle boundary.
* withField/dropFields are projections — Catalyst collapses them into
  the scan's ReadSchema, so unused struct legs are never read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .helpers import table

# --------------------------------------------------------------- explode


def explode_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode an array<float> column: one row per vector element.

    Narrow op (no shuffle); pos is 0-based like the reference's
    Sequence indexing.
    """
    emb = table(spark, sf_dir, "embeddings")
    return (
        emb.filter(F.col("vec_id") % 50 == 0)
        .select("vec_id", F.posexplode("embedding").alias("pos", "val"))
        .select("vec_id", "pos", F.col("val").cast("double").alias("val"))
    )


_EXPLODE_SQL = """
SELECT vec_id,
       CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS pos,
       CAST(unnest(embedding) AS DOUBLE) AS val
FROM embeddings
WHERE vec_id % 50 = 0
"""


def explode_tokens_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer over a computed array (split) — empty arrays keep
    the parent row with a NULL element, rq's Sequence-of-0 analog."""
    docs = table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    return (
        docs.filter(F.col("doc_id") % 97 == 0)
        .select("doc_id", F.explode_outer(toks).alias("token"))
        .filter(F.length("token") > 3)
    )


_EXPLODE_TOKENS_SQL = r"""
SELECT doc_id, token FROM (
    SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS token
    FROM documents
    WHERE doc_id % 97 = 0
) WHERE len(token) > 3
"""

# ------------------------------------------------- nested struct editing


def struct_with_field(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a struct record, edit it with withField (add computed leg)
    and dropFields (remove one), then flatten for comparison.

    Catalyst folds the whole struct pipeline into one projection —
    .explain shows a single Project over the scan.
    """
    o = table(spark, sf_dir, "orders")
    rec = F.struct(
        F.col("o_orderkey").alias("key"),
        F.col("o_totalprice").alias("price"),
        F.col("o_orderstatus").alias("status"),
    )
    edited = (
        # floor() on both engines — a bare int cast truncates in Spark
        # but rounds in DuckDB, so it is not oracle-stable
        rec.withField("price_band", F.floor(F.col("o_totalprice") / 50000).cast("int"))
        .dropFields("status")
    )
    return (
        o.filter(F.col("o_orderkey") % 7 == 0)
        .select(edited.alias("rec"))
        .select(
            F.col("rec.key").alias("key"),
            F.col("rec.price").alias("price"),
            F.col("rec.price_band").alias("price_band"),
        )
    )


_WITH_FIELD_SQL = """
SELECT o_orderkey AS key,
       o_totalprice AS price,
       CAST(FLOOR(o_totalprice / 50000) AS INT) AS price_band
FROM orders
WHERE o_orderkey % 7 = 0
"""


def flatten_struct_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """struct build → select rec.* flatten round trip (rq Map→record)."""
    c = table(spark, sf_dir, "customer")
    rec = F.struct(
        F.col("c_custkey").alias("custkey"),
        F.col("c_nationkey").alias("nationkey"),
        F.upper(F.col("c_mktsegment")).alias("segment"),
    )
    return (
        c.filter(F.col("c_custkey") % 11 == 0)
        .select(rec.alias("rec"))
        .select("rec.*")
    )


_FLATTEN_SQL = """
SELECT c_custkey AS custkey, c_nationkey AS nationkey,
       UPPER(c_mktsegment) AS segment
FROM customer
WHERE c_custkey % 11 = 0
"""


QUERIES = {
    "explode_embedding": explode_embedding,
    "explode_tokens_outer": explode_tokens_outer,
    "struct_with_field": struct_with_field,
    "flatten_struct_star": flatten_struct_star,
}

ORACLE = {
    "explode_embedding": _EXPLODE_SQL,
    "explode_tokens_outer": _EXPLODE_TOKENS_SQL,
    "struct_with_field": _WITH_FIELD_SQL,
    "flatten_struct_star": _FLATTEN_SQL,
}
