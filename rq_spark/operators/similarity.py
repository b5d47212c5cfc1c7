"""Similarity search over embedding columns (array<float>).

* Brute-force cosine top-k: broadcast the (small) query set against the
  full corpus — one pass, no shuffle of the corpus, window top-k per
  query. The dot product is a sequential JVM fold so results are
  bit-deterministic (verified bit-identical to DuckDB's
  list_dot_product in tools/check_oracle.py).
* LSH (random hyperplane) ANN: bucket vectors by sign-pattern against
  H fixed hyperplanes (seeded numpy matrix → deterministic), search
  only within the probe's bucket(s). At 100 TB the bucket join replaces
  the corpus broadcast; recall is tested against brute force.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_DOUBLE_ARR = "array<double>"


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double (deterministic order)."""
    return F.aggregate(
        F.zip_with(a.cast(_DOUBLE_ARR), b.cast(_DOUBLE_ARR), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k cosine neighbors per query vector (exact).

    queries is expected to be small → broadcast; the corpus streams
    through one stage (no shuffle) and only (query, k) survivors hit
    the window shuffle.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("q_vec"), F.col("c_vec")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rk")
    )


def hyperplanes(n_planes: int, dim: int, seed: int = 42) -> np.ndarray:
    """Deterministic random hyperplanes shared by all workers."""
    return np.random.default_rng(seed).standard_normal((n_planes, dim))


def lsh_bucket_udf(planes: np.ndarray):
    """mapInPandas-style bucketing: one numpy matmul per Arrow batch
    (the matmul is why this is a pandas UDF, not 16 fold expressions)."""

    @F.pandas_udf("int")
    def bucket(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="int32")
        m = np.stack(vecs.to_numpy())  # (batch, dim)
        bits = (m @ planes.T) > 0  # (batch, n_planes)
        out = np.zeros(len(vecs), dtype=np.int32)
        for i in range(planes.shape[0]):
            out |= bits[:, i].astype(np.int32) << i
        return pd.Series(out)

    return bucket


def ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: equi-join on LSH bucket, then exact cosine +
    window inside the bucket. 2^n_planes buckets → candidate set is
    ~corpus/2^n per query instead of the whole corpus."""
    bucket = lsh_bucket_udf(hyperplanes(n_planes, dim))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        bucket(F.col(vec_col)).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        bucket(F.col(vec_col)).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("q_vec"), F.col("c_vec")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rk")
    )


def embedding_near_pairs(
    corpus: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs with cosine ≥ threshold (exact, self-join).

    The O(n²) layout is acceptable here because per-pair cost is one
    fused fold; the scale path for 100 TB is `ann_topk`'s bucket join
    with a post-filter, traded for recall < 1.
    """
    a = corpus.select(F.col(id_col).alias("a_id"), F.col(vec_col).alias("a_vec"))
    b = corpus.select(F.col(id_col).alias("b_id"), F.col(vec_col).alias("b_vec"))
    return (
        a.join(b, F.col("a_id") < F.col("b_id"))
        .select(
            "a_id",
            "b_id",
            cosine(F.col("a_vec"), F.col("b_vec")).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
