"""Similarity-search pack over the `embeddings` table.

`sim_topk_cosine` is exact and oracle-checked (bit-identical dot
products, see operators/similarity.py). `sim_ann_lsh_topk` is the
approximate scale path — rows-only check here, recall vs. brute force
asserted in tests/test_similarity.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import similarity as S
from .helpers import table

_N_QUERIES = 5
_K = 10


def _query_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < _N_QUERIES)


def sim_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NB: dim stays None — the unrolled dot only wins inside
    # whole-stage codegen, and the broadcast cross join here runs
    # interpreted, where the fold is ~3× faster (measured at sf0.1)
    corpus = table(spark, sf_dir, "embeddings")
    return S.brute_topk(corpus, _query_vectors(spark, sf_dir), k=_K)


_TOPK_SQL = f"""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
), scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_dot_product(q.e, c.e)
           / (sqrt(list_dot_product(q.e, q.e)) * sqrt(list_dot_product(c.e, c.e)))
           AS cos_sim
  FROM v q JOIN v c ON q.vec_id <> c.vec_id
  WHERE q.vec_id < {_N_QUERIES}
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id ASC) AS rk
  FROM scored
)
SELECT query_id, neighbor_id, cos_sim, rk FROM ranked WHERE rk <= {_K}
"""


def sim_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded-LSH ANN top-k (rows-only; recall ≥0.9 vs brute force is
    asserted in tests/test_similarity.py)."""
    corpus = table(spark, sf_dir, "embeddings")
    return S.ann_topk(
        corpus, _query_vectors(spark, sf_dir), k=_K, bands=24, rows_per_band=4
    )


def sim_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) ANN top-k: coarse k-means cells + nprobe
    cell-probed exact rerank (rows-only; recall vs brute force is
    asserted in tests/test_similarity.py). The data-adaptive
    complement to the data-oblivious banded-LSH path."""
    corpus = table(spark, sf_dir, "embeddings")
    return S.ivf_topk(
        corpus, _query_vectors(spark, sf_dir), k=_K, n_centroids=16, nprobe=8
    )


def sim_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both ANN families in one tagged result (branches = the former
    sim_ann_lsh_topk, sim_ann_ivf_topk; approximate by construction →
    rows-only driver check, per-branch recall asserted in tests)."""

    def tag(df: DataFrame, op: str) -> DataFrame:
        return df.select(F.lit(op).alias("op"), "*")

    return tag(sim_ann_lsh_topk(spark, sf_dir), "lsh").unionByName(
        tag(sim_ann_ivf_topk(spark, sf_dir), "ivf")
    )


QUERIES = {
    "sim_topk_cosine": sim_topk_cosine,
    "sim_ann_topk": sim_ann_topk,
}

ORACLE = {
    "sim_topk_cosine": _TOPK_SQL,
    # sim_ann_topk: approximate by construction → rows-only
}
