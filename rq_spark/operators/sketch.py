"""Count-Min Sketch frequency estimation / heavy hitters.

CMS (Cormode & Muthukrishnan, "An improved data stream summary: the
count-min sketch and its applications", J. Algorithms 2005): a d×w
matrix of counters; each item increments one counter per row (bucket =
h_seed(item) mod w); the frequency estimate is the MIN over the d
counters, which never underestimates and overestimates by at most
εN with probability 1-δ for w=⌈e/ε⌉, d=⌈ln 1/δ⌉.

Why this exists next to ``approx_count_distinct``: HLL answers "how
many distinct"; CMS answers "how often does each item occur" in O(d·w)
memory — the building block for heavy-hitter reports over corpora too
large for an exact vocabulary shuffle to be cheap.

Cross-engine determinism (the oracle story): the hash is the first 8
hex chars of md5("<seed>:<item>") read as an integer, mod w. Spark
computes it as ``conv(substring(md5(..), 1, 8), 16, 10)`` and DuckDB
as ``('0x' || substr(md5(..), 1, 8))::BIGINT`` — bit-identical, so the
sketch, the estimates, and the heavy-hitter set are hash-exact against
the SQL oracle (no tolerance flag needed).

Scale shape:
* sketch build — one explode (×d) + one partial-agg shuffle whose key
  space is ≤ d·w rows TOTAL (not per-item): the map-side combine
  reduces every partition to ≤ d·w rows before the exchange.
* probing — the sketch is ≤ d·w rows, always broadcast; the probe side
  streams. Estimating a candidate set never shuffles the corpus.
* the demo probes the full distinct-item relation (so the oracle can
  assert the no-underestimate invariant per item); a production caller
  passes any candidate relation (e.g. per-partition local top-k).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cms_bucket(item: Column, seed: Column | int, width: int) -> Column:
    """Row-`seed` bucket for `item`: int(md5("<seed>:<item>")[:8], 16) % width."""
    seed_col = F.lit(str(seed)) if isinstance(seed, int) else seed.cast("string")
    h = F.md5(F.concat(seed_col, F.lit(":"), item))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % width).alias(
        "bucket"
    )


def _seeds(depth: int) -> Column:
    return F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("seed")


def cms_sketch(
    items: DataFrame, item_col: str, depth: int = 4, width: int = 32
) -> DataFrame:
    """Build the d×w sketch from a one-row-per-occurrence relation.

    Returns (seed, bucket, c) — at most depth×width rows. Absent
    (seed, bucket) combinations are implicitly zero."""
    if depth < 1 or width < 1:
        raise ValueError(f"cms_sketch: depth={depth} width={width} must be >= 1")
    tagged = items.select(F.col(item_col).alias("item"), _seeds(depth))
    return (
        tagged.withColumn("bucket", cms_bucket(F.col("item"), F.col("seed"), width))
        .groupBy("seed", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_estimate(
    candidates: DataFrame,
    sketch: DataFrame,
    item_col: str,
    depth: int,
    width: int,
) -> DataFrame:
    """Point-query the sketch for every row of `candidates`.

    Returns `candidates` + an `est` column (min over the d counters).
    The sketch is broadcast (≤ d·w rows); the candidate side streams —
    no corpus shuffle. A candidate whose buckets are all absent from
    the sketch gets est=0 (cannot happen when candidates ⊆ items)."""
    probes = candidates.select("*", _seeds(depth)).withColumn(
        "bucket", cms_bucket(F.col(item_col), F.col("seed"), width)
    )
    joined = probes.join(F.broadcast(sketch), ["seed", "bucket"], "left")
    keys = [c for c in candidates.columns]
    return (
        joined.groupBy(*keys)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("est"))
    )


def cms_heavy_hitters(
    items: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 32,
    inv_frac: int = 64,
) -> DataFrame:
    """Items whose CMS-estimated frequency is ≥ total/inv_frac.

    Returns (item, cnt, est, never_under): exact count (for the
    report), sketch estimate, and the CMS no-underestimate invariant
    est ≥ cnt — a structural property the oracle re-derives and the
    driver hash therefore pins. Integer threshold arithmetic
    (est·inv_frac ≥ total) so both engines compare exactly."""
    if inv_frac < 1:
        raise ValueError(f"cms_heavy_hitters: inv_frac={inv_frac} must be >= 1")
    sk = cms_sketch(items, item_col, depth, width)
    counts = items.groupBy(F.col(item_col).alias("item")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    total = counts.agg(F.sum("cnt").alias("_total"))
    est = cms_estimate(counts, sk, "item", depth, width)
    return (
        est.crossJoin(F.broadcast(total))
        .filter(F.col("est") * inv_frac >= F.col("_total"))
        .select(
            "item",
            "cnt",
            "est",
            (F.col("est") >= F.col("cnt")).alias("never_under"),
        )
    )
