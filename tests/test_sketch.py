"""Count-Min Sketch operator (operators/sketch.py).

Evidence tiers: the catalog branch agg_approx_distinct/'cms_hh' is
driver-hash-checked against the DuckDB oracle; these tests pin the
operator's structural invariants independently of the corpus:
bucket-hash parity with Python's md5, the no-underestimate guarantee,
exactness when the sketch is wide, forced collisions when narrow, and
the broadcast shape of the probe join.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from rq_spark.operators.sketch import (
    cms_bucket,
    cms_estimate,
    cms_heavy_hitters,
    cms_sketch,
)

WORDS = (
    ["alpha"] * 40 + ["beta"] * 25 + ["gamma"] * 12 + ["delta"] * 5
    + ["epsilon", "zeta", "eta", "theta", "iota", "kappa"]  # singletons
)


def _py_bucket(item: str, seed: int, width: int) -> int:
    h = hashlib.md5(f"{seed}:{item}".encode()).hexdigest()
    return int(h[:8], 16) % width


@pytest.fixture(scope="module")
def items(spark):
    return spark.createDataFrame([(w,) for w in WORDS], ["w"])


def test_bucket_matches_python_md5(spark):
    rows = (
        spark.createDataFrame([("alpha",), ("beta",), ("ångström",)], ["w"])
        .select("w", *[cms_bucket(F.col("w"), s, 32).alias(f"b{s}") for s in range(3)])
        .collect()
    )
    for r in rows:
        for s in range(3):
            assert r[f"b{s}"] == _py_bucket(r["w"], s, 32), (r["w"], s)


def test_sketch_mass_conservation(spark, items):
    """Every row of the sketch sums to the total occurrence count."""
    sk = cms_sketch(items, "w", depth=3, width=8)
    per_seed = {r["seed"]: r["s"] for r in sk.groupBy("seed").agg(F.sum("c").alias("s")).collect()}
    assert per_seed == {0: len(WORDS), 1: len(WORDS), 2: len(WORDS)}


def test_never_underestimates_and_exact_when_wide(spark, items):
    truth = {w: WORDS.count(w) for w in set(WORDS)}
    counts = items.groupBy(F.col("w").alias("item")).agg(F.count(F.lit(1)).alias("cnt"))
    # narrow: collisions certain (10 distinct items into 4 buckets)
    narrow = cms_estimate(counts, cms_sketch(items, "w", depth=2, width=4), "item", 2, 4)
    over = 0
    for r in narrow.collect():
        assert r["est"] >= truth[r["item"]], r
        over += int(r["est"] > truth[r["item"]])
    assert over > 0, "w=4 over 10 items must produce at least one collision"
    # wide: 2^16 buckets, 10 items — exact with near-certainty for this fixed hash
    wide = cms_estimate(counts, cms_sketch(items, "w", depth=4, width=65536), "item", 4, 65536)
    for r in wide.collect():
        assert r["est"] == truth[r["item"]], r


def test_heavy_hitters_vs_brute_force(spark, items):
    """With a wide (collision-free) sketch the heavy-hitter set equals
    the exact frequency filter; invariant column is all-true."""
    hh = {r["item"]: r for r in cms_heavy_hitters(items, "w", depth=4, width=65536, inv_frac=8).collect()}
    truth = {w: WORDS.count(w) for w in set(WORDS)}
    expect = {w for w, c in truth.items() if c * 8 >= len(WORDS)}
    assert set(hh) == expect
    for r in hh.values():
        assert r["never_under"] and r["est"] == r["cnt"] == truth[r["item"]]


def test_probe_join_is_broadcast(spark, items):
    """The sketch side of the probe join must broadcast — a shuffled
    probe join would move the corpus at 100 TB."""
    counts = items.groupBy(F.col("w").alias("item")).agg(F.count(F.lit(1)).alias("cnt"))
    est = cms_estimate(counts, cms_sketch(items, "w", depth=4, width=32), "item", 4, 32)
    plan = est._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_validation():
    with pytest.raises(ValueError):
        cms_sketch(None, "w", depth=0, width=8)
    with pytest.raises(ValueError):
        cms_heavy_hitters(None, "w", inv_frac=0)


def test_hll_union_is_lossless_vs_global_sketch(spark):
    """Late r8 (the 'hll_union' branch's mergeability contract): the
    union of per-sub-group Datasketches HLL sketches estimates EXACTLY
    what one global sketch over the same keys estimates — sketch
    merging loses nothing, which is why per-partition sketches can
    roll up across days/shards at 100 TB without re-scanning keys."""
    rows = [(i % 7, i % 3, i * 31 % 101) for i in range(2000)]
    df = spark.createDataFrame(rows, ["g", "sub", "k"])
    direct = {
        r["g"]: r["est"]
        for r in df.groupBy("g")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("k")).alias("est"))
        .collect()
    }
    unioned = {
        r["g"]: r["est"]
        for r in df.groupBy("g", "sub")
        .agg(F.hll_sketch_agg("k").alias("sk"))
        .groupBy("g")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()
    }
    assert direct == unioned
    exact = {r["g"]: r["n"] for r in df.groupBy("g").agg(F.count_distinct("k").alias("n")).collect()}
    for g, est in unioned.items():
        assert abs(est - exact[g]) / exact[g] <= 0.05
