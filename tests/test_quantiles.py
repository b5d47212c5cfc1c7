"""Histogram-exact quantiles (operators/profiling.py): value equality
with the nearest-rank definition and the shuffle-∝-distinct plan."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from rq_spark.operators.profiling import exact_quantiles_histogram


def _nearest_rank(vals: list[int], q: int) -> int:
    s = sorted(vals)
    return s[max(0, math.ceil(q * len(s) / 100) - 1)]


def test_qhist_matches_nearest_rank_reference(spark):
    rng = random.Random(7)
    # heavy ties (20 distinct values across 3000 rows) + ragged groups
    rows = [
        (g, rng.choice([rng.randrange(20), 0, 19]))
        for g in ("a", "b", "c")
        for _ in range(rng.randrange(800, 1200))
    ]
    df = spark.createDataFrame(rows, ["g", "v"])
    got = {
        r["g"]: (r["n"], r["p25"], r["p50"], r["p90"])
        for r in exact_quantiles_histogram(df, "g", "v", [25, 50, 90]).collect()
    }
    by_g: dict[str, list[int]] = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(v)
    want = {
        g: (
            len(vs),
            _nearest_rank(vs, 25),
            _nearest_rank(vs, 50),
            _nearest_rank(vs, 90),
        )
        for g, vs in by_g.items()
    }
    assert got == want


def test_qhist_extremes_and_single_row_group(spark):
    df = spark.createDataFrame(
        [("s", 42)] + [("m", v) for v in range(1, 101)], ["g", "v"]
    )
    got = {
        r["g"]: (r["p1"], r["p100"])
        for r in exact_quantiles_histogram(df, "g", "v", [1, 100]).collect()
    }
    assert got == {"s": (42, 42), "m": (1, 100)}


def test_qhist_aggregates_before_the_window(spark):
    """The point of the histogram plan: rows collapse to (group, value)
    counts BEFORE any window/sort touches them, so the shuffle is ∝
    distinct values. A regression to percentile()-style per-group row
    sort would put the Window/Sort below the first aggregate."""
    df = spark.range(100000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") % 50).alias("v"),
    )
    plan = (
        exact_quantiles_histogram(df, "g", "v", [50])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    first_agg = plan.rindex("HashAggregate")  # deepest operator = last printed
    assert "Window" in plan
    assert plan.index("Window") < first_agg, (
        "histogram aggregate must run below (after-in-dataflow, "
        "printed-above) the cumulative window"
    )


def test_mad_outlier_report_hand_computed(spark):
    """median/MAD/outlier-count vs a hand-computed reference, incl. a
    group whose single far value exceeds 3*MAD."""
    from rq_spark.operators.profiling import mad_outlier_report

    rows = (
        [("a", v) for v in [10, 12, 14, 16, 18, 1000]]  # med 14, MAD 2-4
        + [("b", v) for v in [5, 5, 5]]                  # MAD 0
    )
    df = spark.createDataFrame(rows, ["g", "v"])
    got = {r.g: r for r in mad_outlier_report(df, "g", "v", k=3).collect()}
    # nearest-rank on 6 values: p50 = 3rd smallest = 14
    # deviations: 0,2,2,4,4,986 -> p50 = 3rd = 2 -> outliers: 4>6? no;
    # 986>6 yes -> 1... deviations sorted: 0,2,2,4,4,986; rank test
    assert (got["a"].median, got["a"].mad) == (14, 2)
    assert got["a"].n_outliers == 1 and got["a"].n == 6
    # constant group: MAD 0, everything equals the median, no outliers
    assert (got["b"].median, got["b"].mad, got["b"].n_outliers) == (5, 0, 0)


def test_drift_report_tvd_hand_computed(spark):
    """TVD vs hand-computed fractions; identical halves drift 0."""
    from pyspark.sql import functions as F

    from rq_spark.operators.profiling import drift_report

    rows = [(True, "x"), (True, "x"), (True, "y"),
            (False, "x"), (False, "y"), (False, "y"), (False, "z")]
    df = spark.createDataFrame(rows, ["a", "c"])
    r = drift_report(df, F.col("a"), ["c"]).collect()[0]
    # pA=[2/3,1/3,0], pB=[1/4,1/2,1/4] -> TVD = 5/12
    assert (r.n_a, r.n_b, r.n_values, r.n_only_one_side) == (3, 4, 3, 1)
    assert abs(r.tvd - 5 / 12) < 1e-15

    same = spark.createDataFrame(
        [(True, "x"), (True, "y"), (False, "x"), (False, "y")], ["a", "c"]
    )
    assert drift_report(same, F.col("a"), ["c"]).collect()[0].tvd == 0.0


def test_join_size_report_exact(spark):
    """n_out equals the actually-executed join's count; hot key and
    blowup are exact."""
    from rq_spark.operators.profiling import join_size_report

    a = spark.createDataFrame(
        [(1,), (1,), (1,), (2,), (3,)], ["k"]
    )
    b = spark.createDataFrame([(1,), (1,), (2,), (9,)], ["j"])
    r = join_size_report(a, "k", b, "j").collect()[0]
    real = a.join(b, a.k == b.j).count()
    assert r.n_out == real == 7          # 3*2 + 1*1
    assert r.max_key_out == 6
    assert (r.n_a, r.n_b) == (5, 4)
    assert r.blowup == 7 / 5
    # disjoint keys -> 0, no NULL poisoning
    empty = join_size_report(a, "k", b.filter("j = 9"), "j").collect()[0]
    assert empty.n_out == 0 and empty.blowup == 0.0


def test_mad_and_drift_scan_once(spark):
    """Both reports read their input exactly once: MAD derives the
    deviation histogram from the value histogram, drift folds all
    columns off one Expand."""
    from pyspark.sql import functions as F

    from rq_spark.operators.profiling import drift_report, mad_outlier_report

    df = spark.range(2000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") % 97).alias("v"),
        (F.col("id") % 2 == 0).alias("a"),
    )
    for out in (
        mad_outlier_report(df.select("g", "v"), "g", "v"),
        drift_report(df, F.col("a"), ["g", "v"]),
    ):
        out.collect()
        plan = (
            out._jdf.queryExecution()
            .executedPlan()
            .toString()
            .split("== Initial Plan ==")[0]
        )
        # one source read; every other consumer reuses the first
        # exchange (ReusedExchange / ReusedSubquery)
        assert plan.count("Range") <= 1, plan
