"""interval_overlap_join (operators/intervals.py): overlap semantics,
exactly-once reporting across multi-bin spans, plan has no dedup."""

from __future__ import annotations

from pyspark.sql import functions as F

from rq_spark.operators.intervals import interval_overlap_join


def _pairs(spark, rows_a, rows_b, w=10):
    a = spark.createDataFrame(rows_a, ["k", "id", "s", "e"])
    b = spark.createDataFrame(rows_b, ["k", "id", "s", "e"])
    out = interval_overlap_join(a, b, "k", "s", "e", bin_width=w)
    return sorted((r.a_id, r.b_id) for r in out.collect())


def test_overlap_semantics_closed_intervals(spark):
    a = [(1, 1, 0, 10), (1, 2, 50, 60), (2, 3, 0, 100)]
    b = [(1, 10, 10, 20),   # touches id 1 at point 10 (closed: overlap)
         (1, 11, 61, 70),   # just after id 2: no overlap
         (1, 12, 55, 58),   # inside id 2
         (2, 13, 99, 300)]  # overlaps id 3
    assert _pairs(spark, a, b) == [(1, 10), (2, 12), (3, 13)]


def test_multi_bin_pairs_reported_exactly_once(spark):
    """A pair sharing MANY bins (long intervals, small bin width) must
    come back once — the report-once rule, not a dropDuplicates."""
    a = [(1, 1, 0, 95)]
    b = [(1, 2, 5, 90)]
    rows = _pairs(spark, a, b, w=10)  # ~9 shared bins
    assert rows == [(1, 2)]


def test_no_dedup_no_nested_loop_in_plan(spark):
    a = spark.range(100).select(
        F.lit(1).alias("k"), F.col("id"), (F.col("id") * 7).alias("s"),
        (F.col("id") * 7 + 20).alias("e"),
    )
    out = interval_overlap_join(a, a, "k", "s", "e", bin_width=16)
    plan = (
        out._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    assert "NestedLoop" not in plan
    # report-once filter replaces dedup: no agg/distinct after the join
    assert "HashAggregate" not in plan and "SortAggregate" not in plan
