"""asof_join (operators/asof.py): direction semantics, exact-match
inclusion, equidistant tie rule, tolerance nulling, single-window
plan."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from rq_spark.operators.asof import asof_join


def _ts(s: int) -> datetime:
    return datetime(2024, 1, 1, 0, 0, s)


def _frames(spark):
    left = spark.createDataFrame(
        [(1, _ts(15), 100), (1, _ts(20), 101), (1, _ts(3), 102), (2, _ts(9), 103)],
        ["k", "ts", "id"],
    )
    right = spark.createDataFrame(
        [(1, _ts(10), 1.0), (1, _ts(20), 2.0), (1, _ts(30), 3.0)],
        ["k", "ts", "v"],
    )
    return left, right


def _run(spark, direction, tolerance=None):
    left, right = _frames(spark)
    out = asof_join(
        left, right, "k", "ts", direction=direction, tolerance_micros=tolerance
    )
    return {r.id: (r.asof_ts, r.v) for r in out.collect()}


def test_asof_backward(spark):
    got = _run(spark, "backward")
    assert got[100] == (_ts(10), 1.0)
    assert got[101] == (_ts(20), 2.0)   # exact match included
    assert got[102] == (None, None)     # nothing before
    assert got[103] == (None, None)     # key with no right rows


def test_asof_forward(spark):
    got = _run(spark, "forward")
    assert got[100] == (_ts(20), 2.0)
    assert got[101] == (_ts(20), 2.0)   # exact match included
    assert got[102] == (_ts(10), 1.0)
    assert got[103] == (None, None)


def test_asof_nearest_prefers_backward_on_tie(spark):
    got = _run(spark, "nearest")
    # id 100 at 15: back=10 (d=5), fwd=20 (d=5) -> tie -> backward
    assert got[100] == (_ts(10), 1.0)
    assert got[101] == (_ts(20), 2.0)
    assert got[102] == (_ts(10), 1.0)   # only forward exists
    assert got[103] == (None, None)


def test_asof_tolerance_nulls_far_matches(spark):
    got = _run(spark, "backward", tolerance=3_000_000)  # 3s
    assert got[100] == (None, None)     # 5s away > 3s
    assert got[101] == (_ts(20), 2.0)   # exact, 0s


def test_asof_nearest_is_one_window_pass(spark):
    """nearest evaluates both frames off ONE sort: a single Exchange
    and no join in the plan."""
    left, right = _frames(spark)
    out = asof_join(left, right, "k", "ts", direction="nearest")
    plan = (
        out._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    assert "Join" not in plan
    assert plan.count("Exchange") == 1


def test_asof_join_directions_matches_single_direction_calls(spark):
    """The one-pass multi-direction operator returns exactly the three
    single-direction results, and the whole family costs ONE Exchange."""
    from rq_spark.operators.asof import asof_join_directions

    left, right = _frames(spark)
    multi = asof_join_directions(left, right, "k", "ts")
    got = {r.id: r for r in multi.collect()}
    for d in ("backward", "forward", "nearest"):
        single = _run(spark, d)
        for _id, (ts, v) in single.items():
            assert got[_id][f"{d}_asof_ts"] == ts, (d, _id)
            assert got[_id][f"{d}_v"] == v, (d, _id)

    plan = (
        multi._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    assert plan.count("Exchange") == 1
    assert plan.count("Window") == 1


def test_asof_matched_row_stays_atomic_with_null_values(spark):
    """A NULL value in the matched right row must come back as that
    row's NULL — never a value smuggled from an earlier right row
    (the per-column ignorenulls pitfall)."""
    left = spark.createDataFrame([(1, _ts(25), 100)], ["k", "ts", "id"])
    right = spark.createDataFrame(
        [(1, _ts(10), 1.0), (1, _ts(20), None)], ["k", "ts", "v"]
    )
    r = asof_join(left, right, "k", "ts", direction="backward").collect()[0]
    assert r.asof_ts == _ts(20) and r.v is None
    # tolerance is measured against the matched row's ts (20, 5s away)
    tol = asof_join(
        left, right, "k", "ts", direction="backward",
        tolerance_micros=4_000_000,
    ).collect()[0]
    assert tol.asof_ts is None and tol.v is None
    # forward + nearest directions hold the same atomicity
    fr = asof_join(left, right, "k", "ts", direction="nearest").collect()[0]
    assert fr.asof_ts == _ts(20) and fr.v is None
    from rq_spark.operators.asof import asof_join_directions

    m = asof_join_directions(left, right, "k", "ts").collect()[0]
    assert m["backward_asof_ts"] == _ts(20) and m["backward_v"] is None
