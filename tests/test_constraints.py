"""Declarative DQ constraints (operators/constraints.py): observed
fractions, pass/fail thresholds, FK orphans incl. NULL keys, and the
one-aggregation plan."""

from __future__ import annotations

from rq_spark.operators import constraints as C


def _df(spark):
    return spark.createDataFrame(
        [
            (1, 1, 10.0, "A"),
            (1, 2, 20.0, "B"),
            (1, 2, 30.0, "A"),    # duplicate (k1, k2)
            (2, 1, None, "A"),    # NULL value
            (2, 2, 500.0, "Z"),   # out of range + out of set
        ],
        ["k1", "k2", "v", "flag"],
    )


def test_check_suite_observed_and_passed(spark):
    out = C.check_suite(
        _df(spark),
        [
            C.completeness("v"),
            C.uniqueness("k1", "k2"),
            C.in_range("v", 0, 100),
            C.in_set("flag", ["A", "B"]),
        ],
    )
    got = {r.check: r for r in out.collect()}
    assert got["completeness(v)"].observed == 4 / 5
    assert got["completeness(v)"].passed == 0
    assert got["uniqueness(k1, k2)"].observed == 4 / 5
    # NULL v fails the range test (NULL comparison -> not counted)
    assert got["in_range(v, 0, 100)"].observed == 3 / 5
    assert got["in_set(flag)"].observed == 4 / 5
    assert all(r.n == 5 for r in got.values())


def test_check_suite_all_pass(spark):
    df = _df(spark).filter("k2 = 1")
    out = C.check_suite(df, [C.uniqueness("k1"), C.in_set("flag", ["A"])])
    assert all(r.passed == 1 for r in out.collect())


def test_check_suite_is_one_scan(spark):
    out = C.check_suite(
        _df(spark),
        [C.completeness("v"), C.in_range("v", 0, 100), C.uniqueness("k1", "k2")],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ") <= 1


def test_fk_check_orphans_and_null_keys(spark):
    child = spark.createDataFrame(
        [(1, "x"), (2, "y"), (9, "z"), (None, "w")], ["fk", "payload"]
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], ["pk"])
    r = C.fk_check(child, ["fk"], parent, ["pk"]).collect()[0]
    # 9 is an orphan; NULL never joins -> also an orphan
    assert r.observed == 2 / 4
    assert r.passed == 0 and r.n == 4
    ok = C.fk_check(
        child.filter("fk IS NOT NULL AND fk <= 2"), ["fk"], parent, ["pk"]
    ).collect()[0]
    assert ok.passed == 1 and ok.observed == 1.0


def test_uniqueness_counts_null_key_tuples(spark):
    """NULL key components still count as tuples (SQL DISTINCT-row
    semantics): no duplicates -> pass; duplicated NULL rows -> fail."""
    ok = spark.createDataFrame(
        [(1, "a"), (None, "b")], "k long, x string"
    )
    r = C.check_suite(ok, [C.uniqueness("k")]).collect()[0]
    assert r.observed == 1.0 and r.passed == 1
    dup = spark.createDataFrame(
        [(None, "a"), (None, "b")], "k long, x string"
    )
    r2 = C.check_suite(dup, [C.uniqueness("k")]).collect()[0]
    assert r2.observed == 0.5 and r2.passed == 0


def test_check_suite_empty_checks_raises(spark):
    df = spark.createDataFrame([(1,)], ["x"])
    import pytest as _pytest

    with _pytest.raises(ValueError, match="non-empty"):
        C.check_suite(df, [])


def test_check_suite_empty_table_vacuous_pass(spark):
    """n = 0 is a defined vacuous pass (observed 1.0), never a NULL
    propagating into the passed flag."""
    empty = spark.createDataFrame([], "k long, x string")
    rows = C.check_suite(
        empty, [C.completeness("x"), C.uniqueness("k")]
    ).collect()
    assert len(rows) == 2
    for r in rows:
        assert r.observed == 1.0 and r.passed == 1 and r.n == 0
    fk = C.fk_check(empty, ["k"], empty.select("k"), ["k"]).collect()[0]
    assert fk.observed == 1.0 and fk.passed == 1 and fk.n == 0
