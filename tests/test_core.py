"""Core relational pack: shape/sanity at sf0.001 (the DuckDB
hash-comparison runs in tools/check_oracle.py and the driver gate)."""

from __future__ import annotations

import pytest

from rq_spark.queries import all_oracle_sql, all_queries
from rq_spark.queries import core


def test_catalog_wiring():
    qs = all_queries()
    oracle = all_oracle_sql()
    assert set(oracle) <= set(qs), "oracle keys must be a subset of queries"
    assert "q1_pricing_summary" in qs


def test_q1_shape(spark, sf_dir):
    df = core.q1_pricing_summary(spark, sf_dir)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == [
        "l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
        "sum_disc_price", "sum_charge", "avg_qty", "avg_price",
        "avg_disc", "count_order",
    ]
    # aggregates internally consistent
    for r in rows:
        assert r.sum_qty / r.count_order == pytest.approx(r.avg_qty, rel=1e-9)
        assert r.sum_disc_price <= r.sum_base_price
        assert r.sum_charge >= r.sum_disc_price


def test_set_ops_consistency(spark, sf_dir):
    rows = core.QUERIES["set_ops"](spark, sf_dir).collect()  # registry path works
    by_op = {}
    for r in rows:
        by_op.setdefault(r.op, set()).add(r.v)
    # intersect ⊆ union; branches are set-semantic (no dup values per op)
    assert by_op["intersect"] <= by_op["union"]
    assert sum(len(v) for v in by_op.values()) == len(rows)


def test_rollup_contains_grand_total(spark, sf_dir):
    rows = core.rollup_cube_gsets(spark, sf_dir).collect()
    rollup = [r for r in rows if r.op == "rollup"]
    grand = [r for r in rollup if r.l_returnflag is None and r.l_linestatus is None]
    assert len(grand) == 1
    total = sum(
        r.n for r in rollup if r.l_returnflag is not None and r.l_linestatus is not None
    )
    assert grand[0].n == total
    # cube ⊇ rollup rows; gsets = the two single-dim slices + grand total
    cube = [r for r in rows if r.op == "cube"]
    assert len(cube) >= len(rollup)
    gsets = [r for r in rows if r.op == "gsets"]
    assert all(r.l_returnflag is None or r.l_linestatus is None for r in gsets)


def test_sort_limit_deterministic(spark, sf_dir):
    a = [tuple(r) for r in core.sort_limit(spark, sf_dir).collect()]
    b = [tuple(r) for r in core.sort_limit(spark, sf_dir).collect()]
    assert a == b
    assert len(a) == 10


def test_cast_types_schema(spark, sf_dir):
    df = core.cast_types(spark, sf_dir)
    kinds = dict(df.dtypes)
    assert kinds["qty_int"] == "int"
    assert kinds["line_big"] == "bigint"
    assert kinds["line_str"] == "string"
    assert kinds["ship_date"] == "date"
    # decimal cast is exercised inside the query, but the emitted
    # column is double — decimal cell canonicalization differs between
    # the driver's Spark and DuckDB normalizers
    assert kinds["price_dec"] == "double"


def test_subquery_correlated_leaves_catalog_clean(spark, sf_dir):
    before = {v.name for v in spark.catalog.listTables()}
    assert core.subquery_correlated(spark, sf_dir).count() > 0
    assert {v.name for v in spark.catalog.listTables()} == before


def test_rollup_null_grouping_key_fails_loudly(spark, tmp_path):
    """The single-scan ROLLUP/CUBE re-aggregation requires non-null
    grouping keys (Expand's grouping-nulls would merge with data
    nulls); a violated precondition must raise, not corrupt subtotals."""
    from pyspark.sql import functions as F

    li = spark.createDataFrame(
        [("A", "F", 1.0), (None, "O", 2.0)],
        "l_returnflag string, l_linestatus string, l_quantity double",
    )
    li.write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    with pytest.raises(Exception, match="NULL grouping key"):
        core.rollup_cube_gsets(spark, str(tmp_path)).collect()


def test_normalize_event_time_requires_utc(spark):
    """The ntz->timestamp cast silently shifts instants under a
    non-UTC session zone; normalize_event_time must refuse instead."""
    from pyspark.sql import functions as F

    from rq_spark.errors import IllegalStateError
    from rq_spark.queries.helpers import normalize_event_time

    df = spark.range(1).select(
        F.lit("2024-01-01 12:00:00").cast("timestamp_ntz").alias("ts")
    )
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        with pytest.raises(IllegalStateError, match="UTC"):
            normalize_event_time(df)
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    # restored: the cast is accepted again
    assert dict(normalize_event_time(df).dtypes)["ts"] == "timestamp"
