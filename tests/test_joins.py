"""Join pack: semantics + plan shape (broadcast where intended, no
cartesian explosion in the range join)."""

from __future__ import annotations

from rq_spark.queries import joins


def _plan(df) -> str:
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_q3_broadcasts_filtered_dim(spark, sf_dir):
    plan = _plan(joins.join_broadcast_q3(spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_range_join_is_not_nested_loop(spark, sf_dir):
    plan = _plan(joins.join_range_price_band(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # bucketed equi-join path
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_asof_semantics(spark, sf_dir):
    rows = joins.join_asof_event(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        if r.view_ts is None:
            continue
        if r.op == "backward":
            assert r.view_ts <= r.purchase_ts
        elif r.op == "forward":
            assert r.view_ts >= r.purchase_ts
    # nearest is never farther than either directed match
    by_event = {}
    for r in rows:
        by_event.setdefault(r.event_id, {})[r.op] = r
    for ops in by_event.values():
        near = ops["nearest"].view_ts
        p = ops["nearest"].purchase_ts
        for d in ("backward", "forward"):
            other = ops[d].view_ts
            if other is not None:
                assert near is not None
                assert abs(near - p) <= abs(other - p)


def test_semi_anti_partition_customers(spark, sf_dir):
    from rq_spark.queries.helpers import table

    total = table(spark, sf_dir, "customer").count()
    semi = joins.join_semi_active_customers(spark, sf_dir).count()
    anti = joins.join_anti_inactive_customers(spark, sf_dir).count()
    assert semi + anti == total
    assert semi > 0 and anti > 0


def test_full_outer_covers_both_sides(spark, sf_dir):
    rows = joins.join_full_nation_activity(spark, sf_dir).collect()
    assert all(r.nationkey is not None for r in rows)
    assert any(r.n_customers is not None for r in rows)
