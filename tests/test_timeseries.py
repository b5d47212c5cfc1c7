"""Fixed-point EWMA (operators/timeseries.py).

The catalog branch window_frames/'ewma' is driver-hash-checked against
the recursive-CTE oracle; these tests pin the recurrence against an
independent Python loop, the ordering contract, and the exact
decimal-micro conversion."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from rq_spark.operators.timeseries import ewma_fixed

T0 = datetime(2024, 1, 1)


def _ref(values):
    s = None
    out = []
    for v in values:
        x = round(v * 1_000_000)
        s = x if s is None else (s + x) >> 1
        out.append(s)
    return out


@pytest.fixture(scope="module")
def ev(spark):
    rows = []
    for u, vals in ((1, [100.5, 2.25, 37.123456, 0.01]), (2, [7.0])):
        for i, v in enumerate(vals):
            rows.append((u, i + 10, T0 + timedelta(minutes=i), v))
    # user 3: same ts twice — event_id breaks the tie
    rows += [(3, 2, T0, 4.0), (3, 1, T0, 8.0)]
    return spark.createDataFrame(rows, ["user_id", "event_id", "ts", "value"])


def test_matches_python_reference(ev):
    got = {}
    for r in ewma_fixed(ev, "user_id", ["ts", "event_id"], "value").collect():
        got.setdefault(r["user_id"], []).append((r["seq"], r["event_id"], r["ewma_micros"]))
    got = {u: [x for _, _, x in sorted(v)] for u, v in got.items()}
    assert got[1] == _ref([100.5, 2.25, 37.123456, 0.01])
    assert got[2] == _ref([7.0])
    # tie at identical ts resolved by event_id: 8.0 (id 1) before 4.0 (id 2)
    assert got[3] == _ref([8.0, 4.0])


def test_validation(ev):
    with pytest.raises(ValueError):
        ewma_fixed(ev, "user_id", [], "value")


def test_negative_values_floor_consistent(spark):
    """Negative inputs: Spark's shiftright is floor-halving; the DuckDB
    oracle must use `>> 1` (arithmetic shift), NOT `// 2` (truncates
    toward zero: -7//2 = -3 vs -7>>1 = -4). This replays the exact
    catalog oracle CTE against duckdb on a negative fixture — a
    regression to `//` flips these values."""
    import duckdb

    from rq_spark.operators.timeseries import ewma_cte_sql

    vals = [-7.0, -0.000003, 5.5, -123.456789, 0.0, -1.0]
    rows = [(1, i, T0 + timedelta(minutes=i), v) for i, v in enumerate(vals)]
    ev = spark.createDataFrame(rows, ["user_id", "event_id", "ts", "value"])
    got = [
        r["ewma_micros"]
        for r in ewma_fixed(ev, "user_id", ["ts", "event_id"], "value")
        .orderBy("seq")
        .collect()
    ]
    assert got == _ref(vals)

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events AS SELECT * FROM (VALUES "
        + ", ".join(
            f"(1, {i}, TIMESTAMP '2024-01-01 00:{i:02d}:00', {v})"
            for i, v in enumerate(vals)
        )
        + ") t(user_id, event_id, ts, value)"
    )
    sql = (
        "WITH RECURSIVE _seed AS (SELECT 1)"
        + ewma_cte_sql("events", "user_id", "ts, event_id", "value")
        + "\nSELECT s FROM ew ORDER BY seq"
    )
    assert [r[0] for r in con.execute(sql).fetchall()] == got
