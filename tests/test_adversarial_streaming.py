"""Hostile-stream gate (r11, r10 verdict task #6): the adversarial
probing the r10 edge corpus did for batch keys, extended to the
STREAMING operators — the three hostilities a real event source
actually produces:

* **out-of-order storms straddling the watermark** — a later
  micro-batch delivers events hours OLDER than everything already
  seen (far past the 30 min / 2 h watermarks);
* **duplicate event_ids across micro-batch boundaries** — the
  redelivery shape of every at-least-once source;
* **NULL timestamps and NULL values** — rows with no position on the
  event timeline, and rows a SUM must skip.

Micro-batch boundaries are REAL here: the hostile events are split
across three parquet files with strictly increasing mtimes and driven
with ``maxFilesPerTrigger=1`` (FileStreamSource processes files in
mtime order), so file k IS micro-batch k. The catalog stream keys
read a single `events.parquet` (the documented pathGlobFilter
gotcha), so they get the single-file hostile corpus under the same
NULL-or-named-ValueError policy as the batch edge gate.

Pinned semantics (each asserted against a Python/batch oracle):

* tumble (complete mode): watermark drops nothing in complete mode,
  so streaming == the same Spark expressions run in batch — exactly,
  regardless of arrival order;
* streaming dedup: emitted key set == batch DISTINCT, duplicates and
  order notwithstanding;
* first_seen: NULL-ts rows dropped at intake; exactly ONE row per
  remaining user; output is final on first emit, so the expected
  winner is the (ts, event_id)-min within the user's FIRST-APPEARANCE
  micro-batch (computable here because file == batch); a NULL value
  on the winner emits as NULL (used to raise a bare TypeError);
* running stats: every non-NULL-ts event emitted exactly once; per
  key, max(run_n) == that key's event count and the final run_sum ==
  the exact decimal sum with SQL SUM's skip-NULL semantics — both
  order-independent invariants (integer micro-unit addition
  commutes), so they hold even under cross-batch disorder;
* interval join: late rows past the watermark may be dropped but
  never invented — the emitted pair set is a subset of the batch
  join, and pairs wholly inside one micro-batch are always present.
"""

from __future__ import annotations

import os
import shutil
from datetime import datetime, timedelta

import duckdb
import pytest
from pyspark.sql import functions as F

SRC = "/root/testdata/sf0.001"

T0 = datetime(2024, 3, 1, 10, 0, 0)


def _ev(eid, minutes, uid, etype, value):
    """(event_id, ts, user_id, event_type, value, props); minutes=None
    → NULL timestamp."""
    ts = None if minutes is None else T0 + timedelta(minutes=minutes)
    return (eid, ts, uid, etype, value, None)


#: micro-batch 0 — a normal hour of traffic, users 1-3
_BATCH0 = [
    _ev(1, 0.0, 1, "view", 1.0),
    _ev(2, 5.0, 1, "purchase", 10.0),
    _ev(3, 10.0, 2, "view", 2.0),
    _ev(4, 40.0, 2, "purchase", 20.0),
    _ev(5, 55.0, 3, "view", 3.0),
]

#: micro-batch 1 — the hostile one: a storm of events HOURS older than
#: batch 0 (straddling every watermark), exact redeliveries of batch-0
#: event_ids, NULL timestamps, and a NEW user (4) whose first event
#: carries a NULL value
_BATCH1 = [
    _ev(100, -300.0, 1, "view", 4.0),       # 5 h late
    _ev(101, -299.0, 2, "purchase", 5.0),   # 5 h late
    _ev(1, 0.0, 1, "view", 1.0),            # dup event_id across batches
    _ev(3, 10.0, 2, "view", 2.0),           # dup event_id across batches
    _ev(102, None, 1, "view", 6.0),         # NULL timestamp
    _ev(103, None, 9, "view", 7.0),         # NULL ts AND unseen user 9
    _ev(104, 60.0, 4, "view", None),        # new user, NULL value
    _ev(105, 61.0, 4, "purchase", 8.0),
]

#: micro-batch 2 — normal continuation plus one more straggler
_BATCH2 = [
    _ev(200, 70.0, 1, "purchase", 9.0),
    _ev(201, 75.0, 5, "view", 11.0),
    _ev(202, -240.0, 3, "purchase", 12.0),  # 4 h late
    _ev(4, 40.0, 2, "purchase", 20.0),      # dup again
]

_BATCHES = [_BATCH0, _BATCH1, _BATCH2]
_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, "
    "event_type string, value double, props string"
)


def _rows_to_values_sql(rows) -> str:
    return ", ".join(
        "(%d, %s, %s, '%s', %s, NULL)"
        % (
            eid,
            "NULL" if ts is None else f"TIMESTAMP '{ts}'",
            "NULL" if uid is None else uid,
            et,
            "NULL" if v is None else v,
        )
        for eid, ts, uid, et, v, _p in rows
    )


@pytest.fixture(scope="module")
def hostile_dir(tmp_path_factory) -> str:
    """Directory of three SINGLE-FILE parquets (FileStreamSource lists
    plain files, not Spark's part-file directories — the documented
    single-parquet gotcha) with strictly increasing mtimes: file k is
    micro-batch k under maxFilesPerTrigger=1."""
    d = tmp_path_factory.mktemp("hostile_stream")
    con = duckdb.connect()
    now = None
    for i, rows in enumerate(_BATCHES):
        p = str(d / f"ev{i}.parquet")
        con.execute(
            f"COPY (SELECT * FROM (VALUES {_rows_to_values_sql(rows)}) "
            "v(event_id, ts, user_id, event_type, value, props)) "
            f"TO '{p}' (FORMAT PARQUET)"
        )
        if now is None:
            now = os.path.getmtime(p)
        # FileStreamSource orders by mtime; make the order unambiguous
        os.utime(p, (now + 60 * i, now + 60 * i))
    con.close()
    return str(d)


def _hostile_stream(spark, d: str):
    from rq_spark.queries.helpers import normalize_event_time
    from rq_spark.session import apply_runtime_confs

    apply_runtime_confs(spark)
    # schema from a batch probe, exactly like streaming.stream_events —
    # the duckdb-written files carry NTZ timestamps that
    # normalize_event_time converts under the pinned UTC session zone
    schema = spark.read.parquet(d).schema
    return normalize_event_time(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )


def _batch_df(spark):
    rows = [r for b in _BATCHES for r in b]
    return spark.createDataFrame(rows, _SCHEMA)


def test_tumble_complete_equals_batch_under_disorder(spark, hostile_dir):
    from rq_spark.streaming import run_to_memory, tumble_counts

    got = {
        tuple(r)
        for r in run_to_memory(
            tumble_counts(_hostile_stream(spark, hostile_dir)), "complete"
        ).collect()
    }
    want = {
        tuple(r)
        for r in tumble_counts(_batch_df(spark)).collect()
    }
    assert got == want and len(want) > 3


def test_stream_dedup_equals_batch_distinct(spark, hostile_dir):
    from rq_spark.streaming import dedup_keys, run_to_memory

    got = {
        (r.user_id, r.event_type)
        for r in run_to_memory(
            dedup_keys(
                _hostile_stream(spark, hostile_dir), "user_id", "event_type"
            ),
            "append",
        ).collect()
    }
    want = {
        (r.user_id, r.event_type)
        for r in _batch_df(spark).select("user_id", "event_type")
        .distinct().collect()
    }
    assert got == want


def test_first_seen_under_disorder_and_null_value(spark, hostile_dir):
    from rq_spark.streaming import first_seen_per_user, run_to_memory

    rows = run_to_memory(
        first_seen_per_user(_hostile_stream(spark, hostile_dir)), "append"
    ).collect()
    # expected winner per user: the (ts, event_id)-min among the
    # user's NON-NULL-ts rows within its first-appearance batch
    first_batch: dict[int, int] = {}
    for i, b in enumerate(_BATCHES):
        for eid, ts, uid, _et, _v, _p in b:
            if ts is not None and uid not in first_batch:
                first_batch[uid] = i
    want = {}
    for uid, i in first_batch.items():
        cands = [
            (ts, eid, v)
            for eid, ts, u, _et, v, _p in _BATCHES[i]
            if u == uid and ts is not None
        ]
        ts, eid, v = min(cands, key=lambda c: (c[0], c[1]))
        want[uid] = (eid, v)
    got = {r.user_id: (r.first_event_id, r.first_value) for r in rows}
    # exactly one row per user; NULL-ts-only user 9 never appears
    assert len(rows) == len(got) == len(want) and 9 not in got
    assert got == want
    # the NULL-value winner (user 4) emitted NULL, not a TypeError
    assert got[4] == (104, None)


def test_running_stats_invariants_under_disorder(spark, hostile_dir):
    from rq_spark.streaming import run_to_memory, running_user_stats

    rows = run_to_memory(
        running_user_stats(_hostile_stream(spark, hostile_dir)), "append"
    ).collect()
    flat = [r for b in _BATCHES for r in b if r[1] is not None]
    # every non-NULL-ts event emitted exactly once (duplicate
    # event_ids are distinct physical events and each must appear;
    # two dups of one id → two emitted rows)
    from collections import Counter

    want_ids = Counter((r[2], r[0]) for r in flat)
    got_ids = Counter((r.user_id, r.event_id) for r in rows)
    assert got_ids == want_ids
    # per key: max run_n == event count; final run_sum == exact sum
    # with SQL skip-NULL semantics — order-independent invariants
    per_key: dict[int, tuple[int, float]] = {}
    for eid, ts, uid, _et, v, _p in flat:
        n, s = per_key.get(uid, (0, 0.0))
        per_key[uid] = (n + 1, s + (v or 0.0))
    for uid, (n, s) in per_key.items():
        krows = [r for r in rows if r.user_id == uid]
        assert max(r.run_n for r in krows) == n, uid
        final = max(krows, key=lambda r: r.run_n)
        assert abs(final.run_sum - s) < 1e-9, (uid, final.run_sum, s)


def test_interval_join_never_invents_pairs(spark, hostile_dir):
    from rq_spark.streaming import interval_join, run_to_memory

    got = {
        (r.a_event_id, r.b_event_id)
        for r in run_to_memory(
            interval_join(
                _hostile_stream(spark, hostile_dir),
                _hostile_stream(spark, hostile_dir),
            ),
            "append",
        ).collect()
    }
    b = _batch_df(spark)
    a = b.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("a_user"),
        F.col("event_id").alias("a_event_id"),
        F.col("ts").alias("a_ts"),
    )
    p = b.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("b_user"),
        F.col("event_id").alias("b_event_id"),
        F.col("ts").alias("b_ts"),
    )
    want = {
        (r.a_event_id, r.b_event_id)
        for r in a.join(
            p,
            F.expr(
                "a_user = b_user AND b_ts >= a_ts "
                "AND b_ts <= a_ts + interval 60 minutes"
            ),
        ).collect()
    }
    assert got <= want and len(want) > 0
    # pairs wholly inside one micro-batch can never be watermark
    # casualties — they must all be present
    for i, batch in enumerate(_BATCHES):
        views = [
            (eid, ts, uid) for eid, ts, uid, et, _v, _p in batch
            if et == "view" and ts is not None
        ]
        purchases = [
            (eid, ts, uid) for eid, ts, uid, et, _v, _p in batch
            if et == "purchase" and ts is not None
        ]
        for aeid, ats, auid in views:
            for beid, bts, buid in purchases:
                if auid == buid and ats <= bts <= ats + timedelta(minutes=60):
                    assert (aeid, beid) in got, (i, aeid, beid)


def test_dedup_state_survives_query_restart(spark, tmp_path):
    """Checkpoint recovery — the operational property a 100 TB ingest
    pipeline actually depends on: a streaming query is STOPPED after
    its first micro-batch and a NEW query object restarts from the
    same checkpoint; the keyed dedup state must come back, so keys
    seen before the restart are NOT re-emitted when the hostile
    batches redeliver them after it. The parquet sink + checkpoint
    pair also proves exactly-once file-source accounting across the
    restart (no batch replayed, none skipped)."""
    import duckdb as _duck

    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")
    con = _duck.connect()

    def drop_file(i: int) -> None:
        p = str(src / f"ev{i}.parquet")
        con.execute(
            f"COPY (SELECT * FROM (VALUES {_rows_to_values_sql(_BATCHES[i])})"
            " v(event_id, ts, user_id, event_type, value, props)) "
            f"TO '{p}' (FORMAT PARQUET)"
        )

    from rq_spark.streaming import dedup_keys

    def run_until_drained() -> None:
        q = (
            dedup_keys(
                _hostile_stream(spark, str(src)), "user_id", "event_type"
            )
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    drop_file(0)
    run_until_drained()
    n_first = spark.read.parquet(sink).count()
    assert n_first == len({(r[2], r[3]) for r in _BATCH0})

    # the query object is GONE; batches 1-2 redeliver batch-0 keys
    drop_file(1)
    drop_file(2)
    run_until_drained()
    got = [(r.user_id, r.event_type)
           for r in spark.read.parquet(sink).collect()]
    want = {(r[2], r[3]) for b in _BATCHES for r in b}
    # every key exactly once ACROSS the restart boundary: recovered
    # state suppressed the redelivered keys, and no batch was replayed
    assert len(got) == len(set(got)) == len(want)
    assert set(got) == want
    con.close()


# --------------------------- catalog stream keys over the hostile file


@pytest.fixture(scope="module")
def hostile_sf(tmp_path_factory) -> str:
    """An sf-shaped corpus whose events.parquet is the full hostile
    row set in ONE file (the catalog stream readers' pathGlobFilter
    shape) — NULL ts, NULL values, duplicate ids, 5-hour disorder."""
    d = tmp_path_factory.mktemp("hostile_sf")
    for f in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "documents", "embeddings"):
        shutil.copy(f"{SRC}/{f}.parquet", d / f"{f}.parquet")
    con = duckdb.connect()
    vals = _rows_to_values_sql([r for b in _BATCHES for r in b])
    con.execute(
        f"COPY (SELECT * FROM (VALUES {vals}) "
        "v(event_id, ts, user_id, event_type, value, props)) "
        f"TO '{d}/events.parquet' (FORMAT PARQUET)"
    )
    con.close()
    return str(d)


@pytest.mark.parametrize("key", ["stream_agg_dedup", "stream_stateful",
                                 "window_agg_time", "event_sessions_rate"])
def test_hostile_events_catalog_key(spark, hostile_sf, key):
    """The catalog's stream keys (and the events-driven batch keys that
    share their expressions) under the NULL-or-named-ValueError policy
    over the hostile event file."""
    from rq_spark.queries import all_queries

    try:
        rows = all_queries()[key](spark, hostile_sf).collect()
    except ValueError as e:
        assert str(e), f"{key}: ValueError without a message"
        return
    assert isinstance(rows, list)
