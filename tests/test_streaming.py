"""Structured Streaming: streaming results must agree with the batch
pack (same logical plan, different engine) and stateful operators must
converge to batch truth."""

from __future__ import annotations

import pandas as pd

from rq_spark import streaming
from rq_spark.queries import events as batch_events
from rq_spark.queries.helpers import table


def _rowset(df):
    return {tuple(r) for r in df.collect()}


def test_stream_tumble_equals_batch(spark, sf_dir):
    streamed = streaming.stream_tumble_10min(spark, sf_dir)
    batch = batch_events.tumble_10min(spark, sf_dir)
    assert _rowset(streamed) == _rowset(batch)


def test_stream_sessions_are_finalized_batch_sessions(spark, sf_dir):
    """Append mode emits only watermark-finalized sessions — every one
    must exist identically in the batch result (late tail withheld)."""
    streamed = streaming.run_to_memory(
        streaming.session_counts(streaming.stream_events(spark, sf_dir)),
        mode="append",
    )
    got = _rowset(streamed.select("user_id", "session_start", "n_events"))
    want = _rowset(
        batch_events.session_window_30min(spark, sf_dir).select(
            "user_id", "session_start", "n_events"
        )
    )
    assert got <= want
    assert len(got) > 0


def test_stateful_counter_converges_to_batch_counts(spark, sf_dir):
    """Custom stateful operator (applyInPandasWithState): per-user
    running totals; the last update per user equals the batch count."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    def counter(key, pdf_iter, state):
        (user_id,) = key
        total = state.get[0] if state.exists else 0
        for pdf in pdf_iter:
            total += len(pdf)
        state.update((total,))
        yield pd.DataFrame({"user_id": [user_id], "total_events": [total]})

    stream = streaming.stream_events(spark, sf_dir)
    updates = stream.groupBy("user_id").applyInPandasWithState(
        counter,
        "user_id bigint, total_events bigint",
        "total bigint",
        "update",
        GroupStateTimeout.NoTimeout,
    )
    out = streaming.run_to_memory(updates, mode="update")
    finals = {
        r.user_id: r.total_events
        for r in out.groupBy("user_id").agg({"total_events": "max"})
        .withColumnRenamed("max(total_events)", "total_events")
        .collect()
    }
    want = {
        r.user_id: r.n
        for r in table(spark, sf_dir, "events").groupBy("user_id").count()
        .withColumnRenamed("count", "n").collect()
    }
    assert finals == want


def test_stream_interval_join_equals_batch(spark, sf_dir):
    """The watermarked stream-stream interval join on bounded replay
    must equal the plain batch join (no late data → nothing dropped)."""
    from pyspark.sql import functions as F

    got = {
        (r.user_id, r.a_event_id, r.b_event_id)
        for r in streaming.stream_interval_join_view_purchase(spark, sf_dir).collect()
    }
    e = table(spark, sf_dir, "events")
    a = e.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("u"), F.col("event_id").alias("a_id"),
        F.col("ts").alias("a_ts"),
    )
    b = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("u"), F.col("event_id").alias("b_id"),
        F.col("ts").alias("b_ts"),
    )
    want = {
        (r.u, r.a_id, r.b_id)
        for r in a.join(b, "u")
        .filter(
            (F.col("b_ts") >= F.col("a_ts"))
            & (F.col("b_ts") <= F.col("a_ts") + F.expr("interval 60 minutes"))
        )
        .collect()
    }
    assert got == want and len(got) > 0
