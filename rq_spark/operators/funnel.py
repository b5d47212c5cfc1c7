"""Event-sequence analytics: funnel levels and cohort retention.

The two classic product/behavior queries over an event stream — in a
training-data engine they profile interaction logs (agent traces, RLHF
session logs, synthetic-conversation corpora) the same way they
profile product events: how far do sequences progress through an
expected step chain, and how do cohorts persist over time.

`funnel_levels` is the ClickHouse-`windowFunnel`-shaped operator with
GREEDY-EARLIEST semantics, stated precisely so an oracle can replay
it relationally:
    t1 = earliest ts of a step-1 event
    tk = earliest ts of a step-k event with ts > t(k-1)
         and ts <= t1 + window
    level(user) = max k with tk defined (0 if no step-1 event)
This is deterministic (no tie policy needed: MIN over timestamps) and
each level is a plain filtered aggregate + equi-join — the same SQL
any engine runs, so levels and timestamps are hash-exact.

Scale shape: step k scans only events of type step_k (a pushdown
filter — for a 10-step funnel over 100 TB, each pass reads one type's
fraction), aggregates to one row per qualifying user (shuffle ∝
users), and joins user-level relations — never event-to-event. The
alternative single-pass collect_list fold holds a user's whole event
history in one aggregation buffer; the relational form bounds state
at one timestamp per user per level.

`cohort_retention` buckets users by first-seen period and counts
distinct active users per (cohort, period-offset) — integer counts,
date_trunc on both engines, hash-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_levels(
    events: DataFrame,
    steps: list[str],
    window: str = "1 hour",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """(user, level, t_first, t_complete) for every user with at least
    one step-1 event: level = greedy-earliest funnel depth (see module
    docstring), t_first = the step-1 anchor time, t_complete = the
    final step's time when the whole chain completed, else NULL."""
    if not steps:
        raise ValueError("funnel_levels: steps must be non-empty")
    if len(set(steps)) != len(steps):
        raise ValueError(f"funnel_levels: duplicate steps in {steps!r}")
    u, t = F.col(user_col), F.col(ts_col)

    cur = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t1"))
        .withColumn("tk", F.col("t1"))
    )
    levels = cur.select(user_col, "t1").withColumn("_lvl", F.lit(1))
    for k, step in enumerate(steps[1:], start=2):
        ev = events.filter(F.col(type_col) == step).select(user_col, ts_col)
        cur = (
            ev.join(cur.select(user_col, "t1", "tk"), user_col)
            .filter(
                (t > F.col("tk"))
                & (t <= F.col("t1") + F.expr(f"INTERVAL {window}"))
            )
            .groupBy(user_col, "t1")
            .agg(F.min(ts_col).alias("tk"))
        )
        levels = levels.join(
            cur.select(u.alias("_u"), F.col("tk").alias(f"_t{k}")),
            levels[user_col] == F.col("_u"),
            "left",
        ).drop("_u")
        levels = levels.withColumn(
            "_lvl", F.when(F.col(f"_t{k}").isNotNull(), k).otherwise(F.col("_lvl"))
        )
    last = f"_t{len(steps)}" if len(steps) > 1 else "t1"
    return levels.select(
        u.alias("user"),
        F.col("_lvl").cast("long").alias("level"),
        F.col("t1").alias("t_first"),
        F.col(last).alias("t_complete"),
    )


def type_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """(prev_type, next_type, n): global counts of consecutive
    event-type transitions within each user's (ts, id)-ordered stream
    — the Markov/Sankey edge weights of behavioral flow analysis (and
    of agent-trace step profiling). One user-keyed window shuffle +
    one tiny groupBy on the (prev, next) pairs; integer counts with a
    LAG-window oracle, hash-exact."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    prev = F.lag(type_col).over(w)
    return (
        events.select(prev.alias("prev_type"), F.col(type_col).alias("next_type"))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def cohort_retention(
    events: DataFrame,
    period: str = "week",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(cohort, offset, n_users): users bucketed by the period of
    their first event; n_users = distinct users from that cohort
    active `offset` periods later (offset 0 = the cohort period
    itself, so n_users at offset 0 is the cohort size).

    Two shuffles ∝ users (first-seen aggregate, cohort×offset
    distinct count); offsets via month/week arithmetic on truncated
    dates, exact integers on any engine."""
    if period not in ("week", "month"):
        raise ValueError(f"cohort_retention: unsupported period {period!r}")
    first = events.groupBy(user_col).agg(
        F.date_trunc(period, F.min(ts_col)).cast("date").alias("cohort")
    )
    active = events.select(
        user_col, F.date_trunc(period, F.col(ts_col)).cast("date").alias("p")
    ).distinct()
    div = 7 if period == "week" else None
    joined = active.join(first, user_col)
    if period == "week":
        off = (F.datediff("p", "cohort") / div).cast("long")
    else:
        off = (
            (F.year("p") - F.year("cohort")) * 12
            + (F.month("p") - F.month("cohort"))
        ).cast("long")
    return (
        joined.select("cohort", off.alias("offset"), user_col)
        .groupBy("cohort", "offset")
        .agg(F.count_distinct(user_col).cast("long").alias("n_users"))
    )
