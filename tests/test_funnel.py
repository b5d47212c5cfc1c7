"""Funnel levels + cohort retention (operators/funnel.py).

The catalog branches are driver-hash-checked against the relational
oracle; these tests pin the SEMANTICS on crafted fixtures: greedy
anchoring at the earliest step-1 event (including the case where a
later anchor would have scored deeper — the documented trade-off),
window expiry, strict ordering, and cohort-offset arithmetic."""

from __future__ import annotations

from datetime import datetime

import pytest

from rq_spark.operators.funnel import cohort_retention, funnel_levels

T0 = datetime(2024, 3, 4, 12, 0, 0)  # a Monday


def _ts(mins):
    from datetime import timedelta

    return T0 + timedelta(minutes=mins)


EVENTS = [
    # user 1: clean view(0) -> click(10) -> purchase(20): level 3
    (1, _ts(0), "view"), (1, _ts(10), "click"), (1, _ts(20), "purchase"),
    # user 2: click BEFORE view never counts (strict ts > anchor)
    (2, _ts(0), "click"), (2, _ts(5), "view"), (2, _ts(4), "purchase"),
    # user 3: click outside the 60-min window of the EARLIEST view —
    # greedy anchors at view(0), so click(70) expires even though
    # anchoring at view(30) would have reached level 2
    (3, _ts(0), "view"), (3, _ts(30), "view"), (3, _ts(70), "click"),
    # user 4: purchase without click stays level 1
    (4, _ts(0), "view"), (4, _ts(5), "purchase"),
    # user 5: no view at all -> absent from the funnel
    (5, _ts(0), "click"), (5, _ts(1), "purchase"),
]


@pytest.fixture(scope="module")
def ev(spark):
    return spark.createDataFrame(EVENTS, ["user_id", "ts", "event_type"])


def test_funnel_semantics(ev):
    got = {
        r["user"]: (r["level"], r["t_first"], r["t_complete"])
        for r in funnel_levels(ev, ["view", "click", "purchase"], "1 hour").collect()
    }
    assert set(got) == {1, 2, 3, 4}  # user 5 has no anchor
    assert got[1] == (3, _ts(0), _ts(20))
    assert got[2][0] == 1 and got[2][2] is None
    assert got[3][0] == 1  # greedy-earliest documented trade-off
    assert got[4][0] == 1


def test_funnel_validation(ev):
    with pytest.raises(ValueError):
        funnel_levels(ev, [])
    with pytest.raises(ValueError):
        funnel_levels(ev, ["view", "view"])


def test_cohort_retention(spark):
    def w(weeks, mins=0):
        from datetime import timedelta

        return T0 + timedelta(weeks=weeks, minutes=mins)

    rows = [
        # cohort week 0: users 1, 2; user 1 returns in weeks 1 and 3
        (1, w(0), "view"), (1, w(1), "click"), (1, w(3), "view"),
        (2, w(0, 5), "view"),
        # cohort week 2: user 3, returns week 3
        (3, w(2), "view"), (3, w(3), "purchase"),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    got = {
        (r["cohort"].isoformat(), r["offset"]): r["n_users"]
        for r in cohort_retention(ev, "week").collect()
    }
    assert got == {
        ("2024-03-04", 0): 2,
        ("2024-03-04", 1): 1,
        ("2024-03-04", 3): 1,
        ("2024-03-18", 0): 1,
        ("2024-03-18", 1): 1,
    }
    with pytest.raises(ValueError):
        cohort_retention(ev, "day")


def test_type_transitions(spark):
    """Crafted stream: per-user ordered bigrams, cross-user boundaries
    never produce a transition, ties broken by event_id."""
    from rq_spark.operators.funnel import type_transitions

    rows = [
        (1, 1, _ts(0), "view"), (1, 2, _ts(1), "click"), (1, 3, _ts(2), "view"),
        (2, 4, _ts(0), "click"),  # singleton stream: no transitions
        # user 3: same ts — event_id orders view(5) before click(6)
        (3, 5, _ts(0), "view"), (3, 6, _ts(0), "click"),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "event_id", "ts", "event_type"])
    got = {
        (r["prev_type"], r["next_type"]): r["n"]
        for r in type_transitions(ev).collect()
    }
    assert got == {("view", "click"): 2, ("click", "view"): 1}
