"""Record linkage (operators/linkage.py): blocking losslessness and
report semantics vs a brute-force Python reference."""

from __future__ import annotations

from pyspark.sql import functions as F

from rq_spark.operators.linkage import record_linkage_report


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _brute_report(rows: list[tuple[int, str]], t: int):
    """All-pairs reference under the DECLARED semantics: same first
    word, lev ≤ t. No length bucketing — so a bucketing bug that drops
    any candidate pair shows up as a diff."""
    out = {}
    for k, nm in rows:
        matches = [
            (_lev(nm, bnm), bk)
            for bk, bnm in rows
            if bk != k
            and bnm.split(" ")[0] == nm.split(" ")[0]
            and _lev(nm, bnm) <= t
        ]
        if matches:
            d, bk = min(matches)
            out[k] = (len(matches), d, bk)
    return out


FIXTURE = [
    (1, "small ring"),
    (2, "small ring"),          # exact duplicate
    (3, "small rings"),         # d=1
    (4, "small wrench"),        # d=5 from ring: outside t=4
    (5, "small rung"),          # d=1 from ring
    (6, "red ring"),            # different block, never matches 1-5
    (7, "red rang"),            # d=2 from red ring
    (8, "blue lonesome widget"),  # no same-block partner at all
    # length-bucket boundary pair: lengths 9 vs 13 (diff 4 == t) must
    # still match across adjacent buckets (width 5: buckets 1 and 2)
    (9, "red aaaaa"),
    (10, "red aaaaabbbb"),
]


def test_linkage_matches_brute_force(spark):
    df = spark.createDataFrame(FIXTURE, ["p_partkey", "p_name"])
    got = {
        r["key"]: (r["n_matches"], r["min_distance"], r["nearest_key"])
        for r in record_linkage_report(
            df, "p_partkey", "p_name", max_distance=4
        ).collect()
    }
    assert got == _brute_report(FIXTURE, 4)


def test_linkage_nearest_is_deterministic_tiebreak(spark):
    # two neighbors at the same distance: the smaller key wins
    rows = [(1, "ax q"), (2, "ax w"), (3, "ax e")]
    df = spark.createDataFrame(rows, ["p_partkey", "p_name"])
    rep = {
        r["key"]: r["nearest_key"]
        for r in record_linkage_report(
            df, "p_partkey", "p_name", max_distance=2
        ).collect()
    }
    assert rep == {1: 2, 2: 1, 3: 1}


def test_linkage_plan_is_hash_join_not_nested_loop(spark):
    df = spark.createDataFrame(FIXTURE, ["p_partkey", "p_name"])
    plan = (
        record_linkage_report(df, "p_partkey", "p_name")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
