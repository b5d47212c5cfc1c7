"""Gopher/C4 line rules (operators/gopher.py): hand-computed values
for every signal, threshold behavior of the keep conjunction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rq_spark.operators import gopher as G

LINES = ["- a.", "b...", "c.", "c.", "longline here."]


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def test_line_rules_hand_computed(spark):
    lines = F.array(*[F.lit(x) for x in LINES])
    r = G.line_rules(lines)
    row = spark.range(1).select(
        *[c.alias(k) for k, c in r.items()]
    ).collect()[0]
    assert row["n_lines"] == 5
    assert row["frac_bullet_lines"] == pytest.approx(1 / 5)
    assert row["frac_ellipsis_lines"] == pytest.approx(1 / 5)
    # every line ends in '.' (the ellipsis line included)
    assert row["frac_terminal_lines"] == 1.0
    assert row["frac_dup_lines"] == pytest.approx(1 - 4 / 5)
    # 'c.' duplicated: the EXCESS copy's 2 chars of 4+4+2+2+14 total
    # (first occurrence excluded — the frac_dup_lines convention)
    assert row["frac_dup_line_chars"] == pytest.approx(2 / 26)


def test_c4_keep_lines_needs_terminal_punct_and_words(spark):
    lines = F.array(
        F.lit("one two three."),   # kept: 3 words + terminal
        F.lit("one two three"),    # dropped: no terminal punct
        F.lit("too short."),       # dropped: 2 words
        F.lit("is this a question?"),  # kept
    )
    kept = _one(spark, G.c4_keep_lines(lines))
    assert kept == ["one two three.", "is this a question?"]


def test_stop_hits_counts_distinct_stopwords(spark):
    assert _one(spark, G.stop_hits(F.lit("the cat and the dog have fun"))) == 3
    assert _one(spark, G.stop_hits(F.lit("no markers here"))) == 0


def test_gopher_keep_thresholds(spark):
    good = " ".join(["the cat ran far and fast over hills"] * 8)
    assert _one(
        spark, G.gopher_keep(F.lit(good), F.split(F.lit(good), "\n"))
    ) == 1
    # under 50 words -> rejected even with stop words present
    short = "the cat ran far and fast"
    assert _one(
        spark, G.gopher_keep(F.lit(short), F.split(F.lit(short), "\n"))
    ) == 0
    # stop-word floor: same good text with stop words stripped fails
    # at the default 2-of-8 but passes at min_stop_hits=0
    no_stop = " ".join(["cat ran far fast over hills tops"] * 8)
    ls = F.split(F.lit(no_stop), "\n")
    assert _one(spark, G.gopher_keep(F.lit(no_stop), ls)) == 0
    assert _one(spark, G.gopher_keep(F.lit(no_stop), ls, min_stop_hits=0)) == 1
