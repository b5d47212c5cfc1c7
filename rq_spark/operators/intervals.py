"""Interval overlap join — the time-range / span analog of the range
join (log-session overlap, span containment, genomic-style region
intersection). Spark has no native interval join; a theta join is an
O(n²) nested loop.

Scale shape: the binned spatial-join pattern. Each interval explodes
to the fixed-width bins it covers, candidates meet in a (key, bin)
EQUI-join, and a REPORT-ONCE rule — a qualifying pair is kept only in
the bin of its later start, `bin(max(a.start, b.start))`, which both
sides provably cover when they overlap — replaces the usual
`dropDuplicates` with a pure filter: no dedup shuffle, each pair
emitted exactly once. Replication is interval_length/bin_width rows
per input row; pick `bin_width` near the typical interval length to
keep it O(1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
    bin_width: int,
    suffixes: tuple[str, str] = ("a_", "b_"),
) -> DataFrame:
    """All pairs (one row each) of a×b with the same ``key_col`` whose
    CLOSED intervals [start, end] overlap. Every input column comes
    back prefixed with the side's suffix; starts/ends are numeric
    (micros, positions — any integer-like)."""

    def binf(c):
        return F.floor(c / F.lit(int(bin_width)))

    def side(df: DataFrame, pre: str) -> DataFrame:
        return df.select(
            *[F.col(c).alias(pre + c) for c in df.columns],
            F.col(key_col).alias("_k"),
            F.explode(
                F.sequence(binf(F.col(start_col)), binf(F.col(end_col)))
            ).alias("_bin"),
        )

    pa, pb = suffixes
    j = side(a, pa).join(side(b, pb), ["_k", "_bin"])
    a_s, a_e = F.col(pa + start_col), F.col(pa + end_col)
    b_s, b_e = F.col(pb + start_col), F.col(pb + end_col)
    keep = (
        (a_s <= b_e)
        & (b_s <= a_e)
        & (F.col("_bin") == F.greatest(binf(a_s), binf(b_s)))
    )
    return j.filter(keep).drop("_k", "_bin")
