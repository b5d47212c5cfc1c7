"""Fuzzy record linkage / entity resolution: near-duplicate STRUCTURED
records (catalog names, addresses, author strings) where the text-dedup
family (MinHash/SimHash, `operators/dedup.py`) is the wrong tool —
records are short, token sets tiny, and the edit-distance metric is the
one that matches data-entry noise.

Semantics (the standard blocking formulation, stated precisely so the
oracle can mirror it): two records MATCH iff they share the declared
blocking key AND their linkage fields are within Levenshtein distance
``t``. Blocking is part of the operator contract, not an approximation
bolted on after: all-pairs Levenshtein is O(n²·len²) and no index
exists for arbitrary edit distance at corpus scale, so production
linkage (Fellegi-Sunter pipelines, dedupe.io, Splink) always declares
blocking keys. Recall beyond the block key is governed by choosing /
unioning more keys (run the report once per key and union — each run
is this same plan).

Scale shape:
* candidate generation is an EQUI-join on (block_key, length_bucket) —
  Catalyst plans a hash join, never a nested loop. Within the stated
  semantics the bucket trick is provably lossless: |len(a) - len(b)| ≤
  lev(a, b) ≤ t, and buckets are ``t + 1`` wide, so any matching pair
  sits in the same or adjacent buckets — the right side explodes to
  {b-1, b, b+1} exactly like the price-band range join
  (`queries/joins.py`).
* cost is Σ block² · len² on Levenshtein evaluations, all JVM-side
  codegen (`F.levenshtein`, no Python). The block key GOVERNS the
  cost: a hot block is quadratic in its size, which is precisely what
  `key_skew_report` (operators/profiling.py) diagnoses — at 100 TB
  you profile the candidate key first, then pick/compose keys until
  blocks are bounded.
* the per-record report aggregates candidate pairs straight down to
  one row per matched record (count + deterministic nearest
  neighbor), so the result is O(records), never O(pairs).

Evidence: `linkage` branch of the `join_range_price_band` catalog key —
DuckDB implements `levenshtein` with the same unit-cost
insert/delete/substitute definition, distances are exact integers, and
the nearest-neighbor tiebreak is the total order (distance, key), so
every emitted row is hash-exact cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def record_linkage_report(
    df: DataFrame,
    key_col: str,
    name_col: str,
    max_distance: int = 4,
) -> DataFrame:
    """Per-record fuzzy-match report: for every record with at least
    one match (same first-word block, Levenshtein ≤ ``max_distance``),
    emit (key, n_matches, min_distance, nearest_key) where nearest_key
    is the minimum (distance, key) neighbor — a deterministic
    representative for merge/review queues.
    """
    width = max_distance + 1
    base = df.select(
        F.col(key_col).alias("k"),
        F.col(name_col).alias("nm"),
        F.split(F.col(name_col), " ").getItem(0).alias("w"),
        F.floor(F.length(name_col) / width).alias("lb"),
    )
    probe = base.select(
        F.col("k").alias("bk"),
        F.col("nm").alias("bnm"),
        "w",
        F.explode(
            F.array(F.col("lb") - 1, F.col("lb"), F.col("lb") + 1)
        ).alias("lb"),
    )
    pairs = (
        base.join(probe, ["w", "lb"])
        .filter(F.col("k") != F.col("bk"))
        .select(
            "k",
            "bk",
            F.levenshtein(F.col("nm"), F.col("bnm")).alias("d"),
        )
        .filter(F.col("d") <= max_distance)
    )
    best = F.min(F.struct("d", "bk")).alias("best")
    return (
        pairs.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_matches"), best)
        .select(
            F.col("k").alias("key"),
            "n_matches",
            F.col("best.d").alias("min_distance"),
            F.col("best.bk").alias("nearest_key"),
        )
    )
