"""Declarative data-quality constraints (the Deequ / dbt-test /
Great-Expectations shape): named checks with pass/fail semantics —
the data CONTRACT a pipeline verifies before training on a drop, as
opposed to the descriptive profiling report (profile_columns).

Scale shape: every scalar check compiles to ONE aggregation over a
single scan (exact integer counters + one division each — hash-exact
cross-engine); uniqueness rides the same pass as a count-distinct;
referential checks are co-partitioned anti-join counts (orphans ∝
violations, never a materialized join product). One row per check:
(check, observed, threshold, passed, n).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: a check = (name, numerator aggregate, threshold on numerator/n)
Check = tuple[str, Column, float]


def completeness(col: str) -> Check:
    """Fraction of non-NULL values; threshold 1.0 = NOT NULL contract."""
    return (f"completeness({col})", F.count(F.col(col)), 1.0)


def uniqueness(*cols: str) -> Check:
    """distinct/total over the key TUPLES; 1.0 = primary-key contract.
    The tuple folds as a struct so rows with NULL key components still
    count as (distinct) tuples — `count_distinct(a, b)` would DROP
    them entirely, failing the contract even with zero duplicates and
    diverging from SQL's COUNT(DISTINCT (a, b)) row semantics. NULL
    components compare like DISTINCT does (two (NULL, 1) rows are
    duplicates of each other)."""
    name = f"uniqueness({', '.join(cols)})"
    return (
        name,
        F.count_distinct(F.struct(*[F.col(c) for c in cols])),
        1.0,
    )


def in_range(col: str, lo: float, hi: float) -> Check:
    """Fraction of values inside [lo, hi]."""
    c = F.col(col)
    return (
        f"in_range({col}, {lo}, {hi})",
        F.sum(((c >= lo) & (c <= hi)).cast("long")),
        1.0,
    )


def in_set(col: str, values: list) -> Check:
    """Fraction of values inside the allowed set."""
    return (
        f"in_set({col})",
        F.sum(F.col(col).isin(values).cast("long")),
        1.0,
    )


def check_suite(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Run every scalar check in ONE aggregation pass; unpivot to one
    row per check via an explode (no per-check scan, no driver loop).

    An empty ``checks`` list is a caller error (the untyped empty
    array would silently explode to zero rows — a vacuously "passing"
    contract). An EMPTY TABLE is a vacuous pass: observed is defined
    as 1.0 when n = 0 (every check's numerator trivially covers all
    zero rows), never NULL."""
    if not checks:
        raise ValueError("check_suite: checks must be non-empty")
    aggs = [F.count(F.lit(1)).alias("_n")] + [
        num.cast("long").alias(f"_c{i}") for i, (_, num, _) in enumerate(checks)
    ]
    one = df.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(name).alias("check"),
                F.when(F.col("_n") == 0, F.lit(1.0))
                .otherwise(F.col(f"_c{i}").cast("double") / F.col("_n"))
                .alias("observed"),
                F.lit(float(thr)).alias("threshold"),
            )
            for i, (name, _, thr) in enumerate(checks)
        ]
    )
    return one.select(F.col("_n").alias("n"), F.explode(entries).alias("_e")).select(
        F.col("_e.check").alias("check"),
        F.col("_e.observed").alias("observed"),
        F.col("_e.threshold").alias("threshold"),
        (F.col("_e.observed") >= F.col("_e.threshold")).cast("int").alias(
            "passed"
        ),
        "n",
    )


def fk_check(
    child: DataFrame,
    key_cols: list[str],
    parent: DataFrame,
    parent_key_cols: list[str],
    name: str | None = None,
) -> DataFrame:
    """Referential-integrity check: fraction of child rows whose key
    exists in the parent (1.0 = no orphans). Orphans count through a
    LEFT ANTI join — co-partitioned on the key at scale, output ∝
    violations. NULL keys count as orphans (a NULL FK never joins),
    which is the strict contract; relax with a pre-filter if NULLs
    are allowed."""
    name = name or (
        f"fk({', '.join(key_cols)} -> {', '.join(parent_key_cols)})"
    )
    # deduped parent keys: a non-unique parent can't multiply child
    # rows, and matched/total both come from ONE left join + ONE agg —
    # a single pass over the child instead of anti-join + re-count
    pkeys = parent.select(
        *[
            F.col(pk).alias(f"_pk{i}")
            for i, pk in enumerate(parent_key_cols)
        ]
    ).distinct()
    cond = None
    for i, ck in enumerate(key_cols):
        c = child[ck] == pkeys[f"_pk{i}"]
        cond = c if cond is None else (cond & c)
    return (
        child.join(pkeys, cond, "left")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.count(F.col("_pk0")).alias("_matched"),
        )
        .select(
            F.lit(name).alias("check"),
            # empty child = vacuous pass (same n=0 convention as
            # check_suite): observed 1.0, never NULL
            F.when(F.col("_n") == 0, F.lit(1.0))
            .otherwise(F.col("_matched").cast("double") / F.col("_n"))
            .alias("observed"),
            F.lit(1.0).alias("threshold"),
            (F.col("_matched") == F.col("_n")).cast("int").alias("passed"),
            F.col("_n").alias("n"),
        )
    )
