"""Data profiling: the per-column corpus QA report (count / null
fraction / exact NDV / min / max) every ingestion pipeline runs before
trusting a new drop of data.

One aggregation pass over the table: Spark plans the multiple
count(distinct) aggregates with a single Expand + two-level hash
aggregate (one scan, map-side partials; rows are replicated once per
distinct-aggregate inside the Expand, the standard exact-NDV plan).
For a 100 TB quick-look, swap `F.count_distinct` for
`F.approx_count_distinct` — same single-scan shape, HLL-bounded
state. The single-row aggregate is then unpivoted to one row per
column with `stack`, so the report shape is stable however many
columns are profiled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Returns (col_name, n, null_frac, ndv, min_val, max_val) — one
    row per profiled column; min/max cast to double (numeric columns)."""
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs += [
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__nulls"),
            F.count_distinct(F.col(c)).alias(f"{c}__ndv"),
            F.min(F.col(c)).cast("double").alias(f"{c}__min"),
            F.max(F.col(c)).cast("double").alias(f"{c}__max"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', CAST(`{c}__nulls` AS DOUBLE) / _n, `{c}__ndv`, "
        f"`{c}__min`, `{c}__max`"
        for c in cols
    )
    return one.selectExpr(
        "_n AS n",
        f"stack({len(cols)}, {stack_args}) AS "
        "(col_name, null_frac, ndv, min_val, max_val)",
    ).select("col_name", "n", "null_frac", "ndv", "min_val", "max_val")
