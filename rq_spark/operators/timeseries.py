"""Per-key sequential time-series operators in exact integer arithmetic.

`ewma_fixed` is exponential smoothing (α = 1/2) over each key's
event sequence — the standard online metric smoother (request-rate
trends, quality-score drift, per-user activity baselines) — computed
in INTEGER MICRO-UNITS with a floor at every step:

    x_i = value_i as DECIMAL(38,6) · 10^6   (the engine-wide exact-
                                             decimal convention)
    s_1 = x_1 ;  s_i = (s_{i-1} + x_i) div 2

Like pagerank_fixed and the unigram-LM fold, the integer recurrence
is the hash contract: floats would accumulate engine-specific
rounding, while floor-div halving is bit-identical anywhere, so a
recursive-CTE oracle replays every smoothed value exactly. The
half-life is one step; per-step quantization loss is < 1 micro-unit.

Scale shape: ONE shuffle keyed on the partition key; each key's
ordered sequence folds inside a single aggregation buffer (state ∝
that key's events — the same regime as any collect-sort sequence op;
keys are independent, so skew is bounded by the hottest key, and a
100 TB deployment would window the sequence per day/segment first).
The fold emits the whole running array in one pass — no per-prefix
recomputation, no window UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ewma_fixed(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: str,
) -> DataFrame:
    """(key, seq, <order cols>, ewma_micros) — one row per input row,
    seq = 1-based position in the key's (order_cols)-sorted sequence,
    ewma_micros = the α=1/2 fixed-point smoothed value (int64 units of
    10^-6). Order columns must be unique per key for a deterministic
    sequence. Negative values are supported: halving is FLOOR division
    (arithmetic shift) on both engines, so the hash contract holds for
    any int64-representable micro-unit."""
    if not order_cols:
        raise ValueError("ewma_fixed: order_cols must be non-empty")
    micros = F.expr(
        f"CAST(CAST({value_col} AS DECIMAL(38,6)) * 1000000 AS BIGINT)"
    )
    items = F.sort_array(
        F.collect_list(F.struct(*order_cols, micros.alias("_x")))
    )
    # fold to the RUNNING state array: acc = (last state, states so far);
    # shiftright(·, 1) is FLOOR-halving (arithmetic shift: -7>>1 = -4),
    # valid for negative values too — the oracle uses DuckDB's `>> 1`,
    # which is the same arithmetic shift (NOT `// 2`, which DuckDB
    # truncates toward zero: -7//2 = -3, and NOT floor(x/2.0), which
    # loses integer exactness above 2^53)
    def _step(acc, x):
        nxt = F.when(acc["s"].isNull(), x["_x"]).otherwise(
            F.shiftright(acc["s"] + x["_x"], 1)
        )
        return F.struct(
            nxt.alias("s"),
            F.concat(acc["arr"], F.array(nxt)).alias("arr"),
        )

    states = F.aggregate(
        items,
        F.struct(
            F.lit(None).cast("long").alias("s"),
            F.expr("CAST(array() AS ARRAY<BIGINT>)").alias("arr"),
        ),
        _step,
    )["arr"]
    folded = df.groupBy(key_col).agg(
        items.alias("_items"), states.alias("_states")
    )
    z = folded.select(
        key_col,
        F.posexplode(F.arrays_zip("_items", "_states")).alias("_pos", "_z"),
    )
    return z.select(
        key_col,
        (F.col("_pos") + 1).cast("long").alias("seq"),
        *[F.col(f"_z._items.{c}").alias(c) for c in order_cols],
        F.col("_z._states").alias("ewma_micros"),
    )


def ewma_cte_sql(
    events_cte: str,
    key: str,
    order_by: str,
    value: str,
    carry: str = "event_id",
) -> str:
    """Matching DuckDB recursive-CTE chain (appended inside an existing
    WITH RECURSIVE clause): final relation `ew`(k, seq, eid, s) — the
    same integer recurrence, seq 1-based in (order_by) order, eid =
    the carried `carry` column of that row."""
    return f"""
, ew_base AS (
  SELECT {key} AS k,
         ROW_NUMBER() OVER (PARTITION BY {key} ORDER BY {order_by}) AS seq,
         {carry} AS eid,
         CAST(CAST({value} AS DECIMAL(38,6)) * 1000000 AS BIGINT) AS x
  FROM {events_cte}
), ew(k, seq, eid, s) AS (
  SELECT k, seq, eid, x FROM ew_base WHERE seq = 1
  UNION ALL
  SELECT b.k, b.seq, b.eid, (ew.s + b.x) >> 1
  FROM ew JOIN ew_base b ON b.k = ew.k AND b.seq = ew.seq + 1
)"""
