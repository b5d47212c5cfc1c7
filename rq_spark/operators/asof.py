"""As-of (nearest-event) joins in all three directions — the pandas /
polars `merge_asof` surface (backward, forward, nearest, optional
tolerance) re-expressed as a union + ONE keyed window pass.

Scale shape: a range self-join explodes candidate pairs (every left
row × every right row in the band); the union trick shuffles each row
exactly once on the join key, sorts within partitions, and carries the
running last/first right-side values across the merged timeline —
state per key is O(1), no pair blowup, and `nearest` reuses the SAME
sort for both frames (Spark evaluates the preceding and following
frames in one WindowExec: one shuffle, one sort).

Tie semantics (documented, tested):
- exact ts matches are included in every direction (pandas
  `allow_exact_matches=True`);
- `nearest` breaks equidistant ties toward the BACKWARD (earlier)
  match — pandas' rule;
- rows of the right side must be unique per (key, ts) for the match
  to be well-defined (the usual merge_asof precondition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DIRECTIONS = ("backward", "forward", "nearest")


def asof_join_directions(
    left: DataFrame, right: DataFrame, key_col: str, ts_col: str
) -> DataFrame:
    """ALL THREE directions in ONE union + window pass — one shuffle,
    one sort, both frames evaluated in a single WindowExec. Returns
    every left row with ``{d}_asof_ts`` / ``{d}_<value col>`` for d in
    backward/forward/nearest.

    The single sort uses the right-first tie order, which the
    following frame cannot see at equal ts — but an exact-ts right row
    IS the forward match and the PRECEDING frame holds it, so
    forward = (backward if backward_ts == ts else first-following).
    Nearest picks the closer of the two, earlier on ties."""
    l_extra = [c for c in left.columns if c not in (key_col, ts_col)]
    r_vals = [c for c in right.columns if c not in (key_col, ts_col)]
    if set(l_extra) & set(r_vals):
        raise ValueError("left/right value column names must not overlap")

    def tag(df: DataFrame, is_left: bool) -> DataFrame:
        cols = [F.col(key_col), F.col(ts_col).alias("_ts")]
        for c in l_extra:
            cols.append(
                F.col(c)
                if is_left
                else F.lit(None).cast(left.schema[c].dataType).alias(c)
            )
        for c in r_vals:
            cols.append(
                F.lit(None).cast(right.schema[c].dataType).alias(c)
                if is_left
                else F.col(c)
            )
        cols.append(F.lit(1 if is_left else 0).alias("_side"))
        return df.select(*cols)

    tagged = tag(left, True).unionByName(tag(right, False))
    is_right = F.col("_side") == 0
    order = Window.partitionBy(key_col).orderBy("_ts", "_side")
    w_back = order.rowsBetween(Window.unboundedPreceding, 0)
    w_fwd = order.rowsBetween(0, Window.unboundedFollowing)

    def back(c):
        return F.last(F.when(is_right, F.col(c)), ignorenulls=True).over(w_back)

    def fwd(c):
        return F.first(F.when(is_right, F.col(c)), ignorenulls=True).over(w_fwd)

    exact = back("_ts") == F.col("_ts")
    now = F.unix_micros(F.col("_ts"))
    fwd_ts = F.when(exact, back("_ts")).otherwise(fwd("_ts"))
    d_back = now - F.unix_micros(back("_ts"))
    d_fwd = F.unix_micros(fwd_ts) - now
    use_back = fwd_ts.isNull() | (back("_ts").isNotNull() & (d_back <= d_fwd))
    picked = {"backward_asof_ts": back("_ts"), "forward_asof_ts": fwd_ts}
    picked["nearest_asof_ts"] = F.when(use_back, back("_ts")).otherwise(fwd_ts)
    for c in r_vals:
        f_c = F.when(exact, back(c)).otherwise(fwd(c))
        picked[f"backward_{c}"] = back(c)
        picked[f"forward_{c}"] = f_c
        picked[f"nearest_{c}"] = F.when(use_back, back(c)).otherwise(f_c)
    return (
        tagged.select(
            key_col,
            F.col("_ts").alias(ts_col),
            *l_extra,
            "_side",
            *[expr.alias(name) for name, expr in picked.items()],
        )
        .filter(F.col("_side") == 1)
        .drop("_side")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    direction: str = "backward",
    tolerance_micros: int | None = None,
) -> DataFrame:
    """Every left row + `asof_ts` (the matched right timestamp) + the
    right side's value columns (NULL when nothing matches, or when the
    match is farther than ``tolerance_micros``).

    ``backward``: latest right ts ≤ left ts. ``forward``: earliest
    right ts ≥ left ts. ``nearest``: whichever is closer by absolute
    time distance, earlier wins ties."""
    if direction not in DIRECTIONS:
        raise ValueError(f"direction must be one of {DIRECTIONS}")
    l_extra = [c for c in left.columns if c not in (key_col, ts_col)]
    r_vals = [c for c in right.columns if c not in (key_col, ts_col)]
    if set(l_extra) & set(r_vals):
        raise ValueError("left/right value column names must not overlap")

    # at equal ts the right row must be VISIBLE to the left row's
    # frame: sorted before it for the preceding frame (backward /
    # nearest), after it for the following frame (forward)
    right_first = direction != "forward"

    def tag(df: DataFrame, is_left: bool) -> DataFrame:
        cols = [F.col(key_col), F.col(ts_col).alias("_ts")]
        for c in l_extra:
            cols.append(
                F.col(c)
                if is_left
                else F.lit(None).cast(left.schema[c].dataType).alias(c)
            )
        for c in r_vals:
            cols.append(
                F.lit(None).cast(right.schema[c].dataType).alias(c)
                if is_left
                else F.col(c)
            )
        side = (1 if right_first else 0) if is_left else (0 if right_first else 1)
        cols.append(F.lit(side).alias("_side"))
        return df.select(*cols)

    tagged = tag(left, True).unionByName(tag(right, False))
    is_right = F.col("_side") == (0 if right_first else 1)
    order = Window.partitionBy(key_col).orderBy("_ts", "_side")
    w_back = order.rowsBetween(Window.unboundedPreceding, 0)
    w_fwd = order.rowsBetween(0, Window.unboundedFollowing)

    def back(c):
        return F.last(F.when(is_right, F.col(c)), ignorenulls=True).over(w_back)

    def fwd(c):
        return F.first(F.when(is_right, F.col(c)), ignorenulls=True).over(w_fwd)

    if direction == "backward":
        picked = {"asof_ts": back("_ts"), **{c: back(c) for c in r_vals}}
    elif direction == "forward":
        picked = {"asof_ts": fwd("_ts"), **{c: fwd(c) for c in r_vals}}
    else:
        # nearest: both frames off the SAME sort (right-first ordering
        # misses same-ts rows in the following frame, but the
        # preceding frame catches them at distance 0, which wins)
        now = F.unix_micros(F.col("_ts"))
        d_back = now - F.unix_micros(back("_ts"))
        d_fwd = F.unix_micros(fwd("_ts")) - now
        use_back = fwd("_ts").isNull() | (
            back("_ts").isNotNull() & (d_back <= d_fwd)
        )
        picked = {"asof_ts": F.when(use_back, back("_ts")).otherwise(fwd("_ts"))}
        for c in r_vals:
            picked[c] = F.when(use_back, back(c)).otherwise(fwd(c))

    out = tagged.select(
        key_col,
        F.col("_ts").alias(ts_col),
        *l_extra,
        "_side",
        *[expr.alias(f"_m_{name}") for name, expr in picked.items()],
    ).filter(F.col("_side") == (1 if right_first else 0))
    match_ts = F.col("_m_asof_ts")
    in_tol = (
        F.lit(True)
        if tolerance_micros is None
        else (
            F.abs(F.unix_micros(F.col(ts_col)) - F.unix_micros(match_ts))
            <= int(tolerance_micros)
        )
    )
    return out.select(
        key_col,
        ts_col,
        *l_extra,
        F.when(in_tol, match_ts).alias("asof_ts"),
        *[F.when(in_tol, F.col(f"_m_{c}")).alias(c) for c in r_vals],
    )
