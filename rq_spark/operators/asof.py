"""As-of (nearest-event) joins in all three directions — the pandas /
polars `merge_asof` surface (backward, forward, nearest, optional
tolerance) re-expressed as a union + ONE keyed window pass.

Scale shape: a range self-join explodes candidate pairs (every left
row × every right row in the band); the union trick shuffles each row
exactly once on the join key, sorts within partitions, and carries the
running last/first right-side ROW (a single struct — the matched
timestamp and its value columns stay atomic, so a NULL value in the
matched row comes back as that row's NULL, never a value smuggled from
an earlier row) across the merged timeline — state per key is O(1),
no pair blowup, and `nearest` reuses the SAME sort for both frames
(Spark evaluates the preceding and following frames in one WindowExec:
one shuffle, one sort).

Tie semantics (documented, tested):
- exact ts matches are included in every direction (pandas
  `allow_exact_matches=True`);
- `nearest` breaks equidistant ties toward the BACKWARD (earlier)
  match — pandas' rule;
- rows of the right side must be unique per (key, ts) for the match
  to be well-defined (the usual merge_asof precondition).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DIRECTIONS = ("backward", "forward", "nearest")


def _prep(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    right_first: bool,
):
    """Shared machinery: the tagged union, the right-row STRUCT (kept
    atomic through the window fold), and the two frame accessors."""
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
        side = (1 if right_first else 0) if is_left else (0 if right_first else 1)
        cols.append(F.lit(side).alias("_side"))
        return df.select(*cols)

    tagged = tag(left, True).unionByName(tag(right, False))
    is_right = F.col("_side") == (0 if right_first else 1)
    # the whole right row folds as ONE struct: the struct is non-NULL
    # for every right row even when its value fields are NULL, so
    # last/first(ignorenulls) can never mix the matched timestamp with
    # a different row's values
    rrow = F.when(
        is_right,
        F.struct(F.col("_ts").alias("_rts"), *[F.col(c) for c in r_vals]),
    )
    order = Window.partitionBy(key_col).orderBy("_ts", "_side")
    back = F.last(rrow, ignorenulls=True).over(
        order.rowsBetween(Window.unboundedPreceding, 0)
    )
    fwd = F.first(rrow, ignorenulls=True).over(
        order.rowsBetween(0, Window.unboundedFollowing)
    )
    left_side = 1 if right_first else 0
    return tagged, l_extra, r_vals, back, fwd, left_side


def _emit(
    out: DataFrame,
    key_col: str,
    ts_col: str,
    l_extra: list[str],
    r_vals: list[str],
    matched: dict[str, Column],
    tolerance_micros: int | None,
) -> DataFrame:
    """Project the final columns, nulling matches beyond tolerance.
    ``matched`` maps output prefix ('' for single-direction, 'd_' for
    multi) to the chosen right-row struct."""
    cols = [
        F.col(key_col),
        F.col("_ts").alias(ts_col),
        *[F.col(c) for c in l_extra],
    ]
    for prefix, row in matched.items():
        in_tol = (
            F.lit(True)
            if tolerance_micros is None
            else (
                F.abs(
                    F.unix_micros(F.col("_ts")) - F.unix_micros(row["_rts"])
                )
                <= int(tolerance_micros)
            )
        )
        kept = F.when(in_tol, row)
        cols.append(kept["_rts"].alias(f"{prefix}asof_ts"))
        cols.extend(kept[c].alias(f"{prefix}{c}") for c in r_vals)
    return out.select(*cols)


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
    # at equal ts the right row must be VISIBLE to the left row's
    # frame: sorted before it for the preceding frame (backward /
    # nearest), after it for the following frame (forward)
    right_first = direction != "forward"
    tagged, l_extra, r_vals, back, fwd, left_side = _prep(
        left, right, key_col, ts_col, right_first
    )
    if direction == "backward":
        row = back
    elif direction == "forward":
        row = fwd
    else:
        now = F.unix_micros(F.col("_ts"))
        d_back = now - F.unix_micros(back["_rts"])
        d_fwd = F.unix_micros(fwd["_rts"]) - now
        use_back = fwd.isNull() | (back.isNotNull() & (d_back <= d_fwd))
        row = F.when(use_back, back).otherwise(fwd)
    out = tagged.select("*", row.alias("_row")).filter(
        F.col("_side") == left_side
    )
    return _emit(
        out, key_col, ts_col, l_extra, r_vals, {"": F.col("_row")},
        tolerance_micros,
    )


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
    tagged, l_extra, r_vals, back, fwd, left_side = _prep(
        left, right, key_col, ts_col, right_first=True
    )
    exact = back["_rts"] == F.col("_ts")
    fwd_row = F.when(exact, back).otherwise(fwd)
    now = F.unix_micros(F.col("_ts"))
    d_back = now - F.unix_micros(back["_rts"])
    d_fwd = F.unix_micros(fwd_row["_rts"]) - now
    use_back = fwd_row.isNull() | (back.isNotNull() & (d_back <= d_fwd))
    near_row = F.when(use_back, back).otherwise(fwd_row)
    # one select so every window expression extracts into a single
    # WindowExec (a withColumn chain stacks one Window node per call)
    out = tagged.select(
        "*",
        back.alias("_b"),
        fwd_row.alias("_f"),
        near_row.alias("_n"),
    ).filter(F.col("_side") == left_side)
    return _emit(
        out,
        key_col,
        ts_col,
        l_extra,
        r_vals,
        {
            "backward_": F.col("_b"),
            "forward_": F.col("_f"),
            "nearest_": F.col("_n"),
        },
        None,
    )
