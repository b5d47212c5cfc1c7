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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Returns (col_name, n, null_frac, ndv, min_val, max_val) — one
    row per profiled column; min/max cast to double (numeric columns).
    An EMPTY table still profiles (one row per column, n = 0,
    null_frac NULL): the guarded division matters under ANSI mode,
    where a bare nulls/_n would abort the whole report on n = 0 (r9
    empty-table probe)."""
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
        f"'{c}', IF(_n > 0, CAST(`{c}__nulls` AS DOUBLE) / _n, NULL), "
        f"`{c}__ndv`, `{c}__min`, `{c}__max`"
        for c in cols
    )
    return one.selectExpr(
        "_n AS n",
        f"stack({len(cols)}, {stack_args}) AS "
        "(col_name, null_frac, ndv, min_val, max_val)",
    ).select("col_name", "n", "null_frac", "ndv", "min_val", "max_val")


def exact_quantiles_histogram(
    df: DataFrame, group_col: str, value_col: str, q_percents: list[int]
) -> DataFrame:
    """Exact per-group quantiles WITHOUT a per-group sort: the
    value-histogram plan for discrete/fixed-point measures (prices in
    cents, integer sizes, latencies in µs) whose distinct-value count
    is tiny next to the row count.

    `percentile()` (the `percentile` branch of agg_stats) materializes
    and sorts every row per group — O(rows log rows) and a full-width
    shuffle. This plan is: one scan → hash-agg on (group, value)
    [map-side partials, shuffle ∝ DISTINCT values, not rows] → a
    cumulative window over each group's histogram (thousands of rows,
    not billions) → one final agg. At 100 TB of lineitem, the shuffle
    drops from the table size to the histogram size.

    Nearest-rank definition, integer-exact: the q-th percentile is the
    smallest value whose cumulative count reaches ceil(q·n/100). With
    integer cum the test `cum ≥ q·n/100` is exactly `100·cum ≥ q·n` —
    no division, no rounding, so every emitted value is bit-identical
    cross-engine (`value_col` must be integral; callers quantize
    fixed-point columns, e.g. price → cents, before the call).

    Returns (group, n, p{q}... one column per requested percent).
    """
    hist = df.groupBy(group_col, value_col).agg(F.count(F.lit(1)).alias("_c"))
    return quantiles_from_hist(hist, group_col, value_col, q_percents)


def quantiles_from_hist(
    hist: DataFrame,
    group_col: str,
    value_col: str,
    q_percents: list[int],
    count_col: str = "_c",
) -> DataFrame:
    """`exact_quantiles_histogram` off a prebuilt (group, value, count)
    histogram — the reusable half: derived histograms (absolute
    deviations, residuals) get exact quantiles without touching the
    raw rows again."""
    cum_w = (
        Window.partitionBy(group_col)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.select(
        group_col,
        value_col,
        F.sum(count_col).over(cum_w).alias("_cum"),
        F.sum(count_col).over(Window.partitionBy(group_col)).alias("_n"),
    )
    aggs = [F.max("_n").alias("n")]
    for q in q_percents:
        aggs.append(
            F.min(
                F.when(
                    F.col("_cum") * 100 >= F.col("_n") * q, F.col(value_col)
                )
            ).alias(f"p{q}")
        )
    return cum.groupBy(group_col).agg(*aggs)


def mad_outlier_report(
    df: DataFrame, group_col: str, value_col: str, k: int = 3
) -> DataFrame:
    """Robust per-group outlier report: median, MAD (median absolute
    deviation — the robust spread that one corrupt batch can't drag
    the way stddev can), and the count of rows beyond k·MAD — the
    data-QA pass that flags poisoned shards / unit mix-ups before
    training.

    ONE raw scan: the value histogram feeds everything. The deviation
    histogram is DERIVED from it (|v − median| keyed re-aggregation of
    the counts — rows ∝ distinct values, the raw table is never read
    again), the MAD is a quantile of that derived histogram, and the
    outlier count folds the same histogram against k·MAD. Group-sized
    medians/MADs travel by broadcast. All integer arithmetic
    (``value_col`` integral, `k` an int): every output is bit-exact
    cross-engine.

    Returns (group, n, median, mad, n_outliers)."""
    hist = df.groupBy(group_col, value_col).agg(F.count(F.lit(1)).alias("_c"))
    return mad_outlier_report_from_hist(hist, group_col, value_col, k=k)


def mad_outlier_report_from_hist(
    hist: DataFrame, group_col: str, value_col: str, k: int = 3
) -> DataFrame:
    """`mad_outlier_report` off a prebuilt (group, value, _c)
    histogram — share ONE (ideally persisted) histogram between the
    quantile report and the outlier report instead of scanning the
    raw table once per report."""
    med = quantiles_from_hist(hist, group_col, value_col, [50]).select(
        group_col, F.col("n"), F.col("p50").alias("median")
    )
    dev_hist = (
        hist.join(F.broadcast(med.select(group_col, "median")), group_col)
        .groupBy(group_col, F.abs(F.col(value_col) - F.col("median")).alias("_dev"))
        .agg(F.sum("_c").alias("_c"))
    )
    mad = quantiles_from_hist(dev_hist, group_col, "_dev", [50]).select(
        group_col, F.col("p50").alias("mad")
    )
    outliers = (
        dev_hist.join(F.broadcast(mad), group_col)
        .groupBy(group_col)
        .agg(
            F.sum(
                F.when(F.col("_dev") > F.lit(int(k)) * F.col("mad"), F.col("_c"))
                .otherwise(F.lit(0))
            ).alias("n_outliers")
        )
    )
    return med.join(F.broadcast(mad), group_col).join(
        F.broadcast(outliers), group_col
    )


def key_skew_report(df: DataFrame, cols: list[str]) -> DataFrame:
    """(col_name, n_keys, max_cnt, skew_ratio, top_share) — the
    'should I salt this join?' diagnostic per candidate shuffle key:
    skew_ratio = hottest key's count over the mean per-key count
    (1.0 = perfectly uniform; the rule of thumb is to salt or enable
    AQE skew handling when it climbs into the hundreds), top_share =
    the hottest key's fraction of all rows.

    ONE scan for every analyzed column: the keys explode as
    (col_name, value) pairs off a map literal (an Expand, like
    `profile_columns`' multi-distinct plan), then two hash
    aggregations — shuffle ∝ Σ distinct keys across the columns,
    never a second pass over the table. Counts are exact integers and
    the two ratios single correctly-rounded double divisions, so the
    report is hash-exact against any engine."""
    pairs = df.select(
        F.explode(
            F.create_map(
                *[
                    x
                    for c in cols
                    for x in (
                        F.lit(c),
                        F.coalesce(F.col(c).cast("string"), F.lit("∅")),
                    )
                ]
            )
        ).alias("col_name", "_k")
    )
    per_key = pairs.groupBy("col_name", "_k").agg(F.count(F.lit(1)).alias("_c"))
    maxd = F.col("max_cnt").cast("double")
    return (
        per_key.groupBy("col_name")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.max("_c").alias("max_cnt"),
            F.sum("_c").alias("_total"),
        )
        .select(
            "col_name",
            F.col("n_keys").cast("long").alias("n_keys"),
            F.col("max_cnt").cast("long").alias("max_cnt"),
            (maxd / (F.col("_total").cast("double") / F.col("n_keys").cast("double"))).alias("skew_ratio"),
            (maxd / F.col("_total").cast("double")).alias("top_share"),
        )
    )


def drift_report(
    df: DataFrame, side: Column, cols: list[str]
) -> DataFrame:
    """Distribution drift between two corpus slices (crawl vs crawl,
    snapshot vs snapshot, shard vs shard): per analyzed column the
    exact TOTAL VARIATION DISTANCE between the two sides' value
    distributions — the drift gate a pipeline checks before mixing a
    new drop into training. TVD is chosen over PSI/KL deliberately:
    their log terms are libm calls (cross-engine ulp drift), while
    TVD = Σ|c_a·N_b − c_b·N_a| / (2·N_a·N_b) is INTEGER arithmetic
    until one final division — order-independent, bit-exact on any
    engine, no smoothing needed for empty buckets.

    ``side`` is any boolean Column splitting the rows (side A = true).

    ONE scan for every analyzed column (the key_skew_report Expand
    shape): values explode as (col, value) pairs, one hash-agg counts
    both sides conditionally (shuffle ∝ Σ distinct values), one more
    folds the integer TVD numerator — in DECIMAL(38,0): each term is
    bounded by N_a·N_b, which overflows int64 already at ~3e9 rows per
    side, exactly the scale this is for (decimal sums stay exact to
    1e38). An EMPTY side reports tvd = 1.0 — maximal drift, so a
    `tvd > threshold` gate can never silently pass a vanished slice.
    Returns (col_name, n_a, n_b, n_values, n_only_one_side, tvd)."""
    pairs = df.select(
        side.alias("_a"),
        F.explode(
            F.create_map(
                *[
                    x
                    for c in cols
                    for x in (
                        F.lit(c),
                        F.coalesce(F.col(c).cast("string"), F.lit("∅")),
                    )
                ]
            )
        ).alias("col_name", "_v"),
    )
    per_val = pairs.groupBy("col_name", "_v").agg(
        F.sum(F.col("_a").cast("long")).alias("_ca"),
        F.sum((~F.col("_a")).cast("long")).alias("_cb"),
    )
    w = Window.partitionBy("col_name")
    tot = per_val.select(
        "col_name",
        "_ca",
        "_cb",
        F.sum("_ca").over(w).alias("_na"),
        F.sum("_cb").over(w).alias("_nb"),
    )
    dec = "decimal(38,0)"
    num = F.sum(
        F.abs(
            F.col("_ca").cast(dec) * F.col("_nb").cast(dec)
            - F.col("_cb").cast(dec) * F.col("_na").cast(dec)
        )
    )
    return tot.groupBy("col_name").agg(
        F.max("_na").cast("long").alias("n_a"),
        F.max("_nb").cast("long").alias("n_b"),
        F.count(F.lit(1)).cast("long").alias("n_values"),
        F.sum(((F.col("_ca") == 0) | (F.col("_cb") == 0)).cast("long"))
        .cast("long")
        .alias("n_only_one_side"),
        F.when(
            (F.max("_na") == 0) | (F.max("_nb") == 0), F.lit(1.0)
        )
        .otherwise(
            num.cast("double")
            / (F.lit(2.0) * F.max("_na") * F.max("_nb"))
        )
        .alias("tvd"),
    )


def join_size_report(
    a: DataFrame, a_key: str, b: DataFrame, b_key: str
) -> DataFrame:
    """Pre-flight join-size guard: the EXACT output cardinality of
    a ⋈ b on the key, computed from the two key histograms BEFORE
    running the join — |A ⋈ B| = Σ_k c_a(k)·c_b(k), plus the hottest
    key's contribution and a blowup factor. The "will this join
    explode" check a pipeline runs before an expensive shuffle; pure
    integer arithmetic, hash-exact.

    Scale shape: one partial-agg histogram per side (shuffle ∝
    distinct keys each, PERSISTED so the row totals fold from the
    histogram instead of re-scanning the table), an inner join of the
    two histograms (∝ shared keys), one fold. The join itself never
    runs; each input is scanned exactly once.

    Returns (n_a, n_b, n_out, max_key_out, blowup) where blowup =
    n_out / max(n_a, n_b) — > 1 means the join multiplies rows."""
    from ..util import persist_tracked, release_caches

    release_caches("join_size_report")
    ha = persist_tracked(
        a.groupBy(F.col(a_key).alias("_k")).agg(
            F.count(F.lit(1)).alias("_ca")
        ),
        scope="join_size_report",
    )
    hb = persist_tracked(
        b.groupBy(F.col(b_key).alias("_k")).agg(
            F.count(F.lit(1)).alias("_cb")
        ),
        scope="join_size_report",
    )
    per_key = ha.join(hb, "_k").select(
        (F.col("_ca") * F.col("_cb")).alias("_out")
    )
    na = ha.agg(F.coalesce(F.sum("_ca"), F.lit(0)).alias("n_a"))
    nb = hb.agg(F.coalesce(F.sum("_cb"), F.lit(0)).alias("n_b"))
    return (
        per_key.agg(
            F.coalesce(F.sum("_out"), F.lit(0)).cast("long").alias("n_out"),
            F.coalesce(F.max("_out"), F.lit(0)).cast("long").alias(
                "max_key_out"
            ),
        )
        .crossJoin(na)
        .crossJoin(nb)
        .select(
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            "n_out",
            "max_key_out",
            F.when(F.greatest(F.col("n_a"), F.col("n_b")) == 0, F.lit(0.0))
            .otherwise(
                F.col("n_out").cast("double")
                / F.greatest(F.col("n_a"), F.col("n_b")).cast("double")
            )
            .alias("blowup"),
        )
    )
