"""Multi-dimensional data layout for scan pruning at 100 TB.

Two mechanisms turn a 100 TB scan into a GB scan: directory partition
pruning (one low-cardinality dimension, e.g. ingest date — Catalyst
drops whole directories before any I/O) and parquet row-group min/max
skipping (the reader drops row groups whose column statistics cannot
satisfy the pushed predicate). Both only help if the physical layout
CLUSTERS the filtered columns — a time-ordered event log has tight ts
ranges per row group but every user_id in every row group, so a
user_id predicate reads all of it.

Z-ordering fixes the multi-column case: rank-normalize k sort keys to
fixed-point, interleave their bits (Morton code), and range-partition
+ sort by the interleaved value. Rows close in z-value are close in
EVERY dimension, so each row group covers a tight min/max box on every
indexed column and a predicate on ANY of them skips most groups.
Delta/Iceberg expose this as OPTIMIZE ZORDER BY; plain Spark has no
operator for it, so this builds the z-value with pure JVM expressions
(one min/max aggregate for the fixed-point scale, then shift/mask bit
spreading — no UDF, stays inside whole-stage codegen) and lets
`repartitionByRange` + `sortWithinPartitions` produce the physical
order.

Scale shape: the only driver-side data is one min/max row (2 numbers
per z-column); `repartitionByRange` samples the z-value to pick
boundaries exactly as a global sort would. One shuffle, paid once at
write time — the same bargain as `bucketing.py`, but for range/equality
scan pruning instead of join co-location.

The reference has no storage layer at all (stdin pipes, rq.rs:157-159);
this is extension-layer, evidenced by footer-statistics tests in
tests/test_layout.py rather than a driver catalog key (the driver runs
read-only against /root/testdata).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "interleave_bits",
    "zorder_value",
    "write_zordered",
    "write_partitioned_sorted",
]


def interleave_bits(scaled: list[Column], bits: int) -> Column:
    """Morton-interleave k already-scaled fixed-point columns.

    Each input must be a non-negative long < 2**bits; output bit
    ``i*k + j`` is bit ``i`` of input ``j`` (dimension 0 contributes
    the most significant bit of each round, matching the usual Morton
    convention). Unrolled shift/mask expressions — ``bits * k`` OR
    terms, all JVM-side, no UDF.
    """
    k = len(scaled)
    if k == 0:
        raise ValueError("interleave_bits: need at least one column")
    if bits * k > 63:
        raise ValueError(f"interleave_bits: {bits} bits x {k} dims > 63")
    z = F.lit(0).cast("long")
    for j, col in enumerate(scaled):
        for i in range(bits):
            bit = F.shiftright(col, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * k + (k - 1 - j)))
    return z


def _to_numeric(col: Column, dtype: str) -> Column:
    """Project a column onto a locality-preserving numeric axis.

    Dates/timestamps become epoch numbers; strings get no total order
    cheaply, so they hash — equality predicates still cluster (all
    rows of one value share one z-range), range predicates on string
    columns do not. Documented, not hidden: callers who need string
    ranges should pre-compute a rank column themselves.
    """
    if dtype == "date":
        return F.datediff(col, F.lit("1970-01-01")).cast("double")
    if dtype.startswith("timestamp"):
        # NTZ has no direct numeric cast; via TIMESTAMP it becomes epoch
        # seconds — monotonic, which is all locality needs
        return col.cast("timestamp").cast("double")
    if dtype in ("string", "binary"):
        return F.xxhash64(col).cast("double")
    return col.cast("double")


def zorder_value(df: DataFrame, cols: list[str], bits: int | None = None) -> Column:
    """Build the z-order Column for `cols` over this DataFrame.

    Runs ONE min/max aggregate (a driver row of 2k numbers — constant
    regardless of table size) to fix the per-column linear fixed-point
    scale, then interleaves. Linear scaling is exact for the pruning
    guarantee as long as predicates are on raw values; heavily skewed
    dimensions waste code space but stay correct — pre-transform
    (e.g. log) before calling if that matters. NULLs scale to 0, i.e.
    cluster at the low end like a NULLS FIRST sort.
    """
    if not cols:
        raise ValueError("zorder_value: need at least one column")
    if bits is None:
        bits = min(16, 63 // len(cols))
    dtypes = dict(df.dtypes)
    numeric = [_to_numeric(F.col(c), dtypes[c]) for c in cols]
    bounds = df.agg(
        *[f(c).alias(f"{tag}{i}") for i, c in enumerate(numeric) for tag, f in (("mn", F.min), ("mx", F.max))]
    ).first()
    maxv = (1 << bits) - 1
    scaled = []
    for i, c in enumerate(numeric):
        mn, mx = bounds[f"mn{i}"], bounds[f"mx{i}"]
        if mn is None or mx is None or mx <= mn:
            scaled.append(F.lit(0).cast("long"))
            continue
        q = F.floor((c - F.lit(float(mn))) / F.lit(float(mx) - float(mn)) * maxv)
        scaled.append(
            F.coalesce(F.least(F.lit(maxv), F.greatest(F.lit(0), q)), F.lit(0)).cast("long")
        )
    return interleave_bits(scaled, bits)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    num_files: int = 32,
    bits: int | None = None,
) -> None:
    """Materialize df as z-ordered parquet: one range-shuffle on the
    interleaved value, sorted within each output file so row groups
    inside a file stay tight too.

    At 100 TB pick `num_files` so one file is a few hundred MB (the
    row-group skipping granularity is `parquet.block.size` inside each
    file; the file count only bounds task parallelism at read time).
    """
    z = zorder_value(df, cols, bits)
    (
        df.withColumn("_zorder", z)
        .repartitionByRange(num_files, "_zorder")
        .sortWithinPartitions("_zorder")
        .drop("_zorder")
        .write.mode("overwrite")
        .parquet(path)
    )


def write_partitioned_sorted(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    sort_cols: list[str] | None = None,
) -> None:
    """Directory-partitioned parquet with row-group-local sort.

    `partitionBy` alone makes every write task open one file per
    partition value it sees (tiny-file explosion at 100 TB); the
    repartition on the partition keys routes each value to one task
    first, and the within-partition sort (partition keys first, then
    the secondary keys) keeps one partition value per open file AND
    tight min/max on the secondary keys inside each file. Reads with a
    predicate on `partition_cols` prune directories in the plan
    (`PartitionFilters`, asserted in tests/test_layout.py); predicates
    on `sort_cols` skip row groups via footer statistics.
    """
    sort_cols = sort_cols or []
    (
        df.repartition(*[F.col(c) for c in partition_cols])
        .sortWithinPartitions(*partition_cols, *sort_cols)
        .write.mode("overwrite")
        .partitionBy(*partition_cols)
        .parquet(path)
    )
