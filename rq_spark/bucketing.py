"""Bucketed-table co-location: the shuffle-free join path for big⋈big.

Broadcast handles small⋈big and salting handles skew; the remaining
100 TB join shape is big⋈big on a stable key (e.g. orders⋈lineitem on
orderkey, repeated by every downstream pipeline). Bucketing pays the
shuffle ONCE at write time: both tables are hash-partitioned into the
same number of buckets on the join key and sorted within buckets, so
every subsequent join/aggregation on that key runs as a zero-Exchange
SortMergeJoin — each task reads bucket i of both sides locally.

This is Spark's native bucketing (`DataFrameWriter.bucketBy` +
`saveAsTable`); no Hive metastore needed — the bucket spec lives in
the session catalog's table metadata. The reference has no tables at
all (stdin pipes, rq.rs:157-159), so this is extension-layer only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    key: str | list[str],
    buckets: int = 8,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Materialize df as a bucketed (and bucket-sorted) catalog table.
    ``key`` may be a single column or a composite key list (e.g.
    ``["band", "bhash"]`` for the LSH band index) — a later equi-join
    must use EXACTLY these columns for the zero-Exchange path.

    At 100 TB pick buckets so one bucket of the BIGGER table fits an
    executor's sort budget (e.g. 4096 buckets for ~25 GB each); both
    join sides must use the SAME bucket count or Spark re-shuffles the
    mismatched side.

    ``mode="append"`` (r11) is the daily-ingest path: new rows hash
    into their key's existing bucket (Spark validates the declared
    spec against the table's and refuses a mismatch), so the
    zero-Exchange join layout survives the append. The only read-side
    change is the per-file sort guarantee — a bucket now holds one
    file per write, so the scan re-sorts task-locally (a Sort node,
    never an Exchange) until the table is compacted.
    """
    keys = [key] if isinstance(key, str) else list(key)
    w = df.write.mode(mode).format("parquet").bucketBy(buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.saveAsTable(table_name)


def compact_bucketed_table(
    spark: SparkSession,
    table_name: str,
    key: str | list[str],
    sort: bool = True,
) -> None:
    """Rewrite a bucketed table back to ~one file per bucket (r11) —
    the maintenance step that completes the persisted-index lifecycle
    (write → probe → append → COMPACT): every append adds one file
    per touched bucket, and while the bucket-pruned zero-Exchange read
    survives any number of appends, a many-file bucket pays a
    task-local re-sort per scan and more open/seek overhead. Compaction
    reads the table through its OWN bucketing (one scan partition per
    bucket — all of bucket i's files land in task i with no shuffle),
    rewrites each bucket as one sorted file, then swaps the rewrite in
    via RENAME.

    The rewrite is ZERO-shuffle: with the auto-bucketed-scan heuristic
    pinned off, the scan reads one partition per bucket (all of bucket
    i's files in task i — the bucketing already satisfies the write's
    distribution, so adding a repartition here is not just redundant,
    the planner REMOVES it while also un-bucketing the scan, which
    silently yields task-misaligned multi-file output; measured, and
    pinned in tests/test_index_append.py). Each task rewrites its
    bucket as one sorted file.

    Still non-transactional, but since r12 the data EXISTS UNDER SOME
    NAME at every step (r11 verdict task #3): the live table is
    renamed aside to ``{table}__precompact``, the rewrite renamed in,
    and only then is the backup dropped — the old DROP-then-RENAME
    order had a crash window that lost the table outright. A crash
    between the two renames leaves the data under the backup name
    only; the next compaction (or any caller) recovers it
    automatically (pinned by a failure-injection test in
    tests/test_index_append.py). Runs ∝ table size with zero
    recomputation — rows are moved, never re-derived, so it applies
    identically to every index family."""
    keys = [key] if isinstance(key, str) else list(key)
    backup = f"{table_name}__precompact"
    # crash recovery: a previous compaction that died between its two
    # renames left the data under the backup name only — restore it
    # before doing anything else
    if not spark.catalog.tableExists(table_name) and spark.catalog.tableExists(
        backup
    ):
        spark.sql(f"ALTER TABLE {backup} RENAME TO {table_name}")
    spark.sql(f"DROP TABLE IF EXISTS {backup}")
    buckets = table_buckets(spark, table_name)
    tmp = f"{table_name}__compacting"
    spark.sql(f"DROP TABLE IF EXISTS {tmp}")
    _AUTO = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    prev = spark.conf.get(_AUTO, "true")
    spark.conf.set(_AUTO, "false")
    try:
        write_bucketed(
            spark.table(table_name), tmp, keys, buckets=buckets, sort=sort
        )
    finally:
        spark.conf.set(_AUTO, prev)
    spark.sql(f"ALTER TABLE {table_name} RENAME TO {backup}")
    spark.sql(f"ALTER TABLE {tmp} RENAME TO {table_name}")
    spark.sql(f"DROP TABLE {backup}")


def table_buckets(spark: SparkSession, table_name: str) -> int:
    """Bucket count of an existing bucketed table, from the catalog
    metadata (DESCRIBE FORMATTED) — appenders must declare EXACTLY
    the existing count, and reading it from the table (never a caller
    argument) makes layout drift impossible."""
    for r in spark.sql(f"DESCRIBE FORMATTED {table_name}").collect():
        if r.col_name.strip() == "Num Buckets":
            return int(r.data_type)
    raise ValueError(f"table {table_name} is not bucketed")


def cojoin(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    key: str,
    how: str = "inner",
) -> DataFrame:
    """Join two identically-bucketed tables on their bucket key.

    The physical plan is a SortMergeJoin with NO Exchange on either
    side (asserted in tests/test_plans.py): bucket i of the left reads
    against bucket i of the right, task-local. With `sort=True` at
    write time even the per-task Sort disappears for the sorted key.
    """
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    return lt.join(rt, key, how)
