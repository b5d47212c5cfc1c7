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

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


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
    purge: tuple[DataFrame, str] | None = None,
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
    only — probes fail LOUDLY (TABLE_OR_VIEW_NOT_FOUND, never stale
    answers) until the next compaction run, which recovers the live
    name automatically before proceeding (pinned by a
    failure-injection test in tests/test_index_append.py). Runs ∝
    table size with zero
    recomputation — rows are moved, never re-derived, so it applies
    identically to every index family.

    ``purge=(tombstones, id_col)`` (r12) physically drops dead rows
    during the rewrite: the tombstone relation is deletion-sized and
    broadcast, so the anti-join rides the task-local bucket scan as a
    map-side filter — the rewrite stays zero-shuffle. Callers clear
    the tombstone table afterwards (the family-level
    ``compact_*_index`` wrappers do)."""
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
        df = spark.table(table_name)
        if purge is not None:
            df = _anti_tombstone(df, purge[0], purge[1])
        write_bucketed(df, tmp, keys, buckets=buckets, sort=sort)
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


# --------------------------------------------------------------------------
# deletion / upsert for persisted indexes (r12, r11 verdict task #2)
#
# The bucketed index tables are INSERT-only parquet — a real standing
# corpus also sees takedowns and re-crawls. Rather than rewrite the
# corpus-sized layout per deletion, every index row carries a
# GENERATION stamp (``gen``: 0 at full write, +1 per append or
# tombstone batch, tracked in the one-row ``{base}_state`` table), and
# deletions append (id, gen) rows to ``{base}_tombstones``. A row is
# dead iff some tombstone for its id is at least as new as the row —
# so deleting an id kills everything written so far, while REINGEST
# (tombstone at gen g, re-append at gen g+1) resurrects the id with
# only its new rows visible. Probes anti-join the (deletion-sized,
# broadcast) tombstone table map-side — the corpus never shuffles —
# and compaction purges dead rows physically (the rewrite is already
# task-local per bucket) then clears the tombstones.
#
# Concurrency contract: ONE writer at a time per index (the daily
# ingest job) — bump_gen's read-modify-write of the one-row state
# table is not atomic across concurrent writers, the same single-
# writer assumption the bucketed appends and compaction swap already
# carry. Readers are unaffected: probes only ever see committed
# parquet. A multi-writer deployment needs a lakehouse table format's
# optimistic transactions underneath; the generation algebra itself
# transfers unchanged.
# --------------------------------------------------------------------------


def _clear_orphan_location(spark: SparkSession, table_name: str) -> None:
    """Remove a MANAGED table directory the catalog no longer knows
    about. With an in-memory session catalog (the default here and in
    any metastore-less deployment) a restart forgets every table while
    the warehouse directories survive; the next `saveAsTable` then
    fails with LOCATION_ALREADY_EXISTS. Only fires when the catalog
    has NO entry for the name — a live table is never touched."""
    if spark.catalog.tableExists(table_name):
        return
    import os
    import shutil

    wh = spark.conf.get("spark.sql.warehouse.dir", "").replace("file:", "")
    loc = os.path.join(wh, table_name.lower())
    if wh and os.path.isdir(loc):
        shutil.rmtree(loc)


def init_index_state(spark: SparkSession, base_name: str) -> None:
    """Reset an index's generation counter to 0 and drop any standing
    tombstones — called by every full index WRITE, BEFORE the data
    tables are written (r12 review): a from-scratch rewrite contains
    only live rows, so old deletions are meaningless against it — and
    clearing them first means a crash mid-write can only leave a loud
    failure (missing/partial table), never stale tombstones silently
    hiding the fresh gen-0 rows."""
    _clear_orphan_location(spark, f"{base_name}_state")
    spark.createDataFrame([(0,)], "gen long").write.mode(
        "overwrite"
    ).format("parquet").saveAsTable(f"{base_name}_state")
    spark.sql(f"DROP TABLE IF EXISTS {base_name}_tombstones")
    _clear_orphan_location(spark, f"{base_name}_tombstones")


def current_gen(spark: SparkSession, base_name: str) -> int:
    """The index's current generation (one-row read; 0 for an index
    written before generation tracking existed)."""
    if not spark.catalog.tableExists(f"{base_name}_state"):
        return 0
    return spark.table(f"{base_name}_state").collect()[0].gen


def bump_gen(spark: SparkSession, base_name: str) -> int:
    """Advance the index's generation and return the new value — one
    one-row read + one one-row overwrite, called once per append or
    tombstone batch (never per row)."""
    g = current_gen(spark, base_name) + 1
    _clear_orphan_location(spark, f"{base_name}_state")
    spark.createDataFrame([(g,)], "gen long").write.mode(
        "overwrite"
    ).format("parquet").saveAsTable(f"{base_name}_state")
    return g


def add_tombstones(
    spark: SparkSession,
    base_name: str,
    ids: DataFrame,
    id_col: str = "id",
    at_gen: int | None = None,
) -> None:
    """Mark ids as deleted from the index, stamped at the CURRENT
    generation (bumped first, so the tombstone covers every row
    written so far and nothing appended after it). Cost ∝ deletions:
    one append of (id, gen) rows — no index table is read or touched.

    ``at_gen`` stamps an EXPLICIT generation without bumping — the
    reingest appenders use it to tombstone AFTER writing the new rows
    (stamp = new rows' gen − 1, killing everything older): tombstoning
    first would open a crash window where the ids are dead with no
    replacement written, a silent delete; append-then-tombstone can at
    worst leave visible duplicates, the documented plain-INSERT state,
    repaired by retrying (r12 review)."""
    g = bump_gen(spark, base_name) if at_gen is None else int(at_gen)
    _clear_orphan_location(spark, f"{base_name}_tombstones")
    ids.select(
        F.col(id_col).alias("id"), F.lit(g).cast("long").alias("gen")
    ).write.mode("append").format("parquet").saveAsTable(
        f"{base_name}_tombstones"
    )


def clear_tombstones(spark: SparkSession, base_name: str) -> None:
    """Drop the tombstone table — only valid right after a compaction
    purge (the dead rows are physically gone) or a full rewrite."""
    spark.sql(f"DROP TABLE IF EXISTS {base_name}_tombstones")


def _dead_row_cond(rows: DataFrame, id_col: str) -> Column:
    return (rows[id_col] == F.col("_tomb_id")) & (
        F.col("_tomb_gen") >= rows["gen"]
    )


def _anti_tombstone(rows: DataFrame, tomb: DataFrame, id_col: str) -> DataFrame:
    # rows written before generation tracking existed carry no gen
    # column — treat them as gen 0 (every tombstone kills them)
    # instead of failing analysis (r12 review)
    if "gen" not in rows.columns:
        rows = rows.withColumn("gen", F.lit(0).cast("long"))
    t = tomb.select(
        F.col("id").alias("_tomb_id"), F.col("gen").alias("_tomb_gen")
    )
    return rows.join(F.broadcast(t), _dead_row_cond(rows, id_col), "left_anti")


def filter_tombstoned(
    spark: SparkSession, base_name: str, rows: DataFrame, id_col: str
) -> DataFrame:
    """Drop rows whose id carries a tombstone at least as new as the
    row — the probe-side view of deletions. The tombstone side is
    deletion-sized and BROADCAST (a BroadcastHashJoin LeftAnti with
    the gen comparison riding the join condition), so the corpus-side
    relation is filtered map-side without moving; with no tombstone
    table the input returns untouched, zero overhead."""
    if not spark.catalog.tableExists(f"{base_name}_tombstones"):
        return rows
    return _anti_tombstone(rows, spark.table(f"{base_name}_tombstones"), id_col)


def compact_index_tables(
    spark: SparkSession,
    base_name: str,
    tables: list[tuple[str, str | list[str], str]],
) -> None:
    """Shared body of the family-level ``compact_*_index`` wrappers
    (r12 review: three copies of the tombstone-lookup + purge + clear
    boilerplate had started to drift-risk). ``tables`` lists
    (suffix, bucket_key, id_col) per data table; the standing
    tombstones (if any) are purged from each during its zero-shuffle
    compaction rewrite, then cleared once."""
    tomb = (
        spark.table(f"{base_name}_tombstones")
        if spark.catalog.tableExists(f"{base_name}_tombstones")
        else None
    )
    for suffix, key, id_col in tables:
        compact_bucketed_table(
            spark,
            f"{base_name}_{suffix}",
            key,
            purge=None if tomb is None else (tomb, id_col),
        )
    clear_tombstones(spark, base_name)


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
