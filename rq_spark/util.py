"""Small engine-wide utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


# Persisted-DataFrame registry. Pipelines that persist for in-plan
# reuse (shingle sets, label-propagation rounds) return LAZY results,
# so they cannot unpersist before the caller's action runs; without
# cleanup each catalog query pins its caches for the session's
# lifetime (Spark's CacheManager is keyed by plan, never GC'd). Each
# pipeline calls release_caches() on entry, bounding live cache to one
# query's working set instead of the whole session's.
_PERSISTED: list[DataFrame] = []


def persist_tracked(df: DataFrame) -> DataFrame:
    df.persist()
    _PERSISTED.append(df)
    return df


def release_caches() -> None:
    while _PERSISTED:
        try:
            _PERSISTED.pop().unpersist()
        except Exception:
            pass


def spread(df: DataFrame) -> DataFrame:
    """Local-input artifact fix: a single small parquet file arrives
    as ONE scan partition, serializing expression-heavy narrow chains
    on one core. A real multi-file dataset already scans wide, so this
    repartitions only when the scan is narrower than the cluster — a
    no-op at 100 TB, where it would otherwise add a full-table
    shuffle."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, target // 2):
        return df.repartition(target)
    return df
