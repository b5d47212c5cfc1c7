"""Small engine-wide utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


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
