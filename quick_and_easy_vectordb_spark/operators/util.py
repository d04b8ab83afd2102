"""Operator-level utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition a DataFrame up to the cluster's default
    parallelism if it currently has fewer partitions.

    Why: a small parquet table arrives as a single input split, so a
    CPU-heavy projection chain (md5 shingling, signature computation)
    would run on ONE core no matter how many the cluster has. At 100 TB
    the scan naturally has thousands of splits and this is a no-op
    (never repartitions downward); on small inputs it buys full CPU
    fan-out for one tiny shuffle of the input rows.
    """
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
