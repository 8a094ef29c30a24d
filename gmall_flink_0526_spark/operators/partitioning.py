"""Partitioning helpers — keeping CPU-heavy stages at full parallelism.

Spark's stage parallelism is inherited from the input splits (or the
probe side's splits after a broadcast join). For scan-light,
compute-heavy operators (hashing, shingling, vector folds) a small
input — one parquet file locally, or a heavily-filtered scan at scale —
pins the whole stage to a handful of tasks. :func:`spread` restores
parallelism with a keyed shuffle, but only when the input is actually
under-partitioned, so it is a no-op on a well-split production scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, key: str) -> DataFrame:
    """Shuffle ``df`` out to the cluster's default parallelism keyed by
    ``key`` iff the current partition count is lower. The shuffle only
    ever moves under-partitioned (small) inputs, so its cost is bounded
    by the win of parallelizing the downstream CPU-heavy stage."""
    n = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < n:
        return df.repartition(n, key)
    return df
