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

from pyspark.sql import DataFrame, functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the big side into ``buckets``
    sub-keys (deterministic hash of the whole row, so replays agree)
    and replicate the small side once per bucket, so one hot key's rows
    land on ``buckets`` tasks instead of one.

    AQE's skew-join splitting (enabled in session.py) already handles
    sort-merge skew at runtime; use this when the skew is extreme or
    the join must stay shuffled-hash. The small side grows ``buckets``×
    — keep it broadcast-sized."""
    salt = F.pmod(F.hash(*[F.col(c) for c in big.columns]), F.lit(buckets))
    b = big.withColumn("_salt", salt)
    s = small.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1))))
    return b.join(s, on + ["_salt"], how).drop("_salt")


def spread(df: DataFrame, key: str) -> DataFrame:
    """Shuffle ``df`` out to the cluster's default parallelism keyed by
    ``key`` iff the current partition count is lower. The shuffle only
    ever moves under-partitioned (small) inputs, so its cost is bounded
    by the win of parallelizing the downstream CPU-heavy stage."""
    n = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < n:
        return df.repartition(n, key)
    return df
