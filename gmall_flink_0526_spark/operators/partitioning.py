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

import logging
import math
import os
import re
from urllib.parse import unquote, urlparse

from pyspark.sql import DataFrame, functions as F

from .cache import scoped_persist

_LOG = logging.getLogger(__name__)

# Row bound for explicit broadcast hints on DERIVED tables (grouped-agg
# outputs, filtered key sets) whose size Catalyst cannot estimate from
# file statistics. 4M rows of (key, id)-shaped data is tens-to-hundreds
# of MB serialized — an order of magnitude under Spark's 8 GB broadcast
# hard cap, and far past anything the guarded call sites produce on a
# sane corpus (hot-bucket stats are bounded by n_rows / cap; an eval
# set is benchmark-sized by contract).
BROADCAST_ROW_LIMIT = 4_000_000


def bounded_broadcast(df: DataFrame, limit: int = BROADCAST_ROW_LIMIT, what: str = "side"):
    """A guarded ``F.broadcast`` for derived tables with no size stats.

    An explicit broadcast hint bypasses ``autoBroadcastJoinThreshold``
    entirely: on a pathological input the hinted side can blow past the
    driver's memory or Spark's 8 GB broadcast hard cap and fail the job
    with an opaque OOM. This helper persists the side (query-scoped, so
    the count and the join share one computation), counts it, and past
    ``limit`` rows DROPS the hint with a warning — the join falls back
    to a shuffled plan of the same shape instead of failing. Under the
    limit it returns the hinted frame, so every existing plan assertion
    (BroadcastHashJoin on the sane path) holds unchanged.

    EAGER: the guard runs ``df.count()`` at plan-construction time —
    one small Spark job per guarded site (shared with the join via the
    persist). Callers whose side is bounded by CONTRACT (a micro-batch
    in foreachBatch, a benchmark-sized eval set sampled upstream) may
    keep a raw ``F.broadcast`` and say so in a comment; the guard is
    for derived tables whose row count no contract bounds.

    LIFECYCLE: the persist is registered in the ``scoped_persist``
    scope, which a batch catalog query drains on entry. Long-running
    callers that construct guarded plans in a loop — the incremental
    streaming apps build one per micro-batch — MUST drain the scope
    themselves once the epoch's writes are done (``release_scoped()``
    in the foreachBatch ``finally``; epochs are serial so nothing else
    holds the scope), or pinned frames accumulate one per epoch for
    the life of the stream.
    """
    df = scoped_persist(df)
    n = df.count()
    if n > limit:
        _LOG.warning(
            "bounded_broadcast: %s has %d rows (> %d) — dropping the broadcast "
            "hint and letting the join shuffle; if this is expected, raise the "
            "limit at the call site.",
            what,
            n,
            limit,
        )
        return df
    return F.broadcast(df)


def global_row_number(
    df: DataFrame,
    order_cols: list[str],
    out_col: str,
    npart: int | None = None,
) -> DataFrame:
    """``ROW_NUMBER() OVER (ORDER BY order_cols)`` without Spark's
    single-partition global window.

    An unpartitioned window moves the ENTIRE frame to one task
    (``WindowExec: No Partition Defined``) — fine over a post-limit
    head or a histogram, fatal over a corpus. This helper computes the
    identical ranks in two parallel jobs instead:

    1. range-partition on the order key (explicit ``npart``, so AQE
       never re-coalesces and the routing is monotone: every row in
       partition *i* orders before every row in partition *i+1*),
       rank WITHIN each partition (a partitioned window — parallel),
    2. count rows per partition (``<= npart`` rows, collected under the
       :func:`bounded_broadcast` eager-scalar precedent) and add each
       partition's cumulative predecessor count as a CASE-mapped
       offset — pure map-side, no join, no second pass over the data.

    ``order_cols`` MUST be tie-broken to uniqueness (append the row's
    id, as every rank oracle here already does): ranks are then a pure
    function of the data — bit-identical to the global window and to
    the SQL oracle regardless of partition boundaries. The frame is
    scope-persisted so the count pass and the downstream consumer share
    one computation (batch catalog queries drain the scope on entry).
    Output rank is LONG: an INT row_number overflows past 2.1 B rows.
    """
    spark = df.sparkSession
    if npart is None:
        npart = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    from pyspark.sql.window import Window

    cols = [F.col(c) for c in order_cols]
    local = (
        df.repartitionByRange(int(npart), *cols)
        .withColumn("__pid", F.spark_partition_id())
        .withColumn(
            "__lr",
            F.row_number().over(Window.partitionBy("__pid").orderBy(*cols)),
        )
    )
    local = scoped_persist(local)
    sizes = {
        r["__pid"]: r["__ct"]
        for r in local.groupBy("__pid").agg(F.count("*").alias("__ct")).collect()
    }
    case = None
    run = 0
    for pid in sorted(sizes):
        case = (F.when if case is None else case.when)(
            F.col("__pid") == pid, F.lit(run)
        )
        run += sizes[pid]
    off = case.otherwise(F.lit(0)) if case is not None else F.lit(0)
    return local.withColumn(
        out_col, (off + F.col("__lr")).cast("long")
    ).drop("__pid", "__lr")


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


# Logical-plan nodes that force a hash/range exchange, so the frame's
# partitioning is governed by spark.sql.shuffle.partitions rather than
# the input splits. Join is deliberately NOT here: a broadcast-hash
# join keeps the probe side's (possibly tiny) scan partitioning, so a
# Join falls through to the input-file estimate instead.
_SHUFFLE_NODES = (
    "Aggregate",
    "Repartition",
    "Sort",
    "Window",
    "Deduplicate",
    "Distinct",
    "Intersect",
    "Except",
)


def _parse_bytes(v: str) -> int:
    """Parse a Spark byte conf value ("134217728", "128m", "1g")."""
    v = v.strip().lower().removesuffix("b")
    for suffix, mult in (("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30), ("t", 1 << 40)):
        if v.endswith(suffix):
            return int(float(v[:-1]) * mult)
    return int(v)


def _estimated_scan_partitions(df: DataFrame) -> int | None:
    """Cheaply estimate the scan-stage task count of a *narrow* plan
    (no shuffle boundary) from its input files, without triggering
    physical planning. Returns None when the plan contains a shuffle
    or the estimate isn't available — the caller then reasons from
    ``spark.sql.shuffle.partitions`` instead.
    """
    try:
        plan = df._jdf.queryExecution().analyzed().toString()
    except Exception:
        return None
    # Walk root-down: the first partitioning-changing node governs the
    # frame's layout. An explicit Repartition/coalesce prints its count
    # ("Repartition 1, false" / "RepartitionByExpression [id], 64") —
    # use it; any other exchange-forcing node means shuffle.partitions
    # (None). A Join breaks out to the file estimate below: whether it
    # exchanged at all is a physical (broadcast?) decision, and the
    # union of both sides' input files bounds its width either way.
    for line in plan.splitlines():
        if any(tok in line for tok in _SHUFFLE_NODES):
            m = re.search(r"Repartition(?:ByExpression)?\b.*?(\d+)(?:, (?:true|false))?\s*$", line)
            if m:
                return int(m.group(1))
            return None
        if "Join" in line:
            break
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    try:
        max_part = _parse_bytes(
            df.sparkSession.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
        )
    except Exception:
        max_part = 128 * 1024 * 1024
    est = 0
    for f in files:
        p = urlparse(f)
        if p.scheme in ("file", ""):
            try:
                sz = os.path.getsize(unquote(p.path))
                est += max(1, math.ceil(sz / max_part))
                continue
            except OSError:
                pass
        # remote / unstatable file: count it as one split (a lower
        # bound; large-scale scans have many files so this still
        # clears the threshold and spread stays a no-op)
        est += 1
    return est


def spread(df: DataFrame, key: str) -> DataFrame:
    """Shuffle ``df`` out to the cluster's default parallelism keyed by
    ``key`` iff its partition count would be lower. The shuffle only
    ever moves under-partitioned (small) inputs, so its cost is bounded
    by the win of parallelizing the downstream CPU-heavy stage.

    The decision is made from the *analyzed* plan (input-file splits
    for narrow plans, ``spark.sql.shuffle.partitions`` once a shuffle
    boundary is present) — never via ``df.rdd``, which would force a
    redundant physical-planning pass on every call.
    """
    spark = df.sparkSession
    n = spark.sparkContext.defaultParallelism
    est = _estimated_scan_partitions(df)
    if est is None:
        # a shuffle governs the layout: its width is shuffle.partitions
        est = int(spark.conf.get("spark.sql.shuffle.partitions", str(n)))
    if est < n:
        return df.repartition(n, key)
    return df


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` bucketed (and optionally sorted) by ``key`` —
    the 100 TB co-location tool: two tables bucketed the same way
    equi-join on the bucket key with NO exchange on either side (and
    no sort, if sorted), turning the join's shuffle cost into a pure
    map-side zip. The write pays one shuffle once; every downstream
    join reuses it. This is Spark's answer to the reference's
    'parallelism = Kafka partition count' co-partitioning contract
    (RT/app/dwd/BaseLogApp.java:29) for data at rest.
    """
    w = df.write.mode(mode).bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)
