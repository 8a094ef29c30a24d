"""ADS-layer sink (K5) — the generic "write the stats bean, minus
accumulator columns" sink.

The reference writes DWS beans to ClickHouse over JDBC with a
reflection-built positional INSERT, skipping fields annotated
``@TransientSink`` (RT/utils/ClickHouseUtil.java:21-68,
RT/bean/TransientSink.java). Spark-first: drop the transient columns
and hand the frame to the writer — parquet ads tables by default
(this container has no DB), ``format="jdbc"`` in production; Spark's
JDBC writer already batches per partition (the reference hand-rolls
batch-of-5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.parse import drop_transient


def write_ads(
    df: DataFrame,
    target: str,
    *,
    transient_cols: list[str] | None = None,
    format: str = "parquet",
    mode: str = "append",
    partition_by: list[str] | None = None,
    options: dict[str, str] | None = None,
) -> None:
    """K5 — drop accumulator columns, write to the ads store.

    ``target`` is a path for file formats, a table name for jdbc
    (options must then carry url/driver credentials). ``partition_by``
    (file formats only) lays the table out for partition pruning —
    ads tables are read by dashboards filtering on date/hour, so
    partitioning by those keys turns each read into a directory prune.
    """
    out = drop_transient(df, transient_cols or [])
    writer = out.write.mode(mode)
    for k, v in (options or {}).items():
        writer = writer.option(k, v)
    if format == "jdbc":
        writer.option("dbtable", target).format("jdbc").save()
    else:
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.format(format).save(target)
