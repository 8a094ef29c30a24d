"""Routing / stream-splitting operators (SURVEY §2.5).

R1 — n-way split of one stream (reference side outputs,
RT/app/dwd/BaseLogApp.java:99-151).
R2/R3 — dynamic table routing against a broadcast config table
(RT/app/dwd/BaseDbApp.java:63-75, RT/app/func/TableProcessFunction.java).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def split_stream(df: DataFrame, branches: dict[str, Column]) -> dict[str, DataFrame]:
    """R1 — one logical pass, N filtered children.

    Each branch is a predicate over the same parent; Catalyst shares the
    scan/parse subtree. In a streaming ``foreachBatch`` the caller
    ``persist()``s the batch first to keep strict one-pass semantics
    (see streaming/pipelines.py), mirroring the reference's single
    ProcessFunction with side outputs.
    """
    return {name: df.filter(pred) for name, pred in branches.items()}


def route_by_config(
    data: DataFrame,
    config: DataFrame,
    data_keys: tuple[str, str] = ("tableName", "type"),
    config_keys: tuple[str, str] = ("sourceTable", "operateType"),
) -> DataFrame:
    """R2 — broadcast-config dispatch.

    Joins the change stream with the (small, mutable) ``table_process``
    config on (table, operation). Inner join drops unknown keys — the
    reference logs-and-drops them (TableProcessFunction.java:159-161).
    The config side is explicitly broadcast; re-reading it per
    micro-batch (R3) gives the same eventual consistency as Flink's
    broadcast MapState.

    Output = data columns + sinkType/sinkTable/sinkColumns, ready to be
    fanned out by ``sinkType`` (kafka fact branch vs dim-store branch).
    """
    cond = (F.col(data_keys[0]) == F.col(config_keys[0])) & (
        F.col(data_keys[1]) == F.col(config_keys[1])
    )
    routed = data.join(F.broadcast(config), cond, "inner")
    return routed.drop(*config_keys)


def split_by_sink_type(routed: DataFrame) -> dict[str, DataFrame]:
    """The kafka/hbase fan-out after R2 (BaseDbApp.java:70-75)."""
    return split_stream(
        routed,
        {
            "kafka": F.col("sinkType") == "kafka",
            "dim": F.col("sinkType") == "hbase",
        },
    )
