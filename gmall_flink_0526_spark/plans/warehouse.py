"""Relational / warehouse-layer queries (SURVEY §2.3-§2.8).

These are the batch twins of the reference's DWM/DWS computations,
mapped onto the driver's TPC-H-ish testdata per FIXTURES.md §B:
``orders`` plays ``order_info``, ``lineitem`` plays ``order_detail``,
``customer``/``nation``/``region``/``part``/``supplier`` play the dim
tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..functions.exact import exact_avg, exact_sum, sql_avg, sql_sum
from ..session import load_tables
from .catalog import register

# ----------------------------------------------------------------------
# Flagship: pricing summary (TPC-H Q1 shape) — the A2 "product stats"
# aggregation family (RT/bean/ProductStats.java:21-87): multi-measure
# grouped aggregate with exact money math.
# ----------------------------------------------------------------------


@register(
    "pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_sum('l_quantity')}                                   AS sum_qty,
           {sql_sum('l_extendedprice')}                              AS sum_base_price,
           {sql_sum('l_extendedprice * (1 - l_discount)')}           AS sum_disc_price,
           {sql_sum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {sql_avg('l_quantity')}                                   AS avg_qty,
           {sql_avg('l_extendedprice')}                              AS avg_price,
           {sql_avg('l_discount')}                                   AS avg_disc,
           COUNT(*)                                                  AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="Pricing summary over lineitem — A2-family grouped aggregate "
    "(cf. RT/bean/ProductStats.java:21-87). Filter pushes to the scan; "
    "partial (map-side) aggregation before the single shuffle.",
    tags=("agg", "flagship"),
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            exact_sum(F.col("l_quantity")).alias("sum_qty"),
            exact_sum(F.col("l_extendedprice")).alias("sum_base_price"),
            exact_sum(disc_price).alias("sum_disc_price"),
            exact_sum(charge).alias("sum_charge"),
            exact_avg(F.col("l_quantity")).alias("avg_qty"),
            exact_avg(F.col("l_extendedprice")).alias("avg_price"),
            exact_avg(F.col("l_discount")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
