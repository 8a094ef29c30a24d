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


# ----------------------------------------------------------------------
# J1 — event-time interval join (order ⋈ detail), row-level wide output.
# ----------------------------------------------------------------------


@register(
    "order_wide_join",
    oracle="""
    SELECT o_orderkey, l_linenumber, o_custkey, o_orderdate, l_shipdate,
           o_totalprice, l_extendedprice, l_quantity
    FROM orders JOIN lineitem
      ON l_orderkey = o_orderkey
     AND l_shipdate >= o_orderdate
     AND l_shipdate <= o_orderdate + INTERVAL 30 DAY
    """,
    doc="J1 — interval join: detail.ts within [order.ts, order.ts+30d] "
    "(cf. intervalJoin between(-5s,+5s), RT/app/dwm/OrderWideApp.java:80-89). "
    "Equi-key stays in the join condition so both sides hash-partition on it.",
    tags=("join", "interval"),
)
def order_wide_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "orders", "lineitem")
    from ..operators.joins import interval_join

    joined = interval_join(
        t["orders"],
        t["lineitem"],
        on=F.col("l_orderkey") == F.col("o_orderkey"),
        left_ts=F.col("o_orderdate"),
        right_ts=F.col("l_shipdate"),
        lower="0 DAYS",
        upper="30 DAYS",
    )
    return joined.select(
        "o_orderkey", "l_linenumber", "o_custkey", "o_orderdate", "l_shipdate",
        "o_totalprice", "l_extendedprice", "l_quantity",
    )


@register(
    "payment_wide_join",
    oracle="""
    SELECT strftime(date_trunc('month', l_shipdate), '%Y-%m-%d') AS pay_month,
           COUNT(*) AS pay_ct,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS pay_amount
    FROM lineitem JOIN orders
      ON l_orderkey = o_orderkey
     AND o_orderdate >= l_shipdate - INTERVAL 77 DAY
     AND o_orderdate <= l_shipdate
    GROUP BY 1
    """,
    doc="J2 — asymmetric interval join (payment happens after the order, "
    "within a deadline — cf. between(-15min,+5s), "
    "RT/app/dwm/PaymentWideApp.java:76-85), then monthly payment rollup.",
    tags=("join", "interval"),
)
def payment_wide_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "orders", "lineitem")
    from ..operators.joins import interval_join

    joined = interval_join(
        t["lineitem"],
        t["orders"],
        on=F.col("l_orderkey") == F.col("o_orderkey"),
        left_ts=F.col("l_shipdate"),
        right_ts=F.col("o_orderdate"),
        lower="77 DAYS",
        upper="0 DAYS",
    )
    return (
        joined.groupBy(
            F.date_format(F.date_trunc("month", F.col("l_shipdate")), "yyyy-MM-dd").alias("pay_month")
        )
        .agg(
            F.count("*").alias("pay_ct"),
            exact_sum(F.col("l_extendedprice")).alias("pay_amount"),
        )
    )


# ----------------------------------------------------------------------
# J3 — dimension enrichment chain (broadcast hash joins).
# ----------------------------------------------------------------------


@register(
    "dim_enrichment",
    oracle="""
    SELECT o_orderkey, o_totalprice, c_name, c_mktsegment, n_name, r_name
    FROM orders
    LEFT JOIN customer ON o_custkey = c_custkey
    LEFT JOIN nation   ON c_nationkey = n_nationkey
    LEFT JOIN region   ON n_regionkey = r_regionkey
    """,
    doc="J3 — wide-record dim enrichment: orders -> customer -> nation -> "
    "region as a chain of broadcast hash joins. Replaces the reference's "
    "async Phoenix point-lookups + Redis cache (RT/app/func/AsyncDimFunction"
    ".java:27-67, RT/utils/DimUtil.java:15-50): broadcasting each dim once "
    "per stage beats per-record RPC at any scale.",
    tags=("join", "broadcast", "dim"),
)
def dim_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "orders", "customer", "nation", "region")
    from ..operators.joins import dim_enrich

    wide = dim_enrich(
        t["orders"],
        [
            (t["customer"], F.col("o_custkey") == F.col("c_custkey"),
             [F.col("c_custkey"), F.col("c_name"), F.col("c_mktsegment"), F.col("c_nationkey")]),
            (t["nation"], F.col("c_nationkey") == F.col("n_nationkey"),
             [F.col("n_nationkey"), F.col("n_name"), F.col("n_regionkey")]),
            (t["region"], F.col("n_regionkey") == F.col("r_regionkey"),
             [F.col("r_regionkey"), F.col("r_name")]),
        ],
    )
    return wide.select("o_orderkey", "o_totalprice", "c_name", "c_mktsegment", "n_name", "r_name")


# ----------------------------------------------------------------------
# A3 — province (nation) stats.
# ----------------------------------------------------------------------


@register(
    "province_stats",
    oracle=f"""
    SELECT n_name AS province_name, r_name AS area_name,
           COUNT(*) AS order_count,
           {sql_sum('o_totalprice')} AS order_amount
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY n_name, r_name
    """,
    doc="A3 — ProvinceStats: order count + amount per province "
    "(RT/bean/ProvinceStats.java:16-39), nation playing base_province.",
    tags=("agg", "dim"),
)
def province_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "orders", "customer", "nation", "region")
    return (
        t["orders"]
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("n_name").alias("province_name"), F.col("r_name").alias("area_name"))
        .agg(
            F.count("*").alias("order_count"),
            exact_sum(F.col("o_totalprice")).alias("order_amount"),
        )
    )


# ----------------------------------------------------------------------
# A2 — product stats with exact distinct-order accumulators.
# ----------------------------------------------------------------------


@register(
    "product_stats",
    oracle=f"""
    SELECT p_brand,
           COUNT(DISTINCT l_orderkey) AS order_ct,
           {sql_sum('l_quantity')} AS sku_num,
           {sql_sum('l_extendedprice')} AS order_amount,
           COUNT(*) AS line_ct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
    doc="A2 — ProductStats family (RT/bean/ProductStats.java:21-87): the "
    "Set<order_id> accumulator becomes size(collect_set(...)) — computed "
    "inside the agg, never materialized to the sink (@TransientSink, "
    "RT/utils/ClickHouseUtil.java:42-47). Scale path: approx_count_distinct.",
    tags=("agg", "distinct"),
)
def product_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "lineitem", "part")
    from ..operators.aggregates import distinct_count_exact

    return (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            distinct_count_exact(F.col("l_orderkey")).alias("order_ct"),
            exact_sum(F.col("l_quantity")).alias("sku_num"),
            exact_sum(F.col("l_extendedprice")).alias("order_amount"),
            F.count("*").alias("line_ct"),
        )
    )


# ----------------------------------------------------------------------
# P6 — null-coalescing record merge.
# ----------------------------------------------------------------------


@register(
    "record_merge",
    oracle="""
    WITH a AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 2 = 0 THEN o_totalprice END AS total_amount,
             CASE WHEN o_orderkey % 3 = 0 THEN o_orderstatus END AS order_status
      FROM orders
    ), b AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 2 = 1 THEN o_totalprice END AS total_amount,
             o_orderstatus AS order_status
      FROM orders
    )
    SELECT a.o_orderkey,
           COALESCE(a.total_amount, b.total_amount) AS total_amount,
           COALESCE(a.order_status, b.order_status) AS order_status
    FROM a JOIN b ON a.o_orderkey = b.o_orderkey
    """,
    doc="P6 — OrderWide.mergeOtherOrderWide null-coalescing field union "
    "(RT/bean/OrderWide.java:88-105): two partial views of the same "
    "entity merged field-by-field with coalesce.",
    tags=("transform",),
)
def record_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "orders")
    from ..operators.parse import coalesce_merge

    a = t["orders"].select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 2 == 0, F.col("o_totalprice")).alias("total_amount"),
        F.when(F.col("o_orderkey") % 3 == 0, F.col("o_orderstatus")).alias("order_status"),
    )
    b = t["orders"].select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 2 == 1, F.col("o_totalprice")).alias("total_amount"),
        F.col("o_orderstatus").alias("order_status"),
    )
    return coalesce_merge(a, b, on=["o_orderkey"])


# ----------------------------------------------------------------------
# P3 / P7 — scalar transforms.
# ----------------------------------------------------------------------


@register(
    "date_derive",
    oracle="""
    SELECT strftime(o_orderdate, '%Y-%m-%d') AS create_date,
           strftime(o_orderdate, '%H') AS create_hour,
           COUNT(*) AS order_ct
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
    GROUP BY 1, 2
    """,
    doc="P3 — derive date/hour columns from a timestamp "
    "(RT/app/dwm/OrderWideApp.java:48-54, RT/utils/DateTimeUtil.java).",
    tags=("transform", "time"),
)
def date_derive(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "orders")
    from ..operators.parse import derive_time_columns

    df = derive_time_columns(
        t["orders"].filter(F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")),
        "o_orderdate",
    )
    return df.groupBy("create_date", "create_hour").agg(F.count("*").alias("order_ct"))


@register(
    "snake_to_camel",
    oracle="""
    SELECT c_custkey AS cCustkey, c_name AS cName, c_nationkey AS cNationkey,
           c_acctbal AS cAcctbal, c_mktsegment AS cMktsegment
    FROM customer
    """,
    doc="P7 — snake_case -> camelCase projection rename "
    "(Guava CaseFormat in RT/utils/JdbcUtil.java:46-48).",
    tags=("transform",),
)
def snake_to_camel_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "customer")
    from ..operators.parse import snake_to_camel

    return snake_to_camel(t["customer"])


# ----------------------------------------------------------------------
# Free-with-Spark relational surface: top-k, rollup, set ops, pivot.
# ----------------------------------------------------------------------


@register(
    "shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           {sql_sum('l_extendedprice * (1 - l_discount)')} AS revenue,
           o_orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 shape — join + agg + deterministic top-k "
    "(ADS-layer query surface; not in the reference but free in Spark).",
    tags=("agg", "topk"),
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "customer", "orders", "lineitem")
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    return (
        t["customer"].filter(F.col("c_mktsegment") == "BUILDING")
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < cutoff)
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > cutoff)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "sales_rollup",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS line_ct,
           {sql_sum('l_quantity')} AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="Hierarchical subtotals via ROLLUP (free Spark SQL surface).",
    tags=("agg", "rollup"),
)
def sales_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "lineitem")
    return (
        t["lineitem"]
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("line_ct"), exact_sum(F.col("l_quantity")).alias("sum_qty"))
    )


@register(
    "order_status_overlap",
    oracle="""
    SELECT COUNT(*) AS both_ct FROM (
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      INTERSECT
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    )
    """,
    doc="Set ops (intersect) — not present in the reference, free in Spark.",
    tags=("setops",),
)
def order_status_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "orders")
    o = t["orders"].filter(F.col("o_orderstatus") == "O").select("o_custkey")
    f = t["orders"].filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return o.intersect(f).agg(F.count("*").alias("both_ct"))


@register(
    "returnflag_pivot",
    oracle=f"""
    SELECT l_returnflag,
           {sql_sum("CASE WHEN l_linestatus = 'O' THEN l_quantity ELSE 0 END")} AS qty_open,
           {sql_sum("CASE WHEN l_linestatus = 'F' THEN l_quantity ELSE 0 END")} AS qty_filled
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Pivot by conditional aggregation (portable across engines).",
    tags=("agg", "pivot"),
)
def returnflag_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity")
    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .agg(
            exact_sum(F.when(F.col("l_linestatus") == "O", qty).otherwise(F.lit(0))).alias("qty_open"),
            exact_sum(F.when(F.col("l_linestatus") == "F", qty).otherwise(F.lit(0))).alias("qty_filled"),
        )
    )


@register(
    "top_parts_per_brand",
    oracle=f"""
    WITH part_rev AS (
      SELECT p_brand, p_partkey,
             {sql_sum('l_extendedprice')} AS revenue
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_brand, p_partkey
    ), ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY revenue DESC, p_partkey) AS rn
      FROM part_rev
    )
    SELECT p_brand, p_partkey, revenue, rn FROM ranked WHERE rn <= 3
    """,
    doc="Top-K per group via ranking window function (ADS surface).",
    tags=("window", "topk"),
)
def top_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "lineitem", "part")
    rev = (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_partkey")
        .agg(exact_sum(F.col("l_extendedprice")).alias("revenue"))
    )
    w = W.partitionBy("p_brand").orderBy(F.col("revenue").desc(), F.col("p_partkey"))
    return rev.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 3)


@register(
    "sql_entry",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_ct
    FROM orders
    WHERE o_orderstatus <> 'F'
    GROUP BY o_orderpriority
    """,
    doc="S4 — the SQL-string entry point (FlinkCDC_SQL.java:16-29: DDL "
    "string registers the source, then a SELECT string runs against "
    "it). Spark-first this is literally spark.sql: CREATE TEMPORARY "
    "VIEW ... USING parquet, then the query text — same Catalyst plan "
    "as the DataFrame dialect.",
    tags=("sql", "entry"),
)
def sql_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.sql(
        f"CREATE OR REPLACE TEMPORARY VIEW ods_order_info "
        f"USING parquet OPTIONS (path '{sf_dir}/orders.parquet')"
    )
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS order_ct
        FROM ods_order_info
        WHERE o_orderstatus <> 'F'
        GROUP BY o_orderpriority
        """
    )


@register(
    "product_stats_approx",
    oracle=None,  # sketch values are engine-specific: rows-only by design
    doc="A2 scale path, PRODUCTION form — the same ProductStats "
    "aggregate with Spark's own approx_count_distinct (HLL++, ~2% "
    "relative error) in place of the exact collect_set accumulator: "
    "constant memory per group at any cardinality, map-side "
    "partial-aggregable. Kept as the inline-HLL smoke for the engine "
    "path a cluster would actually run; rows-only by design because "
    "HLL++ register layouts are engine-private. The CERTIFIED twin is "
    "product_stats_hll (explicit registers, bit-identical oracle), "
    "and the exact twin is product_stats.",
    tags=("agg", "distinct", "approx"),
)
def product_stats_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "lineitem", "part")
    return (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.approx_count_distinct("l_orderkey").alias("order_ct_approx"),
            F.count("*").alias("line_ct"),
        )
    )


def _sql_product_stats_hll() -> str:
    """The per-brand HLL distinct-order audit as DuckDB SQL — the
    grouped-dimension instance of ``_sql_hll_audit`` (plans/logs.py),
    over the lineitem⋈part join instead of the events stream. Same
    bit-exact derivation everywhere: bucket and rho from disjoint md5
    hex slices (rho = pure string arithmetic), harmonic sum as an
    exact BIGINT of 2^(33-r) contributions, estimate = ONE shared
    double constant divided by that integer."""
    from ..operators.aggregates import HLL_ALPHA_NUM, HLL_M
    from .text import sql_hex_val

    stripped = "regexp_replace(substr(hx, 9, 8), '^0+', '')"
    return f"""
    WITH base AS MATERIALIZED (
      SELECT p.p_brand, l.l_orderkey
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    h AS (
      SELECT p_brand, md5(CAST(l_orderkey AS VARCHAR)) AS hx
      FROM base WHERE l_orderkey IS NOT NULL
    ),
    rr AS (
      SELECT p_brand,
             ({sql_hex_val('hx', 8)}) % {HLL_M} AS j,
             CASE WHEN {stripped} = '' THEN 33
                  ELSE 4 * (8 - length({stripped}))
                       + CASE WHEN substr({stripped}, 1, 1)
                                   IN ('8','9','a','b','c','d','e','f') THEN 0
                              WHEN substr({stripped}, 1, 1)
                                   IN ('4','5','6','7') THEN 1
                              WHEN substr({stripped}, 1, 1)
                                   IN ('2','3') THEN 2
                              ELSE 3 END + 1
             END AS r
      FROM h
    ),
    regs AS (SELECT p_brand, j, MAX(r) AS r FROM rr GROUP BY 1, 2),
    agg AS (
      SELECT p_brand,
             CAST({HLL_M} - COUNT(*) AS BIGINT) AS zeros,
             SUM(CAST(1 AS BIGINT) << (33 - r))
               + CAST({HLL_M} - COUNT(*) AS BIGINT)
                 * (CAST(1 AS BIGINT) << 33) AS s
      FROM regs GROUP BY 1
    ),
    ex AS (SELECT p_brand,
                  COUNT(DISTINCT l_orderkey) AS n_exact,
                  CAST(COUNT(*) AS BIGINT) AS line_ct
           FROM base GROUP BY 1)
    SELECT e.p_brand, e.line_ct, e.n_exact, a.zeros,
           {HLL_ALPHA_NUM!r} / CAST(a.s AS DOUBLE) AS hll_est,
           ({HLL_ALPHA_NUM!r} / CAST(a.s AS DOUBLE)
              - CAST(e.n_exact AS DOUBLE))
             / CAST(e.n_exact AS DOUBLE) * 100 AS err_pct
    FROM ex e JOIN agg a USING (p_brand)
    """


@register(
    "product_stats_hll",
    oracle=_sql_product_stats_hll(),
    doc="A2 scale path, CERTIFIED form (r12 VERDICT #1 — the catalog's "
    "last no-oracle row closed): the per-brand distinct-order count "
    "through the explicit-register HLL the audit family already "
    "proved cross-engine (operators/aggregates.hll_registers / "
    "hll_estimate — 32 registers per brand, register = MAX rho of an "
    "md5 slice, mergeable by plain MAX across shards/epochs). Unlike "
    "product_stats_approx (Spark's engine-private HLL++, rows-only), "
    "every derivation here is string/integer arithmetic plus ONE "
    "final IEEE division, so DuckDB re-derives the per-brand estimate "
    "bit-for-bit; err_pct is the sketch error actually paid against "
    "the exact distinct (raw estimator only — the per-brand order "
    "cardinality keeps the linear-counting branch's ln() out of the "
    "certified surface). Scale: ONE grouped max builds the register "
    "grid map-side (25 brands x 32 registers however many lineitems), "
    "the exact side is the certification cost, not the production "
    "path.",
    tags=("agg", "distinct", "sketch", "approx"),
)
def product_stats_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.aggregates import hll_estimate, hll_registers

    t = load_tables(spark, sf_dir, "lineitem", "part")
    base = (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .select("p_brand", "l_orderkey")
    )
    regs = hll_registers(base, "p_brand", "l_orderkey")
    est = hll_estimate(regs, "p_brand")
    ex = base.groupBy("p_brand").agg(
        F.countDistinct("l_orderkey").alias("n_exact"),
        F.count("*").alias("line_ct"),
    )
    n_dbl = F.col("n_exact").cast("double")
    return ex.join(est, "p_brand").select(
        "p_brand",
        "line_ct",
        "n_exact",
        "zeros",
        "hll_est",
        ((F.col("hll_est") - n_dbl) / n_dbl * 100).alias("err_pct"),
    )


@register(
    "order_status_stats",
    oracle=f"""
    SELECT o_orderpriority,
           COUNT(*) AS order_ct,
           COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS paid_order_ct,
           COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS pending_order_ct,
           {sql_sum("CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END")} AS payment_amount,
           {sql_sum("CASE WHEN o_orderstatus = 'P' THEN o_totalprice ELSE 0 END")} AS pending_amount
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="A2's status-coded measure family (ProductStats paid/refund "
    "counts keyed on order-status constants, RT/bean/ProductStats.java:"
    "41-66 + GmallConstant status codes): conditional counts and sums "
    "per status in one grouped pass — each measure map-side partial-"
    "aggregates, one shuffle total.",
    tags=("agg", "status"),
)
def order_status_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "orders")
    price = F.col("o_totalprice")
    is_f = F.col("o_orderstatus") == "F"
    is_p = F.col("o_orderstatus") == "P"
    return (
        t["orders"]
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("order_ct"),
            F.count(F.when(is_f, 1)).alias("paid_order_ct"),
            F.count(F.when(is_p, 1)).alias("pending_order_ct"),
            exact_sum(F.when(is_f, price).otherwise(F.lit(0.0))).alias("payment_amount"),
            exact_sum(F.when(is_p, price).otherwise(F.lit(0.0))).alias("pending_amount"),
        )
    )


@register(
    "top_revenue_orders",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    doc="Global top-k (ADS sort/limit surface): orderBy + limit compiles "
    "to TakeOrderedAndProject — per-partition top-k then a k-row merge "
    "on the driver, never a full sort/shuffle of the table.",
    tags=("sort", "topk"),
)
def top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "orders")
    return (
        t["orders"]
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


@register(
    "sales_cube",
    oracle=f"""
    SELECT o_orderpriority, o_orderstatus,
           COUNT(*) AS order_ct,
           {sql_sum('o_totalprice')} AS amount
    FROM orders
    GROUP BY CUBE (o_orderpriority, o_orderstatus)
    """,
    doc="CUBE over (priority, status): all four grouping sets in one "
    "pass — Spark expands the cube map-side, so the shuffle carries one "
    "partial row per (set x group), not a re-scan per set.",
    tags=("agg", "cube"),
)
def sales_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "orders")
    return (
        t["orders"]
        .cube("o_orderpriority", "o_orderstatus")
        .agg(
            F.count("*").alias("order_ct"),
            exact_sum(F.col("o_totalprice")).alias("amount"),
        )
    )


@register(
    "local_supplier_volume",
    oracle=f"""
    SELECT n_name,
           {sql_sum('l_extendedprice * (1 - l_discount)')} AS revenue,
           COUNT(*) AS line_ct
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    """,
    doc="TPC-H Q5 shape — the 6-table join chain (region -> nation -> "
    "customer/supplier -> orders -> lineitem) with the correlated "
    "same-nation predicate between customer and supplier. The widest "
    "join surface in the catalog: region/nation/supplier ride "
    "broadcasts by stats, the two fact tables join on their natural "
    "keys, and the date range prunes orders at the scan. Revenue "
    "accumulates in decimal (functions/exact) so both engines emit "
    "the identical doubles.",
    tags=("agg", "join", "tpch"),
)
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(
        spark, sf_dir, "region", "nation", "customer", "supplier", "orders", "lineitem"
    )
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1997-01-01 00:00:00").cast("timestamp")
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            t["supplier"],
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(t["nation"], F.col("s_nationkey") == F.col("n_nationkey"))
        .join(t["region"], F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(
            exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count("*").alias("line_ct"),
        )
    )
