"""CDC queries — the change-data-capture surface (SURVEY §2.1 S2/S3,
§2.4 F1, §2.5 R2) exercised end-to-end as batch twins.

The canonical change envelope ``{database, tableName, before, after,
type}`` is the engine's CDC contract (the shape the reference's custom
Debezium deserializer emits, RT/app/func/MyDeserialization.java:27-84).
Here a deterministic insert/update/delete mix is derived from the
``orders`` table (key % 10: 0 -> delete, 1/2 -> update, else insert),
serialized to JSON, and re-parsed — so the oracle can reproduce every
derived value with plain arithmetic while the Spark side exercises the
real to_json/from_json envelope round-trip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources import cdc as C
from ..session import load_tables
from .catalog import register

# DuckDB twin of the fixture's op mix
SQL_OP = (
    "CASE o_orderkey % 10 WHEN 0 THEN 'delete' "
    "WHEN 1 THEN 'update' WHEN 2 THEN 'update' ELSE 'insert' END"
)


def _order_envelopes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.partitioning import spread

    # map-building + JSON round-trips are CPU-heavy per row: don't let a
    # single-file scan pin them to one task
    orders = spread(load_tables(spark, sf_dir, "orders")["orders"], "o_orderkey")
    return C.envelope_from_table(orders, "o_orderkey", "gmall", "order_info")


@register(
    "cdc_envelope_parse",
    oracle=f"""
    SELECT {SQL_OP} AS type,
           COUNT(*) AS ct,
           CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
    FROM orders
    GROUP BY 1
    """,
    doc="S3 — CDC envelope JSON round-trip: change records serialized "
    "with to_json, re-parsed with from_json into the canonical envelope "
    "struct (RT/app/func/MyDeserialization.java:27-84; Debezium "
    "create/read -> insert normalization), keys recovered from the "
    "before/after maps. A parse defect breaks ct or key_sum.",
    tags=("cdc",),
)
def cdc_envelope_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    env = _order_envelopes(spark, sf_dir)
    raw = env.select(F.to_json(F.struct("database", "tableName", "before", "after", "type")).alias("value"))
    parsed = C.parse_envelope(raw)
    key = F.coalesce(
        F.element_at("after", "o_orderkey"), F.element_at("before", "o_orderkey")
    ).cast("long")
    return parsed.groupBy("type").agg(
        F.count("*").alias("ct"), F.sum(key).alias("key_sum")
    )


@register(
    "cdc_delete_filter",
    oracle=f"""
    SELECT {SQL_OP} AS type, COUNT(*) AS ct
    FROM orders
    WHERE {SQL_OP} != 'delete'
    GROUP BY 1
    """,
    doc="F1 — drop delete-type change records before fan-out "
    "(RT/app/dwd/BaseDbApp.java:45-50); the filter sits directly on the "
    "envelope scan so Catalyst pushes it below everything downstream.",
    tags=("cdc", "filter"),
)
def cdc_delete_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.filters import filter_deletes

    env = _order_envelopes(spark, sf_dir)
    return filter_deletes(env).groupBy("type").agg(F.count("*").alias("ct"))


@register(
    "cdc_materialize",
    oracle=f"""
    SELECT o_orderkey, o_totalprice * 2 AS o_totalprice
    FROM orders WHERE o_orderkey % 10 IN (1, 2)
    UNION ALL
    SELECT o_orderkey, o_totalprice
    FROM orders WHERE o_orderkey % 10 NOT IN (0, 1, 2)
    """,
    doc="S2 initial() + K3 — snapshot-plus-change-stream materialization "
    "(RT/app/dwd/BaseDbApp.java:56): the table snapshot as seq-0 insert "
    "envelopes, a change tail (updates double o_totalprice, deletes "
    "remove the key) at seq 1, applied by last-writer-wins per key — "
    "the batch twin of the dim store's idempotent per-batch MERGE.",
    tags=("cdc", "merge"),
)
def cdc_materialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir, "orders")["orders"]
    snapshot = C.snapshot_as_inserts(orders, "gmall", "order_info").withColumn(
        "_seq", F.lit(0)
    )
    changed = orders.withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") % 10 == 0, F.col("o_totalprice")).otherwise(
            F.col("o_totalprice") * 2
        ),
    )
    changes = C.envelope_from_table(changed, "o_orderkey", "gmall", "order_info").filter(
        F.col("type") != "insert"
    ).withColumn("_seq", F.lit(1))
    key = F.coalesce(
        F.element_at("after", "o_orderkey"), F.element_at("before", "o_orderkey")
    ).cast("long")
    env = snapshot.unionByName(changes).withColumn("_key", key)
    state = C.apply_changes(env, "_key", "_seq")
    return state.select(
        F.col("_key").alias("o_orderkey"),
        F.element_at("after", "o_totalprice").cast("double").alias("o_totalprice"),
    )


@register(
    "scd2_order_history",
    oracle="""
    WITH chg AS (
      SELECT o_orderkey, o_totalprice, 0 AS seq, 'insert' AS op FROM orders
      UNION ALL
      SELECT o_orderkey, o_totalprice * 2, 1, 'update'
      FROM orders WHERE o_orderkey % 10 IN (1, 2)
      UNION ALL
      SELECT o_orderkey, NULL, 1, 'delete'
      FROM orders WHERE o_orderkey % 10 = 0
    ),
    h AS (
      SELECT o_orderkey, o_totalprice, op, seq AS valid_from,
             LEAD(seq) OVER (PARTITION BY o_orderkey ORDER BY seq) AS valid_to
      FROM chg
    )
    SELECT o_orderkey, o_totalprice, valid_from, valid_to,
           valid_to IS NULL AS is_current
    FROM h WHERE op != 'delete'
    """,
    doc="SCD Type-2 dimension history from the CDC stream "
    "(sources/cdc.scd2_from_changes): every surviving version becomes "
    "a validity-interval row (valid_from, valid_to, is_current); a "
    "delete emits nothing but closes the prior version's interval — "
    "the Kimball history table whose latest-row projection is the dim "
    "store's Type-1 MERGE (K3), and whose point-in-time lookup is "
    "asof_join on valid_from. Fixture: snapshot at seq 0, the "
    "deterministic update/delete mix at seq 1. One LEAD window per "
    "key — single exchange + per-key sort, linear in change volume.",
    tags=("cdc", "scd2", "window"),
)
def scd2_order_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir, "orders")["orders"]
    snapshot = C.snapshot_as_inserts(orders, "gmall", "order_info").withColumn(
        "_seq", F.lit(0)
    )
    changed = orders.withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") % 10 == 0, F.col("o_totalprice")).otherwise(
            F.col("o_totalprice") * 2
        ),
    )
    changes = C.envelope_from_table(changed, "o_orderkey", "gmall", "order_info").filter(
        F.col("type") != "insert"
    ).withColumn("_seq", F.lit(1))
    key = F.coalesce(
        F.element_at("after", "o_orderkey"), F.element_at("before", "o_orderkey")
    ).cast("long")
    env = snapshot.unionByName(changes).withColumn("_key", key)
    hist = C.scd2_from_changes(env, "_key", "_seq")
    return hist.select(
        F.col("_key").alias("o_orderkey"),
        F.element_at("after", "o_totalprice").cast("double").alias("o_totalprice"),
        "valid_from",
        "valid_to",
        "is_current",
    )


# Point-in-time dim fixture: the customer dim's one synthetic change
# instant, placed mid-range of o_orderdate (1995..2001) so both
# versions — and the post-delete window — carry real fact volume.
PIT_T0 = "1992-01-01 00:00:00"
PIT_T1 = "1998-01-01 00:00:00"


def sql_dim_enrichment_asof() -> str:
    """The point-in-time enrichment audit as DuckDB SQL — shared
    verbatim by `dim_enrichment_asof` (SCD2 history + asof_join) and
    the streaming replay `dim_enrichment_asof_stream` (CDC version/
    tombstone events through temporal_enrich): the two plans are the
    batch and streaming faces of the same temporal-table join, so one
    oracle certifies both."""
    return f"""
    WITH chg AS (
      SELECT c_custkey AS custkey, c_acctbal,
             TIMESTAMP '{PIT_T0}' AS vf, 'insert' AS op
      FROM customer
      UNION ALL
      SELECT c_custkey, c_acctbal * 2, TIMESTAMP '{PIT_T1}', 'update'
      FROM customer WHERE c_custkey % 10 IN (1, 2)
      UNION ALL
      SELECT c_custkey, NULL, TIMESTAMP '{PIT_T1}', 'delete'
      FROM customer WHERE c_custkey % 10 = 0
    ),
    h0 AS (
      SELECT custkey, c_acctbal, op, vf AS valid_from,
             LEAD(vf) OVER (PARTITION BY custkey ORDER BY vf) AS valid_to
      FROM chg
    ),
    h AS (SELECT * FROM h0 WHERE op != 'delete'),
    j AS (
      SELECT o.o_orderkey, o.o_custkey AS custkey, o.o_orderdate AS order_ts,
             h.c_acctbal, h.valid_from,
             (h.custkey IS NOT NULL
              AND (h.valid_to IS NULL OR o.o_orderdate < h.valid_to))
               AS version_live
      FROM orders o ASOF LEFT JOIN h
        ON o.o_custkey = h.custkey AND o.o_orderdate >= h.valid_from
    )
    SELECT o_orderkey, custkey, order_ts,
           CASE WHEN version_live THEN c_acctbal END AS acctbal_asof,
           CASE WHEN version_live THEN valid_from END AS version_from,
           version_live
    FROM j
    """


@register(
    "dim_enrichment_asof",
    oracle=sql_dim_enrichment_asof(),
    doc="Point-in-time dimension enrichment — the Flink temporal-TABLE "
    "join the reference's dim layer implies but never ships "
    "(RT/utils/DimUtil.java:15-50 always reads the LATEST version; the "
    "historically-correct variant is the standard warehouse ask): each "
    "order fact picks up the customer-dim VERSION that was valid at "
    "its own event time, composed from the two halves the engine "
    "already certifies — scd2_from_changes builds the validity-interval "
    "history from the CDC envelope stream, asof_join matches each fact "
    "to the latest version with valid_from <= o_orderdate. A version "
    "closed with no successor (the key was DELETED before the fact) "
    "yields NULL enrichment columns and version_live = false — "
    "matching a closed interval is the as-of contract; the PIT guard "
    "NULLs both the value and the version id so 'enriched by' is "
    "never attributed to a dead version (and so the streaming twin's "
    "CDC tombstone carry reproduces the row exactly). Shape at "
    "100 TB: history build is "
    "one LEAD window over the change stream (linear); the enrichment "
    "is asof_join's sorted-union fill — ONE hash exchange on custkey + "
    "per-key sort, state one carried version per key, never a "
    "range-predicate join fanning a hot customer out facts x versions. "
    "Oracle: DuckDB's native ASOF LEFT JOIN over the same SCD2 CTE.",
    tags=("cdc", "scd2", "join", "asof", "dim"),
)
def dim_enrichment_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.joins import asof_join

    t = load_tables(spark, sf_dir, "orders", "customer")
    cust = t["customer"]
    snapshot = C.snapshot_as_inserts(cust, "gmall", "user_info").withColumn(
        "_seq", F.lit(PIT_T0).cast("timestamp")
    )
    changed = cust.withColumn(
        "c_acctbal",
        F.when(F.col("c_custkey") % 10 == 0, F.col("c_acctbal")).otherwise(
            F.col("c_acctbal") * 2
        ),
    )
    changes = C.envelope_from_table(changed, "c_custkey", "gmall", "user_info").filter(
        F.col("type") != "insert"
    ).withColumn("_seq", F.lit(PIT_T1).cast("timestamp"))
    key = F.coalesce(
        F.element_at("after", "c_custkey"), F.element_at("before", "c_custkey")
    ).cast("long")
    env = snapshot.unionByName(changes).withColumn("_key", key)
    hist = C.scd2_from_changes(env, "_key", "_seq")
    dim = hist.select(
        F.col("_key").alias("custkey"),
        F.col("valid_from").alias("ts"),
        F.element_at("after", "c_acctbal").cast("double").alias("_bal"),
        F.col("valid_from").alias("version_from"),
        "valid_to",
    )
    facts = t["orders"].select(
        "o_orderkey",
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderdate").alias("ts"),
    )
    j = asof_join(facts, dim, on=["custkey"], ts_col="ts", how="left")
    live = F.col("version_from").isNotNull() & (
        F.col("valid_to").isNull() | (F.col("ts") < F.col("valid_to"))
    )
    return j.select(
        "o_orderkey",
        "custkey",
        F.col("ts").alias("order_ts"),
        F.when(live, F.col("_bal")).alias("acctbal_asof"),
        F.when(live, F.col("version_from")).alias("version_from"),
        live.alias("version_live"),
    )


# -- U3: generic JDBC -> typed rows (real embedded round-trip) ----------

_JDBC_DIRS: dict[str, str] = {}


def _derby_url(sf_dir: str) -> str:
    """One embedded Derby database per (session, sf_dir), cleaned up at
    exit — the returned DataFrame is lazy, so the store must outlive
    the query function."""
    import atexit
    import shutil
    import tempfile

    root = _JDBC_DIRS.get(sf_dir)
    if root is None:
        root = tempfile.mkdtemp(prefix="gmall_derby_")
        _JDBC_DIRS[sf_dir] = root
        atexit.register(shutil.rmtree, root, ignore_errors=True)
    return f"jdbc:derby:{root}/db;create=true"


@register(
    "jdbc_round_trip",
    oracle="""
    SELECT n_nationkey AS nNationkey, n_name AS nName, n_regionkey AS nRegionkey
    FROM nation
    """,
    doc="U3 — generic JDBC source -> typed camelCase rows "
    "(RT/utils/JdbcUtil.java:20-65, Guava CaseFormat at :46-48): a real "
    "JDBC round-trip through the embedded Derby driver shipped with "
    "Spark (write nation, spark.read.jdbc it back, snake->camel "
    "rename). On a cluster the url/driver swap for MySQL/Phoenix; the "
    "read path (partitioned JDBC scan -> typed rows) is identical.",
    tags=("jdbc", "source"),
)
def jdbc_round_trip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.parse import snake_to_camel

    nation = load_tables(spark, sf_dir, "nation")["nation"]
    url = _derby_url(sf_dir)
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    nation.write.jdbc(url, "nation_t", mode="overwrite", properties=props)
    back = spark.read.jdbc(url, "nation_t", properties=props)
    return snake_to_camel(back)
