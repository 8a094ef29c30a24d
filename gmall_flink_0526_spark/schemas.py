"""Canonical StructTypes for the engine.

These are the Spark equivalents of the reference's record shapes:

- behavior log (schema-on-read fastjson access in
  ``RT/app/dwd/BaseLogApp.java:59,75,109,121-125``),
- the CDC change envelope produced by
  ``RT/app/func/MyDeserialization.java:18-79``,
- the ``table_process`` routing config (``RT/bean/TableProcess.java:6-25``),
- the typed fact beans (``RT/bean/OrderInfo.java``,
  ``RT/bean/OrderDetail.java``, ``RT/bean/PaymentInfo.java``) and the
  wide outputs (``RT/bean/OrderWide.java``, ``RT/bean/PaymentWide.java``).

Money is ``DECIMAL(16,2)`` — the beans use ``BigDecimal``; doubles would
drift against an exact oracle. Timestamps that the reference carries as
``"yyyy-MM-dd HH:mm:ss"`` strings at UTC+8 are modelled as TimestampType
plus explicit conversion helpers (see ``functions/timeutil.py``).
"""

from __future__ import annotations

from pyspark.sql import types as T

MONEY = T.DecimalType(16, 2)

# --- A1: behavior log (ods_base_log) -----------------------------------
DISPLAY = T.StructType(
    [
        T.StructField("display_type", T.StringType()),
        T.StructField("item", T.StringType()),
        T.StructField("item_type", T.StringType()),
        T.StructField("order", T.LongType()),
    ]
)

BEHAVIOR_LOG = T.StructType(
    [
        T.StructField(
            "common",
            T.StructType(
                [
                    T.StructField("mid", T.StringType()),
                    T.StructField("vc", T.StringType()),
                    T.StructField("ch", T.StringType()),
                    T.StructField("ar", T.StringType()),
                    T.StructField("is_new", T.StringType()),
                    T.StructField("uid", T.StringType()),
                ]
            ),
        ),
        T.StructField(
            "page",
            T.StructType(
                [
                    T.StructField("page_id", T.StringType()),
                    T.StructField("last_page_id", T.StringType()),
                    T.StructField("during_time", T.LongType()),
                    T.StructField("item", T.StringType()),
                    T.StructField("item_type", T.StringType()),
                ]
            ),
        ),
        T.StructField(
            "start",
            T.StructType(
                [
                    T.StructField("entry", T.StringType()),
                    T.StructField("open_ad_id", T.LongType()),
                    T.StructField("loading_time", T.LongType()),
                ]
            ),
        ),
        T.StructField("displays", T.ArrayType(DISPLAY)),
        T.StructField("ts", T.LongType()),
    ]
)

# --- A2: CDC change envelope (ods_base_db) -----------------------------
# {database, tableName, before{}, after{}, type in insert|update|delete};
# Debezium "create" is normalized to "insert" upstream
# (RT/app/func/MyDeserialization.java:60-66).
CDC_ENVELOPE = T.StructType(
    [
        T.StructField("database", T.StringType()),
        T.StructField("tableName", T.StringType()),
        T.StructField("before", T.MapType(T.StringType(), T.StringType())),
        T.StructField("after", T.MapType(T.StringType(), T.StringType())),
        T.StructField("type", T.StringType()),
    ]
)

# --- A3: table_process routing config ----------------------------------
TABLE_PROCESS = T.StructType(
    [
        T.StructField("sourceTable", T.StringType(), False),
        T.StructField("operateType", T.StringType(), False),
        T.StructField("sinkType", T.StringType(), False),
        T.StructField("sinkTable", T.StringType(), False),
        T.StructField("sinkColumns", T.StringType()),
        T.StructField("sinkPk", T.StringType()),
        T.StructField("sinkExtend", T.StringType()),
    ]
)

SINK_KAFKA = "kafka"  # fact tables -> topic (RT/common/TableProcess sink types)
SINK_HBASE = "hbase"  # dim tables -> keyed store
SINK_CLICKHOUSE = "clickhouse"

# --- A4: fact beans ----------------------------------------------------
ORDER_INFO = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("province_id", T.LongType()),
        T.StructField("order_status", T.StringType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("total_amount", MONEY),
        T.StructField("activity_reduce_amount", MONEY),
        T.StructField("coupon_reduce_amount", MONEY),
        T.StructField("original_total_amount", MONEY),
        T.StructField("feight_fee", MONEY),
        T.StructField("expire_time", T.StringType()),
        T.StructField("create_time", T.StringType()),
        T.StructField("operate_time", T.StringType()),
        # derived (RT/bean/OrderInfo.java:20-23)
        T.StructField("create_date", T.StringType()),
        T.StructField("create_hour", T.StringType()),
        T.StructField("create_ts", T.LongType()),
    ]
)

ORDER_DETAIL = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("order_id", T.LongType()),
        T.StructField("sku_id", T.LongType()),
        T.StructField("order_price", MONEY),
        T.StructField("sku_num", T.LongType()),
        T.StructField("sku_name", T.StringType()),
        T.StructField("create_time", T.StringType()),
        T.StructField("split_total_amount", MONEY),
        T.StructField("split_activity_amount", MONEY),
        T.StructField("split_coupon_amount", MONEY),
        T.StructField("create_ts", T.LongType()),
    ]
)

PAYMENT_INFO = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("order_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("total_amount", MONEY),
        T.StructField("subject", T.StringType()),
        T.StructField("payment_type", T.StringType()),
        T.StructField("create_time", T.StringType()),
        T.StructField("callback_time", T.StringType()),
    ]
)

# Order/appraise status codes (RT/common/GmallConstant.java:8-67)
ORDER_STATUS_PAID = "1002"
ORDER_STATUS_REFUND = "1005"
APPRAISE_GOOD = "1201"
KEYWORD_SOURCES = ("SEARCH", "CLICK", "CART", "ORDER")

# --- A5: wide beans (DWM outputs) --------------------------------------
# OrderWide = OrderInfo ∪ OrderDetail ∪ 6 dim attribute groups
# (RT/bean/OrderWide.java:17-51); PaymentWide = PaymentInfo ∪ OrderWide
# with the colliding time columns renamed payment_/order_
# (RT/bean/PaymentWide.java:56-87).
ORDER_WIDE = T.StructType(
    [
        T.StructField("detail_id", T.LongType()),
        T.StructField("order_id", T.LongType()),
        T.StructField("sku_id", T.LongType()),
        T.StructField("order_price", MONEY),
        T.StructField("sku_num", T.LongType()),
        T.StructField("sku_name", T.StringType()),
        T.StructField("province_id", T.LongType()),
        T.StructField("order_status", T.StringType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("total_amount", MONEY),
        T.StructField("activity_reduce_amount", MONEY),
        T.StructField("coupon_reduce_amount", MONEY),
        T.StructField("original_total_amount", MONEY),
        T.StructField("feight_fee", MONEY),
        T.StructField("split_total_amount", MONEY),
        T.StructField("split_activity_amount", MONEY),
        T.StructField("split_coupon_amount", MONEY),
        T.StructField("expire_time", T.StringType()),
        T.StructField("create_time", T.StringType()),
        T.StructField("operate_time", T.StringType()),
        T.StructField("create_date", T.StringType()),
        T.StructField("create_hour", T.StringType()),
        # dim enrichment targets (RT/bean/OrderWide.java:38-51)
        T.StructField("province_name", T.StringType()),
        T.StructField("province_area_code", T.StringType()),
        T.StructField("province_iso_code", T.StringType()),
        T.StructField("province_3166_2_code", T.StringType()),
        T.StructField("user_age", T.IntegerType()),
        T.StructField("user_gender", T.StringType()),
        T.StructField("spu_id", T.LongType()),
        T.StructField("tm_id", T.LongType()),
        T.StructField("category3_id", T.LongType()),
        T.StructField("spu_name", T.StringType()),
        T.StructField("tm_name", T.StringType()),
        T.StructField("category3_name", T.StringType()),
    ]
)

PAYMENT_WIDE = T.StructType(
    [T.StructField("payment_id", T.LongType()), T.StructField("subject", T.StringType()),
     T.StructField("payment_type", T.StringType()),
     T.StructField("payment_create_time", T.StringType()),
     T.StructField("callback_time", T.StringType())]
    + [f for f in ORDER_WIDE.fields if f.name not in ("create_time", "operate_time")]
    + [T.StructField("order_create_time", T.StringType()),
       T.StructField("order_operate_time", T.StringType())]
)

# --- A6: DWS stat beans (RT/bean/*Stats.java) --------------------------
def _stats(*fields: tuple[str, T.DataType]) -> T.StructType:
    # every stats bean carries the serialized window bounds + stamp
    base = [T.StructField("stt", T.StringType()), T.StructField("edt", T.StringType())]
    return T.StructType(
        base + [T.StructField(n, t) for n, t in fields] + [T.StructField("ts", T.LongType())]
    )


VISITOR_STATS = _stats(
    ("vc", T.StringType()), ("ch", T.StringType()), ("ar", T.StringType()),
    ("is_new", T.StringType()),
    ("uv_ct", T.LongType()), ("pv_ct", T.LongType()), ("sv_ct", T.LongType()),
    ("uj_ct", T.LongType()), ("dur_sum", T.LongType()),
)

PRODUCT_STATS = _stats(
    ("sku_id", T.LongType()), ("sku_name", T.StringType()), ("sku_price", MONEY),
    ("spu_id", T.LongType()), ("spu_name", T.StringType()),
    ("tm_id", T.LongType()), ("tm_name", T.StringType()),
    ("category3_id", T.LongType()), ("category3_name", T.StringType()),
    ("display_ct", T.LongType()), ("click_ct", T.LongType()),
    ("favor_ct", T.LongType()), ("cart_ct", T.LongType()),
    ("order_sku_num", T.LongType()), ("order_amount", MONEY), ("order_ct", T.LongType()),
    ("payment_amount", MONEY), ("paid_order_ct", T.LongType()),
    ("refund_order_ct", T.LongType()), ("refund_amount", MONEY),
    ("comment_ct", T.LongType()), ("good_comment_ct", T.LongType()),
    # the Set<order_id> accumulators (RT/bean/ProductStats.java:74-84) are
    # intermediate collect_set columns, @TransientSink-dropped before the
    # sink (sources/sinks.write_ads transient_cols)
)

PROVINCE_STATS = _stats(
    ("province_id", T.LongType()), ("province_name", T.StringType()),
    ("area_code", T.StringType()), ("iso_code", T.StringType()),
    ("iso_3166_2", T.StringType()),
    ("order_count", T.LongType()), ("order_amount", MONEY),
)

KEYWORD_STATS = _stats(
    ("keyword", T.StringType()), ("source", T.StringType()), ("ct", T.LongType()),
)
