"""CDC change-record source (S2/S3/S4).

Spark has no native MySQL-binlog source, so the engine's CDC contract
is the *canonical change envelope* of §1.1 — the exact JSON shape the
reference's custom Debezium deserializer produces
(RT/app/func/MyDeserialization.java:27-84):

    {database, tableName, before{}, after{}, type}

with Debezium's ``create``/``read`` normalized to ``insert``. Anything
that can emit that envelope (Kafka topic, file channel, JDBC snapshot)
is a CDC source. ``initial()`` startup (snapshot-then-stream,
RT/app/dwd/BaseDbApp.java:56) maps to: batch-read the table as
``insert`` envelopes, then tail the change channel.

For tests/fixtures, :func:`envelope_from_table` derives a
deterministic insert/update/delete mix from any keyed testdata table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F, types as T

from ..schemas import CDC_ENVELOPE


def normalize_op(op: Column) -> Column:
    """Debezium op -> envelope type (create/read -> insert), the
    when/otherwise form of MyDeserialization.java:60-66."""
    return (
        F.when(op.isin("create", "read", "c", "r"), "insert")
        .when(op.isin("update", "u"), "update")
        .when(op.isin("delete", "d"), "delete")
        .otherwise(op)
    )


def parse_envelope(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """S3 — JSON change-record string -> typed envelope columns."""
    return (
        raw.withColumn("_env", F.from_json(F.col(value_col), CDC_ENVELOPE))
        .select("_env.*")
        .withColumn("type", normalize_op(F.col("type")))
    )


def snapshot_as_inserts(table_df: DataFrame, database: str, table: str) -> DataFrame:
    """S2 ``StartupOptions.initial()`` — a batch snapshot expressed as
    insert envelopes, to be unioned ahead of the change stream."""
    cols = table_df.columns
    after = F.map_from_arrays(
        F.array(*[F.lit(c) for c in cols]),
        F.array(*[F.col(c).cast("string") for c in cols]),
    )
    return table_df.select(
        F.lit(database).alias("database"),
        F.lit(table).alias("tableName"),
        F.create_map().cast("map<string,string>").alias("before"),
        after.alias("after"),
        F.lit("insert").alias("type"),
    )


def apply_changes(envelopes: DataFrame, key: str, seq: str) -> DataFrame:
    """Materialize a change-envelope stream into current table state:
    per key, the highest-``seq`` envelope wins; a winning ``delete``
    removes the row. This is the batch twin of the dim store's per-batch
    MERGE (K3) and of ``StartupOptions.initial()``'s snapshot+stream
    stitching (RT/app/dwd/BaseDbApp.java:56): union the snapshot (as
    seq-0 inserts) with the change tail and apply.

    One shuffle, keyed by ``key`` (window + filter); at scale this is
    the standard log-compaction shape — partitions process keys
    independently."""
    from pyspark.sql import Window as W

    w = W.partitionBy(key).orderBy(F.col(seq).desc())
    return (
        envelopes.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (F.col("type") != "delete"))
        .drop("_rn")
    )


def envelope_from_table(
    table_df: DataFrame, key_col: str, database: str, table: str
) -> DataFrame:
    """Deterministic CDC fixture: key % 10 == 0 -> delete (before set,
    after empty), % 10 in (1,2) -> update (before + after), else insert.
    Mirrors the insert/update/delete mix a binlog tail would carry."""
    cols = table_df.columns
    as_map = F.map_from_arrays(
        F.array(*[F.lit(c) for c in cols]),
        F.array(*[F.col(c).cast("string") for c in cols]),
    )
    k = F.col(key_col) % 10
    typ = F.when(k == 0, "delete").when(k.isin(1, 2), "update").otherwise("create")
    empty = F.create_map().cast("map<string,string>")
    return table_df.select(
        F.lit(database).alias("database"),
        F.lit(table).alias("tableName"),
        F.when(typ != "create", as_map).otherwise(empty).alias("before"),
        F.when(typ != "delete", as_map).otherwise(empty).alias("after"),
        normalize_op(typ).alias("type"),
    )


def scd2_from_changes(
    envelopes: DataFrame,
    key: str,
    seq: str,
    op_col: str = "type",
) -> DataFrame:
    """Slowly-changing-dimension Type 2 history from a change stream:
    one validity-interval row per surviving version — (key, after,
    valid_from=seq, valid_to=next change's seq or NULL, is_current).
    A delete emits no row of its own but CLOSES the previous
    version's interval (its seq becomes that row's valid_to), exactly
    the Kimball SCD2 contract. The dim store's MERGE (K3) is the
    Type-1 "latest value" projection of this history; pairing the
    history with :func:`~..operators.joins.asof_join` on valid_from
    gives point-in-time dimension lookups.

    One LEAD window per key — a single hash exchange + per-key sort,
    linear in change volume, the same shape ``apply_changes`` uses
    for last-writer-wins. At 100 TB the history table is what the
    warehouse stores; this is its builder.
    """
    from pyspark.sql import Window as W

    w = W.partitionBy(key).orderBy(seq)
    return (
        envelopes.withColumn("valid_to", F.lead(seq).over(w))
        .filter(normalize_op(F.col(op_col)) != "delete")
        .select(
            key,
            "after",
            F.col(seq).alias("valid_from"),
            "valid_to",
            F.col("valid_to").isNull().alias("is_current"),
        )
    )
