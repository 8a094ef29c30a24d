"""Kafka-channel construction contract (S1/K1/K2) — EXECUTED.

The container ships no Kafka connector jar, and Spark reserves the
source name "kafka" even when the jar is absent, so the production
branch cannot run against a broker here. These tests still EXECUTE the
registry's entire kafka construction path — option mapping, the
value/timestamp projection on read, per-record topic-column routing
and checkpoint wiring on write — by swapping ONE module constant
(``registry.KAFKA_FORMAT``) for a Python-DataSource stand-in that
implements Kafka's exact source/sink row contract (key/value binary,
topic, partition, offset, timestamp, timestampType) and records every
option it was constructed with. On a connector-equipped cluster the
branch runs unchanged; the constant itself is pinned to "kafka" below.

Reference shape: RT/utils/MyKafkaUtil.java:21-43 (getKafkaSource /
getKafkaSink: bootstrap servers + topic/subscribe + offsets), K2's
dynamic-topic producer (value carries the row, topic is per-record).
"""

from __future__ import annotations

import datetime
import glob
import json
import os

import pytest

from pyspark.sql import functions as F

from gmall_flink_0526_spark.sources import registry as R
from gmall_flink_0526_spark.sources.registry import ChannelRegistry

FIXED_TS = datetime.datetime(2024, 1, 1, 0, 0, 0)


def _fake_kafka_cls():
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        DataSourceStreamReader,
        DataSourceStreamWriter,
        InputPartition,
        WriterCommitMessage,
    )

    class _BatchReader(DataSourceReader):
        def __init__(self, options):
            self.options = dict(options)

        def read(self, partition):
            # one record per "offset"; value = the options the source
            # was constructed with, so the test can assert the flow
            payload = json.dumps(self.options).encode()
            for off in range(2):
                yield (b"k", payload, self.options.get("subscribe", ""), 0, off, FIXED_TS, 0)

    class _StreamReader(DataSourceStreamReader):
        def __init__(self, options):
            self.options = dict(options)

        def initialOffset(self):
            return {"off": 0}

        def latestOffset(self):
            return {"off": 3}

        def partitions(self, start, end):
            return [InputPartition(i) for i in range(start["off"], end["off"])]

        def read(self, partition):
            payload = json.dumps(self.options).encode()
            yield (b"k", payload, self.options.get("subscribe", ""), 0, partition.value, FIXED_TS, 0)

        def commit(self, end):
            pass

    class _StreamWriter(DataSourceStreamWriter):
        def __init__(self, options):
            self.options = dict(options)

        def write(self, it):
            d = self.options["dump_dir"]
            os.makedirs(d, exist_ok=True)
            rows = [
                (r["topic"], bytes(r["value"]).decode()) for r in it
            ]
            if rows:
                name = f"part-{os.getpid()}-{abs(id(it))}.json"
                with open(os.path.join(d, name), "w") as f:
                    json.dump({"options": self.options, "rows": rows}, f)
            return WriterCommitMessage()

        def commit(self, messages, batchId):
            pass

        def abort(self, messages, batchId):
            pass

    class FakeKafka(DataSource):
        @classmethod
        def name(cls):
            return "fakekafka"

        def schema(self):
            return (
                "key binary, value binary, topic string, partition int, "
                "offset long, timestamp timestamp, timestampType int"
            )

        def reader(self, schema):
            return _BatchReader(self.options)

        def streamReader(self, schema):
            return _StreamReader(self.options)

        def streamWriter(self, schema, overwrite):
            return _StreamWriter(self.options)

    return FakeKafka


@pytest.fixture()
def fake_kafka(spark, monkeypatch):
    try:
        spark.dataSource.register(_fake_kafka_cls())
    except Exception as e:  # registered once per session; re-register errors
        if "DATA_SOURCE_ALREADY_EXISTS" not in str(e):
            raise
    monkeypatch.setattr(R, "KAFKA_FORMAT", "fakekafka")
    return spark


def test_kafka_format_constant_is_production_name():
    """The swapped constant is exactly Spark's connector format name —
    the one line the stand-in does not execute."""
    assert R.KAFKA_FORMAT == "kafka"


def test_kafka_batch_read_constructs_subscribe_and_servers(fake_kafka, tmp_path):
    """S1 batch form: read_batch(kind=kafka) applies every channel
    option to the reader (subscribe, bootstrap servers, offsets) and
    returns the connector-shaped frame."""
    spark = fake_kafka
    reg = ChannelRegistry(str(tmp_path))
    reg.register(
        "ods_base_log",
        kind="kafka",
        subscribe="ods_base_log",
        startingOffsets="earliest",
        **{"kafka.bootstrap.servers": "broker1:9092,broker2:9092"},
    )
    df = reg.read_batch(spark, "ods_base_log")
    assert {f.name for f in df.schema.fields} >= {
        "key", "value", "topic", "partition", "offset", "timestamp",
    }
    rows = df.collect()
    assert len(rows) == 2
    seen = json.loads(bytes(rows[0]["value"]))
    # option keys reach the source lowercased (Spark normalizes)
    assert seen["subscribe"] == "ods_base_log"
    assert seen["startingoffsets"] == "earliest"
    assert seen["kafka.bootstrap.servers"] == "broker1:9092,broker2:9092"
    assert rows[0]["topic"] == "ods_base_log"


def test_kafka_stream_read_projects_value_and_timestamp(fake_kafka, tmp_path):
    """S1 streaming form: read_stream(kind=kafka) builds the reader
    from channel options and projects CAST(value AS STRING) +
    timestamp — the exact frame every downstream app consumes."""
    spark = fake_kafka
    reg = ChannelRegistry(str(tmp_path))
    reg.register(
        "ods_base_log",
        kind="kafka",
        subscribe="ods_base_log",
        startingOffsets="earliest",
        **{"kafka.bootstrap.servers": "broker1:9092"},
    )
    sdf = reg.read_stream(spark, "ods_base_log")
    assert [f.name for f in sdf.schema.fields] == ["value", "timestamp"]
    assert sdf.schema["value"].dataType.simpleString() == "string"
    q = (
        sdf.writeStream.format("memory")
        .queryName("kafka_ct_mem")
        .option("checkpointLocation", str(tmp_path / "ckpt_read"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT value, timestamp FROM kafka_ct_mem").collect()
    assert len(out) == 3  # the stand-in's 3 offsets, one micro-batch
    seen = json.loads(out[0]["value"])
    assert seen["subscribe"] == "ods_base_log"
    assert seen["startingoffsets"] == "earliest"
    assert out[0]["timestamp"] == FIXED_TS


def test_kafka_stream_write_routes_by_topic_column(fake_kafka, tmp_path):
    """K1/K2: write_stream(kind=kafka) hands the sink a (topic, value)
    frame — the per-record topic COLUMN is the dynamic routing (K2,
    BaseDbApp's fact branch) — applies the channel's producer options,
    and wires the checkpoint. The stand-in records all three."""
    spark = fake_kafka
    dump = str(tmp_path / "dump")
    src_dir = tmp_path / "src"
    spark.createDataFrame(
        [(f"dwd_order_{i % 2}", f"payload-{i}") for i in range(6)],
        "topic string, payload string",
    ).write.parquet(str(src_dir))

    reg = ChannelRegistry(str(tmp_path))
    reg.register("src", schema="topic string, payload string")
    reg.channels["src"].path = str(src_dir)
    reg.register(
        "dwd_fact_log",
        kind="kafka",
        dump_dir=dump,
        **{"kafka.bootstrap.servers": "broker1:9092"},
    )
    stream = reg.read_stream(spark, "src").select(
        "topic", F.col("payload").cast("binary").alias("value")
    )
    q = reg.write_stream(
        stream, "dwd_fact_log", str(tmp_path / "ckpt"), available_now=True
    )
    q.awaitTermination(120)
    parts = [json.load(open(f)) for f in glob.glob(os.path.join(dump, "*.json"))]
    rows = sorted(r for p in parts for r in p["rows"])
    assert rows == sorted(
        [f"dwd_order_{i % 2}", f"payload-{i}"] for i in range(6)
    )
    assert all(
        p["options"]["kafka.bootstrap.servers"] == "broker1:9092" for p in parts
    )
    # checkpoint wiring: write_stream roots the sink checkpoint at
    # <checkpoint_root>/<channel name>
    assert os.path.isdir(str(tmp_path / "ckpt" / "dwd_fact_log"))
