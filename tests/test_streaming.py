"""Replay tests: the exact keyed-state streaming operators, driven by a
time-ordered file replay (micro-batch per file), must converge to their
batch twins — SURVEY §5's test contract for stateful operators."""

from __future__ import annotations

import os
import time

import pandas as pd
import pytest

from pyspark.sql import functions as F

from gmall_flink_0526_spark.session import load_tables
from gmall_flink_0526_spark.sources.registry import ChannelRegistry, write_replay
from gmall_flink_0526_spark.streaming import stateful

from .conftest import SF_SMOKE

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
)


@pytest.fixture(scope="module")
def replay(spark, tmp_path_factory):
    # fewer state-store partitions = much faster micro-batches here;
    # restored after the module so batch tests keep the scale default
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    root = str(tmp_path_factory.mktemp("channels"))
    reg = ChannelRegistry(root)
    reg.register("ods_events", schema=EVENTS_SCHEMA)
    events = load_tables(spark, SF_SMOKE, "events")["events"]
    write_replay(events, reg.channels["ods_events"].path, n_files=6, order_by=["ts", "event_id"])
    yield reg, root
    spark.conf.set("spark.sql.shuffle.partitions", prev)


def drain(q, timeout=300, settle_s=5.0):
    """Wait until the file source is exhausted, then return.

    ``q.processAllAvailable()`` never returns for queries using
    ``ProcessingTimeTimeout``: the engine keeps scheduling empty batches
    to evaluate state timeouts, which resets the no-new-data latch. So
    instead: drained == no data available AND the last observed progress
    has been stable-or-empty for ``settle_s`` seconds.
    """
    deadline = time.time() + timeout
    stable_since = None
    last_batch = -1
    while time.time() < deadline:
        lp = q.lastProgress or {}
        batch, n_in = lp.get("batchId", -1), lp.get("numInputRows")
        if lp and not q.status["isDataAvailable"] and (batch == last_batch or n_in == 0):
            stable_since = stable_since or time.time()
            if time.time() - stable_since >= settle_s:
                return
        else:
            stable_since = None
        last_batch = batch
        time.sleep(0.5)
    raise TimeoutError(f"stream {q.name} did not drain in {timeout}s")


def run_to_memory(spark, df, reg, name, checkpoint_root):
    reg.register(name, kind="memory")
    q = reg.write_stream(df, name, checkpoint_root)
    try:
        drain(q)
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {name}_mem")


def events_pdf(spark):
    df = load_tables(spark, SF_SMOKE, "events")["events"]
    return df.select("event_id", "ts", "user_id").orderBy("ts", "event_id").toPandas()


def test_daily_dedup_converges_to_batch(spark, replay):
    reg, root = replay
    src = reg.read_stream(spark, "ods_events", max_files_per_trigger=1)
    out = run_to_memory(
        spark, stateful.daily_dedup(src), reg, "dwm_unique_visit", os.path.join(root, "ckpt1")
    )
    got = out.toPandas().sort_values(["user_id", "dt"]).reset_index(drop=True)

    from gmall_flink_0526_spark import plans

    expected = (
        plans.queries()["uv_first_visit"](spark, SF_SMOKE)
        .toPandas()
        .sort_values(["user_id", "dt"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["user_id", "dt", "first_event_id"]], expected[["user_id", "dt", "first_event_id"]]
    )


def test_fix_is_new_converges_to_batch(spark, replay):
    reg, root = replay
    src = reg.read_stream(spark, "ods_events", max_files_per_trigger=1)
    out = run_to_memory(
        spark, stateful.fix_is_new(src), reg, "dwd_is_new", os.path.join(root, "ckpt2")
    )
    got = out.toPandas().sort_values("event_id").reset_index(drop=True)

    from gmall_flink_0526_spark import plans

    expected = (
        plans.queries()["is_new_fix"](spark, SF_SMOKE)
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["event_id", "user_id", "is_new"]], expected[["event_id", "user_id", "is_new"]]
    )


def test_sessionize_bounce_closed_sessions(spark, replay):
    """Streaming emits every session *closed by a successor event*; the
    per-user open tail session stays in state (its timeout can't fire
    under processAllAvailable). Expected = batch sessionization minus
    each user's last session."""
    reg, root = replay
    src = reg.read_stream(spark, "ods_events", max_files_per_trigger=1)
    out = run_to_memory(
        spark,
        stateful.sessionize_bounce(src, gap_minutes=10),
        reg,
        "dwm_user_jump",
        os.path.join(root, "ckpt3"),
    )
    got = (
        out.toPandas()
        .groupby("user_id")
        .agg(closed_ct=("n_events", "size"), bounce_ct=("is_bounce", "sum"))
        .reset_index()
    )

    ev = events_pdf(spark)
    gap = pd.Timedelta(minutes=10)
    expected_rows = []
    for uid, g in ev.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        sizes, n = [], 0
        last = None
        for t in g["ts"]:
            if last is not None and (t - last) > gap:
                sizes.append(n)
                n = 0
            n += 1
            last = t
        # open tail session not emitted
        if sizes:
            expected_rows.append(
                (uid, len(sizes), sum(1 for s in sizes if s == 1))
            )
    expected = pd.DataFrame(expected_rows, columns=["user_id", "closed_ct", "bounce_ct"])
    got = got.sort_values("user_id").reset_index(drop=True)
    expected = expected.sort_values("user_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"bounce_ct": "int64"}), expected.astype({"bounce_ct": "int64"})
    )


def test_unique_visit_and_user_jump_apps(spark, replay, tmp_path_factory):
    """App-level wrappers (UniqueVisitApp / UserJumpDetailApp parity):
    same operators as above, but run as named-channel jobs writing file
    channels instead of memory sinks."""
    from gmall_flink_0526_spark.streaming import pipelines

    reg, root = replay
    ckpt = str(tmp_path_factory.mktemp("app_ckpt"))
    q1 = pipelines.unique_visit_app(spark, reg, ckpt, source="ods_events")
    try:
        drain(q1)
    finally:
        q1.stop()
    uv = reg.read_batch(spark, "dwm_unique_visit")
    from gmall_flink_0526_spark import plans

    expected = plans.queries()["uv_first_visit"](spark, SF_SMOKE)
    assert uv.count() == expected.count()

    q2 = pipelines.user_jump_detail_app(spark, reg, ckpt, source="ods_events")
    try:
        drain(q2)
    finally:
        q2.stop()
    jumps = reg.read_batch(spark, "dwm_user_jump_detail")
    assert jumps.columns == ["user_id", "n_events", "is_bounce", "end_ts"]
    assert jumps.count() > 0


def test_jsonl_channel_round_trip(spark, tmp_path):
    """S1/P1's at-rest form: a jsonl channel replays newline-delimited
    JSON through a streaming read and lands in a jsonl sink; the
    round-trip preserves values under the declared schema (the
    schema-on-read contract of the reference's JSON.parseObject path)."""
    import os

    from gmall_flink_0526_spark.sources.registry import ChannelRegistry

    reg = ChannelRegistry(str(tmp_path))
    src_ch = reg.register(
        "ods_jsonl", kind="jsonl", schema="event_id long, event_type string, value double"
    )
    df = spark.range(50).selectExpr(
        "id AS event_id",
        "CASE WHEN id % 2 = 0 THEN 'view' ELSE 'click' END AS event_type",
        "CAST(id AS DOUBLE) / 4 AS value",
    )
    reg.write_batch(df, "ods_jsonl")
    reg.register("dwd_jsonl", kind="jsonl", schema="event_id long, event_type string, value double")
    src = reg.read_stream(spark, "ods_jsonl", max_files_per_trigger=1)
    q = reg.write_stream(src, "dwd_jsonl", str(tmp_path / "ckpt"), available_now=True)
    q.awaitTermination(120)
    got = reg.read_batch(spark, "dwd_jsonl")
    assert got.count() == 50
    assert {tuple(r) for r in got.collect()} == {tuple(r) for r in df.collect()}
    # at-rest form really is newline-delimited JSON text
    part = [
        f for f in os.listdir(src_ch.path) if f.startswith("part-") and not f.endswith(".crc")
    ][0]
    first = open(os.path.join(src_ch.path, part)).readline()
    assert first.startswith("{") and "event_id" in first


def test_funnel_chain_n_rejects_bad_stage_lists(spark):
    import pytest

    from gmall_flink_0526_spark.streaming.stateful import funnel_chain_n

    ev = spark.createDataFrame(
        [], "event_id long, ts timestamp, user_id long, event_type string"
    )
    with pytest.raises(ValueError, match="distinct"):
        funnel_chain_n(ev, stages=("view", "view"))
    with pytest.raises(ValueError, match="probe_type"):
        funnel_chain_n(ev, stages=("view", "click"), probe_type="click")


def test_watermark_late_drop_boundary_semantics(spark, tmp_path):
    """Pin the engine's late-data drop rule the late-drop oracle
    states (probed on this Spark version, would catch an upgrade
    changing it): the late-row filter uses a ONE-BATCH-LAGGED
    watermark (batch N drops against the watermark computed after
    batch N-2), the predicate is window_end <= watermark (boundary
    equality DROPS), and a raw ts exactly at the watermark survives
    (its window end is an hour past it)."""
    from gmall_flink_0526_spark.streaming.replay import replay_stateful

    rows = [
        (0, "2024-01-01 03:00:00", "on", 0),       # sets wm0 = 02:00
        (1, "2024-01-01 03:00:00", "spacer", 1),   # lag batch, wm unchanged
        (2, "2024-01-01 01:30:00", "edge", 2),     # window end == wm0 -> drop
        (3, "2024-01-01 00:30:00", "late", 2),     # window end <  wm0 -> drop
        (4, "2024-01-01 02:00:00", "at_wm", 2),    # ts == wm0, end > wm0 -> keep
        (5, "2024-01-01 02:30:00", "ok", 2),       # window end >  wm0 -> keep
        (6, "2024-01-01 06:00:00", "_sentinel", 3),
    ]
    df = spark.createDataFrame(
        rows, "id long, ts string, tag string, bat int"
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    def op(s):
        return (
            s.withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour").alias("w"), "tag")
            .agg(F.count("*").alias("ct"))
            .select(F.col("w.start").cast("string").alias("stt"), "tag", "ct")
        )

    out = replay_stateful(
        spark, df, op, order_by=["bat", "ts"], n_files=4, file_of=F.col("bat"),
        drain_mode="all_available",
    )
    got = {r["tag"] for r in out.filter(F.col("tag") != "_sentinel").collect()}
    assert got == {"on", "spacer", "at_wm", "ok"}, got
