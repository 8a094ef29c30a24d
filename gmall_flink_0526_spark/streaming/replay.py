"""Batch-replay harness for the exact stateful streaming operators.

The convergence contract (SURVEY §5): replaying a table through a
stateful streaming operator in timestamp order must reproduce the
batch twin. tests/test_streaming.py asserts it per operator; this
module packages the same replay so *catalog queries* can run the real
streaming path and be value-checked by the external DuckDB oracle —
proving F2/U2 with the driver's gate, not only pytest.

The file channel stands in for Kafka (one micro-batch per file, files
ordered by event time — the offset-ordered-consumption analogue).
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
import time

from pyspark.sql import DataFrame, SparkSession

from ..sources.registry import ChannelRegistry, write_replay

_SEQ = 0
# replay channels are immutable once written — share them across the
# queries of one session instead of re-sorting/re-writing per query
_CHANNEL_CACHE: dict[tuple, str] = {}


def _cleanup_channels() -> None:
    for root in _CHANNEL_CACHE.values():
        shutil.rmtree(root, ignore_errors=True)


atexit.register(_cleanup_channels)


_TEMP_ROOTS: list[str] = []


def temp_replay_root(prefix: str) -> str:
    """mkdtemp + atexit cleanup — the shared idiom for catalog replay
    queries that materialize a fresh channel dir per call (the cached
    channels above are for replays reused across queries)."""
    root = tempfile.mkdtemp(prefix=prefix)
    if not _TEMP_ROOTS:
        atexit.register(
            lambda: [shutil.rmtree(p, ignore_errors=True) for p in _TEMP_ROOTS]
        )
    _TEMP_ROOTS.append(root)
    return root


def drain(q, timeout: float = 600, settle_s: float = 1.5, n_files: int | None = None) -> None:
    """Wait until a file-source streaming query has consumed every file.

    ``q.processAllAvailable()`` never returns for queries using
    ``ProcessingTimeTimeout``: the engine keeps scheduling empty
    batches to evaluate state timeouts, resetting the no-new-data
    latch.

    When ``n_files`` is known (our replays always know it), completion
    is DETERMINISTIC, no wall-clock settle: ``lastProgress`` only ever
    reflects a COMMITTED batch, and with maxFilesPerTrigger=1 the file
    source's end offset after the last data batch is exactly
    ``n_files - 1`` — so the moment a progress carries that offset, all
    output is in the sink and the query can stop. (Stopping right then
    also shrinks the window in which a processing-time state timeout
    could fire spuriously.)

    Without ``n_files``: drained == no data available AND the last
    progress stayed stable-or-empty for ``settle_s`` seconds.
    """
    deadline = time.time() + timeout
    if n_files is not None:
        import re as _re

        while time.time() < deadline:
            # a failed query never reaches its end offset — surface its
            # real error now instead of masking it as a drain timeout
            if q.exception() is not None:
                raise q.exception()
            lp = q.lastProgress
            if lp:
                # the offset condition below reads source 0 only: a
                # multi-source query (stream-stream join) routed through
                # offsets mode would stop when ONE side finishes,
                # silently truncating output — fail loudly instead
                if len(lp["sources"]) != 1:
                    raise ValueError(
                        f"drain(n_files=...) supports exactly one source, "
                        f"query {q.name!r} has {len(lp['sources'])}; use "
                        "drain_mode='all_available' or settle mode"
                    )
                # endOffset is an opaque offset: a dict in some PySpark
                # versions, a JSON-encoded string in others
                raw = lp["sources"][0].get("endOffset")
                off = -1
                if isinstance(raw, dict):
                    off = raw.get("logOffset", -1)
                elif raw is not None:
                    m = _re.search(r"-?\d+", str(raw))
                    off = int(m.group()) if m else -1
                if off >= n_files - 1:
                    return
            time.sleep(0.1)
        raise TimeoutError(f"stream {q.name} did not drain in {timeout}s")
    stable_since = None
    last_batch = -1
    while time.time() < deadline:
        if q.exception() is not None:
            raise q.exception()
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


def replay_stateful(
    spark: SparkSession,
    source_df: DataFrame,
    op,
    *,
    order_by: list[str],
    n_files: int = 3,
    shuffle_partitions: int = 16,
    cache_key: str | None = None,
    drain_mode: str = "offsets",
    file_of=None,
) -> DataFrame:
    """Replay ``source_df`` through streaming operator ``op`` (a
    callable ``stream DataFrame -> stream DataFrame``) and return the
    collected output as a batch DataFrame.

    The replay is split into ``n_files`` micro-batches ordered by
    ``order_by`` (event time first), so keyed state observes rows in
    the same order the batch twin assumes. State fan-out is pinned to
    ``shuffle_partitions`` for the run (restored after): the dominant
    cost is the per-GROUP Python function call inside
    applyInPandasWithState (tens of thousands of keys per batch), so
    wall clock scales with state partitions up to the worker-pool size
    (measured at sf0.1: 4 partitions 26 s, 16 partitions 10 s), while
    hundreds of partitions would just pay empty state-store commits.

    ``file_of`` (optional Column, int in [0, n_files)) passes through
    to :func:`write_replay`: an EXPLICIT micro-batch assignment for
    operators whose semantics care where the batch boundary falls
    (e.g. a temporal join whose tie rule wants equal-event-time rows
    co-batched). It must be monotone in the ``order_by`` event-time
    prefix, and callers that use it must pick a ``cache_key`` distinct
    from any default-split replay of the same source.
    """
    global _SEQ
    _SEQ += 1
    out_name = f"replay_out_{_SEQ}"
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in source_df.schema.fields)
    ck = (cache_key, schema, n_files, tuple(order_by)) if cache_key else None
    src_root = _CHANNEL_CACHE.get(ck) if ck else None
    if src_root is None:
        src_root = tempfile.mkdtemp(prefix="gmall_replay_src_")
        src_reg = ChannelRegistry(src_root)
        src_reg.register("replay_src", schema=schema)
        write_replay(
            source_df,
            src_reg.channels["replay_src"].path,
            n_files=n_files,
            order_by=order_by,
            file_of=file_of,
        )
        if ck:
            _CHANNEL_CACHE[ck] = src_root
    src_reg = ChannelRegistry(src_root)
    src_reg.register("replay_src", schema=schema)

    run_root = tempfile.mkdtemp(prefix="gmall_replay_run_")
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
        src = src_reg.read_stream(spark, "replay_src", max_files_per_trigger=1)
        out_reg = ChannelRegistry(run_root)
        out_reg.register(out_name, kind="memory")
        # NOT Trigger.AvailableNow: with ProcessingTimeTimeout state the
        # engine never reaches "caught up" — it keeps scheduling empty
        # timeout-evaluation batches (measured: epoch 1379 and climbing)
        # and awaitTermination hangs, the same latch problem as
        # processAllAvailable. drain() + stop() is the working recipe;
        # stop() may abort an in-flight EMPTY timeout batch mid
        # state-commit (log noise, harmless — the data batches are done
        # and the checkpoint is discarded).
        q = out_reg.write_stream(op(src), out_name, os.path.join(run_root, "ckpt"))
        try:
            if drain_mode == "all_available":
                # windowed aggs emit watermark-flushed rows in a batch
                # AFTER the last data batch (watermark(N) comes from
                # data(N-1)) — the offset condition would stop early.
                # Safe here because windowed queries use NoTimeout
                # state: processAllAvailable terminates.
                q.processAllAvailable()
            else:
                drain(q, n_files=n_files)
        finally:
            q.stop()
        # the memory sink holds rows driver-side; safe to return after
        # the checkpoint scratch dir is gone
        return spark.sql(f"SELECT * FROM {out_name}_mem")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(run_root, ignore_errors=True)
        if not ck:
            shutil.rmtree(src_root, ignore_errors=True)
