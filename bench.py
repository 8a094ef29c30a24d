#!/usr/bin/env python
"""Benchmark harness — the driver's per-round performance probe.

Runs the full query catalog (``gmall_flink_0526_spark.plans``) against
``$SPARK_GRAFT_SF_DIR`` (default ``/root/testdata/sf0.1``) on
``local[$SPARK_GRAFT_CPUS]`` and prints the full JSON line::

    {"queries": {"<name>": <sec>, ...}, "metric": "catalog_total",
     "value": <sec>, "unit": "sec", "sf": 0.1, ...}

followed by a short summary-only JSON line (same metric/value/sf,
no per-query dict) that survives tail-truncation of the record
intact. Each query is forced end-to-end with a ``noop``-format write (full
materialization of every row/column; ``count()`` would let Catalyst
prune the computation). Timings are per-query wall seconds; the
headline metric is their sum.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def sf_of(path: str) -> float:
    m = re.search(r"sf([0-9.]+)", path)
    return float(m.group(1).rstrip(".")) if m else -1.0


def _log_replay_mod() -> int:
    from gmall_flink_0526_spark.plans.logs import REPLAY_MOD

    return REPLAY_MOD


def _loadavg() -> list[float] | None:
    try:
        return [round(v, 2) for v in os.getloadavg()]
    except OSError:
        return None


def main() -> None:
    # Stamp host load BEFORE any work (r13 VERDICT #1): the end-of-run
    # stamp is partly self-load (this process's own 32 threads), so a
    # "quiet-window" claim is only checkable from the start stamp.
    load_avg_start = _loadavg()

    from gmall_flink_0526_spark import plans
    from gmall_flink_0526_spark.session import get_spark

    spark = get_spark("gmall-bench", cpus=CPUS)
    qs = plans.queries()

    # Warm the JVM + parquet footers + the Python worker pool once so
    # per-query numbers measure the plan, not first-touch classloading
    # or Arrow-worker spin-up (one cold worker per core costs whole
    # seconds, and lands on whichever mapInPandas query runs first).
    from gmall_flink_0526_spark.session import load_tables

    load_tables(spark, SF_DIR, "lineitem")["lineitem"].write.format("noop").mode(
        "overwrite"
    ).save()
    # footer/schema first-touch for every table, so the cost doesn't
    # land on whichever query the certification rotation put first
    for name, df in load_tables(spark, SF_DIR).items():
        df.limit(1).write.format("noop").mode("overwrite").save()
    spark.range(CPUS * 4).repartition(CPUS).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()
    # ... and the tokenizer expression chain (regex split + filter +
    # higher-order folds) over a 64-doc slice: its one-time codegen
    # compile costs ~2-3 s and otherwise lands on whichever documents
    # query the certification rotation put first (measured r6:
    # dataset_split 2.2 s cold at window position 5 vs 0.4 s warm)
    from pyspark.sql import functions as F

    from gmall_flink_0526_spark.operators import textops

    textops.with_tokens(
        load_tables(spark, SF_DIR, "documents")["documents"].limit(64)
    ).select(F.explode("toks").alias("t")).write.format("noop").mode("overwrite").save()
    # ... and the streaming machinery (micro-batch engine, state-store
    # codegen, applyInPandasWithState worker path) with a 64-row replay,
    # so the first *_stream query measures its operator, not first-touch
    # of the whole streaming stack.
    from gmall_flink_0526_spark.streaming import stateful
    from gmall_flink_0526_spark.streaming.replay import replay_stateful

    tiny = (
        load_tables(spark, SF_DIR, "events")["events"]
        .limit(64)
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
    )
    replay_stateful(spark, tiny, stateful.fix_is_new, order_by=["ts", "event_id"]).count()

    # Corpus-scoped one-time fits (kmeans quantizer, LSH signature
    # store, SemDeDup pair table, BPE memos, the histogram epoch
    # store) get their own named ledger lines BEFORE the per-query
    # loop (r10 VERDICT #2): correctness-wise they are lazy memos, but
    # timed lazily their cost landed on whichever family query the
    # certification rotation ordered first, making per-query numbers
    # order-dependent. Their total still counts into the headline
    # metric, so catalog_total stays comparable across rounds.
    setup_times: dict[str, float] = {}
    for name, fn in plans.setups().items():
        t0 = time.perf_counter()
        try:
            fn(spark, SF_DIR)
        except Exception as exc:  # noqa: BLE001
            # a failed setup must not kill the run: the family queries
            # fall back to their lazy memos (charged in-query, as
            # pre-r11) and the failure stays visible in the ledger
            print(f"setup {name} failed: {exc!r}", file=sys.stderr)
        setup_times[name] = round(time.perf_counter() - t0, 3)

    times: dict[str, float] = {}
    for name, fn in qs.items():
        t0 = time.perf_counter()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        times[name] = round(time.perf_counter() - t0, 3)

    # Median-of-3 for the noisy queries (r12 VERDICT #7, widened by
    # r13 VERDICT #1): bench totals swing ~1.4x with host load, and
    # the movers are (a) the heaviest tail and (b) EVERY micro-batch
    # replay — their wall is commit overhead, which is what host load
    # perturbs (uv_first_visit_stream and quantile_sketch_stream both
    # read as false >2x movers in r13 because only the top-10 got
    # median3). So: top-10 heaviest UNION every streaming-tagged
    # query. First-run numbers stay in "queries" (they fund the
    # comparable headline total); median3 is the noise-resistant
    # per-query figure — note it measures RE-execution (corpus memos
    # warm), which is also why it is the stabler number.
    from gmall_flink_0526_spark.plans.catalog import CATALOG

    MEDIAN3_TOP = 10
    median3_set = set(sorted(times, key=lambda n: times[n], reverse=True)[:MEDIAN3_TOP])
    median3_set.update(
        n
        for n in times
        if CATALOG.get(n) is not None and "streaming" in CATALOG[n].tags
    )
    median3: dict[str, float] = {}
    for name in sorted(median3_set, key=lambda n: times[n], reverse=True):
        samples = [times[name]]
        for _ in range(2):
            t0 = time.perf_counter()
            qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            samples.append(round(time.perf_counter() - t0, 3))
        median3[name] = sorted(samples)[1]

    # Per-query timings FIRST, headline metric LAST: the round driver
    # records a bounded TAIL of this line, so a long queries dict must
    # truncate from the front — the summary fields survive either way.
    # streaming-replay wall vs batch compute: the replay apps commit
    # real micro-batches, so their wall-clock swings with host load
    # far more than the batch plans do — splitting the headline makes
    # a round-over-round delta attributable at a glance
    # .get: a subset runner whose names drift from the registry must
    # degrade to "not streaming", never KeyError away a finished run
    stream_total = round(
        sum(
            t
            for n, t in times.items()
            if CATALOG.get(n) is not None and "streaming" in CATALOG[n].tags
        ),
        3,
    )
    setup_total = round(sum(setup_times.values()), 3)
    out = {
        "queries": times,
        "median3": median3,
        "setups": setup_times,
        # host-load attribution (r11 VERDICT "What's wrong" #4, split
        # start/end by r13 VERDICT #1): totals swing ~1.4x with
        # background load on this shared host. The START stamp is the
        # one a "quiet-window" claim rests on — the END stamp is
        # partly this process's own load and only shows whether
        # something ELSE ramped up mid-run. Diff per-query medians,
        # never single totals — BASELINE.md.
        "host_loadavg_start_1_5_15": load_avg_start,
        "host_loadavg_end_1_5_15": _loadavg(),
        "wall_clock_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "metric": "catalog_total",
        # headline includes the named setups: the same work r10 charged
        # to first-family queries now rides its own lines, so the
        # round-over-round total stays like-for-like
        "value": round(sum(times.values()) + setup_total, 3),
        "unit": "sec",
        "sf": sf_of(SF_DIR),
        "n_queries": len(times),
        "setup_sec": setup_total,
        "streaming_replay_sec": stream_total,
        "batch_sec": round(sum(times.values()) - stream_total, 3),
        # workload versioning: round-over-round comparability notes.
        # log_split_stream replays a deterministic 1-in-REPLAY_MOD
        # subset of the events fixture since round 4 (mirrored verbatim
        # in its oracle) — bench deltas across that boundary are partly
        # workload, not tuning. SPARK_GRAFT_LOG_REPLAY_MOD=1 runs the
        # full-fixture certification pass.
        "workload": {
            "log_split_stream": (
                f"events%{_log_replay_mod()}==0 since r4 (was full fixture r1-r3)"
            )
        },
    }
    print(json.dumps(out))
    # Durable per-query record (VERDICT r9 process nit): the driver
    # keeps only a truncated TAIL of stdout, which exposes ~9 queries —
    # write the full map to a round-stamped file in the repo so
    # cross-round per-query perf claims are checkable from artifacts.
    # The round number is the next after the newest driver artifact
    # (BENCH_r{N}/CORRECTNESS_r{N}), overridable via SPARK_GRAFT_ROUND.
    try:
        import glob

        here = os.path.dirname(os.path.abspath(__file__))
        # only DRIVER-written artifacts advance the stamp — this file's
        # own previous rounds must not, or a later same-round rerun
        # (builder's closing run, then the driver's) would drift to r+1
        stamped = [
            int(m.group(1))
            for f in glob.glob(os.path.join(here, "*_r[0-9]*.json"))
            if not os.path.basename(f).startswith("BENCH_DETAIL")
            and (m := re.search(r"_r0*(\d+)\.json$", f))
        ]
        rnd = int(os.environ.get("SPARK_GRAFT_ROUND", max(stamped, default=0) + 1))
        detail = os.path.join(here, f"BENCH_DETAIL_r{rnd:02d}.json")
        with open(detail, "w") as fh:
            json.dump(out, fh, indent=1, sort_keys=True)
    except (OSError, ValueError):
        # best-effort artifact: a read-only checkout (or a non-numeric
        # SPARK_GRAFT_ROUND) must never kill the run before the
        # truncation-proof summary line below prints
        pass
    # A second, summary-only line: short enough to survive any tail
    # truncation intact, so the driver's parsed record is never null
    # even when the full per-query line overflows its buffer.
    print(
        json.dumps(
            {
                "metric": "catalog_total",
                "value": out["value"],
                "unit": "sec",
                "sf": out["sf"],
                "n_queries": out["n_queries"],
                "setup_sec": out["setup_sec"],
                "streaming_replay_sec": out["streaming_replay_sec"],
                "batch_sec": out["batch_sec"],
            }
        )
    )


if __name__ == "__main__":
    main()
