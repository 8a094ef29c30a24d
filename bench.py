#!/usr/bin/env python
"""Benchmark harness — the driver's per-round performance probe.

Runs the full query catalog (``gmall_flink_0526_spark.plans``) against
``$SPARK_GRAFT_SF_DIR`` (default ``/root/testdata/sf0.1``) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line::

    {"metric": "catalog_total", "value": <sec>, "unit": "sec",
     "queries": {"<name>": <sec>, ...}, "sf": 0.1}

Each query is forced end-to-end with a ``noop``-format write (full
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


def main() -> None:
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

    times: dict[str, float] = {}
    for name, fn in qs.items():
        t0 = time.perf_counter()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        times[name] = round(time.perf_counter() - t0, 3)

    # Per-query timings FIRST, headline metric LAST: the round driver
    # records a bounded TAIL of this line, so a long queries dict must
    # truncate from the front — the summary fields survive either way.
    out = {
        "queries": times,
        "metric": "catalog_total",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "sf": sf_of(SF_DIR),
        "n_queries": len(times),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
