"""Full-fixture certification pass for log_split_stream.

The catalog query replays a deterministic 1-in-REPLAY_MOD (default 3)
subset of the events fixture (plans/logs.py) — the oracle mirrors the
subset so the correctness gate stays sound, but the full-fixture
streaming path must not go unexercised (ADVICE r4: the workload shrank
~3x; keep a full-fixture run in tests). This test runs the driver-style
vanilla gate in a SUBPROCESS with SPARK_GRAFT_LOG_REPLAY_MOD=1 — the
env override is read at module import, so a fresh interpreter is the
only honest way to run it — and asserts the full 10k-row sf0.01
fixture still oracle-matches through the real streaming app
(3 micro-batches x 4 sinks, per-channel counts + payload checksums).

The sf0.1 (100k-row) variant of the same command is the occasional
certification pass bench.py's workload note points at; its per-round
result is recorded in BASELINE.md.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_log_split_stream_full_fixture_sf001():
    env = dict(os.environ, SPARK_GRAFT_LOG_REPLAY_MOD="1")
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "vanilla_gate.py"),
            "/root/testdata/sf0.01",
            "log_split_stream",
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    tail = "\n".join((proc.stdout + proc.stderr).splitlines()[-15:])
    assert proc.returncode == 0, f"full-fixture gate failed:\n{tail}"
    assert "log_split_stream" in proc.stdout and "match" in proc.stdout, tail
