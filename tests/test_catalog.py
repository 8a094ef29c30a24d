"""Catalog-wide oracle gate: every query with an oracle must match
DuckDB exactly at sf0.001 (fast inner loop; the driver re-checks at
sf0.01). Mirrors the driver's CORRECTNESS gate.

Sweep policy (r14 VERDICT #4 — the full sweep pushed mid-round pytest
near 30 min): a default run covers this round's NEW/CHANGED queries
(catalog.R_NEW_CHANGED — always) plus a rotating third of the rest.
The rotation offset is SPARK_GRAFT_SWEEP_OFFSET when set (pinned,
replayable — the r15 ADVICE fix: a run's coverage is then reproducible
regardless of wall-clock day), else the day ordinal mod 3 (stable
within a working day). Set SPARK_GRAFT_FULL_SWEEP=1 for the full
catalog — the closing battery and the in-repo vanilla gate still check
every query every round."""

from __future__ import annotations

import os

import pytest

from gmall_flink_0526_spark import plans

from .conftest import SF_SMOKE, assert_matches_oracle, duck_con


def _names():
    all_names = sorted(plans.queries().keys())
    if os.environ.get("SPARK_GRAFT_FULL_SWEEP") == "1":
        return all_names
    from datetime import date

    from gmall_flink_0526_spark.plans.catalog import R_NEW_CHANGED

    off_env = os.environ.get("SPARK_GRAFT_SWEEP_OFFSET")
    off = int(off_env) % 3 if off_env is not None else date.today().toordinal() % 3
    rest = [n for n in all_names if n not in R_NEW_CHANGED]
    picked = set(R_NEW_CHANGED) & set(all_names)
    picked.update(n for i, n in enumerate(rest) if i % 3 == off)
    return sorted(picked)


@pytest.fixture(scope="module")
def con():
    return duck_con(SF_SMOKE)


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(spark, con, name):
    spec = plans.CATALOG[name]
    df = spec.fn(spark, SF_SMOKE)
    if spec.oracle is None:
        assert df.count() >= 0  # rows-only check, like the driver
    else:
        assert_matches_oracle(df, con, spec.oracle, name=name)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(e.oracle_sql()).issubset(set(e.queries()))


def test_priority_list_is_exactly_the_catalog():
    """The certification-order list must name every registered query
    exactly once — a typo would silently demote a query to
    registration-order tail and break the rotation contract."""
    from gmall_flink_0526_spark.plans import catalog

    plans.queries()  # force load
    assert sorted(catalog._PRIORITY) == sorted(catalog.CATALOG)
    assert len(set(catalog._PRIORITY)) == len(catalog._PRIORITY)
