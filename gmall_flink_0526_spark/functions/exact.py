"""Exact (oracle-reproducible) floating aggregation.

Summing doubles is order-dependent; Spark's parallel partial aggregates
and DuckDB's sequential scan would differ in the last bits and fail a
value-hash comparison. The fix is the one the reference itself uses for
money (``BigDecimal`` everywhere, ``RT/bean/OrderInfo.java:13-17``):
accumulate exactly in decimal, convert once at the end.

Each per-row double is cast to ``DECIMAL(30,6)`` — a deterministic
half-up rounding of an identical IEEE double on both engines — summed
exactly, then cast back to double. Both engines produce the same bits.

At 100 TB scale this costs nothing extra: decimal sums are still
map-side partial aggregates inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

SCALE = 6
_DEC = f"decimal(30,{SCALE})"


def exact_sum(expr: Column) -> Column:
    """Order-insensitive double sum: decimal-accumulate, emit double."""
    return F.sum(expr.cast(_DEC)).cast("double")


def exact_avg(expr: Column) -> Column:
    """avg as exact-sum / count — deterministic double division."""
    return F.sum(expr.cast(_DEC)).cast("double") / F.count(expr)


def sql_sum(expr: str) -> str:
    """DuckDB-side twin of :func:`exact_sum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(30,{SCALE}))) AS DOUBLE)"


def sql_avg(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(30,{SCALE}))) AS DOUBLE) / COUNT({expr})"
