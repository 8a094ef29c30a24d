"""Scoped persist: bounded caching for multi-use intermediates.

Operators like MinHash-LSH persist intermediates (shingles, band keys)
that feed several downstream consumers inside one query. A catalog or
bench session runs dozens of queries back to back in one
SparkSession, so fire-and-forget ``persist()`` accumulates dead blocks
across the whole run. ``scoped_persist`` registers the frame in a
session-global scope that the *next* catalog query releases on entry
(see ``plans.catalog.register``) — at most one query's worth of cache
is ever live, and unpersisting an already-collected frame is free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []


def scoped_persist(df: DataFrame) -> DataFrame:
    """Persist ``df`` and register it for release at the next
    :func:`release_scoped` (called when the next catalog query
    starts)."""
    df.persist()
    _LIVE.append(df)
    return df


def release_scoped() -> None:
    """Unpersist every frame from the previous scope (non-blocking)."""
    while _LIVE:
        try:
            _LIVE.pop().unpersist(False)
        except Exception:
            pass
