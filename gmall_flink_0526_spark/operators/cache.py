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


# -- corpus-scoped persist ----------------------------------------------
#
# Some intermediates are pure functions of the CORPUS, not of one
# query: the shingle table, the minhash signature table, the band-key
# table. A production pipeline materializes these once and keeps them
# (operators/dedup.lsh_band_keys docstring; SCALE.md "Dedup /
# similarity") — every dedup job is then a join against the stored
# signatures. corpus_persist is the local analogue: keyed by corpus
# dir, persisted for the life of the process, deliberately NOT
# released by release_scoped. Memory is bounded by one corpus's
# signature volume (the thing production stores on disk).

_CORPUS: dict[str, DataFrame] = {}


def corpus_persist(key: str, build) -> DataFrame:
    """Return the cached frame for ``key``, building + persisting it
    on first use. ``build`` is a zero-arg callable so the plan is only
    constructed when actually needed."""
    df = _CORPUS.get(key)
    if df is None:
        df = build()
        df.persist()
        _CORPUS[key] = df
    return df


def release_corpus() -> None:
    """Unpersist and forget every corpus-scoped frame (test hook)."""
    for df in _CORPUS.values():
        try:
            df.unpersist(False)
        except Exception:
            pass
    _CORPUS.clear()
