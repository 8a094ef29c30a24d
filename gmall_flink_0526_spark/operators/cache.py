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
# released by release_scoped. Memory is bounded by ONE corpus's
# signature volume (the thing production stores on disk): the cache
# holds a single (session, corpus dir) scope at a time — the catalog
# never interleaves corpora, so when a query first touches a NEW
# corpus dir (or a new SparkSession: a frame persisted in a stopped
# session must never be served to, or leak into, a new one) every
# entry of the previous scope is unpersisted and forgotten. Without
# the eviction, a long-lived process iterating corpus dirs or cycling
# sessions accumulates dead persisted frames — the same leak class
# scoped_persist exists to stop.

_CORPUS: dict[tuple[str, str], dict[str, DataFrame]] = {}

# Driver-side VALUES that are pure functions of the corpus (k-means
# centroids, corpus row counts) share the scope — same lifecycle, same
# eviction, so no per-module dict can outlive its (session, corpus).
_CORPUS_VALS: dict[tuple[str, str], dict[str, object]] = {}


def _scope(spark, corpus_dir: str) -> tuple[str, str]:
    """Resolve (and on first use, open — evicting every other scope)
    the (session, corpus dir) cache scope."""
    scope = (spark.sparkContext.applicationId, corpus_dir)
    if scope not in _CORPUS:
        release_corpus()
        _CORPUS[scope] = {}
        _CORPUS_VALS[scope] = {}
    return scope


def corpus_persist(spark, kind: str, corpus_dir: str, build) -> DataFrame:
    """Return the cached ``kind`` frame for ``corpus_dir`` in the
    session ``spark``, building + persisting it on first use.
    ``build`` is a zero-arg callable so the plan is only constructed
    when actually needed. First use of a new (session, corpus dir)
    scope releases every other scope's frames."""
    frames = _CORPUS[_scope(spark, corpus_dir)]
    df = frames.get(kind)
    if df is None:
        df = build()
        df.persist()
        frames[kind] = df
    return df


def corpus_value(spark, kind: str, corpus_dir: str, build):
    """Corpus-scoped memo for a plain driver-side VALUE (a fit result,
    a row count): same (session, corpus dir) scope and eviction as
    :func:`corpus_persist`, no persist — the value is just Python."""
    vals = _CORPUS_VALS[_scope(spark, corpus_dir)]
    if kind not in vals:
        vals[kind] = build()
    return vals[kind]


def release_corpus() -> None:
    """Unpersist and forget every corpus-scoped frame (and drop every
    corpus-scoped value). Called automatically when a new (session,
    corpus dir) scope starts; also a test hook. Unpersisting a frame
    whose session has stopped raises — swallowed, the JVM-side blocks
    died with the session."""
    for frames in _CORPUS.values():
        for df in frames.values():
            try:
                df.unpersist(False)
            except Exception:
                pass
    _CORPUS.clear()
    _CORPUS_VALS.clear()
