"""Scoped persist: bounded caching for multi-use intermediates.

Operators like MinHash-LSH persist intermediates (shingles, band keys)
that feed several downstream consumers inside one query. A catalog or
bench session runs dozens of queries back to back in one
SparkSession, so fire-and-forget ``persist()`` accumulates dead blocks
across the whole run. ``scoped_persist`` registers the frame in a
NAMED scope that the *next* catalog query (or the owning stream's
epoch exit) releases — at most one scope's worth of cache is ever
live per owner, and unpersisting an already-collected frame is free.

Scope NAMES are thread-local (frames live in a process-global dict
keyed by name): the MAIN thread's unscoped persists register under
``"default"`` (drained by ``plans.catalog.register`` at the next
query); a streaming ``foreachBatch`` body wraps its epoch in
:func:`cache_scope` so two concurrently running streams — or a stream
beside an enclosing batch query — never unpersist each other's pinned
frames mid-flight (the r9 ADVICE trap: the drain used to be
process-global). Defense in depth for code that FORGETS the wrapper:
an unscoped persist from a non-main thread falls into a
thread-id-keyed scope, so the main thread's per-query drain can never
reach it — it leaks until that thread drains itself, which is the
safe failure (Spark recomputes; nothing is yanked mid-epoch).
"""

from __future__ import annotations

import threading

from contextlib import contextmanager

from pyspark.sql import DataFrame

_SCOPES: dict[str, list[DataFrame]] = {}
_TLS = threading.local()


def _current_scope() -> str:
    explicit = getattr(_TLS, "scope", None)
    if explicit is not None:
        return explicit
    if threading.current_thread() is threading.main_thread():
        return "default"
    # unscoped persist on a worker/stream thread: isolate per thread
    # rather than sharing "default" with the main catalog loop, whose
    # per-query drain would otherwise unpersist it mid-flight
    return f"thread:{threading.get_ident()}"


def scoped_persist(df: DataFrame) -> DataFrame:
    """Persist ``df`` and register it in the current thread's scope for
    release at that scope's next :func:`release_scoped` (for batch
    catalog queries: when the next query starts; inside a
    :func:`cache_scope` block: at block exit)."""
    df.persist()
    _SCOPES.setdefault(_current_scope(), []).append(df)
    return df


def release_scoped(scope: str | None = None) -> None:
    """Unpersist every frame registered in ``scope`` (default: the
    current thread's scope), non-blocking. Other scopes' frames are
    untouched."""
    live = _SCOPES.pop(scope if scope is not None else _current_scope(), [])
    while live:
        try:
            live.pop().unpersist(False)
        except Exception:
            pass


@contextmanager
def cache_scope(name: str):
    """Run a block with its own scoped-persist scope: every
    ``scoped_persist`` inside (same thread) registers under ``name``,
    and the scope is drained on exit — success or failure. The owner
    token the r9 ADVICE asked for: a stream's foreachBatch epoch wraps
    itself so its guard frames drain per epoch without touching a
    concurrent stream's (or an enclosing batch query's) frames."""
    prev = getattr(_TLS, "scope", None)
    _TLS.scope = name
    try:
        yield
    finally:
        release_scoped(name)
        if prev is None:
            del _TLS.scope
        else:
            _TLS.scope = prev


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


def has_corpus_value(spark, kind: str, corpus_dir: str) -> bool:
    """Warm-check for :func:`corpus_value` without building: True when
    the memo already holds ``kind`` for this (session, corpus dir)
    scope. Public so plan-layer seeders (e.g. the joint PQ Lloyd pass)
    can skip work without reaching into the cache's representation.
    Shares :func:`corpus_value`'s scope resolution, including its
    open-on-first-use eviction."""
    return kind in _CORPUS_VALS[_scope(spark, corpus_dir)]


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
