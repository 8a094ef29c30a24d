"""Cache-scope lifecycle: query-scoped frames die at the next query's
entry; corpus-scoped frames (the signature-table analogue) survive it
and only release_corpus clears them."""

from __future__ import annotations

from gmall_flink_0526_spark.operators import cache


def test_scoped_released_but_corpus_survives(spark):
    df_scoped = cache.scoped_persist(spark.range(10))
    df_corpus = cache.corpus_persist("test:corpus:a", lambda: spark.range(20))
    assert df_scoped.storageLevel.useMemory
    assert df_corpus.storageLevel.useMemory

    cache.release_scoped()  # what plans.catalog.register does per query
    assert not df_scoped.storageLevel.useMemory
    assert df_corpus.storageLevel.useMemory  # corpus frame survives

    # same key returns the SAME frame without rebuilding
    again = cache.corpus_persist("test:corpus:a", lambda: (_ for _ in ()).throw(AssertionError))
    assert again is df_corpus

    cache.release_corpus()
    assert not df_corpus.storageLevel.useMemory
    # after release, the key rebuilds
    rebuilt = cache.corpus_persist("test:corpus:a", lambda: spark.range(5))
    assert rebuilt is not df_corpus
    cache.release_corpus()
