"""Multimodal operator plumbing: binary payload schema, Arrow batch
iteration, 1->N frame fan-out, feature vector shape/determinism. The
value-level checks live in the catalog oracle tests (plans/multimodal
queries all carry DuckDB oracles)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F, types as T

from gmall_flink_0526_spark.operators import multimodal as M
from gmall_flink_0526_spark.session import load_tables

from .conftest import SF_SMOKE


def media(spark):
    return M.media_from_documents(load_tables(spark, SF_SMOKE, "documents")["documents"])


def test_media_schema(spark):
    m = media(spark)
    assert m.schema["payload"].dataType == T.BinaryType()
    assert isinstance(m.schema["meta"].dataType, T.StructType)
    kinds = {r["kind"] for r in m.select("kind").distinct().collect()}
    assert kinds == set(M.KINDS)


def test_decode_checksum_is_payload_md5(spark):
    row = (
        M.decode_media(media(spark))
        .join(media(spark).select("media_id", "payload"), "media_id")
        .first()
    )
    assert row["checksum"] == hashlib.md5(bytes(row["payload"])).hexdigest()
    assert row["n_bytes"] == len(row["payload"])


def test_feature_dim_and_determinism(spark):
    f1 = M.extract_features(media(spark)).orderBy("media_id").limit(5).collect()
    f2 = M.extract_features(media(spark)).orderBy("media_id").limit(5).collect()
    assert all(len(r["features"]) == M.FEATURE_DIM for r in f1)
    assert [r["features"] for r in f1] == [r["features"] for r in f2]
    assert all(0.0 <= v < 1.0 for r in f1 for v in r["features"])


def test_frame_fanout_counts(spark):
    m = media(spark)
    frames = M.sample_frames(m)
    got = frames.groupBy("media_id").count()
    expected = m.filter(F.col("kind") == "video").select(
        "media_id", F.col("meta.n_frames").alias("n")
    )
    diff = got.join(expected, "media_id").filter(F.col("count") != F.col("n")).count()
    assert diff == 0
    # every_n=2 halves (rounded up) the fan-out
    half = M.sample_frames(m, every_n=2).count()
    full = frames.count()
    assert half < full


def test_resize_rewrites_only_images(spark):
    resized = M.resize_images(media(spark), 32, 32)
    img = resized.filter(F.col("kind") == "image")
    other = resized.filter(F.col("kind") != "image")
    assert img.filter(F.length("payload") != 32 * 32).count() == 0
    assert img.filter((F.col("meta.width") != 32) | (F.col("meta.height") != 32)).count() == 0
    orig = media(spark).filter(F.col("kind") != "image").select("media_id", "payload")
    changed = (
        other.select("media_id", F.col("payload").alias("p2"))
        .join(orig, "media_id")
        .filter(F.col("p2") != F.col("payload"))
        .count()
    )
    assert changed == 0
