"""Filesystem helpers routed through Hadoop's FileSystem API.

The incremental-dedup signature store is the engine's one piece of
persistent mutable state; at 100 TB it lives on HDFS/S3/GCS, not a
local disk. Python's ``os.path`` / ``shutil`` silently operate on the
driver's local filesystem only, so every existence check or delete on
a store path goes through the JVM's ``org.apache.hadoop.fs.FileSystem``
— the resolver Spark itself uses, which honors the session's
``fs.defaultFS`` and per-scheme (``s3a://``, ``hdfs://``) config. On a
bare local session the default scheme is ``file://``, so behavior in
tests is identical to the old os-path code.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def exists(spark: SparkSession, path: str) -> bool:
    fs, p = _fs_and_path(spark, path)
    return bool(fs.exists(p))


def delete(spark: SparkSession, path: str) -> None:
    """Recursive delete, no error if absent (shutil.rmtree
    ignore_errors semantics, any Hadoop-supported filesystem)."""
    fs, p = _fs_and_path(spark, path)
    fs.delete(p, True)


def rename(spark: SparkSession, src: str, dst: str) -> None:
    """Atomic-where-the-FS-supports-it rename (HDFS: atomic; S3A:
    copy+delete under the hood — the same trade every Hadoop commit
    protocol makes). Raises if the filesystem refuses the rename."""
    fs, s = _fs_and_path(spark, src)
    d = spark._jvm.org.apache.hadoop.fs.Path(dst)
    if not fs.rename(s, d):
        raise IOError(f"rename failed: {src} -> {dst}")
