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


def list_names(spark: SparkSession, path: str) -> list[str]:
    """Child names of a directory (empty if absent) — the store
    compactor's generation discovery, FS-API-routed like everything
    else so it sees HDFS/S3 the way Spark does."""
    fs, p = _fs_and_path(spark, path)
    if not fs.exists(p):
        return []
    return [st.getPath().getName() for st in fs.listStatus(p)]


def write_text(spark: SparkSession, path: str, text: str) -> None:
    """Write a small text file (overwrite). Used for store manifests —
    always written into a NOT-YET-PUBLISHED temp directory, so the
    write itself never needs to be atomic; the directory rename is."""
    fs, p = _fs_and_path(spark, path)
    out = fs.create(p, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def write_text_atomic(spark: SparkSession, path: str, text: str) -> None:
    """Publish a small text file atomically INTO a live directory:
    :func:`write_text` is only safe inside a not-yet-published temp
    dir (non-atomic create — a crash mid-write leaves a truncated
    file), so markers written next to live data go through a temp
    name + rename. Rename is the same atomicity primitive every
    Hadoop commit protocol leans on."""
    tmp = f"{path}._tmp"
    fs, p = _fs_and_path(spark, tmp)
    fs.delete(p, False)  # a crashed earlier attempt's leftover
    write_text(spark, tmp, text)
    # HDFS's rename contract REFUSES an existing destination (returns
    # false -> IOError in rename()); POSIX renameTo overwrites, which
    # masks that locally. Drop the old marker just before the rename:
    # the brief no-marker window is safe because every marker reader
    # re-derives the value when the file is absent (e.g. the shingle
    # store's layout gate infers the layout from the epoch directory
    # structure).
    dfs, dp = _fs_and_path(spark, path)
    dfs.delete(dp, False)
    rename(spark, tmp, path)


def read_text(spark: SparkSession, path: str) -> str:
    """Read a small text file written by :func:`write_text`."""
    fs, p = _fs_and_path(spark, path)
    stream = fs.open(p)
    try:
        reader = spark._jvm.java.io.BufferedReader(
            spark._jvm.java.io.InputStreamReader(stream, "UTF-8")
        )
        lines = []
        line = reader.readLine()
        while line is not None:
            lines.append(line)
            line = reader.readLine()
        return "\n".join(lines)
    finally:
        stream.close()


def rename(spark: SparkSession, src: str, dst: str) -> None:
    """Atomic-where-the-FS-supports-it rename (HDFS: atomic; S3A:
    copy+delete under the hood — the same trade every Hadoop commit
    protocol makes). Raises if the filesystem refuses the rename."""
    fs, s = _fs_and_path(spark, src)
    d = spark._jvm.org.apache.hadoop.fs.Path(dst)
    if not fs.rename(s, d):
        raise IOError(f"rename failed: {src} -> {dst}")
