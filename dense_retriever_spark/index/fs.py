"""Driver-side filesystem helpers over the Hadoop FileSystem API.

The index's DATA (shards/, global/, docs/, manifest/) is read and written by
Spark itself, so it already works on any scheme the cluster's Hadoop conf
supports (file://, hdfs://, s3a://, gs://...). What used to be local-only was
the handful of driver-side METADATA operations — stats.json read/write,
manifest-dir existence, orphan-shard deletes. These helpers route those
through the same Hadoop FileSystem the executors use, so ``index_dir`` can be
an object-store URI end-to-end (SURVEY.md §2.1 S13; exercised in tests via
``file://`` — the one Hadoop scheme the sandbox can serve).

Plain paths (no scheme) resolve against the default filesystem, which in
local mode is ``file:///`` — so every existing local-path caller behaves
identically. All calls are O(1) driver-side metadata RPCs; none sit on a hot
path (one stats read per search/build, one existence probe per build).
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _active_spark(spark: SparkSession | None) -> SparkSession:
    s = spark or SparkSession.getActiveSession()
    if s is None:
        raise RuntimeError("a SparkSession is required for filesystem access")
    return s


def _fs_path(spark: SparkSession | None, path: str):
    s = _active_spark(spark)
    jvm = s._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(s._jsc.hadoopConfiguration())
    # LocalFileSystem writes .crc sidecars and then REFUSES files modified by
    # plain open() (ChecksumException); stats.json must stay interoperable
    # with ordinary tooling. Remote stores (s3a/hdfs) ignore or no-op these.
    try:
        fs.setWriteChecksum(False)
        fs.setVerifyChecksum(False)
    except Exception:
        pass
    return fs, p


def exists(path: str, spark: SparkSession | None = None) -> bool:
    fs, p = _fs_path(spark, path)
    return bool(fs.exists(p))


def is_dir(path: str, spark: SparkSession | None = None) -> bool:
    fs, p = _fs_path(spark, path)
    return bool(fs.exists(p)) and bool(fs.getFileStatus(p).isDirectory())


def mkdirs(path: str, spark: SparkSession | None = None) -> None:
    fs, p = _fs_path(spark, path)
    fs.mkdirs(p)


def delete(path: str, spark: SparkSession | None = None) -> None:
    """Recursive delete; no-op if absent (shutil.rmtree(ignore_errors=True)
    semantics)."""
    fs, p = _fs_path(spark, path)
    if fs.exists(p):
        fs.delete(p, True)


def read_text(path: str, spark: SparkSession | None = None) -> str:
    s = _active_spark(spark)
    fs, p = _fs_path(s, path)
    if not fs.exists(p):  # Pythonic error instead of an opaque Py4J wrapper
        raise FileNotFoundError(path)
    stream = fs.open(p)
    try:
        # commons-io ships with Spark; avoids a byte-at-a-time py4j loop
        return s._jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()


def write_text(path: str, content: str, spark: SparkSession | None = None) -> None:
    fs, p = _fs_path(spark, path)
    out = fs.create(p, True)
    try:
        out.write(bytearray(content.encode("utf-8")))
    finally:
        out.close()
