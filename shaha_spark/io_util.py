"""Filesystem helpers that work on any Hadoop-supported scheme.

The sidecar metadata file must land next to the dataset whether that is
``file:/…`` or ``s3a://…`` — so these go through the JVM Hadoop
FileSystem API instead of Python's ``open``.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath


def write_text(spark: SparkSession, path: str, content: str) -> None:
    fs, jpath = _fs_and_path(spark, path)
    out = fs.create(jpath, True)
    try:
        out.write(bytearray(content.encode("utf-8")))
    finally:
        out.close()


def write_text_atomic(spark: SparkSession, path: str, content: str) -> None:
    """Write-then-rename so readers never observe a torn file — for
    commit markers (slice/forget manifests) whose PRESENCE means
    "committed": a crash mid-write must leave either nothing or the
    complete content, never partial JSON."""
    tmp = path + ".tmp"
    write_text(spark, tmp, content)
    if not rename(spark, tmp, path):
        delete(spark, tmp)
        raise IOError(f"atomic write: could not move {tmp} to {path}")


def read_text(spark: SparkSession, path: str) -> str | None:
    """File contents, or None if the path does not exist."""
    fs, jpath = _fs_and_path(spark, path)
    if not fs.exists(jpath):
        return None
    stream = fs.open(jpath)
    try:
        jvm = spark._jvm
        return jvm.org.apache.commons.io.IOUtils.toString(
            stream, jvm.java.nio.charset.StandardCharsets.UTF_8
        )
    finally:
        stream.close()


def exists(spark: SparkSession, path: str) -> bool:
    fs, jpath = _fs_and_path(spark, path)
    return bool(fs.exists(jpath))


def delete(spark: SparkSession, path: str) -> None:
    fs, jpath = _fs_and_path(spark, path)
    fs.delete(jpath, True)


def tree_size(spark: SparkSession, path: str, suffix: str = ".parquet") -> int:
    """Total bytes of files under ``path`` matching ``suffix``.

    Snapshot internals (``_snapshots/``: manifests + files retained
    only for time travel) are excluded — physical stats describe the
    LIVE dataset; `vacuum` reporting covers the retained side.
    """
    fs, jpath = _fs_and_path(spark, path)
    if not fs.exists(jpath):
        return 0
    total = 0
    it = fs.listFiles(jpath, True)
    while it.hasNext():
        status = it.next()
        p = status.getPath()
        if "/_snapshots/" in p.toString():
            continue
        if suffix is None or p.getName().endswith(suffix):
            total += status.getLen()
    return total


def human_bytes(n: int) -> str:
    """Human-readable size (ref /root/reference/src/cli/info.rs:133-147)."""
    size = float(n)
    for unit in ("B", "KB", "MB", "GB", "TB", "PB"):
        if size < 1024 or unit == "PB":
            return f"{size:.2f} {unit}" if unit != "B" else f"{int(size)} B"
        size /= 1024
    raise AssertionError


def file_size(spark: SparkSession, path: str) -> int:
    """Size of ONE file via a single getFileStatus call — use instead
    of scanning a directory listing when the exact path is known."""
    fs, jpath = _fs_and_path(spark, path)
    if not fs.exists(jpath):
        return 0
    return fs.getFileStatus(jpath).getLen()


def rename(spark: SparkSession, src: str, dst: str) -> bool:
    fs, jsrc = _fs_and_path(spark, src)
    jdst = spark._jvm.org.apache.hadoop.fs.Path(dst)
    return bool(fs.rename(jsrc, jdst))


def create_marker(spark: SparkSession, path: str) -> bool:
    """Atomically create an empty marker file; False if it already
    exists. Backs the append lock (FileSystem.createNewFile is the
    Hadoop-portable create-if-absent primitive)."""
    fs, jpath = _fs_and_path(spark, path)
    return bool(fs.createNewFile(jpath))


def list_files(
    spark: SparkSession, path: str, suffix: str = ".parquet"
) -> list[tuple[str, int]]:
    """(path, bytes) of files under ``path`` matching ``suffix``,
    recursively — the compaction planner's input."""
    fs, jpath = _fs_and_path(spark, path)
    if not fs.exists(jpath):
        return []
    out: list[tuple[str, int]] = []
    it = fs.listFiles(jpath, True)
    while it.hasNext():
        status = it.next()
        p = status.getPath()
        if suffix is None or p.getName().endswith(suffix):
            out.append((p.toString(), status.getLen()))
    return out


def list_children(spark: SparkSession, path: str) -> list[str]:
    """Immediate children of ``path`` (one listStatus call, NOT
    recursive — sidecar discovery must not walk the data tree)."""
    fs, jpath = _fs_and_path(spark, path)
    if not fs.exists(jpath):
        return []
    return [s.getPath().toString() for s in fs.listStatus(jpath)]


def mkdirs(spark: SparkSession, path: str) -> None:
    fs, jpath = _fs_and_path(spark, path)
    fs.mkdirs(jpath)
