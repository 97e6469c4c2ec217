"""Small-file control-plane IO through the Hadoop ``FileSystem`` API.

Spark's data paths (parquet reads/writes) already speak every Hadoop
scheme; the engine's CONTROL files — the ANN index's ``CURRENT``
pointer, the curation pipeline's per-batch commit manifests — must not
silently require a local filesystem (``open``/``os.replace`` work only
for local paths). Routing them through ``Path.getFileSystem`` makes the
same code work on ``file://``, ``hdfs://`` and ``s3a://`` — a
scheme-less path resolves against ``fs.defaultFS`` exactly like the
data paths do, so control and data files always land on the same
store. The py4j hop costs microseconds and these are one-per-batch /
one-per-rebuild files.

Atomicity notes (each caller documents which it relies on):

* :func:`write_text_once` — create-temp + rename to a destination that
  must not exist; rename-no-overwrite is atomic on POSIX and HDFS, and
  the "already exists" outcome is reported, not raised, so idempotent
  writers (a replayed micro-batch re-committing its manifest) are a
  no-op.
* :func:`write_text_overwrite` — on a local filesystem this is
  ``os.replace`` (atomic). Elsewhere it is create-temp + delete +
  rename: a reader can observe a missing destination for an instant,
  so readers of overwritten pointers need a fallback (the ANN index
  resolves the newest staged version when ``CURRENT`` is absent).
  True atomic overwrite on an object store is a catalog commit's job.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import SparkSession


def _fs_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(spark._jsc.hadoopConfiguration()), p


def exists(spark: SparkSession, path: str) -> bool:
    fs, p = _fs_path(spark, path)
    return bool(fs.exists(p))


def mkdirs(spark: SparkSession, path: str) -> None:
    fs, p = _fs_path(spark, path)
    fs.mkdirs(p)


def delete(spark: SparkSession, path: str, recursive: bool = True) -> bool:
    """Delete a file or directory; False when it did not exist."""
    fs, p = _fs_path(spark, path)
    if not fs.exists(p):
        return False
    return bool(fs.delete(p, recursive))


def list_names(spark: SparkSession, path: str) -> list[str]:
    """Child names (not full paths) of a directory; [] when missing."""
    fs, p = _fs_path(spark, path)
    if not fs.exists(p):
        return []
    return [st.getPath().getName() for st in fs.listStatus(p)]


def rename(spark: SparkSession, src: str, dst: str) -> bool:
    """``FileSystem.rename`` (no overwrite); False when dst exists."""
    fs, p_src = _fs_path(spark, src)
    _, p_dst = _fs_path(spark, dst)
    return bool(fs.rename(p_src, p_dst))


def read_text(spark: SparkSession, path: str) -> str | None:
    """Whole small file as str; None when the path does not exist."""
    fs, p = _fs_path(spark, path)
    if not fs.exists(p):
        return None
    stream = fs.open(p)
    try:
        jvm = spark._jvm
        buf = jvm.java.io.ByteArrayOutputStream()
        jvm.org.apache.hadoop.io.IOUtils.copyBytes(stream, buf, 8192, False)
        return bytes(buf.toByteArray()).decode("utf-8")
    finally:
        stream.close()


def _write_bytes(spark: SparkSession, path: str, data: bytes) -> None:
    fs, p = _fs_path(spark, path)
    out = fs.create(p, True)
    try:
        out.write(bytearray(data))
    finally:
        out.close()


def _local_os_path(spark: SparkSession, path: str) -> str | None:
    """The OS-level path when ``path`` resolves to the local filesystem
    (scheme ``file``), else None — the gate for ``os.replace``."""
    fs, p = _fs_path(spark, path)
    qualified = fs.makeQualified(p)
    if qualified.toUri().getScheme() != "file":
        return None
    return qualified.toUri().getPath()


def _hidden_tmp(path: str) -> str:
    """Dot-prefixed sibling temp name: Spark file-stream sources ignore
    hidden files, so a manifest mid-write is invisible to a tailing
    reader — only the renamed final name is ever discovered."""
    head, _, name = path.rpartition("/")
    return f"{head}/.{name}.tmp-{uuid.uuid4().hex[:8]}"


def write_text_once(spark: SparkSession, path: str, text: str) -> bool:
    """Create ``path`` with ``text`` atomically, IFF it does not already
    exist (hidden-temp + rename-no-overwrite). Returns False — leaving
    any existing file untouched — when it does: the idempotent-commit
    contract replayed micro-batches rely on."""
    if exists(spark, path):
        return False
    tmp = _hidden_tmp(path)
    _write_bytes(spark, tmp, text.encode("utf-8"))
    if rename(spark, tmp, path):
        return True
    delete(spark, tmp, recursive=False)
    return False


def write_text_overwrite(spark: SparkSession, path: str, text: str) -> None:
    """Replace ``path`` with ``text``. Local filesystems: ``os.replace``
    (atomic). Remote: temp + delete + rename — see the module note on
    the momentary-missing window readers must tolerate."""
    local = _local_os_path(spark, path)
    if local is not None:
        tmp = _hidden_tmp(local)
        with open(tmp, "w", encoding="utf-8") as fh:
            fh.write(text)
        os.replace(tmp, local)
        return
    tmp = _hidden_tmp(path)
    _write_bytes(spark, tmp, text.encode("utf-8"))
    delete(spark, path, recursive=False)
    if not rename(spark, tmp, path):
        raise OSError(f"rename {tmp} -> {path} failed")
