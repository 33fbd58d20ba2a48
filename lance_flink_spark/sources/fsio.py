"""Filesystem abstraction for manifest/catalog metadata I/O.

Data files (parquet fragments) always go through Spark's own
Hadoop-backed readers/writers, so every URI scheme Spark supports
(``file:``, ``hdfs:``, ``s3a:``, ...) already works for fragment data.
This module gives the *metadata* layer — JSON manifests, catalog
markers — the same reach: scheme-less paths use plain ``os`` I/O, and
any URI with a scheme is routed through the JVM Hadoop FileSystem that
is already in-process (``spark._jvm``). No boto/fsspec needed; the
metadata uses the exact FileSystem implementation + credential chain
Spark itself resolves for the scheme. Parity with the reference's
object-store catalogs (test/.../LanceCatalogS3Test.java).

Atomicity: local commits use write-tmp + ``os.replace`` (atomic).
Hadoop commits use write-tmp + ``FileContext.rename(OVERWRITE)`` —
atomic overwrite on HDFS (plain ``FileSystem.rename`` can't replace an
existing file, and delete-then-rename opens a window where the
manifest does not exist). Filesystems without an AbstractFileSystem
binding fall back to delete+rename; on S3-like stores rename is
copy+delete anyway — the same manifest-swap caveat Lance/Iceberg
document (single-writer or an external lock service for concurrent
committers).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from urllib.parse import urlsplit


def is_remote(path: str) -> bool:
    """True when the path carries a URI scheme and must go through the
    JVM Hadoop FileSystem (``file://`` included — Hadoop handles it)."""
    return urlsplit(path).scheme != ""


def _jfs(path: str):
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError(
            f"path {path!r} has a URI scheme: metadata I/O goes through the "
            "JVM Hadoop FileSystem, which needs an active SparkSession"
        )
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath, jvm


def exists(path: str) -> bool:
    if not is_remote(path):
        return os.path.exists(path)
    fs, p, _ = _jfs(path)
    return fs.exists(p)


def read_bytes(path: str) -> bytes:
    if not is_remote(path):
        with open(path, "rb") as f:
            return f.read()
    fs, p, jvm = _jfs(path)
    stream = fs.open(p)
    try:
        data = jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
    finally:
        stream.close()
    return bytes(data)


def read_text(path: str) -> str:
    return read_bytes(path).decode("utf-8")


def _overwrite_rename(jvm, fs, tmp, p, path: str) -> None:
    """Swap ``tmp`` into place over a possibly-existing ``p``.

    FileContext.rename with Options.Rename.OVERWRITE is the atomic
    overwrite primitive on HDFS-like filesystems. ONLY schemes without
    an AbstractFileSystem binding (raw s3a without fs.AbstractFileSystem
    config — UnsupportedFileSystemException) fall back to
    delete+rename, a non-atomic window matching those stores' native
    rename semantics anyway. Every other failure (safemode, lease,
    network) re-raises: falling back there would delete the live file
    and risk losing it to the same transient fault."""
    from py4j.protocol import Py4JJavaError
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError("fsio requires an active SparkSession for remote paths")
    try:
        gw = spark.sparkContext._gateway
        fc = jvm.org.apache.hadoop.fs.FileContext.getFileContext(
            fs.getUri(), spark._jsc.hadoopConfiguration()
        )
        opts = gw.new_array(jvm.org.apache.hadoop.fs.Options.Rename, 1)
        opts[0] = jvm.org.apache.hadoop.fs.Options.Rename.OVERWRITE
        fc.rename(tmp, p, opts)
        return
    except Py4JJavaError as ex:
        if "UnsupportedFileSystemException" not in str(ex.java_exception):
            raise  # transient HDFS fault: do NOT delete the live file
    if fs.exists(p):
        fs.delete(p, False)
    if not fs.rename(tmp, p):
        raise OSError(f"rename {tmp} -> {path} failed")


def write_bytes_atomic(path: str, data: bytes) -> None:
    """Commit ``data`` to ``path`` via tmp-file + rename (see module
    docstring for the per-FS atomicity contract)."""
    if not is_remote(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
        return
    fs, p, jvm = _jfs(path)
    tmp = jvm.org.apache.hadoop.fs.Path(path + f".tmp.{uuid.uuid4().hex}")
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(data))
    finally:
        out.close()
    _overwrite_rename(jvm, fs, tmp, p, path)


def write_text_atomic(path: str, text: str) -> None:
    write_bytes_atomic(path, text.encode("utf-8"))


def read_json(path: str) -> dict:
    return json.loads(read_text(path))


def write_json_atomic(path: str, obj: dict) -> None:
    write_text_atomic(path, json.dumps(obj))


def makedirs(path: str) -> None:
    if not is_remote(path):
        os.makedirs(path, exist_ok=True)
        return
    fs, p, _ = _jfs(path)
    fs.mkdirs(p)


def listdir(path: str) -> list[str]:
    if not is_remote(path):
        return os.listdir(path)
    fs, p, _ = _jfs(path)
    return [st.getPath().getName() for st in fs.listStatus(p)]


def file_size(path: str) -> int:
    """Size in bytes of a single file (compaction bin-packing input)."""
    if not is_remote(path):
        return os.path.getsize(path)
    fs, p, _ = _jfs(path)
    return int(fs.getFileStatus(p).getLen())


def mtime(path: str) -> float:
    """Last-modified time in epoch seconds (vacuum's orphan age guard)."""
    if not is_remote(path):
        return os.path.getmtime(path)
    fs, p, _ = _jfs(path)
    return fs.getFileStatus(p).getModificationTime() / 1000.0


def delete(path: str, recursive: bool = True) -> None:
    if not is_remote(path):
        if os.path.isdir(path) and recursive:
            shutil.rmtree(path)
        elif os.path.exists(path):
            os.remove(path)
        return
    fs, p, _ = _jfs(path)
    fs.delete(p, recursive)


def rename(src: str, dst: str) -> None:
    if not is_remote(src):
        os.rename(src, dst)
        return
    fs, p, jvm = _jfs(src)
    if not fs.rename(p, jvm.org.apache.hadoop.fs.Path(dst)):
        raise OSError(f"rename {src} -> {dst} failed")


def join(path: str, *parts: str) -> str:
    """Path join that works for both local paths and URIs."""
    return "/".join([path.rstrip("/"), *parts])
