"""Filesystem abstraction for the staging/publish/manifest path.

The reference delegates durability to the ES cluster; here the commit
protocol (checkpoint.py) has to work wherever the sink lives. Two
implementations of one small surface:

* ``LocalFS`` — os/shutil, for plain paths. Rename is POSIX-atomic.
* ``HadoopFS`` — the JVM Hadoop FileSystem reached through the active
  SparkSession, for any scheme the cluster has a connector for
  (``hdfs://``, ``s3a://``, ``gs://``, ``file://``). Rename is atomic
  on HDFS; on S3/GCS it is copy+delete under the hood — correct but
  not atomic, which is why ``PipelineConfig.sink_format="iceberg"``
  remains the real object-store answer (snapshot commit subsumes the
  rename). The manifest stays valid either way: a torn publish is
  re-done on resume because the route was never recorded committed.

``fs_for(path, spark)`` picks the implementation from the path scheme
so callers never hardcode os.* calls.
"""

from __future__ import annotations

import os
import shutil


class LocalFS:
    """os/shutil-backed filesystem for scheme-less paths."""

    def list_names(self, path: str) -> list[str]:
        return os.listdir(path)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def delete(self, path: str) -> None:
        if os.path.isdir(path):
            shutil.rmtree(path, ignore_errors=True)
        elif os.path.exists(path):
            os.remove(path)

    def makedirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def rename(self, src: str, dst: str) -> None:
        os.replace(src, dst)

    def read_text(self, path: str) -> str:
        with open(path) as f:
            return f.read()

    def write_text_atomic(self, path: str, text: str) -> None:
        self.write_bytes_atomic(path, text.encode("utf-8"))

    def write_bytes_atomic(self, path: str, data: bytes) -> None:
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)


class HadoopFS:
    """JVM Hadoop FileSystem via the SparkSession (py4j).

    One FileSystem instance per (scheme, authority); all paths passed
    to a given instance must share the scheme it was created with.
    """

    def __init__(self, spark, root: str):
        self._jvm = spark._jvm
        self._conf = spark._jsc.hadoopConfiguration()
        self._fs = self._path(root).getFileSystem(self._conf)

    def _path(self, p: str):
        return self._jvm.org.apache.hadoop.fs.Path(p)

    def list_names(self, path: str) -> list[str]:
        return [
            st.getPath().getName() for st in self._fs.listStatus(self._path(path))
        ]

    def exists(self, path: str) -> bool:
        return bool(self._fs.exists(self._path(path)))

    def delete(self, path: str) -> None:
        self._fs.delete(self._path(path), True)

    def makedirs(self, path: str) -> None:
        self._fs.mkdirs(self._path(path))

    def rename(self, src: str, dst: str) -> None:
        if self.exists(dst):
            self.delete(dst)
        if not self._fs.rename(self._path(src), self._path(dst)):
            raise OSError(f"rename failed: {src} -> {dst}")

    def read_text(self, path: str) -> str:
        stream = self._fs.open(self._path(path))
        try:
            return self._jvm.org.apache.commons.io.IOUtils.toString(
                stream, "UTF-8"
            )
        finally:
            stream.close()

    def write_text_atomic(self, path: str, text: str) -> None:
        self.write_bytes_atomic(path, text.encode("utf-8"))

    def write_bytes_atomic(self, path: str, data: bytes) -> None:
        # stage + rename: the closest a generic FS gets to atomic
        tmp = f"{path}.tmp.{os.getpid()}"
        stream = self._fs.create(self._path(tmp), True)
        try:
            stream.write(bytearray(data))
        finally:
            stream.close()
        self.rename(tmp, path)


def fs_for(path: str, spark=None):
    """LocalFS for plain paths; HadoopFS for any scheme:// path."""
    if "://" in path or path.startswith("file:"):
        if spark is None:
            raise ValueError(f"need a SparkSession to reach {path!r}")
        return HadoopFS(spark, path)
    return LocalFS()
