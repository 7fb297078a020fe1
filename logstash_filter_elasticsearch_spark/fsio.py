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

    def mtime(self, path: str) -> float:
        """Last-modification time (epoch seconds). For a directory this
        moves whenever a direct child is created/renamed/removed — the
        'recently active' signal the snapshot GC's grace window needs."""
        return os.path.getmtime(path)

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
        self._gw = spark._sc._gateway
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
        """Overwrite-rename WITHOUT a delete-first crash window.

        Primary: ``FileContext.rename(src, dst, Options.Rename.
        OVERWRITE)`` — one FS call that atomically replaces ``dst`` on
        HDFS/file://, so the previous file (e.g. the checkpoint
        manifest) survives a crash at any instant. Fallback for schemes
        with no AbstractFileSystem binding (s3a://, gs://): park the
        old ``dst`` at ``dst.prev`` before renaming the new file into
        place — a crash between the two steps leaves ``dst.prev``,
        which ``Manifest`` loading falls back to, instead of losing
        the file outright.

        Note: overwriting a NON-EMPTY directory still requires the
        caller to delete first (``publish_atomic`` does) — FileContext
        only overwrites files and empty dirs.
        """
        src_p, dst_p = self._path(src), self._path(dst)
        fctx = opts = None
        try:
            Rename = self._jvm.org.apache.hadoop.fs.Options.Rename
            opts = self._gw.new_array(Rename, 1)
            opts[0] = Rename.OVERWRITE
            fctx = self._jvm.org.apache.hadoop.fs.FileContext.getFileContext(
                self._fs.getUri(), self._conf
            )
        except Exception:
            fctx = None  # scheme has no AbstractFileSystem binding
        if fctx is not None:
            fctx.rename(
                self._fs.makeQualified(src_p),
                self._fs.makeQualified(dst_p),
                opts,
            )
            return
        self._rename_via_park(src, dst)

    def mtime(self, path: str) -> float:
        return (
            self._fs.getFileStatus(self._path(path)).getModificationTime()
            / 1000.0
        )

    def _rename_via_park(self, src: str, dst: str) -> None:
        """Two-step overwrite-rename for filesystems without
        FileContext: park old dst at dst.prev, then move src into
        place. Crash between the steps leaves dst.prev intact (the
        Manifest loader falls back to it); stale .prev is only deleted
        once the previous step's survivor exists."""
        if self.exists(dst):
            prev = dst + ".prev"
            self.delete(prev)
            if not self._fs.rename(self._path(dst), self._path(prev)):
                raise OSError(f"rename failed: {dst} -> {prev}")
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
