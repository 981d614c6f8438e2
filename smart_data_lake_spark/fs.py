"""Filesystem abstraction for driver-side metadata operations.

The reference routes all driver-side FS work (partition dir listings, atomic
rewrites, schema files) through the Hadoop FileSystem API
(`util/hdfs/HdfsUtil.scala`), so the same DataObject code runs on local
disk, HDFS, or object stores. The PySpark equivalent: a small protocol with
two implementations —

  * LocalFileSystem — os/shutil, used for plain paths (`/...`, `file:`);
  * HadoopFileSystem — the JVM `org.apache.hadoop.fs.FileSystem` reached
    through `spark._jvm`, used for any path with a non-local scheme
    (hdfs:, s3a:, abfss:, gs:, ...). Every operation is a py4j call on
    driver-side metadata — O(files-touched), never O(data), matching the
    reference's usage.

`get_fs(spark, path)` picks the implementation by scheme. DataObjects call
only this protocol for list/exists/delete/move/read-text/write-text, so a
deployment against object storage needs no code change.
"""

from __future__ import annotations

import os
import shutil
from typing import Protocol


class FileSystem(Protocol):
    def exists(self, path: str) -> bool: ...
    def is_dir(self, path: str) -> bool: ...
    def mkdirs(self, path: str) -> None: ...
    def listdir(self, path: str) -> list[str]: ...
    def walk_files(self, path: str) -> list[str]: ...
    def delete(self, path: str, recursive: bool = False) -> None: ...
    def move(self, src: str, dst: str) -> None: ...
    def read_text(self, path: str) -> str: ...
    def write_text(self, path: str, content: str) -> None: ...


class LocalFileSystem:
    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def is_dir(self, path: str) -> bool:
        return os.path.isdir(path)

    def mkdirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def listdir(self, path: str) -> list[str]:
        return sorted(os.listdir(path))

    def walk_files(self, path: str) -> list[str]:
        return sorted(
            os.path.join(root, f) for root, _, files in os.walk(path) for f in files
        )

    def delete(self, path: str, recursive: bool = False) -> None:
        if os.path.isdir(path):
            if recursive:
                shutil.rmtree(path)
            else:
                os.rmdir(path)
        elif os.path.exists(path):
            os.remove(path)

    def move(self, src: str, dst: str) -> None:
        shutil.move(src, dst)

    def read_text(self, path: str) -> str:
        with open(path) as f:
            return f.read()

    def write_text(self, path: str, content: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            f.write(content)


class HadoopFileSystem:
    """Driver-side metadata ops through the JVM Hadoop FileSystem —
    the path's scheme selects the concrete FS (s3a, hdfs, abfss, ...)."""

    def __init__(self, spark, base_path: str) -> None:
        jvm = spark._jvm
        self._jvm = jvm
        self._conf = spark._jsc.hadoopConfiguration()
        self._path_cls = jvm.org.apache.hadoop.fs.Path
        self._fs = self._path_cls(base_path).getFileSystem(self._conf)

    def _p(self, path: str):
        return self._path_cls(path)

    def exists(self, path: str) -> bool:
        return self._fs.exists(self._p(path))

    def is_dir(self, path: str) -> bool:
        return self.exists(path) and self._fs.getFileStatus(self._p(path)).isDirectory()

    def mkdirs(self, path: str) -> None:
        self._fs.mkdirs(self._p(path))

    def listdir(self, path: str) -> list[str]:
        statuses = self._fs.listStatus(self._p(path))
        return sorted(s.getPath().getName() for s in statuses)

    def walk_files(self, path: str) -> list[str]:
        out = []
        it = self._fs.listFiles(self._p(path), True)
        while it.hasNext():
            out.append(it.next().getPath().toString())
        return sorted(out)

    def delete(self, path: str, recursive: bool = False) -> None:
        self._fs.delete(self._p(path), recursive)

    def move(self, src: str, dst: str) -> None:
        if not self._fs.rename(self._p(src), self._p(dst)):
            raise IOError(f"rename failed: {src} -> {dst}")

    def read_text(self, path: str) -> str:
        stream = self._fs.open(self._p(path))
        try:
            reader = self._jvm.java.io.BufferedReader(
                self._jvm.java.io.InputStreamReader(stream, "UTF-8")
            )
            lines = []
            line = reader.readLine()
            while line is not None:
                lines.append(line)
                line = reader.readLine()
            return "\n".join(lines)
        finally:
            stream.close()

    def write_text(self, path: str, content: str) -> None:
        parent = os.path.dirname(path)
        if parent:
            self.mkdirs(parent)
        stream = self._fs.create(self._p(path), True)
        try:
            stream.write(bytearray(content.encode("utf-8")))
        finally:
            stream.close()


# ---- HdfsUtil-analog helpers (util/hdfs/HdfsUtil.scala) -------------------
# Driver-side path utilities shared by compaction, file transfer and
# housekeeping. All are O(files-touched) metadata ops over the FileSystem
# protocol, so they run unchanged against local disk or a Hadoop store.


def touch(fs: FileSystem, path: str) -> None:
    """Create `path` as an empty file (parents included), or refresh its
    modification time when it already exists (HdfsUtil.touchFile). Always a
    METADATA operation — never rewrites content (a data round-trip would be
    O(bytes) and unsafe on binary files; r8 review)."""
    if fs.exists(path):
        if isinstance(fs, HadoopFileSystem):
            import time

            # FileSystem.setTimes(path, mtimeMillis, atimeMillis); -1 keeps atime
            fs._fs.setTimes(fs._p(path), int(time.time() * 1000), -1)
        else:
            os.utime(path)
    else:
        fs.write_text(path, "")


def is_subdirectory(child: str, parent: str) -> bool:
    """True when `child` is STRICTLY below `parent` (HdfsUtil.isSubdirectory:
    a path is not a subdirectory of itself)."""
    c = os.path.normpath(strip_local_scheme(child)).rstrip("/")
    p = os.path.normpath(strip_local_scheme(parent)).rstrip("/")
    if c == p:
        return False
    return c.startswith(p + "/")


def delete_empty_parent_paths(fs: FileSystem, path: str, stop_path: str) -> None:
    """Walk from `path`'s parent up to (exclusive) `stop_path`, removing each
    directory that is empty (HdfsUtil.deleteEmptyParentPath) — used after
    partition deletes so col=val/ chains don't accumulate as husks."""
    current = os.path.dirname(strip_local_scheme(path).rstrip("/"))
    stop = os.path.normpath(strip_local_scheme(stop_path)).rstrip("/")
    while is_subdirectory(current, stop):
        if not fs.exists(current) or fs.listdir(current):
            break
        fs.delete(current, recursive=False)
        current = os.path.dirname(current)


def rename_path(fs: FileSystem, src: str, dst: str) -> None:
    """Strict rename (HdfsUtil.renamePath): raises FileExistsError when the
    target exists instead of clobbering or suffixing — callers that want the
    suffixing behavior use rename_file_handle_already_existing on the
    DataObject."""
    if fs.exists(dst):
        raise FileExistsError(f"rename target already exists: {dst}")
    fs.move(src, dst)


_LOCAL_SCHEMES = ("", "file")


def scheme_of(path: str) -> str:
    head, sep, _ = path.partition("://")
    return head if sep else ""


def get_fs(spark, path: str) -> FileSystem:
    """Scheme-dispatching factory; plain and file: paths use os/shutil,
    anything else goes through the JVM Hadoop FileSystem."""
    if scheme_of(path) in _LOCAL_SCHEMES:
        return LocalFileSystem()
    return HadoopFileSystem(spark, path)


def strip_local_scheme(path: str) -> str:
    return path[len("file://"):] if path.startswith("file://") else path
