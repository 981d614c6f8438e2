"""Crash-safe small-file compaction for partitioned file data objects.

Reference: ``util/misc/CompactionUtil.scala`` (compactHadoopStandardPartitions)
— the part of housekeeping that must survive a mid-operation crash, because
it deletes data it has just rewritten. Marker files reproduce the
reference's protocol (``_SDL_COMPACTING`` lock, ``_SDL_MOVING`` per-partition
completion marker, ``_SDL_COMPACTED`` done marker, ``_tempSdlCompacting``
staging tree), strengthened in four ways (r6 review findings):

* markers are written ATOMICALLY (temp file + ``os.replace``) and recovery
  ignores markers whose JSON payload is unreadable — a crash mid-marker-write
  means the swap never started, so the original partition is authoritative;
* the ``_SDL_MOVING`` payload records this run's unique file prefix AND the
  snapshot of pre-existing data files; the rewrite READS exactly that
  snapshot (``get_dataframe_for_files``) and the cleanup step deletes
  exactly the same set — a file appended by another writer at ANY point
  after the snapshot survives untouched, with its rows, never duplicated.
  (Data objects whose codec can't read an explicit file list fall back to a
  whole-partition read; for those only, an append in the snapshot-to-read
  window would be duplicated — covered by the schedule-apart contract.);
* the root lock is acquired with ``open(..., 'x')`` — atomic, no
  check-then-create race between two schedulers;
* ``_SDL_COMPACTED`` does not make a partition one-shot: a partition is
  skipped only while its data files are exactly the compacted set; new
  appends re-qualify it automatically.

Swap steps (each idempotent, re-runnable from the marker):
1. rewrite the partition into the temp tree, rename data files to the run
   prefix; 2. atomically write ``_SDL_MOVING`` (prefix + old-file snapshot)
   — from here the compacted copy is authoritative; 3. move prefixed files
   into the live partition (unique names coexist with old files); 4. write
   ``_SDL_COMPACTED``; 5. delete the snapshotted old files; 6. remove the
   moving marker.

Concurrency contract (same as the reference): the lock excludes OTHER
COMPACTIONS; writers appending to a partition mid-compaction keep their
files and rows (snapshot deletes), but should still be scheduled apart.
Scale note: each partition is one bounded Spark job; bookkeeping is pure
metadata.
"""

from __future__ import annotations

import copy
import json
import logging
import os
import shutil
import time
from typing import Any

from pyspark.sql import SparkSession

from smart_data_lake_spark.config import ConfigError
from smart_data_lake_spark.partitions import PartitionValues
from smart_data_lake_spark.save_modes import SaveMode

logger = logging.getLogger(__name__)

COMPACTING = "_SDL_COMPACTING"
MOVING = "_SDL_MOVING"
COMPACTED = "_SDL_COMPACTED"
TEMP_DIR = "_tempSdlCompacting"
LOCK_MAX_AGE_SEC = 12 * 60 * 60


def _atomic_write(path: str, content: str) -> None:
    """Temp-file + rename so the marker either exists complete or not at all
    (a partially flushed marker must never become authoritative)."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(content)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, path)


def _read_marker(path: str) -> dict | None:
    try:
        with open(path) as fh:
            payload = json.loads(fh.read())
        if payload.get("prefix"):
            return payload
    except (OSError, ValueError):
        pass
    return None


def _data_files(path: str) -> list[str]:
    if not os.path.isdir(path):
        return []
    return [
        f
        for f in os.listdir(path)
        if not f.startswith(("_", ".")) and os.path.isfile(os.path.join(path, f))
    ]


def _temp_clone(data_object, temp_path: str):
    """Shallow clone of the data object pointing at the temp tree — reuses
    the object's own format/codec write path (parquet, csv, avro fallback…)
    without duplicating any writer logic."""
    clone = copy.copy(data_object)
    clone.path = temp_path
    return clone


def _finish_swap(root: str, temp_root: str, rel: str, marker: dict) -> None:
    """Steps 3-6 for one partition; every step is idempotent, so this is
    both the normal path and the recovery path."""
    prefix = marker["prefix"]
    old_files = set(marker.get("old_files", []))
    tmp_part = os.path.join(temp_root, rel)
    target = os.path.join(root, rel)
    os.makedirs(target, exist_ok=True)
    for f in _data_files(tmp_part):  # 3. move remaining prefixed files
        if f.startswith(prefix):
            os.replace(os.path.join(tmp_part, f), os.path.join(target, f))
    _atomic_write(os.path.join(target, COMPACTED), json.dumps({"prefix": prefix}))  # 4.
    for f in _data_files(target):  # 5. drop exactly the files we replaced
        if f in old_files:
            os.remove(os.path.join(target, f))
    moving = os.path.join(tmp_part, MOVING)
    if os.path.exists(moving):  # 6.
        os.remove(moving)


def recover_interrupted_compaction(data_object) -> list[str]:
    """Finish swaps an earlier crashed run left behind: every temp partition
    with a VALID ``_SDL_MOVING`` marker holds (or already moved) a complete
    compacted copy — re-run the idempotent swap. Temp data without a valid
    marker is pre-marker garbage (the original partition is untouched) and
    is discarded. Returns recovered partition dirs."""
    root = data_object.path
    temp_root = os.path.join(root, TEMP_DIR)
    recovered: list[str] = []
    if not os.path.isdir(temp_root):
        return recovered
    for dirpath, _dirs, files in os.walk(temp_root):
        if MOVING not in files:
            continue
        rel = os.path.relpath(dirpath, temp_root)
        marker = _read_marker(os.path.join(dirpath, MOVING))
        if marker is None:
            logger.warning(
                "(%s) discarding temp partition %s: moving marker unreadable "
                "(crash mid-marker-write; original partition is intact)",
                getattr(data_object, "id", "?"),
                rel,
            )
            continue
        logger.warning(
            "(%s) recovering compacted partition %s from a crashed compaction",
            getattr(data_object, "id", "?"),
            rel,
        )
        _finish_swap(root, temp_root, rel, marker)
        recovered.append(rel)
    shutil.rmtree(temp_root, ignore_errors=True)
    return recovered


def _already_compact(part_dir: str) -> bool:
    """A partition is skipped only while its data files are exactly the set
    a prior compaction produced — new appends re-qualify it (the reference's
    bare done-marker would make compaction one-shot per partition)."""
    marker = _read_marker(os.path.join(part_dir, COMPACTED))
    if marker is None:
        return False
    files = _data_files(part_dir)
    return bool(files) and all(f.startswith(marker["prefix"]) for f in files)


def _acquire_lock(data_object, lock: str) -> None:
    """Atomic create (open 'x'); a fresh lock fails fast, a stale one (>12 h
    — the reference's crashed-run heuristic) is broken and retaken."""
    for attempt in (1, 2):
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.close(fd)
            return
        except FileExistsError:
            try:
                fresh = os.path.getmtime(lock) > time.time() - LOCK_MAX_AGE_SEC
            except OSError:
                continue  # lock vanished between open and stat — retry
            if fresh:
                raise RuntimeError(
                    f"({data_object.id}) compaction already running: {lock} younger than "
                    "12h — make sure no other compaction is active, then clean up the file"
                )
            logger.warning(
                "(%s) %s older than 12h — last compaction crashed; breaking the lock",
                data_object.id,
                COMPACTING,
            )
            try:
                os.remove(lock)
            except OSError:
                pass
    raise RuntimeError(f"({data_object.id}) could not acquire compaction lock {lock}")


def compact_partitions(
    spark: SparkSession,
    data_object,
    partition_values: list[PartitionValues],
    n_files: int = 1,
) -> dict[str, Any]:
    """Compact each partition's files into ``n_files`` with the crash-safe
    marker protocol. Partition values must be COMPLETE (every partition
    column bound — a partial spec would treat child partition directories
    as data files). Returns metrics."""
    assert data_object.partitions, f"({data_object.id}) compaction needs a partitioned DataObject"
    for pv in partition_values:
        if set(pv.keys) != set(data_object.partitions):
            raise ConfigError(
                f"({data_object.id}) compaction needs complete partition values over "
                f"{data_object.partitions}, got keys {list(pv.keys)}"
            )
    root = data_object.path
    lock = os.path.join(root, COMPACTING)
    os.makedirs(root, exist_ok=True)
    _acquire_lock(data_object, lock)
    metrics = {"partitions_recovered": 0, "partitions_compacted": 0, "partitions_skipped": 0}
    try:
        metrics["partitions_recovered"] = len(recover_interrupted_compaction(data_object))
        temp_root = os.path.join(root, TEMP_DIR)
        todo = []
        for pv in partition_values:
            if _already_compact(os.path.join(root, pv.hive_path())):
                metrics["partitions_skipped"] += 1
            else:
                todo.append(pv)
        if todo:
            import secrets

            temp_do = _temp_clone(data_object, temp_root)
            for pv in todo:
                prefix = f"sdlc-{secrets.token_hex(4)}"
                rel = pv.hive_path()
                tmp_part = os.path.join(temp_root, rel)
                old_files = _data_files(os.path.join(root, rel))
                if not old_files:
                    metrics["partitions_skipped"] += 1
                    continue
                # 1. rewrite EXACTLY the snapshotted files into the temp tree
                # (snapshot-consistent read: a file appended by another writer
                # after the snapshot is neither rewritten nor deleted), then
                # stamp the files with this run's unique prefix. Data objects
                # whose codec can't read an explicit file list fall back to a
                # whole-partition read — for those the snapshot-to-read window
                # is covered by the schedule-apart contract (see module doc).
                df = None
                getter = getattr(data_object, "get_dataframe_for_files", None)
                if getter is not None:
                    part_dir = os.path.join(root, rel)
                    df = getter(spark, [os.path.join(part_dir, f) for f in old_files])
                if df is None:
                    df = data_object.get_dataframe(spark, [pv])
                df = df.repartition(n_files)
                temp_do.write_dataframe(df, [pv], SaveMode.APPEND)
                for i, f in enumerate(sorted(_data_files(tmp_part))):
                    ext = f.rsplit(".", 1)[-1] if "." in f else "bin"
                    os.replace(
                        os.path.join(tmp_part, f),
                        os.path.join(tmp_part, f"{prefix}-{i:05d}.{ext}"),
                    )
                marker = {"prefix": prefix, "old_files": old_files}
                _atomic_write(os.path.join(tmp_part, MOVING), json.dumps(marker))  # 2.
                _finish_swap(root, temp_root, rel, marker)  # 3-6.
                metrics["partitions_compacted"] += 1
        shutil.rmtree(temp_root, ignore_errors=True)
    finally:
        if os.path.exists(lock):
            os.remove(lock)
    return metrics
