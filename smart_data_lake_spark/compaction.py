"""Crash-safe small-file compaction for partitioned file data objects.

Reference: ``util/misc/CompactionUtil.scala`` (compactHadoopStandardPartitions)
— the part of housekeeping that must survive a mid-operation crash, because
it deletes data it has just rewritten. Marker files reproduce the
reference's protocol (``_SDL_COMPACTING`` lock, ``_SDL_MOVING`` per-partition
completion marker, ``_SDL_COMPACTED`` done marker, ``_tempSdlCompacting``
staging tree), with one strengthening: compacted files carry a unique
per-run prefix recorded INSIDE the ``_SDL_MOVING`` marker, which makes every
step of the swap idempotent —

1. rewrite the partition into the temp tree, rename its data files to the
   run prefix;
2. touch ``_SDL_MOVING`` (content = prefix). From here the compacted copy is
   authoritative and recoverable;
3. move prefixed files into the live partition (unique names — they coexist
   with the old small files, re-running a half-done move just moves the
   remainder);
4. touch ``_SDL_COMPACTED``;
5. delete old data files (those NOT carrying the prefix);
6. delete the moving marker.

A crash between any two steps is repaired by ``recover_interrupted_
compaction`` re-running from step 3 — each step is a no-op if already done.
Before step 2 the original partition is untouched and temp garbage is simply
discarded.

Scale note: each partition is one bounded Spark job (`repartition(n_files)`
of one partition's rows); the protocol's bookkeeping is pure metadata.
"""

from __future__ import annotations

import copy
import logging
import os
import shutil
import time
from typing import Any

from pyspark.sql import SparkSession

from smart_data_lake_spark.partitions import PartitionValues
from smart_data_lake_spark.save_modes import SaveMode

logger = logging.getLogger(__name__)

COMPACTING = "_SDL_COMPACTING"
MOVING = "_SDL_MOVING"
COMPACTED = "_SDL_COMPACTED"
TEMP_DIR = "_tempSdlCompacting"
LOCK_MAX_AGE_SEC = 12 * 60 * 60


def _touch(path: str, content: str = "") -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as fh:
        fh.write(content)


def _data_files(path: str) -> list[str]:
    if not os.path.isdir(path):
        return []
    return [f for f in os.listdir(path) if not f.startswith(("_", "."))]


def _temp_clone(data_object, temp_path: str):
    """Shallow clone of the data object pointing at the temp tree — reuses
    the object's own format/codec write path (parquet, csv, avro fallback…)
    without duplicating any writer logic."""
    clone = copy.copy(data_object)
    clone.path = temp_path
    return clone


def _finish_swap(root: str, temp_root: str, rel: str, prefix: str) -> None:
    """Steps 3-6 for one partition; every step is idempotent, so this is
    both the normal path and the recovery path."""
    tmp_part = os.path.join(temp_root, rel)
    target = os.path.join(root, rel)
    os.makedirs(target, exist_ok=True)
    for f in _data_files(tmp_part):  # 3. move remaining prefixed files
        if f.startswith(prefix):
            os.replace(os.path.join(tmp_part, f), os.path.join(target, f))
    _touch(os.path.join(target, COMPACTED), prefix)  # 4.
    for f in _data_files(target):  # 5. drop the old small files
        if not f.startswith(prefix):
            os.remove(os.path.join(target, f))
    moving = os.path.join(tmp_part, MOVING)
    if os.path.exists(moving):  # 6.
        os.remove(moving)


def recover_interrupted_compaction(data_object) -> list[str]:
    """Finish swaps an earlier crashed run left behind: every temp partition
    marked ``_SDL_MOVING`` holds (or already moved) a complete compacted
    copy — re-run the idempotent swap. Returns recovered partition dirs."""
    root = data_object.path
    temp_root = os.path.join(root, TEMP_DIR)
    recovered: list[str] = []
    if not os.path.isdir(temp_root):
        return recovered
    for dirpath, _dirs, files in os.walk(temp_root):
        if MOVING not in files:
            continue
        rel = os.path.relpath(dirpath, temp_root)
        with open(os.path.join(dirpath, MOVING)) as fh:
            prefix = fh.read().strip()
        logger.warning(
            "(%s) recovering compacted partition %s from a crashed compaction",
            getattr(data_object, "id", "?"),
            rel,
        )
        _finish_swap(root, temp_root, rel, prefix)
        recovered.append(rel)
    shutil.rmtree(temp_root, ignore_errors=True)
    return recovered


def compact_partitions(
    spark: SparkSession,
    data_object,
    partition_values: list[PartitionValues],
    n_files: int = 1,
) -> dict[str, Any]:
    """Compact each partition's files into ``n_files`` with the crash-safe
    marker protocol. Partitions already carrying ``_SDL_COMPACTED`` are
    skipped (idempotent re-runs). Returns metrics."""
    import secrets

    assert data_object.partitions, f"({data_object.id}) compaction needs a partitioned DataObject"
    for pv in partition_values:
        assert set(pv.keys) <= set(data_object.partitions), (
            f"({data_object.id}) partition keys {pv.keys} not in {data_object.partitions}"
        )
    root = data_object.path
    lock = os.path.join(root, COMPACTING)
    if os.path.exists(lock):
        if os.path.getmtime(lock) > time.time() - LOCK_MAX_AGE_SEC:
            raise RuntimeError(
                f"({data_object.id}) compaction already running: {lock} younger than 12h — "
                "make sure no other compaction is active, then clean up the file"
            )
        logger.warning("(%s) %s older than 12h — last compaction crashed", data_object.id, COMPACTING)
    _touch(lock)
    metrics = {"partitions_recovered": 0, "partitions_compacted": 0, "partitions_skipped": 0}
    try:
        metrics["partitions_recovered"] = len(recover_interrupted_compaction(data_object))
        temp_root = os.path.join(root, TEMP_DIR)
        todo = []
        for pv in partition_values:
            if os.path.exists(os.path.join(root, pv.hive_path(), COMPACTED)):
                metrics["partitions_skipped"] += 1
            else:
                todo.append(pv)
        if todo:
            temp_do = _temp_clone(data_object, temp_root)
            for pv in todo:
                prefix = f"sdlc-{secrets.token_hex(4)}"
                rel = pv.hive_path()
                tmp_part = os.path.join(temp_root, rel)
                # 1. rewrite the partition's rows into the temp tree, then
                # stamp the files with this run's unique prefix
                df = data_object.get_dataframe(spark, [pv]).repartition(n_files)
                temp_do.write_dataframe(df, [pv], SaveMode.APPEND)
                for i, f in enumerate(sorted(_data_files(tmp_part))):
                    ext = f.rsplit(".", 1)[-1] if "." in f else "bin"
                    os.replace(
                        os.path.join(tmp_part, f),
                        os.path.join(tmp_part, f"{prefix}-{i:05d}.{ext}"),
                    )
                _touch(os.path.join(tmp_part, MOVING), prefix)  # 2. authoritative
                _finish_swap(root, temp_root, rel, prefix)  # 3-6.
                metrics["partitions_compacted"] += 1
        shutil.rmtree(temp_root, ignore_errors=True)
    finally:
        if os.path.exists(lock):
            os.remove(lock)
    return metrics
