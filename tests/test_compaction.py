"""Crash-safe compaction protocol (reference: util/misc/CompactionUtil.scala).

Every crash window of the swap is simulated by reproducing the exact on-disk
state a crash at that point leaves behind, then asserting recovery restores
a complete, correct partition.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from smart_data_lake_spark.compaction import (
    COMPACTED,
    COMPACTING,
    MOVING,
    TEMP_DIR,
    compact_partitions,
    recover_interrupted_compaction,
)
from smart_data_lake_spark.dataobjects.file import ParquetFileDataObject
from smart_data_lake_spark.partitions import PartitionValues
from smart_data_lake_spark.save_modes import SaveMode


@pytest.fixture()
def fragmented(spark, tmp_path):
    """A partitioned parquet object where p=a holds many small files."""
    do = ParquetFileDataObject(id="cp", path=str(tmp_path / "t"), partitions=["p"])
    for i in range(5):  # five appends -> >=5 files in each partition dir
        df = spark.createDataFrame([(i * 2, "a"), (i * 2 + 1, "b")], "id int, p string")
        do.write_dataframe(df, save_mode=SaveMode.APPEND)
    return do


def _files(do, part):
    d = os.path.join(do.path, part)
    return [f for f in os.listdir(d) if not f.startswith(("_", "."))]


def test_compaction_reduces_files_preserves_rows(spark, fragmented):
    do = fragmented
    before = {r["id"] for r in do.get_dataframe(spark).collect()}
    assert len(_files(do, "p=a")) >= 5
    m = compact_partitions(spark, do, [PartitionValues.of({"p": "a"})], n_files=1)
    assert m["partitions_compacted"] == 1
    assert len(_files(do, "p=a")) == 1
    assert os.path.exists(os.path.join(do.path, "p=a", COMPACTED))
    assert len(_files(do, "p=b")) >= 5  # untouched
    after = {r["id"] for r in do.get_dataframe(spark).collect()}
    assert after == before
    assert not os.path.exists(os.path.join(do.path, COMPACTING))  # lock released
    assert not os.path.exists(os.path.join(do.path, TEMP_DIR))


def test_compaction_idempotent_skips_marked(spark, fragmented):
    do = fragmented
    pvs = [PartitionValues.of({"p": "a"}), PartitionValues.of({"p": "b"})]
    m1 = compact_partitions(spark, do, pvs, n_files=1)
    assert m1["partitions_compacted"] == 2
    m2 = compact_partitions(spark, do, pvs, n_files=1)
    assert m2["partitions_compacted"] == 0 and m2["partitions_skipped"] == 2


def test_fresh_lock_rejects_concurrent_run(spark, fragmented):
    do = fragmented
    with open(os.path.join(do.path, COMPACTING), "w"):
        pass
    with pytest.raises(RuntimeError, match="already running"):
        compact_partitions(spark, do, [PartitionValues.of({"p": "a"})])
    os.remove(os.path.join(do.path, COMPACTING))


def test_recovery_after_crash_before_marker_loses_nothing(spark, fragmented):
    """Crash after writing SOME temp data but before _SDL_MOVING: the temp
    garbage is discarded, the original partition is untouched."""
    do = fragmented
    before = sorted(r["id"] for r in do.get_dataframe(spark).collect())
    tmp = os.path.join(do.path, TEMP_DIR, "p=a")
    os.makedirs(tmp)
    with open(os.path.join(tmp, "sdlc-dead-00000.parquet"), "wb") as fh:
        fh.write(b"partial garbage")  # no MOVING marker -> not authoritative
    assert recover_interrupted_compaction(do) == []
    assert not os.path.isdir(os.path.join(do.path, TEMP_DIR))
    assert sorted(r["id"] for r in do.get_dataframe(spark).collect()) == before


def test_recovery_after_crash_mid_swap(spark, fragmented):
    """Crash AFTER _SDL_MOVING with files partially moved: recovery must
    finish the move, drop the old small files, and end bit-correct."""
    do = fragmented
    before = sorted(
        r["id"] for r in do.get_dataframe(spark, [PartitionValues.of({"p": "a"})]).collect()
    )
    # build the authoritative temp copy exactly as step 1-2 would
    import copy as _copy

    temp_root = os.path.join(do.path, TEMP_DIR)
    temp_do = _copy.copy(do)
    temp_do.path = temp_root
    df = do.get_dataframe(spark, [PartitionValues.of({"p": "a"})]).repartition(1)
    temp_do.write_dataframe(df, [PartitionValues.of({"p": "a"})], SaveMode.APPEND)
    tmp_part = os.path.join(temp_root, "p=a")
    prefix = "sdlc-cafe0001"
    files = sorted(f for f in os.listdir(tmp_part) if not f.startswith(("_", ".")))
    for i, f in enumerate(files):
        os.replace(os.path.join(tmp_part, f), os.path.join(tmp_part, f"{prefix}-{i:05d}.parquet"))
    import json as _json

    old_files = _files(do, "p=a")
    with open(os.path.join(tmp_part, MOVING), "w") as fh:
        fh.write(_json.dumps({"prefix": prefix, "old_files": old_files}))
    # simulate a partial move: first prefixed file already at the target
    moved = sorted(os.listdir(tmp_part))[0]
    if moved.startswith(prefix):
        os.replace(os.path.join(tmp_part, moved), os.path.join(do.path, "p=a", moved))
    recovered = recover_interrupted_compaction(do)
    assert recovered == ["p=a"]
    assert len(_files(do, "p=a")) == 1  # compacted file only, old ones gone
    assert all(f.startswith(prefix) for f in _files(do, "p=a"))
    after = sorted(
        r["id"] for r in do.get_dataframe(spark, [PartitionValues.of({"p": "a"})]).collect()
    )
    assert after == before
    assert os.path.exists(os.path.join(do.path, "p=a", COMPACTED))


def test_housekeeping_mode_uses_crash_safe_path(spark, tmp_path):
    from smart_data_lake_spark.housekeeping import PartitionArchiveCompactionMode

    do = ParquetFileDataObject(id="hk", path=str(tmp_path / "hk"), partitions=["p"])
    for i in range(4):
        do.write_dataframe(
            spark.createDataFrame([(i, "x")], "id int, p string"), save_mode=SaveMode.APPEND
        )
    mode = PartitionArchiveCompactionMode(compact_partition_expression="true", n_files=1)
    m = mode.post_write(spark, do)
    assert m["partitions_compacted"] == 1
    assert len(_files(do, "p=x")) == 1
    assert os.path.exists(os.path.join(do.path, "p=x", COMPACTED))


def test_recovery_ignores_half_written_marker(spark, fragmented):
    """r6 second-review regression: a marker that crashed mid-write (empty /
    truncated JSON) must NOT become authoritative — the temp copy is
    discarded and the original partition survives byte-for-byte."""
    do = fragmented
    before = sorted(r["id"] for r in do.get_dataframe(spark).collect())
    tmp = os.path.join(do.path, TEMP_DIR, "p=a")
    os.makedirs(tmp)
    with open(os.path.join(tmp, "sdlc-dead-00000.parquet"), "wb") as fh:
        fh.write(b"complete-looking data")
    with open(os.path.join(tmp, MOVING), "w") as fh:
        fh.write("")  # empty marker = crash mid-write
    assert recover_interrupted_compaction(do) == []
    assert sorted(r["id"] for r in do.get_dataframe(spark).collect()) == before
    assert not os.path.isdir(os.path.join(do.path, TEMP_DIR))


def test_concurrent_append_survives_compaction(spark, fragmented):
    """r6 second-review regression: files appended by another writer between
    the compaction's read and its cleanup keep their rows (snapshot deletes,
    never delete-everything-unprefixed)."""
    import copy as _copy
    import json as _json

    do = fragmented
    pv = PartitionValues.of({"p": "a"})
    before = sorted(r["id"] for r in do.get_dataframe(spark, [pv]).collect())
    # stage the compacted copy (steps 1-2) with the old-file snapshot
    temp_root = os.path.join(do.path, TEMP_DIR)
    temp_do = _copy.copy(do)
    temp_do.path = temp_root
    old_files = _files(do, "p=a")
    temp_do.write_dataframe(do.get_dataframe(spark, [pv]).repartition(1), [pv], SaveMode.APPEND)
    tmp_part = os.path.join(temp_root, "p=a")
    prefix = "sdlc-beef0001"
    for i, f in enumerate(sorted(os.listdir(tmp_part))):
        if not f.startswith(("_", ".")):
            os.replace(os.path.join(tmp_part, f), os.path.join(tmp_part, f"{prefix}-{i:05d}.parquet"))
    with open(os.path.join(tmp_part, MOVING), "w") as fh:
        fh.write(_json.dumps({"prefix": prefix, "old_files": old_files}))
    # ANOTHER WRITER appends between read and swap
    do.write_dataframe(
        spark.createDataFrame([(999, "a")], "id int, p string"), save_mode=SaveMode.APPEND
    )
    recovered = recover_interrupted_compaction(do)
    assert recovered == ["p=a"]
    after = sorted(r["id"] for r in do.get_dataframe(spark, [pv]).collect())
    assert after == sorted(before + [999])  # appended row survived


def test_append_in_snapshot_to_read_window_not_duplicated(spark, fragmented):
    """r7 ADVICE fix: the rewrite reads EXACTLY the snapshotted files, so a
    file appended after the snapshot but before the Spark read is neither
    compacted (no duplicate rows) nor deleted (rows survive)."""
    do = fragmented
    pv = PartitionValues.of({"p": "a"})
    before = sorted(r["id"] for r in do.get_dataframe(spark, [pv]).collect())
    real_getter = do.get_dataframe_for_files
    calls: list[list[str]] = []

    def racing_getter(spark_, files):
        # simulate a writer landing a file in the exact snapshot-to-read gap
        do.write_dataframe(
            spark.createDataFrame([(777, "a")], "id int, p string"),
            save_mode=SaveMode.APPEND,
        )
        calls.append(sorted(os.path.basename(f) for f in files))
        return real_getter(spark_, files)

    do.get_dataframe_for_files = racing_getter
    try:
        m = compact_partitions(spark, do, [pv], n_files=1)
    finally:
        del do.get_dataframe_for_files
    assert m["partitions_compacted"] == 1 and calls  # explicit-file path used
    after = sorted(r["id"] for r in do.get_dataframe(spark, [pv]).collect())
    assert after == sorted(before + [777])  # exactly once: no dup, no loss


def test_get_dataframe_for_files_none_for_custom_codec(tmp_path):
    """Objects overriding get_dataframe (custom codec fallbacks) opt out of
    the explicit-file read and compaction falls back to the partition read."""
    from smart_data_lake_spark.dataobjects.file import AvroFileDataObject

    do = AvroFileDataObject(id="av", path=str(tmp_path / "av"), partitions=["p"])
    assert do.get_dataframe_for_files(None, ["x"]) is None


def test_partial_partition_values_rejected(spark, tmp_path):
    from smart_data_lake_spark.config import ConfigError

    do = ParquetFileDataObject(id="c2", path=str(tmp_path / "t2"), partitions=["p", "q"])
    do.write_dataframe(
        spark.createDataFrame([(1, "a", "x")], "id int, p string, q string"),
        save_mode=SaveMode.APPEND,
    )
    with pytest.raises(ConfigError, match="complete partition values"):
        compact_partitions(spark, do, [PartitionValues.of({"p": "a"})])


def test_appends_requalify_a_compacted_partition(spark, fragmented):
    """r6 second-review regression: _SDL_COMPACTED must not make compaction
    one-shot — new small files re-qualify the partition."""
    do = fragmented
    pvs = [PartitionValues.of({"p": "a"})]
    assert compact_partitions(spark, do, pvs, n_files=1)["partitions_compacted"] == 1
    assert compact_partitions(spark, do, pvs, n_files=1)["partitions_skipped"] == 1
    do.write_dataframe(
        spark.createDataFrame([(100, "a")], "id int, p string"), save_mode=SaveMode.APPEND
    )
    m = compact_partitions(spark, do, pvs, n_files=1)
    assert m["partitions_compacted"] == 1  # re-qualified by the append
    assert len(_files(do, "p=a")) == 1
    ids = sorted(r["id"] for r in do.get_dataframe(spark).collect())
    assert 100 in ids
