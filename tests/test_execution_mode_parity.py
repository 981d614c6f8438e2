"""ExecutionModeTest.scala scenario parity — all 24 reference scenarios.

Mirrors the reference fixture (ExecutionModeTest.scala:40-88): `src`
partitioned by lastname holding doe(rating 5) + einstein(rating 2); `tgt1`
empty; `tgt2` already containing the einstein partition. Mode-level tests
call `mode.apply(...)` directly, like the reference calls
`executionMode.apply`; where the reference asserts
NoDataToProcessWarning we assert `result.no_data` (our skip signal — the
action layer converts it to SKIPPED, covered by
test_modes_and_quality/test_dag_parity e2e tests). Scenario order follows
the reference file; archive e2e scenarios 21-23 live in
test_dag_parity.test_file_move_archive_relative_and_inside_partition.
"""

import os

import pytest
from pyspark.sql import Row

from smart_data_lake_spark.config import InstanceRegistry
from smart_data_lake_spark.dataobjects import MockDataObject, ParquetFileDataObject
from smart_data_lake_spark.execution_modes import (
    CustomPartitionMode,
    DataFrameIncrementalMode,
    FileIncrementalMoveMode,
    PartitionDiffMode,
)
from smart_data_lake_spark.partitions import PartitionValues

DOE = PartitionValues.of({"lastname": "doe"})
EINSTEIN = PartitionValues.of({"lastname": "einstein"})


@pytest.fixture()
def fixture_dos(spark, tmp_path):
    """src{doe,einstein} / tgt1 empty / tgt2{einstein} — the reference's
    ExecutionModeTest fixture objects."""
    registry = InstanceRegistry()
    src = ParquetFileDataObject(id="src", path=str(tmp_path / "src"), partitions=["lastname"])
    tgt1 = ParquetFileDataObject(id="tgt1", path=str(tmp_path / "tgt1"), partitions=["lastname"])
    tgt2 = ParquetFileDataObject(id="tgt2", path=str(tmp_path / "tgt2"), partitions=["lastname"])
    for do in (src, tgt1, tgt2):
        registry.register_data_object(do)
    people = spark.createDataFrame(
        [Row(lastname="doe", firstname="john", rating=5),
         Row(lastname="einstein", firstname="albert", rating=2)]
    )
    people.write.partitionBy("lastname").mode("overwrite").parquet(str(tmp_path / "src"))
    people.where("lastname = 'einstein'").write.partitionBy("lastname").mode(
        "overwrite"
    ).parquet(str(tmp_path / "tgt2"))
    os.makedirs(tmp_path / "tgt1", exist_ok=True)
    return registry, src, tgt1, tgt2


# 1 — "PartitionDiffMode default"
def test_partition_diff_default(spark, fixture_dos):
    _, src, tgt1, _ = fixture_dos
    res = PartitionDiffMode().apply(spark, src, tgt1, [], {})
    assert sorted(res.input_partition_values, key=str) == [DOE, EINSTEIN]


# 2 — "nbOfPartitionValuesPerRun=1 and positive applyCondition"
def test_partition_diff_nb_one_positive_apply_condition(spark, fixture_dos):
    _, src, tgt1, _ = fixture_dos
    mode = PartitionDiffMode(
        nb_of_partition_values_per_run=1, apply_condition=lambda given: True
    )
    res = mode.apply(spark, src, tgt1, [], {})
    assert res.input_partition_values == [DOE]
    assert res.output_partition_values == [DOE]


# 3 — "negative applyCondition": mode not applied; given values flow through
def test_partition_diff_negative_apply_condition(spark, fixture_dos):
    _, src, tgt1, _ = fixture_dos
    mode = PartitionDiffMode(apply_condition=lambda given: False)
    res = mode.apply(spark, src, tgt1, [], {})
    assert res.input_partition_values == [] and not res.no_data


# 4 — "failCondition"
def test_partition_diff_fail_condition_raises(spark, fixture_dos):
    _, src, tgt1, _ = fixture_dos
    mode = PartitionDiffMode(
        nb_of_partition_values_per_run=1,
        fail_condition=lambda res: (
            "doe selected"
            if any(pv.as_dict.get("lastname") == "doe" for pv in res.output_partition_values)
            else None
        ),
    )
    with pytest.raises(RuntimeError):
        mode.apply(spark, src, tgt1, [], {})


# 5 — "failConditions with description": message carries the description
def test_partition_diff_fail_condition_message(spark, fixture_dos):
    _, src, tgt1, _ = fixture_dos
    mode = PartitionDiffMode(
        nb_of_partition_values_per_run=1,
        fail_condition=lambda res: "fail on lastname=doe",
    )
    with pytest.raises(RuntimeError, match="fail on lastname=doe"):
        mode.apply(spark, src, tgt1, [], {})


# 6 — "selectExpression" (slice(-1,1): keep only the last selected value)
def test_partition_diff_select_expression_last(spark, fixture_dos):
    _, src, tgt1, _ = fixture_dos
    mode = PartitionDiffMode(select_expression=lambda missing: sorted(missing, key=str)[-1:])
    res = mode.apply(spark, src, tgt1, [], {})
    assert res.input_partition_values == [EINSTEIN]


# 7 — "selectExpression should be applied before nbOfPartitionValuesPerRun=1"
def test_partition_diff_select_expression_before_nb(spark, fixture_dos):
    _, src, tgt1, _ = fixture_dos
    mode = PartitionDiffMode(
        select_expression=lambda missing: sorted(missing, key=str)[-1:],
        nb_of_partition_values_per_run=1,
    )
    res = mode.apply(spark, src, tgt1, [], {})
    # einstein is the LAST partition; nb-slice-first would have yielded doe
    assert res.input_partition_values == [EINSTEIN]


# 8 — "selectAdditionalInputExpression with udf": widen inputs, not outputs
def test_partition_diff_select_additional_input(spark, fixture_dos):
    _, src, _, tgt2 = fixture_dos
    mode = PartitionDiffMode(
        select_additional_input_expression=lambda selected, all_input: sorted(
            set(selected) | {EINSTEIN}, key=str
        )
    )
    res = mode.apply(spark, src, tgt2, [], {})
    assert res.output_partition_values == [DOE]  # einstein already in tgt2
    assert sorted(res.input_partition_values, key=str) == [DOE, EINSTEIN]


# 9 — "alternativeOutputId": the action resolves the id; the mode sees the
# alternative object as output_do (resolution covered e2e in
# test_modes_and_quality.test_partition_diff_alternative_output_id)
def test_partition_diff_alternative_output_object(spark, fixture_dos):
    _, src, _, tgt2 = fixture_dos
    res = PartitionDiffMode(alternative_output_id="tgt2").apply(spark, src, tgt2, [], {})
    assert res.input_partition_values == [DOE]


# 10 — "no data to process" (src diffed against itself)
def test_partition_diff_no_data(spark, fixture_dos):
    _, src, _, _ = fixture_dos
    assert PartitionDiffMode().apply(spark, src, src, [], {}).no_data


# 11 — "no data to process after selectExpression"
def test_partition_diff_no_data_after_select(spark, fixture_dos):
    _, src, tgt1, _ = fixture_dos
    mode = PartitionDiffMode(select_expression=lambda missing: [])
    assert mode.apply(spark, src, tgt1, [], {}).no_data


def _mock(df):
    do = MockDataObject(id="m")
    do._df = df.localCheckpoint()
    return do


# 12 — "DataFrameIncrementalMode empty source"
def test_incremental_empty_source(spark):
    empty = _mock(spark.createDataFrame([], "firstname string, rating int"))
    tgt = _mock(spark.createDataFrame([Row(firstname="a", rating=1)]))
    res = DataFrameIncrementalMode(compare_col="rating").apply(spark, empty, tgt, [], {})
    assert res.no_data


# 13 — "DataFrameIncrementalMode empty target": no filter, copy everything
def test_incremental_empty_target(spark):
    src = _mock(spark.createDataFrame([Row(firstname="a", rating=1)]))
    tgt = _mock(spark.createDataFrame([], "firstname string, rating int"))
    res = DataFrameIncrementalMode(compare_col="rating").apply(spark, src, tgt, [], {})
    assert res.filter is None and not res.no_data


# 14 — "DataFrameIncrementalMode partially filled target": filter non-empty
def test_incremental_partial_target(spark):
    src = _mock(spark.createDataFrame([Row(firstname="a", rating=1), Row(firstname="b", rating=5)]))
    tgt = _mock(spark.createDataFrame([Row(firstname="a", rating=1)]))
    res = DataFrameIncrementalMode(compare_col="rating").apply(spark, src, tgt, [], {})
    assert res.filter is not None
    kept = src.get_dataframe(spark).where(res.filter).collect()
    assert [r.firstname for r in kept] == ["b"]


# 15/16 — compareCol case differs from the input/output column (Spark's
# default case-insensitive resolution must hold through the mode)
def test_incremental_compare_col_case_insensitive(spark):
    src = _mock(spark.createDataFrame([Row(firstname="a", rating=1), Row(firstname="b", rating=5)]))
    tgt = _mock(spark.createDataFrame([Row(firstname="a", RATING=1)]))
    res = DataFrameIncrementalMode(compare_col="Rating").apply(spark, src, tgt, [], {})
    assert res.filter is not None
    assert [r.firstname for r in src.get_dataframe(spark).where(res.filter).collect()] == ["b"]


# 17 — "DataFrameIncrementalMode no data to process" (equal high-watermarks)
def test_incremental_no_data_equal_hwm(spark):
    df = spark.createDataFrame([Row(firstname="a", rating=1)])
    res = DataFrameIncrementalMode(compare_col="rating").apply(spark, _mock(df), _mock(df), [], {})
    assert res.no_data


# 18 — "CustomPartitionMode alternativeOutputId": plugin diffs src against
# the resolved alternative output; the action resolves the id via the same
# getattr hook PartitionDiffMode uses (actions/base.py)
def test_custom_partition_mode_alternative_output(spark, fixture_dos):
    _, src, _, tgt2 = fixture_dos

    def pick(spark_, input_do, output_do, given, state):
        have = set(output_do.list_partitions(spark_))
        return [pv for pv in sorted(input_do.list_partitions(spark_), key=str) if pv not in have]

    mode = CustomPartitionMode(fn=pick, alternative_output_id="tgt2")
    assert mode.alternative_output_id == "tgt2"
    res = mode.apply(spark, src, tgt2, [], {})
    assert res.input_partition_values == [DOE]


# 19 — "FileIncrementalMoveMode select file refs"
def test_file_move_selects_refs(spark, fixture_dos):
    _, src, _, _ = fixture_dos
    mode = FileIncrementalMoveMode()
    res = mode.apply(spark, src, src, [], {})
    assert not res.no_data and mode._consumed_files


# 20 — "FileIncrementalMoveMode no data to process"
def test_file_move_no_data(spark, tmp_path):
    os.makedirs(tmp_path / "empty", exist_ok=True)
    empty = ParquetFileDataObject(
        id="empty", path=str(tmp_path / "empty"), schema="lastname string, rating int"
    )
    assert FileIncrementalMoveMode().apply(spark, empty, empty, [], {}).no_data


# 21-23 — archive relative / with partitions / archiveInsidePartition:
# e2e twins in test_dag_parity.test_file_move_archive_relative_and_inside_partition


# 24 — "FileIncrementalMoveMode archive absolute path"
def test_file_move_archive_absolute_path(spark, tmp_path):
    src_dir = tmp_path / "srcAbs"
    archive = tmp_path / "absoluteArchive"
    spark.createDataFrame([Row(lastname="doe", rating=5)]).write.parquet(str(src_dir))
    src = ParquetFileDataObject(id="srcAbs", path=str(src_dir))
    mode = FileIncrementalMoveMode(archive_path=str(archive))
    res = mode.apply(spark, src, src, [], {})
    assert not res.no_data
    mode.post_exec(spark, src, src, {})
    assert any(f.endswith(".parquet") for f in os.listdir(archive))
    assert not any(f.endswith(".parquet") for f in os.listdir(src_dir))
