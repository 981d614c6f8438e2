"""Action-suite scenario parity (CopyActionTest / HistorizeActionTest /
DeduplicateActionTest + merge variants) — twins for the scenarios not
already covered elsewhere; the full scenario map lives in SURVEY §5.

Mirrors the reference fixture rows ("jonson","rob",5)/("doe","bob",3)
where the scenario uses them.
"""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from smart_data_lake_spark.actions import CopyAction, DeduplicateAction, HistorizeAction
from smart_data_lake_spark.actions.base import NoDataToProcessWarning
from smart_data_lake_spark.config import InstanceRegistry
from smart_data_lake_spark.dataobjects import MockDataObject, ParquetFileDataObject
from smart_data_lake_spark.execution_modes import PartitionDiffMode
from smart_data_lake_spark.partitions import PartitionValues
from smart_data_lake_spark.plans import ActionDAG, ActionDAGRun
from smart_data_lake_spark.transformers.df_transformers import (
    DfTransformer,
    FilterTransformer,
)


def _people(spark):
    return spark.createDataFrame(
        [Row(lastname="jonson", firstname="rob", rating=5),
         Row(lastname="doe", firstname="bob", rating=3)]
    )


# --- HistorizeActionTest / DeduplicateActionTest: "early validation that
# output primary key exists" (constructor-time, like the reference's
# intercept around the constructor call)

def test_historize_early_pk_validation():
    registry = InstanceRegistry()
    registry.register_data_object(MockDataObject(id="src"))
    registry.register_data_object(MockDataObject(id="tgt"))  # no primary key
    with pytest.raises(ValueError, match="primary key"):
        HistorizeAction(id="ha", input_id="src", output_id="tgt", registry=registry)


def test_deduplicate_early_pk_validation():
    registry = InstanceRegistry()
    registry.register_data_object(MockDataObject(id="src"))
    registry.register_data_object(MockDataObject(id="tgt"))
    with pytest.raises(ValueError, match="primary key"):
        DeduplicateAction(id="dda", input_id="src", output_id="tgt", registry=registry)


# --- DeduplicateActionTest: "deduplicate with filter clause" — a
# FilterTransformer ahead of the dedup keeps only matching rows

def test_deduplicate_with_filter_clause(spark):
    registry = InstanceRegistry()
    registry.register_data_object(MockDataObject(id="src"))
    registry.register_data_object(
        MockDataObject(id="tgt", primary_key=["lastname", "firstname"])
    )
    src = registry.get_data_object("src")
    src._df = _people(spark).localCheckpoint()
    action = DeduplicateAction(
        id="dda", input_id="src", output_id="tgt", registry=registry,
        transformers=[FilterTransformer(filter_clause="lastname='jonson'")],
    )
    ActionDAGRun(ActionDAG([action]), registry).run(spark)
    rows = registry.get_data_object("tgt").get_dataframe(spark).collect()
    assert len(rows) == 1 and rows[0].rating == 5


# --- CopyActionTest: "copy load detect no-data rowCount=0 from SparkPlan"

def test_copy_no_data_check_rowcount_zero(spark, tmp_path):
    registry = InstanceRegistry()
    registry.register_data_object(
        ParquetFileDataObject(id="src", path=str(tmp_path / "src"))
    )
    registry.register_data_object(
        ParquetFileDataObject(id="tgt", path=str(tmp_path / "tgt"))
    )
    # files exist but hold zero rows
    _people(spark).where(F.lit(False)).write.parquet(str(tmp_path / "src"))
    action = CopyAction(
        id="ca", input_id="src", output_id="tgt", registry=registry, no_data_check=True
    )
    state = ActionDAGRun(ActionDAG([action]), registry).run(spark)
    assert state.action_states["ca"] == "SKIPPED"
    import os

    # nothing reached the target
    assert not any(
        f.endswith(".parquet") for f in os.listdir(tmp_path / "tgt")
    ) if (tmp_path / "tgt").exists() else True


# --- CopyActionTest: "date to month aggregation with partition value
# transformation and PartitionDiffMode" (applyPartitionValuesTransform)

class _DateToMonth(DfTransformer):
    name = "date_to_month"

    def transform(self, spark, df, options=None):
        return df.withColumn("mt", F.substring("dt", 1, 6))

    def transform_partition_values(self, partition_values):
        return [
            PartitionValues.of({"mt": str(pv.as_dict["dt"])[:6]})
            for pv in partition_values
        ]


def test_copy_partition_value_transformation_date_to_month(spark, tmp_path):
    registry = InstanceRegistry()
    registry.register_data_object(
        ParquetFileDataObject(id="src", path=str(tmp_path / "src"), partitions=["dt"])
    )
    registry.register_data_object(
        ParquetFileDataObject(id="tgt", path=str(tmp_path / "tgt"), partitions=["mt"])
    )
    df = spark.createDataFrame(
        [Row(dt="20100101", lastname="jonson", firstname="rob", rating=5),
         Row(dt="20100103", lastname="doe", firstname="bob", rating=3)]
    )
    df.write.partitionBy("dt").parquet(str(tmp_path / "src"))

    def make(n):
        return CopyAction(
            id=f"ca{n}", input_id="src", output_id="tgt", registry=registry,
            transformers=[_DateToMonth()],
            execution_mode=PartitionDiffMode(apply_partition_values_transform=True),
        )

    state1 = ActionDAGRun(ActionDAG([make(1)]), registry).run(spark)
    assert state1.action_states["ca1"] == "SUCCEEDED"
    out = spark.read.parquet(str(tmp_path / "tgt"))
    assert out.count() == 2
    assert set(str(r.mt) for r in out.select("mt").distinct().collect()) == {"201001"}
    # month partition written as a hive path
    assert (tmp_path / "tgt" / "mt=201001").exists()

    # second run: both dates map to the existing month -> no data, skipped
    state2 = ActionDAGRun(ActionDAG([make(2)]), registry).run(spark)
    assert state2.action_states["ca2"] == "SKIPPED"

    # a new date in a NEW month is processed; the old month is not rewritten
    spark.createDataFrame(
        [Row(dt="20100201", lastname="new", firstname="guy", rating=1)]
    ).write.mode("append").partitionBy("dt").parquet(str(tmp_path / "src"))
    state3 = ActionDAGRun(ActionDAG([make(3)]), registry).run(spark)
    assert state3.action_states["ca3"] == "SUCCEEDED"
    out3 = spark.read.parquet(str(tmp_path / "tgt"))
    assert out3.count() == 3
    assert (tmp_path / "tgt" / "mt=201002").exists()


# --- CopyActionTest: "fail on reading missing partition"

def test_copy_fail_on_reading_missing_partition(spark, tmp_path):
    registry = InstanceRegistry()
    registry.register_data_object(
        ParquetFileDataObject(
            id="src", path=str(tmp_path / "src"), partitions=["lastname", "firstname"]
        )
    )
    registry.register_data_object(
        ParquetFileDataObject(id="tgt", path=str(tmp_path / "tgt"))
    )
    _people(spark).write.partitionBy("lastname", "firstname").parquet(str(tmp_path / "src"))
    from smart_data_lake_spark.plans.dag import SparkSubFeed

    action = CopyAction(id="ca", input_id="src", output_id="tgt", registry=registry)

    def run(pv_dict):
        sf = SparkSubFeed(
            data_object_id="src",
            partition_values=[PartitionValues.of(pv_dict)] if pv_dict else [],
        )
        return action.exec(spark, [sf])

    run({"lastname": "doe", "firstname": "bob"})  # exists: ok
    with pytest.raises(AssertionError, match="does not exist"):
        run({"lastname": "joe", "firstname": "bob"})  # missing full partition
    run({"lastname": "doe"})  # init (prefix) of partition cols, exists: ok
    with pytest.raises(AssertionError, match="does not exist"):
        run({"lastname": "joe"})  # init, missing
    run({"firstname": "bob"})  # NOT an init -> unchecked, no failure


# --- CopyActionTest: "copy load force saveMode" — the action's save_mode
# overrides the DataObject's default

def test_copy_force_save_mode_overwrite(spark, tmp_path):
    registry = InstanceRegistry()
    registry.register_data_object(ParquetFileDataObject(id="src", path=str(tmp_path / "s")))
    registry.register_data_object(
        ParquetFileDataObject(id="tgt", path=str(tmp_path / "t"), save_mode="append")
    )
    _people(spark).write.parquet(str(tmp_path / "s"))
    # two appends would double the rows; the forced overwrite keeps 2
    for n in (1, 2):
        action = CopyAction(
            id=f"c{n}", input_id="src", output_id="tgt", registry=registry,
            save_mode="overwrite",
        )
        ActionDAGRun(ActionDAG([action]), registry).run(spark)
    assert spark.read.parquet(str(tmp_path / "t")).count() == 2


# --- DeduplicateActionTest: "deduplicate with schema evolution" — the 2nd
# load carries a new column; old rows keep NULL there, new rows carry it

def test_deduplicate_with_schema_evolution(spark):
    registry = InstanceRegistry()
    registry.register_data_object(MockDataObject(id="src"))
    registry.register_data_object(
        MockDataObject(id="tgt", primary_key=["lastname", "firstname"])
    )
    src = registry.get_data_object("src")
    src._df = _people(spark).localCheckpoint()
    a1 = DeduplicateAction(id="d1", input_id="src", output_id="tgt", registry=registry)
    ActionDAGRun(ActionDAG([a1]), registry).run(spark)

    src._df = spark.createDataFrame(
        [Row(lastname="jonson", firstname="rob", rating=7, health="good")]
    ).localCheckpoint()
    a2 = DeduplicateAction(id="d2", input_id="src", output_id="tgt", registry=registry)
    ActionDAGRun(ActionDAG([a2]), registry).run(spark)
    out = {
        (r.lastname, r.firstname): r
        for r in registry.get_data_object("tgt").get_dataframe(spark).collect()
    }
    assert out[("jonson", "rob")].rating == 7
    assert out[("jonson", "rob")].health == "good"
    assert out[("doe", "bob")].health is None  # evolved old row: NULL backfill
