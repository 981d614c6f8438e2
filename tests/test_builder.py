"""SmartDataLakeBuilder: feed selection algebra, whole-DAG streaming loop,
simulation runs (SmartDataLakeBuilder.scala:226-355, 398-418, 566-648)."""

from pyspark.sql import Row

from smart_data_lake_spark.actions import CopyAction
from smart_data_lake_spark.config import InstanceRegistry
from smart_data_lake_spark.dataobjects import MockDataObject
from smart_data_lake_spark.plans import SmartDataLakeBuilder


def _registry_with_feeds(spark):
    registry = InstanceRegistry()
    for do_id in ("a", "b", "c", "d"):
        registry.register_data_object(MockDataObject(id=do_id))
    registry.get_data_object("a")._df = spark.createDataFrame([Row(v=1)]).localCheckpoint()
    CopyAction(id="a1", input_id="a", output_id="b", registry=registry,
               metadata={"feed": "ingest", "layer": "bronze"})
    CopyAction(id="a2", input_id="b", output_id="c", registry=registry,
               metadata={"feed": "refine", "layer": "silver"})
    CopyAction(id="a3", input_id="c", output_id="d", registry=registry,
               metadata={"feed": "refine", "layer": "gold"})
    return registry


def test_feed_selection_algebra(spark):
    b = SmartDataLakeBuilder(registry=_registry_with_feeds(spark))
    ids = lambda sel: sorted(a.id for a in b.select_actions(sel))
    assert ids(None) == ["a1", "a2", "a3"]
    assert ids("ingest") == ["a1"]
    assert ids("refine") == ["a2", "a3"]
    assert ids("ids:a2") == ["a2"]
    assert ids("layers:silver") == ["a2"]
    assert ids("startFromActionIds:a2") == ["a2", "a3"]
    assert ids("endWithActionIds:a2") == ["a1", "a2"]
    assert ids("refine&layers:gold") == ["a3"]
    assert ids("ingest|layers:gold") == ["a1", "a3"]
    assert ids("*&-ids:a2") == ["a1", "a3"]


def test_builder_run_and_streaming_loop(spark, tmp_path):
    registry = _registry_with_feeds(spark)
    b = SmartDataLakeBuilder(registry=registry)
    state = b.run(spark=spark, state_path=str(tmp_path / "state"))
    assert set(state.action_states.values()) == {"SUCCEEDED"}
    assert registry.get_data_object("d").get_dataframe(spark).count() == 1

    # whole-DAG synchronous streaming loop: bounded iterations for the test
    state2 = b.run(
        spark=spark, streaming=True, streaming_interval_sec=0.01, max_streaming_iterations=2
    )
    assert set(state2.action_states.values()) == {"SUCCEEDED"}


def test_config_driven_pipeline_with_nested_types(spark, tmp_path):
    """Pure-dict config (the HOCON equivalent): nested executionMode and
    transformer specs are instantiated by type discriminator
    (ConfigParser.scala:44-115 reflection)."""
    from pyspark.sql import Row

    from smart_data_lake_spark.config import load_config

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [Row(p="a", v=1), Row(p="b", v=2)]
    ).write.partitionBy("p").mode("overwrite").parquet(src)
    registry = load_config(
        {
            "dataObjects": {
                "in": {"type": "ParquetFileDataObject", "path": src, "partitions": ["p"]},
                "out": {
                    "type": "ParquetFileDataObject",
                    "path": str(tmp_path / "out"),
                    "partitions": ["p"],
                },
            },
            "actions": {
                "c": {
                    "type": "CopyAction",
                    "inputId": "in",
                    "outputId": "out",
                    "executionMode": {"type": "PartitionDiffMode"},
                    "transformers": [
                        {"type": "AdditionalColumnsTransformer", "additionalColumns": {"v2": "v * 10"}}
                    ],
                }
            },
        }
    )
    action = registry.actions["c"]
    from smart_data_lake_spark.execution_modes import PartitionDiffMode

    assert isinstance(action.execution_mode, PartitionDiffMode)
    b = SmartDataLakeBuilder(registry=registry)
    state = b.run(spark=spark)
    assert state.action_states["c"] == "SUCCEEDED"
    out = spark.read.parquet(str(tmp_path / "out"))
    assert {(r["v"], r["v2"]) for r in out.collect()} == {(1, 10), (2, 20)}


def test_simulate_does_not_touch_storage(spark):
    registry = _registry_with_feeds(spark)
    registry.get_data_object("b")._df = None  # nothing written yet
    b = SmartDataLakeBuilder(registry=registry)
    src = spark.createDataFrame([Row(v=42)])
    out = b.simulate({"a": src}, spark=spark)
    assert out["d"].collect()[0]["v"] == 42
    assert registry.get_data_object("b")._df is None  # no writes happened
