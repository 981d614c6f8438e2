"""End-to-end slice: csv→sql-transform→parquet on testdata, mirroring the
reference's ActionDAGTest mini-pipelines (ActionDAGTest.scala:65-1327)."""

import os

import pytest
from pyspark.sql import functions as F

from smart_data_lake_spark.actions import CopyAction, CustomDataFrameAction
from smart_data_lake_spark.config import InstanceRegistry, load_config
from smart_data_lake_spark.dataobjects import CsvFileDataObject, ParquetFileDataObject
from smart_data_lake_spark.plans import ActionDAG, ActionDAGRun, SmartDataLakeBuilder
from smart_data_lake_spark.transformers import FilterTransformer, SQLDfTransformer, SQLDfsTransformer

from tests.conftest import assert_df_equal


@pytest.fixture()
def customer_csv(spark, sf_dir, tmp_path):
    """Export customer as pipe-delimited CSV (FIXTURES.md F5)."""
    path = str(tmp_path / "customer_csv")
    df = spark.read.parquet(f"{sf_dir}/customer.parquet")
    df.write.option("sep", "|").option("header", "false").mode("overwrite").csv(path)
    return path, df


def test_copy_csv_to_parquet_roundtrip(spark, customer_csv, tmp_path):
    src_path, original = customer_csv
    registry = InstanceRegistry()
    registry.register_data_object(
        CsvFileDataObject(
            id="src",
            path=src_path,
            schema="c_custkey bigint, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string",
        )
    )
    registry.register_data_object(ParquetFileDataObject(id="dst", path=str(tmp_path / "out")))
    action = CopyAction(id="copy", input_id="src", output_id="dst", registry=registry)
    run = ActionDAGRun(ActionDAG([action]), registry)
    state = run.run(spark)
    assert state.action_states["copy"] == "SUCCEEDED"
    result = spark.read.parquet(str(tmp_path / "out")).select(*original.columns)
    assert_df_equal(result, original)
    assert state.action_metrics["copy"]["dst"]["records_written"] == original.count()


def test_copy_with_sql_and_filter_transformers(spark, sf_dir, tmp_path):
    registry = InstanceRegistry()
    registry.register_data_object(ParquetFileDataObject(id="orders", path=f"{sf_dir}/orders.parquet"))
    registry.register_data_object(ParquetFileDataObject(id="out", path=str(tmp_path / "out")))
    action = CopyAction(
        id="a1",
        input_id="orders",
        output_id="out",
        registry=registry,
        transformers=[
            FilterTransformer(filter_clause="o_orderstatus = 'F'"),
            SQLDfTransformer(
                code="SELECT o_custkey, count(*) AS n_orders, sum(o_totalprice) AS total "
                "FROM %{inputViewName} GROUP BY o_custkey"
            ),
        ],
    )
    ActionDAGRun(ActionDAG([action]), registry).run(spark)
    got = spark.read.parquet(str(tmp_path / "out"))
    exp = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .where("o_orderstatus = 'F'")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"), F.sum("o_totalprice").alias("total"))
    )
    assert_df_equal(got.orderBy("o_custkey"), exp.orderBy("o_custkey"))


def test_multi_action_dag_with_dfs_transformer(spark, sf_dir, tmp_path):
    """Two-stage DAG: copy lineitem → join with orders in a CustomDataFrameAction."""
    registry = InstanceRegistry()
    registry.register_data_object(ParquetFileDataObject(id="lineitem", path=f"{sf_dir}/lineitem.parquet"))
    registry.register_data_object(ParquetFileDataObject(id="orders", path=f"{sf_dir}/orders.parquet"))
    registry.register_data_object(ParquetFileDataObject(id="stage", path=str(tmp_path / "stage")))
    registry.register_data_object(ParquetFileDataObject(id="joined", path=str(tmp_path / "joined")))
    a1 = CopyAction(
        id="stage_lineitem", input_id="lineitem", output_id="stage", registry=registry,
        transformers=[FilterTransformer(filter_clause="l_quantity > 25")],
    )
    a2 = CustomDataFrameAction(
        id="join", input_ids=["stage", "orders"], output_ids=["joined"], registry=registry,
        transformers=[
            SQLDfsTransformer(
                code={
                    "joined": "SELECT o.o_orderkey, o.o_orderdate, l.l_extendedprice "
                    "FROM stage l JOIN orders o ON l.l_orderkey = o.o_orderkey"
                }
            )
        ],
    )
    state = ActionDAGRun(ActionDAG([a1, a2]), registry, parallelism=2).run(spark)
    assert state.action_states == {"stage_lineitem": "SUCCEEDED", "join": "SUCCEEDED"}
    got = spark.read.parquet(str(tmp_path / "joined"))
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").where("l_quantity > 25")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    exp = li.join(o, li.l_orderkey == o.o_orderkey).select("o_orderkey", "o_orderdate", "l_extendedprice")
    assert got.count() == exp.count()


def test_config_driven_pipeline(spark, sf_dir, tmp_path):
    builder = SmartDataLakeBuilder(
        config={
            "dataObjects": {
                "nation": {"type": "ParquetFileDataObject", "path": f"{sf_dir}/nation.parquet"},
                "out": {"type": "ParquetFileDataObject", "path": str(tmp_path / "out")},
            },
            "actions": {
                "cp": {"type": "CopyAction", "inputId": "nation", "outputId": "out"},
            },
        }
    )
    state = builder.run(spark=spark)
    assert state.action_states["cp"] == "SUCCEEDED"
    assert spark.read.parquet(str(tmp_path / "out")).count() == 25


def test_simulation(spark, sf_dir):
    registry = InstanceRegistry()
    registry.register_data_object(ParquetFileDataObject(id="in", path=f"{sf_dir}/region.parquet"))
    registry.register_data_object(ParquetFileDataObject(id="out", path="/tmp/never_written"))
    action = CopyAction(
        id="sim", input_id="in", output_id="out", registry=registry,
        transformers=[FilterTransformer(filter_clause="r_regionkey < 2")],
    )
    builder = SmartDataLakeBuilder(registry=registry)
    df_in = spark.read.parquet(f"{sf_dir}/region.parquet")
    result = builder.simulate({"in": df_in}, spark=spark)
    assert result["out"].count() == 2
    assert not os.path.exists("/tmp/never_written")


def test_example_medallion_pipeline(spark, tmp_path):
    """The shipped examples/medallion_pipeline.py runs end-to-end: two
    builder runs over the same declarative config, SCD2 history continuity,
    lab inspection summary."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "medallion_example",
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "examples", "medallion_pipeline.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    summary = mod.main(str(tmp_path / "work"))
    assert summary["run_id"] == 2
    assert summary["history_rows"] >= summary["open_versions"] > 0
    assert summary["bronze_rows"] == summary["current_rows"]


def test_example_corpus_pipeline(spark, tmp_path):
    """The shipped examples/corpus_pipeline.py runs end-to-end: quality gate
    -> exact dedup -> hash split -> sequence packing, all through the
    config-driven builder, with a config-instantiated expectation."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "corpus_example",
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "examples", "corpus_pipeline.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    summary = mod.main(str(tmp_path / "work"))
    assert summary["all_succeeded"]
    assert summary["unique_docs"] <= summary["clean_docs"] <= summary["raw_docs"]
    assert set(summary["splits"]) == {"train", "val", "test"}
    assert sum(summary["splits"].values()) == summary["unique_docs"]
    assert summary["n_shards"] >= 3  # at least one shard per split


def test_multi_input_ignore_filter_scenario(spark, tmp_path):
    """ActionDAGTest.scala 'first action has multiple input subfeeds, one
    should ignore filters': the run's partition-values filter applies to
    every partitioned input EXCEPT those in inputIdsToIgnoreFilter."""
    import pyspark.sql.functions as F

    from smart_data_lake_spark.plans import SmartDataLakeBuilder

    both = spark.createDataFrame(
        [("doe", "john", 5), ("xyz", "john", 5)], "lastname string, firstname string, rating int"
    )
    for name, partitioned in (("src1", False), ("src2", True), ("src3", True)):
        w = both.write.mode("overwrite")
        if partitioned:
            w = w.partitionBy("lastname")
        w.parquet(str(tmp_path / name))
    config = {
        "dataObjects": {
            "src1": {"type": "ParquetFileDataObject", "path": str(tmp_path / "src1")},
            "src2": {"type": "ParquetFileDataObject", "path": str(tmp_path / "src2"),
                     "partitions": ["lastname"]},
            "src3": {"type": "ParquetFileDataObject", "path": str(tmp_path / "src3"),
                     "partitions": ["lastname"]},
            "tgt": {"type": "ParquetFileDataObject", "path": str(tmp_path / "tgt")},
        },
        "actions": {
            "a": {
                "type": "CustomDataFrameAction",
                "inputIds": ["src1", "src2", "src3"],
                "outputIds": ["tgt"],
                "inputIdsToIgnoreFilter": ["src3"],
                "transformers": [
                    {
                        "type": "SQLDfsTransformer",
                        "code": {
                            "tgt": "SELECT lastname, firstname, 1 AS origin FROM src1 "
                                   "UNION ALL SELECT lastname, firstname, 2 FROM src2 "
                                   "UNION ALL SELECT lastname, firstname, 3 FROM src3"
                        },
                    }
                ],
            }
        },
    }
    SmartDataLakeBuilder(config=config).run(
        spark=spark, partition_values=[{"lastname": "doe"}]
    )
    got = {
        (r["lastname"], r["firstname"], r["origin"])
        for r in spark.read.parquet(str(tmp_path / "tgt")).collect()
    }
    # src1 unpartitioned (filter not applicable at scan; reference keeps its
    # single record), src2 filtered to doe, src3 ignores the filter entirely
    assert got == {
        ("doe", "john", 1),
        ("xyz", "john", 1),
        ("doe", "john", 2),
        ("doe", "john", 3),
        ("xyz", "john", 3),
    }


def test_two_actions_writing_same_dataobject(spark, tmp_path):
    """ActionDAGTest.scala 'two actions writing the same DataObject':
    actions A and B both append into tgtA; action C reads tgtA and must run
    AFTER both writers."""
    import pyspark.sql.functions as F

    from smart_data_lake_spark.plans import SmartDataLakeBuilder

    spark.range(3).withColumn("src", F.lit("a")).write.parquet(str(tmp_path / "s1"))
    spark.range(3, 6).withColumn("src", F.lit("b")).write.parquet(str(tmp_path / "s2"))
    config = {
        "dataObjects": {
            "s1": {"type": "ParquetFileDataObject", "path": str(tmp_path / "s1")},
            "s2": {"type": "ParquetFileDataObject", "path": str(tmp_path / "s2")},
            "tgtA": {"type": "ParquetFileDataObject", "path": str(tmp_path / "tgtA"),
                     "saveMode": "append"},
            "tgtC": {"type": "ParquetFileDataObject", "path": str(tmp_path / "tgtC")},
        },
        "actions": {
            "a": {"type": "CopyAction", "inputId": "s1", "outputId": "tgtA"},
            "b": {"type": "CopyAction", "inputId": "s2", "outputId": "tgtA"},
            "c": {"type": "CopyAction", "inputId": "tgtA", "outputId": "tgtC"},
        },
    }
    state = SmartDataLakeBuilder(config=config).run(spark=spark)
    assert set(state.action_states.values()) == {"SUCCEEDED"}
    out = spark.read.parquet(str(tmp_path / "tgtC"))
    # C saw BOTH writers' rows: the reader edge covers every producer
    assert out.count() == 6
    assert {r["src"] for r in out.select("src").distinct().collect()} == {"a", "b"}


def test_multi_writer_scheduler_waits_and_cancels(spark, tmp_path):
    """upstream_actions must cover EVERY writer (review finding): with one
    of two writers failing, the reader is CANCELLED, never run on partial
    data."""
    import pyspark.sql.functions as F

    from smart_data_lake_spark.plans import SmartDataLakeBuilder
    from smart_data_lake_spark.plans.dag import ActionDAG, DAGError
    from smart_data_lake_spark.config import load_config

    spark.range(3).withColumn("src", F.lit("a")).write.parquet(str(tmp_path / "s1"))
    spark.range(3, 6).withColumn("src", F.lit("b")).write.parquet(str(tmp_path / "s2"))
    config = {
        "dataObjects": {
            "s1": {"type": "ParquetFileDataObject", "path": str(tmp_path / "s1")},
            "s2": {"type": "ParquetFileDataObject", "path": str(tmp_path / "s2")},
            "tgtA": {"type": "ParquetFileDataObject", "path": str(tmp_path / "tgtA"),
                     "saveMode": "append"},
            "tgtC": {"type": "ParquetFileDataObject", "path": str(tmp_path / "tgtC")},
        },
        "actions": {
            "a": {"type": "CopyAction", "inputId": "s1", "outputId": "tgtA"},
            # b fails AT EXEC: an impossible count expectation on its write
            "b": {"type": "CopyAction", "inputId": "s2", "outputId": "tgtA",
                  "expectations": [{"type": "CountExpectation", "name": "min_cnt",
                                     "expectation": "> 1000"}]},
            "c": {"type": "CopyAction", "inputId": "tgtA", "outputId": "tgtC"},
        },
    }
    registry = load_config(config)
    dag = ActionDAG(list(registry.actions.values()))
    assert dag.upstream_actions("c") == {"a", "b"}  # every writer tracked
    assert dag.upstream_actions("a") == set()
    with pytest.raises(DAGError):
        SmartDataLakeBuilder(config=config).run(spark=spark)
    assert not os.path.exists(tmp_path / "tgtC")  # c never ran on partial data
