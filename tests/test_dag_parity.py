"""Complete ActionDAGTest.scala scenario parity (ActionDAGTest.scala:65-1327).

Each test here mirrors one reference DAG scenario that was not yet covered
by test_pipeline_e2e.py / test_modes_and_quality.py / test_builder.py /
test_streaming.py; together with those files every reference scenario has a
pytest twin (the full 27-row map lives in SURVEY.md §5)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from smart_data_lake_spark.actions import CopyAction, CustomDataFrameAction, DeduplicateAction
from smart_data_lake_spark.config import InstanceRegistry
from smart_data_lake_spark.dataobjects import CsvFileDataObject, ParquetFileDataObject
from smart_data_lake_spark.dataobjects.table import ParquetTableDataObject
from smart_data_lake_spark.dataobjects.base import Table
from smart_data_lake_spark.execution_modes import (
    DataFrameIncrementalMode,
    PartitionDiffMode,
    ProcessAllMode,
    SparkStreamingMode,
)
from smart_data_lake_spark.partitions import PartitionValues
from smart_data_lake_spark.plans import ActionDAG, ActionDAGRun
from smart_data_lake_spark.plans.dag import DAGError
from smart_data_lake_spark.transformers import SQLDfTransformer, SQLDfsTransformer


def _people_df(spark):
    return spark.createDataFrame(
        [("doe", "john", 5)], "lastname string, firstname string, rating int"
    )


def test_break_dataframe_lineage_chain(spark, tmp_path):
    """ActionDAGTest.scala:119 'breakDataframeLineage=true': the second
    action must NOT receive the first's DataFrame — it re-reads tgt1 from
    storage — and the chain still produces the same rows."""
    registry = InstanceRegistry()
    _people_df(spark).write.parquet(str(tmp_path / "src"))
    registry.register_data_object(ParquetFileDataObject(id="src", path=str(tmp_path / "src")))
    registry.register_data_object(ParquetFileDataObject(id="tgt1", path=str(tmp_path / "tgt1")))
    registry.register_data_object(ParquetFileDataObject(id="tgt2", path=str(tmp_path / "tgt2")))
    a = CopyAction(id="a", input_id="src", output_id="tgt1", registry=registry)
    b = CopyAction(
        id="b", input_id="tgt1", output_id="tgt2", registry=registry,
        break_dataframe_lineage=True,
    )
    state = ActionDAGRun(ActionDAG([a, b]), registry).run(spark)
    assert state.action_states == {"a": "SUCCEEDED", "b": "SUCCEEDED"}
    got = spark.read.parquet(str(tmp_path / "tgt2"))
    assert [tuple(r) for r in got.select("lastname", "firstname", "rating").collect()] == [
        ("doe", "john", 5)
    ]


def test_second_action_reads_different_schema(spark, tmp_path):
    """ActionDAGTest.scala:169 '2nd action reads different schema than
    produced by last action': tgt1 is a CSV with filenameColumn, so action b
    sees an extra `_filename` column that action a never produced; the SQL
    transformer selects it and the run succeeds (no stale-lineage error)."""
    registry = InstanceRegistry()
    spark.createDataFrame([("doe-john", 5)], "name string, rating int").write.parquet(
        str(tmp_path / "src")
    )
    registry.register_data_object(ParquetFileDataObject(id="src", path=str(tmp_path / "src")))
    registry.register_data_object(
        CsvFileDataObject(
            id="tgt1", path=str(tmp_path / "tgt1"), filename_column="_filename",
            schema="name string, rating int", options={"header": "true"},
        )
    )
    registry.register_data_object(
        CsvFileDataObject(id="tgt2", path=str(tmp_path / "tgt2"), options={"header": "true"})
    )
    a = CopyAction(id="a", input_id="src", output_id="tgt1", registry=registry)
    # the produced-DF from `a` has no _filename; b must re-read from the
    # DataObject (whose read adds it) — break lineage exactly like the
    # reference does for schema-modifying reads
    b = CopyAction(
        id="b", input_id="tgt1", output_id="tgt2", registry=registry,
        break_dataframe_lineage=True,
        transformers=[SQLDfTransformer(code="SELECT _filename, rating FROM %{inputViewName}")],
    )
    state = ActionDAGRun(ActionDAG([a, b]), registry).run(spark)
    assert state.action_states == {"a": "SUCCEEDED", "b": "SUCCEEDED"}
    got = spark.read.option("header", "true").option("sep", "|").csv(str(tmp_path / "tgt2"))
    assert set(got.columns) == {"_filename", "rating"}
    rows = got.collect()
    assert len(rows) == 1 and rows[0]["rating"] == "5"
    assert "tgt1" in rows[0]["_filename"]


def test_four_dependencies_diamond(spark, tmp_path):
    """ActionDAGTest.scala:328 'four dependencies': A → (B, C) → D where D is
    a CustomDataFrameAction with two inputs; the union+sum doubles the
    rating."""
    registry = InstanceRegistry()
    _people_df(spark).write.parquet(str(tmp_path / "src"))
    registry.register_data_object(ParquetFileDataObject(id="src", path=str(tmp_path / "src")))
    registry.register_data_object(
        ParquetTableDataObject(
            id="tgt_A", path=str(tmp_path / "tgt_A"),
            table=Table(name="tgt_a", primary_key=["lastname", "firstname"]),
        )
    )
    for t in ("tgt_B", "tgt_C", "tgt_D"):
        registry.register_data_object(ParquetFileDataObject(id=t, path=str(tmp_path / t)))
    actions = [
        DeduplicateAction(id="A", input_id="src", output_id="tgt_A", registry=registry),
        CopyAction(id="B", input_id="tgt_A", output_id="tgt_B", registry=registry),
        CopyAction(id="C", input_id="tgt_A", output_id="tgt_C", registry=registry),
        CustomDataFrameAction(
            id="D", input_ids=["tgt_B", "tgt_C"], output_ids=["tgt_D"], registry=registry,
            transformers=[
                SQLDfsTransformer(
                    code={
                        "tgt_D": "SELECT lastname, firstname, sum(rating) AS rating FROM ("
                        "SELECT lastname, firstname, rating FROM tgt_B "
                        "UNION ALL SELECT lastname, firstname, rating FROM tgt_C"
                        ") GROUP BY lastname, firstname"
                    }
                )
            ],
        ),
    ]
    state = ActionDAGRun(ActionDAG(actions), registry, parallelism=2).run(spark)
    assert set(state.action_states.values()) == {"SUCCEEDED"}
    for t, expected in (("tgt_B", 5), ("tgt_C", 5), ("tgt_D", 10)):
        rows = spark.read.parquet(str(tmp_path / t)).select("rating").collect()
        assert len(rows) == 1 and int(rows[0][0]) == expected


def test_toplevel_partition_values_override_partition_diff(spark, tmp_path):
    """ActionDAGTest.scala:460 'positive top-level partition values filter,
    ignoring executionMode=PartitionDiffMode': with run-level partition
    values, the diff is NOT computed — the given partitions are processed
    even when the output already contains them."""
    registry = InstanceRegistry()
    df = spark.createDataFrame(
        [
            ("20180101", "person", "doe", "john", 5),
            ("20190101", "company", "olmo", "-", 10),
        ],
        "dt string, type string, lastname string, firstname string, rating int",
    )
    df.write.partitionBy("dt", "type").parquet(str(tmp_path / "src"))
    registry.register_data_object(
        ParquetFileDataObject(id="src", path=str(tmp_path / "src"), partitions=["dt", "type"])
    )
    registry.register_data_object(
        ParquetFileDataObject(id="tgt1", path=str(tmp_path / "tgt1"), partitions=["dt", "type"])
    )
    registry.register_data_object(
        ParquetFileDataObject(id="tgt2", path=str(tmp_path / "tgt2"), partitions=["dt"])
    )

    def run():
        registry.actions.clear()
        a = CopyAction(
            id="a", input_id="src", output_id="tgt1", registry=registry,
            execution_mode=PartitionDiffMode(),
        )
        b = CopyAction(id="b", input_id="tgt1", output_id="tgt2", registry=registry)
        return ActionDAGRun(
            ActionDAG([a, b]), registry,
            partition_values=[PartitionValues.of({"dt": "20180101"})],
        ).run(spark)

    state1 = run()
    assert state1.action_states == {"a": "SUCCEEDED", "b": "SUCCEEDED"}
    got = spark.read.parquet(str(tmp_path / "tgt2"))
    assert [int(r[0]) for r in got.select("rating").collect()] == [5]
    # the partition is already loaded — PartitionDiffMode alone would skip;
    # the run-level filter must override it and reprocess
    state2 = run()
    assert state2.action_states == {"a": "SUCCEEDED", "b": "SUCCEEDED"}
    assert [int(r[0]) for r in spark.read.parquet(str(tmp_path / "tgt2")).select("rating").collect()] == [5]


def test_union_two_streams_streaming_once(spark, tmp_path):
    """ActionDAGTest.scala:881 'union 2 streams with SparkStreamingOnceMode':
    a CustomDataFrameAction with TWO streaming inputs unions them; a second
    run with no new files writes nothing; a third run picks up only the new
    file in src2."""
    registry = InstanceRegistry()
    schema = "lastname string, firstname string, rating int"
    src1, src2 = str(tmp_path / "src1"), str(tmp_path / "src2")
    spark.createDataFrame([("doe", "john", 5)], schema).coalesce(1).write.parquet(src1)
    spark.createDataFrame([("einstein", "albert", 2)], schema).coalesce(1).write.parquet(src2)
    registry.register_data_object(ParquetFileDataObject(id="src1", path=src1, schema=schema))
    registry.register_data_object(ParquetFileDataObject(id="src2", path=src2, schema=schema))
    registry.register_data_object(
        ParquetFileDataObject(id="tgt1", path=str(tmp_path / "tgt1"), save_mode="append")
    )

    def run(n):
        registry.actions.clear()
        action = CustomDataFrameAction(
            id=f"u{n}", input_ids=["src1", "src2"], output_ids=["tgt1"], registry=registry,
            streaming_input_ids=["src1", "src2"],
            execution_mode=SparkStreamingMode(
                checkpoint_location=str(tmp_path / "ckpt"), trigger_type="availableNow"
            ),
            transformers=[
                SQLDfsTransformer(
                    code={"tgt1": "SELECT * FROM src1 UNION ALL SELECT * FROM src2"}
                )
            ],
        )
        return ActionDAGRun(ActionDAG([action]), registry).run(spark)

    run(1)
    got = {tuple(r) for r in spark.read.parquet(str(tmp_path / "tgt1")).collect()}
    assert got == {("doe", "john", 5), ("einstein", "albert", 2)}

    run(2)  # no new data
    assert spark.read.parquet(str(tmp_path / "tgt1")).count() == 2

    spark.createDataFrame([("doe", "john 2", 10)], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src2)
    run(3)
    got3 = {tuple(r) for r in spark.read.parquet(str(tmp_path / "tgt1")).collect()}
    assert got3 == {("doe", "john", 5), ("einstein", "albert", 2), ("doe", "john 2", 10)}


def test_streaming_once_then_normal_batch(spark, tmp_path):
    """ActionDAGTest.scala:819 '2 actions in sequence, first is
    SparkStreamingOnceMode, second is normal': the streaming copy feeds a
    plain batch copy in the same DAG run."""
    registry = InstanceRegistry()
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [("doe", "john", 5)], "lastname string, firstname string, rating int"
    ).coalesce(1).write.parquet(src)
    registry.register_data_object(
        ParquetFileDataObject(
            id="src", path=src, schema="lastname string, firstname string, rating int"
        )
    )
    registry.register_data_object(
        ParquetFileDataObject(id="tgt1", path=str(tmp_path / "tgt1"), save_mode="append")
    )
    registry.register_data_object(ParquetFileDataObject(id="tgt2", path=str(tmp_path / "tgt2")))

    def run(n):
        registry.actions.clear()
        CopyAction(
            id=f"a{n}", input_id="src", output_id="tgt1", registry=registry,
            execution_mode=SparkStreamingMode(
                checkpoint_location=str(tmp_path / "ckpt"), trigger_type="availableNow"
            ),
        )
        CopyAction(id=f"b{n}", input_id="tgt1", output_id="tgt2", registry=registry)
        return ActionDAGRun(ActionDAG(list(registry.actions.values())), registry).run(spark)

    state1 = run(1)
    assert set(state1.action_states.values()) == {"SUCCEEDED"}
    assert spark.read.parquet(str(tmp_path / "tgt2")).count() == 1

    # new file appears → second run flows the increment through both actions
    spark.createDataFrame(
        [("einstein", "albert", 2)], "lastname string, firstname string, rating int"
    ).coalesce(1).write.mode("append").parquet(src)
    state2 = run(2)
    assert set(state2.action_states.values()) == {"SUCCEEDED"}
    got = {tuple(r) for r in spark.read.parquet(str(tmp_path / "tgt2")).collect()}
    assert got == {("doe", "john", 5), ("einstein", "albert", 2)}


def test_skipped_predecessor_execution_condition_true(spark, tmp_path):
    """ActionDAGTest.scala:1003/1063/1119 'first is DataFrameIncrementalMode,
    second with executionCondition=true (and ProcessAllMode)': on the second
    run the first action skips (no new data) but the second still executes,
    reading tgt1 from storage and the UPDATED src2."""
    registry = InstanceRegistry()
    import datetime

    schema = "lastname string, firstname string, rating int, tstmp timestamp"
    spark.createDataFrame(
        [("doe", "john", 5, datetime.datetime(2024, 1, 1))], schema
    ).write.parquet(str(tmp_path / "src1"))
    spark.createDataFrame(
        [("doe", "john", "waikiki beach")], "lastname string, firstname string, address string"
    ).write.parquet(str(tmp_path / "src2"))
    registry.register_data_object(ParquetFileDataObject(id="src1", path=str(tmp_path / "src1")))
    registry.register_data_object(ParquetFileDataObject(id="src2", path=str(tmp_path / "src2")))
    registry.register_data_object(
        ParquetFileDataObject(id="tgt1", path=str(tmp_path / "tgt1"), save_mode="append")
    )
    registry.register_data_object(ParquetFileDataObject(id="tgt2", path=str(tmp_path / "tgt2")))

    def run():
        registry.actions.clear()
        a = CopyAction(
            id="a", input_id="src1", output_id="tgt1", registry=registry,
            execution_mode=DataFrameIncrementalMode(compare_col="tstmp"),
        )
        b = CustomDataFrameAction(
            id="b", input_ids=["tgt1", "src2"], output_ids=["tgt2"], registry=registry,
            execution_condition="true", execution_mode=ProcessAllMode(),
            transformers=[
                SQLDfsTransformer(
                    code={
                        "tgt2": "SELECT rating, address FROM src2 "
                        "JOIN tgt1 USING (lastname, firstname)"
                    }
                )
            ],
        )
        return ActionDAGRun(ActionDAG([a, b]), registry).run(spark)

    state1 = run()
    assert state1.action_states == {"a": "SUCCEEDED", "b": "SUCCEEDED"}
    r1 = {tuple(r) for r in spark.read.parquet(str(tmp_path / "tgt2")).collect()}
    assert r1 == {(5, "waikiki beach")}

    # second run: src1 unchanged → a skips; src2 updated → b must still run
    spark.createDataFrame(
        [("doe", "john", "honolulu")], "lastname string, firstname string, address string"
    ).write.mode("overwrite").parquet(str(tmp_path / "src2"))
    state2 = run()
    assert state2.action_states["a"] == "SKIPPED"
    assert state2.action_states["b"] == "SUCCEEDED"
    r2 = {tuple(r) for r in spark.read.parquet(str(tmp_path / "tgt2")).collect()}
    assert r2 == {(5, "honolulu")}


def test_skipped_action_fails_metrics_fail_condition(spark, tmp_path):
    """ActionDAGTest.scala:1202 'Action skipped because of no-data fails with
    metricsFailCondition': a NO-DATA skip reports ONLY `skipped=true`
    metrics, and a fail condition matching it turns the skip into a run
    failure. A condition-based skip (executionCondition false) must NOT
    trigger the fail condition — the reference evaluates it only for
    NoDataToProcessWarning."""
    registry = InstanceRegistry()
    df = spark.createDataFrame(
        [("doe", "john", 5)], "lastname string, firstname string, rating int"
    )
    df.write.partitionBy("lastname").parquet(str(tmp_path / "src"))
    registry.register_data_object(
        ParquetFileDataObject(id="src", path=str(tmp_path / "src"), partitions=["lastname"])
    )
    registry.register_data_object(
        ParquetFileDataObject(id="tgt1", path=str(tmp_path / "tgt1"), partitions=["lastname"])
    )

    def make(n, **kw):
        registry.actions.clear()
        return CopyAction(
            id=f"a{n}", input_id="src", output_id="tgt1", registry=registry,
            execution_mode=PartitionDiffMode(), **kw,
        )

    # run 1 loads the only partition; run 2's diff is empty → NoData skip →
    # the skip metric trips the fail condition → run FAILS
    a1 = make(1)
    assert ActionDAGRun(ActionDAG([a1]), registry).run(spark).action_states["a1"] == "SUCCEEDED"
    a2 = make(
        2,
        metrics_fail_condition=lambda m: "was skipped" if m.get("tgt1", {}).get("skipped") else None,
    )
    with pytest.raises(DAGError):
        ActionDAGRun(ActionDAG([a2]), registry).run(spark)
    # the skipped run's metrics carry ONLY the skip flag, no stale counters
    assert a2.runtime_metrics["tgt1"] == {"skipped": True}

    # condition-based skip: same fail condition, but executionCondition=false
    # skips WITHOUT evaluating it (reference: only NoDataToProcessWarning
    # skips are metricsFailCondition-checked)
    a3 = make(
        3,
        execution_condition=lambda sfs: False,
        metrics_fail_condition=lambda m: "was skipped" if m.get("tgt1", {}).get("skipped") else None,
    )
    state3 = ActionDAGRun(ActionDAG([a3]), registry).run(spark)
    assert state3.action_states["a3"] == "SKIPPED"


def test_partition_diff_select_expression(spark, tmp_path):
    """ActionDAGTest.scala:614 'PartitionDiffMode and selectExpression': the
    hook narrows the computed diff — here to the single oldest missing
    partition per run."""
    registry = InstanceRegistry()
    df = spark.createDataFrame(
        [("a", 1), ("b", 2), ("c", 3)], "p string, v int"
    )
    df.write.partitionBy("p").parquet(str(tmp_path / "src"))
    registry.register_data_object(
        ParquetFileDataObject(id="src", path=str(tmp_path / "src"), partitions=["p"])
    )
    registry.register_data_object(
        ParquetFileDataObject(id="tgt1", path=str(tmp_path / "tgt1"), partitions=["p"])
    )

    def run(n):
        registry.actions.clear()
        a = CopyAction(
            id=f"a{n}", input_id="src", output_id="tgt1", registry=registry,
            execution_mode=PartitionDiffMode(
                select_expression=lambda missing: sorted(missing, key=str)[:1]
            ),
        )
        return ActionDAGRun(ActionDAG([a]), registry).run(spark)

    state1 = run(1)
    assert state1.action_metrics["a1"]["tgt1"]["records_written"] == 1
    assert {r["p"] for r in spark.read.parquet(str(tmp_path / "tgt1")).collect()} == {"a"}
    state2 = run(2)
    assert {r["p"] for r in spark.read.parquet(str(tmp_path / "tgt1")).collect()} == {"a", "b"}
    run(3)
    state4 = run(4)  # backlog drained → skip
    assert state4.action_states["a4"] == "SKIPPED"


def test_partition_diff_fail_condition(spark, tmp_path):
    """ActionDAGTest.scala:1221 'fails because of PartitionDiffMode
    failCondition': the mode computes its diff, the fail condition rejects
    it, the run FAILS (not skips)."""
    registry = InstanceRegistry()
    df = spark.createDataFrame(
        [("doe", "john", 5), ("smith", "jane", 3)],
        "lastname string, firstname string, rating int",
    )
    df.write.partitionBy("lastname").parquet(str(tmp_path / "src"))
    registry.register_data_object(
        ParquetFileDataObject(id="src", path=str(tmp_path / "src"), partitions=["lastname"])
    )
    registry.register_data_object(
        ParquetFileDataObject(id="tgt1", path=str(tmp_path / "tgt1"), partitions=["lastname"])
    )
    a = CopyAction(
        id="a", input_id="src", output_id="tgt1", registry=registry,
        execution_mode=PartitionDiffMode(
            fail_condition=lambda res: (
                f"{len(res.input_partition_values)} new partitions is more than 1"
                if len(res.input_partition_values) > 1
                else None
            )
        ),
    )
    with pytest.raises(DAGError):
        ActionDAGRun(ActionDAG([a]), registry).run(spark)
    assert not (tmp_path / "tgt1").exists() or spark.read.parquet(str(tmp_path / "tgt1")).count() == 0


def test_empty_dataframe_write_no_exception(spark, tmp_path):
    """ActionDAGTest.scala:1264 'dont throw exception if no output metrics on
    empty DataFrame': a transformer filtering everything away still writes
    (an empty output) and the run SUCCEEDS with records_written=0."""
    registry = InstanceRegistry()
    _people_df(spark).write.parquet(str(tmp_path / "src"))
    registry.register_data_object(ParquetFileDataObject(id="src", path=str(tmp_path / "src")))
    registry.register_data_object(ParquetFileDataObject(id="tgt1", path=str(tmp_path / "tgt1")))
    from smart_data_lake_spark.transformers import FilterTransformer

    a = CopyAction(
        id="a", input_id="src", output_id="tgt1", registry=registry,
        transformers=[FilterTransformer(filter_clause="false")],
    )
    state = ActionDAGRun(ActionDAG([a]), registry).run(spark)
    assert state.action_states == {"a": "SUCCEEDED"}
    assert state.action_metrics["a"]["tgt1"]["records_written"] == 0
    assert spark.read.parquet(str(tmp_path / "tgt1")).count() == 0


def test_partition_diff_second_run_skips_unpartitioned_consumer(spark, tmp_path):
    """ActionDAGTest.scala:1291 'PartitionDiffMode, second action can not
    handle partitions': run 1 loads the partition; run 2 finds no new
    partitions → first action SKIPPED, downstream unpartitioned copy SKIPPED
    too (skip propagates)."""
    registry = InstanceRegistry()
    df = spark.createDataFrame(
        [("doe", "john", 5)], "lastname string, firstname string, rating int"
    )
    df.write.partitionBy("lastname").parquet(str(tmp_path / "src"))
    registry.register_data_object(
        ParquetFileDataObject(id="src", path=str(tmp_path / "src"), partitions=["lastname"])
    )
    registry.register_data_object(
        ParquetFileDataObject(id="tgt1", path=str(tmp_path / "tgt1"), partitions=["lastname"])
    )
    registry.register_data_object(ParquetFileDataObject(id="tgt2", path=str(tmp_path / "tgt2")))

    def run():
        registry.actions.clear()
        a = CopyAction(
            id="a", input_id="src", output_id="tgt1", registry=registry,
            execution_mode=PartitionDiffMode(),
        )
        b = CopyAction(id="b", input_id="tgt1", output_id="tgt2", registry=registry)
        return ActionDAGRun(ActionDAG([a, b]), registry).run(spark)

    state1 = run()
    assert state1.action_states == {"a": "SUCCEEDED", "b": "SUCCEEDED"}
    assert spark.read.parquet(str(tmp_path / "tgt2")).count() == 1

    state2 = run()
    assert state2.action_states == {"a": "SKIPPED", "b": "SKIPPED"}


def test_dag_cycle_detected():
    """DAGTest.scala:190 'create dag: detect loop': a write-read cycle
    between actions raises DAGError at construction."""
    registry = InstanceRegistry()
    registry.register_data_object(ParquetFileDataObject(id="x", path="/tmp/x"))
    registry.register_data_object(ParquetFileDataObject(id="y", path="/tmp/y"))
    a = CopyAction(id="a", input_id="x", output_id="y", registry=registry)
    b = CopyAction(id="b", input_id="y", output_id="x", registry=registry)
    with pytest.raises(DAGError, match="cycle"):
        ActionDAG([a, b])


def test_failure_does_not_cancel_independent_branch(spark, tmp_path):
    """DAGTest.scala:161 'exception in running dag: run pending tasks if not
    dependent': a failing action cancels only its downstream; an unconnected
    branch still completes."""
    from smart_data_lake_spark.expectations import CountExpectation

    registry = InstanceRegistry()
    _people_df(spark).write.parquet(str(tmp_path / "s1"))
    _people_df(spark).write.parquet(str(tmp_path / "s2"))
    for t in ("bad_out", "bad_next", "good_out"):
        registry.register_data_object(ParquetFileDataObject(id=t, path=str(tmp_path / t)))
    registry.register_data_object(ParquetFileDataObject(id="s1", path=str(tmp_path / "s1")))
    registry.register_data_object(ParquetFileDataObject(id="s2", path=str(tmp_path / "s2")))
    bad = CopyAction(
        id="bad", input_id="s1", output_id="bad_out", registry=registry,
        expectations=[CountExpectation(name="min", expectation="> 1000")],  # fails at exec
    )
    bad_child = CopyAction(id="bad_child", input_id="bad_out", output_id="bad_next", registry=registry)
    good = CopyAction(id="good", input_id="s2", output_id="good_out", registry=registry)
    with pytest.raises(DAGError):
        ActionDAGRun(ActionDAG([bad, bad_child, good]), registry, parallelism=2).run(spark)
    # the unconnected branch ran to completion despite the failure
    assert spark.read.parquet(str(tmp_path / "good_out")).count() == 1
    assert not (tmp_path / "bad_next").exists()


def test_partition_diff_apply_condition_override(spark, tmp_path):
    """ExecutionModeTest.scala 'positive/negative applyCondition': an
    explicit apply_condition overrides the given-partition-values default in
    both directions."""
    from smart_data_lake_spark.dataobjects import MockDataObject

    in_do = MockDataObject(id="in", partitions=["p"])
    in_do._df = spark.createDataFrame([("a", 1), ("b", 2)], "p string, v int")
    out_do = MockDataObject(id="out", partitions=["p"])
    out_do._df = spark.createDataFrame([("a", 1)], "p string, v int")
    given = [PartitionValues.of({"p": "a"})]

    # positive applyCondition: diff IS computed even with given values;
    # the given values narrow the input side → 'a' already loaded → no_data
    mode_pos = PartitionDiffMode(apply_condition=lambda pvs: True)
    assert mode_pos.apply(spark, in_do, out_do, given, {}).no_data

    # negative applyCondition: mode skipped even with NO given values
    mode_neg = PartitionDiffMode(apply_condition=lambda pvs: False)
    res = mode_neg.apply(spark, in_do, out_do, [], {})
    assert not res.no_data and res.input_partition_values == []

    # default: given values suppress the diff and flow through
    res_d = PartitionDiffMode().apply(spark, in_do, out_do, given, {})
    assert res_d.input_partition_values == given and not res_d.no_data


def test_incremental_mode_empty_source_skips(spark):
    """ExecutionModeTest.scala 'DataFrameIncrementalMode empty source': an
    empty input skips (no_data) when the output exists — even an EMPTY
    output — and processes all when the output doesn't exist yet."""
    from smart_data_lake_spark.dataobjects import MockDataObject

    schema = "v int, ts timestamp"
    empty = spark.createDataFrame([], schema)
    in_do = MockDataObject(id="in")
    in_do._df = empty
    out_do = MockDataObject(id="out")
    out_do._df = empty
    mode = DataFrameIncrementalMode(compare_col="ts")
    assert mode.apply(spark, in_do, out_do, [], {}).no_data

    out_missing = MockDataObject(id="out2")  # exists() False without _df
    res = mode.apply(spark, in_do, out_missing, [], {})
    assert not res.no_data and res.filter is None


def test_file_move_archive_relative_and_inside_partition(spark, tmp_path):
    """ExecutionModeTest.scala FileIncrementalMoveMode archive scenarios:
    relative archivePath resolves against the SOURCE root; with
    archiveInsidePartition files archive inside their own partition dir; an
    empty source skips (no data)."""
    import os

    from smart_data_lake_spark.execution_modes import FileIncrementalMoveMode

    # relative path: files land under <src>/archive, partition dirs flattened
    src = tmp_path / "srcA"
    registry = InstanceRegistry()
    registry.register_data_object(
        ParquetFileDataObject(id="srcA", path=str(src), partitions=["lastname"])
    )
    registry.register_data_object(ParquetFileDataObject(id="dstA", path=str(tmp_path / "dstA")))
    _people_df(spark).write.partitionBy("lastname").parquet(str(src))
    action = CopyAction(
        id="mvA", input_id="srcA", output_id="dstA", registry=registry,
        execution_mode=FileIncrementalMoveMode(archive_path="archive"),
    )
    ActionDAGRun(ActionDAG([action]), registry).run(spark)
    assert any(f.endswith(".parquet") for f in os.listdir(src / "archive"))
    assert not any((src / "lastname=doe").glob("*.parquet"))

    # archiveInsidePartition: files stay in <partition>/archive
    src2 = tmp_path / "srcB"
    registry2 = InstanceRegistry()
    registry2.register_data_object(
        ParquetFileDataObject(id="srcB", path=str(src2), partitions=["lastname"])
    )
    registry2.register_data_object(ParquetFileDataObject(id="dstB", path=str(tmp_path / "dstB")))
    _people_df(spark).write.partitionBy("lastname").parquet(str(src2))
    action2 = CopyAction(
        id="mvB", input_id="srcB", output_id="dstB", registry=registry2,
        execution_mode=FileIncrementalMoveMode(archive_path="archive", archive_inside_partition=True),
    )
    ActionDAGRun(ActionDAG([action2]), registry2).run(spark)
    assert not (src2 / "archive").exists()
    assert any((src2 / "lastname=doe" / "archive").glob("*.parquet"))

    # empty source → NoData skip, not an empty write
    src3 = tmp_path / "srcC"
    os.makedirs(src3)
    registry3 = InstanceRegistry()
    registry3.register_data_object(
        ParquetFileDataObject(id="srcC", path=str(src3), schema="lastname string, rating int")
    )
    registry3.register_data_object(ParquetFileDataObject(id="dstC", path=str(tmp_path / "dstC")))
    action3 = CopyAction(
        id="mvC", input_id="srcC", output_id="dstC", registry=registry3,
        execution_mode=FileIncrementalMoveMode(archive_path="archive"),
    )
    state3 = ActionDAGRun(ActionDAG([action3]), registry3).run(spark)
    assert state3.action_states["mvC"] == "SKIPPED"


# --------------------------------------------------------------------------
# workflow/DAGTest.scala scenario parity (8): the pure DAG-engine semantics.
# 'detect loop' lives in test_dag_parity::test_dag_cycle_detected; 'exception
# in running dag: run pending tasks if not dependent' in
# test_failure_does_not_cancel_independent_branch.
# --------------------------------------------------------------------------


def _chain_actions(spark, reg, pairs):
    from smart_data_lake_spark.actions.copy import CopyAction
    from smart_data_lake_spark.dataobjects.memory import MockDataObject

    ids = {x for p in pairs for x in p}
    for do_id in sorted(ids):
        if do_id not in reg.data_objects:
            reg.register_data_object(MockDataObject(id=do_id))
    actions = [
        CopyAction(id=f"{a}_{b}", input_id=a, output_id=b, registry=reg) for a, b in pairs
    ]
    return actions


def test_dagtest_linear_unordered(spark):
    """DAGTest:68 — actions REGISTERED out of order still schedule in
    dependency order."""
    from smart_data_lake_spark.config import InstanceRegistry
    from smart_data_lake_spark.plans.dag import ActionDAG

    reg = InstanceRegistry()
    # register C->D first, then A->B, then B->C: construction order must not matter
    actions = _chain_actions(spark, reg, [("c", "d"), ("a", "b"), ("b", "c")])
    dag = ActionDAG(actions)
    assert dag.topological_order() == ["a_b", "b_c", "c_d"]


def test_dagtest_split_and_join(spark):
    """DAGTest:83/:109 — diamond A→(B,C)→D: both middles run after the
    head, the join waits for both (order deterministic alphabetical)."""
    from smart_data_lake_spark.config import InstanceRegistry
    from smart_data_lake_spark.actions.custom import CustomDataFrameAction
    from smart_data_lake_spark.actions.copy import CopyAction
    from smart_data_lake_spark.dataobjects.memory import MockDataObject
    from smart_data_lake_spark.plans.dag import ActionDAG

    reg = InstanceRegistry()
    for do_id in ("src", "m1", "m2", "out"):
        reg.register_data_object(MockDataObject(id=do_id))
    head1 = CopyAction(id="b_mid1", input_id="src", output_id="m1", registry=reg)
    head2 = CopyAction(id="a_mid2", input_id="src", output_id="m2", registry=reg)
    from smart_data_lake_spark.transformers.dfs_transformers import PythonCodeDfsTransformer

    join = CustomDataFrameAction(
        id="z_join", input_ids=["m1", "m2"], output_ids=["out"], registry=reg,
        transformers=[PythonCodeDfsTransformer(
            fn=lambda spark, dfs, options: {"out": dfs["m1"].unionByName(dfs["m2"])}
        )],
    )
    order = ActionDAG([head1, head2, join]).topological_order()
    assert order == ["a_mid2", "b_mid1", "z_join"]  # parallel heads alphabetical


def test_dagtest_parallel_nodes_alphabetical(spark):
    """DAGTest:133 — concurrently-READY nodes are always taken in name
    order, including waves unlocked mid-run."""
    from smart_data_lake_spark.config import InstanceRegistry
    from smart_data_lake_spark.plans.dag import ActionDAG

    reg = InstanceRegistry()
    actions = _chain_actions(
        spark, reg,
        [("s", "z1"), ("s", "a1"), ("z1", "q1"), ("a1", "b1")],
    )
    order = ActionDAG(actions).topological_order()
    assert order.index("s_a1") < order.index("s_z1")
    # second wave (unlocked after the heads) also alphabetical
    assert order.index("a1_b1") < order.index("z1_q1")


def test_dagtest_unconnected_subgraphs(spark, tmp_path):
    """DAGTest:197 — two disjoint pipelines run in one DAG, both complete."""
    from smart_data_lake_spark.config import InstanceRegistry
    from smart_data_lake_spark.plans.dag import ActionDAGRun
    from smart_data_lake_spark.dataobjects.memory import MockDataObject

    reg = InstanceRegistry()
    actions = _chain_actions(spark, reg, [("a", "b"), ("x", "y")])
    df = spark.createDataFrame([(1,)], "v int")
    reg.data_objects["a"].write_dataframe(df)
    reg.data_objects["x"].write_dataframe(df)
    from smart_data_lake_spark.plans.dag import ActionDAG

    state = ActionDAGRun(ActionDAG(actions), reg).run(spark)
    assert set(state.action_states.values()) == {"SUCCEEDED"}
    assert reg.data_objects["b"].get_dataframe(spark).count() == 1
    assert reg.data_objects["y"].get_dataframe(spark).count() == 1


def test_dagtest_failure_cancels_dependents_only(spark, tmp_path):
    """DAGTest:147/:161 — a failing node CANCELS its pending dependents but
    an unconnected branch still runs."""
    from smart_data_lake_spark.config import InstanceRegistry
    from smart_data_lake_spark.actions.custom import CustomDataFrameAction
    from smart_data_lake_spark.plans.dag import ActionDAGRun
    from smart_data_lake_spark.dataobjects.memory import MockDataObject

    reg = InstanceRegistry()
    for do_id in ("a", "b", "c", "x", "y"):
        reg.register_data_object(MockDataObject(id=do_id))

    calls = []

    def boom_fn(spark, dfs, options):
        calls.append(1)
        if len(calls) > 1:  # succeed in INIT (lineage build), fail in EXEC
            raise RuntimeError("boom")
        return {"b": dfs["a"]}

    from smart_data_lake_spark.transformers.dfs_transformers import PythonCodeDfsTransformer

    failing = CustomDataFrameAction(
        id="fail_ab", input_ids=["a"], output_ids=["b"], registry=reg,
        transformers=[PythonCodeDfsTransformer(fn=boom_fn)],
    )
    from smart_data_lake_spark.actions.copy import CopyAction

    dependent = CopyAction(id="dep_bc", input_id="b", output_id="c", registry=reg)
    independent = CopyAction(id="ind_xy", input_id="x", output_id="y", registry=reg)
    df = spark.createDataFrame([(1,)], "v int")
    reg.data_objects["a"].write_dataframe(df)
    reg.data_objects["x"].write_dataframe(df)
    from smart_data_lake_spark.plans.dag import ActionDAG

    run = ActionDAGRun(ActionDAG([failing, dependent, independent]), reg)
    try:
        state = run.run(spark)
    except Exception:
        state = run.state
    assert state.action_states["fail_ab"] == "FAILED"
    assert state.action_states["dep_bc"] == "CANCELLED"
    assert state.action_states["ind_xy"] == "SUCCEEDED"


def test_graphutil_connected_closures():
    """util/misc/GraphUtilTest (2 scenarios) — forward and reverse
    transitive closures over the edge set."""
    from smart_data_lake_spark.plans.dag import (
        connected_nodes_forward,
        connected_nodes_reverse,
    )

    edges = {("A", "B"), ("A", "C"), ("B", "D"), ("C", "D"), ("D", "E")}
    all_nodes = {"A", "B", "C", "D", "E"}
    assert connected_nodes_forward(edges, "A") == all_nodes
    assert connected_nodes_forward(edges, "B") == {"B", "D", "E"}
    assert connected_nodes_forward(edges, "D") == {"D", "E"}
    assert connected_nodes_forward(edges, "E") == {"E"}
    assert connected_nodes_reverse(edges, "E") == all_nodes
    assert connected_nodes_reverse(edges, "D") == {"A", "B", "C", "D"}
    assert connected_nodes_reverse(edges, "B") == {"A", "B"}
    assert connected_nodes_reverse(edges, "A") == {"A"}
