"""Execution modes, DAG behaviors, data quality, housekeeping, HTTP DOs.

Ports the remaining ActionDAGTest.scala:65-1327 scenario classes: partition-
diff incremental runs, NoData/skip propagation, recovery from a failed run,
metricsFailCondition, plus the expectations tail and housekeeping modes.
"""

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from smart_data_lake_spark.actions import CopyAction, CustomDataFrameAction
from smart_data_lake_spark.config import InstanceRegistry
from smart_data_lake_spark.dataobjects import MockDataObject, ParquetFileDataObject
from smart_data_lake_spark.execution_modes import (
    DataFrameIncrementalMode,
    PartitionDiffMode,
)
from smart_data_lake_spark.expectations import (
    AvgCountPerPartitionExpectation,
    CountExpectation,
    ExpectationScope,
    ExpectationValidationError,
    SQLQueryExpectation,
    TransferRateExpectation,
)
from smart_data_lake_spark.housekeeping import (
    PartitionArchiveCompactionMode,
    PartitionRetentionMode,
)
from smart_data_lake_spark.plans import ActionDAG, ActionDAGRun
from smart_data_lake_spark.plans.dag import DAGError, StateStore


def _partitioned_registry(spark, tmp_path, in_rows):
    registry = InstanceRegistry()
    registry.register_data_object(
        ParquetFileDataObject(id="src", path=str(tmp_path / "src"), partitions=["p"])
    )
    registry.register_data_object(
        ParquetFileDataObject(id="dst", path=str(tmp_path / "dst"), partitions=["p"])
    )
    spark.createDataFrame(in_rows).write.partitionBy("p").mode("overwrite").parquet(
        str(tmp_path / "src")
    )
    return registry


def test_partition_diff_mode_e2e(spark, tmp_path):
    """Run1 copies all partitions; after adding one input partition, run2
    processes ONLY the new partition; run3 finds nothing and skips."""
    rows = [Row(p="a", v=1), Row(p="a", v=2), Row(p="b", v=3)]
    registry = _partitioned_registry(spark, tmp_path, rows)

    def make_action(n):
        return CopyAction(
            id=f"c{n}", input_id="src", output_id="dst",
            execution_mode=PartitionDiffMode(), registry=registry,
        )

    state1 = ActionDAGRun(ActionDAG([make_action(1)]), registry).run(spark)
    assert state1.action_metrics["c1"]["dst"]["records_written"] == 3

    spark.createDataFrame([Row(p="c", v=9)]).write.partitionBy("p").mode("append").parquet(
        str(tmp_path / "src")
    )
    state2 = ActionDAGRun(ActionDAG([make_action(2)]), registry).run(spark)
    assert state2.action_metrics["c2"]["dst"]["records_written"] == 1  # only partition c

    state3 = ActionDAGRun(ActionDAG([make_action(3)]), registry).run(spark)
    assert state3.action_states["c3"] == "SKIPPED"  # NoData


def test_nodata_skip_propagates_downstream(spark, tmp_path):
    """First action finds no partitions to process → downstream action must
    be SKIPPED too (Action.scala:189-207)."""
    rows = [Row(p="a", v=1)]
    registry = _partitioned_registry(spark, tmp_path, rows)
    registry.register_data_object(
        ParquetFileDataObject(id="dst2", path=str(tmp_path / "dst2"), partitions=["p"])
    )
    a1 = CopyAction(id="a1", input_id="src", output_id="dst",
                    execution_mode=PartitionDiffMode(), registry=registry)
    a2 = CopyAction(id="a2", input_id="dst", output_id="dst2", registry=registry)
    ActionDAGRun(ActionDAG([a1, a2]), registry).run(spark)  # both process
    state = ActionDAGRun(
        ActionDAG([
            CopyAction(id="a1", input_id="src", output_id="dst",
                       execution_mode=PartitionDiffMode(), registry=registry),
            CopyAction(id="a2", input_id="dst", output_id="dst2", registry=registry),
        ]),
        registry,
    ).run(spark)
    assert state.action_states["a1"] == "SKIPPED"
    assert state.action_states["a2"] == "SKIPPED"


def test_dataframe_incremental_mode_append_e2e(spark, tmp_path):
    """High-watermark append: run1 writes all, run2 appends only new rows."""
    registry = InstanceRegistry()
    registry.register_data_object(MockDataObject(id="src"))
    registry.register_data_object(
        ParquetFileDataObject(id="dst", path=str(tmp_path / "inc"), save_mode="append")
    )
    src = registry.get_data_object("src")
    src._df = spark.createDataFrame([Row(seq=1, v="a"), Row(seq=2, v="b")]).localCheckpoint()

    def run(n):
        a = CopyAction(
            id=f"i{n}", input_id="src", output_id="dst",
            execution_mode=DataFrameIncrementalMode(compare_col="seq"), registry=registry,
        )
        return ActionDAGRun(ActionDAG([a]), registry).run(spark)

    run(1)
    src._df = spark.createDataFrame(
        [Row(seq=1, v="a"), Row(seq=2, v="b"), Row(seq=3, v="c")]
    ).localCheckpoint()
    state = run(2)
    assert state.action_metrics["i2"]["dst"]["records_written"] == 1  # only seq=3
    out = spark.read.parquet(str(tmp_path / "inc"))
    assert {tuple(r) for r in out.select("seq", "v").collect()} == {(1, "a"), (2, "b"), (3, "c")}


def test_recovery_skips_completed_actions(spark, tmp_path):
    """A failed run leaves non-final state; rerun with recover=True skips the
    succeeded action and re-runs the failed one (SmartDataLakeBuilder.scala:377-396)."""
    registry = InstanceRegistry()
    registry.register_data_object(MockDataObject(id="src"))
    registry.register_data_object(MockDataObject(id="mid"))
    registry.register_data_object(MockDataObject(id="out"))
    registry.get_data_object("src")._df = spark.createDataFrame([Row(v=1)]).localCheckpoint()
    store = StateStore(str(tmp_path / "state"))
    boom = {"on": True}
    write_counts = {"mid": 0, "out": 0}
    for do_id in ("mid", "out"):
        do = registry.get_data_object(do_id)
        original = do.write_dataframe

        def counting(df, pv=None, sm=None, merge_options=None, _id=do_id, _orig=original):
            result = _orig(df, pv, sm, merge_options)  # count successful writes only
            write_counts[_id] += 1
            return result

        do.write_dataframe = counting

    from smart_data_lake_spark.transformers import PythonCodeDfsTransformer

    def fragile(s, dfs, o):
        # exec-time failure: raise_error fires only when the plan EXECUTES,
        # so the init (analysis-only) phase passes like a real transient error
        df = dfs["mid"]
        if boom["on"]:
            df = df.select(F.when(F.lit(True), F.raise_error(F.lit("transient"))).alias("v"))
        return {"out": df}

    def build_dag():
        return ActionDAG([
            CustomDataFrameAction(
                id="ok", input_ids=["src"], output_ids=["mid"], registry=registry,
                transformers=[PythonCodeDfsTransformer(fn=lambda s, dfs, o: {"mid": dfs["src"]})],
            ),
            CustomDataFrameAction(
                id="fragile", input_ids=["mid"], output_ids=["out"], registry=registry,
                transformers=[PythonCodeDfsTransformer(fn=fragile)],
            ),
        ])

    with pytest.raises(DAGError):
        ActionDAGRun(build_dag(), registry, state_store=store).run(spark)
    assert write_counts == {"mid": 1, "out": 0}

    boom["on"] = False
    state = ActionDAGRun(build_dag(), registry, state_store=store).run(spark, recover=True)
    assert state.attempt_id == 2
    assert write_counts["mid"] == 1  # succeeded action NOT re-executed
    assert write_counts["out"] == 1
    assert state.action_states["fragile"] == "SUCCEEDED"


def test_metrics_fail_condition(spark):
    registry = InstanceRegistry()
    registry.register_data_object(MockDataObject(id="src"))
    registry.register_data_object(MockDataObject(id="out"))
    registry.get_data_object("src")._df = spark.createDataFrame([Row(v=1), Row(v=2)]).localCheckpoint()
    action = CopyAction(
        id="c", input_id="src", output_id="out", registry=registry,
        metrics_fail_condition=lambda m: "too few rows" if m["out"]["records_written"] < 5 else None,
    )
    with pytest.raises(DAGError):
        ActionDAGRun(ActionDAG([action]), registry).run(spark)


# ------------------------------------------------------------ expectations


def _expect_registry(spark):
    registry = InstanceRegistry()
    registry.register_data_object(MockDataObject(id="src"))
    registry.register_data_object(MockDataObject(id="out"))
    registry.get_data_object("src")._df = spark.createDataFrame(
        [Row(p="a", v=1), Row(p="a", v=2), Row(p="b", v=3)]
    ).localCheckpoint()
    return registry


def test_count_expectation_fails(spark):
    registry = _expect_registry(spark)
    action = CopyAction(
        id="c", input_id="src", output_id="out", registry=registry,
        expectations=[CountExpectation(name="count", expectation="> 10")],
    )
    with pytest.raises(DAGError):
        ActionDAGRun(ActionDAG([action]), registry).run(spark)


def test_sql_query_expectation_scope_all(spark):
    registry = _expect_registry(spark)
    action = CopyAction(
        id="c", input_id="src", output_id="out", registry=registry,
        expectations=[
            SQLQueryExpectation(
                name="maxV", code="SELECT max(v) FROM %{inputViewName}", expectation="= 3"
            )
        ],
    )
    state = ActionDAGRun(ActionDAG([action]), registry).run(spark)
    assert state.action_metrics["c"]["out"]["maxV"] == 3


def test_transfer_rate_expectation(spark):
    registry = _expect_registry(spark)
    action = CopyAction(
        id="c", input_id="src", output_id="out", registry=registry,
        expectations=[TransferRateExpectation()],
    )
    state = ActionDAGRun(ActionDAG([action]), registry).run(spark)
    assert state.action_metrics["c"]["out"]["records_read"] == 3

    from smart_data_lake_spark.transformers import PythonCodeDfsTransformer

    registry2 = _expect_registry(spark)
    drop_half = CustomDataFrameAction(
        id="d", input_ids=["src"], output_ids=["out"], registry=registry2,
        transformers=[
            PythonCodeDfsTransformer(fn=lambda s, dfs, o: {"out": dfs["src"].where(F.col("v") > 1)})
        ],
        expectations=[TransferRateExpectation()],
    )
    with pytest.raises(DAGError):  # 2/3 transferred != 1
        ActionDAGRun(ActionDAG([drop_half]), registry2).run(spark)


def test_avg_count_per_partition_and_job_partition_scope(spark):
    registry = _expect_registry(spark)
    out_do = registry.get_data_object("out")
    out_do.partitions = ["p"]
    action = CopyAction(
        id="c", input_id="src", output_id="out", registry=registry,
        expectations=[
            AvgCountPerPartitionExpectation(expectation="> 0"),
            CountExpectation(name="count", expectation="> 0", scope=ExpectationScope.JOB_PARTITION),
        ],
    )
    state = ActionDAGRun(ActionDAG([action]), registry).run(spark)
    metrics = state.action_metrics["c"]["out"]
    assert metrics["count#p=a"] == 2
    assert metrics["count#p=b"] == 1


def test_custom_script_action(spark, tmp_path):
    from smart_data_lake_spark.actions import CustomScriptAction

    marker = tmp_path / "ran.txt"
    registry = InstanceRegistry()
    action = CustomScriptAction(
        id="sh", cmd=f"echo done > {marker}", env={"X": "1"}, registry=registry
    )
    state = ActionDAGRun(ActionDAG([action]), registry).run(spark)
    assert state.action_states["sh"] == "SUCCEEDED"
    assert marker.read_text().strip() == "done"


def test_file_incremental_move_mode(spark, tmp_path):
    """Consumed input files are archived after processing
    (FileIncrementalMoveMode.scala:55)."""
    import os

    from smart_data_lake_spark.execution_modes import FileIncrementalMoveMode

    src = tmp_path / "src"
    archive = tmp_path / "archive"
    registry = InstanceRegistry()
    registry.register_data_object(ParquetFileDataObject(id="src", path=str(src)))
    registry.register_data_object(ParquetFileDataObject(id="dst", path=str(tmp_path / "dst")))
    spark.createDataFrame([Row(v=1), Row(v=2)]).coalesce(1).write.mode("overwrite").parquet(str(src))
    action = CopyAction(
        id="mv", input_id="src", output_id="dst", registry=registry,
        execution_mode=FileIncrementalMoveMode(archive_path=str(archive)),
    )
    state = ActionDAGRun(ActionDAG([action]), registry).run(spark)
    assert state.action_metrics["mv"]["dst"]["records_written"] == 2
    assert [f for f in os.listdir(src) if f.endswith(".parquet")] == []  # consumed
    assert any(f.endswith(".parquet") for f in os.listdir(archive))  # archived


# ------------------------------------------------------------ housekeeping


def test_partition_retention_mode(spark, tmp_path):
    do = ParquetFileDataObject(id="t", path=str(tmp_path / "t"), partitions=["dt"])
    df = spark.createDataFrame(
        [Row(dt="2024-01-01", v=1), Row(dt="2024-06-01", v=2), Row(dt="2024-06-02", v=3)]
    )
    df.write.partitionBy("dt").mode("overwrite").parquet(do.path)
    mode = PartitionRetentionMode(retention_condition="elements['dt'] >= '2024-06-01'")
    metrics = mode.post_write(spark, do)
    assert metrics["partitions_deleted"] == 1
    remaining = {pv.as_dict["dt"] for pv in do.list_partitions(spark)}
    assert remaining == {"2024-06-01", "2024-06-02"}


def test_partition_archive_compaction_mode(spark, tmp_path):
    do = ParquetFileDataObject(id="t", path=str(tmp_path / "t"), partitions=["run_id"])
    df = spark.createDataFrame([Row(run_id=n, v=n) for n in range(1, 5)])
    df.repartition(4).write.partitionBy("run_id").mode("overwrite").parquet(do.path)
    # archive: run_id < 3 → coarse bucket 0
    mode = PartitionArchiveCompactionMode(
        archive_partition_expression=(
            "CASE WHEN CAST(elements['run_id'] AS INT) < 3 "
            "THEN map('run_id', '0') ELSE elements END"
        ),
        n_files=1,
    )
    metrics = mode.post_write(spark, do)
    assert metrics["partitions_archived"] == 2
    remaining = sorted(int(pv.as_dict["run_id"]) for pv in do.list_partitions(spark))
    assert remaining == [0, 3, 4]
    assert do.get_dataframe(spark).count() == 4  # no rows lost


# ------------------------------------------------------------ HTTP DOs


class _Handler(BaseHTTPRequestHandler):
    posts: list[bytes] = []

    def log_message(self, *args):
        pass

    def do_GET(self):
        if self.path.startswith("/odata/things"):
            if "skiptoken" in self.path:
                body = {"value": [{"id": 3, "name": "c", "modified": 30}]}
            else:
                body = {
                    "value": [
                        {"id": 1, "name": "a", "modified": 10},
                        {"id": 2, "name": "b", "modified": 20},
                    ],
                    "@odata.nextLink": f"http://127.0.0.1:{self.server.server_port}/odata/things?$skiptoken=2",
                }
        else:
            body = {"records": [{"id": 1, "v": "x"}]}
        payload = json.dumps(body).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        self.wfile.write(payload)

    def do_POST(self):
        n = int(self.headers["Content-Length"])
        _Handler.posts.append(self.rfile.read(n))
        self.send_response(200)
        self.end_headers()


@pytest.fixture(scope="module")
def http_server():
    server = HTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{server.server_port}"
    server.shutdown()


def test_webservice_read_write(spark, http_server):
    from smart_data_lake_spark.dataobjects.web import WebserviceFileDataObject

    do = WebserviceFileDataObject(
        id="ws", url=f"{http_server}/api", records_field="records",
        auth_mode={"auth_type": "bearer", "token": "tkn"}, schema="id int, v string",
    )
    df = do.get_dataframe(spark)
    assert [tuple(r) for r in df.collect()] == [(1, "x")]
    metrics = do.write_dataframe(df)
    assert metrics["records_written"] == 1
    assert json.loads(_Handler.posts[-1]) == {"id": 1, "v": "x"}


def test_odata_paging_and_incremental_state(spark, http_server):
    from smart_data_lake_spark.dataobjects.web import ODataDataObject

    do = ODataDataObject(
        id="od", base_url=f"{http_server}/odata", table_name="things",
        select_cols=["id", "name", "modified"], incremental_filter_col="modified",
        schema="id int, name string, modified int",
    )
    assert do.build_query_url().endswith("/odata/things?$select=id,name,modified")
    df = do.get_dataframe(spark)
    assert df.count() == 3  # both pages via @odata.nextLink
    assert do.get_state() == "30"
    assert "$filter=(modified gt 30)" in do.build_query_url()


def test_airbyte_protocol_parsing(spark):
    from smart_data_lake_spark.dataobjects.web import AirbyteDataObject

    do = AirbyteDataObject(id="ab", cmd=["true"], stream_name="s1", schema="a int, b string")
    lines = [
        '{"type": "LOG", "log": {"message": "starting"}}',
        'plain text noise',
        '{"type": "RECORD", "record": {"stream": "s1", "data": {"a": 1, "b": "x"}}}',
        '{"type": "RECORD", "record": {"stream": "other", "data": {"a": 9, "b": "no"}}}',
        '{"type": "RECORD", "record": {"stream": "s1", "data": {"a": 2, "b": "y"}}}',
        '{"type": "STATE", "state": {}}',
    ]
    assert do.parse_messages(lines) == [{"a": 1, "b": "x"}, {"a": 2, "b": "y"}]


def test_partition_diff_alternative_output_id(spark, tmp_path):
    """ActionDAGTest.scala 'PartitionDiffMode alternativeOutputId': the
    diff compares against ANOTHER object's partitions — the first action
    reprocesses a partition its own output already has, because the
    alternative (final) output is still missing it."""
    import pyspark.sql.functions as F

    from smart_data_lake_spark.actions.copy import CopyAction
    from smart_data_lake_spark.config import InstanceRegistry
    from smart_data_lake_spark.dataobjects.file import ParquetFileDataObject
    from smart_data_lake_spark.execution_modes import PartitionDiffMode

    src = ParquetFileDataObject(id="src", path=str(tmp_path / "src"), partitions=["p"])
    mid = ParquetFileDataObject(id="mid", path=str(tmp_path / "mid"), partitions=["p"])
    fin = ParquetFileDataObject(id="fin", path=str(tmp_path / "fin"), partitions=["p"])
    df = spark.range(4).withColumn("p", (F.col("id") % 2).cast("string"))
    src.write_dataframe(df)
    mid.write_dataframe(df)  # mid already HAS both partitions
    fin.write_dataframe(df.where("p = '0'"))  # fin is missing p=1

    registry = InstanceRegistry()
    for do in (src, mid, fin):
        registry.register_data_object(do)
    action = CopyAction(
        id="a1",
        input_id="src",
        output_id="mid",
        execution_mode=PartitionDiffMode(alternative_output_id="fin"),
    )
    action.registry = registry
    res = action._apply_execution_mode(spark, {})
    got = sorted(str(pv) for pv in res.input_partition_values)
    # diff vs FIN (missing p=1), not vs mid (missing nothing)
    assert len(got) == 1 and "1" in got[0]

    # sanity: without the alternative, the diff vs mid is empty
    action2 = CopyAction(id="a2", input_id="src", output_id="mid",
                         execution_mode=PartitionDiffMode())
    action2.registry = registry
    res2 = action2._apply_execution_mode(spark, {})
    assert res2.no_data
