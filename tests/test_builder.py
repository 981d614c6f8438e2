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


def _streaming_registry(tmp_path, src_path, out_path, ckpt):
    from smart_data_lake_spark.dataobjects import ParquetFileDataObject
    from smart_data_lake_spark.execution_modes import SparkStreamingMode

    registry = InstanceRegistry()
    registry.register_data_object(
        ParquetFileDataObject(id="src", path=src_path, schema="id bigint, v string")
    )
    registry.register_data_object(ParquetFileDataObject(id="dst", path=out_path))
    CopyAction(
        id="stream_copy", input_id="src", output_id="dst", registry=registry,
        execution_mode=SparkStreamingMode(
            checkpoint_location=ckpt, trigger_type="availableNow"
        ),
    )
    return registry


def test_streaming_restart_no_duplicate_no_lost(spark, tmp_path):
    """Whole-DAG streaming loop restarted as a NEW builder with the same
    state path + checkpoints: run2 resumes from the checkpoint — the file
    added between runs is processed exactly once, nothing reprocessed
    (SmartDataLakeBuilder.scala:566-648 restart contract)."""
    src, out, ckpt = (str(tmp_path / p) for p in ("src", "out", "ckpt"))
    state_path = str(tmp_path / "state")
    spark.createDataFrame([Row(id=1, v="a")]).coalesce(1).write.mode("append").parquet(src)

    b1 = SmartDataLakeBuilder(registry=_streaming_registry(tmp_path, src, out, ckpt))
    s1 = b1.run(
        spark=spark, state_path=state_path, streaming=True,
        streaming_interval_sec=0.01, max_streaming_iterations=1,
    )
    assert s1.streaming_queries["stream_copy"][0]["checkpoint"] == ckpt
    assert spark.read.parquet(out).count() == 1

    spark.createDataFrame([Row(id=2, v="b")]).coalesce(1).write.mode("append").parquet(src)
    # a fresh builder instance = process restart; same state + checkpoints
    b2 = SmartDataLakeBuilder(registry=_streaming_registry(tmp_path, src, out, ckpt))
    b2.run(
        spark=spark, state_path=state_path, streaming=True,
        streaming_interval_sec=0.01, max_streaming_iterations=1,
    )
    got = spark.read.parquet(out)
    assert got.count() == 2  # no duplicates, no lost batches
    assert {r.id for r in got.collect()} == {1, 2}


def test_streaming_restart_orphaned_checkpoint_fails_clearly(spark, tmp_path):
    """A restart whose selection no longer covers a persisted streaming query
    fails with the orphaned checkpoint path (resume-or-fail, never silent)."""
    import pytest

    src, out, ckpt = (str(tmp_path / p) for p in ("src", "out", "ckpt"))
    state_path = str(tmp_path / "state")
    spark.createDataFrame([Row(id=1, v="a")]).coalesce(1).write.mode("append").parquet(src)
    b1 = SmartDataLakeBuilder(registry=_streaming_registry(tmp_path, src, out, ckpt))
    b1.run(
        spark=spark, state_path=state_path, streaming=True,
        streaming_interval_sec=0.01, max_streaming_iterations=1,
    )

    # restart selects a DIFFERENT pipeline; the stream_copy checkpoint is now orphaned
    registry = InstanceRegistry()
    registry.register_data_object(MockDataObject(id="x"))
    registry.register_data_object(MockDataObject(id="y"))
    registry.get_data_object("x")._df = spark.createDataFrame([Row(v=1)]).localCheckpoint()
    CopyAction(id="other", input_id="x", output_id="y", registry=registry)
    b2 = SmartDataLakeBuilder(registry=registry)
    with pytest.raises(ValueError, match="stream_copy.*ckpt"):
        b2.run(
            spark=spark, state_path=state_path, streaming=True,
            streaming_interval_sec=0.01, max_streaming_iterations=1,
        )
    # explicit opt-out proceeds
    s = b2.run(
        spark=spark, state_path=state_path, streaming=True,
        streaming_interval_sec=0.01, max_streaming_iterations=1,
        ignore_orphaned_streams=True,
    )
    assert s.action_states["other"] == "SUCCEEDED"


def test_graceful_stop_drains_async_query(spark, tmp_path):
    """stop() on a processingTime (async) DAG: the loop exits and the live
    query is drained (processAllAvailable) before stop — no in-flight batch
    dropped."""
    import threading

    from smart_data_lake_spark.dataobjects import ParquetFileDataObject
    from smart_data_lake_spark.execution_modes import SparkStreamingMode

    src, out, ckpt = (str(tmp_path / p) for p in ("src", "out", "ckpt"))
    spark.createDataFrame([Row(id=1, v="a")]).coalesce(1).write.mode("append").parquet(src)
    registry = InstanceRegistry()
    registry.register_data_object(
        ParquetFileDataObject(id="src", path=src, schema="id bigint, v string")
    )
    registry.register_data_object(ParquetFileDataObject(id="dst", path=out))
    action = CopyAction(
        id="async_copy", input_id="src", output_id="dst", registry=registry,
        execution_mode=SparkStreamingMode(
            checkpoint_location=ckpt, trigger_type="processingTime", trigger_interval="1 seconds"
        ),
    )
    b = SmartDataLakeBuilder(registry=registry)
    # request stop shortly after the loop starts; add a second file that the
    # drain must still pick up
    def stop_soon():
        import time as _t

        _t.sleep(1.5)
        spark.createDataFrame([Row(id=2, v="b")]).coalesce(1).write.mode("append").parquet(src)
        b.stop()

    t = threading.Thread(target=stop_soon)
    t.start()
    b.run(spark=spark, streaming=True, streaming_interval_sec=0.2)
    t.join()
    q = action.streaming_queries["dst"]
    assert not q.isActive  # stopped...
    assert spark.read.parquet(out).count() == 2  # ...but only after draining


def test_autopersist_fanout_refcounted(spark, tmp_path, monkeypatch):
    """A subfeed consumed by TWO downstream actions is persisted exactly once
    and unpersisted after the last consumer (rememberDataFrameReuse,
    DataFrameActionImpl.scala:176-179,456-462); a linear chain persists
    nothing."""
    from pyspark.sql import Row

    try:  # Spark 4: concrete instances are the classic subclass
        from pyspark.sql.classic.dataframe import DataFrame
    except ImportError:  # pragma: no cover
        from pyspark.sql import DataFrame

    from smart_data_lake_spark.actions import CopyAction
    from smart_data_lake_spark.config import InstanceRegistry
    from smart_data_lake_spark.dataobjects import ParquetFileDataObject
    from smart_data_lake_spark.plans.dag import ActionDAG, ActionDAGRun

    calls = {"persist": 0, "unpersist": 0}
    orig_persist, orig_unpersist = DataFrame.persist, DataFrame.unpersist

    def spy_persist(self, *a, **k):
        calls["persist"] += 1
        return orig_persist(self, *a, **k)

    def spy_unpersist(self, *a, **k):
        calls["unpersist"] += 1
        return orig_unpersist(self, *a, **k)

    monkeypatch.setattr(DataFrame, "persist", spy_persist)
    monkeypatch.setattr(DataFrame, "unpersist", spy_unpersist)

    src = str(tmp_path / "src")
    spark.createDataFrame([Row(id=1, v="a"), Row(id=2, v="b")]).write.parquet(src)
    registry = InstanceRegistry()
    registry.register_data_object(ParquetFileDataObject(id="src", path=src))
    registry.register_data_object(ParquetFileDataObject(id="mid", path=str(tmp_path / "mid")))
    registry.register_data_object(ParquetFileDataObject(id="out1", path=str(tmp_path / "out1")))
    registry.register_data_object(ParquetFileDataObject(id="out2", path=str(tmp_path / "out2")))
    actions = [
        CopyAction(id="a", input_id="src", output_id="mid", registry=registry),
        CopyAction(id="b", input_id="mid", output_id="out1", registry=registry),
        CopyAction(id="c", input_id="mid", output_id="out2", registry=registry),
    ]
    state = ActionDAGRun(ActionDAG(actions), registry).run(spark)
    assert all(s == "SUCCEEDED" for s in state.action_states.values())
    assert calls["persist"] == 1      # only the fan-out edge (mid), only once
    assert calls["unpersist"] == 1    # released after the last consumer
    assert spark.read.parquet(str(tmp_path / "out1")).count() == 2
    assert spark.read.parquet(str(tmp_path / "out2")).count() == 2

    # linear chain: no fan-out, no persist
    calls["persist"] = calls["unpersist"] = 0
    registry2 = InstanceRegistry()
    registry2.register_data_object(ParquetFileDataObject(id="src", path=src))
    registry2.register_data_object(ParquetFileDataObject(id="m2", path=str(tmp_path / "m2")))
    registry2.register_data_object(ParquetFileDataObject(id="o3", path=str(tmp_path / "o3")))
    lin = [
        CopyAction(id="a", input_id="src", output_id="m2", registry=registry2),
        CopyAction(id="b", input_id="m2", output_id="o3", registry=registry2),
    ]
    ActionDAGRun(ActionDAG(lin), registry2).run(spark)
    assert calls["persist"] == 0 and calls["unpersist"] == 0


def test_cli_main_run_and_test_modes(spark, tmp_path, capsys):
    """CLI entry (`python -m smart_data_lake_spark`): config-file merge,
    --test modes, full run with state (SmartDataLakeBuilder.scala:226-308)."""
    import json

    from pyspark.sql import Row

    from smart_data_lake_spark.__main__ import main, _parse_partition_values

    src = str(tmp_path / "src")
    spark.createDataFrame([Row(id=1, v="a"), Row(id=2, v="b")]).write.parquet(src)
    base_cfg = {
        "dataObjects": {
            "src": {"type": "ParquetFileDataObject", "path": src},
            "dst": {"type": "ParquetFileDataObject", "path": str(tmp_path / "dst")},
        },
        "actions": {"cp": {"type": "CopyAction", "inputId": "src", "outputId": "dst"}},
    }
    override_cfg = {  # second file overrides section-by-section like HOCON includes
        "dataObjects": {"dst": {"type": "ParquetFileDataObject", "path": str(tmp_path / "dst2")}}
    }
    c1, c2 = str(tmp_path / "c1.json"), str(tmp_path / "c2.json")
    with open(c1, "w") as fh:
        json.dump(base_cfg, fh)
    with open(c2, "w") as fh:
        json.dump(override_cfg, fh)

    # --test config and dry-run validate without writing
    assert main(["--config", c1, c2, "--test", "config"]) == 0
    assert main(["--config", c1, c2, "--test", "dry-run"]) == 0
    import os
    assert not os.path.exists(tmp_path / "dst2")

    # full run writes to the OVERRIDDEN path and reports SUCCEEDED
    rc = main(["--config", c1, c2, "--state-path", str(tmp_path / "state")])
    assert rc == 0
    assert spark.read.parquet(str(tmp_path / "dst2")).count() == 2
    out = capsys.readouterr().out
    assert "cp: SUCCEEDED" in out

    # partition-values grammar
    assert _parse_partition_values("dt=2024-01-01,region=eu;dt=2024-01-02") == [
        {"dt": "2024-01-01", "region": "eu"},
        {"dt": "2024-01-02"},
    ]


def test_config_secrets_substitution_connections(spark, tmp_path, monkeypatch):
    """HOCON-parity config features (ConfigParser.scala / SecretsUtil.scala):
    ${path} + ${env.X} substitution, ENV#/FILE#/CLEAR#/custom secrets, and a
    shared connections section referenced by connectionId."""
    import pytest

    from smart_data_lake_spark.config import (
        ConfigError,
        load_config,
        register_secret_provider,
        resolve_secret,
    )

    monkeypatch.setenv("SDL_TEST_PW", "s3cret")
    secret_file = tmp_path / "token.txt"
    secret_file.write_text("  filetoken\n")
    register_secret_provider("VAULTX", lambda name: f"vault:{name}")

    assert resolve_secret("ENV#SDL_TEST_PW") == "s3cret"
    assert resolve_secret(f"FILE#{secret_file}") == "filetoken"
    assert resolve_secret("CLEAR#plain") == "plain"
    assert resolve_secret("VAULTX#db/creds") == "vault:db/creds"
    assert resolve_secret("jdbc:duckdb://host#frag") == "jdbc:duckdb://host#frag"  # not a secret

    cfg = {
        "globalConfig": {"basePath": str(tmp_path), "dbUrl": "jdbc:duckdb:${env.SDL_TEST_PW}"},
        "connections": {
            "db": {
                "type": "JdbcConnection",
                "url": "${globalConfig.dbUrl}",
                "connectionOptions": {"password": "ENV#SDL_TEST_PW"},
            },
            "kafka": {"type": "KafkaConnection", "brokers": "broker:9092"},
        },
        "dataObjects": {
            "src": {"type": "ParquetFileDataObject", "path": "${globalConfig.basePath}/src"},
            "tbl": {
                "type": "JdbcTableDataObject",
                "connectionId": "db",
                "table": {"name": "t", "primary_key": ["id"]},
            },
        },
        "actions": {},
    }
    registry = load_config(cfg)
    assert registry.data_objects["src"].path == f"{tmp_path}/src"
    tbl = registry.data_objects["tbl"]
    assert tbl.url == "jdbc:duckdb:s3cret"  # connection url + substitution
    assert tbl.connection_options["password"] == "s3cret"  # secret resolved
    assert registry.connections["kafka"].brokers == "broker:9092"

    with pytest.raises(ConfigError, match="cycle"):
        load_config({"a": {"x": "${b.y}"}, "b": {"y": "${a.x}"}, "dataObjects": {}})
    with pytest.raises(ConfigError, match="not found"):
        load_config({"dataObjects": {"d": {"type": "ParquetFileDataObject", "path": "${nope.x}"}}})
    with pytest.raises(ConfigError, match="unknown connectionId"):
        load_config(
            {"dataObjects": {"t": {"type": "JdbcTableDataObject", "connectionId": "missing",
                                   "table": {"name": "t"}}}}
        )


def test_example_cli_config_runs(spark, tmp_path, monkeypatch, capsys):
    """examples/cli_pipeline.json stays runnable: env substitution, transformer
    chains, CSV export — the documented CLI walkthrough."""
    import os

    from smart_data_lake_spark.__main__ import main

    monkeypatch.setenv("SDL_DATA_DIR", "/root/testdata/sf0.001")
    monkeypatch.setenv("SDL_OUT_DIR", str(tmp_path))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rc = main(["--config", os.path.join(repo, "examples", "cli_pipeline.json"),
               "--state-path", str(tmp_path / "state")])
    assert rc == 0
    out = spark.read.option("header", True).option("sep", "|").csv(str(tmp_path / "orders_by_status"))
    assert out.count() > 0 and "n_orders" in out.columns


def test_recursive_self_input_accumulates(spark, tmp_path):
    """Reference DAG scenario 'recursive self-input' (ActionDAGTest.scala):
    an action whose own OUTPUT is also a (recursive) input — the incremental
    accumulation pattern. Run 1 seeds the state; run 2 merges new rows with
    the previous output without a cycle in the DAG."""
    from pyspark.sql import Row

    from smart_data_lake_spark.actions import CustomDataFrameAction
    from smart_data_lake_spark.config import InstanceRegistry
    from smart_data_lake_spark.dataobjects import ParquetFileDataObject
    from smart_data_lake_spark.plans import ActionDAG, ActionDAGRun
    from smart_data_lake_spark.transformers.dfs_transformers import PythonCodeDfsTransformer

    src = str(tmp_path / "src")

    def build(run_rows):
        spark.createDataFrame(run_rows).coalesce(1).write.mode("overwrite").parquet(src)
        registry = InstanceRegistry()
        registry.register_data_object(ParquetFileDataObject(id="new_events", path=src))
        registry.register_data_object(ParquetFileDataObject(id="state", path=str(tmp_path / "state_tbl")))

        def accumulate(spark, dfs, options=None):
            out = dfs["new_events"]
            if "state" in dfs:  # previous output available from run 2 on
                out = out.unionByName(dfs["state"]).dropDuplicates(["id"])
            return {"state": out}

        CustomDataFrameAction(
            id="acc", input_ids=["new_events"], output_ids=["state"],
            recursive_input_ids=["state"],
            transformers=[PythonCodeDfsTransformer(fn=accumulate)],
            registry=registry,
        )
        return registry

    r1 = build([Row(id=1, v="a"), Row(id=2, v="b")])
    ActionDAGRun(ActionDAG(list(r1.actions.values())), r1).run(spark)
    assert spark.read.parquet(str(tmp_path / "state_tbl")).count() == 2

    # run 2: one overlapping id (updated) + one new — accumulate, dedup by id
    r2 = build([Row(id=2, v="b2"), Row(id=3, v="c")])
    ActionDAGRun(ActionDAG(list(r2.actions.values())), r2).run(spark)
    out = {r["id"]: r["v"] for r in spark.read.parquet(str(tmp_path / "state_tbl")).collect()}
    assert set(out) == {1, 2, 3}
    assert out[3] == "c"


def test_autopersist_released_when_consumer_fails(spark, tmp_path, monkeypatch):
    """A failing consumer must not leak the pinned fan-out DataFrame: every
    persist is matched by an unpersist even when a branch fails."""
    from pyspark.sql import Row

    try:
        from pyspark.sql.classic.dataframe import DataFrame
    except ImportError:  # pragma: no cover
        from pyspark.sql import DataFrame

    from smart_data_lake_spark.actions import CopyAction, CustomDataFrameAction
    from smart_data_lake_spark.config import InstanceRegistry
    from smart_data_lake_spark.dataobjects import ParquetFileDataObject
    from smart_data_lake_spark.plans import ActionDAG, ActionDAGRun
    from smart_data_lake_spark.plans.dag import DAGError
    from smart_data_lake_spark.transformers.dfs_transformers import PythonCodeDfsTransformer

    import pytest

    calls = {"persist": 0, "unpersist": 0}
    orig_p, orig_u = DataFrame.persist, DataFrame.unpersist
    monkeypatch.setattr(DataFrame, "persist", lambda s, *a: (calls.__setitem__("persist", calls["persist"] + 1), orig_p(s, *a))[1])
    monkeypatch.setattr(DataFrame, "unpersist", lambda s, *a: (calls.__setitem__("unpersist", calls["unpersist"] + 1), orig_u(s, *a))[1])

    src = str(tmp_path / "src")
    spark.createDataFrame([Row(id=1)]).write.parquet(src)
    registry = InstanceRegistry()
    for do_id in ("mid", "ok_out", "boom_out"):
        registry.register_data_object(ParquetFileDataObject(id=do_id, path=str(tmp_path / do_id)))
    registry.register_data_object(ParquetFileDataObject(id="src", path=src))

    state = {"calls": 0}

    def explode(spark_, dfs, options=None):
        state["calls"] += 1
        if state["calls"] >= 2:  # pass init (lineage validation), fail exec
            raise RuntimeError("boom")
        return {"boom_out": dfs["mid"]}

    CopyAction(id="a", input_id="src", output_id="mid", registry=registry)
    CopyAction(id="ok", input_id="mid", output_id="ok_out", registry=registry)
    CustomDataFrameAction(
        id="boom", input_ids=["mid"], output_ids=["boom_out"],
        transformers=[PythonCodeDfsTransformer(fn=explode)], registry=registry,
    )
    with pytest.raises(DAGError, match="boom"):
        ActionDAGRun(ActionDAG(list(registry.actions.values())), registry).run(spark)
    assert calls["persist"] == 1
    assert calls["unpersist"] >= 1  # released despite the failure


def test_config_schema_export_tracks_loader():
    """JSON-schema exporter (sdl-lang JsonSchemaExporter parity): generated
    from the same registries load_config instantiates from, so the schema
    cannot drift — spot-check required/optional/defaults/camelCasing."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from config_schema import build_schema

    s = build_schema()
    dos = {o["properties"]["type"]["const"]: o
           for o in s["properties"]["dataObjects"]["additionalProperties"]["oneOf"]}
    assert len(dos) >= 25
    pq = dos["ParquetFileDataObject"]
    assert "path" in pq["required"] and pq["properties"]["path"]["type"] == "string"
    assert "nFilesPerPartition" in pq["properties"]  # camelCased
    assert dos["JmsDataObject"]["properties"]["batchSize"]["default"] == 100
    assert dos["SplunkDataObject"]["required"] == [
        "type", "query", "queryFrom", "queryTo", "connection"
    ]
    acts = {o["properties"]["type"]["const"]
            for o in s["properties"]["actions"]["additionalProperties"]["oneOf"]}
    assert {"CopyAction", "HistorizeAction", "DeduplicateAction"} <= acts
    nested = {o["properties"]["type"]["const"]
              for o in s["definitions"]["nestedTypes"]["oneOf"]}
    assert {"PartitionDiffMode", "SQLDfTransformer", "UniqueKeyExpectation"} <= nested


def test_example_monitored_config_runs(spark, tmp_path, monkeypatch):
    """examples/monitored_pipeline.conf stays runnable: StatusInfoServer +
    uiBackend staged-upload + per-write ACLs + memory-log timer, all wired
    from one HOCON config. The placeholder UI backend is down by design, so
    the full-state upload must be staged, not fatal. Runs through the
    builder directly so the started listeners can be STOPPED afterwards
    (no leaked port/threads into the rest of the suite), and reads the
    actually-bound port instead of hardcoding 4440."""
    import json as _json
    import os
    import urllib.request

    from smart_data_lake_spark.__main__ import _merge_configs
    from smart_data_lake_spark.plans import SmartDataLakeBuilder
    from smart_data_lake_spark.statusinfo import StatusInfoServer

    monkeypatch.setenv("SDL_DATA_DIR", "/root/testdata/sf0.001")
    monkeypatch.setenv("SDL_OUT_DIR", str(tmp_path))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    config = _merge_configs([os.path.join(repo, "examples", "monitored_pipeline.conf")])
    builder = SmartDataLakeBuilder(config=config)
    registry = builder.registry
    try:
        state = builder.run(spark=spark, state_path=str(tmp_path / "state"))
        assert state.action_states["curate_events"] == "SUCCEEDED"
        # data landed with the configured ACL bits on the written hierarchy
        out = tmp_path / "events_curated"
        assert (os.stat(out).st_mode & 0o777) == 0o750
        assert spark.read.parquet(str(out)).count() > 0
        # the unreachable UI backend staged the state for next-run retry
        staged = os.listdir(tmp_path / "ui_stage")
        assert staged and staged[0].endswith(".json")
        # the status server answered live state on whichever port it bound
        srv = next(l for l in registry.state_listeners if isinstance(l, StatusInfoServer))
        with urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/api/v1/state", timeout=5
        ) as r:
            body = _json.loads(r.read().decode())
        assert body["action_states"]["curate_events"] == "SUCCEEDED"
    finally:
        for l in registry.state_listeners:
            if isinstance(l, StatusInfoServer):
                l.stop()
        if getattr(registry, "memory_log_timer", None) is not None:
            registry.memory_log_timer.stop()


def test_feed_selection_dataobject_ids_and_names(spark):
    """AppUtilTest:66/:86/:91 — names:, startFromDataObjectIds: and
    endWithDataObjectIds: selector prefixes."""
    b = SmartDataLakeBuilder(registry=_registry_with_feeds(spark))
    # attach metadata names for the names: selector
    for i, a in enumerate(sorted(b.registry.actions.values(), key=lambda x: x.id)):
        a.metadata["name"] = f"action_{a.id}"
    ids = lambda sel: sorted(a.id for a in b.select_actions(sel))
    assert ids("names:action_a2") == ["a2"]
    # a2 reads what a1 wrote: starting from that DataObject runs a2 and after
    mid_do = sorted(b.registry.actions.values(), key=lambda x: x.id)[1].input_ids[0]
    assert ids(f"startFromDataObjectIds:{mid_do}") == ["a2", "a3"]
    assert ids(f"endWithDataObjectIds:{mid_do}") == ["a1"]


def test_feed_selection_wrong_operation_raises(spark):
    """AppUtilTest:108 — an unknown selector operation is a loud error."""
    import pytest

    b = SmartDataLakeBuilder(registry=_registry_with_feeds(spark))
    with pytest.raises(ValueError, match="unknown feed-selector operation"):
        b.select_actions("wrongOp:foo")


def test_mask_secrets_in_conf():
    """AppUtilTest:30/:35 — secret-bearing conf keys are masked for logging,
    ordinary keys pass through."""
    from smart_data_lake_spark.apputil import mask_secrets_in_conf

    conf = {
        "spark.my.password": "p", "spark.authToken": "t",
        "spark.clientSecret": "s", "fs.s3a.credentials": "c",
        "spark.executor.memory": "4g",
    }
    masked = mask_secrets_in_conf(conf)
    assert masked["spark.executor.memory"] == "4g"
    assert all(masked[k] == "***" for k in conf if k != "spark.executor.memory")
