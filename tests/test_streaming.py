"""Structured-streaming execution (SURVEY §2.6 / SparkStreamingMode.scala:40-54).

File-source → streaming CopyAction with availableNow trigger + checkpoint:
the whole-DAG micro-batch path, plus incremental behavior across runs (the
checkpoint makes run2 process only new files).
"""

from pyspark.sql import Row

from smart_data_lake_spark.actions import CopyAction
from smart_data_lake_spark.config import InstanceRegistry
from smart_data_lake_spark.dataobjects import ParquetFileDataObject
from smart_data_lake_spark.execution_modes import SparkStreamingMode
from smart_data_lake_spark.plans import ActionDAG, ActionDAGRun


def test_streaming_processing_time_async(spark, tmp_path):
    """processingTime trigger: exec returns immediately with a live query
    handle; the micro-batch engine keeps consuming in the background until
    stopped (SparkStreamingMode async contract)."""
    import time

    from pyspark.sql import Row

    src_path = str(tmp_path / "src")
    spark.createDataFrame([Row(id=1, v="a")]).coalesce(1).write.mode("overwrite").parquet(src_path)
    registry = InstanceRegistry()
    registry.register_data_object(
        ParquetFileDataObject(id="src", path=src_path, schema="id bigint, v string")
    )
    registry.register_data_object(ParquetFileDataObject(id="dst", path=str(tmp_path / "dst")))
    action = CopyAction(
        id="cont", input_id="src", output_id="dst", registry=registry,
        execution_mode=SparkStreamingMode(
            checkpoint_location=str(tmp_path / "ckpt"),
            trigger_type="processingTime", trigger_interval="1 seconds",
        ),
    )
    ActionDAGRun(ActionDAG([action]), registry).run(spark)
    query = action.streaming_queries["dst"]
    try:
        assert query.isActive  # exec returned while the query keeps running
        deadline = time.time() + 30
        while time.time() < deadline:
            if any(f.endswith(".parquet") for f in __import__("os").listdir(tmp_path / "dst")):
                break
            time.sleep(0.5)
        out = spark.read.parquet(str(tmp_path / "dst"))
        assert out.count() == 1
    finally:
        query.stop()


def test_streaming_restart_no_reprocessing_and_runid_advances(spark, tmp_path):
    """Restarted checkpointed availableNow pipeline through the builder:
    runId advances in the state store per run, and the checkpoint guarantees
    a restart with no new data writes zero rows
    (SmartDataLakeBuilder.scala:566-648 streaming run semantics)."""
    import os

    from smart_data_lake_spark.plans import SmartDataLakeBuilder
    from smart_data_lake_spark.plans.dag import StateStore

    src_path, dst_path = str(tmp_path / "src"), str(tmp_path / "dst")
    state_path = str(tmp_path / "state")
    spark.createDataFrame([Row(id=1, v="a"), Row(id=2, v="b")]).coalesce(1).write.parquet(src_path)

    registry = InstanceRegistry()
    registry.register_data_object(
        ParquetFileDataObject(id="src", path=src_path, schema="id bigint, v string")
    )
    registry.register_data_object(ParquetFileDataObject(id="dst", path=dst_path))
    CopyAction(
        id="scopy", input_id="src", output_id="dst", registry=registry,
        execution_mode=SparkStreamingMode(
            checkpoint_location=str(tmp_path / "ckpt"), trigger_type="availableNow"
        ),
    )
    builder = SmartDataLakeBuilder(registry)
    state1 = builder.run(spark=spark, state_path=state_path)
    assert state1.run_id == 1
    assert state1.action_metrics["scopy"]["dst"]["records_written"] == 2

    # simulated restart: same checkpoint, no new data -> nothing reprocessed
    state2 = builder.run(spark=spark, state_path=state_path)
    assert state2.run_id == 2, "runId must advance across builder runs"
    assert state2.action_metrics["scopy"]["dst"]["records_written"] == 0
    assert spark.read.parquet(dst_path).count() == 2

    # new data after restart is picked up exactly once
    spark.createDataFrame([Row(id=3, v="c")]).coalesce(1).write.mode("append").parquet(src_path)
    state3 = builder.run(spark=spark, state_path=state_path)
    assert state3.run_id == 3
    assert state3.action_metrics["scopy"]["dst"]["records_written"] == 1
    assert spark.read.parquet(dst_path).count() == 3
    # state files persisted per run
    assert len([f for f in os.listdir(state_path) if f.endswith(".json")]) == 3


def test_streaming_loop_graceful_stop_and_reattach(spark, tmp_path):
    """The builder's streaming loop honors stop() after the current iteration
    and a re-run re-attaches to a still-active continuous query instead of
    failing with a duplicate-name error."""
    import threading
    import time

    from smart_data_lake_spark.plans import SmartDataLakeBuilder

    src_path = str(tmp_path / "src")
    spark.createDataFrame([Row(id=1, v="a")]).coalesce(1).write.parquet(src_path)
    registry = InstanceRegistry()
    registry.register_data_object(
        ParquetFileDataObject(id="src", path=src_path, schema="id bigint, v string")
    )
    registry.register_data_object(ParquetFileDataObject(id="dst", path=str(tmp_path / "dst")))
    CopyAction(
        id="cont2", input_id="src", output_id="dst", registry=registry,
        execution_mode=SparkStreamingMode(
            checkpoint_location=str(tmp_path / "ckpt"),
            trigger_type="processingTime", trigger_interval="1 seconds",
        ),
    )
    builder = SmartDataLakeBuilder(registry)
    # iteration 1 starts the async query; iteration 2 must re-attach (the
    # query is still active) rather than raise; stop() ends the loop and
    # stops the async query
    stopper = threading.Timer(3.0, builder.stop)
    stopper.start()
    state = builder.run(spark=spark, streaming=True, streaming_interval_sec=1.0,
                        max_streaming_iterations=5)
    stopper.cancel()
    assert state is not None
    deadline = time.time() + 10
    while time.time() < deadline and any(
        q.name == "cont2" and q.isActive for q in spark.streams.active
    ):
        time.sleep(0.3)
    assert not any(q.name == "cont2" and q.isActive for q in spark.streams.active), (
        "graceful stop must terminate the async query"
    )


def test_streaming_copy_available_now_incremental(spark, tmp_path):
    src_path = str(tmp_path / "src")
    dst_path = str(tmp_path / "dst")
    checkpoint = str(tmp_path / "ckpt")
    spark.createDataFrame([Row(id=1, v="a"), Row(id=2, v="b")]).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src_path)

    registry = InstanceRegistry()
    registry.register_data_object(
        ParquetFileDataObject(id="src", path=src_path, schema="id bigint, v string")
    )
    registry.register_data_object(ParquetFileDataObject(id="dst", path=dst_path))

    def run(n):
        action = CopyAction(
            id=f"s{n}", input_id="src", output_id="dst", registry=registry,
            execution_mode=SparkStreamingMode(
                checkpoint_location=checkpoint, trigger_type="availableNow"
            ),
        )
        return ActionDAGRun(ActionDAG([action]), registry).run(spark)

    state1 = run(1)
    assert state1.action_states["s1"] == "SUCCEEDED"
    out = spark.read.parquet(dst_path)
    assert {tuple(r) for r in out.select("id", "v").collect()} == {(1, "a"), (2, "b")}

    # run2 with the same checkpoint: only files added after run1 are processed
    spark.createDataFrame([Row(id=3, v="c")]).coalesce(1).write.mode("append").parquet(src_path)
    state2 = run(2)
    assert state2.action_states["s2"] == "SUCCEEDED"
    out2 = spark.read.parquet(dst_path)
    assert {tuple(r) for r in out2.select("id", "v").collect()} == {(1, "a"), (2, "b"), (3, "c")}
    assert state2.action_metrics["s2"]["dst"]["streaming_batches"] >= 1


def test_stateful_user_totals_across_batches(spark, tmp_path):
    """applyInPandasWithState: per-user (count, max) state must accumulate
    across micro-batches (maxFilesPerTrigger=1 forces one batch per file)."""
    from pyspark.sql import functions as F

    from smart_data_lake_spark.streaming.operators import stateful_user_totals

    src = str(tmp_path / "src")
    rows1 = [Row(user_id=1, value=1.0), Row(user_id=1, value=5.0), Row(user_id=2, value=2.0)]
    rows2 = [Row(user_id=1, value=3.0), Row(user_id=3, value=9.0)]
    spark.createDataFrame(rows1).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(rows2).coalesce(1).write.mode("append").parquet(src)

    sdf = (
        spark.readStream.schema("user_id long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stateful_user_totals(sdf)
        .writeStream.format("memory")
        .queryName("stateful_totals_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    mem = spark.table("stateful_totals_test")
    # update-mode memory sink appends one row per (batch, touched user); the
    # running totals are monotone so max(n_events) is the final state
    final = (
        mem.groupBy("user_id")
        .agg(F.max("n_events").alias("n"), F.max("max_value").alias("m"))
        .collect()
    )
    got = {r.user_id: (r.n, r.m) for r in final}
    assert got == {1: (3, 5.0), 2: (1, 2.0), 3: (1, 9.0)}
    # state really crossed batches: user 1 was emitted at least twice with
    # growing counts (1st batch: 2 events, 2nd batch: 3)
    u1 = sorted(r.n_events for r in mem.where(F.col("user_id") == 1).collect())
    assert u1[0] < u1[-1] and u1[-1] == 3


def test_interval_join_stream_equals_batch(spark, tmp_path):
    """Stream-stream interval join must emit exactly the batch interval join
    result (inner join, purchase within [click, click+10min))."""
    import datetime as dt

    from pyspark.sql import functions as F

    from smart_data_lake_spark.streaming.operators import (
        interval_join_streams,
        run_available_now,
    )

    def t(m):
        return dt.datetime(2026, 1, 1, 12, m, 0)

    clicks_rows = [Row(click_id=i, c_user=u, click_ts=t(m)) for i, (u, m) in enumerate([(1, 0), (1, 20), (2, 5), (3, 30)])]
    purch_rows = [Row(purchase_id=100 + i, p_user=u, purchase_ts=t(m)) for i, (u, m) in enumerate([(1, 5), (1, 25), (2, 30), (4, 6)])]
    cdir, pdir = str(tmp_path / "c"), str(tmp_path / "p")
    spark.createDataFrame(clicks_rows).write.parquet(cdir)
    spark.createDataFrame(purch_rows).write.parquet(pdir)

    cs = spark.readStream.schema("click_id long, c_user long, click_ts timestamp").parquet(cdir)
    ps = spark.readStream.schema("purchase_id long, p_user long, purchase_ts timestamp").parquet(pdir)
    cond = (
        "c_user = p_user AND purchase_ts >= click_ts "
        "AND purchase_ts < click_ts + INTERVAL 10 MINUTES"
    )
    joined = interval_join_streams(cs, ps, cond, "click_ts", "purchase_ts", watermark_delay="30 minutes")
    got = run_available_now(joined, output_mode="append")

    from tests.conftest import assert_df_equal

    batch = spark.read.parquet(cdir).join(spark.read.parquet(pdir), F.expr(cond), "inner")
    assert_df_equal(
        got.select("click_id", "purchase_id").orderBy("click_id", "purchase_id"),
        batch.select("click_id", "purchase_id").orderBy("click_id", "purchase_id"),
    )
    # expected pairs: click0(u1,12:00)→p100(u1,12:05); click2(u2,12:05) has no
    # purchase in window (u2 purchase at 12:30 >= 12:15); click1(u1,12:20)→p101
    got_pairs = {(r.click_id, r.purchase_id) for r in got.collect()}
    assert got_pairs == {(0, 100), (1, 101)}


def test_dedup_within_watermark_drops_in_batch_duplicates(spark, tmp_path):
    """dropDuplicatesWithinWatermark keeps one row per key for duplicates
    arriving inside the watermark window."""
    import datetime as dt

    from smart_data_lake_spark.streaming.operators import (
        dedup_within_watermark,
        run_available_now,
    )

    base = dt.datetime(2026, 1, 1, 0, 0, 0)
    rows = [Row(k=1, ts=base), Row(k=1, ts=base), Row(k=2, ts=base), Row(k=2, ts=base), Row(k=2, ts=base)]
    src = str(tmp_path / "src")
    spark.createDataFrame(rows).write.parquet(src)
    sdf = spark.readStream.schema("k long, ts timestamp").parquet(src)
    out = run_available_now(dedup_within_watermark(sdf, ["k"]), output_mode="append")
    assert sorted(r.k for r in out.collect()) == [1, 2]


def test_foreach_batch_upsert_latest_across_batches(spark, tmp_path):
    """foreachBatch keep-latest MERGE: two micro-batches (one file each) must
    upsert into the target so the final table is the global newest row per
    key — batch 2 updates user 1, inserts user 3, leaves user 2 alone."""
    import datetime as dt

    from pyspark.sql import functions as F

    from smart_data_lake_spark.dataobjects.table import ParquetTableDataObject
    from smart_data_lake_spark.streaming.operators import foreach_batch_upsert_latest

    def t(m):
        return dt.datetime(2026, 1, 1, 12, m, 0)

    src = str(tmp_path / "src")
    b1 = [Row(user_id=1, event_id=10, ts=t(0), v="a"), Row(user_id=1, event_id=11, ts=t(1), v="b"), Row(user_id=2, event_id=12, ts=t(2), v="c")]
    b2 = [Row(user_id=1, event_id=13, ts=t(5), v="d"), Row(user_id=3, event_id=14, ts=t(6), v="e")]
    spark.createDataFrame(b1).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(b2).coalesce(1).write.mode("append").parquet(src)

    target = ParquetTableDataObject(
        id="t_upsert",
        path=str(tmp_path / "table"),
        table={"name": "t_upsert", "primary_key": ["user_id"]},
    )
    sdf = (
        spark.readStream.schema("user_id long, event_id long, ts timestamp, v string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = foreach_batch_upsert_latest(
        sdf,
        target,
        pks=["user_id"],
        order_cols=[F.col("ts").desc(), F.col("event_id").desc()],
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination()
    got = {r.user_id: (r.event_id, r.v) for r in target.get_dataframe(spark).collect()}
    assert got == {1: (13, "d"), 2: (12, "c"), 3: (14, "e")}
    # restart over the same checkpoint: nothing new to process, table unchanged
    sdf2 = (
        spark.readStream.schema("user_id long, event_id long, ts timestamp, v string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q2 = foreach_batch_upsert_latest(
        sdf2, target, pks=["user_id"],
        order_cols=[F.col("ts").desc(), F.col("event_id").desc()],
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q2.awaitTermination()
    got2 = {r.user_id: (r.event_id, r.v) for r in target.get_dataframe(spark).collect()}
    assert got2 == got


def test_run_available_now_drop_prior_scoping(spark, tmp_path):
    """Default drain drops only sinks this helper created; drop_prior=False
    keeps an earlier drain's result live so two drains can combine lazily.
    A user temp view that merely matches the sdl_stream_ prefix is never
    touched."""
    from smart_data_lake_spark.streaming import operators as ops

    src = str(tmp_path / "src")
    spark.createDataFrame([Row(k=1, v=10), Row(k=2, v=20)]).write.parquet(src)
    spark.range(1).createOrReplaceTempView("sdl_stream_user_owned")

    def stream():
        return spark.readStream.schema("k long, v long").parquet(src)

    first = ops.run_available_now(stream(), query_name="sdl_t_first", output_mode="append")
    second = ops.run_available_now(
        stream(), query_name="sdl_t_second", output_mode="append", drop_prior=False
    )
    # both sinks live: lazy combination of two drained streams works
    assert first.join(second, "k").count() == 2
    # a default drain now drops both tracked predecessors...
    third = ops.run_available_now(stream(), query_name="sdl_t_third", output_mode="append")
    live = {t.name for t in spark.catalog.listTables()}
    assert "sdl_t_first" not in live and "sdl_t_second" not in live
    assert "sdl_t_third" in live
    # ...but never a user's own view, whatever its name
    assert "sdl_stream_user_owned" in live
    assert third.count() == 2
    spark.catalog.dropTempView("sdl_stream_user_owned")
    ops.run_available_now(stream(), output_mode="append")  # cleanup tracked sink


def test_init_phase_uses_dummy_stream_not_source(spark, tmp_path):
    """Init of a streaming action validates lineage on a schema-only
    streaming frame WITHOUT consuming the real source — no offsets, no
    checkpoint state (DummyStreamProvider, DataFrameActionImpl.scala:171-174).
    """
    from pyspark.sql import Row

    src_path = str(tmp_path / "src")
    spark.createDataFrame([Row(id=1, v="a")]).write.parquet(src_path)

    calls = {"stream_reads": 0}

    class CountingParquet(ParquetFileDataObject):
        def get_streaming_dataframe(self, spark):
            calls["stream_reads"] += 1
            return super().get_streaming_dataframe(spark)

    registry = InstanceRegistry()
    registry.register_data_object(
        CountingParquet(id="src", path=src_path, schema="id bigint, v string")
    )
    registry.register_data_object(ParquetFileDataObject(id="dst", path=str(tmp_path / "dst")))
    action = CopyAction(
        id="c", input_id="src", output_id="dst", registry=registry,
        execution_mode=SparkStreamingMode(checkpoint_location=str(tmp_path / "ckpt")),
    )
    from smart_data_lake_spark.actions.base import SparkSubFeed

    out = action.init(spark, [SparkSubFeed(data_object_id="src")])
    assert out[0].df.isStreaming          # lineage validated as a stream
    assert out[0].df.schema.simpleString() == "struct<id:bigint,v:string>"
    assert calls["stream_reads"] == 0     # the real source was never opened
    import os
    assert not os.path.exists(tmp_path / "ckpt")  # and no state was created

    # exec still runs the real streaming read
    action.exec(spark, [SparkSubFeed(data_object_id="src")])
    assert calls["stream_reads"] == 1
    assert spark.read.parquet(str(tmp_path / "dst")).count() == 1


def _has_protobuf():
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


def test_transform_with_state_gated_without_protobuf(spark):
    """Without protobuf the operator fails fast with a clear pointer to the
    applyInPandasWithState equivalent (instead of an opaque driver-worker
    crash at query start)."""
    import pytest

    if _has_protobuf():
        pytest.skip("protobuf present — gate not active")
    from smart_data_lake_spark.streaming.operators import stateful_user_totals_tws

    sdf = spark.readStream.format("rate").load().selectExpr(
        "value AS user_id", "CAST(value AS DOUBLE) AS value"
    )
    with pytest.raises(RuntimeError, match="protobuf"):
        stateful_user_totals_tws(sdf)


def test_transform_with_state_totals_matches_applyinpandas(spark, tmp_path):
    """transformWithStateInPandas (Spark 4 stateful API, RocksDB provider)
    produces exactly the same per-batch update rows as the
    applyInPandasWithState implementation — same semantics, modern state
    backend (typed state + TTL + timers available). Runs only where protobuf
    is installed (the API's wire protocol needs it)."""
    import pytest

    if not _has_protobuf():
        pytest.skip("protobuf not installed — transformWithState gated")
    from smart_data_lake_spark.streaming.operators import stateful_user_totals_tws

    src = str(tmp_path / "src")
    rows1 = [Row(user_id=1, value=1.0), Row(user_id=1, value=5.0), Row(user_id=2, value=2.0)]
    rows2 = [Row(user_id=1, value=3.0), Row(user_id=3, value=9.0)]
    spark.createDataFrame(rows1).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(rows2).coalesce(1).write.mode("append").parquet(src)

    sdf = (
        spark.readStream.schema("user_id long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        q = (
            stateful_user_totals_tws(sdf)
            .writeStream.format("memory")
            .queryName("tws_totals_test")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if prev is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, prev)
    mem = spark.table("tws_totals_test")
    final = (
        mem.groupBy("user_id")
        .agg(F.max("n_events").alias("n"), F.max("max_value").alias("m"))
        .collect()
    )
    got = {r.user_id: (r.n, r.m) for r in final}
    assert got == {1: (3, 5.0), 2: (1, 2.0), 3: (1, 9.0)}
    u1 = sorted(r.n_events for r in mem.where(F.col("user_id") == 1).collect())
    assert u1[0] < u1[-1] and u1[-1] == 3


def test_chained_streaming_actions_init_uses_upstream_subfeed(spark, tmp_path):
    """Two CHAINED streaming actions: the downstream's init must take its
    schema from the upstream subfeed — the intermediate storage has no files
    yet on a first run (regression: the dummy-init branch used to read the
    missing path and crash)."""
    import os

    from smart_data_lake_spark.plans import ActionDAG, ActionDAGRun

    src = str(tmp_path / "src")
    spark.createDataFrame([Row(id=1, v="a")]).coalesce(1).write.parquet(src)
    registry = InstanceRegistry()
    registry.register_data_object(
        ParquetFileDataObject(id="src", path=src, schema="id bigint, v string")
    )
    # mid has NO declared schema and NO files before the first run
    registry.register_data_object(ParquetFileDataObject(id="mid", path=str(tmp_path / "mid")))
    registry.register_data_object(ParquetFileDataObject(id="dst", path=str(tmp_path / "dst")))
    CopyAction(
        id="s1", input_id="src", output_id="mid", registry=registry,
        execution_mode=SparkStreamingMode(checkpoint_location=str(tmp_path / "c1")),
    )
    CopyAction(
        id="s2", input_id="mid", output_id="dst", registry=registry,
        execution_mode=SparkStreamingMode(checkpoint_location=str(tmp_path / "c2")),
    )
    assert not os.path.exists(tmp_path / "mid")
    state = ActionDAGRun(ActionDAG(list(registry.actions.values())), registry).run(spark)
    assert set(state.action_states.values()) == {"SUCCEEDED"}
    assert spark.read.parquet(str(tmp_path / "dst")).count() == 1
