"""Connector tests runnable without external services.

Kafka: option construction, payload decode/encode, offset state — everything
except the broker-bound load() (KafkaTopicDataObject.scala:126-216 parity).
JDBC: generated transactional SQL (JdbcTableDataObject.scala:330-400 parity),
executed for real against DuckDB via the sql_executor bridge.
"""

import datetime
import json

import duckdb
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from smart_data_lake_spark.dataobjects.jdbc import (
    JdbcTableDataObject,
    build_merge_sql,
    build_transactional_overwrite_sqls,
    build_upsert_sqls,
)
from smart_data_lake_spark.dataobjects.kafka import (
    KafkaConnection,
    KafkaStateIncrementalMode,
    KafkaTopicDataObject,
)
from smart_data_lake_spark.historization import build_incremental_merge_options
from smart_data_lake_spark.save_modes import SaveModeMergeOptions


@pytest.fixture()
def topic():
    return KafkaTopicDataObject(
        id="t1",
        topic_name="events",
        connection=KafkaConnection(id="c1", brokers="broker1:9092,broker2:9092"),
        key_type="string",
        value_type="json",
        value_schema="user_id int, action string",
        select_cols=["key", "value", "offset"],
        batch_read_max_offsets_per_task=10000,
    )


def test_kafka_batch_reader_options(topic):
    opts = topic.batch_reader_options(
        starting_offsets='{"events":{"0":5}}', ending_offsets='{"events":{"0":42}}'
    )
    assert opts["kafka.bootstrap.servers"] == "broker1:9092,broker2:9092"
    assert opts["subscribe"] == "events"
    assert opts["startingOffsets"] == '{"events":{"0":5}}'
    assert opts["endingOffsets"] == '{"events":{"0":42}}'
    # batch chunking uses the batch-supported minPartitions knob, not the
    # streaming-only maxOffsetsPerTrigger (which batch reads ignore)
    assert "maxOffsetsPerTrigger" not in opts
    assert opts["minPartitions"] == "1"  # 37 offsets, 10000 per task
    # defaults
    assert topic.batch_reader_options()["startingOffsets"] == "earliest"
    assert topic.stream_reader_options()["subscribe"] == "events"
    assert topic.writer_options()["topic"] == "events"


def test_kafka_min_partitions_chunking(topic):
    # 2 partitions x 25k offsets = 50k total / 10k per task = 5 tasks
    opts = topic.batch_reader_options(
        starting_offsets='{"events":{"0":0,"1":0}}',
        ending_offsets='{"events":{"0":25000,"1":25000}}',
    )
    assert opts["minPartitions"] == "5"
    # earliest/latest sentinels: window size unknown at plan time -> no option
    assert "minPartitions" not in topic.batch_reader_options()


def _raw_kafka_df(spark):
    rows = [
        Row(
            key=b"k1",
            value=json.dumps({"user_id": 7, "action": "click"}).encode(),
            topic="events",
            partition=0,
            offset=5,
            timestamp=datetime.datetime(2024, 3, 1, 12, 0, 0),
            timestampType=0,
        ),
        Row(
            key=b"k2",
            value=json.dumps({"user_id": 8, "action": "view"}).encode(),
            topic="events",
            partition=1,
            offset=9,
            timestamp=datetime.datetime(2024, 3, 2, 12, 0, 0),
            timestampType=0,
        ),
    ]
    return spark.createDataFrame(rows)


def test_kafka_convert_dataframe_json_value(spark, topic):
    out = topic.convert_dataframe(_raw_kafka_df(spark))
    assert out.columns == ["key", "value", "offset"]
    got = {r["key"]: (r["value"]["user_id"], r["value"]["action"]) for r in out.collect()}
    assert got == {"k1": (7, "click"), "k2": (8, "view")}


def test_kafka_date_partition_col(spark):
    t = KafkaTopicDataObject(
        id="t2",
        topic_name="events",
        connection={"id": "c", "brokers": "b:9092"},
        select_cols=["key", "value"],
        date_partition_col="dt",
    )
    out = t.convert_dataframe(_raw_kafka_df(spark))
    assert out.columns == ["key", "value", "dt"]
    assert {r["dt"] for r in out.collect()} == {"20240301", "20240302"}


def test_kafka_prepare_write_struct_value(spark, topic):
    df = spark.createDataFrame([Row(key="k1", value=Row(user_id=7, action="click"))])
    out = topic.prepare_write_dataframe(df)
    assert [f.dataType.simpleString() for f in out.schema.fields] == ["string", "string"]
    assert json.loads(out.collect()[0]["value"]) == {"user_id": 7, "action": "click"}


def test_kafka_offset_state_roundtrip(spark, topic):
    raw = _raw_kafka_df(spark)
    state = topic.advance_state_from(raw)
    assert json.loads(state) == {"events": {"0": 6, "1": 10}}  # +1: startingOffsets inclusive
    mode = KafkaStateIncrementalMode()
    run_state = {}
    topic.set_state(None)
    mode.apply(spark, topic, None, [], run_state)
    assert topic.get_state() is None
    topic.advance_state_from(raw)
    mode.post_exec(spark, topic, None, run_state)
    assert json.loads(run_state["kafka_offsets"]) == {"events": {"0": 6, "1": 10}}
    # next run picks the persisted offsets up
    mode.apply(spark, topic, None, [], run_state)
    assert topic.get_state() == run_state["kafka_offsets"]


def test_kafka_avro_type_gated(spark, topic):
    """avro value type is accepted with a schema; decode raises a clear gate
    error when the spark-avro runtime jar is absent (as in this container)."""
    avro_topic = KafkaTopicDataObject(
        id="ta", topic_name="t", connection=KafkaConnection(id="c", brokers="b:9092"),
        value_type="avro",
        value_schema='{"type":"record","name":"r","fields":[{"name":"x","type":"int"}]}',
    )
    raw = _raw_kafka_df(spark)
    with pytest.raises(RuntimeError, match="spark-avro runtime jar"):
        avro_topic.convert_dataframe(raw)
    with pytest.raises(ValueError, match="requires a value_schema"):
        KafkaTopicDataObject(
            id="tb", topic_name="t", connection=KafkaConnection(id="c", brokers="b:9092"),
            value_type="avro",
        )


def test_kafka_validation_errors():
    with pytest.raises(ValueError, match="requires a value_schema"):
        KafkaTopicDataObject(id="x", topic_name="t", connection={"id": "c", "brokers": "b"}, value_type="json")
    with pytest.raises(ValueError, match="not supported"):
        KafkaTopicDataObject(id="x", topic_name="t", connection={"id": "c", "brokers": "b"}, value_type="protobuf")


# ------------------------------------------------------------------ JDBC


def test_merge_sql_golden():
    sql = build_merge_sql("tgt", "tgt_sdltmp", ["id"], ["id", "name", "value"])
    assert sql == (
        "MERGE INTO tgt existing\n"
        "USING tgt_sdltmp new\n"
        "ON existing.id = new.id\n"
        "WHEN MATCHED THEN UPDATE SET name = new.name, value = new.value\n"
        "WHEN NOT MATCHED THEN INSERT (id, name, value) VALUES (new.id, new.name, new.value)"
    )


def test_merge_sql_with_historize_options():
    opts = build_incremental_merge_options(existing_has_hash=True)
    sql = build_merge_sql(
        "hist", "hist_sdltmp", ["id"],
        ["id", "name", "dl_hash", "dl_operation", "dl_ts_captured", "dl_ts_delimited"], opts,
    )
    assert "ON existing.id = new.id AND (new.dl_ts_captured = existing.dl_ts_captured)" in sql
    assert "WHEN MATCHED AND (dl_operation = 'updateClose') THEN UPDATE SET dl_ts_delimited = new.dl_ts_delimited" in sql
    assert "WHEN NOT MATCHED AND (dl_operation = 'insertNew') THEN INSERT" in sql
    assert "dl_operation" not in sql.split("INSERT (")[1].split(")")[0]  # ignored on insert


def test_transactional_overwrite_sqls():
    assert build_transactional_overwrite_sqls("tgt", "tgt_sdltmp") == [
        "DELETE FROM tgt",
        "INSERT INTO tgt SELECT * FROM tgt_sdltmp",
        "DROP TABLE tgt_sdltmp",
    ]


def test_upsert_sqls_execute_against_duckdb():
    """The MERGE-less fallback statements implement real merge semantics —
    executed against DuckDB through the same executor bridge a deployment
    would configure."""
    con = duckdb.connect()
    con.execute("CREATE TABLE tgt (id INT, name VARCHAR, value DOUBLE)")
    con.execute("INSERT INTO tgt VALUES (1, 'a', 10.0), (2, 'b', 20.0)")
    con.execute("CREATE TABLE tgt_sdltmp (id INT, name VARCHAR, value DOUBLE)")
    con.execute("INSERT INTO tgt_sdltmp VALUES (1, 'a', 11.0), (3, 'c', 30.0)")
    for sql in build_upsert_sqls("tgt", "tgt_sdltmp", ["id"], ["id", "name", "value"]):
        con.execute(sql)
    rows = set(con.execute("SELECT * FROM tgt ORDER BY id").fetchall())
    assert rows == {(1, "a", 11.0), (2, "b", 20.0), (3, "c", 30.0)}


def test_upsert_sqls_scd2_options_against_duckdb():
    """MERGE-less fallback with SCD2 merge options: the additional merge
    predicate (captured-ts equality) must reach the INSERT's NOT EXISTS guard,
    or insertNew rows for already-present keys are wrongly suppressed and new
    history versions silently lost."""
    opts = build_incremental_merge_options(existing_has_hash=True)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE hist (id INT, name VARCHAR, dl_hash VARCHAR, "
        "dl_ts_captured TIMESTAMP, dl_ts_delimited TIMESTAMP)"
    )
    # key 1 current version captured at T0, open-ended
    con.execute(
        "INSERT INTO hist VALUES (1, 'a', 'h0', TIMESTAMP '2024-01-01', TIMESTAMP '9999-12-31')"
    )
    con.execute(
        "CREATE TABLE hist_sdltmp (id INT, name VARCHAR, dl_hash VARCHAR, dl_operation VARCHAR, "
        "dl_ts_captured TIMESTAMP, dl_ts_delimited TIMESTAMP)"
    )
    # updateClose carries the EXISTING captured ts (matches -> delimitation
    # update); insertNew carries the new captured ts (must NOT match -> insert)
    con.execute(
        "INSERT INTO hist_sdltmp VALUES "
        "(1, 'a', 'h0', 'updateClose', TIMESTAMP '2024-01-01', TIMESTAMP '2024-01-31 23:59:59.999'), "
        "(1, 'a2', 'h1', 'insertNew', TIMESTAMP '2024-02-01', TIMESTAMP '9999-12-31')"
    )
    cols = ["id", "name", "dl_hash", "dl_operation", "dl_ts_captured", "dl_ts_delimited"]
    for sql in build_upsert_sqls("hist", "hist_sdltmp", ["id"], cols, opts):
        con.execute(sql)
    rows = con.execute(
        "SELECT id, name, dl_ts_captured, dl_ts_delimited FROM hist ORDER BY dl_ts_captured"
    ).fetchall()
    assert len(rows) == 2, "insertNew version must survive the fallback path"
    assert rows[0][1] == "a" and rows[0][3].year == 2024  # closed old version
    assert rows[1][1] == "a2" and rows[1][3].year == 9999  # new open version


def test_merge_dataframes_update_existing_reachable(spark):
    """update_existing_condition alone must not be shadowed by an implicit
    always-true update clause (Delta clause order: first match wins)."""
    from smart_data_lake_spark.merge import merge_dataframes

    existing = spark.createDataFrame([(1, "old", "x")], "id int, name string, tag string")
    new = spark.createDataFrame([(1, "new", "y"), (2, "ins", "z")], "id int, name string, tag string")
    out = merge_dataframes(
        existing, new, ["id"],
        SaveModeMergeOptions(update_existing_condition="new.tag = 'y'"),
    ).orderBy("id").collect()
    assert [(r.id, r.name, r.tag) for r in out] == [(1, "new", "y"), (2, "ins", "z")]
    # and when the condition doesn't hold, the matched row stays untouched
    out2 = merge_dataframes(
        existing, new, ["id"],
        SaveModeMergeOptions(update_existing_condition="new.tag = 'nope'"),
    ).orderBy("id").collect()
    assert [(r.id, r.name) for r in out2] == [(1, "old"), (2, "ins")]


def test_streaming_listener_per_query_termination():
    from smart_data_lake_spark.streaming import StreamingMetricsListener

    class Ev:
        def __init__(self, name, qid):
            self.name, self.id = name, qid

    lst = StreamingMetricsListener()
    lst.onQueryStarted(Ev("qa", "id-a"))
    lst.onQueryStarted(Ev("qb", "id-b"))
    lst.onQueryTerminated(Ev(None, "id-a"))
    assert lst.metrics_for("qa")["active"] is False
    assert lst.metrics_for("qb")["active"] is True
    lst.reset("qa")
    assert lst.metrics_for("qa") == {}
    lst.reset()
    assert lst.metrics_for("qb") == {}


def test_jdbc_execute_transaction_rollback():
    executed = []

    def executor(sql):
        executed.append(sql)
        if sql.startswith("INSERT"):
            raise RuntimeError("boom")

    do = JdbcTableDataObject(
        id="j1", url="jdbc:duckdb:", table={"name": "tgt", "primary_key": ["id"]}, sql_executor=executor
    )
    with pytest.raises(RuntimeError, match="boom"):
        do._execute(["DELETE FROM tgt", "INSERT INTO tgt SELECT 1"])
    assert executed == ["BEGIN TRANSACTION", "DELETE FROM tgt", "INSERT INTO tgt SELECT 1", "ROLLBACK"]


def test_jdbc_requires_executor_for_ddl():
    do = JdbcTableDataObject(id="j2", url="jdbc:x", table={"name": "t", "primary_key": ["id"]})
    with pytest.raises(RuntimeError, match="no sql_executor"):
        do._execute(["DELETE FROM t"])


# ------------------------------------------------- misc connectors & files


def test_custom_file_action_distributed_transform(spark, tmp_path):
    from smart_data_lake_spark.actions import CustomFileAction
    from smart_data_lake_spark.config import InstanceRegistry
    from smart_data_lake_spark.dataobjects import RawFileDataObject

    src = tmp_path / "src"
    src.mkdir()
    for i in range(5):
        (src / f"f{i}.txt").write_text(f"content {i}")
    registry = InstanceRegistry()
    registry.register_data_object(RawFileDataObject(id="in", path=str(src)))
    registry.register_data_object(RawFileDataObject(id="out", path=str(tmp_path / "dst")))

    def upper(src_path, dst_path):
        with open(src_path) as f, open(dst_path, "w") as g:
            g.write(f.read().upper())

    action = CustomFileAction(id="cf", input_id="in", output_id="out",
                              transform_fn=upper, files_per_partition=2, registry=registry)
    feeds = action.exec(spark, [])
    assert feeds[0].metrics["files_transformed"] == 5
    assert (tmp_path / "dst" / "f3.txt").read_text() == "CONTENT 3"


def test_custom_file_data_object(tmp_path):
    from smart_data_lake_spark.dataobjects import CustomFileDataObject

    do = CustomFileDataObject(
        id="cfd", creator=lambda: b"col1,col2\n1,2\n", path=str(tmp_path / "gen"), file_name="gen.csv"
    )
    target = do.materialize()
    assert open(target).read() == "col1,col2\n1,2\n"


def test_schema_file_persistence_roundtrip(spark, tmp_path):
    """CSV written through the DO persists _schema.json; a fresh DO without a
    user schema reads it back instead of inferring (typed, header-free)."""
    from smart_data_lake_spark.dataobjects import CsvFileDataObject

    path = str(tmp_path / "csv")
    df = spark.createDataFrame([Row(a=1, b="x"), Row(a=2, b="y")])
    writer_do = CsvFileDataObject(id="w", path=path, options={"header": "true"})
    writer_do.write_dataframe(df)
    import os

    assert os.path.isfile(os.path.join(path, "_schema.json"))
    reader_do = CsvFileDataObject(id="r", path=path, options={"header": "true"})
    out = reader_do.get_dataframe(spark)
    assert [(f.name, f.dataType.simpleString()) for f in out.schema.fields] == [
        ("a", "bigint"), ("b", "string"),
    ]
    assert {tuple(r) for r in out.collect()} == {(1, "x"), (2, "y")}


def test_xml_roundtrip_native(spark, tmp_path):
    """Spark 4 native xml source — no external package needed."""
    from smart_data_lake_spark.dataobjects import XmlFileDataObject

    do = XmlFileDataObject(id="x", path=str(tmp_path / "xml"), row_tag="item")
    df = spark.createDataFrame([Row(a=1, b="x"), Row(a=2, b="y")])
    do.write_dataframe(df)
    out = do.get_dataframe(spark)
    assert {tuple(r) for r in out.select("a", "b").collect()} == {(1, "x"), (2, "y")}


def test_json_roundtrip(spark, tmp_path):
    from smart_data_lake_spark.dataobjects import JsonFileDataObject

    do = JsonFileDataObject(id="j", path=str(tmp_path / "json"))
    df = spark.createDataFrame([Row(a=1, nested=Row(x="deep")), Row(a=2, nested=Row(x="er"))])
    do.write_dataframe(df)
    out = do.get_dataframe(spark)
    assert {(r["a"], r["nested"]["x"]) for r in out.collect()} == {(1, "deep"), (2, "er")}


def test_relaxed_csv_per_file_projection(spark, tmp_path):
    """Files with reordered / missing / extra columns project onto the target
    schema by NAME (RelaxedCsvFileDataObject.scala:56 parity)."""
    from smart_data_lake_spark.dataobjects import RelaxedCsvFileDataObject

    d = tmp_path / "relaxed"
    d.mkdir()
    (d / "a.csv").write_text("a,b\n1,x\n2,y\n")
    (d / "b.csv").write_text("b,a,c\nz,3,9.5\n")
    (d / "c.csv").write_text("a\n4\n")
    do = RelaxedCsvFileDataObject(
        id="r", path=str(d), schema="a int, b string, c double",
        options={"header": "true", "sep": ","},
    )
    rows = {tuple(r) for r in do.get_dataframe(spark).collect()}
    assert rows == {(1, "x", None), (2, "y", None), (3, "z", 9.5), (4, None, None)}


def test_excel_reader_options_and_missing_path(spark):
    from smart_data_lake_spark.dataobjects import ExcelFileDataObject

    do = ExcelFileDataObject(id="xl", path="/tmp/definitely_missing_dir/x.xlsx", sheet_name="Sheet1")
    assert do.reader_options()["header"] == "true"
    # spark-excel dataAddress grammar: quoted name or 0-based sheet index + cell
    assert do.reader_options()["dataAddress"] == "'Sheet1'!A1"
    by_index = ExcelFileDataObject(id="xl2", path="/tmp/x.xlsx", sheet_name=2, header_row=3)
    assert by_index.reader_options()["dataAddress"] == "2!A4"
    # no longer gated: the stdlib codec backend reads real workbooks
    # (tests/test_xlsx.py); a missing path is a clear FileNotFoundError
    with pytest.raises(FileNotFoundError):
        do.get_dataframe(spark)


def test_iceberg_gated_and_merge_sql(spark):
    from smart_data_lake_spark.dataobjects import IcebergTableDataObject

    do = IcebergTableDataObject(id="ice", table={"name": "t", "primary_key": ["id"]}, catalog="icecat")
    assert do.exists(spark) is False  # no catalog configured → not available
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        do.get_dataframe(spark)
    sql = do.build_merge_sql("src_view", ["id", "v"])
    assert sql.startswith("MERGE INTO icecat.t existing")


def test_hive_managed_table_roundtrip(spark):
    """Managed-table path: saveAsTable create, by-name-validated insertInto
    append/overwrite, catalog reads, ANALYZE (HiveTableDataObject.scala:70-233)."""
    from smart_data_lake_spark.dataobjects.table import HiveTableDataObject
    from smart_data_lake_spark.save_modes import SaveMode

    spark.sql("DROP TABLE IF EXISTS sdl_managed_t")
    do = HiveTableDataObject(
        id="hm", table={"name": "sdl_managed_t"}, managed=True, analyze_table_after_write=True
    )
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "id int, name string")
    m = do.write_dataframe(df1, save_mode=SaveMode.OVERWRITE)
    assert m["records_written"] == 2
    assert do.exists(spark)
    # append via insertInto with shuffled column order — must realign by name
    df2 = spark.createDataFrame([("c", 3)], "name string, id int")
    do.write_dataframe(df2, save_mode=SaveMode.APPEND)
    got = {(r.id, r.name) for r in do.get_dataframe(spark).collect()}
    assert got == {(1, "a"), (2, "b"), (3, "c")}
    # overwrite replaces content
    do.write_dataframe(df1, save_mode=SaveMode.OVERWRITE)
    assert do.get_dataframe(spark).count() == 2
    spark.sql("DROP TABLE sdl_managed_t")


def test_hive_managed_schema_mismatch_raises(spark):
    from smart_data_lake_spark.dataobjects.table import HiveTableDataObject
    from smart_data_lake_spark.save_modes import SaveMode

    spark.sql("DROP TABLE IF EXISTS sdl_managed_bad")
    do = HiveTableDataObject(id="hb", table={"name": "sdl_managed_bad"}, managed=True)
    do.write_dataframe(
        spark.createDataFrame([(1, "a")], "id int, name string"), save_mode=SaveMode.OVERWRITE
    )
    with pytest.raises(ValueError, match="schema mismatch"):
        do.write_dataframe(
            spark.createDataFrame([(1, 2.0)], "id int, other double"), save_mode=SaveMode.APPEND
        )
    with pytest.raises(ValueError, match="MERGE requires"):
        do.write_dataframe(
            spark.createDataFrame([(1, "a")], "id int, name string"), save_mode=SaveMode.MERGE
        )
    spark.sql("DROP TABLE sdl_managed_bad")


def test_global_udf_registration_from_config(spark):
    from smart_data_lake_spark.config import load_config
    from smart_data_lake_spark.dataobjects import MockDataObject
    from smart_data_lake_spark.plans import ActionDAG, ActionDAGRun
    from smart_data_lake_spark.transformers import SQLDfTransformer

    registry = load_config(
        {
            "globalConfig": {"sparkUdfs": {"add_one": {"fn": lambda x: x + 1, "returnType": "int"}}},
            "dataObjects": {"src": {"type": "MockDataObject"}, "out": {"type": "MockDataObject"}},
            "actions": {
                "a": {
                    "type": "CopyAction",
                    "inputId": "src",
                    "outputId": "out",
                    "transformers": [
                        SQLDfTransformer(code="SELECT add_one(v) AS v2 FROM %{inputViewName}")
                    ],
                }
            },
        }
    )
    registry.get_data_object("src")._df = spark.createDataFrame([Row(v=41)]).localCheckpoint()
    ActionDAGRun(ActionDAG(list(registry.actions.values())), registry).run(spark)
    assert registry.get_data_object("out").get_dataframe(spark).collect()[0]["v2"] == 42


# ---------------------------------------------------------------------------
# Confluent schema-registry decode (KafkaTopicDataObject.scala:151-168,408-430
# JsonSchemaRegistry/AvroSchemaRegistry KafkaColumnTypes) — registry served by
# a local HTTP mock; payloads are real Confluent-framed bytes, decode runs
# through convert_dataframe on a kafka-shaped frame, no broker.

import base64
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

AVRO_SCHEMA = {
    "type": "record",
    "name": "Event",
    "fields": [
        {"name": "user_id", "type": "long"},
        {"name": "kind", "type": {"type": "enum", "name": "K", "symbols": ["click", "buy"]}},
        {"name": "score", "type": ["null", "double"]},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "ctx", "type": {"type": "record", "name": "Ctx", "fields": [
            {"name": "ip", "type": "string"}, {"name": "ok", "type": "boolean"}]}},
    ],
}
JSON_SCHEMA = {
    "type": "object",
    "properties": {
        "user_id": {"type": "integer"},
        "kind": {"type": "string"},
        "score": {"type": "number"},
    },
    "required": ["user_id"],
}


@pytest.fixture()
def registry_server():
    import json as _json

    subjects = {
        "events-value": {"id": 7, "schema": _json.dumps(AVRO_SCHEMA)},
        "events_json-value": {"id": 9, "schema": _json.dumps(JSON_SCHEMA), "schemaType": "JSON"},
    }

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            parts = self.path.strip("/").split("/")
            body = None
            if parts[0] == "subjects" and parts[-1] == "latest":
                sub = parts[1]
                if sub in subjects:
                    body = {"subject": sub, "version": 1, **subjects[sub]}
            elif parts[0] == "schemas" and parts[1] == "ids":
                sid = int(parts[2])
                for s in subjects.values():
                    if s["id"] == sid:
                        body = {k: v for k, v in s.items() if k != "id"}
            if body is None:
                self.send_response(404)
                self.end_headers()
                return
            payload = _json.dumps(body).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/vnd.schemaregistry.v1+json")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def log_message(self, *a):
            pass

    server = HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{server.server_port}"
    server.shutdown()


def _kafka_frame(spark, rows):
    import datetime as dt

    return spark.createDataFrame(
        [
            (None, payload, "events", 0, i, dt.datetime(2026, 1, 1), 0)
            for i, payload in enumerate(rows)
        ],
        "key binary, value binary, topic string, partition int, offset long, "
        "timestamp timestamp, timestampType int",
    )


def test_avro_schema_registry_decode(spark, registry_server):
    from smart_data_lake_spark.dataobjects.schema_registry import encode_confluent_avro

    topic = KafkaTopicDataObject(
        id="t", topic_name="events",
        connection=KafkaConnection(id="c", brokers="b:9092", schema_registry=registry_server),
        value_type="avro_schema_registry",
        select_cols=["value"],
    )
    recs = [
        {"user_id": 1, "kind": "click", "score": 0.5, "tags": ["a", "b"], "ctx": {"ip": "10.0.0.1", "ok": True}},
        {"user_id": 2, "kind": "buy", "score": None, "tags": [], "ctx": {"ip": "10.0.0.2", "ok": False}},
    ]
    raw = _kafka_frame(spark, [encode_confluent_avro(r, AVRO_SCHEMA, 7) for r in recs])
    got = [r.value.asDict(recursive=True) for r in topic.convert_dataframe(raw).collect()]
    assert got == recs


def test_json_schema_registry_decode_and_bad_magic(spark, registry_server):
    from smart_data_lake_spark.dataobjects.schema_registry import frame_confluent

    topic = KafkaTopicDataObject(
        id="t", topic_name="events_json",
        connection=KafkaConnection(id="c", brokers="b:9092", schema_registry=registry_server),
        value_type="json_schema_registry",
        select_cols=["value"],
    )
    payload = frame_confluent(9, b'{"user_id": 42, "kind": "click", "score": 1.5}')
    out = topic.convert_dataframe(_kafka_frame(spark, [payload])).collect()
    assert out[0].value.asDict() == {"user_id": 42, "kind": "click", "score": 1.5}
    # registry schema drove the types (integer→long, number→double)
    vtype = topic.convert_dataframe(_kafka_frame(spark, [payload])).schema["value"].dataType
    assert [f.dataType.simpleString() for f in vtype.fields] == ["bigint", "string", "double"]
    # malformed frame: wrong magic byte raises, never silently nulls
    bad = b"\x01" + payload[1:]
    with pytest.raises(Exception, match="malformed Confluent frame"):
        topic.convert_dataframe(_kafka_frame(spark, [bad])).collect()


def test_registry_type_requires_registry_url():
    with pytest.raises(ValueError, match="schemaRegistry"):
        KafkaTopicDataObject(
            id="t", topic_name="events",
            connection=KafkaConnection(id="c", brokers="b:9092"),
            value_type="avro_schema_registry",
        )


def test_avro_codec_roundtrip_primitives():
    """Pure-python codec: encode→decode identity across the supported avro
    surface, incl. negative zigzag values, unions, maps, bytes."""
    import io as _io

    from smart_data_lake_spark.dataobjects.schema_registry import decode_avro, encode_avro

    schema = {
        "type": "record", "name": "R",
        "fields": [
            {"name": "a", "type": "long"},
            {"name": "b", "type": "int"},
            {"name": "c", "type": ["null", "string"]},
            {"name": "d", "type": "bytes"},
            {"name": "e", "type": {"type": "map", "values": "long"}},
            {"name": "f", "type": "boolean"},
            {"name": "g", "type": "double"},
        ],
    }
    rec = {"a": -(2**40) - 3, "b": -1, "c": None, "d": b"\x00\xff", "e": {"x": 1, "y": -2}, "f": True, "g": -2.5}
    out = bytearray()
    encode_avro(out, rec, schema)
    assert decode_avro(_io.BytesIO(bytes(out)), schema) == rec


def test_confluent_schema_id_column(spark):
    from smart_data_lake_spark.dataobjects.schema_registry import confluent_schema_id, frame_confluent

    df = _kafka_frame(spark, [frame_confluent(731, b"x")])
    assert df.select(confluent_schema_id(F.col("value")).alias("sid")).collect()[0].sid == 731


def test_oauth2_client_credentials_with_expiry_cache(spark):
    """OAuthMode parity (connection/authMode/OAuthMode.scala): client-
    credentials grant against the token endpoint, bearer header on requests,
    token cached until near expiry then refreshed — proven by counting the
    mock token endpoint's hits."""
    import json
    import threading
    import time
    from http.server import BaseHTTPRequestHandler, HTTPServer

    from smart_data_lake_spark.dataobjects import HttpAuthMode

    hits = {"token": 0}

    class Token(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(n).decode()
            assert "grant_type=client_credentials" in body
            assert "client_id=cid" in body and "scope=api%2F.default" in body
            hits["token"] += 1
            payload = json.dumps(
                {"access_token": f"tok{hits['token']}", "expires_in": 31, "token_type": "Bearer"}
            ).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

    server = HTTPServer(("127.0.0.1", 0), Token)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        auth = HttpAuthMode(
            auth_type="oauth2",
            oauth_url=f"http://127.0.0.1:{server.server_address[1]}/oauth2/token",
            client_id="cid", client_secret="sec", oauth_scope="api/.default",
        )
        assert auth.build_headers()["Authorization"] == "Bearer tok1"
        assert auth.build_headers()["Authorization"] == "Bearer tok1"  # cached
        assert hits["token"] == 1
        # force past the 30s-margin window: expires_in=31 → margin leaves 1s
        time.sleep(1.2)
        assert auth.build_headers()["Authorization"] == "Bearer tok2"  # refreshed
        assert hits["token"] == 2
    finally:
        server.shutdown()
        server.server_close()
