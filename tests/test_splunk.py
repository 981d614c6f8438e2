"""SplunkDataObject against a local HTTP mock of the Splunk REST API.

The mock serves `/services/server/info` (connection test) and
`/services/search/jobs/export` (streamed NDJSON results, windowed by
earliest/latest) — the same two endpoints the Splunk SDK uses underneath.
Reference semantics: `sdl-splunk/.../SplunkDataObject.scala:19-140`.
"""

from __future__ import annotations

import datetime as dt
import json
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from smart_data_lake_spark.dataobjects.splunk import (
    SplunkConnection,
    SplunkDataObject,
    split_query_times,
    validate_query,
)

# events the "index" holds: one per 10-minute slot starting 08:00
_EVENTS = [
    {"ts": "2024-01-01 08:05", "level": "INFO", "msg": "started"},
    {"ts": "2024-01-01 08:15", "level": "WARN", "msg": "slow"},
    {"ts": "2024-01-01 08:25", "level": "ERROR", "msg": "boom"},
    {"ts": "2024-01-01 08:35", "level": "INFO", "msg": "recovered"},
]


class _Mock(BaseHTTPRequestHandler):
    calls: list[dict] = []

    def log_message(self, *a):
        pass

    def _reply(self, code, body: bytes, ctype="application/json"):
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if self.path.startswith("/services/server/info"):
            if not self.headers.get("Authorization"):
                return self._reply(401, b"{}")
            return self._reply(200, json.dumps({"generator": {"version": "9.0"}}).encode())
        self._reply(404, b"{}")

    def do_POST(self):
        if not self.path.startswith("/services/search/jobs/export"):
            return self._reply(404, b"{}")
        length = int(self.headers.get("Content-Length", "0"))
        params = dict(urllib.parse.parse_qsl(self.rfile.read(length).decode()))
        type(self).calls.append(params)
        if not params["search"].startswith("search "):
            return self._reply(400, b'{"messages":[{"text":"missing search prefix"}]}')
        import datetime as dt

        iso = "%Y-%m-%dT%H:%M:%S"
        lo = dt.datetime.strptime(params["earliest_time"], iso)  # ISO-8601 on the wire
        hi = dt.datetime.strptime(params["latest_time"], iso)
        lines = [
            json.dumps({"preview": False, "result": e})
            for e in _EVENTS
            if lo <= dt.datetime.strptime(e["ts"], "%Y-%m-%d %H:%M") < hi
        ]
        # export also streams preview/control lines without `result`
        payload = "\n".join(['{"preview": true}'] + lines).encode()
        self._reply(200, payload, ctype="application/x-ndjson")


@pytest.fixture()
def splunk_server():
    _Mock.calls = []
    server = HTTPServer(("127.0.0.1", 0), _Mock)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()
    server.server_close()


def test_validate_query_rules():
    assert validate_query("index=main error") == "search index=main error"
    assert validate_query("search index=main") == "search index=main"
    with pytest.raises(ValueError, match="index"):
        validate_query("error level=high")


def test_split_query_times_windows():
    w = split_query_times(
        dt.datetime(2024, 1, 1, 8, 0), dt.datetime(2024, 1, 1, 8, 35), dt.timedelta(minutes=10)
    )
    assert w == [
        ("2024-01-01T08:00:00", "2024-01-01T08:10:00"),
        ("2024-01-01T08:10:00", "2024-01-01T08:20:00"),
        ("2024-01-01T08:20:00", "2024-01-01T08:30:00"),
        ("2024-01-01T08:30:00", "2024-01-01T08:35:00"),  # last window clipped
    ]


def test_splunk_read_windowed_and_projected(spark, splunk_server):
    conn = SplunkConnection(id="sc", url=splunk_server, user="u", password="p")
    do = SplunkDataObject(
        id="sp",
        query="index=main",
        query_from="2024-01-01 08:00",
        query_to="2024-01-01 08:40",
        query_time_interval_min=10,
        parallel_requests=2,
        schema="ts string, level string",
        connection=conn,
    )
    do.prepare(spark)  # server/info round-trip
    df = do.get_dataframe(spark)
    got = {(r["ts"], r["level"]) for r in df.collect()}
    assert got == {(e["ts"], e["level"]) for e in _EVENTS}
    # one export call per window, each carrying the validated query
    assert len(_Mock.calls) == 4
    assert all(c["search"] == "search index=main" for c in _Mock.calls)
    windows = {(c["earliest_time"], c["latest_time"]) for c in _Mock.calls}
    assert ("2024-01-01T08:30:00", "2024-01-01T08:40:00") in windows


def test_splunk_single_column_schema_stringifies(spark, splunk_server):
    conn = SplunkConnection(id="sc", url=splunk_server, token="tok123")
    do = SplunkDataObject(
        id="sp1",
        query="search index=main",
        query_from="2024-01-01 08:00",
        query_to="2024-01-01 08:10",
        connection=conn,
    )
    rows = do.get_dataframe(spark).collect()
    assert len(rows) == 1 and "started" in rows[0]["_raw"]


def test_splunk_bad_auth_fails_prepare(spark, splunk_server):
    with pytest.raises(ValueError, match="auth"):
        SplunkConnection(id="sc", url=splunk_server)


def test_splunk_config_driven(spark, splunk_server, tmp_path):
    """connections section + connectionId wiring, like Jdbc/Kafka."""
    from smart_data_lake_spark.config import load_config

    registry = load_config(
        {
            "connections": {
                "spl": {"type": "SplunkConnection", "url": splunk_server, "token": "t"}
            },
            "dataObjects": {
                "logs": {
                    "type": "SplunkDataObject",
                    "connectionId": "spl",
                    "query": "index=main",
                    "queryFrom": "2024-01-01 08:00",
                    "queryTo": "2024-01-01 08:20",
                    "schema": "ts string, level string, msg string",
                }
            },
        }
    )
    df = registry.get_data_object("logs").get_dataframe(spark)
    assert df.count() == 2
