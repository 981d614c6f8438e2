"""Azure LogAnalytics backend + StateChangeLogger + KeyVault secret provider.

Mocked endpoints speak the REAL wire formats: the Data Collector mock
re-computes the SharedKey HMAC-SHA256 signature server-side and rejects bad
auth; the KeyVault mock requires the AAD bearer issued by its own /token.
Reference: sdl-azure LogAnalyticsBackend.scala / StateChangeLogger.scala /
AzureKeyVaultSecretProvider.scala / LogAnalyticsClient.java.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import json
import os
import sys
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from smart_data_lake_spark.azure import (
    AzureKeyVaultSecretProvider,
    LogAnalyticsClient,
    LogAnalyticsHttpCollectorBackend,
    StateChangeLogger,
)
from smart_data_lake_spark.config import ConfigError

WORKSPACE_ID = "ws-123"
WORKSPACE_KEY = base64.b64encode(b"super-secret-shared-key").decode()


class _CollectorHandler(BaseHTTPRequestHandler):
    """Mock of the Data Collector API that VERIFIES the SharedKey signature
    exactly as the service does."""

    received: list[dict] = []
    rejected: int = 0

    def do_POST(self):  # noqa: N802
        body = self.rfile.read(int(self.headers.get("Content-Length", 0)))
        date_str = self.headers.get("x-ms-date", "")
        string_to_hash = (
            f"POST\n{len(body)}\napplication/json\nx-ms-date:{date_str}\n/api/logs"
        )
        digest = hmac.new(
            base64.b64decode(WORKSPACE_KEY), string_to_hash.encode(), hashlib.sha256
        ).digest()
        expected = f"SharedKey {WORKSPACE_ID}:{base64.b64encode(digest).decode()}"
        if self.headers.get("Authorization") != expected or not self.path.startswith(
            "/api/logs?api-version=2016-04-01"
        ):
            type(self).rejected += 1
            self.send_response(403)
            self.end_headers()
            return
        type(self).received.append(
            {
                "log_type": self.headers.get("Log-Type"),
                "events": json.loads(body),
            }
        )
        self.send_response(200)
        self.end_headers()

    def log_message(self, *a):
        pass


@pytest.fixture()
def collector():
    _CollectorHandler.received = []
    _CollectorHandler.rejected = 0
    srv = HTTPServer(("127.0.0.1", 0), _CollectorHandler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def test_client_signature_accepted_by_wire_verifier(collector):
    client = LogAnalyticsClient(WORKSPACE_ID, WORKSPACE_KEY, endpoint=collector)
    client.send('[{"a": 1}]', "sdlb_state")
    assert _CollectorHandler.rejected == 0
    assert _CollectorHandler.received[0]["log_type"] == "sdlb_state"
    assert _CollectorHandler.received[0]["events"] == [{"a": 1}]


def test_bad_key_rejected(collector):
    bad = LogAnalyticsClient(WORKSPACE_ID, base64.b64encode(b"wrong").decode(), endpoint=collector)
    with pytest.raises(Exception):
        bad.send('[{"a": 1}]', "sdlb_state")
    assert _CollectorHandler.rejected == 1


def test_backend_batches_at_service_limit(collector):
    backend = LogAnalyticsHttpCollectorBackend(WORKSPACE_ID, WORKSPACE_KEY, endpoint=collector)
    backend.send([{"i": i} for i in range(250)])
    sizes = [len(r["events"]) for r in _CollectorHandler.received]
    assert sizes == [100, 100, 50]


def test_state_change_logger_events(collector):
    from smart_data_lake_spark.plans.dag import RunState

    logger = StateChangeLogger(
        options={"workspaceId": WORKSPACE_ID, "workspaceKey": WORKSPACE_KEY, "endpoint": collector}
    )
    state = RunState(run_id=3, attempt_id=1)
    state.action_states["a1"] = "SUCCEEDED"
    state.action_metrics["a1"] = {"out1": {"records_written": 42}}
    logger.notify_state(state, {"application": "app1"}, "a1")
    ev = _CollectorHandler.received[0]["events"][0]
    assert ev["actionId"] == "a1" and ev["state"] == "SUCCEEDED"
    assert ev["runId"] == 3 and ev["application"] == "app1"
    assert ev["dataObjectId"] == "out1" and "42" in ev["metrics"]
    # final notification flattens every action
    state.action_states["a2"] = "FAILED"
    state.is_final = True
    logger.notify_state(state, {"application": "app1"}, None)
    final_events = _CollectorHandler.received[-1]["events"]
    assert {e["actionId"] for e in final_events} == {"a1", "a2"}
    assert all(e["isFinal"] for e in final_events)


def test_state_change_logger_requires_backend_config():
    with pytest.raises(ConfigError):
        StateChangeLogger(options={})


def test_pipeline_end_to_end_notifies_listener(spark, tmp_path, sf_dir, collector):
    """A real CopyAction run configured with globalConfig.stateListeners
    ships one event per state change + the final batch."""
    from smart_data_lake_spark.plans.app import SmartDataLakeBuilder

    builder = SmartDataLakeBuilder(
        config={
            "globalConfig": {
                "stateListeners": [
                    {
                        "className": "StateChangeLogger",
                        "options": {
                            "workspaceId": WORKSPACE_ID,
                            "workspaceKey": WORKSPACE_KEY,
                            "endpoint": collector,
                        },
                    }
                ]
            },
            "dataObjects": {
                "src": {"type": "ParquetFileDataObject", "path": os.path.join(sf_dir, "nation.parquet")},
                "dst": {"type": "ParquetFileDataObject", "path": str(tmp_path / "out")},
            },
            "actions": {"cp": {"type": "CopyAction", "inputId": "src", "outputId": "dst"}},
        }
    )
    state = builder.run(spark=spark)
    assert state.action_states["cp"] == "SUCCEEDED"
    all_events = [e for r in _CollectorHandler.received for e in r["events"]]
    change = [e for e in all_events if not e["isFinal"]]
    final = [e for e in all_events if e["isFinal"]]
    assert change and change[0]["actionId"] == "cp" and change[0]["state"] == "SUCCEEDED"
    assert final and final[0]["actionId"] == "cp"
    assert _CollectorHandler.rejected == 0


def test_listener_failure_does_not_kill_run(spark, tmp_path, sf_dir):
    from smart_data_lake_spark.plans.app import SmartDataLakeBuilder

    class Exploding:
        def notify_state(self, *a):
            raise RuntimeError("boom")

    builder = SmartDataLakeBuilder(
        config={
            "dataObjects": {
                "src": {"type": "ParquetFileDataObject", "path": os.path.join(sf_dir, "region.parquet")},
                "dst": {"type": "ParquetFileDataObject", "path": str(tmp_path / "out2")},
            },
            "actions": {"cp": {"type": "CopyAction", "inputId": "src", "outputId": "dst"}},
        }
    )
    builder.registry.state_listeners = [Exploding()]
    state = builder.run(spark=spark)
    assert state.action_states["cp"] == "SUCCEEDED"


# ------------------------------------------------------------------ KeyVault


class _VaultHandler(BaseHTTPRequestHandler):
    token_calls = 0

    def do_POST(self):  # noqa: N802 — AAD token endpoint
        body = self.rfile.read(int(self.headers.get("Content-Length", 0))).decode()
        assert "grant_type=client_credentials" in body
        type(self).token_calls += 1
        data = json.dumps({"access_token": "aad-tok", "expires_in": 3600}).encode()
        self.send_response(200)
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def do_GET(self):  # noqa: N802 — vault secret endpoint
        if self.headers.get("Authorization") != "Bearer aad-tok":
            self.send_response(401)
            self.end_headers()
            return
        name = self.path.split("/secrets/")[1].split("?")[0]
        assert "api-version=7.4" in self.path
        data = json.dumps({"value": f"value-of-{name}"}).encode()
        self.send_response(200)
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def log_message(self, *a):
        pass


@pytest.fixture()
def vault():
    _VaultHandler.token_calls = 0
    srv = HTTPServer(("127.0.0.1", 0), _VaultHandler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def test_keyvault_provider_resolves_secret(vault):
    provider = AzureKeyVaultSecretProvider(
        vault_url=vault, client_id="c", client_secret="s", token_endpoint=vault + "/token"
    )
    assert provider("db-password") == "value-of-db-password"
    assert provider("other") == "value-of-other"
    assert _VaultHandler.token_calls == 1  # AAD token cached


def test_keyvault_registered_as_secret_provider(vault):
    from smart_data_lake_spark.config import register_secret_provider, resolve_secret

    provider = AzureKeyVaultSecretProvider(
        vault_url=vault, client_id="c", client_secret="s", token_endpoint=vault + "/token"
    )
    register_secret_provider("AZKVTEST", provider)
    assert resolve_secret("AZKVTEST#api-key") == "value-of-api-key"


def test_log_handler_batches_and_flushes(collector):
    import logging

    from smart_data_lake_spark.azure import LogAnalyticsLogHandler

    backend = LogAnalyticsHttpCollectorBackend(
        WORKSPACE_ID, WORKSPACE_KEY, log_type="sdlb_log", endpoint=collector
    )
    handler = LogAnalyticsLogHandler.build(backend, max_delay_sec=9999)
    log = logging.getLogger("sdl.test.handler")
    log.setLevel(logging.INFO)
    log.addHandler(handler)
    try:
        for i in range(backend.batch_size):  # hits the batch threshold exactly
            log.info("event %d", i)
        assert len(_CollectorHandler.received) == 1
        events = _CollectorHandler.received[0]["events"]
        assert len(events) == backend.batch_size
        assert events[0]["message"] == "event 0" and events[0]["level"] == "INFO"
        # suppressed logger names never ship
        logging.getLogger("urllib3.connectionpool").addHandler(handler)
        log.info("tail")  # buffered, under threshold
        handler.flush()
        assert _CollectorHandler.received[-1]["events"][-1]["message"] == "tail"
    finally:
        log.removeHandler(handler)


def test_log_handler_time_based_flush_without_further_emits(collector):
    """r6 review regression: a sub-batch buffer must ship after
    max_delay_sec even if logging goes quiet (real timer, not emit-driven)."""
    import logging
    import time

    from smart_data_lake_spark.azure import LogAnalyticsLogHandler

    backend = LogAnalyticsHttpCollectorBackend(
        WORKSPACE_ID, WORKSPACE_KEY, log_type="sdlb_log", endpoint=collector
    )
    handler = LogAnalyticsLogHandler.build(backend, max_delay_sec=0.3)
    log = logging.getLogger("sdl.test.timerflush")
    log.setLevel(logging.INFO)
    log.addHandler(handler)
    try:
        log.info("lonely event")
        assert _CollectorHandler.received == []  # buffered
        deadline = time.time() + 5
        while not _CollectorHandler.received and time.time() < deadline:
            time.sleep(0.05)
        assert _CollectorHandler.received[0]["events"][0]["message"] == "lonely event"
    finally:
        log.removeHandler(handler)


def test_final_state_writer_archives_final_state(spark, tmp_path, sf_dir):
    """util/misc/FinalStateWriter.scala parity: every final run state lands
    in the archive directory, intermediate notifications don't."""
    from smart_data_lake_spark.plans.app import SmartDataLakeBuilder

    archive = tmp_path / "history"
    builder = SmartDataLakeBuilder(
        config={
            "globalConfig": {
                "stateListeners": [
                    {"className": "FinalStateWriter", "options": {"path": str(archive)}}
                ]
            },
            "dataObjects": {
                "src": {"type": "ParquetFileDataObject", "path": os.path.join(sf_dir, "region.parquet")},
                "dst": {"type": "ParquetFileDataObject", "path": str(tmp_path / "fsw_out")},
            },
            "actions": {"cp": {"type": "CopyAction", "inputId": "src", "outputId": "dst"}},
        }
    )
    state = builder.run(spark=spark)
    assert state.action_states["cp"] == "SUCCEEDED"
    files = [f for f in os.listdir(archive) if f.endswith(".json")]
    assert len(files) == 1
    payload = json.loads((archive / files[0]).read_text())
    assert payload["is_final"] is True
    assert payload["action_states"] == {"cp": "SUCCEEDED"}


def test_final_state_writer_requires_path():
    from smart_data_lake_spark.azure import FinalStateWriter

    with pytest.raises(ConfigError):
        FinalStateWriter(options={})


def test_final_metrics_log_writer_persists_run_history(spark, tmp_path, sf_dir):
    """util/misc/FinalMetricsLogWriter.scala parity: final action + metrics
    logs land in merge-capable table data objects, upserted by primary key
    so a re-notification never duplicates rows."""
    from smart_data_lake_spark.plans.app import SmartDataLakeBuilder

    config = {
        "globalConfig": {
            "stateListeners": [
                {
                    "className": "FinalMetricsLogWriter",
                    "options": {
                        "actionLogDataObjectId": "action_log",
                        "metricsLogDataObjectId": "metrics_log",
                    },
                }
            ]
        },
        "dataObjects": {
            "src": {"type": "ParquetFileDataObject", "path": os.path.join(sf_dir, "region.parquet")},
            "dst": {"type": "ParquetFileDataObject", "path": str(tmp_path / "ml_out")},
            "action_log": {
                "type": "ParquetTableDataObject",
                "path": str(tmp_path / "action_log"),
                "table": {"name": "action_log",
                          "primaryKey": ["application", "run_id", "attempt_id", "action_id"]},
            },
            "metrics_log": {
                "type": "ParquetTableDataObject",
                "path": str(tmp_path / "metrics_log"),
                "table": {"name": "metrics_log",
                          "primaryKey": ["application", "run_id", "action_id",
                                          "data_object_id", "metric"]},
            },
        },
        "actions": {"cp": {"type": "CopyAction", "inputId": "src", "outputId": "dst"}},
    }
    builder = SmartDataLakeBuilder(config=config)
    state = builder.run(spark=spark)
    assert state.action_states["cp"] == "SUCCEEDED"
    actions = spark.read.parquet(str(tmp_path / "action_log")).collect()
    assert len(actions) == 1 and actions[0]["action_id"] == "cp"
    assert actions[0]["state"] == "SUCCEEDED"
    metrics = spark.read.parquet(str(tmp_path / "metrics_log")).collect()
    keys = {(r["action_id"], r["data_object_id"], r["metric"]) for r in metrics}
    assert ("cp", "dst", "records_written") in keys
    # MERGE semantics: re-notifying the same final state upserts, not appends
    run = builder.registry  # reuse listener directly
    listener = run.state_listeners[0]
    listener.notify_state(state, {"application": "sdl", "spark": spark, "registry": run}, None)
    assert spark.read.parquet(str(tmp_path / "action_log")).count() == 1
