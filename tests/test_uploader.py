"""StateUploader / UploadService vs a socket-real mock UI backend
(StateUploader.scala + UIBackendConfig.scala parity)."""

from __future__ import annotations

import json
import os
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlsplit

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from smart_data_lake_spark.plans.dag import RunState
from smart_data_lake_spark.uploader import StateUploader, UploadService, ui_backend_from_config


class MockBackend:
    """Records (method, path, params, headers, body); can be told to fail."""

    def __init__(self):
        outer = self
        self.requests = []
        self.fail = False

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def _handle(self):
                length = int(self.headers.get("Content-Length", "0"))
                body = self.rfile.read(length).decode()
                parts = urlsplit(self.path)
                outer.requests.append(
                    {
                        "method": self.command,
                        "path": parts.path,
                        "params": {k: v[0] for k, v in parse_qs(parts.query).items()},
                        "auth": self.headers.get("Authorization"),
                        "body": body,
                    }
                )
                code = 500 if outer.fail else 200
                self.send_response(code)
                self.send_header("Content-Length", "2")
                self.end_headers()
                self.wfile.write(b"{}")

            do_POST = do_PATCH = _handle  # noqa: N815

        self.httpd = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.port = self.httpd.server_address[1]
        threading.Thread(target=self.httpd.serve_forever, daemon=True).start()

    @property
    def url(self):
        return f"http://127.0.0.1:{self.port}"

    def close(self):
        self.httpd.shutdown()


@pytest.fixture()
def backend():
    b = MockBackend()
    yield b
    b.close()


def _uploader(backend, **kw):
    return StateUploader(UploadService(backend.url, repo="r1"), **kw)


def test_first_and_final_upload_full_state_intermediate_patches(backend):
    up = _uploader(backend)
    st = RunState(run_id=1, attempt_id=1, action_states={"a1": "SUCCEEDED"})
    up.notify_state(st, {"application": "app"}, "a1")  # first -> full POST
    up.notify_state(st, {"application": "app"}, "a1")  # intermediate -> PATCH
    st.is_final = True
    up.notify_state(st, {"application": "app"}, None)  # final -> full POST

    methods = [(r["method"], r["path"]) for r in backend.requests]
    assert methods == [("POST", "/state"), ("PATCH", "/state"), ("POST", "/state")]
    first = backend.requests[0]
    assert first["params"]["tenant"] == "PrivateTenant"
    assert first["params"]["repo"] == "r1"
    assert json.loads(first["body"])["action_states"] == {"a1": "SUCCEEDED"}
    patch = backend.requests[1]
    assert patch["params"]["actionId"] == "a1"
    assert patch["params"]["runId"] == "1" and patch["params"]["attemptId"] == "1"
    assert json.loads(patch["body"]) == {"state": "SUCCEEDED"}


def test_process_updates_false_skips_intermediate(backend):
    up = _uploader(backend, process_updates=False)
    st = RunState(run_id=1, action_states={"a1": "SUCCEEDED"})
    up.notify_state(st, {}, "a1")
    up.notify_state(st, {}, "a1")
    assert [r["method"] for r in backend.requests] == ["POST"]


def test_failed_full_upload_staged_then_retried_on_init(backend, tmp_path):
    stage = str(tmp_path / "stage")
    up = _uploader(backend, stage_path=stage)
    st = RunState(run_id=2, attempt_id=1, action_states={"a1": "FAILED"})
    backend.fail = True
    st.is_final = True
    up.notify_state(st, {}, None)  # fails -> staged, no raise
    staged = os.listdir(stage)
    assert staged == ["state_run2_attempt1.json"]

    backend.fail = False
    up2 = _uploader(backend, stage_path=stage)
    up2.init({})  # retries the staged upload and clears it
    assert os.listdir(stage) == []
    assert json.loads(backend.requests[-1]["body"])["run_id"] == 2


def test_failed_retry_keeps_file_for_next_run(backend, tmp_path):
    stage = str(tmp_path / "stage")
    up = _uploader(backend, stage_path=stage)
    st = RunState(run_id=3, is_final=True)
    backend.fail = True
    up.notify_state(st, {}, None)
    up2 = _uploader(backend, stage_path=stage)
    up2.init({})  # retry fails again -> file stays
    assert os.listdir(stage) == ["state_run3_attempt1.json"]


def test_failure_without_stage_path_raises(backend):
    up = _uploader(backend)
    backend.fail = True
    st = RunState(run_id=1, is_final=True)
    with pytest.raises(Exception):
        up.notify_state(st, {}, None)


def test_intermediate_update_failure_is_warn_only(backend):
    up = _uploader(backend)
    st = RunState(run_id=1, action_states={"a1": "SUCCEEDED"})
    up.notify_state(st, {}, "a1")  # first OK
    backend.fail = True
    up.notify_state(st, {}, "a1")  # PATCH fails -> no raise
    backend.fail = False


def test_ui_backend_config_wiring_with_auth(backend, tmp_path):
    spec = {
        "baseUrl": backend.url,
        "repo": "proj",
        "env": "test",
        "stagePath": str(tmp_path / "st"),
        "authMode": {"type": "BasicAuthMode", "user": "u", "password": "p"},
    }
    up = ui_backend_from_config(spec)
    st = RunState(run_id=1)
    up.notify_state(st, {}, "a1")
    r = backend.requests[-1]
    assert r["params"]["repo"] == "proj" and r["params"]["env"] == "test"
    assert r["auth"] and r["auth"].startswith("Basic ")

    with pytest.raises(ValueError, match="authMode"):
        ui_backend_from_config({"baseUrl": backend.url, "authMode": {"type": "Nope"}})


def test_ui_backend_auth_camelcase_keys(backend):
    # r7 ADVICE fix: multi-word auth fields arrive in config camelCase
    # (tokenType, headerName, ...) and must be snake_cased before the
    # auth-mode constructor sees them
    spec = {
        "baseUrl": backend.url,
        "authMode": {"type": "TokenAuthMode", "token": "t0k", "tokenType": "SAS"},
    }
    up = ui_backend_from_config(spec)
    st = RunState(run_id=1)
    up.notify_state(st, {}, "a1")
    assert backend.requests[-1]["auth"] == "SAS t0k"

    spec = {
        "baseUrl": backend.url,
        "authMode": {"type": "AuthHeaderMode", "headerName": "X-Key", "secret": "s"},
    }
    assert ui_backend_from_config(spec) is not None


def test_load_config_registers_ui_backend(backend):
    from smart_data_lake_spark.config import load_config

    registry = load_config(
        {
            "globalConfig": {"uiBackend": {"baseUrl": backend.url, "repo": "x"}},
            "dataObjects": {},
            "actions": {},
        }
    )
    assert any(isinstance(l, StateUploader) for l in registry.state_listeners)


def test_dag_run_calls_listener_init(spark, tmp_path, backend):
    """The DAG runner must fire listener.init() before any state change —
    that is what makes the staged-retry contract real (review finding: the
    feature was dead because nothing called init)."""
    import pyspark.sql.functions as F

    from smart_data_lake_spark.plans import SmartDataLakeBuilder

    # stage a leftover failed upload from a "previous run"
    stage = str(tmp_path / "stage")
    os.makedirs(stage)
    with open(os.path.join(stage, "state_run9_attempt1.json"), "w") as f:
        json.dump({"run_id": 9, "is_final": True}, f)

    src = str(tmp_path / "in")
    spark.range(3).withColumn("v", F.lit("x")).write.parquet(src)
    config = {
        "globalConfig": {
            "uiBackend": {"baseUrl": backend.url, "repo": "r", "stagePath": stage}
        },
        "dataObjects": {
            "src": {"type": "ParquetFileDataObject", "path": src},
            "dst": {"type": "ParquetFileDataObject", "path": str(tmp_path / "out")},
        },
        "actions": {
            "cp": {"type": "CopyAction", "inputId": "src", "outputId": "dst"}
        },
    }
    SmartDataLakeBuilder(config=config).run(spark=spark)
    # the staged file was retried (and cleared) during init, and the run's
    # own states were uploaded
    assert os.listdir(stage) == []
    bodies = [json.loads(r["body"]) for r in backend.requests if r["method"] == "POST"]
    assert any(b.get("run_id") == 9 for b in bodies)  # staged retry
    assert any(b.get("action_states", {}).get("cp") == "SUCCEEDED" for b in bodies)
