"""ProxyAction + AgentServer: remote phase execution over stdlib HTTP.

Reference semantics: `workflow/action/ProxyAction.scala` (phase forwarding,
empty dummy subfeeds with remote schemas), `communication/agent/
AgentServerController.scala` (agent registers the shipped fragment and runs
the phase). The test runs a real HTTP server thread — actual sockets, actual
JSON protocol — sharing this process's SparkSession as the "remote" one.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from smart_data_lake_spark.agents import AgentServer
from smart_data_lake_spark.config import load_config
from smart_data_lake_spark.plans import SmartDataLakeBuilder


@pytest.fixture()
def agent_server(spark):
    server = AgentServer(spark).start()
    yield server
    server.stop()


def test_proxy_action_runs_remotely_and_chains(spark, tmp_path, agent_server):
    """An action with agentId executes on the agent; the local DAG sees a
    dummy subfeed with the remote schema and the downstream LOCAL action
    reads the agent-written storage."""
    src = str(tmp_path / "src")
    spark.createDataFrame([Row(id=1, v="a"), Row(id=2, v="b")]).write.parquet(src)
    cfg = {
        "agents": {"worker": {"type": "HttpAgent", "url": agent_server.url}},
        "dataObjects": {
            "src": {"type": "ParquetFileDataObject", "path": src},
            "mid": {"type": "ParquetFileDataObject", "path": str(tmp_path / "mid")},
            "dst": {"type": "ParquetFileDataObject", "path": str(tmp_path / "dst")},
        },
        "actions": {
            # remote hop: src -> mid runs ON THE AGENT
            "remote_copy": {"type": "CopyAction", "inputId": "src", "outputId": "mid",
                            "agentId": "worker"},
            # local hop consumes the agent's output
            "local_copy": {"type": "CopyAction", "inputId": "mid", "outputId": "dst"},
        },
    }
    registry = load_config(cfg)
    from smart_data_lake_spark.agents import ProxyAction

    assert isinstance(registry.actions["remote_copy"], ProxyAction)
    state = SmartDataLakeBuilder(registry=registry).run(spark=spark)
    assert state.action_states == {"remote_copy": "SUCCEEDED", "local_copy": "SUCCEEDED"}
    out = spark.read.parquet(str(tmp_path / "dst"))
    assert {tuple(r) for r in out.select("id", "v").collect()} == {(1, "a"), (2, "b")}
    # the agent reported per-action metrics back to the coordinator
    m = state.action_metrics["remote_copy"]
    assert m["agent_remote_copy"]["mid"]["records_written"] == 2


def test_proxy_action_init_returns_schema_without_executing(spark, tmp_path, agent_server):
    """Init forwards to the agent and yields an empty dummy frame with the
    remote schema; nothing is written."""
    import os

    src = str(tmp_path / "src")
    spark.createDataFrame([Row(id=1, v="a")]).write.parquet(src)
    cfg = {
        "agents": {"worker": {"url": agent_server.url}},
        "dataObjects": {
            "src": {"type": "ParquetFileDataObject", "path": src},
            "mid": {"type": "ParquetFileDataObject", "path": str(tmp_path / "mid"),
                    "schema": "id bigint, v string"},
        },
        "actions": {"rc": {"type": "CopyAction", "inputId": "src", "outputId": "mid",
                           "agentId": "worker"}},
    }
    registry = load_config(cfg)
    action = registry.actions["rc"]
    out = action.init(spark, [])
    assert out[0].is_dummy
    assert out[0].df is not None and out[0].df.schema.simpleString() == "struct<id:bigint,v:string>"
    assert not os.path.exists(tmp_path / "mid")


def test_proxy_action_remote_error_surfaces(spark, tmp_path, agent_server):
    cfg = {
        "agents": {"worker": {"url": agent_server.url}},
        "dataObjects": {
            "missing": {"type": "ParquetFileDataObject", "path": str(tmp_path / "nope")},
            "out": {"type": "ParquetFileDataObject", "path": str(tmp_path / "out")},
        },
        "actions": {"bad": {"type": "CopyAction", "inputId": "missing", "outputId": "out",
                            "agentId": "worker"}},
    }
    registry = load_config(cfg)
    # the remote failure fails the run at init (fail-fast, before any write)
    # with the agent's traceback in the message
    with pytest.raises(RuntimeError, match="agent worker failed") as exc:
        SmartDataLakeBuilder(registry=registry).run(spark=spark)
    assert "PATH_NOT_FOUND" in str(exc.value)


def test_cli_agent_server_mode_serves_and_stops(sf_dir):
    """python -m smart_data_lake_spark --agent-server http: the
    LocalJettyAgentSmartDataLakeBuilder-parity launcher serves phase
    requests until SIGTERM."""
    import json as _json
    import os
    import signal
    import subprocess
    import sys
    import time
    import urllib.request

    proc = subprocess.Popen(
        [sys.executable, "-m", "smart_data_lake_spark", "--agent-server", "http",
         "--port", "0"],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    try:
        line = ""
        deadline = time.time() + 120
        while time.time() < deadline:
            line = proc.stdout.readline()
            if "listening on" in line:
                break
        assert "listening on" in line, f"agent never came up: {line!r}"
        url = line.strip().rsplit(" ", 1)[-1]
        payload = {
            "phase": "prepare",
            "config": {
                "dataObjects": {
                    "src": {"type": "ParquetFileDataObject",
                            "path": f"{sf_dir}/region.parquet"},
                },
                "actions": {},
            },
        }
        req = urllib.request.Request(
            url, data=_json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=60) as resp:
            body = _json.loads(resp.read().decode())
        assert resp.status == 200 and "schemas" in body
        proc.send_signal(signal.SIGTERM)
        assert proc.wait(timeout=30) == 0
    finally:
        if proc.poll() is None:
            proc.kill()
