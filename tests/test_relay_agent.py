"""Relay-transport agent: RFC 6455 layer, SAS tokens, Hybrid-Connections
rendezvous, and a full ProxyAction pipeline over the relay.

`MockRelayService` implements the SERVICE side of the documented protocol —
WebSocket upgrades, SAS verification, accept-control push, rendezvous
pairing, frame forwarding — so the listener and sender halves are tested
against a wire-real peer (the Splunk/JMS/STOMP mock pattern).
"""

from __future__ import annotations

import json
import os
import socket
import sys
import threading
import urllib.parse
import uuid

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from smart_data_lake_spark.relay_agent import (
    AzureRelayAgent,
    AzureRelayAgentServer,
    RelayConnectionString,
    generate_sas_token,
    verify_sas_token,
)
from smart_data_lake_spark.ws import ws_accept, ws_connect

KEY_NAME, KEY = "RootManageSharedAccessKey", "the-shared-key"


class MockRelayService:
    """Service side of the Hybrid Connections protocol for one entity path."""

    def __init__(self) -> None:
        self._srv = socket.create_server(("127.0.0.1", 0))
        self.port = self._srv.getsockname()[1]
        self.listeners: dict[str, object] = {}  # entity path -> control ws
        self.pending: dict[str, object] = {}  # rendezvous id -> sender ws
        self.rejected: list[str] = []
        self._stop = False
        threading.Thread(target=self._serve, daemon=True).start()

    def _serve(self) -> None:
        self._srv.settimeout(0.2)
        while not self._stop:
            try:
                conn, _ = self._srv.accept()
            except (socket.timeout, OSError):
                continue
            threading.Thread(target=self._handle, args=(conn,), daemon=True).start()

    def _handle(self, conn: socket.socket) -> None:
        try:
            target, _headers, ws = ws_accept(conn)
        except ConnectionError:
            return
        parts = urllib.parse.urlsplit(target)
        q = dict(urllib.parse.parse_qsl(parts.query))
        path = parts.path.split("/$hc/", 1)[-1]
        action = q.get("sb-hc-action")
        token = q.get("sb-hc-token", "")
        if action in ("listen", "connect") and not verify_sas_token(token, KEY):
            self.rejected.append(action)
            ws.close()
            return
        if action == "listen":
            self.listeners[path] = ws
            # keep the control socket open; accept pushes happen from senders
            return
        if action == "connect":
            listener = self.listeners.get(path)
            if listener is None:
                ws.close()
                return
            rid = uuid.uuid4().hex
            self.pending[rid] = ws
            listener.send_text(
                json.dumps(
                    {
                        "accept": {
                            "address": f"ws://127.0.0.1:{self.port}/$hc/{path}"
                            f"?sb-hc-action=accept&sb-hc-id={rid}",
                            "id": rid,
                            "connectHeaders": {},
                        }
                    }
                )
            )
            return
        if action == "accept":
            sender = self.pending.pop(q.get("sb-hc-id", ""), None)
            if sender is None:
                ws.close()
                return
            # pump frames both directions until either side closes
            t = threading.Thread(target=self._pump, args=(sender, ws), daemon=True)
            t.start()
            self._pump(ws, sender)

    @staticmethod
    def _pump(src, dst) -> None:
        try:
            while True:
                msg = src.recv_message()
                if msg is None:
                    dst.close()
                    return
                if isinstance(msg, bytes):
                    dst.send_binary(msg)
                else:
                    dst.send_text(msg)
        except (ConnectionError, OSError):
            dst.close()

    @property
    def connection_string(self) -> str:
        return (
            f"Endpoint=ws://127.0.0.1:{self.port};SharedAccessKeyName={KEY_NAME};"
            f"SharedAccessKey={KEY};EntityPath=agent1"
        )

    def stop(self) -> None:
        self._stop = True
        self._srv.close()


@pytest.fixture()
def relay():
    svc = MockRelayService()
    yield svc
    svc.stop()


# ------------------------------------------------------------------- ws layer


def test_websocket_roundtrip_masking_and_fragmentation():
    srv = socket.create_server(("127.0.0.1", 0))
    port = srv.getsockname()[1]
    got = {}

    def serve():
        conn, _ = srv.accept()
        target, headers, ws = ws_accept(conn)
        got["target"] = target
        got["first"] = ws.recv_message()
        ws.send_text("pong:" + got["first"])
        # 70 KiB payload exercises the 16-bit length form both directions
        big = ws.recv_message()
        got["big_len"] = len(big)
        ws.send_binary(big[:10])
        ws.recv_message()  # close
        ws.close()

    t = threading.Thread(target=serve, daemon=True)
    t.start()
    ws = ws_connect(f"ws://127.0.0.1:{port}/chan?x=1")
    ws.send_text("hello")
    assert ws.recv_message() == "pong:hello"
    ws.send_binary(b"z" * 70_000)
    assert ws.recv_message() == b"z" * 10
    ws.close()
    t.join(timeout=5)
    assert got["target"] == "/chan?x=1"
    assert got["first"] == "hello"
    assert got["big_len"] == 70_000
    srv.close()


def test_sas_token_roundtrip_and_expiry():
    uri = "sb://ns.example/agent1"
    tok = generate_sas_token(uri, KEY_NAME, KEY, expiry_sec=60)
    assert tok.startswith("SharedAccessSignature sr=")
    assert verify_sas_token(tok, KEY)
    assert not verify_sas_token(tok, "wrong-key")
    expired = generate_sas_token(uri, KEY_NAME, KEY, expiry_sec=-10)
    assert not verify_sas_token(expired, KEY)


def test_connection_string_parse():
    c = RelayConnectionString(
        "Endpoint=sb://ns.servicebus.windows.net/;SharedAccessKeyName=k;SharedAccessKey=s;EntityPath=p;"
    )
    assert c.ws_base == "wss://ns.servicebus.windows.net"
    url = c.attach_url("listen")
    assert "/$hc/p?sb-hc-action=listen&sb-hc-token=" in url


# ------------------------------------------------------------ rendezvous flow


def test_listener_sender_rendezvous_roundtrip(relay):
    server = AzureRelayAgentServer(
        relay.connection_string, handler=lambda p: {"echo": p["phase"], "metrics": {}}
    )
    server.start()
    agent = AzureRelayAgent(id="a1", url=relay.connection_string)
    out = agent.send_instruction({"instruction_id": "i1", "phase": "prepare", "config": {}})
    assert out == {"echo": "prepare", "metrics": {}}
    # a second instruction opens a fresh rendezvous
    out2 = agent.send_instruction({"instruction_id": "i2", "phase": "init", "config": {}})
    assert out2["echo"] == "init"
    assert relay.rejected == []
    server.stop()


def test_bad_sas_rejected(relay):
    bad = relay.connection_string.replace(KEY, "not-the-key")
    agent = AzureRelayAgent(id="a1", url=bad)
    with pytest.raises(Exception):
        agent.send_instruction({"instruction_id": "i", "phase": "prepare", "config": {}})
    assert "connect" in relay.rejected


def test_handler_exception_surfaces_as_error(relay):
    def boom(payload):
        raise RuntimeError("remote kaboom")

    server = AzureRelayAgentServer(relay.connection_string, handler=boom)
    server.start()
    agent = AzureRelayAgent(id="a1", url=relay.connection_string)
    out = agent.send_instruction({"instruction_id": "i", "phase": "exec", "config": {}})
    assert "remote kaboom" in out["error"]
    server.stop()


# --------------------------------------------------- full pipeline over relay


def test_proxy_action_pipeline_over_relay(spark, tmp_path, sf_dir, relay):
    """The e2e agent scenario from test_agents.py, transported over the
    relay instead of HTTP: coordinator's ProxyAction forwards each phase,
    the agent executes the shipped fragment, downstream reads the agent's
    output through shared storage."""
    from smart_data_lake_spark.agents import AgentServer
    from smart_data_lake_spark.plans.app import SmartDataLakeBuilder

    agent_exec = AgentServer(spark)  # reuse the phase executor, not its HTTP loop
    server = AzureRelayAgentServer(relay.connection_string, handler=agent_exec._handle)
    server.start()

    out_path = str(tmp_path / "remote_out")
    builder = SmartDataLakeBuilder(
        config={
            "agents": {"remote": {"type": "AzureRelayAgent", "url": relay.connection_string}},
            "dataObjects": {
                "src": {"type": "ParquetFileDataObject", "path": os.path.join(sf_dir, "region.parquet")},
                "mid": {"type": "ParquetFileDataObject", "path": out_path},
                "dst": {"type": "ParquetFileDataObject", "path": str(tmp_path / "local_out")},
            },
            "actions": {
                "remote_copy": {"type": "CopyAction", "inputId": "src", "outputId": "mid",
                                "agentId": "remote"},
                "local_copy": {"type": "CopyAction", "inputId": "mid", "outputId": "dst"},
            },
        }
    )
    state = builder.run(spark=spark)
    assert state.action_states == {"remote_copy": "SUCCEEDED", "local_copy": "SUCCEEDED"}
    n = spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    assert spark.read.parquet(str(tmp_path / "local_out")).count() == n
    server.stop()


def test_websocket_agent_direct_roundtrip():
    from smart_data_lake_spark.relay_agent import WebSocketAgent, WebSocketAgentServer

    server = WebSocketAgentServer(handler=lambda p: {"echo": p["phase"]})
    server.start()
    agent = WebSocketAgent(id="w", url=server.url)
    assert agent.send_instruction({"phase": "init", "config": {}}) == {"echo": "init"}
    assert agent.send_instruction({"phase": "exec", "config": {}}) == {"echo": "exec"}
    server.stop()


def test_jetty_agent_config_alias(spark, tmp_path, sf_dir):
    """`type: JettyAgent` (the reference's direct-websocket agent) drives a
    real ProxyAction pipeline over the ws transport."""
    from smart_data_lake_spark.agents import AgentServer
    from smart_data_lake_spark.plans.app import SmartDataLakeBuilder
    from smart_data_lake_spark.relay_agent import WebSocketAgentServer

    server = WebSocketAgentServer(handler=AgentServer(spark)._handle)
    server.start()
    builder = SmartDataLakeBuilder(
        config={
            "agents": {"remote": {"type": "JettyAgent", "url": server.url}},
            "dataObjects": {
                "src": {"type": "ParquetFileDataObject", "path": os.path.join(sf_dir, "region.parquet")},
                "mid": {"type": "ParquetFileDataObject", "path": str(tmp_path / "ws_out")},
            },
            "actions": {
                "remote_copy": {"type": "CopyAction", "inputId": "src", "outputId": "mid",
                                "agentId": "remote"},
            },
        }
    )
    state = builder.run(spark=spark)
    assert state.action_states["remote_copy"] == "SUCCEEDED"
    n = spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    assert spark.read.parquet(str(tmp_path / "ws_out")).count() == n
    server.stop()


def test_wss_never_downgrades_to_plaintext():
    """r6 review regression: wss:// to a plain socket must fail the TLS
    handshake, never silently send the SAS token in cleartext."""
    srv = socket.create_server(("127.0.0.1", 0))
    port = srv.getsockname()[1]
    threading.Thread(target=lambda: srv.accept(), daemon=True).start()
    with pytest.raises(Exception):  # ssl handshake failure, not a ws upgrade
        ws_connect(f"wss://127.0.0.1:{port}/x", timeout_sec=3)
    srv.close()


def test_listener_control_socket_blocks_indefinitely(relay):
    """r6 review regression: the listener's control/rendezvous sockets must
    not inherit the 30 s connect timeout (an idle listener died silently)."""
    server = AzureRelayAgentServer(relay.connection_string, handler=lambda p: {"ok": 1})
    server.start()
    assert server._control._sock.gettimeout() is None
    server.stop()


def test_listener_survives_malformed_control_frame(relay):
    server = AzureRelayAgentServer(relay.connection_string, handler=lambda p: {"pong": True})
    server.start()
    # push garbage through the relay's control channel
    relay.listeners["agent1"].send_text("this is not json{{{")
    agent = AzureRelayAgent(id="a1", url=relay.connection_string)
    out = agent.send_instruction({"phase": "prepare", "config": {}})
    assert out == {"pong": True}
    server.stop()
