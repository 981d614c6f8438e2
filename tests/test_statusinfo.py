"""StatusInfoServer: REST snapshot + WebSocket push over real sockets
(StatusInfoServer.scala / StatusInfoMethods.scala /
IncrementalStatusInfoListener.scala parity)."""

from __future__ import annotations

import json
import os
import socket
import sys
import urllib.request

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from smart_data_lake_spark.plans.dag import RunState
from smart_data_lake_spark.statusinfo import StatusInfoServer
from smart_data_lake_spark.ws import ws_connect


@pytest.fixture()
def server():
    srv = StatusInfoServer(port=0)
    srv.start()
    yield srv
    srv.stop()


def _get(srv, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{srv.port}{path}", timeout=5) as r:
        return r.status, json.loads(r.read().decode())


def test_rest_state_null_before_first_notification(server):
    status, body = _get(server, "/api/v1/state")
    assert status == 200 and body is None
    status, body = _get(server, "/api/v1/context")
    assert status == 200 and body is None


def test_rest_snapshot_after_notifications(server):
    st = RunState(run_id=3, attempt_id=1, action_states={"a1": "SUCCEEDED"})
    server.notify_state(st, {"application": "app", "phase": "exec", "spark": object()}, "a1")
    _, body = _get(server, "/api/v1/state")
    assert body["run_id"] == 3
    assert body["action_states"] == {"a1": "SUCCEEDED"}
    _, ctx = _get(server, "/api/v1/context")
    assert ctx["application"] == "app"
    assert "spark" not in ctx  # live handles never serialized


def test_rest_unknown_path_404(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(server, "/api/v2/nope")
    assert e.value.code == 404


def test_websocket_receives_status_updates_then_end_connection(server):
    ws = ws_connect(f"ws://127.0.0.1:{server.port}/ws", recv_timeout_sec=5)
    import time

    for _ in range(50):  # wait for the server to register the socket
        if server.incremental.active_sockets:
            break
        time.sleep(0.02)
    st = RunState(run_id=1, action_states={"a1": "SUCCEEDED"})
    server.notify_state(st, {"phase": "exec"}, "a1")
    msg = json.loads(ws.recv_message())
    assert msg["msgType"] == "StatusUpdate"
    assert msg["statusUpdate"]["actionId"] == "a1"
    assert msg["statusUpdate"]["state"] == "SUCCEEDED"
    assert msg["statusUpdate"]["finalState"] is False

    st.is_final = True
    server.notify_state(st, {"phase": "exec"}, None)
    msg = json.loads(ws.recv_message())
    assert msg["msgType"] == "EndConnection"
    assert msg["statusUpdate"]["finalState"] is True
    assert ws.recv_message() is None  # server closed the connection
    assert server.incremental.active_sockets == []


def test_dead_websocket_client_is_dropped_not_fatal(server):
    ws = ws_connect(f"ws://127.0.0.1:{server.port}/", recv_timeout_sec=5)
    import time

    for _ in range(50):
        if server.incremental.active_sockets:
            break
        time.sleep(0.02)
    ws._sock.close()  # client dies without a close handshake
    st = RunState(run_id=1, action_states={"a1": "FAILED"})
    server.notify_state(st, {"phase": "exec"}, "a1")  # must not raise
    server.notify_state(st, {"phase": "exec"}, "a1")
    assert server.incremental.active_sockets == []


def test_port_retry_binds_next_free_port():
    blocker = socket.socket()
    blocker.bind(("127.0.0.1", 0))
    blocker.listen(1)
    taken = blocker.getsockname()[1]
    try:
        srv = StatusInfoServer(port=taken, max_port_retries=3)
        bound = srv.start()
        assert taken < bound <= taken + 3
        srv.stop()
    finally:
        blocker.close()


def test_config_registers_and_starts_server(tmp_path):
    from smart_data_lake_spark.config import load_config
    from smart_data_lake_spark.statusinfo import StatusInfoServer as SIS

    registry = load_config(
        {
            "globalConfig": {
                "stateListeners": [
                    {"className": "StatusInfoServer", "options": {"port": 0}}
                ]
            },
            "dataObjects": {},
            "actions": {},
        }
    )
    try:
        srvs = [l for l in registry.state_listeners if isinstance(l, SIS)]
        assert len(srvs) == 1 and srvs[0].port > 0
        status, body = _get(srvs[0], "/api/v1/state")
        assert status == 200 and body is None
    finally:
        for s in srvs:
            s.stop()


def test_stalled_client_cannot_block_notify(server):
    """A client that stops reading must be dropped via the send timeout,
    never blocking the DAG runner thread (review finding)."""
    import time

    ws = ws_connect(f"ws://127.0.0.1:{server.port}/ws", recv_timeout_sec=5)
    for _ in range(50):
        if server.incremental.active_sockets:
            break
        time.sleep(0.02)
    # shrink the client's receive window so the server-side send buffer
    # fills fast, then never read
    ws._sock.setsockopt(socket.SOL_SOCKET, socket.SO_RCVBUF, 4096)
    st = RunState(run_id=1, action_states={"a1": "SUCCEEDED" * 50})
    start = time.time()
    for i in range(5000):
        server.notify_state(st, {"phase": "exec"}, "a1")
        if not server.incremental.active_sockets:
            break  # dropped as dead — the desired outcome
        if time.time() - start > 30:
            pytest.fail("notify_state never unblocked/dropped the stalled client")
    assert server.incremental.active_sockets == []
    assert time.time() - start < 30
