"""Live run-status server — StatusInfoServer parity on the stdlib.

The reference starts an embedded Jetty exposing the running DAG's state to
the SDLB UI (`sdl-core/.../communication/statusinfo/StatusInfoServer.scala`):
a REST snapshot API (`StatusInfoMethods.scala`: GET /api/v1/state and
/api/v1/context) plus a WebSocket endpoint pushing one message per action
state change (`IncrementalStatusInfoListener.scala`: an SDLMessage of type
StatusUpdate per changed action, EndConnection once the run reaches its
final state) — bound to the first free port in
[port, port + maxPortRetries] (`PortUtils.startOnPort`).

This rebuild serves both surfaces from one stdlib socket server (the
request head decides REST vs WebSocket upgrade; the frames layer is the
RFC 6455 implementation in `ws.py` shared with the Azure-Relay agent) and
plugs into the run through the same `StateListener` hook every other
listener uses (`globalConfig.stateListeners`) — the DAG runner never knows
a UI is watching.
"""

from __future__ import annotations

import dataclasses
import json
import socket
import threading
from typing import Any

from .azure import StateListener
from .ws import WebSocket, complete_server_handshake


def _json_safe(obj: Any) -> Any:
    """Context dicts carry live handles (spark, registry) — drop them and
    stringify anything else json can't take."""
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        return _json_safe(dataclasses.asdict(obj))
    if isinstance(obj, dict):
        return {
            str(k): _json_safe(v)
            for k, v in obj.items()
            if k not in ("spark", "registry")
        }
    if isinstance(obj, (list, tuple)):
        return [_json_safe(v) for v in obj]
    if isinstance(obj, (str, int, float, bool)) or obj is None:
        return obj
    return str(obj)


class SnapshotStatusInfoListener(StateListener):
    """Holds the latest (state, context) for the REST snapshot API
    (SnapshotStatusInfoListener.scala: stateVar/contextVar)."""

    def __init__(self) -> None:
        self.state_var: Any = None
        self.context_var: dict[str, Any] | None = None

    def notify_state(self, state: Any, context: dict[str, Any], changed_action_id: str | None) -> None:
        self.state_var = state
        self.context_var = context


class IncrementalStatusInfoListener(StateListener):
    """Pushes one StatusUpdate SDLMessage per changed action to every
    connected WebSocket; at the final notification (no changed action) an
    EndConnection message is sent and the sockets are closed — the exact
    message flow of IncrementalStatusInfoListener.scala."""

    def __init__(self) -> None:
        self.active_sockets: list[WebSocket] = []
        self._lock = threading.Lock()

    def notify_state(self, state: Any, context: dict[str, Any], changed_action_id: str | None) -> None:
        if changed_action_id is not None:
            msg = {
                "msgType": "StatusUpdate",
                "statusUpdate": {
                    "actionId": changed_action_id,
                    "state": getattr(state, "action_states", {}).get(changed_action_id),
                    "phase": context.get("phase"),
                    "finalState": bool(getattr(state, "is_final", False)),
                },
            }
            final = False
        else:
            msg = {
                "msgType": "EndConnection",
                "statusUpdate": {
                    "actionId": None,
                    "state": None,
                    "phase": context.get("phase"),
                    "finalState": bool(getattr(state, "is_final", False)),
                },
            }
            final = True
        text = json.dumps(msg)
        with self._lock:
            alive: list[WebSocket] = []
            for ws in self.active_sockets:
                try:
                    ws.send_text(text)
                    if final:
                        ws.close()
                    else:
                        alive.append(ws)
                except OSError:
                    pass  # dead client: drop it
            self.active_sockets[:] = alive if not final else []


class StatusInfoServer:
    """One socket server, two surfaces:

      * ``GET /api/v1/state`` / ``GET /api/v1/context`` — JSON snapshot of
        the latest run state / pipeline context (``null`` before the first
        notification, like the reference's ``Option``).
      * WebSocket upgrade on any path — registered with the incremental
        listener for push updates.

    ``start()`` binds the first free port in [port, port + max_port_retries]
    and returns it (PortUtils.startOnPort semantics: the UI retries known
    ports rather than reading ephemeral ones)."""

    def __init__(
        self,
        snapshot: SnapshotStatusInfoListener | None = None,
        incremental: IncrementalStatusInfoListener | None = None,
        host: str = "127.0.0.1",
        port: int = 4440,
        max_port_retries: int = 10,
    ) -> None:
        self.snapshot = snapshot or SnapshotStatusInfoListener()
        self.incremental = incremental or IncrementalStatusInfoListener()
        self.host = host
        self.port = port
        self.max_port_retries = max_port_retries
        self._sock: socket.socket | None = None
        self._stopping = False

    # both listeners in one object so a config can register the server
    # itself as a stateListener
    def notify_state(self, state: Any, context: dict[str, Any], changed_action_id: str | None) -> None:
        self.snapshot.notify_state(state, context, changed_action_id)
        self.incremental.notify_state(state, context, changed_action_id)

    def init(self, context: dict[str, Any]) -> None:
        if self._sock is None:
            self.start()

    def start(self) -> int:
        last_err: OSError | None = None
        for offset in range(self.max_port_retries + 1):
            candidate = self.port + offset if self.port else 0
            s = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
            try:
                s.bind((self.host, candidate))
            except OSError as e:
                s.close()
                last_err = e
                continue
            s.listen(16)
            self._sock = s
            self.port = s.getsockname()[1]
            threading.Thread(target=self._accept_loop, daemon=True).start()
            return self.port
        raise OSError(
            f"StatusInfoServer: no free port in [{self.port}, "
            f"{self.port + self.max_port_retries}]"
        ) from last_err

    def stop(self) -> None:
        self._stopping = True
        if self._sock is not None:
            try:
                self._sock.close()
            except OSError:
                pass
            self._sock = None
        with self.incremental._lock:
            for ws in self.incremental.active_sockets:
                try:
                    ws.close()
                except OSError:
                    pass
            self.incremental.active_sockets.clear()

    # ------------------------------------------------------------ internals

    def _accept_loop(self) -> None:
        while not self._stopping and self._sock is not None:
            try:
                conn, _ = self._sock.accept()
            except OSError:
                return  # listener closed
            threading.Thread(target=self._serve, args=(conn,), daemon=True).start()

    def _serve(self, conn: socket.socket) -> None:
        try:
            data = b""
            while b"\r\n\r\n" not in data:
                chunk = conn.recv(4096)
                if not chunk:
                    conn.close()
                    return
                data += chunk
            head, _, rest = data.partition(b"\r\n\r\n")
            lines = head.decode("latin-1").split("\r\n")
            method, target, _ver = lines[0].split(" ", 2)
            headers = {
                k.lower(): v.strip()
                for k, _, v in (ln.partition(":") for ln in lines[1:])
            }
            if headers.get("upgrade", "").lower() == "websocket":
                self._serve_websocket(conn, headers, rest)
            else:
                self._serve_rest(conn, method, target)
        except (OSError, ValueError):
            try:
                conn.close()
            except OSError:
                pass

    def _serve_websocket(self, conn: socket.socket, headers: dict[str, str], rest: bytes) -> None:
        try:
            ws = complete_server_handshake(conn, headers, rest)
        except ConnectionError:
            conn.close()
            return
        # a stalled client must never block the DAG runner: sends time out
        # after 5s (notify_state treats the timeout as a dead client and
        # drops the socket); the drain loop below treats its own timeouts
        # as keep-waiting, not as failures
        conn.settimeout(5.0)
        with self.incremental._lock:
            self.incremental.active_sockets.append(ws)
        # drain client frames (answers pings inside recv_message) until close
        try:
            while True:
                try:
                    if ws.recv_message() is None:
                        break
                except TimeoutError:
                    continue  # idle client: keep listening
        except (OSError, ConnectionError):
            pass
        finally:
            with self.incremental._lock:
                if ws in self.incremental.active_sockets:
                    self.incremental.active_sockets.remove(ws)
            try:
                ws.close()  # clean client close must not leak the fd
            except OSError:
                pass

    def _serve_rest(self, conn: socket.socket, method: str, target: str) -> None:
        path = target.split("?", 1)[0]
        if method != "GET":
            body, code = b'{"error": "method not allowed"}', "405 Method Not Allowed"
        elif path == "/api/v1/state":
            body = json.dumps(_json_safe(self.snapshot.state_var)).encode()
            code = "200 OK"
        elif path == "/api/v1/context":
            body = json.dumps(_json_safe(self.snapshot.context_var)).encode()
            code = "200 OK"
        else:
            body, code = b'{"error": "not found"}', "404 Not Found"
        conn.sendall(
            (
                f"HTTP/1.1 {code}\r\n"
                "Content-Type: application/json\r\n"
                f"Content-Length: {len(body)}\r\n"
                "Connection: close\r\n\r\n"
            ).encode()
            + body
        )
        conn.close()
