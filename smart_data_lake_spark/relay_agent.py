"""Relay-style agent transport: both peers dial OUT to a relay service.

Reference: ``sdl-azure/.../communication/agent/AzureRelayAgentServer.scala``
+ ``AzureRelayAgentClient.scala`` + ``workflow/agent/AzureRelayAgent.scala``.
The defining property of that deployment model is NAT/firewall traversal:
the agent (listener) and the coordinator (sender) both open OUTBOUND
WebSocket connections to the relay namespace, which rendezvouses them; no
inbound port ever opens on the agent's network.

The reference delegates the wire work to the Azure Relay SDK. This rebuild
speaks the documented **Hybrid Connections protocol** directly on the
RFC 6455 implementation in `ws.py` (public spec: "Azure Relay Hybrid
Connections protocol" — learn.microsoft.com):

* listener attaches with ``GET wss://ns/$hc/{path}?sb-hc-action=listen
  &sb-hc-token={SAS}``;
* the service pushes a JSON control frame ``{"accept": {"address": ...,
  "id": ...}}`` per incoming sender;
* the listener dials the rendezvous ``address`` and that socket becomes the
  data channel;
* senders attach with ``sb-hc-action=connect`` and their socket IS the data
  channel;
* auth is a Service Bus **SAS token** (public algorithm:
  ``SharedAccessSignature sr=<url-encoded uri>&sig=<b64 HMAC-SHA256(key,
  "<uri>\\n<expiry>")>&se=<expiry>&skn=<keyname>``).

Message layer: the same flat JSON instruction/response contract as
`agents.HttpAgent`/`AgentServer` (instruction_id/phase/config → schemas/
metrics/error) — the reference's SDLMessage envelope carries the identical
information. `MockRelayService` in tests implements the service side of the
protocol, SAS verification included, so both halves are exercised against a
wire-real peer.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import json
import threading
import time
import traceback
import urllib.parse
from typing import Any, Callable

from smart_data_lake_spark.config import ConfigError, resolve_secret
from smart_data_lake_spark.ws import WebSocket, ws_connect


# ------------------------------------------------------------------ SAS auth


def generate_sas_token(
    resource_uri: str, key_name: str, key: str, expiry_sec: int = 3600, _now: float | None = None
) -> str:
    """Service Bus shared-access-signature token (public algorithm)."""
    expiry = int((_now if _now is not None else time.time()) + expiry_sec)
    encoded = urllib.parse.quote_plus(resource_uri)
    to_sign = f"{encoded}\n{expiry}".encode()
    sig = base64.b64encode(
        hmac.new(resolve_secret(key).encode(), to_sign, hashlib.sha256).digest()
    ).decode()
    return (
        f"SharedAccessSignature sr={encoded}&sig={urllib.parse.quote_plus(sig)}"
        f"&se={expiry}&skn={key_name}"
    )


def verify_sas_token(token: str, key: str, _now: float | None = None) -> bool:
    """Service-side check (what MockRelayService enforces): signature over
    (sr, se) with the shared key, and not expired."""
    if not token.startswith("SharedAccessSignature "):
        return False
    fields = dict(
        kv.split("=", 1) for kv in token[len("SharedAccessSignature ") :].split("&") if "=" in kv
    )
    try:
        sr, sig, se = fields["sr"], urllib.parse.unquote_plus(fields["sig"]), int(fields["se"])
    except (KeyError, ValueError):
        return False
    if se < (_now if _now is not None else time.time()):
        return False
    expect = base64.b64encode(
        hmac.new(key.encode(), f"{sr}\n{se}".encode(), hashlib.sha256).digest()
    ).decode()
    return hmac.compare_digest(sig, expect)


class RelayConnectionString:
    """Parse ``Endpoint=sb://ns/;SharedAccessKeyName=n;SharedAccessKey=k;
    EntityPath=p`` (the Azure RelayConnectionStringBuilder format)."""

    def __init__(self, connection_string: str) -> None:
        fields = dict(
            kv.split("=", 1) for kv in connection_string.strip().rstrip(";").split(";") if "=" in kv
        )
        try:
            self.endpoint = fields["Endpoint"].rstrip("/")
            self.key_name = fields["SharedAccessKeyName"]
            self.key = fields["SharedAccessKey"]
            self.entity_path = fields["EntityPath"]
        except KeyError as e:
            raise ConfigError(f"relay connection string missing {e.args[0]}") from e
        # sb:// is the namespace scheme; the websocket attach goes over wss
        # (ws in tests against the local mock)
        self.ws_base = (
            self.endpoint.replace("sb://", "wss://", 1)
            if self.endpoint.startswith("sb://")
            else self.endpoint
        )

    def attach_url(self, action: str) -> str:
        token = generate_sas_token(
            f"{self.endpoint}/{self.entity_path}", self.key_name, self.key
        )
        return (
            f"{self.ws_base}/$hc/{self.entity_path}"
            f"?sb-hc-action={action}&sb-hc-token={urllib.parse.quote_plus(token)}"
        )


# ------------------------------------------------------------------ listener


class AzureRelayAgentServer:
    """Agent-side listener (AzureRelayAgentServer.scala:30-60): attach to
    the relay, accept rendezvous connections, execute shipped config
    fragments via ``handler`` (AgentServer._handle — phase semantics
    identical to the HTTP transport), reply with schemas/metrics or the
    remote traceback."""

    def __init__(self, connection_string: str, handler: Callable[[dict], dict]) -> None:
        self.conn = RelayConnectionString(connection_string)
        self.handler = handler
        self._control: WebSocket | None = None
        self._channels: set[WebSocket] = set()  # live rendezvous channels
        self._lock = threading.Lock()
        self._stopped = False

    def start(self) -> None:
        # recv_timeout None: a listener idles between senders indefinitely —
        # a leftover connect timeout here silently killed the control loop
        # after 30 quiet seconds (r6 review finding)
        self._control = ws_connect(self.conn.attach_url("listen"), recv_timeout_sec=None)
        threading.Thread(target=self._control_loop, daemon=True).start()

    def _control_loop(self) -> None:
        import logging

        log = logging.getLogger(__name__)
        while not self._stopped:
            try:
                msg = self._control.recv_message()
            except (ConnectionError, OSError) as e:
                if not self._stopped:
                    log.warning("relay control connection lost: %s", e)
                return
            if msg is None:
                return
            try:
                control = json.loads(msg)
            except (ValueError, TypeError):
                # one malformed control frame must not kill the listener
                log.warning("ignoring malformed relay control frame: %.200r", msg)
                continue
            if "accept" in control:
                address = control["accept"]["address"]
                threading.Thread(target=self._serve_rendezvous, args=(address,), daemon=True).start()

    def _serve_rendezvous(self, address: str) -> None:
        try:
            channel = ws_connect(address, recv_timeout_sec=None)
        except (ConnectionError, OSError):
            return
        with self._lock:
            self._channels.add(channel)
        try:
            while True:
                msg = channel.recv_message()
                if msg is None:
                    return
                try:
                    response = self.handler(json.loads(msg))
                except Exception:  # noqa: BLE001 — remote gets the traceback
                    response = {"error": traceback.format_exc()}
                channel.send_text(json.dumps(response))
        except (ConnectionError, OSError):
            pass
        finally:
            with self._lock:
                self._channels.discard(channel)
            channel.close()

    def stop(self) -> None:
        self._stopped = True
        if self._control is not None:
            self._control.close()
        with self._lock:
            channels = list(self._channels)
        for ch in channels:
            ch.close()


# -------------------------------------------------------------------- sender


class AzureRelayAgent:
    """Coordinator-side agent declaration (workflow/agent/AzureRelayAgent
    .scala + AzureRelayAgentClient.sendSDLMessage): one rendezvous per
    instruction — connect, send, await the single response, close. Drop-in
    for `agents.HttpAgent` (same send_instruction contract), selected in
    config with ``type: AzureRelayAgent`` and a relay ``url`` connection
    string."""

    def __init__(self, id: str, url: str, timeout_sec: float = 300.0) -> None:
        self.id = id
        self.conn = RelayConnectionString(url)
        self.timeout_sec = timeout_sec

    def send_instruction(self, payload: dict[str, Any]) -> dict[str, Any]:
        channel = ws_connect(
            self.conn.attach_url("connect"),
            timeout_sec=self.timeout_sec,
            recv_timeout_sec=self.timeout_sec,
        )
        try:
            channel.send_text(json.dumps(payload))
            msg = channel.recv_message()
            if msg is None:
                raise ConnectionError(
                    f"({self.id}) relay agent closed without a response "
                    "(AgentServer must respond with a result)"
                )
            return json.loads(msg)
        finally:
            channel.close()


# ---------------------------------------------------- direct websocket agent


class WebSocketAgentServer:
    """Direct WebSocket agent endpoint (the reference's Jetty websocket
    server, ``communication/agent/JettyAgentServer*`` — agent exposes a ws
    port, coordinator dials in). Shares the instruction handler with the
    HTTP and relay transports."""

    def __init__(self, handler: Callable[[dict], dict], host: str = "127.0.0.1", port: int = 0) -> None:
        import socket as _socket

        self.handler = handler
        self._srv = _socket.create_server((host, port))
        self.port = self._srv.getsockname()[1]
        self.host = host
        self._stopped = False
        self._thread: threading.Thread | None = None

    @property
    def url(self) -> str:
        return f"ws://{self.host}:{self.port}/agent"

    def start(self) -> None:
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()

    def _serve(self) -> None:
        import socket as _socket

        from smart_data_lake_spark.ws import ws_accept

        self._srv.settimeout(0.2)
        while not self._stopped:
            try:
                conn, _ = self._srv.accept()
            except (_socket.timeout, OSError):
                continue
            threading.Thread(target=self._serve_conn, args=(conn,), daemon=True).start()

    def _serve_conn(self, conn) -> None:
        from smart_data_lake_spark.ws import ws_accept

        try:
            _target, _headers, ws = ws_accept(conn)
        except ConnectionError:
            return
        try:
            while True:
                msg = ws.recv_message()
                if msg is None:
                    return
                try:
                    response = self.handler(json.loads(msg))
                except Exception:  # noqa: BLE001 — remote gets the traceback
                    response = {"error": traceback.format_exc()}
                ws.send_text(json.dumps(response))
        finally:
            ws.close()

    def stop(self) -> None:
        self._stopped = True
        try:
            self._srv.close()
        except OSError:
            pass


class WebSocketAgent:
    """Coordinator-side declaration for a direct websocket agent
    (workflow/agent/JettyAgent.scala:27 — id + ws url). One connection per
    instruction; same send_instruction contract as HttpAgent."""

    def __init__(self, id: str, url: str, timeout_sec: float = 300.0) -> None:
        self.id = id
        self.url = url
        self.timeout_sec = timeout_sec

    def send_instruction(self, payload: dict[str, Any]) -> dict[str, Any]:
        channel = ws_connect(self.url, timeout_sec=self.timeout_sec, recv_timeout_sec=self.timeout_sec)
        try:
            channel.send_text(json.dumps(payload))
            msg = channel.recv_message()
            if msg is None:
                raise ConnectionError(f"({self.id}) websocket agent closed without a response")
            return json.loads(msg)
        finally:
            channel.close()
