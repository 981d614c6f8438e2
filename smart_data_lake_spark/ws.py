"""Minimal RFC 6455 WebSocket client + server on stdlib sockets.

Transport substrate for the Azure-Relay-style agent channel
(`relay_agent.py`) — the same no-external-dependency approach as the STOMP
client in `dataobjects/jms.py`. Implements the subset the agent protocol
needs, wire-correct per the RFC:

* opening handshake both directions (Sec-WebSocket-Key/-Accept with the RFC
  GUID, HTTP/1.1 101 upgrade);
* text/binary data frames with 7/16/64-bit payload lengths;
* client-to-server masking (REQUIRED by §5.3; servers MUST reject unmasked
  client frames) and unmasked server frames;
* fragmented messages (continuation frames) reassembled in recv;
* ping auto-answered with pong (§5.5.2-3); close handshake echoed.
"""

from __future__ import annotations

import base64
import hashlib
import os
import socket
import struct
import urllib.parse

_WS_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"

OP_CONT, OP_TEXT, OP_BINARY, OP_CLOSE, OP_PING, OP_PONG = 0x0, 0x1, 0x2, 0x8, 0x9, 0xA

# Unauthenticated-peer hardening: a declared 64-bit payload length must not
# drive the allocation, and fragmented messages must not accumulate without
# bound. 64 MiB comfortably covers agent-protocol messages (serialized
# subfeed configs + schemas).
MAX_MESSAGE_BYTES = 64 * 1024 * 1024


def _accept_value(key: str) -> str:
    return base64.b64encode(hashlib.sha1((key + _WS_GUID).encode()).digest()).decode()


class WebSocket:
    """One established WebSocket endpoint. ``client=True`` masks outgoing
    frames (RFC 6455 §5.3)."""

    def __init__(self, sock: socket.socket, client: bool) -> None:
        self._sock = sock
        self._client = client
        self._buf = b""
        self.closed = False

    # ---------------------------------------------------------------- send
    def send_text(self, text: str) -> None:
        self._send_frame(OP_TEXT, text.encode("utf-8"))

    def send_binary(self, data: bytes) -> None:
        self._send_frame(OP_BINARY, data)

    def _send_frame(self, opcode: int, payload: bytes) -> None:
        header = bytes([0x80 | opcode])
        n = len(payload)
        mask_bit = 0x80 if self._client else 0x00
        if n < 126:
            header += bytes([mask_bit | n])
        elif n < (1 << 16):
            header += bytes([mask_bit | 126]) + struct.pack(">H", n)
        else:
            header += bytes([mask_bit | 127]) + struct.pack(">Q", n)
        if self._client:
            mask = os.urandom(4)
            header += mask
            payload = bytes(b ^ mask[i % 4] for i, b in enumerate(payload))
        self._sock.sendall(header + payload)

    # ---------------------------------------------------------------- recv
    def _read_exact(self, n: int) -> bytes:
        while len(self._buf) < n:
            chunk = self._sock.recv(65536)
            if not chunk:
                raise ConnectionError("websocket peer closed mid-frame")
            self._buf += chunk
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def _recv_frame(self) -> tuple[int, bool, bytes]:
        b0, b1 = self._read_exact(2)
        fin = bool(b0 & 0x80)
        opcode = b0 & 0x0F
        masked = bool(b1 & 0x80)
        n = b1 & 0x7F
        if n == 126:
            n = struct.unpack(">H", self._read_exact(2))[0]
        elif n == 127:
            n = struct.unpack(">Q", self._read_exact(8))[0]
        if n > MAX_MESSAGE_BYTES:
            # reject BEFORE allocating — a forged 64-bit length must not
            # drive a multi-GiB buffer on an unauthenticated socket
            raise ConnectionError(
                f"websocket frame of {n} bytes exceeds cap {MAX_MESSAGE_BYTES}"
            )
        mask = self._read_exact(4) if masked else b""
        payload = self._read_exact(n)
        if masked:
            payload = bytes(b ^ mask[i % 4] for i, b in enumerate(payload))
        if not self._client and not masked:
            # §5.1: ALL client frames (data and control) must be masked;
            # a server MUST close the connection on an unmasked client frame
            raise ConnectionError("client frame not masked (RFC 6455 §5.1)")
        return opcode, fin, payload

    def recv_message(self) -> str | bytes | None:
        """Next DATA message (text→str, binary→bytes), transparently
        answering pings and echoing close. None = clean close."""
        parts: list[bytes] = []
        first_op: int | None = None
        while True:
            opcode, fin, payload = self._recv_frame()
            if opcode == OP_PING:
                self._send_frame(OP_PONG, payload)
                continue
            if opcode == OP_PONG:
                continue
            if opcode == OP_CLOSE:
                if not self.closed:
                    try:
                        self._send_frame(OP_CLOSE, payload[:2])
                    except OSError:
                        pass
                    self.closed = True
                return None
            if opcode in (OP_TEXT, OP_BINARY):
                if first_op is not None:
                    raise ConnectionError(
                        "new data frame while a fragmented message is in progress"
                    )
                first_op = opcode
                parts = [payload]
            elif opcode == OP_CONT:
                if first_op is None:
                    # §5.4: continuation with no message in progress — without
                    # this check a malicious peer makes recv loop forever
                    raise ConnectionError("continuation frame with no message in progress")
                parts.append(payload)
            if sum(len(p) for p in parts) > MAX_MESSAGE_BYTES:
                raise ConnectionError(
                    f"fragmented message exceeds cap {MAX_MESSAGE_BYTES}"
                )
            if fin and first_op is not None:
                data = b"".join(parts)
                return data.decode("utf-8") if first_op == OP_TEXT else data

    def close(self) -> None:
        if not self.closed:
            self.closed = True
            try:
                self._send_frame(OP_CLOSE, struct.pack(">H", 1000))
            except OSError:
                pass
        try:
            self._sock.close()
        except OSError:
            pass


def ws_connect(
    url: str,
    timeout_sec: float = 30.0,
    recv_timeout_sec: float | None = None,
    allow_insecure_wss: bool = False,
) -> WebSocket:
    """Client handshake. ``timeout_sec`` bounds connect + handshake;
    ``recv_timeout_sec`` is the timeout for SUBSEQUENT reads — None (the
    default) blocks indefinitely, which is what long-lived listener
    connections need (a leftover connect timeout on the socket would
    silently kill an idle listener after 30 s).

    wss:// always negotiates TLS; ``allow_insecure_wss=True`` is an explicit
    test-only opt-out (never infer plaintext from the hostname — a SAS token
    in the query string must not silently cross the wire unencrypted)."""
    parts = urllib.parse.urlsplit(url)
    if parts.scheme not in ("ws", "wss"):
        raise ValueError(f"unsupported scheme {parts.scheme!r}")
    port = parts.port or (443 if parts.scheme == "wss" else 80)
    sock = socket.create_connection((parts.hostname, port), timeout=timeout_sec)
    if parts.scheme == "wss" and not allow_insecure_wss:
        import ssl

        sock = ssl.create_default_context().wrap_socket(sock, server_hostname=parts.hostname)
    key = base64.b64encode(os.urandom(16)).decode()
    path = parts.path or "/"
    if parts.query:
        path += "?" + parts.query
    request = (
        f"GET {path} HTTP/1.1\r\n"
        f"Host: {parts.hostname}:{port}\r\n"
        "Upgrade: websocket\r\n"
        "Connection: Upgrade\r\n"
        f"Sec-WebSocket-Key: {key}\r\n"
        "Sec-WebSocket-Version: 13\r\n\r\n"
    )
    sock.sendall(request.encode())
    response = b""
    while b"\r\n\r\n" not in response:
        chunk = sock.recv(4096)
        if not chunk:
            raise ConnectionError("handshake: server closed")
        response += chunk
    head, _, rest = response.partition(b"\r\n\r\n")
    lines = head.decode("latin-1").split("\r\n")
    if " 101 " not in lines[0] and not lines[0].endswith(" 101"):
        raise ConnectionError(f"handshake rejected: {lines[0]}")
    headers = {k.lower(): v.strip() for k, _, v in (ln.partition(":") for ln in lines[1:])}
    if headers.get("sec-websocket-accept") != _accept_value(key):
        raise ConnectionError("handshake: bad Sec-WebSocket-Accept")
    sock.settimeout(recv_timeout_sec)  # drop the connect timeout for reads
    ws = WebSocket(sock, client=True)
    ws._buf = rest
    return ws


def ws_accept(conn: socket.socket) -> tuple[str, dict[str, str], WebSocket]:
    """Server-side handshake on an accepted socket. Returns
    (request-target incl. query, headers, WebSocket)."""
    data = b""
    while b"\r\n\r\n" not in data:
        chunk = conn.recv(4096)
        if not chunk:
            raise ConnectionError("handshake: client closed")
        data += chunk
    head, _, rest = data.partition(b"\r\n\r\n")
    lines = head.decode("latin-1").split("\r\n")
    try:
        _method, target, _ver = lines[0].split(" ", 2)
    except ValueError as e:
        raise ConnectionError(f"bad request line {lines[0]!r}") from e
    headers = {k.lower(): v.strip() for k, _, v in (ln.partition(":") for ln in lines[1:])}
    if headers.get("upgrade", "").lower() != "websocket":
        conn.sendall(b"HTTP/1.1 400 Bad Request\r\n\r\n")
        raise ConnectionError("not a websocket upgrade")
    ws = complete_server_handshake(conn, headers, rest)
    return target, headers, ws


def complete_server_handshake(
    conn: socket.socket, headers: dict[str, str], buffered: bytes = b""
) -> WebSocket:
    """Finish the server side of an upgrade whose request head is already
    parsed: send the 101 + Sec-WebSocket-Accept and return the WebSocket
    primed with any bytes read past the head. Shared by `ws_accept` and
    servers that multiplex REST + WebSocket on one listener
    (statusinfo.StatusInfoServer)."""
    key = headers.get("sec-websocket-key")
    if not key:
        conn.sendall(b"HTTP/1.1 400 Bad Request\r\n\r\n")
        raise ConnectionError("websocket upgrade without Sec-WebSocket-Key")
    conn.sendall(
        (
            "HTTP/1.1 101 Switching Protocols\r\n"
            "Upgrade: websocket\r\n"
            "Connection: Upgrade\r\n"
            f"Sec-WebSocket-Accept: {_accept_value(key)}\r\n\r\n"
        ).encode()
    )
    ws = WebSocket(conn, client=False)
    ws._buf = buffered
    return ws
