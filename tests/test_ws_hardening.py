"""RFC 6455 server-side hardening (r7 ADVICE fixes): declared-length cap
before allocation, OP_CONT with no message in progress rejected, ALL client
frames (control included) must be masked, fragmented-message size cap."""

from __future__ import annotations

import os
import socket
import struct
import threading

import pytest

from smart_data_lake_spark.ws import (
    MAX_MESSAGE_BYTES,
    OP_CONT,
    OP_PING,
    OP_TEXT,
    WebSocket,
)


def _frame(opcode: int, payload: bytes, fin: bool = True, mask: bool = True,
           declared_len: int | None = None) -> bytes:
    head = bytes([(0x80 if fin else 0) | opcode])
    n = len(payload) if declared_len is None else declared_len
    mask_bit = 0x80 if mask else 0x00
    if n < 126:
        head += bytes([mask_bit | n])
    elif n < (1 << 16):
        head += bytes([mask_bit | 126]) + struct.pack(">H", n)
    else:
        head += bytes([mask_bit | 127]) + struct.pack(">Q", n)
    if mask:
        key = os.urandom(4)
        head += key
        payload = bytes(b ^ key[i % 4] for i, b in enumerate(payload))
    return head + payload


def _pair() -> tuple[socket.socket, WebSocket]:
    a, b = socket.socketpair()
    a.settimeout(5)
    b.settimeout(5)
    return a, WebSocket(b, client=False)


def test_oversized_declared_length_rejected_before_allocation():
    raw, server = _pair()
    # declared 1 TiB payload, no bytes actually sent — the cap must trip on
    # the declared length, not after buffering
    raw.sendall(_frame(OP_TEXT, b"", declared_len=1 << 40))
    with pytest.raises(ConnectionError, match="exceeds cap"):
        server.recv_message()
    raw.close()
    server.close()


def test_continuation_with_no_message_rejected():
    raw, server = _pair()
    raw.sendall(_frame(OP_CONT, b"orphan"))
    with pytest.raises(ConnectionError, match="no message in progress"):
        server.recv_message()
    raw.close()
    server.close()


def test_unmasked_client_control_frame_rejected():
    raw, server = _pair()
    raw.sendall(_frame(OP_PING, b"hi", mask=False))
    with pytest.raises(ConnectionError, match="not masked"):
        server.recv_message()
    raw.close()
    server.close()


def test_data_frame_mid_fragmentation_rejected():
    raw, server = _pair()
    raw.sendall(_frame(OP_TEXT, b"part1", fin=False))
    raw.sendall(_frame(OP_TEXT, b"fresh", fin=True))
    with pytest.raises(ConnectionError, match="in progress"):
        server.recv_message()
    raw.close()
    server.close()


def test_fragmented_message_still_reassembles():
    raw, server = _pair()
    raw.sendall(_frame(OP_TEXT, b"hello ", fin=False))
    raw.sendall(_frame(OP_CONT, b"world", fin=True))
    assert server.recv_message() == "hello world"
    raw.close()
    server.close()


def test_client_to_server_roundtrip_still_works():
    # end-to-end sanity: our own client implementation masks everything and
    # stays accepted by the hardened server
    a, b = socket.socketpair()
    client = WebSocket(a, client=True)
    server = WebSocket(b, client=False)
    got: list[object] = []
    t = threading.Thread(target=lambda: got.append(server.recv_message()))
    t.start()
    client.send_text("ping-pong")
    t.join(timeout=5)
    assert got == ["ping-pong"]
    client.close()
    server.close()


def test_cap_constant_sane():
    assert MAX_MESSAGE_BYTES >= 1 << 20  # big enough for agent payloads
