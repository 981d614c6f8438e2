"""JMS queue DataObject over STOMP.

Reference: `sdl-jms/.../dataobject/JmsDataObject.scala:19-100` +
`util/jms/SynchronousJmsReceiver.scala` — synchronous batch consumption of
TEXT messages from a queue into a fixed `payload: string` DataFrame, with
batch-size / max-wait bounds and transacted acknowledgement, and the JMS
special case that the INIT phase must not consume (messages received at init
would be gone by exec).

The reference reaches the broker through JNDI + the JMS client jar. The
wire-protocol rebuild speaks STOMP 1.2 (the open frame protocol ActiveMQ /
Artemis / RabbitMQ expose on the same brokers) with a stdlib socket client —
CONNECT/SUBSCRIBE(client ack)/MESSAGE/ACK/DISCONNECT frames. Messages are
ACKed only after the batch is fully read (the `txBatchSize` transacted
contract: an interrupted run redelivers, never loses).

Scale note: a JMS queue is a control-plane source (commands, notifications,
CDC pings) — the reference also collects the batch on the driver
(SynchronousJmsReceiver builds a local Seq). Bulk data belongs on Kafka.
"""

from __future__ import annotations

import socket
import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from smart_data_lake_spark.config import register_data_object_type
from smart_data_lake_spark.dataobjects.base import CanCreateDataFrame, DataObject

PAYLOAD_SCHEMA = T.StructType([T.StructField("payload", T.StringType(), False)])


class StompFrame:
    def __init__(self, command: str, headers: dict[str, str], body: str = "") -> None:
        self.command = command
        self.headers = headers
        self.body = body

    def encode(self) -> bytes:
        head = "".join(f"{k}:{v}\n" for k, v in self.headers.items())
        return f"{self.command}\n{head}\n{self.body}".encode("utf-8") + b"\x00"


class StompClient:
    """Minimal STOMP 1.2 client: one connection, one client-ack subscription."""

    def __init__(self, host: str, port: int, user: str | None, password: str | None,
                 timeout_sec: float = 10.0) -> None:
        self._sock = socket.create_connection((host, port), timeout=timeout_sec)
        self._buf = b""
        headers = {"accept-version": "1.2", "host": host}
        if user:
            headers["login"] = user
        if password:
            headers["passcode"] = password
        self._send(StompFrame("CONNECT", headers))
        frame = self._recv(timeout_sec)
        if frame is None or frame.command != "CONNECTED":
            raise ConnectionError(f"STOMP connect failed: {frame.command if frame else 'timeout'}")

    def _send(self, frame: StompFrame) -> None:
        self._sock.sendall(frame.encode())

    def _recv(self, timeout_sec: float) -> StompFrame | None:
        deadline = time.monotonic() + timeout_sec
        while b"\x00" not in self._buf:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                return None
            self._sock.settimeout(remaining)
            try:
                chunk = self._sock.recv(4096)
            except socket.timeout:
                return None
            if not chunk:
                return None
            self._buf += chunk
        raw, self._buf = self._buf.split(b"\x00", 1)
        self._buf = self._buf.lstrip(b"\r\n")  # inter-frame EOLs / heartbeats
        text = raw.decode("utf-8").lstrip("\r\n")
        # STOMP 1.2 EOL is LF with OPTIONAL preceding CR — ActiveMQ/Artemis
        # may emit CRLF; find the first blank line under either convention
        import re as _re

        m = _re.search(r"\r?\n\r?\n", text)
        head, body = (text[: m.start()], text[m.end():]) if m else (text, "")
        lines = [ln.rstrip("\r") for ln in head.split("\n")]
        headers = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(":")
            headers[k] = v
        return StompFrame(lines[0], headers, body)

    def subscribe(self, queue: str) -> None:
        self._send(
            StompFrame("SUBSCRIBE", {"id": "0", "destination": queue, "ack": "client-individual"})
        )

    def next_message(self, timeout_sec: float) -> StompFrame | None:
        # discard stray non-MESSAGE frames (RECEIPT, unexpected server
        # frames) instead of letting one truncate the consumer's batch
        deadline = time.monotonic() + timeout_sec
        while True:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                return None
            frame = self._recv(remaining)
            if frame is None:
                return None
            if frame.command == "ERROR":
                raise ConnectionError(f"STOMP error: {frame.body or frame.headers}")
            if frame.command == "MESSAGE":
                return frame

    def ack(self, message_frame: StompFrame) -> None:
        ack_id = message_frame.headers.get("ack") or message_frame.headers.get("message-id", "")
        self._send(StompFrame("ACK", {"id": ack_id}))

    def close(self) -> None:
        try:
            self._send(StompFrame("DISCONNECT", {}))
            self._sock.close()
        except OSError:
            pass


@register_data_object_type
class JmsDataObject(DataObject, CanCreateDataFrame):
    """Fixed payload:string schema (TextMessageString) — schema_min is
    ignored with a warning, like the reference."""

    supports_phase = True  # init must not consume (JmsDataObject.scala:74-82)

    def __init__(
        self,
        id: str,
        url: str,  # stomp://host:port
        queue: str,
        user: str | None = None,
        password: str | None = None,
        batch_size: int = 100,
        max_wait_sec: float = 5.0,
        tx_batch_size: int = 10,
        **kwargs: Any,
    ) -> None:
        if kwargs.pop("schema_min", None) is not None:
            print(f"WARN ({id}): schemaMin ignored, JmsDataObject is always payload:string")
        super().__init__(id=id, **kwargs)
        if not url.startswith("stomp://"):
            raise ValueError(f"({id}) url must be stomp://host:port")
        hostport = url[len("stomp://"):]
        host, _, port = hostport.partition(":")
        self.host, self.port = host, int(port or 61613)
        self.queue = queue
        self.user = user
        self.password = password
        self.batch_size = batch_size
        self.max_wait_sec = max_wait_sec
        self.tx_batch_size = tx_batch_size

    def prepare(self, spark: SparkSession) -> None:
        client = StompClient(self.host, self.port, self.user, self.password)
        client.close()

    def _receive_batch(self) -> list[str]:
        client = StompClient(self.host, self.port, self.user, self.password)
        try:
            client.subscribe(self.queue)
            messages: list[str] = []
            pending: list[StompFrame] = []
            deadline = time.monotonic() + self.max_wait_sec
            while len(messages) < self.batch_size:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                frame = client.next_message(min(remaining, 1.0))
                if frame is None:
                    break
                messages.append(frame.body)
                pending.append(frame)
                # transacted acknowledgement: ack in tx_batch_size groups so
                # an interrupted run redelivers at-least-once, never loses
                if len(pending) >= self.tx_batch_size:
                    for f in pending:
                        client.ack(f)
                    pending.clear()
            for f in pending:
                client.ack(f)
            return messages
        finally:
            client.close()

    def get_dataframe(
        self, spark: SparkSession, partition_values=None, phase: str = "exec"
    ) -> DataFrame:
        if phase == "init":
            return spark.createDataFrame([], PAYLOAD_SCHEMA)
        msgs = self._receive_batch()
        return spark.createDataFrame([(m,) for m in msgs], PAYLOAD_SCHEMA)
