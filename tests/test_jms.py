"""JmsDataObject against a socket-real mock STOMP broker.

The mock speaks actual STOMP 1.2 frames over TCP (CONNECT/CONNECTED,
SUBSCRIBE, MESSAGE, ACK, DISCONNECT) and only forgets messages once ACKed —
so the transacted at-least-once contract is observable. Reference:
`sdl-jms/.../JmsDataObject.scala` + `SynchronousJmsReceiver.scala`.
"""

from __future__ import annotations

import socket
import threading

import pytest

from smart_data_lake_spark.dataobjects.jms import JmsDataObject, StompClient


class MockBroker:
    """One-connection-at-a-time STOMP broker for a single queue."""

    def __init__(self, messages: list[str]) -> None:
        self.queue: list[str] = list(messages)
        self.acked: list[str] = []
        self.delivered_not_acked: dict[str, str] = {}
        self._srv = socket.create_server(("127.0.0.1", 0))
        self.port = self._srv.getsockname()[1]
        self._stop = False
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()

    def _frames(self, conn):
        buf = b""
        while not self._stop:
            try:
                chunk = conn.recv(4096)
            except OSError:
                return
            if not chunk:
                return
            buf += chunk
            while b"\x00" in buf:
                raw, buf = buf.split(b"\x00", 1)
                buf = buf.lstrip(b"\n")
                text = raw.decode().lstrip("\n")
                head, _, body = text.partition("\n\n")
                lines = head.splitlines()
                headers = dict(ln.partition(":")[::2] for ln in lines[1:])
                yield lines[0], headers, body

    def _serve(self) -> None:
        self._srv.settimeout(0.2)
        mid = 0
        while not self._stop:
            try:
                conn, _ = self._srv.accept()
            except (socket.timeout, OSError):
                continue
            with conn:
                # redeliver anything a previous connection never acked
                self.queue = list(self.delivered_not_acked.values()) + self.queue
                self.delivered_not_acked.clear()
                for command, headers, body in self._frames(conn):
                    if command == "CONNECT":
                        if headers.get("login") == "baduser":
                            conn.sendall(b"ERROR\nmessage:bad credentials\n\n\x00")
                            break
                        conn.sendall(b"CONNECTED\nversion:1.2\n\n\x00")
                    elif command == "SUBSCRIBE":
                        while self.queue:
                            msg = self.queue.pop(0)
                            mid += 1
                            ack_id = f"m{mid}"
                            self.delivered_not_acked[ack_id] = msg
                            frame = (
                                f"MESSAGE\ndestination:{headers['destination']}\n"
                                f"message-id:{ack_id}\nack:{ack_id}\nsubscription:0\n\n{msg}"
                            ).encode() + b"\x00"
                            conn.sendall(frame)
                    elif command == "ACK":
                        acked = self.delivered_not_acked.pop(headers["id"], None)
                        if acked is not None:
                            self.acked.append(acked)
                    elif command == "DISCONNECT":
                        break

    def stop(self) -> None:
        self._stop = True
        self._srv.close()
        self._thread.join(timeout=3)


@pytest.fixture()
def broker():
    b = MockBroker([f"msg-{i}" for i in range(7)])
    yield b
    b.stop()


def test_jms_batch_consume_and_ack(spark, broker):
    do = JmsDataObject(
        id="q", url=f"stomp://127.0.0.1:{broker.port}", queue="/queue/in",
        batch_size=100, max_wait_sec=3.0, tx_batch_size=3,
    )
    do.prepare(spark)  # CONNECT round-trip
    df = do.get_dataframe(spark)
    assert df.schema.simpleString() == "struct<payload:string>"
    assert sorted(r["payload"] for r in df.collect()) == [f"msg-{i}" for i in range(7)]
    assert sorted(broker.acked) == [f"msg-{i}" for i in range(7)]  # all acked post-batch


def test_jms_init_phase_does_not_consume(spark, broker):
    do = JmsDataObject(
        id="q", url=f"stomp://127.0.0.1:{broker.port}", queue="/queue/in", max_wait_sec=2.0
    )
    init_df = do.get_dataframe(spark, phase="init")
    assert init_df.count() == 0
    assert len(broker.queue) == 7  # nothing consumed at init
    # exec still gets everything
    assert do.get_dataframe(spark, phase="exec").count() == 7


def test_jms_batch_size_leaves_rest_redeliverable(spark, broker):
    do = JmsDataObject(
        id="q", url=f"stomp://127.0.0.1:{broker.port}", queue="/queue/in",
        batch_size=4, max_wait_sec=2.0, tx_batch_size=2,
    )
    first = do.get_dataframe(spark).collect()
    assert len(first) == 4
    # unacked tail redelivers on the next connection; nothing lost
    second = do.get_dataframe(spark).collect()
    got = {r["payload"] for r in first} | {r["payload"] for r in second}
    assert got == {f"msg-{i}" for i in range(7)}


def test_jms_bad_credentials(spark, broker):
    with pytest.raises(ConnectionError):
        StompClient("127.0.0.1", broker.port, "baduser", "x")


def test_jms_through_copy_action(spark, broker, tmp_path):
    """Whole-DAG usage: init phase sees the empty schema-only frame, exec
    consumes and writes — the reference's phase special-case end-to-end."""
    from smart_data_lake_spark.actions import CopyAction
    from smart_data_lake_spark.config import InstanceRegistry
    from smart_data_lake_spark.dataobjects import ParquetFileDataObject
    from smart_data_lake_spark.plans import ActionDAG, ActionDAGRun

    registry = InstanceRegistry()
    registry.register_data_object(
        JmsDataObject(id="q", url=f"stomp://127.0.0.1:{broker.port}", queue="/queue/in",
                      max_wait_sec=3.0)
    )
    registry.register_data_object(ParquetFileDataObject(id="sink", path=str(tmp_path / "sink")))
    CopyAction(id="drain", input_id="q", output_id="sink", registry=registry)
    state = ActionDAGRun(ActionDAG(list(registry.actions.values())), registry).run(spark)
    assert state.action_states["drain"] == "SUCCEEDED"
    out = spark.read.parquet(str(tmp_path / "sink"))
    assert out.count() == 7


def test_stomp_client_parses_crlf_frames():
    """STOMP 1.2 permits CRLF line endings (ActiveMQ/Artemis emit them);
    the client must parse CONNECTED/MESSAGE frames under either convention
    and strip the CR from header values (ACK ids!)."""
    import socket
    import threading

    srv = socket.create_server(("127.0.0.1", 0))
    port = srv.getsockname()[1]

    def serve():
        conn, _ = srv.accept()
        with conn:
            conn.recv(4096)  # CONNECT
            conn.sendall(b"CONNECTED\r\nversion:1.2\r\n\r\n\x00")
            conn.recv(4096)  # SUBSCRIBE
            conn.sendall(
                b"MESSAGE\r\ndestination:/queue/q\r\nmessage-id:m1\r\nack:a1\r\n\r\nhello\x00"
            )
            conn.recv(4096)  # ACK/DISCONNECT

    t = threading.Thread(target=serve, daemon=True)
    t.start()
    try:
        client = StompClient("127.0.0.1", port, None, None, timeout_sec=5)
        client.subscribe("/queue/q")
        frame = client.next_message(5)
        assert frame.command == "MESSAGE"
        assert frame.body == "hello"
        assert frame.headers["ack"] == "a1"  # no trailing \r
        client.ack(frame)
        client.close()
    finally:
        srv.close()


def test_stray_receipt_frame_does_not_truncate_batch():
    """r6 ADVICE regression: a non-MESSAGE server frame (e.g. RECEIPT)
    arriving mid-stream must be skipped, not treated as end-of-batch."""
    import socket
    import threading

    srv = socket.create_server(("127.0.0.1", 0))
    port = srv.getsockname()[1]

    def serve():
        conn, _ = srv.accept()
        with conn:
            conn.recv(4096)  # CONNECT
            conn.sendall(b"CONNECTED\nversion:1.2\n\n\x00")
            conn.recv(4096)  # SUBSCRIBE
            conn.sendall(
                b"MESSAGE\ndestination:/queue/q\nmessage-id:m1\nack:a1\n\nfirst\x00"
                b"RECEIPT\nreceipt-id:r1\n\n\x00"
                b"MESSAGE\ndestination:/queue/q\nmessage-id:m2\nack:a2\n\nsecond\x00"
            )
            conn.recv(4096)

    threading.Thread(target=serve, daemon=True).start()
    try:
        client = StompClient("127.0.0.1", port, None, None, timeout_sec=5)
        client.subscribe("/queue/q")
        first = client.next_message(5)
        second = client.next_message(5)  # must skip the RECEIPT in between
        assert (first.body, second.body) == ("first", "second")
        assert client.next_message(0.3) is None  # drained -> timeout, not error
        client.close()
    finally:
        srv.close()
