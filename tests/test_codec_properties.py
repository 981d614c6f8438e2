"""Property-based hardening of the hand-written codecs (hypothesis).

The Avro OCF and xlsx codecs are the two places this repo implements a wire
format by hand; random structured data shakes out the edge cases example
tests miss (surrogate-free unicode, ±0.0, huge/negative varint longs, empty
collections, None-vs-empty). Pure-python — no Spark session needed."""

from __future__ import annotations

import datetime as dt
import math

from hypothesis import given, settings, strategies as st

from smart_data_lake_spark.dataobjects.avro_ocf import decode_ocf, encode_ocf
from smart_data_lake_spark.dataobjects.xlsx import read_xlsx_bytes, write_xlsx_bytes

AVRO_SCHEMA = {
    "type": "record",
    "name": "r",
    "fields": [
        {"name": "i", "type": ["null", "long"], "default": None},
        {"name": "s", "type": ["null", "string"], "default": None},
        {"name": "d", "type": ["null", "double"], "default": None},
        {"name": "b", "type": ["null", "boolean"], "default": None},
        {"name": "raw", "type": ["null", "bytes"], "default": None},
        {"name": "arr", "type": ["null", {"type": "array", "items": "long"}], "default": None},
        {"name": "m", "type": ["null", {"type": "map", "values": "string"}], "default": None},
    ],
}

# zigzag varints cover the full signed-64 range; text avoids surrogates
# (not encodable to utf-8, and Avro strings are utf-8 by definition)
_text = st.text(alphabet=st.characters(codec="utf-8"), max_size=40)
_record = st.fixed_dictionaries(
    {
        "i": st.none() | st.integers(min_value=-(2**63), max_value=2**63 - 1),
        "s": st.none() | _text,
        "d": st.none() | st.floats(allow_nan=False),
        "b": st.none() | st.booleans(),
        "raw": st.none() | st.binary(max_size=30),
        "arr": st.none() | st.lists(st.integers(min_value=-(2**40), max_value=2**40), max_size=6),
        "m": st.none() | st.dictionaries(_text, _text, max_size=4),
    }
)


@settings(max_examples=120, deadline=None)
@given(st.lists(_record, max_size=12), st.sampled_from(["null", "deflate"]))
def test_avro_ocf_roundtrip_property(records, codec):
    data = encode_ocf(records, AVRO_SCHEMA, codec=codec, records_per_block=5)
    schema, out = decode_ocf(data)
    assert schema == AVRO_SCHEMA
    assert out == records


@settings(max_examples=60, deadline=None)
@given(st.lists(_record, min_size=1, max_size=8))
def test_avro_ocf_negative_zero_and_infinities(records):
    # doubles must round-trip bit-exactly, including -0.0 and ±inf
    recs = [dict(r, d=v) for r, v in zip(records, [-0.0, math.inf, -math.inf] * 3)]
    _, out = decode_ocf(encode_ocf(recs, AVRO_SCHEMA))
    for a, b in zip(out, recs):
        assert math.copysign(1, a["d"]) == math.copysign(1, b["d"]) and a["d"] == b["d"]


# xlsx: strings (no control chars — OOXML forbids them unescaped), doubles,
# bools, datetimes at ms precision (serial-number resolution), None
_xl_text = st.text(
    alphabet=st.characters(codec="utf-8", exclude_categories=("Cc", "Cs")), max_size=30
)
_xl_cell = (
    st.none()
    | _xl_text
    | st.floats(allow_nan=False, allow_infinity=False, min_value=-1e12, max_value=1e12)
    | st.booleans()
    | st.datetimes(
        min_value=dt.datetime(1970, 1, 1),
        max_value=dt.datetime(2100, 1, 1),
    ).map(lambda d: d.replace(microsecond=(d.microsecond // 1000) * 1000))
)


@settings(max_examples=80, deadline=None)
@given(st.lists(st.lists(_xl_cell, min_size=3, max_size=3), max_size=8))
def test_xlsx_roundtrip_property(rows):
    cols = ["a", "b", "c"]
    data = write_xlsx_bytes(cols, rows)
    out_cols, out_rows = read_xlsx_bytes(data)
    assert out_cols == cols
    assert len(out_rows) == len(rows)
    for got, want in zip(out_rows, rows):
        for g, w in zip(got, want):
            if isinstance(w, bool) or w is None or isinstance(w, str):
                assert g == w
            elif isinstance(w, dt.datetime):
                assert abs((g - w).total_seconds()) < 0.002  # serial resolution
            else:
                assert g == float(w) or abs(g - w) <= abs(w) * 1e-12


# ---------------------------------------------------------------- HOCON (r6)


@st.composite
def _hocon_value(draw, depth=0):
    scalars = st.one_of(
        st.integers(min_value=-10**9, max_value=10**9),
        st.booleans(),
        st.none(),
        st.text(
            alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd"), whitelist_characters=" _-."),
            min_size=1,
            max_size=20,
        ).map(str.strip).filter(bool),
    )
    if depth >= 2:
        return draw(scalars)
    return draw(
        st.one_of(
            scalars,
            st.lists(_hocon_value(depth=depth + 1), max_size=3),
            st.dictionaries(
                st.text(alphabet="abcdefghij_", min_size=1, max_size=8),
                _hocon_value(depth=depth + 1),
                max_size=3,
            ),
        )
    )


def _render_hocon(obj, indent=0) -> str:
    """Render a plain dict as HOCON (quoted strings so arbitrary text
    round-trips exactly)."""
    import json as _json

    pad = "  " * indent
    lines = []
    for k, v in obj.items():
        if isinstance(v, dict):
            lines.append(f"{pad}{k} {{")
            lines.append(_render_hocon(v, indent + 1))
            lines.append(f"{pad}}}")
        else:
            lines.append(f"{pad}{k} = {_json.dumps(v)}")
    return "\n".join(lines)


@given(st.dictionaries(st.text(alphabet="abcdefghij_", min_size=1, max_size=8), _hocon_value(), max_size=5))
@settings(max_examples=60, deadline=None)
def test_hocon_roundtrip_random_configs(cfg):
    from smart_data_lake_spark.hocon import parse_hocon

    # JSON-quoted rendering: every scalar comes back with type and content
    # intact (ints stay ints, strings stay strings, null stays None)
    text = _render_hocon(cfg)
    assert parse_hocon(text) == cfg


# ---------------------------------------------------- WebSocket framing (r6)


@given(
    payload=st.binary(min_size=0, max_size=200_000),
    as_text=st.booleans(),
)
@settings(max_examples=30, deadline=None)
def test_websocket_frame_roundtrip_all_length_forms(payload, as_text):
    """Client-masked frame bytes decode back identically on the server side
    for 7-bit, 16-bit and 64-bit payload-length forms."""
    import socket

    from smart_data_lake_spark.ws import WebSocket

    a, b = socket.socketpair()
    try:
        client = WebSocket(a, client=True)
        server = WebSocket(b, client=False)
        if as_text:
            text = payload.decode("latin-1")
            client.send_text(text)
            got = server.recv_message()
            assert got == text
        else:
            client.send_binary(payload)
            got = server.recv_message()
            assert got == payload
    finally:
        a.close()
        b.close()


def test_websocket_server_rejects_unmasked_client_frames():
    import socket

    from smart_data_lake_spark.ws import WebSocket

    a, b = socket.socketpair()
    try:
        rogue = WebSocket(a, client=False)  # sends UNMASKED like a server
        server = WebSocket(b, client=False)
        rogue.send_text("sneaky")
        import pytest as _pytest

        with _pytest.raises(ConnectionError, match="not masked"):
            server.recv_message()
    finally:
        a.close()
        b.close()
