"""Confluent schema-registry decode/encode for Kafka key/value columns.

Reference: `sdl-kafka/src/main/scala/io/smartdatalake/workflow/dataobject/
KafkaTopicDataObject.scala:151-168,408-430` — the JsonSchemaRegistry /
AvroSchemaRegistry KafkaColumnType variants, which route through Confluent
connectors (`from_confluent`/`to_confluent`) resolving the subject's schema
from a registry service.

Wire format (Confluent's documented framing): 1 magic byte `0x00` + 4-byte
big-endian schema id + the serialized payload.

Spark-first decode shapes, chosen per format:

* JSON registry payloads stay ENTIRELY JVM-side: the header strip is a
  `substring` over the binary column, the magic-byte check compiles to a
  `raise_error` branch, and parsing is `from_json` — whole-stage codegen,
  zero Python in the hot path.
* Avro registry payloads need an Avro binary decoder. The spark-avro runtime
  jar is absent in this container, so the decoder here is a pure-Python Avro
  codec (varint/zigzag wire primitives) run as an Arrow-batched pandas UDF
  that emits one JSON document per record; the typed projection is again
  JVM-side `from_json`. On a cluster with spark-avro deployed, swap
  `from_confluent_avro` for `substring` + `from_avro` and keep everything
  else — the framing and registry logic is identical.

The registry client is stdlib urllib (mock-served in tests, like the
Webservice DataObject tests); schema lookups happen once per plan on the
driver and are cached, executors never talk to the registry.
"""

from __future__ import annotations

import base64
import io
import json
import struct
import urllib.request
from dataclasses import dataclass
from typing import Any

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAGIC_BYTE = 0


# --------------------------------------------------------------- registry


@dataclass(frozen=True)
class RegisteredSchema:
    schema_id: int
    schema_str: str
    schema_type: str  # "AVRO" | "JSON"


class SchemaRegistryClient:
    """Minimal Confluent REST client: latest-by-subject and by-id lookups,
    driver-side cached (`io.confluent:kafka-schema-registry-client`'s
    CachedSchemaRegistryClient shape)."""

    def __init__(self, base_url: str) -> None:
        self.base_url = base_url.rstrip("/")
        self._cache: dict[str, RegisteredSchema] = {}

    def _get(self, path: str) -> dict:
        with urllib.request.urlopen(f"{self.base_url}{path}") as resp:
            return json.loads(resp.read().decode("utf-8"))

    def get_latest(self, subject: str) -> RegisteredSchema:
        key = f"subject:{subject}"
        if key not in self._cache:
            p = self._get(f"/subjects/{subject}/versions/latest")
            self._cache[key] = RegisteredSchema(
                schema_id=int(p["id"]),
                schema_str=p["schema"],
                # Confluent omits schemaType for AVRO (the default)
                schema_type=p.get("schemaType", "AVRO"),
            )
        return self._cache[key]

    def get_by_id(self, schema_id: int) -> RegisteredSchema:
        key = f"id:{schema_id}"
        if key not in self._cache:
            p = self._get(f"/schemas/ids/{schema_id}")
            self._cache[key] = RegisteredSchema(
                schema_id=schema_id,
                schema_str=p["schema"],
                schema_type=p.get("schemaType", "AVRO"),
            )
        return self._cache[key]


# ------------------------------------------------- schema type conversion


def json_schema_to_spark(schema: dict) -> T.StructType:
    """JSON Schema (draft-ish subset: object/properties, primitives, arrays,
    nesting) → Spark StructType. Unknown/absent types map to string — the
    permissive choice a schema-on-read pipeline wants."""

    def conv(node: dict) -> T.DataType:
        t = node.get("type")
        if t == "object" or "properties" in node:
            req = set(node.get("required", []))
            return T.StructType(
                [
                    T.StructField(name, conv(sub), nullable=name not in req)
                    for name, sub in node.get("properties", {}).items()
                ]
            )
        if t == "array":
            return T.ArrayType(conv(node.get("items", {})))
        return {
            "string": T.StringType(),
            "integer": T.LongType(),
            "number": T.DoubleType(),
            "boolean": T.BooleanType(),
        }.get(t, T.StringType())

    out = conv(schema)
    if not isinstance(out, T.StructType):
        raise ValueError(f"top-level JSON schema must be an object, got {schema.get('type')}")
    return out


def avro_schema_to_spark(schema: Any) -> T.DataType:
    """Avro schema (parsed JSON) → Spark type. Supports the codec's surface:
    primitives, record, array, map, enum (→ string), union-with-null."""
    if isinstance(schema, str):
        prim = {
            "null": T.NullType(),
            "boolean": T.BooleanType(),
            "int": T.IntegerType(),
            "long": T.LongType(),
            "float": T.FloatType(),
            "double": T.DoubleType(),
            "string": T.StringType(),
            "bytes": T.BinaryType(),
        }
        if schema not in prim:
            raise ValueError(f"unsupported avro type {schema!r}")
        return prim[schema]
    if isinstance(schema, list):  # union
        non_null = [s for s in schema if s != "null"]
        if len(non_null) != 1:
            raise ValueError(f"only unions with null supported, got {schema!r}")
        return avro_schema_to_spark(non_null[0])
    t = schema["type"]
    if t == "record":
        return T.StructType(
            [
                T.StructField(f["name"], avro_schema_to_spark(f["type"]), nullable=True)
                for f in schema["fields"]
            ]
        )
    if t == "array":
        return T.ArrayType(avro_schema_to_spark(schema["items"]))
    if t == "map":
        return T.MapType(T.StringType(), avro_schema_to_spark(schema["values"]))
    if t == "enum":
        return T.StringType()
    return avro_schema_to_spark(t)  # {"type": "long"} wrapper form


# --------------------------------------------- pure-python avro binary codec


def _read_varint(buf: io.BytesIO) -> int:
    shift, acc = 0, 0
    while True:
        b = buf.read(1)
        if not b:
            raise ValueError("truncated avro varint")
        acc |= (b[0] & 0x7F) << shift
        if not b[0] & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)  # zigzag


def _write_varint(out: bytearray, n: int) -> None:
    n = (n << 1) ^ (n >> 63)  # zigzag (python ints: arithmetic shift ok)
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            break


def decode_avro(buf: io.BytesIO, schema: Any) -> Any:
    if isinstance(schema, str):
        if schema == "null":
            return None
        if schema == "boolean":
            return buf.read(1)[0] == 1
        if schema in ("int", "long"):
            return _read_varint(buf)
        if schema == "float":
            return struct.unpack("<f", buf.read(4))[0]
        if schema == "double":
            return struct.unpack("<d", buf.read(8))[0]
        if schema in ("string", "bytes"):
            n = _read_varint(buf)
            raw = buf.read(n)
            return raw.decode("utf-8") if schema == "string" else raw
        raise ValueError(f"unsupported avro type {schema!r}")
    if isinstance(schema, list):  # union: varint branch index
        idx = _read_varint(buf)
        return decode_avro(buf, schema[idx])
    t = schema["type"]
    if t == "record":
        return {f["name"]: decode_avro(buf, f["type"]) for f in schema["fields"]}
    if t in ("array", "map"):
        sub = schema["items"] if t == "array" else schema["values"]
        out_l: list = []
        out_m: dict = {}
        while True:
            count = _read_varint(buf)
            if count == 0:
                break
            if count < 0:  # block with byte-size prefix
                count = -count
                _read_varint(buf)
            for _ in range(count):
                if t == "map":
                    n = _read_varint(buf)
                    k = buf.read(n).decode("utf-8")
                    out_m[k] = decode_avro(buf, sub)
                else:
                    out_l.append(decode_avro(buf, sub))
        return out_l if t == "array" else out_m
    if t == "enum":
        return schema["symbols"][_read_varint(buf)]
    return decode_avro(buf, t)


def encode_avro(out: bytearray, value: Any, schema: Any) -> None:
    if isinstance(schema, str):
        if schema == "null":
            return
        if schema == "boolean":
            out.append(1 if value else 0)
        elif schema in ("int", "long"):
            _write_varint(out, int(value))
        elif schema == "float":
            out.extend(struct.pack("<f", value))
        elif schema == "double":
            out.extend(struct.pack("<d", value))
        elif schema in ("string", "bytes"):
            raw = value.encode("utf-8") if schema == "string" else bytes(value)
            _write_varint(out, len(raw))
            out.extend(raw)
        else:
            raise ValueError(f"unsupported avro type {schema!r}")
        return
    if isinstance(schema, list):
        idx = schema.index("null") if value is None else next(
            i for i, s in enumerate(schema) if s != "null"
        )
        _write_varint(out, idx)
        encode_avro(out, value, schema[idx])
        return
    t = schema["type"]
    if t == "record":
        for f in schema["fields"]:
            encode_avro(out, value[f["name"]], f["type"])
    elif t == "array":
        if value:
            _write_varint(out, len(value))
            for v in value:
                encode_avro(out, v, schema["items"])
        _write_varint(out, 0)
    elif t == "map":
        if value:
            _write_varint(out, len(value))
            for k, v in value.items():
                encode_avro(out, k, "string")
                encode_avro(out, v, schema["values"])
        _write_varint(out, 0)
    elif t == "enum":
        _write_varint(out, schema["symbols"].index(value))
    else:
        encode_avro(out, value, t)


# ---------------------------------------------------------- wire framing


def frame_confluent(schema_id: int, payload: bytes) -> bytes:
    return bytes([MAGIC_BYTE]) + schema_id.to_bytes(4, "big") + payload


def encode_confluent_avro(value: dict, schema: dict, schema_id: int) -> bytes:
    out = bytearray()
    encode_avro(out, value, schema)
    return frame_confluent(schema_id, bytes(out))


def confluent_schema_id(col: Column) -> Column:
    """The embedded 4-byte big-endian schema id, as a long (observability /
    schema-drift monitoring column)."""
    return F.conv(F.hex(F.substring(col, 2, 4)), 16, 10).cast("long")


def _framing_checked(col: Column) -> Column:
    """Payload past the 5-byte header; malformed frames raise (Confluent's
    deserializer throws SerializationException — silent nulls would let a
    corrupt topic pass as missing data)."""
    ok = (F.length(col) >= F.lit(5)) & (F.substring(col, 1, 1) == F.lit(bytes([MAGIC_BYTE])))
    return F.when(ok, F.substring(col, 6, 2147483647)).otherwise(
        F.raise_error(F.lit("malformed Confluent frame: bad magic byte or truncated header"))
    )


def from_confluent_json(col: Column, spark_schema: T.StructType) -> Column:
    """Registry-framed JSON → struct. Entirely JVM-side (codegen)."""
    return F.from_json(_framing_checked(col).cast("string"), spark_schema)


def from_confluent_avro(col: Column, avro_schema: dict, spark_schema: T.DataType | None = None) -> Column:
    """Registry-framed Avro → struct via the pure-python codec.

    Arrow-batched pandas UDF emits one JSON doc per record (bytes fields
    base64, matching Spark's JSON binary convention); the typed projection is
    JVM-side from_json. One Python hop per row batch — the honest cost of
    Avro without the spark-avro jar, still vectorized transfer and fully
    distributed."""
    spark_schema = spark_schema or avro_schema_to_spark(avro_schema)
    schema_json = json.dumps(avro_schema)

    def _jsonify(v: Any) -> Any:
        if isinstance(v, (bytes, bytearray)):
            return base64.b64encode(v).decode("ascii")
        if isinstance(v, dict):
            return {k: _jsonify(x) for k, x in v.items()}
        if isinstance(v, list):
            return [_jsonify(x) for x in v]
        return v

    @F.pandas_udf(T.StringType())
    def _decode(payloads: pd.Series) -> pd.Series:
        schema = json.loads(schema_json)

        def one(raw):
            if raw is None:
                return None
            b = bytes(raw)
            if len(b) < 5 or b[0] != MAGIC_BYTE:
                raise ValueError("malformed Confluent frame: bad magic byte or truncated header")
            rec = decode_avro(io.BytesIO(b[5:]), schema)
            return json.dumps(_jsonify(rec))

        return payloads.map(one)

    return F.from_json(_decode(col), spark_schema)


def to_confluent_json(col: Column, schema_id: int) -> Column:
    """struct → registry-framed JSON bytes (JVM-side)."""
    header = F.lit(frame_confluent(schema_id, b""))
    return F.concat(header, F.to_json(col).cast("binary"))
