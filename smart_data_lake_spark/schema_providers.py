"""Schema providers: resolve a schema SPEC string into a Spark StructType.

Reference: ``util/misc/SchemaUtil.scala:300-395`` (SchemaProviderType) — a
schema config value is either a plain DDL string or ``provider#params``:

- ``ddl#a INT, b STRING`` (and a bare string without ``#`` is DDL too)
- ``ddlfile#<path>`` — file containing a DDL string
- ``xsdfile#<path>;<rowTag>[;<maxRecursion>]`` — XML Schema Definition,
  converted like spark-xml's XSD support (attributes prefixed ``_``,
  maxOccurs=unbounded → array, named-type recursion capped)
- ``jsonschemafile#<path>;<rowTag>`` — JSON Schema (object/properties/items)
- ``avroschemafile#<path>;<rowTag>`` — Avro .avsc via the OCF codec's mapping
- ``pyclass#<module>.<Class>`` — a Python dataclass, the rebuild's analog of
  the reference's JVM-only ``caseclass``/``javabean`` providers

``rowTag`` selects a nested subpart: slash-separated element path; several
comma-separated paths are unified (SchemaUtil.extractRowTag/unifySchemas).
An empty rowTag keeps the root. All providers are driver-side metadata work.

``PARSE_SCHEMA_FILES_LAZY`` mirrors ``Environment.parseSchemaFilesLazy``:
when True, file-based specs are not touched at config-parse time; resolution
happens in the DataObject's ``prepare`` phase, which raises ConfigError if
the file is missing (XmlFileDataObjectTest:167).
"""

from __future__ import annotations

import json
import os
import re
import xml.etree.ElementTree as ET
from typing import Any

from pyspark.sql import types as T

#: mirrors Environment.parseSchemaFilesLazy — see module docstring
PARSE_SCHEMA_FILES_LAZY = False

_FILE_PROVIDERS = {"ddlfile", "xsdfile", "jsonschemafile", "avroschemafile"}


class SchemaProviderError(Exception):
    """A schema spec could not be resolved (unknown provider, missing file,
    malformed schema document)."""


def is_file_based_spec(spec: str) -> bool:
    return "#" in spec and spec.split("#", 1)[0].strip().lower() in _FILE_PROVIDERS


def parse_schema_spec(spec: str) -> T.StructType:
    """Resolve a schema spec string (see module docstring) to a StructType."""
    if "#" not in spec:
        return _parse_ddl(spec)
    provider, params = spec.split("#", 1)
    provider = provider.strip().lower()
    if provider == "ddl":
        return _parse_ddl(params)
    if provider == "ddlfile":
        return _parse_ddl(_read_file(params.strip()))
    if provider == "xsdfile":
        parts = [p.strip() for p in params.split(";")]
        path, row_tag = parts[0], parts[1] if len(parts) > 1 else ""
        max_recursion = int(parts[2]) if len(parts) > 2 and parts[2] else 10
        schema = xsd_to_schema(_read_file(path), max_recursion=max_recursion)
        return extract_row_tag(schema, row_tag)
    if provider == "jsonschemafile":
        parts = [p.strip() for p in params.split(";")]
        path, row_tag = parts[0], parts[1] if len(parts) > 1 else ""
        schema = json_schema_to_schema(json.loads(_read_file(path)))
        return extract_row_tag(schema, row_tag)
    if provider == "avroschemafile":
        from smart_data_lake_spark.dataobjects.avro_ocf import avro_schema_to_spark_logical

        parts = [p.strip() for p in params.split(";")]
        path, row_tag = parts[0], parts[1] if len(parts) > 1 else ""
        result = avro_schema_to_spark_logical(json.loads(_read_file(path)))
        if not isinstance(result, T.StructType):
            raise SchemaProviderError(f"avro schema at {path} is not a record: {result}")
        return extract_row_tag(result, row_tag)
    if provider == "pyclass":
        return _pyclass_schema(params.strip())
    raise SchemaProviderError(f"unknown schema provider {provider!r} in spec {spec!r}")


def _parse_ddl(ddl: str) -> T.StructType:
    parsed = T._parse_datatype_string(ddl)
    if not isinstance(parsed, T.StructType):
        raise SchemaProviderError(f"schema DDL must describe a struct, got {parsed}")
    return parsed


def _read_file(path: str) -> str:
    if not os.path.isfile(path):
        raise SchemaProviderError(f"schema file not found: {path}")
    with open(path) as fh:
        return fh.read()


def _pyclass_schema(qualname: str) -> T.StructType:
    """Python dataclass → StructType via type annotations (the reference's
    caseclass provider uses Spark Encoders; dataclasses are the Python
    equivalent)."""
    import dataclasses
    import importlib
    import typing

    module_name, _, cls_name = qualname.rpartition(".")
    if not module_name:
        raise SchemaProviderError(f"pyclass spec needs module.Class, got {qualname!r}")
    cls = getattr(importlib.import_module(module_name), cls_name)
    if not dataclasses.is_dataclass(cls):
        raise SchemaProviderError(f"{qualname} is not a dataclass")

    import types as _pytypes

    def to_spark(tp: Any) -> tuple[T.DataType, bool]:
        origin = typing.get_origin(tp)
        if origin is typing.Union or origin is _pytypes.UnionType:
            args = [a for a in typing.get_args(tp) if a is not type(None)]
            if len(args) == 1:
                dt, _ = to_spark(args[0])
                return dt, True
            raise SchemaProviderError(f"unsupported union type {tp}")
        if origin in (list, tuple):
            inner, _ = to_spark(typing.get_args(tp)[0])
            return T.ArrayType(inner), False
        if origin is dict:
            k, v = typing.get_args(tp)
            return T.MapType(to_spark(k)[0], to_spark(v)[0]), False
        if dataclasses.is_dataclass(tp):
            return (
                T.StructType(
                    [
                        T.StructField(f.name, *to_spark(f.type))
                        for f in dataclasses.fields(tp)
                    ]
                ),
                False,
            )
        import datetime
        import decimal

        simple = {
            str: T.StringType(),
            int: T.LongType(),
            float: T.DoubleType(),
            bool: T.BooleanType(),
            bytes: T.BinaryType(),
            datetime.date: T.DateType(),
            datetime.datetime: T.TimestampType(),
            decimal.Decimal: T.DecimalType(38, 18),
        }
        if tp in simple:
            return simple[tp], False
        raise SchemaProviderError(f"unsupported type {tp!r} in dataclass")

    fields = []
    for f in dataclasses.fields(cls):
        tp = f.type
        if isinstance(tp, str):  # from __future__ annotations
            tp = typing.get_type_hints(cls)[f.name]
        dt, nullable = to_spark(tp)
        fields.append(T.StructField(f.name, dt, nullable))
    return T.StructType(fields)


# --------------------------------------------------------------------- rowTag
def extract_row_tag(schema: T.StructType, row_tag: str) -> T.StructType:
    """Select a nested subpart of the schema by slash-separated element path;
    comma-separated paths are unified field-by-field
    (SchemaUtil.extractRowTag + unifySchemas)."""
    if not row_tag:
        return schema
    parts = [p.strip() for p in row_tag.split(",") if p.strip()]
    extracted = [_extract_one_path(schema, p) for p in parts]
    out = extracted[0]
    for nxt in extracted[1:]:
        out = unify_schemas(out, nxt)
    return out


def _extract_one_path(schema: T.StructType, path: str) -> T.StructType:
    current: T.DataType = schema
    for elem in path.split("/"):
        if isinstance(current, T.ArrayType):
            current = current.elementType
        if not isinstance(current, T.StructType):
            raise SchemaProviderError(f"rowTag path {path!r}: {elem!r} not reachable")
        names = {f.name: f.dataType for f in current.fields}
        if elem not in names:
            raise SchemaProviderError(
                f"rowTag path {path!r}: element {elem!r} not in {sorted(names)}"
            )
        current = names[elem]
    if isinstance(current, T.ArrayType):
        current = current.elementType
    if not isinstance(current, T.StructType):
        raise SchemaProviderError(f"rowTag path {path!r} does not resolve to a struct")
    return current


def unify_schemas(schema1: T.StructType, schema2: T.StructType) -> T.StructType:
    """Union of two struct schemas: common fields must agree on type (become
    nullable if either side is), one-sided fields become nullable; field
    order follows schema1 then schema2-only (SchemaUtil.unifySchemas)."""
    names1 = {f.name for f in schema1.fields}
    map2 = {f.name: f for f in schema2.fields}
    fields: list[T.StructField] = []
    for f in schema1.fields:
        if f.name in map2:
            other = map2[f.name]
            if other.dataType != f.dataType:
                raise SchemaProviderError(
                    f"cannot unify schemas: field {f.name} has types "
                    f"{f.dataType.simpleString()} vs {other.dataType.simpleString()}"
                )
            fields.append(T.StructField(f.name, f.dataType, f.nullable or other.nullable))
        else:
            fields.append(T.StructField(f.name, f.dataType, True))
    for f in schema2.fields:
        if f.name not in names1:
            fields.append(T.StructField(f.name, f.dataType, True))
    return T.StructType(fields)


# ------------------------------------------------------------------------ XSD
_XS = "{http://www.w3.org/2001/XMLSchema}"

_XSD_SIMPLE = {
    "string": T.StringType(),
    "normalizedString": T.StringType(),
    "token": T.StringType(),
    "anyURI": T.StringType(),
    "ID": T.StringType(),
    "IDREF": T.StringType(),
    "NMTOKEN": T.StringType(),
    "boolean": T.BooleanType(),
    "byte": T.ByteType(),
    "short": T.ShortType(),
    "int": T.IntegerType(),
    "integer": T.LongType(),
    "nonNegativeInteger": T.LongType(),
    "positiveInteger": T.LongType(),
    "long": T.LongType(),
    "unsignedLong": T.DecimalType(38, 0),
    "unsignedInt": T.LongType(),
    "unsignedShort": T.IntegerType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "decimal": T.DecimalType(38, 18),
    "date": T.DateType(),
    "dateTime": T.TimestampType(),
    "time": T.StringType(),
    "duration": T.StringType(),
    "base64Binary": T.BinaryType(),
    "hexBinary": T.BinaryType(),
}


def xsd_to_schema(xsd_content: str, max_recursion: int = 10) -> T.StructType:
    """Convert an XML Schema Definition into a StructType the way spark-xml's
    XSD support does (the reference customizes exactly that library:
    SchemaUtil.scala:341-348): top-level elements become fields,
    maxOccurs!=1 → ArrayType, attributes become ``_``-prefixed fields,
    minOccurs=0 / nillable → nullable. Named complex types may be recursive —
    expansion is cut at ``max_recursion`` levels per named type."""
    root = ET.fromstring(xsd_content)
    named_types: dict[str, ET.Element] = {}
    for child in root:
        if child.tag in (f"{_XS}complexType", f"{_XS}simpleType") and child.get("name"):
            named_types[child.get("name")] = child

    def strip_ns(qname: str) -> str:
        return qname.split(":", 1)[-1]

    def simple_of(name: str) -> T.DataType | None:
        base = strip_ns(name)
        if base in _XSD_SIMPLE:
            return _XSD_SIMPLE[base]
        node = named_types.get(base)
        if node is not None and node.tag == f"{_XS}simpleType":
            restriction = node.find(f"{_XS}restriction")
            if restriction is not None and restriction.get("base"):
                return simple_of(restriction.get("base"))
        return None

    def convert_complex(node: ET.Element, depth: dict[str, int]) -> T.StructType:
        fields: list[T.StructField] = []
        for attr in node.findall(f"{_XS}attribute"):
            dt = simple_of(attr.get("type", "string")) or T.StringType()
            fields.append(T.StructField("_" + attr.get("name"), dt, attr.get("use") != "required"))
        ext = node.find(f"{_XS}simpleContent/{_XS}extension")
        if ext is not None:
            for attr in ext.findall(f"{_XS}attribute"):
                dt = simple_of(attr.get("type", "string")) or T.StringType()
                fields.append(
                    T.StructField("_" + attr.get("name"), dt, attr.get("use") != "required")
                )
            base_dt = simple_of(ext.get("base", "string")) or T.StringType()
            fields.append(T.StructField("_VALUE", base_dt, True))
            return T.StructType(fields)
        for group_tag in ("sequence", "all", "choice"):
            group = node.find(f"{_XS}{group_tag}")
            if group is None:
                continue
            for elem in group.findall(f"{_XS}element"):
                f = convert_element(elem, depth)
                if f is not None:
                    # inside xs:choice everything is optional
                    fields.append(
                        T.StructField(f.name, f.dataType, f.nullable or group_tag == "choice")
                    )
            # nested sequence>choice and friends: one level of groups-in-groups
            for inner in group:
                if inner.tag in (f"{_XS}sequence", f"{_XS}choice", f"{_XS}all"):
                    for elem in inner.findall(f"{_XS}element"):
                        f = convert_element(elem, depth)
                        if f is not None:
                            fields.append(T.StructField(f.name, f.dataType, True))
        return T.StructType(fields)

    def convert_element(elem: ET.Element, depth: dict[str, int]) -> T.StructField | None:
        name = elem.get("name")
        nullable = elem.get("minOccurs") == "0" or elem.get("nillable") == "true"
        is_array = elem.get("maxOccurs") not in (None, "1")
        type_name = elem.get("type")
        if type_name is not None:
            dt = simple_of(type_name)
            if dt is None:
                base = strip_ns(type_name)
                node = named_types.get(base)
                if node is None:
                    dt = T.StringType()
                else:
                    count = depth.get(base, 0)
                    if count >= max_recursion:
                        return None  # recursion cut: drop the field beyond the cap
                    dt = convert_complex(node, {**depth, base: count + 1})
        else:
            inline = elem.find(f"{_XS}complexType")
            if inline is not None:
                dt = convert_complex(inline, depth)
            else:
                simple = elem.find(f"{_XS}simpleType/{_XS}restriction")
                dt = (
                    simple_of(simple.get("base"))
                    if simple is not None and simple.get("base")
                    else T.StringType()
                ) or T.StringType()
        if is_array:
            dt = T.ArrayType(dt, containsNull=nullable)
        return T.StructField(name, dt, nullable or is_array)

    fields = []
    for elem in root.findall(f"{_XS}element"):
        f = convert_element(elem, {})
        if f is not None:
            fields.append(f)
    return T.StructType(fields)


# ---------------------------------------------------------------- JSON Schema
def json_schema_to_schema(doc: dict[str, Any]) -> T.StructType:
    """Convert a JSON Schema document (draft-04/-07 object subset: type,
    properties, required, items, $defs/definitions + $ref) into a StructType
    (reference: adapted zalando-incubator/spark-json-schema,
    SchemaUtil.scala:352-357)."""
    defs = {**doc.get("definitions", {}), **doc.get("$defs", {})}

    def resolve(
        node: dict[str, Any], seen: frozenset[str]
    ) -> tuple[dict[str, Any], frozenset[str]]:
        """Chase $refs, ACCUMULATING the visited definition names so a
        definition that (transitively) references itself is detected at any
        nesting depth — not just on direct ref→ref chains."""
        ref = node.get("$ref")
        if not ref:
            return node, seen
        name = ref.split("/")[-1]
        if name in seen:
            raise SchemaProviderError(f"circular $ref {ref}")
        if name not in defs:
            raise SchemaProviderError(f"unresolvable $ref {ref}")
        return resolve(defs[name], seen | {name})

    def convert(node: dict[str, Any], seen: frozenset[str] = frozenset()) -> T.DataType:
        node, seen = resolve(node, seen)
        jtype = node.get("type", "object")
        if isinstance(jtype, list):  # e.g. ["string", "null"]
            jtype = next((t for t in jtype if t != "null"), "string")
        if jtype == "object":
            props = node.get("properties", {})
            required = set(node.get("required", []))
            return T.StructType(
                [
                    T.StructField(k, convert(v, seen), k not in required)
                    for k, v in props.items()
                ]
            )
        if jtype == "array":
            return T.ArrayType(convert(node.get("items", {"type": "string"}), seen))
        simple = {
            "string": T.StringType(),
            "integer": T.LongType(),
            "number": T.DoubleType(),
            "boolean": T.BooleanType(),
            "null": T.StringType(),
        }
        if jtype in simple:
            return simple[jtype]
        raise SchemaProviderError(f"unsupported JSON Schema type {jtype!r}")

    result = convert(doc)
    if not isinstance(result, T.StructType):
        raise SchemaProviderError("JSON Schema root must be an object")
    return result


def transform_schema_fields(schema: T.StructType, field_transformer) -> T.StructType:
    """Recursively rewrite every field of a schema with `field_transformer`
    (StructField -> StructField), descending into structs, arrays and maps
    (SchemaUtil.transformSchemaFields)."""

    def visit_field(f: T.StructField) -> T.StructField:
        nf = field_transformer(f)
        return T.StructField(nf.name, visit_type(nf.dataType), nf.nullable, nf.metadata)

    def visit_type(dt: T.DataType) -> T.DataType:
        if isinstance(dt, T.StructType):
            return T.StructType([visit_field(f) for f in dt.fields])
        if isinstance(dt, T.ArrayType):
            return T.ArrayType(visit_type(dt.elementType), dt.containsNull)
        if isinstance(dt, T.MapType):
            return T.MapType(visit_type(dt.keyType), visit_type(dt.valueType), dt.valueContainsNull)
        return dt

    return T.StructType([visit_field(f) for f in schema.fields])


def make_xsd_json_compatible(schema: T.StructType) -> T.StructType:
    """XML models arrays as repeated SINGULAR-named elements; JSON names the
    array attribute in PLURAL. For data published both ways from one XSD,
    pluralize every array field by appending 's'
    (SchemaUtil.makeXsdJsonCompatible)."""

    def pluralize(f: T.StructField) -> T.StructField:
        name = f.name + "s" if isinstance(f.dataType, T.ArrayType) else f.name
        return T.StructField(name, f.dataType, f.nullable, f.metadata)

    return transform_schema_fields(schema, pluralize)
