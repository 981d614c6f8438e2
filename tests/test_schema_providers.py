"""Schema provider family (SchemaUtil.scala:300-395 SchemaProviderType):
ddl / ddlfile / xsdfile / jsonschemafile / avroschemafile / pyclass specs,
rowTag extraction, schema unification, and lazy file-spec parsing."""

import dataclasses
import json

import pytest
from pyspark.sql import types as T

from smart_data_lake_spark import schema_providers as sp


BASKET_XSD = """<?xml version="1.0"?>
<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
  <xs:element name="basket">
    <xs:complexType>
      <xs:sequence>
        <xs:element name="entry" maxOccurs="unbounded">
          <xs:complexType>
            <xs:sequence>
              <xs:element name="key" type="xs:string"/>
              <xs:element name="value" type="xs:int"/>
              <xs:element name="comment" type="xs:string" minOccurs="0"/>
            </xs:sequence>
            <xs:attribute name="id" type="xs:long" use="required"/>
          </xs:complexType>
        </xs:element>
      </xs:sequence>
    </xs:complexType>
  </xs:element>
</xs:schema>
"""

RECURSIVE_XSD = """<?xml version="1.0"?>
<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
  <xs:element name="tree">
    <xs:complexType>
      <xs:sequence>
        <xs:element name="nodes">
          <xs:complexType>
            <xs:sequence>
              <xs:element name="modified" minOccurs="0">
                <xs:complexType>
                  <xs:sequence>
                    <xs:element name="node" type="NodeType" maxOccurs="unbounded"/>
                  </xs:sequence>
                </xs:complexType>
              </xs:element>
              <xs:element name="deleted" minOccurs="0">
                <xs:complexType>
                  <xs:sequence>
                    <xs:element name="node" type="NodeType" maxOccurs="unbounded"/>
                  </xs:sequence>
                </xs:complexType>
              </xs:element>
            </xs:sequence>
          </xs:complexType>
        </xs:element>
      </xs:sequence>
    </xs:complexType>
  </xs:element>
  <xs:complexType name="NodeType">
    <xs:sequence>
      <xs:element name="name" type="xs:string"/>
      <xs:element name="descriptions" minOccurs="0">
        <xs:complexType>
          <xs:sequence>
            <xs:element name="description" type="xs:string" maxOccurs="unbounded"/>
          </xs:sequence>
        </xs:complexType>
      </xs:element>
      <xs:element name="nodes" minOccurs="0">
        <xs:complexType>
          <xs:sequence>
            <xs:element name="node" type="NodeType" maxOccurs="unbounded"/>
          </xs:sequence>
        </xs:complexType>
      </xs:element>
    </xs:sequence>
  </xs:complexType>
</xs:schema>
"""


def test_ddl_and_bare_spec(spark):
    s1 = sp.parse_schema_spec("a int, b string")
    s2 = sp.parse_schema_spec("ddl#a int, b string")
    assert s1 == s2
    assert [f.name for f in s1.fields] == ["a", "b"]


def test_ddlfile_spec(spark, tmp_path):
    f = tmp_path / "schema.ddl"
    f.write_text("x bigint, y array<string>")
    s = sp.parse_schema_spec(f"ddlfile#{f}")
    assert s["y"].dataType == T.ArrayType(T.StringType())


def test_missing_file_raises(tmp_path):
    with pytest.raises(sp.SchemaProviderError):
        sp.parse_schema_spec(f"ddlfile#{tmp_path}/nope.ddl")
    with pytest.raises(sp.SchemaProviderError):
        sp.parse_schema_spec("wat#x")


def test_xsd_basket_roottag_and_rowtag(tmp_path):
    f = tmp_path / "basket.xsd"
    f.write_text(BASKET_XSD)
    root = sp.parse_schema_spec(f"xsdfile#{f};")
    assert [x.name for x in root.fields] == ["basket"]
    entry = sp.parse_schema_spec(f"xsdfile#{f};basket/entry")
    by_name = {x.name: x for x in entry.fields}
    assert by_name["_id"].dataType == T.LongType()  # attribute, "_"-prefixed
    assert by_name["_id"].nullable is False  # use=required
    assert by_name["key"].dataType == T.StringType()
    assert by_name["value"].dataType == T.IntegerType()
    assert by_name["comment"].nullable is True  # minOccurs=0


def test_xsd_recursive_type_capped(tmp_path):
    f = tmp_path / "complex.xsd"
    f.write_text(RECURSIVE_XSD)
    node = sp.parse_schema_spec(
        f"xsdfile#{f};tree/nodes/modified/node,tree/nodes/deleted/node;3"
    )
    names = [x.name for x in node.fields]
    assert names == ["name", "descriptions", "nodes"]
    # descend: nodes.node is an array of NodeType again
    inner = node["nodes"].dataType["node"].dataType.elementType
    assert isinstance(inner, T.StructType)
    assert "name" in inner.fieldNames()
    # the recursion is finite: max 3 expansions of NodeType, then the chain
    # ends (the over-deep `node` element is dropped, leaving an empty struct)
    depth = 0
    cur = node
    while "nodes" in cur.fieldNames() and "node" in cur["nodes"].dataType.fieldNames():
        cur = cur["nodes"].dataType["node"].dataType.elementType
        depth += 1
        assert depth < 10
    assert depth <= 3


def test_json_schema_provider(tmp_path):
    doc = {
        "type": "object",
        "required": ["id"],
        "properties": {
            "id": {"type": "integer"},
            "name": {"type": ["string", "null"]},
            "tags": {"type": "array", "items": {"type": "string"}},
            "address": {
                "type": "object",
                "properties": {"city": {"type": "string"}, "zip": {"type": "integer"}},
            },
        },
    }
    f = tmp_path / "s.json"
    f.write_text(json.dumps(doc))
    s = sp.parse_schema_spec(f"jsonschemafile#{f};")
    assert s["id"].dataType == T.LongType() and s["id"].nullable is False
    assert s["tags"].dataType == T.ArrayType(T.StringType())
    assert s["address"].dataType["city"].dataType == T.StringType()
    nested = sp.parse_schema_spec(f"jsonschemafile#{f};address")
    assert [x.name for x in nested.fields] == ["city", "zip"]


def test_json_schema_ref_and_cycle(tmp_path):
    doc = {
        "type": "object",
        "properties": {"a": {"$ref": "#/$defs/A"}},
        "$defs": {"A": {"type": "object", "properties": {"x": {"type": "number"}}}},
    }
    f = tmp_path / "r.json"
    f.write_text(json.dumps(doc))
    s = sp.parse_schema_spec(f"jsonschemafile#{f};")
    assert s["a"].dataType["x"].dataType == T.DoubleType()
    cyc = {
        "type": "object",
        "properties": {"a": {"$ref": "#/$defs/A"}},
        "$defs": {"A": {"$ref": "#/$defs/A"}},
    }
    f2 = tmp_path / "c.json"
    f2.write_text(json.dumps(cyc))
    with pytest.raises(sp.SchemaProviderError):
        sp.parse_schema_spec(f"jsonschemafile#{f2};")


def test_avro_schema_provider(tmp_path):
    avsc = {
        "type": "record",
        "name": "Rec",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "name", "type": ["null", "string"]},
            {"name": "vals", "type": {"type": "array", "items": "double"}},
        ],
    }
    f = tmp_path / "rec.avsc"
    f.write_text(json.dumps(avsc))
    s = sp.parse_schema_spec(f"avroschemafile#{f};")
    assert s["id"].dataType == T.LongType()
    assert s["name"].dataType == T.StringType()
    assert s["vals"].dataType == T.ArrayType(T.DoubleType(), containsNull=True)


@dataclasses.dataclass
class _Inner:
    city: str
    zip: int


@dataclasses.dataclass
class _Person:
    name: str
    age: int | None
    scores: list[float]
    home: _Inner


def test_pyclass_provider():
    s = sp.parse_schema_spec(f"pyclass#{__name__}._Person")
    assert s["name"].dataType == T.StringType()
    assert s["age"].dataType == T.LongType() and s["age"].nullable is True
    assert s["scores"].dataType == T.ArrayType(T.DoubleType())
    assert s["home"].dataType["zip"].dataType == T.LongType()


def test_unify_schemas_rules():
    a = T.StructType(
        [T.StructField("x", T.LongType(), False), T.StructField("y", T.StringType(), False)]
    )
    b = T.StructType(
        [T.StructField("x", T.LongType(), True), T.StructField("z", T.DoubleType(), False)]
    )
    u = sp.unify_schemas(a, b)
    assert [f.name for f in u.fields] == ["x", "y", "z"]
    assert u["x"].nullable is True  # either side nullable
    assert u["y"].nullable is True and u["z"].nullable is True  # one-sided
    conflicting = T.StructType([T.StructField("x", T.StringType(), True)])
    with pytest.raises(sp.SchemaProviderError):
        sp.unify_schemas(a, conflicting)


def test_lazy_schema_spec_deferred_to_prepare(spark, tmp_path):
    """XmlFileDataObjectTest:167 — with parseSchemaFilesLazy a DO whose
    schema file is missing constructs fine and fails in prepare."""
    from smart_data_lake_spark.config import ConfigError
    from smart_data_lake_spark.dataobjects.file import XmlFileDataObject

    old = sp.PARSE_SCHEMA_FILES_LAZY
    sp.PARSE_SCHEMA_FILES_LAZY = True
    try:
        do = XmlFileDataObject(
            id="test",
            path=str(tmp_path / "x"),
            schema=f"xsdfile#{tmp_path}/missing.xsd;TestReport",
            row_tag="TestReport",
            filename_column="_filename",
        )
        with pytest.raises(ConfigError):
            do.prepare(spark)
        # and with the file present, prepare resolves the schema
        (tmp_path / "present.xsd").write_text(BASKET_XSD)
        do2 = XmlFileDataObject(
            id="test2",
            path=str(tmp_path / "x"),
            schema=f"xsdfile#{tmp_path}/present.xsd;basket/entry",
            row_tag="entry",
        )
        assert do2.schema is None
        do2.prepare(spark)
        assert "key" in do2.schema.fieldNames()
    finally:
        sp.PARSE_SCHEMA_FILES_LAZY = old


def test_eager_schema_spec_in_dataobject(tmp_path):
    """Without the lazy flag, a provider spec resolves at construction."""
    from smart_data_lake_spark.dataobjects.file import CsvFileDataObject

    f = tmp_path / "s.ddl"
    f.write_text("a string, b int")
    do = CsvFileDataObject(id="t", path=str(tmp_path / "t"), schema=f"ddlfile#{f}")
    assert [x.name for x in do.schema.fields] == ["a", "b"]


def test_transform_schema_fields_recursive():
    """SchemaUtil.transformSchemaFields (SchemaUtilTest family) — the
    transformer reaches fields nested in structs, arrays and maps."""
    schema = T.StructType.fromDDL(
        "a int, rec struct<b:int, xs:array<struct<c:int>>>, m map<string,struct<d:int>>"
    )
    upper = sp.transform_schema_fields(
        schema, lambda f: T.StructField(f.name.upper(), f.dataType, f.nullable, f.metadata)
    )
    assert [f.name for f in upper.fields] == ["A", "REC", "M"]
    rec = upper["REC"].dataType
    assert [f.name for f in rec.fields] == ["B", "XS"]
    assert rec["XS"].dataType.elementType.fieldNames() == ["C"]
    assert upper["M"].dataType.valueType.fieldNames() == ["D"]


def test_make_xsd_json_compatible_pluralizes_arrays():
    """SchemaUtil.makeXsdJsonCompatible (SchemaUtil.scala:268-287) — array
    fields (XML repeated singular elements) get plural JSON names, at every
    nesting level; scalar names are untouched."""
    schema = T.StructType.fromDDL(
        "name string, entry array<struct<key:string, tag:array<string>>>"
    )
    out = sp.make_xsd_json_compatible(schema)
    assert [f.name for f in out.fields] == ["name", "entrys"]
    inner = out["entrys"].dataType.elementType
    assert [f.name for f in inner.fields] == ["key", "tags"]
