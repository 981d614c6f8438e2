"""Scenario parity for `util/evolution/SchemaEvolutionTest.scala` (17
distinct scenarios; the 14 CaseSensitive duplicates re-run the same
behaviors under spark.sql.caseSensitive=true — our suite runs Spark's
default case-insensitive resolution, noted per scenario) and
`ComplexTypeEvolutionTest.scala` behaviors (nested struct/array evolution,
covered inline by the struct/array scenarios below plus the hypothesis
properties in test_schema_evolution_properties.py)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from smart_data_lake_spark.schema_evolution import (
    evolve,
    has_same_col_names_and_types,
    project_to_schema,
)


def _schema(df):
    return [(f.name, f.dataType.simpleString()) for f in df.schema.fields]


def test_same_names_types_identical(spark):
    """SchemaEvolutionTest:40 — same names+types → identical."""
    a = spark.createDataFrame([(1, "x")], "id int, name string").schema
    b = spark.createDataFrame([(2, "y")], "id int, name string").schema
    assert has_same_col_names_and_types(a, b)


def test_different_columns_not_identical(spark):
    """SchemaEvolutionTest:46."""
    a = T.StructType.fromDDL("id int, name string")
    b = T.StructType.fromDDL("id int, other string")
    assert not has_same_col_names_and_types(a, b)


def test_same_names_different_types_not_identical(spark):
    """SchemaEvolutionTest:52."""
    a = T.StructType.fromDDL("id int, name string")
    b = T.StructType.fromDDL("id string, name string")
    assert not has_same_col_names_and_types(a, b)


def test_different_sorting_identical_and_sorted_to_old(spark):
    """SchemaEvolutionTest:58 — column ORDER does not break identity, and
    the evolved newDf is sorted according to oldDf."""
    old = spark.createDataFrame([(1, "x")], "id int, name string")
    new = spark.createDataFrame([("y", 2)], "name string, id int")
    assert has_same_col_names_and_types(old.schema, new.schema)
    res = evolve(old, new)
    assert [f.name for f in res.new_df.schema.fields] == ["id", "name"]


def test_new_column_added(spark):
    """SchemaEvolutionTest:109 — a new column appears for both frames; old
    rows read null."""
    old = spark.createDataFrame([(1, "x")], "id int, name string")
    new = spark.createDataFrame([(2, "y", 9.5)], "id int, name string, score double")
    res = evolve(old, new)
    assert _schema(res.old_df) == _schema(res.new_df)
    assert res.old_df.select("score").first()[0] is None
    assert res.new_df.select("score").first()[0] == 9.5


def test_output_order_old_then_new(spark):
    """SchemaEvolutionTest:161/389 — result columns: oldDf order first, then
    new columns."""
    old = spark.createDataFrame([(1, "x", True)], "b int, a string, z boolean")
    new = spark.createDataFrame([("x", 5, 2, 1.0)], "a string, added int, b int, extra double")
    res = evolve(old, new)
    assert [f.name for f in res.target_schema.fields] == ["b", "a", "z", "added", "extra"]


def test_changed_datatype_recognized_and_widened(spark):
    """SchemaEvolutionTest:196 — same name, different type: evolution casts
    both sides to the common type."""
    old = spark.createDataFrame([(1, 5)], "id int, v int")
    new = spark.createDataFrame([(2, 6.5)], "id int, v double")
    res = evolve(old, new)
    assert dict(_schema(res.old_df))["v"] == "double"
    assert res.old_df.select("v").first()[0] == 5.0


def test_dropped_column_kept_empty_and_ignored_per_config(spark):
    """SchemaEvolutionTest:229 — a column the new data dropped stays in the
    result with nulls; with ignoreOldDeletedColumns it disappears."""
    old = spark.createDataFrame([(1, "x", "legacy")], "id int, name string, old_col string")
    new = spark.createDataFrame([(2, "y")], "id int, name string")
    kept = evolve(old, new)
    assert "old_col" in kept.new_df.columns
    assert kept.new_df.select("old_col").first()[0] is None
    dropped = evolve(old, new, ignore_old_deleted_columns=True)
    assert "old_col" not in dropped.new_df.columns


def test_renamed_column_cornercase(spark):
    """SchemaEvolutionTest:276 — a rename looks like drop+add: the old name
    survives with nulls in new data, the new name is added with nulls in
    old data."""
    old = spark.createDataFrame([(1, "x")], "id int, old_name string")
    new = spark.createDataFrame([(2, "y")], "id int, new_name string")
    res = evolve(old, new)
    assert [f.name for f in res.target_schema.fields] == ["id", "old_name", "new_name"]
    assert res.new_df.select("old_name").first()[0] is None
    assert res.old_df.select("new_name").first()[0] is None


def test_new_columns_and_technical_cols_to_ignore(spark):
    """SchemaEvolutionTest:321 — colsToIgnore take no part in evolution and
    are re-appended at the END of each frame."""
    old = spark.createDataFrame(
        [(1, "x", "2024-01-01", "h1")], "id int, name string, dl_ts string, dl_hash string"
    )
    new = spark.createDataFrame([(2, "y", 9.0)], "id int, name string, score double")
    res = evolve(old, new, cols_to_ignore=["dl_ts", "dl_hash"])
    assert [f.name for f in res.target_schema.fields] == ["id", "name", "score"]
    assert res.old_df.columns == ["id", "name", "score", "dl_ts", "dl_hash"]
    assert res.new_df.columns == ["id", "name", "score"]
    assert res.old_df.select("dl_hash").first()[0] == "h1"


def test_numeric_to_string_cast(spark):
    """SchemaEvolutionTest:364 — numeric columns widen to string when the
    other side holds strings."""
    old = spark.createDataFrame([(1, 42)], "id int, code int")
    new = spark.createDataFrame([(2, "A42")], "id int, code string")
    res = evolve(old, new)
    assert dict(_schema(res.old_df))["code"] == "string"
    assert res.old_df.select("code").first()[0] == "42"


def test_result_order_old_new_ignored(spark):
    """SchemaEvolutionTest:389 — full ordering contract: oldDf columns, then
    new columns, then colsToIgnore."""
    old = spark.createDataFrame([(1, "x", "t")], "b int, a string, dl_ts string")
    new = spark.createDataFrame([(2, "y", 1.5)], "b int, a string, n double")
    res = evolve(old, new, cols_to_ignore=["dl_ts"])
    assert res.old_df.columns == ["b", "a", "n", "dl_ts"]


def test_new_column_in_struct(spark):
    """SchemaEvolutionTest:406 — a field added INSIDE a struct appears as
    null for old rows."""
    old = spark.createDataFrame([(1, ("x",))], "id int, rec struct<a:string>")
    new = spark.createDataFrame([(2, ("y", 5))], "id int, rec struct<a:string,b:int>")
    res = evolve(old, new)
    assert dict(_schema(res.old_df))["rec"] == "struct<a:string,b:int>"
    row = res.old_df.select("rec").first()[0]
    assert row["a"] == "x" and row["b"] is None


def test_changed_type_in_struct(spark):
    """SchemaEvolutionTest:424 — a nested field's type widens."""
    old = spark.createDataFrame([(1, (5,))], "id int, rec struct<v:int>")
    new = spark.createDataFrame([(2, (6.5,))], "id int, rec struct<v:double>")
    res = evolve(old, new)
    assert dict(_schema(res.old_df))["rec"] == "struct<v:double>"
    assert res.old_df.select("rec.v").first()[0] == 5.0


def test_changed_type_of_array(spark):
    """SchemaEvolutionTest:440 — array element types widen."""
    old = spark.createDataFrame([(1, [1, 2])], "id int, xs array<int>")
    new = spark.createDataFrame([(2, [1.5])], "id int, xs array<double>")
    res = evolve(old, new)
    assert dict(_schema(res.old_df))["xs"] == "array<double>"
    assert res.old_df.select("xs").first()[0] == [1.0, 2.0]


def test_new_column_in_array_of_struct(spark):
    """SchemaEvolutionTest:456 — a field added inside array<struct>."""
    old = spark.createDataFrame([(1, [("x",)])], "id int, xs array<struct<a:string>>")
    new = spark.createDataFrame([(2, [("y", 7)])], "id int, xs array<struct<a:string,b:int>>")
    res = evolve(old, new)
    elem = res.old_df.select(F.col("xs")[0]).first()[0]
    assert elem["a"] == "x" and elem["b"] is None


def test_deleted_column_in_array_of_struct(spark):
    """SchemaEvolutionTest:472 — a field deleted inside array<struct> stays
    in the union schema, null in new rows."""
    old = spark.createDataFrame([(1, [("x", 7)])], "id int, xs array<struct<a:string,b:int>>")
    new = spark.createDataFrame([(2, [("y",)])], "id int, xs array<struct<a:string>>")
    res = evolve(old, new)
    elem = res.new_df.select(F.col("xs")[0]).first()[0]
    assert elem["a"] == "y" and elem["b"] is None


def test_project_to_schema_is_catalyst_only(spark):
    """ComplexTypeEvolutionTest posture — nested evolution is pure column
    expressions (struct rebuild + transform), no UDFs, no shuffle."""
    old = spark.createDataFrame([(1, [("x",)])], "id int, xs array<struct<a:string>>")
    target = T.StructType.fromDDL("id int, xs array<struct<a:string,b:int>>")
    plan = project_to_schema(old, target)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


# --------------------------------------------------------------------------
# util/misc/NestedColumnUtilTest.scala (5) — selectSchema/transformColumns
# semantics live in project_to_schema/_cast_nested here.
# --------------------------------------------------------------------------


def test_nested_select_with_reduced_schema(spark):
    """NestedColumnUtilTest:51 — projecting onto a schema that drops nested
    fields keeps only the requested ones."""
    df = spark.createDataFrame(
        [((1, "x", True), 9)], "rec struct<a:int,b:string,c:boolean>, n int"
    )
    target = T.StructType.fromDDL("rec struct<a:int,b:string>, n int")
    out = project_to_schema(df, target)
    assert [(f.name, f.dataType.simpleString()) for f in out.schema.fields] == [
        ("rec", "struct<a:int,b:string>"), ("n", "int"),
    ]
    row = out.first()
    assert row["rec"]["a"] == 1 and row["rec"]["b"] == "x"


def test_nested_select_with_cast(spark):
    """NestedColumnUtilTest:66 — reduced schema + nested datatype casts in
    one projection."""
    df = spark.createDataFrame([((1, 5),)], "rec struct<a:int,b:int>")
    target = T.StructType.fromDDL("rec struct<a:long,b:string>")
    out = project_to_schema(df, target)
    row = out.first()["rec"]
    assert row["a"] == 1 and row["b"] == "5"
    assert out.schema["rec"].dataType.simpleString() == "struct<a:bigint,b:string>"


def test_nested_select_changed_column_order(spark):
    """NestedColumnUtilTest:82 — the target schema's field ORDER wins."""
    df = spark.createDataFrame([((1, "x"),)], "rec struct<a:int,b:string>")
    target = T.StructType.fromDDL("rec struct<b:string,a:int>")
    out = project_to_schema(df, target)
    assert out.schema["rec"].dataType.fieldNames() == ["b", "a"]
    assert tuple(out.first()["rec"]) == ("x", 1)


def test_nested_transform_datatype(spark):
    """NestedColumnUtilTest:99 — a nested field's datatype is transformed in
    place (int → string) without touching siblings."""
    df = spark.createDataFrame([((1, 2),)], "rec struct<keep:int,change:int>")
    target = T.StructType.fromDDL("rec struct<keep:int,change:string>")
    out = project_to_schema(df, target).first()["rec"]
    assert out["keep"] == 1 and out["change"] == "2"


def test_nested_remove_column_from_array(spark):
    """NestedColumnUtilTest:110 — dropping a field from array<struct>
    elements."""
    df = spark.createDataFrame(
        [([("x", 1), ("y", 2)],)], "xs array<struct<keep:string,drop:int>>"
    )
    target = T.StructType.fromDDL("xs array<struct<keep:string>>")
    out = project_to_schema(df, target)
    assert out.schema["xs"].dataType.elementType.fieldNames() == ["keep"]
    assert [e["keep"] for e in out.first()["xs"]] == ["x", "y"]
