"""Per-transformer unit tests — the §2.3 operator library, one behavior each
(reference spec: the *Transformer.scala test classes)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from smart_data_lake_spark.transformers.df_transformers import (
    AdditionalColumnsTransformer,
    BlacklistTransformer,
    ConvertNullValuesTransformer,
    DataValidationTransformer,
    DecryptColumnsTransformer,
    DeduplicateTransformer,
    EncryptColumnsTransformer,
    FilterTransformer,
    FlattenTransformer,
    PythonClassDfTransformer,
    PythonCodeDfTransformer,
    RepartitionTransformer,
    SQLDfTransformer,
    StandardizeColNamesTransformer,
    StandardizeDatatypesTransformer,
    WhitelistTransformer,
)


@pytest.fixture()
def df(spark):
    return spark.createDataFrame(
        [Row(id=1, name="Alice", amount="10.5"), Row(id=2, name=None, amount="20.0")]
    )


def test_sql_transformer(spark, df):
    out = SQLDfTransformer(code="SELECT id, upper(name) AS name FROM %{inputViewName}").transform(spark, df)
    assert {tuple(r) for r in out.collect()} == {(1, "ALICE"), (2, None)}


def test_filter_whitelist_blacklist(spark, df):
    assert FilterTransformer(filter_clause="id = 1").transform(spark, df).count() == 1
    assert WhitelistTransformer(column_whitelist=["id"]).transform(spark, df).columns == ["id"]
    assert BlacklistTransformer(column_blacklist=["amount"]).transform(spark, df).columns == ["id", "name"]


def test_additional_columns_and_convert_nulls(spark, df):
    out = AdditionalColumnsTransformer(additional_columns={"doubled": "id * 2"}).transform(spark, df)
    assert [r["doubled"] for r in out.orderBy("id").collect()] == [2, 4]
    out2 = ConvertNullValuesTransformer(columns=["name"]).transform(spark, df)
    assert {r["name"] for r in out2.collect()} == {"Alice", "na"}


def test_data_validation_collects_rule_violations(spark, df):
    out = DataValidationTransformer(
        rules=[{"condition": "id > 1", "error_msg": "id too small"}]
    ).transform(spark, df)
    rows = {r["id"]: r["errors"] for r in out.collect()}
    assert rows[1] == ["id too small"] and rows[2] == []


def test_deduplicate_transformer_rank(spark):
    df = spark.createDataFrame([Row(k=1, v=5), Row(k=1, v=9), Row(k=2, v=3)])
    out = DeduplicateTransformer(primary_key=["k"], rank_expression="v").transform(spark, df)
    assert {tuple(r) for r in out.collect()} == {(1, 9), (2, 3)}


def test_standardize_col_names(spark):
    df = spark.createDataFrame([Row(**{"CamelCase": 1, "weird col": 2})])
    out = StandardizeColNamesTransformer().transform(spark, df)
    assert set(out.columns) == {"camel_case", "weird_col"}


def test_standardize_datatypes(spark, df):
    out = StandardizeDatatypesTransformer().transform(spark, df)
    assert dict((f.name, f.dataType.simpleString()) for f in out.schema.fields)["amount"] in (
        "double", "decimal(38,18)", "string",
    )


def test_encrypt_decrypt_roundtrip(spark, df):
    key = "secret-key"
    enc = EncryptColumnsTransformer(encrypt_columns=["name"], key=key).transform(spark, df)
    cipher = {r["id"]: r["name"] for r in enc.collect()}
    assert cipher[1] != "Alice" and cipher[1] is not None
    dec = DecryptColumnsTransformer(decrypt_columns=["name"], key=key).transform(spark, enc)
    assert {r["name"] for r in dec.collect()} == {"Alice", None}


def test_repartition(spark, df):
    out = RepartitionTransformer(num_partitions=3, key_cols=["id"]).transform(spark, df)
    assert out.rdd.getNumPartitions() == 3


def test_flatten_nested_structs(spark):
    df = spark.createDataFrame([Row(a=Row(b=Row(c=1), d="x"))])
    out = FlattenTransformer().transform(spark, df)
    assert set(out.columns) == {"a_b_c", "a_d"}
    assert out.collect()[0]["a_b_c"] == 1


def test_python_code_and_class_transformers(spark, df):
    out = PythonCodeDfTransformer(code="outDf = inDf.where(F.col('id') == 2)").transform(spark, df)
    assert out.count() == 1
    out2 = PythonClassDfTransformer(fn=lambda s, d, o: d.select("id")).transform(spark, df)
    assert out2.columns == ["id"]
