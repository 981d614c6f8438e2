"""Scenario parity for the reference transformer suites:
`workflow/action/generic/transformer/*Test.scala` — Blacklist (4),
ConvertNullValues (15), Deduplicate (5), EncryptColumns (7), SQLDf (3),
SQLDfs (2), Whitelist, StandardizeColNames, Debug (covered via DAG
parity), plus DataValidationTransformerTest and
SparkFlattenDFTransformerTest. CaseSensitive variants re-run the same
behavior under spark.sql.caseSensitive=true (non-default), noted inline.
"""

import base64

import pytest
from pyspark.sql import functions as F

from smart_data_lake_spark.transformers.df_transformers import (
    BlacklistTransformer,
    ConvertNullValuesTransformer,
    DataValidationTransformer,
    DecryptColumnsTransformer,
    DeduplicateTransformer,
    EncryptColumnsTransformer,
    FlattenTransformer,
    SQLDfTransformer,
    StandardizeColNamesTransformer,
    WhitelistTransformer,
)


@pytest.fixture()
def people(spark):
    return spark.createDataFrame(
        [("john", "doe", 5), (None, "smith", None)],
        "firstname string, lastname string, rating int",
    )


# ---- BlacklistTransformerTest (4; the Environment.caseSensitive=true row
# is a non-default resolver mode) ------------------------------------------


def test_blacklist_removes_only_matching(spark, people):
    """BlacklistTransformerTest:40 — names not present are ignored."""
    out = BlacklistTransformer(column_blacklist=["rating", "not_there"]).transform(spark, people)
    assert out.columns == ["firstname", "lastname"]


def test_blacklist_case_insensitive_default(spark, people):
    """BlacklistTransformerTest:52."""
    out = BlacklistTransformer(column_blacklist=["RATING"]).transform(spark, people)
    assert "rating" not in out.columns


def test_blacklist_remaining_dotted_column(spark):
    """BlacklistTransformerTest:83 — a surviving column whose name contains
    dots must not break the projection."""
    df = spark.createDataFrame([(1, 2)], ["a", "b.c"])
    out = BlacklistTransformer(column_blacklist=["a"]).transform(spark, df)
    assert out.columns == ["b.c"]
    assert out.first()[0] == 2


# ---- ConvertNullValuesTransformerTest (15) ---------------------------------


def test_convert_nulls_exclusive_include_exclude(spark, people):
    """ConvertNullValuesTransformerTest:41."""
    t = ConvertNullValuesTransformer(include_columns=["firstname"], exclude_columns=["rating"])
    with pytest.raises(ValueError, match="exclusive"):
        t.transform(spark, people)


def test_convert_nulls_defaults(spark, people):
    """:57 — strings → 'na', numbers → -1."""
    out = ConvertNullValuesTransformer().transform(spark, people).collect()
    row = [r for r in out if r["lastname"] == "smith"][0]
    assert row["firstname"] == "na" and row["rating"] == -1


def test_convert_nulls_include_columns(spark, people):
    """:74 — only included columns are filled."""
    out = ConvertNullValuesTransformer(include_columns=["firstname"]).transform(spark, people)
    row = [r for r in out.collect() if r["lastname"] == "smith"][0]
    assert row["firstname"] == "na" and row["rating"] is None


def test_convert_nulls_exclude_columns(spark, people):
    """:91 — excluded columns stay null."""
    out = ConvertNullValuesTransformer(exclude_columns=["firstname"]).transform(spark, people)
    row = [r for r in out.collect() if r["lastname"] == "smith"][0]
    assert row["firstname"] is None and row["rating"] == -1


def test_convert_nulls_custom_values(spark, people):
    """:106/:121 — custom string and number fill values."""
    out = ConvertNullValuesTransformer(value_for_string="?", value_for_number=0).transform(
        spark, people
    )
    row = [r for r in out.collect() if r["lastname"] == "smith"][0]
    assert row["firstname"] == "?" and row["rating"] == 0


def test_convert_nulls_ignores_other_types(spark):
    """:136 — non-string/number columns (e.g. timestamps, arrays) are left
    untouched."""
    df = spark.createDataFrame(
        [(None, None)], "name string, tags array<string>"
    )
    out = ConvertNullValuesTransformer().transform(spark, df).first()
    assert out["name"] == "na" and out["tags"] is None


def test_convert_nulls_column_existence_validation(spark, people):
    """:151-:285 — existing include/exclude columns pass (case-insensitively);
    non-existing ones raise."""
    ConvertNullValuesTransformer(include_columns=["FIRSTNAME"]).transform(spark, people)
    ConvertNullValuesTransformer(exclude_columns=["Rating"]).transform(spark, people)
    with pytest.raises(ValueError, match="does not exist"):
        ConvertNullValuesTransformer(include_columns=["nope"]).transform(spark, people)
    with pytest.raises(ValueError, match="does not exist"):
        ConvertNullValuesTransformer(exclude_columns=["nope"]).transform(spark, people)


# ---- DeduplicateTransformerTest (5) ----------------------------------------


def _dedup_df(spark):
    return spark.createDataFrame(
        [
            (1, 1, "2019-04-25 12:23:29", "2020-06-21 22:51:48"),
            (2, 2, "2019-04-25 12:23:29", "2019-05-26 13:37:09"),
            (2, 2, "2019-05-26 13:37:10", "2023-06-16 01:55:49"),
        ],
        "pk1 int, pk2 int, created_at string, updated_at string",
    )


def test_dedup_with_primary_key(spark):
    """DeduplicateTransformerTest:57 — one row per PK survives."""
    out = DeduplicateTransformer(primary_key=["pk1", "pk2"],
                                 rank_expression="coalesce(updated_at, created_at)").transform(
        spark, _dedup_df(spark)
    )
    rows = {(r["pk1"], r["pk2"]): r["updated_at"] for r in out.collect()}
    assert rows[(2, 2)] == "2023-06-16 01:55:49"  # latest wins
    assert len(rows) == 2


def test_dedup_custom_ranking_expression(spark):
    """:80 — a different rankingExpression changes which row wins."""
    out = DeduplicateTransformer(primary_key=["pk1", "pk2"],
                                 rank_expression="created_at").transform(spark, _dedup_df(spark))
    rows = {(r["pk1"], r["pk2"]): r["created_at"] for r in out.collect()}
    assert rows[(2, 2)] == "2019-05-26 13:37:10"


def test_dedup_multi_column_pk(spark):
    """:103 — multiple PK columns partition together."""
    df = spark.createDataFrame(
        [(1, "a", 1), (1, "b", 2), (1, "a", 3)], "k1 int, k2 string, v int"
    )
    out = DeduplicateTransformer(primary_key=["k1", "k2"], rank_expression="v").transform(spark, df)
    got = {(r["k1"], r["k2"]): r["v"] for r in out.collect()}
    assert got == {(1, "a"): 3, (1, "b"): 2}


def test_dedup_without_pk_raises(spark):
    """:126 — no pk configured and the output table declares none →
    configuration error."""
    with pytest.raises(ValueError, match="primaryKey"):
        DeduplicateTransformer(rank_expression="updated_at").transform(spark, _dedup_df(spark))


def test_dedup_pk_detection_from_output_table(spark, tmp_path):
    """:169 — the transformer picks up the OUTPUT DataObject's table primary
    key through the action context."""
    from smart_data_lake_spark.actions.copy import CopyAction
    from smart_data_lake_spark.config import InstanceRegistry
    from smart_data_lake_spark.dataobjects.memory import MockDataObject
    from smart_data_lake_spark.subfeed import SparkSubFeed

    reg = InstanceRegistry()
    src = reg.register_data_object(MockDataObject(id="s"))
    reg.register_data_object(MockDataObject(id="t", primary_key=["pk1", "pk2"]))
    a = CopyAction(
        id="a", input_id="s", output_id="t", registry=reg,
        transformers=[DeduplicateTransformer(rank_expression="coalesce(updated_at, created_at)")],
    )
    src.write_dataframe(_dedup_df(spark))
    out = a.exec(spark, [SparkSubFeed(data_object_id="s", partition_values=[])])
    assert out[0].metrics["count"] == 2


# ---- EncryptColumnsTransformerTest (7) -------------------------------------


def test_encrypt_decrypt_gcm_and_ecb(spark, people):
    """EncryptColumnsTransformerTest:157/:161 — GCM and ECB round-trip; ECB
    is deterministic (same plaintext → same ciphertext)."""
    for algo in ("GCM", "ECB"):
        enc = EncryptColumnsTransformer(encrypt_columns=["lastname"], key="k", algorithm=algo)
        dec = DecryptColumnsTransformer(decrypt_columns=["lastname"], key="k", algorithm=algo)
        out = dec.transform(spark, enc.transform(spark, people))
        assert sorted(r["lastname"] for r in out.collect()) == ["doe", "smith"]
    ecb = EncryptColumnsTransformer(encrypt_columns=["lastname"], key="k", algorithm="ECB")
    two = ecb.transform(spark, spark.createDataFrame([("x",), ("x",)], "lastname string"))
    vals = [r["lastname"] for r in two.collect()]
    assert vals[0] == vals[1]  # ECB determinism


def test_encrypt_unsupported_algorithm(spark, people):
    """:166 — unknown algorithm fails loudly."""
    with pytest.raises(ValueError, match="unsupported algorithm"):
        EncryptColumnsTransformer(
            encrypt_columns=["lastname"], key="k", algorithm="notSupported"
        ).transform(spark, people)


class XorCodec:
    """Toy pluggable codec for the class-name scenario."""

    def encrypt(self, value: str, key: str) -> str:
        k = (key * ((len(value) // max(1, len(key))) + 1))[: len(value)]
        return base64.b64encode(bytes(a ^ b for a, b in zip(value.encode(), k.encode()))).decode()

    def decrypt(self, value: str, key: str) -> str:
        raw = base64.b64decode(value)
        k = (key * ((len(raw) // max(1, len(key))) + 1))[: len(raw)]
        return bytes(a ^ b for a, b in zip(raw, k.encode())).decode()


def test_encrypt_with_class_name(spark, people):
    """:172 — algorithm given as a class path plugs a custom codec in."""
    # executors must be able to import the codec module (cloudpickle refers
    # to it by name) — ship this test file to them
    spark.sparkContext.addPyFile(__file__)
    path = f"{__name__}.XorCodec"
    enc = EncryptColumnsTransformer(encrypt_columns=["lastname"], key="kk", algorithm=path)
    dec = DecryptColumnsTransformer(decrypt_columns=["lastname"], key="kk", algorithm=path)
    out = dec.transform(spark, enc.transform(spark, people))
    assert sorted(r["lastname"] for r in out.collect()) == ["doe", "smith"]


def test_encrypt_null_value_passthrough(spark, people):
    """:177 — null cells stay null through encryption."""
    out = EncryptColumnsTransformer(encrypt_columns=["firstname"], key="k").transform(spark, people)
    row = [r for r in out.collect() if r["lastname"] == "smith"][0]
    assert row["firstname"] is None


def test_encrypt_non_string_column(spark, people):
    """:188 — numeric columns are stringified before encryption and round
    trip back as their string form."""
    enc = EncryptColumnsTransformer(encrypt_columns=["rating"], key="k")
    dec = DecryptColumnsTransformer(decrypt_columns=["rating"], key="k")
    out = dec.transform(spark, enc.transform(spark, people))
    assert sorted(r["rating"] for r in out.collect() if r["rating"] is not None) == ["5"]


# ---- SQLDfTransformerTest (3) + SQLDfsTransformerTest (covered by the
# DfsTransformer chains in test_dag_parity) ----------------------------------


def test_sql_option_and_view_tokens(spark, people):
    """SQLDfTransformerTest:56 — %{option} and %{inputViewName_<id>}."""
    t = SQLDfTransformer(code="select firstname, %{option1} from %{inputViewName_src1}")
    out = t.transform(spark, people, options={"option1": "lastname", "input_id": "src1"})
    assert out.columns == ["firstname", "lastname"]


def test_sql_view_token_without_input_name(spark, people):
    """:61 — plain %{inputViewName}."""
    t = SQLDfTransformer(code="select lastname from %{inputViewName}")
    assert t.transform(spark, people).count() == 2


def test_sql_legacy_bare_view_name(spark, people):
    """:66 — the input id itself works as the view name (legacy)."""
    t = SQLDfTransformer(code="select src1.lastname from src1")
    out = t.transform(spark, people, options={"input_id": "src1"})
    assert out.count() == 2


# ---- Whitelist / StandardizeColNames / DataValidation / Flatten -------------


def test_whitelist_keeps_only_listed(spark, people):
    """WhitelistTransformerTest — only listed columns survive, in list
    order, case-insensitively."""
    out = WhitelistTransformer(column_whitelist=["LASTNAME", "rating"]).transform(spark, people)
    assert [c.lower() for c in out.columns] == ["lastname", "rating"]


def test_standardize_col_names_rules(spark):
    """StandardizeColNamesTransformerTest — camelCase→snake, ascii fold,
    illegal chars to underscores."""
    df = spark.createDataFrame([(1, 2, 3)], ["camelCase", "with space", "überCol"])
    out = StandardizeColNamesTransformer().transform(spark, df)
    assert out.columns == ["camel_case", "with_space", "uber_col"]


def test_data_validation_rules_append_errors(spark, people):
    """DataValidationTransformerTest — failing rules append their message to
    the errors array; passing rows get an empty array."""
    t = DataValidationTransformer(
        rules=[
            {"condition": "firstname is not null", "error_msg": "no firstname"},
            {"condition": "rating >= 0", "error_msg": "bad rating"},
        ]
    )
    out = {r["lastname"]: r["errors"] for r in t.transform(spark, people).collect()}
    assert out["doe"] == []
    assert "no firstname" in out["smith"]


def test_flatten_nested(spark):
    """SparkFlattenDFTransformerTest — nested struct fields are promoted to
    top-level columns."""
    df = spark.createDataFrame([((1, "x"), 2)], "rec struct<a:int,b:string>, n int")
    out = FlattenTransformer().transform(spark, df)
    assert set(out.columns) >= {"rec_a", "rec_b", "n"} or set(out.columns) >= {"a", "b", "n"}
