"""1:1 DataFrame transformers — the user-facing operator library.

Reference: `workflow/action/generic/transformer/GenericDfTransformerDef.scala:38-104`
and the per-transformer files cited on each class. Every transformer is a
small declarative wrapper over DataFrame ops so the whole chain stays inside
Catalyst (one logical plan, whole-stage codegen, pushdown through the chain).
"""

from __future__ import annotations

import abc
import re
import unicodedata
from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


class DfTransformer(abc.ABC):
    """Chainable 1:1 transformer. Subclasses override `transform`; partition
    value remapping (GenericDfTransformerDef.transformPartitionValues) is the
    identity unless overridden."""

    name: str = "transformer"

    @abc.abstractmethod
    def transform(self, spark: SparkSession, df: DataFrame, options: dict[str, Any] | None = None) -> DataFrame:
        ...

    def transform_partition_values(self, partition_values: list) -> list:
        return partition_values


@dataclass
class SQLDfTransformer(DfTransformer):
    """SQL with the input registered as a temp view (SQLDfTransformer.scala:56).

    The token `%{inputViewName}` (and `%{<option>}` generally) is substituted
    before execution, mirroring the reference's token substitution.
    """

    code: str
    input_view_name: str = "input"
    name: str = "sql"

    def transform(self, spark, df, options=None):
        from smart_data_lake_spark.actions.helper import (
            replace_special_characters_with_underscore,
        )

        view = replace_special_characters_with_underscore(self.input_view_name)
        df.createOrReplaceTempView(view)
        sql = self.code.replace("%{inputViewName}", view)
        input_id = (options or {}).get("input_id")
        if input_id:
            # per-input token %{inputViewName_<id>} AND the legacy bare
            # view name <id> (SQLDfTransformerTest:56-70). The id-named view
            # is registered ONLY when the statement actually references it —
            # an unconditional registration would shadow a same-named catalog
            # table for every later spark.sql in the session
            safe_id = re.sub(r"[^A-Za-z0-9_]", "_", str(input_id))
            token = "%{inputViewName_" + str(input_id) + "}"
            uses_bare = re.search(rf"\b{re.escape(safe_id)}\b", sql) is not None
            if token in sql or uses_bare:
                df.createOrReplaceTempView(safe_id)
                sql = sql.replace(token, safe_id)
        for k, v in (options or {}).items():
            sql = sql.replace("%{" + str(k) + "}", str(v))
        return spark.sql(sql)


@dataclass
class FilterTransformer(DfTransformer):
    """(FilterTransformer.scala:42)"""

    filter_clause: str
    name: str = "filter"

    def transform(self, spark, df, options=None):
        return df.where(F.expr(self.filter_clause))


@dataclass
class WhitelistTransformer(DfTransformer):
    """Keep listed columns (WhitelistTransformer.scala:37); column pruning
    then reaches the scan via Catalyst."""

    column_whitelist: list[str]
    name: str = "whitelist"

    def transform(self, spark, df, options=None):
        lower = {c.lower(): c for c in df.columns}
        # backtick-quote: a kept column named e.g. `b.c` must not be parsed
        # as a struct-field access (BlacklistTransformerTest:83 class of bug)
        return df.select(
            *[F.col(f"`{lower[c.lower()]}`") for c in self.column_whitelist if c.lower() in lower]
        )


@dataclass
class BlacklistTransformer(DfTransformer):
    """(BlacklistTransformer.scala:36)"""

    column_blacklist: list[str]
    name: str = "blacklist"

    def transform(self, spark, df, options=None):
        drop = {c.lower() for c in self.column_blacklist}
        # backtick-quote so surviving dotted names stay plain columns
        return df.select(*[F.col(f"`{c}`") for c in df.columns if c.lower() not in drop])


@dataclass
class AdditionalColumnsTransformer(DfTransformer):
    """Add derived columns from SQL expressions (AdditionalColumnsTransformer.scala:40)."""

    additional_columns: dict[str, str]
    name: str = "additional_columns"

    def transform(self, spark, df, options=None):
        return df.withColumns({c: F.expr(e) for c, e in self.additional_columns.items()})


@dataclass
class ConvertNullValuesTransformer(DfTransformer):
    """Fill nulls: strings→value_for_string, numerics→value_for_number;
    non-string/number columns are left alone. `include_columns` XOR
    `exclude_columns` limits the scope, and both are validated against the
    frame (case-insensitively) so a typo'd column name fails loudly
    (ConvertNullValuesTransformer.scala:38, ConvertNullValuesTransformerTest
    :41-285). `columns` is the legacy alias of include_columns."""

    columns: list[str] | None = None
    include_columns: list[str] | None = None
    exclude_columns: list[str] | None = None
    value_for_string: str = "na"
    value_for_number: int = -1
    name: str = "convert_nulls"

    def transform(self, spark, df, options=None):
        include = self.include_columns or self.columns
        if include and self.exclude_columns:
            raise ValueError(
                f"({self.name}) includeColumns and excludeColumns are exclusive"
            )
        by_lower = {c.lower(): c for c in df.columns}
        for declared in (include or []) + (self.exclude_columns or []):
            if declared.lower() not in by_lower:
                raise ValueError(
                    f"({self.name}) column {declared!r} does not exist in {df.columns}"
                )
        if include:
            cols = {by_lower[c.lower()] for c in include}
        elif self.exclude_columns:
            excluded = {by_lower[c.lower()] for c in self.exclude_columns}
            cols = {c for c in df.columns if c not in excluded}
        else:
            cols = set(df.columns)
        str_cols = [f.name for f in df.schema.fields if f.name in cols and isinstance(f.dataType, T.StringType)]
        num_cols = [
            f.name
            for f in df.schema.fields
            if f.name in cols and isinstance(f.dataType, T.NumericType)
        ]
        if str_cols:
            df = df.fillna(self.value_for_string, subset=str_cols)
        if num_cols:
            df = df.fillna(self.value_for_number, subset=num_cols)
        return df


@dataclass
class DataValidationTransformer(DfTransformer):
    """Row-level rules appended to an `errors` array column
    (DataValidationTransformer.scala:41,69). rules = list of
    {"condition": sql_bool, "error_msg": str}; a row failing a rule gets the
    message appended. `F.array_compact` keeps it null-free."""

    rules: list[dict[str, str]]
    error_column: str = "errors"
    name: str = "data_validation"

    def transform(self, spark, df, options=None):
        checks = [
            F.when(~F.expr(r["condition"]), F.lit(r.get("error_msg", r["condition"])))
            for r in self.rules
        ]
        return df.withColumn(self.error_column, F.array_compact(F.array(*checks)))


@dataclass
class DeduplicateTransformer(DfTransformer):
    """Keep best row per PK by ranking expression (DeduplicateTransformer.scala:43).

    Scale note: implemented as window row_number over (pk, rank) — a single
    shuffle on the PK; AQE handles skewed keys.
    """

    primary_key: list[str] | None = None
    rank_expression: str | None = None
    name: str = "deduplicate"

    def transform(self, spark, df, options=None):
        from pyspark.sql import Window

        pk = self.primary_key
        if pk is None:
            # pk detection from the OUTPUT table (the action supplies it);
            # no pk anywhere is a configuration error
            # (DeduplicateTransformerTest:126/:169)
            pk = (options or {}).get("output_primary_key")
        if not pk:
            raise ValueError(
                f"({self.name}) no primaryKey configured and the output "
                "DataObject's table declares none"
            )
        if self.rank_expression is None:
            return df.dropDuplicates(pk)
        w = Window.partitionBy(*pk).orderBy(F.expr(self.rank_expression).desc())
        return (
            df.withColumn("_dl_rn", F.row_number().over(w))
            .where(F.col("_dl_rn") == 1)
            .drop("_dl_rn")
        )


def standardize_name(name: str, camel_case_to_underscores: bool = True, normalize_to_ascii: bool = True) -> str:
    """camelCase→snake_case, ascii-fold, strip illegal chars
    (GenericDataFrame.standardizeColNames logic, GenericDataFrame.scala:175-193)."""
    if normalize_to_ascii:
        name = unicodedata.normalize("NFKD", name).encode("ascii", "ignore").decode()
    if camel_case_to_underscores:
        name = re.sub(r"(?<=[a-z0-9])(?=[A-Z])", "_", name)
    name = name.lower()
    name = re.sub(r"[^a-z0-9_]", "_", name)
    name = re.sub(r"_+", "_", name).strip("_")
    return name


@dataclass
class StandardizeColNamesTransformer(DfTransformer):
    """(StandardizeColNamesTransformer.scala:41)"""

    camel_case_to_lower: bool = True
    normalize_to_ascii: bool = True
    name: str = "standardize_col_names"

    def transform(self, spark, df, options=None):
        return df.toDF(
            *[standardize_name(c, self.camel_case_to_lower, self.normalize_to_ascii) for c in df.columns]
        )


@dataclass
class StandardizeDatatypesTransformer(DfTransformer):
    """Normalize narrow types (StandardizeSparkDatatypesTransformer.scala:38):
    byte/short→int, float→double, decimal→double where safe."""

    name: str = "standardize_datatypes"

    def transform(self, spark, df, options=None):
        casts = {}
        for f_ in df.schema.fields:
            if isinstance(f_.dataType, (T.ByteType, T.ShortType)):
                casts[f_.name] = F.col(f_.name).cast("int")
            elif isinstance(f_.dataType, T.FloatType):
                casts[f_.name] = F.col(f_.name).cast("double")
        return df.withColumns(casts) if casts else df


def _load_crypt_class(path: str):
    """Pluggable codec: a dotted path to a class with
    `encrypt(value, key) -> str` / `decrypt(value, key) -> str`
    (EncryptColumnsTransformer 'algorithm as class name',
    EncryptColumnsTransformerTest:172). Python-UDF path — config-driven
    edge logic, not for hot loops."""
    import importlib

    module_name, _, cls_name = path.rpartition(".")
    return getattr(importlib.import_module(module_name), cls_name)()


@dataclass
class EncryptColumnsTransformer(DfTransformer):
    """AES column encryption via Spark's built-in aes_encrypt
    (EncryptColumnsTransformer.scala:43 uses a scala UDF; Spark ≥3.3 has it
    native, keeping the hot path in the JVM). `algorithm` is GCM/ECB/CBC —
    or a dotted class path for a custom codec (slow Python-UDF path)."""

    encrypt_columns: list[str]
    key: str = ""
    algorithm: str = "GCM"
    name: str = "encrypt_columns"

    def transform(self, spark, df, options=None):
        if "." in self.algorithm:
            codec = _load_crypt_class(self.algorithm)
            key = self.key
            fn = F.udf(lambda v: None if v is None else codec.encrypt(str(v), key))
            return df.withColumns({c: fn(F.col(c)) for c in self.encrypt_columns})
        if self.algorithm.upper() not in ("GCM", "CBC", "ECB"):
            raise ValueError(
                f"({self.name}) unsupported algorithm {self.algorithm!r} — "
                "use GCM/CBC/ECB or a codec class path"
            )
        key = F.lit(self.key.ljust(16)[:16].encode())
        mode = F.lit(self.algorithm)
        return df.withColumns(
            {
                c: F.base64(F.aes_encrypt(F.col(c).cast("string").cast("binary"), key, mode))
                for c in self.encrypt_columns
            }
        )


@dataclass
class DecryptColumnsTransformer(DfTransformer):
    """(DecryptColumnsTransformer.scala:42)"""

    decrypt_columns: list[str]
    key: str = ""
    algorithm: str = "GCM"
    name: str = "decrypt_columns"

    def transform(self, spark, df, options=None):
        if "." in self.algorithm:
            codec = _load_crypt_class(self.algorithm)
            key_str = self.key
            fn = F.udf(lambda v: None if v is None else codec.decrypt(str(v), key_str))
            return df.withColumns({c: fn(F.col(c)) for c in self.decrypt_columns})
        if self.algorithm.upper() not in ("GCM", "CBC", "ECB"):
            raise ValueError(
                f"({self.name}) unsupported algorithm {self.algorithm!r} — "
                "use GCM/CBC/ECB or a codec class path"
            )
        key = F.lit(self.key.ljust(16)[:16].encode())
        mode = F.lit(self.algorithm)
        return df.withColumns(
            {
                c: F.aes_decrypt(F.unbase64(F.col(c)), key, mode).cast("string")
                for c in self.decrypt_columns
            }
        )


@dataclass
class RepartitionTransformer(DfTransformer):
    """(SparkRepartitionTransformer.scala:38) — control parallelism/file count;
    keyed repartition co-locates rows for downstream partitioned writes."""

    num_partitions: int
    key_cols: list[str] = field(default_factory=list)
    name: str = "repartition"

    def transform(self, spark, df, options=None):
        if self.key_cols:
            return df.repartition(self.num_partitions, *[F.col(c) for c in self.key_cols])
        return df.repartition(self.num_partitions)


@dataclass
class FlattenTransformer(DfTransformer):
    """Recursively flatten struct columns; optionally explode arrays
    (SparkFlattenDfTransformer.scala:53)."""

    explode_arrays: bool = False
    separator: str = "_"
    name: str = "flatten"

    def transform(self, spark, df, options=None):
        while True:
            struct_fields = [f_ for f_ in df.schema.fields if isinstance(f_.dataType, T.StructType)]
            array_fields = (
                [f_ for f_ in df.schema.fields if isinstance(f_.dataType, T.ArrayType)]
                if self.explode_arrays
                else []
            )
            if not struct_fields and not array_fields:
                return df
            cols: list = []
            for f_ in df.schema.fields:
                if isinstance(f_.dataType, T.StructType):
                    for sub in f_.dataType.fields:
                        cols.append(F.col(f"`{f_.name}`.`{sub.name}`").alias(f"{f_.name}{self.separator}{sub.name}"))
                elif self.explode_arrays and isinstance(f_.dataType, T.ArrayType):
                    cols.append(F.explode_outer(F.col(f"`{f_.name}`")).alias(f_.name))
                else:
                    cols.append(F.col(f"`{f_.name}`"))
            df = df.select(*cols)


@dataclass
class DebugTransformer(DfTransformer):
    """Log schema/sample between steps (DebugTransformer.scala:52)."""

    n_rows: int = 5
    print_schema: bool = True
    name: str = "debug"

    def transform(self, spark, df, options=None):
        if self.print_schema:
            df.printSchema()
        df.show(self.n_rows, truncate=False)
        return df


@dataclass
class PythonCodeDfTransformer(DfTransformer):
    """Embedded python code (PythonCodeSparkDfTransformer.scala:51-72).
    Contract like the reference's Py4J bridge: the code sees `inDf`, `spark`,
    `options` and must assign `outDf`."""

    code: str
    name: str = "python_code"

    def transform(self, spark, df, options=None):
        scope: dict[str, Any] = {"inDf": df, "spark": spark, "options": options or {}, "F": F}
        exec(self.code, scope)  # noqa: S102 — explicit user-code feature
        if "outDf" not in scope:
            raise ValueError("PythonCodeDfTransformer code must assign `outDf`")
        return scope["outDf"]


@dataclass
class PythonClassDfTransformer(DfTransformer):
    """User callable `(spark, df, options) -> DataFrame`, given directly or as
    a dotted import path (rebuild of ScalaClassGenericDfTransformer.scala:44)."""

    fn: Callable[..., DataFrame] | str
    name: str = "python_class"

    def transform(self, spark, df, options=None):
        fn = self.fn
        if isinstance(fn, str):
            import importlib

            module, _, attr = fn.rpartition(".")
            fn = getattr(importlib.import_module(module), attr)
        return fn(spark, df, options or {})


def apply_df_transformers(
    spark: SparkSession,
    df: DataFrame,
    transformers: list[DfTransformer],
    options: dict[str, Any] | None = None,
) -> DataFrame:
    for t in transformers:
        df = t.transform(spark, df, options)
    return df
