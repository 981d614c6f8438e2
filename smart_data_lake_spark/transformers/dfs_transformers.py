"""N:M transformers over dict[str, DataFrame].

Reference: `generic/transformer/GenericDfsTransformerDef.scala`;
`SQLDfsTransformer.scala:61` (map of output-name → SQL with all inputs
registered as temp views); chaining accumulates outputs into the input map
(`DataFrameActionImpl.applyTransformers`, DataFrameActionImpl.scala:487-495).
"""

from __future__ import annotations

import abc
import re
from dataclasses import dataclass
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession

from smart_data_lake_spark.transformers.df_transformers import DfTransformer


class DfsTransformer(abc.ABC):
    name: str = "dfs_transformer"

    @abc.abstractmethod
    def transform(
        self, spark: SparkSession, dfs: dict[str, DataFrame], options: dict[str, Any] | None = None
    ) -> dict[str, DataFrame]:
        ...


def _view_name(name: str) -> str:
    return re.sub(r"[^A-Za-z0-9_]", "_", name)


@dataclass
class SQLDfsTransformer(DfsTransformer):
    """code = {output_name: sql}; every input DataFrame is visible as a temp
    view named after its key (SQLDfsTransformer.scala:61)."""

    code: dict[str, str]
    name: str = "sql_dfs"

    def transform(self, spark, dfs, options=None):
        for k, df in dfs.items():
            df.createOrReplaceTempView(_view_name(k))
        out: dict[str, DataFrame] = {}
        for out_name, sql in self.code.items():
            for k, v in (options or {}).items():
                sql = sql.replace("%{" + str(k) + "}", str(v))
            out[out_name] = spark.sql(sql)
            # chained SQL steps can reference earlier outputs
            out[out_name].createOrReplaceTempView(_view_name(out_name))
        return out


@dataclass
class PythonCodeDfsTransformer(DfsTransformer):
    """Callable `(spark, dfs, options) -> dict[str, DataFrame]` or code string
    assigning `outDfs` from `inDfs` (PythonCodeSparkDfsTransformer.scala:51)."""

    fn: Callable[..., dict[str, DataFrame]] | str
    name: str = "python_dfs"

    def transform(self, spark, dfs, options=None):
        if callable(self.fn):
            return self.fn(spark, dfs, options or {})
        scope: dict[str, Any] = {"inDfs": dict(dfs), "spark": spark, "options": options or {}}
        exec(self.fn, scope)  # noqa: S102
        if "outDfs" not in scope:
            raise ValueError("PythonCodeDfsTransformer code must assign `outDfs`")
        return scope["outDfs"]


@dataclass
class DfTransformerWrapperDfsTransformer(DfsTransformer):
    """Apply a 1:1 transformer to selected members of the map
    (DfTransformerWrapperDfsTransformer.scala:37)."""

    transformer: DfTransformer
    sub_feeds_to_apply: list[str]
    name: str = "df_wrapper"

    def transform(self, spark, dfs, options=None):
        return {
            k: (self.transformer.transform(spark, df, options) if k in self.sub_feeds_to_apply else df)
            for k, df in dfs.items()
        }


def apply_dfs_transformers(
    spark: SparkSession,
    dfs: dict[str, DataFrame],
    transformers: list[DfsTransformer],
    options: dict[str, Any] | None = None,
) -> dict[str, DataFrame]:
    """Chain semantics: each transformer's outputs are merged over the input
    map and passed on (DataFrameActionImpl.scala:487-495)."""
    current = dict(dfs)
    for t in transformers:
        outputs = t.transform(spark, current, options)
        current = {**current, **outputs}
    return current
