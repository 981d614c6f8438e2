"""Faithful test-double of delta-spark's `DeltaTable` merge builder.

delta-spark is not installable in this container (no network; pip/apt
disallowed), so `DeltaLakeTableDataObject.merge_dataframe_by_primary_key`
(smart_data_lake_spark/dataobjects/table.py) would otherwise never execute.
This double implements Delta Lake's DOCUMENTED merge contract — the public
builder API (`DeltaTable.forPath/alias/merge/whenMatchedDelete/
whenMatchedUpdate/whenMatchedUpdateAll/whenNotMatchedInsert/
whenNotMatchedInsertAll/execute`) with clause semantics per the Delta docs:

  * WHEN MATCHED / WHEN NOT MATCHED clause lists are evaluated in
    registration order; the FIRST clause whose condition holds wins.
  * A matched target row satisfying no matched-clause is kept unchanged.
  * An unmatched source row satisfying no insert-clause is dropped.
  * An unmatched target row is always kept.
  * UPDATE set-maps / INSERT value-maps are expressions over the
    `existing`/`new` aliases; columns absent from a set-map keep their
    existing value, columns absent from a value-map become NULL.
  * Without schema evolution, referencing a non-target column in a set-map
    or value-map is an AnalysisException — the double raises ValueError,
    which is exactly the strictness that catches builder-chain bugs.

Deliberately independent of smart_data_lake_spark.merge: it is a generic
ordered-clause interpreter driven by the builder calls, so a bug in the
production options→clauses translation cannot be masked by a mirrored bug
here. Storage is plain parquet at the table path (the double's stand-in for
the Delta log), rewritten via tmp+swap on execute().
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class FakeMergeBuilder:
    def __init__(self, table: "FakeDeltaTable", source: DataFrame, condition: str) -> None:
        self._table = table
        self._source = source
        self._condition = condition
        self._matched: list[tuple[str, str | None, dict | None]] = []
        self._not_matched: list[tuple[str | None, dict | None]] = []

    # -- builder API (delta.tables.DeltaMergeBuilder) ----------------------
    def whenMatchedDelete(self, condition: str | None = None) -> "FakeMergeBuilder":
        self._matched.append(("delete", condition, None))
        return self

    def whenMatchedUpdate(self, condition: str | None = None, set: dict | None = None) -> "FakeMergeBuilder":
        if not set:
            raise ValueError("whenMatchedUpdate requires a non-empty set map")
        self._matched.append(("update", condition, dict(set)))
        return self

    def whenMatchedUpdateAll(self, condition: str | None = None) -> "FakeMergeBuilder":
        self._matched.append(("update_all", condition, None))
        return self

    def whenNotMatchedInsert(self, condition: str | None = None, values: dict | None = None) -> "FakeMergeBuilder":
        if not values:
            raise ValueError("whenNotMatchedInsert requires a non-empty values map")
        self._not_matched.append((condition, dict(values)))
        return self

    def whenNotMatchedInsertAll(self, condition: str | None = None) -> "FakeMergeBuilder":
        self._not_matched.append((condition, None))
        return self

    # -- execution ---------------------------------------------------------
    def execute(self) -> None:
        spark = self._source.sparkSession
        target_df = spark.read.parquet(self._table.path)
        target_cols = list(target_df.columns)
        source_cols = set(self._source.columns)
        t_alias, s_alias = self._table.alias_name or "target", self._table.source_alias or "source"

        tgt = target_df.withColumn("__dl_t", F.lit(True)).alias(t_alias)
        src = self._source.withColumn("__dl_s", F.lit(True)).alias(s_alias)
        joined = tgt.join(src, F.expr(self._condition), "full_outer")
        in_t = F.col("__dl_t").isNotNull()
        in_s = F.col("__dl_s").isNotNull()
        matched = in_t & in_s

        def resolve_matched(action: str, set_map: dict | None) -> dict:
            if action == "delete":
                return {}
            if action == "update_all":
                return {c: f"{s_alias}.{c}" for c in target_cols if c in source_cols}
            for c in set_map:
                if c not in target_cols:
                    raise ValueError(
                        f"merge set-map references non-target column {c!r} "
                        f"(target schema: {target_cols}) — Delta without schema "
                        "evolution raises AnalysisException here"
                    )
            return set_map

        # clause-index columns: index of the FIRST clause (registration
        # order) whose condition holds for the row; -1 = no clause fires
        def index_col(conditions: list, base_pred):
            idx = F.lit(-1)
            for i in reversed(range(len(conditions))):
                pred = base_pred & (F.expr(conditions[i]) if conditions[i] else F.lit(True))
                idx = F.when(pred, F.lit(i)).otherwise(idx)
            return idx

        m_clauses = [(c, a, s) for (a, c, s) in self._matched]
        m_idx = index_col([c for (c, _a, _s) in m_clauses], matched) if m_clauses else F.lit(-1)
        i_idx = index_col([c for (c, _v) in self._not_matched], in_s & ~in_t) if self._not_matched else F.lit(-1)

        out_cols = []
        for c in target_cols:
            typed_null = F.lit(None).cast(target_df.schema[c].dataType)
            expr = F.col(f"{t_alias}.{c}")  # default: keep existing
            for i, (cond, action, set_map) in enumerate(m_clauses):
                if action == "delete":
                    continue
                resolved = resolve_matched(action, set_map)
                val = F.expr(resolved[c]) if c in resolved else F.col(f"{t_alias}.{c}")
                expr = F.when(m_idx == i, val).otherwise(expr)
            for i, (cond, values) in enumerate(self._not_matched):
                if values is None:
                    val = F.expr(f"{s_alias}.{c}") if c in source_cols else typed_null
                else:
                    for k in values:
                        if k not in target_cols:
                            raise ValueError(
                                f"merge values-map references non-target column {k!r} "
                                f"(target schema: {target_cols})"
                            )
                    val = F.expr(values[c]) if c in values else typed_null
                expr = F.when((~in_t) & (i_idx == i), val).otherwise(expr)
            out_cols.append(expr.alias(c))

        delete_won = F.lit(False)
        for i, (_cond, action, _s) in enumerate(m_clauses):
            if action == "delete":
                delete_won = delete_won | (m_idx == i)
        keep = (
            (matched & ~delete_won)
            | (in_t & ~in_s)
            | (~in_t & in_s & (i_idx >= 0))
        )
        result = joined.where(keep).select(*out_cols)

        # tmp+swap rewrite: the double's stand-in for the Delta commit, safe
        # when `source` itself reads from the table path
        tmp = tempfile.mkdtemp(prefix="fake_delta_")
        try:
            result.write.mode("overwrite").parquet(tmp)
            shutil.rmtree(self._table.path)
            shutil.move(tmp, self._table.path)
        finally:
            if os.path.isdir(tmp):
                shutil.rmtree(tmp, ignore_errors=True)
        FakeDeltaTable.executed_merges.append(
            {
                "path": self._table.path,
                "condition": self._condition,
                "matched": [(a, c) for (c, a, _s) in m_clauses],
                "not_matched": [c for (c, _v) in self._not_matched],
            }
        )


class FakeDeltaTable:
    """Stands in for delta.tables.DeltaTable (parquet-backed)."""

    executed_merges: list[dict] = []

    def __init__(self, spark: SparkSession, path: str) -> None:
        self.spark = spark
        self.path = path
        self.alias_name: str | None = None
        self.source_alias: str | None = None

    @classmethod
    def forPath(cls, spark: SparkSession, path: str) -> "FakeDeltaTable":
        if not os.path.isdir(path):
            raise ValueError(f"{path} is not a Delta table")
        return cls(spark, path)

    def alias(self, name: str) -> "FakeDeltaTable":
        self.alias_name = name
        return self

    def toDF(self) -> DataFrame:
        return self.spark.read.parquet(self.path)

    def merge(self, source: DataFrame, condition: str) -> FakeMergeBuilder:
        # production code passes df.alias("new"); recover the alias for
        # expression resolution the same way Delta does (from the plan)
        self.source_alias = "new"
        return FakeMergeBuilder(self, source, condition)
