"""Faithful test-double of delta-spark's `DeltaTable` merge builder.

delta-spark is not installable in this container (no network; pip/apt
disallowed), so `DeltaLakeTableDataObject.merge_dataframe_by_primary_key`
(smart_data_lake_spark/dataobjects/table.py) would otherwise never execute.
This double implements Delta Lake's DOCUMENTED merge contract — the public
builder API (`DeltaTable.forPath/alias/merge/whenMatchedDelete/
whenMatchedUpdate/whenMatchedUpdateAll/whenNotMatchedInsert/
whenNotMatchedInsertAll/whenNotMatchedBySourceUpdate/
whenNotMatchedBySourceDelete/execute`) with clause semantics per the Delta
docs:

  * WHEN MATCHED / WHEN NOT MATCHED clause lists are evaluated in
    registration order; the FIRST clause whose condition holds wins.
  * A matched target row satisfying no matched-clause is kept unchanged.
  * An unmatched source row satisfying no insert-clause is dropped.
  * An unmatched target row is kept unless a WHEN NOT MATCHED BY SOURCE
    clause fires for it (first clause in registration order wins; update
    set-maps there may reference only `existing` — the source side is
    absent by definition).
  * UPDATE set-maps / INSERT value-maps are expressions over the
    `existing`/`new` aliases; columns absent from a set-map keep their
    existing value, columns absent from a value-map become NULL.
  * Without schema evolution, referencing a non-target column in a set-map
    or value-map is an AnalysisException — the double raises ValueError,
    which is exactly the strictness that catches builder-chain bugs.
  * Schema evolution on merge: with
    `spark.databricks.delta.schema.autoMerge.enabled` = true, updateAll /
    insertAll clauses widen the target schema by the source-only columns
    (appended in source order; untouched target rows read NULL). Explicit
    set/values maps still cannot reference evolved columns — Delta's
    documented limitation (delta-io/delta#2300), which the reference works
    around with ALTER TABLE ADD COLUMN (DeltaLakeTableDataObject.scala:408).

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
        self._nmbs: list[tuple[str, str | None, dict | None]] = []

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

    def whenNotMatchedBySourceUpdate(self, condition: str | None = None, set: dict | None = None) -> "FakeMergeBuilder":
        if not set:
            raise ValueError("whenNotMatchedBySourceUpdate requires a non-empty set map")
        self._nmbs.append(("update", condition, dict(set)))
        return self

    def whenNotMatchedBySourceDelete(self, condition: str | None = None) -> "FakeMergeBuilder":
        self._nmbs.append(("delete", condition, None))
        return self

    # -- execution ---------------------------------------------------------
    def execute(self) -> None:
        spark = self._source.sparkSession
        target_df = spark.read.parquet(self._table.path)
        target_cols = list(target_df.columns)
        source_cols = set(self._source.columns)
        t_alias, s_alias = self._table.alias_name or "target", self._table.source_alias or "source"

        # schema evolution on merge (Delta docs): only with autoMerge enabled,
        # and only star clauses (updateAll/insertAll) evolve — source-only
        # columns are appended to the target schema in source order.
        auto_merge = (
            str(spark.conf.get("spark.databricks.delta.schema.autoMerge.enabled", "false")).lower()
            == "true"
        )
        has_star = any(a == "update_all" for (a, _c, _s) in self._matched) or any(
            v is None for (_c, v) in self._not_matched
        )
        extra_src = [c for c in self._source.columns if c not in target_cols]
        if has_star and extra_src and not auto_merge:
            raise ValueError(
                f"source columns {extra_src} are not in the target schema and "
                "spark.databricks.delta.schema.autoMerge.enabled is false — "
                "Delta raises AnalysisException for updateAll/insertAll here"
            )
        evolved = extra_src if (auto_merge and has_star) else []
        all_cols = target_cols + evolved

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
                return {c: f"{s_alias}.{c}" for c in all_cols if c in source_cols}
            for c in set_map:
                if c not in target_cols:
                    # explicit set-maps never evolve, even under autoMerge
                    # (delta-io/delta#2300; the reference ALTERs columns in
                    # first, DeltaLakeTableDataObject.scala:408-416)
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
        nb_idx = (
            index_col([c for (_a, c, _s) in self._nmbs], in_t & ~in_s)
            if self._nmbs
            else F.lit(-1)
        )

        def resolve_nmbs(set_map: dict) -> dict:
            for k, v in set_map.items():
                if k not in target_cols:
                    raise ValueError(
                        f"whenNotMatchedBySource set-map references non-target "
                        f"column {k!r} (target schema: {target_cols})"
                    )
                if f"{s_alias}." in str(v):
                    raise ValueError(
                        f"whenNotMatchedBySource set expression {v!r} references "
                        f"the source alias — the source side does not exist for "
                        "these rows (Delta raises AnalysisException)"
                    )
            return set_map

        out_cols = []
        for c in all_cols:
            dtype = (
                target_df.schema[c].dataType
                if c in target_cols
                else self._source.schema[c].dataType
            )
            typed_null = F.lit(None).cast(dtype)
            # default: keep existing; evolved columns read NULL on old rows
            expr = F.col(f"{t_alias}.{c}") if c in target_cols else typed_null
            default = expr
            for i, (cond, action, set_map) in enumerate(m_clauses):
                if action == "delete":
                    continue
                resolved = resolve_matched(action, set_map)
                val = F.expr(resolved[c]) if c in resolved else default
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
            for i, (action, cond, set_map) in enumerate(self._nmbs):
                if action == "delete":
                    continue
                resolved = resolve_nmbs(set_map)
                val = F.expr(resolved[c]) if c in resolved else default
                expr = F.when(in_t & ~in_s & (nb_idx == i), val).otherwise(expr)
            out_cols.append(expr.alias(c))

        delete_won = F.lit(False)
        for i, (_cond, action, _s) in enumerate(m_clauses):
            if action == "delete":
                delete_won = delete_won | (m_idx == i)
        nmbs_delete_won = F.lit(False)
        for i, (action, _cond, _s) in enumerate(self._nmbs):
            if action == "delete":
                nmbs_delete_won = nmbs_delete_won | (nb_idx == i)
        keep = (
            (matched & ~delete_won)
            | (in_t & ~in_s & ~nmbs_delete_won)
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
                "not_matched_by_source": [(a, c) for (a, c, _s) in self._nmbs],
                "evolved_columns": evolved,
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

    def addColumns(self, cols: dict) -> None:
        """Stand-in for `ALTER TABLE ... ADD COLUMNS` (the reference's manual
        schema-evolution workaround, DeltaLakeTableDataObject.scala:408-416):
        appends typed NULL columns and rewrites. Real Delta alters only the
        log; the parquet-backed double pays the rewrite."""
        df = self.toDF()
        for name, dtype in cols.items():
            if name in df.columns:
                raise ValueError(f"column {name!r} already exists")
            df = df.withColumn(name, F.lit(None).cast(dtype))
        tmp = tempfile.mkdtemp(prefix="fake_delta_alter_")
        try:
            df.write.mode("overwrite").parquet(tmp)
            shutil.rmtree(self.path)
            shutil.move(tmp, self.path)
        finally:
            if os.path.isdir(tmp):
                shutil.rmtree(tmp, ignore_errors=True)

    def merge(self, source: DataFrame, condition: str) -> FakeMergeBuilder:
        # production code passes df.alias("new"); recover the alias for
        # expression resolution the same way Delta does (from the plan)
        self.source_alias = "new"
        return FakeMergeBuilder(self, source, condition)
