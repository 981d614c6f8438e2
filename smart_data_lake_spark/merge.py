"""Generic MERGE-into semantics on plain DataFrames.

Reference: `sdl-deltalake/.../DeltaLakeTableDataObject.scala:400-460` — the
clause order and semantics of the Delta merge statement:

  ON  pk-equality AND additionalMergePredicate
  WHEN MATCHED [deleteCondition]          -> delete
  WHEN MATCHED [updateCondition]          -> update `updateColumns` from source
  WHEN MATCHED [updateExistingCondition]  -> update ALL columns from source
  WHEN NOT MATCHED [insertCondition]      -> insert (minus insertColumnsToIgnore,
                                             with insertValuesOverride applied)

Used by ParquetTableDataObject (rewrite-based stand-in when no transactional
format is available) and MockDataObject. On Delta/Iceberg deployments the same
options drive the native MERGE, which touches only files whose min/max stats
overlap the source keys — that is the 100 TB path; this DataFrame variant is
a full-outer join shuffle on the PK, correct at any scale but rewriting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from smart_data_lake_spark.save_modes import SaveModeMergeOptions


def apply_insert_semantics(df: DataFrame, opts: SaveModeMergeOptions) -> DataFrame:
    """Insert clause applied to a stand-alone source (initial load of a merge
    target): filter insertCondition, drop ignored columns, apply overrides."""
    if opts.insert_condition:
        df = df.where(F.expr(opts.insert_condition))
    for c in opts.insert_columns_to_ignore:
        if c in df.columns:
            df = df.drop(c)
    for c, expr in opts.insert_values_override.items():
        df = df.withColumn(c, F.expr(expr))
    return df


def merge_dataframes(
    existing: DataFrame,
    new: DataFrame,
    pks: list[str],
    opts: SaveModeMergeOptions | None = None,
) -> DataFrame:
    """Full-outer-join implementation of the merge clause table above.

    Returns the complete post-merge table content (existing rows updated /
    deleted / kept + inserted source rows), with the existing table's columns
    plus any source-only columns not in insertColumnsToIgnore (schema
    evolution on merge, DeltaLakeTableDataObject.scala:407-416).
    """
    opts = opts or SaveModeMergeOptions()
    # unambiguous matched marker on each side; a data column may be
    # legitimately NULL so PK-nullity is not a safe matched test
    ex = existing.withColumn("_dl_tgt_marker", F.lit(True)).alias("existing")
    nw = new.withColumn("_dl_src_marker", F.lit(True)).alias("new")

    join_cond = F.lit(True)
    for k in pks:
        join_cond = join_cond & F.col(f"existing.{k}").eqNullSafe(F.col(f"new.{k}"))
    if opts.additional_merge_predicate:
        join_cond = join_cond & F.expr(opts.additional_merge_predicate)

    joined = ex.join(nw, join_cond, "full_outer")
    in_new = F.col("_dl_src_marker").isNotNull()
    in_ex = F.col("_dl_tgt_marker").isNotNull()
    matched = in_new & in_ex

    target_cols = list(existing.columns)
    src_cols = set(new.columns)
    evolved_cols = [
        c for c in new.columns if c not in target_cols and c not in opts.insert_columns_to_ignore
    ]
    out_names = target_cols + evolved_cols

    update_cols = set(opts.update_columns or [c for c in out_names if c in src_cols and c not in pks])
    delete_cond = F.expr(opts.delete_condition) if opts.delete_condition else F.lit(False)
    # Clause order is first-match-wins. An unconditional update clause would
    # shadow a configured updateExisting clause entirely, so when only
    # update_existing_condition is given the plain-update clause must not
    # fire (mirrors build_merge_sql, which omits the clause in that case).
    if opts.update_condition:
        update_cond = F.expr(opts.update_condition)
    elif opts.update_existing_condition:
        update_cond = F.lit(False)
    else:
        update_cond = F.lit(True)
    update_existing_cond = (
        F.expr(opts.update_existing_condition) if opts.update_existing_condition else F.lit(False)
    )
    insert_cond = F.expr(opts.insert_condition) if opts.insert_condition else F.lit(True)

    out_cols = []
    for c in out_names:
        ex_c = F.col(f"existing.{c}") if c in target_cols else F.lit(None)
        src_c = F.col(f"new.{c}") if c in src_cols else ex_c
        if c in opts.insert_values_override:
            ins_c = F.expr(opts.insert_values_override[c])
        elif c in src_cols and c not in opts.insert_columns_to_ignore:
            ins_c = F.col(f"new.{c}")
        else:
            ins_c = F.lit(None)
        upd_c = src_c if c in update_cols else ex_c
        out = (
            F.when(matched & update_cond, upd_c)
            .when(matched & update_existing_cond, src_c)
            .when(matched, ex_c)
            .when(in_new & insert_cond, ins_c)
            .otherwise(ex_c)
        )
        out_cols.append(out.alias(c))

    keep = ~(matched & delete_cond) & (in_ex | (in_new & insert_cond))
    return joined.where(keep).select(*out_cols)
