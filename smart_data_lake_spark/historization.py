"""SCD2 historization algorithms.

Reference: `util/historization/Historization.scala` — fullHistorize (:62-144),
incrementalHistorize (:175-238, emits per-row operation arrays exploded into a
MERGE), incrementalCDCHistorize (:256-292, derives ops from a CDC delete flag
with no join against existing data — the cheapest variant at scale).

Technical columns (definitions/TechnicalTableColumn.scala:28,33):
  dl_ts_captured  — valid-from
  dl_ts_delimited — valid-to, HIGH_TS (9999-12-31) for current rows.

Change detection uses a null-safe comparison of the attribute struct; an
optional xxhash64 `dl_hash` column is supported for merge mode, mirroring the
reference's claim that the hash minimises data transfer
(Historization.scala:167-173): with a stored hash, the merge join only needs
(pk, dl_hash) from the existing table instead of every attribute column.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TS_CAPTURED = "dl_ts_captured"
TS_DELIMITED = "dl_ts_delimited"
HIGH_TS = datetime.datetime(9999, 12, 31, 0, 0, 0)
OPERATION_COL = "dl_operation"
HASH_COL = "dl_hash"


def _attr_cols(df: DataFrame, pks: list[str], ignore: list[str] | None = None) -> list[str]:
    drop = set(pks) | {TS_CAPTURED, TS_DELIMITED, OPERATION_COL, HASH_COL} | set(ignore or [])
    return [c for c in df.columns if c not in drop]


def attribute_hash(df: DataFrame, attr_cols: list[str]):
    """xxhash64 over the sorted attribute struct (Historization.scala:371's
    udfHashRow rebuilt on a JVM built-in — no Python boundary)."""
    return F.xxhash64(F.struct(*[F.col(c) for c in sorted(attr_cols)]))


def full_historize(
    existing_history: DataFrame | None,
    new_data: DataFrame,
    pks: list[str],
    ref_ts: datetime.datetime,
    high_ts: datetime.datetime = HIGH_TS,
) -> DataFrame:
    """Full SCD2 rebuild (Historization.fullHistorize, Historization.scala:62-144).

    Join NEW against CURRENT history rows on PKs (full outer) and emit:
      unchanged        → keep current row
      changed          → close current (valid-to = ref_ts - 1ms) + insert new
      new key          → insert new version
      deleted key      → close current
      closed history   → pass through untouched

    One shuffle on the PKs; Catalyst broadcasts the smaller side when it fits.
    """
    spark = new_data.sparkSession
    close_ts = ref_ts - datetime.timedelta(milliseconds=1)
    attr = _attr_cols(new_data, pks)

    new_df = new_data.select(
        *pks,
        *attr,
        F.lit(ref_ts).alias(TS_CAPTURED),
        F.lit(high_ts).alias(TS_DELIMITED),
    )

    if existing_history is None:
        return new_df

    current = existing_history.where(F.col(TS_DELIMITED) == F.lit(high_ts))
    closed = existing_history.where(F.col(TS_DELIMITED) != F.lit(high_ts))

    n = new_df.alias("n")
    c = current.alias("c")
    join_cond = F.lit(True)
    for k in pks:
        join_cond = join_cond & F.col(f"n.{k}").eqNullSafe(F.col(f"c.{k}"))
    joined = c.join(n, join_cond, "full_outer")

    in_new = F.col(f"n.{TS_CAPTURED}").isNotNull()
    in_cur = F.col(f"c.{TS_CAPTURED}").isNotNull()
    changed = ~F.struct(*[F.col(f"n.{a}") for a in sorted(attr)]).eqNullSafe(
        F.struct(*[F.col(f"c.{a}") for a in sorted(attr)])
    )

    out_cols = pks + attr + [TS_CAPTURED, TS_DELIMITED]

    def pick(side: str, ts_delimited=None):
        cols = [F.col(f"{side}.{c_}").alias(c_) for c_ in pks + attr + [TS_CAPTURED]]
        cols.append(
            (F.lit(ts_delimited) if ts_delimited is not None else F.col(f"{side}.{TS_DELIMITED}")).alias(
                TS_DELIMITED
            )
        )
        return cols

    unchanged = joined.where(in_new & in_cur & ~changed).select(*pick("c"))
    closed_changed = joined.where(in_new & in_cur & changed).select(*pick("c", close_ts))
    inserted_changed = joined.where(in_new & in_cur & changed).select(*pick("n"))
    inserted_new = joined.where(in_new & ~in_cur).select(*pick("n"))
    closed_deleted = joined.where(~in_new & in_cur).select(*pick("c", close_ts))

    result = unchanged
    for part in (closed_changed, inserted_changed, inserted_new, closed_deleted, closed.select(*out_cols)):
        result = result.unionByName(part)
    return result


def incremental_historize_ops(
    existing_current: DataFrame | None,
    new_data: DataFrame,
    pks: list[str],
    ref_ts: datetime.datetime,
    high_ts: datetime.datetime = HIGH_TS,
) -> DataFrame:
    """Incremental SCD2: join only CURRENT records, emit one row per required
    merge operation (Historization.incrementalHistorize, Historization.scala:175-238).

    Output carries `dl_operation` in {updateClose, insertNew} + the SCD2
    columns; feed it to a table DO's MERGE (whenMatchedUpdate on updateClose,
    insert on insertNew). With `dl_hash` persisted, the existing side of the
    join projects only (pks, dl_hash) — minimal scan at 100 TB.
    """
    close_ts = ref_ts - datetime.timedelta(milliseconds=1)
    attr = _attr_cols(new_data, pks)

    new_df = new_data.withColumn(HASH_COL, attribute_hash(new_data, attr))

    if existing_current is None:
        return new_df.select(
            *pks,
            *attr,
            F.col(HASH_COL),
            F.lit("insertNew").alias(OPERATION_COL),
            F.lit(ref_ts).alias(TS_CAPTURED),
            F.lit(high_ts).alias(TS_DELIMITED),
        )

    if HASH_COL not in existing_current.columns:
        ex_attr = _attr_cols(existing_current, pks)
        existing_current = existing_current.withColumn(HASH_COL, attribute_hash(existing_current, ex_attr))
    ex = existing_current.select(*pks, F.col(HASH_COL).alias("dl_hash_existing"))

    joined = new_df.join(ex, pks, "left_outer")
    is_new = F.col("dl_hash_existing").isNull()
    is_changed = ~is_new & (F.col(HASH_COL) != F.col("dl_hash_existing"))

    ops = F.when(is_new, F.array(F.lit("insertNew"))).when(
        is_changed, F.array(F.lit("updateClose"), F.lit("insertNew"))
    )
    exploded = (
        joined.withColumn("_ops", ops)
        .where(F.col("_ops").isNotNull())
        .withColumn(OPERATION_COL, F.explode("_ops"))
        .drop("_ops", "dl_hash_existing")
    )
    return exploded.select(
        *pks,
        *attr,
        F.col(HASH_COL),
        F.col(OPERATION_COL),
        F.lit(ref_ts).alias(TS_CAPTURED),
        F.when(F.col(OPERATION_COL) == "updateClose", F.lit(close_ts))
        .otherwise(F.lit(high_ts))
        .alias(TS_DELIMITED),
    )


def incremental_cdc_historize_ops(
    new_data: DataFrame,
    pks: list[str],
    cdc_column: str,
    cdc_deleted_value: str,
    ref_ts: datetime.datetime,
    high_ts: datetime.datetime = HIGH_TS,
) -> DataFrame:
    """CDC variant: no join with existing data at all
    (Historization.incrementalCDCHistorize, Historization.scala:256-292;
    HistorizeAction.scala:54-56 calls this "optimal from a performance
    perspective"). Deletes close the current version; upserts close-and-insert.
    """
    close_ts = ref_ts - datetime.timedelta(milliseconds=1)
    attr = _attr_cols(new_data, pks, ignore=[cdc_column])
    is_deleted = F.col(cdc_column) == F.lit(cdc_deleted_value)

    ops = F.when(is_deleted, F.array(F.lit("updateClose"))).otherwise(
        F.array(F.lit("updateClose"), F.lit("insertNew"))
    )
    exploded = new_data.withColumn("_ops", ops).withColumn(OPERATION_COL, F.explode("_ops")).drop("_ops")
    return exploded.select(
        *pks,
        *attr,
        F.col(OPERATION_COL),
        F.lit(ref_ts).alias(TS_CAPTURED),
        F.when(F.col(OPERATION_COL) == "updateClose", F.lit(close_ts))
        .otherwise(F.lit(high_ts))
        .alias(TS_DELIMITED),
    )


def deduplicate_keep_latest(
    existing: DataFrame | None,
    new_data: DataFrame,
    pks: list[str],
    ref_ts: datetime.datetime,
    update_captured_only_when_changed: bool = False,
) -> DataFrame:
    """Keep latest record per PK across existing ∪ new
    (DeduplicateAction core algo, DeduplicateAction.scala:214-219):
    unionByName then row_number over (pk order by dl_ts_captured desc) == 1.
    """
    from pyspark.sql import Window

    new_df = new_data.withColumn(TS_CAPTURED, F.lit(ref_ts))
    if existing is None:
        return new_df.dropDuplicates(pks)

    if update_captured_only_when_changed:
        # keep the old capture-ts for unchanged rows so downstream incremental
        # consumers don't see spurious updates
        attr = _attr_cols(new_data, pks)
        ex = existing.alias("e")
        nw = new_df.alias("nw")
        unchanged_keys = (
            nw.join(ex, pks)
            .where(
                F.struct(*[F.col(f"nw.{a}") for a in sorted(attr)]).eqNullSafe(
                    F.struct(*[F.col(f"e.{a}") for a in sorted(attr)])
                )
            )
            .select(*[F.col(f"nw.{k}") for k in pks])
        )
        new_df = new_df.join(unchanged_keys, pks, "left_anti")

    unioned = existing.unionByName(new_df, allowMissingColumns=True)
    w = Window.partitionBy(*pks).orderBy(F.col(TS_CAPTURED).desc())
    return unioned.withColumn("_dl_rn", F.row_number().over(w)).where(F.col("_dl_rn") == 1).drop("_dl_rn")
