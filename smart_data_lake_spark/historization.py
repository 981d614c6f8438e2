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
# dummy col needed in the CDC merge join condition so insertNew rows never
# match existing records (Historization.scala historizeDummyColName)
DUMMY_COL = "dl_dummy"

OP_INSERT_NEW = "insertNew"
OP_UPDATE_CLOSE = "updateClose"
OP_UPDATE_EXISTING = "updateExisting"


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

    Output carries `dl_operation` in {updateClose, insertNew, updateExisting}
    + the SCD2 columns; feed it to a table DO's MERGE with the options built
    by `build_incremental_merge_options`. Crucially, updateClose rows carry
    the EXISTING version's dl_ts_captured (Historization.scala:225-228) so the
    merge join predicate `new.dl_ts_captured = existing.dl_ts_captured`
    matches exactly the current version row, while insertNew rows (captured =
    ref_ts) match nothing and insert. With `dl_hash` persisted, the existing
    side of the join projects only (pks, captured, dl_hash) — minimal scan at
    100 TB. Keys present in existing but missing from the feed are closed
    (updateClose), matching fullHistorize's delete semantics.
    """
    close_ts = ref_ts - datetime.timedelta(milliseconds=1)
    attr = _attr_cols(new_data, pks)

    new_df = new_data.withColumn(HASH_COL, attribute_hash(new_data, attr))

    if existing_current is None:
        return new_df.select(
            *pks,
            *attr,
            F.col(HASH_COL),
            F.lit(OP_INSERT_NEW).alias(OPERATION_COL),
            F.lit(ref_ts).alias(TS_CAPTURED),
            F.lit(high_ts).alias(TS_DELIMITED),
        )

    existing_has_hash = HASH_COL in existing_current.columns
    if not existing_has_hash:
        ex_attr = _attr_cols(existing_current, pks)
        existing_current = existing_current.withColumn(HASH_COL, attribute_hash(existing_current, ex_attr))
    ex = existing_current.select(
        *pks,
        F.col(TS_CAPTURED).alias("_ex_captured"),
        F.col(TS_DELIMITED).alias("_ex_delimited"),
        F.col(HASH_COL).alias("_ex_hash"),
    )

    joined = ex.join(new_df, pks, "full_outer")
    ex_hash = F.col("_ex_hash")
    new_hash = F.col(HASH_COL)
    ops = (
        # changed → close existing version + insert new version
        F.when(
            ex_hash.isNotNull() & new_hash.isNotNull() & (ex_hash != new_hash),
            F.array(F.lit(OP_UPDATE_CLOSE), F.lit(OP_INSERT_NEW)),
        )
        # new key → insert
        .when(ex_hash.isNull() & new_hash.isNotNull(), F.array(F.lit(OP_INSERT_NEW)))
        # key missing from feed → close existing version
        .when(ex_hash.isNotNull() & new_hash.isNull(), F.array(F.lit(OP_UPDATE_CLOSE)))
    )
    # unchanged keys where the existing table lacks dl_hash → backfill the
    # hash via updateExisting (Historization.scala:217-219 case 4)
    if not existing_has_hash:
        ops = ops.when(
            ex_hash.isNotNull() & new_hash.isNotNull() & (ex_hash == new_hash),
            F.array(F.lit(OP_UPDATE_EXISTING)),
        )
    exploded = (
        joined.withColumn("_ops", ops)
        .where(F.col("_ops").isNotNull())
        .withColumn(OPERATION_COL, F.explode("_ops"))
    )
    op = F.col(OPERATION_COL)
    return exploded.select(
        *pks,
        *attr,
        F.col(HASH_COL),
        op,
        F.when(op == OP_INSERT_NEW, F.lit(ref_ts)).otherwise(F.col("_ex_captured")).alias(TS_CAPTURED),
        F.when(op == OP_INSERT_NEW, F.lit(high_ts))
        .when(op == OP_UPDATE_CLOSE, F.lit(close_ts))
        .otherwise(F.col("_ex_delimited"))
        .alias(TS_DELIMITED),
    )


def build_incremental_merge_options(
    existing_has_hash: bool,
    additional_join_predicate: str | None = None,
):
    """Merge options pairing `incremental_historize_ops` output with a table
    DO's MERGE (HistorizeAction.scala:152-161 initSaveModeOptions):
    updateClose updates only the delimitation (+hash backfill), insertNew
    inserts, and the join predicate pins the current version via captured-ts
    equality so historical versions are never touched."""
    from smart_data_lake_spark.save_modes import SaveModeMergeOptions

    update_cols = [TS_DELIMITED] if existing_has_hash else [TS_DELIMITED, HASH_COL]
    preds = [f"new.{TS_CAPTURED} = existing.{TS_CAPTURED}"]
    if additional_join_predicate:
        preds.append(additional_join_predicate)
    return SaveModeMergeOptions(
        update_condition=f"{OPERATION_COL} = '{OP_UPDATE_CLOSE}'",
        update_columns=update_cols,
        update_existing_condition=f"{OPERATION_COL} = '{OP_UPDATE_EXISTING}'",
        insert_condition=f"{OPERATION_COL} = '{OP_INSERT_NEW}'",
        insert_columns_to_ignore=[OPERATION_COL],
        additional_merge_predicate=" and ".join(preds),
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

    ops = F.when(is_deleted, F.array(F.lit(OP_UPDATE_CLOSE))).otherwise(
        F.array(F.lit(OP_UPDATE_CLOSE), F.lit(OP_INSERT_NEW))
    )
    exploded = new_data.withColumn("_ops", ops).withColumn(OPERATION_COL, F.explode("_ops")).drop("_ops")
    op = F.col(OPERATION_COL)
    return exploded.select(
        *pks,
        *attr,
        op,
        # dummy col steers the merge join: updateClose rows (true) match the
        # current existing version, insertNew rows (false) never match and
        # insert (Historization.scala:278-280)
        F.when(op == OP_INSERT_NEW, F.lit(False)).otherwise(F.lit(True)).alias(DUMMY_COL),
        # captured not needed for updateClose — the join pins the current
        # version via `ref_ts BETWEEN existing.captured AND existing.delimited`
        F.when(op == OP_INSERT_NEW, F.lit(ref_ts)).otherwise(F.lit(None).cast("timestamp")).alias(
            TS_CAPTURED
        ),
        F.when(op == OP_UPDATE_CLOSE, F.lit(close_ts)).otherwise(F.lit(high_ts)).alias(TS_DELIMITED),
    )


def build_cdc_merge_options(
    cdc_column: str,
    ref_ts: datetime.datetime,
    additional_join_predicate: str | None = None,
):
    """Merge options for `incremental_cdc_historize_ops`
    (HistorizeAction.scala:140-150 initSaveModeOptions, CDC branch)."""
    from smart_data_lake_spark.save_modes import SaveModeMergeOptions

    preds = [
        f"existing.{DUMMY_COL} = new.{DUMMY_COL}",
        f"timestamp'{ref_ts.isoformat(sep=' ')}' between existing.{TS_CAPTURED} and existing.{TS_DELIMITED}",
    ]
    if additional_join_predicate:
        preds.append(additional_join_predicate)
    return SaveModeMergeOptions(
        update_condition=f"{OPERATION_COL} = '{OP_UPDATE_CLOSE}'",
        update_columns=[TS_DELIMITED],
        insert_condition=f"{OPERATION_COL} = '{OP_INSERT_NEW}'",
        insert_columns_to_ignore=[OPERATION_COL, cdc_column],
        insert_values_override={DUMMY_COL: "true"},
        additional_merge_predicate=" and ".join(preds),
    )


def keep_latest(df: DataFrame, pks: list[str], order_cols: list) -> DataFrame:
    """Core keep-latest primitive (DeduplicateAction.scala:214-219): one row
    per PK, the first under `order_cols` (descending-capture order plus
    tie-breakers). One shuffle on the PK; row_number is whole-stage codegen'd.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*pks).orderBy(*order_cols)
    return df.withColumn("_dl_rn", F.row_number().over(w)).where(F.col("_dl_rn") == 1).drop("_dl_rn")


def historize_event_log(
    df: DataFrame,
    pks: list[str],
    state_cols: list[str],
    ts_col: str,
    tiebreaker_cols: list[str] | None = None,
    high_ts: datetime.datetime = HIGH_TS,
) -> DataFrame:
    """Derive an SCD2 history directly from an ordered change log: one version
    row per (pk, state) change with dl_ts_captured / dl_ts_delimited
    (TechnicalTableColumn.scala:28,33).

    Equivalent to replaying every event timestamp as a `full_historize`
    snapshot feed (tested for equality in tests/), but computed in two window
    passes with a single shuffle on the PK — the 100 TB-friendly formulation
    of "historize a CDC stream in batch".
    """
    from pyspark.sql import Window

    order = [ts_col] + list(tiebreaker_cols or [])
    w = Window.partitionBy(*pks).orderBy(*order)
    state = F.struct(*[F.col(c) for c in state_cols])
    changes = (
        df.withColumn("_prev_state", F.lag(state).over(w))
        .where(F.col("_prev_state").isNull() | ~F.col("_prev_state").eqNullSafe(state))
        .drop("_prev_state")
    )
    w2 = Window.partitionBy(*pks).orderBy(*order)
    return changes.select(
        *pks,
        *state_cols,
        F.col(ts_col).alias(TS_CAPTURED),
        F.coalesce(F.lead(ts_col).over(w2), F.lit(high_ts)).alias(TS_DELIMITED),
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
    return keep_latest(unioned, pks, [F.col(TS_CAPTURED).desc()])


def snapshot_as_of(hist: DataFrame, as_of, pks: list[str] | None = None) -> DataFrame:
    """Time-travel over an SCD2 history: the state of every key at instant
    `as_of` — rows whose validity interval contains it
    (dl_ts_captured <= as_of < dl_ts_delimited, the half-open convention
    the historizer writes). The read-side complement of HistorizeAction
    (reference HistorizationTestUtils replays snapshots to BUILD history;
    this reconstructs any snapshot FROM it), and what an auditor or a
    point-in-time feature join actually asks the history table for.

    Pure partition-prunable filter — no window, no join: on a history table
    partitioned by capture date this touches only partitions overlapping
    `as_of`'s past, and Catalyst pushes both timestamp predicates to the
    scan. `pks` is accepted only to assert the caller's key expectation in
    tests; the filter itself needs no keys because SCD2 validity intervals
    are disjoint per key by construction."""
    ts = F.lit(as_of).cast("timestamp")
    return hist.where((F.col(TS_CAPTURED) <= ts) & (F.col(TS_DELIMITED) > ts))
