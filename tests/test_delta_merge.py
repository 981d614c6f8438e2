"""Execute DeltaLakeTableDataObject's real DeltaTable.merge builder path.

delta-spark is absent in this container, so these tests inject
`tests/delta_double.FakeDeltaTable` — an independent interpreter of Delta's
documented ordered-clause merge contract — in place of
`delta.tables.DeltaTable`. Everything in
`DeltaLakeTableDataObject.merge_dataframe_by_primary_key`
(smart_data_lake_spark/dataobjects/table.py:174-215) runs for real: the
options→builder-chain translation (merge condition, clause registration
order, set/values maps) matching `DeltaLakeTableDataObject.scala:400-440`.
The double raises on set/values keys outside the target schema, the same
strictness Delta applies without schema evolution.
"""

import datetime

import pytest
from pyspark.sql import Row

import smart_data_lake_spark.dataobjects.table as table_mod
from delta_double import FakeDeltaTable
from smart_data_lake_spark.actions import DeduplicateAction, HistorizeAction
from smart_data_lake_spark.config import InstanceRegistry
from smart_data_lake_spark.dataobjects import MockDataObject
from smart_data_lake_spark.dataobjects.table import DeltaLakeTableDataObject
from smart_data_lake_spark.historization import HASH_COL, HIGH_TS, TS_CAPTURED, TS_DELIMITED
from smart_data_lake_spark.plans import ActionDAG, ActionDAGRun
from smart_data_lake_spark.save_modes import SaveMode, SaveModeMergeOptions

T1 = datetime.datetime(2024, 1, 1)
T2 = datetime.datetime(2024, 2, 1)
T3 = datetime.datetime(2024, 3, 1)


@pytest.fixture()
def delta_enabled(monkeypatch):
    monkeypatch.setattr(table_mod, "_HAS_DELTA", True)
    monkeypatch.setattr(table_mod, "DeltaTable", FakeDeltaTable)
    FakeDeltaTable.executed_merges.clear()
    yield
    FakeDeltaTable.executed_merges.clear()


def _feed(spark, rows):
    return spark.createDataFrame([Row(id=i, name=n, value=v) for i, n, v in rows])


def _registry(tmp_path, spark):
    registry = InstanceRegistry()
    registry.register_data_object(MockDataObject(id="feed"))
    registry.register_data_object(
        DeltaLakeTableDataObject(
            id="hist", path=str(tmp_path / "hist"), table={"name": "hist", "primary_key": ["id"]}
        )
    )
    return registry


def _run(spark, registry, action_cls, feed_df, ref_ts, **kwargs):
    registry.get_data_object("feed")._df = feed_df.localCheckpoint(eager=True)
    action = action_cls(
        id=f"a_{ref_ts.isoformat()}",
        input_id="feed",
        output_id="hist",
        reference_timestamp=ref_ts,
        registry=registry,
        **kwargs,
    )
    state = ActionDAGRun(ActionDAG([action]), registry).run(spark)
    assert state.action_states[action.id] == "SUCCEEDED", state.errors
    return registry.get_data_object("hist").get_dataframe(spark)


def close_of(ts):
    return ts - datetime.timedelta(milliseconds=1)


def test_delta_merge_direct_clause_semantics(spark, tmp_path, delta_enabled):
    """Drive the DO's merge directly with every clause type configured."""
    do = DeltaLakeTableDataObject(
        id="t", path=str(tmp_path / "t"), table={"name": "t", "primary_key": ["id"]}
    )
    init = spark.createDataFrame(
        [(1, "keep", 1.0), (2, "upd", 2.0), (3, "del", 3.0)], "id int, name string, value double"
    )
    do.write_dataframe(init, save_mode=SaveMode.MERGE)  # initial load path
    src = spark.createDataFrame(
        [(2, "upd2", 2.5), (3, "del", -1.0), (4, "ins", 4.0), (5, "skip", 5.0)],
        "id int, name string, value double",
    )
    do.write_dataframe(
        src,
        save_mode=SaveMode.MERGE,
        merge_options=SaveModeMergeOptions(
            delete_condition="new.value < 0",
            update_condition="new.value > existing.value",
            update_columns=["value"],
            insert_condition="new.name != 'skip'",
        ),
    )
    rows = {(r.id, r.name, r.value) for r in do.get_dataframe(spark).collect()}
    assert rows == {
        (1, "keep", 1.0),   # untouched (no source match)
        (2, "upd", 2.5),    # update_columns subset: name NOT updated
        (4, "ins", 4.0),    # inserted
        # 3 deleted, 5 filtered by insert_condition
    }
    assert len(FakeDeltaTable.executed_merges) == 1
    m = FakeDeltaTable.executed_merges[0]
    assert m["matched"][0][0] == "delete"  # clause registration order preserved
    assert "existing.id <=> new.id" in m["condition"]


def expected_after_two_runs():
    return {
        (1, "a", 10.0, T1, close_of(T2)),
        (1, "a", 11.0, T2, HIGH_TS),
        (2, "b", 20.0, T1, HIGH_TS),
        (3, "c", 30.0, T1, close_of(T2)),
        (4, "d", 40.0, T2, HIGH_TS),
    }


RUN1 = [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)]
RUN2 = [(1, "a", 11.0), (2, "b", 20.0), (4, "d", 40.0)]


def test_delta_merge_mode_historize(spark, tmp_path, delta_enabled):
    """Merge-mode SCD2 through DeltaTable.merge: updateClose touches only the
    delimitation of the current version, insertNew adds the new version —
    golden result identical to the full-rewrite parquet path."""
    registry = _registry(tmp_path, spark)
    _run(spark, registry, HistorizeAction, _feed(spark, RUN1), T1, merge_mode_enable=True)
    out = _run(spark, registry, HistorizeAction, _feed(spark, RUN2), T2, merge_mode_enable=True)
    got = {tuple(r) for r in out.select("id", "name", "value", TS_CAPTURED, TS_DELIMITED).collect()}
    assert got == expected_after_two_runs()
    assert HASH_COL in out.columns
    # run 1 is the initial load (no merge); run 2 went through the builder
    assert len(FakeDeltaTable.executed_merges) == 1
    clauses = [a for (a, _c) in FakeDeltaTable.executed_merges[0]["matched"]]
    assert clauses[0] == "update"  # updateClose delimitation clause


def test_delta_merge_three_runs_history_preserved(spark, tmp_path, delta_enabled):
    registry = _registry(tmp_path, spark)
    for ts, v in [(T1, 1.0), (T2, 2.0), (T3, 3.0)]:
        out = _run(
            spark, registry, HistorizeAction, _feed(spark, [(1, "a", v)]), ts, merge_mode_enable=True
        )
    got = {tuple(r) for r in out.select("value", TS_CAPTURED, TS_DELIMITED).collect()}
    assert got == {
        (1.0, T1, close_of(T2)),
        (2.0, T2, close_of(T3)),
        (3.0, T3, HIGH_TS),
    }
    assert len(FakeDeltaTable.executed_merges) == 2


def test_delta_merge_equals_parquet_rewrite(spark, tmp_path, delta_enabled):
    """The Delta builder path and the parquet full-outer-join rewrite are the
    same merge semantics — byte-identical SCD2 output."""
    from smart_data_lake_spark.dataobjects import ParquetTableDataObject

    reg_delta = _registry(tmp_path / "d", spark)
    reg_pq = InstanceRegistry()
    reg_pq.register_data_object(MockDataObject(id="feed"))
    reg_pq.register_data_object(
        ParquetTableDataObject(
            id="hist", path=str(tmp_path / "p" / "hist"), table={"name": "hist", "primary_key": ["id"]}
        )
    )
    for reg in (reg_delta, reg_pq):
        _run(spark, reg, HistorizeAction, _feed(spark, RUN1), T1, merge_mode_enable=True)
        out = _run(spark, reg, HistorizeAction, _feed(spark, RUN2), T2, merge_mode_enable=True)
    d = reg_delta.get_data_object("hist").get_dataframe(spark)
    p = reg_pq.get_data_object("hist").get_dataframe(spark)
    cols = sorted(d.columns)
    assert sorted(p.columns) == cols
    assert d.select(*cols).exceptAll(p.select(*cols)).count() == 0
    assert p.select(*cols).exceptAll(d.select(*cols)).count() == 0
    assert len(FakeDeltaTable.executed_merges) == 1


def test_delta_merge_mode_deduplicate(spark, tmp_path, delta_enabled):
    """Merge-mode Deduplicate (keep-latest upsert) through DeltaTable.merge."""
    registry = _registry(tmp_path, spark)
    _run(
        spark, registry, DeduplicateAction,
        _feed(spark, [(1, "a", 1.0), (2, "b", 2.0)]), T1, merge_mode_enable=True,
    )
    out = _run(
        spark, registry, DeduplicateAction,
        _feed(spark, [(1, "a", 9.0), (3, "c", 3.0)]), T2, merge_mode_enable=True,
    )
    got = {(r.id, r.value, r[TS_CAPTURED]) for r in out.collect()}
    assert got == {(1, 9.0, T2), (2, 2.0, T1), (3, 3.0, T2)}
    assert len(FakeDeltaTable.executed_merges) == 1


def _make_target(spark, tmp_path, name="t"):
    do = DeltaLakeTableDataObject(
        id=name, path=str(tmp_path / name), table={"name": name, "primary_key": ["id"]}
    )
    init = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)], "id int, name string, value double"
    )
    do.write_dataframe(init, save_mode=SaveMode.MERGE)
    return do


def test_delta_nmbs_delete_and_update(spark, tmp_path, delta_enabled):
    """WHEN NOT MATCHED BY SOURCE: ordered clauses over target-only rows —
    first-match wins; rows matching no clause are kept unchanged."""
    do = _make_target(spark, tmp_path)
    src = spark.createDataFrame([(1, "a", 9.0)], "id int, name string, value double")
    target = FakeDeltaTable.forPath(spark, do.path)
    (
        target.alias("existing")
        .merge(src.alias("new"), "existing.id <=> new.id")
        .whenMatchedUpdateAll()
        .whenNotMatchedBySourceDelete(condition="existing.value > 2.5")
        .whenNotMatchedBySourceUpdate(set={"name": "concat(existing.name, '_orphan')"})
        .execute()
    )
    rows = {(r.id, r.name, r.value) for r in do.get_dataframe(spark).collect()}
    assert rows == {
        (1, "a", 9.0),          # matched, updated
        (2, "b_orphan", 2.0),   # not matched by source, delete cond false → update clause
        # 3 deleted: not matched by source, value 3.0 > 2.5, delete registered first
    }
    m = FakeDeltaTable.executed_merges[-1]
    assert m["not_matched_by_source"] == [("delete", "existing.value > 2.5"), ("update", None)]


def test_delta_nmbs_source_alias_reference_raises(spark, tmp_path, delta_enabled):
    """A NMBS set expression referencing the source alias is an error — the
    source side does not exist for these rows."""
    do = _make_target(spark, tmp_path)
    src = spark.createDataFrame([(1, "a", 9.0)], "id int, name string, value double")
    target = FakeDeltaTable.forPath(spark, do.path)
    builder = (
        target.alias("existing")
        .merge(src.alias("new"), "existing.id <=> new.id")
        .whenNotMatchedBySourceUpdate(set={"value": "new.value"})
    )
    with pytest.raises(ValueError, match="source alias"):
        builder.execute()


def test_delta_automerge_schema_evolution_star_clauses(spark, tmp_path, delta_enabled):
    """autoMerge + updateAll/insertAll widen the target by source-only
    columns; untouched target rows read NULL in the evolved column."""
    do = _make_target(spark, tmp_path)
    src = spark.createDataFrame(
        [(2, "b2", 2.5, "eu"), (4, "d", 4.0, "us")],
        "id int, name string, value double, region string",
    )
    spark.conf.set("spark.databricks.delta.schema.autoMerge.enabled", "true")
    try:
        target = FakeDeltaTable.forPath(spark, do.path)
        (
            target.alias("existing")
            .merge(src.alias("new"), "existing.id <=> new.id")
            .whenMatchedUpdateAll()
            .whenNotMatchedInsertAll()
            .execute()
        )
    finally:
        spark.conf.set("spark.databricks.delta.schema.autoMerge.enabled", "false")
    got = do.get_dataframe(spark)
    assert got.columns[-1] == "region"  # appended, source order
    rows = {(r.id, r.name, r.value, r.region) for r in got.collect()}
    assert rows == {
        (1, "a", 1.0, None),   # untouched: NULL in evolved column
        (2, "b2", 2.5, "eu"),  # updated incl. evolved column
        (3, "c", 3.0, None),
        (4, "d", 4.0, "us"),   # inserted with evolved column
    }
    assert FakeDeltaTable.executed_merges[-1]["evolved_columns"] == ["region"]


def test_delta_star_clause_extra_columns_without_automerge_raises(spark, tmp_path, delta_enabled):
    """Without autoMerge, updateAll/insertAll with source-only columns is an
    error (Delta's AnalysisException), never a silent column drop."""
    do = _make_target(spark, tmp_path)
    src = spark.createDataFrame([(4, "d", 4.0, "us")], "id int, name string, value double, region string")
    target = FakeDeltaTable.forPath(spark, do.path)
    builder = (
        target.alias("existing")
        .merge(src.alias("new"), "existing.id <=> new.id")
        .whenNotMatchedInsertAll()
    )
    with pytest.raises(ValueError, match="autoMerge"):
        builder.execute()


def test_delta_dataobject_explicit_clause_evolution(spark, tmp_path, delta_enabled):
    """allow_schema_evolution + explicit update/insert maps: the DataObject
    pre-creates missing target columns (the reference's ALTER TABLE
    workaround, DeltaLakeTableDataObject.scala:408-416) because expr clauses
    never evolve (delta-io/delta#2300)."""
    do = DeltaLakeTableDataObject(
        id="t", path=str(tmp_path / "t"),
        table={"name": "t", "primary_key": ["id"]},
        allow_schema_evolution=True,
    )
    init = spark.createDataFrame([(1, "a", 1.0), (2, "b", 2.0)], "id int, name string, value double")
    do.write_dataframe(init, save_mode=SaveMode.MERGE)
    src = spark.createDataFrame(
        [(2, "b2", 2.5, "eu"), (4, "d", 4.0, "us")],
        "id int, name string, value double, region string",
    )
    do.write_dataframe(
        src, save_mode=SaveMode.MERGE,
        merge_options=SaveModeMergeOptions(update_columns=["value", "region"]),
    )
    rows = {(r.id, r.name, r.value, r.region) for r in do.get_dataframe(spark).collect()}
    assert rows == {
        (1, "a", 1.0, None),
        (2, "b", 2.5, "eu"),   # update_columns subset: name kept, region evolved+set
        (4, "d", 4.0, "us"),   # inserted (insertAll over the widened target)
    }


def test_delta_dataobject_no_evolution_strict(spark, tmp_path, delta_enabled):
    """Same merge without allow_schema_evolution fails fast — no silent
    widening, no silent column drop."""
    do = _make_target(spark, tmp_path)
    src = spark.createDataFrame(
        [(2, "b2", 2.5, "eu")], "id int, name string, value double, region string"
    )
    with pytest.raises(ValueError):
        do.write_dataframe(
            src, save_mode=SaveMode.MERGE,
            merge_options=SaveModeMergeOptions(update_columns=["value", "region"]),
        )
