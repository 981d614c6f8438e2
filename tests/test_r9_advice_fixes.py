"""Regression tests for the round-8 driver-ADVICE findings (fixed round 9).

Each test pins one concrete failure mode the advisor identified: dead
pooled JDBC handles dropped without close() (fd leak), legacy-view-name
rewriting that also hit qualified references and string literals, the
Kaplan-Meier curve silently truncating its full-depletion final step,
root-level _SUCCESS markers left behind by partitioned zip packaging, and
duplicate index.jsonl lines on re-saved final states.
"""

from __future__ import annotations

import json
import os
import zipfile

import duckdb
import pytest
from pyspark.sql import functions as F

from smart_data_lake_spark.actions.helper import replace_legacy_view_name
from smart_data_lake_spark.dataobjects.jdbc import JdbcConnection


# ---------------------------------------------------------------------------
# ADVICE 1 — jdbc.py: dead handles detected by test_on_return / the
# test_on_borrow loop must be close()d, not just dropped (fd leak)
# ---------------------------------------------------------------------------


class _TrackingCursor:
    """DB-API double whose liveness and close() calls are observable."""

    def __init__(self, log):
        self._log = log
        self.alive = True
        self.closed = False

    def execute(self, sql):
        if not self.alive:
            raise RuntimeError("connection is dead")
        return self

    def fetchall(self):
        return [(1,)]

    def close(self):
        self.closed = True
        self._log.append(self)


def test_jdbc_dead_handle_on_return_is_closed():
    """A handle that dies while borrowed is detected by test_on_return and
    must be CLOSED (freeing the DB handle/fd), not silently dropped."""
    closed_log: list = []
    made: list[_TrackingCursor] = []

    def factory():
        c = _TrackingCursor(closed_log)
        made.append(c)
        return c

    con = JdbcConnection(
        id="jdbcCon1",
        url="jdbc:duckdb:memory",
        connection_factory=factory,
        max_parallel_connections=1,
        max_wait_time_sec=2,
        test_on_return=True,
    )
    handle = con._borrow()
    handle.alive = False  # dies while in use
    con._return(handle)
    assert handle.closed, "dead handle dropped by test_on_return was not closed"
    # capacity slot was freed: a new borrow mints a replacement
    assert con._borrow() is made[-1]


def test_jdbc_dead_idle_handle_on_borrow_is_closed():
    """A dead IDLE handle replaced by the test_on_borrow loop must be
    closed before the pool mints its replacement."""
    closed_log: list = []

    def factory():
        return _TrackingCursor(closed_log)

    con = JdbcConnection(
        id="jdbcCon1",
        url="jdbc:duckdb:memory",
        connection_factory=factory,
        max_parallel_connections=1,
        max_wait_time_sec=2,
        test_on_borrow=True,
    )
    first = con._borrow()
    con._return(first)
    first.alive = False  # kill it while idle
    second = con._borrow()
    assert second is not first
    assert first.closed, "dead idle handle discarded on borrow was not closed"
    con._return(second)


# ---------------------------------------------------------------------------
# ADVICE 2 — actions/helper.py: replace_legacy_view_name must mirror the
# reference pattern (leading \s required), so qualified references and
# string-literal occurrences are NOT rewritten
# ---------------------------------------------------------------------------


def test_replace_legacy_view_name_skips_qualified_references():
    """`db.src1` is a qualified reference to a DIFFERENT relation — the
    reference regex requires leading whitespace, so it stays untouched."""
    sql = "select * from db.src1 join src1 on db.src1.id = src1.id"
    out = replace_legacy_view_name(sql, "src1_sdltemp")
    assert "db.src1_sdltemp" not in out
    assert " src1_sdltemp on" in out
    # the bare qualified column reference src1.id (preceded by space,
    # followed by '.') IS rewritten — exactly like the reference's
    # "select src1.* from src1" scenario
    assert out.endswith("= src1_sdltemp.id")


def test_replace_legacy_view_name_requires_leading_whitespace():
    """Occurrences glued to other tokens (string literals, prefixed
    identifiers) lack the leading whitespace and are not rewritten."""
    assert (
        replace_legacy_view_name("select 'xsrc1' from src1", "src1_sdltemp")
        == "select 'xsrc1' from src1_sdltemp"
    )
    assert (
        replace_legacy_view_name("select * from mysrc1", "src1_sdltemp")
        == "select * from mysrc1"
    )


# ---------------------------------------------------------------------------
# ADVICE 3 — analytics.py: survival curve keeps the full-depletion step
# with km_survival = 0 instead of dropping the row
# ---------------------------------------------------------------------------


def test_survival_curve_keeps_full_depletion_step(spark):
    """Corpus where EVERY user converts, last one on the curve's final day:
    at that step n_risk == d, Kaplan-Meier survival is defined and equals
    0 — the row must be present, not truncated (r8 ADVICE)."""
    from smart_data_lake_spark.functions.analytics import survival_hazard_curve

    rows = []
    # three users sign up at t=0; convert on day 0, 1, 2 (86400s apart)
    for uid, day in [(1, 0), (2, 1), (3, 2)]:
        rows.append((uid, "signup", 0.0))
        rows.append((uid, "purchase", float(day * 86400)))
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts double")
    out = survival_hazard_curve(df).collect()
    days = [r["days_since_signup"] for r in out]
    assert days == [0, 1, 2], f"final depletion step missing: {days}"
    last = out[-1]
    assert last["n_at_risk"] == 1 and last["n_converted"] == 1
    assert last["km_survival"] == 0.0
    # cumulative hazard at depletion is finite: 1/3 + 1/2 + 1/1
    assert last["cum_hazard"] == pytest.approx(1 / 3 + 1 / 2 + 1.0, abs=1e-6)
    # earlier steps keep their exact KM values
    assert out[0]["km_survival"] == pytest.approx(2 / 3, abs=1e-6)
    assert out[1]["km_survival"] == pytest.approx(1 / 3, abs=1e-6)


# ---------------------------------------------------------------------------
# ADVICE 4 — file.py: partitioned zip packaging cleans the dataset-root
# _SUCCESS marker, not only the per-partition ones
# ---------------------------------------------------------------------------


def test_partitioned_zip_removes_root_success_marker(spark, tmp_path):
    from smart_data_lake_spark.dataobjects.file import CsvFileDataObject

    do = CsvFileDataObject(
        id="zipped",
        path=str(tmp_path / "out"),
        filename="data.csv.zip",
        partitions=["p"],
    )
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, p string")
    do.write_dataframe(df)
    root_files = os.listdir(tmp_path / "out")
    assert "_SUCCESS" not in root_files, root_files
    # the per-partition archives exist and hold the data
    for part in ("p=a", "p=b"):
        names = os.listdir(tmp_path / "out" / part)
        assert "data.csv.zip" in names, names
        with zipfile.ZipFile(tmp_path / "out" / part / "data.csv.zip") as zf:
            assert zf.namelist() == ["data.csv"]


# ---------------------------------------------------------------------------
# ADVICE 5 — plans/dag.py: re-saving the same final state must not
# duplicate its index.jsonl line
# ---------------------------------------------------------------------------


def test_state_index_resave_is_idempotent(tmp_path):
    from smart_data_lake_spark.plans.dag import RunState, StateStore

    store = StateStore(str(tmp_path), app_name="test")
    store.save(RunState(run_id=1, attempt_id=1, is_final=True, action_states={"a": "SUCCEEDED"}))
    store.save(RunState(run_id=1, attempt_id=1, is_final=True, action_states={"a": "SUCCEEDED"}))
    store.save(RunState(run_id=2, attempt_id=1, is_final=True, action_states={"b": "FAILED"}))
    # re-save of run 2 with UPDATED content rewrites its line in place
    store.save(RunState(run_id=2, attempt_id=1, is_final=True, action_states={"b": "SUCCEEDED"}))
    lines = [
        json.loads(ln)
        for ln in (tmp_path / "index.jsonl").read_text().splitlines()
    ]
    assert [(e["run_id"], e["action_states"]) for e in lines] == [
        (1, {"a": "SUCCEEDED"}),
        (2, {"b": "SUCCEEDED"}),
    ]
