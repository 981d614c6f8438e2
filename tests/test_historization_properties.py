"""Property-based SCD2 invariants for `full_historize` — FULL-SNAPSHOT
semantics (each feed is the complete current state; absent keys are
implicit deletes, Historization.scala:62-144). Random capture sequences
must always satisfy:

  I1  exactly one OPEN row per key present in the FINAL snapshot; zero open
      rows for keys absent from it (closed by the implicit delete)
  I2  per key, validity intervals never overlap; gaps exist exactly where
      the key was absent from intermediate snapshots
  I3  each key's open row carries its final snapshot value
  I4  replaying the final snapshot unchanged is a no-op (idempotence)
  I5  rows per key == number of version starts (appearance, reappearance,
      or value change while present)

Golden tests (`test_historization.py`) pin exact frames; these properties
cover delete/reappear sequences the goldens cannot enumerate.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st
from pyspark.sql import Row

from smart_data_lake_spark.historization import HIGH_TS, full_historize

# tiny domains force collisions: 3 keys, 3 possible values per capture step
_step = st.dictionaries(
    st.integers(min_value=0, max_value=2),  # key
    st.integers(min_value=0, max_value=2),  # value
    min_size=0,
    max_size=3,
)


def _run_sequence(spark, steps):
    """Run the snapshots; model expected state under full-feed semantics."""
    history = None
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    open_vals: dict[int, int] = {}   # keys currently open -> value
    versions: dict[int, int] = {}    # key -> number of version starts
    ever: set[int] = set()
    for i, step in enumerate(steps):
        if not step:
            continue
        ref_ts = t0 + dt.timedelta(hours=i)
        new = spark.createDataFrame(
            [Row(id=k, v=f"v{val}") for k, val in sorted(step.items())],
            "id int, v string",
        )
        history = full_historize(history, new, ["id"], ref_ts)
        for k in list(open_vals):
            if k not in step:
                del open_vals[k]  # implicit delete closes the row
        for k, val in step.items():
            if k not in open_vals or open_vals[k] != val:
                versions[k] = versions.get(k, 0) + 1  # new version starts
            open_vals[k] = val
            ever.add(k)
    return history, open_vals, versions, ever


@settings(max_examples=20, deadline=None)
@given(st.lists(_step, min_size=1, max_size=5))
def test_scd2_structural_invariants(spark, steps):
    history, open_vals, versions, ever = _run_sequence(spark, steps)
    if history is None:
        return
    rows = sorted(
        (r["id"], r["dl_ts_captured"], r["dl_ts_delimited"], r["v"])
        for r in history.collect()
    )
    by_key: dict[int, list] = {}
    for k, vf, vt, v in rows:
        by_key.setdefault(k, []).append((vf, vt, v))

    assert set(by_key) == ever  # every key ever captured has history
    for k, intervals in by_key.items():
        intervals.sort()
        open_rows = [iv for iv in intervals if iv[1] == HIGH_TS]
        # I1: one open row iff the key survived the final snapshot
        assert len(open_rows) == (1 if k in open_vals else 0), (k, intervals)
        # I3: the open row carries the final value
        if k in open_vals:
            assert open_rows[0][2] == f"v{open_vals[k]}"
        # I2: intervals never overlap (gaps legal across deleted spans)
        for (_f1, t1, _), (f2, _t2, _) in zip(intervals, intervals[1:]):
            assert t1 < f2, (k, intervals)
        # I5: one row per version start (appear/reappear/value change)
        assert len(intervals) == versions[k], (k, intervals)


@settings(max_examples=10, deadline=None)
@given(st.lists(_step, min_size=1, max_size=3))
def test_scd2_idempotent_rerun(spark, steps):
    history, latest, _versions, _ever = _run_sequence(spark, steps)
    if history is None or not latest:
        return
    # replay the final snapshot again at a later ref_ts: no new versions
    replay = spark.createDataFrame(
        [Row(id=k, v=f"v{val}") for k, val in sorted(latest.items())],
        "id int, v string",
    )
    again = full_historize(
        history, replay, ["id"], dt.datetime(2024, 2, 1, 12, 0, 0)
    )
    a = sorted(map(tuple, history.collect()))
    b = sorted(map(tuple, again.collect()))
    assert a == b
