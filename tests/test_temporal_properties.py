"""Property-based as-of join: the one-shuffle union-window implementation
must equal an O(n·m) brute-force reference on random keyed/timestamped data —
including duplicate timestamps, empty sides, keys present on one side only,
and both strict/non-strict tie semantics.

The brute force is plain Python (the obviously-correct spec); hypothesis
drives the shapes. One Spark job per example is slow, so examples are few
but each carries dense collision-heavy data (tiny key/time domains)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import Row

from smart_data_lake_spark.functions.temporal import as_of_join

# tiny domains force collisions: few keys, few timestamps, duplicate ts rows
_key = st.integers(min_value=0, max_value=2)
_ts = st.integers(min_value=0, max_value=6)
_left_rows = st.lists(st.tuples(_key, _ts), min_size=0, max_size=8)
_right_rows = st.lists(st.tuples(_key, _ts), min_size=0, max_size=8)


def _brute_force(left, right, strict):
    """For each left (k, ts): the right row with max (ts, rid) such that
    r.ts < ts (strict) or r.ts <= ts (non-strict), same key."""
    out = []
    for (lk, lt), lid in left:
        best = None
        for (rk, rt), rid in right:
            if rk != lk:
                continue
            if (rt < lt) if strict else (rt <= lt):
                cand = (rt, rid)
                if best is None or cand > best:
                    best = cand
        out.append((lid, best[1] if best else None))
    return sorted(out)


@settings(max_examples=25, deadline=None)
@given(_left_rows, _right_rows, st.booleans())
def test_as_of_join_equals_brute_force(spark, lrows, rrows, strict):
    left = [((k, t), i) for i, (k, t) in enumerate(lrows)]
    right = [((k, t), 100 + i) for i, (k, t) in enumerate(rrows)]
    if not left:
        return  # nothing to assert
    ldf = spark.createDataFrame(
        [Row(k=k, ts=t, lid=i) for (k, t), i in left], "k int, ts int, lid int"
    )
    rdf = spark.createDataFrame(
        [Row(k=k, ts=t, rid=i) for (k, t), i in right] or [Row(k=0, ts=0, rid=0)],
        "k int, ts int, rid int",
    )
    if not right:
        rdf = rdf.where("1=0")
    got = as_of_join(
        ldf, rdf, on=["k"], right_cols=["rid"], right_order_col="rid", strict=strict
    )
    got_pairs = sorted((r["lid"], r["rid_asof"]) for r in got.collect())
    assert got_pairs == _brute_force(left, right, strict)
