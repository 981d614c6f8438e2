"""Known-value unit tests for the r10 operators (below-the-window, r11
rotation queue): Mann-Whitney U, Welch t, hour-profile HHI, last-touch
attribution, PSI drift, triangle counting, source divergence."""

from __future__ import annotations

import datetime as dt
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, user_id long, value double"
    )


BASE = dt.datetime(2024, 1, 1)


def test_mann_whitney_known_value(spark):
    """Hand-checked: variant0 = {1,2,3}, variant1 = {4,5,6} → U1 = 9
    (complete separation), rank-biserial = 1."""
    from smart_data_lake_spark.functions.analytics import mann_whitney_u_by_variant

    rows = [
        (i, BASE, "t", u, float(v))
        for i, (u, v) in enumerate([(0, 1), (2, 2), (4, 3), (1, 4), (3, 5), (5, 6)])
    ]
    out = mann_whitney_u_by_variant(_ev(spark, rows)).collect()[0]
    assert out["n_control"] == 3 and out["n_treatment"] == 3
    assert out["u1"] == 9.0
    assert out["rank_biserial"] == 1.0
    # no ties: z = (U - 4.5) / sqrt(9*7/12)
    assert abs(out["z_score"] - (9 - 4.5) / math.sqrt(9 * 7 / 12)) < 1e-6


def test_mann_whitney_all_tied(spark):
    """Every value equal: U1 = n1·n0/2, effect 0, z NULL (variance 0)."""
    from smart_data_lake_spark.functions.analytics import mann_whitney_u_by_variant

    rows = [(i, BASE, "t", i, 7.0) for i in range(6)]
    out = mann_whitney_u_by_variant(_ev(spark, rows)).collect()[0]
    assert out["u1"] == 4.5
    assert out["rank_biserial"] == 0.0
    assert out["z_score"] is None


def test_welch_t_known_value(spark):
    from smart_data_lake_spark.functions.analytics import welch_t_by_variant

    # variant0: 1,2,3 (mean 2, var 1); variant1: 5,7,9 (mean 7, var 4)
    rows = [
        (i, BASE, "t", u, float(v))
        for i, (u, v) in enumerate([(0, 1), (2, 2), (4, 3), (1, 5), (3, 7), (5, 9)])
    ]
    out = welch_t_by_variant(_ev(spark, rows)).collect()[0]
    assert out["mean_control"] == 2.0 and out["mean_treatment"] == 7.0
    se2 = 1 / 3 + 4 / 3
    assert abs(out["welch_t"] - 5 / math.sqrt(se2)) < 1e-6
    dof = se2**2 / ((1 / 3) ** 2 / 2 + (4 / 3) ** 2 / 2)
    assert abs(out["welch_df"] - dof) < 1e-5


def test_hour_profile_known_value(spark):
    from smart_data_lake_spark.functions.analytics import hour_profile_by_group

    # 3 events at hour 0, 1 at hour 5: peak hour 0, share .75,
    # HHI = (9 + 1) / 16
    rows = [
        (0, BASE, "t", 0, 1.0),
        (1, BASE + dt.timedelta(minutes=10), "t", 0, 1.0),
        (2, BASE + dt.timedelta(minutes=20), "t", 0, 1.0),
        (3, BASE + dt.timedelta(hours=5), "t", 0, 1.0),
    ]
    out = hour_profile_by_group(_ev(spark, rows)).collect()[0]
    assert out["peak_hour"] == 0 and out["n_events"] == 4
    assert out["peak_share"] == 0.75
    assert out["hhi"] == 0.625
    # peak tie breaks to the EARLIEST hour
    rows2 = rows[:2] + [(5, BASE + dt.timedelta(hours=5, minutes=1), "t", 0, 1.0)]
    out2 = hour_profile_by_group(_ev(spark, rows2)).collect()[0]
    assert out2["peak_hour"] == 0


def test_last_touch_attribution(spark):
    from smart_data_lake_spark.functions.analytics import last_touch_attribution

    rows = [
        # user 0: view → click → purchase (credit: click)
        (0, BASE, "view", 0, None),
        (1, BASE + dt.timedelta(hours=1), "click", 0, None),
        (2, BASE + dt.timedelta(hours=2), "purchase", 0, 10.0),
        # user 1: view then purchase 8 days later (outside 7d window)
        (3, BASE, "view", 1, None),
        (4, BASE + dt.timedelta(days=8), "purchase", 1, 5.0),
        # user 2: purchase with no prior events at all
        (5, BASE, "purchase", 2, 3.0),
    ]
    out = {r["touch_type"]: r for r in last_touch_attribution(_ev(spark, rows)).collect()}
    assert out["click"]["n_conversions"] == 1
    assert out["click"]["credited_value"] == 10.0
    assert out["(unattributed)"]["n_conversions"] == 2
    assert abs(out["click"]["share"] - 1 / 3) < 1e-6


def test_psi_drift_detects_shift(spark):
    from smart_data_lake_spark.functions.analytics import psi_value_drift_by_group

    # first half clustered low, second half clustered high → large PSI;
    # a stable group stays near zero
    rows = []
    for i in range(50):
        rows.append((i, BASE + dt.timedelta(minutes=i), "shifted", 0, 1.0 + (i % 5) * 0.01))
        rows.append((1000 + i, BASE + dt.timedelta(days=10, minutes=i), "shifted", 0, 9.0 + (i % 5) * 0.01))
        rows.append((2000 + i, BASE + dt.timedelta(minutes=i), "stable", 0, float(i % 10)))
        rows.append((3000 + i, BASE + dt.timedelta(days=10, minutes=i), "stable", 0, float(i % 10)))
    out = {r["event_type"]: r for r in psi_value_drift_by_group(_ev(spark, rows)).collect()}
    assert out["shifted"]["psi"] > 1.0
    assert out["stable"]["psi"] < 0.05
    assert out["stable"]["n_early"] == 50 and out["stable"]["n_late"] == 50


def test_triangle_counts_known_graph(spark):
    from smart_data_lake_spark.functions.graph import triangle_counts

    # K4 on {a,b,c,d}: every node sits in C(3,2) = 3 triangles; an extra
    # pendant edge (d,e) adds none; duplicate/reverse edges collapse
    edges = [
        ("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d"),
        ("b", "a"),  # reverse duplicate
        ("d", "e"),  # pendant
        ("e", "e"),  # self-loop: dropped
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    out = {r["node"]: r["n_triangles"] for r in triangle_counts(df, top_k=None).collect()}
    assert out == {"a": 3, "b": 3, "c": 3, "d": 3}


def test_source_divergence_identical_sources_near_zero(spark):
    from smart_data_lake_spark.functions.search import source_divergence

    rows = [(i, "s0" if i % 2 == 0 else "s1", "alpha beta gamma delta") for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = source_divergence(docs).collect()
    for r in out:
        # identical unigram distributions: all divergences ~0 (exactly the
        # smoothing asymmetry between 5 and 5 docs — here 0 by symmetry)
        assert abs(r["js_divergence"]) < 1e-9, r
        assert abs(r["kl_source_rest"]) < 1e-9, r


def test_source_divergence_disjoint_sources_positive(spark):
    from smart_data_lake_spark.functions.search import source_divergence

    rows = [(i, "s0", "aaa bbb ccc") for i in range(5)] + [
        (10 + i, "s1", "xxx yyy zzz") for i in range(5)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r["source"]: r for r in source_divergence(docs).collect()}
    assert out["s0"]["js_divergence"] > 0.3
    assert out["s0"]["kl_source_rest"] > 1.0
    # symmetric setup → symmetric numbers
    assert out["s0"]["js_divergence"] == out["s1"]["js_divergence"]
