"""Tests for skew-mitigation joins and one-pass column profiling."""

import pytest
from pyspark.sql import Row, functions as F

from smart_data_lake_spark.functions.profiling import profile_columns
from smart_data_lake_spark.functions.skew import (
    heavy_hitter_keys,
    salted_join,
    split_skew_join,
)


def _skewed_frames(spark):
    # key 1 is hot (200 rows), keys 2..20 have 2 rows each
    probe = spark.createDataFrame(
        [Row(k=1, pv=i) for i in range(200)]
        + [Row(k=j, pv=i) for j in range(2, 21) for i in range(2)]
    )
    build = spark.createDataFrame([Row(k=j, bv=j * 10) for j in range(1, 26)])
    return probe, build


def test_salted_join_matches_plain_join(spark):
    probe, build = _skewed_frames(spark)
    plain = probe.join(build, on=["k"], how="inner")
    salted = salted_join(probe, build, on=["k"], buckets=8)
    assert salted.columns == plain.columns
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_salted_left_join_keeps_unmatched_probe_rows(spark):
    probe, build = _skewed_frames(spark)
    probe_extra = probe.union(spark.createDataFrame([Row(k=99, pv=0)]))
    plain = probe_extra.join(build, on=["k"], how="left")
    salted = salted_join(probe_extra, build, on=["k"], how="left", buckets=4)
    assert salted.exceptAll(plain).count() == 0 and plain.exceptAll(salted).count() == 0


def test_salted_join_spreads_hot_key(spark):
    probe, build = _skewed_frames(spark)
    salted_probe = probe.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in probe.columns]), F.lit(8)).cast("int")
    )
    n_buckets = salted_probe.where(F.col("k") == 1).select("_salt").distinct().count()
    assert n_buckets >= 6  # hot key fans out over most of the 8 salt buckets


def test_salted_join_rejects_full_outer(spark):
    probe, build = _skewed_frames(spark)
    with pytest.raises(ValueError):
        salted_join(probe, build, on=["k"], how="full")


def test_heavy_hitter_keys(spark):
    probe, _ = _skewed_frames(spark)
    hot = heavy_hitter_keys(probe, ["k"], min_count=10)
    assert [r.k for r in hot.collect()] == [1]


def test_split_skew_join_matches_plain_join(spark):
    probe, build = _skewed_frames(spark)
    plain = probe.join(build, on=["k"], how="inner")
    split = split_skew_join(probe, build, on=["k"], skew_threshold=10)
    assert split.exceptAll(plain).count() == 0 and plain.exceptAll(split).count() == 0
    # the hot branch is a broadcast join
    plan = split._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_profile_columns_values(spark):
    df = spark.createDataFrame(
        [Row(a=1, b="x", c=1.5), Row(a=2, b="y", c=2.5), Row(a=2, b=None, c=None), Row(a=4, b="x", c=4.5)]
    )
    prof = {r.col_name: r for r in profile_columns(df).collect()}
    assert prof["a"].n_rows == 4 and prof["a"].n_null == 0 and prof["a"].n_distinct == 3
    assert prof["a"].min_str == "1" and prof["a"].max_str == "4"
    assert prof["a"].mean == pytest.approx(9 / 4)
    assert prof["a"].median == pytest.approx(2.0)
    assert prof["b"].n_null == 1 and prof["b"].n_distinct == 2
    assert prof["b"].mean is None and prof["b"].median is None
    # c: nulls are skipped by mean/median, counted by n_null
    assert prof["c"].n_null == 1
    assert prof["c"].mean == pytest.approx(8.5 / 3)
    assert prof["c"].median == pytest.approx(2.5)


def test_profile_columns_decimal_mean_matches_double_mean(spark):
    df = spark.createDataFrame([Row(v=float(i) + 0.1) for i in range(100)])
    a = profile_columns(df, ["v"]).first().mean
    b = profile_columns(df, ["v"], decimal_mean_scale=6).first().mean
    assert b == pytest.approx(a, abs=1e-9)


def test_profile_columns_unknown_column(spark):
    df = spark.createDataFrame([Row(a=1)])
    with pytest.raises(ValueError):
        profile_columns(df, ["nope"])


def test_profile_two_aggregates_one_cross_join(spark):
    """The profile is exactly two aggregate subplans (plain stats +
    multi-distinct) joined 1-row × 1-row — never one join per statistic.
    Fusing them is the regression this guards against: Catalyst's
    multi-distinct Expand would drag the percentile buffers across
    (n_distinct_cols + 1)× duplicated input rows."""
    df = spark.createDataFrame([Row(a=1, c=1.5)])
    prof = profile_columns(df, ["a", "c"])
    plan = prof._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Join") == 1  # the single 1×1 combine
    # the plain-stats aggregate must not sit under an Expand
    assert "percentile" not in plan.split("Expand")[-1] or "Expand" not in plan


def test_grouped_outliers_flags_only_extremes(spark):
    from smart_data_lake_spark.functions.profiling import grouped_outliers

    rows = [Row(id=i, g="a", v=10.0) for i in range(20)] + [
        Row(id=100, g="a", v=1000.0),
        Row(id=200, g="b", v=5.0),  # degenerate group: std 0 -> never flagged
        Row(id=201, g="b", v=5.0),
    ]
    df = spark.createDataFrame(rows)
    out = grouped_outliers(df, "v", ["g"], z_threshold=3.0)
    flagged = [r.id for r in out.collect()]
    assert flagged == [100]
    row = out.first()
    assert row.zscore > 3.0 and row.group_std > 0


def test_grouped_outliers_broadcast_plan(spark):
    from smart_data_lake_spark.functions.profiling import grouped_outliers

    df = spark.createDataFrame([Row(id=1, g="a", v=1.0), Row(id=2, g="a", v=2.0)])
    out = grouped_outliers(df, "v", ["g"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan


def test_pairwise_correlations_known_values(spark):
    """Exact-sufficient-statistics corr: +1 for a linear map, -1 for a
    negated one, NULL (not NaN/crash) for a constant column, and
    partition-order independence."""
    from pyspark.sql import Row

    from smart_data_lake_spark.functions.profiling import pairwise_correlations

    rows = [Row(x=float(i), y=2.0 * i + 3, z=-1.5 * i, c=7.0) for i in range(50)]
    df = spark.createDataFrame(rows)
    out = {(r["col_a"], r["col_b"]): r["corr"]
           for r in pairwise_correlations(df, ["x", "y", "z", "c"]).collect()}
    assert out[("x", "y")] == 1.0
    assert out[("x", "z")] == -1.0
    assert out[("x", "c")] is None  # zero variance → undefined, surfaced as NULL
    # partition-order independent: identical on a repartitioned input
    out2 = {(r["col_a"], r["col_b"]): r["corr"]
            for r in pairwise_correlations(df.repartition(13), ["x", "y", "z", "c"]).collect()}
    assert out == out2
