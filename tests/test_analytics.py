"""Event analytics: grouped OLS trend, cohort retention, ordered funnels."""

import datetime
import math

import pytest
from pyspark.sql import functions as F

from smart_data_lake_spark.functions.analytics import (
    cohort_retention,
    funnel_counts,
    grouped_linear_trend,
)


def _ts(s):
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=s)


def test_grouped_linear_trend_exact_line(spark):
    # y = 2x + 3 exactly -> slope 2, intercept 3
    rows = [("a", float(x), 2.0 * x + 3.0) for x in range(10)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = grouped_linear_trend(df, ["g"], F.col("x"), F.col("y")).first()
    assert out.n == 10
    assert math.isclose(out.slope, 2.0, rel_tol=1e-9)
    assert math.isclose(out.intercept, 3.0, rel_tol=1e-9)


def test_grouped_linear_trend_zero_variance_is_null(spark):
    df = spark.createDataFrame(
        [("a", 1.0, 5.0), ("a", 1.0, 7.0)], "g string, x double, y double"
    )
    out = grouped_linear_trend(df, ["g"], F.col("x"), F.col("y")).first()
    assert out.slope is None and out.intercept is None


def test_grouped_linear_trend_partition_independent(spark):
    rows = [("a", float(x), (x * 37 % 11) * 1.5) for x in range(200)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    a = grouped_linear_trend(df, ["g"], F.col("x"), F.col("y")).first()
    b = grouped_linear_trend(df.repartition(13), ["g"], F.col("x"), F.col("y")).first()
    assert a.slope == b.slope and a.intercept == b.intercept  # bit-identical


def test_cohort_retention_triangle(spark):
    # user 1 first active period 0, returns period 1; user 2 only period 1
    df = spark.createDataFrame(
        [
            (1, _ts(10)),
            (1, _ts(100)),
            (1, _ts(7 * 24 * 3600 + 5)),
            (2, _ts(7 * 24 * 3600 + 50)),
        ],
        "user_id long, ts timestamp",
    )
    out = {
        (r.cohort_period, r.period_offset): r.n_users
        for r in cohort_retention(df).collect()
    }
    base = math.floor(_ts(0).replace(tzinfo=datetime.timezone.utc).timestamp() / (7 * 24 * 3600))
    assert out[(base, 0)] == 1  # user 1's cohort week
    assert out[(base, 1)] == 1  # user 1 retained next week
    assert out[(base + 1, 0)] == 1  # user 2's own cohort


def test_funnel_strict_ordering(spark):
    rows = [
        # u1 converts fully: view < click < purchase
        (1, "view", _ts(0)), (1, "click", _ts(10)), (1, "purchase", _ts(20)),
        # u2: click BEFORE view, no click after -> stops at view
        (2, "click", _ts(0)), (2, "view", _ts(10)),
        # u3: purchase precedes the click -> reaches click, never purchase
        (3, "view", _ts(0)), (3, "purchase", _ts(5)), (3, "click", _ts(10)),
        # u4: early click ignored, later click after view counts
        (4, "click", _ts(0)), (4, "view", _ts(5)), (4, "click", _ts(9)),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    out = funnel_counts(df, ["view", "click", "purchase"]).first()
    assert out.n_step0_view == 4
    assert out.n_step1_click == 3  # u1, u3, u4
    assert out.n_step2_purchase == 1  # u1 only
    assert out.n_step1_click >= out.n_step2_purchase  # monotone funnel


def test_funnel_simultaneous_events_not_strictly_after(spark):
    df = spark.createDataFrame(
        [(1, "view", _ts(0)), (1, "click", _ts(0))],
        "user_id long, event_type string, ts timestamp",
    )
    out = funnel_counts(df, ["view", "click"]).first()
    assert out.n_step0_view == 1
    assert out.n_step1_click == 0  # same-instant click is not strictly after


def test_approx_quantile_buckets_monotone_and_balanced(spark):
    from smart_data_lake_spark.functions.analytics import approx_quantile_buckets

    df = spark.range(10000).select((F.col("id") * 7 % 10007).cast("double").alias("v"))
    out = approx_quantile_buckets(df, "v", n_buckets=10, relative_error=0.0001)
    agg = {
        r.bucket: (r.n, r.lo, r.hi)
        for r in out.groupBy("bucket")
        .agg(F.count("*").alias("n"), F.min("v").alias("lo"), F.max("v").alias("hi"))
        .collect()
    }
    assert set(agg) == set(range(1, 11))
    # buckets are ordered ranges: every bucket's max <= next bucket's min
    for b in range(1, 10):
        assert agg[b][2] <= agg[b + 1][1]
    # and roughly balanced at this error bound
    for b in agg:
        assert 800 <= agg[b][0] <= 1200


def test_approx_quantile_buckets_null_values_get_null_bucket(spark):
    # r7 ADVICE fix: NULLs must not silently land in the top bucket
    from pyspark.sql import Row

    from smart_data_lake_spark.functions.analytics import approx_quantile_buckets

    df = spark.createDataFrame(
        [Row(v=float(i)) for i in range(100)] + [Row(v=None), Row(v=None)],
        "v double",
    )
    out = approx_quantile_buckets(df, "v", n_buckets=4, relative_error=0.0001)
    nulls = out.where(F.col("v").isNull()).collect()
    assert len(nulls) == 2 and all(r.bucket is None for r in nulls)
    top = out.where(F.col("bucket") == 4)
    assert top.where(F.col("v").isNull()).count() == 0


def test_rolling_active_users_trailing_window(spark):
    """Hand-checkable case: trailing window includes the day itself and the
    6 before; repeat activity within a window counts once."""
    import datetime as dt

    from pyspark.sql import Row

    from smart_data_lake_spark.functions.analytics import rolling_active_users

    def t(day):
        return dt.datetime(2024, 1, day, 12, 0)

    rows = [
        Row(user_id=1, ts=t(1)), Row(user_id=1, ts=t(1)),   # dup same day
        Row(user_id=2, ts=t(1)),
        Row(user_id=1, ts=t(5)),                            # u1 again inside window
        Row(user_id=3, ts=t(8)),                            # day 8: u1@5 still in window, u1/u2@1 aged out
    ]
    out = {str(r["day"]): (r["n_active"], r["n_active_rolling"])
           for r in rolling_active_users(spark.createDataFrame(rows), window_days=7).collect()}
    assert out["2024-01-01"] == (2, 2)
    assert out["2024-01-05"] == (1, 2)   # u1 (again) + u2 from day 1
    assert out["2024-01-08"] == (1, 2)   # u3 + u1@day5; day-1 activity aged out


def test_rolling_zscore_bucketed_matches_single_window(spark):
    """The r7-verdict scale mitigation: the rn-block re-keyed evaluation
    (bucket_seconds set) must be BIT-IDENTICAL to the plain per-group window
    — same frames, same DECIMAL-exact sums — at any bucket granularity,
    including buckets far smaller than the frame (forcing heavy cross-bucket
    context) and histories shorter than one window."""
    import datetime as dt
    import random

    from pyspark.sql import Row

    from smart_data_lake_spark.functions.analytics import rolling_zscore_anomalies

    rng = random.Random(8)
    rows = []
    eid = 0
    for g, n in (("a", 300), ("b", 45), ("c", 7)):  # c: shorter than min_obs
        t = dt.datetime(2024, 3, 1)
        for _ in range(n):
            t += dt.timedelta(minutes=rng.randint(1, 900))
            rows.append(Row(event_type=g, event_id=eid, ts=t,
                            value=rng.uniform(-50, 50)))
            eid += 1
    df = spark.createDataFrame(rows)
    ref = rolling_zscore_anomalies(df, bucket_seconds=None).collect()
    for bs in (3600, 86400, 7 * 86400):
        got = rolling_zscore_anomalies(df, bucket_seconds=bs).collect()
        assert got == ref, f"bucket_seconds={bs} diverged"


def test_rolling_zscore_bucketed_keeps_null_keys(spark):
    """r8 review: NULL ts / NULL group rows are real window rows in the
    single-window form (NULLS FIRST) and must survive the bucketed
    re-key's joins bit-identically."""
    import datetime as dt
    import random

    from pyspark.sql import Row

    from smart_data_lake_spark.functions.analytics import rolling_zscore_anomalies

    rng = random.Random(8)
    rows = []
    for i in range(120):
        g = None if i % 17 == 0 else "g"
        ts = None if i % 23 == 0 else dt.datetime(2024, 3, 1) + dt.timedelta(
            minutes=rng.randint(1, 50000)
        )
        rows.append(Row(event_type=g, event_id=i, ts=ts, value=rng.uniform(-9, 9)))
    df = spark.createDataFrame(
        rows, "event_type string, event_id long, ts timestamp, value double"
    )
    ref = rolling_zscore_anomalies(df, window=10, min_obs=4, bucket_seconds=None).collect()
    got = rolling_zscore_anomalies(df, window=10, min_obs=4, bucket_seconds=86400).collect()
    assert got == ref
