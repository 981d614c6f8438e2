"""As-of join and range join operator tests: semantics on hand-built cases,
tie handling, and physical-plan audits (no nested-loop joins at any size)."""

import datetime

import pytest
from pyspark.sql import Row

from smart_data_lake_spark.functions.temporal import as_of_join, range_join


def ts(minute, second=0):
    return datetime.datetime(2024, 1, 1, 10, minute, second)


@pytest.fixture()
def trades(spark):
    return spark.createDataFrame(
        [
            Row(sym="A", ts=ts(5), trade_id=1),
            Row(sym="A", ts=ts(10), trade_id=2),
            Row(sym="B", ts=ts(5), trade_id=3),
            Row(sym="C", ts=ts(5), trade_id=4),  # no quotes at all
        ]
    )


@pytest.fixture()
def quotes(spark):
    return spark.createDataFrame(
        [
            Row(sym="A", ts=ts(4), quote_id=10, px=1.0),
            Row(sym="A", ts=ts(5), quote_id=11, px=2.0),   # same instant as trade 1
            Row(sym="A", ts=ts(7), quote_id=12, px=3.0),
            Row(sym="A", ts=ts(7), quote_id=13, px=4.0),   # tie on ts
            Row(sym="B", ts=ts(9), quote_id=14, px=5.0),   # after B's trade
        ]
    )


def test_as_of_join_strict(trades, quotes):
    out = {
        r.trade_id: (r.quote_id_asof, r.px_asof)
        for r in as_of_join(
            trades, quotes, on=["sym"], right_cols=["quote_id", "px"],
            right_order_col="quote_id", strict=True,
        ).collect()
    }
    assert out[1] == (10, 1.0)   # quote at the SAME ts excluded (strict)
    assert out[2] == (13, 4.0)   # ts tie resolved to greatest order col
    assert out[3] == (None, None)  # only later quotes exist
    assert out[4] == (None, None)  # no quotes: left row kept with nulls


def test_as_of_join_non_strict(trades, quotes):
    out = {
        r.trade_id: r.quote_id_asof
        for r in as_of_join(
            trades, quotes, on=["sym"], right_cols=["quote_id"],
            right_order_col="quote_id", strict=False,
        ).collect()
    }
    assert out[1] == 11  # same-instant quote now matches


def test_range_join_window_semantics(spark):
    left = spark.createDataFrame([Row(k="u", ts=ts(10), lid=1)])
    right = spark.createDataFrame(
        [
            Row(k="u", ts=ts(9, 59), rid="in_upper_edge"),     # 1s before: in
            Row(k="u", ts=ts(0), rid="exactly_600s"),          # ts-600: in (>= lower bound)
            Row(k="u", ts=ts(0) - datetime.timedelta(seconds=1), rid="too_old"),
            Row(k="u", ts=ts(10), rid="same_instant"),         # excluded: < upper
            Row(k="v", ts=ts(9), rid="other_key"),
        ]
    )
    got = {
        r.rid_r
        for r in range_join(
            left, right, on=["k"], lower_sec=0.0, upper_sec=600.0, bucket_sec=120.0
        ).collect()
    }
    assert got == {"in_upper_edge", "exactly_600s"}


def test_range_join_pairs_unique(spark):
    # rows landing in different buckets must not produce duplicate pairs
    left = spark.createDataFrame([Row(k="u", ts=ts(10), lid=i) for i in range(3)])
    right = spark.createDataFrame(
        [Row(k="u", ts=ts(10) - datetime.timedelta(seconds=s), rid=s) for s in range(1, 50)]
    )
    out = range_join(left, right, on=["k"], lower_sec=0.0, upper_sec=3600.0, bucket_sec=7.0)
    rows = out.select("lid", "rid_r").collect()
    assert len(rows) == len(set((r.lid, r.rid_r) for r in rows)) == 3 * 49


def test_temporal_plans_no_nested_loop(trades, quotes, spark):
    asof_plan = as_of_join(
        trades, quotes, on=["sym"], right_cols=["px"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in asof_plan
    assert "CartesianProduct" not in asof_plan
    # union+window: there should be no join at all in the as-of plan
    assert "Join" not in asof_plan

    rng_plan = range_join(
        trades, quotes, on=["sym"], upper_sec=600.0
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in rng_plan
    assert "CartesianProduct" not in rng_plan
