"""Round-7 continuation operators: market-basket lift, RFM segmentation,
rank-based trimmed mean, Mann-Kendall trend, C4 quality screen."""

import pytest
from pyspark.sql import functions as F

from smart_data_lake_spark.functions.analytics import (
    cooccurrence_lift,
    mann_kendall_by_group,
    rfm_segments,
    trimmed_mean_by_group,
)
from smart_data_lake_spark.functions.quality import c4_quality_flags


def test_cooccurrence_lift_counts_and_lift(spark):
    # baskets: {a,b} x3, {a,c} x1, {b,c} x1, {a} x1  -> 6 baskets
    rows = [
        (1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (3, "b"),
        (4, "a"), (4, "c"), (5, "b"), (5, "c"), (6, "a"),
    ]
    df = spark.createDataFrame(rows, "basket int, item string")
    out = cooccurrence_lift(df, "basket", "item", min_pair_count=2, top_k=10).collect()
    assert len(out) == 1  # only (a,b) reaches min_pair_count=2
    r = out[0]
    assert (r["item_a"], r["item_b"], r["pair_cnt"]) == ("a", "b", 3)
    assert r["cnt_a"] == 5 and r["cnt_b"] == 4
    assert r["lift"] == pytest.approx(3 * 6 / (5 * 4), abs=1e-6)


def test_cooccurrence_lift_dedupes_basket_items(spark):
    # duplicate (basket,item) rows must not inflate counts
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (1, "b"), (2, "a"), (2, "b")], "basket int, item string"
    )
    out = cooccurrence_lift(df, "basket", "item", min_pair_count=1).collect()
    assert out[0]["pair_cnt"] == 2


def test_rfm_segments_partition_and_totals(spark):
    rows = [
        (1, "2024-01-10", 100.0), (1, "2024-02-10", 50.0),
        (2, "2024-03-01", 500.0),
        (3, "2023-12-01", 10.0),
        (4, "2024-01-01", 200.0), (4, "2024-01-02", 200.0), (4, "2024-01-03", 200.0),
        (5, "2024-02-20", 80.0),
    ]
    df = spark.createDataFrame(rows, "o_custkey int, o_orderdate string, o_totalprice double")
    out = rfm_segments(df).collect()
    # every customer lands in exactly one segment; totals preserved
    assert sum(r["n_customers"] for r in out) == 5
    assert sum(float(r["segment_monetary"]) for r in out) == pytest.approx(1340.0)
    for r in out:
        assert 1 <= r["r_score"] <= 5 and 1 <= r["f_score"] <= 5 and 1 <= r["m_score"] <= 5


def test_trimmed_mean_drops_rank_tails(spark):
    # 10 values incl. extreme outliers; 10% trim drops exactly min and max
    vals = [(i, "t", float(v)) for i, v in enumerate([-1000, 1, 2, 3, 4, 5, 6, 7, 8, 1000])]
    df = spark.createDataFrame(vals, "event_id int, event_type string, value double")
    out = trimmed_mean_by_group(df, "event_type", "value", "event_id").collect()
    assert out[0]["n_kept"] == 8
    assert out[0]["trimmed_mean"] == pytest.approx(sum(range(1, 9)) / 8)


def test_trimmed_mean_small_group_keeps_all(spark):
    df = spark.createDataFrame(
        [(1, "t", 2.0), (2, "t", 4.0)], "event_id int, event_type string, value double"
    )
    out = trimmed_mean_by_group(df, "event_type", "value", "event_id").collect()
    assert out[0]["n_kept"] == 2 and out[0]["trimmed_mean"] == pytest.approx(3.0)


def test_mann_kendall_monotone_series(spark):
    rows = [("t", f"2024-01-0{d} 00:00:00", float(d)) for d in range(1, 6)]
    df = spark.createDataFrame(rows, "event_type string, ts string, value double")
    df = df.withColumn("ts", F.to_timestamp("ts"))
    out = mann_kendall_by_group(df, "event_type", "ts", "value").collect()
    # strictly increasing over 5 days: S = C(5,2) = 10
    assert out[0]["s_statistic"] == 10 and out[0]["n_periods"] == 5
    down = df.withColumn("value", -F.col("value"))
    out2 = mann_kendall_by_group(down, "event_type", "ts", "value").collect()
    assert out2[0]["s_statistic"] == -10


def test_mann_kendall_ties_are_zero(spark):
    rows = [("t", f"2024-01-0{d} 00:00:00", 7.0) for d in range(1, 4)]
    df = spark.createDataFrame(rows, "event_type string, ts string, value double")
    df = df.withColumn("ts", F.to_timestamp("ts"))
    out = mann_kendall_by_group(df, "event_type", "ts", "value").collect()
    assert out[0]["s_statistic"] == 0


def test_c4_flags_and_keep(spark):
    docs = spark.createDataFrame(
        [
            (1, "Good one.\nAnother line!\nA question?\n"),
            (2, "short.\nonly two lines!\n"),
            (3, "Has lorem ipsum filler.\nSecond line.\nThird line.\n"),
            (4, "Code { inside }.\nLine two.\nLine three.\n"),
            (5, "No terminal punctuation\nat all\nhere\n"),
        ],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r for r in c4_quality_flags(docs).collect()}
    assert out[1]["c4_keep"] is True and out[1]["n_terminal_lines"] == 3
    assert out[2]["c4_keep"] is False  # only 2 terminal lines
    assert out[3]["has_lorem_ipsum"] is True and out[3]["c4_keep"] is False
    assert out[4]["has_curly_brace"] is True and out[4]["c4_keep"] is False
    assert out[5]["n_terminal_lines"] == 0 and out[5]["c4_keep"] is False


def test_c4_plan_is_shuffle_free(spark):
    docs = spark.createDataFrame([(1, "x.\ny.\nz.")], "doc_id int, text string")
    plan = c4_quality_flags(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure map over the scan


def test_basket_lift_plan_broadcasts_item_counts(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    out = cooccurrence_lift(li, "l_orderkey", "l_partkey", min_pair_count=2, top_k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # item-count dims broadcast, no extra shuffle


def test_flesch_reading_ease_known_values(spark):
    from smart_data_lake_spark.functions.text import flesch_reading_ease, syllable_count

    df = spark.createDataFrame(
        [(1, "The cat sat. The dog ran."), (2, ""), (3, "Extraordinary vocabulary necessitates comprehension.")],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r for r in df.select(
        "doc_id",
        syllable_count(F.col("text")).alias("syl"),
        flesch_reading_ease(F.col("text")).alias("score"),
    ).collect()}
    # 6 one-syllable words, 2 sentences: 206.835 - 1.015*3 - 84.6*1 = 119.19
    assert out[1]["syl"] == 6 and out[1]["score"] == pytest.approx(119.19)
    # per-word minimum: vowel-less token adds one syllable
    mixed = spark.createDataFrame([(9, "banana tsk")], "doc_id int, text string")
    assert mixed.select(syllable_count(F.col("text"))).first()[0] == 4
    assert out[2]["score"] is None  # empty text -> no score
    assert out[3]["score"] < out[1]["score"]  # polysyllabic text reads harder


def test_luhn_valid_known_numbers(spark):
    from smart_data_lake_spark.functions.text import luhn_valid

    df = spark.createDataFrame(
        [("4539578763621486",), ("1234567812345678",), ("79927398713",), ("0",),
         ("4539-5787-6362-1486",), ("45x9578763621486",)],
        "num string",
    )
    got = [r[0] for r in df.select(luhn_valid(F.col("num"))).collect()]
    # canonical Luhn-valid test numbers, incl. the dash-separated form;
    # a single digit and an input with stray letters are False (never NULL)
    assert got == [True, False, True, False, True, False]


def test_seasonal_strength_extremes(spark):
    from smart_data_lake_spark.functions.analytics import seasonal_strength_by_group

    import datetime as dt

    # perfectly weekly signal: value depends ONLY on the weekday -> strength ~1
    weekly = [
        ("w", dt.datetime(2024, 1, 1 + d) + dt.timedelta(hours=h), float((d % 7) * 10))
        for d in range(28) for h in (1, 13)
    ]
    # constant-per-day noise-free aperiodic ramp -> strength well below 1
    ramp = [
        ("r", dt.datetime(2024, 1, 1 + d), float(d)) for d in range(28)
    ]
    df = spark.createDataFrame(weekly + ramp, "event_type string, ts timestamp, value double")
    out = {r["event_type"]: r["seasonal_strength"] for r in
           seasonal_strength_by_group(df, "event_type", "ts", "value").collect()}
    assert out["w"] == pytest.approx(1.0, abs=1e-6)
    assert out["r"] < 0.2
