"""Round-6 operators: EWMA, inter-arrival stats, TF-IDF corpus cards, token
entropy, containment pairs, cross-source duplication audit."""

from __future__ import annotations

import datetime as dt
import math
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_grouped_ewma_matches_pandas_adjust_false(spark):
    import pandas as pd

    from smart_data_lake_spark.functions.analytics import grouped_ewma

    vals = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0]
    rows = [
        (i, dt.datetime(2024, 1, 1, 0, i), "a", v) for i, v in enumerate(vals)
    ] + [(10, dt.datetime(2024, 1, 1), "b", 7.0)]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string, value double")
    out = {r["event_type"]: r for r in grouped_ewma(df, ["event_type"], alpha=0.3).collect()}
    expect = pd.Series(vals).ewm(alpha=0.3, adjust=False).mean().iloc[-1]
    assert out["a"]["ewma"] == round(expect, 6)
    assert out["a"]["n_obs"] == 6
    assert out["b"]["ewma"] == 7.0 and out["b"]["n_obs"] == 1  # seeded with first


def test_grouped_ewma_order_is_chronological_not_insertion(spark):
    from smart_data_lake_spark.functions.analytics import grouped_ewma

    # rows inserted out of order; ties on ts break on event_id
    rows = [
        (2, dt.datetime(2024, 1, 1, 0, 2), "a", 100.0),
        (0, dt.datetime(2024, 1, 1, 0, 0), "a", 1.0),
        (1, dt.datetime(2024, 1, 1, 0, 1), "a", 10.0),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string, value double")
    got = grouped_ewma(df, ["event_type"], alpha=0.5).collect()[0]["ewma"]
    # fold over [1, 10, 100]: 1 -> 5.5 -> 52.75
    assert got == 52.75


def test_interarrival_stats_exact_gaps(spark):
    from smart_data_lake_spark.functions.analytics import interarrival_stats

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: gaps 60s then 30s; gap events typed by CURRENT event
        (1, t0, 1, "start", 0.0),
        (2, t0 + dt.timedelta(seconds=60), 1, "click", 0.0),
        (3, t0 + dt.timedelta(seconds=90), 1, "click", 0.0),
        # user 2: single event -> no gap
        (4, t0, 2, "click", 0.0),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long, event_type string, value double")
    out = {r["event_type"]: r for r in interarrival_stats(df).collect()}
    assert "start" not in out  # first event of a stream has no gap
    assert out["click"]["n_gaps"] == 2
    assert out["click"]["avg_gap_sec"] == 45.0
    assert out["click"]["max_gap_sec"] == 60.0


def test_tfidf_top_terms_ranks_characteristic_terms(spark):
    from smart_data_lake_spark.functions.search import tfidf_top_terms

    rows = [
        (1, "s1", "zebra zebra zebra common"),
        (2, "s1", "zebra common"),
        (3, "s2", "yak common"),
        (4, "s2", "yak yak common common"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = tfidf_top_terms(df, k=1).collect()
    top = {r["source"]: r for r in out}
    # the source-specific term (low df, high tf) outranks the ubiquitous one
    assert top["s1"]["term"] == "zebra" and top["s1"]["tf"] == 4 and top["s1"]["df"] == 2
    assert top["s2"]["term"] == "yak"
    n, df_ = 4, 2
    assert top["s1"]["tfidf"] == round(4 * (math.log((n + 1) / (df_ + 1)) + 1), 6)


def test_token_entropy_known_values(spark):
    from smart_data_lake_spark.functions.quality import token_entropy

    df = spark.createDataFrame(
        [
            (1, "a a a a"),          # zero entropy
            (2, "a b c d"),          # uniform over 4 -> ln(4)
            (3, "a a b"),            # H = ln(3) - (2 ln 2)/3
            (4, ""),                 # excluded
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in token_entropy(df).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1]["entropy_nats"] == 0.0 and out[1]["n_unique"] == 1
    assert out[2]["entropy_nats"] == round(math.log(4), 6)
    assert out[3]["entropy_nats"] == round(math.log(3) - 2 * math.log(2) / 3, 6)
    assert out[3]["n_tokens"] == 3


def test_containment_is_asymmetric(spark):
    from smart_data_lake_spark.functions.dedup import containment_pairs

    short = "one two three four five"                   # 1 5-shingle
    long_ = "zero one two three four five six seven"    # contains it among 4
    df = spark.createDataFrame(
        [(1, short), (2, long_), (3, "alpha beta gamma delta epsilon")],
        "doc_id long, text string",
    )
    out = {(r["doc_a"], r["doc_b"]): r for r in containment_pairs(df, n=5, threshold=0.2).collect()}
    # all of doc1's shingles appear in doc2 -> containment 1.0 that way only
    assert out[(1, 2)]["containment"] == 1.0
    assert out[(2, 1)]["containment"] == 0.25
    assert (1, 3) not in out


def test_cross_source_duplication_counts(spark):
    from smart_data_lake_spark.functions.dedup import cross_source_duplication

    shared = "alpha beta gamma delta epsilon"
    df = spark.createDataFrame(
        [
            (1, "s1", shared),
            (2, "s2", shared),                       # exact mirror across sources
            (3, "s2", "alpha beta gamma delta zeta"),
            (4, "s3", "totally different words here now"),
        ],
        "doc_id long, source string, text string",
    )
    out = {(r["source_a"], r["source_b"]): r for r in cross_source_duplication(df).collect()}
    pair = out[("s1", "s2")]
    assert pair["n_shared_fingerprints"] == 1
    assert pair["n_shared_shingles"] == 1  # the one 5-gram of the shared doc
    assert ("s1", "s3") not in out and ("s2", "s3") not in out


def test_semantic_dedup_keeps_lowest_id(spark):
    from smart_data_lake_spark.functions.dedup import semantic_dedup

    # two centroids far apart; three near-identical vectors in cell A, one
    # lone vector in cell B
    c0 = [1.0] + [0.0] * 63
    c1 = [-1.0] + [0.0] * 63
    rows = [
        (1, [1.0, 0.01] + [0.0] * 62),
        (2, [1.0, 0.02] + [0.0] * 62),   # dup of 1
        (3, [1.0, 0.03] + [0.0] * 62),   # dup of 1/2
        (4, [-1.0, 0.5] + [0.0] * 62),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["cell"]: r for r in semantic_dedup(df, [c0, c1], threshold=0.95).collect()}
    assert out[0]["n_vectors"] == 3 and out[0]["n_removed"] == 2 and out[0]["n_kept"] == 1
    assert out[1]["n_vectors"] == 1 and out[1]["n_removed"] == 0


def test_kmv_distinct_exact_below_k_and_estimates_above(spark):
    from smart_data_lake_spark.functions.profiling import kmv_distinct

    rows = [(i % 10, "small") for i in range(50)] + [(i, "big") for i in range(2000)]
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    out = {r["event_type"]: r for r in kmv_distinct(df, "user_id", ["event_type"], k=64).collect()}
    # below k: exact
    assert out["small"]["n_exact"] == 10 and out["small"]["kmv_estimate"] == 10
    assert out["small"]["rel_error"] == 0.0
    # above k: estimate within the sketch's expected error envelope
    assert out["big"]["n_exact"] == 2000
    assert 1000 < out["big"]["kmv_estimate"] < 4000
    # deterministic: a second run returns the identical estimate
    again = {r["event_type"]: r["kmv_estimate"]
             for r in kmv_distinct(df, "user_id", ["event_type"], k=64).collect()}
    assert again["big"] == out["big"]["kmv_estimate"]


def test_temperature_mix_upweights_small_sources(spark):
    from smart_data_lake_spark.functions.sampling import temperature_mix_rates

    import pyspark.sql.functions as F

    rows = [("big", 100) for _ in range(90)] + [("small", 100) for _ in range(10)]
    df = spark.createDataFrame(rows, "source string, n int")
    out = {r["source"]: r for r in
           temperature_mix_rates(df, size_col=F.col("n"), alpha=0.5, token_budget=1000).collect()}
    # proportional share would be 0.9/0.1; alpha=0.5 compresses to 0.75/0.25
    assert out["big"]["mix_weight"] == 0.75
    assert out["small"]["mix_weight"] == 0.25
    assert out["small"]["budget_tokens"] == 250.0
    # weights always sum to 1
    assert round(sum(r["mix_weight"] for r in out.values()), 6) == 1.0


def test_pmi_collocations_finds_fixed_phrase(spark):
    from smart_data_lake_spark.functions.search import pmi_collocations

    # "foo bar" always adjacent; fillers vary -> highest PMI
    rows = [(i, f"foo bar w{i % 7} w{(i * 3) % 11} w{(i * 5) % 13}") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = pmi_collocations(df, min_count=5, k=3).collect()
    assert out[0]["collocation"] == "foo bar" and out[0]["c12"] == 40
    import math

    # hand-computed PMI for the top pair
    n_bi = sum(5 - 1 for _ in range(40))
    n_uni = 40 * 5
    expect = math.log((40 / n_bi) / ((40 / n_uni) * (40 / n_uni)))
    assert out[0]["pmi"] == round(expect, 6)


def test_exact_quartiles_interpolation(spark):
    from smart_data_lake_spark.functions.profiling import exact_quartiles

    df = spark.createDataFrame([(float(v), "a") for v in (1, 2, 3, 4)], "value double, g string")
    r = exact_quartiles(df, "value", ["g"]).collect()[0]
    # percentile_cont over [1,2,3,4]: q1=1.75, median=2.5, q3=3.25
    assert (r["q1"], r["median"], r["q3"], r["n"]) == (1.75, 2.5, 3.25, 4)
