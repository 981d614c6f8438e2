"""Late-round-6 operators: lag-k autocorrelation, rolling z-score anomalies,
Zipf slope, k-means assignment step, length-band filter, fixed-k sampling,
normalized dedup (text + bag-of-words modes)."""

from __future__ import annotations

import datetime as dt
import math
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _events(spark, series, group="a"):
    rows = [
        (i, dt.datetime(2024, 1, 1, 0, 0, i), group, float(v))
        for i, v in enumerate(series)
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )


def test_lagged_autocorrelation_matches_numpy(spark):
    import numpy as np

    from smart_data_lake_spark.functions.analytics import lagged_autocorrelation

    vals = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0, 5.0, 3.0]
    out = lagged_autocorrelation(_events(spark, vals)).collect()
    assert len(out) == 1 and out[0]["n_pairs"] == 9
    x, y = np.array(vals[1:]), np.array(vals[:-1])
    expect = np.corrcoef(x, y)[0, 1]
    assert out[0]["autocorr_lag1"] == pytest.approx(round(expect, 6), abs=1e-6)


def test_lagged_autocorrelation_alternating_series_is_negative(spark):
    from smart_data_lake_spark.functions.analytics import lagged_autocorrelation

    out = lagged_autocorrelation(_events(spark, [1, 9] * 10)).collect()
    assert out[0]["autocorr_lag1"] == -1.0


def test_lagged_autocorrelation_lag2_and_constant_series_null(spark):
    from smart_data_lake_spark.functions.analytics import lagged_autocorrelation

    # period-2 series: lag-2 autocorr is +1
    out = lagged_autocorrelation(_events(spark, [1, 9] * 10), lag=2).collect()
    assert out[0]["autocorr_lag2"] == 1.0
    # zero variance -> NULL, not div-by-zero
    out = lagged_autocorrelation(_events(spark, [5.0] * 8)).collect()
    assert out[0]["autocorr_lag1"] is None


def test_rolling_zscore_flags_the_spike(spark):
    from smart_data_lake_spark.functions.analytics import rolling_zscore_anomalies

    series = [10.0, 11.0, 10.0, 9.0, 10.0, 11.0, 9.0, 10.0, 10.0, 11.0, 100.0, 10.0]
    out = rolling_zscore_anomalies(
        _events(spark, series), window=10, min_obs=10, k=3
    ).collect()
    # the spike (event 10, value 100) must rank first by |z|
    assert out[0]["event_id"] == 10 and out[0]["value"] == 100.0
    assert out[0]["z"] > 5
    # its roll_mean is the mean of the 10 preceding values
    assert out[0]["roll_mean"] == pytest.approx(sum(series[:10]) / 10, abs=1e-9)


def test_rolling_zscore_min_obs_gate(spark):
    from smart_data_lake_spark.functions.analytics import rolling_zscore_anomalies

    out = rolling_zscore_anomalies(
        _events(spark, [1.0, 2.0, 3.0, 4.0]), window=10, min_obs=10
    ).collect()
    assert out == []  # never enough history


def test_zipf_slope_recovers_planted_exponent(spark):
    from smart_data_lake_spark.functions.search import zipf_slope

    # corpus where term_i appears round(1000 / i) times -> slope ~= -1
    words = []
    for i in range(1, 31):
        words += [f"w{i:02d}"] * round(1000 / i)
    df = spark.createDataFrame([(1, " ".join(words), "s1")], "doc_id long, text string, source string")
    out = zipf_slope(df, top_n=30).collect()
    assert out[0]["n_terms"] == 30
    assert out[0]["zipf_slope"] == pytest.approx(-1.0, abs=0.02)


def test_zipf_slope_top_n_cap_and_tie_ranks(spark):
    from smart_data_lake_spark.functions.search import zipf_slope

    df = spark.createDataFrame(
        [(1, "a a a b b c", "s1"), (2, "d e f g h i j", "s1")],
        "doc_id long, text string, source string",
    )
    out = zipf_slope(df, top_n=5).collect()
    assert out[0]["n_terms"] == 5  # 9 distinct terms, capped at 5


def test_kmeans_assign_obvious_clusters_and_seed_tiebreak(spark):
    from smart_data_lake_spark.functions.similarity import kmeans_assign_stats

    # seeds = vec_ids 1,2 (k=2); vectors 3,4 sit exactly on seed 1; vector 5
    # is equidistant -> tie breaks to the SMALLER seed id
    rows = [
        (1, [0.0, 0.0]),
        (2, [10.0, 0.0]),
        (3, [0.1, 0.0]),
        (4, [0.0, 0.2]),
        (5, [5.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["cluster"]: r for r in kmeans_assign_stats(df, k=2).collect()}
    assert out[1]["n_points"] == 4  # seeds 1 + vectors 3,4 + tied vector 5
    assert out[2]["n_points"] == 1
    assert out[2]["total_sqdist"] == 0.0
    assert out[1]["total_sqdist"] == pytest.approx(0.1**2 + 0.2**2 + 25.0, abs=1e-5)


def test_length_band_stats_hand_computed(spark):
    from smart_data_lake_spark.functions.quality import length_band_stats

    rows = [(i, f"d{i}", "s1", n) for i, n in enumerate([10, 20, 30, 40, 1000])]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string, n_chars long")
    out = length_band_stats(df, lo=0.25, hi=0.75).collect()[0]
    # p25 of [10,20,30,40,1000] = 20, p75 = 40 (interpolated on n-1 steps)
    assert out["p_lo"] == 20.0 and out["p_hi"] == 40.0
    assert out["n_docs"] == 5 and out["n_kept"] == 3
    assert out["chars_kept"] == 20 + 30 + 40


def test_fixed_k_per_group_deterministic_under_repartition(spark):
    from smart_data_lake_spark.functions.sampling import fixed_k_per_group

    rows = [(i, f"s{i % 3}") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    a = sorted(
        (r["source"], r["doc_id"], r["sample_rank"])
        for r in fixed_k_per_group(df, "doc_id", "source", 4).collect()
    )
    b = sorted(
        (r["source"], r["doc_id"], r["sample_rank"])
        for r in fixed_k_per_group(df.repartition(7), "doc_id", "source", 4).collect()
    )
    assert a == b
    assert len(a) == 12  # 4 per group, 3 groups
    assert {g for g, _, _ in a} == {"s0", "s1", "s2"}


def test_normalized_dedup_text_mode_catches_recased_mirror(spark):
    from smart_data_lake_spark.functions.dedup import normalized_duplicate_groups

    rows = [
        (1, "Hello,   World!"),
        (2, "hello world"),
        (3, "something else"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = normalized_duplicate_groups(df).collect()
    assert len(out) == 1
    assert out[0]["n_docs"] == 2 and out[0]["keep_id"] == 1 and out[0]["max_id"] == 2


def test_normalized_dedup_bow_mode_catches_shuffled_tokens(spark):
    from smart_data_lake_spark.functions.dedup import normalized_duplicate_groups

    rows = [
        (1, "the quick brown fox"),
        (2, "fox brown the quick quick"),  # reordered + repeated
        (3, "the quick brown dog"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = normalized_duplicate_groups(df, mode="bow").collect()
    assert len(out) == 1 and out[0]["n_docs"] == 2
    # text mode must NOT merge them
    assert normalized_duplicate_groups(df, mode="text").collect() == []
    with pytest.raises(ValueError):
        normalized_duplicate_groups(df, mode="nope")


# ---- plan audits ----------------------------------------------------------


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_autocorr_plan_one_window_one_combinable_agg(spark, sf_dir):
    import __spark_entry__ as entry

    plan = _plan(entry.queries()["autocorr_lag1_value_by_type"](spark, sf_dir))
    # window shuffle + agg shuffle; the agg must be map-side partial
    assert plan.count("Exchange") <= 3
    assert "partial_" in plan
    assert "SinglePartition" not in plan.split("Sort")[0]
    assert "CartesianProduct" not in plan


def test_rolling_z_plan_takeordered_no_global_sort(spark, sf_dir):
    import __spark_entry__ as entry

    plan = _plan(entry.queries()["rolling_z_anomalies_events"](spark, sf_dir))
    assert "TakeOrdered" in plan
    # r8 re-key: the bucketed evaluation trades the single 2-exchange plan
    # (whose window parallelism was capped at the GROUP-COLUMN cardinality)
    # for a bounded handful of exchanges over rn-block partitions of
    # <= 2*window rows — more stages, unbounded parallelism. Top-k stays
    # TakeOrdered (never a global sort).
    assert plan.count("Exchange") <= 10
    assert "CartesianProduct" not in plan


def test_zipf_plan_partitioned_window_no_cartesian(spark, sf_dir):
    import __spark_entry__ as entry

    plan = _plan(entry.queries()["zipf_slope_by_source"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "partial_" in plan


def test_kmeans_assign_plan_broadcast_seeds_no_explode(spark, sf_dir):
    import __spark_entry__ as entry

    plan = _plan(entry.queries()["kmeans_assign_embeddings"](spark, sf_dir))
    # the 8-row seed frame broadcasts (nested-loop on a broadcast 8-row side
    # is the intended crossJoin shape); the vector column must never explode
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "Generate" not in plan  # no posexplode: the fold is in-row
    assert "partial_" in plan


def test_length_band_plan_broadcasts_bounds(spark, sf_dir):
    import __spark_entry__ as entry

    plan = _plan(entry.queries()["doc_length_band_by_source"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_fixed_k_plan_group_partitioned_window(spark, sf_dir):
    import __spark_entry__ as entry

    plan = _plan(entry.queries()["fixed_k_sample_per_source"](spark, sf_dir))
    assert "SinglePartition" not in plan
    assert "CartesianProduct" not in plan


def test_normalized_dedup_plan_single_combinable_groupby(spark, sf_dir):
    import __spark_entry__ as entry

    plan = _plan(entry.queries()["normalized_dedup_docs"](spark, sf_dir))
    # one shuffle on the hash, map-side partial aggregation, no sort
    assert plan.count("Exchange") <= 2
    assert "partial_" in plan


# ---- review-pass regressions ---------------------------------------------


def test_autocorr_oracle_sql_survives_constant_series():
    """The DuckDB oracle must NULL out a constant-value group, not hard-error
    on sqrt of a cancellation-negative radicand (review finding: -1.2e-7 at
    n=34 for value 820.096754)."""
    import duckdb

    import __spark_entry__ as entry

    con = duckdb.connect()
    con.sql(
        """CREATE VIEW events AS
           SELECT i AS event_id,
                  TIMESTAMP '2024-01-01' + INTERVAL (i) SECOND AS ts,
                  i % 7 AS user_id, 'click' AS event_type,
                  820.096754 AS value, '' AS props
           FROM range(35) t(i)"""
    )
    rows = con.sql(entry.oracle_sql()["autocorr_lag1_value_by_type"]).fetchall()
    assert len(rows) == 1
    assert rows[0][2] is None  # autocorr NULL, no exception


def test_normalized_dedup_text_mode_keeps_scripts_apart(spark):
    from smart_data_lake_spark.functions.dedup import normalized_duplicate_groups

    rows = [
        (1, "你好 世界"),
        (2, "再见了"),
        (3, "Привет мир"),
        (4, "你好, 世界!"),  # punctuation-variant of doc 1 SHOULD merge
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = normalized_duplicate_groups(df, mode="text").collect()
    assert len(out) == 1  # only the 1/4 pair; CJK vs Cyrillic never merge
    assert out[0]["n_docs"] == 2 and out[0]["keep_id"] == 1 and out[0]["max_id"] == 4


def test_normalized_dedup_null_text_not_merged_with_empty(spark):
    from pyspark.sql import types as T

    from smart_data_lake_spark.functions.dedup import normalized_duplicate_groups

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    df = spark.createDataFrame(
        [(1, None), (2, None), (3, ""), (4, "   "), (5, "real text")], schema
    )
    for mode in ("text", "bow"):
        groups = {r["norm_hash"]: r for r in normalized_duplicate_groups(df, mode=mode).collect()}
        # NULL-text docs group under the NULL hash; empty/whitespace docs
        # group under md5('') — never merged together
        assert None in groups and groups[None]["n_docs"] == 2
        import hashlib

        empty_hash = hashlib.md5(b"").hexdigest()
        assert empty_hash in groups and groups[empty_hash]["n_docs"] == 2


# ---- wave-3 operators -----------------------------------------------------


def test_source_vocab_overlap_hand_computed(spark):
    from smart_data_lake_spark.functions.search import source_vocab_overlap

    rows = [
        (1, "a b c d", "s1"),
        (2, "c d e f", "s2"),
        (3, "x y", "s3"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {(r["source_a"], r["source_b"]): r for r in source_vocab_overlap(df).collect()}
    r = out[("s1", "s2")]
    assert r["n_common"] == 2 and r["n_a"] == 4 and r["n_b"] == 4
    assert r["jaccard"] == pytest.approx(2 / 6)
    # disjoint vocabularies never produce a pair row (inner join on term)
    assert ("s1", "s3") not in out and ("s2", "s3") not in out


def test_decayed_popularity_halves_per_half_life(spark):
    from smart_data_lake_spark.functions.analytics import decayed_popularity

    # newest event weight 1.0; one event exactly one half-life older -> 0.5
    rows = [
        (1, dt.datetime(2024, 1, 2, 0, 0, 0), "a", 1.0),
        (2, dt.datetime(2024, 1, 1, 0, 0, 0), "a", 1.0),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string, value double")
    out = decayed_popularity(df, half_life_hours=24.0).collect()[0]
    assert out["n_events"] == 2
    assert out["decayed_score"] == pytest.approx(1.5, abs=1e-6)


def test_chi_square_zero_for_independent_and_positive_for_dependent(spark):
    from smart_data_lake_spark.functions.profiling import chi_square_independence

    # perfectly proportional table -> chi2 == 0
    rows = []
    i = 0
    for lang, mult in (("en", 2), ("de", 1)):
        for src, n in (("s1", 10), ("s2", 20)):
            for _ in range(n * mult):
                rows.append((i, "t", lang, src, 1))
                i += 1
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    out = chi_square_independence(df, "lang", "source").collect()[0]
    assert out["chi2"] == 0.0 and out["dof"] == 1 and out["n"] == 90

    # fully dependent: each lang exclusive to one source -> chi2 == n
    rows = [(i, "t", "en", "s1", 1) for i in range(30)] + [
        (i + 30, "t", "de", "s2", 1) for i in range(30)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    out = chi_square_independence(df, "lang", "source").collect()[0]
    assert out["chi2"] == pytest.approx(60.0, abs=1e-5) and out["dof"] == 1


def test_streaming_enrich_matches_batch_join(spark, sf_dir, tmp_path):
    """stream-static join ≡ batch join+window over the drained input."""
    from pyspark.sql import functions as F

    from smart_data_lake_spark.streaming.operators import (
        enrich_with_static,
        read_events_batch,
        read_events_stream,
        run_available_now,
        user_cohort_dim,
    )

    batch = read_events_batch(spark, sf_dir)
    dim = user_cohort_dim(batch)
    streamed = run_available_now(
        enrich_with_static(read_events_stream(spark, sf_dir), dim)
    )
    expect = (
        batch.join(dim, "user_id")
        .groupBy(
            (F.floor(F.unix_timestamp("ts") / 86400) * 86400).alias("window_start_epoch"),
            "cohort_week",
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    got = {(r[0], r[1]): r[2] for r in streamed.collect()}
    want = {(r[0], r[1]): r[2] for r in expect.collect()}
    assert got == want and len(want) > 0


def test_vocab_overlap_plan_term_keyed_join_no_cartesian(spark, sf_dir):
    import __spark_entry__ as entry

    plan = _plan(entry.queries()["source_vocab_jaccard"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan  # the size frames broadcast back


def test_decayed_popularity_plan_broadcast_ref_combinable_agg(spark, sf_dir):
    import __spark_entry__ as entry

    plan = _plan(entry.queries()["decayed_popularity_by_type"](spark, sf_dir))
    assert "partial_" in plan
    # the 1-row max-ts ref frame must BROADCAST onto the scan (a 1-row
    # nested loop), never a cartesian shuffle
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_chisq_plan_no_second_corpus_scan(spark, sf_dir):
    import __spark_entry__ as entry

    plan = _plan(entry.queries()["lang_source_chisq"](spark, sf_dir))
    # marginals re-aggregate the CELL frame: exactly one parquet scan
    assert plan.count("Scan parquet") <= 2  # cells scan (+ possible reuse print)
    assert "CartesianProduct" not in plan


# ---- wave-4 operators -----------------------------------------------------


def test_simhash_candidate_pairs_finds_near_identical_docs(spark):
    from smart_data_lake_spark.functions.dedup import simhash_candidate_pairs

    base = "the quick brown fox jumps over the lazy dog again and again " * 5
    rows = [
        (1, base),
        (2, base + " tail"),  # near-identical -> tiny hamming
        (3, "completely different content about databases and engines " * 5),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = simhash_candidate_pairs(df, max_hamming=3).collect()
    pairs = {(r["doc_a"], r["doc_b"]) for r in out}
    assert (1, 2) in pairs
    assert all(p in {(1, 2)} or 3 not in p for p in pairs)
    for r in out:
        assert 0 <= r["hamming"] <= 3
    with pytest.raises(ValueError, match="bands"):
        simhash_candidate_pairs(df, bits=32, bands=5)


def test_simhash_pairs_identical_docs_hamming_zero(spark):
    from smart_data_lake_spark.functions.dedup import simhash_candidate_pairs

    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma")], "doc_id long, text string"
    )
    out = simhash_candidate_pairs(df).collect()
    assert len(out) == 1 and out[0]["hamming"] == 0


def test_cusum_changepoint_locates_the_mean_shift(spark):
    from smart_data_lake_spark.functions.analytics import cusum_changepoint

    # level shift at index 10: 10 -> 20
    series = [10.0] * 10 + [20.0] * 10
    out = cusum_changepoint(_events(spark, series)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n"] == 20
    # |S_i| peaks at the LAST pre-shift point (event_id 9): S_9 = 9*? ->
    # mean = 15, S_i = -5i for i<=10 -> max |S| at i=10 (event_id 9)
    assert r["change_point_id"] == 9
    assert r["max_abs_cusum"] == pytest.approx(50.0, abs=1e-9)


def test_cusum_constant_series_zero(spark):
    from smart_data_lake_spark.functions.analytics import cusum_changepoint

    out = cusum_changepoint(_events(spark, [7.0] * 12)).collect()
    assert out[0]["max_abs_cusum"] == 0.0


def test_global_fixed_n_sample_exact_n_and_stable(spark):
    from smart_data_lake_spark.functions.sampling import global_fixed_n_sample

    rows = [(i, f"s{i % 5}") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    a = sorted(r["doc_id"] for r in global_fixed_n_sample(df, "doc_id", 17).collect())
    b = sorted(
        r["doc_id"]
        for r in global_fixed_n_sample(df.repartition(13), "doc_id", 17).collect()
    )
    assert a == b and len(a) == 17


def test_simhash_pairs_plan_banded_equijoin_never_all_pairs(spark, sf_dir):
    import __spark_entry__ as entry

    plan = _plan(entry.queries()["simhash_near_pairs"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_cusum_plan_shared_window_sort_no_global(spark, sf_dir):
    import __spark_entry__ as entry

    plan = _plan(entry.queries()["cusum_changepoint_by_type"](spark, sf_dir))
    assert "SinglePartition" not in plan
    assert "CartesianProduct" not in plan


def test_global_sample_plan_takeordered_not_global_sort(spark, sf_dir):
    import __spark_entry__ as entry

    plan = _plan(entry.queries()["global_docs_sample"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_chi_square_null_categories_excluded(spark):
    from pyspark.sql import types as T

    from smart_data_lake_spark.functions.profiling import chi_square_independence

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
        ]
    )
    # proportional 2x2 plus NULL-lang noise: NULLs must not corrupt chi2=0
    rows = []
    i = 0
    for lang, mult in (("en", 2), ("de", 1)):
        for src, n in (("s1", 10), ("s2", 20)):
            for _ in range(n * mult):
                rows.append((i, lang, src)); i += 1
    rows += [(i + j, None, "s1") for j in range(30)]
    df = spark.createDataFrame(rows, schema)
    out = chi_square_independence(df, "lang", "source").collect()[0]
    assert out["chi2"] == 0.0 and out["n"] == 90  # NULL rows excluded from N


def test_global_sample_null_keys_excluded(spark):
    from pyspark.sql import types as T

    from smart_data_lake_spark.functions.sampling import global_fixed_n_sample

    schema = T.StructType([T.StructField("doc_id", T.LongType())])
    df = spark.createDataFrame([(i,) for i in range(30)] + [(None,)] * 40, schema)
    out = [r["doc_id"] for r in global_fixed_n_sample(df, "doc_id", 25).collect()]
    assert len(out) == 25 and None not in out


def test_jpeg_roundtrip_skips_null_rows(spark):
    from pyspark.sql import types as T

    from smart_data_lake_spark.functions.multimodal import jpeg_roundtrip_features

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("n_chars", T.LongType())]
    )
    df = spark.createDataFrame([(1, 100), (2, None), (None, 50)], schema)
    out = jpeg_roundtrip_features(df).collect()
    assert [r["doc_id"] for r in out] == [1]


# ---- wave-5 operators -----------------------------------------------------


def test_ks_statistic_identical_and_disjoint(spark):
    from smart_data_lake_spark.functions.profiling import ks_statistic

    rows = [(i, "a", float(v)) for i, v in enumerate([1, 2, 3, 4, 5])] + [
        (i + 10, "b", float(v)) for i, v in enumerate([1, 2, 3, 4, 5])
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars double")
    out = ks_statistic(df, "n_chars", "source", "a", "b").collect()[0]
    assert out["ks"] == 0.0 and out["n_a"] == 5 and out["n_b"] == 5

    rows = [(i, "a", float(i)) for i in range(5)] + [
        (i + 10, "b", float(i + 100)) for i in range(5)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars double")
    out = ks_statistic(df, "n_chars", "source", "a", "b").collect()[0]
    assert out["ks"] == 1.0  # fully separated distributions
    assert out["at_value"] == 4.0  # D first hits 1.0 at a's max


def test_ks_statistic_hand_computed_shift(spark):
    from smart_data_lake_spark.functions.profiling import ks_statistic

    a = [1.0, 2.0, 3.0, 4.0]
    b = [3.0, 4.0, 5.0, 6.0]
    rows = [(i, "a", v) for i, v in enumerate(a)] + [
        (i + 10, "b", v) for i, v in enumerate(b)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars double")
    out = ks_statistic(df, "n_chars", "source", "a", "b").collect()[0]
    # at x=2: F_a = 2/4, F_b = 0 -> D = 0.5 (the max)
    assert out["ks"] == pytest.approx(0.5) and out["at_value"] == 2.0


def test_bigram_lm_scores_scrambled_text_lower(spark):
    from smart_data_lake_spark.functions.quality import bigram_logprob_score

    fluent = "the cat sat on the mat " * 10
    # same unigram profile, scrambled word order -> unseen bigrams -> lower
    scrambled = "cat the on sat mat the " * 10
    df = spark.createDataFrame(
        [(1, fluent), (2, fluent), (3, fluent), (4, scrambled)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in bigram_logprob_score(df).collect()}
    assert out[4]["avg_bigram_logprob"] < out[1]["avg_bigram_logprob"]
    assert out[1]["n_bigrams"] == 59


def test_bigram_lm_single_token_docs_excluded(spark):
    from smart_data_lake_spark.functions.quality import bigram_logprob_score

    df = spark.createDataFrame(
        [(1, "hello"), (2, "hello world")], "doc_id long, text string"
    )
    out = bigram_logprob_score(df).collect()
    assert [r["doc_id"] for r in out] == [2]


def test_ks_plan_window_only_on_aggregated_support(spark, sf_dir):
    import __spark_entry__ as entry

    plan = _plan(entry.queries()["length_drift_ks"](spark, sf_dir))
    # the single-partition window must sit ABOVE a partial aggregation
    # (distinct-value support), never directly on the corpus scan
    assert "partial_" in plan
    assert "CartesianProduct" not in plan


def test_bigram_lm_plan_key_joins_no_cartesian(spark, sf_dir):
    import __spark_entry__ as entry

    plan = _plan(entry.queries()["bigram_lm_docs"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    # only the 1-row vocab scalar may nested-loop broadcast
    assert plan.count("BroadcastNestedLoopJoin") <= 1


def test_minhash_calibration_estimates_track_exact(spark):
    from smart_data_lake_spark.functions.dedup import minhash_estimate_calibration

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    rows = [
        (1, base),
        (2, base),  # identical -> 12/12 matches, exact jaccard 1.0
        (3, base.replace("gamma", "lambda")),  # near-dup
        (4, "totally different words everywhere all over this text " * 5),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["est_matches"]: r for r in minhash_estimate_calibration(df).collect()}
    top = out[max(out)]
    assert top["est_jaccard"] == 1.0 and top["avg_exact_jaccard"] == 1.0
    assert top["mean_abs_error"] == 0.0
    # every bucket's estimate is k/12
    for k, r in out.items():
        assert r["est_jaccard"] == pytest.approx(k / 12, abs=1e-6)
        assert 0 <= r["mean_abs_error"] <= 1
