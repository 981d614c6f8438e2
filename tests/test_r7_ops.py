"""Round-7 operators: Count-Min-sketch heavy hitters, product quantization
(encode + ADC search). Unit behavior + the plan shapes the 100 TB posture
depends on. Cross-engine exactness is in test_cross_engine_properties.py;
oracle grading in __spark_entry__ (registered post-freeze for the r8
window)."""

import pytest
from pyspark.sql import functions as F

from smart_data_lake_spark.functions.profiling import cms_heavy_hitters
from smart_data_lake_spark.functions.similarity import pq_adc_topk, pq_encode


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_pq_seeds_encode_to_themselves(spark, emb):
    enc = pq_encode(emb)
    seeds = enc.orderBy("vec_id").limit(8).collect()
    for r in seeds:
        # a seed's nearest sub-centroid is itself in every subspace
        assert (r.code_0, r.code_1, r.code_2, r.code_3) == (r.vec_id,) * 4
        assert r.qerr == 0.0


def test_pq_codes_bounded_and_total(spark, emb):
    enc = pq_encode(emb, m=4, k=8)
    n = emb.count()
    assert enc.count() == n
    stats = enc.agg(
        *[F.min(f"code_{i}").alias(f"lo{i}") for i in range(4)],
        *[F.max(f"code_{i}").alias(f"hi{i}") for i in range(4)],
        F.min("qerr").alias("qlo"),
    ).collect()[0]
    for i in range(4):
        assert 0 <= stats[f"lo{i}"] and stats[f"hi{i}"] <= 7
    assert stats["qlo"] >= 0.0


def test_pq_adc_shape_and_ranks(spark, emb):
    out = pq_adc_topk(emb, n_queries=10, k_neighbors=5)
    rows = out.collect()
    assert len(rows) == 50
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r)
        assert r.query_id != r.neighbor_id
    assert set(per_q) == set(range(10))
    for q, rs in per_q.items():
        rs = sorted(rs, key=lambda r: r.rank)
        assert [r.rank for r in rs] == [1, 2, 3, 4, 5]
        dists = [r.adc_dist for r in rs]
        assert dists == sorted(dists)


def test_pq_adc_recall_vs_exact(spark, emb):
    """ADC is an approximation; sanity-bound its quality: over 10 queries,
    the ADC top-5 must recover a nontrivial share of the exact-cosine top-5
    (recall@5 >= 0.2 on the synthetic embeddings — PQ with m=4,k=8 on 64-d
    noise is coarse; the bound catches implementation inversions, e.g.
    max-instead-of-min, not tuning)."""
    import itertools

    adc = pq_adc_topk(emb, n_queries=10, k_neighbors=5).collect()
    got = {}
    for r in adc:
        got.setdefault(r.query_id, set()).add(r.neighbor_id)

    from smart_data_lake_spark.functions.similarity import brute_force_topk

    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = brute_force_topk(emb, queries, k=5).collect()
    want = {}
    for r in exact:
        want.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(len(got[q] & want[q]) for q in got if q in want)
    total = sum(len(want[q]) for q in got if q in want)
    assert total > 0 and hits / total >= 0.2


def test_pq_adc_plan_broadcasts_lut(spark, emb):
    plan = (
        pq_adc_topk(emb)._jdf.queryExecution().executedPlan().toString()
    )
    # database codes join the LUT via broadcast — never a shuffle keyed on
    # the full vector table, never a nested loop over vectors×queries
    assert "BroadcastHashJoin" in plan


def test_cms_finds_injected_heavy_hitter(spark):
    rows = [(i, "filler" + str(i)) for i in range(50)] + [
        (100 + i, "spam spam spam") for i in range(30)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.term: (r.cms_estimate, r.n_exact) for r in
           cms_heavy_hitters(df, phi_denominator=10).collect()}
    assert "spam" in out
    est, exact = out["spam"]
    assert exact == 90
    assert est >= exact  # CMS never under-counts
    # the unique filler tokens are each 1/140 of the stream — below 1/10
    assert all(t == "spam" for t in out)


def test_cms_estimate_upper_bounds_exact(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = cms_heavy_hitters(docs).collect()
    assert len(out) > 0
    assert all(r.cms_estimate >= r.n_exact for r in out)


def test_cms_collision_inflates_estimate_only(spark):
    """With a deliberately tiny sketch, estimates inflate but the exact
    column stays exact and no true heavy hitter is lost (no false
    negatives)."""
    rows = [(i, "alpha beta gamma delta") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.term: (r.cms_estimate, r.n_exact) for r in
           cms_heavy_hitters(df, depth=2, width=2, phi_denominator=5).collect()}
    assert set(out) == {"alpha", "beta", "gamma", "delta"}
    for est, exact in out.values():
        assert exact == 20 and est >= 20


def test_bpe_merge_candidates_weighted_by_word_freq(spark):
    from smart_data_lake_spark.functions.text import bpe_merge_candidates

    # vocab: 'ab' freq 3, 'abc' freq 1; single-char words ('z') contribute
    # nothing. Pair 'ab' = 3 (from 'ab') + 1 (inside 'abc') = 4; 'bc' = 1.
    df = spark.createDataFrame(
        [(1, "ab ab"), (2, "ab abc"), (3, "z z z")], "doc_id long, text string"
    )
    out = {r.pair: r.n_occurrences for r in bpe_merge_candidates(df).collect()}
    assert out == {"ab": 4, "bc": 1}


# --- PageRank (functions/graph) ---------------------------------------------

def _pr_edges(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string, weight long")


def test_pagerank_symmetric_cycle_uniform(spark):
    from smart_data_lake_spark.functions.graph import SCALE, pagerank

    # a 4-cycle: symmetry forces the uniform distribution at every iteration
    edges = _pr_edges(
        spark, [("a", "b", 1), ("b", "c", 1), ("c", "d", 1), ("d", "a", 1)]
    )
    out = {r.node: r.rank_e12 for r in pagerank(edges, weight_col="weight").collect()}
    assert set(out) == {"a", "b", "c", "d"}
    assert len(set(out.values())) == 1
    assert abs(out["a"] - SCALE // 4) <= 4  # integer-floor drift only


def test_pagerank_sink_accumulates_more_than_source(spark):
    from smart_data_lake_spark.functions.graph import pagerank

    # star into a hub: the hub must outrank every leaf
    edges = _pr_edges(
        spark, [("u1", "hub", 1), ("u2", "hub", 1), ("u3", "hub", 1), ("hub", "u1", 1)]
    )
    out = {r.node: r.rank_e12 for r in pagerank(edges, weight_col="weight").collect()}
    assert out["hub"] > max(out["u1"], out["u2"], out["u3"])


def test_pagerank_weight_shifts_mass(spark):
    from smart_data_lake_spark.functions.graph import pagerank

    # b gets 3x the edge weight of c from the same source -> higher rank
    edges = _pr_edges(spark, [("a", "b", 3), ("a", "c", 1), ("b", "a", 1), ("c", "a", 1)])
    out = {r.node: r.rank_e12 for r in pagerank(edges, weight_col="weight").collect()}
    assert out["b"] > out["c"]


def test_pagerank_mass_conserved_within_floor_drift(spark):
    from smart_data_lake_spark.functions.graph import SCALE, pagerank

    edges = _pr_edges(
        spark,
        [("a", "b", 2), ("b", "c", 1), ("c", "a", 5), ("c", "b", 1), ("b", "a", 3)],
    )
    pr = pagerank(edges, weight_col="weight", iterations=5)
    total = pr.agg(F.sum("rank_e12")).collect()[0][0]
    # no dangling nodes here: mass loss is only integer-floor drift,
    # bounded by ~(edges + nodes) per iteration
    assert SCALE * 0.999 < total <= SCALE


def test_token_transition_edges_counts_occurrences(spark):
    from smart_data_lake_spark.functions.graph import token_transition_edges

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b"), (3, ""), (4, "solo")], "doc_id long, text string"
    )
    out = {(r.src, r.dst): r.weight for r in token_transition_edges(docs).collect()}
    # "a b a b" -> (a,b) x2 + (b,a) x1 ; "a b" -> (a,b) ; empty + 1-token docs drop
    assert out == {("a", "b"): 3, ("b", "a"): 1}


# --- Bloom runtime filter (functions/runtime_filters) -----------------------

def test_bloom_no_false_negatives(spark):
    from smart_data_lake_spark.functions.runtime_filters import (
        bloom_build,
        bloom_filter_probe,
    )

    build = spark.range(0, 500).withColumnRenamed("id", "k")
    words = bloom_build(build, "k")
    kept = bloom_filter_probe(build, "k", words)
    # every build key must pass its own filter (Bloom never under-approximates)
    assert kept.count() == 500


def test_bloom_semi_join_equals_plain_semi_join(spark, sf_dir):
    from smart_data_lake_spark.functions.runtime_filters import bloom_semi_join

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    urgent = orders.where(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_orderkey").alias("l_orderkey")
    )
    got = bloom_semi_join(li, urgent, "l_orderkey")
    want = li.join(urgent, "l_orderkey", "left_semi")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_bloom_prunes_most_true_negatives(spark):
    from smart_data_lake_spark.functions.runtime_filters import (
        bloom_build,
        bloom_filter_probe,
    )

    build = spark.range(0, 1000).withColumnRenamed("id", "k")
    probe = spark.range(1000, 101000).withColumnRenamed("id", "k")  # disjoint
    words = bloom_build(build, "k")
    survivors = bloom_filter_probe(probe, "k", words).count()
    # m=2^16, k=2, n=1000 -> theoretical fp ~ 0.09%; allow 10x headroom
    assert survivors < 1000


def test_bloom_build_driver_traffic_is_bitmap_sized(spark):
    from smart_data_lake_spark.functions.runtime_filters import bloom_build

    words = bloom_build(spark.range(0, 10_000).withColumnRenamed("id", "k"), "k")
    assert len(words) == (1 << 16) // 64  # O(m), independent of build rows


def test_bloom_membership_test_stays_in_catalyst(spark):
    from smart_data_lake_spark.functions.runtime_filters import (
        bloom_build,
        bloom_filter_probe,
    )

    build = spark.range(0, 100).withColumnRenamed("id", "k")
    plan = bloom_filter_probe(
        spark.range(0, 1000).withColumnRenamed("id", "k"), "k", bloom_build(build, "k")
    )._jdf.queryExecution().executedPlan().toString()
    assert "xxhash64" in plan and "BatchEvalPython" not in plan


# --- Blocked fuzzy entity resolution (functions/linkage) --------------------

def test_blocked_name_pairs_blocks_and_threshold(spark):
    from smart_data_lake_spark.functions.linkage import blocked_name_pairs

    df = spark.createDataFrame(
        [(1, "red gear"), (2, "hot gear"), (3, "red bolt"), (4, "red gear"), (5, None)],
        "id long, name string",
    )
    got = {(r.name_a, r.name_b, r.dist) for r in blocked_name_pairs(df, "name").collect()}
    # gear-block pair matches at dist 3; bolt is alone in its block;
    # cross-block (red gear, red bolt) must NOT be compared despite dist 3
    assert got == {("hot gear", "red gear", 3)}


def test_blocked_name_pairs_never_cross_joins(spark):
    from smart_data_lake_spark.functions.linkage import blocked_name_pairs

    df = spark.createDataFrame([(1, "a x"), (2, "b y")], "id long, name string")
    plan = blocked_name_pairs(df, "name")._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_blocked_entity_matches_expands_ids(spark):
    from smart_data_lake_spark.functions.linkage import blocked_entity_matches

    df = spark.createDataFrame(
        [(1, "red gear"), (2, "hot gear"), (3, "red gear"), (4, "blue bolt")],
        "id long, name string",
    )
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in blocked_entity_matches(df, "id", "name").collect()
    }
    # exact-dup pair (1,3) at dist 0, fuzzy pairs across the two names:
    # hot gear rows x red gear rows = (2,1) and (2,3) as (a=hot, b=red)
    assert (1, 3, 0) in got
    fuzzy = {(a, b) for a, b, d in got if d == 3}
    assert fuzzy == {(2, 1), (2, 3)}
    assert all(d in (0, 3) for _, _, d in got)
    assert len(got) == 3


# --- Benford first-digit screen (functions/profiling) -----------------------

def test_benford_uniform_digits_and_exclusions(spark):
    from smart_data_lake_spark.functions.profiling import benford_first_digit

    # 9 rows, one per leading digit (values in dollars -> cents digits same),
    # plus null/zero/negative rows that must be excluded
    rows = [(float(d * 111),) for d in range(1, 10)] + [(None,), (0.0,), (-5.0,)]
    df = spark.createDataFrame(rows, "amount double")
    out = {r.digit: r for r in benford_first_digit(df, "amount").collect()}
    assert set(out) == set(range(1, 10))
    for d in range(1, 10):
        assert out[d].n_obs == 1
        assert abs(out[d].obs_frac - round(1 / 9, 6)) < 1e-9


def test_benford_missing_digit_rows_present_with_zero(spark):
    from smart_data_lake_spark.functions.profiling import benford_first_digit

    df = spark.createDataFrame([(123.0,), (145.0,)], "amount double")
    out = {r.digit: r.n_obs for r in benford_first_digit(df, "amount").collect()}
    assert out[1] == 2 and all(out[d] == 0 for d in range(2, 10))


def test_benford_cents_digit_extraction(spark):
    from smart_data_lake_spark.functions.profiling import benford_first_digit

    # 0.095 dollars -> 9 cents (leading digit 9, not 0); 950.00 -> digit 9
    df = spark.createDataFrame([(0.09,), (950.0,)], "amount double")
    out = {r.digit: r.n_obs for r in benford_first_digit(df, "amount").collect()}
    assert out[9] == 2


# --- IVF-PQ composition (pq_adc_topk with a coarse quantizer) ---------------

def test_ivfpq_neighbors_share_query_cell(spark, emb):
    import __spark_entry__ as entry
    from smart_data_lake_spark.functions.similarity import cell_assign_udf

    assign = cell_assign_udf(entry._IVF_CENTROIDS)
    cells = {
        r.vec_id: r.cell
        for r in emb.select("vec_id", assign(F.col("embedding")).alias("cell")).collect()
    }
    out = pq_adc_topk(emb, centroids=entry._IVF_CENTROIDS).collect()
    assert len(out) > 0
    for r in out:
        assert cells[r.query_id] == cells[r.neighbor_id]


def test_ivfpq_distances_match_plain_adc_on_shared_pairs(spark, emb):
    import __spark_entry__ as entry

    plain = {
        (r.query_id, r.neighbor_id): r.adc_dist
        for r in pq_adc_topk(emb, k_neighbors=1000).collect()
    }
    ivf = pq_adc_topk(emb, centroids=entry._IVF_CENTROIDS).collect()
    # raw-vector codes: the ADC distance of a pair is identical whether or
    # not the cell pruning admitted it
    for r in ivf:
        key = (r.query_id, r.neighbor_id)
        if key in plain:
            assert plain[key] == r.adc_dist


# --- Holt linear-trend smoothing (functions/analytics) ----------------------

def test_holt_constant_series_zero_trend(spark):
    from smart_data_lake_spark.functions.analytics import holt_linear_by_group

    import datetime as dt
    rows = [(i, dt.datetime(2024, 1, 1, 0, i), "g", 5.0) for i in range(10)]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string, value double")
    out = holt_linear_by_group(df, "event_type", "ts", "value", tiebreak_col="event_id").collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_points == 10 and r.level == 5.0 and r.trend == 0.0 and r.forecast_1 == 5.0


def test_holt_linear_series_recovers_slope(spark):
    from smart_data_lake_spark.functions.analytics import holt_linear_by_group

    import datetime as dt
    # perfectly linear series x_t = 2t: level tracks, trend -> 2, forecast
    # extrapolates the line exactly (Holt is exact on linear signals)
    rows = [(i, dt.datetime(2024, 1, 1, 0, i), "g", float(2 * i)) for i in range(20)]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string, value double")
    r = holt_linear_by_group(df, "event_type", "ts", "value", tiebreak_col="event_id").collect()[0]
    assert abs(r.trend - 2.0) < 1e-6
    assert abs(r.forecast_1 - 40.0) < 1e-6  # x_19 = 38, next = 40


def test_holt_short_groups_excluded(spark):
    from smart_data_lake_spark.functions.analytics import holt_linear_by_group

    import datetime as dt
    rows = [
        (1, dt.datetime(2024, 1, 1), "lonely", 1.0),
        (2, dt.datetime(2024, 1, 1), "pair", 1.0),
        (3, dt.datetime(2024, 1, 2), "pair", 3.0),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string, value double")
    out = {r.event_type for r in holt_linear_by_group(df, "event_type", "ts", "value", tiebreak_col="event_id").collect()}
    assert out == {"pair"}


def test_levenshtein_codepoint_semantics_pinned(spark):
    """Spark's levenshtein counts unicode CODEPOINTS (DuckDB's counts UTF-8
    bytes — measured 'café'/'cafe' = 1 vs 2). The graded ER twin relies on
    ASCII data where they agree; this pins the Spark-side semantics so a
    silent change would surface."""
    df = spark.createDataFrame([("café", "cafe")], "a string, b string")
    assert df.select(F.levenshtein("a", "b").alias("d")).collect()[0].d == 1


# --- sliding windows + hard negatives ----------------------------------------

def test_sliding_window_each_event_in_two_windows(spark):
    import datetime as dt

    from smart_data_lake_spark.streaming.operators import sliding_event_counts

    rows = [(1, dt.datetime(2024, 1, 1, 5, 30), 7, "click", 1.0, "{}")]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    # batch evaluation of the same plan (stream-batch consistent by design)
    out = sorted(
        (r.window_start_epoch, r.n_events)
        for r in sliding_event_counts(df).collect()
    )
    base = int(dt.datetime(2024, 1, 1, 5, 0).timestamp())
    assert out == [(base - 3600, 1), (base, 1)]


def test_hard_negatives_labels_always_differ(spark, emb):
    from smart_data_lake_spark.functions.similarity import hard_negative_topk

    out = hard_negative_topk(emb, k=5).collect()
    assert len(out) == 50
    for r in out:
        assert r.anchor_label != r.neighbor_label
        assert 1 <= r.rank <= 5


def test_hard_negatives_are_nearest_cross_label(spark, emb):
    from smart_data_lake_spark.functions.similarity import (
        brute_force_topk,
        hard_negative_topk,
    )

    hn = hard_negative_topk(emb, k=1).collect()
    labels = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}
    # the rank-1 hard negative must score >= every other cross-label vector
    # (spot-check against the exact full ranking for anchor 0)
    full = brute_force_topk(
        emb,
        emb.where(F.col("vec_id") == 0).select(F.col("vec_id").alias("query_id"), "embedding"),
        k=10_000,
    ).collect()
    a0 = [r for r in hn if r.anchor_id == 0][0]
    best_cross = max(
        (r.cos_sim for r in full if labels[r.neighbor_id] != labels[0]), default=None
    )
    assert a0.cos_sim == best_cross
