"""Unit + property tests for the r9 operator additions.

Statistics get brute-force cross-checks in plain Python (numpy where it
helps); the graph/cluster compositions get hand-built corpora with known
structure; the streaming top-k gets the stream-vs-batch equality check the
other streaming queries use.
"""

from __future__ import annotations

import datetime
import math

import pytest
from pyspark.sql import functions as F

from smart_data_lake_spark.functions.analytics import (
    burstiness_by_group,
    next_event_conditional_entropy,
    spearman_by_group,
    twap_by_group,
    winsorized_mean_by_group,
)
from smart_data_lake_spark.functions.linkage import entity_resolution_clusters
from smart_data_lake_spark.functions.search import (
    distinct_ngram_ratio,
    llr_collocations,
    tfidf_topk_neighbors,
)


def _ts(day, hour=12, minute=0):
    return datetime.datetime(2024, 3, day, hour, minute)


# ------------------------------------------------------------------ spearman


def _brute_spearman(xs, ys):
    """Average-rank Spearman via plain Python."""

    def avg_ranks(vals):
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        ranks = [0.0] * len(vals)
        i = 0
        while i < len(order):
            j = i
            while j + 1 < len(order) and vals[order[j + 1]] == vals[order[i]]:
                j += 1
            r = (i + j) / 2.0 + 1.0
            for t in range(i, j + 1):
                ranks[order[t]] = r
            i = j + 1
        return ranks

    ra, rb = avg_ranks(xs), avg_ranks(ys)
    n = len(xs)
    ma, mb = sum(ra) / n, sum(rb) / n
    num = sum((a - ma) * (b - mb) for a, b in zip(ra, rb))
    den = math.sqrt(
        sum((a - ma) ** 2 for a in ra) * sum((b - mb) ** 2 for b in rb)
    )
    return num / den


def test_spearman_matches_brute_force_with_ties(spark):
    xs = [1.0, 2.0, 2.0, 3.0, 5.0, 4.0, 2.5, 1.5]
    ys = [3, 1, 4, 1, 5, 9, 2, 6]
    rows = [("g", x, y) for x, y in zip(xs, ys)]
    df = spark.createDataFrame(rows, "g string, x double, y long")
    got = spearman_by_group(df, "g", "x", "y").collect()[0]
    assert got.n == len(xs)
    assert got.spearman_rho == pytest.approx(_brute_spearman(xs, ys), abs=1e-6)


def test_spearman_perfect_monotone_and_constant(spark):
    rows = [("up", float(i), i * 10) for i in range(6)]
    rows += [("flat", 1.0, i) for i in range(6)]
    df = spark.createDataFrame(rows, "g string, x double, y long")
    out = {r.g: r.spearman_rho for r in spearman_by_group(df, "g", "x", "y").collect()}
    assert out["up"] == pytest.approx(1.0, abs=1e-9)
    assert out["flat"] is None  # zero variance in x -> undefined, NULL not NaN


# ---------------------------------------------------------------- winsorized


def test_winsorized_mean_clamps_tails(spark):
    # 10 values, f=0.1 -> clamp 1 row each side: -100 -> 2, 100 -> 9
    vals = [-100.0, 2, 3, 4, 5, 6, 7, 8, 9, 100.0]
    rows = [("g", float(v), i) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g string, value double, event_id long")
    got = winsorized_mean_by_group(df, "g", "value", "event_id").collect()[0]
    expected = (2 + 2 + 3 + 4 + 5 + 6 + 7 + 8 + 9 + 9) / 10.0
    assert got.n == 10
    assert got.winsorized_mean == pytest.approx(expected, abs=1e-6)


def test_winsorized_small_group_unchanged(spark):
    # n < 10 with f=0.1 -> cut = 0, plain mean
    rows = [("g", float(v), i) for i, v in enumerate([1, 2, 3])]
    df = spark.createDataFrame(rows, "g string, value double, event_id long")
    got = winsorized_mean_by_group(df, "g", "value", "event_id").collect()[0]
    assert got.winsorized_mean == pytest.approx(2.0, abs=1e-9)


# ---------------------------------------------------------------- burstiness


def test_burstiness_poisson_like_and_bursty(spark):
    rows = []
    # 'steady': exactly 4 events every day for all 5 corpus days ->
    # variance 0, fano 0, burstiness (0-4)/(0+4) = -1
    for d in range(1, 6):
        for k in range(4):
            rows.append(("steady", _ts(d, hour=k)))
    # 'bursty': active on 2 of the 5 corpus days with counts [1, 9];
    # the CORPUS-WIDE span (5 days) is the denominator, so the series is
    # [1, 9, 0, 0, 0]: mean 2, var_pop (5*82-100)/25 = 12.4, fano 6.2
    rows += [("bursty", _ts(1))]
    rows += [("bursty", _ts(2, hour=h, minute=m)) for h in range(3) for m in range(3)]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    out = {r.event_type: r for r in burstiness_by_group(df, "event_type").collect()}
    assert out["steady"].n_days == 5 and out["steady"].n_active_days == 5
    assert out["steady"].fano_factor == pytest.approx(0.0, abs=1e-9)
    assert out["steady"].burstiness == pytest.approx(-1.0, abs=1e-9)
    assert out["bursty"].n_days == 5 and out["bursty"].n_active_days == 2
    assert out["bursty"].mean_daily == pytest.approx(2.0, abs=1e-9)
    assert out["bursty"].fano_factor == pytest.approx(12.4 / 2.0, abs=1e-6)
    sigma = math.sqrt(12.4)
    assert out["bursty"].burstiness == pytest.approx((sigma - 2) / (sigma + 2), abs=1e-6)


def test_burstiness_one_day_bot_reads_as_bursty(spark):
    """The r9 review scenario: 50 events in ONE day of a 10-day corpus must
    read as maximally bursty, not as 'one perfectly regular day' (the
    inversion an active-days-only denominator produced)."""
    rows = [("bot", _ts(1, hour=h % 24, minute=m)) for h in range(5) for m in range(10)]
    rows += [("background", _ts(d)) for d in range(1, 11)]  # pins the span
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    out = {r.event_type: r for r in burstiness_by_group(df, "event_type").collect()}
    bot = out["bot"]
    assert bot.n_days == 10 and bot.n_active_days == 1
    # series [50,0,...,0]: mean 5, var (10*2500-2500)/100 = 225, fano 45
    assert bot.mean_daily == pytest.approx(5.0, abs=1e-9)
    assert bot.fano_factor == pytest.approx(45.0, abs=1e-6)
    # sigma = 15, mean = 5 -> B = (15-5)/(15+5) = 0.5, firmly bursty
    assert bot.burstiness == pytest.approx(0.5, abs=1e-9)


# ---------------------------------------------------------- next-event entropy


def test_next_event_entropy_deterministic_and_uniform(spark):
    rows = []
    # user 1: a->b, b->a, a->b  (a always followed by b; b always by a)
    seq = ["a", "b", "a", "b"]
    rows += [(1, t, _ts(1, hour=i), i) for i, t in enumerate(seq)]
    # user 2: c followed once by x and once by y -> H(c) = ln 2
    # (x's own follow-up transition x->c doesn't touch a or b)
    for i, t in enumerate(["c", "x", "c", "y"]):
        rows.append((2, t, _ts(2, hour=i), 10 + i))
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp, event_id long")
    out = {r.event_type: r for r in next_event_conditional_entropy(df).collect()}
    assert out["a"].next_entropy == pytest.approx(0.0, abs=1e-9)
    assert out["c"].n_transitions == 2 and out["c"].n_next_types == 2
    assert out["c"].next_entropy == pytest.approx(math.log(2), abs=1e-6)


# ---------------------------------------------------------------------- twap


def test_twap_weights_by_time_not_row_count(spark):
    # value 10 held for 10s, then a burst of value 0 samples 1s apart:
    # row mean is dragged to ~0, TWAP stays near the duration-weighted mean
    rows = [("g", _ts(1, 12, 0), 10.0, 1)]
    rows.append(("g", datetime.datetime(2024, 3, 1, 12, 0, 10), 10.0, 2))
    rows.append(("g", datetime.datetime(2024, 3, 1, 12, 0, 11), 0.0, 3))
    rows.append(("g", datetime.datetime(2024, 3, 1, 12, 0, 12), 0.0, 4))
    df = spark.createDataFrame(rows, "g string, ts timestamp, value double, event_id long")
    got = twap_by_group(df, "g").collect()[0]
    # segments: 10s at 10.0, 1s at 5.0 (10->0 trapezoid), 1s at 0.0
    assert got.n_segments == 3
    assert got.total_span_sec == pytest.approx(12.0, abs=1e-9)
    assert got.twap == pytest.approx((100 + 5 + 0) / 12.0, abs=1e-6)


# ------------------------------------------------------------------ LLR (G2)


def _g2(k11, r1, c1, nn):
    def cell(k, row, col):
        return k * math.log(k * nn / (row * col)) if k > 0 else 0.0

    return 2.0 * (
        cell(k11, r1, c1)
        + cell(r1 - k11, r1, nn - c1)
        + cell(c1 - k11, nn - r1, c1)
        + cell(nn - r1 - c1 + k11, nn - r1, nn - c1)
    )


def test_llr_collocations_matches_hand_computation(spark):
    # 'new york' appears 6 times; fillers keep marginals interesting
    texts = ["new york " * 6 + "the cat sat on the mat"] + [
        "the dog sat on a log new day york minute" for _ in range(3)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r.collocation: r for r in llr_collocations(df, min_count=2, k=50).collect()}
    assert "new york" in got
    # hand-recompute the contingency table from raw bigram counts
    bigrams = []
    for t in texts:
        toks = t.lower().split()
        bigrams += list(zip(toks, toks[1:]))
    k11 = bigrams.count(("new", "york"))
    r1 = sum(1 for b in bigrams if b[0] == "new")
    c1 = sum(1 for b in bigrams if b[1] == "york")
    expected = _g2(k11, r1, c1, len(bigrams))
    assert got["new york"].n_pair == k11
    assert got["new york"].llr_g2 == pytest.approx(expected, abs=1e-5)


def test_llr_ranks_evidence_over_rarity(spark):
    # PMI's pathology: a 1-off pair of 1-off words scores max PMI; G2 must
    # rank the 20x-repeated collocation above it (min_count=1 to admit both)
    texts = ["strong pair " * 20 + "unique once"]
    df = spark.createDataFrame([(0, texts[0])], "doc_id long, text string")
    out = llr_collocations(df, min_count=1, k=5).collect()
    assert out[0].collocation == "strong pair"


# --------------------------------------------------------- distinct n-grams


def test_distinct_ngram_ratio_hand_check(spark):
    df = spark.createDataFrame(
        [
            (0, "rep", "a a a a"),          # 4 tokens, 1 type; 3 bigrams, 1 type
            (1, "div", "w x y z"),          # 4 tokens, 4 types; 3 bigrams, 3 types
            (2, "one", "solo"),             # 1 token; no bigrams
        ],
        "doc_id long, source string, text string",
    )
    out = {r.source: r for r in distinct_ngram_ratio(df).collect()}
    assert out["rep"].distinct1 == pytest.approx(0.25)
    assert out["rep"].distinct2 == pytest.approx(1 / 3, abs=1e-6)
    assert out["div"].distinct1 == pytest.approx(1.0)
    assert out["div"].distinct2 == pytest.approx(1.0)
    assert out["one"].n_bigrams == 0 and out["one"].distinct2 is None


# --------------------------------------------------------- entity clusters


def test_entity_resolution_clusters_transitive_closure(spark):
    # chain within distance 1: ACMECORP ~ ACMECORX ~ ACMECORY (transitive),
    # and an unrelated pair; singletons absent
    names = ["ACMECORP", "ACMECORX", "ACMECORY", "ZEBRAINC", "ZEBRAINK", "LONERSOLO"]
    df = spark.createDataFrame([(n,) for n in names], "s_name string")
    got = {
        (r.cluster_id, r.n_names, r.canonical_name)
        for r in entity_resolution_clusters(df, "s_name", max_dist=1).collect()
    }
    assert got == {
        ("ACMECORP", 3, "ACMECORP"),  # ties on length -> lexicographic min
        ("ZEBRAINC", 2, "ZEBRAINC"),
    }


def test_entity_clusters_canonical_prefers_longest(spark):
    df = spark.createDataFrame(
        [("DATACO",), ("DATACOR",)], "s_name string"
    )  # dist 1, different lengths
    got = entity_resolution_clusters(df, "s_name", max_dist=1).collect()
    assert len(got) == 1 and got[0].canonical_name == "DATACOR"


# ------------------------------------------------------- tfidf topk neighbors


def test_tfidf_topk_neighbors_bounded_and_symmetric(spark):
    base = "alpha beta gamma delta epsilon zeta"
    rows = [(i, base) for i in range(6)]  # 6 identical docs: 15 pairs
    rows.append((99, "totally different words here now friends"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = tfidf_topk_neighbors(df, k=3, min_cosine_num=1, min_cosine_den=2).collect()
    per_doc = {}
    for r in out:
        per_doc.setdefault(r.doc, []).append(r)
    # every identical doc emits exactly k=3 rows (not 5 pairs), ranked 1..3
    for d in range(6):
        assert sorted(r.rk for r in per_doc[d]) == [1, 2, 3]
        assert all(r.cosine == pytest.approx(1.0, abs=1e-6) for r in per_doc[d])
        # tie-break on neighbor id: the 3 smallest other ids
        expected = sorted(x for x in range(6) if x != d)[:3]
        assert [r.neighbor for r in sorted(per_doc[d], key=lambda r: r.rk)] == expected
    assert 99 not in per_doc  # below the floor -> absent


# ------------------------------------------------------ streaming topk window


def test_streaming_topk_matches_batch(spark, sf_dir):
    from smart_data_lake_spark.streaming.operators import (
        rank_topk_per_window,
        read_events_batch,
        read_events_stream,
        run_available_now,
        topk_per_window,
    )

    sdf = read_events_stream(spark, sf_dir)
    drained = run_available_now(topk_per_window(sdf))
    got = rank_topk_per_window(drained, k=3).orderBy("window_start_epoch", "rk").collect()

    bdf = read_events_batch(spark, sf_dir)
    batch_agg = (
        bdf.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value"), 6).cast("decimal(18,6)")).alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start_epoch"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    want = rank_topk_per_window(batch_agg, k=3).orderBy("window_start_epoch", "rk").collect()
    assert got == want
    assert len(got) > 0


# ------------------------------------------------------------- kendall tau-b


def test_kendall_tau_matches_brute_force(spark):
    from smart_data_lake_spark.functions.analytics import (
        kendall_tau_daily_level_volume,
    )

    # 5 days: per-day (mean, count) with ties in both variables
    days = {1: [10.0, 10.0], 2: [20.0], 3: [20.0], 4: [5.0, 5.0, 5.0], 5: [30.0]}
    rows = []
    eid = 0
    for d, vals in days.items():
        for h, v in enumerate(vals):
            rows.append(("g", _ts(d, hour=h), v, eid))
            eid += 1
    df = spark.createDataFrame(rows, "g string, ts timestamp, value double, event_id long")
    got = kendall_tau_daily_level_volume(df, "g").collect()[0]

    means = [sum(v) / len(v) for v in days.values()]
    counts = [len(v) for v in days.values()]
    conc = disc = tx = ty = 0
    n = len(means)
    for i in range(n):
        for j in range(i + 1, n):
            xc = (means[j] > means[i]) - (means[j] < means[i])
            yc = (counts[j] > counts[i]) - (counts[j] < counts[i])
            if xc * yc > 0:
                conc += 1
            elif xc * yc < 0:
                disc += 1
            if xc == 0:
                tx += 1
            if yc == 0:
                ty += 1
    n0 = n * (n - 1) // 2
    expected = (conc - disc) / math.sqrt((n0 - tx) * (n0 - ty))
    assert got.n_day_pairs == n0
    assert (got.n_concordant, got.n_discordant) == (conc, disc)
    assert got.kendall_tau_b == pytest.approx(expected, abs=1e-6)


def test_kendall_tau_all_tied_is_null(spark):
    from smart_data_lake_spark.functions.analytics import (
        kendall_tau_daily_level_volume,
    )

    rows = [("g", _ts(d), 7.0, d) for d in range(1, 4)]  # same mean+count daily
    df = spark.createDataFrame(rows, "g string, ts timestamp, value double, event_id long")
    got = kendall_tau_daily_level_volume(df, "g").collect()[0]
    assert got.kendall_tau_b is None  # zero denominator -> NULL, not NaN


# -------------------------------------------------------- markov stationary


def test_markov_stationary_absorbing_sink(spark):
    from smart_data_lake_spark.functions.graph import markov_stationary

    trans = spark.createDataFrame([("a", "b", 1)], "src string, dst string, c long")
    out = {r.node: r.stationary_e12 for r in markov_stationary(trans, iterations=3).collect()}
    # a pushes all mass to b in iteration 1; b (sink) keeps everything
    assert out == {"a": 0, "b": 2 * 10**12}


def test_markov_stationary_matches_integer_simulation(spark):
    from smart_data_lake_spark.functions.graph import SCALE, markov_stationary

    edges = [("a", "b", 3), ("a", "c", 1), ("b", "a", 1), ("b", "c", 1)]
    trans = spark.createDataFrame(edges, "src string, dst string, c long")
    got = {r.node: r.stationary_e12 for r in markov_stationary(trans, iterations=3).collect()}

    # plain-integer simulation of the same recurrence (floor division)
    nodes = ["a", "b", "c"]
    out_tot = {"a": 4, "b": 2}
    x = {n: SCALE for n in nodes}
    for _ in range(3):
        nxt = {n: 0 for n in nodes}
        for s, d, c in edges:
            nxt[d] += (x[s] * c) // out_tot[s]
        nxt["c"] += x["c"]  # sink keeps its mass
        x = nxt
    assert got == x


def test_kendall_tau_volume_counts_null_value_events(spark):
    """r9 review: volume must count ALL events on a day — heartbeat rows
    without a measurement still are load; only the level mean is
    restricted to measured rows."""
    from smart_data_lake_spark.functions.analytics import (
        kendall_tau_daily_level_volume,
    )

    rows = [
        # day 1: 1 measured event, low value
        ("g", _ts(1), 1.0, 1),
        # day 2: 1 measured (high value) + 3 NULL heartbeats -> the BUSY day
        ("g", _ts(2), 9.0, 2),
        ("g", _ts(2, hour=13), None, 3),
        ("g", _ts(2, hour=14), None, 4),
        ("g", _ts(2, hour=15), None, 5),
        # day 3: all-NULL day -> no level, excluded from pairing
        ("g", _ts(3), None, 6),
    ]
    df = spark.createDataFrame(rows, "g string, ts timestamp, value double, event_id long")
    got = kendall_tau_daily_level_volume(df, "g").collect()[0]
    # only days 1 and 2 pair; day 2 is both busier (4 > 1) and hotter
    # (9 > 1) -> one concordant pair, tau = 1
    assert got.n_day_pairs == 1
    assert (got.n_concordant, got.n_discordant) == (1, 0)
    assert got.kendall_tau_b == 1.0


def test_markov_stationary_ignores_null_states(spark):
    """r9 review: NULL is not a state — edges touching NULL are dropped
    explicitly, identically in the oracle."""
    from smart_data_lake_spark.functions.graph import markov_stationary

    trans = spark.createDataFrame(
        [("a", "b", 1), (None, "a", 5), ("b", None, 7)],
        "src string, dst string, c long",
    )
    out = {r.node: r.stationary_e12 for r in markov_stationary(trans, iterations=3).collect()}
    assert out == {"a": 0, "b": 2 * 10**12}
