"""Unit + property tests for the r8 operator additions.

The two pruning joins (prefix-filtered Jaccard, q-gram edit distance) get
brute-force equivalence properties — the pruning lemmas are the part a unit
test can't be trusted to cover; the analytics get closed-form hand checks.
"""

from __future__ import annotations

import datetime
import math
import random

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from smart_data_lake_spark.functions.analytics import (
    sequential_pattern_support,
    survival_hazard_curve,
    theil_sen_trend_by_group,
    two_proportion_ab_test,
    user_behavior_entropy,
    xcorr_lags,
)
from smart_data_lake_spark.functions.dedup import jaccard_prefix_join
from smart_data_lake_spark.functions.linkage import qgram_editdist_pairs
from smart_data_lake_spark.functions.profiling import fd_histogram, gini_by_group
from smart_data_lake_spark.functions.search import tfidf_cosine_pairs


def _ts(day, hour=12):
    return datetime.datetime(2024, 3, day, hour)


# ---------------------------------------------------------------- prefix join


def _brute_jaccard_pairs(docs, n, tau_num, tau_den):
    """Reference implementation over Python sets (shingle_n=n)."""
    sets = {}
    for doc_id, text in docs:
        toks = text.lower().split()
        if len(toks) >= n:
            sets[doc_id] = {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}
    out = set()
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            uni = len(sets[a] | sets[b])
            if uni and inter * tau_den >= tau_num * uni:
                out.add((a, b))
    return out


def test_jaccard_prefix_join_equals_brute_force(spark):
    """The prefix filter must be EXACT: same pair set as the all-pairs
    brute force, on a corpus with planted near-dups, exact dups, disjoint
    docs, and too-short docs."""
    rng = random.Random(8)
    vocab = [f"w{i}" for i in range(50)]
    docs = []
    for i in range(40):
        docs.append((i, " ".join(rng.choices(vocab, k=rng.randint(2, 30)))))
    # planted near-dups: copy with small tail edits
    for i in range(10):
        base = docs[i][1].split()
        base[-1] = "zz"
        docs.append((100 + i, " ".join(base)))
    docs.append((200, docs[0][1]))  # exact dup
    df = spark.createDataFrame(docs, "doc_id int, text string")
    got = {
        (r["doc_a"], r["doc_b"])
        for r in jaccard_prefix_join(df, threshold_num=7, threshold_den=10).collect()
    }
    assert got == _brute_jaccard_pairs(docs, 3, 7, 10)


def test_jaccard_prefix_join_values(spark):
    """Emitted intersection/union/jaccard are the exact set statistics."""
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d f")], "doc_id int, text string"
    )
    # 3-shingles: doc1 {abc,bcd,cde}, doc2 {abc,bcd,cdf} -> inter 2, union 4
    [r] = jaccard_prefix_join(df, threshold_num=5, threshold_den=10).collect()
    assert (r["n_shared_tokens"], r["n_union_tokens"]) == (2, 4)
    assert r["jaccard"] == 0.5


# ------------------------------------------------------------- q-gram joins


def _brute_editdist_pairs(names, k):
    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
        return dp[-1]

    out = set()
    uniq = sorted(set(names))
    for i, a in enumerate(uniq):
        for b in uniq[i + 1 :]:
            d = lev(a, b)
            if 0 < d <= k:
                out.add((a, b, d))
    return out


def test_qgram_editdist_pairs_equals_brute_force(spark):
    """Prefix-filtered edit-distance join is EXACT, including the short-
    string fallback bucket and the short-vs-long boundary."""
    rng = random.Random(8)
    names = []
    for i in range(60):
        names.append(f"item-{rng.randint(0, 99):02d}-{rng.choice('abc')}")
    names += ["ab", "ac", "abc", "abcd", "abcde", "abcdef", "a", ""]
    names += [f"item-00-a", f"item-00-b"]  # guaranteed dist-1 pair
    df = spark.createDataFrame([(n,) for n in names if n], "name string")
    for k in (1, 2):
        got = {
            (r["name_a"], r["name_b"], r["dist"])
            for r in qgram_editdist_pairs(df, "name", max_dist=k).collect()
        }
        assert got == _brute_editdist_pairs([n for n in names if n], k), f"k={k}"


# ---------------------------------------------------------------- analytics


def test_theil_sen_outlier_immunity(spark):
    """One wildly corrupted day cannot move the Theil-Sen slope off the
    clean trend (while the OLS slope would move): clean slope 2/day."""
    rows = []
    eid = 0
    for d in range(1, 12):
        v = 2.0 * d if d != 6 else 10_000.0  # day 6 corrupted
        for _ in range(3):
            rows.append(Row(event_type="a", event_id=eid, ts=_ts(d), value=v))
            eid += 1
    out = theil_sen_trend_by_group(spark.createDataFrame(rows)).collect()
    assert len(out) == 1
    assert abs(out[0]["ts_slope"] - 2.0) < 1e-9


def test_xcorr_lags_detects_shift(spark):
    """B shifted 2 days earlier than A -> lag-2 correlation is exactly 1."""
    rng = random.Random(8)
    rows = []
    eid = 0
    series = [rng.uniform(1, 9) for _ in range(16)]
    for d in range(1, 13):
        rows.append(Row(event_type="A", event_id=(eid := eid + 1), ts=_ts(d), value=series[d]))
        rows.append(Row(event_type="B", event_id=(eid := eid + 1), ts=_ts(d), value=series[d + 2]))
    out = {r["lag"]: r["xcorr"] for r in xcorr_lags(
        spark.createDataFrame(rows), "B", "A", max_lag=3
    ).collect()}
    # B's value on day d equals A's on day d+2 -> comparing B(d) with A(d-lag):
    # perfect correlation when lag = -2... so test the other direction:
    out2 = {r["lag"]: r["xcorr"] for r in xcorr_lags(
        spark.createDataFrame(rows), "A", "B", max_lag=3
    ).collect()}
    assert out2[2] == 1.0
    assert all(abs(v) < 1.0 for lag, v in out2.items() if lag != 2 and v is not None)


def test_survival_curve_hand_example(spark):
    """4 signups: conversions on day 0 and day 2, two never (censored at
    horizon day 3): KM survival = (1-1/4) after t0, then (1-1/4)(1-1/3)."""
    rows = [
        Row(user_id=1, event_type="signup", ts=_ts(1), event_id=1, value=0.0),
        Row(user_id=1, event_type="purchase", ts=_ts(1, 18), event_id=2, value=0.0),  # day 0
        Row(user_id=2, event_type="signup", ts=_ts(1), event_id=3, value=0.0),
        Row(user_id=2, event_type="purchase", ts=_ts(3, 14), event_id=4, value=0.0),  # day 2
        Row(user_id=3, event_type="signup", ts=_ts(1), event_id=5, value=0.0),
        Row(user_id=4, event_type="signup", ts=_ts(1), event_id=6, value=0.0),
        Row(user_id=5, event_type="view", ts=_ts(4), event_id=7, value=0.0),  # horizon
    ]
    out = {r["days_since_signup"]: r for r in survival_hazard_curve(
        spark.createDataFrame(rows)
    ).collect()}
    assert out[0]["n_at_risk"] == 4 and out[0]["n_converted"] == 1
    assert abs(out[0]["km_survival"] - 0.75) < 1e-6
    assert out[2]["n_at_risk"] == 3 and out[2]["n_converted"] == 1
    assert abs(out[2]["km_survival"] - 0.75 * (2 / 3)) < 1e-6
    assert abs(out[2]["cum_hazard"] - (0.25 + 1 / 3)) < 1e-6


def test_two_proportion_ab_hand_counts(spark):
    """Even users convert 2/3, odd users 1/3 -> z matches the closed form."""
    rows = []
    for u in range(6):
        rows.append(Row(user_id=u, event_type="view", ts=_ts(1), event_id=u, value=0.0))
    for u in (0, 2, 1):  # conversions: evens 0,2; odd 1
        rows.append(Row(user_id=u, event_type="purchase", ts=_ts(2), event_id=10 + u, value=0.0))
    [r] = two_proportion_ab_test(spark.createDataFrame(rows)).collect()
    assert (r["n_control"], r["conv_control"], r["n_treatment"], r["conv_treatment"]) == (3, 2, 3, 1)
    p = 3 / 6
    z = (1 / 3 - 2 / 3) / math.sqrt(p * (1 - p) * (1 / 3 + 1 / 3))
    assert abs(r["z_score"] - round(z, 6)) < 1e-9


def test_user_behavior_entropy_bounds(spark):
    """Uniform 4-type user -> ln(4); single-type user -> 0."""
    rows = [Row(user_id=1, event_type=t, ts=_ts(1), event_id=i, value=0.0)
            for i, t in enumerate(["a", "b", "c", "d"])]
    rows += [Row(user_id=2, event_type="a", ts=_ts(1), event_id=10 + i, value=0.0)
             for i in range(5)]
    out = {r["user_id"]: r for r in user_behavior_entropy(spark.createDataFrame(rows)).collect()}
    assert abs(out[1]["entropy"] - round(math.log(4), 6)) < 1e-6
    assert out[1]["n_types"] == 4
    assert out[2]["entropy"] == 0.0


def test_sequential_pattern_any_gap_vs_adjacent(spark):
    """A->C is supported with a B between them (adjacent transitions would
    miss it); C->A is not."""
    rows = [
        Row(user_id=1, event_type="A", ts=_ts(1), event_id=1, value=0.0),
        Row(user_id=1, event_type="B", ts=_ts(2), event_id=2, value=0.0),
        Row(user_id=1, event_type="C", ts=_ts(3), event_id=3, value=0.0),
    ]
    out = {(r["type_a"], r["type_b"]): r for r in sequential_pattern_support(
        spark.createDataFrame(rows)
    ).collect()}
    assert out[("A", "C")]["n_users_ordered"] == 1
    assert out[("C", "A")]["n_users_ordered"] == 0
    assert out[("A", "C")]["support_ratio"] == 1.0


# ----------------------------------------------------------------- profiling


def test_gini_extremes(spark):
    """All-equal values -> 0; single holder of everything -> (n-1)/n."""
    rows = [("even", f"k{i}", 10.0) for i in range(8)]
    rows += [("skew", f"k{i}", 0.0) for i in range(7)] + [("skew", "k7", 100.0)]
    df = spark.createDataFrame(rows, "g string, k string, v double")
    out = {r["g"]: r["gini"] for r in gini_by_group(df, "g", "k", "v").collect()}
    assert out["even"] == 0.0
    assert abs(out["skew"] - round(7 / 8, 6)) < 1e-9


def test_fd_histogram_partitions_all_rows(spark):
    """Bin counts sum to n; edges are contiguous; max value lands in the
    last bin (closed top edge)."""
    rng = random.Random(8)
    vals = [rng.gauss(50, 10) for _ in range(500)] + [120.0]  # outlier
    df = spark.createDataFrame([(v,) for v in vals], "value double")
    out = fd_histogram(df, "value").collect()
    assert sum(r["n_rows"] for r in out) == 501
    bins = [r["bin"] for r in out]
    assert bins == sorted(bins)
    assert out[-1]["n_rows"] >= 1  # the outlier is in the last bin


# -------------------------------------------------------------------- search


def test_tfidf_cosine_pairs_identical_docs(spark):
    """Identical docs -> cosine exactly 1; a disjoint doc pairs with
    nobody."""
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "zeta eta theta")],
        "doc_id int, text string",
    )
    out = tfidf_cosine_pairs(df, min_cosine_num=90, min_cosine_den=100).collect()
    assert [(r["doc_a"], r["doc_b"], r["cosine"]) for r in out] == [(1, 2, 1.0)]


def test_tfidf_cosine_pairs_matches_brute_force(spark):
    """Posting-list join computes the same cosines as a dense brute force
    over the full vocabulary."""
    rng = random.Random(8)
    vocab = [f"w{i}" for i in range(12)]
    docs = [(i, " ".join(rng.choices(vocab, k=rng.randint(3, 20)))) for i in range(15)]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    got = {(r["doc_a"], r["doc_b"]): r["cosine"] for r in tfidf_cosine_pairs(
        df, min_cosine_num=0, min_cosine_den=100, shingle_n=1
    ).collect()}
    # dense reference
    n = len(docs)
    tf = [{t: d[1].split().count(t) for t in set(d[1].split())} for d in docs]
    dfreq = {t: sum(1 for v in tf if t in v) for t in vocab}
    vecs = [
        {t: round(c * (math.log((1 + n) / (1 + dfreq[t])) + 1), 6) for t, c in v.items()}
        for v in tf
    ]
    for i in range(n):
        for j in range(i + 1, n):
            shared = set(vecs[i]) & set(vecs[j])
            if not shared:
                assert (i, j) not in got
                continue
            dot = sum(vecs[i][t] * vecs[j][t] for t in shared)
            na = math.sqrt(sum(w * w for w in vecs[i].values()))
            nb = math.sqrt(sum(w * w for w in vecs[j].values()))
            assert abs(got[(i, j)] - round(dot / (na * nb), 6)) < 1e-6, (i, j)


# ------------------------------------------------------------- historization


def test_snapshot_as_of_matches_keep_latest(spark):
    """The snapshot at T equals the latest event state per user among
    events at or before T."""
    from smart_data_lake_spark.historization import historize_event_log, snapshot_as_of

    rng = random.Random(8)
    rows = []
    eid = 0
    for u in range(12):
        for d in sorted(rng.sample(range(1, 20), 6)):
            rows.append(
                Row(user_id=u, ts=_ts(d), event_id=(eid := eid + 1),
                    event_type=rng.choice("abc"))
            )
    df = spark.createDataFrame(rows)
    hist = historize_event_log(
        df, pks=["user_id"], state_cols=["event_type"], ts_col="ts",
        tiebreaker_cols=["event_id"],
    )
    t = _ts(10, 13)
    snap = {(r["user_id"], r["event_type"]) for r in snapshot_as_of(hist, t).collect()}
    expected = {
        (r["user_id"], r["event_type"])
        for r in df.where(F.col("ts") <= F.lit(t))
        .withColumn(
            "rn",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"]).Window
                .partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
            ),
        )
        .where("rn = 1")
        .collect()
    }
    assert snap == expected


def test_fd_histogram_degenerate_iqr(spark):
    """r8 review: q1 == q3 (zero IQR) must fall back to one [mn, mx] bin
    instead of dividing by a zero width; a fully-constant column also
    works."""
    df = spark.createDataFrame([(1.0,)] * 8 + [(9.0,)], "value double")
    out = fd_histogram(df, "value").collect()
    assert sum(r["n_rows"] for r in out) == 9
    assert out[0]["bin"] == 0 and out[0]["bin_lo"] == 1.0
    const = spark.createDataFrame([(5.0,)] * 4, "value double")
    [r] = fd_histogram(const, "value").collect()
    assert (r["bin"], r["n_rows"]) == (0, 4)


# --------------------------------------------------------------------- graph


def test_hits_known_graph(spark):
    """Star graph: hub center pointing at 3 sinks — the center is the max
    hub (normalized to SCALE) with authority 0; sinks are equal max
    authorities with hub 0."""
    from smart_data_lake_spark.functions.graph import SCALE, hits

    edges = spark.createDataFrame(
        [("c", "s1"), ("c", "s2"), ("c", "s3")], "src string, dst string"
    )
    out = {r["node"]: (r["authority_e12"], r["hub_e12"]) for r in hits(edges).collect()}
    assert out["c"] == (0, SCALE)
    assert out["s1"] == out["s2"] == out["s3"] == (SCALE, 0)


def test_hits_weighted_ranks(spark):
    """A doubly-weighted edge makes its target the strictly top authority."""
    from smart_data_lake_spark.functions.graph import hits

    edges = spark.createDataFrame(
        [("a", "x", 2), ("b", "x", 2), ("a", "y", 1), ("b", "y", 1)],
        "src string, dst string, weight int",
    )
    out = {r["node"]: r["authority_e12"] for r in hits(edges, weight_col="weight").collect()}
    assert out["x"] > out["y"] > 0


def test_vocab_coverage_curve_values(spark):
    """Hand corpus: top-1 term covers its exact token share; coverage is
    monotone in N and total/term counts are exact."""
    from smart_data_lake_spark.functions.search import vocab_coverage_curve

    df = spark.createDataFrame(
        [("s", "a a a a b b c"), ("s", "a b d")], "source string, text string"
    )
    out = {r["top_n"]: r for r in vocab_coverage_curve(df, tops=(1, 2)).collect()}
    # counts: a=5, b=3, c=1, d=1; total 10
    assert out[1]["covered_tokens"] == 5 and out[1]["total_tokens"] == 10
    assert out[1]["coverage"] == 0.5
    assert out[2]["covered_tokens"] == 8 and out[2]["n_terms"] == 4


def test_qgram_editdist_pairs_repeated_gram_multisets(spark):
    """Duplicate-gram-heavy strings (runs of one character) pin the
    MULTISET occurrence numbering of the r9 follow-up array-side (gram,
    occ) build: 'aaaaaaaa'-family strings share every gram TEXT, so only
    correct occurrence indexing keeps the prefix filter complete and the
    join non-degenerate."""
    names = [
        "aaaaaaaa",      # 8 a's
        "aaaaaaab",      # dist 1 (sub)
        "aaaaaaa",       # 7 a's: dist 1 (del)
        "aaabaaaa",      # dist 1 (sub mid)
        "aabbaaaa",      # dist 2
        "abababab",
        "babababa",      # dist 2 from abababab
        "aaaaaaaaaa",    # 10 a's: dist 2
    ]
    df = spark.createDataFrame([(n,) for n in names], "name string")
    for k in (1, 2):
        got = {
            (r["name_a"], r["name_b"], r["dist"])
            for r in qgram_editdist_pairs(df, "name", max_dist=k).collect()
        }
        assert got == _brute_editdist_pairs(names, k), f"k={k}"
