"""Known-value unit tests for the 10 r11 operators (Kruskal-Wallis, CMH,
Page-Hinkley, Gumbel return level, Theil index, longest streak, Simpson
diversity, Yule's K, vocabulary churn, Cohen's kappa). Values hand-computed
from the textbook definitions; cross-engine parity lives in
test_r11b_sweep_properties."""

from __future__ import annotations

import datetime as dt
import math
import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_T0 = dt.datetime(2024, 1, 1)


def _events(spark, rows):
    """rows: (event_id, user_id, event_type, value, hours_offset)"""
    return spark.createDataFrame(
        [
            (eid, _T0 + dt.timedelta(hours=h), uid, et, float(v), "")
            for (eid, uid, et, v, h) in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_kruskal_wallis_separated_groups(spark):
    from smart_data_lake_spark.functions.analytics import kruskal_wallis_by_group

    rows = [(i, 0, "a", v, i) for i, v in enumerate([1, 2, 3])]
    rows += [(10 + i, 0, "b", v, i) for i, v in enumerate([10, 11, 12])]
    out = kruskal_wallis_by_group(_events(spark, rows)).collect()[0]
    # R_a = 6, R_b = 15; H = 12/42*(36/3 + 225/3) - 21 = 3.857142857...
    assert out["n_groups"] == 2 and out["n_total"] == 6
    assert out["h_statistic"] == 3.857143
    assert out["h_tie_corrected"] == 3.857143  # no ties


def test_kruskal_wallis_all_ties_null_correction(spark):
    from smart_data_lake_spark.functions.analytics import kruskal_wallis_by_group

    rows = [(i, 0, "a" if i < 2 else "b", 7.0, i) for i in range(4)]
    out = kruskal_wallis_by_group(_events(spark, rows)).collect()[0]
    # every value identical: tie3 = N^3 - N, correction factor 0 -> NULL
    assert out["h_tie_corrected"] is None


def test_cmh_two_identical_strata(spark):
    from smart_data_lake_spark.functions.analytics import cmh_test_stratified

    # per stratum: treatment (x=1) 2 rows 1 success, control 2 rows 0
    rows = []
    for s in ("P1", "P2"):
        rows += [(s, 1, 1), (s, 1, 0), (s, 0, 0), (s, 0, 0)]
    df = spark.createDataFrame(rows, "s string, x int, y int")
    out = cmh_test_stratified(df, "s", F.col("x"), F.col("y")).collect()[0]
    # per stratum: a=1, E = 2*1/4 = 0.5, V = 2*2*1*3/(16*3) = 0.25
    assert out["n_strata"] == 2 and out["sum_a"] == 2
    assert out["sum_expected"] == 1.0
    # (|2-1| - 0.5)^2 / 0.5 = 0.5
    assert out["cmh_statistic"] == 0.5


def test_page_hinkley_level_shift(spark):
    from smart_data_lake_spark.functions.analytics import page_hinkley_by_group

    vals = [0.0, 0.0, 0.0, 10.0]
    rows = [(i, 0, "a", v, i) for i, v in enumerate(vals)]
    out = page_hinkley_by_group(_events(spark, rows)).collect()[0]
    # running means 0,0,0,2.5; d_i = x_i - mean_i - 0.005:
    # U = -.005, -.01, -.015, 7.48; PH = 7.48 - (-0.015) = 7.495
    assert out["n_obs"] == 4
    assert float(out["ph_stat"]) == 7.495


def test_page_hinkley_constant_series_is_zero(spark):
    from smart_data_lake_spark.functions.analytics import page_hinkley_by_group

    rows = [(i, 0, "a", 5.0, i) for i in range(6)]
    out = page_hinkley_by_group(_events(spark, rows)).collect()[0]
    # constant series: U strictly decreases, running min tracks U -> PH = 0
    assert float(out["ph_stat"]) == 0.0


def test_gumbel_moments_match_hand_fit(spark):
    from smart_data_lake_spark.functions.analytics import gumbel_return_level_by_group

    # three days, daily maxima 2, 4, 9 (other rows below the max)
    rows = [
        (0, 0, "a", 2.0, 1), (1, 0, "a", 1.0, 2),
        (2, 0, "a", 4.0, 25), (3, 0, "a", 0.5, 26),
        (4, 0, "a", 9.0, 49), (5, 0, "a", 3.0, 50),
    ]
    out = gumbel_return_level_by_group(_events(spark, rows)).collect()[0]
    m, s2 = 5.0, ((2 - 5) ** 2 + (4 - 5) ** 2 + (9 - 5) ** 2) / 2.0
    beta = math.sqrt(s2) * math.sqrt(6.0) / math.pi
    mu = m - 0.5772156649015329 * beta
    lvl = mu - beta * math.log(-math.log(1.0 - 1.0 / 30.0))
    assert out["n_days"] == 3
    assert out["mean_daily_max"] == 5.0
    assert abs(out["gumbel_beta"] - beta) < 1e-6
    assert abs(out["gumbel_mu"] - mu) < 1e-6
    assert abs(out["return_level_30d"] - lvl) < 1e-6


def test_theil_equal_values_zero_and_skew_positive(spark):
    from smart_data_lake_spark.functions.profiling import theil_index_by_group

    df = spark.createDataFrame(
        [("g", 5.0)] * 4 + [("h", 1.0), ("h", 1.0), ("h", 1.0), ("h", 13.0)],
        "grp string, v double",
    )
    rows = {r["grp"]: r for r in theil_index_by_group(df, "grp", "v").collect()}
    assert rows["g"]["theil_t"] == 0.0
    # mu=4: T = (1/4)(3*(0.25*ln0.25) + 3.25*ln3.25)
    want = (3 * (0.25 * math.log(0.25)) + 3.25 * math.log(3.25)) / 4.0
    assert abs(rows["h"]["theil_t"] - want) < 1e-6


def test_theil_zero_values_contribute_zero(spark):
    from smart_data_lake_spark.functions.profiling import theil_index_by_group

    df = spark.createDataFrame(
        [("g", 0.0), ("g", 0.0), ("g", 8.0), ("g", 8.0)], "grp string, v double"
    )
    out = theil_index_by_group(df, "grp", "v").collect()[0]
    # mu=4; zero rows contribute 0: T = (1/4)*2*(2*ln2) = ln2
    assert abs(out["theil_t"] - math.log(2.0)) < 1e-6


def test_longest_streak_islands(spark):
    from smart_data_lake_spark.functions.analytics import longest_streak_by_user

    seq = ["v", "v", "c", "v", "v", "v", "c"]
    rows = [(i, 7, t, 0.0, i) for i, t in enumerate(seq)]
    out = longest_streak_by_user(_events(spark, rows)).collect()[0]
    assert out["user_id"] == 7
    assert out["n_streaks"] == 4  # vv, c, vvv, c
    assert out["max_streak"] == 3 and out["streak_type"] == "v"


def test_longest_streak_tie_breaks_on_type_desc(spark):
    from smart_data_lake_spark.functions.analytics import longest_streak_by_user

    rows = [(i, 1, t, 0.0, i) for i, t in enumerate(["a", "a", "b", "b"])]
    out = longest_streak_by_user(_events(spark, rows)).collect()[0]
    assert out["max_streak"] == 2 and out["streak_type"] == "b"


def _docs(spark, texts, langs=None, sources=None):
    n = len(texts)
    return spark.createDataFrame(
        [
            (
                i,
                texts[i],
                (langs or ["en"] * n)[i],
                (sources or ["s"] * n)[i],
                len(texts[i]),
            )
            for i in range(n)
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_simpson_diversity_known_value(spark):
    from smart_data_lake_spark.functions.profiling import simpson_diversity

    out = simpson_diversity(_docs(spark, ["a a b b"])).collect()[0]
    # N=4, sum c(c-1) = 2+2: 1 - 4/12 = 0.666667 on the grid
    assert out["n_types"] == 2 and out["n_tokens"] == 4
    assert out["simpson_diversity"] == 0.666667


def test_yules_k_known_value(spark):
    from smart_data_lake_spark.functions.profiling import yules_k

    out = yules_k(_docs(spark, ["a a b"])).collect()[0]
    # sum c^2 = 5, N=3: 1e4*(5-3)/9 = 2222.222222
    assert out["yules_k"] == 2222.222222


def test_vocab_churn_halves(spark):
    from smart_data_lake_spark.functions.profiling import vocab_churn_by_group

    out = vocab_churn_by_group(_docs(spark, ["a b", "b c"])).collect()[0]
    # first half = doc 0 (ceil(2/2)=1 doc): V1={a,b}, V2={b,c}, new={c}
    assert (out["v1_types"], out["v2_types"], out["new_types"]) == (2, 2, 1)
    assert out["new_type_rate"] == 0.5


def test_cohens_kappa_perfect_and_chance(spark):
    from smart_data_lake_spark.functions.profiling import cohens_kappa

    perfect = spark.createDataFrame(
        [("en", "en")] * 3 + [("de", "de")] * 3, "a string, b string"
    )
    out = cohens_kappa(perfect, "a", "b").collect()[0]
    assert out["kappa"] == 1.0 and out["observed_agreement"] == 1.0
    # one rater constant: p_e = p_o -> kappa 0
    const = spark.createDataFrame(
        [("en", "en"), ("de", "en")], "a string, b string"
    )
    out2 = cohens_kappa(const, "a", "b").collect()[0]
    assert out2["observed_agreement"] == 0.5
    assert out2["expected_agreement"] == 0.5
    assert out2["kappa"] == 0.0


# ------------------------------------------------- r11 review regressions


def test_gumbel_constant_maxima_no_nan(spark):
    from smart_data_lake_spark.functions.analytics import gumbel_return_level_by_group

    # constant daily maxima: var cancels to a tiny negative double without
    # the greatest() clamp -> sqrt NaN (review-found); clamped, beta = 0
    # and the return level degenerates to the mean
    rows = [(i, 0, "a", 126.614243, 24 * i + 1) for i in range(5)]
    out = gumbel_return_level_by_group(_events(spark, rows)).collect()[0]
    assert out["gumbel_beta"] == 0.0
    assert out["return_level_30d"] == out["mean_daily_max"]
    assert not math.isnan(out["gumbel_mu"])


def test_cmh_null_rows_excluded(spark):
    from smart_data_lake_spark.functions.analytics import cmh_test_stratified

    rows = [("P", 1, 1), ("P", 1, 0), ("P", 0, 0), ("P", 0, 0), ("P", None, 1)]
    df = spark.createDataFrame(rows, "s string, x int, y int")
    out = cmh_test_stratified(df, "s", F.col("x"), F.col("y")).collect()[0]
    # the NULL-variant row must not inflate N: E = 2*1/4 = 0.5, not 2*2/5
    assert out["sum_expected"] == 0.5


def test_profile_float_minmax_nan_inf_total(spark):
    from smart_data_lake_spark.functions.profiling import profile_columns

    df = spark.createDataFrame(
        [(float("nan"),), (float("inf"),), (1.5,)], "v double"
    )
    row = {r["col_name"]: r for r in profile_columns(df, ["v"]).collect()}["v"]
    # NaN sorts greatest in Spark: max=NaN; min is the finite 1.5
    assert row["max_str"] == "NaN"
    assert row["min_str"] == "1.500000"
    big = spark.createDataFrame([(1e40,), (2.0,)], "v double")
    row2 = {r["col_name"]: r for r in profile_columns(big, ["v"]).collect()}["v"]
    assert row2["max_str"] is not None  # native fallback, not NULL


# ------------------------------ dictionary-rank == row-rank equivalence


def test_mann_whitney_dict_rank_bit_identical(spark):
    from smart_data_lake_spark.functions.analytics import (
        mann_whitney_u_by_variant,
        mann_whitney_u_by_variant_dict,
    )

    # heavy ties + both variants sharing values: the case midranks exist for
    vals = [1.0, 1.0, 1.0, 2.5, 2.5, 3.0, 3.0, 3.0, 3.0, 7.0, -2.0, -2.0]
    rows = [(i, i, "a", v, i) for i, v in enumerate(vals)]
    df = _events(spark, rows)
    a = mann_whitney_u_by_variant(df).collect()[0]
    b = mann_whitney_u_by_variant_dict(df).collect()[0]
    assert a.asDict() == b.asDict()


def test_kruskal_dict_rank_bit_identical(spark):
    from smart_data_lake_spark.functions.analytics import (
        kruskal_wallis_by_group,
        kruskal_wallis_by_group_dict,
    )

    vals = [1.0, 1.0, 2.0, 2.0, 2.0, 5.0, 5.0, 9.0, 0.5, 0.5]
    rows = [(i, 0, ["x", "y", "z"][i % 3], v, i) for i, v in enumerate(vals)]
    df = _events(spark, rows)
    a = kruskal_wallis_by_group(df).collect()[0]
    b = kruskal_wallis_by_group_dict(df).collect()[0]
    assert a.asDict() == b.asDict()


def test_mann_whitney_dict_rank_property(spark):
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from smart_data_lake_spark.functions.analytics import (
        mann_whitney_u_by_variant,
        mann_whitney_u_by_variant_dict,
    )

    @settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
    @given(
        st.lists(
            st.sampled_from([0.0, 1.0, 1.0, 2.5, -3.0, 7.25]),  # tie-dense
            min_size=4,
            max_size=20,
        )
    )
    def run(vals):
        rows = [(i, i, "a", v, i) for i, v in enumerate(vals)]
        df = _events(spark, rows)
        a = mann_whitney_u_by_variant(df).collect()[0]
        b = mann_whitney_u_by_variant_dict(df).collect()[0]
        assert a.asDict() == b.asDict()

    run()


# ------------------------------------------- post-freeze r12-queue operators


def test_wilcoxon_known_value(spark):
    from smart_data_lake_spark.functions.analytics import wilcoxon_signed_rank_by_user

    # 4 users, 2 events each (halves = 1 event each); diffs: +1, +2, -0.5, +4
    rows = []
    diffs = {1: 1.0, 2: 2.0, 3: -0.5, 4: 4.0}
    for u, d in diffs.items():
        rows += [(u * 10, u, "a", 5.0, 0), (u * 10 + 1, u, "a", 5.0 + d, 5)]
    out = wilcoxon_signed_rank_by_user(_events(spark, rows)).collect()[0]
    # |d| order: 0.5 < 1 < 2 < 4 -> ranks 1..4; W+ = 2+3+4 = 9
    assert out["n_pairs"] == 4
    assert out["w_plus"] == 9.0
    # mu = 5, var = 4*5*9/24 = 7.5, z = (9-5)/sqrt(7.5)
    assert abs(out["z_score"] - (9 - 5) / math.sqrt(7.5)) < 1e-6


def test_wilcoxon_zero_diffs_drop(spark):
    from smart_data_lake_spark.functions.analytics import wilcoxon_signed_rank_by_user

    rows = [(0, 1, "a", 5.0, 0), (1, 1, "a", 5.0, 5),  # d = 0 -> drops
            (2, 2, "a", 1.0, 0), (3, 2, "a", 2.0, 5)]
    out = wilcoxon_signed_rank_by_user(_events(spark, rows)).collect()[0]
    assert out["n_pairs"] == 1 and out["w_plus"] == 1.0


def test_friedman_known_value(spark):
    from smart_data_lake_spark.functions.analytics import friedman_test_by_block

    # 3 blocks x 3 treatments, consistent ordering a < b < c in every block
    rows = []
    eid = 0
    for b in range(3):
        for j, t in enumerate(["a", "b", "c"]):
            rows.append((eid, b, t, float(j + 1) * (b + 1), eid))
            eid += 1
    out = friedman_test_by_block(_events(spark, rows)).collect()[0]
    # perfectly consistent ranks: chi2 = n*(k-1)... for k=3, n=3:
    # R = 3,6,9 (half-units: ranks 1,2,3 per block) -> chi2 = 12*126/ (3*3*4) - 3*3*4
    # classic value: n(k-1) * W=1 -> chi2 = n*(k-1)*... compute directly:
    # sum R_j^2 = 9+36+81 = 126; 12*126/(3*3*4) - 3*3*16/4 ... use textbook:
    # chi2 = 12/(n k (k+1)) * sum R^2 - 3 n (k+1) = 12*126/36 - 36 = 6
    assert out["n_treatments"] == 3 and out["n_blocks"] == 3
    assert out["friedman_chi2"] == 6.0


def test_friedman_incomplete_blocks_drop(spark):
    from smart_data_lake_spark.functions.analytics import friedman_test_by_block

    rows = [(0, 0, "a", 1.0, 0), (1, 0, "b", 2.0, 1),
            (2, 1, "a", 1.0, 2)]  # block 1 misses treatment b
    out = friedman_test_by_block(_events(spark, rows)).collect()[0]
    assert out["n_blocks"] == 1


def test_cuped_perfect_covariate_kills_variance(spark):
    from smart_data_lake_spark.functions.analytics import cuped_adjusted_ab

    # post = pre exactly -> theta = 1, var_ratio = 0, adjusted effect 0
    rows = []
    for u in range(6):
        v = float(u + 1)
        rows += [(u * 10, u, "a", v, 0), (u * 10 + 1, u, "a", v, 5)]
    out = cuped_adjusted_ab(_events(spark, rows)).collect()[0]
    assert out["theta"] == 1.0
    assert out["var_ratio"] == 0.0
    assert out["adj_effect"] == 0.0


def test_lorenz_points_known(spark):
    from smart_data_lake_spark.functions.profiling import lorenz_curve_points

    df = spark.createDataFrame(
        [("g", i, float(v)) for i, v in enumerate([1, 1, 1, 1, 1, 1, 1, 1, 1, 91])],
        "grp string, k long, v double",
    )
    rows = {r["decile"]: r["cum_share"] for r in
            lorenz_curve_points(df, "grp", "k", "v").collect()}
    # bottom 90% hold 9/100; decile 10 = 1.0
    assert rows[9] == 0.09 and rows[10] == 1.0
    assert rows[5] == 0.05


def test_bowley_moors_symmetric_uniform(spark):
    from smart_data_lake_spark.functions.profiling import bowley_moors_shape

    # 0..8: octiles are exact integers 1..7; symmetric -> bowley 0;
    # moors = ((7-5)+(3-1))/(6-2) = 1.0
    df = spark.createDataFrame([("g", float(i)) for i in range(9)], "grp string, v double")
    out = bowley_moors_shape(df, "grp", "v").collect()[0]
    assert out["bowley_skew"] == 0.0
    assert out["moors_kurtosis"] == 1.0
    assert (out["q1"], out["median"], out["q3"]) == (2.0, 4.0, 6.0)


def test_theil_decomposition_identity(spark):
    from smart_data_lake_spark.functions.profiling import theil_decomposition

    # within-group equal values -> T_within = 0 and total == between
    df = spark.createDataFrame(
        [("g", 2.0), ("g", 2.0), ("h", 4.0), ("h", 4.0)], "grp string, v double"
    )
    out = theil_decomposition(df, "grp", "v").collect()[0]
    want_between = (1 / 3) * math.log((1 / 3) / 0.5) + (2 / 3) * math.log((2 / 3) / 0.5)
    assert out["theil_within"] == 0.0
    assert abs(out["theil_between"] - want_between) < 1e-6
    assert abs(out["theil_total"] - out["theil_between"]) < 1e-6


def test_theil_decomposition_additivity(spark):
    from smart_data_lake_spark.functions.profiling import theil_decomposition

    df = spark.createDataFrame(
        [("g", 1.0), ("g", 3.0), ("h", 2.0), ("h", 10.0), ("h", 0.0)],
        "grp string, v double",
    )
    out = theil_decomposition(df, "grp", "v").collect()[0]
    # additive identity up to the 1e-9 term grid
    assert abs(out["theil_total"] - (out["theil_between"] + out["theil_within"])) < 1e-5


def test_wasserstein_pure_shift(spark):
    from smart_data_lake_spark.functions.analytics import wasserstein_drift_by_group

    # first half [0,1], second half [2,3]: W1 = mean shift = 2
    rows = [(0, 0, "a", 0.0, 0), (1, 0, "a", 1.0, 1),
            (2, 0, "a", 2.0, 2), (3, 0, "a", 3.0, 3)]
    out = wasserstein_drift_by_group(_events(spark, rows)).collect()[0]
    assert (out["n_first_half"], out["n_second_half"]) == (2, 2)
    assert out["w1_distance"] == 2.0


def test_wasserstein_identical_halves_zero(spark):
    from smart_data_lake_spark.functions.analytics import wasserstein_drift_by_group

    rows = [(i, 0, "a", float(i % 3), i) for i in range(6)]  # 0,1,2 | 0,1,2
    out = wasserstein_drift_by_group(_events(spark, rows)).collect()[0]
    assert out["w1_distance"] == 0.0
