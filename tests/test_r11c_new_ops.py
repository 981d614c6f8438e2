"""Known-value + whole-plan cross-engine tests for the five late-r11
operators (Brown-Forsythe, log-rank, McNemar, Jonckheere-Terpstra,
Good-Turing missing mass). Values hand-computed from the textbook
definitions; the parity tests run the REGISTERED query vs the REGISTERED
oracle on random frames (the test_r11_cross_engine_properties harness)."""

from __future__ import annotations

import datetime as dt
import os
import sys

import pyarrow as pa
from hypothesis import example, given, settings

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from test_r11_cross_engine_properties import (  # noqa: E402
    _SETTINGS,
    _docs_table,
    _events_table,
    _run_query_vs_oracle,
    _texts,
    _vals,
)
from test_r11b_sweep_properties import (  # noqa: E402
    _events_table_types,
    _orders_table_classes,
)

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


# ------------------------------------------------------------ Brown-Forsythe


def test_brown_forsythe_known_value(spark):
    from smart_data_lake_spark.functions.analytics import brown_forsythe_test

    rows = [(i, 0, "a", v, i) for i, v in enumerate([1, 2, 3, 4])]
    rows += [(10 + i, 0, "b", v, i) for i, v in enumerate([10, 20, 30, 40])]
    out = brown_forsythe_test(_events(spark, rows)).collect()[0]
    # a: med 2.5, z = [1.5,.5,.5,1.5], mean 1, SSW_a = 5 - 4 = 1
    # b: med 25, z = [15,5,5,15], mean 10, SSW_b = 500 - 400 = 100
    # grand z-mean 5.5; SSB = 4*(4.5^2)*2 = 162; F = 6 * 162/101
    assert out["n_groups"] == 2 and out["n_total"] == 8
    assert out["df_between"] == 1 and out["df_within"] == 6
    assert out["bf_statistic"] == 9.623762


def test_brown_forsythe_equal_spreads_zero(spark):
    from smart_data_lake_spark.functions.analytics import brown_forsythe_test

    # same shape shifted: identical |x - med| multisets -> SSB = 0 -> F = 0
    rows = [(i, 0, "a", v, i) for i, v in enumerate([1, 2, 3])]
    rows += [(10 + i, 0, "b", v + 100, i) for i, v in enumerate([1, 2, 3])]
    out = brown_forsythe_test(_events(spark, rows)).collect()[0]
    assert out["bf_statistic"] == 0.0


def test_brown_forsythe_single_group_null(spark):
    from smart_data_lake_spark.functions.analytics import brown_forsythe_test

    rows = [(i, 0, "a", v, i) for i, v in enumerate([1, 2, 3, 4])]
    out = brown_forsythe_test(_events(spark, rows)).collect()[0]
    assert out["n_groups"] == 1 and out["bf_statistic"] is None


@settings(**_SETTINGS)
@given(_vals)
# the r11 dec_double class-fix witness: q = 2*41100.8125^2 has a scaled
# integer past 2^53, where DuckDB's bare int128 decimal->double cast
# landed an ulp off Spark's (ssw exactly-0 vs ~5e-7 -> None vs 1.77e15)
@example(series=[0.0, 0.0, 0.0, 82201.625])
def test_brown_forsythe_engine_exact(spark, series):
    _run_query_vs_oracle(
        spark,
        "brown_forsythe_value_by_type",
        {"events": _events_table_types(series)},
    )


# ------------------------------------------------------------------ log-rank


def test_log_rank_known_value(spark):
    from smart_data_lake_spark.functions.analytics import log_rank_test

    rows = [(i, u, "signup", 0.0, 0) for i, u in enumerate(range(4))]
    rows += [(10, 0, "purchase", 1.0, 24), (11, 1, "purchase", 1.0, 48)]
    rows += [(12, 0, "view", 0.0, 96)]  # horizon = day 4
    out = log_rank_test(_events(spark, rows)).collect()[0]
    # day 1: risk (2,2), event in variant 0 -> E1 = .5, V = .25
    # day 2: risk (1,2), event in variant 1 -> E1 = 2/3, V = 2/9
    # O1 = 1, E1 = 1.166666667, V = .472222222
    assert out["n_users_a"] == 2 and out["n_users_b"] == 2
    assert out["observed_b"] == 1
    assert out["expected_b"] == 1.166667
    # (1 - 1.166666667)^2 / 0.472222222
    assert abs(out["logrank_chi2"] - 0.058824) < 1e-6


def test_log_rank_identical_groups_zero(spark):
    from smart_data_lake_spark.functions.analytics import log_rank_test

    # mirrored users in both variants: O == E -> chi2 == 0
    rows = [(i, u, "signup", 0.0, 0) for i, u in enumerate(range(4))]
    rows += [(10, 0, "purchase", 1.0, 24), (11, 1, "purchase", 1.0, 24)]
    rows += [(12, 2, "view", 0.0, 48), (13, 3, "view", 0.0, 48)]
    out = log_rank_test(_events(spark, rows)).collect()[0]
    assert out["logrank_chi2"] == 0.0


def _events_table_lifecycle(series) -> pa.Table:
    """events with signup/purchase lifecycle types so the survival-family
    parity tests see real cohorts (every 4th event a signup, every 4th+2 a
    purchase — some users convert, some censor)."""
    tab = _events_table(series)
    n = tab.num_rows
    types = pa.array(
        [["signup", "view", "purchase", "view"][i % 4] for i in range(n)],
        pa.string(),
    )
    return tab.set_column(
        tab.schema.get_field_index("event_type"), "event_type", types
    )


@settings(**_SETTINGS)
@given(_vals)
def test_log_rank_engine_exact(spark, series):
    _run_query_vs_oracle(
        spark,
        "log_rank_conversion_by_variant",
        {"events": _events_table_lifecycle(series)},
    )


# ------------------------------------------------------------------- McNemar


def test_mcnemar_known_value(spark):
    from smart_data_lake_spark.functions.analytics import mcnemar_paired_test

    rows = [
        (0, 0, "purchase", 0.0, 0), (1, 0, "view", 0.0, 1),      # first_only
        (2, 1, "view", 0.0, 0), (3, 1, "purchase", 0.0, 1),      # second_only
        (4, 2, "purchase", 0.0, 0), (5, 2, "purchase", 0.0, 1),  # both
        (6, 3, "view", 0.0, 0), (7, 3, "view", 0.0, 1),          # neither
        # n=3: first half = 2 earliest -> p1 = 1, p2 = 0 -> first_only
        (8, 4, "view", 0.0, 0), (9, 4, "purchase", 0.0, 1), (10, 4, "view", 0.0, 2),
    ]
    out = mcnemar_paired_test(_events(spark, rows)).collect()[0]
    assert out["n_users"] == 5
    assert out["n_both"] == 1 and out["n_neither"] == 1
    assert out["n_first_only"] == 2 and out["n_second_only"] == 1
    # Edwards-corrected (|2-1|-1)^2/3 = 0 — the continuity floor
    assert out["mcnemar_chi2"] == 0.0


def test_mcnemar_discordant_chi2(spark):
    from smart_data_lake_spark.functions.analytics import mcnemar_paired_test

    # three first_only users, zero second_only: (3-1)^2/3
    rows = []
    for u in range(3):
        rows += [(2 * u, u, "purchase", 0.0, 0), (2 * u + 1, u, "view", 0.0, 1)]
    out = mcnemar_paired_test(_events(spark, rows)).collect()[0]
    assert out["n_first_only"] == 3 and out["n_second_only"] == 0
    assert out["mcnemar_chi2"] == 1.333333


def test_mcnemar_single_event_users_excluded(spark):
    from smart_data_lake_spark.functions.analytics import mcnemar_paired_test

    rows = [(0, 0, "purchase", 0.0, 0)]  # one event: no pair, excluded
    rows += [(1, 1, "view", 0.0, 0), (2, 1, "purchase", 0.0, 1)]
    out = mcnemar_paired_test(_events(spark, rows)).collect()[0]
    assert out["n_users"] == 1 and out["n_second_only"] == 1


@settings(**_SETTINGS)
@given(_vals)
def test_mcnemar_engine_exact(spark, series):
    _run_query_vs_oracle(
        spark,
        "mcnemar_paired_conversion",
        {"events": _events_table_lifecycle(series)},
    )


# ------------------------------------------------------- Jonckheere-Terpstra


def test_jonckheere_known_value(spark):
    from smart_data_lake_spark.functions.analytics import jonckheere_terpstra_test

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0)], "g string, v double"
    )
    out = jonckheere_terpstra_test(df, "g", "v").collect()[0]
    # all 4 cross pairs ascending: JT = 4; E = (16-8)/4 = 2
    # no ties: Var = (4*3*13 - 2*2*1*9)/72 = 120/72; z = 2/sqrt(5/3)
    assert out["n_groups"] == 2 and out["n_total"] == 4
    assert out["jt_statistic"] == 4.0 and out["expected_jt"] == 2.0
    assert out["jt_z"] == 1.549193


def test_jonckheere_tie_halves(spark):
    from smart_data_lake_spark.functions.analytics import jonckheere_terpstra_test

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 1.0), ("b", 1.0), ("b", 2.0)], "g string, v double"
    )
    out = jonckheere_terpstra_test(df, "g", "v").collect()[0]
    # U = #(x<y) + half-ties = 2 + 0.5*2 = 3
    assert out["jt_statistic"] == 3.0 and out["expected_jt"] == 2.0


def test_jonckheere_descending_negative_z(spark):
    from smart_data_lake_spark.functions.analytics import jonckheere_terpstra_test

    df = spark.createDataFrame(
        [("a", 3.0), ("a", 4.0), ("b", 1.0), ("b", 2.0)], "g string, v double"
    )
    out = jonckheere_terpstra_test(df, "g", "v").collect()[0]
    assert out["jt_statistic"] == 0.0 and out["jt_z"] == -1.549193


@settings(**_SETTINGS)
@given(_vals)
def test_jonckheere_engine_exact(spark, prices):
    _run_query_vs_oracle(
        spark,
        "jonckheere_price_by_priority",
        {"orders": _orders_table_classes(prices)},
    )


# ------------------------------------------------------ Good-Turing P0


def test_good_turing_known_value(spark):
    from smart_data_lake_spark.functions.profiling import good_turing_missing_mass

    df = spark.createDataFrame(
        [(0, "a a b c", "en", "s1", 7)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = good_turing_missing_mass(df).collect()[0]
    # N=4, V=3, N1=2 (b,c), N2=1 (a): P0 = .5, r1* = 2*1/2 = 1
    assert out["n_tokens"] == 4 and out["n_terms"] == 3
    assert out["f1_singletons"] == 2 and out["f2_doubletons"] == 1
    assert out["missing_mass"] == 0.5 and out["r1_adjusted"] == 1.0


def test_good_turing_no_singletons(spark):
    from smart_data_lake_spark.functions.profiling import good_turing_missing_mass

    df = spark.createDataFrame(
        [(0, "a a b b", "en", "s1", 7)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = good_turing_missing_mass(df).collect()[0]
    # N1 = 0: saturated sample — zero unseen mass, r1* undefined (NULL)
    assert out["missing_mass"] == 0.0 and out["r1_adjusted"] is None


@settings(**_SETTINGS)
@given(_texts)
def test_good_turing_engine_exact(spark, token_lists):
    _run_query_vs_oracle(
        spark,
        "good_turing_missing_mass_by_source",
        {"documents": _docs_table(token_lists)},
    )


# --------------------------------------------- r11 late-review regressions


def test_lorenz_small_group_keeps_group_name(spark):
    """Review-confirmed bug: the first always-10-rows rewrite dropped the
    GRID side's group column in the left join, so zero-cutoff rows (groups
    with < deciles members) came back with group NULL instead of the name."""
    from smart_data_lake_spark.functions.profiling import lorenz_curve_points

    df = spark.createDataFrame(
        [("A", i, float(i + 1)) for i in range(3)],
        "grp string, k long, v double",
    )
    rows = lorenz_curve_points(df, "grp", "k", "v").orderBy("decile").collect()
    assert len(rows) == 10
    assert all(r["grp"] == "A" for r in rows)
    # cutoffs for n=3: deciles 1-3 -> rank 0 -> exact 0.0 points
    assert [r["cum_share"] for r in rows[:3]] == [0.0, 0.0, 0.0]
    assert rows[-1]["cum_share"] == 1.0


def test_friedman_no_complete_blocks_zero(spark):
    """Review-confirmed bug: with NO block observing every treatment the
    ranked frame is empty and 0/NULL emitted n_blocks NULL where the
    oracle's integer division (and the pre-refactor literal) compute 0."""
    from smart_data_lake_spark.functions.analytics import friedman_test_by_block

    rows = [(0, 0, "a", 1.0, 0), (1, 1, "b", 2.0, 1)]
    out = friedman_test_by_block(_events(spark, rows)).collect()[0]
    assert out["n_treatments"] == 2
    assert out["n_blocks"] == 0
    assert out["friedman_chi2"] is None


# ------------------------------------- dictionary-rank percentile scale path


def _pct_rows(df, fn, probs):
    out = fn(df, "v", ["g"], probs).orderBy("g").collect()
    return [tuple(r) for r in out]


def test_exact_percentiles_dict_known_ties(spark):
    from smart_data_lake_spark.functions.profiling import (
        exact_percentiles,
        exact_percentiles_dict,
    )

    df = spark.createDataFrame(
        [("a", v) for v in [1.0, 1.0, 1.0, 2.0, 5.0, 5.0]]
        + [("b", v) for v in [3.0, 3.0, 3.0, 3.0]],
        "g string, v double",
    )
    probs = [("p25", 1, 4), ("p50", 1, 2), ("p75", 3, 4)]
    assert _pct_rows(df, exact_percentiles_dict, probs) == _pct_rows(
        df, exact_percentiles, probs
    )


@settings(**_SETTINGS)
@given(_vals)
def test_exact_percentiles_dict_equivalence(spark, series):
    """The dictionary-rank twin must be BIT-identical to the row-ranked
    form on any frame (the mann_whitney _dict equivalence discipline) —
    including tie-dense frames (values quantized to force collisions)."""
    from smart_data_lake_spark.functions.profiling import (
        exact_percentiles,
        exact_percentiles_dict,
    )

    rows = [("g%d" % (i % 2), float(round(v, 1))) for i, v in enumerate(series)]
    df = spark.createDataFrame(rows, "g string, v double")
    probs = [("p10", 1, 10), ("p50", 1, 2), ("p90", 9, 10)]
    assert _pct_rows(df, exact_percentiles_dict, probs) == _pct_rows(
        df, exact_percentiles, probs
    )


def test_dec_double_engine_identical(spark):
    """The measured divergence witness for the dec_double class fix:
    DuckDB's bare DECIMAL(38,18)->DOUBLE cast of 3378553576.3203125 is
    one ulp off (two-step int128 cast); the VARCHAR round-trip is the
    correctly-rounded double in BOTH engines."""
    import duckdb

    from smart_data_lake_spark.functions.numeric import dec_double, dec_double_sql
    from pyspark.sql import functions as F

    v = "3378553576.320312500000000000"
    con = duckdb.connect()
    bare = con.sql(f"SELECT CAST(CAST({v} AS DECIMAL(38,18)) AS DOUBLE)").fetchone()[0]
    fixed = con.sql(
        f"SELECT {dec_double_sql(f'CAST({v} AS DECIMAL(38,18))')}"
    ).fetchone()[0]
    if bare == 3378553576.3203125:  # informational, not an invariant:
        print("NOTE: DuckDB's bare wide-decimal cast is now correctly "
              "rounded here — dec_double may be retirable")
    assert fixed == 3378553576.3203125
    got = (
        spark.range(1)
        .select(dec_double(F.lit(v).cast("decimal(38,18)")).alias("x"))
        .collect()[0]["x"]
    )
    assert got == fixed == 3378553576.3203125


def test_brown_forsythe_small_magnitude_precision(spark):
    """r11 review regression: rate-scale data ([0,1] values) must keep
    full precision — the mg²-normalized 1e-9 scaled-integer grid carries
    RELATIVE digits, where a fixed absolute grid lost them.
    a: z=[.15,.05,.05,.15] (w=.0025), b: z=[.3,.1,.1,.3] (w=.01);
    SSW=.05, SSB=.02, F = 6*(.02/.05) = 2.4 exactly."""
    from smart_data_lake_spark.functions.analytics import brown_forsythe_test

    rows = [(i, 0, "a", v, i) for i, v in enumerate([0.1, 0.2, 0.3, 0.4])]
    rows += [(10 + i, 0, "b", v, i) for i, v in enumerate([0.1, 0.3, 0.5, 0.7])]
    out = brown_forsythe_test(_events(spark, rows)).collect()[0]
    assert out["bf_statistic"] == 2.4


def test_brown_forsythe_all_zero_spread_null(spark):
    """mg = 0 (every value at its group median): F undefined -> NULL,
    never a NaN/ANSI crash."""
    from smart_data_lake_spark.functions.analytics import brown_forsythe_test

    rows = [(i, 0, "a", 7.0, i) for i in range(3)]
    rows += [(10 + i, 0, "b", 9.0, i) for i in range(3)]
    out = brown_forsythe_test(_events(spark, rows)).collect()[0]
    assert out["bf_statistic"] is None


def test_brown_forsythe_huge_deviation_null(spark):
    """|z| >= 9e9 (past the scale-6 cast-exactness bound) NULLs the
    statistic deterministically instead of silently diverging."""
    from smart_data_lake_spark.functions.analytics import brown_forsythe_test

    rows = [(i, 0, "a", v, i) for i, v in enumerate([0.0, 4.0e10])]
    rows += [(10 + i, 0, "b", v, i) for i, v in enumerate([1.0, 2.0, 3.0])]
    out = brown_forsythe_test(_events(spark, rows)).collect()[0]
    assert out["bf_statistic"] is None
