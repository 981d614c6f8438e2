"""r11 sweep property tests (the r10 ADVICE item plus this round's sweep).

Covers, with the whole-plan Spark-vs-DuckDB harness from
test_r11_cross_engine_properties (generate a random frame, write it as a
temp sf_dir table, run the REGISTERED query on Spark and the REGISTERED
oracle on DuckDB, compare the sorted value multiset exactly):

* the five r10 members that previously had Spark-only unit tests
  (cramers_v_lang_source, k_anonymity_orders, chao1_vocab_by_source,
  kcore_terms_corpus, heaps_law_fit_corpus) — the ADVICE finding;
* the three percentile-reworked members (event_value_percentiles,
  profile_orders_columns, doc_length_band_by_source) — same finding;
* every member whose function or oracle moved in the r11 engine-round()
  closure sweep (ewma, grouped/rolling z, fd histogram, behavior entropy,
  pmi/llr collocations, the tfidf family, RANGE-frame trailing sums,
  grouping sets) — each needs a falsifiable whole-plan parity check
  before its driver regrade;
* the tfidf identical-vector collapse: a corpus with exact-duplicate
  families must produce bit-identical pairs with the collapse on and off.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
from hypothesis import example, given, settings

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from test_r11_cross_engine_properties import (  # noqa: E402
    _SETTINGS,
    _VOCAB,
    _docs_table,
    _events_table,
    _orders_table,
    _run_query_vs_oracle,
    _texts,
    _vals,
    _with_forced_dup,
)

# ------------------------------------------------------------ table variants


def _docs_table_langs(token_lists) -> pa.Table:
    """documents with a varying lang column (cramers_v needs ≥2 levels on
    both axes to exercise the chi-square marginals)."""
    tab = _docs_table(token_lists)
    n = tab.num_rows
    langs = pa.array([["en", "de", "fr"][i % 3] for i in range(n)], pa.string())
    return tab.set_column(tab.schema.get_field_index("lang"), "lang", langs)


def _orders_table_classes(prices) -> pa.Table:
    """orders with varying status/priority so the k-anonymity audit and
    grouping sets see multiple equivalence classes."""
    tab = _orders_table(prices)
    n = tab.num_rows
    status = pa.array([["F", "O", "P"][i % 3] for i in range(n)], pa.string())
    prio = pa.array([["1-URGENT", "3-MEDIUM"][i % 2] for i in range(n)], pa.string())
    tab = tab.set_column(tab.schema.get_field_index("o_orderstatus"), "o_orderstatus", status)
    return tab.set_column(
        tab.schema.get_field_index("o_orderpriority"), "o_orderpriority", prio
    )


def _events_table_types(series) -> pa.Table:
    """events with a varying event_type (behavior entropy needs per-user
    type diversity; single-type frames only ever test entropy 0)."""
    tab = _events_table(series)
    n = tab.num_rows
    types = pa.array([["view", "click", "buy"][i % 3] for i in range(n)], pa.string())
    return tab.set_column(tab.schema.get_field_index("event_type"), "event_type", types)


# A 20-term corpus walking every ordered pair: each term sees 19 distinct
# neighbors, so the k=16 core is NON-empty — without it every random
# 8-term example peels to nothing and the kcore test only checks emptiness.
_DENSE_WALK = [
    [i, j] for i in range(len(_VOCAB)) for j in range(len(_VOCAB)) if i != j
]


# ----------------------------------------------- five r10 members (ADVICE)


@settings(**_SETTINGS)
@given(_texts)
def test_cramers_v_engine_exact(spark, token_lists):
    _run_query_vs_oracle(
        spark, "cramers_v_lang_source", {"documents": _docs_table_langs(token_lists)}
    )


@settings(**_SETTINGS)
@given(_vals)
def test_k_anonymity_engine_exact(spark, prices):
    _run_query_vs_oracle(
        spark, "k_anonymity_orders", {"orders": _orders_table_classes(prices)}
    )


@settings(**_SETTINGS)
@given(_texts)
def test_chao1_engine_exact(spark, token_lists):
    _run_query_vs_oracle(
        spark, "chao1_vocab_by_source", {"documents": _docs_table(token_lists)}
    )


@settings(**_SETTINGS)
@example(_DENSE_WALK * 3)  # non-empty 16-core: every term has 7 neighbors ×
# repetition is irrelevant (degree = DISTINCT neighbors) — see module note
@given(_texts)
def test_kcore_engine_exact(spark, token_lists):
    _run_query_vs_oracle(
        spark, "kcore_terms_corpus", {"documents": _docs_table(token_lists)}
    )


@settings(**_SETTINGS)
@given(_texts)
def test_heaps_law_engine_exact(spark, token_lists):
    _run_query_vs_oracle(
        spark, "heaps_law_fit_corpus", {"documents": _docs_table(token_lists)}
    )


# ------------------------------------------ percentile-reworked members


@settings(**_SETTINGS)
@example([0.475007, 0.475008, 1.0, 2.0])  # the interpolation pseudo-tie
@given(_vals)
def test_event_value_percentiles_engine_exact(spark, series):
    _run_query_vs_oracle(
        spark, "event_value_percentiles", {"events": _events_table(series)}
    )


@settings(**_SETTINGS)
@given(_vals)
def test_profile_orders_engine_exact(spark, prices):
    _run_query_vs_oracle(
        spark, "profile_orders_columns", {"orders": _orders_table(prices)}
    )


@settings(**_SETTINGS)
@given(_texts)
def test_doc_length_band_engine_exact(spark, token_lists):
    _run_query_vs_oracle(
        spark, "doc_length_band_by_source", {"documents": _docs_table(token_lists)}
    )


# ----------------------------------------------- r11 engine-round() closure


@settings(**_SETTINGS)
@given(_vals)
def test_ewma_engine_exact(spark, series):
    _run_query_vs_oracle(spark, "ewma_value_by_type", {"events": _events_table(series)})


@settings(**_SETTINGS)
@given(_vals)
def test_grouped_outliers_engine_exact(spark, series):
    _run_query_vs_oracle(
        spark, "events_value_outliers", {"events": _events_table(series)}
    )


@settings(**_SETTINGS)
@given(
    _vals.filter(lambda v: len(v) >= 12)  # rolling z needs min_obs=10 frames
)
def test_rolling_z_engine_exact(spark, series):
    _run_query_vs_oracle(
        spark, "rolling_z_anomalies_events", {"events": _events_table(series)}
    )


@settings(**_SETTINGS)
@given(_vals)
def test_fd_histogram_engine_exact(spark, series):
    _run_query_vs_oracle(
        spark, "fd_histogram_value_events", {"events": _events_table(series)}
    )


@settings(**_SETTINGS)
@given(_vals)
def test_behavior_entropy_engine_exact(spark, series):
    _run_query_vs_oracle(
        spark, "user_behavior_entropy_events", {"events": _events_table_types(series)}
    )


# pmi/llr need bigrams with count >= 5: repeat the generated corpus so at
# least some bigrams clear the floor on most examples
@settings(**_SETTINGS)
@given(_texts)
def test_pmi_engine_exact(spark, token_lists):
    _run_query_vs_oracle(
        spark, "pmi_collocations_corpus", {"documents": _docs_table(token_lists * 5)}
    )


@settings(**_SETTINGS)
@given(_texts)
def test_llr_engine_exact(spark, token_lists):
    _run_query_vs_oracle(
        spark, "llr_collocations_corpus", {"documents": _docs_table(token_lists * 5)}
    )


@settings(**_SETTINGS)
@given(_texts)
def test_tfidf_top_terms_engine_exact(spark, token_lists):
    _run_query_vs_oracle(
        spark, "tfidf_top_terms_per_source", {"documents": _docs_table(token_lists)}
    )


@settings(**_SETTINGS)
@given(_texts)
def test_tfidf_cosine_pairs_engine_exact(spark, token_lists):
    # forced duplicate -> at least one identical-fingerprint family, so the
    # r11 collapse path (rep filter + self-pair + expansion) is live
    _run_query_vs_oracle(
        spark,
        "tfidf_cosine_pairs_docs",
        {"documents": _docs_table(_with_forced_dup(token_lists))},
    )


@settings(**_SETTINGS)
@given(_texts)
def test_tfidf_topk_neighbors_engine_exact(spark, token_lists):
    _run_query_vs_oracle(
        spark,
        "tfidf_topk_neighbors_docs",
        {"documents": _docs_table(_with_forced_dup(token_lists))},
    )


@settings(**_SETTINGS)
@given(_vals)
def test_range_frame_engine_exact(spark, series):
    _run_query_vs_oracle(
        spark, "range_frame_trailing_value", {"events": _events_table(series)}
    )


@settings(**_SETTINGS)
@given(_vals)
def test_grouping_sets_engine_exact(spark, prices):
    _run_query_vs_oracle(
        spark, "grouping_sets_sales", {"orders": _orders_table_classes(prices)}
    )


# --------------------------------------------- collapse == no-collapse A/B


def test_tfidf_collapse_bit_identical(spark):
    """Three exact-duplicate families + distinct docs: the collapsed join
    must emit the SAME pair set with the SAME cosines as the uncollapsed
    one (within-family pairs included, cosine exactly 1.0)."""
    from smart_data_lake_spark.functions.search import tfidf_cosine_pairs

    fam_a = "alpha beta gamma delta alpha beta"
    fam_b = "merge stream window join merge stream window"
    fam_c = "beta beta gamma gamma delta delta alpha"
    texts = [fam_a, fam_b, fam_a, fam_c, fam_b, fam_a, "alpha gamma beta delta x y"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    kw = dict(min_cosine_num=1, min_cosine_den=100, shingle_n=3)
    got = sorted(
        tuple(r) for r in tfidf_cosine_pairs(df, collapse_identical=True, **kw).collect()
    )
    want = sorted(
        tuple(r) for r in tfidf_cosine_pairs(df, collapse_identical=False, **kw).collect()
    )
    assert got == want
    assert len(got) > 0
    # within-family pairs present with cosine exactly 1.0
    ones = {(a, b) for a, b, c in got if c == 1.0}
    assert {(0, 2), (0, 5), (2, 5), (1, 4)} <= ones


# ------------------------------------------------- r11 new-operator parity


def _customer_nation_tables():
    """Minimal customer/nation dims for the Theil spend base."""
    n_cust = 9
    customer = pa.table(
        {
            "c_custkey": pa.array(range(n_cust), pa.int64()),
            "c_name": pa.array([f"c{i}" for i in range(n_cust)], pa.string()),
            "c_nationkey": pa.array([i % 3 for i in range(n_cust)], pa.int64()),
            "c_acctbal": pa.array([float(i) for i in range(n_cust)], pa.float64()),
        }
    )
    nation = pa.table(
        {
            "n_nationkey": pa.array([0, 1, 2], pa.int64()),
            "n_name": pa.array(["AAA", "BBB", "CCC"], pa.string()),
            "n_regionkey": pa.array([0, 0, 1], pa.int64()),
        }
    )
    return customer, nation


@settings(**_SETTINGS)
@given(_vals)
def test_kruskal_wallis_engine_exact(spark, series):
    _run_query_vs_oracle(
        spark, "kruskal_wallis_value_by_type", {"events": _events_table_types(series)}
    )


@settings(**_SETTINGS)
@given(_vals)
def test_cmh_engine_exact(spark, prices):
    _run_query_vs_oracle(
        spark, "cmh_conversion_by_priority", {"orders": _orders_table_classes(prices)}
    )


@settings(**_SETTINGS)
@given(_vals)
def test_page_hinkley_engine_exact(spark, series):
    _run_query_vs_oracle(
        spark, "page_hinkley_value_by_type", {"events": _events_table_types(series)}
    )


@settings(**_SETTINGS)
@given(_vals)
def test_gumbel_engine_exact(spark, series):
    _run_query_vs_oracle(
        spark, "gumbel_return_level_by_type", {"events": _events_table_types(series)}
    )


@settings(**_SETTINGS)
@given(_vals)
def test_theil_engine_exact(spark, prices):
    customer, nation = _customer_nation_tables()
    _run_query_vs_oracle(
        spark,
        "theil_index_spend_by_nation",
        {
            "orders": _orders_table_classes(prices),
            "customer": customer,
            "nation": nation,
        },
    )


@settings(**_SETTINGS)
@given(_vals)
def test_longest_streak_engine_exact(spark, series):
    _run_query_vs_oracle(
        spark, "longest_streak_by_user_events", {"events": _events_table_types(series)}
    )


@settings(**_SETTINGS)
@given(_texts)
def test_simpson_engine_exact(spark, token_lists):
    _run_query_vs_oracle(
        spark, "simpson_diversity_by_source", {"documents": _docs_table(token_lists)}
    )


@settings(**_SETTINGS)
@given(_texts)
def test_yules_k_engine_exact(spark, token_lists):
    _run_query_vs_oracle(
        spark, "yules_k_by_source", {"documents": _docs_table(token_lists)}
    )


@settings(**_SETTINGS)
@given(_texts)
def test_vocab_churn_engine_exact(spark, token_lists):
    _run_query_vs_oracle(
        spark, "vocab_churn_by_source", {"documents": _docs_table(token_lists)}
    )


@settings(**_SETTINGS)
@given(_texts)
def test_cohens_kappa_engine_exact(spark, token_lists):
    _run_query_vs_oracle(
        spark, "cohens_kappa_lang_id", {"documents": _docs_table_langs(token_lists)}
    )


# --------------------------------------------- post-freeze r12-queue parity


@settings(**_SETTINGS)
@given(_vals)
def test_wilcoxon_engine_exact(spark, series):
    _run_query_vs_oracle(
        spark, "wilcoxon_signed_rank_user_halves", {"events": _events_table(series)}
    )


@settings(**_SETTINGS)
@given(_vals)
def test_friedman_engine_exact(spark, series):
    _run_query_vs_oracle(
        spark, "friedman_value_by_type_blocks", {"events": _events_table_types(series)}
    )


@settings(**_SETTINGS)
@given(_vals)
def test_cuped_engine_exact(spark, series):
    _run_query_vs_oracle(
        spark, "cuped_adjusted_value_ab", {"events": _events_table(series)}
    )


@settings(**_SETTINGS)
@given(_vals)
def test_lorenz_engine_exact(spark, prices):
    customer, nation = _customer_nation_tables()
    _run_query_vs_oracle(
        spark,
        "lorenz_curve_spend_by_nation",
        {
            "orders": _orders_table_classes(prices),
            "customer": customer,
            "nation": nation,
        },
    )


@settings(**_SETTINGS)
@given(_vals)
def test_bowley_moors_engine_exact(spark, series):
    _run_query_vs_oracle(
        spark, "bowley_moors_value_by_type", {"events": _events_table_types(series)}
    )


@settings(**_SETTINGS)
@given(_vals)
def test_theil_decomposition_engine_exact(spark, prices):
    customer, nation = _customer_nation_tables()
    _run_query_vs_oracle(
        spark,
        "theil_decomposition_spend",
        {
            "orders": _orders_table_classes(prices),
            "customer": customer,
            "nation": nation,
        },
    )


@settings(**_SETTINGS)
@given(_vals)
def test_wasserstein_engine_exact(spark, series):
    _run_query_vs_oracle(
        spark, "wasserstein_value_drift_by_type", {"events": _events_table_types(series)}
    )
