"""Known-value unit tests for the r11-queue operators added below the
frozen r10 window: Cramér's V, k-anonymity audit, Chao1 vocabulary
richness, fixed-round k-core peeling, Heaps'-law fit."""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_cramers_v_perfect_association(spark):
    """2x2 with perfect dependence: chi2 = N, V = 1."""
    from smart_data_lake_spark.functions.profiling import cramers_v

    rows = [("en", "web")] * 10 + [("de", "book")] * 10
    df = spark.createDataFrame(rows, "lang string, source string")
    out = cramers_v(df, "lang", "source").collect()[0]
    assert out["n"] == 20 and out["dof"] == 1
    assert out["chi2"] == 20.0
    assert out["cramers_v"] == 1.0


def test_cramers_v_independence(spark):
    """Balanced independent 2x2: chi2 = 0, V = 0."""
    from smart_data_lake_spark.functions.profiling import cramers_v

    rows = [("en", "web"), ("en", "book"), ("de", "web"), ("de", "book")] * 5
    df = spark.createDataFrame(rows, "lang string, source string")
    out = cramers_v(df, "lang", "source").collect()[0]
    assert out["chi2"] == 0.0
    assert out["cramers_v"] == 0.0


def test_cramers_v_degenerate_single_column(spark):
    """One source category: min(r-1, c-1) = 0 → V NULL, not a div-0."""
    from smart_data_lake_spark.functions.profiling import cramers_v

    rows = [("en", "web"), ("de", "web"), ("fr", "web")]
    df = spark.createDataFrame(rows, "lang string, source string")
    out = cramers_v(df, "lang", "source").collect()[0]
    assert out["cramers_v"] is None


def test_k_anonymity_known_classes(spark):
    """Classes of size 1, 2, 7 at k=5: 3 rows re-identifiable below k."""
    from smart_data_lake_spark.functions.profiling import k_anonymity_audit

    rows = (
        [("F", "1-URGENT", 1)]
        + [("O", "1-URGENT", 1)] * 2
        + [("O", "2-HIGH", 2)] * 7
    )
    df = spark.createDataFrame(rows, "st string, pr string, m int")
    out = k_anonymity_audit(df, ["st", "pr", "m"], k=5).collect()[0]
    assert out["n_rows"] == 10
    assert out["n_classes"] == 3
    assert out["min_class_size"] == 1
    assert out["n_rows_below_k"] == 3
    assert out["frac_rows_below_k"] == 0.3


def test_k_anonymity_all_anonymous(spark):
    """Every class at or above k → zero rows below, fraction 0."""
    from smart_data_lake_spark.functions.profiling import k_anonymity_audit

    rows = [("a", "x", 1)] * 5 + [("b", "y", 2)] * 6
    df = spark.createDataFrame(rows, "st string, pr string, m int")
    out = k_anonymity_audit(df, ["st", "pr", "m"], k=5).collect()[0]
    assert out["n_rows_below_k"] == 0
    assert out["frac_rows_below_k"] == 0.0
    assert out["min_class_size"] == 5


def test_chao1_known_value(spark):
    """Vocabulary {a:1, b:1, c:2, d:3}: D=4, f1=2, f2=1 →
    chao1 = 4 + 2·1/(2·2) = 4.5."""
    from smart_data_lake_spark.functions.profiling import chao1_vocab_richness

    df = spark.createDataFrame(
        [("s", "a b c c d d d")], "source string, text string"
    )
    out = chao1_vocab_richness(df).collect()[0]
    assert out["n_observed_terms"] == 4
    assert out["f1_singletons"] == 2
    assert out["f2_doubletons"] == 1
    assert out["chao1_estimate"] == 4.5


def test_chao1_no_singletons_is_saturated(spark):
    """No singletons → estimate equals the observed count (saturated)."""
    from smart_data_lake_spark.functions.profiling import chao1_vocab_richness

    df = spark.createDataFrame([("s", "a a b b")], "source string, text string")
    out = chao1_vocab_richness(df).collect()[0]
    assert out["chao1_estimate"] == float(out["n_observed_terms"]) == 2.0


def test_kcore_triangle_with_pendant(spark):
    """Triangle a-b-c plus pendant d-a: at k=2 the pendant peels in round
    1 (degree 1), `a` keeps degree 2 (triangle intact) — survivors are
    exactly the triangle with degree 2 each."""
    from smart_data_lake_spark.functions.graph import kcore_peel

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("d", "a")], "src string, dst string"
    )
    out = {r["node"]: r["degree"] for r in kcore_peel(edges, k=2, rounds=2).collect()}
    assert out == {"a": 2, "b": 2, "c": 2}


def test_kcore_chain_cascades(spark):
    """Path a-b-c-d at k=2: round 1 drops endpoints, round 2 drops the
    rest (their degree fell to 1) — fixed 2 rounds empties the graph."""
    from smart_data_lake_spark.functions.graph import kcore_peel

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], "src string, dst string"
    )
    assert kcore_peel(edges, k=2, rounds=2).count() == 0
    # with only ONE round the middle edge (b, c) is still standing —
    # the fixed-round semantics the docstring promises
    one = {r["node"] for r in kcore_peel(edges, k=2, rounds=1).collect()}
    assert one == {"b", "c"}


def test_kcore_dedups_directed_multi_edges(spark):
    """Reverse and duplicate edges collapse to one undirected edge;
    self-loops are dropped — degrees count NEIGHBORS."""
    from smart_data_lake_spark.functions.graph import kcore_peel

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("a", "b"), ("a", "a"), ("b", "c"), ("c", "a")],
        "src string, dst string",
    )
    out = {r["node"]: r["degree"] for r in kcore_peel(edges, k=2, rounds=1).collect()}
    assert out == {"a": 2, "b": 2, "c": 2}


def test_heaps_beta_separates_growth_regimes(spark):
    """All-distinct vocabulary grows linearly (beta -> 1); a constant
    vocabulary saturates (beta near 0). The fit must rank them."""
    from smart_data_lake_spark.functions.search import heaps_law_fit

    distinct = spark.createDataFrame(
        [(i, " ".join(f"w{i}_{j}" for j in range(4))) for i in range(8)],
        "doc_id long, text string",
    )
    constant = spark.createDataFrame(
        [(i, "a b c d") for i in range(8)], "doc_id long, text string"
    )
    b_grow = heaps_law_fit(distinct).collect()[0]
    b_flat = heaps_law_fit(constant).collect()[0]
    assert b_grow["n_docs"] == b_flat["n_docs"] == 8
    assert b_grow["heaps_beta"] > 0.97
    assert 0 <= b_flat["heaps_beta"] < 0.2
    assert b_grow["heaps_k"] > 0 and b_flat["heaps_k"] > 0


def test_heaps_exact_linear_case(spark):
    """V = N exactly (every token new): beta = 1, K = 1 — the fit is
    exact because all points lie on the line y = x."""
    from smart_data_lake_spark.functions.search import heaps_law_fit

    df = spark.createDataFrame(
        [(i, f"t{i}a t{i}b") for i in range(5)], "doc_id long, text string"
    )
    out = heaps_law_fit(df).collect()[0]
    assert out["heaps_beta"] == 1.0
    assert out["heaps_k"] == 1.0


def test_pairwise_correlations_check_bound_raises(spark):
    """Opt-in bound check: a value past the decimal(18,6) integer budget
    raises a diagnosable error naming the column instead of silently
    NULLing out of the Spark sums (r10 review finding)."""
    import pytest

    from smart_data_lake_spark.functions.profiling import pairwise_correlations

    df = spark.createDataFrame([(2e12, 1.0), (1.0, 2.0)], "a double, b double")
    with pytest.raises(ValueError, match="'a'"):
        pairwise_correlations(df, ["a", "b"], check_bound=True)
    # in-contract data passes the check and computes
    ok = spark.createDataFrame([(1.0, 2.0), (2.0, 4.0), (3.0, 7.0)], "a double, b double")
    out = pairwise_correlations(ok, ["a", "b"], check_bound=True).collect()
    assert len(out) == 1 and out[0]["n"] == 3


def test_length_band_keeps_all_null_group(spark):
    """A group whose length column is entirely NULL still reports
    (n_docs, 0 kept, NULL bounds) instead of vanishing (r10 review
    finding — exact_percentiles omits such groups; the caller must
    left-join)."""
    from smart_data_lake_spark.functions.quality import length_band_stats

    df = spark.createDataFrame(
        [("a", 10), ("a", 20), ("a", 30), ("b", None), ("b", None)],
        "source string, n_chars int",
    )
    out = {r["source"]: r for r in length_band_stats(df).collect()}
    assert set(out) == {"a", "b"}
    assert out["b"]["n_docs"] == 2
    assert out["b"]["n_kept"] == 0
    assert out["b"]["p_lo"] is None and out["b"]["p_hi"] is None
