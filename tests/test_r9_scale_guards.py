"""Round-9 scale-posture fixes from the r8 verdict: the tfidf hot-term
df-cap (item 3), the qgram short-bucket guard (item 4), and the
cluster-shaped exact-join composition's pair-graph equivalence lives in
test_dedup_clusters.py (item 2).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from smart_data_lake_spark.functions.linkage import qgram_editdist_pairs
from smart_data_lake_spark.functions.search import tfidf_cosine_pairs


# ---------------------------------------------------------------------------
# tfidf_cosine_pairs df-cap (verdict item 3)
# ---------------------------------------------------------------------------


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_tfidf_dfcap_none_keeps_every_term_identical(spark):
    """max_df=None (the graded default) and a cap larger than any df must
    produce bit-identical output."""
    rows = [
        (1, "alpha beta gamma delta"),
        (2, "alpha beta gamma delta"),
        (3, "epsilon zeta eta theta"),
        (4, "epsilon zeta eta theta"),
    ]
    docs = _docs(spark, rows)
    uncapped = sorted(
        tuple(r) for r in tfidf_cosine_pairs(docs, shingle_n=1, min_cosine_num=1,
                                             min_cosine_den=2).collect()
    )
    capped = sorted(
        tuple(r) for r in tfidf_cosine_pairs(docs, shingle_n=1, min_cosine_num=1,
                                             min_cosine_den=2, max_df=1000).collect()
    )
    assert uncapped == capped and len(uncapped) == 2


def test_tfidf_dfcap_drops_hot_terms_from_candidate_space(spark):
    """Every doc shares the hot word 'the' (df = N); with max_df below N
    the hot posting list is excluded, so pairs sharing ONLY 'the' never
    materialize, while rare-term pairs keep a well-defined exact cosine
    over the capped vocabulary."""
    rows = [
        (1, "the quasar"),
        (2, "the quasar"),
        (3, "the nebula"),
        (4, "the pulsar"),
    ]
    docs = _docs(spark, rows)
    # uncapped with a permissive threshold: 'the'-only pairs appear
    uncapped = tfidf_cosine_pairs(
        docs, shingle_n=1, min_cosine_num=1, min_cosine_den=100
    )
    assert uncapped.count() == 6  # all pairs share 'the'
    capped = tfidf_cosine_pairs(
        docs, shingle_n=1, min_cosine_num=1, min_cosine_den=100, max_df=3
    ).collect()
    assert {(r.doc_a, r.doc_b) for r in capped} == {(1, 2)}
    # over the capped vocabulary docs 1 and 2 are identical -> cosine 1
    assert capped[0].cosine == pytest.approx(1.0, abs=1e-6)


def test_tfidf_dfcap_logs_dropped_terms(spark, caplog):
    import logging

    rows = [(i, f"the word{i}") for i in range(5)]
    with caplog.at_level(logging.WARNING,
                         logger="smart_data_lake_spark.functions.search"):
        tfidf_cosine_pairs(
            _docs(spark, rows), shingle_n=1, min_cosine_num=1,
            min_cosine_den=100, max_df=2,
        ).collect()
    assert any("df-cap" in r.message and "'the'" in r.message
               for r in caplog.records)


# ---------------------------------------------------------------------------
# qgram_editdist_pairs short-bucket guard (verdict item 4)
# ---------------------------------------------------------------------------


def test_qgram_short_bucket_guard_raises_loudly(spark):
    """An arbitrary short-string corpus past the cap must fail with a
    ValueError naming the mitigation, not run a quadratic theta-join."""
    rows = [(f"ab{i}",) for i in range(40)]  # len 3-4 < q + k*q = 6
    df = spark.createDataFrame(rows, "name string")
    with pytest.raises(ValueError, match="max_short_bucket"):
        qgram_editdist_pairs(df, "name", max_short_bucket=10)


def test_qgram_short_bucket_guard_allows_small_buckets(spark):
    """Dictionary-like inputs (tiny short bucket) pass through unchanged
    and keep exact results across the short/long boundary."""
    rows = [("ab",), ("ac",), ("abcdefgh",), ("abcdefgx",)]
    df = spark.createDataFrame(rows, "name string")
    got = {
        (r.name_a, r.name_b, r.dist)
        for r in qgram_editdist_pairs(df, "name", max_short_bucket=10).collect()
    }
    assert got == {("ab", "ac", 1), ("abcdefgh", "abcdefgx", 1)}
