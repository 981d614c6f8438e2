"""Property-based cross-engine exactness: the decimal-discipline operators
must produce IDENTICAL values in Spark and DuckDB on randomized data, not
just on the fixed sf0.01 corpus.

These properties encode the round-6 exactness lessons (Spark's 38-digit
decimal multiply silently re-rounds products; DuckDB's hugeint→double cast
is lossy; rounded quotients diverge at quantized boundaries; window frames
evaluate in different orders) — a regression in any of those disciplines
shows up here as a value mismatch on some generated series, where the
fixed-corpus oracle check might not hit the boundary."""

from __future__ import annotations

import datetime as dt
import math
import os
import sys

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# full-precision doubles (NOT 3dp-quantized like the sf corpora): this is
# what stresses the round-before-decimal-sum discipline
_vals = st.lists(
    st.floats(
        min_value=-1e5, max_value=1e5, allow_nan=False, allow_infinity=False
    ),
    min_size=4,
    max_size=40,
)


def _events_df(spark, series):
    rows = [
        (i, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i), "g", float(v))
        for i, v in enumerate(series)
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )


def _duck_events(con, series):
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "event_id": range(len(series)),
            "ts": [
                dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i)
                for i in range(len(series))
            ],
            "event_type": ["g"] * len(series),
            "value": [float(v) for v in series],
        }
    )
    con.register("events", pdf)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(_vals)
def test_autocorr_engine_exact(spark, series):
    import duckdb

    import __spark_entry__ as entry
    from smart_data_lake_spark.functions.analytics import lagged_autocorrelation

    got = lagged_autocorrelation(_events_df(spark, series)).collect()
    con = duckdb.connect()
    _duck_events(con, series)
    want = con.sql(entry.oracle_sql()["autocorr_lag1_value_by_type"]).fetchall()
    assert len(got) == len(want) == 1
    g, w = got[0], want[0]
    assert g["n_pairs"] == w[1]
    if g["autocorr_lag1"] is None:
        assert w[2] is None
    else:
        assert g["autocorr_lag1"] == w[2]  # EXACT equality, not approx


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(_vals)
def test_cusum_engine_exact(spark, series):
    import duckdb

    import __spark_entry__ as entry
    from smart_data_lake_spark.functions.analytics import cusum_changepoint

    got = cusum_changepoint(_events_df(spark, series)).collect()
    con = duckdb.connect()
    _duck_events(con, series)
    want = con.sql(entry.oracle_sql()["cusum_changepoint_by_type"]).fetchall()
    assert len(got) == len(want) == 1
    g, w = got[0], want[0]
    assert (g["n"], g["change_point_id"]) == (w[1], w[2])
    assert g["max_abs_cusum"] == w[3]  # bit-exact double


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(_vals)
def test_rolling_z_engine_exact(spark, series):
    import duckdb

    import __spark_entry__ as entry
    from smart_data_lake_spark.functions.analytics import rolling_zscore_anomalies

    got = rolling_zscore_anomalies(_events_df(spark, series)).collect()
    con = duckdb.connect()
    _duck_events(con, series)
    want = con.sql(entry.oracle_sql()["rolling_z_anomalies_events"]).fetchall()
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g["event_id"] == w[1]
        assert g["value"] == w[2] and g["roll_mean"] == w[3] and g["z"] == w[4]


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.sampled_from(["s1", "s2"]), st.integers(1, 100000)),
        min_size=4,
        max_size=50,
    )
)
def test_ks_engine_exact(spark, rows):
    import duckdb
    import pandas as pd

    import __spark_entry__ as entry
    from smart_data_lake_spark.functions.profiling import ks_statistic

    if not any(s == "s1" for s, _ in rows) or not any(s == "s2" for s, _ in rows):
        return  # KS needs both samples
    df = spark.createDataFrame(
        [(i, s, n) for i, (s, n) in enumerate(rows)],
        "doc_id long, source string, n_chars long",
    )
    got = ks_statistic(df, "n_chars", "source", "s1", "s2").collect()[0]
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(len(rows)),
                "source": [("src1" if s == "s1" else "src2") for s, _ in rows],
                "n_chars": [n for _, n in rows],
                "text": [""] * len(rows),
                "lang": ["en"] * len(rows),
            }
        ),
    )
    w = con.sql(entry.oracle_sql()["length_drift_ks"]).fetchall()[0]
    assert got["ks"] == w[0] and got["at_value"] == w[1]
    assert (got["n_a"], got["n_b"]) == (w[2], w[3])


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(_vals)
def test_decayed_popularity_engine_exact(spark, series):
    import duckdb

    import __spark_entry__ as entry
    from smart_data_lake_spark.functions.analytics import decayed_popularity

    got = decayed_popularity(_events_df(spark, series), half_life_hours=24.0).collect()
    con = duckdb.connect()
    _duck_events(con, series)
    want = con.sql(entry.oracle_sql()["decayed_popularity_by_type"]).fetchall()
    assert len(got) == len(want) == 1
    g, w = got[0], want[0]
    assert g["n_events"] == w[1]
    assert g["decayed_score"] == w[2]  # exact: rounded exp pre-sum + decimal


_docs = st.lists(
    st.tuples(
        st.sampled_from(["en", "de", "fr"]),
        st.sampled_from(["s1", "s2", "s3"]),
        st.integers(1, 10**9),
    ),
    min_size=2,
    max_size=60,
)


def _register_docs(con, rows):
    import pandas as pd

    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(len(rows)),
                "text": [""] * len(rows),
                "lang": [r[0] for r in rows],
                "source": [r[1] for r in rows],
                "n_chars": [r[2] for r in rows],
            }
        ),
    )


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(_docs)
def test_chisq_engine_exact(spark, rows):
    import duckdb

    import __spark_entry__ as entry
    from smart_data_lake_spark.functions.profiling import chi_square_independence

    df = spark.createDataFrame(
        [(i, "", lang, src, n) for i, (lang, src, n) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = chi_square_independence(df, "lang", "source").collect()[0]
    con = duckdb.connect()
    _register_docs(con, rows)
    w = con.sql(entry.oracle_sql()["lang_source_chisq"]).fetchall()[0]
    assert (got["dof"], got["n"]) == (w[1], w[2])
    assert got["chi2"] == w[0]  # exact: per-cell terms rounded pre-decimal-sum


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["src1", "src2", "src3"]),
            st.text(alphabet="abcde ", min_size=1, max_size=30),
        ),
        min_size=2,
        max_size=30,
    )
)
def test_vocab_jaccard_engine_exact(spark, rows):
    import duckdb
    import pandas as pd

    import __spark_entry__ as entry
    from smart_data_lake_spark.functions.search import source_vocab_overlap

    df = spark.createDataFrame(
        [(i, text, src) for i, (src, text) in enumerate(rows)],
        "doc_id long, text string, source string",
    )
    got = sorted(
        (r["source_a"], r["source_b"], r["n_common"], r["n_a"], r["n_b"], r["jaccard"])
        for r in source_vocab_overlap(df).collect()
    )
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(len(rows)),
                "text": [t for _, t in rows],
                "lang": ["en"] * len(rows),
                "source": [s for s, _ in rows],
                "n_chars": [len(t) for _, t in rows],
            }
        ),
    )
    want = sorted(tuple(r) for r in con.sql(entry.oracle_sql()["source_vocab_jaccard"]).fetchall())
    assert got == want  # exact incl. the unrounded integer-derived division


# --- r7 additions: the remaining rotated decimal-discipline operators -----

# small 2-char alphabet so bigrams repeat (pmi's min_count is reachable) and
# rank ties exercise the (freq DESC, term) ordering on both engines
_token_docs = st.lists(
    st.lists(st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"]), max_size=12),
    min_size=1,
    max_size=20,
)


def _text_docs_spark(spark, docs_tokens):
    rows = [(i, f"s{i % 2 + 1}", " ".join(t)) for i, t in enumerate(docs_tokens)]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def _register_text_docs(con, docs_tokens):
    import pandas as pd

    texts = [" ".join(t) for t in docs_tokens]
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(len(docs_tokens)),
                "text": texts,
                "lang": ["en"] * len(docs_tokens),
                "source": [f"s{i % 2 + 1}" for i in range(len(docs_tokens))],
                "n_chars": [len(t) for t in texts],
            }
        ),
    )


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(_token_docs)
def test_zipf_slope_engine_exact(spark, docs_tokens):
    import duckdb

    import __spark_entry__ as entry
    from smart_data_lake_spark.functions.search import zipf_slope

    got = sorted(
        (r["source"], r["n_terms"], r["zipf_slope"])
        for r in zipf_slope(_text_docs_spark(spark, docs_tokens)).collect()
    )
    con = duckdb.connect()
    _register_text_docs(con, docs_tokens)
    want = [tuple(r) for r in con.sql(entry.oracle_sql()["zipf_slope_by_source"]).fetchall()]
    assert got == want  # exact: rounded-ln decimal sufficient statistics


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(_token_docs)
def test_bigram_lm_engine_exact(spark, docs_tokens):
    import duckdb

    import __spark_entry__ as entry
    from smart_data_lake_spark.functions.quality import bigram_logprob_score

    got = sorted(
        (r["doc_id"], r["n_bigrams"], r["avg_bigram_logprob"])
        for r in bigram_logprob_score(_text_docs_spark(spark, docs_tokens)).collect()
    )
    con = duckdb.connect()
    _register_text_docs(con, docs_tokens)
    want = [tuple(r) for r in con.sql(entry.oracle_sql()["bigram_lm_docs"]).fetchall()]
    assert got == want  # exact: per-bigram logp rounded pre-decimal-sum


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(_token_docs)
def test_pmi_engine_exact(spark, docs_tokens):
    import duckdb

    import __spark_entry__ as entry
    from smart_data_lake_spark.functions.search import pmi_collocations

    # min_count=2 so generated corpora actually produce collocations
    got = [
        (r["collocation"], r["c12"], r["pmi"])
        for r in pmi_collocations(
            _text_docs_spark(spark, docs_tokens), min_count=2, k=25
        ).collect()
    ]
    con = duckdb.connect()
    _register_text_docs(con, docs_tokens)
    sql = entry.oracle_sql()["pmi_collocations_corpus"].replace(
        "HAVING COUNT(*) >= 5", "HAVING COUNT(*) >= 2"
    )
    want = [tuple(r) for r in con.sql(sql).fetchall()]
    assert got == want  # exact: rounded-pmi rank is the tie-stable order


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.lists(
            st.floats(min_value=-1e4, max_value=1e4, allow_nan=False, allow_infinity=False),
            min_size=3,
            max_size=3,
        ),
        min_size=1,
        max_size=20,
    )
)
def test_kmeans_assign_engine_exact(spark, vecs):
    import duckdb
    import pandas as pd

    import __spark_entry__ as entry
    from smart_data_lake_spark.functions.similarity import kmeans_assign_stats

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    got = sorted(
        (r["cluster"], r["n_points"], r["total_sqdist"])
        for r in kmeans_assign_stats(df).collect()
    )
    con = duckdb.connect()
    con.register(
        "embeddings",
        pd.DataFrame(
            {"vec_id": range(len(vecs)), "embedding": [[float(x) for x in v] for v in vecs]}
        ),
    )
    want = [tuple(r) for r in con.sql(entry.oracle_sql()["kmeans_assign_embeddings"]).fetchall()]
    assert got == want  # exact: per-dim sqdiff rounded pre-decimal-fold


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(_vals)
def test_value_quartiles_engine_exact(spark, series):
    import duckdb

    import __spark_entry__ as entry
    from smart_data_lake_spark.functions.profiling import exact_quartiles

    got = exact_quartiles(_events_df(spark, series), "value", ["event_type"]).collect()
    con = duckdb.connect()
    _duck_events(con, series)
    want = con.sql(entry.oracle_sql()["value_quartiles_by_type"]).fetchall()
    assert len(got) == len(want) == 1
    g, w = got[0], want[0]
    assert g["n"] == w[1]
    assert (g["q1"], g["median"], g["q3"]) == (w[2], w[3], w[4])


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.lists(
            st.floats(min_value=-1e3, max_value=1e3, allow_nan=False, allow_infinity=False),
            min_size=8,
            max_size=8,
        ),
        min_size=3,
        max_size=15,
    )
)
def test_pq_encode_engine_exact(spark, vecs):
    """pq_encode's codes + decimal quantization error are bit-identical to
    the DuckDB oracle formulation on arbitrary float vectors (dim=8, m=4
    subspaces of 2, k=3 seeds)."""
    import duckdb
    import pandas as pd

    from smart_data_lake_spark.functions.similarity import pq_encode

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    import __spark_entry__ as entry

    k = min(3, len(vecs))
    got = sorted(
        tuple(r) for r in pq_encode(df, m=4, k=k, dim=8).collect()
    )
    # the SAME SQL builder the graded oracle uses, at the test's scale —
    # one recipe, no hand-copied twin to drift out of sync
    pq = entry._pq_sql_parts(m=4, k=k, sub=2)
    con = duckdb.connect()
    con.register(
        "embeddings",
        pd.DataFrame(
            {"vec_id": range(len(vecs)), "embedding": [[float(x) for x in v] for v in vecs]}
        ),
    )
    want = sorted(
        tuple(r)
        for r in con.sql(
            f"""
        WITH seeds AS ({pq['seeds']}),
        dists AS (SELECT e.vec_id, s.seed_id, {pq['dist_cols']} FROM embeddings e CROSS JOIN seeds s),
        ranked AS (SELECT *, {pq['rk_cols']} FROM dists),
        agg AS (SELECT vec_id, {pq['code_cols']}, {pq['md_cols']} FROM ranked GROUP BY vec_id)
        SELECT vec_id, code_0, code_1, code_2, code_3,
               round(CAST({pq['qerr']} AS DOUBLE), 6) AS qerr
        FROM agg"""
        ).fetchall()
    )
    assert got == want


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.lists(st.sampled_from("abcd"), min_size=1, max_size=12).map(" ".join),
        min_size=1,
        max_size=20,
    )
)
def test_cms_engine_exact(spark, texts):
    """cms_heavy_hitters' md5 sketch estimates + exact counts are
    bit-identical to the DuckDB oracle on arbitrary small corpora (width
    forced tiny so collisions actually occur and the MIN-over-rows estimate
    is exercised, not just the collision-free fast path)."""
    import duckdb
    import pandas as pd

    from smart_data_lake_spark.functions.profiling import cms_heavy_hitters

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = sorted(
        tuple(r) for r in cms_heavy_hitters(df, depth=2, width=4, phi_denominator=10).collect()
    )
    import __spark_entry__ as entry

    con = duckdb.connect()
    con.register("documents", pd.DataFrame({"doc_id": range(len(texts)), "text": texts}))
    # the graded oracle's bucket fragment at the test's width
    bucket = entry._CMS_BUCKET.replace("{width}", "4")
    want = sorted(
        tuple(r)
        for r in con.sql(
            rf"""
        WITH toks AS (
          SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
          FROM documents WHERE length(trim(text)) > 0
        ),
        js AS (SELECT unnest(range(0, 2)) AS j),
        cells AS (
          SELECT j, {bucket.format(j='j', term='term')} AS bucket, COUNT(*) AS c
          FROM toks, js GROUP BY 1, 2
        ),
        tot AS (SELECT SUM(c) AS t FROM cells WHERE j = 0),
        terms AS (SELECT DISTINCT term FROM toks),
        est AS (
          SELECT t.term, MIN(c.c) AS cms_estimate
          FROM terms t, js
          JOIN cells c ON c.j = js.j AND c.bucket = {bucket.format(j='js.j', term='t.term')}
          GROUP BY t.term
        ),
        cand AS (SELECT term, cms_estimate FROM est, tot WHERE cms_estimate * 10 >= t),
        exact AS (
          SELECT k.term, k.cms_estimate, COUNT(*) AS n_exact
          FROM toks JOIN cand k USING (term) GROUP BY 1, 2
        )
        SELECT term, cms_estimate, n_exact FROM exact, tot WHERE n_exact * 10 >= t"""
        ).fetchall()
    )
    assert got == want


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.lists(
            st.text(alphabet="abcx", min_size=1, max_size=6), min_size=1, max_size=8
        ).map(" ".join),
        min_size=1,
        max_size=15,
    )
)
def test_bpe_merge_candidates_engine_exact(spark, texts):
    """bpe_merge_candidates' weighted pair counts and tie-stable top-k are
    bit-identical to the graded DuckDB oracle on arbitrary corpora
    (single-char words excluded on both sides, limit-boundary ties broken
    by pair text)."""
    import duckdb
    import pandas as pd

    import __spark_entry__ as entry
    from smart_data_lake_spark.functions.text import bpe_merge_candidates

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = [tuple(r) for r in bpe_merge_candidates(df).collect()]
    con = duckdb.connect()
    con.register("documents", pd.DataFrame({"doc_id": range(len(texts)), "text": texts}))
    want = [tuple(r) for r in con.sql(entry.oracle_sql()["bpe_merge_candidates_corpus"]).fetchall()]
    assert got == want


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(_token_docs)
def test_pagerank_engine_exact(spark, docs_tokens):
    import duckdb

    import __spark_entry__ as entry
    from smart_data_lake_spark.functions.graph import pagerank, token_transition_edges

    edges = token_transition_edges(_text_docs_spark(spark, docs_tokens))
    pr = pagerank(edges, weight_col="weight", iterations=5)
    got = sorted(
        (r["node"], r["rank_e12"])
        for r in pr.orderBy(pr.rank_e12.desc(), "node").limit(20).collect()
    )
    con = duckdb.connect()
    _register_text_docs(con, docs_tokens)
    want = sorted(
        tuple(r) for r in con.sql(entry.oracle_sql()["pagerank_terms_corpus"]).fetchall()
    )
    # exact: the whole power method runs in scaled-integer arithmetic
    assert got == want


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.sampled_from(["s1", "s2", "s3"]), st.integers(1, 100000)),
        min_size=1,
        max_size=60,
    )
)
def test_weighted_sample_engine_exact(spark, rows):
    import duckdb
    import pandas as pd

    import __spark_entry__ as entry
    from smart_data_lake_spark.functions.sampling import weighted_fixed_k_per_group

    sdf = spark.createDataFrame(
        [(i, s, n) for i, (s, n) in enumerate(rows)],
        "doc_id long, source string, n_chars long",
    )
    got = sorted(
        (r["doc_id"], r["source"], r["n_chars"], r["sample_rank"])
        for r in weighted_fixed_k_per_group(sdf, "doc_id", "source", "n_chars", k=3)
        .select("doc_id", "source", "n_chars", "sample_rank")
        .collect()
    )
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(len(rows)),
                "source": [s for s, _ in rows],
                "n_chars": [n for _, n in rows],
            }
        ),
    )
    want = sorted(tuple(r) for r in con.sql(entry.oracle_sql()["weighted_sample_docs"]).fetchall())
    # exact: dyadic u + rounded ln(u)/w key + doc_id tie-break
    assert got == want


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        # min below half a cent on purpose: values rounding to 0 cents must
        # be excluded from the denominator in BOTH engines
        st.floats(min_value=0.001, max_value=1e6, allow_nan=False, allow_infinity=False),
        min_size=1,
        max_size=50,
    )
)
def test_benford_engine_exact(spark, amounts):
    import duckdb
    import pandas as pd

    import __spark_entry__ as entry
    from smart_data_lake_spark.functions.profiling import benford_first_digit

    sdf = spark.createDataFrame([(float(a),) for a in amounts], "o_totalprice double")
    got = sorted(tuple(r) for r in benford_first_digit(sdf, "o_totalprice").collect())
    con = duckdb.connect()
    con.register("orders", pd.DataFrame({"o_totalprice": [float(a) for a in amounts]}))
    want = sorted(tuple(r) for r in con.sql(entry.oracle_sql()["benford_order_totals"]).fetchall())
    # exact: integer-cents digit extraction + shared-literal expectations
    assert got == want


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(_vals)
def test_holt_engine_exact(spark, series):
    import duckdb

    import __spark_entry__ as entry
    from smart_data_lake_spark.functions.analytics import holt_linear_by_group

    got = sorted(
        tuple(r)
        for r in holt_linear_by_group(
            _events_df(spark, series), "event_type", "ts", "value", tiebreak_col="event_id"
        ).collect()
    )
    con = duckdb.connect()
    _duck_events(con, series)
    want = sorted(tuple(r) for r in con.sql(entry.oracle_sql()["holt_forecast_by_type"]).fetchall())
    # exact: every smoothing step rounds floor(x*1e9+0.5)/1e9 in both engines
    assert got == want


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(_vals)
def test_trimmed_mean_engine_exact(spark, series):
    """Rank-based trimming must keep the IDENTICAL row set in both engines
    (total order on value,event_id) and the decimal-sum/single-division mean
    must agree to the rounded digit."""
    import duckdb

    import __spark_entry__ as entry
    from smart_data_lake_spark.functions.analytics import trimmed_mean_by_group

    got = trimmed_mean_by_group(
        _events_df(spark, series), "event_type", "value", "event_id"
    ).collect()
    con = duckdb.connect()
    _duck_events(con, series)
    want = con.sql(entry.oracle_sql()["trimmed_mean_value_by_type"]).fetchall()
    assert len(got) == len(want) == 1
    g, w = got[0], want[0]
    assert g["n_kept"] == w[1]
    assert g["trimmed_mean"] == pytest.approx(w[2], abs=0)  # bit-identical


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(_vals)
def test_mann_kendall_engine_exact(spark, series):
    """S is an exact integer built from division-free cross-multiplied sign
    comparisons — any engine divergence is a hard failure, no tolerance."""
    import duckdb

    import __spark_entry__ as entry
    from smart_data_lake_spark.functions.analytics import mann_kendall_by_group

    # spread the series over several days so the pairwise stage has work
    rows = [
        (i, dt.datetime(2024, 1, 1 + (i % 7)), "g", float(v))
        for i, v in enumerate(series)
    ]
    sdf = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    got = mann_kendall_by_group(sdf, "event_type", "ts", "value").collect()
    con = duckdb.connect()
    import pandas as pd

    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(series)),
                "ts": [dt.datetime(2024, 1, 1 + (i % 7)) for i in range(len(series))],
                "event_type": ["g"] * len(series),
                "value": [float(v) for v in series],
            }
        ),
    )
    want = con.sql(entry.oracle_sql()["mann_kendall_trend_by_type"]).fetchall()
    assert len(got) == len(want) == 1
    g, w = got[0], want[0]
    assert g["s_statistic"] == w[1]
    assert g["n_periods"] == w[2]


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(_vals)
def test_theil_sen_engine_exact(spark, series):
    """Daily means are double divisions of exact decimal sums and the
    median picks by row_number — the full lag chain must agree with DuckDB
    bit-for-bit on full-precision doubles."""
    import duckdb

    import pandas as pd

    import __spark_entry__ as entry
    from smart_data_lake_spark.functions.analytics import theil_sen_trend_by_group

    rows = [
        (i, dt.datetime(2024, 1, 1 + (i % 9)), "g", float(v))
        for i, v in enumerate(series)
    ]
    sdf = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    got = theil_sen_trend_by_group(sdf).collect()
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(series)),
                "ts": [dt.datetime(2024, 1, 1 + (i % 9)) for i in range(len(series))],
                "event_type": ["g"] * len(series),
                "value": [float(v) for v in series],
            }
        ),
    )
    want = con.sql(entry.oracle_sql()["theil_sen_trend_by_type"]).fetchall()
    assert len(got) == len(want) == 1
    assert got[0]["n_pairs"] == want[0][1]
    assert got[0]["ts_slope"] == want[0][2]


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(_vals)
def test_gini_engine_exact(spark, series):
    """Rank-weighted decimal sums: equal values must commute under any tie
    order and the final double ratio must match DuckDB exactly."""
    import duckdb

    import pandas as pd

    from smart_data_lake_spark.functions.profiling import gini_by_group

    # non-negative values (Gini's domain); include exact duplicates
    vals = [abs(v) for v in series] + [abs(series[0])]
    sdf = spark.createDataFrame(
        [("g", f"k{i}", float(v)) for i, v in enumerate(vals)],
        "grp string, key string, v double",
    )
    got = gini_by_group(sdf, "grp", "key", "v").collect()
    con = duckdb.connect()
    con.register(
        "t",
        pd.DataFrame({"grp": ["g"] * len(vals), "key": [f"k{i}" for i in range(len(vals))],
                      "v": [float(v) for v in vals]}),
    )
    want = con.sql(
        """
        WITH ranked AS (
          SELECT grp, CAST(v AS DECIMAL(18,6)) AS x,
                 row_number() OVER (PARTITION BY grp ORDER BY CAST(v AS DECIMAL(18,6)), key) AS i
          FROM t
        ), agg AS (
          SELECT grp, COUNT(*) AS n, SUM(x) AS sx,
                 SUM(CAST(i AS DECIMAL(28,6)) * CAST(x AS DECIMAL(28,6))) AS six
          FROM ranked GROUP BY grp
        )
        SELECT grp, CAST(n AS BIGINT),
               CASE WHEN CAST(sx AS DOUBLE) != 0
                    THEN round((2.0 * CAST(six AS DOUBLE) - (CAST(n AS DOUBLE) + 1.0) * CAST(sx AS DOUBLE))
                               / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE)), 6) END
        FROM agg
        """
    ).fetchall()
    assert len(got) == len(want) == 1
    assert got[0]["n_keys"] == want[0][1]
    assert got[0]["gini"] == want[0][2]
