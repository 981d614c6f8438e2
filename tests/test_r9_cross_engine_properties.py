"""Property-based cross-engine exactness for the r9 statistics: Spark and
DuckDB must agree EXACTLY (not approx) on randomized full-precision series,
per the repo's decimal/integer-sufficient-statistics discipline. The fixed
sf0.01 oracle check can miss quantized boundaries; these generators hit
them.
"""

from __future__ import annotations

import datetime as dt
import os
import sys

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_vals = st.lists(
    st.floats(min_value=-1e5, max_value=1e5, allow_nan=False, allow_infinity=False),
    min_size=4,
    max_size=40,
)


def _frame(series):
    """(event_id, ts, event_type, user_id, value): ts advances 7h per row so
    the series spans multiple days AND hours — exercises the hour ranks,
    day buckets and transition order all at once."""
    base = dt.datetime(2024, 1, 1)
    return [
        (i, base + dt.timedelta(hours=7 * i), "g", i % 3, float(v))
        for i, v in enumerate(series)
    ]


def _spark_df(spark, series):
    return spark.createDataFrame(
        _frame(series),
        "event_id long, ts timestamp, event_type string, user_id long, value double",
    )


def _duck(series):
    import duckdb
    import pandas as pd

    rows = _frame(series)
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": [r[0] for r in rows],
                "ts": [r[1] for r in rows],
                "event_type": [r[2] for r in rows],
                "user_id": [r[3] for r in rows],
                "value": [r[4] for r in rows],
            }
        ),
    )
    return con


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(_vals)
def test_spearman_engine_exact(spark, series):
    import __spark_entry__ as entry
    from pyspark.sql import functions as F

    from smart_data_lake_spark.functions.analytics import spearman_by_group

    hour_utc = (F.floor(F.col("ts").cast("double") / 3600.0) % 24).cast("long")
    got = spearman_by_group(_spark_df(spark, series), "event_type", F.col("value"), hour_utc).collect()
    con = _duck(series)
    want = con.sql(entry.oracle_sql()["spearman_value_hour_by_type"]).fetchall()
    assert len(got) == len(want) == 1
    g, w = got[0], want[0]
    assert g["n"] == w[1]
    assert g["spearman_rho"] == w[2]  # EXACT (both None or both equal)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(_vals)
def test_winsorized_engine_exact(spark, series):
    import __spark_entry__ as entry

    from smart_data_lake_spark.functions.analytics import winsorized_mean_by_group

    got = winsorized_mean_by_group(_spark_df(spark, series), "event_type", "value", "event_id").collect()
    con = _duck(series)
    want = con.sql(entry.oracle_sql()["winsorized_mean_value_by_type"]).fetchall()
    assert len(got) == len(want) == 1
    assert got[0]["n"] == want[0][1]
    assert got[0]["winsorized_mean"] == want[0][2]


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(_vals)
def test_twap_engine_exact(spark, series):
    import __spark_entry__ as entry

    from smart_data_lake_spark.functions.analytics import twap_by_group

    got = twap_by_group(_spark_df(spark, series), "event_type").collect()
    con = _duck(series)
    want = con.sql(entry.oracle_sql()["twap_value_by_type"]).fetchall()
    assert len(got) == len(want) == 1
    g, w = got[0], want[0]
    assert (g["n_segments"], g["total_span_sec"], g["twap"]) == (w[1], w[2], w[3])


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(_vals)
def test_kendall_engine_exact(spark, series):
    import __spark_entry__ as entry

    from smart_data_lake_spark.functions.analytics import (
        kendall_tau_daily_level_volume,
    )

    got = kendall_tau_daily_level_volume(_spark_df(spark, series), "event_type").collect()
    con = _duck(series)
    want = con.sql(entry.oracle_sql()["kendall_tau_level_volume_by_type"]).fetchall()
    # a series inside one calendar day has no day pairs: BOTH engines
    # must agree on emptiness, not just on values
    assert len(got) == len(want)
    if got:
        g, w = got[0], want[0]
        assert (g["n_day_pairs"], g["n_concordant"], g["n_discordant"]) == (w[1], w[2], w[3])
        assert g["kendall_tau_b"] == w[4]


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(_vals)
def test_burstiness_engine_exact(spark, series):
    import __spark_entry__ as entry

    from smart_data_lake_spark.functions.analytics import burstiness_by_group

    got = burstiness_by_group(_spark_df(spark, series), "event_type").collect()
    con = _duck(series)
    want = con.sql(entry.oracle_sql()["burstiness_daily_by_type"]).fetchall()
    assert len(got) == len(want) == 1
    g, w = got[0], want[0]
    assert (g["n_days"], g["n_active_days"]) == (w[1], w[2])
    assert (g["mean_daily"], g["fano_factor"], g["burstiness"]) == (w[3], w[4], w[5])


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(_vals)
def test_next_entropy_engine_exact(spark, series):
    import __spark_entry__ as entry

    from smart_data_lake_spark.functions.analytics import (
        next_event_conditional_entropy,
    )

    # vary the type so transitions exist: type cycles with the value sign
    rows = [
        (i, dt.datetime(2024, 1, 1) + dt.timedelta(hours=7 * i),
         "pos" if v >= 0 else "neg", i % 3, float(v))
        for i, v in enumerate(series)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, user_id long, value double"
    )
    got = {r["event_type"]: r for r in next_event_conditional_entropy(df).collect()}

    import duckdb
    import pandas as pd

    con = duckdb.connect()
    con.register("events", pd.DataFrame({
        "event_id": [r[0] for r in rows], "ts": [r[1] for r in rows],
        "event_type": [r[2] for r in rows], "user_id": [r[3] for r in rows],
        "value": [r[4] for r in rows],
    }))
    want = con.sql(entry.oracle_sql()["next_event_entropy_by_type"]).fetchall()
    assert len(got) == len(want)
    for w in want:
        g = got[w[0]]
        assert (g["n_transitions"], g["n_next_types"], g["next_entropy"]) == (w[1], w[2], w[3])


_words = st.sampled_from(["aa", "ab", "b", "cc", "dd", "e"])
_docs = st.lists(
    st.lists(_words, min_size=1, max_size=12).map(" ".join),
    min_size=2,
    max_size=15,
)


def _doc_frame(texts):
    return [(i, t, f"src{i % 2}", len(t)) for i, t in enumerate(texts)]


def _duck_docs(texts):
    import duckdb
    import pandas as pd

    rows = _doc_frame(texts)
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": [r[0] for r in rows],
                "text": [r[1] for r in rows],
                "source": [r[2] for r in rows],
                "n_chars": [r[3] for r in rows],
            }
        ),
    )
    return con


def _spark_docs(spark, texts):
    return spark.createDataFrame(
        _doc_frame(texts), "doc_id long, text string, source string, n_chars long"
    )


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(_docs)
def test_llr_collocations_engine_exact(spark, texts):
    """Dunning G² over a tiny Zipf-ish vocabulary: repeated bigrams cross
    the min_count=5 floor often, so the ranked top-k and the rounded G²
    must agree exactly across engines (integer contingency cells, one
    double expression)."""
    import __spark_entry__ as entry

    from smart_data_lake_spark.functions.search import llr_collocations

    got = [
        (r["collocation"], r["n_pair"], r["llr_g2"])
        for r in llr_collocations(_spark_docs(spark, texts)).collect()
    ]
    con = _duck_docs(texts)
    want = [tuple(r) for r in con.sql(
        entry.oracle_sql()["llr_collocations_corpus"]
    ).fetchall()]
    assert got == want


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(_docs)
def test_distinct_ngram_ratio_engine_exact(spark, texts):
    """Distinct-1/2 diversity: exact integer type/token counts and one
    rounded division each; single-token docs exercise the no-bigram
    NULL path."""
    import __spark_entry__ as entry

    from smart_data_lake_spark.functions.search import distinct_ngram_ratio

    got = [
        tuple(r)
        for r in distinct_ngram_ratio(_spark_docs(spark, texts))
        .orderBy("source")
        .collect()
    ]
    con = _duck_docs(texts)
    want = [tuple(r) for r in con.sql(
        entry.oracle_sql()["distinct_ngram_ratio_by_source"]
    ).fetchall()]
    assert got == want


_types = st.lists(
    st.sampled_from(["a", "b", "c", "d"]), min_size=2, max_size=30
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(_types)
def test_markov_stationary_engine_exact(spark, type_seq):
    """Scaled-integer power iteration vs the unrolled HUGEINT recurrence:
    random per-user event-type sequences produce arbitrary transition
    matrices (including absorbing states and NULL-free single chains);
    every stationary_e12 must match the oracle's integral arithmetic
    BIT-FOR-BIT — any div/widening divergence shows up as an off-by-one
    on the 1e12 grid."""
    import __spark_entry__ as entry
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from smart_data_lake_spark.functions.graph import markov_stationary

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(hours=i), t, i % 3, 1.0)
        for i, t in enumerate(type_seq)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, user_id long, value double"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        df.select("user_id", "event_type", "ts", "event_id")
        .withColumn("_next", F.lead("event_type").over(w))
        .where(F.col("_next").isNotNull())
        .groupBy(F.col("event_type").alias("src"), F.col("_next").alias("dst"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    got = sorted(
        (r["node"], r["stationary_e12"]) for r in markov_stationary(trans).collect()
    )

    import duckdb
    import pandas as pd

    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": [r[0] for r in rows],
                "ts": [r[1] for r in rows],
                "event_type": [r[2] for r in rows],
                "user_id": [r[3] for r in rows],
                "value": [r[4] for r in rows],
            }
        ),
    )
    want = sorted(
        (r[0], r[1]) for r in con.sql(
            entry.oracle_sql()["markov_stationary_event_types"]
        ).fetchall()
    )
    assert got == want


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(_docs)
def test_hits_engine_exact(spark, texts):
    """HITS hubs/authorities vs the unrolled HUGEINT recurrence: random
    tiny corpora produce arbitrary token-adjacency graphs (self-loops,
    sinks, disconnected terms); the scaled-integer power method with
    max-normalization must match the oracle bit-for-bit on the 1e12
    grid, including the deterministic top-20 cut."""
    import __spark_entry__ as entry
    from pyspark.sql import functions as F

    from smart_data_lake_spark.functions.graph import hits, token_transition_edges

    h = hits(
        token_transition_edges(_spark_docs(spark, texts)),
        weight_col="weight",
        iterations=3,
    )
    got = [
        (r["term"], r["authority_e12"], r["hub_e12"])
        for r in h.orderBy(F.desc("authority_e12"), F.asc("node"))
        .limit(20)
        .select(F.col("node").alias("term"), "authority_e12", "hub_e12")
        .collect()
    ]
    con = _duck_docs(texts)
    want = [tuple(r) for r in con.sql(
        entry.oracle_sql()["hits_terms_corpus"]
    ).fetchall()]
    assert got == want
