"""r11 rounding-divergence sweep (executed early, during r10, on entries
BELOW the frozen r10 window): property-based cross-engine exactness for the
members the r10 README queued — minhash-calibration ``est_jaccard`` and the
ngram-Jaccard emitted similarity (int/int rationals), bigram/unigram-LM
logprobs (libm-log terms + decimal-sum/count rational finals), RRF
contributions (1/(k+rank) at 1e-9) and the BM25 rounded score they rank on,
Benford observed fractions + the cents quantization, mad/median (reworked to
EXPLICIT order statistics, the exact_quartiles treatment), and the
input-side 1e-6 rounds of lagged_autocorrelation / decayed_popularity /
pairwise_correlations / cusum.

Pattern (stronger than the per-expression r9/r10 generators): each test
generates a small random frame, writes it as the REAL table parquet into a
temp sf_dir, runs the REGISTERED query through ``entry.queries()`` on Spark
and the REGISTERED oracle through DuckDB over the same frame, and compares
the full sorted value multiset exactly — so the whole member plan is
falsifiable, not just its final rounding expression. Mechanism-level
proof-of-teeth (engine round() provably diverging where grid_round does
not) lives in test_r10_cross_engine_properties.test_grid_round_mechanism_
engine_exact; these tests establish the member functions and their oracles
compute identical values through the shared grid.
"""

from __future__ import annotations

import datetime as dt
import decimal
import math
import os
import shutil
import sys
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_SETTINGS = dict(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))

_vals = st.lists(
    st.floats(min_value=-1e5, max_value=1e5, allow_nan=False, allow_infinity=False),
    min_size=4,
    max_size=24,
)

_pos_vals = st.lists(
    st.floats(min_value=0.001, max_value=9e5, allow_nan=False, allow_infinity=False),
    min_size=4,
    max_size=24,
)

_VOCAB = ["merge", "stream", "window", "alpha", "beta", "gamma", "delta", "join"]
_texts = st.lists(
    st.lists(st.integers(min_value=0, max_value=len(_VOCAB) - 1), min_size=3, max_size=10),
    min_size=2,
    max_size=8,
)


def _norm(v):
    """Canonical value for exact comparison, keeping the numeric class
    (int vs float vs decimal mismatches must FAIL, same as the driver)."""
    if v is None:
        return None
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, float):
        return ("f", "NaN") if math.isnan(v) else ("f", v)
    if isinstance(v, decimal.Decimal):
        return ("d", str(v.normalize()))
    if isinstance(v, dt.datetime):
        return ("t", v.replace(tzinfo=None).isoformat())
    return ("s", str(v))


def _run_query_vs_oracle(spark, name: str, tables: dict[str, pa.Table]) -> None:
    """Write the generated tables as a temp sf_dir, run the registered
    Spark query and the registered DuckDB oracle, compare exactly."""
    import duckdb

    import __spark_entry__ as entry

    d = tempfile.mkdtemp(prefix="r11prop_")
    try:
        for t, tab in tables.items():
            pq.write_table(tab, os.path.join(d, f"{t}.parquet"))
        sdf = entry.queries()[name](spark, d)
        got_cols = sorted(sdf.columns)
        got = [tuple(_norm(r[c]) for c in got_cols) for r in sdf.collect()]

        con = duckdb.connect()
        for t, tab in tables.items():
            con.register(t, tab)
        rel = con.sql(entry.oracle_sql()[name])
        idx = {c: i for i, c in enumerate(rel.columns)}
        want_cols = sorted(rel.columns)
        assert got_cols == want_cols, f"{name}: columns {got_cols} != {want_cols}"
        want = [tuple(_norm(r[idx[c]]) for c in want_cols) for r in rel.fetchall()]

        assert sorted(got, key=repr) == sorted(want, key=repr), (
            f"{name}: spark={sorted(got, key=repr)[:6]} "
            f"duck={sorted(want, key=repr)[:6]}"
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


_BASE_TS = dt.datetime(2024, 1, 1)


def _events_table(series) -> pa.Table:
    n = len(series)
    return pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(
                [_BASE_TS + dt.timedelta(hours=7 * i) for i in range(n)],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([i % 3 for i in range(n)], pa.int64()),
            "event_type": pa.array(["g"] * n, pa.string()),
            "value": pa.array([float(v) for v in series], pa.float64()),
            "props": pa.array([""] * n, pa.string()),
        }
    )


def _orders_table(prices) -> pa.Table:
    n = len(prices)
    return pa.table(
        {
            "o_orderkey": pa.array(range(n), pa.int64()),
            "o_custkey": pa.array([i % 5 for i in range(n)], pa.int64()),
            "o_orderstatus": pa.array(["F"] * n, pa.string()),
            "o_totalprice": pa.array([float(p) for p in prices], pa.float64()),
            "o_orderdate": pa.array(
                [_BASE_TS + dt.timedelta(days=i) for i in range(n)],
                pa.timestamp("us"),
            ),
            "o_orderpriority": pa.array(["1-URGENT"] * n, pa.string()),
        }
    )


def _docs_table(token_lists) -> pa.Table:
    texts = [" ".join(_VOCAB[i] for i in toks) for toks in token_lists]
    n = len(texts)
    return pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * n, pa.string()),
            "source": pa.array(["web" if i % 2 else "book" for i in range(n)], pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


def _lineitem_table(rows) -> pa.Table:
    n = len(rows)
    return pa.table(
        {
            "l_orderkey": pa.array(range(n), pa.int64()),
            "l_partkey": pa.array([i % 7 for i in range(n)], pa.int64()),
            "l_suppkey": pa.array([i % 3 for i in range(n)], pa.int64()),
            "l_linenumber": pa.array([1] * n, pa.int32()),
            "l_quantity": pa.array([r[0] for r in rows], pa.float64()),
            "l_extendedprice": pa.array([r[1] for r in rows], pa.float64()),
            "l_discount": pa.array([r[2] for r in rows], pa.float64()),
            "l_tax": pa.array([r[3] for r in rows], pa.float64()),
            "l_returnflag": pa.array(["N"] * n, pa.string()),
            "l_linestatus": pa.array(["O"] * n, pa.string()),
            "l_shipdate": pa.array(
                [_BASE_TS + dt.timedelta(days=i) for i in range(n)],
                pa.timestamp("us"),
            ),
        }
    )


# ------------------------------------------------------------- events family


@settings(**_SETTINGS)
# the exact_quartiles-documented interpolation pseudo-tie: median of the
# first two is 0.4750075 on the shortest-decimal grid, where engine round()
# diverges across engines (the case that forced the order-statistics rework)
@example([0.475007, 0.475008, 1.0, 2.0])
@given(_vals)
def test_mad_outliers_engine_exact(spark, series):
    _run_query_vs_oracle(spark, "mad_outliers_events", {"events": _events_table(series)})


@settings(**_SETTINGS)
@example([16666.3333215, -16666.3333215, 1.0, 2.0, 3.0])  # winsorized-class input
@given(_vals)
def test_autocorr_lag1_engine_exact(spark, series):
    _run_query_vs_oracle(
        spark, "autocorr_lag1_value_by_type", {"events": _events_table(series)}
    )


@settings(**_SETTINGS)
@given(_vals)
def test_cusum_changepoint_engine_exact(spark, series):
    _run_query_vs_oracle(
        spark, "cusum_changepoint_by_type", {"events": _events_table(series)}
    )


@settings(**_SETTINGS)
@given(_vals)
def test_decayed_popularity_engine_exact(spark, series):
    _run_query_vs_oracle(
        spark, "decayed_popularity_by_type", {"events": _events_table(series)}
    )


# ------------------------------------------------------------- orders family


@settings(**_SETTINGS)
# near-half-cent inputs: the cents quantization is grid_round(x*100, 0) on
# both sides — engine round() is the class the sweep removed
@example([0.005, 1.004999999999999, 12345.675, 99997.999929 / 6])
@given(_pos_vals)
def test_benford_engine_exact(spark, prices):
    _run_query_vs_oracle(spark, "benford_order_totals", {"orders": _orders_table(prices)})


# ----------------------------------------------------------- lineitem family


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.floats(min_value=0.0, max_value=50.0, allow_nan=False),
            st.floats(min_value=0.0, max_value=1e5, allow_nan=False),
            st.floats(min_value=0.0, max_value=0.1, allow_nan=False),
            st.floats(min_value=0.0, max_value=0.08, allow_nan=False),
        ),
        min_size=3,
        max_size=20,
    )
)
def test_pairwise_correlations_engine_exact(spark, rows):
    _run_query_vs_oracle(spark, "lineitem_correlations", {"lineitem": _lineitem_table(rows)})


# ---------------------------------------------------------- documents family


def _with_forced_dup(token_lists):
    """Guarantee at least one exact-duplicate pair so the minhash banding
    yields candidates (otherwise many examples test only emptiness)."""
    return list(token_lists) + [list(token_lists[0])]


@settings(**_SETTINGS)
@given(_texts)
def test_unigram_lm_engine_exact(spark, token_lists):
    _run_query_vs_oracle(
        spark, "unigram_quality_docs", {"documents": _docs_table(token_lists)}
    )


@settings(**_SETTINGS)
@given(_texts)
def test_bigram_lm_engine_exact(spark, token_lists):
    _run_query_vs_oracle(spark, "bigram_lm_docs", {"documents": _docs_table(token_lists)})


@settings(**_SETTINGS)
@given(_texts)
def test_bm25_engine_exact(spark, token_lists):
    # force one doc to contain every query term so the ranking is non-empty
    _run_query_vs_oracle(
        spark, "bm25_search", {"documents": _docs_table([[0, 1, 2]] + token_lists)}
    )


@settings(**_SETTINGS)
@given(_texts)
def test_hybrid_rrf_engine_exact(spark, token_lists):
    _run_query_vs_oracle(
        spark, "hybrid_search_rrf", {"documents": _docs_table([[0, 1, 2]] + token_lists)}
    )


@settings(**_SETTINGS)
@given(_texts)
def test_ngram_jaccard_engine_exact(spark, token_lists):
    _run_query_vs_oracle(
        spark,
        "dedup_ngram_jaccard",
        {"documents": _docs_table(_with_forced_dup(token_lists))},
    )


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(_texts)
def test_minhash_calibration_engine_exact(spark, token_lists):
    _run_query_vs_oracle(
        spark,
        "minhash_calibration_audit",
        {"documents": _docs_table(_with_forced_dup(token_lists))},
    )
