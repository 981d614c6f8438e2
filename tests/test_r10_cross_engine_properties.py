"""r10 rounding-divergence sweep: property-based cross-engine exactness for
the members the r9 verdict queued — gini (rational final), survival
(hterm d/n_risk half-grid ties + cum_hazard decimal-sum finals),
vocab-coverage shares (int/int), the round(double, 9) magnitude sites
(next-entropy covered in the r9 file; token_entropy here) — plus the
same-mechanism finals fixed alongside (behavior entropy, A/B rates,
Theil-Sen, OLS trend) and a mechanism-level test of the shared
sign-symmetric `grid_round` itself (including proof-of-teeth: engine
round() DOES diverge on the adversarial inputs the grid survives).
"""

from __future__ import annotations

import datetime as dt
import math
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
    base = dt.datetime(2024, 1, 1)
    return [
        (i, base + dt.timedelta(hours=7 * i), "g", i % 3, float(v))
        for i, v in enumerate(series)
    ]


def _spark_events(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, event_type string, user_id long, value double",
    )


def _duck_events(rows):
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
    return con


# ---------------------------------------------------------------- mechanism

# adversarial doubles: exact binary half-grid ties (negative and positive),
# the hypothesis-found shortest-decimal pseudo-tie, the TWAP-class magnitude
# case, on-grid values, zero, and huge values where x*1e6 > 2^53
_ADVERSARIAL = [
    3 / 1024,  # exact 1e-9 half-grid tie (d odd / 2^10)
    -3 / 1024,
    5 / 1024,
    -5 / 1024,
    16666.3333215,  # shortest-decimal pseudo-tie (winsorized class)
    -16666.3333215,
    1261904762.4095833,  # magnitude: DuckDB round() loses the last digit
    99997.999929 / 6,
    0.0,
    -0.0,
    1.0,
    -1.0,
    123.456789,
    1e16,
    -1e16,
    5e-7,
    -5e-7,
]


def test_grid_round_mechanism_engine_exact(spark):
    """grid_round (Spark) == the _gq SQL twin (DuckDB) on adversarial
    inputs at scales 0/2/4/6/9 — AND engine round() provably diverges on
    at least one of them (the test has teeth), AND negative exact ties
    round away from zero (the r10 sign-symmetric semantics)."""
    import duckdb

    from __spark_entry__ import _gq
    from smart_data_lake_spark.functions.analytics import grid_round
    from pyspark.sql import functions as F

    import pandas as pd

    con = duckdb.connect()
    # values go in as BINARY doubles via Arrow, NOT as SQL literals:
    # DuckDB parses decimal-point literals through DECIMAL, which
    # double-rounds past 2^53 — a parse artifact the real oracles (which
    # compute from table data) never see
    con.register(
        "adv", pd.DataFrame({"i": range(len(_ADVERSARIAL)), "x": _ADVERSARIAL})
    )
    sdf = spark.createDataFrame(
        [(i, x) for i, x in enumerate(_ADVERSARIAL)], "i long, x double"
    )
    for d in (0, 2, 4, 6, 9):
        got = [
            r[0]
            for r in sdf.orderBy("i").select(grid_round(F.col("x"), d)).collect()
        ]
        want = [
            r[0]
            for r in con.sql(f"select {_gq('x', d)} from adv order by i").fetchall()
        ]
        assert got == want, (d, got, want)
    # teeth: Spark round() and DuckDB round() DO diverge on the
    # pseudo-tie/magnitude members, so grid agreement is not vacuous
    diverged = 0
    for x in (16666.3333215, 1261904762.4095833):
        s = spark.sql(f"select round(cast({x!r} as double), 9)").collect()[0][0]
        dd = con.sql(f"select round({x!r}::double, 9)").fetchone()[0]
        if s != dd:
            diverged += 1
    assert diverged >= 1
    # sign symmetry: ties away from zero (matches both engines' native
    # round() on exact-representable ties)
    got = sdf.where(F.col("x") == -3 / 1024).select(
        grid_round(F.col("x"), 9)
    ).collect()[0][0]
    assert got == -0.002929688


# ---------------------------------------------------------------- gini

_spends = st.lists(
    st.floats(min_value=0, max_value=1e6, allow_nan=False, allow_infinity=False),
    min_size=1,
    max_size=25,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(_spends)
def test_gini_engine_exact(spark, spends):
    """gini_by_group vs the graded oracle, on randomized order totals over
    one nation: the final G is RATIONAL (exact decimal sufficient
    statistics) — the half-grid class the r10 sweep moved to grid_round."""
    import duckdb
    import pandas as pd

    import __spark_entry__ as entry
    from pyspark.sql import functions as F

    from smart_data_lake_spark.functions.profiling import gini_by_group

    n_cust = len(spends) + 2  # two zero-spend customers exercise the
    # no-orders branch (coalesce to 0 mass)
    cust_rows = [(i, 0) for i in range(n_cust)]
    order_rows = [(i, i, float(v)) for i, v in enumerate(spends)]
    nation_rows = [(0, "A")]

    cust = spark.createDataFrame(cust_rows, "c_custkey long, c_nationkey long")
    orders = spark.createDataFrame(
        order_rows, "o_orderkey long, o_custkey long, o_totalprice double"
    )
    nation = spark.createDataFrame(nation_rows, "n_nationkey long, n_name string")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("spend")
    )
    base = (
        cust.join(spend, cust.c_custkey == spend.o_custkey, "left")
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .select(
            "n_name",
            "c_custkey",
            F.coalesce(F.col("spend"), F.lit(0).cast("decimal(18,2)")).alias("spend"),
        )
    )
    got = gini_by_group(base, "n_name", "c_custkey", "spend").collect()

    con = duckdb.connect()
    con.register("customer", pd.DataFrame(cust_rows, columns=["c_custkey", "c_nationkey"]))
    con.register(
        "orders", pd.DataFrame(order_rows, columns=["o_orderkey", "o_custkey", "o_totalprice"])
    )
    con.register("nation", pd.DataFrame(nation_rows, columns=["n_nationkey", "n_name"]))
    want = con.sql(entry.oracle_sql()["gini_customer_spend_by_nation"]).fetchall()
    assert len(got) == len(want) == 1
    assert got[0]["n_keys"] == want[0][1]
    assert got[0]["gini"] == want[0][2]


# ---------------------------------------------------------------- survival

_journeys = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),  # user
        st.integers(min_value=0, max_value=20),  # signup day offset
        st.integers(min_value=-1, max_value=25),  # purchase day offset (-1 = never)
    ),
    min_size=1,
    max_size=15,
)


def _survival_rows(journeys):
    base = dt.datetime(2024, 1, 1)
    rows, eid = [], 0
    for user, sd, pd_ in journeys:
        rows.append((eid, base + dt.timedelta(days=sd), "signup", user, 1.0))
        eid += 1
        if pd_ >= 0:
            rows.append((eid, base + dt.timedelta(days=pd_), "purchase", user, 1.0))
            eid += 1
    return rows


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(_journeys)
def test_survival_engine_exact(spark, journeys):
    import __spark_entry__ as entry

    from smart_data_lake_spark.functions.analytics import survival_hazard_curve

    rows = _survival_rows(journeys)
    got = survival_hazard_curve(_spark_events(spark, rows)).collect()
    con = _duck_events(rows)
    want = con.sql(entry.oracle_sql()["survival_conversion_curve"]).fetchall()
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert (
            g["days_since_signup"],
            g["n_at_risk"],
            g["n_converted"],
            g["n_censored"],
        ) == (w[0], w[1], w[2], w[3])
        assert g["cum_hazard"] == w[4], (g, w)
        assert g["km_survival"] == w[5], (g, w)


def test_survival_hterm_exact_tie_1024(spark):
    """The falsifiable case the sweep was built for: n_risk = 1024 with an
    ODD conversion count makes hterm = d/1024 land EXACTLY on the 1e-9
    half-grid (d·5⁹/2 is a half-integer). Both engines must agree through
    the grid form — and the quantized value is the away-from-zero one."""
    import __spark_entry__ as entry

    from smart_data_lake_spark.functions.analytics import survival_hazard_curve

    base = dt.datetime(2024, 1, 1)
    rows, eid = [], 0
    for u in range(1024):
        rows.append((eid, base, "signup", u, 1.0))
        eid += 1
    for u in range(3):  # d = 3 on day 1, n_risk = 1024
        rows.append((eid, base + dt.timedelta(days=1), "purchase", u, 1.0))
        eid += 1
    got = survival_hazard_curve(_spark_events(spark, rows)).collect()
    con = _duck_events(rows)
    want = con.sql(entry.oracle_sql()["survival_conversion_curve"]).fetchall()
    assert [tuple(r) for r in got] == [tuple(w) for w in want]
    day1 = [r for r in got if r["days_since_signup"] == 1][0]
    # hterm = grid_round(3/1024, 9) rounds the exact ...6875 tie UP (away
    # from zero) to 0.002929688; the 1e-6 final lands on 0.00293
    assert math.floor(3 / 1024 * 1e9 + 0.5) / 1e9 == 0.002929688
    assert abs(day1["cum_hazard"] - 0.00293) < 1e-12


# ---------------------------------------------------------------- vocab

_texts = st.lists(
    st.text(alphabet="ab c", min_size=0, max_size=30),
    min_size=1,
    max_size=12,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(_texts)
def test_vocab_coverage_engine_exact(spark, texts):
    """vocab-coverage shares are RAW int/int double divisions (no rounding
    at all) — the same IEEE divide in both engines, so they must agree
    bit-for-bit. This documents the sweep's 'survived' verdict for the
    queued member: no quantization needed because nothing rounds."""
    import duckdb
    import pandas as pd

    import __spark_entry__ as entry

    from smart_data_lake_spark.functions.search import vocab_coverage_curve

    rows = [(i, "src", t) for i, t in enumerate(texts)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = vocab_coverage_curve(docs).collect()
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "source", "text"]))
    want = con.sql(entry.oracle_sql()["vocab_coverage_by_source"]).fetchall()
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert tuple(g) == tuple(w), (g, w)


# ------------------------------------------------- same-mechanism finals


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(_vals)
def test_behavior_entropy_engine_exact(spark, series):
    import __spark_entry__ as entry

    from smart_data_lake_spark.functions.analytics import user_behavior_entropy

    rows = [
        (i, dt.datetime(2024, 1, 1) + dt.timedelta(hours=i), f"t{i % 4}", i % 3, v)
        for i, v in enumerate(series)
    ]
    got = user_behavior_entropy(_spark_events(spark, rows)).orderBy("user_id").collect()
    con = _duck_events(rows)
    want = con.sql(entry.oracle_sql()["user_behavior_entropy_events"]).fetchall()
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert tuple(g) == tuple(w), (g, w)


_conv = st.lists(st.booleans(), min_size=2, max_size=40)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(_conv)
def test_ab_test_engine_exact(spark, convs):
    import __spark_entry__ as entry

    from smart_data_lake_spark.functions.analytics import two_proportion_ab_test

    base = dt.datetime(2024, 1, 1)
    rows, eid = [], 0
    for u, conv in enumerate(convs):
        rows.append((eid, base, "visit", u, 1.0))
        eid += 1
        if conv:
            rows.append((eid, base, "purchase", u, 1.0))
            eid += 1
    # both variants (user_id % 2) must be populated for the 1-row output
    if len({u % 2 for u in range(len(convs))}) < 2:
        return
    got = two_proportion_ab_test(_spark_events(spark, rows)).collect()
    con = _duck_events(rows)
    want = con.sql(entry.oracle_sql()["ab_test_purchase_conversion"]).fetchall()
    assert len(got) == len(want) == 1
    assert tuple(got[0]) == tuple(want[0])


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(_vals)
def test_theil_sen_engine_exact(spark, series):
    import __spark_entry__ as entry

    from smart_data_lake_spark.functions.analytics import theil_sen_trend_by_group

    rows = _frame(series)
    got = theil_sen_trend_by_group(_spark_events(spark, rows)).collect()
    con = _duck_events(rows)
    want = con.sql(entry.oracle_sql()["theil_sen_trend_by_type"]).fetchall()
    assert len(got) == len(want)
    if got:
        assert got[0]["n_pairs"] == want[0][1]
        assert got[0]["ts_slope"] == want[0][2]


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(_vals)
def test_ols_trend_engine_exact(spark, series):
    """trend_value_by_type's full chain: grid-quantized y input before the
    decimal cast + grid-quantized rational slope/intercept finals."""
    import __spark_entry__ as entry
    from pyspark.sql import functions as F

    from smart_data_lake_spark.functions.analytics import grid_round, grouped_linear_trend

    rows = _frame(series)
    ev = _spark_events(spark, rows)
    x = F.col("ts").cast("double") - F.lit(1704067200.0)
    out = grouped_linear_trend(ev, ["event_type"], x, F.col("value"))
    got = (
        out.select(
            "event_type",
            "n",
            grid_round(F.col("slope"), 6).alias("slope"),
            grid_round(F.col("intercept"), 6).alias("intercept"),
        )
        .orderBy("event_type")
        .collect()
    )
    con = _duck_events(rows)
    want = con.sql(entry.oracle_sql()["trend_value_by_type"]).fetchall()
    assert len(got) == len(want) == 1
    assert tuple(got[0]) == tuple(want[0])


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(_texts)
def test_token_entropy_engine_exact(spark, texts):
    """token_entropy after the r10 rework: quantized-decimal term sums
    (order-independent) and grid finals — engine-exact on random docs."""
    import duckdb
    import pandas as pd

    import __spark_entry__ as entry

    from smart_data_lake_spark.functions.quality import token_entropy

    rows = [(i, "src", t) for i, t in enumerate(texts)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = token_entropy(docs).orderBy("doc_id").collect()
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "source", "text"]))
    want = con.sql(entry.oracle_sql()["token_entropy_docs"]).fetchall()
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert tuple(g) == tuple(w), (g, w)
