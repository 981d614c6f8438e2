"""Driver contract for the spark-graft builder (PySpark target).

Each `queries()` entry is an operator from SURVEY.md §2 (or an LLM-data-
pipeline operator) expressed Spark-first; `oracle_sql()` carries the exact
DuckDB-ANSI equivalent. Numeric discipline for cross-engine hash parity:

* money sums go through CAST(x AS DECIMAL(18,2)) before SUM (exact, order-
  independent), final CAST to DOUBLE;
* integer-valued doubles (quantities) sum exactly in double — left as-is;
* ratios/cosines are single IEEE-deterministic divisions, ROUND(..., 6) both
  sides;
* every computed column is aliased identically in both engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from smart_data_lake_spark.functions.numeric import (
    dec_double,
    grid_round,
    grid_round_sql,
)
from smart_data_lake_spark.session import ensure_nanos_shim

SF_SMOKE = "/root/testdata/sf0.001"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # The events.parquet ts physical type has varied across testdata
        # generations (TIMESTAMP(NANOS) → read as long via the legacy shim;
        # TIMESTAMP(MICROS) → TIMESTAMP_NTZ under inferTimestampNTZ).
        # Normalize every layout to an epoch-anchored TIMESTAMP (instant =
        # the naive value read as UTC, exactly DuckDB's epoch() semantics)
        # so all downstream window/session/epoch math is tz-neutral and
        # identical across generations.
        ensure_nanos_shim(spark)
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return df.withColumn("ts", _events_ts_to_utc_instant(df.schema["ts"].dataType))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _events_ts_to_utc_instant(dtype) -> F.Column:
    """Normalize an events.ts column of any testdata generation to a
    TIMESTAMP whose instant equals the stored naive value interpreted as
    UTC (DuckDB's epoch() convention). timestampdiff from the NTZ epoch is
    tz-free, so the result is independent of the session timezone."""
    from pyspark.sql.types import LongType, TimestampNTZType, TimestampType

    if isinstance(dtype, LongType):  # TIMESTAMP(NANOS) read as long
        return F.timestamp_micros(F.expr("ts div 1000"))
    if isinstance(dtype, TimestampNTZType):  # TIMESTAMP(MICROS), no tz
        return F.timestamp_micros(
            F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
        )
    if isinstance(dtype, TimestampType):
        return F.col("ts")
    raise TypeError(f"unsupported events.ts type: {dtype}")


def _fan_out(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Rebalance a tiny scan across all cores before a per-row-expensive
    stage. Parquet splits cannot cross row groups, and the small-SF test
    tables are single-row-group files — so minhash/n-gram-fold stages would
    run on 1-2 of 32 cores no matter what maxPartitionBytes says. The
    repartition moves a few hundred KB (negligible) and restores full
    parallelism.

    CONDITIONAL (r12, guide §2.4 — no accidental exchanges): a no-op when
    the scan already carries >= defaultParallelism partitions, so at
    production scale (thousands of row-group splits) no exchange is added
    and scan parallelism is never CAPPED at defaultParallelism — the r11
    unconditional form would have inserted a pointless full-table shuffle
    into ~40 query paths there. The partition count comes from the plan's
    RDD lineage (no job: these frames are bare scans / scan+project, so
    there is no AQE shuffle stage to finalize)."""
    n = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n)


def _dec(col: str | F.Column, scale: int = 2) -> F.Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal(18,{scale})")


def _revenue() -> F.Column:
    """extendedprice * (1 - discount) in exact decimal arithmetic."""
    return _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))


_REV_SQL = "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q3 shape) on sf0.001."""
    return q3_shipping_priority(spark, SF_SMOKE)


# --------------------------------------------------------------------------
# Relational core (SURVEY §2.5 — the SparkSQL surface SDLB delegates to)
# --------------------------------------------------------------------------

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(_revenue()).cast("double").alias("sum_disc_price"),
            F.sum(_revenue() * (F.lit(1) + _dec("l_tax"))).cast("double").alias("sum_charge"),
            F.avg("l_quantity").alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = "1998-03-15"
    c = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderdate") < F.lit(cutoff))
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > F.lit(cutoff))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01")) & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .where(F.col("s_nationkey") == F.col("c_nationkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (_dec("l_discount") >= F.lit(0.05).cast("decimal(18,2)"))
            & (_dec("l_discount") <= F.lit(0.07).cast("decimal(18,2)"))
            & (F.col("l_quantity") < 24)
        )
        .agg(F.sum(_dec("l_extendedprice") * _dec("l_discount")).cast("double").alias("revenue"))
    )


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01")) & (F.col("o_orderdate") < F.lit("1996-04-01"))
    )
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS correlated subquery → left-semi join (adapted
    to the synthetic columns: late-shipped = l_shipdate > o_orderdate + 90d)."""
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01")) & (F.col("o_orderdate") < F.lit("1996-04-01"))
    )
    li = _t(spark, sf_dir, "lineitem")
    cond = (o.o_orderkey == li.l_orderkey) & (
        li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: left outer join + two-level aggregation."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") != "P")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def q16_parts_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: NOT IN → left-anti join + count distinct (bad-supplier
    proxy: negative-ish account balance)."""
    p = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#13") & (F.col("p_type") != "MEDIUM")
    )
    s_bad = _t(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 1000)
    li = _t(spark, sf_dir, "lineitem")
    good_supp_parts = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s_bad, li.l_suppkey == s_bad.s_suppkey, "left_anti")
    )
    return (
        good_supp_parts.groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
        .limit(20)
    )


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING on a grouped subquery driving a join."""
    li = _t(spark, sf_dir, "lineitem")
    big = li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("sum_qty")).where(F.col("sum_qty") > 200)
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate",
                _dec("o_totalprice").cast("double").alias("o_totalprice"), "sum_qty")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(20)
    )


def q22_global_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar AVG subquery + NOT EXISTS anti join."""
    c = _t(spark, sf_dir, "customer")
    # exact-decimal sum / count then ONE double division — bit-identical in
    # the oracle (decimal AVG semantics differ between engines)
    avg_bal = c.where(_dec("c_acctbal") > 0).agg(
        (F.sum(_dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("avg_bal")
    )
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderdate") >= F.lit("1997-06-01"))
    rich = (
        c.crossJoin(F.broadcast(avg_bal))
        .where(_dec("c_acctbal").cast("double") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
    )
    return (
        rich.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bidirectional nation-pair shipping volume by year."""
    n = _t(spark, sf_dir, "nation")
    s = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c = (
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01")) & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    pair = ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .where(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of PROMO-part volume sold into a
    region, by year (conditional agg over a 6-way join)."""
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    cust_region = (
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey")
    )
    supp_nation = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    p = _t(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01")) & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    li = _t(spark, sf_dir, "lineitem")
    vol = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(cust_region, o.o_custkey == cust_region.c_custkey)
        .join(F.broadcast(supp_nation), li.l_suppkey == supp_nation.s_suppkey)
        .select(
            F.year("o_orderdate").alias("o_year"),
            _revenue().alias("volume"),
            F.col("supp_nation"),
        )
    )
    return (
        vol.groupBy("o_year")
        .agg(
            (
                F.sum(F.when(F.col("supp_nation") == "NATION_5", F.col("volume")).otherwise(F.lit(0).cast("decimal(18,2)"))).cast("double")
                / F.sum("volume").cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and year (adapted: cost =
    p_retailprice × quantity — the synthetic schema has no partsupp)."""
    n = _t(spark, sf_dir, "nation")
    s = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    p = _t(spark, sf_dir, "part").where(F.col("p_name").contains("red"))
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    profit = _revenue() - _dec("p_retailprice") * _dec("l_quantity")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share for one month (conditional agg,
    one double division at the end for oracle parity)."""
    p = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-03-01")) & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    joined = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    promo = F.when(F.col("p_type") == "PROMO", _revenue()).otherwise(F.lit(0).cast("decimal(18,2)"))
    return joined.agg(
        (F.sum(promo).cast("double") * F.lit(100.0) / F.sum(_revenue()).cast("double")).alias(
            "promo_revenue_pct"
        )
    )


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: revenue view + scalar MAX subquery join. Decimal-exact
    revenue makes the MAX-equality join deterministic in both engines."""
    s = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01")) & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    rev = li.groupBy("l_suppkey").agg(F.sum(_revenue()).alias("total_revenue"))
    max_rev = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        rev.crossJoin(F.broadcast(max_rev))
        .where(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select(
            "s_suppkey", "s_name", F.col("total_revenue").cast("double").alias("total_revenue")
        )
        .orderBy("s_suppkey")
    )


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated AVG subquery per part → broadcast join
    (average yearly revenue lost to small orders for one brand)."""
    p = _t(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#1")
    li = _t(spark, sf_dir, "lineitem")
    branded = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    # exact decimal sum / count, ONE double division (oracle-parity AVG)
    per_part = branded.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty")
    )
    small = branded.join(F.broadcast(per_part), branded.l_partkey == F.col("pk")).where(
        F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty")
    )
    return small.agg(
        (F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0)).alias("avg_yearly")
    )


def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs join predicate over part attributes —
    Catalyst pushes the common join key and evaluates the disjunction post-join."""
    p = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 25) & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 35) & F.col("l_quantity").between(20, 30))
    )
    return j.where(cond).agg(F.sum(_revenue()).cast("double").alias("revenue"))


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated MIN-cost subquery per part + region-filtered
    supplier dimension join. This corpus has no partsupp table, so supply cost
    is derived from lineitem as MIN(l_extendedprice / l_quantity) per
    (part, supplier) — MIN over per-row IEEE divisions is order-independent,
    making the min-equality join engine-deterministic. All dimension joins
    broadcast; the only shuffle is the (part, supplier) cost aggregation."""
    p = _t(spark, sf_dir, "part").where(
        (F.col("p_size") == 15) & (F.col("p_type") == "LARGE")
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    li = _t(spark, sf_dir, "lineitem")
    cost = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("supply_cost"))
    )
    min_cost = cost.groupBy(F.col("l_partkey").alias("mc_partkey")).agg(
        F.min("supply_cost").alias("min_cost")
    )
    euro_supp = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    return (
        cost.join(
            F.broadcast(min_cost),
            (F.col("l_partkey") == F.col("mc_partkey"))
            & (F.col("supply_cost") == F.col("min_cost")),
        )
        .join(F.broadcast(euro_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_brand",
            grid_round(F.col("supply_cost"), 6).alias("supply_cost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part value for one nation's suppliers, HAVING
    against a global-total scalar subquery. Value = decimal-exact sum of
    l_extendedprice (lineitem stands in for partsupp); the threshold compare
    happens on the exact decimal totals cast once to double."""
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_7")
    li = _t(spark, sf_dir, "lineitem")
    nat_supp = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select("s_suppkey")
    value = (
        li.join(F.broadcast(nat_supp), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(_dec("l_extendedprice")).alias("value_dec"))
    )
    total = value.agg(F.sum("value_dec").alias("total_dec"))
    return (
        value.crossJoin(F.broadcast(total))
        .where(
            F.col("value_dec").cast("double")
            > F.lit(0.001) * F.col("total_dec").cast("double")
        )
        .select("l_partkey", F.col("value_dec").cast("double").alias("part_value"))
        .orderBy(F.col("part_value").desc(), "l_partkey")
    )


def q12_shipping_priority_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: orders×lineitem join with per-class conditional
    counts. No l_shipmode/commitdate in this corpus: l_returnflag is the
    shipping class and 'late' = shipped more than 60 days after the order
    date. The join shuffles both sides on orderkey — the canonical Q12 plan —
    and the CASE aggregation is map-side combined."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    o = _t(spark, sf_dir, "orders")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .where(late)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


def q20_excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested IN subqueries → semi-join chain. Suppliers
    holding an outsized share of a named part family's 1996 volume: per
    (supplier, part) decimal quantity vs 15% of the part's total, then a
    semi-join back to the supplier dimension."""
    p = _t(spark, sf_dir, "part").where(F.col("p_name").startswith("red"))
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    red = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    sp_qty = red.groupBy("l_suppkey", "l_partkey").agg(
        F.sum(_dec("l_quantity")).alias("sp_qty")
    )
    part_qty = red.groupBy(F.col("l_partkey").alias("pq_partkey")).agg(
        F.sum(_dec("l_quantity")).alias("part_qty")
    )
    excess = sp_qty.join(
        F.broadcast(part_qty), F.col("l_partkey") == F.col("pq_partkey")
    ).where(
        F.col("sp_qty").cast("double") > F.lit(0.15) * F.col("part_qty").cast("double")
    )
    s = _t(spark, sf_dir, "supplier")
    return (
        s.join(
            excess.select(F.col("l_suppkey").alias("x_suppkey")),
            s.s_suppkey == F.col("x_suppkey"),
            "left_semi",
        )
        .select("s_suppkey", "s_name", grid_round(F.col("s_acctbal"), 2).alias("s_acctbal"))
        .orderBy("s_name")
    )


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: EXISTS (another supplier contributed to the order) +
    NOT EXISTS (another supplier was ALSO late) over finished orders —
    expressed as a semi-join then an anti-join on the shared late-lineitem
    subplan ('late' = shipped >60 days after order date; the corpus has no
    commit/receipt dates). Both probes join on orderkey only, with the
    supplier-inequality in the join condition; the supplier dim broadcasts."""
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    late = (
        li.join(o.select("o_orderkey", "o_orderdate"), li.l_orderkey == F.col("o_orderkey"))
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    other = li.select(
        F.col("l_orderkey").alias("o2_orderkey"), F.col("l_suppkey").alias("o2_suppkey")
    )
    other_late = late.select(
        F.col("l_orderkey").alias("o3_orderkey"), F.col("l_suppkey").alias("o3_suppkey")
    )
    cand = late.join(
        other,
        (F.col("l_orderkey") == F.col("o2_orderkey"))
        & (F.col("l_suppkey") != F.col("o2_suppkey")),
        "left_semi",
    ).join(
        other_late,
        (F.col("l_orderkey") == F.col("o3_orderkey"))
        & (F.col("l_suppkey") != F.col("o3_suppkey")),
        "left_anti",
    )
    s = _t(spark, sf_dir, "supplier")
    return (
        cand.join(F.broadcast(s), cand.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


def asof_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join operator (functions/temporal.as_of_join): every purchase
    event attributed to the user's latest STRICTLY-prior click — the
    union-and-window formulation, one shuffle, no range-join explosion."""
    from smart_data_lake_spark.functions.temporal import as_of_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = ev.where(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    joined = as_of_join(
        purchases,
        clicks,
        on=["user_id"],
        right_cols=["event_id"],
        right_order_col="event_id",
        strict=True,
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("ts_asof").alias("click_ts"),
        F.col("event_id_asof").alias("click_event_id"),
        (F.col("ts").cast("double") - F.col("ts_asof").cast("double")).alias("gap_sec"),
    ).orderBy("event_id")


def range_clicks_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-join operator (functions/temporal.range_join): clicks within the
    hour before each purchase, via time-bucket equi-join (no nested-loop)."""
    from smart_data_lake_spark.functions.temporal import range_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = ev.where(F.col("event_type") == "click").select("user_id", "ts", "value")
    pairs = range_join(
        purchases, clicks, on=["user_id"], lower_sec=0.0, upper_sec=3600.0
    )
    return (
        pairs.groupBy("event_id", "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_clicks"),
            F.max("value_r").alias("max_click_value"),
        )
        .orderBy("event_id")
    )


def topk_customers_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(F.sum(_dec("o_totalprice")).cast("double").alias("total_spend"))
    w = Window.orderBy(F.col("total_spend").desc(), F.col("o_custkey"))
    wd = Window.orderBy(F.col("total_spend").desc())
    return (
        spend.withColumn("rnk", F.row_number().over(w))
        .withColumn("drnk", F.dense_rank().over(wd))
        .where(F.col("rnk") <= 25)
        .orderBy("rnk")
    )


def orders_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(_dec("o_totalprice")).over(w).cast("double").alias("running_total"),
    )


def pivot_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    # o_orderstatus has a fixed domain (TPC-H: F/O/P) — passing it statically
    # skips the extra distinct-scan job a dynamic pivot needs (the oracle
    # hardcodes the same three columns)
    statuses = ["F", "O", "P"]
    pivoted = o.groupBy("o_orderpriority").pivot("o_orderstatus", statuses).count()
    cols = [F.col("o_orderpriority")] + [
        F.coalesce(F.col(f"`{s}`"), F.lit(0)).alias(f"n_{s.lower()}") for s in statuses
    ]
    return pivoted.select(*cols).orderBy("o_orderpriority")


def rollup_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.sum("l_quantity").alias("sum_qty"))
        .orderBy(F.col("l_returnflag").asc_nulls_first(), F.col("l_linestatus").asc_nulls_first())
    )


# --------------------------------------------------------------------------
# SDLB operator semantics as queries (SURVEY §2.1/2.2/2.7/2.9)
# --------------------------------------------------------------------------

def dedup_latest_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DeduplicateAction core: keep newest row per PK — runs the framework's
    own `historization.keep_latest` primitive (the algorithm behind
    DeduplicateAction.scala:214-219)."""
    from smart_data_lake_spark.historization import keep_latest

    ev = _t(spark, sf_dir, "events")
    return keep_latest(
        ev, ["user_id"], [F.col("ts").desc(), F.col("event_id").desc()]
    ).select("user_id", "event_id", "ts", "event_type", "value")


def scd2_user_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HistorizeAction semantics (SCD2 valid-from/valid-to) over the events
    stream, produced by the framework's `historization.historize_event_log`
    (single-shuffle window formulation; tested equal to a full_historize
    snapshot replay in tests/test_historization.py). Technical columns per
    TechnicalTableColumn.scala:28,33."""
    from smart_data_lake_spark.historization import TS_CAPTURED, TS_DELIMITED, historize_event_log

    ev = _t(spark, sf_dir, "events")
    hist = historize_event_log(
        ev.select("user_id", "ts", "event_id", "event_type"),
        pks=["user_id"],
        state_cols=["event_type"],
        ts_col="ts",
        tiebreaker_cols=["event_id"],
    )
    # dl_ts_delimited is formatted as a fixed-width string: the engine keeps
    # HIGH_TS (9999-12-31) semantics, but pandas (the driver's comparator)
    # cannot represent year-9999 timestamps, so the graded column is a string
    return hist.select(
        "user_id",
        "event_type",
        TS_CAPTURED,
        F.date_format(F.col(TS_DELIMITED), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(TS_DELIMITED),
    )


def incremental_highwatermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrameIncrementalMode (DataFrameIncrementalMode.scala:81-98), run
    through the framework's own execution-mode class: the output DO holds a
    simulated prior run (everything up to max(ts) - 1 day); the mode reads its
    high-watermark and returns the pushdown filter applied to the input."""
    from smart_data_lake_spark.dataobjects import MockDataObject
    from smart_data_lake_spark.execution_modes import DataFrameIncrementalMode

    ev = _t(spark, sf_dir, "events")
    cutoff = ev.agg((F.max("ts") - F.expr("INTERVAL 1 DAY")).alias("_hwm"))
    prior = ev.crossJoin(F.broadcast(cutoff)).where(F.col("ts") <= F.col("_hwm")).drop("_hwm")
    in_do = MockDataObject(id="events_in")
    in_do._df = ev
    out_do = MockDataObject(id="prior_out")
    out_do._df = prior
    mode = DataFrameIncrementalMode(compare_col="ts")
    result = mode.apply(spark, in_do, out_do, [], {})
    return ev.where(result.filter).select("event_id", "user_id", "ts", "event_type", "value")


def partition_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PartitionDiffMode run through the framework's execution-mode class
    (PartitionDiffMode.scala:61-197): ship-months present in the input DO but
    missing in the output DO — the partitions an incremental run would
    process. Partition listings are driver-side metadata operations (directory
    / catalog listings) at any scale; only the listing itself is distributed."""
    from smart_data_lake_spark.dataobjects import MockDataObject
    from smart_data_lake_spark.execution_modes import PartitionDiffMode

    li = _t(spark, sf_dir, "lineitem").select(F.date_trunc("month", "l_shipdate").alias("month"))
    o = _t(spark, sf_dir, "orders").select(F.date_trunc("month", "o_orderdate").alias("month"))
    in_do = MockDataObject(id="li_months", partitions=["month"])
    in_do._df = li
    out_do = MockDataObject(id="o_months", partitions=["month"])
    out_do._df = o
    mode = PartitionDiffMode()
    result = mode.apply(spark, in_do, out_do, [], {})
    months = sorted(pv.as_dict["month"] for pv in result.input_partition_values)
    # JVM LocalRelation instead of createDataFrame (r12): parallelizing the
    # ~30-row python list spread it over defaultParallelism partitions, and
    # EACH partition paid a python-worker pickle roundtrip on every action
    # (profiled: the final noop save was 32 tasks × ~1.6s cold). A VALUES
    # literal plans as a LocalRelation — no python RDD, no tasks (A/B:
    # cold 6.3s -> 1.3s, steady 1.19s -> 0.78s, identical rows + schema).
    vals = ", ".join(f"(TIMESTAMP '{m}')" for m in months)
    return spark.sql(f"SELECT col1 AS month FROM VALUES {vals}")


def pk_violations_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PKViolatorsDataObject (custom.py:pk_violations / PKViolatorsDataObject;
    PKViolatorsDataObject.scala:56-61): registry-wide scan of table DOs with a
    primary key, reporting duplicate keys + null key components. Here the
    registry holds the events table with candidate PK (user_id, event_type)."""
    from smart_data_lake_spark.config import InstanceRegistry
    from smart_data_lake_spark.dataobjects.base import Table
    from smart_data_lake_spark.dataobjects.custom import CustomDfDataObject, PKViolatorsDataObject

    reg = InstanceRegistry()
    # CustomDfDataObject so the events read goes through the nanos-aware
    # reader (_t); the Table carries the candidate PK the violation scan uses
    events_do = CustomDfDataObject(id="events", creator=lambda s: _t(s, sf_dir, "events"))
    events_do.table = Table(name="events", primary_key=["user_id", "event_type"])
    reg.register_data_object(events_do)
    return PKViolatorsDataObject(id="pk_violations", registry=reg).get_dataframe(spark)


def data_validation_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataValidationTransformer (transformers/df_transformers.py:
    DataValidationTransformer; DataValidationTransformer.scala:41): per-row
    rules appended to an errors array; summarized to rows with violations."""
    from smart_data_lake_spark.transformers import DataValidationTransformer

    li = _t(spark, sf_dir, "lineitem")
    transformer = DataValidationTransformer(
        rules=[
            {"condition": "l_quantity > 0", "error_msg": "qty_nonpos"},
            {
                "condition": "CAST(l_discount AS DECIMAL(18,2)) <= CAST(0.08 AS DECIMAL(18,2))",
                "error_msg": "disc_gt_8pct",
            },
            {
                "condition": "CAST(l_tax AS DECIMAL(18,2)) <= CAST(0.06 AS DECIMAL(18,2))",
                "error_msg": "tax_gt_6pct",
            },
        ]
    )
    validated = transformer.transform(spark, li)
    return (
        validated.select(
            "l_orderkey",
            "l_linenumber",
            F.size("errors").alias("n_errors"),
            F.concat_ws(",", "errors").alias("errors"),
        )
        .where(F.col("n_errors") > 0)
    )


def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (functions/analytics.sessionize; gap > 1 hour) via
    lag + cumulative flag sum — the standard batch formulation of session
    windows, one shuffle for both windows."""
    from smart_data_lake_spark.functions.analytics import sessionize

    ev = _t(spark, sf_dir, "events")
    sessions = sessionize(ev, gap_seconds=3600, order_cols=["event_id"])
    return (
        sessions.groupBy("user_id")
        .agg(
            F.max("session_no").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# LLM-data-pipeline operators (documents / embeddings tables)
# --------------------------------------------------------------------------

def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full stat block via the framework's `with_text_stats` — layered
    projections evaluate the regex tokenization once per row (vs ~20× when
    composing the per-stat functions; 23.7s → ~2s at sf0.1)."""
    from smart_data_lake_spark.functions.text import with_text_stats

    from smart_data_lake_spark.functions.analytics import grid_round

    docs = _t(spark, sf_dir, "documents")
    stats = with_text_stats(docs)
    # the ratios are int/int RATIONALS — the half-grid cross-engine
    # divergence class (r10 sweep): grid_round, not engine round()
    return stats.select(
        "doc_id",
        "n_tokens",
        "n_chars_computed",
        grid_round(F.col("punct_ratio"), 6).alias("punct_ratio"),
        grid_round(F.col("stopword_ratio"), 6).alias("stopword_ratio"),
        grid_round(F.col("mean_token_len"), 6).alias("mean_token_len"),
        grid_round(F.col("quality"), 6).alias("quality"),
        "lang_pred",
        "fingerprint",
    )


def lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from smart_data_lake_spark.functions.text import with_text_stats

    # fan out (r12): same per-row text-stat block as cohens_kappa_lang_id
    docs = _fan_out(spark, _t(spark, sf_dir, "documents"))
    # with_text_stats materializes the token array once; selecting only
    # lang/lang_pred lets Catalyst prune the other stat expressions away
    return (
        with_text_stats(docs).select("lang", "lang_pred")
        .groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("lang", "lang_pred")
    )


def token_count_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from smart_data_lake_spark.functions.text import token_count

    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select("source", token_count(F.col("text")).alias("n_tokens"))
        .groupBy("source")
        .agg(F.sum("n_tokens").alias("total_tokens"), F.count(F.lit(1)).alias("n_docs"))
        .orderBy("source")
    )


def profile_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass column profiling (functions/profiling.profile_columns):
    count/nulls/distinct/min/max/mean/median for three orders columns.
    Mean uses the exact decimal-sum path (order-independent across
    engines); exact_median swaps Spark's percentile library for the
    explicit order-statistics interpolation (r11 sweep — engine
    percentile libraries interpolate through different expression
    shapes), and finals quantize through the shared grid."""
    from smart_data_lake_spark.functions.profiling import profile_columns

    orders = _t(spark, sf_dir, "orders")
    prof = profile_columns(
        orders,
        ["o_orderkey", "o_orderstatus", "o_totalprice"],
        decimal_mean_scale=6,
        exact_median=True,
    )
    return prof.select(
        "col_name",
        "n_rows",
        "n_null",
        "n_distinct",
        "min_str",
        "max_str",
        grid_round(F.col("mean"), 6).alias("mean"),
        grid_round(F.col("median"), 6).alias("median"),
    )


def events_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped z-score outlier detection (functions/profiling
    .grouped_outliers): per-event-type mean/std from EXACT decimal sums (one
    double division/sqrt at the end), broadcast back, flag |z| > 2.5. The
    flagged set is partition- and engine-independent by construction."""
    from smart_data_lake_spark.functions.profiling import grouped_outliers

    ev = _t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    out = grouped_outliers(ev, "value", ["event_type"], z_threshold=2.5)
    return out.select(
        "event_id",
        "event_type",
        "value",
        # r11 sweep: grid_round, not engine round() (sqrt-irrational z,
        # but uniform class discipline — zero engine-round sites)
        grid_round(F.col("zscore"), 6).alias("zscore"),
    ).orderBy("event_id")


def streaming_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming through the correctness gate: file-source stream
    over events, watermark + tumbling 1-hour window + per-type agg
    (streaming/operators.windowed_event_counts), drained with availableNow
    into a memory sink. Window starts are epoch seconds — engine/tz neutral.
    The oracle is the equivalent batch GROUP BY over the same files, proving
    stream-batch consistency of the windowed plan."""
    from smart_data_lake_spark.streaming.operators import (
        read_events_stream,
        run_available_now,
        windowed_event_counts,
    )

    sdf = read_events_stream(spark, sf_dir)
    out = run_available_now(windowed_event_counts(sdf))
    return out.orderBy("window_start_epoch", "event_type")


def bpe_token_count_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget accounting with the BPE-ish pre-tokenizer regex
    (functions/text.bpe_ish_token_count) next to the whitespace count — the
    per-source token budget a training-data pipeline actually plans with."""
    from smart_data_lake_spark.functions.text import bpe_ish_token_count, token_count

    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(
            "source",
            bpe_ish_token_count(F.col("text")).alias("bpe_tokens"),
            token_count(F.col("text")).alias("ws_tokens"),
        )
        .groupBy("source")
        .agg(
            F.sum("bpe_tokens").alias("total_bpe_tokens"),
            F.sum("ws_tokens").alias("total_ws_tokens"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .orderBy("source")
    )


def quality_filter_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters (functions/quality.with_repetition_stats,
    public Rae et al. 2021 §A1.1 heuristics) over a corpus with injected
    repetition: every 10th doc re-appears with its text tripled, so both
    keep/drop verdicts are exercised. Per-(source, verdict) counts plus POOLED
    repetition fractions — exact integer sums with one final division, so the
    aggregate is order-independent and bit-identical across engines."""
    from smart_data_lake_spark.functions.quality import with_repetition_stats

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    noisy = docs.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        "source",
        F.concat_ws(" ", "text", "text", "text").alias("text"),
    )
    stats = with_repetition_stats(_fan_out(spark, docs.unionByName(noisy)))
    return (
        stats.groupBy("source", "quality_keep")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            grid_round(F.sum("top_2gram_count") / F.sum("n_2grams"), 6).alias("pooled_top_2gram_frac"),
            grid_round(F.sum("dup_5gram_count") / F.sum("n_5grams"), 6).alias("pooled_dup_5gram_frac"),
        )
        .orderBy("source", "quality_keep")
    )


def benchmark_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (functions/decontaminate
    .benchmark_contamination, GPT-3 appendix-C style n-gram overlap): a
    deterministic holdout (doc_id % 29 == 0) plays the benchmark/eval
    corpus; every remaining training document is scored by the fraction of
    its distinct 5-gram shingles that also appear in the benchmark. The
    benchmark shingle set is broadcast, so the corpus is scanned exactly
    once with a map-side probe plus one groupBy(doc) shuffle — the shape
    that holds when the corpus is 100 TB and the benchmark is megabytes."""
    from smart_data_lake_spark.functions.decontaminate import benchmark_contamination

    docs = _t(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 29 == 0)
    corpus = docs.where(F.col("doc_id") % 29 != 0)
    out = benchmark_contamination(_fan_out(spark, corpus), bench, n=5, threshold=0.05)
    return out.orderBy("doc_id")


def dup_span_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-span statistics (functions/decontaminate
    .duplicated_span_stats): per document, the fraction of its distinct
    5-gram spans that occur in at least one other document — the
    span-granular exact-substring-dedup signal (RefinedWeb/C4). Two
    shuffles on the shingle key (count + join back, exchange reused) and
    one groupBy(doc); linear in corpus size, no all-pairs step."""
    from smart_data_lake_spark.functions.decontaminate import duplicated_span_stats

    docs = _t(spark, sf_dir, "documents")
    return duplicated_span_stats(_fan_out(spark, docs), n=5).orderBy("doc_id")


def importance_sample_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted importance sampling (functions/sampling
    .importance_sample, DSIR-style): each document is kept with probability
    equal to its heuristic quality score, decided by a pure hash of the
    doc_id — deterministic across runs, partitionings, and engines. The
    whole operator is a stateless per-row filter composed with the scan.
    The weight is quality x a length ramp (docs under 80 tokens keep
    proportionally less), so the keep probability genuinely varies and the
    sampler provably drops rows."""
    from smart_data_lake_spark.functions.sampling import importance_sample
    from smart_data_lake_spark.functions.text import quality_score, token_count

    docs = _t(spark, sf_dir, "documents")
    ramp = F.least(F.lit(1.0), token_count(F.col("text")) / F.lit(80))
    weighted = docs.withColumn("w", quality_score(F.col("text")) * ramp)
    kept = importance_sample(weighted, F.col("w"), key_col="doc_id")
    return kept.select(
        "doc_id", "source", grid_round(F.col("w"), 6).alias("weight")
    ).orderBy("doc_id")


def streaming_session_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming session windows through the correctness gate
    (streaming/operators.session_event_counts): file-source stream over
    events, F.session_window(gap=30min) per user, drained availableNow into
    a memory sink. The oracle is the batch gaps-and-islands SQL over the
    same rows — proving the streaming state-store session merge implements
    exactly the batch semantics (sessions break when the gap >= 30 min)."""
    from smart_data_lake_spark.streaming.operators import (
        read_events_stream,
        run_available_now,
        session_event_counts,
    )

    sdf = read_events_stream(spark, sf_dir)
    out = run_available_now(session_event_counts(sdf))
    return out.orderBy("user_id", "session_start_epoch")


def streaming_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join through the correctness gate
    (streaming/operators.interval_join_streams): two independent file-source
    streams over events (clicks / purchases), watermarked on both sides,
    inner-joined on user_id with purchase_ts in [click_ts, click_ts + 1h).
    Drained availableNow; the oracle is the identical batch interval join —
    proving the streaming join state machine emits exactly the batch result.
    Grading is count/max per purchase (payload-order independent)."""
    from smart_data_lake_spark.streaming.operators import (
        interval_join_streams,
        read_events_stream,
        run_available_now,
    )

    clicks = (
        read_events_stream(spark, sf_dir)
        .where(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user_id"),
            F.col("ts").alias("click_ts"),
            F.col("value").alias("click_value"),
        )
    )
    purchases = (
        read_events_stream(spark, sf_dir)
        .where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
        )
    )
    joined = interval_join_streams(
        clicks,
        purchases,
        condition=(
            "c_user_id = p_user_id AND purchase_ts >= click_ts "
            "AND purchase_ts < click_ts + INTERVAL 1 HOUR"
        ),
        left_ts_col="click_ts",
        right_ts_col="purchase_ts",
    )
    out = run_available_now(joined, output_mode="append")
    return (
        out.groupBy(F.col("purchase_id"), F.col("p_user_id").alias("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_clicks_before"),
            F.max("click_value").alias("max_click_value"),
        )
        .orderBy("purchase_id")
    )


def streaming_dedup_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup through the correctness gate (streaming/operators
    .dedup_within_watermark → dropDuplicatesWithinWatermark): the events
    stream unioned with a second reader of itself (every row duplicated),
    deduped on (user_id, event_type) with bounded state, drained append.
    Because which duplicate survives is arrival-order dependent, grading
    aggregates over keys: distinct users per event_type — which must equal
    the batch COUNT(DISTINCT user_id)."""
    from smart_data_lake_spark.streaming.operators import (
        dedup_within_watermark,
        read_events_stream,
        run_available_now,
    )

    s1 = read_events_stream(spark, sf_dir).select("user_id", "event_type", "ts")
    s2 = read_events_stream(spark, sf_dir).select("user_id", "event_type", "ts")
    deduped = dedup_within_watermark(s1.union(s2), ["user_id", "event_type"])
    out = run_available_now(deduped, output_mode="append")
    return (
        out.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("event_type")
    )


def streaming_upsert_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC-apply (streaming/operators.foreach_batch_upsert_latest):
    the events stream is drained availableNow through a foreachBatch sink
    that keep-latest-collapses each micro-batch and MERGEs it into a
    ParquetTableDataObject by primary key — streaming and batch dedup share
    the same keep_latest + merge code path. The graded result is the target
    table after the drain: newest event per user, identical to the batch
    window oracle."""
    import os
    import shutil

    from smart_data_lake_spark.dataobjects.table import ParquetTableDataObject
    from smart_data_lake_spark.streaming.operators import (
        foreach_batch_upsert_latest,
        read_events_stream,
    )

    # Durable path (not a tempdir): the graded result stays a lazy DataFrame
    # over the target table — no driver-side collect. Cleared per run so the
    # drain always starts from an empty target + fresh checkpoint.
    base = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "spark-warehouse", "stream_upsert_latest")
    shutil.rmtree(base, ignore_errors=True)
    target = ParquetTableDataObject(
        id="stream_upsert_target",
        path=f"{base}/table",
        table={"name": "user_latest", "primary_key": ["user_id"]},
    )
    sdf = read_events_stream(spark, sf_dir, max_files_per_trigger=1).select(
        "user_id", "event_id", "ts", "event_type", "value"
    )
    q = foreach_batch_upsert_latest(
        sdf,
        target,
        pks=["user_id"],
        order_cols=[F.col("ts").desc(), F.col("event_id").desc()],
        checkpoint_dir=f"{base}/ckpt",
    )
    q.awaitTermination()
    result = target.get_dataframe(spark).select(
        "user_id", "event_id", "event_type", "value"
    )
    return result.orderBy("user_id")


def chunk_documents_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-window chunking with overlap (functions/chunking
    .chunk_documents): 120-char windows, 30-char overlap — a zero-shuffle
    rowwise fan-out (strided `sequence` + `posexplode` + `substring`)."""
    from smart_data_lake_spark.functions.chunking import chunk_documents

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    ch = chunk_documents(docs, chunk_chars=120, overlap=30)
    return ch.select(
        "doc_id",
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        F.col("chunk_start").cast("bigint").alias("chunk_start"),
        F.col("n_chunks").cast("bigint").alias("n_chunks"),
        F.length("chunk_text").cast("bigint").alias("chunk_len"),
        F.md5("chunk_text").alias("chunk_md5"),
    ).orderBy("doc_id", "chunk_id")


def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k keyword search (functions/search.bm25_topk): per-doc term
    frequencies within the row, corpus stats via ONE scalar aggregate
    broadcast back — scan → tiny agg → projection → TakeOrderedAndProject."""
    from smart_data_lake_spark.functions.search import bm25_topk

    # fan out the single-row-group documents scan: the per-term token
    # filters are the per-row cost and otherwise run on 1-2 cores (r11 opt)
    docs = _fan_out(spark, _t(spark, sf_dir, "documents").select("doc_id", "text"))
    return bm25_topk(docs, ["merge", "window", "stream"], k=20)


def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (functions/text.redact_pii): deterministic e-mail/phone/
    IPv4 literals are injected into every 7th doc in BOTH engines, then
    redacted with the shared RE2-compatible patterns; per-doc hit counts via
    regexp_count. All JVM-side regex — no Python in the path."""
    from smart_data_lake_spark.functions.text import pii_hit_counts, redact_pii

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    injected = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com or 555-123-4567 ip 10.0.0.1"),
            ),
        ).otherwise(F.col("text")),
    )
    hits = pii_hit_counts(F.col("text"))
    return (
        injected.select(
            "doc_id",
            F.md5(redact_pii(F.col("text"))).alias("redacted_md5"),
            hits["email"].cast("bigint").alias("n_email"),
            hits["phone"].cast("bigint").alias("n_phone"),
            hits["ipv4"].cast("bigint").alias("n_ip"),
        )
        .orderBy("doc_id")
    )


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup over a corpus with injected duplicates (every 50th doc
    re-appears under a new id — deterministic in both engines)."""
    from smart_data_lake_spark.functions.dedup import exact_duplicate_groups

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    dupes = (
        docs.where(F.col("doc_id") % 50 == 0)
        .select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    )
    return exact_duplicate_groups(docs.unionByName(dupes)).orderBy("fingerprint")


def dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from smart_data_lake_spark.functions.dedup import lsh_candidate_pairs, minhash_signatures, shingles

    docs = _t(spark, sf_dir, "documents")
    # the banding self-join reuses the signature subplan; Spark's
    # ReusedExchange handles that without an explicit persist (measured
    # faster than caching here)
    sh = shingles(_fan_out(spark, docs))
    sig = minhash_signatures(sh)
    return lsh_candidate_pairs(sig).orderBy("doc_a", "doc_b")


def neardup_clusters_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clustering (functions/dedup.neardup_clusters): MinHash-LSH
    candidate pairs → connected components (min-label propagation to
    fixpoint) → per-cluster canonical pick. The oracle computes the same
    fixpoint via a recursive reachability CTE."""
    from smart_data_lake_spark.functions.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        neardup_clusters,
        shingles,
    )

    docs = _t(spark, sf_dir, "documents")
    pairs = lsh_candidate_pairs(minhash_signatures(shingles(_fan_out(spark, docs))))
    return neardup_clusters(docs, pairs).orderBy("cluster_id")


def stratified_sample_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-mod stratified sampling
    (functions/sampling.stratified_sample): reproducible per-source rates,
    independent of partitioning/engine — summarized per source."""
    from smart_data_lake_spark.functions.sampling import stratified_sample

    docs = _t(spark, sf_dir, "documents")
    rates = {"src0": 1.0, "src1": 0.5, "src2": 0.25, "src3": 0.1}
    sampled = stratified_sample(docs, "doc_id", "source", rates, default_rate=0.05)
    return (
        sampled.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy("source")
    )


def pack_sequences_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing (functions/sampling.pack_sequences): documents
    fill 20k-char shards per source; output = per-shard manifest."""
    from smart_data_lake_spark.functions.sampling import pack_sequences

    docs = _t(spark, sf_dir, "documents")
    packed = pack_sequences(docs, "doc_id", "n_chars", budget=20000, strata_col="source")
    return (
        packed.groupBy("source", "shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("shard_chars"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("source", "shard_id")
    )


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from smart_data_lake_spark.functions.dedup import lsh_candidate_pairs, minhash_signatures, ngram_jaccard, shingles
    from smart_data_lake_spark.session import lineage_pin

    docs = _t(spark, sf_dir, "documents")
    # the shingle set feeds five subplans (minhash, per-doc sizes, both
    # intersection sides — and the minhash side twice through the banding
    # self-join); pinned (r11, reverses the r9 "recompute + ReusedExchange"
    # A/B, which was measured against the GC-starved block manager fixed in
    # session.py this round). The static plan drops 12 document scans /
    # 30 Exchanges to 1 scan / 11 Exchanges; measured A/B with healthy
    # storage: ~3s pinned vs ~6-9s (23-30s first run) recomputed.
    sh = lineage_pin(shingles(_fan_out(spark, docs)))
    pairs = lsh_candidate_pairs(minhash_signatures(sh))
    return ngram_jaccard(sh, pairs).orderBy("doc_a", "doc_b")


def simhash_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from smart_data_lake_spark.functions.dedup import simhash

    return simhash(_fan_out(spark, _t(spark, sf_dir, "documents"))).orderBy("doc_id")


def ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from smart_data_lake_spark.functions.similarity import brute_force_topk

    emb = _fan_out(spark, _t(spark, sf_dir, "embeddings"))
    queries = emb.where(F.col("vec_id") < 10).select(F.col("vec_id").alias("query_id"), "embedding")
    return brute_force_topk(emb, queries, k=5).orderBy("query_id", "rank")


def embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded-LSH near-dup: candidate pairs from hyperplane-sign bucket joins
    (never all-pairs — no nested-loop join in the plan), exact cosine verify
    on candidates only. The oracle reproduces the buckets bit-exactly by
    inlining the same plane literals."""
    from smart_data_lake_spark.functions.dedup import embedding_neardup_lsh

    from smart_data_lake_spark.session import lineage_pin

    emb = _fan_out(spark, _t(spark, sf_dir, "embeddings"))
    # synthetic embeddings top out near cos 0.5 — 0.4 plays the role a ~0.95
    # threshold would on a real near-dup corpus
    # pin before the declared ordering: the final orderBy's range-bounds
    # sampling pass otherwise re-executes the whole verify segment (broadcast
    # join-back + Arrow dot), which sits above the last real shuffle
    # (r11 opt, guide §2.4: A/B 4.1-4.4s -> 2.4-2.9s at sf0.1)
    return lineage_pin(
        embedding_neardup_lsh(
            emb, threshold=0.4, bands=_ND_BANDS, planes_per_band=_ND_PPB
        )
    ).orderBy("id_a", "id_b")


def embedding_neardup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs exact near-dup — the small-N VERIFIER for the LSH variant
    (O(N²): input capped at a fixed 500 vectors regardless of SF, the role
    this operator plays in production recall audits). The BNLJ in this plan
    is N/A-as-designed — constant 125k-pair work at any corpus scale, and
    the exhaustive shape is the point: it is the ground truth the LSH/IVF
    recall audits measure against (README 'Standing plan exceptions')."""
    from smart_data_lake_spark.functions.dedup import embedding_neardup_pairs
    from smart_data_lake_spark.session import lineage_pin

    emb = _fan_out(spark, _t(spark, sf_dir, "embeddings").where(F.col("vec_id") < 500))
    # pin before the declared ordering: with no shuffle between the scan and
    # the final sort (the BNLJ is broadcast), the orderBy's range-bounds
    # sampling pass re-executed the whole 125k-pair Arrow-dot verify
    # (r11 opt, guide §2.4: A/B 4.9-7.7s -> 2.8-3.0s median at sf0.1)
    return lineage_pin(embedding_neardup_pairs(emb, threshold=0.4)).orderBy(
        "id_a", "id_b"
    )


def multimodal_image_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing end-to-end: documents' text bytes as opaque binary
    payloads → Arrow mapInPandas decode (stubbed codec, real batch/schema/
    partition plumbing) → typed metadata. Oracle reproduces the stub's
    length-derived dimensions via octet_length."""
    from smart_data_lake_spark.functions.multimodal import extract_image_features

    docs = _t(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    binf = docs.select(
        F.col("doc_id").cast("string").alias("path"),
        F.length(payload).cast("long").alias("length"),
        payload.alias("content"),
    )
    feats = extract_image_features(binf)
    return feats.select(
        "path",
        "n_bytes",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.channels").alias("channels"),
        F.col("meta.format").alias("format"),
    ).orderBy(F.col("path").cast("long"))


# IVF coarse-quantizer index, pre-trained OFFLINE (deterministic Lloyd's
# k-means on the first 256 sf0.01 vectors — the standard IVF workflow: the
# index ships as constants, broadcast with the plan; see
# functions/similarity.kmeans_train)
_IVF_CENTROIDS = [[0.033365409105533254, 0.02424949547275901, 0.02253010893387168, -0.09148233378719953, -0.0160980551607079, -0.009536247549544054, 0.003493411729491695, 0.028005279893814412, 0.058221628785422246, -0.02889422492848502, -0.060880814023591856, 0.004100508229048164, -0.038725555408746004, -0.025875190203940426, -0.0021637147292494774, -0.03494904459350639, 0.01222181328813787, -0.000822526557991902, 0.04754472787802418, 0.030716588755172712, -0.05904086334285913, -0.002711198128828848, 0.002093337545240367, 0.009646190528723377, -0.019953180828856096, 0.0951923472047956, 0.049905018536029036, -0.010747108470510554, -0.0012479251492078657, 0.07189501698680774, -0.05159549330602641, 0.0740203875402922, 0.019482361307988565, -0.053303625262169925, 0.03737662866047618, -0.03919832406703521, 0.026408455093149787, -0.008149002782172628, -0.0033558973594120254, -0.00281825700464348, 0.01215413975080958, 0.011990141063169748, 0.014085919656618326, -0.048047372329704185, -0.011577111356288057, -0.006514752939067505, 0.055245224455440486, -0.04028828634828743, 0.0350523184708975, -0.0565950500226959, -0.03838544138017352, 0.01786063425027317, -0.01745164822097178, -0.032570235396700876, -6.098840040741144e-05, 0.02626066642847878, 0.013045690384589963, 0.02738235945192476, -0.06682067240277927, -0.019131442911371036, -0.042518387686599185, 0.056339179476102196, 0.02620863445379116, -0.012837971871097883], [-0.030056860264656798, -0.007117978155812514, -0.017051519079749205, 0.0381703754454585, 0.033023017757971375, 0.024841133571629013, -0.07596350092873243, -0.0032697050815581213, 0.006793625873147643, 0.010427212517242879, -0.020469188407462622, 0.024742523607398783, 0.0613132961194164, -0.1029992563999258, 0.0820233273386423, -0.002759353823161551, 0.012689017133587705, 0.041026538003019856, 0.046781626430207064, -0.03571557569583612, 0.031729958818427155, 0.010695423500562486, -0.013412483011571956, -0.040470907165269764, 0.036824243708646724, 0.04036150349669957, -0.030523995137108222, -0.010415936354547739, -0.01616835986663188, 0.05879137076304427, -0.09485465387946793, -0.025479158153757453, 0.030085235135629773, 0.04782417070652757, -0.011972586150347655, -0.0014200847196791852, -0.0045037798783076665, -0.0024463399479697856, 0.019938322665568973, -0.07881599473434367, -0.0015120457309032126, -0.05480704511449273, 0.055872952548920045, -0.010333152980560303, 0.021533457479173585, 0.007786069928053101, -0.0552093640435487, 0.00759313694184779, -0.04451265869595643, -0.09907686096682612, -0.008820564702286251, -0.03125346478606973, -0.003489370304253368, 0.02719768527562597, 0.013301130176322269, 0.04353223622144599, 0.027193449296256795, 0.02141037367151252, -0.008755639461534364, 0.012931552649076496, -0.02887205859380109, 0.007469036383554339, -0.0474355101843165, 0.0131289218386103], [0.02172735370131153, 0.025709839311964584, -0.01790530600754375, 0.03609922893034915, 0.019131586012063606, 0.0040463869121264325, -0.0313654110033178, -0.0581561743183005, -0.05264907287941738, -0.08109228131290751, -0.024958185068416325, -0.04259760323629686, -0.0460206164262314, 0.053496952704859504, -0.0010404182231110153, 0.01940783392637968, -0.020179489616897296, 0.06732070375459664, -0.07356168487758348, -0.017593248662623493, -0.008096338644849531, 0.036605446288983025, 0.041091189994900065, 0.023192915218797596, -0.025169192615783577, -0.04722095433989483, -0.018880399974119482, -0.0023421714237580695, 0.026021807204057095, 0.012051234148781408, -0.04344934645588651, -0.04840890524175131, -0.02072770275867008, -0.05278792356451353, 0.017170490257822992, 0.053066725080663506, 0.016586228302030853, -0.002539267119683438, -0.004625709145329893, 0.03352302315805432, 0.0044591204743042135, -0.032909144005371316, 0.021048722936856477, -0.01890104437056421, 0.004085800752418987, 0.008947823196649551, -0.03980670091131645, 0.006060541706216155, 0.09622502705138741, 0.05682524891965317, 0.04565964278652135, -0.0636760253797878, 0.039205892575961174, -0.05522638497958807, 0.015245757023380562, 0.031484945874774094, 0.053379316786021896, -0.020634127844294362, 0.04044477462682125, 0.07365784940846039, 0.013081599718354868, -0.021409377145270508, 0.021798923555197136, -0.003451886318736907], [-0.06163721990723831, 0.011498396789344648, -0.0053253433456680235, -0.032372837575773396, -0.0002666743866239603, 0.029089359948650386, 0.059597042323543854, 0.0003873455093409388, -0.06330400279078346, -0.01771650683039274, -0.004194232539679759, 0.01637674077676657, -0.012630976318644408, 0.06803830211403039, -0.02970199066047103, -0.04089302971409873, -0.020100768643598527, -0.07108334604149255, 0.04371342944721572, -0.012919205133444987, 0.011732003460518824, -0.04744880485276763, -0.02334665665582109, -0.011083851353480266, 0.006244404162339962, 0.017964520669267632, 0.032213833676322766, -0.04031693783755868, -0.05183633006153963, -0.04763062701870998, 0.0301311211182903, -0.010573158792864818, 0.07692846571071407, -0.01236174691719218, 0.03198835582066423, -0.028649677301589876, -0.015727610345213458, 0.006741550487976593, 0.005814878332715195, -0.0395709342824725, -0.02783119691034349, -0.012910042955086399, -0.06962314244642934, -0.025694740327218406, 0.008899586991621898, 0.021763077835576274, -0.04879750398238404, -0.026575104612558603, 0.025808040333243135, -0.0445250155738531, 0.0075277039685692545, -0.01602768290262574, 0.0211149850466217, -0.02428538266282815, -0.017998055483286198, -0.04949091106521873, 0.006156594826815984, -0.015494315073085137, 0.014276425761636347, -0.02001287575620107, 0.05403329269626202, 0.022510261250994146, -0.021381209990254436, -0.04516471070028507], [0.003746440972794186, 0.0011514941950074651, 0.03545179321240126, -0.03027028569274328, -0.034067640927704895, -0.09148931507529183, 0.012366722253235903, 0.03362490736815909, 0.00568376297517468, 0.09052157842300156, -0.019834046410820025, -0.07892991495530376, 0.025900521569631317, -0.04270326386375183, 0.029102127194743265, -0.012234174307774414, 0.08150061245594936, 0.037554436617276886, 0.013535393655977467, 0.05102753288916905, 0.0027801263019103894, 0.06500624325549738, -0.019417295412329786, 0.009136039763689041, -0.03699596082482127, 0.04878418429077349, 0.02274751055731692, -0.022369940218843774, 0.04087975885803727, -0.045977704343385994, 0.059165075146169824, -0.000849404001862488, 0.01075067836791277, 0.03173565700523217, 0.04330657354810021, -0.08568092207001014, 0.02690088731998747, -0.02481735912574963, -0.0647426419134056, 0.06319149837575176, -0.00824788862585344, 0.0020984481512145562, -0.06652388374575159, 0.0006784161510453982, 0.009684091269842942, -0.008824100717902184, -0.05866129170648161, 0.0736486475322057, -0.026965822527100416, -0.0018525295044210825, -0.025476146150719036, 0.028657598907805303, -0.018802901687608523, 0.018210450492915697, 0.050816111065531994, -0.013129708462987433, 0.030264006250283935, -0.06269042500273579, 0.022712261924012142, -0.0022518724859268827, -0.020397266415371137, -0.029183629746760496, -0.00793034096502445, -0.04710918334736065], [-0.015027591539546848, -0.033130053477361796, 0.06058177697414067, 0.03022786122164689, 0.06066876974655315, 0.014999576969421469, -0.062077464116737244, 0.05032842585933395, 0.02773750766646117, -0.025243169834720903, 0.03678059966769069, -0.005126379091234412, 0.017889310617465525, 0.02399265814565297, -0.011189280613325536, 0.0259773142170161, 0.017383985959349958, -0.05408688070310745, -0.02704069287283346, 0.010727882796345511, 0.012356440094299615, 0.0028857268393039704, 0.021891579680959693, 0.00021351957402657718, -0.00777886513969861, 0.026533985417336224, -0.039896435651462524, 0.013469374011037871, 0.010178141214419156, -0.008326568195479922, 0.02194910647231154, -0.04174944523256272, -0.025546196696814148, -0.009950381866656244, 0.020820767269469798, 0.051078468782361594, 0.034978395351208745, 0.06287940463516861, 0.015334275469649583, 0.0049188534845598045, -0.05510269648257236, 0.04888989693135955, 0.00708600904326886, 0.023297381430165843, -0.06501115374267101, -0.05558751686476171, 0.025143768835550872, -0.03702111553866416, -0.013833331030036788, 0.02473171616438776, 0.06216765590070281, 0.02826720759330783, 0.00841868354473263, 0.049009096506051716, -0.03217822368023917, -0.087483884539688, 0.03257986990502104, -0.026166834146715702, 0.031227005942491816, -0.008958739449735732, 0.0008971350966021418, 0.03230091462610289, -0.02558497714344412, 0.03510294070583768], [-0.051765869289417475, -0.04033428701051675, 0.01483261029181235, -0.018601807580767748, 0.00355285093160894, 0.0571331054533777, -0.02877298159086529, -0.044876402401474905, 0.032709849703892624, 0.09944645737243049, 0.04745778822004521, 0.020151474677464542, 0.01688770714270718, 0.057721604168524634, -0.03550524960326798, 0.05274319059818106, 0.02236804991672911, 0.024275389993015456, -0.04138730011832462, -0.026696740348330316, -0.0047272564843297005, -0.03274975099381717, -0.02721141726600335, -0.06169266322189394, -0.025382806485354462, 0.010370088186498512, 0.019754441948059726, 0.05719338095856502, 0.016510386540390113, -0.04984423950971926, -0.01723257216337301, 0.003511419369126944, 0.026850822496378574, -0.05538692253107643, -0.004524073330685496, 0.047563741004149264, 0.026631740860038382, -0.01685105303220232, 0.012065365415336975, -0.01684462544782197, 0.054045978067305815, -0.05496464262935607, 0.003690938794855302, -0.010554698323283125, 0.005761383546461516, 0.018066235153716716, 0.0009226767202455769, 0.034510091494987995, -0.011828604981179951, 0.05767176193116671, -0.010840747121940641, -0.002818104126216734, 0.035262153091881535, -0.009917951353332576, 0.03409643741393024, 0.03363362038234139, -0.04880971591645742, 0.0504871284150902, -0.06461662401938263, -0.035107367389547804, 0.014446866985000431, 0.03225604898077162, -0.0005804466302780544, 0.0349016962778371], [0.04635109007358551, -0.01673423819187464, -0.04365189915353602, 0.049460201735862276, -0.02603477878129166, 0.013123916191309972, 0.019543618173691248, 0.03332400825368523, -0.007172340336679058, -0.04404047426457206, 0.0017035148021849718, 0.01084475763932322, -0.060179698327732636, -0.07159307332370769, -0.020647276305791103, -0.010918309721587733, -0.007158174567545454, 0.04028457484320935, 0.004426671403714202, -0.002099468923089179, 0.017989671628597673, -0.014129691164601933, 0.013621606200820568, 0.020273741250011055, 0.011126825841722277, -0.05510778819514213, -0.0326975037089803, 0.0741617977125288, -0.011122243288396434, 0.06114857991060214, 0.05996900390494953, 0.0040150600065262, -0.018107812255479847, 0.03634026956349386, -0.016612256369130177, -0.026714266404848207, -0.021856312957507642, -0.07171227784375801, -0.025242936932375993, -0.0004555332954182769, -0.010210691076336485, -0.01645433172234334, 0.04011587651841568, -0.01837618660956099, -0.023751318186634417, 0.04206535900999425, 0.05610022434583781, 0.0747169359573022, -0.07919124364288467, -0.023763665534330135, 0.04547235588754781, 0.019070919786551684, -0.0051343835339966145, -0.019262944185880548, -0.03674735159923633, -0.011216914013141033, -0.0061035420689167395, 0.001005503066787214, -0.05660002362547499, -0.01217428207261643, -0.023431954171621437, -0.029660370007287853, -0.005161080481202313, -0.06909472158771347]]


def ann_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k (the trained-quantizer scale path next to the
    training-free LSH variant): corpus assigned to centroid cells in one
    vectorized projection, each query probes its own cell's inverted list."""
    from smart_data_lake_spark.functions.similarity import ivf_topk

    emb = _fan_out(spark, _t(spark, sf_dir, "embeddings"))
    queries = emb.where(F.col("vec_id") < 10).select(F.col("vec_id").alias("query_id"), "embedding")
    return ivf_topk(emb, queries, _IVF_CENTROIDS, k=5).orderBy("query_id", "rank")


def ann_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k (LSH buckets) — the 100 TB scale path: corpus
    bucketed in one projection, each query scores only its bucket."""
    from smart_data_lake_spark.functions.similarity import lsh_topk

    emb = _fan_out(spark, _t(spark, sf_dir, "embeddings"))
    queries = emb.where(F.col("vec_id") < 10).select(F.col("vec_id").alias("query_id"), "embedding")
    return lsh_topk(emb, queries, k=5, n_planes=_ANN_PLANES).orderBy("query_id", "rank")


# --------------------------------------------------------------------------
# registry + oracles
# --------------------------------------------------------------------------

def json_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read JSON extraction (functions/semistructured
    .extract_json_fields; reference parses JSON on read and flattens via
    FlattenDfTransformer.scala:35): typed field projection out of the
    events.props JSON string with JVM-side get_json_object — a stateless
    per-row projection composed with the scan (zero extra shuffles), then
    one aggregation. At 100 TB the JSON parse stays inside whole-stage
    codegen; no Python touches the payload."""
    from smart_data_lake_spark.functions.semistructured import extract_json_fields

    ev = _t(spark, sf_dir, "events")
    ex = extract_json_fields(ev, "props", {"k": ("$.k", "long")})
    return (
        ex.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.sum(F.when(F.col("k").isNull(), 1).otherwise(0)).alias("n_null_k"),
        )
        .orderBy("event_type")
    )


def cube_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregation (full grouping-set power set) over lineitem — the
    relational companion of rollup_sales. Catalyst expands the cube into a
    single Expand + one hash aggregate: one shuffle for all four grouping
    sets, not four scans. The decimal casts/multiplies are projected BELOW
    the cube so Expand duplicates computed values instead of re-evaluating
    the money arithmetic once per grouping set (4× at this cube's width)."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_linestatus",
        _dec("l_quantity").alias("_qty"),
        _revenue().alias("_rev"),
    )
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.sum("_qty").cast("double").alias("sum_qty"),
            F.sum("_rev").cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "revenue",
            "n_lines",
        )
        .orderBy("returnflag", "linestatus")
    )


def ntile_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-window family over per-customer spend: ntile(10) deciles,
    percent_rank, cume_dist with a deterministic (spend DESC, custkey) order.
    The global window needs a total order — fine at dimension-table
    cardinality; at fact-table scale the decile assignment switches to
    functions/analytics.approx_quantile_buckets (Greenwald-Khanna sketch
    boundaries + stateless per-row bucket projection, no global sort)."""
    o = _t(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.sum(_dec("o_totalprice")).alias("spend_dec")
    )
    w = Window.orderBy(F.col("spend_dec").desc(), F.col("o_custkey"))
    return (
        spend.select(
            "o_custkey",
            F.col("spend_dec").cast("double").alias("spend"),
            F.ntile(10).over(w).alias("decile"),
            grid_round(F.percent_rank().over(w), 6).alias("pct_rank"),
            grid_round(F.cume_dist().over(w), 6).alias("cume_dist"),
        )
        .where(F.col("decile") == 1)
        .orderBy("o_custkey")
    )


def event_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles of event value per type via
    profiling.exact_percentiles' explicit order statistics (r11 sweep —
    engine percentile libraries interpolate through different expression
    shapes), finals on the shared grid. Exact percentiles sort within
    each group — acceptable when groups are bounded; the 100 TB path is
    approx_percentile (t-digest sketch, mergeable map-side), same call
    shape. The oracle pins the exact variant."""
    from smart_data_lake_spark.functions.profiling import exact_percentiles

    ev = _t(spark, sf_dir, "events")
    counts = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    pct = exact_percentiles(
        ev,
        "value",
        ["event_type"],
        [("_p25", 1, 4), ("_p50", 1, 2), ("_p75", 3, 4), ("_p90", 9, 10)],
    )
    return (
        counts.join(pct, "event_type", "left")
        .select(
            "event_type",
            "n",
            grid_round(F.col("_p25"), 6).alias("p25"),
            grid_round(F.col("_p50"), 6).alias("p50"),
            grid_round(F.col("_p75"), 6).alias("p75"),
            grid_round(F.col("_p90"), 6).alias("p90"),
        )
        .orderBy("event_type")
    )


def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct-count sketch next to the exact count, with the
    sketch's error certified in-query: `approx_within_5pct` asserts
    |approx - exact| <= 5% * exact (the sketch is configured at rsd=2%).
    The oracle carries the exact count (full value parity) and pins the
    certification to TRUE — so the row goes red if the sketch ever drifts
    out of tolerance. At 100 TB the exact count is the expensive side
    (distinct shuffle); the HLL is mergeable map-side with constant state —
    the operator a real pipeline would keep."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_exact"),
            F.approx_count_distinct("user_id", rsd=0.02).alias("n_approx"),
        )
        .select(
            "event_type",
            "n_exact",
            (
                F.abs(F.col("n_approx") - F.col("n_exact"))
                <= F.lit(0.05) * F.col("n_exact")
            ).alias("approx_within_5pct"),
        )
        .orderBy("event_type")
    )


def embedding_quantize_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 (0..255) min/max affine quantization of the embedding column
    with per-vector reconstruction error (functions/embeddings
    .quantize_embedding_stats) — the compression audit run before shipping
    quantized vectors to an ANN index. Pure JVM array expressions, zero
    shuffles; rounding is floor(x+0.5) and the error sum is a left-to-right
    float64 fold, both engine-portable."""
    from smart_data_lake_spark.functions.embeddings import quantize_embedding_stats

    emb = _fan_out(spark, _t(spark, sf_dir, "embeddings"))
    return (
        quantize_embedding_stats(emb)
        .select(
            "vec_id",
            "label",
            grid_round(F.col("q_scale"), 6).alias("q_scale"),
            grid_round(F.col("mean_abs_err"), 6).alias("mean_abs_err"),
        )
        .orderBy("vec_id")
    )


def label_centroid_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid distance audit (functions/embeddings
    .centroid_distances): mean vector per label via exact DECIMAL(30,12)
    per-dimension accumulation (order/partition-independent — float sums
    are not associative and must not vary across cluster runs), broadcast
    back, then a per-row zip_with fold for the L2 distance; top-5 farthest
    vectors per label = mislabel candidates. One shuffle (label,dim
    groupBy) + one tiny window per label."""
    from smart_data_lake_spark.functions.embeddings import centroid_distances

    emb = _fan_out(spark, _t(spark, sf_dir, "embeddings"))
    d = centroid_distances(emb)
    w = Window.partitionBy("label").orderBy(
        F.col("centroid_dist").desc(), F.col("vec_id")
    )
    return (
        d.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 5)
        .select("label", "rnk", "vec_id", grid_round(F.col("centroid_dist"), 6).alias("centroid_dist"))
        .orderBy("label", "rnk")
    )


def train_val_split_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contamination-safe train/val/test assignment (functions/sampling
    .hash_split): each document lands in exactly one split as a pure
    function of md5(doc_id) — re-runs, repartitioning, and other engines
    reproduce the identical assignment, so no document can leak between
    train and eval across pipeline versions. Stateless per-row projection
    + one count aggregation."""
    from smart_data_lake_spark.functions.sampling import hash_split

    docs = _t(spark, sf_dir, "documents")
    s = hash_split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    return (
        s.groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy("source", "split")
    )


def trend_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group OLS trend fit (functions/analytics.grouped_linear_trend):
    slope/intercept of event value over time from sufficient statistics —
    ONE map-side-combinable aggregation (no iteration, no driver math), with
    exact DECIMAL accumulation so the fit is independent of row order. x is
    epoch seconds offset from 2024-01-01 to keep the decimal products in
    range; final slope arithmetic is plain float64, identical per engine."""
    from smart_data_lake_spark.functions.analytics import grouped_linear_trend

    from smart_data_lake_spark.functions.analytics import grid_round

    ev = _t(spark, sf_dir, "events")
    x = F.col("ts").cast("double") - F.lit(1704067200.0)
    out = grouped_linear_trend(ev, ["event_type"], x, F.col("value"))
    # slope/intercept are RATIONAL (double divisions of exact decimal
    # sufficient statistics) — the half-grid cross-engine class (r10
    # sweep): grid_round, not engine round()
    return out.select(
        "event_type",
        "n",
        grid_round(F.col("slope"), 6).alias("slope"),
        grid_round(F.col("intercept"), 6).alias("intercept"),
    ).orderBy("event_type")


def cohort_retention_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle (functions/analytics.cohort_retention):
    users bucketed by first-activity week, distinct returning users per
    (cohort week, week offset). Two shuffles total — per-user min (combined
    map-side) and the cohort×offset distinct count."""
    from smart_data_lake_spark.functions.analytics import cohort_retention

    ev = _t(spark, sf_dir, "events")
    out = cohort_retention(ev, period_seconds=7 * 24 * 3600)
    return out.orderBy("cohort_period", "period_offset")


def funnel_signup_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered funnel view → click → purchase (functions/analytics
    .funnel_counts): one shuffle, then an in-row sorted fold over each
    user's step events (greedy earliest-advance chain ≡ iterated
    min-ts-after chain; the oracle computes the latter with per-step
    conditional joins, proving the equivalence)."""
    from smart_data_lake_spark.functions.analytics import funnel_counts

    ev = _t(spark, sf_dir, "events")
    return funnel_counts(ev, ["view", "click", "purchase"])


def orders_gaps_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Navigation-window family (lag/lead/first_value/last_value) over each
    customer's order history: days since the previous order, the next
    order's key, and the customer's first/last order price over an explicit
    unbounded frame (the default RANGE..CURRENT ROW frame makes last_value
    return the current row — the classic window gotcha, pinned here in both
    engines). One shuffle on customer; all four functions share the same
    window sort."""
    o = _t(spark, sf_dir, "orders").where(F.col("o_custkey") % 100 == 0)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.datediff("o_orderdate", F.lag("o_orderdate").over(w)).alias("gap_days"),
            F.lead("o_orderkey").over(w).alias("next_orderkey"),
            F.first(_dec("o_totalprice")).over(wf).cast("double").alias("first_price"),
            F.last(_dec("o_totalprice")).over(wf).cast("double").alias("last_price"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


def customer_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational set operators (INTERSECT / EXCEPT / UNION) as DataFrame
    ops: 1996-vs-1997 buyer cohorts. Catalyst plans INTERSECT/EXCEPT as
    left-semi/left-anti hash joins over the distinct key sets — no sort, no
    nested loop."""
    o = _t(spark, sf_dir, "orders")

    def buyers(year: int):
        return (
            o.where(
                (F.col("o_orderdate") >= F.lit(f"{year}-01-01"))
                & (F.col("o_orderdate") < F.lit(f"{year + 1}-01-01"))
            )
            .select("o_custkey")
            .distinct()
        )

    b96, b97 = buyers(1996), buyers(1997)
    counts = [
        b96.intersect(b97).agg(F.count(F.lit(1)).alias("n_both")),
        b96.subtract(b97).agg(F.count(F.lit(1)).alias("n_only_96")),
        b97.subtract(b96).agg(F.count(F.lit(1)).alias("n_only_97")),
        b96.union(b97).distinct().agg(F.count(F.lit(1)).alias("n_union")),
    ]
    out = counts[0]
    for c in counts[1:]:
        out = out.crossJoin(c)  # 1-row × 1-row scalar combines
    return out.select(F.lit("cohorts").alias("label"), "n_both", "n_only_96", "n_only_97", "n_union")


def streaming_stateful_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary stateful streaming (streaming/operators.stateful_user_totals,
    applyInPandasWithState): running per-user (count, max) maintained in the
    executor state store across micro-batches. Deliberately NOT
    SQL-expressible (custom state machine) — graded rows-only; the
    cross-batch state accumulation semantics are pinned by
    tests/test_streaming.py. availableNow drains all input, so the final
    update per user is deterministic."""
    from smart_data_lake_spark.streaming.operators import (
        read_events_stream,
        run_available_now,
        stateful_user_totals,
    )

    sdf = read_events_stream(spark, sf_dir)
    out = run_available_now(
        stateful_user_totals(sdf), output_mode="update"
    )
    return out.orderBy("user_id")


def segment_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment-granular exact dedup (functions/dedup.exact_segment_dedup;
    ExactSubstr of Lee et al. 2022, public method): consecutive 5-token
    segments, first occurrence wins corpus-wide, per-doc duplicated-segment
    stats. One narrow posexplode + ONE segment-key shuffle + one
    groupBy(doc) — linear, no all-pairs, the only shape that distributes."""
    from smart_data_lake_spark.functions.dedup import exact_segment_dedup

    docs = _t(spark, sf_dir, "documents")
    return exact_segment_dedup(_fan_out(spark, docs)).orderBy("doc_id")


def unigram_quality_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-unigram LM quality scoring (functions/quality
    .unigram_logprob_score; CCNet idea, Wenzek et al. 2020, public method):
    MLE unigram distribution over the corpus, every document scored by mean
    token log-probability. Vocabulary built in one map-side-combined
    explode+groupBy, broadcast back (|vocab| rows regardless of corpus
    size), one groupBy(doc). Per-token logprobs round to 1e-6 before the
    exact decimal sum — engine-libm-independent, order-independent."""
    from smart_data_lake_spark.functions.quality import unigram_logprob_score

    docs = _t(spark, sf_dir, "documents")
    return unigram_logprob_score(_fan_out(spark, docs)).orderBy("doc_id")


def winnow_fingerprints_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (functions/dedup.winnow_fingerprints; MOSS
    algorithm, Schleimer et al. 2003, public method): per-doc distinct
    window-minimum k-gram hashes + cross-corpus sharing stats. Minima are
    computed IN-ROW on the grams array (slice+array_min — no doc sort, no
    Window); one fingerprint-key shuffle + one groupBy(doc) — linear,
    density ~2/(w+1) of the full gram set, never all-pairs."""
    from smart_data_lake_spark.functions.dedup import winnow_fingerprints

    docs = _t(spark, sf_dir, "documents")
    return winnow_fingerprints(_fan_out(spark, docs)).orderBy("doc_id")


def incremental_dedup_new_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental corpus admission (functions/dedup.dedup_against_corpus):
    new-batch docs (source=src0) kept only if their content hash is absent
    from the rest of the corpus AND first-of-hash within the batch. Hash
    anti-join (corpus side pruned to its hash column) + min-id semi join —
    the new-crawl-snapshot shape at 100 TB."""
    from smart_data_lake_spark.functions.dedup import dedup_against_corpus

    docs = _t(spark, sf_dir, "documents")
    batch = docs.where(F.col("source") == "src0")
    corpus = docs.where(F.col("source") != "src0")
    out = dedup_against_corpus(batch, corpus)
    return out.select(
        "doc_id", F.length("text").cast("bigint").alias("n_chars_kept")
    ).orderBy("doc_id")


def range_frame_trailing_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frame: per-user trailing-1-hour sum/count of event
    value (RANGE, not ROWS — equal-timestamp rows always share a frame, so
    the result is deterministic under any shuffle order). Frame bounds in
    integer MICROSECONDS (unix_micros ≡ DuckDB epoch_us) — sub-second
    precision with no float boundary drift; decimal sum = order-independent.
    One shuffle (the window sort). r11 sweep: the input double→DECIMAL cast
    goes through grid_round (bare casts round engine-natively). r12: the
    exact decimal sum is RENDERED as double via dec_double (string
    round-trip, correctly rounded in both engines) — the r11 DECIMAL(38,6)
    final was driver-hash-divergent (decimal outputs are the only three
    hash_match failures in CORRECTNESS_r11; every double final is green),
    and the old round(CAST(.. AS DOUBLE), 6) final was the engine-round
    class. The sum itself stays exact decimal arithmetic."""
    ev = _t(spark, sf_dir, "events").where(F.col("user_id") % 50 == 0)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3600 * 1_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        dec_double(
            F.sum(grid_round(F.col("value"), 6).cast("decimal(18,6)")).over(w)
        ).alias("trailing_1h_sum"),
        F.count(F.lit(1)).over(w).alias("trailing_1h_n"),
    ).orderBy("event_id")


def grouping_sets_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (completes the cube/rollup family): chosen
    subtotal combinations only — Catalyst compiles to ONE Expand + one hash
    aggregate (a single shuffle for all four sets), strictly cheaper than
    unioning four aggregates. GROUPING() disambiguates subtotal NULLs.
    r11 sweep: grid-quantized input cast; r12: the exact DECIMAL sum is
    rendered as double via the string round-trip (dec_double class — the
    r11 DECIMAL(38,2) final was driver-hash-divergent, see
    range_frame_trailing_value; the old ROUND(CAST(.. AS DOUBLE), 2)
    final was the engine-round class)."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("sdl_gs_orders")
    # grid_round_sql is engine-neutral SQL (abs/floor/CASE) — the same
    # builder serves the Spark SQL side here and the DuckDB oracle, so
    # the two sides cannot drift.
    gq_price = grid_round_sql("o_totalprice", 2)
    return spark.sql(
        f"""
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping(o_orderstatus) AS INT) AS g_status,
               CAST(grouping(o_orderpriority) AS INT) AS g_prio,
               COUNT(*) AS n_orders,
               CAST(CAST(SUM(CAST({gq_price} AS DECIMAL(18,2))) AS STRING) AS DOUBLE) AS total_price
        FROM sdl_gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                                (o_orderstatus, o_orderpriority), ())
        ORDER BY g_status, g_prio, o_orderstatus, o_orderpriority
        """
    )


def user_top_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped argmax without a join or window: counts (one map-side-combined
    shuffle) then max(struct(cnt, key)) — ties broken by event_type
    descending, deterministically, in both engines. The two-aggregate shape
    replaces the row_number-over-window idiom and keeps everything
    combinable at 100 TB."""
    ev = _t(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        counts.groupBy("user_id")
        .agg(F.max(F.struct(F.col("cnt"), F.col("event_type"))).alias("m"))
        .select(
            "user_id",
            F.col("m.cnt").alias("top_cnt"),
            F.col("m.event_type").alias("top_event"),
        )
        .orderBy("user_id")
    )


def mad_outliers_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust median/MAD outliers per event type (functions/profiling
    .mad_outliers): breakdown-resistant complement to the z-score query.
    Exact percentile parity with quantile_cont (same interpolation as
    event_value_percentiles); two combinable shuffles + broadcast joins."""
    from smart_data_lake_spark.functions.profiling import mad_outliers

    ev = _t(spark, sf_dir, "events")
    return mad_outliers(ev, "event_type", "value").orderBy("event_type")


def top_bigrams_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level bigram document frequency, top 20 (tie-broken by bigram
    text): the boilerplate-phrase detector. Reuses the dedup shingle
    subplan — distinct per-doc bigrams, one combinable count shuffle, TakeOrdered
    (no global sort materialization)."""
    from smart_data_lake_spark.functions.dedup import shingles

    docs = _t(spark, sf_dir, "documents")
    sh = shingles(_fan_out(spark, docs), n=2)
    return (
        sh.groupBy(F.col("shingle").alias("bigram"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy(F.desc("n_docs"), "bigram")
        .limit(20)
    )


def hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via reciprocal-rank fusion (functions/search
    .rrf_fuse; Cormack et al. 2009, public method): BM25 keyword ranking
    fused with a document-length ranking at depth 50, k=60. Rank-based, so
    incommensurable score scales combine without calibration. Fusion cost is
    a union of two top-50 lists + one combinable groupBy — negligible next
    to producing the rankings."""
    from smart_data_lake_spark.functions.search import bm25_topk, rrf_fuse

    docs = _t(spark, sf_dir, "documents")
    bm = bm25_topk(_fan_out(spark, docs), ["merge", "stream", "window"], k=50)
    w1 = Window.orderBy(F.col("score").desc(), F.col("doc_id"))
    r1 = bm.select("doc_id", F.row_number().over(w1).alias("rank"))
    w2 = Window.orderBy(F.col("n_chars").desc(), F.col("doc_id"))
    r2 = docs.select("doc_id", F.row_number().over(w2).alias("rank")).where(
        F.col("rank") <= 50
    )
    fused = rrf_fuse([r1, r2], k=60, depth=50)
    return fused.orderBy(F.desc("rrf_score"), "doc_id").limit(20)


def token_budget_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy token-budget corpus sampling (functions/sampling
    .sample_to_token_budget): docs taken in deterministic md5 order until the
    running token total hits 15k (binding at every SF). NO global sort — 1024 monotone hash
    buckets, per-bucket window cumsum + broadcast bucket offsets; the only
    global order is over the 1024-row bucket-sum table."""
    from smart_data_lake_spark.functions.sampling import sample_to_token_budget

    docs = _t(spark, sf_dir, "documents")
    return sample_to_token_budget(_fan_out(spark, docs), budget_tokens=15_000).orderBy(
        "cum_tokens"
    )


def mix_sources_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixing downsampler audit (functions/sampling.mix_sources,
    DoReMi/SlimPajama-style mixture control, public method): sources src0/
    src1/src2 resampled toward 50/30/20 token shares; binding source keeps
    rate 1.0, others hash-accept stateless per doc. One tiny per-source
    aggregate broadcast back — no global coordination."""
    from smart_data_lake_spark.functions.sampling import mix_sources

    docs = _t(spark, sf_dir, "documents")
    return mix_sources(
        docs, {"src0": 0.5, "src1": 0.3, "src2": 0.2}
    ).orderBy("source")


def user_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-journey path mining (functions/analytics.event_path_ngrams):
    most frequent event trigrams over per-user chronological streams. One
    per-user shuffle, in-row n-gram expansion, combinable count, TakeOrdered."""
    from smart_data_lake_spark.functions.analytics import event_path_ngrams

    ev = _t(spark, sf_dir, "events")
    return event_path_ngrams(ev, n=3, top_k=15)


def rolling_active_users_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / trailing-7-day active users (functions/analytics
    .rolling_active_users): COUNT(DISTINCT) over a date RANGE frame is not
    window-expressible in Spark, so the distributable shape is user-day
    dedup (one combinable shuffle) + bounded ×7 calendar fan-out + distinct
    count per day — every stage map-side-combinable, no window sort."""
    from smart_data_lake_spark.functions.analytics import rolling_active_users

    ev = _t(spark, sf_dir, "events")
    return rolling_active_users(ev, window_days=7).orderBy("day")


def normalized_doc_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-based cross-source score normalization (functions/quality
    .quantile_normalize_scores): per-source percent_rank of n_chars — the
    step that makes per-source quality scores comparable before mixing.
    Exact form sorts within each source; the documented 100 TB path swaps in
    sketch-boundary buckets (approx_quantile_buckets), same contract."""
    from smart_data_lake_spark.functions.quality import quantile_normalize_scores

    docs = _t(spark, sf_dir, "documents").where(F.col("source").isin("src0", "src1", "src2"))
    return quantile_normalize_scores(docs, "n_chars").orderBy("doc_id")


def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over user event streams
    (functions/analytics.event_transition_matrix): in-row pair extraction
    from per-user ordered arrays, combinable counts, broadcast totals."""
    from smart_data_lake_spark.functions.analytics import event_transition_matrix

    ev = _t(spark, sf_dir, "events")
    return event_transition_matrix(ev).orderBy("from_type", "to_type")


def lineitem_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlations (functions/profiling
    .pairwise_correlations): exact decimal sufficient statistics in ONE
    combinable aggregation for all pairs — engine-exact, unlike the built-in
    running-estimator corr(). The statistical-aggregate family's graded
    representative."""
    from smart_data_lake_spark.functions.profiling import pairwise_correlations

    li = _t(spark, sf_dir, "lineitem")
    return pairwise_correlations(
        li, ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    ).orderBy("col_a", "col_b")


def event_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram (functions/profiling.value_histogram): tiny
    min/max broadcast + stateless bucket projection + combinable count —
    two scans, no sort. Complements the equal-frequency quantile buckets."""
    from smart_data_lake_spark.functions.profiling import value_histogram

    ev = _t(spark, sf_dir, "events")
    return value_histogram(ev, "value", n_buckets=20).orderBy("bucket")


def top_docs_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k (the grouped complement to the global ranking
    queries): 3 longest docs per source via row_number over a per-source
    window — partitioned sort, no global order; ties broken by doc_id."""
    docs = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(F.col("n_chars").desc(), F.col("doc_id"))
    return (
        docs.select("source", "doc_id", "n_chars", F.row_number().over(w).alias("rk"))
        .where(F.col("rk") <= 3)
        .orderBy("source", "rk")
    )


def value_histogram_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped equi-width histogram (functions/profiling.value_histogram
    group_col path): per-event-type bounds broadcast back on the group key —
    each group gets its own bucket edges, still two scans and no sort."""
    from smart_data_lake_spark.functions.profiling import value_histogram

    ev = _t(spark, sf_dir, "events")
    return value_histogram(ev, "value", n_buckets=10, group_col="event_type").orderBy(
        "event_type", "bucket"
    )


def ewma_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-style EWMA per event type (functions/analytics.grouped_ewma):
    one shuffle builds the ordered value array, the α-fold is in-row and a
    strict left fold — bit-identical across IEEE-double engines."""
    from smart_data_lake_spark.functions.analytics import grouped_ewma

    ev = _t(spark, sf_dir, "events")
    return grouped_ewma(ev, ["event_type"], alpha=0.3).orderBy("event_type")


def interarrival_stats_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrival-process profile (functions/analytics.interarrival_stats):
    per-user lag window, gaps in exact integer micros so the per-type sums
    have no float-summation order sensitivity."""
    from smart_data_lake_spark.functions.analytics import interarrival_stats

    ev = _t(spark, sf_dir, "events")
    return interarrival_stats(ev).orderBy("event_type")


def tfidf_top_terms_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-card term summary (functions/search.tfidf_top_terms): most
    characteristic terms per source by summed TF-IDF; ranks computed on the
    ROUNDED score so sub-ulp ln() differences can't flip them."""
    from smart_data_lake_spark.functions.search import tfidf_top_terms

    docs = _t(spark, sf_dir, "documents")
    return tfidf_top_terms(docs, k=5).orderBy("source", "term_rank")


def token_entropy_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-distribution Shannon entropy per doc (functions/quality
    .token_entropy): the gibberish/boilerplate signal, via the combinable
    sufficient-statistics identity H = ln(T) − Σ n·ln n / T."""
    from smart_data_lake_spark.functions.quality import token_entropy

    # fan-out measured and rejected (r12 A/B: med 1.22 off vs 2.05 on)
    docs = _t(spark, sf_dir, "documents")
    return token_entropy(docs).orderBy("doc_id")


def containment_pairs_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment dedup (functions/dedup.containment_pairs):
    C(a→b) = |S(a)∩S(b)|/|S(a)| over 5-shingles — catches a short doc
    embedded in a longer one where symmetric Jaccard stays low."""
    from smart_data_lake_spark.functions.dedup import containment_pairs

    docs = _t(spark, sf_dir, "documents")
    return containment_pairs(_fan_out(spark, docs), n=5, threshold=0.5).orderBy(
        "doc_a", "doc_b"
    )


def cross_source_dup_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-pair mirror audit (functions/dedup.cross_source_duplication):
    shared exact-content fingerprints per source pair — the drop-the-mirror
    decision that runs before any document-level dedup."""
    from smart_data_lake_spark.functions.dedup import cross_source_duplication

    # fan-out measured and rejected here (r12 A/B: med 3.12 off vs 3.43 on)
    docs = _t(spark, sf_dir, "documents")
    return cross_source_duplication(docs).orderBy("source_a", "source_b")


def semantic_dedup_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (functions/dedup.semantic_dedup): coarse-quantizer cells +
    within-cell cosine threshold, keep-lowest-id; quadratic only inside a
    bounded cell, never across the corpus."""
    from smart_data_lake_spark.functions.dedup import semantic_dedup
    from smart_data_lake_spark.session import lineage_pin

    emb = _fan_out(spark, _t(spark, sf_dir, "embeddings"))
    # pin before the declared ordering (range-sample replay of the
    # within-cell verify; r11 opt, guide §2.4: A/B 4.8-6.0s -> 3.4-3.7s)
    return lineage_pin(semantic_dedup(emb, _IVF_CENTROIDS, threshold=0.2)).orderBy(
        "cell"
    )


def kmv_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct sketch (functions/profiling.kmv_distinct): deterministic
    md5-hash estimator gradeable against an exact SQL oracle — the mergeable
    bounded-memory replacement for exact distinct at corpus scale."""
    from smart_data_lake_spark.functions.profiling import kmv_distinct

    ev = _t(spark, sf_dir, "events")
    return kmv_distinct(ev, "user_id", ["event_type"], k=64).orderBy("event_type")


def temperature_mix_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature mixing audit (functions/sampling.temperature_mix_rates):
    source weights ∝ tokens^α (α=0.5), the multilingual-corpus balancing
    rule; one combinable aggregate + a broadcast normalizer."""
    from smart_data_lake_spark.functions.sampling import temperature_mix_rates

    docs = _t(spark, sf_dir, "documents")
    toks = F.when(
        F.length(F.trim(F.lower(F.col("text")))) == 0, F.lit(0)
    ).otherwise(F.size(F.split(F.trim(F.lower(F.col("text"))), r"\s+")))
    return temperature_mix_rates(
        docs, source_col="source", size_col=toks, alpha=0.5, token_budget=100_000
    ).orderBy("source")


def pmi_collocations_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining (functions/search.pmi_collocations): PMI-scored
    adjacent token pairs — vocab-scale aggregates, corpus scanned once,
    TakeOrdered top-k on the rounded score."""
    from smart_data_lake_spark.functions.search import pmi_collocations

    # fan-out measured and rejected (r12 A/B: med 1.17 off vs 1.81 on)
    docs = _t(spark, sf_dir, "documents")
    return pmi_collocations(docs, min_count=5, k=25)


def value_quartiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated quartiles per event type (functions/profiling
    .exact_quartiles): percentile_cont semantics, identical interpolation in
    Spark's percentile and DuckDB's quantile_cont."""
    from smart_data_lake_spark.functions.profiling import exact_quartiles

    ev = _t(spark, sf_dir, "events")
    return exact_quartiles(ev, "value", ["event_type"]).orderBy("event_type")


def autocorr_lag1_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation per event type (functions/analytics
    .lagged_autocorrelation): exact decimal sufficient statistics over the
    lag-paired series — one window shuffle + one combinable aggregate."""
    from smart_data_lake_spark.functions.analytics import lagged_autocorrelation

    ev = _t(spark, sf_dir, "events")
    return lagged_autocorrelation(ev).orderBy("event_type")


def rolling_z_anomalies_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly top-k (functions/analytics
    .rolling_zscore_anomalies): each event scored against its preceding-20
    window via exact decimal frame sums; TakeOrdered top-25 by |z|."""
    from smart_data_lake_spark.functions.analytics import rolling_zscore_anomalies

    ev = _t(spark, sf_dir, "events")
    return rolling_zscore_anomalies(ev)


def zipf_slope_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency slope per source (functions/search.zipf_slope):
    corpus-health regression over each source's top-100 terms, exact
    decimal regression sums."""
    from smart_data_lake_spark.functions.search import zipf_slope

    docs = _fan_out(spark, _t(spark, sf_dir, "documents"))  # tokenize map (r12)
    return zipf_slope(docs).orderBy("source")


def kmeans_assign_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One deterministic Lloyd assignment step (functions/similarity
    .kmeans_assign_stats): 8 broadcast seed centroids, in-row decimal
    distance fold, combinable cluster rollup — the auditable unit of the
    IVF coarse quantizer."""
    from smart_data_lake_spark.functions.similarity import kmeans_assign_stats

    emb = _fan_out(spark, _t(spark, sf_dir, "embeddings"))
    return kmeans_assign_stats(emb).orderBy("cluster")


def doc_length_band_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile-band length-filter audit (functions/quality
    .length_band_stats): interpolated p05/p95 bounds broadcast back onto
    the scan, combinable keep/drop rollup per source."""
    from smart_data_lake_spark.functions.quality import length_band_stats

    docs = _t(spark, sf_dir, "documents")
    return length_band_stats(docs).orderBy("source")


def fixed_k_sample_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-per-group sample (functions/sampling
    .fixed_k_per_group): the 5 docs whose md5(doc_id) sorts first in each
    source — pure hash order, reproducible across engines and runs."""
    from smart_data_lake_spark.functions.sampling import fixed_k_per_group

    docs = _t(spark, sf_dir, "documents")
    return (
        fixed_k_per_group(docs, "doc_id", "source", 5)
        .select("source", "sample_rank", "doc_id", "n_chars")
        .orderBy("source", "sample_rank")
    )


def normalized_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization-aware exact dedup (functions/dedup
    .normalized_duplicate_groups, bag-of-words mode): sorted unique token
    set then ONE hash-groupBy — the order-insensitive tier between
    byte-exact and MinHash dedup (finds real groups in this corpus, unlike
    byte-exact which is clean at sf0.01)."""
    from smart_data_lake_spark.functions.dedup import normalized_duplicate_groups

    docs = _t(spark, sf_dir, "documents")
    return normalized_duplicate_groups(docs, mode="bow").orderBy("norm_hash")


def streaming_enrich_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join (streaming/operators.enrich_with_static):
    the events stream joins a BROADCAST static user-cohort dim per
    micro-batch (no state store on the static side), then daily windowed
    counts per cohort — drained availableNow; oracle proves stream ≡ batch
    join+window."""
    from smart_data_lake_spark.streaming.operators import (
        enrich_with_static,
        read_events_batch,
        read_events_stream,
        run_available_now,
        user_cohort_dim,
    )

    dim = user_cohort_dim(read_events_batch(spark, sf_dir))
    res = enrich_with_static(read_events_stream(spark, sf_dir), dim)
    return run_available_now(res).orderBy("window_start_epoch", "cohort_week")


def source_vocab_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise vocabulary Jaccard between sources (functions/search
    .source_vocab_overlap): term-keyed pair join, never corpus×corpus;
    unrounded integer-derived division — bit-identical across engines."""
    from smart_data_lake_spark.functions.search import source_vocab_overlap

    # fan-out measured and rejected (r12 A/B: med 0.66 off vs 1.34 on)
    docs = _t(spark, sf_dir, "documents")
    return source_vocab_overlap(docs).orderBy("source_a", "source_b")


def decayed_popularity_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decayed popularity score per event type (functions/analytics
    .decayed_popularity): half-life weights off the observed max timestamp,
    rounded pre-sum + exact decimal accumulation; broadcast 1-row ref."""
    from smart_data_lake_spark.functions.analytics import decayed_popularity

    ev = _t(spark, sf_dir, "events")
    return decayed_popularity(ev, half_life_hours=24.0).orderBy("event_type")


def lang_source_chisq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence of language vs source (functions/profiling
    .chi_square_independence): exact-integer contingency cells, per-cell
    terms rounded pre-sum into exact decimal — the corpus-composition
    drift alarm."""
    from smart_data_lake_spark.functions.profiling import chi_square_independence

    docs = _t(spark, sf_dir, "documents")
    return chi_square_independence(docs, "lang", "source")


def simhash_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded SimHash near-dup candidate pairs (functions/dedup
    .simhash_candidate_pairs, Manku WWW'07): pigeonhole block equi-join,
    exact popcount verify — integer-exact end to end."""
    from smart_data_lake_spark.functions.dedup import simhash_candidate_pairs

    docs = _t(spark, sf_dir, "documents")
    return simhash_candidate_pairs(_fan_out(spark, docs), max_hamming=3).orderBy(
        "doc_a", "doc_b"
    )


def simhash_neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup CLUSTERS (functions/dedup.simhash_neardup_clusters):
    banded pigeonhole pairs → connected components → canonical pick. The
    cluster output is the 100 TB shape — pair lists are quadratic in
    near-dup cluster size, cluster rows are linear (kills the 8.8×-at-10×
    fan-out the pair query shows on synthesized clusters)."""
    from smart_data_lake_spark.functions.dedup import simhash_neardup_clusters as shc

    docs = _t(spark, sf_dir, "documents")
    return shc(_fan_out(spark, docs), max_hamming=3).orderBy("cluster_id")


def cusum_changepoint_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM mean-shift changepoint per event type (functions/analytics
    .cusum_changepoint): exact decimal cumsum - i*mean formulation, immune
    to engine window-evaluation order; per-group argmax."""
    from smart_data_lake_spark.functions.analytics import cusum_changepoint

    ev = _t(spark, sf_dir, "events")
    return cusum_changepoint(ev).orderBy("event_type")


def global_docs_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-N global deterministic sample (functions/sampling
    .global_fixed_n_sample): TakeOrdered over md5(key) — reproducible
    eval-slice extraction, never a rate-based binomial count."""
    from smart_data_lake_spark.functions.sampling import global_fixed_n_sample

    docs = _t(spark, sf_dir, "documents")
    return (
        global_fixed_n_sample(docs, "doc_id", 50)
        .select("doc_id", "source", "n_chars")
        .orderBy("doc_id")
    )


def multimodal_jpeg_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL JPEG codec through the distributed decode path (functions/
    multimodal.jpeg_roundtrip_features): per-row synthesized gradient ->
    encode_jpeg -> decode_media inside mapInPandas. Decoded dims/channels/
    format are exact functions of n_chars, so the oracle fully grades the
    pipeline; payload_bytes is checked >0 via a projected boolean (the
    entropy-coded size itself is not SQL-predictable)."""
    from smart_data_lake_spark.functions.multimodal import jpeg_roundtrip_features

    from smart_data_lake_spark.session import lineage_pin

    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") % 20 == 0)
    feats = jpeg_roundtrip_features(docs)
    # pin before the declared ordering: the encode/decode mapInPandas is
    # shuffle-free above the scan, so the orderBy's range-sampling pass
    # re-ran the whole codec (r11 opt: A/B ~2.2s -> ~1.1-1.4s)
    return lineage_pin(
        feats.select(
            "doc_id",
            "width",
            "height",
            "channels",
            "format",
            (F.col("payload_bytes") > 200).alias("payload_nonempty"),
        )
    ).orderBy("doc_id")


def length_drift_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample KS drift statistic between src1/src2 length distributions
    (functions/profiling.ks_statistic): exact integer ECDF ratios; the only
    single-partition window runs over the aggregated distinct-value support,
    never the corpus."""
    from smart_data_lake_spark.functions.profiling import ks_statistic

    docs = _t(spark, sf_dir, "documents")
    return ks_statistic(docs, "n_chars", "source", "src1", "src2")


def bigram_lm_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc average bigram log-probability under the corpus's own
    add-one-smoothed bigram LM (functions/quality.bigram_logprob_score) —
    the phrase-level fluency upgrade of the unigram scorer."""
    from smart_data_lake_spark.functions.quality import bigram_logprob_score

    # fan-out measured and rejected here (r12 A/B: med 1.83 off vs 2.23 on;
    # the token passes are join-keyed downstream, so the exchange only adds)
    docs = _t(spark, sf_dir, "documents")
    return bigram_logprob_score(docs).orderBy("doc_id")


def minhash_calibration_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash estimate-vs-exact calibration curve over the LSH candidate
    pairs (functions/dedup.minhash_estimate_calibration): the sketch-
    accuracy audit running inside the graded dedup pipeline itself."""
    from smart_data_lake_spark.functions.dedup import minhash_estimate_calibration

    docs = _t(spark, sf_dir, "documents")
    return minhash_estimate_calibration(_fan_out(spark, docs)).orderBy("est_matches")


def cms_heavy_hitter_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min-sketch heavy hitters over the corpus token stream
    (functions/profiling.cms_heavy_hitters; Cormode & Muthukrishnan 2005):
    depth-4 × width-1024 deterministic md5 sketch, candidates prefiltered by
    the sketch (no false negatives — CMS never under-counts), exact counts
    only for candidates. The 100 TB shape: the unbounded-vocab exact groupBy
    is replaced by a 4 KiB broadcastable sketch + a candidate-only count."""
    from smart_data_lake_spark.functions.profiling import cms_heavy_hitters

    # fan out (r12): the sketch pass and the vocabulary pass are each a
    # tokenize+md5 map over the whole corpus — measured as two serial ~1.5 s
    # 2-task jobs off the single-row-group scan (job_profile, guide §2)
    docs = _fan_out(spark, _t(spark, sf_dir, "documents"))
    return cms_heavy_hitters(docs).orderBy(F.desc("n_exact"), "term")


def pq_encode_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization encoding (functions/similarity.pq_encode; Jégou
    et al. 2011): 64-float vectors → 4 sub-codes against 8 deterministic
    seed centroids + exact-decimal quantization error. The compression step
    (256 bytes → 4 bytes/vector) that makes billion-vector ANN
    memory-feasible; codes are bit-reproducible (decimal distance fold,
    seed-id tie-break) so the full code table is oracle-graded."""
    from smart_data_lake_spark.functions.similarity import pq_encode

    emb = _fan_out(spark, _t(spark, sf_dir, "embeddings"))
    return pq_encode(emb).orderBy("vec_id")


def pq_adc_topk_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric-distance top-5 neighbor search over PQ codes
    (functions/similarity.pq_adc_topk; Jégou et al. 2011 §IV): per-query
    LUT of subvector↔centroid distances (broadcast, n_queries×m×k rows),
    database vectors touched only through their 4-int codes. One broadcast
    join + combinable sum + per-query top-k window."""
    from smart_data_lake_spark.functions.similarity import pq_adc_topk

    emb = _fan_out(spark, _t(spark, sf_dir, "embeddings"))
    return pq_adc_topk(emb).orderBy("query_id", "rank")


def bpe_merge_candidates_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE-training iteration's pair-count step (functions/text
    .bpe_merge_candidates; Sennrich et al. 2016): corpus → word-frequency
    table (ONE map-side-combined shuffle over the raw text — the only pass
    that ever touches the corpus) → adjacent char-pair counts weighted by
    word freq → top-20 merge candidates. Later BPE iterations loop over the
    vocabulary-bounded table, never the corpus."""
    from smart_data_lake_spark.functions.text import bpe_merge_candidates

    # fan-out measured and rejected (r12 A/B: med 0.57 off vs 0.88 on)
    docs = _t(spark, sf_dir, "documents")
    return bpe_merge_candidates(docs)


def pagerank_terms_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the corpus token-adjacency graph (functions/graph
    .pagerank; Page et al. 1999): 5 power-method iterations, damping 0.85,
    run entirely in scaled 64-bit INTEGER arithmetic so the iterative
    reduction is exact and order-independent — the full rank vector is
    oracle-graded bit-for-bit against 5 unrolled SQL iterations. Each
    iteration = one edge-list join + one combinable groupBy; lineage cut
    per iteration with localCheckpoint. Top 20 terms by final rank."""
    from smart_data_lake_spark.functions.graph import pagerank, token_transition_edges

    docs = _t(spark, sf_dir, "documents")
    edges = token_transition_edges(_fan_out(spark, docs))
    pr = pagerank(edges, weight_col="weight", iterations=5)
    return (
        pr.select(F.col("node").alias("term"), "rank_e12")
        .orderBy(F.desc("rank_e12"), "term")
        .limit(20)
    )


def bloom_semi_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit runtime-filter pruning (functions/runtime_filters
    .bloom_semi_join; Bloom 1970, Spark InjectRuntimeFilter made
    deterministic): revenue of lineitems belonging to URGENT orders. The
    build side's keys fold into a 2^16-bit / k=2 xxhash64 Bloom bitmap via
    a map-side-combinable bit_or groupBy (driver sees m/64 = 1024 words,
    never the keys); the probe scan is pre-pruned by a pure-Catalyst
    membership test before the exact left_semi join removes false
    positives — result identical to the plain semi join the oracle runs,
    with ~80% of probe rows dropped before the shuffle."""
    from smart_data_lake_spark.functions.runtime_filters import bloom_semi_join

    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    urgent = orders.where(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_orderkey").alias("l_orderkey")
    )
    kept = bloom_semi_join(li, urgent, "l_orderkey")
    return (
        kept.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(_revenue()).cast("double").alias("revenue"),
        )
        .orderBy("l_returnflag")
    )


def fuzzy_name_pairs_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy entity resolution over part names (functions/linkage
    .blocked_name_pairs; Fellegi-Sunter blocking, public technique): the
    2000-row table collapses to its 64-name dictionary first
    (dedup-before-match — at 100 TB the dictionary is orders of magnitude
    smaller than the fact table), candidate pairs come from an equi-join
    on the last name token (never all-pairs), and the JVM levenshtein
    predicate runs on blocked candidates only."""
    from smart_data_lake_spark.functions.linkage import blocked_name_pairs

    parts = _t(spark, sf_dir, "part")
    return blocked_name_pairs(parts, "p_name", max_dist=3).orderBy(
        "block", "name_a", "name_b"
    )


def weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling, 3 docs per source with probability
    increasing in n_chars (functions/sampling.weighted_fixed_k_per_group;
    Efraimidis-Spirtakis 2006 A-ES keys): ln(u)/w ranking with exact
    dyadic md5-derived u and a rounded key so the selection is
    reproducible across engines — the length-weighted eval-slice builder
    (token-weighted sampling favors long documents the way
    training-token exposure does)."""
    from smart_data_lake_spark.functions.sampling import weighted_fixed_k_per_group

    docs = _t(spark, sf_dir, "documents")
    return weighted_fixed_k_per_group(
        docs, "doc_id", "source", "n_chars", k=3
    ).select("doc_id", "source", "n_chars", "sample_rank").orderBy("source", "sample_rank")


def benford_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution of order totals vs Benford's
    law (functions/profiling.benford_first_digit; Newcomb 1881/Benford
    1938): the fabricated-amounts data-quality screen. Integer-cents digit
    extraction (no log10 on data) + shared-literal expected fractions keep
    it engine-exact; one 9-key map-side-combined groupBy — scan-bound."""
    from smart_data_lake_spark.functions.profiling import benford_first_digit

    orders = _t(spark, sf_dir, "orders")
    return benford_first_digit(orders, "o_totalprice").orderBy("digit")


def ivfpq_topk_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ composed ANN (functions/similarity.pq_adc_topk with
    centroids; Jégou et al. 2011 §V, the FAISS IVFPQ shape): the coarse
    quantizer prunes each query's candidates to its own inverted-list
    cell, then PQ-ADC approximates distances from the 4-int codes — cell
    pruning cuts candidate count ~n_cells-fold, PQ cuts bytes-per-
    candidate 64-fold; together the billion-vector search memory/compute
    budget. Raw-vector codes (not residuals) keep it oracle-exact."""
    from smart_data_lake_spark.functions.similarity import pq_adc_topk

    emb = _fan_out(spark, _t(spark, sf_dir, "embeddings"))
    return pq_adc_topk(emb, centroids=_IVF_CENTROIDS).orderBy("query_id", "rank")


def holt_forecast_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential level+trend smoothing per event type
    (functions/analytics.holt_linear_by_group; Holt 1957): the repo's
    canonical genuinely-sequential operator — the recursion has no
    weighted-sum reformulation (unlike EWMA), so it runs as sorted-group
    Arrow applyInPandas, the documented escape hatch for stateful per-key
    logic. Every smoothing step rounds with the shared floor(x*1e9+0.5)/1e9
    form, so the WHOLE recursion grades bit-for-bit against a DuckDB
    RECURSIVE CTE running the identical recurrence."""
    from smart_data_lake_spark.functions.analytics import holt_linear_by_group

    ev = _t(spark, sf_dir, "events")
    return holt_linear_by_group(
        ev, "event_type", "ts", "value", tiebreak_col="event_id"
    ).orderBy("event_type")


def streaming_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLIDING-window streaming counts (streaming/operators
    .sliding_event_counts): 2-hour windows hopping every hour — completes
    the window-type matrix next to the tumbling/session/interval queries.
    Each event lands in exactly two overlapping windows; drained
    availableNow into a memory sink and graded against the equivalent
    batch two-window expansion, proving stream-batch consistency of the
    overlapping-window plan."""
    from smart_data_lake_spark.streaming.operators import (
        read_events_stream,
        run_available_now,
        sliding_event_counts,
    )

    sdf = read_events_stream(spark, sf_dir)
    out = run_available_now(sliding_event_counts(sdf))
    return out.orderBy("window_start_epoch", "event_type")


def hard_negatives_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training (functions/similarity
    .hard_negative_topk; ANCE-style, Xiong et al. 2021): per anchor, the 5
    most-similar vectors with a DIFFERENT label — the boundary-hugging
    negatives that make embedding training data effective. Anchors
    broadcast; one corpus scan; label inequality filters before scoring.
    At billion-vector scale the scan swaps for this module's IVF/PQ
    candidate generation with the same label filter."""
    from smart_data_lake_spark.functions.similarity import hard_negative_topk

    emb = _fan_out(spark, _t(spark, sf_dir, "embeddings"))
    return hard_negative_topk(emb, k=5).orderBy("anchor_id", "rank")


def basket_lift_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association mining over order lines
    (functions/analytics.cooccurrence_lift): part pairs co-ordered in the
    same order, exact support counts + lift. The self-join is keyed on the
    ORDER id (fan-out bounded by lines-per-order, single digits), item
    counts broadcast — the plan a 100 TB basket analysis needs."""
    from smart_data_lake_spark.functions.analytics import cooccurrence_lift

    li = _t(spark, sf_dir, "lineitem")
    return cooccurrence_lift(li, "l_orderkey", "l_partkey", min_pair_count=2, top_k=20)


def rfm_segments_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation (functions/analytics.rfm_segments):
    recency/frequency/monetary quintile scores with customer-id tie-breaks,
    aggregated per segment. One fact aggregate, three window ntiles over the
    (small) customer dimension."""
    from smart_data_lake_spark.functions.analytics import rfm_segments

    orders = _t(spark, sf_dir, "orders")
    return rfm_segments(orders)


def trimmed_mean_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-type mean of event values (functions/analytics
    .trimmed_mean_by_group): rank-based 10% two-sided trim — no percentile
    interpolation, so the kept row set is engine-identical; DECIMAL sum,
    one double division."""
    from smart_data_lake_spark.functions.analytics import trimmed_mean_by_group

    ev = _t(spark, sf_dir, "events")
    return trimmed_mean_by_group(ev, "event_type", "value", "event_id", trim_fraction=0.1)


def mann_kendall_trend_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotone-trend S statistic per event type over per-day
    means (functions/analytics.mann_kendall_by_group): day-level sufficient
    statistics, division-free cross-multiplied sign comparisons — S is an
    exact integer; pairwise only over DAYS, never rows."""
    from smart_data_lake_spark.functions.analytics import mann_kendall_by_group

    ev = _t(spark, sf_dir, "events")
    return mann_kendall_by_group(ev, "event_type", "ts", "value")


def c4_quality_filter_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-rule document screen (functions/quality.c4_quality_flags, Raffel
    et al. 2020 §2.2): terminal-punctuation line counts, lorem-ipsum and
    curly-brace flags, keep decision. Pure JVM map over the corpus scan —
    integer/boolean outputs, zero shuffles."""
    from smart_data_lake_spark.functions.quality import c4_quality_flags

    docs = _t(spark, sf_dir, "documents")
    return c4_quality_flags(docs).orderBy("doc_id")


def readability_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch Reading Ease per document (functions/text.flesch_reading_ease;
    public Flesch 1948 formula with the standard vowel-group syllable
    approximation): exact integer word/sentence/syllable counts, one fixed
    arithmetic expression. Pure JVM regexp map — zero shuffles."""
    from smart_data_lake_spark.functions.text import (
        flesch_reading_ease,
        syllable_count,
        token_count,
    )

    from smart_data_lake_spark.session import lineage_pin

    docs = _fan_out(spark, _t(spark, sf_dir, "documents"))
    # pin before the declared ordering: the regexp/syllable chain is the
    # whole cost and sits above the last exchange, so the orderBy's
    # range-sampling pass re-ran it (r11 opt: A/B ~2.6s -> ~1.5s)
    return lineage_pin(
        docs.select(
            "doc_id",
            token_count(F.col("text")).alias("n_words"),
            F.greatest(F.regexp_count(F.col("text"), F.lit(r"[.!?]+")), F.lit(1)).alias("n_sentences"),
            syllable_count(F.col("text")).alias("n_syllables"),
            flesch_reading_ease(F.col("text")).alias("flesch"),
        )
    ).orderBy("doc_id")


def luhn_check_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Luhn checksum validation at scale (functions/text.luhn_valid; ISO/IEC
    7812 public algorithm) — the PII/data-quality primitive behind card-
    number detection, run over deterministic 14-digit candidates derived
    from order keys. In-row JVM array fold, no UDF; one tiny aggregate."""
    from smart_data_lake_spark.functions.text import luhn_valid

    # fan out the single-row-group orders scan: the Luhn fold (regexp +
    # split + zip_with aggregate per row) otherwise runs on one core
    # (r11 opt: 1.6s single task -> 32-way; A/B medians ~3.1s -> ~2.1s)
    orders = _fan_out(
        spark, _t(spark, sf_dir, "orders").select("o_orderpriority", "o_orderkey")
    )
    cand = orders.select(
        "o_orderpriority",
        F.lpad(F.col("o_orderkey").cast("string"), 14, "5").alias("cand"),
    )
    return (
        cand.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_candidates"),
            F.sum(luhn_valid(F.col("cand")).cast("long")).alias("n_luhn_valid"),
        )
        .orderBy("o_orderpriority")
    )


def seasonal_strength_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality strength per event type (functions/analytics
    .seasonal_strength_by_group): one-way variance decomposition over exact
    DECIMAL sufficient statistics — two combinable aggregates + a broadcast
    join, scan-bound."""
    from smart_data_lake_spark.functions.analytics import seasonal_strength_by_group

    ev = _t(spark, sf_dir, "events")
    return seasonal_strength_by_group(ev, "event_type", "ts", "value")



# ---- r8 additions (registered BELOW the frozen window; r9 rotation queue) --


def jaccard_prefix_pairs_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-and-complete shingle-set similarity join (functions/dedup
    .jaccard_prefix_join): prefix filtering on the rarest shingles —
    guaranteed-total recall where the banded-MinHash candidates of
    dedup_ngram_jaccard are probabilistic; integer cross-multiplied
    threshold, one df-aggregate + one prefix equi-join + exact verify."""
    from smart_data_lake_spark.functions.dedup import jaccard_prefix_join

    docs = _t(spark, sf_dir, "documents")
    return jaccard_prefix_join(_fan_out(spark, docs), threshold_num=6, threshold_den=10).orderBy(
        "doc_a", "doc_b"
    )


def exact_neardup_clusters_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Jaccard near-dup CLUSTERS (functions/dedup
    .jaccard_neardup_clusters): the prefix-filtered exact join collapsed
    through connected components — one row per duplicate family instead of
    the quadratic pair list (the r8-measured 40.5x-at-10x output blowup of
    the pair form). The join and component iteration run on one
    representative per distinct shingle set; members expand back by
    fingerprint."""
    from smart_data_lake_spark.functions.dedup import jaccard_neardup_clusters

    docs = _t(spark, sf_dir, "documents")
    return jaccard_neardup_clusters(
        _fan_out(spark, docs), threshold_num=6, threshold_den=10
    ).orderBy("cluster_id")


def tfidf_cosine_pairs_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse TF-IDF cosine pairs via the posting-list self-join
    (functions/search.tfidf_cosine_pairs): pairs materialize only for docs
    sharing a term; decimal-exact dot products and norms, one rounded
    double cosine."""
    from smart_data_lake_spark.functions.search import tfidf_cosine_pairs

    docs = _t(spark, sf_dir, "documents")
    return tfidf_cosine_pairs(
        _fan_out(spark, docs), min_cosine_num=95, min_cosine_den=100
    ).orderBy("doc_a", "doc_b")


def qgram_editdist_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact blocking-free edit-distance join (functions/linkage
    .qgram_editdist_pairs): frequency-ordered positional q-gram prefix
    filter (Gravano 2001 / Ed-Join 2008) prunes candidates to rare-gram
    collisions; JVM levenshtein verifies. Supplier name dictionary, k=1."""
    from smart_data_lake_spark.functions.linkage import qgram_editdist_pairs

    sup = _t(spark, sf_dir, "supplier")
    return qgram_editdist_pairs(sup, "s_name", max_dist=1).orderBy("name_a", "name_b")


def theil_sen_trend_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust slope per event type (functions/analytics
    .theil_sen_trend_by_group): median of pairwise daily-mean slopes — the
    outlier-immune complement of trend_value_by_type's OLS; O(days^2) runs
    on the collapsed daily frame only."""
    from smart_data_lake_spark.functions.analytics import theil_sen_trend_by_group

    ev = _t(spark, sf_dir, "events")
    return theil_sen_trend_by_group(ev).orderBy("event_type")


def xcorr_view_click_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily cross-correlation lag profile view<-click (functions/analytics
    .xcorr_lags): does click volume lead view volume and by how many days;
    exact decimal Pearson sufficient statistics per lag, whole lag table
    emitted so no float argmax decides a row."""
    from smart_data_lake_spark.functions.analytics import xcorr_lags

    ev = _t(spark, sf_dir, "events")
    return xcorr_lags(ev, "view", "click", max_lag=7)


def survival_conversion_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup->purchase time-to-event curve (functions/analytics
    .survival_hazard_curve): Nelson-Aalen cumulative hazard + Kaplan-Meier
    survival with right-censoring at the corpus horizon; rounded-term
    decimal cumulative sums keep both estimators engine-exact."""
    from smart_data_lake_spark.functions.analytics import survival_hazard_curve

    ev = _t(spark, sf_dir, "events")
    return survival_hazard_curve(ev)


def ab_test_purchase_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test over a deterministic user_id%2 split
    (functions/analytics.two_proportion_ab_test): the closed-form
    experiment readout — exact integer counts into one double z."""
    from smart_data_lake_spark.functions.analytics import two_proportion_ab_test

    ev = _t(spark, sf_dir, "events")
    return two_proportion_ab_test(ev)


def user_behavior_entropy_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user Shannon entropy of the event-type mix (functions/analytics
    .user_behavior_entropy): the bot-vs-organic behavioral-diversity
    feature; rounded -p*ln(p) terms summed as exact decimals."""
    from smart_data_lake_spark.functions.analytics import user_behavior_entropy

    ev = _t(spark, sf_dir, "events")
    return user_behavior_entropy(ev).orderBy("user_id")


def seq_pattern_support_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Any-gap sequential-pattern support for ordered type pairs
    (functions/analytics.sequential_pattern_support): min/max-timestamp
    collapse per (user, type) makes length-2 sequence mining one combinable
    aggregate + a dictionary-sized per-user join — adjacent-transition
    counts (event_transitions) cannot see these."""
    from smart_data_lake_spark.functions.analytics import sequential_pattern_support

    ev = _t(spark, sf_dir, "events")
    return sequential_pattern_support(ev)


def gini_customer_spend_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini concentration of customer spend per nation (functions/profiling
    .gini_by_group): the Lorenz inequality audit over exact decimal sums;
    customers with no orders count as zero-spend mass."""
    from smart_data_lake_spark.functions.profiling import gini_by_group

    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    nation = _t(spark, sf_dir, "nation")
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
    return gini_by_group(base, "n_name", "c_custkey", "spend").orderBy("n_name")


def fd_histogram_value_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freedman-Diaconis equal-width histogram of event values
    (functions/profiling.fd_histogram): IQR-derived bin width via the
    SQL-standard percentile_cont interpolation, one scalar aggregate
    broadcast + one combinable per-bin count."""
    from smart_data_lake_spark.functions.profiling import fd_histogram

    ev = _t(spark, sf_dir, "events")
    return fd_histogram(ev, "value")


def scd2_snapshot_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel over the SCD2 history (historization.snapshot_as_of):
    rebuild every user's state at the corpus midpoint from the
    dl_ts_captured/dl_ts_delimited intervals scd2_user_history writes — a
    pure partition-prunable filter, no window or join on the read path."""
    from smart_data_lake_spark.historization import (
        TS_CAPTURED,
        historize_event_log,
        snapshot_as_of,
    )

    ev = _t(spark, sf_dir, "events")
    hist = historize_event_log(
        ev.select("user_id", "ts", "event_id", "event_type"),
        pks=["user_id"],
        state_cols=["event_type"],
        ts_col="ts",
        tiebreaker_cols=["event_id"],
    )
    # the as-of instant is one scalar (epoch-second corpus midpoint) — a
    # bounded 1-row collect, same policy class as the bloom/manifest scalars
    import datetime as _dt

    mid_epoch = ev.agg(
        F.floor(
            (F.min(F.col("ts").cast("double")) + F.max(F.col("ts").cast("double"))) / 2.0
        ).alias("m")
    ).collect()[0]["m"]
    # tz-AWARE instant: lit() converts a NAIVE datetime through the
    # driver's OS timezone (not the session tz), which would shift the
    # snapshot on any non-UTC machine (r8 review)
    mid = _dt.datetime.fromtimestamp(int(mid_epoch), tz=_dt.timezone.utc)
    snap = snapshot_as_of(hist, as_of=mid)
    return snap.select("user_id", "event_type", TS_CAPTURED).orderBy("user_id")



def hits_terms_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs & authorities over the token-adjacency graph
    (functions/graph.hits): the mutually-recursive companion of
    pagerank_terms_corpus, whole recurrence in scaled integer arithmetic
    with max-normalization — oracle-graded bit-for-bit against 3 unrolled
    SQL iterations. Top-20 authorities."""
    from smart_data_lake_spark.functions.graph import hits, token_transition_edges

    # fan-out measured and rejected here (r12 A/B: med 3.54 off vs 3.85 on)
    docs = _t(spark, sf_dir, "documents")
    h = hits(token_transition_edges(docs), weight_col="weight", iterations=3)
    return (
        h.orderBy(F.desc("authority_e12"), F.asc("node"))
        .limit(20)
        .select(F.col("node").alias("term"), "authority_e12", "hub_e12")
    )


def vocab_coverage_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve per source (functions/search
    .vocab_coverage_curve): token-mass share of the top-10/top-100 terms —
    Zipf's law as a direct corpus-health quantity; vocab-scale ranking
    window, exact integer counts."""
    from smart_data_lake_spark.functions.search import vocab_coverage_curve

    # fan-out measured and rejected (r12 A/B: neutral, med 1.07 off vs 1.14 on)
    docs = _t(spark, sf_dir, "documents")
    return vocab_coverage_curve(docs)


# ---- round-9 operators (registered below the r9 freeze line) -------------


def spearman_value_hour_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between event value and hour-of-day per
    type (functions/analytics.spearman_by_group): average-rank ties via the
    integer doubled-rank trick — the whole statistic reduces to integer
    sufficient statistics, one double expression at the end."""
    from smart_data_lake_spark.functions.analytics import spearman_by_group

    ev = _t(spark, sf_dir, "events")
    hour_utc = (F.floor(F.col("ts").cast("double") / 3600.0) % 24).cast("long")
    return spearman_by_group(ev, "event_type", F.col("value"), hour_utc)


def winsorized_mean_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10% winsorized mean of event values per type (functions/analytics
    .winsorized_mean_by_group): rank-based clamp boundaries — the
    keep-n-constant companion of the graded trimmed mean."""
    from smart_data_lake_spark.functions.analytics import winsorized_mean_by_group

    ev = _t(spark, sf_dir, "events")
    return winsorized_mean_by_group(ev, "event_type", "value", "event_id")


def burstiness_daily_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fano factor + Goh-Barabási burstiness of the daily event-count
    series per type (functions/analytics.burstiness_by_group): dispersion
    diagnostics from integer sufficient statistics."""
    from smart_data_lake_spark.functions.analytics import burstiness_by_group

    ev = _t(spark, sf_dir, "events")
    return burstiness_by_group(ev, "event_type")


def next_event_entropy_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional entropy of the next event type given the current one
    (functions/analytics.next_event_conditional_entropy): the
    predictability collapse of the transition matrix; decimal-summed
    c·ln(c) terms."""
    from smart_data_lake_spark.functions.analytics import (
        next_event_conditional_entropy,
    )

    ev = _t(spark, sf_dir, "events")
    return next_event_conditional_entropy(ev)


def twap_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trapezoidal time-weighted average of event values per type
    (functions/analytics.twap_by_group): the sampling-density-unbiased
    mean over the (ts, event_id) total order; decimal-summed trapezoids."""
    from smart_data_lake_spark.functions.analytics import twap_by_group

    ev = _t(spark, sf_dir, "events")
    return twap_by_group(ev, "event_type")


def llr_collocations_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dunning log-likelihood-ratio collocations over the corpus
    (functions/search.llr_collocations): the evidence-weighted complement
    of pmi_collocations_corpus — G² over exact 2×2 contingency integers,
    top-25 on the rounded score."""
    from smart_data_lake_spark.functions.search import llr_collocations

    # fan-out measured and rejected (r12 A/B: med 1.25 off vs 1.91 on)
    docs = _t(spark, sf_dir, "documents")
    return llr_collocations(docs, min_count=5, k=25).orderBy(
        F.desc("llr_g2"), "collocation"
    )


def distinct_ngram_ratio_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-1/Distinct-2 diversity per source (functions/search
    .distinct_ngram_ratio): unique-type share of unigram/bigram tokens —
    the standard corpus-diversity readout next to vocab_coverage's mass
    curve."""
    from smart_data_lake_spark.functions.search import distinct_ngram_ratio

    # fan-out measured and rejected (r12 A/B: neutral, med 1.61 off vs 1.66 on)
    docs = _t(spark, sf_dir, "documents")
    return distinct_ngram_ratio(docs)


def entity_clusters_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution clusters over supplier names (functions/linkage
    .entity_resolution_clusters): the exact edit-distance join collapsed
    through connected components — one row per entity, canonical = longest
    member name."""
    from smart_data_lake_spark.functions.linkage import entity_resolution_clusters

    sup = _t(spark, sf_dir, "supplier")
    return entity_resolution_clusters(sup, "s_name", max_dist=1).orderBy("cluster_id")


def tfidf_topk_neighbors_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF cosine neighbors per document (functions/search
    .tfidf_topk_neighbors): the bounded-output form of the exact cosine
    pair join — at most k rows per doc regardless of duplicate-family
    size."""
    from smart_data_lake_spark.functions.search import tfidf_topk_neighbors

    docs = _t(spark, sf_dir, "documents")
    return tfidf_topk_neighbors(
        _fan_out(spark, docs), k=3, min_cosine_num=1, min_cosine_den=4
    ).orderBy("doc", "rk")


def streaming_topk_per_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-window top-k event types through the streaming gate
    (streaming/operators.topk_per_window + rank_topk_per_window): the
    watermarked tumbling aggregation runs in the stream, the rank-and-cut
    on the drained (final) windows — the canonical two-stage streaming
    top-k."""
    from smart_data_lake_spark.streaming.operators import (
        rank_topk_per_window,
        read_events_stream,
        run_available_now,
        topk_per_window,
    )

    sdf = read_events_stream(spark, sf_dir)
    drained = run_available_now(topk_per_window(sdf))
    return rank_topk_per_window(drained, k=3).orderBy("window_start_epoch", "rk")


def kendall_tau_level_volume_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b per event type between daily mean value and daily
    volume (functions/analytics.kendall_tau_daily_level_volume): the
    ties-corrected concordance test, exact via cross-multiplied mean
    comparisons over the collapsed daily frame — do busy days run hot?"""
    from smart_data_lake_spark.functions.analytics import (
        kendall_tau_daily_level_volume,
    )

    ev = _t(spark, sf_dir, "events")
    return kendall_tau_daily_level_volume(ev, "event_type")


def markov_stationary_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the user event-type Markov chain
    (functions/graph.markov_stationary): scaled-integer power iteration
    over per-user adjacent transition counts — the long-run occupancy
    collapse of the transition matrix, oracle-graded bit-for-bit against
    3 unrolled HUGEINT SQL iterations (the PageRank/HITS discipline)."""
    from smart_data_lake_spark.functions.graph import markov_stationary

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.select("user_id", "event_type", "ts", "event_id")
        .withColumn("_next", F.lead("event_type").over(w))
        .where(F.col("_next").isNotNull())
        .groupBy(F.col("event_type").alias("src"), F.col("_next").alias("dst"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return markov_stationary(trans, iterations=3).orderBy("node")


def mann_whitney_value_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U rank test between the user_id%2 variants
    (functions/analytics.mann_whitney_u_by_variant): tie-exact doubled-rank
    integer statistics, rank-biserial effect size, tie-corrected z. The
    nonparametric CONTINUOUS-metric A/B companion to the proportion z-test."""
    from smart_data_lake_spark.functions.analytics import mann_whitney_u_by_variant

    ev = _t(spark, sf_dir, "events")
    return mann_whitney_u_by_variant(ev)


def welch_t_value_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t between the user_id%2 variants
    (functions/analytics.welch_t_by_variant): exact decimal sufficient
    statistics, one combinable aggregate, grid-quantized finals."""
    from smart_data_lake_spark.functions.analytics import welch_t_by_variant

    ev = _t(spark, sf_dir, "events")
    return welch_t_by_variant(ev)


def hour_profile_hhi_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day concentration profile per event type
    (functions/analytics.hour_profile_by_group): deterministic peak-hour
    argmax + Herfindahl concentration index from exact integer counts."""
    from smart_data_lake_spark.functions.analytics import hour_profile_by_group

    ev = _t(spark, sf_dir, "events")
    return hour_profile_by_group(ev)


def attribution_last_touch_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch conversion attribution over the event stream
    (functions/analytics.last_touch_attribution): each purchase credited to
    the user's most recent non-purchase event within 7 days — one
    user-window pass, no self-joins; includes the honest (unattributed)
    bucket."""
    from smart_data_lake_spark.functions.analytics import last_touch_attribution

    ev = _t(spark, sf_dir, "events")
    return last_touch_attribution(ev)


def psi_value_drift_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of the value distribution, first half vs
    second half of the observation window, per type
    (functions/analytics.psi_value_drift_by_group): the production drift
    gate, equal-width engine-exact bins, ε-floored shares."""
    from smart_data_lake_spark.functions.analytics import psi_value_drift_by_group

    ev = _t(spark, sf_dir, "events")
    return psi_value_drift_by_group(ev)


def triangle_count_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the token-adjacency graph (functions/graph
    .triangle_counts; Schank–Wagner degree-ordered node-iterator): the
    orientation bounds every out-degree by O(√m), so the wedge join cannot
    blow up on hub terms. Top 20 terms by triangle participation."""
    from smart_data_lake_spark.functions.graph import (
        token_transition_edges,
        triangle_counts,
    )

    docs = _t(spark, sf_dir, "documents")
    edges = token_transition_edges(_fan_out(spark, docs))
    return triangle_counts(edges, top_k=20)


def source_divergence_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-vs-rest unigram KL / Jensen–Shannon divergence per source
    (functions/search.source_divergence): add-α smoothing over the corpus
    vocabulary, exact-decimal term sums, linear in source count — the
    corpus-mix drift gauge."""
    from smart_data_lake_spark.functions.search import source_divergence

    docs = _t(spark, sf_dir, "documents")
    return source_divergence(_fan_out(spark, docs))


def cramers_v_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V association between document language and source
    (functions/profiling.cramers_v; Cramér 1946): the [0,1]-normalized
    chi-square — "how strongly does language depend on source",
    comparable across corpus sizes. Marginal-scale frames only."""
    from smart_data_lake_spark.functions.profiling import cramers_v

    docs = _t(spark, sf_dir, "documents")
    return cramers_v(docs, "lang", "source")


def k_anonymity_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit of orders under the quasi-identifier set
    (status, priority, order month) (functions/profiling
    .k_anonymity_audit; Sweeney 2002): class count, worst class size, and
    the fraction of rows below k=5 — the privacy gate before a table joins
    a training mix. One combinable groupBy + one 1-row reduce."""
    from smart_data_lake_spark.functions.profiling import k_anonymity_audit

    orders = _t(spark, sf_dir, "orders").withColumn("o_month", F.month("o_orderdate"))
    return k_anonymity_audit(orders, ["o_orderstatus", "o_orderpriority", "o_month"], k=5)


def chao1_vocab_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chao1 estimated true vocabulary size per source (functions/
    profiling.chao1_vocab_richness; Chao 1984, bias-corrected form): the
    unseen-vocabulary complement of kmv_distinct, from exact
    singleton/doubleton counts."""
    from smart_data_lake_spark.functions.profiling import chao1_vocab_richness

    docs = _t(spark, sf_dir, "documents")
    return chao1_vocab_richness(_fan_out(spark, docs)).orderBy("source")


def kcore_terms_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-round k=16 core peeling of the token-adjacency graph
    (functions/graph.kcore_peel; Seidman 1983): the densely
    interconnected vocabulary backbone after low-degree terms peel away.
    Fixed-round pure-integer recurrence, bit-exact vs 3 unrolled SQL
    rounds (the pagerank/HITS/markov grading discipline)."""
    from smart_data_lake_spark.functions.graph import kcore_peel, token_transition_edges

    docs = _t(spark, sf_dir, "documents")
    edges = token_transition_edges(_fan_out(spark, docs))
    return kcore_peel(edges, k=16, rounds=3).orderBy("node")


def heaps_law_fit_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary-growth fit V(N) = K·N^beta over the corpus in
    doc_id order (functions/search.heaps_law_fit; Heaps 1978): OLS of
    ln(cumulative vocabulary) on ln(cumulative tokens) through the shared
    grid + exact-decimal sufficient statistics."""
    from smart_data_lake_spark.functions.search import heaps_law_fit

    docs = _t(spark, sf_dir, "documents")
    return heaps_law_fit(_fan_out(spark, docs))


def kruskal_wallis_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H across the five event types (functions/analytics
    .kruskal_wallis_by_group; Kruskal & Wallis 1952): the k-sample rank
    pre-gate before per-pair Mann-Whitney tests. Doubled-rank exact
    integer statistics, tie-corrected H'."""
    from smart_data_lake_spark.functions.analytics import kruskal_wallis_by_group

    ev = _t(spark, sf_dir, "events")
    return kruskal_wallis_by_group(ev)


def cmh_conversion_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Mantel-Haenszel stratified conversion test over orders
    (functions/analytics.cmh_test_stratified; Mantel & Haenszel 1959):
    variant = orderkey parity, success = status 'F', stratified by order
    priority — the Simpson's-paradox-proof A/B readout."""
    from smart_data_lake_spark.functions.analytics import cmh_test_stratified

    orders = _t(spark, sf_dir, "orders")
    return cmh_test_stratified(
        orders,
        "o_orderpriority",
        (F.col("o_orderkey") % 2).cast("int"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0),
    )


def page_hinkley_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-Hinkley sequential drift statistic per event type
    (functions/analytics.page_hinkley_by_group; Page 1954): the
    running-mean one-directional detector next to CUSUM's global-mean
    form. Fully-decimal walk on the grid-6/(28,6) discipline (r12
    rotation fix), statistic rendered as double via dec_double."""
    from smart_data_lake_spark.functions.analytics import page_hinkley_by_group

    ev = _t(spark, sf_dir, "events")
    return page_hinkley_by_group(ev).orderBy("event_type")


def gumbel_return_level_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gumbel block-maxima fit with a 30-day return level per event type
    (functions/analytics.gumbel_return_level_by_group; Gumbel 1958,
    method-of-moments): daily max values -> moment fit -> the provisioning
    percentile. Exact decimal moments, grid finals."""
    from smart_data_lake_spark.functions.analytics import gumbel_return_level_by_group

    ev = _t(spark, sf_dir, "events")
    return gumbel_return_level_by_group(ev, return_period=30).orderBy("event_type")


def theil_index_spend_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil T inequality of customer spend per nation (functions/
    profiling.theil_index_by_group; Theil 1967): the additively
    decomposable complement of the Gini query, over the same
    customer-spend base (zero-spend customers included, 0·ln 0 = 0)."""
    from smart_data_lake_spark.functions.profiling import theil_index_by_group

    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("spend")
    )
    base = (
        cust.join(spend, cust.c_custkey == spend.o_custkey, "left")
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .select(
            "n_name",
            F.coalesce(F.col("spend"), F.lit(0).cast("decimal(18,2)")).alias("spend"),
        )
    )
    return theil_index_by_group(base, "n_name", "spend").orderBy("n_name")


def longest_streak_by_user_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest same-type event run per user (functions/analytics
    .longest_streak_by_user): the gaps-and-islands engagement/bot signal.
    Exact integers; ties break on type string via one max(struct)."""
    from smart_data_lake_spark.functions.analytics import longest_streak_by_user

    ev = _t(spark, sf_dir, "events")
    return longest_streak_by_user(ev).orderBy("user_id")


def simpson_diversity_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson token diversity per source (functions/profiling
    .simpson_diversity; Simpson 1949): head-duplication-sensitive [0,1]
    companion of the entropy/HHI family. One exact rational final."""
    from smart_data_lake_spark.functions.profiling import simpson_diversity

    docs = _t(spark, sf_dir, "documents")
    return simpson_diversity(docs).orderBy("source")


def yules_k_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yule's K lexical-richness characteristic per source
    (functions/profiling.yules_k; Yule 1944): the length-invariant
    templatedness constant. Exact integer spectrum, one rational final."""
    from smart_data_lake_spark.functions.profiling import yules_k

    docs = _t(spark, sf_dir, "documents")
    return yules_k(docs).orderBy("source")


def vocab_churn_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-half/second-half vocabulary churn per source
    (functions/profiling.vocab_churn_by_group): what fraction of the
    second half's vocabulary is new — the recrawl-drift gauge. Exact
    order-statistic split on doc_id."""
    from smart_data_lake_spark.functions.profiling import vocab_churn_by_group

    docs = _t(spark, sf_dir, "documents")
    return vocab_churn_by_group(docs).orderBy("source")


def cohens_kappa_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's κ between the declared language and the stopword-vote
    language ID (functions/profiling.cohens_kappa; Cohen 1960): the
    chance-corrected agreement behind lang_id_confusion's raw matrix —
    the labeling-quality gate raw accuracy overstates."""
    from smart_data_lake_spark.functions.profiling import cohens_kappa
    from smart_data_lake_spark.functions.text import with_text_stats

    # fan out (r12): with_text_stats is the regex-tokenize + stopword-vote
    # per-row block — the whole corpus on 1-2 scan tasks otherwise (guide §2)
    docs = _fan_out(spark, _t(spark, sf_dir, "documents"))
    return cohens_kappa(
        with_text_stats(docs).select("lang", "lang_pred"), "lang", "lang_pred"
    )


def wilcoxon_signed_rank_user_halves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank over paired per-user half means
    (functions/analytics.wilcoxon_signed_rank_by_user; Wilcoxon 1945):
    the within-subject shift test next to the two-sample Mann-Whitney.
    Doubled-midrank exact integers over USER-count rows."""
    from smart_data_lake_spark.functions.analytics import wilcoxon_signed_rank_by_user

    ev = _t(spark, sf_dir, "events")
    return wilcoxon_signed_rank_by_user(ev)


def friedman_value_by_type_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman rank test of event-type means over complete user blocks
    (functions/analytics.friedman_test_by_block; Friedman 1937): the
    repeated-measures complement of Kruskal-Wallis. Tie-corrected
    chi-square from exact within-block midranks."""
    from smart_data_lake_spark.functions.analytics import friedman_test_by_block

    ev = _t(spark, sf_dir, "events")
    return friedman_test_by_block(ev)


def cuped_adjusted_value_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced A/B readout (functions/analytics
    .cuped_adjusted_ab; Deng/Xu/Kohavi/Walker WSDM 2013): first-half
    means as the pre-period covariate, pooled theta, adjusted per-variant
    means + variance-reduction ratio. Exact decimal sufficient stats."""
    from smart_data_lake_spark.functions.analytics import cuped_adjusted_ab

    ev = _t(spark, sf_dir, "events")
    return cuped_adjusted_ab(ev)


def lorenz_curve_spend_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz decile points of customer spend per nation
    (functions/profiling.lorenz_curve_points; Lorenz 1905): WHERE the
    inequality the Gini query summarizes actually lives. Exact decimal
    cumsums, exact div cutoff ranks; same spend base as gini/theil."""
    from smart_data_lake_spark.functions.profiling import lorenz_curve_points

    return lorenz_curve_points(
        _customer_spend_base(spark, sf_dir), "n_name", "c_custkey", "spend"
    ).orderBy("n_name", "decile")


def bowley_moors_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Octile-based distribution shape per event type
    (functions/profiling.bowley_moors_shape; Bowley 1901, Moors 1988):
    outlier-robust skewness/kurtosis through one exact_percentiles
    window pass."""
    from smart_data_lake_spark.functions.profiling import bowley_moors_shape

    ev = _t(spark, sf_dir, "events")
    return bowley_moors_shape(ev, "event_type", "value").orderBy("event_type")


def _customer_spend_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared per-customer spend base (n_name, c_custkey, spend incl.
    zero-spend customers) for the post-freeze inequality entries
    (lorenz, theil decomposition). The frozen gini/theil window entries
    keep their inline copies untouched; at the r12 rotation they should
    move onto this helper too (r11 review: the block existed 4×)."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("spend")
    )
    return (
        cust.join(spend, cust.c_custkey == spend.o_custkey, "left")
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .select(
            "n_name",
            "c_custkey",
            F.coalesce(F.col("spend"), F.lit(0).cast("decimal(18,2)")).alias("spend"),
        )
    )


def theil_decomposition_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Between/within-nation decomposition of spend inequality
    (functions/profiling.theil_decomposition; Theil 1967, Shorrocks
    1980): the additive split Gini cannot provide, over the same
    customer-spend base as the gini/theil/lorenz queries."""
    from smart_data_lake_spark.functions.profiling import theil_decomposition

    return theil_decomposition(
        _customer_spend_base(spark, sf_dir).select("n_name", "spend"),
        "n_name",
        "spend",
    )


def wasserstein_value_drift_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wasserstein-1 drift between chronological halves per event type
    (functions/analytics.wasserstein_drift_by_group): the earth-mover
    magnitude gauge next to KS (max gap) and PSI (binned) — drift in
    VALUE UNITS, no binning choice."""
    from smart_data_lake_spark.functions.analytics import wasserstein_drift_by_group

    ev = _t(spark, sf_dir, "events")
    return wasserstein_drift_by_group(ev).orderBy("event_type")


def brown_forsythe_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe variance-homogeneity test across event types
    (functions/analytics.brown_forsythe_test; Brown & Forsythe 1974):
    ANOVA F on |value − group median| with exact order-statistic medians
    — the same-SPREAD question next to Kruskal-Wallis's same-location."""
    from smart_data_lake_spark.functions.analytics import brown_forsythe_test

    ev = _t(spark, sf_dir, "events")
    return brown_forsythe_test(ev)


def log_rank_conversion_by_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-group log-rank test on time-to-first-purchase, variant =
    user_id mod 2 (functions/analytics.log_rank_test; Mantel 1966): the
    significance companion to survival_conversion_curve's KM curve."""
    from smart_data_lake_spark.functions.analytics import log_rank_test

    ev = _t(spark, sf_dir, "events")
    return log_rank_test(ev)


def mcnemar_paired_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar paired-binary test of within-user purchase-rate change
    between each user's chronological halves (functions/analytics.
    mcnemar_paired_test; McNemar 1947, Edwards-corrected)."""
    from smart_data_lake_spark.functions.analytics import mcnemar_paired_test

    ev = _t(spark, sf_dir, "events")
    return mcnemar_paired_test(ev)


def jonckheere_price_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jonckheere-Terpstra ordered trend of o_totalprice across order
    priorities in label order (functions/analytics.
    jonckheere_terpstra_test; Terpstra 1952/Jonckheere 1954,
    tie-corrected variance): does price trend with urgency."""
    from smart_data_lake_spark.functions.analytics import jonckheere_terpstra_test

    orders = _t(spark, sf_dir, "orders")
    return jonckheere_terpstra_test(orders, "o_orderpriority", "o_totalprice")


def good_turing_missing_mass_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good-Turing unseen-probability-mass estimate per source
    (functions/profiling.good_turing_missing_mass; Good 1953): P₀=N₁/N —
    how much probability the never-seen vocabulary carries; the coverage
    companion to chao1's how-many-types estimate."""
    from smart_data_lake_spark.functions.profiling import good_turing_missing_mass

    docs = _t(spark, sf_dir, "documents")
    return good_turing_missing_mass(docs).orderBy("source")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Registry order is the driver grading window: only the first 50
    # entries get a CORRECTNESS oracle row per round. The r11 window is
    # FROZEN at the commit adding FREEZE_r11.json; the freeze is enforced
    # MECHANICALLY now (tools/freeze_check.py records the key list + an
    # oracle-text sha256 per member; tests/test_freeze_window.py fails the
    # suite on any post-freeze window edit). Composition is inline below.
    # Every new r11 operator was added BEFORE the freeze and sits INSIDE
    # the window, so the never-driver-graded debt queue entering r12 is
    # EMPTY (was 21 -> 14 -> 13 -> 12 -> 0).
    return {
        # ======== r11 GRADING WINDOW (FROZEN at the commit adding
        # ======== FREEZE_r11.json; tools/freeze_check.py +
        # ======== tests/test_freeze_window.py enforce key-set and
        # ======== oracle-text identity on every pytest run).
        # ======== Composition: 1-12 the 12 r10 operators (the whole
        # ======== debt queue - first driver rows), 13-17 the pinned
        # ======== canaries, 18-27 the 10 NEW r11 operators (added
        # ======== PRE-freeze so the r12 queue starts empty), 28-46
        # ======== every query whose function or oracle moved in the
        # ======== r11 sweep (engine-round closure, percentile `div`
        # ======== rank fix, tfidf collapse, pair-emitter guards,
        # ======== float min/max rendering), 47-50 fill: the jaccard
        # ======== guard's never-regraded consumer + oldest rotators.
        "mann_whitney_value_variants": mann_whitney_value_variants,
        "welch_t_value_variants": welch_t_value_variants,
        "hour_profile_hhi_by_type": hour_profile_hhi_by_type,
        "attribution_last_touch_events": attribution_last_touch_events,
        "psi_value_drift_by_type": psi_value_drift_by_type,
        "triangle_count_terms": triangle_count_terms,
        "source_divergence_docs": source_divergence_docs,
        "cramers_v_lang_source": cramers_v_lang_source,
        "k_anonymity_orders": k_anonymity_orders,
        "chao1_vocab_by_source": chao1_vocab_by_source,
        "kcore_terms_corpus": kcore_terms_corpus,
        "heaps_law_fit_corpus": heaps_law_fit_corpus,
        "q3_shipping_priority": q3_shipping_priority,
        "topk_customers_window": topk_customers_window,
        "streaming_windowed_counts": streaming_windowed_counts,
        "dedup_latest_event": dedup_latest_event,
        "scd2_user_history": scd2_user_history,
        "kruskal_wallis_value_by_type": kruskal_wallis_value_by_type,
        "cmh_conversion_by_priority": cmh_conversion_by_priority,
        "page_hinkley_value_by_type": page_hinkley_value_by_type,
        "gumbel_return_level_by_type": gumbel_return_level_by_type,
        "theil_index_spend_by_nation": theil_index_spend_by_nation,
        "longest_streak_by_user_events": longest_streak_by_user_events,
        "simpson_diversity_by_source": simpson_diversity_by_source,
        "yules_k_by_source": yules_k_by_source,
        "vocab_churn_by_source": vocab_churn_by_source,
        "cohens_kappa_lang_id": cohens_kappa_lang_id,
        "range_frame_trailing_value": range_frame_trailing_value,
        "grouping_sets_sales": grouping_sets_sales,
        "pmi_collocations_corpus": pmi_collocations_corpus,
        "ewma_value_by_type": ewma_value_by_type,
        "tfidf_top_terms_per_source": tfidf_top_terms_per_source,
        "events_value_outliers": events_value_outliers,
        "rolling_z_anomalies_events": rolling_z_anomalies_events,
        "tfidf_cosine_pairs_docs": tfidf_cosine_pairs_docs,
        "user_behavior_entropy_events": user_behavior_entropy_events,
        "fd_histogram_value_events": fd_histogram_value_events,
        "llr_collocations_corpus": llr_collocations_corpus,
        "tfidf_topk_neighbors_docs": tfidf_topk_neighbors_docs,
        "value_quartiles_by_type": value_quartiles_by_type,
        "mad_outliers_events": mad_outliers_events,
        "event_value_percentiles": event_value_percentiles,
        "doc_length_band_by_source": doc_length_band_by_source,
        "profile_orders_columns": profile_orders_columns,
        "simhash_near_pairs": simhash_near_pairs,
        "containment_pairs_docs": containment_pairs_docs,
        "jaccard_prefix_pairs_docs": jaccard_prefix_pairs_docs,
        "qgram_editdist_suppliers": qgram_editdist_suppliers,
        "scd2_snapshot_asof": scd2_snapshot_asof,
        "hits_terms_corpus": hits_terms_corpus,
        # ================= end of 50-entry grading window =================
        # --- NEW post-freeze (the r12 rotation queue, <= 12 throttle)
        "wilcoxon_signed_rank_user_halves": wilcoxon_signed_rank_user_halves,
        "friedman_value_by_type_blocks": friedman_value_by_type_blocks,
        "cuped_adjusted_value_ab": cuped_adjusted_value_ab,
        "lorenz_curve_spend_by_nation": lorenz_curve_spend_by_nation,
        "bowley_moors_value_by_type": bowley_moors_value_by_type,
        "theil_decomposition_spend": theil_decomposition_spend,
        "wasserstein_value_drift_by_type": wasserstein_value_drift_by_type,
        "brown_forsythe_value_by_type": brown_forsythe_value_by_type,
        "log_rank_conversion_by_variant": log_rank_conversion_by_variant,
        "mcnemar_paired_conversion": mcnemar_paired_conversion,
        "jonckheere_price_by_priority": jonckheere_price_by_priority,
        "good_turing_missing_mass_by_source": good_turing_missing_mass_by_source,
        # --- below the line: green in earlier rounds, rotated out
        "exact_neardup_clusters_docs": exact_neardup_clusters_docs,
        "spearman_value_hour_by_type": spearman_value_hour_by_type,
        "winsorized_mean_value_by_type": winsorized_mean_value_by_type,
        "burstiness_daily_by_type": burstiness_daily_by_type,
        "next_event_entropy_by_type": next_event_entropy_by_type,
        "twap_value_by_type": twap_value_by_type,
        "kendall_tau_level_volume_by_type": kendall_tau_level_volume_by_type,
        "distinct_ngram_ratio_by_source": distinct_ngram_ratio_by_source,
        "entity_clusters_suppliers": entity_clusters_suppliers,
        "streaming_topk_per_window": streaming_topk_per_window,
        "markov_stationary_event_types": markov_stationary_event_types,
        "trimmed_mean_value_by_type": trimmed_mean_value_by_type,
        "seq_pattern_support_events": seq_pattern_support_events,
        "gini_customer_spend_by_nation": gini_customer_spend_by_nation,
        "survival_conversion_curve": survival_conversion_curve,
        "ab_test_purchase_conversion": ab_test_purchase_conversion,
        "theil_sen_trend_by_type": theil_sen_trend_by_type,
        "xcorr_view_click_lags": xcorr_view_click_lags,
        "mix_sources_audit": mix_sources_audit,
        "winnow_fingerprints_docs": winnow_fingerprints_docs,
        "dup_span_stats": dup_span_stats,
        "readability_docs": readability_docs,
        "event_transitions": event_transitions,
        "trend_value_by_type": trend_value_by_type,
        "interarrival_stats_by_type": interarrival_stats_by_type,
        "event_value_histogram": event_value_histogram,
        "value_histogram_by_type": value_histogram_by_type,
        "benchmark_decontamination": benchmark_decontamination,
        "temperature_mix_sources": temperature_mix_sources,
        "normalized_doc_scores": normalized_doc_scores,
        "token_entropy_docs": token_entropy_docs,
        "kmv_distinct_users": kmv_distinct_users,
        "text_stats": text_stats,
        "cross_source_dup_audit": cross_source_dup_audit,
        "token_count_by_source": token_count_by_source,
        "sessionize_events": sessionize_events,
        "vocab_coverage_by_source": vocab_coverage_by_source,
        "json_extract_events": json_extract_events,
        "cube_sales": cube_sales,
        "ntile_customer_spend": ntile_customer_spend,
        "approx_distinct_users": approx_distinct_users,
        "embedding_quantize_error": embedding_quantize_error,
        "label_centroid_outliers": label_centroid_outliers,
        "train_val_split_documents": train_val_split_documents,
        "cohort_retention_weekly": cohort_retention_weekly,
        "funnel_signup_purchase": funnel_signup_purchase,
        "segment_dedup_docs": segment_dedup_docs,
        "orders_gaps_lead_lag": orders_gaps_lead_lag,
        "pii_redaction": pii_redaction,
        "dedup_ngram_jaccard": dedup_ngram_jaccard,
        "embedding_neardup": embedding_neardup,
        "embedding_neardup_exact": embedding_neardup_exact,
        "ann_topk_lsh": ann_topk_lsh,
        "ann_topk_ivf": ann_topk_ivf,
        "multimodal_image_meta": multimodal_image_meta,
        "incremental_dedup_new_source": incremental_dedup_new_source,
        "user_top_event": user_top_event,
        "top_bigrams_corpus": top_bigrams_corpus,
        "rolling_active_users_7d": rolling_active_users_7d,
        "user_event_paths": user_event_paths,
        "top_docs_per_source": top_docs_per_source,
        "cms_heavy_hitter_terms": cms_heavy_hitter_terms,
        "pq_encode_embeddings": pq_encode_embeddings,
        "pq_adc_topk_embeddings": pq_adc_topk_embeddings,
        "bpe_merge_candidates_corpus": bpe_merge_candidates_corpus,
        "pagerank_terms_corpus": pagerank_terms_corpus,
        "bloom_semi_revenue": bloom_semi_revenue,
        "fuzzy_name_pairs_parts": fuzzy_name_pairs_parts,
        "weighted_sample_docs": weighted_sample_docs,
        "benford_order_totals": benford_order_totals,
        "ivfpq_topk_embeddings": ivfpq_topk_embeddings,
        "holt_forecast_by_type": holt_forecast_by_type,
        "streaming_sliding_counts": streaming_sliding_counts,
        "hard_negatives_embeddings": hard_negatives_embeddings,
        "basket_lift_parts": basket_lift_parts,
        "rfm_segments_customers": rfm_segments_customers,
        "mann_kendall_trend_by_type": mann_kendall_trend_by_type,
        "c4_quality_filter_docs": c4_quality_filter_docs,
        "luhn_check_orders": luhn_check_orders,
        "seasonal_strength_value_by_type": seasonal_strength_value_by_type,
        "unigram_quality_docs": unigram_quality_docs,
        "bm25_search": bm25_search,
        "chunk_documents_overlap": chunk_documents_overlap,
        "dedup_exact": dedup_exact,
        "streaming_stateful_totals": streaming_stateful_totals,
        "q4_order_priority": q4_order_priority,
        "q5_local_supplier_volume": q5_local_supplier_volume,
        "q6_revenue_forecast": q6_revenue_forecast,
        "q10_returned_items": q10_returned_items,
        "q13_customer_distribution": q13_customer_distribution,
        "q16_parts_supplier": q16_parts_supplier,
        "q18_large_orders": q18_large_orders,
        "q20_excess_stock_suppliers": q20_excess_stock_suppliers,
        "q22_global_sales": q22_global_sales,
        "customer_set_ops": customer_set_ops,
        "streaming_session_counts": streaming_session_counts,
        "streaming_interval_join": streaming_interval_join,
        "simhash_docs": simhash_docs,
        "semantic_dedup_embeddings": semantic_dedup_embeddings,
        "asof_click_attribution": asof_click_attribution,
        "autocorr_lag1_value_by_type": autocorr_lag1_value_by_type,
        "zipf_slope_by_source": zipf_slope_by_source,
        "kmeans_assign_embeddings": kmeans_assign_embeddings,
        "fixed_k_sample_per_source": fixed_k_sample_per_source,
        "normalized_dedup_docs": normalized_dedup_docs,
        "streaming_enrich_cohorts": streaming_enrich_cohorts,
        "source_vocab_jaccard": source_vocab_jaccard,
        "decayed_popularity_by_type": decayed_popularity_by_type,
        "lang_source_chisq": lang_source_chisq,
        "cusum_changepoint_by_type": cusum_changepoint_by_type,
        "global_docs_sample": global_docs_sample,
        "multimodal_jpeg_pipeline": multimodal_jpeg_pipeline,
        "length_drift_ks": length_drift_ks,
        "bigram_lm_docs": bigram_lm_docs,
        "minhash_calibration_audit": minhash_calibration_audit,
        "simhash_neardup_clusters": simhash_neardup_clusters,
        "q7_nation_volume": q7_nation_volume,
        "q8_market_share": q8_market_share,
        "q9_product_profit": q9_product_profit,
        "q14_promo_revenue": q14_promo_revenue,
        "q15_top_supplier": q15_top_supplier,
        "q17_small_quantity_revenue": q17_small_quantity_revenue,
        "q19_discounted_revenue": q19_discounted_revenue,
        "q2_min_cost_supplier": q2_min_cost_supplier,
        "q11_important_stock": q11_important_stock,
        "q12_shipping_priority_class": q12_shipping_priority_class,
        "q21_waiting_suppliers": q21_waiting_suppliers,
        "streaming_dedup_users": streaming_dedup_users,
        "streaming_upsert_latest": streaming_upsert_latest,
        "importance_sample_documents": importance_sample_documents,
        "bpe_token_count_by_source": bpe_token_count_by_source,
        "quality_filter_gopher": quality_filter_gopher,
        "lineitem_correlations": lineitem_correlations,
        "q1_pricing_summary": q1_pricing_summary,
        "dedup_minhash": dedup_minhash,
        "neardup_clusters_minhash": neardup_clusters_minhash,
        "ann_topk": ann_topk,
        "hybrid_search_rrf": hybrid_search_rrf,
        "incremental_highwatermark": incremental_highwatermark,
        "stratified_sample_documents": stratified_sample_documents,
        "pack_sequences_by_source": pack_sequences_by_source,
        "token_budget_sample_docs": token_budget_sample_docs,
        "partition_diff": partition_diff,
        "pivot_order_status": pivot_order_status,
        "rollup_sales": rollup_sales,
        "pk_violations_events": pk_violations_events,
        "data_validation_lineitem": data_validation_lineitem,
        "range_clicks_before_purchase": range_clicks_before_purchase,
        "orders_running_total": orders_running_total,
        "lang_id_confusion": lang_id_confusion,
    }

# ---- oracle SQL builders (DuckDB dialect) --------------------------------

_TOKS = r"regexp_split_to_array(trim(lower(text)), '\s+')"
_NTOK = rf"CASE WHEN length(trim(lower(text))) = 0 THEN 0 ELSE len({_TOKS}) END"
# punctuation-ratio fragment for text_stats (module-level because f-string
# expressions cannot contain the regex backslashes on py3.11)
_PUNCT = (
    "CASE WHEN length(text) = 0 THEN 0.0 ELSE (length(text) - "
    "length(regexp_replace(text, '[.,;:!?''\"()\\-]', '', 'g'))) * 1.0 "
    "/ length(text) END"
)

_STOPWORDS = {
    "de": ["der", "die", "und", "das", "von", "zu", "mit", "den", "ein", "im"],
    "en": ["the", "a", "and", "of", "to", "in", "is", "it", "for", "on"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "por", "con", "los"],
    "fr": ["le", "la", "de", "et", "un", "les", "des", "en", "du", "que"],
    "zh": ["的", "是", "了", "在", "和", "有", "我", "不", "这", "他"],
}


def _sw_hits(code: str) -> str:
    lst = ", ".join(f"'{w}'" for w in _STOPWORDS[code])
    return f"len(list_filter({_TOKS}, t -> list_contains([{lst}], t)))"


def _lang_case() -> str:
    scores = {c: f"s_{c}" for c in sorted(_STOPWORDS)}
    best = "greatest(" + ", ".join(scores.values()) + ")"
    # tie-break replicates Spark array_max on (score, lang) structs:
    # max score, then lexicographically greatest language code
    branches = "\n    ".join(
        f"WHEN s_{c} = {best} THEN '{c}'" for c in sorted(_STOPWORDS, reverse=True)
    )
    return f"CASE WHEN {best} <= 0 THEN 'und'\n    {branches} END"


_SHINGLE_CTE = rf"""
toksrc AS (
  SELECT doc_id, {_TOKS} AS w FROM documents
  WHERE length(trim(lower(text))) > 0 AND len({_TOKS}) >= 3
),
sh AS (
  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
  FROM toksrc, LATERAL (SELECT unnest(range(1, len(w) - 1)) AS i) t
)
"""

_SHINGLE5_CTE = rf"""
tok5 AS (
  SELECT doc_id, {_TOKS} AS w FROM documents
  WHERE length(trim(lower(text))) > 0 AND len({_TOKS}) >= 5
),
g5 AS (
  SELECT DISTINCT doc_id,
         w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4] AS shingle
  FROM tok5, LATERAL (SELECT unnest(range(1, len(w) - 3)) AS i) t
)
"""

_NUM_HASHES = 12
_BANDS = 4


# SimHash signatures → banded candidate pairs, shared by the pair- and
# cluster-shaped oracles (same text the r6-green simhash_near_pairs used)
_SIMHASH_CAND_CTE = rf"""tok AS (
              SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
              WHERE length(trim(lower(text))) > 0
            ), th AS (
              SELECT doc_id, substr(md5(tok), 1, 8) AS h FROM tok
            ), bits AS (
              SELECT doc_id, h, bit FROM th, (SELECT unnest(range(0, 32)) AS bit) b
            ), digits AS (
              SELECT doc_id, bit, substr(h, bit // 4 + 1, 1) AS d FROM bits
            ), contrib AS (
              SELECT doc_id, bit,
                SUM((((CASE WHEN d BETWEEN '0' AND '9' THEN ascii(d) - 48 ELSE ascii(d) - 87 END) >> (bit % 4)) % 2) * 2 - 1) AS vote
              FROM digits GROUP BY doc_id, bit
            ), sigs AS (
              SELECT doc_id,
                     CAST(SUM(CASE WHEN vote > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS simhash
              FROM contrib GROUP BY doc_id
            ), blocks AS (
              SELECT doc_id, simhash, b.band,
                     (simhash >> (b.band * 8)) & 255 AS val
              FROM sigs, (SELECT unnest(range(0, 4)) AS band) b
            ), cand AS (
              SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     a.simhash AS sa, b.simhash AS sb
              FROM blocks a JOIN blocks b
                ON a.band = b.band AND a.val = b.val AND a.doc_id < b.doc_id
            )"""


def _minhash_cte() -> str:
    mins = ",\n    ".join(
        f"MIN(md5('{i}:' || shingle)) AS mh_{i}" for i in range(_NUM_HASHES)
    )
    rows = _NUM_HASHES // _BANDS
    band_selects = []
    for b in range(_BANDS):
        cols = " || '|' || ".join(f"mh_{b * rows + r}" for r in range(rows))
        band_selects.append(f"SELECT doc_id, {b} AS band_id, md5({cols}) AS band_hash FROM mh")
    bands = "\n  UNION ALL ".join(band_selects)
    return f"""
mh AS (
  SELECT doc_id,
    {mins}
  FROM sh GROUP BY doc_id
),
bands AS (
  {bands}
),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
)
"""


# LSH parameters shared between the Spark operators and their oracles; the
# plane matrices are deterministic Python-side constants inlined as literals
# in BOTH engines (repr round-trips doubles exactly → identical IEEE sign
# tests → identical buckets)
_ND_BANDS = 8
_ND_PPB = 10
_ANN_PLANES = 6


def _banded_bucket_cte(bands: int, planes_per_band: int, seed: int = 42) -> str:
    from smart_data_lake_spark.functions.similarity import bucket_sql, random_hyperplanes

    planes = random_hyperplanes(64, bands * planes_per_band, seed)
    selects = [
        f"SELECT vec_id, {b} AS band_id, "
        f"{bucket_sql('embedding', planes[b * planes_per_band:(b + 1) * planes_per_band])} AS bucket "
        "FROM embeddings"
        for b in range(bands)
    ]
    return "\n  UNION ALL ".join(selects)


def _dd(expr: str) -> str:
    """SQL twin of `functions.numeric.dec_double` (r11 class fix):
    engine-identical DECIMAL → DOUBLE via a VARCHAR round-trip — DuckDB's
    native int128 cast double-rounds past 2^53 scaled, Spark's BigDecimal
    cast is correctly rounded; the string path is correctly rounded in
    BOTH. Delegates to `numeric.dec_double_sql` so the forms cannot
    drift."""
    from smart_data_lake_spark.functions.numeric import dec_double_sql

    return dec_double_sql(expr)


def _gq(expr: str, decimals: int) -> str:
    """SQL twin of `functions.analytics.grid_round` (r10 rounding sweep):
    sign-symmetric round-half-away-from-zero on the pure IEEE-double grid —
    the same floor/negate/compare ops Spark evaluates, so any engine
    computes the identical double at any magnitude, unlike engine round()
    (Spark: shortest-decimal HALF_UP via BigDecimal; DuckDB: binary scaling
    that loses ulps past ~9e6·10^−d). Delegates to
    `analytics.grid_round_sql` so the oracle form and the Spark form can
    never drift."""
    from smart_data_lake_spark.functions.analytics import grid_round_sql

    return grid_round_sql(expr, decimals)


def _interp_sql(val: str, num: int, den: int) -> str:
    """SQL twin of profiling.exact_percentiles' interpolation for ONE
    exact-rational percentile num/den over a CTE exposing (rn, n, val):
    v_lo + (v_hi - v_lo) * frac with integer-arithmetic rank and an
    exactly-once-rounded fraction. Kept as a builder so every percentile
    oracle stays in lockstep with the Spark order statistics by
    construction (the _gq discipline; r10 review folded six inline
    copies into this)."""
    lo = f"((n - 1) * {num}) // {den} + 1"
    return (
        f"MAX(CASE WHEN rn = {lo} THEN {val} END)"
        f" + (MAX(CASE WHEN rn = least(((n - 1) * {num}) // {den} + 2, n) THEN {val} END)"
        f" - MAX(CASE WHEN rn = {lo} THEN {val} END))"
        f" * MAX(CASE WHEN rn = 1 THEN CAST(((n - 1) * {num}) % {den} AS DOUBLE) / {den}.0 END)"
    )


def _cos_sql(a: str, b: str, dim: int = 64) -> str:
    dot = " + ".join(f"CAST({a}[{i}] AS DOUBLE) * CAST({b}[{i}] AS DOUBLE)" for i in range(1, dim + 1))
    na = " + ".join(f"CAST({a}[{i}] AS DOUBLE) * CAST({a}[{i}] AS DOUBLE)" for i in range(1, dim + 1))
    nb = " + ".join(f"CAST({b}[{i}] AS DOUBLE) * CAST({b}[{i}] AS DOUBLE)" for i in range(1, dim + 1))
    # grid form, not engine round() (r11 sweep), lockstep with the
    # Spark operators' shared grid_round on the same cosine
    return _gq(f"({dot}) / (sqrt({na}) * sqrt({nb}))", 6)


def _pq_sql_parts(m: int = 4, k: int = 8, sub: int = 16) -> dict[str, str]:
    """DuckDB SQL fragments mirroring pq_encode/pq_adc_topk's exact-decimal
    subvector distances (same fold recipe as the kmeans_assign oracle)."""

    def sub_dist(i: int, e: str = "e.embedding", s: str = "s.seed_vec") -> str:
        return (
            f"(SELECT SUM(CAST("
            + _gq(
                f"(CAST({e}[g.i] AS DOUBLE) - CAST({s}[g.i] AS DOUBLE))"
                f" * (CAST({e}[g.i] AS DOUBLE) - CAST({s}[g.i] AS DOUBLE))",
                6,
            )
            + f" AS DECIMAL(38,6)))"
            f" FROM (SELECT unnest(range({i * sub + 1}, {i * sub + sub + 1})) AS i) g)"
        )

    return {
        "seeds": f"SELECT vec_id AS seed_id, embedding AS seed_vec FROM embeddings ORDER BY vec_id LIMIT {k}",
        "dist_cols": ", ".join(f"{sub_dist(i)} AS d_{i}" for i in range(m)),
        "rk_cols": ", ".join(
            f"row_number() OVER (PARTITION BY vec_id ORDER BY d_{i}, seed_id) AS rk{i}"
            for i in range(m)
        ),
        "code_cols": ", ".join(
            f"CAST(MAX(CASE WHEN rk{i}=1 THEN seed_id END) AS INT) AS code_{i}" for i in range(m)
        ),
        "md_cols": ", ".join(
            f"MAX(CASE WHEN rk{i}=1 THEN d_{i} END) AS md_{i}" for i in range(m)
        ),
        "qd_cols": ", ".join(f"{sub_dist(i, 'q.embedding')} AS qd_{i}" for i in range(m)),
        "qerr": " + ".join(f"md_{i}" for i in range(m)),
        "adc": " + ".join(
            f"MAX(CASE WHEN l.seed_id = c.code_{i} THEN l.qd_{i} END)" for i in range(m)
        ),
    }


_PQ = _pq_sql_parts()

_CMS_BUCKET = (
    "CAST(('0x' || substr(md5(CAST({j} AS VARCHAR) || ':' || {term}), 1, 8)) AS BIGINT) % {width}"
)


def oracle_sql() -> dict[str, str]:
    from smart_data_lake_spark.functions.similarity import (
        argmin_case_sql,
        bucket_sql,
        cell_distance_sqls,
        random_hyperplanes,
    )

    rev = _REV_SQL
    ann_bucket = bucket_sql("embedding", random_hyperplanes(64, _ANN_PLANES))
    ivf_dists = ", ".join(
        f"{d} AS d{i}" for i, d in enumerate(cell_distance_sqls("embedding", _IVF_CENTROIDS))
    )
    ivf_cell = argmin_case_sql([f"d{i}" for i in range(len(_IVF_CENTROIDS))])
    # PageRank: 5 unrolled power-method iterations in scaled-integer
    # arithmetic (BIGINT // division), mirroring functions/graph.pagerank
    # exactly — per-edge floor, then sum, then integer damping mix.
    pr_iters = []
    prev = "it0"
    for k in range(1, 6):
        pr_iters.append(
            f"""it{k} AS (
              SELECT nodes.node,
                     CAST((15 * 1000000000000) // (100 * nn.n)
                        + (85 * COALESCE(s.insum, CAST(0 AS BIGINT))) // 100 AS BIGINT) AS r
              FROM nodes CROSS JOIN nn
              LEFT JOIN (SELECT e.dst AS node,
                                CAST(SUM((CAST(p.r AS HUGEINT) * e.wgt) // e.outw) AS BIGINT) AS insum
                         FROM e JOIN {prev} p ON p.node = e.src
                         GROUP BY e.dst) s USING (node)
            )"""
        )
        prev = f"it{k}"
    from smart_data_lake_spark.functions.profiling import BENFORD_P

    benford_vals = ", ".join(
        f"({d}, CAST({BENFORD_P[d]!r} AS DOUBLE))" for d in range(1, 10)
    )
    # Holt recursion oracle: literals CAST to DOUBLE (DuckDB parses bare
    # decimal literals as DECIMAL — exact-rational arithmetic would diverge
    # from the Python loop's IEEE doubles), ops parenthesized exactly as
    # analytics.holt_linear_by_group computes them
    _ha, _hb = "CAST(0.3 AS DOUBLE)", "CAST(0.1 AS DOUBLE)"
    _hs, _h1, _hhalf = (
        "CAST(1000000000.0 AS DOUBLE)",
        "CAST(1.0 AS DOUBLE)",
        "CAST(0.5 AS DOUBLE)",
    )
    _lvl_new = (
        f"floor(({_ha} * nxt.x + ({_h1} - {_ha}) * (r.lvl + r.trd)) * {_hs} + {_hhalf}) / {_hs}"
    )
    _trd_new = (
        f"floor(({_hb} * (({_lvl_new}) - r.lvl) + ({_h1} - {_hb}) * r.trd) * {_hs} + {_hhalf}) / {_hs}"
    )
    holt_oracle = f"""
            WITH RECURSIVE base AS (
              SELECT event_type AS g, CAST(value AS DOUBLE) AS x,
                     CAST(row_number() OVER (PARTITION BY event_type
                                             ORDER BY ts, event_id) AS BIGINT) AS rn,
                     CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
              FROM events WHERE value IS NOT NULL
            ),
            r AS (
              SELECT b1.g, CAST(1 AS BIGINT) AS rn, b1.x AS lvl, b2.x - b1.x AS trd
              FROM base b1 JOIN base b2 ON b2.g = b1.g AND b2.rn = 2
              WHERE b1.rn = 1
              UNION ALL
              SELECT nxt.g, nxt.rn, {_lvl_new} AS lvl, {_trd_new} AS trd
              FROM r JOIN base nxt ON nxt.g = r.g AND nxt.rn = r.rn + 1
            )
            SELECT r.g AS event_type, last.n AS n_points, r.lvl AS level, r.trd AS trend,
                   floor((r.lvl + r.trd) * {_hs} + {_hhalf}) / {_hs} AS forecast_1
            FROM r JOIN (SELECT g, n FROM base WHERE rn = 1 AND n >= 2) last
              ON last.g = r.g AND r.rn = last.n
            ORDER BY event_type"""
    hits_oracle_sql = "\n            WITH toksrc AS (\n              SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS w\n              FROM documents\n              WHERE length(trim(lower(text))) > 0\n                AND len(regexp_split_to_array(trim(lower(text)), '\\s+')) >= 2\n            ), pairs AS (\n              SELECT w[CAST(t.i AS INT)] AS src, w[CAST(t.i + 1 AS INT)] AS dst\n              FROM toksrc, LATERAL (SELECT unnest(range(1, len(w))) AS i) t\n            ), e AS (\n              SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS wgt\n              FROM pairs GROUP BY src, dst\n            ), nodes AS (\n              SELECT src AS node FROM e UNION SELECT dst FROM e\n            ), h0 AS (\n              SELECT node, CAST(1000000000000 AS HUGEINT) AS h FROM nodes\n            ), rawa1 AS (\n              SELECT nodes.node, COALESCE(s.raw, CAST(0 AS HUGEINT)) AS raw\n              FROM nodes LEFT JOIN (\n                SELECT e.dst AS node, SUM(CAST(p.h AS HUGEINT) * e.wgt) AS raw\n                FROM e JOIN h0 p ON p.node = e.src GROUP BY e.dst) s USING (node)\n            ), amax1 AS (SELECT MAX(raw) AS mx FROM rawa1),\n            a1 AS (\n              SELECT node, CASE WHEN mx > 0\n                           THEN (raw * 1000000000000) // mx\n                           ELSE CAST(0 AS HUGEINT) END AS a\n              FROM rawa1 CROSS JOIN amax1\n            ), rawh1 AS (\n              SELECT nodes.node, COALESCE(s.raw, CAST(0 AS HUGEINT)) AS raw\n              FROM nodes LEFT JOIN (\n                SELECT e.src AS node, SUM(CAST(p.a AS HUGEINT) * e.wgt) AS raw\n                FROM e JOIN a1 p ON p.node = e.dst GROUP BY e.src) s USING (node)\n            ), hmax1 AS (SELECT MAX(raw) AS mx FROM rawh1),\n            h1 AS (\n              SELECT node, CASE WHEN mx > 0\n                           THEN (raw * 1000000000000) // mx\n                           ELSE CAST(0 AS HUGEINT) END AS h\n              FROM rawh1 CROSS JOIN hmax1\n            ),\n            rawa2 AS (\n              SELECT nodes.node, COALESCE(s.raw, CAST(0 AS HUGEINT)) AS raw\n              FROM nodes LEFT JOIN (\n                SELECT e.dst AS node, SUM(CAST(p.h AS HUGEINT) * e.wgt) AS raw\n                FROM e JOIN h1 p ON p.node = e.src GROUP BY e.dst) s USING (node)\n            ), amax2 AS (SELECT MAX(raw) AS mx FROM rawa2),\n            a2 AS (\n              SELECT node, CASE WHEN mx > 0\n                           THEN (raw * 1000000000000) // mx\n                           ELSE CAST(0 AS HUGEINT) END AS a\n              FROM rawa2 CROSS JOIN amax2\n            ), rawh2 AS (\n              SELECT nodes.node, COALESCE(s.raw, CAST(0 AS HUGEINT)) AS raw\n              FROM nodes LEFT JOIN (\n                SELECT e.src AS node, SUM(CAST(p.a AS HUGEINT) * e.wgt) AS raw\n                FROM e JOIN a2 p ON p.node = e.dst GROUP BY e.src) s USING (node)\n            ), hmax2 AS (SELECT MAX(raw) AS mx FROM rawh2),\n            h2 AS (\n              SELECT node, CASE WHEN mx > 0\n                           THEN (raw * 1000000000000) // mx\n                           ELSE CAST(0 AS HUGEINT) END AS h\n              FROM rawh2 CROSS JOIN hmax2\n            ),\n            rawa3 AS (\n              SELECT nodes.node, COALESCE(s.raw, CAST(0 AS HUGEINT)) AS raw\n              FROM nodes LEFT JOIN (\n                SELECT e.dst AS node, SUM(CAST(p.h AS HUGEINT) * e.wgt) AS raw\n                FROM e JOIN h2 p ON p.node = e.src GROUP BY e.dst) s USING (node)\n            ), amax3 AS (SELECT MAX(raw) AS mx FROM rawa3),\n            a3 AS (\n              SELECT node, CASE WHEN mx > 0\n                           THEN (raw * 1000000000000) // mx\n                           ELSE CAST(0 AS HUGEINT) END AS a\n              FROM rawa3 CROSS JOIN amax3\n            ), rawh3 AS (\n              SELECT nodes.node, COALESCE(s.raw, CAST(0 AS HUGEINT)) AS raw\n              FROM nodes LEFT JOIN (\n                SELECT e.src AS node, SUM(CAST(p.a AS HUGEINT) * e.wgt) AS raw\n                FROM e JOIN a3 p ON p.node = e.dst GROUP BY e.src) s USING (node)\n            ), hmax3 AS (SELECT MAX(raw) AS mx FROM rawh3),\n            h3 AS (\n              SELECT node, CASE WHEN mx > 0\n                           THEN (raw * 1000000000000) // mx\n                           ELSE CAST(0 AS HUGEINT) END AS h\n              FROM rawh3 CROSS JOIN hmax3\n            )\n            SELECT a3.node AS term,\n                   CAST(a3.a AS BIGINT) AS authority_e12,\n                   CAST(h3.h AS BIGINT) AS hub_e12\n            FROM a3 JOIN h3 USING (node)\n            ORDER BY authority_e12 DESC, term LIMIT 20"
    cov_oracle_sql = "\n            WITH tok AS (\n              SELECT source, t.tok FROM documents,\n                LATERAL (SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS tok) t\n              WHERE length(trim(lower(text))) > 0\n            ),\n            counts AS (SELECT source, tok, COUNT(*) AS c FROM tok GROUP BY 1, 2),\n            totals AS (\n              SELECT source, SUM(c) AS total, COUNT(*) AS n_terms FROM counts GROUP BY source\n            ),\n            ranked AS (\n              SELECT source, c,\n                     row_number() OVER (PARTITION BY source ORDER BY c DESC, tok) AS rn\n              FROM counts\n            ),\n            agg AS (\n              SELECT source,\n                     SUM(CASE WHEN rn <= 10 THEN c ELSE 0 END) AS cov10,\n                     SUM(CASE WHEN rn <= 100 THEN c ELSE 0 END) AS cov100\n              FROM ranked WHERE rn <= 100 GROUP BY source\n            ),\n            rows_ AS (\n              SELECT source, 10 AS top_n, cov10 AS covered FROM agg\n              UNION ALL\n              SELECT source, 100, cov100 FROM agg\n            )\n            SELECT r.source, CAST(r.top_n AS INT) AS top_n,\n                   CAST(r.covered AS BIGINT) AS covered_tokens,\n                   CAST(t.total AS BIGINT) AS total_tokens,\n                   CAST(t.n_terms AS BIGINT) AS n_terms,\n                   CAST(r.covered AS DOUBLE) / CAST(t.total AS DOUBLE) AS coverage\n            FROM rows_ r JOIN totals t USING (source)\n            ORDER BY source, top_n"
    pagerank_oracle = r"""
            WITH toksrc AS (
              SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS w
              FROM documents
              WHERE length(trim(lower(text))) > 0
                AND len(regexp_split_to_array(trim(lower(text)), '\s+')) >= 2
            ), pairs AS (
              SELECT w[CAST(t.i AS INT)] AS src, w[CAST(t.i + 1 AS INT)] AS dst
              FROM toksrc, LATERAL (SELECT unnest(range(1, len(w))) AS i) t
            ), edges0 AS (
              SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS wgt
              FROM pairs GROUP BY src, dst
            ), outw AS (
              SELECT src, CAST(SUM(wgt) AS BIGINT) AS outw FROM edges0 GROUP BY src
            ), e AS (
              SELECT edges0.src, edges0.dst, edges0.wgt, outw.outw
              FROM edges0 JOIN outw ON outw.src = edges0.src
            ), nodes AS (
              SELECT src AS node FROM edges0 UNION SELECT dst FROM edges0
            ), nn AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes
            ), it0 AS (
              SELECT node, CAST(1000000000000 // n AS BIGINT) AS r
              FROM nodes CROSS JOIN nn
            ), """ + ",\n            ".join(pr_iters) + f"""
            SELECT node AS term, r AS rank_e12 FROM {prev}
            ORDER BY rank_e12 DESC, term LIMIT 20"""
    # markov stationary: 3 unrolled power-iteration steps in HUGEINT with
    # floor division, mirroring graph.markov_stationary's decimal(38,0) div
    mk_iters = []
    for _i in range(1, 4):
        mk_iters.append(f"""mv{_i} AS (
              SELECT e.dst AS node, SUM((p.x * e.c) // e.t) AS m
              FROM e JOIN x{_i - 1} p ON p.node = e.src GROUP BY e.dst
            ), x{_i} AS (
              SELECT n.node,
                     CAST(COALESCE(mv.m, 0) + COALESCE(k.x, 0) AS HUGEINT) AS x
              FROM nodes n
              LEFT JOIN mv{_i} mv ON mv.node = n.node
              LEFT JOIN (SELECT s.node, p.x FROM sinks s
                         JOIN x{_i - 1} p ON p.node = s.node) k
                ON k.node = n.node
            )""")
    markov_oracle = (
        """
            WITH seqs AS (
              SELECT user_id, list(event_type ORDER BY ts, event_id) AS types
              FROM events GROUP BY user_id
            ), tpairs AS (
              SELECT types[CAST(t.i + 1 AS INT)] AS src,
                     types[CAST(t.i + 2 AS INT)] AS dst
              FROM seqs, LATERAL (SELECT unnest(range(0, len(types) - 1)) AS i) t
              WHERE len(types) >= 2
            ), e0 AS (
              -- NULL is not a state (mirrors markov_stationary's explicit
              -- NULL-endpoint drop; also keeps NOT IN below NULL-safe)
              SELECT src, dst, CAST(COUNT(*) AS HUGEINT) AS c FROM tpairs
              WHERE src IS NOT NULL AND dst IS NOT NULL GROUP BY 1, 2
            ), tot AS (
              SELECT src, CAST(SUM(c) AS HUGEINT) AS t FROM e0 GROUP BY src
            ), e AS (
              SELECT e0.src, e0.dst, e0.c, tot.t FROM e0 JOIN tot USING (src)
            ), nodes AS (
              SELECT src AS node FROM e0 UNION SELECT dst FROM e0
            ), sinks AS (
              SELECT node FROM nodes WHERE node NOT IN (SELECT src FROM e0)
            ), x0 AS (
              SELECT node, CAST(1000000000000 AS HUGEINT) AS x FROM nodes
            ), """
        + ",\n            ".join(mk_iters)
        + """
            SELECT node, CAST(x AS BIGINT) AS stationary_e12
            FROM x3 ORDER BY node"""
    )
    return {
        "winnow_fingerprints_docs": r"""
            WITH toksrc AS (
              SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS w
              FROM documents
              WHERE length(trim(lower(text))) > 0
                AND len(regexp_split_to_array(trim(lower(text)), '\s+')) >= 4
            ), grams AS (
              SELECT doc_id, t.i AS pos,
                     md5(array_to_string(list_transform(range(1, 5),
                                         j -> w[CAST(t.i + j AS INT)]), ' ')) AS gh
              FROM toksrc, LATERAL (SELECT unnest(range(0, len(w) - 3)) AS i) t
            ), winmin AS (
              SELECT doc_id,
                     min(gh) OVER (PARTITION BY doc_id ORDER BY pos
                                   ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) AS fp
              FROM grams
            ), fps AS (SELECT DISTINCT doc_id, fp FROM winmin),
            share AS (SELECT fp, COUNT(*) AS n_docs FROM fps GROUP BY fp)
            SELECT f.doc_id, COUNT(*) AS n_fingerprints,
                   CAST(SUM(CASE WHEN s.n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
                   (CASE WHEN abs(SUM(CASE WHEN s.n_docs > 1 THEN 1 ELSE 0 END) * 1.0 / COUNT(*)) < 4.61168601842738770e+12 THEN (CASE WHEN (SUM(CASE WHEN s.n_docs > 1 THEN 1 ELSE 0 END) * 1.0 / COUNT(*)) >= 0 THEN floor((SUM(CASE WHEN s.n_docs > 1 THEN 1 ELSE 0 END) * 1.0 / COUNT(*)) * 1000000.0 + 0.5) / 1000000.0 ELSE -(floor(-(SUM(CASE WHEN s.n_docs > 1 THEN 1 ELSE 0 END) * 1.0 / COUNT(*)) * 1000000.0 + 0.5) / 1000000.0) END) ELSE (SUM(CASE WHEN s.n_docs > 1 THEN 1 ELSE 0 END) * 1.0 / COUNT(*)) END) AS shared_frac
            FROM fps f JOIN share s USING (fp)
            GROUP BY f.doc_id ORDER BY f.doc_id""",
        "incremental_dedup_new_source": """
            WITH b AS (
              SELECT doc_id, text, md5(trim(lower(text))) AS h
              FROM documents WHERE source = 'src0'
            ), c AS (
              SELECT DISTINCT md5(trim(lower(text))) AS h
              FROM documents WHERE source <> 'src0'
            ), fresh AS (
              SELECT b.* FROM b WHERE NOT EXISTS (SELECT 1 FROM c WHERE c.h = b.h)
            ), firsts AS (
              SELECT h, MIN(doc_id) AS doc_id FROM fresh GROUP BY h
            )
            SELECT f.doc_id, length(f.text) AS n_chars_kept
            FROM fresh f JOIN firsts USING (h, doc_id)
            ORDER BY f.doc_id""",
        "range_frame_trailing_value": f"""
            -- r11 sweep: grid-quantized input cast; r12: exact decimal sum
            -- rendered as double via the string round-trip (dec_double
            -- class; DECIMAL finals are driver-hash-divergent)
            SELECT event_id, user_id,
                   {_dd(f'SUM(CAST({_gq("value", 6)} AS DECIMAL(18,6))) OVER w')} AS trailing_1h_sum,
                   COUNT(*) OVER w AS trailing_1h_n
            FROM events WHERE user_id % 50 = 0
            WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                         RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
            ORDER BY event_id""",
        "grouping_sets_sales": f"""
            -- r11 sweep: grid-quantized input cast; r12: exact decimal sum
            -- rendered as double via the string round-trip (dec_double
            -- class; DECIMAL finals are driver-hash-divergent)
            SELECT o_orderstatus, o_orderpriority,
                   CAST(grouping(o_orderstatus) AS INT) AS g_status,
                   CAST(grouping(o_orderpriority) AS INT) AS g_prio,
                   COUNT(*) AS n_orders,
                   {_dd(f'SUM(CAST({_gq("o_totalprice", 2)} AS DECIMAL(18,2)))')} AS total_price
            FROM orders
            GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                                    (o_orderstatus, o_orderpriority), ())
            ORDER BY g_status, g_prio, o_orderstatus, o_orderpriority""",
        "user_top_event": """
            WITH counts AS (
              SELECT user_id, event_type, COUNT(*) AS cnt
              FROM events GROUP BY user_id, event_type
            )
            SELECT user_id, cnt AS top_cnt, event_type AS top_event
            FROM counts
            QUALIFY row_number() OVER (PARTITION BY user_id
                                       ORDER BY cnt DESC, event_type DESC) = 1
            ORDER BY user_id""",
        "mad_outliers_events": f"""
            -- r11 sweep: both medians via EXPLICIT order statistics
            -- (v_lo + (v_hi - v_lo) * frac, frac in {{0, 0.5}}), lockstep
            -- with profiling.mad_outliers — engine percentile libraries
            -- interpolate through different expression shapes
            WITH ranked AS (
              SELECT event_type, value,
                     row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
                     COUNT(*) OVER (PARTITION BY event_type) AS n
              FROM events WHERE value IS NOT NULL
            ), med AS (
              SELECT event_type, {_interp_sql("value", 1, 2)} AS med
              FROM ranked GROUP BY event_type
            ), dev AS (
              SELECT e.event_type, e.value, abs(e.value - m.med) AS adev, m.med
              FROM events e LEFT JOIN med m USING (event_type)
            ), ranked2 AS (
              SELECT event_type, adev,
                     row_number() OVER (PARTITION BY event_type ORDER BY adev) AS rn,
                     COUNT(*) OVER (PARTITION BY event_type) AS n
              FROM dev WHERE adev IS NOT NULL
            ), mads AS (
              SELECT event_type, {_interp_sql("adev", 1, 2)} AS mad
              FROM ranked2 GROUP BY event_type
            )
            SELECT d.event_type, COUNT(*) AS n,
                   {_gq("MAX(d.med)", 6)} AS median_value,
                   {_gq("MAX(m.mad)", 6)} AS mad,
                   CAST(SUM(CASE WHEN m.mad > 0 AND d.adev > 3 * m.mad
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
            FROM dev d LEFT JOIN mads m USING (event_type)
            GROUP BY d.event_type ORDER BY d.event_type""",
        "top_bigrams_corpus": r"""
            WITH toksrc AS (
              SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS w
              FROM documents
              WHERE length(trim(lower(text))) > 0
                AND len(regexp_split_to_array(trim(lower(text)), '\s+')) >= 2
            ), grams AS (
              SELECT DISTINCT doc_id,
                     array_to_string(list_transform(range(1, 3),
                                     j -> w[CAST(t.i + j AS INT)]), ' ') AS bigram
              FROM toksrc, LATERAL (SELECT unnest(range(0, len(w) - 1)) AS i) t
            )
            SELECT bigram, COUNT(*) AS n_docs
            FROM grams GROUP BY bigram
            ORDER BY n_docs DESC, bigram LIMIT 20""",
        "hybrid_search_rrf": f"""
            WITH base AS (
              SELECT doc_id,
                     {_NTOK} AS dl,
                     len(list_filter({_TOKS}, x -> x = 'merge')) AS tf0,
                     len(list_filter({_TOKS}, x -> x = 'stream')) AS tf1,
                     len(list_filter({_TOKS}, x -> x = 'window')) AS tf2
              FROM documents
            ),
            st AS (
              SELECT COUNT(*) AS n, CAST(SUM(dl) AS BIGINT) AS dls,
                     SUM(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
                     SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
                     SUM(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2
              FROM base
            ),
            sc AS (
              SELECT doc_id,
                ln(1.0 + CAST(n - df0 + 0.5 AS DOUBLE) / CAST(df0 + 0.5 AS DOUBLE))
                  * (tf0 * CAST(2.2 AS DOUBLE))
                  / (tf0 + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * (dl / (CAST(dls AS DOUBLE) / n))))
                + ln(1.0 + CAST(n - df1 + 0.5 AS DOUBLE) / CAST(df1 + 0.5 AS DOUBLE))
                  * (tf1 * CAST(2.2 AS DOUBLE))
                  / (tf1 + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * (dl / (CAST(dls AS DOUBLE) / n))))
                + ln(1.0 + CAST(n - df2 + 0.5 AS DOUBLE) / CAST(df2 + 0.5 AS DOUBLE))
                  * (tf2 * CAST(2.2 AS DOUBLE))
                  / (tf2 + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * (dl / (CAST(dls AS DOUBLE) / n))))
                AS raw_score,
                (CASE WHEN tf0 > 0 THEN 1 ELSE 0 END + CASE WHEN tf1 > 0 THEN 1 ELSE 0 END
                 + CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS n_matched
              FROM base, st
            ),
            bm_top AS (
              SELECT doc_id, {_gq("raw_score", 6)} AS score
              FROM sc WHERE n_matched > 0
              ORDER BY score DESC, doc_id LIMIT 50
            ),
            r1 AS (
              SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rank FROM bm_top
            ),
            r2 AS (
              SELECT doc_id, rank FROM (
                SELECT doc_id, row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rank
                FROM documents
              ) WHERE rank <= 50
            ),
            contrib AS (
              SELECT doc_id, CAST({_gq("1.0 / (60 + rank)", 9)} AS DECIMAL(12,9)) AS c FROM r1
              UNION ALL
              SELECT doc_id, CAST({_gq("1.0 / (60 + rank)", 9)} AS DECIMAL(12,9)) AS c FROM r2
            )
            SELECT doc_id, CAST(SUM(c) AS DOUBLE) AS rrf_score, COUNT(*) AS n_rankings
            FROM contrib GROUP BY doc_id
            ORDER BY rrf_score DESC, doc_id LIMIT 20""",
        "token_budget_sample_docs": f"""
            WITH base AS (
              SELECT doc_id,
                     md5('budget:' || CAST(doc_id AS VARCHAR)) AS h,
                     CAST({_NTOK} AS BIGINT) AS n_tokens
              FROM documents
            ),
            cum AS (
              SELECT doc_id, n_tokens,
                     CAST(SUM(n_tokens) OVER (ORDER BY h, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
              FROM base
            )
            SELECT doc_id, n_tokens, cum_tokens
            FROM cum WHERE cum_tokens - n_tokens < 15000
            ORDER BY cum_tokens""",
        "user_event_paths": """
            WITH seqs AS (
              SELECT user_id, list(event_type ORDER BY ts, event_id) AS types
              FROM events GROUP BY user_id
            ), grams AS (
              SELECT array_to_string(list_transform(range(1, 4),
                                     j -> types[CAST(t.i + j AS INT)]), '>') AS path
              FROM seqs, LATERAL (SELECT unnest(range(0, len(types) - 2)) AS i) t
              WHERE len(types) >= 3
            )
            SELECT path, COUNT(*) AS n_occurrences
            FROM grams GROUP BY path
            ORDER BY n_occurrences DESC, path LIMIT 15""",
        "pmi_collocations_corpus": f"""
            WITH toks AS (
              SELECT doc_id, {_TOKS} AS w FROM documents
              WHERE length(trim(lower(text))) > 0 AND len({_TOKS}) >= 2
            ),
            uni AS (
              SELECT t.term, COUNT(*) AS c1
              FROM (SELECT unnest(w) AS term FROM toks) t GROUP BY 1
            ),
            bi AS (
              SELECT w[i] AS w1, w[i+1] AS w2, COUNT(*) AS c12
              FROM toks, LATERAL (SELECT unnest(range(1, len(w))) AS i) x
              GROUP BY 1, 2 HAVING COUNT(*) >= 5
            ),
            nu AS (SELECT CAST(SUM(c1) AS DOUBLE) AS total_uni FROM uni),
            nb AS (SELECT CAST(SUM(len(w) - 1) AS DOUBLE) AS total_bi FROM toks)
            -- r11 sweep: grid form, lockstep with grid_round
            SELECT w1 || ' ' || w2 AS collocation, c12,
                   {_gq("ln((c12 / total_bi) / ((ua.c1 / total_uni) * (ub.c1 / total_uni)))", 6)} AS pmi
            FROM bi JOIN uni ua ON ua.term = bi.w1
                    JOIN uni ub ON ub.term = bi.w2, nu, nb
            ORDER BY pmi DESC, collocation LIMIT 25""",
        "value_quartiles_by_type": """
            -- explicit order-statistic interpolation (NOT quantile_cont):
            -- mirrors exact_quartiles' engine-exact formulation — for
            -- quartile k, lo = ((n-1)*k) div 4 (1-based +1), frac =
            -- ((n-1)*k mod 4)/4 (exact binary fraction), result =
            -- v_lo + (v_hi - v_lo)*frac, one fixed IEEE expression
            WITH ranked AS (
              SELECT event_type, value,
                     row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
                     COUNT(*) OVER (PARTITION BY event_type) AS n
              FROM events WHERE value IS NOT NULL
            ),
            q AS (
              SELECT event_type, k,
                     MAX(CASE WHEN rn = ((n - 1) * k) // 4 + 1 THEN value END) AS vlo,
                     MAX(CASE WHEN rn = least(((n - 1) * k) // 4 + 2, n) THEN value END) AS vhi,
                     MAX(CASE WHEN rn = 1
                         THEN CAST(((n - 1) * k) % 4 AS DOUBLE) / 4.0 END) AS fr,
                     MAX(n) AS n
              FROM ranked CROSS JOIN (VALUES (1), (2), (3)) ks(k)
              GROUP BY event_type, k
            ),
            wide AS (
              SELECT event_type, MAX(n) AS n,
                     -- pure-double grid round, identical IEEE expression in
                     -- Spark and DuckDB (engine round() differs at half-grid
                     -- boundaries); r10: sign-symmetric form, lockstep with
                     -- grid_round
                     MAX(CASE WHEN k = 1
                         THEN """ + _gq("vlo + (vhi - vlo) * fr", 6) + """ END) AS q1,
                     MAX(CASE WHEN k = 2
                         THEN """ + _gq("vlo + (vhi - vlo) * fr", 6) + """ END) AS median,
                     MAX(CASE WHEN k = 3
                         THEN """ + _gq("vlo + (vhi - vlo) * fr", 6) + """ END) AS q3
              FROM q GROUP BY event_type
            )
            SELECT event_type, CAST(n AS BIGINT) AS n, q1, median, q3
            FROM wide ORDER BY event_type""",
        "semantic_dedup_embeddings": f"""
            WITH dists AS (
              SELECT vec_id, embedding, {ivf_dists} FROM embeddings
            ),
            cells AS (
              SELECT vec_id, embedding, {ivf_cell} AS cell FROM dists
            ),
            rem AS (
              SELECT DISTINCT b.cell, b.vec_id
              FROM cells a JOIN cells b ON a.cell = b.cell AND a.vec_id < b.vec_id
              WHERE {_cos_sql('a.embedding', 'b.embedding')} >= 0.2
            ),
            remc AS (SELECT cell, COUNT(*) AS n_removed FROM rem GROUP BY cell),
            tot AS (SELECT cell, COUNT(*) AS n_vectors FROM cells GROUP BY cell)
            SELECT t.cell, t.n_vectors,
                   COALESCE(r.n_removed, 0) AS n_removed,
                   t.n_vectors - COALESCE(r.n_removed, 0) AS n_kept
            FROM tot t LEFT JOIN remc r USING (cell) ORDER BY cell""",
        "kmv_distinct_users": """
            WITH uniq AS (SELECT DISTINCT event_type, user_id FROM events),
            hashed AS (
              SELECT event_type, user_id,
                     CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT)
                       / CAST(4294967296 AS DOUBLE) AS h
              FROM uniq
            ),
            ranked AS (
              SELECT event_type, h,
                     row_number() OVER (PARTITION BY event_type ORDER BY h, user_id) AS rk
              FROM hashed
            ),
            per AS (
              SELECT event_type, COUNT(*) AS n_exact,
                     MAX(CASE WHEN rk = 64 THEN h END) AS hk
              FROM ranked GROUP BY event_type
            )
            , per2 AS (
              SELECT event_type, n_exact,
                     (CASE WHEN abs(CASE WHEN n_exact < 64 THEN CAST(n_exact AS DOUBLE) ELSE 63 / hk END) < 4.61168601842738790e+18 THEN (CASE WHEN (CASE WHEN n_exact < 64 THEN CAST(n_exact AS DOUBLE) ELSE 63 / hk END) >= 0 THEN floor((CASE WHEN n_exact < 64 THEN CAST(n_exact AS DOUBLE) ELSE 63 / hk END) * 1.0 + 0.5) / 1.0 ELSE -(floor(-(CASE WHEN n_exact < 64 THEN CAST(n_exact AS DOUBLE) ELSE 63 / hk END) * 1.0 + 0.5) / 1.0) END) ELSE (CASE WHEN n_exact < 64 THEN CAST(n_exact AS DOUBLE) ELSE 63 / hk END) END) AS est_r
              FROM per
            )
            -- r10 sweep: the estimate and relative error are RATIONALS —
            -- grid form, lockstep with grid_round
            SELECT event_type, n_exact,
                   CAST(est_r AS BIGINT) AS kmv_estimate,
                   (CASE WHEN abs((est_r - n_exact) / n_exact) < 4.61168601842738812e+14 THEN (CASE WHEN ((est_r - n_exact) / n_exact) >= 0 THEN floor(((est_r - n_exact) / n_exact) * 10000.0 + 0.5) / 10000.0 ELSE -(floor(-((est_r - n_exact) / n_exact) * 10000.0 + 0.5) / 10000.0) END) ELSE ((est_r - n_exact) / n_exact) END) AS rel_error
            FROM per2 ORDER BY event_type""",
        "temperature_mix_sources": f"""
            WITH per AS (
              SELECT source, COUNT(*) AS n_docs, CAST(SUM({_NTOK}) AS BIGINT) AS n_tokens
              FROM documents GROUP BY source
            ),
            t AS (SELECT SUM(pow(CAST(n_tokens AS DOUBLE), 0.5)) AS tw FROM per)
            SELECT source, n_docs, n_tokens,
                   (CASE WHEN abs(pow(CAST(n_tokens AS DOUBLE), 0.5) / tw) < 4.61168601842738770e+12 THEN (CASE WHEN (pow(CAST(n_tokens AS DOUBLE), 0.5) / tw) >= 0 THEN floor((pow(CAST(n_tokens AS DOUBLE), 0.5) / tw) * 1000000.0 + 0.5) / 1000000.0 ELSE -(floor(-(pow(CAST(n_tokens AS DOUBLE), 0.5) / tw) * 1000000.0 + 0.5) / 1000000.0) END) ELSE (pow(CAST(n_tokens AS DOUBLE), 0.5) / tw) END) AS mix_weight,
                   (CASE WHEN abs(pow(CAST(n_tokens AS DOUBLE), 0.5) / tw * 100000) < 4.61168601842738800e+15 THEN (CASE WHEN (pow(CAST(n_tokens AS DOUBLE), 0.5) / tw * 100000) >= 0 THEN floor((pow(CAST(n_tokens AS DOUBLE), 0.5) / tw * 100000) * 1000.0 + 0.5) / 1000.0 ELSE -(floor(-(pow(CAST(n_tokens AS DOUBLE), 0.5) / tw * 100000) * 1000.0 + 0.5) / 1000.0) END) ELSE (pow(CAST(n_tokens AS DOUBLE), 0.5) / tw * 100000) END) AS budget_tokens
            FROM per, t ORDER BY source""",
        "ewma_value_by_type": """
            WITH seqs AS (
              SELECT event_type, list(CAST(value AS DOUBLE) ORDER BY ts, event_id) AS vals
              FROM events GROUP BY event_type
            )
            -- r11 sweep: grid form, lockstep with grid_round
            SELECT event_type, len(vals) AS n_obs,
                   """ + _gq("list_reduce(vals, (acc, x) -> 0.3 * x + 0.7 * acc)", 6) + """ AS ewma
            FROM seqs ORDER BY event_type""",
        "interarrival_stats_by_type": """
            WITH g AS (
              SELECT event_type,
                     date_diff('microsecond',
                               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                               ts) AS gap_us
              FROM events
            )
            -- int/int RATIONALS — grid form, lockstep with grid_round (r10)
            SELECT event_type, COUNT(*) AS n_gaps,
                   """ + _gq("CAST(SUM(gap_us) AS DOUBLE) / COUNT(*) / 1e6", 6) + """ AS avg_gap_sec,
                   """ + _gq("CAST(MAX(gap_us) AS DOUBLE) / 1e6", 6) + """ AS max_gap_sec
            FROM g WHERE gap_us IS NOT NULL
            GROUP BY event_type ORDER BY event_type""",
        "tfidf_top_terms_per_source": f"""
            WITH toks AS (
              SELECT source, doc_id, unnest({_TOKS}) AS term
              FROM documents WHERE length(trim(lower(text))) > 0
            ),
            tf AS (SELECT source, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
            dfq AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
            n AS (SELECT COUNT(*) AS n_docs FROM documents),
            scored AS (
              SELECT source, term, tf, df,
                     {_gq("tf * (ln((CAST(n_docs AS DOUBLE) + 1) / (df + 1)) + 1)", 6)} AS tfidf
              FROM tf JOIN dfq USING (term), n
            ),
            ranked AS (
              SELECT *, row_number() OVER (PARTITION BY source
                                           ORDER BY tfidf DESC, term) AS term_rank
              FROM scored
            )
            SELECT source, term_rank, term, tf, df, tfidf
            FROM ranked WHERE term_rank <= 5 ORDER BY source, term_rank""",
        "token_entropy_docs": f"""
            WITH toks AS (
              SELECT doc_id, unnest({_TOKS}) AS tok
              FROM documents WHERE length(trim(lower(text))) > 0
            ),
            c AS (SELECT doc_id, tok, COUNT(*) AS n FROM toks GROUP BY 1, 2)
            -- r10 sweep: each n·ln(n) term is grid-quantized to 1e-9 and
            -- summed as exact DECIMAL (the old raw-double sum was
            -- order-sensitive), final on the 1e-6 grid — both levels via
            -- the runtime _gq twin (guards included), lockstep with
            -- functions/quality.token_entropy
            SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_tokens, COUNT(*) AS n_unique,
                   {_gq("ln(CAST(SUM(n) AS DOUBLE)) - CAST(SUM(CAST(" + _gq("CAST(n AS DOUBLE) * ln(CAST(n AS DOUBLE))", 9) + " AS DECIMAL(28,9))) AS DOUBLE) / CAST(SUM(n) AS DOUBLE)", 6)} AS entropy_nats
            FROM c GROUP BY doc_id ORDER BY doc_id""",
        "containment_pairs_docs": f"""
            WITH {_SHINGLE5_CTE},
            sizes AS (SELECT doc_id, COUNT(*) AS sz FROM g5 GROUP BY 1),
            inter AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
              FROM g5 a JOIN g5 b USING (shingle)
              WHERE a.doc_id <> b.doc_id
              GROUP BY 1, 2
            )
            SELECT doc_a, doc_b, n_shared,
                   (CASE WHEN abs(CAST(n_shared AS DOUBLE) / sz) < 4.61168601842738770e+12 THEN (CASE WHEN (CAST(n_shared AS DOUBLE) / sz) >= 0 THEN floor((CAST(n_shared AS DOUBLE) / sz) * 1000000.0 + 0.5) / 1000000.0 ELSE -(floor(-(CAST(n_shared AS DOUBLE) / sz) * 1000000.0 + 0.5) / 1000000.0) END) ELSE (CAST(n_shared AS DOUBLE) / sz) END) AS containment
            FROM inter JOIN sizes ON sizes.doc_id = inter.doc_a
            WHERE (CASE WHEN abs(CAST(n_shared AS DOUBLE) / sz) < 4.61168601842738770e+12 THEN (CASE WHEN (CAST(n_shared AS DOUBLE) / sz) >= 0 THEN floor((CAST(n_shared AS DOUBLE) / sz) * 1000000.0 + 0.5) / 1000000.0 ELSE -(floor(-(CAST(n_shared AS DOUBLE) / sz) * 1000000.0 + 0.5) / 1000000.0) END) ELSE (CAST(n_shared AS DOUBLE) / sz) END) >= 0.5
            ORDER BY doc_a, doc_b""",
        "cross_source_dup_audit": rf"""
            WITH {_SHINGLE5_CTE},
            ssh AS (
              SELECT DISTINCT d.source, g5.shingle
              FROM g5 JOIN documents d USING (doc_id)
            ),
            shared_sh AS (
              SELECT a.source AS source_a, b.source AS source_b,
                     COUNT(*) AS n_shared_shingles
              FROM ssh a JOIN ssh b USING (shingle)
              WHERE a.source < b.source GROUP BY 1, 2
            ),
            fp AS (
              SELECT DISTINCT source,
                     md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS f
              FROM documents
            ),
            shared_fp AS (
              SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS n_fp
              FROM fp a JOIN fp b USING (f)
              WHERE a.source < b.source GROUP BY 1, 2
            )
            SELECT s.source_a, s.source_b, s.n_shared_shingles,
                   COALESCE(f.n_fp, 0) AS n_shared_fingerprints
            FROM shared_sh s LEFT JOIN shared_fp f USING (source_a, source_b)
            ORDER BY source_a, source_b""",
        "value_histogram_by_type": """
            WITH b AS (
              SELECT event_type, (CASE WHEN abs(min(value)) < 4.61168601842738770e+12 THEN (CASE WHEN (min(value)) >= 0 THEN floor((min(value)) * 1000000.0 + 0.5) / 1000000.0 ELSE -(floor(-(min(value)) * 1000000.0 + 0.5) / 1000000.0) END) ELSE (min(value)) END) AS lo, (CASE WHEN abs(max(value)) < 4.61168601842738770e+12 THEN (CASE WHEN (max(value)) >= 0 THEN floor((max(value)) * 1000000.0 + 0.5) / 1000000.0 ELSE -(floor(-(max(value)) * 1000000.0 + 0.5) / 1000000.0) END) ELSE (max(value)) END) AS hi
              FROM events GROUP BY event_type
            ), x AS (
              SELECT e.event_type,
                     CASE WHEN b.hi = b.lo THEN 0
                          ELSE least(9, CAST(floor(((CASE WHEN abs(e.value) < 4.61168601842738770e+12 THEN (CASE WHEN (e.value) >= 0 THEN floor((e.value) * 1000000.0 + 0.5) / 1000000.0 ELSE -(floor(-(e.value) * 1000000.0 + 0.5) / 1000000.0) END) ELSE (e.value) END) - b.lo) * 10 / (b.hi - b.lo)) AS INT))
                     END AS bucket,
                     b.lo, b.hi
              FROM events e JOIN b USING (event_type)
            )
            SELECT event_type, bucket, COUNT(*) AS n,
                   (CASE WHEN abs(min(lo) + bucket * (min(hi) - min(lo)) / 10) < 4.61168601842738770e+12 THEN (CASE WHEN (min(lo) + bucket * (min(hi) - min(lo)) / 10) >= 0 THEN floor((min(lo) + bucket * (min(hi) - min(lo)) / 10) * 1000000.0 + 0.5) / 1000000.0 ELSE -(floor(-(min(lo) + bucket * (min(hi) - min(lo)) / 10) * 1000000.0 + 0.5) / 1000000.0) END) ELSE (min(lo) + bucket * (min(hi) - min(lo)) / 10) END) AS bucket_lo
            FROM x GROUP BY event_type, bucket
            ORDER BY event_type, bucket""",
        "top_docs_per_source": """
            SELECT source, doc_id, n_chars, rk FROM (
              SELECT source, doc_id, n_chars,
                     row_number() OVER (PARTITION BY source
                                        ORDER BY n_chars DESC, doc_id) AS rk
              FROM documents
            ) WHERE rk <= 3 ORDER BY source, rk""",
        "event_value_histogram": """
            WITH b AS (
              SELECT (CASE WHEN abs(min(value)) < 4.61168601842738770e+12 THEN (CASE WHEN (min(value)) >= 0 THEN floor((min(value)) * 1000000.0 + 0.5) / 1000000.0 ELSE -(floor(-(min(value)) * 1000000.0 + 0.5) / 1000000.0) END) ELSE (min(value)) END) AS lo, (CASE WHEN abs(max(value)) < 4.61168601842738770e+12 THEN (CASE WHEN (max(value)) >= 0 THEN floor((max(value)) * 1000000.0 + 0.5) / 1000000.0 ELSE -(floor(-(max(value)) * 1000000.0 + 0.5) / 1000000.0) END) ELSE (max(value)) END) AS hi FROM events
            ), x AS (
              SELECT least(19, CAST(floor(((CASE WHEN abs(value) < 4.61168601842738770e+12 THEN (CASE WHEN (value) >= 0 THEN floor((value) * 1000000.0 + 0.5) / 1000000.0 ELSE -(floor(-(value) * 1000000.0 + 0.5) / 1000000.0) END) ELSE (value) END) - lo) * 20 / (hi - lo)) AS INT)) AS bucket,
                     lo, hi
              FROM events, b
            )
            SELECT bucket, COUNT(*) AS n,
                   (CASE WHEN abs(min(lo) + bucket * (min(hi) - min(lo)) / 20) < 4.61168601842738770e+12 THEN (CASE WHEN (min(lo) + bucket * (min(hi) - min(lo)) / 20) >= 0 THEN floor((min(lo) + bucket * (min(hi) - min(lo)) / 20) * 1000000.0 + 0.5) / 1000000.0 ELSE -(floor(-(min(lo) + bucket * (min(hi) - min(lo)) / 20) * 1000000.0 + 0.5) / 1000000.0) END) ELSE (min(lo) + bucket * (min(hi) - min(lo)) / 20) END) AS bucket_lo
            FROM x GROUP BY bucket ORDER BY bucket""",
        "lineitem_correlations": f"""
            -- grid-quantized input-side rounds + rational final (r10/r11
            -- sweep), lockstep with profiling.pairwise_correlations.
            -- DECIMAL(28,6) HERE vs (18,6) on the Spark side — deliberate
            -- asymmetry: each engine needs the width that makes ITS
            -- product exact. DuckDB stores DECIMAL(<=18) in int64 and
            -- OVERFLOWS multiplying two of them (measured: 68423.46^2),
            -- while (28,6) takes the int128 path -> (38,12) exact; Spark's
            -- (18,6)x(18,6) -> (37,12) exact, but its (28,6) product
            -- would CLAMP scale. Same VALUES either way in contract
            -- (|x| < 1e12, see pairwise_correlations check_bound)
            WITH q AS (
              SELECT CAST({_gq("l_quantity", 6)} AS DECIMAL(28,6)) AS a,
                     CAST({_gq("l_extendedprice", 6)} AS DECIMAL(28,6)) AS b,
                     CAST({_gq("l_discount", 6)} AS DECIMAL(28,6)) AS c,
                     CAST({_gq("l_tax", 6)} AS DECIMAL(28,6)) AS d
              FROM lineitem
            ), s AS (
              SELECT COUNT(*) AS n,
                     SUM(a) AS sa, SUM(b) AS sb, SUM(c) AS sc, SUM(d) AS sd,
                     SUM(a*a) AS ssa, SUM(b*b) AS ssb, SUM(c*c) AS ssc, SUM(d*d) AS ssd,
                     SUM(a*b) AS sab, SUM(a*c) AS sac, SUM(a*d) AS sad,
                     SUM(b*c) AS sbc, SUM(b*d) AS sbd, SUM(c*d) AS scd
              FROM q
            ), pairs AS (
              SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b, sab AS sp, sa AS s1, sb AS s2, ssa AS q1, ssb AS q2, n FROM s
              UNION ALL SELECT 'l_quantity', 'l_discount', sac, sa, sc, ssa, ssc, n FROM s
              UNION ALL SELECT 'l_quantity', 'l_tax', sad, sa, sd, ssa, ssd, n FROM s
              UNION ALL SELECT 'l_extendedprice', 'l_discount', sbc, sb, sc, ssb, ssc, n FROM s
              UNION ALL SELECT 'l_extendedprice', 'l_tax', sbd, sb, sd, ssb, ssd, n FROM s
              UNION ALL SELECT 'l_discount', 'l_tax', scd, sc, sd, ssc, ssd, n FROM s
            )
            , g AS (
              SELECT col_a, col_b, n,
                     CAST(n AS DOUBLE) * CAST(sp AS DOUBLE)
                       - CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE) AS num,
                     CAST(n AS DOUBLE) * CAST(q1 AS DOUBLE)
                       - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) AS ra,
                     CAST(n AS DOUBLE) * CAST(q2 AS DOUBLE)
                       - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) AS rb
              FROM pairs
            )
            -- radicands guarded BEFORE sqrt (lockstep with the Spark
            -- side): a constant series cancels to a tiny negative where
            -- sqrt hard-errors here and Spark's NaN > 0 is TRUE
            SELECT col_a, col_b,
                   CASE WHEN ra > 0 AND rb > 0
                        THEN {_gq("num / (sqrt(ra) * sqrt(rb))", 6)}
                   END AS corr,
                   n
            FROM g ORDER BY col_a, col_b""",
        "event_transitions": """
            WITH seqs AS (
              SELECT user_id, list(event_type ORDER BY ts, event_id) AS types
              FROM events GROUP BY user_id
            ), pairs AS (
              SELECT types[CAST(t.i + 1 AS INT)] AS from_type,
                     types[CAST(t.i + 2 AS INT)] AS to_type
              FROM seqs, LATERAL (SELECT unnest(range(0, len(types) - 1)) AS i) t
              WHERE len(types) >= 2
            ), counted AS (
              SELECT from_type, to_type, COUNT(*) AS n_transitions
              FROM pairs GROUP BY from_type, to_type
            ), totals AS (
              SELECT from_type, SUM(n_transitions) AS total FROM counted GROUP BY from_type
            )
            SELECT c.from_type, c.to_type, c.n_transitions,
                   -- int/int RATIONAL — grid form, lockstep with grid_round
                   """ + _gq("c.n_transitions * 1.0 / t.total", 6) + """ AS p_transition
            FROM counted c JOIN totals t USING (from_type)
            ORDER BY c.from_type, c.to_type""",
        "normalized_doc_scores": """
            SELECT doc_id, source, n_chars,
                   (CASE WHEN abs(percent_rank() OVER (PARTITION BY source ORDER BY n_chars)) < 4.61168601842738770e+12 THEN (CASE WHEN (percent_rank() OVER (PARTITION BY source ORDER BY n_chars)) >= 0 THEN floor((percent_rank() OVER (PARTITION BY source ORDER BY n_chars)) * 1000000.0 + 0.5) / 1000000.0 ELSE -(floor(-(percent_rank() OVER (PARTITION BY source ORDER BY n_chars)) * 1000000.0 + 0.5) / 1000000.0) END) ELSE (percent_rank() OVER (PARTITION BY source ORDER BY n_chars)) END)
                     AS norm_score
            FROM documents WHERE source IN ('src0', 'src1', 'src2')
            ORDER BY doc_id""",
        "rolling_active_users_7d": """
            WITH ud AS (
              SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
            ), daily AS (
              SELECT day, COUNT(*) AS n_active FROM ud GROUP BY day
            ), fanned AS (
              SELECT DISTINCT user_id, day + CAST(t.i AS INT) AS window_day
              FROM ud, LATERAL (SELECT unnest(range(0, 7)) AS i) t
            ), rolling AS (
              SELECT window_day, COUNT(*) AS n_active_rolling
              FROM fanned GROUP BY window_day
            )
            SELECT d.day, d.n_active, r.n_active_rolling
            FROM daily d JOIN rolling r ON d.day = r.window_day
            ORDER BY d.day""",
        "mix_sources_audit": f"""
            WITH shares(source, share) AS (VALUES ('src0', 0.5), ('src1', 0.3), ('src2', 0.2)),
            base AS (
              SELECT source, doc_id, CAST({_NTOK} AS BIGINT) AS tok
              FROM documents WHERE source IN ('src0', 'src1', 'src2')
            ),
            per AS (
              SELECT b.source, SUM(tok) AS tokens, MIN(s.share) AS share
              FROM base b JOIN shares s USING (source) GROUP BY b.source
            ),
            cmin AS (SELECT MIN(tokens / share) AS c FROM per),
            rates AS (
              SELECT source, (CASE WHEN abs(least(1.0, c * share / tokens)) < 4.61168601842738819e+09 THEN (CASE WHEN (least(1.0, c * share / tokens)) >= 0 THEN floor((least(1.0, c * share / tokens)) * 1000000000.0 + 0.5) / 1000000000.0 ELSE -(floor(-(least(1.0, c * share / tokens)) * 1000000000.0 + 0.5) / 1000000000.0) END) ELSE (least(1.0, c * share / tokens)) END) AS rate
              FROM per, cmin
            ),
            flagged AS (
              SELECT b.source, b.tok, r.rate,
                     (CAST(('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                      / CAST(4294967296 AS DOUBLE)) < r.rate AS keep
              FROM base b JOIN rates r USING (source)
            )
            SELECT source, COUNT(*) AS n_docs,
                   CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
                   CAST(SUM(tok) AS BIGINT) AS tokens,
                   CAST(SUM(CASE WHEN keep THEN tok ELSE 0 END) AS BIGINT) AS tokens_kept,
                   MIN(rate) AS rate
            FROM flagged GROUP BY source ORDER BY source""",
        "q1_pricing_summary": f"""
            SELECT l_returnflag, l_linestatus,
                   SUM(l_quantity) AS sum_qty,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
                   CAST(SUM({rev}) AS DOUBLE) AS sum_disc_price,
                   CAST(SUM({rev} * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
                   AVG(l_quantity) AS avg_qty,
                   COUNT(*) AS count_order
            FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""",
        "q3_shipping_priority": f"""
            SELECT l_orderkey, o_orderdate, o_orderpriority,
                   CAST(SUM({rev}) AS DOUBLE) AS revenue
            FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                 JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            WHERE c.c_mktsegment = 'BUILDING'
              AND o.o_orderdate < TIMESTAMP '1998-03-15'
              AND l.l_shipdate > TIMESTAMP '1998-03-15'
            GROUP BY l_orderkey, o_orderdate, o_orderpriority
            ORDER BY revenue DESC, l_orderkey LIMIT 10""",
        "q5_local_supplier_volume": f"""
            SELECT n_name, CAST(SUM({rev}) AS DOUBLE) AS revenue
            FROM lineitem l
              JOIN orders o ON l.l_orderkey = o.o_orderkey
              JOIN supplier s ON l.l_suppkey = s.s_suppkey
              JOIN customer c ON o.o_custkey = c.c_custkey AND s.s_nationkey = c.c_nationkey
              JOIN nation n ON c.c_nationkey = n.n_nationkey
              JOIN region r ON n.n_regionkey = r.r_regionkey
            WHERE r.r_name = 'ASIA'
              AND o.o_orderdate >= TIMESTAMP '1996-01-01' AND o.o_orderdate < TIMESTAMP '1997-01-01'
            GROUP BY n_name ORDER BY revenue DESC, n_name""",
        "q6_revenue_forecast": """
            SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
              AND CAST(l_discount AS DECIMAL(18,2)) BETWEEN CAST(0.05 AS DECIMAL(18,2)) AND CAST(0.07 AS DECIMAL(18,2))
              AND l_quantity < 24""",
        "q10_returned_items": f"""
            SELECT c_custkey, c_name, c_acctbal, n_name, CAST(SUM({rev}) AS DOUBLE) AS revenue
            FROM lineitem l
              JOIN orders o ON l.l_orderkey = o.o_orderkey
              JOIN customer c ON o.o_custkey = c.c_custkey
              JOIN nation n ON c.c_nationkey = n.n_nationkey
            WHERE l.l_returnflag = 'R'
              AND o.o_orderdate >= TIMESTAMP '1996-01-01' AND o.o_orderdate < TIMESTAMP '1996-04-01'
            GROUP BY c_custkey, c_name, c_acctbal, n_name
            ORDER BY revenue DESC, c_custkey LIMIT 20""",
        "q4_order_priority": """
            SELECT o_orderpriority, COUNT(*) AS order_count
            FROM orders o
            WHERE o.o_orderdate >= TIMESTAMP '1996-01-01' AND o.o_orderdate < TIMESTAMP '1996-04-01'
              AND EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_orderkey = o.o_orderkey
                            AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
            GROUP BY o_orderpriority ORDER BY o_orderpriority""",
        "q13_customer_distribution": """
            SELECT c_count, COUNT(*) AS custdist FROM (
              SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
              FROM customer c LEFT OUTER JOIN orders o
                ON c.c_custkey = o.o_custkey AND o.o_orderstatus != 'P'
              GROUP BY c.c_custkey
            ) GROUP BY c_count ORDER BY custdist DESC, c_count DESC""",
        "q16_parts_supplier": """
            SELECT p_brand, p_type, p_size, CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            WHERE p.p_brand != 'Brand#13' AND p.p_type != 'MEDIUM'
              AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000)
            GROUP BY p_brand, p_type, p_size
            ORDER BY supplier_cnt DESC, p_brand, p_type, p_size LIMIT 20""",
        "q18_large_orders": """
            SELECT c_name, c_custkey, o_orderkey, o_orderdate,
                   CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice, sum_qty
            FROM orders o
              JOIN (SELECT l_orderkey, SUM(l_quantity) AS sum_qty FROM lineitem
                    GROUP BY l_orderkey HAVING SUM(l_quantity) > 200) big
                ON o.o_orderkey = big.l_orderkey
              JOIN customer c ON o.o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""",
        "q22_global_sales": """
            SELECT c_mktsegment, COUNT(*) AS numcust,
                   CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
            FROM customer c
            WHERE CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) >
                  (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
                   FROM customer WHERE CAST(c_acctbal AS DECIMAL(18,2)) > 0)
              AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                              AND o.o_orderdate >= TIMESTAMP '1997-06-01')
            GROUP BY c_mktsegment ORDER BY c_mktsegment""",
        "topk_customers_window": """
            SELECT o_custkey, total_spend, rnk, drnk FROM (
              SELECT o_custkey, total_spend,
                     row_number() OVER (ORDER BY total_spend DESC, o_custkey) AS rnk,
                     dense_rank() OVER (ORDER BY total_spend DESC) AS drnk
              FROM (
                SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
                FROM orders GROUP BY o_custkey
              )
            ) WHERE rnk <= 25 ORDER BY rnk""",
        "orders_running_total": """
            SELECT o_custkey, o_orderkey, o_orderdate,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                     PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
            FROM orders""",
        "pivot_order_status": """
            SELECT o_orderpriority,
                   CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
                   CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
                   CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
            FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
        "rollup_sales": """
            SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows, SUM(l_quantity) AS sum_qty
            FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
            ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
        "dedup_latest_event": """
            SELECT user_id, event_id, ts, event_type, value FROM (
              SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
              FROM events
            ) WHERE rn = 1""",
        "scd2_user_history": """
            WITH ordered AS (
              SELECT user_id, ts, event_id, event_type,
                     lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
              FROM events
            ), changes AS (
              SELECT user_id, ts, event_id, event_type FROM ordered
              WHERE prev_type IS NULL OR prev_type != event_type
            )
            SELECT user_id, event_type, ts AS dl_ts_captured,
                   strftime(COALESCE(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                            TIMESTAMP '9999-12-31 00:00:00'), '%Y-%m-%d %H:%M:%S.%f') AS dl_ts_delimited
            FROM changes""",
        "incremental_highwatermark": """
            SELECT event_id, user_id, ts, event_type, value FROM events
            WHERE ts > (SELECT max(ts) FROM events
                        WHERE ts <= (SELECT max(ts) - INTERVAL 1 DAY FROM events))""",
        "q7_nation_volume": """
            SELECT supp_nation, cust_nation, l_year, CAST(SUM(volume) AS DOUBLE) AS revenue
            FROM (
              SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                     CAST(year(l_shipdate) AS INT) AS l_year,
                     CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS volume
              FROM lineitem
                JOIN orders   ON l_orderkey = o_orderkey
                JOIN supplier ON l_suppkey = s_suppkey
                JOIN customer ON o_custkey = c_custkey
                JOIN nation n1 ON s_nationkey = n1.n_nationkey
                JOIN nation n2 ON c_nationkey = n2.n_nationkey
              WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
                AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                  OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
            ) GROUP BY supp_nation, cust_nation, l_year
            ORDER BY supp_nation, cust_nation, l_year""",
        "q8_market_share": """
            SELECT o_year,
                   CAST(SUM(CASE WHEN supp_nation = 'NATION_5' THEN volume ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                     / CAST(SUM(volume) AS DOUBLE) AS mkt_share
            FROM (
              SELECT CAST(year(o_orderdate) AS INT) AS o_year,
                     CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS volume,
                     ns.n_name AS supp_nation
              FROM lineitem
                JOIN orders ON l_orderkey = o_orderkey
                JOIN part ON l_partkey = p_partkey
                JOIN customer ON o_custkey = c_custkey
                JOIN nation nc ON c_nationkey = nc.n_nationkey
                JOIN region ON nc.n_regionkey = r_regionkey
                JOIN supplier ON l_suppkey = s_suppkey
                JOIN nation ns ON s_nationkey = ns.n_nationkey
              WHERE r_name = 'ASIA' AND p_type = 'PROMO'
                AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
            ) GROUP BY o_year ORDER BY o_year""",
        "q9_product_profit": """
            SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
            FROM (
              SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
                     CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
                       - CAST(p_retailprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) AS amount
              FROM lineitem
                JOIN part ON l_partkey = p_partkey
                JOIN orders ON l_orderkey = o_orderkey
                JOIN supplier ON l_suppkey = s_suppkey
                JOIN nation ON s_nationkey = n_nationkey
              WHERE p_name LIKE '%red%'
            ) GROUP BY nation, o_year ORDER BY nation, o_year DESC""",
        "q14_promo_revenue": """
            SELECT CAST(SUM(CASE WHEN p_type = 'PROMO'
                       THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
                       ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) * 100.0
                 / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
                   AS promo_revenue_pct
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE l_shipdate >= TIMESTAMP '1996-03-01' AND l_shipdate < TIMESTAMP '1996-04-01'""",
        "q15_top_supplier": """
            WITH revenue AS (
              SELECT l_suppkey,
                     SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_revenue
              FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
              GROUP BY l_suppkey
            )
            SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
            FROM revenue JOIN supplier ON l_suppkey = s_suppkey
            WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
            ORDER BY s_suppkey""",
        "q17_small_quantity_revenue": """
            WITH branded AS (
              SELECT l_partkey, l_quantity, l_extendedprice
              FROM lineitem JOIN part ON l_partkey = p_partkey
              WHERE p_brand = 'Brand#1'
            ), per_part AS (
              SELECT l_partkey AS pk,
                     CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty
              FROM branded GROUP BY l_partkey
            )
            SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly
            FROM branded JOIN per_part ON l_partkey = pk
            WHERE l_quantity < 0.2 * avg_qty""",
        "q19_discounted_revenue": """
            SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
               OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
               OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)""",
        "q2_min_cost_supplier": f"""
            WITH cost AS (
              SELECT l_partkey, l_suppkey, MIN(l_extendedprice / l_quantity) AS supply_cost
              FROM lineitem JOIN part ON l_partkey = p_partkey
              WHERE p_size = 15 AND p_type = 'LARGE'
              GROUP BY l_partkey, l_suppkey
            ), mc AS (
              SELECT l_partkey AS mc_partkey, MIN(supply_cost) AS min_cost
              FROM cost GROUP BY l_partkey
            )
            SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
                   {_gq("supply_cost", 6)} AS supply_cost
            FROM cost
            JOIN mc ON l_partkey = mc_partkey AND supply_cost = min_cost
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
            JOIN part ON l_partkey = p_partkey
            ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
            LIMIT 100""",
        "q11_important_stock": """
            WITH value AS (
              SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS value_dec
              FROM lineitem
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_7'
              GROUP BY l_partkey
            )
            SELECT l_partkey, CAST(value_dec AS DOUBLE) AS part_value
            FROM value
            WHERE CAST(value_dec AS DOUBLE) >
                  0.001 * (SELECT CAST(SUM(value_dec) AS DOUBLE) FROM value)
            ORDER BY part_value DESC, l_partkey""",
        "q12_shipping_priority_class": """
            SELECT l_returnflag,
                   CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
                   CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
              AND l_shipdate > o_orderdate + INTERVAL 60 DAY
            GROUP BY l_returnflag
            ORDER BY l_returnflag""",
        "q20_excess_stock_suppliers": f"""
            WITH red AS (
              SELECT l_suppkey, l_partkey, l_quantity
              FROM lineitem JOIN part ON l_partkey = p_partkey
              WHERE p_name LIKE 'red%'
                AND l_shipdate >= TIMESTAMP '1996-01-01'
                AND l_shipdate < TIMESTAMP '1997-01-01'
            ), sp AS (
              SELECT l_suppkey, l_partkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sp_qty
              FROM red GROUP BY l_suppkey, l_partkey
            ), pq AS (
              SELECT l_partkey AS pq_partkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS part_qty
              FROM red GROUP BY l_partkey
            )
            SELECT s_suppkey, s_name, {_gq("s_acctbal", 2)} AS s_acctbal
            FROM supplier
            WHERE s_suppkey IN (
              SELECT l_suppkey FROM sp JOIN pq ON l_partkey = pq_partkey
              WHERE CAST(sp_qty AS DOUBLE) > 0.15 * CAST(part_qty AS DOUBLE)
            )
            ORDER BY s_name""",
        "q21_waiting_suppliers": """
            WITH late AS (
              SELECT l_orderkey, l_suppkey
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              WHERE o_orderstatus = 'F'
                AND l_shipdate > o_orderdate + INTERVAL 60 DAY
            )
            SELECT s_name, COUNT(*) AS numwait
            FROM late l1 JOIN supplier ON l1.l_suppkey = s_suppkey
            WHERE EXISTS (
                SELECT 1 FROM lineitem l2
                WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
              )
              AND NOT EXISTS (
                SELECT 1 FROM late l3
                WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
              )
            GROUP BY s_name
            ORDER BY numwait DESC, s_name
            LIMIT 20""",
        "asof_click_attribution": """
            SELECT p.event_id, p.user_id, p.ts AS purchase_ts,
                   c.ts AS click_ts, c.event_id AS click_event_id,
                   epoch(p.ts) - epoch(c.ts) AS gap_sec
            FROM events p LEFT JOIN LATERAL (
              SELECT ts, event_id FROM events c
              WHERE c.user_id = p.user_id AND c.event_type = 'click' AND c.ts < p.ts
              ORDER BY ts DESC, event_id DESC LIMIT 1
            ) c ON true
            WHERE p.event_type = 'purchase'
            ORDER BY p.event_id""",
        "range_clicks_before_purchase": """
            SELECT p.event_id, p.user_id, COUNT(*) AS n_clicks, MAX(c.value) AS max_click_value
            FROM events p JOIN events c
              ON c.user_id = p.user_id AND c.event_type = 'click'
             AND epoch(c.ts) >= epoch(p.ts) - 3600 AND epoch(c.ts) < epoch(p.ts)
            WHERE p.event_type = 'purchase'
            GROUP BY p.event_id, p.user_id
            ORDER BY p.event_id""",
        "partition_diff": """
            SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS month FROM lineitem
            EXCEPT
            SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) FROM orders
            ORDER BY month""",
        "pk_violations_events": """
            -- PKViolatorsDataObject output: (data_object_id, key-as-json,
            -- violation, cnt). The key JSON mirrors Spark's to_json over
            -- struct(user_id, event_type) — null fields omitted (events has
            -- no null key parts at any SF, so the simple form is exact).
            SELECT data_object_id, key, violation, cnt FROM (
              SELECT 'events' AS data_object_id,
                     '{"user_id":' || user_id || ',"event_type":"' || event_type || '"}' AS key,
                     'duplicate' AS violation, COUNT(*) AS cnt
              FROM events GROUP BY user_id, event_type HAVING COUNT(*) > 1
              UNION ALL
              SELECT 'events',
                     '{"user_id":' || user_id || ',"event_type":"' || event_type || '"}',
                     'null_key', CAST(1 AS BIGINT)
              FROM events WHERE user_id IS NULL OR event_type IS NULL
            )""",
        "data_validation_lineitem": """
            SELECT l_orderkey, l_linenumber, n_errors, errors FROM (
              SELECT l_orderkey, l_linenumber,
                     (CASE WHEN NOT (l_quantity > 0) THEN 1 ELSE 0 END
                      + CASE WHEN NOT (CAST(l_discount AS DECIMAL(18,2)) <= CAST(0.08 AS DECIMAL(18,2))) THEN 1 ELSE 0 END
                      + CASE WHEN NOT (CAST(l_tax AS DECIMAL(18,2)) <= CAST(0.06 AS DECIMAL(18,2))) THEN 1 ELSE 0 END) AS n_errors,
                     concat_ws(',',
                       CASE WHEN NOT (l_quantity > 0) THEN 'qty_nonpos' END,
                       CASE WHEN NOT (CAST(l_discount AS DECIMAL(18,2)) <= CAST(0.08 AS DECIMAL(18,2))) THEN 'disc_gt_8pct' END,
                       CASE WHEN NOT (CAST(l_tax AS DECIMAL(18,2)) <= CAST(0.06 AS DECIMAL(18,2))) THEN 'tax_gt_6pct' END) AS errors
              FROM lineitem
            ) WHERE n_errors > 0""",
        "sessionize_events": """
            WITH flagged AS (
              SELECT user_id, ts, event_id,
                     CASE WHEN lag(ts) OVER w IS NULL
                               OR epoch(ts) - epoch(lag(ts) OVER w) > 3600
                          THEN 1 ELSE 0 END AS new_session
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), sessions AS (
              SELECT user_id,
                     SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
              FROM flagged
            )
            SELECT user_id, CAST(MAX(session_no) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
            FROM sessions GROUP BY user_id ORDER BY user_id""",
        "text_stats": f"""
            -- r10 sweep: the ratios are int/int RATIONALS — grid form,
            -- lockstep with grid_round, not engine round()
            SELECT doc_id,
                   {_NTOK} AS n_tokens,
                   length(text) AS n_chars_computed,
                   {_gq(_PUNCT, 6)} AS punct_ratio,
                   {_gq(f"CASE WHEN {_NTOK} = 0 THEN 0.0 ELSE {_sw_hits('en')} * 1.0 / {_NTOK} END", 6)} AS stopword_ratio,
                   {_gq(f"CASE WHEN {_NTOK} = 0 THEN 0.0 ELSE list_sum(list_transform({_TOKS}, t -> length(t))) * 1.0 / {_NTOK} END", 6)} AS mean_token_len,
                   CAST({_gq(f"(CASE WHEN {_NTOK} BETWEEN 10 AND 100000 THEN 0.5 ELSE 0.0 END) + (CASE WHEN ({_PUNCT}) < 0.2 THEN 0.3 ELSE 0.0 END) + (CASE WHEN (CASE WHEN {_NTOK} = 0 THEN 0.0 ELSE list_sum(list_transform({_TOKS}, t -> length(t))) * 1.0 / {_NTOK} END) BETWEEN 2 AND 12 THEN 0.2 ELSE 0.0 END)", 6)} AS DOUBLE) AS quality,
                   (SELECT {_lang_case()} FROM (SELECT
                        {_sw_hits('de')} AS s_de, {_sw_hits('en')} AS s_en, {_sw_hits('es')} AS s_es,
                        {_sw_hits('fr')} AS s_fr, {_sw_hits('zh')} AS s_zh)) AS lang_pred,
                   md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fingerprint
            FROM documents""",
        "lang_id_confusion": f"""
            WITH scored AS (
              SELECT lang,
                     {_sw_hits('de')} AS s_de, {_sw_hits('en')} AS s_en, {_sw_hits('es')} AS s_es,
                     {_sw_hits('fr')} AS s_fr, {_sw_hits('zh')} AS s_zh
              FROM documents
            )
            SELECT lang, {_lang_case()} AS lang_pred, COUNT(*) AS n
            FROM scored GROUP BY 1, 2 ORDER BY lang, lang_pred""",
        "token_count_by_source": f"""
            SELECT source, CAST(SUM({_NTOK}) AS BIGINT) AS total_tokens, COUNT(*) AS n_docs
            FROM documents GROUP BY source ORDER BY source""",
        "profile_orders_columns": f"""
            -- r11 sweep: medians via EXPLICIT order statistics + grid
            -- finals, lockstep with profile_columns(exact_median=True)
            WITH rk AS (
              SELECT CAST(o_orderkey AS DOUBLE) AS v,
                     row_number() OVER (ORDER BY o_orderkey) AS rn,
                     COUNT(*) OVER () AS n
              FROM orders WHERE o_orderkey IS NOT NULL
            ),
            kmed AS (
              SELECT {_interp_sql("v", 1, 2)} AS med FROM rk
            ),
            rp AS (
              SELECT o_totalprice AS v,
                     row_number() OVER (ORDER BY o_totalprice) AS rn,
                     COUNT(*) OVER () AS n
              FROM orders WHERE o_totalprice IS NOT NULL
            ),
            pmed AS (
              SELECT {_interp_sql("v", 1, 2)} AS med FROM rp
            ),
            s AS (
              SELECT COUNT(*) AS n,
                CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS k_nulls,
                CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS k_d,
                CAST(MIN(o_orderkey) AS VARCHAR) AS k_min,
                CAST(MAX(o_orderkey) AS VARCHAR) AS k_max,
                {_gq("CAST(SUM(CAST(o_orderkey AS DECIMAL(28,6))) AS DOUBLE) / COUNT(o_orderkey)", 6)} AS k_mean,
                {_gq("(SELECT med FROM kmed)", 6)} AS k_med,
                CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS s_nulls,
                CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS s_d,
                CAST(MIN(o_orderstatus) AS VARCHAR) AS s_min,
                CAST(MAX(o_orderstatus) AS VARCHAR) AS s_max,
                CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS p_nulls,
                CAST(COUNT(DISTINCT o_totalprice) AS BIGINT) AS p_d,
                -- r11: float min/max stringify through grid-quantized
                -- DECIMAL (engine double->string rendering differs);
                -- total over NaN/Inf/huge, lockstep with profile_columns
                CASE WHEN isnan(MIN(o_totalprice)) THEN 'NaN'
                     WHEN isinf(MIN(o_totalprice)) AND MIN(o_totalprice) > 0 THEN 'Infinity'
                     WHEN isinf(MIN(o_totalprice)) THEN '-Infinity'
                     WHEN abs(MIN(o_totalprice)) < 4.61168601842738770e+12
                     THEN CAST(CAST({_gq("MIN(o_totalprice)", 6)} AS DECIMAL(38,6)) AS VARCHAR)
                     ELSE CAST(MIN(o_totalprice) AS VARCHAR) END AS p_min,
                CASE WHEN isnan(MAX(o_totalprice)) THEN 'NaN'
                     WHEN isinf(MAX(o_totalprice)) AND MAX(o_totalprice) > 0 THEN 'Infinity'
                     WHEN isinf(MAX(o_totalprice)) THEN '-Infinity'
                     WHEN abs(MAX(o_totalprice)) < 4.61168601842738770e+12
                     THEN CAST(CAST({_gq("MAX(o_totalprice)", 6)} AS DECIMAL(38,6)) AS VARCHAR)
                     ELSE CAST(MAX(o_totalprice) AS VARCHAR) END AS p_max,
                {_gq("CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) / COUNT(o_totalprice)", 6)} AS p_mean,
                {_gq("(SELECT med FROM pmed)", 6)} AS p_med
              FROM orders
            )
            SELECT * FROM (
              SELECT 'o_orderkey' AS col_name, n AS n_rows, k_nulls AS n_null, k_d AS n_distinct,
                     k_min AS min_str, k_max AS max_str, k_mean AS mean, k_med AS median FROM s
              UNION ALL
              SELECT 'o_orderstatus', n, s_nulls, s_d, s_min, s_max,
                     CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE) FROM s
              UNION ALL
              SELECT 'o_totalprice', n, p_nulls, p_d, p_min, p_max, p_mean, p_med FROM s
            ) ORDER BY col_name""",
        "events_value_outliers": """
            WITH st AS (
              -- r10 sweep: grid-quantized input BEFORE the decimal cast
              -- (bare double→DECIMAL casts round engine-natively — the
              -- half-grid class), lockstep with grid_round
              SELECT event_type,
                CAST(SUM(CAST(""" + _gq("value", 6) + """ AS DECIMAL(18,6))) AS DOUBLE) AS s,
                -- (28,6) first operand: DuckDB multiplies DECIMAL(<=18)
                -- pairs in int64 physical width (r11 harness-found at
                -- |v| >= ~3037) — force the int128 path, values equal
                CAST(SUM(CAST(""" + _gq("value", 6) + """ AS DECIMAL(28,6)) * CAST(""" + _gq("value", 6) + """ AS DECIMAL(18,6))) AS DOUBLE) AS sq,
                COUNT(value) AS n
              FROM events GROUP BY event_type
            ), en AS (
              SELECT event_type, s / n AS m,
                     sqrt(greatest(sq / n - (s / n) * (s / n), 0.0)) AS sd
              FROM st
            )
            -- r11 sweep: grid form, lockstep with grid_round
            SELECT e.event_id, e.event_type, e.value,
                   """ + _gq("(e.value - m) / sd", 6) + """ AS zscore
            FROM events e JOIN en USING (event_type)
            WHERE sd > 0 AND abs((e.value - m) / sd) > 2.5
            ORDER BY e.event_id""",
        "streaming_windowed_counts": """
            SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS window_start_epoch,
                   event_type, COUNT(*) AS n_events, MAX(value) AS max_value
            FROM events
            GROUP BY 1, 2 ORDER BY window_start_epoch, event_type""",
        "streaming_session_counts": """
            WITH e AS (
              SELECT user_id, value, make_timestamp(epoch_ns(ts) // 1000) AS ts FROM events
            ), marked AS (
              SELECT user_id, value, ts,
                     CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                               < INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS brk
              FROM e
            ), islands AS (
              SELECT user_id, value, ts,
                     SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sid
              FROM marked
            )
            SELECT user_id,
                   CAST(floor(epoch(MIN(ts))) AS BIGINT) AS session_start_epoch,
                   CAST(floor(epoch(MAX(ts))) AS BIGINT) AS last_event_epoch,
                   COUNT(*) AS n_events, MAX(value) AS max_value
            FROM islands GROUP BY user_id, sid
            ORDER BY user_id, session_start_epoch""",
        "streaming_interval_join": """
            WITH e AS (
              SELECT event_id, user_id, event_type, value,
                     make_timestamp(epoch_ns(ts) // 1000) AS ts
              FROM events
            )
            SELECT p.event_id AS purchase_id, p.user_id,
                   COUNT(*) AS n_clicks_before, MAX(c.value) AS max_click_value
            FROM e p JOIN e c
              ON c.user_id = p.user_id AND c.event_type = 'click'
             AND p.ts >= c.ts AND p.ts < c.ts + INTERVAL 1 HOUR
            WHERE p.event_type = 'purchase'
            GROUP BY 1, 2 ORDER BY purchase_id""",
        "streaming_dedup_users": """
            SELECT event_type, COUNT(DISTINCT user_id) AS n_users
            FROM events GROUP BY event_type ORDER BY event_type""",
        "streaming_upsert_latest": """
            SELECT user_id, event_id, event_type, value FROM (
              SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
              FROM events
            ) WHERE rn = 1 ORDER BY user_id""",
        "benchmark_decontamination": f"""
            WITH {_SHINGLE5_CTE},
            bench AS (SELECT DISTINCT shingle FROM g5 WHERE doc_id % 29 = 0),
            corpus AS (SELECT doc_id, shingle FROM g5 WHERE doc_id % 29 <> 0)
            SELECT c.doc_id, COUNT(*) AS n_grams,
                   CAST(SUM(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
                   (CASE WHEN abs(SUM(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END) * 1.0 / COUNT(*)) < 4.61168601842738770e+12 THEN (CASE WHEN (SUM(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END) * 1.0 / COUNT(*)) >= 0 THEN floor((SUM(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END) * 1.0 / COUNT(*)) * 1000000.0 + 0.5) / 1000000.0 ELSE -(floor(-(SUM(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END) * 1.0 / COUNT(*)) * 1000000.0 + 0.5) / 1000000.0) END) ELSE (SUM(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END) * 1.0 / COUNT(*)) END) AS contamination,
                   (SUM(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END) * 1.0
                         / COUNT(*)) >= 0.05 AS contaminated
            FROM corpus c LEFT JOIN bench b ON c.shingle = b.shingle
            GROUP BY c.doc_id ORDER BY doc_id""",
        "dup_span_stats": f"""
            WITH {_SHINGLE5_CTE},
            freq AS (SELECT shingle, COUNT(*) AS d FROM g5 GROUP BY shingle)
            SELECT g.doc_id, COUNT(*) AS n_spans,
                   CAST(SUM(CASE WHEN f.d > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans,
                   (CASE WHEN abs(SUM(CASE WHEN f.d > 1 THEN 1 ELSE 0 END) * 1.0 / COUNT(*)) < 4.61168601842738770e+12 THEN (CASE WHEN (SUM(CASE WHEN f.d > 1 THEN 1 ELSE 0 END) * 1.0 / COUNT(*)) >= 0 THEN floor((SUM(CASE WHEN f.d > 1 THEN 1 ELSE 0 END) * 1.0 / COUNT(*)) * 1000000.0 + 0.5) / 1000000.0 ELSE -(floor(-(SUM(CASE WHEN f.d > 1 THEN 1 ELSE 0 END) * 1.0 / COUNT(*)) * 1000000.0 + 0.5) / 1000000.0) END) ELSE (SUM(CASE WHEN f.d > 1 THEN 1 ELSE 0 END) * 1.0 / COUNT(*)) END) AS dup_fraction
            FROM g5 g JOIN freq f ON g.shingle = f.shingle
            GROUP BY g.doc_id ORDER BY doc_id""",
        "importance_sample_documents": f"""
            WITH w AS (
              SELECT doc_id, source,
                     (CASE WHEN {_NTOK} BETWEEN 10 AND 100000 THEN 0.5 ELSE 0.0 END)
                   + (CASE WHEN (CASE WHEN length(text) = 0 THEN 0.0
                          ELSE (length(text) - length(regexp_replace(text, '[.,;:!?''"()\\-]', '', 'g'))) * 1.0 / length(text) END) < 0.2 THEN 0.3 ELSE 0.0 END)
                   + (CASE WHEN (CASE WHEN {_NTOK} = 0 THEN 0.0
                          ELSE list_sum(list_transform({_TOKS}, t -> length(t))) * 1.0 / {_NTOK} END) BETWEEN 2 AND 12 THEN 0.2 ELSE 0.0 END) AS wq_base,
                     LEAST(1.0, {_NTOK} / 80) AS ramp
              FROM documents
            ), wr AS (
              SELECT doc_id, source, wq_base * ramp AS wq FROM w
            )
            SELECT doc_id, source, {_gq("wq", 6)} AS weight FROM wr
            WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000000
                  < CAST(floor(wq * 1000000) AS BIGINT)
            ORDER BY doc_id""",
        "bpe_token_count_by_source": f"""
            SELECT source,
                   CAST(SUM(len(regexp_extract_all(text,
                        '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s'']+')))
                        AS BIGINT) AS total_bpe_tokens,
                   CAST(SUM({_NTOK}) AS BIGINT) AS total_ws_tokens,
                   COUNT(*) AS n_docs
            FROM documents GROUP BY source ORDER BY source""",
        "quality_filter_gopher": f"""
            WITH corpus AS (
              SELECT doc_id, source, text FROM documents
              UNION ALL
              SELECT doc_id + 1000000 AS doc_id, source,
                     text || ' ' || text || ' ' || text AS text
              FROM documents WHERE doc_id % 10 = 0
            ),
            toks AS (
              SELECT source, text,
                     CASE WHEN length(trim(lower(text))) = 0
                          THEN CAST([] AS VARCHAR[]) ELSE {_TOKS} END AS t
              FROM corpus
            ),
            grams AS (
              SELECT source, text, t,
                CASE WHEN len(t) < 2 THEN CAST([] AS VARCHAR[])
                     ELSE list_transform(generate_series(1, len(t) - 1),
                                         i -> array_to_string(t[i:i+1], ' ')) END AS g2,
                CASE WHEN len(t) < 3 THEN CAST([] AS VARCHAR[])
                     ELSE list_transform(generate_series(1, len(t) - 2),
                                         i -> array_to_string(t[i:i+2], ' ')) END AS g3,
                CASE WHEN len(t) < 5 THEN CAST([] AS VARCHAR[])
                     ELSE list_transform(generate_series(1, len(t) - 4),
                                         i -> array_to_string(t[i:i+4], ' ')) END AS g5
              FROM toks
            ),
            m AS (
              SELECT source, text, t,
                len(g2) AS n2,
                COALESCE(list_max(list_transform(list_distinct(g2),
                    x -> len(list_filter(g2, y -> y = x)))), 0) AS best2,
                len(g3) AS n3,
                COALESCE(list_max(list_transform(list_distinct(g3),
                    x -> len(list_filter(g3, y -> y = x)))), 0) AS best3,
                len(g5) AS n5,
                COALESCE(list_sum(list_transform(list_distinct(g5),
                    x -> CASE WHEN len(list_filter(g5, y -> y = x)) >= 2
                              THEN len(list_filter(g5, y -> y = x)) ELSE 0 END)), 0) AS dup5,
                list_filter(list_transform(string_split(text, chr(10)), x -> trim(x)),
                            x -> length(x) > 0) AS ls,
                length(text) - length(regexp_replace(text, '[#…]', '', 'g')) AS nsym
              FROM grams
            ),
            v AS (
              SELECT source, n2, best2, n5, dup5,
                (CASE WHEN len(ls) = 0 THEN 0.0
                      ELSE (len(ls) - len(list_distinct(ls))) * 1.0 / len(ls) END) <= 0.30
                AND (CASE WHEN n2 = 0 THEN 0.0 ELSE best2 * 1.0 / n2 END) <= 0.20
                AND (CASE WHEN n3 = 0 THEN 0.0 ELSE best3 * 1.0 / n3 END) <= 0.18
                AND (CASE WHEN n5 = 0 THEN 0.0 ELSE dup5 * 1.0 / n5 END) <= 0.15
                AND (CASE WHEN len(t) = 0 THEN 0.0 ELSE nsym * 1.0 / len(t) END) <= 0.10
                AS quality_keep
              FROM m
            )
            SELECT source, quality_keep, COUNT(*) AS n_docs,
                   {_gq("CAST(SUM(best2) AS DOUBLE) / CAST(SUM(n2) AS DOUBLE)", 6)} AS pooled_top_2gram_frac,
                   {_gq("CAST(SUM(dup5) AS DOUBLE) / CAST(SUM(n5) AS DOUBLE)", 6)} AS pooled_dup_5gram_frac
            FROM v GROUP BY source, quality_keep ORDER BY source, quality_keep""",
        "chunk_documents_overlap": """
            WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
            k AS (
              SELECT doc_id, text,
                     CAST(floor((greatest(n - 120, 0) + 89) / 90) AS BIGINT) AS last_k
              FROM d
            ),
            e AS (
              SELECT doc_id, text, last_k,
                     unnest(generate_series(0, last_k)) AS chunk_id
              FROM k
            )
            SELECT doc_id, chunk_id,
                   1 + chunk_id * 90 AS chunk_start,
                   last_k + 1 AS n_chunks,
                   CAST(length(substring(text, CAST(1 + chunk_id * 90 AS INT), 120)) AS BIGINT) AS chunk_len,
                   md5(substring(text, CAST(1 + chunk_id * 90 AS INT), 120)) AS chunk_md5
            FROM e ORDER BY doc_id, chunk_id""",
        "bm25_search": f"""
            WITH base AS (
              SELECT doc_id,
                     {_NTOK} AS dl,
                     len(list_filter({_TOKS}, x -> x = 'merge')) AS tf0,
                     len(list_filter({_TOKS}, x -> x = 'stream')) AS tf1,
                     len(list_filter({_TOKS}, x -> x = 'window')) AS tf2
              FROM documents
            ),
            st AS (
              SELECT COUNT(*) AS n,
                     CAST(SUM(dl) AS BIGINT) AS dls,
                     SUM(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
                     SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
                     SUM(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2
              FROM base
            ),
            sc AS (
              SELECT doc_id,
                ln(1.0 + CAST(n - df0 + 0.5 AS DOUBLE) / CAST(df0 + 0.5 AS DOUBLE))
                  * (tf0 * CAST(2.2 AS DOUBLE))
                  / (tf0 + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * (dl / (CAST(dls AS DOUBLE) / n))))
                + ln(1.0 + CAST(n - df1 + 0.5 AS DOUBLE) / CAST(df1 + 0.5 AS DOUBLE))
                  * (tf1 * CAST(2.2 AS DOUBLE))
                  / (tf1 + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * (dl / (CAST(dls AS DOUBLE) / n))))
                + ln(1.0 + CAST(n - df2 + 0.5 AS DOUBLE) / CAST(df2 + 0.5 AS DOUBLE))
                  * (tf2 * CAST(2.2 AS DOUBLE))
                  / (tf2 + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * (dl / (CAST(dls AS DOUBLE) / n))))
                AS raw_score,
                (CASE WHEN tf0 > 0 THEN 1 ELSE 0 END
                 + CASE WHEN tf1 > 0 THEN 1 ELSE 0 END
                 + CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS n_matched
              FROM base, st
            )
            SELECT doc_id, {_gq("raw_score", 6)} AS score, n_matched
            FROM sc WHERE n_matched > 0
            ORDER BY score DESC, doc_id LIMIT 20""",
        "pii_redaction": """
            WITH injected AS (
              SELECT doc_id,
                CASE WHEN doc_id % 7 = 0
                     THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                          || '@example.com or 555-123-4567 ip 10.0.0.1'
                     ELSE text END AS text
              FROM documents
            )
            SELECT doc_id,
              md5(regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
                  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                  '\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b', '<PHONE>', 'g'),
                  '\\b\\d{3}-\\d{2}-\\d{4}\\b', '<SSN>', 'g'),
                  '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g')) AS redacted_md5,
              CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
              CAST(len(regexp_extract_all(text, '\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b')) AS BIGINT) AS n_phone,
              CAST(len(regexp_extract_all(text, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS BIGINT) AS n_ip
            FROM injected ORDER BY doc_id""",
        "dedup_exact": """
            WITH corpus AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 50 = 0
            )
            SELECT md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fingerprint,
                   COUNT(*) AS n_docs, MIN(doc_id) AS keep_doc_id
            FROM corpus
            GROUP BY 1 HAVING COUNT(*) > 1 ORDER BY fingerprint""",
        "dedup_minhash": f"""
            WITH {_SHINGLE_CTE}, {_minhash_cte()}
            SELECT doc_a, doc_b FROM pairs ORDER BY doc_a, doc_b""",
        "stratified_sample_documents": """
            SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars,
                   MIN(doc_id) AS first_doc
            FROM documents
            WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000
                  < (CASE source WHEN 'src0' THEN 10000 WHEN 'src1' THEN 5000
                                 WHEN 'src2' THEN 2500 WHEN 'src3' THEN 1000
                                 ELSE 500 END)
            GROUP BY source ORDER BY source""",
        "pack_sequences_by_source": """
            WITH packed AS (
              SELECT source, doc_id, n_chars,
                     CAST(floor(COALESCE(SUM(n_chars) OVER (
                       PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 20000) AS BIGINT)
                       AS shard_id
              FROM documents
            )
            SELECT source, shard_id, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS shard_chars,
                   MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
            FROM packed GROUP BY source, shard_id ORDER BY source, shard_id""",
        "neardup_clusters_minhash": f"""
            WITH RECURSIVE {_SHINGLE_CTE}, {_minhash_cte()},
            edges AS (
              SELECT doc_a AS src, doc_b AS dst FROM pairs
              UNION SELECT doc_b, doc_a FROM pairs
            ),
            reach(src, dst) AS (
              SELECT src, src FROM (SELECT DISTINCT src FROM edges)
              UNION
              SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
            ),
            comp AS (SELECT src AS node, MIN(dst) AS label FROM reach GROUP BY src),
            sized AS (
              SELECT c.node, c.label, d.n_chars FROM comp c JOIN documents d ON d.doc_id = c.node
            ),
            ranked AS (
              SELECT node, label, ROW_NUMBER() OVER (
                PARTITION BY label ORDER BY n_chars DESC, node ASC) AS rk
              FROM sized
            )
            SELECT label AS cluster_id, COUNT(*) AS n_docs,
                   MAX(CASE WHEN rk = 1 THEN node END) AS canonical_doc_id
            FROM ranked GROUP BY label ORDER BY cluster_id""",
        "dedup_ngram_jaccard": f"""
            WITH {_SHINGLE_CTE}, {_minhash_cte()},
            sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
            inter AS (
              SELECT p.doc_a, p.doc_b, COUNT(*) AS n_inter
              FROM pairs p
                JOIN sh sa ON sa.doc_id = p.doc_a
                JOIN sh sb ON sb.doc_id = p.doc_b AND sa.shingle = sb.shingle
              GROUP BY p.doc_a, p.doc_b
            )
            SELECT i.doc_a, i.doc_b,
                   {_gq("i.n_inter * 1.0 / (za.n + zb.n - i.n_inter)", 6)} AS jaccard
            FROM inter i JOIN sizes za ON za.doc_id = i.doc_a JOIN sizes zb ON zb.doc_id = i.doc_b
            ORDER BY doc_a, doc_b""",
        "simhash_docs": rf"""
            WITH tok AS (
              SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
              WHERE length(trim(lower(text))) > 0
            ), th AS (
              SELECT doc_id, substr(md5(tok), 1, 8) AS h FROM tok
            ), bits AS (
              SELECT doc_id, h, bit FROM th, (SELECT unnest(range(0, 32)) AS bit) b
            ), digits AS (
              SELECT doc_id, bit, substr(h, bit // 4 + 1, 1) AS d FROM bits
            ), contrib AS (
              SELECT doc_id, bit,
                SUM((((CASE WHEN d BETWEEN '0' AND '9' THEN ascii(d) - 48 ELSE ascii(d) - 87 END) >> (bit % 4)) % 2) * 2 - 1) AS vote
              FROM digits GROUP BY doc_id, bit
            )
            SELECT doc_id,
                   CAST(SUM(CASE WHEN vote > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS simhash
            FROM contrib GROUP BY doc_id ORDER BY doc_id""",
        "ann_topk": f"""
            WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 10),
            scored AS (
              SELECT q.query_id, e.vec_id AS neighbor_id,
                     {_cos_sql('q.qe', 'e.embedding')} AS cos_sim
              FROM q CROSS JOIN embeddings e WHERE q.query_id != e.vec_id
            )
            SELECT query_id, neighbor_id, cos_sim, rank FROM (
              SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS INT) AS rank
              FROM scored
            ) WHERE rank <= 5 ORDER BY query_id, rank""",
        "embedding_neardup": f"""
            WITH banded AS (
              {_banded_bucket_cte(_ND_BANDS, _ND_PPB)}
            ),
            pairs AS (
              SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
              FROM banded a JOIN banded b
                ON a.band_id = b.band_id AND a.bucket = b.bucket AND a.vec_id < b.vec_id
            )
            SELECT p.id_a, p.id_b, {_cos_sql('ea.embedding', 'eb.embedding')} AS cos_sim
            FROM pairs p
              JOIN embeddings ea ON ea.vec_id = p.id_a
              JOIN embeddings eb ON eb.vec_id = p.id_b
            WHERE {_cos_sql('ea.embedding', 'eb.embedding')} >= 0.4
            ORDER BY id_a, id_b""",
        "embedding_neardup_exact": f"""
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   {_cos_sql('a.embedding', 'b.embedding')} AS cos_sim
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE a.vec_id < 500 AND b.vec_id < 500
              AND {_cos_sql('a.embedding', 'b.embedding')} >= 0.4
            ORDER BY id_a, id_b""",
        "multimodal_image_meta": """
            SELECT CAST(doc_id AS VARCHAR) AS path,
                   octet_length(encode(text)) AS n_bytes,
                   CASE WHEN octet_length(encode(text)) = 0 THEN NULL
                        ELSE CAST(64 + octet_length(encode(text)) % 64 AS INT) END AS width,
                   CASE WHEN octet_length(encode(text)) = 0 THEN NULL
                        ELSE CAST(64 + (octet_length(encode(text)) // 64) % 64 AS INT) END AS height,
                   CASE WHEN octet_length(encode(text)) = 0 THEN NULL ELSE 3 END AS channels,
                   CASE WHEN octet_length(encode(text)) = 0 THEN NULL ELSE 'stub' END AS format
            FROM documents ORDER BY doc_id""",
        "ann_topk_ivf": f"""
            WITH dists AS (
              SELECT vec_id, embedding, {ivf_dists} FROM embeddings
            ),
            cells AS (
              SELECT vec_id, embedding, {ivf_cell} AS cell FROM dists
            ),
            q AS (SELECT vec_id AS query_id, embedding AS qe, cell FROM cells WHERE vec_id < 10),
            scored AS (
              SELECT q.query_id, c.vec_id AS neighbor_id,
                     {_cos_sql('q.qe', 'c.embedding')} AS cos_sim
              FROM q JOIN cells c ON q.cell = c.cell AND q.query_id != c.vec_id
            )
            SELECT query_id, neighbor_id, cos_sim, rank FROM (
              SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS INT) AS rank
              FROM scored
            ) WHERE rank <= 5 ORDER BY query_id, rank""",
        "ann_topk_lsh": f"""
            WITH b AS (
              SELECT vec_id, embedding,
                     {ann_bucket} AS bucket
              FROM embeddings
            ),
            q AS (SELECT vec_id AS query_id, embedding AS qe, bucket FROM b WHERE vec_id < 10),
            scored AS (
              SELECT q.query_id, c.vec_id AS neighbor_id,
                     {_cos_sql('q.qe', 'c.embedding')} AS cos_sim
              FROM q JOIN b c ON q.bucket = c.bucket AND q.query_id != c.vec_id
            )
            SELECT query_id, neighbor_id, cos_sim, rank FROM (
              SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS INT) AS rank
              FROM scored
            ) WHERE rank <= 5 ORDER BY query_id, rank""",
        "json_extract_events": """
            SELECT event_type,
                   COUNT(*) AS n_events,
                   CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
                   MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
                   MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
                   CAST(SUM(CASE WHEN json_extract_string(props, '$.k') IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_k
            FROM events GROUP BY event_type ORDER BY event_type""",
        "cube_sales": f"""
            SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
                   COALESCE(l_linestatus, 'ALL') AS linestatus,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                   CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue,
                   COUNT(*) AS n_lines
            FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
            ORDER BY returnflag, linestatus""",
        "ntile_customer_spend": f"""
            WITH spend AS (
              SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS spend_dec
              FROM orders GROUP BY o_custkey
            )
            SELECT o_custkey, CAST(spend_dec AS DOUBLE) AS spend,
                   CAST(ntile(10) OVER w AS INT) AS decile,
                   {_gq("percent_rank() OVER w", 6)} AS pct_rank,
                   {_gq("cume_dist() OVER w", 6)} AS cume_dist
            FROM spend
            WINDOW w AS (ORDER BY spend_dec DESC, o_custkey)
            QUALIFY decile = 1
            ORDER BY o_custkey""",
        "event_value_percentiles": f"""
            -- r11 sweep: explicit order-statistics percentiles, lockstep
            -- with profiling.exact_percentiles (engine percentile
            -- libraries interpolate through different expression shapes)
            WITH ranked AS (
              SELECT event_type, value,
                     row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
                     COUNT(*) OVER (PARTITION BY event_type) AS n
              FROM events WHERE value IS NOT NULL
            ),
            q AS (
              SELECT event_type,
                     {", ".join(
                         f'{_interp_sql("value", num, den)} AS {alias}'
                         for alias, num, den in
                         [("q25", 1, 4), ("q50", 1, 2), ("q75", 3, 4), ("q90", 9, 10)]
                     )}
              FROM ranked GROUP BY event_type
            ),
            c AS (SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type)
            SELECT c.event_type, c.n,
                   {_gq("q.q25", 6)} AS p25,
                   {_gq("q.q50", 6)} AS p50,
                   {_gq("q.q75", 6)} AS p75,
                   {_gq("q.q90", 6)} AS p90
            FROM c LEFT JOIN q USING (event_type) ORDER BY event_type""",
        "approx_distinct_users": """
            SELECT event_type, COUNT(DISTINCT user_id) AS n_exact,
                   TRUE AS approx_within_5pct
            FROM events GROUP BY event_type ORDER BY event_type""",
        "embedding_quantize_error": f"""
            WITH v AS (
              SELECT vec_id, label,
                     list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
              FROM embeddings
            ), s AS (
              SELECT vec_id, label, e,
                     list_min(e) AS vmin,
                     (list_max(e) - list_min(e)) / 255.0 AS scale
              FROM v
            )
            SELECT vec_id, label,
                   {_gq("scale", 6)} AS q_scale,
                   {_gq("list_sum(list_transform(e, x -> abs(x - (CASE WHEN scale > 0 THEN vmin + floor((x - vmin) / scale + 0.5) * scale ELSE x END)))) / len(e)", 6)} AS mean_abs_err
            FROM s ORDER BY vec_id""",
        "label_centroid_outliers": f"""
            WITH dims AS (
              SELECT vec_id, label, t.i AS pos,
                     CAST(embedding[t.i] AS DOUBLE) AS x
              FROM embeddings,
                   LATERAL (SELECT unnest(range(1, len(embedding) + 1)) AS i) t
            ), cent AS (
              SELECT label, pos,
                     CAST(SUM(CAST(x AS DECIMAL(30,12))) AS DOUBLE) / COUNT(*) AS c
              FROM dims GROUP BY label, pos
            ), dist AS (
              SELECT d.vec_id, d.label,
                     sqrt(SUM((d.x - c.c) * (d.x - c.c) ORDER BY d.pos)) AS centroid_dist
              FROM dims d JOIN cent c ON d.label = c.label AND d.pos = c.pos
              GROUP BY d.vec_id, d.label
            )
            SELECT label, rnk, vec_id, centroid_dist FROM (
              SELECT label, vec_id, {_gq("centroid_dist", 6)} AS centroid_dist,
                     CAST(row_number() OVER (PARTITION BY label
                          ORDER BY centroid_dist DESC, vec_id) AS INT) AS rnk
              FROM dist
            ) WHERE rnk <= 5 ORDER BY label, rnk""",
        "train_val_split_documents": """
            WITH s AS (
              SELECT source, n_chars, doc_id,
                     CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000 < 8000 THEN 'train'
                          WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000 < 9000 THEN 'val'
                          ELSE 'test' END AS split
              FROM documents
            )
            SELECT source, split, COUNT(*) AS n_docs,
                   CAST(SUM(n_chars) AS BIGINT) AS total_chars,
                   MIN(doc_id) AS first_doc
            FROM s GROUP BY source, split ORDER BY source, split""",
        "trend_value_by_type": """
            WITH s AS (
              -- r10 sweep: grid-quantized y input BEFORE the decimal cast
              -- (a bare double→DECIMAL cast rounds engine-natively — the
              -- half-grid class); x is integer-valued, its cast is exact
              SELECT event_type, COUNT(*) AS n,
                     SUM(CAST(epoch(ts) - 1704067200 AS DECIMAL(18,6))) AS sx,
                     SUM(CAST(""" + _gq("value", 6) + """ AS DECIMAL(18,6))) AS sy,
                     -- the 19,6 up-cast (same value, int128 storage) keeps DuckDB's
                     -- product exact; Spark computes the identical exact product at 18,6
                     SUM(CAST(CAST(CAST(epoch(ts) - 1704067200 AS DECIMAL(18,6)) AS DECIMAL(19,6))
                              * CAST(CAST(""" + _gq("value", 6) + """ AS DECIMAL(18,6)) AS DECIMAL(19,6)) AS DECIMAL(38,12))) AS sxy,
                     SUM(CAST(CAST(CAST(epoch(ts) - 1704067200 AS DECIMAL(18,6)) AS DECIMAL(19,6))
                              * CAST(CAST(epoch(ts) - 1704067200 AS DECIMAL(18,6)) AS DECIMAL(19,6)) AS DECIMAL(38,12))) AS sxx
              FROM events GROUP BY event_type
            )
            SELECT event_type, n,
                   """ + _gq(
            "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
            " / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))",
            6,
        ) + """ AS slope,
                   """ + _gq(
            "(CAST(sy AS DOUBLE)"
            " - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
            " / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))"
            " * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)",
            6,
        ) + """ AS intercept
            FROM s ORDER BY event_type""",
        "cohort_retention_weekly": """
            WITH ev AS (
              SELECT user_id AS u, CAST(floor(epoch(ts) / 604800) AS BIGINT) AS p FROM events
            ), first AS (
              SELECT u, MIN(p) AS cohort_p FROM ev GROUP BY u
            )
            SELECT cohort_p AS cohort_period, p - cohort_p AS period_offset,
                   COUNT(DISTINCT u) AS n_users
            FROM ev JOIN first USING (u)
            GROUP BY 1, 2 ORDER BY 1, 2""",
        "funnel_signup_purchase": """
            WITH t0 AS (
              SELECT user_id AS u, MIN(ts) AS ts0 FROM events
              WHERE event_type = 'view' GROUP BY user_id
            ), c1 AS (
              SELECT e.user_id AS u, MIN(e.ts) AS ts1
              FROM events e JOIN t0 ON e.user_id = t0.u
              WHERE e.event_type = 'click' AND e.ts > t0.ts0 GROUP BY e.user_id
            ), c2 AS (
              SELECT e.user_id AS u, MIN(e.ts) AS ts2
              FROM events e JOIN c1 ON e.user_id = c1.u
              WHERE e.event_type = 'purchase' AND e.ts > c1.ts1 GROUP BY e.user_id
            )
            SELECT (SELECT COUNT(*) FROM t0) AS n_step0_view,
                   (SELECT COUNT(*) FROM c1) AS n_step1_click,
                   (SELECT COUNT(*) FROM c2) AS n_step2_purchase""",
        "segment_dedup_docs": rf"""
            WITH toksrc AS (
              SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS w
              FROM documents
              WHERE length(trim(lower(text))) > 0
                AND len(regexp_split_to_array(trim(lower(text)), '\s+')) >= 5
            ), segs AS (
              SELECT doc_id, t.i AS seg_idx,
                     array_to_string(list_transform(range(1, 6),
                                     j -> w[CAST(t.i * 5 + j AS INT)]), ' ') AS seg
              FROM toksrc, LATERAL (SELECT unnest(range(0, len(w) // 5)) AS i) t
            ), marked AS (
              SELECT doc_id, seg,
                     row_number() OVER (PARTITION BY seg ORDER BY doc_id, seg_idx) > 1 AS is_dup
              FROM segs
            )
            SELECT doc_id, COUNT(*) AS n_segments,
                   CAST(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_segments,
                   {_gq("SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) * 1.0 / COUNT(*)", 6)} AS dup_frac
            FROM marked GROUP BY doc_id ORDER BY doc_id""",
        "orders_gaps_lead_lag": """
            SELECT o_custkey, o_orderkey,
                   date_diff('day', CAST(lag(o_orderdate) OVER w AS DATE),
                             CAST(o_orderdate AS DATE)) AS gap_days,
                   lead(o_orderkey) OVER w AS next_orderkey,
                   CAST(first_value(CAST(o_totalprice AS DECIMAL(18,2))) OVER wf AS DOUBLE) AS first_price,
                   CAST(last_value(CAST(o_totalprice AS DECIMAL(18,2))) OVER wf AS DOUBLE) AS last_price
            FROM orders WHERE o_custkey % 100 = 0
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
                   wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
            ORDER BY o_custkey, o_orderkey""",
        "customer_set_ops": """
            WITH b96 AS (
              SELECT DISTINCT o_custkey FROM orders
              WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
            ), b97 AS (
              SELECT DISTINCT o_custkey FROM orders
              WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
            )
            SELECT 'cohorts' AS label,
                   (SELECT COUNT(*) FROM (SELECT * FROM b96 INTERSECT SELECT * FROM b97)) AS n_both,
                   (SELECT COUNT(*) FROM (SELECT * FROM b96 EXCEPT SELECT * FROM b97)) AS n_only_96,
                   (SELECT COUNT(*) FROM (SELECT * FROM b97 EXCEPT SELECT * FROM b96)) AS n_only_97,
                   (SELECT COUNT(*) FROM (SELECT * FROM b96 UNION SELECT * FROM b97)) AS n_union""",
        "unigram_quality_docs": rf"""
            WITH toks AS (
              SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
              FROM documents WHERE length(trim(lower(text))) > 0
            ), vocab AS (
              SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok
            ), tot AS (SELECT SUM(cnt) AS total FROM vocab),
            sv AS (
              -- grid-quantized libm-log term + rational final (r10/r11
              -- rounding sweep), lockstep with quality.unigram_logprob_score
              SELECT tok, CAST({_gq("ln(cnt * 1.0 / total)", 6)} AS DECIMAL(18,6)) AS logp
              FROM vocab, tot
            )
            SELECT doc_id, COUNT(*) AS n_tokens,
                   {_gq("CAST(SUM(logp) AS DOUBLE) / COUNT(*)", 6)} AS avg_logprob
            FROM toks JOIN sv USING (tok)
            GROUP BY doc_id ORDER BY doc_id""",
        "autocorr_lag1_value_by_type": f"""
            WITH lagged AS (
              -- DECIMAL(28,6), not (18,6): DuckDB's (18,6)x(18,6) product
              -- type keeps only 6 integer digits and OVERFLOWS for values
              -- >= 1e3 (hypothesis-found); (28,6)x(28,6) -> (38,12), exact
              SELECT event_type,
                     CAST({_gq("value", 6)} AS DECIMAL(28,6)) AS x,
                     LAG(CAST({_gq("value", 6)} AS DECIMAL(28,6)))
                       OVER (PARTITION BY event_type ORDER BY ts, event_id) AS y
              FROM events
            ),
            s AS (
              SELECT event_type, COUNT(*) AS n_pairs,
                     SUM(x) AS sx, SUM(y) AS sy,
                     SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
              FROM lagged WHERE y IS NOT NULL GROUP BY event_type
            ),
            g AS (
              SELECT event_type, n_pairs,
                     CAST(n_pairs AS DOUBLE) * CAST(sxy AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS num,
                     CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS ra,
                     CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS rb
              FROM s
            )
            -- radicands guarded BEFORE sqrt: a constant series cancels to a
            -- tiny negative, where DuckDB's sqrt hard-errors (Spark -> NaN)
            SELECT event_type, n_pairs,
                   CASE WHEN ra > 0 AND rb > 0
                        THEN {_gq("num / (sqrt(ra) * sqrt(rb))", 6)}
                   END AS autocorr_lag1
            FROM g ORDER BY event_type""",
        "rolling_z_anomalies_events": """
            WITH scored AS (
              -- r10: grid-quantized input, lockstep with grid_round
              SELECT event_type, event_id,
                     CAST((CASE WHEN abs(value) < 4.61168601842738770e+12 THEN (CASE WHEN (value) >= 0 THEN floor((value) * 1000000.0 + 0.5) / 1000000.0 ELSE -(floor(-(value) * 1000000.0 + 0.5) / 1000000.0) END) ELSE (value) END) AS DECIMAL(28,6)) AS x,
                     COUNT(*) OVER w AS n,
                     SUM(CAST((CASE WHEN abs(value) < 4.61168601842738770e+12 THEN (CASE WHEN (value) >= 0 THEN floor((value) * 1000000.0 + 0.5) / 1000000.0 ELSE -(floor(-(value) * 1000000.0 + 0.5) / 1000000.0) END) ELSE (value) END) AS DECIMAL(28,6))) OVER w AS s,
                     SUM(CAST((CASE WHEN abs(value) < 4.61168601842738770e+12 THEN (CASE WHEN (value) >= 0 THEN floor((value) * 1000000.0 + 0.5) / 1000000.0 ELSE -(floor(-(value) * 1000000.0 + 0.5) / 1000000.0) END) ELSE (value) END) AS DECIMAL(28,6))
                         * CAST((CASE WHEN abs(value) < 4.61168601842738770e+12 THEN (CASE WHEN (value) >= 0 THEN floor((value) * 1000000.0 + 0.5) / 1000000.0 ELSE -(floor(-(value) * 1000000.0 + 0.5) / 1000000.0) END) ELSE (value) END) AS DECIMAL(28,6))) OVER w AS ss
              FROM events
              WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                           ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
            ),
            g AS (
              SELECT event_type, event_id,
                     CAST(x AS DOUBLE) AS value,
                     CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
                     (CAST(n AS DOUBLE) * CAST(ss AS DOUBLE)
                      - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                       / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)) AS var
              FROM scored WHERE n >= 10
            )
            -- r11 sweep: grid form, lockstep with grid_round
            SELECT event_type, event_id, value,
                   mean AS roll_mean,
                   """ + _gq("(value - mean) / sqrt(var)", 6) + """ AS z
            FROM g WHERE var > 0
            ORDER BY abs(""" + _gq("(value - mean) / sqrt(var)", 6) + """) DESC, event_id
            LIMIT 25""",
        "zipf_slope_by_source": f"""
            WITH toks AS (
              SELECT source, unnest({_TOKS}) AS term
              FROM documents WHERE length(trim(lower(text))) > 0
            ),
            tf AS (SELECT source, term, COUNT(*) AS freq FROM toks GROUP BY 1, 2),
            ranked AS (
              SELECT source, freq,
                     row_number() OVER (PARTITION BY source
                                        ORDER BY freq DESC, term) AS rank
              FROM tf
            ),
            q AS (
              -- grid-quantized ln terms (r11 sweep): the Spark side goes
              -- through grouped_linear_trend's shared grid_round; this
              -- oracle had been left on engine round() — lockstep restored
              SELECT source,
                     CAST({_gq("ln(CAST(rank AS DOUBLE))", 6)} AS DECIMAL(18,6)) AS x,
                     CAST({_gq("ln(CAST(freq AS DOUBLE))", 6)} AS DECIMAL(18,6)) AS y
              FROM ranked WHERE rank <= 100
            ),
            s AS (
              SELECT source, COUNT(*) AS n_terms,
                     SUM(x) AS sx, SUM(y) AS sy,
                     SUM(x * x) AS sxx, SUM(x * y) AS sxy
              FROM q GROUP BY source
            )
            SELECT source, n_terms,
                   CASE WHEN CAST(n_terms AS DOUBLE) * CAST(sxx AS DOUBLE)
                             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
                        THEN (CAST(n_terms AS DOUBLE) * CAST(sxy AS DOUBLE)
                              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                             / (CAST(n_terms AS DOUBLE) * CAST(sxx AS DOUBLE)
                                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                   END AS zipf_slope
            FROM s ORDER BY source""",
        "kmeans_assign_embeddings": f"""
            WITH seeds AS (
              SELECT vec_id AS seed_id, embedding AS seed_vec
              FROM embeddings ORDER BY vec_id LIMIT 8
            ),
            dists AS (
              SELECT e.vec_id, s.seed_id,
                     SUM(CAST({_gq("(CAST(e.embedding[g.i] AS DOUBLE) - CAST(s.seed_vec[g.i] AS DOUBLE)) * (CAST(e.embedding[g.i] AS DOUBLE) - CAST(s.seed_vec[g.i] AS DOUBLE))", 6)}
                              AS DECIMAL(38,6))) AS dist
              FROM embeddings e
                   CROSS JOIN seeds s,
                   LATERAL (SELECT unnest(range(1, len(e.embedding) + 1)) AS i) g
              GROUP BY 1, 2
            ),
            best AS (
              SELECT vec_id, seed_id AS cluster, dist,
                     row_number() OVER (PARTITION BY vec_id
                                        ORDER BY dist, seed_id) AS rk
              FROM dists
            )
            SELECT cluster, COUNT(*) AS n_points,
                   {_gq("CAST(SUM(dist) AS DOUBLE)", 6)} AS total_sqdist
            FROM best WHERE rk = 1 GROUP BY cluster ORDER BY cluster""",
        "doc_length_band_by_source": f"""
            -- r11 sweep: explicit order-statistics bounds (positions in
            -- exact twentieths), lockstep with profiling.exact_percentiles
            WITH ranked AS (
              SELECT source, n_chars,
                     row_number() OVER (PARTITION BY source ORDER BY n_chars) AS rn,
                     COUNT(*) OVER (PARTITION BY source) AS n
              FROM documents WHERE n_chars IS NOT NULL
            ),
            bounds AS (
              SELECT source,
                     {_interp_sql("n_chars", 1, 20)} AS plo,
                     {_interp_sql("n_chars", 19, 20)} AS phi
              FROM ranked GROUP BY source
            )
            SELECT d.source, COUNT(*) AS n_docs,
                   CAST(SUM(CASE WHEN n_chars >= plo AND n_chars <= phi
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
                   CAST(SUM(CASE WHEN n_chars >= plo AND n_chars <= phi
                                 THEN n_chars ELSE 0 END) AS BIGINT) AS chars_kept,
                   {_gq("MIN(plo)", 6)} AS p_lo,
                   {_gq("MIN(phi)", 6)} AS p_hi
            FROM documents d LEFT JOIN bounds b USING (source)
            GROUP BY d.source ORDER BY d.source""",
        "fixed_k_sample_per_source": """
            WITH ranked AS (
              SELECT source, doc_id, n_chars,
                     row_number() OVER (PARTITION BY source
                                        ORDER BY md5(CAST(doc_id AS VARCHAR)),
                                                 doc_id) AS sample_rank
              FROM documents
            )
            SELECT source, sample_rank, doc_id, n_chars
            FROM ranked WHERE sample_rank <= 5
            ORDER BY source, sample_rank""",
        "normalized_dedup_docs": r"""
            WITH normed AS (
              SELECT doc_id,
                     CASE WHEN length(trim(lower(text))) = 0 THEN ''
                          ELSE array_to_string(list_sort(list_distinct(
                                 regexp_split_to_array(trim(lower(text)), '\s+'))), ' ')
                     END AS norm
              FROM documents
            )
            SELECT md5(norm) AS norm_hash, COUNT(*) AS n_docs,
                   MIN(doc_id) AS keep_id, MAX(doc_id) AS max_id,
                   MIN(length(norm)) AS norm_chars
            FROM normed GROUP BY norm_hash HAVING COUNT(*) > 1
            ORDER BY norm_hash""",
        "streaming_enrich_cohorts": """
            WITH dim AS (
              SELECT user_id,
                     CAST(floor(CAST(epoch_us(MIN(ts)) AS DOUBLE) / 604800000000.0)
                          AS BIGINT) AS cohort_week
              FROM events GROUP BY user_id
            )
            SELECT CAST(floor(epoch(e.ts) / 86400) * 86400 AS BIGINT)
                     AS window_start_epoch,
                   d.cohort_week,
                   COUNT(*) AS n_events
            FROM events e JOIN dim d USING (user_id)
            GROUP BY 1, 2 ORDER BY 1, 2""",
        "source_vocab_jaccard": f"""
            WITH vocab AS (
              SELECT DISTINCT source AS g, t.term
              FROM (SELECT source, unnest({_TOKS}) AS term FROM documents
                    WHERE length(trim(lower(text))) > 0) t
            ),
            sizes AS (SELECT g, COUNT(*) AS n_terms FROM vocab GROUP BY g),
            pairs AS (
              SELECT a.g AS source_a, b.g AS source_b, COUNT(*) AS n_common
              FROM vocab a JOIN vocab b ON a.term = b.term AND a.g < b.g
              GROUP BY 1, 2
            )
            SELECT p.source_a, p.source_b, p.n_common,
                   sa.n_terms AS n_a, sb.n_terms AS n_b,
                   CAST(p.n_common AS DOUBLE)
                     / CAST(sa.n_terms + sb.n_terms - p.n_common AS DOUBLE) AS jaccard
            FROM pairs p
                 JOIN sizes sa ON sa.g = p.source_a
                 JOIN sizes sb ON sb.g = p.source_b
            ORDER BY p.source_a, p.source_b""",
        "decayed_popularity_by_type": f"""
            WITH ref AS (SELECT MAX(ts) AS ref_ts FROM events),
            w AS (
              SELECT event_type,
                     CAST({_gq("exp(-0.6931471805599453 * (CAST(epoch_us(ref_ts) AS DOUBLE) / 1e6 - CAST(epoch_us(ts) AS DOUBLE) / 1e6) / (24.0 * 3600.0))", 6)}
                          AS DECIMAL(18,6)) AS wgt
              FROM events, ref
            )
            SELECT event_type, COUNT(*) AS n_events,
                   CAST(SUM(wgt) AS DOUBLE) AS decayed_score
            FROM w GROUP BY event_type ORDER BY event_type""",
        "lang_source_chisq": f"""
            WITH cells AS (
              SELECT lang, source, COUNT(*) AS n_ij FROM documents
              WHERE lang IS NOT NULL AND source IS NOT NULL GROUP BY 1, 2
            ),
            rm AS (SELECT lang, SUM(n_ij) AS n_i FROM cells GROUP BY lang),
            cm AS (SELECT source, SUM(n_ij) AS n_j FROM cells GROUP BY source),
            tot AS (SELECT CAST(SUM(n_ij) AS BIGINT) AS n,
                           COUNT(DISTINCT lang) AS n_rows,
                           COUNT(DISTINCT source) AS n_cols
                    FROM cells),
            grid AS (
              SELECT r.lang, m.source, r.n_i, m.n_j,
                     COALESCE(c.n_ij, 0) AS n_ij
              FROM rm r CROSS JOIN cm m
                   LEFT JOIN cells c ON c.lang = r.lang AND c.source = m.source
            ),
            terms AS (
              SELECT CAST({_gq("(CAST(g.n_ij AS DOUBLE) - CAST(g.n_i AS DOUBLE) * CAST(g.n_j AS DOUBLE) / CAST(t.n AS DOUBLE)) * (CAST(g.n_ij AS DOUBLE) - CAST(g.n_i AS DOUBLE) * CAST(g.n_j AS DOUBLE) / CAST(t.n AS DOUBLE)) / (CAST(g.n_i AS DOUBLE) * CAST(g.n_j AS DOUBLE) / CAST(t.n AS DOUBLE))", 6)} AS DECIMAL(18,6)) AS trm
              FROM grid g, tot t
            )
            SELECT CAST(SUM(trm) AS DOUBLE) AS chi2,
                   CAST((t.n_rows - 1) * (t.n_cols - 1) AS BIGINT) AS dof,
                   t.n
            FROM terms, tot t GROUP BY t.n_rows, t.n_cols, t.n""",
        "simhash_near_pairs": rf"""
            WITH {_SIMHASH_CAND_CTE}
            SELECT doc_a, doc_b,
                   CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
            FROM cand WHERE bit_count(xor(sa, sb)) <= 3
            ORDER BY doc_a, doc_b""",
        "simhash_neardup_clusters": rf"""
            WITH RECURSIVE {_SIMHASH_CAND_CTE},
            spairs AS (
              SELECT doc_a, doc_b FROM cand WHERE bit_count(xor(sa, sb)) <= 3
            ),
            edges AS (
              SELECT doc_a AS src, doc_b AS dst FROM spairs
              UNION SELECT doc_b, doc_a FROM spairs
            ),
            reach(src, dst) AS (
              SELECT src, src FROM (SELECT DISTINCT src FROM edges)
              UNION
              SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
            ),
            comp AS (SELECT src AS node, MIN(dst) AS label FROM reach GROUP BY src),
            sized AS (
              SELECT c.node, c.label, d.n_chars FROM comp c JOIN documents d ON d.doc_id = c.node
            ),
            ranked AS (
              SELECT node, label, ROW_NUMBER() OVER (
                PARTITION BY label ORDER BY n_chars DESC, node ASC) AS rk
              FROM sized
            )
            SELECT label AS cluster_id, COUNT(*) AS n_docs,
                   MAX(CASE WHEN rk = 1 THEN node END) AS canonical_doc_id
            FROM ranked GROUP BY label ORDER BY cluster_id""",
        "cusum_changepoint_by_type": f"""
            WITH q AS (
              SELECT event_type, event_id, ts,
                     CAST({_gq("value", 6)} AS DECIMAL(18,6)) AS x
              FROM events
            ), c AS (
              SELECT event_type, event_id,
                     SUM(x) OVER (PARTITION BY event_type ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                     row_number() OVER (PARTITION BY event_type
                                        ORDER BY ts, event_id) AS i
              FROM q
            ), t AS (
              SELECT event_type, SUM(x) AS tot, COUNT(*) AS n
              FROM q GROUP BY event_type
            ), s AS (
              SELECT c.event_type, t.n, c.event_id,
                     abs(CAST(c.cum AS DOUBLE)
                         - CAST(c.i AS DOUBLE)
                           * (CAST(t.tot AS DOUBLE) / CAST(t.n AS DOUBLE))) AS abs_s
              FROM c JOIN t USING (event_type)
            )
            SELECT event_type, n, event_id AS change_point_id,
                   abs_s AS max_abs_cusum
            FROM (SELECT *, row_number() OVER (PARTITION BY event_type
                                               ORDER BY abs_s DESC, event_id) AS rk
                  FROM s)
            WHERE rk = 1 ORDER BY event_type""",
        "global_docs_sample": """
            SELECT doc_id, source, n_chars FROM (
              SELECT doc_id, source, n_chars
              FROM documents WHERE doc_id IS NOT NULL
              ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
              LIMIT 50
            ) ORDER BY doc_id""",
        "multimodal_jpeg_pipeline": """
            SELECT doc_id,
                   CAST(16 + n_chars % 16 AS INT) AS width,
                   CAST(16 + (n_chars // 16) % 16 AS INT) AS height,
                   CAST(3 AS INT) AS channels,
                   'jpeg' AS format,
                   TRUE AS payload_nonempty
            FROM documents WHERE doc_id % 20 = 0 ORDER BY doc_id""",
        "length_drift_ks": """
            WITH tagged AS (
              SELECT n_chars AS x,
                     CASE WHEN source = 'src1' THEN 1 ELSE 0 END AS a,
                     CASE WHEN source = 'src2' THEN 1 ELSE 0 END AS b
              FROM documents WHERE source IN ('src1', 'src2')
            ),
            per_x AS (SELECT x, SUM(a) AS ca, SUM(b) AS cb FROM tagged GROUP BY x),
            tot AS (SELECT SUM(a) AS na, SUM(b) AS nb FROM tagged),
            cum AS (
              SELECT x,
                     SUM(ca) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS cum_a,
                     SUM(cb) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS cum_b
              FROM per_x
            ),
            d AS (
              SELECT x, na, nb,
                     abs(CAST(cum_a AS DOUBLE) / CAST(na AS DOUBLE)
                         - CAST(cum_b AS DOUBLE) / CAST(nb AS DOUBLE)) AS dd
              FROM cum, tot
            )
            SELECT dd AS ks, x AS at_value,
                   CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b
            FROM (SELECT *, row_number() OVER (ORDER BY dd DESC, x) AS rk FROM d)
            WHERE rk = 1""",
        "bigram_lm_docs": f"""
            WITH toks AS (
              SELECT doc_id, {_TOKS} AS w FROM documents
              WHERE length(trim(lower(text))) > 0 AND len({_TOKS}) >= 2
            ),
            doc_bi AS (
              SELECT doc_id, w[i] AS w1, w[i+1] AS w2
              FROM toks, LATERAL (SELECT unnest(range(1, len(w))) AS i) x
            ),
            bi AS (SELECT w1, w2, COUNT(*) AS c12 FROM doc_bi GROUP BY 1, 2),
            uni AS (
              SELECT t.term, COUNT(*) AS c1
              FROM (SELECT unnest({_TOKS}) AS term FROM documents
                    WHERE length(trim(lower(text))) > 0) t
              GROUP BY 1
            ),
            v AS (SELECT COUNT(*) AS v FROM uni),
            scored AS (
              SELECT d.doc_id,
                     CAST({_gq("ln((b.c12 + 1.0) / (CAST(u.c1 AS DOUBLE) + CAST(v.v AS DOUBLE)))", 6)}
                          AS DECIMAL(18,6)) AS lp
              FROM doc_bi d JOIN bi b USING (w1, w2)
                   JOIN uni u ON u.term = d.w1, v
            )
            SELECT doc_id, COUNT(*) AS n_bigrams,
                   {_gq("CAST(SUM(lp) AS DOUBLE) / COUNT(*)", 6)} AS avg_bigram_logprob
            FROM scored GROUP BY doc_id ORDER BY doc_id""",
        "minhash_calibration_audit": f"""
            WITH {_SHINGLE_CTE}, {_minhash_cte()},
            sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
            inter AS (
              SELECT p.doc_a, p.doc_b, COUNT(*) AS n_inter
              FROM pairs p
                   JOIN sh x ON x.doc_id = p.doc_a
                   JOIN sh y ON y.doc_id = p.doc_b AND y.shingle = x.shingle
              GROUP BY 1, 2
            ),
            per_pair AS (
              SELECT p.doc_a, p.doc_b,
                     (CASE WHEN a.mh_0 = b.mh_0 THEN 1 ELSE 0 END + CASE WHEN a.mh_1 = b.mh_1 THEN 1 ELSE 0 END + CASE WHEN a.mh_2 = b.mh_2 THEN 1 ELSE 0 END + CASE WHEN a.mh_3 = b.mh_3 THEN 1 ELSE 0 END + CASE WHEN a.mh_4 = b.mh_4 THEN 1 ELSE 0 END + CASE WHEN a.mh_5 = b.mh_5 THEN 1 ELSE 0 END + CASE WHEN a.mh_6 = b.mh_6 THEN 1 ELSE 0 END + CASE WHEN a.mh_7 = b.mh_7 THEN 1 ELSE 0 END + CASE WHEN a.mh_8 = b.mh_8 THEN 1 ELSE 0 END + CASE WHEN a.mh_9 = b.mh_9 THEN 1 ELSE 0 END + CASE WHEN a.mh_10 = b.mh_10 THEN 1 ELSE 0 END + CASE WHEN a.mh_11 = b.mh_11 THEN 1 ELSE 0 END) AS est_matches,
                     CAST({_gq("i.n_inter * 1.0 / (za.n_sh + zb.n_sh - i.n_inter)", 6)}
                          AS DECIMAL(18,6)) AS jac
              FROM pairs p
                   JOIN mh a ON a.doc_id = p.doc_a
                   JOIN mh b ON b.doc_id = p.doc_b
                   JOIN sizes za ON za.doc_id = p.doc_a
                   JOIN sizes zb ON zb.doc_id = p.doc_b
                   -- INNER join like the Spark verify: a banding false
                   -- positive with zero shingle overlap is dropped by
                   -- ngram_jaccard on both sides, not scored as jac=0
                   JOIN inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b
            )
            SELECT est_matches,
                   {_gq("est_matches / 12.0", 6)} AS est_jaccard,
                   COUNT(*) AS n_pairs,
                   CAST(SUM(jac) AS DOUBLE) / COUNT(*) AS avg_exact_jaccard,
                   CAST(SUM(CAST({_gq("abs(CAST(est_matches AS DOUBLE) / 12.0 - CAST(jac AS DOUBLE))", 6)}
                                 AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
                     AS mean_abs_error
            FROM per_pair GROUP BY est_matches ORDER BY est_matches""",
        "cms_heavy_hitter_terms": rf"""
            WITH toks AS (
              SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
              FROM documents WHERE length(trim(text)) > 0
            ),
            js AS (SELECT unnest(range(0, 4)) AS j),
            cells AS (
              SELECT j, {_CMS_BUCKET.format(j='j', term='term', width=1024)} AS bucket, COUNT(*) AS c
              FROM toks, js GROUP BY 1, 2
            ),
            tot AS (SELECT SUM(c) AS t FROM cells WHERE j = 0),
            terms AS (SELECT DISTINCT term FROM toks),
            est AS (
              SELECT t.term, MIN(c.c) AS cms_estimate
              FROM terms t, js
              JOIN cells c ON c.j = js.j
               AND c.bucket = {_CMS_BUCKET.format(j='js.j', term='t.term', width=1024)}
              GROUP BY t.term
            ),
            cand AS (SELECT term, cms_estimate FROM est, tot WHERE cms_estimate * 2000 >= t),
            exact AS (
              SELECT k.term, k.cms_estimate, COUNT(*) AS n_exact
              FROM toks JOIN cand k USING (term) GROUP BY 1, 2
            )
            SELECT term, cms_estimate, n_exact FROM exact, tot
            WHERE n_exact * 2000 >= t ORDER BY n_exact DESC, term""",
        "pq_encode_embeddings": f"""
            WITH seeds AS ({_PQ['seeds']}),
            dists AS (SELECT e.vec_id, s.seed_id, {_PQ['dist_cols']}
                      FROM embeddings e CROSS JOIN seeds s),
            ranked AS (SELECT *, {_PQ['rk_cols']} FROM dists),
            agg AS (SELECT vec_id, {_PQ['code_cols']}, {_PQ['md_cols']}
                    FROM ranked GROUP BY vec_id)
            SELECT vec_id, code_0, code_1, code_2, code_3,
                   {_gq(f"CAST({_PQ['qerr']} AS DOUBLE)", 6)} AS qerr
            FROM agg ORDER BY vec_id""",
        "pq_adc_topk_embeddings": f"""
            WITH seeds AS ({_PQ['seeds']}),
            dists AS (SELECT e.vec_id, s.seed_id, {_PQ['dist_cols']}
                      FROM embeddings e CROSS JOIN seeds s),
            ranked AS (SELECT *, {_PQ['rk_cols']} FROM dists),
            codes AS (SELECT vec_id, {_PQ['code_cols']} FROM ranked GROUP BY vec_id),
            lut AS (SELECT q.vec_id AS query_id, s.seed_id, {_PQ['qd_cols']}
                    FROM embeddings q CROSS JOIN seeds s WHERE q.vec_id < 10),
            scored AS (
              SELECT l.query_id, c.vec_id AS neighbor_id, {_PQ['adc']} AS adc
              FROM codes c JOIN lut l ON TRUE
              GROUP BY l.query_id, c.vec_id
            )
            SELECT query_id, neighbor_id, {_gq("CAST(adc AS DOUBLE)", 6)} AS adc_dist, rank
            FROM (
              SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                                                ORDER BY adc, neighbor_id) AS INT) AS rank
              FROM scored WHERE query_id != neighbor_id
            ) WHERE rank <= 5 ORDER BY query_id, rank""",
        "bpe_merge_candidates_corpus": r"""
            WITH words AS (
              SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS word
              FROM documents WHERE length(trim(text)) > 0
            ),
            vocab AS (
              SELECT word, COUNT(*) AS freq FROM words
              WHERE length(word) >= 2 GROUP BY word
            ),
            pairs AS (
              SELECT substr(word, CAST(g.i AS INT), 2) AS pair,
                     CAST(SUM(freq) AS BIGINT) AS n_occurrences
              FROM vocab, LATERAL (SELECT unnest(range(1, length(word))) AS i) g
              GROUP BY 1
            )
            SELECT pair, n_occurrences FROM pairs
            ORDER BY n_occurrences DESC, pair LIMIT 20""",
        "pagerank_terms_corpus": pagerank_oracle,
        "bloom_semi_revenue": f"""
            SELECT l_returnflag,
                   CAST(COUNT(*) AS BIGINT) AS n_items,
                   CAST(SUM({rev}) AS DOUBLE) AS revenue
            FROM lineitem
            WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                                 WHERE o_orderpriority = '1-URGENT')
            GROUP BY l_returnflag ORDER BY l_returnflag""",
        "fuzzy_name_pairs_parts": """
            WITH n AS (
              SELECT DISTINCT p_name AS name FROM part WHERE p_name IS NOT NULL
            ), b AS (
              SELECT name, split_part(name, ' ', -1) AS block FROM n
            )
            SELECT a.block, a.name AS name_a, c.name AS name_b,
                   CAST(levenshtein(a.name, c.name) AS INT) AS dist
            FROM b a JOIN b c ON a.block = c.block AND a.name < c.name
            WHERE levenshtein(a.name, c.name) <= 3
            ORDER BY a.block, name_a, name_b""",
        "weighted_sample_docs": f"""
            WITH s AS (
              SELECT doc_id, source, n_chars,
                     {_gq("ln((CAST(('0x' || substr(md5('aes:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) + 0.5) / 4294967296.0) / CAST(n_chars AS DOUBLE)", 6)} AS aes_key
              FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0
            ), r AS (
              SELECT doc_id, source, n_chars,
                     CAST(row_number() OVER (PARTITION BY source
                                             ORDER BY aes_key DESC, doc_id) AS INT) AS sample_rank
              FROM s
            )
            SELECT doc_id, source, n_chars, sample_rank FROM r
            WHERE sample_rank <= 3 ORDER BY source, sample_rank""",
        "benford_order_totals": f"""
            WITH obs AS (
              SELECT CAST(substr(CAST(CAST({_gq("o_totalprice * 100", 0)} AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit,
                     CAST(COUNT(*) AS BIGINT) AS n_obs
              FROM orders WHERE o_totalprice IS NOT NULL
                AND CAST({_gq("o_totalprice * 100", 0)} AS BIGINT) > 0
              GROUP BY 1
            ), tot AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS t FROM obs),
            expect(digit, benford_frac) AS (VALUES {benford_vals})
            SELECT e.digit,
                   CAST(COALESCE(o.n_obs, 0) AS BIGINT) AS n_obs,
                   {_gq("COALESCE(o.n_obs, 0) / CAST(tot.t AS DOUBLE)", 6)} AS obs_frac,
                   {_gq("e.benford_frac", 6)} AS benford_frac,
                   {_gq("abs(COALESCE(o.n_obs, 0) / CAST(tot.t AS DOUBLE) - e.benford_frac)", 6)} AS abs_dev
            FROM expect e LEFT JOIN obs o ON o.digit = e.digit CROSS JOIN tot
            ORDER BY e.digit""",
        "ivfpq_topk_embeddings": f"""
            WITH seeds AS ({_PQ['seeds']}),
            dists AS (SELECT e.vec_id, s.seed_id, {_PQ['dist_cols']}
                      FROM embeddings e CROSS JOIN seeds s),
            ranked AS (SELECT *, {_PQ['rk_cols']} FROM dists),
            codes AS (SELECT vec_id, {_PQ['code_cols']} FROM ranked GROUP BY vec_id),
            cellsrc AS (SELECT vec_id, {ivf_dists} FROM embeddings),
            cells AS (SELECT vec_id, {ivf_cell} AS cell FROM cellsrc),
            lut AS (SELECT q.vec_id AS query_id, s.seed_id, {_PQ['qd_cols']}
                    FROM embeddings q CROSS JOIN seeds s WHERE q.vec_id < 10),
            scored AS (
              SELECT l.query_id, c.vec_id AS neighbor_id, {_PQ['adc']} AS adc
              FROM codes c
                   JOIN cells nc ON nc.vec_id = c.vec_id
                   JOIN lut l ON TRUE
                   JOIN cells qc ON qc.vec_id = l.query_id
              WHERE nc.cell = qc.cell
              GROUP BY l.query_id, c.vec_id
            )
            SELECT query_id, neighbor_id, {_gq("CAST(adc AS DOUBLE)", 6)} AS adc_dist, rank
            FROM (
              SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                                                ORDER BY adc, neighbor_id) AS INT) AS rank
              FROM scored WHERE query_id != neighbor_id
            ) WHERE rank <= 5 ORDER BY query_id, rank""",
        "holt_forecast_by_type": holt_oracle,
        "streaming_sliding_counts": """
            SELECT CAST((floor(epoch(ts) / 3600) - k.k) * 3600 AS BIGINT) AS window_start_epoch,
                   event_type, COUNT(*) AS n_events, MAX(value) AS max_value
            FROM events CROSS JOIN (VALUES (0), (1)) k(k)
            GROUP BY 1, 2 ORDER BY window_start_epoch, event_type""",
        "hard_negatives_embeddings": f"""
            WITH q AS (SELECT vec_id AS anchor_id, label AS anchor_label, embedding AS qe
                       FROM embeddings WHERE vec_id < 10),
            scored AS (
              SELECT q.anchor_id, q.anchor_label, e.vec_id AS neighbor_id,
                     e.label AS neighbor_label,
                     {_cos_sql('q.qe', 'e.embedding')} AS cos_sim
              FROM q CROSS JOIN embeddings e WHERE q.anchor_label != e.label
            )
            SELECT anchor_id, anchor_label, neighbor_id, neighbor_label, cos_sim, rank
            FROM (
              SELECT *, CAST(row_number() OVER (PARTITION BY anchor_id
                                                ORDER BY cos_sim DESC, neighbor_id) AS INT) AS rank
              FROM scored
            ) WHERE rank <= 5 ORDER BY anchor_id, rank""",
        "basket_lift_parts": f"""
            WITH items AS (SELECT DISTINCT l_orderkey AS basket, l_partkey AS item FROM lineitem),
            nb AS (SELECT COUNT(DISTINCT basket) AS n FROM items),
            ic AS (SELECT item, COUNT(*) AS item_cnt FROM items GROUP BY item),
            pairs AS (
              SELECT a.item AS item_a, b.item AS item_b, CAST(COUNT(*) AS BIGINT) AS pair_cnt
              FROM items a JOIN items b ON a.basket = b.basket AND a.item < b.item
              GROUP BY 1, 2 HAVING COUNT(*) >= 2)
            SELECT p.item_a, p.item_b, p.pair_cnt,
                   ca.item_cnt AS cnt_a, cb.item_cnt AS cnt_b,
                   {_gq("CAST(p.pair_cnt AS DOUBLE) * nb.n / (CAST(ca.item_cnt AS DOUBLE) * CAST(cb.item_cnt AS DOUBLE))", 6)} AS lift
            FROM pairs p, nb
            JOIN ic ca ON ca.item = p.item_a
            JOIN ic cb ON cb.item = p.item_b
            ORDER BY p.pair_cnt DESC, p.item_a, p.item_b LIMIT 20""",
        "rfm_segments_customers": """
            WITH pc AS (
              SELECT o_custkey, MAX(o_orderdate) AS rd, COUNT(*) AS freq,
                     SUM(o_totalprice) AS mon
              FROM orders GROUP BY o_custkey),
            sc AS (
              SELECT o_custkey, mon,
                     CAST(NTILE(5) OVER (ORDER BY rd DESC, o_custkey) AS INT) AS r_score,
                     CAST(NTILE(5) OVER (ORDER BY freq DESC, o_custkey) AS INT) AS f_score,
                     CAST(NTILE(5) OVER (ORDER BY mon DESC, o_custkey) AS INT) AS m_score
              FROM pc)
            SELECT r_score, f_score, m_score, COUNT(*) AS n_customers,
                   SUM(mon) AS segment_monetary
            FROM sc GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",
        "trimmed_mean_value_by_type": """
            WITH ranked AS (
              SELECT event_type, value,
                     row_number() OVER (PARTITION BY event_type
                                        ORDER BY value, event_id) AS rn,
                     COUNT(*) OVER (PARTITION BY event_type) AS n
              FROM events WHERE value IS NOT NULL),
            kept AS (
              SELECT * FROM ranked
              WHERE rn > floor(n * 0.1) AND rn <= n - floor(n * 0.1))
            -- pure-double grid (engine round() diverges on the rational
            -- mean's half-grid — the winsorized class); r10: grid-quantized
            -- input BEFORE the decimal cast (a bare double→DECIMAL cast
            -- rounds engine-natively) and the sign-symmetric final, both
            -- lockstep with grid_round
            SELECT event_type, COUNT(*) AS n_kept,
                   """ + _gq(
            "CAST(SUM(CAST(" + _gq("value", 6) + " AS DECIMAL(18,6))) AS DOUBLE)"
            " / COUNT(*)",
            6,
        ) + """ AS trimmed_mean
            FROM kept GROUP BY event_type ORDER BY event_type""",
        "mann_kendall_trend_by_type": """
            WITH daily AS (
              SELECT event_type, CAST(ts AS DATE) AS period,
                     SUM(CAST(value AS DECIMAL(18,6))) AS s, COUNT(*) AS n
              FROM events WHERE value IS NOT NULL
              GROUP BY 1, 2),
            pairs AS (
              SELECT a.event_type,
                     CASE WHEN b.s * a.n > a.s * b.n THEN 1
                          WHEN b.s * a.n < a.s * b.n THEN -1 ELSE 0 END AS s
              FROM daily a JOIN daily b
                ON a.event_type = b.event_type AND a.period < b.period),
            np AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_periods
                   FROM daily GROUP BY event_type)
            SELECT p.event_type, CAST(SUM(p.s) AS BIGINT) AS s_statistic, np.n_periods
            FROM pairs p JOIN np ON np.event_type = p.event_type
            GROUP BY p.event_type, np.n_periods ORDER BY p.event_type""",
        "c4_quality_filter_docs": r"""
            WITH flags AS (
              SELECT doc_id,
                CAST(len(list_filter(string_split(text, chr(10)),
                                     x -> length(trim(x)) > 0)) AS INT) AS n_lines,
                CAST(len(list_filter(string_split(text, chr(10)),
                                     x -> length(trim(x)) > 0
                                          AND regexp_matches(rtrim(x), '[.!?"]$'))) AS INT)
                  AS n_terminal_lines,
                contains(lower(text), 'lorem ipsum') AS has_lorem_ipsum,
                contains(text, '{') AS has_curly_brace
              FROM documents)
            SELECT doc_id, n_lines, n_terminal_lines, has_lorem_ipsum, has_curly_brace,
                   (n_terminal_lines >= 3 AND NOT has_lorem_ipsum AND NOT has_curly_brace)
                     AS c4_keep
            FROM flags ORDER BY doc_id""",
        "readability_docs": rf"""
            WITH counts AS (
              SELECT doc_id,
                CAST({_NTOK} AS INT) AS n_words,
                CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS INT)
                  AS n_sentences,
                CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
                     + ({_NTOK}
                        - len(list_filter({_TOKS}, x -> regexp_matches(x, '[aeiouy]'))))
                  AS INT) AS n_syllables
              FROM documents)
            SELECT doc_id, n_words, n_sentences, n_syllables,
                   CASE WHEN n_words > 0 THEN
                     (CASE WHEN abs(206.835 - 1.015 * CAST(n_words AS DOUBLE) / n_sentences - 84.6 * CAST(n_syllables AS DOUBLE) / n_words) < 4.61168601842738800e+16 THEN (CASE WHEN (206.835 - 1.015 * CAST(n_words AS DOUBLE) / n_sentences - 84.6 * CAST(n_syllables AS DOUBLE) / n_words) >= 0 THEN floor((206.835 - 1.015 * CAST(n_words AS DOUBLE) / n_sentences - 84.6 * CAST(n_syllables AS DOUBLE) / n_words) * 100.0 + 0.5) / 100.0 ELSE -(floor(-(206.835 - 1.015 * CAST(n_words AS DOUBLE) / n_sentences - 84.6 * CAST(n_syllables AS DOUBLE) / n_words) * 100.0 + 0.5) / 100.0) END) ELSE (206.835 - 1.015 * CAST(n_words AS DOUBLE) / n_sentences - 84.6 * CAST(n_syllables AS DOUBLE) / n_words) END)
                   END AS flesch
            FROM counts ORDER BY doc_id""",
        "luhn_check_orders": """
            WITH cand AS (
              SELECT o_orderpriority,
                     lpad(CAST(o_orderkey AS VARCHAR), 14, '5') AS c
              FROM orders),
            checked AS (
              SELECT o_orderpriority,
                     (len(ds) > 1 AND
                      list_sum(list_transform(range(1, len(ds)+1),
                        i -> CASE WHEN (i-1) % 2 = 1
                                  THEN CASE WHEN CAST(ds[i] AS INT)*2 > 9
                                            THEN CAST(ds[i] AS INT)*2-9
                                            ELSE CAST(ds[i] AS INT)*2 END
                                  ELSE CAST(ds[i] AS INT) END)) % 10 = 0) AS ok
              FROM (SELECT o_orderpriority,
                           list_filter(string_split(reverse(c), ''), x -> x != '') AS ds
                    FROM cand))
            SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_candidates,
                   CAST(SUM(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS n_luhn_valid
            FROM checked GROUP BY o_orderpriority ORDER BY o_orderpriority""",
        "seasonal_strength_value_by_type": f"""
            -- grid-6 input quantization + (28,6) product operands
            -- (int128 path; the r11 magnitude sweep caught the int64
            -- product overflowing) + dec_double VARCHAR round-trips on
            -- the wide sums (lockstep with
            -- analytics.seasonal_strength_by_group)
            WITH base AS (
              SELECT event_type, CAST(floor(epoch(ts) / 86400.0) AS BIGINT) % 7 AS dow,
                     CAST({_gq("CAST(value AS DOUBLE)", 6)} AS DECIMAL(18,6)) AS x
              FROM events WHERE value IS NOT NULL),
            per_dow AS (
              SELECT event_type, dow, SUM(x) AS s, COUNT(*) AS n
              FROM base GROUP BY 1, 2),
            per_group AS (
              SELECT event_type, SUM(x) AS st,
                     CAST(SUM(CAST(x AS DECIMAL(28,6)) * CAST(x AS DECIMAL(28,6))) AS DECIMAL(38,12)) AS sq,
                     COUNT(*) AS nt
              FROM base GROUP BY 1)
            SELECT g.event_type, CAST(g.nt AS BIGINT) AS n_obs,
                   -- normalized t_d = s_d^2/(n_d*sq) in [0,1] as 1e-9
                   -- scaled integers (exact HUGEINT sum — the raw-double
                   -- sum was partition-order-dependent), c = st^2/(nt*sq)
                   CASE WHEN g.sq > 0
                             AND 1.0 - {_dd("g.st")} * {_dd("g.st")} / (CAST(g.nt AS DOUBLE) * {_dd("g.sq")}) <> 0
                        THEN {_gq(f'(CAST(SUM(CASE WHEN g.sq > 0 THEN CAST(floor({_dd("d.s")} * {_dd("d.s")} / (CAST(d.n AS DOUBLE) * {_dd("g.sq")}) * 1e9 + 0.5) AS HUGEINT) ELSE 0 END) AS DOUBLE) / 1e9 - {_dd("g.st")} * {_dd("g.st")} / (CAST(g.nt AS DOUBLE) * {_dd("g.sq")})) / (1.0 - {_dd("g.st")} * {_dd("g.st")} / (CAST(g.nt AS DOUBLE) * {_dd("g.sq")}))', 6)}
                   END AS seasonal_strength
            FROM per_dow d JOIN per_group g ON g.event_type = d.event_type
            GROUP BY g.event_type, g.nt, g.st, g.sq ORDER BY g.event_type""",
        # --- r8 additions (r9 rotation queue) ------------------------------
        "jaccard_prefix_pairs_docs": f"""
            WITH {_SHINGLE_CTE.strip().rstrip(',')},
            sz AS (SELECT doc_id, COUNT(*) AS s FROM sh GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
              FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            )
            SELECT i.doc_a, i.doc_b,
                   CAST(i.i AS BIGINT) AS n_shared_tokens,
                   CAST(sa.s + sb.s - i.i AS BIGINT) AS n_union_tokens,
                   CAST(i.i AS DOUBLE) / CAST(sa.s + sb.s - i.i AS DOUBLE) AS jaccard
            FROM inter i
              JOIN sz sa ON sa.doc_id = i.doc_a
              JOIN sz sb ON sb.doc_id = i.doc_b
            WHERE i.i * 10 >= 6 * (sa.s + sb.s - i.i)
            ORDER BY doc_a, doc_b""",
        "exact_neardup_clusters_docs": f"""
            WITH RECURSIVE {_SHINGLE_CTE.strip().rstrip(',')},
            sz AS (SELECT doc_id, COUNT(*) AS s FROM sh GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
              FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            ),
            jpairs AS (
              SELECT i.doc_a, i.doc_b
              FROM inter i
                JOIN sz sa ON sa.doc_id = i.doc_a
                JOIN sz sb ON sb.doc_id = i.doc_b
              WHERE i.i * 10 >= 6 * (sa.s + sb.s - i.i)
            ),
            edges AS (
              SELECT doc_a AS src, doc_b AS dst FROM jpairs
              UNION SELECT doc_b, doc_a FROM jpairs
            ),
            reach(src, dst) AS (
              SELECT src, src FROM (SELECT DISTINCT src FROM edges)
              UNION
              SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
            ),
            comp AS (SELECT src AS node, MIN(dst) AS label FROM reach GROUP BY src),
            sized AS (
              SELECT c.node, c.label, d.n_chars FROM comp c JOIN documents d ON d.doc_id = c.node
            ),
            ranked AS (
              SELECT node, label, ROW_NUMBER() OVER (
                PARTITION BY label ORDER BY n_chars DESC, node ASC) AS rk
              FROM sized
            )
            SELECT label AS cluster_id, COUNT(*) AS n_docs,
                   MAX(CASE WHEN rk = 1 THEN node END) AS canonical_doc_id
            FROM ranked GROUP BY label ORDER BY cluster_id""",
        "tfidf_cosine_pairs_docs": f"""
            WITH toksrc AS (
              SELECT doc_id AS doc, {_TOKS} AS w FROM documents
              WHERE length(trim(lower(text))) > 0 AND len({_TOKS}) >= 3
            ),
            tok AS (
              -- 3-gram shingle features WITH multiplicity (no DISTINCT)
              SELECT doc, w[CAST(t.i AS INT)] || ' ' || w[CAST(t.i + 1 AS INT)]
                          || ' ' || w[CAST(t.i + 2 AS INT)] AS tok
              FROM toksrc, LATERAL (SELECT unnest(range(1, len(w) - 1)) AS i) t
            ),
            tf AS (SELECT doc, tok, COUNT(*) AS tf FROM tok GROUP BY doc, tok),
            dfreq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
            nd AS (SELECT COUNT(*) AS n_docs FROM documents),
            -- DECIMAL(28,6): DuckDB's (18,6)x(18,6) product keeps 6 integer
            -- digits and overflows (same pitfall as autocorr oracle)
            w AS (
              SELECT tf.doc, tf.tok,
                     CAST({_gq("tf.tf * (ln((1.0 + nd.n_docs) / (1.0 + dfreq.df)) + 1.0)", 6)}
                          AS DECIMAL(28,6)) AS w
              FROM tf JOIN dfreq ON dfreq.tok = tf.tok CROSS JOIN nd
            ),
            norms AS (SELECT doc, SUM(w * w) AS nsq FROM w GROUP BY doc),
            dots AS (
              SELECT a.doc AS doc_a, b.doc AS doc_b, SUM(a.w * b.w) AS dot
              FROM w a JOIN w b ON a.tok = b.tok AND a.doc < b.doc
              GROUP BY 1, 2
            )
            SELECT d.doc_a, d.doc_b,
                   {_gq("CAST(d.dot AS DOUBLE) / sqrt(CAST(na.nsq AS DOUBLE) * CAST(nb.nsq AS DOUBLE))", 6)} AS cosine
            FROM dots d
              JOIN norms na ON na.doc = d.doc_a
              JOIN norms nb ON nb.doc = d.doc_b
            WHERE d.dot > 0
              AND {_gq("CAST(d.dot AS DOUBLE) / sqrt(CAST(na.nsq AS DOUBLE) * CAST(nb.nsq AS DOUBLE))", 6)} >= 0.95
            ORDER BY doc_a, doc_b""",
        "qgram_editdist_suppliers": """
            WITH n AS (SELECT DISTINCT s_name AS name FROM supplier WHERE s_name IS NOT NULL)
            SELECT a.name AS name_a, b.name AS name_b,
                   CAST(levenshtein(a.name, b.name) AS INT) AS dist
            FROM n a JOIN n b ON a.name < b.name
            WHERE abs(length(a.name) - length(b.name)) <= 1
              AND levenshtein(a.name, b.name) = 1
            ORDER BY name_a, name_b""",
        "theil_sen_trend_by_type": """
            WITH daily AS (
              -- r10 sweep: input-side quantization is the grid form
              -- (lockstep with grid_round) — engine round() on a raw
              -- double diverges on shortest-decimal half-grid inputs
              SELECT event_type, CAST(floor(epoch(ts) / 86400.0) AS BIGINT) AS d,
                     CAST(SUM(CAST(""" + _gq("value", 6) + """ AS DECIMAL(18,6))) AS DOUBLE)
                       / CAST(COUNT(*) AS DOUBLE) AS m
              FROM events WHERE value IS NOT NULL GROUP BY 1, 2
            ),
            slopes AS (
              SELECT a.event_type, (b.m - a.m) / CAST(b.d - a.d AS DOUBLE) AS s
              FROM daily a JOIN daily b ON a.event_type = b.event_type AND a.d < b.d
            ),
            ranked AS (
              SELECT event_type, s,
                     row_number() OVER (PARTITION BY event_type ORDER BY s) AS rn,
                     COUNT(*) OVER (PARTITION BY event_type) AS cnt
              FROM slopes
            )
            SELECT event_type, CAST(MAX(cnt) AS BIGINT) AS n_pairs,
                   -- RATIONAL final — grid form, lockstep with grid_round
                   """ + _gq("SUM(s) / COUNT(*)", 6) + """ AS ts_slope
            FROM ranked
            WHERE rn = CAST(floor((cnt + 1) / 2) AS BIGINT)
               OR rn = CAST(floor(cnt / 2) AS BIGINT) + 1
            GROUP BY event_type ORDER BY event_type""",
        "xcorr_view_click_lags": """
            WITH daily AS (
              -- r10 sweep: input quantization via the grid form (lockstep
              -- with grid_round), not engine round()
              SELECT event_type, CAST(floor(epoch(ts) / 86400.0) AS BIGINT) AS d,
                     SUM(CAST(""" + _gq("value", 6) + """ AS DECIMAL(28,6))) AS v
              FROM events
              WHERE event_type IN ('view', 'click') AND value IS NOT NULL
              GROUP BY 1, 2
            ),
            fan AS (
              SELECT a.d AS da, a.v AS x, l.lag
              FROM daily a, LATERAL (SELECT unnest(range(0, 8)) AS lag) l
              WHERE a.event_type = 'view'
            ),
            paired AS (
              SELECT f.lag, f.x, b.v AS y
              FROM fan f JOIN daily b
                ON b.event_type = 'click' AND f.da - f.lag = b.d
            ),
            s AS (
              SELECT lag, COUNT(*) AS n_days, SUM(x) AS sx, SUM(y) AS sy,
                     SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
              FROM paired GROUP BY lag
            )
            SELECT CAST(lag AS INT) AS lag, CAST(n_days AS BIGINT) AS n_days,
                   CASE WHEN (CAST(n_days AS DOUBLE) * CAST(sxx AS DOUBLE)
                              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                           * (CAST(n_days AS DOUBLE) * CAST(syy AS DOUBLE)
                              - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0
                        THEN (CASE WHEN abs((CAST(n_days AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / sqrt((CAST(n_days AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * (CAST(n_days AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))) < 4.61168601842738770e+12 THEN (CASE WHEN abs((CAST(n_days AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / sqrt((CAST(n_days AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * (CAST(n_days AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))) < 4.61168601842738770e+12 THEN (CASE WHEN ((CAST(n_days AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / sqrt((CAST(n_days AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * (CAST(n_days AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))) >= 0 THEN floor(((CAST(n_days AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / sqrt((CAST(n_days AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * (CAST(n_days AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))) * 1000000.0 + 0.5) / 1000000.0 ELSE -(floor(-((CAST(n_days AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / sqrt((CAST(n_days AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * (CAST(n_days AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))) * 1000000.0 + 0.5) / 1000000.0) END) ELSE ((CAST(n_days AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / sqrt((CAST(n_days AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * (CAST(n_days AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))) END) ELSE ((CAST(n_days AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / sqrt((CAST(n_days AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * (CAST(n_days AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))) END)
                   END AS xcorr
            FROM s ORDER BY lag""",
        "survival_conversion_curve": """
            WITH starts AS (
              SELECT user_id, MIN(epoch(ts)) AS t0 FROM events
              WHERE event_type = 'signup' GROUP BY user_id
            ),
            horizon AS (SELECT MAX(epoch(ts)) AS tmax FROM events),
            conv AS (
              SELECT e.user_id, MIN(epoch(e.ts)) AS te
              FROM events e JOIN starts s ON s.user_id = e.user_id
              WHERE e.event_type = 'purchase' AND epoch(e.ts) >= s.t0
              GROUP BY e.user_id
            ),
            per_user AS (
              SELECT s.user_id,
                     CASE WHEN c.te IS NOT NULL
                          THEN CAST(floor((c.te - s.t0) / 86400.0) AS BIGINT) END AS event_day,
                     CAST(floor((h.tmax - s.t0) / 86400.0) AS BIGINT) AS censor_day
              FROM starts s LEFT JOIN conv c ON c.user_id = s.user_id CROSS JOIN horizon h
            ),
            per_day AS (
              SELECT COALESCE(event_day, censor_day) AS t,
                     SUM(CASE WHEN event_day IS NOT NULL THEN 1 ELSE 0 END) AS d,
                     SUM(CASE WHEN event_day IS NULL THEN 1 ELSE 0 END) AS c
              FROM per_user GROUP BY 1
            ),
            tot AS (SELECT COUNT(*) AS n0 FROM starts),
            risk AS (
              SELECT t, d, c,
                     n0 - COALESCE(SUM(d + c) OVER (ORDER BY t
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk
              FROM per_day CROSS JOIN tot
            ),
            terms AS (
              -- full-depletion step (n_risk = d): KM factor is exactly 0 —
              -- keep the row, pin lnterm to 0, force survival to 0 below
              -- r10 sweep: hterm = d/n_risk is RATIONAL and lands exactly on
            -- the 1e-9 half-grid for realistic cohorts (d odd, n_risk
            -- 1024), and cum_hazard (a 1e-9 decimal sum) can sit on the
            -- 1e-6 half-grid — all quantization is the sign-symmetric
            -- IEEE grid form, lockstep with grid_round
            SELECT t, d, c, n_risk,
                     CASE WHEN d = n_risk THEN 1 ELSE 0 END AS depl,
                     CAST(""" + _gq("CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE)", 9) + """
                          AS DECIMAL(28,9)) AS hterm,
                     CAST(""" + _gq(
            "CASE WHEN d = n_risk THEN 0.0"
            " ELSE ln(1.0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE)) END",
            9,
        ) + """
                          AS DECIMAL(28,9)) AS lnterm
              FROM risk
            )
            SELECT CAST(t AS BIGINT) AS days_since_signup,
                   CAST(n_risk AS BIGINT) AS n_at_risk,
                   CAST(d AS BIGINT) AS n_converted,
                   CAST(c AS BIGINT) AS n_censored,
                   """ + _gq(
            "CAST(SUM(hterm) OVER (ORDER BY t"
            " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)",
            6,
        ) + """
                     AS cum_hazard,
                   """ + _gq(
            "CASE WHEN MAX(depl) OVER (ORDER BY t"
            " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1"
            " THEN 0.0"
            " ELSE exp(CAST(SUM(lnterm) OVER (ORDER BY t"
            " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE))"
            " END",
            6,
        ) + """
                     AS km_survival
            FROM terms ORDER BY days_since_signup""",
        "ab_test_purchase_conversion": """
            WITH per_user AS (
              SELECT user_id,
                     MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
              FROM events GROUP BY user_id
            ),
            v AS (
              SELECT CAST(user_id % 2 AS INT) AS variant,
                     COUNT(*) AS n, SUM(conv) AS k
              FROM per_user GROUP BY 1
            ),
            j AS (
              SELECT a.n AS n0, a.k AS k0, b.n AS n1, b.k AS k1
              FROM (SELECT * FROM v WHERE variant = 0) a,
                   (SELECT * FROM v WHERE variant = 1) b
            )
            SELECT CAST(n0 AS BIGINT) AS n_control, CAST(k0 AS BIGINT) AS conv_control,
                   CAST(n1 AS BIGINT) AS n_treatment, CAST(k1 AS BIGINT) AS conv_treatment,
                   -- r10 sweep: the rates are int/int RATIONALS — grid
                   -- quantization in lockstep with grid_round
                   """ + _gq("CAST(k0 AS DOUBLE) / CAST(n0 AS DOUBLE)", 6) + """ AS rate_control,
                   """ + _gq("CAST(k1 AS DOUBLE) / CAST(n1 AS DOUBLE)", 6) + """ AS rate_treatment,
                   CASE WHEN sqrt((CAST(k0 + k1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
                                  * (1.0 - CAST(k0 + k1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
                                  * (1.0 / CAST(n0 AS DOUBLE) + 1.0 / CAST(n1 AS DOUBLE))) > 0
                        THEN """ + _gq(
            "(CAST(k1 AS DOUBLE) / CAST(n1 AS DOUBLE)"
            " - CAST(k0 AS DOUBLE) / CAST(n0 AS DOUBLE))"
            " / sqrt((CAST(k0 + k1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))"
            " * (1.0 - CAST(k0 + k1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))"
            " * (1.0 / CAST(n0 AS DOUBLE) + 1.0 / CAST(n1 AS DOUBLE)))",
            6,
        ) + """
                   END AS z_score
            FROM j""",
        "user_behavior_entropy_events": """
            WITH per AS (
              SELECT user_id, event_type, COUNT(*) AS c FROM events GROUP BY 1, 2
            ),
            tot AS (SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id)
            SELECT p.user_id,
                   CAST(t.n AS BIGINT) AS n_events,
                   CAST(COUNT(*) AS BIGINT) AS n_types,
                   -- r10 sweep: the final is a 1e-9 decimal sum cast to
                   -- double — it can sit on the 1e-6 half-grid, so the
                   -- final is the grid form (lockstep with grid_round);
                   -- r11 sweep: the -p·ln p term is ALSO the grid form —
                   -- at d=9 the magnitude-divergence mode starts at ~9e-3,
                   -- inside the term's [0, 1/e] range, so engine round()
                   -- was not magnitude-safe there after all
                   """ + _gq(
            "CAST(SUM(CAST("
            + _gq(
                "-(CAST(p.c AS DOUBLE) / CAST(t.n AS DOUBLE))"
                " * ln(CAST(p.c AS DOUBLE) / CAST(t.n AS DOUBLE))",
                9,
            )
            + " AS DECIMAL(28,9))) AS DOUBLE)",
            6,
        ) + """ AS entropy
            FROM per p JOIN tot t ON t.user_id = p.user_id
            GROUP BY p.user_id, t.n ORDER BY p.user_id""",
        "seq_pattern_support_events": """
            WITH spans AS (
              SELECT user_id, event_type, MIN(ts) AS tmin, MAX(ts) AS tmax
              FROM events GROUP BY 1, 2
            )
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   CAST(COUNT(*) AS BIGINT) AS n_users_both,
                   CAST(SUM(CASE WHEN a.tmin < b.tmax THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_users_ordered,
                   CAST(SUM(CASE WHEN a.tmin < b.tmax THEN 1 ELSE 0 END) AS DOUBLE)
                     / CAST(COUNT(*) AS DOUBLE) AS support_ratio
            FROM spans a JOIN spans b
              ON a.user_id = b.user_id AND a.event_type != b.event_type
            GROUP BY 1, 2 ORDER BY type_a, type_b""",
        "gini_customer_spend_by_nation": """
            WITH spend AS (
              SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
              FROM orders GROUP BY o_custkey
            ),
            base AS (
              SELECT n.n_name, c.c_custkey,
                     CAST(COALESCE(s.spend, 0) AS DECIMAL(18,6)) AS x
              FROM customer c
                LEFT JOIN spend s ON s.o_custkey = c.c_custkey
                JOIN nation n ON n.n_nationkey = c.c_nationkey
            ),
            ranked AS (
              SELECT n_name, x,
                     row_number() OVER (PARTITION BY n_name ORDER BY x, c_custkey) AS i
              FROM base
            ),
            agg AS (
              SELECT n_name, COUNT(*) AS n, SUM(x) AS sx,
                     SUM(CAST(i AS DECIMAL(28,6)) * CAST(x AS DECIMAL(28,6))) AS six
              FROM ranked GROUP BY n_name
            )
            SELECT n_name, CAST(n AS BIGINT) AS n_keys,
                   -- r10 sweep: G is RATIONAL — grid quantization (the
                   -- sign-symmetric IEEE form, lockstep with grid_round),
                   -- not engine round()
                   CASE WHEN CAST(sx AS DOUBLE) != 0
                        THEN """ + _gq(
            "(2.0 * CAST(six AS DOUBLE)"
            " - (CAST(n AS DOUBLE) + 1.0) * CAST(sx AS DOUBLE))"
            " / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE))",
            6,
        ) + """
                   END AS gini
            FROM agg ORDER BY n_name""",
        "fd_histogram_value_events": """
            WITH s AS (
              SELECT COUNT(*) AS n,
                     MIN(CAST(value AS DOUBLE)) AS mn, MAX(CAST(value AS DOUBLE)) AS mx,
                     quantile_cont(value, 0.25) AS q1, quantile_cont(value, 0.75) AS q3
              FROM events WHERE value IS NOT NULL
            ),
            p0 AS (
              SELECT n, mn, mx,
                     -- degenerate-IQR guard mirrors fd_histogram: q1=q3 ->
                     -- fall back to one [mn,mx] bin (width floor 1.0)
                     CASE WHEN 2.0 * (q3 - q1) / cbrt(CAST(n AS DOUBLE)) > 0
                          THEN 2.0 * (q3 - q1) / cbrt(CAST(n AS DOUBLE))
                          WHEN mx > mn THEN mx - mn ELSE 1.0 END AS h
              FROM s
            ),
            p AS (
              SELECT n, mn, mx, h,
                     -- 10k-bin cap clamped in DOUBLE before the integer
                     -- cast (pathological tiny-IQR spread overflows
                     -- BIGINT), lockstep with fd_histogram
                     GREATEST(1, CAST(ceil(LEAST((mx - mn) / h, 10000.0)) AS BIGINT)) AS n_bins
              FROM p0
            ),
            binned AS (
              SELECT CAST(floor(LEAST((CAST(e.value AS DOUBLE) - p.mn) / p.h,
                                      CAST(p.n_bins - 1 AS DOUBLE))) AS BIGINT) AS bin,
                     p.mn, p.h
              FROM events e CROSS JOIN p WHERE e.value IS NOT NULL
            )
            -- r11 sweep: grid form, lockstep with grid_round
            SELECT CAST(bin AS BIGINT) AS bin,
                   """ + _gq("mn + bin * h", 6) + """ AS bin_lo,
                   """ + _gq("mn + (bin + 1) * h", 6) + """ AS bin_hi,
                   CAST(COUNT(*) AS BIGINT) AS n_rows
            FROM binned GROUP BY bin, mn, h ORDER BY bin""",
        "scd2_snapshot_asof": """
            WITH ordered AS (
              SELECT user_id, ts, event_id, event_type,
                     lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
              FROM events
            ),
            changes AS (
              SELECT user_id, ts, event_id, event_type FROM ordered
              WHERE prev_type IS NULL OR prev_type != event_type
            ),
            hist AS (
              SELECT user_id, event_type, ts AS cap,
                     COALESCE(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                              TIMESTAMP '9999-12-31 00:00:00') AS del
              FROM changes
            ),
            mid AS (
              SELECT CAST(floor((epoch(MIN(ts)) + epoch(MAX(ts))) / 2.0) AS BIGINT) AS m
              FROM events
            )
            SELECT h.user_id, h.event_type, h.cap AS dl_ts_captured
            FROM hist h CROSS JOIN mid
            WHERE epoch(h.cap) <= mid.m AND epoch(h.del) > mid.m
            ORDER BY h.user_id""",
        "hits_terms_corpus": hits_oracle_sql,
        "vocab_coverage_by_source": cov_oracle_sql,
        # ---- round-9 operators ------------------------------------------
        "spearman_value_hour_by_type": """
            WITH base AS (
              SELECT event_type AS g, value AS x,
                     CAST(floor(epoch(ts) / 3600.0) % 24 AS BIGINT) AS y
              FROM events WHERE value IS NOT NULL
            ),
            ranked AS (
              SELECT g,
                     CAST(2 * rank() OVER (PARTITION BY g ORDER BY x)
                          + COUNT(*) OVER (PARTITION BY g, x) - 1 AS BIGINT) AS a,
                     CAST(2 * rank() OVER (PARTITION BY g ORDER BY y)
                          + COUNT(*) OVER (PARTITION BY g, y) - 1 AS BIGINT) AS b
              FROM base
            ),
            agg AS (
              SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(a) AS BIGINT) AS sa, CAST(SUM(b) AS BIGINT) AS sb,
                     CAST(SUM(a * a) AS BIGINT) AS saa,
                     CAST(SUM(b * b) AS BIGINT) AS sbb,
                     CAST(SUM(a * b) AS BIGINT) AS sab
              FROM ranked GROUP BY g
            )
            SELECT g AS event_type, n,
                   -- rho can be RATIONAL (matching rank-variance
                   -- factors) — grid form, lockstep with grid_round (r10)
                   CASE WHEN sqrt(CAST(n * saa - sa * sa AS DOUBLE)
                                  * CAST(n * sbb - sb * sb AS DOUBLE)) > 0
                        THEN (CASE WHEN abs(CAST(n * sab - sa * sb AS DOUBLE) / sqrt(CAST(n * saa - sa * sa AS DOUBLE) * CAST(n * sbb - sb * sb AS DOUBLE))) < 4.61168601842738770e+12 THEN (CASE WHEN abs(CAST(n * sab - sa * sb AS DOUBLE) / sqrt(CAST(n * saa - sa * sa AS DOUBLE) * CAST(n * sbb - sb * sb AS DOUBLE))) < 4.61168601842738770e+12 THEN (CASE WHEN (CAST(n * sab - sa * sb AS DOUBLE) / sqrt(CAST(n * saa - sa * sa AS DOUBLE) * CAST(n * sbb - sb * sb AS DOUBLE))) >= 0 THEN floor((CAST(n * sab - sa * sb AS DOUBLE) / sqrt(CAST(n * saa - sa * sa AS DOUBLE) * CAST(n * sbb - sb * sb AS DOUBLE))) * 1000000.0 + 0.5) / 1000000.0 ELSE -(floor(-(CAST(n * sab - sa * sb AS DOUBLE) / sqrt(CAST(n * saa - sa * sa AS DOUBLE) * CAST(n * sbb - sb * sb AS DOUBLE))) * 1000000.0 + 0.5) / 1000000.0) END) ELSE (CAST(n * sab - sa * sb AS DOUBLE) / sqrt(CAST(n * saa - sa * sa AS DOUBLE) * CAST(n * sbb - sb * sb AS DOUBLE))) END) ELSE (CAST(n * sab - sa * sb AS DOUBLE) / sqrt(CAST(n * saa - sa * sa AS DOUBLE) * CAST(n * sbb - sb * sb AS DOUBLE))) END)
                   END AS spearman_rho
            FROM agg ORDER BY event_type""",
        "winsorized_mean_value_by_type": """
            WITH ranked AS (
              -- r10 sweep: input quantization via the grid form (lockstep
              -- with grid_round) — engine round() diverges on
              -- shortest-decimal half-grid inputs
              SELECT event_type, CAST(""" + _gq("value", 6) + """ AS DECIMAL(18,6)) AS v,
                     row_number() OVER (PARTITION BY event_type
                                        ORDER BY value, event_id) AS rn,
                     COUNT(*) OVER (PARTITION BY event_type) AS n
              FROM events WHERE value IS NOT NULL
            ),
            cutf AS (SELECT *, CAST(floor(n * 0.1) AS BIGINT) AS cut FROM ranked),
            bounds AS (
              SELECT event_type,
                     MAX(CASE WHEN rn = cut + 1 THEN v END) AS lo,
                     MAX(CASE WHEN rn = n - cut THEN v END) AS hi
              FROM cutf GROUP BY event_type
            ),
            clamped AS (
              SELECT f.event_type,
                     CASE WHEN f.rn <= f.cut THEN b.lo
                          WHEN f.rn > f.n - f.cut THEN b.hi
                          ELSE f.v END AS cv
              FROM cutf f JOIN bounds b USING (event_type)
            )
            -- pure-double grid quantization, NOT engine round(): the mean
            -- is rational (exact decimal sum / integer count) and can land
            -- exactly on the 1e-6 half-grid where Spark and DuckDB round()
            -- diverge (hypothesis-found; r10: sign-symmetric form —
            -- ties away from zero, lockstep with grid_round)
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                   """ + _gq("CAST(SUM(cv) AS DOUBLE) / COUNT(*)", 6) + """
                     AS winsorized_mean
            FROM clamped GROUP BY event_type ORDER BY event_type""",
        "burstiness_daily_by_type": """
            WITH span AS (
              SELECT CAST(max(floor(epoch(ts) / 86400.0))
                          - min(floor(epoch(ts) / 86400.0)) + 1 AS BIGINT) AS n
              FROM events
            ),
            daily AS (
              SELECT event_type AS g,
                     CAST(floor(epoch(ts) / 86400.0) AS BIGINT) AS d,
                     COUNT(*) AS c
              FROM events GROUP BY 1, 2
            ),
            agg AS (
              SELECT g, CAST(COUNT(*) AS BIGINT) AS n_active,
                     CAST(SUM(c) AS BIGINT) AS s,
                     CAST(SUM(c * c) AS BIGINT) AS ss
              FROM daily GROUP BY g
            ),
            withspan AS (SELECT * FROM agg CROSS JOIN span)
            -- pure-double grid finals (mean/fano rational, B rational on
            -- perfect-square variances — the winsorized class); r10:
            -- sign-symmetric form, lockstep with grid_round (B can be
            -- negative)
            SELECT g AS event_type, n AS n_days, n_active AS n_active_days,
                   """ + _gq("CAST(s AS DOUBLE) / CAST(n AS DOUBLE)", 6) + """ AS mean_daily,
                   CASE WHEN s > 0 THEN
                     """ + _gq(
            "(CAST(n * ss - s * s AS DOUBLE) / CAST(n * n AS DOUBLE))"
            " / (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))",
            6,
        ) + """
                   END AS fano_factor,
                   CASE WHEN sqrt(CAST(n * ss - s * s AS DOUBLE) / CAST(n * n AS DOUBLE))
                             + CAST(s AS DOUBLE) / CAST(n AS DOUBLE) > 0 THEN
                     """ + _gq(
            "(sqrt(CAST(n * ss - s * s AS DOUBLE) / CAST(n * n AS DOUBLE))"
            " - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))"
            " / (sqrt(CAST(n * ss - s * s AS DOUBLE) / CAST(n * n AS DOUBLE))"
            " + CAST(s AS DOUBLE) / CAST(n AS DOUBLE))",
            6,
        ) + """
                   END AS burstiness
            FROM withspan ORDER BY event_type""",
        "next_event_entropy_by_type": """
            WITH seqs AS (
              SELECT user_id, list(event_type ORDER BY ts, event_id) AS types
              FROM events GROUP BY user_id
            ),
            pairs AS (
              SELECT types[CAST(t.i + 1 AS INT)] AS cur,
                     types[CAST(t.i + 2 AS INT)] AS nxt
              FROM seqs, LATERAL (SELECT unnest(range(0, len(types) - 1)) AS i) t
              WHERE len(types) >= 2
            ),
            counted AS (SELECT cur, nxt, COUNT(*) AS c FROM pairs GROUP BY 1, 2),
            agg AS (
              -- r10 sweep: c·ln(c) is magnitude-exposed under engine
              -- round() (DuckDB loses ulps past ~9e6); the grid form is
              -- the same IEEE ops at any magnitude — lockstep with
              -- grid_round
              SELECT cur, CAST(SUM(c) AS BIGINT) AS t, CAST(COUNT(*) AS BIGINT) AS k,
                     SUM(CAST(""" + _gq(
            "CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))", 9
        ) + """
                              AS DECIMAL(28,9))) AS clnc
              FROM counted GROUP BY cur
            )
            SELECT cur AS event_type, t AS n_transitions, k AS n_next_types,
                   """ + _gq(
            "ln(CAST(t AS DOUBLE)) - CAST(clnc AS DOUBLE) / CAST(t AS DOUBLE)", 6
        ) + """
                     AS next_entropy
            FROM agg ORDER BY event_type""",
        "twap_value_by_type": """
            -- exact integer-microsecond Δt and a fully-decimal trapezoid
            -- numerator: the old round(x, 9)-on-double per segment was
            -- engine-divergent at magnitude (DuckDB scales by 1e9 in
            -- double); area2 = Σ (pv+v)·Δt_us is exact, one grid-quantized
            -- double division at the end (hypothesis-found, r9 follow-up)
            WITH base AS (
              -- r10: grid-quantized input, lockstep with grid_round
              SELECT event_type AS g, epoch_us(ts) AS t,
                     CAST(""" + _gq("value", 6) + """ AS DECIMAL(18,6)) AS v, event_id AS id
              FROM events WHERE value IS NOT NULL
            ),
            lagd AS (
              SELECT g, t, v,
                     lag(t) OVER (PARTITION BY g ORDER BY t, id) AS pt,
                     lag(v) OVER (PARTITION BY g ORDER BY t, id) AS pv
              FROM base
            ),
            seg AS (SELECT * FROM lagd WHERE pt IS NOT NULL),
            agg AS (
              SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(t - pt) AS DECIMAL(38,0)) AS span_us,
                     SUM(CAST(pv + v AS DECIMAL(19,6)) * (t - pt)) AS area2
              FROM seg GROUP BY g
            )
            SELECT g AS event_type, n AS n_segments,
                   """ + _gq("CAST(span_us AS DOUBLE) / 1000000.0", 6) + """ AS total_span_sec,
                   CASE WHEN span_us > 0
                        THEN """ + _gq(
            "CAST(area2 AS DOUBLE) / (2.0 * CAST(span_us AS DOUBLE))", 6
        ) + """
                   END AS twap
            FROM agg ORDER BY event_type""",
        "llr_collocations_corpus": f"""
            WITH toks AS (
              SELECT doc_id, {_TOKS} AS w FROM documents
              WHERE length(trim(lower(text))) > 0 AND len({_TOKS}) >= 2
            ),
            bi AS (
              SELECT w[CAST(x.i AS INT)] AS w1, w[CAST(x.i + 1 AS INT)] AS w2
              FROM toks, LATERAL (SELECT unnest(range(1, len(w))) AS i) x
            ),
            c12 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS k11
                    FROM bi GROUP BY 1, 2 HAVING COUNT(*) >= 5),
            r AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS r1 FROM bi GROUP BY 1),
            c AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS c1 FROM bi GROUP BY 1),
            n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM bi)
            -- r11 sweep: grid form, lockstep with grid_round
            SELECT w1 || ' ' || w2 AS collocation, k11 AS n_pair,
                   """ + _gq(
            "2.0 * ("
            "  (CASE WHEN k11 > 0 THEN CAST(k11 AS DOUBLE)"
            "     * ln(CAST(k11 AS DOUBLE) * CAST(nn AS DOUBLE)"
            "          / (CAST(r1 AS DOUBLE) * CAST(c1 AS DOUBLE))) ELSE 0.0 END)"
            "  + (CASE WHEN r1 - k11 > 0 THEN CAST(r1 - k11 AS DOUBLE)"
            "     * ln(CAST(r1 - k11 AS DOUBLE) * CAST(nn AS DOUBLE)"
            "          / (CAST(r1 AS DOUBLE) * CAST(nn - c1 AS DOUBLE))) ELSE 0.0 END)"
            "  + (CASE WHEN c1 - k11 > 0 THEN CAST(c1 - k11 AS DOUBLE)"
            "     * ln(CAST(c1 - k11 AS DOUBLE) * CAST(nn AS DOUBLE)"
            "          / (CAST(nn - r1 AS DOUBLE) * CAST(c1 AS DOUBLE))) ELSE 0.0 END)"
            "  + (CASE WHEN nn - r1 - c1 + k11 > 0 THEN CAST(nn - r1 - c1 + k11 AS DOUBLE)"
            "     * ln(CAST(nn - r1 - c1 + k11 AS DOUBLE) * CAST(nn AS DOUBLE)"
            "          / (CAST(nn - r1 AS DOUBLE) * CAST(nn - c1 AS DOUBLE))) ELSE 0.0 END)"
            ")",
            6,
        ) + """ AS llr_g2
            FROM c12 JOIN r USING (w1) JOIN c USING (w2), n
            ORDER BY llr_g2 DESC, collocation LIMIT 25""",
        "distinct_ngram_ratio_by_source": f"""
            WITH toks AS (
              SELECT source, {_TOKS} AS w FROM documents
              WHERE length(trim(lower(text))) > 0 AND len({_TOKS}) >= 1
            ),
            u AS (SELECT source, unnest(w) AS tok FROM toks),
            uni AS (
              SELECT source, CAST(COUNT(*) AS BIGINT) AS n_tokens,
                     CAST(COUNT(DISTINCT tok) AS BIGINT) AS d1
              FROM u GROUP BY source
            ),
            bg AS (
              SELECT source, w[CAST(x.i AS INT)] || ' ' || w[CAST(x.i + 1 AS INT)] AS b
              FROM toks, LATERAL (SELECT unnest(range(1, len(w))) AS i) x
              WHERE len(w) >= 2
            ),
            big AS (
              SELECT source, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
                     CAST(COUNT(DISTINCT b) AS BIGINT) AS d2
              FROM bg GROUP BY source
            )
            -- pure-double grid (rational int/int ratios — the winsorized
            -- class); r10: sign-symmetric form, lockstep with grid_round
            SELECT uni.source, n_tokens, d1 AS n_unigram_types,
                   """ + _gq("CAST(d1 AS DOUBLE) / CAST(n_tokens AS DOUBLE)", 6) + """ AS distinct1,
                   COALESCE(n_bigrams, 0) AS n_bigrams,
                   COALESCE(d2, 0) AS n_bigram_types,
                   CASE WHEN n_bigrams > 0
                        THEN """ + _gq(
            "CAST(d2 AS DOUBLE) / CAST(n_bigrams AS DOUBLE)", 6
        ) + """
                   END AS distinct2
            FROM uni LEFT JOIN big USING (source) ORDER BY source""",
        "entity_clusters_suppliers": """
            WITH RECURSIVE n AS (
              SELECT DISTINCT s_name AS name FROM supplier WHERE s_name IS NOT NULL
            ),
            p AS (
              SELECT a.name AS na, b.name AS nb
              FROM n a JOIN n b ON a.name < b.name
              WHERE abs(length(a.name) - length(b.name)) <= 1
                AND levenshtein(a.name, b.name) = 1
            ),
            edges AS (
              SELECT na AS src, nb AS dst FROM p UNION SELECT nb, na FROM p
            ),
            reach(src, dst) AS (
              SELECT src, src FROM (SELECT DISTINCT src FROM edges)
              UNION
              SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
            ),
            comp AS (SELECT src AS node, MIN(dst) AS label FROM reach GROUP BY src),
            ranked AS (
              SELECT node, label, ROW_NUMBER() OVER (
                PARTITION BY label ORDER BY length(node) DESC, node ASC) AS rk
              FROM comp
            )
            SELECT label AS cluster_id, CAST(COUNT(*) AS BIGINT) AS n_names,
                   MAX(CASE WHEN rk = 1 THEN node END) AS canonical_name
            FROM ranked GROUP BY label ORDER BY cluster_id""",
        "tfidf_topk_neighbors_docs": f"""
            WITH toksrc AS (
              SELECT doc_id AS doc, {_TOKS} AS w FROM documents
              WHERE length(trim(lower(text))) > 0 AND len({_TOKS}) >= 3
            ),
            tok AS (
              SELECT doc, w[CAST(t.i AS INT)] || ' ' || w[CAST(t.i + 1 AS INT)]
                          || ' ' || w[CAST(t.i + 2 AS INT)] AS tok
              FROM toksrc, LATERAL (SELECT unnest(range(1, len(w) - 1)) AS i) t
            ),
            tf AS (SELECT doc, tok, COUNT(*) AS tf FROM tok GROUP BY doc, tok),
            dfreq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
            nd AS (SELECT COUNT(*) AS n_docs FROM documents),
            w AS (
              SELECT tf.doc, tf.tok,
                     CAST({_gq("tf.tf * (ln((1.0 + nd.n_docs) / (1.0 + dfreq.df)) + 1.0)", 6)}
                          AS DECIMAL(28,6)) AS w
              FROM tf JOIN dfreq ON dfreq.tok = tf.tok CROSS JOIN nd
            ),
            norms AS (SELECT doc, SUM(w * w) AS nsq FROM w GROUP BY doc),
            dots AS (
              SELECT a.doc AS doc_a, b.doc AS doc_b, SUM(a.w * b.w) AS dot
              FROM w a JOIN w b ON a.tok = b.tok AND a.doc < b.doc
              GROUP BY 1, 2
            ),
            pairsfull AS (
              SELECT d.doc_a, d.doc_b,
                     {_gq("CAST(d.dot AS DOUBLE) / sqrt(CAST(na.nsq AS DOUBLE) * CAST(nb.nsq AS DOUBLE))", 6)} AS cosine
              FROM dots d
                JOIN norms na ON na.doc = d.doc_a
                JOIN norms nb ON nb.doc = d.doc_b
              WHERE d.dot > 0
                AND {_gq("CAST(d.dot AS DOUBLE) / sqrt(CAST(na.nsq AS DOUBLE) * CAST(nb.nsq AS DOUBLE))", 6)} >= 0.25
            ),
            sym AS (
              SELECT doc_a AS doc, doc_b AS neighbor, cosine FROM pairsfull
              UNION ALL
              SELECT doc_b, doc_a, cosine FROM pairsfull
            ),
            rankedn AS (
              SELECT doc, neighbor, cosine, ROW_NUMBER() OVER (
                PARTITION BY doc ORDER BY cosine DESC, neighbor ASC) AS rk
              FROM sym
            )
            SELECT doc, CAST(rk AS INT) AS rk, neighbor, cosine
            FROM rankedn WHERE rk <= 3 ORDER BY doc, rk""",
        "streaming_topk_per_window": """
            WITH wc AS (
              -- r10: grid-quantized input, lockstep with grid_round
              SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS window_start_epoch,
                     event_type, COUNT(*) AS n_events,
                     SUM(CAST(""" + _gq("value", 6) + """ AS DECIMAL(18,6))) AS sum_value
              FROM events GROUP BY 1, 2
            ),
            ranked AS (
              SELECT *, ROW_NUMBER() OVER (
                PARTITION BY window_start_epoch
                ORDER BY n_events DESC, event_type ASC) AS rk
              FROM wc
            )
            SELECT window_start_epoch, CAST(rk AS INT) AS rk, event_type,
                   n_events, """ + _gq("CAST(sum_value AS DOUBLE)", 6) + """ AS sum_value
            FROM ranked WHERE rk <= 3 ORDER BY window_start_epoch, rk""",
        "kendall_tau_level_volume_by_type": """
            WITH daily AS (
              -- volume = ALL rows; level mean divides over MEASURED rows
              SELECT event_type AS g,
                     CAST(floor(epoch(ts) / 86400.0) AS BIGINT) AS d,
                     SUM(CAST(""" + _gq("value", 6) + """ AS DECIMAL(18,6))) AS s,
                     CAST(COUNT(value) AS BIGINT) AS cv,
                     CAST(COUNT(*) AS BIGINT) AS c
              FROM events GROUP BY 1, 2
              HAVING COUNT(value) > 0
            ),
            tpairs AS (
              SELECT a.g,
                     sign(CAST(b.s * a.cv - a.s * b.cv AS DOUBLE)) AS xc,
                     sign(CAST(b.c - a.c AS DOUBLE)) AS yc
              FROM daily a JOIN daily b ON a.g = b.g AND a.d < b.d
            ),
            agg AS (
              SELECT g, CAST(COUNT(*) AS BIGINT) AS n0,
                     CAST(SUM(CASE WHEN xc * yc > 0 THEN 1 ELSE 0 END) AS BIGINT) AS conc,
                     CAST(SUM(CASE WHEN xc * yc < 0 THEN 1 ELSE 0 END) AS BIGINT) AS disc,
                     CAST(SUM(CASE WHEN xc = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tx,
                     CAST(SUM(CASE WHEN yc = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ty
              FROM tpairs GROUP BY g
            )
            SELECT g AS event_type, n0 AS n_day_pairs,
                   conc AS n_concordant, disc AS n_discordant,
                   -- tau_b is RATIONAL for tie-free groups — grid form,
                   -- lockstep with grid_round (r10)
                   CASE WHEN sqrt(CAST(n0 - tx AS DOUBLE) * CAST(n0 - ty AS DOUBLE)) > 0
                        THEN (CASE WHEN abs(CAST(conc - disc AS DOUBLE) / sqrt(CAST(n0 - tx AS DOUBLE) * CAST(n0 - ty AS DOUBLE))) < 4.61168601842738770e+12 THEN (CASE WHEN abs(CAST(conc - disc AS DOUBLE) / sqrt(CAST(n0 - tx AS DOUBLE) * CAST(n0 - ty AS DOUBLE))) < 4.61168601842738770e+12 THEN (CASE WHEN (CAST(conc - disc AS DOUBLE) / sqrt(CAST(n0 - tx AS DOUBLE) * CAST(n0 - ty AS DOUBLE))) >= 0 THEN floor((CAST(conc - disc AS DOUBLE) / sqrt(CAST(n0 - tx AS DOUBLE) * CAST(n0 - ty AS DOUBLE))) * 1000000.0 + 0.5) / 1000000.0 ELSE -(floor(-(CAST(conc - disc AS DOUBLE) / sqrt(CAST(n0 - tx AS DOUBLE) * CAST(n0 - ty AS DOUBLE))) * 1000000.0 + 0.5) / 1000000.0) END) ELSE (CAST(conc - disc AS DOUBLE) / sqrt(CAST(n0 - tx AS DOUBLE) * CAST(n0 - ty AS DOUBLE))) END) ELSE (CAST(conc - disc AS DOUBLE) / sqrt(CAST(n0 - tx AS DOUBLE) * CAST(n0 - ty AS DOUBLE))) END)
                   END AS kendall_tau_b
            FROM agg ORDER BY event_type""",
        "markov_stationary_event_types": markov_oracle,
        # ----- NEW r10 operators (below the grading window; r11 queue) ----
        "mann_whitney_value_variants": """
            WITH base AS (
              SELECT CAST(user_id % 2 AS INT) AS variant, value AS v
              FROM events WHERE value IS NOT NULL
            ),
            ranked AS (
              SELECT variant,
                     CAST(rank() OVER (ORDER BY v) * 2
                          + COUNT(*) OVER (PARTITION BY v) - 1 AS DECIMAL(19,0)) AS r2,
                     COUNT(*) OVER (PARTITION BY v) AS t
              FROM base
            ),
            agg AS (
              SELECT CAST(SUM(CASE WHEN variant = 1 THEN r2 END) AS DECIMAL(38,0)) AS r2sum1,
                     CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
                     CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
                     CAST(SUM(CAST(CAST(t AS DECIMAL(19,0)) * t - 1 AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS tie3
              FROM ranked
            ),
            s1 AS (
              SELECT n0, n1, tie3,
                     CAST(n1 AS DOUBLE) AS n1d, CAST(n0 AS DOUBLE) AS n0d,
                     CAST(n1 + n0 AS DOUBLE) AS nd,
                     (CAST(r2sum1 AS DOUBLE)
                      - CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) + 1.0)) / 2.0 AS u1
              FROM agg
            ),
            s2 AS (
              SELECT *, n1d * n0d / 2.0 AS mu,
                     n1d * n0d / 12.0
                       * ((nd + 1.0) - CAST(tie3 AS DOUBLE) / (nd * (nd - 1.0))) AS vr
              FROM s1
            )
            SELECT n0 AS n_control, n1 AS n_treatment, u1,
                   """ + _gq("2.0 * u1 / (n1d * n0d) - 1.0", 6) + """ AS rank_biserial,
                   CASE WHEN vr > 0 THEN """ + _gq("(u1 - mu) / sqrt(vr)", 6) + """ END AS z_score
            FROM s2""",
        "welch_t_value_variants": """
            WITH base AS (
              SELECT CAST(user_id % 2 AS INT) AS variant,
                     CAST(""" + _gq("value", 6) + """ AS DECIMAL(18,6)) AS v
              FROM events WHERE value IS NOT NULL
            ),
            per AS (
              SELECT variant, CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(v) AS DECIMAL(38,6)) AS s,
                     -- (28,6) operands force DuckDB's int128 multiply
                     -- path (int64-storage product overflow, r10 lesson)
                     CAST(SUM(CAST(CAST(v AS DECIMAL(28,6)) * CAST(v AS DECIMAL(28,6)) AS DECIMAL(38,12))) AS DECIMAL(38,12)) AS ss
              FROM base GROUP BY variant
            ),
            j AS (
              SELECT a.n AS n0, a.s AS s0, a.ss AS ss0, b.n AS n1, b.s AS s1, b.ss AS ss1
              FROM (SELECT * FROM per WHERE variant = 0) a,
                   (SELECT * FROM per WHERE variant = 1) b
            ),
            v AS (
              SELECT n0, n1, CAST(n0 AS DOUBLE) AS n0d, CAST(n1 AS DOUBLE) AS n1d,
                     CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS m0,
                     CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS m1,
                     (CAST(ss0 AS DOUBLE) - CAST(s0 AS DOUBLE) * CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))
                       / (CAST(n0 AS DOUBLE) - 1.0) AS v0,
                     (CAST(ss1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))
                       / (CAST(n1 AS DOUBLE) - 1.0) AS v1
              FROM j
            ),
            w AS (SELECT *, v0 / n0d + v1 / n1d AS se2 FROM v)
            SELECT n0 AS n_control, n1 AS n_treatment,
                   """ + _gq("m0", 6) + """ AS mean_control,
                   """ + _gq("m1", 6) + """ AS mean_treatment,
                   CASE WHEN se2 > 0 THEN """ + _gq("(m1 - m0) / sqrt(se2)", 6) + """ END AS welch_t,
                   CASE WHEN se2 > 0 THEN """ + _gq(
            "(se2 * se2) / ((v0 / n0d) * (v0 / n0d) / (n0d - 1.0)"
            " + (v1 / n1d) * (v1 / n1d) / (n1d - 1.0))",
            6,
        ) + """ END AS welch_df
            FROM w""",
        "hour_profile_hhi_by_type": """
            WITH hourly AS (
              SELECT event_type AS g,
                     CAST(CAST(floor(epoch(ts) / 3600.0) AS BIGINT) % 24 AS INT) AS h,
                     CAST(COUNT(*) AS BIGINT) AS c
              FROM events GROUP BY 1, 2
            ),
            agg AS (
              SELECT g, CAST(SUM(c) AS BIGINT) AS total,
                     CAST(SUM(CAST(CAST(c AS DECIMAL(19,0)) * c AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sc2,
                     CAST(COUNT(*) AS BIGINT) AS n_active_hours
              FROM hourly GROUP BY g
            ),
            pk AS (
              SELECT g, h AS peak_hour, c AS peak_c,
                     row_number() OVER (PARTITION BY g ORDER BY c DESC, h ASC) AS rn
              FROM hourly
            )
            SELECT a.g AS event_type, a.total AS n_events, a.n_active_hours,
                   CAST(p.peak_hour AS INT) AS peak_hour,
                   """ + _gq("CAST(p.peak_c AS DOUBLE) / CAST(a.total AS DOUBLE)", 6) + """ AS peak_share,
                   """ + _gq(
            "CAST(a.sc2 AS DOUBLE) / (CAST(a.total AS DOUBLE) * CAST(a.total AS DOUBLE))", 6
        ) + """ AS hhi
            FROM agg a JOIN pk p ON p.g = a.g AND p.rn = 1
            ORDER BY event_type""",
        "attribution_last_touch_events": """
            WITH lt AS (
              SELECT user_id, event_type, epoch(ts) AS t, event_id, value,
                     last_value(CASE WHEN event_type <> 'purchase' THEN epoch(ts) END
                                IGNORE NULLS) OVER w AS lt_t,
                     last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                                IGNORE NULLS) OVER w AS lt_typ
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY epoch(ts), event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
            ),
            conv AS (
              SELECT CASE WHEN lt_t IS NOT NULL AND t - lt_t <= 604800
                          THEN lt_typ END AS touch_type,
                     COALESCE(value, 0.0) AS val
              FROM lt WHERE event_type = 'purchase'
            ),
            per AS (
              SELECT COALESCE(touch_type, '(unattributed)') AS touch_type,
                     CAST(COUNT(*) AS BIGINT) AS n_conversions,
                     SUM(CAST(""" + _gq("val", 6) + """ AS DECIMAL(18,6))) AS sv
              FROM conv GROUP BY 1
            ),
            tot AS (SELECT SUM(n_conversions) AS t FROM per)
            SELECT touch_type, n_conversions,
                   """ + _gq("CAST(sv AS DOUBLE)", 6) + """ AS credited_value,
                   """ + _gq("CAST(n_conversions AS DOUBLE) / CAST(t AS DOUBLE)", 6) + """ AS share
            FROM per, tot ORDER BY touch_type""",
        "psi_value_drift_by_type": """
            WITH mid AS (SELECT (min(epoch(ts)) + max(epoch(ts))) / 2.0 AS m FROM events),
            bounds AS (
              SELECT event_type AS g, """ + _gq("min(value)", 6) + """ AS lo,
                     """ + _gq("max(value)", 6) + """ AS hi
              FROM events WHERE value IS NOT NULL GROUP BY 1
            ),
            base AS (
              SELECT e.event_type AS g, """ + _gq("e.value", 6) + """ AS v,
                     epoch(e.ts) > m.m AS late, b.lo, b.hi
              FROM events e CROSS JOIN mid m JOIN bounds b ON b.g = e.event_type
              WHERE e.value IS NOT NULL
            ),
            observed AS (
              SELECT g,
                     CASE WHEN hi = lo THEN 0
                          ELSE least(9, CAST(floor((v - lo) * 10 / (hi - lo)) AS INT))
                     END AS b,
                     CAST(SUM(CASE WHEN NOT late THEN 1 ELSE 0 END) AS BIGINT) AS c_early,
                     CAST(SUM(CASE WHEN late THEN 1 ELSE 0 END) AS BIGINT) AS c_late
              FROM base GROUP BY 1, 2
            ),
            totals AS (
              SELECT g, CAST(SUM(c_early) AS BIGINT) AS t_early,
                     CAST(SUM(c_late) AS BIGINT) AS t_late
              FROM observed GROUP BY g
            ),
            -- the FULL bin grid per group: a bin empty in BOTH halves
            -- still carries its epsilon-floor term (lockstep with the
            -- Spark side)
            binned AS (
              SELECT t.g, CAST(r.i AS INT) AS b,
                     COALESCE(o.c_early, 0) AS c_early,
                     COALESCE(o.c_late, 0) AS c_late
              FROM totals t
              CROSS JOIN (SELECT unnest(range(0, 10)) AS i) r
              LEFT JOIN observed o ON o.g = t.g AND o.b = CAST(r.i AS INT)
            ),
            terms AS (
              SELECT b.g, t.t_early, t.t_late, b.c_early, b.c_late,
                     (CAST(b.c_early AS DOUBLE) + 0.5) / (CAST(t.t_early AS DOUBLE) + 5.0) AS p,
                     (CAST(b.c_late AS DOUBLE) + 0.5) / (CAST(t.t_late AS DOUBLE) + 5.0) AS q
              FROM binned b JOIN totals t USING (g)
            ),
            agg AS (
              SELECT g, MAX(t_early) AS n_early, MAX(t_late) AS n_late,
                     CAST(SUM(CASE WHEN c_early + c_late > 0 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_bins_used,
                     SUM(CAST(""" + _gq("(p - q) * ln(p / q)", 9) + """ AS DECIMAL(28,9))) AS s
              FROM terms GROUP BY g
            )
            SELECT g AS event_type, n_early, n_late, n_bins_used,
                   """ + _gq("CAST(s AS DOUBLE)", 6) + """ AS psi
            FROM agg ORDER BY event_type""",
        "triangle_count_terms": """
            WITH toksrc AS (
              SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS w
              FROM documents
              WHERE length(trim(lower(text))) > 0
                AND len(regexp_split_to_array(trim(lower(text)), '\\s+')) >= 2
            ), pairs AS (
              SELECT w[CAST(t.i AS INT)] AS src, w[CAST(t.i + 1 AS INT)] AS dst
              FROM toksrc, LATERAL (SELECT unnest(range(1, len(w))) AS i) t
            ),
            und AS (
              SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
              FROM pairs
              WHERE src IS NOT NULL AND dst IS NOT NULL AND src <> dst
            ),
            deg AS (
              SELECT n, CAST(COUNT(*) AS BIGINT) AS d
              FROM (SELECT a AS n FROM und UNION ALL SELECT b FROM und)
              GROUP BY n
            ),
            oriented AS (
              SELECT CASE WHEN lt THEN a ELSE b END AS u,
                     CASE WHEN lt THEN b ELSE a END AS v
              FROM (SELECT und.a, und.b,
                           (da.d < db.d) OR (da.d = db.d AND und.a < und.b) AS lt
                    FROM und
                    JOIN deg da ON da.n = und.a
                    JOIN deg db ON db.n = und.b)
            ),
            wedges AS (
              SELECT e1.u, e1.v AS x, e2.v AS y
              FROM oriented e1 JOIN oriented e2 ON e1.u = e2.u AND e1.v < e2.v
            ),
            tris AS (
              SELECT w.u, w.x, w.y FROM wedges w
              WHERE EXISTS (SELECT 1 FROM und WHERE und.a = w.x AND und.b = w.y)
            ),
            corners AS (
              SELECT u AS node FROM tris
              UNION ALL SELECT x FROM tris
              UNION ALL SELECT y FROM tris
            )
            SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
            FROM corners GROUP BY node
            ORDER BY n_triangles DESC, node ASC LIMIT 20""",
        "source_divergence_docs": """
            WITH toks AS (
              SELECT source AS g,
                     unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS term
              FROM documents WHERE length(trim(lower(text))) > 0
            ),
            per AS (SELECT g, term, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY 1, 2),
            corpus AS (SELECT term, CAST(SUM(c) AS BIGINT) AS ct FROM per GROUP BY term),
            vocab AS (SELECT CAST(COUNT(*) AS BIGINT) AS nv FROM corpus),
            totals AS (SELECT g, CAST(SUM(c) AS BIGINT) AS tg FROM per GROUP BY g),
            gtot AS (SELECT CAST(SUM(tg) AS BIGINT) AS tt FROM totals),
            seen_t AS (
              SELECT per.g, totals.tg,
                     (CAST(per.c AS DOUBLE) + 0.5)
                       / (CAST(totals.tg AS DOUBLE) + 0.5 * vocab.nv) AS p,
                     (CAST(corpus.ct - per.c AS DOUBLE) + 0.5)
                       / (CAST(gtot.tt - totals.tg AS DOUBLE) + 0.5 * vocab.nv) AS q
              FROM per JOIN corpus USING (term) JOIN totals USING (g)
                   CROSS JOIN gtot CROSS JOIN vocab
            ),
            agg AS (
              SELECT g, CAST(MAX(tg) AS BIGINT) AS n_tokens,
                     CAST(COUNT(*) AS BIGINT) AS n_terms,
                     SUM(CAST(""" + _gq("p * ln(p / q)", 9) + """ AS DECIMAL(28,9))) AS klpq,
                     SUM(CAST(""" + _gq("q * ln(q / p)", 9) + """ AS DECIMAL(28,9))) AS klqp,
                     SUM(CAST(""" + _gq(
            "p * ln(2.0 * p / (p + q)) + q * ln(2.0 * q / (p + q))", 9
        ) + """ AS DECIMAL(28,9))) AS js2
              FROM seen_t GROUP BY g
            ),
            comp_t AS (
              SELECT t.g,
                     0.5 / (CAST(t.tg AS DOUBLE) + 0.5 * vocab.nv) AS p,
                     (CAST(c0.ct AS DOUBLE) + 0.5)
                       / (CAST(gtot.tt - t.tg AS DOUBLE) + 0.5 * vocab.nv) AS q
              FROM corpus c0 CROSS JOIN totals t CROSS JOIN gtot CROSS JOIN vocab
              WHERE NOT EXISTS (SELECT 1 FROM per
                                WHERE per.g = t.g AND per.term = c0.term)
            ),
            comp_agg AS (
              SELECT g,
                     SUM(CAST(""" + _gq("p * ln(p / q)", 9) + """ AS DECIMAL(28,9))) AS klpq0,
                     SUM(CAST(""" + _gq("q * ln(q / p)", 9) + """ AS DECIMAL(28,9))) AS klqp0,
                     SUM(CAST(""" + _gq(
            "p * ln(2.0 * p / (p + q)) + q * ln(2.0 * q / (p + q))", 9
        ) + """ AS DECIMAL(28,9))) AS js20
              FROM comp_t GROUP BY g
            )
            SELECT a.g AS source, a.n_tokens, a.n_terms,
                   """ + _gq(
            "CAST(a.klpq + COALESCE(ca.klpq0, CAST(0 AS DECIMAL(28,9))) AS DOUBLE)", 6
        ) + """ AS kl_source_rest,
                   """ + _gq(
            "CAST(a.klqp + COALESCE(ca.klqp0, CAST(0 AS DECIMAL(28,9))) AS DOUBLE)", 6
        ) + """ AS kl_rest_source,
                   """ + _gq(
            "CAST(a.js2 + COALESCE(ca.js20, CAST(0 AS DECIMAL(28,9))) AS DOUBLE) / 2.0", 6
        ) + """ AS js_divergence
            FROM agg a LEFT JOIN comp_agg ca ON ca.g = a.g
            ORDER BY source""",
        "cramers_v_lang_source": f"""
            WITH cells AS (
              SELECT lang, source, COUNT(*) AS n_ij FROM documents
              WHERE lang IS NOT NULL AND source IS NOT NULL GROUP BY 1, 2
            ),
            rm AS (SELECT lang, SUM(n_ij) AS n_i FROM cells GROUP BY lang),
            cm AS (SELECT source, SUM(n_ij) AS n_j FROM cells GROUP BY source),
            tot AS (SELECT CAST(SUM(n_ij) AS BIGINT) AS n,
                           COUNT(DISTINCT lang) AS n_rows,
                           COUNT(DISTINCT source) AS n_cols
                    FROM cells),
            grid AS (
              SELECT r.lang, m.source, r.n_i, m.n_j,
                     COALESCE(c.n_ij, 0) AS n_ij
              FROM rm r CROSS JOIN cm m
                   LEFT JOIN cells c ON c.lang = r.lang AND c.source = m.source
            ),
            terms AS (
              SELECT CAST({_gq("(CAST(g.n_ij AS DOUBLE) - CAST(g.n_i AS DOUBLE) * CAST(g.n_j AS DOUBLE) / CAST(t.n AS DOUBLE)) * (CAST(g.n_ij AS DOUBLE) - CAST(g.n_i AS DOUBLE) * CAST(g.n_j AS DOUBLE) / CAST(t.n AS DOUBLE)) / (CAST(g.n_i AS DOUBLE) * CAST(g.n_j AS DOUBLE) / CAST(t.n AS DOUBLE))", 6)} AS DECIMAL(18,6)) AS trm
              FROM grid g, tot t
            ),
            s AS (SELECT CAST(SUM(trm) AS DOUBLE) AS chi2 FROM terms)
            SELECT s.chi2,
                   CAST((t.n_rows - 1) * (t.n_cols - 1) AS BIGINT) AS dof,
                   t.n,
                   CASE WHEN least(t.n_rows - 1, t.n_cols - 1) > 0 AND t.n > 0
                        THEN {_gq("sqrt(s.chi2 / (CAST(t.n AS DOUBLE) * CAST(least(t.n_rows - 1, t.n_cols - 1) AS DOUBLE)))", 6)}
                   END AS cramers_v
            FROM s, tot t""",
        "k_anonymity_orders": f"""
            WITH classes AS (
              SELECT o_orderstatus, o_orderpriority, month(o_orderdate) AS m,
                     COUNT(*) AS sz
              FROM orders GROUP BY 1, 2, 3
            )
            SELECT CAST(SUM(sz) AS BIGINT) AS n_rows,
                   COUNT(*) AS n_classes,
                   CAST(MIN(sz) AS BIGINT) AS min_class_size,
                   CAST(COALESCE(SUM(CASE WHEN sz < 5 THEN sz END), 0) AS BIGINT)
                     AS n_rows_below_k,
                   {_gq("CAST(COALESCE(SUM(CASE WHEN sz < 5 THEN sz END), 0) AS DOUBLE) / CAST(SUM(sz) AS DOUBLE)", 6)}
                     AS frac_rows_below_k
            FROM classes""",
        "chao1_vocab_by_source": rf"""
            WITH toks AS (
              SELECT source, unnest({_TOKS}) AS t FROM documents
              WHERE length(trim(lower(text))) > 0
            ),
            tf AS (SELECT source, t, COUNT(*) AS c FROM toks GROUP BY 1, 2)
            SELECT source,
                   COUNT(*) AS n_observed_terms,
                   CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1_singletons,
                   CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2_doubletons,
                   {_gq("CAST(COUNT(*) AS DOUBLE) + CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE) * (CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE) - 1) / (2.0 * (CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS DOUBLE) + 1))", 6)}
                     AS chao1_estimate
            FROM tf GROUP BY source ORDER BY source""",
        "kcore_terms_corpus": rf"""
            -- 3 unrolled peeling rounds, lockstep with graph.kcore_peel
            -- (the pagerank/HITS/markov fixed-iteration grading discipline)
            WITH toksrc AS (
              SELECT doc_id, {_TOKS} AS w FROM documents
              WHERE length(trim(lower(text))) > 0
                AND len({_TOKS}) >= 2
            ),
            prs AS (
              SELECT w[i] AS s, w[i+1] AS t
              FROM toksrc, LATERAL (SELECT unnest(range(1, len(w))) AS i) x
            ),
            edges AS (
              SELECT DISTINCT least(s, t) AS a, greatest(s, t) AS b
              FROM prs WHERE s IS NOT NULL AND t IS NOT NULL AND s <> t
            ),
            d1 AS (SELECT n, COUNT(*) AS d
                   FROM (SELECT a AS n FROM edges UNION ALL SELECT b AS n FROM edges)
                   GROUP BY n),
            k1 AS (SELECT n FROM d1 WHERE d >= 16),
            e1 AS (SELECT e.a, e.b FROM edges e
                   JOIN k1 x ON x.n = e.a JOIN k1 y ON y.n = e.b),
            d2 AS (SELECT n, COUNT(*) AS d
                   FROM (SELECT a AS n FROM e1 UNION ALL SELECT b AS n FROM e1)
                   GROUP BY n),
            k2 AS (SELECT n FROM d2 WHERE d >= 16),
            e2 AS (SELECT e.a, e.b FROM e1 e
                   JOIN k2 x ON x.n = e.a JOIN k2 y ON y.n = e.b),
            d3 AS (SELECT n, COUNT(*) AS d
                   FROM (SELECT a AS n FROM e2 UNION ALL SELECT b AS n FROM e2)
                   GROUP BY n),
            k3 AS (SELECT n FROM d3 WHERE d >= 16),
            e3 AS (SELECT e.a, e.b FROM e2 e
                   JOIN k3 x ON x.n = e.a JOIN k3 y ON y.n = e.b)
            SELECT node, CAST(COUNT(*) AS BIGINT) AS degree
            FROM (SELECT a AS node FROM e3 UNION ALL SELECT b AS node FROM e3)
            GROUP BY node ORDER BY node""",
        "heaps_law_fit_corpus": rf"""
            WITH toksrc AS (
              SELECT doc_id, {_TOKS} AS w FROM documents
              WHERE length(trim(lower(text))) > 0
            ),
            tk AS (
              SELECT doc_id, i AS pos, w[i] AS term
              FROM toksrc, LATERAL (SELECT unnest(range(1, len(w) + 1)) AS i) x
            ),
            marked AS (
              SELECT doc_id,
                     CASE WHEN row_number() OVER (PARTITION BY term
                                                  ORDER BY doc_id, pos) = 1
                          THEN 1 ELSE 0 END AS fst
              FROM tk
            ),
            per_doc AS (
              SELECT doc_id, COUNT(*) AS n_tok, SUM(fst) AS n_new
              FROM marked GROUP BY doc_id
            ),
            cum AS (
              SELECT SUM(n_tok) OVER (ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nn,
                     SUM(n_new) OVER (ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS vv
              FROM per_doc
            ),
            q AS (
              -- grid-quantized ln points + exact-decimal sufficient
              -- statistics, lockstep with grouped_linear_trend
              SELECT CAST({_gq("ln(CAST(nn AS DOUBLE))", 6)} AS DECIMAL(18,6)) AS x,
                     CAST({_gq("ln(CAST(vv AS DOUBLE))", 6)} AS DECIMAL(18,6)) AS y
              FROM cum WHERE nn > 0 AND vv > 0
            ),
            s AS (
              SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
                     SUM(CAST(x * y AS DECIMAL(38,12))) AS sxy,
                     SUM(CAST(x * x AS DECIMAL(38,12))) AS sxx
              FROM q
            ),
            g AS (
              SELECT n,
                     CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS numer,
                     CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS denom,
                     CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
              FROM s
            )
            SELECT CAST(n AS BIGINT) AS n_docs,
                   CASE WHEN denom != 0
                        THEN {_gq("numer / denom", 6)} END AS heaps_beta,
                   CASE WHEN denom != 0
                        THEN {_gq("exp((syd - (numer / denom) * sxd) / CAST(n AS DOUBLE))", 6)}
                   END AS heaps_k
            FROM g""",
        "kruskal_wallis_value_by_type": f"""
            -- doubled-midrank identity shared with mann_whitney: exact
            -- integer rank sums; R_j^2/n_j terms on the 1e-2 grid
            -- (definitional, keeps the 2^62/10^d guard at 4.6e16)
            WITH base AS (
              SELECT event_type AS g, value AS v FROM events WHERE value IS NOT NULL
            ),
            ranked AS (
              SELECT g,
                     CAST(rank() OVER (ORDER BY v) * 2
                          + COUNT(*) OVER (PARTITION BY v) - 1 AS DECIMAL(19,0)) AS r2,
                     COUNT(*) OVER (PARTITION BY v) AS t
              FROM base
            ),
            per AS (
              SELECT g, CAST(COUNT(*) AS BIGINT) AS nj,
                     CAST(SUM(r2) AS DECIMAL(38,0)) AS r2j,
                     CAST(SUM(CAST(CAST(t AS DECIMAL(19,0)) * t - 1 AS DECIMAL(38,0)))
                          AS DECIMAL(38,0)) AS tie3j
              FROM ranked GROUP BY g
            ),
            red AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
                     CAST(SUM(nj) AS BIGINT) AS n_total,
                     SUM(CAST({_gq("(CAST(r2j AS DOUBLE) / 2.0) * (CAST(r2j AS DOUBLE) / 2.0) / CAST(nj AS DOUBLE)", 2)} AS DECIMAL(38,2))) AS sq,
                     CAST(SUM(tie3j) AS DECIMAL(38,0)) AS tie3
              FROM per
            )
            SELECT n_groups, n_total,
                   {_gq("12.0 / (CAST(n_total AS DOUBLE) * (CAST(n_total AS DOUBLE) + 1.0)) * CAST(sq AS DOUBLE) - 3.0 * (CAST(n_total AS DOUBLE) + 1.0)", 6)} AS h_statistic,
                   CASE WHEN 1.0 - CAST(tie3 AS DOUBLE) / (CAST(n_total AS DOUBLE) * CAST(n_total AS DOUBLE) * CAST(n_total AS DOUBLE) - CAST(n_total AS DOUBLE)) > 0
                        THEN {_gq("(12.0 / (CAST(n_total AS DOUBLE) * (CAST(n_total AS DOUBLE) + 1.0)) * CAST(sq AS DOUBLE) - 3.0 * (CAST(n_total AS DOUBLE) + 1.0)) / (1.0 - CAST(tie3 AS DOUBLE) / (CAST(n_total AS DOUBLE) * CAST(n_total AS DOUBLE) * CAST(n_total AS DOUBLE) - CAST(n_total AS DOUBLE)))", 6)}
                   END AS h_tie_corrected
            FROM red""",
        "cmh_conversion_by_priority": f"""
            -- per-stratum E/V rationals on the 1e-9 grid into exact
            -- decimal sums; continuity-corrected final on the 1e-6 grid
            WITH base AS (
              -- NULL variant/success rows excluded (review-found margin
              -- inconsistency), lockstep with cmh_test_stratified
              SELECT s, x, y FROM (
                SELECT o_orderpriority AS s,
                       CAST(o_orderkey % 2 AS INT) AS x,
                       CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
                FROM orders
              ) WHERE x IS NOT NULL AND y IS NOT NULL
            ),
            per AS (
              SELECT s,
                     CAST(SUM(x * y) AS BIGINT) AS a,
                     CAST(SUM(x) AS BIGINT) AS n1,
                     CAST(SUM(1 - x) AS BIGINT) AS n0,
                     CAST(SUM(y) AS BIGINT) AS m1,
                     CAST(SUM(1 - y) AS BIGINT) AS m0,
                     CAST(COUNT(*) AS BIGINT) AS nn
              FROM base GROUP BY s
            ),
            terms AS (
              SELECT a,
                     CAST({_gq("CAST(n1 AS DOUBLE) * CAST(m1 AS DOUBLE) / CAST(nn AS DOUBLE)", 9)} AS DECIMAL(28,9)) AS e,
                     CAST(CASE WHEN nn > 1 THEN {_gq("CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE) * CAST(m1 AS DOUBLE) * CAST(m0 AS DOUBLE) / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) - 1.0))", 9)} ELSE 0.0 END AS DECIMAL(28,9)) AS v
              FROM per
            ),
            red AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
                     CAST(SUM(a) AS BIGINT) AS sum_a,
                     SUM(e) AS se, SUM(v) AS sv
              FROM terms
            )
            SELECT n_strata, sum_a,
                   {_gq("CAST(se AS DOUBLE)", 6)} AS sum_expected,
                   CASE WHEN CAST(sv AS DOUBLE) > 0
                        THEN {_gq("(abs(CAST(sum_a AS DOUBLE) - CAST(se AS DOUBLE)) - 0.5) * (abs(CAST(sum_a AS DOUBLE) - CAST(se AS DOUBLE)) - 0.5) / CAST(sv AS DOUBLE)", 6)}
                   END AS cmh_statistic
            FROM red""",
        "page_hinkley_value_by_type": f"""
            -- fully-decimal PH walk: grid-6 inputs, grid-9 running means,
            -- exact decimal cumsum/min/max (lockstep with
            -- analytics.page_hinkley_by_group)
            WITH base AS (
              SELECT event_type AS g, ts, event_id,
                     CAST({_gq("value", 6)} AS DECIMAL(18,6)) AS x
              FROM events WHERE value IS NOT NULL
            ),
            cum AS (
              SELECT g, ts, event_id, x,
                     row_number() OVER w AS i,
                     SUM(x) OVER w AS s
              FROM base
              WINDOW w AS (PARTITION BY g ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING)
            ),
            dev AS (
              -- grid-6/(28,6) running mean (r12 rotation fix, lockstep
              -- with page_hinkley_by_group): scale 9 diverged past the
              -- scale-9 cast-exact bound |mean| > 9e6
              SELECT g, ts, event_id,
                     CAST(x AS DECIMAL(28,6))
                       - CAST({_gq("CAST(s AS DOUBLE) / CAST(i AS DOUBLE)", 6)} AS DECIMAL(28,6))
                       - CAST('0.005' AS DECIMAL(28,6)) AS d
              FROM cum
            ),
            usum AS (
              SELECT g, ts, event_id, SUM(d) OVER w AS u
              FROM dev
              WINDOW w AS (PARTITION BY g ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING)
            ),
            walked AS (
              SELECT g, u, MIN(u) OVER w AS m
              FROM usum
              WINDOW w AS (PARTITION BY g ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING)
            )
            SELECT g AS event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_obs,
                   -- (37,6) operands, lockstep with the Spark side's
                   -- precision-clamp workaround; r12: rendered as double
                   -- via the string round-trip (dec_double class; DECIMAL
                   -- finals are driver-hash-divergent)
                   {_dd("MAX(CAST(CAST(u AS DECIMAL(37,6)) - CAST(m AS DECIMAL(37,6)) AS DECIMAL(38,6)))")} AS ph_stat
            FROM walked GROUP BY g ORDER BY event_type""",
        "gumbel_return_level_by_type": f"""
            -- daily block maxima -> exact decimal moments -> one IEEE
            -- fit/level expression with shared numeric literals
            WITH daily AS (
              SELECT event_type AS g,
                     CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS d,
                     MAX(value) AS mx
              FROM events WHERE value IS NOT NULL GROUP BY 1, 2
            ),
            per AS (
              SELECT g, CAST(COUNT(*) AS BIGINT) AS n_days,
                     CAST(SUM(CAST({_gq("mx", 6)} AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS s,
                     -- (28,6) operands: DuckDB multiplies DECIMAL(<=18)
                     -- pairs in int64 physical width (r10 lesson) — the
                     -- wider operand forces the int128 path, values equal
                     CAST(SUM(CAST(CAST({_gq("mx", 6)} AS DECIMAL(28,6)) * CAST({_gq("mx", 6)} AS DECIMAL(28,6)) AS DECIMAL(38,12))) AS DECIMAL(38,12)) AS ss
              FROM daily GROUP BY g
            )
            SELECT g AS event_type, n_days,
                   {_gq("CAST(CAST(s AS VARCHAR) AS DOUBLE) / CAST(n_days AS DOUBLE)", 6)} AS mean_daily_max,
                   CASE WHEN n_days > 1 THEN {_gq("sqrt(greatest((CAST(CAST(ss AS VARCHAR) AS DOUBLE) - CAST(CAST(s AS VARCHAR) AS DOUBLE) * CAST(CAST(s AS VARCHAR) AS DOUBLE) / CAST(n_days AS DOUBLE)) / (CAST(n_days AS DOUBLE) - 1.0), 0.0)) * 2.449489742783178 / 3.141592653589793", 6)} END AS gumbel_beta,
                   CASE WHEN n_days > 1 THEN {_gq("CAST(CAST(s AS VARCHAR) AS DOUBLE) / CAST(n_days AS DOUBLE) - 0.5772156649015329 * (sqrt(greatest((CAST(CAST(ss AS VARCHAR) AS DOUBLE) - CAST(CAST(s AS VARCHAR) AS DOUBLE) * CAST(CAST(s AS VARCHAR) AS DOUBLE) / CAST(n_days AS DOUBLE)) / (CAST(n_days AS DOUBLE) - 1.0), 0.0)) * 2.449489742783178 / 3.141592653589793)", 6)} END AS gumbel_mu,
                   CASE WHEN n_days > 1 THEN {_gq("CAST(CAST(s AS VARCHAR) AS DOUBLE) / CAST(n_days AS DOUBLE) - 0.5772156649015329 * (sqrt(greatest((CAST(CAST(ss AS VARCHAR) AS DOUBLE) - CAST(CAST(s AS VARCHAR) AS DOUBLE) * CAST(CAST(s AS VARCHAR) AS DOUBLE) / CAST(n_days AS DOUBLE)) / (CAST(n_days AS DOUBLE) - 1.0), 0.0)) * 2.449489742783178 / 3.141592653589793) - (sqrt(greatest((CAST(CAST(ss AS VARCHAR) AS DOUBLE) - CAST(CAST(s AS VARCHAR) AS DOUBLE) * CAST(CAST(s AS VARCHAR) AS DOUBLE) / CAST(n_days AS DOUBLE)) / (CAST(n_days AS DOUBLE) - 1.0), 0.0)) * 2.449489742783178 / 3.141592653589793) * ln(-ln(1.0 - 1.0 / 30.0))", 6)} END AS return_level_30d
            FROM per ORDER BY event_type""",
        "theil_index_spend_by_nation": f"""
            -- (x/mu)*ln(x/mu) terms on the 1e-9 grid into an exact
            -- decimal sum (the behavior-entropy discipline); same
            -- customer-spend base as the gini query
            WITH spend AS (
              SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
              FROM orders GROUP BY o_custkey
            ),
            base AS (
              -- x >= 0: Theil is defined on non-negative values; negative
              -- rows are excluded by contract (lockstep with
              -- theil_index_by_group)
              SELECT n_name, x FROM (
                SELECT n.n_name,
                       CAST(COALESCE(s.spend, 0) AS DECIMAL(18,6)) AS x
                FROM customer c
                  LEFT JOIN spend s ON s.o_custkey = c.c_custkey
                  JOIN nation n ON n.n_nationkey = c.c_nationkey
              ) WHERE x >= 0
            ),
            per AS (
              SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n, SUM(x) AS sx
              FROM base GROUP BY n_name
            ),
            terms AS (
              SELECT b.n_name, p.n, p.sx,
                     CAST(CASE WHEN b.x > 0 AND p.sx > 0 THEN {_gq("(CAST(b.x AS DOUBLE) / (CAST(p.sx AS DOUBLE) / CAST(p.n AS DOUBLE))) * ln(CAST(b.x AS DOUBLE) / (CAST(p.sx AS DOUBLE) / CAST(p.n AS DOUBLE)))", 9)} ELSE 0.0 END AS DECIMAL(28,9)) AS term
              FROM base b JOIN per p USING (n_name)
            )
            SELECT n_name, CAST(MAX(n) AS BIGINT) AS n,
                   CASE WHEN MAX(sx) > 0
                        THEN {_gq("CAST(SUM(term) AS DOUBLE) / CAST(MAX(n) AS DOUBLE)", 6)}
                   END AS theil_t
            FROM terms GROUP BY n_name ORDER BY n_name""",
        "longest_streak_by_user_events": """
            WITH runs AS (
              SELECT user_id, event_type,
                     row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     - row_number() OVER (PARTITION BY user_id, event_type
                                          ORDER BY ts, event_id) AS isl
              FROM events
            ),
            rl AS (
              SELECT user_id, event_type, isl, COUNT(*) AS len
              FROM runs GROUP BY 1, 2, 3
            ),
            ranked AS (
              SELECT user_id, event_type, len,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY len DESC, event_type DESC) AS rk,
                     COUNT(*) OVER (PARTITION BY user_id) AS n_streaks
              FROM rl
            )
            SELECT user_id, CAST(n_streaks AS BIGINT) AS n_streaks,
                   CAST(len AS BIGINT) AS max_streak, event_type AS streak_type
            FROM ranked WHERE rk = 1 ORDER BY user_id""",
        "simpson_diversity_by_source": rf"""
            WITH toks AS (
              SELECT source, unnest({_TOKS}) AS t FROM documents
              WHERE length(trim(lower(text))) > 0
            ),
            tf AS (SELECT source, t, COUNT(*) AS c FROM toks GROUP BY 1, 2)
            SELECT source,
                   CAST(COUNT(*) AS BIGINT) AS n_types,
                   CAST(SUM(c) AS BIGINT) AS n_tokens,
                   CASE WHEN SUM(c) > 1
                        THEN {_gq("1.0 - CAST(SUM(c * (c - 1)) AS DOUBLE) / (CAST(SUM(c) AS DOUBLE) * (CAST(SUM(c) AS DOUBLE) - 1.0))", 6)}
                   END AS simpson_diversity
            FROM tf GROUP BY source ORDER BY source""",
        "yules_k_by_source": rf"""
            WITH toks AS (
              SELECT source, unnest({_TOKS}) AS t FROM documents
              WHERE length(trim(lower(text))) > 0
            ),
            tf AS (SELECT source, t, COUNT(*) AS c FROM toks GROUP BY 1, 2)
            SELECT source,
                   CAST(COUNT(*) AS BIGINT) AS n_types,
                   CAST(SUM(c) AS BIGINT) AS n_tokens,
                   CASE WHEN SUM(c) > 0
                        THEN {_gq("10000.0 * (CAST(SUM(c * c) AS DOUBLE) - CAST(SUM(c) AS DOUBLE)) / (CAST(SUM(c) AS DOUBLE) * CAST(SUM(c) AS DOUBLE))", 6)}
                   END AS yules_k
            FROM tf GROUP BY source ORDER BY source""",
        "vocab_churn_by_source": rf"""
            -- halves split by doc_id ORDER over ALL docs (empty texts
            -- count toward the split, contribute no tokens) — lockstep
            -- with vocab_churn_by_group's window
            WITH halved AS (
              SELECT source, text,
                     (row_number() OVER (PARTITION BY source ORDER BY doc_id) * 2
                        <= COUNT(*) OVER (PARTITION BY source) + 1) AS fh
              FROM documents
            ),
            toks AS (
              SELECT source, fh, unnest({_TOKS}) AS t
              FROM halved WHERE length(trim(lower(text))) > 0
            ),
            th AS (
              SELECT source, t,
                     MAX(CASE WHEN fh THEN 1 ELSE 0 END) AS in1,
                     MAX(CASE WHEN NOT fh THEN 1 ELSE 0 END) AS in2
              FROM toks GROUP BY 1, 2
            )
            SELECT source,
                   CAST(SUM(in1) AS BIGINT) AS v1_types,
                   CAST(SUM(in2) AS BIGINT) AS v2_types,
                   CAST(SUM(CASE WHEN in2 = 1 AND in1 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS new_types,
                   CASE WHEN SUM(in2) > 0
                        THEN {_gq("CAST(SUM(CASE WHEN in2 = 1 AND in1 = 0 THEN 1 ELSE 0 END) AS DOUBLE) / CAST(SUM(in2) AS DOUBLE)", 6)}
                   END AS new_type_rate
            FROM th GROUP BY source ORDER BY source""",
        "cohens_kappa_lang_id": f"""
            WITH scored AS (
              SELECT lang,
                     {_sw_hits('de')} AS s_de, {_sw_hits('en')} AS s_en, {_sw_hits('es')} AS s_es,
                     {_sw_hits('fr')} AS s_fr, {_sw_hits('zh')} AS s_zh
              FROM documents
            ),
            pred AS (SELECT lang, {_lang_case()} AS lang_pred FROM scored),
            conf AS (
              SELECT lang AS a, lang_pred AS b, CAST(COUNT(*) AS BIGINT) AS c
              FROM pred WHERE lang IS NOT NULL AND lang_pred IS NOT NULL
              GROUP BY 1, 2
            ),
            ra AS (SELECT a, SUM(c) AS r FROM conf GROUP BY a),
            cb AS (SELECT b, SUM(c) AS k FROM conf GROUP BY b),
            crossed AS (
              SELECT CAST(CAST(COALESCE(r, 0) AS DECIMAL(19,0))
                          * CAST(COALESCE(k, 0) AS DECIMAL(19,0)) AS DECIMAL(38,0)) AS rc
              FROM ra FULL JOIN cb ON ra.a = cb.b
            ),
            tot AS (
              SELECT CAST(SUM(c) AS DECIMAL(19,0)) AS nn,
                     CAST(SUM(CASE WHEN a = b THEN c ELSE 0 END) AS DECIMAL(19,0)) AS diag
              FROM conf
            ),
            red AS (SELECT CAST(SUM(rc) AS DECIMAL(38,0)) AS src FROM crossed)
            SELECT CAST(nn AS BIGINT) AS n_rows,
                   {_gq("CAST(diag AS DOUBLE) / CAST(nn AS DOUBLE)", 6)} AS observed_agreement,
                   {_gq("CAST(src AS DOUBLE) / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE))", 6)} AS expected_agreement,
                   CASE WHEN CAST(src AS DOUBLE) / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)) < 1.0
                        THEN {_gq("(CAST(diag AS DOUBLE) / CAST(nn AS DOUBLE) - CAST(src AS DOUBLE) / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE))) / (1.0 - CAST(src AS DOUBLE) / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)))", 6)}
                   END AS kappa
            FROM red, tot""",
        "wilcoxon_signed_rank_user_halves": f"""
            -- paired per-user half means on the grid-9 rationals;
            -- doubled-midrank |d| ranks over USER rows (lockstep with
            -- analytics.wilcoxon_signed_rank_by_user)
            WITH halved AS (
              SELECT user_id AS u,
                     CAST({_gq("value", 6)} AS DECIMAL(18,6)) AS x,
                     (row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) * 2
                        <= COUNT(*) OVER (PARTITION BY user_id) + 1) AS fh
              FROM events WHERE value IS NOT NULL
            ),
            per AS (
              SELECT u,
                     SUM(CASE WHEN fh THEN x END) AS s1,
                     SUM(CASE WHEN fh THEN 1 ELSE 0 END) AS n1,
                     SUM(CASE WHEN NOT fh THEN x END) AS s2,
                     SUM(CASE WHEN NOT fh THEN 1 ELSE 0 END) AS n2
              FROM halved GROUP BY u
            ),
            nz AS (
              SELECT u,
                     ({_gq("CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE)", 9)}
                      - {_gq("CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)", 9)}) AS d
              FROM per WHERE n1 > 0 AND n2 > 0
            ),
            nzf AS (SELECT * FROM nz WHERE d != 0),
            ranked AS (
              SELECT d,
                     CAST(rank() OVER (ORDER BY abs(d)) * 2
                          + COUNT(*) OVER (PARTITION BY abs(d)) - 1 AS DECIMAL(19,0)) AS r2,
                     COUNT(*) OVER (PARTITION BY abs(d)) AS t
              FROM nzf
            ),
            agg AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
                     CAST(SUM(CASE WHEN d > 0 THEN r2 END) AS DECIMAL(38,0)) AS w2plus,
                     CAST(SUM(CAST(CAST(t AS DECIMAL(19,0)) * t - 1 AS DECIMAL(38,0)))
                          AS DECIMAL(38,0)) AS tie3
              FROM ranked
            )
            SELECT n_pairs,
                   COALESCE(CAST(w2plus AS DOUBLE), 0.0) / 2.0 AS w_plus,
                   CASE WHEN CAST(n_pairs AS DOUBLE) * (CAST(n_pairs AS DOUBLE) + 1.0) * (2.0 * CAST(n_pairs AS DOUBLE) + 1.0) / 24.0 - CAST(tie3 AS DOUBLE) / 48.0 > 0
                        THEN {_gq("(COALESCE(CAST(w2plus AS DOUBLE), 0.0) / 2.0 - CAST(n_pairs AS DOUBLE) * (CAST(n_pairs AS DOUBLE) + 1.0) / 4.0) / sqrt(CAST(n_pairs AS DOUBLE) * (CAST(n_pairs AS DOUBLE) + 1.0) * (2.0 * CAST(n_pairs AS DOUBLE) + 1.0) / 24.0 - CAST(tie3 AS DOUBLE) / 48.0)", 6)}
                   END AS z_score
            FROM agg""",
        "friedman_value_by_type_blocks": f"""
            -- complete-block Friedman over grid-9 per-(user, type) means;
            -- within-block doubled midranks (lockstep with
            -- analytics.friedman_test_by_block)
            WITH per AS (
              SELECT user_id AS b, event_type AS t,
                     {_gq("CAST(SUM(CAST(" + _gq("value", 6) + " AS DECIMAL(18,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)", 9)} AS m
              FROM events WHERE value IS NOT NULL GROUP BY 1, 2
            ),
            k AS (SELECT CAST(COUNT(DISTINCT t) AS BIGINT) AS kt FROM per),
            complete AS (
              SELECT b, t, m FROM (
                SELECT b, t, m, COUNT(*) OVER (PARTITION BY b) AS kb FROM per
              ), k WHERE kb = k.kt
            ),
            ranked AS (
              SELECT b, t,
                     CAST(rank() OVER (PARTITION BY b ORDER BY m) * 2
                          + COUNT(*) OVER (PARTITION BY b, m) - 1 AS DECIMAL(19,0)) AS r2,
                     COUNT(*) OVER (PARTITION BY b, m) AS tt
              FROM complete
            ),
            pt AS (
              SELECT t, CAST(SUM(r2) AS DECIMAL(38,0)) AS r2sum
              FROM ranked GROUP BY t
            ),
            ties AS (
              SELECT CAST(SUM(CAST(CAST(tt AS DECIMAL(19,0)) * tt - 1 AS DECIMAL(38,0)))
                          AS DECIMAL(38,0)) AS tie3,
                     CAST(COUNT(*) // (SELECT kt FROM k) AS BIGINT) AS n_blocks
              FROM ranked
            ),
            red AS (
              SELECT SUM(CAST({_gq("(CAST(r2sum AS DOUBLE) / 2.0) * (CAST(r2sum AS DOUBLE) / 2.0)", 2)} AS DECIMAL(38,2))) AS sq
              FROM pt
            )
            SELECT CAST(k.kt AS BIGINT) AS n_treatments,
                   ties.n_blocks,
                   CASE WHEN ties.n_blocks > 0
                         AND CAST(ties.n_blocks AS DOUBLE) * CAST(k.kt AS DOUBLE) * (CAST(k.kt AS DOUBLE) + 1.0) - CAST(ties.tie3 AS DOUBLE) / (CAST(k.kt AS DOUBLE) - 1.0) > 0
                        THEN {_gq("(12.0 * CAST(red.sq AS DOUBLE) - 3.0 * CAST(ties.n_blocks AS DOUBLE) * CAST(ties.n_blocks AS DOUBLE) * CAST(k.kt AS DOUBLE) * (CAST(k.kt AS DOUBLE) + 1.0) * (CAST(k.kt AS DOUBLE) + 1.0)) / (CAST(ties.n_blocks AS DOUBLE) * CAST(k.kt AS DOUBLE) * (CAST(k.kt AS DOUBLE) + 1.0) - CAST(ties.tie3 AS DOUBLE) / (CAST(k.kt AS DOUBLE) - 1.0))", 6)}
                   END AS friedman_chi2
            FROM red, ties, k""",
        "cuped_adjusted_value_ab": f"""
            -- GRID-6 per-user half means (the welch input discipline —
            -- grid-9 decimal casts diverge past ~9e6, r11 magnitude
            -- sweep); exact decimal sufficient stats ((28,6) product
            -- operands here: DuckDB needs the int128 path, while the
            -- Spark side multiplies (18,6) operands); theta/means/ratio
            -- one IEEE expression each (lockstep with
            -- analytics.cuped_adjusted_ab)
            WITH halved AS (
              SELECT user_id AS u, CAST(user_id % 2 AS INT) AS v,
                     CAST({_gq("value", 6)} AS DECIMAL(18,6)) AS x,
                     (row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) * 2
                        <= COUNT(*) OVER (PARTITION BY user_id) + 1) AS fh
              FROM events WHERE value IS NOT NULL
            ),
            per AS (
              SELECT u, v,
                     SUM(CASE WHEN fh THEN x END) AS s1,
                     SUM(CASE WHEN fh THEN 1 ELSE 0 END) AS n1,
                     SUM(CASE WHEN NOT fh THEN x END) AS s2,
                     SUM(CASE WHEN NOT fh THEN 1 ELSE 0 END) AS n2
              FROM halved GROUP BY u, v
            ),
            urows AS (
              -- |half mean| < 1e9 contract filter, lockstep with
              -- cuped_adjusted_ab (consistent population in every sum)
              SELECT v,
                     CAST({_gq("CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)", 6)} AS DECIMAL(28,6)) AS pre,
                     CAST({_gq("CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE)", 6)} AS DECIMAL(28,6)) AS post
              FROM per WHERE n1 > 0 AND n2 > 0
                AND abs({_gq("CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)", 6)}) < 1e9
                AND abs({_gq("CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE)", 6)}) < 1e9
            ),
            red AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
                     CAST(SUM(pre) AS DECIMAL(38,6)) AS sx,
                     CAST(SUM(post) AS DECIMAL(38,6)) AS sy,
                     CAST(SUM(pre * post) AS DECIMAL(38,12)) AS sxy,
                     CAST(SUM(pre * pre) AS DECIMAL(38,12)) AS sxx,
                     CAST(SUM(post * post) AS DECIMAL(38,12)) AS syy,
                     CAST(SUM(CASE WHEN v = 1 THEN post END) AS DECIMAL(38,6)) AS sy1,
                     CAST(SUM(CASE WHEN v = 1 THEN pre END) AS DECIMAL(38,6)) AS sx1,
                     CAST(SUM(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS BIGINT) AS m1,
                     CAST(SUM(CASE WHEN v = 0 THEN post END) AS DECIMAL(38,6)) AS sy0,
                     CAST(SUM(CASE WHEN v = 0 THEN pre END) AS DECIMAL(38,6)) AS sx0,
                     CAST(SUM(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT) AS m0
              FROM urows
            ),
            d AS (
              -- dec_double VARCHAR round-trips, not bare casts (r11 class
              -- fix, lockstep with analytics.dec_double): the wide-decimal
              -- sums pass 2^53 scaled, where the int128 two-step cast can
              -- land an ulp off the correctly-rounded double
              SELECT n_users, m0, m1,
                     CAST(n_users AS DOUBLE) AS nd,
                     {_dd("sx")} AS sxd, {_dd("sy")} AS syd,
                     {_dd("sxy")} AS sxyd, {_dd("sxx")} AS sxxd,
                     {_dd("syy")} AS syyd,
                     {_dd("sy1")} AS sy1d, {_dd("sx1")} AS sx1d,
                     CAST(m1 AS DOUBLE) AS m1d,
                     {_dd("sy0")} AS sy0d, {_dd("sx0")} AS sx0d,
                     CAST(m0 AS DOUBLE) AS m0d
              FROM red
            ),
            e AS (
              SELECT *,
                     sxyd / nd - (sxd / nd) * (syd / nd) AS cov,
                     sxxd / nd - (sxd / nd) * (sxd / nd) AS varx,
                     syyd / nd - (syd / nd) * (syd / nd) AS vary
              FROM d
            ),
            t AS (
              SELECT *, CASE WHEN varx > 0 THEN cov / varx END AS theta
              FROM e
            )
            SELECT n_users,
                   {_gq("theta", 6)} AS theta,
                   CASE WHEN m0 > 0 AND theta IS NOT NULL
                        THEN {_gq("sy0d / m0d - theta * (sx0d / m0d - sxd / nd)", 6)}
                   END AS adj_mean_control,
                   CASE WHEN m1 > 0 AND theta IS NOT NULL
                        THEN {_gq("sy1d / m1d - theta * (sx1d / m1d - sxd / nd)", 6)}
                   END AS adj_mean_treatment,
                   CASE WHEN m0 > 0 AND m1 > 0 AND theta IS NOT NULL
                        THEN {_gq("(sy1d / m1d - theta * (sx1d / m1d - sxd / nd)) - (sy0d / m0d - theta * (sx0d / m0d - sxd / nd))", 6)}
                   END AS adj_effect,
                   CASE WHEN varx > 0 AND vary > 0
                        THEN {_gq("1.0 - (cov * cov) / (varx * vary)", 6)}
                   END AS var_ratio
            FROM t""",
        "lorenz_curve_spend_by_nation": f"""
            -- exact decimal cumsums in (spend, custkey) order; decile
            -- cutoff rank = (n*d) div 10 in exact long arithmetic
            -- (lockstep with profiling.lorenz_curve_points)
            WITH spend AS (
              SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
              FROM orders GROUP BY o_custkey
            ),
            base AS (
              SELECT n.n_name, c.c_custkey,
                     CAST(COALESCE(s.spend, 0) AS DECIMAL(18,6)) AS x
              FROM customer c
                LEFT JOIN spend s ON s.o_custkey = c.c_custkey
                JOIN nation n ON n.n_nationkey = c.c_nationkey
            ),
            ranked AS (
              SELECT n_name,
                     row_number() OVER (PARTITION BY n_name ORDER BY x, c_custkey) AS i,
                     SUM(x) OVER (PARTITION BY n_name ORDER BY x, c_custkey
                                  ROWS UNBOUNDED PRECEDING) AS cum,
                     COUNT(*) OVER (PARTITION BY n_name) AS n,
                     SUM(x) OVER (PARTITION BY n_name) AS tot
              FROM base
            ),
            gstats AS (
              SELECT n_name, MAX(n) AS n, MAX(tot) AS tot FROM ranked GROUP BY n_name
            ),
            -- always 10 rows per group (r11 review: a zero cutoff emits
            -- the mathematically-correct 0.0 point instead of dropping
            -- the row), lockstep with lorenz_curve_points
            grid AS (
              SELECT g.n_name, g.n, g.tot, CAST(d.decile AS INT) AS decile,
                     (g.n * d.decile) // 10 AS cutoff
              FROM gstats g, (SELECT unnest(range(1, 11)) AS decile) d
            )
            SELECT gr.n_name, gr.decile,
                   CAST(gr.n AS BIGINT) AS n,
                   CASE WHEN gr.cutoff = 0 THEN 0.0
                        WHEN gr.tot > 0
                        THEN {_gq("CAST(r.cum AS DOUBLE) / CAST(gr.tot AS DOUBLE)", 6)}
                   END AS cum_share
            FROM grid gr LEFT JOIN ranked r
              ON r.n_name = gr.n_name AND r.i = gr.cutoff
            ORDER BY gr.n_name, gr.decile""",
        "bowley_moors_value_by_type": f"""
            -- seven octiles via explicit order statistics (the
            -- exact_percentiles shape), one fixed IEEE expression per
            -- shape statistic (lockstep with profiling.bowley_moors_shape)
            WITH ranked AS (
              SELECT event_type, value,
                     row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
                     COUNT(*) OVER (PARTITION BY event_type) AS n
              FROM events WHERE value IS NOT NULL
            ),
            oct AS (
              SELECT event_type, k,
                     MAX(CASE WHEN rn = ((n - 1) * k) // 8 + 1 THEN value END) AS vlo,
                     MAX(CASE WHEN rn = least(((n - 1) * k) // 8 + 2, n) THEN value END) AS vhi,
                     MAX(CASE WHEN rn = 1
                         THEN CAST(((n - 1) * k) % 8 AS DOUBLE) / 8.0 END) AS fr
              FROM ranked CROSS JOIN (SELECT unnest(range(1, 8)) AS k) ks
              GROUP BY event_type, k
            ),
            wide AS (
              SELECT event_type,
                     MAX(CASE WHEN k = 1 THEN vlo + (vhi - vlo) * fr END) AS e1,
                     MAX(CASE WHEN k = 2 THEN vlo + (vhi - vlo) * fr END) AS e2,
                     MAX(CASE WHEN k = 3 THEN vlo + (vhi - vlo) * fr END) AS e3,
                     MAX(CASE WHEN k = 4 THEN vlo + (vhi - vlo) * fr END) AS e4,
                     MAX(CASE WHEN k = 5 THEN vlo + (vhi - vlo) * fr END) AS e5,
                     MAX(CASE WHEN k = 6 THEN vlo + (vhi - vlo) * fr END) AS e6,
                     MAX(CASE WHEN k = 7 THEN vlo + (vhi - vlo) * fr END) AS e7
              FROM oct GROUP BY event_type
            )
            SELECT event_type,
                   {_gq("e2", 6)} AS q1,
                   {_gq("e4", 6)} AS median,
                   {_gq("e6", 6)} AS q3,
                   CASE WHEN e6 - e2 != 0
                        THEN {_gq("(e2 + e6 - 2.0 * e4) / (e6 - e2)", 6)}
                   END AS bowley_skew,
                   CASE WHEN e6 - e2 != 0
                        THEN {_gq("((e7 - e5) + (e3 - e1)) / (e6 - e2)", 6)}
                   END AS moors_kurtosis
            FROM wide ORDER BY event_type""",
        "theil_decomposition_spend": f"""
            -- grid-9 log terms into exact decimal sums on every tier
            -- (lockstep with profiling.theil_decomposition)
            WITH spend AS (
              SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
              FROM orders GROUP BY o_custkey
            ),
            base AS (
              SELECT n_name, x FROM (
                SELECT n.n_name,
                       CAST(COALESCE(s.spend, 0) AS DECIMAL(18,6)) AS x
                FROM customer c
                  LEFT JOIN spend s ON s.o_custkey = c.c_custkey
                  JOIN nation n ON n.n_nationkey = c.c_nationkey
              ) WHERE x >= 0
            ),
            per_g AS (
              SELECT n_name, CAST(COUNT(*) AS BIGINT) AS ng, SUM(x) AS sg
              FROM base GROUP BY n_name
            ),
            tot AS (
              SELECT CAST(SUM(ng) AS BIGINT) AS n, CAST(SUM(sg) AS DECIMAL(38,6)) AS s
              FROM per_g
            ),
            terms AS (
              SELECT b.n_name, g.ng, g.sg, t.n, t.s,
                     CAST(CASE WHEN b.x > 0 AND t.s > 0
                          THEN {_gq("(CAST(b.x AS DOUBLE) / (CAST(t.s AS DOUBLE) / CAST(t.n AS DOUBLE))) * ln(CAST(b.x AS DOUBLE) / (CAST(t.s AS DOUBLE) / CAST(t.n AS DOUBLE)))", 9)}
                          ELSE 0.0 END AS DECIMAL(28,9)) AS t_term,
                     CAST(CASE WHEN b.x > 0 AND g.sg > 0
                          THEN {_gq("(CAST(b.x AS DOUBLE) / (CAST(g.sg AS DOUBLE) / CAST(g.ng AS DOUBLE))) * ln(CAST(b.x AS DOUBLE) / (CAST(g.sg AS DOUBLE) / CAST(g.ng AS DOUBLE)))", 9)}
                          ELSE 0.0 END AS DECIMAL(28,9)) AS w_term
              FROM base b JOIN per_g g USING (n_name) CROSS JOIN tot t
            ),
            grp AS (
              SELECT n_name, MAX(ng) AS ng, MAX(sg) AS sg, MAX(n) AS n, MAX(s) AS s,
                     SUM(t_term) AS tt, SUM(w_term) AS wt
              FROM terms GROUP BY n_name
            ),
            gterms AS (
              SELECT n, s, tt,
                     CAST(CASE WHEN sg > 0 AND s > 0
                          THEN {_gq("(CAST(sg AS DOUBLE) / CAST(s AS DOUBLE)) * ln((CAST(sg AS DOUBLE) / CAST(s AS DOUBLE)) / (CAST(ng AS DOUBLE) / CAST(n AS DOUBLE)))", 9)}
                          ELSE 0.0 END AS DECIMAL(28,9)) AS b_term,
                     CAST(CASE WHEN sg > 0 AND s > 0
                          THEN {_gq("(CAST(sg AS DOUBLE) / CAST(s AS DOUBLE)) * (CAST(wt AS DOUBLE) / CAST(ng AS DOUBLE))", 9)}
                          ELSE 0.0 END AS DECIMAL(28,9)) AS in_term
              FROM grp
            ),
            red AS (
              SELECT MAX(n) AS n, MAX(s) AS s, SUM(tt) AS tt,
                     SUM(b_term) AS bt, SUM(in_term) AS wt
              FROM gterms
            )
            SELECT n,
                   CASE WHEN s > 0
                        THEN {_gq("CAST(tt AS DOUBLE) / CAST(n AS DOUBLE)", 6)}
                   END AS theil_total,
                   CASE WHEN s > 0 THEN {_gq("CAST(bt AS DOUBLE)", 6)} END AS theil_between,
                   CASE WHEN s > 0 THEN {_gq("CAST(wt AS DOUBLE)", 6)} END AS theil_within
            FROM red""",
        "wasserstein_value_drift_by_type": f"""
            -- exact order-statistic half split; |F1-F2|*dv segment terms
            -- on the grid-9 into exact decimal sums (lockstep with
            -- analytics.wasserstein_drift_by_group)
            WITH halved AS (
              SELECT event_type AS g, CAST(value AS DOUBLE) AS v,
                     (row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) * 2
                        <= COUNT(*) OVER (PARTITION BY event_type) + 1) AS fh
              FROM events WHERE value IS NOT NULL
            ),
            per_v AS (
              SELECT g, v,
                     CAST(SUM(CASE WHEN fh THEN 1 ELSE 0 END) AS BIGINT) AS c1,
                     CAST(SUM(CASE WHEN NOT fh THEN 1 ELSE 0 END) AS BIGINT) AS c2
              FROM halved GROUP BY g, v
            ),
            cum AS (
              SELECT g, v,
                     CAST(SUM(c1) OVER wv AS BIGINT) AS k1,
                     CAST(SUM(c2) OVER wv AS BIGINT) AS k2,
                     CAST(SUM(c1) OVER wg AS BIGINT) AS n1,
                     CAST(SUM(c2) OVER wg AS BIGINT) AS n2,
                     lead(v) OVER wv AS nv
              FROM per_v
              WINDOW wv AS (PARTITION BY g ORDER BY v ROWS UNBOUNDED PRECEDING),
                     wg AS (PARTITION BY g)
            ),
            seg AS (
              SELECT g, n1, n2,
                     CAST(CASE WHEN nv IS NOT NULL AND n1 > 0 AND n2 > 0
                          THEN {_gq("abs(CAST(k1 AS DOUBLE) / CAST(n1 AS DOUBLE) - CAST(k2 AS DOUBLE) / CAST(n2 AS DOUBLE)) * (nv - v)", 9)}
                          ELSE 0.0 END AS DECIMAL(28,9)) AS t
              FROM cum
            ),
            red AS (
              SELECT g, MAX(n1) AS n1, MAX(n2) AS n2, SUM(t) AS w FROM seg GROUP BY g
            )
            SELECT g AS event_type,
                   n1 AS n_first_half, n2 AS n_second_half,
                   CASE WHEN n1 > 0 AND n2 > 0
                        THEN {_gq("CAST(w AS DOUBLE)", 6)}
                   END AS w1_distance
            FROM red ORDER BY event_type""",
        "brown_forsythe_value_by_type": f"""
            -- exact order-statistic group medians (_interp_sql), grid-6
            -- |x - med| into DECIMAL(18,6) exact sufficient statistics
            -- (the welch input discipline: scale-6 casts stay engine-
            -- exact to |z| < 2^53/1e6),
            -- fixed-IEEE SS terms on the grid (lockstep with
            -- analytics.brown_forsythe_test)
            WITH ranked AS (
              SELECT event_type AS g, CAST(value AS DOUBLE) AS val,
                     row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
                     COUNT(*) OVER (PARTITION BY event_type) AS n
              FROM events WHERE value IS NOT NULL
            ),
            meds AS (SELECT g, {_interp_sql("val", 1, 2)} AS m FROM ranked GROUP BY g),
            zrows AS (
              -- |deviation| past 2^53/1e6 cannot quantize engine-exactly
              -- at scale 6: pinned to 0 in the sums and COUNTED, so the
              -- statistic NULLs deterministically (lockstep with the
              -- Spark z_oob guard)
              SELECT e.event_type AS g,
                     CAST(CASE WHEN abs(CAST(e.value AS DOUBLE) - m.m) >= 9.0e9 THEN 0.0
                          ELSE {_gq("abs(CAST(e.value AS DOUBLE) - m.m)", 6)} END AS DECIMAL(18,6)) AS z,
                     CASE WHEN abs(CAST(e.value AS DOUBLE) - m.m) >= 9.0e9 THEN 1 ELSE 0 END AS zoob
              FROM events e JOIN meds m ON m.g = e.event_type
              WHERE e.value IS NOT NULL
            ),
            per AS (
              SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(z) AS DECIMAL(28,6)) AS s,
                     CAST(SUM(CAST(z AS DECIMAL(28,6)) * CAST(z AS DECIMAL(28,6))) AS DECIMAL(38,12)) AS q,
                     CAST(SUM(zoob) AS BIGINT) AS zoob
              FROM zrows GROUP BY g
            ),
            gtot AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(n) AS BIGINT) AS nn,
                     CAST(SUM(s) AS DECIMAL(38,6)) AS ss,
                     CAST(SUM(zoob) AS BIGINT) AS g_zoob
              FROM per
            ),
            terms AS (
              SELECT p.n, g.k, g.nn, g.g_zoob, g.ss AS g_ss, {_dd("p.q")} AS qd,
                     {_gq(f'{_dd("p.s")} / CAST(p.n AS DOUBLE)', 9)} AS mj,
                     {_gq(f'{_dd("g.ss")} / CAST(g.nn AS DOUBLE)', 9)} AS mg
              FROM per p, gtot g
            ),
            t2 AS (
              -- per-group mean-square quantities NORMALIZED by mg^2 (F
              -- is scale-invariant; mg^2 cancels in the ratio) so the
              -- 1e-9 scaled-integer grid carries ~9 RELATIVE digits at
              -- any magnitude; mg = 0 pins to 0 (0/0 is NaN) and the
              -- g_ss > 0 output condition returns the NULL (lockstep
              -- with analytics.brown_forsythe_test)
              SELECT k, nn, n, g_zoob, g_ss,
                     CASE WHEN mg > 0
                          THEN (qd / CAST(n AS DOUBLE) - mj * mj) / (mg * mg)
                          ELSE 0.0 END AS w,
                     CASE WHEN mg > 0
                          THEN ((mj - mg) / mg) * ((mj - mg) / mg)
                          ELSE 0.0 END AS b
              FROM terms
            ),
            red AS (
              SELECT MAX(k) AS k, MAX(nn) AS nn,
                     MAX(g_zoob) AS g_zoob, MAX(g_ss) AS g_ss,
                     SUM(CASE WHEN abs(w) >= 4.61168601842738819e+09 THEN 1 ELSE 0 END) AS oob_w,
                     SUM(CASE WHEN abs(b) >= 4.61168601842738819e+09 THEN 1 ELSE 0 END) AS oob_b,
                     SUM(CAST(n AS HUGEINT) * (CASE WHEN abs(w) >= 4.61168601842738819e+09 THEN 0
                         WHEN w >= 0 THEN CAST(floor(w * 1e9 + 0.5) AS HUGEINT)
                         ELSE -CAST(floor(-w * 1e9 + 0.5) AS HUGEINT) END)) AS ssw,
                     SUM(CAST(n AS HUGEINT) * (CASE WHEN abs(b) >= 4.61168601842738819e+09 THEN 0
                         WHEN b >= 0 THEN CAST(floor(b * 1e9 + 0.5) AS HUGEINT)
                         ELSE -CAST(floor(-b * 1e9 + 0.5) AS HUGEINT) END)) AS ssb
              FROM t2
            )
            SELECT CAST(k AS BIGINT) AS n_groups, CAST(nn AS BIGINT) AS n_total,
                   CAST(k - 1 AS BIGINT) AS df_between,
                   CAST(nn - k AS BIGINT) AS df_within,
                   CASE WHEN k > 1 AND nn > k AND ssw > 0
                             AND oob_w = 0 AND oob_b = 0
                             AND g_zoob = 0 AND g_ss > 0
                        THEN {_gq("((CAST(nn AS DOUBLE) - CAST(k AS DOUBLE)) / (CAST(k AS DOUBLE) - 1.0)) * (CAST(ssb AS DOUBLE) / CAST(ssw AS DOUBLE))", 6)}
                   END AS bf_statistic
            FROM red""",
        "log_rank_conversion_by_variant": f"""
            -- the survival_conversion_curve per-user collapse split by
            -- variant = user_id mod 2; hypergeometric E/V terms grid-9
            -- into exact decimal sums (lockstep with
            -- analytics.log_rank_test)
            WITH starts AS (
              SELECT user_id, MIN(epoch(ts)) AS t0 FROM events
              WHERE event_type = 'signup' GROUP BY user_id
            ),
            horizon AS (SELECT MAX(epoch(ts)) AS tmax FROM events),
            conv AS (
              SELECT e.user_id, MIN(epoch(e.ts)) AS te
              FROM events e JOIN starts s ON s.user_id = e.user_id
              WHERE e.event_type = 'purchase' AND epoch(e.ts) >= s.t0
              GROUP BY e.user_id
            ),
            per_user AS (
              SELECT CAST(s.user_id % 2 AS INT) AS v,
                     CASE WHEN c.te IS NOT NULL
                          THEN CAST(floor((c.te - s.t0) / 86400.0) AS BIGINT) END AS event_day,
                     CAST(floor((h.tmax - s.t0) / 86400.0) AS BIGINT) AS censor_day
              FROM starts s LEFT JOIN conv c ON c.user_id = s.user_id CROSS JOIN horizon h
            ),
            per_day AS (
              SELECT COALESCE(event_day, censor_day) AS t,
                     SUM(CASE WHEN event_day IS NOT NULL AND v = 0 THEN 1 ELSE 0 END) AS d0,
                     SUM(CASE WHEN event_day IS NOT NULL AND v = 1 THEN 1 ELSE 0 END) AS d1,
                     SUM(CASE WHEN event_day IS NULL AND v = 0 THEN 1 ELSE 0 END) AS c0,
                     SUM(CASE WHEN event_day IS NULL AND v = 1 THEN 1 ELSE 0 END) AS c1
              FROM per_user GROUP BY 1
            ),
            tot AS (
              SELECT CAST(SUM(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
                     CAST(SUM(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb
              FROM per_user
            ),
            risk AS (
              SELECT t, d0, d1, na, nb,
                     na - COALESCE(SUM(d0 + c0) OVER (ORDER BY t
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS r0,
                     nb - COALESCE(SUM(d1 + c1) OVER (ORDER BY t
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS r1
              FROM per_day CROSS JOIN tot
            ),
            terms AS (
              SELECT t, d1, na, nb,
                     CAST(CASE WHEN d0 + d1 > 0 AND r0 + r1 > 0
                          THEN {_gq("CAST(d0 + d1 AS DOUBLE) * CAST(r1 AS DOUBLE) / CAST(r0 + r1 AS DOUBLE)", 9)}
                          ELSE 0.0 END AS DECIMAL(28,9)) AS e1,
                     CAST(CASE WHEN d0 + d1 > 0 AND r0 + r1 > 1
                          THEN {_gq("CAST(d0 + d1 AS DOUBLE) * (CAST(r0 AS DOUBLE) / CAST(r0 + r1 AS DOUBLE)) * (CAST(r1 AS DOUBLE) / CAST(r0 + r1 AS DOUBLE)) * ((CAST(r0 + r1 AS DOUBLE) - CAST(d0 + d1 AS DOUBLE)) / (CAST(r0 + r1 AS DOUBLE) - 1.0))", 9)}
                          ELSE 0.0 END AS DECIMAL(28,9)) AS v1
              FROM risk
            ),
            red AS (
              SELECT MAX(na) AS na, MAX(nb) AS nb,
                     CAST(SUM(d1) AS BIGINT) AS o1,
                     SUM(e1) AS e1, SUM(v1) AS v1
              FROM terms
            )
            SELECT CAST(na AS BIGINT) AS n_users_a, CAST(nb AS BIGINT) AS n_users_b,
                   o1 AS observed_b,
                   {_gq("CAST(e1 AS DOUBLE)", 6)} AS expected_b,
                   CASE WHEN v1 > 0
                        THEN {_gq("(CAST(o1 AS DOUBLE) - CAST(e1 AS DOUBLE)) * (CAST(o1 AS DOUBLE) - CAST(e1 AS DOUBLE)) / CAST(v1 AS DOUBLE)", 6)}
                   END AS logrank_chi2
            FROM red""",
        "mcnemar_paired_conversion": f"""
            -- exact order-statistic half split (the wilcoxon/cuped rule)
            -- over ALL events; Edwards continuity-corrected chi2 floored
            -- at 0 (lockstep with analytics.mcnemar_paired_test)
            WITH halved AS (
              SELECT user_id AS u,
                     CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS hit,
                     (row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) * 2
                        <= COUNT(*) OVER (PARTITION BY user_id) + 1) AS fh,
                     COUNT(*) OVER (PARTITION BY user_id) AS n
              FROM events
            ),
            per AS (
              SELECT u,
                     MAX(CASE WHEN fh THEN hit ELSE 0 END) AS p1,
                     MAX(CASE WHEN NOT fh THEN hit ELSE 0 END) AS p2
              FROM halved WHERE n >= 2 GROUP BY u
            ),
            red AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
                     CAST(SUM(CASE WHEN p1 = 1 AND p2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
                     CAST(SUM(CASE WHEN p1 = 1 AND p2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_first_only,
                     CAST(SUM(CASE WHEN p1 = 0 AND p2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_second_only,
                     CAST(SUM(CASE WHEN p1 = 0 AND p2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_neither
              FROM per
            )
            SELECT n_users, n_both, n_first_only, n_second_only, n_neither,
                   CASE WHEN n_first_only + n_second_only > 0
                        THEN {_gq("greatest(abs(CAST(n_first_only AS DOUBLE) - CAST(n_second_only AS DOUBLE)) - 1.0, 0.0) * greatest(abs(CAST(n_first_only AS DOUBLE) - CAST(n_second_only AS DOUBLE)) - 1.0, 0.0) / (CAST(n_first_only AS DOUBLE) + CAST(n_second_only AS DOUBLE))", 6)}
                   END AS mcnemar_chi2
            FROM red""",
        "jonckheere_price_by_priority": f"""
            -- dictionary formulation: (value x group) grid with
            -- cumulative-below counts, one support-sized self-join for
            -- all ordered group pairs; HUGEINT exact variance
            -- ingredients (Spark twin uses DECIMAL(38,0)); lockstep with
            -- analytics.jonckheere_terpstra_test
            WITH per_gv AS (
              SELECT o_orderpriority AS g, CAST(o_totalprice AS DOUBLE) AS v,
                     CAST(COUNT(*) AS BIGINT) AS c
              FROM orders WHERE o_totalprice IS NOT NULL GROUP BY 1, 2
            ),
            grid AS (
              SELECT vs.v, gs.g, COALESCE(p.c, 0) AS c
              FROM (SELECT DISTINCT v FROM per_gv) vs
              CROSS JOIN (SELECT DISTINCT g FROM per_gv) gs
              LEFT JOIN per_gv p ON p.v = vs.v AND p.g = gs.g
            ),
            cum AS (
              SELECT v, g, c,
                     COALESCE(SUM(c) OVER (PARTITION BY g ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS lt
              FROM grid
            ),
            pairs AS (
              SELECT lo.v, lo.c AS ci, lo.lt AS lti, hi.c AS cj
              FROM cum lo JOIN cum hi ON lo.v = hi.v AND lo.g < hi.g
            ),
            jt AS (
              SELECT SUM(2 * CAST(cj AS HUGEINT) * CAST(lti AS HUGEINT)
                         + CAST(ci AS HUGEINT) * CAST(cj AS HUGEINT)) AS jt2
              FROM pairs
            ),
            per_g AS (SELECT g, CAST(SUM(c) AS BIGINT) AS n FROM per_gv GROUP BY g),
            g1 AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(n) AS BIGINT) AS nn,
                     SUM(CAST(n AS HUGEINT) * CAST(n AS HUGEINT)) AS sn2,
                     SUM(CAST(n AS HUGEINT) * (CAST(n AS HUGEINT) - 1) * (2 * CAST(n AS HUGEINT) + 5)) AS u1,
                     SUM(CAST(n AS HUGEINT) * (CAST(n AS HUGEINT) - 1)) AS u2,
                     SUM(CAST(n AS HUGEINT) * (CAST(n AS HUGEINT) - 1) * (CAST(n AS HUGEINT) - 2)) AS u3
              FROM per_g
            ),
            per_v AS (SELECT v, CAST(SUM(c) AS BIGINT) AS t FROM per_gv GROUP BY v),
            t1 AS (
              SELECT SUM(CAST(t AS HUGEINT) * (CAST(t AS HUGEINT) - 1) * (2 * CAST(t AS HUGEINT) + 5)) AS w1,
                     SUM(CAST(t AS HUGEINT) * (CAST(t AS HUGEINT) - 1)) AS w2,
                     SUM(CAST(t AS HUGEINT) * (CAST(t AS HUGEINT) - 1) * (CAST(t AS HUGEINT) - 2)) AS w3
              FROM per_v
            ),
            d AS (
              SELECT j.jt2, g.k, g.nn, CAST(g.nn AS DOUBLE) AS nd,
                     CAST(CAST(g.nn AS HUGEINT) * g.nn - g.sn2 AS DOUBLE) / 2.0 AS e2,
                     CAST(g.u1 AS DOUBLE) AS u1d, CAST(g.u2 AS DOUBLE) AS u2d,
                     CAST(g.u3 AS DOUBLE) AS u3d,
                     CAST(t.w1 AS DOUBLE) AS w1d, CAST(t.w2 AS DOUBLE) AS w2d,
                     CAST(t.w3 AS DOUBLE) AS w3d
              FROM jt j, g1 g, t1 t
            ),
            e AS (
              SELECT jt2, k, nn, nd, e2,
                     nd * (nd - 1.0) * (2.0 * nd + 5.0) - u1d - w1d AS a,
                     u3d * w3d / (36.0 * nd * (nd - 1.0) * (nd - 2.0)) AS bb,
                     u2d * w2d / (8.0 * nd * (nd - 1.0)) AS cc
              FROM d
            )
            SELECT CAST(k AS BIGINT) AS n_groups, CAST(nn AS BIGINT) AS n_total,
                   {_gq("CAST(jt2 AS DOUBLE) / 2.0", 6)} AS jt_statistic,
                   {_gq("e2 / 2.0", 6)} AS expected_jt,
                   CASE WHEN k > 1 AND a / 72.0 + bb + cc > 0
                        THEN {_gq("(CAST(jt2 AS DOUBLE) - e2) / (2.0 * sqrt(a / 72.0 + bb + cc))", 6)}
                   END AS jt_z
            FROM e""",
        "good_turing_missing_mass_by_source": rf"""
            -- the chao1 tokenization and term-frequency frame; P0 = N1/N
            -- and r1* = 2*N2/N1 as single int-derived IEEE divisions
            -- (lockstep with profiling.good_turing_missing_mass)
            WITH toks AS (
              SELECT source, unnest({_TOKS}) AS t FROM documents
              WHERE length(trim(lower(text))) > 0
            ),
            tf AS (SELECT source, t, COUNT(*) AS c FROM toks GROUP BY 1, 2)
            SELECT source,
                   CAST(SUM(c) AS BIGINT) AS n_tokens,
                   CAST(COUNT(*) AS BIGINT) AS n_terms,
                   CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1_singletons,
                   CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2_doubletons,
                   CASE WHEN SUM(c) > 0
                        THEN {_gq("CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE) / CAST(SUM(c) AS DOUBLE)", 6)}
                   END AS missing_mass,
                   CASE WHEN SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) > 0
                        THEN {_gq("2.0 * CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS DOUBLE) / CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)", 6)}
                   END AS r1_adjusted
            FROM tf GROUP BY source ORDER BY source""",
    }
