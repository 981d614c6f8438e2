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

SF_SMOKE = "/root/testdata/sf0.001"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.parquet stores TIMESTAMP(NANOS) which Spark's vectorized
        # reader rejects; read as long and truncate to micros (exactly what
        # DuckDB's micro-resolution TIMESTAMP does on the same file)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


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
    statuses = [r[0] for r in o.select("o_orderstatus").distinct().orderBy("o_orderstatus").collect()]
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
    return spark.createDataFrame([(m,) for m in months], "month timestamp")


def pk_violations_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PKViolatorsDataObject semantics (PKViolatorsDataObject.scala:56-61):
    duplicate keys + null key parts for candidate PK (user_id, event_type)."""
    ev = _t(spark, sf_dir, "events")
    dups = (
        ev.groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") > 1)
        .withColumn("violation", F.lit("duplicate"))
    )
    nulls = (
        ev.where(F.col("user_id").isNull() | F.col("event_type").isNull())
        .select("user_id", "event_type")
        .withColumn("cnt", F.lit(1).cast("long"))
        .withColumn("violation", F.lit("null_key"))
    )
    return dups.unionByName(nulls)


def data_validation_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataValidationTransformer semantics (DataValidationTransformer.scala:41):
    per-row rule violations collected into an error summary."""
    li = _t(spark, sf_dir, "lineitem")
    rule1 = ~(F.col("l_quantity") > 0)
    rule2 = ~(_dec("l_discount") <= F.lit(0.08).cast("decimal(18,2)"))
    rule3 = ~(_dec("l_tax") <= F.lit(0.06).cast("decimal(18,2)"))
    n_errors = (
        rule1.cast("int") + rule2.cast("int") + rule3.cast("int")
    )
    errors = F.concat_ws(
        ",",
        F.when(rule1, F.lit("qty_nonpos")),
        F.when(rule2, F.lit("disc_gt_8pct")),
        F.when(rule3, F.lit("tax_gt_6pct")),
    )
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            n_errors.alias("n_errors"),
            errors.alias("errors"),
        )
        .where(F.col("n_errors") > 0)
    )


def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (gap > 1 hour) via lag + cumulative flag sum — the
    standard Spark pattern for session windows in batch."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.withColumn(
        "new_session",
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.col("ts").cast("double") - F.lag("ts").over(w).cast("double") > 3600),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    sessions = flagged.withColumn(
        "session_no", F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
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

    docs = _t(spark, sf_dir, "documents")
    stats = with_text_stats(docs)
    return stats.select(
        "doc_id",
        "n_tokens",
        "n_chars_computed",
        F.round("punct_ratio", 6).alias("punct_ratio"),
        F.round("stopword_ratio", 6).alias("stopword_ratio"),
        F.round("mean_token_len", 6).alias("mean_token_len"),
        F.round("quality", 6).alias("quality"),
        "lang_pred",
        "fingerprint",
    )


def lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from smart_data_lake_spark.functions.text import lang_id

    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select("lang", lang_id(F.col("text")).alias("lang_pred"))
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
    sh = shingles(docs)
    sig = minhash_signatures(sh)
    return lsh_candidate_pairs(sig).orderBy("doc_a", "doc_b")


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from smart_data_lake_spark.functions.dedup import lsh_candidate_pairs, minhash_signatures, ngram_jaccard, shingles

    docs = _t(spark, sf_dir, "documents")
    # the shingle set feeds four subplans; measured: recompute + Spark's
    # ReusedExchange beats persist() here (caching the exploded shingle rows
    # costs more than the regex recompute at any tested SF)
    sh = shingles(docs)
    pairs = lsh_candidate_pairs(minhash_signatures(sh))
    return ngram_jaccard(sh, pairs).orderBy("doc_a", "doc_b")


def simhash_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from smart_data_lake_spark.functions.dedup import simhash

    return simhash(_t(spark, sf_dir, "documents")).orderBy("doc_id")


def ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from smart_data_lake_spark.functions.similarity import brute_force_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10).select(F.col("vec_id").alias("query_id"), "embedding")
    return brute_force_topk(emb, queries, k=5).orderBy("query_id", "rank")


def embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded-LSH near-dup: candidate pairs from hyperplane-sign bucket joins
    (never all-pairs — no nested-loop join in the plan), exact cosine verify
    on candidates only. The oracle reproduces the buckets bit-exactly by
    inlining the same plane literals."""
    from smart_data_lake_spark.functions.dedup import embedding_neardup_lsh

    emb = _t(spark, sf_dir, "embeddings")
    # synthetic embeddings top out near cos 0.5 — 0.4 plays the role a ~0.95
    # threshold would on a real near-dup corpus
    return embedding_neardup_lsh(
        emb, threshold=0.4, bands=_ND_BANDS, planes_per_band=_ND_PPB
    ).orderBy("id_a", "id_b")


def embedding_neardup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs exact near-dup — the small-N VERIFIER for the LSH variant
    (O(N²): input capped at a fixed 1000 vectors regardless of SF, the role
    this operator plays in production recall audits)."""
    from smart_data_lake_spark.functions.dedup import embedding_neardup_pairs

    emb = _t(spark, sf_dir, "embeddings").where(F.col("vec_id") < 1000)
    return embedding_neardup_pairs(emb, threshold=0.4).orderBy("id_a", "id_b")


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


def ann_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k (LSH buckets) — the 100 TB scale path: corpus
    bucketed in one projection, each query scores only its bucket."""
    from smart_data_lake_spark.functions.similarity import lsh_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10).select(F.col("vec_id").alias("query_id"), "embedding")
    return lsh_topk(emb, queries, k=5, n_planes=_ANN_PLANES).orderBy("query_id", "rank")


# --------------------------------------------------------------------------
# registry + oracles
# --------------------------------------------------------------------------

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q1_pricing_summary": q1_pricing_summary,
        "q3_shipping_priority": q3_shipping_priority,
        "q5_local_supplier_volume": q5_local_supplier_volume,
        "q6_revenue_forecast": q6_revenue_forecast,
        "q10_returned_items": q10_returned_items,
        "q4_order_priority": q4_order_priority,
        "q13_customer_distribution": q13_customer_distribution,
        "q16_parts_supplier": q16_parts_supplier,
        "q18_large_orders": q18_large_orders,
        "q22_global_sales": q22_global_sales,
        "topk_customers_window": topk_customers_window,
        "orders_running_total": orders_running_total,
        "pivot_order_status": pivot_order_status,
        "rollup_sales": rollup_sales,
        "dedup_latest_event": dedup_latest_event,
        "scd2_user_history": scd2_user_history,
        "incremental_highwatermark": incremental_highwatermark,
        "partition_diff": partition_diff,
        "pk_violations_events": pk_violations_events,
        "data_validation_lineitem": data_validation_lineitem,
        "sessionize_events": sessionize_events,
        "text_stats": text_stats,
        "lang_id_confusion": lang_id_confusion,
        "token_count_by_source": token_count_by_source,
        "dedup_exact": dedup_exact,
        "dedup_minhash": dedup_minhash,
        "dedup_ngram_jaccard": dedup_ngram_jaccard,
        "simhash_docs": simhash_docs,
        "ann_topk": ann_topk,
        "embedding_neardup": embedding_neardup,
        "embedding_neardup_exact": embedding_neardup_exact,
        "ann_topk_lsh": ann_topk_lsh,
        "multimodal_image_meta": multimodal_image_meta,
    }


# ---- oracle SQL builders (DuckDB dialect) --------------------------------

_TOKS = r"regexp_split_to_array(trim(lower(text)), '\s+')"
_NTOK = rf"CASE WHEN length(trim(lower(text))) = 0 THEN 0 ELSE len({_TOKS}) END"

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

_NUM_HASHES = 12
_BANDS = 4


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


def _cos_sql(a: str, b: str, dim: int = 64) -> str:
    dot = " + ".join(f"CAST({a}[{i}] AS DOUBLE) * CAST({b}[{i}] AS DOUBLE)" for i in range(1, dim + 1))
    na = " + ".join(f"CAST({a}[{i}] AS DOUBLE) * CAST({a}[{i}] AS DOUBLE)" for i in range(1, dim + 1))
    nb = " + ".join(f"CAST({b}[{i}] AS DOUBLE) * CAST({b}[{i}] AS DOUBLE)" for i in range(1, dim + 1))
    return f"round(({dot}) / (sqrt({na}) * sqrt({nb})), 6)"


def oracle_sql() -> dict[str, str]:
    from smart_data_lake_spark.functions.similarity import bucket_sql, random_hyperplanes

    rev = _REV_SQL
    ann_bucket = bucket_sql("embedding", random_hyperplanes(64, _ANN_PLANES))
    return {
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
        "partition_diff": """
            SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS month FROM lineitem
            EXCEPT
            SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) FROM orders
            ORDER BY month""",
        "pk_violations_events": """
            SELECT user_id, event_type, cnt, violation FROM (
              SELECT user_id, event_type, COUNT(*) AS cnt, 'duplicate' AS violation
              FROM events GROUP BY user_id, event_type HAVING COUNT(*) > 1
              UNION ALL
              SELECT user_id, event_type, CAST(1 AS BIGINT), 'null_key'
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
            SELECT doc_id,
                   {_NTOK} AS n_tokens,
                   length(text) AS n_chars_computed,
                   round(CASE WHEN length(text) = 0 THEN 0.0
                         ELSE (length(text) - length(regexp_replace(text, '[.,;:!?''"()\\-]', '', 'g'))) * 1.0 / length(text) END, 6) AS punct_ratio,
                   round(CASE WHEN {_NTOK} = 0 THEN 0.0
                         ELSE {_sw_hits('en')} * 1.0 / {_NTOK} END, 6) AS stopword_ratio,
                   round(CASE WHEN {_NTOK} = 0 THEN 0.0
                         ELSE list_sum(list_transform({_TOKS}, t -> length(t))) * 1.0 / {_NTOK} END, 6) AS mean_token_len,
                   round((CASE WHEN {_NTOK} BETWEEN 10 AND 100000 THEN 0.5 ELSE 0.0 END)
                       + (CASE WHEN (CASE WHEN length(text) = 0 THEN 0.0
                              ELSE (length(text) - length(regexp_replace(text, '[.,;:!?''"()\\-]', '', 'g'))) * 1.0 / length(text) END) < 0.2 THEN 0.3 ELSE 0.0 END)
                       + (CASE WHEN (CASE WHEN {_NTOK} = 0 THEN 0.0
                              ELSE list_sum(list_transform({_TOKS}, t -> length(t))) * 1.0 / {_NTOK} END) BETWEEN 2 AND 12 THEN 0.2 ELSE 0.0 END), 6) AS quality,
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
                   round(i.n_inter * 1.0 / (za.n + zb.n - i.n_inter), 6) AS jaccard
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
            WHERE a.vec_id < 1000 AND b.vec_id < 1000
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
    }
