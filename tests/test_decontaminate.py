"""Corpus-hygiene operators: decontamination, duplicated spans, importance
sampling, streaming session windows."""

from pyspark.sql import functions as F

from smart_data_lake_spark.functions.decontaminate import (
    benchmark_contamination,
    duplicated_span_stats,
)
from smart_data_lake_spark.functions.sampling import hash_fraction, importance_sample


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_benchmark_contamination_fractions(spark):
    # doc 1 shares its whole text with the benchmark; doc 2 shares a prefix;
    # doc 3 shares nothing; doc 4 is too short to shingle at n=3.
    corpus = _docs(
        spark,
        [
            (1, "a b c d e"),          # shingles: abc bcd cde — all in bench
            (2, "a b c x y z"),        # abc in bench; bcx cxy xyz not
            (3, "p q r s t"),          # none
            (4, "a b"),                # no shingles
        ],
    )
    bench = _docs(spark, [(100, "a b c d e f")])
    out = benchmark_contamination(corpus, bench, n=3, threshold=0.5)
    got = {r["doc_id"]: r for r in out.collect()}
    assert set(got) == {1, 2, 3}  # doc 4 absent: nothing to match on
    assert got[1]["n_grams"] == 3 and got[1]["n_matched"] == 3
    assert got[1]["contaminated"] is True
    assert got[2]["n_grams"] == 4 and got[2]["n_matched"] == 1
    assert got[2]["contaminated"] is False
    assert got[3]["n_matched"] == 0 and got[3]["contamination"] == 0.0


def test_benchmark_contamination_broadcasts_benchmark(spark):
    corpus = _docs(spark, [(1, "a b c d e")])
    bench = _docs(spark, [(2, "a b c")])
    plan = benchmark_contamination(corpus, bench, n=3)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_duplicated_span_stats(spark):
    # docs 1 and 2 share "a b c"; doc 3 is disjoint
    docs = _docs(spark, [(1, "a b c d"), (2, "a b c e"), (3, "x y z w")])
    got = {r["doc_id"]: r for r in duplicated_span_stats(docs, n=3).collect()}
    assert got[1]["n_spans"] == 2 and got[1]["n_dup_spans"] == 1
    assert got[1]["dup_fraction"] == 0.5
    assert got[2]["n_dup_spans"] == 1
    assert got[3]["n_dup_spans"] == 0 and got[3]["dup_fraction"] == 0.0


def test_importance_sample_extremes_and_determinism(spark):
    df = spark.range(0, 400).select(F.col("id").alias("doc_id"))
    assert importance_sample(df, F.lit(0.0)).count() == 0
    assert importance_sample(df, F.lit(1.0)).count() == 400
    half = importance_sample(df, F.lit(0.5))
    ids = sorted(r["doc_id"] for r in half.collect())
    # deterministic: same subset regardless of partitioning
    ids_repart = sorted(
        r["doc_id"] for r in importance_sample(df.repartition(13), F.lit(0.5)).collect()
    )
    assert ids == ids_repart
    # md5-uniform: roughly half of 400 keys land under the 0.5 cut
    assert 120 <= len(ids) <= 280


def test_importance_sample_weight_column(spark):
    df = spark.range(0, 200).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 100, F.lit(0.0)).otherwise(F.lit(1.0)).alias("w"),
    )
    kept = importance_sample(df, F.col("w")).collect()
    assert all(r["doc_id"] >= 100 for r in kept)
    assert len(kept) == 100


def test_streaming_session_counts_match_batch(spark, sf_dir):
    from smart_data_lake_spark.streaming.operators import (
        read_events_stream,
        run_available_now,
        session_event_counts,
    )

    sdf = read_events_stream(spark, sf_dir)
    streamed = run_available_now(session_event_counts(sdf)).select(
        "user_id", "session_start_epoch", "last_event_epoch", "n_events"
    )

    # batch gaps-and-islands over the same rows
    from smart_data_lake_spark.streaming.operators import read_events_batch

    ev = (
        read_events_batch(spark, sf_dir)
        .select("user_id", "ts")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    flagged = ev.withColumn(
        "brk",
        F.when(
            F.col("ts").cast("double") - F.lag("ts").over(w).cast("double") < 1800.0,
            F.lit(0),
        ).otherwise(F.lit(1)),
    )
    sess = flagged.withColumn(
        "sid", F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    batch = sess.groupBy("user_id", "sid").agg(
        F.unix_timestamp(F.min("ts")).alias("session_start_epoch"),
        F.unix_timestamp(F.max("ts")).alias("last_event_epoch"),
        F.count(F.lit(1)).alias("n_events"),
    ).drop("sid")

    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0
