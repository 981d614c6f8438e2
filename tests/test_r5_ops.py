"""Round-5 operator tests: winnowing fingerprints, incremental corpus dedup,
MAD outliers — semantics + plan shape."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from smart_data_lake_spark.functions.dedup import dedup_against_corpus, winnow_fingerprints
from smart_data_lake_spark.functions.profiling import mad_outliers


def test_winnow_guarantee_shared_match(spark):
    """Winnowing guarantee: any shared token run of length ≥ k+w-1
    (= 4+5-1 = 8 here) produces at least one shared fingerprint."""
    shared_run = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=f"one unique prefix {shared_run} and a tail here"),
            Row(doc_id=2, text=f"{shared_run} completely different continuation text now"),
            Row(doc_id=3, text="totally unrelated words nothing matches at all anywhere"),
        ]
    )
    out = {r["doc_id"]: r.asDict() for r in winnow_fingerprints(docs).collect()}
    assert out[1]["n_shared"] >= 1 and out[2]["n_shared"] >= 1
    assert out[3]["n_shared"] == 0
    # density: far fewer fingerprints than grams (n_tokens - 3 grams per doc)
    assert 0 < out[1]["n_fingerprints"] < 12


def test_winnow_short_docs_excluded(spark):
    docs = spark.createDataFrame([Row(doc_id=1, text="just three words"), Row(doc_id=2, text="")])
    assert winnow_fingerprints(docs).count() == 0


def test_dedup_against_corpus_semantics(spark):
    corpus = spark.createDataFrame(
        [Row(doc_id=100, text="existing document one"), Row(doc_id=101, text="another old doc")]
    )
    batch = spark.createDataFrame(
        [
            Row(doc_id=1, text="  Existing DOCUMENT one "),  # dup of corpus after normalize
            Row(doc_id=2, text="genuinely new content"),
            Row(doc_id=3, text="genuinely new content"),  # in-batch dup: keep min id
            Row(doc_id=4, text="another fresh one"),
        ]
    )
    kept = sorted(r["doc_id"] for r in dedup_against_corpus(batch, corpus).collect())
    assert kept == [2, 4]


def test_dedup_against_corpus_prunes_corpus_columns(spark):
    """The corpus side of the anti-join must scan only the text column
    (projection pushdown) — at 100 TB reading the full corpus row is the
    difference between feasible and not."""
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        corpus_path = os.path.join(d, "corpus")
        spark.createDataFrame(
            [Row(doc_id=i, text=f"doc {i}", extra="x" * 10) for i in range(10)]
        ).write.parquet(corpus_path)
        corpus = spark.read.parquet(corpus_path)
        batch = spark.createDataFrame([Row(doc_id=1, text="new")])
        plan = dedup_against_corpus(batch, corpus)._jdf.queryExecution().executedPlan().toString()
        assert "doc_id" not in plan.split("ReadSchema")[-1] if "ReadSchema" in plan else True
        scan_lines = [ln for ln in plan.splitlines() if "parquet" in ln.lower() and "ReadSchema" in ln]
        for ln in scan_lines:
            assert "extra" not in ln, f"corpus scan reads pruned column: {ln}"


def test_mad_outliers_flags_and_degenerate(spark):
    rows = (
        [Row(g="a", v=float(x)) for x in [10, 11, 12, 13, 14, 1000]]  # 1000 is the outlier
        + [Row(g="b", v=5.0) for _ in range(6)]  # degenerate: MAD = 0
    )
    df = spark.createDataFrame(rows)
    out = {r["g"]: r.asDict() for r in mad_outliers(df, "g", "v").collect()}
    assert out["a"]["n_outliers"] == 1
    assert out["a"]["median_value"] == 12.5
    assert out["b"]["n_outliers"] == 0 and out["b"]["mad"] == 0.0


def test_user_top_event_two_shuffles_only(spark, sf_dir):
    """Grouped argmax stays a two-aggregate chain: exactly the two exchanges
    (by (user,event) then by user), no join, no window sort."""
    import __spark_entry__ as e

    plan = e.user_top_event(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    # AQE may wrap; count distinct Exchange mentions conservatively
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges <= 3, plan  # 2 aggs + final sort range partition
    assert "Window" not in plan and "Join" not in plan.replace("SortMergeJoin", "Join")


def test_rrf_fuse_math_and_depth(spark):
    r1 = spark.createDataFrame([(1, 1), (2, 2), (3, 60)], "doc_id long, rank int")
    r2 = spark.createDataFrame([(2, 1), (4, 2)], "doc_id long, rank int")
    out = {r["doc_id"]: r.asDict() for r in
           __import__("smart_data_lake_spark.functions.search", fromlist=["rrf_fuse"])
           .rrf_fuse([r1, r2], k=60, depth=50).collect()}
    # doc 2 appears in both rankings: 1/62 + 1/61
    assert abs(out[2]["rrf_score"] - (round(1 / 62, 9) + round(1 / 61, 9))) < 1e-9
    assert out[2]["n_rankings"] == 2
    assert out[1]["n_rankings"] == 1
    assert 3 not in out  # rank 60 > depth 50 truncated


def test_sample_to_token_budget_exact_boundary(spark):
    from pyspark.sql import Row

    from smart_data_lake_spark.functions.sampling import sample_to_token_budget

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=" ".join(["w"] * (10 + i % 7))) for i in range(200)]
    )
    budget = 500
    kept = sample_to_token_budget(docs, budget, n_buckets=8).orderBy("cum_tokens").collect()
    # every kept doc's preceding total is < budget; dropping the last one dips below
    assert all(r["cum_tokens"] - r["n_tokens"] < budget for r in kept)
    assert kept[-1]["cum_tokens"] >= budget  # the boundary doc overshoots
    assert kept[-2]["cum_tokens"] < budget
    # bucketed result == naive single-window result
    naive = sample_to_token_budget(docs, budget, n_buckets=1).orderBy("cum_tokens").collect()
    assert [r["doc_id"] for r in kept] == [r["doc_id"] for r in naive]
    # deterministic across recomputation and repartitioning
    again = sample_to_token_budget(docs.repartition(13), budget, n_buckets=8).orderBy("cum_tokens").collect()
    assert [tuple(r) for r in again] == [tuple(r) for r in kept]


def test_mix_sources_rates_and_shares(spark):
    from pyspark.sql import Row

    from smart_data_lake_spark.functions.sampling import mix_sources

    rows = []
    did = 0
    for src, n_docs, toks in [("a", 400, 10), ("b", 200, 10), ("c", 50, 10)]:
        for _ in range(n_docs):
            rows.append(Row(doc_id=did, source=src, text=" ".join(["w"] * toks)))
            did += 1
    docs = spark.createDataFrame(rows)
    # target equal thirds: 'c' (500 tokens) binds; a/b downsample toward 500
    out = {r["source"]: r.asDict() for r in
           mix_sources(docs, {"a": 1 / 3, "b": 1 / 3, "c": 1 / 3}).collect()}
    assert out["c"]["rate"] == 1.0 and out["c"]["n_kept"] == 50
    assert abs(out["a"]["rate"] - 0.125) < 1e-9   # 500/4000
    assert abs(out["b"]["rate"] - 0.25) < 1e-9    # 500/2000
    # hash acceptance approximates the rate (binomial, generous tolerance)
    assert 20 <= out["a"]["n_kept"] <= 85
    assert out["a"]["tokens_kept"] == out["a"]["n_kept"] * 10
