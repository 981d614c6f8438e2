"""Corpus-hygiene operators: benchmark decontamination + duplicated spans.

Two checks every LLM training-data pipeline runs before training (public
methods: GPT-3 appendix C n-gram overlap, Dodge et al. 2021 C4 benchmark
audit, RefinedWeb/C4 exact-substring dedup):

* ``benchmark_contamination`` — flag training documents that share word
  n-gram shingles with an evaluation/benchmark corpus, reporting the per-doc
  overlap fraction and a threshold verdict. Documents above the threshold
  are dropped (or quarantined) so eval scores stay honest.
* ``duplicated_span_stats`` — per-document fraction of n-gram spans that
  also occur in at least one OTHER document: the span-granular signal behind
  exact-substring deduplication. High-fraction documents are boilerplate or
  templated near-copies even when no full-document fingerprint matches.

Scale design (100 TB posture):
  * Shingling is a narrow per-row projection (split + slice + explode) —
    fully parallel at the scan, no Python.
  * ``benchmark_contamination`` joins corpus shingles against the benchmark
    shingle *set*. Benchmark suites are tiny relative to a training corpus
    (MBs vs TBs), so the set is broadcast by default — the contamination
    pass then costs ONE scan of the corpus with a map-side hash probe and
    one groupBy(doc) shuffle. Set ``broadcast_benchmark=False`` for the
    rare giant-benchmark case to fall back to a shuffle hash join.
  * ``duplicated_span_stats`` needs global span frequencies: one shuffle on
    the shingle to count, one identical-key shuffle to join back (Catalyst
    reuses the exchange), one groupBy(doc). No all-pairs step anywhere —
    cost is linear in corpus size.

Reference scope note: the reference framework (smart-data-lake) has no
corpus-hygiene operators; this module is part of the rebuild's
training-data-pipeline extension surface (SURVEY.md §8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from smart_data_lake_spark.functions.numeric import grid_round
from smart_data_lake_spark.functions.dedup import shingles


def benchmark_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    threshold: float = 0.05,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Per-document n-gram overlap against a benchmark corpus.

    Returns (id, n_grams, n_matched, contamination, contaminated) where
    ``contamination = n_matched / n_grams`` over the document's DISTINCT
    n-gram shingles and ``contaminated = contamination >= threshold``.
    Documents with fewer than ``n`` tokens produce no shingles and are
    absent from the output (nothing to match on).

    Real pipelines use n of 8-13; the default 5 suits short test docs — the
    plan shape is identical at any n.
    """
    corpus_grams = shingles(docs, id_col=id_col, text_col=text_col, n=n)
    bench_grams = (
        shingles(benchmark, id_col=id_col, text_col=text_col, n=n)
        .select("shingle")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    if broadcast_benchmark:
        bench_grams = F.broadcast(bench_grams)
    matched = corpus_grams.join(bench_grams, "shingle", "left")
    frac = F.col("n_matched") / F.col("n_grams")
    return (
        matched.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_matched"),
        )
        .select(
            F.col(id_col),
            "n_grams",
            "n_matched",
            # int/int RATIONAL — the half-grid cross-engine divergence
            # class (r10 sweep): grid_round, not engine round()
            grid_round(frac, 6).alias("contamination"),
            (frac >= F.lit(threshold)).alias("contaminated"),
        )
    )


def duplicated_span_stats(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """Per-document duplicated-span fraction across the whole corpus.

    A span (distinct word n-gram within the document) counts as duplicated
    when at least one OTHER document also contains it. Returns
    (id, n_spans, n_dup_spans, dup_fraction). Because shingles are distinct
    per document, the global per-shingle count equals the number of
    documents carrying the shingle — so ``count > 1`` is exactly the
    "appears elsewhere" predicate.
    """
    grams = shingles(docs, id_col=id_col, text_col=text_col, n=n)
    freq = grams.groupBy("shingle").agg(F.count(F.lit(1)).alias("_docs_with"))
    return (
        grams.join(freq, "shingle")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(F.when(F.col("_docs_with") > 1, 1).otherwise(0)).alias("n_dup_spans"),
        )
        .select(
            F.col(id_col),
            "n_spans",
            "n_dup_spans",
            grid_round(F.col("n_dup_spans") / F.col("n_spans"), 6).alias("dup_fraction"),
        )
    )
