"""Operator scaling spot-check: 1x (sf0.1) vs 10x synthesized data.

    python tools/scaling_check.py [--factor 10]

Takes the sf0.1 documents/events tables, synthesizes a `factor`-times larger
copy (union of id-shifted replicas with mutated text so dedup/fingerprint
work does not collapse onto identical rows), writes it to /tmp parquet once,
and times representative operators on both sizes (warm, best of 2). The
interesting number is the RATIO: a linear operator on 32 local cores should
scale close to the data factor (or better while cores are underutilized at
1x); anything super-linear flags a shape problem (all-pairs, global sort,
driver collect) that 100 TB would amplify.

Writes a markdown table to stdout; mirrored into README when re-run.
"""

from __future__ import annotations

import argparse
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")


def synthesize(
    spark,
    sf_dir: str,
    out_dir: str,
    factor: int,
    tables: list[str] | None = None,
    exact_copies: bool = False,
) -> None:
    """Write factor-scaled copies of the base tables; `tables` limits the
    set (e.g. a 100x run over events/documents need not write a 60M-row
    lineitem it never reads). `exact_copies` skips the per-copy text/vector
    perturbation — the boilerplate-duplication regime (byte-identical crawl
    copies) where signature/fingerprint collapses are SUPPOSED to win;
    the default perturbed regime is their worst case (every copy distinct)."""
    import os

    from pyspark.sql import functions as F

    def want(name: str) -> bool:
        return tables is None or name in tables

    if want("documents"):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        n_docs = docs.count()
        copies = []
        for i in range(factor):
            c = docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * n_docs))
            if i and not exact_copies:
                # perturb each copy so near-dup structure stays realistic instead
                # of factor-times exact duplicates: prepend a copy marker token
                c = c.withColumn("text", F.concat(F.lit(f"copy{i} "), F.col("text")))
            copies.append(c)
        big_docs = copies[0]
        for c in copies[1:]:
            big_docs = big_docs.unionByName(c)
        big_docs.write.mode("overwrite").parquet(os.path.join(out_dir, "documents.parquet"))

    if want("events"):
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        n_ev = ev.count()
        n_users = ev.agg(F.max("user_id")).collect()[0][0] + 1
        copies = []
        for i in range(factor):
            c = (
                ev.withColumn("event_id", F.col("event_id") + F.lit(i * n_ev))
                .withColumn("user_id", F.col("user_id") + F.lit(i * n_users))
            )
            copies.append(c)
        big_ev = copies[0]
        for c in copies[1:]:
            big_ev = big_ev.unionByName(c)
        big_ev.write.mode("overwrite").parquet(os.path.join(out_dir, "events.parquet"))

    if want("embeddings"):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        n_emb = emb.count()
        copies = []
        for i in range(factor):
            c = emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * n_emb))
            if i:
                # deterministic per-copy perturbation keeps neighbor structure
                # realistic instead of factor-times exact duplicates
                c = c.withColumn(
                    "embedding",
                    F.transform(F.col("embedding"), lambda x: (x + F.lit(i * 1e-4)).cast("float")),
                )
            copies.append(c)
        big_emb = copies[0]
        for c in copies[1:]:
            big_emb = big_emb.unionByName(c)
        big_emb.write.mode("overwrite").parquet(os.path.join(out_dir, "embeddings.parquet"))

    if want("orders") or want("lineitem"):
        # orders + lineitem: shift o_orderkey/l_orderkey CONSISTENTLY so the
        # join/semi-join semantics (and selectivities) survive the scale-up
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        n_ord = orders.agg(F.max("o_orderkey")).collect()[0][0] + 1
        big_o = orders
        big_l = li
        for i in range(1, factor):
            big_o = big_o.unionByName(orders.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(i * n_ord)))
            big_l = big_l.unionByName(li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * n_ord)))
        if want("orders"):
            big_o.write.mode("overwrite").parquet(os.path.join(out_dir, "orders.parquet"))
        if want("lineitem"):
            big_l.write.mode("overwrite").parquet(os.path.join(out_dir, "lineitem.parquet"))

    # supplier + customer: id-shifted copies with names REGENERATED from the
    # shifted key (keeps the name-dictionary edit-distance structure real
    # instead of factor-times exact duplicates); nation is a dimension, as-is
    for tbl, key, namecol, prefix in (
        ("supplier", "s_suppkey", "s_name", "Supplier"),
        ("customer", "c_custkey", "c_name", "Customer"),
    ):
        if not want(tbl):
            continue
        t = spark.read.parquet(f"{sf_dir}/{tbl}.parquet")
        n_rows = t.agg(F.max(key)).collect()[0][0] + 1
        big = t
        for i in range(1, factor):
            c = t.withColumn(key, F.col(key) + F.lit(i * n_rows)).withColumn(
                namecol,
                F.concat(F.lit(prefix + "#"), F.lpad(F.col(key).cast("string"), 9, "0")),
            )
            big = big.unionByName(c)
        big.write.mode("overwrite").parquet(os.path.join(out_dir, f"{tbl}.parquet"))
    if want("nation"):
        spark.read.parquet(f"{sf_dir}/nation.parquet").write.mode("overwrite").parquet(
            os.path.join(out_dir, "nation.parquet")
        )


def main(
    factor: int,
    only: list[str] | None = None,
    tables: list[str] | None = None,
    exact_copies: bool = False,
) -> str:
    import __spark_entry__ as e
    from smart_data_lake_spark.session import build_session

    spark = build_session(app_name="scaling_check")
    sf1 = "/root/testdata/sf0.1"
    big = tempfile.mkdtemp(prefix="sdl_scale_")
    synthesize(spark, sf1, big, factor, tables=tables, exact_copies=exact_copies)

    ops = [
        "dedup_minhash",
        "winnow_fingerprints_docs",
        "token_budget_sample_docs",
        "segment_dedup_docs",
        "user_event_paths",
        "sessionize_events",
        "range_frame_trailing_value",
        "user_top_event",
        # r6 additions
        "ewma_value_by_type",
        "interarrival_stats_by_type",
        "tfidf_top_terms_per_source",
        "token_entropy_docs",
        "containment_pairs_docs",
        "cross_source_dup_audit",
        # late-r6 additions
        "autocorr_lag1_value_by_type",
        "rolling_z_anomalies_events",
        "zipf_slope_by_source",
        "doc_length_band_by_source",
        "fixed_k_sample_per_source",
        "normalized_dedup_docs",
        "simhash_near_pairs",
        # r7: the cluster-shaped output (pairs are quadratic in near-dup
        # cluster size; clusters are linear — the 100 TB emit shape)
        "simhash_neardup_clusters",
        "cusum_changepoint_by_type",
        "global_docs_sample",
        "length_drift_ks",
        "bigram_lm_docs",
        "source_vocab_jaccard",
        "decayed_popularity_by_type",
        "lang_source_chisq",
        # late-r7 additions (registered for the r8 window)
        "cms_heavy_hitter_terms",
        "pq_encode_embeddings",
        "pq_adc_topk_embeddings",
        "bpe_merge_candidates_corpus",
        "pagerank_terms_corpus",
        "bloom_semi_revenue",
        "weighted_sample_docs",
        "benford_order_totals",
        "ivfpq_topk_embeddings",
        "holt_forecast_by_type",
        "streaming_sliding_counts",
        "hard_negatives_embeddings",
        # r7 continuation (r8 rotation candidates)
        "basket_lift_parts",
        "rfm_segments_customers",
        "trimmed_mean_value_by_type",
        "mann_kendall_trend_by_type",
        "c4_quality_filter_docs",
        "readability_docs",
        "luhn_check_orders",
        "seasonal_strength_value_by_type",
        # r8 additions (r9 rotation queue)
        "jaccard_prefix_pairs_docs",
        "qgram_editdist_suppliers",
        "gini_customer_spend_by_nation",
        "tfidf_cosine_pairs_docs",
        "theil_sen_trend_by_type",
        "xcorr_view_click_lags",
        "survival_conversion_curve",
        "ab_test_purchase_conversion",
        "user_behavior_entropy_events",
        "seq_pattern_support_events",
        "fd_histogram_value_events",
        "scd2_snapshot_asof",
        "hits_terms_corpus",
        "vocab_coverage_by_source",
        # r9: cluster-shaped emit for the exact set-similarity join — the
        # linear-output fix for jaccard_prefix_pairs' quadratic pair list
        "exact_neardup_clusters_docs",
        # r9 additions (r10 rotation queue)
        "spearman_value_hour_by_type",
        "winsorized_mean_value_by_type",
        "burstiness_daily_by_type",
        "next_event_entropy_by_type",
        "twap_value_by_type",
        "llr_collocations_corpus",
        "distinct_ngram_ratio_by_source",
        "entity_clusters_suppliers",
        "tfidf_topk_neighbors_docs",
        "kendall_tau_level_volume_by_type",
        "markov_stationary_event_types",
        # r10 additions (r11 window): the graph/audit family whose scale
        # claims the 100x rows prove (degree-ordered triangles, shrinking
        # k-core edge list, bounded-bin PSI)
        "mann_whitney_value_variants",
        "welch_t_value_variants",
        "hour_profile_hhi_by_type",
        "attribution_last_touch_events",
        "psi_value_drift_by_type",
        "triangle_count_terms",
        "source_divergence_docs",
        "cramers_v_lang_source",
        "k_anonymity_orders",
        "chao1_vocab_by_source",
        "kcore_terms_corpus",
        "heaps_law_fit_corpus",
        # r11 additions (r11 window, added pre-freeze)
        "kruskal_wallis_value_by_type",
        "cmh_conversion_by_priority",
        "page_hinkley_value_by_type",
        "gumbel_return_level_by_type",
        "theil_index_spend_by_nation",
        "longest_streak_by_user_events",
        "simpson_diversity_by_source",
        "yules_k_by_source",
        "vocab_churn_by_source",
        "cohens_kappa_lang_id",
        # post-freeze r11 additions (r12 rotation queue)
        "wilcoxon_signed_rank_user_halves",
        "friedman_value_by_type_blocks",
        "cuped_adjusted_value_ab",
        "lorenz_curve_spend_by_nation",
        "bowley_moors_value_by_type",
        "theil_decomposition_spend",
        "wasserstein_value_drift_by_type",
        "brown_forsythe_value_by_type",
        "log_rank_conversion_by_variant",
        "mcnemar_paired_conversion",
        "jonckheere_price_by_priority",
        "good_turing_missing_mass_by_source",
    ]

    from smart_data_lake_spark.session import release_persistent_rdds

    def _release_persistent_rdds() -> None:
        release_persistent_rdds(spark)

    def timed(name: str, sf_dir: str) -> float:
        fn = e.queries()[name]
        fn(spark, sf_dir).count()  # warm
        best = float("inf")
        for _ in range(2):
            _release_persistent_rdds()
            t0 = time.time()
            fn(spark, sf_dir).count()
            best = min(best, time.time() - t0)
        _release_persistent_rdds()
        return best

    lines = [
        f"scaling spot-check: sf0.1 vs {factor}x synthesized "
        "(id-shifted, text-perturbed), local[32], warm best-of-2",
        "",
        f"| operator | 1x sec | {factor}x sec | ratio (linear ≈ ≤{factor}) |",
        "|---|---|---|---|",
    ]
    for name in ops:
        if only and name not in only:
            continue
        t1 = timed(name, sf1)
        t10 = timed(name, big)
        lines.append(f"| {name} | {t1:.2f} | {t10:.2f} | {t10 / t1:.1f} |")
    return "\n".join(lines)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--only", nargs="*", default=None)
    ap.add_argument(
        "--tables", nargs="*", default=None,
        help="limit table synthesis (default: all base tables)",
    )
    ap.add_argument(
        "--exact-copies", action="store_true",
        help="skip per-copy perturbation (exact-duplication regime)",
    )
    args = ap.parse_args()
    print(main(args.factor, args.only, args.tables, args.exact_copies))
