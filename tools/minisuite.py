"""Mini-suite A/B runner for session-config experiments (guide §1).

Runs a FIXED subset of declared queries in ONE session with the exact bench
methodology (same warmups, noop sink, median-of-3, release_persistent_rdds
between runs) so in-suite pathologies — storage-block buildup, GC shape,
cross-query interference — reproduce, at ~1/8 the cost of the full bench.
The subset mixes the 32-core-inversion victims (PERF_r11 scaling ratio <
0.5 at >= 1s) with healthy controls so a config change that fixes the
victims but taxes the controls is visible immediately.

    SPARK_GRAFT_CPUS=32 MINISUITE_CONF="k=v;k=v" python tools/minisuite.py [tag]

Prints one JSON line {"tag": ..., "total": s, "queries": {...}} and appends
it to plans/r12/minisuite_runs.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pandas as pd  # noqa: F401  (pandas_udf type-hint resolution)

import __spark_entry__ as entry
from smart_data_lake_spark.session import build_session, release_persistent_rdds

# Victims: multi-second queries with PERF_r11 scaling ratio sec@8/sec@32 well
# below 1 (slower WITH more cores). Controls: healthy neighbours of similar
# plan families, plus the cheap-tier window/TPC-H queries the r10 comparison
# flagged.
QUERIES = [
    # inversion victims (r11 driver: @32 sec / @8 sec)
    "embedding_neardup_exact",   # 11.2 / 1.5
    "cms_heavy_hitter_terms",    # 10.1 / 2.2
    "hard_negatives_embeddings", # 4.4 / 0.9
    "length_drift_ks",           # 4.4 / 1.2
    "partition_diff",            # 3.4 / 0.8
    "orders_running_total",      # 1.2 / 0.3
    "bigram_lm_docs",            # 6.6 / 3.0
    "unigram_quality_docs",      # 2.0 / 0.7
    "top_docs_per_source",       # 0.8 / 0.25
    "user_event_paths",          # 1.3 / 0.5
    # standing expensive non-victims
    "entity_clusters_suppliers", # 9.9 / 4.4
    "simhash_neardup_clusters",  # 7.1 / 4.4
    "minhash_calibration_audit", # 5.8 / 2.9
    "tfidf_topk_neighbors_docs", # 6.7 / 4.6
    "cohens_kappa_lang_id",      # 4.7 / 2.9
    # healthy controls (ratio ~1 or >1): a config that taxes these is a loss
    "q1_pricing_summary",
    "q7_nation_volume",
    "jaccard_prefix_pairs_docs",
    "dedup_minhash",
    "mann_whitney_value_variants",
    "streaming_windowed_counts",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "run"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    extra = {
        "spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024),
        "spark.sql.files.openCostInBytes": str(512 * 1024),
    }
    for kv in os.environ.get("MINISUITE_CONF", "").split(";"):
        if "=" in kv:
            k, v = kv.split("=", 1)
            extra[k] = v
    spark = build_session(app_name=f"minisuite_{tag}", extra_conf=extra)

    from pyspark.sql import functions as F

    spark.range(1000).groupBy(F.col("id") % 7).count().write.mode("overwrite").format(
        "noop"
    ).save()

    @F.pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        import numpy as _np
        return s + int(_np.zeros(1)[0])

    spark.range(100000).repartition(64).select(_warm("id")).write.mode(
        "overwrite"
    ).format("noop").save()
    warm_li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(20000)
    warm_li.groupBy("l_returnflag").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")), F.avg("l_quantity")
    ).write.mode("overwrite").format("noop").save()
    spark.range(2).select(
        F.lower(F.concat(F.lit("Äx"), F.col("id").cast("string"))),
        F.upper(F.lit("ßy")),
        F.initcap(F.lit("éz")),
    ).write.mode("overwrite").format("noop").save()
    import tempfile

    with tempfile.TemporaryDirectory() as _wtmp:
        spark.range(2).select(
            F.col("id"), F.current_timestamp().alias("ts")
        ).write.mode("overwrite").parquet(f"{_wtmp}/t")
        _wq = (
            spark.readStream.schema("id long, ts timestamp")
            .parquet(f"{_wtmp}/t")
            .withWatermark("ts", "1 hour")
            .groupBy("id")
            .count()
            .writeStream.format("memory")
            .queryName("_minisuite_stream_warm")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        _wq.awaitTermination()
    spark.catalog.dropTempView("_minisuite_stream_warm")

    qs = entry.queries()
    timings: dict[str, float] = {}
    for name in QUERIES:
        fn = qs[name]
        runs: list[float] = []
        spark.sparkContext.setJobDescription(name)
        for _ in range(3):
            t0 = time.time()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            runs.append(time.time() - t0)
            release_persistent_rdds(spark)
        timings[name] = round(sorted(runs)[1], 3)
    out = {
        "tag": tag,
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", ""),
        "conf": os.environ.get("MINISUITE_CONF", ""),
        "total": round(sum(timings.values()), 3),
        "queries": timings,
    }
    print(json.dumps(out))
    os.makedirs(os.path.join(REPO, "plans", "r12"), exist_ok=True)
    with open(os.path.join(REPO, "plans", "r12", "minisuite_runs.jsonl"), "a") as fh:
        fh.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
