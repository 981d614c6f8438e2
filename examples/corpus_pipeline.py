"""Runnable end-to-end example: an LLM training-corpus construction
pipeline — the data-engineering workflow this engine adds beyond the
reference's surface — declared as the same config-driven DAG a Smart Data
Lake Builder user writes.

    python examples/corpus_pipeline.py [workdir]

Stages (each a framework Action over the documents table):
  raw documents
    → quality gate   (Gopher repetition filters + text stats; keep-only)
    → exact dedup    (md5 fingerprint, first-occurrence wins)
    → assignment     (contamination-safe train/val/test hash split)
    → packing        (token-budget sequence packing per split)
with per-stage row-count expectations enforced on the write path, and a
Lab-facade summary at the end.

Every transformation is a library operator (`functions/quality.py`,
`functions/text.py`, `functions/dedup.py`, `functions/sampling.py`) wired
through PythonCodeDfsTransformer — the pipeline itself stays declarative
config, exactly like the reference's HOCON.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from smart_data_lake_spark.lab import SmartDataLakeLab
from smart_data_lake_spark.plans import SmartDataLakeBuilder
from smart_data_lake_spark.session import build_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

_QUALITY_CODE = """
from smart_data_lake_spark.functions.quality import with_repetition_stats
from smart_data_lake_spark.functions.text import quality_score, token_count
from pyspark.sql import functions as F
stats = with_repetition_stats(inDfs["raw_docs"])
outDfs = {"clean_docs": (
    stats.where(F.col("quality_keep"))
    .withColumn("q_score", quality_score(F.col("text")))
    .withColumn("n_tokens", token_count(F.col("text")))
    .select("doc_id", "source", "text", "n_tokens", "q_score")
)}
"""

_DEDUP_CODE = """
from pyspark.sql import Window
from pyspark.sql import functions as F
fp = F.md5(F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\\s+", " "))
w = Window.partitionBy("fingerprint").orderBy("doc_id")
outDfs = {"unique_docs": (
    inDfs["clean_docs"].withColumn("fingerprint", fp)
    .withColumn("_rk", F.row_number().over(w))
    .where(F.col("_rk") == 1)
    .drop("_rk")
)}
"""

_SPLIT_CODE = """
from smart_data_lake_spark.functions.sampling import hash_split
outDfs = {"split_docs": hash_split(inDfs["unique_docs"], "doc_id",
                                   {"train": 0.9, "val": 0.05, "test": 0.05})}
"""

_PACK_CODE = """
from smart_data_lake_spark.functions.sampling import pack_sequences
outDfs = {"packed_docs": pack_sequences(inDfs["split_docs"], key_col="doc_id",
                                        size_col="n_tokens", budget=4096,
                                        strata_col="split")}
"""


def build_config(workdir: str) -> dict:
    def parquet(name: str) -> dict:
        return {"type": "ParquetFileDataObject", "path": f"{workdir}/{name}"}

    def stage(name: str, in_id: str, out_id: str, code: str, expectations=None) -> dict:
        action = {
            "type": "CustomDataFrameAction",
            "inputIds": [in_id],
            "outputIds": [out_id],
            "transformers": [{"type": "PythonCodeDfsTransformer", "fn": code}],
            "metadata": {"feed": "corpus"},
        }
        if expectations:
            action["expectations"] = expectations
        return action

    return {
        "dataObjects": {
            "raw_docs": {
                "type": "ParquetFileDataObject",
                "path": f"{SF_DIR}/documents.parquet",
            },
            "clean_docs": parquet("clean_docs"),
            "unique_docs": parquet("unique_docs"),
            "split_docs": parquet("split_docs"),
            "packed_docs": parquet("packed_docs"),
        },
        "actions": {
            "quality_gate": stage(
                "quality_gate", "raw_docs", "clean_docs", _QUALITY_CODE,
                expectations=[{"type": "CountExpectation", "expectation": "> 0"}],
            ),
            "exact_dedup": stage("exact_dedup", "clean_docs", "unique_docs", _DEDUP_CODE),
            "assign_split": stage("assign_split", "unique_docs", "split_docs", _SPLIT_CODE),
            "pack_shards": stage("pack_shards", "split_docs", "packed_docs", _PACK_CODE),
        },
    }


def main(workdir: str | None = None) -> dict:
    workdir = workdir or tempfile.mkdtemp(prefix="sdl_corpus_")
    spark = build_session(app_name="corpus_example", shuffle_partitions=8)
    config = build_config(workdir)
    state = SmartDataLakeBuilder(config=config).run(
        spark=spark, state_path=f"{workdir}/state", parallelism=2
    )
    print("run:", state.action_states)

    lab = SmartDataLakeLab(config=config, spark=spark)
    raw = lab.data_objects["raw_docs"].df().count()
    clean = lab.data_objects["clean_docs"].df().count()
    unique = lab.data_objects["unique_docs"].df().count()
    packed = lab.data_objects["packed_docs"].df()
    n_shards = packed.select("split", "shard_id").distinct().count()
    splits = {
        r.split: r.n
        for r in packed.groupBy("split").count().withColumnRenamed("count", "n").collect()
    }
    summary = {
        "raw_docs": raw,
        "clean_docs": clean,
        "unique_docs": unique,
        "splits": splits,
        "n_shards": n_shards,
        "all_succeeded": all(s == "SUCCEEDED" for s in state.action_states.values()),
    }
    print(summary)
    return summary


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
