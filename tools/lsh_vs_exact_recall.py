"""Banded-MinHash recall measured against TOTAL ground truth on the REAL
corpus — enabled by the r8 exact prefix-filtered join.

    python tools/lsh_vs_exact_recall.py [--sf-dir /root/testdata/sf0.01]

`tools/dedup_quality.py` scores the LSH pipeline against SYNTHETIC injected
pairs; this companion removes the synthesis: `jaccard_prefix_join` emits
the EXACT, complete set of pairs above each threshold (guaranteed total
recall — the prefix-filter lemma), so the banded candidates' recall can be
measured against the real corpus's true near-dup structure, per similarity
band. The theoretical banding S-curve P(candidate) = 1-(1-s^r)^b (r=3
rows/band, b=4 bands over 12 hashes) is printed alongside for comparison
(evaluated at each band's midpoint).

Deterministic end to end. Output: markdown table mirrored into README's
measurement section.
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, "/root/repo")


def main(sf_dir: str) -> None:
    from pyspark.sql import functions as F

    from smart_data_lake_spark.functions.dedup import (
        jaccard_prefix_join,
        lsh_candidate_pairs,
        minhash_signatures,
        shingles,
    )
    from smart_data_lake_spark.session import build_session

    spark = build_session(app_name="lsh_vs_exact_recall")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # exact ground truth at the loosest threshold, then band by true jaccard
    exact = (
        jaccard_prefix_join(docs, threshold_num=5, threshold_den=10)
        .select("doc_a", "doc_b", "jaccard")
        .cache()
    )
    sh = shingles(docs)
    sigs = minhash_signatures(sh, num_hashes=12)
    cands = lsh_candidate_pairs(sigs, num_hashes=12, bands=4).cache()

    joined = exact.join(cands.withColumn("_hit", F.lit(1)), ["doc_a", "doc_b"], "left")
    bands = [(0.5, 0.6), (0.6, 0.7), (0.7, 0.8), (0.8, 0.9), (0.9, 1.01)]
    rows = []
    for lo, hi in bands:
        agg = joined.where(
            (F.col("jaccard") >= lo) & (F.col("jaccard") < hi)
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("hit"),
        ).collect()[0]
        n, hit = agg["n"], agg["hit"] or 0
        mid = (lo + min(hi, 1.0)) / 2
        theory = 1 - (1 - mid**3) ** 4
        rows.append((lo, min(hi, 1.0), n, hit, (hit / n if n else None), theory))

    print(f"banded-MinHash (12 hashes, 4 bands) recall vs EXACT prefix-join ground truth, {sf_dir}")
    print()
    print("| true jaccard band | exact pairs | surfaced by LSH | recall | S-curve @mid |")
    print("|---|---|---|---|---|")
    for lo, hi, n, hit, rec, theory in rows:
        rec_s = f"{rec:.3f}" if rec is not None else "—"
        print(f"| [{lo:.1f}, {hi:.2f}) | {n} | {hit} | {rec_s} | {theory:.3f} |")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    args = ap.parse_args()
    main(args.sf_dir)
