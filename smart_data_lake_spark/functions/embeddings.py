"""Embedding-column analytics: quantization and per-label centroid audits.

Training-data pipelines carry an `array<float>` embedding column at corpus
scale; two operators they need beyond similarity search
(`functions/similarity.py`) and near-dup detection (`functions/dedup.py`):

  * `quantize_embedding_stats` — per-vector int8 (0..255) min/max affine
    quantization with reconstruction error. The whole computation is
    JVM-side array expressions (`array_min/array_max/transform/aggregate`)
    — a stateless per-row projection that composes with the scan: zero
    shuffles at any scale. Numeric discipline for oracle parity: the
    rounding is floor(x + 0.5) (engine-independent, no banker's rounding)
    and the per-vector error sum folds left-to-right in float64 exactly
    like the oracle's list_sum.
  * `label_centroids` / `centroid_distances` — per-label mean vector and
    each vector's L2 distance to its label centroid (mislabel / outlier
    audit). The centroid sum uses posexplode + exact DECIMAL(30,12)
    accumulation per (label, dim) so the result is independent of row
    order and partitioning — float sums are not associative, and a 1000-
    executor cluster must not produce different centroids per run. The
    centroid table is tiny (labels × dims) and is broadcast back; the
    distance pass is then a per-row zip_with/aggregate projection.
    Shuffle count: one (the label,dim groupBy); the join back is
    broadcast, never a shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quantize_embedding_stats(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Append int8-quantization stats per vector: `q_scale` (float64 step),
    `mean_abs_err` (mean |x - dequant(quant(x))|). Constant vectors
    (max == min) quantize exactly: scale 0, error 0."""
    # Stage vmin/scale as real projected columns BEFORE the per-element
    # lambda. Referenced inline, array_min/array_max would be re-expanded
    # into every element of the transform (64 × O(64) evaluations per row
    # and a codegen tree past the JIT limit — measured 10× slower);
    # projected once per row they are attribute references inside the
    # lambda, and Catalyst's CollapseProject keeps non-cheap aliases
    # un-inlined.
    v = F.col(vec_col).cast("array<double>")
    staged = df.withColumn("_v", v).withColumn("_vmin", F.array_min("_v")).withColumn(
        "q_scale", (F.array_max("_v") - F.col("_vmin")) / F.lit(255.0)
    )
    vmin, scale = F.col("_vmin"), F.col("q_scale")
    # q = floor((x-min)/scale + 0.5)  (plain half-up — identical across engines)
    deq = F.transform(
        "_v",
        lambda x: F.when(
            scale > 0, vmin + F.floor((x - vmin) / scale + F.lit(0.5)) * scale
        ).otherwise(x),
    )
    abs_err = F.zip_with("_v", deq, lambda a, b: F.abs(a - b))
    total = F.aggregate(abs_err, F.lit(0.0), lambda acc, e: acc + e)
    return staged.withColumn("mean_abs_err", total / F.size("_v")).drop("_v", "_vmin")


def label_centroids(
    df: DataFrame, vec_col: str = "embedding", label_col: str = "label"
) -> DataFrame:
    """Per-label mean vector as (label, centroid array<double>). Exact
    decimal accumulation per dimension -> order/partitioning-independent."""
    exploded = df.select(
        F.col(label_col).alias("label"), F.posexplode(F.col(vec_col).cast("array<double>"))
    )
    per_dim = exploded.groupBy("label", "pos").agg(
        (
            F.sum(F.col("col").cast("decimal(30,12)")).cast("double")
            / F.count(F.lit(1))
        ).alias("c")
    )
    return per_dim.groupBy("label").agg(
        F.array_sort(
            F.collect_list(F.struct("pos", "c"))
        ).alias("pairs")
    ).select(
        "label", F.transform("pairs", lambda p: p["c"]).alias("centroid")
    )


def centroid_distances(
    df: DataFrame, vec_col: str = "embedding", label_col: str = "label"
) -> DataFrame:
    """Append `centroid_dist`: L2 distance of each vector to its label's
    centroid. The within-vector squared-diff sum is a left-to-right float64
    fold over the array — the array order is fixed, so the result is
    deterministic and engine-portable."""
    cents = label_centroids(df, vec_col, label_col)
    joined = df.join(F.broadcast(cents), on=label_col)
    sq = F.zip_with(
        F.col(vec_col).cast("array<double>"),
        F.col("centroid"),
        lambda a, b: (a - b) * (a - b),
    )
    # left-to-right float64 fold over the (fixed) array order — deterministic
    # and bit-identical to the oracle's sequential list_sum
    dist2 = F.aggregate(sq, F.lit(0.0), lambda acc, e: acc + e)
    return joined.withColumn("centroid_dist", F.sqrt(dist2)).drop("centroid")
