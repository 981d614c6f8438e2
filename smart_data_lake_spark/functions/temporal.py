"""Temporal join operators: as-of join and bucketed range join.

Spark has no native as-of/range join; the naive formulations degenerate into
BroadcastNestedLoopJoin (all-pairs) or a skew-prone theta join. These are the
scale-safe formulations:

  * `as_of_join` — union-and-window: one shuffle on (keys, ts), no pair
    explosion. For every left row, the latest right row with
    right_ts < left_ts (strict, default) or <= (non-strict) per key group.
    The same plan shape Flink's temporal join and kdb's aj compile to.
  * `range_join` — time-bucket equi-join: right rows are exploded into the
    fixed-width buckets their window overlaps, the join is a plain equi-join
    on (keys, bucket) that Catalyst executes as a shuffled hash join, and the
    exact range predicate filters within candidate buckets. Candidate count
    per left row is bounded by bucket occupancy, never O(|right|).

Both come with DuckDB-oracle-parity queries in __spark_entry__.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    right_order_col: str | None = None,
    strict: bool = True,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the most recent right row per `on` group.

    Implementation: tag both sides, union by (keys, ts), window-partition by
    keys ordered by (ts, side, order-col) and carry the last non-null right
    payload strictly before the current row. Exactly one shuffle (the window
    partition), linear in |left|+|right| — never a nested-loop or range join.

    Ties: with strict=True a right row at the same timestamp as a left row
    does NOT match (left sorts before right at equal ts); multiple right rows
    at one timestamp resolve to the greatest `right_order_col` (default: the
    right timestamp — pass an id column for total determinism).
    """
    right_cols = right_cols or [c for c in right.columns if c not in on and c != right_ts]
    right_order_col = right_order_col or right_ts

    l_tagged = left.select(
        *[F.col(c) for c in on],
        F.col(left_ts).alias("_ts"),
        F.lit(0 if strict else 1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        F.lit(None).cast("double").alias("_ord"),
    )
    r_payload = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("_ts"),
        F.lit(1 if strict else 0).alias("_side"),
        F.col(right_order_col).cast("double").alias("_ord"),
        F.struct(*[F.col(c) for c in [right_ts] + right_cols]).alias("_r"),
    )
    l_full = l_tagged.withColumn("_r", F.lit(None).cast(r_payload.schema["_r"].dataType))
    r_full = r_payload.withColumn("_l", F.lit(None).cast(l_tagged.schema["_l"].dataType))
    combined = l_full.select(*on, "_ts", "_side", "_ord", "_l", "_r").unionByName(
        r_full.select(*on, "_ts", "_side", "_ord", "_l", "_r")
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc(), F.col("_ord").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    matched = combined.withColumn("_match", F.last("_r", ignorenulls=True).over(w))
    out_cols = [F.col(f"_l.{c}").alias(c) for c in left.columns]
    out_cols += [F.col(f"_match.{right_ts}").alias(f"{right_ts}{suffix}")]
    out_cols += [F.col(f"_match.{c}").alias(f"{c}{suffix}") for c in right_cols]
    return matched.where(F.col("_l").isNotNull()).select(*out_cols)


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower_sec: float = 0.0,
    upper_sec: float = 3600.0,
    bucket_sec: float | None = None,
) -> DataFrame:
    """Pairs (left row, right row) with right_ts in
    [left_ts - upper_sec, left_ts - lower_sec) per key group.

    Implementation: fixed-width time buckets; each LEFT row is exploded into
    the buckets its window spans (ceil(range/bucket)+1 copies — bounded,
    metadata-free), the join is a plain equi-join on (keys, bucket) and the
    exact predicate filters inside candidate buckets. Catalyst runs it as a
    shuffled hash join; no BroadcastNestedLoopJoin at any size.

    Output: all left columns + right columns suffixed `_r` (join keys once).
    """
    bucket_sec = bucket_sec or (upper_sec - lower_sec)
    n_buckets = int((upper_sec - lower_sec) // bucket_sec) + 1
    l_sec = F.col(left_ts).cast("double")
    r_sec = F.col(right_ts).cast("double")

    lft = left.withColumn(
        "_bucket",
        F.explode(
            F.array(
                *[
                    F.floor((l_sec - F.lit(lower_sec)) / F.lit(bucket_sec)) - i
                    for i in range(n_buckets)
                ]
            )
        ),
    )
    rgt = right.select(
        *[F.col(c).alias(c) for c in on],
        F.floor(r_sec / F.lit(bucket_sec)).alias("_bucket"),
        *[
            F.col(c).alias(f"{c}_r")
            for c in right.columns
            if c not in on
        ],
    )
    r_sec_out = F.col(f"{right_ts}_r").cast("double")
    cond = (r_sec_out >= l_sec - F.lit(upper_sec)) & (r_sec_out < l_sec - F.lit(lower_sec))
    return lft.join(rgt, on + ["_bucket"]).where(cond).drop("_bucket")
