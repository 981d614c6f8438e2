"""Skew mitigation utilities for joins on hot keys.

AQE's skew-join handling (enabled in session.build_session) splits oversized
*shuffle partitions*, which covers sort-merge joins after the fact. These
helpers attack skew at the logical level, which AQE cannot:

* `salted_join` — classic salting: the big (probe) side gets a deterministic
  salt in [0, buckets); the smaller build side is replicated `buckets`×; the
  join key becomes (keys..., salt) so one hot key spreads over `buckets`
  shuffle partitions. Replication factor is bounded and explicit — use for
  build sides that are too big to broadcast but small enough to replicate.
* `split_skew_join` — differentiated join: heavy-hitter keys (found with a
  cheap count) are joined via broadcast, the long tail via ordinary shuffle
  join, results unioned. No replication of the whole build side; use when
  only a handful of keys are hot (the usual power-law case).

The salt is xxhash64 over the probe row's join columns PLUS a per-row
discriminator column (any unique-ish column works, e.g. the PK) so rows
sharing a hot key still spread; it is deterministic under task retries —
`F.rand()` is not, and non-deterministic salts can duplicate or drop rows
when a failed task re-executes.

Reference parity: the reference leaves physical join strategy to its
engines; these utilities are the Spark-idiomatic knobs a 100 TB deployment
actually needs (public technique, e.g. Spark AQE docs and the classic
"salted join" pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: list[str],
    how: str = "inner",
    buckets: int = 16,
    discriminator: str | None = None,
) -> DataFrame:
    """Equi-join `probe ⋈ build` on `on`, spreading each probe key over
    `buckets` salted sub-keys. `build` is replicated `buckets`× (explode of a
    literal salt array — map-side, no shuffle of its own). Supported `how`:
    inner / left (semantics preserved because every probe row carries exactly
    one salt and every build row exists under every salt)."""
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    disc_cols = [discriminator] if discriminator else probe.columns
    salted_probe = probe.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in disc_cols]), F.lit(buckets)).cast("int")
    )
    salted_build = build.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    out = salted_probe.join(salted_build, on=[*on, "_salt"], how=how)
    return out.drop("_salt")


def heavy_hitter_keys(df: DataFrame, on: list[str], min_count: int) -> DataFrame:
    """Keys whose row count exceeds `min_count` — one partial-aggregated
    count shuffle; the result is tiny by construction (heavy hitters only)."""
    return df.groupBy(*on).agg(F.count(F.lit(1)).alias("_cnt")).where(F.col("_cnt") > min_count).drop("_cnt")


def split_skew_join(
    probe: DataFrame,
    build: DataFrame,
    on: list[str],
    how: str = "inner",
    skew_threshold: int = 1_000_000,
) -> DataFrame:
    """Differentiated join: probe rows whose key is a heavy hitter join
    against the (broadcast) matching slice of `build`; the long tail joins
    normally. Output = union of the two, same schema/semantics as a plain
    join for inner/left."""
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"split_skew_join supports inner/left joins, got {how!r}")
    hot = heavy_hitter_keys(probe, on, skew_threshold)
    # left_semi/anti keep probe's schema; the hot-key set is tiny → broadcast
    probe_hot = probe.join(F.broadcast(hot), on=on, how="left_semi")
    probe_tail = probe.join(F.broadcast(hot), on=on, how="left_anti")
    build_hot = build.join(F.broadcast(hot), on=on, how="left_semi")
    joined_hot = probe_hot.join(F.broadcast(build_hot), on=on, how=how)
    joined_tail = probe_tail.join(build, on=on, how=how)
    return joined_hot.unionByName(joined_tail)
