"""Data-layout operators: Z-order (Morton) clustering for multi-dimensional
data skipping.

Parquet/Delta data skipping works off per-file min/max statistics; a file
sorted by one column has tight stats on that column only. Interleaving the
bits of several normalized columns (the public Morton/Z-order curve — what
Delta's OPTIMIZE ZORDER BY implements) gives every file a bounded range on
EVERY participating column, so selective filters on any of them prune files.

`zorder_key` is a pure JVM expression (shifts/ors inside codegen — no UDF),
`write_zordered` is the layout job: range-partition by the key, sort within
partitions, write. One shuffle, the standard table-maintenance cost.

Column ranges are explicit arguments: at 100 TB the min/max come from table
statistics (one metadata read), not a per-write scan, and pinning them keeps
the key stable across incremental layout jobs (a drifting normalization
would silently break file pruning for existing files).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _normalize(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Scale to an integer in [0, 2^bits): clamped, monotone."""
    span = hi - lo
    max_cell = (1 << bits) - 1
    scaled = F.floor(
        (col.cast("double") - F.lit(lo)) / F.lit(span) * F.lit(1 << bits)
    ).cast("long")
    return F.greatest(F.lit(0), F.least(F.lit(max_cell), scaled))


def zorder_key(
    cols: Sequence[Column | str],
    ranges: Sequence[tuple[float, float]],
    bits_per_col: int = 16,
) -> Column:
    """Morton interleave of up to 4 columns into one bigint sort key.

    Bit j of normalized column i lands at position j*n_cols + i, so a sort
    by the key alternates locality between all columns — the Z-curve. The
    expression tree is n_cols*bits_per_col shift/or terms, all JVM-side."""
    n = len(cols)
    if not 1 <= n <= 4:
        raise ValueError("zorder_key supports 1-4 columns")
    if n * bits_per_col > 62:
        raise ValueError("total bits must fit a signed 64-bit key")
    if len(ranges) != n:
        raise ValueError("one (lo, hi) range per column required")
    for i, (lo, hi) in enumerate(ranges):
        # a degenerate/inverted range would divide by <=0 → NULL under
        # greatest/least → every row silently collapses onto one curve cell
        if not hi > lo:
            raise ValueError(
                f"range {i} for z-order column must satisfy hi > lo, got ({lo}, {hi})"
            )
    normed = [
        _normalize(F.col(c) if isinstance(c, str) else c, lo, hi, bits_per_col)
        for c, (lo, hi) in zip(cols, ranges)
    ]
    key = F.lit(0).cast("long")
    for i, nc in enumerate(normed):
        for j in range(bits_per_col):
            # extract bit j of column i, place it at j*n + i
            bit = F.shiftrightunsigned(nc, j).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, j * n + i))
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    ranges: Sequence[tuple[float, float]],
    n_files: int = 200,
    bits_per_col: int = 16,
    format: str = "parquet",
) -> None:
    """The OPTIMIZE ZORDER BY equivalent for plain files: compute the Morton
    key, range-partition into `n_files` output files along the curve, sort
    within each, write. Each resulting file covers a compact curve segment →
    bounded min/max on every z-ordered column → multi-dimensional file
    pruning. One shuffle (the range partitioner samples the key)."""
    keyed = df.withColumn("_zkey", zorder_key(list(cols), ranges, bits_per_col))
    (
        keyed.repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.format(format)
        .mode("overwrite")
        .save(path)
    )
