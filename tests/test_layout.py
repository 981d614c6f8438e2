"""Z-order layout: Morton key correctness and multi-dimensional locality."""

import pytest
from pyspark.sql import functions as F

from smart_data_lake_spark.functions.layout import write_zordered, zorder_key


def _morton2(x: int, y: int, bits: int = 4) -> int:
    out = 0
    for j in range(bits):
        out |= ((x >> j) & 1) << (2 * j)
        out |= ((y >> j) & 1) << (2 * j + 1)
    return out


def test_zorder_key_matches_reference_morton(spark):
    rows = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(rows, "x int, y int")
    # ranges chosen so normalization is the identity on 0..15 at 4 bits
    out = df.withColumn(
        "k", zorder_key(["x", "y"], [(0, 16), (0, 16)], bits_per_col=4)
    ).collect()
    for r in out:
        assert r.k == _morton2(r.x, r.y), (r.x, r.y)


def test_zorder_key_monotone_per_dimension(spark):
    df = spark.createDataFrame([(0, 0), (1, 0), (0, 1)], "x int, y int")
    ks = {
        (r.x, r.y): r.k
        for r in df.withColumn(
            "k", zorder_key(["x", "y"], [(0, 2), (0, 2)], bits_per_col=1)
        ).collect()
    }
    assert ks[(0, 0)] < ks[(1, 0)] < ks[(0, 1)]  # x gets the low bit


def test_zorder_rejects_bad_arity():
    with pytest.raises(ValueError):
        zorder_key(["a"] * 5, [(0, 1)] * 5)
    with pytest.raises(ValueError):
        zorder_key(["a", "b"], [(0, 1), (0, 1)], bits_per_col=32)


def test_zorder_rejects_degenerate_range():
    # lo == hi or inverted would silently collapse every row onto one cell
    with pytest.raises(ValueError, match="hi > lo"):
        zorder_key(["a", "b"], [(0, 1), (5, 5)])
    with pytest.raises(ValueError, match="hi > lo"):
        zorder_key(["a"], [(3, 1)])


def test_write_zordered_bounds_both_dims(spark, tmp_path):
    """Every output file must cover a bounded range of BOTH columns — the
    property single-column sorting cannot give and the reason Z-order
    enables multi-dimensional file pruning."""
    n = 64
    rows = [(float(x), float(y)) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(rows, "x double, y double").repartition(16)
    path = str(tmp_path / "z")
    write_zordered(df, path, ["x", "y"], [(0, n), (0, n)], n_files=16, bits_per_col=6)

    per_file = (
        spark.read.parquet(path)
        .withColumn("f", F.input_file_name())
        .groupBy("f")
        .agg(
            (F.max("x") - F.min("x")).alias("wx"),
            (F.max("y") - F.min("y")).alias("wy"),
        )
        .collect()
    )
    assert len(per_file) >= 8
    # 16 files over a 64x64 grid: each curve segment spans at most half of
    # each axis; a single-column sort would leave the other axis full-width
    # (width 63) in every file
    assert max(r.wx for r in per_file) <= n / 2
    assert max(r.wy for r in per_file) <= n / 2
