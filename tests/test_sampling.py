"""Deterministic sampling + sequence packing tests."""

from pyspark.sql import Row

from smart_data_lake_spark.functions.sampling import (
    hash_fraction,
    pack_sequences,
    stratified_sample,
)

from pyspark.sql import functions as F


def test_sample_is_reproducible_and_partition_independent(spark):
    df = spark.range(2000).select(F.col("id").alias("k"), F.lit("a").alias("s"))
    r1 = {r.k for r in stratified_sample(df, "k", "s", {"a": 0.3}).collect()}
    r2 = {
        r.k
        for r in stratified_sample(df.repartition(17), "k", "s", {"a": 0.3}).collect()
    }
    assert r1 == r2, "hash-based sampling must not depend on partitioning"
    assert 0.2 < len(r1) / 2000 < 0.4  # rate roughly honored
    # monotone rates: a higher-rate sample is a superset
    r_half = {r.k for r in stratified_sample(df, "k", "s", {"a": 0.6}).collect()}
    assert r1 <= r_half


def test_sample_default_rate_and_rate_zero(spark):
    df = spark.createDataFrame(
        [Row(k=i, s="keep" if i % 2 else "drop") for i in range(100)]
    )
    out = stratified_sample(df, "k", "s", {"keep": 1.0, "drop": 0.0}).collect()
    assert all(r.s == "keep" for r in out)
    assert len(out) == 50
    # unknown stratum -> default_rate
    df2 = spark.createDataFrame([Row(k=1, s="mystery")])
    assert stratified_sample(df2, "k", "s", {}, default_rate=1.0).count() == 1
    assert stratified_sample(df2, "k", "s", {}, default_rate=0.0).count() == 0


def test_pack_sequences_shard_boundaries(spark):
    # sizes 6,6,6 with budget 10: preceding cumsums 0,6,12 -> shards 0,0,1
    df = spark.createDataFrame(
        [Row(k=1, sz=6), Row(k=2, sz=6), Row(k=3, sz=6)]
    )
    out = {r.k: r.shard_id for r in pack_sequences(df, "k", "sz", budget=10).collect()}
    assert out == {1: 0, 2: 0, 3: 1}


def test_pack_sequences_strata_independent(spark):
    df = spark.createDataFrame(
        [Row(k=i, sz=4, grp="a" if i < 5 else "b") for i in range(10)]
    )
    out = pack_sequences(df, "k", "sz", budget=8, strata_col="grp").collect()
    by_grp = {}
    for r in out:
        by_grp.setdefault(r.grp, {})[r.k] = r.shard_id
    # each stratum restarts at shard 0: cumsums 0,4,8,12,16 -> 0,0,1,1,2
    assert by_grp["a"] == {0: 0, 1: 0, 2: 1, 3: 1, 4: 2}
    assert by_grp["b"] == {5: 0, 6: 0, 7: 1, 8: 1, 9: 2}
