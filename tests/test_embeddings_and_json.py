"""Embedding analytics (quantization, centroid audit), JSON schema-on-read,
and hash-based train/val/test splitting."""

import math

import pytest
from pyspark.sql import functions as F

from smart_data_lake_spark.functions.embeddings import (
    centroid_distances,
    label_centroids,
    quantize_embedding_stats,
)
from smart_data_lake_spark.functions.sampling import hash_split
from smart_data_lake_spark.functions.semistructured import (
    extract_json_fields,
    infer_json_column_schema,
    parse_json_column,
)


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, label int, embedding array<double>")


def test_quantize_constant_vector_is_exact(spark):
    df = _vecs(spark, [(1, 0, [2.5, 2.5, 2.5])])
    out = quantize_embedding_stats(df).first()
    assert out.q_scale == 0.0
    assert out.mean_abs_err == 0.0


def test_quantize_error_bounded_by_half_step(spark):
    # affine int8 quantization: |x - deq(x)| <= scale/2 for every coordinate
    df = _vecs(spark, [(1, 0, [0.0, 0.1, 0.77, 1.0]), (2, 1, [-3.0, 0.0, 5.0, 4.99])])
    rows = quantize_embedding_stats(df).collect()
    for r in rows:
        assert r.mean_abs_err <= r.q_scale / 2 + 1e-12
        assert r.q_scale > 0


def test_label_centroids_exact_mean(spark):
    df = _vecs(
        spark,
        [(1, 0, [1.0, 2.0]), (2, 0, [3.0, 6.0]), (3, 1, [10.0, 20.0])],
    )
    cents = {r.label: r.centroid for r in label_centroids(df).collect()}
    assert cents[0] == [2.0, 4.0]
    assert cents[1] == [10.0, 20.0]


def test_centroid_distances_l2(spark):
    df = _vecs(spark, [(1, 0, [0.0, 0.0]), (2, 0, [2.0, 0.0])])
    # centroid = (1, 0); both vectors at distance 1
    rows = centroid_distances(df).collect()
    for r in rows:
        assert math.isclose(r.centroid_dist, 1.0, rel_tol=1e-12)
    # the centroid column must not leak into the output
    assert "centroid" not in centroid_distances(df).columns


def test_extract_json_fields_typed_and_null_safe(spark):
    df = spark.createDataFrame(
        [(1, '{"k": 7, "tag": "x"}'), (2, '{"tag": "y"}'), (3, None)],
        "id long, props string",
    )
    out = extract_json_fields(
        df, "props", {"k": ("$.k", "long"), "tag": ("$.tag", "string")}
    )
    rows = {r.id: (r.k, r.tag) for r in out.collect()}
    assert rows[1] == (7, "x")
    assert rows[2] == (None, "y")  # missing path -> NULL, row preserved
    assert rows[3] == (None, None)
    assert dict(out.dtypes)["k"] == "bigint"


def test_parse_and_infer_json_schema(spark):
    df = spark.createDataFrame(
        [(1, '{"k": 7, "nested": {"a": 1}}'), (2, '{"k": 9, "nested": {"a": 2}}')],
        "id long, props string",
    )
    schema = infer_json_column_schema(spark, df, "props")
    names = [f.name for f in schema.fields]
    assert "k" in names and "nested" in names
    parsed = parse_json_column(df, "props", schema)
    assert parsed.select(F.col("props_parsed.nested.a")).rdd.map(lambda r: r[0]).collect() == [1, 2]


def test_hash_split_partition_of_rows(spark):
    df = spark.range(2000).withColumnRenamed("id", "doc_id")
    out = hash_split(df, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r.split: r.n for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}  # no NULL bucket
    assert sum(counts.values()) == 2000
    # hash split is approximate per-split but must be within a loose band
    assert 1400 <= counts["train"] <= 1900


def test_hash_split_deterministic_and_disjoint(spark):
    df = spark.range(500).withColumnRenamed("id", "doc_id")
    a = hash_split(df, "doc_id", {"train": 0.5, "val": 0.5}).collect()
    b = hash_split(df.repartition(7), "doc_id", {"train": 0.5, "val": 0.5}).collect()
    assert {(r.doc_id, r.split) for r in a} == {(r.doc_id, r.split) for r in b}


def test_hash_split_remainder_is_null(spark):
    df = spark.range(1000).withColumnRenamed("id", "doc_id")
    out = hash_split(df, "doc_id", {"train": 0.5})
    n_null = out.where(F.col("split").isNull()).count()
    assert 400 <= n_null <= 600
