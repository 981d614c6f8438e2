"""ANN operator tests: exactness of brute force vs numpy, recall monotonicity
of the multi-band LSH OR-construction and IVF multi-probe, and pair
uniqueness after candidate generation."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from smart_data_lake_spark.functions.similarity import (
    brute_force_topk,
    ivf_topk,
    kmeans_train,
    lsh_topk,
)

N, DIM, K, NQ = 400, 16, 5, 8


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.default_rng(3)
    centers = rng.normal(size=(8, DIM))
    vecs = centers[rng.integers(0, 8, size=N)] + 0.25 * rng.normal(size=(N, DIM))
    pdf = pd.DataFrame({"vec_id": np.arange(N, dtype=np.int64), "embedding": list(vecs.astype(float))})
    df = spark.createDataFrame(pdf).withColumn("embedding", F.col("embedding").cast("array<double>"))
    return df.cache(), vecs


def _queries(df):
    return df.where(F.col("vec_id") < NQ).select(F.col("vec_id").alias("query_id"), "embedding")


def _pairs(df):
    return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}


def test_brute_force_matches_numpy(corpus):
    df, vecs = corpus
    out = brute_force_topk(df, _queries(df), k=K, dim=DIM)
    got = _pairs(out)
    norms = np.linalg.norm(vecs, axis=1)
    sims = (vecs[:NQ] @ vecs.T) / (norms[:NQ, None] * norms[None, :])
    expected = set()
    for q in range(NQ):
        s = sims[q].copy()
        s[q] = -np.inf  # self excluded
        # round to 6 like the operator, tie-break by ascending id
        order = sorted(range(N), key=lambda i: (-round(float(s[i]), 6), i))[:K]
        expected |= {(q, i) for i in order}
    assert got == expected


def test_lsh_multiband_recall_improves(corpus):
    df, _ = corpus
    q = _queries(df)
    exact = _pairs(brute_force_topk(df, q, k=K, dim=DIM))
    single = _pairs(lsh_topk(df, q, k=K, n_planes=6, dim=DIM))
    multi = _pairs(lsh_topk(df, q, k=K, n_planes=6, bands=5, dim=DIM))
    r_single = len(single & exact) / len(exact)
    r_multi = len(multi & exact) / len(exact)
    assert r_multi >= r_single
    assert r_multi >= 0.8  # OR-construction must deliver usable recall


def test_lsh_multiband_pairs_unique(corpus):
    df, _ = corpus
    out = lsh_topk(df, _queries(df), k=K, n_planes=4, bands=4, dim=DIM)
    rows = out.select("query_id", "neighbor_id").collect()
    assert len(rows) == len({(r[0], r[1]) for r in rows})


def test_ivf_multiprobe_recall_improves(corpus):
    df, vecs = corpus
    q = _queries(df)
    exact = _pairs(brute_force_topk(df, q, k=K, dim=DIM))
    centroids = kmeans_train([list(v) for v in vecs[:64]], k=16, iters=4)
    p1 = _pairs(ivf_topk(df, q, centroids, k=K, dim=DIM, nprobe=1))
    p4 = _pairs(ivf_topk(df, q, centroids, k=K, dim=DIM, nprobe=4))
    r1 = len(p1 & exact) / len(exact)
    r4 = len(p4 & exact) / len(exact)
    assert r4 >= r1
    assert r4 >= 0.8
