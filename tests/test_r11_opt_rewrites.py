"""Equivalence tests for the r11 optimization-round plan rewrites: the
in-row shingle distinct and the in-row set fingerprint must reproduce the
exact row sets / hashes of the explicit explode+distinct / collect_set
folds they replaced (the rewrites remove shuffles, never change values)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

DOCS = [
    # repeated shingles inside a doc (distinct must dedup within doc)
    (1, "a b c a b c a b c", 17),
    # identical token set as doc 3 under 3-gram shingling
    (2, "x y z w", 7),
    (3, "x y z w", 7),
    # too short for 3-grams — must be ABSENT from shingles and clusters
    (4, "p q", 3),
    # same tokens as docs 2/3 but different order → different 3-gram set
    (5, "w z y x", 7),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string, n_chars long")


def test_shingles_inrow_distinct_matches_explicit_distinct(spark):
    """explode(array_distinct(grams)) ≡ explode(grams).distinct() —
    (doc, shingle) distinctness is per-document distinctness."""
    from smart_data_lake_spark.functions.dedup import shingles
    from smart_data_lake_spark.functions.text import tokens

    got = sorted(map(tuple, shingles(_docs(spark)).collect()))
    # reference: the pre-rewrite explicit explode + frame-level distinct
    base = _docs(spark).select(
        F.col("doc_id"), tokens(F.col("text")).alias("_toks")
    ).where(F.size("_toks") >= 3)
    grams = F.transform(
        F.sequence(F.lit(0), F.size("_toks") - 3),
        lambda i: F.concat_ws(
            " ", *[F.element_at(F.col("_toks"), i + j + 1) for j in range(3)]
        ),
    )
    ref = sorted(
        map(
            tuple,
            base.select("doc_id", F.explode(grams).alias("shingle"))
            .distinct()
            .collect(),
        )
    )
    assert got == ref and len(got) > 0
    # within-doc dedup really happened (doc 1 repeats its grams)
    doc1 = [s for d, s in got if d == 1]
    assert len(doc1) == len(set(doc1))


def test_inrow_set_fingerprint_matches_collect_set_fold(spark):
    """sha2(concat_ws(array_sort(array_distinct(grams)))) computed in-row
    must equal the explicit explode → collect_set → sort_array fold the
    cluster operator used before the rewrite."""
    from smart_data_lake_spark.functions.dedup import shingles
    from smart_data_lake_spark.functions.text import tokens

    df = _docs(spark)
    # reference: old two-shuffle fold over the exploded distinct frame
    toks = shingles(df).select(F.col("doc_id").alias("doc"), F.col("shingle").alias("tok"))
    ref = {
        r["doc"]: r["fp"]
        for r in toks.groupBy("doc")
        .agg(F.sha2(F.concat_ws("\x00", F.sort_array(F.collect_set("tok"))), 256).alias("fp"))
        .collect()
    }
    # in-row form (as in jaccard_neardup_clusters after the rewrite)
    base = df.select(F.col("doc_id").alias("doc"), tokens(F.col("text")).alias("_toks")).where(
        F.size("_toks") >= 3
    )
    grams = F.transform(
        F.sequence(F.lit(0), F.size("_toks") - 3),
        lambda i: F.concat_ws(
            " ", *[F.element_at(F.col("_toks"), i + j + 1) for j in range(3)]
        ),
    )
    got = {
        r["doc"]: r["fp"]
        for r in base.select(
            "doc",
            F.sha2(
                F.concat_ws("\x00", F.array_sort(F.array_distinct(grams))), 256
            ).alias("fp"),
        ).collect()
    }
    assert got == ref
    # identical sets share a fingerprint; order-sensitive sets do not
    assert got[2] == got[3] and got[2] != got[5]
    assert 4 not in got


def test_jaccard_neardup_clusters_after_rewrite(spark):
    """End-to-end cluster semantics survive the in-row rewrite: identical
    docs cluster, short docs are absent, canonical pick unchanged."""
    from smart_data_lake_spark.functions.dedup import jaccard_neardup_clusters

    out = {
        r["cluster_id"]: (r["n_docs"], r["canonical_doc_id"])
        for r in jaccard_neardup_clusters(_docs(spark)).collect()
    }
    # docs 2 and 3 are byte-identical → one cluster keyed by min id 2
    assert out[2] == (2, 2)
    # doc 4 (too short) and doc 1 (no qualifying pair) are absent
    assert all(cid not in out for cid in (1, 4))


def test_shingles_duplicate_id_contract(spark):
    """The documented unique-id precondition (r12): a duplicated doc_id
    emits its shingles once PER ROW (in-row distinct cannot see across
    rows), and dropDuplicates on the id restores the old frame-level
    semantics exactly."""
    from smart_data_lake_spark.functions.dedup import shingles

    dup = spark.createDataFrame(
        [(1, "a b c d", 7), (1, "a b c d", 7), (2, "a b c d", 7)],
        "doc_id long, text string, n_chars long",
    )
    rows = sorted(map(tuple, shingles(dup).collect()))
    # defined behavior: doc 1's two rows each emit the 2 distinct 3-grams
    assert rows == [
        (1, "a b c"),
        (1, "a b c"),
        (1, "b c d"),
        (1, "b c d"),
        (2, "a b c"),
        (2, "b c d"),
    ]
    # the documented caller-side fix: dedup ids first -> set semantics
    deduped = sorted(
        map(tuple, shingles(dup.dropDuplicates(["doc_id"])).collect())
    )
    assert deduped == [(1, "a b c"), (1, "b c d"), (2, "a b c"), (2, "b c d")]
