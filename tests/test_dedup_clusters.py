"""Connected-components / near-dup clustering operator tests."""

from pyspark.sql import Row

from smart_data_lake_spark.functions.dedup import connected_components, neardup_clusters


def test_connected_components_chain_and_islands(spark):
    # chain 1-2-3-4 (diameter 3, needs >1 propagation round), island 10-11,
    # and 20-21-22 forming a triangle
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        "doc_a bigint, doc_b bigint",
    )
    got = {(r.node, r.label) for r in connected_components(edges).collect()}
    assert got == {
        (1, 1), (2, 1), (3, 1), (4, 1),
        (10, 10), (11, 10),
        (20, 20), (21, 20), (22, 20),
    }


def test_connected_components_long_chain_converges(spark):
    # path graph 0-1-...-12: min-label must travel the whole chain
    n = 13
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a bigint, doc_b bigint"
    )
    labels = connected_components(edges).collect()
    assert all(r.label == 0 for r in labels)
    assert len(labels) == n


def test_neardup_clusters_canonical_pick(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, n_chars=100),
            Row(doc_id=2, n_chars=300),   # canonical of {1,2,3}: largest
            Row(doc_id=3, n_chars=300),   # tie on size -> lower id wins (2)
            Row(doc_id=10, n_chars=50),
            Row(doc_id=11, n_chars=40),
            Row(doc_id=99, n_chars=1),    # singleton: not in any pair -> absent
        ]
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a bigint, doc_b bigint"
    )
    got = {
        (r.cluster_id, r.n_docs, r.canonical_doc_id)
        for r in neardup_clusters(docs, pairs).collect()
    }
    assert got == {(1, 3, 2), (10, 2, 10)}


def test_simhash_neardup_clusters_linear_output_in_cluster_size(spark):
    """A k-copy near-dup family is k*(k-1)/2 PAIRS but ONE cluster row —
    the 100 TB output shape the composition exists for."""
    from smart_data_lake_spark.functions.dedup import (
        simhash_candidate_pairs,
        simhash_neardup_clusters,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [Row(doc_id=i, text=base + f" v{i}", n_chars=60 + i) for i in range(6)]
    rows += [Row(doc_id=100, text="completely unrelated content about spark plans", n_chars=10)]
    docs = spark.createDataFrame(rows)
    pairs = simhash_candidate_pairs(docs, max_hamming=3)
    clusters = simhash_neardup_clusters(docs, max_hamming=3).collect()
    n_pairs = pairs.count()
    assert n_pairs >= 10  # near-identical family collides across bands
    assert len(clusters) == 1  # ...but collapses to one cluster row
    (c,) = clusters
    assert c.cluster_id == 0 and c.n_docs >= 5
    # canonical = largest n_chars in the cluster (doc 5 here)
    assert c.canonical_doc_id == 5


def test_simhash_clusters_identical_sig_group_without_cross_edges(spark):
    """Signature-collapse semantics: docs with IDENTICAL signatures are a
    cluster by themselves (pairwise hamming 0) even when their
    representative has no cross-signature edge; unrelated singletons stay
    absent, exactly like the uncollapsed pair graph."""
    from smart_data_lake_spark.functions.dedup import simhash_neardup_clusters

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="identical words in every copy", n_chars=10),
            Row(doc_id=2, text="identical words in every copy", n_chars=30),
            Row(doc_id=3, text="identical words in every copy", n_chars=30),
            Row(doc_id=50, text="totally different subject matter entirely", n_chars=99),
        ]
    )
    got = {
        (r.cluster_id, r.n_docs, r.canonical_doc_id)
        for r in simhash_neardup_clusters(docs).collect()
    }
    # canonical: largest n_chars, tie -> lowest id = 2; singleton 50 absent
    assert got == {(1, 3, 2)}


def test_exact_segment_dedup_marks_later_occurrences(spark):
    from smart_data_lake_spark.functions.dedup import exact_segment_dedup

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j"),          # segments: [a..e], [f..j]
            (2, "a b c d e x y z w v"),          # first segment duplicates doc 1's
            (3, "p q r"),                        # too short -> excluded
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in exact_segment_dedup(docs).collect()}
    assert out[1].n_segments == 2 and out[1].n_dup_segments == 0
    assert out[2].n_segments == 2 and out[2].n_dup_segments == 1
    assert out[2].dup_frac == 0.5
    assert 3 not in out


def test_exact_segment_dedup_first_occurrence_deterministic(spark):
    from smart_data_lake_spark.functions.dedup import exact_segment_dedup

    docs = spark.createDataFrame(
        [(i, "a b c d e") for i in range(1, 6)], "doc_id long, text string"
    )
    out = {r.doc_id: r.n_dup_segments for r in exact_segment_dedup(docs.repartition(5)).collect()}
    assert out[1] == 0                       # lowest doc_id keeps the segment
    assert all(out[i] == 1 for i in range(2, 6))


def test_unigram_logprob_orders_typicality(spark):
    from smart_data_lake_spark.functions.quality import unigram_logprob_score

    docs = spark.createDataFrame(
        [
            (1, "common common common common"),
            (2, "common common common rare"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in unigram_logprob_score(docs).collect()}
    # 'common' has p=7/8, 'rare' p=1/8: doc 1 scores strictly higher
    assert out[1].avg_logprob > out[2].avg_logprob
    assert out[1].n_tokens == 4 and out[2].n_tokens == 4


def test_connected_components_worst_case_chain_log_rounds(spark):
    """Adversarial path graph (diameter 40, the shape overlapping shingle
    chains produce): pointer jumping converges in O(log2 diameter) rounds —
    plain neighbor propagation would need 40 and silently time out at
    max_iter=20. Also pins the measured round count so a regression to
    linear convergence fails loudly."""
    n = 41
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a bigint, doc_b bigint"
    )
    labels, rounds = connected_components(edges, return_rounds=True)
    got = labels.collect()
    assert len(got) == n and all(r.label == 0 for r in got)
    assert rounds <= 8, f"expected ~log2(40)≈6 rounds, used {rounds}"


def test_connected_components_raises_on_non_convergence(spark):
    import pytest

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "doc_a bigint, doc_b bigint"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=2)


def test_jaccard_neardup_clusters_matches_full_pair_graph(spark):
    """jaccard_neardup_clusters must equal connected components over the
    FULL exact pair graph (jaccard_prefix_join) — the representative
    collapse is an execution detail, not a semantics change."""
    from pyspark.sql import functions as F

    from smart_data_lake_spark.functions.dedup import (
        connected_components,
        jaccard_neardup_clusters,
        jaccard_prefix_join,
        neardup_clusters,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = []
    # family A: 4 exact copies + 1 near copy (one word changed)
    for i in range(4):
        rows.append((i, base, 100 + i))
    rows.append((4, base.replace("kappa", "lambda"), 104))
    # family B: 2 exact copies of a different text
    other = "one two three four five six seven eight nine ten"
    rows.append((10, other, 50))
    rows.append((11, other, 60))
    # singletons: unrelated text, and a doc too short to shingle
    rows.append((20, "completely different words nothing shared here at all yes", 10))
    rows.append((21, "xy", 5))
    docs = spark.createDataFrame(rows, "doc_id long, text string, n_chars int")

    got = {
        (r.cluster_id, r.n_docs, r.canonical_doc_id)
        for r in jaccard_neardup_clusters(docs).collect()
    }
    pairs = jaccard_prefix_join(docs)
    expected = {
        (r.cluster_id, r.n_docs, r.canonical_doc_id)
        for r in neardup_clusters(
            docs.select("doc_id", "n_chars"), pairs.select("doc_a", "doc_b")
        ).collect()
    }
    assert got == expected
    # family A is one 5-doc cluster (canonical = largest n_chars: doc 4 or 3)
    assert {(c, n) for c, n, _ in got} == {(0, 5), (10, 2)}


def test_jaccard_neardup_clusters_linear_output_in_family_size(spark):
    """A k-copy family is k*(k-1)/2 PAIRS but ONE cluster row, and the
    expensive join runs on ONE representative per distinct token set."""
    from smart_data_lake_spark.functions.dedup import (
        jaccard_neardup_clusters,
        jaccard_prefix_join,
    )

    text = "the quick brown fox jumps over the lazy dog tonight"
    docs = spark.createDataFrame(
        [(i, text, 100) for i in range(30)], "doc_id long, text string, n_chars int"
    )
    pairs = jaccard_prefix_join(docs)
    clusters = jaccard_neardup_clusters(docs)
    assert pairs.count() == 30 * 29 // 2
    got = clusters.collect()
    assert len(got) == 1
    assert got[0].n_docs == 30 and got[0].cluster_id == 0
