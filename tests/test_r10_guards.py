"""r10 guard/ADVICE fixes: the jaccard pair-output bound, the gated
lineage pins, and the sufficient-statistics bound surfacing."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _copy_dense_docs(spark, n_copies=60):
    """A corpus where one text is copied n times: identical-set families
    alone imply n·(n−1)/2 pairs."""
    rows = [(i, "the quick brown fox jumps over the lazy dog again") for i in range(n_copies)]
    rows += [(1000 + i, f"unique document number {i} with its own words entirely") for i in range(5)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_jaccard_pair_guard_raises_loudly(spark):
    from smart_data_lake_spark.functions.dedup import jaccard_prefix_join

    docs = _copy_dense_docs(spark, 60)  # 60*59/2 = 1770 guaranteed pairs
    with pytest.raises(ValueError, match="jaccard_neardup_clusters"):
        jaccard_prefix_join(docs, max_pairs=1000)


def test_jaccard_pair_guard_passes_below_bound(spark):
    from smart_data_lake_spark.functions.dedup import jaccard_prefix_join

    docs = _copy_dense_docs(spark, 5)  # 10 guaranteed pairs
    out = jaccard_prefix_join(docs, max_pairs=1000)
    assert out.where("jaccard >= 0.6").count() >= 10


def test_jaccard_pair_guard_disabled_runs_no_precount(spark):
    from smart_data_lake_spark.functions.dedup import jaccard_prefix_join

    docs = _copy_dense_docs(spark, 60)
    # max_pairs=None skips the pre-count entirely — the documented audit
    # escape hatch; the join itself still works
    out = jaccard_prefix_join(docs, max_pairs=None)
    assert out.count() >= 60 * 59 // 2


def test_lineage_pin_modes(spark):
    from smart_data_lake_spark.session import lineage_pin

    df = spark.range(10)
    # default: localCheckpoint blocks (lineage truncated)
    pinned = lineage_pin(df)
    assert pinned.count() == 10
    # off: frame returned untouched (same plan object semantics)
    spark.conf.set("spark.smartdatalake.lineagePin", "off")
    try:
        off = lineage_pin(df)
        assert off is df
    finally:
        spark.conf.unset("spark.smartdatalake.lineagePin")


def test_lineage_pin_reliable_uses_checkpoint_dir(spark, tmp_path):
    from smart_data_lake_spark.session import lineage_pin

    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    spark.conf.set("spark.smartdatalake.lineagePin", "reliable")
    try:
        out = lineage_pin(spark.range(5), eager=True)
        assert out.count() == 5
        # the reliable checkpoint materializes under the configured dir
        assert any((tmp_path / "ckpt").rglob("*"))
    finally:
        spark.conf.unset("spark.smartdatalake.lineagePin")


def test_sufficient_stats_bound_check(spark):
    """spearman/burstiness expose their DECIMAL(38,0) safe bound via an
    opt-in pre-check that fails with a diagnosable message instead of an
    ANSI decimal-overflow mid-job (r9 ADVICE)."""
    import datetime as dt

    from smart_data_lake_spark.functions.analytics import (
        burstiness_by_group,
        spearman_by_group,
    )
    from pyspark.sql import functions as F

    rows = [
        (i, dt.datetime(2024, 1, 1) + dt.timedelta(hours=i), "g", i % 3, float(i))
        for i in range(30)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, user_id long, value double"
    )
    hour = (F.floor(F.col("ts").cast("double") / 3600.0) % 24).cast("long")
    # normal data passes with the check enabled
    assert spearman_by_group(ev, "event_type", F.col("value"), hour, check_bound=True).count() == 1
    assert burstiness_by_group(ev, "event_type", check_bound=True).count() == 1
    # an artificially tiny bound trips the loud error
    with pytest.raises(ValueError, match="sufficient-statistics bound"):
        spearman_by_group(
            ev, "event_type", F.col("value"), hour, check_bound=True, _bound_rows=10
        ).count()
    with pytest.raises(ValueError, match="sufficient-statistics bound"):
        burstiness_by_group(ev, "event_type", check_bound=True, _bound_rows=10).count()


# --------------------------- r11: the two remaining pair emitters guarded


def test_simhash_pair_guard_raises_loudly(spark):
    from smart_data_lake_spark.functions.dedup import simhash_candidate_pairs

    docs = _copy_dense_docs(spark, 60)  # identical docs -> identical simhash
    with pytest.raises(ValueError, match="simhash_neardup_clusters"):
        simhash_candidate_pairs(docs, max_pairs=1000)


def test_simhash_pair_guard_passes_below_bound(spark):
    from smart_data_lake_spark.functions.dedup import simhash_candidate_pairs

    docs = _copy_dense_docs(spark, 5)
    out = simhash_candidate_pairs(docs, max_pairs=1000)
    assert out.where("hamming = 0").count() >= 10


def test_simhash_pair_guard_disabled_runs_no_precount(spark):
    from smart_data_lake_spark.functions.dedup import simhash_candidate_pairs

    docs = _copy_dense_docs(spark, 60)
    out = simhash_candidate_pairs(docs, max_pairs=None)
    assert out.count() >= 60 * 59 // 2


def test_containment_pair_guard_raises_loudly(spark):
    from smart_data_lake_spark.functions.dedup import containment_pairs

    docs = _copy_dense_docs(spark, 60)  # 60*59 DIRECTIONAL pairs at C=1.0
    with pytest.raises(ValueError, match="containment"):
        containment_pairs(docs, max_pairs=1000)


def test_containment_pair_guard_passes_below_bound(spark):
    from smart_data_lake_spark.functions.dedup import containment_pairs

    docs = _copy_dense_docs(spark, 5)
    out = containment_pairs(docs, max_pairs=1000)
    assert out.where("containment = 1.0").count() >= 20


def test_containment_pair_guard_disabled_runs_no_precount(spark):
    from smart_data_lake_spark.functions.dedup import containment_pairs

    docs = _copy_dense_docs(spark, 60)
    out = containment_pairs(docs, max_pairs=None)
    assert out.count() >= 60 * 59
