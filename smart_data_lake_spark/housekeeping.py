"""Housekeeping modes: partition retention, archive, compaction.

Reference: `dataobject/HousekeepingMode.scala:32-155` —
PartitionRetentionMode (:49: keep partitions satisfying a Spark SQL
`retention_condition` over `elements` = the partition-values map, drop the
rest) and PartitionArchiveCompactionMode (:91-96: `archive_partition_
expression` maps each partition to its archive partition — identity = keep;
`compact_partition_expression` selects partitions whose files are rewritten
compacted).

Conditions are evaluated with Spark itself on a one-row-per-partition frame —
the expression dialect is exactly the reference's (elements['dt'], datediff,
now(), ...), and evaluation cost is O(#partitions), a metadata-scale job.
Housekeeping runs after a successful write (DataObject.scala
housekeepingMode hook) — wired in ActionDAGRun post-exec.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from smart_data_lake_spark.dataobjects.base import CanHandlePartitions, DataObject
from smart_data_lake_spark.partitions import PartitionValues


def _evaluate_partition_expr(
    spark: SparkSession, pvs: list[PartitionValues], expr: str, alias: str
):
    """Evaluate a Spark SQL expression over `elements` (partition map) for
    each partition value — one tiny local job."""
    rows = [(i, {k: str(v) for k, v in pv.as_dict.items()}) for i, pv in enumerate(pvs)]
    df = spark.createDataFrame(rows, "idx int, elements map<string,string>")
    out = df.select("idx", F.expr(expr).alias(alias)).collect()
    return {r["idx"]: r[alias] for r in out}


class HousekeepingMode:
    def post_write(self, spark: SparkSession, data_object: DataObject) -> dict[str, Any]:
        raise NotImplementedError


class PartitionRetentionMode(HousekeepingMode):
    """Delete partitions whose `retention_condition` evaluates false
    (HousekeepingMode.scala:49-70)."""

    def __init__(self, retention_condition: str, description: str | None = None) -> None:
        self.retention_condition = retention_condition
        self.description = description

    def post_write(self, spark: SparkSession, data_object: DataObject) -> dict[str, Any]:
        assert isinstance(data_object, CanHandlePartitions), (
            f"({data_object.id}) housekeeping requires a partitioned DataObject"
        )
        pvs = data_object.list_partitions(spark)
        if not pvs:
            return {"partitions_deleted": 0}
        keep = _evaluate_partition_expr(spark, pvs, self.retention_condition, "keep")
        drop = [pv for i, pv in enumerate(pvs) if not keep[i]]
        if drop:
            data_object.delete_partitions(spark, drop)
        return {"partitions_deleted": len(drop)}


class PartitionArchiveCompactionMode(HousekeepingMode):
    """Archive old partitions into coarser ones and/or compact small files
    (HousekeepingMode.scala:85-155).

    archive_partition_expression: map-expression over `elements` returning the
    TARGET partition map (identity → stay). Rows of re-mapped partitions are
    rewritten under the new partition values (a per-partition job — at scale
    this is the nightly roll-up that keeps partition counts bounded).
    compact_partition_expression: boolean over `elements`; matching partitions
    are rewritten with `n_files` output files (small-file compaction).
    """

    def __init__(
        self,
        archive_partition_expression: str | None = None,
        compact_partition_expression: str | None = None,
        n_files: int = 1,
        description: str | None = None,
    ) -> None:
        self.archive_partition_expression = archive_partition_expression
        self.compact_partition_expression = compact_partition_expression
        self.n_files = n_files
        self.description = description

    def post_write(self, spark: SparkSession, data_object: DataObject) -> dict[str, Any]:
        assert isinstance(data_object, CanHandlePartitions)
        pvs = data_object.list_partitions(spark)
        metrics = {"partitions_archived": 0, "partitions_compacted": 0}
        if not pvs:
            return metrics
        if self.archive_partition_expression:
            target = _evaluate_partition_expr(
                spark, pvs, self.archive_partition_expression, "target"
            )
            moves = [
                (pv, PartitionValues.of(dict(target[i])))
                for i, pv in enumerate(pvs)
                if dict(target[i]) != {k: str(v) for k, v in pv.as_dict.items()}
            ]
            for src, dst in moves:
                self._rewrite_partition(spark, data_object, src, dst)
            metrics["partitions_archived"] = len(moves)
        if self.compact_partition_expression:
            pvs = data_object.list_partitions(spark)
            compact = _evaluate_partition_expr(
                spark, pvs, self.compact_partition_expression, "compact"
            )
            todo = [pv for i, pv in enumerate(pvs) if compact[i]]
            import os

            if getattr(data_object, "path", None) and os.path.isdir(str(data_object.path)):
                # filesystem object: crash-safe marker protocol
                # (CompactionUtil.scala) — never the naive read/delete/
                # rewrite that loses the partition on a crash
                from smart_data_lake_spark.compaction import compact_partitions

                cm = compact_partitions(spark, data_object, todo, n_files=self.n_files)
                metrics["partitions_compacted"] = cm["partitions_compacted"]
                metrics.update(
                    {k: v for k, v in cm.items() if k != "partitions_compacted"}
                )
            else:
                # non-filesystem partitioned object (JDBC/Snowflake virtual
                # partitions…): generic read→rewrite per partition — the
                # store's own write transactionality is the safety story
                for pv in todo:
                    self._rewrite_partition(spark, data_object, pv, pv)
                metrics["partitions_compacted"] = len(todo)
        return metrics

    def _rewrite_partition(self, spark, data_object, src: PartitionValues, dst: PartitionValues):
        from smart_data_lake_spark.save_modes import SaveMode

        df = data_object.get_dataframe(spark, [src])
        for col, val in dst.as_dict.items():
            # partition columns are strings on disk; rewrite under the target value
            df = df.withColumn(col, F.lit(val).cast(df.schema[col].dataType))
        df = df.repartition(self.n_files)
        df = df.localCheckpoint(eager=True)  # read fully before deleting source files
        data_object.delete_partitions(spark, [src])
        data_object.write_dataframe(df, [dst], SaveMode.APPEND)
