"""SubFeeds — what flows along a DAG edge.

Reference: `workflow/SubFeed.scala:32-74` (base),
`workflow/dataframe/spark/SparkSubFeed.scala:47-146` (Spark flavour),
`workflow/FileSubFeed.scala:38` (file lists), `workflow/ScriptSubFeed.scala:38`
(script params). A SubFeed is a *reference* to data — a lazy DataFrame plus
partition values, an optional pushed-down filter, and skip flags — never
materialised rows.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Any

from pyspark.sql import DataFrame

from smart_data_lake_spark.partitions import PartitionValues, apply_partition_filter


@dataclass
class SubFeed:
    data_object_id: str
    partition_values: list[PartitionValues] = field(default_factory=list)
    is_skipped: bool = False
    is_dag_start: bool = False
    metrics: dict[str, Any] = field(default_factory=dict)

    def clear_partition_values(self) -> "SubFeed":
        return replace(self, partition_values=[])


@dataclass
class SparkSubFeed(SubFeed):
    """DataFrame-carrying subfeed (SparkSubFeed.scala:47).

    `df` is lazy; `filter` is a SQL predicate that has been applied (kept for
    lineage/debugging); `is_dummy` marks init-phase schema-only frames.
    """

    df: DataFrame | None = None
    filter: str | None = None
    is_dummy: bool = False

    @property
    def is_streaming(self) -> bool:
        return self.df is not None and self.df.isStreaming

    def with_df(self, df: DataFrame) -> "SparkSubFeed":
        return replace(self, df=df, is_dummy=False)

    def apply_partition_filter(self) -> "SparkSubFeed":
        if self.df is None or not self.partition_values:
            return self
        return replace(self, df=apply_partition_filter(self.df, self.partition_values))

    def break_lineage(self) -> "SparkSubFeed":
        """Drop the DataFrame so the next action re-reads from storage
        (SubFeed.breakLineage, SubFeed.scala:40-45) — avoids mile-long plans
        that blow up Catalyst analysis time on big DAGs."""
        return replace(self, df=None, is_dummy=False)


@dataclass
class FileSubFeed(SubFeed):
    """File-reference subfeed for non-Spark file transfer (FileSubFeed.scala:38)."""

    file_refs: list[str] | None = None


@dataclass
class ScriptSubFeed(SubFeed):
    """String parameters between script actions (ScriptSubFeed.scala:38)."""

    parameters: dict[str, str] = field(default_factory=dict)
