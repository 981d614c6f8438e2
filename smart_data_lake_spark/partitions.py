"""PartitionValues — the currency of incremental processing.

Reference semantics: `util/hdfs/Partition.scala:37` — a PartitionValues is a
map {partition_col: value} naming one Hive-style partition; sets of them are
passed along DAG edges and converted to DataFrame filters
(`PartitionValues.getFilterExpr`, Partition.scala:41) so Catalyst pushes them
into the parquet scan as partition pruning.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class PartitionValues:
    """One Hive-style partition, e.g. {"dt": "2024-01-01", "hour": 3}."""

    values: tuple[tuple[str, Any], ...]

    @classmethod
    def of(cls, mapping: dict[str, Any]) -> "PartitionValues":
        return cls(tuple(sorted(mapping.items())))

    @property
    def as_dict(self) -> dict[str, Any]:
        return dict(self.values)

    @property
    def keys(self) -> tuple[str, ...]:
        return tuple(k for k, _ in self.values)

    def is_complete(self, partition_cols: list[str]) -> bool:
        return set(self.keys) >= set(partition_cols)

    def filter_expr(self) -> Column:
        """AND of col==value equality predicates (Partition.scala:41)."""
        expr = F.lit(True)
        for k, v in self.values:
            expr = expr & (F.col(k) == F.lit(v))
        return expr

    def hive_path(self) -> str:
        return "/".join(f"{k}={v}" for k, v in self.values)

    def __str__(self) -> str:  # pragma: no cover
        return self.hive_path()


def filter_expr_for(partition_values: Iterable[PartitionValues]) -> Column | None:
    """OR-of-ANDs filter for a set of partitions; None if the set is empty.

    Catalyst recognises this shape for partition pruning on partitioned
    parquet — at 100 TB this is the difference between scanning one day and
    scanning the lake.
    """
    pvs = list(partition_values)
    if not pvs:
        return None
    expr = pvs[0].filter_expr()
    for pv in pvs[1:]:
        expr = expr | pv.filter_expr()
    return expr


def apply_partition_filter(df: DataFrame, partition_values: Iterable[PartitionValues]) -> DataFrame:
    expr = filter_expr_for(partition_values)
    return df if expr is None else df.where(expr)


def diff_partition_values(
    input_pvs: Iterable[PartitionValues], output_pvs: Iterable[PartitionValues]
) -> list[PartitionValues]:
    """Set-diff used by PartitionDiffMode (PartitionDiffMode.scala:61-197)."""
    out = set(output_pvs)
    return [pv for pv in input_pvs if pv not in out]
