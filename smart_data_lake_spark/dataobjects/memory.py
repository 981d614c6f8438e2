"""In-memory DataObject for tests and simulation.

Reference: `testutils/MockDataObject.scala:45` — an in-memory table DO used by
the reference's own test suite; ours keeps the written DataFrame (materialised
eagerly to break lineage like a real write would).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

from smart_data_lake_spark.config import register_data_object_type
from smart_data_lake_spark.dataobjects.base import (
    CanCreateDataFrame,
    CanHandlePartitions,
    CanMergeDataFrame,
    CanWriteDataFrame,
    DataObject,
    Table,
)
from smart_data_lake_spark.partitions import PartitionValues, apply_partition_filter
from smart_data_lake_spark.save_modes import SaveMode, SaveModeMergeOptions


@register_data_object_type
class MockDataObject(DataObject, CanCreateDataFrame, CanWriteDataFrame, CanMergeDataFrame, CanHandlePartitions):
    def __init__(
        self,
        id: str,
        primary_key: list[str] | None = None,
        partitions: list[str] | None = None,
        **kwargs: Any,
    ) -> None:
        super().__init__(id=id, **kwargs)
        self.table = Table(name=id, primary_key=primary_key)
        self.partitions = partitions or []
        self._df: DataFrame | None = None

    def exists(self, spark: SparkSession) -> bool:
        return self._df is not None

    def list_partitions(self, spark: SparkSession) -> list[PartitionValues]:
        """Distinct partition-column tuples of the held frame — the in-memory
        analogue of a file DO's partition-directory listing (a metadata-scale
        query in both cases)."""
        if not self.partitions or self._df is None:
            return []
        rows = self._df.select(*self.partitions).distinct().collect()
        return [PartitionValues.of(r.asDict()) for r in rows]

    def delete_partitions(self, spark: SparkSession, partition_values: list[PartitionValues]) -> None:
        if self._df is None or not partition_values:
            return
        from pyspark.sql import functions as F

        drop = F.lit(False)
        for pv in partition_values:
            drop = drop | pv.filter_expr()
        self._df = self._df.where(~drop).localCheckpoint(eager=True)

    def get_dataframe(self, spark, partition_values=None):
        if self._df is None:
            raise ValueError(f"({self.id}) no data written yet")
        df = self._df
        if partition_values:
            df = apply_partition_filter(df, partition_values)
        return df

    def init_write(self, df, partition_values=None):
        self.validate_schema_min(df, "write")

    def write_dataframe(self, df, partition_values=None, save_mode=None, merge_options=None):
        mode = save_mode or SaveMode.OVERWRITE
        self.init_write(df)
        if mode == SaveMode.APPEND and self._df is not None:
            df = self._df.unionByName(df, allowMissingColumns=True)
        elif mode == SaveMode.MERGE:
            return self.merge_dataframe_by_primary_key(df, merge_options)
        self._df = df.localCheckpoint(eager=True)  # materialise, break lineage
        return {"records_written": self._df.count()}

    def merge_dataframe_by_primary_key(self, df, merge_options=None):
        from smart_data_lake_spark.merge import apply_insert_semantics, merge_dataframes

        if self._df is None:
            self._df = apply_insert_semantics(df, merge_options or SaveModeMergeOptions()).localCheckpoint(
                eager=True
            )
            return {"records_written": self._df.count()}
        pks = self.table.primary_key or []
        if not pks:
            raise ValueError(f"({self.id}) primary key required for merge")
        merged = merge_dataframes(self._df, df, pks, merge_options)
        self._df = merged.localCheckpoint(eager=True)
        return {"records_written": df.count()}
