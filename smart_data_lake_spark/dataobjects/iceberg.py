"""Iceberg table DataObject.

Reference: `sdl-iceberg/src/main/scala/io/smartdatalake/workflow/dataobject/
IcebergTableDataObject.scala` — catalog-registered Iceberg tables with ACID
writes, MERGE via `MERGE INTO` SQL, snapshot-based time travel, and schema
evolution on merge.

Spark-first: everything goes through Spark's DataSourceV2 (`writeTo` /
`MERGE INTO` SQL) so data-skipping, hidden-partitioning, and distributed
commits are native. At 100 TB this (or Delta) is the table format you want —
MERGE touches only files whose min/max stats overlap the source keys.

The iceberg-spark-runtime jar + a configured catalog are required
(`spark.sql.catalog.<name>`); this container has neither, so the class
validates config and raises a clear error at IO time (option plumbing and
SQL generation stay unit-testable).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

from smart_data_lake_spark.config import register_data_object_type
from smart_data_lake_spark.dataobjects.base import (
    CanCreateDataFrame,
    CanMergeDataFrame,
    CanWriteDataFrame,
    DataObject,
    Table,
)
from smart_data_lake_spark.save_modes import SaveMode, SaveModeMergeOptions


def _iceberg_available(spark: SparkSession, catalog: str) -> bool:
    try:
        return spark.conf.get(f"spark.sql.catalog.{catalog}", None) is not None
    except Exception:  # noqa: BLE001
        return False


@register_data_object_type
class IcebergTableDataObject(DataObject, CanCreateDataFrame, CanWriteDataFrame, CanMergeDataFrame):
    def __init__(
        self,
        id: str,
        table: Table | dict,
        catalog: str = "iceberg",
        path: str | None = None,
        partition_transforms: list[str] | None = None,
        **kwargs: Any,
    ) -> None:
        super().__init__(id=id, **kwargs)
        if isinstance(table, dict):
            table = Table.of(table)
        self.table = table
        self.catalog = catalog
        self.path = path
        # hidden partitioning, e.g. ["days(ts)", "bucket(16, id)"] —
        # IcebergTableDataObject partition spec
        self.partition_transforms = partition_transforms or []

    @property
    def full_name(self) -> str:
        return f"{self.catalog}.{self.table.full_name}"

    @property
    def primary_key(self) -> list[str]:
        if not self.table.primary_key:
            raise ValueError(f"({self.id}) primary key required for merge")
        return self.table.primary_key

    def _require(self, spark: SparkSession) -> None:
        if not _iceberg_available(spark, self.catalog):
            raise RuntimeError(
                f"({self.id}) Iceberg IO needs the iceberg-spark-runtime jar and "
                f"a configured catalog 'spark.sql.catalog.{self.catalog}' — not "
                "present in this environment"
            )

    def exists(self, spark: SparkSession) -> bool:
        if not _iceberg_available(spark, self.catalog):
            return False
        return spark.catalog.tableExists(self.full_name)

    def get_dataframe(self, spark: SparkSession, partition_values=None) -> DataFrame:
        self._require(spark)
        return spark.table(self.full_name)

    def build_merge_sql(self, source_view: str, source_cols: list[str],
                        opts: SaveModeMergeOptions | None = None) -> str:
        """Engine-side MERGE INTO (IcebergTableDataObject merge) — same
        clause table as jdbc.build_merge_sql, against the catalog table."""
        from smart_data_lake_spark.dataobjects.jdbc import build_merge_sql

        return build_merge_sql(self.full_name, source_view, self.primary_key, source_cols, opts)

    def write_dataframe(self, df, partition_values=None, save_mode=None, merge_options=None):
        self._require(spark=df.sparkSession)
        mode = save_mode or SaveMode.OVERWRITE
        if mode == SaveMode.MERGE:
            return self.merge_dataframe_by_primary_key(df, merge_options)
        from pyspark.sql import functions as F

        writer = df.writeTo(self.full_name)
        if self.partition_transforms:  # pragma: no cover — needs iceberg runtime
            cols = [F.expr(t) for t in self.partition_transforms]
            writer = writer.partitionedBy(cols[0], *cols[1:])
        if mode == SaveMode.APPEND:
            writer.append()
        else:
            writer.createOrReplace()
        return {}

    def merge_dataframe_by_primary_key(self, df, merge_options=None):
        self._require(spark=df.sparkSession)
        view = f"_sdl_merge_src_{self.id}"
        df.createOrReplaceTempView(view)
        df.sparkSession.sql(self.build_merge_sql(view, df.columns, merge_options))
        return {}
