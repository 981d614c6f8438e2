"""Custom + virtual DataObjects.

Reference: `dataobject/CustomDfDataObject.scala:36-41` (user-supplied creator),
`dataobject/PKViolatorsDataObject.scala:56-61` (virtual DO scanning all
registered table DOs for PK violations; algorithm
`dataframe/GenericDataFrame.scala:119-152`),
`dataobject/ActionsExporterDataObject.scala:53` /
`DataObjectsExporterDataObject.scala:52` (config metadata exporters).
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from smart_data_lake_spark.config import InstanceRegistry, register_data_object_type
from smart_data_lake_spark.dataobjects.base import CanCreateDataFrame, DataObject


@register_data_object_type
class CustomDfDataObject(DataObject, CanCreateDataFrame):
    """Wraps a python callable `(spark) -> DataFrame`."""

    def __init__(self, id: str, creator: Callable[[SparkSession], DataFrame] | str, **kwargs: Any):
        super().__init__(id=id, **kwargs)
        if isinstance(creator, str):
            creator = _import_dotted(creator)
        self.creator = creator

    def get_dataframe(self, spark, partition_values=None):
        return self.creator(spark)


@register_data_object_type
class CustomFileDataObject(DataObject):
    """File content produced by a python callable `() -> bytes`
    (CustomFileDataObject.scala:36-46: the creator's stream IS the file).
    `get_file(target)` materializes it; `path` + `file_name` give downstream
    file actions a location to read."""

    def __init__(
        self,
        id: str,
        creator: Callable[[], bytes] | str,
        path: str,
        file_name: str = "data",
        **kwargs: Any,
    ):
        super().__init__(id=id, **kwargs)
        if isinstance(creator, str):
            creator = _import_dotted(creator)
        self.creator = creator
        self.path = path
        self.file_name = file_name

    def materialize(self) -> str:
        import os

        os.makedirs(self.path, exist_ok=True)
        target = os.path.join(self.path, self.file_name)
        with open(target, "wb") as f:
            f.write(self.creator())
        return target

    def prepare(self, spark) -> None:
        self.materialize()


def pk_violations(df: DataFrame, pks: list[str], source: str) -> DataFrame:
    """PK violations = duplicate keys + null key components
    (GenericDataFrame.getPKViolators, GenericDataFrame.scala:119-152)."""
    key = [F.col(c) for c in pks]
    dups = (
        df.groupBy(*key)
        .agg(F.count(F.lit(1)).alias("dl_cnt"))
        .where(F.col("dl_cnt") > 1)
        .select(
            F.lit(source).alias("data_object_id"),
            F.to_json(F.struct(*key)).alias("key"),
            F.lit("duplicate").alias("violation"),
            F.col("dl_cnt").alias("cnt"),
        )
    )
    null_cond = F.lit(False)
    for c in pks:
        null_cond = null_cond | F.col(c).isNull()
    nulls = (
        df.where(null_cond)
        .select(
            F.lit(source).alias("data_object_id"),
            F.to_json(F.struct(*key)).alias("key"),
            F.lit("null_key").alias("violation"),
            F.lit(1).cast("long").alias("cnt"),
        )
    )
    return dups.unionByName(nulls)


@register_data_object_type
class PKViolatorsDataObject(DataObject, CanCreateDataFrame):
    def __init__(self, id: str, registry: InstanceRegistry | None = None, **kwargs: Any):
        super().__init__(id=id, **kwargs)
        self.registry = registry

    def get_dataframe(self, spark, partition_values=None):
        frames = []
        for do in (self.registry.data_objects.values() if self.registry else []):
            table = getattr(do, "table", None)
            if table is not None and table.primary_key and isinstance(do, CanCreateDataFrame):
                try:
                    frames.append(pk_violations(do.get_dataframe(spark), table.primary_key, do.id))
                except Exception as exc:  # e.g. output table not materialized yet
                    import logging

                    logging.getLogger(__name__).warning(
                        "PKViolators: skipping %s (%s)", do.id, exc
                    )
                    continue
        if not frames:
            return spark.createDataFrame(
                [], "data_object_id string, key string, violation string, cnt long"
            )
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f)
        return out


@register_data_object_type
class DataObjectsExporterDataObject(DataObject, CanCreateDataFrame):
    def __init__(self, id: str, registry: InstanceRegistry | None = None, **kwargs: Any):
        super().__init__(id=id, **kwargs)
        self.registry = registry

    def get_dataframe(self, spark, partition_values=None):
        rows = [
            (do.id, type(do).__name__, getattr(do, "path", None), str(do.metadata))
            for do in (self.registry.data_objects.values() if self.registry else [])
        ]
        return spark.createDataFrame(rows, "id string, type string, path string, metadata string")


@register_data_object_type
class ActionsExporterDataObject(DataObject, CanCreateDataFrame):
    def __init__(self, id: str, registry: InstanceRegistry | None = None, **kwargs: Any):
        super().__init__(id=id, **kwargs)
        self.registry = registry

    def get_dataframe(self, spark, partition_values=None):
        rows = [
            (a.id, type(a).__name__, ",".join(a.input_ids), ",".join(a.output_ids))
            for a in (self.registry.actions.values() if self.registry else [])
        ]
        return spark.createDataFrame(rows, "id string, type string, input_ids string, output_ids string")


def _import_dotted(path: str) -> Any:
    import importlib

    module, _, attr = path.rpartition(".")
    return getattr(importlib.import_module(module), attr)
