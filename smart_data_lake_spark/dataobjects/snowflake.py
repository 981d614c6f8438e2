"""Snowflake table DataObject.

Reference: `sdl-snowflake/.../dataobject/SnowflakeTableDataObject.scala:70-180`
and `connection/SnowflakeConnection.scala` — reads/writes through the
spark-snowflake DataSource (`net.snowflake.spark.snowflake`) with the
connection's sf* auth options, `dbtable`/`query` selection, virtual
partitions handled as delete-then-append on overwrite, `comment on table`
after write, and save modes restricted to Overwrite/Append/ErrorIfExists/
Ignore (the reference asserts Merge unimplemented — this rebuild mirrors
that contract exactly).

Split identical to `JdbcTableDataObject`: the DATA path is Spark's
distributed connector (gated — the spark-snowflake jar is not in this
container, IO raises a clear error naming it), while STATEMENTS (partition
deletes, comments) are dialect-generated SQL strings run through a pluggable
DB-API `sql_executor` — unit-tested against DuckDB so the generated SQL's
semantics are verified even without a Snowflake account.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession

from smart_data_lake_spark.config import (
    register_connection_type,
    register_data_object_type,
)
from smart_data_lake_spark.dataobjects.base import (
    CanCreateDataFrame,
    CanHandlePartitions,
    CanWriteDataFrame,
    DataObject,
    Table,
)
from smart_data_lake_spark.partitions import PartitionValues
from smart_data_lake_spark.save_modes import SaveMode

SNOWFLAKE_SOURCE = "net.snowflake.spark.snowflake"


@register_connection_type
class SnowflakeConnection:
    """Account endpoint + auth, shared by table objects
    (SnowflakeConnection.scala). `sql_executor` is any DB-API `execute(sql)`
    callable for the statement path (the reference's execJdbcStatement)."""

    def __init__(
        self,
        id: str,
        url: str,
        warehouse: str,
        database: str,
        user: str | None = None,
        password: str | None = None,
        role: str | None = None,
        options: dict[str, str] | None = None,
        sql_executor: Callable[[str], Any] | None = None,
    ) -> None:
        self.id = id
        self.url = url
        self.warehouse = warehouse
        self.database = database
        self.user = user
        self.password = password
        self.role = role
        self.options = options or {}
        self.sql_executor = sql_executor

    def auth_options(self, schema: str) -> dict[str, str]:
        """The sf* option map the spark-snowflake source expects
        (SnowflakeConnection.getJdbcAuthOptions)."""
        opts = {
            "sfURL": self.url,
            "sfWarehouse": self.warehouse,
            "sfDatabase": self.database,
            "sfSchema": schema,
            **self.options,
        }
        if self.user:
            opts["sfUser"] = self.user
        if self.password:
            opts["sfPassword"] = self.password
        if self.role:
            opts["sfRole"] = self.role
        return opts

    def exec_statement(self, sql: str) -> None:
        if self.sql_executor is None:
            raise RuntimeError(
                f"({self.id}) executing Snowflake statements needs a sql_executor "
                "(DB-API connection) — none configured"
            )
        self.sql_executor(sql)


@register_data_object_type
class SnowflakeTableDataObject(
    DataObject, CanCreateDataFrame, CanWriteDataFrame, CanHandlePartitions
):
    def __init__(
        self,
        id: str,
        table: Table | dict,
        connection: SnowflakeConnection | dict,
        query: str | None = None,
        spark_options: dict[str, str] | None = None,
        virtual_partitions: list[str] | None = None,
        comment: str | None = None,
        save_mode: SaveMode | str = SaveMode.OVERWRITE,
        **kwargs: Any,
    ) -> None:
        super().__init__(id=id, **kwargs)
        if isinstance(connection, dict):
            connection = SnowflakeConnection(**connection)
        self.connection = connection
        if isinstance(table, dict):
            table = Table.of(table)
        if not table.db:
            raise ValueError(f"({id}) a Snowflake schema name is required as table.db")
        self.table = table
        self.query = query
        self.spark_options = spark_options or {}
        # virtual partitions: Snowflake has no physical partitions; these
        # columns drive delete-then-append overwrite semantics
        self.partitions = [p.lower() for p in (virtual_partitions or [])]
        self.comment = comment
        self.save_mode = SaveMode(save_mode)
        if self.save_mode not in (
            SaveMode.OVERWRITE, SaveMode.APPEND, SaveMode.ERROR_IF_EXISTS, SaveMode.IGNORE,
        ):
            raise ValueError(f"({id}) Unsupported saveMode {self.save_mode}")

    @property
    def qualified_name(self) -> str:
        """database.schema.table — the catalog comes from the connection
        (table.overrideCatalogAndDb in the reference)."""
        return f"{self.connection.database}.{self.table.full_name}"

    # ------------------------------------------------------------------ io
    def _reader_options(self) -> dict[str, str]:
        opts = {**self.connection.auth_options(self.table.db), **self.spark_options}
        if self.query:
            opts["query"] = self.query
        else:
            opts["dbtable"] = self.qualified_name
        return opts

    def get_dataframe(self, spark: SparkSession, partition_values=None) -> DataFrame:
        try:
            df = spark.read.format(SNOWFLAKE_SOURCE).options(**self._reader_options()).load()
        except Exception as exc:  # noqa: BLE001
            raise RuntimeError(
                f"({self.id}) reading Snowflake needs the spark-snowflake connector "
                f"({SNOWFLAKE_SOURCE}) on the classpath: {exc}"
            ) from exc
        if partition_values:
            from smart_data_lake_spark.partitions import apply_partition_filter

            df = apply_partition_filter(df, partition_values)
        return df

    def delete_partitions_sql(self, partition_values: list[PartitionValues]) -> str:
        """Delete-then-append overwrite for virtual partitions
        (SnowflakeTableDataObject.deletePartitions): one DELETE with an OR of
        per-partition conjunctions — a single statement, engine-side."""
        if not partition_values:
            raise ValueError(f"({self.id}) no partition values to delete")

        def one(pv: PartitionValues) -> str:
            conjuncts = [
                # quote-doubling: a value containing ' must not break out of
                # the literal (these strings run on the live warehouse)
                f"""{k} = '{v.replace("'", "''")}'""" if isinstance(v, str) else f"{k} = {v}"
                for k, v in pv.as_dict.items()
            ]
            return "(" + " AND ".join(conjuncts) + ")"

        return (
            f"DELETE FROM {self.qualified_name} WHERE "
            + " OR ".join(one(pv) for pv in partition_values)
        )

    def comment_sql(self) -> str:
        assert self.comment is not None
        return f"comment on table {self.qualified_name} is '{self.comment}'"

    def write_dataframe(
        self, df: DataFrame, partition_values=None, save_mode=None, merge_options=None
    ) -> dict[str, Any]:
        mode = SaveMode(save_mode) if save_mode else self.save_mode
        if mode == SaveMode.MERGE:
            raise ValueError(f"({self.id}) SaveMode.Merge not implemented for Snowflake writes")
        self.validate_schema_min(df, "write")
        spark = df.sparkSession
        # probe the connector BEFORE any destructive statement: the
        # delete-then-append overwrite is not transactional, so a write that
        # is GUARANTEED to fail (no connector on the classpath) must fail
        # before the DELETE, never between delete and append
        try:
            jvm = spark._jvm
            jvm.org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(
                SNOWFLAKE_SOURCE, jvm.org.apache.spark.sql.internal.SQLConf.get()
            )
        except Exception as exc:  # noqa: BLE001
            raise RuntimeError(
                f"({self.id}) writing Snowflake needs the spark-snowflake connector "
                f"({SNOWFLAKE_SOURCE}) on the classpath"
            ) from exc
        if partition_values and mode == SaveMode.OVERWRITE:
            # overwrite selected virtual partitions = delete + append
            self.connection.exec_statement(self.delete_partitions_sql(partition_values))
            mode = SaveMode.APPEND
        spark_mode = {"overwrite": "overwrite", "append": "append",
                      "error": "error", "ignore": "ignore"}[mode.value]
        # observe() counts rows during the write itself — no second scan of
        # the upstream lineage (same pattern as SparkFileDataObject)
        from pyspark.sql import Observation
        from pyspark.sql import functions as F

        obs = Observation(f"write_{self.id}")
        df = df.observe(obs, F.count(F.lit(1)).alias("records_written"))
        (
            df.write.format(SNOWFLAKE_SOURCE)
            .options(**self.connection.auth_options(self.table.db))
            .options(**self.spark_options)
            .option("dbtable", self.qualified_name)
            .mode(spark_mode)
            .save()
        )
        if self.comment:
            self.connection.exec_statement(self.comment_sql())
        try:
            metrics = dict(obs.get)
        except Exception:  # noqa: BLE001 — connector may not run observations
            metrics = {}
        return {"records_written": metrics.get("records_written", 0), **metrics}

    def delete_partitions(
        self, spark: SparkSession, partition_values: list[PartitionValues]
    ) -> None:
        """CanHandlePartitions hook: engine-side DELETE through the
        connection's statement executor."""
        if partition_values:
            self.connection.exec_statement(self.delete_partitions_sql(partition_values))

    # virtual partitions: listing needs a live connection; gated like IO
    def list_partitions(self, spark: SparkSession) -> list[PartitionValues]:
        if not self.partitions:
            return []
        cols = ", ".join(self.partitions)
        df = self.get_dataframe(spark).select(*self.partitions).distinct()
        return [PartitionValues.of({c: r[c] for c in self.partitions}) for r in df.collect()]
