"""JDBC table DataObject: transactional overwrite + generated SQL MERGE.

Reference: `sdl-core/.../dataobject/JdbcTableDataObject.scala` — temp-table
transactional overwrite (:330-356: write to a temp table, then swap inside
one DB transaction so readers never see a half-written table) and generated
MERGE statement (:375-400: stage the source, run engine-side MERGE keyed on
the primary key).

Scale design: the DATA path stays distributed — Spark's jdbc writer moves
rows executor-parallel into a staging table (numPartitions/batchsize
options); only DDL/DML strings (swap, merge) run on the driver's SQL
connection, which is O(statement), not O(data). The same split the reference
uses.

Connectivity: a JDBC driver jar (`spark.jars`) enables the distributed
spark.read/write.jdbc path. Independently, `sql_executor` — any DB-API-style
`execute(sql)` callable — runs the transactional statements. Tests drive the
generated SQL against DuckDB; a real deployment passes a JDBC-backed
executor. Without either, IO raises with a clear message.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession

from smart_data_lake_spark.config import register_connection_type, register_data_object_type
from smart_data_lake_spark.dataobjects.base import (
    CanCreateDataFrame,
    CanMergeDataFrame,
    CanWriteDataFrame,
    DataObject,
    Table,
)
from smart_data_lake_spark.save_modes import SaveMode, SaveModeMergeOptions


def build_merge_sql(
    target: str,
    staging: str,
    pks: list[str],
    source_cols: list[str],
    opts: SaveModeMergeOptions | None = None,
) -> str:
    """ANSI `MERGE INTO` mirroring JdbcTableDataObject.scala:375-400 and the
    SaveModeMergeOptions clause table (delete/update/insert conditions,
    column subsets, insert overrides)."""
    opts = opts or SaveModeMergeOptions()
    on = " AND ".join(f"existing.{k} = new.{k}" for k in pks)
    if opts.additional_merge_predicate:
        on += f" AND ({opts.additional_merge_predicate})"
    clauses = [f"MERGE INTO {target} existing", f"USING {staging} new", f"ON {on}"]
    if opts.delete_condition:
        clauses.append(f"WHEN MATCHED AND ({opts.delete_condition}) THEN DELETE")
    update_cols = opts.update_columns or [c for c in source_cols if c not in pks]
    set_expr = ", ".join(f"{c} = new.{c}" for c in update_cols)
    if opts.update_condition:
        clauses.append(f"WHEN MATCHED AND ({opts.update_condition}) THEN UPDATE SET {set_expr}")
    elif not opts.update_existing_condition:
        # with updateExisting configured, an unconditional WHEN MATCHED
        # UPDATE would shadow it (clauses fire first-match-wins)
        clauses.append(f"WHEN MATCHED THEN UPDATE SET {set_expr}")
    if opts.update_existing_condition:
        # steering columns (insert_columns_to_ignore, e.g. dl_operation) are
        # never persisted in the target, so they can't appear in the SET list
        all_set = ", ".join(
            f"{c} = new.{c}"
            for c in source_cols
            if c not in pks and c not in opts.insert_columns_to_ignore
        )
        clauses.append(
            f"WHEN MATCHED AND ({opts.update_existing_condition}) THEN UPDATE SET {all_set}"
        )
    insert_cols = [c for c in source_cols if c not in opts.insert_columns_to_ignore]
    insert_names = list(insert_cols)
    for c in opts.insert_values_override:
        if c not in insert_names:
            insert_names.append(c)
    values = [
        opts.insert_values_override.get(c, f"new.{c}") for c in insert_names
    ]
    ins = f"WHEN NOT MATCHED"
    if opts.insert_condition:
        ins += f" AND ({opts.insert_condition})"
    ins += f" THEN INSERT ({', '.join(insert_names)}) VALUES ({', '.join(values)})"
    clauses.append(ins)
    return "\n".join(clauses)


def build_upsert_sqls(
    target: str,
    staging: str,
    pks: list[str],
    source_cols: list[str],
    opts: SaveModeMergeOptions | None = None,
) -> list[str]:
    """UPDATE+DELETE+INSERT equivalent of `build_merge_sql` for engines
    without MERGE support — executed inside one transaction."""
    opts = opts or SaveModeMergeOptions()
    on = " AND ".join(f"{target}.{k} = new.{k}" for k in pks)
    extra = f" AND ({opts.additional_merge_predicate})" if opts.additional_merge_predicate else ""
    extra = extra.replace("existing.", f"{target}.")
    stmts = []
    if opts.delete_condition:
        cond = opts.delete_condition.replace("existing.", f"{target}.")
        stmts.append(
            f"DELETE FROM {target} WHERE EXISTS (SELECT 1 FROM {staging} new WHERE {on}{extra} AND ({cond}))"
        )
    update_cols = opts.update_columns or [c for c in source_cols if c not in pks]
    set_expr = ", ".join(f"{c} = new.{c}" for c in update_cols)
    if opts.update_condition:
        cond = opts.update_condition.replace("existing.", f"{target}.")
        stmts.append(
            f"UPDATE {target} SET {set_expr} FROM {staging} new WHERE {on}{extra} AND ({cond})"
        )
    elif not opts.update_existing_condition:
        # same shadowing rule as build_merge_sql: an unconditional update
        # alongside updateExisting would overwrite every matched row first
        stmts.append(f"UPDATE {target} SET {set_expr} FROM {staging} new WHERE {on}{extra}")
    if opts.update_existing_condition:
        all_set = ", ".join(
            f"{c} = new.{c}"
            for c in source_cols
            if c not in pks and c not in opts.insert_columns_to_ignore
        )
        ue_cond = opts.update_existing_condition.replace("existing.", f"{target}.")
        stmts.append(
            f"UPDATE {target} SET {all_set} FROM {staging} new "
            f"WHERE {on}{extra} AND ({ue_cond})"
        )
    insert_cols = [c for c in source_cols if c not in opts.insert_columns_to_ignore]
    insert_names = list(insert_cols)
    for c in opts.insert_values_override:
        if c not in insert_names:
            insert_names.append(c)
    values = ", ".join(opts.insert_values_override.get(c, f"new.{c}") for c in insert_names)
    exists_clause = " AND ".join(f"{target}.{k} = new.{k}" for k in pks)
    ins_cond = f" AND ({opts.insert_condition})" if opts.insert_condition else ""
    # The MERGE form treats additional_merge_predicate as part of the ON
    # clause, so a staged row whose PK exists but whose predicate fails is
    # NOT MATCHED and must be inserted (SCD2 insertNew of a new history
    # version). Mirror that here: the NOT EXISTS guard is PK equality AND
    # the additional predicate, not PK equality alone.
    stmts.append(
        f"INSERT INTO {target} ({', '.join(insert_names)}) "
        f"SELECT {values} FROM {staging} new "
        f"WHERE NOT EXISTS (SELECT 1 FROM {target} WHERE {exists_clause}{extra}){ins_cond}"
    )
    return stmts


def build_transactional_overwrite_sqls(target: str, staging: str) -> list[str]:
    """Temp-table swap (JdbcTableDataObject.scala:330-356): executed in one
    transaction so concurrent readers never observe an empty/partial table."""
    return [
        f"DELETE FROM {target}",
        f"INSERT INTO {target} SELECT * FROM {staging}",
        f"DROP TABLE {staging}",
    ]


@register_connection_type
class JdbcConnection:
    """Shared JDBC endpoint config (`connection/JdbcTableConnection.scala`):
    url + driver/auth options + optional DB-API executor, referenced by any
    number of JdbcTableDataObjects via `connectionId`."""

    def __init__(
        self,
        id: str,
        url: str,
        connection_options: dict | None = None,
        sql_executor: Callable[[str], Any] | None = None,
    ) -> None:
        self.id = id
        self.url = url
        self.connection_options = connection_options or {}
        self.sql_executor = sql_executor


@register_data_object_type
class JdbcTableDataObject(DataObject, CanCreateDataFrame, CanWriteDataFrame, CanMergeDataFrame):
    """JDBC table with predicate-pushdown reads, staged transactional
    overwrite and engine-side MERGE."""

    def __init__(
        self,
        id: str,
        url: str | None = None,
        table: Table | dict | None = None,
        connection_options: dict | None = None,
        sql_executor: Callable[[str], Any] | None = None,
        supports_merge_statement: bool = True,
        connection: JdbcConnection | None = None,
        **kwargs: Any,
    ) -> None:
        super().__init__(id=id, **kwargs)
        if table is None:
            raise ValueError(f"({id}) table is required")
        if isinstance(table, dict):
            table = Table.of(table)
        self.table = table
        if connection is not None:
            url = url or connection.url
            connection_options = {**connection.connection_options, **(connection_options or {})}
            sql_executor = sql_executor or connection.sql_executor
        if url is None:
            raise ValueError(f"({id}) url is required (directly or via connectionId)")
        self.url = url
        self.connection_options = connection_options or {}
        self.sql_executor = sql_executor
        self.supports_merge_statement = supports_merge_statement
        self.save_mode = SaveMode.OVERWRITE

    @property
    def primary_key(self) -> list[str]:
        if not self.table.primary_key:
            raise ValueError(f"({self.id}) primary key required for merge")
        return self.table.primary_key

    def _staging_name(self) -> str:
        return f"{self.table.full_name}_sdltmp"

    def _execute(self, sqls: list[str]) -> None:
        if self.sql_executor is None:
            raise RuntimeError(
                f"({self.id}) no sql_executor configured and no JDBC driver jar on the "
                "Spark classpath — cannot run transactional statements"
            )
        self.sql_executor("BEGIN TRANSACTION")
        try:
            for s in sqls:
                self.sql_executor(s)
            self.sql_executor("COMMIT")
        except Exception:
            self.sql_executor("ROLLBACK")
            raise

    def _reader(self, spark: SparkSession):
        reader = spark.read.format("jdbc").option("url", self.url).option("dbtable", self.table.full_name)
        for k, v in self.connection_options.items():
            reader = reader.option(k, v)
        return reader

    def get_dataframe(self, spark, partition_values=None):
        return self._reader(spark).load()

    def _stage(self, df: DataFrame, staging: str) -> None:
        """Distributed write of the source into the staging table (spark jdbc
        writer: executor-parallel, batched)."""
        writer = df.write.format("jdbc").option("url", self.url).option("dbtable", staging)
        for k, v in self.connection_options.items():
            writer = writer.option(k, v)
        writer.mode("overwrite").save()

    def write_dataframe(self, df, partition_values=None, save_mode=None, merge_options=None):
        mode = save_mode or self.save_mode
        if mode == SaveMode.MERGE:
            return self.merge_dataframe_by_primary_key(df, merge_options)
        if mode == SaveMode.OVERWRITE:
            staging = self._staging_name()
            self._stage(df, staging)
            self._execute(build_transactional_overwrite_sqls(self.table.full_name, staging))
            return {}
        writer = df.write.format("jdbc").option("url", self.url).option("dbtable", self.table.full_name)
        for k, v in self.connection_options.items():
            writer = writer.option(k, v)
        writer.mode("append").save()
        return {}

    def merge_dataframe_by_primary_key(self, df, merge_options=None):
        staging = self._staging_name()
        self._stage(df, staging)
        if self.supports_merge_statement:
            sqls = [build_merge_sql(self.table.full_name, staging, self.primary_key, df.columns, merge_options)]
        else:
            sqls = build_upsert_sqls(self.table.full_name, staging, self.primary_key, df.columns, merge_options)
        self._execute(sqls + ([f"DROP TABLE {staging}"] if self.supports_merge_statement else []))
        return {}
