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


class JdbcTransaction:
    """One pooled DB-API connection running inside an explicit transaction
    (JdbcTableConnection.scala JdbcTransaction): statements batch on the
    connection and become visible only at commit(); commit()/rollback()
    return the connection to the pool either way."""

    def __init__(self, pool: "JdbcConnection", con: Any) -> None:
        self._pool = pool
        self._con = con
        self._open = True
        try:
            con.execute("BEGIN TRANSACTION")
        except Exception:
            # dead handle: discard it (never idle a handle in unknown
            # transaction state) and free the capacity slot (r8 review)
            pool._discard(con)
            raise

    def execute(self, sql: str) -> Any:
        if not self._open:
            raise RuntimeError("transaction already closed")
        return self._con.execute(sql)

    def _finish(self, stmt: str) -> None:
        if not self._open:
            raise RuntimeError("transaction already closed")
        self._open = False
        try:
            self._con.execute(stmt)
        except Exception:
            # a failed COMMIT/ROLLBACK leaves the handle mid-transaction:
            # returning it would poison the pool (the next borrower's BEGIN
            # nests) — discard, but still free the slot (r8 review)
            self._pool._discard(self._con)
            raise
        self._pool._return(self._con)

    def commit(self) -> None:
        self._finish("COMMIT")

    def rollback(self) -> None:
        self._finish("ROLLBACK")


@register_connection_type
class JdbcConnection:
    """Shared JDBC endpoint config + connection pool
    (`connection/JdbcTableConnection.scala`): url + driver/auth options,
    referenced by any number of JdbcTableDataObjects via `connectionId`.

    Two executor styles, matching the transport split documented on
    JdbcTableDataObject: a plain `sql_executor` callable (one shared DB-API
    handle), or a `connection_factory` () -> DB-API connection, which
    enables the reference's pooled-transaction surface — autocommit is
    conceptually OFF (every statement runs inside an explicit BEGIN …
    COMMIT/ROLLBACK), `max_parallel_connections` bounds concurrent
    transactions with `max_wait_time_sec` borrow timeout, and
    `test_on_borrow`/`test_on_return` validate pooled handles with a probe
    query, discarding dead ones instead of handing them out
    (ConnectionPoolConfig)."""

    def __init__(
        self,
        id: str,
        url: str,
        connection_options: dict | None = None,
        sql_executor: Callable[[str], Any] | None = None,
        connection_factory: Callable[[], Any] | None = None,
        max_parallel_connections: int = 1,
        max_wait_time_sec: float = 10.0,
        test_on_borrow: bool = False,
        test_on_return: bool = False,
    ) -> None:
        import threading

        self.id = id
        self.url = url
        self.connection_options = connection_options or {}
        self.sql_executor = sql_executor
        self.connection_factory = connection_factory
        self.max_parallel_connections = max_parallel_connections
        self.max_wait_time_sec = max_wait_time_sec
        self.test_on_borrow = test_on_borrow
        self.test_on_return = test_on_return
        self._capacity = threading.Semaphore(max_parallel_connections)
        self._idle_lock = threading.Lock()
        self._idle: list[Any] = []

    # ------------------------------------------------------------ pool
    def _probe(self, con: Any) -> bool:
        try:
            con.execute("SELECT 1")
            return True
        except Exception:
            return False

    def _borrow(self) -> Any:
        if self.connection_factory is None:
            raise RuntimeError(
                f"({self.id}) pooled transactions need a connection_factory"
            )
        if not self._capacity.acquire(timeout=self.max_wait_time_sec):
            raise TimeoutError(
                f"({self.id}) no pooled connection available within "
                f"{self.max_wait_time_sec}s (max_parallel_connections="
                f"{self.max_parallel_connections})"
            )
        try:
            while True:
                with self._idle_lock:
                    con = self._idle.pop() if self._idle else None
                if con is None:
                    return self.connection_factory()
                if not self.test_on_borrow or self._probe(con):
                    return con
                # dead idle connection: close best-effort (don't leak the DB
                # handle/fd — r8 ADVICE), then try the next (or create fresh)
                self._close_quietly(con)
        except Exception:
            # factory failure must not leak the acquired capacity slot — a
            # transiently-down DB would otherwise exhaust the pool forever
            # (r8 review)
            self._capacity.release()
            raise

    @staticmethod
    def _close_quietly(con: Any) -> None:
        """Best-effort close of a handle being dropped from the pool, so
        dead connections free their DB handle/file descriptor instead of
        leaking until GC (every discard path routes through here)."""
        try:
            close = getattr(con, "close", None)
            if close is not None:
                close()
        except Exception:
            pass

    def _discard(self, con: Any) -> None:
        """Drop a handle in unknown state WITHOUT idling it; the capacity
        slot is freed so the pool can mint a replacement."""
        self._close_quietly(con)
        self._capacity.release()

    def _return(self, con: Any) -> None:
        try:
            if self.test_on_return and not self._probe(con):
                # discard dead handle (closed, not just dropped); capacity
                # still freed below
                self._close_quietly(con)
                return
            with self._idle_lock:
                self._idle.append(con)
        finally:
            self._capacity.release()

    # ------------------------------------------------------------ surface
    def begin_transaction(self) -> JdbcTransaction:
        return JdbcTransaction(self, self._borrow())

    def exec_with_connection(self, fn: Callable[[Any], Any]) -> Any:
        con = self._borrow()
        try:
            return fn(con)
        finally:
            self._return(con)

    def exec_statement(self, sql: str) -> None:
        tx = self.begin_transaction()
        try:
            tx.execute(sql)
        except Exception:
            tx.rollback()
            raise
        tx.commit()

    def exec_query(self, sql: str) -> list:
        return self.exec_with_connection(lambda con: list(con.execute(sql).fetchall()))


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
        sql_query: Callable[[str], list] | None = None,
        supports_merge_statement: bool = True,
        connection: JdbcConnection | None = None,
        pre_read_sql: str | None = None,
        post_read_sql: str | None = None,
        pre_write_sql: str | None = None,
        post_write_sql: str | None = None,
        partitions: list[str] | None = None,
        virtual_partitions: bool = False,
        incremental_output_expr: str | None = None,
        direct_table_overwrite: bool = False,
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
            if sql_executor is None and connection.connection_factory is not None:
                # pooled transport: statements run through pooled explicit
                # transactions, queries through borrowed handles
                sql_executor = connection.exec_statement
                if sql_query is None:
                    sql_query = connection.exec_query
        self._pool = (
            connection
            if connection is not None and connection.connection_factory is not None
            else None
        )
        if url is None:
            raise ValueError(f"({id}) url is required (directly or via connectionId)")
        self.url = url
        self.connection_options = connection_options or {}
        self.sql_executor = sql_executor
        self.sql_query = sql_query
        self.supports_merge_statement = supports_merge_statement
        # engine-side hook statements around read/write
        # (JdbcTableDataObject.scala preReadSql/postReadSql/pre/postWriteSql)
        self.pre_read_sql = pre_read_sql
        self.post_read_sql = post_read_sql
        self.pre_write_sql = pre_write_sql
        self.post_write_sql = post_write_sql
        # VIRTUAL partitions: JDBC tables have no physical layout — partition
        # listing is a SELECT DISTINCT over the partition columns
        # (JdbcTableDataObject.scala virtualPartitions)
        self.partitions = partitions or []
        self.virtual_partitions = virtual_partitions or bool(partitions)
        # incremental output: compare-column high-watermark
        # (JdbcTableDataObject.scala incrementalOutputExpr)
        self.incremental_output_expr = incremental_output_expr
        self._incremental_state: Any = None
        # kept for config parity: overwrite is ALWAYS transactional
        # delete+insert on the existing target here (see write_dataframe)
        self.direct_table_overwrite = direct_table_overwrite
        self.save_mode = SaveMode.OVERWRITE

    # ------------------------------------------------------------- utilities
    def _query(self, sql: str) -> list:
        """Run a result-returning statement through sql_query, falling back
        to sql_executor + fetchall (DB-API cursors support it)."""
        if self.sql_query is not None:
            return list(self.sql_query(sql))
        if self.sql_executor is None:
            raise RuntimeError(f"({self.id}) no sql_query/sql_executor configured")
        result = self.sql_executor(sql)
        fetch = getattr(result, "fetchall", None)
        if fetch is None:
            raise RuntimeError(f"({self.id}) sql_executor result has no fetchall for {sql!r}")
        return list(fetch())

    @staticmethod
    def _quote_literal(value: Any) -> str:
        """SQL string literal with embedded quotes doubled (ANSI escaping).
        Partition values flow into DELETE predicates and ANALYZE specs as
        literals; a value containing a single quote must not be able to
        break or redirect the statement (driver-ADVICE r7, injection-shaped)."""
        return "'" + str(value).replace("'", "''") + "'"

    def _run_hook(self, name: str, sql: str | None) -> None:
        """Execute a configured pre/post SQL hook with a clear error when no
        executor is wired, instead of an opaque TypeError (driver-ADVICE r7)."""
        if not sql:
            return
        if self.sql_executor is None:
            raise RuntimeError(
                f"({self.id}) {name} is configured but no sql_executor is set — "
                "hook statements need a DB-API executor (sql_query alone can't run them)"
            )
        self.sql_executor(sql)

    @staticmethod
    def _quote_ident(name: str) -> str:
        """Quote an identifier when it is not a plain lowercase/uppercase
        word (JdbcCatalog quoteCaseSensitiveColumn)."""
        import re as _re

        if _re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", name) and (name.islower() or name.isupper()):
            return name
        return '"' + name.replace('"', '""') + '"'

    def is_table_existing(self, spark: SparkSession | None = None) -> bool:
        """True for TABLES AND VIEWS — probed with a zero-row select, which
        any engine resolves for both object kinds
        (JdbcTableDataObjectTest:123). The probe goes through sql_executor
        directly (no fetchall needed) so executors that return nothing still
        work; only the statement FAILING marks the table as absent."""
        if self.sql_executor is None:
            raise RuntimeError(f"({self.id}) existence probe needs a sql_executor")
        try:
            self.sql_executor(f"SELECT 1 FROM {self.table.full_name} WHERE 1=0")
            return True
        except Exception:
            # engines raise engine-specific errors for unknown relations;
            # a transient connection failure also lands here — callers on
            # flaky links should probe via information_schema with sql_query
            return False

    def list_partitions(self, spark: SparkSession | None = None) -> list:
        from smart_data_lake_spark.partitions import PartitionValues

        if not self.partitions:
            return []
        cols = ", ".join(self._quote_ident(c) for c in self.partitions)
        rows = self._query(
            f"SELECT DISTINCT {cols} FROM {self.table.full_name} ORDER BY {cols}"
        )
        return [
            PartitionValues.of(dict(zip(self.partitions, [str(v) for v in r]))) for r in rows
        ]

    # ------------------------------------------------------------ incremental
    def set_state(self, state: Any) -> None:
        self._incremental_state = state

    def get_state(self) -> Any:
        if self.incremental_output_expr is None:
            return self._incremental_state
        rows = self._query(
            f"SELECT MAX({self.incremental_output_expr}) FROM {self.table.full_name}"
        )
        # MAX over an empty table yields a (None,) row — a non-empty tuple, so
        # a truthiness check on rows[0] would wrongly return None and discard
        # the persisted watermark, forcing a full re-read (driver-ADVICE r7).
        v = rows[0][0] if rows else None
        return v if v is not None else self._incremental_state

    @property
    def primary_key(self) -> list[str]:
        if not self.table.primary_key:
            raise ValueError(f"({self.id}) primary key required for merge")
        return self.table.primary_key

    def _staging_name(self) -> str:
        return f"{self.table.full_name}_sdltmp"

    def _execute(self, sqls: list[str]) -> None:
        if self._pool is not None:
            # pooled transport: the statement batch IS one pooled transaction
            tx = self._pool.begin_transaction()
            try:
                for s in sqls:
                    tx.execute(s)
            except Exception:
                tx.rollback()
                raise
            tx.commit()
            return
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

    def _load(self, spark: SparkSession) -> DataFrame:
        """Engine read — overridable seam (test doubles swap the transport,
        the surrounding read semantics stay in get_dataframe)."""
        return self._reader(spark).load()

    def get_dataframe(self, spark, partition_values=None):
        self._run_hook("pre_read_sql", self.pre_read_sql)
        df = self._load(spark)
        if self.incremental_output_expr and self._incremental_state is not None:
            from pyspark.sql import functions as F

            df = df.where(F.expr(self.incremental_output_expr) > F.lit(self._incremental_state))
        if partition_values:
            from smart_data_lake_spark.partitions import apply_partition_filter

            df = apply_partition_filter(df, partition_values)
        # post_read_sql is NOT run here: the frame is lazy, so a hook like
        # "DELETE processed rows" would fire before Spark reads anything.
        # The action layer invokes post_read() after the exec write completes.
        return df

    def post_read(self, spark: SparkSession, partition_values: list) -> None:
        """postReadSql lifecycle — runs once the read has actually been
        consumed (called by the action layer after exec)."""
        self._run_hook("post_read_sql", self.post_read_sql)

    def _target_columns(self) -> list[str] | None:
        """Column names of the existing target table (zero-row probe), used
        to realign a differently-ordered source by NAME before the
        position-based engine insert (JdbcTableDataObjectTest:280)."""
        if self.sql_query is None and self.sql_executor is None:
            return None
        try:
            if self.sql_executor is not None:
                cur = self.sql_executor(f"SELECT * FROM {self.table.full_name} WHERE 1=0")
                desc = getattr(cur, "description", None)
                if desc:
                    return [d[0] for d in desc]
        except Exception:
            return None
        return None

    def _align_columns(self, df: DataFrame) -> DataFrame:
        target_cols = self._target_columns()
        if not target_cols:
            return df
        lower = {c.lower(): c for c in df.columns}
        if set(lower) != {c.lower() for c in target_cols}:
            return df  # schema evolution path handles mismatches
        return df.select(*[lower[c.lower()] for c in target_cols])

    def _stage(self, df: DataFrame, staging: str) -> None:
        """Distributed write of the source into the staging table (spark jdbc
        writer: executor-parallel, batched)."""
        writer = df.write.format("jdbc").option("url", self.url).option("dbtable", staging)
        for k, v in self.connection_options.items():
            writer = writer.option(k, v)
        writer.mode("overwrite").save()

    def write_dataframe(self, df, partition_values=None, save_mode=None, merge_options=None):
        mode = save_mode or self.save_mode
        self._run_hook("pre_write_sql", self.pre_write_sql)
        try:
            df = self._align_columns(df)
            if mode == SaveMode.MERGE:
                return self.merge_dataframe_by_primary_key(df, merge_options)
            if mode == SaveMode.OVERWRITE:
                staging = self._staging_name()
                self._stage(df, staging)
                if not self.is_table_existing():
                    # first write: the staging copy simply becomes the table
                    self._execute(
                        [
                            f"CREATE TABLE {self.table.full_name} AS SELECT * FROM {staging}",
                            f"DROP TABLE {staging}",
                        ]
                    )
                elif self.partitions and partition_values:
                    # partition-scoped overwrite: delete ONLY the declared
                    # virtual partitions, never the whole table — mirrors the
                    # file layer's declared-partition semantics
                    preds = " OR ".join(
                        "("
                        + " AND ".join(
                            f"{self._quote_ident(k)} = {self._quote_literal(v)}" for k, v in pv.as_dict.items()
                        )
                        + ")"
                        for pv in partition_values
                    )
                    self._execute(
                        [
                            f"DELETE FROM {self.table.full_name} WHERE {preds}",
                            f"INSERT INTO {self.table.full_name} SELECT * FROM {staging}",
                            f"DROP TABLE {staging}",
                        ]
                    )
                else:
                    # delete+insert in ONE transaction: the target object is
                    # never dropped, so grants/indexes/views on it survive —
                    # this IS the directTableOverwrite contract
                    # (JdbcTableDataObjectTest:294); concurrent readers never
                    # observe a partial table
                    self._execute(build_transactional_overwrite_sqls(self.table.full_name, staging))
                return {}
            writer = df.write.format("jdbc").option("url", self.url).option("dbtable", self.table.full_name)
            for k, v in self.connection_options.items():
                writer = writer.option(k, v)
            writer.mode("append").save()
            return {}
        finally:
            self._run_hook("post_write_sql", self.post_write_sql)

    _SQL_TYPES = {
        "string": "VARCHAR",
        "int": "INTEGER",
        "bigint": "BIGINT",
        "double": "DOUBLE",
        "float": "REAL",
        "boolean": "BOOLEAN",
        "date": "DATE",
        "timestamp": "TIMESTAMP",
    }

    def evolve_schema_for(self, df: DataFrame) -> list[str]:
        """ALTER TABLE ADD COLUMN statements for source columns the target
        lacks (merge + schema evolution, JdbcTableDataObjectTest:215).
        Pure metadata DDL — no data movement."""
        target_cols = self._target_columns()
        if not target_cols:
            return []
        existing = {c.lower() for c in target_cols}
        stmts = []
        for f in df.schema.fields:
            if f.name.lower() not in existing:
                sql_type = self._SQL_TYPES.get(f.dataType.simpleString(), "VARCHAR")
                stmts.append(
                    f"ALTER TABLE {self.table.full_name} ADD COLUMN "
                    f"{self._quote_ident(f.name)} {sql_type}"
                )
        return stmts

    def merge_dataframe_by_primary_key(self, df, merge_options=None, allow_schema_evolution: bool = False):
        staging = self._staging_name()
        self._stage(df, staging)
        if allow_schema_evolution:
            for stmt in self.evolve_schema_for(df):
                self.sql_executor(stmt)
        if self.supports_merge_statement:
            sqls = [build_merge_sql(self.table.full_name, staging, self.primary_key, df.columns, merge_options)]
        else:
            sqls = build_upsert_sqls(self.table.full_name, staging, self.primary_key, df.columns, merge_options)
        self._execute(sqls + ([f"DROP TABLE {staging}"] if self.supports_merge_statement else []))
        return {}
