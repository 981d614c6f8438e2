"""DuckDB-backed contract double for JdbcTableDataObject.

Same pattern as tests/delta_double.py: the PRODUCT class's semantics
(staged transactional overwrite, merge/upsert SQL, pre/post hooks, virtual
partitions, incremental high-watermark, column realignment, schema
evolution) run for real against an embedded SQL engine; only the transport
seams (`_stage`, `_load`) are swapped, because no JDBC driver jar exists in
this container for Spark's jdbc format to use.
"""

from __future__ import annotations

from smart_data_lake_spark.dataobjects.jdbc import JdbcTableDataObject


class DuckDbJdbcTableDataObject(JdbcTableDataObject):
    def __init__(self, id: str, con, table, **kw):
        kw.setdefault("supports_merge_statement", False)  # duckdb: upsert path
        super().__init__(
            id=id,
            url="jdbc:duckdb:memory",
            table=table,
            sql_executor=con.execute,
            sql_query=lambda s: con.execute(s).fetchall(),
            **kw,
        )
        self._con = con

    def _stage(self, df, staging):
        pdf = df.toPandas()
        self._con.register("sdl_stage_src", pdf)
        self._con.execute(f"CREATE OR REPLACE TABLE {staging} AS SELECT * FROM sdl_stage_src")
        self._con.unregister("sdl_stage_src")

    def _load(self, spark):
        pdf = self._con.execute(f"SELECT * FROM {self.table.full_name}").fetchdf()
        return spark.createDataFrame(pdf)
