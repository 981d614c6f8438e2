"""SnowflakeTableDataObject: option mapping, generated-SQL semantics (vs
DuckDB), gating, save-mode contract. Reference:
`sdl-snowflake/.../SnowflakeTableDataObject.scala:70-180`."""

from __future__ import annotations

import duckdb
import pytest

from smart_data_lake_spark.config import load_config
from smart_data_lake_spark.dataobjects import SnowflakeConnection, SnowflakeTableDataObject
from smart_data_lake_spark.partitions import PartitionValues


def _conn(**kw):
    return SnowflakeConnection(
        id="sf", url="acct.snowflakecomputing.com", warehouse="WH", database="DB",
        user="u", password="p", role="R", **kw,
    )


def test_auth_option_mapping():
    opts = _conn().auth_options("PUBLIC")
    assert opts == {
        "sfURL": "acct.snowflakecomputing.com", "sfWarehouse": "WH", "sfDatabase": "DB",
        "sfSchema": "PUBLIC", "sfUser": "u", "sfPassword": "p", "sfRole": "R",
    }


def test_reader_options_dbtable_vs_query():
    do = SnowflakeTableDataObject(id="t", table={"name": "orders", "db": "PUBLIC"}, connection=_conn())
    assert do._reader_options()["dbtable"] == "DB.PUBLIC.orders"
    q = SnowflakeTableDataObject(
        id="q", table={"name": "x", "db": "PUBLIC"}, connection=_conn(),
        query="SELECT 1 AS one",
    )
    assert q._reader_options()["query"] == "SELECT 1 AS one"
    assert "dbtable" not in q._reader_options()


def test_delete_partitions_sql_semantics_on_duckdb():
    """The generated DELETE runs against a real engine and removes exactly
    the selected virtual partitions."""
    con = duckdb.connect()
    con.execute("CREATE SCHEMA IF NOT EXISTS PUBLIC")
    con.execute("ATTACH ':memory:' AS DB"); con.execute("CREATE SCHEMA DB.PUBLIC")
    con.execute("CREATE TABLE DB.PUBLIC.sales(region VARCHAR, yr INT, amt INT)")
    con.execute("INSERT INTO DB.PUBLIC.sales VALUES ('eu',2023,1),('eu',2024,2),('us',2024,3),('us',2023,4)")
    do = SnowflakeTableDataObject(
        id="s", table={"name": "sales", "db": "PUBLIC"},
        connection=_conn(sql_executor=con.execute),
        virtual_partitions=["region", "yr"],
    )
    sql = do.delete_partitions_sql([PartitionValues.of({"region": "eu", "yr": 2024}),
                                    PartitionValues.of({"region": "us", "yr": 2023})])
    do.connection.exec_statement(sql)
    left = con.execute("SELECT region, yr FROM DB.PUBLIC.sales ORDER BY 1,2").fetchall()
    assert left == [("eu", 2023), ("us", 2024)]


def test_gated_io_names_connector(spark):
    do = SnowflakeTableDataObject(id="t", table={"name": "t", "db": "PUBLIC"}, connection=_conn())
    with pytest.raises(RuntimeError, match="net.snowflake.spark.snowflake"):
        do.get_dataframe(spark)


def test_save_mode_contract(spark):
    with pytest.raises(ValueError, match="Unsupported saveMode"):
        SnowflakeTableDataObject(
            id="t", table={"name": "t", "db": "PUBLIC"}, connection=_conn(), save_mode="merge",
        )
    do = SnowflakeTableDataObject(id="t", table={"name": "t", "db": "PUBLIC"}, connection=_conn())
    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError, match="Merge not implemented"):
        do.write_dataframe(df, save_mode="merge")
    with pytest.raises(ValueError, match="schema name"):
        SnowflakeTableDataObject(id="x", table={"name": "t"}, connection=_conn())


def test_config_driven_with_connection_and_secret(monkeypatch):
    monkeypatch.setenv("SF_PW", "sec")
    registry = load_config({
        "connections": {
            "sf": {"type": "SnowflakeConnection", "url": "a.snowflakecomputing.com",
                    "warehouse": "WH", "database": "DB", "user": "u", "password": "ENV#SF_PW"},
        },
        "dataObjects": {
            "t": {"type": "SnowflakeTableDataObject", "connectionId": "sf",
                   "table": {"name": "orders", "db": "PUBLIC"}, "comment": "graded"},
        },
    })
    do = registry.get_data_object("t")
    assert do.connection.password == "sec"
    assert do.comment_sql() == "comment on table DB.PUBLIC.orders is 'graded'"


def test_delete_partitions_sql_escapes_quotes():
    do = SnowflakeTableDataObject(
        id="s", table={"name": "t", "db": "PUBLIC"}, connection=_conn(),
        virtual_partitions=["region"],
    )
    sql = do.delete_partitions_sql([PartitionValues.of({"region": "l'est"})])
    assert "region = 'l''est'" in sql


def test_write_probe_precedes_destructive_delete(spark):
    """Without the connector, partition-overwrite must fail BEFORE the
    DELETE statement runs (the delete-then-append pair is not transactional)."""
    executed = []
    do = SnowflakeTableDataObject(
        id="s", table={"name": "t", "db": "PUBLIC"},
        connection=_conn(sql_executor=executed.append),
        virtual_partitions=["region"],
    )
    df = spark.createDataFrame([("eu", 1)], "region string, v int")
    with pytest.raises(RuntimeError, match="net.snowflake.spark.snowflake"):
        do.write_dataframe(df, partition_values=[PartitionValues.of({"region": "eu"})],
                           save_mode="overwrite")
    assert executed == []  # no DELETE reached the warehouse
