"""Regression tests for the round-7 driver-ADVICE findings (fixed round 8).

Each test pins one concrete failure mode the advisor identified:
quote-unsafe partition literals in generated SQL, a watermark silently
discarded on empty tables, opaque hook failures, unpackaged zip output for
partitioned objects, and null-shifted corrupt-record reconstruction.
"""

from __future__ import annotations

import os
import zipfile

import duckdb
import pytest
from pyspark.sql import functions as F

from smart_data_lake_spark.dataobjects.file import (
    CsvFileDataObject,
    RelaxedCsvFileDataObject,
)
from smart_data_lake_spark.dataobjects.jdbc import JdbcTableDataObject
from smart_data_lake_spark.partitions import PartitionValues
from smart_data_lake_spark.save_modes import SaveMode
from tests.jdbc_double import DuckDbJdbcTableDataObject


@pytest.fixture()
def ddb():
    con = duckdb.connect()
    yield con
    con.close()


def test_jdbc_partition_literal_with_quote_is_escaped(spark, ddb):
    """ADVICE r7 (medium): a partition value containing a single quote must
    not break the generated DELETE predicate or change which rows it hits."""
    do = DuckDbJdbcTableDataObject(
        id="q", con=ddb, table={"name": "qtab"}, partitions=["name"]
    )
    df = spark.createDataFrame(
        [("o'brien", 1), ("smith", 2)], "name string, v int"
    )
    do.write_dataframe(df)
    # partition-scoped overwrite of ONLY the quoted partition
    df2 = spark.createDataFrame([("o'brien", 99)], "name string, v int")
    do.write_dataframe(
        df2,
        partition_values=[PartitionValues.of({"name": "o'brien"})],
        save_mode=SaveMode.OVERWRITE,
    )
    got = {tuple(r) for r in ddb.execute("SELECT name, v FROM qtab ORDER BY name").fetchall()}
    assert got == {("o'brien", 99), ("smith", 2)}


def test_jdbc_get_state_empty_table_keeps_watermark(spark, ddb):
    """ADVICE r7 (low): MAX() over an empty table returns a (None,) row;
    get_state must fall back to the persisted watermark, not return None
    (which would silently force a full re-read)."""
    ddb.execute("CREATE TABLE wm (id INTEGER)")
    do = DuckDbJdbcTableDataObject(
        id="wm", con=ddb, table={"name": "wm"}, incremental_output_expr="id"
    )
    do.set_state(41)
    assert do.get_state() == 41
    # once data exists, the live MAX wins
    ddb.execute("INSERT INTO wm VALUES (7)")
    assert do.get_state() == 7


def test_jdbc_hook_without_executor_raises_clear_error():
    """ADVICE r7 (low): a configured pre_read_sql with no sql_executor must
    raise a configuration error naming the hook, not an opaque TypeError."""
    do = JdbcTableDataObject(
        id="h",
        url="jdbc:duckdb:memory",
        table={"name": "htab"},
        pre_read_sql="DELETE FROM staging_flag",
    )
    with pytest.raises(RuntimeError, match="pre_read_sql"):
        do.get_dataframe(spark=None)


def test_zip_output_files_partitioned(spark, tmp_path):
    """ADVICE r7 (low): zip packaging for a PARTITIONED object must package
    the task files inside each col=val/ directory (one archive per partition
    dir), like the non-zip rename path does."""
    do = CsvFileDataObject(
        id="zp",
        path=str(tmp_path / "zp"),
        partitions=["p"],
        options={"header": "true", "compression": "zip"},
        n_files_per_partition=1,
        filename="data.csv.zip",
    )
    df = spark.createDataFrame([("a", 1), ("b", 2)], "p string, v int")
    do.write_dataframe(df)
    for part in ("p=a", "p=b"):
        d = os.path.join(do.path, part)
        archive = os.path.join(d, "data.csv.zip")
        assert os.path.isfile(archive), f"missing archive in {part}"
        assert not [f for f in os.listdir(d) if f.startswith("part-")], (
            f"raw part files left unpackaged in {part}"
        )
        with zipfile.ZipFile(archive) as zf:
            text = zf.read(zf.namelist()[0]).decode()
        assert text.splitlines()[0] == "v"


def test_corrupt_record_raw_preserves_null_fields(spark, tmp_path):
    """ADVICE r7 (low): the reconstructed _corrupt_record line must keep
    field POSITIONS when a field is null — concat_ws alone silently drops
    nulls and shifts the remaining fields left."""
    d = tmp_path / "cr"
    d.mkdir()
    # deviating file (missing h3) with a null (empty) second field: the raw
    # line is "B," and must round-trip as exactly that, not "B"
    (d / "b.csv").write_text("h1,h2\nB,\n")
    do = RelaxedCsvFileDataObject(
        id="t",
        path=str(d),
        schema="h1 string, h2 string, h3 string, _corrupt_record string, _corrupt_record_msg string",
        treat_missing_columns_as_corrupt=True,
    )
    rows = do.get_dataframe(spark).collect()
    assert len(rows) == 1
    assert rows[0]["_corrupt_record"] == "B,"
