"""Hive table write utilities with Tick-Tock alternating locations.

Rebuilds `util/hive/HiveUtil.scala` (writeDfToHive:213, writeDfToHiveWithTickTock:340,
alternatingTickTockLocation2:604, normalizePath:620) on the Spark session
catalog: external parquet tables whose LOCATION alternates between
`<base>/tick` and `<base>/tock` when a write must atomically replace the
whole table (unpartitioned rewrites, or schema evolution) — readers keep a
consistent old location until the catalog flips, which is the zero-downtime
answer for plain-parquet Hive tables (Delta/Iceberg replace this with real
ACID commits).

Decision table (HiveUtil.scala:388-393): tick-tock is performed when the
caller forces it, or when the table exists and is unpartitioned OR the
write evolves the schema; a partitioned same-schema write stays an
insert-overwrite into the CURRENT location (partition migration would copy
every untouched partition — wrong at 100 TB).
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession

TICK = "tick"
TOCK = "tock"


def normalize_path(path: str) -> str:
    """HiveUtil.normalizePath: backslashes to /, strip file: scheme, strip
    trailing separators, and point a trailing `tock` at `tick` so two
    alternating locations compare equal (ONLY the last path element)."""
    p = path.replace("\\", "/")
    p = re.sub(r"file:/+", "/", p)
    p = re.sub(r"/+", "/", p)
    p = re.sub(r"/+$", "", p)
    # only a LITERAL trailing tock path element — /warehouse/livestock must
    # not become /warehouse/livestick (r8 review)
    return re.sub(r"(^|/)tock$", r"\g<1>" + TICK, p)


def is_table_existing(spark: SparkSession, table_name: str) -> bool:
    return spark.catalog.tableExists(table_name)


def hive_table_location(spark: SparkSession, table_name: str) -> str:
    rows = spark.sql(f"DESCRIBE FORMATTED {table_name}").collect()
    for r in rows:
        if (r["col_name"] or "").strip() == "Location":
            return r["data_type"]
    raise ValueError(f"no Location in catalog for {table_name}")


def get_table_partitions(spark: SparkSession, table_name: str) -> list[dict]:
    """SHOW PARTITIONS parsed to [{col: value}] — raises AnalysisException
    for an unpartitioned table, like HiveUtil.getTablePartitions."""
    rows = spark.sql(f"SHOW PARTITIONS {table_name}").collect()
    out = []
    for r in rows:
        d = {}
        for piece in r[0].split("/"):
            k, _, v = piece.partition("=")
            d[k] = v
        out.append(d)
    return out


def get_current_ticktock_location_suffix(spark: SparkSession, table_name: str) -> str:
    # NOT normalize_path here — that rewrites tock->tick by design; the
    # suffix probe needs the raw location
    raw = hive_table_location(spark, table_name).rstrip("/")
    suffix = os.path.basename(raw)
    if suffix not in (TICK, TOCK):
        raise ValueError(f"table location {raw} doesn't use Tick-Tock")
    return suffix


def _alternate_ticktock_location(location: str) -> str:
    base, name = os.path.split(location.rstrip("/"))
    if name == TICK:
        return os.path.join(base, TOCK)
    if name == TOCK:
        return os.path.join(base, TICK)
    raise ValueError(f"table location {location} doesn't use Tick-Tock")


def _alternating_ticktock_location(spark, table_name: str, base_path: str) -> str:
    if is_table_existing(spark, table_name):
        return _alternate_ticktock_location(
            hive_table_location(spark, table_name).replace("file:", "")
        )
    return os.path.join(base_path, TICK)


def _schema_differs(spark, table_name: str, df: DataFrame) -> bool:
    existing = spark.table(table_name)
    old = [(f.name.lower(), f.dataType) for f in existing.schema.fields]
    new = [(f.name.lower(), f.dataType) for f in df.schema.fields]
    return sorted(old, key=lambda t: t[0]) != sorted(new, key=lambda t: t[0])


def _move_partition_cols_last(cols: list[str], partitions: list[str]) -> list[str]:
    return [c for c in cols if c not in partitions] + [p for p in partitions if p in cols]


def _create_at_location(
    df: DataFrame, table_name: str, location: str, partitions: list[str]
) -> None:
    spark = df.sparkSession
    loc = location.replace("file:", "")
    if os.path.isdir(loc):
        shutil.rmtree(loc)  # all data is rewritten when the table is created
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    writer = df.write.format("parquet").option("path", os.path.abspath(loc)).mode("overwrite")
    if partitions:
        writer = writer.partitionBy(*partitions)
    writer.saveAsTable(table_name)


def write_df_to_hive(
    df: DataFrame,
    output_path: str,
    table_name: str,
    partitions: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Plain (non-tick-tock) external-table write (HiveUtil.writeDfToHive):
    create at `output_path` on first write; same-schema rewrites insert into
    the existing definition; schema evolution recreates the table at its
    current location."""
    spark = df.sparkSession
    partitions = partitions or []
    missing = [p for p in partitions if p not in df.columns]
    if missing:
        raise ValueError(f"({table_name}) partition columns {missing} not in DataFrame")
    if not is_table_existing(spark, table_name):
        cols = _move_partition_cols_last(list(df.columns), partitions)
        _create_at_location(df.select(*cols), table_name, output_path, partitions)
        return
    if _schema_differs(spark, table_name, df):
        location = hive_table_location(spark, table_name).replace("file:", "")
        cols = _move_partition_cols_last(list(df.columns), partitions)
        _create_at_location(df.select(*cols), table_name, location, partitions)
        return
    existing_cols = spark.table(table_name).columns
    df.select(*existing_cols).write.mode(mode).insertInto(table_name)


def write_df_to_hive_with_ticktock(
    df: DataFrame,
    output_path: str,
    table_name: str,
    partitions: list[str] | None = None,
    mode: str = "overwrite",
    force_tick_tock: bool = False,
) -> None:
    """Tick-tock external-table write (HiveUtil.writeDfToHiveWithTickTock):
    when the write replaces the whole table (unpartitioned, or schema
    evolution), write to the ALTERNATE location and flip the catalog —
    readers of the old location are never mid-rewrite. Raises ValueError
    when the existing table's location carries no tick/tock suffix (it was
    not created tick-tock — HiveUtil.alternateTickTockLocation's
    IllegalArgumentException)."""
    spark = df.sparkSession
    partitions = partitions or []
    missing = [p for p in partitions if p not in df.columns]
    if missing:
        raise ValueError(f"({table_name}) partition columns {missing} not in DataFrame")
    exists = is_table_existing(spark, table_name)
    evolution = exists and _schema_differs(spark, table_name, df)
    # decision table (HiveUtil.scala:388-393); evolution implies do_ticktock
    # when the table exists, so the rewrite branch is exactly these two
    do_ticktock = force_tick_tock or ((not partitions or evolution) and exists)
    if not exists or do_ticktock:
        location = _alternating_ticktock_location(spark, table_name, output_path)
        cols = _move_partition_cols_last(list(df.columns), partitions)
        _create_at_location(df.select(*cols), table_name, location, partitions)
        return
    existing_cols = spark.table(table_name).columns
    df.select(*existing_cols).write.mode(mode).insertInto(table_name)
