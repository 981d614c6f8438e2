"""Scenario parity for the reference DataObject test suites.

Twins for every `test("...")` in:
- `workflow/dataobject/SparkFileDataObjectTest.scala:40-470` (15 scenarios)
- `workflow/dataobject/CsvFileDataObjectTest.scala:41-335` (12 scenarios)
- the shared `SparkFileDataObjectSchemaBehavior.scala` behaviors
  (readNonExistingSources, readEmptySources, validateSchemaMin on read/write)

Each test's docstring names the reference scenario it mirrors.
"""

import os
import zipfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from smart_data_lake_spark.dataobjects.file import (
    CsvFileDataObject,
    JsonFileDataObject,
    ParquetFileDataObject,
    ProcessingLogicError,
    RawFileDataObject,
)
from smart_data_lake_spark.dataobjects.base import SchemaViolationError
from smart_data_lake_spark.partitions import PartitionValues
from smart_data_lake_spark.save_modes import SaveMode

pv = PartitionValues.of


# --------------------------------------------------------------------------
# SparkFileDataObjectTest.scala
# --------------------------------------------------------------------------


def _csv_do(tmp_path, name="t", **kw):
    kw.setdefault("options", {"header": "true"})
    return CsvFileDataObject(id=name, path=str(tmp_path / name), **kw)


def test_overwrite_only_one_partition(spark, tmp_path):
    """SparkFileDataObjectTest:40 — writing pv=[B] replaces B, keeps A."""
    do = _csv_do(tmp_path, partitions=["p"])
    df1 = spark.createDataFrame([("A", 1), ("A", 2), ("B", 3), ("B", 4)], "p string, value int")
    do.write_dataframe(df1, [pv({"p": "A"}), pv({"p": "B"})])
    assert do.get_dataframe(spark).count() == 4
    assert {str(x.as_dict) for x in do.list_partitions(spark)} == {
        str({"p": "A"}),
        str({"p": "B"}),
    }
    df2 = spark.createDataFrame([("B", 5)], "p string, value int")
    do.write_dataframe(df2, [pv({"p": "B"})])
    assert do.get_dataframe(spark).count() == 3
    assert len(do.list_partitions(spark)) == 2


def test_create_and_list_partition_one_level(spark, tmp_path):
    """SparkFileDataObjectTest:67 — listPartitions returns written pvs."""
    do = _csv_do(tmp_path, partitions=["p"])
    df = spark.createDataFrame([("A", 1), ("B", 2)], "p string, value int")
    do.write_dataframe(df, [pv({"p": "A"}), pv({"p": "B"})])
    listed = {tuple(sorted(x.as_dict.items())) for x in do.list_partitions(spark)}
    assert listed == {(("p", "A"),), (("p", "B"),)}


def test_create_and_list_partition_multi_level(spark, tmp_path):
    """SparkFileDataObjectTest:84 — two-level partition listing."""
    do = _csv_do(tmp_path, partitions=["p1", "p2"])
    df = spark.createDataFrame(
        [("A", "L2A", 1), ("A", "L2B", 2), ("B", "L2B", 3), ("B", "L2C", 4)],
        "p1 string, p2 string, value int",
    )
    pvs = [
        pv({"p1": "A", "p2": "L2A"}),
        pv({"p1": "A", "p2": "L2B"}),
        pv({"p1": "B", "p2": "L2B"}),
        pv({"p1": "B", "p2": "L2C"}),
    ]
    do.write_dataframe(df, pvs)
    listed = {tuple(sorted(x.as_dict.items())) for x in do.list_partitions(spark)}
    assert listed == {tuple(sorted(x.as_dict.items())) for x in pvs}


def test_create_empty_partition(spark, tmp_path):
    """SparkFileDataObjectTest:102 — a declared pv with no rows is still
    materialized and listed."""
    do = _csv_do(tmp_path, partitions=["p1", "p2"])
    df = spark.createDataFrame([("A", "L2A", 1)], "p1 string, p2 string, value int")
    pvs = [pv({"p1": "A", "p2": "L2A"}), pv({"p1": "X", "p2": "L2X"})]
    do.write_dataframe(df, pvs)
    listed = {tuple(sorted(x.as_dict.items())) for x in do.list_partitions(spark)}
    assert listed == {tuple(sorted(x.as_dict.items())) for x in pvs}


def test_read_partitioned_and_filter_expected_partitions(spark, tmp_path):
    """SparkFileDataObjectTest:119 — partition-filtered reads +
    filterExpectedPartitionValues on the elements map."""
    do = _csv_do(
        tmp_path, partitions=["p"], expected_partitions_condition="elements['p'] != 'A'"
    )
    df1 = spark.createDataFrame([("A", 1), ("A", 2), ("B", 3), ("B", 4)], "p string, value int")
    created = [pv({"p": "A"}), pv({"p": "B"})]
    do.write_dataframe(df1, created)
    assert do.get_dataframe(spark).count() == 4
    assert do.get_dataframe(spark, [pv({"p": "B"})]).count() == 2
    assert do.get_dataframe(spark, [pv({"p": "A"}), pv({"p": "B"})]).count() == 4
    expected = do.filter_expected_partition_values(spark, created)
    assert [x.as_dict for x in expected] == [{"p": "B"}]


def test_overwrite_partitioned_data(spark, tmp_path):
    """SparkFileDataObjectTest:140 — declared pv with no data is emptied but
    stays listed; undeclared partition A untouched."""
    do = _csv_do(tmp_path, partitions=["p"])
    df1 = spark.createDataFrame(
        [("A", 1), ("A", 2), ("B", 3), ("B", 4), ("C", 5), ("C", 6)], "p string, value int"
    )
    do.write_dataframe(df1, [pv({"p": "A"}), pv({"p": "B"})])
    df2 = spark.createDataFrame([("B", 7), ("B", 8)], "p string, value int")
    do.write_dataframe(df2, [pv({"p": "B"}), pv({"p": "C"})])
    rows = sorted(
        (r["p"], int(r["value"])) for r in do.get_dataframe(spark).collect()
    )
    assert rows == [("A", 1), ("A", 2), ("B", 7), ("B", 8)]
    assert sorted(x.as_dict["p"] for x in do.list_partitions(spark)) == ["A", "B", "C"]


def test_overwrite_all(spark, tmp_path):
    """SparkFileDataObjectTest:167 — unpartitioned overwrite replaces all."""
    do = _csv_do(tmp_path)
    do.write_dataframe(spark.createDataFrame([("A", 1), ("A", 2)], "p string, value int"))
    do.write_dataframe(spark.createDataFrame([("B", 3), ("B", 4)], "p string, value int"))
    rows = sorted((r["p"], int(r["value"])) for r in do.get_dataframe(spark).collect())
    assert rows == [("B", 3), ("B", 4)]


def test_overwrite_all_preserve_directory(spark, tmp_path):
    """SparkFileDataObjectTest:214 — OverwritePreserveDirectories empties
    files but keeps the directory object (ACLs/mounts survive)."""
    do = _csv_do(tmp_path, save_mode=SaveMode.OVERWRITE_PRESERVE_DIRECTORIES)
    do.write_dataframe(spark.createDataFrame([("A", 1), ("A", 2)], "p string, value int"))
    root_inode = os.stat(do.path).st_ino
    do.write_dataframe(spark.createDataFrame([("B", 3), ("B", 4)], "p string, value int"))
    rows = sorted((r["p"], int(r["value"])) for r in do.get_dataframe(spark).collect())
    assert rows == [("B", 3), ("B", 4)]
    assert os.stat(do.path).st_ino == root_inode  # directory not recreated


def test_append_filename_column(spark, tmp_path):
    """SparkFileDataObjectTest:237 — filenameColumn appended on read, and the
    frame can be written back after dropping it."""
    src = tmp_path / "src"
    src.mkdir()
    (src / "people.csv").write_text("name,age\nann,33\nbob,44\n")
    do = CsvFileDataObject(
        id="src1",
        path=str(src),
        options={"header": "true"},
        filename_column="_sourcefile",
        schema="name string, age string",
    )
    df = do.get_dataframe(spark)
    assert "_sourcefile" in df.columns
    assert df.select("_sourcefile").first()[0].endswith("people.csv")
    do.init_write(df.drop("_sourcefile"))  # must not raise


def test_get_concrete_paths(tmp_path):
    """SparkFileDataObjectTest:266 — init paths stop at the deepest given
    partition key (wildcarding earlier absent ones); full paths expand to
    full depth; returnFiles applies the fileName glob."""
    base = tmp_path / "concrete"
    for a in (1, 2):
        for b in (1, 2, 3):
            for c in (1, 2):
                (base / f"a={a}" / f"b={b}" / f"c={c}").mkdir(parents=True)
    (base / "a=1" / "b=1" / "c=1" / "abc.test").touch()
    (base / "a=2" / "b=3" / "c=2" / "abc.test").touch()
    # the reference fixture omits a=2/b=3... it creates a=2/b=3/c=1 and c=2;
    # ours creates the full grid which only widens full-path expectations
    do = RawFileDataObject(id="t", path=str(base), partitions=["a", "b", "c"], file_name="*.test")

    def rel(paths):
        return {os.path.relpath(p, str(base)) for p in paths}

    assert rel(do.get_concrete_init_paths(pv({"a": 1}))) == {"a=1"}
    assert rel(do.get_concrete_init_paths(pv({"a": 1, "b": 1}))) == {"a=1/b=1"}
    assert rel(do.get_concrete_init_paths(pv({"a": 1, "b": 1, "c": 1}))) == {"a=1/b=1/c=1"}
    assert rel(do.get_concrete_init_paths(pv({"b": 1}))) == {"a=1/b=1", "a=2/b=1"}
    assert rel(do.get_concrete_init_paths(pv({"c": 1}))) == {
        f"a={a}/b={b}/c=1" for a in (1, 2) for b in (1, 2, 3)
    }
    assert rel(do.get_concrete_init_paths(pv({"b": 1, "c": 1}))) == {"a=1/b=1/c=1", "a=2/b=1/c=1"}
    assert rel(do.get_concrete_full_paths(pv({"b": 1}))) == {
        f"a={a}/b=1/c={c}" for a in (1, 2) for c in (1, 2)
    }
    assert rel(do.get_concrete_full_paths(pv({"b": 1, "c": 1}))) == {"a=1/b=1/c=1", "a=2/b=1/c=1"}
    assert rel(do.get_concrete_full_paths(pv({"b": 1}), return_files=True)) == {
        "a=1/b=1/c=1/abc.test"
    }


def test_delete_files_only(spark, tmp_path):
    """SparkFileDataObjectTest:307 — deletePartitionsFiles / deleteAllFiles
    remove files but keep the directory tree."""
    do = _csv_do(tmp_path, partitions=["p"])
    do.write_dataframe(spark.createDataFrame([("A", 1), ("A", 2)], "p string, value int"))
    part_dir = os.path.join(do.path, "p=A")
    assert os.path.isdir(part_dir) and os.listdir(part_dir)
    do._delete_files_keep_dirs(part_dir)
    assert os.path.isdir(part_dir) and not any(
        os.path.isfile(os.path.join(part_dir, f)) for f in os.listdir(part_dir)
    )
    open(os.path.join(do.path, "testFile"), "w").close()
    do._delete_files_keep_dirs(do.path)
    assert os.path.isdir(do.path) and os.path.isdir(part_dir)
    assert not any(os.path.isfile(os.path.join(do.path, f)) for f in os.listdir(do.path))


def test_overwrite_optimized_requires_partition_values(spark, tmp_path):
    """SparkFileDataObjectTest:337 — OverwriteOptimized without pvs on a
    partitioned DataObject raises (would silently nuke the whole object)."""
    do = _csv_do(tmp_path, partitions=["p1", "p2"], save_mode=SaveMode.OVERWRITE_OPTIMIZED)
    df = spark.createDataFrame([("A", "2", 1), ("B", "1", 2)], "p1 string, p2 string, value int")
    with pytest.raises(ProcessingLogicError):
        do.write_dataframe(df, partition_values=[])


def test_move_partition_function(spark, tmp_path):
    """SparkFileDataObjectTest:357 — movePartitions merges p=A into p=B and
    drops p=A; the merged partition reads complete."""
    base = tmp_path / "mv"
    for p, prefix in (("A", "testA"), ("B", "testB")):
        d = base / f"p={p}"
        d.mkdir(parents=True)
        for i in range(1, 11):
            (d / f"{prefix}{i}.json").write_text('{"value": %d}' % i)
    do = JsonFileDataObject(id="mv", path=str(base), partitions=["p"])
    do.move_partitions(spark, [(pv({"p": "A"}), pv({"p": "B"}))])
    assert not os.path.exists(base / "p=A")
    assert len(os.listdir(base / "p=B")) == 20
    total = do.get_dataframe(spark, [pv({"p": "B"})]).agg(F.sum("value")).first()[0]
    assert total == 2 * sum(range(1, 11))


def test_compact_partition_function(spark, tmp_path):
    """SparkFileDataObjectTest:378 — compactPartitions reduces the file count
    of p=A, leaves p=B alone, marks the partition COMPACTED, and a second
    compact is a no-op (marker timestamp unchanged). Our compaction module's
    marker protocol is the twin of the reference's _SDL_COMPACTED files."""
    from smart_data_lake_spark.compaction import compact_partitions

    base = tmp_path / "cp"
    for p in ("A", "B"):
        d = base / f"p={p}"
        d.mkdir(parents=True)
        for i in range(1, 101):
            (d / f"{i}.json").write_text('{"value": %d}' % i)
    do = JsonFileDataObject(
        id="cp", path=str(base), partitions=["p"], options={"multiLine": "false"}
    )  # reference sets multiLine=false here too (jsonOptions)
    compact_partitions(spark, do, [pv({"p": "A"})])
    files_a = [f for f in os.listdir(base / "p=A") if f.endswith(".json")]
    assert len(files_a) < 100
    assert len([f for f in os.listdir(base / "p=B") if f.endswith(".json")]) == 100
    total = do.get_dataframe(spark, [pv({"p": "A"})]).agg(F.sum("value")).first()[0]
    assert total == 5050
    markers = [f for f in os.listdir(base / "p=A") if "COMPACTED" in f.upper()]
    assert markers
    marker_path = base / "p=A" / markers[0]
    mtime1 = os.path.getmtime(marker_path)
    compact_partitions(spark, do, [pv({"p": "A"})])  # second run: no-op
    assert os.path.getmtime(marker_path) == mtime1


def test_incremental_output_mode(spark, tmp_path):
    """SparkFileDataObjectTest:421 — state=None reads everything; after an
    append, state from the first read yields only the new file's rows; a
    plain (init) read still sees all rows."""
    import time

    do = ParquetFileDataObject(id="inc", path=str(tmp_path / "inc"), save_mode=SaveMode.APPEND)
    do.write_dataframe(
        spark.createDataFrame([("A", 1), ("A", 2), ("B", 3), ("B", 4)], "p string, value int")
    )
    do.set_state(None)
    assert do.get_dataframe(spark).count() == 4
    state1 = do.get_state()
    time.sleep(1.1)  # modifiedAfter has second granularity in option parsing
    do.write_dataframe(spark.createDataFrame([("B", 5)], "p string, value int"))
    do.set_state(state1)
    assert do.get_dataframe(spark).count() == 1
    state2 = do.get_state()
    assert state2 > state1
    do.set_state(None)
    assert do.get_dataframe(spark).count() == 5


# --------------------------------------------------------------------------
# CsvFileDataObjectTest.scala
# --------------------------------------------------------------------------


@pytest.mark.parametrize(
    "header,infer",
    [("true", "false"), ("true", "true"), ("false", "true")],
    ids=["header-noinfer", "header-infer", "noheader-infer"],
)
def test_csv_empty_file_reads_empty_schemaless(spark, tmp_path, header, infer):
    """CsvFileDataObjectTest:41/66/91 — a zero-byte csv reads as an empty,
    schema-less DataFrame for every header/inferSchema combination."""
    f = tmp_path / "empty.csv"
    f.touch()
    do = CsvFileDataObject(
        id="src1", path=str(f), options={"header": header, "inferSchema": infer}
    )
    df = do.get_dataframe(spark)
    assert df.schema.fields == []
    assert df.count() == 0


def test_csv_empty_file_with_user_schema(spark, tmp_path):
    """SparkFileDataObjectSchemaBehavior.readEmptySources — empty file +
    user-defined schema → empty frame WITH that schema."""
    f = tmp_path / "empty.csv"
    f.touch()
    do = CsvFileDataObject(
        id="src1",
        path=str(f),
        options={"header": "false", "inferSchema": "false"},
        schema="h1 string, h2 int",
    )
    df = do.get_dataframe(spark)
    assert [(x.name, x.dataType.simpleString()) for x in df.schema.fields] == [
        ("h1", "string"),
        ("h2", "int"),
    ]
    assert df.count() == 0


def test_csv_read_nonexisting_without_schema_fails(spark, tmp_path):
    """SparkFileDataObjectSchemaBehavior.readNonExistingSources — reading a
    non-existing path without user schema raises."""
    do = CsvFileDataObject(
        id="src1", path=str(tmp_path / "nope.csv"), options={"inferSchema": "true"}
    )
    with pytest.raises(Exception):
        do.get_dataframe(spark).collect()


def test_csv_user_schema_precedence_over_header(spark, tmp_path):
    """CsvFileDataObjectTest:118 — with header=true, the user schema renames
    and retypes columns; the header row is consumed, leaving 1 data row."""
    src = tmp_path / "s"
    src.mkdir()
    (src / "d.csv").write_text("A,B\nB,1\n")
    do = CsvFileDataObject(
        id="src1",
        path=str(src),
        options={"header": "true", "inferSchema": "false", "delimiter": ","},
        schema="header1 STRING, header2 INT",
    )
    df = do.get_dataframe(spark)
    assert [(x.name, x.dataType.simpleString()) for x in df.schema.fields] == [
        ("header1", "string"),
        ("header2", "int"),
    ]
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0]["header1"] == "B" and rows[0]["header2"] == 1


def test_csv_user_schema_precedence_over_inference(spark, tmp_path):
    """CsvFileDataObjectTest:165 — with header=false the header line is data:
    2 rows, user schema names/types win over inference."""
    src = tmp_path / "s"
    src.mkdir()
    (src / "d.csv").write_text("A,B\nB,1\n")
    do = CsvFileDataObject(
        id="src1",
        path=str(src),
        options={"header": "false", "inferSchema": "true", "delimiter": ","},
        schema="header1 STRING, header2 INT",
    )
    df = do.get_dataframe(spark)
    assert [x.name for x in df.schema.fields] == ["header1", "header2"]
    assert df.count() == 2


def test_csv_number_of_tasks_1_filename_rename(spark, tmp_path):
    """CsvFileDataObjectTest:211 — numberOfTasksPerPartition=1 +
    filename='data.csv' writes exactly one file named data.csv."""
    do = CsvFileDataObject(
        id="t1",
        path=str(tmp_path / "t1"),
        options={"header": "true"},
        n_files_per_partition=1,
        filename="data.csv",
    )
    df = spark.range(1000).select(F.lit("test").alias("name"), F.col("id").alias("cnt")).repartition(10)
    do.write_dataframe(df)
    assert [os.path.basename(f) for f in do.get_file_refs()] == ["data.csv"]
    assert do.get_dataframe(spark).count() == 1000


def test_csv_number_of_tasks_5_filename_rename(spark, tmp_path):
    """CsvFileDataObjectTest:222 — numberOfTasksPerPartition=5 writes
    data.1.csv … data.5.csv."""
    do = CsvFileDataObject(
        id="t5",
        path=str(tmp_path / "t5"),
        options={"header": "true"},
        n_files_per_partition=5,
        filename="data.csv",
    )
    df = spark.range(1000).select(F.lit("test").alias("name"), F.col("id").alias("cnt")).repartition(10)
    do.write_dataframe(df)
    names = sorted(os.path.basename(f) for f in do.get_file_refs())
    assert names == [f"data.{i}.csv" for i in range(1, 6)]
    assert do.get_dataframe(spark).count() == 1000


def test_csv_number_of_tasks_with_partitions(spark, tmp_path):
    """CsvFileDataObjectTest:234 — 1 task per partition keyed on the partition
    column: each hive partition gets exactly one file named data.csv."""
    do = CsvFileDataObject(
        id="tp",
        path=str(tmp_path / "tp"),
        options={"header": "true"},
        partitions=["name"],
        n_files_per_partition=1,
        repartition_keys=["name"],
        filename="data.csv",
    )
    df = (
        spark.range(1000)
        .select(
            F.concat(F.lit("test"), (F.col("id") % 2).cast("string")).alias("name"),
            F.col("id").alias("cnt"),
        )
        .repartition(10)
    )
    do.write_dataframe(df, [pv({"name": "test0"}), pv({"name": "test1"})])
    refs = do.get_file_refs([pv({"name": "test0"}), pv({"name": "test1"})])
    assert [os.path.basename(f) for f in refs] == ["data.csv", "data.csv"]
    assert do.get_dataframe(spark).count() == 1000


def test_csv_zip_write(spark, tmp_path):
    """CsvFileDataObjectTest:245 — compression=zip packages the written csv
    into data.csv.zip; the archive holds readable CSV text. (The reference
    can't read zip back either — its read assertion is commented out.)"""
    do = CsvFileDataObject(
        id="z",
        path=str(tmp_path / "z"),
        options={"header": "true", "compression": "zip"},
        n_files_per_partition=1,
        filename="data.csv.zip",
    )
    df = spark.createDataFrame([("A", "B"), ("B", "1")], "a string, b string")
    do.write_dataframe(df)
    archive = os.path.join(do.path, "data.csv.zip")
    assert os.path.isfile(archive)
    with zipfile.ZipFile(archive) as zf:
        entries = zf.namelist()
        assert entries
        text = zf.read(entries[0]).decode()
    assert "a" in text.splitlines()[0] and len(text.splitlines()) == 3


def test_rename_file_handle_already_existing(spark, tmp_path):
    """CsvFileDataObjectTest:269 — renaming onto an existing target picks a
    suffixed name instead of clobbering."""
    d = tmp_path / "r"
    d.mkdir()
    (d / "f.csv").write_text("a,b\n1,2\n")
    do = CsvFileDataObject(id="r", path=str(d), options={"header": "true"})
    assert [os.path.basename(f) for f in do.get_file_refs()] == ["f.csv"]
    do.rename_file_handle_already_existing(str(d / "f.csv"), str(d / "f.csv.temp"))
    assert [os.path.basename(f) for f in do.get_file_refs()] == ["f.csv.temp"]
    (d / "f.csv").write_text("a,b\n3,4\n")
    do.rename_file_handle_already_existing(str(d / "f.csv"), str(d / "f.csv.temp"))
    names = [os.path.basename(f) for f in do.get_file_refs()]
    assert len(names) == 2 and all(n.startswith("f.csv.temp") for n in names)


def test_csv_files_partitioned_with_filename_column(spark, tmp_path):
    """CsvFileDataObjectTest:301 — partitioned csv with schema incl. the
    partition col + filenameColumn: read returns all cols + _filename."""
    df1 = spark.createDataFrame([("A", "1", "-"), ("B", "2", None)], "h1 string, h2 string, h3 string")
    do = CsvFileDataObject(
        id="t",
        path=str(tmp_path / "t"),
        options={"header": "true"},
        partitions=["h1"],
        schema="h1 string, h2 string, h3 string",
        filename_column="_filename",
    )
    pvs = [pv({"h1": "A"}), pv({"h1": "B"})]
    do.write_dataframe(df1, pvs)
    out = do.get_dataframe(spark, pvs)
    assert set(out.columns) == {"h1", "h2", "h3", "_filename"}
    got = {(r["h1"], r["h2"], r["h3"]) for r in out.collect()}
    assert got == {("A", "1", "-"), ("B", "2", None)}
    assert out.where(F.col("_filename").isNull()).count() == 0


def test_csv_files_partitioned_schema_without_partition_cols(spark, tmp_path):
    """CsvFileDataObjectTest:318 — user schema omits the partition column;
    the DO appends it (resolve_schema) and the read is identical."""
    df1 = spark.createDataFrame([("A", "1", "-"), ("B", "2", None)], "h1 string, h2 string, h3 string")
    do = CsvFileDataObject(
        id="t",
        path=str(tmp_path / "t"),
        options={"header": "true"},
        partitions=["h1"],
        schema="h2 string, h3 string",
        filename_column="_filename",
    )
    pvs = [pv({"h1": "A"}), pv({"h1": "B"})]
    do.write_dataframe(df1, pvs)
    out = do.get_dataframe(spark, pvs)
    assert set(out.columns) == {"h1", "h2", "h3", "_filename"}
    got = {(r["h1"], r["h2"], r["h3"]) for r in out.collect()}
    assert got == {("A", "1", "-"), ("B", "2", None)}


# --------------------------------------------------------------------------
# SparkFileDataObjectSchemaBehavior.validateSchemaMin (shared behaviors)
# --------------------------------------------------------------------------


def _schema_min_do(tmp_path, schema_min):
    return CsvFileDataObject(
        id="m",
        path=str(tmp_path / "m"),
        options={"header": "true", "inferSchema": "false"},
        schema="a string, b string, c string",
        schema_min=schema_min,
    )


def test_schema_min_on_write_full_and_subset_ok(spark, tmp_path):
    """SchemaBehavior:137/157 — schemaMin equal to or a subset of the written
    schema validates."""
    df = spark.createDataFrame([("1", "2", "3")], "a string, b string, c string")
    _schema_min_do(tmp_path, "a string, b string, c string").write_dataframe(df)
    _schema_min_do(tmp_path, "a string").write_dataframe(df)


def test_schema_min_on_write_violations(spark, tmp_path):
    """SchemaBehavior:177/198/219/240 — wrong column name, wrong type, and
    missing columns (incl. on an empty frame) all raise."""
    df = spark.createDataFrame([("1", "2", "3")], "a string, b string, c string")
    with pytest.raises(SchemaViolationError):
        _schema_min_do(tmp_path, "nope string").write_dataframe(df)
    with pytest.raises(SchemaViolationError):
        _schema_min_do(tmp_path, "a int").write_dataframe(df)
    with pytest.raises(SchemaViolationError):
        _schema_min_do(tmp_path, "a string, z string").write_dataframe(df)
    empty = spark.createDataFrame([], "a string")
    with pytest.raises(SchemaViolationError):
        _schema_min_do(tmp_path, "a string, b string").write_dataframe(empty)


def test_schema_min_on_read(spark, tmp_path):
    """SchemaBehavior:275-383 — the same matrix on read: ok for full match
    and subset, violation for bad name/type/missing."""
    ok = _schema_min_do(tmp_path, "a string")
    ok.write_dataframe(spark.createDataFrame([("1", "2", "3")], "a string, b string, c string"))
    ok.get_dataframe(spark).collect()
    bad_name = CsvFileDataObject(
        id="m", path=ok.path, options={"header": "true"},
        schema="a string, b string, c string", schema_min="zz string",
    )
    with pytest.raises(SchemaViolationError):
        bad_name.get_dataframe(spark)
    bad_type = CsvFileDataObject(
        id="m", path=ok.path, options={"header": "true"},
        schema="a string, b string, c string", schema_min="a int",
    )
    with pytest.raises(SchemaViolationError):
        bad_type.get_dataframe(spark)
