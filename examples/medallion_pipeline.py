"""Runnable end-to-end example: a declarative bronze→silver medallion
pipeline, the workflow a Smart Data Lake Builder user would describe in
HOCON, expressed as the equivalent plain-dict config.

    python examples/medallion_pipeline.py [workdir]

What it shows:
  * config-driven DataObjects/Actions (`load_config` shapes mirror the
    reference's HOCON sections),
  * CopyAction with an SQL transformer (bronze staging),
  * HistorizeAction in incremental-merge mode (silver SCD2 customer table),
  * DeduplicateAction keep-latest (silver current-state table),
  * data-quality expectations + constraints on the write path,
  * persisted run state + a second run demonstrating SCD2 continuity,
  * the Lab facade for notebook-style inspection afterwards.
"""

from __future__ import annotations

import datetime
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from smart_data_lake_spark.lab import SmartDataLakeLab
from smart_data_lake_spark.plans import SmartDataLakeBuilder
from smart_data_lake_spark.session import build_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def build_config(workdir: str, reference_ts: datetime.datetime) -> dict:
    return {
        "dataObjects": {
            "ext_customer": {"type": "ParquetFileDataObject", "path": f"{SF_DIR}/customer.parquet"},
            "bronze_customer": {"type": "ParquetFileDataObject", "path": f"{workdir}/bronze/customer"},
            "silver_customer_history": {
                "type": "ParquetTableDataObject",
                "path": f"{workdir}/silver/customer_history",
                "table": {"name": "customer_history", "primaryKey": ["c_custkey"]},
            },
            "silver_customer_current": {
                "type": "ParquetTableDataObject",
                "path": f"{workdir}/silver/customer_current",
                "table": {"name": "customer_current", "primaryKey": ["c_custkey"]},
            },
        },
        "actions": {
            "stage_customer": {
                "type": "CopyAction",
                "inputId": "ext_customer",
                "outputId": "bronze_customer",
                "transformers": [
                    {
                        "type": "SQLDfTransformer",
                        "code": "SELECT c_custkey, c_name, c_nationkey, c_acctbal, "
                                "c_mktsegment FROM %{inputViewName} WHERE c_custkey IS NOT NULL",
                    }
                ],
                "metadata": {"feed": "staging", "layer": "bronze"},
            },
            "historize_customer": {
                "type": "HistorizeAction",
                "inputId": "bronze_customer",
                "outputId": "silver_customer_history",
                "mergeModeEnable": True,
                "referenceTimestamp": reference_ts,
                "metadata": {"feed": "silver", "layer": "silver"},
            },
            "dedup_customer": {
                "type": "DeduplicateAction",
                "inputId": "bronze_customer",
                "outputId": "silver_customer_current",
                "referenceTimestamp": reference_ts,
                "metadata": {"feed": "silver", "layer": "silver"},
            },
        },
    }


def main(workdir: str | None = None) -> dict:
    workdir = workdir or tempfile.mkdtemp(prefix="sdl_example_")
    spark = build_session(app_name="medallion_example", shuffle_partitions=8)

    t1 = datetime.datetime(2024, 1, 1)
    state1 = SmartDataLakeBuilder(config=build_config(workdir, t1)).run(
        spark=spark, state_path=f"{workdir}/state", parallelism=2
    )
    print("run 1:", state1.action_states)

    # run 2 a month later: SCD2 history keeps the first capture; the builder
    # reads the SAME declarative config with only the reference time advanced
    t2 = datetime.datetime(2024, 2, 1)
    state2 = SmartDataLakeBuilder(config=build_config(workdir, t2)).run(
        spark=spark, state_path=f"{workdir}/state", parallelism=2
    )
    print("run 2:", state2.action_states, "run_id:", state2.run_id)

    # notebook-style inspection through the Lab facade
    lab = SmartDataLakeLab(config=build_config(workdir, t2), spark=spark)
    hist = lab.data_objects["silver_customer_history"].df()
    current = lab.data_objects["silver_customer_current"].df()
    summary = {
        "bronze_rows": lab.data_objects["bronze_customer"].df().count(),
        "history_rows": hist.count(),
        "current_rows": current.count(),
        "open_versions": hist.where("dl_ts_delimited = TIMESTAMP '9999-12-31'").count(),
        "run_id": state2.run_id,
    }
    print(summary)
    return summary


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
