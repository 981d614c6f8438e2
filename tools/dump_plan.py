"""Dump `.explain("formatted")` for declared queries to plan files.

Usage: python tools/dump_plan.py <suffix> <query> [<query> ...]

Writes plans/r12/<query>_<suffix>.txt relative to the repo this script
lives in (so running it from a worktree at an older commit captures that
commit's plans). Uses the same session conf as bench.py so the plans
match what the benchmark executes.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pandas as pd  # noqa: F401  (pandas_udf type-hint resolution)

import __spark_entry__ as entry
from smart_data_lake_spark.session import build_session


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    spark = build_session(
        app_name="dump_plan",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": str(512 * 1024),
            "spark.sql.adaptive.coalescePartitions.minPartitionSize": "64k",
        },
    )
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    outdir = os.path.join(REPO, "plans", "r12")
    os.makedirs(outdir, exist_ok=True)
    qs = entry.queries()
    for name in names:
        df = qs[name](spark, sf)
        txt = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({txt.count('Exchange')} Exchange refs)")
    spark.stop()


if __name__ == "__main__":
    main()
