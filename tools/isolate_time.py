"""Time one declared query in a fresh process/session (guide §1: isolate
the computation, noop sink, median-of-3). Usage:

    python tools/isolate_time.py <query> [<query> ...]

Spawns a subprocess per query so JVM/session state from one query can
never inflate another's measurement; prints one JSON line per query:
{"query": name, "median": s, "runs": [s,s,s]}.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
import pandas as pd
import __spark_entry__ as entry
from smart_data_lake_spark.session import build_session, release_persistent_rdds
from pyspark.sql import functions as F

spark = build_session(app_name="isolate", extra_conf={
    "spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024),
    "spark.sql.files.openCostInBytes": str(512 * 1024),
    "spark.sql.adaptive.coalescePartitions.minPartitionSize": "64k"})
spark.range(1000).groupBy(F.col("id") %% 7).count().write.mode("overwrite").format("noop").save()

@F.pandas_udf("long")
def _warm(s: pd.Series) -> pd.Series:
    import numpy as _np
    return s + int(_np.zeros(1)[0])

spark.range(100000).repartition(64).select(_warm("id")).write.mode("overwrite").format("noop").save()
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
warm = spark.read.parquet(f"{sf}/lineitem.parquet").limit(20000)
warm.groupBy("l_returnflag").agg(
    F.sum(F.col("l_extendedprice").cast("decimal(18,2)")), F.avg("l_quantity")
).write.mode("overwrite").format("noop").save()
# same ICU-collation warmup as bench.py: Spark 4 builds its case-mapping
# tables in a static initializer on the FIRST executed lower/upper/initcap,
# a 60-100s single-threaded stall that would otherwise land in run 1 of any
# text query measured here
spark.range(2).select(
    F.lower(F.concat(F.lit("Äx"), F.col("id").cast("string"))),
    F.upper(F.lit("ßy")),
    F.initcap(F.lit("éz")),
).write.mode("overwrite").format("noop").save()

name = %(name)r
fn = entry.queries()[name]
spark.sparkContext.setJobDescription(name)
runs = []
for _ in range(3):
    t0 = time.time()
    fn(spark, sf).write.mode("overwrite").format("noop").save()
    runs.append(round(time.time() - t0, 3))
    release_persistent_rdds(spark)
print(json.dumps({"query": name, "median": sorted(runs)[1], "runs": runs}))
"""


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for name in sys.argv[1:]:
        code = _CHILD % {"repo": repo, "name": name}
        res = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True, cwd=repo
        )
        line = [l for l in res.stdout.splitlines() if l.startswith("{")]
        if line:
            print(line[-1], flush=True)
        else:
            print(json.dumps({"query": name, "error": res.stderr[-300:]}), flush=True)


if __name__ == "__main__":
    main()
