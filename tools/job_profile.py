"""Per-job/stage time attribution for one declared query (guide §1/§7).

Runs a query in a fresh warmed session with the Spark event log enabled,
then parses the log into a job-by-job timing table with stage callsites —
the local[:n] stand-in for the Spark UI's Jobs/Stages pages (the UI is
disabled in this sandbox). Usage:

    python tools/job_profile.py <query> [runs=1]

Prints one line per job: duration, #tasks, and the distinct stage names
(callsites) so each job maps back to the operator phase that submitted it.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
import pandas as pd
import __spark_entry__ as entry
from smart_data_lake_spark.session import build_session, release_persistent_rdds
from pyspark.sql import functions as F

_extra = {
    "spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024),
    "spark.sql.files.openCostInBytes": str(512 * 1024),
    "spark.eventLog.enabled": "true",
    "spark.eventLog.compress": "false",
    "spark.eventLog.rolling.enabled": "false",
    "spark.eventLog.dir": %(evdir)r}
# ad-hoc conf overrides for A/B profiling: JOBPROFILE_CONF="k=v;k=v"
for _kv in os.environ.get("JOBPROFILE_CONF", "").split(";"):
    if "=" in _kv:
        _k, _v = _kv.split("=", 1)
        _extra[_k.strip()] = _v.strip()
spark = build_session(app_name="profile", extra_conf=_extra)
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
spark.range(2).select(
    F.lower(F.concat(F.lit("Äx"), F.col("id").cast("string"))),
    F.upper(F.lit("ßy")),
    F.initcap(F.lit("éz")),
).write.mode("overwrite").format("noop").save()
# streaming-infrastructure warmup (mirrors bench.py): the first stream in a
# session pays ~30-35s of one-off init that would otherwise be charged to
# the profiled query
import tempfile as _tf

with _tf.TemporaryDirectory() as _wtmp:
    spark.range(2).select(F.col("id"), F.current_timestamp().alias("ts")).write.mode(
        "overwrite"
    ).parquet(f"{_wtmp}/t")
    _wq = (
        spark.readStream.schema("id long, ts timestamp")
        .parquet(f"{_wtmp}/t")
        .withWatermark("ts", "1 hour")
        .groupBy("id")
        .count()
        .writeStream.format("memory")
        .queryName("_profile_stream_warm")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    _wq.awaitTermination()
spark.catalog.dropTempView("_profile_stream_warm")

name = %(name)r
fn = entry.queries()[name]
spark.sparkContext.setJobDescription("WARMUP_DONE_MARKER")
spark.range(1).write.mode("overwrite").format("noop").save()
spark.sparkContext.setJobDescription(name)
for _ in range(%(runs)d):
    t0 = time.time()
    fn(spark, sf).write.mode("overwrite").format("noop").save()
    print("RUN_WALL %%.3f" %% (time.time() - t0), flush=True)
    release_persistent_rdds(spark)
spark.stop()
"""


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    name = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    with tempfile.TemporaryDirectory() as evdir:
        code = _CHILD % {"repo": repo, "name": name, "evdir": evdir, "runs": runs}
        res = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True, cwd=repo
        )
        walls = [l for l in res.stdout.splitlines() if l.startswith("RUN_WALL")]
        for w in walls:
            print(w)
        if not walls:
            print(res.stderr[-2000:])
            return
        logs = []
        for root, _dirs, files in os.walk(evdir):
            for f in files:
                if "events" in f or f.startswith("local-"):
                    logs.append(os.path.join(root, f))
        if not logs:
            print("no event log produced", res.stderr[-500:])
            return
        jobs: dict[int, dict] = {}
        stages: dict[int, dict] = {}
        past_warmup = False
        with open(logs[0]) as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                e = ev.get("Event")
                if e == "SparkListenerJobStart":
                    desc = ev.get("Properties", {}).get("spark.job.description", "")
                    if desc == "WARMUP_DONE_MARKER":
                        past_warmup = True
                        continue
                    if not past_warmup:
                        continue
                    jobs[ev["Job ID"]] = {
                        "t0": ev["Submission Time"],
                        "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
                    }
                    for s in ev.get("Stage Infos", []):
                        stages[s["Stage ID"]] = {
                            "name": s.get("Stage Name", ""),
                            "ntasks": s.get("Number of Tasks", 0),
                        }
                elif e == "SparkListenerJobEnd" and ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]]["t1"] = ev["Completion Time"]
                elif e == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    if si["Stage ID"] in stages:
                        stages[si["Stage ID"]]["dur"] = si.get(
                            "Completion Time", 0
                        ) - si.get("Submission Time", 0)
                elif e == "SparkListenerTaskEnd" and ev.get("Stage ID") in stages:
                    ti = ev.get("Task Info", {})
                    d = (ti.get("Finish Time", 0) - ti.get("Launch Time", 0)) / 1000.0
                    stages[ev["Stage ID"]].setdefault("tasks", []).append(d)
        total = 0
        for jid in sorted(jobs):
            j = jobs[jid]
            if "t1" not in j:
                continue
            dur = (j["t1"] - j["t0"]) / 1000.0
            total += dur
            names = []
            for sid in j["stages"]:
                s = stages.get(sid, {})
                nm = s.get("name", "?").split("\n")[0][:70]
                d = s.get("dur")
                ts = sorted(s.get("tasks", []))
                tstr = ""
                if ts:
                    med = ts[len(ts) // 2]
                    tstr = f" task med={med:.2f} max={ts[-1]:.2f}"
                names.append(
                    f"{nm} [{s.get('ntasks','?')}t{'' if d is None else f' {d/1000:.2f}s'}{tstr}]"
                )
            print(f"job {jid:4d} {dur:7.3f}s  " + " | ".join(names))
        print(f"TOTAL job time {total:.3f}s over {len(jobs)} jobs")


if __name__ == "__main__":
    main()
