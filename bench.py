"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Materialization uses the noop sink — full computation, no driver transfer —
so timings reflect the distributed plan, not collect() serialization.
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd  # module-level: pandas_udf type-hint resolution needs it in globals

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry
from smart_data_lake_spark.session import build_session


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # split size matched to the benchmark scale: the small-SF tables are a few
    # MB each, so the 128 MB default packs a whole table into 1-2 input splits
    # and per-row operators run on 2 of 32 cores. 4 MB splits restore full
    # parallelism here; at production scale (TBs of input) the default is
    # already right because there are thousands of splits — this knob is the
    # standard per-workload tuning, not a semantics change.
    spark = build_session(
        app_name="sdl_bench",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": str(512 * 1024),
            # (the shuffle-side analog — the 64k coalescing minPartitionSize
            # floor — moved into session.py in r12 so production sessions
            # get the same plans the bench times)
        },
    )

    # warm the session once (JVM JIT, codegen compiler, parquet footers, AND
    # the Arrow python-worker pool — local[32] forks 32 workers on the first
    # pandas-UDF stage, a multi-second one-off) so per-query timings measure
    # the plans, not process startup
    from pyspark.sql import functions as F

    spark.range(1000).groupBy(F.col("id") % 7).count().write.mode("overwrite").format("noop").save()

    @F.pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        # import numpy in the worker: the embedding/vector UDFs' modules
        # import it on first unpickle, a one-off per worker that otherwise
        # lands in the first measured embedding query (32 workers importing
        # concurrently). Session machinery, same class as the pandas fork
        # warmup above (guide §1.4).
        import numpy as _np

        return s + int(_np.zeros(1)[0])

    spark.range(100000).repartition(64).select(_warm("id")).write.mode("overwrite").format(
        "noop"
    ).save()

    # ... and the parquet-scan + decimal-aggregate codegen paths, so the first
    # measured query times its plan rather than the remaining JIT warm-up
    # (measured ~3s of q1's time before this existed)
    warm_li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(20000)
    warm_li.groupBy("l_returnflag").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")),
        F.avg("l_quantity"),
    ).write.mode("overwrite").format("noop").save()

    # ... and Spark 4's ICU collation tables: CollationAwareUTF8String's
    # static initializer builds the full ICU case-mapping state the first
    # time a case-mapping expression (lower/upper/initcap) EXECUTES, a
    # one-off 60-100s single-threaded stall on this box (thread-dumped:
    # CaseMapImpl.toTitle inside <clinit> on the first text query's task).
    # Trigger it here on a 2-row frame so the first measured text query
    # times its plan, not a JVM class initializer (guide §1: measure the
    # computation). Non-ASCII literals force the full ICU path.
    spark.range(2).select(
        F.lower(F.concat(F.lit("Äx"), F.col("id").cast("string"))),
        F.upper(F.lit("ßy")),
        F.initcap(F.lit("éz")),
    ).write.mode("overwrite").format("noop").save()

    # ... and the structured-streaming machinery: the first stream a session
    # starts pays a one-off ~30-35s init (microbatch execution threads, state
    # store provider loading, streaming codegen paths — measured 39s -> 10s
    # -> 5.5s -> 3.5s steady on repeated identical availableNow drains, and
    # a 2-row warmup stream absorbs it: first real drain lands ~5.5s). The
    # tail spans two of the three timed runs, so without this the FIRST
    # streaming query's MEDIAN absorbs session init, not its plan (guide
    # §1.4: time the computation). A 2-row file-source stream through a
    # watermark + stateful agg touches the same init paths.
    import tempfile

    with tempfile.TemporaryDirectory() as _wtmp:
        spark.range(2).select(
            F.col("id"), F.current_timestamp().alias("ts")
        ).write.mode("overwrite").parquet(f"{_wtmp}/t")
        _wq = (
            spark.readStream.schema("id long, ts timestamp")
            .parquet(f"{_wtmp}/t")
            .withWatermark("ts", "1 hour")
            .groupBy("id")
            .count()
            .writeStream.format("memory")
            .queryName("_sdl_bench_stream_warm")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        _wq.awaitTermination()
    spark.catalog.dropTempView("_sdl_bench_stream_warm")

    # three timed iterations per query, report the MEDIAN: robust to the
    # one-off scheduler stall that a min hides asymmetrically and a mean
    # amplifies. This machine's load drift is a documented 2-3x — two rounds
    # of verdict space went to adjudicating single-run "regressions" that
    # medians close automatically; treat round-over-round per-query moves
    # within ±25% as noise before A/B-ing.
    # a failing query must never zero out the whole benchmark (round 3 lost
    # all numbers to one AnalysisException): record the error per query and
    # keep going.
    from smart_data_lake_spark.session import release_persistent_rdds

    def _release_persistent_rdds() -> None:
        release_persistent_rdds(spark)

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name, fn in entry.queries().items():
        runs: list[float] = []
        try:
            for _ in range(3):
                t0 = time.time()
                df = fn(spark, sf_dir)
                df.write.mode("overwrite").format("noop").save()
                runs.append(time.time() - t0)
                _release_persistent_rdds()
            timings[name] = round(sorted(runs)[1], 3)
        except Exception as exc:  # noqa: BLE001
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_queries_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "timing": "median-of-3",
        # noise-band note for round-over-round reads: per-query medians on
        # this shared box still drift; moves within ±25% are machine noise
        "noise_band_pct": 25,
        # denominator for round-over-round comparison: a round where a slow
        # query errors out would otherwise look faster than it is
        "n_queries_timed": len(timings),
        "sf": float(sf),
    }
    if errors:
        out["errors"] = errors
        out["partial"] = True
    print(json.dumps(out))
    # Side-channel copy of the same payload (r12): BENCH_r10's one-line
    # stdout JSON was truncated in capture, which cost round 11 its entire
    # round-over-round comparison (PERF_r11: n_common=0). The stdout
    # contract above is unchanged; this file is just a durable baseline
    # for the next round's diff. Best-effort — the bench must never fail
    # on a read-only checkout.
    try:
        side = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "plans", "bench_latest.json"
        )
        with open(side, "w") as fh:
            json.dump(out, fh, indent=1)
            fh.write("\n")
    except OSError:
        pass


if __name__ == "__main__":
    main()
