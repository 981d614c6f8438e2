"""SparkSession factory with scale-oriented defaults.

The reference configures Spark through GlobalConfig
(`sdl-core/src/main/scala/io/smartdatalake/app/GlobalConfig.scala`); here we
bake in the settings that matter for both local[32] testing and a large
cluster: AQE (runtime re-planning, skew-join handling, partition coalescing),
Arrow for any Python exchange, UTC session time zone for deterministic
timestamp semantics, and a shuffle-partition count sized to the machine
instead of Spark's legacy default of 200.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _will_launch_jvm() -> bool:
    """True when build_session's getOrCreate will launch the JVM itself, so
    builder-level spark.driver.extraJavaOptions (and the GC flags they
    carry) are guaranteed active. False under a pre-existing gateway/context
    (spark-submit sets PYSPARK_GATEWAY_PORT before user code runs; an
    already-created SparkContext means every builder conf is moot anyway)."""
    if "PYSPARK_GATEWAY_PORT" in os.environ:
        return False
    try:
        from pyspark import SparkContext

        return SparkContext._active_spark_context is None and SparkContext._gateway is None
    except Exception:  # noqa: BLE001 — conservative: keep the safe default
        return False


def build_session(
    app_name: str = "smart_data_lake_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Let AQE's parallelism-first coalescing actually bind for small
        # inputs (r11 opt, promoted from bench-only conf in r12 so
        # production sessions get the same plans the bench times): the
        # default 1 MB minPartitionSize floor coalesces few-MB post-shuffle
        # stages to 1-2 partitions, serializing per-row-expensive stages
        # (measured: 15s of a 20s jaccard query on one of 32 cores; 26s ->
        # 9-10s with the floor lowered). At production scale post-shuffle
        # partitions are far above 1 MB and neither floor binds — the knob
        # only changes behavior where the default was pathological.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        # Heap sized to the workload, not the box (r11 opt, guide §5/§9):
        # the old 48g default made G1 pathological on this virtualized
        # host — IHOP-triggered concurrent cycles every ~3s uncommitted and
        # re-faulted tens of GB of pages, and /proc/stat during the stalls
        # showed user≈0.3%, sys≈30-44% of 32 CPUs (kernel page-fault storm):
        # queries ran 4-20x slow in bursts (jaccard probe 16/87/49s at 48g
        # vs 12/4.9/4.2s at 8g, same code). 8g is ~500x the benchmark's
        # input and keeps young collections frequent enough that the
        # weak-reference ContextCleaner stays healthy; production
        # deployments size it via SPARK_DRIVER_MEMORY as before.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # ContextCleaner is weak-reference-driven: broadcast relations,
        # shuffle states and checkpoint blocks are only reclaimed after a
        # JVM GC enqueues their references. With a large driver heap a
        # long-lived session can run hundreds of queries without ANY GC —
        # measured on this box (r11): heap grew monotonically to ~29 GB,
        # the storage pool filled with dead broadcast/checkpoint blocks,
        # and per-task execution-memory acquisition degraded every query
        # 10-50x (readability_docs 4s -> 137s in-suite); one forced GC
        # restored sub-second times and dropped the heap to 1.5 GB.
        # Spark's own knob for exactly this is the periodic-GC timer;
        # the 30min default is tuned for multi-hour jobs, not
        # many-short-queries sessions. 90s keeps the heap small so each
        # forced GC is cheap (~0.3s) — workload-shape config, valid at
        # any scale/core count (guide §5: caching/unpersist hygiene).
        # COUPLING GUARD (r12, from r11 ADVICE): the short interval is only
        # safe together with -XX:+ExplicitGCInvokesConcurrent below — a
        # plain System.gc() on G1 is a single-threaded stop-the-world full
        # collection, and injecting THAT every 90s into running queries is
        # the exact pathology the fix removes. extraJavaOptions only takes
        # effect when THIS builder launches the JVM; under spark-submit
        # (pre-launched gateway, user driver-java-options win) keep Spark's
        # 30min default. ContextCleaner reads the interval once at start,
        # so the decision must be made here, not post-hoc.
        .config(
            "spark.cleaner.periodicGC.interval",
            "90s" if _will_launch_jvm() else "30min",
        )
        # ... and make that periodic System.gc() CONCURRENT: on G1 an
        # explicit GC is otherwise a single-threaded stop-the-world full
        # collection — measured here (r11 opt): multi-second pauses landing
        # stochastically inside whichever query was running (readability_docs
        # 0.8s -> 10.8s median when one spanned its runs). With
        # ExplicitGCInvokesConcurrent the periodic trigger starts a
        # concurrent G1 cycle instead; weak references are still processed
        # at remark, so ContextCleaner keeps reclaiming broadcast/
        # checkpoint blocks, at millisecond pause cost. local mode runs
        # executors in the driver JVM, so the driver option covers both;
        # the executor option is set for cluster deployments.
        .config("spark.driver.extraJavaOptions", "-XX:+ExplicitGCInvokesConcurrent")
        .config("spark.executor.extraJavaOptions", "-XX:+ExplicitGCInvokesConcurrent")
        # Session-owned: some testdata generations write events.ts as
        # TIMESTAMP(NANOS), which Spark 4 rejects without this shim. Declared
        # once here (not flipped inside read paths) so concurrent readers see
        # a stable session config; readers probe the footer type and convert.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def ensure_nanos_shim(spark: SparkSession) -> None:
    """Idempotently enable the session-owned TIMESTAMP(NANOS) shim.

    `spark.sql.legacy.parquet.nanosAsLong` has no per-read equivalent (probed:
    the reader option is ignored and the scan fails), so it is session config
    by necessity. `build_session` declares it at build time; this helper
    covers sessions built elsewhere (e.g. a harness-owned session passed into
    `queries()`). It is monotone — only ever sets the same `true` value, never
    flips it back — so concurrent readers observe a stable session config."""
    if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def get_session() -> SparkSession:
    """Return the active session or build one with defaults."""
    active = SparkSession.getActiveSession()
    return active if active is not None else build_session()


def lineage_pin(df, eager: bool = False, rebalance: bool = False):
    """Cut lineage for a multiply-referenced frame, deployment-aware.

    The analytic operators pin intermediate frames (token sets, signatures,
    iteration states) so Catalyst doesn't re-derive them from the corpus
    scan per consumer. `localCheckpoint` blocks live ONLY in executor
    storage — fast, but executor loss or dynamic-allocation downscaling
    makes the job unrecoverable instead of recomputable (r9 ADVICE). This
    helper keeps the single-box default and lets large dynamic-allocation
    deployments choose, via session conf `spark.smartdatalake.lineagePin`:

      * ``local`` (default) — ``df.localCheckpoint(eager)``: executor-
        storage blocks, no configuration needed, not fault-tolerant.
      * ``reliable`` — ``df.checkpoint(eager)``: writes to the configured
        ``spark.sparkContext.setCheckpointDir`` location (HDFS/S3),
        survives executor loss; requires a checkpoint dir or Spark raises.
      * ``off`` — return the frame unpinned: every consumer recomputes
        from source (fully recoverable, possibly much slower — iterative
        operators like PageRank/connected-components grow their plan per
        iteration without a cut).
    """
    mode = df.sparkSession.conf.get("spark.smartdatalake.lineagePin", "local")
    if mode == "off":
        return df
    pinned = df.checkpoint(eager=eager) if mode == "reliable" else df.localCheckpoint(eager=eager)
    if rebalance:
        # A checkpoint freezes its RDD's partitioning, and AQE coalesces a
        # small shuffle to ONE partition — so every downstream stage of a
        # pinned small frame runs single-task unless another exchange
        # intervenes (measured r11: jaccard candidate+verify = 9.2s + 6.1s
        # single-task jobs, 15s of a 20s query on one of 32 cores).
        # `rebalance=True` restores the cluster's parallelism for pins that
        # feed per-row-expensive stages. Scale-adaptive, not a local tune:
        # partition count is known without a job (the checkpoint's RDD
        # lineage carries it), and at production scale a checkpoint holds
        # >= defaultParallelism partitions, making this a no-op; the
        # explicit-N repartition is exempt from AQE re-coalescing.
        # Two documented costs of this path (r11 ADVICE): (a) `.rdd`
        # finalizes the AQE plan, so an eager=False pin becomes SEMI-eager
        # here — upstream shuffle stages materialize at pin time (the
        # checkpoint blocks themselves still fill lazily); (b) the returned
        # repartition is itself unpinned, so each separate ACTION on the
        # frame re-runs the round-robin exchange from the checkpoint
        # blocks — cheap (no source recompute) but not free; callers
        # driving MANY actions over one pin should pin the rebalanced
        # frame again themselves.
        sc = df.sparkSession.sparkContext
        if pinned.rdd.getNumPartitions() < sc.defaultParallelism:
            return pinned.repartition(sc.defaultParallelism)
    return pinned


def release_persistent_rdds(spark: SparkSession) -> None:
    """Unpersist every pinned RDD (persist()/localCheckpoint() blocks).

    Shared by bench.py and tools/scaling_check.py: long-lived measurement
    sessions that run a hundred-plus queries otherwise accumulate
    storage-memory pressure that inflates later queries' timings 2-4x
    (measured twice: json_extract_events 6.4s in-suite vs 1.7s isolated;
    ivfpq 10x 21.1s in-suite vs 5.5s fresh-session) — cross-query
    interference, not plan cost. Best-effort: hygiene must not fail the
    caller."""
    try:
        jsc = spark.sparkContext._jsc.sc()
        for rdd in spark.sparkContext._jvm.scala.collection.JavaConverters.mapAsJavaMap(
            jsc.getPersistentRDDs()
        ).values():
            rdd.unpersist(False)
    except Exception:  # noqa: BLE001
        pass
