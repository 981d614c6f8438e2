"""Structured-streaming support: query-progress metrics listener.

The reference collects per-microbatch metrics for async streaming queries with
a `StreamingQueryListener` and feeds them into the action's runtime metrics
(`workflow/action/DataFrameActionImpl.scala:410-477`, listener registration in
`app/DefaultSmartDataLakeBuilder`). This is the PySpark-native equivalent:
one process-wide listener keyed by query name, so any number of async
(processingTime-trigger) queries report batches/rows without polling.

`sync` triggers (once/availableNow) don't need the listener — the action reads
`query.recentProgress` after `awaitTermination()` (see actions/base.py).
"""

from __future__ import annotations

import threading
from typing import Any

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


class StreamingMetricsListener(StreamingQueryListener):
    """Accumulates per-query progress counters, keyed by query name.

    Thread-safe: Spark delivers events on its own listener-bus thread while
    actions read metrics from the driver thread.
    """

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._metrics: dict[str, dict[str, Any]] = {}
        # query id (stable across restarts of the same checkpointed query)
        # -> metrics key. Termination events carry only the id, so we need
        # this to flip active=False on exactly the terminated query.
        self._id_to_key: dict[str, str] = {}

    def _key_for(self, name: str | None, qid: Any) -> str:
        return name or str(qid)

    # -- StreamingQueryListener interface ---------------------------------
    def onQueryStarted(self, event) -> None:
        key = self._key_for(event.name, event.id)
        with self._lock:
            self._id_to_key[str(event.id)] = key
            m = self._metrics.setdefault(
                key, {"streaming_batches": 0, "records_written": 0, "active": True}
            )
            m["active"] = True

    def onQueryProgress(self, event) -> None:
        p = event.progress
        key = self._key_for(p.name, p.id)
        with self._lock:
            self._id_to_key[str(p.id)] = key
            m = self._metrics.setdefault(
                key, {"streaming_batches": 0, "records_written": 0, "active": True}
            )
            m["streaming_batches"] += 1
            m["records_written"] += int(p.numInputRows or 0)
            if p.sources:
                m["latest_offset"] = p.sources[0].endOffset

    def onQueryIdle(self, event) -> None:
        pass

    def onQueryTerminated(self, event) -> None:
        with self._lock:
            key = self._id_to_key.get(str(event.id))
            if key is not None and key in self._metrics:
                self._metrics[key]["active"] = False

    # -- driver-side access ------------------------------------------------
    def metrics_for(self, query_name: str) -> dict[str, Any]:
        with self._lock:
            return dict(self._metrics.get(query_name, {}))

    def reset(self, query_name: str | None = None) -> None:
        """Drop accumulated counters — per-query, or all (start of a DAG run)
        so successive runs in one process don't cross-contaminate."""
        with self._lock:
            if query_name is None:
                self._metrics.clear()
                self._id_to_key.clear()
            else:
                self._metrics.pop(query_name, None)
                self._id_to_key = {
                    i: k for i, k in self._id_to_key.items() if k != query_name
                }


_listener: StreamingMetricsListener | None = None
_listener_lock = threading.Lock()


def get_streaming_listener(spark: SparkSession) -> StreamingMetricsListener:
    """Register (once per process) and return the shared metrics listener."""
    global _listener
    with _listener_lock:
        if _listener is None:
            _listener = StreamingMetricsListener()
            spark.streams.addListener(_listener)
        return _listener


def dummy_streaming_df(spark: SparkSession, schema) -> "DataFrame":
    """Schema-only streaming DataFrame for the init phase.

    Reference: `util/spark/DummyStreamProvider` used at
    `DataFrameActionImpl.scala:171-174` — during init of a streaming action
    the real source must not be consumed (no offsets committed, no state
    touched), but downstream transforms and schema validation still need a
    DataFrame with `isStreaming=true` and the source's exact schema.

    Spark-first shape: the built-in `rate` source (never started — init never
    calls `writeStream`) projected onto null-cast columns of the target
    schema. Zero IO, zero Python, analysis-time only.
    """
    from pyspark.sql import functions as F

    rate = spark.readStream.format("rate").option("rowsPerSecond", "1").load()
    return rate.select([F.lit(None).cast(f.dataType).alias(f.name) for f in schema.fields])
