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

    # -- StreamingQueryListener interface ---------------------------------
    def onQueryStarted(self, event) -> None:
        with self._lock:
            self._metrics.setdefault(
                event.name or str(event.id),
                {"streaming_batches": 0, "records_written": 0, "active": True},
            )

    def onQueryProgress(self, event) -> None:
        p = event.progress
        name = p.name or str(p.id)
        with self._lock:
            m = self._metrics.setdefault(
                name, {"streaming_batches": 0, "records_written": 0, "active": True}
            )
            m["streaming_batches"] += 1
            m["records_written"] += int(p.numInputRows or 0)
            if p.sources:
                m["latest_offset"] = p.sources[0].endOffset

    def onQueryIdle(self, event) -> None:
        pass

    def onQueryTerminated(self, event) -> None:
        with self._lock:
            for m in self._metrics.values():
                m["active"] = False

    # -- driver-side access ------------------------------------------------
    def metrics_for(self, query_name: str) -> dict[str, Any]:
        with self._lock:
            return dict(self._metrics.get(query_name, {}))


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
