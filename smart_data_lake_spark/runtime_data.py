"""Per-action runtime event & metric store.

Rebuilds `workflow/action/RuntimeData.scala` (SynchronousRuntimeData /
AsynchronousRuntimeData): each action accumulates lifecycle events
(phase + state per execution) and per-DataObject metrics, keyed by an
execution id, with housekeeping that keeps only the last
`number_of_executions_to_keep` executions. The asynchronous variant serves
streaming actions, where the DAG's synchronous run only bootstraps the
query and the CURRENT state belongs to the latest streaming micro-batch
execution — synchronous events are still recorded but are never "current".

Driver-side bookkeeping only: O(events), never O(data).
"""

from __future__ import annotations

import datetime
from dataclasses import dataclass, field
from typing import Any


@dataclass(frozen=True, order=True)
class SDLExecutionId:
    """Synchronous DAG run execution id; ORDERED by (run_id, attempt_id)
    (ExecutionId.scala compare / ExecutionIdTest)."""

    run_id: int = 1
    attempt_id: int = 1


@dataclass(frozen=True, order=True)
class StreamingExecutionId:
    """Asynchronous (streaming micro-batch) execution id, ordered by
    batch_id (SparkStreamingExecutionId compare)."""

    batch_id: int = 0


@dataclass
class RuntimeEvent:
    ts: datetime.datetime
    phase: str  # Prepare/Init/Exec
    state: str  # STARTED/PREPARED/INITIALIZED/SUCCEEDED/FAILED/SKIPPED/CANCELLED
    msg: str | None = None
    results: list[Any] = field(default_factory=list)

    @property
    def is_final(self) -> bool:
        return self.state in ("SUCCEEDED", "FAILED", "SKIPPED", "CANCELLED")


@dataclass
class GenericMetrics:
    id: str
    order: int
    main_infos: dict[str, Any] = field(default_factory=dict)


@dataclass
class RuntimeInfo:
    state: str | None
    started: datetime.datetime | None
    duration: datetime.timedelta | None
    msg: str | None
    results: list[Any]
    input_ids: list[str]
    output_ids: list[str]
    partition_values: list[Any]


class RuntimeData:
    """Base store: events and metrics per execution id, bounded history."""

    def __init__(self, number_of_executions_to_keep: int = 10) -> None:
        self.keep = number_of_executions_to_keep
        # insertion-ordered: execution id -> events / (do_id -> metrics)
        self._events: dict[Any, list[RuntimeEvent]] = {}
        self._metrics: dict[Any, dict[str, list[GenericMetrics]]] = {}

    # ------------------------------------------------------------ storage
    def _housekeeping(self) -> None:
        while len(self._events) > self.keep:
            oldest = next(iter(self._events))
            self._events.pop(oldest, None)
            self._metrics.pop(oldest, None)

    def add_event(self, execution_id: Any, event: RuntimeEvent) -> None:
        self._events.setdefault(execution_id, []).append(event)
        self._housekeeping()

    # ------------------------------------------------------------ current
    def _current_execution_id(self) -> Any | None:
        raise NotImplementedError

    def get_events(self, execution_id: Any | None = None) -> list[RuntimeEvent]:
        if execution_id is None:
            execution_id = self._current_execution_id()
        return list(self._events.get(execution_id, []))

    def get_latest_event_state(self) -> str | None:
        events = self.get_events()
        return events[-1].state if events else None

    # ------------------------------------------------------------ metrics
    def add_metric(
        self, execution_id: Any | None, data_object_id: str, metric: GenericMetrics
    ) -> None:
        if execution_id is None:
            execution_id = self._current_execution_id()
        self._metrics.setdefault(execution_id, {}).setdefault(data_object_id, []).append(metric)

    def get_metrics(
        self, data_object_id: str, execution_id: Any | None = None
    ) -> list[GenericMetrics]:
        if execution_id is None:
            execution_id = self._current_execution_id()
        return list(self._metrics.get(execution_id, {}).get(data_object_id, []))

    # ------------------------------------------------------------ summary
    def get_runtime_info(
        self,
        input_ids: list[str] | None = None,
        output_ids: list[str] | None = None,
        partition_values: list[Any] | None = None,
    ) -> RuntimeInfo | None:
        """Summarize the current execution: final state, start time, and
        STARTED->final duration (RuntimeData.getRuntimeInfo)."""
        events = self.get_events()
        if not events:
            return None
        started = next((e.ts for e in events if e.state == "STARTED"), events[0].ts)
        last = events[-1]
        duration = (last.ts - started) if last.is_final else None
        return RuntimeInfo(
            state=last.state,
            started=started,
            duration=duration,
            msg=last.msg,
            results=list(last.results),
            input_ids=list(input_ids or []),
            output_ids=list(output_ids or []),
            partition_values=list(partition_values or []),
        )


class SynchronousRuntimeData(RuntimeData):
    """Current execution = the latest execution of any kind."""

    def _current_execution_id(self) -> Any | None:
        return next(reversed(self._events), None)


class AsynchronousRuntimeData(RuntimeData):
    """Current execution = the latest ASYNCHRONOUS (streaming) execution;
    synchronous bootstrap events are recorded but never current. Metrics
    attributed to an asynchronous execution must name one that has already
    produced an event (RuntimeData.scala's assertion)."""

    @staticmethod
    def _is_async(execution_id: Any) -> bool:
        return isinstance(execution_id, StreamingExecutionId)

    def _current_execution_id(self) -> Any | None:
        return next(
            (eid for eid in reversed(self._events) if self._is_async(eid)), None
        )

    def add_metric(
        self, execution_id: Any | None, data_object_id: str, metric: GenericMetrics
    ) -> None:
        if execution_id is not None and self._is_async(execution_id):
            assert execution_id in self._events, (
                f"metric for unknown asynchronous execution {execution_id}"
            )
        super().add_metric(execution_id, data_object_id, metric)
