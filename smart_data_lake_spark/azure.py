"""Azure integrations rebuilt on public REST protocols with stdlib HTTP.

Reference module ``sdl-azure``:

* ``util/azure/LogAnalyticsBackend.scala`` + ``client/loganalytics/
  LogAnalyticsClient.java`` — the Log Analytics **HTTP Data Collector API**
  (public protocol: POST ``https://<workspace>.ods.opinsights.azure.com/api/
  logs?api-version=2016-04-01`` with a SharedKey HMAC-SHA256 signature over
  ``POST\\n<len>\\napplication/json\\nx-ms-date:<rfc1123>\\n/api/logs``).
* ``util/azure/StateChangeLogger.scala`` — a StateListener that flattens
  run-state changes into per-action log events and ships them in batches of
  100 (the service limit).
* ``util/azure/AzureKeyVaultSecretProvider.scala`` — secrets resolved from
  Key Vault's public REST surface (``GET <vault>/secrets/<name>?api-version=
  7.4`` with an AAD bearer token from the client-credentials grant).

Everything here is wire-format-real and endpoint-overridable so tests run
against a local mock server (the Splunk/JMS pattern); no Azure SDK needed.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import json
import time
import urllib.parse
import urllib.request
from email.utils import formatdate
from typing import Any

from smart_data_lake_spark.config import ConfigError, resolve_secret


class LogAnalyticsClient:
    """Data Collector API client (LogAnalyticsClient.java:40-150).

    ``endpoint`` overrides the ``https://<workspaceId>.<urlSuffix>`` base for
    tests; the path+query and every header match the public API contract.
    """

    RESOURCE = "/api/logs"
    CONTENT_TYPE = "application/json"

    def __init__(
        self,
        workspace_id: str,
        workspace_key: str,
        url_suffix: str = "ods.opinsights.azure.com",
        api_version: str = "2016-04-01",
        endpoint: str | None = None,
    ) -> None:
        if not workspace_id or not workspace_key:
            raise ConfigError("LogAnalyticsClient requires workspace_id and workspace_key")
        self.workspace_id = workspace_id
        self.workspace_key = workspace_key
        base = endpoint or f"https://{workspace_id}.{url_suffix}"
        self.url = f"{base}{self.RESOURCE}?api-version={api_version}"

    def _signature(self, date_str: str, content_length: int) -> str:
        string_to_hash = (
            f"POST\n{content_length}\n{self.CONTENT_TYPE}\n"
            f"x-ms-date:{date_str}\n{self.RESOURCE}"
        )
        key = base64.b64decode(resolve_secret(self.workspace_key))
        digest = hmac.new(key, string_to_hash.encode("utf-8"), hashlib.sha256).digest()
        return f"SharedKey {self.workspace_id}:{base64.b64encode(digest).decode()}"

    def send(self, body: str, log_type: str, timestamp_field: str | None = None) -> None:
        if not body or not log_type:
            raise ValueError("body and log_type are required")
        data = body.encode("utf-8")
        date_str = formatdate(timeval=None, usegmt=True)  # RFC 1123 GMT
        headers = {
            "Content-Type": self.CONTENT_TYPE,
            "Log-Type": log_type,
            "x-ms-date": date_str,
            "Authorization": self._signature(date_str, len(data)),
        }
        if timestamp_field:
            headers["time-generated-field"] = timestamp_field
        req = urllib.request.Request(self.url, data=data, headers=headers, method="POST")
        with urllib.request.urlopen(req, timeout=30) as resp:
            if resp.status != 200:
                raise IOError(f"Error sending Log Analytics events: {resp.status}")


class LogAnalyticsBackend:
    """Backend contract (LogAnalyticsBackend.scala:26-29)."""

    batch_size = 100

    def send(self, events: list[dict]) -> None:
        raise NotImplementedError


class LogAnalyticsHttpCollectorBackend(LogAnalyticsBackend):
    """Data-Collector-API backend: JSON-array body per <=100-event group
    (LogAnalyticsBackend.scala:34-44)."""

    batch_size = 100  # azure log analytics' limit

    def __init__(
        self,
        workspace_id: str,
        workspace_key: str,
        log_type: str = "sdlb_state",
        endpoint: str | None = None,
    ) -> None:
        self.log_type = log_type
        self.client = LogAnalyticsClient(workspace_id, workspace_key, endpoint=endpoint)

    def send(self, events: list[dict]) -> None:
        for i in range(0, len(events), self.batch_size):
            group = events[i : i + self.batch_size]
            self.client.send(json.dumps(group, default=str), self.log_type)


class StateListener:
    """Run-state observer (workflow/StateListener trait): ``notify_state``
    fires after every action-state change and once more with the final
    state. Listener errors are logged, never propagated into the run."""

    def init(self, context: dict[str, Any]) -> None:  # noqa: B027
        pass

    def notify_state(self, state: Any, context: dict[str, Any], changed_action_id: str | None) -> None:
        raise NotImplementedError


class StateChangeLogger(StateListener):
    """Ship per-action state-change events to Log Analytics
    (StateChangeLogger.scala:43-120).

    Options (secret-provider syntax supported): ``workspaceId`` +
    ``workspaceKey`` [+ ``logType``] select the HTTP Data Collector backend.
    One event per action result (or one per action when it has no results):
    context fields (application/runId/attemptId/phase/isFinal) + actionId,
    state, metrics, dataObjectId.
    """

    def __init__(self, options: dict[str, Any] | None = None, backend: LogAnalyticsBackend | None = None) -> None:
        options = options or {}
        self.include_metadata = str(options.get("includeMetadata", "false")).lower() == "true"
        if backend is not None:
            self.backend = backend
        elif "workspaceId" in options:
            self.backend = LogAnalyticsHttpCollectorBackend(
                workspace_id=resolve_secret(options["workspaceId"]),
                workspace_key=options.get("workspaceKey")
                or _missing(options, "workspaceKey"),
                log_type=resolve_secret(options.get("logType", "sdlb_state")),
                endpoint=options.get("endpoint"),  # test hook
            )
        else:
            raise ConfigError(
                "StateChangeLogger needs workspaceId/workspaceKey options (HTTP "
                "Data Collector backend) or an explicit backend instance"
            )

    def extract_log_events(
        self, action_id: str, state: Any, context: dict[str, Any]
    ) -> list[dict]:
        action_state = state.action_states.get(action_id)
        metrics = state.action_metrics.get(action_id) or {}
        base = {
            **context,
            "actionId": action_id,
            "state": action_state,
        }
        if isinstance(metrics, dict) and metrics:
            # one event per output data object when metrics are per-object
            if all(isinstance(v, dict) for v in metrics.values()):
                return [
                    {**base, "dataObjectId": do_id, "metrics": json.dumps(m, default=str)}
                    for do_id, m in metrics.items()
                ]
            return [{**base, "metrics": json.dumps(metrics, default=str)}]
        return [base]

    def notify_state(self, state: Any, context: dict[str, Any], changed_action_id: str | None) -> None:
        log_context = {
            "application": context.get("application", "sdl"),
            "runId": state.run_id,
            "attemptId": state.attempt_id,
            "phase": context.get("phase", "exec"),
            "isFinal": state.is_final,
        }
        if state.is_final and changed_action_id is None:
            events = [
                e
                for aid in state.action_states
                for e in self.extract_log_events(aid, state, log_context)
            ]
        elif changed_action_id is not None:
            events = self.extract_log_events(changed_action_id, state, log_context)
        else:
            return
        if events:
            self.backend.send(events)


def _missing(options: dict, key: str) -> Any:
    raise ConfigError(f"Option {key} needed for StateChangeLogger")


class AzureKeyVaultSecretProvider:
    """Key Vault secret provider (AzureKeyVaultSecretProvider.scala) on the
    public REST surface. Register it like any custom provider::

        from smart_data_lake_spark.config import register_secret_provider
        provider = AzureKeyVaultSecretProvider(vault_url, tenant_id, client_id, client_secret)
        register_secret_provider("AZKV", provider)

    then config values written ``AZKV#my-secret-name`` resolve at use time.
    The AAD token comes from the client-credentials grant against
    ``login.microsoftonline.com/<tenant>/oauth2/v2.0/token`` with scope
    ``https://vault.azure.net/.default``; both endpoints are overridable for
    mocked tests.
    """

    API_VERSION = "7.4"

    def __init__(
        self,
        vault_url: str,
        tenant_id: str | None = None,
        client_id: str | None = None,
        client_secret: str | None = None,
        token_endpoint: str | None = None,
        scope: str = "https://vault.azure.net/.default",
    ) -> None:
        if not vault_url:
            raise ConfigError("AzureKeyVaultSecretProvider requires vault_url")
        if token_endpoint is None and not tenant_id:
            raise ConfigError("AzureKeyVaultSecretProvider requires tenant_id (or token_endpoint)")
        self.vault_url = vault_url.rstrip("/")
        self.client_id = client_id
        self.client_secret = client_secret
        self.scope = scope
        self.token_endpoint = (
            token_endpoint
            or f"https://login.microsoftonline.com/{tenant_id}/oauth2/v2.0/token"
        )
        self._token: str | None = None
        self._expiry = 0.0

    def _bearer(self) -> str:
        if self._token is None or time.monotonic() >= self._expiry - 30:
            body = urllib.parse.urlencode(
                {
                    "grant_type": "client_credentials",
                    "client_id": resolve_secret(self.client_id or ""),
                    "client_secret": resolve_secret(self.client_secret or ""),
                    "scope": self.scope,
                }
            ).encode()
            req = urllib.request.Request(
                self.token_endpoint,
                data=body,
                headers={"Content-Type": "application/x-www-form-urlencoded"},
                method="POST",
            )
            with urllib.request.urlopen(req, timeout=30) as resp:
                payload = json.loads(resp.read().decode())
            self._token = payload["access_token"]
            self._expiry = time.monotonic() + float(payload.get("expires_in", 3600))
        return self._token

    def __call__(self, name: str) -> str:
        """Fetch one secret's current value — the provider-function contract
        of ``register_secret_provider``."""
        url = f"{self.vault_url}/secrets/{urllib.parse.quote(name)}?api-version={self.API_VERSION}"
        req = urllib.request.Request(
            url, headers={"Authorization": f"Bearer {self._bearer()}"}, method="GET"
        )
        with urllib.request.urlopen(req, timeout=30) as resp:
            payload = json.loads(resp.read().decode())
        return payload["value"]


class LogAnalyticsLogHandler:
    """`logging.Handler` analog of the reference's log4j2
    ``LogAnalyticsAppender`` (LogAnalyticsAppender.scala:30-80): buffers log
    records, flushes to the backend when the buffer reaches the backend's
    batch size or after ``max_delay_sec`` since the first buffered record,
    skips HTTP-client loggers to avoid send loops, never raises into the
    logging call.

    Implemented as a ``logging.Handler`` subclass at import time would tie
    the module to handler registration; instead this factory builds one::

        handler = LogAnalyticsLogHandler.build(backend)
        logging.getLogger().addHandler(handler)
    """

    @staticmethod
    def build(backend: LogAnalyticsBackend, max_delay_sec: float = 5.0):
        import logging
        import threading as _threading

        class _Handler(logging.Handler):
            def __init__(self) -> None:
                super().__init__()
                self._buf: list[dict] = []
                self._timer: _threading.Timer | None = None
                self._lock2 = _threading.Lock()

            def emit(self, record: logging.LogRecord) -> None:
                # avoid send loops: the backend's own HTTP machinery logs
                # through urllib/http.client
                if record.name.startswith(("urllib", "http.client")):
                    return
                event = {
                    "timestamp": record.created,
                    "level": record.levelname,
                    "logger": record.name,
                    "message": record.getMessage(),
                }
                if record.exc_info and record.exc_info[0] is not None:
                    import traceback as _tb

                    event["exception"] = "".join(_tb.format_exception(*record.exc_info))[:4000]
                flush_now = False
                with self._lock2:
                    self._buf.append(event)
                    if len(self._buf) >= backend.batch_size:
                        flush_now = True
                    elif self._timer is None:
                        # a real timer, not an emit-driven check: a sub-batch
                        # buffer must still ship when logging goes quiet
                        # (r6 review finding)
                        self._timer = _threading.Timer(max_delay_sec, self.flush)
                        self._timer.daemon = True
                        self._timer.start()
                if flush_now:
                    self.flush()

            def flush(self) -> None:
                with self._lock2:
                    batch, self._buf = self._buf, []
                    if self._timer is not None:
                        self._timer.cancel()
                        self._timer = None
                if batch:
                    try:
                        backend.send(batch)
                    except Exception:  # noqa: BLE001 — a log sink must never raise
                        pass

            def close(self) -> None:
                self.flush()
                super().close()

        return _Handler()


class FinalStateWriter(StateListener):
    """Archive every FINAL run state to a second location (util/misc/
    FinalStateWriter.scala — long-term history separate from the working
    state dir, e.g. for audit/lineage tooling). ``options.path`` required."""

    def __init__(self, options: dict[str, Any] | None = None) -> None:
        options = options or {}
        if not options.get("path"):
            raise ConfigError("FinalStateWriter needs the 'path' option")
        self.path = resolve_secret(options["path"])

    def notify_state(self, state: Any, context: dict[str, Any], changed_action_id: str | None) -> None:
        if not state.is_final or changed_action_id is not None:
            return
        import os

        from smart_data_lake_spark.plans.dag import StateStore

        StateStore(os.path.join(self.path), app_name=context.get("application", "sdl")).save(state)


class FinalMetricsLogWriter(StateListener):
    """Persist final action + metrics logs into merge-capable table data
    objects (util/misc/FinalMetricsLogWriter.scala): one actionLog row per
    action per run (PK run_id/attempt_id/action_id) and one metricsLog row
    per (action, data object, metric) — the queryable run-history tables a
    lineage/monitoring UI reads. Both targets are looked up in the run's
    registry by id and written with MERGE so re-notifications upsert."""

    def __init__(self, options: dict[str, Any] | None = None) -> None:
        options = options or {}
        for key in ("metricsLogDataObjectId", "actionLogDataObjectId"):
            if not options.get(key):
                raise ConfigError(f"FinalMetricsLogWriter needs the {key!r} option")
        self.metrics_do_id = options["metricsLogDataObjectId"]
        self.action_do_id = options["actionLogDataObjectId"]

    def notify_state(self, state: Any, context: dict[str, Any], changed_action_id: str | None) -> None:
        if not state.is_final or changed_action_id is not None:
            return
        spark, registry = context.get("spark"), context.get("registry")
        if spark is None or registry is None:
            raise ConfigError("FinalMetricsLogWriter needs spark+registry in the listener context")
        from smart_data_lake_spark.save_modes import SaveMode

        app = context.get("application", "sdl")
        action_rows = [
            (app, state.run_id, state.attempt_id, aid, astate,
             str(state.action_metrics.get(aid, {}).get("duration_sec", "")))
            for aid, astate in sorted(state.action_states.items())
        ]
        metric_rows = []
        for aid, metrics in sorted(state.action_metrics.items()):
            if not isinstance(metrics, dict):
                continue
            for do_id, m in sorted(metrics.items()):
                if isinstance(m, dict):
                    for k, v in sorted(m.items()):
                        metric_rows.append((app, state.run_id, aid, do_id, k, str(v)))
                else:
                    metric_rows.append((app, state.run_id, aid, "", do_id, str(m)))
        action_df = spark.createDataFrame(
            action_rows,
            "application string, run_id int, attempt_id int, action_id string, "
            "state string, duration_sec string",
        )
        metrics_df = spark.createDataFrame(
            metric_rows or [("", 0, "", "", "", "")],
            "application string, run_id int, action_id string, data_object_id string, "
            "metric string, value string",
        )
        if not metric_rows:
            metrics_df = metrics_df.limit(0)
        registry.get_data_object(self.action_do_id).write_dataframe(
            action_df, save_mode=SaveMode.MERGE
        )
        registry.get_data_object(self.metrics_do_id).write_dataframe(
            metrics_df, save_mode=SaveMode.MERGE
        )
