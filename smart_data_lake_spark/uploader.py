"""Run-state upload to a UI backend — StateUploader/UIBackendConfig parity.

The reference ships run states to the SDLB UI backend
(`sdl-core/.../util/misc/StateUploader.scala` +
`app/UIBackendConfig.scala`): the FIRST notification of an execution and
the FINAL one upload the full state JSON (POST `{baseUrl}/state` with
tenant/repo/env query params); intermediate notifications PATCH just the
changed action's state (best-effort — failures only warn). A failed
full-state upload is staged to ``stagePath`` and retried at the start of
the next run (so transient backend outages never lose run history), or —
with no stagePath configured — raised so the operator notices.

Rebuilt on stdlib urllib with the typed auth-mode family providing
headers; configured via ``globalConfig.uiBackend``.
"""

from __future__ import annotations

import json
import logging
import os
import urllib.error
import urllib.parse
import urllib.request
from typing import Any

from .azure import StateListener

logger = logging.getLogger(__name__)


class UploadService:
    """POST/PATCH JSON bodies to `{base_url}/{operation}` with the fixed
    tenant/repo/env params (UIBackendConfig.getUploadService)."""

    def __init__(
        self,
        base_url: str,
        tenant: str = "PrivateTenant",
        repo: str = "",
        env: str = "std",
        auth: Any | None = None,
        timeout_sec: float = 30.0,
    ) -> None:
        self.base_url = base_url.rstrip("/")
        self.params = {"tenant": tenant, "repo": repo, "env": env}
        self.auth = auth
        self.timeout_sec = timeout_sec

    def send(
        self,
        operation: str,
        body: str | bytes,
        method: str = "POST",
        additional_params: dict[str, str] | None = None,
    ) -> None:
        params = {**self.params, **(additional_params or {})}
        url = f"{self.base_url}/{operation}?{urllib.parse.urlencode(params)}"
        data = body.encode("utf-8") if isinstance(body, str) else body
        headers = {"Content-Type": "application/json"}
        if self.auth is not None:
            headers.update(self.auth.get_headers())
        req = urllib.request.Request(url, data=data, headers=headers, method=method)
        with urllib.request.urlopen(req, timeout=self.timeout_sec) as resp:
            if resp.status >= 300:
                raise urllib.error.HTTPError(
                    url, resp.status, f"{method} {operation} failed", resp.headers, None
                )


def _state_json(state: Any) -> str:
    import dataclasses

    if dataclasses.is_dataclass(state) and not isinstance(state, type):
        return json.dumps(dataclasses.asdict(state), default=str)
    return json.dumps(state, default=str)


class StateUploader(StateListener):
    """StateListener shipping run states to an `UploadService`
    (StateUploader.scala:30-80 semantics — see module docstring)."""

    OPERATION = "state"

    def __init__(
        self,
        uploader: UploadService,
        stage_path: str | None = None,
        process_updates: bool = True,
    ) -> None:
        self.uploader = uploader
        self.stage_path = stage_path
        self.process_updates = process_updates
        self._uploaded_execution_ids: set[tuple[int, int]] = set()

    # -- staged-retry store (HadoopFileActionDAGRunStateStore analog on fs)

    def _staged_files(self) -> list[str]:
        if not self.stage_path or not os.path.isdir(self.stage_path):
            return []
        return sorted(
            os.path.join(self.stage_path, f)
            for f in os.listdir(self.stage_path)
            if f.endswith(".json")
        )

    def _stage(self, state: Any) -> None:
        assert self.stage_path is not None
        os.makedirs(self.stage_path, exist_ok=True)
        run_id = getattr(state, "run_id", 0)
        attempt_id = getattr(state, "attempt_id", 0)
        path = os.path.join(self.stage_path, f"state_run{run_id}_attempt{attempt_id}.json")
        with open(path, "w") as f:
            f.write(_state_json(state))

    def init(self, context: dict[str, Any]) -> None:
        """Retry staged uploads from previous runs; stop (and keep the rest
        staged) on the first failure — next run retries again."""
        self._uploaded_execution_ids.clear()
        staged = self._staged_files()
        if staged:
            logger.info("retrying %d staged state uploads", len(staged))
        for path in staged:
            try:
                with open(path) as f:
                    self.uploader.send(self.OPERATION, f.read())
                os.remove(path)
            except Exception as e:  # noqa: BLE001 — retried next run
                logger.error("staged upload retry failed (will retry next run): %s", e)
                return

    # ------------------------------------------------------------- notify

    def notify_state(self, state: Any, context: dict[str, Any], changed_action_id: str | None) -> None:
        execution_id = (getattr(state, "run_id", 0), getattr(state, "attempt_id", 0))
        is_first = execution_id not in self._uploaded_execution_ids
        is_final = bool(getattr(state, "is_final", False))
        if is_first or is_final:
            self._uploaded_execution_ids.add(execution_id)
            try:
                self.uploader.send(self.OPERATION, _state_json(state))
            except Exception as e:  # noqa: BLE001 — stage or surface
                if self.stage_path:
                    logger.warning(
                        "state upload failed, staged for retry next run: %s", e
                    )
                    self._stage(state)
                else:
                    logger.error(
                        "state upload failed and no stagePath configured: %s", e
                    )
                    raise
        elif self.process_updates and changed_action_id is not None:
            run_params = {
                "application": str(context.get("application", "sdl")),
                "runId": str(execution_id[0]),
                "attemptId": str(execution_id[1]),
                "actionId": changed_action_id,
            }
            body = json.dumps(
                {"state": getattr(state, "action_states", {}).get(changed_action_id)}
            )
            try:
                self.uploader.send(self.OPERATION, body, "PATCH", run_params)
            except Exception as e:  # noqa: BLE001 — updates are best-effort
                logger.warning("state update upload failed for %s: %s", changed_action_id, e)


def ui_backend_from_config(spec: dict[str, Any]) -> StateUploader:
    """Build a StateUploader from a ``globalConfig.uiBackend`` section
    (UIBackendConfig fields: baseUrl, tenant, repo, env, authMode,
    stagePath, processUpdates)."""
    auth = None
    auth_spec = spec.get("authMode")
    if auth_spec:
        from . import auth_modes

        from .config import _snake_kwargs

        kind = auth_spec.get("type") or auth_spec.get("className")
        opts = {k: v for k, v in auth_spec.items() if k not in ("type", "className")}
        cls = getattr(auth_modes, str(kind), None)
        if cls is None:
            raise ValueError(f"unknown uiBackend authMode type {kind!r}")
        auth = cls(**_snake_kwargs(opts))
    svc = UploadService(
        base_url=spec["baseUrl"],
        tenant=spec.get("tenant", "PrivateTenant"),
        repo=spec.get("repo", ""),
        env=spec.get("env", "std"),
        auth=auth,
    )
    return StateUploader(
        svc,
        stage_path=spec.get("stagePath"),
        process_updates=bool(spec.get("processUpdates", True)),
    )
