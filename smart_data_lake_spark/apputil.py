"""App-level utilities: memory logger, build-version info, SDL plugin hooks.

Parity targets:
  * `util/misc/MemoryUtils.scala` + `app/MemoryLogger.scala` — a periodic
    timer logging process + (on Linux) /proc + cgroup memory; driven by
    ``globalConfig.memoryLogTimer {intervalSec, logLinuxMem,
    logLinuxCGroupMem}``.
  * `app/VersionInfoWriter.scala` — writes ``*-version-info.properties``
    build metadata a deployed pipeline exposes for support tickets.
  * `app/SDLPlugin.scala` / `ModulePlugin.scala` — the
    startup/configure/shutdown extension hook selected via
    ``globalConfig.sdlPluginClassName`` + ``pluginOptions``.
"""

from __future__ import annotations

import importlib
import logging
import os
import threading
import time
from typing import Any

logger = logging.getLogger(__name__)


# ------------------------------------------------------------- memory logger

def collect_memory_stats(
    log_linux_mem: bool = True, log_cgroup_mem: bool = False
) -> dict[str, Any]:
    """Point-in-time memory stats (MemoryUtils.getMemoryUtilization +
    getLinuxMem/getCGroupMem): python RSS/VMS from /proc, thread count,
    optional cgroup-v2 usage/limit. All reads are best-effort — a missing
    procfs entry yields an absent key, never an exception."""
    stats: dict[str, Any] = {"threads": threading.active_count()}
    if log_linux_mem:
        try:
            with open("/proc/self/status") as f:
                for line in f:
                    if line.startswith(("VmRSS:", "VmSize:", "VmHWM:")):
                        key, val = line.split(":", 1)
                        stats[key.lower()] = val.strip()
        except OSError:
            pass
        try:
            load1, load5, load15 = os.getloadavg()
            stats["loadavg_1m"] = round(load1, 2)
        except OSError:
            pass
    if log_cgroup_mem:
        for key, path in (
            ("cgroup_current", "/sys/fs/cgroup/memory.current"),
            ("cgroup_max", "/sys/fs/cgroup/memory.max"),
        ):
            try:
                with open(path) as f:
                    stats[key] = f.read().strip()
            except OSError:
                pass
    return stats


class MemoryLogTimer:
    """Periodic memory logging (MemoryLogTimerConfig.startTimer): a daemon
    thread logs `collect_memory_stats` every ``interval_sec`` until
    ``stop()``. Config shape mirrors the reference
    (intervalSec/logLinuxMem/logLinuxCGroupMem)."""

    def __init__(
        self,
        interval_sec: int,
        log_linux_mem: bool = True,
        log_cgroup_mem: bool = False,
    ) -> None:
        self.interval_sec = interval_sec
        self.log_linux_mem = log_linux_mem
        self.log_cgroup_mem = log_cgroup_mem
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    @classmethod
    def from_config(cls, spec: dict[str, Any]) -> "MemoryLogTimer":
        return cls(
            interval_sec=int(spec.get("intervalSec", 60)),
            log_linux_mem=bool(spec.get("logLinuxMem", True)),
            log_cgroup_mem=bool(spec.get("logLinuxCGroupMem", False)),
        )

    def start(self) -> None:
        if self._thread is not None:
            return
        self._stop.clear()

        def loop() -> None:
            while not self._stop.is_set():
                stats = collect_memory_stats(self.log_linux_mem, self.log_cgroup_mem)
                logger.info(
                    "memory info %s",
                    ", ".join(f"{k}={v}" for k, v in stats.items()),
                )
                self._stop.wait(self.interval_sec)

        self._thread = threading.Thread(target=loop, daemon=True, name="sdl-memlog")
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None


# ---------------------------------------------------------- version info

def write_build_version_info(
    output_dir: str, version: str | None = None, app: bool = False
) -> str:
    """VersionInfoWriter.main: write `sdlb-version-info.properties` (or
    `app-version-info.properties` with app=True) carrying version + build
    metadata; returns the file path."""
    os.makedirs(output_dir, exist_ok=True)
    name = "app-version-info.properties" if app else "sdlb-version-info.properties"
    path = os.path.join(output_dir, name)
    try:
        from importlib.metadata import version as _pkg_version

        default_version = _pkg_version("smart_data_lake_spark")
    except Exception:  # noqa: BLE001 — not an installed dist in-repo
        default_version = "0.0.0-dev"
    info = {
        "version": version or default_version,
        "user": os.environ.get("USER", "unknown"),
        "buildTimestamp": time.strftime("%Y-%m-%dT%H:%M:%S%z"),
    }
    with open(path, "w") as f:
        for k, v in info.items():
            f.write(f"{k}={v}\n")
    return path


def read_version_info(path: str) -> dict[str, str]:
    out: dict[str, str] = {}
    with open(path) as f:
        for line in f:
            if "=" in line:
                k, _, v = line.partition("=")
                out[k.strip()] = v.strip()
    return out


# ------------------------------------------------------------- SDL plugin

class SDLPlugin:
    """Extension hook (SDLPlugin.scala): `startup` fires before config
    parsing (log/credential setup), `configure` gets
    globalConfig.pluginOptions, `shutdown` fires on ordinary exit."""

    def startup(self) -> None:  # noqa: B027
        pass

    def configure(self, options: dict[str, Any]) -> None:  # noqa: B027
        pass

    def shutdown(self) -> None:  # noqa: B027
        pass


_PLUGIN_INSTANCES: dict[str, SDLPlugin] = {}


def load_sdl_plugin(class_name: str) -> SDLPlugin:
    """Instantiate (once) the plugin class named by
    ``globalConfig.sdlPluginClassName`` (module.Class dotted path). The
    instance is cached per class name so the CLI's early ``startup()`` and
    ``load_config``'s ``configure()`` hit the SAME object — the reference
    keeps one Environment.sdlPlugin, and a stateful plugin (credential
    cache, log handler) must not be duplicated."""
    cached = _PLUGIN_INSTANCES.get(class_name)
    if cached is not None:
        return cached
    mod_name, _, attr = class_name.rpartition(".")
    if not mod_name:
        raise ValueError(
            f"sdlPluginClassName must be a dotted module.Class path, got {class_name!r}"
        )
    plugin = getattr(importlib.import_module(mod_name), attr)()
    if not hasattr(plugin, "configure") or not hasattr(plugin, "shutdown"):
        raise TypeError(f"{class_name} does not implement the SDLPlugin protocol")
    _PLUGIN_INSTANCES[class_name] = plugin
    return plugin


def mask_secrets_in_conf(conf: dict) -> dict:
    """Mask values of config keys that look secret-bearing before logging
    (AppUtil 'mask secrets when logging spark conf'): keys containing
    secret/password/token/passphrase/credential are replaced with '***';
    ordinary keys pass through untouched."""
    import re

    sensitive = re.compile(r"(?i)secret|password|token|passphrase|credential")
    return {k: ("***" if sensitive.search(k) else v) for k, v in conf.items()}
