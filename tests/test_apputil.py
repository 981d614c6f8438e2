"""Memory logger, version-info writer, SDL plugin hooks
(MemoryUtils.scala / VersionInfoWriter.scala / SDLPlugin.scala parity)."""

from __future__ import annotations

import logging
import os
import sys
import time

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from smart_data_lake_spark.apputil import (
    MemoryLogTimer,
    SDLPlugin,
    collect_memory_stats,
    load_sdl_plugin,
    read_version_info,
    write_build_version_info,
)


def test_collect_memory_stats_linux():
    stats = collect_memory_stats(log_linux_mem=True, log_cgroup_mem=True)
    assert stats["threads"] >= 1
    assert "vmrss" in stats and stats["vmrss"].endswith("kB")


def test_memory_log_timer_emits_and_stops(caplog):
    timer = MemoryLogTimer.from_config({"intervalSec": 1, "logLinuxMem": True})
    with caplog.at_level(logging.INFO, logger="smart_data_lake_spark.apputil"):
        timer.start()
        timer.start()  # idempotent
        for _ in range(100):
            if any("memory info" in r.message for r in caplog.records):
                break
            time.sleep(0.05)
        timer.stop()
    assert any("memory info" in r.message and "vmrss" in r.message for r in caplog.records)
    assert timer._thread is None  # joined


def test_version_info_roundtrip(tmp_path):
    p = write_build_version_info(str(tmp_path), version="1.2.3")
    assert p.endswith("sdlb-version-info.properties")
    info = read_version_info(p)
    assert info["version"] == "1.2.3" and "buildTimestamp" in info
    p2 = write_build_version_info(str(tmp_path), app=True)
    assert p2.endswith("app-version-info.properties")
    assert read_version_info(p2)["version"]  # defaulted


class _Plugin(SDLPlugin):
    calls: list = []

    def startup(self):
        self.calls.append("startup")

    def configure(self, options):
        self.calls.append(("configure", dict(options)))

    def shutdown(self):
        self.calls.append("shutdown")


def test_load_sdl_plugin_and_config_wiring():
    plugin = load_sdl_plugin(f"{__name__}._Plugin")
    plugin.startup()
    assert "startup" in _Plugin.calls

    from smart_data_lake_spark.config import load_config

    _Plugin.calls.clear()
    registry = load_config(
        {
            "globalConfig": {
                "sdlPluginClassName": f"{__name__}._Plugin",
                "pluginOptions": {"k": "v"},
                "memoryLogTimer": {"intervalSec": 60},
            },
            "dataObjects": {},
            "actions": {},
        }
    )
    try:
        assert ("configure", {"k": "v"}) in _Plugin.calls
        assert registry.memory_log_timer._thread is not None
    finally:
        registry.memory_log_timer.stop()
    registry.sdl_plugin.shutdown()
    assert "shutdown" in _Plugin.calls

    with pytest.raises(ValueError, match="dotted"):
        load_sdl_plugin("NoDots")


def test_plugin_instance_shared_between_cli_and_config():
    from smart_data_lake_spark.apputil import load_sdl_plugin

    a = load_sdl_plugin(f"{__name__}._Plugin")
    b = load_sdl_plugin(f"{__name__}._Plugin")
    assert a is b  # startup() and configure() must hit the same object
