"""CLI entry point: ``python -m smart_data_lake_spark``.

Reference: `app/SmartDataLakeBuilder.scala:226-308` (scopt option parse) and
`LocalSmartDataLakeBuilder`'s local-mode extras. Option mapping:

  --feed-sel        feed selection algebra (feeds:/ids:/startFromActionIds:/…
                    with ``|``/``&``/``-`` set ops) — same grammar as the
                    reference's AppUtil.scala:188-218
  --config          one or more JSON config files (HOCON sections dataObjects/
                    actions/globalConfig as plain JSON); later files override
                    earlier ones section-by-section, like HOCON include order
  --partition-values  "col=val[,col=val]" (one set) or several sets separated
                    by ";" — SmartDataLakeBuilder.scala's partitionValues /
                    multiPartitionValues
  --state-path      run-state JSON directory (recovery + runId continuity)
  --parallelism     concurrent actions in the exec phase
  --streaming       whole-DAG synchronous streaming loop
  --streaming-interval-sec / --max-streaming-iterations  loop pacing/bound
  --test config     parse config, build DAG, run the prepare phase, exit
  --test dry-run    prepare + init (full Catalyst lineage, no writes), exit
"""

from __future__ import annotations

import argparse
import json
import sys
from typing import Any


def _merge_configs(paths: list[str]) -> dict[str, Any]:
    """Merge JSON and HOCON config files; a directory expands to its *.conf
    / *.json files recursively (hidden files skipped), matching the
    reference's config-directory convention. HOCON template inheritance
    (${templates.x} {overrides}) resolves AFTER the merge, so templates may
    live in sibling files."""
    import os

    from smart_data_lake_spark.hocon import parse_file, resolve_templates

    files: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            for root, dirs, names in os.walk(p):
                dirs.sort()  # deterministic merge order on every filesystem
                for name in sorted(names):
                    if not name.startswith(".") and name.endswith((".conf", ".json")):
                        files.append(os.path.join(root, name))
        else:
            files.append(p)
    merged: dict[str, Any] = {}
    for p in files:
        if p.endswith(".conf"):
            cfg = parse_file(p)
        else:
            with open(p, "r", encoding="utf-8") as fh:
                cfg = json.load(fh)
        for section, content in cfg.items():
            if isinstance(content, dict):
                merged.setdefault(section, {}).update(content)
            else:
                merged[section] = content
    return resolve_templates(merged)


def _parse_partition_values(s: str | None) -> list[dict] | None:
    if not s:
        return None
    out = []
    for part in s.split(";"):
        pv: dict[str, str] = {}
        for kv in part.split(","):
            k, _, v = kv.partition("=")
            if not _:
                raise ValueError(f"bad partition value {kv!r} (expected col=val)")
            pv[k.strip()] = v.strip()
        out.append(pv)
    return out


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="smart_data_lake_spark",
        description="Run a configured action DAG (SDLB-compatible semantics, PySpark-native).",
    )
    p.add_argument("--feed-sel", default=None, help="action selection (feeds:/ids:/… algebra)")
    p.add_argument("--config", nargs="+", default=[], help="JSON config file(s), merged in order")
    p.add_argument("--partition-values", default=None)
    p.add_argument("--state-path", default=None)
    p.add_argument("--parallelism", type=int, default=1)
    p.add_argument("--streaming", action="store_true")
    p.add_argument("--streaming-interval-sec", type=float, default=5.0)
    p.add_argument("--max-streaming-iterations", type=int, default=None)
    p.add_argument("--test", choices=["config", "dry-run"], default=None)
    p.add_argument("--master", default=None, help="Spark master override (default: local[*])")
    p.add_argument(
        "--agent-server",
        choices=["http", "websocket"],
        default=None,
        help="run as a remote-execution agent (LocalJettyAgentSmartDataLakeBuilder "
        "parity): serve ProxyAction phase requests until interrupted",
    )
    p.add_argument("--port", type=int, default=4441,
                   help="agent server port (default 4441, JettyAgentServerConfig.DefaultPort)")
    p.add_argument("--export-schema", default=None, metavar="FILE",
                   help="write the config JSON schema (editor tooling) and exit")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if args.export_schema:
        # schema export needs no config files and no Spark session
        import os

        sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "tools"))
        from config_schema import build_schema

        with open(args.export_schema, "w", encoding="utf-8") as fh:
            json.dump(build_schema(), fh, indent=2)
        print(f"config schema written to {args.export_schema}")
        return 0
    from smart_data_lake_spark.plans.app import SmartDataLakeBuilder
    from smart_data_lake_spark.session import build_session

    if args.agent_server:
        # agent mode (LocalJettyAgentSmartDataLakeBuilder.main): no config
        # files — the coordinator ships config fragments per phase request
        spark = build_session(master=args.master) if args.master else build_session()
        from smart_data_lake_spark.agents import AgentServer

        if args.agent_server == "http":
            server = AgentServer(spark, port=args.port).start()
        else:
            from smart_data_lake_spark.agents import handle_phase_request
            from smart_data_lake_spark.relay_agent import WebSocketAgentServer

            server = WebSocketAgentServer(
                lambda payload: handle_phase_request(spark, payload), port=args.port
            )
            server.start()
        print(f"agent server ({args.agent_server}) listening on {server.url}")
        try:
            import signal
            import threading as _threading

            stop = _threading.Event()
            signal.signal(signal.SIGTERM, lambda *a: stop.set())
            signal.signal(signal.SIGINT, lambda *a: stop.set())
            stop.wait()
        finally:
            server.stop()
        return 0

    if not args.config:
        build_parser().error("--config is required (except with --export-schema)")
    config = _merge_configs(args.config)
    # SDL plugin startup fires BEFORE config interpretation (SDLPlugin.scala:
    # "as early as possible" — log/credential setup); configure() fires
    # inside load_config, shutdown() on ordinary exit below
    plugin = None
    plugin_cls = (config.get("globalConfig") or {}).get("sdlPluginClassName")
    if plugin_cls:
        from smart_data_lake_spark.apputil import load_sdl_plugin

        plugin = load_sdl_plugin(plugin_cls)
        plugin.startup()
    builder = SmartDataLakeBuilder(config=config)
    spark = build_session(master=args.master) if args.master else build_session()

    if args.test is not None:
        n = builder.dry_run(
            feed_sel=args.feed_sel, spark=spark, init="dry-run" == args.test
        )
        print(f"test={args.test}: {n} actions validated")
        if plugin is not None:
            plugin.shutdown()  # a clean test run is an ordinary exit too
        return 0

    state = builder.run(
        feed_sel=args.feed_sel,
        spark=spark,
        partition_values=_parse_partition_values(args.partition_values),
        state_path=args.state_path,
        parallelism=args.parallelism,
        streaming=args.streaming,
        streaming_interval_sec=args.streaming_interval_sec,
        max_streaming_iterations=args.max_streaming_iterations,
    )
    for aid, st in state.action_states.items():
        metrics = state.action_metrics.get(aid, {})
        print(f"{aid}: {st} {json.dumps(metrics, default=str)}")
    failed = [a for a, s in state.action_states.items() if s == "FAILED"]
    # a failed run raises DAGError inside builder.run, so reaching this point
    # IS the ordinary exit; the failed-list check remains for runners
    # configured to return partial states instead of raising
    if plugin is not None and not failed:
        plugin.shutdown()
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
