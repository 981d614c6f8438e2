"""Config-DAG exporter (reference: sdl-lang meta/dagexporter/DagExporter
.scala): load a config (JSON/HOCON files or directories), print the action
DAG as the reference's simplified-actions JSON — ``{actionId: {metadata,
inputIds, outputIds}}`` wrapped in BEGIN DAG/END DAG markers — plus an
optional Mermaid flowchart for humans.

    python tools/dag_export.py --sdlConfig examples/cli_pipeline.conf [--mermaid]

Pure metadata: no Spark session, nothing executed.
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, "/root/repo")


def export_dag(config_paths: list[str]) -> dict:
    from smart_data_lake_spark.__main__ import _merge_configs
    from smart_data_lake_spark.config import load_config

    merged = _merge_configs(config_paths)
    merged.pop("templates", None)  # convention: template sections aren't loader input
    registry = load_config(merged)
    out = {}
    for aid, action in sorted(registry.actions.items()):
        out[aid] = {
            "metadata": dict(getattr(action, "metadata", {}) or {}),
            "inputIds": list(action.input_ids),
            "outputIds": list(action.output_ids),
        }
    return out


def to_mermaid(simplified: dict) -> str:
    """Mermaid flowchart: data objects as rounded nodes, actions as edges."""
    lines = ["flowchart LR"]
    for aid, a in simplified.items():
        for i in a["inputIds"]:
            for o in a["outputIds"]:
                lines.append(f"    {i}([{i}]) -->|{aid}| {o}([{o}])")
    return "\n".join(lines)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sdlConfig", "-s", required=True,
                    help="comma-separated config files or directories")
    ap.add_argument("--mermaid", action="store_true", help="also print a Mermaid flowchart")
    args = ap.parse_args(argv)
    simplified = export_dag(args.sdlConfig.split(","))
    print("BEGIN DAG")
    print(json.dumps(simplified, indent=2))
    print("END DAG")
    if args.mermaid:
        print(to_mermaid(simplified))
    return 0


if __name__ == "__main__":
    sys.exit(main())
