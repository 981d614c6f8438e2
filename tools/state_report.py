"""Run-state report: the CLI stand-in for the reference's state viewer UI.

    python tools/state_report.py <state-dir> [--runs N]

Reads the JSON run-state files a builder run persists (`plans/dag.py:
StateStore`, mirroring `HadoopFileActionDAGRunStateStore.scala`) and prints
per-run action states, durations, record counts and error summaries —
newest first. Pure stdlib; safe to point at a live state directory.
"""

from __future__ import annotations

import json
import os
import sys


def load_states(state_dir: str) -> list[dict]:
    states = []
    for f in sorted(os.listdir(state_dir)):
        if f.endswith(".json"):
            with open(os.path.join(state_dir, f), "r", encoding="utf-8") as fh:
                states.append(json.load(fh))
    states.sort(key=lambda s: (s.get("run_id", 0), s.get("attempt_id", 0)))
    return states


def _records(metrics: dict) -> str:
    for v in metrics.values():
        if isinstance(v, dict) and "records_written" in v:
            return str(v["records_written"])
    return "-"


def report(state_dir: str, runs: int | None = None) -> str:
    states = load_states(state_dir)
    if runs:
        states = states[-runs:]
    lines = []
    for s in reversed(states):
        final = "final" if s.get("is_final") else "NOT-final"
        lines.append(
            f"run {s.get('run_id')} attempt {s.get('attempt_id', 1)} [{final}]"
        )
        for aid, st in (s.get("action_states") or {}).items():
            m = (s.get("action_metrics") or {}).get(aid, {})
            dur = m.get("duration_sec", "-")
            err = f"  error: {m['error'][:120]}" if "error" in m else ""
            lines.append(
                f"  {aid:<30} {st:<10} {dur!s:>8}s  records={_records(m)}{err}"
            )
        streaming = s.get("streaming_queries") or {}
        for aid, descs in streaming.items():
            for d in descs:
                lines.append(
                    f"  {aid:<30} streaming → {d.get('output_id')} (checkpoint {d.get('checkpoint')})"
                )
    return "\n".join(lines)


def main(argv: list[str] | None = None) -> int:
    args = argv if argv is not None else sys.argv[1:]
    if not args:
        print(__doc__)
        return 2
    runs = None
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        args = args[:i] + args[i + 2 :]
    print(report(args[0], runs))
    return 0


if __name__ == "__main__":
    sys.exit(main())
