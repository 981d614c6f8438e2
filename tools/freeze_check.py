"""Mechanical freeze-discipline check (r10 verdict item 4, committed form).

The driver grades the FIRST 50 entries of `queries()` each round; the
window is frozen at a named commit and must not change afterwards — any
post-freeze function/oracle edit to a window member invalidates its
already-earned independent driver row.

Usage:
  python tools/freeze_check.py --freeze <round>   # record FREEZE_r<N>.json
  python tools/freeze_check.py                    # verify against the
                                                  # newest FREEZE_r*.json

The freeze file records the round, the ordered first-50 key list, and a
sha256 of each window member's oracle SQL text (so a post-freeze oracle
edit — not just a reorder — is caught). `tests/test_freeze_window.py`
runs the verification on every pytest run, making the discipline a suite
failure instead of a session note.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50


def _window_state():
    import __spark_entry__ as entry

    keys = list(entry.queries().keys())[:WINDOW]
    oracles = entry.oracle_sql()
    hashes = {
        k: hashlib.sha256(oracles[k].encode()).hexdigest()
        for k in keys
        if k in oracles
    }
    return keys, hashes


def _normalize_plan(s: str) -> str:
    """Strip the session-varying parts of an analyzed-plan string so the
    hash is stable across processes: expression ids (#123), lambda
    variable numbering, and absolute temp paths."""
    s = re.sub(r"#\d+", "#N", s)
    s = re.sub(r"\blambda x_\d+\b", "lambda x_N", s)
    s = re.sub(r"/tmp/[^\s,\]]+", "/tmp/PATH", s)
    return s


def plan_hashes(keys: list[str], sf_dir: str = "/root/testdata/sf0.001") -> dict:
    """sha256 of each window member's NORMALIZED analyzed logical plan —
    the Spark-side twin of the oracle-text hash (a post-freeze edit to a
    member's function or any library it calls shows up in the plan even
    when the wrapper is untouched). Streaming members are skipped:
    building their result executes an availableNow drain through a temp
    sink whose path varies. OPT-IN (``--plans``) and NOT part of the
    pytest gate: plan strings are best-effort stable, and a flaky suite
    gate would be worse than a manual check."""
    import __spark_entry__ as entry
    from smart_data_lake_spark.session import build_session

    spark = build_session(app_name="freeze_check")
    q = entry.queries()
    out = {}
    for k in keys:
        if k.startswith("streaming_") or k not in q:
            # a frozen key missing from queries() is reported as a key-set
            # violation by verify(); skipping here keeps the tool able to
            # PRINT that violation instead of dying on a KeyError
            continue
        try:
            df = q[k](spark, sf_dir)
            s = df._jdf.queryExecution().analyzed().toString()
        except Exception as exc:  # noqa: BLE001
            # a frozen member whose BUILDER raises (e.g. a signature change
            # in a shared library function) must surface as a reported
            # violation, not a tool traceback (r11 review)
            out[k] = f"BUILD_ERROR: {type(exc).__name__}: {exc}"
            continue
        out[k] = hashlib.sha256(_normalize_plan(s).encode()).hexdigest()
    return out


def newest_freeze_file() -> str | None:
    files = glob.glob(os.path.join(ROOT, "FREEZE_r*.json"))
    if not files:
        return None
    return max(files, key=lambda p: int(re.search(r"FREEZE_r(\d+)", p).group(1)))


def verify(path: str) -> list[str]:
    """Return a list of violations (empty = freeze holds)."""
    with open(path) as f:
        frozen = json.load(f)
    keys, hashes = _window_state()
    problems = []
    if keys != frozen["window_keys"]:
        gone = set(frozen["window_keys"]) - set(keys)
        new = set(keys) - set(frozen["window_keys"])
        problems.append(
            f"window key list changed since {os.path.basename(path)}: "
            f"removed={sorted(gone)} added={sorted(new)}"
            if gone or new
            else "window key ORDER changed"
        )
    for k, h in frozen["oracle_sha256"].items():
        if k not in hashes:
            problems.append(
                f"frozen window member {k!r} lost its oracle_sql() entry"
            )
        elif hashes[k] != h:
            problems.append(f"oracle SQL of frozen window member {k!r} changed")
    return problems


def main() -> int:
    if "--freeze" in sys.argv:
        rnd = int(sys.argv[sys.argv.index("--freeze") + 1])
        keys, hashes = _window_state()
        rec = {"round": rnd, "window_keys": keys, "oracle_sha256": hashes}
        if "--plans" in sys.argv:
            rec["plan_sha256"] = plan_hashes(keys)
        path = os.path.join(ROOT, f"FREEZE_r{rnd}.json")
        with open(path, "w") as f:
            json.dump(rec, f, indent=1)
        print(f"froze {len(keys)}-key window -> {path}")
        return 0
    path = newest_freeze_file()
    if path is None:
        print("no FREEZE_r*.json found — nothing to verify")
        return 0
    problems = verify(path)
    if "--plans" in sys.argv:
        with open(path) as f:
            frozen = json.load(f)
        want = frozen.get("plan_sha256")
        if want:
            got = plan_hashes(frozen["window_keys"])
            for k, h in want.items():
                if k not in got:
                    problems.append(
                        f"frozen member {k!r} no longer buildable for plan hashing"
                    )
                elif got[k].startswith("BUILD_ERROR:"):
                    problems.append(f"frozen member {k!r} fails to build: {got[k]}")
                elif got[k] != h:
                    problems.append(
                        f"Spark-side analyzed plan of frozen member {k!r} changed"
                    )
        else:
            print("(freeze file has no plan hashes; run --freeze with --plans)")
    if problems:
        for p in problems:
            print("FREEZE VIOLATION:", p)
        return 1
    print(f"freeze holds ({os.path.basename(path)})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
