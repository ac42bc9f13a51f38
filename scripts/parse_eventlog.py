"""Summarize per-stage wall/task time from a Spark JSON event log.

Usage: python scripts/parse_eventlog.py <eventlog-dir-or-file> [min_ms]

Prints one line per completed stage: wall ms, #tasks, total executor run
ms, total JVM GC ms, shuffle read/write bytes, and the stage callsite —
the decomposition needed to see WHICH stage stops scaling when executors
are added (stage wall that doesn't shrink 4x between the N and 4N legs is
the bottleneck; task-time that GROWS shows added parallel overhead, e.g.
shuffle fetch or python worker contention).
"""

from __future__ import annotations

import json
import os
import sys
from collections import defaultdict


def _lines(path: str):
    """Yield event-log lines; handles v2 rolling dirs and .zstd files."""
    import subprocess

    if os.path.isdir(path):
        for f in sorted(os.listdir(path)):
            if f.startswith("events_"):
                yield from _lines(os.path.join(path, f))
        return
    if path.endswith(".zstd"):
        out = subprocess.run(
            ["zstd", "-dc", path], capture_output=True, text=True
        )
        yield from out.stdout.splitlines()
    else:
        with open(path) as f:
            yield from f


def stages_of(path: str) -> list[dict]:
    task_run = defaultdict(int)
    task_gc = defaultdict(int)
    sh_read = defaultdict(int)
    sh_write = defaultdict(int)
    out_rows: list[dict] = []
    if True:
        for line in _lines(path):
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                m = ev.get("Task Metrics") or {}
                task_run[sid] += m.get("Executor Run Time", 0)
                task_gc[sid] += m.get("JVM GC Time", 0)
                srm = m.get("Shuffle Read Metrics") or {}
                sh_read[sid] += srm.get("Remote Bytes Read", 0) + srm.get(
                    "Local Bytes Read", 0
                )
                swm = m.get("Shuffle Write Metrics") or {}
                sh_write[sid] += swm.get("Shuffle Bytes Written", 0)
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sub = si.get("Submission Time")
                comp = si.get("Completion Time")
                if sub is None or comp is None:
                    continue
                sid = si["Stage ID"]
                out_rows.append(
                    {
                        "stage": sid,
                        "wall_ms": comp - sub,
                        "tasks": si.get("Number of Tasks"),
                        "run_ms": task_run[sid],
                        "gc_ms": task_gc[sid],
                        "sh_read_mb": round(sh_read[sid] / 1e6, 1),
                        "sh_write_mb": round(sh_write[sid] / 1e6, 1),
                        "name": si.get("Stage Name", "")[:80],
                    }
                )
    return out_rows


def main() -> None:
    target = sys.argv[1]
    min_ms = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    files = (
        [target]
        if os.path.isfile(target)
        else [
            os.path.join(target, f)
            for f in os.listdir(target)
            if not f.startswith(".")
        ]
    )
    for path in sorted(files):
        print(f"== {path}")
        rows = stages_of(path)
        for r in rows:
            if r["wall_ms"] < min_ms:
                continue
            print(
                f"stage {r['stage']:>4} wall {r['wall_ms']/1000:7.2f}s "
                f"tasks {r['tasks']:>3} run {r['run_ms']/1000:8.1f}s "
                f"gc {r['gc_ms']/1000:6.1f}s "
                f"shR {r['sh_read_mb']:8.1f}MB shW {r['sh_write_mb']:8.1f}MB  "
                f"{r['name']}"
            )


if __name__ == "__main__":
    main()
