"""Event-log audit used by BENCH.md: per-stage core utilization, executor
CPU-time inflation across parallelism levels, inter-job scheduler gaps.

Usage:
  1. run the flagship with event logging at two levels, e.g.:
       spark config: spark.eventLog.enabled=true,
                     spark.eventLog.dir=file:///tmp/evlogN
     and note the wall-clock MARK of the measured (warm) run;
  2. zstd -d the events file;
  3. python scripts/evlog_audit.py <events.json> <t0_epoch_seconds> <cores> <wall_s>
"""

from __future__ import annotations

import json
import sys


def corestats(f: str, t0ms: float):
    stages = {}
    tt: dict = {}
    cpu: dict = {}
    jobs: dict = {}
    for line in open(f):
        ev = json.loads(line)
        e = ev.get("Event")
        if e == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            if si.get("Submission Time", 0) >= t0ms:
                stages[si["Stage ID"]] = si["Completion Time"] - si["Submission Time"]
        elif e == "SparkListenerTaskEnd":
            sid = ev["Stage ID"]
            ti = ev["Task Info"]
            m = ev.get("Task Metrics") or {}
            tt[sid] = tt.get(sid, 0) + (ti["Finish Time"] - ti["Launch Time"])
            cpu[sid] = cpu.get(sid, 0) + m.get("Executor CPU Time", 0) / 1e6
        elif e == "SparkListenerJobStart" and ev["Submission Time"] >= t0ms:
            jobs[ev["Job ID"]] = {"s": ev["Submission Time"]}
        elif e == "SparkListenerJobEnd" and ev["Job ID"] in jobs:
            jobs[ev["Job ID"]]["e"] = ev["Completion Time"]
    task_s = sum(tt.get(s, 0) for s in stages) / 1000
    cpu_s = sum(cpu.get(s, 0) for s in stages) / 1000
    gaps = 0.0
    prev = None
    for j in sorted(jobs):
        if "e" not in jobs[j]:
            continue
        if prev is not None:
            gaps += jobs[j]["s"] - prev
        prev = jobs[j]["e"]
    return task_s, cpu_s, gaps / 1000


if __name__ == "__main__":
    f, t0, cores, wall = sys.argv[1], float(sys.argv[2]), int(sys.argv[3]), float(sys.argv[4])
    task_s, cpu_s, gaps = corestats(f, t0 * 1000)
    print(
        f"wall={wall}s task_core_s={task_s:.0f} cpu_core_s={cpu_s:.0f} "
        f"util={task_s / cores / wall * 100:.0f}% scheduler_gaps={gaps:.1f}s"
    )
