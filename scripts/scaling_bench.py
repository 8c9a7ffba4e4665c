"""Scaling-efficiency evidence: the same end-to-end match+cluster job at two
parallelism levels (local[8] vs local[32] — the sandbox stand-in for N vs 4N
executors per BASELINE.md), fresh JVM per level (Spark masters are fixed per
process). Writes BENCH.md and prints one JSON line.

Usage:
    python scripts/scaling_bench.py                 # orchestrates both levels
    python scripts/scaling_bench.py --worker 8      # one measured run
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:  # worker subprocess launches with scripts/ as path[0]
    sys.path.insert(0, REPO)
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def worker(cores: int) -> None:
    from mapping_analysis_spark.data.transcripts import ensure_transcripts
    from mapping_analysis_spark.pipeline import dedup_conversations
    from mapping_analysis_spark.session import get_spark

    spark = get_spark(f"scaling-{cores}", cores=cores, shuffle_partitions=cores)
    spark.sparkContext.setLogLevel("ERROR")
    t = spark.read.parquet(ensure_transcripts(SF_DIR))
    n_turns = t.count()
    runs = []
    for _ in range(2):  # run 1 warms JIT/caches; run 2 is the measured run
        t0 = time.time()
        dedup_conversations(t).count()
        runs.append(time.time() - t0)
    print(json.dumps({"cores": cores, "n_turns": n_turns, "cold_s": round(runs[0], 2),
                      "warm_s": round(runs[1], 2)}))
    spark.stop()


def orchestrate() -> int:
    results = {}
    for cores in (8, 32):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker", str(cores)],
            capture_output=True, text=True, cwd=REPO, timeout=3600,
        )
        line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
        results[cores] = json.loads(line)
        print(f"# cores={cores}: {results[cores]}", file=sys.stderr)
    n = results[8]["n_turns"]
    thr8 = n / results[8]["warm_s"]
    thr32 = n / results[32]["warm_s"]
    eff = (thr32 / thr8) / 4.0
    summary = {
        "sf_dir": SF_DIR,
        "n_turns": n,
        "throughput_local8_turns_per_sec": round(thr8, 1),
        "throughput_local32_turns_per_sec": round(thr32, 1),
        "speedup_8_to_32": round(thr32 / thr8, 2),
        "scaling_efficiency_N_to_4N": round(eff, 3),
        "cold_s": {c: results[c]["cold_s"] for c in results},
        "warm_s": {c: results[c]["warm_s"] for c in results},
    }
    print(json.dumps(summary))
    _write_bench_md(summary)
    return 0


def _write_bench_md(s: dict) -> None:
    md = f"""# BENCH — measured throughput + scaling efficiency

End-to-end match+cluster job (`dedup_conversations`: records → blocking
(prefix ∪ MinHash-LSH, salted) → Jaccard → connected components → sizes) on
the synthetic transcripts at `{s["sf_dir"]}` ({s["n_turns"]} turns). Two
parallelism levels in fresh JVMs — the sandbox stand-in for N vs 4N
executors (BASELINE.md): warm-run wall time after one JIT warm-up pass.

| parallelism | warm run (s) | throughput (turns/s) |
|---|---|---|
| local[8]  (N)  | {s["warm_s"][8]}  | {s["throughput_local8_turns_per_sec"]} |
| local[32] (4N) | {s["warm_s"][32]} | {s["throughput_local32_turns_per_sec"]} |

**Speedup 8→32 cores: {s["speedup_8_to_32"]}× → scaling efficiency
(speedup/4): {s["scaling_efficiency_N_to_4N"]}** (target ≥ 0.8, BASELINE.json).

Cold-run times (incl. first-pass JIT + shuffle warmup): local[8]
{s["cold_s"][8]} s, local[32] {s["cold_s"][32]} s.

Regenerate: `python scripts/scaling_bench.py` (writes this file).
Per-query timings: `python bench.py` → one JSON line (driver records
BENCH_r{{N}}.json).
"""
    with open(os.path.join(REPO, "BENCH.md"), "w") as f:
        f.write(md)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]))
    else:
        raise SystemExit(orchestrate())
