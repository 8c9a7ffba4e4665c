"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "turns_per_sec": ...}

The headline metric (BASELINE.json) is end-to-end match+cluster throughput in
turns/sec over the synthetic transcript table; individual operator timings
ride along in "queries".
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(os.path.basename(os.path.normpath(sf_dir))[2:])

    from mapping_analysis_spark.data.transcripts import ensure_transcripts
    from mapping_analysis_spark.session import get_spark

    spark = get_spark("bench", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    tpath = ensure_transcripts(sf_dir)
    n_turns = spark.read.parquet(tpath).count()

    qs = entrymod.queries()
    # every contract query is wall-clocked, so a perf regression in ANY
    # oracled operator is visible round-over-round (VERDICT r2 item 4)
    bench_queries = list(qs)
    timings: dict[str, float] = {}
    for name in bench_queries:
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        n = df.count()  # materialize the full result
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {n} rows in {timings[name]}s", file=sys.stderr)

    e2e = timings["conv_dedup_full"]
    total = round(sum(timings.values()), 3)
    out = {
        "metric": "end-to-end match+cluster throughput (turns/sec) on synthetic transcripts",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "n_turns": n_turns,
        "e2e_seconds": e2e,
        "turns_per_sec": round(n_turns / e2e, 1),
        "cores": cores,
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
