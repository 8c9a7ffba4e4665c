"""Per-query timing harness for optimization work (bench.py is FROZEN for
measurement; this file exists so isolated before/after numbers can be taken
per guide §1 without touching it).

Usage:
    python bench_extra.py [--sf DIR] [--runs N] [--noop] [query ...]

Times each named query (default: all) with the same methodology as bench.py
(df.count() materialization, median of N runs, cold first pass), on
local[$SPARK_GRAFT_CPUS]. --noop uses the noop sink (computes every column)
instead of count() for sink-isolated timing (guide §1.4).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from mapping_analysis_spark.session import get_spark

    spark = get_spark("bench-extra", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    names = args.queries or list(qs)
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2
    samples: dict[str, list[float]] = {n: [] for n in names}
    for r in range(args.runs):
        ordered = names if r % 2 == 0 else list(reversed(names))
        for name in ordered:
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            df = qs[name](spark, args.sf)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
                n = -1
            else:
                n = df.count()
            dt = round(time.time() - t0, 3)
            samples[name].append(dt)
            if r == 0:
                print(f"# {name}: {n} rows in {dt}s (cold)", file=sys.stderr)
            spark.sparkContext.setJobDescription(None)
    out = {
        "sf_dir": args.sf,
        "runs": args.runs,
        "noop": args.noop,
        "queries": {n: round(statistics.median(ts), 3) for n, ts in samples.items()},
        "queries_cold": {n: ts[0] for n, ts in samples.items()},
        "queries_samples": samples,
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
