"""Measure streaming per-batch driver latency + Spark jobs per micro-batch.

Round-3 verdict (What's wrong #3): the per-batch driver cost was high-constant
(~25 s/batch at sf0.001 — dozens of tiny Spark jobs from eager
localCheckpoints, per-table bucket-id collects, and separate count/lineage
actions). This harness replays the sf0.001 transcripts as N arrival files
through ``IncrementalClusteringJob`` and reports per-batch wall seconds and
``spark_jobs`` (from the batch's scoped job group, logged in metrics.jsonl).

Usage: python scripts/streaming_latency.py [n_files] [sf_dir]
Prints one JSON line: {"batches": N, "total_s": ..., "per_batch_s": [...],
"spark_jobs": [...], "rows": [...]}.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mapping_analysis_spark.data.transcripts import ensure_transcripts  # noqa: E402
from mapping_analysis_spark.session import get_spark  # noqa: E402
from mapping_analysis_spark.streaming.job import IncrementalClusteringJob  # noqa: E402


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    spark = get_spark("streaming-latency", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    tmp = tempfile.mkdtemp(prefix="stream_lat_")
    try:
        df = spark.read.parquet(ensure_transcripts(sf_dir))
        arrivals = os.path.join(tmp, "arrivals")
        sliced = df.withColumn(
            "_slice", F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(n_files))
        )
        os.makedirs(arrivals, exist_ok=True)
        for i in range(n_files):
            part = os.path.join(tmp, f"part{i}")
            sliced.filter(F.col("_slice") == i).drop("_slice").coalesce(1).write.mode(
                "overwrite"
            ).parquet(part)
            src = glob.glob(os.path.join(part, "part-*.parquet"))[0]
            shutil.move(src, os.path.join(arrivals, f"arrival_{i:03d}.parquet"))
            shutil.rmtree(part)

        job = IncrementalClusteringJob(spark, os.path.join(tmp, "state"))
        t0 = time.time()
        q = job.start(arrivals, os.path.join(tmp, "ckpt"), max_files_per_trigger=1)
        q.awaitTermination(int(os.environ.get("SPARK_GRAFT_STREAM_TIMEOUT", "900")))
        total = time.time() - t0
        recs = [
            json.loads(line)
            for line in open(job.metrics_path).read().strip().splitlines()
        ]
        out = {
            "batches": len(recs),
            "total_s": round(total, 1),
            "per_batch_s": [r["seconds"] for r in recs],
            "spark_jobs": [r.get("spark_jobs") for r in recs],
            "rows": [r["rows"] for r in recs],
            "n_assignments": job.result().count() if job.result() is not None else 0,
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
