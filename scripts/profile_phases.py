"""Per-phase wall-time profile of the flagship pipeline at one parallelism
level — used to find non-scaling (serial) phases: run at two core counts and
compare. A phase whose time doesn't shrink with cores is a scaling bug.

Usage: python scripts/profile_phases.py <cores> [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main(cores: int, sf_dir: str) -> None:
    from pyspark.sql import functions as F

    from mapping_analysis_spark.data.transcripts import ensure_transcripts
    from mapping_analysis_spark.functions.text import token_set_jaccard
    from mapping_analysis_spark.operators.clustering import assign_cluster_ids
    from mapping_analysis_spark.pipeline import (
        DEFAULT_THRESHOLD,
        candidate_pairs,
        conversation_records,
        score_conversation_pairs,
    )
    from mapping_analysis_spark.session import get_spark

    spark = get_spark(f"profile-{cores}", cores=cores, shuffle_partitions=cores)
    spark.sparkContext.setLogLevel("ERROR")
    t = spark.read.parquet(ensure_transcripts(sf_dir)).repartition(cores * 2)
    t = t.localCheckpoint(eager=True)
    t.count()

    phases: dict[str, float] = {}

    def mark(name: str, t0: float) -> float:
        now = time.time()
        phases[name] = round(now - t0, 2)
        return now

    for run in range(2):
        phases.clear()
        t0 = time.time()
        rec = conversation_records(t)
        pairs = candidate_pairs(rec)  # internally checkpoints the featurized rec
        t0 = mark("records+featurize+pairs_plan", t0)
        scored = score_conversation_pairs(pairs)
        edges = scored.filter(F.col("sim") >= F.lit(DEFAULT_THRESHOLD)).select(
            F.col("a_rid").alias("a"), F.col("b_rid").alias("b")
        )
        edges = edges.localCheckpoint(eager=True)
        t0 = mark("pairs+score+edges", t0)
        nodes = rec.select(F.col("rid").alias("conv_id"))
        assign = assign_cluster_ids(nodes, edges, "conv_id")
        assign = assign.localCheckpoint(eager=True)
        t0 = mark("cc+assign", t0)
        sizes = assign.groupBy("cluster_id").agg(F.count("*").alias("cluster_size"))
        out = assign.join(sizes, "cluster_id").select("conv_id", "cluster_id", "cluster_size")
        n = out.count()
        t0 = mark("sizes+final", t0)
        print(json.dumps({"run": run, "cores": cores, "rows": n, "phases": phases,
                          "total": round(sum(phases.values()), 2)}))
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]), sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.5")
