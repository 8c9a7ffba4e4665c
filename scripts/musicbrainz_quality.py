#!/usr/bin/env python3
"""Run the full MusicBrainz-20000 quality sweep and print one JSON line.

Usage: python scripts/musicbrainz_quality.py [csv_path]

Defaults to the reference checkout's gold-labeled fixture. Prints per-
threshold pair precision/recall/F1 against the gold CID column, mirroring
the reference's csimq sweep (``MusicBrainzTest.java:169-199``), whose
published anchor is "0.55 best precision: 0.994 recall: 0.9436 F1: 0.9681".
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

DEFAULT_CSV = (
    "/root/reference/analysis-core/src/test/resources/data/musicbrainz/input/"
    "musicbrainz-20000-A01.csv.dapo"
)


def main() -> None:
    csv = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_CSV
    from mapping_analysis_spark.session import get_spark
    from mapping_analysis_spark.music import (
        music_block_load,
        music_components,
        music_incremental_quality,
        music_input_edges,
        music_quality_sweep,
        music_records,
        music_representatives,
        music_scored_edges,
    )

    spark = get_spark()
    t0 = time.time()
    rows = music_quality_sweep(spark, csv).collect()
    # merge-blocking skew visibility (reference: accumulator counters)
    records = music_records(spark, csv)
    reps = music_representatives(
        records,
        music_components(
            records, music_scored_edges(records, music_input_edges(records))
        ),
    )
    hot_blocks = [r.asDict() for r in music_block_load(reps).collect()]
    split_dir = csv.rsplit("/input/", 1)[0] + "/split"
    inc_rows = music_incremental_quality(spark, csv, split_dir).collect()
    wall = round(time.time() - t0, 2)
    inc_final = inc_rows[-1]
    incremental = {
        "phases": {r["phase"]: r["n_clusters"] for r in inc_rows},
        "precision": inc_final["precision_e6"] / 1e6,
        "recall": inc_final["recall_e6"] / 1e6,
        "f1": inc_final["f1_e6"] / 1e6,
        "reference_anchor": {"precision": 0.98926, "recall": 0.88394, "f1": 0.93364},
    }
    sweep = {
        f"{r['threshold_e2'] / 100:.2f}": {
            "precision": r["precision_e6"] / 1e6,
            "recall": r["recall_e6"] / 1e6,
            "f1": r["f1_e6"] / 1e6,
            "tp": r["tp"],
            "n_pred": r["n_pred"],
            "n_gold": r["n_gold"],
        }
        for r in rows
    }
    best = max(sweep.items(), key=lambda kv: kv[1]["f1"])
    print(
        json.dumps(
            {
                "dataset": "musicbrainz-20000-A01 (real, gold CID labels)",
                "reference_anchor": {"threshold": 0.55, "precision": 0.994, "recall": 0.9436, "f1": 0.9681},
                "best_threshold": float(best[0]),
                "best": best[1],
                "sweep": sweep,
                "incremental": incremental,
                "hottest_merge_blocks": hot_blocks,
                "wall_sec": wall,
            }
        )
    )


if __name__ == "__main__":
    main()
