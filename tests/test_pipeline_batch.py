"""End-to-end batch pipeline: pair-level P/R/F1 vs the planted gold clusters.

Mirrors the reference's correctness oracle (clusters → member pairs vs
perfect-mapping pairs, ``util/QualityUtils.java:385-403``). Gold entity of a
conversation is its conv_id prefix (``e{entity}_``).
"""

from __future__ import annotations

from itertools import combinations

import pytest
from pyspark.sql import functions as F

from mapping_analysis_spark.pipeline import (
    conversation_records,
    dedup_conversations,
    match_conversations,
)


def test_conversation_records_shape(spark, transcripts_smoke):
    rec = conversation_records(transcripts_smoke)
    rows = rec.collect()
    n_convs = transcripts_smoke.select("conv_id").distinct().count()
    assert len(rows) == n_convs
    by_id = {r["rid"]: r for r in rows}
    mega = by_id["mega_s1"]
    assert mega["source"] == 1 and mega["smask"] == 2
    assert mega["n_turns"] >= 64
    # label is normalized (lowercase, single spaces)
    for r in rows[:50]:
        assert r["label"] == " ".join(r["label"].split())


@pytest.mark.parametrize("salted", [True, False])
def test_match_quality(spark, transcripts_smoke, salted):
    assign = match_conversations(transcripts_smoke, threshold=0.6, salted=salted, cap=64)
    rows = assign.collect()
    pred = {}
    gold = {}
    for r in rows:
        pred.setdefault(r["cluster_id"], []).append(r["conv_id"])
        gold.setdefault(r["conv_id"].split("_")[0], []).append(r["conv_id"])
    pred_pairs = {
        p for ms in pred.values() for p in combinations(sorted(ms), 2)
    }
    gold_pairs = {
        p for ms in gold.values() for p in combinations(sorted(ms), 2) if len(ms) > 1
    }
    tp = len(pred_pairs & gold_pairs)
    precision = tp / max(1, len(pred_pairs))
    recall = tp / max(1, len(gold_pairs))
    f1 = 2 * precision * recall / max(1e-9, precision + recall)
    # Reference achieves F1 0.9681 on MusicBrainz (MusicBrainzTest.java:169-171);
    # our synthetic corruption is comparable — demand >= 0.9.
    assert precision >= 0.95, f"precision {precision}"
    assert recall >= 0.85, f"recall {recall}"
    assert f1 >= 0.90, f"f1 {f1}"


def test_salted_equals_unsalted(spark, transcripts_smoke):
    a = match_conversations(transcripts_smoke, salted=True, cap=16)
    b = match_conversations(transcripts_smoke, salted=False)
    diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    assert diff == 0


def test_dedup_conversations_covers_all(spark, transcripts_smoke):
    out = dedup_conversations(transcripts_smoke)
    n_convs = transcripts_smoke.select("conv_id").distinct().count()
    assert out.count() == n_convs
    assert out.filter(F.col("cluster_size") < 1).count() == 0


def test_distributed_cc_parity_at_scale(spark):
    """VERDICT r2 item 10: pin the 100 TB default CC path (large-star /
    small-star, forced via driver_threshold=0) against the driver union-find
    oracle on the FULL sf0.1 match-edge set — the realistic-size parity the
    small fixtures can't give."""
    import time

    from pyspark.sql import functions as F

    from mapping_analysis_spark.data.transcripts import ensure_transcripts
    from mapping_analysis_spark.operators.clustering import connected_components
    from mapping_analysis_spark.pipeline import (
        conversation_records,
        featurize_records,
        match_edges,
    )

    t = spark.read.parquet(ensure_transcripts("/root/testdata/sf0.1"))
    rec = featurize_records(conversation_records(t))
    edges = match_edges(rec).localCheckpoint(eager=True)
    n_edges = edges.count()
    assert n_edges > 20_000  # realistic size (sf0.1 corpus edge set)

    t0 = time.time()
    dist = connected_components(edges, driver_threshold=0)
    got = {(r["node"], r["comp"]) for r in dist.collect()}
    t_dist = time.time() - t0
    drv = connected_components(edges, driver_threshold=1 << 40)
    want = {(r["node"], r["comp"]) for r in drv.collect()}
    assert got == want, (
        f"{len(got ^ want)} assignment diffs between distributed and driver CC"
    )
    print(f"\n# distributed CC on {n_edges} edges: {t_dist:.1f}s, parity exact")
