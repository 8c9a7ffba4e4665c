"""Real-data validation on the reference's MusicBrainz-20000 benchmark.

The reference ships the 19,375-record 5-source CSV with the gold ``CID``
cluster column (``analysis-core/src/test/resources/data/musicbrainz/input/
musicbrainz-20000-A01.csv.dapo``) and publishes a quality anchor for the
full pipeline: "0.55 best precision: 0.994 recall: 0.9436 F1: 0.9681"
(``MusicBrainzTest.java:169-171``).  These tests run OUR pipeline on that
real file — the one correctness signal no synthetic oracle substitutes.

Measured here (pinned with slack below): at merge threshold 0.55 the batch
pipeline reaches P 0.9959 / R 0.9655 / F1 0.9805 — above the reference's
published F1 at every swept threshold (best sweep F1 0.9808 at 0.50) — and
the incremental MULTI flow lands on the incremental anchor (see below).

Skipped automatically when the reference checkout is not present.
"""

from __future__ import annotations

import os

import pytest

MUSIC_CSV = (
    "/root/reference/analysis-core/src/test/resources/data/musicbrainz/input/"
    "musicbrainz-20000-A01.csv.dapo"
)

pytestmark = pytest.mark.skipif(
    not os.path.exists(MUSIC_CSV), reason="reference MusicBrainz fixture not available"
)


@pytest.fixture(scope="module")
def music(spark):
    from mapping_analysis_spark.music import (
        music_components,
        music_input_edges,
        music_records,
        music_representatives,
        music_scored_edges,
    )

    records = music_records(spark, MUSIC_CSV).localCheckpoint(eager=True)
    edges = music_input_edges(records)
    scored = music_scored_edges(records, edges).localCheckpoint(eager=True)
    assign = music_components(records, scored)
    reps = music_representatives(records, assign).localCheckpoint(eager=True)
    return {"records": records, "edges": edges, "scored": scored, "reps": reps}


def test_simmetrics_kernel_paths_agree(spark):
    """The vectorized ASCII path of ``trigram_cosine_simmetrics`` must be
    bit-identical to the exact Counter fallback on real MusicBrainz labels
    (incl. accented strings, identical pairs, empties, and nulls)."""
    import pandas as pd

    from mapping_analysis_spark.music import (
        _simmetrics_cosine,
        _trigrams,
        music_records,
        trigram_cosine_simmetrics,
    )
    from pyspark.sql import functions as F

    recs = music_records(spark, MUSIC_CSV).select("ata_norm")
    vals = [r[0] for r in recs.distinct().orderBy("ata_norm").limit(600).collect()]
    accented = [
        r[0]
        for r in recs.filter(~F.col("ata_norm").rlike("^[\\x00-\\x7F]*$"))
        .distinct()
        .orderBy("ata_norm")
        .limit(50)
        .collect()
    ]
    rot = vals[1:] + vals[:1]
    xs = vals + vals[:50] + accented + [vals[0], "", None, vals[1]]
    ys = rot + vals[:50] + list(reversed(accented)) + ["", vals[0], vals[1], None]

    def exact(x, y):
        if x is None or y is None:
            return 0.0
        if x == "" or y == "":
            # simmetrics: two empty multisets compare 1.0, one empty 0.0
            return 1.0 if x == "" and y == "" else 0.0
        ca, cb = _trigrams(x), _trigrams(y)
        return _simmetrics_cosine(ca, sum(ca.values()), cb, sum(cb.values()))

    expected = [exact(x, y) for x, y in zip(xs, ys)]
    got = trigram_cosine_simmetrics.func(pd.Series(xs), pd.Series(ys)).tolist()
    assert got == expected
    # identical non-empty strings score ~1.0 (sqrt(n)*sqrt(n) != n in float,
    # same as the reference's Java expression — hence not exactly 1.0)
    ident = [
        g
        for g, v in zip(got[len(vals) : len(vals) + 50], vals[:50])
        if v  # empty-vs-empty is exactly 1.0; excluded from the ~1.0 check
    ]
    assert ident and all(abs(g - 1.0) <= 2e-6 for g in ident)


def test_music_input_graph_matches_reference(music):
    """MusicBrainzTest.java:58-64: 19,375 vertices, 9,375 SIMPLE edges."""
    assert music["records"].count() == 19375
    assert music["edges"].count() == 9375


def test_music_representatives_cover_all_records(music):
    from pyspark.sql import functions as F

    reps = music["reps"]
    n_members = reps.select(F.sum(F.size("members"))).collect()[0][0]
    assert n_members == 19375
    # representative id is a member id
    bad = reps.filter(~F.array_contains(F.col("members"), F.col("cluster_rid"))).count()
    assert bad == 0


def test_music_quality_beats_reference_anchor(music, spark):
    """Full pipeline at the reference's best threshold 0.55: the reference
    publishes P 0.994 / R 0.9436 / F1 0.9681; we require F1 >= 0.975 and
    precision >= 0.985 (measured 0.9805 / 0.9959 — slack for any future
    tie-break drift, still strictly above the reference F1)."""
    from mapping_analysis_spark.music import music_merge
    from mapping_analysis_spark.operators.evaluation import pair_quality

    merged = music_merge(music["reps"], 0.55)
    assert merged.count() == 19375
    gold = music["records"].select("rid", "cid")
    q = pair_quality(
        merged, gold, pred_group="cluster_rid", gold_group="cid", member_col="rid"
    ).collect()[0]
    assert q["n_gold"] == 16250
    assert q["precision_e6"] >= 985_000
    assert q["f1_e6"] >= 975_000


def test_music_incremental_matches_reference_anchor(spark):
    """The incremental MULTI benchmark (initial 80% -> +10% -> +source 5 ->
    +final 10%, ``IncrementalMusicClusteringTest.java:117-245``). Published
    anchor on this file: P 0.98926 / R 0.88394 / F1 0.93364; measured here
    P 0.99554 / R 0.87951 / F1 0.93394 (slack below for tie-break drift)."""
    from mapping_analysis_spark.music import music_incremental_quality

    base = "/root/reference/analysis-core/src/test/resources/data/musicbrainz/"
    rows = music_incremental_quality(spark, MUSIC_CSV, base + "split").collect()
    assert [r["phase"] for r in rows] == [
        "initial_80", "add_10", "add_source_5", "add_last_10",
    ]
    final = rows[-1]
    assert final["n_gold"] == 16250
    assert final["precision_e6"] >= 990_000
    assert final["recall_e6"] >= 870_000
    assert final["f1_e6"] >= 928_000
