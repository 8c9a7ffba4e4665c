"""Scale-shape tests for the music merge path (round-4 What's wrong #2).

The O(k²) pair featurization+scoring of ``music_merge`` must run
distributively (salted triangle self-join + vectorized Arrow kernel), with
the per-block Python kernel consuming only pre-scored admitted pairs — so a
hot 4-char-prefix block with thousands of representatives is spread over
many bounded tasks instead of one O(k²) Python straggler
(reference shape: ``blocksplit/BlockSplitTripletCreator.java:49-117``).
"""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F


def _hot_block_reps(spark, n: int):
    """``n`` singleton representatives all sharing one 4-char blocking
    prefix: 50 planted cross-source near-duplicate pairs (identical ATA)
    that must merge, the rest deterministic hex noise that must not."""
    rows = []
    for i in range(n - 100):
        # hex words ≈ unrelated strings: pairwise trigram sim ~0.3 from the
        # shared "aaaa " prefix, far below the 0.55 merge threshold
        ata = f"aaaa {i * 2654435761 % 2**32:08x} {i * 40503 % 65536:04x}"
        rows.append((10_000 + i, ata, 1 << (i % 5), [10_000 + i]))
    for i in range(50):
        # identical within the pair, hex-distinct across pairs (plain
        # numbered labels differ only in digits → trigram sim ≈ 0.85 and
        # the pairs would legitimately cross-merge)
        ata = (
            f"aaaa {(1_000_000 + i) * 2654435761 % 2**32:08x} planted "
            f"{(1_000_000 + i) * 2246822519 % 2**32:08x}"
        )
        rows.append((1_000_000 + i, ata, 1 << (i % 5), [1_000_000 + i]))
        rows.append((2_000_000 + i, ata, 1 << ((i + 1) % 5), [2_000_000 + i]))
    return spark.createDataFrame(
        rows, "cluster_rid long, ata string, smask long, members array<long>"
    )


def test_music_merge_hot_block_bounded(spark):
    from mapping_analysis_spark.music import music_blocking_label, music_merge

    n = 5_000
    reps = _hot_block_reps(spark, n).localCheckpoint(eager=True)
    # the whole workset really is ONE blocking label
    blocks = (
        reps.select(music_blocking_label(F.col("ata")).alias("b"))
        .distinct()
        .collect()
    )
    assert [r["b"] for r in blocks] == ["aaaa"]

    t0 = time.time()
    out = music_merge(reps, 0.55).toPandas()
    wall = time.time() - t0
    assert len(out) == n
    assign = dict(zip(out["rid"], out["cluster_rid"]))
    # every planted near-duplicate pair merged, cluster id = min member id
    for i in range(50):
        assert assign[1_000_000 + i] == 1_000_000 + i
        assert assign[2_000_000 + i] == 1_000_000 + i
    # noise is near-all singletons: in 12M random hex pairs a handful can
    # legitimately chance-score >= 0.55, so assert an envelope, not zero
    n_clusters = len(set(assign.values()))
    assert n - 50 - 400 <= n_clusters <= n - 50
    # bounded wall: ~12.5M pair sims distributed over salted tasks — a
    # single-task all-pairs Python kernel takes many minutes on this input
    assert wall < 300, f"hot block took {wall:.0f}s"


def test_music_merge_matches_pre_rework_semantics(spark):
    """Greedy result on a small mixed workset is identical to an in-kernel
    brute-force replay (the pre-rework algorithm)."""
    from mapping_analysis_spark.music import (
        _simmetrics_cosine,
        _trigrams,
        music_merge,
    )

    rows = [
        (1, "blue moon over the city", 1, [1, 10]),
        (2, "blue moon over the citty", 2, [2]),
        (3, "blue moon ovr the city", 4, [3, 11, 12]),
        (4, "blue morning entirely different", 8, [4]),
        (5, "blue moon over the city", 8, [5]),
        (6, "something else entirely here", 16, [6]),
    ]
    reps = spark.createDataFrame(
        rows, "cluster_rid long, ata string, smask long, members array<long>"
    )
    got = {
        (int(r["rid"]), int(r["cluster_rid"]))
        for r in music_merge(reps, 0.55).collect()
    }

    # driver-side replay of the reference greedy (the pre-rework kernel)
    ata = {r[0]: r[1] for r in rows}
    mask = {r[0]: r[2] for r in rows}
    members = {r[0]: list(r[3]) for r in rows}
    members0 = {k: list(v) for k, v in members.items()}
    ids = [r[0] for r in rows]

    def sim(x, y):
        ca, cb = _trigrams(ata[x]), _trigrams(ata[y])
        return _simmetrics_cosine(ca, sum(ca.values()), cb, sum(cb.values()))

    def ok(x, y):
        return (mask[x] & mask[y]) == 0 and bin(mask[x] | mask[y]).count("1") <= 5

    sims = {}
    for i, x in enumerate(ids):
        for y in ids[i + 1 :]:
            if ok(x, y):
                s = sim(x, y)
                if s >= 0.55:
                    sims[(x, y)] = s
    parent = {x: x for x in ids}
    live = set(ids)
    while sims:
        (a, b), s = min(sims.items(), key=lambda kv: (-kv[1], kv[0]))
        keep, gone = (a, b) if a < b else (b, a)
        pri = a if len(members[a]) >= len(members[b]) else b
        ata[keep] = ata[pri] if ata[pri] else ata[a if pri == b else b]
        mask[keep] = mask[a] | mask[b]
        members[keep] = members[a] + members[b]
        for x, root in list(parent.items()):
            if root == gone:
                parent[x] = keep
        parent[gone] = keep
        live.discard(gone)
        sims = {
            (x, y): sv
            for (x, y), sv in sims.items()
            if keep not in (x, y) and gone not in (x, y)
        }
        for other in live:
            if other == keep:
                continue
            x, y = (keep, other) if keep < other else (other, keep)
            if ok(x, y):
                s2 = sim(x, y)
                if s2 >= 0.55:
                    sims[(x, y)] = s2
    expected = set()
    for cid in ids:
        final = parent[cid]
        while parent[final] != final:
            final = parent[final]
        for m in members0[cid]:
            expected.add((m, final))
    # single blocking label — the distributed path must reproduce the greedy
    assert got == expected
