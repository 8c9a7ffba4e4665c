"""Tests for the P/R/F1 evaluation operator and the exactly-once state table."""

from __future__ import annotations

import os

from mapping_analysis_spark.operators.evaluation import cluster_pairs, pair_quality
from mapping_analysis_spark.streaming.sinks import SnapshotStateTable


def test_cluster_pairs_explosion(spark):
    df = spark.createDataFrame(
        [("g1", "a"), ("g1", "b"), ("g1", "c"), ("g2", "x")], ["g", "m"]
    )
    got = {(r["a"], r["b"]) for r in cluster_pairs(df, "g", "m").collect()}
    assert got == {("a", "b"), ("a", "c"), ("b", "c")}


def test_pair_quality_counts(spark):
    pred = spark.createDataFrame(
        [("c1", "a"), ("c1", "b"), ("c2", "c"), ("c2", "d")], ["cluster_id", "conv_id"]
    )
    gold = spark.createDataFrame(
        [("e1", "a"), ("e1", "b"), ("e1", "c"), ("e2", "d")], ["entity_id", "conv_id"]
    )
    row = pair_quality(pred, gold).collect()[0]
    # pred pairs: (a,b), (c,d); gold pairs: (a,b), (a,c), (b,c); tp = 1
    assert row["tp"] == 1 and row["n_pred"] == 2 and row["n_gold"] == 3
    assert row["precision_e6"] == 500000
    assert row["recall_e6"] == 333333


def test_snapshot_state_table_exactly_once(spark, tmp_path):
    st = SnapshotStateTable(spark, str(tmp_path), "t")
    df1 = spark.createDataFrame([("k1", 1), ("k2", 2)], ["k", "v"])
    st.upsert(df1, ["k"], batch_id=0)
    # replay of batch 0 with different data must be a no-op (already committed)
    df_replay = spark.createDataFrame([("k1", 99)], ["k", "v"])
    st.upsert(df_replay, ["k"], batch_id=0)
    got = {(r["k"], r["v"]) for r in st.read().collect()}
    assert got == {("k1", 1), ("k2", 2)}
    # batch 1 upserts k1 and adds k3
    df2 = spark.createDataFrame([("k1", 10), ("k3", 3)], ["k", "v"])
    st.upsert(df2, ["k"], batch_id=1)
    got = {(r["k"], r["v"]) for r in st.read().collect()}
    assert got == {("k1", 10), ("k2", 2), ("k3", 3)}
    assert st.versions() == [0, 1]
    # prune keeps the latest snapshots
    for b in (2, 3, 4):
        st.commit(st.read(), b)
    st.prune(keep_last=2)
    assert st.versions() == [3, 4]
    assert os.path.exists(st._vdir(4))
