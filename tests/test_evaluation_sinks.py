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
    st = SnapshotStateTable(spark, str(tmp_path), "t", compact_every=3)
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
    # batch 2: delete tombstone for k2 — also triggers compaction
    # (compact_every=3) → a fresh base snapshot b2
    dels = spark.createDataFrame([("k2",)], ["k"])
    st.apply_delta(None, dels, ["k"], batch_id=2)
    got = {(r["k"], r["v"]) for r in st.read().collect()}
    assert got == {("k1", 10), ("k3", 3)}
    # empty commits keep replay detection monotonic at zero data cost
    st.commit_unchanged(3)
    assert st.committed(3)
    assert {(r["k"], r["v"]) for r in st.read().collect()} == got
    # prune drops history superseded by the base snapshot
    st.prune(keep_last=1)
    assert st.versions() == [2, 3]
    # state still resolves identically after pruning
    assert {(r["k"], r["v"]) for r in st.read().collect()} == got


def test_upsert_writes_are_delta_sized(spark, tmp_path):
    """Per-batch bytes written must be O(batch), not O(total state) —
    the Iceberg MERGE cost model this table stands in for."""
    from pyspark.sql import functions as F

    st = SnapshotStateTable(spark, str(tmp_path), "t", compact_every=1000)
    big = spark.range(20000).select(
        F.col("id").cast("string").alias("k"), F.col("id").alias("v")
    )
    st.upsert(big, ["k"], batch_id=0)
    small = spark.range(50).select(
        F.col("id").cast("string").alias("k"), (F.col("id") + 1_000_000).alias("v")
    )
    st.upsert(small, ["k"], batch_id=1)

    def dir_bytes(d):
        return sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(d)
            for f in fs
        )

    b0 = dir_bytes(os.path.join(str(tmp_path), "t", "d0000000000"))
    b1 = dir_bytes(os.path.join(str(tmp_path), "t", "d0000000001"))
    assert b1 < b0 * 0.2, (b0, b1)
    out = st.read()
    assert out.count() == 20000
    assert out.filter(F.col("v") >= 1_000_000).count() == 50


def test_bucketed_state_table_pruned_reads(spark, tmp_path):
    """read_for returns exactly the requested keys' rows and scans only the
    touched buckets (Iceberg bucket-partition pruning analogue)."""
    from pyspark.sql import functions as F

    st = SnapshotStateTable(
        spark, str(tmp_path), "bt", bucket_by=["k"], num_buckets=8,
        track_scans=True, compact_every=1000,
    )
    df = spark.range(200).select(
        F.concat(F.lit("k"), F.col("id")).alias("k"), F.col("id").alias("v")
    )
    st.upsert(df, ["k"], batch_id=0)
    # update a few keys in a second delta — merge-on-read must resolve
    upd = spark.createDataFrame([("k5", 500), ("k7", 700)], ["k", "v"])
    st.upsert(upd, ["k"], batch_id=1)
    keys = spark.createDataFrame([("k5",), ("k7",), ("k123",)], ["k"])
    got = {(r["k"], r["v"]) for r in st.read_for(keys).collect()}
    assert got == {("k5", 500), ("k7", 700), ("k123", 123)}
    # pruned read touched far fewer rows than the 202 in state
    assert 0 < st.scan_stats["read_rows"] <= 60, st.scan_stats
    # deletes tombstone within the right bucket
    st.apply_delta(None, spark.createDataFrame([("k5",)], ["k"]), ["k"], 2)
    got = {(r["k"], r["v"]) for r in st.read_for(keys).collect()}
    assert got == {("k7", 700), ("k123", 123)}
    # full read still resolves everything
    assert st.read().count() == 199


def test_iceberg_sql_generation(spark):
    """The real-Iceberg swap-in path: SQL text is correct without the jars."""
    from mapping_analysis_spark.streaming.sinks import (
        IcebergStateTable,
        make_state_table,
    )

    it = IcebergStateTable(spark, "state.edges", bucket_by=["u"], num_buckets=64)
    assert not it.available(spark)  # sandbox has no Iceberg runtime
    c = it.create_sql("u string, v string")
    assert "USING iceberg" in c and "PARTITIONED BY (bucket(64, u))" in c
    m = it.merge_sql(["u", "v"], ["u", "v", "w"])
    assert "MERGE INTO state.edges t USING _delta s ON t.u = s.u AND t.v = s.v" in m
    assert "WHEN MATCHED AND s._op = 'd' THEN DELETE" in m
    assert "WHEN NOT MATCHED AND s._op = 'u' THEN INSERT (u, v, w)" in m
    assert "rewrite_data_files" in it.compact_sql()
    # per-batch idempotence watermark (checked by apply_delta before MERGE)
    assert it.watermark_read_sql() == "SHOW TBLPROPERTIES state.edges ('last_merged_batch')"
    assert (
        it.watermark_set_sql(7)
        == "ALTER TABLE state.edges SET TBLPROPERTIES ('last_merged_batch'='7')"
    )
    # read_for's explicit bucket-pruning predicate (round-3 What's wrong #4:
    # a bare semi-join does not guarantee partition pruning on a bucket
    # transform) + version-pinned replay reads
    assert (
        it.bucket_ids_sql("_rf_keys")
        == "SELECT DISTINCT system.bucket(64, u) AS _b_u FROM _rf_keys"
    )
    f = it.bucket_filter_sql({"u": [5, 3, 5]})
    assert f == "system.bucket(64, u) IN (3, 5)"
    two = IcebergStateTable(spark, "state.x", bucket_by=["a", "b"], num_buckets=8)
    assert (
        two.bucket_filter_sql({"a": [1], "b": [2, 0]})
        == "system.bucket(8, a) IN (1) AND system.bucket(8, b) IN (0, 2)"
    )
    assert (
        it.snapshot_set_sql(9, 1234)
        == "ALTER TABLE state.edges SET TBLPROPERTIES "
        "('pre_merge_snapshot_b9'='1234')"
    )
    assert (
        it.versioned_table_sql(1234)
        == "SELECT * FROM state.edges VERSION AS OF 1234"
    )
    # factory falls back to the parquet stand-in without the runtime
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        st = make_state_table(spark, d, "t", bucket_by=["k"])
        assert isinstance(st, SnapshotStateTable)
