"""applyInPandasWithState union-find clusterer: incremental state across
micro-batches, monotone unions, per-block isolation."""

from __future__ import annotations

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from mapping_analysis_spark.streaming.stateful import (
    INPUT_COLS,
    stateful_block_clustering,
)

ROWS_BATCH_1 = [
    ("blk1", "c1", 1, ["ent1", "alpha", "beta", "gamma"]),
    ("blk1", "c2", 2, ["ent1", "alpha", "beta", "delta"]),  # j(c1,c2)=3/5=0.6
    ("blk2", "z1", 1, ["zeta", "eta"]),
]
ROWS_BATCH_2 = [
    ("blk1", "c3", 3, ["ent1", "alpha", "beta", "gamma"]),  # joins c1's cluster
    ("blk2", "z2", 2, ["completely", "different"]),          # stays singleton
]


@pytest.fixture()
def staged_stream(spark, tmp_path):
    d = str(tmp_path / "recs")
    os.makedirs(d)
    schema = "block_key string, rid string, source int, toks array<string>"
    for i, rows in enumerate([ROWS_BATCH_1, ROWS_BATCH_2]):
        p = str(tmp_path / f"b{i}")
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(p)
        shutil.move(glob.glob(f"{p}/part-*.parquet")[0], f"{d}/b{i:02d}.parquet")
    return d


def test_stateful_union_find_across_batches(spark, staged_stream, tmp_path):
    schema = "block_key string, rid string, source int, toks array<string>"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staged_stream)
    )
    q = (
        stateful_block_clustering(stream, threshold=0.5)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("sbc")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = spark.sql("select * from sbc").collect()
    # last emitted cluster per rid wins (update mode)
    last = {}
    for r in rows:
        last[r["rid"]] = r["cluster"]
    assert last["c1"] == "c1" and last["c2"] == "c1"
    assert last["c3"] == "c1"  # second batch joined the existing state
    assert last["z1"] == "z1" and last["z2"] == "z2"  # no cross-source sim


def test_stateful_block_cap(spark, tmp_path):
    """Oversized (stop) blocks must not grow state or scan quadratically:
    arrivals beyond max_block_size are dropped for that block."""
    d = str(tmp_path / "capped")
    os.makedirs(d)
    schema = "block_key string, rid string, source int, toks array<string>"
    rows = [
        ("hot", f"r{i:03d}", i % 3, [f"tok{i}", "shared", "words"]) for i in range(30)
    ]
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(str(tmp_path / "w"))
    shutil.move(glob.glob(f"{tmp_path}/w/part-*.parquet")[0], f"{d}/b00.parquet")
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(d)
    )
    q = (
        stateful_block_clustering(stream, threshold=0.5, max_block_size=8)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("sbc_cap")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rids = {r["rid"] for r in spark.sql("select rid from sbc_cap").collect()}
    assert len(rids) <= 8
