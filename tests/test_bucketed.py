"""Bucketed-table layout contract: joins/aggregations on the bucket key
must run with ZERO shuffle exchanges, and produce exactly the same rows as
the shuffled plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapping_analysis_spark.io.bucketed import (
    n_shuffle_exchanges,
    read_bucketed,
    write_bucketed,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def bucketed_pair(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("buckets")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").withColumnRenamed(
        "vec_id", "doc_id"
    )
    d = write_bucketed(docs, "t_docs_b", "doc_id", 8, path=str(base / "docs"))
    e = write_bucketed(emb, "t_emb_b", "doc_id", 8, path=str(base / "emb"))
    yield d, e
    spark.sql("DROP TABLE IF EXISTS t_docs_b")
    spark.sql("DROP TABLE IF EXISTS t_emb_b")


def test_bucketed_join_no_shuffle_and_parity(spark, bucketed_pair):
    d, e = bucketed_pair
    joined = d.join(e, "doc_id").select("doc_id", "text", "embedding")
    assert n_shuffle_exchanges(joined) == 0, "co-located join must not shuffle"

    plain = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .join(
            spark.read.parquet(f"{SF}/embeddings.parquet").withColumnRenamed(
                "vec_id", "doc_id"
            ),
            "doc_id",
        )
        .select("doc_id", "text", "embedding")
    )
    assert n_shuffle_exchanges(plain) > 0, "baseline shuffled plan sanity"
    got = sorted((r["doc_id"], r["text"]) for r in joined.collect())
    want = sorted((r["doc_id"], r["text"]) for r in plain.collect())
    assert got == want


def test_bucketed_groupby_no_shuffle(spark, bucketed_pair):
    d, _ = bucketed_pair
    agg = d.groupBy("doc_id").agg(F.count("*").alias("n"))
    assert n_shuffle_exchanges(agg) == 0, "bucket-key aggregation must not shuffle"
    assert agg.count() == spark.read.parquet(f"{SF}/documents.parquet").count()


def test_mismatched_bucket_count_shuffles_one_side(spark, bucketed_pair, tmp_path):
    """Co-location is a contract on the bucket count: a 4-bucket table joined
    to an 8-bucket table shuffles exactly one side (the planner re-buckets
    the smaller-count side), never both."""
    d, e = bucketed_pair
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    d4 = write_bucketed(docs, "t_docs_b4", "doc_id", 4, path=str(tmp_path / "d4"))
    try:
        joined = d4.join(e, "doc_id").select("doc_id")
        assert n_shuffle_exchanges(joined) == 1
    finally:
        spark.sql("DROP TABLE IF EXISTS t_docs_b4")


def test_bucketed_reread_keeps_layout(spark, bucketed_pair):
    d, e = bucketed_pair
    d2, e2 = read_bucketed(spark, "t_docs_b"), read_bucketed(spark, "t_emb_b")
    assert n_shuffle_exchanges(d2.join(e2, "doc_id").select("doc_id")) == 0


def test_bucketed_append_mode_keeps_existing_rows(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    write_bucketed(docs, "t_docs_app", "doc_id", 4, path=str(tmp_path / "app"))
    try:
        n0 = spark.table("t_docs_app").count()
        write_bucketed(
            docs.withColumn("doc_id", F.col("doc_id") + 1_000_000),
            "t_docs_app",
            "doc_id",
            4,
            path=str(tmp_path / "app"),
            mode="append",
        )
        assert spark.table("t_docs_app").count() == 2 * n0
    finally:
        spark.sql("DROP TABLE IF EXISTS t_docs_app")
