"""Tests for the training-data dedup suite (exact / LSH / SimHash / n-gram /
embedding) on the driver-provided documents + embeddings tables."""

from __future__ import annotations

import duckdb
import pytest

from mapping_analysis_spark.operators.dedup import (
    embedding_neardup,
    exact_dedup,
    minhash_lsh_dedup,
    ngram_jaccard_dedup,
    simhash_dedup,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_exact_dedup_groups(spark):
    df = spark.createDataFrame(
        [(1, "x y z"), (2, "x y z"), (3, "unique")], ["doc_id", "text"]
    )
    got = {(r["keeper"], r["member"]) for r in exact_dedup(df).collect()}
    assert got == {(1, 1), (1, 2), (3, 3)}


def _brute_pairs(threshold: float, width: int) -> set:
    con = duckdb.connect()
    q = f"""
    WITH sh AS (
      SELECT doc_id,
        list_distinct([array_to_string(tk[i:i+{width - 1}], ' ')
                       for i in range(1, greatest(1, len(tk)-{width - 1}) + 1)]) AS sg
      FROM (SELECT doc_id, string_split(text, ' ') AS tk
            FROM read_parquet('{SF}/documents.parquet'))
    )
    SELECT a.doc_id, b.doc_id FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.sg, b.sg)) AS DOUBLE)
          / len(list_distinct(list_concat(a.sg, b.sg))) >= {threshold}
    """
    return {tuple(r) for r in con.execute(q).fetchall()}


def test_minhash_lsh_dedup_equals_bruteforce(spark, docs):
    got = {(r["a_doc"], r["b_doc"]) for r in minhash_lsh_dedup(docs, threshold=0.5).collect()}
    assert got == _brute_pairs(0.5, 3)
    assert len(got) > 0  # the corpus plants near-duplicates


def test_ngram_jaccard_dedup_width_2(spark, docs):
    got = {(r["a_doc"], r["b_doc"]) for r in ngram_jaccard_dedup(docs, n=2, threshold=0.5).collect()}
    assert got == _brute_pairs(0.5, 2)


def test_dense_and_lsh_routes_agree(spark, docs, monkeypatch):
    """The dense-bitset route (taken at sf0.001: tiny shingle vocabulary) and
    the banded-LSH route must emit identical (pair, sim) sets — the gate is
    pure plan choice."""
    from mapping_analysis_spark.operators import dedup as dd

    dense = {
        (r["a_doc"], r["b_doc"], round(r["sim"], 9))
        for r in minhash_lsh_dedup(docs, threshold=0.5).collect()
    }
    monkeypatch.setattr(dd, "DENSE_VOCAB_MAX", 0)  # force the LSH plan
    lsh = {
        (r["a_doc"], r["b_doc"], round(r["sim"], 9))
        for r in minhash_lsh_dedup(docs, threshold=0.5).collect()
    }
    assert dense == lsh and len(dense) > 0


def test_simhash_dedup_finds_planted_neardups(spark, docs):
    got = {(r["a_doc"], r["b_doc"]) for r in simhash_dedup(docs, max_hamming=6).collect()}
    exact = _brute_pairs(0.8, 3)
    # SimHash at small Hamming radius should recover most high-Jaccard pairs
    assert len(got & exact) >= len(exact) * 0.6
    for pair in got:
        assert pair[0] < pair[1]


def test_simhash_banded_equals_bruteforce_when_hamming_lt_bands(spark):
    """Pigeonhole: with max_hamming (3) < n_bands (4), a qualifying pair
    always shares an intact 16-bit band, so the banded plan's output equals
    the O(n²) brute-force Hamming filter — the invariant the driver-gated
    ``doc_simhash_neardup`` oracle relies on. Uses the engine-portable md5
    hash basis (remix off) like the contract query."""
    from pyspark.sql import functions as F

    from mapping_analysis_spark.functions.simfns import make_simhash_udf

    def md5_60(t):
        return F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long")

    docs01 = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    banded = {
        (r["a_doc"], r["b_doc"], r["hamming"])
        for r in simhash_dedup(docs01, token_hash=md5_60, remix=False).collect()
    }
    toks = F.filter(F.split(F.col("text"), " "), lambda t: t != F.lit(""))
    fps = docs01.select(
        F.col("doc_id").alias("rid"),
        make_simhash_udf(remix=False)(
            F.transform(toks, lambda t: md5_60(t))
        ).alias("fp"),
    )
    a = fps.selectExpr("rid AS a_doc", "fp AS fa")
    b = fps.selectExpr("rid AS b_doc", "fp AS fb")
    brute = (
        a.crossJoin(b)
        .filter(F.col("a_doc") < F.col("b_doc"))
        .withColumn("hamming", F.bit_count(F.col("fa").bitwiseXOR(F.col("fb"))))
        .filter(F.col("hamming") <= 3)
    )
    bset = {(r["a_doc"], r["b_doc"], r["hamming"]) for r in brute.collect()}
    assert banded == bset
    assert len(banded) > 0
    # generalized pigeonhole (3-of-6 10-bit combo keys, the contract query's
    # candidate shape): same provably-complete output, far fewer candidates
    combo = {
        (r["a_doc"], r["b_doc"], r["hamming"])
        for r in simhash_dedup(
            docs01, token_hash=md5_60, remix=False, n_bands=6, combo_bands=3
        ).collect()
    }
    assert combo == bset


def test_embedding_neardup_symmetric_and_thresholded(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    got = embedding_neardup(emb, threshold=0.9).collect()
    for r in got:
        assert r["a_id"] < r["b_id"]
        assert r["sim"] >= 0.9


def test_embedding_neardup_lsh_equals_exact(spark):
    """The hyperplane-LSH candidate stage must lose no pair vs brute force
    on the planted-near-dup corpus (the similarity gap makes recall exact)."""
    from mapping_analysis_spark.data.embeddings import ensure_neardup_embeddings
    from mapping_analysis_spark.operators.dedup import embedding_neardup

    emb = spark.read.parquet(ensure_neardup_embeddings("/root/testdata/sf0.001"))
    lsh = {
        (r["a_id"], r["b_id"]) for r in embedding_neardup(emb, method="lsh").collect()
    }
    exact = {
        (r["a_id"], r["b_id"]) for r in embedding_neardup(emb, method="exact").collect()
    }
    assert lsh == exact and len(exact) > 0
