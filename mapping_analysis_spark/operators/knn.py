"""Approximate nearest-neighbor search over embedding columns.

* ``brute_topk`` — exact cosine top-k via broadcast cross-join; the baseline
  and the small-query-set path (queries broadcast, corpus streamed — one
  pass, no shuffle of the corpus).
* ``hyperplane_lsh_topk`` — random-hyperplane LSH bucketing: sign-bit
  sketches from seeded Gaussian projections (pandas UDF, Arrow-batched);
  neighbors are searched only within matching buckets (multi-probe via
  several independent tables). Recall < 1 by construction; the scale path
  when the corpus no longer fits a broadcast cross-join.

Dot products run on integer-quantized vectors (exact in int64) so results
are deterministic across engines and runs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType


def _quantized(vec_col, scale: float = 10000.0):
    return F.transform(
        vec_col, lambda x: F.floor(x.cast("double") * scale + 0.5).cast("long")
    )


def _dot(u, v):
    return F.aggregate(
        F.zip_with(u, v, lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, x: acc + x
    )


def brute_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k of every query against the corpus.

    Returns (q_id, nn_id, rank, sim). Plan shape: corpus scan × broadcast
    queries → window top-k; the corpus is never shuffled.
    """
    base = corpus.select(
        F.col(id_col).alias("nn_id"), _quantized(F.col(vec_col)).alias("v")
    ).withColumn("n2", _dot(F.col("v"), F.col("v")))
    q = queries.select(
        F.col(id_col).alias("q_id"), _quantized(F.col(vec_col)).alias("qv")
    ).withColumn("qn", _dot(F.col("qv"), F.col("qv")))
    joined = base.crossJoin(F.broadcast(q)).filter(F.col("nn_id") != F.col("q_id"))
    sim = _dot(F.col("qv"), F.col("v")).cast("double") / (
        F.sqrt(F.col("qn").cast("double")) * F.sqrt(F.col("n2").cast("double"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("nn_id").asc())
    return (
        joined.withColumn("sim", sim)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "nn_id", "rank", "sim")
    )


def make_hyperplane_sketch_udf(dim: int, bits: int = 16, tables: int = 4, seed: int = 42):
    """pandas UDF: embedding → array of ``tables`` bucket ids (sign-bit
    sketches under independent Gaussian projections). Seeded → deterministic
    across executors, micro-batches, and resumes."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((tables, bits, dim)).astype(np.float64)

    @F.pandas_udf(ArrayType(LongType()))
    def sketch(emb: pd.Series) -> pd.Series:
        out = []
        pow2 = 1 << np.arange(bits, dtype=np.int64)
        for v in emb:
            if v is None:
                out.append([0] * tables)
                continue
            x = np.asarray(v, dtype=np.float64)
            signs = (np.einsum("tbd,d->tb", planes, x) > 0).astype(np.int64)
            out.append((signs @ pow2).tolist())
        return pd.Series(out)

    return sketch


def hyperplane_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    bits: int = 12,
    tables: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """ANN: candidates share a sketch bucket in >=1 table; exact cosine rank
    within candidates. Bucket join replaces the cross-join — at N corpus
    rows the work drops from O(N·Q) to O(candidate pairs)."""
    sk = make_hyperplane_sketch_udf(dim, bits, tables)
    c = corpus.select(
        F.col(id_col).alias("nn_id"),
        _quantized(F.col(vec_col)).alias("v"),
        F.posexplode(sk(F.col(vec_col))).alias("table_idx", "bucket"),
    ).withColumn("n2", _dot(F.col("v"), F.col("v")))
    q = queries.select(
        F.col(id_col).alias("q_id"),
        _quantized(F.col(vec_col)).alias("qv"),
        F.posexplode(sk(F.col(vec_col))).alias("table_idx", "bucket"),
    ).withColumn("qn", _dot(F.col("qv"), F.col("qv")))
    cand = (
        c.join(F.broadcast(q), ["table_idx", "bucket"])
        .filter(F.col("nn_id") != F.col("q_id"))
        .dropDuplicates(["q_id", "nn_id"])
    )
    sim = _dot(F.col("qv"), F.col("v")).cast("double") / (
        F.sqrt(F.col("qn").cast("double")) * F.sqrt(F.col("n2").cast("double"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("nn_id").asc())
    return (
        cand.withColumn("sim", sim)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "nn_id", "rank", "sim")
    )
