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


def _cosine(u_col, un_col, v_col, vn_col):
    return _dot(u_col, v_col).cast("double") / (
        F.sqrt(un_col.cast("double")) * F.sqrt(vn_col.cast("double"))
    )


def ivf_centroids(base: DataFrame, n_cells: int, iters: int) -> DataFrame:
    """Deterministic IVF coarse quantizer over quantized vectors.

    ``base`` must carry ``(nn_id, v array<long>, n2 long)``. Seeds are the
    ``n_cells`` vectors with the smallest ids (deterministic — no RNG, no
    driver collect); each Lloyd iteration assigns every vector to its
    nearest seed by cosine (ties → smallest cell id) and recomputes each
    cell's centroid as the element-wise ``floor(mean)`` in quantized integer
    space, so every arithmetic step is exact and engine-portable. Empty
    cells drop out. Returns ``(cell int, c array<long>, cn long)``.
    """
    seeds = (
        base.orderBy(F.col("nn_id").asc())
        .limit(n_cells)
        .select(
            (F.row_number().over(Window.orderBy(F.col("nn_id").asc())) - 1).alias("cell"),
            F.col("v").alias("c"),
            F.col("n2").alias("cn"),
        )
    )
    cents = seeds
    for _ in range(iters):
        sim = _cosine(F.col("v"), F.col("n2"), F.col("c"), F.col("cn"))
        w = Window.partitionBy("nn_id").orderBy(F.col("sim").desc(), F.col("cell").asc())
        assign = (
            base.crossJoin(F.broadcast(cents))
            .withColumn("sim", sim)
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select("cell", "v")
        )
        comp = (
            assign.select("cell", F.posexplode(F.col("v")).alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.floor(F.sum("x") / F.count("*")).cast("long").alias("m"))
        )
        newc = (
            comp.groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
                ).alias("c")
            )
            .withColumn("cn", _dot(F.col("c"), F.col("c")))
        )
        cents = newc
    return cents


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 8,
    n_probe: int = 2,
    iters: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF ANN: cluster the corpus into ``n_cells`` inverted lists with a
    deterministic k-means coarse quantizer, assign each query to its
    ``n_probe`` nearest cells, exact-rerank cosine top-k within the probed
    lists.

    Scale shape: the centroid table is O(n_cells) and broadcast everywhere;
    the corpus is touched by (a) one linear assignment pass per Lloyd
    iteration and (b) one probed-cell join at query time — never an O(N·Q)
    cross join, and the inverted lists shuffle once on ``cell``. With
    ``n_probe == n_cells`` the result degenerates to exact ``brute_topk``
    (pinned by tests), which bounds the approximation to the probe policy.
    """
    # base feeds the Lloyd assignment AND the inverted-list build; cents
    # feeds list assignment AND query probing — checkpoint both so the
    # quantization pass and the k-means run exactly once
    base = (
        corpus.select(
            F.col(id_col).alias("nn_id"), _quantized(F.col(vec_col)).alias("v")
        )
        .withColumn("n2", _dot(F.col("v"), F.col("v")))
        .localCheckpoint(eager=True)
    )
    cents = ivf_centroids(base, n_cells, iters).localCheckpoint(eager=True)

    sim_vc = _cosine(F.col("v"), F.col("n2"), F.col("c"), F.col("cn"))
    w_assign = Window.partitionBy("nn_id").orderBy(F.col("sim").desc(), F.col("cell").asc())
    lists = (
        base.crossJoin(F.broadcast(cents))
        .withColumn("sim", sim_vc)
        .withColumn("rk", F.row_number().over(w_assign))
        .filter(F.col("rk") == 1)
        .select("cell", "nn_id", "v", "n2")
    )

    q = queries.select(
        F.col(id_col).alias("q_id"), _quantized(F.col(vec_col)).alias("qv")
    ).withColumn("qn", _dot(F.col("qv"), F.col("qv")))
    sim_qc = _cosine(F.col("qv"), F.col("qn"), F.col("c"), F.col("cn"))
    w_probe = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("cell").asc())
    probes = (
        q.crossJoin(F.broadcast(cents))
        .withColumn("sim", sim_qc)
        .withColumn("rk", F.row_number().over(w_probe))
        .filter(F.col("rk") <= n_probe)
        .select("cell", "q_id", "qv", "qn")
    )

    # each corpus vector lives in exactly one inverted list and probe cells
    # are distinct, so (q_id, nn_id) pairs are already unique — no dedup.
    cand = lists.join(F.broadcast(probes), "cell").filter(F.col("nn_id") != F.col("q_id"))
    sim = _cosine(F.col("qv"), F.col("qn"), F.col("v"), F.col("n2"))
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("nn_id").asc())
    return (
        cand.withColumn("sim", sim)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "nn_id", "rank", "sim")
    )


def md5_hyperplanes(dim: int, bits: int, tables: int) -> np.ndarray:
    """±1 hyperplane tensor (tables, bits, dim) derived from md5 digests —
    the engine-portable cousin of the Gaussian planes: any engine with an
    md5() can regenerate the exact same matrix (first hex digit of
    ``md5("{t}:{b}:{i}")`` < '8' → +1, else −1), so an external oracle can
    replay the whole sketch. Sign-bit LSH only needs the plane directions
    to be uniformly random on the sphere's orthants; ±1 Rademacher planes
    give the same collision-probability law as Gaussians."""
    import hashlib

    signs = np.empty((tables, bits, dim), dtype=np.int64)
    for t in range(tables):
        for b in range(bits):
            for i in range(dim):
                h = hashlib.md5(f"{t}:{b}:{i}".encode()).hexdigest()
                signs[t, b, i] = 1 if h[0] < "8" else -1
    return signs


def md5_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    bits: int = 8,
    tables: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Hyperplane-LSH ANN with a fully deterministic, oracle-replayable
    pipeline: md5-derived ±1 planes, integer sketches over the quantized
    vectors (sign = integer dot >= 0 — no float in the bucketing path),
    exact quantized-cosine rerank within candidate buckets. Same plan shape
    as :func:`hyperplane_lsh_topk` (bucket join replaces the cross-join);
    the approximation is identical in any engine that replays the planes.
    """
    planes = md5_hyperplanes(dim, bits, tables)
    pow2 = 1 << np.arange(bits, dtype=np.int64)

    @F.pandas_udf(ArrayType(LongType()))
    def sketch(v: pd.Series) -> pd.Series:
        out = []
        for x in v:
            if x is None:  # NULL embedding → bucket 0 everywhere, like the
                out.append([0] * tables)  # Gaussian sibling — never a task kill
                continue
            xv = np.asarray(x, dtype=np.int64)
            signs = (np.einsum("tbd,d->tb", planes, xv) >= 0).astype(np.int64)
            out.append((signs @ pow2).tolist())
        return pd.Series(out)

    c = (
        corpus.select(
            F.col(id_col).alias("nn_id"), _quantized(F.col(vec_col)).alias("v")
        )
        .withColumn("n2", _dot(F.col("v"), F.col("v")))
        .select(
            "nn_id", "v", "n2", F.posexplode(sketch(F.col("v"))).alias("t", "bucket")
        )
    )
    q = (
        queries.select(
            F.col(id_col).alias("q_id"), _quantized(F.col(vec_col)).alias("qv")
        )
        .withColumn("qn", _dot(F.col("qv"), F.col("qv")))
        .select(
            "q_id", "qv", "qn", F.posexplode(sketch(F.col("qv"))).alias("t", "bucket")
        )
    )
    cand = (
        c.join(F.broadcast(q), ["t", "bucket"])
        .filter(F.col("nn_id") != F.col("q_id"))
        .dropDuplicates(["q_id", "nn_id"])
    )
    sim = _cosine(F.col("qv"), F.col("qn"), F.col("v"), F.col("n2"))
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("nn_id").asc())
    return (
        cand.withColumn("sim", sim)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "nn_id", "rank", "sim")
    )
