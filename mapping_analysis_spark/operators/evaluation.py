"""Cluster-quality evaluation: pair-level precision / recall / F1.

The reference's correctness oracle (``util/QualityUtils.java:385-403``):
predicted clusters are exploded to member pairs (``QualityEdgeCreator``),
joined against gold pairs; precision = TP/|pred|, recall = TP/|gold|, F1
harmonic. Expressed as three joins + one aggregate — fully declarative, so
it runs as a distributed job over billions of pairs at full scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cluster_pairs(assign: DataFrame, group_col: str, member_col: str) -> DataFrame:
    """Explode groups into canonical member pairs (a < b)."""
    a = assign.select(F.col(group_col).alias("_g"), F.col(member_col).alias("a"))
    b = assign.select(F.col(group_col).alias("_g"), F.col(member_col).alias("b"))
    return a.join(b, "_g").filter(F.col("a") < F.col("b")).select("a", "b").distinct()


def pair_quality(
    predicted: DataFrame,
    gold: DataFrame,
    pred_group: str = "cluster_id",
    gold_group: str = "entity_id",
    member_col: str = "conv_id",
) -> DataFrame:
    """One-row DataFrame: tp, n_pred, n_gold, precision/recall/f1 (exact
    integer-millionths so the result is engine-deterministic)."""
    pp = cluster_pairs(predicted, pred_group, member_col)
    gp = cluster_pairs(gold, gold_group, member_col)
    # ONE action: a full-outer join tags each pair with membership and a
    # single aggregate reads off tp / n_pred / n_gold — the previous three
    # separate counts re-executed the pair self-joins twice each
    tagged = pp.withColumn("_p", F.lit(1)).join(
        gp.withColumn("_g", F.lit(1)), ["a", "b"], "full_outer"
    )
    stats = tagged.agg(
        F.count("_p").alias("n_pred"),
        F.count("_g").alias("n_gold"),
        F.count(F.when(F.col("_p").isNotNull() & F.col("_g").isNotNull(), 1)).alias(
            "tp"
        ),
    ).collect()[0]
    tp, n_pred, n_gold = int(stats["tp"]), int(stats["n_pred"]), int(stats["n_gold"])
    precision = tp / n_pred if n_pred else 0.0
    recall = tp / n_gold if n_gold else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    spark = predicted.sparkSession
    row = [
        (
            tp,
            n_pred,
            n_gold,
            int(precision * 1_000_000 + 0.5),
            int(recall * 1_000_000 + 0.5),
            int(f1 * 1_000_000 + 0.5),
        )
    ]
    return spark.createDataFrame(
        row, "tp bigint, n_pred bigint, n_gold bigint, precision_e6 bigint, recall_e6 bigint, f1_e6 bigint"
    )
