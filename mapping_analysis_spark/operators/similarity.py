"""Pair similarity scoring + thresholding.

Reference: ``model/functions/simcomputation/SimilarityComputation.java:41-59``
(map sim fn over triplets, then ``MinThresholdFilterFunction`` — keep pairs
with sim >= threshold) and ``MeanAggregationFunction.java:26-49`` (mean over
whichever per-attribute sims are present).

All scoring stays declarative: set-based sims (token Jaccard) are native
Catalyst expressions; trigram cosine is the one Arrow-batched pandas UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mapping_analysis_spark.functions.simfns import trigram_cosine
from mapping_analysis_spark.functions.text import token_set_jaccard


def score_pairs(
    pairs: DataFrame,
    exprs: dict[str, Column],
    threshold: float | None = None,
    agg_col: str = "sim",
) -> DataFrame:
    """Attach per-attribute sims + their null-aware mean, optionally filter.

    ``exprs`` maps sim-column name → Column expression over ``a_*``/``b_*``
    columns. The aggregate is the arithmetic mean over the *present* (non-
    null) sims, the reference's MeanAggregationFunction semantics.
    """
    out = pairs
    for name, expr in exprs.items():
        out = out.withColumn(name, expr)
    sim_cols = list(exprs.keys())
    arr = F.array(*[F.col(c) for c in sim_cols])
    present = F.filter(arr, lambda x: x.isNotNull())
    mean = F.when(F.size(present) == 0, F.lit(None).cast("double")).otherwise(
        F.aggregate(present, F.lit(0.0), lambda acc, x: acc + x) / F.size(present)
    )
    out = out.withColumn(agg_col, mean)
    if threshold is not None:
        out = out.filter(F.col(agg_col) >= F.lit(threshold))
    return out


def jaccard_sim(a_tokens: str, b_tokens: str) -> Column:
    return token_set_jaccard(F.col(a_tokens), F.col(b_tokens))


def trigram_cosine_sim(a_norm: str, b_norm: str) -> Column:
    return trigram_cosine(F.col(a_norm), F.col(b_norm))
