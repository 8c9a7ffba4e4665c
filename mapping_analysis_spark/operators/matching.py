"""Match selection over scored candidate pairs.

* ``max_both`` — the reference's MAX_BOTH mutual-best-match selection
  (``model/functions/clusterstrategies/MaxBothSelection.java:27-82``): keep a
  pair iff it is the best (max sim, ties → min partner id) for *both*
  endpoints. Two ranking windows + an inner join — no custom shuffle.
* ``hungarian_matches`` — per-block optimal assignment
  (``model/functions/incremental/HungarianAlgorithmReduceFunction.java:27-181``
  wrapping the classic O(n³) ``util/HungarianAlgorithm.java``): here a pure
  numpy Hungarian inside ``applyInPandas`` (scipy is not assumed present).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType, StructField, StructType


def max_both(
    pairs: DataFrame, a_col: str = "a_rid", b_col: str = "b_rid", sim_col: str = "sim"
) -> DataFrame:
    """Mutual best match: pair kept iff rank-1 from the a-side AND the b-side."""
    wa = Window.partitionBy(a_col).orderBy(F.col(sim_col).desc(), F.col(b_col).asc())
    wb = Window.partitionBy(b_col).orderBy(F.col(sim_col).desc(), F.col(a_col).asc())
    return (
        pairs.withColumn("_ra", F.row_number().over(wa))
        .withColumn("_rb", F.row_number().over(wb))
        .filter((F.col("_ra") == 1) & (F.col("_rb") == 1))
        .drop("_ra", "_rb")
    )


def _hungarian(cost: np.ndarray) -> list[tuple[int, int]]:
    """O(n³) Hungarian algorithm (Jonker-style potentials), pure numpy.

    Standard public-domain formulation (rectangular: rows <= cols assumed by
    caller padding). Returns list of (row, col) assignments.
    """
    n, m = cost.shape
    assert n <= m
    INF = float("inf")
    u = np.zeros(n + 1)
    v = np.zeros(m + 1)
    p = np.zeros(m + 1, dtype=int)  # p[j] = row matched to col j (1-based rows)
    way = np.zeros(m + 1, dtype=int)
    for i in range(1, n + 1):
        p[0] = i
        j0 = 0
        minv = np.full(m + 1, INF)
        used = np.zeros(m + 1, dtype=bool)
        while True:
            used[j0] = True
            i0 = p[j0]
            delta = INF
            j1 = -1
            for j in range(1, m + 1):
                if used[j]:
                    continue
                cur = cost[i0 - 1, j - 1] - u[i0] - v[j]
                if cur < minv[j]:
                    minv[j] = cur
                    way[j] = j0
                if minv[j] < delta:
                    delta = minv[j]
                    j1 = j
            for j in range(m + 1):
                if used[j]:
                    u[p[j]] += delta
                    v[j] -= delta
                else:
                    minv[j] -= delta
            j0 = j1
            if p[j0] == 0:
                break
        while j0 != 0:
            j1 = way[j0]
            p[j0] = p[j1]
            j0 = j1
    return [(int(p[j]) - 1, j - 1) for j in range(1, m + 1) if p[j] != 0]


def hungarian_matches(
    pairs: DataFrame,
    block_col: str = "block",
    a_col: str = "a_rid",
    b_col: str = "b_rid",
    sim_col: str = "sim",
) -> DataFrame:
    """Per-block optimal 1:1 assignment maximizing total sim (cost = 1 - sim).

    Missing (a, b) combinations get cost 1 + eps so the assignment never
    prefers an unscored pair over a scored one; assignments whose pair was
    unscored are dropped from the output (the reference emits those as
    unmatched self-triplets instead).
    """
    out_schema = StructType(
        [
            StructField(block_col, StringType()),
            StructField(a_col, StringType()),
            StructField(b_col, StringType()),
            StructField(sim_col, DoubleType()),
        ]
    )

    def assign(key, pdf: pd.DataFrame) -> pd.DataFrame:
        a_ids = sorted(pdf[a_col].unique())
        b_ids = sorted(pdf[b_col].unique())
        transposed = len(a_ids) > len(b_ids)
        rows, cols = (b_ids, a_ids) if transposed else (a_ids, b_ids)
        ri = {x: i for i, x in enumerate(rows)}
        ci = {x: i for i, x in enumerate(cols)}
        cost = np.full((len(rows), len(cols)), 1.0 + 1e-9)
        simlut = {}
        for r in pdf.itertuples(index=False):
            a, b, s = getattr(r, a_col), getattr(r, b_col), getattr(r, sim_col)
            i, j = (ri[b], ci[a]) if transposed else (ri[a], ci[b])
            cost[i, j] = 1.0 - s
            simlut[(i, j)] = s
        matches = _hungarian(cost)
        recs = []
        for i, j in matches:
            if (i, j) not in simlut:
                continue  # padded cell — unmatched
            a, b = (cols[j], rows[i]) if transposed else (rows[i], cols[j])
            recs.append((key[0], a, b, simlut[(i, j)]))
        return pd.DataFrame(recs, columns=[block_col, a_col, b_col, sim_col])

    return pairs.select(block_col, a_col, b_col, sim_col).groupBy(block_col).applyInPandas(
        assign, out_schema
    )
