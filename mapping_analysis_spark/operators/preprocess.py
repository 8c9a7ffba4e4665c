"""Graph preprocessing operators (reference §2.2) — all pure Catalyst.

Edges frames use columns ``(a, b)`` (+ extras); vertex frames carry ``rid``
(+ ``source`` etc.). Every function is a thin declarative mapping of one
reference operator, cited per docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType


def remove_intra_source_links(
    edges: DataFrame, vertices: DataFrame, id_col: str = "rid", source_col: str = "source",
    broadcast_vertices: bool = False,
) -> DataFrame:
    """Drop edges whose endpoints share a data source + dedup
    (``model/functions/preprocessing/IntraSourceLinkRemover.java:43-57``).

    ``broadcast_vertices=True`` (caller knows the vertex table is
    dimension-sized, e.g. a checkpointed fixture): the two (id, source)
    lookup sides are broadcast, removing two shuffle exchanges."""
    va = vertices.select(F.col(id_col).alias("a"), F.col(source_col).alias("_sa"))
    vb = vertices.select(F.col(id_col).alias("b"), F.col(source_col).alias("_sb"))
    if broadcast_vertices:
        va, vb = F.broadcast(va), F.broadcast(vb)
    return (
        edges.join(va, "a")
        .join(vb, "b")
        .filter(F.col("_sa") != F.col("_sb"))
        .drop("_sa", "_sb")
        .dropDuplicates(["a", "b"])
    )


def remove_isolated_vertices(vertices: DataFrame, edges: DataFrame, id_col: str = "rid") -> DataFrame:
    """Keep only vertices that appear as an edge endpoint
    (``IsolatedVertexRemover.java:32-49``) — two left-semi joins."""
    endpoints = edges.select(F.col("a").alias(id_col)).union(
        edges.select(F.col("b").alias(id_col))
    ).distinct()
    return vertices.join(endpoints, id_col, "left_semi")


def remove_isolated_edges(edges: DataFrame, vertices: DataFrame, id_col: str = "rid") -> DataFrame:
    """Dual: drop edges with a missing endpoint (``IsolatedEdgeRemover.java``)."""
    ids = vertices.select(F.col(id_col))
    return edges.join(
        ids.withColumnRenamed(id_col, "a"), "a", "left_semi"
    ).join(ids.withColumnRenamed(id_col, "b"), "b", "left_semi")


def min_threshold_filter(pairs: DataFrame, threshold: float, sim_col: str = "sim") -> DataFrame:
    """``MinThresholdFilterFunction`` (applied at
    ``SimilarityComputation.java:46-49``)."""
    return pairs.filter(F.col(sim_col) >= F.lit(threshold))


def source_count_restriction(
    clusters: DataFrame, max_sources: int, mask_col: str = "smask"
) -> DataFrame:
    """Cluster participates in merge only while |sources| < n
    (``SourceCountRestrictionFilter.java:29-39``) — bit_count on the mask."""
    return clusters.filter(F.bit_count(F.col(mask_col)) < max_sources)


def check_merge_restrictions(
    pairs: DataFrame, max_sources: int, a_mask: str = "a_smask", b_mask: str = "b_smask"
) -> DataFrame:
    """Pair mergeable iff no source overlap and combined count <= n
    (``CheckRestrictionsFilterFunction.java:48-52``)."""
    ma, mb = F.col(a_mask), F.col(b_mask)
    return pairs.filter(
        (ma.bitwiseAND(mb) == 0) & (F.bit_count(ma.bitwiseOR(mb)) <= max_sources)
    )


def basic_link_filter(
    scored_edges: DataFrame,
    vertices: DataFrame,
    id_col: str = "rid",
    source_col: str = "source",
    sim_col: str = "sim",
    broadcast_vertices: bool = False,
) -> DataFrame:
    """1:n link removal (``BasicLinkFilterFunction.java:46-79``): per vertex,
    per *neighbor source*, keep only the best link (sim DESC, then asc ids) —
    each entity links to at most one entity per other data source.

    Window ranking replaces the reference's groupReduceOnNeighbors+sortGroup.
    ``broadcast_vertices``: see ``remove_intra_source_links``.
    """
    src = vertices.select(F.col(id_col), F.col(source_col))
    sa = src.select(F.col(id_col).alias("a"), F.col(source_col).alias("_sa"))
    sb = src.select(F.col(id_col).alias("b"), F.col(source_col).alias("_sb"))
    if broadcast_vertices:
        sa, sb = F.broadcast(sa), F.broadcast(sb)
    e = scored_edges.join(sa, "a").join(sb, "b")
    # rank from each endpoint's perspective against the partner's source
    wa = Window.partitionBy("a", "_sb").orderBy(F.col(sim_col).desc(), F.col("a").asc(), F.col("b").asc())
    wb = Window.partitionBy("b", "_sa").orderBy(F.col(sim_col).desc(), F.col("a").asc(), F.col("b").asc())
    return (
        e.withColumn("_ra", F.row_number().over(wa))
        .withColumn("_rb", F.row_number().over(wb))
        .filter((F.col("_ra") == 1) & (F.col("_rb") == 1))
        .drop("_ra", "_rb", "_sa", "_sb")
    )


def clustering_link_filter(
    assignments: DataFrame,
    scored_edges: DataFrame,
    id_col: str = "rid",
    comp_col: str = "comp",
    source_col: str = "source",
    sim_col: str = "sim",
) -> DataFrame:
    """Post-CC 1:n re-elimination (``ClusteringLinkFilterFunction.java:30-60``
    + ``FinalOneToManyRemovalFunction``): after the transitive closure a
    component can again hold several vertices of ONE source; only the best
    candidate — max aggregated incident similarity inside the component,
    ties → min id — stays, the rest become singletons.

    Pass integer-quantized sims (e.g. millionths) when engine-exact ranking
    matters: float sums are order-dependent across engines.
    Returns (id_col, comp_col) with evicted vertices re-labeled to their own
    id.
    """
    v = assignments.select(id_col, comp_col, source_col)
    ea = scored_edges.select(F.col("a").alias(id_col), F.col("b").alias("_nbr"), F.col(sim_col))
    eb = scored_edges.select(F.col("b").alias(id_col), F.col("a").alias("_nbr"), F.col(sim_col))
    sym = ea.union(eb)
    # only intra-component similarity counts toward the candidate ranking
    comp_of = v.select(F.col(id_col).alias("_nbr"), F.col(comp_col).alias("_nc"))
    agg = (
        sym.join(v.select(id_col, comp_col), id_col)
        .join(comp_of, "_nbr")
        .filter(F.col(comp_col) == F.col("_nc"))
        .groupBy(id_col)
        .agg(F.sum(sim_col).alias("_agg"))
    )
    ranked = v.join(agg, id_col, "left").withColumn(
        "_agg", F.coalesce(F.col("_agg"), F.lit(0.0))
    )
    w = Window.partitionBy(comp_col, source_col).orderBy(
        F.col("_agg").desc(), F.col(id_col).asc()
    )
    return (
        ranked.withColumn("_rn", F.row_number().over(w))
        .withColumn(
            comp_col,
            F.when(F.col("_rn") == 1, F.col(comp_col)).otherwise(F.col(id_col)),
        )
        .select(id_col, comp_col)
    )


def merge_initialization(
    pre_split: DataFrame,
    post_split: DataFrame,
    scored_edges: DataFrame,
    id_col: str = "rid",
    comp_col: str = "comp",
    sim_col: str = "sim",
    threshold: float = 0.5,
) -> DataFrame:
    """MergeInitialization's singleton rejoin (``merge/MergeInitialization.
    java:49-113`` rejoinSingleVertexClustersFromSimSort): SimSort evicts
    weak vertices to singletons; before merging, a singleton whose best
    scored edge back into its OLD component clears the threshold rejoins it
    (reducing merge-step complexity). Returns refreshed (id_col, comp_col).
    """
    pre = pre_split.select(F.col(id_col), F.col(comp_col).alias("_old"))
    has_ev = "evicted" in post_split.columns
    post = post_split.select(id_col, comp_col)
    if has_ev:
        # sim_sort marks evictions explicitly (collision-free labels)
        both = post_split.select(id_col, comp_col, "evicted").join(pre, id_col)
        singles = both.filter(F.col("evicted")).select(id_col, "_old")
        survivors = both.filter(~F.col("evicted"))
    else:
        both = post.join(pre, id_col)
        singles = both.filter(
            (F.col(comp_col) == F.col(id_col)) & (F.col("_old") != F.col(id_col))
        ).select(id_col, "_old")
        survivors = both.filter(F.col(comp_col) != F.col(id_col))
    sym = scored_edges.select(
        F.col("a").alias(id_col), F.col("b").alias("_nbr"), F.col(sim_col)
    ).union(
        scored_edges.select(F.col("b").alias(id_col), F.col("a").alias("_nbr"), F.col(sim_col))
    )
    # best edge from the singleton back into its old component; the rejoin
    # target is the surviving members' CURRENT comp label (sim_sort may have
    # relabeled the component to its min surviving member)
    old_members = survivors.select(
        F.col(id_col).alias("_nbr"),
        F.col("_old").alias("_nbr_old"),
        F.col(comp_col).alias("_nbr_new"),
    )
    rejoin = (
        singles.join(sym, id_col)
        .join(old_members, "_nbr")
        .filter((F.col("_old") == F.col("_nbr_old")) & (F.col(sim_col) >= threshold))
        .groupBy(id_col)
        .agg(F.min("_nbr_new").alias("_rejoin"))
    )
    return (
        post.join(rejoin, id_col, "left")
        .withColumn(comp_col, F.coalesce(F.col("_rejoin"), F.col(comp_col)))
        .select(id_col, comp_col)
    )


# ---------------------------------------------------------------------------
# Edge generation + corruption (reference §2.1)
# ---------------------------------------------------------------------------

def all_edges_per_key(vertices: DataFrame, key_col: str, id_col: str = "rid") -> DataFrame:
    """ALL strategy: every distinct intra-block pair
    (``graph/utils/.../AllEdgesCreator``)."""
    a = vertices.select(F.col(key_col).alias("_k"), F.col(id_col).alias("a"))
    b = vertices.select(F.col(key_col).alias("_k"), F.col(id_col).alias("b"))
    return a.join(b, "_k").filter(F.col("a") < F.col("b")).select("a", "b").distinct()


def simple_edges_per_key(vertices: DataFrame, key_col: str, id_col: str = "rid") -> DataFrame:
    """SIMPLE strategy: spanning star from min-id per key
    (``SimpleEdgesCreator``)."""
    m = vertices.groupBy(key_col).agg(F.min(id_col).alias("a"))
    return (
        vertices.select(F.col(key_col), F.col(id_col).alias("b"))
        .join(m, key_col)
        .filter(F.col("a") != F.col("b"))
        .select("a", "b")
    )


def remove_every_nth_edge(edges: DataFrame, n: int) -> DataFrame:
    """Robustness corruption: deterministically drop every n-th edge
    (``corruption/EdgeRemoveCorruptionFunction.java:19-31``). Uses a stable
    hash instead of physical row position so results are partition-layout
    independent (the reference's zipWithIndex is not)."""
    return edges.filter(F.pmod(F.xxhash64("a", "b"), F.lit(n)) != 0)


def fabricate_edges(vertices: DataFrame, n: int, id_col: str = "rid", seed: int = 42) -> DataFrame:
    """Corruption twin: fabricate n pseudo-random (but seeded-deterministic)
    edges between existing vertices (``EdgeCreateCorruptionFunction``).

    Vertex selection is a distributed hash-ordered top-k
    (TakeOrderedAndProject — per-partition top-k then a 2n-row driver merge),
    NOT a global row_number window: an unpartitioned window is a single-task
    total sort, quadratic death at 10^12 vertices."""
    id_type = vertices.schema[id_col].dataType
    schema = StructType([StructField("a", id_type), StructField("b", id_type)])
    picked = [
        r[0]
        for r in vertices.select(F.col(id_col).alias("v"))
        .orderBy(F.xxhash64("v", F.lit(seed)), "v")
        .limit(2 * n)
        .collect()
    ]
    if len(picked) < 2:
        return vertices.sparkSession.createDataFrame([], schema)
    # walk pair offsets until n distinct (a != b) edges are collected (or the
    # pool is exhausted) — the naive 2i/2i+1 pairing can silently under-fill
    # after the self-pair filter + dedup when the vertex pool is small
    pairs: list = []
    seen: set = set()
    i = 0
    max_pairs = len(picked) * (len(picked) - 1) // 2
    budget = 4 * n + len(picked) * len(picked)
    while len(pairs) < min(n, max_pairs) and i < budget:
        a = picked[(2 * i) % len(picked)]
        b = picked[(2 * i + 1 + i // len(picked)) % len(picked)]
        i += 1
        key = (a, b) if a <= b else (b, a)
        if a == b or key in seen:
            continue
        seen.add(key)
        pairs.append((a, b))
    return vertices.sparkSession.createDataFrame(pairs, schema)


def representative_edges(
    representatives: DataFrame, members_col: str = "members", id_col: str = "rid"
) -> DataFrame:
    """REPRESENTATIVE strategy (``graph/utils/RepresentativeEdgesCreator.
    java:28-49``): each representative vertex carries the member-id list of
    the cluster it stands for; emit every distinct (min, max) pair within
    that list. Explode + within-representative self-join — pairs stay local
    to one representative's row group."""
    m = representatives.select(
        F.col(id_col).alias("_r"),
        F.explode(F.array_distinct(F.col(members_col))).alias("_m"),
    )
    a = m.select("_r", F.col("_m").alias("a"))
    b = m.select("_r", F.col("_m").alias("b"))
    return (
        a.join(b, "_r")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .dropDuplicates()
    )
