"""North-Carolina-domain (multi-attribute) pipeline composition.

The reference's NC flow (``NcBaseTest.java:247-283`` csimqTest, the only NC
entry runnable from the checked-in data — the 5s*/10s* benchmark graphs ship
WITHOUT ``vertices.json``, so the full 5pm/10pm gold-pair quality runs are
impossible in this checkout):

1. EPGM/Gelly JSON source (``/data/nc/csimq``), properties
   label/artist/album/number/dataSource.
2. DefaultPreprocessing (``DefaultPreprocessing.java:44-60``):
   IntraSourceLinkRemover → ``NcSimilarityFunction``
   (``simcomputation/NcSimilarityFunction.java:28-34``): per-edge trigram
   cosine over simplified label, artist, album
   (``SinglePropertySimilarity.java`` handleString +
   ``Utils.getSimilarityAndSimplifyForMetric``) plus exact postcode match
   after digit-repair (``handleNumber`` + ``replaceChars``: s→5 l→1 |→1 z→2
   o→0 q→4 g→9; equal → 1.0, unequal → sim NOT SET, i.e. null) → null-aware
   mean (``MeanAggregationFunction``) → admission ``> 0.6``
   (``BasicEdgeSimilarityComputation.java:108``) → BASIC link filter.
3. Decomposition: hash-cc over admitted edges (NC vertices are all untyped,
   so TypeGroupBy collapses to plain CC), then SimSort — which REBUILDS its
   input edges as ALL pairs inside each component
   (``SimSort.java:46-52``: EdgeComputationOnVerticesForKeySelector with the
   hash-cc key selector, strategy ALL), re-scores them with the same
   similarity + ``> 0.6`` admission, and evicts below-threshold vertices
   (``SimSortComputeFunction.java:60-73``: deactivate when the vertex's mean
   admitted-edge sim < threshold and no neighbour is lower).
4. RepresentativeCreatorMultiMerge(NC): cluster id = min member id
   (``NcMajorityPropertiesGroupReduceFunction``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from mapping_analysis_spark.io.epgm_source import read_epgm_graph
from mapping_analysis_spark.music import trigram_cosine_simmetrics
from mapping_analysis_spark.functions.text import normalize_text
from mapping_analysis_spark.operators.clustering import assign_cluster_ids
from mapping_analysis_spark.operators.decomposition import sim_sort
from mapping_analysis_spark.operators.preprocess import (
    all_edges_per_key,
    basic_link_filter,
    remove_intra_source_links,
)

NC_EDGE_ADMISSION = 0.6  # BasicEdgeSimilarityComputation.java:108, strict >

# SinglePropertySimilarity.replaceChars — NC postcode digit repair
_NUM_FROM = "sl|zoqg"
_NUM_TO = "5112049"


def _sane(col: Column) -> Column:
    # Utils.isSane (util/Utils.java:89-94): CASE-SENSITIVE comparison against
    # Constants.NO_LABEL_FOUND / NO_VALUE / CSV_NO_VALUE — identical to
    # io.csv_source._sane
    return col.isNotNull() & ~col.isin("no_label_found", "no_value", "--")


def nc_graph(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    """EPGM NC graph → (vertices, edges) with normalized attribute columns."""
    vertices, edges = read_epgm_graph(spark, path)
    v = vertices.withColumn(
        "number_fixed", F.translate(F.col("number"), _NUM_FROM, _NUM_TO)
    )
    for c in ("label", "artist", "album"):
        v = v.withColumn(f"{c}_norm", normalize_text(F.col(c)))
    return v, edges


def nc_pair_sims(vertices: DataFrame, pairs: DataFrame) -> DataFrame:
    """NcSimilarityFunction + MeanAggregationFunction over (a, b) id pairs:
    null-aware mean of trigram label/artist/album sims and the exact
    repaired-postcode match (unequal numbers contribute NOTHING, not 0).
    Returns (a, b, sim) for every input pair with at least one present sim."""
    side = vertices.select(
        "rid", "label", "artist", "album", "label_norm", "artist_norm",
        "album_norm", "number_fixed",
    )

    def pref(p: str):
        cols = [F.col(c).alias(f"{p}_{c}") for c in side.columns if c != "rid"]
        return side.select(F.col("rid").alias(p), *cols)

    j = pairs.select("a", "b").join(pref("a"), "a").join(pref("b"), "b")

    def str_sim(attr: str) -> Column:
        return F.when(
            _sane(F.col(f"a_{attr}")) & _sane(F.col(f"b_{attr}")),
            trigram_cosine_simmetrics(
                F.col(f"a_{attr}_norm"), F.col(f"b_{attr}_norm")
            ),
        )

    sims = {
        "sim_label": str_sim("label"),
        "sim_artist": str_sim("artist"),
        "sim_album": str_sim("album"),
        # equal → 1.0; unequal → null (the reference never sets it)
        "sim_number": F.when(
            F.col("a_number_fixed").isNotNull()
            & (F.col("a_number_fixed") == F.col("b_number_fixed")),
            F.lit(1.0),
        ),
    }
    scored = j
    for name, expr in sims.items():
        scored = scored.withColumn(name, expr)
    present = F.filter(
        F.array(*[F.col(c) for c in sims]), lambda x: x.isNotNull()
    )
    mean = F.when(
        F.size(present) > 0,
        F.aggregate(present, F.lit(0.0), lambda acc, x: acc + x)
        / F.size(present),
    )
    return scored.withColumn("sim", mean).filter(
        F.col("sim").isNotNull()
    ).select("a", "b", "sim")


def nc_scored_edges(vertices: DataFrame, edges: DataFrame) -> DataFrame:
    """DefaultPreprocessing for NC: intra-source removal, 4-attribute mean
    similarity with the > 0.6 admission cutoff, BASIC 1:n link filter.
    Returns (a, b, sim)."""
    # NC fixtures are dimension-sized — broadcast the vertex lookup sides
    e = remove_intra_source_links(
        edges, vertices, id_col="rid", source_col="source", broadcast_vertices=True
    )
    scored = nc_pair_sims(vertices, e).filter(
        F.col("sim") > F.lit(NC_EDGE_ADMISSION)
    )
    return basic_link_filter(
        scored, vertices, id_col="rid", source_col="source", sim_col="sim",
        broadcast_vertices=True,
    )


def nc_clusters(
    vertices: DataFrame, scored: DataFrame, simsort_threshold: float
) -> DataFrame:
    """CC over admitted edges, then SimSort on the REBUILT per-component
    all-pairs graph (re-scored, > 0.6 admission — ``SimSort.java:46-61``).
    Returns (rid, comp); evicted vertices become singletons."""
    base = assign_cluster_ids(vertices.select("rid"), scored.select("a", "b"), "rid")
    pre = base.select("rid", F.col("cluster_id").alias("comp"))
    comp_pairs = all_edges_per_key(
        vertices.join(pre, "rid"), "comp", id_col="rid"
    )
    rescored = nc_pair_sims(vertices, comp_pairs).filter(
        F.col("sim") > F.lit(NC_EDGE_ADMISSION)
    )
    return sim_sort(
        rescored.select("a", "b", "sim"),
        pre.select(F.col("rid").alias("node"), "comp"),
        threshold=simsort_threshold,
    ).select(F.col("node").alias("rid"), "comp")
