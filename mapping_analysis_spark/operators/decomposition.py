"""Decomposition operators: IDF blocking, TypeGroupBy, SimSort refinement.

Reference §2.3/§2.5 parity, re-expressed declaratively:

* ``idf_blocking`` — TF-IDF candidate blocking
  (``model/functions/blocking/tfidf/**``, 690 LoC → ~40 lines of DataFrame
  ops): pick the top-k highest-IDF tokens per record, connect records
  sharing >= ``support`` of them, connected components over that share graph
  give block ids; records without a block fall back to the caller's standard
  key (``MergeExecution.java:239-269`` unions the two).
* ``type_group_by`` — assign component-less records to the neighbor
  component with max edge sim, ties → min component
  (``decomposition/typegroupby/TypeGroupBy.java:38-121``): one ranking
  window replaces the reference's groupBy().max().join().min() chain.
* ``sim_sort`` — iterative component refinement
  (``decomposition/simsort/SimSort.java:42-66`` Pregel loop): repeatedly
  evict the weakest vertex (mean incident sim < threshold and locally
  minimal) from its component until fixpoint. Driver-loop supersteps with
  lineage cuts replace vertex-centric iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mapping_analysis_spark.operators.clustering import connected_components


def idf_blocking(
    records: DataFrame,
    tokens_col: str = "toks",
    id_col: str = "rid",
    top_k: int = 2,
    support: int = 2,
    min_df: int = 1,
    tokens_distinct: bool = False,
) -> DataFrame:
    """Returns (id_col, idf_block) for records that share >= ``support``
    high-IDF tokens with at least one other record; others are absent
    (caller unions a fallback key).

    ``tokens_distinct=True``: the caller guarantees each record's token array
    is already deduplicated (e.g. ``distinct_tokens`` output) — skips a full
    shuffle of the exploded (id, tok) table.
    """
    tok = records.select(F.col(id_col), F.explode(F.col(tokens_col)).alias("tok"))
    if not tokens_distinct:
        tok = tok.distinct()
    df_counts = tok.groupBy("tok").agg(F.count("*").alias("df")).filter(F.col("df") >= min_df)
    # idf desc ≡ document-frequency asc — rank on the integer so results are
    # engine-exact (float log() rounding differs across libm implementations)
    w = Window.partitionBy(id_col).orderBy(F.col("df").asc(), F.col("tok").asc())
    top = (
        tok.join(F.broadcast(df_counts), "tok")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= top_k)
        .select(id_col, "tok")
    )
    a = top.select(F.col(id_col).alias("a"), "tok")
    b = top.select(F.col(id_col).alias("b"), "tok")
    share = (
        a.join(b, "tok")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("shared"))
        .filter(F.col("shared") >= support)
        .select("a", "b")
    )
    comp = connected_components(share)
    return comp.select(F.col("node").alias(id_col), F.col("comp").alias("idf_block"))


def type_overlap_cc(
    vertices: DataFrame,
    id_col: str = "rid",
    comp_col: str = "comp",
    types_col: str = "types",
) -> DataFrame:
    """TypeOverlapCcCreator (``preprocessing/TypeOverlapCcCreator.java:39-48``
    + ``typegroupby/HashCcIdOverlappingFunction.java:33-61``): within each
    existing component, vertices whose type sets overlap land in one refined
    component ("Mountain -- Mountain, Island -- Island" chains collapse).

    The reference labels refined groups with a hash that varies run-to-run
    (its own NOTE admits it); here the label is the deterministic min vertex
    id — same partition of the vertex set, stable output. Implementation:
    connected components over the vertex↔(comp, type) bipartite share graph,
    expressed as vertex-vertex edges through a min-vertex-per-type-key hub
    (linear in Σ|types|, no quadratic within-type pair blowup).
    """
    keyed = vertices.select(
        F.col(id_col), F.col(comp_col).cast("string").alias("_c"), F.explode(types_col).alias("_t")
    ).select(F.col(id_col), F.concat_ws("|", F.col("_c"), F.col("_t")).alias("_tk"))
    hub = keyed.groupBy("_tk").agg(F.min(id_col).alias("_hub"))
    edges = (
        keyed.join(hub, "_tk")
        .filter(F.col(id_col) != F.col("_hub"))
        .select(F.col(id_col).alias("a"), F.col("_hub").alias("b"))
        .dropDuplicates()
    )
    comp = connected_components(edges)
    return (
        vertices.select(id_col)
        .join(comp.withColumnRenamed("node", id_col), id_col, "left")
        .withColumn("type_cc", F.coalesce(F.col("comp"), F.col(id_col)))
        .drop("comp")
    )


def type_group_by(
    vertices: DataFrame,
    scored_edges: DataFrame,
    id_col: str = "rid",
    comp_col: str = "comp",
    sim_col: str = "sim",
) -> DataFrame:
    """Vertices with a NULL component adopt the neighbor component with the
    highest edge sim (ties → min component id). Returns vertices with
    ``comp`` filled where a scored neighbor exists.

    Untyped-only groups (``TypeGroupBy.java:47-74``,
    ``TypeGroupByTest.java`` "all no_type -> same hash"): a connected group
    of vertices that are ALL component-less — none has a typed neighbor to
    adopt from — still collapses to ONE shared component. The reference
    labels it with a run-varying hash (its test only asserts the members
    agree); here the label is the deterministic min member id. Isolated
    component-less vertices keep NULL (no group to join)."""
    sym = scored_edges.select(
        F.col("a").alias(id_col), F.col("b").alias("nbr"), F.col(sim_col)
    ).union(
        scored_edges.select(F.col("b").alias(id_col), F.col("a").alias("nbr"), F.col(sim_col))
    )
    nbr_comp = sym.join(
        vertices.select(F.col(id_col).alias("nbr"), F.col(comp_col).alias("nbr_comp")),
        "nbr",
    ).filter(F.col("nbr_comp").isNotNull())
    w = Window.partitionBy(id_col).orderBy(F.col(sim_col).desc(), F.col("nbr_comp").asc())
    best = (
        nbr_comp.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(id_col, F.col("nbr_comp").alias("_adopt"))
    )
    out = (
        vertices.join(best, id_col, "left")
        .withColumn(comp_col, F.coalesce(F.col(comp_col), F.col("_adopt")))
        .drop("_adopt")
    )
    # all-untyped groups: components over edges whose BOTH endpoints are
    # still component-less after adoption
    nullv = out.filter(F.col(comp_col).isNull()).select(id_col)
    e_nn = (
        scored_edges.select("a", "b")
        .join(nullv.withColumnRenamed(id_col, "a"), "a", "left_semi")
        .join(nullv.withColumnRenamed(id_col, "b"), "b", "left_semi")
    )
    grp = connected_components(e_nn).withColumnRenamed("node", id_col).withColumnRenamed(
        "comp", "_g"
    )
    return (
        out.join(grp, id_col, "left")
        .withColumn(comp_col, F.coalesce(F.col(comp_col), F.col("_g")))
        .drop("_g")
    )


def sim_sort(
    scored_edges: DataFrame,
    components: DataFrame,
    threshold: float = 0.5,
    id_col: str = "node",
    comp_col: str = "comp",
    sim_col: str = "sim",
    max_iter: int = 10,
) -> DataFrame:
    """Evict weak vertices from components until all remaining members have a
    mean intra-component edge sim >= threshold. Evicted vertices become
    singletons, mirroring SimSort's deactivation hash
    (``SimSortComputeFunction.java:26-109``, ``hash(id + "false")`` — a value
    DISTINCT from every live component hash); per superstep only the locally
    weakest vertex per component is evicted, like the reference's "no
    neighbor is lower" rule.

    Output: (id_col, comp_col, evicted). Survivor components are relabeled
    to their min *surviving* member id and evicted vertices carry their own
    id — the two label sets are disjoint (a vertex is either evicted or
    surviving), so grouping by comp can never merge an evicted vertex back
    into the component that evicted it (the reference's distinct-hash
    property; a plain comp := id relabel collides when the evicted vertex IS
    the component's min member, silently re-merging — pinned by
    ``tests/test_nc_csimq.py::test_nc_csimq_simsort_evicts_at_070``)."""
    comp = components.withColumn("_ev", F.lit(False)).localCheckpoint(eager=True)
    for _ in range(max_iter):
        live = comp.filter(~F.col("_ev"))
        e = (
            scored_edges.join(
                live.select(F.col(id_col).alias("a"), F.col(comp_col).alias("_ca")), "a"
            )
            .join(live.select(F.col(id_col).alias("b"), F.col(comp_col).alias("_cb")), "b")
            .filter(F.col("_ca") == F.col("_cb"))
        )
        per_vertex = (
            e.select(F.col("a").alias(id_col), F.col("_ca").alias(comp_col), F.col(sim_col))
            .union(e.select(F.col("b").alias(id_col), F.col("_cb").alias(comp_col), F.col(sim_col)))
            .groupBy(id_col, comp_col)
            .agg(F.avg(sim_col).alias("_agg"))
        )
        w = Window.partitionBy(comp_col).orderBy(F.col("_agg").asc(), F.col(id_col).asc())
        evict = (
            per_vertex.filter(F.col("_agg") < threshold)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(id_col)
        )
        n_evict = evict.count()
        if n_evict == 0:
            break
        comp = (
            comp.join(evict.withColumn("_e", F.lit(1)), id_col, "left")
            .withColumn("_ev", F.col("_ev") | F.col("_e").isNotNull())
            .drop("_e")
            .localCheckpoint(eager=True)
        )
    surv = (
        comp.filter(~F.col("_ev"))
        .groupBy(comp_col)
        .agg(F.min(id_col).alias("_newc"))
    )
    return (
        comp.join(surv, comp_col, "left")
        .withColumn(
            comp_col,
            F.when(F.col("_ev"), F.col(id_col)).otherwise(F.col("_newc")),
        )
        .select(id_col, comp_col, F.col("_ev").alias("evicted"))
    )
