"""Tests for preprocessing / decomposition operators (reference §2.2, §2.5)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapping_analysis_spark.operators.decomposition import (
    idf_blocking,
    sim_sort,
    type_group_by,
)
from mapping_analysis_spark.operators.preprocess import (
    all_edges_per_key,
    basic_link_filter,
    check_merge_restrictions,
    fabricate_edges,
    min_threshold_filter,
    remove_every_nth_edge,
    remove_intra_source_links,
    remove_isolated_edges,
    remove_isolated_vertices,
    simple_edges_per_key,
    source_count_restriction,
)


@pytest.fixture(scope="module")
def graph(spark):
    vertices = spark.createDataFrame(
        [("v1", 1), ("v2", 2), ("v3", 1), ("v4", 3), ("v5", 2)], ["rid", "source"]
    )
    edges = spark.createDataFrame(
        [("v1", "v2"), ("v1", "v3"), ("v2", "v5"), ("v1", "v4"), ("v1", "v2")],
        ["a", "b"],
    )
    return vertices, edges


def test_remove_intra_source_links(spark, graph):
    v, e = graph
    got = {(r["a"], r["b"]) for r in remove_intra_source_links(e, v).collect()}
    # v1-v3 same source (1), v2-v5 same source (2), dup v1-v2 deduped
    assert got == {("v1", "v2"), ("v1", "v4")}


def test_remove_isolated_vertices(spark, graph):
    v, _ = graph
    e = spark.createDataFrame([("v1", "v2")], ["a", "b"])
    got = {r["rid"] for r in remove_isolated_vertices(v, e).collect()}
    assert got == {"v1", "v2"}


def test_remove_isolated_edges(spark, graph):
    v, _ = graph
    e = spark.createDataFrame([("v1", "v2"), ("v1", "zz"), ("q", "p")], ["a", "b"])
    got = {(r["a"], r["b"]) for r in remove_isolated_edges(e, v).collect()}
    assert got == {("v1", "v2")}


def test_threshold_and_restrictions(spark):
    pairs = spark.createDataFrame(
        [("p", 0.9, 1, 2), ("q", 0.4, 1, 2), ("r", 0.9, 3, 1), ("s", 0.9, 1, 14)],
        ["id", "sim", "a_smask", "b_smask"],
    )
    assert {r["id"] for r in min_threshold_filter(pairs, 0.5).collect()} == {"p", "r", "s"}
    got = {r["id"] for r in check_merge_restrictions(pairs, max_sources=3).collect()}
    # p: masks 1|2 → 2 sources ok; r: 3&1 overlap → out; s: 1|14 → 4 sources > 3 → out
    assert got == {"p", "q"}
    clusters = spark.createDataFrame([("c1", 3), ("c2", 31)], ["rid", "smask"])
    assert {r["rid"] for r in source_count_restriction(clusters, 5).collect()} == {"c1"}


def test_basic_link_filter_one_per_source(spark):
    vertices = spark.createDataFrame(
        [("v1", 1), ("x1", 2), ("x2", 2), ("y1", 3)], ["rid", "source"]
    )
    edges = spark.createDataFrame(
        [("v1", "x1", 0.9), ("v1", "x2", 0.8), ("v1", "y1", 0.7)], ["a", "b", "sim"]
    )
    got = {(r["a"], r["b"]) for r in basic_link_filter(edges, vertices).collect()}
    # v1 may keep only its best link into source 2 (x1), plus y1 (source 3)
    assert got == {("v1", "x1"), ("v1", "y1")}


def test_edge_generators(spark):
    v = spark.createDataFrame(
        [("a", "k1"), ("b", "k1"), ("c", "k1"), ("d", "k2")], ["rid", "key"]
    )
    allp = {(r["a"], r["b"]) for r in all_edges_per_key(v, "key").collect()}
    assert allp == {("a", "b"), ("a", "c"), ("b", "c")}
    star = {(r["a"], r["b"]) for r in simple_edges_per_key(v, "key").collect()}
    assert star == {("a", "b"), ("a", "c")}


def test_corruption_ops(spark):
    e = spark.createDataFrame([(f"n{i}", f"m{i}") for i in range(100)], ["a", "b"])
    kept = remove_every_nth_edge(e, 10)
    n = kept.count()
    assert 80 <= n < 100  # ~1/10 dropped, deterministic
    assert kept.count() == n  # stable across evaluations
    v = spark.createDataFrame([(f"n{i}",) for i in range(20)], ["rid"])
    fab = fabricate_edges(v, 5)
    assert 0 < fab.count() <= 5


def test_idf_blocking_groups_by_rare_tokens(spark):
    rows = [
        ("d1", ["common", "alpha", "beta"]),
        ("d2", ["common", "alpha", "beta"]),
        ("d3", ["common", "gamma", "delta"]),
        ("d4", ["common", "gamma", "delta"]),
        ("d5", ["common", "zeta", "eta"]),
    ]
    df = spark.createDataFrame(rows, ["rid", "toks"])
    got = {r["rid"]: r["idf_block"] for r in idf_blocking(df).collect()}
    assert got.get("d1") == got.get("d2")
    assert got.get("d3") == got.get("d4")
    assert got.get("d1") != got.get("d3")
    assert "d5" not in got  # no partner sharing 2 rare tokens → fallback path


def test_type_group_by_adopts_best_neighbor(spark):
    vertices = spark.createDataFrame(
        [("u", None), ("a", "cA"), ("b", "cB")], ["rid", "comp"]
    )
    edges = spark.createDataFrame(
        [("u", "a", 0.9), ("u", "b", 0.9)], ["a", "b", "sim"]
    )
    got = {r["rid"]: r["comp"] for r in type_group_by(vertices, edges).collect()}
    assert got["u"] == "cA"  # tie on sim → min component id


def test_sim_sort_evicts_weak_vertex(spark):
    comps = spark.createDataFrame(
        [("a", "c"), ("b", "c"), ("w", "c")], ["node", "comp"]
    )
    edges = spark.createDataFrame(
        [("a", "b", 0.9), ("a", "w", 0.2), ("b", "w", 0.3)], ["a", "b", "sim"]
    )
    rows = sim_sort(edges, comps, threshold=0.5).collect()
    got = {r["node"]: r["comp"] for r in rows}
    # weak vertex split out; survivors relabeled to min surviving member
    assert got == {"a": "a", "b": "a", "w": "w"}
    assert {r["node"]: r["evicted"] for r in rows} == {
        "a": False, "b": False, "w": True
    }


def test_representative_edges(spark):
    """REPRESENTATIVE strategy: all distinct (min,max) member pairs."""
    from mapping_analysis_spark.operators.preprocess import representative_edges

    reps = spark.createDataFrame(
        [("r1", ["x", "y", "z"]), ("r2", ["p", "q"]), ("r3", ["solo"]),
         ("r4", ["y", "x"])],  # overlapping members across representatives dedup
        ["rid", "members"],
    )
    got = {(r["a"], r["b"]) for r in representative_edges(reps).collect()}
    assert got == {("x", "y"), ("x", "z"), ("y", "z"), ("p", "q")}


def test_clustering_link_filter(spark):
    """Post-CC 1:n: best aggregated-sim candidate per (comp, source) stays,
    rest become singletons."""
    from mapping_analysis_spark.operators.preprocess import clustering_link_filter

    # comp c: a1,a2 from source 1 (1:n!), b1 from source 2
    assigns = spark.createDataFrame(
        [("a1", "c", 1), ("a2", "c", 1), ("b1", "c", 2), ("d1", "d", 1)],
        ["rid", "comp", "source"],
    )
    edges = spark.createDataFrame(
        [("a1", "b1", 900000.0), ("a2", "b1", 800000.0)], ["a", "b", "sim"]
    )
    got = {r["rid"]: r["comp"] for r in clustering_link_filter(assigns, edges).collect()}
    assert got == {"a1": "c", "a2": "a2", "b1": "c", "d1": "d"}


def test_merge_initialization_rejoin(spark):
    """SimSort-evicted singleton rejoins its old component when a scored
    edge back into it clears the threshold."""
    from mapping_analysis_spark.operators.preprocess import merge_initialization

    pre = spark.createDataFrame(
        [("a", "c"), ("b", "c"), ("e", "c"), ("x", "x")], ["rid", "comp"]
    )
    post = spark.createDataFrame(  # e was evicted to a singleton
        [("a", "c"), ("b", "c"), ("e", "e"), ("x", "x")], ["rid", "comp"]
    )
    edges = spark.createDataFrame([("e", "a", 0.7), ("e", "x", 0.9)], ["a", "b", "sim"])
    got = {r["rid"]: r["comp"] for r in merge_initialization(pre, post, edges).collect()}
    assert got == {"a": "c", "b": "c", "e": "c", "x": "x"}


def test_music_csv_source(spark, tmp_path):
    """CSVDataSource: MusicBrainz columns + the reference's length/year/
    language cleaning grammar (MusicUtils.java)."""
    from mapping_analysis_spark.io.csv_source import read_music_csv

    p = str(tmp_path / "music.csv")
    with open(p, "w") as f:
        f.write("TID,CID,CTID,SourceID,id,number,title,length,artist,album,year,language\n")
        f.write('1,10,1,1,x1,7,Title A,4m32sec,Artist A,Album A,\'11,English\n')
        f.write('2,10,2,2,x2,7,Title B,3.5,Artist B,,86,"German,English"\n')
        f.write('3,11,3,3,x3,8,Title C,2:30,Artist C,Album C,2009,ge\n')
        f.write('4,11,4,4,x4,9,Title D,432000,Artist D,Album D,2025,Spanish\n')
        f.write("5,12,5,5,x5,9,L'enfant aux yeux d'Italie,200,--,Album É,2001,French\n")
    got = {r["rid"]: r for r in read_music_csv(spark, p).collect()}
    assert got[1]["length"] == 272 and got[1]["year"] == 2011 and got[1]["language"] == "en"
    assert got[2]["length"] == 210 and got[2]["year"] == 1986 and got[2]["language"] == "mu"
    assert got[3]["length"] == 150 and got[3]["year"] == 2009 and got[3]["language"] == "ge"
    assert got[4]["length"] == 432 and got[4]["year"] is None and got[4]["language"] == "sp"
    # createSimpleArtistTitleAlbum: sane(artist)+title+album, simplified
    # (lowercase, ASCII punct -> space, collapse); "--" dropped, accents kept
    assert got[2]["artist_title_album"] == "artist b title b"
    assert got[5]["artist_title_album"] == "l enfant aux yeux d italie album é"


def test_type_group_by_untyped_only_group(spark):
    """Reference TypeGroupByTest 'all no_type -> same hash': a connected
    group of component-less vertices (no typed neighbor anywhere) collapses
    to ONE shared component; isolated component-less vertices stay NULL
    (``TypeGroupBy.java:47-74``)."""
    vertices = spark.createDataFrame(
        [("u", None), ("a", "cA"), ("n1", None), ("n2", None), ("n3", None),
         ("iso", None)],
        ["rid", "comp"],
    )
    edges = spark.createDataFrame(
        [("u", "a", 0.9),          # u adopts cA (typed neighbor wins)
         ("n1", "n2", 0.8), ("n2", "n3", 0.7)],  # all-untyped chain
        ["a", "b", "sim"],
    )
    got = {r["rid"]: r["comp"] for r in type_group_by(vertices, edges).collect()}
    assert got["u"] == "cA"
    assert got["n1"] == got["n2"] == got["n3"] == "n1"  # min member id
    assert got["iso"] is None
