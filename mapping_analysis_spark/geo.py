"""Geography/settlement-domain pipeline composition (third real-data anchor).

The reference's settlement benchmark
(``integration/IncrementalGeoClusteringTest.java::allSettlementsAtOnceTest``,
published baseline "precision: 0.9969 recall: 0.9556 F1: 0.9758" over the
4-source DBpedia / GeoNames / NYTimes / Freebase settlement graph,
3,054 vertices, gold = ``settlement-benchmark/gold``):

1. JSON vertex source (``/data/geography``): id, label, lat, lon,
   dataSource, type (string or array), typeDetail. Input edges are IGNORED
   — the MULTI initial flow builds its own from blocking keys
   (``MultiIncrementalClusteringFunction.java:66-80``).
2. ``InternalTypeMapFunction`` + ``TypeDictionary``: raw rdf types →
   harmonized intern types; ``typeDetail`` (GeoNames) takes priority, the
   ``type`` values are consulted when it is absent or unmatched; both
   PRIMARY and SECONDARY dictionary hits accumulate; no match → "no_type".
3. Blocking: ``Utils.getGeoBlockingLabel(label, 4)`` (pad '#' to 4, first 4
   chars, lowercase, non-[a-z0-9#] runs → single '#', re-pad) →
   all distinct same-block pairs (``EdgeComputationOnVerticesForKeySelector``
   strategy ALL; ``IntraSourceLinkRemover`` is a documented NO-OP under an
   incremental config, ``IntraSourceLinkRemover.java:43-57``).
4. ``GeoSimilarityFunction`` (``simcomputation/GeoSimilarityFunction.java``):
   sim_label = simmetrics trigram cosine over ``Utils.simplify``-ed labels
   (punctuation-only simplify — accents kept); sim_geo = 1 − haversine/150km
   (6-dp HALF_UP, only when both coordinates are valid,
   ``Utils.getGeoSimilarity``); sim_type = shared-or-shaded intern type
   (``Utils.getTypeSim``) only when NEITHER side is untyped — an explicit
   0.0 for typed-but-disjoint pairs DOES enter the mean. Aggregation =
   mean over the present sims (``MeanAggregationFunction``, scale-10
   HALF_UP), admission strict > 0.6
   (``BasicEdgeSimilarityComputation.java:108``).
5. BASIC link filter = greedy source-disjoint union-find selection
   (``BasicLinkFilterFunction`` + ``LinkSelectionWithCcIdFunction``, the
   music path's :func:`~mapping_analysis_spark.music.greedy_source_link_selection`).
6. Clusters = connected components over the kept edges
   (``TypeOverlapCcCreator`` degenerates to a per-component relabel here:
   COMP_TYPE is never set in this flow, so every vertex falls back to
   "no_type" and each component keeps exactly one hash id —
   ``HashCcIdOverlappingFunction.java:40-60`` + ``ObjectMap.getTypes``
   missing-key fallback). Representative = min member id
   (``GeographicMajorityPropertiesGroupReduceFunction`` vertex-id rule).
7. Pair P/R/F1 vs the gold clusters (``QualityUtils.printGeoQuality``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mapping_analysis_spark.functions.attr_sims import geo_similarity, type_sim
from mapping_analysis_spark.io.csv_source import simplify_music
from mapping_analysis_spark.music import (
    greedy_source_link_selection,
    trigram_cosine_simmetrics,
)
from mapping_analysis_spark.operators.evaluation import pair_quality
from mapping_analysis_spark.operators.preprocess import all_edges_per_key

GEO_EDGE_ADMISSION = 0.6  # BasicEdgeSimilarityComputation.java:108, strict >
GEO_BLOCKING_LENGTH = 4  # Constants.BLOCKING_LENGTH_DEFAULT_VALUE

# util/TypeDictionary.java PRIMARY_TYPE / SECONDARY_TYPE — harmonized type
# dictionary (data table; commented-out entries omitted as in the source)
_PRIMARY_TYPE = {
    "http://dbpedia.org/ontology/Settlement": "Settlement",
    "http://dbpedia.org/ontology/Town": "Settlement",
    "http://dbpedia.org/ontology/City": "Settlement",
    "http://dbpedia.org/ontology/Village": "Settlement",
    "http://dbpedia.org/ontology/HistoricalSettlement": "Settlement",
    "http://dbpedia.org/ontology/CityDistrict": "Settlement",
    "http://rdf.freebase.com/ns/location.citytown": "Settlement",
    "http://rdf.freebase.com/ns/location.capital_of_administrative_division": "Settlement",
    "http://rdf.freebase.com/ns/location.neighborhood": "Settlement",
    "http://rdf.freebase.com/ns/location.place_with_neighborhoods": "Settlement",
    "http://rdf.freebase.com/ns/location.de_city": "Settlement",
    "http://rdf.freebase.com/ns/location.in_city": "Settlement",
    "http://rdf.freebase.com/ns/location.jp_city_town": "Settlement",
    "http://rdf.freebase.com/ns/location.jp_designated_city": "Settlement",
    "city, village,...": "Settlement",
    "http://linkedgeodata.org/ontology/Village": "Settlement",
    "http://linkedgeodata.org/ontology/City": "Settlement",
    "http://linkedgeodata.org/ontology/Suburb": "Settlement",
    "http://linkedgeodata.org/ontology/Town": "Settlement",
    "http://umbel.org/umbel/rc/Village": "Settlement",
    "http://umbel.org/umbel/rc/Town": "Settlement",
    "http://umbel.org/umbel/rc/City": "Settlement",
    "http://schema.org/City": "Settlement",
    "http://schema.org/Town": "Settlement",
    "http://rdf.freebase.com/ns/geography.river": "BodyOfWater",
    "http://rdf.freebase.com/ns/geography.lake": "BodyOfWater",
    "http://rdf.freebase.com/ns/geography.body_of_water": "BodyOfWater",
    "http://dbpedia.org/ontology/BodyOfWater": "BodyOfWater",
    "http://dbpedia.org/ontology/River": "BodyOfWater",
    "http://dbpedia.org/ontology/Lake": "BodyOfWater",
    "http://dbpedia.org/ontology/Ocean": "BodyOfWater",
    "http://dbpedia.org/ontology/Sea": "BodyOfWater",
    "http://dbpedia.org/ontology/Stream": "BodyOfWater",
    "stream": "BodyOfWater",
    "lake": "BodyOfWater",
    "glacier(s)": "BodyOfWater",
    "bay": "BodyOfWater",
    "sea": "BodyOfWater",
    "reservoir(s)": "BodyOfWater",
    "cove(s)": "BodyOfWater",
    "channel": "BodyOfWater",
    "overfalls": "BodyOfWater",
    "canal": "BodyOfWater",
    "fjord": "BodyOfWater",
    "harbor(s)": "BodyOfWater",
    "inlet": "BodyOfWater",
    "spring(s)": "BodyOfWater",
    "waterfall(s)": "BodyOfWater",
    "http://dbpedia.org/ontology/Mountain": "Mountain",
    "http://dbpedia.org/ontology/MountainPass": "Mountain",
    "http://dbpedia.org/ontology/MountainRange": "Mountain",
    "http://linkedgeodata.org/ontology/Peak": "Mountain",
    "mountain": "Mountain",
    "hill": "Mountain",
    "peak": "Mountain",
    "mountains": "Mountain",
    "ridge(s)": "Mountain",
    "cape": "Mountain",
    "slope(s)": "Mountain",
    "valley": "Mountain",
    "hills": "Mountain",
    "pass": "Mountain",
    "rock": "Mountain",
    "rocks": "Mountain",
    "http://rdf.freebase.com/ns/geography.mountain": "Mountain",
    "http://rdf.freebase.com/ns/geography.mountain_pass": "Mountain",
    "http://rdf.freebase.com/ns/geography.mountain_range": "Mountain",
    "http://umbel.org/umbel/rc/Island": "Island",
    "http://dbpedia.org/ontology/Island": "Island",
    "islands": "Island",
    "island": "Island",
    "islet": "Island",
    "http://linkedgeodata.org/ontology/Island": "Island",
    "http://rdf.freebase.com/ns/geography.island": "Island",
    "http://rdf.freebase.com/ns/geography.island_group": "Island",
    "http://dbpedia.org/ontology/School": "School",
    "http://dbpedia.org/ontology/University": "School",
    "http://dbpedia.org/ontology/EducationalInstitution": "School",
    "http://linkedgeodata.org/ontology/School": "School",
    "school": "School",
    "http://rdf.freebase.com/ns/education.academic": "School",
    "http://rdf.freebase.com/ns/education.academic_institution": "School",
    "http://rdf.freebase.com/ns/education.department": "School",
    "http://rdf.freebase.com/ns/education.educational_institution": "School",
    "http://rdf.freebase.com/ns/education.educational_institution_campus": "School",
    "http://rdf.freebase.com/ns/education.fraternity_sorority": "School",
    "http://rdf.freebase.com/ns/education.fraternity_sorority_type": "School",
    "http://rdf.freebase.com/ns/education.honorary_degree_recipient": "School",
    "http://rdf.freebase.com/ns/education.school": "School",
    "http://rdf.freebase.com/ns/education.school_category": "School",
    "http://rdf.freebase.com/ns/education.university": "School",
    "http://rdf.freebase.com/ns/education.university_system": "School",
    "http://dbpedia.org/ontology/Country": "Country",
    "http://rdf.freebase.com/ns/location.country": "Country",
    "http://rdf.freebase.com/ns/location.uk_overseas_territory": "Country",
    "dependent political entity": "Country",
    "http://linkedgeodata.org/ontology/Country": "Country",
    "independent political entity": "Country",
    "semi-independent political entity": "Country",
    "http://umbel.org/umbel/rc/Country": "Country",
    "http://dbpedia.org/ontology/Airport": "ArchitecturalStructure",
    "airport": "ArchitecturalStructure",
    "http://linkedgeodata.org/ontology/AerowayThing": "ArchitecturalStructure",
    "http://linkedgeodata.org/ontology/Airport": "ArchitecturalStructure",
    "http://rdf.freebase.com/ns/aviation.airline": "ArchitecturalStructure",
    "http://rdf.freebase.com/ns/aviation.airport": "ArchitecturalStructure",
    "http://rdf.freebase.com/ns/aviation.airport_operator": "ArchitecturalStructure",
    "http://rdf.freebase.com/ns/aviation.waypoint_type": "ArchitecturalStructure",
    "http://rdf.freebase.com/ns/aviation.aircraft_manufacturer": "ArchitecturalStructure",
    "http://linkedgeodata.org/ontology/Amenity": "ArchitecturalStructure",
    "http://dbpedia.org/ontology/Station": "ArchitecturalStructure",
    "http://dbpedia.org/ontology/LaunchPad": "ArchitecturalStructure",
    "http://dbpedia.org/ontology/Lock": "ArchitecturalStructure",
    "http://dbpedia.org/ontology/Port": "ArchitecturalStructure",
    "http://dbpedia.org/ontology/PowerStation": "ArchitecturalStructure",
    "http://dbpedia.org/ontology/RestArea": "ArchitecturalStructure",
    "http://dbpedia.org/ontology/RouteOfTransportation": "ArchitecturalStructure",
    "http://dbpedia.org/ontology/AmusementParkAttraction": "ArchitecturalStructure",
    "http://dbpedia.org/ontology/Arena": "ArchitecturalStructure",
    "http://dbpedia.org/ontology/Building": "ArchitecturalStructure",
    "http://dbpedia.org/ontology/Gate": "ArchitecturalStructure",
    "http://dbpedia.org/ontology/Infrastructure": "ArchitecturalStructure",
    "http://dbpedia.org/ontology/MilitaryStructure": "ArchitecturalStructure",
    "http://dbpedia.org/ontology/Mill": "ArchitecturalStructure",
    "http://dbpedia.org/ontology/NoteworthyPartOfBuilding": "ArchitecturalStructure",
    "http://dbpedia.org/ontology/Pyramid": "ArchitecturalStructure",
    "http://dbpedia.org/ontology/Shrine": "ArchitecturalStructure",
    "http://dbpedia.org/ontology/Square": "ArchitecturalStructure",
    "http://dbpedia.org/ontology/Tower": "ArchitecturalStructure",
    "http://dbpedia.org/ontology/Tunnel": "ArchitecturalStructure",
    "http://dbpedia.org/ontology/Venue": "ArchitecturalStructure",
    "http://dbpedia.org/ontology/Zoo": "ArchitecturalStructure",
    "http://dbpedia.org/ontology/ShoppingMall": "ArchitecturalStructure",
    "http://dbpedia.org/ontology/Stadium": "ArchitecturalStructure",
    "http://dbpedia.org/ontology/RailwayStation": "ArchitecturalStructure",
    "http://dbpedia.org/ontology/Dam": "ArchitecturalStructure",
    "http://dbpedia.org/ontology/SportFacility": "ArchitecturalStructure",
    "http://rdf.freebase.com/ns/architecture.venue": "ArchitecturalStructure",
    "http://rdf.freebase.com/ns/architecture.building": "ArchitecturalStructure",
    "http://rdf.freebase.com/ns/architecture.building_complex": "ArchitecturalStructure",
    "http://rdf.freebase.com/ns/architecture.landscape_project": "ArchitecturalStructure",
    "http://rdf.freebase.com/ns/architecture.museum": "ArchitecturalStructure",
    "http://rdf.freebase.com/ns/architecture.structure": "ArchitecturalStructure",
    "http://rdf.freebase.com/ns/architecture.building_function": "ArchitecturalStructure",
    "http://rdf.freebase.com/ns/architecture.building_occupant": "ArchitecturalStructure",
    "http://rdf.freebase.com/ns/architecture.skyscraper": "ArchitecturalStructure",
    "http://rdf.freebase.com/ns/architecture.type_of_museum": "ArchitecturalStructure",
    "http://rdf.freebase.com/ns/transportation.road": "ArchitecturalStructure",
    "http://rdf.freebase.com/ns/transportation.bridge": "ArchitecturalStructure",
    "http://rdf.freebase.com/ns/zoos.zoo": "ArchitecturalStructure",
    "http://rdf.freebase.com/ns/zoos.zoo_exhibit": "ArchitecturalStructure",
    "railroad station": "ArchitecturalStructure",
    "tower": "ArchitecturalStructure",
    "building(s)": "ArchitecturalStructure",
    "stadium": "ArchitecturalStructure",
    "church": "ArchitecturalStructure",
    "museum": "ArchitecturalStructure",
    "hostpital": "ArchitecturalStructure",
    "castle": "ArchitecturalStructure",
    "airfield": "ArchitecturalStructure",
    "spot, building, farm, ...": "ArchitecturalStructure",
    "http://linkedgeodata.org/ontology/Leisure": "ArchitecturalStructure",
}

_SECONDARY_TYPE = {
    "http://dbpedia.org/ontology/ArchitecturalStructure": "ArchitecturalStructure",
    "http://dbpedia.org/ontology/AdministrativeRegion": "AdministrativeRegion",
    "country, state, region ...": "AdministrativeRegion",
    "http://rdf.freebase.com/ns/location.administrative_division": "AdministrativeRegion",
    "http://rdf.freebase.com/ns/location.statistical_region": "AdministrativeRegion",
    "http://rdf.freebase.com/ns/location.us_state": "AdministrativeRegion",
    "http://rdf.freebase.com/ns/location.fr_region": "AdministrativeRegion",
    "http://rdf.freebase.com/ns/location.province": "AdministrativeRegion",
    "http://rdf.freebase.com/ns/location.in_state": "AdministrativeRegion",
    "http://rdf.freebase.com/ns/location.mx_state": "AdministrativeRegion",
    "http://rdf.freebase.com/ns/location.es_autonomous_community": "AdministrativeRegion",
    "http://rdf.freebase.com/ns/location.fr_department": "AdministrativeRegion",
    "http://rdf.freebase.com/ns/location.it_comune": "AdministrativeRegion",
    "http://dbpedia.org/ontology/Region": "AdministrativeRegion",
    "http://rdf.freebase.com/ns/amusement_parks.park": "ArchitecturalStructure",
    "http://linkedgeodata.org/ontology/Park": "Park",
    "http://dbpedia.org/ontology/Park": "Park",
    "parks,area, ...": "Park",
    "http://dbpedia.org/ontology/ProtectedArea": "Park",
    "http://rdf.freebase.com/ns/protected_sites.governing_body_of_protected_sites": "Park",
    "http://rdf.freebase.com/ns/protected_sites.listed_site": "Park",
    "http://rdf.freebase.com/ns/protected_sites.natural_or_cultural_preservation_agency": "Park",
    "http://rdf.freebase.com/ns/protected_sites.park_system": "Park",
    "http://rdf.freebase.com/ns/protected_sites.protected_site": "Park",
    "http://rdf.freebase.com/ns/protected_sites.site_listing_category": "Park",
}

NO_TYPE = "no_type"


def _map_literal(d: dict) -> Column:
    items: list[Column] = []
    for k, v in d.items():
        items.append(F.lit(k))
        items.append(F.lit(v))
    return F.create_map(*items)


def _dict_values(types: Column) -> Column:
    """``InternalTypeMapFunction.getDictValues``: union of PRIMARY hits and
    SECONDARY hits over all raw values; no hit at all → ["no_type"]."""
    prim = _map_literal(_PRIMARY_TYPE)
    sec = _map_literal(_SECONDARY_TYPE)
    hits = F.array_distinct(
        F.concat(
            F.array_compact(F.transform(types, lambda t: prim[t])),
            F.array_compact(F.transform(types, lambda t: sec[t])),
        )
    )
    return F.when(F.size(hits) > 0, hits).otherwise(F.array(F.lit(NO_TYPE)))


def internal_types(types: Column, type_detail: Column) -> Column:
    """``InternalTypeMapFunction.map``: typeDetail (GeoNames) first; the
    ``type`` values whenever typeDetail is absent or resolved to no_type."""
    from_detail = _dict_values(F.array(type_detail))
    from_types = _dict_values(types)
    detail_ok = type_detail.isNotNull() & ~F.array_contains(
        from_detail, NO_TYPE
    )
    return (
        F.when(detail_ok, from_detail)
        .when(types.isNotNull() & (F.size(types) > 0), from_types)
        .otherwise(F.array(F.lit(NO_TYPE)))
    )


def geo_blocking_label(
    label: Column, blocking_length: int = GEO_BLOCKING_LENGTH
) -> Column:
    """``Utils.getGeoBlockingLabel``: pad '#' to length, first ``length``
    chars, lowercase, every non-[a-z0-9#] RUN → one '#', re-pad (the run
    collapse can shorten the string, e.g. "ab!?" → "ab#" → "ab##")."""
    prefix = F.lower(
        F.substring(F.rpad(label, blocking_length, "#"), 1, blocking_length)
    )
    cleaned = F.regexp_replace(prefix, "[^a-z0-9#]+", "#")
    return F.rpad(cleaned, blocking_length, "#")


def read_geo_vertices(
    spark: SparkSession, path: str, map_types: bool = True
) -> DataFrame:
    """Geography JSON vertices → (rid, label, lat, lon, source, types).

    The raw ``type`` field is a string for GeoNames rows and an array for
    the RDF sources — read both shapes via the JSON string and normalize to
    an array before the dictionary mapping.

    ``map_types=False`` skips ``InternalTypeMapFunction`` (every vertex gets
    ["no_type"]) — the incremental integration test reads the graph WITHOUT
    the type mapping (``IncrementalGeoClusteringTest.java:123-125`` has no
    ``mapVertices(new InternalTypeMapFunction())``), which makes the
    VERTEX_ADDITION Settlement-default the only type in play."""
    raw = spark.read.text(path)
    rid = F.get_json_object("value", "$.id").cast("long")
    type_raw = F.get_json_object("value", "$.data.type")
    types = F.when(
        type_raw.startswith("["), F.from_json(type_raw, "array<string>")
    ).otherwise(
        F.when(type_raw.isNotNull(), F.array(type_raw))
    )
    v = raw.select(
        rid.alias("rid"),
        F.get_json_object("value", "$.data.label").alias("label"),
        F.get_json_object("value", "$.data.lat").cast("double").alias("lat"),
        F.get_json_object("value", "$.data.lon").cast("double").alias("lon"),
        F.get_json_object("value", "$.data.dataSource").alias("source"),
        types.alias("types_raw"),
        F.get_json_object("value", "$.data.typeDetail").alias("type_detail"),
    )
    typed = (
        internal_types(F.col("types_raw"), F.col("type_detail"))
        if map_types
        else F.array(F.lit(NO_TYPE))
    )
    return v.withColumn("types", typed).drop("types_raw", "type_detail")


def _sane(col: Column) -> Column:
    # Utils.isSane — case-sensitive placeholder check
    return col.isNotNull() & ~col.isin("no_label_found", "no_value", "--")


def geo_pair_sims(vertices: DataFrame, pairs: DataFrame) -> DataFrame:
    """``GeoSimilarityFunction`` + ``MeanAggregationFunction`` over (a, b)
    pairs: mean of {trigram label sim, geo distance sim, type sim}, each
    included only when defined (label: both sane; geo: both coordinate
    pairs valid; type: both sides typed — then even 0.0 counts)."""
    side = vertices.select(
        "rid",
        "label",
        simplify_music(F.col("label")).alias("label_norm"),
        "lat",
        "lon",
        "types",
    )

    def pref(p: str):
        cols = [F.col(c).alias(f"{p}_{c}") for c in side.columns if c != "rid"]
        return side.select(F.col("rid").alias(p), *cols)

    j = pairs.select("a", "b").join(pref("a"), "a").join(pref("b"), "b")
    sims = {
        "sim_label": F.when(
            _sane(F.col("a_label")) & _sane(F.col("b_label")),
            trigram_cosine_simmetrics(F.col("a_label_norm"), F.col("b_label_norm")),
        ),
        # Utils.getGeoSimilarity rounds EACH geo sim to 6-dp HALF_UP before
        # aggregation (BigDecimal.setScale(6), Utils.java:451-454)
        "sim_geo": F.round(
            geo_similarity(
                F.col("a_lat"), F.col("a_lon"), F.col("b_lat"), F.col("b_lon")
            ),
            6,
        ),
        "sim_type": F.when(
            ~F.array_contains(F.col("a_types"), NO_TYPE)
            & ~F.array_contains(F.col("b_types"), NO_TYPE),
            type_sim(F.col("a_types"), F.col("b_types")),
        ),
    }
    scored = j
    for name, expr in sims.items():
        scored = scored.withColumn(name, expr)
    present = F.filter(
        F.array(*[F.col(c) for c in sims]), lambda x: x.isNotNull()
    )
    # MeanAggregationFunction: sum/count at scale 10 HALF_UP (round() in
    # Spark is HALF_UP for positive values)
    mean = F.when(
        F.size(present) > 0,
        F.round(
            F.aggregate(present, F.lit(0.0), lambda acc, x: acc + x)
            / F.size(present),
            10,
        ),
    )
    return scored.withColumn("sim", mean).filter(
        F.col("sim").isNotNull()
    ).select("a", "b", "sim", *sims.keys())


def geo_scored_edges(vertices: DataFrame) -> DataFrame:
    """Blocking-key candidate pairs → GeoSimilarityFunction mean → > 0.6
    admission. Returns (a, b, sim) with per-component selection NOT yet
    applied."""
    blocked = vertices.withColumn("block", geo_blocking_label(F.col("label")))
    pairs = all_edges_per_key(blocked, "block", id_col="rid")
    return geo_pair_sims(vertices, pairs).filter(
        F.col("sim") > F.lit(GEO_EDGE_ADMISSION)
    ).select("a", "b", "sim")


def geo_clusters(vertices: DataFrame, scored: DataFrame) -> DataFrame:
    """BASIC link filter (greedy source-disjoint selection per component,
    sim DESC / a ASC / b ASC) → connected components over the kept edges;
    isolated vertices stay as singletons (removeIsolatedVertices=false in
    ``DefaultPreprocessing.java:44-50``). Returns (rid, cluster_id),
    cluster_id = min member id."""
    sources = [
        r[0]
        for r in sorted(vertices.select("source").distinct().collect())
    ]  # 4 settlement sources — O(small) driver list, like config.getSourcesList()
    bit_map = F.create_map(
        *[c for i, s in enumerate(sources) for c in (F.lit(s), F.lit(1 << i))]
    )
    src_bit = vertices.select("rid", bit_map[F.col("source")].alias("mask"))
    masked = (
        scored.join(
            src_bit.select(F.col("rid").alias("a"), F.col("mask").alias("a_mask")),
            "a",
        )
        .join(
            src_bit.select(F.col("rid").alias("b"), F.col("mask").alias("b_mask")),
            "b",
        )
        .select("a", "b", "sim", "a_mask", "b_mask")
    )
    assigned = greedy_source_link_selection(masked)
    return (
        vertices.select("rid")
        .join(assigned.withColumnRenamed("comp", "cluster_id"), "rid", "left")
        .withColumn("cluster_id", F.coalesce(F.col("cluster_id"), F.col("rid")))
    )


def geo_settlement_quality(
    spark: SparkSession, data_path: str, gold_path: str
) -> DataFrame:
    """End-to-end all-at-once settlement benchmark: clusters vs the gold
    standard, pair-level P/R/F1 (published anchor P 0.9969 / R 0.9556 /
    F1 0.9758)."""
    v = read_geo_vertices(spark, data_path).localCheckpoint(eager=True)
    clusters = geo_clusters(v, geo_scored_edges(v))
    gold = (
        spark.read.json(gold_path)
        .select(
            F.col("id").alias("gold_id"),
            F.explode("data.clusteredVertices").alias("rid"),
        )
    )
    return pair_quality(
        clusters,
        gold,
        pred_group="cluster_id",
        gold_group="gold_id",
        member_col="rid",
    )


# ---------------------------------------------------------------------------
# Incremental VERTEX_ADDITION flow (IncrementalGeoClusteringTest.java
# incrementalVertexAdditionClusteringTest — published P 0.9961 / R 0.9406 /
# F1 0.9676): initial clustering on 80% of GN+NYT+DBP, then three
# VERTEX_ADDITION waves (+10%, all of Freebase, final 10%). Each wave:
# existing representatives ∪ new singletons → blocking-key edges →
# GeoSimilarityFunction mean > 0.6 → greedy source-disjoint selection →
# GeographicMajorityPropertiesGroupReduceFunction re-merge.
# ---------------------------------------------------------------------------

GN_NS = "http://sws.geonames.org/"
DBP_NS = "http://dbpedia.org/"


def geo_singletons(wave: DataFrame, settlement_default: bool) -> DataFrame:
    """Wave vertices → singleton representatives.

    ``settlement_default`` applies the VERTEX_ADDITION geography map
    (``MultiIncrementalClusteringFunction.java:92-103``): an untyped new
    element gets typeIntern {"Settlement"}. The incremental test never runs
    ``InternalTypeMapFunction``, so every raw wave vertex is untyped and the
    default fires for all of them; the initial (80%) wave keeps
    ["no_type"] (the INITIAL_CLUSTERING branch has no such map)."""
    types = F.when(
        F.array_contains(F.col("types"), NO_TYPE) & F.lit(settlement_default),
        F.array(F.lit("Settlement")),
    ).otherwise(F.col("types"))
    return wave.select(
        "rid",
        "label",
        "lat",
        "lon",
        F.array(F.col("source")).alias("sources"),
        F.array(F.col("rid")).alias("members"),
        types.alias("types"),
    )


def _geo_rep_merge(workset: DataFrame, assign: DataFrame) -> DataFrame:
    """``GeographicMajorityPropertiesGroupReduceFunction``: group workset
    constituents by selected component and merge —

    * id = min underlying member id (``updateVertexId`` min over
      constituents, whose ids are already min-of-members);
    * members / sources / types = unions;
    * label = majority over the constituents' SIMPLIFIED labels (one vote
      per constituent, ``addLabelToMap``); count ties prefer the longer
      label (``Utils.getFinalValue``), residual ties lexicographically
      smallest (the Java iteration order is unspecified there);
    * lat/lon = the valid-coordinate constituent owning GeoNames, else
      DBpedia, else the lexicographically smallest source
      (``ObjectMap.setGeoProperties(geoMap)``; the reference's final
      fallback is ``entry.hashCode()`` — JVM-identity, unspecified — so the
      smallest-source stand-in is our deterministic rendering; constituents
      of one cluster have DISJOINT source sets, so each geoMap key has
      exactly one contributor and the GN/DBP branches are exact)."""
    j = (
        workset.join(
            assign.withColumnRenamed("rid", "_wid"),
            workset["rid"] == F.col("_wid"),
            "left",
        )
        .withColumn("comp", F.coalesce(F.col("comp"), F.col("rid")))
        .drop("_wid")
    )
    base = j.groupBy("comp").agg(
        F.array_distinct(F.flatten(F.collect_list("members"))).alias("members"),
        F.array_distinct(F.flatten(F.collect_list("sources"))).alias("sources"),
        F.array_distinct(F.flatten(F.collect_list("types"))).alias("types"),
    )
    votes = (
        j.withColumn("_lab", simplify_music(F.col("label")))
        .groupBy("comp", "_lab")
        .agg(F.count("*").alias("_n"))
    )
    wlab = Window.partitionBy("comp").orderBy(
        F.col("_n").desc(), F.length("_lab").desc(), F.col("_lab").asc()
    )
    best_label = (
        votes.withColumn("_rn", F.row_number().over(wlab))
        .filter(F.col("_rn") == 1)
        .select("comp", F.col("_lab").alias("label"))
    )
    valid = (
        F.col("lat").isNotNull()
        & F.col("lon").isNotNull()
        & (F.abs(F.col("lat")) <= 90.0)
        & (F.abs(F.col("lon")) <= 180.0)
    )
    wgeo = Window.partitionBy("comp").orderBy(
        F.when(F.array_contains(F.col("sources"), GN_NS), 0)
        .when(F.array_contains(F.col("sources"), DBP_NS), 1)
        .otherwise(2),
        F.array_min("sources").asc(),
        F.col("rid").asc(),
    )
    best_geo = (
        j.filter(valid)
        .withColumn("_rn", F.row_number().over(wgeo))
        .filter(F.col("_rn") == 1)
        .select("comp", "lat", "lon")
    )
    return (
        base.join(best_label, "comp")
        .join(best_geo, "comp", "left")
        .select(
            F.array_min("members").alias("rid"),
            "label",
            "lat",
            "lon",
            "sources",
            "members",
            "types",
        )
    )


def _rep_masks(workset: DataFrame, bit_map: Column) -> DataFrame:
    return workset.withColumn(
        "mask",
        F.aggregate(
            F.col("sources"), F.lit(0).cast("long"), lambda acc, s: acc + bit_map[s]
        ),
    )


def geo_cluster_wave(workset: DataFrame, bit_map: Column) -> DataFrame:
    """One MULTI wave over a representative workset: blocking-key pairs →
    GeoSimilarityFunction mean > 0.6 admission → greedy source-disjoint
    selection → GeographicMajority re-merge. Works for the initial wave
    (all-singleton workset) and every VERTEX_ADDITION wave alike."""
    blocked = workset.withColumn("block", geo_blocking_label(F.col("label")))
    pairs = all_edges_per_key(blocked, "block", id_col="rid")
    scored = geo_pair_sims(workset, pairs).filter(
        F.col("sim") > F.lit(GEO_EDGE_ADMISSION)
    )
    masked = _rep_masks(workset, bit_map)
    edges = (
        scored.join(
            masked.select(F.col("rid").alias("a"), F.col("mask").alias("a_mask")),
            "a",
        )
        .join(
            masked.select(F.col("rid").alias("b"), F.col("mask").alias("b_mask")),
            "b",
        )
        .select("a", "b", "sim", "a_mask", "b_mask")
    )
    assign = greedy_source_link_selection(edges)
    return _geo_rep_merge(workset, assign)


def parse_geo_splits(java_test_path: str) -> dict[str, list[int]]:
    """Extract the 80/10/final id sets from the reference's integration test
    (data, not code: the split definitions live inline as
    ``Sets.newHashSet(6110L, ...)`` literals)."""
    import re

    text = open(java_test_path).read()
    out: dict[str, list[int]] = {}
    for m in re.finditer(
        r"(GN|DBP|NYT|FB)_(EIGHTY|PLUS_TEN|FINAL)\s*=\s*Sets\.newHashSet\(([^)]*)\)",
        text,
        re.S,
    ):
        ids = [int(x) for x in re.findall(r"(\d+)L", m.group(3))]
        out[f"{m.group(1)}_{m.group(2)}"] = ids
    return out


def geo_incremental_quality(
    spark: SparkSession,
    data_path: str,
    gold_path: str,
    java_test_path: str,
) -> DataFrame:
    """The full 4-wave incremental settlement benchmark; returns the
    pair-quality row of the final state (published anchor P 0.9961 /
    R 0.9406 / F1 0.9676)."""
    splits = parse_geo_splits(java_test_path)
    raw = read_geo_vertices(spark, data_path, map_types=False).localCheckpoint(
        eager=True
    )
    sources = [r[0] for r in sorted(raw.select("source").distinct().collect())]
    bit_map = F.create_map(
        *[c for i, s in enumerate(sources) for c in (F.lit(s), F.lit(1 << i))]
    )

    def wave_ids(names: list[str]) -> list[int]:
        ids: list[int] = []
        for n in names:
            ids.extend(splits[n])
        return ids

    waves = [
        (wave_ids(["GN_EIGHTY", "NYT_EIGHTY", "DBP_EIGHTY"]), False),
        (wave_ids(["GN_PLUS_TEN", "NYT_PLUS_TEN", "DBP_PLUS_TEN"]), True),
        (wave_ids(["FB_EIGHTY", "FB_PLUS_TEN", "FB_FINAL"]), True),
        (wave_ids(["GN_FINAL", "DBP_FINAL", "NYT_FINAL"]), True),
    ]
    reps: DataFrame | None = None
    for ids, settlement_default in waves:
        wave = raw.join(
            spark.createDataFrame([(i,) for i in ids], "rid long"), "rid", "left_semi"
        )
        singles = geo_singletons(wave, settlement_default)
        workset = singles if reps is None else reps.unionByName(singles)
        reps = geo_cluster_wave(workset, bit_map).localCheckpoint(eager=True)

    clusters = reps.select(
        F.col("rid").alias("cluster_id"), F.explode("members").alias("rid")
    )
    gold = spark.read.json(gold_path).select(
        F.col("id").alias("gold_id"),
        F.explode("data.clusteredVertices").alias("rid"),
    )
    return pair_quality(
        clusters, gold, pred_group="cluster_id", gold_group="gold_id", member_col="rid"
    )
