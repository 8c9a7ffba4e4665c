"""Attribute-level similarity expressions from the reference's similarity
suite — all native Catalyst (no Python in the hot path).

Reference parity:

* ``geo_similarity`` — ``util/Utils.java:443-459`` getGeoSimilarity +
  ``util/GeoDistance.java:20-46``: haversine distance (R = 6371 km), invalid
  or missing coordinates → null, >= 150 km → 0, else 1 − d/150000 (the
  reference rounds to 6 dp HALF_UP; callers here quantize with ``sim_e4`` —
  trig libraries differ in the last ulp between engines, so the oracle
  comparison needs the coarser grid; see the docstring).
* ``year_sim`` / ``length_sim`` — ``simcomputation/SimCompUtils.java:37-64``
  getDoubleSimilarity: equal → 1, ±1 → 0.5, else 0; null if either side
  missing.
* ``number_sim`` — ``SimCompUtils.java:12-25`` handleNumber: equal sane
  strings → 1, else null.
* ``type_sim`` — ``util/Utils.java:636-667`` getTypeSim +
  ``util/TypeDictionary.java`` TYPE_SHADINGS with SHADING_TYPE_SIM = 1:
  1 if the type sets share a type or a shading pair, else 0. (The Java
  set-iteration order is irrelevant because the shading similarity is 1.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MAX_GEO_DISTANCE_M = 150_000.0
EARTH_RADIUS_KM = 6371.0

# util/TypeDictionary.java TYPE_SHADINGS (symmetric check in getTypeSim)
TYPE_SHADINGS: list[tuple[str, str]] = [
    ("ArchitecturalStructure", "School"),
    ("Mountain", "Island"),
    ("Country", "Settlement"),
    ("Settlement", "AdministrativeRegion"),
    ("AdministrativeRegion", "Country"),
]


def _valid_geo(lat: Column, lon: Column) -> Column:
    return (
        lat.isNotNull()
        & lon.isNotNull()
        & (F.abs(lat) <= F.lit(90.0))
        & (F.abs(lon) <= F.lit(180.0))
    )


def haversine_m(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Haversine distance in meters (GeoDistance.distance, el=0)."""
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = F.pow(F.sin(dlat / 2), 2) + F.cos(F.radians(lat1)) * F.cos(
        F.radians(lat2)
    ) * F.pow(F.sin(dlon / 2), 2)
    c = 2 * F.atan2(F.sqrt(a), F.sqrt(1 - a))
    return F.lit(EARTH_RADIUS_KM) * c * F.lit(1000.0)


def geo_similarity(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """1 − d/150km capped at 0; null when either coordinate is invalid."""
    d = haversine_m(lat1, lon1, lat2, lon2)
    sim = F.when(d >= F.lit(MAX_GEO_DISTANCE_M), F.lit(0.0)).otherwise(
        F.lit(1.0) - d / F.lit(MAX_GEO_DISTANCE_M)
    )
    return F.when(_valid_geo(lat1, lon1) & _valid_geo(lat2, lon2), sim)


def _int_step_sim(a: Column, b: Column) -> Column:
    diff = F.abs(a - b)
    return F.when(a.isNull() | b.isNull(), F.lit(None).cast("double")).otherwise(
        F.when(diff == 0, F.lit(1.0)).when(diff == 1, F.lit(0.5)).otherwise(F.lit(0.0))
    )


def year_sim(a: Column, b: Column) -> Column:
    return _int_step_sim(a, b)


def length_sim(a: Column, b: Column) -> Column:
    return _int_step_sim(a, b)


def number_sim(a: Column, b: Column) -> Column:
    """Equal sane (non-null, non-empty) strings → 1.0, else null."""
    sane = a.isNotNull() & b.isNotNull() & (a != F.lit("")) & (b != F.lit(""))
    return F.when(sane & (a == b), F.lit(1.0))


def type_sim(a_types: Column, b_types: Column) -> Column:
    """1.0 when the sets share a type or a TYPE_SHADINGS pair, else 0.0."""
    overlap = F.size(F.array_intersect(a_types, b_types)) > 0
    shading = F.lit(False)
    for x, y in TYPE_SHADINGS:
        shading = shading | (
            F.array_contains(a_types, x) & F.array_contains(b_types, y)
        ) | (F.array_contains(a_types, y) & F.array_contains(b_types, x))
    return F.when(overlap | shading, F.lit(1.0)).otherwise(F.lit(0.0))


def sim_e4(sim: Column) -> Column:
    """Similarity as integer ten-thousandths — used where the value chain
    contains transcendental functions (sin/cos/atan2) whose last-ulp results
    differ between the JVM and DuckDB's libm: at 1e-4 granularity the
    probability of a rounding-boundary flip over the test corpus is ~1e-2 vs
    ~1 at 1e-6."""
    return F.floor(sim * F.lit(10_000.0) + F.lit(0.5)).cast("long")
