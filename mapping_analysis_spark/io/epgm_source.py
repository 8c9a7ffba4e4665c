"""Gradoop EPGM JSON graph source (SURVEY §2 row #4).

Reference parity: ``util/Utils.java:132-167`` (getGradoopGraph +
getInputGraph) reads a Gradoop EPGM directory — ``graphHeads.json``,
``vertices.json``, ``edges.json``, one JSON object per line with
``{"id": <gradoop-id>, "data": {...properties}, "meta": {"label": ...}}`` —
and converts it to a Gelly graph: vertex long ids come from the ``recId``
property (NC: ``Utils.getIdFromNcId``, GEO: ``Long.valueOf``) or a hash of
the Gradoop id (MUSIC, ``GradoopToObjectMapVertexMapper.java:38-41``), and
every edge's source/target Gradoop id is resolved to the vertex long id via
two joins (``GradoopToGellyEdgeJoinFunction``).

Spark-first re-expression: two ``spark.read.json`` scans + two broadcast
joins. The id-resolution joins broadcast the (gradoop-id -> rid) mapping —
at 100 TB the vertex id map is the small side of an edge-resolution join
only when vertices ≪ edges; a plain shuffle join handles the general case,
so the broadcast is a hint, not a requirement.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# GradoopToObjectMapVertexMapper.java:44-90 property routing
_PROP_ALIASES = {
    "label": ["surname", "title", "label"],
    "album": ["suburb", "album"],
    "artist": ["name", "artist"],
    "number": ["postcod", "number"],
    "source": ["type", "dataSource"],
    "artist_title_album": ["field"],  # "alieh data"
    "lat": ["lat"],
    "lon": ["lon"],
}


def _first_present(data_cols: list[str], names: list[str]):
    cands = [F.col(f"data.{n}") for n in names if n in data_cols]
    if not cands:
        return F.lit(None).cast("string")
    return F.coalesce(*cands) if len(cands) > 1 else cands[0]


def read_epgm_graph(
    spark: SparkSession, path: str, domain: str = "music"
) -> tuple[DataFrame, DataFrame]:
    """Read an EPGM directory -> (vertices, edges).

    Vertices: (rid long, label, album, artist, number, source,
    artist_title_album, ...) per the reference's property routing; ``rid``
    is ``recId``-derived where present, else a deterministic hash of the
    Gradoop id (xxhash64 stands in for the reference's string hash — ids
    are opaque either way). Edges: (a, b) resolved to vertex rids.
    """
    def part(name: str) -> str:
        # both EPGM layouts occur in the reference: flat (<dir>/vertices.json,
        # util/Utils.java:134-136) and nested (<dir>/vertices/vertices.json,
        # e.g. the nc/csimq and geography fixtures)
        flat = os.path.join(path, f"{name}.json")
        return flat if os.path.exists(flat) else os.path.join(path, name)

    vraw = spark.read.json(part("vertices"))
    eraw = spark.read.json(part("edges"))
    data_cols = (
        [f.name for f in vraw.schema["data"].dataType.fields]
        if "data" in vraw.columns
        else []
    )
    rec_id = (
        F.col("data.recId")
        if "recId" in data_cols
        else F.lit(None).cast("string")
    )
    # Utils.getIdFromNcId (util/Utils.java:464-472): split the recId on 's'
    # and REVERSE-concatenate the parts ("501s2020" -> "2020501"), then parse
    # as long — NOT a first-digit-run extract, which would collapse an
    # original record and its duplicate ("rec-123-org" vs "rec-123-dup-0")
    # into one vertex. Non-parsing recIds hash on the FULL string so distinct
    # recIds never share a rid. GEO recIds are plain longs (a one-part
    # 's'-split, identical under reverse-concat).
    nc_long = F.concat_ws("", F.reverse(F.split(rec_id, "s"))).try_cast("long")
    # plain numeric vertex ids (e.g. the nc/csimq fixture, already a Gelly
    # graph: JSONDataSource(graphPath, true).getGraph) pass through as-is;
    # Gradoop hex ids hash
    plain_id = F.expr("try_cast(id as long)")
    rid = F.when(
        rec_id.isNotNull(),
        F.coalesce(nc_long, F.xxhash64(rec_id)),
    ).otherwise(F.coalesce(plain_id, F.xxhash64(F.col("id"))))
    sel = [rid.alias("rid"), F.col("id").alias("_gid")]
    for out_name, aliases in _PROP_ALIASES.items():
        sel.append(_first_present(data_cols, aliases).alias(out_name))
    vertices = vraw.select(*sel)

    idmap = vertices.select("_gid", "rid")
    edges = (
        eraw.select(F.col("source").alias("_gs"), F.col("target").alias("_gt"))
        .join(F.broadcast(idmap.withColumnRenamed("_gid", "_gs")), "_gs")
        .withColumnRenamed("rid", "a")
        .join(
            F.broadcast(
                idmap.withColumnRenamed("_gid", "_gt").withColumnRenamed("rid", "b")
            ),
            "_gt",
        )
        .select("a", "b")
    )
    return vertices.drop("_gid"), edges
