"""Structured Streaming incremental geography (settlement) clustering job.

The streaming re-expression of the reference's incremental geo loop
(``IncrementalGeoClusteringTest.java::incrementalVertexAdditionClusteringTest``
+ ``MultiIncrementalClusteringFunction.java:84-133``): vertex waves arrive
as micro-batches through ``foreachBatch``; per wave, current settlement
representatives re-block with the new singletons, admitted
GeoSimilarityFunction-mean > 0.6 edges are selected source-disjointly and
components re-merge under GeographicMajority semantics — exactly the batch
loop ``geo.geo_incremental_quality``, but with versioned exactly-once state
tables instead of the reference's save-to-JSON-and-restart cycle.

Per-batch cost is **O(dirty blocks), not O(total state)** for the same two
structural reasons as the music job (one blocking label per representative;
deterministic selection ⇒ unmerged untouched blocks are at a fixpoint) —
see ``streaming/music_job.py`` and BENCH.md §4e.

The one semantic wrinkle vs music: the reference applies the
untyped→Settlement type default ONLY to VERTEX_ADDITION waves, not to the
initial wave — the job reproduces that with ``batch_id == 0``
(``MultiIncrementalClusteringFunction.java:92-103``).

State tables (``SnapshotStateTable``, as in the music job): ``reps``
(cluster_rid → label/lat/lon/sources/members/types), ``rep_blocks``
(posting list), ``assignments`` (rid → cluster_rid, the exactly-once
output), ``dirty`` (blocks to re-examine). ``dirty`` commits last and is
the batch's replay gate; every read feeding a later commit is pinned
``before_batch``.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from mapping_analysis_spark.geo import (
    GEO_BLOCKING_LENGTH,
    geo_blocking_label,
    geo_cluster_wave,
    geo_singletons,
)
from mapping_analysis_spark.streaming.sinks import SnapshotStateTable

GEO_WAVE_SCHEMA = StructType(
    [
        StructField("rid", LongType()),
        StructField("label", StringType()),
        StructField("lat", DoubleType()),
        StructField("lon", DoubleType()),
        StructField("source", StringType()),
    ]
)

_REP_SCHEMA = (
    "cluster_rid long, label string, lat double, lon double, "
    "sources array<string>, members array<long>, types array<string>"
)


class GeoIncrementalJob:
    """Incremental MULTI settlement clustering driven by foreachBatch."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        blocking_length: int = GEO_BLOCKING_LENGTH,
        state_buckets: int = 16,
        track_scans: bool = False,
    ) -> None:
        self.spark = spark
        self.blocking_length = blocking_length

        def tbl(name: str, bucket_by: list[str]) -> SnapshotStateTable:
            return SnapshotStateTable(
                spark,
                state_dir,
                name,
                bucket_by=bucket_by,
                num_buckets=state_buckets,
                track_scans=track_scans,
            )

        self.reps = tbl("reps", ["cluster_rid"])
        self.rep_blocks = tbl("rep_blocks", ["block"])
        self.assignments = tbl("assignments", ["rid"])
        self.dirty = tbl("dirty", ["block"])
        self.metrics_path = os.path.join(state_dir, "metrics.jsonl")
        self.prune_every = 4

    @property
    def _tables(self) -> list[SnapshotStateTable]:
        return [self.reps, self.rep_blocks, self.assignments, self.dirty]

    def _empty(self, schema: str) -> DataFrame:
        return self.spark.createDataFrame([], schema)

    def _label(self, col):
        return geo_blocking_label(col, self.blocking_length)

    # -- per-batch kernel ----------------------------------------------------

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        t0 = time.time()
        if self.dirty.committed(batch_id):
            self._log(batch_id, 0, t0, replayed=True)
            return

        batch_df = (
            batch_df.select("rid", "label", "lat", "lon", "source")
            .dropDuplicates(["rid"])
            .localCheckpoint(eager=True)
        )
        n_rows = batch_df.count()
        if n_rows == 0:
            for st in self._tables:
                st.commit_unchanged(batch_id)
            self._log(batch_id, 0, t0)
            return

        # the Settlement default fires for every wave EXCEPT the initial one
        singles = geo_singletons(
            batch_df.withColumn("types", F.array(F.lit("no_type"))),
            settlement_default=batch_id > 0,
        ).withColumnRenamed("rid", "cluster_rid")

        prev_dirty = self.dirty.read(before_batch=batch_id)
        if prev_dirty is None:
            prev_dirty = self._empty("block string")
        touched = (
            singles.select(self._label(F.col("label")).alias("block"))
            .union(prev_dirty.select("block"))
            .distinct()
            .localCheckpoint(eager=False)
        )

        post = self.rep_blocks.read_for(touched, before_batch=batch_id)
        if post is None:
            post = self._empty("block string, cluster_rid long")
        rep_ids = post.select("cluster_rid").distinct()
        reps_tchd = self.reps.read_for(rep_ids, before_batch=batch_id)
        if reps_tchd is None:
            reps_tchd = self._empty(_REP_SCHEMA)
        workset = (
            reps_tchd.unionByName(singles)
            .withColumnRenamed("cluster_rid", "rid")
            .localCheckpoint(eager=False)
        )

        # source→bit map from this workset (encoding only — selection needs
        # source-SET disjointness, any stable per-batch assignment works)
        srcs = sorted(
            r[0]
            for r in workset.select(F.explode("sources")).distinct().collect()
        )
        bit_map = F.create_map(
            *[c for i, s in enumerate(srcs) for c in (F.lit(s), F.lit(1 << i))]
        )

        merged = (
            geo_cluster_wave(workset, bit_map)
            .withColumnRenamed("rid", "cluster_rid")
            .localCheckpoint(eager=True)
        )
        w_ids = workset.select(F.col("rid").alias("cluster_rid"))

        removed = w_ids.join(
            merged.select("cluster_rid"), "cluster_rid", "left_anti"
        ).localCheckpoint(eager=False)
        changed_kept = (
            merged.alias("m")
            .join(
                workset.select(
                    F.col("rid").alias("cluster_rid"),
                    F.size("members").alias("_n_old"),
                ).alias("w"),
                "cluster_rid",
                "left",
            )
            .filter(
                F.col("_n_old").isNull()
                | (F.size(F.col("m.members")) != F.col("_n_old"))
            )
            .select(
                "cluster_rid", "label", "lat", "lon", "sources", "members", "types"
            )
            .localCheckpoint(eager=False)
        )

        self.reps.apply_delta(merged, removed, ["cluster_rid"], batch_id)

        new_post = merged.select(
            self._label(F.col("label")).alias("block"), "cluster_rid"
        )
        del_post = post.join(new_post, ["block", "cluster_rid"], "left_anti")
        self.rep_blocks.apply_delta(
            new_post, del_post, ["block", "cluster_rid"], batch_id
        )

        self.assignments.upsert(
            merged.select(
                F.col("cluster_rid"), F.explode("members").alias("rid")
            ).select("rid", "cluster_rid"),
            ["rid"],
            batch_id,
        )

        merged_members = removed.union(changed_kept.select("cluster_rid"))
        next_dirty = (
            workset.join(
                merged_members.withColumnRenamed("cluster_rid", "rid"),
                "rid",
                "left_semi",
            )
            .select(self._label(F.col("label")).alias("block"))
            .union(changed_kept.select(self._label(F.col("label")).alias("block")))
            .distinct()
        )
        consumed = prev_dirty.join(next_dirty, "block", "left_anti")
        self.dirty.apply_delta(next_dirty, consumed, ["block"], batch_id)

        if self.prune_every and batch_id % self.prune_every == self.prune_every - 1:
            for st in self._tables:
                st.prune(keep_last=3)
        self._log(batch_id, n_rows, t0)

    def _log(
        self, batch_id: int, n_rows: int, t0: float, replayed: bool = False
    ) -> None:
        dur = time.time() - t0
        rec = {
            "batch_id": batch_id,
            "rows": n_rows,
            "seconds": round(dur, 3),
            "rows_per_sec": round(n_rows / dur, 1) if dur > 0 else None,
            "replayed": replayed,
        }
        with open(self.metrics_path, "a") as f:
            f.write(json.dumps(rec) + "\n")

    # -- stream wiring -------------------------------------------------------

    def start(
        self,
        input_dir: str,
        checkpoint_dir: str,
        max_files_per_trigger: int = 1,
    ):
        """Wire a parquet wave stream (one file per increment) to the batch
        kernel — the reference's per-increment Flink job restarts become
        micro-batch triggers."""
        stream = (
            self.spark.readStream.schema(GEO_WAVE_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .option("latestFirst", "false")
            .parquet(input_dir)
        )
        return (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )

    def result(self) -> DataFrame | None:
        """Final (rid, cluster_rid) assignment table."""
        return self.assignments.read()
