"""Structured Streaming incremental MusicBrainz clustering job.

The streaming re-expression of the reference's real-data incremental loop
(``benchmark/musicbrainz/IncrementalMusicBenchmark.java:93-189`` +
``integration/IncrementalMusicClusteringTest.java:117-245``): record waves
(80% ids → +10% ids → +source 5 → +final 10%) arrive as micro-batches
through ``foreachBatch``; per wave, current representatives re-block with
the new singletons, admitted trigram > 0.6 edges are selected
source-disjointly and components collapse into merged representatives —
exactly the batch driver loop ``music.music_incremental_quality``, but with
versioned exactly-once state tables instead of the reference's
save-to-JSON-and-restart cycle.

Per-batch cost is **O(dirty blocks), not O(total state)** — and the pruning
is EXACT, not approximate, because of two structural facts:

* every representative carries exactly ONE blocking label
  (``Utils.getMusicBlockingLabel`` of its ATA), so candidate edges only ever
  connect same-block representatives and the source-disjoint union-find
  components are block-confined;
* the greedy selection is deterministic on its input, so a block whose
  representatives are unchanged since the previous wave and whose previous
  pass produced no merges is at a FIXPOINT — re-running it (as the batch
  driver does wholesale each phase) provably yields "no merges" again.

A block is therefore *dirty* iff it holds a new singleton this wave or held
any member of a component that merged last wave (old labels of the merged
constituents + the merged output's new label, which can differ — the
majority-vote ATA can move the representative to another block). Only dirty
blocks are read, scored, and re-selected; everything else carries over
untouched in the state tables. Final-table parity with the batch loop is
asserted by ``tests/test_music_streaming.py`` (0 mismatches + the published
incremental anchor F1 0.93364 territory).

State tables (``SnapshotStateTable`` — bucket-partitioned, delta-committed,
version-pinned; the Iceberg merge-on-read stand-in of ``streaming/sinks``):

* ``reps``        (cluster_rid) — current representatives
  (cluster_rid, ata, smask, members)
* ``rep_blocks``  (block, cluster_rid) — blocking-label posting list, the
  pruned path from a dirty label to its representative ids
* ``assignments`` (rid) — record → cluster, the exactly-once output sink
* ``dirty``       (block) — labels to re-examine next wave (small: shrinks
  to ∅ at fixpoint; read whole, version-pinned)

Every read that feeds a later commit is pinned ``before_batch`` and every
commit is idempotent per ``batch_id``, so a kill at any inter-commit
boundary replays to the identical state (same machinery the transcript job
proves in ``tests/test_streaming_crash_replay.py``).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from mapping_analysis_spark.music import (
    DEFAULT_BLOCKING_LENGTH,
    _merge_reps,
    _rep_blocked_scored_edges,
    music_blocking_label,
)
from mapping_analysis_spark.streaming.sinks import SnapshotStateTable

MUSIC_WAVE_SCHEMA = StructType(
    [
        StructField("rid", LongType()),
        StructField("ata", StringType()),
        StructField("smask", LongType()),
    ]
)


class MusicIncrementalJob:
    """Incremental MULTI music clustering driven by foreachBatch."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        blocking_length: int = DEFAULT_BLOCKING_LENGTH,
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
        return music_blocking_label(col, self.blocking_length)

    # -- per-batch kernel ----------------------------------------------------

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        t0 = time.time()
        # the dirty table commits LAST → its marker is the batch's overall
        # exactly-once gate (earlier tables skip individually on replay)
        if self.dirty.committed(batch_id):
            self._log(batch_id, 0, t0, replayed=True)
            return

        batch_df = (
            batch_df.select("rid", "ata", "smask")
            .dropDuplicates(["rid"])
            .localCheckpoint(eager=True)  # streaming source: consume in-call
        )
        n_rows = batch_df.count()
        if n_rows == 0:
            for st in self._tables:
                st.commit_unchanged(batch_id)
            self._log(batch_id, 0, t0)
            return

        singles = batch_df.select(
            F.col("rid").alias("cluster_rid"),
            "ata",
            "smask",
            F.array(F.col("rid")).alias("members"),
        )

        # dirty labels = this wave's singleton labels ∪ labels left dirty by
        # the previous wave's merges (pinned: replay must not see this
        # batch's own dirty commit)
        prev_dirty = self.dirty.read(before_batch=batch_id)
        if prev_dirty is None:
            prev_dirty = self._empty("block string")
        touched = (
            singles.select(self._label(F.col("ata")).alias("block"))
            .union(prev_dirty.select("block"))
            .distinct()
            .localCheckpoint(eager=False)
        )

        # pruned path to the affected representatives: posting list → ids →
        # rep rows (both pinned — they feed this batch's deltas)
        post = self.rep_blocks.read_for(touched, before_batch=batch_id)
        if post is None:
            post = self._empty("block string, cluster_rid long")
        rep_ids = post.select("cluster_rid").distinct()
        reps_tchd = self.reps.read_for(rep_ids, before_batch=batch_id)
        if reps_tchd is None:
            reps_tchd = self._empty(
                "cluster_rid long, ata string, smask long, members array<long>"
            )
        workset = (
            reps_tchd.unionByName(singles).localCheckpoint(eager=False)
        )

        # the batch kernel itself: blocked salted pair gen → vectorized
        # trigram admission > 0.6 → source-disjoint greedy selection →
        # merged representatives (identical code path to the batch loop)
        scored = _rep_blocked_scored_edges(workset, self.blocking_length)
        merged = _merge_reps(workset, scored).localCheckpoint(eager=True)

        # deltas vs the pre-batch state
        w_ids = workset.select("cluster_rid")
        removed = w_ids.join(
            merged.select("cluster_rid"), "cluster_rid", "left_anti"
        ).localCheckpoint(eager=False)
        # a component merged iff its kept id gained members or lost ids
        changed_kept = (
            merged.alias("m")
            .join(
                workset.select(
                    "cluster_rid", F.size("members").alias("_n_old")
                ).alias("w"),
                "cluster_rid",
                "left",
            )
            .filter(
                F.col("_n_old").isNull()
                | (F.size(F.col("m.members")) != F.col("_n_old"))
            )
            .select("cluster_rid", "ata", "smask", "members")
            .localCheckpoint(eager=False)
        )

        self.reps.apply_delta(merged, removed, ["cluster_rid"], batch_id)

        new_post = merged.select(
            self._label(F.col("ata")).alias("block"), "cluster_rid"
        )
        del_post = post.join(
            new_post, ["block", "cluster_rid"], "left_anti"
        )
        self.rep_blocks.apply_delta(
            new_post, del_post, ["block", "cluster_rid"], batch_id
        )

        # exactly-once output: every member of the workset's final reps
        self.assignments.upsert(
            merged.select(
                F.col("cluster_rid"), F.explode("members").alias("rid")
            ).select("rid", "cluster_rid"),
            ["rid"],
            batch_id,
        )

        # next wave's dirty labels: old labels of every member of a merged
        # component + the merged outputs' (possibly moved) new labels.
        # Unmerged blocks are at a deterministic fixpoint — exact pruning.
        merged_members = removed.union(changed_kept.select("cluster_rid"))
        next_dirty = (
            workset.join(merged_members, "cluster_rid", "left_semi")
            .select(self._label(F.col("ata")).alias("block"))
            .union(changed_kept.select(self._label(F.col("ata")).alias("block")))
            .distinct()
        )
        consumed = prev_dirty.join(next_dirty, "block", "left_anti")
        self.dirty.apply_delta(next_dirty, consumed, ["block"], batch_id)

        if self.prune_every and batch_id % self.prune_every == self.prune_every - 1:
            for st in self._tables:
                st.prune(keep_last=3)
        self._log(batch_id, n_rows, t0)

    def _log(self, batch_id: int, n_rows: int, t0: float, replayed: bool = False) -> None:
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
            self.spark.readStream.schema(MUSIC_WAVE_SCHEMA)
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
