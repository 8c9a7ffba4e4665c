"""Structured Streaming incremental entity-matching + clustering job.

This is the streaming re-expression of the reference's incremental loop
(``benchmark/musicbrainz/IncrementalMusicBenchmark.java:93-189``: save
clusters to JSON, start a new Flink job per source increment, re-match, save
again). Micro-batches + versioned state tables + Spark checkpointing replace
the save-to-JSON-and-reload cycle (SURVEY.md §3.2).

Algorithm per micro-batch (``foreachBatch``):

1. upsert new turns into ``turns`` state, keyed ``(conv_id, turn_idx)``
2. A = conversations touched by this batch
3. rebuild conversation records for A only; upsert into ``records`` /
   ``bands`` (MinHash band index) state
4. candidate pairs touching A = prefix-block join ∪ LSH-band join against
   the *current* index (the reference's SOURCE_ADDITION step,
   ``SourceAdditionClustering.java:62-191``)
5. verify with token-set Jaccard >= threshold → new edges; **replace** all
   edges incident to A (a changed conversation re-derives its whole edge
   set, so the final edge set equals the batch pipeline's on final records)
6. incremental connected components with *dirty-component recompute*: only
   components containing an affected node are re-solved; untouched
   components are carried over unchanged — deletions (an edge that no
   longer clears the threshold) are handled correctly because every removed
   edge touches A and therefore lives in a dirty component
7. emit ``(conv_id, cluster_id)`` upserts through the exactly-once keyed
   sink

Every state commit is idempotent per ``batch_id`` (atomic rename; replayed
batches skip), so a job killed at any point resumes from the Spark
checkpoint and produces the identical final table — verified by
``tests/test_streaming_parity.py`` against the batch oracle.

Invariant (BASELINE.json north_rule): for the same input stream + watermark
the final sink equals the batch pipeline row-for-row under stable
``(conv_id, turn_idx)`` ordering.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from mapping_analysis_spark.functions.simfns import make_minhash_udf
from mapping_analysis_spark.functions.text import (
    blocking_key,
    distinct_tokens,
    token_set_jaccard,
)
from mapping_analysis_spark.operators.clustering import connected_components
from mapping_analysis_spark.pipeline import (
    DEFAULT_BLOCK_LENGTH,
    DEFAULT_LSH_BANDS,
    DEFAULT_MAX_BLOCK_SIZE,
    DEFAULT_THRESHOLD,
    block_keys_array,
    conversation_records,
)
from mapping_analysis_spark.streaming.sinks import SnapshotStateTable

TRANSCRIPT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("role", StringType()),
        StructField("text", StringType()),
        StructField("tool", StringType()),
        StructField("ts", TimestampType()),
    ]
)


class IncrementalClusteringJob:
    """Stateful incremental matcher/clusterer driven by foreachBatch."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        threshold: float = DEFAULT_THRESHOLD,
        block_length: int = DEFAULT_BLOCK_LENGTH,
        lsh_bands: int = DEFAULT_LSH_BANDS,
        max_block_size: int = DEFAULT_MAX_BLOCK_SIZE,
    ) -> None:
        self.spark = spark
        self.threshold = threshold
        self.block_length = block_length
        self.lsh_bands = lsh_bands
        self.max_block_size = max_block_size
        self.turns = SnapshotStateTable(spark, state_dir, "turns")
        self.records = SnapshotStateTable(spark, state_dir, "records")
        self.bands = SnapshotStateTable(spark, state_dir, "bands")
        self.edges = SnapshotStateTable(spark, state_dir, "edges")
        self.comps = SnapshotStateTable(spark, state_dir, "comps")
        self.assignments = SnapshotStateTable(spark, state_dir, "assignments")
        self.metrics_path = os.path.join(state_dir, "metrics.jsonl")
        self.state_metrics_every = 5
        self._minhash = make_minhash_udf(num_hashes=lsh_bands, shingle_width=1)

    # -- per-batch kernel ---------------------------------------------------

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        t0 = time.time()
        if self.assignments.committed(batch_id):
            self._log(batch_id, 0, t0, replayed=True)
            return  # exactly-once: replay after restart is a no-op

        # per-partition lineage: physical files feeding this micro-batch
        input_files = [
            r[0]
            for r in batch_df.select(F.input_file_name()).distinct().limit(20).collect()
            if r[0]
        ]
        batch_df = batch_df.dropDuplicates(["conv_id", "turn_idx"]).localCheckpoint(
            eager=True
        )
        n_rows = batch_df.count()
        if n_rows == 0:
            # empty deltas keep replay detection monotonic at zero data cost
            for st in (self.turns, self.records, self.bands, self.edges, self.comps,
                       self.assignments):
                st.commit_unchanged(batch_id)
            self._log(batch_id, 0, t0)
            return

        # 1-2. turn state + affected conversations
        turns = self.turns.upsert(batch_df, ["conv_id", "turn_idx"], batch_id)
        affected = batch_df.select("conv_id").distinct()
        old_records = self.records.read()  # pre-upsert snapshot (cap crossings)

        # 3. re-derive records for affected conversations only
        recs_full = conversation_records(
            turns.join(F.broadcast(affected), "conv_id", "left_semi")
        )
        # identical featurization to pipeline.featurize_records (hashed int64
        # tokens; shingle hash = hash-combine of 3 consecutive token hashes —
        # MUST stay in lockstep with the batch path for streaming==batch
        # parity)
        recs_full = recs_full.withColumn("bks", block_keys_array(self.block_length))
        recs_full = recs_full.withColumn(
            "_th",
            F.transform(
                F.filter(F.split(F.col("doc"), " "), lambda t: t != F.lit("")),
                lambda t: F.xxhash64(t),
            ),
        )
        recs_full = recs_full.withColumn("toks", F.array_distinct(F.col("_th")))
        recs_full = (
            recs_full.withColumn(
                "sg",
                F.array_distinct(
                    F.transform(
                        F.sequence(
                            F.lit(1), F.greatest(F.lit(1), F.size(F.col("_th")) - 2)
                        ),
                        lambda i: F.pmod(
                            F.xxhash64(
                                F.try_element_at(F.col("_th"), i),
                                F.try_element_at(F.col("_th"), i + 1),
                                F.try_element_at(F.col("_th"), i + 2),
                            ),
                            F.lit(4294967296),
                        ),
                    )
                ),
            )
            .drop("_th")
            .select("rid", "source", "bks", "toks", "sg")
            .localCheckpoint(eager=True)
        )
        recs_a = recs_full.select("rid", "source", "bks", "toks")
        records = self.records.upsert(recs_a, ["rid"], batch_id)

        # same LSH feature as the batch pipeline: MinHash over word 3-shingles
        bands_a = recs_full.select(
            "rid",
            F.posexplode(
                F.transform(
                    self._minhash(F.col("sg")), lambda h: F.xxhash64(h.cast("string"))
                )
            ).alias("band_idx", "band_hash"),
        )
        bands = self.bands.upsert(bands_a, ["rid", "band_idx"], batch_id)

        # 4a. stop-block pruning + cap-crossing detection: when a block's
        # size crosses max_block_size (either direction), every member's edge
        # set must be re-derived so the final edge set equals the batch
        # pipeline's on the final records (prefix pairs appear/disappear).
        def _exploded(df: DataFrame) -> DataFrame:
            return df.select("rid", F.explode("bks").alias("bk"))

        changed_blocks = _exploded(recs_a).select("bk")
        if old_records is not None:
            changed_blocks = changed_blocks.union(
                _exploded(
                    old_records.join(
                        F.broadcast(affected.withColumnRenamed("conv_id", "rid")),
                        "rid",
                        "left_semi",
                    )
                ).select("bk")
            )
        changed_blocks = changed_blocks.distinct()
        new_sz = (
            _exploded(records)
            .groupBy("bk")
            .agg(F.count("*").alias("n_new"))
            .join(F.broadcast(changed_blocks), "bk", "left_semi")
        )
        if old_records is not None:
            old_sz = (
                _exploded(old_records)
                .groupBy("bk")
                .agg(F.count("*").alias("n_old"))
                .join(F.broadcast(changed_blocks), "bk", "left_semi")
            )
            sz = new_sz.join(old_sz, "bk", "left").fillna({"n_old": 0})
        else:
            sz = new_sz.withColumn("n_old", F.lit(0))
        cap = self.max_block_size
        crossed = sz.filter(
            (F.col("n_old") <= cap) != (F.col("n_new") <= cap)
        ).select("bk")
        extra = (
            _exploded(records)
            .join(F.broadcast(crossed), "bk", "left_semi")
            .select("rid")
            .distinct()
            .join(
                F.broadcast(affected.withColumnRenamed("conv_id", "rid")),
                "rid",
                "left_anti",
            )
        )
        a_ids = (
            recs_a.select(F.col("rid")).union(extra.select("rid")).distinct()
            .select(F.col("rid").alias("x"))
            .localCheckpoint(eager=True)
        )

        # 4b. candidates touching the re-derive set (prefix blocks ∪ LSH
        # bands, against the full index), oversized blocks excluded
        exploded_all = _exploded(records).localCheckpoint(eager=True)
        ok_blocks = (
            exploded_all.groupBy("bk")
            .agg(F.count("*").alias("_bn"))
            .filter(F.col("_bn") <= cap)
            .select("bk")
        )
        blk = exploded_all.join(F.broadcast(ok_blocks), "bk", "left_semi")
        p_block = (
            blk.join(F.broadcast(a_ids.withColumnRenamed("x", "rid")), "rid", "left_semi")
            .alias("a")
            .join(blk.alias("b"), F.col("a.bk") == F.col("b.bk"))
            .filter(F.col("a.rid") != F.col("b.rid"))
            .select(
                F.least("a.rid", "b.rid").alias("a_rid"),
                F.greatest("a.rid", "b.rid").alias("b_rid"),
            )
        )
        bands_x = bands.join(
            F.broadcast(a_ids.withColumnRenamed("x", "rid")), "rid", "left_semi"
        )
        p_band = (
            bands_x.alias("a")
            .join(
                bands.alias("b"),
                (F.col("a.band_idx") == F.col("b.band_idx"))
                & (F.col("a.band_hash") == F.col("b.band_hash")),
            )
            .filter(F.col("a.rid") != F.col("b.rid"))
            .select(
                F.least("a.rid", "b.rid").alias("a_rid"),
                F.greatest("a.rid", "b.rid").alias("b_rid"),
            )
        )
        cand = p_block.union(p_band).dropDuplicates(["a_rid", "b_rid"])

        # 5. verify + replace edges incident to A
        ra = records.select(
            F.col("rid").alias("a_rid"),
            F.col("source").alias("a_source"),
            F.col("toks").alias("a_toks"),
        )
        rb = records.select(
            F.col("rid").alias("b_rid"),
            F.col("source").alias("b_source"),
            F.col("toks").alias("b_toks"),
        )
        e_new = (
            cand.join(ra, "a_rid")
            .join(rb, "b_rid")
            .filter(F.col("a_source") != F.col("b_source"))
            .withColumn("sim", token_set_jaccard(F.col("a_toks"), F.col("b_toks")))
            .filter(F.col("sim") >= F.lit(self.threshold))
            .select(F.col("a_rid").alias("a"), F.col("b_rid").alias("b"))
        )
        # delta commit: upsert this batch's edges, tombstone previously-stored
        # edges incident to the re-derive set that no longer verify —
        # O(batch-incident edges) written, not O(total edge state)
        e_new = e_new.dropDuplicates(["a", "b"]).localCheckpoint(eager=True)
        old_edges = self.edges.read()
        removed = None
        if old_edges is not None:
            # two hash semi-joins (one per endpoint) — an OR-condition semi
            # join would plan as a nested loop, O(E·|A|) per batch
            ax = a_ids.withColumnRenamed("x", "a")
            bx = a_ids.withColumnRenamed("x", "b")
            old_inc = (
                old_edges.select("a", "b").join(F.broadcast(ax), "a", "left_semi")
                .unionByName(
                    old_edges.select("a", "b").join(F.broadcast(bx), "b", "left_semi")
                )
                .dropDuplicates(["a", "b"])
            )
            removed = old_inc.join(e_new, ["a", "b"], "left_anti")
        edges_all = self.edges.apply_delta(
            e_new, removed, ["a", "b"], batch_id
        ).localCheckpoint(eager=True)

        # 6. dirty-component recompute (scope: full re-derive set + new-edge
        # endpoints — includes cap-crossing block members)
        old_comps = self.comps.read()
        dirty_nodes = (
            a_ids.withColumnRenamed("x", "node")
            .union(e_new.select(F.col("a").alias("node")))
            .union(e_new.select(F.col("b").alias("node")))
            .distinct()
        )
        if old_comps is not None:
            dirty_comp_ids = (
                old_comps.join(dirty_nodes, "node", "left_semi")
                .select("comp")
                .distinct()
            )
            dirty_members = old_comps.join(dirty_comp_ids, "comp", "left_semi").select(
                "node"
            )
        else:
            dirty_members = self.spark.createDataFrame([], "node string")
        scope = dirty_members.union(dirty_nodes.select("node")).distinct()
        sub_edges = (
            edges_all.join(scope.withColumnRenamed("node", "a"), "a", "left_semi")
            .union(edges_all.join(scope.withColumnRenamed("node", "b"), "b", "left_semi"))
            .dropDuplicates(["a", "b"])
        )
        recomputed = connected_components(sub_edges)
        # nodes in scope with no edges → singleton components
        singles = scope.join(
            recomputed.select("node"), "node", "left_anti"
        ).withColumn("comp", F.col("node"))
        new_part = recomputed.union(singles).localCheckpoint(eager=True)
        # delta commit: only the recomputed (dirty) partition is written —
        # clean components carry over untouched in the state table
        self.comps.apply_delta(new_part, None, ["node"], batch_id)

        # 7. exactly-once assignment upsert for the recomputed scope
        updates = new_part.select(
            F.col("node").alias("conv_id"), F.col("comp").alias("cluster_id")
        )
        self.assignments.upsert(updates, ["conv_id"], batch_id)
        for st in (self.turns, self.records, self.bands, self.edges, self.comps,
                   self.assignments):
            st.prune(keep_last=3)
        self._log(batch_id, n_rows, t0, input_files=input_files)

    # -- metrics (north rule: per-partition lineage + throughput per batch) --

    def _log(self, batch_id: int, n_rows: int, t0: float, replayed: bool = False,
             input_files: list[str] | None = None) -> None:
        dur = time.time() - t0
        rec = {
            "batch_id": batch_id,
            "rows": n_rows,
            "seconds": round(dur, 3),
            "rows_per_sec": round(n_rows / dur, 1) if dur > 0 else None,
            "replayed": replayed,
            "lineage_files": (input_files or [])[:20],
        }
        # state-size metrics are full-table counts — sample them instead of
        # paying two extra jobs on EVERY micro-batch (scale: 10^12 turns)
        if batch_id % self.state_metrics_every == 0 and not replayed:
            rec["state_rows"] = {
                name: (st.read().count() if st.read() is not None else 0)
                for name, st in [("edges", self.edges), ("comps", self.comps)]
            }
        with open(self.metrics_path, "a") as f:
            f.write(json.dumps(rec) + "\n")

    # -- stream wiring --------------------------------------------------------

    def start(
        self,
        input_dir: str,
        checkpoint_dir: str,
        max_files_per_trigger: int = 1,
        watermark: str = "1 hour",
    ):
        """Wire the file stream (Iceberg-source stand-in) to the batch kernel."""
        stream = (
            self.spark.readStream.schema(TRANSCRIPT_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(input_dir)
            .withWatermark("ts", watermark)
        )
        return (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )

    def result(self) -> DataFrame | None:
        """Final (conv_id, cluster_id) assignment table."""
        return self.assignments.read()
