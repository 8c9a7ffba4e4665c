"""Per-key stateful operators via ``applyInPandasWithState``.

The north rule calls for "union-find held in per-key state via
applyInPandasWithState, mirroring the reference's Flink clustering
operators". This module provides exactly that as a *within-block* streaming
clusterer: records stream in keyed by blocking key, each block's GroupState
holds its members (id, source, token set) plus a union-find forest, and
every trigger emits the block-local cluster assignment updates.

Cross-block unions (one conversation appearing in several blocks/bands) are
reconciled downstream in the ``foreachBatch`` job (``streaming/job.py``),
which is the documented hard part (SURVEY.md §7: "two blocks discover the
same entity — resolve via a reconciliation join before the sink").

State is pickled into a single BinaryType column: Spark's state schema is
columnar, but a union-find forest + member signatures is an object graph;
one opaque blob per block keeps the state-store row count equal to the
number of active blocks (bounded, observable via metrics listeners).
"""

from __future__ import annotations

import pickle
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType([StructField("blob", BinaryType())])
OUTPUT_SCHEMA = StructType(
    [
        StructField("block_key", StringType()),
        StructField("rid", StringType()),
        StructField("cluster", StringType()),
        StructField("best_sim", DoubleType()),
    ]
)
INPUT_COLS = ["block_key", "rid", "source", "toks"]


def _jaccard(a: frozenset, b: frozenset) -> float:
    if not a and not b:
        return 0.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


def make_block_clusterer(
    threshold: float = 0.35,
    max_block_size: int = 256,
    idle_timeout_ms: int | None = None,
):
    """Returns the applyInPandasWithState function for block-local
    incremental union-find clustering.

    Scale bounds (mirroring the batch pipeline's stop-block discipline,
    ``pipeline.DEFAULT_MAX_BLOCK_SIZE``):

    * per-key state holds at most ``max_block_size`` members — arrivals
      beyond the cap are dropped for that block (a hot prefix block is a
      stop block; its recall rides the LSH path), so the per-record scan is
      O(cap), never O(stream length);
    * with ``idle_timeout_ms`` set, blocks idle longer than the timeout are
      evicted from the state store (GroupStateTimeout.ProcessingTimeTimeout).
    """

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        block_key = key[0]
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            blob = state.get[0]
            st = pickle.loads(blob)
        else:
            st = {"members": {}, "parent": {}}
        members: dict = st["members"]  # rid -> (source, frozenset tokens)
        parent: dict = st["parent"]

        def find(x: str) -> str:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        def union(a: str, b: str) -> None:
            ra, rb = find(a), find(b)
            if ra == rb:
                return
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra

        touched: dict[str, float] = {}
        for pdf in pdfs:
            for r in pdf.itertuples(index=False):
                toks_raw = r.toks  # numpy array via Arrow — no truthiness
                rid, source = r.rid, int(r.source)
                if rid not in members and len(members) >= max_block_size:
                    continue  # stop-block: hot key stops accepting members
                toks = frozenset(toks_raw.tolist() if toks_raw is not None else [])
                members[rid] = (source, toks)
                parent.setdefault(rid, rid)
                best = touched.get(rid, 0.0)
                for other, (osrc, otoks) in members.items():
                    if other == rid or osrc == source:
                        continue
                    sim = _jaccard(toks, otoks)
                    if sim >= threshold:
                        union(rid, other)
                    if sim > best:
                        best = sim
                touched[rid] = best

        state.update((pickle.dumps(st),))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        if touched:
            # every member of a touched component gets (re-)emitted
            comps = {rid: find(rid) for rid in parent}
            dirty_roots = {comps[r] for r in touched}
            out = [
                (block_key, rid, comp, touched.get(rid, 0.0))
                for rid, comp in comps.items()
                if comp in dirty_roots
            ]
            yield pd.DataFrame(out, columns=["block_key", "rid", "cluster", "best_sim"])

    return fn


def stateful_block_clustering(
    records_stream: DataFrame,
    threshold: float = 0.35,
    max_block_size: int = 256,
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """Wire a keyed record stream (block_key, rid, source, toks) through the
    stateful clusterer. Update-mode output: block-local assignment updates.

    ``idle_timeout_ms`` evicts blocks idle longer than the duration
    (bounded state store at 10^12-turn scale); None keeps state forever
    (parity-testable, bounded per key by ``max_block_size``)."""
    timeout = (
        GroupStateTimeout.NoTimeout
        if idle_timeout_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return (
        records_stream.select(*INPUT_COLS)
        .groupBy("block_key")
        .applyInPandasWithState(
            make_block_clusterer(threshold, max_block_size, idle_timeout_ms),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=timeout,
        )
    )


def conversation_feature_stream(transcript_stream: DataFrame) -> DataFrame:
    """Turn-level stream → per-(micro-batch, conversation) record updates with
    blocking key + token set, for feeding the stateful clusterer.

    Note: aggregates within each micro-batch only (turns of one conversation
    arriving in later batches yield refreshed records — the stateful
    clusterer unions monotonically, exactly like the reference's
    VERTEX_ADDITION step)."""
    from mapping_analysis_spark.functions.text import (
        blocking_key,
        distinct_tokens,
        normalize_text,
    )

    rec = transcript_stream.groupBy("conv_id").agg(
        F.min_by("text", "turn_idx").alias("label_raw"),
        F.array_join(F.collect_list("text"), " ").alias("doc_raw"),
    )
    source = F.coalesce(
        F.nullif(F.regexp_extract("conv_id", "_s([0-9]+)$", 1), F.lit("")), F.lit("0")
    ).cast("int")
    return rec.select(
        F.col("conv_id").alias("rid"),
        source.alias("source"),
        blocking_key(normalize_text(F.col("label_raw"))).alias("block_key"),
        distinct_tokens(F.col("doc_raw")).alias("toks"),
    )
