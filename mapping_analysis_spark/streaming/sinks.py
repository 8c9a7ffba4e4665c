"""Exactly-once keyed state tables / sinks for the streaming engine.

In production these are Iceberg tables written with idempotent ``MERGE INTO``
from ``foreachBatch`` (keyed on the natural key, e.g. ``(conv_id,
turn_idx)``), exactly as SURVEY.md §2.7 maps the reference's
``JSONDataSink`` (``io/impl/json/JSONDataSink.java:55-78``). Iceberg jars are
not available in this sandbox, so this module provides a parquet-backed
stand-in with the same contract — and, critically, the same COST MODEL as an
Iceberg merge-on-read table:

* **Delta commits** — each micro-batch appends one delta directory
  ``d{batch_id}`` holding only that batch's upserts and delete tombstones
  (the analogue of Iceberg's data + delete files). Per-batch bytes written
  are O(batch), NOT O(total state) — asserted by
  ``tests/test_evaluation_sinks.py::test_upsert_writes_are_delta_sized``.
* **Atomic, idempotent versions** — every directory commits via
  write-to-tmp + atomic rename; a replayed batch (after failure/restart)
  sees its version already committed and skips → exactly-once output.
* **Merge-on-read** — readers resolve the latest row per key across the
  base snapshot and newer deltas (latest batch wins; tombstones drop rows).
* **Compaction** — after ``compact_every`` deltas a commit folds everything
  into a new base snapshot ``b{batch_id}`` (Iceberg's rewrite_data_files),
  bounding read amplification.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_OP = "_op"  # 'u' upsert, 'd' delete tombstone
_BATCH = "_batch"


class SnapshotStateTable:
    """Keyed state table with exactly-once delta commits (Iceberg
    merge-on-read stand-in). Keys are fixed per table at first write."""

    def __init__(
        self, spark: SparkSession, root: str, name: str, compact_every: int = 8
    ) -> None:
        self.spark = spark
        self.root = os.path.join(root, name)
        self.compact_every = compact_every
        os.makedirs(self.root, exist_ok=True)

    # -- directory layout ----------------------------------------------------

    def _dir(self, kind: str, batch_id: int) -> str:
        return os.path.join(self.root, f"{kind}{batch_id:010d}")

    def _committed_dirs(self) -> list[tuple[str, int]]:
        out = []
        for d in os.listdir(self.root):
            if (
                len(d) == 11
                and d[0] in ("b", "d")
                and os.path.exists(os.path.join(self.root, d, "_SUCCESS"))
            ):
                out.append((d[0], int(d[1:])))
        return sorted(out, key=lambda kd: kd[1])

    def versions(self) -> list[int]:
        return [b for _, b in self._committed_dirs()]

    def committed(self, batch_id: int) -> bool:
        return os.path.exists(
            os.path.join(self._dir("b", batch_id), "_SUCCESS")
        ) or os.path.exists(os.path.join(self._dir("d", batch_id), "_SUCCESS"))

    def latest_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def _atomic_write(self, df: DataFrame, final: str) -> None:
        tmp = final + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        df.write.mode("overwrite").parquet(tmp)
        if os.path.exists(os.path.join(final, "_SUCCESS")):
            shutil.rmtree(tmp)  # lost a race with a concurrent replay
            return
        os.replace(tmp, final)

    # -- reads (merge-on-read) ----------------------------------------------

    def _resolve(self, dirs: list[tuple[str, int]]) -> DataFrame | None:
        """Latest-batch-wins per key across base + deltas; tombstones drop."""
        if not dirs:
            return None
        # start from the newest base — older history is fully folded into it
        base_ix = max(
            (i for i, (k, _) in enumerate(dirs) if k == "b"), default=None
        )
        live = dirs if base_ix is None else dirs[base_ix:]
        parts = []
        for kind, b in live:
            parts.append(self.spark.read.parquet(self._dir(kind, b)))
        df = parts[0]
        for p in parts[1:]:
            # pure-delete deltas carry only key columns — value columns fill
            # with nulls and never surface (tombstones lose the window race)
            df = df.unionByName(p, allowMissingColumns=True)
        keys = [c for c in df.columns if c.startswith("_k_")]
        w_cols = [c for c in df.columns if c not in (_OP, _BATCH)]
        if not keys:
            # keyless (full-snapshot) table: the newest base IS the state;
            # deltas on keyless tables are only the empty commit_unchanged
            # markers
            return df.filter(F.col(_OP) == "u").select(*w_cols)
        from pyspark.sql import Window

        w = Window.partitionBy(*keys).orderBy(F.col(_BATCH).desc())
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .filter((F.col("_rn") == 1) & (F.col(_OP) == "u"))
            .select(*w_cols)
        )

    def read(self) -> DataFrame | None:
        """Current state (latest committed view), or None if empty.

        Key columns come back under their original names (the ``_k_``
        prefix is internal)."""
        out = self._resolve(self._committed_dirs())
        if out is None:
            return None
        for c in out.columns:
            if c.startswith("_k_"):
                out = out.withColumnRenamed(c, c[3:])
        return out

    # -- writes ---------------------------------------------------------------

    def _tag(self, df: DataFrame, keys: list[str], batch_id: int, op: str) -> DataFrame:
        out = df
        for k in keys:
            out = out.withColumnRenamed(k, f"_k_{k}")
        return out.withColumn(_OP, F.lit(op)).withColumn(_BATCH, F.lit(batch_id))

    def apply_delta(
        self,
        upserts: DataFrame | None,
        deletes: DataFrame | None,
        keys: list[str],
        batch_id: int,
    ) -> DataFrame:
        """Commit one micro-batch's changes: ``upserts`` replace their keys,
        ``deletes`` (key columns only) tombstone theirs. O(batch) bytes.
        Returns the post-commit state. Idempotent per batch_id."""
        if self.committed(batch_id):
            return self.read()
        parts = []
        if upserts is not None:
            parts.append(self._tag(upserts.dropDuplicates(keys), keys, batch_id, "u"))
        if deletes is not None and upserts is not None:
            # a key both deleted and re-upserted keeps the upsert
            deletes = deletes.join(upserts.select(keys), keys, "left_anti")
        if deletes is not None:
            parts.append(self._tag(deletes.dropDuplicates(keys), keys, batch_id, "d"))
        if not parts:
            raise ValueError("apply_delta needs upserts and/or deletes")
        delta = parts[0]
        for p in parts[1:]:
            delta = delta.unionByName(p, allowMissingColumns=True)
        dirs = self._committed_dirs()
        base_ix = max((i for i, (k, _) in enumerate(dirs) if k == "b"), default=-1)
        n_deltas = len(dirs) - base_ix - 1
        if n_deltas + 1 >= self.compact_every:
            # fold history + this delta into a fresh base snapshot
            # (Iceberg rewrite_data_files) — bounds read amplification
            cur = self._resolve(dirs)
            if cur is None:
                base = delta.filter(F.col(_OP) == "u")
            else:
                keyed_cols = [f"_k_{k}" for k in keys]
                survivors = cur.join(
                    delta.select(*keyed_cols).dropDuplicates(), keyed_cols, "left_anti"
                )
                base = survivors.withColumn(_OP, F.lit("u")).withColumn(
                    _BATCH, F.lit(batch_id)
                ).unionByName(delta.filter(F.col(_OP) == "u"), allowMissingColumns=True)
            self._atomic_write(base, self._dir("b", batch_id))
        else:
            self._atomic_write(delta, self._dir("d", batch_id))
        return self.read()

    def upsert(self, new_rows: DataFrame, keys: list[str], batch_id: int) -> DataFrame:
        """MERGE: new rows win per key. Returns the new state."""
        return self.apply_delta(new_rows, None, keys, batch_id)

    def commit(self, df: DataFrame, batch_id: int) -> None:
        """Full-state commit (base snapshot). For state that is genuinely
        recomputed wholesale; prefer ``apply_delta`` for keyed changes."""
        if self.committed(batch_id):
            return
        tagged = self._tag(df, [], batch_id, "u")
        self._atomic_write(tagged, self._dir("b", batch_id))

    def commit_unchanged(self, batch_id: int) -> None:
        """Mark a batch committed with zero data movement (empty delta)."""
        if self.committed(batch_id):
            return
        cur = self._committed_dirs()
        if not cur:
            return
        kind, b = cur[-1]
        empty = self.spark.read.parquet(self._dir(kind, b)).limit(0)
        self._atomic_write(empty, self._dir("d", batch_id))

    def prune(self, keep_last: int = 3) -> None:
        """Drop history superseded by the newest base snapshot (Iceberg
        expire_snapshots analogue): everything older than the latest base,
        keeping at least ``keep_last`` committed versions."""
        dirs = self._committed_dirs()
        base_ix = max((i for i, (k, _) in enumerate(dirs) if k == "b"), default=None)
        if base_ix is None:
            return
        cut = min(base_ix, max(0, len(dirs) - keep_last))
        for kind, b in dirs[:cut]:
            shutil.rmtree(self._dir(kind, b), ignore_errors=True)
