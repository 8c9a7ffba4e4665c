"""Exactly-once keyed state tables / sinks for the streaming engine.

In production these are Iceberg tables written with idempotent ``MERGE INTO``
from ``foreachBatch`` (keyed on the natural key, e.g. ``(conv_id,
turn_idx)``), exactly as SURVEY.md §2.7 maps the reference's
``JSONDataSink`` (``io/impl/json/JSONDataSink.java:55-78``, WriteMode.
OVERWRITE between jobs). Iceberg jars are not available in this sandbox, so
this module provides a parquet-backed stand-in with the same contract:

* **Versioned snapshots** — every micro-batch commits a full/delta snapshot
  directory ``v{batch_id:010d}`` via write-to-tmp + atomic rename; a replayed
  batch (after failure/restart) sees its version already committed and skips
  → exactly-once output.
* **Keyed upsert semantics** — readers resolve the latest value per key.

The interface (``upsert/replace_where/snapshot/read``) is deliberately the
shape of the Iceberg calls it stands in for, so swapping the backend is a
one-module change.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


class SnapshotStateTable:
    """Versioned keyed state table with exactly-once batch commits.

    Each commit writes the *entire new state* as one snapshot (the parquet
    stand-in for an Iceberg MERGE commit). Reads return the latest committed
    snapshot. ``committed(batch_id)`` lets a replayed micro-batch skip all
    recomputation.
    """

    def __init__(self, spark: SparkSession, root: str, name: str) -> None:
        self.spark = spark
        self.root = os.path.join(root, name)
        os.makedirs(self.root, exist_ok=True)

    def _vdir(self, batch_id: int) -> str:
        return os.path.join(self.root, f"v{batch_id:010d}")

    def versions(self) -> list[int]:
        out = []
        for d in os.listdir(self.root):
            if d.startswith("v") and os.path.exists(os.path.join(self.root, d, "_SUCCESS")):
                out.append(int(d[1:]))
        return sorted(out)

    def committed(self, batch_id: int) -> bool:
        return os.path.exists(os.path.join(self._vdir(batch_id), "_SUCCESS"))

    def latest_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def read(self) -> DataFrame | None:
        """Latest committed snapshot, or None if the table is empty."""
        v = self.latest_version()
        if v is None:
            return None
        return self.spark.read.parquet(self._vdir(v))

    def commit(self, df: DataFrame, batch_id: int) -> None:
        """Atomically commit ``df`` as the state at ``batch_id``.

        Idempotent: a second commit for the same batch_id is a no-op (the
        replayed batch after a restart must not double-write).
        """
        if self.committed(batch_id):
            return
        final = self._vdir(batch_id)
        tmp = final + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        df.write.mode("overwrite").parquet(tmp)
        if self.committed(batch_id):  # lost a race with a concurrent replay
            shutil.rmtree(tmp)
            return
        os.replace(tmp, final)

    def upsert(self, new_rows: DataFrame, keys: list[str], batch_id: int) -> DataFrame:
        """MERGE: new rows win per key. Returns the new state (also commits)."""
        cur = self.read()
        if cur is None:
            out = new_rows.dropDuplicates(keys)
        else:
            out = cur.join(new_rows.select(keys).distinct(), keys, "left_anti").unionByName(
                new_rows.dropDuplicates(keys)
            )
        out = out.localCheckpoint(eager=True)
        self.commit(out, batch_id)
        return out

    def prune(self, keep_last: int = 3) -> None:
        """Drop old snapshots (Iceberg expire_snapshots analogue)."""
        vs = self.versions()
        for v in vs[:-keep_last] if len(vs) > keep_last else []:
            shutil.rmtree(self._vdir(v), ignore_errors=True)
