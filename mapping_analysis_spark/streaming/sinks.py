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
* **Bucket partitioning** — tables declare ``bucket_by`` key columns; every
  committed directory is hive-partitioned on ``_bucket =
  pmod(xxhash64(bucket_by), num_buckets)`` (Iceberg's ``bucket(N, key)``
  transform). ``read_for(keys)`` prunes to the partitions holding the
  requested keys, so per-batch READS are O(touched buckets), not O(total
  state) — asserted by ``tests/test_streaming_scan_volume.py``.
* **Atomic, idempotent versions** — every directory commits via
  write-to-tmp + atomic rename; a replayed batch (after failure/restart)
  sees its version already committed and skips → exactly-once output.
* **Merge-on-read** — readers resolve the latest row per key across the
  base snapshot and newer deltas (latest batch wins; tombstones drop rows).
* **Compaction** — after ``compact_every`` deltas a commit folds everything
  into a new base snapshot ``b{batch_id}`` (Iceberg's rewrite_data_files).
  This is the one O(state) write; it is amortized (every ``compact_every``
  batches), exactly like Iceberg table maintenance, and is accounted
  separately from per-batch scan volume (``scan_stats['compact_rows']``).

When real Iceberg jars ARE on the classpath, :class:`IcebergStateTable`
(same interface, ``MERGE INTO`` + ``bucket(N, key)`` partitioning) is the
production implementation — see ``make_state_table``.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_OP = "_op"  # 'u' upsert, 'd' delete tombstone
_BATCH = "_batch"
_BUCKET = "_bucket"


def _has_parquet(d: str) -> bool:
    for r, _, fs in os.walk(d):
        if any(f.endswith(".parquet") for f in fs):
            return True
    return False


class SnapshotStateTable:
    """Keyed state table with exactly-once delta commits (Iceberg
    merge-on-read stand-in). Keys are fixed per table at first write.

    ``bucket_by`` (a subset of the key columns, required for ``read_for``)
    enables Iceberg-style bucket partition pruning: directories are
    partitioned on ``pmod(xxhash64(*bucket_by), num_buckets)`` and pruned
    reads touch only the buckets of the requested keys."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        name: str,
        compact_every: int = 8,
        bucket_by: list[str] | None = None,
        num_buckets: int = 32,
        track_scans: bool = False,
    ) -> None:
        self.spark = spark
        self.root = os.path.join(root, name)
        self.compact_every = compact_every
        self.bucket_by = list(bucket_by) if bucket_by else None
        self.num_buckets = num_buckets
        self.track_scans = track_scans
        self.scan_stats = {"read_rows": 0, "read_calls": 0, "compact_rows": 0}
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
        if self.bucket_by and _BUCKET in df.columns:
            # one task per bucket → ≤ num_buckets files per commit (a
            # partitionBy write without the repartition writes
            # tasks × buckets small files)
            (
                df.repartition(self.num_buckets, F.col(_BUCKET))
                .write.mode("overwrite")
                .partitionBy(_BUCKET)
                .parquet(tmp)
            )
        else:
            df.write.mode("overwrite").parquet(tmp)
        if os.path.exists(os.path.join(final, "_SUCCESS")):
            shutil.rmtree(tmp)  # lost a race with a concurrent replay
            return
        os.replace(tmp, final)

    def _bucket_expr(self, cols: list[str]):
        return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(self.num_buckets)).cast(
            "int"
        )

    # -- reads (merge-on-read) ----------------------------------------------

    def _resolve(
        self,
        dirs: list[tuple[str, int]],
        buckets: list[int] | None = None,
        keys_df: DataFrame | None = None,
        keep_bucket: bool = False,
        before_batch: int | None = None,
        keep_meta: bool = False,
    ) -> DataFrame | None:
        """Latest-batch-wins per key across base + deltas; tombstones drop.

        ``buckets`` prunes partition directories; ``keys_df`` (columns =
        ``bucket_by``) additionally semi-join-filters to the requested keys
        before the merge-on-read window — both keep the resolve O(touched
        state) instead of O(total state).

        ``before_batch`` pins the read to the state as of BEFORE that batch
        (rows stamped ``_BATCH < before_batch``) — the Iceberg
        snapshot-as-of analogue. Used for pre-commit snapshot reads inside a
        batch: a no-op on the original run (the table holds nothing from the
        in-flight batch yet) and exactly the pre-batch state under replay
        after a mid-batch crash. Requires compaction to preserve original
        ``_BATCH`` stamps (it does — see ``apply_delta``).

        ``keep_meta`` keeps the ``_OP``/``_BATCH``/``_BUCKET`` columns in
        the output (compaction needs the original stamps)."""
        if not dirs:
            return None
        # start from the newest base — older history is fully folded into it
        base_ix = max(
            (i for i, (k, _) in enumerate(dirs) if k == "b"), default=None
        )
        live = dirs if base_ix is None else dirs[base_ix:]
        parts = []
        for kind, b in live:
            d = self._dir(kind, b)
            if not _has_parquet(d):
                continue  # empty delta (no rows in any bucket) — schema-free
            parts.append(self.spark.read.parquet(d))
        if not parts:
            return None
        df = parts[0]
        for p in parts[1:]:
            # pure-delete deltas carry only key columns — value columns fill
            # with nulls and never surface (tombstones lose the window race)
            df = df.unionByName(p, allowMissingColumns=True)
        if before_batch is not None:
            df = df.filter(F.col(_BATCH) < F.lit(before_batch))
        if buckets is not None and _BUCKET in df.columns:
            df = df.filter(F.col(_BUCKET).isin(buckets))  # partition pruning
        if keys_df is not None:
            on = [f"_k_{c}" for c in self.bucket_by]
            kdf = keys_df
            for c in self.bucket_by:
                kdf = kdf.withColumnRenamed(c, f"_k_{c}")
            df = df.join(F.broadcast(kdf.select(*on).distinct()), on, "left_semi")
        if self.track_scans:
            self.scan_stats["read_rows"] += df.count()
            self.scan_stats["read_calls"] += 1
        keys = [c for c in df.columns if c.startswith("_k_")]
        drop = set() if keep_meta else ({_OP, _BATCH} | (set() if keep_bucket else {_BUCKET}))
        w_cols = [c for c in df.columns if c not in drop]
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

    def _unprefix(self, out: DataFrame) -> DataFrame:
        for c in out.columns:
            if c.startswith("_k_"):
                out = out.withColumnRenamed(c, c[3:])
        return out

    def read(self) -> DataFrame | None:
        """Current FULL state (latest committed view), or None if empty.
        O(total state) — for final results / compaction, not per-batch use.

        Key columns come back under their original names (the ``_k_``
        prefix is internal)."""
        out = self._resolve(self._committed_dirs())
        return None if out is None else self._unprefix(out)

    def read_for(
        self, keys_df: DataFrame, before_batch: int | None = None
    ) -> DataFrame | None:
        """Pruned state read: only rows whose ``bucket_by`` key appears in
        ``keys_df`` (whose columns must be exactly ``bucket_by``). Partition
        pruning limits the scan to touched buckets; the broadcast semi-join
        limits resolved rows to the requested keys — per-batch read cost is
        O(keys touched), independent of total state size.

        ``before_batch=b`` pins to the pre-batch-``b`` snapshot — REQUIRED
        for every read whose result feeds deltas committed later in the same
        batch (replay after a mid-batch crash would otherwise see the
        already-committed post-state and derive empty/doubled deltas)."""
        assert self.bucket_by, "read_for requires a bucket_by declaration"
        ids = [
            r[0]
            for r in keys_df.select(
                self._bucket_expr(self.bucket_by).alias("_b")
            )
            .distinct()
            .collect()
        ]
        if not ids:
            return None
        out = self._resolve(
            self._committed_dirs(), buckets=ids, keys_df=keys_df, before_batch=before_batch
        )
        return None if out is None else self._unprefix(out)

    # -- writes ---------------------------------------------------------------

    def _tag(self, df: DataFrame, keys: list[str], batch_id: int, op: str) -> DataFrame:
        out = df
        if self.bucket_by:
            missing = [c for c in self.bucket_by if c not in df.columns]
            assert not missing, f"bucket_by columns {missing} absent (must be ⊆ keys)"
            out = out.withColumn(_BUCKET, self._bucket_expr(self.bucket_by))
        for k in keys:
            out = out.withColumnRenamed(k, f"_k_{k}")
        return out.withColumn(_OP, F.lit(op)).withColumn(_BATCH, F.lit(batch_id))

    def apply_delta(
        self,
        upserts: DataFrame | None,
        deletes: DataFrame | None,
        keys: list[str],
        batch_id: int,
    ) -> None:
        """Commit one micro-batch's changes: ``upserts`` replace their keys,
        ``deletes`` (key columns only) tombstone theirs. O(batch) bytes.
        Idempotent per batch_id."""
        if self.committed(batch_id):
            return
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
            # (Iceberg rewrite_data_files) — the amortized O(state)
            # maintenance write, accounted under compact_rows.
            #
            # The base preserves ORIGINAL _BATCH stamps and keeps this
            # batch's delta rows (incl. tombstones) alongside the pre-batch
            # state: merge-on-read still picks the latest row per key, and a
            # version-pinned read (_BATCH < batch_id) recovers the exact
            # pre-batch snapshot — required for crash/replay correctness of
            # pre-commit snapshot reads (see read_for). The retained
            # pre-images (one per key touched this batch) fold away at the
            # next compaction.
            track, self.track_scans = self.track_scans, False
            prev = self._resolve(dirs, keep_bucket=True, keep_meta=True)
            self.track_scans = track
            if prev is not None and self.track_scans:
                self.scan_stats["compact_rows"] += prev.count()
            if prev is None:
                base = delta
            else:
                base = prev.unionByName(delta, allowMissingColumns=True)
            self._atomic_write(base, self._dir("b", batch_id))
        else:
            self._atomic_write(delta, self._dir("d", batch_id))

    def upsert(self, new_rows: DataFrame, keys: list[str], batch_id: int) -> None:
        """MERGE: new rows win per key."""
        self.apply_delta(new_rows, None, keys, batch_id)

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
        cur = [kb for kb in self._committed_dirs() if _has_parquet(self._dir(*kb))]
        if not cur:
            return
        kind, b = cur[-1]
        empty = self.spark.read.parquet(self._dir(kind, b)).limit(0)
        # written unpartitioned: a zero-row partitioned write emits no files
        # at all and the directory would read as schema-less
        empty = empty.drop(_BUCKET)
        tmp = self._dir("d", batch_id) + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        empty.write.mode("overwrite").parquet(tmp)
        final = self._dir("d", batch_id)
        if os.path.exists(os.path.join(final, "_SUCCESS")):
            shutil.rmtree(tmp)
            return
        os.replace(tmp, final)

    def prune(self, keep_last: int = 3) -> None:
        """Drop history superseded by the newest base snapshot (Iceberg
        expire_snapshots analogue): everything older than the latest base,
        keeping at least ``keep_last`` committed versions."""
        dirs = self._committed_dirs()
        base_ix = max(
            (i for i, (k, _) in enumerate(dirs) if k == "b"), default=None
        )
        if base_ix is None:
            return
        cut = min(base_ix, max(0, len(dirs) - keep_last))
        for kind, b in dirs[:cut]:
            shutil.rmtree(self._dir(kind, b), ignore_errors=True)

    def reset_scan_stats(self) -> dict:
        out = dict(self.scan_stats)
        self.scan_stats = {"read_rows": 0, "read_calls": 0, "compact_rows": 0}
        return out


class IcebergStateTable:
    """Real-Iceberg implementation of the state-table interface, selected by
    :func:`make_state_table` when Iceberg classes are on the classpath.

    Maps 1:1 onto the stand-in's contract:

    * table creation — ``CREATE TABLE ... PARTITIONED BY (bucket(N, key))``
      (the stand-in's ``_bucket`` hive partitioning);
    * ``apply_delta`` — one ``MERGE INTO`` with ``WHEN MATCHED [AND _op='d']
      THEN DELETE / UPDATE`` + ``WHEN NOT MATCHED AND _op='u' THEN INSERT``
      (the stand-in's tombstoned delta dirs); per-batch idempotence via a
      ``last_merged_batch`` table property checked before merging (the
      stand-in's ``_SUCCESS``-gated skip): ``apply_delta`` returns early
      when ``batch_id <= last_merged_batch``. The MERGE and the property
      update are two Iceberg commits, so a crash between them replays the
      MERGE — which is row-idempotent for an identical delta (matched
      upserts re-set the same values, matched deletes are already gone);
      deriving the *identical* delta on replay is the caller's job (the
      streaming kernel's version-pinned pre-commit reads);
    * ``read_for`` — a join on the key prefix; Iceberg prunes to the
      bucket partitions exactly as the stand-in's directory filter does;
    * compaction/prune — ``CALL system.rewrite_data_files`` /
      ``expire_snapshots`` (amortized maintenance, as in the stand-in).

    The sandbox has no Iceberg jars, so methods raise if invoked without the
    runtime — but the class imports and unit-tests its SQL generation
    (``tests/test_evaluation_sinks.py::test_iceberg_sql_generation``).
    """

    def __init__(
        self,
        spark: SparkSession,
        table: str,
        bucket_by: list[str] | None = None,
        num_buckets: int = 32,
    ) -> None:
        self.spark = spark
        self.table = table
        self.bucket_by = list(bucket_by) if bucket_by else None
        self.num_buckets = num_buckets

    @staticmethod
    def available(spark: SparkSession) -> bool:
        """True when the Iceberg Spark runtime is on the JVM classpath."""
        try:
            spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
                "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
            )
            return True
        except Exception:
            return False

    # -- SQL generation (unit-testable without the jars) ---------------------

    def create_sql(self, schema_ddl: str) -> str:
        part = ""
        if self.bucket_by:
            cols = ", ".join(
                f"bucket({self.num_buckets}, {c})" for c in self.bucket_by
            )
            part = f" PARTITIONED BY ({cols})"
        return (
            f"CREATE TABLE IF NOT EXISTS {self.table} ({schema_ddl})"
            f" USING iceberg{part}"
        )

    def merge_sql(self, keys: list[str], cols: list[str]) -> str:
        on = " AND ".join(f"t.{k} = s.{k}" for k in keys)
        sets = ", ".join(f"t.{c} = s.{c}" for c in cols if c not in keys)
        ins_cols = ", ".join(cols)
        ins_vals = ", ".join(f"s.{c}" for c in cols)
        return (
            f"MERGE INTO {self.table} t USING _delta s ON {on} "
            f"WHEN MATCHED AND s._op = 'd' THEN DELETE "
            f"WHEN MATCHED THEN UPDATE SET {sets} "
            f"WHEN NOT MATCHED AND s._op = 'u' THEN INSERT ({ins_cols}) "
            f"VALUES ({ins_vals})"
        )

    def compact_sql(self) -> str:
        return f"CALL system.rewrite_data_files(table => '{self.table}')"

    def watermark_read_sql(self) -> str:
        return f"SHOW TBLPROPERTIES {self.table} ('last_merged_batch')"

    def watermark_set_sql(self, batch_id: int) -> str:
        return (
            f"ALTER TABLE {self.table} SET TBLPROPERTIES "
            f"('last_merged_batch'='{int(batch_id)}')"
        )

    # -- execution (requires the Iceberg runtime) ----------------------------

    def _require(self) -> None:
        if not self.available(self.spark):
            raise RuntimeError(
                "Iceberg runtime not on the classpath — use SnapshotStateTable"
            )

    def last_merged_batch(self) -> int | None:
        """Current watermark, or None when never merged."""
        self._require()
        try:
            rows = self.spark.sql(self.watermark_read_sql()).collect()
        except Exception:
            return None
        for r in rows:
            if r["key"] == "last_merged_batch":
                try:
                    return int(r["value"])
                except (TypeError, ValueError):
                    return None
        return None

    def committed(self, batch_id: int) -> bool:
        wm = self.last_merged_batch()
        return wm is not None and batch_id <= wm

    def apply_delta(self, upserts, deletes, keys: list[str], batch_id: int) -> None:
        self._require()
        if self.committed(batch_id):
            return  # replayed batch — exactly-once skip
        parts = []
        if upserts is not None:
            parts.append(upserts.withColumn(_OP, F.lit("u")))
        if deletes is not None:
            parts.append(deletes.withColumn(_OP, F.lit("d")))
        delta = parts[0]
        for p in parts[1:]:
            delta = delta.unionByName(p, allowMissingColumns=True)
        delta.createOrReplaceTempView("_delta")
        cols = [c for c in delta.columns if c != _OP]
        self.spark.sql(self.merge_sql(keys, cols))
        self.spark.sql(self.watermark_set_sql(batch_id))

    def read(self):
        self._require()
        return self.spark.table(self.table)

    def read_for(self, keys_df):
        self._require()
        assert self.bucket_by
        return self.spark.table(self.table).join(
            F.broadcast(keys_df.distinct()), self.bucket_by, "left_semi"
        )


def make_state_table(
    spark: SparkSession,
    root: str,
    name: str,
    bucket_by: list[str] | None = None,
    num_buckets: int = 32,
    **kw,
):
    """Factory: real Iceberg table when the runtime is present, parquet
    merge-on-read stand-in otherwise (same interface either way)."""
    if IcebergStateTable.available(spark):  # pragma: no cover (no jars here)
        return IcebergStateTable(
            spark, f"state.{name}", bucket_by=bucket_by, num_buckets=num_buckets
        )
    return SnapshotStateTable(
        spark, root, name, bucket_by=bucket_by, num_buckets=num_buckets, **kw
    )
