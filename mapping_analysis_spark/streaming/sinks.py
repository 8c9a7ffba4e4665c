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
        # superset schema (all value+meta columns) cached after the first
        # resolve: later reads pass it explicitly, so Spark runs NO
        # schema-inference job per directory — without it, per-batch driver
        # jobs grow linearly with the number of un-compacted delta dirs
        self._schema = None
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
        paths = [
            self._dir(kind, b)
            for kind, b in live
            if _has_parquet(self._dir(kind, b))
            # empty deltas (no rows in any bucket) are schema-free markers
        ]
        if not paths:
            return None
        if self._schema is None:
            # first resolve: derive the superset schema (pure-delete deltas
            # carry only key columns — union fills value columns with nulls,
            # and tombstones lose the window race)
            parts = [self.spark.read.parquet(p) for p in paths]
            df = parts[0]
            for p in parts[1:]:
                df = df.unionByName(p, allowMissingColumns=True)
            self._schema = df.schema
        else:
            # explicit schema → zero schema-inference jobs regardless of how
            # many delta dirs are live (per-dir reads keep partition
            # discovery local to each root; a multi-root read conflicts);
            # files missing a column read as null
            parts = [
                self.spark.read.schema(self._schema).parquet(p) for p in paths
            ]
            df = parts[0]
            for p in parts[1:]:
                df = df.unionByName(p)
        if before_batch is not None:
            df = df.filter(F.col(_BATCH) < F.lit(before_batch))
        if buckets is not None and _BUCKET in df.columns:
            df = df.filter(F.col(_BUCKET).isin(buckets))  # partition pruning
        if keys_df is not None:
            on = [f"_k_{c}" for c in self.bucket_by]
            kdf = keys_df
            for c in self.bucket_by:
                kdf = kdf.withColumnRenamed(c, f"_k_{c}")
            # materialize the key set BEFORE broadcasting: Catalyst pushes
            # the semi-join below the per-delta-dir union (one broadcast
            # join per scan branch), and a key lineage containing a pandas
            # UDF defeats exchange-reuse canonicalization — every branch
            # then rebuilds the broadcast on every action, so per-batch
            # Spark jobs grew ~linearly with live delta dirs (measured
            # 43→138 over 7 batches in the streaming kernel). An eager
            # checkpoint pins the key set to an RDD scan: one build, every
            # branch reuses it, re-executions are a trivial re-scan.
            kdf_small = kdf.select(*on).distinct().localCheckpoint(eager=True)
            df = df.join(F.broadcast(kdf_small), on, "left_semi")
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

    def read(self, before_batch: int | None = None) -> DataFrame | None:
        """Current FULL state (latest committed view), or None if empty.
        O(total state) — for final results / compaction, or small whole-read
        tables (e.g. the music job's dirty-block set), not per-batch use on
        large state.

        ``before_batch`` pins to the pre-batch snapshot exactly as in
        :meth:`read_for` — required when the result feeds deltas committed
        later in the same batch.

        Key columns come back under their original names (the ``_k_``
        prefix is internal)."""
        out = self._resolve(self._committed_dirs(), before_batch=before_batch)
        return None if out is None else self._unprefix(out)

    def bucket_ids_for(self, keys_df: DataFrame) -> list[int]:
        """Distinct bucket ids of ``keys_df`` (columns = ``bucket_by``) —
        one small Spark job. Callers holding several reads over the same (or
        a subset of the same) key values compute this once and pass it to
        ``read_for(buckets=...)``: the bucket id depends only on the key
        VALUES and the bucket count, not on the table."""
        assert self.bucket_by, "bucket_ids_for requires a bucket_by declaration"
        return [
            r[0]
            for r in keys_df.select(
                self._bucket_expr(self.bucket_by).alias("_b")
            )
            .distinct()
            .collect()
        ]

    def read_for(
        self,
        keys_df: DataFrame,
        before_batch: int | None = None,
        buckets: list[int] | None = None,
    ) -> DataFrame | None:
        """Pruned state read: only rows whose ``bucket_by`` key appears in
        ``keys_df`` (whose columns must be exactly ``bucket_by``). Partition
        pruning limits the scan to touched buckets; the broadcast semi-join
        limits resolved rows to the requested keys — per-batch read cost is
        O(keys touched), independent of total state size.

        ``before_batch=b`` pins to the pre-batch-``b`` snapshot — REQUIRED
        for every read whose result feeds deltas committed later in the same
        batch (replay after a mid-batch crash would otherwise see the
        already-committed post-state and derive empty/doubled deltas).

        ``buckets`` (from :meth:`bucket_ids_for`, possibly computed on a
        SUPERSET of these keys against the same bucket count) skips the
        per-call bucket-id job — the driver-overhead fusion the streaming
        kernel uses to keep Spark jobs per micro-batch low."""
        assert self.bucket_by, "read_for requires a bucket_by declaration"
        ids = buckets if buckets is not None else self.bucket_ids_for(keys_df)
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
        """Mark a batch committed with zero data movement: a marker delta
        directory holding only ``_SUCCESS`` (no parquet). ``_resolve`` skips
        parquet-free directories, so readers never touch it — and unlike the
        old empty-parquet write, this costs ZERO Spark jobs (it is pure
        filesystem; empty batches previously paid ~2 small jobs per table)."""
        if self.committed(batch_id):
            return
        tmp = self._dir("d", batch_id) + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        os.makedirs(tmp)
        open(os.path.join(tmp, "_SUCCESS"), "w").close()
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

    def bucket_ids_sql(self, keys_view: str) -> str:
        """Distinct Iceberg bucket ids of the requested keys (the Iceberg
        ``bucket`` transform is Murmur3-based — it must be computed BY
        Iceberg's own function, not by the stand-in's xxhash64)."""
        cols = ", ".join(
            f"system.bucket({self.num_buckets}, {c}) AS _b_{c}"
            for c in self.bucket_by
        )
        return f"SELECT DISTINCT {cols} FROM {keys_view}"

    def bucket_filter_sql(self, ids_per_col: dict) -> str:
        """Explicit partition-pruning predicate for ``read_for``: a
        conjunction of ``system.bucket(N, col) IN (...)`` terms. Guarantees
        bucket-partition pruning (Spark 3.4+ V2 function pushdown) — a plain
        broadcast-semi-join on the key column does NOT, which at 100 TB means
        a full scan per micro-batch (round-3 What's wrong #4)."""
        return " AND ".join(
            f"system.bucket({self.num_buckets}, {c}) IN "
            f"({', '.join(str(int(i)) for i in sorted(set(ids)))})"
            for c, ids in ids_per_col.items()
        )

    def snapshot_prop(self, batch_id: int) -> str:
        return f"pre_merge_snapshot_b{int(batch_id)}"

    def snapshot_set_sql(self, batch_id: int, snapshot_id: int) -> str:
        """Record the pre-merge snapshot id so a replay after a mid-batch
        crash can version-pin its reads (the stand-in's ``_BATCH <
        before_batch`` filter ≙ ``VERSION AS OF`` the pre-merge snapshot)."""
        return (
            f"ALTER TABLE {self.table} SET TBLPROPERTIES "
            f"('{self.snapshot_prop(batch_id)}'='{int(snapshot_id)}')"
        )

    def versioned_table_sql(self, snapshot_id: int) -> str:
        return f"SELECT * FROM {self.table} VERSION AS OF {int(snapshot_id)}"

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

    def current_snapshot_id(self) -> int | None:
        self._require()
        rows = self.spark.sql(
            f"SELECT snapshot_id FROM {self.table}.snapshots "
            f"ORDER BY committed_at DESC LIMIT 1"
        ).collect()
        return int(rows[0][0]) if rows else None

    def pinned_snapshot(self, batch_id: int) -> int | None:
        """The recorded pre-merge snapshot for ``batch_id``, if any."""
        self._require()
        rows = self.spark.sql(
            f"SHOW TBLPROPERTIES {self.table} "
            f"('{self.snapshot_prop(batch_id)}')"
        ).collect()
        for r in rows:
            if r["key"] == self.snapshot_prop(batch_id):
                try:
                    return int(r["value"])
                except (TypeError, ValueError):
                    return None
        return None

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
        # pin the pre-merge snapshot FIRST: a crash between the property
        # commit and the MERGE replays both (idempotent); a crash after the
        # MERGE leaves the pin in place for version-pinned replay reads
        snap = self.current_snapshot_id()
        if snap is not None:
            self.spark.sql(self.snapshot_set_sql(batch_id, snap))
        self.spark.sql(self.merge_sql(keys, cols))
        self.spark.sql(self.watermark_set_sql(batch_id))

    def read(self):
        self._require()
        return self.spark.table(self.table)

    def _pinned_table(self, before_batch: int | None):
        """Table view as of BEFORE ``before_batch``'s merge (the stand-in's
        ``_BATCH < b`` filter): current state when that batch never merged,
        else ``VERSION AS OF`` its recorded pre-merge snapshot."""
        if before_batch is None or not self.committed(before_batch):
            return self.spark.table(self.table)
        rows = self.spark.sql(
            f"SHOW TBLPROPERTIES {self.table} "
            f"('{self.snapshot_prop(before_batch)}')"
        ).collect()
        snaps = [
            int(r["value"]) for r in rows
            if r["key"] == self.snapshot_prop(before_batch)
        ]
        if not snaps:  # merged before snapshot pinning existed → best effort
            return self.spark.table(self.table)
        return self.spark.sql(self.versioned_table_sql(snaps[0]))

    def read_for(self, keys_df, before_batch: int | None = None, buckets=None):
        """Pruned read: an EXPLICIT ``system.bucket(N, col) IN (...)``
        predicate (guaranteed partition pruning) plus the key semi-join.
        ``buckets`` is accepted for interface parity with the stand-in but
        recomputed here — Iceberg's Murmur3 bucket ids differ from the
        stand-in's xxhash64 ids."""
        self._require()
        assert self.bucket_by
        keys = keys_df.distinct()
        view = "_rf_keys"
        keys.createOrReplaceTempView(view)
        rows = self.spark.sql(self.bucket_ids_sql(view)).collect()
        if not rows:
            return None
        ids_per_col = {
            c: sorted({int(r[f"_b_{c}"]) for r in rows}) for c in self.bucket_by
        }
        return (
            self._pinned_table(before_batch)
            .where(F.expr(self.bucket_filter_sql(ids_per_col)))
            .join(F.broadcast(keys), self.bucket_by, "left_semi")
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
