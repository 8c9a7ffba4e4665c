"""Write-side bucketing: co-located joins/aggregations without a shuffle.

At 100 TB the dominant cost of a key-key join is the shuffle of both sides.
When a table is reused across many jobs (a representative table joined every
micro-batch, a scored-pair table consumed by several queries), paying one
bucketed write makes every later join/groupBy on that key shuffle-free:
Spark's native bucketed parquet tables (``DataFrameWriter.bucketBy`` +
``saveAsTable``) record ``hashpartitioning(key, n)`` in the catalog, the
scan reports that distribution, and the planner drops the Exchange on every
side whose bucketing matches the required distribution (both sides bucketed
with the same key and bucket count → neither side shuffles; mismatched
counts → only the mismatched side shuffles).

This is the storage-layout analogue of the reference's fixed Flink
``partitionBy``-between-operators wiring (semantics source:
``analysis-core``'s keyed DataSet handoffs) — but declared once at write
time and reused by every later plan, instead of re-shuffled per job.

Plan verification is first-class here: ``n_shuffle_exchanges`` counts the
shuffle Exchange nodes in the *physical* plan, so tests assert the layout
contract ("this join must not shuffle") rather than trusting it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 32,
    path: str | None = None,
    sort: bool = True,
    mode: str = "overwrite",
) -> DataFrame:
    """Materialize ``df`` as a bucketed (and optionally per-bucket sorted)
    parquet table named ``table``, bucketed by ``key`` into ``n_buckets``.

    ``path`` makes it an external table at that location (tests point this
    at a tmpdir; production points at the lake). Returns the re-read table,
    whose scan carries the bucket distribution.

    ``n_buckets`` is the co-location contract: every table that wants
    shuffle-free joins against this one must use the same count. Size it
    like shuffle partitions at the target scale (buckets ≈ 2-3× cluster
    cores, each bucket ≲ a few GB) — NOT to the test-scale row count.
    """
    spark = df.sparkSession
    if mode == "overwrite":
        # only overwrite clears the previous catalog entry — append/error/
        # ignore must see the existing table, not a freshly dropped one
        spark.sql(f"DROP TABLE IF EXISTS {table}")
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)
    return spark.table(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back (the catalog carries the bucket spec)."""
    return spark.table(table)


def n_shuffle_exchanges(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the physical plan.

    Broadcast exchanges are excluded — they move a dimension table, not the
    data. Use in tests/benches to pin a plan contract: a co-located join
    must report 0.
    """
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange" in line and "BroadcastExchange" not in line
    )
