"""JDBC data source (SURVEY §2 row #5 — deprecated upstream).

Reference parity: ``io/impl/jdbc/JDBCDataSource.java:29-33`` wraps a plain
JDBC read of the vertex/edge tables (the reference marks it @Deprecated and
its tests are disabled). Spark's built-in ``spark.read.jdbc`` already *is*
the distributed re-expression — this thin wrapper only standardizes the
partitioned-read options so a 100 TB-scale ingest fans out across
executors (``partitionColumn``/``lowerBound``/``upperBound`` split the
table into ``numPartitions`` range scans) instead of a single-connection
driver pull.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 32,
    properties: dict | None = None,
) -> DataFrame:
    """Partitioned JDBC table read. Without ``partition_column`` the read is
    a single partition (small dims only); with it, Spark issues
    ``num_partitions`` parallel range queries — the only JDBC shape that
    scales."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        assert lower_bound is not None and upper_bound is not None, (
            "partitioned JDBC read needs lower_bound/upper_bound"
        )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    return reader.load()
