"""Bucketed-table layout for co-located joins.

At 100 TB the dominant cost of a repeated equi-join is re-shuffling
the fact table every run.  Writing both sides bucketed by the join key
(same bucket count) persists the partitioning INTO the table layout:
Spark's scan reports the bucket distribution, the join planner sees
both sides already hash-distributed on the key, and the sort-merge
join runs with ZERO Exchange — the shuffle is paid once at write time,
amortized over every subsequent join (tests/test_plans.py pins the
exchange-free plan).

This is the parquet/in-session-catalog equivalent of the Iceberg
`bucket(N, key)` partition transform the production deployment would
use (same idea as CheckpointTable standing in for Iceberg snapshots).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 16,
) -> None:
    """Persist df bucketed+sorted by `key` as a catalog table."""
    (
        df.write.bucketBy(n_buckets, key)
        .sortBy(key)
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(table)
    )


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
