"""Bucketed tables for co-located joins (the 100 TB fact⋈fact
strategy: pre-shuffle once at write time, join shuffle-free forever).

Spark bucketing requires the table catalog (`saveAsTable`, hive-style
layout in the warehouse dir); plain `.parquet(path)` cannot carry
bucket metadata. The payoff: two tables bucketed by the same key into
the same bucket count sort-merge join with ZERO Exchange — asserted in
tests/test_plans.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_by: str,
    n_buckets: int,
    sort_by: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sorted) catalog table.
    Sorting within buckets additionally removes the join-time Sort."""
    w = df.write.mode(mode).bucketBy(n_buckets, bucket_by)
    if sort_by:
        w = w.sortBy(sort_by)
    w.format("parquet").saveAsTable(table_name)


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)
