"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-
insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``mercurygate_spark``; this file is the thin
adapter the driver imports.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    TPC-H-Q1-shaped grouped pricing summary (SURVEY.md §7 step 2) —
    scan with pushed filter + partial/final hash agg."""
    from mercurygate_spark.queries import all_queries
    from mercurygate_spark.session import tune_existing

    tune_existing(spark)
    return all_queries()["agg_group_sum_avg_minmax"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (each
    callable takes (spark, sf_dir) and returns a DataFrame)."""
    from mercurygate_spark.queries import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twin per query key (omitted for non-SQL-expressible
    ops → driver records a rows-only check)."""
    from mercurygate_spark.queries import all_oracles

    return all_oracles()
