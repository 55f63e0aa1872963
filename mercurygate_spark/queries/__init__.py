"""Gold query library.

Every query the engine claims is registered here with (a) a PySpark
implementation ``fn(spark, sf_dir) -> DataFrame`` and (b) where
SQL-expressible, an ANSI-SQL oracle twin that DuckDB runs on the same
parquet tables. The driver hash-compares the two (SURVEY.md §5.1), so
column names/aliases must match exactly and float outputs are rounded
identically on both sides.

Import side effect: importing this package registers all queries.
"""

from mercurygate_spark.queries.registry import REGISTRY, load_tables, query  # noqa: F401

# Registration side effects — each module adds its QuerySpecs to REGISTRY.
from mercurygate_spark.queries import (  # noqa: F401,E402
    aggregates,
    analytics,
    corpus,
    dedup,
    graphs,
    joins,
    medallion,
    ml,
    multimodal,
    projections,
    quality,
    sampling,
    scans,
    scalar_fns,
    setops,
    similarity,
    sorts,
    star,
    streaming_queries,
    text,
    udfs,
    windows,
)


def all_queries():
    """name -> fn(spark, sf_dir) for every registered query."""
    return {name: spec.fn for name, spec in REGISTRY.items()}


def all_oracles():
    """name -> DuckDB SQL for every query that has an oracle twin."""
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle}
