"""Sorts / limits / top-k (SURVEY.md §2c `sort_limit_topk`)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mercurygate_spark.queries.registry import load_tables, query


@query(
    "sort_limit_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
)
def sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: 25 most expensive orders. orderBy+limit compiles
    to TakeOrderedAndProject — each partition keeps its local top-25,
    only 25×partitions rows reach the driver-side merge; no global
    sort at any scale. Unique tiebreak (o_orderkey) pins the boundary
    rows when prices tie."""
    t = load_tables(spark, sf_dir, "orders")
    return (
        t["orders"]
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(25)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
    )
