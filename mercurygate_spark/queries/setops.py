"""Set operations (SURVEY.md §2c "Set ops").

The reference's natural set op is MM ∪ Linehaul — two structurally
identical datasets unioned (config.py:105-109); modeled here on the
customer/supplier pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mercurygate_spark.queries.registry import load_tables, query


@query(
    "setop_union_all",
    oracle="""
    SELECT c_custkey AS party_key, c_name AS party_name,
           c_nationkey AS nation_key, 'customer' AS party_type
    FROM customer
    UNION ALL
    SELECT s_suppkey, s_name, s_nationkey, 'supplier'
    FROM supplier
    """,
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL by name (the MM∪Linehaul shape): conform both sides to
    a shared schema, then unionByName — never positional union, which
    silently mismatches reordered columns."""
    t = load_tables(spark, sf_dir, "customer", "supplier")
    c = t["customer"].select(
        F.col("c_custkey").alias("party_key"),
        F.col("c_name").alias("party_name"),
        F.col("c_nationkey").alias("nation_key"),
        F.lit("customer").alias("party_type"),
    )
    s = t["supplier"].select(
        F.col("s_suppkey").alias("party_key"),
        F.col("s_name").alias("party_name"),
        F.col("s_nationkey").alias("nation_key"),
        F.lit("supplier").alias("party_type"),
    )
    return c.unionByName(s)


@query(
    "setop_intersect",
    oracle="""
    SELECT c_nationkey AS nation_key FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics): nations having both customers
    and suppliers."""
    t = load_tables(spark, sf_dir, "customer", "supplier")
    return (
        t["customer"].select(F.col("c_nationkey").alias("nation_key"))
        .intersect(t["supplier"].select(F.col("s_nationkey").alias("nation_key")))
    )


@query(
    "setop_except",
    oracle="""
    SELECT c_nationkey AS nation_key FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier
    """,
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct semantics): nations with customers but no
    suppliers."""
    t = load_tables(spark, sf_dir, "customer", "supplier")
    return (
        t["customer"].select(F.col("c_nationkey").alias("nation_key"))
        .subtract(t["supplier"].select(F.col("s_nationkey").alias("nation_key")))
    )


@query(
    "setop_intersect_all",
    oracle="""
    SELECT c_nationkey AS nation_key FROM customer
    INTERSECT ALL
    SELECT s_nationkey FROM supplier
    """,
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics): each nation key kept
    min(customer-count, supplier-count) times — the multiset overlap,
    distinct from setop_intersect's set overlap. Spark plans this as a
    single aggregate-style shuffle on the key (no n² anything)."""
    t = load_tables(spark, sf_dir, "customer", "supplier")
    return (
        t["customer"].select(F.col("c_nationkey").alias("nation_key"))
        .intersectAll(t["supplier"].select(F.col("s_nationkey").alias("nation_key")))
    )


@query(
    "setop_except_all",
    oracle="""
    SELECT c_nationkey AS nation_key FROM customer
    EXCEPT ALL
    SELECT s_nationkey FROM supplier
    """,
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag semantics): each nation key kept
    max(0, customer-count − supplier-count) times — multiset
    difference, the shape used to diff two delivery batches with
    legitimate duplicate rows."""
    t = load_tables(spark, sf_dir, "customer", "supplier")
    return (
        t["customer"].select(F.col("c_nationkey").alias("nation_key"))
        .exceptAll(t["supplier"].select(F.col("s_nationkey").alias("nation_key")))
    )


@query(
    "setop_union_distinct",
    oracle="""
    SELECT n_nationkey AS nation_key FROM nation WHERE n_regionkey <= 2
    UNION
    SELECT s_nationkey FROM supplier
    """,
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct): nation keys from the low regions merged with
    the nations suppliers live in, duplicates collapsed — the set-union
    complement of setop_union_all's bag union. Spark's union().
    distinct() compiles to one hash aggregate after the concat; at
    scale that's a single shuffle on the (narrow) output columns, so
    always project BEFORE the distinct union."""
    t = load_tables(spark, sf_dir, "nation", "supplier")
    a = t["nation"].where(F.col("n_regionkey") <= 2).select(
        F.col("n_nationkey").alias("nation_key")
    )
    b = t["supplier"].select(F.col("s_nationkey").alias("nation_key"))
    return a.union(b).distinct()
