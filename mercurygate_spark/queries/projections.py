"""Projections / filters / predicates (SURVEY.md §2c).

Covers: project_rename_conform (P4), project_audit_columns (P1+P2),
filter_predicate (Gold gap), project_case_flag (P5 extension).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mercurygate_spark.functions import month_bucket
from mercurygate_spark.pipeline.conform import rename_conform
from mercurygate_spark.queries.registry import load_tables, query

# The engine's conform op is data-driven rename maps (reference
# mm_bronze_silver.py:9-167); here applied to the lineitem stand-in.
LINEITEM_RENAME = {
    "l_orderkey": "order_key",
    "l_linenumber": "line_number",
    "l_quantity": "quantity",
    "l_extendedprice": "extended_price",
    "l_returnflag": "return_flag",
    "l_linestatus": "line_status",
}


@query(
    "project_rename_conform",
    oracle="""
    SELECT l_orderkey AS order_key,
           l_linenumber AS line_number,
           l_quantity AS quantity,
           l_extendedprice AS extended_price,
           l_returnflag AS return_flag,
           l_linestatus AS line_status
    FROM lineitem
    """,
)
def project_rename_conform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bulk rename→snake_case conform as ONE select projection — the
    engine's replacement for the reference's ~140 chained
    withColumnRenamed calls (mm_bronze_silver.py:225-227, anti-pattern
    SURVEY.md §2d-2). Unmapped columns are dropped here (strict
    conform); the pipeline variant can keep them."""
    t = load_tables(spark, sf_dir, "lineitem")
    return rename_conform(t["lineitem"], LINEITEM_RENAME, keep_unmapped=False)


@query(
    "project_audit_columns",
    oracle="""
    SELECT o_orderkey,
           'mercurygate' AS database,
           'NAM' AS region,
           'USA' AS country,
           'mercurygate_spark' AS updated_by,
           strftime(date_trunc('month', o_orderdate), '%Y-%m') AS year_month
    FROM orders
    """,
)
def project_audit_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constant audit/lineage columns + month partition key — reference
    P1+P2 (mm_source_to_bronze.py:148-153). One withColumns call, all
    literals constant-folded by Catalyst. The reference's driver-time
    ``updated_on=datetime.today()`` literal is the pipeline's concern
    (pipeline.bronze takes it as a parameter); here only deterministic
    audit columns so the oracle can match."""
    t = load_tables(spark, sf_dir, "orders")
    return t["orders"].select(
        "o_orderkey",
        F.lit("mercurygate").alias("database"),
        F.lit("NAM").alias("region"),
        F.lit("USA").alias("country"),
        F.lit("mercurygate_spark").alias("updated_by"),
        month_bucket("o_orderdate").alias("year_month"),
    )


@query(
    "filter_predicate",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
    FROM orders
    WHERE o_orderstatus <> 'P'
      AND o_totalprice BETWEEN 50000 AND 200000
      AND o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND (o_custkey % 2 = 0 OR o_orderpriority LIKE '1-%')
      AND o_orderdate IS NOT NULL
    """,
)
def filter_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound row predicate: =, <>, BETWEEN, IN, LIKE, IS NULL,
    AND/OR (Gold-layer gap, SURVEY.md §2c). Catalyst pushes the whole
    conjunction into the parquet scan (PushedFilters)."""
    t = load_tables(spark, sf_dir, "orders")
    o = t["orders"]
    return o.where(
        (F.col("o_orderstatus") != "P")
        & F.col("o_totalprice").between(50000, 200000)
        & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & ((F.col("o_custkey") % 2 == 0) | F.col("o_orderpriority").like("1-%"))
        & F.col("o_orderdate").isNotNull()
    ).select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority")


@query(
    "project_case_flag",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderstatus = 'O' THEN 'Y' ELSE 'N' END AS active,
           CASE
             WHEN o_totalprice >= 300000 THEN 'high'
             WHEN o_totalprice >= 100000 THEN 'mid'
             ELSE 'low'
           END AS price_tier
    FROM orders
    """,
)
def project_case_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional derived flags (when/otherwise) — generalizes the
    reference's constant ``active='Y'`` soft-delete flag
    (mm_bronze_silver.py:222) into a real SCD-style predicate."""
    t = load_tables(spark, sf_dir, "orders")
    return t["orders"].select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "O", "Y").otherwise("N").alias("active"),
        F.when(F.col("o_totalprice") >= 300000, "high")
        .when(F.col("o_totalprice") >= 100000, "mid")
        .otherwise("low")
        .alias("price_tier"),
    )
