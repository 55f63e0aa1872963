"""Star-schema analytics: the classic multi-way dimensional join+agg
(TPC-H Q5 shape) and a dynamic-partition-pruning round-trip — the two
plan shapes that dominate warehouse workloads at 100 TB.

Reference parity: the reference's silver/gold joins are single-pair
equi-joins; these keys cover the composed form a star schema needs
(fact ⋈ 5 dims in one query) and the partition-elimination behavior
its partitioned bronze layout (mm_source_to_bronze.py:164) enables.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mercurygate_spark.functions import r2
from mercurygate_spark.queries.registry import load_tables, query


@query(
    "agg_star_multijoin",
    oracle="""
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n_items
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
)
def agg_star_multijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: local-supplier revenue by nation for one region
    and one order-date year — a 6-table star join ending in a grouped
    float aggregate. The scale story is all join strategy: `region`
    and `nation` carry explicit broadcast hints (constant-size dims —
    5 and 25 rows at any sf); `supplier` is left to the planner, which
    broadcasts it while it fits and falls back to shuffle join beyond
    (hinting it would force an OOM at 100 TB supplier scale); the
    fact-side chain lineitem⋈orders⋈customer shuffles on its join
    keys with AQE free to re-plan from runtime stats. The date window
    and region filter reach the scans as pushed predicates, so
    partition/row-group pruning eliminates the other five years before
    the first shuffle."""
    t = load_tables(
        spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation", "region"
    )
    o = t["orders"].where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    r = F.broadcast(t["region"].where(F.col("r_name") == "ASIA"))
    n = F.broadcast(t["nation"])
    joined = (
        t["customer"]
        .join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            t["supplier"],
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return joined.groupBy("n_name").agg(
        r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
            "revenue"
        ),
        F.count("*").alias("n_items"),
    )


DPP_YEARS = (1995, 1996, 1997)  # the "early era" the dim filter selects


def _tmp(name: str) -> str:
    d = os.path.join(tempfile.gettempdir(), f"mercurygate_spark_star_{os.getpid()}")
    os.makedirs(d, exist_ok=True)
    return os.path.join(d, name)


def write_orders_partitioned_by_year(spark: SparkSession, sf_dir: str) -> str:
    """Write orders hive-partitioned by order year (the reference's
    partitioned-bronze layout, one directory per year) and return the
    path. Partition-column type inference recovers o_year as int on
    read-back."""
    t = load_tables(spark, sf_dir, "orders")
    path = _tmp("orders_by_year")
    (
        t["orders"]
        .withColumn("o_year", F.year("o_orderdate"))
        .write.mode("overwrite")
        .partitionBy("o_year")
        .parquet(path)
    )
    return path


def dpp_join(spark: SparkSession, path: str) -> DataFrame:
    """The pruned join: partitioned-fact scan ⋈ filtered year dim.

    The dim is built unfiltered (7 candidate years with an era label)
    and filtered AFTER construction — exactly the shape dynamic
    partition pruning needs: Catalyst plants a DynamicPruning subquery
    on the fact scan's partition column, reusing the dim's broadcast
    exchange, so only the 3 matching year directories are read. At
    100 TB this is the difference between scanning 3 years and
    scanning all of them; the plan pin in tests/test_plans.py asserts
    `dynamicpruning` actually appears in the fact scan's partition
    filters (a silent regression here costs nothing at sf0.01 and a
    full-table scan in production)."""
    back = spark.read.parquet(path)
    dim = (
        spark.range(1995, 2002)
        .select(
            F.col("id").cast("int").alias("yr"),
            F.when(F.col("id") <= max(DPP_YEARS), "early")
            .otherwise("late")
            .alias("era"),
        )
        .where(F.col("era") == "early")
    )
    return back.join(F.broadcast(dim), back["o_year"] == dim["yr"])


@query(
    "join_dynamic_partition_pruning",
    oracle=f"""
    SELECT CAST(year(o_orderdate) AS INT) AS o_year,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS revenue
    FROM orders
    WHERE year(o_orderdate) IN {DPP_YEARS}
    GROUP BY 1
    """,
)
def join_dynamic_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning round-trip: write orders partitioned
    by year, join the read-back against a filtered dim, aggregate the
    surviving partitions. Eager (performs a sink write per call) —
    exempted from the plan sweep like the other sink round-trips;
    dpp_join carries the pruning doctrine and its dedicated plan
    test."""
    path = write_orders_partitioned_by_year(spark, sf_dir)
    joined = dpp_join(spark, path)
    return joined.groupBy("o_year").agg(
        F.count("*").alias("n_orders"),
        r2(F.sum("o_totalprice")).alias("revenue"),
    )
