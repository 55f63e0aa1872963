"""Gold layer for the claim family — the KPIs the reference promises
but never builds ("Aggregated business KPIs … Power BI",
README.md:121-129 of the reference).

These operate on SILVER claim tables (pipeline.silver output schema:
conformed names, typed dates, active flag), so they are exercised by
golden tests on synthetic fixtures (tests/test_gold_claims.py) rather
than the driver's TPC-H-ish oracle harness — the driver testdata has
no claim tables. The §2c stand-in queries cover the same operator
shapes on oracle-checkable data (FIXTURES.md §D role mapping).

All KPIs are pure DataFrame→DataFrame: broadcast dims don't exist
here (claim is the hub), so every join keys on claim_number — one
shuffle, AQE-skew-safe, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mercurygate_spark.functions import month_bucket, r2


def claim_cycle_times(claim: DataFrame) -> DataFrame:
    """Lifecycle latencies per claim: created→filed→closed/paid day
    deltas over the reference's date_* chain (mm_bronze_silver.py:63-83)."""
    return claim.select(
        "claim_number",
        "status_code",
        F.datediff("date_filed", "date_created").alias("days_to_file"),
        F.datediff("date_closed", "date_created").alias("days_to_close"),
        F.datediff("date_paid", "date_filed").alias("days_file_to_paid"),
    )


def open_claim_aging(claim: DataFrame, as_of) -> DataFrame:
    """Aging buckets for open claims (active='Y', no date_closed)."""
    age = F.datediff(F.lit(as_of), F.col("date_created"))
    bucket = (
        F.when(age <= 30, "0-30")
        .when(age <= 90, "31-90")
        .when(age <= 180, "91-180")
        .otherwise("180+")
    )
    return (
        claim.where((F.col("active") == "Y") & F.col("date_closed").isNull())
        .select("claim_number", age.alias("age_days"), bucket.alias("age_bucket"),
                "total_amount")
        .groupBy("age_bucket")
        .agg(
            F.count("*").alias("n_claims"),
            r2(F.sum("total_amount")).alias("exposure"),
        )
    )


def payment_recovery(claim: DataFrame, claim_payment: DataFrame) -> DataFrame:
    """Per-claim recovery: payments vs claimed amount (left join keeps
    unpaid claims; coalesce-to-0 like the reference's sparse amounts)."""
    paid = claim_payment.groupBy("claim_number").agg(
        F.sum("payment_amount").alias("__paid"), F.count("*").alias("n_payments")
    )
    j = claim.join(paid, "claim_number", "left")
    return j.select(
        "claim_number",
        "status_code",
        r2(F.coalesce(F.col("__paid"), F.lit(0.0))).alias("total_paid"),
        F.coalesce("n_payments", F.lit(0)).alias("n_payments"),
        r2(F.col("total_amount")).alias("claimed_amount"),
        r2(
            F.coalesce(F.col("__paid"), F.lit(0.0))
            / F.nullif(F.col("total_amount"), F.lit(0.0))
        ).alias("recovery_ratio"),
    )


def monthly_claim_kpis(claim: DataFrame) -> DataFrame:
    """The dashboard headline: claims, amounts and closure rate per
    intake month (year_month semantics of the bronze partition key)."""
    return (
        claim.groupBy(month_bucket("date_created").alias("year_month"))
        .agg(
            F.count("*").alias("n_claims"),
            r2(F.sum("total_amount")).alias("claimed"),
            r2(F.sum("payment_amount")).alias("paid"),
            F.count("date_closed").alias("n_closed"),
            r2(F.avg(F.datediff("date_closed", "date_created"))).alias("avg_days_to_close"),
        )
    )


def claimant_leaderboard(claim: DataFrame, top_n: int = 10) -> DataFrame:
    """Top claimants by claimed amount (rank + filter — deterministic
    set via rank over ties)."""
    from pyspark.sql import Window

    agg = claim.groupBy("claim_ant").agg(
        F.count("*").alias("n_claims"), F.sum("total_amount").alias("__amt")
    )
    w = Window.orderBy(F.col("__amt").desc(), F.col("claim_ant"))
    return (
        agg.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= top_n)
        .select("rk", "claim_ant", "n_claims", r2(F.col("__amt")).alias("claimed_amount"))
    )
