"""Bucketized range (interval) join — the scale pattern for non-equi
time-proximity joins Spark would otherwise plan as a nested-loop
cartesian (PySpark guide 'As-of / range join').

To join rows with |a.ts - b.ts| <= radius: bucket both sides into
radius-sized epochs; a matching pair is always in the same or an
adjacent bucket, so replicating ONE side into its 3 neighbor buckets
and equi-joining on the bucket covers every candidate; the exact
predicate then filters. Work scales with bucket occupancy (shuffle on
the bucket key), never |A|×|B|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ts_proximity_join(
    a: DataFrame,
    b: DataFrame,
    a_ts: str,
    b_ts: str,
    radius_seconds: int,
    extra_equi: list[str] | None = None,
) -> DataFrame:
    """All (a, b) pairs with |a_ts - b_ts| <= radius (+ optional equi
    keys). Column names must be pre-disambiguated by the caller."""
    radius_us = radius_seconds * 1_000_000
    bucket_a = F.expr(f"unix_micros({a_ts}) div {radius_us}")  # integer div — no fp edge error
    bucket_b = F.expr(f"unix_micros({b_ts}) div {radius_us}")
    a_rep = a.withColumn(
        "__bucket", F.explode(F.array(bucket_a - 1, bucket_a, bucket_a + 1))
    )
    b_key = b.withColumn("__bucket", bucket_b)
    on = ["__bucket"] + (extra_equi or [])
    joined = a_rep.join(b_key, on)
    exact = (
        F.abs(F.unix_micros(F.col(a_ts)) - F.unix_micros(F.col(b_ts)))
        <= radius_seconds * 1_000_000
    )
    return joined.where(exact).drop("__bucket")
