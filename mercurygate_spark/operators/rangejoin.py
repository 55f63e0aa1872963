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


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    a_start: str,
    a_end: str,
    b_start: str,
    b_end: str,
    max_len_seconds: int,
    extra_equi: list[str] | None = None,
) -> DataFrame:
    """All (a, b) pairs whose [start, end) intervals OVERLAP
    (a.start < b.end AND b.start < a.end), for intervals of bounded
    length <= max_len_seconds. Same scale argument as
    ts_proximity_join: overlap of bounded intervals implies
    |a.start - b.start| < max_len, so bucketing starts by max_len and
    replicating one side into its ±1 neighbor buckets covers every
    candidate; the exact overlap predicate filters. Work ∝ bucket
    occupancy, never |A|×|B|. Column names pre-disambiguated by the
    caller; intervals longer than max_len_seconds would be silently
    missed — callers must pass a true bound."""
    b_us = max_len_seconds * 1_000_000
    bucket_a = F.expr(f"unix_micros({a_start}) div {b_us}")
    bucket_b = F.expr(f"unix_micros({b_start}) div {b_us}")
    a_rep = a.withColumn(
        "__bucket", F.explode(F.array(bucket_a - 1, bucket_a, bucket_a + 1))
    )
    b_key = b.withColumn("__bucket", bucket_b)
    on = ["__bucket"] + (extra_equi or [])
    overlap = (F.col(a_start) < F.col(b_end)) & (F.col(b_start) < F.col(a_end))
    return a_rep.join(b_key, on).where(overlap).drop("__bucket")
