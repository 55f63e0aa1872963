"""Batch sessionization (gaps-and-islands) — the batch twin of
streaming session_window, for when the input is already at rest.

lag(ts) flags session starts (gap > threshold), a running sum numbers
sessions, then one grouped aggregate per session. Two window passes
over one shuffle on the partition key — the standard scale pattern
(PySpark guide 'Sessionization').
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key: str,
    ts_col: str,
    gap_seconds: int,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Returns one row per (key, session): session_start ts, n_events.

    Deterministic: the ordering window ends in ``order_tiebreak`` (a
    unique column) so equal timestamps cannot reorder; equal-ts rows
    have gap 0 and always share a session either way."""
    order_cols = [F.col(ts_col)] + ([F.col(order_tiebreak)] if order_tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order_cols)
    gap = F.unix_micros(F.col(ts_col)) - F.unix_micros(F.lag(ts_col).over(w))
    # >= gap: matches Spark session_window, whose sessions span
    # [start, last+gap) — an event at exactly prev+gap starts a NEW one
    flagged = df.withColumn(
        "__new_session",
        F.when(gap.isNull() | (gap >= gap_seconds * 1_000_000), F.lit(1)).otherwise(F.lit(0)),
    )
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    numbered = flagged.withColumn("__session_no", F.sum("__new_session").over(wrun))
    return (
        numbered.groupBy(key, "__session_no")
        .agg(F.min(ts_col).alias("session_start"), F.count("*").alias("n_events"))
        .drop("__session_no")
    )
