"""OHLC bar aggregation — the ONE definition both execution modes use.

ts_ohlc_bars (batch groupBy) and stream_ohlc_bars (streaming tumbling
window) import the ordering struct, the aggregate list, and the oracle
SQL from here, so bar semantics (tie-break order, bar width, column
names) cannot drift between batch, stream, and oracle. The
min_by/max_by formulation is what makes the single definition possible:
open/close are order-insensitive mergeable state, legal in a streaming
aggregate where a window-sort formulation is not.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

BAR_MINUTES = 60  # the ONE bar-width constant all three paths derive from
BAR_US = BAR_MINUTES * 60 * 1_000_000

# Shared oracle: bar start = integer floor of the epoch-µs timestamp to
# BAR_US — the same alignment Spark's window() uses (epoch-anchored
# floor) and the same arithmetic bar_start() computes, so changing
# BAR_MINUTES re-derives batch, stream, AND oracle together. Valid for
# both keys because under availableNow the final streaming bars equal
# the batch groupBy.
OHLC_ORACLE_SQL = f"""
    WITH t AS (
      SELECT event_type,
             (epoch_us(ts) // {BAR_US}) * {BAR_US} AS bar_us,
             value,
             row_number() OVER (PARTITION BY event_type, epoch_us(ts) // {BAR_US}
                                ORDER BY ts, event_id) AS rn_a,
             row_number() OVER (PARTITION BY event_type, epoch_us(ts) // {BAR_US}
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM events
    )
    SELECT event_type, bar_us,
           max(CASE WHEN rn_a = 1 THEN value END) AS open,
           max(value) AS high,
           min(value) AS low,
           max(CASE WHEN rn_d = 1 THEN value END) AS close,
           count(*) AS n_ticks
    FROM t GROUP BY event_type, bar_us
    """


def bar_start(ts_col: str = "ts") -> Column:
    """Bar start in epoch µs: integer floor of the tick timestamp to
    BAR_US — the batch twin of window('{BAR_MINUTES} minutes').
    Uses pmod (non-negative remainder) rather than %, which truncates
    toward zero: for pre-1970 (negative-epoch) timestamps only the
    floor-mod form agrees with the oracle's floor division and with
    streaming window()'s epoch-anchored bucketing."""
    us = F.unix_micros(F.col(ts_col))
    return us - F.pmod(us, F.lit(BAR_US))


def ohlc_ord() -> Column:
    """The total tick order (ts in µs, then event_id) every open/close
    decision uses — identical in batch and stream."""
    return F.struct(F.unix_micros("ts").alias("o1"), F.col("event_id").alias("o2"))


def ohlc_aggs(ord_col: Column) -> list[Column]:
    """The bar's aggregate list: open/close via min_by/max_by over the
    total order, high/low plain min/max, tick count."""
    return [
        F.min_by("value", ord_col).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", ord_col).alias("close"),
        F.count("*").alias("n_ticks"),
    ]
