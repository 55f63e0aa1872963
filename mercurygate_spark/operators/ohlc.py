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

BAR_MINUTES = 60  # one bar per hour — mirrored by date_trunc('hour')

# Shared oracle: the same windowed-SQL statement of the bar semantics,
# valid for both keys because under availableNow the final streaming
# bars equal the batch groupBy.
OHLC_ORACLE_SQL = """
    WITH t AS (
      SELECT event_type,
             epoch_us(date_trunc('hour', ts)) AS bar_us,
             value,
             row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                ORDER BY ts, event_id) AS rn_a,
             row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
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
