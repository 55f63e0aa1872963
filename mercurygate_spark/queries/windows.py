"""Window functions (SURVEY.md §2c "Window functions"; the dedupe
intent mm_bronze_silver.py:171-182 is itself a window op).

Determinism rule for every window here: the ORDER BY ends in a unique
column (event_id / o_orderkey) so ties cannot reorder frames between
engines (SURVEY.md §7 risk 'SCD/merge semantics').
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mercurygate_spark.functions import r2, r6, ts_us
from mercurygate_spark.pipeline.conform import dedupe_latest
from mercurygate_spark.queries.registry import load_tables, query


@query(
    "window_dedupe_latest",
    oracle="""
    SELECT user_id, event_type,
           epoch_us(ts) AS ts_us,
           event_id,
           round(value, 2) AS value
    FROM (
      SELECT *, row_number() OVER (
               PARTITION BY user_id, event_type
               ORDER BY ts DESC, event_id DESC
             ) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def window_dedupe_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PK-latest dedupe — realizes the reference's declared
    primary_key/orderByCol registry intent (SURVEY.md §2b) via
    pipeline.conform.dedupe_latest. One shuffle on the pk; the
    tie-break (event_id desc) pins a total order."""
    t = load_tables(spark, sf_dir, "events")
    d = dedupe_latest(
        t["events"], primary_key=["user_id", "event_type"], order_by=["ts"], tiebreakers=["event_id"]
    )
    return d.select(
        "user_id", "event_type", ts_us("ts").alias("ts_us"), "event_id", r2(F.col("value")).alias("value")
    )


@query(
    "window_rank_topn_per_group",
    oracle="""
    SELECT c_mktsegment, o_orderkey, o_totalprice, rk
    FROM (
      SELECT c_mktsegment, o_orderkey, o_totalprice,
             rank() OVER (PARTITION BY c_mktsegment ORDER BY o_totalprice DESC) AS rk
      FROM orders JOIN customer ON o_custkey = c_custkey
    ) WHERE rk <= 5
    """,
)
def window_rank_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N per group: 5 biggest orders per market segment. rank()
    keeps ties → the qualifying SET is deterministic even on equal
    prices. At scale Spark pushes a per-partition rank limit before
    the shuffle (WindowGroupLimit) — no full sort of the fact."""
    t = load_tables(spark, sf_dir, "orders", "customer")
    j = t["orders"].join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("o_totalprice").desc())
    return (
        j.withColumn("rk", F.rank().over(w))
        .where(F.col("rk") <= 5)
        .select("c_mktsegment", "o_orderkey", "o_totalprice", "rk")
    )


@query(
    "window_running_total",
    oracle="""
    SELECT o_custkey, o_orderkey,
           epoch_us(o_orderdate) AS order_date_us,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 2) AS cum_spend
    FROM orders
    """,
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative spend per customer over order history (the
    running-amount KPI over the reference's date_* chains). ROWS frame
    + unique key in the ORDER BY → identical accumulation order in any
    engine, so the rounded sums hash-match exactly."""
    t = load_tables(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return t["orders"].select(
        "o_custkey",
        "o_orderkey",
        ts_us("o_orderdate").alias("order_date_us"),
        r2(F.sum("o_totalprice").over(w)).alias("cum_spend"),
    )


@query(
    "window_ntile_percent_rank",
    oracle="""
    SELECT o_orderkey,
           c_mktsegment,
           ntile(4) OVER w AS price_quartile,
           round(percent_rank() OVER w, 6) AS price_pct_rank,
           round(cume_dist() OVER w, 6) AS price_cume_dist
    FROM orders JOIN customer ON o_custkey = c_custkey
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_ntile_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution windows: quartile bucketing + percentile position
    per market segment (unique tiebreak → identical frames in any
    engine; rank ratios are int/int → bit-identical doubles)."""
    t = load_tables(spark, sf_dir, "orders", "customer")
    j = t["orders"].join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
    w = Window.partitionBy("c_mktsegment").orderBy("o_totalprice", "o_orderkey")
    return j.select(
        "o_orderkey",
        "c_mktsegment",
        F.ntile(4).over(w).alias("price_quartile"),
        r6(F.percent_rank().over(w)).alias("price_pct_rank"),
        r6(F.cume_dist().over(w)).alias("price_cume_dist"),
    )


@query(
    "window_lag_lead",
    oracle="""
    SELECT user_id, event_id,
           epoch_us(ts) AS ts_us,
           epoch_us(lag(ts)  OVER w) AS prev_ts_us,
           epoch_us(lead(ts) OVER w) AS next_ts_us,
           round(value - lag(value) OVER w, 2) AS value_delta
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead deltas per user event stream (day-over-day shape on the
    reference's date chains). First/last rows yield NULLs — part of
    the contract."""
    t = load_tables(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return t["events"].select(
        "user_id",
        "event_id",
        ts_us("ts").alias("ts_us"),
        ts_us(F.lag("ts").over(w)).alias("prev_ts_us"),
        ts_us(F.lead("ts").over(w)).alias("next_ts_us"),
        r2(F.col("value") - F.lag("value").over(w)).alias("value_delta"),
    )


@query(
    "window_range_frame",
    oracle="""
    SELECT o_orderkey, o_custkey,
           (CAST(o_orderdate AS DATE) - DATE '1970-01-01') AS order_day,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey
             ORDER BY (CAST(o_orderdate AS DATE) - DATE '1970-01-01')
             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW
           ), 2) AS spend_30d
    FROM orders
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-framed window (vs the ROWS frames elsewhere): per customer,
    total spend over the trailing 30 DAYS — a value-based frame, so
    same-day orders aggregate together and gaps widen the reach, which
    a ROWS frame cannot express. Ordered on epoch-day int on both
    engines (identical frame boundaries; no interval-type drift)."""
    t = load_tables(spark, sf_dir, "orders")
    day = F.unix_date(F.to_date("o_orderdate"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(day)
        .rangeBetween(-30, Window.currentRow)
    )
    return t["orders"].select(
        "o_orderkey",
        "o_custkey",
        day.alias("order_day"),
        r2(F.sum("o_totalprice").over(w)).alias("spend_30d"),
    )


@query(
    "window_first_last",
    oracle="""
    SELECT user_id, event_id,
           epoch_us(ts) AS ts_us,
           first_value(event_type) OVER w AS first_type,
           last_value(event_type) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS last_type,
           nth_value(event_type, 2) OVER w AS second_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value: each event annotated with
    the user's first, latest-overall, and second event type. The
    last_value frame is explicitly UNBOUNDED FOLLOWING — the default
    frame ends at CURRENT ROW, the classic silent-wrong-answer;
    ordering (ts, event_id) is total so both engines agree."""
    t = load_tables(spark, sf_dir, "events")
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_full = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return t["events"].select(
        "user_id",
        "event_id",
        ts_us("ts").alias("ts_us"),
        F.first("event_type").over(w_run).alias("first_type"),
        F.last("event_type").over(w_full).alias("last_type"),
        F.nth_value("event_type", 2).over(w_run).alias("second_type"),
    )


@query(
    "window_rows_frame",
    oracle="""
    SELECT o_orderkey, o_custkey,
           round(avg(o_totalprice) OVER (
             PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
           ), 2) AS moving_avg_3
    FROM orders
    """,
)
def window_rows_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded ROWS frame: 3-order moving average per customer —
    the count-based complement of window_range_frame's value-based
    frame (exactly 3 rows regardless of date gaps; the RANGE variant
    is time-based regardless of row count). Total order (date, key)
    makes frames identical across engines."""
    t = load_tables(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    return t["orders"].select(
        "o_orderkey",
        "o_custkey",
        r2(F.avg("o_totalprice").over(w)).alias("moving_avg_3"),
    )


@query(
    "window_fill_forward",
    oracle="""
    SELECT user_id, event_id, epoch_us(ts) AS ts_us,
           round(last_value(CASE WHEN event_type = 'click' THEN NULL ELSE value END
                            IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 2) AS value_filled,
           (event_type = 'click') AS was_gap
    FROM events
    """,
)
def window_fill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill (last-observation-carried-forward): sensor/metric
    streams full of nulls take the most recent non-null value per key.
    Nulls are synthesized deterministically (click events carry no
    value) so both engines fill the same gaps. One shuffle on user_id;
    the running frame is computed in a single pass per partition —
    never a self-join, which is the naive O(n²) formulation."""
    t = load_tables(spark, sf_dir, "events")
    sparse = F.when(F.col("event_type") == "click", F.lit(None)).otherwise(F.col("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return t["events"].select(
        "user_id",
        "event_id",
        ts_us("ts").alias("ts_us"),
        r2(F.last(sparse, ignorenulls=True).over(w)).alias("value_filled"),
        (F.col("event_type") == "click").alias("was_gap"),
    )


@query(
    "ts_resample_gapfill",
    oracle="""
    WITH daily AS (
      SELECT user_id, date_trunc('day', ts) AS day, avg(value) AS day_avg
      FROM events GROUP BY 1, 2
    ), bounds AS (
      SELECT user_id, min(day) AS lo, max(day) AS hi FROM daily GROUP BY 1
    ), grid AS (
      SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day
      FROM bounds
    )
    SELECT g.user_id, epoch_us(g.day) AS day_us,
           round(d.day_avg, 2) AS day_avg,
           round(last_value(d.day_avg IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 2) AS day_avg_filled,
           d.day_avg IS NULL AS is_gap
    FROM grid g LEFT JOIN daily d ON g.user_id = d.user_id AND g.day = d.day
    """,
)
def ts_resample_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample to a daily grid + gap-fill: aggregate each
    user's events to daily means, densify to EVERY day between that
    user's first and last activity (sequence+explode — the grid is
    generated executor-side per key, never a driver loop or a global
    calendar cross-join), then forward-fill missing days. The grid
    explode keys the left join on (user_id, day) so the fill window
    reuses the same hash partitioning; at 100 TB the grid size is
    bounded by span×keys, independent of event volume."""
    t = load_tables(spark, sf_dir, "events")
    daily = (
        t["events"]
        .groupBy("user_id", F.date_trunc("day", "ts").alias("day"))
        .agg(F.avg("value").alias("day_avg"))
    )
    grid = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
        .select(
            "user_id",
            F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("day"),
        )
    )
    joined = grid.join(daily, ["user_id", "day"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        ts_us("day").alias("day_us"),
        r2(F.col("day_avg")).alias("day_avg"),
        r2(F.last("day_avg", ignorenulls=True).over(w)).alias("day_avg_filled"),
        F.col("day_avg").isNull().alias("is_gap"),
    )


def moving_median_expr(col: str, w) -> "F.Column":
    """Exact median over a window frame via sorted-array readout
    (Spark forbids frames on median() itself). Even-count frames
    interpolate the two middles — DuckDB median semantics. Shared by
    window_moving_median and its property test, so the index
    arithmetic is pinned to the production expression."""
    arr = F.array_sort(F.collect_list(col).over(w))
    n = F.size(arr)
    return (
        F.element_at(arr, ((n + 1) / 2).cast("int"))
        + F.element_at(arr, (n / 2 + 1).cast("int"))
    ) / 2


def streaks(days: DataFrame, user_col: str = "user_id", di_col: str = "di") -> DataFrame:
    """Gaps-and-islands contraction: distinct (user, epoch-day) rows →
    one row per consecutive-day run (user, grp, len) via the
    day − row_number constant-difference trick. Shared by
    window_gaps_islands and its property test."""
    w = Window.partitionBy(user_col).orderBy(di_col)
    return (
        days.withColumn("grp", F.col(di_col) - F.row_number().over(w))
        .groupBy(user_col, "grp")
        .agg(F.count("*").alias("len"))
    )


@query(
    "window_moving_median",
    oracle="""
    WITH daily AS (
      SELECT date_trunc('day', o_orderdate) AS day,
             sum(o_totalprice) AS revenue
      FROM orders GROUP BY 1
    )
    SELECT epoch_us(day) AS day_us,
           round(revenue, 2) AS revenue,
           round(median(revenue) OVER (
             ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
           ), 2) AS revenue_med7
    FROM daily
    """,
)
def window_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day moving median of daily revenue — the robust trend line
    (medians shrug off the spike days that wreck moving means). Spark
    forbids a frame on median() itself, so the frame collects into a
    sorted array and the median is read out by index — exact, and the
    even-count interpolation (mean of the two middles) matches DuckDB's
    median. Bounded state: the frame is 7 rows, so the array never
    exceeds 7 doubles. The window is global-ordered BY DESIGN: it runs
    on the post-agg daily frame, whose row count is bounded by calendar
    days (~10³) regardless of fact volume, so the single-partition sort
    never sees more than that."""
    t = load_tables(spark, sf_dir, "orders")
    daily = (
        t["orders"]
        .groupBy(F.date_trunc("day", "o_orderdate").alias("day"))
        .agg(F.sum("o_totalprice").alias("revenue"))
    )
    w = Window.orderBy("day").rowsBetween(-6, Window.currentRow)
    med = moving_median_expr("revenue", w)
    return daily.select(
        ts_us("day").alias("day_us"),
        r2(F.col("revenue")).alias("revenue"),
        r2(med).alias("revenue_med7"),
    )


@query(
    "window_gaps_islands",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id,
             CAST(date_diff('day', DATE '1970-01-01', date_trunc('day', ts)) AS BIGINT) AS di
      FROM events
    ), isl AS (
      SELECT user_id, di,
             di - row_number() OVER (PARTITION BY user_id ORDER BY di) AS grp
      FROM days
    ), streaks AS (
      SELECT user_id, grp, count(*) AS len FROM isl GROUP BY 1, 2
    )
    SELECT user_id,
           max(len) AS longest_streak,
           count(*) AS n_streaks,
           CAST(sum(len) AS BIGINT) AS active_days
    FROM streaks GROUP BY user_id
    """,
)
def window_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: longest consecutive-day activity streak per
    user via the classic day − row_number() trick (consecutive days
    share a constant difference, so the group key is pure arithmetic —
    no self-join, no iteration). Distinct-day dedupe, one row_number
    window and two hash aggs, all keyed on user_id: the fact shuffles
    once and every later stage reuses that partitioning."""
    t = load_tables(spark, sf_dir, "events")
    days = (
        t["events"]
        .select(
            "user_id",
            F.datediff(F.date_trunc("day", "ts"), F.lit("1970-01-01").cast("date"))
            .cast("long")
            .alias("di"),
        )
        .distinct()
    )
    return streaks(days).groupBy("user_id").agg(
        F.max("len").alias("longest_streak"),
        F.count("*").alias("n_streaks"),
        F.sum("len").alias("active_days"),
    )


_EWMA_ALPHA = 0.3
_EWMA_DEPTH = 10


def _ewma_oracle_sql(alpha: float = _EWMA_ALPHA, depth: int = _EWMA_DEPTH) -> str:
    """Generated oracle twin of window_ewma: the same truncated-kernel
    lag expansion, emitted from the same coefficients, so alpha/depth
    cannot drift between engines."""
    num = " + ".join(
        f"coalesce(lag(value, {j}) OVER w * {(1 - alpha) ** j!r}, 0)"
        for j in range(depth)
    )
    den = " + ".join(
        f"(CASE WHEN lag(value, {j}) OVER w IS NOT NULL THEN {(1 - alpha) ** j!r} ELSE 0 END)"
        for j in range(depth)
    )
    return f"""
    SELECT user_id, event_id, epoch_us(ts) AS ts_us,
           round(({num}) / ({den}), 6) AS ewma
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """


@query("window_ewma", oracle=_ewma_oracle_sql())
def window_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average (α=0.3) per user event
    stream, truncated to a 10-lag kernel — the smoothing op behind
    anomaly baselines and rate limiters. The recursive EWMA is not
    window-expressible; the truncated kernel is (error ≤ (1−α)¹⁰ ≈ 2.8%
    of a unit step) and keeps the state bounded — the same tradeoff a
    streaming implementation makes. Both engines expand the SAME
    coefficient list (the oracle SQL is generated from it), partial
    sums in the same lag order, so parity is exact. One shuffle on
    user_id; 10 lags over one ordered pass."""
    t = load_tables(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    num = sum(
        (
            F.coalesce(
                F.lag("value", j).over(w) * F.lit((1 - _EWMA_ALPHA) ** j), F.lit(0.0)
            )
            for j in range(_EWMA_DEPTH)
        ),
        F.lit(0.0),
    )
    den = sum(
        (
            F.when(
                F.lag("value", j).over(w).isNotNull(),
                F.lit((1 - _EWMA_ALPHA) ** j),
            ).otherwise(F.lit(0.0))
            for j in range(_EWMA_DEPTH)
        ),
        F.lit(0.0),
    )
    return t["events"].select(
        "user_id",
        "event_id",
        ts_us("ts").alias("ts_us"),
        r6(num / den).alias("ewma"),
    )


@query(
    "ts_hierarchical_rollup",
    oracle="""
    SELECT epoch_us(date_trunc('day', ts)) AS day_us,
           event_type,
           count(*) AS n_events,
           round(sum(value), 2) AS sum_value,
           round(round(sum(value), 2) / count(*), 6) AS avg_value,
           round(min(value), 2) AS min_value,
           round(max(value), 2) AS max_value
    FROM events GROUP BY 1, 2
    """,
)
def ts_hierarchical_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical time rollup via RE-AGGREGATABLE PARTIALS (the
    hypertable continuous-aggregate cascade): aggregate raw events
    once into hourly partials (count/sum/min/max per (hour,
    event_type)), then derive the daily level FROM THE PARTIALS —
    sum-of-counts, sum-of-sums, min-of-mins, max-of-maxes, with avg
    reconstituted as sum/count (never avg-of-avgs). The oracle
    aggregates raw→day directly, so the value-hash pins the cascade
    identity: rolling up partials loses nothing vs rescanning raw.

    100 TB story: the hourly partial table is ~|hours × types| rows
    regardless of event volume; day/week/month dashboards re-aggregate
    partials (thousands of rows) instead of rescanning the raw table.
    For NDV metrics — the one family that is NOT exactly
    re-aggregatable — see agg_hll_partial_merge (sketch partials)."""
    t = load_tables(spark, sf_dir, "events")
    hourly = (
        t["events"]
        .groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )
    daily = (
        hourly.groupBy(F.date_trunc("day", "hour").alias("day"), "event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value").alias("sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
    )
    return daily.select(
        ts_us("day").alias("day_us"),
        "event_type",
        "n_events",
        r2(F.col("sum_value")).alias("sum_value"),
        # avg from the ROUNDED sum: raw double sums differ between
        # engines in the last ulp, and 2-decimal data divided by
        # round counts lands exactly on rounding boundaries (the
        # sf0.01 sweep caught 3609.66/64 = 56.4009375 flipping r6).
        # r2(sum) is bit-identical cross-engine, so the division —
        # and hence r6 — is too.
        r6(r2(F.col("sum_value")) / F.col("n_events")).alias("avg_value"),
        r2(F.col("min_value")).alias("min_value"),
        r2(F.col("max_value")).alias("max_value"),
    )


COVER_US = 300_000_000  # each event covers [ts, ts + 5 min] (µs)


@query(
    "window_interval_coverage",
    oracle=f"""
    WITH iv AS (
      SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) + {COVER_US} AS e
      FROM events
    ), flagged AS (
      SELECT user_id, s, e,
             CASE WHEN s > max(e) OVER (
               PARTITION BY user_id ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) OR max(e) OVER (
               PARTITION BY user_id ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) IS NULL THEN 1 ELSE 0 END AS new_island
      FROM iv
    ), islands AS (
      SELECT user_id, s, e,
             sum(new_island) OVER (
               PARTITION BY user_id ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS island_id
      FROM flagged
    ), merged AS (
      SELECT user_id, island_id, min(s) AS island_s, max(e) AS island_e
      FROM islands GROUP BY user_id, island_id
    )
    SELECT user_id,
           count(*) AS n_islands,
           CAST(sum(island_e - island_s) AS BIGINT) AS covered_us
    FROM merged GROUP BY user_id
    """,
)
def window_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-union coverage (merge overlapping spans): each event
    covers [ts, ts+5min]; per user, overlapping spans merge into
    islands and the answer is islands + total covered time — session
    wall-clock, sensor uptime, SLA coverage. The sweep is the
    gaps-and-islands generalization for INTERVALS (window_gaps_islands
    merges adjacent discrete days): an island starts where start >
    running-max of all PRIOR ends (not lag(e) — an earlier long span
    can swallow several later ones), island id = running sum of
    starts, then one groupBy per island. Two window passes + one agg
    over the same (user_id ORDER BY s) partitioning — Spark plans a
    single sort+exchange reused by both windows. All arithmetic in
    integer µs — exact cross-engine."""
    t = load_tables(spark, sf_dir, "events")
    iv = t["events"].select(
        "user_id",
        ts_us("ts").alias("s"),
        (ts_us("ts") + COVER_US).alias("e"),
    )
    return interval_coverage(iv, "user_id")


def interval_coverage(iv: DataFrame, key: str) -> DataFrame:
    """Merge overlapping [s, e] spans per key into islands; return
    (key, n_islands, covered_us). The production sweep behind
    window_interval_coverage, shared with its property test so the
    running-max island logic is pinned to one implementation."""
    w_prev = (
        Window.partitionBy(key)
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy(key)
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prev_max_e = F.max("e").over(w_prev)
    flagged = iv.withColumn(
        "new_island",
        F.when(prev_max_e.isNull() | (F.col("s") > prev_max_e), 1).otherwise(0),
    )
    islands = flagged.withColumn("island_id", F.sum("new_island").over(w_run))
    merged = islands.groupBy(key, "island_id").agg(
        F.min("s").alias("island_s"), F.max("e").alias("island_e")
    )
    return merged.groupBy(key).agg(
        F.count("*").alias("n_islands"),
        F.sum(F.col("island_e") - F.col("island_s")).alias("covered_us"),
    )


@query(
    "window_cusum_drift",
    oracle="""
    WITH g AS (
      SELECT round(avg(value), 6) AS mu,
             round(stddev_samp(value), 6) AS sd
      FROM events
    ), cs AS (
      SELECT user_id, sd,
             sum(value - mu) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS c
      FROM events, g
    )
    SELECT user_id,
           count(*) AS n_events,
           round(max(abs(c)), 2) AS max_abs_cusum,
           max(abs(c)) > 5 * any_value(sd) AS drift_flag
    FROM cs GROUP BY user_id
    """,
)
def window_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM drift detection — the sequential change-point monitor
    for per-key metric streams (data-quality drift, sensor failure,
    behavioral shift): accumulate each event's deviation from the
    corpus mean in event-time order; a key whose metric genuinely
    shifted accumulates a one-sided excursion that random noise
    cannot sustain (random-walk excursions grow √n, a drift grows n).
    Flag when max|CUSUM| exceeds 5·σ. One 1-row broadcast (rounded μ,
    σ — rounded so the running sums are computed from bit-identical
    inputs in both engines, and the ordered per-key summation itself
    is order-pinned by (ts, event_id)), one window pass, one agg —
    the monitor costs a single scan at any scale."""
    t = load_tables(spark, sf_dir, "events")
    g = t["events"].agg(
        r6(F.avg("value")).alias("mu"),
        r6(F.stddev_samp("value")).alias("sd"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cs = (
        t["events"]
        .join(F.broadcast(g))
        .withColumn("c", F.sum(F.col("value") - F.col("mu")).over(w))
    )
    return cs.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        r2(F.max(F.abs("c"))).alias("max_abs_cusum"),
        (F.max(F.abs("c")) > 5 * F.any_value("sd")).alias("drift_flag"),
    )


@query(
    "window_time_weighted_avg",
    oracle="""
    WITH seg AS (
      SELECT user_id, value,
             epoch_us(ts) AS t,
             lead(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS t_next
      FROM events
    )
    SELECT user_id,
           CAST(count_if(t_next IS NOT NULL) AS BIGINT) AS n_segments,
           CAST(sum(t_next - t) AS BIGINT) AS span_us,
           round(sum(value * (t_next - t)) / sum(t_next - t), 6) AS twap
    FROM seg WHERE t_next IS NOT NULL
    GROUP BY user_id
    """,
)
def window_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average (TWAP): each observation holds until the
    next one, so its weight is its holding DURATION, not 1 — the
    correct average for irregularly-sampled series (a plain avg
    overweights bursts). lead() pairs each event with its successor
    (event_id tiebreak → deterministic chain), the last open-ended
    segment is dropped, weights are exact integer µs. One window pass
    + one agg on the same user partitioning. The division runs on the
    integer-weighted double sum — r6 absorbs the engines' last-ulp
    summation difference."""
    t = load_tables(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seg = t["events"].select(
        "user_id",
        "value",
        ts_us("ts").alias("t"),
        F.lead(ts_us("ts")).over(w).alias("t_next"),
    )
    dur = F.col("t_next") - F.col("t")
    return (
        seg.where(F.col("t_next").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count_if(F.col("t_next").isNotNull()).alias("n_segments"),
            F.sum(dur).cast("long").alias("span_us"),
            r6(F.sum(F.col("value") * dur) / F.sum(dur)).alias("twap"),
        )
    )


@query(
    "window_max_drawdown",
    oracle="""
    SELECT user_id,
           count(*) AS n_events,
           round(max(running_peak - equity), 2) AS max_drawdown,
           round(sum(value), 2) AS final_equity
    FROM (
      SELECT user_id, value, equity,
             max(equity) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS running_peak
      FROM (
        SELECT user_id, ts, event_id, value,
               sum(value) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS equity
        FROM events
      ) x
    ) y
    GROUP BY user_id
    """,
)
def window_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown — the canonical path-dependent risk metric
    (largest peak-to-trough fall of the running total), unreachable
    for plain aggregates because it depends on ORDER: equity =
    running sum of value, running peak = running max of equity,
    drawdown = peak − equity, answer = max of that; final_equity is
    the plain total (the path's endpoint). Two stacked window frames
    over ONE (user_id, ts, event_id) sort — Spark plans a single
    exchange+sort reused by both — then one agg: the metric costs one
    ordered pass at any scale. Summation order is pinned by the sort
    in both engines, so equity is bit-identical; r2 is
    belt-and-braces."""
    t = load_tables(spark, sf_dir, "events")
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    eq = t["events"].select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.sum("value").over(w_run).alias("equity"),
    )
    peaked = eq.withColumn("running_peak", F.max("equity").over(w_run))
    return peaked.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        r2(F.max(F.col("running_peak") - F.col("equity"))).alias("max_drawdown"),
        r2(F.sum("value")).alias("final_equity"),
    )


from mercurygate_spark.operators.ohlc import (
    OHLC_ORACLE_SQL,
    bar_start,
    ohlc_aggs,
    ohlc_ord,
)


@query("ts_ohlc_bars", oracle=OHLC_ORACLE_SQL)
def ts_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC downsampling (tick stream → hourly bars per series): open/
    close are min_by/max_by over the total (ts, event_id) order, high/
    low plain min/max — so the WHOLE bar is ONE partially-aggregable
    groupBy. That physical shape is the point versus the window
    formulation (window_first_last): first_value-over-window must sort
    every partition before answering, while min_by/max_by combine
    map-side — each executor keeps one candidate row per (series,
    bar), and the shuffle moves one pre-aggregated row per group per
    map task instead of every tick. At 100 TB of ticks that is the
    difference between a shuffle proportional to the bar count and one
    proportional to the tick count. Values pass through raw (no
    derived floats), so parity is exact; the oracle states the same
    semantics in the windowed form DuckDB optimizes best."""
    t = load_tables(spark, sf_dir, "events")
    ev = t["events"].select(
        "event_type",
        bar_start("ts").alias("bar_us"),
        "value",
        ohlc_ord().alias("ord"),
    )
    return ev.groupBy("event_type", "bar_us").agg(*ohlc_aggs(F.col("ord")))


@query(
    "ts_anomaly_mad",
    oracle="""
    WITH med AS (
      SELECT event_type, floor(median(value)*1000000+0.5)/1000000 AS med
      FROM events GROUP BY event_type
    ), dev AS (
      SELECT e.event_type, e.event_id, e.value,
             abs(e.value - m.med) AS adev, m.med AS med
      FROM events e JOIN med m USING (event_type)
    ), mad AS (
      SELECT event_type, floor(median(adev)*1000000+0.5)/1000000 AS mad
      FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           count(*) AS n_events,
           min(d.med) AS med,
           min(m.mad) AS mad,
           CAST(sum(CASE WHEN d.adev > 4.4478 * m.mad THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers,
           floor(max(d.adev)*1000000+0.5)/1000000 AS max_abs_dev,
           (max({'adev': d.adev, 'event_id': d.event_id})).event_id
             AS top_outlier_id
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY d.event_type
    """,
)
def ts_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-series anomaly detection: median + MAD (median
    absolute deviation), flagging events whose deviation exceeds
    3 sigma-equivalents (4.4478 = 3 x 1.4826, the normal-consistency
    constant). Two holistic median passes grouped by event_type; the
    5-row per-series stats frames are explicitly broadcast back, so
    the event stream is scanned twice but never shuffled beyond the
    two grouped medians. Cross-engine float doctrine: med and mad are
    r6-quantized BEFORE any downstream comparison, so the outlier
    threshold compares bit-identical doubles in both engines (the
    remaining ops are IEEE +,-,*,abs — exactly rounded everywhere).
    The deterministic top-outlier pick is max-of-struct
    (adev, event_id) — never a bare max_by, whose tie behavior is
    engine-defined. Exact median is inherently holistic (each group's
    values buffer on one reducer); at 100 TB the same query swaps in
    the mergeable sketch path (agg_approx_quantile) — this key pins
    the exact-stats semantics the sketch is graded against."""
    t = load_tables(spark, sf_dir, "events")
    ev = t["events"].select("event_type", "event_id", "value")
    med = ev.groupBy("event_type").agg(r6(F.median("value")).alias("med"))
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(r6(F.median("adev")).alias("mad"))
    thr = F.lit(4.4478) * F.col("mad")
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("med").alias("med"),
            F.min("mad").alias("mad"),
            F.sum(F.when(F.col("adev") > thr, 1).otherwise(0))
            .cast("long")
            .alias("n_outliers"),
            r6(F.max("adev")).alias("max_abs_dev"),
            F.max(F.struct(F.col("adev"), F.col("event_id")))
            .getField("event_id")
            .alias("top_outlier_id"),
        )
    )


@query(
    "ts_seasonal_decompose",
    oracle="""
    WITH base AS (
      SELECT event_type,
             ((epoch_us(ts) // 3600000000) % 24 + 24) % 24 AS hod,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events
    ), hodagg AS (
      SELECT event_type, hod, count(*) AS n_events,
             CAST(sum(cents) AS DOUBLE) AS sum_cents
      FROM base GROUP BY event_type, hod
    ), overall AS (
      SELECT event_type,
             CAST(sum(cents) AS DOUBLE) AS tot_cents,
             count(*) AS tot_n
      FROM base GROUP BY event_type
    )
    SELECT h.event_type, h.hod, h.n_events,
           floor(((h.sum_cents / h.n_events) / 100) * 1000000 + 0.5) / 1000000
             AS mean_value,
           floor(((h.sum_cents / h.n_events) / 100
                  - (o.tot_cents / o.tot_n) / 100) * 1000000 + 0.5) / 1000000
             AS seasonal_delta,
           CASE WHEN (h.sum_cents / h.n_events)
                     = max(h.sum_cents / h.n_events)
                         OVER (PARTITION BY h.event_type)
                THEN 1 ELSE 0 END AS is_peak
    FROM hodagg h JOIN overall o USING (event_type)
    """,
)
def ts_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal profile extraction (the additive-decomposition seasonal
    term): per (series, hour-of-day) mean value, its delta against the
    series mean, and a peak-hour flag. Exactness doctrine: values are
    quantized to integer cents BEFORE any aggregation, so every sum is
    exact integer arithmetic (double summation is order-dependent;
    integer summation is not) and the means are single exact-rounded
    divisions — the peak comparison then operates on bit-identical
    doubles in both engines. Hour-of-day comes from pure integer
    epoch-microsecond arithmetic, not calendar functions — no timezone
    surface at all. Plan: two partial-aggregable groupBys sharing one
    scan, the 5-row series-means frame broadcast back, and a
    24-row-per-series window for the peak flag — nothing scales with
    the event count but the first groupBy's map side."""
    t = load_tables(spark, sf_dir, "events")
    base = t["events"].select(
        "event_type",
        # floor-division hour bucket, not `div` (which truncates toward
        # zero): us - pmod(us, 3600000000) is exactly divisible, so the
        # quotient is the floored hour index for ANY epoch sign, and the
        # final pmod lands it in 0..23 — mirroring the oracle's
        # ((x // 3600000000) % 24 + 24) % 24 (DuckDB // floors, but its
        # % keeps the dividend's sign). Same fix class as ohlc.bar_start.
        F.pmod(
            ((F.expr("unix_micros(ts)") - F.pmod(F.expr("unix_micros(ts)"), F.lit(3600000000)))
             / F.lit(3600000000)).cast("long"),
            F.lit(24),
        ).alias("hod"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    hodagg = base.groupBy("event_type", "hod").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("cents").cast("double").alias("sum_cents"),
    )
    overall = base.groupBy("event_type").agg(
        F.sum("cents").cast("double").alias("tot_cents"),
        F.count(F.lit(1)).alias("tot_n"),
    )
    mean_c = F.col("sum_cents") / F.col("n_events")
    mean_v = mean_c / F.lit(100)
    overall_v = F.col("tot_cents") / F.col("tot_n") / F.lit(100)
    w = Window.partitionBy("event_type")
    return (
        hodagg.join(F.broadcast(overall), "event_type")
        .select(
            "event_type",
            "hod",
            "n_events",
            r6(mean_v).alias("mean_value"),
            r6(mean_v - overall_v).alias("seasonal_delta"),
            F.when(mean_c == F.max(mean_c).over(w), 1).otherwise(0).alias("is_peak"),
        )
    )
