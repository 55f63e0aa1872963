"""Additional Gold analytics (SURVEY.md §2c long tail): pivot,
exact/approx percentiles, cube, conditional aggregation, batch
sessionization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mercurygate_spark.functions import r2, r4, r6, ts_us
from mercurygate_spark.operators.graph import pagerank, pagerank_oracle_sql
from mercurygate_spark.operators.sessionize import sessionize
from mercurygate_spark.queries.registry import load_tables, query

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@query(
    "agg_pivot_event_types",
    oracle="""
    SELECT user_id,
           count(*) FILTER (event_type = 'click')    AS n_click,
           count(*) FILTER (event_type = 'error')    AS n_error,
           count(*) FILTER (event_type = 'purchase') AS n_purchase,
           count(*) FILTER (event_type = 'signup')   AS n_signup,
           count(*) FILTER (event_type = 'view')     AS n_view
    FROM events GROUP BY user_id
    """,
)
def agg_pivot_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide KPI matrix): events per user per type. Explicit
    value list → no extra distinct-values job at scale; missing cells
    coalesced to 0 to match SQL conditional counts."""
    t = load_tables(spark, sf_dir, "events")
    p = t["events"].groupBy("user_id").pivot("event_type", EVENT_TYPES).count()
    return p.select(
        "user_id",
        *[F.coalesce(F.col(et), F.lit(0)).alias(f"n_{et}") for et in EVENT_TYPES],
    )


@query(
    "agg_percentile",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 4) AS p50_price,
           round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price,
           round(quantile_cont(l_quantity, 0.5), 4) AS p50_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (both engines use the
    same linear-interpolation definition). At 100 TB exact percentile
    requires a full sort per group — see agg_approx_quantile for the
    sketch-based scale path."""
    t = load_tables(spark, sf_dir, "lineitem")
    li = t["lineitem"]

    def rp(c, q, alias):
        return (F.floor(F.percentile(F.col(c), F.lit(q)) * 10000 + F.lit(0.5)) / 10000).alias(alias)

    return li.groupBy("l_returnflag").agg(
        rp("l_extendedprice", 0.5, "p50_price"),
        rp("l_extendedprice", 0.9, "p90_price"),
        rp("l_quantity", 0.5, "p50_qty"),
    )


GK_ACCURACY = 10000          # percentile_approx accuracy → rank error 1/accuracy
GK_RANK_EPS = 10.0 / GK_ACCURACY  # 10× the guaranteed rank error as acceptance band


@query(
    "agg_approx_quantile",
    oracle=f"""
    SELECT l_returnflag,
           count(*) AS n_rows,
           true AS p50_within_bound,
           true AS p90_within_bound
    FROM lineitem GROUP BY l_returnflag
    -- bound: approx percentile value must lie between the exact
    -- interpolated percentiles at rank q +/- {GK_RANK_EPS}
    -- (Greenwald-Khanna guarantees rank error <= 1/accuracy = {1.0 / GK_ACCURACY})
    """,
)
def agg_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles (Greenwald-Khanna sketch) — the 100 TB
    substitute for exact percentile: mergeable constant-size state, no
    sort. Sketch values are engine-specific, so the ORACLE CONTRACT is
    the published rank-error bound: the query outputs booleans
    asserting each approx value lies between the exact percentiles at
    rank q±10/accuracy; the oracle emits literal TRUEs — the hash gate
    fails iff the sketch violates its guarantee."""
    t = load_tables(spark, sf_dir, "lineitem")
    li = t["lineitem"]
    agg = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n_rows"),
        F.percentile_approx("l_extendedprice", 0.5, GK_ACCURACY).alias("__ap50"),
        F.percentile_approx("l_extendedprice", 0.9, GK_ACCURACY).alias("__ap90"),
        F.percentile(F.col("l_extendedprice"), F.lit(0.5 - GK_RANK_EPS)).alias("__lo50"),
        F.percentile(F.col("l_extendedprice"), F.lit(0.5 + GK_RANK_EPS)).alias("__hi50"),
        F.percentile(F.col("l_extendedprice"), F.lit(0.9 - GK_RANK_EPS)).alias("__lo90"),
        F.percentile(F.col("l_extendedprice"), F.lit(0.9 + GK_RANK_EPS)).alias("__hi90"),
    )
    return agg.select(
        "l_returnflag",
        "n_rows",
        (F.col("__ap50").between(F.col("__lo50"), F.col("__hi50"))).alias("p50_within_bound"),
        (F.col("__ap90").between(F.col("__lo90"), F.col("__hi90"))).alias("p90_within_bound"),
    )


@query(
    "agg_cube",
    oracle="""
    SELECT coalesce(o_orderstatus, '<ALL>') AS status,
           coalesce(o_orderpriority, '<ALL>') AS priority,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS revenue
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 2^2 grouping sets over status × priority in one pass
    (Spark expands via Expand + single shuffle)."""
    t = load_tables(spark, sf_dir, "orders")
    return (
        t["orders"]
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n_orders"), r2(F.sum("o_totalprice")).alias("revenue"))
        .select(
            F.coalesce("o_orderstatus", F.lit("<ALL>")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("<ALL>")).alias("priority"),
            "n_orders",
            "revenue",
        )
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT coalesce(o_orderstatus, '<ALL>') AS status,
           coalesce(o_orderpriority, '<ALL>') AS priority,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS revenue
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via the SQL API (the engine's SQL surface
    — same Catalyst plan as the DataFrame rollup/cube)."""
    t = load_tables(spark, sf_dir, "orders")
    view = "orders_gs_v"
    t["orders"].createOrReplaceTempView(view)
    return spark.sql(f"""
        SELECT coalesce(o_orderstatus, '<ALL>') AS status,
               coalesce(o_orderpriority, '<ALL>') AS priority,
               count(*) AS n_orders,
               floor(sum(o_totalprice) * 100 + 0.5) / 100 AS revenue
        FROM {view}
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """)


@query(
    "fn_conditional_agg",
    oracle="""
    SELECT o_custkey,
           round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END), 2) AS finished_amt,
           round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0 END), 2) AS open_amt,
           count(*) FILTER (o_orderpriority = '1-URGENT') AS n_urgent
    FROM orders GROUP BY o_custkey
    """,
)
def fn_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation — the paid/denied/outstanding KPI shape
    over the reference's amount columns (mm_bronze_silver.py:56-62)."""
    t = load_tables(spark, sf_dir, "orders")
    return t["orders"].groupBy("o_custkey").agg(
        r2(F.sum(F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice")).otherwise(0.0))).alias("finished_amt"),
        r2(F.sum(F.when(F.col("o_orderstatus") == "O", F.col("o_totalprice")).otherwise(0.0))).alias("open_amt"),
        F.count(F.when(F.col("o_orderpriority") == "1-URGENT", 1)).alias("n_urgent"),
    )


@query(
    "window_sessionize",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts,
             CASE WHEN epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                       >= 1800 OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session,
             event_id
      FROM events
    ), numbered AS (
      SELECT user_id, ts,
             sum(new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS session_no
      FROM ordered
    )
    SELECT user_id,
           epoch_us(min(ts)) AS session_start_us,
           count(*) AS n_events
    FROM numbered GROUP BY user_id, session_no
    """,
)
def window_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (30-min gap) via operators.sessionize —
    identical semantics to stream_session_window, no streaming engine
    required."""
    t = load_tables(spark, sf_dir, "events")
    s = sessionize(t["events"], key="user_id", ts_col="ts", gap_seconds=1800,
                   order_tiebreak="event_id")
    return s.select("user_id", ts_us("session_start").alias("session_start_us"), "n_events")


@query(
    "project_unpivot",
    oracle="""
    WITH wide AS (
      SELECT o_orderstatus,
             round(sum(o_totalprice), 2) AS total_spend,
             round(avg(o_totalprice), 2) AS avg_spend,
             round(max(o_totalprice), 2) AS max_spend
      FROM orders GROUP BY o_orderstatus
    )
    SELECT o_orderstatus, 'total_spend' AS metric, total_spend AS v FROM wide
    UNION ALL
    SELECT o_orderstatus, 'avg_spend', avg_spend FROM wide
    UNION ALL
    SELECT o_orderstatus, 'max_spend', max_spend FROM wide
    """,
)
def project_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): the wide per-status KPI row folded into
    (status, metric, value) long form — the inverse of
    agg_pivot_event_types, and the shape metric stores ingest. Uses the
    native DataFrame.unpivot (Spark's UNPIVOT/stack), which is a
    zero-shuffle projection: each wide row expands in place."""
    t = load_tables(spark, sf_dir, "orders")
    wide = t["orders"].groupBy("o_orderstatus").agg(
        r2(F.sum("o_totalprice")).alias("total_spend"),
        r2(F.avg("o_totalprice")).alias("avg_spend"),
        r2(F.max("o_totalprice")).alias("max_spend"),
    )
    return wide.unpivot(
        ids=["o_orderstatus"],
        values=["total_spend", "avg_spend", "max_spend"],
        variableColumnName="metric",
        valueColumnName="v",
    )


@query(
    "project_dense_grid",
    oracle="""
    WITH grid AS (
      SELECT r_name, p.o_orderpriority
      FROM region, (SELECT DISTINCT o_orderpriority FROM orders) p
    ), actual AS (
      SELECT r_name, o_orderpriority, count(*) AS n_orders
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      GROUP BY r_name, o_orderpriority
    )
    SELECT g.r_name, g.o_orderpriority,
           coalesce(a.n_orders, 0) AS n_orders
    FROM grid g LEFT JOIN actual a
      ON g.r_name = a.r_name AND g.o_orderpriority = a.o_orderpriority
    """,
)
def project_dense_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension densification: the full region × priority grid (a
    DELIBERATE cross join of two bounded dims, 5×5) left-joined with
    the actual rollup, empty cells zero-filled — the dense-axes shape
    every reporting layer needs (missing group cells must render as 0,
    not vanish). The cross join is safe by construction: both sides
    are tiny dimension domains, never facts."""
    t = load_tables(spark, sf_dir, "orders", "customer", "nation", "region")
    grid = t["region"].select("r_name").crossJoin(
        t["orders"].select("o_orderpriority").distinct()
    )
    actual = (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "o_orderpriority")
        .agg(F.count("*").alias("__n"))
    )
    return grid.join(actual, ["r_name", "o_orderpriority"], "left").select(
        "r_name",
        "o_orderpriority",
        F.coalesce(F.col("__n"), F.lit(0)).alias("n_orders"),
    )


@query(
    "agg_funnel_steps",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ), p AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    ), depth AS (
      SELECT v.user_id,
             CASE WHEN p.t3 IS NOT NULL THEN 3
                  WHEN c.t2 IS NOT NULL THEN 2
                  ELSE 1 END AS d
      FROM v LEFT JOIN c ON v.user_id = c.user_id
             LEFT JOIN p ON v.user_id = p.user_id
    )
    SELECT step, n_users, (n_users * 1000000) // first_step AS conv_ppm
    FROM (
      SELECT 1 AS ord, 'view' AS step,
             count(*) AS n_users, count(*) AS first_step FROM depth
      UNION ALL
      SELECT 2, 'view>click',
             count(*) FILTER (d >= 2), count(*) FROM depth
      UNION ALL
      SELECT 3, 'view>click>purchase',
             count(*) FILTER (d >= 3), count(*) FROM depth
    ) ORDER BY ord
    """,
)
def agg_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view → click → purchase): a user
    advances a step only with a LATER event of the next type — the
    product-analytics shape groupBy alone can't express (each step's
    earliest valid time depends on the previous step's). Delegates to
    the n-step operator (operators/funnel.py): one filtered
    groupBy-min + same-key join per step, every shuffle on user_id so
    the exchanges reuse one partitioning. Conversion reported as
    integer ppm of the first step (exact cross-engine)."""
    from mercurygate_spark.operators.funnel import funnel_steps

    t = load_tables(spark, sf_dir, "events")
    return funnel_steps(
        t["events"],
        [
            ("view", F.col("event_type") == "view"),
            ("click", F.col("event_type") == "click"),
            ("purchase", F.col("event_type") == "purchase"),
        ],
    )


@query(
    "agg_retention_cohorts",
    oracle="""
    WITH wk AS (
      SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 // 7 AS week
      FROM events
    ), cohort AS (
      SELECT user_id, min(week) AS cohort_week FROM wk GROUP BY user_id
    )
    SELECT c.cohort_week,
           CAST(w.week - c.cohort_week AS BIGINT) AS week_offset,
           count(*) AS n_active_users
    FROM wk w JOIN cohort c ON w.user_id = c.user_id
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def agg_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts: users grouped by first-active week,
    counted in every later week they return — the classic retention
    triangle. Weeks are integer epoch-day div 7 (identical arithmetic
    both engines, no calendar/locale week rules). Plan shape: one
    distinct (user, week) shuffle, a per-user min, and a same-key
    join — all keyed on user_id, then a small (cohort, offset)
    aggregation."""
    t = load_tables(spark, sf_dir, "events")
    wk = (
        t["events"]
        .select(
            "user_id",
            F.expr("unix_micros(ts) div 86400000000 div 7").alias("week"),
        )
        .distinct()
    )
    cohort = wk.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        wk.join(cohort, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.count("*").alias("n_active_users"))
        .orderBy("cohort_week", "week_offset")
    )


@query(
    "agg_funnel_steps_n",
    oracle="""
    WITH s1 AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ), s2 AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t1
      WHERE e.event_type = 'view' GROUP BY e.user_id
    ), s3 AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t2
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ), s4 AS (
      SELECT e.user_id, min(e.ts) AS t4
      FROM events e JOIN s3 ON e.user_id = s3.user_id AND e.ts > s3.t3
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    ), depth AS (
      SELECT s1.user_id,
             CASE WHEN s4.t4 IS NOT NULL THEN 4
                  WHEN s3.t3 IS NOT NULL THEN 3
                  WHEN s2.t2 IS NOT NULL THEN 2
                  ELSE 1 END AS d
      FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
              LEFT JOIN s3 ON s1.user_id = s3.user_id
              LEFT JOIN s4 ON s1.user_id = s4.user_id
    )
    SELECT step, n_users,
           CASE WHEN first_step = 0 THEN 0
                ELSE (n_users * 1000000) // first_step END AS conv_ppm
    FROM (
      SELECT 1 AS ord, 'signup' AS step,
             count(*) AS n_users, count(*) AS first_step FROM depth
      UNION ALL
      SELECT 2, 'signup>view',
             count(*) FILTER (d >= 2), count(*) FROM depth
      UNION ALL
      SELECT 3, 'signup>view>click',
             count(*) FILTER (d >= 3), count(*) FROM depth
      UNION ALL
      SELECT 4, 'signup>view>click>purchase',
             count(*) FILTER (d >= 4), count(*) FROM depth
    ) ORDER BY ord
    """,
)
def agg_funnel_steps_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The n-step funnel operator exercised at a DIFFERENT depth than
    agg_funnel_steps (4 steps, signup-first ordering) so the general
    operator — not a 3-step special case — is what the oracle gate
    pins. Same plan shape: one filtered groupBy-min + user_id-keyed
    join per step, single partitioning lineage."""
    from mercurygate_spark.operators.funnel import funnel_steps

    t = load_tables(spark, sf_dir, "events")
    return funnel_steps(
        t["events"],
        [
            ("signup", F.col("event_type") == "signup"),
            ("view", F.col("event_type") == "view"),
            ("click", F.col("event_type") == "click"),
            ("purchase", F.col("event_type") == "purchase"),
        ],
    )


@query(
    "agg_histogram_bucket",
    oracle="""
    SELECT CASE WHEN o_totalprice < 1000.0 THEN 0
                WHEN o_totalprice >= 500000.0 THEN 11
                ELSE CAST(floor((o_totalprice - 1000.0) / 49900.0) AS BIGINT) + 1
           END AS bucket,
           count(*) AS n_orders,
           round(min(o_totalprice), 2) AS lo,
           round(max(o_totalprice), 2) AS hi
    FROM orders
    GROUP BY 1
    """,
)
def agg_histogram_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram via Spark's width_bucket (10 buckets over
    [1000, 500000), with under/overflow buckets 0 and 11). The oracle
    derives the bucket with explicit floor arithmetic, so width_bucket's
    edge semantics — not shared SQL text — are what's pinned. One
    partial+final hash agg on a derived key; at 100 TB the bucket id
    is computed map-side and only 12 groups shuffle."""
    t = load_tables(spark, sf_dir, "orders")
    return (
        t["orders"]
        .groupBy(
            F.width_bucket(F.col("o_totalprice"), F.lit(1000.0), F.lit(500000.0), F.lit(10))
            .cast("long")
            .alias("bucket")
        )
        .agg(
            F.count("*").alias("n_orders"),
            r2(F.min("o_totalprice")).alias("lo"),
            r2(F.max("o_totalprice")).alias("hi"),
        )
    )


@query(
    "agg_mode",
    oracle="""
    SELECT o_orderstatus, o_orderpriority AS mode_priority, cnt AS mode_count
    FROM (
      SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
             row_number() OVER (
               PARTITION BY o_orderstatus
               ORDER BY count(*) DESC, o_orderpriority ASC
             ) AS rn
      FROM orders
      GROUP BY o_orderstatus, o_orderpriority
    ) WHERE rn = 1
    """,
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mode (most frequent value) per group. Built as
    count-then-rank rather than Spark's native ``mode()`` because the
    native tie-break is unspecified — here ties resolve to the
    lexicographically smallest value, identically in both engines.
    Two stages: a partial+final hash agg shrinks the fact to
    |status×priority| rows, then the rank window runs on that tiny
    grid — the expensive pass never sees a window function."""
    t = load_tables(spark, sf_dir, "orders")
    counts = t["orders"].groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("cnt")
    )
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("cnt").desc(), F.col("o_orderpriority").asc()
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("mode_priority"),
            F.col("cnt").alias("mode_count"),
        )
    )


@query(
    "agg_entropy",
    oracle="""
    WITH counts AS (
      SELECT user_id, event_type, count(*) AS c
      FROM events GROUP BY 1, 2
    ), tot AS (
      SELECT user_id, sum(c) AS n FROM counts GROUP BY 1
    )
    SELECT counts.user_id,
           count(*) AS n_types,
           round(-sum((c * 1.0 / n) * ln(c * 1.0 / n)), 6) AS entropy_nats
    FROM counts JOIN tot USING (user_id)
    GROUP BY counts.user_id
    """,
)
def agg_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each user's event-type distribution — the
    behavioral-diversity score data curation uses to separate bots
    (entropy ~0) from organic users. Two chained hash aggs on the SAME
    user_id key — the second groupBy and the join reuse the first
    shuffle's partitioning, so the fact shuffles once."""
    t = load_tables(spark, sf_dir, "events")
    counts = t["events"].groupBy("user_id", "event_type").agg(F.count("*").alias("c"))
    tot = counts.groupBy("user_id").agg(F.sum("c").alias("n"))
    p = F.col("c") * F.lit(1.0) / F.col("n")
    return (
        counts.join(tot, "user_id")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_types"),
            r6(-F.sum(p * F.log(p))).alias("entropy_nats"),
        )
    )


@query("graph_pagerank", oracle=pagerank_oracle_sql())
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (3 power iterations, d=0.85) on the order↔part
    bipartite graph — distinct lineitem (order, part) pairs edged in
    BOTH directions so no node dangles. The oracle is the exact
    unrolled-CTE twin generated by the same module that runs the Spark
    loop (operators/graph.py), so iteration count and damping cannot
    drift. Per-iteration cost: one src-keyed join + one dst-keyed
    groupBy-sum; ranks checkpoint each round (lineage truncation, the
    connected_components doctrine)."""
    t = load_tables(spark, sf_dir, "lineitem")
    base = (
        t["lineitem"]
        .select(
            F.concat(F.lit("o"), F.col("l_orderkey").cast("string")).alias("o"),
            F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias("p"),
        )
        .distinct()
    )
    edges = base.select(F.col("o").alias("src"), F.col("p").alias("dst")).unionAll(
        base.select(F.col("p").alias("src"), F.col("o").alias("dst"))
    )
    ranks = pagerank(edges)  # PAGERANK_ITERS — one constant, both sides
    return ranks.select("node", r6(F.col("pr")).alias("pr"))


@query(
    "agg_gini",
    oracle="""
    WITH spend AS (
      SELECT c_mktsegment, c_custkey, sum(o_totalprice) AS x
      FROM customer JOIN orders ON c_custkey = o_custkey
      GROUP BY 1, 2
    ), ranked AS (
      SELECT c_mktsegment, x,
             row_number() OVER (
               PARTITION BY c_mktsegment ORDER BY x, c_custkey
             ) AS rk
      FROM spend
    )
    SELECT c_mktsegment,
           count(*) AS n_customers,
           round(2.0 * sum(rk * x) / (count(*) * sum(x))
                 - (count(*) + 1.0) / count(*), 6) AS gini
    FROM ranked GROUP BY c_mktsegment
    """,
)
def agg_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer spend per market segment — the
    revenue-concentration KPI (0 = everyone spends alike, →1 = one
    whale). Rank formulation G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n over
    ascending spend; ties contribute identically under any permutation
    so the row_number tie-break (custkey) affects nothing. Per-segment
    windows on the post-agg spend frame (|customers| rows), never on
    the fact."""
    t = load_tables(spark, sf_dir, "customer", "orders")
    spend = (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("c_mktsegment", "c_custkey")
        .agg(F.sum("o_totalprice").alias("x"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy("x", "c_custkey")
    ranked = spend.withColumn("rk", F.row_number().over(w))
    n, sx = F.count("*"), F.sum("x")
    return ranked.groupBy("c_mktsegment").agg(
        n.alias("n_customers"),
        r6(
            F.lit(2.0) * F.sum(F.col("rk") * F.col("x")) / (n * sx)
            - (n + F.lit(1.0)) / n
        ).alias("gini"),
    )


@query(
    "window_rolling_active_users",
    oracle="""
    WITH du AS (
      SELECT DISTINCT
             CAST(date_diff('day', DATE '1970-01-01', date_trunc('day', ts)) AS BIGINT) AS di,
             user_id
      FROM events
    ), bounds AS (
      SELECT max(di) AS max_di FROM du
    ), contrib AS (
      SELECT unnest(generate_series(di, least(di + 6, bounds.max_di))) AS target_di,
             user_id
      FROM du CROSS JOIN bounds
    )
    SELECT target_di AS di,
           count(DISTINCT user_id) AS wau
    FROM contrib GROUP BY 1
    """,
)
def window_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users (WAU) per day — the engagement KPI a
    naive implementation writes as a per-day correlated COUNT(DISTINCT)
    over a 7-day self-join. Here each distinct (day, user) pair
    CONTRIBUTES itself to its 7 target days via sequence+explode
    (bounded 7× fanout of the already-deduped pair set), then one
    distinct-count per target day — two hash aggs, no self-join, no
    window over an unbounded frame. Days past the data's edge are
    clamped so both engines emit the same day range."""
    t = load_tables(spark, sf_dir, "events")
    du = (
        t["events"]
        .select(
            F.datediff(F.date_trunc("day", "ts"), F.lit("1970-01-01").cast("date"))
            .cast("long")
            .alias("di"),
            "user_id",
        )
        .distinct()
    )
    bounds = du.agg(F.max("di").alias("max_di"))
    contrib = du.crossJoin(F.broadcast(bounds)).select(
        F.explode(
            F.sequence(F.col("di"), F.least(F.col("di") + 6, F.col("max_di")))
        ).alias("di"),
        "user_id",
    )
    return contrib.groupBy("di").agg(F.count_distinct("user_id").alias("wau"))


@query(
    "agg_regression_trend",
    oracle="""
    WITH daily AS (
      SELECT c_mktsegment,
             CAST(date_diff('day', DATE '1970-01-01', date_trunc('day', o_orderdate)) AS BIGINT) AS x,
             sum(o_totalprice) AS y
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1, 2
    )
    SELECT c_mktsegment,
           count(*) AS n_days,
           round((count(*) * sum(x * y) - sum(x) * sum(y))
                 / (count(*) * sum(x * x) - sum(x) * sum(x)), 4) AS slope,
           round((sum(y) - ((count(*) * sum(x * y) - sum(x) * sum(y))
                 / (count(*) * sum(x * x) - sum(x) * sum(x))) * sum(x))
                 / count(*), 2) AS intercept
    FROM daily GROUP BY c_mktsegment
    """,
)
def agg_regression_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment revenue trend: OLS slope/intercept of daily revenue
    vs epoch-day, from the closed-form normal equations written out as
    raw moment sums (NOT regr_slope — both engines evaluate the same
    Σx/Σy/Σxy/Σx² expression, so there is no estimator-implementation
    drift to reconcile). The daily agg shrinks the fact to
    |segments|×|days| rows before any double math; one extra hash agg
    computes all four moments in a single pass."""
    t = load_tables(spark, sf_dir, "orders", "customer")
    daily = (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            "c_mktsegment",
            F.datediff(
                F.date_trunc("day", "o_orderdate"), F.lit("1970-01-01").cast("date")
            )
            .cast("long")
            .alias("x"),
        )
        .agg(F.sum("o_totalprice").alias("y"))
    )
    n = F.count("*")
    sx, sy = F.sum("x"), F.sum("y")
    sxy, sxx = F.sum(F.col("x") * F.col("y")), F.sum(F.col("x") * F.col("x"))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return daily.groupBy("c_mktsegment").agg(
        n.alias("n_days"),
        r4(slope).alias("slope"),
        r2((sy - slope * sx) / n).alias("intercept"),
    )


@query(
    "agg_grouping_flags",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(grouping(o_orderstatus) AS INT) AS g_status,
           CAST(grouping(o_orderpriority) AS INT) AS g_priority,
           count(*) AS n_orders
    FROM orders
    GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
    """,
)
def agg_grouping_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """grouping() flags on a ROLLUP — the only correct way to tell a
    rolled-up NULL from a data NULL once nullable group keys exist
    (filtering on `col IS NULL` conflates the two and silently merges
    subtotal rows into a real group). Same partial-agg expansion as
    agg_rollup_cube; the flags are free metadata on each grouping
    set."""
    t = load_tables(spark, sf_dir, "orders")
    return (
        t["orders"]
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_priority"),
            F.count("*").alias("n_orders"),
        )
        .select(
            "o_orderstatus", "o_orderpriority", "g_status", "g_priority", "n_orders"
        )
    )


@query(
    "agg_sequence_pattern",
    oracle="""
    WITH seqs AS (
      SELECT user_id,
             string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
               AS seq
      FROM events GROUP BY user_id
    )
    SELECT user_id,
           CAST(length(seq) AS BIGINT) AS seq_len,
           regexp_matches(seq, 'v.*c.*p') AS has_funnel,
           CAST(len(regexp_extract_all(seq, 'v[^p]*p')) AS BIGINT) AS n_vp_spans
    FROM seqs
    """,
)
def agg_sequence_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-sequence pattern matching (MATCH_RECOGNIZE / CEP-lite):
    encode each user's time-ordered event stream as a compact letter
    string (one char per event; first letters are unique across the 5
    event types), then run ordered-pattern queries as REGEXES on the
    encoding — `v.*c.*p` = 'viewed, later clicked, later purchased'
    (ordered containment, the funnel), `v[^p]*p` counted non-
    overlapping = view→purchase conversion spans with no purchase in
    between (leftmost-match semantics agree across regex engines).

    Scale shape: one groupBy(user) with collect_list of (ts, id,
    letter) structs — the per-user sequence is bounded by that user's
    event count, never the table; array_sort inside the group replaces
    a global window sort. Unlike agg_funnel_steps (min-ts chained
    aggs), this expresses ARBITRARY ordered patterns — the regex is
    the query language. Ties broken by event_id so the encoding is
    deterministic in both engines."""
    t = load_tables(spark, sf_dir, "events")
    letter = F.substring("event_type", 1, 1)
    seqs = (
        t["events"]
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("ts"), F.col("event_id"), letter.alias("l")
                            )
                        )
                    ),
                    lambda s: s["l"],
                ),
                "",
            ).alias("seq")
        )
    )
    return seqs.select(
        "user_id",
        F.length("seq").cast("long").alias("seq_len"),
        F.col("seq").rlike("v.*c.*p").alias("has_funnel"),
        F.size(F.regexp_extract_all(F.col("seq"), F.lit("v[^p]*p"), 0)).cast(
            "long"
        ).alias("n_vp_spans"),
    )


@query(
    "agg_ab_test_stats",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2
               AS arm,
             sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END)
               AS spend
      FROM events GROUP BY user_id
    ), arms AS (
      SELECT arm, count(*) AS n,
             round(avg(spend), 6) AS mean_spend,
             round(var_samp(spend), 6) AS var_spend
      FROM per_user GROUP BY arm
    ), wide AS (
      SELECT max(CASE WHEN arm = 0 THEN n END) AS n_a,
             max(CASE WHEN arm = 1 THEN n END) AS n_b,
             max(CASE WHEN arm = 0 THEN mean_spend END) AS mean_a,
             max(CASE WHEN arm = 1 THEN mean_spend END) AS mean_b,
             max(CASE WHEN arm = 0 THEN var_spend END) AS var_a,
             max(CASE WHEN arm = 1 THEN var_spend END) AS var_b
      FROM arms
    )
    SELECT n_a, n_b, mean_a, mean_b,
           round((mean_a - mean_b) / sqrt(var_a / n_a + var_b / n_b), 6)
             AS z_score,
           abs((mean_a - mean_b) / sqrt(var_a / n_a + var_b / n_b)) > 1.96
             AS significant
    FROM wide
    """,
)
def agg_ab_test_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: users hash-split into two arms
    (md5(user_id) % 2 — the same content-hash assignment the sampling
    family uses, so arm membership is reproducible on any engine and
    any re-shard), per-user purchase spend aggregated, then Welch's
    z = (μA−μB)/√(σ²A/nA + σ²B/nB) with the 1.96 two-sided 5 % gate.
    Two chained aggs (user rollup, then two arm rows) + a 2-row pivot
    — at 100 TB the experiment readout costs one events scan. The z
    arithmetic runs on the r6-ROUNDED per-arm moments, so both
    engines divide bit-identical inputs (the raw double sums differ
    in the last ulp; the derived scalar must not)."""
    t = load_tables(spark, sf_dir, "events")
    from mercurygate_spark.functions import md5_long, r6

    per_user = (
        t["events"]
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(
                    0.0
                )
            ).alias("spend")
        )
        .withColumn("arm", md5_long(F.col("user_id").cast("string")) % 2)
    )
    arms = per_user.groupBy("arm").agg(
        F.count("*").alias("n"),
        r6(F.avg("spend")).alias("mean_spend"),
        r6(F.var_samp("spend")).alias("var_spend"),
    )
    wide = arms.agg(
        F.max(F.when(F.col("arm") == 0, F.col("n"))).alias("n_a"),
        F.max(F.when(F.col("arm") == 1, F.col("n"))).alias("n_b"),
        F.max(F.when(F.col("arm") == 0, F.col("mean_spend"))).alias("mean_a"),
        F.max(F.when(F.col("arm") == 1, F.col("mean_spend"))).alias("mean_b"),
        F.max(F.when(F.col("arm") == 0, F.col("var_spend"))).alias("var_a"),
        F.max(F.when(F.col("arm") == 1, F.col("var_spend"))).alias("var_b"),
    )
    z = (F.col("mean_a") - F.col("mean_b")) / F.sqrt(
        F.col("var_a") / F.col("n_a") + F.col("var_b") / F.col("n_b")
    )
    return wide.select(
        "n_a",
        "n_b",
        "mean_a",
        "mean_b",
        r6(z).alias("z_score"),
        (F.abs(z) > 1.96).alias("significant"),
    )


@query(
    "agg_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS prev_type
      FROM events
    ), c AS (
      SELECT prev_type, event_type AS next_type, count(*) AS n_transitions
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY 1, 2
    ), tot AS (
      SELECT prev_type, sum(n_transitions) AS row_total FROM c GROUP BY 1
    )
    SELECT c.prev_type, c.next_type, c.n_transitions,
           round(c.n_transitions * 1.0 / t.row_total, 6) AS p_transition
    FROM c JOIN tot t USING (prev_type)
    """,
)
def agg_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    streams: lag() pairs each event with its predecessor in event
    time (ties broken by event_id, so the chain is deterministic in
    both engines), transitions counted globally and row-normalized
    into P(next | prev) — the behavioral model behind next-action
    prediction, anomaly scoring (improbable chains), and synthetic
    session generation. One window pass partitioned by user + two
    tiny aggregates over the 5×5 state space; the probability divides
    exact integers, so r6 is deterministic. Complements
    agg_sequence_pattern (which MATCHES specified patterns; this
    ESTIMATES the process)."""
    t = load_tables(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = t["events"].select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    )
    c = (
        seq.where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").alias("n_transitions"))
    )
    tot = c.groupBy("prev_type").agg(F.sum("n_transitions").alias("row_total"))
    return c.join(tot, "prev_type").select(
        "prev_type",
        "next_type",
        "n_transitions",
        r6(F.col("n_transitions") / F.col("row_total")).alias("p_transition"),
    )


ATTRIB_WINDOW_US = 7 * 24 * 3600 * 1_000_000  # 7-day lookback


@query(
    "join_attribution_linear",
    oracle=f"""
    WITH pairs AS (
      SELECT c.event_id AS click_id, p.event_id AS purchase_id,
             CAST(floor(p.value * 100 + 0.5) AS BIGINT) AS v_cents,
             count(*) OVER (PARTITION BY p.event_id) AS n_clicks
      FROM events c JOIN events p
        ON c.user_id = p.user_id
       AND c.event_type = 'click' AND p.event_type = 'purchase'
       AND epoch_us(c.ts) <= epoch_us(p.ts)
       AND epoch_us(c.ts) > epoch_us(p.ts) - {ATTRIB_WINDOW_US}
    )
    SELECT click_id,
           CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(sum((v_cents * 10000) // n_clicks) AS BIGINT)
             AS total_credit_microcents
    FROM pairs GROUP BY click_id
    """,
)
def join_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: each purchase's value splits
    equally across the user's clicks in the 7-day lookback, and each
    click accumulates its credit across purchases — the marketing-
    analytics join the stream_interval_join key does as last-touch,
    here in full multi-touch batch form. Shape: ONE user-keyed
    equi-join (per-user histories bound the pair fanout — the range
    predicate rides on the join, never a cross join), one window
    keyed on purchase_id for the click count, one groupBy on
    click_id. Timestamps compare in microseconds (the engine-wide
    ns→µs truncation parity), and credit is allocated in INTEGER
    micro-cents with floor-division shares — the money-allocation
    rule that makes the cross-purchase credit sum exact and
    summation-order-independent on both engines (a float value/n sum
    measurably flips r2 rounding boundaries between engines)."""
    t = load_tables(spark, sf_dir, "events")
    ev = t["events"]
    c = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        ts_us("ts").alias("c_us"),
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        ts_us("ts").alias("p_us"),
        "value",
    )
    pairs = c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("c_us") <= F.col("p_us"))
        & (F.col("c_us") > F.col("p_us") - ATTRIB_WINDOW_US),
    )
    w_p = Window.partitionBy("purchase_id")
    v_cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    pairs = pairs.select(
        "click_id",
        "purchase_id",
        v_cents.alias("v_cents"),
        F.count("*").over(w_p).alias("n_clicks"),
    )
    return pairs.groupBy("click_id").agg(
        F.count("*").alias("n_purchases"),
        F.sum(F.expr("(v_cents * 10000) div n_clicks")).alias(
            "total_credit_microcents"
        ),
    )
