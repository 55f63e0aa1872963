"""Joins (SURVEY.md §2c "Joins" — all Gold-layer gaps; the FK pattern
mirrors claim⋈children, config.py:36-72).

Scale notes baked into each query:
- dims (region/nation/supplier at TPC-H proportions) are broadcast —
  no shuffle of the fact side;
- fact⋈fact (orders⋈lineitem) shuffles both sides on the key once;
  AQE picks SMJ/SHJ and splits skewed partitions;
- semi/anti joins never materialize right columns — cheaper than
  inner+distinct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mercurygate_spark.functions import r2, ts_us
from mercurygate_spark.operators.asof import asof_join
from mercurygate_spark.queries.registry import load_tables, query


@query(
    "join_inner_equi",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_items,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    """,
)
def join_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FK equi-join orders⋈lineitem (the claim⋈claim_payment shape) +
    KPI rollup. Both sides shuffle on the orderkey; the o_orderstatus
    filter is pushed below the join into the orders scan."""
    t = load_tables(spark, sf_dir, "orders", "lineitem")
    j = t["orders"].where(F.col("o_orderstatus") == "F").join(
        t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey")
    )
    return j.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_items"),
        r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"),
    )


@query(
    "join_left_outer",
    oracle="""
    SELECT c_custkey,
           c_mktsegment,
           count(o_orderkey) AS n_orders,
           round(coalesce(sum(o_totalprice), 0), 2) AS total_spend
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_mktsegment
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer: parents keep unmatched children (claims with no
    payments → customers with no orders), count(col) skips nulls."""
    t = load_tables(spark, sf_dir, "customer", "orders")
    j = t["customer"].join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left")
    return j.groupBy("c_custkey", "c_mktsegment").agg(
        F.count("o_orderkey").alias("n_orders"),
        r2(F.coalesce(F.sum("o_totalprice"), F.lit(0.0))).alias("total_spend"),
    )


@query(
    "join_broadcast_dim",
    oracle="""
    SELECT r_name AS region_name,
           n_name AS nation_name,
           count(*) AS n_items,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)
def join_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: fact⋈3 small dims, every dim explicitly broadcast —
    zero shuffle of the lineitem side regardless of fact size. This is
    THE 100 TB join shape: the plan must show BroadcastHashJoin ×3 and
    exactly one exchange (for the final agg)."""
    t = load_tables(spark, sf_dir, "lineitem", "supplier", "nation", "region")
    j = (
        t["lineitem"]
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return j.groupBy(
        F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name")
    ).agg(
        F.count("*").alias("n_items"),
        r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"),
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi: customers having ≥1 finished order. Right side only
    gates existence — no right columns materialized, duplicates free."""
    t = load_tables(spark, sf_dir, "customer", "orders")
    finished = t["orders"].where(F.col("o_orderstatus") == "F")
    return t["customer"].join(
        finished, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti: customers with no orders at all (orphan-parent check —
    the outer/anti-join case FIXTURES.md plants orphans for)."""
    t = load_tables(spark, sf_dir, "customer", "orders")
    return t["customer"].join(
        t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment")


@query(
    "join_theta_range",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_items,
           round(sum(l_extendedprice), 2) AS sum_price
    FROM orders JOIN lineitem
      ON o_orderkey = l_orderkey
     AND l_shipdate >= o_orderdate
     AND l_shipdate < o_orderdate + INTERVAL 60 DAY
    GROUP BY o_orderpriority
    """,
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi + range (theta) join: lineitems shipped within 60 days of
    their order date. The equi key carries the shuffle; the range
    predicate evaluates inside the join — never a cartesian. (A pure
    non-equi range join would bucketize the range key first — see
    operators.asof for the pattern.)"""
    t = load_tables(spark, sf_dir, "orders", "lineitem")
    cond = (
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("l_shipdate") >= F.col("o_orderdate"))
        & (F.col("l_shipdate") < F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
    )
    return (
        t["orders"]
        .join(t["lineitem"], cond)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_items"), r2(F.sum("l_extendedprice")).alias("sum_price"))
    )


@query(
    "join_range_bucketed",
    oracle="""
    SELECT a.event_id AS id_a, b.event_id AS id_b,
           a.user_id,
           epoch_us(a.ts) AS ts_a_us, epoch_us(b.ts) AS ts_b_us
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND a.event_id < b.event_id
     AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 60 * 1000000
    """,
)
def join_range_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True non-equi interval join: pairs of events by the same user
    within 60 s of each other. The ORACLE states the naive theta join;
    the ENGINE computes it with operators.rangejoin.ts_proximity_join
    (neighbor-bucket replication + equi-join + exact filter) — same
    result, no cartesian, shuffle scales with bucket occupancy."""
    t = load_tables(spark, sf_dir, "events")
    ev = t["events"]
    a = ev.select(F.col("event_id").alias("id_a"), "user_id", F.col("ts").alias("ts_a"))
    b = ev.select(F.col("event_id").alias("id_b"), F.col("user_id").alias("user_id_b"),
                  F.col("ts").alias("ts_b"))
    from mercurygate_spark.operators.rangejoin import ts_proximity_join

    j = ts_proximity_join(
        a, b.withColumnRenamed("user_id_b", "user_id"),
        a_ts="ts_a", b_ts="ts_b", radius_seconds=60, extra_equi=["user_id"],
    ).where(F.col("id_a") < F.col("id_b"))
    return j.select(
        "id_a", "id_b", "user_id",
        ts_us("ts_a").alias("ts_a_us"), ts_us("ts_b").alias("ts_b_us"),
    )


@query(
    "join_asof",
    oracle="""
    WITH purchases AS (
      SELECT user_id, event_id AS purchase_id, ts AS purchase_ts
      FROM events WHERE event_type = 'purchase'
    ), clicks AS (
      SELECT user_id, event_id AS click_id, ts AS click_ts
      FROM events WHERE event_type = 'click'
    ), ranked AS (
      SELECT p.user_id, p.purchase_id, p.purchase_ts, c.click_id, c.click_ts,
             row_number() OVER (
               PARTITION BY p.purchase_id
               ORDER BY c.click_ts DESC, c.click_id DESC
             ) AS rn
      FROM purchases p JOIN clicks c
        ON p.user_id = c.user_id AND c.click_ts <= p.purchase_ts
    )
    SELECT user_id, purchase_id,
           epoch_us(purchase_ts) AS purchase_ts_us,
           click_id,
           epoch_us(click_ts) AS click_ts_us
    FROM ranked WHERE rn = 1
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase event, the latest click by the
    same user at-or-before the purchase (claim-status-as-of shape,
    SURVEY.md §2c). Uses operators.asof.asof_join (join + window);
    ties broken by click_id desc — fully deterministic."""
    t = load_tables(spark, sf_dir, "events")
    ev = t["events"]
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), F.col("ts").alias("purchase_ts")
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    j = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="purchase_ts",
        right_ts="click_ts",
        right_cols=["click_id", "click_ts"],
        left_key=["purchase_id"],
    )
    return j.select(
        "user_id",
        "purchase_id",
        ts_us("purchase_ts").alias("purchase_ts_us"),
        "click_id",
        ts_us("click_ts").alias("click_ts_us"),
    )


def _purchase_click_sides(spark: SparkSession, sf_dir: str):
    ev = load_tables(spark, sf_dir, "events")["events"]
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), F.col("ts").alias("purchase_ts")
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    return purchases, clicks


@query(
    "join_asof_forward",
    oracle="""
    WITH purchases AS (
      SELECT user_id, event_id AS purchase_id, ts AS purchase_ts
      FROM events WHERE event_type = 'purchase'
    ), clicks AS (
      SELECT user_id, event_id AS click_id, ts AS click_ts
      FROM events WHERE event_type = 'click'
    ), ranked AS (
      SELECT p.user_id, p.purchase_id, p.purchase_ts, c.click_id, c.click_ts,
             row_number() OVER (
               PARTITION BY p.purchase_id
               ORDER BY c.click_ts ASC, c.click_id ASC
             ) AS rn
      FROM purchases p JOIN clicks c
        ON p.user_id = c.user_id AND c.click_ts >= p.purchase_ts
    )
    SELECT user_id, purchase_id,
           epoch_us(purchase_ts) AS purchase_ts_us,
           click_id,
           epoch_us(click_ts) AS click_ts_us
    FROM ranked WHERE rn = 1
    """,
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: for each purchase, the EARLIEST click by the
    same user at-or-after the purchase (next-touch attribution shape —
    pd.merge_asof direction='forward'). Ties broken by click_id asc."""
    purchases, clicks = _purchase_click_sides(spark, sf_dir)
    j = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="purchase_ts",
        right_ts="click_ts",
        right_cols=["click_id", "click_ts"],
        left_key=["purchase_id"],
        direction="forward",
    )
    return j.select(
        "user_id",
        "purchase_id",
        ts_us("purchase_ts").alias("purchase_ts_us"),
        "click_id",
        ts_us("click_ts").alias("click_ts_us"),
    )


ASOF_TOLERANCE_S = 3600  # 1-hour attribution window


@query(
    "join_asof_tolerance",
    oracle=f"""
    WITH purchases AS (
      SELECT user_id, event_id AS purchase_id, ts AS purchase_ts
      FROM events WHERE event_type = 'purchase'
    ), clicks AS (
      SELECT user_id, event_id AS click_id, ts AS click_ts
      FROM events WHERE event_type = 'click'
    ), ranked AS (
      SELECT p.user_id, p.purchase_id, p.purchase_ts, c.click_id, c.click_ts,
             row_number() OVER (
               PARTITION BY p.purchase_id
               ORDER BY c.click_ts DESC, c.click_id DESC
             ) AS rn
      FROM purchases p JOIN clicks c
        ON p.user_id = c.user_id
       AND c.click_ts <= p.purchase_ts
       AND c.click_ts >= p.purchase_ts - INTERVAL {ASOF_TOLERANCE_S} SECOND
    )
    SELECT user_id, purchase_id,
           epoch_us(purchase_ts) AS purchase_ts_us,
           click_id,
           epoch_us(click_ts) AS click_ts_us
    FROM ranked WHERE rn = 1
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join with a 1-hour tolerance: the latest click
    within [purchase_ts - 1h, purchase_ts] — pd.merge_asof
    tolerance semantics. At scale the tolerance is what keeps the
    pre-rank fan-in bounded: an unbounded as-of joins every older
    click per purchase; the band joins at most an hour's worth."""
    purchases, clicks = _purchase_click_sides(spark, sf_dir)
    j = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="purchase_ts",
        right_ts="click_ts",
        right_cols=["click_id", "click_ts"],
        left_key=["purchase_id"],
        tolerance_seconds=ASOF_TOLERANCE_S,
    )
    return j.select(
        "user_id",
        "purchase_id",
        ts_us("purchase_ts").alias("purchase_ts_us"),
        "click_id",
        ts_us("click_ts").alias("click_ts_us"),
    )


@query(
    "join_asof_cogrouped",
    oracle="""
    WITH purchases AS (
      SELECT user_id, event_id AS purchase_id, ts AS purchase_ts
      FROM events WHERE event_type = 'purchase'
    ), clicks AS (
      SELECT user_id, event_id AS click_id, ts AS click_ts
      FROM events WHERE event_type = 'click'
    ), ranked AS (
      SELECT p.user_id, p.purchase_id, p.purchase_ts, c.click_id, c.click_ts,
             row_number() OVER (
               PARTITION BY p.purchase_id
               ORDER BY c.click_ts DESC, c.click_id DESC
             ) AS rn
      FROM purchases p JOIN clicks c
        ON p.user_id = c.user_id AND c.click_ts <= p.purchase_ts
    )
    SELECT user_id, purchase_id,
           epoch_us(purchase_ts) AS purchase_ts_us,
           click_id,
           epoch_us(click_ts) AS click_ts_us
    FROM ranked WHERE rn = 1
    """,
)
def join_asof_cogrouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME as-of semantics as join_asof via the other physical
    strategy: cogrouped applyInPandas running pd.merge_asof per user
    (operators.asof.asof_join_pandas). Linear after the per-group sort
    instead of materializing left x matching-right before ranking —
    the right choice when one key has deep right-side history. Oracle
    is identical to join_asof: both strategies must agree (ties on
    click_ts resolve to max click_id inside the merge's per-group
    sort — a pre-shuffle orderBy would not survive the cogroup)."""
    from mercurygate_spark.operators.asof import asof_join_pandas

    purchases, clicks = _purchase_click_sides(spark, sf_dir)
    j = asof_join_pandas(
        purchases.select("purchase_id", "user_id", "purchase_ts"),
        clicks,
        on="user_id",
        left_ts="purchase_ts",
        right_ts="click_ts",
        right_cols=["click_id", "click_ts"],
    )
    return j.select(
        "user_id",
        "purchase_id",
        ts_us("purchase_ts").alias("purchase_ts_us"),
        "click_id",
        ts_us("click_ts").alias("click_ts_us"),
    )


@query(
    "join_skew_isolated",
    oracle="""
    SELECT n_nationkey AS nation_key,
           count(*) AS n_items,
           round(sum(l_extendedprice), 2) AS sum_price
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_nationkey
    """,
)
def join_skew_isolated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot/cold isolated join: fact keys above the hot threshold join a
    BROADCAST slice of the dim (a broadcast cannot skew), the cold
    remainder sort-merge joins normally, branches unioned. The oracle
    is the PLAIN join + rollup — the mitigation must be invisible in
    values. The hot-key collect is bounded by construction (keys above
    a count threshold). operators/skew.py:54; for the skew AQE can't
    see (post-filter, or dim-side)."""
    from mercurygate_spark.operators.skew import skew_isolated_join

    t = load_tables(spark, sf_dir, "lineitem", "supplier", "nation")
    fact = t["lineitem"].select(
        F.col("l_suppkey").alias("suppkey"), "l_extendedprice"
    )
    dim = t["supplier"].select(
        F.col("s_suppkey").alias("suppkey"), "s_nationkey"
    )
    j = skew_isolated_join(fact, dim, on="suppkey", hot_key_threshold=120)
    j = j.join(
        F.broadcast(t["nation"].select("n_nationkey")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    )
    return j.groupBy(F.col("n_nationkey").alias("nation_key")).agg(
        F.count("*").alias("n_items"),
        r2(F.sum("l_extendedprice")).alias("sum_price"),
    )


@query(
    "join_full_outer",
    oracle="""
    WITH spend AS (
      SELECT o_custkey, count(*) AS n_orders,
             round(sum(o_totalprice), 2) AS total_spend
      FROM orders WHERE o_orderstatus = 'F' GROUP BY o_custkey
    ), segment AS (
      SELECT c_custkey, c_mktsegment FROM customer
      WHERE c_mktsegment = 'BUILDING'
    )
    SELECT coalesce(s.c_custkey, p.o_custkey) AS custkey,
           s.c_mktsegment,
           p.n_orders,
           p.total_spend
    FROM segment s FULL OUTER JOIN spend p ON s.c_custkey = p.o_custkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join: the BUILDING-segment customer list against the
    finished-order spend rollup — unmatched rows survive from BOTH
    sides (customers with no finished orders, spenders outside the
    segment), the reconciliation shape. Both sides shuffle on the key
    once; coalesce fuses the two key columns."""
    t = load_tables(spark, sf_dir, "customer", "orders")
    spend = (
        t["orders"]
        .where(F.col("o_orderstatus") == "F")
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            r2(F.sum("o_totalprice")).alias("total_spend"),
        )
    )
    segment = t["customer"].where(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey", "c_mktsegment"
    )
    j = segment.join(spend, F.col("c_custkey") == F.col("o_custkey"), "full_outer")
    return j.select(
        F.coalesce(F.col("c_custkey"), F.col("o_custkey")).alias("custkey"),
        "c_mktsegment",
        "n_orders",
        "total_spend",
    )


@query(
    "join_interval_overlap",
    oracle="""
    WITH p AS (
      SELECT event_id AS purchase_id, user_id,
             epoch_us(ts) AS p_start_us,
             epoch_us(ts) + 1800 * 1000000 AS p_end_us
      FROM events WHERE event_type = 'purchase'
    ), e AS (
      SELECT event_id AS error_id, user_id,
             epoch_us(ts) AS e_start_us,
             epoch_us(ts) + 1800 * 1000000 AS e_end_us
      FROM events WHERE event_type = 'error'
    )
    SELECT p.purchase_id, e.error_id, p.user_id,
           p.p_start_us, e.e_start_us
    FROM p JOIN e
      ON p.user_id = e.user_id
     AND p.p_start_us < e.e_end_us
     AND e.e_start_us < p.p_end_us
    """,
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-OVERLAP join (completes the temporal-join family next
    to as-of, theta-range, and ts-proximity): each purchase and error
    event opens a 30-minute activity window; pairs of same-user
    windows that overlap are incident-attribution candidates. The
    ORACLE is the naive theta join; the ENGINE uses
    operators.rangejoin.interval_overlap_join — bounded-length
    intervals bucket by their max length, ±1 neighbor replication
    covers every overlapping pair, the exact predicate filters. No
    cartesian (the all-keys plan sweep enforces it)."""
    from mercurygate_spark.operators.rangejoin import interval_overlap_join

    t = load_tables(spark, sf_dir, "events")
    ev = t["events"]
    half_hour = F.lit(1800 * 1_000_000)
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_start"),
        (F.timestamp_micros(F.unix_micros("ts") + half_hour)).alias("p_end"),
    )
    e = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.col("user_id").alias("user_id_e"),
        F.col("ts").alias("e_start"),
        (F.timestamp_micros(F.unix_micros("ts") + half_hour)).alias("e_end"),
    )
    j = interval_overlap_join(
        p,
        e.withColumnRenamed("user_id_e", "user_id"),
        a_start="p_start", a_end="p_end",
        b_start="e_start", b_end="e_end",
        max_len_seconds=1800,
        extra_equi=["user_id"],
    )
    return j.select(
        "purchase_id",
        "error_id",
        "user_id",
        ts_us("p_start").alias("p_start_us"),
        ts_us("e_start").alias("e_start_us"),
    )


@query(
    "join_bucketed_colocated",
    oracle="""
    SELECT o_orderstatus,
           count(*) AS n_items,
           CAST(sum(l_quantity) AS BIGINT) AS sum_qty
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY 1
    """,
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-free co-located fact⋈fact join via BUCKETED tables —
    the canonical 100 TB pattern for a join both of whose sides are
    too big to broadcast and which recurs often enough to amortize a
    one-time bucketed layout: both sides are written bucketBy(8, key)
    sortBy(key), after which the sort-merge join needs NO Exchange on
    either side (each bucket pair joins in place; the only shuffle in
    the whole plan is the final small aggregation). The plan contract
    — SortMergeJoin present, zero Exchange beneath it — is pinned by
    tests/test_plans.py. Values are pinned to the plain shuffle join's
    oracle: bucketing must be value-invisible. sum(l_quantity) is
    integer-valued fp64, so the sum is order-independent and exact in
    both engines; cast to BIGINT for dtype parity."""
    import os

    t = load_tables(spark, sf_dir, "orders", "lineitem")
    # per-PID table names: the driver may run correctness and bench in
    # parallel processes sharing one warehouse dir
    from mercurygate_spark.io.tmp_tables import register_tmp_table

    to_name = f"mg_bktjoin_orders_{os.getpid()}"
    li_name = f"mg_bktjoin_lineitem_{os.getpid()}"
    register_tmp_table(spark, to_name)
    register_tmp_table(spark, li_name)
    (
        t["orders"].select("o_orderkey", "o_orderstatus")
        .write.mode("overwrite").format("parquet")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable(to_name)
    )
    (
        t["lineitem"].select("l_orderkey", "l_quantity")
        .write.mode("overwrite").format("parquet")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable(li_name)
    )
    o, li = spark.table(to_name), spark.table(li_name)
    joined = o.hint("merge").join(li, o.o_orderkey == li.l_orderkey)
    return joined.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_items"),
        F.sum("l_quantity").cast("long").alias("sum_qty"),
    )


@query(
    "join_asof_nearest",
    oracle="""
    WITH purchases AS (
      SELECT user_id, event_id AS purchase_id, ts AS purchase_ts
      FROM events WHERE event_type = 'purchase'
    ), clicks AS (
      SELECT user_id, event_id AS click_id, ts AS click_ts
      FROM events WHERE event_type = 'click'
    ), ranked AS (
      SELECT p.user_id, p.purchase_id, p.purchase_ts, c.click_id, c.click_ts,
             row_number() OVER (
               PARTITION BY p.purchase_id
               ORDER BY abs(epoch_us(c.click_ts) - epoch_us(p.purchase_ts)) ASC,
                        c.click_ts ASC, c.click_id ASC
             ) AS rn
      FROM purchases p JOIN clicks c ON p.user_id = c.user_id
    )
    SELECT user_id, purchase_id,
           epoch_us(purchase_ts) AS purchase_ts_us,
           click_id,
           epoch_us(click_ts) AS click_ts_us
    FROM ranked WHERE rn = 1
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of join — completes the merge_asof direction family
    (backward/forward/tolerance/cogrouped are sibling keys): for each
    purchase, the click by the same user CLOSEST in absolute time,
    either side. Tie rule pinned in the operator (equal distance →
    earlier click, then click_id asc) so both engines rank
    identically. Same plan shape as the other as-of keys: one
    user_id-keyed join + per-purchase rank window — at scale, add
    tolerance_seconds to band the join and cap per-key fan-in."""
    purchases, clicks = _purchase_click_sides(spark, sf_dir)
    j = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="purchase_ts",
        right_ts="click_ts",
        right_cols=["click_id", "click_ts"],
        left_key=["purchase_id"],
        direction="nearest",
    )
    return j.select(
        "user_id",
        "purchase_id",
        ts_us("purchase_ts").alias("purchase_ts_us"),
        "click_id",
        ts_us("click_ts").alias("click_ts_us"),
    )


@query(
    "join_null_safe_equi",
    oracle="""
    WITH ev AS (
      SELECT event_id, user_id,
             nullif(event_type, 'click') AS etype
      FROM events
    ), dim AS (
      SELECT * FROM (VALUES
        ('view', 10), ('purchase', 50), ('signup', 5), (NULL, 0)
      ) AS t(etype, weight)
    )
    SELECT ev.event_id, ev.user_id, ev.etype, dim.weight
    FROM ev JOIN dim ON ev.etype IS NOT DISTINCT FROM dim.etype
    """,
)
def join_null_safe_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys
    MATCH the dimension's NULL row instead of silently dropping — the
    unknown-category bucket pattern (here clicks are nulled into it).
    Spark plans eqNullSafe as an ordinary broadcast-hash join on the
    null-safe key, so no rows fall out and no skew-on-null shuffle
    blowup happens (the classic null-key skew killer at 100 TB is an
    OUTER join on a nullable key; null-safe equi keeps it a hash
    lookup)."""
    t = load_tables(spark, sf_dir, "events")
    ev = t["events"].select(
        "event_id",
        "user_id",
        F.nullif("event_type", F.lit("click")).alias("etype"),
    )
    dim = spark.createDataFrame(
        [("view", 10), ("purchase", 50), ("signup", 5), (None, 0)],
        schema="etype string, weight int",
    )
    return ev.join(
        F.broadcast(dim), ev["etype"].eqNullSafe(dim["etype"])
    ).select("event_id", "user_id", ev["etype"].alias("etype"), "weight")


@query(
    "join_spatial_grid",
    oracle="""
    WITH pts AS (
      SELECT event_id,
             ((event_id * 37) % 1000) / 10.0 AS x,
             (((user_id * 91) + event_id) % 1000) / 10.0 AS y
      FROM events
    ), boxes AS (
      SELECT n_nationkey AS box_id,
             CAST((n_nationkey * 37) % 80 AS DOUBLE) AS x_lo,
             CAST((n_nationkey * 37) % 80 + 15 AS DOUBLE) AS x_hi,
             CAST((n_nationkey * 53) % 80 AS DOUBLE) AS y_lo,
             CAST((n_nationkey * 53) % 80 + 12 AS DOUBLE) AS y_hi
      FROM nation
    )
    SELECT p.event_id, b.box_id, p.x, p.y
    FROM pts p JOIN boxes b
      ON p.x >= b.x_lo AND p.x < b.x_hi
     AND p.y >= b.y_lo AND p.y < b.y_hi
    """,
)
def join_spatial_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial containment join (points in rectangles) via GRID-CELL
    BUCKETING — the scale shape for geo joins Spark lacks natively.
    Naive form is a theta join (every point × every box); the grid
    form assigns each point to exactly ONE 10×10 cell and explodes
    each box to the cells it overlaps (bounded: box area / cell area),
    so the join becomes an EQUI join on (cell_x, cell_y) + an exact
    containment filter. Shuffle volume is O(points + boxes·cells) and
    hash-partitioned — no broadcast needed when boxes outgrow memory,
    no quadratic pair blowup; half-open [lo, hi) edges mean a point in
    exactly one cell and no duplicate (point, box) candidates.
    Coordinates are derived deterministically from events (points) and
    nation (boxes) so DuckDB replays the NAIVE theta join as the
    oracle — pinning that bucketing changes the plan, not the answer."""
    t = load_tables(spark, sf_dir, "events", "nation")
    cell = 10.0
    pts = t["events"].select(
        "event_id",
        (((F.col("event_id") * 37) % 1000) / 10.0).alias("x"),
        ((((F.col("user_id") * 91) + F.col("event_id")) % 1000) / 10.0).alias("y"),
    ).withColumn("cell_x", F.floor(F.col("x") / cell)).withColumn(
        "cell_y", F.floor(F.col("y") / cell)
    )
    boxes = t["nation"].select(
        F.col("n_nationkey").alias("box_id"),
        ((F.col("n_nationkey") * 37) % 80).cast("double").alias("x_lo"),
        ((F.col("n_nationkey") * 37) % 80 + 15).cast("double").alias("x_hi"),
        ((F.col("n_nationkey") * 53) % 80).cast("double").alias("y_lo"),
        ((F.col("n_nationkey") * 53) % 80 + 12).cast("double").alias("y_hi"),
    )
    box_cells = boxes.select(
        "*",
        F.explode(
            F.sequence(
                F.floor(F.col("x_lo") / cell),
                F.floor((F.col("x_hi") - 1e-9) / cell),
            )
        ).alias("cell_x"),
    ).select(
        "*",
        F.explode(
            F.sequence(
                F.floor(F.col("y_lo") / cell),
                F.floor((F.col("y_hi") - 1e-9) / cell),
            )
        ).alias("cell_y"),
    )
    joined = pts.join(box_cells, ["cell_x", "cell_y"])
    return joined.where(
        (F.col("x") >= F.col("x_lo"))
        & (F.col("x") < F.col("x_hi"))
        & (F.col("y") >= F.col("y_lo"))
        & (F.col("y") < F.col("y_hi"))
    ).select("event_id", "box_id", "x", "y")


@query(
    "join_runtime_bloom_filter",
    oracle="""
    SELECT l_returnflag,
           count(*) AS n_items,
           round(sum(l_extendedprice), 2) AS joined_revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_totalprice > 300000
    GROUP BY l_returnflag
    """,
)
def join_runtime_bloom_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime bloom-filter join pruning: a selective dimension filter
    (orders > 300k) is turned by Catalyst into a bloom filter BUILT AT
    RUNTIME from the filtered side and injected as might_contain()
    into the fact scan — the fact table is pre-filtered BEFORE the
    join shuffle, the shuffle-join analogue of broadcast pruning. At
    100 TB this is the difference between shuffling every lineitem row
    and shuffling only the ~selectivity fraction that can possibly
    match. Thresholds are session confs sized for cluster defaults
    (creation side ≤ a few GB, application side huge), so the key
    pins them explicitly, materializes eagerly (localCheckpoint) while
    they're set, and RESTORES them — the driver sweeps all keys in one
    shared session and later keys expect broadcast joins back.
    Injection itself is pinned by
    tests/test_plans.py::test_runtime_bloom_filter_injected; the
    oracle pins that pruning never changes the answer."""
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold",
            "0",
        )
        t = load_tables(spark, sf_dir, "lineitem", "orders")
        big = t["orders"].where(F.col("o_totalprice") > 300000)
        joined = t["lineitem"].join(
            big, F.col("l_orderkey") == F.col("o_orderkey")
        )
        agg = joined.groupBy("l_returnflag").agg(
            F.count("*").alias("n_items"),
            r2(F.sum("l_extendedprice")).alias("joined_revenue"),
        )
        # eager: the bloom rewrite happens at optimization time, which
        # must run while the confs above are still in force
        return agg.localCheckpoint(eager=True)
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


@query(
    "join_scd2_point_in_time",
    oracle="""
    WITH dim AS (
      SELECT c_custkey, c_mktsegment || '_v' || v AS segment_version,
             CASE v WHEN 1 THEN TIMESTAMP '1990-01-01 00:00:00'
                    ELSE TIMESTAMP '1998-01-01 00:00:00' END AS valid_from,
             CASE v WHEN 1 THEN TIMESTAMP '1998-01-01 00:00:00'
                    ELSE TIMESTAMP '2999-01-01 00:00:00' END AS valid_to
      FROM customer, UNNEST([1, 2]) AS u(v)
    )
    SELECT d.segment_version,
           count(*) AS n_orders,
           round(sum(o.o_totalprice), 2) AS revenue
    FROM orders o
    JOIN dim d
      ON o.o_custkey = d.c_custkey
     AND o.o_orderdate >= d.valid_from
     AND o.o_orderdate < d.valid_to
    GROUP BY d.segment_version
    """,
)
def join_scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join against an SCD2 dimension — the warehouse
    must-have the silver MERGE pipeline produces versions FOR: each
    fact row joins the ONE dimension version whose
    [valid_from, valid_to) span covers the fact's event date. The dim
    here is synthesized (two versions per customer split at
    1998-01-01, half-open so no date double-matches); the join is
    equi on the business key + a range residual, which Spark plans as
    a hash join on custkey with the range as a cheap post-filter —
    NOT a theta join: the equi key does the distribution, so at
    100 TB it shuffles like any equi join and the version fan-out (2)
    is the only amplification. Half-open intervals guarantee exactly
    one match per fact row, so n_orders across groups sums to
    |orders| — the SCD2 integrity property the oracle hash pins."""
    t = load_tables(spark, sf_dir, "orders", "customer")
    split = F.lit("1998-01-01 00:00:00").cast("timestamp")
    lo = F.lit("1990-01-01 00:00:00").cast("timestamp")
    hi = F.lit("2999-01-01 00:00:00").cast("timestamp")
    dim = (
        t["customer"]
        .select(
            "c_custkey",
            "c_mktsegment",
            F.explode(F.array(F.lit(1), F.lit(2))).alias("v"),
        )
        .select(
            "c_custkey",
            F.concat(F.col("c_mktsegment"), F.lit("_v"), F.col("v")).alias(
                "segment_version"
            ),
            F.when(F.col("v") == 1, lo).otherwise(split).alias("valid_from"),
            F.when(F.col("v") == 1, split).otherwise(hi).alias("valid_to"),
        )
    )
    o = t["orders"]
    joined = o.join(
        dim,
        (o["o_custkey"] == dim["c_custkey"])
        & (o["o_orderdate"] >= dim["valid_from"])
        & (o["o_orderdate"] < dim["valid_to"]),
    )
    return joined.groupBy("segment_version").agg(
        F.count("*").alias("n_orders"),
        r2(F.sum("o_totalprice")).alias("revenue"),
    )
