"""Aggregations (SURVEY.md §2c "Aggregations" — the Gold KPI promise,
reference README.md:121-129).

All grouped aggregates compile to partial (map-side) + final hash
aggregation — at 100 TB the map-side combine is what keeps the shuffle
small, and AQE coalesces the post-shuffle partitions.
Derived doubles are rounded identically on both engine and oracle side
(see functions.r2) so the hash compare is stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mercurygate_spark.functions import r2
from mercurygate_spark.queries.registry import load_tables, query


@query("agg_count_star", oracle="SELECT count(*) AS n_rows FROM lineitem")
def agg_count_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-table count — the reference's only aggregate (A1,
    mm_source_to_bronze.py:140), as a DataFrame (no eager action)."""
    t = load_tables(spark, sf_dir, "lineitem")
    return t["lineitem"].agg(F.count("*").alias("n_rows"))


@query(
    "agg_group_sum_avg_minmax",
    oracle="""
    SELECT l_returnflag,
           l_linestatus,
           round(sum(l_quantity), 2)                              AS sum_qty,
           round(sum(l_extendedprice), 2)                         AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)      AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 2)                              AS avg_qty,
           round(avg(l_extendedprice), 2)                         AS avg_price,
           round(avg(l_discount), 2)                              AS avg_disc,
           round(min(l_extendedprice), 2)                         AS min_price,
           round(max(l_extendedprice), 2)                         AS max_price,
           count(*)                                               AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_group_sum_avg_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLAGSHIP: TPC-H-Q1-shaped pricing summary — grouped
    sum/avg/min/max over amount expressions (the Gold 'aggregated
    business KPIs' intent; amounts mirror mm_bronze_silver.py:56-62).

    Plan shape to preserve at scale: scan w/ pushed l_shipdate filter +
    pruned 7-col ReadSchema → partial hash agg → 6-key shuffle →
    final hash agg. Nothing else."""
    t = load_tables(spark, sf_dir, "lineitem")
    li = t["lineitem"].where(F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp"))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        r2(F.sum("l_quantity")).alias("sum_qty"),
        r2(F.sum("l_extendedprice")).alias("sum_base_price"),
        r2(F.sum(disc_price)).alias("sum_disc_price"),
        r2(F.sum(disc_price * (1 + F.col("l_tax")))).alias("sum_charge"),
        r2(F.avg("l_quantity")).alias("avg_qty"),
        r2(F.avg("l_extendedprice")).alias("avg_price"),
        r2(F.avg("l_discount")).alias("avg_disc"),
        r2(F.min("l_extendedprice")).alias("min_price"),
        r2(F.max("l_extendedprice")).alias("max_price"),
        F.count("*").alias("count_order"),
    )


@query(
    "agg_distinct",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_suppkey) AS n_supps,
           count(DISTINCT l_orderkey) AS n_orders
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact NDV per group. Spark plans multi-distinct via expand +
    two-phase aggregation — at scale prefer one distinct per query or
    approx_count_distinct (next query) when exactness isn't required."""
    t = load_tables(spark, sf_dir, "lineitem")
    return t["lineitem"].groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


HLL_RSD = 0.02          # requested relative standard deviation
HLL_BOUND = 5 * HLL_RSD  # 5σ acceptance bound — essentially-never false alarm


@query(
    "agg_approx_distinct",
    oracle=f"""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS n_parts_exact,
           count(DISTINCT l_orderkey) AS n_orders_exact,
           true AS parts_within_bound,
           true AS orders_within_bound
    FROM lineitem GROUP BY l_returnflag
    -- bound: |approx - exact| <= {HLL_BOUND} * exact (HLL++ rsd={HLL_RSD}, 5 sigma)
    """,
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate NDV (HyperLogLog++) — the 100 TB-scale substitute for
    exact distinct: no expand, constant-size sketch per group, single
    shuffle. The sketch values are engine-specific, so the ORACLE
    CONTRACT is the published error bound: the query outputs the exact
    NDVs plus booleans asserting the sketch landed within 5·rsd of
    exact; the oracle emits the same exact NDVs with literal TRUEs —
    the value-hash gate fails iff the sketch drifts out of bound."""
    t = load_tables(spark, sf_dir, "lineitem")
    agg = t["lineitem"].groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts_exact"),
        F.countDistinct("l_orderkey").alias("n_orders_exact"),
        F.approx_count_distinct("l_partkey", rsd=HLL_RSD).alias("__approx_parts"),
        F.approx_count_distinct("l_orderkey", rsd=HLL_RSD).alias("__approx_orders"),
    )
    return agg.select(
        "l_returnflag",
        "n_parts_exact",
        "n_orders_exact",
        (F.abs(F.col("__approx_parts") - F.col("n_parts_exact"))
         <= HLL_BOUND * F.col("n_parts_exact")).alias("parts_within_bound"),
        (F.abs(F.col("__approx_orders") - F.col("n_orders_exact"))
         <= HLL_BOUND * F.col("n_orders_exact")).alias("orders_within_bound"),
    )


@query(
    "agg_stats_corr",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_extendedprice), 4) AS price_stddev,
           round(var_samp(l_quantity), 4) AS qty_var,
           round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
           round(covar_samp(l_quantity, l_extendedprice), 4) AS qty_price_covar
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_stats_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: sample stddev/variance, correlation,
    covariance per group — single-pass mergeable state (Welford-style)
    in both engines; implementation ulp differences absorbed by the
    rounding."""
    t = load_tables(spark, sf_dir, "lineitem")

    def rf(c, scale, alias):
        return (F.floor(c * 10**scale + F.lit(0.5)) / 10**scale).alias(alias)

    return t["lineitem"].groupBy("l_returnflag").agg(
        rf(F.stddev_samp("l_extendedprice"), 4, "price_stddev"),
        rf(F.var_samp("l_quantity"), 4, "qty_var"),
        rf(F.corr("l_quantity", "l_extendedprice"), 6, "qty_price_corr"),
        rf(F.covar_samp("l_quantity", "l_extendedprice"), 4, "qty_price_covar"),
    )


@query(
    "agg_rollup_cube",
    oracle="""
    SELECT coalesce(r_name, '<ALL>') AS region_name,
           coalesce(n_name, '<ALL>') AS nation_name,
           count(*) AS n_customers,
           round(sum(c_acctbal), 2) AS sum_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def agg_rollup_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subtotal hierarchy region→nation→grand-total via ROLLUP — the
    geographic KPI hierarchy the reference hardcodes as lit('NAM')/
    lit('USA') audit columns (mm_source_to_bronze.py:150-151). Grouping
    nulls are labeled '<ALL>' (source columns are non-null) so the
    subtotal rows hash identically across engines."""
    t = load_tables(spark, sf_dir, "customer", "nation", "region")
    joined = (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(F.count("*").alias("n_customers"), r2(F.sum("c_acctbal")).alias("sum_bal"))
        .select(
            F.coalesce("r_name", F.lit("<ALL>")).alias("region_name"),
            F.coalesce("n_name", F.lit("<ALL>")).alias("nation_name"),
            "n_customers",
            "sum_bal",
        )
    )


@query(
    "agg_having",
    oracle="""
    SELECT o_custkey,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total_spend
    FROM orders
    GROUP BY o_custkey
    HAVING count(*) >= 12 AND sum(o_totalprice) > 1000000
    """,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation predicate (HAVING): high-volume, high-value
    customers. The filter runs after the final hash agg — Catalyst
    cannot push it below the aggregate, which is the correct plan."""
    t = load_tables(spark, sf_dir, "orders")
    return (
        t["orders"]
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("o_totalprice").alias("__raw_spend"),
        )
        .where((F.col("n_orders") >= 12) & (F.col("__raw_spend") > 1000000))
        .select("o_custkey", "n_orders", r2(F.col("__raw_spend")).alias("total_spend"))
    )


# --- Count-Min Sketch (Cormode-Muthukrishnan 2005) -------------------
# Built from the md5-affine hash family, so every counter is
# deterministic and the oracle replays the sketch EXACTLY in SQL —
# a stronger gate than the HLL/GK bound-check oracles.

CMS_PROBE_MAX = 20  # probe the low part keys (present at every SF)


def _duck_cms_cells(key_sql: str, depth: int, width: int) -> str:
    from mercurygate_spark.operators.sketches import duck_affine_sql, duck_h0_sql

    aff = duck_affine_sql(duck_h0_sql("k"), "r", width)
    return f"""
    keys AS (SELECT {key_sql} AS k FROM lineitem),
    cells AS (
      SELECT rr.r AS r, {aff} AS c, count(*) AS cnt
      FROM keys, (SELECT unnest(range({depth})) AS r) rr
      GROUP BY 1, 2
    ),
    probes AS (
      SELECT DISTINCT {key_sql} AS k FROM lineitem WHERE {key_sql} <= {CMS_PROBE_MAX}
    ),
    pcells AS (
      SELECT k, rr.r AS r, {aff} AS c
      FROM probes, (SELECT unnest(range({depth})) AS r) rr
    ),
    est AS (
      SELECT p.k, min(c2.cnt) AS cms_est
      FROM pcells p JOIN cells c2 ON p.r = c2.r AND p.c = c2.c
      GROUP BY p.k
    ),
    exact AS (
      SELECT {key_sql} AS k, count(*) AS n_exact
      FROM lineitem WHERE {key_sql} <= {CMS_PROBE_MAX} GROUP BY 1
    )"""


def _cms_oracle() -> str:
    from mercurygate_spark.operators.sketches import CMS_DEPTH, CMS_WIDTH

    return f"""
    WITH {_duck_cms_cells("l_partkey", CMS_DEPTH, CMS_WIDTH)}
    SELECT e.k AS l_partkey,
           est.cms_est,
           e.n_exact,
           est.cms_est >= e.n_exact AS no_underestimate
    FROM exact e JOIN est ON e.k = est.k
    """


@query("agg_count_min_sketch", oracle=_cms_oracle())
def agg_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min Sketch frequency estimation over l_partkey: a D x W
    counter grid (one map-side-combinable groupBy; the shuffle carries
    at most D x W rows per partition regardless of input size), probed
    for the low part keys. Output pins the CMS one-sided guarantee
    (estimate never underestimates) AND the exact counter values —
    the md5-affine hashes make the whole sketch replayable in DuckDB
    (operators/sketches.py)."""
    from mercurygate_spark.operators.sketches import cms_build, cms_probe

    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    sketch = cms_build(li, "l_partkey")
    low = li.where(F.col("l_partkey") <= CMS_PROBE_MAX)
    probes = low.select("l_partkey").distinct()
    est = cms_probe(sketch, probes, "l_partkey")
    exact = low.groupBy("l_partkey").agg(F.count("*").alias("n_exact"))
    return est.join(exact, "l_partkey").select(
        "l_partkey",
        "cms_est",
        "n_exact",
        (F.col("cms_est") >= F.col("n_exact")).alias("no_underestimate"),
    )


@query(
    "agg_median",
    oracle="""
    SELECT l_returnflag,
           round(median(l_quantity::DOUBLE), 2) AS med_qty,
           round(median(l_extendedprice::DOUBLE), 2) AS med_price,
           round(quantile_cont(l_discount::DOUBLE, 0.5), 6) AS med_discount
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median (continuous 50th percentile, interpolated on even
    counts — F.median == DuckDB median/quantile_cont on DOUBLE). Exact
    medians need the full value multiset per group (sort-based agg) —
    the 100 TB guidance is agg_approx_quantile; this key pins the exact
    semantics the sketch is measured against."""
    from mercurygate_spark.functions import r6

    t = load_tables(spark, sf_dir, "lineitem")
    return t["lineitem"].groupBy("l_returnflag").agg(
        r2(F.median("l_quantity")).alias("med_qty"),
        r2(F.median("l_extendedprice")).alias("med_price"),
        r6(F.median("l_discount")).alias("med_discount"),
    )


@query(
    "agg_salted_skew",
    oracle="""
    SELECT l_returnflag,
           count(*) AS n_items,
           round(sum(l_extendedprice), 2) AS sum_price,
           round(min(l_extendedprice), 2) AS min_price,
           round(max(l_extendedprice), 2) AS max_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over a genuinely skewed key space
    (3 return flags carry the whole fact table): salt into 16 subkeys,
    partial-agg on (key, salt) — spreading each hot key over 16
    reducers — then final-agg on key. The oracle is the PLAIN group-by:
    salting must be semantically invisible, which also pins that every
    aggregate used decomposes correctly (count→sum, min→min, ...).
    operators/skew.py; at 100 TB this is the shape for skewed
    AGGREGATION keys, which AQE's skew-join splitting does not cover."""
    from mercurygate_spark.operators.skew import salted_agg

    t = load_tables(spark, sf_dir, "lineitem")
    agg = salted_agg(
        t["lineitem"].select("l_returnflag", "l_extendedprice"),
        ["l_returnflag"],
        {
            "n_items": (F.count("*"), F.sum("n_items").cast("long")),
            "__sum": (F.sum("l_extendedprice"), F.sum("__sum")),
            "__min": (F.min("l_extendedprice"), F.min("__min")),
            "__max": (F.max("l_extendedprice"), F.max("__max")),
        },
    )
    return agg.select(
        "l_returnflag",
        "n_items",
        r2(F.col("__sum")).alias("sum_price"),
        r2(F.col("__min")).alias("min_price"),
        r2(F.col("__max")).alias("max_price"),
    )


@query(
    "agg_boolean_family",
    oracle="""
    SELECT o_orderstatus,
           CAST(count_if(o_totalprice > 200000) AS BIGINT) AS n_big,
           bool_and(o_totalprice > 0) AS all_positive,
           bool_or(o_orderpriority = '1-URGENT') AS any_urgent,
           CAST(count_if(o_orderpriority = '1-URGENT') AS BIGINT) AS n_urgent
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_boolean_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregate family: count_if / bool_and (every) / bool_or
    (some) — the predicate-rollup surface audit dashboards use. Same
    partial+final hash-agg shape as every grouped aggregate; count_if
    cast BIGINT on the oracle side (DuckDB returns HUGEINT-free BIGINT
    for count_if, but the explicit cast pins it)."""
    t = load_tables(spark, sf_dir, "orders")
    return t["orders"].groupBy("o_orderstatus").agg(
        F.count_if(F.col("o_totalprice") > 200000).alias("n_big"),
        F.bool_and(F.col("o_totalprice") > 0).alias("all_positive"),
        F.bool_or(F.col("o_orderpriority") == "1-URGENT").alias("any_urgent"),
        F.count_if(F.col("o_orderpriority") == "1-URGENT").alias("n_urgent"),
    )


@query(
    "agg_hll_partial_merge",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS n_parts_exact,
           true AS merged_within_bound,
           true AS direct_within_bound
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_hll_partial_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-aggregatable HLL sketch cascade (Datasketches
    ``hll_sketch_agg`` / ``hll_union_agg``) — the 100 TB continuous-
    aggregate pattern: materialize a constant-size sketch per fine
    partial (here (returnflag, linestatus); at scale, per hour/day
    partition), then answer coarse NDV rollups by merging PARTIALS —
    the raw data is never rescanned. Two contracts pinned:

    * ``merged_within_bound`` — the partial-union estimate lands
      within 5·rsd of the exact NDV (lgConfigK=14 → rsd = 1.04/√2¹⁴
      ≈ 0.81 %, bound 4.1 %);
    * ``direct_within_bound`` — a sketch built directly over the
      coarse group obeys the same bound, so the CASCADE costs no
      accuracy class vs a from-scratch rebuild. (The two estimates
      are near but not bit-equal: the Datasketches union operates on
      an HLL_8 gadget whose register merge may differ in the last few
      registers from single-pass HLL_4 construction — pinning
      equality is wrong by design, and the sf0.01 sweep proved it.)

    The oracle emits the exact NDVs + literal TRUEs, so the value-hash
    gate fails iff either identity breaks. Unlike
    ``agg_approx_distinct`` (opaque HLL++ inside one aggregation),
    this key pins the *mergeability* of explicit sketch columns."""
    lg_k = 14
    bound = 5 * 1.04 / (2 ** (lg_k / 2))  # 5 sigma of published rsd
    t = load_tables(spark, sf_dir, "lineitem")
    li = t["lineitem"]
    partials = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.hll_sketch_agg("l_partkey", lg_k).alias("sk")
    )
    merged = partials.groupBy("l_returnflag").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_merged")
    )
    direct = li.groupBy("l_returnflag").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("l_partkey", lg_k)).alias("est_direct"),
        F.countDistinct("l_partkey").alias("n_parts_exact"),
    )
    return merged.join(direct, "l_returnflag").select(
        "l_returnflag",
        "n_parts_exact",
        (
            F.abs(F.col("est_merged") - F.col("n_parts_exact"))
            <= F.lit(bound) * F.col("n_parts_exact")
        ).alias("merged_within_bound"),
        (
            F.abs(F.col("est_direct") - F.col("n_parts_exact"))
            <= F.lit(bound) * F.col("n_parts_exact")
        ).alias("direct_within_bound"),
    )


@query(
    "agg_theta_set_algebra",
    oracle="""
    WITH a AS (SELECT DISTINCT o_custkey FROM orders
               WHERE year(o_orderdate) = 1995),
         b AS (SELECT DISTINCT o_custkey FROM orders
               WHERE year(o_orderdate) = 1996)
    SELECT (SELECT count(*) FROM a) AS n_1995,
           (SELECT count(*) FROM b) AS n_1996,
           (SELECT count(*) FROM (SELECT * FROM a INTERSECT SELECT * FROM b) s)
               AS n_both,
           (SELECT count(*) FROM (SELECT * FROM a UNION SELECT * FROM b) s)
               AS n_either,
           (SELECT count(*) FROM (SELECT * FROM a EXCEPT SELECT * FROM b) s)
               AS n_churned
    """,
)
def agg_theta_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch set algebra (Datasketches ``theta_sketch_agg`` /
    ``theta_union`` / ``theta_intersection`` / ``theta_difference``):
    distinct-customer overlap between order years 1995 and 1996 —
    retention (∩), reach (∪), churn (−) — computed entirely on two
    constant-size sketches. The 100 TB story: exact distinct-set
    algebra needs a full-width shuffle of every key PER COHORT PAIR;
    theta sketches reduce each cohort to one mergeable summary, and
    any pairwise overlap matrix is sketch-side arithmetic after ONE
    scan. lgNomEntries=16 (65 536 nominal) keeps the sketch in exact
    mode for every NDV the testdata reaches (≤15 k at sf0.1) — and
    the union must be told so too (theta_union's default union gadget
    is lgNomEntries=12, which silently DOWNSAMPLES larger inputs; the
    sf0.1 sweep caught the resulting 0.7 % drift) — so the estimates
    are EXACTLY the set cardinalities and the oracle pins them
    value-for-value; beyond ~65 k the published θ error bounds
    take over with the same plan shape (the sketch stays 512 KiB)."""
    lg_nom = 16
    t = load_tables(spark, sf_dir, "orders")
    o = t["orders"]
    yr = F.year("o_orderdate")
    sk = o.agg(
        F.theta_sketch_agg(
            F.when(yr == 1995, F.col("o_custkey")), lg_nom
        ).alias("sk_a"),
        F.theta_sketch_agg(
            F.when(yr == 1996, F.col("o_custkey")), lg_nom
        ).alias("sk_b"),
    )
    return sk.select(
        F.theta_sketch_estimate("sk_a").alias("n_1995"),
        F.theta_sketch_estimate("sk_b").alias("n_1996"),
        F.theta_sketch_estimate(
            F.theta_intersection("sk_a", "sk_b")
        ).alias("n_both"),
        F.theta_sketch_estimate(
            F.theta_union("sk_a", "sk_b", lg_nom)
        ).alias("n_either"),
        F.theta_sketch_estimate(
            F.theta_difference("sk_a", "sk_b")
        ).alias("n_churned"),
    )


@query(
    "agg_heavy_hitters",
    oracle="""
    WITH c AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
         t AS (SELECT sum(n_docs) AS total FROM c)
    SELECT lang, n_docs, true AS captured
    FROM c, t WHERE n_docs > 0.05 * total
    """,
)
def agg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters in ONE pass via df.stat.freqItems (the
    Karp/Misra–Gries frequent-items summary): constant-size per-
    partition candidate maps, merged — no shuffle of the full key set,
    unlike an exact groupBy-then-filter. The algorithm's guarantee is
    one-sided: every item with frequency > support·n IS returned
    (false positives possible, false negatives not). The key outputs
    each EXACT heavy hitter (count > 5 % of rows) with a `captured`
    boolean = membership in the freqItems summary; the oracle emits
    the exact hitters with literal TRUE, so the value-hash fails iff
    the single-pass summary ever drops a true heavy hitter. At 100 TB
    the exact side of this query is the expensive half — in production
    the summary alone answers 'what dominates this corpus?' in one
    scan + a driver-size merge."""
    t = load_tables(spark, sf_dir, "documents")
    docs = t["documents"]
    summary = docs.stat.freqItems(["lang"], support=0.05)
    items = summary.select(F.explode("lang_freqItems").alias("lang"))
    exact = (
        docs.groupBy("lang")
        .agg(F.count("*").alias("n_docs"))
        .withColumn("__total", F.sum("n_docs").over(Window.partitionBy()))
        .where(F.col("n_docs") > 0.05 * F.col("__total"))
    )
    return (
        exact.join(items.withColumn("__hit", F.lit(True)), "lang", "left")
        .select("lang", "n_docs", F.coalesce("__hit", F.lit(False)).alias("captured"))
    )


@query(
    "agg_bitmap_distinct",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_orderkey) AS n_orders
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT re-aggregatable distinct via bitmaps (bitmap_bit_position
    / bitmap_construct_agg / bitmap_count) — the third point on the
    NDV triangle: agg_distinct is exact but its expand+two-phase
    state is the full key set; agg_hll_partial_merge is mergeable but
    approximate; bitmaps are BOTH — each (group, 32k-bucket) partial
    is a fixed 4 KiB bitmap, partials OR-merge losslessly
    (bitmap_or_agg), and the count is exact. The 100 TB trade: state
    is O(key-space/8 bytes) instead of O(NDV·keywidth) — ideal for
    dense integer keys (IDs), wrong for sparse 64-bit hashes (HLL's
    domain). Two-level plan: per-bucket bitmaps, then sum of
    bitmap_count — the same cascade shape as the sketch keys, pinned
    here against DuckDB's exact COUNT(DISTINCT)."""
    t = load_tables(spark, sf_dir, "lineitem")
    li = t["lineitem"]

    def bitmap_ndv(col: str, alias: str) -> DataFrame:
        partials = li.groupBy(
            "l_returnflag", F.bitmap_bucket_number(F.col(col)).alias("bkt")
        ).agg(F.bitmap_construct_agg(F.bitmap_bit_position(F.col(col))).alias("bm"))
        return partials.groupBy("l_returnflag").agg(
            F.sum(F.bitmap_count("bm")).alias(alias)
        )
    parts = bitmap_ndv("l_partkey", "n_parts")
    orders = bitmap_ndv("l_orderkey", "n_orders")
    return parts.join(orders, "l_returnflag")


@query(
    "agg_weighted_median",
    oracle="""
    WITH w AS (
      SELECT l_returnflag,
             l_extendedprice AS price,
             CAST(l_quantity AS BIGINT) AS qty,
             sum(CAST(l_quantity AS BIGINT)) OVER (
               PARTITION BY l_returnflag
               ORDER BY l_extendedprice, l_orderkey, l_linenumber
               ROWS UNBOUNDED PRECEDING
             ) AS cw,
             sum(CAST(l_quantity AS BIGINT)) OVER (
               PARTITION BY l_returnflag
             ) AS tw
      FROM lineitem
    )
    SELECT l_returnflag,
           min(price) AS weighted_median_price,
           CAST(min(tw) AS BIGINT) AS total_weight
    FROM w
    WHERE 2 * cw >= tw
    GROUP BY l_returnflag
    """,
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median (quantity-weighted median unit price per
    returnflag), computed by the two-pass range-bucketed crossing
    search — the distributed-exact-median plan:

    1. histogram pass: bucket prices (monotonic floor(price/1000)),
       sum weights per (group, bucket) — a PARTIALLY-AGGREGABLE
       shuffle whose output is ~100 rows per group;
    2. locate the crossing bucket on that tiny frame (windows over
       ≤100 rows/group), keeping the weight accumulated BEFORE it;
    3. sort ONLY the crossing bucket's rows (~1% of the group) by the
       total (price, orderkey, linenumber) order and take the first
       price whose global running weight crosses half the total.

    The naive formulation — one window sort of every row per group —
    caps parallelism at the group count (3 here) and measured 6.4× at
    10× data; this plan's heavy stage is a map-side-combined groupBy
    and the only sorts touch bounded or 100×-reduced frames. The
    crossing test is ALL-INTEGER (2*(before+cw) >= tw on BIGINT
    weights, never tw/2 in float) and bucketing is monotonic in
    price, so the selected row is IDENTICAL to the naive definition —
    which is exactly what the oracle states."""
    t = load_tables(spark, sf_dir, "lineitem")
    li = t["lineitem"].select(
        "l_returnflag",
        F.col("l_extendedprice").alias("price"),
        F.col("l_quantity").cast("long").alias("qty"),
        "l_orderkey",
        "l_linenumber",
        F.floor(F.col("l_extendedprice") / 1000).cast("long").alias("bucket"),
    )
    hist = li.groupBy("l_returnflag", "bucket").agg(F.sum("qty").alias("bw"))
    w_bucket = (
        Window.partitionBy("l_returnflag")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_grp = Window.partitionBy("l_returnflag")
    hist = hist.select(
        "l_returnflag",
        "bucket",
        "bw",
        F.sum("bw").over(w_bucket).alias("cum"),
        F.sum("bw").over(w_grp).alias("tw"),
    )
    crossing = (
        hist.where(2 * F.col("cum") >= F.col("tw"))
        .groupBy("l_returnflag")
        .agg(
            F.min("bucket").alias("cb"),
            F.min_by(F.col("cum") - F.col("bw"), F.col("bucket")).alias("before"),
            F.min("tw").alias("tw"),
        )
    )
    crossing = crossing.select(
        F.col("l_returnflag").alias("rf_c"), "cb", "before", "tw"
    )
    in_bucket = li.join(
        F.broadcast(crossing),
        (F.col("l_returnflag") == F.col("rf_c")) & (F.col("bucket") == F.col("cb")),
    ).select("l_returnflag", "price", "qty", "l_orderkey", "l_linenumber",
             "before", "tw")
    w_run = (
        Window.partitionBy("l_returnflag")
        .orderBy("price", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = in_bucket.select(
        "l_returnflag",
        "price",
        "tw",
        (F.col("before") + F.sum("qty").over(w_run)).alias("cw"),
    )
    return (
        cum.where(2 * F.col("cw") >= F.col("tw"))
        .groupBy("l_returnflag")
        .agg(
            F.min("price").alias("weighted_median_price"),
            F.min("tw").alias("total_weight"),
        )
    )


@query(
    "agg_pct_of_total",
    oracle="""
    WITH per AS (
      SELECT l_returnflag,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_sum
      FROM lineitem GROUP BY l_returnflag
    ),
    tot AS (SELECT CAST(sum(qty_sum) AS BIGINT) AS total FROM per)
    SELECT l_returnflag, qty_sum,
           round(qty_sum / total, 6) AS pct
    FROM per, tot
    """,
)
def agg_pct_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-total (the share-of-shelf KPI), computed with ONE
    fact scan: the denominator is a window-over-() on the per-group
    aggregate OUTPUT — a frame bounded by the group-key cardinality
    (3 returnflags), so the single-partition window costs 3 rows, not
    a second pass over the table. The tempting alternatives both lose
    at 100 TB: a separate total aggregate re-scans the fact table
    (Catalyst plans the two aggregates as independent pipelines — no
    exchange reuse across different agg shapes, verified), and a
    window-over-() on the RAW rows drags the whole table through one
    task. Plan test pins exactly one parquet scan. Weights are cast
    to BIGINT (quantities are integral) so both sums are exact and
    the final division is the only float op, bit-identical on both
    engines."""
    t = load_tables(spark, sf_dir, "lineitem")
    per = (
        t["lineitem"]
        .groupBy("l_returnflag")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("qty_sum"))
    )
    from mercurygate_spark.functions import r6

    w = Window.partitionBy()
    return per.select(
        "l_returnflag",
        "qty_sum",
        r6(F.col("qty_sum") / F.sum("qty_sum").over(w)).alias("pct"),
    )
