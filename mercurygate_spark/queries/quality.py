"""Data-quality audit queries: declarative expectation checks over the
warehouse tables — the Great-Expectations-shaped surface a training
corpus pipeline runs before promoting a batch (null rates, domain
membership, range constraints, referential integrity).

The engine's version of the reference's zero-row guard (Q1,
mm_source_to_bronze.py:140) generalized: instead of one count, a
constraint catalog evaluated in a single conditional-aggregation pass
per table (no per-constraint scans) plus one broadcast anti-join for
referential integrity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mercurygate_spark.functions import r2, r6
from mercurygate_spark.queries.registry import load_tables, query


def _check(name: str, violated: F.Column) -> list[F.Column]:
    """One expectation → (n_checked, n_violations) column pair, summed
    in the same aggregation pass as every other expectation."""
    return [
        F.count("*").alias(f"__chk_{name}"),
        F.sum(violated.cast("long")).cast("long").alias(f"__bad_{name}"),
    ]


@query(
    "dq_expectations",
    oracle="""
    WITH o AS (
      SELECT count(*) AS n,
             CAST(sum(CASE WHEN o_totalprice IS NULL OR o_totalprice <= 0
                           THEN 1 ELSE 0 END) AS BIGINT) AS bad_price,
             CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS bad_date,
             CAST(sum(CASE WHEN o_orderstatus NOT IN ('F', 'O', 'P')
                            OR o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS bad_status
      FROM orders
    ), l AS (
      SELECT count(*) AS n,
             CAST(sum(CASE WHEN l_discount IS NULL OR l_discount < 0 OR l_discount > 1
                           THEN 1 ELSE 0 END) AS BIGINT) AS bad_discount,
             CAST(sum(CASE WHEN l_quantity IS NULL OR l_quantity <= 0
                           THEN 1 ELSE 0 END) AS BIGINT) AS bad_qty
      FROM lineitem
    ), orphans AS (
      SELECT count(*) AS n,
             CAST(count(*) - count(o.o_orderkey) AS BIGINT) AS bad
      FROM lineitem li LEFT JOIN orders o ON li.l_orderkey = o.o_orderkey
    )
    SELECT 'orders.totalprice_positive' AS expectation, n AS n_checked,
           bad_price AS n_violations, bad_price = 0 AS passed FROM o
    UNION ALL
    SELECT 'orders.orderdate_not_null', n, bad_date, bad_date = 0 FROM o
    UNION ALL
    SELECT 'orders.status_in_domain', n, bad_status, bad_status = 0 FROM o
    UNION ALL
    SELECT 'lineitem.discount_in_unit_range', n, bad_discount, bad_discount = 0 FROM l
    UNION ALL
    SELECT 'lineitem.quantity_positive', n, bad_qty, bad_qty = 0 FROM l
    UNION ALL
    SELECT 'lineitem.orderkey_references_orders', n, bad, bad = 0 FROM orphans
    """,
)
def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectation audit: 6 constraints over orders/lineitem evaluated
    in ONE conditional-agg pass per table (map-side combined — the scan
    cost is the audit cost regardless of constraint count) plus one
    referential-integrity join on the fact key. Output is the audit
    report: (expectation, n_checked, n_violations, passed)."""
    t = load_tables(spark, sf_dir, "orders", "lineitem")
    o = t["orders"].agg(
        *_check("price", F.col("o_totalprice").isNull() | (F.col("o_totalprice") <= 0)),
        *_check("date", F.col("o_orderdate").isNull()),
        *_check(
            "status",
            ~F.col("o_orderstatus").isin("F", "O", "P") | F.col("o_orderstatus").isNull(),
        ),
    )
    li = t["lineitem"].agg(
        *_check(
            "discount",
            F.col("l_discount").isNull()
            | (F.col("l_discount") < 0)
            | (F.col("l_discount") > 1),
        ),
        *_check("qty", F.col("l_quantity").isNull() | (F.col("l_quantity") <= 0)),
    )
    orphan = (
        t["lineitem"]
        .join(
            t["orders"].select(F.col("o_orderkey")),
            F.col("l_orderkey") == F.col("o_orderkey"),
            "left",
        )
        .agg(*_check("orphan", F.col("o_orderkey").isNull()))
    )

    def report(agg_df: DataFrame, rows: list[tuple[str, str]]) -> DataFrame:
        out = None
        for label, key in rows:
            r = agg_df.select(
                F.lit(label).alias("expectation"),
                F.col(f"__chk_{key}").alias("n_checked"),
                F.col(f"__bad_{key}").alias("n_violations"),
                (F.col(f"__bad_{key}") == 0).alias("passed"),
            )
            out = r if out is None else out.unionAll(r)
        return out

    return (
        report(
            o,
            [
                ("orders.totalprice_positive", "price"),
                ("orders.orderdate_not_null", "date"),
                ("orders.status_in_domain", "status"),
            ],
        )
        .unionAll(
            report(
                li,
                [
                    ("lineitem.discount_in_unit_range", "discount"),
                    ("lineitem.quantity_positive", "qty"),
                ],
            )
        )
        .unionAll(report(orphan, [("lineitem.orderkey_references_orders", "orphan")]))
    )


@query(
    "dq_mad_outliers",
    oracle="""
    WITH med AS (
      SELECT l_returnflag, median(l_extendedprice) AS med_price
      FROM lineitem GROUP BY l_returnflag
    ), dev AS (
      SELECT l.l_returnflag, l.l_extendedprice, m.med_price,
             abs(l.l_extendedprice - m.med_price) AS absdev
      FROM lineitem l JOIN med m USING (l_returnflag)
    ), mad AS (
      SELECT l_returnflag, median(absdev) AS mad_raw FROM dev
      GROUP BY l_returnflag
    )
    SELECT d.l_returnflag,
           round(any_value(d.med_price), 2) AS med_price,
           round(any_value(m.mad_raw), 2) AS mad_price,
           CAST(count_if(d.absdev > 3 * 1.4826 * m.mad_raw) AS BIGINT)
             AS n_outliers,
           count(*) AS n_rows
    FROM dev d JOIN mad m USING (l_returnflag)
    GROUP BY d.l_returnflag
    """,
)
def dq_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier screening via MEDIAN ABSOLUTE DEVIATION — the
    data-quality gate mean±kσ cannot be (one corrupt 1e30 row drags
    the mean past every real outlier; the median doesn't move). Two
    grouped exact-median passes (median, then median of |x−median|),
    the per-group stats joined back broadcast (group count is tiny —
    the full table never reshuffles), outliers = |x−med| > 3·1.4826·
    MAD (1.4826 rescales MAD to σ under normality). Exact interpolated
    medians agree between engines (agg_median precedent); everything
    downstream is deterministic double arithmetic on identical
    inputs."""
    t = load_tables(spark, sf_dir, "lineitem")
    li = t["lineitem"].select("l_returnflag", "l_extendedprice")
    med = li.groupBy("l_returnflag").agg(
        F.median("l_extendedprice").alias("med_price")
    )
    dev = li.join(F.broadcast(med), "l_returnflag").withColumn(
        "absdev", F.abs(F.col("l_extendedprice") - F.col("med_price"))
    )
    mad = dev.groupBy("l_returnflag").agg(F.median("absdev").alias("mad_raw"))
    joined = dev.join(F.broadcast(mad), "l_returnflag")
    return joined.groupBy("l_returnflag").agg(
        r2(F.any_value(F.col("med_price"))).alias("med_price"),
        r2(F.any_value(F.col("mad_raw"))).alias("mad_price"),
        F.count_if(
            F.col("absdev") > 3 * 1.4826 * F.col("mad_raw")
        ).alias("n_outliers"),
        F.count("*").alias("n_rows"),
    )


@query(
    "dq_winsorize",
    oracle="""
    WITH b AS (
      SELECT l_returnflag,
             round(quantile_cont(l_extendedprice, 0.01), 6) AS p01,
             round(quantile_cont(l_extendedprice, 0.99), 6) AS p99
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l.l_returnflag,
           count(*) AS n_rows,
           CAST(count_if(l.l_extendedprice < b.p01) AS BIGINT) AS n_clipped_low,
           CAST(count_if(l.l_extendedprice > b.p99) AS BIGINT) AS n_clipped_high,
           round(avg(l.l_extendedprice), 2) AS mean_raw,
           round(avg(greatest(least(l.l_extendedprice, b.p99), b.p01)), 2)
             AS mean_winsorized
    FROM lineitem l JOIN b USING (l_returnflag)
    GROUP BY l.l_returnflag
    """,
)
def dq_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization — clip each group's values into [p01, p99] before
    averaging, the tail-robust alternative to dropping outliers (the
    row survives; only its leverage is capped). Companion to
    dq_mad_outliers (which FLAGS; this REPAIRS). Exact interpolated
    percentiles per group, r6-rounded before the clip so both engines
    clip against bit-identical bounds, broadcast back (group count is
    tiny; the fact table never reshuffles), then one conditional
    aggregate produces clip counts + before/after means."""
    t = load_tables(spark, sf_dir, "lineitem")
    li = t["lineitem"].select("l_returnflag", "l_extendedprice")
    b = li.groupBy("l_returnflag").agg(
        r6(F.percentile("l_extendedprice", F.lit(0.01))).alias("p01"),
        r6(F.percentile("l_extendedprice", F.lit(0.99))).alias("p99"),
    )
    j = li.join(F.broadcast(b), "l_returnflag")
    clipped = F.greatest(
        F.least(F.col("l_extendedprice"), F.col("p99")), F.col("p01")
    )
    return j.groupBy("l_returnflag").agg(
        F.count("*").alias("n_rows"),
        F.count_if(F.col("l_extendedprice") < F.col("p01")).alias("n_clipped_low"),
        F.count_if(F.col("l_extendedprice") > F.col("p99")).alias(
            "n_clipped_high"
        ),
        r2(F.avg("l_extendedprice")).alias("mean_raw"),
        r2(F.avg(clipped)).alias("mean_winsorized"),
    )


PROFILE_COLS = (
    "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus",
    "o_orderpriority",
)


@query(
    "dq_column_profile",
    oracle=f"""
    WITH stacked AS (
      {" UNION ALL ".join(
          f"SELECT '{c}' AS col_name, CAST({c} AS VARCHAR) AS val FROM orders"
          for c in PROFILE_COLS
      )}
    )
    SELECT col_name,
           count(*) AS n_rows,
           CAST(count_if(val IS NULL) AS BIGINT) AS n_nulls,
           count(DISTINCT val) AS n_distinct,
           min(val) AS min_str,
           max(val) AS max_str
    FROM stacked GROUP BY col_name
    """,
)
def dq_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass COLUMN PROFILER — the table-shaped sibling of
    pipeline_dataset_card: every column's row/null/distinct counts
    and lexicographic min/max in ONE scan, by stacking (col_name,
    stringified value) pairs map-side (explode of a literal struct
    array — Spark's unpivot) and grouping by column name. Values
    compare AS STRINGS by contract (so one schema covers every
    column type; numeric range profiling per column is
    agg_group_sum_avg_minmax's job). At 100 TB profiling N columns
    costs one scan + one (N × distinct-values)-keyed shuffle — not N
    scans — which is the entire point of the stacked layout."""
    t = load_tables(spark, sf_dir, "orders")
    stacked = t["orders"].select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col_name"),
                        F.col(c).cast("string").alias("val"),
                    )
                    for c in PROFILE_COLS
                ]
            )
        ).alias("s")
    ).select("s.col_name", "s.val")
    return stacked.groupBy("col_name").agg(
        F.count("*").alias("n_rows"),
        F.count_if(F.col("val").isNull()).alias("n_nulls"),
        F.countDistinct("val").alias("n_distinct"),
        F.min("val").alias("min_str"),
        F.max("val").alias("max_str"),
    )


@query(
    "dq_referential_integrity",
    oracle="""
    WITH rel AS (
      SELECT 'lineitem.l_orderkey -> orders' AS relation,
             (SELECT count(*) FROM lineitem) AS n_rows,
             (SELECT count(*) FROM lineitem l LEFT JOIN orders o
                ON l.l_orderkey = o.o_orderkey
               WHERE o.o_orderkey IS NULL) AS n_unmatched
      UNION ALL
      SELECT 'orders.o_custkey -> customer',
             (SELECT count(*) FROM orders),
             (SELECT count(*) FROM orders o LEFT JOIN customer c
                ON o.o_custkey = c.c_custkey
               WHERE c.c_custkey IS NULL)
      UNION ALL
      SELECT 'events.user_id -> customer',
             (SELECT count(*) FROM events),
             (SELECT count(*) FROM events e LEFT JOIN customer c
                ON e.user_id = c.c_custkey
               WHERE c.c_custkey IS NULL)
      UNION ALL
      SELECT 'documents.doc_id -> embeddings',
             (SELECT count(*) FROM documents),
             (SELECT count(*) FROM documents d LEFT JOIN embeddings e
                ON d.doc_id = e.vec_id
               WHERE e.vec_id IS NULL)
    )
    SELECT relation,
           CAST(n_rows AS BIGINT) AS n_rows,
           CAST(n_unmatched AS BIGINT) AS n_unmatched,
           round(n_unmatched / n_rows, 6) AS unmatched_pct
    FROM rel
    """,
)
def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity gate: for each declared FK-ish relation,
    count child rows whose key has no parent (LEFT-ANTI join), as a
    fraction of the child table — the check a warehouse runs before
    trusting a join not to silently drop rows. Each relation is one
    anti-join keyed on the FK (shuffle or broadcast as the parent's
    size dictates — customer/embeddings broadcast, orders shuffles);
    nothing is collected. The documents→embeddings relation is
    genuinely partial at sf0.1 (docs outnumber vectors), so the
    nonzero branch is exercised by the sweep, and the orphan logic is
    unit-pinned on crafted frames (tests/test_operators.py)."""

    def rel(name: str, child: DataFrame, key: str, parent: DataFrame, pkey: str):
        n = child.agg(F.count("*").alias("n_rows"))
        orphans = child.join(
            parent.select(F.col(pkey).alias("__pk")),
            child[key] == F.col("__pk"),
            "left_anti",
        ).agg(F.count("*").alias("n_unmatched"))
        return (
            n.crossJoin(F.broadcast(orphans))
            .select(
                F.lit(name).alias("relation"),
                "n_rows",
                "n_unmatched",
                r6(F.col("n_unmatched") / F.col("n_rows")).alias("unmatched_pct"),
            )
        )

    t = load_tables(
        spark, sf_dir, "lineitem", "orders", "customer", "events", "documents",
        "embeddings",
    )
    rows = [
        rel("lineitem.l_orderkey -> orders", t["lineitem"], "l_orderkey",
            t["orders"], "o_orderkey"),
        rel("orders.o_custkey -> customer", t["orders"], "o_custkey",
            t["customer"], "c_custkey"),
        rel("events.user_id -> customer", t["events"], "user_id",
            t["customer"], "c_custkey"),
        rel("documents.doc_id -> embeddings", t["documents"], "doc_id",
            t["embeddings"], "vec_id"),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out


_PSI_SPLIT = "TIMESTAMP '1998-01-01'"
_PSI_BIN_W = 50000
_PSI_NBINS = 10


def _psi_oracle() -> str:
    def block(bin_expr: str, feature: str) -> str:
        return f"""(
      WITH b AS (
        SELECT {bin_expr} AS bin,
               CAST(sum(CASE WHEN o_orderdate < {_PSI_SPLIT} THEN 1 ELSE 0 END) AS BIGINT) AS c_ref,
               CAST(sum(CASE WHEN o_orderdate >= {_PSI_SPLIT} THEN 1 ELSE 0 END) AS BIGINT) AS c_cur
        FROM orders GROUP BY 1
      ), tot AS (
        SELECT sum(c_ref) AS n_ref, sum(c_cur) AS n_cur, count(*) AS nb FROM b
      ), term AS (
        SELECT round(((c_cur + 0.5) / (n_cur + 0.5*nb)
                      - (c_ref + 0.5) / (n_ref + 0.5*nb))
               * ln(((c_cur + 0.5) / (n_cur + 0.5*nb))
                    / ((c_ref + 0.5) / (n_ref + 0.5*nb))), 6) AS t
        FROM b CROSS JOIN tot
      )
      SELECT '{feature}' AS feature, round(sum(t), 6) AS psi,
             CAST(count(*) AS BIGINT) AS n_bins FROM term
    )"""
    price = block(
        f"least(CAST(floor(o_totalprice / {_PSI_BIN_W}) AS BIGINT), {_PSI_NBINS - 1})",
        "o_totalprice_bin50k",
    )
    status = block("CAST(ascii(o_orderstatus) AS BIGINT)", "o_orderstatus")
    return f"SELECT * FROM {price} UNION ALL SELECT * FROM {status}"


def _psi_feature(
    binned: DataFrame, feature: str, is_ref: F.Column
) -> DataFrame:
    """One PSI summary row from a frame with a ``bin`` column: bin
    counts per side in ONE conditional-agg pass, Laplace-smoothed
    proportions, r6-rounded per-bin terms (so the final sum adds
    bit-identical doubles in both engines), r6-rounded total."""
    b = binned.groupBy("bin").agg(
        F.sum(is_ref.cast("long")).alias("c_ref"),
        F.sum((~is_ref).cast("long")).alias("c_cur"),
    )
    tot = b.agg(
        F.sum("c_ref").alias("n_ref"),
        F.sum("c_cur").alias("n_cur"),
        F.count(F.lit(1)).cast("long").alias("nb"),
    )
    p_ref = (F.col("c_ref") + 0.5) / (F.col("n_ref") + 0.5 * F.col("nb"))
    p_cur = (F.col("c_cur") + 0.5) / (F.col("n_cur") + 0.5 * F.col("nb"))
    return (
        b.crossJoin(F.broadcast(tot))
        .select(r6((p_cur - p_ref) * F.log(p_cur / p_ref)).alias("t"))
        .agg(
            r6(F.sum("t")).alias("psi"),
            F.count(F.lit(1)).cast("long").alias("n_bins"),
        )
        .select(F.lit(feature).alias("feature"), "psi", "n_bins")
    )


@query("dq_psi_drift", oracle=_psi_oracle())
def dq_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index drift monitor — the standard
    train/serve distribution-shift gate a production training
    pipeline runs before promoting a new data batch (PSI < 0.1 stable,
    0.1-0.25 moderate shift, > 0.25 retrain): reference = orders
    before 1998-01-01, current = after; one numeric feature
    (o_totalprice, 10 fixed-width bins, overflow clamped into the top
    bin — literal bin edges, so bins mean the same thing in every
    batch and both engines) and one categorical (o_orderstatus, keyed
    by ascii code). Zero-count bins are Laplace-smoothed
    ((c+0.5)/(N+0.5*B)) instead of dropped, the standard fix for
    PSI's ln(0) hole. Status drifts hard (old orders are finished,
    new ones open) while price stays stable — the pair demonstrates
    both verdicts on real data.

    Scale posture: per feature ONE map-side-combined conditional agg
    over the scan (bin counts for both sides in a single pass — no
    per-side scans), a 1-row broadcast of the totals, and a <=B-row
    final agg. Cross-engine exactness: proportions are exact
    rationals; each ln term is r6-rounded BEFORE the sum (the
    agg_entropy doctrine), so the final sum adds identical doubles."""
    t = load_tables(spark, sf_dir, "orders")
    o = t["orders"]
    is_ref = F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    price = o.select(
        F.least(
            F.floor(F.col("o_totalprice") / _PSI_BIN_W).cast("long"),
            F.lit(_PSI_NBINS - 1).cast("long"),
        ).alias("bin"),
        is_ref.alias("is_ref"),
    )
    status = o.select(
        F.ascii("o_orderstatus").cast("long").alias("bin"),
        is_ref.alias("is_ref"),
    )
    return _psi_feature(price, "o_totalprice_bin50k", F.col("is_ref")).unionAll(
        _psi_feature(status, "o_orderstatus", F.col("is_ref"))
    )


@query(
    "dq_embedding_quality",
    oracle="""
    WITH per_vec AS (
      SELECT label,
             len(embedding) AS dim,
             len(list_filter(embedding::DOUBLE[],
                             x -> isnan(x) OR isinf(x))) > 0 AS bad_float,
             sqrt(list_dot_product(embedding::DOUBLE[],
                                   embedding::DOUBLE[])) AS nrm,
             md5(list_aggregate(list_transform(embedding::DOUBLE[],
                   x -> CAST(CAST(floor(x * 1000 + 0.5) AS BIGINT) AS VARCHAR)),
                 'string_agg', ',')) AS ck
      FROM embeddings
    )
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(sum(CASE WHEN dim <> 64 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dim_mismatch,
           CAST(sum(CASE WHEN bad_float THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bad_float,
           CAST(sum(CASE WHEN nrm = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_zero_norm,
           floor(min(nrm) * 1000000 + 0.5) / 1000000 AS norm_min,
           floor(max(nrm) * 1000000 + 0.5) / 1000000 AS norm_max,
           CAST(count(*) - count(DISTINCT ck) AS BIGINT) AS n_dup_content
    FROM per_vec
    GROUP BY label
    """,
)
def dq_embedding_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality audit for the EMBEDDING column — the dq_*
    family applied to vectors, which a 100 TB embedding pipeline needs
    as badly as row counts (one NaN vector poisons every dot product
    in its list; silent dimension drift breaks every zip_with
    downstream; duplicate content wastes index space and skews ANN
    training): per label, vector count, dimension mismatches, NaN/Inf
    carriers, zero-norm vectors (undefined cosine), the [min, max]
    norm range (6-dp — catches an unnormalized batch landing in a
    unit-norm corpus), and duplicate-content count via the md5 of the
    quantized component string (the pipeline_vector_ingest gate key,
    reused). One scan, one groupBy on the label — all counters are
    conditional aggregations in codegen; min/max of doubles are
    order-independent, so the only rounding anywhere is the 6-dp on
    the norm extremes. The norm expression is the sequential-fold dot
    product, bit-identical to DuckDB's list_dot_product."""
    from mercurygate_spark.operators.similarity import dot

    t = load_tables(spark, sf_dir, "embeddings")
    e = t["embeddings"]
    ev = F.col("embedding").cast("array<double>")
    bad = F.exists(ev, lambda x: F.isnan(x) | (F.abs(x) == float("inf")))
    nrm = F.sqrt(dot(ev, ev))
    ck = F.md5(
        F.concat_ws(
            ",",
            F.transform(
                ev,
                lambda x: F.floor(x * 1000 + F.lit(0.5)).cast("long").cast("string"),
            ),
        )
    )
    per_vec = e.select(
        "label",
        F.size("embedding").alias("dim"),
        bad.alias("bad_float"),
        nrm.alias("nrm"),
        ck.alias("ck"),
    )
    return per_vec.groupBy("label").agg(
        F.count("*").cast("long").alias("n_vecs"),
        F.sum(F.when(F.col("dim") != 64, 1).otherwise(0))
        .cast("long")
        .alias("n_dim_mismatch"),
        F.sum(F.when(F.col("bad_float"), 1).otherwise(0))
        .cast("long")
        .alias("n_bad_float"),
        F.sum(F.when(F.col("nrm") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_zero_norm"),
        r6(F.min("nrm")).alias("norm_min"),
        r6(F.max("nrm")).alias("norm_max"),
        (F.count("*") - F.countDistinct("ck")).cast("long").alias("n_dup_content"),
    )
