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
