"""n-step ordered conversion funnel.

Generalizes the view→click→purchase chain (queries/analytics.py
``agg_funnel_steps``) to any number of steps: a user reaches step i
only with an event matching step i's predicate STRICTLY LATER than the
earliest time they reached step i-1 (the standard product-analytics
"ordered funnel" semantics — re-ordering-safe, first-touch based).

Scale shape: one filtered groupBy-min per step plus one same-key join
per step, ALL keyed on the user column — Spark reuses a single hash
partitioning across the chain, so an n-step funnel is n map-side
filtered aggregations over one exchange lineage, never a window over
a global sort. The final depth frame is one row per step-1 user; the
output is n rows.

The reference engine has no funnel operator; this follows the shape
popularized by product-analytics SQL (chained minimal-qualifying-time
self-joins).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def funnel_steps(
    events: DataFrame,
    steps: list[tuple[str, Column]],
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered funnel over ``steps`` = [(label, predicate), ...].

    Returns one row per step, in order: ``step`` (labels of the path so
    far joined with ``>``), ``n_users`` (users whose ordered journey
    reached that step), ``conv_ppm`` (integer parts-per-million of the
    step-1 population — exact integer arithmetic, so a SQL oracle
    replays it bit-for-bit).
    """
    if len(steps) < 2:
        raise ValueError("funnel needs at least 2 steps")

    # Chained earliest-qualifying-time frames: t_i = min ts of an event
    # matching predicate_i with ts > t_{i-1}, per user.
    times: list[DataFrame] = []
    prev: DataFrame | None = None
    for i, (_, pred) in enumerate(steps, start=1):
        e = events.where(pred).select(user_col, ts_col)
        if prev is not None:
            e = e.join(prev, user_col).where(F.col(ts_col) > F.col(f"t{i-1}"))
        cur = e.groupBy(user_col).agg(F.min(ts_col).alias(f"t{i}"))
        times.append(cur)
        prev = cur

    depth = times[0]
    for i, frame in enumerate(times[1:], start=2):
        depth = depth.join(frame.select(user_col, f"t{i}"), user_col, "left")
    # build the depth expression deepest-step-outermost: reaching step
    # i implies t2..t{i-1} are also set, so the DEEPEST non-null must
    # win — ascending wrap order puts t_n's check at the top.
    d = F.lit(1)
    for i in range(2, len(steps) + 1):
        d = F.when(F.col(f"t{i}").isNotNull(), i).otherwise(d)
    depth = depth.select(d.alias("d"))

    aggs = [F.count("*").alias("s1")] + [
        F.count(F.when(F.col("d") >= i, 1)).alias(f"s{i}")
        for i in range(2, len(steps) + 1)
    ]
    agg = depth.agg(*aggs)

    labels, structs = [], []
    for i, (label, _) in enumerate(steps, start=1):
        labels.append(label)
        structs.append(
            F.struct(
                F.lit(i).alias("ord"),
                F.lit(">".join(labels)).alias("step"),
                F.col(f"s{i}").alias("n_users"),
                F.col("s1").alias("first"),
            )
        )
    rows = agg.select(F.explode(F.array(*structs)).alias("r"))
    return (
        rows.select(
            F.col("r.ord").alias("ord"),
            F.col("r.step").alias("step"),
            F.col("r.n_users").alias("n_users"),
            F.expr(
                "case when r.first = 0 then 0"
                " else (r.n_users * 1000000) div r.first end"
            ).alias("conv_ppm"),
        )
        .orderBy("ord")
        .drop("ord")
    )
