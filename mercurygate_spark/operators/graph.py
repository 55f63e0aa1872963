"""Iterative graph operators (PageRank power iteration).

Complements operators/dedup.connected_components (star-contraction):
CC answers "which nodes form one duplicate family", PageRank answers
"which nodes matter" — the centrality signal crawl frontiers and
citation-weighted corpus sampling use. Public algorithm (Page et al.,
"The PageRank Citation Ranking", 1999); the Spark shape follows the
classic iterative-join formulation from the Spark docs' own examples,
re-expressed on DataFrames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DAMPING = 0.85
PAGERANK_ITERS = 3  # shared by graph_pagerank AND its generated oracle


def pagerank_iteration(e: DataFrame, ranks: DataFrame) -> DataFrame:
    """One power-iteration step: (edges⋈deg)⋈ranks keyed on src, then
    the dst-keyed mass sum with damping. Exposed separately so plan
    tests can pin the PRE-checkpoint iteration shape (the checkpointed
    loop's executed plan truncates to a scan and would hide a
    regression to cartesian/BNLJ)."""
    contribs = (
        e.join(ranks, e["src"] == ranks["node"])
        .groupBy("dst")
        .agg(F.sum(F.col("pr") / F.col("d")).alias("mass"))
    )
    return contribs.select(
        F.col("dst").alias("node"),
        (F.lit(1.0 - DAMPING) + F.lit(DAMPING) * F.col("mass")).alias("pr"),
    )


def pagerank(edges: DataFrame, iters: int = PAGERANK_ITERS) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list (src, dst).

    Contract: every node must appear as a src (true for any
    bidirectionalized graph — callers union both directions), so there
    are no dangling nodes and no rank mass leaks; the node set is then
    exactly ``distinct src``.

    Scale shape per iteration: one equi-join of edges⋈ranks keyed on
    src (the out-degree rides along in the edges frame, joined once up
    front, so the loop body is ONE join + ONE groupBy-sum shuffle keyed
    on dst), ranks localCheckpointed each round to truncate iterative
    lineage — same doctrine as connected_components. Edge skew (a hub
    part in every order) lands in the groupBy-sum, where partial
    aggregation absorbs it map-side; nothing collects to the driver.
    """
    deg = edges.groupBy("src").agg(F.count("*").alias("d"))
    # (src, dst, d): degree joined ONCE, reused every iteration
    e = edges.join(deg, "src").localCheckpoint(eager=True)
    ranks = deg.select(F.col("src").alias("node"), F.lit(1.0).alias("pr"))
    for _ in range(iters):
        ranks = pagerank_iteration(e, ranks).localCheckpoint(eager=True)
    return ranks


def pagerank_oracle_sql(iters: int = PAGERANK_ITERS, damping: float = DAMPING) -> str:
    """The EXACT unrolled-CTE twin of :func:`pagerank` on the
    order↔part bipartite graph — one CTE per iteration, generated so
    the oracle and the Spark loop can never drift on iteration count
    or damping."""
    parts = [
        "WITH base AS (SELECT DISTINCT 'o' || CAST(l_orderkey AS VARCHAR) AS o,"
        " 'p' || CAST(l_partkey AS VARCHAR) AS p FROM lineitem),",
        "edges AS (SELECT o AS src, p AS dst FROM base"
        " UNION ALL SELECT p AS src, o AS dst FROM base),",
        "deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),",
        "r0 AS (SELECT src AS node, 1.0 AS pr FROM deg),",
    ]
    for k in range(1, iters + 1):
        parts.append(
            f"r{k} AS (SELECT e.dst AS node,"
            f" {1.0 - damping} + {damping} * sum(r.pr / deg.d) AS pr"
            f" FROM edges e JOIN r{k - 1} r ON e.src = r.node"
            f" JOIN deg ON e.src = deg.src GROUP BY e.dst),"
        )
    parts[-1] = parts[-1].rstrip(",")
    parts.append(f"SELECT node, round(pr, 6) AS pr FROM r{iters}")
    return "\n".join(parts)
