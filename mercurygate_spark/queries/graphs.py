"""Graph analytics beyond PageRank/connected-components: triangle
counting and breadth-first shortest paths, both on a deterministic
synthetic graph derived arithmetically from `events` so the DuckDB
oracle replays the identical edge set.

Public algorithms: triangle counting by oriented-wedge join (Suri &
Vassilvitskii, "Counting Triangles and the Curse of the Last Reducer",
WWW 2011); BFS as iterative frontier expansion (the same
iterate-join-checkpoint doctrine as operators.graph.pagerank and
operators.dedup.connected_components).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mercurygate_spark.queries.registry import load_tables, query

# Edge synthesis: node space of 997, edges from the event-id residue
# space 0..4095 — the edge SET is a pure function of which residues
# occur, so it saturates at ~4096 edges and the graph (avg degree ~8,
# sparse) is IDENTICAL at every sf once all residues appear. Both
# engines evaluate the same integer arithmetic; no float anywhere.
GRAPH_M = 997  # node space (prime)
GRAPH_RES = 4096  # event_id residue space that generates edges
BFS_MAX_LVL = 6  # frontier iterations (diameter of this graph is ~4)

_EDGE_SQL = f"""
    SELECT DISTINCT
           least((e % {GRAPH_RES}) * 193 % {GRAPH_M},
                 ((e % {GRAPH_RES}) * 389 + 71) % {GRAPH_M}) AS lo,
           greatest((e % {GRAPH_RES}) * 193 % {GRAPH_M},
                    ((e % {GRAPH_RES}) * 389 + 71) % {GRAPH_M}) AS hi
    FROM (SELECT event_id AS e FROM events)
    WHERE (e % {GRAPH_RES}) * 193 % {GRAPH_M}
          <> ((e % {GRAPH_RES}) * 389 + 71) % {GRAPH_M}
"""


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical undirected edge list (lo < hi), distinct."""
    ev = load_tables(spark, sf_dir, "events")["events"]
    e = F.col("event_id") % GRAPH_RES
    a = (e * 193) % GRAPH_M
    b = (e * 389 + 71) % GRAPH_M
    return (
        ev.select(
            F.least(a, b).alias("lo"),
            F.greatest(a, b).alias("hi"),
        )
        .where(F.col("lo") != F.col("hi"))
        .distinct()
    )


@query(
    "graph_triangle_count",
    oracle=f"""
    WITH e AS ({_EDGE_SQL}),
    wedges AS (
      SELECT e1.lo AS a, e1.hi AS b, e2.hi AS c
      FROM e e1 JOIN e e2 ON e1.hi = e2.lo
    )
    SELECT 'n_nodes' AS metric,
           count(*) AS value
    FROM (SELECT lo FROM e UNION SELECT hi FROM e)
    UNION ALL SELECT 'n_edges', count(*) FROM e
    UNION ALL SELECT 'n_wedges', count(*) FROM wedges
    UNION ALL
    SELECT 'n_triangles', count(*)
    FROM wedges w JOIN e e3 ON e3.lo = w.a AND e3.hi = w.c
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting by oriented wedge join: with every edge
    canonicalized lo<hi, a triangle a<b<c is counted exactly once as
    wedge (a,b)+(b,c) closed by edge (a,c) — two equi-joins, zero
    cartesian surface. At 100 TB the refinement is degree-based
    orientation (orient each edge toward the HIGHER-degree endpoint so
    wedge counts are bounded by sum(min-degree²) instead of
    sum(degree²) — Suri & Vassilvitskii 2011); id-orientation here
    keeps the oracle twin one expression, and the join shape (edges ⋈
    edges on the shared vertex, then closure probe) is identical under
    either orientation."""
    # the edge frame feeds FIVE consumers (both wedge sides, the
    # closure probe, the node list, the edge count) and the wedge
    # frame two — materialize each once so the events scan + DISTINCT
    # shuffle and the wedge join don't recompute per unionAll branch
    # (at 100 TB you'd persist to cluster storage; localCheckpoint is
    # the local[] equivalent, same doctrine as connected_components)
    e = _edges(spark, sf_dir).localCheckpoint(eager=True)
    e1 = e.alias("e1")
    e2 = e.alias("e2")
    e3 = e.alias("e3")
    wedges = (
        e1.join(e2, F.col("e1.hi") == F.col("e2.lo"))
        .select(
            F.col("e1.lo").alias("a"),
            F.col("e1.hi").alias("b"),
            F.col("e2.hi").alias("c"),
        )
        .localCheckpoint(eager=True)
    )
    tri = wedges.join(
        e3, (F.col("e3.lo") == F.col("a")) & (F.col("e3.hi") == F.col("c"))
    )
    nodes = e.select(F.col("lo").alias("n")).union(e.select(F.col("hi").alias("n")))

    def row(metric: str, frame: DataFrame) -> DataFrame:
        return frame.select(F.lit(metric).alias("metric"), F.col("value"))

    return (
        row("n_nodes", nodes.agg(F.countDistinct("n").alias("value")))
        .unionAll(row("n_edges", e.agg(F.count("*").alias("value"))))
        .unionAll(row("n_wedges", wedges.agg(F.count("*").alias("value"))))
        .unionAll(row("n_triangles", tri.agg(F.count("*").alias("value"))))
    )


@query(
    "graph_shortest_path_bfs",
    oracle=f"""
    WITH RECURSIVE e AS ({_EDGE_SQL}),
    bi AS (
      SELECT lo AS src, hi AS dst FROM e
      UNION ALL
      SELECT hi AS src, lo AS dst FROM e
    ),
    bfs AS (
      SELECT 0 AS node, 0 AS lvl
      UNION
      SELECT bi.dst, bfs.lvl + 1
      FROM bfs JOIN bi ON bi.src = bfs.node
      WHERE bfs.lvl < {BFS_MAX_LVL}
    ),
    d AS (SELECT node, min(lvl) AS lvl FROM bfs GROUP BY node)
    SELECT lvl,
           count(*) AS n_nodes,
           min(node) AS min_node,
           max(node) AS max_node
    FROM d GROUP BY lvl
    """,
)
def graph_shortest_path_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source BFS (unweighted shortest paths) from node 0,
    capped at 6 levels: iterative frontier expansion where each round
    is ONE src-keyed equi-join (frontier ⋈ edges) plus ONE left-anti
    join against the visited set, with the accumulated distance frame
    localCheckpointed per round to truncate iterative lineage (the
    connected_components doctrine — lineage growth, not data volume,
    is what kills iterative DataFrame jobs). Frontier size is bounded
    by the node set, never by paths: the anti-join dedupes BEFORE the
    next expansion, so the combinatorial path explosion the naive
    UNION ALL recursion hits can't occur. The oracle replays the same
    min-level semantics with a recursive UNION-distinct CTE."""
    e = _edges(spark, sf_dir)
    edges = e.select(F.col("lo").alias("src"), F.col("hi").alias("dst")).unionAll(
        e.select(F.col("hi").alias("src"), F.col("lo").alias("dst"))
    )
    dist = spark.createDataFrame([(0, 0)], "node long, lvl int").localCheckpoint(
        eager=True
    )
    frontier = dist
    for i in range(BFS_MAX_LVL):
        nxt = (
            frontier.join(edges, frontier["node"] == edges["src"])
            .select(F.col("dst").alias("node"), F.lit(i + 1).alias("lvl"))
            .distinct()
            .join(dist.select("node"), "node", "left_anti")
            .localCheckpoint(eager=True)
        )
        if not nxt.take(1):
            break
        dist = dist.unionAll(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return (
        dist.groupBy("lvl")
        .agg(
            F.count("*").alias("n_nodes"),
            F.min("node").alias("min_node"),
            F.max("node").alias("max_node"),
        )
        .select("lvl", "n_nodes", "min_node", "max_node")
    )


# k-core edge synthesis: the shared _EDGE_SQL graph is a union of
# cycles (every node degree exactly 2 — any affine/polynomial map of
# the residue is periodic mod the node space), which makes every
# k-core trivial. These generators use integer DIVISION to break the
# periodicity: degrees spread 3..12 (median 8), and k=5 peeling is
# genuinely iterative (2 active rounds, ~10% of nodes removed).
KCORE_K = 5       # the core order: peel nodes with degree < K
KCORE_ROUNDS = 8  # fixed peel rounds — part of the deterministic spec
                  # (converged by round 2 on the testdata; the extra
                  # rounds are provable no-ops on both engines)
KCORE_M = 131     # k-core node space — small enough that the residue
KCORE_RES = 512   # space saturates at EVERY sf (event_id 0..999 at
                  # sf0.001 still covers all 512 residues), so the
                  # core is non-trivial at every test scale

_KCORE_EDGE_SQL = f"""
    SELECT DISTINCT
           least((e * e // 7) % {KCORE_M}, (e * 3 + e // 11) % {KCORE_M}) AS lo,
           greatest((e * e // 7) % {KCORE_M}, (e * 3 + e // 11) % {KCORE_M}) AS hi
    FROM (SELECT event_id % {KCORE_RES} AS e FROM events)
    WHERE (e * e // 7) % {KCORE_M} <> (e * 3 + e // 11) % {KCORE_M}
"""


def _kcore_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    return (
        ev.selectExpr(f"event_id % {KCORE_RES} AS e")
        .selectExpr(
            f"least((e * e div 7) % {KCORE_M}, (e * 3 + e div 11) % {KCORE_M}) AS lo",
            f"greatest((e * e div 7) % {KCORE_M}, (e * 3 + e div 11) % {KCORE_M}) AS hi",
        )
        .where(F.col("lo") != F.col("hi"))
        .distinct()
    )


def _kcore_oracle() -> str:
    """Unrolled-CTE oracle for graph_kcore: KCORE_ROUNDS peel rounds,
    each MATERIALIZED (each round references the previous one three
    times — degree count + two endpoint filters — which plain inlined
    CTEs would expand to 3^rounds copies of the base scan)."""
    parts = [f"e0 AS MATERIALIZED ({_KCORE_EDGE_SQL})"]
    for r in range(1, KCORE_ROUNDS + 1):
        parts.append(f"""deg{r} AS MATERIALIZED (
      SELECT node, count(*) AS d FROM (
        SELECT lo AS node FROM e{r - 1}
        UNION ALL SELECT hi AS node FROM e{r - 1}
      ) GROUP BY node
    ), keep{r} AS MATERIALIZED (
      SELECT node FROM deg{r} WHERE d >= {KCORE_K}
    ), e{r} AS MATERIALIZED (
      SELECT e.lo, e.hi FROM e{r - 1} e
      JOIN keep{r} a ON e.lo = a.node
      JOIN keep{r} b ON e.hi = b.node
    )""")
    chain = ",\n    ".join(parts)
    return f"""
    WITH {chain}
    SELECT node, count(*) AS core_degree FROM (
      SELECT lo AS node FROM e{KCORE_ROUNDS}
      UNION ALL SELECT hi AS node FROM e{KCORE_ROUNDS}
    ) GROUP BY node
    """


@query("graph_kcore", oracle=_kcore_oracle())
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{KCORE_ROUNDS}-round k-core peeling (k={KCORE_K}): repeatedly
    drop nodes with degree < k and the edges touching them — the
    standard subgraph-density primitive (Seidman 1983, "Network
    structure and minimum degree") behind spam-cluster and community
    filtering. Iterative same-doctrine-as-CC/PageRank plan: per round
    one partial-aggregable degree count + two semi-join-shaped
    endpoint filters, edges localCheckpoint-ed to truncate lineage.
    The fixed round count is the spec (converged rounds are no-ops on
    both engines); the oracle unrolls every round, so a drift in peel
    order or survivor set fails the hash. Returns the surviving
    nodes with their in-core degrees."""
    edges = _kcore_edges(spark, sf_dir).localCheckpoint(eager=True)
    for _ in range(KCORE_ROUNDS):
        deg = (
            edges.select(F.col("lo").alias("node"))
            .unionAll(edges.select(F.col("hi").alias("node")))
            .groupBy("node")
            .agg(F.count("*").alias("d"))
        )
        keep = deg.where(F.col("d") >= KCORE_K).select("node")
        edges = (
            edges.join(keep.selectExpr("node AS lo"), "lo")
            .join(keep.selectExpr("node AS hi"), "hi")
            .select("lo", "hi")
            .localCheckpoint(eager=True)
        )
    return (
        edges.select(F.col("lo").alias("node"))
        .unionAll(edges.select(F.col("hi").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("core_degree"))
    )


LPA_ROUNDS = 4  # synchronous label-propagation rounds (fixed — part of the spec)


def _lpa_oracle() -> str:
    """Unrolled-CTE oracle for graph_label_propagation: LPA_ROUNDS
    synchronous rounds; each round's label = most frequent neighbor
    label, ties to the smallest label — pure integer argmax, so both
    engines agree exactly."""
    parts = [
        f"ud AS MATERIALIZED ({_EDGE_SQL})",
        """dir AS MATERIALIZED (
      SELECT lo AS src, hi AS dst FROM ud
      UNION ALL SELECT hi AS src, lo AS dst FROM ud
    )""",
        "lab0 AS (SELECT DISTINCT src AS node, src AS label FROM dir)",
    ]
    for r in range(1, LPA_ROUNDS + 1):
        parts.append(f"""lab{r} AS MATERIALIZED (
      SELECT node, label FROM (
        SELECT d.src AS node, l.label, count(*) AS cnt,
               row_number() OVER (
                 PARTITION BY d.src ORDER BY count(*) DESC, l.label
               ) AS rn
        FROM dir d JOIN lab{r - 1} l ON d.dst = l.node
        GROUP BY d.src, l.label
      ) WHERE rn = 1
    )""")
    chain = ",\n    ".join(parts)
    return f"""
    WITH {chain}
    SELECT l.node, l.label,
           count(*) OVER (PARTITION BY l.label) AS community_size
    FROM lab{LPA_ROUNDS} l
    """


@query("graph_label_propagation", oracle=_lpa_oracle())
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007, "Near
    linear time algorithm to detect community structures") with the
    deterministic tie rule that makes it oracle-replayable: each
    round, every node adopts the most frequent label among its
    neighbors, ties broken toward the SMALLEST label (plain LPA
    breaks ties randomly — useless under a correctness gate). Fixed
    {LPA_ROUNDS} rounds, unrolled in the oracle so round count can't
    drift. Plan doctrine = PageRank/CC: per round one join (neighbor
    labels) + one groupBy argmax — the argmax is min-of-struct
    (-count, label), partially aggregable, never a sort — with
    localCheckpoint truncating lineage between rounds. Everything is
    integer arithmetic: exact on both engines."""
    edges = _edges(spark, sf_dir)
    dirc = edges.selectExpr("lo AS src", "hi AS dst").unionAll(
        edges.selectExpr("hi AS src", "lo AS dst")
    ).localCheckpoint(eager=True)
    labels = dirc.select(F.col("src").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    for _ in range(LPA_ROUNDS):
        nbr = dirc.join(labels, dirc.dst == labels.node).select("src", "label")
        counts = nbr.groupBy("src", "label").agg(F.count(F.lit(1)).alias("cnt"))
        labels = (
            counts.groupBy("src")
            .agg(
                F.min(F.struct((-F.col("cnt")).alias("neg"), F.col("label").alias("lab")))
                .getField("lab")
                .alias("label")
            )
            .withColumnRenamed("src", "node")
            .localCheckpoint(eager=True)
        )
    w = Window.partitionBy("label")
    return labels.select(
        "node", "label", F.count(F.lit(1)).over(w).alias("community_size")
    )
