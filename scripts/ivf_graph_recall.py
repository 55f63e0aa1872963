"""Per-IVF-list graph serving quality artifact (VERDICT r11 next #4):
recall@K and scored-candidates/query for beam-search-over-the-list-graph
vs the flat full-list scan, at equal and smaller candidate budgets.

Method: queries are the first N_Q corpus vec_ids, each probing its own
rank-1 inverted list (the sim_ivf_graph_topk setting, generalized to
N_Q queries and a (B, HOPS) grid). Ground truth is exact cosine top-K
over the FULL corpus. For each configuration we measure
  - recall@K vs the exact top-K;
  - scored candidates/query (entry + all beam expansions for the
    graph walk; the whole probed list for the flat scan) — the work
    dial that matters when a list holds millions of vectors.
The flat n_probe=1 scan is the recall CEILING for any in-list method
(the graph walk can only lose candidates within the same list), so the
table reads as: how much of the flat-scan recall does the graph keep
while scoring far fewer candidates?

Run: python scripts/ivf_graph_recall.py [sf_dir]
Output: markdown table (paste into docs/SCALING.md) + one JSON line.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from mercurygate_spark.operators.similarity import (  # noqa: E402
    GRAPH_G,
    cosine,
    cosine_topk,
    ivf_assign,
    ivf_list_knn_graph,
    train_ivf_centroids,
)
from mercurygate_spark.session import get_spark  # noqa: E402

N_Q = 50
K = 5


def fcos(a, b):
    return F.floor(cosine(a, b) * 10**4 + F.lit(0.5)) / 10**4


def topk_sets(df, qcol="query_id", ccol="candidate_id"):
    out = {}
    for r in df.collect():
        out.setdefault(r[qcol], set()).add(r[ccol])
    return out


def recall(got: dict, truth: dict) -> float:
    qs = sorted(truth)
    return sum(len(got.get(q, set()) & truth[q]) / len(truth[q]) for q in qs) / len(qs)


def graph_walk(q, lists, entry, edges, beam, hops: int, qbeam=None):
    """The sim_ivf_graph_topk walk with parametric (beam, hops) and
    N_Q queries; returns (final topk frame, visited frame). ``qbeam``
    (a (query_id, qbeam) frame) overrides the scalar beam per query —
    the boundary-adaptive policy widens the beam exactly for the
    queries that probe two lists."""
    v = q.select("query_id", "centroid_id").join(entry, "centroid_id").select(
        "query_id", "centroid_id", "cand_id"
    )
    cand_vecs = lists.select(
        F.col("vec_id").alias("cand_id"), F.col("embedding").alias("cv")
    )

    # one qv row per query even when q probes >1 list (n_probe=2 leg:
    # a per-probe join would duplicate every scored candidate)
    qvec = q.select("query_id", "qv").distinct()

    def score(c):
        return (
            c.join(qvec, "query_id")
            .join(cand_vecs, "cand_id")
            .select(
                "query_id", "centroid_id", "cand_id",
                fcos(F.col("qv"), F.col("cv")).alias("cos"),
            )
        )

    w_q = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), "cand_id")
    frontier = v
    for h in range(hops):
        g = edges.select(F.col("centroid_id").alias("ecid"), "node_id", "neighbor_id")
        nbrs = (
            frontier.join(
                g,
                (frontier["centroid_id"] == g["ecid"])
                & (frontier["cand_id"] == g["node_id"]),
            )
            .select("query_id", "centroid_id", F.col("neighbor_id").alias("cand_id"))
            .distinct()
        )
        v = v.unionByName(nbrs).distinct()
        scored = score(v).withColumn("rn", F.row_number().over(w_q))
        if qbeam is not None:
            qb = qbeam[h] if isinstance(qbeam, list) else qbeam
            scored = scored.join(F.broadcast(qb), "query_id").where(
                F.col("rn") <= F.col("qbeam")
            )
        else:
            scored = scored.where(F.col("rn") <= beam)
        frontier = scored.select("query_id", "centroid_id", "cand_id")
    final = (
        score(v)
        .where(F.col("cand_id") != F.col("query_id"))
        .withColumn("rk", F.row_number().over(w_q))
        .where(F.col("rk") <= K)
    )
    return final, v


def main() -> None:
    adaptive_only = "--adaptive-only" in sys.argv
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.1"
    spark = get_spark("ivf-graph-recall")
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = e.count()
    q_src = e.where(F.col("vec_id") < N_Q)

    truth = topk_sets(cosine_topk(q_src, e, k=K))

    cmat = train_ivf_centroids(e)
    lists = (
        ivf_assign(e, cmat, "vec_id", "embedding", n_probe=1)
        .select("vec_id", "embedding", "centroid_id")
        .localCheckpoint(eager=True)
    )
    cents = spark.createDataFrame(
        [(i, [float(x) for x in cmat[i]]) for i in range(cmat.shape[0])],
        schema="cidx int, cvec array<double>",
    )
    c2c = lists.join(F.broadcast(cents), lists["centroid_id"] == cents["cidx"]).select(
        "centroid_id", "vec_id", fcos(F.col("embedding"), F.col("cvec")).alias("cc")
    )
    w_e = Window.partitionBy("centroid_id").orderBy(F.col("cc").desc(), "vec_id")
    ranked_entries = c2c.withColumn("rn", F.row_number().over(w_e))

    def entries(e_count: int):
        """Top-E most-central members per list as walk entries — the
        multi-entry recall dial (VERDICT r12 next #3): E seeds give the
        beam E independent basins to escape a bad entry's neighborhood."""
        return ranked_entries.where(F.col("rn") <= e_count).select(
            "centroid_id", F.col("vec_id").alias("cand_id")
        )

    edges = ivf_list_knn_graph(lists).localCheckpoint(eager=True)
    q = lists.where(F.col("vec_id") < N_Q).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        "centroid_id",
    )

    # flat baseline: exact scan of the whole probed list
    flat_scored = (
        q.join(
            lists.select(
                F.col("vec_id").alias("cand_id"),
                F.col("embedding").alias("cv"),
                F.col("centroid_id").alias("ccid"),
            ),
            q["centroid_id"] == F.col("ccid"),
        )
        .where(F.col("cand_id") != F.col("query_id"))
        .select("query_id", "cand_id", fcos(F.col("qv"), F.col("cv")).alias("cos"))
    )
    w_q = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), "cand_id")
    flat_cands = flat_scored.count() / N_Q
    flat = topk_sets(
        flat_scored.withColumn("rk", F.row_number().over(w_q)).where(F.col("rk") <= K),
        ccol="cand_id",
    )

    rows = [
        {
            "config": "flat full-list scan (ceiling)",
            "recall": round(recall(flat, truth), 3),
            "cands_per_q": round(flat_cands, 1),
        }
    ]
    edges8 = ivf_list_knn_graph(lists, g=8).localCheckpoint(eager=True)
    grid = () if adaptive_only else (
        (edges, GRAPH_G, 4, 2, 1),
        (edges, GRAPH_G, 8, 2, 1),
        (edges, GRAPH_G, 8, 3, 1),
        (edges, GRAPH_G, 16, 3, 1),
        (edges8, 8, 8, 3, 1),
        (edges8, 8, 16, 3, 1),
        # multi-entry dial (VERDICT r12 next #3): E central seeds per
        # list — measures whether extra seeds buy recall the beam alone
        # tops out on (r12 frontier: 0.22 vs flat 0.244)
        (edges8, 8, 8, 3, 2),
        (edges8, 8, 8, 3, 4),
        (edges8, 8, 16, 3, 4),
    )
    for edge_frame, g_deg, beam, hops, e_count in grid:
        final, visited = graph_walk(
            q, lists, entries(e_count), edge_frame, beam, hops
        )
        got = topk_sets(final, ccol="cand_id")
        cands = visited.count() / N_Q
        rows.append(
            {
                "config": f"graph walk G={g_deg} B={beam} hops={hops} E={e_count}",
                "recall": round(recall(got, truth), 3),
                "cands_per_q": round(cands, 1),
            }
        )

    # ---- n_probe=2 leg (VERDICT r13 next #7): the measured frontier
    # tops out at 0.24 vs the n_probe=1 flat ceiling 0.244 because the
    # walk stays inside ONE list — a query near a Voronoi boundary
    # cannot recover neighbors living in the adjacent list at ANY
    # E/B/hops. Walking the top-2 lists moves the CEILING itself.
    q2 = (
        ivf_assign(e.where(F.col("vec_id") < N_Q), cmat, "vec_id", "embedding",
                   n_probe=2)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qv"),
            "centroid_id",
        )
    )
    flat2_scored = (
        q2.join(
            lists.select(
                F.col("vec_id").alias("cand_id"),
                F.col("embedding").alias("cv"),
                F.col("centroid_id").alias("ccid"),
            ),
            q2["centroid_id"] == F.col("ccid"),
        )
        .where(F.col("cand_id") != F.col("query_id"))
        .select("query_id", "cand_id", fcos(F.col("qv"), F.col("cv")).alias("cos"))
        .distinct()
    )
    flat2 = topk_sets(
        flat2_scored.withColumn("rk", F.row_number().over(w_q)).where(
            F.col("rk") <= K
        ),
        ccol="cand_id",
    )
    rows.append(
        {
            "config": "flat 2-list scan (n_probe=2 ceiling)",
            "recall": round(recall(flat2, truth), 3),
            "cands_per_q": round(flat2_scored.count() / N_Q, 1),
        }
    )
    for beam, e_count in () if adaptive_only else ((8, 2), (8, 4), (16, 4)):
        final, visited = graph_walk(
            q2, lists, entries(e_count), edges8, beam, 3
        )
        got = topk_sets(final, ccol="cand_id")
        rows.append(
            {
                "config": f"graph walk G=8 B={beam} hops=3 E={e_count} n_probe=2",
                "recall": round(recall(got, truth), 3),
                "cands_per_q": round(visited.count() / N_Q, 1),
            }
        )

    # ---- boundary-ADAPTIVE n_probe leg (VERDICT r14 next #1): probe
    # the second list ONLY for queries whose top-2 centroid margin is
    # small (the IMI/ADC trick). Margin rule on the exact int64
    # quantized squared distances: probe 2 iff 100*(d2-d1) <= pct*d1
    # — integer-exact in both engines. Non-boundary queries save the
    # whole second-list walk; the budget goes to beam width.
    q2d = (
        ivf_assign(e.where(F.col("vec_id") < N_Q), cmat, "vec_id", "embedding",
                   n_probe=2, with_dist=True)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qv"),
            "centroid_id", "probe_rank", "probe_dist",
        )
        .localCheckpoint(eager=True)
    )
    w_margin = Window.partitionBy("query_id")
    q2m = q2d.withColumn("d1", F.min("probe_dist").over(w_margin))
    # margin distribution: how compressed the top-2 centroid margins
    # are decides which pcts gate at all (first run: >=25% gates nothing
    # on this corpus — near-uniform embeddings sit close to Voronoi
    # boundaries, so the useful thresholds are single-digit pcts)
    margins = sorted(
        r["m"]
        for r in q2m.where(F.col("probe_rank") == 2)
        .select(
            (100 * (F.col("probe_dist") - F.col("d1")) / F.col("d1")).alias("m")
        )
        .collect()
    )
    mdist = {
        "p10": round(margins[len(margins) // 10], 2),
        "p25": round(margins[len(margins) // 4], 2),
        "p50": round(margins[len(margins) // 2], 2),
        "p75": round(margins[3 * len(margins) // 4], 2),
        "p90": round(margins[9 * len(margins) // 10], 2),
    }
    print(f"# margin %-of-d1 distribution: {mdist}", file=sys.stderr)
    adaptive_grid = (
        # (pct, beam_boundary, beam_interior, hops): per-query beam —
        # boundary queries (2 lists, the recall-limited population) get
        # the wide beam; interior queries sit near their 1-list ceiling
        # already, so a narrow beam loses little
        # annealed per-hop beams: wide first hop picks basins, narrow
        # later hops refine — same total candidate budget buys more
        # recall than a uniform beam
        ((12, [24, 18, 12, 6], [12, 8, 6, 6], 4, 4),
         (11, [24, 18, 12, 8], [12, 8, 6, 6], 4, 4),
         (12, [24, 18, 10, 8], [10, 8, 6, 6], 4, 4),
         (12, [26, 18, 12, 8], [10, 8, 6, 4], 4, 4),
         (13, [24, 18, 12, 8], [10, 8, 6, 6], 4, 4),
         (12, [24, 20, 12, 8], [12, 8, 6, 6], 4, 4))
        if adaptive_only
        else ((10, 16, 16, 3, 4), (25, 16, 16, 3, 4), (50, 16, 16, 3, 4),
              (100, 16, 16, 3, 4), (25, 24, 24, 3, 4), (50, 24, 24, 3, 4),
              (100, 24, 24, 3, 4), (50, 16, 16, 4, 4), (100, 16, 16, 4, 4),
              (100, 24, 24, 4, 4))
    )
    for pct, b2, b1, hops, e_cnt in adaptive_grid:
        b2s = b2 if isinstance(b2, list) else [b2] * hops
        b1s = b1 if isinstance(b1, list) else [b1] * hops
        gate = 100 * (F.col("probe_dist") - F.col("d1")) <= pct * F.col("d1")
        qa = q2m.where((F.col("probe_rank") == 1) | gate).select(
            "query_id", "qv", "centroid_id"
        )
        frac2 = (qa.count() - N_Q) / N_Q
        gated = q2m.groupBy("query_id").agg(
            F.max(((F.col("probe_rank") == 2) & gate).cast("int"))
            .cast("boolean")
            .alias("g2")
        )
        qbeams = [
            gated.select(
                "query_id",
                F.when(F.col("g2"), F.lit(b2s[h]))
                .otherwise(F.lit(b1s[h]))
                .alias("qbeam"),
            )
            for h in range(hops)
        ]
        final, visited = graph_walk(
            qa, lists, entries(e_cnt), edges8, None, hops, qbeam=qbeams
        )
        got = topk_sets(final, ccol="cand_id")
        rows.append(
            {
                "config": (
                    f"ADAPTIVE margin<={pct}% G=8 B2={b2} B1={b1} hops={hops} E={e_cnt}"
                ),
                "recall": round(recall(got, truth), 3),
                "cands_per_q": round(visited.count() / N_Q, 1),
                "frac_probe2": round(frac2, 2),
            }
        )

    print(f"\n| config | recall@{K} | scored cands/query (corpus n={n}) |")
    print("|---|---|---|")
    for r in rows:
        print(f"| {r['config']} | {r['recall']} | {r['cands_per_q']} |")
    print()
    print(json.dumps({"sf_dir": sf_dir, "n": n, "k": K, "n_q": N_Q, "rows": rows}))
    spark.stop()


if __name__ == "__main__":
    main()
