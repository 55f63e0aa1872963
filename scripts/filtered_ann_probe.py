"""Filtered-ANN quality artifact: PRE-filter vs POST-filter recall at
matched candidate budgets (VERDICT r10 #2).

The production vector-DB query is predicate + vector search ("top-k
within my tenant/label"). Two strategies:
  - PRE-filter (sim_filtered_topk's shape): the predicate attribute
    rides the inverted lists; the probe join adds label to the
    equi-key, so non-matching candidates are never scored.
  - POST-filter: run plain ANN top-k', then apply the predicate and
    keep k. Cheap to bolt on, but recall collapses when the unfiltered
    top-k' is dominated by non-matching vectors (at ~10% selectivity,
    k'=k leaves ~k/10 usable rows).

Method: N_Q query vectors, per-query predicate `candidate.label =
query.label` (10 labels → ~10% selectivity). Ground truth = exact
cosine top-K over the label-matching corpus. Measured per strategy:
recall@K and scored candidates/query (the budget).

Run: python scripts/filtered_ann_probe.py [sf_dir]  (default sf0.1)
Output: markdown table (paste into docs/SCALING.md) + one JSON line
(committed as docs/filtered_ann_r11.json).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from mercurygate_spark.operators.similarity import (  # noqa: E402
    N_PROBE,
    cosine,
    cosine_topk,
    cosine_topk_ivf,
    ivf_assign,
    train_ivf_centroids,
)
from mercurygate_spark.session import get_spark  # noqa: E402

N_Q = 50
K = 10


def topk_sets(df) -> dict[int, set[int]]:
    out: dict[int, set[int]] = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["candidate_id"])
    return out


def recall(ann: dict[int, set[int]], truth: dict[int, set[int]]) -> float:
    return sum(len(ann.get(q, set()) & t) / len(t) for q, t in truth.items()) / len(truth)


def prefilter_topk(q, e, cmat, n_probe: int):
    """sim_filtered_topk's plan at an arbitrary n_probe: label joins
    the probe equi-key."""
    ca = ivf_assign(e, cmat, "vec_id", "embedding", n_probe=1, extra_cols=("label",)).select(
        F.col("vec_id").alias("candidate_id"), F.col("embedding").alias("cv"),
        "centroid_id", "label",
    )
    qa = ivf_assign(q, cmat, "vec_id", "embedding", n_probe=n_probe, extra_cols=("label",)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"),
        "centroid_id", "label",
    )
    pairs = qa.join(ca, ["centroid_id", "label"]).where(
        F.col("query_id") != F.col("candidate_id")
    )
    n_cand = pairs.count()
    scored = pairs.select(
        "query_id", "candidate_id",
        (F.floor(cosine(F.col("qv"), F.col("cv")) * 10**4 + F.lit(0.5)) / 10**4).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("candidate_id"))
    top = scored.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= K)
    return top, n_cand


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="filtered_ann", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "16")))
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_corpus = e.count()
    q = e.where(F.col("vec_id") < N_Q)
    q_labels = q.select(F.col("vec_id").alias("query_id"), F.col("label").alias("qlabel"))
    cand_labels = e.select(F.col("vec_id").alias("candidate_id"),
                           F.col("label").alias("clabel"))

    # ground truth: exact cosine top-K over the label-matching corpus
    scored = (
        q.alias("q")
        .join(e.alias("c"), F.col("q.label") == F.col("c.label"))
        .where(F.col("q.vec_id") != F.col("c.vec_id"))
        .select(
            F.col("q.vec_id").alias("query_id"),
            F.col("c.vec_id").alias("candidate_id"),
            (F.floor(cosine(F.col("q.embedding"), F.col("c.embedding")) * 10**4 + F.lit(0.5)) / 10**4).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("candidate_id"))
    truth = topk_sets(scored.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= K))
    match_rows = scored.count()

    cmat = train_ivf_centroids(e, "vec_id", "embedding")
    results: dict[str, dict] = {
        "truth_filtered_bruteforce": {
            "recall": 1.0, "cand_per_q": round(match_rows / N_Q, 1),
        }
    }

    # PRE-filter at n_probe = 1, 2 (default), 4
    for np_ in (1, N_PROBE, 4):
        top, n_cand = prefilter_topk(q, e, cmat, np_)
        results[f"prefilter_nprobe{np_}"] = {
            "recall": round(recall(topk_sets(top), truth), 3),
            "cand_per_q": round(n_cand / N_Q, 1),
        }

    # POST-filter: plain IVF top-k', filter label, keep K. The scored
    # budget is the UNFILTERED probe fan-out (what the query pays).
    qa = ivf_assign(q, cmat, "vec_id", "embedding", n_probe=N_PROBE).select(
        F.col("vec_id").alias("query_id"), "centroid_id"
    )
    ca = ivf_assign(e, cmat, "vec_id", "embedding", n_probe=1).select(
        F.col("vec_id").alias("candidate_id"), "centroid_id"
    )
    plain_budget = qa.join(ca, "centroid_id").where(
        F.col("query_id") != F.col("candidate_id")
    ).count()
    for kprime in (K, 5 * K, 10 * K):
        ann_df = (
            cosine_topk_ivf(q, e, k=kprime, n_probe=N_PROBE)
            .join(cand_labels, "candidate_id")
            .join(F.broadcast(q_labels), "query_id")
            .where(F.col("clabel") == F.col("qlabel"))
        )
        w2 = Window.partitionBy("query_id").orderBy("rk")
        kept = ann_df.withColumn("rk2", F.row_number().over(w2)).where(F.col("rk2") <= K)
        results[f"postfilter_kprime{kprime}"] = {
            "recall": round(recall(topk_sets(kept), truth), 3),
            "cand_per_q": round(plain_budget / N_Q, 1),
        }

    print("| strategy | recall@10 | scored candidates/query |")
    print("|---|---|---|")
    for name, r in results.items():
        print(f"| {name} | {r['recall']} | {r['cand_per_q']} |")
    print(json.dumps({"sf_dir": sf_dir, "n_corpus": n_corpus, "n_queries": N_Q,
                      "k": K, "n_labels": 10, "results": results}))


if __name__ == "__main__":
    main()
