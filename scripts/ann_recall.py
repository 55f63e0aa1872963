"""ANN quality artifact: recall@10 + candidate-set reduction for the
ANN variants vs the brute-force baseline (VERDICT r5 item 5).

Method: the first N_Q vec_ids are the query set; ground truth is
exact cosine top-10 over the full corpus (cosine_topk). For each ANN
variant we measure
  - recall@10: |ANN top-10 ∩ exact top-10| / 10, averaged over queries;
  - candidates/query: rows surviving the variant's blocking join
    (bucket-equi for LSH, probed inverted lists for IVF) — the work
    each query actually pays, vs |corpus|-1 for brute force.

Run: python scripts/ann_recall.py [sf_dir] (default /root/testdata/sf0.1)
Output: a markdown table (paste into docs/SCALING.md) + one JSON line.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mercurygate_spark.operators.similarity import (  # noqa: E402
    N_PROBE,
    TRAIN_SAMPLE_KEEP,
    TRAIN_SAMPLE_MOD,
    cosine_topk,
    cosine_topk_ivf,
    cosine_topk_lsh,
    cosine_topk_lsh_multi,
    ivf_assign,
    ivfpq_adc_topk,
    ivfpq_rerank_topk,
    lsh_bucket,
    lsh_bucket_multi,
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


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="ann_recall", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "16")))
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_corpus = e.count()
    q = e.where(F.col("vec_id") < N_Q)

    truth = topk_sets(cosine_topk(q, e, k=K))

    results = {}

    # --- LSH ---
    ann = topk_sets(cosine_topk_lsh(q, e, k=K))
    qb = lsh_bucket(q, "vec_id", "embedding").select(
        F.col("vec_id").alias("query_id"), "bucket"
    )
    cb = lsh_bucket(e, "vec_id", "embedding").select(
        F.col("vec_id").alias("candidate_id"), "bucket"
    )
    cand = (
        qb.join(cb, "bucket")
        .where(F.col("query_id") != F.col("candidate_id"))
        .count()
    )
    results["sim_cosine_ann_lsh"] = (recall(ann, truth), cand / N_Q)

    # --- multi-table LSH (union of 4 seeded tables) ---
    ann = topk_sets(cosine_topk_lsh_multi(q, e, k=K))
    qbm = lsh_bucket_multi(q, "vec_id", "embedding").select(
        F.col("vec_id").alias("query_id"), "lsh_table", "bucket"
    )
    cbm = lsh_bucket_multi(e, "vec_id", "embedding").select(
        F.col("vec_id").alias("candidate_id"), "lsh_table", "bucket"
    )
    cand = (
        qbm.join(cbm, ["lsh_table", "bucket"])
        .where(F.col("query_id") != F.col("candidate_id"))
        .select("query_id", "candidate_id")
        .distinct()
        .count()
    )
    results["sim_cosine_ann_lsh_multi"] = (recall(ann, truth), cand / N_Q)

    # --- IVF, full-corpus training ---
    ann = topk_sets(cosine_topk_ivf(q, e, k=K))
    cmat_full = train_ivf_centroids(e, "vec_id", "embedding")
    ca_full = ivf_assign(e, cmat_full, "vec_id", "embedding", n_probe=1).select(
        F.col("vec_id").alias("candidate_id"), "centroid_id"
    )
    qa = ivf_assign(q, cmat_full, "vec_id", "embedding", n_probe=N_PROBE).select(
        F.col("vec_id").alias("query_id"), "centroid_id"
    )
    cand = (
        qa.join(ca_full, "centroid_id")
        .where(F.col("query_id") != F.col("candidate_id"))
        .count()
    )
    results["sim_cosine_ivf"] = (recall(ann, truth), cand / N_Q)

    # --- IVF, md5-sample training (the 100 TB path) ---
    sample = (TRAIN_SAMPLE_KEEP, TRAIN_SAMPLE_MOD)
    ann = topk_sets(cosine_topk_ivf(q, e, k=K, train_sample=sample))
    cmat = train_ivf_centroids(e, "vec_id", "embedding", sample=sample)
    ca = ivf_assign(e, cmat, "vec_id", "embedding", n_probe=1).select(
        F.col("vec_id").alias("candidate_id"), "centroid_id"
    )
    qa = ivf_assign(q, cmat, "vec_id", "embedding", n_probe=N_PROBE).select(
        F.col("vec_id").alias("query_id"), "centroid_id"
    )
    cand = (
        qa.join(ca, "centroid_id")
        .where(F.col("query_id") != F.col("candidate_id"))
        .count()
    )
    results["sim_cosine_ivf_sampled"] = (recall(ann, truth), cand / N_Q)

    # --- IVF probe sweep: the recall/cost dial ---
    sweep = {}
    for np_ in (1, 2, 4, 8):
        ann = topk_sets(cosine_topk_ivf(q, e, k=K, n_probe=np_))
        qa = ivf_assign(q, cmat_full, "vec_id", "embedding", n_probe=np_).select(
            F.col("vec_id").alias("query_id"), "centroid_id"
        )
        cand = (
            qa.join(ca_full, "centroid_id")
            .where(F.col("query_id") != F.col("candidate_id"))
            .count()
        )
        sweep[np_] = (recall(ann, truth), cand / N_Q)

    # --- IVFPQ probe sweep: SAME candidate budget as IVF at each
    # n_probe (identical coarse quantizer + list assignment — the
    # blocking is shared), but scoring by the 16-byte PQ code instead
    # of the exact float vector. recall(IVF) - recall(IVFPQ) at equal
    # candidates IS the quantization cost; candidates/query vs LSH at
    # comparable recall IS the pruning win. ---
    pq_sweep = {}
    for np_ in (1, 2, 4, 8):
        ann = topk_sets(ivfpq_adc_topk(e, k=K, n_queries=N_Q, n_probe=np_))
        pq_sweep[np_] = (recall(ann, truth), sweep[np_][1])
    results["sim_ivfpq_topk"] = pq_sweep[N_PROBE]

    # --- IVFPQ + exact re-rank of the code-ranked top-R: same
    # candidate budget as IVFPQ; the recall recovered vs plain IVFPQ
    # is what R exact float reads per query buy back. Sweep R to show
    # where the refinement saturates (R→candidates ⇒ recall→IVF's). ---
    rerank_sweep = {}
    for r_ in (10, 25, 50, 100):
        ann = topk_sets(ivfpq_rerank_topk(e, k=K, n_queries=N_Q, r=r_))
        rerank_sweep[r_] = (recall(ann, truth), pq_sweep[N_PROBE][1])
    results["sim_ivfpq_rerank"] = rerank_sweep[50]

    bf_cand = n_corpus - 1
    print(f"\ncorpus={n_corpus} queries={N_Q} k={K}  (sf_dir={sf_dir})\n")
    print("| variant | recall@10 | candidates/query | vs brute force | random-baseline recall |")
    print("|---|---|---|---|---|")
    print(f"| sim_cosine_topk (exact) | 1.000 | {bf_cand} | 1.0× | — |")
    for name, (r, c) in results.items():
        # random baseline: scoring the same NUMBER of uniformly-random
        # candidates would recall ~ c/bf_cand — how much structure the
        # blocking actually captures
        print(
            f"| {name} | {r:.3f} | {c:.0f} | {bf_cand / c:.1f}× fewer "
            f"| {c / bf_cand:.3f} |"
        )
    print("\nIVFPQ re-rank R sweep (n_probe=2, exact re-scoring of the "
          "code-ranked top R):\n")
    print("| R | recall@10 |")
    print("|---|---|")
    for r_, (rc, _) in rerank_sweep.items():
        print(f"| {r_} | {rc:.3f} |")
    print("\nIVF vs IVFPQ probe sweep (full-corpus training; equal "
          "candidate budget per n_probe):\n")
    print("| n_probe | candidates/query | IVF recall@10 (exact scoring) "
          "| IVFPQ recall@10 (16 B codes) |")
    print("|---|---|---|---|")
    for np_ in sweep:
        r_ivf, c = sweep[np_]
        r_pq, _ = pq_sweep[np_]
        print(f"| {np_} | {c:.0f} | {r_ivf:.3f} | {r_pq:.3f} |")
    print()
    print(json.dumps({
        "corpus": n_corpus, "n_queries": N_Q, "k": K,
        "brute_candidates": bf_cand,
        **{n: {"recall_at_10": round(r, 4), "candidates_per_query": round(c, 1)}
           for n, (r, c) in results.items()},
        "ivf_probe_sweep": {
            str(np_): {"recall_at_10": round(r, 4), "candidates_per_query": round(c, 1)}
            for np_, (r, c) in sweep.items()
        },
        "ivfpq_probe_sweep": {
            str(np_): {"recall_at_10": round(r, 4), "candidates_per_query": round(c, 1)}
            for np_, (r, c) in pq_sweep.items()
        },
        "ivfpq_rerank_R_sweep": {
            str(r_): {"recall_at_10": round(rc, 4)}
            for r_, (rc, _) in rerank_sweep.items()
        },
    }))


if __name__ == "__main__":
    main()
