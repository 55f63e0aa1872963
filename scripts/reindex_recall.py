"""Reindex-swap payoff artifact: frozen vs RETRAINED quantizer recall
on a drifted grown corpus (round-9 verdict item 1's "measured payoff
of the swap").

Method: the base corpus is the sf embeddings table; the appended batch
is the same vectors under a deterministic DISTRIBUTION DRIFT — every
component shifted by a constant offset, then re-normalized to unit
norm (the shift pulls the whole batch toward the all-ones direction,
i.e. into a region the base-trained coarse centroids never saw; offset
0 is the no-drift control). Queries are the first N_Q drifted vectors
— the realistic serving case: new queries come from the NEW
distribution. Ground truth is exact cosine top-K over the grown
corpus.

For each drift offset we measure recall@K of:
  - IVF (exact scoring inside probed lists) under FROZEN quantizers
    (trained on base only — what sim_ivfpq_incremental_append serves)
    vs RETRAINED quantizers (trained on the grown corpus — what
    sim_ivfpq_reindex_swap swaps in). The gap is pure list-coverage
    loss from coarse-quantizer drift.
  - IVFPQ (16 B code ADC scoring) frozen vs retrained. The gap adds
    codebook drift on top.

Run: python scripts/reindex_recall.py [sf_dir] (default /root/testdata/sf0.1)
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
    N_PROBE,
    cosine,
    cosine_topk,
    ivf_assign,
    ivfpq_encode,
    ivfpq_score_distributed,
    pq_train_codebooks,
    train_ivf_centroids,
)
from mercurygate_spark.session import get_spark  # noqa: E402

N_Q = 50
K = 10
ID_SHIFT = 10_000_000
OFFSETS = (0.0, 0.25, 0.5)


def drifted(e, offset: float):
    """The appended batch: every component + offset, re-normalized to
    unit norm, ids shifted out of the base range. offset=0 is the
    no-drift control (same distribution, new ids)."""
    shifted = F.transform(F.col("embedding").cast("array<double>"),
                          lambda x: x + F.lit(float(offset)))
    nrm = F.sqrt(
        F.aggregate(shifted, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    unit = F.transform(shifted, lambda x: x / nrm)
    return e.select(
        (F.col("vec_id") + F.lit(ID_SHIFT)).alias("vec_id"),
        unit.alias("embedding"),
    )


def topk_sets(df) -> dict[int, set[int]]:
    out: dict[int, set[int]] = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["candidate_id"])
    return out


def recall(ann: dict[int, set[int]], truth: dict[int, set[int]]) -> float:
    return sum(
        len(ann.get(q, set()) & t) / len(t) for q, t in truth.items()
    ) / len(truth)


def ivf_exact_topk(queries, grown, cmat):
    """IVF with a GIVEN coarse quantizer: probe N_PROBE lists, exact
    cosine inside them, top-K. Returns (topk_df, candidates_per_query)
    — the second number is what drift does to COST: a frozen quantizer
    that herds the whole drifted batch into a few lists shows up as
    candidates/query degenerating toward |corpus| (brute force), even
    while its recall looks deceptively high."""
    lists = ivf_assign(grown, cmat, "vec_id", "embedding", n_probe=1).select(
        F.col("vec_id").alias("candidate_id"),
        F.col("embedding").alias("cv"),
        "centroid_id",
    )
    probes = ivf_assign(queries, cmat, "vec_id", "embedding", n_probe=N_PROBE).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        "centroid_id",
    )
    pairs = probes.join(lists, "centroid_id").where(
        F.col("query_id") != F.col("candidate_id")
    )
    cand_per_q = pairs.count() / N_Q
    scored = pairs.select(
        "query_id", "candidate_id",
        cosine(F.col("qv"), F.col("cv")).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), "candidate_id")
    top = scored.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= K)
    return top, cand_per_q


def ivfpq_topk(queries, index, cmat, cmats):
    scored = ivfpq_score_distributed(queries, index, cmat, cmats)
    w = Window.partitionBy("query_id").orderBy("adc", "candidate_id")
    return scored.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= K)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(
        app_name="reindex_recall",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "16")),
    )
    base = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    )
    rows = {}
    for off in OFFSETS:
        batch = drifted(base, off).localCheckpoint(eager=True)
        grown = base.unionByName(batch).localCheckpoint(eager=True)
        queries = batch.where(F.col("vec_id") < ID_SHIFT + N_Q)
        truth = topk_sets(cosine_topk(queries, grown, k=K))

        frozen_cmat = train_ivf_centroids(base)
        frozen_cmats = pq_train_codebooks(base)
        re_cmat = train_ivf_centroids(grown)
        re_cmats = pq_train_codebooks(grown)

        top_f, cand_f = ivf_exact_topk(queries, grown, frozen_cmat)
        top_r, cand_r = ivf_exact_topk(queries, grown, re_cmat)
        r_ivf_frozen = recall(topk_sets(top_f), truth)
        r_ivf_re = recall(topk_sets(top_r), truth)
        idx_frozen = ivfpq_encode(grown, frozen_cmat, frozen_cmats)
        idx_re = ivfpq_encode(grown, re_cmat, re_cmats)
        r_pq_frozen = recall(topk_sets(ivfpq_topk(queries, idx_frozen, frozen_cmat, frozen_cmats)), truth)
        r_pq_re = recall(topk_sets(ivfpq_topk(queries, idx_re, re_cmat, re_cmats)), truth)
        rows[off] = (r_ivf_frozen, cand_f, r_ivf_re, cand_r, r_pq_frozen, r_pq_re)
        print(f"# offset={off} done", file=sys.stderr)

    n = base.count()
    print(f"\ngrown corpus = {2 * n} (base {n} + drifted batch {n}), "
          f"queries = {N_Q} drifted, k = {K}, n_probe = {N_PROBE}  (sf_dir={sf_dir})\n")
    print("| drift offset | IVF frozen recall (cand/q) | IVF retrained "
          "recall (cand/q) | IVFPQ frozen recall | IVFPQ retrained recall |")
    print("|---|---|---|---|---|")
    for off, (a, ca, b, cb, c, d) in rows.items():
        print(f"| {off} | {a:.3f} ({ca:.0f}) | {b:.3f} ({cb:.0f}) "
              f"| {c:.3f} | {d:.3f} |")
    print()
    print(json.dumps({
        "sf_dir": sf_dir, "base_corpus": n, "n_queries": N_Q, "k": K,
        "n_probe": N_PROBE, "id_shift": ID_SHIFT,
        "by_offset": {
            str(off): {
                "ivf_recall_frozen": round(a, 4),
                "ivf_cand_per_q_frozen": round(ca, 1),
                "ivf_recall_retrained": round(b, 4),
                "ivf_cand_per_q_retrained": round(cb, 1),
                "ivfpq_recall_frozen": round(c, 4),
                "ivfpq_recall_retrained": round(d, 4),
            }
            for off, (a, ca, b, cb, c, d) in rows.items()
        },
    }))


if __name__ == "__main__":
    main()
