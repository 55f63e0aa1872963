"""SemDeDup k ∝ N probe (VERDICT r8 #5): pin the verbally-argued rule
that growing the cluster count with the corpus suppresses the
quadratic in-cluster pairwise term.

dedup_semantic (the oracle-checked KEY) fixes k=16 so the oracle can
replay the training bit-for-bit; the production rule from the paper is
k ∝ N (cluster sizes stay ~constant, so Σ|cluster|² grows linearly,
not quadratically). This probe runs the OPERATOR path (same trained
Lloyd's, same integer-exact cos² pairing) at 1× and 10× embeddings
with k=16 fixed vs k scaled 16→64 (embeddings grow 10×; sqrt-ish k
growth is the common deployment curve — even sublinear k visibly
flattens the quadratic; k ∝ N flattens it fully) and records the
per-cluster pair counts plus wall-clock of the pairwise stage.

Usage: python scripts/semdedup_kprobe.py [--sf-dir /root/testdata/sf0.1]
           [--factor 10] [--out docs/semdedup_kprobe_r09.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from mercurygate_spark.operators.similarity import (  # noqa: E402
    QUANT,
    ivf_assign,
    train_ivf_centroids,
)
from mercurygate_spark.session import get_spark  # noqa: E402
from scripts.scale_probe import _copy_expr_embeddings  # noqa: E402

SEM_TAU2 = 0.16  # cos >= 0.4 → cos² >= 0.16 (same threshold as the key)


def pair_stage(e, k: int) -> dict:
    """Train k centroids, assign, run the in-cluster pairwise cos²
    stage (the quadratic step), return work + time metrics."""
    t0 = time.monotonic()
    cmat = train_ivf_centroids(e, k=k)
    train_s = time.monotonic() - t0

    assigned = ivf_assign(e, cmat, "vec_id", "embedding", n_probe=1)
    lsum = lambda col: F.aggregate(  # noqa: E731
        col, F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    qe = F.transform("embedding", lambda x: F.floor(x * QUANT + F.lit(0.5)).cast("long"))
    base = assigned.select(
        "vec_id", "centroid_id", qe.alias("qe")
    ).withColumn("n2", lsum(F.transform("qe", lambda x: x * x)))
    base = base.localCheckpoint(eager=True)

    sizes = base.groupBy("centroid_id").count().collect()
    sz = sorted((r["count"] for r in sizes), reverse=True)
    sum_sq = sum(s * s for s in sz)

    a, b = base.alias("a"), base.alias("b")
    t0 = time.monotonic()
    pairs = (
        a.join(b, (F.col("a.centroid_id") == F.col("b.centroid_id"))
               & (F.col("a.vec_id") < F.col("b.vec_id")))
        .withColumn("dot", lsum(F.zip_with("a.qe", "b.qe", lambda x, y: x * y)))
        .select(
            (F.col("dot") * F.col("dot")
             >= F.lit(SEM_TAU2) * F.col("a.n2") * F.col("b.n2")).alias("dup")
        )
    )
    agg = pairs.agg(
        F.count("*").alias("pairs_scored"), F.sum(F.col("dup").cast("long")).alias("dups")
    ).first()
    pair_s = time.monotonic() - t0
    n = base.count()
    return {
        "n_vectors": n,
        "k": k,
        "max_cluster": sz[0],
        "sum_cluster_sq": sum_sq,
        "pairs_scored": agg["pairs_scored"],
        "dup_pairs": agg["dups"],
        "pairs_per_vector": round(agg["pairs_scored"] / n, 1),
        "train_seconds": round(train_s, 2),
        "pairwise_seconds": round(pair_s, 2),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "16")))
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    spark = get_spark(app_name="semdedup_kprobe", cpus=args.cpus)
    scratch = tempfile.mkdtemp(prefix="mg_semk_")
    try:
        small = spark.read.parquet(f"{args.sf_dir}/embeddings.parquet")
        dim = len(small.select("embedding").first()[0])
        parts = []
        for i in range(args.factor):
            d = small
            for c, ex in _copy_expr_embeddings(i, dim).items():
                d = d.withColumn(c, ex)
            parts.append(d)
        big = parts[0]
        for p in parts[1:]:
            big = big.unionByName(p)
        big_path = f"{scratch}/embeddings.parquet"
        big.write.mode("overwrite").parquet(big_path)
        big = spark.read.parquet(big_path)

        out = {
            "base": pair_stage(small, 16),
            "scaled_fixed_k": pair_stage(big, 16),
            "scaled_grown_k": pair_stage(big, 64),
        }
        b, f, g = out["base"], out["scaled_fixed_k"], out["scaled_grown_k"]
        out["summary"] = {
            "pairs_ratio_fixed_k": round(f["pairs_scored"] / b["pairs_scored"], 1),
            "pairs_ratio_grown_k": round(g["pairs_scored"] / b["pairs_scored"], 1),
            "pairs_per_vector": {
                "base_k16": b["pairs_per_vector"],
                "x10_k16": f["pairs_per_vector"],
                "x10_k64": g["pairs_per_vector"],
            },
            "pairwise_seconds": {
                "base_k16": b["pairwise_seconds"],
                "x10_k16": f["pairwise_seconds"],
                "x10_k64": g["pairwise_seconds"],
            },
        }
        print(json.dumps(out))
        if args.out:
            with open(args.out, "w") as fh:
                json.dump(out, fh, indent=1)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
