"""Duplicate-family skew probe at the dedup layer (round-8 advice #6).

Builds a head-heavy near-dup corpus — a single duplicate family
holding --family-frac (default 10%) of --n-docs documents, the rest
unique — and measures LSH candidate generation both ways:

  1. all-pairs band-bucket self-join (minhash_candidate_pairs): the
     family shares band buckets, so candidates grow Θ((fN)²) — the
     quadratic blowup no salting can fix because it is the OUTPUT;
  2. star edges (lsh_star_edges): ≤ N_BANDS·N candidates, hot bucket
     handled by a map-side-combinable groupBy-min + linear join-back.

Both edge sets are fed to connected_components and the resulting
(node, component) assignments are checked for EQUALITY — the speedup
claim cannot drift from correctness. Records wall-clock, candidate
rows, the max band-bucket size (the skew evidence), and the CC check.

Usage:
    python scripts/dedup_skew_probe.py [--n-docs 100000]
        [--family-frac 0.10] [--out docs/dedup_skew_probe_r08.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402


def build_corpus(spark, n_docs: int, family_frac: float):
    """Deterministic synthetic corpus: ids < n_family are one near-dup
    family (same 40-token base text, one trailing variant token per
    residue class — Jaccard stays far above the LSH threshold); the
    rest get per-doc vocabularies that share nothing."""
    n_family = int(n_docs * family_frac)
    base = " ".join(f"boilerplate token {i} shared across the family" for i in range(10))
    df = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") < n_family,
            F.concat(F.lit(base + " variant "), (F.col("id") % 5).cast("string")),
        )
        .otherwise(
            F.concat(
                F.lit("unique document "),
                F.col("id").cast("string"),
                F.lit(" about subject "),
                (F.col("id") * 7919).cast("string"),
                F.lit(" with vocabulary "),
                (F.col("id") * 104729).cast("string"),
            )
        )
        .alias("text"),
    )
    return df.repartition(32).localCheckpoint(eager=True), n_family


def cc_checksum(cc) -> tuple[int, int]:
    row = cc.agg(
        F.count("*").alias("n"),
        F.expr("bit_xor(hash(node, component))").alias("x"),
    ).collect()[0]
    return int(row["n"]), int(row["x"] or 0)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=100_000)
    ap.add_argument("--family-frac", type=float, default=0.10)
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from mercurygate_spark.operators.dedup import (
        connected_components,
        lsh_bands,
        lsh_star_edges,
        minhash_candidate_pairs,
        minhash_signature_arrow,
    )
    from mercurygate_spark.session import get_spark

    spark = get_spark(app_name="dedup_skew_probe", cpus=args.cpus)
    docs, n_family = build_corpus(spark, args.n_docs, args.family_frac)

    # skew evidence: the biggest band bucket ≈ family size / variants
    bands = lsh_bands(minhash_signature_arrow(docs, "doc_id"), "doc_id")
    top = (
        bands.groupBy("band_idx", "band_key")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc())
        .limit(5)
        .collect()
    )
    bucket_sizes = [int(r["n"]) for r in top]

    t0 = time.time()
    pairs = minhash_candidate_pairs(docs, "doc_id").localCheckpoint(eager=True)
    n_pairs = pairs.count()
    t_pairs = time.time() - t0

    t0 = time.time()
    star = lsh_star_edges(docs, "doc_id").localCheckpoint(eager=True)
    n_star = star.count()
    t_star = time.time() - t0

    t0 = time.time()
    chk_pairs = cc_checksum(connected_components(pairs))
    t_cc_pairs = time.time() - t0
    t0 = time.time()
    chk_star = cc_checksum(connected_components(star))
    t_cc_star = time.time() - t0

    artifact = {
        "n_docs": args.n_docs,
        "family_frac": args.family_frac,
        "n_family": n_family,
        "top_bucket_sizes": bucket_sizes,
        "all_pairs": {
            "candidates": n_pairs,
            "gen_seconds": round(t_pairs, 1),
            "cc_seconds": round(t_cc_pairs, 1),
        },
        "star_edges": {
            "candidates": n_star,
            "gen_seconds": round(t_star, 1),
            "cc_seconds": round(t_cc_star, 1),
        },
        "candidate_ratio": round(n_pairs / max(n_star, 1), 1),
        "cc_identical": chk_pairs == chk_star,
        "cc_nodes": chk_pairs[0],
    }
    text = json.dumps(artifact, indent=2)
    if args.out:
        repo = str(Path(__file__).resolve().parent.parent)
        with open(os.path.join(repo, args.out), "w") as f:
            f.write(text + "\n")
    print(text)
    spark.stop()


if __name__ == "__main__":
    main()
