"""Per-stage ~100x scale probe for the two worst 10x curves
(VERDICT r6, next-round item 2): pipeline_corpus_curate and
dedup_connected_components.

The total-wall-clock probe (scripts/scale_probe.py) showed 2.2-2.7x
growth at 10x data; this probe scales the documents table to 10x and
100x (same structure-preserving construction: shifted doc_ids +
per-copy alphabet rotation, so duplicate-cluster SIZES stay constant
while cluster COUNT grows — how a real corpus scales) and times each
pipeline STAGE separately, so any superlinear stage is identified by
name rather than inferred from the total.

Stage timing method: stage k is timed as the wall-clock to materialize
the pipeline THROUGH stage k (count/noop-write); the per-stage
increment is t_k - t_{k-1}. Increments can be slightly negative-noisy
for cheap stages (plan-prefix re-execution varies); the signal is the
big increments. CC rounds are timed exactly via the on_round hook.

Usage:
    python scripts/stage_probe.py --factors 10,100 --out docs/stage_probe_r07.json
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import DataFrame, SparkSession, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

_ALPHA = "abcdefghijklmnopqrstuvwxyz"


def build_scaled_documents(
    spark: SparkSession, sf_dir: str, out_dir: str, factor: int
) -> None:
    """documents-only variant of scale_probe.build_scaled_dir (the two
    probed keys read nothing else)."""
    out = Path(out_dir)
    if out.exists():
        shutil.rmtree(out)
    out.mkdir(parents=True)
    small = spark.read.parquet(f"{sf_dir}/documents.parquet")
    parts = []
    for i in range(factor):
        # seeded alphabet PERMUTATION, not rotation: rotations cycle at
        # 26 copies, after which copies i and i+26 carry IDENTICAL text
        # and the probe measures a duplicate-heavy corpus instead of
        # scale (observed: 100x rotation run collapsed 500k docs to
        # 130k exact-dedup survivors). A per-copy md5-seeded bijection
        # keeps within-copy near-dup structure (injective char map)
        # while decorrelating ALL copies pairwise.
        perm = "".join(
            sorted(_ALPHA, key=lambda ch: hashlib.md5(f"{i}:{ch}".encode()).hexdigest())
        ) if i else _ALPHA
        parts.append(
            small.withColumn("doc_id", F.col("doc_id") + F.lit(i * 1_000_000_000))
            .withColumn("text", F.translate(F.col("text"), _ALPHA, perm))
        )
    big: DataFrame = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    # repartition so the scaled file has sane task granularity
    big.repartition(max(4, factor // 2)).write.mode("overwrite").parquet(
        str(out / "documents.parquet")
    )


def _t(thunk) -> float:
    t0 = time.monotonic()
    thunk()
    return round(time.monotonic() - t0, 2)


def probe_curate_stages(spark: SparkSession, sf_dir: str) -> dict:
    """Cumulative-materialization stage timings for the curate
    pipeline, mirroring queries/corpus.py:pipeline_corpus_curate
    stage-for-stage (same operators, same thresholds)."""
    from mercurygate_spark.operators.dedup import (
        connected_components,
        minhash_candidate_pairs,
    )
    from mercurygate_spark.operators.text import fingerprint, quality_features
    from mercurygate_spark.queries import all_queries
    from mercurygate_spark.queries.corpus import MAX_PUNCT_PCT, MIN_TOKENS
    from mercurygate_spark.queries.registry import load_tables

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    feat = quality_features(docs, "text")
    quality = feat.where(
        (F.col("n_tokens") >= MIN_TOKENS)
        & (F.col("n_punct") * 100 <= F.col("char_len") * MAX_PUNCT_PCT)
    )
    w = Window.partitionBy(fingerprint("text")).orderBy("doc_id")
    survivors = (
        quality.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select("doc_id", "text", "n_tokens")
    )
    pairs = minhash_candidate_pairs(survivors, "doc_id").where(
        F.col("n_shared_bands") >= 2
    )

    stages: dict[str, float] = {}
    counts: dict[str, int] = {}

    def stage(name: str, df: DataFrame) -> None:
        t0 = time.monotonic()
        counts[name] = df.count()
        stages[name] = round(time.monotonic() - t0, 2)

    stage("1_quality_filter", quality)
    stage("2_exact_dedup", survivors)
    stage("3_candidate_pairs", pairs)  # signatures + band self-join
    t0 = time.monotonic()
    counts["4_connected_components"] = connected_components(pairs).count()
    stages["4_connected_components"] = round(time.monotonic() - t0, 2)
    t0 = time.monotonic()
    all_queries()["pipeline_corpus_curate"](spark, sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()
    stages["5_full_key"] = round(time.monotonic() - t0, 2)
    return {"cumulative_s": stages, "rows": counts}


def probe_cc_rounds(spark: SparkSession, sf_dir: str) -> dict:
    """Exact per-round CC timings via the on_round hook, over the same
    candidate pairs dedup_connected_components uses."""
    from mercurygate_spark.operators.dedup import (
        connected_components,
        minhash_candidate_pairs,
    )
    from mercurygate_spark.queries.registry import load_tables

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    pairs = minhash_candidate_pairs(docs, "doc_id").where(
        F.col("n_shared_bands") >= 2
    )
    t0 = time.monotonic()
    n_pairs = pairs.localCheckpoint(eager=True).count()
    t_pairs = round(time.monotonic() - t0, 2)

    rounds: list[dict] = []

    def on_round(rnd: int, n_edges: int, seconds: float) -> None:
        rounds.append({"round": rnd, "edges": n_edges, "s": round(seconds, 2)})

    t0 = time.monotonic()
    n_nodes = connected_components(pairs, on_round=on_round).count()
    t_cc = round(time.monotonic() - t0, 2)
    return {
        "pairs_build_s": t_pairs,
        "n_pairs": n_pairs,
        "cc_total_s": t_cc,
        "n_labeled_nodes": n_nodes,
        "rounds": rounds,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--factors", default="10,100")
    ap.add_argument("--tmp", default="/tmp/mercurygate_stage_probe")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from mercurygate_spark.session import get_spark

    spark = get_spark("stage-probe")
    factors = [int(f) for f in args.factors.split(",")]
    report: dict = {"base_sf_dir": args.sf_dir, "scales": {}}

    # warmup at base scale (codegen/Python workers), then probe base
    probe_curate_stages(spark, args.sf_dir)
    report["scales"]["1x"] = {
        "curate": probe_curate_stages(spark, args.sf_dir),
        "cc": probe_cc_rounds(spark, args.sf_dir),
    }
    for f in factors:
        d = f"{args.tmp}_{f}x"
        t_build = _t(lambda: build_scaled_documents(spark, args.sf_dir, d, f))
        print(f"# built {f}x dir in {t_build}s", file=sys.stderr)
        report["scales"][f"{f}x"] = {
            "curate": probe_curate_stages(spark, d),
            "cc": probe_cc_rounds(spark, d),
        }
        print(f"# {f}x: {json.dumps(report['scales'][f'{f}x'])[:400]}", file=sys.stderr)

    text = json.dumps(report, indent=2)
    if args.out:
        with open(REPO / args.out, "w") as fh:
            fh.write(text + "\n")
        print(f"# wrote {args.out}", file=sys.stderr)
    print(text)
    spark.stop()


if __name__ == "__main__":
    main()
