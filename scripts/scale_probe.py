"""10x scale probe: measure how registry queries grow with data size.

Builds an N-times (default 10x) scaled copy of an sf directory by
unioning key-shifted copies of the big tables, then times a set of
registry queries at both scales and prints small/big wall-clock ratios.
Evidence consumer: docs/SCALING.md.

Scaling is structure-preserving, not naive duplication:

- fact keys (l_orderkey, o_orderkey, event_id, user_id, doc_id,
  vec_id) shift by copy * stride so key cardinality grows with the
  data — group counts scale, group sizes do not;
- document text is passed through a per-copy character substitution
  (``translate`` with a rotated alphabet), so near-duplicate pairs
  WITHIN a copy remain near-duplicates while texts ACROSS copies stop
  colliding — duplicate-cluster sizes stay constant and cluster count
  grows, which is how a real 10x corpus behaves (naive copying would
  grow every LSH bucket 10x and measure Sigma-bucket^2 blowup instead
  of scaling);
- embeddings are cyclically rotated by the copy index — rotation
  preserves every within-copy dot product exactly (cosine structure
  intact) while cross-copy similarities decorrelate;
- dimension tables (region/nation/customer/supplier/part) are copied
  unscaled, exactly like a production star schema at 10x facts.

Usage:
    python scripts/scale_probe.py [--factor 10] [--sf-dir DIR]
        [--out DIR] [--keys k1,k2,...]
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Default probe set: the five round-1 headline shapes plus the
# dedup / similarity / text / composed-pipeline keys the LLM-corpus
# brief cares about.
DEFAULT_KEYS = [
    "agg_group_sum_avg_minmax",
    "join_inner_equi",
    "join_broadcast_dim",
    "window_dedupe_latest",
    "sort_limit_topk",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_connected_components",
    "sim_cosine_ann_lsh",
    "text_quality_score",
    "pipeline_corpus_curate",
]

# Alphabet rotated per copy for the text substitution. Only lowercase
# letters are mapped, so tokenization/whitespace structure is intact.
_ALPHA = "abcdefghijklmnopqrstuvwxyz"


def _copy_expr_documents(i: int) -> dict[str, F.Column]:
    rot = _ALPHA[i % 26 :] + _ALPHA[: i % 26]
    return {
        "doc_id": F.col("doc_id") + F.lit(i * 1_000_000_000),
        "text": F.translate(F.col("text"), _ALPHA, rot),
    }


def _copy_expr_embeddings(i: int, dim: int) -> dict[str, F.Column]:
    k = i % dim
    if k == 0:
        emb = F.col("embedding")
    else:
        emb = F.concat(
            F.slice(F.col("embedding"), k + 1, dim - k),
            F.slice(F.col("embedding"), 1, k),
        )
    return {"vec_id": F.col("vec_id") + F.lit(i * 1_000_000_000), "embedding": emb}


def build_scaled_dir(
    spark: SparkSession, sf_dir: str, out_dir: str, factor: int
) -> None:
    out = Path(out_dir)
    if out.exists():
        shutil.rmtree(out)
    out.mkdir(parents=True)

    dim = len(
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("embedding")
        .first()[0]
    )
    shifts: dict[str, callable] = {
        "lineitem": lambda i: {"l_orderkey": F.col("l_orderkey") + F.lit(i * 1_000_000_000)},
        "orders": lambda i: {"o_orderkey": F.col("o_orderkey") + F.lit(i * 1_000_000_000)},
        "events": lambda i: {
            "event_id": F.col("event_id") + F.lit(i * 1_000_000_000),
            "user_id": F.col("user_id") + F.lit(i * 1_000_000_000),
        },
        "documents": _copy_expr_documents,
        "embeddings": lambda i: _copy_expr_embeddings(i, dim),
    }
    small = {t: spark.read.parquet(f"{sf_dir}/{t}.parquet") for t in shifts}
    for t, make in shifts.items():
        parts = []
        for i in range(factor):
            df = small[t]
            for c, e in make(i).items():
                df = df.withColumn(c, e)
            parts.append(df)
        big: DataFrame = parts[0]
        for p in parts[1:]:
            big = big.unionByName(p)
        big.write.mode("overwrite").parquet(str(out / f"{t}.parquet"))
    # dims: unscaled, like a production star schema
    for t in ("region", "nation", "customer", "supplier", "part"):
        src = Path(sf_dir) / f"{t}.parquet"
        dst = out / f"{t}.parquet"
        if src.is_dir():
            shutil.copytree(src, dst)
        else:
            shutil.copy(src, dst)


def time_key(spark: SparkSession, fn, sf_dir: str, runs: int = 2) -> float:
    """Steady-state wall-clock: best of `runs` full executions."""
    best = float("inf")
    for _ in range(runs):
        t0 = time.monotonic()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.monotonic() - t0)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/mercurygate_scale_probe")
    ap.add_argument("--keys", default=",".join(DEFAULT_KEYS))
    ap.add_argument("--skip-build", action="store_true")
    args = ap.parse_args()

    from mercurygate_spark.queries import all_queries
    from mercurygate_spark.session import get_spark

    spark = get_spark("scale-probe")
    if not args.skip_build:
        build_scaled_dir(spark, args.sf_dir, args.out, args.factor)

    reg = all_queries()
    keys = args.keys.split(",")
    # steady-state: run every probed key once at each scale untimed
    # (JVM/codegen/Python-worker warmup), then measure best-of-2
    for key in keys:
        for d in (args.sf_dir, args.out):
            reg[key](spark, d).write.format("noop").mode("overwrite").save()
    results = {}
    for key in keys:
        fn = reg[key]
        t_small = time_key(spark, fn, args.sf_dir)
        t_big = time_key(spark, fn, args.out)
        results[key] = {
            "small_s": round(t_small, 2),
            "big_s": round(t_big, 2),
            "ratio": round(t_big / t_small, 1),
        }
        print(
            f"{key:32s} {t_small:6.2f}s  {t_big:6.2f}s  "
            f"{t_big / t_small:4.1f}x",
            flush=True,
        )
    print(json.dumps({"factor": args.factor, "results": results}))


if __name__ == "__main__":
    main()
