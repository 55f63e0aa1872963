"""cosine_pre crossover A/B (VERDICT r15 #5): hoisted per-vector norms
vs inline per-pair norms, for the two keys the r15 adjudication
flagged as slightly slower after the hoist (sim_cosine_topk,
sim_range_search_recall_held), at sf0.1 AND at a 16x-scaled corpus.

Mechanism: the "inline" variant monkeypatches
operators.similarity.cosine_pre to ignore the precomputed norms and
fold them per pair (exactly the pre-r15 expression); the hoisted
norm columns become dead projections the optimizer prunes, so the
physical plan is the old inline-norm plan. Values identical either
way (cosine_pre is a bit-identical refactor), so wall clock is the
only difference. Fresh JVM per (variant, dir) cell.

Usage:
    python scripts/cosine_pre_ab_probe.py --out docs/cosine_pre_ab_r16.json
    python scripts/cosine_pre_ab_probe.py --single KEY --variant inline --sf-dir DIR
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

KEYS = ["sim_cosine_topk", "sim_range_search_recall_held"]


def run_single(key: str, variant: str, sf_dir: str, runs: int) -> None:
    import time

    if variant == "inline":
        import mercurygate_spark.operators.similarity as S

        # per-pair folds, exactly the pre-r15 cosine(); the na/nb
        # arguments (and the projections that feed them) go dead
        S.cosine_pre = lambda a, b, na, nb: S.cosine(a, b)

    from mercurygate_spark.queries import all_queries
    from mercurygate_spark.session import get_spark

    spark = get_spark(app_name=f"cosine_ab_{variant}_{key}")
    q = all_queries()[key]
    q(spark, "/root/testdata/sf0.001").count()  # warmup
    q(spark, sf_dir).count()                    # warmup at target dir
    timed = []
    for _ in range(runs):
        t0 = time.perf_counter()
        n = q(spark, sf_dir).count()
        timed.append(round(time.perf_counter() - t0, 3))
    print(json.dumps({"key": key, "variant": variant, "sf_dir": sf_dir,
                      "rows": n, "runs": timed,
                      "median": round(statistics.median(timed), 3)}))
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--single", default=None)
    ap.add_argument("--variant", default="pre", choices=["pre", "inline"])
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--big-dir", default="/tmp/mg_scale_f16_r14")
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    if args.single:
        run_single(args.single, args.variant, args.sf_dir, args.runs)
        return

    dirs = [args.sf_dir] + ([args.big_dir] if os.path.isdir(args.big_dir) else [])
    cells = []
    for d in dirs:
        for key in KEYS:
            for variant in ("pre", "inline"):
                r = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--single", key,
                     "--variant", variant, "--sf-dir", d,
                     "--runs", str(args.runs)],
                    capture_output=True, text=True, cwd=REPO,
                )
                line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
                try:
                    doc = json.loads(line)
                except ValueError:
                    doc = {"key": key, "variant": variant, "sf_dir": d,
                           "error": r.stderr[-400:]}
                doc["load_avg_1m"] = round(os.getloadavg()[0], 2)
                cells.append(doc)
                print(f"# {d} {key} {variant}: {doc.get('median')}s "
                      f"{doc.get('runs')}", file=sys.stderr)

    # pre/inline ratio per (dir, key)
    verdicts = {}
    for d in dirs:
        for key in KEYS:
            pre = next((c for c in cells if c.get("sf_dir") == d
                        and c["key"] == key and c["variant"] == "pre"), None)
            inl = next((c for c in cells if c.get("sf_dir") == d
                        and c["key"] == key and c["variant"] == "inline"), None)
            if pre and inl and "median" in pre and "median" in inl:
                verdicts[f"{key}@{os.path.basename(d)}"] = {
                    "pre_s": pre["median"], "inline_s": inl["median"],
                    "pre_over_inline": round(pre["median"] / inl["median"], 3),
                }
    out = args.out or os.path.join(REPO, "docs", "cosine_pre_ab_r16.json")
    with open(out, "w") as f:
        json.dump({"cells": cells, "verdicts": verdicts}, f, indent=1)
        f.write("\n")
    print(json.dumps(verdicts))


if __name__ == "__main__":
    main()
