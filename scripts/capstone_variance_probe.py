"""Capstone variance attribution (VERDICT r15 #4): N fresh-JVM runs of
pipeline_llm_corpus_e2e with the per-stage trace enabled, so the
20-60 s fresh-JVM spread the r15 close-out measured can be attributed
to a STAGE (funnel? the training-overlap block? BPE?) instead of
hand-waved. Each child run prints one JSON line with the stage trace
plus GC time deltas from the JVM's GarbageCollectorMXBeans.

Usage:
    python scripts/capstone_variance_probe.py --runs 9 --out docs/capstone_variance_r16.json
    python scripts/capstone_variance_probe.py --single   # child entry
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

KEY = "pipeline_llm_corpus_e2e"


def _gc_ms(spark) -> int:
    """Total GC milliseconds across the driver JVM's collectors."""
    jvm = spark._jvm  # noqa: SLF001
    beans = jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
    total = 0
    it = beans.iterator()
    while it.hasNext():
        total += it.next().getCollectionTime()
    return int(total)


def run_single(sf_dir: str) -> None:
    import time

    from mercurygate_spark.queries import all_queries, corpus
    from mercurygate_spark.session import get_spark

    spark = get_spark(app_name="capstone_variance")
    q = all_queries()[KEY]
    q(spark, "/root/testdata/sf0.001").count()  # warmup: codegen/classload
    corpus._LLM_E2E_STAGE_TRACE = trace = {}
    gc0 = _gc_ms(spark)
    t0 = time.perf_counter()
    n = q(spark, sf_dir).count()
    wall = round(time.perf_counter() - t0, 2)
    gc1 = _gc_ms(spark)
    print(json.dumps({
        "wall_s": wall, "rows": n, "trace": trace,
        "gc_ms_during": gc1 - gc0,
    }))
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=9)
    ap.add_argument("--out", default=None)
    ap.add_argument("--single", action="store_true")
    args = ap.parse_args()

    if args.single:
        run_single(args.sf_dir)
        return

    runs = []
    for i in range(args.runs):
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--single",
             "--sf-dir", args.sf_dir],
            capture_output=True, text=True, cwd=REPO,
        )
        line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
        try:
            doc = json.loads(line)
        except ValueError:
            doc = {"error": r.stderr[-500:]}
        doc["load_avg_1m"] = round(os.getloadavg()[0], 2)
        runs.append(doc)
        print(f"# run {i}: {doc.get('wall_s')}s trace={doc.get('trace')} "
              f"gc={doc.get('gc_ms_during')}ms load={doc['load_avg_1m']}",
              file=sys.stderr)

    walls = [r["wall_s"] for r in runs if "wall_s" in r]
    summary = {
        "key": KEY,
        "sf_dir": args.sf_dir,
        "n_runs": len(walls),
        "median": round(statistics.median(walls), 2) if walls else None,
        "iqr": round(
            statistics.quantiles(walls, n=4)[2]
            - statistics.quantiles(walls, n=4)[0], 2
        ) if len(walls) >= 4 else None,
        "min": min(walls) if walls else None,
        "max": max(walls) if walls else None,
        "runs": runs,
    }
    out = args.out or os.path.join(REPO, "docs", "capstone_variance_r16.json")
    with open(out, "w") as f:
        json.dump(summary, f, indent=1)
        f.write("\n")
    print(json.dumps({k: v for k, v in summary.items() if k != "runs"}))


if __name__ == "__main__":
    main()
