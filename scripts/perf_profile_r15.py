"""Round-15 optimization profiler: per headline key, measure wall
seconds AND the number of Spark jobs the key launches (via job-group
id tracking). At sf0.1 the testdata is small enough that per-job fixed
overhead (scheduling, Python worker round-trips, checkpoint
materializations) dominates the heavy keys, so jobs-per-key is the
primary signal for where sequential-pass reduction pays — locally AND
at 100 TB, where every extra job is an extra full pass over the data.

Usage:
    python scripts/perf_profile_r15.py --out docs/perf_profile_r15.json
    python scripts/perf_profile_r15.py --only pipeline_llm_corpus_e2e,text_bpe_train
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=None)
    ap.add_argument("--only", default=None)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    from bench import HEADLINE
    from mercurygate_spark.queries import all_queries
    from mercurygate_spark.session import get_spark

    spark = get_spark(app_name="perf_profile_r15", cpus=args.cpus)
    sc = spark.sparkContext
    queries = all_queries()
    names = [n for n in HEADLINE if n in queries]
    if args.only:
        pats = [p.strip() for p in args.only.split(",") if p.strip()]
        names = [n for n in names if any(n == p or n.startswith(p) for p in pats)]

    # warmup at the smallest SF (same as bench.py)
    for name in names:
        try:
            queries[name](spark, "/root/testdata/sf0.001").count()
        except Exception:
            pass

    results: dict[str, dict] = {}
    for name in names:
        best_wall, best_jobs = None, None
        for _ in range(args.runs):
            group = f"profile_{name}_{time.monotonic_ns()}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            n_rows = queries[name](spark, args.sf_dir).count()
            wall = time.perf_counter() - t0
            sc.setJobGroup(None, None)
            jobs = sc.statusTracker().getJobIdsForGroup(group)
            if best_wall is None or wall < best_wall:
                best_wall, best_jobs = wall, len(jobs)
        results[name] = {
            "wall_s": round(best_wall, 3),
            "n_jobs": best_jobs,
            "rows": n_rows,
        }
        print(
            f"# {name}: {best_wall:.3f}s  jobs={best_jobs}  rows={n_rows}",
            file=sys.stderr,
        )

    doc = {
        "sf_dir": args.sf_dir,
        "cpus": args.cpus,
        "runs": args.runs,
        "load_avg_1m": round(os.getloadavg()[0], 2),
        "total_wall_s": round(sum(r["wall_s"] for r in results.values()), 3),
        "total_jobs": sum(r["n_jobs"] for r in results.values()),
        "keys": results,
    }
    out = args.out or "docs/perf_profile_r15.json"
    with open(os.path.join(REPO, out) if not os.path.isabs(out) else out, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    print(json.dumps({k: v["wall_s"] for k, v in results.items()}))


if __name__ == "__main__":
    main()
