"""Plan-robustness matrix sweep (round-8 advice #4): re-run the FULL
oracle registry under perturbed planner configs to prove no key's
correctness depends on plan shape — the bug class the round-5
streaming regression came from (a result that was only right under
the default shuffle partitioning).

Perturbations (each a separate full sweep in one shared session,
confs restored between passes):
  - aqe_off:     spark.sql.adaptive.enabled=false
  - shuffle_1:   spark.sql.shuffle.partitions=1    (everything in one
                 partition — exposes order-dependent aggregation)
  - shuffle_7:   =7 (prime, != default 32 — exposes partitioning-
                 dependent results)
  - shuffle_200: =200 (over-partitioned — exposes empty-partition
                 handling)
  - bcast_off:   spark.sql.autoBroadcastJoinThreshold=-1 (every
                 broadcast join becomes a shuffle join)

Usage:
    python scripts/sweep_planmatrix.py --out docs/sweep_r08_planmatrix.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MATRIX = {
    "aqe_off": {"spark.sql.adaptive.enabled": "false"},
    "shuffle_1": {"spark.sql.shuffle.partitions": "1"},
    "shuffle_7": {"spark.sql.shuffle.partitions": "7"},
    "shuffle_200": {"spark.sql.shuffle.partitions": "200"},
    "bcast_off": {"spark.sql.autoBroadcastJoinThreshold": "-1"},
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=None)
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--configs", default=",".join(MATRIX))
    ap.add_argument("--keys", default=None, help="comma-separated key subset")
    args = ap.parse_args()

    from mercurygate_spark.queries import all_oracles, all_queries
    from mercurygate_spark.session import get_spark
    from tests.oracle_harness import compare

    spark = get_spark(app_name="mercurygate_planmatrix", cpus=args.cpus)
    queries, oracles = all_queries(), all_oracles()
    if args.keys:
        subset = set(args.keys.split(","))
        queries = {k: v for k, v in queries.items() if k in subset}
    t_all = time.time()
    passes: dict[str, dict] = {}
    total_fail = 0
    for cfg_name in args.configs.split(","):
        overrides = MATRIX[cfg_name]
        saved = {k: spark.conf.get(k, None) for k in overrides}
        results: dict[str, dict] = {}
        n_fail = 0
        t_cfg = time.time()
        try:
            for k, v in overrides.items():
                spark.conf.set(k, v)
            for name in sorted(queries):
                t0 = time.time()
                try:
                    if name in oracles:
                        ok, msg = compare(
                            spark, args.sf_dir, name, queries[name], oracles[name]
                        )
                    else:
                        rows = queries[name](spark, args.sf_dir).count()
                        ok, msg = rows >= 0, f"rows-only ({rows} rows)"
                except Exception as e:  # noqa: BLE001 — sweep records, never dies
                    ok, msg = False, f"{type(e).__name__}: {e}"[:500]
                rec: dict = {"ok": bool(ok), "seconds": round(time.time() - t0, 3)}
                if not ok:
                    rec["msg"] = msg
                    n_fail += 1
                    print(f"# FAIL [{cfg_name}] {name}: {msg}", file=sys.stderr)
                results[name] = rec
        finally:
            for k, v in saved.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)
        total_fail += n_fail
        passes[cfg_name] = {
            "overrides": overrides,
            "n_ok": len(queries) - n_fail,
            "n_fail": n_fail,
            "seconds": round(time.time() - t_cfg, 1),
            "keys": results,
        }
        print(
            f"# [{cfg_name}] {len(queries) - n_fail}/{len(queries)} ok "
            f"in {passes[cfg_name]['seconds']}s",
            file=sys.stderr,
        )

    out = {
        "sf_dir": args.sf_dir,
        "n_keys": len(queries),
        "n_configs": len(passes),
        "n_fail_total": total_fail,
        "total_seconds": round(time.time() - t_all, 1),
        "configs": passes,
    }
    text = json.dumps(out, indent=2)
    if args.out:
        with open(os.path.join(REPO, args.out), "w") as f:
            f.write(text + "\n")
        print(
            f"# wrote {args.out}: {total_fail} total failures across "
            f"{len(passes)} configs",
            file=sys.stderr,
        )
    else:
        print(text)
    spark.stop()


if __name__ == "__main__":
    main()
