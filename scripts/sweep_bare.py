"""Full-registry oracle sweep through a BARE SparkSession — no engine
conf at all, exactly the driver's session contract. Catches any key
that silently depends on get_spark()'s conf (e.g. a conf key that is
not runtime-settable and must instead be handled inside load_tables).

Usage:
    python scripts/sweep_bare.py [--sf-dir DIR] [--out FILE] [--only a,b]
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
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=None)
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from mercurygate_spark.queries import all_oracles, all_queries
    from tests.oracle_harness import compare

    spark = SparkSession.builder.master("local[8]").getOrCreate()
    queries, oracles = all_queries(), all_oracles()
    if args.only:
        pats = [p.strip() for p in args.only.split(",") if p.strip()]
        queries = {
            n: f
            for n, f in queries.items()
            if any(n == p or n.startswith(p) for p in pats)
        }
    results: dict[str, dict] = {}
    fails = []
    t0 = time.time()
    for name in sorted(queries):
        t = time.time()
        try:
            ok, msg = compare(spark, args.sf_dir, name, queries[name], oracles.get(name))
        except Exception as exc:  # noqa: BLE001 — record, keep sweeping
            ok, msg = False, f"EXC {type(exc).__name__}: {exc}"
        results[name] = {
            "ok": bool(ok),
            "msg": str(msg)[:200],
            "seconds": round(time.time() - t, 2),
        }
        if not ok:
            fails.append(name)
            print(f"# FAIL {name}: {msg}", file=sys.stderr, flush=True)
    out = {
        "n_keys": len(results),
        "n_fail": len(fails),
        "fails": fails,
        "total_seconds": round(time.time() - t0, 1),
        "sf_dir": args.sf_dir,
        "session": (
            "bare SparkSession.builder.master(local[8]).getOrCreate() - "
            "no engine conf (driver contract)"
        ),
        "keys": results,
    }
    text = json.dumps(out, indent=2)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text)
        print(
            f"# wrote {args.out}: {len(results) - len(fails)}/{len(results)} ok "
            f"in {out['total_seconds']}s",
            file=sys.stderr,
        )
    else:
        print(text)


if __name__ == "__main__":
    main()
