"""Full-registry oracle sweep → machine-readable artifact (VERDICT r6 #3).

The driver samples ~50 keys per round; this script runs the SAME
comparison (tests/oracle_harness.compare, a replica of the driver's
sort-columns/sort-rows/exact-value gate) over EVERY registered key and
writes one JSON artifact: per-key {ok, rows, seconds, msg-on-fail}.
Committed per round as SWEEP_r{N}.json so the full-coverage claim is
auditable without re-running anything.

Usage:
    python scripts/sweep.py --out docs/sweeps/SWEEP_r14.json  # sf0.01, driver SF
    python scripts/sweep.py --sf-dir /root/testdata/sf0.001   # fast probe
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
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--progress", action="store_true",
                    help="print a per-key ok line (long big-SF sweeps)")
    ap.add_argument("--only", default=None,
                    help="comma-separated key list/prefixes to restrict to")
    args = ap.parse_args()

    from mercurygate_spark.queries import all_oracles, all_queries
    from mercurygate_spark.session import get_spark
    from tests.oracle_harness import compare

    spark = get_spark(app_name="mercurygate_sweep", cpus=args.cpus)
    queries, oracles = all_queries(), all_oracles()
    results: dict[str, dict] = {}
    n_fail = 0
    t_all = time.time()
    if args.only:
        pats = [p.strip() for p in args.only.split(",") if p.strip()]
        queries = {
            n: f for n, f in queries.items()
            if any(n == p or n.startswith(p) for p in pats)
        }
    for name in sorted(queries):
        t0 = time.time()
        try:
            if name in oracles:
                ok, msg = compare(spark, args.sf_dir, name, queries[name], oracles[name])
                rows = int(msg.split("(")[1].split(" ")[0]) if ok else None
            else:  # rows-only check, mirroring the driver's weaker gate
                rows = queries[name](spark, args.sf_dir).count()
                ok, msg = rows >= 0, f"rows-only ({rows} rows)"
        except Exception as e:  # noqa: BLE001 — sweep must record, not die
            ok, msg, rows = False, f"{type(e).__name__}: {e}"[:500], None
        rec = {"ok": bool(ok), "rows": rows, "seconds": round(time.time() - t0, 3),
               "oracle": name in oracles}
        if not ok:
            rec["msg"] = msg
            n_fail += 1
            print(f"# FAIL {name}: {msg}", file=sys.stderr)
        elif args.progress:
            print(f"# ok {name} {rec['seconds']}s", file=sys.stderr, flush=True)
        results[name] = rec
        # partial flush so a killed/timed-out sweep still leaves an
        # auditable artifact (big-SF sweeps can run for an hour+)
        if args.out and len(results) % 10 == 0:
            partial = {"sf_dir": args.sf_dir, "partial": True,
                       "n_done": len(results), "n_keys": len(queries),
                       "n_fail": n_fail, "keys": results}
            with open(os.path.join(REPO, args.out) + ".partial", "w") as f:
                json.dump(partial, f, indent=2)

    out = {
        "sf_dir": args.sf_dir,
        "n_keys": len(queries),
        "n_ok": len(queries) - n_fail,
        "n_fail": n_fail,
        "total_seconds": round(time.time() - t_all, 1),
        "keys": results,
    }
    text = json.dumps(out, indent=2)
    if args.out:
        with open(os.path.join(REPO, args.out), "w") as f:
            f.write(text + "\n")
        print(f"# wrote {args.out}: {out['n_ok']}/{out['n_keys']} ok "
              f"in {out['total_seconds']}s", file=sys.stderr)
    else:
        print(text)
    spark.stop()


if __name__ == "__main__":
    main()
