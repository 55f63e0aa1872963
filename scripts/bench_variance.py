"""Variance-aware benchmark for the heavy keys (round-7 verdict item 1).

The per-round bench (bench.py) runs all headline queries in ONE JVM,
best-of-3. That design rejects transient stalls but cannot distinguish a
real +7-11 % regression from run-to-run spread, and cross-key cache /
GC interference inside the shared JVM adds correlated noise. This
script answers the question properly:

  - FRESH JVM PER KEY: each key runs in its own subprocess
    (spark.stop() + JVM exit between keys), so no key inherits another's
    code cache, broadcast blocks, or GC debt.
  - >= 7 timed runs per key (default 9) after 2 warmup runs (one at
    sf0.001 for classload/codegen, one at the target SF for page cache).
  - Reports median +- IQR, and compares the median against the
    recorded best-of-3 numbers in BENCH_r05.json / BENCH_r06.json:
    a prior round's value inside [q1 - 1.5*IQR, q3 + 1.5*IQR] of
    today's distribution is NOISE; outside is a real change.

Usage:
    python scripts/bench_variance.py                # 5 heavy keys, sf0.1
    python scripts/bench_variance.py --runs 9 --out docs/bench_variance_r07.json
    python scripts/bench_variance.py --single KEY   # internal: one JVM
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

HEAVY = [
    "sim_cosine_topk",
    "pipeline_corpus_mixture",
    "sim_cosine_ivf_sampled",
    "dedup_connected_components",
    "pipeline_corpus_curate",
]


def run_single(key: str, sf_dir: str, runs: int) -> None:
    """Child-process entry: one fresh JVM, warmup, N timed runs."""
    import time

    from mercurygate_spark.queries import all_queries
    from mercurygate_spark.session import get_spark

    spark = get_spark(app_name=f"bench_variance_{key}")
    q = all_queries()[key]
    q(spark, "/root/testdata/sf0.001").count()  # warmup 1: codegen/classload
    q(spark, sf_dir).count()                     # warmup 2: target-SF page cache
    timed = []
    for _ in range(runs):
        t0 = time.perf_counter()
        n = q(spark, sf_dir).count()
        timed.append(round(time.perf_counter() - t0, 3))
    print(json.dumps({"key": key, "runs": timed, "rows": n}))
    spark.stop()


def summarize(timed: list[float]) -> dict:
    qs = statistics.quantiles(timed, n=4, method="inclusive")
    q1, med, q3 = qs[0], qs[1], qs[2]
    iqr = q3 - q1
    return {
        "median": round(med, 3),
        "q1": round(q1, 3),
        "q3": round(q3, 3),
        "iqr": round(iqr, 3),
        "lo_fence": round(q1 - 1.5 * iqr, 3),
        "hi_fence": round(q3 + 1.5 * iqr, 3),
        "min": min(timed),
        "max": max(timed),
        "n": len(timed),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--single", help="internal: run one key in this JVM")
    ap.add_argument("--runs", type=int, default=9)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--keys", nargs="*", default=HEAVY)
    ap.add_argument("--out", default=None)
    ap.add_argument(
        "--prior", nargs="*", default=["r05", "r06"],
        help="BENCH_r*.json rounds to judge against today's fences",
    )
    args = ap.parse_args()

    if args.single:
        run_single(args.single, args.sf_dir, args.runs)
        return

    def _extract_obj(text: str, key: str) -> dict | None:
        """Pull the balanced {...} following '"key": ' out of a
        possibly-truncated-at-the-front JSON tail."""
        marker = f'"{key}": {{'
        i = text.find(marker)
        if i == -1:
            return None
        start = i + len(marker) - 1
        depth, j = 0, start
        while j < len(text):
            if text[j] == "{":
                depth += 1
            elif text[j] == "}":
                depth -= 1
                if depth == 0:
                    try:
                        return json.loads(text[start : j + 1])
                    except ValueError:
                        return None
            j += 1
        return None

    prior = {}
    for r in args.prior:
        path = os.path.join(REPO, f"BENCH_{r}.json")
        if os.path.exists(path):
            with open(path) as f:
                doc = json.load(f)
            # driver-recorded BENCH files wrap bench.py's line in
            # "parsed"; when that is null the line is still in "tail"
            # (often truncated at the FRONT, so whole-line json.loads
            # can fail — extract the balanced per-key objects instead)
            inner = doc.get("parsed") if isinstance(doc.get("parsed"), dict) else None
            if inner is None and isinstance(doc.get("tail"), str):
                tail = doc["tail"]
                inner = {
                    k: v
                    for k, v in (
                        ("query_medians", _extract_obj(tail, "query_medians")),
                        ("queries", _extract_obj(tail, "queries")),
                    )
                    if v is not None
                }
            inner = inner or doc
            # r11+: the full per-round doc (incl. medians) is committed
            # as docs/bench_{r}_local.json because the driver's 2000-char
            # tail capture truncates the long line; prefer it when the
            # BENCH file itself carries no medians
            local = os.path.join(REPO, "docs", f"bench_{r}_local.json")
            if not (inner.get("query_medians") or inner.get("queries")) or (
                "query_medians" not in inner and os.path.exists(local)
            ):
                if os.path.exists(local):
                    with open(local) as f:
                        inner = json.load(f)
            # medians are the round's stable number; best-of-3 "queries"
            # is the fallback for rounds that predate medians
            prior[r] = inner.get("query_medians") or inner.get("queries", {})
            if not prior[r]:
                # ADVICE r10: a silently skipped prior reads as "no prior
                # recorded" — make the drop loud
                print(
                    f"WARNING: BENCH_{r}.json present but neither "
                    "query_medians nor queries could be extracted "
                    "(parsed null + unrecoverable tail, no local doc); "
                    f"round {r} is EXCLUDED from fence judging",
                    file=sys.stderr,
                )

    results = {}
    for key in args.keys:
        print(f"# {key}: fresh JVM, {args.runs} timed runs ...", file=sys.stderr)
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--single", key,
             "--runs", str(args.runs), "--sf-dir", args.sf_dir],
            capture_output=True, text=True, cwd=REPO,
        )
        if proc.returncode != 0:
            print(proc.stderr[-2000:], file=sys.stderr)
            raise SystemExit(f"child failed for {key}")
        payload = json.loads(proc.stdout.strip().splitlines()[-1])
        s = summarize(payload["runs"])
        s["runs"] = payload["runs"]
        s["rows"] = payload["rows"]
        for r, queries in prior.items():
            if key in queries:
                v = queries[key]
                s[f"{r}_recorded"] = v
                s[f"{r}_within_fence"] = bool(s["lo_fence"] <= v <= s["hi_fence"])
        results[key] = s
        print(f"#   median {s['median']}s  IQR [{s['q1']}, {s['q3']}]  "
              f"fence [{s['lo_fence']}, {s['hi_fence']}]", file=sys.stderr)

    out = {
        "sf_dir": args.sf_dir,
        "runs_per_key": args.runs,
        "isolation": "fresh JVM per key (subprocess)",
        "load_avg_1m": round(os.getloadavg()[0], 2),
        "keys": results,
    }
    text = json.dumps(out, indent=2)
    if args.out:
        with open(os.path.join(REPO, args.out), "w") as f:
            f.write(text + "\n")
        print(f"# wrote {args.out}", file=sys.stderr)
    print(text)


if __name__ == "__main__":
    main()
