"""Memory-pressure probe (round-8 advice #5): run the three heaviest
corpus keys at 100x data under a CONSTRAINED heap so shuffle/agg spill
actually occurs, and prove graceful degradation — spill > 0, no OOM,
and results bit-identical to a fat-heap run of the same keys.

The round-7 100x probes ran fat (128 GiB, local[32]); they proved the
plans are asymptotically linear but not that they survive memory
pressure. Here the whole JVM gets --mem (default 1600m) with
spark.memory.fraction --fraction (default 0.2), i.e. ~
mem x fraction execution+storage for 8 threads — far below the 100x
corpus working set, so Spark's UnsafeExternalSorter / aggregation maps
must spill to disk. Spill totals come from the status REST API.

Protocol (one parent, two worker subprocesses — Spark driver memory is
a JVM-start conf, so each memory level needs its own process):
  1. parent builds the 100x corpus (scale_probe.build_scaled_dir —
     structure-preserving: shifted keys, rotated text);
  2. worker[tight] runs the keys with the constrained heap, records
     per-key wall-clock, result checksum (order-independent xxhash64
     sum), and spill bytes;
  3. worker[fat] runs identically at 8g;
  4. parent asserts checksums equal and tight-run spill > 0, writes
     one JSON artifact.

Usage:
    python scripts/memory_probe.py [--factor 100] [--mem 1600m]
        [--out docs/memory_probe_r08.json]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

KEYS = ["dedup_minhash_lsh", "dedup_connected_components", "pipeline_corpus_curate"]
# second wave (round-8 close): the merge/index/training paths
KEYS_B = ["pipeline_medallion_e2e", "dedup_incremental_index", "text_bpe_train"]
# third wave (round 9): the composed ANN, index-compaction, and
# unigram-trainer paths added this round
KEYS_C = ["sim_ivfpq_topk", "dedup_index_compact", "text_unigram_train"]
SCALED_DIR = "/tmp/mercurygate_memory_probe_data"


def _spill_totals(ui_port: int) -> dict[str, int]:
    base = f"http://localhost:{ui_port}/api/v1"
    apps = json.load(urllib.request.urlopen(f"{base}/applications", timeout=10))
    app_id = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(f"{base}/applications/{app_id}/stages", timeout=10)
    )
    return {
        "memory_spilled_bytes": sum(s.get("memoryBytesSpilled", 0) for s in stages),
        "disk_spilled_bytes": sum(s.get("diskBytesSpilled", 0) for s in stages),
        "n_stages": len(stages),
    }


def _checksum(df) -> dict[str, int]:
    from pyspark.sql import functions as F

    row = (
        df.select(
            F.xxhash64(F.to_json(F.struct(*sorted(df.columns)))).alias("h")
        )
        # bit_xor: order-independent fold with no ANSI long overflow
        .agg(F.count("*").alias("n"), F.expr("bit_xor(h)").alias("s"))
        .collect()[0]
    )
    return {"rows": int(row["n"]), "hash_sum": int(row["s"] or 0)}


def worker(args: argparse.Namespace) -> None:
    from mercurygate_spark.queries import all_queries
    from mercurygate_spark.session import get_spark

    spark = get_spark(
        app_name=f"memory_probe_{args.label}",
        cpus=args.cpus,
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": str(args.ui_port),
            "spark.memory.fraction": str(args.fraction),
        },
    )
    queries = all_queries()
    out: dict[str, dict] = {}
    wave_keys = {"a": KEYS, "b": KEYS_B, "c": KEYS_C}[args.wave]
    for name in wave_keys:
        t0 = time.time()
        res = queries[name](spark, SCALED_DIR)
        chk = _checksum(res)
        out[name] = {**chk, "seconds": round(time.time() - t0, 1)}
        print(f"# [{args.label}] {name}: {out[name]}", file=sys.stderr)
    spill = _spill_totals(args.ui_port)
    print(json.dumps({"label": args.label, "keys": out, "spill": spill}))
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=100)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--mem", default="1600m")
    ap.add_argument("--fraction", type=float, default=0.2)
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--out", default=None)
    ap.add_argument("--skip-build", action="store_true")
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--wave", choices=["a", "b", "c"], default="a")
    ap.add_argument("--label", default="tight")
    ap.add_argument("--ui-port", type=int, default=4058)
    args = ap.parse_args()

    if args.worker:
        worker(args)
        return

    repo = str(Path(__file__).resolve().parent.parent)
    if not args.skip_build:
        from mercurygate_spark.session import get_spark
        from scripts.scale_probe import build_scaled_dir

        spark = get_spark(app_name="memory_probe_build", cpus=args.cpus)
        build_scaled_dir(spark, args.sf_dir, SCALED_DIR, args.factor)
        spark.stop()

    def run(label: str, mem: str, fraction: float, port: int) -> dict:
        env = dict(os.environ, SPARK_GRAFT_DRIVER_MEM=mem)
        cmd = [
            sys.executable, __file__, "--worker", "--label", label,
            "--fraction", str(fraction), "--cpus", str(args.cpus),
            "--ui-port", str(port), "--wave", args.wave,
        ]
        p = subprocess.run(
            cmd, env=env, cwd=repo, capture_output=True, text=True, timeout=7200
        )
        sys.stderr.write(p.stderr)
        if p.returncode != 0:
            return {"label": label, "error": p.stderr[-2000:]}
        return json.loads(p.stdout.strip().splitlines()[-1])

    tight = run("tight", args.mem, args.fraction, args.ui_port)
    fat = run("fat", "8g", 0.6, args.ui_port + 1)

    ok_match = (
        "error" not in tight
        and "error" not in fat
        and all(tight["keys"][k]["hash_sum"] == fat["keys"][k]["hash_sum"]
                and tight["keys"][k]["rows"] == fat["keys"][k]["rows"]
                for k in {"a": KEYS, "b": KEYS_B, "c": KEYS_C}[args.wave])
    )
    artifact = {
        "factor": args.factor,
        "base_sf_dir": args.sf_dir,
        "tight_mem": args.mem,
        "tight_fraction": args.fraction,
        "cpus": args.cpus,
        "results_identical": ok_match,
        "tight": tight,
        "fat": fat,
    }
    text = json.dumps(artifact, indent=2)
    if args.out:
        with open(os.path.join(repo, args.out), "w") as f:
            f.write(text + "\n")
        print(f"# wrote {args.out}; identical={ok_match}", file=sys.stderr)
    print(text)


if __name__ == "__main__":
    main()
