"""Stage attribution for stream_classifier_gate_recal's factor-10
wall ratio (VERDICT r14 #5): the key probes 1.4x at 10x data — the
only r14 ratio outside the 0.8-1.2x family without a written cause.
This probe times the key's four phases (offline train+calibrate,
shard staging writes, stream drain, read-back) at sf0.1 and at the
10x structure-preserving dir, twice each (steady state = 2nd run),
so the extra 0.2-0.6x attributes to a named stage instead of a guess.

Run: python scripts/recal_stage_probe.py [--big-dir /tmp/mg_scale_r13]
Output: one JSON line + docs/recal_stage_probe_r15.json
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--big-dir", default="/tmp/mg_scale_r13")
    ap.add_argument("--out", default="docs/recal_stage_probe_r15.json")
    args = ap.parse_args()

    from mercurygate_spark.queries import streaming_queries as SQ
    from mercurygate_spark.session import get_spark

    spark = get_spark("recal-stage-probe")
    out: dict = {"note": (
        "per-stage wall seconds for stream_classifier_gate_recal at 1x "
        "and 10x; run2 is the steady-state number (run1 carries JIT/"
        "classloading)"), "dirs": {}}
    for tag, d in (("1x", args.sf_dir), ("10x", args.big_dir)):
        runs = []
        for _ in range(2):
            trace: dict = {}
            SQ._RECAL_STAGE_TRACE = trace
            t0 = time.monotonic()
            n = SQ.stream_classifier_gate_recal(spark, d).count()
            trace["total_s"] = round(time.monotonic() - t0, 2)
            trace["rows"] = n
            SQ._RECAL_STAGE_TRACE = None
            runs.append(trace)
            print(f"# {tag} {d}: {trace}", file=sys.stderr)
        out["dirs"][tag] = {"dir": d, "runs": runs, "steady": runs[-1]}

    s1, s10 = out["dirs"]["1x"]["steady"], out["dirs"]["10x"]["steady"]
    out["stage_ratios_10x_over_1x"] = {
        k: round(s10[k] / s1[k], 2) if s1[k] else None
        for k in ("offline_train_calibrate_s", "stage_shards_s",
                  "stream_drain_s", "read_back_s", "total_s")
    }
    with open(args.out, "w") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
