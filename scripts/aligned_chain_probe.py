"""Occupancy-ALIGNED scale chain for the count-dialed ANN keys
(VERDICT r13 next #2): the factor-10 probes carry dial-phase cost
(occupancy and the T/k ceilings sit at different points of their 2×
bands at 2k vs 20k), so the N^rho cost claims need steps measured at
the SAME phase. This probe extends the r13 single factor-4 point
(2k → 8k) one more aligned step and adds the me_scaled key:

WALL chain (keys run end-to-end, best-of-2 after warmup):
  2,000 → 8,000 → 32,000 corpus vectors — each 4×, each at plane-dial
  occupancy 0.977 (np 6 → 8 → 10), so the only cost driver left in the
  radius keys is the recall-held T ratio (T 3 → 3 → 4: expect ≤~1.05×
  then ≤~1.5× over linear). For sim_ivf_graph_me_scaled the first step
  is list-occupancy aligned too (62.5 rows/list at k 32 → 128); at
  32k the IVF ceiling (k=2^IVF_MAX_LOG2K=256) BINDS and occupancy
  doubles to 125 — that step measures the dial ceiling, reported
  as such (production raises IVF_MAX_LOG2K with the fleet's memory
  budget; the testdata constant keeps oracle CASE chains small).

RECALL chain (numpy replay of lsh_bucket_multi, planted pairs —
  the range_recall_held_probe methodology): base sizes 2,000 → 8,000 →
  32,700 (+200 planted twins each → 2,200 / 8,200 / 32,900), chosen so
  the POST-plant counts all sit at occupancy ~0.5 of the np band
  (np 7 → 9 → 11, T 3 → 4 → 5). Matrices are built by the exact
  build_scaled_dir embedding rule (cyclic rotation per copy) in numpy,
  so no 17× parquet dir is needed for the recall leg.

Pass: recall-held ≥ RH_TARGET − 0.10 at every size; candidate-pair
cost ≤ 1.5× over linear per aligned step; radius-key wall ≤ ~1.5× per
step (noise fences apply); me_scaled wall ≤ ~1.5× at the aligned step.

Run: python scripts/aligned_chain_probe.py [--skip-build] [--out PATH]
Output: markdown tables + docs/aligned_chain_r15.json (default)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
F4_DIR = "/tmp/mg_scale_f4_r14"
F16_DIR = "/tmp/mg_scale_f16_r14"
WALL_KEYS = [
    "sim_range_search_recall_held",
    "sim_range_search_multi_scaled",
    "sim_ivf_graph_me_scaled",
    "sim_ivf_graph_np_scaled",
    "sim_ivf_graph_adp_scaled",
]
# wall noise fence per aligned step (the docstring's "≤ ~1.5× per
# step"): each step is 4× rows, sub-linear cost means over-linear
# ratio < 1; 1.5 leaves headroom for JVM/host noise on 2-6 s keys.
WALL_FENCE = 1.5
RECALL_BASE = [2000, 8000, 32700]
RNG_SEED = 14


def rotated_matrix(v: np.ndarray, n_target: int) -> np.ndarray:
    """Replicate build_scaled_dir's embedding scaling in numpy: copy i
    is the base matrix cyclically rotated by i (within-copy cosine
    structure exact, cross-copy decorrelated); the last copy is
    truncated to hit n_target."""
    n, dim = v.shape
    copies = []
    need = n_target
    i = 0
    while need > 0:
        c = np.roll(v, -(i % dim), axis=1) if i % dim else v
        take = min(n, need)
        copies.append(c[:take])
        need -= take
        i += 1
    return np.vstack(copies)


def recall_leg(base_v: np.ndarray) -> list[dict]:
    from mercurygate_spark.operators.similarity import (
        OCC_TARGET,
        scaled_n_planes,
        tables_for_recall,
    )
    from scripts.range_recall_held_probe import (
        M_PLANT,
        buckets,
        candidate_cost,
        pair_recall,
        plant_pairs,
    )

    rng = np.random.default_rng(RNG_SEED)
    rows = []
    for base_n in RECALL_BASE:
        v = rotated_matrix(base_v, base_n)
        aug, pairs = plant_pairs(v, M_PLANT, rng)
        n = aug.shape[0]
        np_ = scaled_n_planes(n)
        t = tables_for_recall(np_)
        bks = buckets(aug, np_, t)
        rows.append(
            {
                "n": n,
                "np": np_,
                "occ_phase": round(n / (OCC_TARGET * (1 << np_)), 3),
                "t_held": t,
                "held_recall": round(pair_recall(bks, pairs), 3),
                "cand_pairs": candidate_cost(bks),
            }
        )
    return rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-build", action="store_true")
    ap.add_argument("--skip-wall", action="store_true")
    ap.add_argument("--out", default="docs/aligned_chain_r15.json")
    args = ap.parse_args()

    import duckdb

    path = f"{SF_DIR}/embeddings.parquet"
    if os.path.isdir(path):
        path = f"{path}/*.parquet"
    base_v = np.array(
        [
            r[0]
            for r in duckdb.sql(
                f"SELECT embedding FROM '{path}' ORDER BY vec_id"
            ).fetchall()
        ],
        dtype=np.float64,
    )

    out: dict = {"recall_chain": recall_leg(base_v)}
    print("| n | np | occ phase | T | held recall | cand pairs | step /linear |")
    print("|---|---|---|---|---|---|---|")
    prev = None
    steps = []
    for r in out["recall_chain"]:
        ol = None
        if prev:
            ol = round((r["cand_pairs"] / prev["cand_pairs"]) / (r["n"] / prev["n"]), 3)
            steps.append(ol)
        print(
            f"| {r['n']} | {r['np']} | {r['occ_phase']} | {r['t_held']} "
            f"| {r['held_recall']} | {r['cand_pairs']} | {ol or '-'} |"
        )
        prev = r
    out["pairs_over_linear_per_step"] = steps

    if not args.skip_wall:
        from mercurygate_spark.queries import all_queries
        from mercurygate_spark.session import get_spark
        from scripts.scale_probe import build_scaled_dir, time_key

        spark = get_spark("aligned-chain-probe")
        if not args.skip_build:
            build_scaled_dir(spark, SF_DIR, F4_DIR, 4)
            build_scaled_dir(spark, SF_DIR, F16_DIR, 16)
        reg = all_queries()
        dirs = [(2000, SF_DIR), (8000, F4_DIR), (32000, F16_DIR)]
        wall: dict = {}
        for key in WALL_KEYS:
            for _, d in dirs:  # warmup pass
                reg[key](spark, d).write.format("noop").mode("overwrite").save()
            ts = [(n, round(time_key(spark, reg[key], d), 2)) for n, d in dirs]
            ratios = [
                round((ts[i + 1][1] / ts[i][1]) / (ts[i + 1][0] / ts[i][0]), 2)
                for i in range(len(ts) - 1)
            ]
            wall[key] = {"wall_s": ts, "over_linear_per_step": ratios}
            print(f"{key}: {ts}  over-linear/step {ratios}")
        out["wall_chain"] = wall

    from mercurygate_spark.operators.similarity import RH_TARGET

    rec_ok = all(
        r["held_recall"] >= RH_TARGET - 0.10 for r in out["recall_chain"]
    )
    cost_ok = all(s <= 1.5 for s in steps)
    out["band"] = [round(RH_TARGET - 0.10, 3), 1.0]
    out["pass_recall_band"] = bool(rec_ok)
    out["pass_aligned_cost"] = bool(cost_ok)
    if "wall_chain" in out:
        # the docstring's wall criterion, folded into the verdict so a
        # wall regression cannot emit a passing-looking artifact
        out["wall_fence"] = WALL_FENCE
        out["pass_wall"] = bool(
            all(
                s <= WALL_FENCE
                for w in out["wall_chain"].values()
                for s in w["over_linear_per_step"]
            )
        )
    with open(args.out, "w") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
