"""Recall-HELD radius search evidence (VERDICT r12 next #2): the
occupancy dial alone holds cost but lets recall decay as the corpus
grows (docs/range_recall_r12.json: 0.054 → 0.007 at 10× for τ=0.3).
sim_range_search_recall_held inverts the validated collision model —
n_tables = tables_for_recall(scaled_n_planes(N)) — so a NEAR-DUPLICATE
pair (cosine ≥ RH_C_STAR) keeps ≥ RH_TARGET candidate recall at any
corpus size. This probe measures exactly that claim:

1. PLANT near-duplicate pairs: for M sampled base vectors, add a
   perturbed twin with cosine in [RH_C_STAR, RH_C_STAR + 0.02] (the
   synthetic corpus has no natural pairs above 0.7, so the design
   regime must be planted — standard dedup-eval methodology);
2. bucket with the EXACT same seeded_signs matrices and >=0 sign rule
   the Spark key uses (numpy replay of lsh_bucket_multi);
3. report, at 1× (sf0.1) and 10× (the structure-preserving scaled
   dir): planted-pair recall for (a) the recall-held T(np) tables,
   (b) the occupancy dial alone (T=1), (c) the fixed 4-table key —
   plus the candidate-pair COST (Σ_buckets C(occ,2) per table, the
   self-join work driver) and its over-linear exponent.

Pass criteria (stated band): held recall ≥ RH_TARGET − 0.10 at BOTH
scales, and cost ratio ≤ 2.0× over linear at 10× (theory: ~1.4×).

Run: python scripts/range_recall_held_probe.py [sf_dir] [scaled_dir]
Output: markdown table + one JSON line (docs/range_recall_held_r13.json).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from mercurygate_spark.operators.similarity import (  # noqa: E402
    N_TABLES,
    RH_C_STAR,
    RH_TARGET,
    scaled_n_planes,
    seeded_signs,
    tables_for_recall,
)

M_PLANT = 200  # planted near-dup pairs per corpus
RNG_SEED = 13


def load(sf_dir: str) -> np.ndarray:
    import duckdb

    path = f"{sf_dir}/embeddings.parquet"
    if os.path.isdir(path):
        path = f"{path}/*.parquet"
    rows = duckdb.sql(
        f"SELECT embedding FROM '{path}' ORDER BY vec_id"
    ).fetchall()
    return np.array([r[0] for r in rows], dtype=np.float64)


def plant_pairs(v: np.ndarray, m: int, rng: np.random.Generator):
    """Append m perturbed twins; returns (augmented matrix, list of
    (base_idx, twin_idx) pairs). Perturbation: v' = v + eps*g with eps
    solved per-vector so cos(v, v') lands in the design band."""
    n = v.shape[0]
    base_idx = rng.choice(n, size=m, replace=False)
    twins = []
    target = rng.uniform(RH_C_STAR + 0.005, RH_C_STAR + 0.02, size=m)
    for bi, c in zip(base_idx, target):
        b = v[bi]
        nb = np.linalg.norm(b)
        g = rng.standard_normal(b.shape[0])
        g -= (g @ b) / (nb * nb) * b  # orthogonalize
        g *= nb / np.linalg.norm(g)
        # cos(b, b*c + g*sin) = c exactly when g ⟂ b and |g| = |b|
        twins.append(b * c + g * np.sqrt(1.0 - c * c))
    aug = np.vstack([v, np.array(twins)])
    pairs = [(int(base_idx[i]), n + i) for i in range(m)]
    return aug, pairs


def buckets(v: np.ndarray, n_planes: int, n_tables: int) -> list[np.ndarray]:
    """Per-table integer bucket ids — the exact lsh_bucket_multi rule:
    bit p of table t is (v @ seeded_signs('t'+t)[p]) >= 0."""
    out = []
    for t in range(n_tables):
        s = seeded_signs(f"t{t}", n_planes, v.shape[1])
        bits = (v @ s.T) >= 0
        out.append(bits @ (1 << np.arange(n_planes)))
    return out


def pair_recall(bks: list[np.ndarray], pairs: list[tuple[int, int]]) -> float:
    hit = sum(1 for a, b in pairs if any(bk[a] == bk[b] for bk in bks))
    return hit / len(pairs)


def candidate_cost(bks: list[np.ndarray]) -> int:
    """Σ_tables Σ_buckets C(occ, 2) — the bucket self-join's pair
    count, the work the key's shuffle+score actually pays."""
    total = 0
    for bk in bks:
        _, counts = np.unique(bk, return_counts=True)
        total += int((counts * (counts - 1) // 2).sum())
    return total


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    scaled_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/mg_scale_r12"
    rng = np.random.default_rng(RNG_SEED)
    out = {
        "c_star": RH_C_STAR,
        "target": RH_TARGET,
        "m_plant": M_PLANT,
        "dirs": {},
    }
    print("| corpus | n | np | T | held recall | dial-only (T=1) | fixed 4-table | cand pairs | /linear |")
    print("|---|---|---|---|---|---|---|---|---|")
    costs = {}
    for d in (sf_dir, scaled_dir):
        v = load(d)
        aug, pairs = plant_pairs(v, M_PLANT, rng)
        n = aug.shape[0]
        np_ = scaled_n_planes(n)
        t_held = tables_for_recall(np_)
        bks = buckets(aug, np_, max(t_held, N_TABLES))
        r_held = pair_recall(bks[:t_held], pairs)
        r_dial = pair_recall(bks[:1], pairs)
        r_fix4 = pair_recall(bks[:N_TABLES], pairs)
        cost = candidate_cost(bks[:t_held])
        costs[d] = (n, cost)
        out["dirs"][d] = {
            "n": n,
            "np": np_,
            "t_held": t_held,
            "held_recall": round(r_held, 3),
            "dial_only_recall": round(r_dial, 3),
            "fixed4_recall": round(r_fix4, 3),
            "cand_pairs": cost,
        }
        print(
            f"| {d} | {n} | {np_} | {t_held} | {r_held:.3f} | {r_dial:.3f} "
            f"| {r_fix4:.3f} | {cost} | - |"
        )
    (n1, c1), (n2, c2) = costs[sf_dir], costs[scaled_dir]
    over_linear = (c2 / c1) / (n2 / n1)
    out["cost_over_linear_at_10x"] = round(over_linear, 3)
    held = [out["dirs"][d]["held_recall"] for d in (sf_dir, scaled_dir)]
    out["band"] = [round(RH_TARGET - 0.10, 3), 1.0]
    out["pass"] = bool(
        min(held) >= RH_TARGET - 0.10 and over_linear <= 2.0
    )
    print(f"\ncost over-linear at 10x: {over_linear:.2f}x  pass={out['pass']}")
    with open("docs/range_recall_held_r13.json", "w") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
