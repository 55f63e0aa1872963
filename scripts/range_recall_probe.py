"""Recall evidence for the LSH occupancy dial (round 12): the dial
holds candidate WORK constant by adding sign bits as the corpus grows
— which necessarily cuts the fraction of true within-radius pairs that
share a bucket. This probe quantifies that trade: for the fixed-plane
and count-dialed bucket widths, pair recall vs the exact brute-force
within-radius set (numpy GEMM ground truth), at sf0.1 and at the 10x
scaled dir.

Run: python scripts/range_recall_probe.py [sf_dir] [scaled_dir]
Output: markdown table + one JSON line (docs/range_recall_r12.json).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from mercurygate_spark.operators.similarity import (  # noqa: E402
    N_PLANES,
    scaled_n_planes,
    signs_matrix,
)

TAU = 0.3  # the keys' cosine radius


def load(sf_dir: str):
    import duckdb

    path = f"{sf_dir}/embeddings.parquet"
    if os.path.isdir(path):  # Spark-written dir table (the scaled dir)
        path = f"{path}/*.parquet"
    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{path}' ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    v = np.array([r[1] for r in rows], dtype=np.float64)
    return ids, v


def truth_pairs(v: np.ndarray) -> int:
    """Count of i<j pairs with rounded cosine >= TAU (r4 rounding as
    the keys apply)."""
    n = v.shape[0]
    norm = np.linalg.norm(v, axis=1)
    total = 0
    chunk = 2048
    for s in range(0, n, chunk):
        e = min(n, s + chunk)
        cos = (v[s:e] @ v.T) / (norm[s:e, None] * norm[None, :])
        cos = np.floor(cos * 1e4 + 0.5) / 1e4
        mask = cos >= TAU
        # strict upper triangle only
        jj = np.arange(n)[None, :]
        ii = np.arange(s, e)[:, None]
        total += int((mask & (jj > ii)).sum())
    return total


def bucket_recall(v: np.ndarray, n_planes: int) -> float:
    """Fraction of true pairs whose members share the n_planes-bit
    bucket (candidate recall of the bucket join)."""
    n = v.shape[0]
    signs = signs_matrix(v.shape[1], n_planes)
    bits = (v @ signs.T) >= 0
    # pack bits to one int key
    key = np.zeros(n, dtype=np.int64)
    for p in range(n_planes):
        key = key * 2 + bits[:, p]
    norm = np.linalg.norm(v, axis=1)
    hit = tot = 0
    chunk = 2048
    for s in range(0, n, chunk):
        e = min(n, s + chunk)
        cos = (v[s:e] @ v.T) / (norm[s:e, None] * norm[None, :])
        cos = np.floor(cos * 1e4 + 0.5) / 1e4
        jj = np.arange(n)[None, :]
        ii = np.arange(s, e)[:, None]
        mask = (cos >= TAU) & (jj > ii)
        same = key[s:e, None] == key[None, :]
        tot += int(mask.sum())
        hit += int((mask & same).sum())
    return hit / tot if tot else 1.0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    scaled_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/mg_scale_r12"
    out = {"tau": TAU, "dirs": {}}
    print("| corpus | n | true pairs | planes (fixed) | recall | planes (dialed) | recall |")
    print("|---|---|---|---|---|---|---|")
    for d in (sf_dir, scaled_dir):
        ids, v = load(d)
        n = len(ids)
        np_dial = scaled_n_planes(n)
        t = truth_pairs(v)
        r_fixed = bucket_recall(v, N_PLANES)
        r_dial = bucket_recall(v, np_dial)
        out["dirs"][d] = {
            "n": n,
            "true_pairs": t,
            "fixed_planes": N_PLANES,
            "fixed_recall": round(r_fixed, 3),
            "dialed_planes": np_dial,
            "dialed_recall": round(r_dial, 3),
        }
        print(
            f"| {d} | {n} | {t} | {N_PLANES} | {r_fixed:.3f} "
            f"| {np_dial} | {r_dial:.3f} |"
        )
    print()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
