"""Boundary-adaptive multi-probe behavior pins (VERDICT r14 next #1).

The margin rule and the per-query annealed beam are the two moving
parts sim_ivf_graph_adaptive adds over sim_ivf_graph_nprobe; these
tests pin that (a) the integer gate actually SPLITS the query
population (both branches exercised — a rule that gates everything or
nothing is the r14 uniform key in disguise), (b) the policy changes
the served candidates vs the uniform walk, (c) the walk stays
delta-scored (the r12 anti-join contract survives the per-query beam
join), and (d) with_dist exposes exactly the int64 quantized grid
distances the oracle recomputes.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Window
from pyspark.sql import functions as F

from mercurygate_spark.queries import all_queries
from tests.conftest import SF_SMOKE as SF


def _query_margin_frame(spark):
    from mercurygate_spark.operators.similarity import (
        ivf_assign,
        train_ivf_centroids,
    )
    from mercurygate_spark.queries.registry import load_tables
    from mercurygate_spark.queries.similarity import N_QUERIES

    e = load_tables(spark, SF, "embeddings")["embeddings"]
    cmat = train_ivf_centroids(e)
    qd = ivf_assign(
        e.where(F.col("vec_id") < N_QUERIES), cmat, "vec_id", "embedding",
        n_probe=2, with_dist=True,
    )
    w = Window.partitionBy("vec_id")
    return qd.withColumn("d1", F.min("probe_dist").over(w)), e, cmat


def test_margin_gate_splits_queries(spark):
    """The 11% margin rule must gate SOME queries and pass others at
    the smoke SF — both code paths (wide boundary beam, narrow
    interior beam) are live in every parity run."""
    from mercurygate_spark.queries.similarity import (
        GRAPH_ADP_MARGIN_PCT,
        N_QUERIES,
    )

    qm, _, _ = _query_margin_frame(spark)
    gated = (
        qm.where(F.col("probe_rank") == 2)
        .where(
            100 * (F.col("probe_dist") - F.col("d1"))
            <= GRAPH_ADP_MARGIN_PCT * F.col("d1")
        )
        .count()
    )
    assert 0 < gated < N_QUERIES, f"gate does not split: {gated}/{N_QUERIES}"


def test_adaptive_serves_different_candidates_than_uniform(spark):
    """The adaptive policy must change the served set vs the uniform
    n_probe=2 walk (same E/G family) — otherwise the promotion is a
    no-op relabel."""
    q = all_queries()
    adp = {
        (r["query_id"], r["candidate_id"])
        for r in q["sim_ivf_graph_adaptive"](spark, SF).collect()
    }
    uni = {
        (r["query_id"], r["candidate_id"])
        for r in q["sim_ivf_graph_nprobe"](spark, SF).collect()
    }
    assert adp != uni


def test_adaptive_walk_scores_delta_only(spark):
    """The r12 delta-scoring contract survives the adaptive machinery:
    1 entry call + one per hop, every hop input anti-joined against
    the visited set."""
    from mercurygate_spark.queries import similarity as sim
    from mercurygate_spark.queries.similarity import GRAPH_ADP_B2

    sim._GRAPH_SCORE_TRACE = trace = []
    try:
        all_queries()["sim_ivf_graph_adaptive"](spark, SF).collect()
    finally:
        sim._GRAPH_SCORE_TRACE = None
    assert len(trace) == 1 + len(GRAPH_ADP_B2), len(trace)
    for hop_plan in trace[1:]:
        assert "LeftAnti" in hop_plan, hop_plan[:1500]


def test_with_dist_is_exact_quantized_grid(spark):
    """ivf_assign(with_dist=True) must expose the EXACT int64 squared
    distance on the quantized grid — the margin rule's engine-exact
    guarantee rests on it."""
    from mercurygate_spark.operators.similarity import (
        _int_sq_dists,
        _quantize,
    )

    qm, e, cmat = _query_margin_frame(spark)
    rows = qm.limit(20).collect()
    vecs = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in e.where(F.col("vec_id") < 1000).collect()
    }
    for r in rows:
        qv = _quantize(vecs[r["vec_id"]][None, :])
        d = _int_sq_dists(qv, cmat)[0]
        assert int(d[r["centroid_id"]]) == r["probe_dist"], r
