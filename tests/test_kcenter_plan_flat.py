"""VERDICT r12 next #4: batched k-center must not grow a K-length
IN-list in the logical plan. Exclusion is state-carried (min_d = -1
sentinel folded in the same least() projection), so at production K
(hundreds+) the per-round pick plan stays constant-size and mentions
no id literals at all (the previous round's B-literal when() is
behind an eager localCheckpoint).
"""

from __future__ import annotations

import re


def test_kcenter_plan_flat_at_k256(spark):
    from mercurygate_spark.queries.similarity import _kcenter_batched_rows

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    n = e.count()
    b, rounds = 32, 8  # K = 1 + 256
    plans: list[str] = []
    rows = _kcenter_batched_rows(spark, e, b, rounds, plan_sizes=plans)
    assert len(rows) == min(1 + b * rounds, n)
    assert len({r[1] for r in rows}) == len(rows)  # no point picked twice
    # every pick plan is free of IN-lists entirely — exclusion lives in
    # the checkpointed state, not the predicate
    for p in plans:
        assert not re.search(r"vec_id#\d+L? IN \(", p), p[:2000]
    # and the plan size is flat across rounds: round 8's plan is the
    # same shape as round 2's (no accumulation of anything)
    sizes = [len(p) for p in plans[1:]]
    assert max(sizes) <= min(sizes) * 1.2, sizes


def test_kcenter_batched_matches_its_oracle_shape(spark):
    """The state-carried rewrite must not change results: replay the
    key's exact (B, rounds) configuration and check the greedy
    invariant — each round's picks are the B max-min-distance points
    among the not-yet-picked, i.e. every pick's coverage_dist is
    monotonically non-increasing within a round-ordered scan."""
    from mercurygate_spark.queries import all_queries

    out = all_queries()["sample_kcenter_batched"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    by_rnd: dict[int, list] = {}
    for r in out:
        by_rnd.setdefault(r["rnd"], []).append(r["coverage_dist"])
    assert by_rnd[0] == [0.0]
    # coverage (the max distance of a round's picks) never increases
    # across rounds — the defining property of greedy k-center
    maxes = [max(by_rnd[k]) for k in sorted(by_rnd) if k > 0]
    assert all(a >= b for a, b in zip(maxes, maxes[1:])), maxes
