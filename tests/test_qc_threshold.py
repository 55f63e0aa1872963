"""qc_score_threshold production derivation (VERDICT r13 #3).

The tie-inclusive percentile THRESHOLD s* used by the quality
classifier family must be computed by percentile_approx bracketing +
exact boundary refinement — never a partition-less window — and the
refined answer must be EXACTLY the brute-force rank answer at every
accuracy, because three keys (batch classifier, streaming gate, corpus
capstone) share the scalar and the DuckDB oracles replay the exact
semantics.
"""

from __future__ import annotations

import inspect

import pytest
from pyspark.sql import functions as F

from mercurygate_spark.queries.corpus import QC_KEEP, qc_score_threshold


def _brute(scores: list[float]) -> float:
    """Reference semantics: the value at descending row rank
    K = max(1, floor(n·QC_KEEP)), tie-inclusive."""
    k = max(1, int(len(scores) * QC_KEEP))
    return sorted(scores, reverse=True)[k - 1]


def _frame(spark, scores):
    return spark.createDataFrame(
        [(float(s),) for s in scores], "score double"
    )


def test_matches_brute_force_many_distinct(spark):
    # 3000 distinct scores, tiny accuracy/cap → several bracket rounds
    scores = [((i * 7919) % 3000) / 1000.0 for i in range(3000)]
    got = qc_score_threshold(_frame(spark, scores), accuracy=50, collect_cap=16)
    assert got == _brute(scores)


def test_matches_brute_force_heavy_ties(spark):
    # massive ties straddling the cut: 1000×0.2, 500×0.5, 1×0.9
    scores = [0.2] * 1000 + [0.5] * 500 + [0.9]
    got = qc_score_threshold(_frame(spark, scores))
    assert got == _brute(scores) == 0.2


def test_tie_inclusive_at_exact_boundary(spark):
    # K = floor(6·0.5) = 3; descending [9,7,7,7,1,1] → rank-3 value 7
    scores = [9.0, 7.0, 7.0, 7.0, 1.0, 1.0]
    got = qc_score_threshold(_frame(spark, scores))
    assert got == _brute(scores) == 7.0


def test_single_row_and_empty(spark):
    assert qc_score_threshold(_frame(spark, [0.4])) == 0.4
    empty = _frame(spark, []).where(F.lit(False))
    assert qc_score_threshold(empty) is None


@pytest.mark.parametrize("acc", [10, 100, 10_000])
def test_accuracy_invariant(spark, acc):
    # the refinement is EXACT at any sketch accuracy — accuracy only
    # moves the rounds/collect tradeoff, never the answer
    scores = [((i * 31) % 97) / 10.0 for i in range(500)]
    got = qc_score_threshold(_frame(spark, scores), accuracy=acc, collect_cap=8)
    assert got == _brute(scores)


def test_no_window_in_derivation_source():
    # the plan pin's source-level twin: the derivation must never build
    # a window (the partition-less cumulative shape this rewrite
    # removed); the physical-plan pin is the absence of
    # pipeline_quality_classifier from _BOUNDED_GLOBAL_WINDOW_OK in
    # test_plans.py — any reintroduced global window fails that sweep
    src = inspect.getsource(qc_score_threshold)
    assert ".over(" not in src and "Window" not in src
