"""stream_classifier_gate_recal drift semantics (VERDICT r13 #5).

The drift rule must be the exact integer boundary test, and a drifted
shard must flip the threshold to EXACTLY the tie-inclusive cut of its
own score distribution — for every later shard, never retroactively.
"""

from __future__ import annotations

from mercurygate_spark.queries import all_queries
from mercurygate_spark.queries.corpus import QC_KEEP
from mercurygate_spark.queries.streaming_queries import drift_fires

SF = "/root/testdata/sf0.001"


def test_drift_rule_exact_boundary():
    # bound is |100k - 50n| > 15n: 65/100 sits ON it (no fire), 66 fires
    assert not drift_fires(65, 100)
    assert drift_fires(66, 100)
    assert not drift_fires(35, 100)
    assert drift_fires(34, 100)
    assert not drift_fires(0, 0)  # empty band never fires


def _brute_thr(scores: list[float]) -> float:
    k = max(1, int(len(scores) * QC_KEEP))
    return sorted(scores, reverse=True)[k - 1]


def test_threshold_flips_exactly_when_bound_says_so(spark):
    rows = all_queries()["stream_classifier_gate_recal"](spark, SF).collect()
    by_batch: dict[int, list] = {}
    for r in rows:
        by_batch.setdefault(r["batch_id"], []).append(r)
    bands = sorted(by_batch)
    assert bands, "no arrival shards"
    # replay the drain in pure Python: the threshold each band was
    # gated with must be thr0 for the first band, then flip to the
    # previous band's brute-force cut exactly when its drift fired
    prev_thr = by_batch[bands[0]][0]["thr"]
    for i, b in enumerate(bands):
        rs = by_batch[b]
        thrs = {r["thr"] for r in rs}
        assert thrs == {prev_thr}, f"band {b} gated with mixed/wrong thr"
        n = len(rs)
        kept = sum(r["kept"] for r in rs)
        fired = {r["recal_fired"] for r in rs}
        assert fired == {drift_fires(kept, n)}
        # per-doc decisions consistent with the banded threshold
        for r in rs:
            assert r["kept"] == int(r["score"] >= prev_thr)
        if drift_fires(kept, n):
            prev_thr = _brute_thr([r["score"] for r in rs])
    # the key is non-degenerate on the testdata: at least one band
    # drifts (char-length bands correlate with the score feature)
    assert any(r["recal_fired"] for r in rows)
