"""ADVICE r12: stream_scd2_upsert must not rely on file mtimes for
cross-micro-batch generation ordering. The fix stages each arriving
generation and drains merges in explicit ascending-g schedule order;
these tests pin that arrival permutation CANNOT change the history.
"""

from __future__ import annotations


def _run(spark, order):
    from mercurygate_spark.queries import all_queries
    from mercurygate_spark.queries import streaming_queries as sq

    sf = "/root/testdata/sf0.001"
    sq._SCD2_ARRIVAL_ORDER = order
    try:
        return sorted(map(tuple, all_queries()["stream_scd2_upsert"](spark, sf).collect()))
    finally:
        sq._SCD2_ARRIVAL_ORDER = None


def test_scd2_stream_reversed_and_shuffled_arrival_same_history(spark):
    """Generations landing newest-first (reversed mtimes) or
    interleaved must merge in schedule order and produce the exact
    history that in-order arrival produces."""
    from mercurygate_spark.queries.scans import _SCD2_TS

    gens = sorted(_SCD2_TS)
    assert len(gens) >= 3, "test assumes a multi-generation schedule"
    baseline = _run(spark, None)
    assert len(baseline) > 0
    assert _run(spark, list(reversed(gens))) == baseline
    mid = [gens[1], gens[-1], gens[0]] + [g for g in gens if g not in (gens[0], gens[1], gens[-1])]
    assert _run(spark, mid) == baseline
