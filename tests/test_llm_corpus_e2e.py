"""pipeline_llm_corpus_e2e composition pins (VERDICT r13 #1).

The capstone's per-stage rows must agree with the standalone keys it
composes (the share-exactly-these-survivors contract), attrition must
be monotone, and the returned plan must show the stage hand-offs are
checkpoint boundaries — no stage re-materializes an earlier stage's
lineage inside the final job.
"""

from __future__ import annotations

from mercurygate_spark.queries import all_queries

SF = "/root/testdata/sf0.001"


def _rows(df):
    return {r["stage_idx"]: r.asDict() for r in df.collect()}


def test_stage_counts_match_standalone_keys(spark):
    q = all_queries()
    cap = _rows(q["pipeline_llm_corpus_e2e"](spark, SF))
    funnel = {
        r["stage_idx"]: r.asDict()
        for r in q["pipeline_filter_funnel"](spark, SF).collect()
    }
    # capstone stage 1 IS the funnel's exact-dedup stage: same count,
    # same order-independent content signature
    assert cap[1]["n_docs"] == funnel[4]["n_docs"]
    assert cap[1]["sig"] == funnel[4]["sig"]
    clf = q["pipeline_quality_classifier"](spark, SF).collect()
    assert cap[2]["n_docs"] == sum(r["kept"] for r in clf)


def test_monotone_attrition(spark):
    cap = _rows(all_queries()["pipeline_llm_corpus_e2e"](spark, SF))
    # 9-stage chain since the r15 semantic splice (VERDICT r14 #2):
    # raw(0) → funnel(1) → classifier(2) → neardup CC reps(3) →
    # semdedup reps(4) → sem-decontaminated(5) → gram-decontaminated(6)
    # → tokenized+packed(7) → epoch manifest(8)
    assert set(cap) == {0, 1, 2, 3, 4, 5, 6, 7, 8}
    for a, b in [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 6)]:
        assert cap[a]["n_docs"] >= cap[b]["n_docs"]
    # the classifier cut keeps ~QC_KEEP of survivors (tie-inclusive →
    # at least the floor target when any survivor exists)
    if cap[1]["n_docs"]:
        assert cap[2]["n_docs"] >= max(1, cap[1]["n_docs"] // 2)
    # post-BPE packed mass can only shrink vs whitespace mass of the
    # same survivor set (merges join tokens, never split)
    assert cap[7]["token_mass"] <= cap[6]["token_mass"]


def test_stage_handoffs_are_checkpoint_boundaries(spark):
    df = all_queries()["pipeline_llm_corpus_e2e"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the funnel tercile window (percent_rank) and the BPE triple
    # replace run ONCE, upstream of localCheckpoint — if either leaks
    # into the final plan a stage is re-deriving an earlier stage
    assert "percent_rank" not in plan
    assert "replace(replace" not in plan
