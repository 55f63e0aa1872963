"""Invariants for the round-14 third-wave keys.

sample_quality_epochs: quartile semantics of the quality-weighted
manifest (tie-inclusive cuts, epoch multiplicities, attrition shares).
dedup_decontaminate_semantic: the fixed-size eval-cap contract and the
eval/train split disjointness.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mercurygate_spark.functions import md5_long
from mercurygate_spark.queries import all_queries
from mercurygate_spark.queries.dedup import SEM_DECON_EVAL_CAP
from mercurygate_spark.queries.registry import load_tables
from mercurygate_spark.queries.sampling import hash_bucket  # noqa: F401 (import check)
from mercurygate_spark.queries.text import DECON_MOD

SF = "/root/testdata/sf0.001"


def test_quality_epochs_quartile_semantics(spark):
    rows = all_queries()["sample_quality_epochs"](spark, SF).collect()
    per_doc: dict[int, list] = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r)
    n_scored = None
    # epoch multiplicity is exactly {1, 2} and epoch_idx is dense 0..m-1
    for doc, rs in per_doc.items():
        m = len(rs)
        assert m in (1, 2)
        assert sorted(r["epoch_idx"] for r in rs) == list(range(m))
        assert len({r["score"] for r in rs}) == 1
    # tie-inclusive quartiles: 2-epoch docs are >= 25% of the SCORED
    # population, 1-or-2-epoch docs >= 75% — and each comes from a
    # contiguous top segment of the score order
    from mercurygate_spark.queries.corpus import (
        _qc_feature_frame,
        qc_trained_scorer,
    )

    d = load_tables(spark, SF, "documents")["documents"]
    _, score_col = qc_trained_scorer(d)
    scores = sorted(
        (r["score"], r["doc_id"])
        for r in _qc_feature_frame(d).select("doc_id", score_col()).collect()
    )
    n_scored = len(scores)
    hi_docs = {doc for doc, rs in per_doc.items() if len(rs) == 2}
    any_docs = set(per_doc)
    assert len(hi_docs) >= max(1, n_scored // 4)
    assert len(any_docs) >= max(1, (3 * n_scored) // 4)
    # contiguity: every doc scoring above the worst 2-epoch doc's score
    # is itself a 2-epoch doc (tie-inclusive threshold semantics)
    min_hi = min(s for s, doc in scores if doc in hi_docs)
    assert all(doc in hi_docs for s, doc in scores if s > min_hi)
    min_any = min(s for s, doc in scores if doc in any_docs)
    assert all(doc in any_docs for s, doc in scores if s > min_any)


def test_semantic_decon_eval_cap_and_disjointness(spark):
    emb = load_tables(spark, SF, "embeddings")["embeddings"]
    is_eval = md5_long(F.col("vec_id").cast("string")) % DECON_MOD == 0
    eval_ids = {r["vec_id"] for r in emb.where(is_eval).select("vec_id").collect()}
    out = all_queries()["dedup_decontaminate_semantic"](spark, SF).collect()
    out_ids = {r["vec_id"] for r in out}
    # training output never contains an eval vector, and covers every
    # non-eval vector exactly once
    assert not (out_ids & eval_ids)
    n_total = emb.count()
    assert len(out) == len(out_ids) == n_total - len(eval_ids)
    # the screen work is bounded by the cap: no row can count more
    # within-tau neighbors than the capped eval set holds
    cap = min(SEM_DECON_EVAL_CAP, len(eval_ids))
    assert all(0 <= r["n_contam"] <= cap for r in out)
    assert all(r["contaminated"] == (r["n_contam"] > 0) for r in out)
