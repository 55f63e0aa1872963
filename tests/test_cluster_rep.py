"""dedup_cluster_rep_quality behavior pins (VERDICT r14 next #3).

The key exists because min-id reps are arbitrary; these tests pin
that (a) the quality arg-max genuinely DISAGREES with min-id on this
corpus (if every cluster's best doc were its min-id doc the key would
be indistinguishable from dedup_connected_components), (b) the rep is
exactly the (score DESC, doc_id) arg-max over each cluster, (c) the
cluster membership matches the min-id key's components (only the
DECISION layer changed), and (d) the rep frame is never
broadcast-hinted (cluster count grows with the corpus).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mercurygate_spark.queries import all_queries
from tests.conftest import SF_SMOKE as SF


def _result(spark):
    return all_queries()["dedup_cluster_rep_quality"](spark, SF).cache()


def test_quality_rep_disagrees_with_min_id(spark):
    r = _result(spark)
    dis = (
        r.where(F.col("cluster_size") > 1)
        .groupBy("component_id", "rep_id")
        .agg(F.min("doc_id").alias("min_id"))
        .where(F.col("rep_id") != F.col("min_id"))
        .count()
    )
    assert dis > 0, "every cluster rep equals min-id; key is a no-op relabel"


def test_rep_is_quality_argmax(spark):
    """For every multi-doc cluster the elected rep carries the
    cluster's maximum trained-classifier score; score ties (if any)
    break toward the smaller doc_id."""
    from mercurygate_spark.queries.corpus import (
        _qc_feature_frame,
        qc_trained_scorer,
    )
    from mercurygate_spark.queries.registry import load_tables

    d = load_tables(spark, SF, "documents")["documents"]
    _, score_col = qc_trained_scorer(d)
    scores = {
        row["doc_id"]: row["score"]
        for row in _qc_feature_frame(d.select("doc_id", "text"))
        .select("doc_id", score_col())
        .collect()
    }
    r = _result(spark)
    clusters: dict = {}
    for row in r.where(F.col("cluster_size") > 1).collect():
        clusters.setdefault(row["component_id"], (row["rep_id"], []))[1].append(
            row["doc_id"]
        )
    assert clusters
    for comp, (rep, members) in clusters.items():
        best = min(members, key=lambda i: (-scores[i], i))
        assert rep == best, (comp, rep, best)


def test_membership_matches_min_id_key(spark):
    """Same transitive hull as dedup_connected_components — the key
    changes WHO represents a cluster, never who belongs to it."""
    r = _result(spark)
    mine = {
        (row["doc_id"], row["component_id"])
        for row in r.where(F.col("cluster_size") > 1).collect()
    }
    base = {
        (row["doc_id"], row["component_id"])
        for row in all_queries()["dedup_connected_components"](spark, SF).collect()
    }
    assert mine == base


def test_rep_frame_not_broadcast_hinted(spark):
    """The reps join must stay a shuffle join path: cluster count
    grows with the corpus, so an explicit broadcast hint would be the
    pair-cluster bug r14 fixed. (AQE may still auto-broadcast at toy
    SF — the pin is on the HINT, i.e. the logical plan.)"""
    df = all_queries()["dedup_cluster_rep_quality"](spark, SF)
    logical = df._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint (strategy=broadcast)" not in logical, logical[:2000]
