"""Model-training queries over the documents corpus: distributed
logistic regression (the quality-classifier training loop a corpus
pipeline runs on its own features) with full-replay DuckDB oracles.

Reference parity note: the reference engine has no ML surface (its 6
notebooks are ETL only — SURVEY.md §0); these keys extend the declared
LLM-data-pipeline target surface (SURVEY.md §2c north star) with the
classifier-training step that sits between quality scoring and
corpus filtering (CCNet/fastText-style quality classifiers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mercurygate_spark.functions import r6
from mercurygate_spark.operators.logreg import (
    DUCK_FEAT_SQL,
    ITERS,
    duck_logreg_cte,
    duck_trace_sql,
    feature_frame,
    train,
)
from mercurygate_spark.queries.registry import load_tables, query


@query("ml_logreg_train", oracle=duck_trace_sql())
def ml_logreg_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-batch GD logistic regression ({ITERS} iterations) on
    engineered document features, distilling the type-token-ratio
    weak label from the other quality stats. Each iteration
    reduces the corpus to d+1 scalars via one map-side-combined
    aggregation (integer-quantized gradients — exact sums); only those
    scalars reach the driver (the MLlib treeAggregate pattern; the
    bounded-collect doctrine of the IVF centroids). The oracle replays
    the entire trajectory as a generated unrolled-CTE chain, one CTE
    pair per iteration, so iteration count and update order can never
    drift — the same doctrine as graph_pagerank and text_bpe_train.
    Output: the r6-rounded weight trajectory, one row per iteration —
    a stronger pin than final weights alone."""
    t = load_tables(spark, sf_dir, "documents")
    feat = feature_frame(t["documents"]).cache()
    try:
        trace = train(feat, ITERS)
    finally:
        feat.unpersist()

    def _r6(v: float) -> float:
        import math

        return math.floor(v * 1_000_000 + 0.5) / 1_000_000

    rows = [
        (i + 1, _r6(w[0]), _r6(w[1]), _r6(w[2]), _r6(w[3]))
        for i, w in enumerate(trace)
    ]
    return spark.createDataFrame(
        rows, "iter int, w0 double, w1 double, w2 double, w3 double"
    )


@query(
    "ml_logreg_predict",
    oracle=f"""
    WITH {duck_logreg_cte()}
    SELECT f.doc_id, f.y,
           floor((w.w0 + w.w1 * f.x1 + w.w2 * f.x2 + w.w3 * f.x3) * 1000000 + 0.5)
             / 1000000 AS score,
           CASE WHEN (w.w0 + w.w1 * f.x1 + w.w2 * f.x2 + w.w3 * f.x3) >= 0
                THEN 1 ELSE 0 END AS pred
    FROM feat f CROSS JOIN it{ITERS} w
    """,
)
def ml_logreg_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed scoring with the trained model: re-runs the {ITERS}
    GD iterations (cheap — d+1 scalars per pass), then applies the
    final weights to every document as a pure column expression — the
    broadcast-free inference path (weights enter the plan as
    literals). Decision at the exact z >= 0 margin; score is the
    r6-rounded logit. The oracle recomputes training through the same
    CTE chain and scores via a 1-row cross join."""
    t = load_tables(spark, sf_dir, "documents")
    cached = feature_frame(t["documents"]).cache()
    try:
        w = train(cached, ITERS)[-1]
    finally:
        cached.unpersist()
    z = (
        F.lit(w[0])
        + F.lit(w[1]) * F.col("x1")
        + F.lit(w[2]) * F.col("x2")
        + F.lit(w[3]) * F.col("x3")
    )
    return feature_frame(t["documents"]).select(
        "doc_id",
        "y",
        r6(z).alias("score"),
        F.when(z >= 0, 1).otherwise(0).alias("pred"),
    )


_KFOLDS = 4


def _kfold_oracle() -> str:
    blocks, rows = [], []
    for f in range(_KFOLDS):
        p = f"f{f}_"
        blocks.append(duck_logreg_cte(prefix=p, where=f"doc_id % {_KFOLDS} <> {f}"))
        blocks.append(
            f"{p}test AS (SELECT * FROM ({DUCK_FEAT_SQL})"
            f" WHERE doc_id % {_KFOLDS} = {f})"
        )
        rows.append(f"""
    SELECT {f} AS fold, count(*) AS n_test,
           CAST(sum(CASE WHEN (CASE WHEN
                 (w.w0 + w.w1 * t.x1 + w.w2 * t.x2 + w.w3 * t.x3) >= 0
                 THEN 1 ELSE 0 END) = t.y THEN 1 ELSE 0 END) AS BIGINT)
             AS n_correct,
           floor((CAST(sum(CASE WHEN (CASE WHEN
                 (w.w0 + w.w1 * t.x1 + w.w2 * t.x2 + w.w3 * t.x3) >= 0
                 THEN 1 ELSE 0 END) = t.y THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*)) * 1000000 + 0.5) / 1000000 AS accuracy
    FROM {p}test t CROSS JOIN {p}it{ITERS} w""")
    chain = ",\n    ".join(blocks)
    return f"WITH {chain}\n    " + "\n    UNION ALL\n    ".join(rows)


@query("ml_kfold_cv", oracle=_kfold_oracle())
def ml_kfold_cv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{_KFOLDS}-fold cross-validation of the quality classifier:
    deterministic fold assignment (doc_id mod {_KFOLDS} — re-shard
    stable, the sampling family's membership doctrine), one full GD
    training per held-out fold, held-out accuracy scored distributed
    (the trained weights enter each fold's scoring plan as literals —
    no per-row model state, no crossJoin). The oracle replays all
    {_KFOLDS} trainings through prefix-namespaced CTE chains in ONE
    WITH clause — the same multi-training composition PQ uses for its
    per-subspace codebooks. Generalization, not memorization, is what
    the held-out accuracy measures; the unit-test floor (baseline +
    0.15 in-sample) transfers because folds are corpus-representative."""
    t = load_tables(spark, sf_dir, "documents")
    feat = feature_frame(t["documents"])
    fold = F.col("doc_id") % _KFOLDS
    cached = feat.withColumn("fold", fold).cache()
    out = None
    try:
        for f in range(_KFOLDS):
            w = train(cached.where(F.col("fold") != f), ITERS)[-1]
            z = (
                F.lit(w[0])
                + F.lit(w[1]) * F.col("x1")
                + F.lit(w[2]) * F.col("x2")
                + F.lit(w[3]) * F.col("x3")
            )
            correct = F.when(
                F.when(z >= 0, 1).otherwise(0) == F.col("y"), 1
            ).otherwise(0)
            part = (
                cached.where(F.col("fold") == f)
                .agg(
                    F.count(F.lit(1)).alias("n_test"),
                    F.sum(correct).cast("long").alias("n_correct"),
                    r6(
                        F.sum(correct).cast("double") / F.count(F.lit(1))
                    ).alias("accuracy"),
                )
                .select(F.lit(f).alias("fold"), "n_test", "n_correct", "accuracy")
            )
            out = part if out is None else out.unionAll(part)
        out = out.localCheckpoint(eager=True)
    finally:
        cached.unpersist()
    return out
