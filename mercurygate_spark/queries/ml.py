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


_NB_Q = 1_000_000_000  # log-prob quantization grid (1e-9)
_NB_SPLIT = 3          # doc_id % 3 == 0 → test, else train


def _nb_oracle() -> str:
    q = _NB_Q
    return f"""
    WITH tok AS (
      SELECT doc_id,
             unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                                t -> t <> '')) AS t
      FROM documents
    ), train_docs AS (
      SELECT doc_id, lang FROM documents WHERE doc_id % {_NB_SPLIT} <> 0
    ), test_docs AS (
      SELECT doc_id, lang FROM documents WHERE doc_id % {_NB_SPLIT} = 0
    ), cnt AS (
      SELECT d.lang AS y, tok.t, CAST(count(*) AS BIGINT) AS c
      FROM tok JOIN train_docs d USING (doc_id) GROUP BY 1, 2
    ), vocab AS (
      SELECT DISTINCT t FROM cnt
    ), vsize AS (
      SELECT CAST(count(*) AS BIGINT) AS v FROM vocab
    ), cls AS (
      SELECT y, sum(c) AS n_y FROM cnt GROUP BY y
    ), prior AS (
      SELECT lang AS y,
             CAST(floor(ln(count(*) / (SELECT count(*) FROM train_docs))
                        * {q} + 0.5) AS BIGINT) AS lpq
      FROM train_docs GROUP BY lang
    ), llik AS (
      SELECT vocab.t, cls.y,
             CAST(floor(ln((coalesce(cnt.c, 0) + 1)
                           / (cls.n_y + vsize.v)) * {q} + 0.5) AS BIGINT) AS llq
      FROM vocab CROSS JOIN cls CROSS JOIN vsize
      LEFT JOIN cnt ON cnt.t = vocab.t AND cnt.y = cls.y
    ), tok_test AS (
      SELECT doc_id, t, CAST(count(*) AS BIGINT) AS n
      FROM tok WHERE doc_id % {_NB_SPLIT} = 0 GROUP BY 1, 2
    ), tscore AS (
      SELECT tok_test.doc_id, llik.y, sum(tok_test.n * llik.llq) AS s
      FROM tok_test JOIN llik USING (t) GROUP BY 1, 2
    ), score AS (
      SELECT d.doc_id, d.lang AS labeled_lang, prior.y,
             prior.lpq + coalesce(tscore.s, 0) AS total
      FROM test_docs d CROSS JOIN prior
      LEFT JOIN tscore ON tscore.doc_id = d.doc_id AND tscore.y = prior.y
    ), pred AS (
      SELECT doc_id, labeled_lang, y AS pred_lang,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY total DESC, y) AS rn
      FROM score
    )
    SELECT pred_lang, labeled_lang, count(*) AS n_docs
    FROM pred WHERE rn = 1 GROUP BY 1, 2
    """


@query("ml_naive_bayes", oracle=_nb_oracle())
def ml_naive_bayes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes language classifier (the CCNet/fastText
    classification step a corpus pipeline trains on its own data):
    train on doc_id%3 != 0, predict the held-out third, output the
    confusion matrix vs the labeled lang. (On this synthetic corpus
    the lang label is independent of the text — every lang draws the
    same vocabulary — so held-out accuracy sits at the majority
    baseline BY CONSTRUCTION, same property text_lang_id exhibits;
    the key pins the full trained-model decision path exactly, not
    model quality.) Laplace-smoothed token
    log-likelihoods ln((c+1)/(N_y+V)) and class log-priors are
    quantized to a 1e-9 integer grid at the source, so every score is
    an EXACT bigint sum — no float accumulation order anywhere (the
    ml_logreg gradient doctrine). Residual cross-engine surface: the
    quantization itself — JVM Math.log and DuckDB ln can differ in
    the last ulp, which flips floor() only when ln·1e9 lands within
    ~1e-6 of a half-integer (the same accepted exposure as
    ml_logreg's 1e-9 gradient grid; everything after the grid is
    exact). Argmax via row_number ordered on (score DESC, lang),
    deterministic given the grid.

    Scale posture: token counts and the vocab × class likelihood grid
    are shuffle joins on the token (the vocabulary of a web corpus is
    unbounded — never broadcast, the text_unigram_logprob doctrine);
    the only broadcasts are the 5-row class/prior frames and the
    1-row vocab-size frame. The doc-level token arrays are
    localCheckpoint-ed so the regex tokenization scan runs ONCE and
    both the train-count and test-score branches explode from the
    materialized (compact, pre-explode) frame. Per-doc-class scores
    are one groupBy; the argmax is a 5-rows-per-doc window."""
    from mercurygate_spark.functions import tokens

    q = _NB_Q
    qln = lambda x: F.floor(F.log(x) * q + 0.5).cast("long")  # noqa: E731
    t = load_tables(spark, sf_dir, "documents")
    docs = t["documents"]
    is_test = F.col("doc_id") % _NB_SPLIT == 0
    toks_by_doc = docs.select(
        "doc_id", "lang", is_test.alias("is_test"), tokens("text").alias("ts")
    ).localCheckpoint(eager=True)
    tok = toks_by_doc.select(
        "doc_id", "lang", "is_test", F.explode("ts").alias("t")
    )
    train_docs = toks_by_doc.where(~F.col("is_test")).select("doc_id", "lang")
    test_docs = toks_by_doc.where(F.col("is_test")).select("doc_id", "lang")

    cnt = (
        tok.where(~F.col("is_test"))
        .groupBy(F.col("lang").alias("y"), "t")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    vocab = cnt.select("t").distinct()
    vsize = vocab.agg(F.count(F.lit(1)).cast("long").alias("v"))
    cls = cnt.groupBy("y").agg(F.sum("c").alias("n_y"))
    n_train = train_docs.agg(F.count(F.lit(1)).alias("n_tr"))
    prior = (
        train_docs.groupBy(F.col("lang").alias("y"))
        .agg(F.count(F.lit(1)).alias("n_docs_y"))
        .crossJoin(F.broadcast(n_train))
        .select(
            "y",
            qln(F.col("n_docs_y").cast("double") / F.col("n_tr")).alias("lpq"),
        )
    )
    llik = (
        vocab.crossJoin(F.broadcast(cls))
        .crossJoin(F.broadcast(vsize))
        .join(cnt, ["t", "y"], "left")
        .select(
            "t", "y",
            qln(
                (F.coalesce(F.col("c"), F.lit(0)) + 1).cast("double")
                / (F.col("n_y") + F.col("v")).cast("double")
            ).alias("llq"),
        )
    )
    tok_test = (
        tok.where(F.col("is_test"))
        .groupBy("doc_id", "t")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    tscore = (
        tok_test.join(llik, "t")
        .groupBy("doc_id", "y")
        .agg(F.sum(F.col("n") * F.col("llq")).alias("s"))
    )
    score = (
        test_docs.crossJoin(F.broadcast(prior))
        .join(tscore, ["doc_id", "y"], "left")
        .select(
            "doc_id",
            F.col("lang").alias("labeled_lang"),
            "y",
            (F.col("lpq") + F.coalesce(F.col("s"), F.lit(0))).alias("total"),
        )
    )
    from pyspark.sql import Window

    rn = F.row_number().over(
        Window.partitionBy("doc_id").orderBy(F.col("total").desc(), F.col("y"))
    )
    return (
        score.withColumn("rn", rn)
        .where(F.col("rn") == 1)
        .groupBy(F.col("y").alias("pred_lang"), "labeled_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
