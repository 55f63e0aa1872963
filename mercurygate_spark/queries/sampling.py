"""Deterministic sampling & splitting (training-data-pipeline surface).

`df.sample()` is seed-dependent per partitioning and can't be
oracle-checked; production corpus pipelines want CONTENT-derived
sampling anyway — a doc keeps its split assignment no matter how the
table is partitioned, re-sharded, or re-read. All three ops key off
md5(id) so they're reproducible on any engine and stable across runs
(same trick as operators.dedup's cross-engine hashes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mercurygate_spark.functions import md5_long, r2, r6
from mercurygate_spark.queries.registry import load_tables, query


def hash_bucket(c, n: int = 100):
    """Stable [0, n) bucket from the md5 of a key column."""
    return md5_long(c.cast("string")) % n


@query(
    "sample_deterministic",
    oracle="""
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 < 10
    """,
)
def sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% content-hash sample: md5(doc_id) mod 100 < 10. Unlike
    df.sample(), membership is a pure function of the row — identical
    on re-runs, re-shards, and other engines (the oracle proves it)."""
    t = load_tables(spark, sf_dir, "documents")
    d = t["documents"]
    return d.where(hash_bucket(F.col("doc_id")) < 10).select("doc_id", "lang", "n_chars")


@query(
    "split_train_val_test",
    oracle="""
    WITH b AS (
      SELECT doc_id, lang,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 AS bucket
      FROM documents
    )
    SELECT CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val'
                ELSE 'test' END AS split,
           lang,
           count(*) AS n_docs
    FROM b GROUP BY 1, 2
    """,
)
def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test assignment from the id hash — the
    standard leakage-safe corpus split (a document can never migrate
    between splits when the corpus grows or is reprocessed)."""
    t = load_tables(spark, sf_dir, "documents")
    b = hash_bucket(F.col("doc_id"))
    split = (
        F.when(b < 80, "train").when(b < 90, "val").otherwise("test")
    )
    return (
        t["documents"]
        .select(split.alias("split"), "lang")
        .groupBy("split", "lang")
        .agg(F.count("*").alias("n_docs"))
    )


@query(
    "sample_stratified_quota",
    oracle="""
    SELECT doc_id, lang, n_chars
    FROM (
      SELECT doc_id, lang, n_chars,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT, doc_id
             ) AS rn
      FROM documents
    ) WHERE rn <= 25
    """,
)
def sample_stratified_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified quota sampling: exactly ≤25 docs per language,
    chosen by hash order (deterministic pseudo-random ranking per
    stratum, doc_id tiebreak). The language-balancing primitive for
    mixture construction."""
    t = load_tables(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        md5_long(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        t["documents"]
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 25)
        .select("doc_id", "lang", "n_chars")
    )


_H6 = "(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000000)"


@query(
    "sample_weighted",
    oracle=f"""
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE {_H6} < CAST(floor(least(1.0, n_chars / 2000.0) * 1000000) AS BIGINT)
    """,
)
def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted deterministic sampling: each document keeps with
    probability proportional to a per-row weight (here the length proxy
    n_chars/2000, capped at 1) by comparing md5(doc_id) mod 1e6 against
    the weight scaled to the same grid — quality-weighted corpus
    downsampling with zero RNG. Integer comparison on both engines
    (floor of the same IEEE double), so membership replays exactly."""
    t = load_tables(spark, sf_dir, "documents")
    d = t["documents"]
    threshold = F.floor(
        F.least(F.lit(1.0), F.col("n_chars") / 2000.0) * 1000000
    ).cast("long")
    return d.where(
        (md5_long(F.col("doc_id").cast("string")) % 1000000) < threshold
    ).select("doc_id", "lang", "n_chars")


@query(
    "sample_mixture_rebalance",
    oracle=f"""
    WITH counts AS (
      SELECT lang, count(*) AS n_orig FROM documents GROUP BY lang
    ), rates AS (
      SELECT lang, n_orig,
             min(n_orig) OVER () AS target_n,
             min(n_orig) OVER () / n_orig AS keep_rate
      FROM counts
    ), kept AS (
      SELECT d.lang
      FROM documents d JOIN rates r ON d.lang = r.lang
      WHERE {_H6} < CAST(floor(r.keep_rate * 1000000) AS BIGINT)
    )
    SELECT r.lang, r.n_orig,
           round(r.keep_rate, 6) AS keep_rate,
           coalesce(k.n_kept, 0) AS n_kept
    FROM rates r LEFT JOIN (
      SELECT lang, count(*) AS n_kept FROM kept GROUP BY lang
    ) k ON r.lang = k.lang
    """,
)
def sample_mixture_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture rebalancing: downsample every language stratum
    toward the SMALLEST stratum's size by a per-stratum deterministic
    hash rate — the corpus-mixture construction step (balance domains
    before training, reproducibly). The per-stratum rates are a tiny
    aggregate joined back broadcast; each doc's membership is a pure
    function of (doc_id, its stratum's rate). Expected kept counts
    concentrate around target_n (binomial, not exact — the quota
    variant gives exactness; this one never shuffles the corpus)."""
    t = load_tables(spark, sf_dir, "documents")
    d = t["documents"]
    counts = d.groupBy("lang").agg(F.count("*").alias("n_orig"))
    w = Window.partitionBy()
    rates = counts.select(
        "lang",
        "n_orig",
        (F.min("n_orig").over(w) / F.col("n_orig")).alias("keep_rate"),
    )
    kept = (
        d.join(F.broadcast(rates), "lang")
        .where(
            (md5_long(F.col("doc_id").cast("string")) % 1000000)
            < F.floor(F.col("keep_rate") * 1000000).cast("long")
        )
        .groupBy("lang")
        .agg(F.count("*").alias("n_kept"))
    )
    from mercurygate_spark.functions import r6

    return rates.join(kept, "lang", "left").select(
        "lang",
        "n_orig",
        r6(F.col("keep_rate")).alias("keep_rate"),
        F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept"),
    )


@query(
    "sample_token_budget",
    oracle="""
    WITH per_doc AS (
      SELECT doc_id, lang,
             len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                             t -> t <> '')) AS n_tokens
      FROM documents
    ), counts AS (
      SELECT lang, CAST(sum(n_tokens) AS BIGINT) AS total_tokens
      FROM per_doc GROUP BY lang
    ), plan AS (
      SELECT lang, total_tokens,
             (CAST(sum(total_tokens) OVER () AS BIGINT) // 2)
               // CAST(count(*) OVER () AS BIGINT) AS target_tokens
      FROM counts
    ), rates AS (
      SELECT lang, total_tokens, target_tokens,
             target_tokens // total_tokens AS n_full_epochs,
             ((target_tokens % total_tokens) * 1000000) // total_tokens
               AS frac_ppm
      FROM plan
    ), frac_kept AS (
      SELECT d.lang, CAST(sum(d.n_tokens) AS BIGINT) AS frac_tokens
      FROM per_doc d JOIN rates r ON d.lang = r.lang
      WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT
              % 1000000 < r.frac_ppm
      GROUP BY d.lang
    )
    SELECT r.lang, r.total_tokens, r.target_tokens, r.n_full_epochs,
           r.frac_ppm,
           r.n_full_epochs * r.total_tokens + coalesce(f.frac_tokens, 0)
             AS sampled_tokens
    FROM rates r LEFT JOIN frac_kept f ON r.lang = f.lang
    """,
)
def sample_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mixture sampling — the data-mixing step real
    pretraining pipelines run: give every language domain an equal
    share of a corpus-level TOKEN budget (half the corpus here), then
    realize each domain's quota as ``n_full_epochs`` complete passes
    plus a deterministic fractional hash pass (small domains upsample
    via epochs > 1, large domains downsample via epochs = 0 + a
    fractional rate). Counts tokens, not documents — what the training
    run actually consumes.

    Everything is exact integer arithmetic (integer div, parts-per-
    million fractional rates), so the oracle replays it bit-for-bit.
    Scale shape: one token-count scan + a domains-sized plan frame
    (window over a handful of rows) broadcast back for the fractional
    membership test; the corpus never shuffles."""
    from mercurygate_spark.functions import tokens

    t = load_tables(spark, sf_dir, "documents")
    per_doc = t["documents"].select(
        "doc_id", "lang", F.size(tokens("text")).alias("n_tokens")
    )
    counts = per_doc.groupBy("lang").agg(
        F.sum("n_tokens").alias("total_tokens")
    )
    rates = (
        counts.withColumn(
            "target_tokens",
            F.expr(
                "(sum(total_tokens) over () div 2) div (count(*) over ())"
            ),
        )
        .withColumn("n_full_epochs", F.expr("target_tokens div total_tokens"))
        .withColumn(
            "frac_ppm",
            F.expr("((target_tokens % total_tokens) * 1000000) div total_tokens"),
        )
    )
    frac_kept = (
        per_doc.join(F.broadcast(rates.select("lang", "frac_ppm")), "lang")
        .where(
            (md5_long(F.col("doc_id").cast("string")) % 1000000)
            < F.col("frac_ppm")
        )
        .groupBy("lang")
        .agg(F.sum("n_tokens").alias("frac_tokens"))
    )
    return rates.join(frac_kept, "lang", "left").select(
        "lang",
        "total_tokens",
        "target_tokens",
        "n_full_epochs",
        "frac_ppm",
        (
            F.col("n_full_epochs") * F.col("total_tokens")
            + F.coalesce(F.col("frac_tokens"), F.lit(0))
        ).alias("sampled_tokens"),
    )


# Poisson(1) inverse CDF on a [0, 1e6) integer grid: cumulative
# probabilities e^-1 * sum(1/k!) scaled by 1e6 and truncated — integer
# thresholds so both engines compare exactly, no float CDF anywhere.
_POIS1_CUM = (367879, 735758, 919698, 981011, 996340, 999405, 999916, 999989)
_BOOT_R = 16  # bootstrap replicates


def _pois_case_sql(u: str) -> str:
    branches = " ".join(
        f"WHEN {u} < {c} THEN {k}" for k, c in enumerate(_POIS1_CUM)
    )
    return f"CASE {branches} ELSE 8 END"


@query(
    "sample_poisson_bootstrap",
    oracle=f"""
    WITH expanded AS (
      SELECT l_orderkey, l_linenumber, l_extendedprice,
             unnest(range({_BOOT_R})) AS r
      FROM lineitem
    ), weighted AS (
      SELECT r, l_extendedprice,
             {_pois_case_sql("('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR) || '|' || CAST(r AS VARCHAR)), 1, 15))::BIGINT % 1000000")} AS w
      FROM expanded
    )
    SELECT CAST(r AS INT) AS replicate,
           CAST(sum(w) AS BIGINT) AS resampled_rows,
           round(sum(w * l_extendedprice), 2) AS resampled_revenue
    FROM weighted GROUP BY r
    """,
)
def sample_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE-PASS Poisson bootstrap: {_BOOT_R} resampled revenue totals
    computed without ever materializing a resample. Classic bootstrap
    draws n rows with replacement per replicate — unrunnable at 100 TB
    (it's R full shuffles); the Poisson approximation gives each row
    an independent Poisson(1) multiplicity per replicate, so ALL
    replicates stream out of one scan as a map-side explode(R) +
    grouped sum, shuffling exactly R pre-aggregated rows per
    partition. Weights come from md5(row-key | replicate) through an
    integer-thresholded inverse CDF (no float comparisons), so the
    'random' multiplicities are bit-reproducible on any engine, any
    partitioning, any run — the oracle replays them exactly. The R
    replicate totals are the bootstrap distribution; downstream, their
    spread IS the standard error of total revenue."""
    t = load_tables(spark, sf_dir, "lineitem")
    u = md5_long(
        F.concat_ws(
            "|",
            F.col("l_orderkey").cast("string"),
            F.col("l_linenumber").cast("string"),
            F.col("r").cast("string"),
        )
    ) % 1000000
    w = F.lit(8)
    for k in range(len(_POIS1_CUM) - 1, -1, -1):
        w = F.when(u < _POIS1_CUM[k], k).otherwise(w)
    return (
        t["lineitem"]
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_extendedprice",
            F.explode(F.sequence(F.lit(0), F.lit(_BOOT_R - 1))).alias("r"),
        )
        .withColumn("w", w)
        .groupBy(F.col("r").cast("int").alias("replicate"))
        .agg(
            F.sum("w").cast("long").alias("resampled_rows"),
            r2(F.sum(F.col("w") * F.col("l_extendedprice"))).alias(
                "resampled_revenue"
            ),
        )
    )


@query(
    "sample_group_split",
    oracle="""
    WITH u AS (
      SELECT user_id,
             CASE
               WHEN ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
                    % 10 < 8 THEN 'train'
               WHEN ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
                    % 10 = 8 THEN 'val'
               ELSE 'test'
             END AS split
      FROM (SELECT DISTINCT user_id FROM events) d
    )
    SELECT u.split,
           count(DISTINCT e.user_id) AS n_users,
           count(*) AS n_events
    FROM events e JOIN u USING (user_id)
    GROUP BY u.split
    """,
)
def sample_group_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP-level train/val/test split — the leakage-safe variant of
    split_train_val_test: the hash is taken on the GROUP key (user),
    so every row of a user lands in the same split and no user's
    behavior leaks from train into eval (row-level splitting of
    grouped data is the classic evaluation-inflation bug). Same
    md5-bucket assignment as the whole sampling family
    (re-shard-stable, engine-independent); the split table is
    user-sized and broadcasts onto the event scan."""
    t = load_tables(spark, sf_dir, "events")
    bucket = md5_long(F.col("user_id").cast("string")) % 10
    u = (
        t["events"]
        .select("user_id")
        .distinct()
        .select(
            "user_id",
            F.when(bucket < 8, "train")
            .when(bucket == 8, "val")
            .otherwise("test")
            .alias("split"),
        )
    )
    return (
        t["events"]
        .join(F.broadcast(u), "user_id")
        .groupBy("split")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count("*").alias("n_events"),
        )
    )


SAMPLE_TEMP_ALPHA = 0.7  # temperature exponent (XLM-style rebalancing)


@query(
    "sample_temperature_mixture",
    oracle=f"""
    WITH c AS (
      SELECT lang, count(*) AS n FROM documents GROUP BY lang
    ), q AS (
      SELECT lang, n,
             pow(n * 1.0 / (sum(n) OVER ()), {SAMPLE_TEMP_ALPHA}) AS qraw,
             sum(n) OVER () AS total
      FROM c
    ), r AS (
      SELECT lang, n, total,
             round(least(1.0,
               floor(qraw / (sum(qraw) OVER ()) * total / 2) / n), 6) AS rate
      FROM q
    )
    SELECT d.lang, any_value(r.n) AS n_docs, any_value(r.rate) AS rate,
           CAST(count_if(
             ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT
               % 1000000
             < CAST(floor(r.rate * 1000000 + 0.5) AS BIGINT)
           ) AS BIGINT) AS n_kept
    FROM documents d JOIN r USING (lang)
    GROUP BY d.lang
    """,
)
def sample_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based mixture sampling — the multilingual
    rebalancing formula (XLM / mT5 style): sampling weight ∝ p_lang^α
    with α={SAMPLE_TEMP_ALPHA}, which up-samples tail languages and
    down-samples the head WITHOUT flattening to uniform
    (sample_mixture_rebalance's equalize-to-smallest is the α→0
    limit; α=1 is natural frequency). Per-lang keep rates derive from
    the 5-row count frame (window-over-() on a bounded frame),
    membership is the family's md5 integer threshold — rate r6-
    rounded on both sides BEFORE thresholding so the transcendental
    pow's last-ulp engine difference cannot move the cut. One scan +
    a broadcast of 5 rates; nothing about the corpus reshuffles."""
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir, "documents")
    w = Window.partitionBy()
    c = t["documents"].groupBy("lang").agg(F.count("*").alias("n"))
    q = c.select(
        "lang",
        "n",
        F.pow(F.col("n") / F.sum("n").over(w), SAMPLE_TEMP_ALPHA).alias("qraw"),
        F.sum("n").over(w).alias("total"),
    )
    r = q.select(
        "lang",
        "n",
        r6(
            F.least(
                F.lit(1.0),
                F.floor(
                    F.col("qraw") / F.sum("qraw").over(w) * F.col("total") / 2
                )
                / F.col("n"),
            )
        ).alias("rate"),
    )
    d = t["documents"].join(F.broadcast(r), "lang")
    threshold = F.floor(F.col("rate") * 1000000 + F.lit(0.5)).cast("long")
    return d.groupBy("lang").agg(
        F.any_value("n").alias("n_docs"),
        F.any_value("rate").alias("rate"),
        F.count_if(
            md5_long(F.col("doc_id").cast("string")) % 1000000 < threshold
        ).alias("n_kept"),
    )


NEG_K = 2  # negatives per anchor
NEG_ANCHOR_PCT = 5  # anchors = this % of the 'en' partition, by id hash

_MD5L = "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT"


@query(
    "sample_negative_sampling",
    oracle=f"""
    WITH pool AS (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
               - 1 AS rnk
      FROM documents WHERE lang <> 'en'
    ),
    cnt AS (
      SELECT lang, count(*) AS c,
             row_number() OVER (ORDER BY lang) - 1 AS li
      FROM pool GROUP BY lang
    ),
    nl AS (SELECT count(*) AS n_langs FROM cnt),
    anch AS (
      SELECT doc_id AS anchor_id, {_MD5L} AS h
      FROM documents
      WHERE lang = 'en' AND {_MD5L} % 100 < {NEG_ANCHOR_PCT}
    ),
    cand AS (
      SELECT a.anchor_id, t.i, (a.h + t.i) % nl.n_langs AS pick_li
      FROM anch a
      CROSS JOIN (SELECT unnest({list(range(NEG_K))}) AS i) t
      CROSS JOIN nl
    ),
    pick AS (
      SELECT c2.anchor_id, c2.i, k.lang,
             ('0x' || substr(md5(CAST(c2.anchor_id AS VARCHAR) || ':'
                                 || CAST(c2.i AS VARCHAR)), 1, 15))::BIGINT
               % k.c AS rnk
      FROM cand c2 JOIN cnt k ON k.li = c2.pick_li
    )
    SELECT p.anchor_id, p.i, pool.doc_id AS neg_doc_id, pool.lang AS neg_lang
    FROM pick p JOIN pool ON pool.lang = p.lang AND pool.rnk = p.rnk
    """,
)
def sample_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for contrastive training pairs:
    each anchor ('en' document, ~5% by id hash) draws NEG_K negatives
    from the other-language pool, with BOTH the pool language and the
    within-language rank chosen by content hashes — reproducible on
    any engine, any partitioning, no RNG state.

    The scale shape is the point: the pool is ranked WITHIN each
    language partition (never a global row_number — the pack_sequences
    sharding doctrine), the per-language counts and the language index
    are a broadcast-size frame, and each (anchor, i) resolves its
    negative through two equi-joins — (lang-index) then
    (lang, rank) — so no anchor ever scans the pool. The only
    nested-loop surface is the 1-row n_langs frame broadcast onto the
    anchors (bounded by construction, exempt-listed)."""
    d = load_tables(spark, sf_dir, "documents")["documents"]
    from mercurygate_spark.functions import md5_hex

    pool_w = Window.partitionBy("lang").orderBy(
        md5_hex(F.col("doc_id")), F.col("doc_id")
    )
    pool = d.where(F.col("lang") != "en").select(
        "doc_id", "lang", (F.row_number().over(pool_w) - 1).alias("rnk")
    )
    cnt = (
        pool.groupBy("lang")
        .agg(F.count("*").alias("c"))
        .select(
            "lang",
            "c",
            (F.row_number().over(Window.orderBy("lang")) - 1).alias("li"),
        )
    )
    nl = cnt.agg(F.count("*").alias("n_langs"))
    anch = d.where(
        (F.col("lang") == "en") & (hash_bucket(F.col("doc_id")) < NEG_ANCHOR_PCT)
    ).select(F.col("doc_id").alias("anchor_id"), md5_long(F.col("doc_id")).alias("h"))
    cand = (
        anch.select("*", F.explode(F.sequence(F.lit(0), F.lit(NEG_K - 1))).alias("i"))
        .crossJoin(F.broadcast(nl))
        .select(
            "anchor_id",
            "i",
            ((F.col("h") + F.col("i")) % F.col("n_langs")).alias("pick_li"),
        )
    )
    pick = cand.join(F.broadcast(cnt), F.col("li") == F.col("pick_li")).select(
        "anchor_id",
        "i",
        "lang",
        (
            md5_long(
                F.concat(
                    F.col("anchor_id").cast("string"),
                    F.lit(":"),
                    F.col("i").cast("string"),
                )
            )
            % F.col("c")
        ).alias("rnk"),
    )
    return pick.join(pool, ["lang", "rnk"]).select(
        "anchor_id",
        "i",
        F.col("doc_id").alias("neg_doc_id"),
        F.col("lang").alias("neg_lang"),
    )


# ---------------------------------------------------------------------------
# DSIR — Data Selection via Importance Resampling (Xie et al. 2023).
# Hashed-bigram bag features; importance weight = target-domain prob /
# raw-corpus prob per hashed bucket; deterministic Gumbel-top-k resample.
# ---------------------------------------------------------------------------

DSIR_BUCKETS = 128     # hashed n-gram feature space (the paper uses 10k)
DSIR_ADD_K = 0.5       # add-k smoothing over the bucket distribution
DSIR_TARGET_LANG = "en"  # target domain: labeled-en docs
DSIR_TOPN = 50         # resample size

_DUCK_DSIR_BUCKET = (
    "('0x' || substr(md5(w1 || ' ' || w2), 1, 15))::BIGINT % " + str(DSIR_BUCKETS)
)


@query(
    "sample_dsir",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id, lang,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         t -> t <> '') AS tk
      FROM documents
    ),
    bg AS (
      SELECT doc_id, lang, {_DUCK_DSIR_BUCKET} AS bucket
      FROM (
        SELECT doc_id, lang, tk[i] AS w1, tk[i+1] AS w2
        FROM tk, UNNEST(range(1, len(tk))) AS t(i)
        WHERE len(tk) >= 2
      )
    ),
    raw_cnt AS (SELECT bucket, count(*) AS c_r FROM bg GROUP BY 1),
    tgt_cnt AS (
      SELECT bucket, count(*) AS c_t FROM bg
      WHERE lang = '{DSIR_TARGET_LANG}' GROUP BY 1
    ),
    tots AS (
      SELECT count(*) AS n_r,
             count(*) FILTER (lang = '{DSIR_TARGET_LANG}') AS n_t
      FROM bg
    ),
    ratio AS (
      SELECT r.bucket,
             ln((COALESCE(t.c_t, 0) + {DSIR_ADD_K})
                / (tots.n_t + {DSIR_ADD_K} * {DSIR_BUCKETS}))
             - ln((r.c_r + {DSIR_ADD_K})
                  / (tots.n_r + {DSIR_ADD_K} * {DSIR_BUCKETS})) AS log_ratio
      FROM raw_cnt r LEFT JOIN tgt_cnt t USING (bucket) CROSS JOIN tots
    ),
    weighted AS (
      SELECT bg.doc_id, bg.lang,
             count(*) AS n_feats,
             round(sum(ratio.log_ratio), 6) AS log_w
      FROM bg JOIN ratio USING (bucket)
      GROUP BY 1, 2
    ),
    gumbel AS (
      SELECT *,
             round(log_w - ln(-ln(
               (('0x' || substr(md5('dsir:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                % 1000000 + 0.5) / 1000000.0
             )), 6) AS score
      FROM weighted
    )
    SELECT doc_id, lang, n_feats, log_w, score
    FROM gumbel
    ORDER BY score DESC, doc_id LIMIT {DSIR_TOPN}
    """,
)
def sample_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance resampling (Xie et al. 2023): select raw-corpus
    docs whose hashed-bigram feature distribution looks like the target
    domain (labeled-{DSIR_TARGET_LANG}). Per-doc log importance weight
    sums ln(p_target(b)/p_raw(b)) over the doc's hashed bigram
    occurrences (add-k smoothed over {DSIR_BUCKETS} buckets); sampling
    is Gumbel-top-k made deterministic by driving the Gumbel noise from
    md5(doc_id) — content-derived like every sampler in this module, so
    the selected set is reproducible on any engine and any partitioning.

    Scale shape: one tokenize pass feeds the bucket explode; bucket
    counts are two partially-aggregable groupBys; the bucket→log-ratio
    table is {DSIR_BUCKETS} rows and BROADCASTS to the per-occurrence
    join (the only corpus-sized shuffle is the per-doc reduce on
    doc_id); top-{DSIR_TOPN} rides TakeOrderedAndProject on the
    r6-rounded score (the PMI ranking doctrine)."""
    from mercurygate_spark.functions import let1, tokens
    from mercurygate_spark.queries.text import adjacent_pairs

    t = load_tables(spark, sf_dir, "documents")
    tk = t["documents"].select(
        "doc_id", "lang", let1(tokens("text"), lambda x: x).alias("tk")
    )
    bg = tk.select(
        "doc_id",
        "lang",
        F.explode(let1(F.col("tk"), adjacent_pairs)).alias("pr"),
    ).select(
        "doc_id",
        "lang",
        (
            md5_long(F.concat_ws(" ", F.col("pr.w1"), F.col("pr.w2")))
            % DSIR_BUCKETS
        ).alias("bucket"),
    )
    raw_cnt = bg.groupBy("bucket").agg(F.count("*").alias("c_r"))
    tgt_cnt = (
        bg.where(F.col("lang") == DSIR_TARGET_LANG)
        .groupBy("bucket")
        .agg(F.count("*").alias("c_t"))
    )
    tots = bg.agg(
        F.count("*").alias("n_r"),
        F.count(F.when(F.col("lang") == DSIR_TARGET_LANG, 1)).alias("n_t"),
    )
    k, b = F.lit(DSIR_ADD_K), F.lit(DSIR_BUCKETS)
    ratio = (
        raw_cnt.join(tgt_cnt, "bucket", "left")
        .crossJoin(F.broadcast(tots))
        .select(
            "bucket",
            (
                F.log((F.coalesce(F.col("c_t"), F.lit(0)) + k) / (F.col("n_t") + k * b))
                - F.log((F.col("c_r") + k) / (F.col("n_r") + k * b))
            ).alias("log_ratio"),
        )
    )
    weighted = (
        bg.join(F.broadcast(ratio), "bucket")
        .groupBy("doc_id", "lang")
        .agg(
            F.count("*").alias("n_feats"),
            r6(F.sum("log_ratio")).alias("log_w"),
        )
    )
    u = (
        md5_long(F.concat(F.lit("dsir:"), F.col("doc_id").cast("string")))
        % 1000000
        + F.lit(0.5)
    ) / F.lit(1000000.0)
    gumbel = weighted.select(
        "doc_id",
        "lang",
        "n_feats",
        "log_w",
        r6(F.col("log_w") - F.log(-F.log(u))).alias("score"),
    )
    return (
        gumbel.orderBy(F.col("score").desc(), "doc_id")
        .limit(DSIR_TOPN)
        .select("doc_id", "lang", "n_feats", "log_w", "score")
    )


# ---------------------------------------------------------------------------
# Epoch schedule materialization (round 12 frontier): sample_token_budget
# computes the PLAN (per-domain epoch counts + fractional rate); this
# key materializes it into the per-document training MANIFEST — the
# (doc, epoch) list a data loader actually iterates, with small
# domains repeated across epochs and large domains carrying only their
# fractional-hash slice (the Llama/DoReMi data-recipe realization).
# ---------------------------------------------------------------------------


@query(
    "sample_epoch_schedule",
    oracle="""
    WITH per_doc AS (
      SELECT doc_id, lang,
             len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                             t -> t <> '')) AS n_tokens
      FROM documents
    ), counts AS (
      SELECT lang, CAST(sum(n_tokens) AS BIGINT) AS total_tokens
      FROM per_doc GROUP BY lang
    ), plan AS (
      SELECT lang, total_tokens,
             (CAST(sum(total_tokens) OVER () AS BIGINT) // 2)
               // CAST(count(*) OVER () AS BIGINT) AS target_tokens
      FROM counts
    ), rates AS (
      SELECT lang,
             target_tokens // total_tokens AS n_full_epochs,
             ((target_tokens % total_tokens) * 1000000) // total_tokens
               AS frac_ppm
      FROM plan
    ), reps AS (
      SELECT d.doc_id, d.lang, d.n_tokens,
             r.n_full_epochs
               + CASE WHEN ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT
                           % 1000000 < r.frac_ppm
                      THEN 1 ELSE 0 END AS n_rep
      FROM per_doc d JOIN rates r USING (lang)
    )
    SELECT doc_id, lang, CAST(e AS BIGINT) AS epoch_idx,
           CAST(n_tokens AS BIGINT) AS n_tokens
    FROM reps, UNNEST(range(0, n_rep)) AS u(e)
    WHERE n_rep > 0
    """,
)
def sample_epoch_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize the token-budget plan into the per-document epoch
    manifest: every document appears once per full epoch of its domain
    plus once more if its md5 lands inside the domain's fractional
    parts-per-million rate — sample_token_budget's integer arithmetic,
    replayed per document and EXPLODED into (doc, epoch) rows. This is
    the frame a training loader shuffles and packs; upsampled domains
    carry epoch_idx > 0 replicas, downsampled domains only their
    deterministic hash slice.

    Scale shape: one token-count scan, a domains-sized plan frame
    broadcast back, and a map-side sequence-explode whose fan-out IS
    the intended data recipe (total output rows = the token budget's
    document realization — there is no way to materialize a manifest
    smaller than itself). Nothing corpus-sized shuffles; the corpus is
    scanned exactly once."""
    from mercurygate_spark.functions import tokens

    t = load_tables(spark, sf_dir, "documents")
    per_doc = t["documents"].select(
        "doc_id", "lang", F.size(tokens("text")).alias("n_tokens")
    )
    counts = per_doc.groupBy("lang").agg(F.sum("n_tokens").alias("total_tokens"))
    rates = (
        counts.withColumn(
            "target_tokens",
            F.expr("(sum(total_tokens) over () div 2) div (count(*) over ())"),
        )
        .withColumn("n_full_epochs", F.expr("target_tokens div total_tokens"))
        .withColumn(
            "frac_ppm",
            F.expr("((target_tokens % total_tokens) * 1000000) div total_tokens"),
        )
        .select("lang", "n_full_epochs", "frac_ppm")
    )
    reps = per_doc.join(F.broadcast(rates), "lang").withColumn(
        "n_rep",
        F.col("n_full_epochs")
        + (
            (md5_long(F.col("doc_id").cast("string")) % 1000000)
            < F.col("frac_ppm")
        ).cast("long"),
    )
    return (
        reps.where(F.col("n_rep") > 0)
        .select(
            "doc_id",
            "lang",
            F.explode(F.sequence(F.lit(0), F.col("n_rep") - 1)).alias("epoch_idx"),
            F.col("n_tokens").cast("long").alias("n_tokens"),
        )
        .select(
            "doc_id", "lang", F.col("epoch_idx").cast("long").alias("epoch_idx"),
            "n_tokens",
        )
    )
