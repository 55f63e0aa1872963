"""Deduplication queries over the documents/embeddings tables
(north-star surface): exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup. Every one has a full DuckDB oracle — the
hashes are md5-derived specifically so the oracle can replay them
(operators.dedup docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mercurygate_spark.functions import r6
from mercurygate_spark.operators.dedup import (
    connected_components,
    duck_connected_components_sql,
    duck_incremental_append_sql,
    duck_incremental_dedup_sql,
    duck_lsh_star_edges_sql,
    duck_minhash_pairs_sql,
    duck_shingles_sql,
    duck_simhash_sql,
    minhash_candidate_pairs,
    ngram_jaccard_pairs,
    simhash,
)
from mercurygate_spark.queries.registry import load_tables, query


@query(
    "dedup_exact",
    oracle="""
    WITH fp AS (
      SELECT doc_id,
             md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
      FROM documents
    )
    SELECT fp, count(*) AS n_docs, min(doc_id) AS keeper_doc
    FROM fp GROUP BY fp HAVING count(*) > 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on the normalized-text fingerprint;
    groups >1 are duplicate clusters, keeper = min doc_id. At 100 TB
    this is one shuffle of (16-byte hash, id) pairs — the canonical
    first dedup pass."""
    from mercurygate_spark.operators.text import fingerprint

    t = load_tables(spark, sf_dir, "documents")
    return (
        t["documents"]
        .select(fingerprint("text").alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("keeper_doc"))
        .where(F.col("n_docs") > 1)
    )


@query("dedup_minhash_lsh", oracle=duck_minhash_pairs_sql())
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH banding near-dup candidates: word-trigram
    shingles → 16 md5-affine minhashes → 4 bands → bucket-join.
    The oracle replays the identical pipeline in SQL (generated from
    the same HASH_PARAMS constants)."""
    t = load_tables(spark, sf_dir, "documents")
    return minhash_candidate_pairs(t["documents"], "doc_id")


@query("dedup_lsh_star_edges", oracle=duck_lsh_star_edges_sql())
def dedup_lsh_star_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe LSH candidates: per band bucket, star edges from the
    bucket-min doc instead of all pairs — the duplicate-FAMILY
    mitigation (a family holding 10% of a 100 TB corpus makes
    all-pairs generation quadratic in family size; star edges stay
    linear and give connected_components identical clusters — see
    operators.dedup.lsh_star_edges and scripts/dedup_skew_probe.py)."""
    from mercurygate_spark.operators.dedup import lsh_star_edges

    t = load_tables(spark, sf_dir, "documents")
    return lsh_star_edges(t["documents"], "doc_id")


def _band_bucket_key():
    """Single combined bucket key for the band index: joining on ONE
    key lets the bucketed side's HashPartitioning(bk, 8) satisfy the
    join's distribution outright ('#' can't appear in an md5 hex
    digest, so this is bijective with (band_idx, band_key))."""
    return F.concat_ws("#", F.col("band_idx").cast("string"), F.col("band_key"))


def _build_band_index(spark: SparkSession, corpus: DataFrame, table_name: str):
    """Persist the corpus's LSH band table as a catalog table bucketed
    by the bucket key — the one-time 'first load' that every future
    batch (or micro-batch) probes without rescanning the corpus."""
    from mercurygate_spark.io.bucketing import write_bucketed
    from mercurygate_spark.io.tmp_tables import register_tmp_table
    from mercurygate_spark.operators.dedup import lsh_bands, minhash_signature_arrow

    index_bands = lsh_bands(
        minhash_signature_arrow(corpus, "doc_id"), "doc_id"
    ).select(F.col("doc_id").alias("match_id"), _band_bucket_key().alias("bk"))
    write_bucketed(index_bands, table_name, "bk", 8, sort_by="bk")
    register_tmp_table(spark, table_name)
    return spark.table(table_name)


def _best_index_match(cand: DataFrame) -> DataFrame:
    """(new_id, match_id, shared) candidate counts → per new doc the
    best corpus match (max shared bands, tie → min corpus id) plus
    the candidate count."""
    return cand.groupBy("new_id").agg(
        F.min_by(
            "match_id",
            F.struct(
                (-F.col("shared")).alias("neg_shared"),
                F.col("match_id").alias("id"),
            ),
        ).alias("match_id"),
        F.max("shared").alias("shared_bands"),
        F.count("*").alias("n_candidates"),
    )


@query("dedup_incremental_index", oracle=duck_incremental_dedup_sql())
def dedup_incremental_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental cross-batch dedup against a PERSISTED minhash band
    index — the continuous-ingestion pattern a 100 TB pipeline needs
    (each new batch dedups against the accumulated corpus WITHOUT
    rescanning it; the reference's first-load-vs-refresh routing,
    mm_source_to_bronze.py:156-167, transposed to dedup):

    1. index build (the "first load"): the corpus's LSH band table is
       written ONCE as a catalog table bucketed by the band bucket key
       — at 100 TB this happens at ingest time and is amortized over
       every future batch;
    2. probe (every "refresh"): the new batch's bands (tiny relative
       to the corpus) equi-join the index on the bucket key. Because
       the index is bucketed on exactly that key, its side of the
       sort-merge join needs NO Exchange — only the new batch
       shuffles, so probe cost scales with batch size, never corpus
       size (plan pinned in tests/test_plans.py).

    Output: per new doc with ≥1 candidate, the best corpus match
    (max shared bands, tie → min corpus id) + candidate count. The
    oracle replays both halves of the deterministic doc_id%5 split
    end-to-end, so index persistence must be value-invisible."""
    import os as _os

    from mercurygate_spark.operators.dedup import (
        INCR_SPLIT_MOD,
        lsh_bands,
        minhash_signature_arrow,
    )

    t = load_tables(spark, sf_dir, "documents")
    docs = t["documents"]
    corpus = docs.where(F.col("doc_id") % INCR_SPLIT_MOD != 0)
    batch = docs.where(F.col("doc_id") % INCR_SPLIT_MOD == 0)
    # per-PID table name: driver may run correctness+bench in parallel
    idx = _build_band_index(spark, corpus, f"mg_dedup_band_index_{_os.getpid()}")
    probe = lsh_bands(minhash_signature_arrow(batch, "doc_id"), "doc_id").select(
        F.col("doc_id").alias("new_id"), _band_bucket_key().alias("bk")
    )
    cand = (
        probe.join(idx, "bk")
        .groupBy("new_id", "match_id")
        .agg(F.count("*").alias("shared"))
    )
    return _best_index_match(cand)


@query("dedup_incremental_append", oracle=duck_incremental_append_sql())
def dedup_incremental_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL continuous-ingestion dedup loop — probe, then GROW the
    index, then probe again: batch 1 (doc_id%5=4) dedups against the
    corpus index (%5 in 1..3); batch 1's own band signatures are then
    APPENDED to the bucketed index table (same bucket spec, so the
    layout contract survives the append — at 100 TB this is the
    nightly index maintenance step, costing one batch-sized bucketed
    write, never a corpus rewrite); batch 2 (%5=0) dedups against the
    GROWN index, so its matches can hit batch-1 docs. Output: per
    probed doc the best match + candidate count, tagged by batch.
    The oracle replays all three splits and the union'd second index
    in SQL — index persistence AND append must be value-invisible."""
    import os as _os

    from mercurygate_spark.io.bucketing import write_bucketed
    from mercurygate_spark.operators.dedup import (
        INCR_SPLIT_MOD as M,
    )
    from mercurygate_spark.operators.dedup import (
        lsh_bands,
        minhash_signature_arrow,
    )

    t = load_tables(spark, sf_dir, "documents")
    docs = t["documents"]
    corpus = docs.where(~(F.col("doc_id") % M).isin(0, M - 1))
    b1 = docs.where(F.col("doc_id") % M == M - 1)
    b2 = docs.where(F.col("doc_id") % M == 0)
    idx_name = f"mg_dedup_band_index_append_{_os.getpid()}"
    # fresh run each call: the oracle replays from scratch
    spark.sql(f"DROP TABLE IF EXISTS {idx_name}")
    idx = _build_band_index(spark, corpus, idx_name)

    def bands_of(df, alias):
        return lsh_bands(minhash_signature_arrow(df, "doc_id"), "doc_id").select(
            F.col("doc_id").alias(alias), _band_bucket_key().alias("bk")
        )

    def probe(bands, batch_no):
        cand = (
            bands.join(idx, "bk")
            .groupBy("new_id", "match_id")
            .agg(F.count("*").alias("shared"))
        )
        return _best_index_match(cand).select(
            F.lit(batch_no).cast("int").alias("batch_no"), "*"
        )

    b1_bands = bands_of(b1, "new_id").localCheckpoint(eager=True)
    out1 = probe(b1_bands, 1).localCheckpoint(eager=True)
    # index maintenance: append batch-1's bands with the SAME bucket
    # spec — the table stays bucketed-by-bk, so future probes keep the
    # exchange-free layout
    write_bucketed(
        b1_bands.select(F.col("new_id").alias("match_id"), "bk"),
        idx_name,
        "bk",
        8,
        sort_by="bk",
        mode="append",
    )
    idx = spark.table(idx_name)
    out2 = probe(bands_of(b2, "new_id"), 2)
    return out1.unionByName(out2)


@query(
    "dedup_index_compact",
    oracle=(
        "SELECT new_id, match_id, shared_bands, n_candidates FROM ("
        + duck_incremental_append_sql()
        + ") WHERE batch_no = 2"
    ),
)
def dedup_index_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index MAINTENANCE for the continuous-dedup pipeline: after the
    corpus index has been grown by an append (dedup_incremental_append's
    nightly step), the bucketed band table is COMPACTED —
    io.bucketing.compact_bucketed rewrites it to one file per bucket
    under the SAME bucket spec — and only then probed by the next
    batch. Appends keep probes exchange-free but add a file per
    (writer task, bucket) forever; compaction bounds scan I/O and file
    handles without ever rewriting more than the index (never the
    corpus). Output = batch 2's best matches against the compacted
    grown index; the oracle replays the append flow WITHOUT any
    compaction, so the rewrite must be value-invisible, and the plan
    contract (still `Bucketed: true`, no index-side Exchange, ≤
    n_buckets files) is pinned in tests/test_plans.py."""
    import os as _os

    from mercurygate_spark.io.bucketing import compact_bucketed, write_bucketed
    from mercurygate_spark.operators.dedup import (
        INCR_SPLIT_MOD as M,
    )
    from mercurygate_spark.operators.dedup import (
        lsh_bands,
        minhash_signature_arrow,
    )

    t = load_tables(spark, sf_dir, "documents")
    docs = t["documents"]
    corpus = docs.where(~(F.col("doc_id") % M).isin(0, M - 1))
    b1 = docs.where(F.col("doc_id") % M == M - 1)
    b2 = docs.where(F.col("doc_id") % M == 0)
    idx_name = f"mg_dedup_band_index_compact_{_os.getpid()}"
    spark.sql(f"DROP TABLE IF EXISTS {idx_name}")
    _build_band_index(spark, corpus, idx_name)

    def bands_of(df):
        return lsh_bands(minhash_signature_arrow(df, "doc_id"), "doc_id").select(
            F.col("doc_id").alias("new_id"), _band_bucket_key().alias("bk")
        )

    # nightly append, then the maintenance rewrite
    write_bucketed(
        bands_of(b1).select(F.col("new_id").alias("match_id"), "bk"),
        idx_name,
        "bk",
        8,
        sort_by="bk",
        mode="append",
    )
    compact_bucketed(spark, idx_name, "bk", 8, sort_by="bk")
    idx = spark.table(idx_name)
    cand = (
        bands_of(b2).join(idx, "bk")
        .groupBy("new_id", "match_id")
        .agg(F.count("*").alias("shared"))
    )
    return _best_index_match(cand)


@query("stream_incremental_dedup", oracle=duck_incremental_dedup_sql())
def stream_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dedup_incremental_index's STREAMING twin — the shape a real
    continuous-ingestion pipeline runs: the corpus band index is the
    same persisted bucketed table, and the new batch arrives as a
    STREAM (parquet file source, availableNow) whose micro-batches are
    minhashed (Arrow mapInPandas on the stream), stream-static-joined
    against the index (no join state, no watermark — the static side
    is re-planned per micro-batch, so an index refresh is picked up at
    the next batch), and candidate-counted in one streaming
    aggregation (complete mode). The final per-doc best-match
    selection runs batch-side on the bounded sink output — Spark
    permits one aggregation per stream, and the candidate-count frame
    IS bounded (≤ batch × bands rows). Oracle: identical to the batch
    twin — streaming must be value-invisible."""
    import os as _os
    import tempfile as _tf

    from mercurygate_spark.operators.dedup import (
        INCR_SPLIT_MOD,
        lsh_bands,
        minhash_signature_arrow,
    )
    from mercurygate_spark.streaming.windows import run_to_memory

    t = load_tables(spark, sf_dir, "documents")
    docs = t["documents"]
    corpus = docs.where(F.col("doc_id") % INCR_SPLIT_MOD != 0)
    idx = _build_band_index(
        spark, corpus, f"mg_dedup_band_index_stream_{_os.getpid()}"
    )

    # documents.parquet as a stream directory (symlink, no copy)
    from mercurygate_spark.io.tmp_tables import register_tmp_dir

    d = _os.path.join(
        _tf.gettempdir(),
        f"mercurygate_stream_docs_{_os.getpid()}",
        sf_dir.strip("/").replace("/", "_"),
    )
    _os.makedirs(d, exist_ok=True)
    register_tmp_dir(_os.path.dirname(d))
    from mercurygate_spark.streaming.windows import link_parquet_into_dir

    link_parquet_into_dir(d, f"{sf_dir}/documents.parquet", "documents.parquet")
    stream_docs = (
        spark.readStream.schema(docs.schema)
        .parquet(d)
        .where(F.col("doc_id") % INCR_SPLIT_MOD == 0)
    )
    probe = lsh_bands(minhash_signature_arrow(stream_docs, "doc_id"), "doc_id").select(
        F.col("doc_id").alias("new_id"), _band_bucket_key().alias("bk")
    )
    cand = (
        probe.join(idx, "bk")
        .groupBy("new_id", "match_id")
        .agg(F.count("*").alias("shared"))
    )
    return _best_index_match(run_to_memory(cand, output_mode="complete"))


@query("dedup_simhash", oracle=duck_simhash_sql())
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document 32-bit SimHash fingerprint (token-count-weighted
    bit votes). Near-dup = small hamming distance; the pairing step is
    exercised in unit tests, the fingerprint itself is oracle-checked
    here."""
    t = load_tables(spark, sf_dir, "documents")
    return simhash(t["documents"], "doc_id")


@query(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, source AS bucket, {duck_shingles_sql()} AS sh FROM documents
    ), sizes AS (
      SELECT doc_id, bucket, len(sh) AS n_sh FROM sh
    ), ex AS (
      SELECT doc_id, bucket, unnest(sh) AS s FROM sh
    ), inter AS (
      SELECT a.bucket, a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
      FROM ex a JOIN ex b ON a.bucket = b.bucket AND a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3
    )
    SELECT i.id_a, i.id_b, i.n_common,
           sa.n_sh AS n_a, sb.n_sh AS n_b,
           round(i.n_common / (sa.n_sh + sb.n_sh - i.n_common), 6) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.id_a AND sa.bucket = i.bucket
    JOIN sizes sb ON sb.doc_id = i.id_b AND sb.bucket = i.bucket
    WHERE i.n_common / (sa.n_sh + sb.n_sh - i.n_common) >= 0.05
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact trigram-shingle Jaccard for pairs blocked by `source`
    (the blocking key stands in for an LSH band at scale). Join is
    shingle-equi within bucket — work ∝ shared-shingle pairs, not n²."""
    t = load_tables(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(t["documents"], "doc_id", "source", threshold=0.05)
    return pairs.select(
        "id_a", "id_b", "n_common", "n_a", "n_b", r6(F.col("jaccard")).alias("jaccard")
    )


_CANDIDATE_PAIRS_SQL = (
    f"SELECT id_a, id_b FROM ({duck_minhash_pairs_sql()}) WHERE n_shared_bands >= 2"
)


@query(
    "dedup_connected_components",
    oracle=f"""
    {duck_connected_components_sql(_CANDIDATE_PAIRS_SQL)
        .replace("SELECT node, least(node, min(r)) AS component",
                 "SELECT node AS doc_id, least(node, min(r)) AS component_id")}
    """,
)
def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive near-dup clustering: MinHash-LSH candidate pairs
    (≥2 agreeing bands) → alternating large-star/small-star connected
    components → (doc_id, component_id=min id of its cluster). This is
    the decision layer real corpus dedup needs: a~b and b~c place a, b,
    c in ONE cluster even when a~c was never a candidate pair."""
    t = load_tables(spark, sf_dir, "documents")
    pairs = minhash_candidate_pairs(t["documents"], "doc_id").where(
        F.col("n_shared_bands") >= 2
    )
    comps = connected_components(pairs)
    return comps.select(
        F.col("node").alias("doc_id"), F.col("component").alias("component_id")
    )


def _cluster_rep_quality_oracle() -> str:
    from mercurygate_spark.queries.corpus import qc_gate_chain_ctes

    final = f""", comp AS MATERIALIZED (
      SELECT node, least(node, min(r)) AS component FROM __cc_reach GROUP BY node
    ),
    {qc_gate_chain_ctes()},
    cr_jm AS MATERIALIZED (
      SELECT c.node AS doc_id, c.component AS component_id, s.score
      FROM comp c JOIN qscored s ON c.node = s.doc_id
    ),
    cr_ranked AS MATERIALIZED (
      SELECT doc_id, component_id, score,
             row_number() OVER (
               PARTITION BY component_id ORDER BY score DESC, doc_id) AS rn,
             count(*) OVER (PARTITION BY component_id) AS cluster_size,
             min(doc_id) OVER (PARTITION BY component_id) AS min_id
      FROM cr_jm
    ),
    cr_rep AS MATERIALIZED (
      SELECT component_id, doc_id AS rep_id FROM cr_ranked WHERE rn = 1
    )
    SELECT r.doc_id, r.component_id, p.rep_id,
           CAST(r.cluster_size AS BIGINT) AS cluster_size,
           (r.doc_id = p.rep_id) AS kept
    FROM cr_ranked r JOIN cr_rep p USING (component_id)
    UNION ALL
    SELECT d.doc_id, d.doc_id AS component_id, d.doc_id AS rep_id,
           CAST(1 AS BIGINT) AS cluster_size, TRUE AS kept
    FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
    WHERE c.node IS NULL
    """
    return duck_connected_components_sql(_CANDIDATE_PAIRS_SQL, final_select=final)


@query("dedup_cluster_rep_quality", oracle=_cluster_rep_quality_oracle())
def dedup_cluster_rep_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clustering with QUALITY-RANKED representatives
    (VERDICT r14 next #3): dedup_connected_components keeps each
    cluster's min-id doc — arbitrary; production keeps the BEST doc
    (LAION keeps the highest-score pair, text dedup keeps the
    longest/highest-quality member). Here the rep is the cluster
    member with the highest TRAINED quality-classifier score
    (qc_trained_scorer — the same model the corpus capstone gates on),
    ties broken toward the smaller doc_id — a pinned deterministic
    arg-max, never an engine-defined arg-pick. Output: every document
    with its cluster id, the elected rep, cluster size, and the kept
    flag (singletons keep themselves).

    Scale shape: the transitive hull is the alternating
    large-star/small-star CC (edge-bounded, log² rounds); the ONLY
    new work over the min-id key is one window pass partitioned by
    component over the EDGE-BOUNDED comp frame (nodes that appear in
    candidate pairs — never the corpus), plus the rep re-join on
    component_id, which reuses the window's own hash partitioning.
    Singletons never enter the window: they join the result through a
    corpus-side anti join with constant columns. The rep frame is
    cluster-count-bounded and cluster count grows with the corpus —
    it is deliberately NOT broadcast (the pair-cluster doctrine).

    Oracle: the recursive reachability closure, then the SAME
    arg-max — row_number over (score DESC, doc_id) inside the cluster
    frame — on the qc chain's replayed scores (r6-stable floats whose
    ordering both engines already agree on everywhere the threshold
    keys cut)."""
    from mercurygate_spark.queries.corpus import (
        _qc_feature_frame,
        qc_trained_scorer,
    )

    t = load_tables(spark, sf_dir, "documents")
    d = t["documents"]
    pairs = minhash_candidate_pairs(d, "doc_id").where(
        F.col("n_shared_bands") >= 2
    )
    # CC and classifier training are independent (CC needs only the
    # candidate pairs, training only the corpus): run the GD loop in an
    # InheritableThread while the main thread drives the star-
    # contraction rounds (guide §2.6 — identical results, the two
    # iterative chains back-fill each other's stragglers).
    from mercurygate_spark.concurrency import run_in_background

    _train_job = run_in_background(lambda: qc_trained_scorer(d), "qc-train")
    try:
        comps = connected_components(pairs).localCheckpoint(eager=True)
    except BaseException:
        _train_job.wait_quietly()  # don't leave orphaned training jobs
        raise
    _, score_col = _train_job.result()
    # Score only the CC node set: comps is edge-bounded (one row per
    # node that appears in a candidate pair — a small subset of the
    # corpus), and featurization is per-doc deterministic, so
    # filter-then-featurize ≡ featurize-then-filter while the
    # explode/groupBy pass skips every singleton (guide §2.3: filter
    # before the exchange). jm's inner join keeps the result identical.
    node_ids = comps.select(F.col("node").alias("doc_id"))
    scored = _qc_feature_frame(
        d.join(node_ids, "doc_id").select("doc_id", "text")
    ).select("doc_id", score_col())
    jm = comps.select(
        F.col("node").alias("doc_id"), F.col("component").alias("component_id")
    ).join(scored, "doc_id")
    w_rank = Window.partitionBy("component_id").orderBy(
        F.col("score").desc(), "doc_id"
    )
    w_all = Window.partitionBy("component_id")
    # materialized once: referenced twice (member rows + the rn=1 rep
    # cut) — without it Spark recomputes the scorer+window subtree per
    # reference. Edge-bounded, so the checkpoint is small.
    ranked = jm.select(
        "doc_id",
        "component_id",
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(w_all).cast("long").alias("cluster_size"),
    ).localCheckpoint(eager=True)
    reps = ranked.where(F.col("rn") == 1).select(
        "component_id", F.col("doc_id").alias("rep_id")
    )
    clustered = ranked.join(reps, "component_id").select(
        "doc_id",
        "component_id",
        "rep_id",
        "cluster_size",
        (F.col("doc_id") == F.col("rep_id")).alias("kept"),
    )
    singles = (
        d.select("doc_id")
        .join(comps.select(F.col("node").alias("doc_id")), "doc_id", "anti")
        .select(
            "doc_id",
            F.col("doc_id").alias("component_id"),
            F.col("doc_id").alias("rep_id"),
            F.lit(1).cast("long").alias("cluster_size"),
            F.lit(True).alias("kept"),
        )
    )
    return clustered.unionByName(singles)


@query(
    "dedup_embedding_cosine",
    oracle="""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.label,
           round(
             list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
             (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
              sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))),
             4) AS cos
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE round(
            list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
            (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
             sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))),
            4) >= 0.3
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup: cosine ≥ 0.3 between vectors sharing a
    label (the blocking key — at scale an LSH/IVF bucket, see
    queries.similarity). Dot products fold sequentially in DOUBLE on
    both engines → bit-identical before the 4-dp rounding."""
    from mercurygate_spark.operators.similarity import cosine_pairs_blocked

    t = load_tables(spark, sf_dir, "embeddings")
    pairs = cosine_pairs_blocked(
        t["embeddings"], "vec_id", "embedding", "label", threshold=0.3, round_scale=4
    )
    return pairs.select("id_a", "id_b", "label", "cos")


def _bloom_oracle() -> str:
    from mercurygate_spark.operators.sketches import (
        BLOOM_BITS,
        BLOOM_HASHES,
        duck_affine_sql,
        duck_h0_sql,
    )

    fp = "md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))"
    aff = duck_affine_sql(duck_h0_sql("fp"), "jj.j", BLOOM_BITS)
    return f"""
    WITH ref AS (
      SELECT DISTINCT {fp} AS fp FROM documents WHERE length(source) = 4
    ), bits AS (
      SELECT DISTINCT {aff} AS bit, 1 AS one
      FROM ref, (SELECT unnest(range({BLOOM_HASHES})) AS j) jj
    ), corpus AS (
      SELECT doc_id, {fp} AS fp FROM documents
    ), pbits AS (
      SELECT doc_id, {aff} AS bit
      FROM corpus, (SELECT unnest(range({BLOOM_HASHES})) AS j) jj
    ), hits AS (
      SELECT p.doc_id, count(b.one) = {BLOOM_HASHES} AS bloom_hit
      FROM pbits p LEFT JOIN bits b ON p.bit = b.bit
      GROUP BY p.doc_id
    ), exact AS (
      SELECT c.doc_id, (c.fp IN (SELECT fp FROM ref)) AS exact_hit
      FROM corpus c
    )
    SELECT h.doc_id, h.bloom_hit, e.exact_hit
    FROM hits h JOIN exact e ON h.doc_id = e.doc_id
    """


@query("dedup_bloom_prefilter", oracle=_bloom_oracle())
def dedup_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter dedup prefilter (Bloom 1970): the fingerprints of
    the already-ingested half of the corpus (sources src0-src9, i.e.
    length(source)=4) populate an M-bit filter; every document is then
    probed for membership. bloom_hit marks exact-dedup CANDIDATES (no
    false negatives — every true member hits); exact_hit is the ground
    truth, so the pair of columns also pins the filter's false-positive
    behavior at this geometry. At 100 TB the bit table (<= M rows) is
    broadcast and the corpus is scanned once, never shuffled — only
    candidates proceed to the exact fingerprint join
    (operators/sketches.py)."""
    from mercurygate_spark.operators.sketches import bloom_bits, bloom_probe
    from mercurygate_spark.operators.text import fingerprint

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    ref = (
        docs.where(F.length("source") == 4)
        .select(fingerprint("text").alias("fp"))
        .distinct()
    )
    corpus = docs.select("doc_id", fingerprint("text").alias("fp"))
    bits = bloom_bits(ref, "fp")
    hits = bloom_probe(bits, corpus, "doc_id", hash_col="fp")
    exact = corpus.join(
        ref.withColumn("__in", F.lit(1)), "fp", "left"
    ).select("doc_id", F.col("__in").isNotNull().alias("exact_hit"))
    return hits.join(exact, "doc_id").select("doc_id", "bloom_hit", "exact_hit")


@query(
    "dedup_ngram_containment",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, source AS bucket, {duck_shingles_sql()} AS sh FROM documents
    ), sizes AS (
      SELECT doc_id, bucket, len(sh) AS n_sh FROM sh
    ), ex AS (
      SELECT doc_id, bucket, unnest(sh) AS s FROM sh
    ), inter AS (
      SELECT a.bucket, a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
      FROM ex a JOIN ex b ON a.bucket = b.bucket AND a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3
    )
    SELECT i.id_a, i.id_b, i.n_common,
           sa.n_sh AS n_a, sb.n_sh AS n_b,
           round(i.n_common / least(sa.n_sh, sb.n_sh), 6) AS containment
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.id_a AND sa.bucket = i.bucket
    JOIN sizes sb ON sb.doc_id = i.id_b AND sb.bucket = i.bucket
    WHERE i.n_common * 10 >= least(sa.n_sh, sb.n_sh) * 3
    """,
)
def dedup_ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment near-dup detection: |A∩B| / min(|A|,|B|) over
    trigram shingle sets — the measure that catches a SHORT document
    embedded in a long one (quotes, boilerplate wrappers), which
    Jaccard misses because the union term is dominated by the long
    side (Broder's containment, public). Reuses the bucket-blocked
    shingle-equi join (ngram_jaccard_pairs plan); the keep filter is
    pure integer arithmetic (n_common*10 >= min_size*3, i.e.
    containment ≥ 0.3) so the oracle replays it exactly; only the
    reported containment value is a rounded float."""
    from mercurygate_spark.operators.dedup import ngram_jaccard_pairs

    t = load_tables(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(
        t["documents"], "doc_id", "source", threshold=0.0
    ).drop("jaccard", "bucket")
    least = F.least(F.col("n_a"), F.col("n_b"))
    return pairs.where(F.col("n_common") * 10 >= least * 3).select(
        "id_a",
        "id_b",
        "n_common",
        "n_a",
        "n_b",
        r6(F.col("n_common") / least).alias("containment"),
    )


@query(
    "dedup_url_normalize",
    oracle="""
    WITH raw AS (
      SELECT doc_id,
             'HTTPS://' || upper(source) || '.Example.COM/docs/'
               || CAST(doc_id % 100 AS VARCHAR)
               || CASE CAST(doc_id % 3 AS INT)
                    WHEN 0 THEN '?utm_source=feed&utm_campaign=x'
                    WHEN 1 THEN '/'
                    ELSE '' END AS url
      FROM documents
    ), canon AS (
      SELECT doc_id,
             rtrim(regexp_replace(lower(url), '\\?utm_[a-z_]+=[^&]*(&utm_[a-z_]+=[^&]*)*$', ''), '/') AS curl
      FROM raw
    )
    SELECT curl, count(*) AS n_dupes, min(doc_id) AS canonical_doc
    FROM canon GROUP BY curl
    """,
)
def dedup_url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-URL dedup — crawl frontiers re-fetch the same page as
    scheme/case variants, tracking-param suffixes and trailing slashes.
    Normalize (lowercase, strip utm_* query params, trim trailing '/')
    then keep min(doc_id) per canonical URL. The mess is synthesized
    deterministically from doc_id so both engines canonicalize the
    same variants. Map-side string ops + one hash agg on the canonical
    key; at crawl scale the agg carries (url, id), never page bodies."""
    t = load_tables(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("HTTPS://"),
        F.upper("source"),
        F.lit(".Example.COM/docs/"),
        (F.col("doc_id") % 100).cast("string"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("?utm_source=feed&utm_campaign=x"))
        .when(F.col("doc_id") % 3 == 1, F.lit("/"))
        .otherwise(F.lit("")),
    )
    curl = F.rtrim(
        F.regexp_replace(
            F.lower(url), r"\?utm_[a-z_]+=[^&]*(&utm_[a-z_]+=[^&]*)*$", ""
        ),
        F.lit("/"),
    )
    return (
        t["documents"]
        .select("doc_id", curl.alias("curl"))
        .groupBy("curl")
        .agg(F.count("*").alias("n_dupes"), F.min("doc_id").alias("canonical_doc"))
    )


_TRUTH_JACCARD = 0.5


def _minhash_eval_oracle() -> str:
    """Generated oracle for pipeline_minhash_eval: minhash candidates
    (replayed via duck_minhash_pairs_sql) scored against the exact
    same-source Jaccard≥t truth set — both sides assembled from the
    SAME fragments their standalone keys use."""
    return f"""
    WITH cand0 AS (
      SELECT id_a, id_b FROM ({duck_minhash_pairs_sql()})
    ), src AS (
      SELECT doc_id, source FROM documents
    ), cand AS (
      SELECT c.id_a, c.id_b
      FROM cand0 c
      JOIN src a ON a.doc_id = c.id_a
      JOIN src b ON b.doc_id = c.id_b
      WHERE a.source = b.source
    ), sh AS (
      SELECT doc_id, source AS bucket, {duck_shingles_sql()} AS sh FROM documents
    ), sizes AS (
      SELECT doc_id, bucket, len(sh) AS n_sh FROM sh
    ), ex AS (
      SELECT doc_id, bucket, unnest(sh) AS s FROM sh
    ), inter AS (
      SELECT a.bucket, a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
      FROM ex a JOIN ex b ON a.bucket = b.bucket AND a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3
    ), truth AS (
      SELECT i.id_a, i.id_b
      FROM inter i
      JOIN sizes sa ON sa.doc_id = i.id_a AND sa.bucket = i.bucket
      JOIN sizes sb ON sb.doc_id = i.id_b AND sb.bucket = i.bucket
      WHERE i.n_common / (sa.n_sh + sb.n_sh - i.n_common) >= {_TRUTH_JACCARD}
    ), hit AS (
      SELECT c.id_a FROM cand c JOIN truth t
        ON c.id_a = t.id_a AND c.id_b = t.id_b
    )
    SELECT (SELECT count(*) FROM cand)  AS n_candidates,
           (SELECT count(*) FROM truth) AS n_truth,
           (SELECT count(*) FROM hit)   AS n_hit,
           round((SELECT count(*) FROM hit) * 1.0
                 / nullif((SELECT count(*) FROM cand), 0), 6)  AS precision_vs_truth,
           round((SELECT count(*) FROM hit) * 1.0
                 / nullif((SELECT count(*) FROM truth), 0), 6) AS recall
    """


@query("pipeline_minhash_eval", oracle=_minhash_eval_oracle())
def pipeline_minhash_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-quality evaluation IN the engine: MinHash-LSH candidate
    pairs scored against the exact trigram-Jaccard≥0.5 truth set
    (same-source pairs, the shared blocking scope), reporting
    precision-vs-truth and recall as one row. This is the measurement
    a 100 TB dedup run does on a sample shard before trusting the
    sketch fleet-wide; here BOTH pipelines and the comparison are the
    engine's own oracle-checked operators composed — candidate join is
    band-equi, truth join is shingle-equi, the intersection is one
    pair-keyed join of two small pair frames.

    Note 'precision_vs_truth', not precision: candidates below the 0.5
    truth bar are counted against it, which is exactly what you want
    the number to mean when tuning band/row counts."""
    t = load_tables(spark, sf_dir, "documents")
    docs = t["documents"]
    src = docs.select("doc_id", "source")
    cand = (
        minhash_candidate_pairs(docs, "doc_id")
        .join(src.withColumnRenamed("doc_id", "id_a").withColumnRenamed("source", "src_a"), "id_a")
        .join(src.withColumnRenamed("doc_id", "id_b").withColumnRenamed("source", "src_b"), "id_b")
        .where(F.col("src_a") == F.col("src_b"))
        .select("id_a", "id_b")
    )
    # both pair frames feed TWO count branches each — materialize once
    # (eager localCheckpoint) so the band join and the shingle self-join
    # run once, not per branch
    cand = cand.localCheckpoint(eager=True)
    truth = (
        ngram_jaccard_pairs(docs, "doc_id", "source", threshold=_TRUTH_JACCARD)
        .select("id_a", "id_b")
        .localCheckpoint(eager=True)
    )
    hit = cand.join(truth, ["id_a", "id_b"])
    n_cand = cand.agg(F.count("*").alias("n_candidates"))
    n_truth = truth.agg(F.count("*").alias("n_truth"))
    n_hit = hit.agg(F.count("*").alias("n_hit"))
    joined = n_cand.crossJoin(F.broadcast(n_truth)).crossJoin(F.broadcast(n_hit))
    return joined.select(
        "n_candidates",
        "n_truth",
        "n_hit",
        r6(
            F.col("n_hit") * F.lit(1.0) / F.nullif(F.col("n_candidates"), F.lit(0))
        ).alias("precision_vs_truth"),
        r6(F.col("n_hit") * F.lit(1.0) / F.nullif(F.col("n_truth"), F.lit(0))).alias(
            "recall"
        ),
    )


@query(
    "dedup_simhash_hamming",
    oracle=f"""
    WITH sh AS ({duck_simhash_sql()}),
    banded AS (
      SELECT doc_id, simhash, simhash >> 16 AS val, 0 AS band FROM sh
      UNION ALL
      SELECT doc_id, simhash, simhash & 65535, 1 FROM sh
    ), cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.simhash AS ha, b.simhash AS hb
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.val = b.val AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(bit_count(CAST(xor(ha, hb) AS BIGINT)) AS INT) AS hamming
    FROM cand
    WHERE bit_count(CAST(xor(ha, hb) AS BIGINT)) <= 1
    """,
)
def dedup_simhash_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup PAIRS within Hamming radius 1 — dedup_simhash
    computes fingerprints; this key finds the pairs, EXACTLY, without
    all-pairs comparison: split the 32-bit fingerprint into 2 bands
    of 16; by pigeonhole, any pair within Hamming distance 1 agrees
    exactly on at least one band, so a band-equi self-join generates
    a candidate superset and bit_count(xor) ≤ 1 verifies — banding
    here is a lossless plan rewrite (the same guarantee structure as
    join_spatial_grid), not an approximation. Shuffle carries
    (band, 16-bit value, id, fingerprint); bucket sizes are bounded
    by fingerprint collisions, not corpus size. At radius k, use k+1
    bands — the standard simhash dedup deployment shape."""
    from mercurygate_spark.operators.dedup import simhash

    t = load_tables(spark, sf_dir, "documents")
    sh = simhash(t["documents"], "doc_id")
    banded = sh.select(
        "doc_id",
        "simhash",
        F.shiftright("simhash", 16).alias("val"),
        F.lit(0).alias("band"),
    ).unionByName(
        sh.select(
            "doc_id",
            "simhash",
            F.col("simhash").bitwiseAND(65535).alias("val"),
            F.lit(1).alias("band"),
        )
    )
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("ha"),
            F.col("b.simhash").alias("hb"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return cand.where(hamming <= 1).select(
        "doc_a", "doc_b", hamming.cast("int").alias("hamming")
    )


@query(
    "er_blocked_match",
    oracle="""
    WITH names AS (
      SELECT p_name, count(*) AS n_rows,
             string_split(p_name, ' ')[-1] AS block
      FROM part GROUP BY p_name
    )
    SELECT a.block, a.p_name AS name_a, b.p_name AS name_b,
           levenshtein(a.p_name, b.p_name) AS dist,
           a.n_rows AS n_a, b.n_rows AS n_b
    FROM names a JOIN names b
      ON a.block = b.block AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= 2
    """,
)
def er_blocked_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution by blocking: candidate record pairs whose
    names are within edit distance 2, compared only inside a blocking
    key (the name's last token). The scale-defining move is the
    DISTINCT-VALUE contraction before the quadratic step: pairwise
    levenshtein runs on the deduplicated name table (cardinality
    bounded by the vocabulary, not the row count) with per-name
    support counts carried along — at 100 TB the raw table never
    self-joins; only the distinct-name frame (broadcastable) does,
    and each comparison is confined to its block so the cross is
    sum-of-block-sizes squared, not N^2. Levenshtein is the classic
    unit-cost DP — integer, bit-identical across engines."""
    t = load_tables(spark, sf_dir, "part")
    names = (
        t["part"]
        .groupBy("p_name")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .withColumn("block", F.element_at(F.split("p_name", " "), -1))
    )
    a, b = names.alias("a"), names.alias("b")
    dist = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
    return (
        a.join(
            F.broadcast(b),
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .where(dist <= 2)
        .select(
            F.col("a.block").alias("block"),
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            dist.alias("dist"),
            F.col("a.n_rows").alias("n_a"),
            F.col("b.n_rows").alias("n_b"),
        )
    )


def duck_semdedup_ctes(
    table: str = "embeddings",
    prefix: str = "",
    k=None,
    bucketed: bool = False,
) -> str:
    """The SemDeDup decision chain as a parameterized CTE generator
    (the shared-generator doctrine: the standalone keys AND the
    capstone's semantic stage consume this one chain, so they cannot
    drift). Trains the quantized-grid Lloyd's on ``table``, assigns,
    and ends in ``{prefix}semdd`` = (vec_id, centroid_id, cdist,
    n_dominating) — one row per DOMINATED vector (a cosine>=0.4
    in-cluster neighbor with higher keep-priority exists). ``k``
    accepts an int or a scalar-subquery string (the count-dialed
    capstone passes duck_scaled_k_sql so list occupancy stays bounded
    at any corpus size)."""
    from mercurygate_spark.operators.similarity import (
        EMBED_DIMS,
        KMEANS_ITERS,
        N_CENTROIDS,
        N_PLANES_MULTI,
        N_TABLES,
        duck_bucket_sql_seeded,
        duck_ivf_kmeans_sql,
    )

    p = prefix
    k = N_CENTROIDS if k is None else k
    dims = EMBED_DIMS
    dist = (
        f"list_sum(list_transform(range(1,{dims + 1}), "
        "j -> (e.qe[j]-c.qc[j])*(e.qe[j]-c.qc[j])))"
    )
    if bucketed:
        bcols = ", ".join(
            f"{duck_bucket_sql_seeded('embedding', f't{t}', N_PLANES_MULTI)} AS b{t}"
            for t in range(N_TABLES)
        )
        anyb = " OR ".join(f"a.b{t} = b.b{t}" for t in range(N_TABLES))
        bk_ctes = f""", {p}mt AS (
      SELECT vec_id, {bcols} FROM {table}
    ), {p}cand AS (
      SELECT DISTINCT a.vec_id AS ca, b.vec_id AS cb
      FROM {p}mt a JOIN {p}mt b ON a.vec_id <> b.vec_id AND ({anyb})
    )"""
        pairs_from = (
            f"FROM {p}cand JOIN {p}base a ON {p}cand.ca = a.vec_id"
            f" JOIN {p}base b ON {p}cand.cb = b.vec_id"
            " WHERE a.centroid_id = b.centroid_id"
        )
    else:
        bk_ctes = ""
        pairs_from = (
            f"FROM {p}base a JOIN {p}base b"
            " ON a.centroid_id = b.centroid_id AND a.vec_id <> b.vec_id"
        )
    return f"""{duck_ivf_kmeans_sql(table=table, k=k, prefix=p)},
    {p}assign_final AS (
      SELECT vec_id, qe, cidx FROM (
        SELECT e.vec_id, e.qe, c.cidx,
               row_number() OVER (PARTITION BY e.vec_id ORDER BY {dist}, c.cidx) AS rn
        FROM {p}qemb e CROSS JOIN {p}cent{KMEANS_ITERS} c
      ) WHERE rn = 1
    ){bk_ctes},
    {p}base AS (
      SELECT a.vec_id, a.cidx AS centroid_id, a.qe,
             CAST(list_sum(list_transform(a.qe, x -> x*x)) AS BIGINT) AS n2,
             CAST(list_sum(list_transform(range(1,{dims + 1}),
                  j -> (a.qe[j]-c.qc[j])*(a.qe[j]-c.qc[j]))) AS BIGINT) AS cdist
      FROM {p}assign_final a JOIN {p}cent{KMEANS_ITERS} c ON a.cidx = c.cidx
    ),
    {p}pairs AS (
      SELECT a.vec_id, a.centroid_id, a.cdist,
             CAST(list_sum(list_transform(range(1,{dims + 1}),
                  j -> a.qe[j]*b.qe[j])) AS BIGINT) AS dot,
             b.cdist AS bcdist, b.vec_id AS bvec, a.n2 AS an2, b.n2 AS bn2
      {pairs_from}
    ),
    {p}semdd AS (
      SELECT vec_id, centroid_id, cdist, count(*) AS n_dominating
      FROM {p}pairs
      WHERE dot > 0
        AND CAST(dot*dot AS DOUBLE)/CAST(an2*bn2 AS DOUBLE) >= 0.16
        AND (bcdist > cdist OR (bcdist = cdist AND bvec < vec_id))
      GROUP BY vec_id, centroid_id, cdist
    )"""


def _semdedup_oracle(bucketed: bool = False) -> str:
    return f"""
    WITH {duck_semdedup_ctes(bucketed=bucketed)}
    SELECT vec_id, centroid_id, cdist, n_dominating FROM semdd
    """


def _semdedup_frame(spark: SparkSession, sf_dir: str, bucketed: bool) -> DataFrame:
    """Shared SemDeDup plan builder; ``bucketed`` adds the LSH-bucket
    equality to the candidate join (the scale path)."""
    t = load_tables(spark, sf_dir, "embeddings")
    return semdedup_dominated(spark, t["embeddings"], bucketed=bucketed)


def semdedup_dominated(
    spark: SparkSession, e: DataFrame, bucketed: bool = False, k: int | None = None
) -> DataFrame:
    """SemDeDup decision layer over an ARBITRARY vector frame — the
    Spark twin of duck_semdedup_ctes. Returns (vec_id, centroid_id,
    cdist, n_dominating), one row per dominated vector. ``k`` overrides
    the centroid count (the capstone passes scaled_n_centroids so list
    occupancy — and hence in-cluster pairwise work — stays bounded as
    the survivor set grows)."""
    from mercurygate_spark.operators.similarity import (
        QUANT,
        ivf_assign,
        lsh_bucket_multi,
        train_ivf_centroids,
    )

    cmat = train_ivf_centroids(e, **({} if k is None else {"k": k}))
    cent = spark.createDataFrame(
        [(int(i), [int(v) for v in row]) for i, row in enumerate(cmat)],
        "cidx int, qc array<bigint>",
    )
    assigned = ivf_assign(e, cmat, "vec_id", "embedding", n_probe=1)
    lsum = lambda col: F.aggregate(  # noqa: E731 — integer fold, exact
        col, F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    qe = F.transform("embedding", lambda x: F.floor(x * QUANT + F.lit(0.5)).cast("long"))
    base = (
        assigned.join(F.broadcast(cent), assigned.centroid_id == cent.cidx)
        .withColumn("qe", qe)
        .select(
            "vec_id",
            "centroid_id",
            "qe",
            lsum(F.transform("qe", lambda x: x * x)).alias("n2"),
            lsum(F.zip_with("qe", "qc", lambda a, b: (a - b) * (a - b))).alias("cdist"),
        )
    )
    a, b = base.alias("a"), base.alias("b")
    if bucketed:
        # Candidate join key is (table, bucket, CLUSTER): the final
        # pair set needs same-cluster anyway, so folding centroid_id
        # into the equi-key changes nothing semantically but bounds
        # each join cell to |bucket ∩ cluster| — the 10× probe showed
        # bucket-only candidates re-growing quadratically once buckets
        # outgrow clusters (32 buckets/table vs k clusters), while the
        # intersected key scales with the FINER of the two partitions.
        mt = lsh_bucket_multi(e, "vec_id", "embedding").select(
            "vec_id", "lsh_table", "bucket"
        )
        mt = mt.join(base.select("vec_id", "centroid_id"), "vec_id")
        am, bm = mt.alias("am"), mt.alias("bm")
        cand = (
            am.join(
                bm,
                (F.col("am.lsh_table") == F.col("bm.lsh_table"))
                & (F.col("am.bucket") == F.col("bm.bucket"))
                & (F.col("am.centroid_id") == F.col("bm.centroid_id"))
                & (F.col("am.vec_id") != F.col("bm.vec_id")),
            )
            .select(
                F.col("am.vec_id").alias("ca"), F.col("bm.vec_id").alias("cb")
            )
            .distinct()
        )
        # no post-join centroid filter: cand already enforces it in
        # the equi-key (unlike the oracle, whose bucket-only cand CTE
        # needs its WHERE a.centroid_id = b.centroid_id)
        joined = cand.join(a, F.col("ca") == F.col("a.vec_id")).join(
            b, F.col("cb") == F.col("b.vec_id")
        )
    else:
        joined = a.join(
            b,
            (F.col("a.centroid_id") == F.col("b.centroid_id"))
            & (F.col("a.vec_id") != F.col("b.vec_id")),
        )
    dot = lsum(F.zip_with(F.col("a.qe"), F.col("b.qe"), lambda x, y: x * y))
    cos2 = (dot * dot).cast("double") / (F.col("a.n2") * F.col("b.n2")).cast("double")
    dominated = (F.col("b.cdist") > F.col("a.cdist")) | (
        (F.col("b.cdist") == F.col("a.cdist")) & (F.col("b.vec_id") < F.col("a.vec_id"))
    )
    return (
        joined.where((dot > 0) & (cos2 >= F.lit(0.16)) & dominated)
        .groupBy(
            F.col("a.vec_id").alias("vec_id"),
            F.col("a.centroid_id").alias("centroid_id"),
            F.col("a.cdist").alias("cdist"),
        )
        .agg(F.count(F.lit(1)).alias("n_dominating"))
    )


@query("dedup_semantic", oracle=_semdedup_oracle())
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication = k-means-cluster the embeddings, then drop every
    vector that has a cosine-similar neighbor (cos >= 0.4) INSIDE its
    cluster with higher keep-priority. Keep-priority follows the
    paper: the vector FARTHEST from its centroid survives (keeps the
    outliers, drops the redundant core), ties broken by id. The
    clustering bounds the quadratic step — pairwise cosine runs per
    inverted list, sum-of-cluster-sizes squared instead of N^2, and
    at 100 TB the cluster count scales with the corpus so list sizes
    stay bounded. Cross-engine exactness: clustering is the
    integer-grid Lloyd's already replayed bit-for-bit by the IVF
    oracle; the similarity test compares cos^2 = dot^2/(n2a*n2b) with
    dot/n2 computed as exact BIGINTs on the quantized grid (all
    magnitudes < 2^53, so the final DOUBLE division is bit-identical
    in both engines) — no transcendental, no rounding anywhere in the
    decision path; priority (centroid distance) is an exact integer.
    The 10× probe measures the fixed-k quadratic at 6.6× (the paper's
    own k ∝ N regime flattens it — docs/SCALING.md); the measured
    in-repo mitigation is dedup_semantic_lsh below."""
    return _semdedup_frame(spark, sf_dir, bucketed=False)


@query("dedup_semantic_lsh", oracle=_semdedup_oracle(bucketed=True))
def dedup_semantic_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dedup_semantic's scale path: candidate pairs must share AT
    LEAST ONE of 4 seeded 5-plane LSH buckets (the multi-table union
    sim_cosine_ann_lsh_multi already ships) in addition to the
    k-means cluster, so scoring runs candidate-driven — 4 bucket-equi
    self-joins, pair-distinct, then attribute lookup — instead of
    |cluster|² pairwise. Measured on this corpus: the union keeps
    ~38 % of cos>=0.4 pairs while generating ~13 % of all pairs (the
    θ=66° sign-agreement math; at the paper's τ≈0.95 regime the same
    tables keep ~90 %+). The oracle pins the EXACT bucketed
    semantics; diffing against the unbucketed key above IS the recall
    measurement, same doctrine as the ANN recall table."""
    return _semdedup_frame(spark, sf_dir, bucketed=True)


_ER_NAMES_SQL = """
      SELECT p_name, count(*) AS n_rows, min(p_partkey) AS name_id,
             string_split(p_name, ' ')[-1] AS block
      FROM part GROUP BY p_name
"""

_ER_PAIRS_SQL = f"""
      WITH names AS ({_ER_NAMES_SQL})
      SELECT a.name_id AS id_a, b.name_id AS id_b
      FROM names a JOIN names b
        ON a.block = b.block AND a.p_name < b.p_name
      WHERE levenshtein(a.p_name, b.p_name) <= 2
"""


@query(
    "er_cluster_canonical",
    oracle=f"""
    WITH names AS ({_ER_NAMES_SQL}),
    cc AS ({duck_connected_components_sql(_ER_PAIRS_SQL)})
    SELECT n.p_name, n.n_rows,
           coalesce(c.component, n.name_id) AS cluster_id,
           min({{'neg': -m.n_rows, 'nm': m.p_name}}).nm AS canonical_name,
           count(*) AS cluster_size
    FROM names n
    LEFT JOIN cc c ON n.name_id = c.node
    JOIN (SELECT nn.p_name, nn.n_rows, nn.name_id,
                 coalesce(cx.component, nn.name_id) AS cluster_id
          FROM names nn LEFT JOIN cc cx ON nn.name_id = cx.node) m
      ON coalesce(c.component, n.name_id) = m.cluster_id
    GROUP BY n.p_name, n.n_rows, coalesce(c.component, n.name_id)
    """,
)
def er_cluster_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The complete entity-resolution pipeline: blocking → pairwise
    match (er_blocked_match's rule) → TRANSITIVE clustering →
    golden-record survivorship. Matching alone leaves a~b, b~c in
    limbo; large-star/small-star connected components (the same
    operator the corpus dedup uses) closes the transitive hull, and
    each cluster elects one canonical record — highest support,
    ties toward the smaller name (min-of-struct, never an
    engine-defined arg-pick). All the quadratic work happens on the
    vocabulary-bounded distinct-name frame; the clustering input is
    the match pairs only. Output: every distinct name with its
    cluster id, the cluster's canonical name, and cluster size."""
    t = load_tables(spark, sf_dir, "part")
    names = (
        t["part"]
        .groupBy("p_name")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.min("p_partkey").alias("name_id"))
        .withColumn("block", F.element_at(F.split("p_name", " "), -1))
        .localCheckpoint(eager=True)
    )
    a, b = names.alias("a"), names.alias("b")
    pairs = (
        a.join(
            F.broadcast(b),
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .where(F.levenshtein(F.col("a.p_name"), F.col("b.p_name")) <= 2)
        .select(F.col("a.name_id").alias("id_a"), F.col("b.name_id").alias("id_b"))
    )
    comps = connected_components(pairs)
    labeled = names.join(
        F.broadcast(comps), names.name_id == comps.node, "left"
    ).select(
        "p_name",
        "n_rows",
        F.coalesce(F.col("component"), F.col("name_id")).alias("cluster_id"),
    )
    canon = labeled.groupBy("cluster_id").agg(
        F.min(F.struct((-F.col("n_rows")).alias("neg"), F.col("p_name").alias("nm")))
        .getField("nm")
        .alias("canonical_name"),
        F.count(F.lit(1)).alias("cluster_size"),
    )
    return labeled.join(F.broadcast(canon), "cluster_id").select(
        "p_name", "n_rows", "cluster_id", "canonical_name", "cluster_size"
    )


# ---------------------------------------------------------------------------
# Winnowing fingerprints (Schleimer, Wilkerson, Aiken — SIGMOD 2003)
# ---------------------------------------------------------------------------

# Constants chosen so every intermediate stays an exact int64 in BOTH
# engines: base 27, k=12 → max term 122 * 27^11 ≈ 6.9e17 and the
# 12-term sum < 7.2e17, far under 2^63; one % at the end.
WINNOW_K = 12          # gram length (chars of normalized text)
WINNOW_W = 8           # winnowing window (grams per window)
_WINNOW_B = 27
_WINNOW_M = 2147483647
WINNOW_MAX_DF = 20     # stop-fingerprint cap (shared by > this many docs)
WINNOW_MIN_SHARED = 5  # pair report threshold

_WPOW = [_WINNOW_B ** (WINNOW_K - 1 - j) for j in range(WINNOW_K)]


def _winnow_gram_sql(sub: str) -> str:
    """Polynomial k-gram hash as a flat 12-term sum — the same
    arithmetic the Arrow pass (winnow_fingerprints_arrow) computes as
    an int64 matmul; ``sub`` formats the j-th char. Used to generate
    the DuckDB oracle so the constants stay single-sourced."""
    terms = " + ".join(
        f"{sub.format(j=j)} * {_WPOW[j]}" for j in range(WINNOW_K)
    )
    return f"({terms}) % {_WINNOW_M}"


def _winnow_oracle() -> str:
    gram = _winnow_gram_sql("ascii(s[i+{j}])::BIGINT")
    win = ", ".join(f"gh[j+{j}]" for j in range(WINNOW_W))
    return f"""
    WITH norm AS (
      SELECT doc_id, regexp_replace(lower(text), '[^a-z0-9]', '', 'g') AS s
      FROM documents
    ), g AS (
      SELECT doc_id,
             list_transform(range(1, length(s) - {WINNOW_K} + 2),
                            i -> {gram}) AS gh
      FROM norm WHERE length(s) >= {WINNOW_K + WINNOW_W - 1}
    ), sel AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(gh) - {WINNOW_W} + 2),
                                          j -> least({win}))) AS fps
      FROM g
    ), fp AS (
      SELECT doc_id, unnest(fps) AS fp FROM sel
    ), fpk AS (
      SELECT doc_id, fp FROM fp
      WHERE fp IN (SELECT fp FROM fp GROUP BY fp
                   HAVING count(DISTINCT doc_id) <= {WINNOW_MAX_DF})
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
    FROM fpk a JOIN fpk b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY 1, 2 HAVING count(*) >= {WINNOW_MIN_SHARED}
    """


@query("dedup_winnowing", oracle=_winnow_oracle())
def dedup_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprinting (Schleimer, Wilkerson, Aiken,
    SIGMOD 2003 — the MOSS algorithm): polynomial k-gram hashes over
    normalized text, min-hash per sliding window of w grams (the
    winnowing guarantee: any shared substring of length >= k + w - 1
    yields at least one shared fingerprint), distinct fingerprints per
    doc, stop-fingerprints shared by > MAX_DF docs dropped (the
    standard common-substring guard), then pairs sharing >= T
    fingerprints — local-overlap near-dup detection that catches
    PARTIAL copies minhash's whole-document Jaccard dilutes away.

    Scale posture: gram hashing and window-min selection run as ONE
    Arrow mapInPandas pass (winnow_fingerprints_arrow — numpy
    sliding_window_view + int64 matmul per doc; the interpreted
    transform/least lambda version measured 6× slower at sf0.1,
    docs/SCALING.md — the minhash_signature_arrow tradeoff); only
    (fp, doc_id) longs ever
    shuffle — one groupBy for the df cap, one fp-equi self-join for
    pairs (band-join doctrine, never all-pairs). The fingerprint
    frame is localCheckpoint-ed so the Arrow pass runs once, not
    once per self-join branch (the connected_components
    lineage-truncation doctrine). Cross-engine exactness: the hash
    is a flat integer polynomial — every term < 7e17, sum < 2^63,
    one modulo — so fingerprints are bit-identical in both engines
    by construction."""
    from mercurygate_spark.operators.dedup import winnow_fingerprints_arrow

    t = load_tables(spark, sf_dir, "documents")
    fp = winnow_fingerprints_arrow(
        t["documents"],
        "doc_id",
        k=WINNOW_K,
        w=WINNOW_W,
        base=_WINNOW_B,
        mod=_WINNOW_M,
    ).localCheckpoint(eager=True)
    keep = (
        fp.groupBy("fp")
        .agg(F.countDistinct("doc_id").alias("df"))
        .where(F.col("df") <= WINNOW_MAX_DF)
        .select("fp")
    )
    fpk = fp.join(keep, "fp")
    a, b = fpk.alias("a"), fpk.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= WINNOW_MIN_SHARED)
    )


# ---------------------------------------------------------------------------
# Fellegi–Sunter probabilistic record linkage (Fellegi & Sunter 1969;
# the scoring model behind Splink). m-probabilities fixed (0.95 — the
# usual prior absent labeled pairs); u-probabilities ESTIMATED from the
# data as the random-agreement probability Σ (n_v/N)² per field.
# ---------------------------------------------------------------------------

FS_M = 0.95  # P(field agrees | records are a true match)


@query(
    "er_fellegi_sunter",
    oracle=f"""
    WITH c AS MATERIALIZED (
      SELECT c_custkey, c_nationkey, c_mktsegment,
             CAST(floor(c_acctbal / 100) AS BIGINT) AS bal_block,
             substr(c_name, length(c_name), 1) AS name_digit,
             CAST(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) % 10 AS VARCHAR)
               AS cents_digit
      FROM customer
    ),
    n AS (SELECT count(*) AS n FROM c),
    u_seg AS (
      SELECT sum(f * f) AS u FROM (
        SELECT count(*) * 1.0 / (SELECT n FROM n) AS f
        FROM c GROUP BY c_mktsegment)
    ),
    u_name AS (
      SELECT sum(f * f) AS u FROM (
        SELECT count(*) * 1.0 / (SELECT n FROM n) AS f
        FROM c GROUP BY name_digit)
    ),
    u_cents AS (
      SELECT sum(f * f) AS u FROM (
        SELECT count(*) * 1.0 / (SELECT n FROM n) AS f
        FROM c GROUP BY cents_digit)
    ),
    pairs AS (
      SELECT a.c_custkey AS custkey_a, b.c_custkey AS custkey_b,
             (a.c_mktsegment = b.c_mktsegment) AS agree_segment,
             (a.name_digit = b.name_digit) AS agree_name_digit,
             (a.cents_digit = b.cents_digit) AS agree_cents_digit
      FROM c a JOIN c b
        ON a.c_nationkey = b.c_nationkey AND a.bal_block = b.bal_block
       AND a.c_custkey < b.c_custkey
    ),
    scored AS (
      SELECT pairs.*,
             round(
               (CASE WHEN agree_segment
                     THEN ln({FS_M} / u_seg.u) ELSE ln({1 - FS_M} / (1 - u_seg.u)) END
                + CASE WHEN agree_name_digit
                       THEN ln({FS_M} / u_name.u) ELSE ln({1 - FS_M} / (1 - u_name.u)) END
                + CASE WHEN agree_cents_digit
                       THEN ln({FS_M} / u_cents.u) ELSE ln({1 - FS_M} / (1 - u_cents.u)) END
               ) / ln(2), 6) AS match_weight
      FROM pairs CROSS JOIN u_seg CROSS JOIN u_name CROSS JOIN u_cents
    )
    SELECT custkey_a, custkey_b, agree_segment, agree_name_digit,
           agree_cents_digit, match_weight
    FROM scored
    ORDER BY match_weight DESC, custkey_a, custkey_b LIMIT 50
    """,
)
def er_fellegi_sunter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi–Sunter probabilistic record linkage over the customer
    table: candidate pairs from (nationkey, acctbal-hundreds) blocking,
    each scored by the sum of per-field log2(m/u) agreement weights —
    m fixed at {FS_M}, u ESTIMATED from the data as the
    random-agreement probability Σ(n_v/N)² per field (the standard
    unsupervised u-estimate; Splink's EM refines m the same way from
    here). Top-50 by the r6-rounded weight with id tiebreaks.

    Scale shape: blocking keys are content-derived and
    cardinality-growing (balance hundreds × nation), so block
    occupancy — and hence pairwise work — is governed by the blocking
    resolution dial exactly as in er_blocked_match; the three u
    frames are 1-row broadcasts; the weight is pure codegen
    arithmetic; top-50 rides TakeOrderedAndProject."""
    t = load_tables(spark, sf_dir, "customer")
    c = t["customer"].select(
        "c_custkey",
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 100).cast("long").alias("bal_block"),
        F.substring(F.col("c_name"), -1, 1).alias("name_digit"),
        (
            F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("long") % 10
        ).cast("string").alias("cents_digit"),
    )
    n_total = c.count()  # 1 scalar; the u estimates need the denominator

    def u_of(col: str):
        return (
            c.groupBy(col)
            .agg((F.count("*") * F.lit(1.0) / F.lit(n_total)).alias("f"))
            .agg(F.sum(F.col("f") * F.col("f")).alias("u"))
        )

    u_seg = F.broadcast(u_of("c_mktsegment").withColumnRenamed("u", "u_seg"))
    u_name = F.broadcast(u_of("name_digit").withColumnRenamed("u", "u_name"))
    u_cents = F.broadcast(u_of("cents_digit").withColumnRenamed("u", "u_cents"))
    a = c.select(*[F.col(x).alias(f"a_{x}") for x in c.columns])
    b = c.select(*[F.col(x).alias(f"b_{x}") for x in c.columns])
    pairs = a.join(
        b,
        (F.col("a_c_nationkey") == F.col("b_c_nationkey"))
        & (F.col("a_bal_block") == F.col("b_bal_block"))
        & (F.col("a_c_custkey") < F.col("b_c_custkey")),
    ).select(
        F.col("a_c_custkey").alias("custkey_a"),
        F.col("b_c_custkey").alias("custkey_b"),
        (F.col("a_c_mktsegment") == F.col("b_c_mktsegment")).alias("agree_segment"),
        (F.col("a_name_digit") == F.col("b_name_digit")).alias("agree_name_digit"),
        (F.col("a_cents_digit") == F.col("b_cents_digit")).alias("agree_cents_digit"),
    )
    m = F.lit(FS_M)
    one_m = F.lit(1 - FS_M)

    def w(agree: str, u):
        return F.when(F.col(agree), F.log(m / u)).otherwise(
            F.log(one_m / (F.lit(1.0) - u))
        )

    scored = (
        pairs.crossJoin(u_seg)
        .crossJoin(u_name)
        .crossJoin(u_cents)
        .select(
            "custkey_a",
            "custkey_b",
            "agree_segment",
            "agree_name_digit",
            "agree_cents_digit",
            r6(
                (
                    w("agree_segment", F.col("u_seg"))
                    + w("agree_name_digit", F.col("u_name"))
                    + w("agree_cents_digit", F.col("u_cents"))
                )
                / F.log(F.lit(2.0))
            ).alias("match_weight"),
        )
    )
    return scored.orderBy(
        F.col("match_weight").desc(), "custkey_a", "custkey_b"
    ).limit(50)


# ---------------------------------------------------------------------------
# Semantic decontamination (round 14 frontier): the EMBEDDING-level
# twin of dedup_decontaminate — gram overlap misses paraphrased eval
# leakage, so production decontamination ALSO screens training vectors
# against the benchmark set in embedding space (the SemDeDup-style
# cosine test pointed at a held-out suite instead of the corpus
# itself). The eval side is a benchmark dump — tiny by contract — so
# the exact check is a broadcast of the eval vectors and one codegen
# cosine pass over the corpus: n_train × |eval| dot products, zero
# corpus shuffle, partial aggregation completing map-side (vec_id is
# unique). No recall-losing index needed: for DEcontamination the miss
# cost is asymmetric, so the exact small-side scan is the production
# shape.
# ---------------------------------------------------------------------------

SEM_DECON_TAU = 0.4   # contamination cosine (the SemDeDup in-repo regime;
                      # a production benchmark screen runs ~0.95 — the
                      # corpus has no natural pairs that high, see the
                      # planted-pair probes)
SEM_DECON_EVAL_CAP = 64  # benchmark suites are FIXED-size: the eval set
                         # is the 64 hash-smallest eval-slice vectors, so
                         # screen work is EVAL_CAP·n at every corpus size
                         # (an uncapped md5 slice grows with the corpus
                         # and the 10x probe measures the n·|eval|
                         # quadratic instead of the production regime)


def sem_eval_cap_frame(emb: DataFrame) -> DataFrame:
    """The deterministic fixed-size benchmark stand-in: the
    SEM_DECON_EVAL_CAP hash-smallest eval-slice vectors (orderBy+limit
    over the already-small slice — TakeOrdered, never a global sort of
    the corpus). Spark twin of duck_sem_eval_cap_cte."""
    from mercurygate_spark.functions import md5_long
    from mercurygate_spark.queries.text import DECON_MOD

    is_eval = md5_long(F.col("vec_id").cast("string")) % DECON_MOD == 0
    return (
        emb.where(is_eval)
        .orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(SEM_DECON_EVAL_CAP)
        .select(F.col("vec_id").alias("eval_id"), F.col("embedding").alias("ev"))
    )


def sem_contaminated_ids(emb: DataFrame, train: DataFrame) -> DataFrame:
    """vec_ids among ``train`` (a (vec_id, embedding) frame) whose max
    r4 cosine against the capped eval set reaches SEM_DECON_TAU — the
    Spark twin of duck_sem_contam_cte. The eval side broadcasts into a
    deliberate BNLJ (fixed {SEM_DECON_EVAL_CAP} rows); the training
    side never shuffles and the per-vector reduce completes map-side
    (vec_id unique)."""
    from mercurygate_spark.operators.similarity import (
        _as_double,
        cosine_pre,
        norm,
    )

    # norms once per vector, not per (train, eval) pair: the BNLJ has
    # fanout SEM_DECON_EVAL_CAP on every training row and fanout n on
    # every eval row (cosine_pre; bit-identical)
    ev = sem_eval_cap_frame(emb).withColumn("en", norm(_as_double(F.col("ev"))))
    tn = norm(_as_double(F.col("embedding"))).alias("tn")
    c = (
        F.floor(
            cosine_pre(F.col("embedding"), F.col("ev"), F.col("tn"), F.col("en"))
            * 10**4 + F.lit(0.5)
        ) / 10**4
    )
    return (
        train.select("vec_id", "embedding", tn)
        .crossJoin(F.broadcast(ev))
        .select("vec_id", c.alias("cos"))
        .groupBy("vec_id")
        .agg(F.max("cos").alias("max_eval_cos"))
        .where(F.col("max_eval_cos") >= SEM_DECON_TAU)
        .select("vec_id")
    )


# the r4 cosine between aliases t and e — shared by the standalone
# screen oracle and the capstone's semantic-decon stage
_SEM_DECON_COS = (
    "round(list_dot_product(t.embedding::DOUBLE[], e.embedding::DOUBLE[]) / "
    "(sqrt(list_dot_product(t.embedding::DOUBLE[], t.embedding::DOUBLE[])) * "
    "sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))), 4)"
)


def duck_sem_eval_is_eval_sql() -> str:
    """The deterministic eval-slice predicate on vec_id (the same md5
    split the textual decon key uses on doc_id — on bridged ids the
    two slices coincide)."""
    from mercurygate_spark.queries.text import DECON_MOD

    return (
        "(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT"
        f" % {DECON_MOD} = 0)"
    )


def duck_sem_eval_cap_cte(name: str = "ev") -> str:
    """The capped fixed-size benchmark stand-in: the
    SEM_DECON_EVAL_CAP hash-smallest eval-slice vectors of the FULL
    embeddings table (benchmark suites are fixed-size by contract —
    the cap is what keeps the screen linear in the corpus)."""
    return f"""{name} AS MATERIALIZED (
      SELECT vec_id, embedding FROM embeddings WHERE {duck_sem_eval_is_eval_sql()}
      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
      LIMIT {SEM_DECON_EVAL_CAP}
    )"""


def duck_sem_contam_cte(
    train_rel: str, name: str = "scontam", ev: str = "ev"
) -> str:
    """vec_ids among ``train_rel`` (a (vec_id, embedding) relation)
    whose max r4 cosine against the capped eval set reaches
    SEM_DECON_TAU — the drop set of the semantic screen."""
    return f"""{name} AS MATERIALIZED (
      SELECT t.vec_id
      FROM ({train_rel}) t CROSS JOIN {ev} e
      GROUP BY t.vec_id
      HAVING max({_SEM_DECON_COS}) >= {SEM_DECON_TAU}
    )"""


def _sem_decon_oracle() -> str:
    cos = _SEM_DECON_COS
    is_eval = duck_sem_eval_is_eval_sql()
    return f"""
    WITH {duck_sem_eval_cap_cte()},
    tr AS (
      SELECT vec_id, embedding FROM embeddings WHERE NOT {is_eval}
    )
    SELECT t.vec_id,
           max({cos}) AS max_eval_cos,
           CAST(coalesce(sum(CASE WHEN {cos} >= {SEM_DECON_TAU}
                                  THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_contam,
           (max({cos}) >= {SEM_DECON_TAU}) AS contaminated
    FROM tr t CROSS JOIN ev e
    GROUP BY t.vec_id
    """


@query("dedup_decontaminate_semantic", oracle=_sem_decon_oracle())
def dedup_decontaminate_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space eval decontamination: every training vector
    (non-eval slice; the same deterministic md5 split the textual
    decon key uses, on vec_id) reports its maximum r4 cosine against
    the ENTIRE eval-slice vector set, the count of eval vectors within
    {SEM_DECON_TAU}, and the contamination flag — the audit frame the
    gram-based key publishes, at paraphrase granularity.

    Scale shape: the eval set (a benchmark suite — tiny by contract)
    broadcasts into a deliberate BroadcastNestedLoopJoin; the corpus
    never shuffles at all, every per-pair cosine runs in whole-stage
    codegen (the sequential F.aggregate fold that matches DuckDB's
    list_dot_product exactly), and the per-vector reduce completes
    map-side because vec_id is unique. Work is {SEM_DECON_EVAL_CAP}·n
    dot products at EVERY corpus size (the eval stand-in is capped the
    way real benchmark suites are fixed) — the exact check production
    runs, because missing eval leakage costs more than the scan (no
    recall-losing index on the decontamination path)."""
    from mercurygate_spark.functions import md5_long
    from mercurygate_spark.operators.similarity import cosine
    from mercurygate_spark.queries.text import DECON_MOD

    from mercurygate_spark.operators.similarity import (
        _as_double,
        cosine_pre,
        norm,
    )

    emb = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    is_eval = md5_long(F.col("vec_id").cast("string")) % DECON_MOD == 0
    # per-vector norms (cosine_pre — see sem_contaminated_ids)
    ev = sem_eval_cap_frame(emb).withColumn("en", norm(_as_double(F.col("ev"))))
    tr = emb.where(~is_eval).select(
        "vec_id", "embedding", norm(_as_double(F.col("embedding"))).alias("tn")
    )
    c = (
        F.floor(
            cosine_pre(F.col("embedding"), F.col("ev"), F.col("tn"), F.col("en"))
            * 10**4 + F.lit(0.5)
        ) / 10**4
    )
    return (
        tr.crossJoin(F.broadcast(ev))
        .select("vec_id", c.alias("cos"))
        .groupBy("vec_id")
        .agg(
            F.max("cos").alias("max_eval_cos"),
            F.coalesce(
                F.sum((F.col("cos") >= SEM_DECON_TAU).cast("long")), F.lit(0)
            ).cast("long").alias("n_contam"),
            (F.max("cos") >= SEM_DECON_TAU).alias("contaminated"),
        )
    )
