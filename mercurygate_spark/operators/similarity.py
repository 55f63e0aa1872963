"""Similarity search over embedding columns (north-star surface):
brute-force cosine top-k baseline + random-hyperplane-LSH-bucketed
variant as the scale path.

Embeddings are array<float>; all math is done in DOUBLE after an
explicit cast so the DuckDB oracle (list ops over DOUBLE[]) computes
bit-identical dot products (same sequential accumulation order).

Scale notes:
- brute-force is broadcast(queries) × candidates — one pass over the
  corpus, no shuffle of the corpus; right for |queries| small.
- the LSH variant buckets both sides by deterministic hyperplane sign
  bits (md5-derived planes, no RNG) and only scores within buckets —
  candidate work scales with bucket sizes. At 1000 executors the
  bucket is the shuffle key.
Public-knowledge basis: Charikar random-hyperplane LSH (STOC 2002).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

N_PLANES = 8  # LSH sign bits → up to 256 buckets


def _as_double(c: Column) -> Column:
    return c.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product — same accumulation order as
    DuckDB's list_dot_product, so doubles match exactly."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    a, b = _as_double(a), _as_double(b)
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    round_scale: int = 4,
) -> DataFrame:
    """Brute-force cosine top-k: broadcast the (small) query set
    against the corpus, rank per query by (rounded cosine desc, id) —
    the rounding makes the ranking stable across engines whose last-ulp
    cosines could differ.

    Returns (query_id, candidate_id, cos, rk), excluding self-matches.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("candidate_id"), _as_double(F.col(vec_col)).alias("cv")
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col("query_id") != F.col("candidate_id"))
        .select(
            "query_id",
            "candidate_id",
            (F.floor(cosine(F.col("qv"), F.col("cv")) * 10**round_scale + F.lit(0.5))
             / 10**round_scale).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("candidate_id"))
    return scored.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= k)


def signs_matrix(dims: int = 64):
    """The md5-derived hyperplane sign matrix (N_PLANES × dims) as
    numpy — numerically identical to _plane_signs / duck_plane_signs_sql
    (same md5 parity rule)."""
    import hashlib

    import numpy as np

    m = np.empty((N_PLANES, dims), dtype=np.float64)
    for p in range(N_PLANES):
        for d in range(dims):
            first_hex = hashlib.md5(f"p{p}:{d}".encode()).hexdigest()[0]
            m[p, d] = 1.0 if int(first_hex, 16) % 2 == 0 else -1.0
    return m


def lsh_bucket(df: DataFrame, id_col: str, vec_col: str, out: str = "bucket") -> DataFrame:
    """Random-hyperplane LSH bucket id: N_PLANES projection sign bits
    concatenated into a string key. Computed via an Arrow-batched
    mapInPandas numpy projection (V @ S.T) — the Column-expression
    equivalent (zip_with folds) evaluates interpreted and is ~100×
    slower per row; values are identical up to BLAS ulp, which only
    matters for projections within ~1e-13 of zero."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql.types import StringType, StructField, StructType

    in_schema = df.select(id_col, vec_col).schema
    schema = StructType(list(in_schema.fields) + [StructField(out, StringType())])

    def bucketize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        signs = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vecs = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            if signs is None:
                signs = signs_matrix(vecs.shape[1])
            bits = (vecs @ signs.T) >= 0
            pdf[out] = ["".join("1" if b else "0" for b in row) for row in bits]
            yield pdf
    return df.select(id_col, vec_col).mapInPandas(bucketize, schema)


def _plane_signs(plane: int) -> Column:
    return F.array(
        *[
            F.when(
                F.conv(F.substring(F.md5(F.lit(f"p{plane}:{d}")), 1, 1), 16, 10)
                .cast("int") % 2 == 0,
                F.lit(1.0),
            ).otherwise(F.lit(-1.0))
            for d in range(64)
        ]
    )


def duck_plane_signs_sql(plane: int) -> str:
    """DuckDB twin of _plane_signs: a literal DOUBLE list expression."""
    comps = ", ".join(
        f"CASE WHEN ('0x' || substr(md5('p{plane}:{d}'), 1, 1))::INT % 2 = 0 "
        "THEN 1.0 ELSE -1.0 END"
        for d in range(64)
    )
    return f"[{comps}]::DOUBLE[]"


def duck_bucket_sql(vec_expr: str) -> str:
    """DuckDB twin of lsh_bucket's bit-string key."""
    bits = " || ".join(
        f"(CASE WHEN list_dot_product({vec_expr}::DOUBLE[], {duck_plane_signs_sql(p)}) >= 0 "
        "THEN '1' ELSE '0' END)"
        for p in range(N_PLANES)
    )
    return bits


N_CENTROIDS = 16
N_PROBE = 2


def ivf_assign(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str,
    vec_col: str,
    n_probe: int = 1,
) -> DataFrame:
    """Assign each vector to its ``n_probe`` nearest centroids
    (euclidean, tie-break by centroid id) via one numpy distance
    matrix per Arrow batch. ``centroids`` is a small driver-side list
    (the broadcast-dim pattern — closure-captured, sent once per
    executor)."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql.types import IntegerType, StructField, StructType

    cids = np.array([c[0] for c in centroids], dtype=np.int64)
    cmat = np.array([c[1] for c in centroids], dtype=np.float64)

    in_schema = df.select(id_col, vec_col).schema
    schema = StructType(
        list(in_schema.fields)
        + [StructField("centroid_id", IntegerType()), StructField("probe_rank", IntegerType())]
    )

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vecs = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            # ||v-c||² = ||v||² - 2v·c + ||c||²; argsort with cid tiebreak
            d2 = (
                (vecs**2).sum(axis=1, keepdims=True)
                - 2 * vecs @ cmat.T
                + (cmat**2).sum(axis=1)
            )
            order = np.lexsort((np.broadcast_to(cids, d2.shape), d2), axis=1)[:, :n_probe]
            rows = []
            for i in range(len(pdf)):
                for r in range(order.shape[1]):
                    rows.append(
                        (*pdf.iloc[i][[id_col, vec_col]], int(cids[order[i, r]]), r + 1)
                    )
            yield pd.DataFrame(rows, columns=[id_col, vec_col, "centroid_id", "probe_rank"])

    return df.select(id_col, vec_col).mapInPandas(assign, schema)


def cosine_topk_ivf(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    round_scale: int = 4,
) -> DataFrame:
    """IVF-style ANN: corpus vectors partitioned into N_CENTROIDS
    inverted lists (nearest-centroid assignment); each query probes its
    N_PROBE nearest lists and scores exact cosine only there.

    Centroids here are the first N_CENTROIDS corpus vectors — a
    deterministic, training-free choice so the DuckDB oracle can
    replay assignment exactly; swap in k-means centroids on a real
    corpus (the plumbing is identical). Candidate work per query is
    |corpus| * n_probe / n_centroids."""
    spark = corpus.sparkSession  # noqa: F841 — documents that no extra session state is needed
    cent_rows = (
        corpus.where(F.col(id_col) < N_CENTROIDS)
        .select(id_col, vec_col)
        .collect()
    )
    centroids = [(r[id_col], list(r[vec_col])) for r in cent_rows]
    corpus_assigned = ivf_assign(corpus, centroids, id_col, vec_col, n_probe=1).select(
        F.col(id_col).alias("candidate_id"), F.col(vec_col).alias("cv"), "centroid_id"
    )
    query_probes = ivf_assign(queries, centroids, id_col, vec_col, n_probe=N_PROBE).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"), "centroid_id"
    )
    scored = (
        query_probes.join(corpus_assigned, "centroid_id")
        .where(F.col("query_id") != F.col("candidate_id"))
        .select(
            "query_id",
            "candidate_id",
            (F.floor(cosine(F.col("qv"), F.col("cv")) * 10**round_scale + F.lit(0.5))
             / 10**round_scale).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("candidate_id"))
    return scored.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= k)


def cosine_pairs_blocked(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    block_col: str,
    threshold: float,
    round_scale: int = 4,
) -> DataFrame:
    """All pairs within a blocking bucket with cosine ≥ threshold —
    the embedding near-dup primitive. Per-bucket numpy cosine matrix
    via cogrouped applyInPandas: one normalization per vector, one
    GEMM per bucket, upper-triangle thresholding. Work scales with
    Σ bucket², never n²; the bucket is the shuffle key."""
    from collections.abc import Iterator  # noqa: F401 — applyInPandas signature docs

    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    block_field = df.schema[block_col]
    schema = StructType(
        [
            StructField("id_a", LongType()),
            StructField("id_b", LongType()),
            block_field,
            StructField("cos", DoubleType()),
        ]
    )
    k = 10**round_scale

    def pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame(columns=["id_a", "id_b", block_col, "cos"])
        pdf = pdf.sort_values(id_col)
        ids = pdf[id_col].to_numpy()
        vecs = np.array(pdf[vec_col].tolist(), dtype=np.float64)
        normed = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        cos = normed @ normed.T
        cos = np.floor(cos * k + 0.5) / k
        ia, ib = np.triu_indices(len(ids), k=1)
        keep = cos[ia, ib] >= threshold
        return pd.DataFrame(
            {
                "id_a": ids[ia[keep]],
                "id_b": ids[ib[keep]],
                block_col: pdf[block_col].iloc[0],
                "cos": cos[ia[keep], ib[keep]],
            }
        )

    return df.select(id_col, vec_col, block_col).groupBy(block_col).applyInPandas(pairs, schema)


def cosine_topk_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    round_scale: int = 4,
) -> DataFrame:
    """ANN variant: score only candidates in the query's LSH bucket.
    Recall < 1 by design (pytest checks recall vs brute force); the
    candidate join is bucket-equi, so corpus work is bucket-local."""
    q = lsh_bucket(queries, id_col, vec_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"), "bucket"
    )
    c = lsh_bucket(corpus, id_col, vec_col).select(
        F.col(id_col).alias("candidate_id"), F.col(vec_col).alias("cv"), "bucket"
    )
    scored = (
        q.join(c, "bucket")
        .where(F.col("query_id") != F.col("candidate_id"))
        .select(
            "query_id",
            "candidate_id",
            (F.floor(cosine(F.col("qv"), F.col("cv")) * 10**round_scale + F.lit(0.5))
             / 10**round_scale).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("candidate_id"))
    return scored.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= k)
