"""Multimodal-column queries (north-star surface): binary payload →
typed metadata via Arrow-batched mapInPandas, oracle-checked because
the stub decode derives metadata deterministically from the bytes
(sha256 arithmetic DuckDB can replay).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mercurygate_spark.operators.multimodal import (
    documents_as_binary,
    extract_binary_meta,
    sample_frames,
)
from mercurygate_spark.queries.registry import load_tables, query


@query(
    "multimodal_meta",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           substr(sha256(text), 1, 16) AS sha16,
           ('0x' || substr(sha256(text), 1, 4))::BIGINT % 1920 + 1 AS fake_width,
           ('0x' || substr(sha256(text), 5, 4))::BIGINT % 1080 + 1 AS fake_height,
           CASE octet_length(encode(text)) % 3
             WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'webp'
           END AS fake_format
    FROM documents
    """,
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata extraction: documents' utf-8 bytes stand
    in for image payloads; mapInPandas streams Arrow batches through
    the (stubbed) decoder. The real-image path only swaps
    operators.multimodal.fake_decode_meta for decode_image."""
    t = load_tables(spark, sf_dir, "documents")
    return extract_binary_meta(documents_as_binary(t["documents"]))


@query(
    "multimodal_frame_sample",
    oracle="""
    WITH blobs AS (
      SELECT doc_id, hex(encode(text)) AS bh, octet_length(encode(text)) AS n
      FROM documents
    ), idx AS (SELECT unnest(range(4)) AS frame_idx)
    SELECT doc_id,
           frame_idx::INT AS frame_idx,
           (frame_idx * (n // 4))::BIGINT AS frame_offset,
           substr(bh, (frame_idx * (n // 4))::INT * 2 + 1, 16) AS frame_hex
    FROM blobs, idx
    WHERE n >= 32
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over binary payloads: 4 fixed-stride 8-byte
    windows per blob (deterministic stand-in for decode+every-kth-frame
    — operators.multimodal.sample_frames). Oracle replays the exact
    offset arithmetic on the same bytes."""
    t = load_tables(spark, sf_dir, "documents")
    return sample_frames(documents_as_binary(t["documents"]))


@query(
    "multimodal_partition_stats",
    oracle="""
    SELECT CASE octet_length(encode(text)) % 3
             WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'webp'
           END AS fake_format,
           count(*) AS n_payloads,
           sum(octet_length(encode(text))) AS total_bytes,
           max(octet_length(encode(text))) AS max_bytes
    FROM documents
    GROUP BY 1
    """,
)
def multimodal_partition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-extract rollup over the decoded metadata — the shape of a
    real corpus-stats job (bytes per modality/format). Runs entirely on
    the mapInPandas output; proves the extracted schema composes with
    ordinary grouped aggregation."""
    t = load_tables(spark, sf_dir, "documents")
    meta = extract_binary_meta(documents_as_binary(t["documents"]))
    return meta.groupBy("fake_format").agg(
        F.count("*").alias("n_payloads"),
        F.sum("n_bytes").alias("total_bytes"),
        F.max("n_bytes").alias("max_bytes"),
    )
