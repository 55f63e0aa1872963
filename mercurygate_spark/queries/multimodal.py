"""Multimodal-column queries (north-star surface): binary payload →
typed metadata via Arrow-batched mapInPandas, oracle-checked because
the decode is deterministic byte arithmetic DuckDB can replay: real
header parsing for image containers, sha256-derived placeholders for
everything else.

Oracle fidelity note: the testdata payloads are utf-8 text bytes. A
valid UTF-8 string CAN begin with the ASCII GIF signature ('GIF87a'/
'GIF89a'), so the oracle replays the GIF branch byte-for-byte; it
CANNOT begin with the PNG (0x89) or JPEG (0xFF) signature bytes —
both are invalid UTF-8 lead bytes — so those branches are exercised
by unit tests on real fixture bytes instead
(tests/test_operators.py::test_image_header_parsing).
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

# Shared oracle CTE: decode_meta() replayed in SQL over the documents
# table's utf-8 bytes (GIF header branch + sha256 placeholder branch).
_META_CTE = """
    WITH b AS (
      SELECT doc_id, text, encode(text) AS p,
             octet_length(encode(text)) AS n, sha256(text) AS sh
      FROM documents
    ), meta AS (
      SELECT doc_id,
             n AS n_bytes,
             substr(sh, 1, 16) AS sha16,
             -- little-endian u16 at payload bytes 7-8 / 9-10, read out
             -- of the hex dump (byte k = substr(hex, (k-1)*2+1, 2))
             CASE WHEN n >= 10 AND substring(text, 1, 6) IN ('GIF87a', 'GIF89a')
                  THEN ('0x' || substr(hex(p), 15, 2) || substr(hex(p), 13, 2))::BIGINT
                  ELSE ('0x' || substr(sh, 1, 4))::BIGINT % 1920 + 1
             END AS width,
             CASE WHEN n >= 10 AND substring(text, 1, 6) IN ('GIF87a', 'GIF89a')
                  THEN ('0x' || substr(hex(p), 19, 2) || substr(hex(p), 17, 2))::BIGINT
                  ELSE ('0x' || substr(sh, 5, 4))::BIGINT % 1080 + 1
             END AS height,
             CASE WHEN n >= 10 AND substring(text, 1, 6) IN ('GIF87a', 'GIF89a')
                  THEN 'gif' ELSE 'unknown'
             END AS format
      FROM b
    )
"""


@query(
    "multimodal_meta",
    oracle=f"""
    {_META_CTE}
    SELECT doc_id, n_bytes, sha16, width, height, format FROM meta
    """,
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata extraction: documents' utf-8 bytes stand
    in for image payloads; mapInPandas streams Arrow batches through
    decode_meta — real PNG/JPEG/GIF header dimensions when the bytes
    are an image container, content-derived placeholders otherwise."""
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
    oracle=f"""
    {_META_CTE}
    SELECT format,
           width // 480 AS width_bucket,
           count(*) AS n_payloads,
           sum(n_bytes) AS total_bytes,
           max(n_bytes) AS max_bytes
    FROM meta GROUP BY 1, 2
    """,
)
def multimodal_partition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-extract rollup over the decoded metadata — the shape of a
    real corpus-stats job (bytes per format × width bucket). Runs
    entirely on the mapInPandas output; proves the extracted schema
    composes with ordinary grouped aggregation."""
    t = load_tables(spark, sf_dir, "documents")
    meta = extract_binary_meta(documents_as_binary(t["documents"]))
    return meta.groupBy("format", F.expr("width div 480").alias("width_bucket")).agg(
        F.count("*").alias("n_payloads"),
        F.sum("n_bytes").alias("total_bytes"),
        F.max("n_bytes").alias("max_bytes"),
    )
