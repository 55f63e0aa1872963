"""Multimodal column plumbing (north-star surface): image/audio/video
as opaque ``binary`` columns + typed metadata, processed by
Arrow-batched pandas UDFs over ``mapInPandas``.

The decode step itself (PIL/ffmpeg) is STUBBED — those libraries are
not in this container — behind ``decode_image``/``decode_audio`` which
raise NotImplementedError, with a deterministic fake
(``fake_decode_meta``) standing in so the Spark-side plumbing (schema,
batching, partitioning, UDF signature) is real and tested end-to-end.

Scale notes: mapInPandas streams Arrow record batches — constant
memory per task regardless of partition size; binary payloads never
pass through the driver. Set spark.sql.files.maxPartitionBytes down
when average blob size is large so a task's batch fits in memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("sha16", StringType()),  # first 16 hex chars of sha256
        StructField("fake_width", LongType()),
        StructField("fake_height", LongType()),
        StructField("fake_format", StringType()),
    ]
)


def decode_image(payload: bytes):
    """Real image decode — requires PIL, not available in this
    container. The plumbing that would call it is fully wired; swap
    this stub for ``PIL.Image.open(io.BytesIO(payload))`` on a cluster
    with the dependency installed."""
    raise NotImplementedError("image decoding requires PIL; container ships without it")


def decode_audio(payload: bytes):
    """Real audio decode — requires soundfile/ffmpeg; see decode_image."""
    raise NotImplementedError("audio decoding requires soundfile/ffmpeg")


def fake_decode_meta(payload: bytes) -> tuple[int, str, int, int, str]:
    """Deterministic stand-in for decode: metadata derived purely from
    the bytes (sha256-based), so tests and the DuckDB oracle can verify
    the full pipeline without an image library."""
    h = hashlib.sha256(payload).hexdigest()
    n = len(payload)
    fake_w = (int(h[:4], 16) % 1920) + 1
    fake_h = (int(h[4:8], 16) % 1080) + 1
    fake_format = ["png", "jpeg", "webp"][n % 3]
    return n, h[:16], fake_w, fake_h, fake_format


def extract_binary_meta(df: DataFrame, id_col: str = "doc_id", bin_col: str = "payload") -> DataFrame:
    """(id, binary) → typed metadata via mapInPandas (Arrow-batched).

    This is the template every real decode/resize/frame-sample op
    follows: per-batch pandas transform, explicit output StructType,
    no driver involvement."""
    import pandas as pd

    def meta_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                (int(i), *fake_decode_meta(bytes(p)))
                for i, p in zip(pdf[id_col], pdf[bin_col])
            ]
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_bytes", "sha16", "fake_width", "fake_height", "fake_format"],
            )

    return df.select(F.col(id_col), F.col(bin_col)).mapInPandas(meta_batches, META_SCHEMA)


N_FRAMES = 4
FRAME_BYTES = 8


def sample_frames(df: DataFrame, id_col: str = "doc_id", bin_col: str = "payload") -> DataFrame:
    """Frame sampling for video-like payloads: N_FRAMES fixed-stride
    byte windows per blob (the deterministic stand-in for 'decode and
    take every k-th frame'). Payloads shorter than N_FRAMES*FRAME_BYTES
    are skipped — a real sampler would pad. mapInPandas again: batch
    in, exploded frame rows out, schema declared."""
    import pandas as pd
    from collections.abc import Iterator

    from pyspark.sql.types import IntegerType, LongType, StringType, StructField, StructType

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("frame_idx", IntegerType()),
            StructField("frame_offset", LongType()),
            StructField("frame_hex", StringType()),
        ]
    )

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, p in zip(pdf[id_col], pdf[bin_col]):
                b = bytes(p)
                n = len(b)
                if n < N_FRAMES * FRAME_BYTES:
                    continue
                stride = n // N_FRAMES
                for i in range(N_FRAMES):
                    off = i * stride
                    rows.append((int(did), i, off, b[off : off + FRAME_BYTES].hex().upper()))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame_offset", "frame_hex"])

    return df.select(id_col, bin_col).mapInPandas(frames, schema)


def documents_as_binary(df: DataFrame) -> DataFrame:
    """Adapter for testdata: treat utf-8 text bytes as the opaque
    payload column (the container has no real image fixtures)."""
    return df.select("doc_id", F.encode("text", "UTF-8").alias("payload"))


_ = BinaryType  # re-export hint: payload columns are BinaryType
