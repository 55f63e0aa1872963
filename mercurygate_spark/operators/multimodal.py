"""Multimodal column plumbing (north-star surface): image/audio/video
as opaque ``binary`` columns + typed metadata, processed by
Arrow-batched pandas UDFs over ``mapInPandas``.

Image metadata (format, width, height) is parsed DIRECTLY from the
container headers — PNG IHDR chunk, JPEG SOFn segment, GIF logical
screen descriptor — with zero image-library dependencies (the byte
layouts are public file-format specifications). Payloads that are not
one of these containers get deterministic content-derived placeholder
metadata (sha256 arithmetic) so the pipeline stays total and the
DuckDB oracle can replay every branch.

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
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("format", StringType()),
    ]
)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# JPEG SOFn markers carry the frame dimensions; C4=DHT, C8=JPG
# extension, CC=DAC are in the C0-CF range but are NOT frame headers.
_JPEG_NON_SOF = {0xC4, 0xC8, 0xCC}


def parse_image_header(payload: bytes) -> tuple[str, int, int] | None:
    """(format, width, height) parsed from raw bytes for PNG / JPEG /
    GIF, or None when the payload is none of those. Pure byte
    arithmetic from the public format specs:

    - PNG: 8-byte signature, then the IHDR chunk is mandatory-first —
      big-endian u32 width at offset 16, height at 20.
    - GIF: 'GIF87a'/'GIF89a', little-endian u16 logical-screen width
      at offset 6, height at 8.
    - JPEG: SOI (FFD8), then marker segments; the first SOFn segment
      holds big-endian u16 height at +5, width at +7.
    """
    n = len(payload)
    if n >= 24 and payload[:8] == _PNG_SIG and payload[12:16] == b"IHDR":
        return (
            "png",
            int.from_bytes(payload[16:20], "big"),
            int.from_bytes(payload[20:24], "big"),
        )
    if n >= 10 and payload[:6] in (b"GIF87a", b"GIF89a"):
        return (
            "gif",
            int.from_bytes(payload[6:8], "little"),
            int.from_bytes(payload[8:10], "little"),
        )
    if n >= 4 and payload[:2] == b"\xff\xd8":
        i = 2
        while i + 4 <= n and payload[i] == 0xFF:
            marker = payload[i + 1]
            if marker == 0xFF:  # fill byte
                i += 1
                continue
            if marker == 0x01 or 0xD0 <= marker <= 0xD9:  # standalone marker
                i += 2
                continue
            seg_len = int.from_bytes(payload[i + 2 : i + 4], "big")
            if 0xC0 <= marker <= 0xCF and marker not in _JPEG_NON_SOF:
                if i + 9 > n:
                    return None  # truncated SOF
                return (
                    "jpeg",
                    int.from_bytes(payload[i + 7 : i + 9], "big"),
                    int.from_bytes(payload[i + 5 : i + 7], "big"),
                )
            if seg_len < 2:
                return None  # malformed segment length
            i += 2 + seg_len
    return None


def decode_meta(payload: bytes) -> tuple[int, str, int, int, str]:
    """(n_bytes, sha16, width, height, format) for any payload: real
    header dimensions for PNG/JPEG/GIF; for everything else,
    deterministic sha256-derived placeholder dimensions and format
    'unknown' (content-addressed, so the DuckDB oracle replays it)."""
    h = hashlib.sha256(payload).hexdigest()
    n = len(payload)
    parsed = parse_image_header(payload)
    if parsed is not None:
        fmt, w, ht = parsed
        return n, h[:16], w, ht, fmt
    w = (int(h[:4], 16) % 1920) + 1
    ht = (int(h[4:8], 16) % 1080) + 1
    return n, h[:16], w, ht, "unknown"


AUDIO_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("sha16", StringType()),
        StructField("format", StringType()),
        StructField("sample_rate", LongType()),
        StructField("channels", LongType()),
        StructField("bits_per_sample", LongType()),
    ]
)


def parse_audio_header(payload: bytes) -> tuple[str, int, int, int] | None:
    """(format, sample_rate, channels, bits_per_sample) parsed from raw
    bytes for canonical WAV / FLAC containers, or None. Pure byte
    arithmetic from the public format specs:

    - WAV: 'RIFF' + size + 'WAVE', with the 'fmt ' chunk REQUIRED at
      offset 12 (canonical layout; written by virtually every encoder).
      LE u16 channels at 22, LE u32 sample rate at 24, LE u16 bits at
      34. Non-canonical chunk orders fall through to the placeholder
      branch on purpose — the strict layout keeps the decode exactly
      replayable by the DuckDB oracle.
    - FLAC: 'fLaC' magic, then the STREAMINFO block (type 0,
      mandatory-first): 20-bit sample rate starting at byte 18,
      3-bit channels-1 and 5-bit bits-1 packed after it.
    """
    n = len(payload)
    if (
        n >= 36
        and payload[:4] == b"RIFF"
        and payload[8:12] == b"WAVE"
        and payload[12:16] == b"fmt "
    ):
        ch = int.from_bytes(payload[22:24], "little")
        sr = int.from_bytes(payload[24:28], "little")
        bits = int.from_bytes(payload[34:36], "little")
        return "wav", sr, ch, bits
    if n >= 22 and payload[:4] == b"fLaC" and (payload[4] & 0x7F) == 0:
        b18, b19, b20, b21 = payload[18], payload[19], payload[20], payload[21]
        sr = (b18 << 12) | (b19 << 4) | (b20 >> 4)
        ch = ((b20 >> 1) & 0x7) + 1
        bits = (((b20 & 1) << 4) | (b21 >> 4)) + 1
        return "flac", sr, ch, bits
    return None


def decode_audio_meta(payload: bytes) -> tuple[int, str, str, int, int, int]:
    """(n_bytes, sha16, format, sample_rate, channels, bits) for any
    payload: real header fields for WAV/FLAC; deterministic
    sha256-derived placeholders (format 'unknown') otherwise, so the
    pipeline is total and the DuckDB oracle replays every branch."""
    h = hashlib.sha256(payload).hexdigest()
    n = len(payload)
    parsed = parse_audio_header(payload)
    if parsed is not None:
        fmt, sr, ch, bits = parsed
        return n, h[:16], fmt, sr, ch, bits
    sr = (int(h[8:12], 16) % 48000) + 4000
    ch = (int(h[12], 16) % 2) + 1
    bits = 8 * ((int(h[13], 16) % 2) + 1)
    return n, h[:16], "unknown", sr, ch, bits


def extract_audio_meta(df: DataFrame, id_col: str = "doc_id", bin_col: str = "payload") -> DataFrame:
    """(id, binary) → audio metadata via mapInPandas (Arrow-batched,
    same template as extract_binary_meta — nothing on the driver)."""
    import pandas as pd

    def audio_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                (int(i), *decode_audio_meta(bytes(p)))
                for i, p in zip(pdf[id_col], pdf[bin_col])
            ]
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "n_bytes",
                    "sha16",
                    "format",
                    "sample_rate",
                    "channels",
                    "bits_per_sample",
                ],
            )

    return df.select(F.col(id_col), F.col(bin_col)).mapInPandas(
        audio_batches, AUDIO_META_SCHEMA
    )


def extract_binary_meta(df: DataFrame, id_col: str = "doc_id", bin_col: str = "payload") -> DataFrame:
    """(id, binary) → typed metadata via mapInPandas (Arrow-batched).

    This is the template every real decode/resize/frame-sample op
    follows: per-batch pandas transform, explicit output StructType,
    no driver involvement."""
    import pandas as pd

    def meta_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                (int(i), *decode_meta(bytes(p)))
                for i, p in zip(pdf[id_col], pdf[bin_col])
            ]
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_bytes", "sha16", "width", "height", "format"],
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
