"""Multimodal column operators: image/audio/video as opaque binary columns
with typed metadata (north-star surface, BASELINE.json).

Design: media bytes live in a `binary` column next to typed metadata
(media_type, width/height/duration, codec); decode / feature-extraction /
resize / frame-sampling run as Arrow-batched pandas iterators via
mapInPandas, so each task streams record batches without materializing
the full partition.

Decode surface: container formats whose headers are parseable in pure
Python (PPM/PGM, BMP, WAV) are decoded for real in ``decode_media_metadata``
— dimensions / sample rate / duration straight from the bytes, no codec
library. Compressed codecs (JPEG/PNG entropy decode, video streams) remain
STUBBED behind ``_decode_image`` — those genuinely need PIL/opencv/ffmpeg,
absent in this container. The Spark-side plumbing (schema, Arrow batching,
partitioning, UDF signatures) is real and tested either way.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),  # 'image' | 'audio' | 'video'
        StructField("content", BinaryType()),
        StructField("width", IntegerType()),  # image/video
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),  # audio/video
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("content_hash", StringType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def _decode_image(content: bytes) -> "object":
    """STUB — pixel decoding of COMPRESSED codecs (JPEG/PNG entropy coding,
    video streams) requires a codec library (PIL / opencv / ffmpeg), absent
    in this container. Header metadata for uncompressed containers
    (PPM/PGM/BMP/WAV) IS decoded for real — see ``decode_media_metadata``."""
    raise NotImplementedError("JPEG/PNG/video pixel decode requires PIL/opencv/ffmpeg; not available in this environment")


# ---------------------------------------------------------------------------
# Pure-python header decoders (no codec libraries needed)
# ---------------------------------------------------------------------------

METADATA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("fmt", StringType()),  # 'ppm' | 'pgm' | 'bmp' | 'wav' | None
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("sample_rate", IntegerType()),  # audio only
        StructField("duration_ms", LongType()),  # audio only
        StructField("err", StringType()),  # None on success
    ]
)


def _parse_pnm(b: bytes) -> dict:
    """Netpbm P5 (PGM) / P6 (PPM) header: ASCII tokens ``magic w h maxval``
    separated by whitespace, ``#`` comments allowed between tokens."""
    magic = b[:2]
    fmt = "pgm" if magic == b"P5" else "ppm"
    tokens: list[int] = []
    i = 2
    while len(tokens) < 3 and i < min(len(b), 512):
        c = b[i : i + 1]
        if c == b"#":  # comment to end of line
            while i < len(b) and b[i : i + 1] not in (b"\n", b"\r"):
                i += 1
        elif c.isspace():
            i += 1
        elif c.isdigit():
            j = i
            while j < len(b) and b[j : j + 1].isdigit():
                j += 1
            tokens.append(int(b[i:j]))
            i = j
        else:
            raise ValueError(f"bad PNM header byte {c!r}")
    if len(tokens) < 3:
        raise ValueError("truncated PNM header")
    w, h, _maxval = tokens
    return {"fmt": fmt, "width": w, "height": h, "channels": 3 if fmt == "ppm" else 1}


def _parse_bmp(b: bytes) -> dict:
    """BMP: 14-byte file header then a DIB header whose first u32 is its own
    size — 12 = BITMAPCOREHEADER (u16 dims), >=40 = BITMAPINFOHEADER
    (i32 dims; negative height = top-down row order)."""
    if len(b) < 26:
        raise ValueError("truncated BMP")
    dib_size = struct.unpack_from("<I", b, 14)[0]
    if dib_size == 12:
        w, h = struct.unpack_from("<HH", b, 18)
        planes, bpp = struct.unpack_from("<HH", b, 22)
    elif dib_size >= 40:
        w, h = struct.unpack_from("<ii", b, 18)
        planes, bpp = struct.unpack_from("<HH", b, 26)
    else:
        raise ValueError(f"unknown BMP DIB header size {dib_size}")
    if w <= 0 or h == 0 or bpp not in (1, 4, 8, 16, 24, 32):
        raise ValueError(f"implausible BMP dims/bpp: {w}x{h}@{bpp}")
    return {"fmt": "bmp", "width": int(w), "height": abs(int(h)), "channels": max(1, bpp // 8)}


def _parse_wav(b: bytes) -> dict:
    """WAV: RIFF container walk — ``fmt `` chunk gives channels/rate/bits,
    ``data`` chunk size gives duration via the byte rate."""
    if len(b) < 12 or b[8:12] != b"WAVE":
        raise ValueError("not a WAVE RIFF")
    channels = rate = bits = None
    data_size = None
    i = 12
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        (csize,) = struct.unpack_from("<I", b, i + 4)
        if cid == b"fmt " and i + 24 <= len(b):
            channels, rate = struct.unpack_from("<HI", b, i + 10)
            (bits,) = struct.unpack_from("<H", b, i + 22)
        elif cid == b"data":
            data_size = csize
        i += 8 + csize + (csize & 1)  # chunks are word-aligned
    if not channels or not rate or not bits or data_size is None:
        raise ValueError("missing fmt/data chunk")
    if bits < 8:
        # sub-byte sample formats (e.g. 4-bit IMA ADPCM) would make the PCM
        # byte-rate formula divide by zero — reject as a row-level error
        raise ValueError(f"unsupported bits_per_sample {bits} (< 8)")
    byte_rate = rate * channels * (bits // 8)
    return {
        "fmt": "wav",
        "channels": int(channels),
        "sample_rate": int(rate),
        "duration_ms": int(data_size * 1000 // byte_rate),
    }


def _decode_header(b: bytes) -> dict:
    if b[:2] in (b"P5", b"P6"):
        return _parse_pnm(b)
    if b[:2] == b"BM":
        return _parse_bmp(b)
    if b[:4] == b"RIFF":
        return _parse_wav(b)
    raise NotImplementedError(
        "unsupported container; compressed codecs (JPEG/PNG/video) need PIL/opencv/ffmpeg"
    )


def decode_media_metadata(media: DataFrame) -> DataFrame:
    """Real (non-stub) metadata decode for PPM/PGM/BMP/WAV binary columns,
    pure Python, Arrow-batched via mapInPandas. Unknown / compressed formats
    yield a row with ``err`` set rather than failing the task, so one bad
    blob cannot kill a 100 TB scan (row-level error channel, not task retry)."""

    cols = ["media_id", "content"]

    def proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                row = {
                    "media_id": mid,
                    "fmt": None,
                    "width": None,
                    "height": None,
                    "channels": None,
                    "sample_rate": None,
                    "duration_ms": None,
                    "err": None,
                }
                try:
                    if content is None:
                        raise ValueError("null content")
                    row.update(_decode_header(bytes(content)))
                except (ValueError, NotImplementedError, struct.error, TypeError, ZeroDivisionError) as exc:
                    row["err"] = str(exc)
                rows.append(row)
            out = pd.DataFrame(rows, columns=[f.name for f in METADATA_SCHEMA.fields])
            for c in ("width", "height", "channels", "sample_rate"):
                out[c] = out[c].astype("Int32")
            out["duration_ms"] = out["duration_ms"].astype("Int64")
            yield out

    return media.select(*cols).mapInPandas(proc, METADATA_SCHEMA)


def _fake_features(content: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a decoded-media feature vector: md5-seeded
    pseudo-features so downstream plumbing (similarity joins, dedup) is
    testable without codecs. Replace with a real extractor in production."""
    h = hashlib.md5(content).digest()
    return [h[i] / 255.0 for i in range(dim)]


def extract_media_features(media: DataFrame, batch_feature_dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over binary media columns via
    mapInPandas: each task receives an iterator of pandas record batches
    (bounded memory regardless of partition size) and yields feature rows.

    At 100 TB: media rows are large → keep spark.sql.files.maxPartitionBytes
    moderate, and rely on the iterator-of-batches form below (never collect
    a whole partition into one pandas frame)."""

    dim = batch_feature_dim

    def proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["content"].map(len).astype("int64"),
                    "content_hash": pdf["content"].map(lambda b: hashlib.md5(b).hexdigest()),
                    "features": pdf["content"].map(lambda b: _fake_features(bytes(b), dim)),
                }
            )

    return media.mapInPandas(proc, FEATURE_SCHEMA)


def sample_video_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video rows: emits (media_id, frame_ts_ms)
    rows via sequence/explode — the decode of each frame is the stubbed
    kernel; the partition-parallel frame ENUMERATION is real Spark."""
    video = media.filter(F.col("media_type") == "video")
    return video.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))).alias("frame_ts_ms"),
    )


def media_dedup_by_content(media: DataFrame) -> DataFrame:
    """Exact media dedup by content hash (binary-safe md5) — same
    hash-groupBy shape as text exact dedup; shuffles 16-byte digests."""
    return (
        media.select("media_id", F.md5(F.col("content")).alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.count("*").alias("n_copies"), F.min("media_id").alias("canonical_id"))
        .filter(F.col("n_copies") > 1)
    )


AUDIO_ENERGY_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("window_idx", IntegerType()),
        StructField("channel", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("sum_sq", LongType()),
        StructField("peak", IntegerType()),
    ]
)


def _parse_wav_pcm(b: bytes) -> tuple[int, int, int, int, int]:
    """Like ``_parse_wav`` but also returns the data chunk's byte offset so
    the PCM payload itself can be decoded: (channels, rate, bits,
    data_offset, data_size)."""
    if len(b) < 12 or b[8:12] != b"WAVE":
        raise ValueError("not a WAVE RIFF")
    channels = rate = bits = None
    data_off = data_size = None
    i = 12
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        (csize,) = struct.unpack_from("<I", b, i + 4)
        if cid == b"fmt " and i + 24 <= len(b):
            channels, rate = struct.unpack_from("<HI", b, i + 10)
            (bits,) = struct.unpack_from("<H", b, i + 22)
        elif cid == b"data":
            data_off, data_size = i + 8, csize
        i += 8 + csize + (csize & 1)
    if not channels or not rate or not bits or data_off is None:
        raise ValueError("missing fmt/data chunk")
    if bits != 16:
        raise ValueError(f"audio energy requires 16-bit PCM, got {bits}")
    return int(channels), int(rate), int(bits), data_off, int(data_size)


def audio_energy_windows(media: DataFrame, window_ms: int = 100) -> DataFrame:
    """Windowed audio-energy profile over PCM16 WAV blobs — the audio
    feature-extraction pattern (VAD energy gating, silence trimming,
    loudness normalization stats) in its Spark shape: Arrow-batched
    ``mapInPandas``, numpy-vectorized per blob (frombuffer → reshape
    (frames, channels) → per-window reductions), emitting one row per
    (media_id, window, channel) with INTEGER sum-of-squares and peak so
    downstream math (and the certificate oracle) is exact — RMS is
    sqrt(sum_sq / n_samples) whenever a float is actually wanted.

    Scale shape: partition-parallel over media rows, zero shuffle; output
    size is duration/window per row, independent of sample rate. Malformed
    or non-PCM16 blobs are skipped (row-level tolerance, same policy as
    ``decode_media_metadata``'s err channel)."""

    def proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        cols = [f.name for f in AUDIO_ENERGY_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                try:
                    if content is None:
                        raise ValueError("null content")
                    b = bytes(content)
                    ch, rate, _bits, off, dsize = _parse_wav_pcm(b)
                    n_vals = min(dsize, len(b) - off) // 2
                    frames = n_vals // ch
                    if frames == 0:
                        continue
                    x = (
                        np.frombuffer(b, dtype="<i2", count=frames * ch, offset=off)
                        .reshape(frames, ch)
                        .astype(np.int64)
                    )
                    win = max(rate * window_ms // 1000, 1)
                    for w in range((frames + win - 1) // win):
                        seg = x[w * win : (w + 1) * win]
                        ss = (seg * seg).sum(axis=0)
                        pk = np.abs(seg).max(axis=0)
                        for c in range(ch):
                            rows.append(
                                {
                                    "media_id": int(mid),
                                    "window_idx": w,
                                    "channel": c,
                                    "n_samples": int(seg.shape[0]),
                                    "sum_sq": int(ss[c]),
                                    "peak": int(pk[c]),
                                }
                            )
                except (ValueError, struct.error, TypeError):
                    continue
            yield pd.DataFrame(rows, columns=cols)

    return media.select("media_id", "content").mapInPandas(proc, AUDIO_ENERGY_SCHEMA)


IMAGE_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("channel", IntegerType()),
        StructField("n_pixels", LongType()),
        StructField("sum_val", LongType()),
        StructField("min_val", IntegerType()),
        StructField("max_val", IntegerType()),
        StructField("stride2_sum", LongType()),
    ]
)


def image_channel_stats(media: DataFrame) -> DataFrame:
    """Sample-level image statistics over binary P6 (RGB) PPM blobs — the
    image feature-extraction pattern (channel means for normalization,
    min/max for exposure checks, strided downsample as the resize
    primitive) in its Spark shape: Arrow-batched ``mapInPandas``,
    numpy-vectorized per blob (frombuffer → reshape (h, w, 3) → per-channel
    reductions + a stride-2 nearest-neighbor subsample). All-integer
    outputs, so downstream math has no float hazards.

    Scale shape: partition-parallel over media rows, zero shuffle; output
    is 3 rows per image regardless of resolution. Malformed rasters
    (truncated, non-P6, null) are skipped row-level, same policy as
    ``audio_energy_windows``."""

    def proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        cols = [f.name for f in IMAGE_STATS_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                try:
                    if content is None:
                        raise ValueError("null content")
                    b = bytes(content)
                    # header: P6 <w> <h> <maxval> then EXACTLY ONE
                    # whitespace byte before the raster (PPM spec) — a
                    # whitespace-split would eat raster bytes that happen
                    # to be 0x20/0x0a, so anchor with a regex instead
                    import re as _re

                    m = _re.match(rb"P6\s+(\d+)\s+(\d+)\s+(\d+)\s", b)
                    if not m:
                        raise ValueError("not a P6 PPM")
                    if int(m.group(3)) > 255:
                        # maxval > 255 means 2-byte samples per the PPM
                        # spec — skip like any other unsupported format
                        # instead of silently misreading it as 8-bit
                        raise ValueError("16-bit PPM unsupported")
                    w, h = int(m.group(1)), int(m.group(2))
                    raster = np.frombuffer(b, dtype=np.uint8, offset=m.end())
                    if raster.size < w * h * 3:
                        raise ValueError("truncated raster")
                    img = raster[: w * h * 3].reshape(h, w, 3).astype(np.int64)
                    sub = img[::2, ::2, :]
                    for c in range(3):
                        ch = img[:, :, c]
                        rows.append(
                            {
                                "media_id": int(mid),
                                "channel": c,
                                "n_pixels": int(ch.size),
                                "sum_val": int(ch.sum()),
                                "min_val": int(ch.min()),
                                "max_val": int(ch.max()),
                                "stride2_sum": int(sub[:, :, c].sum()),
                            }
                        )
                except (ValueError, TypeError):
                    continue
            yield pd.DataFrame(rows, columns=cols)

    return media.select("media_id", "content").mapInPandas(proc, IMAGE_STATS_SCHEMA)
