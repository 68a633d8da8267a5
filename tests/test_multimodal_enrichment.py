"""Tests for multimodal binary-column plumbing and the ORA enrichment stack."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", bytes([1, 2, 3, 4]), 64, 64, None),
        (2, "image", bytes([1, 2, 3, 4]), 64, 64, None),  # exact dup of 1
        (3, "image", bytes([9, 9, 9]), 32, 32, None),
        (4, "video", bytes([7] * 10), 640, 480, 3500),
        (5, "audio", bytes([5] * 6), None, None, 2000),
    ]
    from utils_spark.operators.multimodal import MEDIA_SCHEMA

    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_extract_media_features_plumbing(media):
    from utils_spark.operators.multimodal import extract_media_features

    out = {r["media_id"]: r for r in extract_media_features(media).collect()}
    assert len(out) == 5
    assert out[1]["n_bytes"] == 4 and len(out[1]["features"]) == 8
    # identical content → identical hash and features; different → different
    assert out[1]["content_hash"] == out[2]["content_hash"]
    assert out[1]["features"] == out[2]["features"]
    assert out[1]["content_hash"] != out[3]["content_hash"]
    assert all(0.0 <= x <= 1.0 for x in out[4]["features"])


def test_media_dedup_by_content(media):
    from utils_spark.operators.multimodal import media_dedup_by_content

    dups = media_dedup_by_content(media).collect()
    assert len(dups) == 1
    assert dups[0]["n_copies"] == 2 and dups[0]["canonical_id"] == 1


def test_sample_video_frames(media):
    from utils_spark.operators.multimodal import sample_video_frames

    frames = sample_video_frames(media, every_ms=1000).collect()
    ts = sorted(r["frame_ts_ms"] for r in frames)
    assert ts == [0, 1000, 2000, 3000]  # 3500ms video sampled at 1s


def test_decode_stub_is_explicit():
    from utils_spark.operators.multimodal import _decode_image

    with pytest.raises(NotImplementedError):
        _decode_image(b"\x89PNG")


def _make_ppm(w: int, h: int) -> bytes:
    # comment in the header exercises the comment-skipping branch
    return b"P6\n# test fixture\n%d %d\n255\n" % (w, h) + bytes(w * h * 3)


def _make_pgm(w: int, h: int) -> bytes:
    return b"P5 %d %d 255 " % (w, h) + bytes(w * h)


def _make_bmp(w: int, h: int, top_down: bool = False) -> bytes:
    import struct

    h_field = -h if top_down else h
    row = (w * 3 + 3) & ~3  # 4-byte aligned rows
    pixels = bytes(row * h)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h_field, 1, 24, 0, len(pixels), 2835, 2835, 0, 0)
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(pixels), 0, 0, 14 + 40)
    return header + dib + pixels


def _make_wav(rate: int, channels: int, bits: int, n_samples: int) -> bytes:
    import struct

    data = bytes(n_samples * channels * (bits // 8))
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * bits // 8, channels * bits // 8, bits)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt + b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_decode_media_metadata_real_formats(spark):
    """The pure-python header decoders are REAL (not the fake-features stub):
    dimensions / sample rate / duration come from the actual bytes."""
    from utils_spark.operators.multimodal import MEDIA_SCHEMA, decode_media_metadata

    rows = [
        (1, "image", _make_ppm(17, 9), None, None, None),
        (2, "image", _make_pgm(5, 7), None, None, None),
        (3, "image", _make_bmp(33, 12), None, None, None),
        (4, "image", _make_bmp(8, 6, top_down=True), None, None, None),
        (5, "audio", _make_wav(8000, 2, 16, 12000), None, None, None),
        (6, "image", b"\x89PNG\r\n\x1a\n" + bytes(32), None, None, None),  # unsupported
        (7, "image", b"P6 garbage", None, None, None),  # malformed
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in decode_media_metadata(df).collect()}

    assert (out[1]["fmt"], out[1]["width"], out[1]["height"], out[1]["channels"]) == ("ppm", 17, 9, 3)
    assert (out[2]["fmt"], out[2]["width"], out[2]["height"], out[2]["channels"]) == ("pgm", 5, 7, 1)
    assert (out[3]["fmt"], out[3]["width"], out[3]["height"], out[3]["channels"]) == ("bmp", 33, 12, 3)
    assert (out[4]["width"], out[4]["height"]) == (8, 6)  # top-down height abs()ed
    assert (out[5]["fmt"], out[5]["sample_rate"], out[5]["channels"]) == ("wav", 8000, 2)
    assert out[5]["duration_ms"] == 1500  # 12000 samples @ 8 kHz
    assert out[6]["fmt"] is None and "unsupported" in out[6]["err"]
    assert out[7]["fmt"] is None and out[7]["err"] is not None  # row-level error, task survived


def _hypergeom_sf_ref(k, M, n, N):
    """Reference via exact combinatorics (math.comb — stdlib, exact ints)."""
    from math import comb

    hi = min(n, N)
    return sum(comb(n, x) * comb(M - n, N - x) for x in range(k, hi + 1)) / comb(M, N)


def test_hypergeom_sf_matches_exact():
    from utils_spark.operators.enrichment import _hypergeom_sf

    cases = [(3, 50, 10, 5), (1, 100, 20, 10), (0, 30, 5, 5), (5, 40, 5, 10), (6, 40, 5, 10)]
    for k, M, n, N in cases:
        want = _hypergeom_sf_ref(k, M, n, N)
        got = _hypergeom_sf(k, M, n, N)
        assert math.isclose(got, want, rel_tol=1e-10, abs_tol=1e-15), (k, M, n, N, got, want)


def test_over_representation_end_to_end(spark):
    from utils_spark.operators.enrichment import over_representation

    # universe of 20 items; term A = {0..4} all in foreground (enriched),
    # term B = {10..14} none in foreground (depleted)
    memberships = spark.createDataFrame(
        [(i, "A") for i in range(5)] + [(i, "B") for i in range(10, 15)]
        + [(i, "C") for i in range(20)],
        ["item", "term"],
    )
    universe = spark.createDataFrame([(i,) for i in range(20)], ["item"])
    foreground = spark.createDataFrame([(i,) for i in range(5)], ["item"])
    res = {r["term"]: r for r in over_representation(foreground, memberships, universe=universe).collect()}
    assert res["A"]["k_hits"] == 5 and res["B"]["k_hits"] == 0
    want_a = _hypergeom_sf_ref(5, 20, 5, 5)
    assert math.isclose(res["A"]["pvalue"], want_a, rel_tol=1e-10)
    assert math.isclose(res["B"]["pvalue"], 1.0, rel_tol=1e-12)
    assert res["A"]["p_adjusted"] <= res["B"]["p_adjusted"]
    # the all-universe term C is uninformative: p == 1
    assert math.isclose(res["C"]["pvalue"], 1.0)


def test_audio_energy_windows_exact_and_robust(spark):
    """audio_energy_windows must (a) recover exact integer energy/peak from
    a hand-built PCM16 WAV, (b) handle a short tail window, stereo
    deinterleave, and extra RIFF chunks, and (c) SKIP malformed blobs
    (truncated data, 8-bit PCM, garbage, null) without failing the task."""
    import struct

    import numpy as np
    from pyspark.sql.types import BinaryType, LongType, StructField, StructType

    from utils_spark.operators.multimodal import audio_energy_windows

    def wav(ch, rate, frames, fn, extra_chunk=False, bits=16, truncate=0):
        n = np.arange(frames).reshape(-1, 1)
        c = np.arange(ch).reshape(1, -1)
        data = np.broadcast_to(fn(n, c), (frames, ch)).astype("<i2").reshape(-1).tobytes()
        if truncate:
            data = data[:-truncate]
        mid = b""
        if extra_chunk:  # a LIST chunk before data — the walk must skip it
            mid = b"LIST" + struct.pack("<I", 4) + b"INFO"
        return (
            b"RIFF" + struct.pack("<I", 36 + len(mid) + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, ch, rate, rate * 2 * ch, 2 * ch, bits)
            + mid + b"data" + struct.pack("<I", len(data) + truncate) + data
        )

    # 1 kHz mono, 250 frames -> windows of 100 (100 ms): 100+100+50
    mono = wav(1, 1000, 250, lambda n, c: (n % 4) * 100)
    # stereo with an extra LIST chunk: channel 1 louder than channel 0
    stereo = wav(2, 1000, 120, lambda n, c: (c + 1) * 200, extra_chunk=True)
    rows = [
        (1, mono),
        (2, stereo),
        (3, wav(1, 1000, 100, lambda n, c: n, bits=8)),  # 8-bit -> skipped
        (4, b"RIFF\x04\x00\x00\x00WAVE"),  # no fmt/data -> skipped
        (5, b"not audio at all"),  # garbage -> skipped
        (6, None),  # null -> skipped
        (7, wav(1, 1000, 100, lambda n, c: n * 0 + 300, truncate=2)),  # short data: decode what's there
    ]
    schema = StructType(
        [StructField("media_id", LongType()), StructField("content", BinaryType())]
    )
    out = audio_energy_windows(spark.createDataFrame(rows, schema), window_ms=100)
    got = {(r.media_id, r.window_idx, r.channel): r for r in out.collect()}

    assert {k[0] for k in got} == {1, 2, 7}
    # mono: pattern 0,100,200,300 repeating; per-100-window sumsq = 25*(0+1e4+4e4+9e4)
    assert got[(1, 0, 0)].sum_sq == 25 * (0 + 100**2 + 200**2 + 300**2)
    assert got[(1, 0, 0)].n_samples == 100 and got[(1, 0, 0)].peak == 300
    assert got[(1, 2, 0)].n_samples == 50  # tail window
    # n in [200, 250): 13 zeros, 13×100, 12×200, 12×300
    assert got[(1, 2, 0)].sum_sq == 13 * 100**2 + 12 * 200**2 + 12 * 300**2
    # stereo: constant 200 on ch0, 400 on ch1, both windows
    assert got[(2, 0, 0)].sum_sq == 100 * 200**2 and got[(2, 0, 1)].sum_sq == 100 * 400**2
    assert got[(2, 1, 0)].n_samples == 20 and got[(2, 1, 1)].peak == 400
    # truncated: 99 full frames decodable
    assert got[(7, 0, 0)].n_samples == 99 and got[(7, 0, 0)].peak == 300


def test_image_channel_stats_whitespace_raster_and_robust(spark):
    """image_channel_stats must (a) recover exact integer stats from a
    hand-built P6 whose FIRST raster byte is whitespace (0x20) — the case
    a naive whitespace-split header parse silently shifts — and (b) skip
    truncated/garbage/null blobs without failing the task."""
    import numpy as np
    from pyspark.sql.types import BinaryType, LongType, StructField, StructType

    from utils_spark.operators.multimodal import image_channel_stats

    w, h = 4, 3
    img = np.zeros((h, w, 3), dtype=np.uint8)
    img[0, 0, 0] = 0x20  # leading raster byte IS whitespace
    img[:, :, 1] = 10
    img[2, 3, 2] = 255
    good = f"P6 {w} {h} 255\n".encode() + img.tobytes()
    rows = [
        (1, good),
        (2, f"P6 {w} {h} 255\n".encode() + img.tobytes()[:-5]),  # truncated
        (3, b"P5 2 2 255\n\x00\x00\x00\x00"),  # PGM, not P6
        (4, b"nonsense"),
        (5, None),
        # maxval 65535 => 2-byte samples per the PPM spec; decoding it as
        # 8-bit would silently halve the image — must be skipped
        (6, f"P6 {w} {h} 65535\n".encode() + img.astype(">u2").tobytes()),
    ]
    schema = StructType(
        [StructField("media_id", LongType()), StructField("content", BinaryType())]
    )
    out = image_channel_stats(spark.createDataFrame(rows, schema))
    got = {(r.media_id, r.channel): r for r in out.collect()}
    assert {k[0] for k in got} == {1}
    assert got[(1, 0)].sum_val == 0x20 and got[(1, 0)].max_val == 0x20
    # the 0x20 byte sits at x=0, y=0 -> included in the stride-2 subsample
    assert got[(1, 0)].stride2_sum == 0x20
    assert got[(1, 1)].sum_val == 10 * w * h and got[(1, 1)].min_val == 10
    # stride-2 keeps x in {0, 2}, y in {0, 2} -> 4 pixels of channel 1
    assert got[(1, 1)].stride2_sum == 10 * 4
    assert got[(1, 2)].max_val == 255 and got[(1, 2)].stride2_sum == 0
    assert all(r.n_pixels == w * h for r in got.values())
