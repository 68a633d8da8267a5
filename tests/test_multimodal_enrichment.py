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
