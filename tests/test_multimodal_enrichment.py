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
