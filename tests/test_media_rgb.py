"""Color (24-bit) image codec round-trips + the Spark decode stage
(VERDICT r3 next-round #9): encode_bmp_rgb24 writes a real 24-bit BMP
(BGR triples, 4-byte row padding, bottom-up rows — no palette) and
encode_png_rgb24 a real truecolor PNG (color type 2, filters cycling
all five spec types with the bpp=3 left offset). Property-tested
bit-for-bit over widths that exercise every padding remainder and
heights that cycle every filter, then driven end-to-end through the
Arrow-batched Spark stages with channel-sum statistics that catch a
missed BGR→RGB swap.
"""
from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from areacity_query_geometry_spark.functions import media


@given(
    w=st.integers(min_value=1, max_value=9),
    h=st.integers(min_value=1, max_value=8),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=60, deadline=None)
def test_bmp_rgb_roundtrip_property(w, h, seed):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    data = media.encode_bmp_rgb24(px)
    assert data[:2] == b"BM"
    assert len(data) == int.from_bytes(data[2:6], "little")
    back = media.decode_bmp_rgb24(data)
    assert back.dtype == np.uint8 and back.shape == (h, w, 3)
    assert np.array_equal(back, px)


@given(
    w=st.integers(min_value=1, max_value=9),
    h=st.integers(min_value=5, max_value=12),  # ≥5 rows → all 5 filters
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=60, deadline=None)
def test_png_rgb_roundtrip_property(w, h, seed):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    back = media.decode_png_rgb24(media.encode_png_rgb24(px))
    assert back.dtype == np.uint8 and back.shape == (h, w, 3)
    assert np.array_equal(back, px)


def test_bgr_order_on_the_wire():
    """The BMP byte stream must hold BGR: a pure-red 1×1 image's pixel
    triple on disk is (0, 0, 255)."""
    px = np.array([[[255, 0, 0]]], dtype=np.uint8)
    data = media.encode_bmp_rgb24(px)
    (off,) = np.frombuffer(data[10:14], dtype="<u4")
    assert data[off:off + 3] == bytes([0, 0, 255])
    assert np.array_equal(media.decode_bmp_rgb24(data), px)


def test_rgb_decoders_reject_wrong_depth_and_tamper():
    gray = media.encode_bmp_gray8(np.zeros((2, 2), dtype=np.uint8))
    with pytest.raises(ValueError):
        media.decode_bmp_rgb24(gray)
    rgb = media.encode_bmp_rgb24(np.zeros((2, 2, 3), dtype=np.uint8))
    with pytest.raises(ValueError):
        media.decode_bmp_gray8(rgb)
    png_gray = media.encode_png_gray8(np.zeros((2, 2), dtype=np.uint8))
    with pytest.raises(ValueError):
        media.decode_png_rgb24(png_gray)
    png = bytearray(media.encode_png_rgb24(
        np.arange(24, dtype=np.uint8).reshape(2, 4, 3)))
    png[len(png) // 2] ^= 0xFF  # corrupt inside a chunk → CRC must trip
    with pytest.raises(ValueError):
        media.decode_png_rgb24(bytes(png))


def test_rgb_spark_stage_end_to_end(spark):
    """synthesize → decode through the Arrow stages: statistics must
    equal a local numpy recomputation from the sha256 derivation."""
    import hashlib

    spans = spark.createDataFrame(
        [(str(i), 1, f"blob://c/{i}") for i in range(6)],
        "doc_id string, span_idx int, ref string")
    for container, (w, h) in (("bmp", (5, 7)), ("png", (6, 9))):
        out = {r.doc_id: r for r in media.decode_image_rgb(
            media.synthesize_rgb(spans, container, w=w, h=h),
            container).collect()}
        for i in range(6):
            d = hashlib.sha256(f"blob://c/{i}".encode()).digest()
            n = w * h * 3
            reps = (n + len(d) - 1) // len(d)
            px = np.frombuffer((d * reps)[:n], dtype=np.uint8).astype(np.int64)
            r = out[str(i)]
            assert (r.width, r.height) == (w, h)
            assert r.px_sum == int(px.sum())
            assert r.px_poshash == int((px * (np.arange(n) + 1)).sum())
            assert r.r_sum == int(px[0::3].sum())
            assert r.g_sum == int(px[1::3].sum())
            assert r.b_sum == int(px[2::3].sum())
