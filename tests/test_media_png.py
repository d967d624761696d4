"""PNG codec round-trip + independent spec-transcription check + the
real-decode Spark stage (VERDICT r2 "Next round" #7: a second real
media container beyond BMP).

encode_png_gray8 writes an actual PNG (signature, CRC'd chunks, zlib
IDAT) cycling ALL FIVE scanline filter types per row; decode_png_gray8
walks chunks, inflates, and unfilters. Because no independent PNG
library exists in this container, the vectorized filter arithmetic is
additionally cross-checked against a scalar line-by-line transcription
of the PNG spec (§9 filter definitions) written independently below —
a correlated encoder/decoder bug would have to also match this second
implementation to slip through.
"""
from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from areacity_query_geometry_spark.functions import media


def _spec_decode(data: bytes) -> np.ndarray:
    """Scalar PNG gray8 decode transcribed directly from the spec —
    deliberately naive and structurally different from the codec."""
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    pos, idat, dims = 8, b"", None
    while pos < len(data):
        (ln,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + ln]
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack_from(">IIBB", payload)
            assert (depth, ctype) == (8, 0)
            dims = (h, w)
        elif tag == b"IDAT":
            idat += payload
        pos += 12 + ln
    h, w = dims
    raw = zlib.decompress(idat)
    out = [[0] * w for _ in range(h)]
    i = 0
    for y in range(h):
        ft = raw[i]
        i += 1
        for x in range(w):
            fx = raw[i]
            i += 1
            a = out[y][x - 1] if x else 0            # left
            b = out[y - 1][x] if y else 0            # up
            c = out[y - 1][x - 1] if x and y else 0  # upper-left
            if ft == 0:
                v = fx
            elif ft == 1:
                v = fx + a
            elif ft == 2:
                v = fx + b
            elif ft == 3:
                v = fx + (a + b) // 2
            elif ft == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa <= pb and pa <= pc:
                    pr = a
                elif pb <= pc:
                    pr = b
                else:
                    pr = c
                v = fx + pr
            else:
                raise AssertionError(ft)
            out[y][x] = v % 256
    return np.array(out, dtype=np.uint8)


@given(
    w=st.integers(min_value=1, max_value=13),
    h=st.integers(min_value=1, max_value=12),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=60, deadline=None)
def test_png_roundtrip_and_spec_parity(w, h, seed):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    data = media.encode_png_gray8(px)
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    assert data.endswith(struct.pack(">I", 0) + b"IEND"
                         + struct.pack(">I", zlib.crc32(b"IEND")))
    np.testing.assert_array_equal(media.decode_png_gray8(data), px)
    # independent scalar spec transcription agrees with the codec
    np.testing.assert_array_equal(_spec_decode(data), px)


def test_png_all_filters_present():
    # ≥5 rows ⇒ the encoder emitted every filter type exactly as r % 5
    px = np.arange(7 * 11, dtype=np.uint8).reshape(11, 7)
    data = media.encode_png_gray8(px)
    # pull the IDAT payload back out and check the filter bytes
    pos, idat = 8, b""
    while pos < len(data):
        (ln,) = struct.unpack_from(">I", data, pos)
        if data[pos + 4:pos + 8] == b"IDAT":
            idat += data[pos + 8:pos + 8 + ln]
        pos += 12 + ln
    raw = zlib.decompress(idat)
    fts = [raw[r * 8] for r in range(11)]
    assert fts == [r % 5 for r in range(11)]


def test_png_rejects_corruption_and_foreign_forms():
    px = np.zeros((4, 4), dtype=np.uint8)
    data = bytearray(media.encode_png_gray8(px))
    data[20] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        media.decode_png_gray8(bytes(data))
    with pytest.raises(ValueError, match="not a PNG"):
        media.decode_png_gray8(b"BM" + bytes(30))


@given(
    w=st.integers(min_value=1, max_value=17),
    h=st.integers(min_value=1, max_value=17),
    max_side=st.integers(min_value=1, max_value=6),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=60, deadline=None)
def test_resize_nn_matches_naive(w, h, max_side, seed):
    """Vectorized nearest-neighbor resample ≡ the naive per-pixel
    definition thumb[i,j] = px[(i*h)//th, (j*w)//tw]."""
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    t = media.resize_gray8_nn(px, max_side)
    th, tw = t.shape
    assert max(th, tw) <= max(max_side, 1)
    for i in range(th):
        for j in range(tw):
            assert t[i, j] == px[(i * h) // th, (j * w) // tw]


def test_resize_real_spark_stage(spark):
    import hashlib

    spans = spark.createDataFrame(
        [(str(i), 1, f"blob://png/{i}") for i in range(5)],
        "doc_id string, span_idx int, ref string")
    imgs = media.synthesize_png(spans, w=7, h=11)
    rows = {r.doc_id: r for r in
            media.resize_images_real(imgs, max_side=4, codec="png").collect()}
    for i in range(5):
        d = hashlib.sha256(f"blob://png/{i}".encode()).digest()
        px = np.frombuffer((d * 3)[:77], dtype=np.uint8).reshape(11, 7)
        t = media.resize_gray8_nn(px, 4)
        r = rows[str(i)]
        assert (r.tw, r.th) == (t.shape[1], t.shape[0])
        flat = t.astype(np.int64).ravel()
        assert r.thumb_sum == int(flat.sum())
        assert r.thumb_poshash == int((flat * (np.arange(flat.size) + 1)).sum())


def test_png_spark_stage_end_to_end(spark):
    spans = spark.createDataFrame(
        [(str(i), 1, f"blob://png/{i}") for i in range(8)],
        "doc_id string, span_idx int, ref string")
    imgs = media.synthesize_png(spans, w=7, h=11)
    rows = {r.doc_id: r for r in media.decode_image_png(imgs).collect()}
    assert len(rows) == 8
    import hashlib

    for i in range(8):
        d = hashlib.sha256(f"blob://png/{i}".encode()).digest()
        px = np.frombuffer((d * 3)[:77], dtype=np.uint8).astype(np.int64)
        r = rows[str(i)]
        assert (r.width, r.height) == (7, 11)
        assert r.px_sum == int(px.sum())
        assert r.px_poshash == int((px * (np.arange(77) + 1)).sum())
