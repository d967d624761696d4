"""Baseline JPEG codec tests (the 5th real media container).

encode_jpeg_coeff_gray writes an actual ITU-T T.81 baseline stream
(SOI/DQT/SOF0/DHT/SOS/EOI, canonical Huffman codes declared in its own
DHT, differential DC, run-length AC with ZRL/EOB, 0xFF byte stuffing);
decode_jpeg_gray8 rebuilds the tables FROM the DHT and entropy-decodes.
The entropy/marker layers are exactly invertible — quantized
coefficients round-trip bit-for-bit (also what the DuckDB gate oracle
checks from hash arithmetic, independent of all of this code). The
transform layer is cross-checked here against a scalar transcription
of the T.81 A.3.3 IDCT formula written independently below — a
correlated bug in the codec's matrix IDCT would have to match this
second implementation too.
"""
from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from areacity_query_geometry_spark.functions import media


def _spec_idct_block(coeffs_zz: np.ndarray, quant_zz: np.ndarray) -> np.ndarray:
    """Scalar IDCT transcribed directly from T.81 A.3.3:
    s(x,y) = 1/4 ΣuΣv C(u)C(v) S(u,v) cos((2x+1)uπ/16) cos((2y+1)vπ/16)
    — deliberately naive, no matrices shared with the codec."""
    s = [[0.0] * 8 for _ in range(8)]
    for z, (r, c) in enumerate(media.ZIGZAG):
        s[r][c] = float(coeffs_zz[z]) * float(quant_zz[z])
    out = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            acc = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / np.sqrt(2) if u == 0 else 1.0
                    cv = 1 / np.sqrt(2) if v == 0 else 1.0
                    acc += (cu * cv * s[u][v]
                            * np.cos((2 * x + 1) * u * np.pi / 16)
                            * np.cos((2 * y + 1) * v * np.pi / 16))
            out[x, y] = acc / 4.0
    return np.clip(np.round(out + 128.0), 0, 255).astype(np.uint8)


def _hash_blocks(ref: str, n_blocks: int = 4) -> np.ndarray:
    """The synthesize_jpeg fixture derivation, restated."""
    import hashlib

    blocks = []
    for b in range(n_blocks):
        d = hashlib.sha256(f"{ref}:{b}".encode()).digest()
        v = np.frombuffer((d * 2)[:64], dtype=np.uint8).astype(np.int64)
        blocks.append(np.where(v < 128, 0, v - 192))
    return np.array(blocks)


@given(
    bx=st.integers(min_value=1, max_value=3),
    by=st.integers(min_value=1, max_value=3),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=60, deadline=None)
def test_jpeg_coeff_roundtrip_exact(bx, by, seed):
    rng = np.random.default_rng(seed)
    nb = bx * by
    blocks = np.where(rng.integers(0, 2, (nb, 64)) == 0, 0,
                      rng.integers(-64, 64, (nb, 64)))
    data = media.encode_jpeg_coeff_gray(blocks, bx * 8, by * 8)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    px, got = media.decode_jpeg_gray8(data)
    assert px.shape == (by * 8, bx * 8)
    np.testing.assert_array_equal(got, blocks)


def test_jpeg_pixels_match_scalar_spec_idct():
    blocks = _hash_blocks("blob://jpg/77", 4)
    data = media.encode_jpeg_coeff_gray(blocks, 16, 16)
    px, _ = media.decode_jpeg_gray8(data)
    quant = np.asarray(media.JPEG_QUANT_ZZ, dtype=np.int64)
    for b in range(4):
        r0, c0 = (b // 2) * 8, (b % 2) * 8
        np.testing.assert_array_equal(
            px[r0:r0 + 8, c0:c0 + 8], _spec_idct_block(blocks[b], quant))


def test_jpeg_lossy_pixel_roundtrip_bounded():
    """Real forward path (level shift, DCT, quantize): reconstruction
    error bounded by the quantization step — the standard lossy
    guarantee, not exactness."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (16, 24)).astype(np.uint8)
    dec, _ = media.decode_jpeg_gray8(media.encode_jpeg_gray8(img))
    assert dec.shape == img.shape
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 16


def test_jpeg_byte_stuffing_roundtrips():
    """Dense random coefficient images reliably produce 0xFF entropy
    bytes; every one must be stuffed on encode and unstuffed on
    decode without corrupting a single coefficient."""
    rng = np.random.default_rng(11)
    stuffed = 0
    for _ in range(20):
        blocks = rng.integers(-64, 64, (4, 64))
        data = media.encode_jpeg_coeff_gray(blocks, 16, 16)
        stuffed += data[2:-2].count(b"\xff\x00")
        _, got = media.decode_jpeg_gray8(data)
        np.testing.assert_array_equal(got, blocks)
    assert stuffed > 0


def test_jpeg_dc_prediction_crosses_blocks():
    """DC is coded differentially: equal DCs in consecutive blocks
    must still decode correctly (diff 0, category 0 path)."""
    blocks = np.zeros((4, 64), dtype=np.int64)
    blocks[:, 0] = 17  # same DC every block → three zero diffs
    blocks[2, 5] = -3
    _, got = media.decode_jpeg_gray8(
        media.encode_jpeg_coeff_gray(blocks, 16, 16))
    np.testing.assert_array_equal(got, blocks)


def test_jpeg_rejects_foreign_and_unsupported():
    with pytest.raises(ValueError, match="not a JPEG"):
        media.decode_jpeg_gray8(b"\x89PNG" + bytes(30))
    data = bytearray(media.encode_jpeg_coeff_gray(
        np.zeros((1, 64), dtype=np.int64), 8, 8))
    sof = data.find(b"\xff\xc0")
    data[sof + 1] = 0xC2  # progressive SOF2
    with pytest.raises(ValueError, match="baseline"):
        media.decode_jpeg_gray8(bytes(data))


def test_jpeg_spark_stage_end_to_end(spark):
    spans = spark.createDataFrame(
        [(str(i), 1, f"blob://jpg/{i}") for i in range(8)],
        "doc_id string, span_idx int, ref string")
    imgs = media.synthesize_jpeg(spans, w=16, h=16)
    rows = {r.doc_id: r for r in media.decode_image_jpeg(imgs).collect()}
    assert len(rows) == 8
    for i in range(8):
        blocks = _hash_blocks(f"blob://jpg/{i}", 4)
        flat = blocks.ravel()
        r = rows[str(i)]
        assert (r.width, r.height) == (16, 16)
        assert r.coef_sum == int(flat.sum())
        assert r.coef_poshash == int((flat * (np.arange(256) + 1)).sum())
