"""AVI (RIFF nested-LIST, uncompressed 8-bit DIB frames) codec
round-trip + real frame-sample Spark stage — the video face of the
multimodal decode path (fourth REAL container after BMP, PNG, WAV)."""
from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from areacity_query_geometry_spark.functions import media


@given(
    n=st.integers(min_value=1, max_value=6),
    h=st.integers(min_value=1, max_value=12),
    w=st.integers(min_value=1, max_value=12),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=50, deadline=None)
def test_avi_roundtrip_property(n, h, w, seed):
    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 256, size=(n, h, w), dtype=np.uint8)
    data = media.encode_avi_gray8(frames, fps=10)
    assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
    (riff_len,) = struct.unpack_from("<I", data, 4)
    assert riff_len == len(data) - 8
    back = media.decode_avi_gray8(data)
    np.testing.assert_array_equal(back, frames)


def test_avi_stride_padding_is_real():
    # w=6 → DIB stride 8: each row carries 2 padding bytes on disk, so
    # the in-container frame is bigger than h*w and a decoder that
    # ignored stride would misalign every row after the first
    frames = np.arange(2 * 3 * 6, dtype=np.uint8).reshape(2, 3, 6)
    data = media.encode_avi_gray8(frames)
    i = data.find(b"00db")
    (ln,) = struct.unpack_from("<I", data, i + 4)
    assert ln == 8 * 3  # stride * h, not w * h
    # first stored row is the BOTTOM image row (DIB bottom-up order)
    assert data[i + 8:i + 8 + 6] == frames[0][-1].tobytes()
    np.testing.assert_array_equal(media.decode_avi_gray8(data), frames)


def test_avi_tolerates_junk_chunks():
    frames = np.full((2, 4, 6), 9, dtype=np.uint8)
    data = media.encode_avi_gray8(frames)
    j = data.find(b"movi") - 8  # splice before the movi LIST
    junk = b"JUNK" + struct.pack("<I", 7) + b"abcdefg" + b"\x00"  # padded
    patched = data[:j] + junk + data[j:]
    patched = b"RIFF" + struct.pack("<I", len(patched) - 8) + patched[8:]
    np.testing.assert_array_equal(media.decode_avi_gray8(patched), frames)


def test_avi_rejects_foreign_and_inconsistent():
    with pytest.raises(ValueError, match="not a RIFF/AVI"):
        media.decode_avi_gray8(b"RIFF" + bytes(4) + b"WAVE" + bytes(20))
    # 24-bit strf must be refused loudly, not mis-parsed
    data = bytearray(media.encode_avi_gray8(np.zeros((1, 2, 2), np.uint8)))
    i = bytes(data).find(b"strf")
    struct.pack_into("<H", data, i + 8 + 14, 24)  # biBitCount
    with pytest.raises(ValueError, match="8-bit"):
        media.decode_avi_gray8(bytes(data))
    # frame-count mismatch between avih and movi
    data = bytearray(media.encode_avi_gray8(np.zeros((3, 2, 2), np.uint8)))
    i = bytes(data).find(b"avih")
    struct.pack_into("<I", data, i + 8 + 16, 5)  # dwTotalFrames
    with pytest.raises(ValueError, match="frames"):
        media.decode_avi_gray8(bytes(data))


def test_video_frames_spark_stage(spark):
    import hashlib

    spans = spark.createDataFrame(
        [("7", 1, "blob://avi/7")], "doc_id string, span_idx int, ref string")
    blobs = media.synthesize_avi(spans, w=6, h=5, n_frames=4, fps=10)
    rows = sorted(media.sample_video_frames(blobs, every_n=2).collect(),
                  key=lambda r: r.frame_no)
    assert [r.frame_no for r in rows] == [0, 2]
    d = hashlib.sha256(b"blob://avi/7").digest()
    px = np.frombuffer((d * 4)[:120], dtype=np.uint8).astype(np.int64)
    for r in rows:
        flat = px[r.frame_no * 30:(r.frame_no + 1) * 30]
        assert r.px_sum == int(flat.sum())
        assert r.px_poshash == int((flat * (np.arange(30) + 1)).sum())
