"""WAV (RIFF/PCM-16) codec round-trip + real-decode Spark stage —
the audio face of the multimodal decode path (the third REAL container
after BMP and PNG)."""
from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from areacity_query_geometry_spark.functions import media


@given(
    n=st.integers(min_value=1, max_value=300),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=50, deadline=None)
def test_wav_roundtrip_property(n, rate, seed):
    rng = np.random.default_rng(seed)
    samples = rng.integers(-32768, 32768, size=n, dtype=np.int16)
    data = media.encode_wav_pcm16(samples, rate)
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
    (riff_len,) = struct.unpack_from("<I", data, 4)
    assert riff_len == len(data) - 8
    back, back_rate = media.decode_wav_pcm16(data)
    assert back_rate == rate
    np.testing.assert_array_equal(back, samples)


def test_wav_tolerates_extra_chunks():
    # a LIST chunk between fmt and data (and an odd-length chunk that
    # forces word-alignment padding) must be skipped, not break parsing
    samples = np.arange(-5, 6, dtype=np.int16)
    data = media.encode_wav_pcm16(samples, 8000)
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # padded
    patched = data[:fmt_end] + extra + data[fmt_end:]
    patched = (b"RIFF" + struct.pack("<I", len(patched) - 8) + patched[8:])
    back, rate = media.decode_wav_pcm16(patched)
    assert rate == 8000
    np.testing.assert_array_equal(back, samples)


def test_wav_rejects_foreign_forms():
    with pytest.raises(ValueError, match="not a RIFF"):
        media.decode_wav_pcm16(b"OggS" + bytes(40))
    # stereo/8-bit fmt must be refused loudly, not mis-parsed
    samples = np.zeros(4, dtype=np.int16)
    data = bytearray(media.encode_wav_pcm16(samples, 8000))
    struct.pack_into("<H", data, 12 + 8 + 2, 2)  # channels = 2
    with pytest.raises(ValueError, match="mono"):
        media.decode_wav_pcm16(bytes(data))


def test_audio_frames_spark_stage(spark):
    import hashlib

    spans = spark.createDataFrame(
        [("7", 1, "blob://wav/7")], "doc_id string, span_idx int, ref string")
    blobs = media.synthesize_wav(spans, n_samples=37, rate=16000)
    rows = sorted(media.sample_audio_frames(blobs, frame_len=16).collect(),
                  key=lambda r: r.frame_no)
    d = hashlib.sha256(b"blob://wav/7").digest()
    s = np.frombuffer((d * 3)[:74], dtype="<i2").astype(np.int64)
    assert [r.frame_no for r in rows] == [0, 1, 2]
    for r in rows:
        seg = s[r.frame_no * 16:(r.frame_no + 1) * 16]
        assert r.frame_sum == int(seg.sum())
        assert r.frame_energy == int((seg * seg).sum())


def test_wav_spark_stage_end_to_end(spark):
    import hashlib

    spans = spark.createDataFrame(
        [(str(i), 1, f"blob://wav/{i}") for i in range(6)],
        "doc_id string, span_idx int, ref string")
    blobs = media.synthesize_wav(spans, n_samples=37, rate=16000)
    rows = {r.doc_id: r for r in media.decode_audio_wav(blobs).collect()}
    assert len(rows) == 6
    for i in range(6):
        d = hashlib.sha256(f"blob://wav/{i}".encode()).digest()
        s = np.frombuffer((d * 3)[:74], dtype="<i2").astype(np.int64)
        r = rows[str(i)]
        assert (r.n_samples, r.rate) == (37, 16000)
        assert r.sample_sum == int(s.sum())
        assert r.sample_poshash == int((s * (np.arange(37) + 1)).sum())
