"""Multimodal span processing over the docs table.

Image/audio/video payloads are opaque references (`media_ref`) or
binary columns; decode / feature-extract / resize / frame-sample run as
Arrow-batched `mapInPandas` stages.

Decode paths:
- BINARY image columns: a REAL byte decoder — `decode_bmp_gray8` parses
  8-bit grayscale BMP (BITMAPFILEHEADER + BITMAPINFOHEADER + palette,
  4-byte row padding, bottom-up row order) in pure numpy; the Spark
  stage `decode_image_bmp` runs it Arrow-batched. `encode_bmp_gray8`
  writes the same container, so pipelines can round-trip synthetic
  images without PIL.
- ref-only spans (compressed formats, remote blobs): the decoders (PIL
  / torchaudio / av) are NOT in this container, so `decode_media`
  raises NotImplementedError unless `fake=True`, which produces a
  deterministic hash-derived feature vector — the Spark-side plumbing
  (schema, batching, partitioning, UDF signature) is real either way.
"""
from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, LongType, StringType,
    StructField, StructType,
)

MEDIA_FEATURE_SCHEMA = StructType([
    StructField("doc_id", StringType()),
    StructField("span_idx", IntegerType()),
    StructField("kind", StringType()),
    StructField("media_ref", StringType()),
    StructField("feature", ArrayType(FloatType())),
    StructField("n_bytes", LongType()),
])

FEATURE_DIM = 16


def _try_real_decode(media_ref: str) -> np.ndarray | None:
    try:  # pragma: no cover - decoder libs absent in this container
        from PIL import Image  # noqa: F401
    except ImportError:
        return None
    raise NotImplementedError(
        "real media decode requires fetching media_ref blobs; wire a blob "
        "store reader here (PIL/torchaudio available)"
    )


def _fake_feature(media_ref: str) -> np.ndarray:
    """Deterministic stand-in: 16 floats derived from sha256(media_ref).
    Keeps every test reproducible without decoder libraries."""
    h = hashlib.sha256(media_ref.encode()).digest()
    raw = np.frombuffer(h[:FEATURE_DIM * 2], dtype=np.uint16).astype(np.float32)
    return raw / 65535.0


# ------------------------------------------------------------- BMP codec
# Real byte-level image container handling in pure numpy (no PIL): 8-bit
# grayscale BMP with a 256-entry palette, 4-byte-padded rows, bottom-up
# row order — enough to prove the decode stage on actual image bytes.

_BMP_PALETTE = bytes(bytearray(v for i in range(256) for v in (i, i, i, 0)))


def encode_bmp_gray8(px: np.ndarray) -> bytes:
    """(h, w) uint8 array → 8-bit grayscale BMP bytes."""
    px = np.asarray(px, dtype=np.uint8)
    h, w = px.shape
    row_size = (w + 3) & ~3
    img_size = row_size * h
    off = 14 + 40 + 256 * 4
    file_header = struct.pack("<2sIHHI", b"BM", off + img_size, 0, 0, off)
    info_header = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0,
                              img_size, 2835, 2835, 256, 0)
    rows = np.zeros((h, row_size), dtype=np.uint8)
    rows[:, :w] = px[::-1]  # BMP stores rows bottom-up
    return file_header + info_header + _BMP_PALETTE + rows.tobytes()


def decode_bmp_gray8(data: bytes) -> np.ndarray:
    """8-bit BMP bytes → (h, w) uint8 array (top-down row order)."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP stream")
    (off,) = struct.unpack_from("<I", data, 10)
    _hsize, w, h, _planes, bpp = struct.unpack_from("<IiiHH", data, 14)
    if bpp != 8:
        raise ValueError(f"only 8-bit grayscale BMP supported, got bpp={bpp}")
    row_size = (w + 3) & ~3
    arr = np.frombuffer(data, dtype=np.uint8, offset=off,
                        count=row_size * abs(h)).reshape(abs(h), row_size)[:, :w]
    if h > 0:  # positive height = bottom-up: flip back to top-down
        arr = arr[::-1]
    return arr.copy()


IMAGE_BYTES_SCHEMA = StructType([
    StructField("doc_id", StringType()),
    StructField("span_idx", IntegerType()),
    StructField("img", BinaryType()),
])


def synthesize_bmp(spans: DataFrame, ref_col: str = "ref",
                   w: int = 6, h: int = 10) -> DataFrame:
    """Blob-fetch stand-in: materialize each span's image as REAL BMP
    bytes in a binary column. Pixels derive deterministically from
    sha256(ref) (digest repeated row-major), so an independent oracle
    can recompute any pixel statistic without parsing BMP."""
    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            imgs = []
            for ref in pdf[ref_col]:
                d = hashlib.sha256(ref.encode()).digest()
                reps = (w * h + len(d) - 1) // len(d)
                px = np.frombuffer((d * reps)[: w * h], dtype=np.uint8)
                imgs.append(encode_bmp_gray8(px.reshape(h, w)))
            out = pdf[["doc_id", "span_idx"]].copy()
            out["span_idx"] = out["span_idx"].astype("int32")
            out["img"] = imgs
            yield out

    return spans.mapInPandas(fn, IMAGE_BYTES_SCHEMA)


IMAGE_DECODE_SCHEMA = StructType([
    StructField("doc_id", StringType()),
    StructField("span_idx", IntegerType()),
    StructField("width", LongType()),
    StructField("height", LongType()),
    StructField("px_sum", LongType()),
    StructField("px_poshash", LongType()),
])


def decode_image_bmp(imgs: DataFrame, bytes_col: str = "img") -> DataFrame:
    """REAL image decode stage: parse each row's BMP bytes (header,
    padding, bottom-up flip) and emit pixel statistics. px_poshash is
    position-weighted (Σ px[k]·(k+1) over row-major k), so a decoder
    that mangled row order or padding CANNOT match the oracle even
    though px_sum would."""
    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ws, hs, sums, poss = [], [], [], []
            for b in pdf[bytes_col]:
                px = decode_bmp_gray8(bytes(b))
                hh, ww = px.shape
                flat = px.astype(np.int64).ravel()
                ws.append(ww)
                hs.append(hh)
                sums.append(int(flat.sum()))
                poss.append(int((flat * (np.arange(flat.size) + 1)).sum()))
            out = pdf[["doc_id", "span_idx"]].copy()
            out["span_idx"] = out["span_idx"].astype("int32")
            out["width"] = pd.Series(ws, dtype="int64")
            out["height"] = pd.Series(hs, dtype="int64")
            out["px_sum"] = pd.Series(sums, dtype="int64")
            out["px_poshash"] = pd.Series(poss, dtype="int64")
            yield out

    return imgs.mapInPandas(fn, IMAGE_DECODE_SCHEMA)


RESIZE_SCHEMA = StructType([
    StructField("doc_id", StringType()),
    StructField("span_idx", IntegerType()),
    StructField("media_ref", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("thumb", StructType([
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("pixels", ArrayType(FloatType())),
    ])),
])


def resize_images(decoded: DataFrame, max_side: int = 4) -> DataFrame:
    """Resize stage (stub decode): derives a deterministic WxH from the
    media_ref hash, then emits an aspect-preserving max_side thumbnail
    whose "pixels" are hash-derived — the Spark-side plumbing (struct
    output schema, Arrow batching, aspect arithmetic) is real; swap
    `_fake_feature`-style synthesis for PIL when decoders exist."""
    img = decoded.filter(F.col("kind") == "image")

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ws, hs, thumbs = [], [], []
            for ref in pdf["media_ref"]:
                h = hashlib.sha256(ref.encode()).digest()
                w0 = 64 + h[0] % 192
                h0 = 64 + h[1] % 192
                if w0 >= h0:
                    tw = max_side
                    th = max(1, (h0 * max_side) // w0)
                else:
                    th = max_side
                    tw = max(1, (w0 * max_side) // h0)
                px = np.frombuffer(
                    (hashlib.sha256(ref.encode() + b"#t").digest() * 8)[: tw * th],
                    dtype=np.uint8,
                ).astype(np.float32) / 255.0
                ws.append(w0)
                hs.append(h0)
                thumbs.append({"w": tw, "h": th, "pixels": px.tolist()})
            out = pdf[["doc_id", "span_idx", "media_ref"]].copy()
            out["width"] = pd.Series(ws, dtype="int32")
            out["height"] = pd.Series(hs, dtype="int32")
            out["thumb"] = thumbs
            yield out

    return img.mapInPandas(fn, RESIZE_SCHEMA)


FRAME_SCHEMA = StructType([
    StructField("doc_id", StringType()),
    StructField("span_idx", IntegerType()),
    StructField("media_ref", StringType()),
    StructField("frame_no", IntegerType()),
    StructField("frame_feature", ArrayType(FloatType())),
])


def sample_frames(decoded: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sample stage for video/audio spans (stub decode): a
    deterministic hash-derived frame count, one output row per sampled
    frame (every_n stride) with a per-frame feature vector. Real
    plumbing (explode-shaped mapInPandas, per-frame rows), fake frames."""
    med = decoded.filter(F.col("kind").isin("video", "audio"))

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k: [] for k in ("doc_id", "span_idx", "media_ref",
                                    "frame_no", "frame_feature")}
            for did, sidx, ref in zip(pdf["doc_id"], pdf["span_idx"],
                                      pdf["media_ref"]):
                h = hashlib.sha256(ref.encode()).digest()
                n_frames = 30 + h[2] % 270
                for f0 in range(0, n_frames, every_n):
                    rows["doc_id"].append(did)
                    rows["span_idx"].append(sidx)
                    rows["media_ref"].append(ref)
                    rows["frame_no"].append(f0)
                    rows["frame_feature"].append(
                        _fake_feature(f"{ref}#f{f0}").tolist())
            out = pd.DataFrame(rows)
            out["span_idx"] = out["span_idx"].astype("int32")
            out["frame_no"] = out["frame_no"].astype("int32")
            yield out

    return med.mapInPandas(fn, FRAME_SCHEMA)


def decode_media(docs: DataFrame, fake: bool = True) -> DataFrame:
    """Explode media spans and extract a feature vector per span.

    Arrow-batched; one Python roundtrip for the whole media subset.
    Partitioned by doc hash upstream so batches are balanced.
    """
    spans = docs.select(
        "doc_id", F.posexplode("spans").alias("span_idx", "span")
    ).filter(F.col("span.kind").isin("image", "audio", "video")).select(
        "doc_id", "span_idx", F.col("span.kind").alias("kind"),
        F.col("span.media_ref").alias("media_ref"),
    )

    def extract(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for ref in pdf["media_ref"]:
                vec = None if not fake else _fake_feature(ref)
                if vec is None:
                    vec = _try_real_decode(ref)
                    if vec is None:
                        raise NotImplementedError(
                            "no media decoder available in this environment; "
                            "call decode_media(..., fake=True)")
                feats.append(vec.tolist())
            out = pdf[["doc_id", "span_idx", "kind", "media_ref"]].copy()
            out["feature"] = feats
            out["n_bytes"] = [len(r) for r in pdf["media_ref"]]
            yield out

    return spans.mapInPandas(extract, MEDIA_FEATURE_SCHEMA)
