"""Multimodal span processing over the docs table.

Image/audio/video payloads are opaque references (`media_ref`) or
binary columns; decode / feature-extract / resize / frame-sample run as
Arrow-batched `mapInPandas` stages. The real decoders (PIL / torchaudio
/ av) are NOT present in this container, so the decode step is STUBBED:
`decode_media` raises NotImplementedError unless `fake=True`, in which
case it produces a deterministic hash-derived feature vector — the
Spark-side plumbing (schema, batching, partitioning, UDF signature) is
real and tested either way.
"""
from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType, FloatType, IntegerType, LongType, StringType, StructField,
    StructType,
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
