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
