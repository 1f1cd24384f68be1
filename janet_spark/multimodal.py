"""Multimodal column plumbing: opaque binary payloads with typed metadata.

Images/audio/video are carried as `binary` columns plus a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
mapInPandas stages. The actual codec step is STUBBED (no image/audio libs in
this container): `decode_payload` raises NotImplementedError unless
`fake=True`, in which case a deterministic fake decode (seeded by payload
bytes) exercises the full Spark-side plumbing — schema, partitioning, UDF
signature, and batch shape are real and tested.
"""

from __future__ import annotations

import hashlib
import struct as _struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ASSET_SCHEMA = (
    "asset_id long, kind string, payload binary, "
    "width int, height int, sample_rate int"
)

FEATURE_DIM = 16


def synth_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fake assets derived from the documents table: the
    payload is the UTF-8 text; kind cycles image/audio/video by doc_id."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        kind.alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        (F.col("doc_id") % 640 + 1).cast("int").alias("width"),
        (F.col("doc_id") % 480 + 1).cast("int").alias("height"),
        F.lit(16000).cast("int").alias("sample_rate"),
    )


def decode_payload(payload: bytes, kind: str, fake: bool = False) -> np.ndarray:
    """Decode one payload to a float feature array.

    Real decoding requires imaging/audio libraries that are not present in
    this environment; the plumbing around this call is production-shaped.
    """
    if not fake:
        raise NotImplementedError(
            "real image/audio decode needs PIL/libsndfile — not available here; "
            "pass fake=True for the deterministic stand-in"
        )
    # deterministic fake: sha256 of the payload -> FEATURE_DIM floats in [0,1)
    h = hashlib.sha256(payload if payload is not None else b"").digest()
    vals = [
        _struct.unpack(">H", h[2 * i : 2 * i + 2])[0] / 65536.0
        for i in range(FEATURE_DIM)
    ]
    return np.array(vals, dtype=np.float64)


def feature_extract_iter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas: assets -> (asset_id, kind, n_bytes, features[16],
    feat_norm). Arrow moves the binary column zero-copy per batch."""
    for pdf in batches:
        feats = [
            decode_payload(p, k, fake=True)
            for p, k in zip(pdf["payload"], pdf["kind"])
        ]
        norms = [float(np.linalg.norm(f)) for f in feats]
        yield pd.DataFrame(
            {
                "asset_id": pdf["asset_id"],
                "kind": pdf["kind"],
                "n_bytes": pd.Series(
                    [len(p) if p is not None else 0 for p in pdf["payload"]],
                    dtype="int64",
                ),
                "features": [list(map(float, f)) for f in feats],
                "feat_norm": pd.Series(np.round(norms, 4), dtype="float64"),
            }
        )


FEATURES_DDL = (
    "asset_id long, kind string, n_bytes long, "
    "features array<double>, feat_norm double"
)


def frame_sample_iter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Video frame sampling stand-in: split the payload into 4 chunks
    ("frames"), one feature row per frame."""
    for pdf in batches:
        rows = []
        for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
            data = payload or b""
            n = max(len(data) // 4, 1)
            for frame_idx in range(4):
                chunk = data[frame_idx * n : (frame_idx + 1) * n]
                f = decode_payload(chunk, "image", fake=True)
                rows.append((int(asset_id), frame_idx, float(np.round(f.mean(), 6))))
        yield pd.DataFrame(rows, columns=["asset_id", "frame_idx", "frame_feat_mean"])


def extract_features(assets: DataFrame) -> DataFrame:
    return assets.mapInPandas(feature_extract_iter, schema=FEATURES_DDL)


def sample_frames(assets: DataFrame) -> DataFrame:
    video = assets.filter(F.col("kind") == "video")
    return video.mapInPandas(
        frame_sample_iter,
        schema="asset_id long, frame_idx int, frame_feat_mean double",
    )
