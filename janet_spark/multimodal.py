"""Multimodal column plumbing: opaque binary payloads with typed metadata.

Images/audio/video are carried as `binary` columns plus a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
mapInPandas stages. IMAGE decode is REAL (round-5): PNG payloads decode
through the pure-stdlib codec in png_codec.py (zlib inflate + scanline
unfiltering — verified against externally-encoded system PNGs and an
arithmetic DuckDB oracle). AUDIO decode is REAL too (round-5): 16-bit
integer-PCM WAV payloads decode through wav_codec.py (struct-only RIFF
chunk walk, cross-validated against the stdlib `wave` module in both
directions). VIDEO decode is REAL at the container level: uncompressed
24-bit-DIB AVI payloads decode through avi_codec.py (nested-RIFF walk +
BMP-style frame buffers), so frame sampling runs on real bytes; the
honest codec-bound boundary is COMPRESSED bitstreams (H.26x/VP9/AV1),
which raise ValueError naming the fourcc — a codec library genuinely
cannot be built from the stdlib. `fake=True` remains for exercising the
Spark-side plumbing (schema, partitioning, UDF signature, batch shape)
with payloads that aren't real media files.
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
    """Decode one payload to a FEATURE_DIM float feature array.

    kind='image' is a REAL decode: the payload is parsed as PNG by the
    pure-stdlib codec (png_codec.decode_png) and featurized as the
    16-bin normalized luminance histogram. kind='audio' is a REAL decode
    too: the payload is parsed as 16-bit integer-PCM WAV
    (wav_codec.decode_wav) and featurized as the 16-bin normalized
    amplitude histogram over the full int16 range. kind='video' is a
    REAL decode for uncompressed-DIB AVI (avi_codec.decode_avi),
    featurized as the 16-bin luminance histogram over all frames;
    compressed bitstreams raise ValueError naming the fourcc (the
    genuine codec-library boundary). A malformed payload raises
    ValueError loudly for all three kinds; `fake=True` substitutes the
    deterministic stand-in for non-media payloads.
    """
    if not fake:
        if kind == "image":
            from janet_spark.png_codec import decode_png

            _, _, _, px = decode_png(payload)
            grey = px.astype(np.float64).mean(axis=2)
            if grey.size == 0:
                # loud-reject contract: a 0x0 image has no featurizable
                # content; silently returning NaNs would flow downstream
                raise ValueError("image decodes to zero pixels")
            hist, _ = np.histogram(grey, bins=FEATURE_DIM, range=(0.0, 256.0))
            return hist.astype(np.float64) / grey.size
        if kind == "audio":
            from janet_spark.wav_codec import decode_wav

            _, _, samples = decode_wav(payload)
            if samples.size == 0:
                raise ValueError("audio decodes to zero samples")
            hist, _ = np.histogram(
                samples, bins=FEATURE_DIM, range=(-32768.0, 32768.0)
            )
            return hist.astype(np.float64) / samples.size
        if kind == "video":
            from janet_spark.avi_codec import decode_avi

            frames = decode_avi(payload)
            if frames.size == 0:
                return np.zeros(FEATURE_DIM, dtype=np.float64)
            grey = frames.astype(np.float64).mean(axis=3)
            hist, _ = np.histogram(grey, bins=FEATURE_DIM, range=(0.0, 256.0))
            return hist.astype(np.float64) / grey.size
        raise ValueError(f"unknown payload kind: {kind!r}")
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


def synth_png_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic REAL-PNG asset corpus: one RGB PNG per document,
    width = doc_id % 24 + 8, height = doc_id % 16 + 8, pixel content from
    png_codec.synth_pixels (a pure arithmetic function of
    (asset_id, x, y, channel), so a SQL oracle can recompute any pixel
    statistic without touching the bytes). The encoder rotates all five
    PNG filter types across scanlines, so every downstream decode
    exercises the full unfilter path. Encoding runs as an Arrow-batched
    mapInPandas stage — per-asset, shuffle-free, 100 TB-parallel."""
    from janet_spark.png_codec import encode_png, synth_pixels

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                encode_png(
                    synth_pixels(int(a), int(a) % 24 + 8, int(a) % 16 + 8)
                )
                for a in pdf["doc_id"]
            ]
            yield pd.DataFrame(
                {"asset_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    return docs.mapInPandas(gen, schema="asset_id long, payload binary")


IMAGE_STATS_DDL = (
    "asset_id long, width int, height int, n_channels int, "
    "sum_c0 long, sum_c1 long, sum_c2 long, "
    "min_c0 int, max_c0 int, min_c2 int, max_c2 int"
)


def decode_image_stats(assets: DataFrame) -> DataFrame:
    """REAL image decode as a distributed operator: parse each asset's
    PNG bytes (dimensions, channels, and every pixel come from the BYTES,
    not from passed-through metadata columns), then emit per-channel
    pixel sums and extrema. The second Arrow hop (binary payload between
    two Python stages) is deliberate — it is the production shape where
    the encoded column is stored and decoded downstream. Per-asset
    parallel, zero shuffle."""
    from janet_spark.png_codec import decode_png

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for a, p in zip(pdf["asset_id"], pdf["payload"]):
                w, h, ch, px = decode_png(bytes(p))
                s = px.astype(np.int64).sum(axis=(0, 1))
                # channel-general: greyscale broadcasts its single plane
                # (c_i reads plane min(i, ch-1)), so a color-type-0 PNG —
                # which decode_png legitimately returns as ch=1 — reports
                # r=g=b stats instead of crashing on s[1]/s[2]
                c = lambda i: min(i, ch - 1)
                rows.append(
                    (
                        int(a), w, h, ch,
                        int(s[c(0)]), int(s[c(1)]), int(s[c(2)]),
                        int(px[:, :, c(0)].min()), int(px[:, :, c(0)].max()),
                        int(px[:, :, c(2)].min()), int(px[:, :, c(2)].max()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "width", "height", "n_channels",
                    "sum_c0", "sum_c1", "sum_c2",
                    "min_c0", "max_c0", "min_c2", "max_c2",
                ],
            )

    return assets.mapInPandas(dec, schema=IMAGE_STATS_DDL)


RESIZE_STATS_DDL = (
    "asset_id long, r_width int, r_height int, "
    "rmean_c0 double, rmean_c1 double, rmean_c2 double, "
    "rmin_c0 double, rmax_c0 double, rmin_c2 double, rmax_c2 double"
)


def resize_image_stats(assets: DataFrame) -> DataFrame:
    """REAL image resize as a distributed operator: decode each asset's
    PNG bytes, 2x2 box-average downsample (odd trailing row/column
    trimmed — the standard box filter), and emit the resized image's
    per-channel mean and extrema. Every resized value is an exact
    multiple of 0.25 (a 4-pixel integer sum / 4) and the mean is one
    division of an exact quarter-sum, so a SQL oracle grouping the pixel
    generator by (x//2, y//2) reproduces the doubles bit-for-bit.
    Per-asset parallel, zero shuffle."""
    from janet_spark.png_codec import decode_png

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for a, p in zip(pdf["asset_id"], pdf["payload"]):
                w, h, _, px = decode_png(bytes(p))
                w2, h2 = w // 2, h // 2
                t = px[: h2 * 2, : w2 * 2].astype(np.float64)
                resized = (
                    t[0::2, 0::2] + t[1::2, 0::2] + t[0::2, 1::2] + t[1::2, 1::2]
                ) / 4.0
                rows.append(
                    (
                        int(a), w2, h2,
                        float(resized[:, :, 0].mean()),
                        float(resized[:, :, 1].mean()),
                        float(resized[:, :, 2].mean()),
                        float(resized[:, :, 0].min()),
                        float(resized[:, :, 0].max()),
                        float(resized[:, :, 2].min()),
                        float(resized[:, :, 2].max()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "r_width", "r_height",
                    "rmean_c0", "rmean_c1", "rmean_c2",
                    "rmin_c0", "rmax_c0", "rmin_c2", "rmax_c2",
                ],
            )

    return assets.mapInPandas(dec, schema=RESIZE_STATS_DDL)


def synth_wav_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic REAL-WAV asset corpus: one stereo 16-bit PCM WAV per
    document, n_samples = doc_id % 240 + 60, sample_rate cycling
    8/12/16 kHz by doc_id % 3, sample content from wav_codec.synth_samples
    (a pure arithmetic function of (asset_id, t, channel), so a SQL
    oracle can recompute any sample statistic without touching the
    bytes). Encoding runs as an Arrow-batched mapInPandas stage —
    per-asset, shuffle-free, 100 TB-parallel."""
    from janet_spark.wav_codec import encode_wav, synth_samples

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                encode_wav(
                    synth_samples(int(a), int(a) % 240 + 60, 2),
                    8000 + (int(a) % 3) * 4000,
                )
                for a in pdf["doc_id"]
            ]
            yield pd.DataFrame(
                {"asset_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    return docs.mapInPandas(gen, schema="asset_id long, payload binary")


AUDIO_STATS_DDL = (
    "asset_id long, sample_rate int, n_channels int, n_samples int, "
    "sum_c0 long, sum_c1 long, min_c0 int, max_c0 int, min_c1 int, max_c1 int"
)


def decode_audio_stats(assets: DataFrame) -> DataFrame:
    """REAL audio decode as a distributed operator: parse each asset's
    WAV bytes (sample rate, channel count, frame count, and every sample
    come from the BYTES, not from passed-through metadata columns), then
    emit per-channel sample sums and extrema. Same production shape as
    decode_image_stats: the encoded binary column crosses an Arrow hop
    and decodes downstream. Per-asset parallel, zero shuffle."""
    from janet_spark.wav_codec import decode_wav

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for a, p in zip(pdf["asset_id"], pdf["payload"]):
                rate, ch, s = decode_wav(bytes(p))
                tot = s.astype(np.int64).sum(axis=0)
                # channel-general like decode_image_stats: a mono WAV
                # (ch=1, legitimate decode_wav output) reports c1 == c0
                # instead of crashing on tot[1]/s[:, 1]
                c1 = min(1, ch - 1)
                rows.append(
                    (
                        int(a), rate, ch, int(s.shape[0]),
                        int(tot[0]), int(tot[c1]),
                        int(s[:, 0].min()), int(s[:, 0].max()),
                        int(s[:, c1].min()), int(s[:, c1].max()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "sample_rate", "n_channels", "n_samples",
                    "sum_c0", "sum_c1",
                    "min_c0", "max_c0", "min_c1", "max_c1",
                ],
            )

    return assets.mapInPandas(dec, schema=AUDIO_STATS_DDL)


AUDIO_FRAME_DDL = (
    "asset_id long, frame_idx int, frame_len int, rms_c0 double, zcr_c0 int"
)


def audio_frame_features(assets: DataFrame, frame_len: int = 64) -> DataFrame:
    """REAL audio feature extraction as a distributed operator (the
    'feature-extract' leg of the brief's decode/feature-extract surface,
    on real bytes): decode each asset's WAV payload with the pure-stdlib
    codec, split channel 0 into non-overlapping `frame_len`-sample frames
    (the tail partial frame kept with its true length), and emit the two
    classic short-time features per frame — RMS energy and the
    zero-crossing count (strict sign change: v[t]*v[t+1] < 0 between
    consecutive samples INSIDE the frame).

    Bit-for-bit oracle compatibility: RMS = sqrt(sum(v^2)/n) where both
    the sum of squares and n are exact integers in both systems, the
    division and IEEE sqrt of identical doubles are deterministic, and
    the result rounds to 4 places; the crossing count is an exact
    integer. Per-asset mapInPandas — shuffle-free, linear, 100 TB
    parallel. Reference analog: opaque asset payload decoded downstream
    (apps/ocr/src/lib/ocr-utils.ts:197-222)."""
    import math

    from janet_spark.wav_codec import decode_wav

    def feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for a, p in zip(pdf["asset_id"], pdf["payload"]):
                _rate, _ch, s = decode_wav(bytes(p))
                v = s[:, 0].astype(np.int64)
                for fi in range(0, (len(v) + frame_len - 1) // frame_len):
                    fr = v[fi * frame_len : (fi + 1) * frame_len]
                    sum_sq = int((fr * fr).sum())
                    rms = math.sqrt(sum_sq / len(fr))
                    zc = int(((fr[:-1] * fr[1:]) < 0).sum())
                    rows.append((int(a), fi, int(len(fr)), rms, zc))
            yield pd.DataFrame(
                rows,
                columns=["asset_id", "frame_idx", "frame_len", "rms_c0", "zcr_c0"],
            )

    return assets.mapInPandas(feat, schema=AUDIO_FRAME_DDL)


def synth_avi_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic REAL-AVI asset corpus: one uncompressed 24-bit AVI
    per document, n_frames = doc_id % 6 + 2, width = doc_id % 10 + 6,
    height = doc_id % 8 + 5, frame content from avi_codec.synth_frames
    (a pure arithmetic function of (asset_id, frame, x, y, channel), so
    a SQL oracle can recompute any frame statistic without touching the
    bytes). Widths are deliberately non-multiples of 4 for some assets
    so every decode exercises the DIB row-padding path. Encoding runs as
    an Arrow-batched mapInPandas stage — per-asset, shuffle-free."""
    from janet_spark.avi_codec import encode_avi, synth_frames

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                encode_avi(
                    synth_frames(
                        int(a), int(a) % 6 + 2, int(a) % 10 + 6, int(a) % 8 + 5
                    )
                )
                for a in pdf["doc_id"]
            ]
            yield pd.DataFrame(
                {"asset_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    return docs.mapInPandas(gen, schema="asset_id long, payload binary")


FRAME_SAMPLE_DDL = (
    "asset_id long, n_frames int, frame_idx int, "
    "sum_c0 long, sum_c1 long, sum_c2 long, n_px int"
)


def sample_video_frames(assets: DataFrame, stride: int = 2) -> DataFrame:
    """REAL video frame-sampling as a distributed operator: parse each
    asset's AVI bytes (frame count, dimensions, and every pixel come from
    the BYTES), keep every `stride`-th frame, and emit per-channel pixel
    sums per kept frame — the frame-grain analog of decode_image_stats.
    One input asset row explodes to ceil(n_frames/stride) output rows
    inside the same Arrow batch; per-asset parallel, zero shuffle."""
    from janet_spark.avi_codec import decode_avi

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for a, p in zip(pdf["asset_id"], pdf["payload"]):
                frames = decode_avi(bytes(p))
                n = frames.shape[0]
                for fi in range(0, n, stride):
                    s = frames[fi].astype(np.int64).sum(axis=(0, 1))
                    rows.append(
                        (
                            int(a), n, fi,
                            int(s[0]), int(s[1]), int(s[2]),
                            int(frames.shape[1] * frames.shape[2]),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "n_frames", "frame_idx",
                    "sum_c0", "sum_c1", "sum_c2", "n_px",
                ],
            )

    return assets.mapInPandas(dec, schema=FRAME_SAMPLE_DDL)


def extract_features(assets: DataFrame) -> DataFrame:
    return assets.mapInPandas(feature_extract_iter, schema=FEATURES_DDL)


def sample_frames(assets: DataFrame) -> DataFrame:
    video = assets.filter(F.col("kind") == "video")
    return video.mapInPandas(
        frame_sample_iter,
        schema="asset_id long, frame_idx int, frame_feat_mean double",
    )
