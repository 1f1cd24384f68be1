"""Pure-stdlib PCM WAV codec (struct only — no libsndfile, no audioop).

Round-5 follow-through on the round-4 verdict's PNG argument: the
"real audio decode needs libsndfile" claim in multimodal.decode_payload
was as overstated for PCM WAV as the PIL claim was for PNG.  A RIFF/WAVE
container with 16-bit integer PCM needs nothing beyond `struct` to parse
exactly, so the ingest-shaped subset decodes for real here and the
NotImplementedError narrows to video (genuinely codec-bound: no H.26x /
VP9 / AV1 bitstream decoder is stdlib-feasible).

Reference analog: the reference treats page assets as opaque payloads
probed then decoded downstream (apps/ocr/src/lib/ocr-utils.ts:197-222);
this is the audio-modality twin of png_codec.py.

Supported shape — what the synthetic/ingest path produces: RIFF/WAVE,
fmt chunk with audio_format=1 (integer PCM), bits_per_sample=16, any
channel count / sample rate, extra chunks (LIST, fact, ...) tolerated
and skipped.  Anything else (float PCM, ADPCM, MP3-in-WAV, 8/24/32-bit,
truncated data) raises ValueError — a loud reject, never a mis-decode.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode (n_samples, n_channels) int16 samples as a canonical
    RIFF/WAVE 16-bit PCM file (interleaved little-endian frames)."""
    if samples.ndim != 2:
        raise ValueError("samples must be (n_samples, n_channels)")
    if samples.dtype != np.int16:
        raise ValueError("samples must be int16")
    n, ch = samples.shape
    data = samples.astype("<i2").tobytes()  # row-major == interleaved
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, byte_rate, ch * 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) % 2 else b"")  # RIFF chunks pad to even
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a 16-bit integer-PCM RIFF/WAVE file from bytes alone.

    Returns (sample_rate, n_channels, samples) with samples shaped
    (n_samples, n_channels) as int16.  Walks the RIFF chunk list, so
    files carrying extra chunks (LIST/INFO, fact) decode fine; every
    unsupported or malformed shape raises ValueError.
    """
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF/WAVE signature")
    pos = 12
    fmt_seen = False
    sample_rate = n_channels = 0
    pcm_data: bytes | None = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body_at = pos + 8
        if body_at + size > len(data):
            raise ValueError(f"truncated WAV: chunk {tag!r} overruns file")
        if tag == b"fmt ":
            if size < 16:
                raise ValueError("malformed WAV: fmt chunk too short")
            audio_format, n_channels, sample_rate, _, _, bits = (
                struct.unpack_from("<HHIIHH", data, body_at)
            )
            if audio_format != 1:
                raise ValueError(
                    f"unsupported WAV: audio_format={audio_format} "
                    "(only integer PCM=1)"
                )
            if bits != 16:
                raise ValueError(f"unsupported WAV: {bits}-bit (only 16)")
            if n_channels < 1:
                raise ValueError("malformed WAV: zero channels")
            fmt_seen = True
        elif tag == b"data":
            pcm_data = data[body_at : body_at + size]
        pos = body_at + size + (size % 2)  # chunks are even-aligned
    if not fmt_seen:
        raise ValueError("malformed WAV: no fmt chunk")
    if pcm_data is None:
        raise ValueError("malformed WAV: no data chunk")
    frame = n_channels * 2
    if len(pcm_data) % frame:
        raise ValueError("malformed WAV: data not a whole number of frames")
    samples = np.frombuffer(pcm_data, dtype="<i2").reshape(-1, n_channels)
    return sample_rate, n_channels, samples.astype(np.int16)


def synth_samples(asset_id: int, n: int, ch: int = 2) -> np.ndarray:
    """Deterministic sample content — a pure arithmetic function of
    (asset_id, t, channel) so a SQL oracle can recompute any sample
    statistic without touching the bytes (the audio twin of
    png_codec.synth_pixels): v = (id*31 + t*7 + c*101) % 4096 - 2048."""
    t = np.arange(n, dtype=np.int64)[:, None]
    c = np.arange(ch, dtype=np.int64)[None, :]
    return ((asset_id * 31 + t * 7 + c * 101) % 4096 - 2048).astype(np.int16)
