"""Pure-stdlib uncompressed-AVI codec (struct only — no ffmpeg).

The video third of the round-5 modality closures (png_codec.py,
wav_codec.py): an AVI container holding uncompressed DIB (BI_RGB) frames
is just nested RIFF — the same chunk grammar wav_codec walks — plus
BMP-style frame buffers (bottom-up rows, BGR byte order, rows padded to
4 bytes), all of which `struct` + numpy strides parse exactly. So frame
extraction over uncompressed video decodes for REAL here, and the honest
stub narrows to compressed bitstreams (H.26x/VP9/AV1), which genuinely
need a codec library: decode_avi raises ValueError naming the fourcc
when the stream is compressed, never a silent mis-decode.

Reference analog: the reference treats page assets as opaque payloads
probed then decoded downstream (apps/ocr/src/lib/ocr-utils.ts:197-222).

Supported shape — what the synthetic/ingest path produces: RIFF 'AVI ',
one 'vids' stream, BITMAPINFOHEADER with biCompression=0 (BI_RGB) and
24-bit pixels, frames as '00db'/'00dc' chunks inside LIST 'movi'.
"""

from __future__ import annotations

import struct

import numpy as np


def _bmp_rows(frame: np.ndarray) -> bytes:
    """(h, w, 3) RGB uint8 -> DIB buffer: bottom-up, BGR, rows padded to 4."""
    h, w, _ = frame.shape
    bgr = frame[::-1, :, ::-1]  # bottom-up + channel swap
    pad = (-(w * 3)) % 4
    if pad:
        padded = np.zeros((h, w * 3 + pad), np.uint8)
        padded[:, : w * 3] = bgr.reshape(h, w * 3)
        return padded.tobytes()
    return bgr.tobytes()


def encode_avi(frames: np.ndarray, fps: int = 10) -> bytes:
    """Encode (n_frames, h, w, 3) RGB uint8 as a minimal RIFF/AVI file
    with uncompressed 24-bit DIB frames ('00db' chunks in LIST 'movi')."""
    if frames.ndim != 4 or frames.shape[3] != 3 or frames.dtype != np.uint8:
        raise ValueError("frames must be (n, h, w, 3) uint8")
    n, h, w, _ = frames.shape
    frame_size = ((w * 3 + 3) // 4 * 4) * h

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps,  # microseconds per frame
        frame_size * fps,  # max bytes per sec
        0, 0, n, 0, 1, frame_size, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"DIB ", 0, 0, 0, 0, 1, fps, 0, n, frame_size, 0, 0,
        0, 0, w, h,
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_size, 0, 0, 0, 0)

    def chunk(tag: bytes, body: bytes) -> bytes:
        return tag + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) % 2 else b""
        )

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00db", _bmp_rows(f)) for f in frames))
    return chunk(b"RIFF", b"AVI " + hdrl + movi)


def _walk(data: bytes, pos: int, end: int):
    """Yield (tag, list_kind_or_None, body_start, body_size) over a RIFF
    chunk run; the caller recurses into LIST bodies as it chooses."""
    while pos + 8 <= end:
        tag = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = pos + 8
        if body + size > end:
            raise ValueError(f"truncated AVI: chunk {tag!r} overruns file")
        kind = data[body : body + 4] if tag == b"LIST" else None
        yield tag, kind, body, size
        pos = body + size + (size % 2)


def decode_avi(data: bytes) -> np.ndarray:
    """Decode an uncompressed 24-bit AVI from bytes alone.

    Returns (n_frames, h, w, 3) RGB uint8. Compressed streams raise
    ValueError naming the compression (the honest codec-bound boundary);
    malformed containers raise ValueError too.
    """
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI: bad RIFF/'AVI ' signature")
    w = h = -1
    frames: list[np.ndarray] = []
    fmt_seen = False

    def scan(pos: int, end: int) -> None:
        nonlocal w, h, fmt_seen
        for tag, kind, body, size in _walk(data, pos, end):
            if tag == b"LIST":
                scan(body + 4, body + size)
            elif tag == b"strf" and not fmt_seen:
                if size < 20:
                    raise ValueError("malformed AVI: strf too short")
                _, bw, bh, _, bits, comp = struct.unpack_from(
                    "<IiiHHI", data, body
                )
                if comp != 0:
                    fourcc = struct.pack("<I", comp)
                    raise ValueError(
                        "unsupported AVI: compressed stream "
                        f"(biCompression={fourcc!r}) needs a codec library"
                    )
                if bits != 24:
                    raise ValueError(f"unsupported AVI: {bits}-bit (only 24)")
                w, h, fmt_seen = bw, abs(bh), True
            elif tag in (b"00db", b"00dc"):
                if not fmt_seen:
                    raise ValueError("malformed AVI: frame before strf")
                stride = (w * 3 + 3) // 4 * 4
                if size != stride * h:
                    raise ValueError("malformed AVI: frame size mismatch")
                rows = np.frombuffer(
                    data, np.uint8, count=stride * h, offset=body
                ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
                frames.append(rows[::-1, :, ::-1].copy())  # un-flip, BGR->RGB

    scan(12, len(data))
    if not fmt_seen:
        raise ValueError("malformed AVI: no strf chunk")
    return (
        np.stack(frames)
        if frames
        else np.zeros((0, h, w, 3), np.uint8)
    )


def synth_frames(asset_id: int, n: int, w: int, h: int) -> np.ndarray:
    """Deterministic frame content — a pure arithmetic function of
    (asset_id, frame, x, y, channel) so a SQL oracle can recompute any
    frame statistic without touching the bytes (the video twin of
    png_codec.synth_pixels): v = (id*31 + f*17 + x*7 + y*13 + c*101) % 256."""
    f = np.arange(n, dtype=np.int64)[:, None, None, None]
    y = np.arange(h, dtype=np.int64)[None, :, None, None]
    x = np.arange(w, dtype=np.int64)[None, None, :, None]
    c = np.arange(3, dtype=np.int64)[None, None, None, :]
    return (
        (asset_id * 31 + f * 17 + x * 7 + y * 13 + c * 101) % 256
    ).astype(np.uint8)
