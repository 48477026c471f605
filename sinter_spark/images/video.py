"""``rawvid`` — the repo's builtin video container, with REAL seekable
frame decode (the video analogue of the builtin image codecs in
``codecs.py``).

No ffmpeg/PyAV ships in this container (SURVEY.md §7.0), so mp4/webm
payloads stay stubbed — but the *operator* semantics a training-data
pipeline needs from video (probe metadata, sample k frames uniformly,
decode ONLY those frames, feature-extract each) are format-independent.
``rawvid`` makes them real: a deterministic container with a frame
INDEX, so sampling k frames of an n-frame video costs O(k) inflate
work + an O(1) header read — the same access pattern an mp4 keyframe
sampler has, which is the property that matters at 100 TB (a sampler
that must decode the whole stream to reach frame i does 30× the work).

Layout (little-endian)::

    magic   4s   b"RVID"
    version u8   1
    n       u16  frame count
    w, h    u16  frame dims
    c       u8   channels (3)
    index   n × (u32 offset, u32 length)   — relative to data start
    data    n zlib-compressed raw RGB frames

Every malformed-payload path raises :class:`~.codecs.DecodeError`
(fuzz-gated in tests/test_codec_fuzz.py, like the image codecs).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from .codecs import DecodeError

MAGIC = b"RVID"
_HDR = struct.Struct("<4sBHHHB")
_IDX = struct.Struct("<II")


def encode_rawvid(frames: np.ndarray) -> bytes:
    """Encode (n, h, w, 3) uint8 frames; each frame zlib-compressed and
    indexed for O(1) seek."""
    frames = np.asarray(frames, dtype=np.uint8)
    if frames.ndim != 4 or frames.shape[3] != 3:
        raise ValueError("encode_rawvid expects (n, h, w, 3) uint8")
    n, h, w, c = frames.shape
    blobs = [zlib.compress(f.tobytes(), 6) for f in frames]
    index, off = [], 0
    for b in blobs:
        index.append(_IDX.pack(off, len(b)))
        off += len(b)
    return b"".join(
        [_HDR.pack(MAGIC, 1, n, w, h, c)] + index + blobs
    )


def probe_rawvid(data: bytes) -> dict:
    """O(1) metadata read: {n_frames, w, h, channels}."""
    if len(data) < _HDR.size:
        raise DecodeError("rawvid: truncated header")
    magic, ver, n, w, h, c = _HDR.unpack_from(data, 0)
    if magic != MAGIC:
        raise DecodeError("rawvid: bad magic")
    if ver != 1:
        raise DecodeError(f"rawvid: unsupported version {ver}")
    if w < 1 or h < 1:
        raise DecodeError(f"rawvid: bad dimensions {w}x{h}")
    if c != 3:
        raise DecodeError(f"rawvid: unsupported channel count {c}")
    if len(data) < _HDR.size + n * _IDX.size:
        raise DecodeError("rawvid: truncated index")
    return {"n_frames": n, "w": w, "h": h, "channels": c}


def decode_rawvid_frame(data: bytes, idx: int) -> np.ndarray:
    """Decode ONLY frame ``idx`` (h, w, 3): one index lookup + one
    inflate — never touches the other frames' bytes."""
    meta = probe_rawvid(data)
    n, w, h, c = meta["n_frames"], meta["w"], meta["h"], meta["channels"]
    if not 0 <= idx < n:
        raise DecodeError(f"rawvid: frame {idx} out of range (n={n})")
    off, length = _IDX.unpack_from(data, _HDR.size + idx * _IDX.size)
    start = _HDR.size + n * _IDX.size + off
    blob = data[start : start + length]
    if len(blob) != length:
        raise DecodeError("rawvid: truncated frame data")
    try:
        raw = zlib.decompress(blob)
    except zlib.error as e:
        raise DecodeError(f"rawvid: frame inflate failed: {e}") from e
    if len(raw) != h * w * c:
        raise DecodeError(
            f"rawvid: frame size mismatch: {len(raw)} != {h * w * c}"
        )
    return np.frombuffer(raw, dtype=np.uint8).reshape(h, w, c).copy()


def sample_indices(n_frames: int, k: int) -> list[int]:
    """Uniform distinct sample of k frame indices over [0, n): the
    endpoints-inclusive spread ffmpeg-style thumbnailers use."""
    if n_frames <= 0:
        return []
    if k >= n_frames:
        return list(range(n_frames))
    if k == 1:
        return [n_frames // 2]
    return sorted({round(i * (n_frames - 1) / (k - 1)) for i in range(k)})


def synth_video_frames(
    n_frames: int = 16, w: int = 32, h: int = 24, *, seed: int = 7
) -> np.ndarray:
    """Deterministic synthetic clip SOURCE frames (n, h, w, 3): a
    bright block orbiting a noisy background (adjacent frames
    near-identical, distant frames not — gives frame features
    realistic temporal structure). Exposed separately from the encoded
    container so ground-truth expectations can be computed from the
    source pixels, independent of the decoder."""
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 64, size=(h, w, 3), dtype=np.uint8)
    frames = np.empty((n_frames, h, w, 3), dtype=np.uint8)
    for i in range(n_frames):
        f = base.copy()
        cx = int((np.cos(2 * np.pi * i / n_frames) * 0.4 + 0.5) * (w - 8))
        cy = int((np.sin(2 * np.pi * i / n_frames) * 0.4 + 0.5) * (h - 8))
        f[cy : cy + 8, cx : cx + 8] = [230, 180 + (i * 4) % 64, 40]
        frames[i] = f
    return frames


def synth_video(
    n_frames: int = 16, w: int = 32, h: int = 24, *, seed: int = 7
) -> bytes:
    """Encoded ``rawvid`` container of :func:`synth_video_frames`."""
    return encode_rawvid(synth_video_frames(n_frames, w, h, seed=seed))
