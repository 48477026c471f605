"""Pure-numpy/stdlib image codecs for the image+caption table.

The sandbox has no Pillow/cv2 (SURVEY.md §7.0), so the engine ships
three self-contained codecs exercising the north-star's
decoded-pixel invariant (BASELINE.json input_hint: allclose for
lossless, PSNR ≥ 40 dB for lossy):

* ``raw``  — header + uint8 RGB bytes (lossless)
* ``png``  — real, spec-conformant minimal PNG via zlib/struct
             (lossless; filter 0; decodable by any PNG reader)
* ``qjpg`` — deterministic lossy codec: 6-bit per-channel
             quantization + zlib (typical PSNR ≈ 47 dB, safely above
             the 40 dB gate; corruption drops it below or breaks decode)

Decoder dispatch per ``fmt`` is the discriminated-union pattern
(``/root/reference/lib/sinter/types.ex:334-381``) with ``fmt`` as the
discriminator.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


class DecodeError(ValueError):
    pass


# --- raw --------------------------------------------------------------------

_RAW_MAGIC = b"SRAW"


def encode_raw(arr: np.ndarray) -> bytes:
    h, w, c = arr.shape
    return _RAW_MAGIC + struct.pack(">HHB", h, w, c) + arr.astype(np.uint8).tobytes()


def decode_raw(data: bytes) -> np.ndarray:
    if len(data) < 9 or data[:4] != _RAW_MAGIC:
        raise DecodeError("bad raw magic")
    h, w, c = struct.unpack(">HHB", data[4:9])
    body = data[9:]
    if len(body) != h * w * c:
        raise DecodeError(f"raw payload size mismatch: {len(body)} != {h * w * c}")
    return np.frombuffer(body, dtype=np.uint8).reshape(h, w, c)


# --- png (minimal, filter 0) -------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    h, w, c = arr.shape
    if c != 3:
        raise ValueError("png encoder supports RGB only")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit, color type 2
    raw = b"".join(b"\x00" + arr[y].astype(np.uint8).tobytes() for y in range(h))
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    if len(data) < 8 or data[:8] != _PNG_SIG:
        raise DecodeError("bad png signature")
    pos = 8
    w = h = None
    idat = b""
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if len(payload) != length:
            raise DecodeError("truncated chunk")
        crc = data[pos + 8 + length : pos + 12 + length]
        if len(crc) != 4 or struct.unpack(">I", crc)[0] != (zlib.crc32(tag + payload) & 0xFFFFFFFF):
            raise DecodeError("chunk crc mismatch")
        if tag == b"IHDR":
            if len(payload) < 10:
                raise DecodeError("short IHDR")
            w, h, depth, ctype = struct.unpack(">IIBB", payload[:10])
            if depth != 8 or ctype != 2:
                raise DecodeError("unsupported png variant")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + length
    if w is None or not idat:
        raise DecodeError("missing IHDR/IDAT")
    try:
        raw = zlib.decompress(idat)
    except zlib.error as e:
        raise DecodeError(f"idat inflate failed: {e}") from e
    stride = 1 + w * 3
    if len(raw) != h * stride:
        raise DecodeError("scanline size mismatch")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride)
    filters = rows[:, 0]
    out = rows[:, 1:].reshape(h, w, 3).copy()
    # we encode filter 0 only; tolerate 1 (Sub) and 2 (Up) for generality
    for y in range(h):
        f = filters[y]
        if f == 0:
            continue
        if f == 1:
            line = out[y].astype(np.int32)
            for x in range(1, w):
                line[x] = (line[x] + line[x - 1]) & 0xFF
            out[y] = line.astype(np.uint8)
        elif f == 2:
            if y > 0:  # spec: Up on row 0 adds an implicit zero row (no-op)
                out[y] = ((out[y].astype(np.int32) + out[y - 1].astype(np.int32)) & 0xFF).astype(np.uint8)
        else:
            raise DecodeError(f"unsupported filter {f}")
    return out


# --- qjpg: deterministic lossy ------------------------------------------------

_QJPG_MAGIC = b"QJPG"
_QBITS = 6  # 6-bit quantization → max err 2, PSNR ≈ 47 dB


def encode_qjpg(arr: np.ndarray) -> bytes:
    h, w, c = arr.shape
    q = (arr.astype(np.uint16) >> (8 - _QBITS)).astype(np.uint8)
    return (
        _QJPG_MAGIC
        + struct.pack(">HHBB", h, w, c, _QBITS)
        + zlib.compress(q.tobytes(), 6)
    )


def decode_qjpg(data: bytes) -> np.ndarray:
    if len(data) < 10 or data[:4] != _QJPG_MAGIC:
        raise DecodeError("bad qjpg magic")
    h, w, c, bits = struct.unpack(">HHBB", data[4:10])
    try:
        body = zlib.decompress(data[10:])
    except zlib.error as e:
        raise DecodeError(f"qjpg inflate failed: {e}") from e
    if len(body) != h * w * c:
        raise DecodeError("qjpg size mismatch")
    if not (1 <= bits <= 7):
        raise DecodeError(f"qjpg bits out of range: {bits}")
    q = np.frombuffer(body, dtype=np.uint8).reshape(h, w, c)
    # dequantize to bucket midpoints
    shift = 8 - bits
    return ((q.astype(np.uint16) << shift) + (1 << (shift - 1))).clip(0, 255).astype(np.uint8)


# --- dispatch + metrics -------------------------------------------------------

ENCODERS = {"raw": encode_raw, "png": encode_png, "qjpg": encode_qjpg}
DECODERS = {"raw": decode_raw, "png": decode_png, "qjpg": decode_qjpg}
LOSSY_FMTS = frozenset({"qjpg", "jpeg", "pjpeg"})

# real baseline JPEG (ITU T.81) lives in jpeg.py; registered here so the
# decode dispatch, image suite, and fuzz gates pick it up uniformly.
# (jpeg.py imports DecodeError from this module — defined above, so the
# tail import is cycle-safe.)
from .jpeg import decode_jpeg, encode_jpeg  # noqa: E402

ENCODERS["jpeg"] = encode_jpeg
DECODERS["jpeg"] = decode_jpeg


def _encode_pjpeg(arr: np.ndarray) -> bytes:
    """Progressive (SOF2) JPEG — spectral-selection scan script."""
    return encode_jpeg(arr, progressive=True)


# progressive JPEG as its own fmt tag: same decoder (decode_jpeg
# handles SOF0/1/2 uniformly), distinct encoder scan script
ENCODERS["pjpeg"] = _encode_pjpeg
DECODERS["pjpeg"] = decode_jpeg

# real GIF87a/89a (public CompuServe/W3C spec) lives in gif.py — a
# palette format, lossless for ≤256-color input (truecolor callers
# posterize first; gif.encode_gif documents the contract)
from .gif import decode_gif, encode_gif, posterize_rgb332  # noqa: E402


def _encode_gif_posterized(arr: np.ndarray) -> bytes:
    """Registry-facing GIF encoder: palette-limit truecolor input the
    way a real GIF origin does, then encode losslessly."""
    return encode_gif(posterize_rgb332(arr))


ENCODERS["gif"] = _encode_gif_posterized
DECODERS["gif"] = decode_gif


def decode(fmt: str, data: bytes) -> np.ndarray:
    dec = DECODERS.get(fmt)
    if dec is None:
        raise DecodeError(f"unknown fmt '{fmt}'")
    try:
        return dec(data)
    except DecodeError:
        raise
    except Exception as e:  # noqa: BLE001 — untrusted bytes: ANY decoder
        # exception is a corrupt payload; a validator must emit a
        # violation row, never crash the Spark task on one bad row
        raise DecodeError(f"malformed {fmt} payload: {type(e).__name__}: {e}") from e


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    if a.shape != b.shape:
        return 0.0
    # f32 diff, f64 accumulator: half the memory traffic of an f64 diff
    # with no loss of precision that matters at a 40 dB threshold
    d = a.astype(np.float32) - b.astype(np.float32)
    mse = np.mean(np.square(d, out=d), dtype=np.float64)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0**2 / mse))
