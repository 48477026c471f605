"""REAL GIF (GIF87a/GIF89a) codec — pure numpy + stdlib, built from the
public GIF89a specification (CompuServe, 1990-07-31; also W3C's copy at
w3.org/Graphics/GIF/spec-gif89a.txt).

Why GIF: after JPEG/PNG it is the most common image format in web
crawls, and the only widespread *animated* raster format — a
crawl-scale validation suite that turns every GIF into an
``unknown fmt`` violation row mislabels a large slice of real data.
Reference behavior parity: the reference validates opaque payloads per
declared format (sinter `validator.ex` type-check dispatch); this
module gives the Spark suite a real decoder for the ``gif`` tag, like
``jpeg.py`` does for ``jpeg``/``pjpeg``.

Scope (everything in the public spec that appears in real files):

- logical screen descriptor + global/local color tables;
- LZW decompression with variable code width (3..12 bits), CLEAR/EOI
  handling anywhere in the stream, deferred-clear tolerant;
- interlaced images (the 4-pass row shuffle, §appendix E);
- GIF89a graphic-control extensions: transparency + frame delay +
  disposal methods 0/1 (leave), 2 (restore background), 3 (restore
  previous) — full multi-frame animation compositing;
- application/comment/plain-text extensions skipped per the
  block-terminator grammar.

Encoder contract: GIF is a palette format — ``encode_gif`` requires
the input to carry at most 256 distinct colors and is then LOSSLESS
(palette built from the image's own colors). Callers with truecolor
input posterize first (``posterize_rgb332`` guarantees ≤ 256 colors);
this mirrors reality, where a crawled GIF *is* palette-limited at the
origin. ``encode_gif_animation`` writes a multi-frame GIF89a with
per-frame delays for the frame-sampling operator tests.

Every malformed-payload path raises :class:`~.codecs.DecodeError`
(fuzz-gated in tests/test_codec_fuzz.py); interop is pinned both
directions against the JVM's independent ``javax.imageio`` GIF codec
in tests/test_gif.py, like the JPEG codec.
"""

from __future__ import annotations

import struct

import numpy as np

from .codecs import DecodeError

_LSD = struct.Struct("<HHBBB")   # logical screen descriptor after magic
_IMG = struct.Struct("<HHHHB")   # image descriptor after 0x2C

#: max LZW code width (spec §22) and table size
_MAX_WIDTH = 12
_MAX_CODES = 1 << _MAX_WIDTH

#: interlace passes: (row offset, row step) — spec appendix E
_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def posterize_rgb332(arr: np.ndarray) -> np.ndarray:
    """Quantize (h, w, 3) uint8 to the 3-3-2-bit RGB lattice (bucket
    midpoints), guaranteeing ≤ 256 distinct colors — the deterministic
    palette-limiting step shared by the synthetic generator (encode
    side) and the validation kernel (expected-pixels side)."""
    a = np.asarray(arr, dtype=np.uint8)
    out = np.empty_like(a)
    out[..., 0] = (a[..., 0] & 0xE0) | 0x10   # 3 bits + midpoint
    out[..., 1] = (a[..., 1] & 0xE0) | 0x10   # 3 bits + midpoint
    out[..., 2] = (a[..., 2] & 0xC0) | 0x20   # 2 bits + midpoint
    return out


# --- LZW ----------------------------------------------------------------------


def _lzw_decode(min_code_size: int, data: bytes, npix: int) -> bytes:
    """GIF-variant LZW: variable width starting at min+1, CLEAR resets
    the table, EOI ends the stream; output clipped to ``npix`` pixels
    (a malformed stream may over- or under-run)."""
    if not 2 <= min_code_size <= 8:   # ≤ 256 palette entries (spec §22)
        raise DecodeError(f"gif: bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]

    table = list(base)
    width = min_code_size + 1
    prev: bytes | None = None
    out: list[bytes] = []
    total = 0

    acc = 0
    accbits = 0
    i = 0
    n = len(data)
    while True:
        while accbits < width:
            if i >= n:
                # stream ran out before EOI: tolerate (many writers
                # omit EOI); the caller checks pixel count
                return b"".join(out)
            acc |= data[i] << accbits
            accbits += 8
            i += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        accbits -= width

        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return b"".join(out)
        if prev is None:
            if code >= len(table):
                raise DecodeError("gif: first LZW code out of range")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < _MAX_CODES:
                table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            if len(table) < _MAX_CODES:
                table.append(entry)
        else:
            raise DecodeError("gif: LZW code out of range")
        out.append(entry)
        total += len(entry)
        if total >= npix:
            return b"".join(out)
        if len(table) == (1 << width) and width < _MAX_WIDTH:
            width += 1
        prev = entry


def _lzw_encode(min_code_size: int, indices: bytes) -> bytes:
    """Inverse of :func:`_lzw_decode`; emits CLEAR first (per spec) and
    stops growing the table at 4096 (no mid-stream reset needed at the
    frame sizes this engine synthesizes; decoders handle both)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    accbits = 0
    width = min_code_size + 1

    def emit(code: int) -> None:
        nonlocal acc, accbits
        acc |= code << accbits
        accbits += width
        while accbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            accbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear)
    w = b""
    for b in indices:
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        emit(table[w])
        if next_code < _MAX_CODES:
            table[wk] = next_code
            next_code += 1
            # one step LATER than the table size crossing 2^width: the
            # decoder defines each entry one code behind the encoder,
            # so its width bump (at len(table) == 2^width) lands here
            if next_code == (1 << width) + 1 and width < _MAX_WIDTH:
                width += 1
        w = bytes([b])
    if w:
        emit(table[w])
    emit(eoi)
    if accbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _sub_blocks(payload: bytes) -> bytes:
    """Package ``payload`` into ≤255-byte length-prefixed sub-blocks
    plus the 0x00 terminator."""
    out = bytearray()
    for i in range(0, len(payload), 255):
        chunk = payload[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


# --- container parse ----------------------------------------------------------


def _read_sub_blocks(data: bytes, i: int) -> tuple[bytes, int]:
    out = bytearray()
    n = len(data)
    while True:
        if i >= n:
            raise DecodeError("gif: truncated sub-blocks")
        size = data[i]
        i += 1
        if size == 0:
            return bytes(out), i
        if i + size > n:
            raise DecodeError("gif: truncated sub-block body")
        out += data[i : i + size]
        i += size


def _skip_sub_blocks(data: bytes, i: int) -> int:
    n = len(data)
    while True:
        if i >= n:
            raise DecodeError("gif: truncated sub-blocks")
        size = data[i]
        i += 1
        if size == 0:
            return i
        i += size
        if i > n:
            raise DecodeError("gif: truncated sub-block body")


def _color_table(data: bytes, i: int, packed_size: int) -> tuple[np.ndarray, int]:
    n_colors = 2 << packed_size
    end = i + 3 * n_colors
    if end > len(data):
        raise DecodeError("gif: truncated color table")
    ct = np.frombuffer(data[i:end], dtype=np.uint8).reshape(n_colors, 3)
    return ct, end


class _Frame:
    __slots__ = ("left", "top", "w", "h", "interlace", "ct", "lzw_min",
                 "pixels", "transparent", "delay_cs", "disposal")

    def __init__(self) -> None:
        self.transparent = -1
        self.delay_cs = 0
        self.disposal = 0


def _parse(data: bytes, *, need_pixels: bool, max_frames: int | None = None):
    """Walk the block grammar; returns (screen_w, screen_h, bg_rgb,
    frames). With ``need_pixels=False`` LZW data is skipped (cheap
    probe)."""
    if len(data) < 13 or data[:6] not in (b"GIF87a", b"GIF89a"):
        raise DecodeError("gif: bad signature")
    sw, sh, packed, bg_idx, _aspect = _LSD.unpack_from(data, 6)
    if sw < 1 or sh < 1:
        raise DecodeError(f"gif: bad screen dimensions {sw}x{sh}")
    i = 13
    gct = None
    if packed & 0x80:
        gct, i = _color_table(data, i, packed & 0x07)
    bg_rgb = (
        gct[bg_idx] if gct is not None and bg_idx < len(gct)
        else np.zeros(3, np.uint8)
    )

    frames: list[_Frame] = []
    pending = _Frame()
    n = len(data)
    while True:
        if i >= n:
            raise DecodeError("gif: missing trailer")
        block = data[i]
        i += 1
        if block == 0x3B:       # trailer
            break
        if block == 0x21:       # extension
            if i >= n:
                raise DecodeError("gif: truncated extension")
            label = data[i]
            i += 1
            if label == 0xF9:   # graphic control
                body, i = _read_sub_blocks(data, i)
                if len(body) >= 4:
                    flags = body[0]
                    pending.disposal = (flags >> 2) & 0x07
                    pending.delay_cs = struct.unpack_from("<H", body, 1)[0]
                    if flags & 0x01:
                        pending.transparent = body[3]
            else:               # application/comment/plain-text: skip
                i = _skip_sub_blocks(data, i)
            continue
        if block == 0x2C:       # image descriptor
            if i + _IMG.size > n:
                raise DecodeError("gif: truncated image descriptor")
            left, top, fw, fh, ipacked = _IMG.unpack_from(data, i)
            i += _IMG.size
            if fw < 1 or fh < 1:
                raise DecodeError(f"gif: bad frame dimensions {fw}x{fh}")
            f = pending
            pending = _Frame()
            f.left, f.top, f.w, f.h = left, top, fw, fh
            f.interlace = bool(ipacked & 0x40)
            if ipacked & 0x80:
                f.ct, i = _color_table(data, i, ipacked & 0x07)
            else:
                if gct is None:
                    raise DecodeError("gif: frame without any color table")
                f.ct = gct
            if i >= n:
                raise DecodeError("gif: truncated LZW header")
            f.lzw_min = data[i]
            i += 1
            if need_pixels:
                lzw, i = _read_sub_blocks(data, i)
                npix = fw * fh
                idx = _lzw_decode(f.lzw_min, lzw, npix)
                if len(idx) < npix:
                    raise DecodeError(
                        f"gif: LZW underrun {len(idx)} < {npix} pixels"
                    )
                a = np.frombuffer(idx[:npix], dtype=np.uint8)
                if a.max(initial=0) >= len(f.ct):
                    raise DecodeError("gif: pixel index beyond color table")
                if f.interlace:
                    rows = a.reshape(fh, fw)
                    out_rows = np.empty_like(rows)
                    src = 0
                    for off, step in _INTERLACE:
                        cnt = len(range(off, fh, step))
                        out_rows[off::step] = rows[src : src + cnt]
                        src += cnt
                    a = out_rows.reshape(-1)
                f.pixels = a
            else:
                f.pixels = None
                i = _skip_sub_blocks(data, i)
            frames.append(f)
            if max_frames is not None and len(frames) >= max_frames:
                break
            continue
        raise DecodeError(f"gif: unknown block 0x{block:02x}")

    if not frames:
        raise DecodeError("gif: no image data")
    return sw, sh, bg_rgb, frames


# --- public API ---------------------------------------------------------------


def probe_gif(data: bytes) -> dict:
    """Cheap metadata probe: no LZW work, sub-blocks skipped by their
    length prefixes (O(blocks), not O(pixels))."""
    sw, sh, _bg, frames = _parse(bytes(data), need_pixels=False)
    return {
        "w": sw,
        "h": sh,
        "n_frames": len(frames),
        "animated": len(frames) > 1,
        "duration_cs": sum(f.delay_cs for f in frames),
        "version": bytes(data[:6]).decode("ascii"),
    }


def _composite(canvas: np.ndarray, f: _Frame) -> None:
    rect = canvas[f.top : f.top + f.h, f.left : f.left + f.w]
    if rect.shape[:2] != (f.h, f.w):
        raise DecodeError("gif: frame rect outside logical screen")
    rgb = f.ct[f.pixels].reshape(f.h, f.w, 3)
    if f.transparent >= 0:
        mask = (f.pixels.reshape(f.h, f.w) != f.transparent)[..., None]
        np.copyto(rect, rgb, where=mask)
    else:
        rect[...] = rgb


def gif_frames(data: bytes, max_frames: int | None = None):
    """Decode and composite all frames (disposal 0/1 leave, 2 restore
    background, 3 restore previous). Returns a list of
    ``(pixels (h, w, 3) uint8, delay_cs)`` on the logical screen."""
    sw, sh, bg_rgb, frames = _parse(
        bytes(data), need_pixels=True, max_frames=max_frames
    )
    canvas = np.zeros((sh, sw, 3), np.uint8)
    canvas[...] = bg_rgb
    out = []
    for f in frames:
        before = canvas.copy() if f.disposal == 3 else None
        _composite(canvas, f)
        out.append((canvas.copy(), f.delay_cs))
        if f.disposal == 2:
            canvas[f.top : f.top + f.h, f.left : f.left + f.w] = bg_rgb
        elif f.disposal == 3:
            canvas = before
    return out


def decode_gif(data: bytes) -> np.ndarray:
    """First-frame still decode → (h, w, 3) uint8 on the logical
    screen (transparent pixels show the background color)."""
    return gif_frames(data, max_frames=1)[0][0]


def _palette_indices(arr: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(palette (n≤256, 3) uint8, indices flat uint8) via a single
    vectorized unique over packed 24-bit colors."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError("encode_gif expects (h, w, 3) uint8")
    packed = (
        a[..., 0].astype(np.uint32) << 16
    ) | (a[..., 1].astype(np.uint32) << 8) | a[..., 2].astype(np.uint32)
    colors, inv = np.unique(packed.reshape(-1), return_inverse=True)
    if len(colors) > 256:
        raise ValueError(
            f"encode_gif: {len(colors)} distinct colors > 256 — "
            "posterize first (posterize_rgb332)"
        )
    pal = np.empty((len(colors), 3), np.uint8)
    pal[:, 0] = (colors >> 16) & 0xFF
    pal[:, 1] = (colors >> 8) & 0xFF
    pal[:, 2] = colors & 0xFF
    return pal, inv.astype(np.uint8)


def _gct_bytes(pal: np.ndarray) -> tuple[bytes, int]:
    """Pad the palette to a power-of-two size ≥ 2; returns (raw bytes,
    packed-field size code)."""
    size_code = max(1, int(np.ceil(np.log2(max(len(pal), 2)))))
    padded = np.zeros((2 << (size_code - 1), 3), np.uint8)
    padded[: len(pal)] = pal
    return padded.tobytes(), size_code - 1


def encode_gif(arr: np.ndarray, interlace: bool = False) -> bytes:
    """Single-frame GIF89a; lossless for ≤ 256-color input."""
    pal, idx = _palette_indices(arr)
    h, w = arr.shape[:2]
    gct, size_code = _gct_bytes(pal)
    lzw_min = max(2, size_code + 1)
    if interlace:
        rows = idx.reshape(h, w)
        idx = np.concatenate(
            [rows[off::step] for off, step in _INTERLACE]
        ).reshape(-1)
    return b"".join([
        b"GIF89a",
        _LSD.pack(w, h, 0x80 | (size_code << 4) | size_code, 0, 0),
        gct,
        b"\x2c", _IMG.pack(0, 0, w, h, 0x40 if interlace else 0),
        bytes([lzw_min]),
        _sub_blocks(_lzw_encode(lzw_min, idx.tobytes())),
        b"\x3b",
    ])


def encode_gif_animation(
    frames: "np.ndarray | list[np.ndarray]",
    delay_cs: int = 4,
    loop: int = 0,
) -> bytes:
    """Multi-frame GIF89a (full-frame replace, disposal 1) with a
    NETSCAPE2.0 loop block; every frame shares one global palette, so
    the union of frame colors must stay ≤ 256 (posterize first)."""
    stack = np.asarray(frames, dtype=np.uint8)
    if stack.ndim != 4 or stack.shape[3] != 3:
        raise ValueError("encode_gif_animation expects (n, h, w, 3) uint8")
    n, h, w, _ = stack.shape
    pal, idx = _palette_indices(stack.reshape(n * h, w, 3))
    idx = idx.reshape(n, h * w)
    gct, size_code = _gct_bytes(pal)
    lzw_min = max(2, size_code + 1)
    parts = [
        b"GIF89a",
        _LSD.pack(w, h, 0x80 | (size_code << 4) | size_code, 0, 0),
        gct,
        # NETSCAPE2.0 application extension: animation loop count
        b"\x21\xff\x0bNETSCAPE2.0\x03\x01" + struct.pack("<H", loop) + b"\x00",
    ]
    for k in range(n):
        parts += [
            b"\x21\xf9", _sub_blocks(struct.pack("<BHB", 0x04, delay_cs, 0)),
            b"\x2c", _IMG.pack(0, 0, w, h, 0),
            bytes([lzw_min]),
            _sub_blocks(_lzw_encode(lzw_min, idx[k].tobytes())),
        ]
    parts.append(b"\x3b")
    return b"".join(parts)
