"""Baseline JPEG (ITU-T T.81 / JFIF) codec in pure numpy + stdlib —
no Pillow/libjpeg in this container, so the real-world interchange
format is implemented from the public spec instead of stubbed.

Scope (the baseline-sequential profile that covers the vast majority
of real-world JPEGs):

* **decode**: SOI/APPn/COM/DQT (8- and 16-bit tables)/SOF0/DHT/DRI/
  SOS/RSTn/EOI marker stream; Huffman-coded 8×8 DCT blocks; any
  component count with sampling factors h,v ∈ {1,2} (4:4:4, 4:2:2,
  4:2:0 and grayscale); restart-interval resync; byte unstuffing;
  nearest-neighbor chroma upsample; JFIF YCbCr→RGB. Progressive
  (SOF2), arithmetic coding, and 12-bit precision raise
  :class:`DecodeError` ("unsupported"), never a crash.
* **encode**: quality-scaled Annex-K quantization tables, standard
  Annex-K Huffman tables, 4:4:4 or 4:2:0, grayscale or color,
  optional restart intervals — emits streams any external JPEG
  decoder opens (markers, stuffing, and entropy coding follow the
  spec exactly; the standard tables remove the need for a
  per-image Huffman optimization pass).

Both sides share the exact orthonormal DCT-II matrix (``_DCT8 @ block
@ _DCT8.T``), so ``idct(dct(x)) == x`` to float precision and the
only loss is quantization — which is what the PSNR≥40dB contract of
the image suite measures.

Spec references: ITU-T T.81 §B (syntax), §F.2 (decode procedures
DECODE/RECEIVE/EXTEND), Annex K (tables) — all public.
"""

from __future__ import annotations

import struct

import numpy as np

from .codecs import DecodeError

# --- shared constants (ITU T.81 Annex K — public standard tables) -----------

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)
UNZIGZAG = np.argsort(ZIGZAG)

QTBL_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64)
QTBL_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.float64)

# standard Huffman tables (T.81 K.3): (BITS counts per code length 1..16, HUFFVAL)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

_k = np.arange(8)
_DCT8 = np.cos((2 * _k[None, :] + 1) * _k[:, None] * np.pi / 16) * np.where(
    _k[:, None] == 0, np.sqrt(1 / 8), np.sqrt(2 / 8)
)


def _dct2(b: np.ndarray) -> np.ndarray:
    return _DCT8 @ b @ _DCT8.T


def _idct2(B: np.ndarray) -> np.ndarray:
    return _DCT8.T @ B @ _DCT8


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    q = min(max(int(quality), 1), 100)
    scale = 5000 / q if q < 50 else 200 - 2 * q
    out = []
    for base in (QTBL_LUMA, QTBL_CHROMA):
        t = np.floor((base * scale + 50) / 100)
        out.append(np.clip(t, 1, 255))
    return out[0], out[1]


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """val → (code, length) from a T.81 BITS/HUFFVAL spec (C.2)."""
    codes, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


# --- encoder -----------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
        self.acc &= (1 << self.nbits) - 1

    def pad_to_byte(self) -> None:
        if self.nbits:
            self.write(0x7F, 8 - self.nbits)  # 1-fill per spec


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _encode_block(
    w: _BitWriter, coefs: np.ndarray, pred: int,
    dc_codes: dict, ac_codes: dict,
) -> int:
    """Huffman-encode one zigzagged 64-coef int block; returns new DC pred."""
    dc = int(coefs[0])
    diff = dc - pred
    s = _category(diff)
    code, ln = dc_codes[s]
    w.write(code, ln)
    if s:
        w.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = int(np.max(np.nonzero(coefs)[0])) if np.any(coefs[1:]) else 0
    for i in range(1, 64):
        v = int(coefs[i])
        if i > last_nz:
            code, ln = ac_codes[0x00]  # EOB
            w.write(code, ln)
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            w.write(code, ln)
            run -= 16
        s = _category(v)
        code, ln = ac_codes[(run << 4) | s]
        w.write(code, ln)
        w.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    return dc


def _component_blocks(plane: np.ndarray, qtbl: np.ndarray) -> np.ndarray:
    """Pad plane (edge-replicate) to 8-multiples, DCT+quantize every
    block; returns (by, bx, 64) int32 zigzagged coefficients."""
    h, w = plane.shape
    H, W = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(plane, ((0, H - h), (0, W - w)), mode="edge").astype(np.float64) - 128.0
    by, bx = H // 8, W // 8
    blocks = padded.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3)
    # vectorized DCT over all blocks at once: (by,bx,8,8) @ matrices
    coefs = np.einsum("ij,abjk,lk->abil", _DCT8, blocks, _DCT8)
    q = np.round(coefs / qtbl.reshape(8, 8)).astype(np.int32)
    return q.reshape(by, bx, 64)[:, :, ZIGZAG]


def encode_jpeg(
    arr: np.ndarray, *, quality: int = 85, subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """(h, w, 3) or (h, w) uint8 → baseline JFIF bytes.

    ``subsampling``: "444" (no chroma subsampling) or "420" (2×2 chroma
    average — the common camera default)."""
    arr = np.asarray(arr, dtype=np.uint8)
    gray = arr.ndim == 2
    if not gray and (arr.ndim != 3 or arr.shape[2] != 3):
        raise ValueError("encode_jpeg expects (h, w, 3) or (h, w) uint8")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    h, w = arr.shape[:2]
    if h < 1 or w < 1 or h > 65535 or w > 65535:
        raise ValueError("bad dimensions")
    ql, qc = _quality_tables(quality)

    if gray:
        planes = [arr.astype(np.float64)]
        samp = [(1, 1)]
    else:
        rgb = arr.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsampling == "420":
            H2, W2 = -(-h // 2) * 2, -(-w // 2) * 2
            cbp = np.pad(cb, ((0, H2 - h), (0, W2 - w)), mode="edge")
            crp = np.pad(cr, ((0, H2 - h), (0, W2 - w)), mode="edge")
            cb = cbp.reshape(H2 // 2, 2, W2 // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(H2 // 2, 2, W2 // 2, 2).mean(axis=(1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]

    qtbls = [ql] + ([qc] if not gray else [])
    comp_q = [0] + [1] * (len(planes) - 1)
    coef_grids = [
        _component_blocks(p.clip(0, 255), qtbls[comp_q[ci]])
        for ci, p in enumerate(planes)
    ]

    dc_tbls = [_canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)]
    ac_tbls = [_canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)]
    if not gray:
        dc_tbls.append(_canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS))
        ac_tbls.append(_canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS))

    # ---- headers ----
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, tbl in enumerate(qtbls):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid) + bytes(
            int(tbl[z]) for z in ZIGZAG
        )
    ncomp = len(planes)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for ci in range(ncomp):
        hs, vs = samp[ci]
        out += bytes([ci + 1, (hs << 4) | vs, comp_q[ci]])
    specs = [(0x00, DC_LUMA_BITS, DC_LUMA_VALS), (0x10, AC_LUMA_BITS, AC_LUMA_VALS)]
    if not gray:
        specs += [(0x01, DC_CHROMA_BITS, DC_CHROMA_VALS), (0x11, AC_CHROMA_BITS, AC_CHROMA_VALS)]
    for tc_id, bits, vals in specs:
        out += b"\xff\xc4" + struct.pack(">HB", 3 + 16 + len(vals), tc_id)
        out += bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for ci in range(ncomp):
        ti = 0 if ci == 0 else 1
        out += bytes([ci + 1, (ti << 4) | ti])
    out += b"\x00\x3f\x00"  # Ss=0 Se=63 Ah/Al=0

    # ---- entropy-coded scan (interleaved MCUs) ----
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcx, mcy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    bw = _BitWriter()
    preds = [0] * ncomp
    mcu_no = 0
    rst = 0
    for my in range(mcy):
        for mx in range(mcx):
            if restart_interval and mcu_no and mcu_no % restart_interval == 0:
                bw.pad_to_byte()
                out += bytes(bw.out)
                bw = _BitWriter()
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                preds = [0] * ncomp
            for ci in range(ncomp):
                hs, vs = samp[ci]
                grid = coef_grids[ci]
                ti = 0 if ci == 0 else 1
                for by_ in range(vs):
                    for bx_ in range(hs):
                        r_ = my * vs + by_
                        c_ = mx * hs + bx_
                        r_ = min(r_, grid.shape[0] - 1)
                        c_ = min(c_, grid.shape[1] - 1)
                        preds[ci] = _encode_block(
                            bw, grid[r_, c_], preds[ci], dc_tbls[ti], ac_tbls[ti]
                        )
            mcu_no += 1
    bw.pad_to_byte()
    out += bytes(bw.out)
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- decoder -----------------------------------------------------------------


class _HuffTable:
    """T.81 F.2.2.3 DECODE structures: mincode/maxcode/valptr per length."""

    def __init__(self, bits: list[int], vals: list[int]):
        self.vals = vals
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code, k = 0, 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.valptr[length] = k
                self.mincode[length] = code
                code += bits[length - 1]
                k += bits[length - 1]
                self.maxcode[length] = code - 1
            code <<= 1
        self.nvals = k


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise DecodeError("jpeg: entropy stream exhausted")
            self.acc = self.data[self.pos]
            self.pos += 1
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align(self) -> None:
        self.nbits = 0


def _decode_symbol(br: _BitReader, tbl: _HuffTable) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        if tbl.maxcode[length] >= 0 and code <= tbl.maxcode[length]:
            idx = tbl.valptr[length] + code - tbl.mincode[length]
            if idx >= len(tbl.vals):
                raise DecodeError("jpeg: huffman index out of range")
            return tbl.vals[idx]
    raise DecodeError("jpeg: invalid huffman code")


def _extend(v: int, s: int) -> int:
    return v - (1 << s) + 1 if v < (1 << (s - 1)) else v


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes → (h, w, 3) uint8 RGB (grayscale replicated
    to 3 channels, matching the repo's image contract)."""
    if len(data) < 4 or data[0] != 0xFF or data[1] != 0xD8:
        raise DecodeError("jpeg: missing SOI")
    pos = 2
    qtbls: dict[int, np.ndarray] = {}
    hufftbls: dict[tuple[int, int], _HuffTable] = {}
    frame = None
    restart_interval = 0

    def u16(p):
        if p + 2 > len(data):
            raise DecodeError("jpeg: truncated")
        return (data[p] << 8) | data[p + 1]

    while True:
        if pos + 2 > len(data):
            raise DecodeError("jpeg: ran off end before SOS/EOI")
        if data[pos] != 0xFF:
            raise DecodeError(f"jpeg: expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI before scan
            raise DecodeError("jpeg: EOI before SOS")
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        size = u16(pos)
        seg = data[pos + 2 : pos + size]
        if len(seg) < size - 2:
            raise DecodeError("jpeg: truncated segment")
        if marker == 0xDB:  # DQT
            sp = 0
            while sp < len(seg):
                pq, tq = seg[sp] >> 4, seg[sp] & 0xF
                sp += 1
                n = 64 * (2 if pq == 1 else 1)
                if sp + n > len(seg):
                    raise DecodeError("jpeg: short DQT")
                if pq == 1:
                    vals = np.frombuffer(seg[sp : sp + n], dtype=">u2").astype(np.float64)
                else:
                    vals = np.frombuffer(seg[sp : sp + n], dtype=np.uint8).astype(np.float64)
                tbl = np.empty(64)
                tbl[ZIGZAG] = vals  # stored in zigzag order → natural
                qtbls[tq] = tbl
                sp += n
        elif marker == 0xC4:  # DHT
            sp = 0
            while sp < len(seg):
                tc, th = seg[sp] >> 4, seg[sp] & 0xF
                sp += 1
                if sp + 16 > len(seg):
                    raise DecodeError("jpeg: short DHT")
                bits = list(seg[sp : sp + 16])
                sp += 16
                n = sum(bits)
                if sp + n > len(seg):
                    raise DecodeError("jpeg: short DHT values")
                hufftbls[(tc, th)] = _HuffTable(bits, list(seg[sp : sp + n]))
                sp += n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline/ext. seq.)
            prec, fh, fw, nc = seg[0], (seg[1] << 8) | seg[2], (seg[3] << 8) | seg[4], seg[5]
            if prec != 8:
                raise DecodeError(f"jpeg: unsupported precision {prec}")
            if fh < 1 or fw < 1 or nc < 1 or nc > 4:
                raise DecodeError("jpeg: bad frame header")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i], seg[7 + 3 * i], seg[8 + 3 * i]
                hs, vs = hv >> 4, hv & 0xF
                if hs not in (1, 2) or vs not in (1, 2):
                    raise DecodeError(f"jpeg: unsupported sampling {hs}x{vs}")
                comps.append({"id": cid, "h": hs, "v": vs, "tq": tq})
            frame = {"h": fh, "w": fw, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise DecodeError("jpeg: unsupported (non-baseline) SOF")
        elif marker == 0xDD:  # DRI
            restart_interval = (seg[0] << 8) | seg[1]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise DecodeError("jpeg: SOS before SOF")
            ns = seg[0]
            if ns != len(frame["comps"]):
                # a partial-component scan means a non-interleaved
                # multi-scan file: decoding only the first scan would
                # silently return a wrong image — refuse instead
                raise DecodeError(
                    "jpeg: unsupported non-interleaved multi-scan file "
                    f"(scan has {ns} of {len(frame['comps'])} components)"
                )
            scomps = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                match = [c for c in frame["comps"] if c["id"] == cs]
                if not match:
                    raise DecodeError("jpeg: scan references unknown component")
                scomps.append((match[0], tt >> 4, tt & 0xF))
            pos += size
            return _decode_scan(
                data, pos, frame, scomps, qtbls, hufftbls, restart_interval
            )
        # APPn / COM / anything else: skip
        pos += size


def _decode_scan(data, pos, frame, scomps, qtbls, hufftbls, restart_interval):
    # split entropy bytes from markers: unstuff FF00, stop at non-RST marker
    chunks = []
    i = pos
    n = len(data)
    while i < n:
        b = data[i]
        if b == 0xFF:
            if i + 1 >= n:
                break
            m = data[i + 1]
            if m == 0x00:
                chunks.append(0xFF)
                i += 2
                continue
            if 0xD0 <= m <= 0xD7:  # RST — keep as sentinel (-1, rst#)
                chunks.append(-1 - (m - 0xD0))
                i += 2
                continue
            break  # EOI or next segment
        chunks.append(b)
        i += 1

    fh, fw = frame["h"], frame["w"]
    comps = [sc[0] for sc in scomps]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcx, mcy = -(-fw // (8 * hmax)), -(-fh // (8 * vmax))

    planes = []
    for c in comps:
        pw, ph = mcx * c["h"] * 8, mcy * c["v"] * 8
        planes.append(np.zeros((ph, pw), dtype=np.float64))
        if c["tq"] not in qtbls:
            raise DecodeError("jpeg: missing quant table")

    # stream segments split at RST sentinels
    segs: list[list[int]] = [[]]
    for b in chunks:
        if b < 0:
            segs.append([])
        else:
            segs[-1].append(b)
    seg_idx = 0
    br = _BitReader(bytes(segs[0]))
    preds = {id(c): 0 for c in comps}
    mcu_no = 0

    for my in range(mcy):
        for mx in range(mcx):
            if restart_interval and mcu_no and mcu_no % restart_interval == 0:
                seg_idx += 1
                if seg_idx >= len(segs):
                    raise DecodeError("jpeg: missing restart segment")
                br = _BitReader(bytes(segs[seg_idx]))
                preds = {id(c): 0 for c in comps}
            for (c, td, ta) in scomps:
                dc_t = hufftbls.get((0, td))
                ac_t = hufftbls.get((1, ta))
                if dc_t is None or ac_t is None:
                    raise DecodeError("jpeg: missing huffman table")
                qtbl = qtbls[c["tq"]]
                for by_ in range(c["v"]):
                    for bx_ in range(c["h"]):
                        coefs = np.zeros(64)
                        s = _decode_symbol(br, dc_t)
                        if s > 11:
                            raise DecodeError("jpeg: bad DC category")
                        diff = _extend(br.read_bits(s), s) if s else 0
                        preds[id(c)] += diff
                        coefs[0] = preds[id(c)]
                        k = 1
                        while k < 64:
                            rs = _decode_symbol(br, ac_t)
                            r_, s_ = rs >> 4, rs & 0xF
                            if s_ == 0:
                                if r_ == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r_
                            if k > 63:
                                raise DecodeError("jpeg: AC index overflow")
                            coefs[k] = _extend(br.read_bits(s_), s_)
                            k += 1
                        block = np.empty(64)
                        block[ZIGZAG] = coefs  # de-zigzag to natural order
                        px = _idct2((block * qtbl).reshape(8, 8)) + 128.0
                        y0 = (my * c["v"] + by_) * 8
                        x0 = (mx * c["h"] + bx_) * 8
                        planes[comps.index(c)][y0 : y0 + 8, x0 : x0 + 8] = px
            mcu_no += 1

    # upsample to full resolution, crop, color-convert
    full = []
    for c, plane in zip(comps, planes):
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = plane.repeat(ry, axis=0).repeat(rx, axis=1)
        full.append(plane[:fh, :fw])
    if len(full) == 1:
        y = np.clip(full[0], 0, 255)
        return np.dstack([y, y, y]).astype(np.uint8)
    if len(full) != 3:
        raise DecodeError(f"jpeg: unsupported component count {len(full)}")
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.dstack([r, g, b]), 0, 255).round().astype(np.uint8)
