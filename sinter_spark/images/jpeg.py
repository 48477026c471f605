"""Baseline JPEG (ITU-T T.81 / JFIF) codec in pure numpy + stdlib —
no Pillow/libjpeg in this container, so the real-world interchange
format is implemented from the public spec instead of stubbed.

Scope (baseline-sequential AND progressive — together the profiles
that cover essentially all real-world JPEGs):

* **decode**: SOI/APPn/COM/DQT (8- and 16-bit tables)/SOF0/SOF1/SOF2/
  DHT/DRI/SOS/RSTn/EOI marker stream; Huffman-coded 8×8 DCT blocks;
  any component count with sampling factors h,v ∈ {1,2} (4:4:4,
  4:2:2, 4:2:0 and grayscale); interleaved and non-interleaved
  multi-scan files; PROGRESSIVE (SOF2) spectral-selection +
  successive-approximation scans (T.81 §G.1.2 — DC first/refine, AC
  first with EOB runs, AC refinement correction bits);
  restart-interval resync; byte unstuffing; nearest-neighbor chroma
  upsample; JFIF YCbCr→RGB. Entropy decode is table-driven (16-bit
  peek → one Huffman LUT hit per symbol, §F.2.2 reformulated);
  dequant + IDCT run once over all blocks, vectorized. Arithmetic
  coding, lossless, and 12-bit precision raise :class:`DecodeError`
  ("unsupported"), never a crash.
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

from . import _jpegc
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


def _encode_block_dc(w: _BitWriter, coefs: np.ndarray, pred: int, dc_codes: dict) -> int:
    """DC coefficient only (progressive DC scan, T.81 §G.1.1)."""
    dc = int(coefs[0])
    diff = dc - pred
    s = _category(diff)
    code, ln = dc_codes[s]
    w.write(code, ln)
    if s:
        w.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    return dc


def _encode_block_ac(w: _BitWriter, coefs: np.ndarray, ac_codes: dict) -> None:
    """AC band 1..63 only (progressive spectral-selection AC scan)."""
    run = 0
    last_nz = int(np.max(np.nonzero(coefs)[0])) if np.any(coefs[1:]) else 0
    for i in range(1, 64):
        if i > last_nz:
            code, ln = ac_codes[0x00]  # EOB
            w.write(code, ln)
            break
        v = int(coefs[i])
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


def _encode_block_ac_refine(w: _BitWriter, coefs: np.ndarray, ac_codes: dict) -> None:
    """AC successive-approximation refinement for one block (T.81
    §G.1.2.3, the Al=0 pass against an Al=1 first pass): a correction
    bit (|v| & 1) for every coefficient already significant at the
    prior level (|v| ≥ 2), (run, 1)+sign placements for newly
    significant ±1 coefficients, with ZRLs emitted lazily at the next
    nonzero coefficient and buffered correction bits flushed after
    each emitted symbol — exactly the bit order the decoder's advance
    loop consumes. Per-block EOB (run of 1) carries the tail bits."""
    run = 0
    pending: list[int] = []
    for i in range(1, 64):
        v = int(coefs[i])
        a = -v if v < 0 else v
        if a == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            w.write(code, ln)
            run -= 16
            for b in pending:
                w.write(b, 1)
            pending = []
        if a > 1:  # significant at the prior level: one correction bit
            pending.append(a & 1)
            continue
        code, ln = ac_codes[(run << 4) | 1]  # newly significant ±1
        w.write(code, ln)
        w.write(1 if v > 0 else 0, 1)
        for b in pending:
            w.write(b, 1)
        pending = []
        run = 0
    if run or pending:
        code, ln = ac_codes[0x00]  # EOB (run of 1)
        w.write(code, ln)
        for b in pending:
            w.write(b, 1)


def _shift_toward_zero(coefs: np.ndarray) -> np.ndarray:
    """Al=1 point transform over (..., 64) zigzag blocks: AC magnitudes
    shift toward zero (T.81 §G.1.2.1 — NOT an arithmetic shift for
    negatives); the DC slot [..., 0] uses the arithmetic shift the DC
    path expects (decoder reconstructs pred<<1 | correction bit)."""
    out = np.where(coefs >= 0, coefs >> 1, -((-coefs) >> 1)).astype(coefs.dtype)
    out[..., 0] = coefs[..., 0] >> 1
    return out


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
    # vectorized DCT over all blocks at once: two batched (N,8,8)@(8,8)
    # matmuls (D @ B @ D.T) — BLAS-batched, ~20x faster than einsum here
    coefs = np.matmul(
        _DCT8, np.matmul(blocks.reshape(-1, 8, 8), _DCT8.T)
    ).reshape(by, bx, 8, 8)
    q = np.round(coefs / qtbl.reshape(8, 8)).astype(np.int32)
    return q.reshape(by, bx, 64)[:, :, ZIGZAG]


def encode_jpeg(
    arr: np.ndarray, *, quality: int = 85, subsampling: str = "444",
    restart_interval: int = 0, progressive: bool = False,
) -> bytes:
    """(h, w, 3) or (h, w) uint8 → JFIF bytes.

    ``subsampling``: "444" (no chroma subsampling) or "420" (2×2 chroma
    average — the common camera default). ``progressive=True`` emits a
    SOF2 stream with the canonical spectral-selection scan script (one
    interleaved DC scan, then one full AC band scan per component —
    T.81 §G.1.1; same quantized coefficients as baseline, so identical
    pixels after a full decode). Restart intervals are baseline-only."""
    if progressive and restart_interval:
        raise ValueError("progressive + restart_interval not supported")
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
    sof = b"\xff\xc2" if progressive else b"\xff\xc0"
    out += sof + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
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

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcx, mcy = -(-w // (8 * hmax)), -(-h // (8 * vmax))

    if progressive:
        # Successive-approximation scan script (v4 — the shape libjpeg
        # and javax emit, so the MEASURED pjpeg share exercises the
        # refinement decode path): DC first at Al=1, per-component AC
        # bands at Al=1, then DC refinement (1 bit/block) and
        # per-component AC refinement (T.81 §G.1.2). Coefficients
        # reconstruct exactly ((|v|>>1)<<1 + correction bit = v), so
        # pixels remain identical to baseline after a full decode.
        shifted = [_shift_toward_zero(g.reshape(-1, 64)).reshape(g.shape)
                   for g in coef_grids]

        def _dc_scan(al_first: bool) -> bytes:
            bw = _BitWriter()
            preds = [0] * ncomp
            for my in range(mcy):
                for mx in range(mcx):
                    for ci in range(ncomp):
                        hs, vs = samp[ci]
                        ti = 0 if ci == 0 else 1
                        grid = shifted[ci] if al_first else coef_grids[ci]
                        for by_ in range(vs):
                            for bx_ in range(hs):
                                r_ = min(my * vs + by_, grid.shape[0] - 1)
                                c_ = min(mx * hs + bx_, grid.shape[1] - 1)
                                if al_first:
                                    preds[ci] = _encode_block_dc(
                                        bw, grid[r_, c_], preds[ci], dc_tbls[ti]
                                    )
                                else:  # refinement: bit 0 of the true DC
                                    bw.write(int(grid[r_, c_][0]) & 1, 1)
            bw.pad_to_byte()
            return bytes(bw.out)

        # scan 1: interleaved DC first pass (Ss=0 Se=0 Ah=0 Al=1)
        out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
        for ci in range(ncomp):
            ti = 0 if ci == 0 else 1
            out += bytes([ci + 1, ti << 4])
        out += b"\x00\x00\x01"
        out += _dc_scan(al_first=True)
        # per-component AC first pass (Ss=1 Se=63 Ah=0 Al=1)
        for ci in range(ncomp):
            ti = 0 if ci == 0 else 1
            out += b"\xff\xda" + struct.pack(">HB", 8, 1)
            out += bytes([ci + 1, ti])
            out += b"\x01\x3f\x01"
            bw = _BitWriter()
            grid = shifted[ci]
            for r_ in range(grid.shape[0]):
                for c_ in range(grid.shape[1]):
                    _encode_block_ac(bw, grid[r_, c_], ac_tbls[ti])
            bw.pad_to_byte()
            out += bytes(bw.out)
        # interleaved DC refinement (Ss=0 Se=0 Ah=1 Al=0)
        out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
        for ci in range(ncomp):
            ti = 0 if ci == 0 else 1
            out += bytes([ci + 1, ti << 4])
        out += b"\x00\x00\x10"
        out += _dc_scan(al_first=False)
        # per-component AC refinement (Ss=1 Se=63 Ah=1 Al=0)
        for ci in range(ncomp):
            ti = 0 if ci == 0 else 1
            out += b"\xff\xda" + struct.pack(">HB", 8, 1)
            out += bytes([ci + 1, ti])
            out += b"\x01\x3f\x10"
            bw = _BitWriter()
            grid = coef_grids[ci]
            for r_ in range(grid.shape[0]):
                for c_ in range(grid.shape[1]):
                    _encode_block_ac_refine(bw, grid[r_, c_], ac_tbls[ti])
            bw.pad_to_byte()
            out += bytes(bw.out)
        out += b"\xff\xd9"  # EOI
        return bytes(out)

    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for ci in range(ncomp):
        ti = 0 if ci == 0 else 1
        out += bytes([ci + 1, (ti << 4) | ti])
    out += b"\x00\x3f\x00"  # Ss=0 Se=63 Ah/Al=0

    # ---- entropy-coded scan (interleaved MCUs) ----
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
                        r_ = min(my * vs + by_, grid.shape[0] - 1)
                        c_ = min(mx * hs + bx_, grid.shape[1] - 1)
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
    """Table-driven Huffman decode: a 2^16-entry lookup keyed by the
    next 16 bits of the stream (T.81 §F.2.2 DECODE reformulated as the
    standard one-table-hit-per-symbol peek — JPEG codes are ≤ 16 bits,
    so every code is a prefix of some 16-bit window). Entry layout:
    ``(symbol << 5) | code_length``; ``-1`` marks bit patterns that are
    no code's prefix-completion (incomplete canonical code space).

    This replaces the per-bit DECODE loop (1-16 ``read_bit`` calls per
    symbol) with one list index — the entropy decode is the per-payload
    hot loop, and this is the piece that makes it ~10× faster."""

    def __init__(self, bits: list[int], vals: list[int]):
        self.key = (bytes(bits), bytes(vals))  # stable identity for caches
        lut = np.full(65536, -1, dtype=np.int64)
        code, k = 0, 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                if k >= len(vals):
                    raise DecodeError("jpeg: DHT bits/values mismatch")
                if code >= (1 << length):
                    raise DecodeError("jpeg: invalid DHT (code overflow)")
                start = code << (16 - length)
                lut[start : start + (1 << (16 - length))] = (vals[k] << 5) | length
                code += 1
                k += 1
            code <<= 1
        self.lut = lut.tolist()  # Python-list scalar indexing beats numpy
        # fused decode+receive LUT: when code_len + magnitude_bits fit
        # the same 16-bit window, one hit yields run, size, and TOTAL
        # bits to consume — the value bits are then sliced from the
        # window directly, skipping the second refill/shift sequence.
        # Layout: (r << 14) | (s << 10) | ((L + s) << 5) | L; -1 invalid.
        L = lut & 31
        sym = lut >> 5
        r, s = sym >> 4, sym & 15
        lut2 = np.where(lut < 0, -1, (r << 14) | (s << 10) | ((L + s) << 5) | L)
        self.lut2_np = np.ascontiguousarray(lut2, dtype=np.int64)  # C path
        self.lut2 = lut2.tolist()


#: LUT construction costs ~65k Python ints — memoized because real
#: corpora overwhelmingly reuse the Annex-K standard tables (and any
#: one encoder's optimized tables repeat across its images)
_HUFF_CACHE: dict[tuple[bytes, bytes], _HuffTable] = {}


def _huff_table(bits: list[int], vals: list[int]) -> _HuffTable:
    key = (bytes(bits), bytes(vals))
    t = _HUFF_CACHE.get(key)
    if t is None:
        if len(_HUFF_CACHE) >= 64:  # bound worker memory on adversarial input
            _HUFF_CACHE.clear()
        t = _HuffTable(bits, vals)
        _HUFF_CACHE[key] = t
    return t


class _BitReader:
    """MSB-first bit reader over UNSTUFFED entropy bytes.

    ``peek16`` zero-pads past the end (so the final symbols — whose
    codes may be shorter than 16 bits — still index the LUT); actually
    CONSUMING bits beyond the real data raises, preserving the
    truncated-stream containment contract."""

    __slots__ = ("data", "limit", "bitpos")

    def __init__(self, data: bytes):
        self.data = data + b"\x00\x00\x00\x00"
        self.limit = 8 * len(data)
        self.bitpos = 0

    def peek16(self) -> int:
        bp = self.bitpos
        b = bp >> 3
        chunk = int.from_bytes(self.data[b : b + 4], "big")
        return (chunk >> (16 - (bp & 7))) & 0xFFFF

    def consume(self, n: int) -> None:
        self.bitpos += n
        if self.bitpos > self.limit:
            raise DecodeError("jpeg: entropy stream exhausted")

    def read_bit(self) -> int:
        bp = self.bitpos
        if bp >= self.limit:
            raise DecodeError("jpeg: entropy stream exhausted")
        self.bitpos = bp + 1
        return (self.data[bp >> 3] >> (7 - (bp & 7))) & 1

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        bp = self.bitpos
        if bp + n > self.limit:
            raise DecodeError("jpeg: entropy stream exhausted")
        b = bp >> 3
        chunk = int.from_bytes(self.data[b : b + 4], "big")
        self.bitpos = bp + n
        return (chunk >> (32 - n - (bp & 7))) & ((1 << n) - 1)

    def decode(self, lut: list) -> int:
        """One Huffman symbol: 16-bit peek → LUT hit → consume. Fused
        into a single call — this runs several times per 8×8 block."""
        bp = self.bitpos
        b = bp >> 3
        chunk = int.from_bytes(self.data[b : b + 4], "big")
        entry = lut[(chunk >> (16 - (bp & 7))) & 0xFFFF]
        if entry < 0:
            raise DecodeError("jpeg: invalid huffman code")
        bp += entry & 31
        if bp > self.limit:
            raise DecodeError("jpeg: entropy stream exhausted")
        self.bitpos = bp
        return entry >> 5


def _decode_symbol(br: _BitReader, tbl: _HuffTable) -> int:
    return br.decode(tbl.lut)


def _extend(v: int, s: int) -> int:
    return v - (1 << s) + 1 if v < (1 << (s - 1)) else v


def _entropy_segments(data: bytes, pos: int) -> tuple[list[bytes], int]:
    """Split the entropy-coded bytes starting at ``pos`` into restart
    segments. Returns ``(segments, end_pos)`` where ``end_pos`` indexes
    the 0xFF of the terminating marker (or ``len(data)``). FF00
    unstuffing and RSTn splitting are vectorized (one numpy pass) —
    the old per-byte Python loop was itself a hot path on big scans."""
    arr = np.frombuffer(data, dtype=np.uint8)
    n = len(arr)
    if pos >= n:
        return [b""], n
    ffp = np.nonzero(arr[pos:] == 0xFF)[0] + pos
    ff = ffp[ffp + 1 < n]
    nxt = arr[ff + 1]
    term = (nxt != 0x00) & ((nxt < 0xD0) | (nxt > 0xD7))
    ti = np.nonzero(term)[0]
    if len(ti):
        stop = int(ff[ti[0]])
    elif len(ffp) and int(ffp[-1]) == n - 1:
        stop = int(ffp[-1])  # lone trailing FF: marker cut mid-stream
    else:
        stop = n
    seg = arr[pos:stop]
    ff2 = np.nonzero(seg == 0xFF)[0]
    ff2 = ff2[ff2 + 1 < len(seg)]
    if len(ff2) == 0:
        return [seg.tobytes()], stop
    nxt2 = seg[ff2 + 1]
    stuff = (ff2[nxt2 == 0x00] + 1).astype(np.int64)
    rst = ff2[(nxt2 >= 0xD0) & (nxt2 <= 0xD7)].astype(np.int64)
    if len(stuff) == 0 and len(rst) == 0:
        return [seg.tobytes()], stop
    delete = np.sort(np.concatenate([stuff, rst, rst + 1]))
    keep = np.ones(len(seg), dtype=bool)
    keep[delete] = False
    compact = seg[keep].tobytes()
    # each RST pair's compact-space successor starts a new segment
    segments, prev = [], 0
    for p in rst:
        b = int(p + 2 - np.searchsorted(delete, p + 2))
        segments.append(compact[prev:b])
        prev = b
    segments.append(compact[prev:])
    return segments, stop


def _block_ac_refine(br, ac_lut, coefs, ss, se, al, eobrun):
    """Successive-approximation AC refinement for one block
    (T.81 §G.1.2.3): appends one magnitude bit to every already-nonzero
    coefficient in the band and places newly-significant ±1·2^al
    coefficients. Returns the new EOB run."""
    p1, m1 = 1 << al, -(1 << al)
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = br.decode(ac_lut)
            r, s = rs >> 4, rs & 0xF
            newval = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.read_bits(r)
                    break
                # r == 15: ZRL — skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise DecodeError("jpeg: bad refinement magnitude")
                newval = p1 if br.read_bit() else m1
            # advance over r zero-history coefs, correcting nonzero ones
            while k <= se:
                if coefs[k] != 0:
                    if br.read_bit() and (coefs[k] & p1) == 0:
                        coefs[k] += p1 if coefs[k] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval and k <= se:
                coefs[k] = newval
            k += 1
    if eobrun > 0:
        while k <= se:  # EOB span: correction bits only
            if coefs[k] != 0:
                if br.read_bit() and (coefs[k] & p1) == 0:
                    coefs[k] += p1 if coefs[k] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def decode_jpeg(data: bytes) -> np.ndarray:
    """JFIF bytes → (h, w, 3) uint8 RGB (grayscale replicated to 3
    channels, matching the repo's image contract).

    Handles baseline/extended-sequential (SOF0/SOF1) AND progressive
    (SOF2) frames, interleaved or non-interleaved, multi-scan, with
    restart intervals. Coefficients accumulate per component across
    scans; dequant + IDCT run once at the end, vectorized over all
    blocks. Malformed input raises :class:`DecodeError`, never an
    uncaught exception."""
    if len(data) < 4 or data[0] != 0xFF or data[1] != 0xD8:
        raise DecodeError("jpeg: missing SOI")
    pos = 2
    qtbls: dict[int, np.ndarray] = {}
    hufftbls: dict[tuple[int, int], _HuffTable] = {}
    frame = None
    state = None  # per-component coefficient grids, allocated at first SOS
    restart_interval = 0
    scans_done = 0

    def u16(p):
        if p + 2 > len(data):
            raise DecodeError("jpeg: truncated")
        return (data[p] << 8) | data[p + 1]

    while True:
        if pos + 2 > len(data):
            if scans_done:
                break  # tolerate a missing EOI after a complete scan
            raise DecodeError("jpeg: ran off end before SOS/EOI")
        if data[pos] != 0xFF:
            raise DecodeError(f"jpeg: expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            if not scans_done:
                raise DecodeError("jpeg: EOI before SOS")
            break
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
                hufftbls[(tc, th)] = _huff_table(bits, list(seg[sp : sp + n]))
                sp += n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 (sequential), SOF2 (progressive)
            if frame is not None:
                raise DecodeError("jpeg: multiple SOF markers")
            if len(seg) < 6:
                raise DecodeError("jpeg: truncated SOF")
            prec, fh, fw, nc = seg[0], (seg[1] << 8) | seg[2], (seg[3] << 8) | seg[4], seg[5]
            if prec != 8:
                raise DecodeError(f"jpeg: unsupported precision {prec}")
            if fh < 1 or fw < 1 or nc < 1 or nc > 4:
                raise DecodeError("jpeg: bad frame header")
            if len(seg) < 6 + 3 * nc:
                raise DecodeError("jpeg: truncated SOF component list")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i], seg[7 + 3 * i], seg[8 + 3 * i]
                hs, vs = hv >> 4, hv & 0xF
                if hs not in (1, 2) or vs not in (1, 2):
                    raise DecodeError(f"jpeg: unsupported sampling {hs}x{vs}")
                comps.append({"id": cid, "h": hs, "v": vs, "tq": tq})
            frame = {
                "h": fh, "w": fw, "comps": comps,
                "progressive": marker == 0xC2,
            }
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise DecodeError("jpeg: unsupported (lossless/arithmetic) SOF")
        elif marker == 0xDD:  # DRI
            if len(seg) < 2:
                raise DecodeError("jpeg: truncated DRI")
            restart_interval = (seg[0] << 8) | seg[1]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise DecodeError("jpeg: SOS before SOF")
            if len(seg) < 1:
                raise DecodeError("jpeg: truncated SOS")
            ns = seg[0]
            if ns < 1 or ns > 4 or len(seg) < 1 + 2 * ns + 3:
                raise DecodeError("jpeg: truncated SOS header")
            scomps = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                match = [c for c in frame["comps"] if c["id"] == cs]
                if not match:
                    raise DecodeError("jpeg: scan references unknown component")
                scomps.append((match[0], tt >> 4, tt & 0xF))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0xF
            if ss > se or se > 63:
                raise DecodeError("jpeg: bad spectral range")
            if frame["progressive"]:
                if ss == 0 and se != 0:
                    raise DecodeError(
                        "jpeg: bad progressive scan header (DC scan needs Se=0)"
                    )
                if ss > 0 and ns != 1:
                    raise DecodeError(
                        "jpeg: progressive AC scan must be single-component"
                    )
            elif ah != 0 or al != 0 or ss != 0 or se != 63:
                raise DecodeError("jpeg: bad sequential scan header")
            need_dc = ss == 0 and ah == 0
            need_ac = se > 0
            for (_c, td, ta) in scomps:
                if need_dc and (0, td) not in hufftbls:
                    raise DecodeError("jpeg: missing huffman table")
                if need_ac and (1, ta) not in hufftbls:
                    raise DecodeError("jpeg: missing huffman table")
            if state is None:
                state = _alloc_state(frame)
            pos = _decode_scan_into(
                data, pos + size, frame, state, scomps, hufftbls,
                restart_interval, ss, se, ah, al,
            )
            scans_done += 1
            continue
        # APPn / COM / anything else: skip
        pos += size

    return _reconstruct(frame, state, qtbls)


def _alloc_state(frame: dict) -> dict:
    """Per-component coefficient grids, MCU-padded, ZIGZAG-index order.
    All components live in ONE contiguous (total_blocks, 64) int32
    array (``big``) so scan decode can bulk-scatter coefficients by
    flat block index; ``coef[i]`` are per-component (by, bx, 64) views
    sharing that memory. Also stamps each component's interleaved
    (MCU-grid) and non-interleaved (own-raster) block geometry
    (T.81 A.1.1/A.2)."""
    comps = frame["comps"]
    fh, fw = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcx, mcy = -(-fw // (8 * hmax)), -(-fh // (8 * vmax))
    total = 0
    for c in comps:
        cw = -(-(fw * c["h"]) // hmax)  # component sample dims
        ch = -(-(fh * c["v"]) // vmax)
        c["bw"], c["bh"] = -(-cw // 8), -(-ch // 8)  # non-interleaved grid
        c["bx_full"], c["by_full"] = mcx * c["h"], mcy * c["v"]
        c["goff"] = total  # flat block offset into the big store
        total += c["bx_full"] * c["by_full"]
    big = np.zeros((total, 64), dtype=np.int32)
    grids = []
    off = 0
    for c in comps:
        nb = c["bx_full"] * c["by_full"]
        grids.append(big[off : off + nb].reshape(c["by_full"], c["bx_full"], 64))
        off += nb
    return {"mcx": mcx, "mcy": mcy, "hmax": hmax, "vmax": vmax,
            "coef": grids, "big": big}


def _visit_plan(stab, state, interleaved, n_units):
    """Flat block-visit order for one scan, as parallel Python lists
    ``(si_list, g64_list)`` — built vectorized, consumed by the
    inlined entropy loop (no per-block numpy view creation). The flat
    block index comes pre-multiplied by 64 so the loop scatters
    ``g64 + k`` straight into the raveled coefficient store."""
    if interleaved:
        mcx, mcy = state["mcx"], state["mcy"]
        my, mx = np.divmod(np.arange(n_units), mcx)
        per_comp_g, per_comp_si = [], []
        for si, (c, _d, _a) in enumerate(stab):
            v, h, bxf = c["v"], c["h"], c["bx_full"]
            by_ = np.arange(v)
            bx_ = np.arange(h)
            g = (
                (my[:, None, None] * v + by_[None, :, None]) * bxf
                + (mx[:, None, None] * h + bx_[None, None, :])
                + c["goff"]
            ).reshape(n_units, v * h)
            per_comp_g.append(g)
            per_comp_si.append(np.full((n_units, v * h), si, dtype=np.int64))
        gidx = np.concatenate(per_comp_g, axis=1).reshape(-1)
        sis = np.concatenate(per_comp_si, axis=1).reshape(-1)
        bpm = gidx.shape[0] // n_units
        return (
            np.ascontiguousarray(sis, dtype=np.int32),
            np.ascontiguousarray(gidx * 64, dtype=np.int64),
            bpm,
        )
    c = stab[0][0]
    u = np.arange(n_units)
    g = c["goff"] + (u // c["bw"]) * c["bx_full"] + (u % c["bw"])
    return (
        np.zeros(n_units, dtype=np.int32),
        np.ascontiguousarray(g * 64, dtype=np.int64),
        1,
    )

def _decode_scan_into(
    data, pos, frame, state, scomps, hufftbls, restart_interval, ss, se, ah, al
) -> int:
    """Entropy-decode one scan into the component coefficient grids;
    returns the stream position of the terminating marker."""
    segments, newpos = _entropy_segments(data, pos)
    comps = frame["comps"]
    # presence already validated at the SOS site for the scan's needs
    stab = []
    for (c, td, ta) in scomps:
        stab.append((c, hufftbls.get((0, td)), hufftbls.get((1, ta))))
    interleaved = len(scomps) > 1
    mcx = state["mcx"]
    grid_of = {id(c): state["coef"][i] for i, c in enumerate(comps)}
    if interleaved:
        n_units = mcx * state["mcy"]
    else:
        c0 = scomps[0][0]
        n_units = c0["bw"] * c0["bh"]
    if ah == 0:
        _scan_first(segments, stab, state, restart_interval, ss, se, al,
                    interleaved, n_units)
    else:
        _scan_refine(segments, stab, state, grid_of, restart_interval, ss, se,
                     al, interleaved, mcx, n_units)
    return newpos


#: zero padding appended to each restart segment so the inlined decode
#: loop can over-read harmlessly between per-block exhaustion checks
#: (one block consumes < 64 symbols x 32 bits = 256 bytes of refills)
_SEG_PAD = b"\x00" * 512


def _scan_first(segments, stab, state, restart_interval, ss, se, al,
                interleaved, n_units):
    """First-pass scan decode (Ah=0): sequential scans and progressive
    first scans (T.81 §F.2.2 when ss=0/se=63/al=0; §G.1.2 otherwise).

    The entropy loop is the per-payload hot path, so it is shaped for
    the CPython interpreter: the bit reader is inlined local variables
    (MSB-first accumulator, 40-bit refills), each symbol is ONE fused
    Huffman-LUT hit that also yields the magnitude bits when they fit
    the same 16-bit window (§F.2.2 + RECEIVE fused), the block visit
    order is a precomputed flat plan (no per-block numpy view), and
    decoded coefficients accumulate in Python lists that bulk-scatter
    into the raveled coefficient store once per scan.

    Exhaustion contract: refills past the segment's real bytes read
    zero padding; a per-block check on consumed bits raises
    DecodeError before the next block, and the partial coefficients of
    the failing block are discarded with the whole decode."""
    lib = _jpegc.get_lib()
    if lib is not None:
        return _scan_first_c(
            lib, segments, stab, state, restart_interval, ss, se, al,
            interleaved, n_units,
        )
    sis_np, g64_np, bpm = _visit_plan(stab, state, interleaved, n_units)
    sis, g64s = sis_np.tolist(), g64_np.tolist()
    dc_luts = [t[1].lut2 if t[1] else None for t in stab]
    ac_luts = [t[2].lut2 if t[2] else None for t in stab]
    bigflat = state["big"].reshape(-1)
    rst_stride = restart_interval * bpm if restart_interval else 0
    seg = segments[0] + _SEG_PAD if segments else _SEG_PAD
    nreal = (len(seg) - 512) << 3
    seg_idx = 0
    pos = 0
    acc = 0
    nbits = 0
    preds = [0] * len(stab)
    eobrun = 0
    k0 = 1 if ss == 0 else ss
    gl: list = []  # g64 + zigzag position per decoded coefficient
    vl: list = []  # value
    ga, va = gl.append, vl.append
    dc = ss == 0
    i = 0
    for si, g64 in zip(sis, g64s):
        if rst_stride and i and i % rst_stride == 0:
            if (pos << 3) - nbits > nreal:
                raise DecodeError("jpeg: entropy stream exhausted")
            seg_idx += 1
            if seg_idx >= len(segments):
                raise DecodeError("jpeg: missing restart segment")
            seg = segments[seg_idx] + _SEG_PAD
            nreal = (len(seg) - 512) << 3
            pos = 0
            acc = 0
            nbits = 0
            preds = [0] * len(stab)
            eobrun = 0
        i += 1
        if dc:
            if nbits < 16:
                acc = (((acc & ((1 << nbits) - 1)) << 40)
                       | (seg[pos] << 32) | (seg[pos + 1] << 24)
                       | (seg[pos + 2] << 16) | (seg[pos + 3] << 8)
                       | seg[pos + 4])
                pos += 5
                nbits += 40
            w = (acc >> (nbits - 16)) & 0xFFFF
            e = dc_luts[si][w]
            if e < 0:
                raise DecodeError("jpeg: invalid huffman code")
            s = (e >> 10) & 15
            if s == 0:
                nbits -= e & 31
            else:
                if s > 11:
                    raise DecodeError("jpeg: bad DC category")
                lt = (e >> 5) & 31
                if lt <= 16:
                    nbits -= lt
                    v = (w >> (16 - lt)) & ((1 << s) - 1)
                else:  # rare: long code + wide magnitude spill the window
                    nbits -= e & 31
                    if nbits < s:
                        acc = (((acc & ((1 << nbits) - 1)) << 40)
                               | (seg[pos] << 32) | (seg[pos + 1] << 24)
                               | (seg[pos + 2] << 16) | (seg[pos + 3] << 8)
                               | seg[pos + 4])
                        pos += 5
                        nbits += 40
                    nbits -= s
                    v = (acc >> nbits) & ((1 << s) - 1)
                if v < (1 << (s - 1)):
                    v += 1 - (1 << s)
                preds[si] += v
            ga(g64)
            va(preds[si] << al)
        if k0 <= se:
            if eobrun:
                eobrun -= 1
            else:
                ac_lut = ac_luts[si]
                k = k0
                while k <= se:
                    if nbits < 16:
                        acc = (((acc & ((1 << nbits) - 1)) << 40)
                               | (seg[pos] << 32) | (seg[pos + 1] << 24)
                               | (seg[pos + 2] << 16) | (seg[pos + 3] << 8)
                               | seg[pos + 4])
                        pos += 5
                        nbits += 40
                    w = (acc >> (nbits - 16)) & 0xFFFF
                    e = ac_lut[w]
                    if e < 0:
                        raise DecodeError("jpeg: invalid huffman code")
                    s = (e >> 10) & 15
                    if s == 0:
                        nbits -= e & 31
                        r = e >> 14
                        if r == 15:  # ZRL
                            k += 16
                            continue
                        eobrun = (1 << r) - 1  # EOBn (r=0 => plain EOB)
                        if r:
                            if nbits < r:
                                acc = (((acc & ((1 << nbits) - 1)) << 40)
                                       | (seg[pos] << 32) | (seg[pos + 1] << 24)
                                       | (seg[pos + 2] << 16) | (seg[pos + 3] << 8)
                                       | seg[pos + 4])
                                pos += 5
                                nbits += 40
                            nbits -= r
                            eobrun += (acc >> nbits) & ((1 << r) - 1)
                        break
                    k += e >> 14
                    if k > se:
                        raise DecodeError("jpeg: AC index overflow")
                    lt = (e >> 5) & 31
                    if lt <= 16:
                        nbits -= lt
                        v = (w >> (16 - lt)) & ((1 << s) - 1)
                    else:
                        nbits -= e & 31
                        if nbits < s:
                            acc = (((acc & ((1 << nbits) - 1)) << 40)
                                   | (seg[pos] << 32) | (seg[pos + 1] << 24)
                                   | (seg[pos + 2] << 16) | (seg[pos + 3] << 8)
                                   | seg[pos + 4])
                            pos += 5
                            nbits += 40
                        nbits -= s
                        v = (acc >> nbits) & ((1 << s) - 1)
                    if v < (1 << (s - 1)):
                        v += 1 - (1 << s)
                    ga(g64 + k)
                    va(v << al)
                    k += 1
        if (pos << 3) - nbits > nreal:
            raise DecodeError("jpeg: entropy stream exhausted")
    if gl:
        bigflat[gl] = vl  # one vectorized scatter per scan


_ZLUT = np.zeros(65536, dtype=np.int64)
_LUTCAT_CACHE: dict = {}


def _luts_concat(stab) -> np.ndarray:
    """Contiguous [comp][dc,ac][65536] int64 LUT block for the C
    kernel, memoized on the tables' stable (bits, vals) keys — real
    corpora reuse the Annex-K standard tables, so this is built once
    per worker, not per image."""
    key = tuple(
        (t[1].key if t[1] else None, t[2].key if t[2] else None) for t in stab
    )
    cat = _LUTCAT_CACHE.get(key)
    if cat is None:
        if len(_LUTCAT_CACHE) >= 32:
            _LUTCAT_CACHE.clear()
        parts = []
        for (_c, dc_t, ac_t) in stab:
            parts.append(dc_t.lut2_np if dc_t else _ZLUT)
            parts.append(ac_t.lut2_np if ac_t else _ZLUT)
        cat = np.ascontiguousarray(np.concatenate(parts), dtype=np.int64)
        _LUTCAT_CACHE[key] = cat
    return cat


def _scan_first_c(lib, segments, stab, state, restart_interval, ss, se, al,
                  interleaved, n_units):
    """C-kernel twin of the pure-Python first-pass loop (same LUT
    packing, same refill and per-block exhaustion contract; pinned
    C ≡ Python by the differential tests). Python orchestrates restart
    segments; C decodes each segment's visit span straight into the
    raveled coefficient store."""
    import ctypes

    sis_np, g64_np, bpm = _visit_plan(stab, state, interleaved, n_units)
    luts = _luts_concat(stab)
    bigflat = np.ascontiguousarray(state["big"]).reshape(-1)
    assert bigflat.base is state["big"] or bigflat.base is state["big"].base
    preds = np.zeros(len(stab), dtype=np.int64)
    eob = np.zeros(1, dtype=np.int64)
    i32p, i64p = ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64)
    coef_ptr = bigflat.ctypes.data_as(i32p)
    luts_ptr = luts.ctypes.data_as(i64p)
    preds_ptr = preds.ctypes.data_as(i64p)
    eob_ptr = eob.ctypes.data_as(i64p)
    nvis = len(sis_np)
    rst_stride = restart_interval * bpm if restart_interval else 0
    if rst_stride:
        spans = [(s, min(s + rst_stride, nvis)) for s in range(0, nvis, rst_stride)]
        if len(spans) > len(segments):
            raise DecodeError("jpeg: missing restart segment")
    else:
        spans = [(0, nvis)]
    dc_flag = 1 if ss == 0 else 0
    for idx, (a, b) in enumerate(spans):
        seg = (segments[idx] if idx < len(segments) else b"") + _SEG_PAD
        preds[:] = 0
        eob[0] = 0
        rc = lib.sinter_scan_seg(
            seg, (len(seg) - 512) << 3, luts_ptr,
            sis_np[a:b].ctypes.data_as(i32p), g64_np[a:b].ctypes.data_as(i64p),
            b - a, ss, se, al, dc_flag, coef_ptr, preds_ptr, eob_ptr,
        )
        if rc < 0:
            raise DecodeError(_jpegc._ERRORS.get(int(rc), "jpeg: decode error"))


def _scan_refine_c(lib, segments, stab, state, restart_interval, ss, se, al,
                   interleaved, n_units):
    """C-kernel twin of the pure-Python refinement loop (same visit
    plan, same LUT packing, same per-visit exhaustion contract; pinned
    C ≡ Python by the progressive differential tests). Python
    orchestrates restart segments — eobrun resets per segment exactly
    as the Python reader recreates its state."""
    import ctypes

    sis_np, g64_np, bpm = _visit_plan(stab, state, interleaved, n_units)
    luts = _luts_concat(stab)
    bigflat = np.ascontiguousarray(state["big"]).reshape(-1)
    assert bigflat.base is state["big"] or bigflat.base is state["big"].base
    i32p, i64p = ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64)
    coef_ptr = bigflat.ctypes.data_as(i32p)
    luts_ptr = luts.ctypes.data_as(i64p)
    nvis = len(sis_np)
    rst_stride = restart_interval * bpm if restart_interval else 0
    if rst_stride:
        spans = [(s, min(s + rst_stride, nvis)) for s in range(0, nvis, rst_stride)]
        if len(spans) > len(segments):
            raise DecodeError("jpeg: missing restart segment")
    else:
        spans = [(0, nvis)]
    dc_flag = 1 if ss == 0 else 0
    for idx, (a, b) in enumerate(spans):
        seg = (segments[idx] if idx < len(segments) else b"") + _SEG_PAD
        rc = lib.sinter_refine_seg(
            seg, (len(seg) - 512) << 3, luts_ptr,
            sis_np[a:b].ctypes.data_as(i32p), g64_np[a:b].ctypes.data_as(i64p),
            b - a, ss, se, al, dc_flag, coef_ptr,
        )
        if rc < 0:
            raise DecodeError(_jpegc._ERRORS.get(int(rc), "jpeg: decode error"))


def _scan_refine(segments, stab, state, grid_of, restart_interval, ss, se, al,
                 interleaved, mcx, n_units):
    """Refinement scans (Ah>0): DC correction bits / AC successive
    approximation (T.81 §G.1.2.2-3). Real-world progressive streams
    (libjpeg / javax.imageio scan scripts) spend MOST of their entropy
    bits here — the C kernel covers this path too (measured ~30× on a
    javax 10-scan stream); the object-based reader below is the
    pinned-equal fallback."""
    lib = _jpegc.get_lib()
    if lib is not None:
        return _scan_refine_c(
            lib, segments, stab, state, restart_interval, ss, se, al,
            interleaved, n_units,
        )
    br = _BitReader(segments[0] if segments else b"")
    seg_idx = 0
    eobrun = 0
    for unit in range(n_units):
        if restart_interval and unit and unit % restart_interval == 0:
            seg_idx += 1
            if seg_idx >= len(segments):
                raise DecodeError("jpeg: missing restart segment")
            br = _BitReader(segments[seg_idx])
            eobrun = 0
        if interleaved:
            my, mx = divmod(unit, mcx)
            for (c, _dc_t, ac_t) in stab:
                ac_lut = ac_t.lut if ac_t else None
                grid = grid_of[id(c)]
                for by_ in range(c["v"]):
                    for bx_ in range(c["h"]):
                        coefs = grid[my * c["v"] + by_, mx * c["h"] + bx_]
                        if ss == 0:  # DC refinement: one bit per block
                            if br.read_bit():
                                coefs[0] |= 1 << al
                        else:
                            eobrun = _block_ac_refine(
                                br, ac_lut, coefs, ss, se, al, eobrun
                            )
        else:
            c, _dc_t, ac_t = stab[0]
            ac_lut = ac_t.lut if ac_t else None
            coefs = grid_of[id(c)][divmod(unit, c["bw"])]
            if ss == 0:
                if br.read_bit():
                    coefs[0] |= 1 << al
            else:
                eobrun = _block_ac_refine(
                    br, ac_lut, coefs, ss, se, al, eobrun
                )


def _reconstruct(frame: dict, state: dict, qtbls: dict) -> np.ndarray:
    """Dequantize + IDCT every component grid in ONE vectorized einsum,
    upsample chroma, crop to frame dims, color-convert."""
    comps = frame["comps"]
    fh, fw = frame["h"], frame["w"]
    hmax, vmax = state["hmax"], state["vmax"]
    full = []
    for i, c in enumerate(comps):
        if c["tq"] not in qtbls:
            raise DecodeError("jpeg: missing quant table")
        q = qtbls[c["tq"]]  # natural order (64,)
        coefs = state["coef"][i].astype(np.float64)  # (by, bx, 64) zigzag
        nat = np.empty_like(coefs)
        nat[:, :, ZIGZAG] = coefs  # de-zigzag to natural order
        nat *= q
        by, bx = nat.shape[:2]
        # batched IDCT (D.T @ B @ D) as two (N,8,8)@(8,8) matmuls —
        # BLAS-batched, ~20x faster than the equivalent einsum
        t = np.matmul(nat.reshape(-1, 8, 8), _DCT8)
        px = np.matmul(_DCT8.T, t) + 128.0
        plane = px.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = plane.repeat(ry, axis=0).repeat(rx, axis=1)
        full.append(plane[:fh, :fw])
    if len(full) == 1:
        y = np.clip(full[0], 0, 255)
        return np.dstack([y, y, y]).round().astype(np.uint8)
    if len(full) != 3:
        raise DecodeError(f"jpeg: unsupported component count {len(full)}")
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.dstack([r, g, b]), 0, 255).round().astype(np.uint8)
