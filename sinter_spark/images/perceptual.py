"""True perceptual hashing (DCT pHash) over decoded pixels.

Unlike the table's ``phash`` column (an exact pixel digest — FIXTURES
F1 requires it to collide exactly when pixels are identical), this is
the classic near-duplicate fingerprint: two images that differ only by
lossy re-encoding, mild noise, or resampling land within a small
hamming distance, while unrelated images are ~32 bits apart.

Algorithm (the standard pHash construction, public domain method):
grayscale → nearest-neighbor resample to 32×32 → orthonormal 2-D
DCT-II → keep the top-left 8×8 low-frequency block → bit i is set iff
coefficient i is above the median of the 63 AC coefficients (the DC
term is excluded from the median and its bit forced to 0, so overall
brightness does not dominate).

Pure numpy (two 32×32 matmuls per image); used inside Arrow-batched
kernels — never as a per-row Python UDF over Spark rows.
"""

from __future__ import annotations

import numpy as np

_DCT_N = 32
_BLOCK = 8


def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis: D @ x applies the transform."""
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    d = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    d[0] /= np.sqrt(2.0)
    return d


_D = _dct_matrix(_DCT_N)
_BITPOS = np.arange(_BLOCK * _BLOCK, dtype=np.uint64)


def dct_phash64(px: np.ndarray) -> int:
    """64-bit DCT perceptual hash of an (h, w, 3) uint8 array (signed
    int64, bigint-safe)."""
    gray = (
        0.299 * px[..., 0].astype(np.float64)
        + 0.587 * px[..., 1]
        + 0.114 * px[..., 2]
    )
    h, w = gray.shape
    ys = (np.arange(_DCT_N) * h // _DCT_N).clip(0, h - 1)
    xs = (np.arange(_DCT_N) * w // _DCT_N).clip(0, w - 1)
    small = gray[ys][:, xs]
    coef = (_D @ small @ _D.T)[:_BLOCK, :_BLOCK].ravel()
    med = np.median(coef[1:])
    bits = (coef > med).astype(np.uint64)
    bits[0] = 0  # DC excluded: brightness-invariant
    return int((bits << _BITPOS).sum().view(np.int64))


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")
