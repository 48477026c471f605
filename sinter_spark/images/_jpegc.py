"""Optional C fast path for the JPEG first-pass entropy decode.

The pure-Python scan loop in ``jpeg._scan_first`` is interpreter-bound
at ~0.5 µs/symbol — structurally optimal (one fused Huffman-LUT hit
per symbol) but paying CPython dispatch per bit-field. This module
compiles the SAME algorithm (same LUT packing, same refill/exhaustion
contract, same error cases) as ~100 lines of C with the system
compiler (stdlib ``ctypes`` + ``cc`` — no third-party dependency) and
loads it lazily. Everything degrades gracefully:

* no compiler / compile failure / load failure → ``available()`` is
  False and ``jpeg._scan_first`` keeps its pure-Python loop;
* ``SINTER_JPEG_NO_C=1`` forces the Python path (used by the
  differential tests that pin C ≡ Python on every stream shape).

The shared object is cached under ``/tmp`` keyed by a hash of the
source, so Spark's many Python workers compile once per host and then
just ``dlopen``. Compilation is atomic (temp file + rename) — a
concurrent worker either sees the finished .so or compiles its own
temp and loses the rename race harmlessly.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys
import tempfile

_SRC = r"""
#include <stddef.h>
#include <stdint.h>

#define ERR_INVALID  (-1)
#define ERR_EXHAUST  (-2)
#define ERR_DCCAT    (-3)
#define ERR_ACOVF    (-4)

#define REFILL do { \
    acc = (acc << 40) | ((uint64_t)seg[pos] << 32) \
        | ((uint64_t)seg[pos+1] << 24) | ((uint64_t)seg[pos+2] << 16) \
        | ((uint64_t)seg[pos+3] << 8) | (uint64_t)seg[pos+4]; \
    pos += 5; nbits += 40; } while (0)

/* One restart segment of a first-pass (Ah=0) scan: T.81 F.2.2/G.1.2
   with the fused 16-bit-peek LUT (entry = (r<<14)|(s<<10)|((L+s)<<5)|L,
   -1 invalid). Mirrors jpeg.py _scan_first exactly. */
long long sinter_scan_seg(
    const uint8_t *seg,        /* zero-padded entropy bytes */
    long long nreal_bits,      /* bits before the padding */
    const int64_t *luts,       /* [comp][2][65536], dc then ac */
    const int32_t *sis,        /* per-visit component index */
    const int64_t *g64s,       /* per-visit flat coefficient base */
    long long nvisits,
    int ss, int se, int al, int dc_flag,
    int32_t *coef,             /* raveled coefficient store */
    int64_t *preds,            /* [comp], caller-reset per segment */
    int64_t *eobrun_io)
{
    uint64_t acc = 0;
    int nbits = 0;
    long long pos = 0;
    int64_t eobrun = *eobrun_io;
    int k0 = (ss == 0) ? 1 : ss;
    for (long long i = 0; i < nvisits; i++) {
        int si = sis[i];
        int64_t g64 = g64s[i];
        if (dc_flag) {
            const int64_t *dc_lut = luts + ((size_t)si * 2) * 65536;
            if (nbits < 16) REFILL;
            uint32_t w = (uint32_t)((acc >> (nbits - 16)) & 0xFFFF);
            int64_t e = dc_lut[w];
            if (e < 0) return ERR_INVALID;
            int s = (int)((e >> 10) & 15);
            if (s == 0) {
                nbits -= (int)(e & 31);
            } else {
                if (s > 11) return ERR_DCCAT;
                int lt = (int)((e >> 5) & 31);
                int64_t v;
                if (lt <= 16) {
                    nbits -= lt;
                    v = (w >> (16 - lt)) & ((1 << s) - 1);
                } else {
                    nbits -= (int)(e & 31);
                    if (nbits < s) REFILL;
                    nbits -= s;
                    v = (int64_t)((acc >> nbits) & (((uint64_t)1 << s) - 1));
                }
                if (v < ((int64_t)1 << (s - 1))) v += 1 - ((int64_t)1 << s);
                preds[si] += v;
            }
            coef[g64] = (int32_t)(preds[si] << al);
        }
        if (k0 <= se) {
            if (eobrun) {
                eobrun--;
            } else {
                const int64_t *ac_lut = luts + ((size_t)si * 2 + 1) * 65536;
                int k = k0;
                while (k <= se) {
                    if (nbits < 16) REFILL;
                    uint32_t w = (uint32_t)((acc >> (nbits - 16)) & 0xFFFF);
                    int64_t e = ac_lut[w];
                    if (e < 0) return ERR_INVALID;
                    int s = (int)((e >> 10) & 15);
                    if (s == 0) {
                        nbits -= (int)(e & 31);
                        int r = (int)(e >> 14);
                        if (r == 15) { k += 16; continue; } /* ZRL */
                        eobrun = ((int64_t)1 << r) - 1;     /* EOBn   */
                        if (r) {
                            if (nbits < r) REFILL;
                            nbits -= r;
                            eobrun += (int64_t)((acc >> nbits)
                                                & (((uint64_t)1 << r) - 1));
                        }
                        break;
                    }
                    k += (int)(e >> 14);
                    if (k > se) return ERR_ACOVF;
                    int lt = (int)((e >> 5) & 31);
                    int64_t v;
                    if (lt <= 16) {
                        nbits -= lt;
                        v = (w >> (16 - lt)) & ((1 << s) - 1);
                    } else {
                        nbits -= (int)(e & 31);
                        if (nbits < s) REFILL;
                        nbits -= s;
                        v = (int64_t)((acc >> nbits) & (((uint64_t)1 << s) - 1));
                    }
                    if (v < ((int64_t)1 << (s - 1))) v += 1 - ((int64_t)1 << s);
                    coef[g64 + k] = (int32_t)(v << al);
                    k++;
                }
            }
        }
        if ((pos << 3) - nbits > nreal_bits) return ERR_EXHAUST;
    }
    *eobrun_io = eobrun;
    return 0;
}
"""

_ERRORS = {
    -1: "jpeg: invalid huffman code",
    -2: "jpeg: entropy stream exhausted",
    -3: "jpeg: bad DC category",
    -4: "jpeg: AC index overflow",
}

_lib = None
_tried = False


def _build() -> "ctypes.CDLL | None":
    tag = hashlib.sha256(_SRC.encode()).hexdigest()[:16]
    cache = os.path.join(
        tempfile.gettempdir(), f"sinter_jpegc_{tag}_py{sys.version_info[0]}{sys.version_info[1]}"
    )
    so_path = os.path.join(cache, "libsinterjpeg.so")
    if not os.path.exists(so_path):
        os.makedirs(cache, exist_ok=True)
        src_path = os.path.join(cache, "scan.c")
        with open(src_path, "w") as f:
            f.write(_SRC)
        tmp = os.path.join(cache, f".build_{os.getpid()}.so")
        subprocess.run(
            ["cc", "-O2", "-shared", "-fPIC", "-o", tmp, src_path],
            check=True, capture_output=True, timeout=120,
        )
        os.replace(tmp, so_path)  # atomic: racers overwrite with identical bits
    lib = ctypes.CDLL(so_path)
    fn = lib.sinter_scan_seg
    fn.restype = ctypes.c_longlong
    fn.argtypes = [
        ctypes.c_char_p, ctypes.c_longlong,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_longlong,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
    ]
    return lib


def get_lib():
    """The loaded C library, or None (no compiler / failed build /
    ``SINTER_JPEG_NO_C`` set). Never raises."""
    global _lib, _tried
    if os.environ.get("SINTER_JPEG_NO_C"):
        return None
    if not _tried:
        _tried = True
        try:
            _lib = _build()
        except Exception:
            _lib = None
    return _lib


def available() -> bool:
    return get_lib() is not None
