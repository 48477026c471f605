"""Optional C fast path for the JPEG entropy decode — BOTH scan kinds.

The pure-Python loops in ``jpeg._scan_first`` (sequential + progressive
first-pass) and ``jpeg._scan_refine`` (progressive successive
approximation — where real-world libjpeg/javax scan scripts spend most
of their entropy bits; measured ~27× end-to-end on a javax 10-scan
stream) are interpreter-bound at ~0.5 µs/symbol — structurally optimal
(one fused Huffman-LUT hit per symbol) but paying CPython dispatch per
bit-field. This module compiles the SAME algorithms (same LUT packing,
same refill/exhaustion contract, same error cases) as ~200 lines of C
with the system compiler (stdlib ``ctypes`` + ``cc`` — no third-party
dependency) and loads them lazily. Everything degrades gracefully:

* no compiler / compile failure / load failure → ``available()`` is
  False and ``jpeg._scan_first`` / ``jpeg._scan_refine`` keep their
  pure-Python loops;
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
#define ERR_REFMAG   (-5)

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

/* One restart segment of a REFINEMENT scan (Ah>0): T.81 G.1.2.2 (DC —
   one correction bit per block) / G.1.2.3 (AC — successive
   approximation: EOB runs, correction bits on nonzero-history coefs,
   newly-significant +-1<<al placements). Mirrors jpeg.py _scan_refine
   + _block_ac_refine exactly; eobrun is segment-local (the caller
   resets it per restart segment, as the Python reader does). */
long long sinter_refine_seg(
    const uint8_t *seg, long long nreal_bits,
    const int64_t *luts,
    const int32_t *sis, const int64_t *g64s, long long nvisits,
    int ss, int se, int al, int dc_flag,
    int32_t *coef)
{
    uint64_t acc = 0;
    int nbits = 0;
    long long pos = 0;
    int64_t eobrun = 0;
    int32_t p1 = (int32_t)1 << al, m1 = -((int32_t)1 << al);
    for (long long i = 0; i < nvisits; i++) {
        int si = sis[i];
        int64_t g = g64s[i];
        if (dc_flag) {
            if (nbits < 1) REFILL;
            nbits -= 1;
            if ((acc >> nbits) & 1) coef[g] |= p1;
        } else {
            const int64_t *ac_lut = luts + ((size_t)si * 2 + 1) * 65536;
            int k = ss;
            if (eobrun == 0) {
                while (k <= se) {
                    if (nbits < 16) REFILL;
                    uint32_t w = (uint32_t)((acc >> (nbits - 16)) & 0xFFFF);
                    int64_t e = ac_lut[w];
                    if (e < 0) return ERR_INVALID;
                    int s = (int)((e >> 10) & 15);
                    int r = (int)(e >> 14);
                    int32_t newval = 0;
                    if (s == 0) {
                        nbits -= (int)(e & 31);
                        if (r != 15) {            /* EOBn */
                            eobrun = (int64_t)1 << r;
                            if (r) {
                                if (nbits < r) REFILL;
                                nbits -= r;
                                eobrun += (int64_t)((acc >> nbits)
                                                    & (((uint64_t)1 << r) - 1));
                            }
                            break;
                        }
                        /* r == 15: ZRL — skip 16 zero-history coefs */
                    } else {
                        if (s != 1) return ERR_REFMAG;
                        int lt = (int)((e >> 5) & 31);
                        int64_t v;
                        if (lt <= 16) {           /* fused code+value bits */
                            nbits -= lt;
                            v = (w >> (16 - lt)) & 1;
                        } else {
                            nbits -= (int)(e & 31);
                            if (nbits < 1) REFILL;
                            nbits -= 1;
                            v = (acc >> nbits) & 1;
                        }
                        newval = v ? p1 : m1;
                    }
                    /* advance over r zero-history coefs, correcting
                       nonzero-history ones with one bit each */
                    while (k <= se) {
                        if (coef[g + k] != 0) {
                            if (nbits < 1) REFILL;
                            nbits -= 1;
                            if (((acc >> nbits) & 1) && (coef[g + k] & p1) == 0)
                                coef[g + k] += coef[g + k] >= 0 ? p1 : m1;
                        } else {
                            if (r == 0) break;
                            r -= 1;
                        }
                        k++;
                    }
                    if (newval && k <= se) coef[g + k] = newval;
                    k++;
                }
            }
            if (eobrun > 0) {     /* EOB span: correction bits only */
                for (; k <= se; k++) {
                    if (coef[g + k] != 0) {
                        if (nbits < 1) REFILL;
                        nbits -= 1;
                        if (((acc >> nbits) & 1) && (coef[g + k] & p1) == 0)
                            coef[g + k] += coef[g + k] >= 0 ? p1 : m1;
                    }
                }
                eobrun--;
            }
        }
        if ((pos << 3) - nbits > nreal_bits) return ERR_EXHAUST;
    }
    return 0;
}
"""

_ERRORS = {
    -1: "jpeg: invalid huffman code",
    -2: "jpeg: entropy stream exhausted",
    -3: "jpeg: bad DC category",
    -4: "jpeg: AC index overflow",
    -5: "jpeg: bad refinement magnitude",
}

_lib = None
_tried = False


def _assert_trusted(path: str) -> None:
    """Refuse to dlopen from a path another local user could have
    planted or modified (ADVICE r4: the cache path is predictable, and
    a pre-existing .so would execute in every Spark worker): the entry
    must be owned by us and not group/world-writable."""
    st = os.stat(path, follow_symlinks=False)
    if st.st_uid != os.getuid() or (st.st_mode & 0o022):
        raise PermissionError(f"untrusted kernel cache entry: {path}")


def _build() -> "ctypes.CDLL | None":
    tag = hashlib.sha256(_SRC.encode()).hexdigest()[:16]
    # per-uid cache dir: a shared temp dir lets any local user pre-create
    # the predictable path and plant a malicious shared object
    cache = os.path.join(
        tempfile.gettempdir(),
        f"sinter_jpegc_u{os.getuid()}_{tag}_py{sys.version_info[0]}{sys.version_info[1]}",
    )
    so_path = os.path.join(cache, "libsinterjpeg.so")
    os.makedirs(cache, mode=0o700, exist_ok=True)
    _assert_trusted(cache)  # pre-existing dir: ours and 0o7xx only
    if not os.path.exists(so_path):
        src_path = os.path.join(cache, "scan.c")
        with open(src_path, "w") as f:
            f.write(_SRC)
        tmp = os.path.join(cache, f".build_{os.getpid()}.so")
        subprocess.run(
            ["cc", "-O2", "-shared", "-fPIC", "-o", tmp, src_path],
            check=True, capture_output=True, timeout=120,
        )
        os.chmod(tmp, 0o500)
        os.replace(tmp, so_path)  # atomic: racers overwrite with identical bits
    _assert_trusted(so_path)
    lib = ctypes.CDLL(so_path)
    rf = lib.sinter_refine_seg
    rf.restype = ctypes.c_longlong
    rf.argtypes = [
        ctypes.c_char_p, ctypes.c_longlong,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_longlong,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32),
    ]
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
