"""Deterministic media fixtures with GENERATION-TIME ground truth —
the oracle bridge for the media queries (VERDICT_r03 #5).

The driver's correctness gate runs each Spark query next to an ANSI-SQL
oracle in DuckDB. Decode isn't SQL-expressible, but the fixtures here
are pure functions of a seed, so each payload's true features are
knowable WITHOUT the decoder:

* video: expectations come straight from the SOURCE frames
  (``synth_video_frames``) — fully decoder-independent, since the
  ``rawvid`` container is lossless;
* audio: expectations come from the int16-quantized PCM the WAV
  payload carries — decoder-independent (the RIFF parser never runs);
* images: lossless fmts (raw/png) take expectations from the REFERENCE
  RENDER (decoder-independent); lossy fmts (qjpg/jpeg) and corrupted
  payloads are deterministic too, but their truth necessarily comes
  from one decode at expectation-build time (flagged per-row via
  ``fmt``; the decoders themselves are pinned by codec unit tests and
  the javax.imageio interop suite).

DuckDB then literally compares: the oracle SQL is a VALUES table of
these expectations, and the driver hashes Spark-vs-oracle rows. All
float features are floored to integer milli/micro units ON BOTH SIDES
(same float64 input, same multiply, same floor) so the hash compare is
exact. Spark does the distributed decode; DuckDB only checks it.
"""

from __future__ import annotations

import hashlib

import numpy as np

from .images import codecs
from .images.perceptual import dct_phash64
from .images.synth import _encode_payload, render_reference
from .images.video import sample_indices, synth_video_frames
from .operators.audio import synth_audio

# --- shared helpers ----------------------------------------------------------


def _milli(x: float) -> int:
    return int(np.floor(np.float64(x) * 1000.0))


def _micro(x: float) -> int:
    return int(np.floor(np.float64(x) * 1_000_000.0))


def values_sql(rows: list[tuple], cols: list[tuple[str, str]], order_by: list[str]) -> str:
    """ANSI-SQL literal table: SELECT casted columns FROM (VALUES ...).

    ``cols`` is [(name, sql_type), ...]; None values become NULL and
    every column is cast so DuckDB's VALUES inference can't drift from
    the Spark schema."""

    def lit(v):
        if v is None:
            return "NULL"
        if isinstance(v, bool):
            return "TRUE" if v else "FALSE"
        if isinstance(v, (int, np.integer)):
            return str(int(v))
        s = str(v).replace("'", "''")
        return f"'{s}'"

    names = [n for n, _t in cols]
    casts = ", ".join(f"CAST({n} AS {t}) AS {n}" for n, t in cols)
    vals = ",\n".join("(" + ", ".join(lit(v) for v in r) + ")" for r in rows)
    return (
        f"SELECT {casts} FROM (VALUES\n{vals}\n) AS t({', '.join(names)}) "
        f"ORDER BY {', '.join(order_by)}"
    )


# --- images ------------------------------------------------------------------

IMAGE_FIXTURE_N = 300
IMAGE_COLS = [
    ("row_key", "VARCHAR"), ("ok", "BOOLEAN"), ("dec_w", "BIGINT"),
    ("dec_h", "BIGINT"), ("bright_milli", "BIGINT"), ("phash64", "BIGINT"),
]


def image_payload_rows() -> list[tuple[str, bytes, str, int, int]]:
    """(row_key, bytes, fmt, w, h): fmts cycle raw/png/qjpg/jpeg/gif;
    every 25th payload is corrupted mid-stream (flip 16 bytes)."""
    rows = []
    for i in range(IMAGE_FIXTURE_N):
        key = f"img-{i:04d}"
        w, h = 16 + (i * 7) % 33, 16 + (i * 11) % 29
        px = render_reference(key, w, h)
        fmt = ("raw", "png", "qjpg", "jpeg", "gif")[i % 5]
        data = _encode_payload(fmt, px)
        if i % 25 == 24:
            b = bytearray(data)
            k = len(b) // 2
            for j in range(k, min(k + 16, len(b))):
                b[j] ^= 0xFF
            data = bytes(b)
        rows.append((key, data, fmt, w, h))
    return rows


def image_expected_rows() -> list[tuple]:
    """Ground truth per payload row (IMAGE_COLS order). Lossless clean
    rows derive from the render and are ASSERTED equal to the decode —
    a built-in decoder self-check every time the oracle is built."""
    out = []
    for (key, data, fmt, w, h) in image_payload_rows():
        corrupt = int(key[4:]) % 25 == 24
        try:
            px = codecs.decode(fmt, data)
        except codecs.DecodeError:
            out.append((key, False, None, None, None, None))
            continue
        if fmt in ("raw", "png", "gif") and not corrupt:
            ref = render_reference(key, w, h)
            if fmt == "gif":   # palette-limited at origin, then lossless
                ref = codecs.posterize_rgb332(ref)
            if not np.array_equal(px, ref):  # pragma: no cover
                raise AssertionError(f"lossless decode != render for {key}")
        means = px.reshape(-1, 3).mean(axis=0)
        out.append(
            (key, True, int(px.shape[1]), int(px.shape[0]),
             _milli(float(means.mean())), dct_phash64(px))
        )
    return out


def image_oracle_sql() -> str:
    return values_sql(image_expected_rows(), IMAGE_COLS, ["row_key"])


# --- video -------------------------------------------------------------------

VIDEO_FIXTURE_N = 40
VIDEO_SAMPLE_K = 4
VIDEO_COLS = [
    ("row_key", "VARCHAR"), ("frame_idx", "BIGINT"), ("ok", "BOOLEAN"),
    ("frame_w", "BIGINT"), ("frame_h", "BIGINT"), ("bright_milli", "BIGINT"),
    ("phash64", "BIGINT"), ("frame_digest", "VARCHAR"),
]


def _video_params(i: int) -> tuple[int, int, int, str]:
    fmt = "mp4" if i % 7 == 0 else ("gif" if i % 5 == 2 else "rawvid")
    return 8 + i % 9, 32, 24, fmt


def _gif_clip_frames(n: int, w: int, h: int, seed: int) -> np.ndarray:
    """Animated-gif source frames: palette-limited at origin (the same
    posterize contract as still gif rows in synth F1)."""
    from .images.gif import posterize_rgb332

    return posterize_rgb332(synth_video_frames(n, w, h, seed=seed))


def video_payload_rows() -> list[tuple[str, bytes, str]]:
    """(row_key, bytes, fmt): rawvid clips + animated-gif clips +
    every 7th an mp4 stub."""
    from .images.gif import encode_gif_animation
    from .images.video import encode_rawvid

    rows = []
    for i in range(VIDEO_FIXTURE_N):
        n, w, h, fmt = _video_params(i)
        if fmt == "gif":
            data = encode_gif_animation(_gif_clip_frames(n, w, h, seed=i))
        else:
            data = encode_rawvid(synth_video_frames(n, w, h, seed=i))
        rows.append((f"vid-{i:03d}", data, fmt))
    return rows


def video_expected_rows() -> list[tuple]:
    """Ground truth from SOURCE frames (decoder never runs): sampled
    frame dims, floor-milli brightness, DCT pHash, md5 digest. Stub
    fmts mirror the kernel's deterministic payload-slice digests."""
    from .images.video import encode_rawvid

    out = []
    for i in range(VIDEO_FIXTURE_N):
        n, w, h, fmt = _video_params(i)
        key = f"vid-{i:03d}"
        frames = synth_video_frames(n, w, h, seed=i)
        if fmt in ("rawvid", "gif"):
            if fmt == "gif":   # palette-limited at origin (≡ payload)
                frames = _gif_clip_frames(n, w, h, seed=i)
            for idx in sample_indices(n, VIDEO_SAMPLE_K):
                px = frames[idx]
                out.append(
                    (key, idx, True, w, h, _milli(float(px.mean())),
                     dct_phash64(px), hashlib.md5(px.tobytes()).hexdigest())
                )
        else:  # stub path: digests of payload slices, ok=False
            b = encode_rawvid(frames)
            step = max(len(b) // VIDEO_SAMPLE_K, 1)
            for j in range(VIDEO_SAMPLE_K):
                chunk = b[j * step : (j + 1) * step]
                out.append(
                    (key, j, False, None, None, None, None,
                     hashlib.md5(chunk).hexdigest())
                )
    return out


def video_oracle_sql() -> str:
    return values_sql(video_expected_rows(), VIDEO_COLS, ["row_key", "frame_idx"])


# --- audio -------------------------------------------------------------------

AUDIO_FIXTURE_N = 50
AUDIO_COLS = [
    ("row_key", "VARCHAR"), ("ok", "BOOLEAN"), ("sample_rate", "BIGINT"),
    ("n_samples", "BIGINT"), ("dur_milli", "BIGINT"), ("channels", "BIGINT"),
    ("rms_micro", "BIGINT"), ("peak_micro", "BIGINT"),
    ("zcr_micro", "BIGINT"), ("centroid_milli", "BIGINT"),
]


def _audio_params(i: int) -> tuple[float, int, float, str]:
    return 0.25, 8000, 200.0 + 40.0 * i, ("wav" if i % 5 else "mp3")


def audio_payload_rows() -> list[tuple[str, bytes, str]]:
    return [
        (f"clip-{i}", synth_audio(d, r, freq=f, seed=i), fmt)
        for i, (d, r, f, fmt) in ((i, _audio_params(i)) for i in range(AUDIO_FIXTURE_N))
    ]


def _quantized_pcm(duration_s: float, rate: int, freq: float, seed: int) -> np.ndarray:
    """The exact float64 PCM a WAV round trip yields, computed WITHOUT
    the RIFF parser: synth wave → int16 quantization → /32768."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(duration_s * rate)) / rate
    wave = 0.6 * np.sin(2 * np.pi * freq * t) + 0.01 * rng.standard_normal(len(t))
    q = (np.clip(wave, -1.0, 1.0) * 32767.0).round().astype(np.int16)
    return q.astype(np.float64) / 32768.0


def audio_expected_rows() -> list[tuple]:
    out = []
    for i in range(AUDIO_FIXTURE_N):
        d, r, f, fmt = _audio_params(i)
        key = f"clip-{i}"
        if fmt != "wav":
            out.append((key, False) + (None,) * 8)
            continue
        mono = _quantized_pcm(d, r, f, i)  # single channel ⇒ mono ≡ samples
        n = len(mono)
        spec = np.abs(np.fft.rfft(mono)) ** 2
        freqs = np.fft.rfftfreq(n, d=1.0 / r)
        power = spec.sum()
        out.append(
            (key, True, r, n, _milli(n / r), 1,
             _micro(float(np.sqrt(np.mean(mono**2)))),
             _micro(float(np.abs(mono).max())),
             _micro(float(np.mean(np.diff(np.signbit(mono)) != 0))),
             _milli(float((freqs * spec).sum() / power) if power > 0 else 0.0))
        )
    return out


def audio_oracle_sql() -> str:
    return values_sql(audio_expected_rows(), AUDIO_COLS, ["row_key"])


# --- image near-dup (round 4: oracle for the LSH pair pipeline) --------------

NEARDUP_N = 120
NEARDUP_COPIES = 40
NEARDUP_SEED = 3
NEARDUP_W, NEARDUP_H = 36, 28
NEARDUP_MAX_HAMMING = 6


def neardup_phash_rows() -> list[tuple[str, int]]:
    """(image_id, dct_phash64) for the ``image_near_dup`` fixture,
    computed at expectation-build time: originals fingerprint the
    REFERENCE RENDER directly (``raw`` is lossless, decode ≡ render —
    decoder-independent); the ``qjpg`` re-encoded copies take one
    deterministic encode→decode round trip here (the qjpg codec is
    pinned by its own unit tests), exactly as the image/video/audio
    expectations above do for lossy payloads."""
    from .images.synth import render_reference, uuid_for

    ids = [uuid_for(NEARDUP_SEED, i) for i in range(NEARDUP_N)]
    rows = []
    for x in ids:
        rows.append((x, dct_phash64(render_reference(x, NEARDUP_W, NEARDUP_H))))
    for x in ids[:NEARDUP_COPIES]:
        px = render_reference(x, NEARDUP_W, NEARDUP_H)
        dec = codecs.decode("qjpg", codecs.ENCODERS["qjpg"](px))
        rows.append((f"{x}-copy", dct_phash64(dec)))
    return rows


def neardup_oracle_sql(max_hamming: int = NEARDUP_MAX_HAMMING) -> str:
    """ANSI-SQL all-pairs hamming join over the fingerprint VALUES
    table — the brute-force twin of the hamming-block LSH pipeline.
    Equality with the Spark output is exact because pair-of-blocks
    bucketing GUARANTEES recall at hamming ≤ n_blocks − 2 (pigeonhole;
    ``dedup.hamming_block_pairs``) and the fixture is far below the
    mega-bucket cap, so LSH output ≡ the full quadratic truth."""
    rows = neardup_phash_rows()
    vals = ",\n".join(f"('{i}', {ph})" for i, ph in rows)
    return (
        "WITH p AS (SELECT CAST(id AS VARCHAR) AS id, CAST(ph AS BIGINT) AS ph "
        f"FROM (VALUES\n{vals}\n) AS t(id, ph))\n"
        "SELECT a.id AS id_a, b.id AS id_b, "
        "CAST(bit_count(xor(a.ph, b.ph)) AS BIGINT) AS hamming\n"
        "FROM p a JOIN p b ON a.id < b.id\n"
        f"WHERE bit_count(xor(a.ph, b.ph)) <= {int(max_hamming)}\n"
        "ORDER BY id_a, id_b"
    )


# --- image-suite violation census (round 4) ----------------------------------

SUITE_N = 2000
SUITE_SEED = 42
SUITE_MAX_DIM = 32
_SUITE_FMTS = ("raw", "png", "qjpg", "jpeg", "pjpeg", "gif")  # schema choices ≡ fmt_dim


def suite_expected_code_counts(
    n: int = SUITE_N, seed: int = SUITE_SEED, max_dim: int = SUITE_MAX_DIM
) -> dict[str, int]:
    """Expected per-code violation counts for ``validate_images_full``
    over ``generate_images(n, seed, max_dim)`` — a straight-line
    single-process re-derivation of every suite check from the
    generator's own rows (the table is a pure function of ``(seed, i)``,
    so ground truth is computable without Spark). This is the oracle
    for the DISTRIBUTED composition: the fused Column-predicate row
    pass, Arrow-batched decode kernel, salted two-phase uniqueness
    aggs, broadcast referential anti-join, and the violation union —
    each reimplemented here as plain Python over plain dicts.

    Per-row payload checks mirror ``images.kernel._check_row``
    semantics (reimplemented, not called); decode itself reuses the
    pinned codecs exactly as the media expectations above do."""
    from collections import Counter

    from .images.synth import (
        expected_caption,
        make_row,
        phash64,
        render_reference,
    )
    from .types import UUID_RE

    codes: Counter = Counter()
    id_counts: Counter = Counter()
    ph_counts: Counter = Counter()
    for i in range(n):
        r = make_row(seed, i, max_dim)
        iid, data, w, h = r["image_id"], r["bytes"], r["w"], r["h"]
        fmt, cap, ph = r["fmt"], r["caption"], r["phash"]

        # row pass: image_schema(include_bytes=False) predicates
        if iid is None:
            codes["required"] += 1
        elif not UUID_RE.match(iid):
            codes["format"] += 1
        if not w > 0:
            codes["gt"] += 1
        if not w <= 16384:
            codes["lteq"] += 1
        if not h > 0:
            codes["gt"] += 1
        if not h <= 16384:
            codes["lteq"] += 1
        if fmt not in _SUITE_FMTS:
            codes["choices"] += 1
        if len(cap) < 1:
            codes["min_length"] += 1
        if len(cap) > 512:
            codes["max_length"] += 1

        # decode kernel (decode-once, then dim/pixel/caption/phash)
        px = None
        if data is None:
            codes["required"] += 1
        elif fmt not in codecs.DECODERS:
            codes["decode"] += 1
        else:
            try:
                px = codecs.decode(fmt, bytes(data))
            except codecs.DecodeError:
                codes["decode"] += 1
        if px is not None:
            dec_h, dec_w = px.shape[0], px.shape[1]
            if w is not None and int(w) != dec_w:
                codes["dim_mismatch"] += 1
            if h is not None and int(h) != dec_h:
                codes["dim_mismatch"] += 1
            if iid is not None:
                ref = render_reference(iid, dec_w, dec_h)
                if fmt == "gif":   # mirror kernel: palette-limited origin
                    ref = codecs.posterize_rgb332(ref)
                if fmt in codecs.LOSSY_FMTS:
                    if not codecs.psnr(px, ref) >= 40.0:
                        codes["psnr"] += 1
                elif px.shape != ref.shape or px.tobytes() != ref.tobytes():
                    codes["decode"] += 1
                if cap is not None and cap != expected_caption(iid):
                    codes["caption_mismatch"] += 1
                if ph is not None and int(ph) != phash64(ref):
                    codes["phash_mismatch"] += 1

        # uniqueness (null is a group key, like groupBy) + referential
        id_counts[iid] += 1
        ph_counts[ph] += 1
        if fmt not in _SUITE_FMTS:
            codes["referential"] += 1

    codes["unique"] += sum(1 for v in id_counts.values() if v > 1)
    codes["unique"] += sum(1 for v in ph_counts.values() if v > 1)
    return dict(codes)


def suite_violations_oracle_sql() -> str:
    counts = suite_expected_code_counts()
    rows = sorted(counts.items())
    return values_sql(rows, [("code", "VARCHAR"), ("n", "BIGINT")], ["code"])
