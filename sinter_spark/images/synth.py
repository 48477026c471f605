"""Deterministic synthetic image+caption table (the north-star input).

Input shape per BASELINE.json input_hint:
``(image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
caption:string, phash:int64)``. Generation rules and violation-injection
rates follow FIXTURES.md F1 — skewed ``fmt`` (raw 85% / png 12% /
qjpg 3%) to exercise salting, plus seeded violations of every kind the
validation suite must catch.

Everything is a pure function of ``(seed, row_index)`` — independent of
partitioning and cluster size — so the same table can be generated
distributed at any scale (``spark.range(n)`` → ``mapInPandas``), and a
row's *reference render* and *expected caption* can be recomputed from
``image_id`` alone inside the decode kernel (the per-row invariant:
decoded-pixel allclose / PSNR ≥ 40 dB + exact caption equality).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from . import codecs

IMAGE_DDL = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, phash bigint"
)

_WORDS = (
    "cat dog tree river mountain sky café naïve 東京 résumé road cloud "
    "bridge night day forest 雪 stone glass echo"
).split()

#: violation-injection rates (FIXTURES.md F1)
RATES = {
    "dup_id": 0.001,
    "null_id": 0.0005,
    "bad_id": 0.001,
    "corrupt": 0.002,
    "bad_dim": 0.001,
    "huge_dim": 0.001,
    "bad_fmt": 0.001,
    "empty_caption": 0.002,
}


def _digest(*parts: str) -> bytes:
    return hashlib.md5("|".join(parts).encode()).digest()


def uuid_for(seed: int, i: int) -> str:
    d = _digest("uuid", str(seed), str(i)).hex()
    return f"{d[:8]}-{d[8:12]}-{d[12:16]}-{d[16:20]}-{d[20:32]}"


def render_reference(image_id: str, w: int, h: int) -> np.ndarray:
    """Deterministic per-id render: seeded gradient + noise (h, w, 3)."""
    rng = np.random.Generator(
        np.random.PCG64(int.from_bytes(_digest("px", image_id)[:8], "big"))
    )
    c0 = rng.integers(0, 256, 3)
    c1 = rng.integers(0, 256, 3)
    gx = np.linspace(0.0, 1.0, max(w, 1))[None, :, None]
    gy = np.linspace(0.0, 1.0, max(h, 1))[:, None, None]
    base = c0 * (1 - gx) * (1 - gy) + c1 * (gx * 0.5 + gy * 0.5)
    noise = rng.integers(-12, 13, (h, w, 3))
    return np.clip(base + noise, 0, 255).astype(np.uint8)


def expected_caption(image_id: str) -> str:
    """Deterministic caption from image_id (recomputable in the kernel)."""
    d = _digest("cap", image_id)
    n = 3 + d[0] % 8
    return " ".join(_WORDS[d[1 + k] % len(_WORDS)] for k in range(n))


def phash64(arr: np.ndarray) -> int:
    """Perceptual-hash stand-in: 64-bit digest of the pixel buffer.

    FIXTURES.md F1 requires phash "duplicated exactly when pixels
    duplicate"; a true average-hash collides on low-entropy synthetic
    gradients, so the stand-in hashes the exact pixels instead."""
    d = hashlib.md5(arr.astype(np.uint8).tobytes()).digest()
    return int(np.frombuffer(d[:8], dtype=np.int64)[0])


def make_row(seed: int, i: int, max_dim: int = 64) -> dict:
    rng = np.random.Generator(
        np.random.PCG64(int.from_bytes(_digest("row", str(seed), str(i))[:8], "big"))
    )
    draw = {k: rng.random() for k in RATES}

    image_id: str | None = uuid_for(seed, i)
    if i > 0 and draw["dup_id"] < RATES["dup_id"]:
        image_id = uuid_for(seed, i - 1)  # duplicate of a neighbor
    if draw["bad_id"] < RATES["bad_id"]:
        image_id = f"not-a-uuid-{i}"
    if draw["null_id"] < RATES["null_id"]:
        image_id = None

    # log-skewed dims 16..max_dim
    lo, hi = np.log(16), np.log(max_dim)
    w = int(np.exp(rng.uniform(lo, hi)))
    h = int(np.exp(rng.uniform(lo, hi)))

    # skewed fmt: raw 85%, png 12%, qjpg 3% (FIXTURES F1)
    r = rng.random()
    fmt = "raw" if r < 0.85 else ("png" if r < 0.97 else "qjpg")

    render_key = image_id if image_id is not None else f"null-{seed}-{i}"
    pixels = render_reference(render_key, w, h)
    data = codecs.ENCODERS[fmt](pixels)
    ph = phash64(pixels)
    caption = expected_caption(render_key)

    # injected violations (after encoding, so payload matches true dims)
    if draw["bad_dim"] < RATES["bad_dim"]:
        w = 0 if rng.random() < 0.5 else -int(rng.integers(1, 10))
    if draw["huge_dim"] < RATES["huge_dim"]:
        h = 16385 + int(rng.integers(0, 100))
    if draw["bad_fmt"] < RATES["bad_fmt"]:
        fmt = "gif"
    if draw["corrupt"] < RATES["corrupt"]:
        b = bytearray(data)
        k = len(b) // 2
        for j in range(k, min(k + 16, len(b))):
            b[j] ^= 0xFF
        data = bytes(b)
    if draw["empty_caption"] < RATES["empty_caption"]:
        caption = ""

    return {
        "image_id": image_id,
        "bytes": data,
        "w": w,
        "h": h,
        "fmt": fmt,
        "caption": caption,
        "phash": ph,
    }


def generate_images(spark, n: int, seed: int = 42, max_dim: int = 64, partitions: int | None = None):
    """Distributed generation: spark.range(n) → mapInPandas.

    Scales to any n: each task renders only its index range; no driver
    materialization. At the 10^12 design point this is the same code
    with a bigger range."""
    if partitions is None:
        partitions = max(int(spark.sparkContext.defaultParallelism), 4)
    base = spark.range(0, n, 1, partitions)

    def gen(batches):
        for pdf in batches:
            rows = [make_row(seed, int(i), max_dim) for i in pdf["id"]]
            yield pd.DataFrame(rows)

    return base.mapInPandas(gen, IMAGE_DDL)


def fmt_dim(spark):
    """Dimension table for the referential check (FIXTURES F1):
    one row per known fmt; `gif` rows in images are orphans."""
    return spark.createDataFrame(
        [("raw", False, 24), ("png", False, 24), ("qjpg", True, 6)],
        "fmt string, lossy boolean, max_bpp int",
    )


def write_images(spark, path: str, n: int, seed: int = 42, max_dim: int = 64) -> None:
    generate_images(spark, n, seed, max_dim).write.mode("overwrite").parquet(path)
