"""Baseline JPEG codec: math invariants, spec-table conformance,
roundtrip PSNR, and — decisively — INTEROP with the JVM's independent
javax.imageio JPEG implementation in both directions (our encoder's
streams decoded by ImageIO; ImageIO-encoded streams decoded by us).
"""

import numpy as np
import pytest

from sinter_spark.images import codecs, jpeg


def smooth_img(h, w, seed=1):
    """Low-frequency random image (bilinear-upsampled noise) — the
    'natural photo' regime where JPEG's rate/distortion claims hold."""
    r = np.random.default_rng(seed)
    small = r.integers(0, 256, size=(h // 8 + 2, w // 8 + 2, 3)).astype(float)
    ys = np.linspace(0, small.shape[0] - 1.01, h)
    xs = np.linspace(0, small.shape[1] - 1.01, w)
    yi, xi = np.floor(ys).astype(int), np.floor(xs).astype(int)
    fy, fx = (ys - yi)[:, None, None], (xs - xi)[None, :, None]
    img = (
        small[yi][:, xi] * (1 - fy) * (1 - fx)
        + small[yi + 1][:, xi] * fy * (1 - fx)
        + small[yi][:, xi + 1] * (1 - fy) * fx
        + small[yi + 1][:, xi + 1] * fy * fx
    )
    return img.clip(0, 255).astype(np.uint8)


class TestMath:
    def test_dct_matrix_orthonormal(self):
        assert np.allclose(jpeg._DCT8 @ jpeg._DCT8.T, np.eye(8), atol=1e-12)

    def test_idct_inverts_dct(self):
        b = np.random.default_rng(3).standard_normal((8, 8)) * 100
        assert np.allclose(jpeg._idct2(jpeg._dct2(b)), b, atol=1e-9)

    def test_zigzag_is_permutation(self):
        assert sorted(jpeg.ZIGZAG.tolist()) == list(range(64))
        assert np.array_equal(jpeg.ZIGZAG[jpeg.UNZIGZAG], np.arange(64))

    def test_dc_luma_code_lengths_match_annex_k(self):
        # published canonical lengths for the standard luminance DC
        # table (T.81 K.3.1): categories 0..11
        codes = jpeg._canonical_codes(jpeg.DC_LUMA_BITS, jpeg.DC_LUMA_VALS)
        lengths = [codes[cat][1] for cat in range(12)]
        assert lengths == [2, 3, 3, 3, 3, 3, 4, 5, 6, 7, 8, 9]
        assert codes[0][0] == 0b00  # category 0 is code '00'

    def test_quality_table_endpoints(self):
        ql50, _ = jpeg._quality_tables(50)
        assert np.array_equal(ql50, jpeg.QTBL_LUMA)  # scale 100 ⇒ base table
        ql100, _ = jpeg._quality_tables(100)
        assert ql100.max() == 1  # lossless-est quantization


class TestRoundtrip:
    @pytest.mark.parametrize("h,w", [(8, 8), (17, 31), (24, 40), (64, 64)])
    def test_444_high_quality_psnr(self, h, w):
        img = smooth_img(h, w, seed=h * 100 + w)
        out = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=95))
        assert out.shape == img.shape
        assert codecs.psnr(img, out) >= 38.0

    def test_420_roundtrip(self):
        img = smooth_img(33, 49, seed=7)
        out = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=90, subsampling="420"))
        assert out.shape == img.shape
        # chroma is quarter-rate: bound is luma-dominated but looser
        assert codecs.psnr(img, out) >= 26.0

    def test_uniform_gray_exact(self):
        u = np.full((16, 24, 3), 128, np.uint8)
        out = jpeg.decode_jpeg(jpeg.encode_jpeg(u, quality=50))
        assert int(np.abs(out.astype(int) - 128).max()) == 0

    def test_grayscale_single_component(self):
        g = smooth_img(32, 32, seed=5)[:, :, 0]
        out = jpeg.decode_jpeg(jpeg.encode_jpeg(g, quality=92))
        assert out.shape == (32, 32, 3)
        assert np.array_equal(out[..., 0], out[..., 1])
        assert codecs.psnr(np.dstack([g] * 3), out) >= 38.0

    def test_restart_intervals(self):
        img = smooth_img(48, 48, seed=9)
        data = jpeg.encode_jpeg(img, quality=85, restart_interval=2)
        assert b"\xff\xd0" in data or b"\xff\xd1" in data  # RST markers present
        out = jpeg.decode_jpeg(data)
        base = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=85))
        assert np.array_equal(out, base)  # restarts change framing, not pixels

    def test_dispatch_and_lossy_registration(self):
        img = smooth_img(16, 16)
        data = codecs.ENCODERS["jpeg"](img)
        assert codecs.decode("jpeg", data).shape == img.shape
        assert "jpeg" in codecs.LOSSY_FMTS

    def test_quality_monotone_in_size_and_psnr(self):
        img = smooth_img(40, 40, seed=11)
        sizes, psnrs = [], []
        for q in (30, 60, 90):
            d = jpeg.encode_jpeg(img, quality=q)
            sizes.append(len(d))
            psnrs.append(codecs.psnr(img, jpeg.decode_jpeg(d)))
        assert sizes == sorted(sizes) and psnrs == sorted(psnrs)


class TestUnsupportedAndMalformed:
    def test_sequential_masquerading_as_progressive_rejected(self):
        # a baseline stream relabeled SOF2 carries an Ss=0/Se=63 scan —
        # illegal in progressive (DC scans need Se=0) → clean reject
        data = bytearray(jpeg.encode_jpeg(smooth_img(16, 16)))
        i = data.find(b"\xff\xc0")
        data[i + 1] = 0xC2  # masquerade as progressive
        with pytest.raises(codecs.DecodeError, match="progressive scan header"):
            jpeg.decode_jpeg(bytes(data))

    def test_lossless_sof_rejected_cleanly(self):
        data = bytearray(jpeg.encode_jpeg(smooth_img(16, 16)))
        i = data.find(b"\xff\xc0")
        data[i + 1] = 0xC3  # lossless sequential
        with pytest.raises(codecs.DecodeError, match="unsupported"):
            jpeg.decode_jpeg(bytes(data))

    def test_missing_soi(self):
        with pytest.raises(codecs.DecodeError):
            jpeg.decode_jpeg(b"\x00\x01\x02")

    def test_truncations_contained(self):
        data = jpeg.encode_jpeg(smooth_img(24, 24))
        for cut in range(0, len(data), max(len(data) // 37, 1)):
            try:
                codecs.decode("jpeg", data[:cut])
            except codecs.DecodeError:
                pass


# --- interop with the JVM's independent JPEG implementation -----------------


def _imageio_decode(spark, data: bytes) -> np.ndarray:
    jvm = spark._jvm
    bis = jvm.java.io.ByteArrayInputStream(bytearray(data))
    img = jvm.javax.imageio.ImageIO.read(bis)
    assert img is not None, "javax.imageio could not parse our stream"
    w, h = img.getWidth(), img.getHeight()
    rgb = img.getRGB(0, 0, w, h, None, 0, w)  # int[] ARGB
    a = np.array(rgb, dtype=np.int64).reshape(h, w)
    return np.dstack(
        [(a >> 16) & 0xFF, (a >> 8) & 0xFF, a & 0xFF]
    ).astype(np.uint8)


def _imageio_encode(
    spark, img: np.ndarray, quality: float = 0.9, progressive: bool = False
) -> bytes:
    jvm = spark._jvm
    h, w = img.shape[:2]
    bi = jvm.java.awt.image.BufferedImage(w, h, 1)  # TYPE_INT_RGB
    gateway = spark.sparkContext._gateway
    arr = gateway.new_array(jvm.int, h * w)
    flat = (
        (img[..., 0].astype(np.int64) << 16)
        | (img[..., 1].astype(np.int64) << 8)
        | img[..., 2].astype(np.int64)
    ).reshape(-1)
    for i, v in enumerate(flat.tolist()):
        arr[i] = int(v)
    bi.setRGB(0, 0, w, h, arr, 0, w)
    writer = jvm.javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    params = writer.getDefaultWriteParam()
    params.setCompressionMode(2)  # MODE_EXPLICIT
    params.setCompressionQuality(float(quality))
    if progressive:
        params.setProgressiveMode(1)  # MODE_DEFAULT: writer's scan script
    bos = jvm.java.io.ByteArrayOutputStream()
    writer.setOutput(jvm.javax.imageio.ImageIO.createImageOutputStream(bos))
    writer.write(None, jvm.javax.imageio.IIOImage(bi, None, None), params)
    writer.dispose()
    return bytes(bos.toByteArray())


class TestInteropWithImageIO:
    """Two independent implementations agreeing is the real conformance
    evidence (no libjpeg/Pillow in the container — but the Spark JVM
    carries javax.imageio's JPEG codec)."""

    def test_our_stream_decodes_in_imageio(self, spark):
        img = smooth_img(40, 56, seed=21)
        for sub, agree_floor in [("444", 40.0), ("420", 29.0)]:
            # 444: decoders differ only by IDCT rounding → near-identical.
            # 420: chroma upsampling FILTER is decoder's choice (T.81
            # leaves it open) — we use nearest, ImageIO uses triangle —
            # so agreement is looser there by design, not by bug.
            data = jpeg.encode_jpeg(img, quality=92, subsampling=sub)
            theirs = _imageio_decode(spark, data)
            assert theirs.shape == img.shape
            ours = jpeg.decode_jpeg(data)
            assert codecs.psnr(ours, theirs) >= agree_floor
            # and both recover the original scene
            floor = 35.0 if sub == "444" else 26.0
            assert codecs.psnr(img, theirs) >= floor

    def test_imageio_stream_decodes_in_ours(self, spark):
        img = smooth_img(32, 48, seed=22)
        data = _imageio_encode(spark, img, quality=0.92)
        ours = jpeg.decode_jpeg(data)
        theirs = _imageio_decode(spark, data)
        assert ours.shape == img.shape
        # ImageIO may emit subsampled chroma → upsample-filter gap (see
        # test_our_stream_decodes_in_imageio); 29 dB still rules out any
        # entropy/DCT-level disagreement
        assert codecs.psnr(ours, theirs) >= 29.0
        assert codecs.psnr(img, ours) >= 26.0

    def test_jpeg_rows_flow_through_full_image_suite(self, spark):
        """fmt='jpeg' payloads are first-class in the validation suite:
        a clean jpeg of the reference render passes the PSNR≥40 decode
        check; a re-encode of DIFFERENT pixels fails it with a psnr
        violation row (not a crash)."""
        from sinter_spark.images import fmt_dim, validate_images_full
        from sinter_spark.images.synth import (
            expected_caption,
            phash64,
            render_reference,
        )

        def row(image_id, tamper=False):
            px = render_reference(image_id, 48, 40)
            ph = phash64(px)
            payload_px = 255 - px if tamper else px  # inverted scene
            return {
                "image_id": image_id,
                # q98 carries ≥40 dB on the sharp synthetic renders (q95
                # measures ~36 dB there — the suite contract correctly
                # REJECTS payloads encoded below the fidelity floor)
                "bytes": jpeg.encode_jpeg(payload_px, quality=98),
                "w": 48, "h": 40, "fmt": "jpeg",
                "caption": expected_caption(image_id),
                "phash": ph,
            }

        import pandas as pd

        df = spark.createDataFrame(
            pd.DataFrame([row("11111111-1111-4111-8111-111111111111"),
                          row("22222222-2222-4222-8222-222222222222", tamper=True)]),
            "image_id string, bytes binary, w int, h int, fmt string, caption string, phash long",
        )
        res = validate_images_full(df, fmt_dim(spark))
        viols = res.violations.collect()
        bad_rows = {v["row_key"] for v in viols}
        assert "11111111-1111-4111-8111-111111111111" not in bad_rows
        codes = {v["code"] for v in viols if v["row_key"].startswith("2222")}
        assert "psnr" in codes or "pixel_mismatch" in codes

    def test_restart_interval_stream_interop(self, spark):
        img = smooth_img(48, 32, seed=23)
        data = jpeg.encode_jpeg(img, quality=88, restart_interval=2)
        theirs = _imageio_decode(spark, data)
        assert codecs.psnr(jpeg.decode_jpeg(data), theirs) >= 40.0


# --- progressive (SOF2) decode — round-4 coverage item --------------------


class TestProgressive:
    """Progressive streams come from the JVM's INDEPENDENT encoder
    (javax.imageio progressive mode writes a real multi-scan SOF2
    script with successive approximation), so agreement here validates
    the T.81 §G.1.2 decode paths against a second implementation."""

    def test_imageio_progressive_color_decodes(self, spark):
        img = smooth_img(40, 56, seed=31)
        data = _imageio_encode(spark, img, quality=0.92, progressive=True)
        assert b"\xff\xc2" in data[:200]  # really SOF2
        ours = jpeg.decode_jpeg(data)
        theirs = _imageio_decode(spark, data)
        assert ours.shape == img.shape
        # chroma upsample FILTER is decoder's choice (nearest vs
        # triangle) — same looser floor as the baseline 420 interop
        assert codecs.psnr(ours, theirs) >= 29.0
        assert codecs.psnr(img, ours) >= 26.0

    def test_imageio_progressive_gray_near_exact(self, spark):
        g = smooth_img(32, 32, seed=5)[:, :, 0]
        data = _imageio_encode(spark, np.dstack([g, g, g]), quality=0.92, progressive=True)
        ours = jpeg.decode_jpeg(data)
        theirs = _imageio_decode(spark, data)
        # single-luma-dominated scene, no upsample ambiguity: the two
        # decoders should agree to IDCT rounding
        assert codecs.psnr(ours, theirs) >= 50.0

    def test_progressive_equals_baseline_scene(self, spark):
        """Progressive and baseline encodings of the SAME image must
        decode to (nearly) the same pixels — the multi-scan
        coefficient accumulation reconstructs the full-precision
        spectrum, not a preview."""
        img = smooth_img(48, 48, seed=33)
        prog = jpeg.decode_jpeg(_imageio_encode(spark, img, 0.95, progressive=True))
        base = jpeg.decode_jpeg(_imageio_encode(spark, img, 0.95, progressive=False))
        assert codecs.psnr(prog, base) >= 30.0

    def test_progressive_truncations_contained(self, spark):
        data = _imageio_encode(spark, smooth_img(24, 24, seed=34), 0.9, progressive=True)
        for cut in range(0, len(data), max(len(data) // 53, 1)):
            try:
                jpeg.decode_jpeg(data[:cut])
            except codecs.DecodeError:
                pass

    def test_progressive_bitflips_contained(self, spark):
        data = bytearray(_imageio_encode(spark, smooth_img(24, 24, seed=35), 0.9, progressive=True))
        rng = np.random.default_rng(9)
        for _ in range(60):
            mut = bytearray(data)
            i = int(rng.integers(2, len(mut)))
            mut[i] ^= 1 << int(rng.integers(0, 8))
            try:
                out = jpeg.decode_jpeg(bytes(mut))
                assert out.dtype == np.uint8 and out.ndim == 3
            except codecs.DecodeError:
                pass


class TestCKernelDifferential:
    """The optional C entropy kernel must be bit-identical to the
    pure-Python loop on every stream shape (it shares LUT packing and
    exhaustion contract by construction — this pins it)."""

    @pytest.fixture()
    def c_available(self):
        from sinter_spark.images import _jpegc

        if not _jpegc.available():
            pytest.skip("no C compiler in this environment")

    def _both(self, data, monkeypatch):
        out_c = jpeg.decode_jpeg(data)
        monkeypatch.setenv("SINTER_JPEG_NO_C", "1")
        out_py = jpeg.decode_jpeg(data)
        monkeypatch.delenv("SINTER_JPEG_NO_C")
        return out_c, out_py

    @pytest.mark.parametrize(
        "kwargs",
        [
            {"quality": 88},
            {"quality": 88, "subsampling": "420"},
            {"quality": 30},
            {"quality": 95, "restart_interval": 2},
        ],
    )
    def test_sequential_identical(self, c_available, monkeypatch, kwargs):
        img = smooth_img(41, 53, seed=sum(map(ord, str(kwargs))))
        out_c, out_py = self._both(jpeg.encode_jpeg(img, **kwargs), monkeypatch)
        assert np.array_equal(out_c, out_py)

    def test_gray_identical(self, c_available, monkeypatch):
        g = smooth_img(32, 24, seed=40)[:, :, 0]
        out_c, out_py = self._both(jpeg.encode_jpeg(g, quality=85), monkeypatch)
        assert np.array_equal(out_c, out_py)

    def test_progressive_identical(self, c_available, monkeypatch, spark):
        data = _imageio_encode(spark, smooth_img(40, 40, seed=41), 0.9, progressive=True)
        out_c, out_py = self._both(data, monkeypatch)
        assert np.array_equal(out_c, out_py)

    def test_truncation_errors_identical(self, c_available, monkeypatch):
        data = jpeg.encode_jpeg(smooth_img(32, 32, seed=42), quality=90)
        for cut in range(len(data) - 200, len(data), 7):
            res_c = res_py = err_c = err_py = None
            try:
                res_c = jpeg.decode_jpeg(data[:cut])
            except codecs.DecodeError as e:
                err_c = str(e)
            monkeypatch.setenv("SINTER_JPEG_NO_C", "1")
            try:
                res_py = jpeg.decode_jpeg(data[:cut])
            except codecs.DecodeError as e:
                err_py = str(e)
            monkeypatch.delenv("SINTER_JPEG_NO_C")
            assert (err_c is None) == (err_py is None)
            if res_c is not None:
                assert np.array_equal(res_c, res_py)


class TestProgressiveEncoder:
    """Our own SOF2 writer (spectral-selection scan script): identical
    pixels to baseline (same quantized coefficients), and — decisively
    — decodable by the JVM's independent ImageIO decoder."""

    @pytest.mark.parametrize("sub", ["444", "420"])
    def test_progressive_equals_baseline_pixels(self, sub):
        img = smooth_img(41, 53, seed=61)
        prog = jpeg.encode_jpeg(img, quality=90, subsampling=sub, progressive=True)
        base = jpeg.encode_jpeg(img, quality=90, subsampling=sub)
        assert b"\xff\xc2" in prog[:200] and b"\xff\xc0" in base[:200]
        assert np.array_equal(jpeg.decode_jpeg(prog), jpeg.decode_jpeg(base))

    def test_progressive_gray(self):
        g = smooth_img(24, 40, seed=62)[:, :, 0]
        prog = jpeg.encode_jpeg(g, quality=90, progressive=True)
        assert np.array_equal(
            jpeg.decode_jpeg(prog), jpeg.decode_jpeg(jpeg.encode_jpeg(g, quality=90))
        )

    def test_progressive_restart_rejected(self):
        with pytest.raises(ValueError, match="restart"):
            jpeg.encode_jpeg(smooth_img(16, 16), progressive=True, restart_interval=2)

    def test_our_progressive_decodes_in_imageio(self, spark):
        img = smooth_img(40, 48, seed=63)
        data = jpeg.encode_jpeg(img, quality=92, progressive=True)
        theirs = _imageio_decode(spark, data)
        assert theirs.shape == img.shape
        ours = jpeg.decode_jpeg(data)
        assert codecs.psnr(ours, theirs) >= 40.0  # 444: IDCT rounding only
        assert codecs.psnr(img, theirs) >= 35.0

    def test_pjpeg_fmt_registered(self):
        img = smooth_img(20, 28, seed=64)
        data = codecs.ENCODERS["pjpeg"](img)
        assert b"\xff\xc2" in data[:200]
        out = codecs.decode("pjpeg", data)
        assert out.shape == img.shape
        assert "pjpeg" in codecs.LOSSY_FMTS

    def test_pjpeg_truncations_contained(self):
        data = jpeg.encode_jpeg(smooth_img(24, 24, seed=65), quality=88, progressive=True)
        for cut in range(0, len(data), max(len(data) // 41, 1)):
            try:
                codecs.decode("pjpeg", data[:cut])
            except codecs.DecodeError:
                pass


class TestCRefineDifferential:
    """The C refinement kernel (successive-approximation scans) must be
    bit-identical to the pure-Python loop on REAL progressive streams
    — javax.imageio's default scan script is DC-first + spectral
    selection + successive approximation, so most entropy bits flow
    through the refine path."""

    @pytest.fixture()
    def c_available(self):
        from sinter_spark.images import _jpegc

        if not _jpegc.available():
            pytest.skip("no C compiler in this environment")

    @pytest.mark.parametrize("quality,h,w,seed", [
        (0.9, 64, 80, 5),
        (0.5, 41, 53, 6),    # low quality → dense EOB runs
        (0.97, 96, 64, 7),   # high quality → dense correction bits
    ])
    def test_javax_progressive_identical(self, c_available, monkeypatch, spark,
                                         quality, h, w, seed):
        img = smooth_img(h, w, seed=seed)
        data = _imageio_encode(spark, img, quality=quality, progressive=True)
        out_c = jpeg.decode_jpeg(data)
        monkeypatch.setenv("SINTER_JPEG_NO_C", "1")
        out_py = jpeg.decode_jpeg(data)
        monkeypatch.delenv("SINTER_JPEG_NO_C")
        assert np.array_equal(out_c, out_py)

    def test_truncated_progressive_same_containment(self, c_available,
                                                    monkeypatch, spark):
        # both paths must CONTAIN a truncated refine stream (DecodeError
        # or a decoded array) — and agree on which
        img = smooth_img(48, 48, seed=8)
        data = _imageio_encode(spark, img, quality=0.9, progressive=True)
        cut = data[: int(len(data) * 0.7)]

        def attempt():
            try:
                return ("ok", jpeg.decode_jpeg(cut).tobytes())
            except codecs.DecodeError:
                return ("err", None)

        r_c = attempt()
        monkeypatch.setenv("SINTER_JPEG_NO_C", "1")
        r_py = attempt()
        monkeypatch.delenv("SINTER_JPEG_NO_C")
        assert r_c == r_py


class TestEncoderSuccessiveApproximation:
    """The pjpeg scan script (v4) carries successive approximation —
    so the MEASURED bench mix exercises the refinement decode path,
    not just spectral selection."""

    def _scan_headers(self, data: bytes):
        out, i = [], 2
        while i < len(data) - 1:
            if data[i] != 0xFF:
                i += 1
                continue
            m = data[i + 1]
            if m == 0xDA:
                ln = int.from_bytes(data[i + 2 : i + 4], "big")
                ns = data[i + 4]
                ss, se, ahal = data[i + 3 + 2 * ns + 2 : i + 3 + 2 * ns + 5]
                out.append((ss, se, ahal >> 4, ahal & 15))
                i += 2 + ln
            elif m in (0xD8, 0xD9) or 0xD0 <= m <= 0xD7:
                i += 2
            elif m == 0x00:
                i += 2
            else:
                i += 2 + int.from_bytes(data[i + 2 : i + 4], "big")
        return out

    def test_refinement_scans_present_and_exact(self):
        img = smooth_img(48, 56, seed=31)
        data = jpeg.encode_jpeg(img, quality=88, progressive=True)
        scans = self._scan_headers(data)
        # DC first (Al=1), AC firsts (Al=1), DC refine (Ah=1), AC refines (Ah=1)
        assert (0, 0, 0, 1) in scans
        assert (1, 63, 0, 1) in scans
        assert (0, 0, 1, 0) in scans
        assert (1, 63, 1, 0) in scans
        # exactness: SA reconstruction ≡ baseline decode
        base = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=88))
        assert np.array_equal(base, jpeg.decode_jpeg(data))

    def test_sa_streams_c_equals_python(self, monkeypatch):
        from sinter_spark.images import _jpegc

        if not _jpegc.available():
            pytest.skip("no C compiler")
        img = smooth_img(41, 33, seed=32)
        data = jpeg.encode_jpeg(img, quality=95, subsampling="420", progressive=True)
        out_c = jpeg.decode_jpeg(data)
        monkeypatch.setenv("SINTER_JPEG_NO_C", "1")
        out_py = jpeg.decode_jpeg(data)
        monkeypatch.delenv("SINTER_JPEG_NO_C")
        assert np.array_equal(out_c, out_py)
