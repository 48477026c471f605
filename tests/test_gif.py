"""REAL GIF codec (images/gif.py): LZW + container roundtrips, the
interlace row shuffle, animation compositing, probe, posterize
contract — and conformance pinned against the JVM's independent
``javax.imageio`` GIF codec in BOTH directions (the same strategy
test_jpeg.py uses for the JPEG codec).

Reference parity: the reference validates opaque payloads per declared
format (sinter validator.ex type-check dispatch); `gif` is a first-
class fmt of the image+caption table from round 4 (FIXTURES.md F1 v4).
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sinter_spark.images import codecs
from sinter_spark.images.gif import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
    encode_gif_animation,
    gif_frames,
    posterize_rgb332,
    probe_gif,
)


def _img(h, w, seed=3):
    rng = np.random.default_rng(seed)
    return posterize_rgb332(rng.integers(0, 256, (h, w, 3)).astype(np.uint8))


class TestLZW:
    @given(
        mcs=st.integers(2, 8),
        data=st.binary(min_size=0, max_size=4000),
    )
    @settings(max_examples=60, deadline=None)
    def test_roundtrip_property(self, mcs, data):
        # clamp symbols into the alphabet
        idx = bytes(b % (1 << mcs) for b in data)
        assert _lzw_decode(mcs, _lzw_encode(mcs, idx), len(idx)) == idx

    def test_table_growth_past_every_width_bump(self):
        # 100k symbols over a 4-symbol alphabet crosses every code-width
        # boundary (3..12 bits) and hits the 4096-entry cap
        idx = (np.arange(100_000) % 4).astype(np.uint8).tobytes()
        assert _lzw_decode(2, _lzw_encode(2, idx), 100_000) == idx

    def test_bad_min_code_size(self):
        with pytest.raises(codecs.DecodeError):
            _lzw_decode(1, b"\x00", 1)
        with pytest.raises(codecs.DecodeError):
            _lzw_decode(9, b"\x00", 1)


class TestStillRoundtrip:
    @pytest.mark.parametrize("h,w", [(1, 1), (7, 5), (33, 47), (64, 64)])
    def test_lossless_on_posterized(self, h, w):
        img = _img(h, w)
        data = encode_gif(img)
        assert (decode_gif(data) == img).all()
        p = probe_gif(data)
        assert (p["w"], p["h"], p["n_frames"], p["animated"]) == (w, h, 1, False)

    def test_interlaced_roundtrip(self):
        img = _img(37, 23)
        data = encode_gif(img, interlace=True)
        assert (decode_gif(data) == img).all()
        # interlaced and sequential streams decode identically
        assert (decode_gif(encode_gif(img)) == decode_gif(data)).all()

    def test_tiny_palette(self):
        img = np.zeros((10, 10, 3), np.uint8)
        img[5:] = [255, 0, 0]
        assert (decode_gif(encode_gif(img)) == img).all()

    def test_gray_uniform(self):
        img = np.full((9, 9, 3), 128, np.uint8)
        assert (decode_gif(encode_gif(img)) == img).all()

    def test_registry_dispatch_and_lossless_classification(self):
        img = _img(12, 12)
        data = codecs.ENCODERS["gif"](img)
        assert (codecs.decode("gif", data) == img).all()
        assert "gif" not in codecs.LOSSY_FMTS  # palette format: lossless

    def test_encoder_posterize_contract(self):
        rng = np.random.default_rng(1)
        truecolor = rng.integers(0, 256, (40, 40, 3)).astype(np.uint8)
        with pytest.raises(ValueError, match="256"):
            encode_gif(truecolor)
        # registry encoder posterizes on behalf of truecolor callers
        out = codecs.decode("gif", codecs.ENCODERS["gif"](truecolor))
        assert (out == posterize_rgb332(truecolor)).all()

    def test_posterize_caps_colors_and_is_idempotent(self):
        rng = np.random.default_rng(2)
        a = rng.integers(0, 256, (64, 64, 3)).astype(np.uint8)
        p = posterize_rgb332(a)
        packed = (
            (p[..., 0].astype(np.uint32) << 16)
            | (p[..., 1].astype(np.uint32) << 8)
            | p[..., 2]
        )
        assert len(np.unique(packed)) <= 256
        assert (posterize_rgb332(p) == p).all()
        # midpoint quantization: bounded error, never biased past a cell
        assert np.abs(p.astype(int) - a.astype(int)).max() <= 32


class TestAnimation:
    def test_frames_roundtrip_with_delays(self):
        rng = np.random.default_rng(5)
        frames = posterize_rgb332(
            rng.integers(0, 256, (6, 18, 13, 3)).astype(np.uint8)
        )
        data = encode_gif_animation(frames, delay_cs=9, loop=2)
        got = gif_frames(data)
        assert len(got) == 6
        for k, (px, delay) in enumerate(got):
            assert (px == frames[k]).all()
            assert delay == 9
        p = probe_gif(data)
        assert p["n_frames"] == 6 and p["animated"]
        assert p["duration_cs"] == 54

    def test_first_frame_is_still_decode(self):
        rng = np.random.default_rng(6)
        frames = posterize_rgb332(
            rng.integers(0, 256, (3, 10, 10, 3)).astype(np.uint8)
        )
        data = encode_gif_animation(frames)
        assert (decode_gif(data) == frames[0]).all()

    def test_disposal_restore_background(self):
        """A frame with disposal=2 must be wiped to the background
        before the next frame composites (hand-built stream)."""
        img = np.full((4, 4, 3), 0, np.uint8)
        img[0, 0] = [255, 255, 255]
        data = bytearray(encode_gif_animation(np.stack([img, img])))
        # flip both GCE disposal fields from 1 (leave) to 2 (restore bg)
        i = data.find(b"\x21\xf9")
        while i != -1:
            data[i + 3] = (data[i + 3] & ~0x1C) | (2 << 2)
            i = data.find(b"\x21\xf9", i + 2)
        got = gif_frames(bytes(data))
        assert len(got) == 2
        assert (got[0][0] == img).all() and (got[1][0] == img).all()

    def test_transparency_shows_previous_frame(self):
        """Hand-set transparent index: pixels carrying it must keep the
        previous canvas content."""
        a = np.zeros((2, 2, 3), np.uint8)
        a[..., 0] = 200            # solid red-ish frame
        b = np.zeros((2, 2, 3), np.uint8)
        b[0, 0] = [200, 0, 0]      # shares color 0 with frame a
        data = bytearray(encode_gif_animation(np.stack([a, b])))
        # find palette index of black (0,0,0) == the index of b's other
        # pixels; mark it transparent in the SECOND GCE only
        first = data.find(b"\x21\xf9")
        second = data.find(b"\x21\xf9", first + 2)
        # black sorts first in the packed-color palette → index 0
        data[second + 3] |= 0x01   # transparency flag
        data[second + 6] = 0       # transparent index = 0 (black)
        got = gif_frames(bytes(data))
        # frame b's black pixels are transparent → previous frame (all
        # red) shows through; its red pixel draws normally
        assert (got[1][0] == a).all()


class TestMalformed:
    def test_bad_signature(self):
        with pytest.raises(codecs.DecodeError):
            decode_gif(b"NOTGIF" + b"\x00" * 20)

    def test_truncated_header(self):
        with pytest.raises(codecs.DecodeError):
            decode_gif(b"GIF89a\x01\x00")

    def test_zero_dims_rejected(self):
        data = bytearray(encode_gif(_img(4, 4)))
        data[6:8] = b"\x00\x00"   # screen width = 0
        with pytest.raises(codecs.DecodeError):
            decode_gif(bytes(data))

    def test_missing_trailer(self):
        data = encode_gif(_img(6, 6))
        with pytest.raises(codecs.DecodeError):
            probe_gif(data[:-1] if data[-1] == 0x3B else data)

    def test_pixel_index_beyond_palette(self):
        # 2-color image → palette size 2; corrupt LZW to reference
        # index 3: decoder must flag, not read out of bounds
        img = np.zeros((4, 4, 3), np.uint8)
        img[2:] = 255
        data = encode_gif(img)
        with pytest.raises(codecs.DecodeError):
            # truncate mid-LZW so underrun or range check trips
            decode_gif(data[: len(data) - 6] + b"\x00\x3b")


def _imageio_decode(spark, data: bytes) -> np.ndarray:
    jvm = spark._jvm
    bis = jvm.java.io.ByteArrayInputStream(bytearray(data))
    img = jvm.javax.imageio.ImageIO.read(bis)
    assert img is not None, "javax.imageio could not parse our stream"
    w, h = img.getWidth(), img.getHeight()
    rgb = img.getRGB(0, 0, w, h, None, 0, w)
    a = np.array(rgb, dtype=np.int64).reshape(h, w)
    return np.dstack(
        [(a >> 16) & 0xFF, (a >> 8) & 0xFF, a & 0xFF]
    ).astype(np.uint8)


class TestInteropWithImageIO:
    """Our GIF stream ↔ the JVM's independent codec, pixel-exact (GIF
    is lossless, so unlike JPEG the agreement bar is equality)."""

    def test_our_stream_decodes_in_imageio(self, spark):
        img = _img(48, 37, seed=11)
        assert (_imageio_decode(spark, encode_gif(img)) == img).all()

    def test_our_interlaced_stream_decodes_in_imageio(self, spark):
        img = _img(29, 31, seed=12)
        data = encode_gif(img, interlace=True)
        assert (_imageio_decode(spark, data) == img).all()

    def test_imageio_stream_decodes_in_ours(self, spark):
        """Java-encoded GIF (TYPE_BYTE_INDEXED → ImageIO.write) must
        decode in our codec exactly as in Java's own reader."""
        jvm = spark._jvm
        gateway = spark.sparkContext._gateway
        rng = np.random.default_rng(13)
        h, w = 41, 53
        src = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        bi = jvm.java.awt.image.BufferedImage(w, h, 13)  # TYPE_BYTE_INDEXED
        arr = gateway.new_array(jvm.int, h * w)
        flat = (
            (src[..., 0].astype(np.int64) << 16)
            | (src[..., 1].astype(np.int64) << 8)
            | src[..., 2].astype(np.int64)
        ).reshape(-1)
        for i, v in enumerate(flat.tolist()):
            arr[i] = int(v)
        bi.setRGB(0, 0, w, h, arr, 0, w)
        bos = jvm.java.io.ByteArrayOutputStream()
        assert jvm.javax.imageio.ImageIO.write(bi, "gif", bos)
        data = bytes(bos.toByteArray())
        ours = decode_gif(data)
        theirs = _imageio_decode(spark, data)
        assert ours.shape == theirs.shape == (h, w, 3)
        assert (ours == theirs).all()

    def test_our_animation_frames_match_imageio(self, spark):
        jvm = spark._jvm
        rng = np.random.default_rng(14)
        frames = posterize_rgb332(
            rng.integers(0, 256, (4, 20, 15, 3)).astype(np.uint8)
        )
        data = encode_gif_animation(frames, delay_cs=5)
        iis = jvm.javax.imageio.ImageIO.createImageInputStream(
            jvm.java.io.ByteArrayInputStream(bytearray(data))
        )
        reader = jvm.javax.imageio.ImageIO.getImageReaders(iis).next()
        reader.setInput(iis)
        assert reader.getNumImages(True) == 4
        for k in range(4):
            im = reader.read(k)
            ww, hh = im.getWidth(), im.getHeight()
            rgb = np.array(
                im.getRGB(0, 0, ww, hh, None, 0, ww), dtype=np.int64
            ).reshape(hh, ww)
            px = np.dstack(
                [(rgb >> 16) & 0xFF, (rgb >> 8) & 0xFF, rgb & 0xFF]
            ).astype(np.uint8)
            assert (px == frames[k]).all()
        reader.dispose()


class TestSuiteIntegration:
    def test_gif_rows_flow_through_full_image_suite(self, spark):
        """Clean gif rows pass (posterized reference ≡ decoded pixels,
        phash from posterized pixels); tampered gif payloads yield
        decode violations — the fmt is first-class in the suite."""
        from sinter_spark.images import fmt_dim, validate_images_full
        from sinter_spark.images.synth import (
            IMAGE_DDL,
            expected_caption,
            phash64,
            render_reference,
            uuid_for,
        )

        rows = []
        for i in range(8):
            iid = uuid_for(77, i)
            px = posterize_rgb332(render_reference(iid, 20, 16))
            data = encode_gif(px)
            if i == 7:   # corrupt one payload mid-stream
                b = bytearray(data)
                for j in range(len(b) // 2, min(len(b) // 2 + 8, len(b))):
                    b[j] ^= 0xFF
                data = bytes(b)
            rows.append(
                (iid, data, 20, 16, "gif", expected_caption(iid), phash64(px))
            )
        df = spark.createDataFrame(rows, IMAGE_DDL)
        res = validate_images_full(df, fmt_dim(spark))
        viols = res.violations.collect()
        flagged = {v["row_key"] for v in viols}
        assert uuid_for(77, 7) in flagged          # corrupt payload caught
        assert flagged == {uuid_for(77, 7)}        # clean gif rows all pass
        assert all(v["code"] == "decode" for v in viols)
