"""Image codecs, deterministic synthesis, decode kernel, full suite."""

import numpy as np
import pytest

from sinter_spark.images import codecs, synth
from sinter_spark.images.kernel import decode_violations
from sinter_spark.images.suite import baseline_histograms, image_schema, validate_images_full


def rand_img(seed=0, h=24, w=31):
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.integers(0, 256, (h, w, 3)).astype(np.uint8)


class TestCodecs:
    def test_raw_roundtrip(self):
        img = rand_img()
        assert np.array_equal(codecs.decode_raw(codecs.encode_raw(img)), img)

    def test_png_roundtrip_lossless(self):
        img = rand_img(1)
        out = codecs.decode_png(codecs.encode_png(img))
        assert np.array_equal(out, img)

    def test_png_signature_and_crc(self):
        data = codecs.encode_png(rand_img(2))
        assert data[:8] == b"\x89PNG\r\n\x1a\n"
        corrupted = bytearray(data)
        corrupted[50] ^= 0xFF
        with pytest.raises(codecs.DecodeError):
            codecs.decode_png(bytes(corrupted))

    def test_qjpg_lossy_psnr_above_gate(self):
        img = rand_img(3, 64, 64)
        out = codecs.decode_qjpg(codecs.encode_qjpg(img))
        p = codecs.psnr(out, img)
        assert 40.0 <= p < 60.0  # lossy but above the 40 dB gate
        assert not np.array_equal(out, img)

    def test_decode_dispatch_unknown_fmt(self):
        with pytest.raises(codecs.DecodeError):
            codecs.decode("webp", b"xxxx")

    def test_psnr_identical_inf(self):
        img = rand_img(4)
        assert codecs.psnr(img, img) == float("inf")


class TestSynth:
    def test_row_determinism(self):
        a = synth.make_row(42, 7)
        b = synth.make_row(42, 7)
        assert a["image_id"] == b["image_id"]
        assert a["bytes"] == b["bytes"]
        assert a["phash"] == b["phash"]
        assert a["caption"] == b["caption"]

    def test_render_matches_encoding(self):
        row = synth.make_row(42, 3)
        pixels = codecs.decode(row["fmt"], row["bytes"])
        ref = synth.render_reference(row["image_id"], pixels.shape[1], pixels.shape[0])
        if row["fmt"] in codecs.LOSSY_FMTS:
            assert codecs.psnr(pixels, ref) >= 40.0
        else:
            assert np.array_equal(pixels, ref)

    def test_caption_recomputable(self):
        row = synth.make_row(42, 11)
        assert row["caption"] == synth.expected_caption(row["image_id"])

    def test_generate_distributed(self, spark):
        df = synth.generate_images(spark, 200, seed=42, max_dim=32, partitions=4)
        assert df.count() == 200
        assert df.columns == ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
        # partitioning-independent: same rows at different parallelism
        df2 = synth.generate_images(spark, 200, seed=42, max_dim=32, partitions=2)
        a = {r["image_id"] for r in df.select("image_id").collect()}
        b = {r["image_id"] for r in df2.select("image_id").collect()}
        assert a == b

    def test_fmt_skew(self, spark):
        df = synth.generate_images(spark, 2000, seed=42, max_dim=24, partitions=4)
        counts = dict(df.groupBy("fmt").count().collect())
        assert counts.get("raw", 0) > counts.get("png", 0) > counts.get("qjpg", 0)


@pytest.fixture(scope="module")
def img_df(spark):
    return synth.generate_images(spark, 3000, seed=42, max_dim=32, partitions=4).cache()


class TestDecodeKernel:
    def test_corruption_detected(self, spark, img_df):
        v = decode_violations(img_df).cache()
        codes = {r["code"] for r in v.select("code").distinct().collect()}
        # corrupted payloads → decode; qjpg corruption may instead land
        # as psnr; unknown fmt rows → decode
        assert "decode" in codes
        # every violation row has the reference error shape
        assert v.columns == ["row_key", "path", "code", "message", "context"]

    def test_clean_subset_passes(self, spark):
        # regenerate tiny table and keep only rows that synth did not
        # corrupt: re-encode check via make_row determinism
        rows = [synth.make_row(7, i, 32) for i in range(50)]
        import pandas as pd

        clean = [r for r in rows if r["image_id"] and r["fmt"] in codecs.ENCODERS and r["caption"]]
        df = spark.createDataFrame(pd.DataFrame(clean), synth.IMAGE_DDL)
        v = decode_violations(df)
        # none of these were corrupted (rates make 50 clean rows likely);
        # any violation here would be a kernel bug
        bad = [r for r in v.collect() if r["code"] in ("psnr", "caption_mismatch")]
        assert bad == []

    def test_phash_integrity(self, spark):
        # rows ingested as tuples: a pandas detour would turn the int64
        # phash into float64 and corrupt values above 2^53
        import numpy as np

        def draws(i):
            rng = np.random.Generator(
                np.random.PCG64(int.from_bytes(synth._digest("row", "11", str(i))[:8], "big"))
            )
            return {k: rng.random() for k in synth.RATES}

        clean = [
            r for i in range(30)
            for r in [synth.make_row(11, i, 32)]
            if r["image_id"] and r["fmt"] in codecs.ENCODERS and r["caption"]
            and not any(draws(i)[k] < synth.RATES[k] for k in synth.RATES)
        ]
        assert len(clean) >= 10
        tampered_id = clean[3]["image_id"]
        clean[3]["phash"] ^= 1 << 62          # flip one high bit
        clean[5]["phash"] = None              # null → check skipped
        cols = ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
        df = spark.createDataFrame([tuple(r[c] for c in cols) for r in clean], synth.IMAGE_DDL)
        got = {r["row_key"] for r in decode_violations(df).where("code = 'phash_mismatch'").collect()}
        assert got == {tampered_id}


class TestFullSuite:
    def test_full_suite_catches_every_violation_kind(self, spark, img_df):
        res = validate_images_full(img_df, synth.fmt_dim(spark))
        by_code = {r["code"]: r["count"] for r in res.violations.groupBy("code").count().collect()}
        # schema pass
        assert by_code.get("format", 0) > 0        # malformed uuid
        assert by_code.get("choices", 0) > 0       # unknown fmt
        assert by_code.get("min_length", 0) > 0    # empty caption
        # decode kernel
        assert by_code.get("decode", 0) > 0        # corrupted payloads
        # uniqueness
        assert by_code.get("unique", 0) > 0        # duplicated image_id/phash
        # referential
        assert by_code.get("referential", 0) > 0   # fmt='webp' orphans
        # caption equality: empty captions mismatch the reference
        assert by_code.get("caption_mismatch", 0) > 0
        # phash integrity: tampered fingerprints (v3 injection)
        assert by_code.get("phash_mismatch", 0) > 0

    def test_verdicts_cover_all_rows(self, spark, img_df):
        res = validate_images_full(img_df, synth.fmt_dim(spark), decode=False)
        total = sum(r["rows"] for r in res.verdicts.collect())
        assert total == 3000

    def test_drift_self_comparison_passes(self, spark, img_df):
        ranges = {"w": (0, 512), "h": (0, 512), "caption_len": (0, 128)}
        base = baseline_histograms(img_df, hist_ranges=ranges)
        res = validate_images_full(
            img_df, synth.fmt_dim(spark), baseline_hists=base, decode=False,
            hist_ranges=ranges,
        )
        assert res.drift and all(d["ks_pass"] and d["psi_pass"] for d in res.drift)

    def test_drift_detects_shift(self, spark, img_df):
        from pyspark.sql import functions as F

        ranges = {"w": (0, 512), "h": (0, 512), "caption_len": (0, 128)}
        base = baseline_histograms(img_df, hist_ranges=ranges)
        shifted = img_df.withColumn("w", (F.col("w") * 4).cast("int"))
        res = validate_images_full(
            shifted, synth.fmt_dim(spark), baseline_hists=base, decode=False,
            hist_ranges=ranges,
        )
        w_report = [d for d in res.drift if d["column"] == "w"][0]
        assert not (w_report["ks_pass"] and w_report["psi_pass"])
        assert res.violations.where("code = 'drift'").count() >= 1
