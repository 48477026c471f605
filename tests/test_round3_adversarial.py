"""Adversarial hardening for the round-3 operators: massive score ties
at the top-k boundary (the case the batched-ANN pruning slack must
never lose), duplicated vectors through IVF, and property-based JPEG
roundtrip on arbitrary (non-smooth) content."""

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from sinter_spark.images import codecs, jpeg


class TestBatchTopkTies:
    def test_arrow_equals_column_under_massive_ties(self, spark):
        """Vectors drawn from a tiny discrete set → many EXACT cos_sim
        ties straddling the k boundary across partitions; the per-batch
        pruning must keep every tie candidate the column/oracle path
        would rank in."""
        from sinter_spark.operators.similarity import cosine_topk_batch

        rng = np.random.default_rng(42)
        protos = rng.standard_normal((4, 6))  # only 4 distinct directions
        rows = [
            (i, (protos[i % 4] * float(1 + (i % 3))).tolist())  # scaled dups
            for i in range(120)
        ]
        emb = spark.createDataFrame(
            rows, "vec_id bigint, embedding array<double>"
        ).repartition(10)
        qs = (
            emb.orderBy("vec_id")
            .limit(4)
            .select(F.col("vec_id").alias("query_id"), "embedding")
        )
        key = lambda r: (r["query_id"], r["vec_id"])  # noqa: E731
        a = sorted(
            cosine_topk_batch(emb, qs, k=9, round_to=5, impl="arrow").collect(),
            key=key,
        )
        c = sorted(
            cosine_topk_batch(emb, qs, k=9, round_to=5, impl="column").collect(),
            key=key,
        )
        assert [tuple(r) for r in a] == [tuple(r) for r in c]
        assert len(a) == 4 * 9

    def test_ivf_batch_with_duplicate_vectors(self, spark):
        from sinter_spark.operators import ivf

        rng = np.random.default_rng(5)
        protos = rng.standard_normal((6, 8))
        rows = [(i, protos[i % 6].tolist()) for i in range(90)]
        emb = spark.createDataFrame(
            rows, "vec_id bigint, embedding array<double>"
        ).repartition(7)
        cents = ivf.train_centroids(emb, n_clusters=4, sample_size=90, seed=3)
        qrows = emb.orderBy("vec_id").limit(3).collect()
        qs = spark.createDataFrame(
            [(r["vec_id"], list(r["embedding"])) for r in qrows],
            "query_id bigint, embedding array<double>",
        )
        got = {
            (r["query_id"], r["vec_id"], r["cos_sim"])
            for r in ivf.ivf_topk_batch(
                emb, cents, qs, k=6, n_probe=2, round_to=5
            ).collect()
        }
        want = set()
        for r in qrows:
            one = ivf.ivf_topk(
                emb, cents, [float(x) for x in r["embedding"]],
                k=6, n_probe=2, round_to=5,
            )
            want |= {(r["vec_id"], x["vec_id"], x["cos_sim"]) for x in one.collect()}
        assert got == want


class TestJpegProperty:
    @settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
    @given(
        seed=st.integers(0, 10_000),
        h=st.integers(4, 33),
        w=st.integers(4, 33),
        sub=st.sampled_from(["444", "420"]),
    )
    def test_q100_roundtrip_high_fidelity_any_content(self, seed, h, w, sub):
        """At quality 100 the luma quant table is all-ones — roundtrip
        error is pure DCT rounding, so even white noise must come back
        at high fidelity (and exactly for uniform blocks)."""
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        out = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=100, subsampling=sub))
        assert out.shape == img.shape
        # 444 measures ~53 dB on noise (pure DCT rounding). 420 measures
        # ~13 dB on PER-PIXEL noise because 2×2 chroma averaging cannot
        # represent it — a property of the subsampling format itself
        # (any codec shows this), so the bound only asserts sanity there.
        floor = 48.0 if sub == "444" else 12.0
        assert codecs.psnr(img, out) >= floor

    @settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
    @given(seed=st.integers(0, 10_000))
    def test_decoder_never_crashes_on_header_mutations(self, seed):
        rng = np.random.default_rng(seed)
        data = bytearray(jpeg.encode_jpeg(np.full((9, 9, 3), 77, np.uint8)))
        for _ in range(4):
            data[int(rng.integers(2, min(len(data), 220)))] = int(rng.integers(0, 256))
        try:
            out = codecs.decode("jpeg", bytes(data))
            assert out.dtype == np.uint8 and out.ndim == 3
        except codecs.DecodeError:
            pass
