"""Image near-duplicate detection: DCT pHash + hamming-block LSH.

Pins (a) the fingerprint's separability on the synthetic renders —
lossy re-encodes stay within the hamming budget, unrelated images stay
far outside it — and (b) the LSH recall guarantee: bucketed pairs ==
brute-force pairs at the guaranteed hamming budget.
"""

import random

import pytest

from sinter_spark.images import codecs, synth
from sinter_spark.images.perceptual import dct_phash64, hamming64
from sinter_spark.operators import dedup
from sinter_spark.operators.multimodal import image_near_dup_pairs


class TestDctPhash:
    def test_reencode_near_unrelated_far(self):
        ids = [synth.uuid_for(1, i) for i in range(25)]
        renders = [synth.render_reference(x, 40, 36) for x in ids]
        hashes = [dct_phash64(r) for r in renders]
        near = [
            hamming64(h, dct_phash64(codecs.decode("qjpg", codecs.ENCODERS["qjpg"](r))))
            for r, h in zip(renders, hashes)
        ]
        far = [
            hamming64(hashes[i], hashes[j])
            for i in range(len(ids))
            for j in range(i + 1, len(ids))
        ]
        assert max(near) <= 6      # re-encode channel: within budget
        assert min(far) > 6        # unrelated: outside it

    def test_identical_pixels_identical_hash(self):
        px = synth.render_reference("x", 33, 17)
        assert dct_phash64(px) == dct_phash64(px.copy())

    def test_brightness_invariance_of_dc(self):
        # shifting all pixels by a constant leaves most AC signs alone
        import numpy as np

        px = synth.render_reference("y", 32, 32)
        brighter = np.clip(px.astype(int) + 30, 0, 255).astype(np.uint8)
        assert hamming64(dct_phash64(px), dct_phash64(brighter)) <= 8


class TestHammingBlockPairs:
    def _brute(self, sigs, h):
        return {
            (a, b)
            for (a, sa) in sigs
            for (b, sb) in sigs
            if a < b and hamming64(sa & ((1 << 64) - 1), sb & ((1 << 64) - 1)) <= h
        }

    def _mk(self, spark, sigs):
        return spark.createDataFrame(sigs, "id string, sig bigint")

    def _plant(self, seed, n, h_budget, n_near):
        rng = random.Random(seed)
        sigs = [(f"v{i:03d}", rng.getrandbits(64) - (1 << 63)) for i in range(n)]
        for k in range(n_near):
            base = sigs[k][1]
            flipped = base
            for bit in rng.sample(range(64), rng.randint(0, h_budget)):
                flipped ^= 1 << bit
                if flipped >= 1 << 63:
                    flipped -= 1 << 64
            sigs.append((f"near{k:03d}", flipped))
        return sigs

    def test_single_block_mode_equals_brute_force(self, spark):
        sigs = self._plant(5, 60, 3, 12)
        got = {
            (r["id_a"], r["id_b"])
            for r in dedup.hamming_block_pairs(
                self._mk(spark, sigs), "id", "sig",
                n_blocks=4, block_bits=16, max_hamming=3, cache=False,
            ).collect()
        }
        assert got == self._brute(sigs, 3)
        spark.catalog.clearCache()

    def test_pair_block_mode_equals_brute_force(self, spark):
        sigs = self._plant(6, 60, 6, 12)
        got = {
            (r["id_a"], r["id_b"])
            for r in dedup.hamming_block_pairs(
                self._mk(spark, sigs), "id", "sig",
                n_blocks=8, block_bits=8, pair_blocks=True,
                max_hamming=6, cache=False,
            ).collect()
        }
        assert got == self._brute(sigs, 6)
        spark.catalog.clearCache()

    def test_release_cache_unpersists_bucket_table(self, spark):
        sigs = self._plant(9, 30, 3, 5)
        pairs = dedup.hamming_block_pairs(
            self._mk(spark, sigs), "id", "sig", n_blocks=4, max_hamming=3
        )
        pairs.count()  # materialize -> bucket table cached
        cached = pairs._sinter_persisted
        assert cached.storageLevel.useMemory
        dedup.release_cache(pairs)
        assert not cached.storageLevel.useMemory
        dedup.release_cache(spark.range(1))  # no handle: no-op, no error

    def test_budget_beyond_guarantee_rejected(self, spark):
        df = self._mk(spark, [("a", 1)])
        with pytest.raises(ValueError):
            dedup.hamming_block_pairs(df, "id", "sig", n_blocks=4, max_hamming=4)
        with pytest.raises(ValueError):
            dedup.hamming_block_pairs(
                df, "id", "sig", n_blocks=8, block_bits=8,
                pair_blocks=True, max_hamming=7,
            )


class TestFeaturePhashExactness:
    def test_phash64_exact_in_mixed_batch(self, spark):
        # regression: a batch mixing failed decodes (phash64=None) with
        # successes must NOT round the int64 hashes through float64
        from sinter_spark.operators.multimodal import decode_image_features

        px = synth.render_reference("mixed-batch", 40, 30)
        expected = dct_phash64(px)
        rows = [
            ("good", codecs.encode_raw(px), 40, 30, "raw", "c", 0),
            ("stub", b"\x00\x01", 2, 2, "webp", "c", 0),  # unknown fmt -> None hash
            ("corrupt", b"\x00" * 3, 1, 1, "png", "c", 0),  # decode error -> None hash
        ]
        df = spark.createDataFrame(rows, synth.IMAGE_DDL).coalesce(1)
        feats = {r["row_key"]: r for r in decode_image_features(df).collect()}
        assert feats["good"]["phash64"] == expected  # bit-exact
        assert feats["stub"]["phash64"] is None
        assert feats["corrupt"]["phash64"] is None


class TestImageNearDup:
    def test_reencoded_copies_found_no_false_pairs(self, spark):
        cols = ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
        ids = [synth.uuid_for(3, i) for i in range(30)]
        rows = []
        for x in ids:
            px = synth.render_reference(x, 36, 28)
            rows.append((x, codecs.encode_raw(px), 36, 28, "raw", "c", 0))
        planted = set()
        for x in ids[:10]:  # lossy re-encodes under derived ids
            px = synth.render_reference(x, 36, 28)
            cid = f"{x}-copy"
            rows.append((cid, codecs.ENCODERS["qjpg"](px), 36, 28, "qjpg", "c", 0))
            planted.add(tuple(sorted((x, cid))))
        df = spark.createDataFrame(rows, synth.IMAGE_DDL)
        got = {
            tuple(sorted((r["id_a"], r["id_b"])))
            for r in image_near_dup_pairs(df).collect()
        }
        assert got == planted
        spark.catalog.clearCache()
