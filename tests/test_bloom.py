"""Bloom-prefiltered reference-corpus dedup (round 5).

The contract under test: ``dedup_against(use_bloom=True)`` is
byte-identical to the plain fingerprint anti-join, for any filter
size (false positives are confirmed away; false negatives are
impossible), and the filter math itself matches the textbook
parameters."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sinter_spark.operators.bloom import (
    BloomFilter,
    bloom_params,
    build_bloom,
    dedup_against,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestParams:
    def test_textbook_values(self):
        m, k = bloom_params(1000, 0.01)
        # optimum ≈ 9.585 bits/key, k ≈ 7
        assert 9500 <= m <= 9700 and k == 7

    def test_byte_aligned_and_floored(self):
        m, _ = bloom_params(1, 0.5)
        assert m % 8 == 0 and m >= 64

    def test_bad_fpr_raises(self):
        with pytest.raises(ValueError):
            bloom_params(10, 1.5)


class TestFilterMath:
    def test_no_false_negatives(self):
        rng = np.random.default_rng(3)
        h1 = rng.integers(-(2**63), 2**63 - 1, 500, dtype=np.int64)
        h2 = rng.integers(-(2**63), 2**63 - 1, 500, dtype=np.int64)
        m, k = bloom_params(500, 0.01)
        bits = np.zeros(m // 8, dtype=np.uint8)
        from sinter_spark.operators.bloom import _positions

        pos = _positions(h1, h2, k, m).ravel()
        np.bitwise_or.at(
            bits,
            (pos >> np.uint64(3)).astype(np.int64),
            np.left_shift(
                np.uint8(1), (pos & np.uint64(7)).astype(np.uint8), dtype=np.uint8
            ),
        )
        flt = BloomFilter(bits=bits, k=k)
        assert flt.might_contain(h1, h2).all()

    def test_fpr_in_the_ballpark(self):
        rng = np.random.default_rng(4)
        n = 2000
        h1 = rng.integers(-(2**63), 2**63 - 1, 2 * n, dtype=np.int64)
        h2 = rng.integers(-(2**63), 2**63 - 1, 2 * n, dtype=np.int64)
        m, k = bloom_params(n, 0.01)
        bits = np.zeros(m // 8, dtype=np.uint8)
        from sinter_spark.operators.bloom import _positions

        pos = _positions(h1[:n], h2[:n], k, m).ravel()
        np.bitwise_or.at(
            bits,
            (pos >> np.uint64(3)).astype(np.int64),
            np.left_shift(
                np.uint8(1), (pos & np.uint64(7)).astype(np.uint8), dtype=np.uint8
            ),
        )
        flt = BloomFilter(bits=bits, k=k)
        fp_rate = flt.might_contain(h1[n:], h2[n:]).mean()
        assert fp_rate < 0.05  # target 0.01, generous slack


class TestBuildBloom:
    def test_contains_every_reference_doc(self, spark):
        ref = _docs(spark, [(i, f"doc number {i}") for i in range(200)])
        flt = build_bloom(ref, fpr=0.01)
        from sinter_spark.operators.bloom import _hash_cols

        hashed = ref.select(*_hash_cols("text")).toPandas()
        got = flt.might_contain(
            hashed["_h1"].to_numpy(np.int64), hashed["_h2"].to_numpy(np.int64)
        )
        assert got.all()

    def test_multi_chunk_assembly(self, spark, monkeypatch):
        # force several bitmap chunks so the repartition+OR path and
        # the driver assembly both see chunk_id > 0
        import sinter_spark.operators.bloom as B

        monkeypatch.setattr(B, "_CHUNK_BYTES", 64)
        ref = _docs(spark, [(i, f"chunky {i}") for i in range(300)])
        flt = B.build_bloom(ref, fpr=0.01)  # m ≈ 2876 bits ≈ 360 bytes
        assert len(flt.bits) > 64
        hashed = ref.select(*B._hash_cols("text")).toPandas()
        assert flt.might_contain(
            hashed["_h1"].to_numpy(np.int64), hashed["_h2"].to_numpy(np.int64)
        ).all()

    def test_empty_reference(self, spark):
        ref = _docs(spark, []).where(F.lit(False))
        flt = build_bloom(ref, fpr=0.01)
        assert not flt.bits.any()


class TestDedupAgainst:
    def _corpora(self, spark):
        # 40 corpus docs; 15 exist in the reference (5 via whitespace/
        # case variants that normalize equal), reference has extras
        corpus = _docs(
            spark,
            [(i, f"shared text {i}") for i in range(15)]
            + [(i, f"only in corpus {i}") for i in range(15, 40)],
        )
        ref = _docs(
            spark,
            [(100 + i, f"shared   TEXT {i}") for i in range(5)]
            + [(200 + i, f"shared text {i}") for i in range(5, 15)]
            + [(300 + i, f"only in reference {i}") for i in range(10)],
        )
        return corpus, ref

    def test_exact_semantics(self, spark):
        corpus, ref = self._corpora(spark)
        out = dedup_against(corpus, ref)
        kept = sorted(r.doc_id for r in out.collect())
        assert kept == list(range(15, 40))
        assert out.columns == corpus.columns

    def test_bloom_equals_plain(self, spark):
        corpus, ref = self._corpora(spark)
        plain = sorted(
            r.doc_id for r in dedup_against(corpus, ref, use_bloom=False).collect()
        )
        bloomed = sorted(r.doc_id for r in dedup_against(corpus, ref).collect())
        assert plain == bloomed

    def test_adversarially_tiny_filter_still_exact(self, spark):
        # fpr→0.99 makes nearly everything a candidate; the confirm
        # join must keep the result exact anyway
        corpus, ref = self._corpora(spark)
        out = dedup_against(corpus, ref, fpr=0.99)
        assert sorted(r.doc_id for r in out.collect()) == list(range(15, 40))

    def test_prebuilt_filter_reuse(self, spark):
        corpus, ref = self._corpora(spark)
        flt = build_bloom(ref, fpr=0.01)
        out = dedup_against(corpus, ref, bloom=flt)
        assert sorted(r.doc_id for r in out.collect()) == list(range(15, 40))

    def test_null_and_empty_text(self, spark):
        corpus = _docs(spark, [(1, None), (2, ""), (3, "real text")])
        ref = _docs(spark, [(9, "")])
        kept = sorted(
            r.doc_id for r in dedup_against(corpus, ref).collect()
        )
        # SQL null semantics: fingerprint(NULL) is NULL and never joins,
        # so null-text rows are always kept; "" matches "" and drops.
        # The bloom path must agree (its coalesced probe marks doc 1 a
        # candidate, but the exact confirm join keeps it).
        assert kept == [1, 3]
        plain = sorted(
            r.doc_id
            for r in dedup_against(corpus, ref, use_bloom=False).collect()
        )
        assert plain == kept


class TestPersistence:
    def test_save_load_round_trip(self, spark, tmp_path):
        ref = _docs(spark, [(i, f"persist {i}") for i in range(150)])
        flt = build_bloom(ref, fpr=0.01)
        p = str(tmp_path / "ref.bloom")
        flt.save(p)
        back = BloomFilter.load(p)
        assert back.k == flt.k and (back.bits == flt.bits).all()

    def test_loaded_filter_drives_dedup(self, spark, tmp_path):
        corpus = _docs(
            spark,
            [(i, f"persist {i}") for i in range(5)]
            + [(100 + i, f"fresh {i}") for i in range(5)],
        )
        ref = _docs(spark, [(i, f"persist {i}") for i in range(150)])
        p = str(tmp_path / "ref.bloom")
        build_bloom(ref, fpr=0.01).save(p)
        out = dedup_against(corpus, ref, bloom=BloomFilter.load(p))
        assert sorted(r.doc_id for r in out.collect()) == [100 + i for i in range(5)]

    def test_magic_guard(self, tmp_path):
        p = tmp_path / "junk.bloom"
        p.write_bytes(b"not a bloom filter at all")
        with pytest.raises(ValueError):
            BloomFilter.load(str(p))

    def test_provenance_round_trip(self, spark, tmp_path):
        """ADVICE r5 (medium): a saved filter carries the reference's
        (row count, order-independent digest) and round-trips them."""
        from sinter_spark.operators.bloom import reference_provenance

        ref = _docs(spark, [(i, f"prov {i}") for i in range(40)])
        flt = build_bloom(ref, fpr=0.01)
        n, d = reference_provenance(ref)
        assert (flt.n_ref, flt.digest) == (n, d) and flt.n_ref == 40
        # digest is partition/order independent
        n2, d2 = reference_provenance(ref.repartition(7))
        assert (n2, d2) == (n, d)
        p = str(tmp_path / "prov.bloom")
        flt.save(p)
        back = BloomFilter.load(p)
        assert (back.n_ref, back.digest) == (n, d)
        assert (back.bits == flt.bits).all() and back.k == flt.k

    def test_provenance_ignores_duplication_and_even_multiplicity(self, spark):
        """The digest identifies the DISTINCT fingerprint set (what the
        filter's bits are a function of): duplication changes nothing,
        and the even-multiplicity xor-cancellation trap cannot fire
        (two all-even-multiplicity corpora with different texts must
        NOT collide at digest 0)."""
        from sinter_spark.operators.bloom import reference_provenance

        a = _docs(spark, [(0, "x"), (1, "x"), (2, "y"), (3, "y")])
        b = _docs(spark, [(0, "w"), (1, "w"), (2, "z"), (3, "z")])
        na, da = reference_provenance(a)
        nb, db = reference_provenance(b)
        assert na == nb == 2
        assert da != db  # per-row xor would give 0 == 0 here
        # duplication-invariant: same distinct texts, different copies
        a_once = _docs(spark, [(0, "x"), (1, "y")])
        assert reference_provenance(a_once) == (na, da)

    def test_save_without_provenance_round_trips_as_unverifiable(self, spark, tmp_path):
        ref = _docs(spark, [(i, f"anon {i}") for i in range(12)])
        built = build_bloom(ref, fpr=0.01)
        bare = BloomFilter(bits=built.bits, k=built.k)  # no provenance
        p = str(tmp_path / "bare.bloom")
        bare.save(p)
        back = BloomFilter.load(p)
        # must come back unverifiable (None), NOT a claimed (0, 0)
        # that dedup-against --bloom-in would hard-refuse
        assert back.n_ref is None and back.digest is None
        assert (back.bits == built.bits).all()

    def test_legacy_v1_loads_without_provenance(self, spark, tmp_path):
        ref = _docs(spark, [(i, f"old {i}") for i in range(10)])
        flt = build_bloom(ref, fpr=0.01)
        p = tmp_path / "v1.bloom"
        p.write_bytes(
            BloomFilter._MAGIC_V1
            + int(flt.k).to_bytes(8, "little")
            + flt.bits.tobytes()
        )
        back = BloomFilter.load(str(p))
        assert back.n_ref is None and back.digest is None
        assert (back.bits == flt.bits).all()

    def test_cli_bloom_in_rejects_stale_filter(self, spark, tmp_path):
        """A filter persisted against a different reference must be
        refused: it would silently KEEP true duplicates."""
        from sinter_spark.cli import build_parser, cmd_dedup_against

        src = tmp_path / "docs.parquet"
        refp = tmp_path / "ref.parquet"
        _docs(spark, [(1, "keep me"), (2, "drop me")]).write.parquet(str(src))
        _docs(spark, [(9, "drop me")]).write.parquet(str(refp))
        stale = str(tmp_path / "stale.bloom")
        other_ref = _docs(spark, [(7, "entirely different corpus")])
        build_bloom(other_ref, fpr=0.01).save(stale)
        out = tmp_path / "stale_out"
        args = build_parser().parse_args(
            ["dedup-against", "--input", str(src), "--reference", str(refp),
             "--output", str(out), "--bloom-in", stale]
        )
        with pytest.raises(SystemExit, match="different reference"):
            cmd_dedup_against(args)

    def test_cli_bloom_out_in(self, spark, tmp_path):
        import json as _json

        from sinter_spark.cli import build_parser, cmd_dedup_against

        src = tmp_path / "docs.parquet"
        refp = tmp_path / "ref.parquet"
        _docs(spark, [(1, "keep me"), (2, "drop me")]).write.parquet(str(src))
        _docs(spark, [(9, "drop me")]).write.parquet(str(refp))
        bloom_path = str(tmp_path / "ref.bloom")
        out1 = tmp_path / "o1"
        args = build_parser().parse_args(
            ["dedup-against", "--input", str(src), "--reference", str(refp),
             "--output", str(out1), "--bloom-out", bloom_path]
        )
        assert cmd_dedup_against(args) == 0
        m1 = _json.loads((out1 / "metrics.json").read_text())
        assert m1["kept_docs"] == 1
        out2 = tmp_path / "o2"
        args = build_parser().parse_args(
            ["dedup-against", "--input", str(src), "--reference", str(refp),
             "--output", str(out2), "--bloom-in", bloom_path]
        )
        assert cmd_dedup_against(args) == 0
        m2 = _json.loads((out2 / "metrics.json").read_text())
        assert m2["kept_docs"] == 1
