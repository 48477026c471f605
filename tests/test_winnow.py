"""Winnowing substring fingerprints (operators/winnow.py): the SIGMOD
2003 guarantee, kernel ≡ scalar-twin equality (the oracle's validity),
doc-boundary isolation, the mega-bucket cap audit, and plan shape."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sinter_spark.lsh_fixtures import winnow_scalar
from sinter_spark.operators import winnow

K, W = 8, 8
SPAN = W + K - 1  # 15: the guarantee threshold


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


class TestKernelEqualsScalarTwin:
    def test_adversarial_docs(self, spark):
        rows = [
            (0, "plain ascii body long enough to fingerprint easily"),
            (1, "ünïcödé 中文 🎉 multibyte bytes count not chars here"),
            (2, "x" * 100),  # constant text: every gram hash equal (all ties)
            (3, "short"),  # below span -> no fingerprints
            (4, ""),  # empty
            (5, None),  # NULL -> omitted
            (6, "ab" * 40),  # period-2 repetition: heavy tie structure
            (7, "tail-boundary" + "q" * (SPAN - 1)),  # last full window ends at EOF
        ]
        got = sorted(
            (r["doc_id"], r["pos"], r["fp"])
            for r in winnow.winnow_fingerprints(_df(spark, rows), k=K, window=W).collect()
        )
        want = sorted(
            (d, pos, fp)
            for d, t in rows
            if t is not None
            for pos, fp in winnow_scalar(t, k=K, window=W)
        )
        assert got == want
        assert not any(d in (3, 4, 5) for d, _p, _f in got)

    def test_docs_split_across_partitions_match_single_partition(self, spark):
        rows = [(i, f"document number {i} sharing a common long boilerplate suffix")
                for i in range(40)]
        one = sorted(map(tuple, winnow.winnow_fingerprints(
            _df(spark, rows).coalesce(1), k=K, window=W).collect()))
        many = sorted(map(tuple, winnow.winnow_fingerprints(
            _df(spark, rows).repartition(7), k=K, window=W).collect()))
        assert one == many


class TestGuarantee:
    def test_shared_run_of_span_bytes_yields_shared_fingerprint(self, spark):
        """SIGMOD 2003 §2: a shared substring ≥ w+k−1 bytes ⇒ ≥1 shared
        fingerprint — structural, so assert over many random plants."""
        rng = np.random.default_rng(5)
        rows, planted = [], []
        for i in range(30):
            shared = "".join(chr(rng.integers(97, 123)) for _ in range(SPAN))
            pre_a = "".join(chr(rng.integers(65, 91)) for _ in range(rng.integers(0, 40)))
            post_b = "".join(chr(rng.integers(48, 58)) for _ in range(rng.integers(0, 40)))
            rows.append((2 * i, pre_a + shared))
            rows.append((2 * i + 1, shared + post_b))
            planted.append((2 * i, 2 * i + 1))
        pairs = winnow.substring_overlap_pairs(
            _df(spark, rows), k=K, window=W, min_shared=1, cache=False
        )
        got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
        missed = [p for p in planted if p not in got]
        assert not missed, f"guarantee violated for {missed}"

    def test_disjoint_alphabets_share_nothing(self, spark):
        rows = [
            (0, "abcdefgh" * 10),
            (1, "ABCDEFGH" * 10),
            (2, "01234567" * 10),
        ]
        pairs = winnow.substring_overlap_pairs(
            _df(spark, rows), k=K, window=W, min_shared=1, cache=False
        )
        assert pairs.count() == 0

    def test_n_shared_counts_distinct_fingerprints(self, spark):
        rows = [(0, "zqj" + "common-fragment-one!" * 2), (1, "common-fragment-one!" * 2 + "vx")]
        pairs = winnow.substring_overlap_pairs(
            _df(spark, rows), k=K, window=W, min_shared=1, cache=False
        ).collect()
        assert len(pairs) == 1
        a = {fp for _p, fp in winnow_scalar(rows[0][1], k=K, window=W)}
        b = {fp for _p, fp in winnow_scalar(rows[1][1], k=K, window=W)}
        assert pairs[0]["n_shared"] == len(a & b) >= 1


class TestCapAudit:
    def test_boilerplate_megabucket_dropped_and_reported(self, spark):
        from sinter_spark.operators import dedup

        boiler = "every single document carries this exact boilerplate sentence."
        rows = [(i, f"doc {i:04d} " + boiler) for i in range(30)]
        pairs = winnow.substring_overlap_pairs(
            _df(spark, rows), k=K, window=W, min_shared=1, max_bucket=10, cache=True
        )
        uncapped = winnow.substring_overlap_pairs(
            _df(spark, rows), k=K, window=W, min_shared=1, max_bucket=None, cache=False
        ).count()
        try:
            n_pairs = pairs.count()
            drop = dedup.dropped_mass(pairs)
            assert drop["n_buckets"] > 0 and drop["n_member_entries"] >= 30
            # the 30-doc boilerplate buckets are dropped; only the small
            # junction-gram buckets (selection differs near the unique
            # "doc NNNN " prefix) can still pair docs
            assert uncapped == 30 * 29 // 2
            assert n_pairs < uncapped / 10
        finally:
            dedup.release_cache(pairs)

    def test_no_drop_reports_zero(self, spark):
        from sinter_spark.operators import dedup

        rows = [(0, "abcdefgh" * 10), (1, "ABCDEFGH" * 10)]
        pairs = winnow.substring_overlap_pairs(
            _df(spark, rows), k=K, window=W, cache=False
        )
        pairs.count()
        assert dedup.dropped_mass(pairs) == {"n_buckets": 0, "n_member_entries": 0}


class TestShapes:
    def test_fingerprint_kernel_plan_has_no_exchange(self, spark):
        from sinter_spark.plans import count_exchanges

        df = _df(spark, [(0, "some text that is long enough to window")])
        assert count_exchanges(winnow.winnow_fingerprints(df)) == 0

    def test_k_must_pack(self, spark):
        with pytest.raises(ValueError, match="k must be"):
            winnow.winnow_fingerprints(_df(spark, [(0, "x")]), k=9)
        with pytest.raises(ValueError, match="window must be"):
            winnow.winnow_fingerprints(_df(spark, [(0, "x")]), window=0)

    def test_density_near_two_over_w_plus_one(self, spark):
        rng = np.random.default_rng(11)
        text = "".join(chr(rng.integers(32, 127)) for _ in range(20000))
        n_fp = winnow.winnow_fingerprints(_df(spark, [(0, text)]), k=K, window=W).count()
        density = n_fp / (len(text.encode()) - K + 1)
        assert 0.8 * 2 / (W + 1) < density < 1.3 * 2 / (W + 1)
