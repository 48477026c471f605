"""Round-5 regressions: ADVICE r4 defects (exact-distinct 2^53
collision, IVF sample quota shortfall, C-kernel cache trust) and the
new column_stats quantiles surface."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sinter_spark.operators.stats import column_stats


class TestExactDistinctBigInts:
    def test_bigints_past_2_53_do_not_collide(self, spark):
        # ADVICE r4 (high): stacking bigints as double collapsed
        # {2^53, 2^53+1, 2^53+2} to 2 distinct values
        df = spark.createDataFrame(
            [(2**53,), (2**53 + 1,), (2**53 + 2,)], "v bigint"
        )
        got = column_stats(df, approx=False).collect()[0]
        assert got["n_distinct"] == 3

    def test_decimal_past_2_53_do_not_collide(self, spark):
        df = spark.createDataFrame(
            [("9007199254740992",), ("9007199254740993",)], "s string"
        ).select(F.col("s").cast("decimal(20,0)").alias("v"))
        got = column_stats(df, approx=False).collect()[0]
        assert got["n_distinct"] == 2

    def test_float_nan_and_negzero_still_canonical(self, spark):
        # doubles keep the double stack: NaN counts once, -0.0 == 0.0 —
        # exactly count_distinct's grouping semantics
        df = spark.createDataFrame(
            [(float("nan"),), (float("nan"),), (-0.0,), (0.0,), (1.5,)],
            "v double",
        )
        got = column_stats(df, approx=False).collect()[0]
        ref = df.agg(F.count_distinct("v")).collect()[0][0]
        assert got["n_distinct"] == ref == 3


class TestStatsQuantiles:
    def test_exact_rank_semantics(self, spark):
        # accuracy >= n: the element at 1-indexed rank ceil(p*n)
        df = spark.createDataFrame([(float(i),) for i in range(10)], "v double")
        got = column_stats(
            df, quantiles=(0.25, 0.5, 0.95), quantile_accuracy=10**6
        ).collect()[0]
        assert (got["q_25"], got["q_50"], got["q_95"]) == (2.0, 4.0, 9.0)

    def test_rides_single_aggregate_no_extra_scan(self, spark):
        from sinter_spark import plans

        df = spark.createDataFrame(
            [(i, float(i)) for i in range(20)], "a int, b double"
        )
        out = column_stats(df, quantiles=(0.5, 0.99))
        # one wide agg -> zero exchanges beyond the single reduce
        assert plans.count_exchanges(out) <= 1
        row = {r["column"]: r for r in out.collect()}
        assert row["a"]["q_50"] is not None and row["b"]["q_99"] is not None

    def test_non_numeric_columns_get_null_quantiles(self, spark):
        df = spark.createDataFrame([("x", 1)], "s string, n int")
        rows = {r["column"]: r for r in column_stats(df, quantiles=(0.5,)).collect()}
        assert rows["s"]["q_50"] is None
        assert rows["n"]["q_50"] == 1.0

    def test_exact_long_path_carries_quantiles(self, spark):
        df = spark.createDataFrame([(i,) for i in range(7)], "v int")
        got = column_stats(
            df, approx=False, quantiles=(0.5,), quantile_accuracy=10**6
        ).collect()[0]
        assert got["q_50"] == 3.0 and got["n_distinct"] == 7


class TestCKernelCacheTrust:
    def test_untrusted_entries_refused(self, tmp_path):
        # ADVICE r4 (medium): never dlopen a cache entry another local
        # user could have planted (wrong owner / group-world-writable)
        from sinter_spark.images import _jpegc

        p = tmp_path / "lib.so"
        p.write_bytes(b"\x7fELF")
        p.chmod(0o666)
        with pytest.raises(PermissionError):
            _jpegc._assert_trusted(str(p))
        p.chmod(0o500)
        _jpegc._assert_trusted(str(p))  # ours + unwritable: fine

    def test_kernel_still_loads_after_hardening(self):
        from sinter_spark.images import _jpegc

        import os

        if os.environ.get("SINTER_JPEG_NO_C"):
            pytest.skip("C kernel disabled by env")
        # cache dir is per-uid + 0o700 now; a (re)build must succeed
        assert _jpegc._build() is not None


class TestResultExport:
    def test_write_parquet_one_call(self, spark, tmp_path):
        import json

        import sinter_spark as ss
        from sinter_spark.binding import bind

        schema = ss.Schema.define([("v", "integer", {"gt": 0})])
        df = spark.createDataFrame([(1, 5), (2, -3), (3, None)], "rk int, v int")
        res = bind(schema, df, row_key="rk")
        m = res.write_parquet(str(tmp_path), include_validated=True)
        assert m["rows"] == 3 and m["violations"] == 2 and m["ok"] is False
        viol = spark.read.parquet(str(tmp_path / "violations"))
        assert viol.count() == 2
        assert spark.read.parquet(str(tmp_path / "validated")).count() == 1
        assert json.loads((tmp_path / "metrics.json").read_text())["violations"] == 2

    def test_to_arrow_batches(self, spark):
        import pyarrow as pa

        import sinter_spark as ss
        from sinter_spark.binding import bind

        schema = ss.Schema.define([("v", "integer", {"gt": 0})])
        df = spark.createDataFrame([(1, 5), (2, -3)], "rk int, v int")
        batches = list(bind(schema, df, row_key="rk").to_arrow_batches())
        assert all(isinstance(b, pa.RecordBatch) for b in batches)
        tbl = pa.Table.from_batches(batches)
        assert tbl.num_rows == 1
        assert set(tbl.column_names) >= {"row_key", "path", "code", "message"}


class TestIvfSampleQuota:
    def test_skewed_partitions_still_fill_sample(self, spark):
        # ADVICE r4 (low): fixed per-partition quota under-collected on
        # skewed partition sizes; quota is now over-provisioned + trimmed
        from sinter_spark.operators import ivf

        rng = np.random.default_rng(7)
        rows = [(i, rng.standard_normal(4).tolist()) for i in range(400)]
        df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
        # skew: nearly everything in one partition
        skewed = df.repartitionByRange(8, (F.col("vec_id") > 390).cast("int"))
        sample = ivf._default_training_sample(skewed, "embedding", 200)
        assert sample.shape[0] == 200
