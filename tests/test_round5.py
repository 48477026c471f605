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


class TestInjectiveStackGroups:
    """Exact-distinct embeddings: lossless AND minimal scan count."""

    def test_timestamp_distinct_keeps_microseconds(self, spark):
        # a plain cast(ts as long) would merge these two instants
        df = spark.sql(
            "select * from values (timestamp'2024-01-01 00:00:00.000001'),"
            " (timestamp'2024-01-01 00:00:00.000002') as t(v)"
        )
        got = column_stats(df, approx=False).collect()[0]
        assert got["n_distinct"] == 2

    def test_narrow_decimal_scale_shift_past_2_53(self, spark):
        # decimal(18,2) whose unscaled values straddle 2^53: the long
        # embedding (value * 100) must keep all three distinct
        df = spark.createDataFrame(
            [("90071992547409.92",), ("90071992547409.93",), ("90071992547409.94",)],
            "s string",
        ).select(F.col("s").cast("decimal(18,2)").alias("v"))
        got = column_stats(df, approx=False).collect()[0]
        assert got["n_distinct"] == 3

    def test_date_boolean_and_string_groups(self, spark):
        df = spark.sql(
            "select * from values"
            " (date'2024-01-01', true,  'a'),"
            " (date'2024-01-02', false, 'b'),"
            " (date'2024-01-01', true,  'a') as t(d, b, s)"
        )
        rows = {r["column"]: r for r in column_stats(df, approx=False).collect()}
        assert rows["d"]["n_distinct"] == 2
        assert rows["b"]["n_distinct"] == 2
        assert rows["s"]["n_distinct"] == 2

    def test_int_and_double_share_one_stack_group(self, spark):
        # the r5 stats_lineitem regression: splitting int32 out of the
        # double group doubled the source scans. int32 embeds exactly
        # in a double, so a (float..int) table must stack ONCE.
        from sinter_spark.operators.stats import _injective_stack_expr
        from pyspark.sql import types as T

        assert _injective_stack_expr("`a`", T.IntegerType())[0] == "double"
        assert _injective_stack_expr("`a`", T.DoubleType())[0] == "double"
        assert _injective_stack_expr("`a`", T.LongType())[0] == "long"
        df = spark.createDataFrame(
            [(i % 5, float(i % 7)) for i in range(30)], "a int, b double"
        )
        out = column_stats(df, ["a", "b"], approx=False)
        from sinter_spark import plans

        # exactly two stack generators: the base wide-agg unpivot plus
        # ONE shared dist group (a second dist group would make three)
        assert plans.physical_plan(out).count("stack(2") == 2
        rows = {r["column"]: r for r in out.collect()}
        assert rows["a"]["n_distinct"] == 5 and rows["b"]["n_distinct"] == 7

    def test_matches_count_distinct_across_types(self, spark):
        df = spark.sql(
            "select * from values"
            " (1, 9223372036854775807, timestamp'2020-06-01 01:02:03.000004',"
            "  date'2020-06-01', cast(1.23 as decimal(10,2)), 'x', true),"
            " (2, 9223372036854775806, timestamp'2020-06-01 01:02:03.000005',"
            "  date'2020-06-02', cast(1.24 as decimal(10,2)), 'y', false),"
            " (1, 9223372036854775807, timestamp'2020-06-01 01:02:03.000004',"
            "  date'2020-06-01', cast(1.23 as decimal(10,2)), 'x', true)"
            " as t(i, l, ts, d, dec, s, b)"
        )
        rows = {r["column"]: r for r in column_stats(df, approx=False).collect()}
        for c in df.columns:
            ref = df.agg(F.count_distinct(c)).collect()[0][0]
            assert rows[c]["n_distinct"] == ref, c


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
