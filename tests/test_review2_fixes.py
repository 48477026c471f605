"""Regression tests for the second round-diff review: multi-level
partition overwrite, CSV by-name binding, streaming dedup null keys,
stateful alarm re-emission, IVF training-sample validation."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from sinter_spark.schema import Schema


class TestCatalogMultiLevelPartitions:
    def test_dynamic_overwrite_keeps_sibling_subpartitions(self, spark, tmp_path):
        from sinter_spark.catalog import LocalParquetCatalog

        cat = LocalParquetCatalog(spark, str(tmp_path / "wh"))
        t = cat.create_table("tt", "a int, b int, v string", partition_by=["a", "b"])
        t.append(spark.createDataFrame([(1, 1, "keep"), (1, 2, "old"), (2, 1, "other")], "a int, b int, v string"))
        # dynamic overwrite of ONLY (a=1, b=2): (a=1, b=1) must survive
        t.overwrite_partitions(spark.createDataFrame([(1, 2, "new")], "a int, b int, v string"))
        got = {(r["a"], r["b"], r["v"]) for r in t.read().collect()}
        assert got == {(1, 1, "keep"), (1, 2, "new"), (2, 1, "other")}
        # manifest keys are leaf-grained
        assert all("/" in k for k in t.manifest())


class TestCsvByNameBinding:
    def test_header_order_differs_from_schema(self, spark, tmp_path):
        from sinter_spark.sources import read_csv_validated

        p = str(tmp_path / "f.csv")
        with open(p, "w") as f:
            f.write("age,name\n30,bob\n-4,zed\n")
        schema = Schema.define([("name", "string"), ("age", "integer", {"gt": 0})])
        res = read_csv_validated(spark, p, schema, row_key="name")
        ok = {r["name"]: r["age"] for r in res.validated.collect()}
        assert ok == {"bob": 30}  # positional binding would swap fields
        viols = res.violations.collect()
        assert [(v["row_key"], v["code"]) for v in viols] == [("zed", "gt")]


class TestStreamingDedupNullText:
    def test_null_text_rows_pass_through(self, spark, tmp_path):
        from sinter_spark.streaming.dedup_stream import dedup_stream

        rows = [
            {"doc_id": 1, "text": "same doc", "ts": "2026-01-01 00:00:00"},
            {"doc_id": 2, "text": "same doc", "ts": "2026-01-01 00:00:30"},
            {"doc_id": 3, "text": None, "ts": "2026-01-01 00:01:00"},
            {"doc_id": 4, "text": None, "ts": "2026-01-01 00:01:30"},
            {"doc_id": 5, "text": None, "ts": "2026-01-01 00:02:00"},
        ]
        src = str(tmp_path / "src")
        (
            spark.createDataFrame(pd.DataFrame(rows))
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .write.parquet(src)
        )
        stream = spark.readStream.schema("doc_id long, text string, ts timestamp").parquet(src)
        out = dedup_stream(stream, event_time_col="ts", delay="10 minutes")
        q = (
            out.writeStream.outputMode("append").format("memory")
            .queryName("nulldedup").option("checkpointLocation", str(tmp_path / "ck"))
            .start()
        )
        q.processAllAvailable()
        q.stop()
        got = sorted(r["doc_id"] for r in spark.sql("select * from nulldedup").collect())
        # one survivor of the duplicate pair; ALL null-text rows kept
        assert got in ([1, 3, 4, 5], [2, 3, 4, 5])


class TestStreakAlarmBatching:
    def test_quiet_batch_does_not_realarm(self, spark, tmp_path):
        from sinter_spark.streaming.stateful import violation_streaks

        src = str(tmp_path / "src")
        schema = Schema.define([("event_id", "integer"), ("value", "float", {"gt": 0})])

        def write_batch(rows):
            spark.createDataFrame(pd.DataFrame(rows)).write.mode("append").parquet(src)

        write_batch([
            {"event_id": i, "user_id": 1, "ts": float(i), "value": -1.0 if i < 3 else 5.0}
            for i in range(5)
        ])
        stream = spark.readStream.schema(
            "event_id long, user_id long, ts double, value double"
        ).parquet(src)
        alarms = violation_streaks(
            schema, stream, key_col="user_id", ts_col="ts",
            row_key="event_id", streak_threshold=3,
        )
        q = (
            alarms.writeStream.outputMode("append").format("memory")
            .queryName("realarm").option("checkpointLocation", str(tmp_path / "ck"))
            .start()
        )
        q.processAllAvailable()
        n_after_bad = spark.sql("select * from realarm").count()
        # second batch: clean rows only — must NOT re-emit the old streak
        write_batch([
            {"event_id": 100 + i, "user_id": 1, "ts": 100.0 + i, "value": 5.0}
            for i in range(4)
        ])
        q.processAllAvailable()
        q.stop()
        rows = spark.sql("select * from realarm").collect()
        assert n_after_bad == 1 and len(rows) == 1
        assert rows[0]["streak"] == 3


class TestIvfTrainingValidation:
    def test_null_embedding_in_sample_clear_error(self, spark):
        from sinter_spark.operators import ivf

        df = spark.createDataFrame(
            [(0, [1.0, 0.0]), (1, None), (2, [0.0, 1.0])],
            "vec_id long, embedding array<double>",
        )
        with pytest.raises(ValueError, match="null or wrong-dimension"):
            ivf.train_centroids(df, n_clusters=2, sample_size=10)

    def test_ragged_embedding_in_sample_clear_error(self, spark):
        from sinter_spark.operators import ivf

        df = spark.createDataFrame(
            [(0, [1.0, 0.0]), (1, [1.0]), (2, [0.0, 1.0])],
            "vec_id long, embedding array<double>",
        )
        with pytest.raises(ValueError, match="dims seen"):
            ivf.train_centroids(df, n_clusters=2, sample_size=10)


class TestThirdReviewFixes:
    def test_null_text_quality_is_zero(self, spark):
        from sinter_spark.operators.text import quality_features

        df = spark.createDataFrame(
            [(1, None), (2, "a reasonable piece of text here")],
            "doc_id bigint, text string",
        )
        got = {r["doc_id"]: r for r in quality_features(df).collect()}
        assert got[1]["quality"] == 0.0
        assert got[1]["n_tokens"] == 0 and got[1]["n_bpe_tokens"] == 0
        assert got[2]["quality"] > 0.0

    def test_stats_on_hostile_column_names(self, spark):
        from sinter_spark.operators.stats import column_stats

        df = spark.createDataFrame(
            [(1, 2.0)], ["a b", "it's-a.col"]
        )
        got = {r["column"]: r for r in column_stats(df, approx=False).collect()}
        assert set(got) == {"a b", "it's-a.col"}
        assert got["it's-a.col"]["max_value"] == 2.0

    def test_invalid_validator_return_flags_row(self, spark):
        from sinter_spark.binding import bind
        from sinter_spark.schema import Schema

        schema = Schema.define(
            [("name", "string", {"validate": [lambda v: "bare string"]})]
        )
        df = spark.createDataFrame([(1, "x")], "row_id bigint, name string")
        res = bind(schema, df, row_key="row_id")
        rows = res.violations.collect()
        assert len(rows) == 1 and rows[0]["code"] == "custom_validation_error"
        assert "invalid format" in rows[0]["message"]

    def test_ok_transformed_value_feeds_next_validator(self, spark):
        from sinter_spark.binding import bind
        from sinter_spark.schema import Schema

        chain = [
            lambda v: ("ok", v.strip()),
            lambda v: None if v == "x" else ("error", f"got {v!r}"),
        ]
        schema = Schema.define([("name", "string", {"validate": chain})])
        df = spark.createDataFrame([(1, "  x  ")], "row_id bigint, name string")
        res = bind(schema, df, row_key="row_id")
        assert res.violations.count() == 0  # second fn saw the stripped value

    def test_alias_canonical_dtype_mismatch_is_bind_error(self, spark):
        import pytest as _pytest

        from sinter_spark.binding import BindError, bind
        from sinter_spark.schema import Schema

        schema = Schema.define([("age", "integer", {"alias": "age_n"})])
        df = spark.createDataFrame([(1, "30", 30)], "row_id bigint, age string, age_n bigint")
        with _pytest.raises(BindError, match="align the column types"):
            bind(schema, df, row_key="row_id")

    def test_histogram_keeps_caller_bound_on_all_null(self, spark):
        from sinter_spark.operators.drift import histogram

        df = spark.createDataFrame([(None,), (None,)], "x double")
        # caller-supplied hi must survive; only lo falls back
        h = histogram(df, "x", bins=4, hi=50.0, auto_range=True)
        assert h.count() == 0  # all-null: no binned rows, but no crash
        h2 = histogram(df, "x", bins=4, lo=0.0, auto_range=True)
        assert h2.count() == 0


class TestFourthReviewFixes:
    def test_malformed_payloads_become_violations_not_crashes(self, spark):
        import struct
        import zlib

        from sinter_spark.images import codecs, synth
        from sinter_spark.images.kernel import decode_violations

        bad_qjpg = b"QJPG" + struct.pack(">HHBB", 1, 1, 3, 8) + zlib.compress(b"\x00\x00\x00")
        p = b"\x00\x01"
        bad_png = (
            b"\x89PNG\r\n\x1a\n"
            + struct.pack(">I", len(p)) + b"IHDR" + p
            + struct.pack(">I", zlib.crc32(b"IHDR" + p) & 0xFFFFFFFF)
        )
        rows = [
            ("q", bad_qjpg, 1, 1, "qjpg", "c", 0),
            ("p", bad_png, 1, 1, "png", "c", 0),
        ]
        df = spark.createDataFrame(rows, synth.IMAGE_DDL)
        got = {r["row_key"]: r["code"] for r in decode_violations(df).collect()}
        assert got == {"q": "decode", "p": "decode"}  # job did not crash

    def test_png_up_filter_on_first_row_decodes(self):
        import struct
        import zlib

        import numpy as np

        from sinter_spark.images import codecs

        px = np.arange(24, dtype=np.uint8).reshape(2, 4, 3)
        # hand-build a PNG whose scanlines use filter 2 (Up) incl. row 0
        raw = b""
        prev = np.zeros((4, 3), dtype=np.int32)
        for y in range(2):
            raw += b"\x02" + ((px[y].astype(np.int32) - prev) & 0xFF).astype(np.uint8).tobytes()
            prev = px[y].astype(np.int32)
        def chunk(tag, payload):
            return struct.pack(">I", len(payload)) + tag + payload + struct.pack(
                ">I", zlib.crc32(tag + payload) & 0xFFFFFFFF
            )
        data = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBB", 4, 2, 8, 2) + b"\x00\x00\x00")
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b"")
        )
        assert np.array_equal(codecs.decode("png", data), px)

    def test_dim_mismatch_detected(self, spark):
        from sinter_spark.images import codecs, synth
        from sinter_spark.images.kernel import decode_violations

        px = synth.render_reference("dimtest", 40, 30)
        rows = [("dimtest", codecs.encode_raw(px), 32, 30, "raw", synth.expected_caption("dimtest"), synth.phash64(px))]
        df = spark.createDataFrame(rows, synth.IMAGE_DDL)
        got = [(tuple(r["path"]), r["code"]) for r in decode_violations(df).collect()]
        assert (("w",), "dim_mismatch") in got
        assert (("h",), "dim_mismatch") not in got

    def test_scan_columns_sees_past_nested_types(self, spark, tmp_path):
        from sinter_spark import plans

        p = str(tmp_path / "t")
        spark.createDataFrame(
            [({"k": "v"}, b"\x00", 1)], "ctx map<string,string>, bytes binary, x bigint"
        ).write.parquet(p)
        df = spark.read.parquet(p).select("ctx", "bytes", "x")
        df.count()
        cols = plans.scan_columns(df)
        assert "bytes" in cols and "x" in cols  # old regex lost both

    def test_merged_schema_keeps_metadata_and_hooks(self):
        from sinter_spark.schema import Schema, merge_schemas

        hook = lambda d: True  # noqa: E731
        a = Schema.define([("x", "integer")])
        b = Schema.define([("y", "string")], post_validate=hook)
        m = merge_schemas([a, b])
        assert m.metadata.get("field_count") == 2
        assert m.metadata.get("created_at")
        assert m.config.post_validate is hook

    def test_is_iso_datetime_rejects_date_only(self, spark):
        from pyspark.sql import functions as F

        from sinter_spark import functions as SF

        df = spark.range(1).select(
            SF.is_iso_datetime(F.lit("2023-01-01")).alias("d"),
            SF.is_iso_datetime(F.lit("2023-01-01T10:00:00Z")).alias("dt"),
        )
        r = df.collect()[0]
        assert r["d"] is False and r["dt"] is True
