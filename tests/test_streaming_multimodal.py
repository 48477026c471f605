"""Structured Streaming validation + multimodal plumbing tests."""

import os

import pytest
from pyspark.sql import functions as F

from sinter_spark import Schema
from sinter_spark.images import generate_images
from sinter_spark.operators.multimodal import (
    decode_image_features,
    resize_images,
    sample_video_frames,
)
from sinter_spark.streaming import streaming_validate, windowed_violation_counts


@pytest.fixture(scope="module")
def events_schema():
    return Schema.define(
        [
            ("event_id", "integer"),
            ("event_type", "string", {"choices": ["click", "view", "purchase", "signup"]}),
            ("value", "float", {"gt": 0}),
        ]
    )


class TestStreaming:
    def test_foreachbatch_validation(self, spark, events_schema, sf_dir, tmp_path):
        src_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
        # read only the events file via glob
        stream = (
            spark.readStream.schema(src_schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
        sink = str(tmp_path / "violations")
        ckpt = str(tmp_path / "ckpt")
        q = streaming_validate(
            events_schema, stream, row_key="event_id",
            violations_sink=sink, checkpoint_dir=ckpt,
        )
        q.processAllAvailable()
        q.stop()
        got = spark.read.parquet(sink)
        # must equal the batch engine's verdict on the same data
        from sinter_spark.binding import bind

        batch = bind(events_schema, spark.read.parquet(f"{sf_dir}/events.parquet"), row_key="event_id")
        assert got.count() == batch.violations.count()
        assert set(got.columns) == {"row_key", "path", "code", "message", "context", "epoch_id"}

    def test_windowed_violation_counts(self, spark, events_schema, sf_dir, tmp_path):
        src_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
        stream = (
            spark.readStream.schema(src_schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
        agg = windowed_violation_counts(
            events_schema, stream, ts_col="ts", row_key="event_id", window="1 hour"
        )
        q = (
            agg.writeStream.outputMode("append")
            .format("memory")
            .queryName("viol_windows")
            .option("checkpointLocation", str(tmp_path / "ckpt2"))
            .start()
        )
        q.processAllAvailable()
        q.stop()
        rows = spark.sql("select * from viol_windows").collect()
        assert rows  # windows materialized
        assert sum(r["rows"] for r in rows) > 0
        assert all(set(r.asDict()) == {"window", "rows", "violations", "bad_rows"} for r in rows)


class TestMultimodal:
    @pytest.fixture(scope="class")
    def img_df(self, spark):
        return generate_images(spark, 300, seed=5, max_dim=32, partitions=2).cache()

    def test_decode_features(self, spark, img_df):
        feats = decode_image_features(img_df)
        rows = feats.collect()
        assert len(rows) == 300
        ok = [r for r in rows if r["ok"]]
        assert len(ok) > 250
        assert all(0 <= r["brightness"] <= 255 for r in ok)
        stubs = [r for r in rows if r["err"] and r["err"].startswith("stub:")]
        # fmt='webp' rows hit the stub path, not a crash
        assert all(s["err"] == "stub:webp" for s in stubs)

    def test_resize(self, spark, img_df):
        from sinter_spark.images import codecs

        out = resize_images(img_df, 16).collect()
        good = [r for r in out if r["bytes"] is not None]
        assert good
        px = codecs.decode_raw(bytes(good[0]["bytes"]))
        assert px.shape == (16, 16, 3)

    def test_video_frame_stub(self, spark, img_df):
        vids = img_df.select(
            F.col("image_id").alias("video_id"), F.col("bytes")
        ).limit(10)
        frames = sample_video_frames(vids, n_frames=4).collect()
        assert len(frames) == 40
        assert {f["frame_idx"] for f in frames} == {0, 1, 2, 3}


class TestStatefulStreaming:
    def test_violation_streak_alarms(self, spark, tmp_path):
        import pandas as pd
        from pyspark.sql import functions as F

        from sinter_spark.streaming.stateful import violation_streaks

        # synthetic stream: user 1 has 4 consecutive bad rows, user 2 clean
        rows = []
        for i in range(10):
            rows.append({"event_id": i, "user_id": 1, "ts": float(i),
                         "value": -1.0 if 3 <= i <= 6 else 5.0})
        for i in range(10, 20):
            rows.append({"event_id": i, "user_id": 2, "ts": float(i), "value": 5.0})
        src = str(tmp_path / "src")
        spark.createDataFrame(pd.DataFrame(rows)).write.parquet(src)

        schema = Schema.define([("event_id", "integer"), ("value", "float", {"gt": 0})])
        stream = spark.readStream.schema("event_id long, user_id long, ts double, value double").parquet(src)
        alarms = violation_streaks(
            schema, stream, key_col="user_id", ts_col="ts",
            row_key="event_id", streak_threshold=3,
        )
        q = (
            alarms.writeStream.outputMode("append").format("memory")
            .queryName("alarms").option("checkpointLocation", str(tmp_path / "ck"))
            .start()
        )
        q.processAllAvailable()
        q.stop()
        got = {(r["key"], r["streak"]) for r in spark.sql("select * from alarms").collect()}
        # user 1's streak peaks at 4 (rows 3..6); user 2 never violates
        assert got == {("1", 4)}
