"""Streaming drift: windowed histograms must match the batch histogram
on the same data per window, and PSI/KS scores must match the batch
drift math against the same baseline."""

import pytest
from pyspark.sql import functions as F

from sinter_spark.operators import drift
from sinter_spark.streaming.drift_stream import drift_scores, windowed_histogram


@pytest.fixture(scope="module")
def value_stream_dir(spark, tmp_path_factory):
    """Two 5-minute windows of values with different distributions."""
    path = str(tmp_path_factory.mktemp("valstream"))
    rows = (
        [(i, float(i % 10), "2024-01-01 00:01:00") for i in range(100)]
        + [(100 + i, float(50 + i % 10), "2024-01-01 00:07:00") for i in range(100)]
        # closer rows: append-mode windows emit only when the watermark
        # passes their end, so a later event must exist to close them
        + [(300, 0.0, "2024-01-01 00:20:00")]
    )
    df = spark.createDataFrame(rows, "id bigint, value double, ts string").withColumn(
        "ts", F.to_timestamp("ts")
    )
    df.coalesce(1).write.mode("overwrite").parquet(path)
    return path


def test_windowed_histogram_matches_batch_per_window(spark, value_stream_dir):
    schema = spark.read.parquet(value_stream_dir).schema
    stream = spark.readStream.schema(schema).parquet(value_stream_dir)
    hist = windowed_histogram(
        stream, "value", event_time_col="ts", window="5 minutes",
        delay="1 minute", bins=8, lo=0.0, hi=64.0,
    )
    q = (
        hist.writeStream.format("memory").queryName("winhist")
        .outputMode("append").start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.sql("select * from winhist")
    batch = spark.read.parquet(value_stream_dir)
    for start, end in [("2024-01-01 00:00:00", "2024-01-01 00:05:00"),
                       ("2024-01-01 00:05:00", "2024-01-01 00:10:00")]:
        win_batch = batch.where(f"ts >= '{start}' and ts < '{end}'")
        expect = {
            (r["bin"], r["count"])
            for r in drift.histogram(win_batch, "value", bins=8, lo=0.0, hi=64.0).collect()
        }
        actual = {
            (r["bin"], r["count"])
            for r in got.where(f"win.start = '{start}'").collect()
        }
        assert actual == expect, (start, actual, expect)


def test_drift_scores_match_batch_math(spark, value_stream_dir, tmp_path):
    batch = spark.read.parquet(value_stream_dir)
    # baseline = the first window's distribution
    baseline = drift.histogram(
        batch.where("ts < '2024-01-01 00:05:00'"), "value", bins=8, lo=0.0, hi=64.0
    )
    schema = batch.schema
    stream = spark.readStream.schema(schema).parquet(value_stream_dir)
    hist = windowed_histogram(
        stream, "value", event_time_col="ts", window="5 minutes",
        delay="1 minute", bins=8, lo=0.0, hi=64.0,
    )
    sink = str(tmp_path / "scores")
    q = drift_scores(
        hist, baseline, bins=8, sink_path=sink,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.processAllAvailable()
    q.stop()
    got = {r["window_start"].isoformat(): r for r in spark.read.parquet(sink).collect()}
    base_d = {r["bin"]: r["count"] for r in baseline.collect()}
    # window 1 ≡ baseline → psi ~ 0; window 2 shifted → psi large
    w1 = got["2024-01-01T00:00:00"]
    w2 = got["2024-01-01T00:05:00"]
    assert abs(w1["psi"]) < 1e-6 and w1["ks"] < 1e-9
    assert w2["psi"] > 1.0 and w2["ks"] > 0.5
    # exact agreement with the batch drift math on window 2's histogram
    win2 = drift.histogram(
        batch.where("ts >= '2024-01-01 00:05:00' and ts < '2024-01-01 00:10:00'"),
        "value", bins=8, lo=0.0, hi=64.0,
    )
    cur_d = {r["bin"]: r["count"] for r in win2.collect()}
    assert abs(w2["psi"] - drift.psi(cur_d, base_d, 8)) < 1e-12
    assert abs(w2["ks"] - drift.ks_statistic(cur_d, base_d, 8)) < 1e-12
