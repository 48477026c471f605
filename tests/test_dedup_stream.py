"""Streaming dedup: watermark-bounded and exact variants agree with
the batch fingerprint semantics on a replayed file stream."""

import pytest
from pyspark.sql import functions as F

from sinter_spark.streaming import dedup_stream, dedup_stream_exact


@pytest.fixture(scope="module")
def doc_stream_dir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("docstream"))
    rows = [
        (1, "alpha beta gamma", "2024-01-01 00:00:00"),
        (2, "ALPHA   beta gamma", "2024-01-01 00:01:00"),  # dup after normalize
        (3, "delta epsilon", "2024-01-01 00:02:00"),
        (4, "alpha beta gamma", "2024-01-01 00:03:00"),  # dup again
        (5, "zeta eta theta", "2024-01-01 00:04:00"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, ts string").withColumn(
        "ts", F.to_timestamp("ts")
    )
    df.coalesce(1).write.mode("overwrite").parquet(path)
    return path


def _run_stream(spark, path, make_sink_df, name):
    schema = spark.read.parquet(path).schema
    stream = spark.readStream.schema(schema).parquet(path)
    out = make_sink_df(stream)
    q = out.writeStream.format("memory").queryName(name).outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"select * from {name}")


def test_watermarked_dedup_keeps_first_per_fingerprint(spark, doc_stream_dir):
    got = _run_stream(
        spark,
        doc_stream_dir,
        lambda s: dedup_stream(s, event_time_col="ts", delay="1 hour"),
        "dedup_wm",
    )
    kept = sorted(r["doc_id"] for r in got.collect())
    # 2 and 4 normalize to doc 1's fingerprint
    assert kept == [1, 3, 5]


def test_exact_dedup_matches_batch_fingerprints(spark, doc_stream_dir):
    got = _run_stream(
        spark,
        doc_stream_dir,
        lambda s: dedup_stream_exact(s),
        "dedup_exact",
    )
    batch_distinct = (
        spark.read.parquet(doc_stream_dir)
        .select(F.md5(F.lower(F.regexp_replace(F.trim("text"), r"\s+", " "))).alias("fp"))
        .distinct()
        .count()
    )
    assert got.count() == batch_distinct == 3


def test_custom_key_cols(spark, doc_stream_dir):
    got = _run_stream(
        spark,
        doc_stream_dir,
        lambda s: dedup_stream(s, event_time_col="ts", delay="1 hour", key_cols=["doc_id"]),
        "dedup_keys",
    )
    assert got.count() == 5  # doc_id is unique → nothing dropped
