"""Streaming near-dup (MinHash + banded LSH over a watermarked
stream-stream self-join) ≡ the batch path on a replayed fixture.

The batch twin is ``minhash_lsh_candidates`` → ``verify_jaccard_pairs``
(same Arrow signature kernel, same banding expression, same exact
Jaccard verification), so for docs within one watermark horizon the
candidate/verified pair sets must be IDENTICAL.
"""

import pytest
from pyspark.sql import functions as F

from sinter_spark.operators import dedup
from sinter_spark.streaming import minhash_signatures_stream, neardup_stream


@pytest.fixture(scope="module")
def near_docs(spark):
    base = "the quick brown fox jumps over the lazy dog while rain falls on the plain"
    rows = [
        (1, base, "2024-01-01 00:00:00"),
        (2, base + " today", "2024-01-01 00:01:00"),          # near-dup of 1
        (3, base.replace("quick", "swift"), "2024-01-01 00:02:00"),  # near-dup of 1
        (4, "completely different text about database engines and queries", "2024-01-01 00:03:00"),
        (5, "another unrelated document discussing mountains and rivers", "2024-01-01 00:04:00"),
        (6, base + " tonight", "2024-01-01 00:05:00"),        # near-dup of 1/2
        (7, None, "2024-01-01 00:06:00"),                      # null text: omitted
    ]
    return spark.createDataFrame(
        rows, "doc_id bigint, text string, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))


@pytest.fixture(scope="module")
def stream_dir(spark, near_docs, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("neardup_stream"))
    # several files → several micro-batches with maxFilesPerTrigger
    for i, part in enumerate([[1, 2, 3], [4, 5], [6, 7]]):
        near_docs.where(F.col("doc_id").isin(part)).coalesce(1).write.mode(
            "append"
        ).parquet(path)
    return path


def _drain(spark, out, name):
    q = out.writeStream.format("memory").queryName(name).outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"select * from {name}")


def test_stream_signatures_equal_batch(spark, near_docs, stream_dir):
    stream = (
        spark.readStream.schema(near_docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    got = _drain(
        spark,
        minhash_signatures_stream(stream, event_time_col="ts", keep_text=False),
        "nd_sigs",
    )
    s = {r["doc_id"]: r["sig"] for r in got.collect()}
    b = {
        r["doc_id"]: r["sig"]
        for r in dedup.minhash_signatures_arrow(near_docs).collect()
    }
    assert s == b  # same kernel, same seed → identical signatures
    assert 7 not in s  # null text omitted on both paths


def test_stream_candidates_equal_batch(spark, near_docs, stream_dir):
    stream = (
        spark.readStream.schema(near_docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    got = _drain(
        spark,
        neardup_stream(stream, event_time_col="ts", delay="1 hour", verify=False),
        "nd_cand",
    )
    stream_pairs = {(r["id_a"], r["id_b"]) for r in got.collect()}
    batch = dedup.minhash_lsh_candidates(near_docs, cache=False, max_bucket=None)
    batch_pairs = {(r["id_a"], r["id_b"]) for r in batch.collect()}
    assert stream_pairs == batch_pairs
    assert len(batch_pairs) > 0  # the fixture really has near-dups


def test_stream_verified_pairs_equal_batch(spark, near_docs, stream_dir):
    stream = (
        spark.readStream.schema(near_docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    got = _drain(
        spark,
        neardup_stream(stream, event_time_col="ts", delay="1 hour", threshold=0.5),
        "nd_verified",
    )
    stream_pairs = {
        (r["id_a"], r["id_b"], r["jaccard"]) for r in got.collect()
    }
    cand = dedup.minhash_lsh_candidates(near_docs, cache=False, max_bucket=None)
    batch_pairs = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in dedup.verify_jaccard_pairs(near_docs, cand, threshold=0.5).collect()
    }
    assert stream_pairs == batch_pairs
    # the near-dup cluster {1,2,3,6} survives verification; 4/5 do not
    ids = {i for p in stream_pairs for i in p[:2]}
    assert {1, 2, 6} <= ids and 4 not in ids and 5 not in ids


def test_watermark_bounds_pairing_horizon(spark, near_docs, stream_dir):
    """Docs farther apart than the delay must NOT pair (state eviction
    horizon = the documented recall contract; batch backfill owns the
    tail)."""
    stream = (
        spark.readStream.schema(near_docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    got = _drain(
        spark,
        neardup_stream(stream, event_time_col="ts", delay="90 seconds", verify=False),
        "nd_horizon",
    )
    pairs = {(r["id_a"], r["id_b"]) for r in got.collect()}
    for id_a, id_b in pairs:
        assert abs(id_a - id_b) <= 2  # fixture spaces docs 1 min apart
    assert (1, 2) in pairs  # 1 min apart: within horizon
    assert (1, 6) not in pairs  # 5 min apart: evicted


def test_dedup_pairs_no_duplicate_pairs_within_horizon(spark, near_docs, stream_dir):
    """VERDICT_r03 #6: dedup_pairs=True folds the documented
    dropDuplicatesWithinWatermark chain into the operator — each
    (id_a, id_b) pair surfaces ONCE in append mode even when several
    band-buckets agree."""
    stream = (
        spark.readStream.schema(near_docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    got = _drain(
        spark,
        neardup_stream(
            stream, event_time_col="ts", delay="1 hour", verify=True,
            threshold=0.5, dedup_pairs=True,
        ),
        "nd_dedup_pairs",
    ).collect()
    pairs = [(r["id_a"], r["id_b"]) for r in got]
    assert len(pairs) == len(set(pairs)), pairs  # no duplicates
    # and the deduped pair SET equals the raw stream's distinct set
    stream2 = (
        spark.readStream.schema(near_docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    raw = _drain(
        spark,
        neardup_stream(stream2, event_time_col="ts", delay="1 hour", verify=True, threshold=0.5),
        "nd_raw_pairs",
    ).collect()
    assert set(pairs) == {(r["id_a"], r["id_b"]) for r in raw}
