"""The round-5 text-pipeline operators are stateless Column passes, so
they must run UNCHANGED on Structured Streaming inputs and emit exactly
the batch results — pinned here on a replayed file stream."""

import pytest
from pyspark.sql import functions as F

from sinter_spark.operators.scrub import scrub_text
from sinter_spark.operators.text import quality_features, repetition_features


@pytest.fixture(scope="module")
def text_stream_dir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("textstream"))
    rows = [
        (1, "mail me at a@b.co or https://x.y/z"),
        (2, "a a a b repeated tokens here"),
        (3, ""),
        (4, None),
        (5, "server 10.0.0.1 and user c@d.io"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    # two files so the stream runs >1 task
    df.repartition(2).write.mode("overwrite").parquet(path)
    return path


def _run_stream(spark, path, transform, name):
    schema = spark.read.parquet(path).schema
    stream = spark.readStream.schema(schema).parquet(path)
    q = (
        transform(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"select * from {name}")


@pytest.mark.parametrize(
    "name,op",
    [
        ("scrub", scrub_text),
        ("repetition", repetition_features),
        ("quality", quality_features),
    ],
)
def test_stream_equals_batch(spark, text_stream_dir, name, op):
    batch = sorted(
        map(tuple, op(spark.read.parquet(text_stream_dir)).collect())
    )
    streamed = sorted(
        map(tuple, _run_stream(spark, text_stream_dir, op, f"tp_{name}").collect())
    )
    assert streamed == batch and len(batch) == 5
