"""Structured Streaming validation.

The reference's ``validate_stream`` (``/root/reference/lib/sinter/
validator.ex:673-679``) is a lazy, constant-memory per-element map;
its distributed analogue is a Structured Streaming query: the same
compiled constraint plan (compile-once / bind-many, ``sinter.ex:
279-319``) applied inside ``foreachBatch``, plus watermarked windowed
violation aggregates for monitoring late-arriving data.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, functions as F

from ..binding import bind
from ..schema import Schema


def streaming_validate(
    schema: Schema,
    stream_df: DataFrame,
    *,
    row_key: str,
    violations_sink: str,
    checkpoint_dir: str,
    trigger: dict | None = None,
    **bind_opts,
):
    """Validate a stream; violation rows land in a parquet sink
    partitioned by ``epoch_id``, written idempotently: each micro-batch
    OVERWRITES its own epoch partition, so a batch replayed after a
    failure (foreachBatch is at-least-once) replaces rather than
    duplicates its rows — end-to-end exactly-once at the sink.

    Returns the StreamingQuery handle (call ``processAllAvailable()`` in
    tests, ``awaitTermination()`` in jobs)."""

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        res = bind(schema, batch_df, row_key=row_key, **bind_opts)
        # epoch_id lives in the partition DIRECTORY (readers recover it
        # via partition discovery) — embedding it as a data column too
        # would collide with the inferred partition column on read
        res.violations.write.mode("overwrite").parquet(
            f"{violations_sink}/epoch_id={epoch_id}"
        )

    writer = (
        stream_df.writeStream.outputMode("update")
        .foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def windowed_violation_counts(
    schema: Schema,
    stream_df: DataFrame,
    *,
    ts_col: str,
    row_key: str,
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
    **bind_opts,
) -> DataFrame:
    """Watermarked windowed aggregate of violation counts per code —
    a streaming DataFrame ready for writeStream (append mode)."""
    # watermarks require TIMESTAMP (session-TZ); parquet NTZ cols get cast
    src = stream_df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    flagged = bind(
        schema,
        src.withWatermark(ts_col, watermark),
        row_key=row_key,
        keep_cols=[ts_col],
        **bind_opts,
    ).flagged
    win = F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    # keep the event-time column through the projection for windowing
    exploded = (
        flagged.withColumn("__n_viol", F.size("__errs"))
        .groupBy(win.alias("window"))
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum("__n_viol").alias("violations"),
            F.sum((F.col("__n_viol") > 0).cast("long")).alias("bad_rows"),
        )
    )
    return exploded
