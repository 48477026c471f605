"""Streaming deduplication: exact dedup over an unbounded stream with
watermark-bounded state.

A training-data ingest pipeline dedups AT INGEST, not only in batch
backfills: the same normalized-text fingerprint used by the batch path
(``operators.text.fingerprint``) keys the stream dedup, so batch and
stream agree on what counts as a duplicate.

State-boundedness is the whole design problem at 100 TB/day:

* ``dedup_stream`` uses ``dropDuplicatesWithinWatermark`` — state for
  a fingerprint is dropped once the watermark passes its event time +
  delay, so memory is O(distinct keys per watermark window), not
  O(all keys ever). Duplicates arriving WITHIN the delay window are
  suppressed; a copy arriving months later is re-admitted (and the
  batch ``dedup_canonical`` backfill owns that tail). This mirrors how
  production ingest dedup is actually layered (stream = cheap fast
  filter, batch = exact sweep).
* ``dedup_stream_exact`` uses plain ``dropDuplicates`` (state grows
  with distinct keys — exact forever, memory unbounded). Offered for
  completeness and small keyspaces; the watermarked form is the scale
  default.

Both emit the deduped rows plus the fingerprint column (callers can
drop it); the dedup key is configurable for pre-fingerprinted inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators.text import fingerprint


def with_fingerprint(df: DataFrame, text_col: str = "text", out_col: str = "fp") -> DataFrame:
    """Stream-safe projection adding the batch-identical normalized
    fingerprint (md5 of lower/whitespace-collapsed text)."""
    return df.withColumn(out_col, fingerprint(text_col))


def dedup_stream(
    stream: DataFrame,
    *,
    text_col: str = "text",
    event_time_col: str,
    delay: str = "10 minutes",
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Watermark-bounded streaming dedup (the scale default).

    Keeps the first row per fingerprint (or per ``key_cols`` if given)
    within the watermark horizon; state is dropped as the watermark
    advances, so executor memory stays bounded regardless of stream
    age. Requires ``event_time_col`` (timestamp) for the watermark.
    """
    keys = key_cols
    if keys is None:
        stream = with_fingerprint(stream, text_col)
        keys = ["fp"]
        # md5(null) = null and dropDuplicates* treats null keys as
        # EQUAL — without the split, every null-text row in a watermark
        # window would collapse to one. Null-text rows are not
        # duplicates of anything: pass them through (no state held).
        wm = stream.withWatermark(event_time_col, delay)
        return wm.where(F.col("fp").isNotNull()).dropDuplicatesWithinWatermark(
            keys
        ).unionByName(wm.where(F.col("fp").isNull()))
    return stream.withWatermark(event_time_col, delay).dropDuplicatesWithinWatermark(keys)


def dedup_stream_exact(
    stream: DataFrame,
    *,
    text_col: str = "text",
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Unbounded-state exact streaming dedup: every fingerprint ever
    seen stays in state. Use only when the distinct-key space is known
    to fit; ``dedup_stream`` is the 100 TB shape."""
    keys = key_cols
    if keys is None:
        stream = with_fingerprint(stream, text_col)
        keys = ["fp"]
        # same null-key hazard as dedup_stream: null-text rows pass
        return stream.where(F.col("fp").isNotNull()).dropDuplicates(
            keys
        ).unionByName(stream.where(F.col("fp").isNull()))
    return stream.dropDuplicates(keys)
