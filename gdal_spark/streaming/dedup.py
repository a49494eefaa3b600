"""Streaming exact deduplication — the crawl-firehose twin of the batch
dedup family (operators/textops.py): the SAME content-key expression, but
with bounded state.

Batch `dropDuplicates` on a stream would keep every key forever; the
scale-correct form is event-time watermark + dropDuplicatesWithinWatermark
(state for a key is dropped once the watermark passes it), so a month-long
run holds hours of keys, not the whole crawl. A duplicate arriving later
than the watermark is re-emitted — the documented at-least-once contract
of late-data dedup; the batch pass downstream removes those stragglers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def content_key(text_col: str = "text") -> "F.Column":
    """The dedup key used by BOTH batch and streaming passes (exact
    dedup: full-content hash, dedup_exact's normalization contract)."""
    return F.sha2(F.col(text_col).cast("string"), 256)


def streaming_dedup(pages: DataFrame, text_col: str = "text",
                    ts_col: str = "warc_ts",
                    watermark: str = "2 hours") -> DataFrame:
    """First occurrence per content hash. Streaming inputs get
    watermarked bounded-state dedup; batch inputs get the equivalent
    dropDuplicates — one function, both planes."""
    p = pages.withColumn("_ts", F.col(ts_col).cast("timestamp")) \
             .withColumn("_key", content_key(text_col))
    if p.isStreaming:
        out = p.withWatermark("_ts", watermark) \
               .dropDuplicatesWithinWatermark(["_key"])
    else:
        out = p.dropDuplicates(["_key"])
    return out.drop("_ts", "_key")
