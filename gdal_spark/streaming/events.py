"""Structured Streaming surface.

The reference is batch-only (SURVEY.md §1.4/§2.15 — no watermarks or
streaming operators in GDAL); this module is the engine's forward-looking
ingest path: the SAME transformation graph runs over a batch DataFrame and a
file-source stream (readStream -> transform -> writeStream), so a pipeline
developed on historical pages/events tables deploys unchanged against a
landing directory of incoming WARC batches.

Late data: event-time watermark + tumbling windows — state is bounded, which
is the difference between 'works on the demo' and 'runs for a month on the
crawl firehose'.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_event_counts(events: DataFrame, window: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window counts + value sums per event_type. Works identically
    on batch and streaming inputs (the streaming plan adds state cleanup at
    the watermark)."""
    # parquet TIMESTAMP_NTZ -> TIMESTAMP: watermarks require an instant type
    e = events.withColumn("ts", F.col("ts").cast("timestamp"))
    if e.isStreaming:
        e = e.withWatermark("ts", watermark)
    return (e.groupBy(F.window("ts", window).alias("win"), "event_type")
            .agg(F.count("*").alias("n"),
                 F.sum("value").alias("sum_val"))
            .select(F.col("win.start").alias("win_start"), "event_type",
                    "n", "sum_val"))


def stream_events_from_dir(spark: SparkSession, src_dir: str,
                           schema) -> DataFrame:
    """File-source stream over a landing directory of parquet drops —
    maxFilesPerTrigger bounds per-batch work (backpressure)."""
    return (spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 4)
            .parquet(src_dir))


def run_available_now(stream_df: DataFrame, query_name: str,
                      checkpoint_dir: str, output_mode: str = "complete"):
    """Drain everything currently in the source into a memory sink
    (Trigger.AvailableNow) — the test/CI harness; production would use a
    parquet/Iceberg sink with the same checkpoint contract."""
    q = (stream_df.writeStream
         .format("memory")
         .queryName(query_name)
         .outputMode(output_mode)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(300)
    return q
