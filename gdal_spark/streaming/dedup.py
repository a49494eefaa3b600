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


def minhash_band_claims(docs: DataFrame, ts_col: str = "warc_ts",
                        watermark: str = "2 hours") -> DataFrame:
    """Streaming NEAR-dup gate (the online CCNet/MinHash policy): every
    document stakes a claim on each of its 16 LSH band keys; a band key
    belongs to its FIRST claimant. Returns surviving claims
    (doc_id, band, key) — a document that wins ZERO bands shared every
    band with earlier documents and is a near-duplicate.

    Band keys come from textops.minhash_band_keys_stateless — pure
    per-row array math, so the SAME expression runs on a stream (no
    shuffle before the dedup). Streaming plane: watermark +
    dropDuplicatesWithinWatermark on (band, key), state bounded like
    streaming_dedup. Batch plane (the oracle anchor): deterministic
    first-wins row_number over (ts, doc_id) per key."""
    from ..operators.textops import minhash_band_keys_stateless

    keys = minhash_band_keys_stateless(docs, extra_cols=(ts_col,))
    if docs.isStreaming:
        return keys.withWatermark(ts_col, watermark) \
            .dropDuplicatesWithinWatermark(["band", "key"]) \
            .select("doc_id", "band", "key")
    from pyspark.sql import Window
    w = Window.partitionBy("band", "key") \
        .orderBy(F.col(ts_col), F.col("doc_id"))
    return keys.withColumn("rn", F.row_number().over(w)) \
        .where(F.col("rn") == 1).select("doc_id", "band", "key")


def near_dup_survivors(docs: DataFrame, ts_col: str = "warc_ts") -> DataFrame:
    """(doc_id, n_won) for documents that won >= 1 band claim — the
    keep-set of first-wins near-dup. Batch form; the SQL oracle replays
    it verbatim."""
    claims = minhash_band_claims(docs, ts_col)
    return claims.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_won"))
