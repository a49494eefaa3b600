"""Sessionization: gap-based event sessions, batch and stateful-streaming.

The reference has no streaming operators (SURVEY §2.15); this is the
engine's custom-stateful-operator surface: the SAME session semantics
(events of one user belong to one session while consecutive gaps stay
under `gap`) implemented twice —

  * batch: window functions (lag -> gap flags -> running session index ->
    groupBy), fully SQL-expressible, so the driver oracles it;
  * streaming: `applyInPandasWithState` keyed by user, carrying the open
    session (start, last_ts, count, sum) across triggers and emitting a
    session row the moment a gap closes it.

The batch form is the correctness anchor; the stateful form is tested to
produce exactly the batch result for all sessions CLOSED by a later event
(the final open session per user lives in state until a timeout fires,
which an availableNow drain never reaches — the documented difference).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (DoubleType, LongType, StructField, StructType,
                               TimestampType)


def sessionize_batch(events: DataFrame, gap_minutes: float) -> DataFrame:
    """(user_id, sess_start, n_events, sum_val) — one row per session."""
    from pyspark.sql import Window
    e = events.withColumn("_ts", F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("_ts")
    gap = gap_minutes * 60.0
    prev = F.lag(F.col("_ts")).over(w)
    # fractional-epoch compare (cast-to-double keeps microseconds;
    # unix_timestamp would truncate to seconds and disagree with the oracle)
    is_new = F.when(
        prev.isNull()
        | ((F.col("_ts").cast("double") - prev.cast("double")) > gap),
        1).otherwise(0)
    e = e.withColumn("_new", is_new) \
         .withColumn("_sess", F.sum("_new").over(
             w.rowsBetween(Window.unboundedPreceding, 0)))
    return (e.groupBy("user_id", "_sess")
            .agg(F.min("_ts").alias("sess_start"),
                 F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 6).alias("sum_val"))
            .drop("_sess"))


_OUT = StructType([
    StructField("user_id", LongType()),
    StructField("sess_start", TimestampType()),
    StructField("n_events", LongType()),
    StructField("sum_val", DoubleType()),
])

_STATE = StructType([
    StructField("start", LongType()),       # epoch MICROseconds (exact)
    StructField("last", LongType()),
    StructField("n", LongType()),
    StructField("s", DoubleType()),
])


def sessionize_stateful(events: DataFrame, gap_minutes: float) -> DataFrame:
    """Streaming twin: applyInPandasWithState keyed by user_id. Emits each
    session when a subsequent event closes it (gap exceeded). Works on a
    batch DataFrame too (Spark runs the same code path per group)."""
    gap_us = int(gap_minutes * 60.0 * 1_000_000)

    def fn(key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            start, last, n, s = state.get
        else:
            start = last = None
            n, s = 0, 0.0
        closed = []
        for pdf in pdfs:
            pdf = pdf.sort_values("ts")
            for ts, val in zip(pdf["ts"], pdf["value"]):
                t = ts.value // 1000          # ns -> us, exact integer
                if last is not None and (t - last) > gap_us:
                    closed.append((user_id, pd.Timestamp(start, unit="us"),
                                   n, round(s, 6)))
                    start, n, s = None, 0, 0.0
                if start is None:
                    start = t
                n += 1
                s += float(val)
                last = t
        state.update((start, last, n, s))
        yield pd.DataFrame(closed, columns=[f.name for f in _OUT.fields])

    e = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return e.groupBy("user_id").applyInPandasWithState(
        fn, _OUT, _STATE, "append", GroupStateTimeout.NoTimeout)
