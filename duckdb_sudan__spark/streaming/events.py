"""Structured Streaming over the `events` table.

The batch twins of these queries live in operators/analytic.py
(ev_tumbling / ev_sessionize) and are oracle-checked; the streaming
forms here share the same aggregation logic so batch == stream
semantics modulo watermark-dropped late rows.

Design: `readStream` file source over the events parquet (each
micro-batch is one file slice), event-time watermark for state
cleanup, tumbling window agg, and a session window via the built-in
`session_window` (gap-based) — at scale this is the
`applyInPandasWithState`-free path, state store size bounded by the
watermark horizon.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # raw parquet nanos
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-based stream of events; ts converted nanos → timestamp the
    same way as the batch loader (session.load_table)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(sf_dir)
    )
    return stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def tumbling_counts_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """1-hour tumbling window counts + value sums with late-data
    watermark; state is evicted once the watermark passes a window."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
        .select(F.col("win.start").alias("window_start"), "event_type", "n_events", "total_value")
    )


def sessionize_stream(events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour") -> DataFrame:
    """Gap-based session windows per user (the streaming form of
    ev_sessionize). session_window keeps state per open session only."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("win"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("session_value"))
        .select(
            F.col("user_id"),
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def run_stream_to_memory(spark: SparkSession, sf_dir: str, which: str = "tumbling") -> DataFrame:
    """Drive a stream to completion against the static events file and
    return the result as a DataFrame (used by tests and the
    `queries()` rows-only entries)."""
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "events")
        os.makedirs(src)
        os.link(os.path.join(sf_dir, "events.parquet"), os.path.join(src, "events.parquet"))
        events = events_stream(spark, src)
        out = tumbling_counts_stream(events) if which == "tumbling" else sessionize_stream(events)
        name = f"stream_{which}_result"
        q = out.writeStream.format("memory").queryName(name).outputMode("complete").trigger(availableNow=True).start()
        q.awaitTermination(120)
        q.stop()
        return spark.table(name)
