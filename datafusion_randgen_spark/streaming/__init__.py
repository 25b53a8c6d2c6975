"""Structured Streaming surface.

The reference is batch-only (SURVEY.md §2.C: streaming absent), but the
randgen UDF family composes with ``readStream`` for free — a pandas UDF
or Catalyst expression doesn't care whether its batch came from a
micro-batch.  These helpers give the synthetic-data engine a streaming
source (rate + randgen columns) and the standard stateful shapes
(watermarked tumbling windows, session windows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_randgen_spark.functions import exprs


def randgen_stream(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    """Unbounded synthetic-event stream: rate source + randgen columns.

    Each micro-batch draws fresh values (volatile semantics) — the
    streaming analogue of ``SELECT randgen_* FROM generate_series``.
    """
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )  # columns: timestamp, value
    return rate.select(
        F.col("timestamp").alias("ts"),
        F.col("value").alias("event_id"),
        exprs.int64_uniform_expr(F.lit(1), F.lit(1000)).alias("user_id"),
        exprs.element_from_expr(
            F.array(*[F.lit(x) for x in ("view", "click", "purchase", "signup", "error")])
        ).alias("event_type"),
        exprs.float64_uniform_expr(F.lit(0.0), F.lit(100.0)).alias("value"),
    )


def windowed_counts(events: DataFrame, window: str = "5 minutes", watermark: str = "10 minutes") -> DataFrame:
    """Watermarked tumbling-window aggregation (late data dropped after
    the watermark). Works for both batch and streaming DataFrames."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return src.groupBy(F.window("ts", window), "event_type").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("sum_value")
    )


def session_windows(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Built-in session_window aggregation (streaming-native session
    semantics; the batch twin of operators.joins.sessionize)."""
    src = events.withWatermark("ts", "10 minutes") if events.isStreaming else events
    return src.groupBy(F.session_window("ts", gap), "user_id").agg(
        F.count("*").alias("n_events")
    )


def run_stream_to_memory(df: DataFrame, name: str, spark: SparkSession, mode: str = "append"):
    """Drive a streaming DF synchronously into an in-memory table (test
    sink): start → processAllAvailable → stop, then query the table."""
    q = df.writeStream.outputMode(mode).format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {name}")
