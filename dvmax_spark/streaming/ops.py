"""[EXT] Structured Streaming operators (SURVEY.md §2.11 — the
reference has none; these follow Spark's documented semantics and are
verified by batch-equivalence, per SURVEY §7 step 6).

The transformations are written against plain DataFrames so the SAME
function body serves batch and streaming inputs — `F.window`,
`session_window`, watermarks and `dropDuplicatesWithinWatermark`
compose identically; only the source/sink differ.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def tumbling_counts(events: DataFrame, width: str = "1 hour", watermark: str = "1 hour") -> DataFrame:
    """Tumbling-window counts+sums per event_type. Works on batch and
    streaming frames alike (watermark applied only when streaming)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sliding_counts(
    events: DataFrame, width: str = "1 hour", slide: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", width, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )


def session_counts_batch(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Session windows per user (session closes after ``gap`` idle).

    Uses the native session_window (same operator streaming uses with a
    watermark); one row per (user, session)."""
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def streaming_dedup(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming dedup on event_id within the watermark horizon."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    if events.isStreaming:
        return src.dropDuplicatesWithinWatermark(["event_id"])
    return src.dropDuplicates(["event_id"])


def read_events_stream(spark: SparkSession, path_dir: str, max_files: int = 1) -> DataFrame:
    """File-based streaming source over a directory of event parquet
    (the Kafka stand-in for local verification)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path_dir)
    )


def run_stream_once(stream_df: DataFrame, query_name: str, output_mode: str = "complete"):
    """Drive a streaming frame to completion against a memory sink and
    return the final result as a batch DataFrame."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return stream_df.sparkSession.sql(f"SELECT * FROM {query_name}")
