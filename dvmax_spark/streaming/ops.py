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


def interval_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    lower: str = "0 seconds",
    upper: str = "1 hour",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Equi-key join with a time-interval condition:
    ``left_ts + lower <= right_ts <= left_ts + upper``.

    Works identically on batch and streaming frames. For stream-stream
    joins, BOTH sides get event-time watermarks — the condition plus
    the watermarks are what let Spark bound the join state (drop
    buffered rows once they can no longer match), which is the
    difference between an unbounded-state join and one that runs
    forever at cluster scale. Outer stream-stream joins additionally
    emit unmatched rows only after the watermark closes their window.
    """
    lf = left.withWatermark(left_ts, watermark) if left.isStreaming else left
    rf = right.withWatermark(right_ts, watermark) if right.isStreaming else right
    la, ra = lf.alias("_l"), rf.alias("_r")
    # the interval bound must be part of the JOIN condition (not a
    # post-filter): that is what lets Spark expire buffered state, and
    # what keeps outer-join null rows correct
    cond = (
        (F.col(f"_r.{right_ts}") >= F.col(f"_l.{left_ts}") + F.expr(f"INTERVAL {lower}"))
        & (F.col(f"_r.{right_ts}") <= F.col(f"_l.{left_ts}") + F.expr(f"INTERVAL {upper}"))
    )
    for k in keys:
        cond = (F.col(f"_l.{k}") == F.col(f"_r.{k}")) & cond
    out_cols = (
        [F.col(f"_l.{k}").alias(k) for k in keys]
        + [F.col(f"_l.{c}") for c in lf.columns if c not in keys]
        + [F.col(f"_r.{c}") for c in rf.columns if c not in keys]
    )
    return la.join(ra, cond, how).select(*out_cols)


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
