from dvmax_spark.streaming.ops import (
    tumbling_counts,
    sliding_counts,
    session_counts_batch,
    read_events_stream,
    run_stream_once,
)

__all__ = [
    "tumbling_counts",
    "sliding_counts",
    "session_counts_batch",
    "read_events_stream",
    "run_stream_once",
]
