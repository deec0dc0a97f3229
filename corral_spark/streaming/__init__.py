from corral_spark.streaming.ops import (
    read_events_stream,
    run_available_now,
    session_agg,
    sliding_agg,
    tumbling_agg,
)

__all__ = [
    "read_events_stream",
    "run_available_now",
    "session_agg",
    "sliding_agg",
    "tumbling_agg",
]
