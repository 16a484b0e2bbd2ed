from duckdb_sudan__spark.streaming.events import (
    events_stream,
    funnel_stream,
    sessionize_stream,
    tumbling_counts_stream,
)

__all__ = ["events_stream", "funnel_stream", "sessionize_stream", "tumbling_counts_stream"]
