from .pipelines import (
    stream_events,
    streaming_dedup_count,
    streaming_order_pipeline,
    streaming_window_agg,
)

__all__ = [
    "stream_events",
    "streaming_dedup_count",
    "streaming_order_pipeline",
    "streaming_window_agg",
]
