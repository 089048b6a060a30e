from valentinus_spark.streaming.pipeline import (
    stream_events_windowed,
    stream_collection_append,
)

__all__ = ["stream_events_windowed", "stream_collection_append"]
