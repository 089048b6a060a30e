from valentinus_spark.streaming.pipeline import (
    stream_events_windowed,
    stream_collection_append,
)
from valentinus_spark.streaming.stateful import stream_user_totals

__all__ = [
    "stream_events_windowed",
    "stream_collection_append",
    "stream_user_totals",
]
