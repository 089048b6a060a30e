from valentinus_spark.streaming.pipeline import (
    stream_events_windowed,
    stream_collection_append,
    stream_dedup_exact,
    stream_stream_join,
)
from valentinus_spark.streaming.stateful import stream_user_totals

__all__ = [
    "stream_events_windowed",
    "stream_collection_append",
    "stream_dedup_exact",
    "stream_stream_join",
    "stream_user_totals",
]
