from valentinus_spark.streaming.pipeline import (
    stream_events_windowed,
    stream_collection_append,
    stream_commit_versions,
    stream_dedup_exact,
    stream_events_sessionized,
    stream_hll_registers,
    stream_incremental_dedup,
    stream_static_enrich,
    stream_stream_join,
    write_ordered_batches,
)
from valentinus_spark.streaming.stateful import stream_user_totals

__all__ = [
    "stream_events_windowed",
    "stream_events_sessionized",
    "stream_collection_append",
    "stream_commit_versions",
    "stream_dedup_exact",
    "stream_hll_registers",
    "stream_incremental_dedup",
    "stream_static_enrich",
    "stream_stream_join",
    "stream_user_totals",
    "write_ordered_batches",
]
