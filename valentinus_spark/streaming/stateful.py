"""Custom stateful streaming operator via applyInPandasWithState.

The reference has no streaming at all (SURVEY.md §2.4); this is the
engine's arbitrary-state surface for operators that watermarked windows
can't express — here a per-user running aggregate that survives across
micro-batches (the canonical "user profile accumulator" of an ingest
pipeline).

State model: one state row per user (n_events, sum_value). Each
micro-batch updates the state from its Arrow batches and emits the new
totals for the users it touched. State is bounded by the key cardinality
and sharded by Spark's state store across executors — at 100 TB of
events the state is still O(|users|), not O(|events|).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

_STATE_SCHEMA = StructType(
    [StructField("n_events", LongType()), StructField("sum_value", DoubleType())]
)


def _update_user_totals(
    key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "sum_value": [round(total, 4)]}
    )


def stream_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (n_events, sum_value) maintained as explicit
    state. Works on a streaming DataFrame grouped by user; each batch
    emits updated totals for touched users.

    The emitted ``user_id`` keeps the INPUT column's type — a pinned
    LongType here would silently coerce string keys through the Arrow
    boundary (the multi-batch replay test feeds string ids)."""
    out_schema = StructType(
        [
            StructField("user_id", events.schema["user_id"].dataType),
            StructField("n_events", LongType()),
            StructField("sum_value", DoubleType()),
        ]
    )
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
