"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY.md §2.5 — the escape hatch when built-in windowed aggs can't
express the state machine).

State is partitioned by the grouping key, Arrow-batched per group, and
bounded: every operator here carries an explicit eviction rule (timeout or
monotone key) — unbounded state is what kills week-long streams at scale.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

FIRST_SEEN_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("first_event_id", T.LongType()),
    ]
)

FIRST_SEEN_STATE = T.StructType([T.StructField("min_event_id", T.LongType())])

# Idle-key TTL: a (user_id, event_type) key that has not appeared for this
# long is evicted.  Re-appearing after eviction re-emits (at-least-once
# dedup window) — the bounded-state contract for week-long streams.
FIRST_SEEN_TTL_MS = 6 * 60 * 60 * 1000


def _first_seen_fn(
    key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Streaming first-occurrence dedup: per (user, event_type) key, keep
    the minimum event_id ever seen; emit only when it improves.

    min() over the batch makes the result independent of intra-batch row
    order — deterministic under any partitioning.  State eviction: a
    processing-time TTL (refreshed on every batch that touches the key)
    bounds state to recently-active keys.
    """
    if state.hasTimedOut:
        state.remove()
        return
    prev = state.get[0] if state.exists else None
    mn = prev
    for pdf in pdfs:
        if len(pdf):
            m = int(pdf["event_id"].min())
            mn = m if mn is None else min(mn, m)
    if mn is not None and mn != prev:
        state.update((mn,))
        yield pd.DataFrame(
            {"user_id": [key[0]], "event_type": [key[1]], "first_event_id": [mn]}
        )
    if state.exists:
        state.setTimeoutDuration(FIRST_SEEN_TTL_MS)


def first_seen_dedup(events: DataFrame) -> DataFrame:
    """Apply the first-occurrence dedup state machine to a stream keyed by
    (user_id, event_type), with a processing-time TTL bounding state size."""
    return events.groupBy("user_id", "event_type").applyInPandasWithState(
        _first_seen_fn,
        FIRST_SEEN_SCHEMA,
        FIRST_SEEN_STATE,
        "update",
        GroupStateTimeout.ProcessingTimeTimeout,
    )
