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

# Idle-key TTL in EVENT time: a (user_id, event_type) key whose last event
# is this far behind the watermark is evicted.  Re-appearing after eviction
# re-emits (at-least-once dedup window) — the bounded-state contract for
# week-long streams.  Event-time (not processing-time) timers on purpose:
# wall-clock timers make the micro-batch engine schedule state-cleanup
# batches indefinitely, so a finite drain (processAllAvailable OR
# availableNow) never terminates — an event-time timer only fires when the
# watermark moves, which only happens with data.
FIRST_SEEN_TTL_MS = 6 * 60 * 60 * 1000


def _first_seen_fn(
    key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Streaming first-occurrence dedup: per (user, event_type) key, keep
    the minimum event_id ever seen; emit only when it improves.

    min() over the batch makes the result independent of intra-batch row
    order — deterministic under any partitioning.  State eviction: an
    event-time TTL (refreshed to last-seen-ts + TTL on every batch touching
    the key) bounds state to recently-active keys.
    """
    if state.hasTimedOut:
        state.remove()
        return
    prev = state.get[0] if state.exists else None
    mn = prev
    max_ts_ms = None
    for pdf in pdfs:
        if len(pdf):
            m = int(pdf["event_id"].min())
            mn = m if mn is None else min(mn, m)
            t = int(pdf["ts"].max().value // 1_000_000)
            max_ts_ms = t if max_ts_ms is None else max(max_ts_ms, t)
    if mn is not None and mn != prev:
        state.update((mn,))
        yield pd.DataFrame(
            {"user_id": [key[0]], "event_type": [key[1]], "first_event_id": [mn]}
        )
    if state.exists and max_ts_ms is not None:
        # must be strictly beyond the current watermark or Spark rejects it
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(max_ts_ms + FIRST_SEEN_TTL_MS, wm + 1))


def first_seen_dedup(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Apply the first-occurrence dedup state machine to a stream keyed by
    (user_id, event_type), with an event-time TTL bounding state size.
    The watermark on ``ts`` drives both late-data semantics and timer
    firing (EventTimeTimeout requires one).

    Watermark caveat for batch-equality drains (r2 ADVICE): events more
    than ``watermark`` behind the advancing watermark are dropped BEFORE
    the state function sees them, so the streamed result equals the batch
    GROUP-BY-min only when the input arrives in one micro-batch (the
    registered oracle drain: one file, availableNow) or when ``watermark``
    is at least the input's event-time span.  A multi-batch, out-of-order
    replay with a narrow watermark can silently miss the true minimum
    event_id — that is correct streaming semantics (late data is late),
    not an engine bug, but oracle drains must account for it.
    """
    return events.withWatermark("ts", watermark).groupBy(
        "user_id", "event_type"
    ).applyInPandasWithState(
        _first_seen_fn,
        FIRST_SEEN_SCHEMA,
        FIRST_SEEN_STATE,
        "update",
        GroupStateTimeout.EventTimeTimeout,
    )
