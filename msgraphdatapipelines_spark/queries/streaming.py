"""Streaming queries (SURVEY.md §2.5) over ``events``, oracle-checked.

``stream_tumbling_counts`` runs a REAL Structured Streaming job (file
source → watermark → window agg → memory sink, drained synchronously); its
append-mode output is deterministic — exactly the windows whose end ≤
final watermark (max event time − delay) — so a batch SQL oracle can
reproduce it.  Sliding and session windows use the same window operators in
batch mode (identical semantics, SQL-expressible).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import streaming as ST
from . import load_events, register

TS_FMT = "yyyy-MM-dd HH:mm:ss"


@register(
    "stream_tumbling_counts",
    oracle="""
    WITH w AS (
        SELECT to_timestamp(floor(epoch(ts) / 3600) * 3600) AS ws,
               event_type, value
        FROM events
    ),
    agg AS (
        SELECT ws, event_type, count(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM w GROUP BY ws, event_type
    )
    SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, n, sum_value
    FROM agg
    WHERE ws + INTERVAL 1 HOUR
          <= (SELECT max(ts) FROM events) - INTERVAL 1 HOUR
    """,
)
def stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-window aggregation, executed as a real stream
    (readStream → withWatermark 1h → 1h windows → append-mode memory sink).
    Append emits exactly the finalized windows: end ≤ max(ts) − watermark —
    which the batch oracle reproduces.  Late-data drop semantics are
    pytest-covered with a two-batch file sequence."""
    # the conf must be set before the streaming parquet source is planned
    from . import _harden

    _harden(spark)
    ev = ST.read_events_stream(spark, sf_dir, glob="events.parquet")
    agg = ST.tumbling_counts(ev, window="1 hour", watermark="1 hour")
    result, _ = ST.run_stream_to_memory(agg, output_mode="append")
    return result.select(
        F.date_format("window.start", TS_FMT).alias("window_start"),
        "event_type",
        "n",
        F.col("sum_value_dec").cast("double").alias("sum_value"),
    )


@register(
    "stream_sliding_windows",
    oracle="""
    WITH starts AS (
        SELECT to_timestamp(floor(epoch(ts) / 3600) * 3600) AS w0,
               to_timestamp(floor(epoch(ts) / 3600) * 3600 - 3600) AS w1,
               event_type, value, ts
        FROM events
    ),
    assigned AS (
        SELECT unnest([w0, w1]) AS ws, event_type, value FROM starts
    ),
    agg AS (
        SELECT ws, event_type, count(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM assigned
        GROUP BY ws, event_type
    )
    SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, n, sum_value
    FROM agg
    WHERE ws + INTERVAL 2 HOUR
          <= (SELECT max(ts) FROM events) - INTERVAL 1 HOUR
    """,
)
def stream_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (2h length, 1h slide) executed as a REAL stream in
    PRODUCTION shape (r2 VERDICT item 2): watermark 1h + APPEND mode, like
    stream_tumbling_counts — a window emits exactly once when the watermark
    passes its end, then leaves state, so a week-long stream's state stays
    bounded.  Every event lands in two windows (2h/1h overlap); the oracle
    assigns each event to both containing windows via unnest and keeps only
    finalized windows (end ≤ max(ts) − watermark).  The complete-mode drain
    (all windows retained — unbounded state) is demoted to
    tests/test_streaming.py::test_sliding_complete_mode_equals_batch."""
    from . import _harden

    _harden(spark)
    ev = ST.read_events_stream(spark, sf_dir, glob="events.parquet")
    agg = ST.sliding_counts(ev, window="2 hours", slide="1 hour", watermark="1 hour")
    result, _ = ST.run_stream_to_memory(agg, output_mode="append")
    return result.select(
        F.date_format("window.start", TS_FMT).alias("window_start"),
        "event_type",
        "n",
        F.col("sum_value_dec").cast("double").alias("sum_value"),
    )


@register(
    "stream_stateful_first_seen",
    oracle="""
    SELECT user_id, event_type, min(event_id) AS first_event_id
    FROM events
    GROUP BY user_id, event_type
    """,
)
def stream_stateful_first_seen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): streaming
    first-occurrence dedup keyed by (user_id, event_type) — Arrow-batched
    per-key state, emit-on-improvement.  Batch-min makes the result row-order
    independent, so the single-batch run equals the GROUP BY min oracle."""
    from . import _harden
    from ..streaming.stateful import first_seen_dedup

    _harden(spark)
    ev = ST.read_events_stream(spark, sf_dir, glob="events.parquet")
    # availableNow drain + event-time TTL: wall-clock (ProcessingTime)
    # timers would keep the engine in state-cleanup micro-batches forever,
    # so no drain could ever terminate (r2 livelock caught by the sweep)
    result, _ = ST.run_stream_to_memory(
        first_seen_dedup(ev), output_mode="update", available_now=True
    )
    return result


@register(
    "stream_session_windows",
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM events
    ),
    flagged AS (
        SELECT user_id, ts,
               CASE WHEN prev_ts IS NULL
                         OR date_diff('second', prev_ts, ts) > 1800 THEN 1 ELSE 0 END AS new_s
        FROM ordered
    ),
    numbered AS (
        SELECT user_id, ts,
               SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM flagged
    )
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
           count(*) AS n_events
    FROM numbered
    GROUP BY user_id, sid
    HAVING max(ts) + INTERVAL 30 MINUTE
           <= (SELECT max(ts) FROM events) - INTERVAL 1 HOUR
    """,
)
def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-min gap) per user executed as a REAL stream in
    PRODUCTION shape (r2 VERDICT item 2): the native ``session_window``
    state machine with watermark 1h + APPEND mode — a session emits exactly
    once when the watermark passes its end (last event + gap), then leaves
    state, bounding state size on an unbounded stream.  The oracle is the
    classic gaps-and-islands SQL restricted to finalized sessions
    (end ≤ max(ts) − watermark).  The complete-mode drain (every session
    retained forever) is demoted to
    tests/test_streaming.py::test_session_complete_mode_equals_batch."""
    from . import _harden

    _harden(spark)
    ev = ST.read_events_stream(spark, sf_dir, glob="events.parquet")
    result, _ = ST.run_stream_to_memory(
        ST.session_counts(ev, gap="30 minutes", watermark="1 hour"), output_mode="append"
    )
    return result.select(
        "user_id",
        F.date_format("session_window.start", TS_FMT).alias("session_start"),
        F.date_format("session_window.end", TS_FMT).alias("session_end"),
        "n_events",
    )
