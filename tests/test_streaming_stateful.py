"""Regression: the stateful first-seen stream must DRAIN AND TERMINATE.

ProcessingTimeTimeout timers (the r2 TTL that bounds state) make the
micro-batch engine schedule state-cleanup batches indefinitely, so a
processAllAvailable drain livelocks — the query fn must use the
availableNow drain.  The golden check: streamed first-seen == batch
GROUP BY min over the same events.
"""

from __future__ import annotations

import threading

from pyspark.sql import functions as F

from msgraphdatapipelines_spark.queries import REGISTRY, _ensure_loaded, load_events


def test_stateful_first_seen_drains_and_matches_batch(spark, sf_dir):
    _ensure_loaded()
    holder: dict = {}

    def run():
        df = REGISTRY["stream_stateful_first_seen"].fn(spark, sf_dir)
        holder["rows"] = {
            (r["user_id"], r["event_type"]): r["first_event_id"] for r in df.collect()
        }

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(timeout=300)
    assert not t.is_alive(), "stateful stream did not terminate (timer livelock)"

    expected = {
        (r["user_id"], r["event_type"]): r["first_event_id"]
        for r in load_events(spark, sf_dir)
        .groupBy("user_id", "event_type")
        .agg(F.min("event_id").alias("first_event_id"))
        .collect()
    }
    assert holder["rows"] == expected
