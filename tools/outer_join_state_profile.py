"""r11 (r10 VERDICT item 7): profile the stream-stream LEFT OUTER interval
join at sf0.1 vs 100x and answer WHAT drives the 12.3x wall ratio — state
size or compute.

Reuses the registered query's exact stream construction but owns the
writeStream, so it can read ``recentProgress`` (state-operator rows/bytes
+ per-batch durationMs) before stopping.  Output: one JSON per scale.

Usage: SPARK_GRAFT_DRIVER_MEM=64g python tools/outer_join_state_profile.py
"""

from __future__ import annotations

import json
import sys
import time
import uuid
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def profile(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from msgraphdatapipelines_spark import streaming as ST
    from msgraphdatapipelines_spark.queries.streaming import _ensure_sentineled_events

    root = _ensure_sentineled_events(sf_dir)
    purchases = (
        ST.read_events_stream(spark, root, glob="*.parquet")
        .filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("event_id").alias("p_event_id"), F.col("ts").alias("p_ts"))
    )
    clicks = (
        ST.read_events_stream(spark, root, glob="*.parquet")
        .filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user_id"),
            F.col("event_id").alias("c_event_id"),
            F.col("ts").alias("c_ts"),
        )
    )
    joined = ST.interval_join(
        purchases, clicks, "user_id", "c_user_id", "p_ts", "c_ts",
        interval="1 hour", watermark="1 hour", how="left_outer",
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    name = f"prof_{uuid.uuid4().hex[:8]}"
    t0 = time.monotonic()
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "32")  # state-partition bound
        q = joined.writeStream.outputMode("append").format("memory").queryName(name).start()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    try:
        q.processAllAvailable()
        wall = round(time.monotonic() - t0, 2)
        progress = [json.loads(p) for p in (q.recentProgress or [])] if isinstance(
            (q.recentProgress or [None])[0], str
        ) else list(q.recentProgress or [])
    finally:
        q.stop()
    rows = spark.table(name).count()

    dur_keys = ("addBatch", "getBatch", "queryPlanning", "walCommit", "commitOffsets", "triggerExecution")
    durations = {k: 0 for k in dur_keys}
    max_state_rows = 0
    max_state_bytes = 0
    n_batches = 0
    for p in progress:
        n_batches += 1
        for k in dur_keys:
            durations[k] += int(p.get("durationMs", {}).get(k, 0))
        for so in p.get("stateOperators", []):
            max_state_rows = max(max_state_rows, int(so.get("numRowsTotal", 0)))
            max_state_bytes = max(max_state_bytes, int(so.get("memoryUsedBytes", 0)))
    return {
        "wall_s": wall,
        "result_rows": rows,
        "n_batches": n_batches,
        "duration_ms_totals": durations,
        "max_state_rows": max_state_rows,
        "max_state_mb": round(max_state_bytes / 1e6, 1),
    }


def main() -> None:
    from msgraphdatapipelines_spark.session import get_spark

    spark = get_spark("outer_state_profile")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for tag, sf in [("sf0.1", "/root/testdata/sf0.1"), ("100x", str(ROOT / ".tmp" / "sf_sweep_100x"))]:
        out[tag] = profile(spark, sf)
        print(f"{tag}: {out[tag]}", file=sys.stderr)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
