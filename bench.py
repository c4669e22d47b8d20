"""Benchmark runner — headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": ...}

Per BASELINE.md: median of 3 warm runs per query, local[$SPARK_GRAFT_CPUS],
AQE on.  Each timing forces the full plan with a count-ish action
(``df.foreach(noop)`` would skip result decode; ``toPandas`` would add Arrow
transfer; ``count()`` on a cached-free plan measures engine work).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from msgraphdatapipelines_spark.queries import DEMOTED, REGISTRY, _ensure_loaded
from msgraphdatapipelines_spark.session import get_spark, scale_conf

RUNS = int(os.environ.get("BENCH_RUNS", "3"))


def _input_bytes(sf_dir: str) -> int:
    """On-disk bytes of the warehouse parquet — the input-size argument
    scale_conf sizes partitions/scans from."""
    total = 0
    for root, _, files in os.walk(sf_dir):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    _ensure_loaded()
    # SPARK_GRAFT_SCALE_CONF=1 (r9, r8 VERDICT item 5): derive the session
    # conf from the measured input size via session.scale_conf instead of
    # the fixed local defaults — the A/B knob the sweep protocol records
    extra = None
    if os.environ.get("SPARK_GRAFT_SCALE_CONF"):
        extra = scale_conf(_input_bytes(sf_dir))
        print(f"# scale_conf({_input_bytes(sf_dir)}): {extra}", file=sys.stderr)
    spark = get_spark("bench", extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")

    # optional filters for ad-hoc runs (e.g. scaling sweeps that exclude the
    # documented-quadratic baselines); the driver's plain invocation runs all
    skip = {s for s in os.environ.get("BENCH_SKIP", "").split(",") if s}
    only = {s for s in os.environ.get("BENCH_ONLY", "").split(",") if s}

    # ad-hoc measurement of pytest-gated rows (sweeps / PERF.md evidence);
    # the driver's plain invocation still times the graded registry only
    rows = dict(REGISTRY)
    if os.environ.get("BENCH_INCLUDE_DEMOTED"):
        rows.update(DEMOTED)

    def _release_stale_pins() -> None:
        """r17 OPT (r16 VERDICT item 7, suite session hygiene): the eager
        localCheckpoint pins some query fns create (LSH signature table,
        per-round closure labels) are per-invocation — after a row's last
        timed run its blocks are garbage, but they linger until the JVM
        context cleaner runs, so executor storage pressure accumulates
        ACROSS rows and in-suite numbers drift from isolated ones
        (measured r16: canonical 15.25 s in-suite vs 6.3 s isolated at
        session start).  Dropping every persisted RDD BETWEEN rows (never
        inside the timed region — each timed run re-executes q.fn and
        re-pins its own blocks) makes each row start from the same clean
        storage state an isolated run sees.  Nothing long-lived persists
        RDDs across rows: standing artifacts are parquet, the serve-plan
        memo holds unexecuted plans."""
        try:
            jsc = spark.sparkContext._jsc.sc()
            it = jsc.getPersistentRDDs().iterator()
            while it.hasNext():
                it.next()._2().unpersist(False)
        except Exception:  # noqa: BLE001 — hygiene only; never fail the bench
            pass

    timings: dict[str, float] = {}
    for name, q in rows.items():
        if name in skip or (only and name not in only):
            continue
        # warm-up (plan compile, file listing, code cache)
        q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        samples = []
        for _ in range(RUNS):
            t0 = time.monotonic()
            q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.monotonic() - t0)
        timings[name] = round(statistics.median(samples), 3)
        _release_stale_pins()

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "query_suite_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
