"""Pipeline registry (SURVEY.md §3.2).

The reference's multi-entity driver (`Export-MSIntuneCloudPCs.ps1`) runs N
endpoints per invocation, dispatching each to its own transform and sink,
and one entity's failure does not stop the next (`continue` at
`Export…ps1:163,170,207`).  The engine expresses that as a registry of
``Pipeline(source, transform, sink)`` executed independently — each entity
is its own DataFrame lineage, so on a cluster the Spark scheduler can run
them concurrently and a failure is isolated per entity.
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

log = logging.getLogger("msgraphdatapipelines_spark")


@dataclass
class Pipeline:
    """One entity's E-T-L: source → transform → sink (SURVEY.md §3.1 stages)."""

    name: str
    source: Callable[[SparkSession], DataFrame]
    transform: Callable[[DataFrame], DataFrame] = field(default=lambda df: df)  # T9 no-op
    sink: Callable[[DataFrame], None] | None = None


@dataclass
class RunResult:
    name: str
    ok: bool
    rows: int | None
    elapsed_s: float
    error: str | None = None


def run_all(spark: SparkSession, pipelines: list[Pipeline]) -> list[RunResult]:
    """Run each pipeline; per-entity failure isolation (S5 error-skip,
    `Invoke…ps1:150-162` / `Export…ps1:204-208`) — log and continue."""
    results = []
    for p in pipelines:
        t0 = time.monotonic()
        try:
            df = p.transform(p.source(spark))
            rows = None
            if p.sink is not None:
                p.sink(df)
            else:
                rows = df.count()
            results.append(RunResult(p.name, True, rows, time.monotonic() - t0))
        except Exception as e:  # noqa: BLE001 — entity isolation is the contract
            log.exception("pipeline %s failed", p.name)
            results.append(RunResult(p.name, False, None, time.monotonic() - t0, str(e)))
    return results
