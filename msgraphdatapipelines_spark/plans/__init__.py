"""Plan inspection helpers — the engine's scale guardrails.

Used by tests (tests/test_plans.py) to pin the physical properties that
matter at 100 TB: filters reach the scan, projections prune the read
schema, and operators don't shuffle more than designed.  A regression that
adds an Exchange or widens a scan fails CI here long before it burns a
cluster.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001


def optimized_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()  # noqa: SLF001


def num_exchanges(df: DataFrame) -> int:
    """Count shuffle boundaries (Exchange operators, minus reused ones)."""
    plan = physical_plan(df)
    return len(re.findall(r"\bExchange (hashpartitioning|rangepartitioning|SinglePartition)", plan))


def num_broadcasts(df: DataFrame) -> int:
    return physical_plan(df).count("BroadcastExchange")


def pushed_filters(df: DataFrame) -> list[str]:
    """DataFilters/PushedFilters reaching the parquet scan."""
    out = []
    for m in re.finditer(r"(?:PushedFilters|DataFilters): \[([^\]]*)\]", physical_plan(df)):
        out.extend(s.strip() for s in m.group(1).split(",") if s.strip())
    return out


def scan_columns(df: DataFrame) -> list[list[str]]:
    """Column list of each FileScan (the pruned read schema)."""
    scans = []
    for m in re.finditer(r"FileScan parquet \[([^\]]*)\]", physical_plan(df)):
        cols = [c.split("#")[0].strip() for c in m.group(1).split(",") if c.strip()]
        scans.append(cols)
    return scans


def codegen_stage_count(df: DataFrame) -> int:
    """Distinct whole-stage-codegen spans (wider is better — fewer breaks)."""
    return len(set(re.findall(r"\*\((\d+)\)", physical_plan(df))))
