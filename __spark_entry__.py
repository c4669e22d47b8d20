"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The implementation lives in ``msgraphdatapipelines_spark`` (see SURVEY.md §2
for the operator inventory each query covers); this module is a thin adapter.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from msgraphdatapipelines_spark import queries as _q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's signature
    computation (JSON decode S3 → predicate P2 → per-key latest-record argmax
    T2 → declared projection P5/T6) on the events fixture."""
    from msgraphdatapipelines_spark.queries.relational import latest_event_per_user

    return latest_event_per_user(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twin per query (omitted for non-SQL-expressible ops)."""
    return _q.oracle_sql()
