"""SQL entry point — run plain ANSI SQL against the warehouse tables.

The reference's only "query language" is the T-SQL inside its stored
procedures (SURVEY.md §2.5); the Spark engine gets a full SQL surface for
free from Catalyst.  This module is the ergonomics glue: register every
warehouse parquet table as a temp view once, then ``spark.sql(...)``
anything — the same declarative plans (pushdown, pruning, AQE) the
DataFrame queries get, because both compile through the same optimizer.

``register_views`` is idempotent and cheap (view registration is lazy —
no scan happens until a query runs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .queries import _harden, load_events

TABLES = (
    "region nation customer supplier part orders lineitem documents embeddings"
).split()


def register_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register every warehouse table under its bare name as a temp view.

    ``events`` goes through ``queries.load_events`` so its TIMESTAMP(NANOS)
    column arrives as a proper µs timestamp — raw ``spark.read.parquet``
    of that file needs the nanosAsLong legacy conf, which ``_harden``
    pins first (same contract as the driver path).
    """
    _harden(spark)
    for name in TABLES:
        spark.read.parquet(f"{sf_dir}/{name}.parquet").createOrReplaceTempView(name)
    load_events(spark, sf_dir).createOrReplaceTempView("events")
    return [*TABLES, "events"]


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """One-shot: register views, run the SQL, return the DataFrame."""
    register_views(spark, sf_dir)
    return spark.sql(query)
