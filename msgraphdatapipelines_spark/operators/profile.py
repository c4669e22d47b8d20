"""One-pass table profiling: per-column null counts, distinct counts, and
min/max rendered to strings, in long format.

The data-engineering "describe my table" primitive a 100 TB pipeline runs
before trusting a new feed (reference analog: the row-count / schema sanity
checks around the load in `Invoke-GraphDataPipelineToAzureSQLDatabase.ps1`
and the `Prepare-SQLDatabase.sql` column contracts) — here as ONE Spark job
over ONE scan:

- every column's aggregates live in a single ``df.agg(...)``;
- exact ``count(distinct c)`` over N columns plans as Catalyst's Expand
  (each input row fans out N+1 times before the partial aggregate, one
  shuffle total).  That is the exact-answer trade; pass
  ``exact_distinct=False`` to use ``approx_count_distinct`` instead —
  no Expand, plain partial-agg single pass, the right default at 100 TB
  where ±2% on distinct counts is fine;
- the aggregated single row unpivots driver-side via ``stack`` — O(N)
  literals, no second job.

min/max render through ``renderers`` (column-name → Column-producing
callable) so types with engine-specific string formats (double, timestamp)
can pin an explicit deterministic rendering for cross-engine comparison.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _default_render(c: Column) -> Column:
    return c.cast("string")


def profile_columns(
    df: DataFrame,
    cols: list[str] | None = None,
    renderers: dict[str, Callable[[Column], Column]] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """Profile ``cols`` (default: all) of ``df`` in one aggregation job.

    Returns one row per column: ``column_name, n_rows, n_nulls,
    n_distinct, min_value, max_value`` (min/max as strings; NULL when the
    column is entirely NULL).  ``n_distinct`` excludes NULLs (SQL
    ``count(distinct c)`` semantics).
    """
    cols = cols or df.columns
    renderers = renderers or {}
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n_rows")]
    for c in cols:
        render = renderers.get(c, _default_render)
        col = F.col(c)
        nd = (
            F.count_distinct(col)
            if exact_distinct
            else F.approx_count_distinct(col)
        )
        aggs += [
            F.sum(F.when(col.isNull(), 1).otherwise(0)).alias(f"__nn_{c}"),
            nd.alias(f"__nd_{c}"),
            render(F.min(col)).alias(f"__mn_{c}"),
            render(F.max(col)).alias(f"__mx_{c}"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __nn_{c}, __nd_{c}, __mn_{c}, __mx_{c}" for c in cols
    )
    return one.selectExpr(
        "__n_rows",
        f"stack({len(cols)}, {stack_args}) AS "
        "(column_name, n_nulls, n_distinct, min_value, max_value)",
    ).select(
        "column_name",
        F.col("__n_rows").cast("long").alias("n_rows"),
        F.col("n_nulls").cast("long").alias("n_nulls"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        "min_value",
        "max_value",
    )
