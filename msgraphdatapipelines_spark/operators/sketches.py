"""Mergeable-sketch rollup tables: incremental distinct counting at 100 TB.

The pattern that makes "distinct users over any date range" an O(days)
query instead of an O(corpus) rescan: each ingest increment appends ONE
tiny row per (partition, dimension) holding a Datasketches HLL sketch of
the increment's ids; any range's distinct count is then the estimate of
``hll_union_agg`` over that range's sketch rows.  Because an HLL union
takes per-register maxima, union-of-sketches ≡ sketch-of-union (same
lgConfigK) — merging is exact, order-independent, and re-runnable, which
is what lets the rollup table be appended forever without drift
(pytest-pinned).

Reference analog: the reference re-counts each full load
(`Invoke-GraphDataPipelineToAzureSQLDatabase.ps1` row-count feedback); a
100 TB pipeline cannot — it persists increment sketches and merges.

All sketch state stays JVM-side (``hll_sketch_agg`` binary columns);
Python never touches a register.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_distinct_sketches(
    df: DataFrame,
    part_cols: list[str],
    value_col: str,
    lgk: int = 12,
) -> DataFrame:
    """One HLL sketch row per ``part_cols`` group over ``value_col``.

    One hash aggregation (map-side partials are sketches too — the
    exchange moves O(groups · 2^lgk) bytes, never rows).  The result is
    the appendable rollup-table increment: ``part_cols…, sketch binary,
    n_rows``.  ``lgk`` trades size for accuracy (2^12 registers ≈ ±1.6%).
    """
    return df.groupBy(*part_cols).agg(
        F.hll_sketch_agg(F.col(value_col).cast("string"), F.lit(lgk)).alias("sketch"),
        F.count("*").alias("n_rows"),
    )


def merge_distinct_sketches(
    sketches: DataFrame,
    group_cols: list[str],
    lgk: int = 12,
) -> DataFrame:
    """Merge sketch rows down to ``group_cols`` (drop the increment key):
    ``hll_union_agg`` + estimate.  Input is the (tiny) rollup table, so
    this runs in milliseconds regardless of how much data the sketches
    summarize.  Output: ``group_cols…, distinct_estimate, n_rows``.
    """
    return sketches.groupBy(*group_cols).agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col("sketch"), F.lit(True)))
        .alias("distinct_estimate"),
        F.sum("n_rows").alias("n_rows"),
    )


def build_quantile_sketches(
    df: DataFrame,
    part_cols: list[str],
    value_col: str,
    k: int = 2048,
) -> DataFrame:
    """One KLL quantile sketch row per ``part_cols`` group over a DOUBLE
    ``value_col`` — the percentile counterpart of
    :func:`build_distinct_sketches` (same rollup-table pattern: persist the
    increment's sketch, never rescan).  ``k=2048`` ≈ 0.6% normalized rank
    error.  Output: ``part_cols…, qsketch binary, n_rows``.
    """
    return df.groupBy(*part_cols).agg(
        F.kll_sketch_agg_double(F.col(value_col).cast("double"), F.lit(k)).alias("qsketch"),
        F.count(value_col).alias("n_rows"),
    )


def merge_quantile_sketches(
    sketches: DataFrame,
    group_cols: list[str],
    quantiles: list[float],
) -> DataFrame:
    """Merge KLL sketch rows down to ``group_cols`` and estimate
    ``quantiles``.

    Spark exposes KLL merge as a BINARY function (no union aggregate), so
    the rows fold: ``sort_array(collect_list(sketch))`` → ``aggregate``
    with ``kll_sketch_merge_double`` — O(increments) per group, which is
    rollup-table cardinality (days × dims), never data.  The sort fixes
    the fold order so re-runs merge identically.  Unlike HLL, a merged
    KLL is only rank-error-equivalent (not register-identical) to the
    direct sketch — pin estimates against exact ranks, not binary
    equality.  Output: ``group_cols…, q_estimates array<double>, n_rows``.
    """
    return (
        sketches.groupBy(*group_cols)
        .agg(
            F.sort_array(F.collect_list("qsketch")).alias("_sks"),
            F.sum("n_rows").alias("n_rows"),
        )
        .select(
            *group_cols,
            F.kll_sketch_get_quantile_double(
                F.aggregate(
                    F.slice("_sks", 2, 2_000_000_000),
                    F.element_at("_sks", 1),
                    lambda a, x: F.kll_sketch_merge_double(a, x),
                ),
                F.array(*[F.lit(float(q)) for q in quantiles]),
            ).alias("q_estimates"),
            "n_rows",
        )
    )
