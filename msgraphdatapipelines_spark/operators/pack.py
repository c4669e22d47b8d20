"""Ordered prefix sums and token-budget document packing.

Sequence packing — filling fixed token-budget bins with documents in a
deterministic order — is a staple of LLM training-data pipelines.  The
natural formulation is a running total over a global ordering, which
naively plans as a single-partition window (every row through one task:
the same scale-killer the surrogate key had, see sinks.with_surrogate_key).

``running_total`` generalizes the two-phase fix to arbitrary SUMs:

1. split rows into order-aligned buckets by quantile cuts of the ordering
   key (ties share a bucket, so cross-bucket ordering is total);
2. collect ONE partial sum per bucket (driver state bounded by bucket
   count) and prefix-sum them into bucket offsets;
3. running = offset[bucket] + windowed sum within the bucket.

The only wide step is the per-bucket window's hash exchange — parallel
across buckets, no ``Exchange SinglePartition`` (pinned in
tests/test_plans.py).  Integer-valued columns make every partial sum
exact, so the result is deterministic under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def running_total(
    df: DataFrame,
    order_by: str,
    value_col: str,
    name: str = "running",
    num_buckets: int | None = None,
    materialize: bool = True,
) -> DataFrame:
    """Inclusive running SUM of ``value_col`` over the global ``order_by``
    ordering, without a single-partition window.

    ``order_by`` must be a NUMERIC column (the quantile-cut bucketing runs
    ``approxQuantile``, which rejects strings/dates) and should be
    high-cardinality: heavily-tied keys collapse buckets, and rows tied on
    ``order_by`` within a bucket receive an arbitrary-but-valid relative
    order in the running sum (any total order extending the key order).
    Use a unique numeric key (id, epoch micros) for full determinism.

    ``materialize=True`` pins the input once (eager ``localCheckpoint``)
    so the quantile job, the per-bucket sums, and the final window read
    one materialization instead of re-executing the upstream plan three
    times — same single-scan contract as ``sinks.with_surrogate_key``.
    """
    num_types = ("int", "bigint", "smallint", "tinyint", "float", "double", "decimal")
    ord_type = dict(df.dtypes)[order_by]
    if not ord_type.startswith(num_types):
        raise TypeError(
            f"running_total: order_by column {order_by!r} has type {ord_type}; "
            "only numeric ordering keys are supported (quantile bucketing). "
            "Map the key to a number first (e.g. epoch micros, xxhash64)."
        )
    bucketc = "__rt_bucket"
    src = df.localCheckpoint(eager=True) if materialize else df
    n = num_buckets or df.sparkSession.sparkContext.defaultParallelism
    cuts = (
        src.stat.approxQuantile(order_by, [i / n for i in range(1, n)], 0.01)
        if n > 1
        else []
    )
    bucket = F.lit(0)
    for c in sorted(set(cuts)):
        bucket = bucket + F.when(F.col(order_by) > F.lit(c), 1).otherwise(0)
    keyed = src.withColumn(bucketc, bucket)
    totals = {
        r[bucketc]: r["s"]
        for r in keyed.groupBy(bucketc).agg(F.sum(value_col).alias("s")).collect()
    }
    offsets, acc = {}, 0
    for b in sorted(totals):
        offsets[b] = acc
        acc += totals[b] or 0
    omap = F.create_map(*[F.lit(x) for b, o in offsets.items() for x in (b, o)])
    w = Window.partitionBy(bucketc).orderBy(order_by).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return keyed.withColumn(
        name, (omap[F.col(bucketc)] + F.sum(value_col).over(w)).cast("long")
    ).drop(bucketc)


def pack_into_bins(
    df: DataFrame,
    order_by: str,
    tokens_col: str,
    budget: int,
    bin_col: str = "bin_id",
    running_col: str = "running_tokens",
) -> DataFrame:
    """Greedy token-budget packing in ``order_by`` order: document d goes to
    bin ``floor(exclusive_prefix_sum(tokens) / budget)`` — the streaming
    greedy assignment (a bin may overflow by at most one document, the
    standard training-data packing contract; oversized documents still get
    a bin).  Integer arithmetic throughout — deterministic and
    oracle-reproducible."""
    run = running_total(df, order_by, tokens_col, name=running_col)
    excl = F.col(running_col) - F.col(tokens_col)
    # exact integer floor-div: (x - x % b) / b divides an exact multiple, so
    # the double quotient is the integer itself (a plain x/b double division
    # can round k + (b-1)/b up to k+1 once prefix sums pass ~2^40)
    b = F.lit(int(budget))
    return run.withColumn(bin_col, ((excl - (excl % b)) / b).cast("long"))
