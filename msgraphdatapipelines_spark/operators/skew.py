"""Skew mitigation (PERF.md): salted join for hot keys.

AQE's skew-join handling (on by default in session.py) splits oversized
sort-merge partitions automatically — prefer it.  Salting is the manual
fallback for the cases AQE can't fix: a broadcast-ineligible dimension
joined on a key where one value dominates (the classic null/default-value
hot key), or aggregations where one group is 1000× the rest.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT = "_salt"


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    key: str,
    how: str = "inner",
    salts: int = 8,
) -> DataFrame:
    """Equi-join where ``skewed``'s hot keys overwhelm single partitions.

    The skewed side gets a deterministic per-row salt (hash of all columns
    mod ``salts``); the other side is replicated ``salts``× via explode.
    The shuffle key becomes (key, salt) so a hot key spreads over ``salts``
    partitions.  Cost: other side × salts — use only when 'other' is modest
    but above the broadcast threshold.
    """
    salted_l = skewed.withColumn(
        SALT, F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(salts)).cast("int")
    )
    replicated_r = other.withColumn(
        SALT, F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
    )
    out = salted_l.join(replicated_r, [key, SALT], how)
    return out.drop(SALT)


def salted_groupby_count(df: DataFrame, key: str, salts: int = 8) -> DataFrame:
    """Two-phase aggregation for a skewed group key: partial count per
    (key, salt), then final sum per key — the hot group's work spreads over
    ``salts`` tasks in phase 1.  (Spark's hash aggregate already does
    map-side partials; explicit salting matters for high-cardinality
    payload aggs like collect_list where partials can't combine.)"""
    salted = df.withColumn(
        SALT, F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salts)).cast("int")
    )
    partial = salted.groupBy(key, SALT).agg(F.count("*").alias("_n"))
    return partial.groupBy(key).agg(F.sum("_n").alias("n"))
