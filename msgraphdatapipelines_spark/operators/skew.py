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

# join types where replicating `other` salts× cannot duplicate output rows:
# every output row still matches exactly one (key, salt) pair on the left.
# right/full would emit each unmatched right row salts× — rejected below.
_SALT_SAFE_JOINS = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti"}


def _row_salt(salts: int) -> Column:
    """Per-row salt independent of row content: identical duplicate rows of a
    hot key must still spread across partitions (a content hash would send
    all copies to one salt — common in dedup workloads)."""
    return F.pmod(F.monotonically_increasing_id(), F.lit(salts)).cast("int")


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    key: str,
    how: str = "inner",
    salts: int = 8,
) -> DataFrame:
    """Equi-join where ``skewed``'s hot keys overwhelm single partitions.

    The skewed side gets a per-row salt; the other side is replicated
    ``salts``× via explode.  The shuffle key becomes (key, salt) so a hot
    key spreads over ``salts`` partitions.  Cost: other side × salts — use
    only when 'other' is modest but above the broadcast threshold.

    Only left-preserving join types are accepted: with how='right'/'full'
    every unmatched right row would surface once per replica (salts×
    duplicates).
    """
    if how not in _SALT_SAFE_JOINS:
        raise ValueError(
            f"salted_join supports {sorted(_SALT_SAFE_JOINS)}; got how={how!r} "
            "(right/full would duplicate unmatched rows of the replicated side)"
        )
    salted_l = skewed.withColumn(SALT, _row_salt(salts))
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
    salted = df.withColumn(SALT, _row_salt(salts))
    partial = salted.groupBy(key, SALT).agg(F.count("*").alias("_n"))
    return partial.groupBy(key).agg(F.sum("_n").alias("n"))
