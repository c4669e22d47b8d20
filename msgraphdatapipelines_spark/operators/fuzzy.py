"""Fuzzy (approximate) string join with blocking (r7).

Entity resolution / record linkage over dirty keys — the operation the
reference's business-key joins (`Prepare-SQLDatabase.sql:47-51` index on
``id``) degenerate to once keys carry typos.  Naive form is an all-pairs
levenshtein scan (Θ(n·m) — never viable); the standard scalable shape is
**block, then verify**:

- **block**: an EQUI-join on a cheap deterministic key both sides share —
  here character prefix + a length band.  Catalyst extracts the prefix
  equality into a hash join; only same-block pairs materialize.
- **verify**: exact ``levenshtein`` ≤ d on the joined pairs (JVM
  whole-stage codegen, no UDF).

A prefix block cannot match strings whose typo falls INSIDE the prefix —
the documented recall trade (a deletion at position ≤ p changes the
block).  Tune ``prefix`` against block sizes: at 100 TB, 2 chars ≈ 10³
blocks is too skewed, 4+ chars or q-gram blocking (explode each string's
q-grams, join on any shared gram, dedup pairs) restores balance; the
verify stage is unchanged.  Length banding rides the same join as a
range predicate and costs nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fuzzy_join_blocked(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_dist: int = 2,
    prefix: int = 2,
    len_band: int = 2,
) -> DataFrame:
    """Join ``left`` and ``right`` rows whose strings are within
    ``max_dist`` edits, blocking on a shared ``prefix``-char key and a
    ``len_band`` length band.  Adds a ``dist`` column (int).

    Plan: ONE equi-join on the prefix key (hash join; broadcast when one
    side is small), the length band and the levenshtein verify evaluated
    as codegen'd post-conditions on same-block pairs only.
    """
    lc, rc = F.col(left_col), F.col(right_col)
    cond = (
        (F.substring(lc, 1, prefix) == F.substring(rc, 1, prefix))
        & (F.abs(F.length(lc) - F.length(rc)) <= len_band)
        & (F.levenshtein(lc, rc) <= max_dist)
    )
    return left.join(right, cond).withColumn(
        "dist", F.levenshtein(lc, rc).cast("int")
    )
