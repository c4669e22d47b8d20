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


# ---------------------------------------------------------------------------
# Count-min sketch (r8): mergeable frequency estimation / heavy hitters.
# Unlike the binary HLL/KLL states above, the CM table is PLAIN ROWS
# ((depth, bucket, cnt) cells), so it is exactly replayable in the DuckDB
# oracle: buckets are the first 2 hex chars of md5(depth || '|' || key)
# (256 buckets/row — the md5-seeded determinism the MinHash rows use), and
# merging is integer cell addition — order-free, union-of-sketches ≡
# sketch-of-union, appendable forever without drift.

CM_WIDTH = 256  # fixed by the 2-hex-char bucket id


def _cm_bucket(key, depth: int):
    """Bucket id of ``key`` at row ``depth``: substr(md5(depth|key),1,2)."""
    return F.substring(F.md5(F.concat(F.lit(f"{depth}|"), key.cast("string"))), 1, 2)


def build_cm_sketch(
    df: DataFrame,
    part_cols: list[str],
    key_col: str,
    depth: int = 4,
    weight_col: str | None = None,
) -> DataFrame:
    """One CM cell table per ``part_cols`` group: (part…, depth, bucket,
    cnt) with cnt = Σ weight of keys hashing to that cell.  ONE hash
    aggregation over a ``depth``-way exploded projection (d rows per
    input row, each a 2-char bucket id) — map-side combinable, output
    O(groups · depth · 256) rows regardless of input size.  The
    appendable increment of a frequency-rollup table (the
    build_distinct_sketches pattern, estimable for ANY key later)."""
    w = F.lit(1).cast("long") if weight_col is None else F.col(weight_col).cast("long")
    cells = df.select(
        *part_cols,
        w.alias("__w"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(d).alias("depth"),
                    _cm_bucket(F.col(key_col), d).alias("bucket"),
                )
                for d in range(depth)
            ])
        ).alias("__c"),
    )
    return cells.groupBy(
        *part_cols, F.col("__c.depth").alias("depth"), F.col("__c.bucket").alias("bucket")
    ).agg(F.sum("__w").alias("cnt"))


def merge_cm_sketches(sketches: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge CM cell tables down to ``group_cols`` (drop the increment
    key): integer cell addition — exact, order-independent."""
    return sketches.groupBy(*group_cols, "depth", "bucket").agg(
        F.sum("cnt").alias("cnt")
    )


def cm_estimate(
    sketch: DataFrame, keys: DataFrame, key_col: str, depth: int = 4
) -> DataFrame:
    """Point-estimate each key's count from a (depth, bucket, cnt) sketch:
    est = min over depths of the key's cell — the count-min guarantee
    (est ≥ true count ALWAYS; est ≤ true + ε·N with high probability,
    ε ≈ e/256 here).  Plan: explode keys to their d cell coordinates,
    ONE equi-join on (depth, bucket) against the O(d·256)-row sketch
    (broadcast — the sketch is model-sized), one min-agg per key.  The
    never-underestimates property is what makes threshold screens sound:
    a key the sketch scores below threshold is GUARANTEED below it.
    The join is LEFT with coalesce(cnt, 0): a probed key whose cells are
    empty (sparse sketch / never-observed key) gets est=0 instead of
    silently vanishing from the output — threshold screens read every
    probed key."""
    coords = keys.select(
        key_col,
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(d).alias("depth"),
                    _cm_bucket(F.col(key_col), d).alias("bucket"),
                )
                for d in range(depth)
            ])
        ).alias("__c"),
    ).select(key_col, F.col("__c.depth").alias("depth"), F.col("__c.bucket").alias("bucket"))
    return (
        coords.join(F.broadcast(sketch), ["depth", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long"))).alias("cm_est"))
    )


def cm_join_size_estimate(sketch_a: DataFrame, sketch_b: DataFrame) -> DataFrame:
    """Equi-join cardinality estimate from two CM sketches over the SAME
    key domain (r8): |A ⋈_k B| ≈ min over depths of Σ_bucket
    cntA·cntB — the classic sketch inner product (AMS/CM join-size
    estimation, the statistic a cost-based planner wants before
    committing to a join strategy).  Never underestimates (collisions
    only ADD mass), so a "too big to broadcast" verdict from the
    estimate is sound.  Cost: one equi-join of two O(d·256)-row cell
    tables + one 1-row agg — independent of either input's size; the
    sketches are the reusable rollup artifacts, so the estimate needs NO
    scan of A or B at planning time."""
    a = sketch_a.select("depth", "bucket", F.col("cnt").alias("__ca"))
    b = sketch_b.select("depth", "bucket", F.col("cnt").alias("__cb"))
    per_depth = (
        a.join(b, ["depth", "bucket"])
        .groupBy("depth")
        .agg(F.sum(F.col("__ca") * F.col("__cb")).alias("__ip"))
    )
    return per_depth.agg(F.min("__ip").alias("join_size_est"))


def cm_total_rows(sketch: DataFrame) -> int:
    """Total mass N of a CM cell table — Σ_bucket cnt at any single depth
    equals the (weighted) row count the sketch has absorbed, EXACTLY (no
    collision error: every row lands in exactly one bucket per depth).
    One agg over the O(d·256)-row cell table; returns a driver int."""
    row = (
        sketch.groupBy("depth").agg(F.sum("cnt").alias("n"))
        .agg(F.min("n").alias("n")).collect()
    )
    return int(row[0]["n"]) if row and row[0]["n"] is not None else 0


def choose_join_strategy(
    child_sketch: DataFrame,
    parent_sketch: DataFrame,
    broadcast_threshold_rows: int = 1_000_000,
    blowup_factor: float = 4.0,
) -> dict:
    """Sketch-driven join pre-flight (r9) — the consumer that turns
    ``cm_join_size_estimate``'s sound verdicts into an actual plan
    decision.  Inputs are the standing CM cell tables of the two join
    sides' KEY columns (the reusable rollup artifacts); NO scan of either
    data table happens at planning time — two model-sized aggs only.

    Returns ``{'broadcast_parent', 'parent_rows_est', 'child_rows_est',
    'join_size_est', 'skew_warning'}``:

    - ``parent_rows_est`` / ``child_rows_est``: exact absorbed row counts
      (:func:`cm_total_rows` — bucket sums carry no collision error).
    - ``broadcast_parent``: True iff the parent side's row count is ≤
      ``broadcast_threshold_rows``.  Because the count is exact-or-over
      (a stale sketch only ever misses NEW rows if built before them;
      the maintained rollup is append-merged), a False verdict is sound:
      the engine never broadcasts a side the sketch says is data-sized.
    - ``join_size_est``: the never-underestimating inner product; with
      ``skew_warning`` True when it exceeds ``blowup_factor ×
      (child + parent)`` — the fan-out signature of a skewed/hot key,
      where the caller should salt or pre-aggregate before joining.

    Feed the verdict straight into ``constraints.foreign_key(...,
    broadcast_parent=plan['broadcast_parent'])`` or any join hint site.
    """
    parent_rows = cm_total_rows(parent_sketch)
    child_rows = cm_total_rows(child_sketch)
    est_row = cm_join_size_estimate(child_sketch, parent_sketch).collect()
    join_est = int(est_row[0]["join_size_est"]) if est_row and est_row[0]["join_size_est"] is not None else 0
    return {
        "broadcast_parent": parent_rows <= broadcast_threshold_rows,
        "parent_rows_est": parent_rows,
        "child_rows_est": child_rows,
        "join_size_est": join_est,
        "skew_warning": join_est > blowup_factor * (child_rows + parent_rows),
    }


def sketch_store_root(sf_dir: str, table: str, key: str) -> str:
    """Deterministic standing-CM-sketch location for (corpus table, key
    column): fingerprint-keyed like the ANN index / lexicon roots, so a
    regenerated table can never serve stale counts.  Prefix msgdp_cm_ is
    registered with sinks.vacuum_standing_artifacts."""
    import hashlib
    import os
    import tempfile

    p = os.path.join(sf_dir, f"{table}.parquet")
    parts = []
    if os.path.isdir(p):
        for root_, _, files in sorted(os.walk(p)):
            for fn in sorted(files):
                st = os.stat(os.path.join(root_, fn))
                parts.append(f"{fn}:{st.st_size}:{st.st_mtime_ns}")
    else:
        st = os.stat(p)
        parts.append(f"{st.st_size}:{st.st_mtime_ns}")
    h = hashlib.md5(
        f"{os.path.abspath(sf_dir)}|{table}|{key}|{'|'.join(parts)}|cm|v1".encode()
    ).hexdigest()[:16]
    return os.path.join(tempfile.gettempdir(), f"msgdp_cm_{h}")


def ensure_standing_sketch(
    spark,
    sf_dir: str,
    table: str,
    key: str,
    df: DataFrame | None = None,
) -> DataFrame:
    """Build-at-most-once STANDING CM cell table for one (table, key
    column) — the planning-side artifact ``choose_join_strategy`` /
    ``pipelines.preflight_fk_constraints`` consume, so a join verdict at
    load time costs a snapshot resolve + two model-sized aggs instead of
    scanning either join side.  First touch scans the table once (ONE
    map-combinable agg, O(4·256) output rows); afterwards every call is a
    pointer resolve.  Incremental growth: CM cells are integer-add
    mergeable — append increments with ``build_cm_sketch`` on the delta
    and ``merge_cm_sketches``, republished via ``sinks.write_snapshot``
    (same discipline as the lexicon compact)."""
    from .. import sinks

    root = sketch_store_root(sf_dir, table, key)
    snap = f"{root}/cells"
    if not sinks.snapshot_exists(spark, snap):
        if df is None:
            df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
        cells = build_cm_sketch(df.na.drop(subset=[key]), [], key)
        sinks.write_snapshot(cells, snap)
    return sinks.read_snapshot(spark, snap)
