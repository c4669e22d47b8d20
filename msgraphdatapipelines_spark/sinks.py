"""Sink / load semantics (SURVEY.md §2.4, L1-L8).

The reference bulk-loads a typed table via a TVP stored procedure and then
either full-replaces (`DELETE FROM …; INSERT … SELECT`,
`Prepare-SQLDatabase.sql:104-178`) or — the commented alternative — appends
with a retention window (`DATEDIFF(day, timeGenerated, GetDate()) >
@MaxInventoryAge`, `:99-111`), stamping every row with a load time
(`GETDATE() → timeGenerated`, `:144`).

Spark-first mapping: Parquet is the warehouse; full refresh =
``mode("overwrite")``; retention = partition-by-load-date + dropping old
partitions (pure metadata at 100 TB — never a rewrite of surviving data);
the stamp is ``current_timestamp()``; the surrogate key is zip-with-index
semantics via a window only when contiguity is demanded (documented cost),
else ``monotonically_increasing_id``.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LOAD_STAMP = "timeGenerated"
LOAD_DATE = "loadDate"


def stamp(df: DataFrame, at: _dt.datetime | None = None) -> DataFrame:
    """L4 — audit stamp: add ``timeGenerated`` (reference: GETDATE(),
    `Prepare-SQLDatabase.sql:144,177`).  Pass ``at`` for deterministic tests.
    """
    ts = F.lit(at).cast("timestamp") if at is not None else F.current_timestamp()
    return df.withColumn(LOAD_STAMP, ts)


def with_surrogate_key(
    df: DataFrame,
    name: str = "ClusterID",
    contiguous: bool = False,
    order_by: str | None = None,
    num_buckets: int | None = None,
    materialize: bool = True,
) -> DataFrame:
    """L5 — surrogate key (reference: int IDENTITY(1,1),
    `Prepare-SQLDatabase.sql:8`).

    Default is ``monotonically_increasing_id`` — unique, non-contiguous,
    shuffle-free (partition-id in the high bits).

    ``contiguous=True`` assigns dense IDs ``1..n`` with the scale-safe
    two-phase form (never a global single-partition window):

    1. split rows into order-aligned buckets — fixed-width value ranges of
       ``order_by`` (cuts ``lo + i·(hi−lo)/n`` from ONE min/max/count
       aggregation; r5 VERDICT item 1 — this replaced the extra
       ``approxQuantile`` pass) when an ordering key is given, else the
       partition-id bits of ``monotonically_increasing_id`` (zipWithIndex
       semantics);
    2. per-bucket counts → exclusive prefix-sum offsets, computed INSIDE the
       final plan: the n-row count aggregate is ``coalesce(1)``-ed (already
       a single partition, so no ``Exchange SinglePartition`` is inserted),
       prefix-summed with a tiny window, and broadcast-joined back — no
       driver collect, no extra job;
    3. ``ClusterID = offset[bucket] + row_number() within bucket``.

    Total driver actions: the eager checkpoint (if ``materialize``) + one
    min/max/count agg; everything else is one job at the consumer's action.
    The only data-sized wide step is the per-bucket window's hash exchange —
    parallel across buckets, so the plan contains no ``Exchange
    SinglePartition`` and survives the 100 TB fact path (pinned in
    tests/test_plans.py).  Fixed-width buckets assume ``order_by`` is
    numeric-castable and roughly uniform; a heavily value-skewed key
    collapses into few buckets (same failure shape the quantile form had
    with tie-skew) — pick a spread-out, high-cardinality ordering key.

    ``materialize=True`` (default) pins the input once via an eager
    ``localCheckpoint`` before the two consumers run (min/max agg, final
    plan), so the upstream plan — scan, decode, filters — executes ONCE
    (r4 VERDICT item 1), and both key modes become immune to recomputation
    nondeterminism (blocks are pinned; lineage is truncated).  CAUTION
    (r5 ADVICE): ``localCheckpoint`` is NOT fault-tolerant — pinned blocks
    live only on executors and lineage is truncated, so losing a single
    executor after the checkpoint makes the frame unrecoverable and fails
    the job.  On long-running clusters keying a large fact table, prefer
    reliable checkpointing (``sc.setCheckpointDir`` + ``df.checkpoint()``)
    or ``persist(StorageLevel.MEMORY_AND_DISK_2)`` upstream and pass
    ``materialize=False`` here.  Storage is executor memory-and-disk and is
    reclaimed when the frame is garbage-collected.  Also set
    ``materialize=False`` when the input is too large to pin relative to
    re-scanning it (e.g. a raw 100 TB scan with cheap decode): the
    two-phase shape is unchanged, the upstream plan just re-executes per
    phase, and with ``order_by`` the bucket stays a pure function of the
    data; the mono-id fallback then assumes a deterministic scan, same as
    zipWithIndex.
    """
    if not contiguous:
        return df.withColumn(name, F.monotonically_increasing_id())
    from pyspark.sql import Window

    src = df.localCheckpoint(eager=True) if materialize else df
    ordc, bucketc, cntc, offc = "__sk_ord", "__sk_bucket", "__sk_cnt", "__sk_off"
    if order_by is not None:
        # src-everywhere: every phase reads the pinned frame's session/state
        n = num_buckets or src.sparkSession.sparkContext.defaultParallelism
        oc = F.col(order_by).cast("double")
        lo, hi, total = src.agg(F.min(oc), F.max(oc), F.count(F.lit(1))).first()
        if not total:
            return df.withColumn(name, F.lit(None).cast("long"))
        if lo is None or hi is None or hi == lo or n <= 1:
            bucket = F.lit(0)
        else:
            width = (hi - lo) / n
            # monotone in the key -> equal keys share a bucket, so
            # cross-bucket ordering is total; NULL keys sort first within
            # bucket 0 (coalesce), matching global nulls-first order
            bucket = F.least(F.floor((oc - F.lit(lo)) / F.lit(width)), F.lit(n - 1))
            bucket = F.coalesce(bucket, F.lit(0)).cast("int")
        keyed = src.withColumn(ordc, F.col(order_by)).withColumn(bucketc, bucket)
    else:
        mid = F.monotonically_increasing_id()
        keyed = src.withColumn(ordc, mid).withColumn(bucketc, F.shiftright(F.col(ordc), 33))
    counts = keyed.groupBy(bucketc).agg(F.count(F.lit(1)).alias(cntc))
    woff = Window.orderBy(bucketc).rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        counts.coalesce(1)  # n-bucket rows; 1 partition satisfies the window,
        .withColumn(offc, F.coalesce(F.sum(cntc).over(woff), F.lit(0)))  # no Exchange SinglePartition
        .drop(cntc)
    )
    w = Window.partitionBy(bucketc).orderBy(ordc)
    return (
        keyed.join(F.broadcast(offsets), bucketc)
        .withColumn(name, (F.col(offc) + F.row_number().over(w)).cast("long"))
        .drop(ordc, bucketc, offc)
    )


def write_full_refresh(df: DataFrame, path: str, sort_by: str | None = None) -> None:
    """L2 — truncate-and-load snapshot (reference DELETE+INSERT,
    `Prepare-SQLDatabase.sql:104-178`).

    ``sort_by`` emulates L6 (secondary index on the business key): sorting
    within partitions gives Parquet tight min/max column stats on that key,
    so later point-lookups skip row groups — the Parquet analog of the
    reference's nonclustered index on ``id`` (`Prepare-SQLDatabase.sql:47-51`).
    """
    out = df.sortWithinPartitions(sort_by) if sort_by else df
    out.write.mode("overwrite").parquet(path)


def write_append_with_retention(
    df: DataFrame,
    spark: SparkSession,
    path: str,
    max_age_days: int = 40,
    now: _dt.datetime | None = None,
) -> None:
    """L3 — append + retention window (reference commented alternative,
    `Prepare-SQLDatabase.sql:99-111`, default @MaxInventoryAge=40).

    The table is partitioned by ``loadDate``; expiry drops whole partitions
    older than the window.  On plain Parquet that is a directory delete —
    no data rewrite — which is the only retention strategy that stays O(1)
    in data size at 100 TB (Delta's `DELETE WHERE` would log-rewrite).
    """
    stamped = df if LOAD_STAMP in df.columns else stamp(df, now)
    (
        stamped.withColumn(LOAD_DATE, F.to_date(F.col(LOAD_STAMP)))
        .write.mode("append")
        .partitionBy(LOAD_DATE)
        .parquet(path)
    )
    expire_old_partitions(spark, path, max_age_days, now)


def expire_old_partitions(
    spark: SparkSession, path: str, max_age_days: int, now: _dt.datetime | None = None
) -> list[str]:
    """Drop loadDate partitions older than the retention window.

    Mirrors `DATEDIFF(day, timeGenerated, GetDate()) > @MaxInventoryAge`
    (`Prepare-SQLDatabase.sql:110`) at partition granularity.
    """
    sc = spark.sparkContext
    hpath = sc._jvm.org.apache.hadoop.fs.Path(path)  # noqa: SLF001 — py4j bridge
    fs = hpath.getFileSystem(sc._jsc.hadoopConfiguration())  # noqa: SLF001
    if not fs.exists(hpath):
        return []
    today = (now or _dt.datetime.now(_dt.timezone.utc)).date()
    removed = []
    for st in fs.listStatus(hpath):
        name = st.getPath().getName()
        if not name.startswith(f"{LOAD_DATE}="):
            continue
        part_date = _dt.date.fromisoformat(name.split("=", 1)[1])
        if (today - part_date).days > max_age_days:
            fs.delete(st.getPath(), True)
            removed.append(name)
    return removed


def row_count(df: DataFrame) -> int:
    """L7 — rows-processed feedback (`Invoke…ps1:326-328`)."""
    return df.count()


def upsert_snapshot(existing: DataFrame, updates: DataFrame, keys: list[str]) -> DataFrame:
    """SCD1 upsert without MERGE INTO (no Delta in this environment):
    updates ∪ (existing ⟕anti updates) — new rows replace matching keys,
    unmatched history is preserved.

    The anti-join shuffles both sides on the key once; with the warehouse
    bucketed on the key (L6 analog) the existing side's shuffle disappears.
    This generalizes the reference's full-refresh (L2) to keyed refresh —
    what `Prepare-SQLDatabase.sql`'s DELETE+INSERT would become with a
    business-key match instead of a truncate.
    """
    survivors = existing.join(updates.select(*keys), keys, "left_anti")
    return updates.unionByName(survivors)


def apply_delta(
    snapshot: DataFrame,
    delta: DataFrame,
    keys: list[str],
    removed_col: str = "_removed",
) -> DataFrame:
    """Apply one delta-query batch (``sources.rest.read_odata_delta``) to a
    keyed snapshot: additions and updates replace matching keys, tombstone
    rows (``removed_col`` true) delete them, untouched history survives.

    upserts ∪ (snapshot ⟕anti ALL delta keys) — the tombstones ride the
    same single anti-join that the upserts already needed, so a delete
    costs nothing beyond its key: one key-shuffle of both sides total,
    the same plan shape as ``upsert_snapshot`` (with the warehouse
    bucketed on the key, the snapshot side's shuffle disappears).  This
    is the reference's DELETE+INSERT full refresh
    (`Prepare-SQLDatabase.sql:104-178`) reduced to changed keys only.
    """
    upserts = delta.filter(~F.col(removed_col)).drop(removed_col)
    survivors = snapshot.join(delta.select(*keys), keys, "left_anti")
    return upserts.unionByName(survivors)


def apply_scd2(
    history: DataFrame,
    updates: DataFrame,
    keys: list[str],
    effective_col: str = "effective_ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current_flag: str = "is_current",
    removed_col: str | None = None,
) -> DataFrame:
    """Type-2 slowly-changing-dimension apply — the keyed-history
    generalization of ``upsert_snapshot`` (SCD1) and the reference's
    DELETE+INSERT refresh (`Prepare-SQLDatabase.sql:104-178`): instead of
    replacing a changed row, CLOSE it (``valid_to`` = the update's
    effective time, ``is_current`` = false) and open a new version
    (``valid_from`` = effective time, open-ended, current).  Unchanged
    matches are no-ops; unseen keys insert as new current rows; closed
    history rows pass through untouched.

    Contract: ``history`` carries the key columns, the attribute columns,
    and the three metadata columns; ``updates`` carries the keys, the same
    attributes, and ``effective_col``.  Every non-key, non-metadata
    attribute is change-tracked (pure SCD2; null-safe comparison).  At
    most ONE update per key per batch — collapse multi-update batches to
    the latest effective row first (``row_number`` over the key), or
    apply batches in order.

    Scale shape: ONE equi-join of the CURRENT slice against the updates
    on the key (single key shuffle — closed history never joins, it
    unions back untouched and unshuffled), then a per-row array+inline
    emits 0/1/2 output rows — no second pass over the join, no window.
    With the warehouse bucketed on the key (L6 analog) the current
    slice's shuffle disappears exactly as in ``upsert_snapshot``.

    ``removed_col`` (r7, optional): name of a boolean tombstone column on
    ``updates`` (the delta-query ``@removed`` marker,
    ``sources.rest.read_odata_delta``).  A tombstone CLOSES the key's
    current row at the effective time without opening a new version — the
    SCD2 delete; a tombstone for an unknown key is a no-op.  Rides the
    same single join.
    """
    meta = {valid_from, valid_to, current_flag}
    attrs = [
        c
        for c in updates.columns
        if c not in set(keys) | {effective_col} | ({removed_col} if removed_col else set())
    ]
    cur = history.filter(F.col(current_flag))
    closed = history.filter(~F.col(current_flag))

    upd = updates.select(
        *keys,
        *[F.col(a).alias(f"__u_{a}") for a in attrs],
        F.col(effective_col).alias("__u_eff"),
        *(
            [F.coalesce(F.col(removed_col), F.lit(False)).alias("__u_rm")]
            if removed_col
            else [F.lit(False).alias("__u_rm")]
        ),
    )
    j = cur.join(upd, keys, "full_outer")

    c_exists = F.col(valid_from).isNotNull()  # current rows always carry valid_from
    u_exists = F.col("__u_eff").isNotNull()
    rm = F.coalesce(F.col("__u_rm"), F.lit(False))
    diff = F.lit(False)
    for a in attrs:
        diff = diff | ~F.col(a).eqNullSafe(F.col(f"__u_{a}"))
    closing = u_exists & c_exists & (diff | rm)
    opening = u_exists & ~rm & (~c_exists | diff)

    vt_t = dict(cur.dtypes).get(valid_to, "timestamp")
    row_t = F.struct(
        *[F.col(k).alias(k) for k in keys],
        *[F.col(a).alias(a) for a in attrs],
        F.col(valid_from).alias(valid_from),
        F.when(closing, F.col("__u_eff").cast(vt_t)).otherwise(F.col(valid_to)).alias(valid_to),
        F.when(closing, F.lit(False)).otherwise(F.col(current_flag)).alias(current_flag),
    )
    row_u = F.struct(
        *[F.col(k).alias(k) for k in keys],
        *[F.col(f"__u_{a}").alias(a) for a in attrs],
        F.col("__u_eff").alias(valid_from),
        F.lit(None).cast(vt_t).alias(valid_to),
        F.lit(True).alias(current_flag),
    )
    emitted = (
        j.select(
            F.explode(
                F.filter(
                    F.array(
                        F.when(c_exists, row_t),
                        F.when(opening, row_u),
                    ),
                    lambda r: r.isNotNull(),
                )
            ).alias("__r")
        )
        .select("__r.*")
    )
    out_cols = [*keys, *[a for a in cur.columns if a not in set(keys) | meta], valid_from, valid_to, current_flag]
    return emitted.select(*out_cols).unionByName(closed.select(*out_cols))


def write_rest_batched(
    df: DataFrame,
    endpoint: str,
    poster,
    batch_size: int = 500,
) -> int:
    """L8 — batched REST post sink (the Log Analytics-workspace analog the
    reference README names, `README.md:3`; no code exists in the snapshot).

    Rows serialize to JSON batches per partition and post via ``poster``
    (injectable: tests collect, production POSTs with auth).  Work happens
    on executors — the driver never materializes the data.

    Serialization is JVM-side (``to_json`` over ``struct(*)``: whole-stage
    StructsToJson), so only compact JSON strings cross the Py4J/worker
    boundary — never pickled Row objects (r2 VERDICT item 6; at 100 TB the
    Row-pickle cost of the old ``df.rdd.mapPartitions`` path is real).
    ``ignoreNullFields=false`` keeps null-valued fields as explicit JSON
    nulls (r4 ADVICE: the ``df.toJSON()`` default silently DROPPED null
    keys from the posted payload); timestamps serialize as ISO-8601 —
    the Spark JSON contract, pinned in tests/test_auth_and_rest_sink.
    The batch count returns via an accumulator (one long per task, not a
    collected dataset); like any accumulator it can over-count if a task
    retries — it is operational feedback (L7 spirit), not an exactly-once
    metric.
    """
    acc = df.sparkSession.sparkContext.accumulator(0)

    def post_partition(rows):
        batch = []
        for row in rows:
            batch.append(row["__json"])
            if len(batch) >= batch_size:
                poster(endpoint, "[" + ",".join(batch) + "]")
                acc.add(1)
                batch = []
        if batch:
            poster(endpoint, "[" + ",".join(batch) + "]")
            acc.add(1)

    json_df = df.select(
        F.to_json(
            F.struct(*[F.col(c) for c in df.columns]), {"ignoreNullFields": "false"}
        ).alias("__json")
    )
    json_df.foreachPartition(post_partition)
    return acc.value


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 16,
    sort_col: str | None = None,
    path: str | None = None,
) -> None:
    """Persist as a BUCKETED table: co-locates rows by ``hash(bucket_col) %
    num_buckets`` at write time, so every later equi-join or aggregation on
    that key skips its shuffle entirely (SortMergeJoin reads both sides
    pre-partitioned; tests/test_plans pins the 0-Exchange join).

    This is THE amortization play for a 100 TB fact table joined repeatedly
    on the same key: pay one shuffle at load, never again.  Bucket count
    should scale with data volume (buckets ≈ total size / target partition
    size); ``sort_col`` additionally sorts within buckets for merge-join
    without a per-query sort and better min/max skipping.

    ``path`` makes it an EXTERNAL bucketed table at that location
    (bucket metadata still lives in the catalog) — standing layouts use
    this to keep their data under the artifact roots instead of the
    session's ./spark-warehouse.
    """
    w = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table, format="parquet")


def ensure_bucketed_table(
    spark: SparkSession,
    table: str,
    path: str,
    bucket_col: str,
    num_buckets: int,
    build,
    sort_col: str | None = None,
) -> None:
    """Race-safe build-at-most-once BUCKETED store (r11): the data under
    ``path`` is built ONCE (staged under a session-unique dir, renamed
    into place, committed with a ``_bucketed_ready`` marker) and every
    session — including the loser of a concurrent-build race —
    REGISTERS the existing files instead of rewriting them (``CREATE
    TABLE … CLUSTERED BY … LOCATION``; Spark derives bucket ids from the
    saveAsTable file-name convention, which the rename preserves).

    This fixes two defects of the naive rebuild-per-session flow: a
    concurrent session could overwrite files another session was mid-scan
    on (FileNotFoundException), and the cross-session amortization the
    bucketed layout exists for was silently lost."""
    import uuid

    fs, _, jvm = _fs_for(spark, path)
    hpath = jvm.org.apache.hadoop.fs.Path
    marker = f"{path}/_bucketed_ready"
    if not fs.exists(hpath(marker)):
        stage = f"{path}.stage.{uuid.uuid4().hex[:12]}"
        tmp_name = f"{table}_stage_{uuid.uuid4().hex[:8]}"
        w = build().write.mode("overwrite").bucketBy(num_buckets, bucket_col)
        if sort_col:
            w = w.sortBy(sort_col)
        w.option("path", stage).saveAsTable(tmp_name, format="parquet")
        spark.sql(f"DROP TABLE IF EXISTS {tmp_name}")  # external: files stay
        if fs.exists(hpath(path)) or not fs.rename(hpath(stage), hpath(path)):
            fs.delete(hpath(stage), True)  # lost the race; winner's files serve
        if not fs.exists(hpath(marker)):
            tmpm = hpath(f"{marker}.{uuid.uuid4().hex[:8]}.tmp")
            out = fs.create(tmpm, True)
            out.write(bytearray(b"ready"))
            out.close()
            if not fs.rename(tmpm, hpath(marker)) and fs.exists(tmpm):
                fs.delete(tmpm, False)
    if not spark.catalog.tableExists(table):
        ddl = spark.read.parquet(path)._jdf.schema().toDDL()  # noqa: SLF001
        spark.sql(
            f"CREATE TABLE {table} ({ddl}) USING parquet "
            f"CLUSTERED BY ({bucket_col}) INTO {num_buckets} BUCKETS "
            f"LOCATION '{path}'"
        )


def write_jdbc(df: DataFrame, url: str, table: str, mode: str = "overwrite", **options) -> None:
    """L1 — bulk relational load (reference TVP stored-proc path,
    `Invoke…ps1:310-333`).  The JDBC writer batches rows (``batchsize``) —
    the Spark analog of the TVP bulk transfer — and each executor
    partition opens its own connection, so the load parallelizes across
    the cluster (cap with ``numPartitions`` to respect the server).

    Tested end-to-end against in-process Derby (tests/test_sinks.py):
    overwrite/append modes, batchsize, and long/double/string/timestamp/
    boolean type mapping.  A networked SQL server only changes the URL and
    driver options.
    """
    df.write.mode(mode).options(**options).jdbc(url, table)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    **options,
) -> DataFrame:
    """S7's relational half — partitioned JDBC read (the reverse of L1;
    the reference only writes to SQL, but a pipeline that loads a
    warehouse usually also needs to read one back).

    Without ``partition_column`` the whole table arrives through ONE
    connection on one executor — fine for dimension-sized lookups, a
    non-starter for a fact table.  With it, Spark issues
    ``num_partitions`` range-partitioned queries (``WHERE col >= lo AND
    col < hi``) in parallel, one connection per task — the standard
    scale shape for relational ingest.  ``lower_bound``/``upper_bound``
    bound the stride arithmetic only (rows outside still arrive, in the
    edge partitions); pick them as the column's actual min/max, and a
    roughly uniform ``partition_column`` (a surrogate key) to avoid one
    hot partition doing all the IO.  Catalyst pushes filters and column
    pruning into the per-partition queries where the JDBC dialect
    allows.
    """
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("read_jdbc: partition_column requires lower_bound and upper_bound")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 8
) -> tuple[DataFrame, "Column"]:
    """Z-order (Morton) interleave key for multi-column data skipping.

    Parquet min/max stats prune files only when the FILE LAYOUT clusters
    the filtered column — a linear ``sort_by(a)`` gives file-level locality
    on ``a`` and none on ``b``.  Interleaving the bits of fixed-width
    bucket ranks of BOTH columns gives every file a small bounding box in
    (a, b) space, so predicates on either column (or a box on both) skip
    most files — the standard lakehouse Z-ORDER layout, built here from
    plain Column expressions.

    Bucket ranks come from one global min/max aggregation per call (same
    fixed-width trick as the surrogate key): rank = floor((x-lo)/(hi-lo) ·
    2^bits), clamped to 2^bits−1.  NULLs rank 0.  The returned key column
    is ``interleave(rank_0, rank_1, …)`` — pure codegen (shift/or), no
    UDF.  Returns (df_with_ranks, key_column); writers order by the key.
    """
    from pyspark.sql import functions as F

    aggs = []
    for c in cols:
        aggs += [F.min(F.col(c).cast("double")).alias(f"_lo_{c}"),
                 F.max(F.col(c).cast("double")).alias(f"_hi_{c}")]
    bounds = df.agg(*aggs).collect()[0]  # 2·|cols| scalars — model state
    n = 1 << bits
    ranks = []
    for c in cols:
        lo, hi = bounds[f"_lo_{c}"], bounds[f"_hi_{c}"]
        span = (hi - lo) or 1.0
        r = F.floor((F.col(c).cast("double") - F.lit(lo)) / F.lit(span) * n)
        ranks.append(
            F.least(F.greatest(F.coalesce(r, F.lit(0)), F.lit(0)), F.lit(n - 1)).cast("long")
        )
    key = F.lit(0).cast("long")
    for b in range(bits):
        for i, r in enumerate(ranks):
            bit = F.shiftright(r, b).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, b * len(cols) + i))
    return df, key


def write_zordered(
    df: DataFrame, path: str, cols: list[str], bits: int = 8, num_files: int | None = None
) -> None:
    """Write parquet Z-ordered on ``cols``: range-partition on the Morton
    key (files = contiguous key ranges = small bounding boxes), sort
    within partitions, drop the helper column.  One extra range shuffle at
    write time buys file skipping on every future scan filtering any of
    ``cols`` — the classic write-once/read-many trade of a 100 TB
    warehouse table.  ``num_files`` caps output files (defaults to the
    current partition count).
    """
    d, key = zorder_key(df, cols, bits)
    d = d.withColumn("_zkey", key)
    parts = num_files or d.rdd.getNumPartitions()
    (
        d.repartitionByRange(parts, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def compact_parquet(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Small-file compaction — the table-maintenance pass every streaming /
    incremental sink eventually needs (micro-batch appends and per-delta
    loads leave thousands of KB-sized part files; at 100 TB the resulting
    task-per-file scheduling and NameNode/listing pressure dominate scan
    cost long before the data does).

    Sizes the output from the ACTUAL on-disk bytes: lists the directory
    through the Hadoop FileSystem API, sums part-file sizes, and rewrites
    into ``ceil(total / target_file_bytes)`` files via an explicit
    round-robin ``repartition(n)`` (honored exactly — AQE does not
    override explicit repartition counts).  Writes to ``out_path`` and
    leaves the source intact: swapping is the caller's transaction (an
    atomic rename / metastore pointer flip), because a same-directory
    rewrite cannot be made crash-safe from inside the job.

    Hive-partitioned layouts: compact per partition directory (pass each
    partition's path), preserving pruning.

    Returns ``{"in_files", "in_bytes", "out_files"}``.
    """
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(jsc.hadoopConfiguration())
    in_files = in_bytes = 0
    it = fs.listFiles(hpath, True)
    base_uri = hpath.toUri().getPath()
    while it.hasNext():
        f = it.next()
        name = f.getPath().getName()
        # skip hidden files AND files under hidden dirs (_zonemap, _SUCCESS
        # siblings …) — Spark's file index hides both, the size math must too
        rel = f.getPath().toUri().getPath()[len(base_uri):].lstrip("/")
        hidden = any(seg.startswith(("_", ".")) for seg in rel.split("/"))
        if f.isFile() and not hidden and not name.startswith("_") and not name.startswith("."):
            in_files += 1
            in_bytes += f.getLen()
    n_out = max(1, -(-in_bytes // target_file_bytes))  # ceil
    df = spark.read.parquet(path)
    df.repartition(n_out).write.mode("overwrite").parquet(out_path)
    opath = jvm.org.apache.hadoop.fs.Path(out_path)
    ofs = opath.getFileSystem(jsc.hadoopConfiguration())
    out_files = 0
    oit = ofs.listFiles(opath, True)
    while oit.hasNext():
        f = oit.next()
        name = f.getPath().getName()
        if f.isFile() and not name.startswith("_") and not name.startswith("."):
            out_files += 1
    return {"in_files": in_files, "in_bytes": in_bytes, "out_files": out_files}


def _fs_for(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration()), p, jvm


def _normalize_file_uri(uri: str) -> str:
    """Canonical file identity for manifest diffing: strip the scheme
    and collapse the authority slashes, so ``file:///a/b``,
    ``file:/a/b`` and ``/a/b`` — the three spellings Spark's
    ``input_file_name()`` and Hadoop's ``Path.toString()`` emit for one
    file — compare equal.  URL-unquote because ``input_file_name()``
    percent-encodes (e.g. ``=`` in partition dirs)."""
    import re
    from urllib.parse import unquote

    u = unquote(uri)
    u = re.sub(r"^[A-Za-z][A-Za-z0-9+.-]*:/+", "/", u)
    return u


def _list_numbered_dirs(spark: SparkSession, root: str, prefix: str) -> list[int]:
    """Sorted numeric suffixes of ``{prefix}N`` subdirectories of ``root``."""
    fs, p, _ = _fs_for(spark, root)
    if not fs.exists(p):
        return []
    out = []
    for st in fs.listStatus(p):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith(prefix):
            try:
                out.append(int(name[len(prefix):]))
            except ValueError:
                pass
    return sorted(out)


def snapshot_versions(spark: SparkSession, root: str) -> list[int]:
    """Sorted list of snapshot versions present under ``root`` (``v=N``
    directories)."""
    return _list_numbered_dirs(spark, root, "v=")


def ensure_versioned_layout(spark: SparkSession, root: str) -> int | None:
    """Migration guard for pre-versioning snapshot tables (r9, ADVICE):
    a table written by the OLD flat layout (parquet files directly under
    ``root``, no ``v=N`` subdirectories) would make
    ``snapshot_versions() == []`` look like "first round ever", silently
    resetting sync state and orphaning the prior snapshot's data — the
    exact restart hazard the versioned layout exists to prevent.

    Called by the sync streams before their bootstrap probe: when ``root``
    holds top-level parquet files and NO version directories, the files
    are MOVED (renamed — metadata-only on any sane filesystem, no data
    copy) into ``v=1`` and the ``_LATEST`` pointer is written, upgrading
    the table in place.  Crash-safe: a crash mid-move leaves a mixed dir
    that the next call finishes migrating (renames are idempotent-ish —
    already-moved files are gone from the top level); the pointer is
    written LAST.  Returns the migrated version (1), or None when there
    was nothing to migrate (already versioned, or genuinely empty).

    The commit marker is the ``_LATEST`` pointer itself: a table with a
    pointer is already versioned (stray top-level files are foreign —
    untouched); without one, top-level parquet files are the legacy
    snapshot, moved even if a crashed earlier migration already created
    ``v=1`` (the resume case)."""
    fs, p, jvm = _fs_for(spark, root)
    if not fs.exists(p):
        return None
    if _resolve_latest(fs, jvm, root) is not None:
        return None
    flat = [
        st.getPath()
        for st in fs.listStatus(p)
        if not st.isDirectory() and not st.getPath().getName().startswith("_LATEST")
    ]
    if not any(fp.getName().endswith(".parquet") for fp in flat):
        return None
    vdir = jvm.org.apache.hadoop.fs.Path(f"{root}/v=1")
    fs.mkdirs(vdir)
    for fp in flat:
        fs.rename(fp, jvm.org.apache.hadoop.fs.Path(f"{root}/v=1/{fp.getName()}"))
    _flip_latest(spark, root, 1)
    return 1


def write_snapshot(
    df: DataFrame,
    root: str,
    keep_last: int | None = None,
    zonemap_cols: list[str] | None = None,
    bloom_cols: list[str] | None = None,
) -> int:
    """Versioned full refresh — the reference's drop-and-reload
    (`Invoke-GraphDataPipelineToAzureSQLDatabase.ps1` truncate+insert;
    SURVEY.md L2) upgraded with HISTORY: every publish writes a NEW
    ``v=N`` directory and then flips the ``_LATEST`` pointer file, so

    - readers never see a half-written table (they resolve the pointer,
      which only ever names a fully-committed version — the pointer flip
      is a tiny file replace, the closest a plain filesystem gets to the
      metastore pointer swap);
    - CONCURRENT PUBLISHERS are safe (r14, the `-m race` lane's
      snapshot mode): the table is written to a uid-suffixed staging dir
      and publishes via a CLAIM-RENAME loop — rename the stage onto
      ``v=N`` and verify OUR sentinel landed at the top level.  Hadoop
      rename onto an existing non-empty dir nests the source INSIDE it,
      so a loser detects the nesting through the sentinel, pulls its
      stage back out, and claims ``N+1``.  Every ``v=`` directory is
      therefore COMPLETE the instant it exists (the rename is the
      commit), racers serialize onto distinct versions, and the pointer
      commit is CAS-style (late r14): each publisher creates its own
      unique ``_LATEST.v{N}`` marker and readers resolve the max — no
      replace race exists, so interleaved flips cannot even transiently
      lag the committed maximum.  KNOWN TRANSIENT (r15, ADVICE): while
      a loser pulls its nested stage back out of the winner's ``v=N``,
      a concurrent reader of THAT version can transiently see the
      non-hidden ``v.stage.*`` subdir and fail partition-structure
      inference — retry-on-read territory; a loser that crashes
      mid-pull leaves the nested dir for ``vacuum_snapshots``'s
      TTL-gated stage sweep;
    - the previous snapshot stays queryable (``read_snapshot(version=…)``)
      for audit/rollback — the time-travel primitive table formats
      provide, at directory granularity;
    - ``keep_last`` expires old versions AFTER the flip (never the one
      just published), bounding storage like the reference's
      @MaxInventoryAge retention bounds history.

    ``zonemap_cols`` (r10, r9 VERDICT item 9): build the file-level
    min/max manifest (:func:`build_zonemap`) on the new version directory
    BEFORE the pointer flip — the manifest is part of the committed
    version, so every pointer-visible snapshot can serve
    :func:`read_snapshot_pruned` file skipping; a crash between manifest
    and flip leaves an orphan version exactly as before.

    ``bloom_cols`` (late r10): likewise, per-file Bloom manifests
    (:func:`build_bloom_manifest`) are built on the new version before
    the flip, so committed snapshots serve
    :func:`read_snapshot_bloom_pruned` equality skipping on columns the
    layout is not clustered by.

    Returns the new version number.
    """
    import uuid

    spark = df.sparkSession
    uid = uuid.uuid4().hex[:8]
    stage_name = f"v.stage.{uid}"
    stage = f"{root}/{stage_name}"
    df.write.mode("overwrite").parquet(stage)
    # manifests are built INSIDE the staged dir and travel with the
    # claim-rename; recorded paths relocate, which the pruned readers'
    # table-relative identity (_table_suffix) already resolves
    if zonemap_cols:
        build_zonemap(spark, stage, zonemap_cols)
    if bloom_cols:
        build_bloom_manifest(spark, stage, bloom_cols)
    fs, _, jvm = _fs_for(spark, root)
    hp = jvm.org.apache.hadoop.fs.Path
    new_v = _claim_publish(spark, root, stage, stage_name, uid)
    _flip_latest(spark, root, new_v)
    if keep_last is not None:
        for v in snapshot_versions(spark, root)[:-keep_last]:
            if v != new_v:
                fs.delete(hp(f"{root}/v={v}"), True)
    return new_v


def _claim_publish(
    spark: SparkSession, root: str, stage: str, stage_name: str, uid: str
) -> int:
    """The CLAIM-RENAME version publish shared by every snapshot writer
    (r15: factored out of write_snapshot so compact_snapshot retires the
    last direct-to-``v=N`` write path).  ``stage`` must be a complete
    staged version dir named ``{root}/{stage_name}``; returns the
    version number the stage landed on.  The pointer is NOT flipped —
    that stays the caller's commit.

    The sentinel carries the stage's FULL relative file manifest (r15,
    ADVICE posture item): on an atomic-rename store the claim's
    existence IS completeness, but on a copy-rename store (S3-style
    rename = copy file-by-file + delete) the sentinel — first in name
    order — can land while data files are still copying; a crash then
    leaves a TORN v= dir that looks claimed.  Verifying the manifest
    against the destination listing before returning turns that
    silent-torn window into an explicit raise.  NOTE the
    concurrent-publisher guarantee still REQUIRES atomic rename
    (copy-"rename" onto an existing dir merges contents instead of
    nesting — two racers could interleave into one dir); on copy-rename
    stores run a single publisher per root."""
    fs, _, jvm = _fs_for(spark, root)
    hp = jvm.org.apache.hadoop.fs.Path
    manifest = _rel_files(fs, hp, stage)
    out = fs.create(hp(f"{stage}/_PUB_{uid}"), True)
    out.write(bytearray("\n".join(manifest).encode("utf-8")))
    out.close()
    versions = snapshot_versions(spark, root)
    new_v = (versions[-1] + 1) if versions else 1
    err_streak = 0
    while True:
        dst = f"{root}/v={new_v}"
        rename_exc = None
        try:
            fs.rename(hp(stage), hp(dst))
        except Exception as e:  # noqa: BLE001 — lost claim OR a real FS error
            rename_exc = e
        if fs.exists(hp(f"{dst}/_PUB_{uid}")):
            # claim landed — verify completeness before the flip (a
            # no-op set-compare on atomic stores; the torn-copy catch
            # on copy-rename stores).  Tolerant walk (r16, ADVICE): a
            # LOSING racer whose rename nested its ``*.stage.*`` dir
            # inside our committed dst may be renaming it back out
            # while we list — skip stage-named subdirs (never in our
            # manifest; our stage holds data files, not nested stages)
            # and tolerate entries vanishing mid-walk, so the verify
            # can't fail a publish whose version dir actually committed.
            have = set(_rel_files(fs, hp, dst, tolerant=True))
            missing = [f for f in manifest if f not in have]
            if missing:
                raise OSError(
                    f"torn snapshot claim at {dst}: {len(missing)} staged "
                    f"files missing after a non-atomic rename (e.g. "
                    f"{missing[:3]}) — pointer NOT flipped; vacuum the "
                    f"orphan and re-publish (single-publisher only on "
                    f"copy-rename stores)"
                )
            return new_v  # v=new_v is OURS and complete
        nested = f"{dst}/{stage_name}"
        if fs.exists(hp(f"{nested}/_PUB_{uid}")):
            # a racer owns new_v and Hadoop nested our stage inside its
            # committed dir — pull it back out and claim the next number
            fs.rename(hp(nested), hp(stage))
            err_streak = 0
        elif not fs.exists(hp(f"{stage}/_PUB_{uid}")):
            raise OSError(f"snapshot publish lost its staged dir under {root}")
        elif rename_exc is not None:
            # the rename THREW and the stage is still fully ours — that
            # is a real FS error (e.g. a copy-rename store failing
            # mid-copy), not a lost claim (losing never throws: the
            # rename returns false or nests).  Retrying forever would
            # spin minting empty v= dirs (r15, found by the copy-rename
            # posture test) — bound it and surface the error.
            err_streak += 1
            if err_streak >= 5:
                raise OSError(
                    f"snapshot publish: rename onto {root} failed "
                    f"{err_streak} consecutive times with our stage "
                    f"intact — surfacing the store error"
                ) from rename_exc
        else:
            err_streak = 0
        new_v += 1


def _rel_files(fs, hp, base: str, tolerant: bool = False) -> list[str]:
    """Sorted relative paths of every FILE under ``base`` (recursive) —
    the claim sentinel's completeness manifest (r15).  One driver-side
    listing, the same planning class as the manifest collect.

    ``tolerant`` (r16, ADVICE): used for the POST-claim verify walk,
    where a concurrent losing publisher may still be pulling its nested
    ``*.stage.*`` dir back out of our committed version dir — stage-named
    subdirs are skipped (they are never part of the walker's own
    manifest) and a subdir vanishing between listing and descent is
    treated as absent rather than raising, so a transient racer can't
    fail a publish that actually committed.  The manifest-build walk
    stays strict (a listing error there IS a real store error)."""
    out: list[str] = []
    stack = [(base, "")]
    while stack:
        d, prefix = stack.pop()
        try:
            entries = list(fs.listStatus(hp(d)))
        except Exception as e:  # noqa: BLE001 — Py4J-wrapped Java IO errors
            if tolerant and "FileNotFoundException" in str(e):
                continue  # racer pulled this subtree out mid-walk
            raise
        for st in entries:
            name = st.getPath().getName()
            if st.isDirectory():
                if tolerant and ".stage." in name:
                    continue  # a racer's nested stage — not ours
                stack.append((f"{d}/{name}", f"{prefix}{name}/"))
            else:
                out.append(f"{prefix}{name}")
    return sorted(out)


_LATEST_MARKER_RE = None  # compiled lazily (module import stays light)


def _latest_markers(fs, jvm, root: str) -> list[int]:
    """Versions named by ``_LATEST.v{N}`` marker files under ``root``."""
    global _LATEST_MARKER_RE
    if _LATEST_MARKER_RE is None:
        import re

        _LATEST_MARKER_RE = re.compile(r"^_LATEST\.v(\d+)$")
    p = jvm.org.apache.hadoop.fs.Path(root)
    if not fs.exists(p):
        return []
    out = []
    for st in fs.listStatus(p):
        m = _LATEST_MARKER_RE.match(st.getPath().getName())
        if m and not st.isDirectory():
            out.append(int(m.group(1)))
    return sorted(out)


def _resolve_latest(fs, jvm, root: str) -> int | None:
    """The committed pointer: max ``_LATEST.v{N}`` marker, else the
    legacy ``_LATEST`` file's content, else None."""
    marks = _latest_markers(fs, jvm, root)
    if marks:
        return marks[-1]
    latest = jvm.org.apache.hadoop.fs.Path(f"{root}/_LATEST")
    if not fs.exists(latest):
        return None
    try:
        stream = fs.open(latest)
        try:
            return int(bytes(stream.readAllBytes()).decode("ascii").strip())
        finally:
            stream.close()
    except Exception:  # noqa: BLE001 — torn legacy pointer: treat as absent
        return None


def _flip_latest(spark: SparkSession, root: str, new_v: int) -> None:
    """Commit the pointer at ``v=new_v`` — CAS-style (late r14, retiring
    the r13 replace-in-place design AND the r14 retry loop's residue):

    1. create the UNIQUE marker file ``_LATEST.v{new_v}`` (tmp + rename;
       no two publishers ever write the same name, so there is no
       replace race at all) — readers resolve ``max(_LATEST.v*)``, which
       is monotonic BY CONSTRUCTION: a slower racer's marker can never
       hide a faster one's, the residue the replace design had;
    2. best-effort refresh of the legacy ``_LATEST`` file to the current
       max (kept for human inspection and external readers; engine
       correctness no longer rides on it — a lost legacy update is
       invisible to ``_resolve_latest``);
    3. GC markers below the max, keeping the top 2 (the max is created
       before anything is deleted, so a concurrent reader's listing
       always contains it).

    A crash before (1)'s rename leaves the previous pointer fully live;
    a crash after it IS the commit."""
    fs, _, jvm = _fs_for(spark, root)
    hp = jvm.org.apache.hadoop.fs.Path
    import uuid

    marker = f"{root}/_LATEST.v{new_v}"
    tmp = hp(f"{root}/_LATESTtmp.{uuid.uuid4().hex[:6]}")
    out = fs.create(tmp, True)
    out.write(str(new_v).encode("ascii"))
    out.close()
    if not fs.rename(tmp, hp(marker)) and not fs.exists(hp(marker)):
        fs.delete(tmp, False)
        raise OSError(f"could not commit pointer marker {marker}")
    marks = _latest_markers(fs, jvm, root)
    cur_max = marks[-1] if marks else new_v
    # legacy mirror (best-effort replace; never load-bearing)
    try:
        ltmp = hp(f"{root}/_LATESTtmp.{uuid.uuid4().hex[:6]}")
        lout = fs.create(ltmp, True)
        lout.write(str(cur_max).encode("ascii"))
        lout.close()
        legacy = hp(f"{root}/_LATEST")
        if fs.exists(legacy):
            fs.delete(legacy, False)
        if not fs.rename(ltmp, legacy):
            fs.delete(ltmp, False)
    except Exception:  # noqa: BLE001 — mirror only
        pass
    for v in marks[:-2]:
        try:
            fs.delete(hp(f"{root}/_LATEST.v{v}"), False)
        except Exception:  # noqa: BLE001 — GC is advisory
            pass


def compact_snapshot(
    spark: SparkSession,
    root: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    zonemap_cols: list[str] | None = None,
    bloom_cols: list[str] | None = None,
) -> dict:
    """Transactional small-file compaction for a snapshot-versioned table
    (r6 VERDICT item 4, closing What's-missing #3): ``compact_parquet``
    leaves the old/new directory swap "as the caller's transaction", and
    ``write_snapshot`` already owns an atomic pointer flip — this composes
    the two, the maintenance pass a snapshot warehouse runs at every
    maintenance window.

    Protocol (r15: unified onto the claim-rename publish — this was the
    last direct-to-``v=N`` writer): resolve the ``_LATEST`` version,
    compact its files into a uid-suffixed ``v.stage.*`` dir (a rewrite
    of the same rows into size-targeted files — no logical change),
    claim a version through :func:`_claim_publish` (racing publishers
    serialize onto distinct complete versions instead of clobbering),
    then flip the pointer.  Readers concurrent with the compaction
    resolve either v=N (pre-claim/flip) or the new version (post-flip) —
    both complete, identical tables; a crash BEFORE the claim leaves
    only ``v.stage.*`` debris (vacuum's TTL sweep), a crash between
    claim and flip leaves an orphan version ``vacuum_snapshots``
    collects.  Old versions remain for time travel; expire with
    ``write_snapshot``'s ``keep_last`` on the next publish or
    ``vacuum_snapshots`` outside one.

    Returns ``compact_parquet``'s stats plus ``{"from_version", "version"}``.
    """
    versions = snapshot_versions(spark, root)
    if not versions:
        raise ValueError(f"no snapshot versions under {root}")
    cur_v = _read_latest_version(spark, root)
    # r15: compaction publishes through the SAME claim-rename protocol
    # as write_snapshot (this was the last direct-to-``v=N`` writer) —
    # the compacted rewrite stages under a uid dir, so a crashed
    # compaction leaves vacuum-sweepable ``v.stage.*`` debris instead of
    # a partial version dir, and a compaction racing a publisher
    # serializes onto a distinct complete version instead of clobbering.
    import uuid

    uid = uuid.uuid4().hex[:8]
    stage_name = f"v.stage.{uid}"
    stage = f"{root}/{stage_name}"
    stats = compact_parquet(spark, f"{root}/v={cur_v}", stage, target_file_bytes)
    # manifests refreshed at commit (r10): compaction changes the file set,
    # so zone maps AND Bloom filters must be rebuilt on the NEW version
    # before the flip — this is also how a Bloom table streaming-appended
    # into many small files gets its periodic rewrite: compaction rebuilds
    # the per-file filters over the merged files as part of the same commit
    if zonemap_cols:
        build_zonemap(spark, stage, zonemap_cols)
    if bloom_cols:
        build_bloom_manifest(spark, stage, bloom_cols)
    new_v = _claim_publish(spark, root, stage, stage_name, uid)
    _flip_latest(spark, root, new_v)
    return {**stats, "from_version": cur_v, "version": new_v}


def read_snapshot(spark: SparkSession, root: str, version: int | None = None) -> DataFrame:
    """Read a snapshot table: the ``_LATEST``-pointed version by default,
    or an explicit historical ``version``."""
    if version is None:
        version = _read_latest_version(spark, root)
    return spark.read.parquet(f"{root}/v={version}")


def read_snapshot_pruned(
    spark: SparkSession, root: str, col: str, lo, hi, version: int | None = None
) -> DataFrame:
    """Range scan of a snapshot-versioned table THROUGH its committed
    zone-map manifest (r10, r9 VERDICT item 9 — file pruning as the
    warehouse default, not a side demo): resolve the ``_LATEST`` pointer
    (or an explicit ``version``), then :func:`scan_pruned` the version
    directory — only files whose [min, max] overlaps [lo, hi] are opened,
    with the residual filter preserving exact semantics.  Requires the
    version to have been published with ``write_snapshot(...,
    zonemap_cols=[col, …])`` / ``compact_snapshot(..., zonemap_cols=…)``;
    falls back to a plain filtered read when no manifest exists (pruning
    is an optimization, never a requirement)."""
    if version is None:
        version = _read_latest_version(spark, root)
    vdir = f"{root}/v={version}"
    rows = _zonemap_rows_cached(spark, vdir)  # immutable version dir
    if rows is None:
        from pyspark.sql import functions as F

        return spark.read.parquet(vdir).filter(F.col(col).between(lo, hi))
    return scan_pruned(spark, vdir, col, lo, hi, _manifest_rows=rows)


def read_snapshot_bloom_pruned(
    spark: SparkSession, root: str, col: str, value, version: int | None = None
) -> DataFrame:
    """Point lookup on a snapshot-versioned table THROUGH its committed
    Bloom manifest (late r10): resolve the pointer, then
    :func:`scan_bloom_pruned` the version directory — only
    Bloom-candidate files open, residual equality filter preserves exact
    semantics.  Requires publication with ``bloom_cols=[col, …]``; falls
    back to a plain filtered read when no manifest exists.  Because
    :func:`compact_snapshot` rebuilds the filters as part of its commit,
    a streaming-appended Bloom table's small files and their stale
    manifests are retired TOGETHER at each maintenance window."""
    if version is None:
        version = _read_latest_version(spark, root)
    vdir = f"{root}/v={version}"
    fs, _, jvm = _fs_for(spark, vdir)
    if not fs.exists(jvm.org.apache.hadoop.fs.Path(f"{vdir}/_bloom_{col}")):
        from pyspark.sql import functions as F

        return spark.read.parquet(vdir).filter(F.col(col) == value)
    return scan_bloom_pruned(spark, vdir, col, value)


def _read_latest_version(spark: SparkSession, root: str) -> int:
    fs, _, jvm = _fs_for(spark, root)
    got = _resolve_latest(fs, jvm, root)
    if got is not None:
        return got
    # r14: a legacy table whose replace-window crash lost the pointer.
    # Under the claim-rename publish every v= dir is complete the
    # instant it exists, so the max version is a safe (possibly
    # slightly-early-visible) resolution — but a table with versions
    # and NO pointer is still a crash scar worth surfacing.
    versions = snapshot_versions(spark, root)
    if versions:
        import warnings

        # r15 (ADVICE): gate the fallback on evidence the dir was
        # actually COMMITTED — a claim-rename publish always carries a
        # `_PUB_*` sentinel, a legacy direct write that finished carries
        # Spark's `_SUCCESS`.  A legacy root's max v= can be an
        # UNCOMMITTED crash scar (partial part files from the old
        # direct-to-v=N protocol); serving that silently would trade a
        # loud FileNotFoundError for possibly-incomplete data.
        hp = jvm.org.apache.hadoop.fs.Path
        for v in reversed(versions):
            vdir = f"{root}/v={v}"
            committed = fs.exists(hp(f"{vdir}/_SUCCESS")) or any(
                st.getPath().getName().startswith("_PUB_")
                for st in fs.listStatus(hp(vdir))
            )
            if committed:
                warnings.warn(
                    f"{root} has no _LATEST pointer (crashed replace?) — "
                    f"resolving to max committed version v={v}",
                    RuntimeWarning,
                    stacklevel=2,
                )
                return v
        raise FileNotFoundError(
            f"{root} has version dirs but no pointer and no commit "
            f"evidence (_PUB_*/_SUCCESS) in any of them — refusing to "
            f"serve possible crash debris"
        )
    raise FileNotFoundError(f"no snapshot pointer or versions under {root}")


def vacuum_snapshots(
    spark: SparkSession, root: str, keep_last: int = 2, stage_ttl_s: float = 3600.0
) -> dict:
    """Garbage-collect a snapshot-versioned table OUTSIDE a publish (r8,
    r7 VERDICT item 4 — previously compact_snapshot's docstring left
    orphan collection as a manual step):

    - ORPHANS: ``v=N`` directories with N greater than the ``_LATEST``
      pointer are writes that never committed (a crash between the
      version write and the pointer flip — write_snapshot, compact
      _snapshot, or the sync streams) — deleted;
    - EXPIRED: committed versions older than the newest ``keep_last``
      (the pointer-resolved version always survives, whatever
      ``keep_last`` says) — deleted.

    Safe against concurrent READERS by the same argument as the pointer
    flip: a reader resolves ``_LATEST`` to a committed version that
    vacuum never touches (expiry keeps the pointed version
    unconditionally; orphans were never pointer-visible).  Explicit
    time-travel readers of an expired version can error — expiry is the
    point; pick ``keep_last`` ≥ the audit window.  NOT safe against a
    concurrent WRITER (its in-flight v=N+1 looks like an orphan) —
    single-publisher maintenance window, the write_snapshot contract.

    Returns ``{"removed_orphans": [...], "removed_expired": [...],
    "kept": [...], "removed_stages": [...]}``.

    STAGE DEBRIS (r15, ADVICE): crashed publishers leave ``v.stage.*``
    dirs at the top level, and a loser that crashed mid-claim can leave
    its stage NESTED inside a winner's committed ``v=N`` (Hadoop's
    rename-into-existing-dir nesting) — the nested form can break a
    reader's partition-structure inference, permanently if never swept.
    Both are deleted when older than ``stage_ttl_s`` (age-gated so an
    IN-FLIGHT publisher's live stage survives a concurrent vacuum —
    matching the single-writer caveat above, belt-and-braces).
    """
    import time as _time

    fs, _, jvm = _fs_for(spark, root)
    hp = jvm.org.apache.hadoop.fs.Path
    removed_stages: list[str] = []
    now_ms = None
    if fs.exists(hp(root)):
        candidates = []
        for st in fs.listStatus(hp(root)):
            nm = st.getPath().getName()
            if st.isDirectory() and nm.startswith("v.stage."):
                candidates.append(st)
            elif st.isDirectory() and nm.startswith("v="):
                for sub in fs.listStatus(st.getPath()):
                    if sub.isDirectory() and sub.getPath().getName().startswith(
                        "v.stage."
                    ):
                        candidates.append(sub)
        if candidates:
            now_ms = _time.time() * 1000.0
            for st in candidates:
                if now_ms - st.getModificationTime() > stage_ttl_s * 1000.0:
                    fs.delete(st.getPath(), True)
                    removed_stages.append(st.getPath().toString())
    versions = snapshot_versions(spark, root)
    if not versions:
        return {
            "removed_orphans": [],
            "removed_expired": [],
            "kept": [],
            "removed_stages": removed_stages,
        }
    cur = _read_latest_version(spark, root)
    committed = [v for v in versions if v <= cur]
    orphans = [v for v in versions if v > cur]
    keep = set(committed[-max(keep_last, 1):]) | {cur}
    expired = [v for v in committed if v not in keep]
    for v in orphans + expired:
        fs.delete(jvm.org.apache.hadoop.fs.Path(f"{root}/v={v}"), True)
    return {
        "removed_orphans": orphans,
        "removed_expired": expired,
        "kept": sorted(keep),
        "removed_stages": removed_stages,
    }


def snapshot_exists(spark: SparkSession, root: str) -> bool:
    """True iff a COMMITTED snapshot exists at ``root`` — a pointer
    (``_LATEST.v{N}`` marker or legacy ``_LATEST`` file) is the commit
    marker (a ``v=N`` directory without one is a crashed, never-committed
    first write: bootstrapping over it is safe and ``write_snapshot``
    will pick the next free version)."""
    fs, _, jvm = _fs_for(spark, root)
    return _resolve_latest(fs, jvm, root) is not None


STANDING_ARTIFACT_PREFIXES = (
    "msgdp_ivfpq_",
    "msgdp_lex_",
    "msgdp_zm_",
    "msgdp_cm_",
    "msgdp_bloom_",  # late r10: Bloom-manifest layouts
    "msgdp_rc_",  # late r10: plan-fingerprint result cache
    "msgdp_bkt_",  # late r10: co-bucketed fact warehouse
    "msgdp_sent_",  # late r10: sentinel-extended stream copies
    "msgdp_ppj_",  # r11: standing prefix-gram (PPJoin) index
)


def vacuum_standing_artifacts(
    spark: SparkSession,
    base_dir: str | None = None,
    keep_roots: set[str] | list[str] | tuple[str, ...] = (),
    prefixes: tuple[str, ...] = STANDING_ARTIFACT_PREFIXES,
    ttl_hours: float | None = None,
) -> dict:
    """Garbage-collect STALE standing-artifact roots (r10, r9 VERDICT
    item 7): every corpus fingerprint mints a fresh ``msgdp_ivfpq_*`` /
    ``msgdp_lex_*`` / ``msgdp_zm_*`` root, so regenerating a fixture (or
    re-ingesting a corpus) strands the old artifact forever —
    ``vacuum_snapshots`` collects versions WITHIN a root but nothing
    swept dead roots.

    ``keep_roots`` is the live set: callers pass the roots their current
    corpora resolve to (``standing_index_root(sf_dir)``,
    ``lexicon_root(sf_dir)``, …) — anything else under ``base_dir``
    matching a standing prefix is deleted, optionally only when its
    modification time is older than ``ttl_hours`` (for deployments where
    the live set can't be enumerated; mtime refreshes on every compact /
    append, so a serving artifact keeps itself alive).

    All listing/deletion goes through the Hadoop FS API, so the sweep
    works identically when ``base_dir`` is an object-store prefix.
    Single-maintainer window, like ``vacuum_snapshots``: a concurrent
    first-touch build of a NEW fingerprint can look stale to a
    concurrent vacuum (no commit pointer yet) — run GC from the same
    maintenance scheduler that owns compaction.

    Returns ``{"removed": [...], "kept": [...]}`` (absolute paths).
    """
    import os
    import tempfile
    import time as _time

    base = base_dir or tempfile.gettempdir()
    keep = {os.path.normpath(r) for r in keep_roots}
    fs, bp, jvm = _fs_for(spark, base)
    removed, kept = [], []
    if not fs.exists(bp):
        return {"removed": removed, "kept": kept}
    now_ms = _time.time() * 1000.0
    for st in fs.listStatus(bp):
        name = st.getPath().getName()
        if not (st.isDirectory() and any(name.startswith(px) for px in prefixes)):
            continue
        full = os.path.normpath(os.path.join(base, name))
        if full in keep:
            kept.append(full)
            continue
        if ttl_hours is not None:
            age_h = (now_ms - st.getModificationTime()) / 3_600_000.0
            if age_h < ttl_hours:
                kept.append(full)
                continue
        fs.delete(st.getPath(), True)
        removed.append(full)
    return {"removed": removed, "kept": kept}


# --- Partitioned SCD2 store (r9): O(current + delta) sync rounds -------------
#
# `apply_scd2` already keeps closed history rows untouched in its OUTPUT —
# but a store that holds the whole history in one versioned table still
# REWRITES them every round (r8 layout: read full history, write full
# history).  At a 100 TB dimension history with hourly deltas that
# O(history) I/O dominates everything.  The partitioned store lets closed
# rows stay on disk untouched:
#
#   {root}/current/v=N/...   — snapshot-versioned CURRENT slice (small:
#                              one row per live key), atomic _LATEST flip
#   {root}/closed/r=N/...    — append-only per-round increments of rows
#                              CLOSED in round N; never rewritten
#
# A round reads O(current), joins O(delta), writes O(current + closed_Δ).
# Commit protocol (same token-last discipline as the sync streams):
#   1. vacuum orphans (any v>pointer / r>pointer from a crashed round) —
#      makes the replayed round's version number deterministic;
#   2. write closed/r=new_v (the round's newly-closed rows);
#   3. write current/v=new_v and FLIP the pointer — the commit point:
#      a closed increment is visible to readers only when r <= pointer,
#      so a crash between 2 and 3 leaves an invisible orphan that the
#      next round's vacuum removes and the replay rewrites identically.
# Replay after a FULL commit (crash before the caller saved its resume
# token) re-applies the same delta to the already-updated current slice:
# no attribute diff, no tombstone to re-close → the new round closes
# nothing and republishes an identical current slice — idempotent.


def _scd2_meta_schema(schema):
    from pyspark.sql import types as T

    return T.StructType(
        list(schema.fields)
        + [
            T.StructField("valid_from", T.TimestampType()),
            T.StructField("valid_to", T.TimestampType()),
            T.StructField("is_current", T.BooleanType()),
        ]
    )


def scd2_store_begin_round(spark: SparkSession, root: str, schema) -> tuple[DataFrame, int]:
    """Open an SCD2 round on the partitioned store: vacuum crash orphans,
    migrate any pre-partitioned layout, and return ``(current_slice,
    new_version)``.  ``schema`` is the ATTRIBUTE schema (keys + tracked
    columns, no validity metadata) — used for the empty bootstrap frame
    and the explicit-schema closed reads.

    Migration (one-time, commit-markered by ``current/_LATEST``): an r8
    whole-history versioned table at ``root`` (``v=N`` dirs) or a pre-r8
    flat parquet dir is split into the partitioned layout — current rows
    to ``current/v=1``, closed rows to ``closed/r=1`` — so no prior
    history is ever mistaken for "first round" (the ADVICE r8 hazard).
    """
    meta = _scd2_meta_schema(schema)
    cur_root = f"{root}/current"
    fs, _, jvm = _fs_for(spark, root)
    if not snapshot_exists(spark, cur_root):
        legacy = None
        if snapshot_exists(spark, root):  # r8 whole-history versioned layout
            legacy = read_snapshot(spark, root)
        elif ensure_versioned_layout(spark, root) is not None:  # pre-r8 flat
            legacy = read_snapshot(spark, root)
        if legacy is not None:
            legacy.filter(~F.col("is_current")).write.mode("overwrite").parquet(
                f"{root}/closed/r=1"
            )
            legacy.filter(F.col("is_current")).write.mode("overwrite").parquet(
                f"{cur_root}/v=1"
            )
            _flip_latest(spark, cur_root, 1)
    if snapshot_exists(spark, cur_root):
        ptr = _read_latest_version(spark, cur_root)
        for v in _list_numbered_dirs(spark, cur_root, "v="):
            if v > ptr:
                fs.delete(jvm.org.apache.hadoop.fs.Path(f"{cur_root}/v={v}"), True)
        for r in _list_numbered_dirs(spark, f"{root}/closed", "r="):
            if r > ptr:
                fs.delete(jvm.org.apache.hadoop.fs.Path(f"{root}/closed/r={r}"), True)
        return read_snapshot(spark, cur_root), ptr + 1
    return spark.createDataFrame([], meta), 1


def scd2_store_commit_round(
    spark: SparkSession,
    root: str,
    merged: DataFrame,
    new_v: int,
    keep_last: int | None = None,
) -> dict:
    """Publish one round's ``apply_scd2`` output (computed against the
    CURRENT slice only): newly-closed rows append as ``closed/r=new_v``,
    the new current slice becomes ``current/v=new_v``, pointer flips last
    (the commit point — see the layout comment above).  ``keep_last``
    expires old CURRENT versions only; closed increments are the
    permanent history and are never rewritten.  Returns write stats."""
    merged = merged.localCheckpoint(eager=True)  # two consumers, one compute
    cur_root = f"{root}/current"
    closed_inc = merged.filter(~F.col("is_current"))
    new_cur = merged.filter(F.col("is_current"))
    n_closed = closed_inc.count()
    closed_inc.write.mode("overwrite").parquet(f"{root}/closed/r={new_v}")
    new_cur.write.mode("overwrite").parquet(f"{cur_root}/v={new_v}")
    _flip_latest(spark, cur_root, new_v)
    if keep_last is not None:
        fs, _, jvm = _fs_for(spark, root)
        for v in snapshot_versions(spark, cur_root)[:-keep_last]:
            if v != new_v:
                fs.delete(jvm.org.apache.hadoop.fs.Path(f"{cur_root}/v={v}"), True)
    return {"version": new_v, "closed_rows_written": n_closed}


def read_scd2_history(spark: SparkSession, root: str, schema=None) -> DataFrame:
    """Full validity-interval history from an SCD2 store: the partitioned
    layout (current slice ∪ committed closed increments, ``r <=``
    pointer) when present, else the legacy whole-history snapshot at
    ``root``.  ``schema`` (attribute schema) makes empty closed
    increments readable (a round that closed nothing writes a
    zero-row directory)."""
    cur_root = f"{root}/current"
    if not snapshot_exists(spark, cur_root):
        return read_snapshot(spark, root)  # legacy whole-history layout
    cur = read_snapshot(spark, cur_root)
    ptr = _read_latest_version(spark, cur_root)
    rounds = [r for r in _list_numbered_dirs(spark, f"{root}/closed", "r=") if r <= ptr]
    if not rounds:
        return cur
    reader = spark.read
    if schema is not None:
        reader = reader.schema(_scd2_meta_schema(schema))
    else:
        reader = reader.schema(cur.schema)
    closed = reader.parquet(*[f"{root}/closed/r={r}" for r in rounds])
    return cur.unionByName(closed)


def forget_keys(
    spark: SparkSession,
    root: str,
    key_cols: list[str],
    keys_df: DataFrame,
    zonemap_cols: list[str] | None = None,
    erase_history: bool = True,
) -> dict:
    """Right-to-erasure (GDPR art. 17) for a snapshot-versioned table
    (r10): publish a new version equal to the current one MINUS the
    given keys (left-anti join — broadcastable: a deletion request list
    is model-sized), then, with ``erase_history`` (the default — erasure
    that leaves the rows readable via time travel is not erasure),
    DELETE every older version directory so no ``read_snapshot(version=…)``
    can resurrect them.  The pointer flips to the scrubbed version BEFORE
    history is erased, so concurrent readers never lose their table;
    single-publisher window like every maintenance op here.

    COMPLETE ERASURE is a family affair — after scrubbing the table,
    also forget from every DERIVED surface: the standing indexes
    (``dedup.prefix_index_forget`` / ``text.lexicon_forget`` /
    ``similarity.ann_index_forget``) and the result-reuse layer
    (``cache.result_cache_forget(root)`` — cached results built from
    this table retain the erased rows until targeted, r15).

    Standing artifacts (ANN index / lexicon / zone-map layouts) derived
    from the table need NO in-place scrub: they are rebuildable caches
    keyed on the source fingerprint — the scrubbed table mints a new
    fingerprint, first touch rebuilds without the forgotten rows, and
    ``vacuum_standing_artifacts`` collects the stale root holding them.

    Returns ``{"version", "rows_removed", "erased_versions"}``.
    """
    cur = read_snapshot(spark, root)
    pk = F.broadcast(keys_df.select(*key_cols).distinct())
    kept = cur.join(pk, key_cols, "left_anti")
    n_before = cur.count()
    new_v = write_snapshot(kept, root, zonemap_cols=zonemap_cols)
    n_after = read_snapshot(spark, root).count()
    erased = []
    if erase_history:
        fs, _, jvm = _fs_for(spark, root)
        for v in snapshot_versions(spark, root):
            if v != new_v:
                fs.delete(jvm.org.apache.hadoop.fs.Path(f"{root}/v={v}"), True)
                erased.append(v)
    # r16: an erasure must also drop retained planning state — cached
    # zonemap manifests under this root carry per-file min/max of the
    # pre-erasure layout
    zonemap_cache_forget(root)
    return {
        "version": new_v,
        "rows_removed": int(n_before - n_after),
        "erased_versions": erased,
    }


def scd2_forget_keys(
    spark: SparkSession,
    root: str,
    key_cols: list[str],
    keys_df: DataFrame,
    schema=None,
) -> dict:
    """Right-to-erasure across the partitioned SCD2 store (r10): the
    forgotten keys' CURRENT rows and ALL their closed history rows
    disappear; every other row and every round number is untouched.

    Closed increments are immutable by the store's contract — legal
    erasure is the documented exception.  Each committed ``closed/r=N``
    increment holding a forgotten key is rewritten MINUS those keys
    under the SAME round number (round arithmetic, replay and
    ``read_scd2_history`` are unaffected) via a tmp-dir swap:

        1. write ``closed/.forget_tmp_r=N`` (the scrubbed increment)
        2. delete ``closed/r=N``
        3. rename tmp → ``closed/r=N``

    A crash at any step is recoverable: before scrubbing, any orphan tmp
    whose final directory is MISSING is renamed into place (completes a
    step-2/3 crash); an orphan tmp whose final still exists is discarded
    (step-1 crash).  Dotted tmp names are invisible to the round lister.
    The current slice republishes as a new version and older current
    versions are erased (they hold the forgotten keys' last rows).

    Returns ``{"current_version", "rows_removed_current",
    "rewritten_rounds"}``.
    """
    cur_root = f"{root}/current"
    fs, _, jvm = _fs_for(spark, root)
    pk = F.broadcast(keys_df.select(*key_cols).distinct())

    # recovery: complete any crashed previous forget's tmp swaps
    closed_root = f"{root}/closed"
    cp = jvm.org.apache.hadoop.fs.Path(closed_root)
    if fs.exists(cp):
        for st in fs.listStatus(cp):
            name = st.getPath().getName()
            if name.startswith(".forget_tmp_r="):
                final = jvm.org.apache.hadoop.fs.Path(
                    f"{closed_root}/{name[len('.forget_tmp_'):]}"
                )
                if fs.exists(final):
                    fs.delete(st.getPath(), True)  # step-1 crash: discard
                else:
                    fs.rename(st.getPath(), final)  # step-2/3 crash: complete

    # scrub the current slice (new version, erase older current versions)
    cur = read_snapshot(spark, cur_root)
    n_before = cur.count()
    kept = cur.join(pk, key_cols, "left_anti")
    new_v = write_snapshot(kept, cur_root)
    n_after = read_snapshot(spark, cur_root).count()
    for v in snapshot_versions(spark, cur_root):
        if v != new_v:
            fs.delete(jvm.org.apache.hadoop.fs.Path(f"{cur_root}/v={v}"), True)

    # scrub every closed increment that holds a forgotten key
    reader_schema = _scd2_meta_schema(schema) if schema is not None else cur.schema
    rewritten = []
    for r in _list_numbered_dirs(spark, closed_root, "r="):
        inc_path = f"{closed_root}/r={r}"
        inc = spark.read.schema(reader_schema).parquet(inc_path)
        if inc.join(pk, key_cols, "left_semi").limit(1).count() == 0:
            continue
        tmp = f"{closed_root}/.forget_tmp_r={r}"
        inc.join(pk, key_cols, "left_anti").write.mode("overwrite").parquet(tmp)
        fs.delete(jvm.org.apache.hadoop.fs.Path(inc_path), True)
        fs.rename(
            jvm.org.apache.hadoop.fs.Path(tmp),
            jvm.org.apache.hadoop.fs.Path(inc_path),
        )
        rewritten.append(r)
    return {
        "current_version": new_v,
        "rows_removed_current": int(n_before - n_after),
        "rewritten_rounds": rewritten,
    }


def refresh_agg_incremental(
    snapshot: DataFrame,
    old_agg: DataFrame | None,
    touched_keys: DataFrame,
    group_keys: list[str],
    build_agg,
) -> DataFrame:
    """Incrementally maintain a materialized aggregate under keyed deltas
    (r8): the aggregate-table consumer of ``apply_delta`` /
    ``delta_sync_stream`` rounds.  ``build_agg(df) -> DataFrame`` is the
    aggregation keyed by ``group_keys``; instead of re-aggregating the
    whole snapshot each round, only the groups the round TOUCHED
    (upserted or tombstoned keys — project them to their group keys)
    recompute from the new snapshot, and the aggregate table is patched:

        kept  = old_agg ANTI-JOIN touched          (untouched groups as-is)
        fresh = build_agg(snapshot SEMI-JOIN touched)
        new   = kept ∪ fresh

    A touched group whose last row was deleted simply has no fresh row —
    it drops out of the aggregate, matching the full rebuild.  The
    invariant (pytest-pinned): after any sequence of rounds the result
    row-equals ``build_agg(snapshot)``.

    Scale shape: the anti-join shuffles the AGGREGATE table (|groups|
    rows, not data-sized); the semi-join restricts the snapshot scan to
    touched groups (partition-prunable when the snapshot is
    bucketed/partitioned by the group key); the re-aggregation covers
    only touched groups' rows.  Cost tracks the DELTA's group footprint,
    not the corpus — the difference between an O(round) and an O(history)
    refresh at 100 TB.  ``old_agg=None`` bootstraps (full build).
    """
    t = touched_keys.select(*group_keys).distinct()
    fresh = build_agg(snapshot.join(t, group_keys, "left_semi"))
    if old_agg is None:
        return build_agg(snapshot)
    kept = old_agg.join(t, group_keys, "left_anti")
    return kept.unionByName(fresh)


def build_zonemap(spark: SparkSession, path: str, cols: list[str]) -> int:
    """File-level min/max manifest (r9) — the missing CONSUMER layer for
    the clustered layouts ``write_zordered``/``write_bucketed`` produce:
    parquet row-group stats skip WITHIN a file the reader already opened,
    but Spark only skips whole FILES on partition values — this manifest
    adds Iceberg/Delta-style file pruning for plain parquet directories.

    One scan aggregates (min, max, n_rows) per file per column into
    ``path/_zonemap`` (the leading underscore hides it from Spark's file
    index, like ``_SUCCESS``).  Manifest size is O(files · cols) — the
    planning-scale table every lakehouse format keeps.  Returns the file
    count."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(path)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    zm = df.groupBy(F.input_file_name().alias("file")).agg(*aggs)
    zm.coalesce(1).write.mode("overwrite").parquet(f"{path}/_zonemap")
    return spark.read.parquet(f"{path}/_zonemap").count()


def refresh_zonemap(spark: SparkSession, path: str, cols: list[str]) -> dict:
    """Incremental zone-map maintenance (r10): bring ``path/_zonemap`` up
    to date by scanning ONLY the data files the manifest does not know
    yet — the O(delta) manifest refresh a streaming/append sink needs
    (``build_zonemap`` rescans the whole table; at 100 TB that defeats
    the point of appending).

    New files are found by a RECURSIVE Hadoop FS listing (late r12:
    partitioned layouts keep data in ``col=val`` subdirectories a
    top-level listing never sees — appends there previously stayed
    pruned-invisible FOREVER, not just until the next refresh) diffed
    against the manifest by table-relative identity
    (:func:`_table_suffix` — same-named part files in different
    partition dirs are distinct; a relocated table still matches); their
    stats aggregate from an EXPLICIT file-list read — by construction no
    already-manifested file is opened.  The refreshed manifest
    republishes as one overwrite of the model-sized ``_zonemap`` table.

    This is also the CRASH RECOVERY for ``append_zonemap``: data files
    appended before a crash that never reached the manifest are exactly
    "files the manifest does not know" — re-running the refresh heals
    the gap (until then they are invisible to ``scan_pruned`` but
    visible to plain reads; pruned reads are never WRONG, only stale).

    Returns ``{"new_files": [...], "manifest_rows": N}``.
    """
    from pyspark.sql import functions as F

    zm_path = f"{path}/_zonemap"
    # pin the manifest EAGERLY (r14): a concurrent refresher's staged
    # swap relocates the manifest files mid-plan otherwise (its aside
    # rename turns our lazily-listed absolute paths into dangling ones);
    # the manifest is model-sized, so the checkpoint is planning-cost.
    # Retry the initial read across a racer's aside→rename-in instant.
    import time as _time

    for attempt in range(10):
        try:
            old = spark.read.parquet(zm_path).localCheckpoint(eager=True)
            break
        except Exception:  # noqa: BLE001 — racer mid-swap
            if attempt == 9:
                # r15 (ADVICE): a refresher KILLED between its aside
                # rename and its rename-in leaves NO manifest and (until
                # now) nothing ever restored it — every later refresh
                # raised here forever.  If an orphaned aside exists,
                # restore the newest one and continue; both aside and
                # live manifest are complete-by-construction, so either
                # is a correct (possibly stale) base for this refresh.
                restored = _restore_zonemap_aside(spark, path)
                if restored:
                    old = spark.read.parquet(zm_path).localCheckpoint(eager=True)
                    break
                raise
            _time.sleep(0.05)

    known = {_table_suffix(path, r["file"]) for r in old.select("file").collect()}
    fs, p, jvm = _fs_for(spark, path)
    new_files = []
    stack = [p]
    while stack:
        d = stack.pop()
        for st in fs.listStatus(d):
            name = st.getPath().getName()
            if name.startswith(("_", ".")):
                continue
            if st.isDirectory():
                stack.append(st.getPath())
            elif st.isFile() and _table_suffix(
                path, st.getPath().toString()
            ) not in known:
                new_files.append(st.getPath().toString())
    if new_files:
        aggs = [F.count(F.lit(1)).alias("n_rows")]
        for c in cols:
            aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
        fresh = (
            spark.read.option("basePath", path)  # recover partition cols
            .schema(spark.read.parquet(path).schema)
            .parquet(*new_files)
            .groupBy(F.input_file_name().alias("file"))
            .agg(*aggs)
        )
        merged = old.unionByName(fresh).localCheckpoint(eager=True)
        # staged swap (r14, the `-m race` lane's zonemap mode): the r13
        # in-place overwrite let two concurrent refreshers interleave
        # delete-and-write inside the live manifest dir — a torn manifest
        # makes pruned scans silently incomplete, the one outcome the
        # layer forbids.  Now each refresher stages its COMPLETE merged
        # manifest and claim-renames it in; the loser detects Hadoop's
        # nest-into-existing-dir through its sentinel and discards its
        # copy (both merges are complete — either winning is correct).
        import uuid

        uid = uuid.uuid4().hex[:8]
        stage_name = f"_zonemap.stage.{uid}"
        zm_stage = f"{path}/{stage_name}"
        merged.coalesce(1).write.mode("overwrite").parquet(zm_stage)
        hp = jvm.org.apache.hadoop.fs.Path
        sent = fs.create(hp(f"{zm_stage}/_SWAP_{uid}"), True)
        sent.write(b"1")
        sent.close()
        aside = f"{zm_path}.old.{uid}"
        if fs.exists(hp(zm_path)):
            fs.rename(hp(zm_path), hp(aside))
        try:
            fs.rename(hp(zm_stage), hp(zm_path))
        except Exception:  # noqa: BLE001 — resolved via the sentinel below
            pass
        if not fs.exists(hp(f"{zm_path}/_SWAP_{uid}")):
            nested = f"{zm_path}/{stage_name}"
            if fs.exists(hp(f"{nested}/_SWAP_{uid}")):
                fs.delete(hp(nested), True)  # racer's complete manifest stands
            elif fs.exists(hp(zm_stage)):
                fs.delete(hp(zm_stage), True)
        if fs.exists(hp(aside)):
            if fs.exists(hp(zm_path)):
                fs.delete(hp(aside), True)
            else:
                # r15 (ADVICE): our rename-in failed AND no racer's
                # manifest stands — deleting the aside here was the
                # unrecoverable branch (no _zonemap left at all).
                # Restore the aside: stale-but-complete beats absent.
                fs.rename(hp(aside), hp(zm_path))
    # the read-back can catch a CONCURRENT refresher inside its
    # aside→rename-in instant (manifest momentarily absent) — retry
    # briefly; pruned READS are shielded separately by their own
    # exists-check fallback to a full filtered scan
    import time as _time

    for attempt in range(10):
        try:
            n = spark.read.parquet(zm_path).count()
            break
        except Exception:  # noqa: BLE001 — racer mid-swap
            if attempt == 9:
                raise
            _time.sleep(0.05)
    return {"new_files": new_files, "manifest_rows": n}


def _restore_zonemap_aside(spark: SparkSession, path: str) -> bool:
    """Crash recovery for :func:`refresh_zonemap`'s staged swap (r15,
    ADVICE): a refresher killed between its aside rename
    (``_zonemap`` → ``_zonemap.old.{uid}``) and its rename-in leaves no
    live manifest.  If ``_zonemap`` is absent but one or more asides
    exist, rename the lexicographically-last aside back into place
    (every aside is a complete manifest — the swap never stages partial
    state — so any choice is correct; last-uid is just deterministic)
    and delete the rest.  Returns True iff a manifest was restored."""
    zm_path = f"{path}/_zonemap"
    fs, _, jvm = _fs_for(spark, path)
    hp = jvm.org.apache.hadoop.fs.Path
    if fs.exists(hp(zm_path)):
        return False
    asides = sorted(
        st.getPath().toString()
        for st in fs.listStatus(hp(path))
        if st.getPath().getName().startswith("_zonemap.old.")
    )
    if not asides:
        return False
    if not fs.rename(hp(asides[-1]), hp(zm_path)):
        return False
    for a in asides[:-1]:
        fs.delete(hp(a), True)
    return True


def append_zonemap(
    spark: SparkSession, path: str, df: DataFrame, cols: list[str]
) -> dict:
    """Append a batch to a zone-mapped layout: write the new data files
    (plain parquet append — old files untouched) then ``refresh_zonemap``
    scans ONLY the new files into the manifest.  A crash between the two
    steps leaves the appended files pruned-invisible until the next
    refresh (see refresh_zonemap's recovery note)."""
    df.write.mode("append").parquet(path)
    return refresh_zonemap(spark, path, cols)


def _table_suffix(table_path: str, p: str) -> str:
    """A file's identity RELATIVE to its table directory: everything
    after the last ``/<table-dir-name>/`` in the path.  Survives ancestor
    renames (staged publishes) and distinguishes same-named part files
    across partition directories — the two ways absolute paths and bare
    basenames each fail.  A partition directory CAN alias the anchor (the
    snapshot layout's own ``v=N`` dirs are handed here as table paths, a
    ``col=val``-form anchor) — the guarantee rests on ``rfind`` picking
    the occurrence NEAREST the file symmetrically on both the manifest
    and listing sides, so both resolve the same innermost anchor."""
    import os

    anchor = "/" + os.path.basename(os.path.normpath(table_path)) + "/"
    i = p.rfind(anchor)
    return p[i + len(anchor):] if i >= 0 else os.path.basename(p)


def _warn_stale(e: "StaleManifestError") -> None:
    import warnings

    warnings.warn(
        f"pruned scan fell back to a FULL filtered scan: {e}",
        RuntimeWarning,
        stacklevel=3,
    )


class StaleManifestError(RuntimeError):
    """A zonemap/Bloom manifest references files absent from the table's
    current listing — data files were deleted or rewritten OUTSIDE the
    refresh protocol.  Pruned reads must never be silently incomplete
    (the layer's invariant is "stale, never WRONG"), so the scan either
    falls back to a full filtered scan or surfaces this."""


def _current_paths(base: DataFrame, files: list[str], path: str) -> list[str]:
    """Map manifest-recorded file paths onto the table's CURRENT listing.

    Manifests record absolute ``input_file_name()`` paths, and a
    staged-rename publish (the standing ANN index,
    ``ensure_standing_index``) RELOCATES the table after its manifest was
    built — the recorded prefix then dangles into the dead ``.stage.*``
    path (PATH_NOT_FOUND on read).  The table-relative identity of a file
    is everything after the table directory's OWN name, which survives
    any ancestor rename; bare basenames are NOT enough (one task writing
    a ``partitionBy`` layout puts the same part-file name into every
    partition directory).  See :func:`_table_suffix`.  Cost is one
    driver-side file listing, the same planning class as the manifest
    collect.

    Raises :class:`StaleManifestError` when a wanted suffix has NO match
    in the current listing: a rename moves every file identically, so an
    unmatched entry means deletion/rewrite outside the refresh protocol —
    dropping it silently would return incomplete pruned results.  Callers
    catch it and fall back to a full filtered scan (always correct)."""
    wanted = {_table_suffix(path, f) for f in files}
    matched = [f for f in base.inputFiles() if _table_suffix(path, f) in wanted]
    if len({_table_suffix(path, f) for f in matched}) < len(wanted):
        missing = sorted(wanted - {_table_suffix(path, f) for f in matched})
        raise StaleManifestError(
            f"{len(missing)} manifest entr{'y' if len(missing) == 1 else 'ies'} "
            f"dangle at {path} (deleted/rewritten outside the refresh protocol); "
            f"first: {missing[:3]}"
        )
    return matched


# ZONEMAP-MANIFEST PLANNING CACHE (r16, serve-path amortization — the
# sinks-side sibling of queries.similarity's serve-plan cache): the
# manifest collect in scan_pruned/scan_pruned_in is one Spark-job
# round-trip per pruned read.  A SNAPSHOT version dir's manifest is
# immutable (the claim-rename publish only ever creates new v= dirs),
# so read_snapshot_pruned/_pruned_in cache the collected rows keyed by
# (session, version dir) and run the interval test driver-side on
# repeats.  ONLY version dirs go through the cache — plain warehouse
# paths (bucketed tables, streaming dirs) rewrite their manifests in
# place on compaction and always re-read.  `zonemap_cache_forget`
# drops a root's entries (GDPR posture: called alongside the
# queries-level plan_cache_invalidate).
_ZM_CACHE: dict[tuple, list] = {}
_ZM_CACHE_MAX = 32


def _zonemap_rows_cached(spark: SparkSession, vdir: str) -> list | None:
    """Collected `_zonemap` rows for an IMMUTABLE version dir, cached;
    None when the dir carries no manifest (not cached — a later
    aside-restore may bring it back)."""
    key = (spark.sparkContext.applicationId, vdir)
    if key in _ZM_CACHE:
        return _ZM_CACHE[key]
    fs, _, jvm = _fs_for(spark, vdir)
    if not fs.exists(jvm.org.apache.hadoop.fs.Path(f"{vdir}/_zonemap")):
        return None
    rows = [r.asDict() for r in spark.read.parquet(f"{vdir}/_zonemap").collect()]
    while len(_ZM_CACHE) >= _ZM_CACHE_MAX:
        _ZM_CACHE.pop(next(iter(_ZM_CACHE)))
    _ZM_CACHE[key] = rows
    return rows


def zonemap_cache_forget(root: str) -> None:
    """Drop every cached manifest under ``root`` (all versions)."""
    for k in [k for k in _ZM_CACHE if k[1].startswith(root.rstrip("/"))]:
        _ZM_CACHE.pop(k, None)


def scan_pruned(
    spark: SparkSession, path: str, col: str, lo, hi, _manifest_rows=None
) -> DataFrame:
    """Range scan through the zonemap: read ONLY files whose [min, max]
    interval overlaps [lo, hi], then apply the residual filter (identical
    results to a full-scan filter — pruning is I/O elision, never a
    semantic change).

    The manifest collect is planning-side state bounded by the file
    count (what a metastore/manifest read costs in any table format); at
    100 TB with ~128 MiB files that is ~800k manifest rows — still a
    driver-feasible list, and the win is reading only the overlapping
    slice of 100 TB instead of all of it."""
    from pyspark.sql import functions as F

    base = spark.read.parquet(path)
    if _manifest_rows is not None:
        # cached rows (r16): interval test driver-side, no manifest job
        files = [
            r["file"]
            for r in _manifest_rows
            if r[f"max_{col}"] >= lo and r[f"min_{col}"] <= hi
        ]
    else:
        # r15 (ADVICE): a crashed refresher can leave the table with NO
        # live manifest (see _restore_zonemap_aside) — pruning is an
        # optimization, never a requirement, so fall back to a full
        # filtered scan exactly like read_snapshot_pruned_in does
        # rather than raising.
        fs, _, jvm = _fs_for(spark, path)
        if not fs.exists(jvm.org.apache.hadoop.fs.Path(f"{path}/_zonemap")):
            if not _restore_zonemap_aside(spark, path):
                _warn_stale(StaleManifestError(f"no _zonemap manifest under {path}"))
                return base.filter(F.col(col).between(lo, hi))
        zm = spark.read.parquet(f"{path}/_zonemap")
        files = [
            r["file"]
            for r in zm.filter(
                (F.col(f"max_{col}") >= lo) & (F.col(f"min_{col}") <= hi)
            )
            .select("file")
            .collect()
        ]
    try:
        files = _current_paths(base, files, path)  # manifest paths may predate a rename
    except StaleManifestError as e:
        _warn_stale(e)
        return base.filter(F.col(col).between(lo, hi))
    if not files:
        return base.filter(F.lit(False))
    return (
        spark.read.option("basePath", path)  # recover partition cols from nested paths
        .schema(base.schema)
        .parquet(*files)
        .filter(F.col(col).between(lo, hi))
    )


def scan_pruned_in(
    spark: SparkSession, path: str, col: str, values, _manifest_rows=None
) -> DataFrame:
    """IN-set scan through the zonemap (r12): open ONLY files whose
    [min, max] interval contains at least one of ``values``, then apply
    the residual ``isin`` filter — the set-membership sibling of
    :func:`scan_pruned`'s single range.

    The consumer this exists for is PROBE-LIST PUSHDOWN on a layout
    clustered by a key whose interesting predicate is a small set, not a
    range: an IVF index published sorted by list id (``compact_ann_index``)
    is probed with the query batch's ``nprobe`` lists per query — a
    model-sized int set — and this scan turns "read the whole artifact,
    join drops the rest" into "open only the files holding probed lists"
    (what FAISS/Milvus get from contiguous per-list storage).  Results are
    identical to a full-scan ``isin`` — pruning is I/O elision, never a
    semantic change.

    ``values`` must be planning-sized (probe lists, bucket ids — the same
    contract as the manifest collect): the overlap test is built as one
    OR-of-intervals expression over the manifest, so thousands of values
    belong in a Bloom manifest instead (:func:`scan_bloom_pruned`)."""
    vals = sorted(set(values))
    base = spark.read.parquet(path)
    if not vals:
        return base.filter(F.lit(False))
    if _manifest_rows is not None:
        # cached rows (r16): membership-overlap test driver-side over
        # model-sized (files × probe-set) — no manifest job
        files = [
            r["file"]
            for r in _manifest_rows
            if any(r[f"min_{col}"] <= v <= r[f"max_{col}"] for v in vals)
        ]
    else:
        # r15 (ADVICE): same missing-manifest fallback as scan_pruned —
        # a crashed refresher must degrade pruned reads to full scans,
        # not break them.
        fs, _, jvm = _fs_for(spark, path)
        if not fs.exists(jvm.org.apache.hadoop.fs.Path(f"{path}/_zonemap")):
            if not _restore_zonemap_aside(spark, path):
                _warn_stale(StaleManifestError(f"no _zonemap manifest under {path}"))
                return base.filter(F.col(col).isin(vals))
        zm = spark.read.parquet(f"{path}/_zonemap")
        cond = None
        for v in vals:
            c = (F.col(f"min_{col}") <= F.lit(v)) & (F.col(f"max_{col}") >= F.lit(v))
            cond = c if cond is None else (cond | c)
        files = [r["file"] for r in zm.filter(cond).select("file").collect()]
    try:
        files = _current_paths(base, files, path)  # manifest paths may predate a rename
    except StaleManifestError as e:
        _warn_stale(e)
        return base.filter(F.col(col).isin(vals))
    if not files:
        return base.filter(F.lit(False))
    return (
        spark.read.option("basePath", path)
        .schema(base.schema)
        .parquet(*files)
        .filter(F.col(col).isin(vals))
    )


def read_snapshot_pruned_in(
    spark: SparkSession, root: str, col: str, values, version: int | None = None
) -> DataFrame:
    """IN-set scan of a snapshot-versioned table through its committed
    zone-map manifest — :func:`read_snapshot_pruned`'s set-membership
    sibling (see :func:`scan_pruned_in`).  Falls back to a plain
    ``isin``-filtered read when the version carries no manifest (pruning
    is an optimization, never a requirement — an artifact compacted
    before the layout carried zonemaps still serves correctly)."""
    if version is None:
        version = _read_latest_version(spark, root)
    vdir = f"{root}/v={version}"
    rows = _zonemap_rows_cached(spark, vdir)  # immutable version dir
    if rows is None:
        vals = sorted(set(values))
        return spark.read.parquet(vdir).filter(
            F.col(col).isin(vals) if vals else F.lit(False)
        )
    return scan_pruned_in(spark, vdir, col, values, _manifest_rows=rows)


# --- late r10: file-level Bloom-filter manifests ---------------------------
# The equality-pruning sibling of the zone-map layer above.  Zone maps
# (min/max) prune RANGE predicates but are useless for point lookups on a
# column the layout is NOT clustered by — every file's [min, max] spans the
# whole domain, so nothing prunes.  A per-file Bloom filter (Bloom 1970;
# the file-skipping index Parquet, Delta and Iceberg all keep for exactly
# this case) answers "might this file contain key v?" with no false
# negatives, so a point lookup opens only the files whose filter fires
# (expected 1 + fpp·files instead of all of them).
#
# Representation: NOT a driver-side bitmap.  Each column's filter is a
# distributed table of sparse 64-bit words — (file, word_idx, word) rows
# built with one explode(k positions) + groupBy(file, word_idx) BIT_OR —
# and a probe is a broadcast join of the k probed (word_idx, mask) pairs
# against that table: a file is a candidate iff all k bits are set.  Both
# build and probe are pure DataFrame jobs, so the manifest scales with the
# table (100 TB ⇒ ~800k files ⇒ the words table is a few GB, still a
# planning-side object) and the probe never collects more than the
# candidate file list.  Hashing is Spark's own xxhash64 ON BOTH SIDES
# (probe positions are computed by the JVM through a 1-row select), so
# build and probe can never disagree across versions or platforms.

_BLOOM_SEED = "msgdp_bloom_v1"


def _bloom_positions(col, bits: int, k: int):
    """k double-hashed bit positions (Kirsch-Mitzenmacher: h1 + i·h2) as
    Spark Column expressions — shared by build (per row) and probe (per
    literal).  Both hashes reduce mod bits BEFORE the multiply
    ((h1 + i·h2) mod m ≡ (h1 mod m + i·(h2 mod m)) mod m), keeping the
    arithmetic far from long overflow — ANSI mode (Spark 4 default)
    raises on wrap instead of wrapping."""
    from pyspark.sql import functions as F

    b = F.lit(int(bits)).cast("long")
    h1 = F.pmod(F.xxhash64(col), b)
    h2 = F.pmod(F.xxhash64(col, F.lit(_BLOOM_SEED)), b)
    return [F.pmod(h1 + F.lit(i).cast("long") * h2, b) for i in range(k)]


def _bloom_words(df: DataFrame, c: str, bits: int, k: int) -> DataFrame:
    """(file, word_idx, word) sparse-bitmap rows for one column."""
    from pyspark.sql import functions as F

    pos = F.explode(F.array(*_bloom_positions(F.col(c), bits, k))).alias("pos")
    return (
        df.select(F.input_file_name().alias("file"), pos)
        .select(
            "file",
            F.floor(F.col("pos") / 64).cast("long").alias("word_idx"),
            # PySpark's shiftleft wrapper wants a literal int for numBits,
            # so the variable shift goes through expr
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(pos, 64) AS INT))").alias(
                "bit"
            ),
        )
        .groupBy("file", "word_idx")
        .agg(F.bit_or("bit").alias("word"))
    )


def build_bloom_manifest(
    spark: SparkSession, path: str, cols: list[str], bits: int = 1 << 20, k: int = 4
) -> dict:
    """Build per-file Bloom manifests for ``cols`` under
    ``path/_bloom_<col>/`` (underscore prefix hides them from Spark's
    file index, like ``_zonemap``).  ``bits`` is the filter width PER
    FILE (default 1 Mi bits ≈ 128 KiB dense; the sparse word table is
    smaller whenever a file holds < bits/10 keys).  Size bits ≥ 10× the
    per-file distinct-key count for ~1% false positives at k=4.

    Returns {col: word_row_count}."""
    df = spark.read.parquet(path)
    out = {}
    fs, _, jvm = _fs_for(spark, path)
    hp = jvm.org.apache.hadoop.fs.Path
    for c in cols:
        root = f"{path}/_bloom_{c}"
        # a REBUILD retires refresh deltas (r14): stale words_delta_*
        # dirs describe the pre-rebuild file set — leaving them would
        # resurrect retired files as candidates (loud StaleManifestError
        # fallback, never wrong, but pointless scans)
        if fs.exists(hp(root)):
            for st in fs.listStatus(hp(root)):
                if st.getPath().getName().startswith("words_delta_"):
                    fs.delete(st.getPath(), True)
        _bloom_words(df, c, bits, k).write.mode("overwrite").parquet(f"{root}/words")
        meta = spark.createDataFrame([(int(bits), int(k))], "bits long, k int")
        meta.coalesce(1).write.mode("overwrite").parquet(f"{root}/meta")
        out[c] = _bloom_words_df(spark, root).count()
    return out


def _bloom_words_df(spark: SparkSession, root: str) -> DataFrame:
    """The manifest's FULL word table: the base ``words`` dir plus every
    ``words_delta_*`` refresh dir (r14 — refreshers write UNIQUE delta
    dirs because two concurrent Spark append jobs into one directory
    collide on the shared ``_temporary`` committer staging; the race
    lane's bloom mode caught exactly that).  Duplicate (file, word_idx)
    rows across dirs stay probe-safe — any row with the probed bit set
    counts."""
    fs, p, jvm = _fs_for(spark, root)
    paths = [
        st.getPath().toString()
        for st in fs.listStatus(p)
        if st.isDirectory() and (
            st.getPath().getName() == "words"
            or st.getPath().getName().startswith("words_delta_")
        )
    ]
    return spark.read.parquet(*paths)


def refresh_bloom_manifest(spark: SparkSession, path: str, col: str) -> dict:
    """O(delta) Bloom maintenance: scan ONLY data files the manifest does
    not know yet (Hadoop-FS listing diffed against the manifest's file
    names) and APPEND their word rows — the manifest is append-only
    (duplicate (file, word_idx) rows are probe-safe), so unlike the
    zonemap no rewrite happens.  Each refresh writes its delta into a
    UNIQUE ``words_delta_{uid}`` dir (r14): two concurrent Spark append
    jobs into one directory collide on the shared ``_temporary``
    committer staging — with unique dirs, racing refreshers at worst
    double-append the same fresh words, which probes tolerate.
    Crash semantics mirror ``refresh_zonemap``: files appended before a
    crash are pruned-invisible until the next refresh, never wrong.

    File identity is the FULL normalized path (scheme stripped, slashes
    collapsed), never the basename — partitioned layouts legitimately
    repeat basenames (``part-00000`` under every partition dir), and the
    listing recurses so files in nested partition subdirectories join
    the manifest too."""
    from pyspark.sql import functions as F  # noqa: F401

    root = f"{path}/_bloom_{col}"
    meta = spark.read.parquet(f"{root}/meta").first()
    words = _bloom_words_df(spark, root)
    known = {
        _normalize_file_uri(r["file"])
        for r in words.select("file").distinct().collect()
    }
    fs, p, _ = _fs_for(spark, path)
    base_n = _normalize_file_uri(fs.makeQualified(p).toString()).rstrip("/")
    new_files = []
    it = fs.listFiles(p, True)  # recursive: nested partition dirs included
    while it.hasNext():
        st = it.next()
        full = st.getPath().toString()
        full_n = _normalize_file_uri(full)
        # skip files under hidden dirs (_bloom_*, _zonemap, .staging, …)
        rel = full_n[len(base_n):].lstrip("/")
        if any(seg.startswith(("_", ".")) for seg in rel.split("/")):
            continue
        if full_n not in known:
            new_files.append(full)
    if new_files:
        import uuid

        fresh = spark.read.schema(spark.read.parquet(path).schema).parquet(*new_files)
        _bloom_words(fresh, col, meta["bits"], meta["k"]).write.mode(
            "overwrite"
        ).parquet(f"{root}/words_delta_{uuid.uuid4().hex[:8]}")
    return {"new_files": new_files}


def bloom_candidate_files(spark: SparkSession, path: str, col: str, value) -> list[str]:
    """Files that MIGHT contain ``col = value`` per the Bloom manifest
    (no false negatives; false-positive files cost one wasted open).
    Probe = broadcast-join k (word_idx, mask) pairs against the words
    table, keep files where all k bits are set."""
    from pyspark.sql import functions as F

    root = f"{path}/_bloom_{col}"
    meta = spark.read.parquet(f"{root}/meta").first()
    bits, k = meta["bits"], meta["k"]
    # compute probe positions through the JVM so the hash is byte-identical
    # to the build side — including the TYPE: xxhash64 of an int literal
    # differs from xxhash64 of the same value as bigint, so the literal
    # must cast to the column's actual type first
    col_type = spark.read.parquet(path).schema[col].dataType
    probe_lit = F.lit(value).cast(col_type)
    row = (
        spark.range(1)
        .select(
            *[
                p.alias(f"p{i}")
                for i, p in enumerate(_bloom_positions(probe_lit, bits, k))
            ]
        )
        .first()
    )
    probes = []
    for i in range(k):
        pos = row[f"p{i}"]
        mask = 1 << (pos % 64)
        if mask >= 1 << 63:  # Java long wraps at 2^63
            mask -= 1 << 64
        probes.append((i, pos // 64, mask))
    probe_df = spark.createDataFrame(probes, "pos_idx int, word_idx long, mask long")
    words = _bloom_words_df(spark, root)
    cand = (
        words.join(F.broadcast(probe_df), "word_idx")
        .filter(F.col("word").bitwiseAND(F.col("mask")) != 0)
        .groupBy("file")
        .agg(F.countDistinct("pos_idx").alias("hits"))
        .filter(F.col("hits") == k)
        .select("file")
    )
    return [r["file"] for r in cand.collect()]


def scan_bloom_pruned(spark: SparkSession, path: str, col: str, value) -> DataFrame:
    """Point lookup through the Bloom manifest: open ONLY candidate
    files, then apply the residual equality filter — identical results
    to a full-scan filter (pruning is I/O elision, never semantics; a
    false positive just reads one extra file whose residual filter drops
    everything)."""
    from pyspark.sql import functions as F

    base = spark.read.parquet(path)
    # r15 (zonemap-symmetry): a table without a committed Bloom manifest
    # for this column must degrade to a full filtered scan, not raise —
    # pruning is an optimization, never a requirement (matches
    # scan_pruned/scan_pruned_in and read_snapshot_bloom_pruned).
    fs, _, jvm = _fs_for(spark, path)
    if not fs.exists(jvm.org.apache.hadoop.fs.Path(f"{path}/_bloom_{col}/meta")):
        _warn_stale(
            StaleManifestError(f"no _bloom_{col} manifest under {path}")
        )
        return base.filter(F.col(col) == value)
    files = bloom_candidate_files(spark, path, col, value)
    try:
        files = _current_paths(base, files, path)  # manifest paths may predate a rename
    except StaleManifestError as e:
        _warn_stale(e)
        return base.filter(F.col(col) == value)
    if not files:
        return base.filter(F.lit(False))
    return (
        spark.read.option("basePath", path)  # recover partition cols from nested paths
        .schema(base.schema)
        .parquet(*files)
        .filter(F.col(col) == value)
    )
