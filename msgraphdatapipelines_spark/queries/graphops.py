"""Reference pipeline operators (SURVEY.md §2.2-2.4) as oracle-checked queries.

The driver's oracle runs only over the ten flat parquet tables, so each
nested-data operator is exercised as a *nest → operate → flatten* round trip:
build the Graph-shaped nested value (struct / array-of-struct) from flat rows
inside the query, apply the engine operator, and the oracle expresses the
flat-relational equivalent.  pytest adds golden-value checks on truly
Graph-shaped JSON fixtures (tests/test_graph_semantics.py).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import sinks
from ..operators import flatten, project
from . import load, load_spread, register


@register(
    "graph_argmax_lines",
    oracle="""
    WITH latest AS (
        SELECT l_orderkey,
               l_partkey AS latest_partkey,
               l_quantity AS latest_qty,
               strftime(l_shipdate, '%Y-%m-%d') AS latest_ship_day
        FROM (
            SELECT *, row_number() OVER (PARTITION BY l_orderkey
                                         ORDER BY l_shipdate DESC, l_linenumber DESC,
                                                  l_partkey DESC) AS rn
            FROM lineitem
        ) t
        WHERE rn = 1
    ),
    firsts AS (
        SELECT l_orderkey,
               l_partkey AS first_partkey,
               CAST(n_lines AS BIGINT) AS n_lines
        FROM (
            SELECT l_orderkey, l_partkey,
                   row_number() OVER (PARTITION BY l_orderkey
                                      ORDER BY l_linenumber, l_partkey) AS rn,
                   count(*) OVER (PARTITION BY l_orderkey) AS n_lines
            FROM lineitem
        ) t
        WHERE rn = 1
    )
    SELECT latest.l_orderkey, latest_partkey, latest_qty, latest_ship_day,
           first_partkey, n_lines
    FROM latest JOIN firsts ON latest.l_orderkey = firsts.l_orderkey
    """,
)
def graph_argmax_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2 + T4 — per-row argmax AND first-element projection over one nested
    array (`usersLoggedOn | Sort … | Select -first 1`, `Invoke…ps1:223-229`;
    ``$resources.displayName`` → scalar, `Export…ps1:234-239`): nest
    lineitems per order into an array of structs once, then extract the
    latest element (``array_sort`` + comparator + ``element_at``) and the
    first element + array size — all narrow ops sharing the single nested
    build, no second shuffle.  Consolidated from two queries (r2)."""
    # r16 OPT: scan-parallelism floor — the single-row-group fixture pins
    # the struct build + partial collect_list to one task (interleaved A/B
    # median 1.73 -> 1.46 s at sf0.1; no-op at real input sizes)
    li = load_spread(spark, sf_dir, "lineitem", "l_orderkey")
    nested = li.groupBy("l_orderkey").agg(
        F.collect_list(
            F.struct(
                F.col("l_shipdate").alias("ship"),
                F.col("l_linenumber").alias("line"),
                F.col("l_partkey").alias("part"),
                F.col("l_quantity").alias("qty"),
            )
        ).alias("lines")
    )
    # order field = (ship, line, part): unique per order ⇒ deterministic argmax
    nested = nested.withColumn(
        "lines",
        F.transform(
            "lines",
            lambda s: F.struct(
                F.struct(s["ship"], s["line"], s["part"]).alias("ord"),
                F.struct(s["line"], s["part"]).alias("pos"),
                s["part"].alias("part"),
                s["qty"].alias("qty"),
                s["ship"].alias("ship"),
            ),
        ),
    )
    top = flatten.argmax_in_array(
        nested,
        "lines",
        "ord",
        {
            "latest_partkey": ("part", None),
            "latest_qty": ("qty", None),
            "latest_ship": ("ship", None),
        },
        drop_source=False,
    )
    # T4 first-element: sort the same array ascending by (line, part)
    first_sorted = F.array_sort(
        F.col("lines"),
        lambda l, r: F.when(l["pos"] < r["pos"], F.lit(-1))
        .when(l["pos"] > r["pos"], F.lit(1))
        .otherwise(F.lit(0)),
    )
    top = top.withColumn(
        "first_partkey", F.try_element_at(first_sorted, F.lit(1)).getField("part")
    ).withColumn("n_lines", F.size("lines").cast("long"))
    return top.select(
        "l_orderkey",
        "latest_partkey",
        "latest_qty",
        F.date_format("latest_ship", "yyyy-MM-dd").alias("latest_ship_day"),
        "first_partkey",
        "n_lines",
    )


@register(
    "graph_conform_schema",
    oracle="""
    SELECT c_custkey AS custkey,
           c_name AS name,
           CAST(c_acctbal AS DOUBLE) AS acctbal,
           CAST(NULL AS VARCHAR) AS loyalty_tier,
           CAST(c_nationkey AS BIGINT) AS nationkey,
           c_mktsegment AS segment,
           CAST(length(c_mktsegment) AS BIGINT) AS segment_len,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other,
           CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal_nonneg,
           coalesce(CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END, 0.0) AS bal_filled,
           (c_acctbal IS NULL) AS bal_is_null
    FROM customer
    """,
)
def graph_conform_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1/T3 + P4 + P5/T6/T7 — the reference's full transform→load shape in
    one plan (consolidated r2): nest two columns into a struct and flatten it
    back with ``operators.flatten.flatten_struct`` (the health-state/actor
    lift, `Invoke…ps1:214-221`, `Export…ps1:224-232`), NULL-normalization
    battery (T7 generalized: nullif/coalesce/is-null), client-side column
    exclusion (`Select-Object -ExcludeProperty`, `Invoke…ps1:233-238`), then
    declared-schema projection (`Invoke…ps1:255-307`): extra columns silently
    dropped, missing declared column (loyalty_tier) materialized as typed
    NULL, int32 nationkey cast to long.  Catalyst collapses nest+lift to a
    plain projection and prunes dropped columns out of the parquet scan."""
    target = T.StructType(
        [
            T.StructField("custkey", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("acctbal", T.DoubleType()),
            T.StructField("loyalty_tier", T.StringType()),
            T.StructField("nationkey", T.LongType()),
            T.StructField("segment", T.StringType()),
            T.StructField("segment_len", T.LongType()),
            T.StructField("seg_or_other", T.StringType()),
            T.StructField("bal_nonneg", T.DoubleType()),
            T.StructField("bal_filled", T.DoubleType()),
            T.StructField("bal_is_null", T.BooleanType()),
        ]
    )
    c = load(spark, sf_dir, "customer").withColumn(
        "profile",
        F.struct(F.col("c_mktsegment").alias("seg"), F.col("c_acctbal").alias("bal")),
    )
    # T1: struct-field lift with casts
    flat = flatten.flatten_struct(
        c, "profile", {"segment": ("seg", None), "segment_len_raw": ("seg", None)}
    ).withColumn("segment_len", F.length("segment_len_raw").cast("long"))
    # T7 battery
    bal_nonneg = F.when(F.col("c_acctbal") < 0, F.lit(None)).otherwise(F.col("c_acctbal"))
    flat = (
        flat.withColumn(
            "seg_or_other",
            F.coalesce(F.nullif(F.col("segment"), F.lit("BUILDING")), F.lit("OTHER")),
        )
        .withColumn("bal_nonneg", bal_nonneg)
        .withColumn("bal_filled", F.coalesce(bal_nonneg, F.lit(0.0)))
        .withColumn("bal_is_null", F.col("c_acctbal").isNull())
    )
    # P4: explicit exclusion of the nested source + an intermediate
    flat = project.exclude(flat, "profile", "segment_len_raw")
    # P5/T6: declared projection — renames, casts, typed-NULL loyalty_tier,
    # drops whatever the exclusion left behind (c_mktsegment itself)
    return project.conform(
        flat.select(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            F.col("c_acctbal").alias("acctbal"),
            F.col("c_nationkey").alias("nationkey"),
            "segment",
            "segment_len",
            "seg_or_other",
            "bal_nonneg",
            "bal_filled",
            "bal_is_null",
            "c_mktsegment",  # extra column — conform must drop it
        ),
        target,
    )


@register(
    "graph_stamp_and_key",
    oracle="""
    SELECT event_id, user_id, event_type,
           CAST(row_number() OVER (ORDER BY event_id) AS BIGINT) AS ClusterID,
           strftime(TIMESTAMP '2024-06-01 00:00:00', '%Y-%m-%d %H:%M:%S') AS timeGenerated_s
    FROM events
    WHERE date_diff('day', CAST(ts AS DATE), DATE '2024-01-31') <= 10
    """,
)
def graph_stamp_and_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3 + L4 + L5 — the reference's load-side battery in one plan
    (consolidated r2): retention-window predicate (`DATEDIFF(day,
    timeGenerated, GetDate()) > @MaxInventoryAge`,
    `Prepare-SQLDatabase.sql:110`) with a fixed 'now' for determinism,
    load-time audit stamp (GETDATE() → timeGenerated, `:144`) with a fixed
    test instant, and the IDENTITY surrogate key (`:8`) as contiguous
    row_number over the business key — assigned with the scale-safe
    two-phase form (sinks.with_surrogate_key: quantile buckets of the
    ordering key → per-bucket counts → offset + row_number within bucket).
    No global single-partition window anywhere in the plan (pinned in
    tests/test_plans.py::test_stamp_and_key_no_single_partition_exchange);
    at the sink, retention becomes partition drops
    (sinks.expire_old_partitions), not a row filter."""
    from . import load_events

    ev = load_events(spark, sf_dir)
    keep = F.datediff(F.lit("2024-01-31"), F.to_date("ts")) <= 10
    retained = ev.filter(keep).select("event_id", "user_id", "event_type")
    stamped = sinks.stamp(retained, at=dt.datetime(2024, 6, 1))
    keyed = sinks.with_surrogate_key(
        stamped, name="ClusterID", contiguous=True, order_by="event_id"
    )
    return keyed.select(
        "event_id",
        "user_id",
        "event_type",
        "ClusterID",
        F.date_format(F.col(sinks.LOAD_STAMP), "yyyy-MM-dd HH:mm:ss").alias("timeGenerated_s"),
    )


@register(
    "graph_explode_relational",
    demoted=True,  # r11 rotation: explode graded via array_set_ops_per_order; graph family keeps 4 graded rows
    oracle="""
    SELECT l_orderkey, l_partkey AS part, l_quantity AS qty
    FROM lineitem
    WHERE l_quantity >= 40
    """,
)
def graph_explode_relational(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explode/flatten (§2.5) — inverse of T2's nesting: build the per-order
    array, explode it back to rows, filter on element fields.  Round-trips
    collect_list ∘ explode = identity (modulo order)."""
    li = load(spark, sf_dir, "lineitem")
    nested = li.groupBy("l_orderkey").agg(
        F.collect_list(F.struct(F.col("l_partkey").alias("part"), F.col("l_quantity").alias("qty"))).alias(
            "items"
        )
    )
    exploded = flatten.explode_array(nested, "items", keep=["l_orderkey"])
    return exploded.select(
        "l_orderkey", F.col("item.part").alias("part"), F.col("item.qty").alias("qty")
    ).filter(F.col("qty") >= 40)


@register(
    "upsert_snapshot_orders",
    demoted=True,  # delta_sync_orders supersets this (upsert = delta w/o deletes)
    oracle="""
    WITH base AS (SELECT o_orderkey, o_orderstatus,
                         CAST(o_totalprice AS DECIMAL(18,2)) AS price
                  FROM orders),
    upd AS (SELECT o_orderkey, 'U' AS o_orderstatus, price * 2 AS price
            FROM base WHERE o_orderkey % 10 = 0)
    SELECT o_orderkey, o_orderstatus, CAST(price AS DOUBLE) AS price FROM upd
    UNION ALL
    SELECT b.o_orderkey, b.o_orderstatus, CAST(b.price AS DOUBLE) AS price
    FROM base b WHERE b.o_orderkey NOT IN (SELECT o_orderkey FROM upd)
    """,
)
def upsert_snapshot_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed SCD1 refresh (r4 driver row; r5: demoted to the pytest oracle
    gate — delta_sync_orders drives the same anti-join+union shape PLUS
    tombstone deletes, so the driver slot goes to the superset) —
    the reference's DELETE+INSERT full refresh generalized to a business-key
    match (`Prepare-SQLDatabase.sql:104-178`): updates ∪ (existing ⟕anti
    updates), via sinks.upsert_snapshot.  One key-shuffle anti-join; with
    the warehouse bucketed on the key (L6) the existing side's shuffle
    disappears.  A deterministic 10% of orders arrives \"updated\" (status
    U, price doubled in exact decimal); matched keys replace, history
    survives."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    upd = o.filter(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        F.lit("U").alias("o_orderstatus"),
        (F.col("price") * 2).alias("price"),
    )
    merged = sinks.upsert_snapshot(o, upd, ["o_orderkey"])
    return merged.select(
        "o_orderkey", "o_orderstatus", F.col("price").cast("double").alias("price")
    )


@register(
    "delta_sync_orders",
    oracle="""
    WITH base AS (SELECT o_orderkey, o_orderstatus,
                         CAST(o_totalprice AS DECIMAL(18,2)) AS price
                  FROM orders),
    upd AS (SELECT o_orderkey, 'U' AS o_orderstatus, price * 2 AS price
            FROM base WHERE o_orderkey % 10 = 0 AND o_orderkey % 13 <> 0),
    ins AS (SELECT -o_orderkey AS o_orderkey, 'N' AS o_orderstatus, price
            FROM base WHERE o_orderkey % 17 = 0),
    del AS (SELECT o_orderkey FROM base WHERE o_orderkey % 13 = 0),
    touched AS (SELECT o_orderkey FROM upd
                UNION ALL SELECT o_orderkey FROM ins
                UNION ALL SELECT o_orderkey FROM del)
    SELECT o_orderkey, o_orderstatus, CAST(price AS DOUBLE) AS price FROM upd
    UNION ALL
    SELECT o_orderkey, o_orderstatus, CAST(price AS DOUBLE) AS price FROM ins
    UNION ALL
    SELECT b.o_orderkey, b.o_orderstatus, CAST(b.price AS DOUBLE) AS price
    FROM base b WHERE b.o_orderkey NOT IN (SELECT o_orderkey FROM touched)
    """,
)
def delta_sync_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-query incremental sync (r4 VERDICT item 2): apply one Graph
    delta batch — updates, NEW entities, and ``@removed`` tombstones — over
    a keyed snapshot via ``sinks.apply_delta``.  The reference re-extracts
    the WHOLE collection every run (`Invoke…ps1:170-194` snapshot loop);
    delta sync is that loop with change tracking: cost follows the change
    set, not the collection.  Plan: ONE anti-join on the key (tombstones
    ride the same join the upserts need — a delete costs only its key) +
    union; the same shape as upsert_snapshot.  Batch composition is
    deterministic from orders: 10%-ers update (status U, price ×2),
    17%-ers insert as new negative keys, 13%-ers delete (update∩delete
    resolved to delete, disjoint by construction).  The REST side of the
    story — @odata.deltaLink walk, resume-token persistence, tombstone
    parsing — is pytest-covered on fixture pages
    (tests/test_rest_source.py::test_delta_*)."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    upd = o.filter((F.col("o_orderkey") % 10 == 0) & (F.col("o_orderkey") % 13 != 0)).select(
        "o_orderkey",
        F.lit("U").alias("o_orderstatus"),
        (F.col("price") * 2).alias("price"),
        F.lit(False).alias("_removed"),
    )
    ins = o.filter(F.col("o_orderkey") % 17 == 0).select(
        (-F.col("o_orderkey")).alias("o_orderkey"),
        F.lit("N").alias("o_orderstatus"),
        F.col("price"),
        F.lit(False).alias("_removed"),
    )
    tomb = o.filter(F.col("o_orderkey") % 13 == 0).select(
        "o_orderkey",
        F.lit(None).cast("string").alias("o_orderstatus"),  # Graph tombstones carry only id
        F.lit(None).cast("decimal(19,2)").alias("price"),
        F.lit(True).alias("_removed"),
    )
    delta = upd.unionByName(ins).unionByName(tomb)
    merged = sinks.apply_delta(o, delta, ["o_orderkey"])
    return merged.select(
        "o_orderkey", "o_orderstatus", F.col("price").cast("double").alias("price")
    )
