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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import sinks
from ..operators import flatten, project
from . import load, register


@register(
    "graph_flatten_struct",
    oracle="""
    SELECT o_orderkey,
           o_orderstatus AS status,
           o_orderpriority AS priority,
           CAST(length(o_orderpriority) AS BIGINT) AS priority_len
    FROM orders
    """,
)
def graph_flatten_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1/T3 — struct-field lift (`Invoke…ps1:214-221` health-state flatten,
    `Export…ps1:224-232` actor flatten): nest two columns into a struct, then
    flatten with casts through ``operators.flatten.flatten_struct``.
    Catalyst collapses the nest+lift to a plain projection — zero overhead."""
    o = load(spark, sf_dir, "orders").withColumn(
        "meta", F.struct(F.col("o_orderstatus").alias("st"), F.col("o_orderpriority").alias("pr"))
    )
    flat = flatten.flatten_struct(
        o,
        "meta",
        {"status": ("st", None), "priority": ("pr", None)},
    )
    return flat.select(
        "o_orderkey",
        "status",
        "priority",
        F.length("priority").cast("long").alias("priority_len"),
    )


@register(
    "graph_argmax_lines",
    oracle="""
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
    """,
)
def graph_argmax_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2 — per-row argmax over a nested array (`usersLoggedOn | Sort … |
    Select -first 1`, `Invoke…ps1:223-229`): nest lineitems per order into an
    array of structs, then take the latest element array-natively
    (``array_sort`` + comparator + ``element_at`` — a narrow op, no second
    shuffle after the build)."""
    li = load(spark, sf_dir, "lineitem")
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
    )
    return top.select(
        "l_orderkey",
        "latest_partkey",
        "latest_qty",
        F.date_format("latest_ship", "yyyy-MM-dd").alias("latest_ship_day"),
    )


@register(
    "graph_array_first",
    oracle="""
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
    """,
)
def graph_array_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4 — array member projection to scalar (``$resources.displayName`` →
    varchar, `Export…ps1:234-239`): engine decision = first element.
    ``sort_array`` on (linenumber, partkey) structs makes 'first' well-defined
    despite collect_list's nondeterministic order."""
    li = load(spark, sf_dir, "lineitem")
    nested = li.groupBy("l_orderkey").agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("l_linenumber").alias("line"), F.col("l_partkey").alias("part")))
        ).alias("resources"),
        F.count("*").alias("n_lines"),
    )
    first = flatten.array_first_field(nested, "resources", "part", "first_partkey")
    return first.select("l_orderkey", "first_partkey", "n_lines")


@register(
    "graph_conform_schema",
    oracle="""
    SELECT c_custkey AS custkey,
           c_name AS name,
           CAST(c_acctbal AS DOUBLE) AS acctbal,
           CAST(NULL AS VARCHAR) AS loyalty_tier,
           CAST(c_nationkey AS BIGINT) AS nationkey
    FROM customer
    """,
)
def graph_conform_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5/T6/T7 — declared-schema projection (`Invoke…ps1:255-307`): extra
    source columns silently dropped (c_mktsegment), missing declared column
    (loyalty_tier) materialized as typed NULL, int32 nationkey cast to long.
    Catalyst prunes the dropped column out of the parquet scan."""
    target = T.StructType(
        [
            T.StructField("custkey", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("acctbal", T.DoubleType()),
            T.StructField("loyalty_tier", T.StringType()),
            T.StructField("nationkey", T.LongType()),
        ]
    )
    c = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_nationkey").alias("nationkey"),
        "c_mktsegment",  # extra column — conform must drop it
    )
    return project.conform(c, target)


@register(
    "graph_exclude_columns",
    oracle="""
    SELECT s_suppkey, s_name FROM supplier
    """,
)
def graph_exclude_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 — client-side column exclusion (`Select-Object -ExcludeProperty`,
    `Invoke…ps1:233-238`).  Column pruning reaches the scan: ReadSchema lists
    only the two surviving columns."""
    return project.exclude(load(spark, sf_dir, "supplier"), "s_nationkey", "s_acctbal")


@register(
    "graph_stamp_and_key",
    oracle="""
    SELECT n_nationkey, n_name,
           CAST(row_number() OVER (ORDER BY n_nationkey) AS BIGINT) AS ClusterID,
           strftime(TIMESTAMP '2024-06-01 00:00:00', '%Y-%m-%d %H:%M:%S') AS timeGenerated_s
    FROM nation
    """,
)
def graph_stamp_and_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4+L5 — load-time audit stamp (GETDATE() → timeGenerated,
    `Prepare-SQLDatabase.sql:144`) with a fixed test instant, and the
    IDENTITY surrogate key (`:8`) as contiguous row_number over the business
    key — the single-partition window is acceptable only because this is the
    25-row dimension path, never the fact path (see sinks.with_surrogate_key)."""
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    stamped = sinks.stamp(n, at=dt.datetime(2024, 6, 1))
    w = Window.orderBy("n_nationkey")
    return stamped.select(
        "n_nationkey",
        "n_name",
        F.row_number().over(w).cast("long").alias("ClusterID"),
        F.date_format(F.col(sinks.LOAD_STAMP), "yyyy-MM-dd HH:mm:ss").alias("timeGenerated_s"),
    )


@register(
    "graph_retention_filter",
    oracle="""
    SELECT event_id, user_id, event_type
    FROM events
    WHERE date_diff('day', CAST(ts AS DATE), DATE '2024-01-31') <= 10
    """,
)
def graph_retention_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3 — retention-window predicate (`DATEDIFF(day, timeGenerated,
    GetDate()) > @MaxInventoryAge`, `Prepare-SQLDatabase.sql:110`) with a
    fixed 'now' for determinism; at the sink this becomes partition drops
    (sinks.expire_old_partitions), not a row filter."""
    from . import load_events

    ev = load_events(spark, sf_dir)
    keep = F.datediff(F.lit("2024-01-31"), F.to_date("ts")) <= 10
    return ev.filter(keep).select("event_id", "user_id", "event_type")


@register(
    "graph_explode_relational",
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
