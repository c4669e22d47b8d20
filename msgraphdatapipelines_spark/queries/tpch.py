"""TPC-H-style multi-join analytics — the classic plans that exercise
Catalyst's join reordering, broadcast selection, and partial aggregation
on the star schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load, register


@register(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_shipdate  > TIMESTAMP '1996-01-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dimension filter → fact join → grouped
    revenue → global top-10.  Filters sit below the joins (Catalyst pushes
    them through), and the final top-k is TakeOrderedAndProject."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-01-01")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1996-01-01")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,4)")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(price * (F.lit(1) - disc)).cast("double").alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'AMERICA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1999-01-01'
    GROUP BY n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: six-way join with the customer-supplier nation
    correlation — the plan Catalyst must order well.  nation/region/supplier
    broadcast (small at any SF); the fact chain shuffles once per equi-key."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1999-01-01")
    )
    li = load(spark, sf_dir, "lineitem")
    s = F.broadcast(load(spark, sf_dir, "supplier"))
    n = F.broadcast(load(spark, sf_dir, "nation"))
    r = F.broadcast(load(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA"))
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,4)")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(price * (F.lit(1) - disc)).cast("double").alias("revenue"))
    )


@register(
    "posexplode_tokens",
    demoted=True,  # posexplode driver-graded via chunk_documents
    oracle="""
    WITH words AS (
        SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS ws
        FROM documents WHERE doc_id < 50
    )
    SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, ws[i] AS token
    FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS i FROM words)
    """,
)
def posexplode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordinal explode (posexplode) — element + 0-based position, the
    lateral-view building block for order-sensitive flattening."""
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    ws = F.filter(F.split("text", " "), lambda w: w != "")
    return docs.select(
        "doc_id", F.posexplode(ws).alias("pos", "token")
    ).select("doc_id", F.col("pos").cast("long").alias("pos"), "token")


@register(
    "q10_returned_items",
    demoted=True,  # multi-join family driver-graded via q3/q5
    oracle="""
    SELECT c_custkey, c_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue,
           round(c_acctbal, 2) AS c_acctbal,
           n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (r8): returned-item revenue ranking — a one-year
    order window, R-flag lineitems, customer×nation enrichment, grouped
    revenue, global top-20.  Exercises a 4-table join with two selective
    fact filters pushed below the joins, a broadcast dim (nation), and
    TakeOrderedAndProject for the ranking."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,4)")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(price * (F.lit(1) - disc)).cast("double").alias("revenue"))
        .select(
            "c_custkey", "c_name", "revenue",
            F.round("c_acctbal", 2).alias("c_acctbal"), "n_name",
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q14_promo_revenue",
    demoted=True,  # conditional-agg family driver-graded via pricing_summary
    oracle="""
    SELECT round(
        100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                              THEN CAST(l_extendedprice AS DECIMAL(18,2))
                                   * (1 - CAST(l_discount AS DECIMAL(18,4)))
                              ELSE 0 END) AS DOUBLE)
        / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                   * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE), 6)
        AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-06-01'
      AND l_shipdate <  TIMESTAMP '1996-07-01'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (r8): promo-revenue share for one ship month — the
    conditional-aggregate-over-join pattern (CASE inside SUM, one fact
    filter, part dim broadcast).  Decimal accumulation keeps the ratio
    engine-exact; one 1-row output."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-06-01") & (F.col("l_shipdate") < "1996-07-01")
    )
    p = load(spark, sf_dir, "part")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,4)")
    )
    promo = F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))).cast(
        "double"
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(F.lit(100.0) * promo / F.sum(rev).cast("double"), 6).alias(
                "promo_revenue_pct"
            )
        )
    )


# ---------------------------------------------------------------------------
# r9 (r8 VERDICT item 6): correlated-subquery SQL shapes — the
# decorrelation paths of the declared SQL surface (scalar correlated
# subquery, uncorrelated scalar subquery, NOT EXISTS), driven through the
# parser via sql.sql so Catalyst's RewriteCorrelatedScalarSubquery /
# RewritePredicateSubquery rules are what execute, not hand-built joins.
# Engine and oracle share ONE SQL text: every accumulation is an exact
# decimal sum cast to double before any division, so the floats are
# bit-identical cross-engine (the q3/q14 discipline).

_Q17_SQL = """
SELECT p_brand,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0E0
           AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE CAST(l_quantity AS DOUBLE) <
      (SELECT CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,4))) AS DOUBLE)
              / (5.0E0 * COUNT(*))
       FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
GROUP BY p_brand
ORDER BY p_brand
"""

_Q22_SQL = """
SELECT c_nationkey AS cntrycode,
       COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer c
WHERE CAST(c_acctbal AS DOUBLE) > (
        SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(*)
        FROM customer c2 WHERE c2.c_acctbal > 0.0E0)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
GROUP BY c_nationkey
ORDER BY cntrycode
"""


@register(
    "q17_small_quantity_revenue",
    # PROMOTED r10 (r9 VERDICT item 8): the correlated-subquery
    # decorrelation path, graded at sf0.01
    oracle=_Q17_SQL,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (r9): per-brand revenue from below-avg-quantity
    line items, where the threshold is a CORRELATED SCALAR SUBQUERY
    (``0.2 * avg(l_quantity)`` per part, expressed division-free as
    ``sum/(5·count)`` so the threshold is one exact-decimal sum and one
    IEEE divide — bit-identical cross-engine).  Catalyst decorrelates it
    into a per-part aggregate joined back to the fact scan — the plan
    pytest pins that NO scalar-subquery node survives to the physical
    plan (per-row re-execution would be O(n²) at 100 TB; the decorrelated
    form is two scans + one broadcast join)."""
    from .. import sql as sqlmod

    return sqlmod.sql(spark, sf_dir, _Q17_SQL)


@register(
    "q22_dormant_high_balance",
    demoted=True,  # SQL-entry family driver-graded via sql_surface_revenue_rank
    oracle=_Q22_SQL,
)
def q22_dormant_high_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (r9): high-balance customers with no urgent order
    — an UNCORRELATED SCALAR SUBQUERY (global positive-balance average,
    evaluated once and broadcast) plus a NOT EXISTS that Catalyst
    rewrites to a left-anti join (plan-pinned).  The anti join's right
    side is the filtered orders scan, so the exclusion predicate pushes
    into the scan instead of running per customer row."""
    from .. import sql as sqlmod

    return sqlmod.sql(spark, sf_dir, _Q22_SQL)


# --- r10: four more decorrelation shapes through the SQL entry ------------
# Charter relational surface widened with the remaining classic subquery
# patterns (ref: the reference's Prepare-SQLDatabase*.sql procs run plain
# T-SQL SELECTs; these prove the same ANSI shapes parse, decorrelate, and
# value-match through Catalyst).  Adapted to the fixture schema (lineitem
# carries l_shipdate only): "late" = shipped after the order date.

_Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

_Q11_SQL = """
SELECT p_brand,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS brand_rev
FROM lineitem JOIN part ON p_partkey = l_partkey
GROUP BY p_brand
HAVING SUM(CAST(l_extendedprice AS DECIMAL(18,2))) >
       (SELECT SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 0.04
        FROM lineitem JOIN part ON p_partkey = l_partkey)
ORDER BY brand_rev DESC, p_brand
"""

_Q18_SQL = """
SELECT c_name, c.c_custkey, o.o_orderkey, o_orderdate, o_totalprice,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem
                       GROUP BY l_orderkey
                       HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 160)
GROUP BY c_name, c.c_custkey, o.o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o.o_orderkey
LIMIT 100
"""

_Q21_SQL = """
SELECT s_name, COUNT(*) AS numwait
FROM supplier s
JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
WHERE l1.l_shipdate > o.o_orderdate
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o.o_orderdate)
GROUP BY s_name
ORDER BY numwait DESC, s_name
"""


@register(
    "q4_late_shipment_priority",
    demoted=True,  # SQL-entry family driver-graded via q17
    oracle=_Q4_SQL,
)
def q4_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (r10): per-priority count of orders with at least
    one late-shipped line — a correlated EXISTS whose inner predicate
    references BOTH sides (l_shipdate > o_orderdate).  Catalyst rewrites
    it to a LEFT SEMI join with the non-equi condition riding the equi
    key (plan-pinned) — per-row subquery re-execution would be O(n·m);
    the semi join is one shuffle on l_orderkey.  At 100 TB the lineitem
    side carries only (l_orderkey, l_shipdate) after pruning."""
    from .. import sql as sqlmod

    return sqlmod.sql(spark, sf_dir, _Q4_SQL)


@register(
    "q11_important_brand_share",
    demoted=True,  # SQL-entry family driver-graded via q17
    oracle=_Q11_SQL,
)
def q11_important_brand_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (r10): brands whose revenue exceeds a fraction of
    TOTAL revenue — a HAVING clause against an UNCORRELATED scalar
    subquery over the same join.  The global total evaluates once
    (one extra scan-agg, broadcast as a literal into the filter), never
    per group; all arithmetic stays in exact DECIMAL until the final
    presentation cast, so the threshold comparison is bit-identical
    cross-engine."""
    from .. import sql as sqlmod

    return sqlmod.sql(spark, sf_dir, _Q11_SQL)


@register(
    "q18_large_volume_orders",
    demoted=True,  # SQL-entry family driver-graded via q17
    oracle=_Q18_SQL,
)
def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (r10): large-volume orders — an IN over a grouped
    HAVING subquery (the aggregate-filtered semi join).  Catalyst plans
    the subquery as its own aggregation and semi-joins the result on
    o_orderkey; the outer 3-table join then re-aggregates quantities per
    surviving order.  Top-100 by price with the unique o_orderkey
    tie-break keeps the LIMIT deterministic cross-engine."""
    from .. import sql as sqlmod

    return sqlmod.sql(spark, sf_dir, _Q18_SQL)


@register(
    "q21_sole_late_supplier",
    demoted=True,  # SQL-entry family driver-graded via q17
    oracle=_Q21_SQL,
)
def q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (r10): suppliers who were the SOLE late shipper on
    multi-supplier orders — the hardest classic decorrelation: one
    correlated EXISTS (another supplier exists on the order) and one
    correlated NOT EXISTS whose predicate references the OUTER join's
    orders row (another supplier also late).  Catalyst compiles them to
    a left-semi and a left-anti join on l_orderkey with the residual
    conditions attached (plan-pinned: no exists-subquery survives;
    LeftSemi + LeftAnti both present).  Both rewritten joins shuffle on
    the same l_orderkey key, so AQE can reuse the exchange."""
    from .. import sql as sqlmod

    return sqlmod.sql(spark, sf_dir, _Q21_SQL)
