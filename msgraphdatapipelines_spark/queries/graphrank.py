"""Graph-centrality query rows (r7): PageRank as a curation signal.

Operator and determinism/scale notes: ``operators/graph.py``.  The oracle
is GENERATED from the same recurrence definition
(``pagerank_oracle_sql``), so the Spark loop and the DuckDB twin cannot
drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.graph import pagerank, pagerank_oracle_sql
from . import load, register

_EDGES_SQL = """
        SELECT 'c' || CAST(o_custkey AS VARCHAR) AS src,
               's' || CAST(l_suppkey AS VARCHAR) AS dst,
               count(*) AS w
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY 1, 2
"""


@register(
    "pagerank_supplier_graph",
    demoted=True,  # iterative-propagation family driver-graded via dedup_connected_components
    oracle=pagerank_oracle_sql(_EDGES_SQL, iters=3),
)
def pagerank_supplier_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank (r7) over the customer→supplier purchase graph
    (edge weight = co-occurring order lines): 3 damped iterations of the
    integer fixed-point recurrence, dangling supplier mass redistributed
    uniformly.  The link-centrality quality signal of web-corpus curation,
    on the fixtures' natural bipartite graph — suppliers score by
    purchase-weighted attention.

    Per iteration: one edges⋈ranks equi-join + one dst hash agg + a 1-row
    dangling broadcast (same round shape as connected_components); ranks
    are scale-1e12 BIGINTs, every contribution floored pre-sum, so the
    whole trajectory replays bit-identically in the generated oracle."""
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    edges = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .groupBy(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    return pagerank(edges, iters=3)


@register(
    "transitive_membership_customers",
    demoted=True,  # iterative family driver-graded via dedup_connected_components
    oracle="""
    WITH RECURSIVE edges AS (
        SELECT c_custkey AS src, c_custkey // 10 AS dst
        FROM customer WHERE c_custkey >= 10
    ),
    reach(src, dst, min_depth) AS (
        SELECT src, dst, 1 FROM edges
        UNION
        SELECT r.src, e.dst, r.min_depth + 1
        FROM reach r JOIN edges e ON r.dst = e.src
        WHERE r.min_depth < 8 AND r.src <> e.dst
    )
    SELECT src, dst, CAST(min(min_depth) AS INT) AS min_depth
    FROM reach GROUP BY src, dst
    """,
)
def transitive_membership_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed transitive closure with hop counts (r8,
    ``operators.graph.transitive_reachability``): nested membership
    expansion over a decimal-shift hierarchy derived from the customer
    keys (child c → parent c÷10 — a forest whose depth grows with key
    width, ~5 levels at sf0.01) — the "all groups this principal is
    transitively in" query of the reference's AAD domain, which its
    T-SQL consumers hand-write as recursive CTEs; the oracle IS that
    recursive CTE.  BFS frontier rounds with anti-join dedup (first
    discovery = min depth, cycles die in the anti-join), early stop on an
    empty round."""
    from ..operators.graph import transitive_reachability

    cust = load(spark, sf_dir, "customer")
    edges = cust.filter(F.col("c_custkey") >= 10).select(
        F.col("c_custkey").alias("src"),
        (F.col("c_custkey") / 10).cast("long").alias("dst"),
    )
    return transitive_reachability(edges, max_depth=8).select(
        "src", "dst", F.col("min_depth").cast("int").alias("min_depth")
    )
