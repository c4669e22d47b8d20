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
