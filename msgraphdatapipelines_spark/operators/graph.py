"""Iterative graph propagation (r7): weighted PageRank.

Web-corpus curation uses link-graph centrality as a document quality
signal (the original PageRank use case; Common-Crawl-derived corpora
filter on harmonic/centrality scores).  The engine already has one
iterative-propagation operator — ``dedup.connected_components`` (min-label
over edges) — this adds the weighted-random-surfer recurrence with the
same execution discipline: per-round equi-join + map-combinable agg, no
driver-side data, bounded iterations.

**Determinism contract (the oracle story).**  Ranks are fixed-point
BIGINTs at scale 1e12, and every per-edge contribution is floored to an
integer BEFORE summation — so each iteration is an ORDER-FREE integer
recurrence that replays bit-identically in any engine (the k-means
exact-mean / unigram-LM quantization trick applied to an iterative
algorithm).  The 1e-12-granularity floor truncation is far below any
ranking-relevant difference.

Recurrence (damping d, N nodes, out-weight W_s = Σ_d w(s,d)):

    r'_q(v) = floor(0.15·S / N)                       (teleport)
            + floor(d · DANG_q / N)                   (dangling mass)
            + Σ_{(s,v)∈E} floor(d · r_q(s) · w / W_s) (incoming)

where DANG_q = Σ r_q over nodes with no out-edges.  Nodes never lose
identity: sinks receive mass and redistribute it via the dangling term.

Scale shape per iteration: one equi-join of edges⋈ranks on src (edges
pre-joined with out-weights ONCE outside the loop), one hash agg by dst,
one broadcast of the 1-row dangling sum — identical to the CC round
shape, AQE skew-join applies to hot destinations.  N rides a 1-row
aggregate crossJoin-broadcast, NOT a driver collect.  For deep graphs
apply the same per-round ``localCheckpoint`` lineage truncation CC uses
(`dedup.py:connected_components`); at the default 3-5 iterations lazy
composition is cheaper.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000_000_000


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    checkpoint_every: int | None = None,
) -> DataFrame:
    """Weighted PageRank over an (src, dst, weight) edge list; returns
    (node, r_q) with ranks as scale-1e12 fixed-point BIGINTs summing to
    ~SCALE.  See module docstring for the recurrence and scale shape."""
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    nn = nodes.agg(F.count(F.lit(1)).alias("n"))
    outw = edges.groupBy(src).agg(F.sum(weight).alias("__ow"))
    # pre-join out-weights once; the loop never re-aggregates them
    ew = edges.join(outw, src).select(
        F.col(src).alias("node"), F.col(dst).alias("__dst"), F.col(weight).alias("__w"), "__ow"
    )
    out_nodes = outw.select(F.col(src).alias("node"))

    ranks = nodes.crossJoin(F.broadcast(nn)).select(
        "node", F.expr("CAST(1000000000000 div n AS BIGINT)").alias("r_q")
    )
    tele = F.floor((F.lit(0.15) * F.lit(SCALE)) / F.col("n")).cast("long")
    for i in range(iters):
        dang = (
            ranks.join(out_nodes, "node", "left_anti")
            .agg(F.coalesce(F.sum("r_q"), F.lit(0)).alias("dq"))
        )
        incoming = (
            ew.join(ranks, "node")
            .select(
                F.col("__dst").alias("node"),
                F.floor((F.lit(damping) * F.col("r_q") * F.col("__w")) / F.col("__ow"))
                .cast("long")
                .alias("c_q"),
            )
            .groupBy("node")
            .agg(F.sum("c_q").alias("in_q"))
        )
        ranks = (
            nodes.join(incoming, "node", "left")
            .crossJoin(F.broadcast(dang))
            .crossJoin(F.broadcast(nn))
            .select(
                "node",
                (
                    tele
                    + F.floor((F.lit(damping) * F.col("dq")) / F.col("n")).cast("long")
                    + F.coalesce(F.col("in_q"), F.lit(0))
                ).alias("r_q"),
            )
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


def pagerank_oracle_sql(edges_sql: str, iters: int = 3, damping: float = 0.85) -> str:
    """Generate the DuckDB twin of :func:`pagerank` — the SAME integer
    recurrence unrolled as a CTE chain, so the Spark loop and the oracle
    cannot drift (one definition of the math, two renderings)."""
    d = damping
    parts = [
        f"WITH edges AS ({edges_sql})",
        "nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges)",
        "nn AS (SELECT count(*) AS n FROM nodes)",
        "outw AS (SELECT src, sum(w) AS W FROM edges GROUP BY src)",
        f"r0 AS (SELECT node, CAST({SCALE} // n AS BIGINT) AS r_q FROM nodes CROSS JOIN nn)",
    ]
    for i in range(iters):
        p, c = f"r{i}", f"r{i + 1}"
        parts.append(
            f"""d{i} AS (
        SELECT coalesce(sum(r_q), 0) AS dq
        FROM {p} LEFT JOIN outw ON {p}.node = outw.src
        WHERE outw.src IS NULL
    )"""
        )
        parts.append(
            f"""{c} AS (
        SELECT nd.node,
               CAST(floor((0.15 * {SCALE}) / n)
                    + floor(({d} * dq) / n)
                    + coalesce(i.in_q, 0) AS BIGINT) AS r_q
        FROM nodes nd CROSS JOIN nn CROSS JOIN d{i}
        LEFT JOIN (
            SELECT e.dst AS node,
                   sum(CAST(floor(({d} * r.r_q * e.w) / o.W) AS BIGINT)) AS in_q
            FROM edges e
            JOIN {p} r ON e.src = r.node
            JOIN outw o ON e.src = o.src
            GROUP BY e.dst
        ) i ON nd.node = i.node
    )"""
        )
    return ",\n    ".join(parts) + f"\nSELECT node, r_q FROM r{iters}"
