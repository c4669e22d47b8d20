"""r11 (r10 VERDICT item 1): sweep the three documented scale watch-items
WITH their production knobs engaged — converting "the knob exists" into
measured 100x datapoints.

1. pHash near-dup at 500k correlated docs: the 128-bit wide hash
   (16 bands x 8 bits, radius-15 exact recall) with ``max_bucket``
   excluding the correlated hot buckets — the config PERF.md documents as
   the web-scale posture of the deliberately-unswept 5-bit-band row.
2. Triangle census at 100x: edge derivation through
   ``cooccurrence_edges(max_items_per_group=...)`` so hub parts cannot
   explode the pair join; census over the capped graph.
3. Recursion depth at 100x: the order-successor chain (the
   recursive-CTE row's graph, ~10 hops/customer at sf0.1 vs ~1,000 at
   100x) through the production twin ``transitive_reachability`` with
   its ``max_depth`` bound — depth-bounded closure is O(depth * nodes)
   regardless of chain length.

Protocol: sweep protocol (single run, big heap) — comparative evidence,
not 2x-rule input.  Usage:
    SPARK_GRAFT_DRIVER_MEM=64g python tools/watchitem_sweep.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

BASE = "/root/testdata/sf0.1"
SCALED = str(ROOT / ".tmp" / "sf_sweep_100x")


def main() -> None:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from msgraphdatapipelines_spark.operators import multimodal as M
    from msgraphdatapipelines_spark.operators.graph import (
        cooccurrence_edges,
        transitive_reachability,
        triangle_stats,
    )
    from msgraphdatapipelines_spark.session import get_spark

    spark = get_spark("watchitem_sweep")
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[str, dict] = {}

    def run(tag: str, sf_dir: str, fn):
        t0 = time.monotonic()
        out = fn(sf_dir)
        wall = round(time.monotonic() - t0, 2)
        results[tag] = {"wall_s": wall, **out}
        print(f"{tag}: {results[tag]}", file=sys.stderr)

    # --- 1. wide pHash + max_bucket --------------------------------------
    def phash_wide(sf_dir: str) -> dict:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        media = M.wrap_text_as_media(docs, "doc_id", "text")
        hashed = M.perceptual_dhash_wide(media)  # 16x9 grid -> 128 bits
        pairs = M.phash_wide_near_dup_pairs(
            hashed, tau=15, band_bits=8, max_bucket=2000
        )
        n_pairs = pairs.count()
        # audit the exclusions the cap made (the documented contract:
        # callers see what the cap dropped)
        b = hashed.select(
            "media_id", F.posexplode("phash").alias("w", "word")
        ).select(
            "media_id",
            F.explode(F.array(*[F.lit(s) for s in range(4)])).alias("s"),
            "w",
            "word",
        ).select(
            (F.col("w") * 4 + F.col("s")).alias("band_id"),
            F.expr("shiftright(word, 8 * s) & 255").alias("band"),
        )
        sizes = b.groupBy("band_id", "band").agg(F.count(F.lit(1)).alias("n"))
        excluded = sizes.filter(F.col("n") > 2000).count()
        total_buckets = sizes.count()
        return {
            "pairs": n_pairs,
            "buckets_excluded": excluded,
            "buckets_total": total_buckets,
        }

    run("phash_wide_capped@sf0.1", BASE, phash_wide)
    run("phash_wide_capped@100x", SCALED, phash_wide)

    # --- 2. capped triangle census ---------------------------------------
    def tri(sf_dir: str) -> dict:
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            "l_partkey", "l_suppkey"
        )
        edges = cooccurrence_edges(li, "l_partkey", "l_suppkey", max_items_per_group=32)
        row = triangle_stats(edges).collect()[0]
        return {
            "n_edges": row["n_edges"],
            "n_triangles": row["n_triangles"],
            "n_wedges": row["n_wedges"],
        }

    run("triangle_capped@sf0.1", BASE, tri)
    run("triangle_capped@100x", SCALED, tri)

    # --- 3. depth-bounded order-chain reachability ------------------------
    def chains(sf_dir: str) -> dict:
        o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            "o_custkey", "o_orderkey", "o_orderdate"
        )
        w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        edges = (
            o.withColumn("nxt", F.lead("o_orderkey").over(w))
            .filter(F.col("nxt").isNotNull())
            .select(F.col("o_orderkey").alias("src"), F.col("nxt").alias("dst"))
        )
        closure = transitive_reachability(edges, max_depth=8)
        return {"closure_pairs": closure.count()}

    run("order_chain_depth8@sf0.1", BASE, chains)
    run("order_chain_depth8@100x", SCALED, chains)

    for a, b in [
        ("phash_wide_capped@sf0.1", "phash_wide_capped@100x"),
        ("triangle_capped@sf0.1", "triangle_capped@100x"),
        ("order_chain_depth8@sf0.1", "order_chain_depth8@100x"),
    ]:
        ratio = round(results[b]["wall_s"] / max(results[a]["wall_s"], 0.01), 1)
        results[b]["wall_ratio_vs_sf0.1"] = ratio
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
