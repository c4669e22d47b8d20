"""RANGE-filtered serve sweep (r15, r14 VERDICT item 6): the 100x
datapoint for `ann_range_filtered_topk_served`, whose scale-interesting
part is the PER-LIST ID-ZONEMAP STEERING's selectivity.

The steering contract (operators.similarity.range_filtered_ivf_pq_topk):
keep only lists whose (min_id, max_id) interval overlaps the query
window — tight intervals on id-correlated ingest prune most lists; on
id-uniform ingest every list overlaps and steering degrades to the plain
probe (correct either way, the residual BETWEEN re-checks membership).
This sweep measures BOTH regimes at 100x:

- `sf_sweep_100x` (make_scaled replication): replicas carry IDENTICAL
  vectors at offset ids, so every list holds ids from every replica —
  the documented worst case (kept/total ~= 1). The serve must still be
  bounded by probe cost, not corpus size.
- `sf_sweep_idclust_100x` (synthesized id-clustered corpus: vectors
  cluster by id block, the "monotonic ids, time-clustered upserts"
  common case the operator docstring names): per-list intervals are
  tight and a narrow window keeps a handful of lists.

Per corpus: rows, k lists, kept lists for the window, range-serve wall
(median of 3, artifact built OUTSIDE the timed region), plain
(unfiltered) serve wall as contrast.

Protocol: sweep protocol (single run, big heap) — comparative evidence,
not 2x-rule input.  Usage:
    SPARK_GRAFT_DRIVER_MEM=64g python tools/range_sweep.py
"""

from __future__ import annotations

import math
import os
import statistics
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from pyspark.sql import functions as F  # noqa: E402

from msgraphdatapipelines_spark import sinks  # noqa: E402
from msgraphdatapipelines_spark.operators import similarity as S  # noqa: E402
from msgraphdatapipelines_spark.queries import load  # noqa: E402
from msgraphdatapipelines_spark.queries import similarity as qs  # noqa: E402
from msgraphdatapipelines_spark.session import get_spark  # noqa: E402

BASE = "/root/testdata/sf0.1"
SCALED = str(ROOT / ".tmp" / "sf_sweep_100x")
IDCLUST = str(ROOT / ".tmp" / "sf_sweep_idclust_100x")


def _timed(fn, runs: int = 3) -> float:
    fn()  # warm-up: plan compile + file listing
    samples = []
    for _ in range(runs):
        t0 = time.monotonic()
        fn()
        samples.append(time.monotonic() - t0)
    return statistics.median(samples)


def _ensure_scaled() -> None:
    if not os.path.exists(f"{SCALED}/embeddings.parquet"):
        subprocess.run(
            [sys.executable, str(ROOT / "tools" / "make_scaled.py"),
             BASE, SCALED, "100"],
            check=True,
        )


def _ensure_idclust(spark, n: int) -> None:
    """Synthesize the id-correlated corpus: 64-dim vectors clustered by
    id block (block size = sqrt(n), so ~sqrt(n) natural clusters matches
    the k ∝ sqrt(n) standing-index rule), ids monotone within a block —
    the ingest shape where per-list id intervals come out tight.  All
    JVM-side expressions (xxhash64-derived deterministic pseudo-noise),
    no Python loop over 100x rows."""
    dst = f"{IDCLUST}/embeddings.parquet"
    if os.path.exists(dst):
        return
    blk = max(1, int(math.sqrt(n)))
    dims = F.sequence(F.lit(0), F.lit(63))
    vec = F.transform(
        dims,
        lambda d: (
            F.pmod(F.xxhash64(F.col("blk"), d), F.lit(1000)).cast("double") / 1000.0
            + F.pmod(F.xxhash64(F.col("vec_id"), d), F.lit(97)).cast("double") / 9700.0
        ),
    )
    (
        spark.range(n)
        .select(
            F.col("id").alias("vec_id"),
            (F.col("id") / blk).cast("long").alias("blk"),
        )
        .select(
            "vec_id",
            vec.cast("array<double>").alias("embedding"),
            F.pmod(F.col("blk"), F.lit(8)).cast("long").alias("label"),
        )
        .write.mode("overwrite")
        .parquet(dst)
    )


def _sweep_corpus(spark, tag: str, sf_dir: str, lo: int, hi: int) -> dict:
    emb = load(spark, sf_dir, "embeddings")
    n = emb.count()
    kc = max(8, int(math.sqrt(n)))
    # artifact build OUTSIDE the timed region (once per corpus version)
    persisted, cents, books = qs.ensure_standing_index(
        spark, sf_dir, emb, n_centroids=kc
    )
    root = qs.standing_index_root(sf_dir, kc)
    snap = f"{root}/snapshot"
    version = sinks._read_latest_version(spark, snap)
    # the per-list id zonemap — model-sized, derived from the resolved
    # snapshot exactly like _load_range_lists does
    rl = (
        sinks.read_snapshot(spark, snap, version=version)
        .groupBy("cent")
        .agg(
            F.min("cid").alias("min_id"),
            F.max("cid").alias("max_id"),
            F.count(F.lit(1)).alias("n"),
        )
        .localCheckpoint(eager=True)
    )
    kept = rl.filter((F.col("min_id") <= hi) & (F.col("max_id") >= lo)).count()
    total = rl.count()
    queries = emb.filter(F.col("vec_id") < qs.N_QUERIES)

    def range_serve() -> None:
        S.range_filtered_ivf_pq_topk(
            queries, emb, "vec_id", "vec_id", "embedding", "embedding",
            lo, hi, k=qs.K, nprobe=2 * qs.NPROBE, centroids=cents,
            codebooks=books, rerank=50, range_lists=rl,
            index_pruner=lambda cents_: sinks.read_snapshot_pruned_in(
                spark, snap, "cent", cents_, version=version
            ),
            dim=qs.DIM,
        ).write.format("noop").mode("overwrite").save()

    def plain_serve() -> None:
        S.ivf_pq_topk(
            queries, emb, "vec_id", "vec_id", "embedding", "embedding",
            k=qs.K, nprobe=2 * qs.NPROBE, centroids=cents, codebooks=books,
            rerank=50, index=persisted, dim=qs.DIM,
        ).write.format("noop").mode("overwrite").save()

    tr, tp = _timed(range_serve), _timed(plain_serve)
    row = {
        "tag": tag, "rows": n, "lists": total, "kept_lists": kept,
        "window": [lo, hi], "range_serve_s": round(tr, 2),
        "plain_serve_s": round(tp, 2),
    }
    print(
        f"| {tag} | {n} | {total} | {kept} ({kept / total:.1%}) "
        f"| [{lo}, {hi}] | {tr:.2f} | {tp:.2f} |"
    )
    return row


def main() -> None:
    spark = get_spark("range-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    _ensure_scaled()
    n100 = 100 * load(spark, BASE, "embeddings").count()
    _ensure_idclust(spark, n100)
    print("| corpus | rows | lists | kept (sel.) | window | range s | plain s |")
    print("|---|---|---|---|---|---|---|")
    rows = [
        _sweep_corpus(spark, "sf0.1 (1x)", BASE, qs.RANGE_LO, qs.RANGE_HI),
        # same absolute window at 100x: relatively 100x narrower
        _sweep_corpus(spark, "100x replicated", SCALED, qs.RANGE_LO, qs.RANGE_HI),
        # id-clustered corpus, a mid-corpus window of ~3k ids
        _sweep_corpus(
            spark, "100x id-clustered", IDCLUST, n100 // 2, n100 // 2 + 3000
        ),
    ]
    import json

    print(json.dumps(rows))
    spark.stop()


if __name__ == "__main__":
    main()
