"""Conjunctive (label ∧ range) serve sweep (r16, r15 VERDICT item 7):
the 100x datapoint for `ann_label_range_filtered_topk_served`, whose
scale-interesting part is the INTERSECTION selectivity of the two
model-sized steering summaries by ingest shape.

The conjunctive steering contract (operators.similarity.
filtered_ivf_pq_topk with id_range): the label's (label, cent) list set
is intersected with the window-overlapping (cent, min_id, max_id)
lists BEFORE the probe — both summaries are model-sized, the
intersection is planning-side, and candidates are residual-filtered
(label equality via the index payload, BETWEEN via cid).  Two regimes:

- `sf_sweep_100x` (replication): labels AND ids recur in every
  replica, so both steering axes degrade toward keep-everything — the
  worst case; the serve must stay bounded by probe cost.
- `sf_sweep_idclust_100x` (id-clustered ingest, labels assigned per id
  block): per-list id intervals are tight AND labels concentrate in few
  lists, so the intersection keeps a handful of lists — the common
  production case (time-clustered upserts with per-tenant labels).

Per corpus: rows, k lists, kept-by-label, kept-by-range, kept-by-BOTH
(the conjunctive probe's universe), conjunctive serve wall (median of
3, artifact built OUTSIDE the timed region), label-only serve wall as
contrast.

Protocol: sweep protocol (single run, big heap) — comparative evidence,
not 2x-rule input.  Usage:
    SPARK_GRAFT_DRIVER_MEM=64g python tools/conjunctive_sweep.py
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


def _sweep_corpus(spark, tag: str, sf_dir: str, lo: int, hi: int, label) -> dict:
    emb = load(spark, sf_dir, "embeddings")
    n = emb.count()
    kc = max(8, int(math.sqrt(n)))
    persisted, cents, books = qs.ensure_standing_index(
        spark, sf_dir, emb, n_centroids=kc
    )
    root = qs.standing_index_root(sf_dir, kc)
    snap = f"{root}/snapshot"
    version = sinks._read_latest_version(spark, snap)
    resolved = sinks.read_snapshot(spark, snap, version=version)
    # both steering summaries, derived like the loaders do (model-sized)
    ll = (
        resolved.groupBy("label", "cent")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    rl = (
        resolved.groupBy("cent")
        .agg(
            F.min("cid").alias("min_id"),
            F.max("cid").alias("max_id"),
            F.count(F.lit(1)).alias("n"),
        )
        .localCheckpoint(eager=True)
    )
    total = rl.count()
    kept_label = ll.filter(F.col("label") == label).select("cent").distinct()
    kept_range = rl.filter((F.col("min_id") <= hi) & (F.col("max_id") >= lo)).select(
        "cent"
    )
    n_label = kept_label.count()
    n_range = kept_range.count()
    n_both = kept_label.join(kept_range, "cent", "left_semi").count()
    queries = emb.filter(F.col("vec_id") < qs.N_QUERIES).withColumn(
        "label", F.lit(label).cast(emb.schema["label"].dataType)
    )

    def conjunctive_serve() -> None:
        S.filtered_ivf_pq_topk(
            queries, emb, "vec_id", "vec_id", "embedding", "embedding",
            "label", k=qs.K, nprobe=2 * qs.NPROBE, centroids=cents,
            codebooks=books, rerank=50, label_lists=ll,
            index_pruner=lambda cents_: sinks.read_snapshot_pruned_in(
                spark, snap, "cent", cents_, version=version
            ),
            dim=qs.DIM, id_range=(lo, hi), range_lists=rl,
        ).write.format("noop").mode("overwrite").save()

    def label_serve() -> None:
        S.filtered_ivf_pq_topk(
            queries, emb, "vec_id", "vec_id", "embedding", "embedding",
            "label", k=qs.K, nprobe=2 * qs.NPROBE, centroids=cents,
            codebooks=books, rerank=50, label_lists=ll,
            index_pruner=lambda cents_: sinks.read_snapshot_pruned_in(
                spark, snap, "cent", cents_, version=version
            ),
            dim=qs.DIM,
        ).write.format("noop").mode("overwrite").save()

    tc, tl = _timed(conjunctive_serve), _timed(label_serve)
    row = {
        "tag": tag, "rows": n, "lists": total, "kept_label": n_label,
        "kept_range": n_range, "kept_both": n_both, "window": [lo, hi],
        "conjunctive_serve_s": round(tc, 2), "label_serve_s": round(tl, 2),
    }
    print(
        f"| {tag} | {n} | {total} | {n_label} | {n_range} "
        f"| {n_both} ({n_both / total:.1%}) | [{lo}, {hi}] | {tc:.2f} | {tl:.2f} |"
    )
    return row


def main() -> None:
    spark = get_spark("conjunctive-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(f"{SCALED}/embeddings.parquet"):
        subprocess.run(
            [sys.executable, str(ROOT / "tools" / "make_scaled.py"),
             BASE, SCALED, "100"],
            check=True,
        )
    n100 = 100 * load(spark, BASE, "embeddings").count()
    if not os.path.exists(f"{IDCLUST}/embeddings.parquet"):
        # reuse range_sweep's id-clustered synthesis
        from tools.range_sweep import _ensure_idclust

        _ensure_idclust(spark, n100)
    print(
        "| corpus | rows | lists | kept:label | kept:range "
        "| kept:BOTH (sel.) | window | conj s | label s |"
    )
    print("|---|---|---|---|---|---|---|---|---|")
    rows = [
        _sweep_corpus(spark, "sf0.1 (1x)", BASE, qs.RANGE_LO, qs.RANGE_HI, 3),
        _sweep_corpus(spark, "100x replicated", SCALED, qs.RANGE_LO, qs.RANGE_HI, 3),
        _sweep_corpus(
            spark, "100x id-clustered", IDCLUST, n100 // 2, n100 // 2 + 3000, 3
        ),
    ]
    import json

    print(json.dumps(rows))
    spark.stop()


if __name__ == "__main__":
    main()
