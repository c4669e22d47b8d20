"""Automated-rebalance scale sweep (r13, r12 VERDICT item 2's 100-TB
question) — what drift-induced skew costs a STANDING IVF index at scale,
and what the automated retrain buys back.

Scenario per scale factor X: a base corpus of 500·X vectors gets a
standing index (k ∝ √n lists), then a drift stream appends 4·(500·X)
vectors from an off-distribution region — all of which the frozen coarse
quantizer assigns to ONE list (the real failure mode: ingest moves, the
quantizer doesn't).  Measured:

- occupancy (max-list share vs uniform) before/after the retrain — the
  trigger metric ``ann_rebalance_if_skewed`` acts on;
- PROBE COST: rows a drift-region query batch actually joins (the
  nprobe-probed lists' membership) before/after — the quantity that
  silently grows at 100 TB when lists skew: probing nprobe of k lists is
  supposed to touch ~nprobe/k of the corpus, and skew makes it touch
  the whole drift mass instead;
- walls: the one-time rebalance (retrain + re-encode + clustered
  republish) vs a single incremental append — the amortization argument
  (rebalance is the rare maintenance op, appends are the common one).

Usage:
    python tools/rebalance_sweep.py [X ...]     # default: 1 10

Prints the markdown table PERF.md records.
"""

from __future__ import annotations

import math
import os
import random
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from msgraphdatapipelines_spark.operators import similarity as S  # noqa: E402
from msgraphdatapipelines_spark.queries.similarity import (  # noqa: E402
    ann_rebalance_if_skewed,
    ensure_standing_index,
    standing_index_root,
)
from msgraphdatapipelines_spark.session import get_spark  # noqa: E402

DIM = 64


def _drift(spark, n, base_id=10_000_000):
    """Drift mass: n vectors in 20 tight sub-clusters around one
    off-distribution point (same construction as the pytest, scaled)."""
    rng = random.Random(1234)
    p = [0.5 if i % 2 == 0 else -0.5 for i in range(DIM)]
    per = n // 20
    rows = []
    for j in range(20):
        b = [p[d] + 0.01 * rng.uniform(-1, 1) for d in range(DIM)]
        for i in range(per):
            rows.append(
                (base_id + j * per + i,
                 [b[d] + 1e-4 * rng.uniform(-1, 1) for d in range(DIM)], 999)
            )
    return spark.createDataFrame(
        rows, "vec_id: long, embedding: array<double>, label: long"
    )


def _probe_rows(spark, root, version, queries, index_df=None, nprobe=2):
    """Rows the query batch's nprobe-probed lists hold — the candidate
    mass the ADC join scores (the serve cost driver).  ``index_df``
    overrides the snapshot (the PRE-rebalance state lives in the batch
    view: appended drift is not in snapshot v1 yet)."""
    from msgraphdatapipelines_spark import sinks
    from msgraphdatapipelines_spark.queries.similarity import _load_models_for

    models = _load_models_for(spark, root, version)
    cents = [(int(c), v) for c, v in models["centroids"]]
    snap = (
        index_df
        if index_df is not None
        else sinks.read_snapshot(spark, f"{root}/snapshot", version=version)
    )
    usable = [
        (cid, cvec, math.sqrt(sum(x * x for x in cvec))) for cid, cvec in cents
    ]
    usable = [t for t in usable if t[2] > 0]
    qv = F.col("embedding").cast("array<double>")
    qn = (
        queries.select(F.col("vec_id").alias("qid"), qv.alias("_v"))
        .withColumn("_n", F.sqrt(S.seq_dot(F.col("_v"), F.col("_v"))))
        .filter(F.col("_n") > 0)
    )
    probe = S._probe_cent_frame(qn, usable, nprobe, payload=F.lit(0))
    lc = snap.groupBy("cent").agg(F.count(F.lit(1)).alias("n"))
    return (
        probe.select("qid", "cent")
        .join(lc, "cent")
        .agg(F.sum("n"))
        .collect()[0][0]
    )


def main() -> None:
    scales = [int(x) for x in sys.argv[1:]] or [1, 10]
    spark = get_spark("rebalance-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    print("| X | n total | share before | share after | probe rows before | "
          "probe rows after | append wall | rebalance wall |")
    print("|---|---|---|---|---|---|---|---|")
    for x in scales:
        work = tempfile.mkdtemp(prefix=f"rebal_{x}x_")
        sf = os.path.join(work, "sf")
        os.makedirs(sf)
        n_base = 500 * x
        rng = random.Random(7)
        base = spark.createDataFrame(
            [(i, [rng.uniform(-0.3, 0.3) for _ in range(DIM)], i % 10)
             for i in range(n_base)],
            "vec_id: long, embedding: array<double>, label: long",
        )
        base.coalesce(1).write.parquet(os.path.join(sf, "embeddings.parquet"))
        emb = spark.read.parquet(os.path.join(sf, "embeddings.parquet"))
        kc = max(8, round(math.sqrt(n_base)))
        _, cents1, books1 = ensure_standing_index(spark, sf, emb, n_centroids=kc)
        root = standing_index_root(sf, kc)

        drift = _drift(spark, 4 * n_base)
        t0 = time.monotonic()
        S.ivf_pq_index(
            drift, "vec_id", "embedding", cents1, books1, dim=DIM,
            meta_cols=("label",),
        ).write.parquet(f"{root}/batches/batch_id=1")
        t_append = time.monotonic() - t0

        emb_full = emb.unionByName(drift)
        n_total = n_base * 5
        qdrift = drift.limit(20)

        from msgraphdatapipelines_spark.streaming.ann_stream import read_ann_index

        pr_before = _probe_rows(
            spark, root, 1, qdrift, index_df=read_ann_index(spark, f"{root}/batches")
        )
        t0 = time.monotonic()
        stats = ann_rebalance_if_skewed(spark, root, emb_full)
        t_rebal = time.monotonic() - t0
        assert stats["retrained"], stats

        pr_after = _probe_rows(spark, root, stats["version"], qdrift)
        print(
            f"| {x} | {n_total} | {stats['max_share_ratio']}× "
            f"| {stats['max_share_ratio_after']}× | {pr_before} | {pr_after} "
            f"| {t_append:.1f} s | {t_rebal:.1f} s |"
        )
        shutil.rmtree(work, ignore_errors=True)
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
