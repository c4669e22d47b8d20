"""r7 sweep datapoint (VERDICT r6 item 1): SemDeDup at k=256 on the 100x
corpus (200k vectors) via the broadcast centroid-table assignment path —
the configuration whose inline-literal formulation destabilized the
driver in the late-r6 sweep.  Protocol: sweep (single run, big heap).

Usage: SPARK_GRAFT_DRIVER_MEM=64g python tools/semdedup_k256_probe.py
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from msgraphdatapipelines_spark.session import get_spark  # noqa: E402
from msgraphdatapipelines_spark.operators import similarity as S  # noqa: E402


def main() -> None:
    scaled = os.environ.get(
        "SEMDEDUP_CORPUS", str(Path(__file__).resolve().parent.parent / ".tmp/sf_sweep_100x")
    )
    spark = get_spark()
    emb = spark.read.parquet(f"{scaled}/embeddings.parquet")
    n = emb.count()
    t0 = time.monotonic()
    cents = S.kmeans_centroids(emb, "vec_id", "embedding", k=256, iters=1)
    t_train = time.monotonic() - t0
    t0 = time.monotonic()
    out = S.semantic_dedup(emb, "vec_id", "embedding", cents, tau=0.4, assign="table")
    kept = out.filter("kept").count()
    t_dedup = time.monotonic() - t0
    print(json.dumps({
        "n": n, "k": 256, "assign": "table",
        "train_s": round(t_train, 1), "dedup_s": round(t_dedup, 1),
        "kept": kept,
    }))


if __name__ == "__main__":
    main()
