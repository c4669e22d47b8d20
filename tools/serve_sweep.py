"""Standing-index SERVE-cost sweep (r9, r8 VERDICT item 1 "Done" criteria).

Measures the steady-state retrieval shape a deployment runs: the IVF+PQ
artifact is built ONCE per corpus OUTSIDE the timed region (via
``ensure_standing_index``, with ``n_centroids ~ sqrt(n)`` — the scale knob
the operators module prescribes), then the timed number is the PROBE
alone: resolve the snapshot pointer, probe ``nprobe`` lists, ADC-score,
exact-rerank the pooled 50 — per run, median of 3.

Contrast rows: brute-force cosine top-k over the same corpus (the
corpus-linear baseline) at each size.

Usage:
    python tools/serve_sweep.py [K]      # default K=100 (uses the sweep
                                         # corpus .tmp/sf_sweep_{K}x)

Prints the markdown table PERF.md records.
"""

from __future__ import annotations

import math
import statistics
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from pyspark.sql import functions as F  # noqa: E402

from msgraphdatapipelines_spark.queries import load  # noqa: E402
from msgraphdatapipelines_spark.queries import similarity as qs  # noqa: E402
from msgraphdatapipelines_spark.operators import similarity as S  # noqa: E402
from msgraphdatapipelines_spark.session import get_spark  # noqa: E402


def _timed(fn, runs: int = 3) -> float:
    fn()  # warm-up: plan compile + file listing + JIT
    samples = []
    for _ in range(runs):
        t0 = time.monotonic()
        fn()
        samples.append(time.monotonic() - t0)
    return statistics.median(samples)


def main() -> None:
    k_scale = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    base = "/root/testdata/sf0.1"
    scaled = str(ROOT / ".tmp" / f"sf_sweep_{k_scale}x")
    spark = get_spark("serve-sweep")
    spark.sparkContext.setLogLevel("ERROR")

    print(f"| corpus | rows | n_centroids (√n) | serve s | brute s |")
    print("|---|---|---|---|---|")
    rows = []
    for sf_dir in (base, scaled):
        emb = load(spark, sf_dir, "embeddings")
        n = emb.count()
        kc = max(8, int(math.sqrt(n)))
        # build/refresh OUTSIDE the timed region — the amortized cost a
        # deployment pays once per corpus version, not per query
        index_df, cents, books = qs.ensure_standing_index(
            spark, sf_dir, emb, n_centroids=kc
        )

        def serve() -> None:
            ix, cs, bs = qs.ensure_standing_index(spark, sf_dir, emb, n_centroids=kc)
            S.ivf_pq_topk(
                emb.filter(F.col("vec_id") < qs.N_QUERIES),
                emb,
                "vec_id",
                "vec_id",
                "embedding",
                "embedding",
                k=10,
                nprobe=qs.NPROBE,
                centroids=cs,
                codebooks=bs,
                rerank=50,
                dim=qs.DIM,
                index=ix,
            ).write.format("noop").mode("overwrite").save()

        def brute() -> None:
            S.brute_force_topk(
                emb.filter(F.col("vec_id") < qs.N_QUERIES),
                emb,
                "vec_id",
                "vec_id",
                "embedding",
                "embedding",
                k=10,
            ).write.format("noop").mode("overwrite").save()

        ts, tb = _timed(serve), _timed(brute)
        rows.append((sf_dir, n, kc, ts, tb))
        print(f"| {Path(sf_dir).name} | {n} | {kc} | {ts:.2f} | {tb:.2f} |")

    (s1, b1), (s2, b2) = (r[3:] for r in rows)
    print(
        f"\nserve grows {s2 / s1:.2f}x at {k_scale}x corpus; "
        f"brute force grows {b2 / b1:.2f}x"
    )
    spark.stop()


if __name__ == "__main__":
    main()
