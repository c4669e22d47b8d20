"""Crossover measurement for probe-list pushdown (late r12).

The 100×-corpus sweep (tools/pruned_serve_sweep.py) showed the pushdown's
I/O quantities scale as designed (10× fewer rows read) while warm wall is
SLOWER at small artifacts — the two planning jobs it adds are constant,
the scan they elide is milliseconds.  This tool measures where the scan
side starts to dominate, WITHOUT paying an hours-long quantizer-
assignment build: the 1000× corpus is 10 exact vec_id-shifted replicas
of the 100× corpus, and IVF assignment depends only on the vector, so
the 1000× ARTIFACT is synthesized exactly as 10 cid-shifted copies of
the already-built 100× index under the SHARED models.  (Caveat recorded:
lists are then 10× denser than the √n prescription — which scales plain
and pruned reads by the same factor, so the plain/pruned RATIO is the
honest quantity.)

Usage: python tools/pruned_crossover.py
Requires the 100× sweep artifact (run tools/pruned_serve_sweep.py first).
"""

from __future__ import annotations

import json
import statistics
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
from msgraphdatapipelines_spark.streaming.ann_stream import compact_ann_index  # noqa: E402


def _median(fn, runs: int) -> float:
    samples = []
    for _ in range(runs):
        t0 = time.monotonic()
        fn()
        samples.append(time.monotonic() - t0)
    return statistics.median(samples)


def main() -> None:
    repl = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    base_corpus = str(ROOT / ".tmp" / "sf_sweep_100x")
    spark = get_spark("pruned-crossover")
    spark.sparkContext.setLogLevel("ERROR")

    emb = load(spark, base_corpus, "embeddings")
    n = emb.count()
    kc = 447  # the 100× sweep's √n configuration (its artifact is reused)
    root100 = qs.standing_index_root(base_corpus, kc)
    with open(f"{root100}/models.json") as fh:
        models = json.load(fh)
    cents = [(int(c), v) for c, v in models["centroids"]]
    books = models["codebooks"]
    ix100 = sinks.read_snapshot(spark, f"{root100}/snapshot")

    # synthesize the 1000× artifact: 10 cid-shifted replicas (same cent,
    # same code — assignment is a function of the vector alone)
    big_root = str(ROOT / ".tmp" / f"ivfpq_{repl}00x_synth")
    snap = f"{big_root}/snapshot"
    if not sinks.snapshot_exists(spark, snap):
        shift = 200_000
        parts = [
            ix100.withColumn("cid", F.col("cid") + F.lit(k * shift))
            for k in range(repl)
        ]
        big = parts[0]
        for p in parts[1:]:
            big = big.unionByName(p)
        big.write.mode("overwrite").parquet(f"{big_root}/batches/batch_id=0")
        compact_ann_index(
            spark, f"{big_root}/batches", snap, cluster_files=max(8, kc // 4)
        )

    queries = emb.filter(F.col("vec_id") < qs.N_QUERIES)

    def probe_topk(index) -> None:
        S.ivf_pq_topk(
            queries, emb, "vec_id", "vec_id", "embedding", "embedding",
            k=10, nprobe=qs.NPROBE, centroids=cents, codebooks=books,
            rerank=50, dim=qs.DIM, index=index,
        ).write.format("noop").mode("overwrite").save()

    def plain() -> None:
        probe_topk(sinks.read_snapshot(spark, snap))

    def pruned() -> None:
        S.ivf_pq_topk(
            queries, emb, "vec_id", "vec_id", "embedding", "embedding",
            k=10, nprobe=qs.NPROBE, centroids=cents, codebooks=books,
            rerank=50, dim=qs.DIM,
            index_pruner=lambda cc: sinks.read_snapshot_pruned_in(
                spark, snap, "cent", cc
            ),
        ).write.format("noop").mode("overwrite").save()

    full_df = sinks.read_snapshot(spark, snap)
    lists = S.probed_cent_values(queries, "vec_id", "embedding", cents, qs.NPROBE)
    pruned_df = sinks.read_snapshot_pruned_in(spark, snap, "cent", lists)
    n_files, n_opened = len(full_df.inputFiles()), len(pruned_df.inputFiles())
    rows_full, rows_pruned = full_df.count(), pruned_df.count()

    plain()  # warm both paths' plans/JIT
    pruned()
    tp, tq = _median(plain, 3), _median(pruned, 3)
    print(
        f"| {repl}00× synth ({rows_full} rows) | {kc} | {n_files} | {n_opened} "
        f"| {rows_pruned} | {tp:.2f} | {tq:.2f} |"
    )
    print(f"pruned/plain at {repl}00x-size artifact = {tq / tp:.2f}x")
    spark.stop()


if __name__ == "__main__":
    main()
