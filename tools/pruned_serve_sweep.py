"""Probe-list-pushdown SERVE sweep (late r12) — plain vs pruned standing-
index serving at base and scaled corpus.

Both paths serve the identical query (same probe, same ADC, same exact
rerank — equality is oracle-pinned by ann_topk_served_pruned sharing
ann_topk_served's hash); what differs is I/O:

- PLAIN: ``ivf_pq_topk(index=read_snapshot(...))`` scans the whole
  clustered artifact and lets the broadcast probe join drop
  ~(1 - nprobe/n_centroids) of it;
- PRUNED: ``probed_cent_values`` (one query-batch-sized job) pushes the
  probe's list set into ``read_snapshot_pruned_in`` — only the files
  whose zone-map interval holds a probed list open.

Reported per corpus: artifact rows + files, files OPENED by the pruned
read, rows surviving the prune, and the median warm serve wall for each
path.  The build (k-means, encode, clustered compaction) happens OUTSIDE
the timed region — the once-per-corpus-version amortized cost.

Usage:
    python tools/pruned_serve_sweep.py [K]    # default K=100, corpus at
                                              # .tmp/sf_sweep_{K}x

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

from msgraphdatapipelines_spark import sinks  # noqa: E402
from msgraphdatapipelines_spark.operators import similarity as S  # noqa: E402
from msgraphdatapipelines_spark.queries import load  # noqa: E402
from msgraphdatapipelines_spark.queries import similarity as qs  # noqa: E402
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
    # optional explicit scaled dir (e.g. an embeddings-only replication)
    scaled = sys.argv[2] if len(sys.argv) > 2 else str(
        ROOT / ".tmp" / f"sf_sweep_{k_scale}x"
    )
    spark = get_spark("pruned-serve-sweep")
    spark.sparkContext.setLogLevel("ERROR")

    print(
        "| corpus | rows | lists (√n) | artifact files | files opened "
        "| rows after prune | plain s | pruned s |"
    )
    print("|---|---|---|---|---|---|---|---|")
    rows = []
    for sf_dir in (base, scaled):
        emb = load(spark, sf_dir, "embeddings")
        n = emb.count()
        kc = max(8, int(math.sqrt(n)))
        _, cents, books = qs.ensure_standing_index(spark, sf_dir, emb, n_centroids=kc)
        snap = f"{qs.standing_index_root(sf_dir, kc)}/snapshot"
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
            lists = S.probed_cent_values(
                queries, "vec_id", "embedding", cents, qs.NPROBE
            )
            probe_topk(sinks.read_snapshot_pruned_in(spark, snap, "cent", lists))

        full_df = sinks.read_snapshot(spark, snap)
        lists = S.probed_cent_values(queries, "vec_id", "embedding", cents, qs.NPROBE)
        pruned_df = sinks.read_snapshot_pruned_in(spark, snap, "cent", lists)
        n_files, n_opened = len(full_df.inputFiles()), len(pruned_df.inputFiles())
        n_rows_pruned = pruned_df.count()

        tp, tq = _timed(plain), _timed(pruned)
        rows.append((sf_dir, tp, tq))
        print(
            f"| {Path(sf_dir).name} | {n} | {kc} | {n_files} | {n_opened} "
            f"| {n_rows_pruned} | {tp:.2f} | {tq:.2f} |"
        )

    (_, p1, q1), (_, p2, q2) = rows
    print(
        f"\nplain serve grows {p2 / p1:.2f}x at {k_scale}x corpus; "
        f"pruned serve grows {q2 / q1:.2f}x; "
        f"pruned/plain at {k_scale}x = {q2 / p2:.2f}x"
    )
    spark.stop()


if __name__ == "__main__":
    main()
