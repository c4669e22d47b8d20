"""100× scaling sweep runner — the PERF.md protocol, automated.

Builds the scaled dir with tools/make_scaled.py if absent, runs the
graded registry at sf0.1 and at K× (BENCH_RUNS=1, documented-quadratic
rows excluded), and prints a markdown ratio table sorted worst-first —
the artifact the PERF.md sweep sections record.

Usage:
    SPARK_GRAFT_DRIVER_MEM=64g python tools/sweep.py [K] [--only q1,q2]

Protocol notes (PERF.md "Measurement protocol"): this is the SWEEP
protocol (single run, big heap), not the registry protocol — ratios are
comparative evidence for scale behavior, not 2×-rule inputs.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
QUADRATIC = {"dedup_ngram_jaccard"}  # documented baseline, excluded by design


def bench(sf_dir: str, only: str | None) -> dict[str, float]:
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=sf_dir,
        BENCH_RUNS="1",
        BENCH_SKIP=",".join(QUADRATIC),
    )
    # SWEEP_INCLUDE_DEMOTED=1 sweeps the pytest-gated rows too (PERF.md
    # late-r6 protocol); the graded-only default is unchanged
    if os.environ.get("SWEEP_INCLUDE_DEMOTED"):
        env["BENCH_INCLUDE_DEMOTED"] = "1"
    
    if only:
        env["BENCH_ONLY"] = only
    out = subprocess.run(
        [sys.executable, str(ROOT / "bench.py")],
        env=env, capture_output=True, text=True, check=True,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)["queries"]


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 100
    only = None
    if "--only" in sys.argv:
        only = sys.argv[sys.argv.index("--only") + 1]
    base_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    scaled = ROOT / ".tmp" / f"sf_sweep_{k}x"
    if not scaled.exists():
        subprocess.run(
            [sys.executable, str(ROOT / "tools/make_scaled.py"), base_dir, str(scaled), str(k)],
            check=True,
        )
    small = bench(base_dir, only)
    big = bench(str(scaled), only)
    rows = sorted(
        ((q, small[q], big[q], big[q] / max(small[q], 1e-9)) for q in big if q in small),
        key=lambda r: -r[3],
    )
    print(f"\n| query | sf0.1 s | {k}× s | ratio |")
    print("|---|---|---|---|")
    for q, s, b, r in rows:
        print(f"| {q} | {s:.2f} | {b:.1f} | {r:.1f}× |")
    total_s, total_b = sum(small[q] for q, *_ in rows), sum(b for _, _, b, _ in rows)
    print(f"| **suite** | **{total_s:.1f}** | **{total_b:.0f}** | **{total_b/total_s:.1f}×** |")


if __name__ == "__main__":
    main()
