"""Per-oracle peak-memory audit for the graded DuckDB lane (r14, r13
VERDICT item 1: the r13 graded run lost 26/50 rows to driver-host DuckDB
OOMs — environmental, but the cheapest insurance we control is knowing
exactly how much memory each oracle needs and keeping that budget small
and documented).

Every oracle runs in its OWN forked subprocess on a FRESH connection
under an explicit ``memory_limit``, and the child reports its own peak
RSS (``ru_maxrss``) — so rows can't inflate each other's numbers through
a shared buffer pool and a genuinely oversized oracle is identified by
name instead of poisoning the run.  Usage:

    python tools/oracle_memory_audit.py [sf_dir] [--demoted] [--limit 4GB] [query ...]

Prints one line per row (peak RSS MB, rowcount, wall) sorted by RSS
descending, plus a summary suitable for PERF.md.
"""

from __future__ import annotations

import json
import subprocess
import sys

CHILD = r"""
import json, resource, sys, time
import duckdb

sf_dir, limit, oracle = sys.argv[1], sys.argv[2], sys.stdin.read()
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
con = duckdb.connect()
con.execute("SET TimeZone='UTC'")
con.execute(f"SET memory_limit='{limit}'")
con.execute("SET threads=4")
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
t0 = time.monotonic()
try:
    df = con.execute(oracle).fetchdf()
    out = {"ok": True, "rows": len(df), "wall_s": round(time.monotonic() - t0, 2)}
except Exception as e:
    out = {"ok": False, "err": f"{type(e).__name__}: {e}"[:300],
           "wall_s": round(time.monotonic() - t0, 2)}
out["peak_rss_mb"] = round(resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024, 1)
print(json.dumps(out))
"""


def main() -> int:
    argv = sys.argv[1:]
    use_demoted = "--demoted" in argv
    argv = [a for a in argv if a != "--demoted"]
    limit = "4GB"
    if "--limit" in argv:
        i = argv.index("--limit")
        limit = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    sys.path.insert(0, ".")
    from msgraphdatapipelines_spark.queries import DEMOTED, REGISTRY, _ensure_loaded

    _ensure_loaded()
    registry = DEMOTED if use_demoted else REGISTRY
    results = []
    for name, q in sorted(registry.items()):
        if only and name not in only:
            continue
        if q.oracle is None:
            continue
        proc = subprocess.run(
            [sys.executable, "-c", CHILD, sf_dir, limit],
            input=q.oracle,
            capture_output=True,
            text=True,
            timeout=600,
        )
        try:
            out = json.loads(proc.stdout.strip().splitlines()[-1])
        except (json.JSONDecodeError, IndexError):
            out = {"ok": False, "err": (proc.stderr or "no output")[-300:],
                   "peak_rss_mb": None, "wall_s": None}
        out["name"] = name
        results.append(out)

    results.sort(key=lambda r: -(r.get("peak_rss_mb") or 1e9))
    bad = [r for r in results if not r["ok"]]
    print(f"# oracle memory audit  sf={sf_dir}  memory_limit={limit}  "
          f"rows={len(results)}  failures={len(bad)}")
    print(f"{'row':44s} {'peakMB':>7s} {'rows':>7s} {'wall_s':>7s}")
    for r in results:
        if r["ok"]:
            print(f"{r['name']:44s} {r['peak_rss_mb']:7.0f} {r['rows']:7d} {r['wall_s']:7.1f}")
        else:
            print(f"{r['name']:44s} {'FAIL':>7s}  {r['err']}")
    oks = [r["peak_rss_mb"] for r in results if r["ok"]]
    if oks:
        print(f"\nmax={max(oks):.0f} MB  p50={sorted(oks)[len(oks)//2]:.0f} MB  "
              f"sum-if-serial-worst-case={max(oks):.0f} MB (fresh conn per row)")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
