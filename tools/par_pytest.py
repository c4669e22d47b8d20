"""Parallel full-suite runner (late r12 — the suite-wall lever the r11/r12
triage recorded: the 15-17 min full gate is ~60% per-job Spark scheduling
latency across ~400 tiny jobs in ONE session, so threads don't help;
SESSIONS do).

Shards the test modules across N worker processes, each a plain ``pytest``
invocation with its own JVM — and, critically, its own isolation bubble:

- ``TMPDIR=<scratch>/tmp<i>``: every standing artifact the engine keys
  into ``tempfile.gettempdir()`` (IVF+PQ snapshots, prefix-gram index,
  result cache, CM sketches, bucketed/zonemap/Bloom warehouse roots)
  lands in a per-worker directory — two workers can never race one
  artifact's publish protocol, because they never share a root;
- ``cwd=<scratch>/cwd<i>``: ``spark-warehouse``/``derby.log``-class
  cwd droppings stay per-worker;
- ``SPARK_GRAFT_TEST_CPUS`` splits the host threads across workers.

The isolation trade is honest: shared artifacts get rebuilt once per
worker that needs them (a few seconds each at fixture scale) — the price
of never exercising cross-process races the two-builder tests already
cover in-process.

Scheduling is longest-first (LPT) over per-module durations measured on
the PREVIOUS run (``tools/module_durations.json``, refreshed from each
run's junit output — first run falls back to recorded estimates), one
pytest invocation per worker so each JVM starts once.

Usage:
    python tools/par_pytest.py [-n WORKERS] [pytest args passed through]

Exit status is non-zero if any worker failed; the per-worker tails and a
combined pass/fail summary print at the end.  The serial ``python -m
pytest tests/`` remains the canonical gate; this runner exists for wall
clock, and any failure here reproduces serially.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
import xml.etree.ElementTree as ET
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
DUR_FILE = ROOT / "tools" / "module_durations.json"

# fallback weights for the first run (seconds, from the r12 serial run's
# rough per-module shares); replaced by measured numbers afterwards
_SEED = {
    "test_demoted_oracles": 420,
    "test_operators": 150,
    "test_streaming_stateful": 90,
    "test_streaming": 80,
    "test_similarity": 80,
    "test_curation_pipeline": 60,
    "test_sinks": 60,
    "test_plans": 50,
    "test_pipeline_e2e": 40,
    "test_lint_gate": 30,
    "test_graph_semantics": 20,
    "test_files_and_skew": 20,
    "test_rest_source": 15,
    "test_odata_filter_property": 15,
    "test_auth_and_rest_sink": 10,
}


def _load_durations() -> dict[str, float]:
    if DUR_FILE.exists():
        try:
            return json.loads(DUR_FILE.read_text())
        except Exception:
            pass
    return dict(_SEED)


def _lpt_bins(mods: list[Path], durs: dict[str, float], n: int) -> list[list[Path]]:
    """Longest-processing-time-first greedy: heaviest module to the
    currently lightest bin."""
    bins: list[list[Path]] = [[] for _ in range(n)]
    loads = [0.0] * n
    for m in sorted(mods, key=lambda p: -durs.get(p.stem, 30.0)):
        i = loads.index(min(loads))
        bins[i].append(m)
        loads[i] += durs.get(m.stem, 30.0)
    return [b for b in bins if b]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", "--workers", type=int, default=int(os.environ.get("PAR_WORKERS", "4")))
    args, passthrough = ap.parse_known_args()
    args.rest = passthrough

    mods = sorted((ROOT / "tests").glob("test_*.py"))
    durs = _load_durations()
    bins = _lpt_bins(mods, durs, args.workers)
    cpus = max(2, 32 // max(len(bins), 1))

    scratch = ROOT / ".tmp" / f"par_pytest_{int(time.time())}"
    procs = []
    t0 = time.monotonic()
    for i, group in enumerate(bins):
        tmp_i = scratch / f"tmp{i}"
        cwd_i = scratch / f"cwd{i}"
        tmp_i.mkdir(parents=True)
        cwd_i.mkdir(parents=True)
        env = dict(
            os.environ,
            TMPDIR=str(tmp_i),
            PYTHONPATH=str(ROOT),
            SPARK_GRAFT_TEST_CPUS=str(cpus),
        )
        cmd = [
            sys.executable, "-m", "pytest",
            *[str(m) for m in group],
            "-q", "-p", "no:cacheprovider",
            f"--junitxml={scratch}/junit{i}.xml",
            *args.rest,
        ]
        log = open(scratch / f"worker{i}.log", "w")
        procs.append((i, group, subprocess.Popen(cmd, env=env, cwd=cwd_i, stdout=log, stderr=subprocess.STDOUT), log))
        print(f"worker {i}: {len(group)} modules "
              f"(~{sum(durs.get(m.stem, 30.0) for m in group):.0f}s est): "
              f"{', '.join(m.stem for m in group)}")

    failed = False
    totals = {"tests": 0, "failures": 0, "errors": 0, "skipped": 0}
    measured: dict[str, float] = {}
    for i, group, p, log in procs:
        rc = p.wait()
        log.close()
        if rc not in (0, 5):  # 5 = no tests collected (empty -m filter)
            failed = True
        xml_path = scratch / f"junit{i}.xml"
        if xml_path.exists():
            suite = ET.parse(xml_path).getroot().find("testsuite")
            if suite is not None:
                for k in totals:
                    totals[k] += int(suite.get(k, 0))
                # per-module wall from per-test times (classname is a
                # dotted path like "tests.test_similarity[.TestClass]")
                for case in suite.iter("testcase"):
                    parts = (case.get("classname") or "").split(".")
                    mod = next(
                        (p for p in parts if p.startswith("test_")),
                        parts[0] or "unknown",
                    )
                    measured[mod] = measured.get(mod, 0.0) + float(case.get("time", 0))
        tail = (scratch / f"worker{i}.log").read_text().strip().splitlines()
        print(f"worker {i} rc={rc}: {tail[-1] if tail else '(no output)'}")
        if rc not in (0, 5):
            print("\n".join(l for l in tail if "FAILED" in l or "ERROR" in l)[:4000])

    wall = time.monotonic() - t0
    passed = totals["tests"] - totals["failures"] - totals["errors"] - totals["skipped"]
    print(
        f"\n{passed} passed, {totals['failures']} failed, {totals['errors']} errors, "
        f"{totals['skipped']} skipped in {wall:.0f}s across {len(bins)} workers "
        f"(logs: {scratch})"
    )
    if measured and not failed:
        DUR_FILE.write_text(json.dumps(dict(sorted(measured.items())), indent=1))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
