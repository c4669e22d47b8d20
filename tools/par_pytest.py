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

Modules whose measured duration exceeds ``--split`` seconds are SHARDED
below module granularity: their test ids are collected up front
(``pytest --collect-only``, so new tests are always included and stale
recorded ids can never be scheduled) and LPT-packed into chunks by
per-test durations from the previous run.  Tests within a module must be
order-independent — they already are (the serial suite runs them in
whatever order pytest picks, and per-test fixtures own their state);
session fixtures (the SparkSession) rebuild per process as always.

Scheduling is longest-first (LPT) over durations measured on the
PREVIOUS run (``tools/module_durations.json``, refreshed from each run's
junit output — first run falls back to recorded estimates).

Usage:
    python tools/par_pytest.py [-n WORKERS] [--split SECS] [pytest args]

Exit status is non-zero if any worker failed; per-worker tails and a
combined pass/fail summary print at the end.  The serial ``python -m
pytest tests/`` remains the canonical gate; this runner exists for wall
clock, and any failure here reproduces serially.

LOST WORKERS ARE LOUD (r15, VERDICT item 3): the combined summary used
to aggregate junit files only, so a worker dying BEFORE writing junit
(observed r14: rc=127, dots-only log) printed "0 failed" with ~140
tests silently unrun — the exit code was right, the human-readable line
was not.  Now any worker with rc not in (0, 5) or a missing junit file
is counted and the summary line leads with "N WORKERS FAILED/LOST
(~M tests unaccounted)", M estimated from the scheduled shard ids plus
the previous run's per-module test counts.

Machine-readable gate record (r15, VERDICT item 8): every run writes
``GATE.json`` at the repo root — {passed, failed, errors, skipped,
lost_workers, wall_s, workers, partial, args} — so PROGRESS.jsonl and
judges consume a file, not a log tail.  The serial runner's
equivalent hook lives in tests/conftest.py (suppressed inside par
workers via PAR_PYTEST_WORKER).
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import subprocess
import sys
import time
import xml.etree.ElementTree as ET
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
DUR_FILE = ROOT / "tools" / "module_durations.json"

# fallback module weights for the first run (seconds); replaced by
# measured numbers afterwards
_SEED = {
    "test_operators": 410,
    "test_demoted_oracles": 375,
    "test_similarity": 370,
    "test_lint_gate": 100,
    "test_streaming": 95,
    "test_sinks": 85,
    "test_curation_pipeline": 67,
    "test_plans": 59,
    "test_rest_source": 21,
    "test_streaming_stateful": 13,
    "test_pipeline_e2e": 9,
    "test_odata_filter_property": 8,
    "test_files_and_skew": 6,
    "test_graph_semantics": 4,
    "test_auth_and_rest_sink": 2,
}


def _load_durations() -> tuple[dict[str, float], dict[str, float]]:
    """(per-module, per-test) durations from the previous run; the file
    is either the flat v1 {module: secs} or v2 {"modules": …, "tests": …}."""
    if DUR_FILE.exists():
        try:
            d = json.loads(DUR_FILE.read_text())
            if "modules" in d:
                return dict(d["modules"]), dict(d.get("tests", {}))
            return dict(d), {}
        except Exception:
            pass
    return dict(_SEED), {}


def _collect_ids(mod: Path) -> list[str]:
    """Current test node ids of a module (repo-relative), via pytest's
    collector — so sharding can never skip a new test or schedule a
    renamed-away one."""
    out = subprocess.run(
        [sys.executable, "-m", "pytest", "--collect-only", "-q",
         "-p", "no:cacheprovider", str(mod.relative_to(ROOT))],
        capture_output=True, text=True, cwd=ROOT,
    )
    return [
        line.strip()
        for line in out.stdout.splitlines()
        if "::" in line and not line.startswith(("=", "<", " "))
    ]


def _lpt(items: list[tuple[float, list[str]]], n: int) -> list[list[tuple[float, list[str]]]]:
    bins: list[list[tuple[float, list[str]]]] = [[] for _ in range(n)]
    loads = [0.0] * n
    for est, payload in sorted(items, key=lambda t: -t[0]):
        i = loads.index(min(loads))
        bins[i].append((est, payload))
        loads[i] += est
    return [b for b in bins if b]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", "--workers", type=int,
                    default=int(os.environ.get("PAR_WORKERS", "4")))
    ap.add_argument("--split", type=float, default=240.0,
                    help="shard modules whose measured duration exceeds this")
    ap.add_argument("--target", type=float, default=150.0,
                    help="aim for shards of about this many seconds")
    args, passthrough = ap.parse_known_args()

    mods = sorted((ROOT / "tests").glob("test_*.py"))
    mod_durs, test_durs = _load_durations()

    # work items: (estimated seconds, [pytest args]); heavy modules shard
    items: list[tuple[float, list[str]]] = []
    for m in mods:
        est = mod_durs.get(m.stem, 30.0)
        if args.workers > 1 and est > args.split and not passthrough:
            ids = _collect_ids(m)
            if len(ids) > 1:
                nshards = max(2, math.ceil(est / args.target))
                per_test = [
                    (test_durs.get(i, est / len(ids)), i) for i in ids
                ]
                shards: list[list[str]] = [[] for _ in range(nshards)]
                loads = [0.0] * nshards
                for t, i in sorted(per_test, reverse=True):
                    j = loads.index(min(loads))
                    shards[j].append(i)
                    loads[j] += t
                for j, shard in enumerate(shards):
                    if shard:
                        items.append((loads[j], [str(ROOT / i) for i in shard]))
                continue
        items.append((est, [str(m)]))

    bins = _lpt(items, args.workers)
    cpus = max(2, 32 // max(len(bins), 1))

    # scratch retention (r14, r13 VERDICT item 6): keep only the newest
    # 2 prior run dirs so .tmp growth stays bounded and artifact-size
    # regressions remain visible; sweep corpora (sf_sweep_*) are kept —
    # they are deterministic inputs reused across sweeps, delete by hand
    # (`rm -rf .tmp/sf_sweep_*`) when retiring a scale point.
    old_runs = sorted((ROOT / ".tmp").glob("par_pytest_*"))
    for d in old_runs[:-2]:
        shutil.rmtree(d, ignore_errors=True)
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
            PAR_PYTEST_WORKER="1",  # suppress the worker's own GATE.json
        )
        targets = [a for _, payload in group for a in payload]
        cmd = [
            sys.executable, "-m", "pytest",
            *targets,
            "-q", "-p", "no:cacheprovider",
            f"--junitxml={scratch}/junit{i}.xml",
            *passthrough,
        ]
        log = open(scratch / f"worker{i}.log", "w")
        procs.append((i, subprocess.Popen(
            cmd, env=env, cwd=cwd_i, stdout=log, stderr=subprocess.STDOUT), log))
        est_total = sum(e for e, _ in group)
        print(f"worker {i}: {len(group)} items / {len(targets)} targets "
              f"(~{est_total:.0f}s est)")

    # expected test count per scheduled target, for the unaccounted
    # estimate: sharded targets are single node ids (count 1 each);
    # whole-module targets estimate from the previous run's recorded ids
    per_mod_counts: dict[str, int] = {}
    for nid in test_durs:
        mod = nid.split("::", 1)[0].rsplit("/", 1)[-1].removesuffix(".py")
        per_mod_counts[mod] = per_mod_counts.get(mod, 0) + 1

    def _expected(targets: list[str]) -> int:
        n = 0
        for t in targets:
            if "::" in t:
                n += 1
            else:
                n += per_mod_counts.get(Path(t).stem, 1)
        return n

    worker_targets = {
        i: [a for _, payload in group for a in payload]
        for i, group in enumerate(bins)
    }

    failed = False
    lost_workers: list[int] = []
    unaccounted = 0
    totals = {"tests": 0, "failures": 0, "errors": 0, "skipped": 0}
    meas_mod: dict[str, float] = {}
    meas_test: dict[str, float] = {}
    for i, p, log in procs:
        rc = p.wait()
        log.close()
        if rc not in (0, 5):  # 5 = no tests collected (empty -m filter)
            failed = True
        xml_path = scratch / f"junit{i}.xml"
        reported_i = 0
        if rc not in (0, 5) or not xml_path.exists():
            lost_workers.append(i)
        if xml_path.exists():
            suite = ET.parse(xml_path).getroot().find("testsuite")
            if suite is not None:
                for k in totals:
                    totals[k] += int(suite.get(k, 0))
                reported_i = int(suite.get("tests", 0))
                # classname is a dotted path "tests.test_x[.TestClass]"
                for case in suite.iter("testcase"):
                    parts = (case.get("classname") or "").split(".")
                    mod = next(
                        (p_ for p_ in parts if p_.startswith("test_")),
                        parts[0] or "unknown",
                    )
                    t = float(case.get("time", 0))
                    meas_mod[mod] = meas_mod.get(mod, 0.0) + t
                    # rebuild the repo-relative node id for shard packing
                    idx = parts.index(mod)
                    cls = "::".join(parts[idx + 1:])
                    nid = f"tests/{mod}.py::" + (f"{cls}::" if cls else "") + (
                        case.get("name") or ""
                    )
                    meas_test[nid] = meas_test.get(nid, 0.0) + t
        if i in lost_workers:
            unaccounted += max(0, _expected(worker_targets.get(i, [])) - reported_i)
        tail = (scratch / f"worker{i}.log").read_text().strip().splitlines()
        print(f"worker {i} rc={rc}: {tail[-1] if tail else '(no output)'}")
        if rc not in (0, 5):
            print("\n".join(l for l in tail if "FAILED" in l or "ERROR" in l)[:4000])

    wall = time.monotonic() - t0
    passed = totals["tests"] - totals["failures"] - totals["errors"] - totals["skipped"]
    prefix = ""
    if lost_workers:
        failed = True  # a lost junit means unrun tests even at rc=0
        prefix = (
            f"*** {len(lost_workers)} WORKERS FAILED/LOST "
            f"(~{unaccounted} tests unaccounted; workers {lost_workers}) — "
            f"counts below are INCOMPLETE ***\n"
        )
    print(
        f"\n{prefix}{passed} passed, {totals['failures']} failed, "
        f"{totals['errors']} errors, "
        f"{totals['skipped']} skipped in {wall:.0f}s across {len(bins)} workers "
        f"(logs: {scratch})"
    )
    (ROOT / "GATE.json").write_text(json.dumps({
        "runner": "parallel",
        "passed": passed,
        "failed": totals["failures"],
        "errors": totals["errors"],
        "skipped": totals["skipped"],
        "lost_workers": lost_workers,
        "tests_unaccounted_est": unaccounted,
        "wall_s": round(wall, 1),
        "workers": len(bins),
        "partial": bool(passthrough),
        "args": passthrough,
        "ts": time.time(),
    }) + "\n")
    if meas_mod and not failed and not passthrough:
        DUR_FILE.write_text(json.dumps(
            {"modules": {k: round(v, 1) for k, v in sorted(meas_mod.items())},
             "tests": {k: round(v, 2) for k, v in sorted(meas_test.items())}},
            indent=1,
        ))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
