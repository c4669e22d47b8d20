"""Plan-lint gate over the driver-graded query surface (r11, r10 VERDICT
item 4).

Every driver-graded query must build a physical plan free of the
linter's error-severity scale hazards (non-scalar nested-loop joins,
data-sized single-partition exchanges) except the explicitly waived
brute-force rungs in tests/lint_waivers.py.  The DEMOTED rows get the
identical check inside tests/test_demoted_oracles.py, on the DataFrame
that gate already constructs — splitting this way lints all 158+ rows
while constructing each query exactly once per suite run.

The gate fails BOTH ways (see lint_waivers.check_lint): a new un-waived
hazard fails, and a stale waiver fails.
"""

from __future__ import annotations

from lint_waivers import WAIVERS, check_lint

from msgraphdatapipelines_spark.queries import DEMOTED, REGISTRY, _ensure_loaded

_ensure_loaded()


def test_waiver_names_resolve():
    rows = set(REGISTRY) | set(DEMOTED)
    unknown = [n for n in WAIVERS if n not in rows]
    assert not unknown, f"waivers for unregistered queries: {unknown}"


def test_every_graded_query_plan_passes_lint(spark, sf_dir):
    for name in sorted(REGISTRY):
        q = REGISTRY[name]
        if "streaming" in q.fn.__module__:
            continue  # construction executes a stream; plans are memory-sink scans
        check_lint(name, q.fn(spark, sf_dir))


def test_doc_surface_counts_match_runtime_registry():
    """r12 (the recurring doc-drift item, now machine-enforced): every
    count README/COVERAGE state for the query surface must equal the
    runtime registry — the stale-count class of finding (r10 README:453,
    r11 158-vs-160) can no longer recur silently."""
    from msgraphdatapipelines_spark.queries import DEMOTED, REGISTRY

    from pathlib import Path

    n_reg, n_dem = len(REGISTRY), len(DEMOTED)
    total = n_reg + n_dem
    root = Path(__file__).resolve().parents[1]  # cwd-independent (par runner)
    for path in (root / "README.md", root / "COVERAGE.md"):
        text = path.read_text(encoding="utf-8")
        claim = f"{total} oracle-checked queries"
        assert claim in text, (
            f"{path} does not state '{claim}' (registry: {n_reg} graded "
            f"+ {n_dem} demoted) — update the doc or the registry"
        )
        assert f"{n_reg} driver-graded" in text
