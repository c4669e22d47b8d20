"""Plan-lint gate over the ENTIRE query surface (r11, r10 VERDICT item 4).

Every registered query — driver-graded and demoted — must build a physical
plan free of the linter's error-severity scale hazards (non-scalar
nested-loop joins, data-sized single-partition exchanges), except the
explicitly waived brute-force rungs below.  The linter itself proves the
benign shapes (1-row broadcast totals, two-phase global aggregates), so a
waiver here means "this query is DELIBERATELY quadratic/global and has a
documented production twin".

The gate fails BOTH ways: a new un-waived hazard fails (a regression
added a bad plan), and an unused waiver fails (the hazard was fixed —
delete the stale waiver so the gate stays tight).
"""

from __future__ import annotations

from msgraphdatapipelines_spark import plans
from msgraphdatapipelines_spark.queries import DEMOTED, REGISTRY, _ensure_loaded

_ensure_loaded()

# query name -> {rule: reason}.  Reasons are load-bearing documentation:
# each names the production twin or the bounded build side.
WAIVERS: dict[str, dict[str, str]] = {
    "ann_bruteforce_topk": {
        "cartesian-product": "deliberate exact-scoring baseline: broadcast(query set) x corpus, "
        "linear in corpus by design; production twin = ann_kmeans_ivf_topk / ann_topk_served",
    },
    "ann_pq_topk": {
        "cartesian-product": "ADC table build joins broadcast(query set) against centroids "
        "(model-sized, k x m codebooks); corpus side is equi-joined",
    },
    "ann_srp_rerank_topk": {
        "cartesian-product": "exact rerank of the SRP-bucketed candidate set: "
        "broadcast(query set) x candidates (already bucket-pruned)",
    },
    "ann_mmr_rerank": {
        "cartesian-product": "MMR greedy selection: k iterations over the top-N candidate "
        "pool (N<=200, model-sized) - the loop is candidate-bounded, never corpus-bounded",
    },
    "ann_recall_at_k": {
        "cartesian-product": "evaluation harness: ground truth IS the brute-force scorer; "
        "quadratic by definition of the metric",
    },
    "hard_negative_mining": {
        "cartesian-product": "broadcast(query set) x corpus scoring to rank near-miss "
        "negatives; bounded by the training-query set size",
    },
    "hybrid_search_rrf": {
        "cartesian-product": "legacy corpus-scan variant kept as the served path's "
        "correctness twin; production twin = hybrid_search_rrf_served (artifact probes)",
    },
    "nb_langid_classifier": {
        "cartesian-product": "scoring joins broadcast(trained model: classes x vocab, "
        "model-sized) against documents with a non-equi containment predicate",
    },
    "ab_test_chi2": {
        "single-partition-exchange": "grand-total window over the CONTINGENCY-CELL table "
        "(|arms| x |event types| rows, model-sized) - not a data-sized funnel",
    },
}


def test_every_registered_query_plan_passes_lint(spark, sf_dir):
    rows = {**REGISTRY, **DEMOTED}
    violations: list[str] = []
    used: set[tuple[str, str]] = set()
    for name in sorted(rows):
        q = rows[name]
        if "streaming" in q.fn.__module__:
            continue  # construction executes a stream; plans are memory-sink scans
        df = q.fn(spark, sf_dir)
        for f in plans.lint(df):
            if f["severity"] != "error":
                continue
            reason = WAIVERS.get(name, {}).get(f["rule"])
            if reason:
                used.add((name, f["rule"]))
            else:
                violations.append(f"{name}: {f['rule']} - {f['detail']}")
    assert not violations, "un-waived plan hazards:\n" + "\n".join(violations)
    stale = {
        (n, r) for n, rules in WAIVERS.items() for r in rules
    } - used
    assert not stale, f"stale waivers (hazard no longer present - delete them): {stale}"
