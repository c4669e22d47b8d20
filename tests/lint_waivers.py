"""Shared waiver list for the plan-lint gate (r11, r10 VERDICT item 4).

query name -> {rule: reason}.  Reasons are load-bearing documentation:
each names the production twin or the bounded build side.  Enforcement is
split across two suites with the SAME semantics (un-waived error fails;
a waiver whose hazard no longer fires fails as stale):

- tests/test_lint_gate.py lints the 50 driver-graded rows (it must
  construct them anyway);
- tests/test_demoted_oracles.py lints each demoted row on the DataFrame
  it already built for the oracle comparison — zero extra construction.
"""

from __future__ import annotations

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


def check_lint(name: str, df) -> None:
    """Assert the lint contract for one query's DataFrame: every
    error-severity finding is waived, and every waiver for this query
    matches a live finding (per-row staleness)."""
    from msgraphdatapipelines_spark import plans

    findings = [f for f in plans.lint(df) if f["severity"] == "error"]
    fired = {f["rule"] for f in findings}
    waived = set(WAIVERS.get(name, {}))
    unwaived = [f for f in findings if f["rule"] not in waived]
    assert not unwaived, f"{name}: un-waived plan hazards: {unwaived}"
    stale = waived - fired
    assert not stale, f"{name}: stale waivers (hazard gone - delete): {stale}"
