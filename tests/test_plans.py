"""Scale guardrails: pin the physical-plan properties each operator relies
on at 100 TB — pushdown, pruning, shuffle counts, broadcasts.  A change
that silently adds an Exchange or widens a scan fails here."""

from __future__ import annotations

from msgraphdatapipelines_spark import plans
from msgraphdatapipelines_spark.queries import dedup as qd
from msgraphdatapipelines_spark.queries import graphops as qg
from msgraphdatapipelines_spark.queries import relational as qr


def test_filter_project_pushes_down(spark, sf_dir):
    df = qr.filter_project(spark, sf_dir)
    fs = " ".join(plans.pushed_filters(df))
    assert "l_returnflag" in fs and "l_quantity" in fs
    (cols,) = plans.scan_columns(df)
    assert set(cols) == {"l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_shipdate"}


def test_exclude_prunes_scan(spark, sf_dir):
    (cols,) = plans.scan_columns(qg.graph_exclude_columns(spark, sf_dir))
    assert cols == ["s_suppkey", "s_name"]


def test_latest_event_single_shuffle(spark, sf_dir):
    """max_by argmax = one hash shuffle; the explode+window alternative
    would add a sort-shuffle — pinned so nobody 'simplifies' it back."""
    df = qr.latest_event_per_user(spark, sf_dir)
    assert plans.num_exchanges(df) == 1


def test_argmax_array_single_shuffle(spark, sf_dir):
    """Array-native T2: the only shuffle is the collect_list groupBy; the
    per-row argmax itself is narrow."""
    df = qg.graph_argmax_lines(spark, sf_dir)
    assert plans.num_exchanges(df) == 1


def test_revenue_join_broadcasts_dims(spark, sf_dir):
    df = qr.revenue_by_region(spark, sf_dir)
    assert plans.num_broadcasts(df) >= 2  # nation + region explicitly broadcast


def test_pricing_summary_partial_agg_one_exchange(spark, sf_dir):
    df = qr.pricing_summary(spark, sf_dir)
    assert plans.num_exchanges(df) == 1
    plan = plans.physical_plan(df)
    assert "partial" in plan.lower()  # map-side combine before the shuffle


def test_conform_prunes_unreferenced_columns(spark, sf_dir):
    """P5 conform drops c_mktsegment — pruning must reach the scan."""
    df = qg.graph_conform_schema(spark, sf_dir)
    (cols,) = plans.scan_columns(df)
    assert "c_mktsegment" not in cols


def test_exact_dedup_single_shuffle(spark, sf_dir):
    df = qd.dedup_exact(spark, sf_dir)
    assert plans.num_exchanges(df) == 1
