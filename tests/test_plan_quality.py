"""Physical-plan regression tests — the plan *shape* is part of the spec.

At 100 TB the difference between BroadcastHashJoin and a shuffled join, or
between a pruned and a full scan, is the difference between minutes and
days. These tests pin the plan properties the engine is designed around so
a refactor can't silently regress them (SURVEY.md §4).
"""

from __future__ import annotations

import pytest

from weather_data_pipeline_sv_spark.catalog import all_queries

QUERIES = all_queries()


def _plan(spark, sf_dir, name: str) -> str:
    return (
        QUERIES[name](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )


def test_dim_join_broadcasts(spark, sf_dir):
    plan = _plan(spark, sf_dir, "j1_broadcast_dim_join")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_range_join_is_broadcast_nl_not_cartesian(spark, sf_dir):
    # tiny build side -> BroadcastNestedLoopJoin is the intended physical
    # strategy for the theta join (a shuffled CartesianProduct is the bug)
    plan = _plan(spark, sf_dir, "j2_idw_range_join")
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_grid_spatial_join_never_cartesian(spark, sf_dir):
    plan = _plan(spark, sf_dir, "j7_grid_spatial_join")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_static_filter_pushed_to_parquet_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "p8_bbox_filter")
    assert "PushedFilters: [" in plan
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert "GreaterThan" in pushed or "LessThan" in pushed, pushed


def test_flagship_agg_prunes_columns(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q1_pricing_summary")
    # q1 touches 8 of 11 lineitem columns; the join keys it does NOT need
    # must not reach the scan
    for unused in ("l_partkey", "l_suppkey", "l_orderkey"):
        assert unused not in plan, f"{unused} not pruned from scan"


def test_flagship_agg_is_partial_plus_final(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q1_pricing_summary")
    assert plan.count("HashAggregate") >= 2  # map-side combine + final


def test_global_topk_avoids_full_sort(spark, sf_dir):
    plan = _plan(spark, sf_dir, "o1_topk_orders")
    assert "TakeOrderedAndProject" in plan


def test_whole_stage_codegen_covers_core_plans(spark, sf_dir):
    # AQE's initial plan hides codegen wrapping — execute, then read the
    # final plan
    for name in ("q1_pricing_summary", "a1_hourly_rollup", "p2_completeness_filter"):
        df = QUERIES[name](spark, sf_dir)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        # codegen stages print as "*(n) Operator" in the final plan
        assert "WholeStageCodegen" in plan or "*(" in plan, name


@pytest.mark.parametrize(
    "name",
    sorted(n for n in QUERIES if not n.startswith(("m", "v1", "v3", "v4"))),
)
def test_no_accidental_cartesian_anywhere(spark, sf_dir, name):
    """No catalog query may contain an unintended cartesian product.
    (m*/v* excluded where a deliberate broadcast-NL over a tiny side or a
    pandas stage makes the check meaningless; v5/j2 broadcast-NL is the
    intended plan — only CartesianProduct, the shuffled O(N*M), is barred.)
    """
    assert "CartesianProduct" not in _plan(spark, sf_dir, name)
