"""Physical-plan assertions: the scale properties SURVEY §4 promises
(pushdown, pruning, broadcast strategy, codegen) must be visible in
``explain`` output, not assumed."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from echem_dft_etl_spark.registry import all_queries
from echem_dft_etl_spark.sources import load_table
from tests.conftest import SF_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark):
    df = all_queries()["q01_pushdown_scan"].fn(spark, SF_SMOKE)
    plan = _plan(df)
    assert "PushedFilters:" in plan
    pushed = plan.split("PushedFilters:")[1].split("]")[0]
    assert "l_shipdate" in pushed and "l_quantity" in pushed, pushed


def test_column_pruning_reaches_scan(spark):
    df = all_queries()["q01_pushdown_scan"].fn(spark, SF_SMOKE)
    read_schema = _plan(df).split("ReadSchema:")[1].splitlines()[0]
    # Only the 5 projected/filtered columns are read off parquet.
    assert "l_extendedprice" in read_schema
    assert "l_returnflag" not in read_schema
    assert "l_comment" not in read_schema


def test_keylist_scan_pushes_in_filter(spark):
    df = all_queries()["q02_keylist_scan"].fn(spark, SF_SMOKE)
    assert re.search(r"PushedFilters:.*In\(p_partkey", _plan(df)), _plan(df)


def test_dim_joins_are_broadcast(spark):
    for name in ("q17_multi_join", "echem_flagship"):
        plan = _plan(all_queries()[name].fn(spark, SF_SMOKE))
        assert "BroadcastHashJoin" in plan, f"{name} should broadcast dims"
        assert "SortMergeJoin" not in plan, f"{name} must not sort-merge dims"


def test_flagship_single_shuffle_agg(spark):
    """The flagship fit is partial-agg -> one exchange -> final agg;
    no window, no extra shuffle before the dim joins."""
    plan = _plan(all_queries()["echem_flagship"].fn(spark, SF_SMOKE))
    assert "partial" in plan.lower()
    fact_section = plan.split("BroadcastHashJoin")[-1]
    assert "Window" not in plan


def test_whole_stage_codegen_covers_scan_filter(spark):
    plan = _plan(all_queries()["q08_scalar_arithmetic"].fn(spark, SF_SMOKE))
    # '*(n)' prefixes mark operators fused into a WholeStageCodegen span.
    assert "WholeStageCodegen" in plan or re.search(r"\*\(\d+\)", plan), plan


def test_range_join_is_broadcast_nested_loop(spark):
    plan = _plan(all_queries()["x05_range_join"].fn(spark, SF_SMOKE))
    assert "BroadcastNestedLoopJoin" in plan


def test_topk_avoids_global_sort(spark):
    plan = _plan(all_queries()["x01_topk_orders"].fn(spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in plan, plan


def test_nested_pruning_on_struct_projection(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    df = ev.select(F.struct("user_id", "event_type").alias("s")).select("s.user_id")
    read_schema = _plan(df).split("ReadSchema:")[1].splitlines()[0]
    assert "event_type" not in read_schema
