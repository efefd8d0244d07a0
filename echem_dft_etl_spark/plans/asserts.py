"""Assertions over physical plans — scale properties as test predicates.

Each assertion raises ``AssertionError`` with the offending plan
attached, so a regression that silently de-optimizes a query (a filter
that stops pushing, a dim join that falls back to sort-merge) fails the
suite with the evidence inline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .inspect import (
    exchange_count,
    physical_plan,
    pushed_filters,
    read_schema,
    wholestage_span_count,
)


def assert_pushed_filters(df: DataFrame, columns: list[str]) -> None:
    """Every named column appears in a predicate pushed into the scan."""
    pushed = " ".join(pushed_filters(df))
    missing = [c for c in columns if c not in pushed]
    assert not missing, (
        f"filters on {missing} not pushed to scan; pushed=[{pushed}]\n"
        f"{physical_plan(df)}"
    )


def assert_read_columns(
    df: DataFrame,
    present: list[str] | None = None,
    absent: list[str] | None = None,
) -> None:
    """The parquet read set contains ``present`` and excludes ``absent``."""
    cols = set(read_schema(df))
    miss = [c for c in (present or []) if c not in cols]
    extra = [c for c in (absent or []) if c in cols]
    assert not miss and not extra, (
        f"read-set mismatch: missing={miss} unexpected={extra} read={sorted(cols)}\n"
        f"{physical_plan(df)}"
    )


def assert_broadcast_join(df: DataFrame, count: int | None = None) -> None:
    """At least one (or exactly ``count``) broadcast hash join planned."""
    plan = physical_plan(df)
    n = plan.count("BroadcastHashJoin")
    ok = n >= 1 if count is None else n == count
    assert ok, f"expected {'>=1' if count is None else count} broadcast joins, got {n}\n{plan}"


def assert_no_sort_merge_join(df: DataFrame) -> None:
    """Dimension-sized joins must not shuffle both sides."""
    plan = physical_plan(df)
    assert "SortMergeJoin" not in plan, f"unexpected SortMergeJoin\n{plan}"


def assert_no_cartesian_product(df: DataFrame) -> None:
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, f"unexpected CartesianProduct\n{plan}"


def assert_single_shuffle_agg(df: DataFrame) -> None:
    """Partial+final hash aggregation around exactly one exchange.

    The canonical large-aggregation shape: map-side combine, one
    shuffle on the group key, final combine — anything more re-shuffles
    the fact table.
    """
    plan = physical_plan(df)
    assert "partial" in plan.lower(), f"no partial aggregation\n{plan}"
    n = exchange_count(df)
    assert n <= 1, f"expected <=1 shuffle exchange, got {n}\n{plan}"


def assert_wholestage_codegen(df: DataFrame, min_spans: int = 1) -> None:
    """The hot path is fused into >= ``min_spans`` codegen spans."""
    n = wholestage_span_count(df)
    assert n >= min_spans, (
        f"expected >= {min_spans} WholeStageCodegen spans, got {n}\n"
        f"{physical_plan(df)}"
    )
