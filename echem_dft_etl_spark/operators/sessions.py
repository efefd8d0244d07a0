"""Sessionization and event-window operators (batch form, SURVEY X9).

Gap-based sessionization is the classic two-window composition:

1. ``lag(ts)`` per user ordered by time → boundary flag where the gap
   exceeds the threshold;
2. running ``sum`` of boundary flags → session index per user.

Both windows share one partitioning (``user``), so Spark plans a single
shuffle + sort, reused by both window operators. At 100 TB the state per
partition is one row (the previous timestamp / running count) — this
formulation streams through sorted runs and never materializes a
per-user buffer, unlike ``collect_list``-style approaches.

The streaming variants (``session_window`` + watermark) live in
``streaming/windows.py``; this batch form is the correctness proxy the
DuckDB oracle can check (SURVEY §7 risk note on streaming state).
"""

from __future__ import annotations

from .guards import require_at_least
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
    tie_col: str | None = None,
) -> DataFrame:
    """Assign 1-based ``session_id`` per key using a max-gap rule.

    ``tie_col`` breaks exact-timestamp ties so the ordering (and thus the
    session assignment) is total and engine-independent.
    """
    require_at_least("gap_minutes", gap_minutes, 1e-9)
    order = [F.col(ts_col)] + ([F.col(tie_col)] if tie_col else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    # Compare in timestamp+interval space (exact µs integer arithmetic in
    # both Spark and SQL oracles) rather than float epoch seconds.
    prev = F.lag(F.col(ts_col)).over(w)
    gap = F.expr(f"INTERVAL {int(gap_minutes * 60)} SECONDS")
    boundary = F.when(
        prev.isNull() | (F.col(ts_col) > prev + gap), F.lit(1)
    ).otherwise(F.lit(0))
    running = Window.partitionBy(key_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("_boundary", boundary).withColumn(
        "session_id", F.sum("_boundary").over(running).cast("bigint")
    ).drop("_boundary")


def session_aggregate(
    sessions: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_cents: Column | None = None,
) -> DataFrame:
    """Collapse sessionized rows to one row per (key, session_id)."""
    aggs = [
        F.count("*").alias("n_events"),
        F.min(ts_col).alias("start_ts"),
        F.max(ts_col).alias("end_ts"),
    ]
    if value_cents is not None:
        aggs.append(F.sum(value_cents).alias("sum_value_cents"))
    return sessions.groupBy(key_col, "session_id").agg(*aggs)


def tumbling_window_agg(
    df: DataFrame,
    ts_col: str = "ts",
    width: str = "1 hour",
    group_extra: list[str] | None = None,
) -> DataFrame:
    """Tumbling-window aggregation in batch via ``window()`` (X9).

    Returns (window_start, window_end, [extra keys], n_events): the same
    grouping Structured Streaming produces for the streaming variant, so
    batch results replay-check the stream (SURVEY §7).
    """
    keys = [F.window(F.col(ts_col), width).alias("w")] + [
        F.col(c) for c in (group_extra or [])
    ]
    out = df.groupBy(*keys).agg(F.count("*").alias("n_events"))
    return out.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *(group_extra or []),
        "n_events",
    )


def sessionize_dynamic(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: Column | None = None,
    tie_col: str | None = None,
) -> DataFrame:
    """Sessionization with a PER-ROW gap threshold (the dynamic-gap
    form Spark's streaming ``session_window`` also supports): a new
    session starts when the gap from the previous event exceeds the
    CURRENT row's ``gap_seconds`` — e.g. error events tolerating a
    shorter inactivity window than purchases. Same single
    shuffle+sort plan as :func:`sessionize`; the threshold becomes
    data instead of a constant, which is what real session semantics
    (per-channel, per-user-tier timeouts) need at scale."""
    if gap_seconds is None:
        gap_seconds = F.lit(1800)
    order = [F.col(ts_col)] + ([F.col(tie_col)] if tie_col else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    prev = F.lag(F.col(ts_col)).over(w)
    gap_us = (gap_seconds.cast("bigint") * F.lit(1_000_000)).cast("bigint")
    delta_us = (
        F.unix_micros(F.col(ts_col)) - F.unix_micros(prev)
    )
    boundary = F.when(prev.isNull() | (delta_us > gap_us), F.lit(1)).otherwise(
        F.lit(0)
    )
    running = Window.partitionBy(key_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        df.withColumn("_boundary", boundary)
        .withColumn(
            "session_id", F.sum("_boundary").over(running).cast("bigint")
        )
        .drop("_boundary")
    )


def merge_intervals(
    df: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
    tie_col: str,
) -> DataFrame:
    """Assign a 1-based ``block_id`` per key that merges overlapping or
    touching ``[start, end]`` intervals (interval-union coverage — the
    outage-window / speaker-overlap / availability-SLA primitive).

    Distinct from gap sessionization: intervals carry VARIABLE lengths,
    so the cut test must compare each start against the cumulative MAX
    of all previous ends — a long early interval can swallow several
    later short ones, which a lag-based gap rule would wrongly split.

    A row starts a new block iff its start exceeds the running maximum
    end of every earlier interval of the same key (order: start, then
    ``tie_col`` for a total, engine-independent order). One
    shuffle+sort on the key — the same plan shape as sessionize; the
    two windows share a single (partition, order) sort.
    """
    order = [F.col(start_col), F.col(tie_col)]
    prev_max_end = F.max(F.col(end_col)).over(
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    boundary = F.when(
        prev_max_end.isNull() | (F.col(start_col) > prev_max_end), F.lit(1)
    ).otherwise(F.lit(0))
    running = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn("_boundary", boundary).withColumn(
        "block_id", F.sum("_boundary").over(running).cast("bigint")
    ).drop("_boundary")
