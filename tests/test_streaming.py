"""Structured Streaming forms vs their batch correctness proxies
(SURVEY §7: keep streaming a thin layer over batch-tested expressions)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from echem_dft_etl_spark.operators.sessions import session_aggregate, sessionize
from echem_dft_etl_spark.sources import load_table
from echem_dft_etl_spark.streaming.windows import (
    read_events_stream,
    run_to_memory,
    session_windows,
    tumbling_counts,
)
from tests.conftest import SF_SMOKE


def test_stream_tumbling_equals_batch(spark):
    stream = tumbling_counts(read_events_stream(spark, SF_SMOKE), "1 hour", "2 hours")
    got = {
        (r.window_start, r.event_type): r.n_events
        for r in run_to_memory(stream, spark, mode="complete").collect()
    }
    ev = load_table(spark, SF_SMOKE, "events")
    exp = {
        (r.ws, r.event_type): r.n
        for r in ev.groupBy(
            F.date_trunc("hour", "ts").alias("ws"), "event_type"
        ).agg(F.count("*").alias("n")).collect()
    }
    assert got == exp


def test_stream_sessions_subset_of_batch(spark):
    """Append-mode session windows emit exactly the sessions closed by
    the final watermark; every emitted session must match the batch
    sessionization (window end = last event + gap)."""
    stream = session_windows(read_events_stream(spark, SF_SMOKE), "30 minutes", "2 hours")
    emitted = run_to_memory(stream, spark, mode="append").collect()
    assert len(emitted) > 0

    ev = load_table(spark, SF_SMOKE, "events")
    batch = session_aggregate(
        sessionize(ev, "user_id", "ts", 30.0, tie_col="event_id"), "user_id", "ts"
    ).collect()
    gap = dt.timedelta(minutes=30)
    batch_set = {
        (r.user_id, r.start_ts, r.end_ts + gap, r.n_events) for r in batch
    }
    emitted_set = {
        (r.user_id, r.session_start, r.session_end, r.n_events) for r in emitted
    }
    assert emitted_set <= batch_set
    # The watermark withholds only the tail: sessions ending well before
    # max(ts) - 2h must all have been emitted.
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    horizon = max_ts - dt.timedelta(hours=2, minutes=1)
    closed = {t for t in batch_set if t[2] < horizon}
    assert closed <= emitted_set
