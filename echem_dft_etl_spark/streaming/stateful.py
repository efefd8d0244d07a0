"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY X10/X14 — the arbitrary-state surface).

The built-in streaming ops (windowed aggregation, ``session_window``,
``dropDuplicatesWithinWatermark``) cover fixed state machines. When an
operator needs state Spark doesn't model — here a per-user activity
profile whose max-inactivity-gap tracking must remember the *previous
event's timestamp* across micro-batches — the idiomatic escape hatch is
``applyInPandasWithState``: Arrow-batched pandas per key group, an
explicit typed state tuple, and update-mode emission per batch.

Scale notes: state is partitioned by the group key across executors and
checkpointed by the state store; per batch each key touches only its
own rows (no shuffle beyond the groupBy hash exchange). The profile
state is O(1) per user — the operator handles arbitrarily many events
per user with constant state.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: Emitted per (user, micro-batch): the running profile after the batch.
PROFILE_OUT_SCHEMA = (
    "user_id bigint, n_events bigint, first_ts timestamp, last_ts timestamp, "
    "max_gap_us bigint, version bigint"
)
#: Kept per user across batches: counts + boundary timestamps in µs.
PROFILE_STATE_SCHEMA = (
    "n bigint, first_us bigint, last_us bigint, max_gap_us bigint, version bigint"
)


def _to_us(ts: pd.Series) -> "pd.Series":
    """Timestamps → integer microseconds, robust to ns/us pandas units."""
    return pd.Series(ts.values.astype("datetime64[us]").astype("int64"))


def user_activity_profile(events: DataFrame) -> DataFrame:
    """(user_id, ts) stream → running per-user activity profile.

    Emits one row per user per micro-batch: total event count, first /
    last event time, and the largest gap between consecutive events —
    including gaps that *span* micro-batches, which is exactly the part
    per-batch aggregation cannot express and state makes O(1).

    On a bounded replay (availableNow) the final emission per user
    (highest ``version``) equals the batch computation
    ``max(ts - lag(ts)) over (partition by user order by ts)`` — the
    DuckDB-checkable oracle for this operator.
    """

    def track(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            n, first_us, last_us, max_gap_us, version = state.get
        else:
            n, first_us, last_us, max_gap_us, version = 0, None, None, 0, 0

        chunks = [_to_us(pdf["ts"]) for pdf in pdfs if len(pdf)]
        if chunks:
            us = pd.concat(chunks).sort_values().reset_index(drop=True)
            # gap spanning the batch boundary: previous last → new first
            if last_us is not None:
                max_gap_us = max(max_gap_us, int(us.iloc[0]) - last_us)
            if len(us) > 1:
                max_gap_us = max(max_gap_us, int(us.diff().max()))
            n += len(us)
            first_us = int(us.iloc[0]) if first_us is None else min(first_us, int(us.iloc[0]))
            last_us = int(us.iloc[-1]) if last_us is None else max(last_us, int(us.iloc[-1]))
            version += 1
            state.update((n, first_us, last_us, max_gap_us, version))
        if first_us is None:  # key invoked with no data and no state
            return
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "first_ts": [pd.Timestamp(first_us, unit="us")],
                "last_ts": [pd.Timestamp(last_us, unit="us")],
                "max_gap_us": [max_gap_us],
                "version": [version],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        track,
        outputStructType=PROFILE_OUT_SCHEMA,
        stateStructType=PROFILE_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def user_activity_profile_tws(events: DataFrame) -> DataFrame:
    """The same running per-user profile through
    ``transformWithStateInPandas`` — Spark 4's arbitrary-state API
    (StatefulProcessor) that supersedes ``applyInPandasWithState``:
    named typed state slots on an explicit handle (value/list/map),
    optional TTL and timers, and a processor OBJECT whose lifecycle
    (init/close) the engine manages per partition. Semantics are kept
    deliberately identical to :func:`user_activity_profile` so the two
    APIs are value-checked against the same batch oracle.

    Requires the RocksDB state store provider (transformWithState's
    backing store — its state layout supports multiple named column
    families per key, which the default HDFS-backed provider cannot);
    the registry query sets the provider conf for the bounded run.
    Scale: state remains O(1) per user, now spillable to local RocksDB
    instead of bounded by executor heap — the practical difference at
    a 100 M-key state size.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class ProfileProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("profile", PROFILE_STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            (user_id,) = key
            if self._state.exists():
                n, first_us, last_us, max_gap_us, version = self._state.get()
            else:
                n, first_us, last_us, max_gap_us, version = 0, None, None, 0, 0

            chunks = [_to_us(pdf["ts"]) for pdf in rows if len(pdf)]
            if chunks:
                us = pd.concat(chunks).sort_values().reset_index(drop=True)
                if last_us is not None:
                    max_gap_us = max(max_gap_us, int(us.iloc[0]) - last_us)
                if len(us) > 1:
                    max_gap_us = max(max_gap_us, int(us.diff().max()))
                n += len(us)
                first_us = (
                    int(us.iloc[0])
                    if first_us is None
                    else min(first_us, int(us.iloc[0]))
                )
                last_us = (
                    int(us.iloc[-1])
                    if last_us is None
                    else max(last_us, int(us.iloc[-1]))
                )
                version += 1
                self._state.update((n, first_us, last_us, max_gap_us, version))
            if first_us is None:
                return
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n_events": [n],
                    "first_ts": [pd.Timestamp(first_us, unit="us")],
                    "last_ts": [pd.Timestamp(last_us, unit="us")],
                    "max_gap_us": [max_gap_us],
                    "version": [version],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=ProfileProcessor(),
        outputStructType=PROFILE_OUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


# NOTE: transformWithStateInPandas runs its per-key state protocol over
# protobuf between the JVM and the Python worker; in environments
# without the `protobuf` package the query fails at the first
# micro-batch with `ImportError: google.protobuf`. The operator is
# therefore exercised by an importorskip-gated test
# (tests/test_streaming.py::test_transform_with_state_matches_applyinpandas)
# rather than a registered driver query: where the dependency exists the
# two state APIs are asserted value-identical, and where it doesn't the
# applyInPandasWithState row (x10_stream_stateful_profile) remains the
# driver-checked arbitrary-state evidence.
