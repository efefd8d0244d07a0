"""Registration-order invariants for the driver's correctness window.

The driver checks only the FIRST 50 registered queries (CORRECTNESS_r01
cut exactly at position 50), so the curated ``PRIORITY`` prefix must put
at least one query for every SURVEY §2 id inside that window. Redundant
variants (same survey ids covered elsewhere in the window) ride behind.
"""

from __future__ import annotations

DRIVER_WINDOW = 50


def _ordered_specs():
    from echem_dft_etl_spark.registry import all_queries

    return list(all_queries().values())


def test_priority_names_all_registered():
    from echem_dft_etl_spark.registry import PRIORITY, all_queries

    names = set(all_queries())
    assert set(PRIORITY) <= names
    assert len(PRIORITY) == len(set(PRIORITY)), "duplicate PRIORITY names"


def test_first_window_covers_every_survey_id():
    specs = _ordered_specs()
    window_ids = {i for s in specs[:DRIVER_WINDOW] for i in s.survey_ids}
    all_ids = {i for s in specs for i in s.survey_ids}
    assert window_ids == all_ids, (
        f"survey ids outside the driver window: {sorted(all_ids - window_ids)}"
    )


#: Canonical SURVEY §2 ids (S5 is out of scope per §2.1). The window
#: must keep ≥ 1 query claiming each — this is the guard that fails if
#: a future registration change evicts an id's LAST in-window query
#: (the union test below cannot catch the case where the id's only
#: claimants were all inside the window).
CANONICAL_SURVEY_IDS = frozenset(
    [f"Q{i}" for i in range(1, 23)]
    + ["S1", "S2", "S3", "S4"]
    + [f"X{i}" for i in range(1, 15)]
)


def test_window_retains_every_canonical_survey_id():
    specs = _ordered_specs()
    window_ids = {i for s in specs[:DRIVER_WINDOW] for i in s.survey_ids}
    missing = CANONICAL_SURVEY_IDS - window_ids
    assert not missing, (
        f"SURVEY ids with no query left in the driver window: {sorted(missing)}"
    )


def test_previously_unchecked_surfaces_in_window():
    """The five SURVEY ids flagged by VERDICT r1 (Q10, S1, S2, S4, X10)
    must have their primary queries inside the window."""
    specs = _ordered_specs()
    window = {s.name for s in specs[:DRIVER_WINDOW]}
    for required in (
        "q10_serializer_expr",
        # r3: S1/S4 value-checked read-back replaces the rows-only e2e
        # slot; the pruned near-pairs variant is the VERDICT r2 ask
        "s01_sink_roundtrip",
        "s12_near_pairs_pruned",
        "pipe_external_solver",
        "x10_stream_tumbling",
        "x10_stream_sessions",
        "mm_decode_features",
        "s12_ann_lsh_multiprobe",
        "s16_asof_join",
        "s15_salted_join",
        "x03_time_rollup",
        "x14_grouped_fit_pandas",
        "d01_nested_sites",
        # r2 promotions: the transitive dedup clusters and the
        # value-checked stream-stream interval join
        "d12_dup_clusters",
        "x10_stream_stream_join",
    ):
        assert required in window, f"{required} outside driver window"
