"""Approximate aggregate forms (X6 scale path): sketches are
engine-specific so they are bounded against the exact forms here
rather than oracle-compared (SURVEY §2.6)."""

from __future__ import annotations

from pyspark.sql import functions as F

from echem_dft_etl_spark.sources import load_table
from tests.conftest import SF_SMOKE


def test_approx_count_distinct_within_rsd(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    row = li.agg(
        F.approx_count_distinct("l_suppkey", rsd=0.02).alias("approx"),
        F.count_distinct("l_suppkey").alias("exact"),
    ).first()
    assert abs(row.approx - row.exact) <= max(3, 0.1 * row.exact), row


def test_percentile_approx_brackets_exact(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    row = li.agg(
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("approx"),
        F.percentile("l_extendedprice", F.lit(0.5)).alias("exact"),
    ).first()
    lo, hi = (
        li.agg(
            F.percentile("l_extendedprice", F.lit(0.45)),
            F.percentile("l_extendedprice", F.lit(0.55)),
        ).first()
    )
    assert lo <= row.approx <= hi, row


def test_rolling_distinct_hll_tracks_exact(spark):
    """The mergeable-sketch rolling distinct (daily HLL -> window
    union) must track the exact constant-fan-out form within HLL
    error (lgk=12 => ~1.6% stderr; assert 5%), day by day."""
    from pyspark.sql import functions as F

    from echem_dft_etl_spark.operators.scale import rolling_distinct_hll
    from echem_dft_etl_spark.registry import all_queries
    from tests.conftest import SF_SMOKE
    from echem_dft_etl_spark.sources import load_table

    ev = load_table(spark, SF_SMOKE, "events")
    approx = {
        r.day: r.approx_distinct
        for r in rolling_distinct_hll(
            ev,
            "user_id",
            F.date_trunc("day", F.col("ts")).cast("date"),
            window_days=7,
        ).collect()
    }
    exact = {
        r.day: r.wau
        for r in all_queries()["x04_rolling_wau"].fn(spark, SF_SMOKE).collect()
    }
    assert set(approx) == set(exact)
    for day, n in exact.items():
        assert abs(approx[day] - n) <= max(2, 0.05 * n), (day, approx[day], n)
