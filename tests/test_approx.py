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
