"""As-of (backward) join — a time-series operator Spark's join family
lacks, composed from union + ordered window (SURVEY §2.6 custom-op
path (a): composition of existing DataFrame ops).

For each left row, attach the latest right row of the same key with
``right.ts <= left.ts``. The classic merge-join formulation: union both
sides, order per key by (ts, side) with right rows first at equal
timestamps, and carry the last seen right payload forward with
``last(..., ignorenulls=True)``. One shuffle + sort per key — the same
cost profile as a sort-merge join, with no range-explosion (contrast a
theta-join ``l.ts >= r.ts`` which is quadratic per key before
aggregation).

At scale the window never holds more than one payload struct of state
per row, and keys parallelize across partitions; skewed keys can reuse
the salting pattern from ``operators/scale.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_backward_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    ts_col: str,
    tie_col: str,
    payload_cols: list[str],
) -> DataFrame:
    """Left as-of join: latest right payload at-or-before each left row.

    ``right`` must be unique per (key, ts) — pre-dedup if needed (an
    ambiguous as-of match is undefined in any engine). ``tie_col``
    makes the window order total. The matched payload arrives as
    nullable ``asof_<col>`` columns (null = no right row at or before).
    """
    r = right.select(
        *key_cols,
        ts_col,
        tie_col,
        F.struct(*payload_cols).alias("_r"),
    ).withColumn("_side", F.lit(0))
    l = left.withColumn("_side", F.lit(1))
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(ts_col), F.col("_side"), F.col(tie_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("_m", F.last("_r", ignorenulls=True).over(w))
    out = matched.filter(F.col("_side") == 1).drop("_r", "_side")
    for c in payload_cols:
        out = out.withColumn(f"asof_{c}", F.col("_m")[c])
    return out.drop("_m")
