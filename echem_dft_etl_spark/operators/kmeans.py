"""Distributed k-means (Lloyd) refinement over embedding columns — the
engine's iterative-algorithm exemplar (driver-looped DataFrame rounds,
no MLlib).

Each Lloyd round is two relational steps:

1. **assign** — nearest-centroid argmin, computed per row against the
   broadcast centroid array (same windowless array-arithmetic shape as
   the IVF index side in ``operators/similarity.py``). Zero shuffles.
2. **update** — new centroid ``mean(dim)`` per cell: ``posexplode`` the
   vectors, one groupBy (cell, dim) with map-side partial sums, then
   fold the per-dim means back into arrays. One shuffle per round,
   keyed on (cell, dim) — k·d groups, never data-sized.

Cross-engine exactness (so a DuckDB oracle can replay the round
bit-for-bit): vectors are first quantized to integer micro-units
(``round(x·10⁶)``), making every cross-row sum an exact integer;
centroid means are single integer/integer divisions; squared-distance
sums run left-to-right within a row (fixed dimension order). Floats
never accumulate across rows, so partitioning cannot change a single
bit.

The driver loop (``refine``) runs a fixed number of rounds — iterative
algorithms are plan-per-round in Spark (each round's DataFrame derives
from the previous round's), with the loop itself in Python exactly as
MLlib's own implementations do it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def quantize_micro(vec: Column) -> Column:
    """float array → exact integer micro-units (bigint array)."""
    return F.transform(vec, lambda x: F.round(x.cast("double") * MICRO).cast("bigint"))


def _sq_dist(vec: Column, cent: Column) -> Column:
    """Σ (v_i − c_i)² over the zipped arrays, folded in dimension order.

    ``vec`` is the row's integer micro-vector (cast per element),
    ``cent`` the centroid's double array — both exactly representable,
    so the same fold in any engine yields the same double.
    """
    return F.aggregate(
        F.zip_with(
            vec,
            cent,
            lambda v, c: (v.cast("double") - c) * (v.cast("double") - c),
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )


def assign(points: DataFrame, cent_arr: DataFrame) -> DataFrame:
    """(vec_id, qv, cell): nearest centroid per row, windowless.

    ``cent_arr`` is one row: ``cents`` = array of (cent_id, c_vec
    double array). argmin = ``array_max`` over (−dist, −cent_id)
    structs — ties to the lowest cent_id.
    """
    scored = F.transform(
        F.col("cents"),
        lambda c: F.struct(
            (-_sq_dist(F.col("qv"), c["c_vec"])).alias("nd"),
            (-c["cent_id"]).alias("nid"),
        ),
    )
    best = F.array_max(scored)
    return points.crossJoin(F.broadcast(cent_arr)).select(
        "vec_id", "qv", (-best["nid"]).alias("cell")
    )


def update_centroids(assigned: DataFrame) -> DataFrame:
    """One-row frame of refreshed centroids: exact per-dim integer sums
    → one double division each → arrays rebuilt in dimension order."""
    per_dim = (
        assigned.select("cell", F.posexplode("qv").alias("dim", "v"))
        .groupBy("cell", "dim")
        .agg(F.sum("v").alias("s"), F.count("*").alias("n"))
    )
    per_cell = per_dim.groupBy("cell").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "s", "n"))),
            lambda t: t["s"].cast("double") / t["n"].cast("double"),
        ).alias("c_vec")
    )
    return per_cell.agg(
        F.collect_list(
            F.struct(F.col("cell").alias("cent_id"), "c_vec")
        ).alias("cents")
    )


def assignments(
    emb: DataFrame, k: int = 8, rounds: int = 1
) -> DataFrame:
    """(vec_id, cell): final cluster assignment after ``rounds`` Lloyd
    rounds from the deterministic init (lowest ``k`` vec_ids seed the
    centroids) — the reusable half of :func:`refine`, consumed by
    cluster-scoped operators like SemDeDup
    (similarity.py::semdedup)."""
    points = emb.select(
        "vec_id", quantize_micro(F.col("embedding")).alias("qv")
    )
    cent_arr = (
        points.filter(F.col("vec_id") < k)
        .select(
            F.col("vec_id").alias("cent_id"),
            F.transform("qv", lambda v: v.cast("double")).alias("c_vec"),
        )
        .agg(F.collect_list(F.struct("cent_id", "c_vec")).alias("cents"))
    )
    assigned = assign(points, cent_arr)
    for _ in range(rounds):
        cent_arr = update_centroids(assigned)
        assigned = assign(points, cent_arr)
    return assigned.select("vec_id", "cell")


def refine(
    emb: DataFrame, k: int = 8, rounds: int = 1
) -> DataFrame:
    """k-means refinement: deterministic init (lowest vec_ids), then
    ``rounds`` Lloyd rounds, returning the final per-cell summary
    (n_members, integer id-checksum) — exact in any engine.
    """
    return assignments(emb, k, rounds).groupBy("cell").agg(
        F.count("*").alias("n_members"),
        F.sum("vec_id").alias("sum_vec_ids"),
    )
