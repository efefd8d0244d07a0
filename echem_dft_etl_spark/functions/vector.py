"""Vector math over ``array<float>`` columns via higher-order functions.

Everything stays JVM-side (Catalyst ``zip_with``/``aggregate`` expressions
inside whole-stage codegen) — no Python in the hot path. Elements are cast
to double before accumulation so both Spark and the DuckDB oracle sum the
same float64 sequence left-to-right, giving bit-identical results.

This is the scale path for the similarity-search operators: brute-force
cosine is a broadcast-joined map-side computation (no shuffle for the
score), and the LSH variant in ``operators/similarity.py`` prunes the
candidate space before any pairwise math.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-order dot product of two numeric arrays, as double."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    """Euclidean norm, accumulated in array order (oracle-reproducible)."""
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL when either vector has zero norm."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom != 0, dot(a, b) / denom)
