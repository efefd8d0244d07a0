"""Spatial near-pair join: all point pairs within radius r, without a
cross join (the planar sibling of the banded range join, SURVEY X5).

The naive form is a θ-join (``dist(a, b) <= r``) that Spark can only
plan as a nested loop. The distributed form is classic grid blocking
(the same pigeonhole move as ``x05_range_join_binned``, one dimension
up): snap every point to a square cell of side ``cell >= r``; any pair
within ``r`` must then sit in the same cell or in one of its 8
neighbors, so candidates meet on an EQUI-join of probe cell-keys
against build cell-keys, and the exact integer distance check keeps
only true pairs. Each point probes only the HALF stencil — its own
cell plus the lexicographically positive neighbor offsets — because
an unordered pair only needs to meet once, in either orientation;
canonical ``id_a < id_b`` order is restored after the join.

Correctness notes baked into the construction:

* **No duplicate candidates by construction**: for a pair (p, q) in
  different cells, exactly one of ``cell(q)-cell(p)`` and its
  negation is a positive probe offset, so the pair meets exactly once
  (from whichever endpoint's probe); same-cell pairs meet twice (both
  orientations) and the strict id filter keeps one. No distinct pass
  over the pair stream.
* **Exact, engine-stable math**: coordinates are integers and the
  radius test is ``(xa-xb)² + (ya-yb)² <= r²`` in bigint — replayable
  in any SQL dialect with zero float wiggle.
* **Canonical orientation** ``id_a < id_b`` halves the output and
  makes the pair set deterministic.

Scale shape: one narrow shuffle of (id, x, y, cell) keyed on the cell
— 5 probe rows per point (half stencil), a constant fan-out — then
per-cell work bounded by local density. This is how every planetary-scale spatial
join (points-of-interest dedup, trajectory contact tracing, sensor
cross-matching) actually runs; skewed hot cells (a city against empty
ocean) are the standard salting case, and AQE's skew-join split
handles them without code changes because the join is a plain
shuffled equi-join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["grid_near_join", "grid_contact_join"]


def _cell_of(colname: str, size: int) -> Column:
    """Bigint-EXACT floor division ``colname div size`` for cell keys.

    ``F.floor(col / size)`` goes through double-precision division, so
    for |coord| beyond ~2^53 the floor can land one cell off near a
    boundary and silently drop pairs. Instead subtract the
    non-negative ``pmod`` remainder (making an exact multiple of
    ``size``) and integer-``div`` it — every step stays in bigint, so
    the cell key is exact over the full 64-bit coordinate range."""
    return F.expr(f"({colname} - pmod({colname}, {size})) div {size}")


def grid_near_join(
    points: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    radius: int,
    cell: int | None = None,
) -> DataFrame:
    """All unordered point pairs with ``dist² <= radius²``.

    ``points`` carries integer coordinates; output is
    ``(id_a, id_b, dist_sq)`` with ``id_a < id_b``. ``cell`` defaults
    to ``radius`` (the tightest grid whose 3×3 neighborhood is a
    superset of the disk — smaller cells would need a wider probe
    stencil, larger cells admit more false candidates)."""
    if cell is None:
        cell = radius
    if cell < radius:
        raise ValueError("cell must be >= radius for a 3x3 probe stencil")
    if cell < 1:
        # div-by-zero cell keys are NULL in Spark: the join would
        # silently emit zero pairs instead of erroring
        raise ValueError("cell must be >= 1")
    pts = points.select(
        F.col(id_col).alias("pid"),
        F.col(x_col).cast("bigint").alias("px"),
        F.col(y_col).cast("bigint").alias("py"),
    )
    build = pts.select(
        F.col("pid").alias("id_b_"),
        F.col("px").alias("xb"),
        F.col("py").alias("yb"),
        _cell_of("px", cell).alias("cx"),
        _cell_of("py", cell).alias("cy"),
    )
    # HALF-STENCIL probe: of the 9 neighbor offsets only the 5
    # lexicographically non-negative ones are probed — (0,0) plus the
    # 4 with dx > 0 OR (dx = 0 AND dy > 0). For a pair in cells
    # differing by d ≠ 0 exactly one of d, −d is in the probe set, so
    # the pair meets exactly once (in whichever id orientation); the
    # same-cell case keeps the strict id filter. Canonical id order is
    # restored with least/greatest AFTER the join. vs the full 3×3
    # stencil this halves both the probe fan-out (9 → 5 rows/point)
    # and the candidate stream (the full stencil met every cross-cell
    # pair twice and discarded one by the id filter).
    offsets = F.expr(
        "explode(filter(flatten(transform(sequence(-1, 1), "
        "dx -> transform(sequence(-1, 1), dy -> struct(dx, dy)))), "
        "o -> o.dx > 0 OR (o.dx = 0 AND o.dy >= 0)))"
    )
    probe = pts.select(
        F.col("pid").alias("id_a_"),
        F.col("px").alias("xa"),
        F.col("py").alias("ya"),
        _cell_of("px", cell).alias("pcx"),
        _cell_of("py", cell).alias("pcy"),
        offsets.alias("o"),
    ).select(
        "id_a_",
        "xa",
        "ya",
        (F.col("pcx") + F.col("o.dx")).alias("cx"),
        (F.col("pcy") + F.col("o.dy")).alias("cy"),
        ((F.col("o.dx") == 0) & (F.col("o.dy") == 0)).alias("same_cell"),
    )
    dist_sq = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    return (
        probe.join(build, on=["cx", "cy"])
        .filter(~F.col("same_cell") | (F.col("id_a_") < F.col("id_b_")))
        .withColumn("dist_sq", dist_sq)
        .filter(F.col("dist_sq") <= radius * radius)
        .select(
            F.least("id_a_", "id_b_").alias("id_a"),
            F.greatest("id_a_", "id_b_").alias("id_b"),
            F.col("dist_sq").cast("bigint").alias("dist_sq"),
        )
    )


def grid_contact_join(
    points: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    t_col: str,
    radius: int,
    t_radius: int,
    cell: int | None = None,
) -> DataFrame:
    """Spatio-TEMPORAL contact pairs: ``dist² <= radius²`` AND
    ``|t_a - t_b| <= t_radius`` — the contact-tracing / sensor
    cross-matching shape. Same pigeonhole as :func:`grid_near_join`
    with time as a third blocking axis: cells are
    ``(x div cell, y div cell, t div t_radius)`` and each point
    probes the half stencil of the 3×3×3 neighborhood (constant 14×
    fan-out; every pair still meets exactly once, so no dedup pass).
    Output
    ``(id_a, id_b, dist_sq, dt)`` with ``id_a < id_b``; all math is
    bigint-exact. The time axis is usually the great filter at scale
    (a day of data only joins against adjacent time cells), which is
    why the composite key keeps the shuffle bounded no matter how
    large the spatial extent grows."""
    if cell is None:
        cell = radius
    if cell < radius:
        raise ValueError("cell must be >= radius for a 3x3 probe stencil")
    if cell < 1:
        raise ValueError("cell must be >= 1")
    if t_radius < 1:
        # div-by-zero in the time-cell key would yield NULL cells and a
        # silently empty join rather than an error
        raise ValueError("t_radius must be >= 1 for the time blocking axis")
    pts = points.select(
        F.col(id_col).alias("pid"),
        F.col(x_col).cast("bigint").alias("px"),
        F.col(y_col).cast("bigint").alias("py"),
        F.col(t_col).cast("bigint").alias("pt"),
    )
    build = pts.select(
        F.col("pid").alias("id_b_"),
        F.col("px").alias("xb"),
        F.col("py").alias("yb"),
        F.col("pt").alias("tb"),
        _cell_of("px", cell).alias("cx"),
        _cell_of("py", cell).alias("cy"),
        _cell_of("pt", t_radius).alias("ct"),
    )
    # Half-stencil in 3D (see grid_near_join): 27 offsets → the 14
    # lexicographically non-negative ones; every cross-cell pair meets
    # exactly once in exactly one orientation, the same-cell case
    # keeps the strict id filter, canonical id order restored with
    # least/greatest after the join. Halves probe fan-out AND the
    # candidate stream.
    offsets = F.expr(
        "explode(filter(flatten(flatten(transform(sequence(-1, 1), "
        "dx -> transform(sequence(-1, 1), "
        "dy -> transform(sequence(-1, 1), "
        "dt -> struct(dx, dy, dt)))))), "
        "o -> o.dx > 0 OR (o.dx = 0 AND (o.dy > 0 "
        "OR (o.dy = 0 AND o.dt >= 0)))))"
    )
    probe = pts.select(
        F.col("pid").alias("id_a_"),
        F.col("px").alias("xa"),
        F.col("py").alias("ya"),
        F.col("pt").alias("ta"),
        _cell_of("px", cell).alias("pcx"),
        _cell_of("py", cell).alias("pcy"),
        _cell_of("pt", t_radius).alias("pct"),
        offsets.alias("o"),
    ).select(
        "id_a_",
        "xa",
        "ya",
        "ta",
        (F.col("pcx") + F.col("o.dx")).alias("cx"),
        (F.col("pcy") + F.col("o.dy")).alias("cy"),
        (F.col("pct") + F.col("o.dt")).alias("ct"),
        (
            (F.col("o.dx") == 0)
            & (F.col("o.dy") == 0)
            & (F.col("o.dt") == 0)
        ).alias("same_cell"),
    )
    dist_sq = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    return (
        probe.join(build, on=["cx", "cy", "ct"])
        .filter(~F.col("same_cell") | (F.col("id_a_") < F.col("id_b_")))
        .withColumn("dist_sq", dist_sq)
        .withColumn("dt", F.abs(F.col("ta") - F.col("tb")))
        .filter(
            (F.col("dist_sq") <= radius * radius)
            & (F.col("dt") <= t_radius)
        )
        .select(
            F.least("id_a_", "id_b_").alias("id_a"),
            F.greatest("id_a_", "id_b_").alias("id_b"),
            F.col("dist_sq").cast("bigint").alias("dist_sq"),
            F.col("dt").cast("bigint").alias("dt"),
        )
    )
