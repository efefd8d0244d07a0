"""Similarity search over embedding columns (SURVEY X12 + the
LLM-data-pipeline extension set).

- **Brute-force cosine top-k** — the correctness baseline: broadcast the
  (small) query set against the corpus, score with higher-order-function
  expressions (``functions/vector.py``), rank per query. No Python in
  the loop; the score is computed map-side on the corpus partitions, and
  only the per-query top-k crosses the network.
- **Cosine near-dup pairs** — all-pairs above a threshold; at test scale
  a self-join, at 100 TB the LSH-bucketed variant below prunes first.
- **Random-hyperplane LSH ANN** — sign-bit bucketing with deterministic
  pseudo-random hyperplanes (multiplicative-hash generated, so the
  DuckDB oracle reproduces the exact buckets), candidate join within
  buckets, exact cosine re-rank. The standard SimHash-for-angular-
  distance construction (Charikar).

Dot products accumulate left-to-right over double-cast elements in both
engines (Spark ``aggregate`` / DuckDB ``list_reduce``), so scores are
bit-identical and thresholds/rankings cannot flake.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.hashing import KNUTH, MOD32
from ..functions.vector import cosine_sim

#: LSH geometry: 8 hyperplanes → 256 buckets.
N_HYPERPLANES = 8


def hyperplane_component(j: int | Column, i: Column) -> Column:
    """Deterministic pseudo-random hyperplane component in [-0.5, 0.5).

    ``h[j][i] = ((j·64 + i + 1) · KNUTH mod 2³²) / 2³² − 0.5`` — pure
    integer arithmetic scaled once, identical in any engine.
    """
    j_col = F.lit(j) if isinstance(j, int) else j
    idx = (j_col.cast("bigint") * 64 + i.cast("bigint") + 1) * F.lit(KNUTH)
    return F.pmod(idx, F.lit(MOD32)).cast("double") / F.lit(float(MOD32)) - 0.5


def hyperplane_dot(vec: Column, j: int) -> Column:
    """Dot product of a vector with deterministic hyperplane ``j``."""
    return F.aggregate(
        F.zip_with(
            vec,
            F.sequence(F.lit(0), F.size(vec) - 1),
            lambda v, i: v.cast("double") * hyperplane_component(j, i),
        ),
        F.lit(0.0),
        lambda a, v: a + v,
    )


def lsh_bucket(vec: Column, n_planes: int = N_HYPERPLANES) -> Column:
    """Sign-bit LSH bucket id: bit j set iff dot(vec, plane_j) > 0."""
    bucket = F.lit(0).cast("bigint")
    for j in range(n_planes):
        bit = F.when(hyperplane_dot(vec, j) > 0, F.lit(1 << j)).otherwise(F.lit(0))
        bucket = bucket + bit.cast("bigint")
    return bucket


def cosine_topk(
    emb: DataFrame, query_ids: list[int], k: int = 10
) -> DataFrame:
    """Exact top-k neighbors per query vector (brute force baseline).

    Queries are a broadcast dimension; scoring is map-side over corpus
    partitions; ranking shuffles only on the (tiny) query key.
    """
    q = emb.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    scored = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            cosine_sim(F.col("q_emb"), F.col("embedding")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "vec_id", "cosine", "rk")
    )


def cosine_near_pairs(emb: DataFrame, threshold: float) -> DataFrame:
    """All pairs (a < b) with cosine ≥ threshold. Test-scale: self-join;
    scale path: see ann_lsh_topk's bucketed candidate generation."""
    a = emb.select(F.col("vec_id").alias("a"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("b"), F.col("embedding").alias("eb"))
    return (
        a.join(b, F.col("a") < F.col("b"))
        .select("a", "b", cosine_sim(F.col("ea"), F.col("eb")).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def ann_lsh_topk(
    emb: DataFrame, query_ids: list[int], k: int = 5, n_planes: int = N_HYPERPLANES
) -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket, then
    exact cosine re-rank within candidates.

    At scale the bucket id is a shuffle key: corpus hashed once,
    queries probe matching buckets only — candidate count is corpus/2^b
    per query in expectation instead of the full corpus. Recall is
    tunable via multi-probe (flip one bit) or more tables; this single-
    table form is the oracle-checkable core.
    """
    bucketed = emb.withColumn("bucket", lsh_bucket(F.col("embedding"), n_planes))
    q = bucketed.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("bucket").alias("q_bucket"),
    )
    cands = (
        bucketed.join(
            F.broadcast(q), F.col("bucket") == F.col("q_bucket")
        )
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            cosine_sim(F.col("q_emb"), F.col("embedding")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        cands.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "vec_id", "cosine", "rk")
    )
