"""Ranked text retrieval (BM25) over document corpora — the scoring
side of the LLM-data-pipeline text stack (quality filtering by query
relevance, nearest-text mining, corpus probes).

Shape chosen for 100 TB, for a FIXED small query-term set:

- **No inverted index, no explode, no per-term join.** Each term's
  per-document frequency is one ``size(filter(toks, x = term))`` lane —
  a per-row expression over the materialized token array. The classic
  explode → (doc, term) → join-with-idf plan shuffles the whole token
  stream; this one shuffles nothing data-sized.
- **Corpus stats in one tiny aggregate.** N, Σdl, and per-term document
  frequencies reduce to a SINGLE row (map-side partial aggregation →
  one 1-row exchange), broadcast back over the corpus with a
  ``crossJoin(broadcast(...))`` — the same one-row-stats pattern as the
  k-means centroid array (``operators/kmeans.py``).
- **Top-k via TakeOrdered.** ``orderBy(...).limit(k)`` plans as
  TakeOrderedAndProject: per-partition heaps, no global sort.

Two scans of the corpus (stats, then scoring) are inherent to
corpus-normalized scoring; both are full-pushdown scans of only
(doc_id, text).

Cross-engine exactness: term-frequency lanes and corpus stats are exact
integers; every scoring constant is computed ONCE in Python and
injected into both the Spark plan and the DuckDB oracle via ``repr``
(a float round-trips exactly through its repr in both parsers); the
per-term contributions are folded in fixed term order. The one
non-portable operation is ``ln`` (JVM and libm differ by 1 ulp on ~8%
of inputs — measured), so the reported score is quantized to integer
micro-units, putting any idf ulp-wiggle ~9 orders of magnitude below
the quantum (same convention as ``kmeans.quantize_micro``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens

#: Default BM25 hyperparameters (the standard Robertson values) and the
#: idf form with +1 inside the log (Lucene's, always positive).
K1 = 1.2
B = 0.75
MICRO = 1_000_000


def _consts(k1: float, b: float) -> dict[str, float]:
    """Scoring constants, computed once in Python so both engines parse
    the exact same doubles."""
    return {"k1": k1, "k1p1": k1 + 1.0, "b": b, "one_minus_b": 1.0 - b}


def bm25_topk(
    docs: DataFrame,
    terms: tuple[str, ...],
    k: int = 25,
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """Top-k documents by BM25 score for ``terms``.

    Output: (doc_id, dl, n_hits, score_micro) — document length, total
    matched-term occurrences, and the BM25 score in integer micro-units,
    ordered by (score_micro desc, doc_id).
    """
    if not terms:
        raise ValueError("bm25_topk needs at least one query term")
    c = _consts(k1, b)
    toked = docs.select("doc_id", tokens(F.col("text")).alias("toks"))
    # tf via size-difference against array_remove: native collection
    # expressions, NOT a filter(lambda) — higher-order lambdas are
    # interpreted per element (measured 3.7x slower for these lanes).
    lanes = toked.select(
        "doc_id",
        F.size("toks").cast("bigint").alias("dl"),
        *[
            (F.size("toks") - F.size(F.array_remove(F.col("toks"), t)))
            .cast("bigint")
            .alias(f"tf_{i}")
            for i, t in enumerate(terms)
        ],
    )
    stats = lanes.agg(
        F.count("*").alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("bigint")).alias(f"df_{i}")
            for i in range(len(terms))
        ],
    )
    scored = lanes.crossJoin(F.broadcast(stats))
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
    norm = F.lit(c["one_minus_b"]) + F.lit(c["b"]) * (
        F.col("dl").cast("double") / avgdl
    )
    score: Column = F.lit(0.0)
    for i in range(len(terms)):
        idf = F.log(
            (
                F.col("n_docs").cast("double")
                - F.col(f"df_{i}").cast("double")
                + F.lit(0.5)
            )
            / (F.col(f"df_{i}").cast("double") + F.lit(0.5))
            + F.lit(1.0)
        )
        tfd = F.col(f"tf_{i}").cast("double")
        score = score + idf * (tfd * F.lit(c["k1p1"]) / (tfd + F.lit(c["k1"]) * norm))
    n_hits = sum(F.col(f"tf_{i}") for i in range(len(terms)))
    return (
        scored.select(
            "doc_id",
            "dl",
            n_hits.cast("bigint").alias("n_hits"),
            F.round(score * F.lit(float(MICRO))).cast("bigint").alias("score_micro"),
        )
        .filter(F.col("n_hits") > 0)
        .orderBy(F.col("score_micro").desc(), "doc_id")
        .limit(k)
    )


def bm25_oracle_sql(
    terms: tuple[str, ...],
    toks_sql: str,
    k: int = 25,
    k1: float = K1,
    b: float = B,
) -> str:
    """The DuckDB replay of :func:`bm25_topk` — same constants (via
    repr), same fold order, same quantization. ``toks_sql`` is the
    engine-wide token-list SQL fragment over ``text``."""
    if not terms:
        raise ValueError("bm25_oracle_sql needs at least one query term")
    c = _consts(k1, b)
    tf_lanes = ", ".join(
        # single quotes doubled: terms are spliced into SQL literals
        f"CAST(len(list_filter(toks, x -> x = '{t.replace(chr(39), chr(39) * 2)}'))"
        f" AS BIGINT) AS tf_{i}"
        for i, t in enumerate(terms)
    )
    df_aggs = ", ".join(
        f"SUM(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}"
        for i in range(len(terms))
    )
    avgdl = "(CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))"
    norm = f"({c['one_minus_b']!r} + {c['b']!r} * (CAST(dl AS DOUBLE) / {avgdl}))"
    score = "CAST(0.0 AS DOUBLE)"
    for i in range(len(terms)):
        idf = (
            f"ln((CAST(n_docs AS DOUBLE) - CAST(df_{i} AS DOUBLE) + CAST(0.5 AS DOUBLE))"
            f" / (CAST(df_{i} AS DOUBLE) + CAST(0.5 AS DOUBLE)) + CAST(1.0 AS DOUBLE))"
        )
        score = (
            f"({score} + {idf} * (CAST(tf_{i} AS DOUBLE) * {c['k1p1']!r}"
            f" / (CAST(tf_{i} AS DOUBLE) + {c['k1']!r} * {norm})))"
        )
    n_hits = " + ".join(f"tf_{i}" for i in range(len(terms)))
    return f"""
    WITH t AS (SELECT doc_id, {toks_sql} AS toks FROM documents),
    l AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, {tf_lanes} FROM t),
    s AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl, {df_aggs} FROM l),
    sc AS (SELECT l.doc_id, l.dl,
                  CAST({n_hits} AS BIGINT) AS n_hits,
                  {score} AS score
           FROM l CROSS JOIN s)
    SELECT doc_id, dl, n_hits,
           CAST(round(score * {float(MICRO)!r}) AS BIGINT) AS score_micro
    FROM sc WHERE n_hits > 0
    ORDER BY score_micro DESC, doc_id LIMIT {k}
    """
