"""Document chunking as a Python UDTF — the table-function quadrant of
the X14 UDF surface (scalar / grouped-agg / grouped-map / map-iter are
covered elsewhere; this is the 1-row → N-rows extension point).

Chunking is the canonical UDTF-shaped LLM-pipeline op: every document
expands into overlapping token windows (for embedding / RAG indexing),
and the expansion arity is data-dependent. The UDTF runs per row with
no state across rows, so it parallelizes like any projection — the
extension surface costs Python-worker transfer, which is the documented
trade-off vs the pure-expression form (``explode(sequence(...))`` +
``slice``) that this module also provides as the fast path; the
property test asserts the two forms are row-identical.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokens

#: Default chunk geometry: 16-token windows, stride 8 (50% overlap).
CHUNK_W = 16
CHUNK_S = 8

#: Content-defined chunking (CDC) parameters: a polynomial rolling hash
#: over the last CDC_W characters, cut where ``h % CDC_MASK`` hits the
#: sentinel — expected chunk length = CDC_MASK chars, matching the
#: 64-char fixed-width baseline (d21_chunk_dedup) it is measured
#: against. All integer: coefficients are ``CDC_B^k mod CDC_P`` (< 2^20)
#: and per-term products stay far below 2^63, so the arithmetic is
#: bit-identical in any engine.
CDC_W = 8
CDC_B = 257
CDC_P = 1_000_003
CDC_MASK = 64
#: Precomputed B^k mod P, k = 0..W-1 — shared with the SQL oracle.
CDC_POWS = [pow(CDC_B, k, CDC_P) for k in range(CDC_W)]


def cdc_boundary_expr(codes, n):
    """Array of 1-based cut positions for one document.

    Position ``i`` (``CDC_W <= i <= n``) ends a chunk iff the rolling
    hash of the window ``codes[i-W+1 .. i]`` — ``sum(code[i-k] *
    B^k) mod P`` — lands on ``CDC_MASK - 1`` modulo ``CDC_MASK``. The
    hash depends ONLY on the last W characters, which is the whole
    point of content-defined chunking: an insertion early in the
    document shifts every fixed-width chunk after it, but here the
    cut positions re-synchronize as soon as the window clears the
    edit, so the tail chunks keep their content hashes (the
    shift-robustness property test in tests/test_properties.py).

    ``n < W`` must short-circuit to an empty array BEFORE sequence())
    is built: ``F.sequence(8, 5)`` silently emits a DESCENDING list
    (the documented inverted-interval trap), not an error.
    """

    def _h(i):
        acc = None
        for k, pw in enumerate(CDC_POWS):
            term = F.element_at(codes, (i - F.lit(k)).cast("int")) * F.lit(pw)
            acc = term if acc is None else acc + term
        return acc % F.lit(CDC_P)

    cuts = F.filter(
        F.sequence(F.lit(CDC_W), n),
        lambda i: _h(i) % CDC_MASK == CDC_MASK - 1,
    )
    return F.when(n >= CDC_W, cuts).otherwise(
        F.array().cast("array<int>")
    )


def cdc_chunk_hashes(docs: DataFrame) -> DataFrame:
    """(source, chash): md5 content address of every CDC chunk.

    Three stacked projections, one generate, zero shuffles — the
    100 TB shape is identical to the fixed-width d21 explode. The
    char-code array and the boundary array are each materialized in
    their OWN projection (multiply-referenced non-cheap aliases;
    CollapseProject would otherwise inline the whole rolling-hash
    expression once per reference — the doc_shingles lesson), while
    the chunk-hash array stays INLINE in the generator so
    InferFiltersFromGenerate cannot substitute it into a per-row
    Filter (the doc_shingles_local lesson). Zero-length tail chunks
    (final boundary exactly at end-of-text) are dropped in-row in both
    engines.
    """
    p1 = docs.filter(F.length("text") > 0).select(
        "source",
        "text",
        F.length("text").alias("n"),
        F.transform(F.split(F.col("text"), ""), F.ascii).alias("codes"),
    )
    p2 = p1.select(
        "source",
        "text",
        "n",
        cdc_boundary_expr(F.col("codes"), F.col("n")).alias("bounds"),
    )
    starts = F.concat(F.array(F.lit(0)), F.col("bounds"))
    ends = F.concat(F.col("bounds"), F.array(F.col("n")))
    chunk_md5s = F.filter(
        F.zip_with(
            starts,
            ends,
            lambda s, e: F.when(
                e > s, F.md5(F.col("text").substr(s + 1, e - s))
            ),
        ),
        lambda x: x.isNotNull(),
    )
    return p2.select("source", F.explode(chunk_md5s).alias("chash"))


def _py_tokens(text: str) -> list[str]:
    """Python replica of ``functions.text.tokens`` (lower → collapse
    whitespace → trim → split → drop empties) — the cross-engine token
    contract, used inside the UDTF where JVM expressions can't reach.

    The whitespace class is spelled out because Python's ``\\s`` is
    Unicode-aware (matches U+00A0, U+3000, …) while Java's and RE2's
    default ``\\s`` — the engines the contract is defined against — are
    ASCII-only."""
    norm = re.sub(r"[ \t\n\x0b\f\r]+", " ", (text or "").lower()).strip(
        " \t\n\x0b\f\r"
    )
    return [t for t in norm.split(" ") if t]


class ChunkTextUDTF:
    """Yields (chunk_id, chunk, n_tokens) windows for one document.

    Window starts advance by the stride until the text is exhausted;
    the final window is short if fewer than ``CHUNK_W`` tokens remain.
    Implemented as a plain-Python UDTF (``spark.udtf.register``) —
    row-at-a-time by design; see module docstring for the trade-off.
    """

    def eval(self, doc_id: int, text: str):
        toks = _py_tokens(text)
        n = len(toks)
        for k, start in enumerate(range(0, n, CHUNK_S)):
            w = toks[start : start + CHUNK_W]
            yield doc_id, k, " ".join(w), len(w)


def chunk_documents_udtf(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """(doc_id, chunk_id, chunk, n_tokens) via the registered UDTF in a
    LATERAL join — the SQL surface a third-party table function plugs
    into."""
    from pyspark.sql.functions import udtf

    chunker = udtf(
        ChunkTextUDTF, returnType="doc_id bigint, chunk_id int, chunk string, n_tokens int"
    )
    spark.udtf.register("chunk_text_udtf", chunker)
    return spark.sql(
        """
        SELECT c.doc_id, c.chunk_id, c.chunk, c.n_tokens
        FROM {d} d, LATERAL chunk_text_udtf(d.doc_id, d.text) c
        """,
        d=docs,
    )


def chunk_documents_expr(docs: DataFrame) -> DataFrame:
    """The expression-form equivalent (the 100 TB fast path): window
    starts from ``sequence``, exploded, window content via ``slice`` —
    all JVM-side, no Python transfer. Row-identical to the UDTF form
    (asserted in tests/test_properties.py)."""
    toked = docs.select("doc_id", tokens(F.col("text")).alias("toks")).filter(
        F.size("toks") > 0
    )
    starts = F.sequence(
        F.lit(0), F.size("toks") - 1, F.lit(CHUNK_S)
    )
    return (
        toked.select("doc_id", "toks", F.posexplode(starts).alias("chunk_id", "start"))
        .select(
            "doc_id",
            F.col("chunk_id").cast("int").alias("chunk_id"),
            F.array_join(
                F.slice(F.col("toks"), F.col("start") + 1, CHUNK_W), " "
            ).alias("chunk"),
            F.least(
                F.lit(CHUNK_W), F.size("toks") - F.col("start")
            ).cast("int").alias("n_tokens"),
        )
    )
