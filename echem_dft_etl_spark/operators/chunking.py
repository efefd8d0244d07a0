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
