"""Text normalization / tokenization column expressions.

Shared by the dedup, text-analysis and fingerprinting operators. Kept to
built-in string functions (``lower``/``regexp_replace``/``split``/
higher-order array functions) so the expressions run inside whole-stage
codegen and are reproducible verbatim in the DuckDB oracle.

Conventions (pinned so every operator + oracle agrees):
- ``norm_text``: lowercase, collapse all whitespace runs to one space,
  trim. This is the X11 "normalized dedup" key (SURVEY.md §2.6).
- ``tokens``: split normalized text on single spaces; empty strings
  filtered (empty input → empty array, not ``[""]``).
- ``word_ngrams(n)``: positions i..i+n-1 joined by one space; a document
  with fewer than n tokens yields an empty array.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def norm_text(col: Column) -> Column:
    """Lowercased, whitespace-collapsed, trimmed text."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def tokens(col: Column) -> Column:
    """Array of whitespace tokens of the *normalized* text."""
    return F.filter(F.split(norm_text(col), " "), lambda t: t != "")


def word_ngrams(toks: Column, n: int) -> Column:
    """Array of space-joined word n-grams from a token array."""
    if n < 1:
        raise ValueError("n must be >= 1")
    if n == 1:
        return toks
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


# --- DuckDB oracle fragments (same conventions, SQL spelling) ---------

DUCKDB_NORM_TEXT = "trim(regexp_replace(lower({col}), '\\s+', ' ', 'g'))"
#: tokens: DuckDB string_split on ' ' never yields empties after norm,
#: except for the all-whitespace document → filter '' like Spark does.
DUCKDB_TOKENS = (
    "list_filter(string_split(" + DUCKDB_NORM_TEXT + ", ' '), t -> t <> '')"
)
