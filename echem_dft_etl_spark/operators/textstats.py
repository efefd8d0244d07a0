"""Text-analysis operators over document corpora (SURVEY X13 + the
LLM-data-pipeline extension set): token statistics, top-token/n-gram
frequencies, heuristic language ID, quality scoring, and content
fingerprinting.

Everything is built-in string/array expressions (split, filter,
transform, aggregate) evaluated JVM-side; counts are exact integers and
every ratio is a single double division, so the DuckDB oracles match
bit-for-bit. The only shuffle in any of these is the final groupBy on
the token / doc key.

Every operator materializes the token array in its own projection
(``_toked``) before referencing it: the tokenizer (regexp normalize +
split) is non-cheap, and inlining it into each of the N downstream
references re-runs it N times per row — measured ~25x slowdowns on
composed expressions. A separate projection with a multiply-referenced
alias is exactly what CollapseProject refuses to inline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import MERSENNE31, det_hash_str
from ..functions.text import norm_text, tokens, word_ngrams

#: Tiny per-language stopword lists for the heuristic language ID.
#: Deliberately small + deterministic; the operator demonstrates the
#: n-gram/stopword-ratio technique, not linguistic completeness.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "is", "of", "and", "to", "in"),
    "es": ("el", "la", "de", "que", "y", "los"),
    "de": ("der", "die", "und", "das", "ist", "von"),
    "fr": ("le", "la", "et", "les", "des", "est"),
}


def _stop_hits(toks: Column, lang: str) -> Column:
    """Count of tokens (with multiplicity) in the language's stopword set."""
    words = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(words, t)))


def _toked(docs: DataFrame) -> DataFrame:
    """(doc_id, text, toks): token array materialized once per row."""
    return docs.select("doc_id", "text", tokens(F.col("text")).alias("toks"))


def token_stats(docs: DataFrame) -> DataFrame:
    """Per-document token statistics (X13): counts via whitespace
    tokenization plus a BPE-ish regex word count (letters / digits /
    single punctuation as separate units)."""
    toks = F.col("toks")
    sum_len = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda a, v: a + v,
    )
    bpe_ish = F.size(
        F.expr(r"regexp_extract_all(text, '([a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s])', 1)")
    )
    return _toked(docs).select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_uniq_tokens"),
        sum_len.alias("sum_token_chars"),
        (sum_len.cast("double") / F.size(toks).cast("double")).alias("avg_token_len"),
        bpe_ish.cast("bigint").alias("n_bpe_units"),
        F.length(norm_text(F.col("text"))).cast("bigint").alias("n_chars_norm"),
    )


def top_tokens(docs: DataFrame, k: int = 20) -> DataFrame:
    """Global top-k tokens by frequency (ties broken lexically)."""
    return (
        docs.select(F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "token")
        .limit(k)
    )


def top_ngrams(docs: DataFrame, n: int = 2, k: int = 20) -> DataFrame:
    """Global top-k word n-grams by frequency (ties broken lexically)."""
    return (
        _toked(docs)
        .select(F.explode(word_ngrams(F.col("toks"), n)).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "ngram")
        .limit(k)
    )


def heavy_hitters(docs: DataFrame, min_ppm: int = 500) -> DataFrame:
    """(token, n, ppm): every token whose corpus frequency is at least
    ``min_ppm`` parts-per-million of all token occurrences — the exact
    heavy-hitters set (the "frequent items" primitive of corpus
    analytics: stopword discovery, boilerplate markers, vocabulary
    pruning cutoffs).

    Scale shape: one explode + ONE hash aggregate with map-side
    partial counts (distinct tokens ≪ token stream), the grand total
    rides a broadcast one-row frame, and the ppm arithmetic is integer
    end-to-end (``n·1e6 DIV total``), so the surviving set is
    bit-identical on any engine and any partitioning. For streams or
    when even the distinct-token aggregate is too wide, the mergeable
    Count-Min sketch (``F.count_min_sketch``) bounds state at
    O(1/eps·log 1/δ) per partition and guarantees
    ``exact ≤ estimate ≤ exact + eps·total`` — that twin is pinned in
    tests/test_approx.py (the sketch estimate is Spark-internal
    hashing, so it cannot be a cross-engine oracle row).
    """
    toks = docs.select(F.explode(tokens(F.col("text"))).alias("token"))
    counts = toks.groupBy("token").agg(F.count("*").alias("n"))
    total = toks.agg(F.count("*").alias("total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("n") * 1_000_000 >= F.col("total") * min_ppm)
        .select(
            "token",
            "n",
            F.expr("n * 1000000 DIV total").cast("bigint").alias("ppm"),
        )
    )


def language_id(docs: DataFrame) -> DataFrame:
    """Heuristic language ID (LLM-pipeline op): stopword-hit ratios per
    candidate language; highest ratio wins, ties resolved in fixed
    ('de','en','es','fr') order; zero hits → 'und'. A real system plugs
    a model here; the engine surface (per-doc scores + argmax) is what
    this operator demonstrates."""
    toks = F.col("toks")
    scored = _toked(docs).select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        *[_stop_hits(toks, lang).alias(f"hits_{lang}") for lang in sorted(STOPWORDS)],
    )
    langs = sorted(STOPWORDS)
    best = F.greatest(*[F.col(f"hits_{l}") for l in langs])
    pred = F.lit("und")
    # First language (in sorted order) achieving the max wins the tie.
    for lang in reversed(langs):
        pred = F.when(
            (best > 0) & (F.col(f"hits_{lang}") == best), F.lit(lang)
        ).otherwise(pred)
    return scored.select(
        "doc_id",
        *[F.col(f"hits_{l}").cast("bigint").alias(f"hits_{l}") for l in langs],
        pred.alias("lang_pred"),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Heuristic document quality (LLM-pipeline op): length score,
    stopword ratio, mean token length, combined as a fixed affine blend.
    Every component is an integer ratio → deterministic doubles."""
    toks = F.col("toks")
    n_tok = F.size(toks).cast("bigint")
    sum_len = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda a, v: a + v,
    )
    stop_hits = _stop_hits(toks, "en").cast("bigint")
    len_score = F.least(n_tok.cast("double") / 100.0, F.lit(1.0))
    stop_ratio = stop_hits.cast("double") / n_tok.cast("double")
    avg_len = sum_len.cast("double") / n_tok.cast("double")
    score = len_score * 0.5 + stop_ratio * 0.3 + (avg_len / 10.0) * 0.2
    return _toked(docs).select(
        "doc_id",
        n_tok.alias("n_tokens"),
        stop_hits.alias("stop_hits"),
        len_score.alias("len_score"),
        stop_ratio.alias("stop_ratio"),
        avg_len.alias("avg_token_len"),
        score.alias("quality"),
    )


def repetition_stats(docs: DataFrame, max_dup_2gram_frac: float = 0.2) -> DataFrame:
    """Repetition-based quality signals (the Gopher-rule family):
    fraction of duplicate tokens / word-2-grams / word-3-grams per
    document, plus the keep/drop flag at the given 2-gram threshold.

    ``dup_frac_n = 1 − |distinct n-grams| / |n-grams|`` — exact integer
    ratios from ``array_distinct``/``size``, all per-row expressions
    (zero shuffles at any scale). Repetition is the single strongest
    cheap predictor of boilerplate/spam in web-scale corpora; the
    threshold flag mirrors how these rules gate training data.
    """
    toks = F.col("toks")

    def dup_frac(arr):
        return (
            F.lit(1.0)
            - F.size(F.array_distinct(arr)).cast("double")
            / F.size(arr).cast("double")
        )

    g2, g3 = word_ngrams(toks, 2), word_ngrams(toks, 3)
    out = _toked(docs).select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.when(F.size(toks) > 0, dup_frac(toks)).otherwise(F.lit(0.0)).alias("dup_token_frac"),
        F.when(F.size(g2) > 0, dup_frac(g2)).otherwise(F.lit(0.0)).alias("dup_2gram_frac"),
        F.when(F.size(g3) > 0, dup_frac(g3)).otherwise(F.lit(0.0)).alias("dup_3gram_frac"),
    )
    return out.withColumn(
        "keep", F.col("dup_2gram_frac") <= F.lit(max_dup_2gram_frac)
    )


#: Default composite-gate thresholds (C4/Gopher-rule shapes, tuned to
#: produce a meaningful keep/drop mix on the test corpus; production
#: corpora retune them — they are declared parameters, not constants).
GATE_MIN_TOKENS = 30
GATE_MAX_TOKENS = 10_000
GATE_MIN_AVG_TOKEN_LEN = 3.0
GATE_MAX_AVG_TOKEN_LEN = 5.0
GATE_MAX_DUP_2GRAM_FRAC = 0.05


def quality_gate(
    docs: DataFrame,
    min_tokens: int = GATE_MIN_TOKENS,
    max_tokens: int = GATE_MAX_TOKENS,
    min_avg_len: float = GATE_MIN_AVG_TOKEN_LEN,
    max_avg_len: float = GATE_MAX_AVG_TOKEN_LEN,
    max_dup_2gram: float = GATE_MAX_DUP_2GRAM_FRAC,
) -> DataFrame:
    """The COMPOSITE filter chain of a C4/Gopher-style cleaning
    pipeline as ONE declarative pass: language identified, length
    bounds, mean-token-length bounds (the 'gibberish' rule), and the
    duplicate-2-gram repetition cut, each emitted as its own boolean
    so downstream analysis can attribute drops per rule, plus the
    conjunction ``keep``.

    This is how the individual t13 operators compose in production:
    one scan, one projection chain over a single materialized token
    array (the ``_toked`` discipline — no per-rule re-tokenization),
    zero shuffles at any scale. Documents failing language ID
    (``und`` — e.g. the zh slice against the de/en/es/fr stopword
    lists) fail the gate, mirroring how a real pipeline quarantines
    unidentifiable text rather than silently keeping it.
    """
    toks = F.col("toks")
    n_tok = F.size(toks).cast("bigint")
    sum_len = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda a, v: a + v,
    )
    avg_len = F.when(
        n_tok > 0, sum_len.cast("double") / n_tok.cast("double")
    ).otherwise(F.lit(0.0))
    g2 = word_ngrams(toks, 2)
    dup2 = F.when(
        F.size(g2) > 0,
        F.lit(1.0)
        - F.size(F.array_distinct(g2)).cast("double")
        / F.size(g2).cast("double"),
    ).otherwise(F.lit(0.0))
    langs = sorted(STOPWORDS)
    best = F.greatest(*[_stop_hits(toks, l) for l in langs])
    signals = _toked(docs).select(
        "doc_id",
        n_tok.alias("n_tokens"),
        avg_len.alias("avg_token_len"),
        dup2.alias("dup_2gram_frac"),
        (best > 0).alias("pass_lang"),
    )
    gated = signals.select(
        "*",
        F.col("n_tokens").between(min_tokens, max_tokens).alias("pass_length"),
        F.col("avg_token_len")
        .between(min_avg_len, max_avg_len)
        .alias("pass_word_len"),
        (F.col("dup_2gram_frac") <= F.lit(max_dup_2gram)).alias(
            "pass_repetition"
        ),
    )
    return gated.withColumn(
        "keep",
        F.col("pass_lang")
        & F.col("pass_length")
        & F.col("pass_word_len")
        & F.col("pass_repetition"),
    )


def fingerprint(docs: DataFrame) -> DataFrame:
    """Order-sensitive content fingerprint (LLM-pipeline op): a
    positional polynomial over token hashes,
    ``Σ_i hash(tok_i) · i  mod (2³¹−1)`` — one ``aggregate`` pass per
    document, reproducible in any engine via the md5 hash convention.
    Detects reorderings that bag-of-tokens signatures (SimHash) miss."""
    toks = F.col("toks")
    fp = F.pmod(
        F.aggregate(
            F.zip_with(
                F.transform(toks, lambda t: F.pmod(det_hash_str(t), F.lit(MERSENNE31))),
                F.sequence(F.lit(1), F.size(toks)),
                lambda h, i: h * i.cast("bigint"),
            ),
            F.lit(0).cast("bigint"),
            lambda a, v: F.pmod(a + v, F.lit(MERSENNE31)),
        ),
        F.lit(MERSENNE31),
    )
    return _toked(docs).select(
        "doc_id",
        F.when(F.size(toks) > 0, fp).otherwise(F.lit(0).cast("bigint")).alias("fingerprint"),
        F.size(toks).cast("bigint").alias("n_tokens"),
    )


def pack_sequences(
    docs: DataFrame, seq_budget: int = 2048, n_shards: int = 32
) -> DataFrame:
    """Concatenate-then-chunk sequence packing: assign each document a
    position in the fixed-token-budget training sequences of its shard
    (the packing step of a GPT-style pretraining data pipeline, where
    documents are concatenated in order and the stream is cut every
    ``seq_budget`` tokens — documents MAY straddle a cut; first-fit
    no-straddle packing is a stateful variant of the same shard scan).

    Documents are sharded (``doc_id mod n_shards``) and concatenated
    within each shard in doc_id order; ``seq_id`` is the chunk holding
    the document's first token and ``offset`` its start position in
    that chunk. The running-sum window is per-shard — the property that
    matters at scale: a GLOBAL running sum is a single-partition window
    (one task sees every row), while per-shard packing is
    embarrassingly parallel and is what production packers do anyway
    (one packed stream per output shard).

    Output: (doc_id, shard, n_tokens, seq_id, offset). Every column is
    integer arithmetic over the deterministic token count —
    reproducible verbatim in the SQL oracle.
    """
    from pyspark.sql.window import Window

    counted = _toked(docs).select(
        "doc_id",
        F.pmod(F.col("doc_id"), F.lit(n_shards)).cast("int").alias("shard"),
        F.size(F.col("toks")).cast("bigint").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    before = (cum - F.col("n_tokens")).alias("cum_before")
    packed = counted.select("doc_id", "shard", "n_tokens", cum.alias("cum"), before)
    seq = F.floor(F.col("cum_before") / F.lit(seq_budget)).cast("bigint")
    return packed.select(
        "doc_id",
        "shard",
        "n_tokens",
        seq.alias("seq_id"),
        (F.col("cum_before") - seq * F.lit(seq_budget)).cast("bigint").alias("offset"),
    )


#: Output schema of the first-fit packer.
PACK_SCHEMA = (
    "doc_id bigint, shard int, n_tokens bigint, seq_id bigint, offset bigint"
)


def pack_sequences_firstfit(
    docs: DataFrame, seq_budget: int = 2048, n_shards: int = 32
) -> DataFrame:
    """First-fit (no-straddle) sequence packing: a document that would
    overflow the current training sequence starts a new one, so no
    document crosses a sequence boundary (the padding-free packing used
    when attention must not span documents).

    This is inherently a SEQUENTIAL scan — each document's placement
    depends on the running fill — which no window expression computes.
    The scale shape: shard the corpus, ``repartition`` by shard +
    ``sortWithinPartitions`` (shard, doc_id), then a ``mapInPandas``
    generator that carries {shard: (fill, seq)} state ACROSS Arrow
    batches inside the partition. Memory is bounded by the batch size
    — not the shard — because mapInPandas streams, unlike a grouped
    applyInPandas which materializes the whole group. Documents longer
    than the budget occupy a sequence of their own.

    The DuckDB oracle replays the same recurrence as a recursive CTE,
    so even this stateful operator is value-checked, not rows-only.
    """
    from typing import Iterator

    counted = _toked(docs).select(
        "doc_id",
        F.pmod(F.col("doc_id"), F.lit(n_shards)).cast("int").alias("shard"),
        F.size(F.col("toks")).cast("bigint").alias("n_tokens"),
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        state: dict[int, tuple[int, int]] = {}  # shard -> (fill, seq)
        for pdf in batches:
            seqs, offs = [], []
            for shard, n in zip(pdf["shard"], pdf["n_tokens"]):
                fill, seq = state.get(int(shard), (0, 0))
                if fill > 0 and fill + int(n) > seq_budget:
                    seq += 1
                    fill = 0
                seqs.append(seq)
                offs.append(fill)
                state[int(shard)] = (fill + int(n), seq)
            out = pdf[["doc_id", "shard", "n_tokens"]].copy()
            out["seq_id"] = seqs
            out["offset"] = offs
            yield out

    return (
        counted.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "doc_id")
        .mapInPandas(gen, PACK_SCHEMA)
    )


EMAIL_RE = r"[a-z0-9]+@[a-z0-9]+\.[a-z]+"
PHONE_RE = r"555-01[0-9][0-9]"


def pii_redact(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """PII scrub (LLM-pipeline op): find-and-mask email/phone patterns
    in one pass — ``regexp_extract_all`` for the per-doc find counts
    (the audit trail a compliance pipeline must emit) and nested
    ``regexp_replace`` for the masked text. Pure JVM expressions, zero
    shuffles at any scale; patterns restricted to the regex dialect
    intersection (no lookaround) so Java (Spark) and RE2-family
    (DuckDB) engines agree — the same cross-engine constraint as
    functions/text.py. Returns per-doc counts + redacted length; the
    corpus rollup composes on top."""
    t = F.col(text_col)
    emails = F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), F.lit(0)))
    phones = F.size(F.regexp_extract_all(t, F.lit(PHONE_RE), F.lit(0)))
    red = F.regexp_replace(
        F.regexp_replace(t, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )
    return docs.withColumn("n_emails", emails.cast("bigint")).withColumn(
        "n_phones", phones.cast("bigint")
    ).withColumn("redacted", red)


def boilerplate_shingle_scores(
    docs: DataFrame, n: int = 5, min_df: int = 3
) -> DataFrame:
    """Per-source boilerplate detection + per-document boilerplate
    ratio (LLM-pipeline op): the shingle-level analog of C4/RefinedWeb
    line-frequency boilerplate removal for corpora without line
    structure. A word ``n``-gram that appears in ≥ ``min_df`` DISTINCT
    documents of the SAME source is template content (footers, nav
    chrome, license banners — whatever the source stamps on everything
    it emits), not prose; each document is scored by how much of it is
    such template material, the signal a cleaning pipeline thresholds
    on before near-dup detection ever runs.

    Shape (and why it scales): per-document-distinct shingles come out
    of one zero-shuffle projection (``explode(array_distinct(...))``
    inline in the generator — the dedup.doc_shingles_local discipline;
    exploding an attribute that aliases the ngram expression is the
    known 40x InferFiltersFromGenerate trap). Per-doc totals and the
    per-(source, shingle) document-frequency table are two map-side-
    combinable aggregations of that stream; the join back ships ONLY
    the boilerplate shingles (df ≥ min_df — a tiny, heavily-filtered
    build side: template grams are by definition few and frequent), so
    the 100 TB cost is two aggregations of the shingle stream plus a
    join whose right side is the template dictionary. The ratio is
    emitted in exact integer parts-per-million (multiply-then-DIV) —
    no float summation anywhere.

    Requires ``doc_id``, ``source``, and ``text`` columns. Documents
    with fewer than ``n`` tokens have no shingles and drop out (same
    convention as every shingle consumer here).
    """
    from .guards import require_at_least

    require_at_least("n", n, 1)
    require_at_least("min_df", min_df, 1)
    toked = docs.select(
        "doc_id", "source", tokens(F.col("text")).alias("toks")
    )
    sh = toked.select(
        "doc_id",
        "source",
        F.explode(
            F.array_distinct(word_ngrams(F.col("toks"), n))
        ).alias("shingle"),
    )
    totals = sh.groupBy("doc_id", "source").agg(
        F.count("*").alias("n_shingles")
    )
    boiler = (
        sh.groupBy("source", "shingle")
        .agg(F.count("*").alias("df"))  # shingles distinct per doc
        .filter(F.col("df") >= min_df)
        .select("source", "shingle")
    )
    nb = (
        sh.join(boiler, ["source", "shingle"])
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_boiler"))
    )
    return totals.join(nb, "doc_id", "left").select(
        "doc_id",
        "source",
        "n_shingles",
        F.coalesce(F.col("n_boiler"), F.lit(0)).cast("bigint").alias("n_boiler"),
        F.expr(
            "CAST(coalesce(n_boiler, 0) * 1000000 DIV n_shingles AS BIGINT)"
        ).alias("boiler_ppm"),
    )
