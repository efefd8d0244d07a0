"""Query registry: every implemented operator as a (Spark, oracle-SQL) pair.

This is the driver-contract surface (``__spark_entry__.py`` is a thin shim
over it) and the engine's own acceptance suite. Each entry is a named
query from the SURVEY.md §2 inventory (reference ops Q1-Q22, extensions
X1-X14, plus the LLM-pipeline operators): a callable
``(spark, sf_dir) -> DataFrame`` built on the library operators, and an
ANSI-SQL oracle DuckDB runs over the same parquet tables.

Cross-engine determinism rules (SURVEY.md §7 hard parts):

- **Money stays integral.** Monetary columns are exact 2-decimal doubles;
  every aggregate first converts to integer cents
  (``CAST(ROUND(x*100, 0) AS BIGINT)``) so sums are exact integers and
  derived ratios are single double divisions — bit-identical in any
  engine, no rounding tolerance needed.
- **Regressions from exact sums.** Grouped linear fits are computed from
  integer moment sums ``(n, Σx, Σy, Σxy, Σx²)`` instead of the (order-
  sensitive) ``regr_slope`` accumulator. ``regr_slope`` itself is
  exercised in the unit tests against numpy.
- **No engine-native RNG/hash.** Deterministic sampling uses the
  documented multiplicative-hash convention in ``functions/hashing.py``;
  strings hash via md5 (identical everywhere).
- **Ties never decide.** Every LIMIT / top-k / first-wins picks rows by a
  key that is unique (or hashed injectively), so the selected row *set*
  is identical in both engines.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .functions.hashing import (
    KNUTH,
    MOD32,
    det_hash_i64,
    duckdb_det_hash_i64,
)
from .sources import load_table


@dataclass
class QuerySpec:
    """One registry entry: Spark implementation + DuckDB oracle."""

    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None => non-SQL-expressible; rows-only check
    survey_ids: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, QuerySpec] = {}


def _register(name, oracle, survey_ids=()):
    def deco(fn):
        _REGISTRY[name] = QuerySpec(name, fn, oracle, tuple(survey_ids))
        return fn

    return deco


#: Driver-facing priority order. The driver's correctness harness checks
#: the FIRST 50 registered queries only (CORRECTNESS_r01 cut exactly at
#: 50), so the first 50 names here must cover every SURVEY §2 id — one
#: primary query per operator family, redundant variants after the
#: window. tests/test_registry_order.py asserts the invariant: the
#: survey-id union of the first 50 equals the union over all queries.
#: The driver value-checks the FIRST 50 registered queries. The window
#: ROTATES per round (VERDICT r7 item 6): each slot is filled by a
#: same-SURVEY-id variant that has not yet had driver-grade evidence,
#: while `tests/test_registry_order.py` enforces that every in-scope
#: SURVEY §2 id keeps at least one claimant inside the window. Round-8
#: rotation: 27 slots swapped to first-time occupants (the r1-r7
#: window was identical every round; its members all carry seven
#: rounds of driver evidence already).
PRIORITY: tuple[str, ...] = (
    # --- round-12 rotation: 41 first-time window members — the final
    # tranche of the never-driver-windowed pool (VERDICT r11 item 1).
    # 4 pool members with heavily-evidenced siblings ride to r13
    # (q11_threshold_sample, mm_decode_features_png,
    # s19_incremental_rollup, x14_map_in_arrow) because the minimal
    # SURVEY-id anchor cover needs 9 slots, not 5: Q19 lives only in
    # echem_flagship, and Q4/Q9/Q10/S5/X1 + the Q5-Q8 pairs have no
    # shared claimant among the fresh 41.
    # storage / table-maintenance tail
    "s01_corrupt_tolerant_read",
    "s01_dynamic_overwrite",
    "s01_sorted_layout_scan",
    "s02_csv_quarantine",
    "s02_multi_format_union",
    "s03_merge_delete",
    "s15_bloom_prune",
    "s15_skew_report",
    # audit / data-quality tail
    "s18_dq_audit",
    "s18_fd_violations",
    "s18_l_diversity",
    "s18_snapshot_diff",
    "s18_table_checksum",
    "s19_retractable_rollup",
    "q21_observed_load",
    # sampling
    "q11_weighted_sample",
    # graph quality filters
    "x05_bfs_distances",
    "x05_hierarchy_flatten",
    "x05_interval_overlap",
    "x05_kcore",
    "x05_triangle_counts",
    # calendar / sessionization tail
    "x07_activity_streaks",
    "x07_calendar_spine",
    "x08_json_quarantine",
    "x09_funnel_steps",
    "x09_interval_merge",
    "x09_session_window_native",
    # text-analysis tail
    "t13_bm25_topk",
    "t13_boilerplate_shingles",
    "t13_difficulty_buckets",
    "t13_pack_sequences",
    "t13_quality_gate",
    "t13_rare_bigram_score",
    "t13_repetition",
    # UDF/UDTF surface tail + multimodal
    "x14_batch_inference",
    "x14_polymorphic_udtf",
    "x14_udaf_median",
    "x14_udtf_chunks",
    "x14_udtf_table_args",
    "mm_decode_features_parquet",
    # streaming custom sink (completes the 2x2 data-source surface)
    "x10_stream_custom_sink",
    # --- carried core: minimal greedy cover so every SURVEY §2 id
    # keeps >=1 claimant inside the 50-slot window
    # (tests/test_registry_order.py) ---
    "pipeline_reference_e2e",
    "echem_flagship",
    "q04_string_to_digits",
    "q05_last_match_per_key",
    "q08_scalar_arithmetic",
    "q09_path_strings",
    "q10_serializer_expr",
    "s05_chart_sink",
    "x01_group_topk",
)


def all_queries() -> dict[str, QuerySpec]:
    # Late import so the extension registries (text/dedup/similarity,
    # UDF/streaming surfaces) self-register exactly once.
    from . import registry_llm, registry_surfaces  # noqa: F401

    unknown = [n for n in PRIORITY if n not in _REGISTRY]
    if unknown:
        raise KeyError(f"PRIORITY names not registered: {unknown}")
    ordered = {n: _REGISTRY[n] for n in PRIORITY}
    for n, spec in _REGISTRY.items():
        if n not in ordered:
            ordered[n] = spec
    return ordered


def _ld(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


def _cents(col) -> F.Column:
    """Exact integer cents from a 2-decimal double column."""
    return F.round(col * 100, 0).cast("bigint")


def _pct(col) -> F.Column:
    """Exact integer percent from a 2-decimal fraction column."""
    return F.round(col * 100, 0).cast("bigint")


# SQL spelling of the same conversions (DuckDB).
_SQL_CENTS = "CAST(ROUND({c} * 100, 0) AS BIGINT)"


# =====================================================================
# Flagship — the reference's analytical core on the test corpus
# =====================================================================


@_register(
    "echem_flagship",
    oracle="""
    WITH m AS (
        SELECT l_suppkey,
               CAST(l_quantity AS BIGINT)                    AS x,
               CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS y
        FROM lineitem
    ),
    fit AS (
        SELECT l_suppkey,
               COUNT(*)                        AS n_obs,
               SUM(x)                          AS sx,
               SUM(y)                          AS sy,
               SUM(x * y)                      AS sxy,
               SUM(x * x)                      AS sxx,
               MAX(CASE WHEN x = 1 THEN y END) AS anchor_cents
        FROM m GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, n.n_name,
           f.n_obs,
           CAST(f.n_obs * f.sxy - f.sx * f.sy AS DOUBLE)
             / CAST(f.n_obs * f.sxx - f.sx * f.sx AS DOUBLE) / 100.0
             AS slope_price_per_qty,
           (CAST(f.sy AS DOUBLE) - CAST(f.n_obs * f.sxy - f.sx * f.sy AS DOUBLE)
             / CAST(f.n_obs * f.sxx - f.sx * f.sx AS DOUBLE)
             * CAST(f.sx AS DOUBLE)) / CAST(f.n_obs AS DOUBLE) / 100.0
             AS intercept_price,
           CAST(f.anchor_cents AS DOUBLE) / 100.0 AS anchor_price_q1
    FROM fit f
    JOIN supplier s ON s.s_suppkey = f.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    ORDER BY s.s_suppkey
    """,
    survey_ids=("Q17", "Q18", "Q19", "Q20", "Q22"),
)
def echem_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's ``analyze_electrochem`` shape on the test corpus.

    Mirrors ``my_dag.py:140-184``: a long-format metrics table grouped per
    key, a linear least-squares fit per group (capacitance analogue,
    ``np.polyfit`` at ``my_dag.py:171``), an anchor-row lookup inside the
    group (``nes[1]`` at ``my_dag.py:164``), then a join to dimensions for
    the final result row (``my_dag.py:184``).

    Physically: one shuffle (groupBy suppkey) with map-side partial
    aggregation of the integer moment sums, then two broadcast joins to
    the small dims. Scales linearly in fact rows; no window, no sort.
    """
    li = _ld(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey"),
        F.col("l_quantity").cast("bigint").alias("x"),
        _cents(F.col("l_extendedprice")).alias("y"),
    )
    fit = li.groupBy("l_suppkey").agg(
        F.count("*").alias("n_obs"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.max(F.when(F.col("x") == 1, F.col("y"))).alias("anchor_cents"),
    )
    num = (F.col("n_obs") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (F.col("n_obs") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    slope = num / den
    sup = _ld(spark, sf_dir, "supplier")
    nat = _ld(spark, sf_dir, "nation")
    return (
        fit.withColumn("slope_price_per_qty", slope / 100.0)
        .withColumn(
            "intercept_price",
            (F.col("sy").cast("double") - slope * F.col("sx").cast("double"))
            / F.col("n_obs").cast("double")
            / 100.0,
        )
        .withColumn("anchor_price_q1", F.col("anchor_cents").cast("double") / 100.0)
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "s_suppkey",
            "s_name",
            "n_name",
            "n_obs",
            "slope_price_per_qty",
            "intercept_price",
            "anchor_price_q1",
        )
        # no final orderBy: the driver compare is order-insensitive and a
        # global sort would add a range-partitioning exchange for nothing
    )


# =====================================================================
# Q1-Q9: scans, projection, casts, scalar transforms
# =====================================================================


@_register(
    "q01_pushdown_scan",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_partkey, l_quantity,
           CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS price_cents
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-06-01' AND l_quantity < 5
    """,
    survey_ids=("Q1", "Q3", "Q7"),
)
def q01_pushdown_scan(spark, sf_dir):
    """Source scan with pushed predicate + pruned columns (Q1/Q3).

    The reference pushes ``chemsys``/``possible_species`` filters to the
    Materials API server (``my_dag.py:28-29``); here the filter and the
    5-column projection reach the parquet reader via Catalyst
    (``PushedFilters`` asserted in tests/test_plans.py).
    """
    li = _ld(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1995-06-01").cast("timestamp"))
        & (F.col("l_quantity") < 5)
    ).select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "l_quantity",
        _cents(F.col("l_extendedprice")).alias("price_cents"),
    )


@_register(
    "q02_keylist_scan",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_size
    FROM part
    WHERE p_partkey IN (1, 7, 42, 99, 123, 500, 777, 1024, 1500, 1999)
    """,
    survey_ids=("Q2",),
)
def q02_keylist_scan(spark, sf_dir):
    """Scan by explicit key list — ``search(material_ids=ids)`` semantics
    (``my_dag.py:69-70``). ``isin`` compiles to an IN filter pushed to the
    parquet row-group stats; for large key sets the engine switches to a
    broadcast left-semi join (tests cover both forms)."""
    keys = [1, 7, 42, 99, 123, 500, 777, 1024, 1500, 1999]
    return (
        _ld(spark, sf_dir, "part")
        .filter(F.col("p_partkey").isin(keys))
        .select("p_partkey", "p_name", "p_brand", "p_size")
    )


@_register(
    "q02_keylist_semijoin",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_size
    FROM part
    WHERE p_partkey IN (1, 7, 42, 99, 123, 500, 777, 1024, 1500, 1999)
    """,
    survey_ids=("Q2", "X5"),
)
def q02_keylist_semijoin(spark, sf_dir):
    """The same key-list scan as a broadcast left-semi join against a
    key DataFrame — the form that scales past IN-list limits (millions
    of keys arrive as a table, not a literal). Identical oracle to
    q02_keylist_scan: the two physical strategies must agree exactly."""
    keys = [1, 7, 42, 99, 123, 500, 777, 1024, 1500, 1999]
    key_df = spark.createDataFrame([(k,) for k in keys], "p_partkey bigint")
    return (
        _ld(spark, sf_dir, "part")
        .join(F.broadcast(key_df), "p_partkey", "left_semi")
        .select("p_partkey", "p_name", "p_brand", "p_size")
    )


@_register(
    "q04_string_to_digits",
    oracle="""
    SELECT p_partkey,
           unnest(range(1, len(CAST(p_size AS VARCHAR)) + 1)) AS pos,
           CAST(unnest(regexp_extract_all(CAST(p_size AS VARCHAR), '.')) AS INTEGER)
             AS digit
    FROM part
    WHERE p_partkey <= 200
    """,
    survey_ids=("Q4",),
)
def q04_string_to_digits(spark, sf_dir):
    """String → typed array cast, exploded with position (Q4).

    The reference turns facet ``"111"`` into ``[1,1,1]``
    (``my_dag.py:83``); here each part's size string becomes
    (pos, digit) rows via ``posexplode`` over a char split — array
    construction and generation stay in codegen."""
    p = (
        _ld(spark, sf_dir, "part")
        .filter(F.col("p_partkey") <= 200)
        .select("p_partkey", F.col("p_size").cast("string").alias("s"))
    )
    return p.select(
        "p_partkey",
        F.posexplode(F.expr("regexp_extract_all(s, '(.)', 1)")).alias("pos0", "d"),
    ).select(
        "p_partkey",
        (F.col("pos0") + 1).cast("bigint").alias("pos"),
        F.col("d").cast("int").alias("digit"),
    )


@_register(
    "q08_scalar_arithmetic",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           CAST({_SQL_CENTS.format(c='l_extendedprice')}
                * (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT)) AS DOUBLE)
             / 10000.0 AS disc_price,
           CAST({_SQL_CENTS.format(c='l_extendedprice')}
                * (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT))
                * (100 + CAST(ROUND(l_tax * 100, 0) AS BIGINT)) AS DOUBLE)
             / 1000000.0 AS charged_price,
           l_quantity * -27.2114 - 4.66 AS pzc_style
    FROM lineitem
    WHERE l_orderkey <= 2000
    """,
    survey_ids=("Q7", "Q8"),
)
def q08_scalar_arithmetic(spark, sf_dir):
    """Scalar arithmetic expressions (Q8): the reference's unit-conversion
    chains (``pzc = mu*-27.2114 - 4.66``, area/ρ formulas,
    ``my_dag.py:164-170``) as plain Column arithmetic — constants folded
    by Catalyst, everything in whole-stage codegen."""
    li = _ld(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 2000)
    pc = _cents(F.col("l_extendedprice"))
    dp = _pct(F.col("l_discount"))
    tp = _pct(F.col("l_tax"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        ((pc * (100 - dp)).cast("double") / 10000.0).alias("disc_price"),
        ((pc * (100 - dp) * (100 + tp)).cast("double") / 1000000.0).alias(
            "charged_price"
        ),
        (F.col("l_quantity") * -27.2114 - 4.66).alias("pzc_style"),
    )


@_register(
    "q09_path_strings",
    oracle="""
    SELECT doc_id,
           source || '/' || CAST(doc_id AS VARCHAR) || '.txt' AS path,
           regexp_extract(source || '/' || CAST(doc_id AS VARCHAR) || '.txt',
                          '([^/]+)[.]txt$', 1) AS stem,
           str_split(source || '/' || CAST(doc_id AS VARCHAR) || '.txt', '/')[-1]
             AS basename
    FROM documents
    """,
    survey_ids=("Q9",),
)
def q09_path_strings(spark, sf_dir):
    """Path/string functions (Q9): filename assembly (f-strings at
    ``my_dag.py:95,131``) and stem extraction (``Path(p).stem``,
    ``my_dag.py:122``) as concat/regexp/split expressions."""
    d = _ld(spark, sf_dir, "documents")
    path = F.concat_ws("/", F.col("source"), F.concat(F.col("doc_id").cast("string"), F.lit(".txt")))
    return d.select(
        "doc_id",
        path.alias("path"),
        F.regexp_extract(path, r"([^/]+)\.txt$", 1).alias("stem"),
        F.element_at(F.split(path, "/"), -1).alias("basename"),
    )


# =====================================================================
# Q5/Q6: pattern extraction + last-match-per-key (on the events table)
# =====================================================================


@_register(
    "q05_last_match_per_key",
    oracle="""
    WITH matched AS (
        SELECT user_id, event_id, ts,
               CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE event_type = 'error'
    )
    SELECT user_id, event_id, ts, k FROM matched WHERE rn = 1
    """,
    survey_ids=("Q5", "Q6", "X8"),
)
def q05_last_match_per_key(spark, sf_dir):
    """Filter-matching-records + keep-LAST-per-key (Q5/Q6) with a typed
    field extraction (X8). Mirrors the solver-log parse loop
    (``my_dag.py:152-158``) where later matches overwrite earlier ones:
    here, each user's final ``error`` event wins (ties broken by
    event_id so the row set is engine-independent)."""
    ev = _ld(spark, sf_dir, "events").filter(F.col("event_type") == "error")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.select(
            "user_id",
            "event_id",
            "ts",
            F.get_json_object("props", "$.k").cast("int").alias("k"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


# =====================================================================
# Q11/Q12: deterministic sampling
# =====================================================================


@_register(
    "q11_det_sample",
    oracle=f"""
    SELECT c_custkey, h AS sample_order
    FROM (SELECT c_custkey, {duckdb_det_hash_i64('c_custkey', 27)} AS h
          FROM customer)
    ORDER BY h, c_custkey
    LIMIT 100
    """,
    survey_ids=("Q11",),
)
def q11_det_sample(spark, sf_dir):
    """Deterministic sample-n (Q11): the reference's
    ``random.seed(27); random.sample(bulk_ids, n)`` (``my_dag.py:55-57``)
    re-expressed as order-by-multiplicative-hash + limit. The hash is
    injective over the key range, so the sampled row SET is exactly
    reproducible in any engine — unlike engine-native ``rand(seed)``."""
    c = _ld(spark, sf_dir, "customer")
    return (
        c.select("c_custkey", det_hash_i64(F.col("c_custkey"), 27).alias("sample_order"))
        .orderBy("sample_order", "c_custkey")
        .limit(100)
    )


@_register(
    "q11_stratified_sample",
    oracle=f"""
    SELECT o_orderpriority, o_orderkey
    FROM (SELECT o_orderpriority, o_orderkey,
                 ROW_NUMBER() OVER (
                     PARTITION BY o_orderpriority
                     ORDER BY {duckdb_det_hash_i64('o_orderkey', 11)}, o_orderkey
                 ) AS rn
          FROM orders)
    WHERE rn <= 20
    """,
    survey_ids=("Q11", "X4"),
)
def q11_stratified_sample(spark, sf_dir):
    """Exact-20-per-stratum deterministic sample of orders by priority
    class — the training-data-mixing quota draw (pipeline.py::
    stratified_sample_by_hash); reproducible in any engine via the
    multiplicative key hash."""
    o = _ld(spark, sf_dir, "orders")
    from .pipeline import stratified_sample_by_hash

    return stratified_sample_by_hash(
        o.select("o_orderpriority", "o_orderkey"),
        ["o_orderpriority"], "o_orderkey", 20, seed=11,
    )


@_register(
    "q11_split_assign",
    oracle=f"""
    SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(doc_id) AS BIGINT) AS id_checksum
    FROM (SELECT doc_id,
                 CASE WHEN b < 80 THEN 'train'
                      WHEN b < 90 THEN 'val'
                      ELSE 'test' END AS split
          FROM (SELECT doc_id,
                       {duckdb_det_hash_i64('doc_id', 7)} % 100 AS b
                FROM documents))
    GROUP BY split
    """,
    survey_ids=("Q11",),
)
def q11_split_assign(spark, sf_dir):
    """Deterministic 80/10/10 train/val/test assignment by key hash
    (pipeline.py::split_assign) — summarized per split (count + id
    checksum) so the whole assignment is value-checked."""
    d = _ld(spark, sf_dir, "documents")
    from .pipeline import split_assign

    return (
        split_assign(d.select("doc_id"), "doc_id", seed=7)
        .groupBy("split")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("doc_id").cast("bigint").alias("id_checksum"),
        )
    )


@_register(
    "q11_weighted_sample",
    oracle=f"""
    SELECT doc_id, n_chars AS weight
    FROM (SELECT doc_id, n_chars,
                 ln(({duckdb_det_hash_i64('doc_id', 41)} + 1)
                    / 4294967296.0) / n_chars AS k
          FROM documents WHERE n_chars > 0)
    ORDER BY k DESC, doc_id LIMIT 100
    """,
    survey_ids=("Q11",),
)
def q11_weighted_sample(spark, sf_dir):
    """Deterministic weighted sampling WITHOUT replacement (Q11's
    corpus-mixing big sibling): Efraimidis-Spirakis A-ES exponential
    keys — each doc draws key ln(u)/w with u a deterministic uniform
    from the multiplicative key hash and w = n_chars, and the global
    top-100 keys ARE a weight-proportional sample without replacement.
    The one-pass top-k shape (orderBy + limit plans as
    TakeOrderedAndProject: per-partition heap, driver merges k rows
    per partition) is the 100 TB path — no global sort, no window.
    Only integer columns are emitted; the float key stays internal, so
    cross-engine ln() agreement only has to ORDER identically
    (adjacent order-statistic gaps at this cardinality are ~1e-8
    relative; libm disagreement is ≤1 ulp ~ 1e-16 — nine orders of
    margin, and the fixed test corpus freezes the draw). Replaces the
    reference's unweighted ``random.sample`` (my_dag.py:55-57) with
    the mixture-weighting production variant."""
    d = _ld(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u = (det_hash_i64(F.col("doc_id"), 41) + 1) / F.lit(4294967296.0)
    return (
        d.select(
            "doc_id",
            F.col("n_chars").alias("weight"),
            (F.log(u) / F.col("n_chars")).alias("k"),
        )
        .orderBy(F.desc("k"), "doc_id")
        .limit(100)
        .select("doc_id", "weight")
    )


@_register(
    "q11_threshold_sample",
    oracle=f"""
    WITH c AS (SELECT o_orderpriority, COUNT(*) AS n
               FROM orders GROUP BY 1),
    h AS (SELECT o_orderpriority, o_orderkey,
                 {duckdb_det_hash_i64('o_orderkey', 11)} AS h
          FROM orders)
    SELECT h.o_orderpriority, h.o_orderkey
    FROM h JOIN c USING (o_orderpriority)
    WHERE CAST(h.h AS DOUBLE) <
          least(CAST(4294967296 AS DOUBLE),
                CAST(20 AS DOUBLE) / CAST(c.n AS DOUBLE) * 4294967296)
    """,
    survey_ids=("Q11",),
)
def q11_threshold_sample(spark, sf_dir):
    """The GIANT-STRATUM threshold sampler: ~20 orders per priority via
    a per-stratum hash cutoff (count-agg → broadcast cutoffs → pushed
    per-row filter) — no per-stratum total order, so no single-task
    stratum bottleneck at 100 TB; approximate counts are the declared
    trade vs q11_stratified_sample's exact ranks. The cutoff arithmetic
    (one double division and multiply) is replayed verbatim in the
    oracle, so the selected row SET is engine-exact even though the
    count is binomial. pipeline.py::stratified_sample_threshold."""
    o = _ld(spark, sf_dir, "orders")
    from .pipeline import stratified_sample_threshold

    return stratified_sample_threshold(
        o.select("o_orderpriority", "o_orderkey"),
        ["o_orderpriority"], "o_orderkey", 20, seed=11,
    )


@_register(
    "q12_det_pick_one",
    oracle=f"""
    SELECT o_orderkey, o_custkey, o_orderstatus
    FROM (SELECT o_orderkey, o_custkey, o_orderstatus,
                 {duckdb_det_hash_i64('o_orderkey', 20)} AS h
          FROM orders)
    ORDER BY h, o_orderkey
    LIMIT 1
    """,
    survey_ids=("Q12",),
)
def q12_det_pick_one(spark, sf_dir):
    """Deterministic pick-one (Q12): ``random.seed(20);
    random.sample(dirs, 1)`` (``my_dag.py:109-111``) as a hash-ordered
    ``LIMIT 1`` — a one-row reduction, no full sort needed at scale
    (Spark executes it as a TakeOrderedAndProject)."""
    o = _ld(spark, sf_dir, "orders")
    return (
        o.withColumn("h", det_hash_i64(F.col("o_orderkey"), 20))
        .orderBy("h", "o_orderkey")
        .limit(1)
        .select("o_orderkey", "o_custkey", "o_orderstatus")
    )


# =====================================================================
# Q13-Q15: generation (cross join + explode) and per-group indexing
# =====================================================================


@_register(
    "q13_generate_grid",
    oracle="""
    SELECT n.n_nationkey, n.n_name, g.charge,
           printf('%s_%.1f', n.n_name, g.charge) AS run_id
    FROM nation n
    CROSS JOIN (VALUES (CAST(-0.1 AS DOUBLE)), (CAST(0.0 AS DOUBLE)),
                        (CAST(0.1 AS DOUBLE))) g(charge)
    """,
    survey_ids=("Q13", "Q15", "Q9"),
)
def q13_generate_grid(spark, sf_dir):
    """1:N generation (Q13/Q15): the bulk×facet slab expansion
    (``my_dag.py:78-99``) and the charge-grid fan-out (``my_dag.py:128``)
    as explode over a literal array — generation happens inside codegen,
    no shuffle. Run-id assembly mirrors the ``f'{id}_{charge}'`` filename
    (``my_dag.py:131``)."""
    n = _ld(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        "n_name",
        F.explode(F.array(F.lit(-0.1), F.lit(0.0), F.lit(0.1))).alias("charge"),
    ).withColumn("run_id", F.format_string("%s_%.1f", F.col("n_name"), F.col("charge")))


@_register(
    "q14_group_index",
    oracle="""
    SELECT c_nationkey, c_custkey,
           CAST(ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                   ORDER BY c_acctbal DESC, c_custkey) - 1
                AS INTEGER) AS idx
    FROM customer
    """,
    survey_ids=("Q14", "X4"),
)
def q14_group_index(spark, sf_dir):
    """Per-group index assignment (Q14): ``enumerate(slabs)`` within
    (material, facet) (``my_dag.py:93``) as a 0-based ``row_number``
    window with a total order (acctbal desc, custkey tie-break)."""
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        _ld(spark, sf_dir, "customer")
        .select(
            "c_nationkey",
            "c_custkey",
            (F.row_number().over(w) - 1).alias("idx"),
        )
    )


# =====================================================================
# Q16: first-wins upsert (conflict-skip) semantics
# =====================================================================


@_register(
    "q16_upsert_first_wins",
    oracle="""
    WITH incoming AS (
        SELECT o_custkey AS key, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn
        FROM orders
    ),
    winners AS (
        SELECT key, o_orderkey AS won_orderkey,
               CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS won_cents
        FROM incoming WHERE rn = 1
    )
    SELECT w.key, w.won_orderkey, w.won_cents
    FROM winners w
    ANTI JOIN (SELECT c_custkey FROM customer WHERE c_custkey % 5 = 0) e
      ON w.key = e.c_custkey
    """,
    survey_ids=("Q16", "S3"),
)
def q16_upsert_first_wins(spark, sf_dir):
    """Upsert with conflict-skip (Q16/S3): ``INSERT .. ON CONFLICT (MP_id)
    DO NOTHING`` (``my_dag.py:201-202``) = first-wins dedup of the
    incoming batch (deterministic ``row_number()==1``, NOT
    ``dropDuplicates`` which is partition-order arbitrary) + left-anti
    join against existing keys. Idempotence (re-run-twice is a no-op) is
    tested in tests/test_upsert.py."""
    orders = _ld(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    winners = (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("o_custkey").alias("key"),
            F.col("o_orderkey").alias("won_orderkey"),
            _cents(F.col("o_totalprice")).alias("won_cents"),
        )
    )
    existing = (
        _ld(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 5 == 0)
        .select(F.col("c_custkey").alias("key"))
    )
    return winners.join(existing, "key", "left_anti")


# =====================================================================
# Q17/Q21/Q22: joins and grouped aggregation
# =====================================================================


@_register(
    "q17_multi_join",
    oracle="""
    SELECT n.n_name, r.r_name,
           COUNT(*) AS n_li,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT)
                    * (100 - CAST(ROUND(l.l_discount * 100, 0) AS BIGINT)))
                AS BIGINT) AS revenue_c4
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY n.n_name, r.r_name
    """,
    survey_ids=("Q17", "Q21"),
)
def q17_multi_join(spark, sf_dir):
    """Fact-to-dimension join chain (Q17) + grouped rollup of exact
    integer revenue. All three dims broadcast (no shuffle on the fact
    side until the final 25-group aggregation); mirrors the
    metrics↔geometry join at ``my_dag.py:166-168`` writ large."""
    li = _ld(spark, sf_dir, "lineitem")
    s = _ld(spark, sf_dir, "supplier")
    n = _ld(spark, sf_dir, "nation")
    r = _ld(spark, sf_dir, "region")
    rev = _cents(F.col("l_extendedprice")) * (100 - _pct(F.col("l_discount")))
    return (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name", "r_name")
        .agg(F.count("*").alias("n_li"), F.sum(rev).alias("revenue_c4"))
    )


@_register(
    "q21_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)
             AS sum_base_cents,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
               * (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT))) AS BIGINT)
             AS sum_disc_c4,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS DOUBLE)
             / COUNT(*) / 100.0 AS avg_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-01'
    GROUP BY l_returnflag, l_linestatus
    """,
    survey_ids=("Q21", "Q22", "X7"),
)
def q21_pricing_summary(spark, sf_dir):
    """TPC-H-Q1-style pricing summary (the Q21/Q22 count-and-assemble
    surface at scale): filtered scan → 4-group hash aggregation with
    map-side combine. Averages are single divisions of exact integer
    sums, so results are bit-identical across engines."""
    li = _ld(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp")
    )
    qty = F.col("l_quantity").cast("bigint")
    pc = _cents(F.col("l_extendedprice"))
    disc = 100 - _pct(F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(qty).alias("sum_qty"),
        F.sum(pc).alias("sum_base_cents"),
        F.sum(pc * disc).alias("sum_disc_c4"),
        (F.sum(qty).cast("double") / F.count("*")).alias("avg_qty"),
        (F.sum(pc).cast("double") / F.count("*") / 100.0).alias("avg_price"),
        F.count("*").alias("count_order"),
    )


# =====================================================================
# X1-X5: sort/top-k, set ops, rollup, analytic windows, join family
# =====================================================================


@_register(
    "x01_topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS total_cents
    FROM orders
    ORDER BY total_cents DESC, o_orderkey
    LIMIT 10
    """,
    survey_ids=("X1",),
)
def x01_topk_orders(spark, sf_dir):
    """Global top-k (X1): ORDER BY + LIMIT plans as TakeOrderedAndProject
    — a per-partition heap + driver merge of k rows, never a full sort.
    Tie-broken on the unique order key so the selected set is stable."""
    o = _ld(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey", "o_custkey", _cents(F.col("o_totalprice")).alias("total_cents")
        )
        .orderBy(F.col("total_cents").desc(), "o_orderkey")
        .limit(10)
    )


@_register(
    "x01_group_topk",
    oracle="""
    SELECT c_nationkey, c_custkey, c_acctbal, rk
    FROM (SELECT c_nationkey, c_custkey, c_acctbal,
                 CAST(ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                         ORDER BY c_acctbal DESC, c_custkey)
                      AS INTEGER) AS rk
          FROM customer)
    WHERE rk <= 3
    """,
    survey_ids=("X1", "X4"),
)
def x01_group_topk(spark, sf_dir):
    """Per-group top-k (X1/X4): row_number window + filter. One shuffle
    on the group key; with AQE, skewed groups split. rank<=k filters
    push below the window's sort via Spark's WindowGroupLimit at scale."""
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        _ld(spark, sf_dir, "customer")
        .select(
            "c_nationkey",
            "c_custkey",
            "c_acctbal",
            F.row_number().over(w).alias("rk"),
        )
        .filter(F.col("rk") <= 3)
    )


@_register(
    "x02_set_ops",
    oracle="""
    WITH k95 AS (SELECT DISTINCT o_custkey FROM orders
                 WHERE o_orderdate >= TIMESTAMP '1995-01-01'
                   AND o_orderdate < TIMESTAMP '1996-01-01'),
         k96 AS (SELECT DISTINCT o_custkey FROM orders
                 WHERE o_orderdate >= TIMESTAMP '1996-01-01'
                   AND o_orderdate < TIMESTAMP '1997-01-01')
    SELECT 'both' AS bucket, o_custkey FROM (SELECT * FROM k95 INTERSECT SELECT * FROM k96)
    UNION ALL
    SELECT 'only95' AS bucket, o_custkey FROM (SELECT * FROM k95 EXCEPT SELECT * FROM k96)
    UNION ALL
    SELECT 'only96' AS bucket, o_custkey FROM (SELECT * FROM k96 EXCEPT SELECT * FROM k95)
    """,
    survey_ids=("X2",),
)
def x02_set_ops(spark, sf_dir):
    """Set operations (X2): INTERSECT / EXCEPT / UNION ALL over yearly
    customer key sets. Spark plans INTERSECT/EXCEPT as (left-semi /
    left-anti) aggregated joins — same shuffle key throughout."""
    o = _ld(spark, sf_dir, "orders")

    def year_keys(y):
        return (
            o.filter(
                (F.col("o_orderdate") >= F.lit(f"{y}-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(f"{y + 1}-01-01").cast("timestamp"))
            )
            .select("o_custkey")
            .distinct()
        )

    k95, k96 = year_keys(1995), year_keys(1996)
    tag = lambda df, t: df.select(F.lit(t).alias("bucket"), "o_custkey")  # noqa: E731
    return (
        tag(k95.intersect(k96), "both")
        .unionAll(tag(k95.exceptAll(k96), "only95"))
        .unionAll(tag(k96.exceptAll(k95), "only96"))
    )


@_register(
    "x02_set_ops_oneshot",
    oracle="""
    WITH k95 AS (SELECT DISTINCT o_custkey FROM orders
                 WHERE o_orderdate >= TIMESTAMP '1995-01-01'
                   AND o_orderdate < TIMESTAMP '1996-01-01'),
         k96 AS (SELECT DISTINCT o_custkey FROM orders
                 WHERE o_orderdate >= TIMESTAMP '1996-01-01'
                   AND o_orderdate < TIMESTAMP '1997-01-01')
    SELECT 'both' AS bucket, o_custkey FROM (SELECT * FROM k95 INTERSECT SELECT * FROM k96)
    UNION ALL
    SELECT 'only95' AS bucket, o_custkey FROM (SELECT * FROM k95 EXCEPT SELECT * FROM k96)
    UNION ALL
    SELECT 'only96' AS bucket, o_custkey FROM (SELECT * FROM k96 EXCEPT SELECT * FROM k95)
    """,
    survey_ids=("X2",),
)
def x02_set_ops_oneshot(spark, sf_dir):
    """Single-scan twin of x02_set_ops (VERDICT r11 item 4): the same
    three membership buckets from ONE pass over ``orders`` —
    ``groupBy(o_custkey).agg(max(in95), max(in96))`` + a bucket CASE —
    instead of four scans feeding INTERSECT / EXCEPT ALL. The set-op
    spelling stays registered as the X2 surface exemplar; this twin
    documents the scale-preferred plan (the relationship
    x09_session_window_native has to the lag-gap composition): at
    100 TB the one scan reads each row once and shuffles once on
    o_custkey with map-side partial max, where the set-op form pays
    two scans per year set plus a distinct-aggregate per set operation
    on the same key. The oracle is x02_set_ops's VERBATIM
    INTERSECT/EXCEPT SQL — a green row proves the two spellings agree
    row-for-row, not merely that each matches itself."""
    o = _ld(spark, sf_dir, "orders")
    ts = lambda y: F.lit(f"{y}-01-01").cast("timestamp")  # noqa: E731
    d = F.col("o_orderdate")
    flags = (
        o.filter((d >= ts(1995)) & (d < ts(1997)))
        .groupBy("o_custkey")
        .agg(
            F.max((d < ts(1996)).cast("int")).alias("in95"),
            F.max((d >= ts(1996)).cast("int")).alias("in96"),
        )
    )
    bucket = (
        F.when((F.col("in95") == 1) & (F.col("in96") == 1), F.lit("both"))
        .when(F.col("in95") == 1, F.lit("only95"))
        .otherwise(F.lit("only96"))
    )
    return flags.select(bucket.alias("bucket"), "o_custkey")


@_register(
    "x03_pivot",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_F,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_O,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS n_P,
           CAST(SUM(CASE WHEN o_orderstatus = 'F'
                    THEN CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS cents_F
    FROM orders
    GROUP BY o_orderpriority
    """,
    survey_ids=("X3",),
)
def x03_pivot(spark, sf_dir):
    """Pivot (X3): order counts spread across status columns, plus one
    pivoted sum. Pivot values are ENUMERATED, not discovered — an
    unspecified value list costs a full collect-distinct pass before
    planning and makes the output schema data-dependent; Spark compiles
    the enumerated form to one pass of conditional aggregates (same
    plan as the oracle's FILTER clauses, no extra shuffle)."""
    o = _ld(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_cents(F.col("o_totalprice"))).alias("cents"),
        )
    )
    return piv.select(
        "o_orderpriority",
        F.coalesce(F.col("F_n"), F.lit(0)).cast("bigint").alias("n_F"),
        F.coalesce(F.col("O_n"), F.lit(0)).cast("bigint").alias("n_O"),
        F.coalesce(F.col("P_n"), F.lit(0)).cast("bigint").alias("n_P"),
        F.coalesce(F.col("F_cents"), F.lit(0)).cast("bigint").alias("cents_F"),
    )


@_register(
    "x03_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    survey_ids=("X3",),
)
def x03_rollup(spark, sf_dir):
    """Hierarchical rollup (X3): grand total + per-flag + per-(flag,
    status) in one pass. Spark expands grouping sets map-side; partial
    aggregation still applies, so the fact table is read once."""
    li = _ld(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
        F.count("*").alias("n"),
    )


@_register(
    "x03_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    survey_ids=("X3",),
)
def x03_cube(spark, sf_dir):
    """Full cube (X3) over two low-cardinality dimensions."""
    return (
        _ld(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"))
    )


@_register(
    "x04_analytic_windows",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents,
           CAST(RANK() OVER (PARTITION BY o_custkey
                             ORDER BY ROUND(o_totalprice * 100, 0) DESC,
                                      o_orderkey) AS INTEGER) AS price_rank,
           LAG(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
             OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             AS prev_cents,
           LEAD(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
             OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             AS next_cents,
           CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
             OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS running_cents,
           CAST(NTILE(4) OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey) AS INTEGER)
             AS quartile
    FROM orders
    WHERE o_custkey <= 200
    """,
    survey_ids=("X4",),
)
def x04_analytic_windows(spark, sf_dir):
    """Ranking + analytic windows with frames (X4): rank, lag/lead,
    running sum over an explicit ROWS frame, ntile — all sharing one
    (partition, order) so Spark evaluates them in a single window node
    after one shuffle+sort."""
    o = _ld(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 200)
    cents = _cents(F.col("o_totalprice"))
    by_time = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    by_price = Window.partitionBy("o_custkey").orderBy(
        cents.desc(), F.col("o_orderkey")
    )
    frame = by_time.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        cents.alias("cents"),
        F.rank().over(by_price).alias("price_rank"),
        F.lag(cents).over(by_time).alias("prev_cents"),
        F.lead(cents).over(by_time).alias("next_cents"),
        F.sum(cents).over(frame).alias("running_cents"),
        F.ntile(4).over(by_time).alias("quartile"),
    )


@_register(
    "x05_left_outer_agg",
    oracle="""
    SELECT c.c_custkey,
           COUNT(o.o_orderkey) AS n_orders,
           CAST(COALESCE(SUM(CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT)), 0)
                AS BIGINT) AS spend_cents
    FROM customer c
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
    """,
    survey_ids=("X5",),
)
def x05_left_outer_agg(spark, sf_dir):
    """Left outer join preserving customers with zero orders (X5).
    Planned as shuffled hash / sort-merge on the key; at scale the agg
    is pushed partial on the probe side before the exchange."""
    c = _ld(spark, sf_dir, "customer")
    o = _ld(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(
            F.count(o.o_orderkey).alias("n_orders"),
            F.coalesce(F.sum(_cents(o.o_totalprice)), F.lit(0))
            .cast("bigint")
            .alias("spend_cents"),
        )
    )


@_register(
    "x05_semi_anti",
    oracle="""
    SELECT 'with_high_value' AS bucket, c_custkey FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
    UNION ALL
    SELECT 'no_orders' AS bucket, c_custkey FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
    survey_ids=("X5",),
)
def x05_semi_anti(spark, sf_dir):
    """Left-semi and left-anti joins (X5): existence and absence tests
    without row multiplication — the same primitives the upsert operator
    (Q16) and dedup-against-existing use."""
    c = _ld(spark, sf_dir, "customer")
    o = _ld(spark, sf_dir, "orders")
    high = o.filter(F.col("o_totalprice") > 400000).select("o_custkey")
    semi = c.join(high, c.c_custkey == high.o_custkey, "left_semi").select(
        F.lit("with_high_value").alias("bucket"), "c_custkey"
    )
    anti = c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        F.lit("no_orders").alias("bucket"), "c_custkey"
    )
    return semi.unionAll(anti)


@_register(
    "x05_nullsafe_join",
    oracle="""
    WITH l AS (SELECT c_custkey,
                      CASE WHEN c_custkey % 7 = 0 THEN NULL
                           ELSE c_nationkey END AS nk
               FROM customer),
    r AS (SELECT n_nationkey AS nk, n_name FROM nation
          UNION ALL SELECT NULL, 'UNKNOWN')
    SELECT r.n_name, COUNT(*) AS n_customers
    FROM l JOIN r ON l.nk IS NOT DISTINCT FROM r.nk
    GROUP BY 1
    """,
    survey_ids=("X5",),
)
def x05_nullsafe_join(spark, sf_dir):
    """Null-safe equi-join (X5's missing-dimension-key idiom): planted
    NULL nation keys (every 7th customer — the unattributed-rows
    reality of any large fact table) joined to a dimension that
    carries an explicit NULL→'UNKNOWN' member via ``<=>`` — Spark's
    EqualNullSafe, DuckDB's IS NOT DISTINCT FROM. A plain equi-join
    silently DROPS null-keyed rows (NULL = NULL is NULL); the
    null-safe form routes them to the unknown member instead, which is
    the dimensional-modeling contract for unattributed facts. Plan:
    EqualNullSafe stays a hash-join key (nulls hash to one bucket —
    fine here, the null population is bounded at 1/7; a null-heavy
    fact would pre-split nulls the way s15_salted_join splits hot
    keys), so the plan is the same broadcast hash join as the plain
    equi-join, not a nested loop."""
    c = _ld(spark, sf_dir, "customer").select(
        "c_custkey",
        F.when(F.col("c_custkey") % 7 == 0, F.lit(None))
        .otherwise(F.col("c_nationkey"))
        .alias("nk"),
    )
    n = _ld(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nk"), "n_name"
    ).unionByName(
        spark.createDataFrame([(None, "UNKNOWN")], "nk bigint, n_name string")
    )
    return (
        c.join(F.broadcast(n), c["nk"].eqNullSafe(n["nk"]))
        .groupBy("n_name")
        .agg(F.count("*").alias("n_customers"))
    )


@_register(
    "x05_full_outer",
    oracle="""
    WITH cn AS (SELECT c_nationkey AS nk, COUNT(*) AS n_cust
                FROM customer GROUP BY c_nationkey),
         sn AS (SELECT s_nationkey AS nk, COUNT(*) AS n_supp
                FROM supplier GROUP BY s_nationkey)
    SELECT COALESCE(cn.nk, sn.nk) AS nationkey,
           cn.n_cust, sn.n_supp
    FROM cn FULL OUTER JOIN sn ON cn.nk = sn.nk
    """,
    survey_ids=("X5",),
)
def x05_full_outer(spark, sf_dir):
    """Full outer join (X5) of two aggregates, preserving keys present
    on either side only (NULL counts on the other)."""
    cn = (
        _ld(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count("*").alias("n_cust"))
    )
    sn = (
        _ld(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count("*").alias("n_supp"))
    )
    return cn.join(sn, "nk", "full_outer").select(
        F.col("nk").alias("nationkey"), "n_cust", "n_supp"
    )


@_register(
    "x05_range_join",
    oracle="""
    SELECT p.p_partkey, p.p_size, b.band
    FROM part p
    JOIN (VALUES (1, 10, 'small'), (11, 25, 'medium'),
                 (26, 40, 'large'), (41, 50, 'xl')) b(lo, hi, band)
      ON p.p_size BETWEEN b.lo AND b.hi
    """,
    survey_ids=("X5",),
)
def x05_range_join(spark, sf_dir):
    """Non-equi (range) join (X5): banding a measure against a small
    interval dimension. The dim is broadcast so the theta-join is a
    map-side BroadcastNestedLoopJoin — no shuffle of the fact side."""
    spark_ = spark
    band_rows = [
        (1, 10, "small"), (11, 25, "medium"), (26, 40, "large"), (41, 50, "xl"),
    ]
    # limit(len) is a no-op that records the dim's cardinality in the
    # logical plan (createDataFrame is a LogicalRDD with no static
    # maxRows), so the BNLJ build-side bound is machine-checkable
    bands = spark_.createDataFrame(
        band_rows, "lo int, hi int, band string"
    ).limit(len(band_rows))
    p = _ld(spark, sf_dir, "part")
    return p.join(
        F.broadcast(bands),
        (p.p_size >= bands.lo) & (p.p_size <= bands.hi),
    ).select("p_partkey", "p_size", "band")


# =====================================================================
# X6-X9: percentiles, datetime, JSON, sessionization
# =====================================================================


@_register(
    "x06_percentiles_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_suppkey) AS n_supp,
           quantile_cont(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT), 0.25)
             / 100.0 AS p25_price,
           quantile_cont(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT), 0.5)
             / 100.0 AS median_price,
           quantile_cont(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT), 0.75)
             / 100.0 AS p75_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    survey_ids=("X6",),
)
def x06_percentiles_distinct(spark, sf_dir):
    """Exact distinct count + exact interpolated percentiles (X6).

    Percentile inputs are integer cents and the probed quantiles are
    dyadic (g ∈ {0.25, 0.5, 0.75} interpolation factors are exact in
    binary), so interpolation is bit-identical across engines. The
    approximate forms (approx_count_distinct / percentile_approx) are the
    scale path — exercised in tests, not oracle-compared, since sketches
    are engine-specific by construction.

    The three quantiles are probed as ONE array-argument ``percentile``
    aggregate: each scalar percentile call builds its own per-group
    counting state, so the array form does a third of the aggregation
    work (measured ~1.6x faster end-to-end at sf0.1).

    The distinct count and the percentiles run as SEPARATE aggregates
    joined on the (few-row) group key: mixing a DISTINCT aggregate
    with the percentile forces Catalyst's two-level distinct rewrite,
    which keys the FIRST level on (returnflag, suppkey) and drags the
    percentile's per-group counting map through ~|distinct supplier|
    groups and a second-level map merge. Split, the distinct count
    gets its clean two-phase plan and the percentile map state exists
    only for the handful of real groups with map-side partial merge —
    measured interleaved A/B at sf0.1: 2.30 s → 1.48 s min-of-4,
    identical rows. The join is a few-row broadcast."""
    li = _ld(spark, sf_dir, "lineitem")
    cents = _cents(F.col("l_extendedprice"))
    nd = li.groupBy("l_returnflag").agg(
        F.count_distinct(F.col("l_suppkey")).alias("n_supp")
    )
    ps = li.groupBy("l_returnflag").agg(
        F.percentile(
            cents, F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))
        ).alias("ps")
    )
    return nd.join(ps, "l_returnflag").select(
        "l_returnflag",
        "n_supp",
        (F.col("ps")[0] / 100.0).alias("p25_price"),
        (F.col("ps")[1] / 100.0).alias("median_price"),
        (F.col("ps")[2] / 100.0).alias("p75_price"),
    )


@_register(
    "x07_datetime",
    oracle="""
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
           CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS y,
           CAST(EXTRACT(month FROM o_orderdate) AS INTEGER) AS m,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
             AS month_cents
    FROM orders
    GROUP BY 1, 2, 3
    """,
    survey_ids=("X7",),
)
def x07_datetime(spark, sf_dir):
    """Date/time bucketing (X7): date_trunc to month (cast to DATE so
    both engines emit the same logical value), year/month extraction,
    grouped totals."""
    o = _ld(spark, sf_dir, "orders")
    return o.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("order_month"),
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
    ).agg(
        F.count("*").alias("n_orders"),
        F.sum(_cents(F.col("o_totalprice"))).cast("bigint").alias("month_cents"),
    )


@_register(
    "x08_feature_map",
    oracle="""
    SELECT user_id, event_type, COUNT(*) AS n
    FROM events
    GROUP BY 1, 2
    HAVING COUNT(*) >= 2
    """,
    survey_ids=("X8", "X13"),
)
def x08_feature_map(spark, sf_dir):
    """MapType feature plumbing (X8's typed-collection side): per-user
    activity counts are aggregated INTO a ``map<event_type, n>``
    column (``map_from_entries`` over a collected struct list — the
    schema-flexible per-entity feature-bag shape feature stores use
    when the feature set isn't fixed at table-design time), pruned
    in the map domain with ``map_filter`` (keep features with n >= 2),
    and exploded back to rows. The relational oracle (GROUP BY +
    HAVING) proves the whole map round-trip — build, lambda filter,
    generator — is lossless and value-exact. Scale: one map-side-
    partial count shuffle plus one per-user fold; map width is bounded
    by |event types|, so the per-row map never outgrows a task."""
    ev = _ld(spark, sf_dir, "events")
    cnt = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    fm = cnt.groupBy("user_id").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("event_type", "n")))
        ).alias("fm")
    )
    pruned = fm.select(
        "user_id", F.map_filter("fm", lambda k, v: v >= 2).alias("fm")
    )
    return pruned.select(
        "user_id", F.explode("fm").alias("event_type", "n")
    )


@_register(
    "x08_json_extract",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(MIN(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS INTEGER)
             AS min_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS INTEGER)
             AS max_k,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS sum_k
    FROM events
    GROUP BY event_type
    """,
    survey_ids=("X8",),
)
def x08_json_extract(spark, sf_dir):
    """JSON field extraction (X8) over the events.props payload column,
    aggregated per event type. ``get_json_object`` evaluates JVM-side;
    for fixed schemas ``from_json`` + nested pruning is the scale path
    (exercised in tests)."""
    ev = _ld(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.min(k.cast("int")).alias("min_k"),
        F.max(k.cast("int")).alias("max_k"),
        F.sum(k.cast("bigint")).alias("sum_k"),
    )


@_register(
    "x08_json_quarantine",
    oracle="""
    WITH m AS (SELECT event_type,
                      CASE WHEN event_id % 37 = 0
                           THEN SUBSTR(props, 1, length(props) - 2)
                           ELSE props END AS p
               FROM events),
    x AS (SELECT event_type,
                 CASE WHEN json_valid(p)
                      THEN json_extract_string(p, '$.k') END AS k
          FROM m)
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_corrupt,
           CAST(SUM(CAST(k AS BIGINT)) AS BIGINT) AS sum_k_valid
    FROM x GROUP BY event_type
    """,
    survey_ids=("X8",),
)
def x08_json_quarantine(spark, sf_dir):
    """Corrupt-tolerant JSON ingestion (X8): a deterministic slice of
    the payloads is TRUNCATED (event_id % 37 — the planted-corruption
    discipline), and the pipeline must quarantine-count the bad rows
    and aggregate only the valid ones, never crash. At 100 TB corrupt
    records are a certainty, and a parse that throws poisons the whole
    task; ``get_json_object`` degrades to NULL per-record, keeping the
    quarantine decision a per-row expression. The mangle is truncation
    (not appended garbage) deliberately: Spark's Jackson parser accepts
    trailing garbage that strict JSON validators reject, so appended
    garbage would diverge from the oracle's ``json_valid`` — truncated
    records are invalid under BOTH semantics."""
    ev = _ld(spark, sf_dir, "events")
    mangled = F.when(
        F.col("event_id") % 37 == 0,
        F.substring("props", 1, F.length("props") - 2),
    ).otherwise(F.col("props"))
    k = F.get_json_object(mangled, "$.k")
    return ev.select("event_type", k.alias("k")).groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("k").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_corrupt"),
        F.sum(F.col("k").cast("bigint")).alias("sum_k_valid"),
    )


@_register(
    "x09_sessionize",
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts, event_id,
               CAST(ROUND(value * 100, 0) AS BIGINT) AS value_cents,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR ts > LAG(ts) OVER w + INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS boundary
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    tagged AS (
        SELECT user_id, ts, value_cents,
               CAST(SUM(boundary) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS session_id
        FROM ordered
    )
    SELECT user_id, session_id,
           COUNT(*) AS n_events,
           MIN(ts) AS start_ts, MAX(ts) AS end_ts,
           CAST(SUM(value_cents) AS BIGINT) AS sum_value_cents
    FROM tagged
    GROUP BY user_id, session_id
    """,
    survey_ids=("X9",),
)
def x09_sessionize(spark, sf_dir):
    """Gap-based sessionization, batch form (X9): 30-minute max gap,
    per-session aggregates. See operators/sessions.py for the
    single-shuffle two-window formulation; the streaming variant
    (session_window + watermark) is in streaming/windows.py with this
    query as its replay-correctness proxy."""
    from .operators.sessions import session_aggregate, sessionize

    ev = _ld(spark, sf_dir, "events")
    sess = sessionize(ev, "user_id", "ts", gap_minutes=30.0, tie_col="event_id")
    return session_aggregate(
        sess, "user_id", "ts", value_cents=_cents(F.col("value"))
    ).withColumn("sum_value_cents", F.col("sum_value_cents").cast("bigint"))


@_register(
    "x09_session_window_native",
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts, event_id,
               CAST(ROUND(value * 100, 0) AS BIGINT) AS cents,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR ts > LAG(ts) OVER w + INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS boundary
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    tagged AS (
        SELECT user_id, ts, cents,
               SUM(boundary) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS session_id
        FROM ordered
    )
    SELECT user_id,
           CAST(MIN(ts) AS TIMESTAMP) AS session_start,
           CAST(MAX(ts) + INTERVAL 30 MINUTE AS TIMESTAMP) AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(cents) AS BIGINT) AS sum_cents
    FROM tagged GROUP BY user_id, session_id
    """,
    survey_ids=("X9",),
)
def x09_session_window_native(spark, sf_dir):
    """Native ``session_window`` in BATCH mode (X9): the engine's own
    merging session operator — groupBy(session_window(ts, gap), key)
    plans as a single SessionWindow sort per key with in-pass interval
    merging, one shuffle, no window-function second pass — validated
    against the lag-gap/cumsum replay oracle (the same fixpoint
    x09_sessionize computes by hand, which makes the two queries a
    native-vs-composed twin pair exactly like streaming's
    x10_stream_sessions). Boundary-tie semantics, measured and pinned
    (tests/test_properties.py::test_session_window_boundary_tie_semantics):
    native session_window MERGES touching windows, so an event exactly
    on start+gap stays in-session — agreeing with the lag form's <=
    cut; the two forms are tie-equivalent, not just corpus-equivalent."""
    ev = _ld(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "user_id", F.session_window("ts", "30 minutes").alias("w")
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(_cents(F.col("value"))).cast("bigint").alias("sum_cents"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_cents",
        )
    )


@_register(
    "x09_tumbling_window",
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
           CAST(date_trunc('hour', ts) AS TIMESTAMP) + INTERVAL 1 HOUR
             AS window_end,
           event_type,
           COUNT(*) AS n_events
    FROM events
    GROUP BY 1, 2, 3
    """,
    survey_ids=("X9",),
)
def x09_tumbling_window(spark, sf_dir):
    """Tumbling event-time windows in batch (X9) via ``window()`` — the
    exact grouping Structured Streaming uses, so streaming results can
    be replay-checked against this."""
    from .operators.sessions import tumbling_window_agg

    ev = _ld(spark, sf_dir, "events")
    return tumbling_window_agg(ev, "ts", "1 hour", group_extra=["event_type"])


def nested_materials(spark, sf_dir) -> DataFrame:
    """The nested materials data model (SURVEY §1.2 D1) as a DataFrame:
    (material_id, lattice array<array<double>>, sites
    array<struct<suppkey, element, x, y, z>>), built deterministically
    from the standard corpus (supplier sites grouped per
    nation-material). The shared source for the d01 query and the
    nested-parquet pruning fixture in tests/test_plans.py."""
    sup = _ld(spark, sf_dir, "supplier")
    site = F.struct(
        F.col("s_suppkey").alias("suppkey"),
        F.element_at(
            F.array(F.lit("V"), F.lit("O"), F.lit("Fe")),
            (F.pmod(F.col("s_suppkey"), F.lit(3)) + 1).cast("int"),
        ).alias("element"),
        (F.pmod(F.col("s_suppkey"), F.lit(7)).cast("double") * 0.5).alias("x"),
        (F.pmod(F.col("s_suppkey"), F.lit(5)).cast("double") * 0.5).alias("y"),
        (F.col("s_acctbal") / 1000.0).alias("z"),
    )
    sites = sup.groupBy("s_nationkey").agg(
        F.sort_array(F.collect_list(site)).alias("sites")
    )
    n = _ld(spark, sf_dir, "nation")
    nk = F.col("n_nationkey").cast("double")
    rk = F.col("n_regionkey").cast("double")
    lat = F.array(
        F.array(nk + 4.0, F.lit(0.0), F.lit(0.0)),
        F.array(F.lit(0.0), rk + 5.0, F.lit(0.0)),
        F.array(F.lit(0.0), F.lit(0.0), F.lit(20.0)),
    )
    mats = n.select(
        F.concat(F.lit("mp-"), F.col("n_nationkey").cast("string")).alias(
            "material_id"
        ),
        "n_nationkey",
        lat.alias("lattice"),
    )
    return mats.join(
        sites, sites["s_nationkey"] == mats["n_nationkey"]
    ).select("material_id", "lattice", "sites")


@_register(
    "d01_nested_sites",
    oracle="""
    WITH s AS (
        SELECT s_nationkey,
               list({'suppkey': s_suppkey,
                     'element': CASE s_suppkey % 3 WHEN 0 THEN 'V'
                                WHEN 1 THEN 'O' ELSE 'Fe' END,
                     'x': CAST(s_suppkey % 7 AS DOUBLE) * 0.5,
                     'y': CAST(s_suppkey % 5 AS DOUBLE) * 0.5,
                     'z': s_acctbal / 1000.0}
                    ORDER BY s_suppkey) AS sites
        FROM supplier GROUP BY s_nationkey
    ),
    m AS (
        SELECT 'mp-' || CAST(n_nationkey AS VARCHAR) AS material_id,
               n_nationkey,
               [[CAST(n_nationkey AS DOUBLE) + 4.0, 0.0, 0.0],
                [0.0, CAST(n_regionkey AS DOUBLE) + 5.0, 0.0],
                [0.0, 0.0, 20.0]] AS lat
        FROM nation
    ),
    j AS (SELECT m.material_id, m.lat, s.sites
          FROM m JOIN s ON s.s_nationkey = m.n_nationkey)
    SELECT material_id,
           CAST(len(sites) AS BIGINT) AS n_sites,
           lat[1][1] * (lat[2][2] * lat[3][3] - lat[2][3] * lat[3][2])
             - lat[1][2] * (lat[2][1] * lat[3][3] - lat[2][3] * lat[3][1])
             + lat[1][3] * (lat[2][1] * lat[3][2] - lat[2][2] * lat[3][1])
             AS volume,
           list_reduce(list_concat([CAST(0 AS DOUBLE)],
                       list_transform(sites, t -> t.z)), (a, b) -> a + b)
             / CAST(len(sites) AS DOUBLE) AS mean_z,
           CAST(len(list_filter(sites, t -> t.element = 'V')) AS BIGINT)
             AS n_vanadium
    FROM j
    """,
    survey_ids=("Q4", "Q17", "Q18"),
)
def d01_nested_sites(spark, sf_dir):
    """Query the nested materials model through SUBFIELDS ONLY: cell
    volume from the lattice determinant, site count, mean fractional z
    (left-to-right fold over the suppkey-ordered array — bit-identical
    in any engine), and a per-element count via a higher-order filter.
    Reference carries this structure as a pymatgen ``Structure``
    (my_dag.py:28-37; serialized POSCAR at output/bulk_poscars/
    *.poscar). Output is flat scalars so the cross-engine hash is
    well-defined; nested-schema pruning of the same model from parquet
    is asserted in tests/test_plans.py."""
    nested = nested_materials(spark, sf_dir)
    l = F.col("lattice")
    volume = (
        l[0][0] * (l[1][1] * l[2][2] - l[1][2] * l[2][1])
        - l[0][1] * (l[1][0] * l[2][2] - l[1][2] * l[2][0])
        + l[0][2] * (l[1][0] * l[2][1] - l[1][1] * l[2][0])
    )
    # Subfield-ARRAY extraction (sites.z / sites.element), not struct
    # access inside lambdas: GetArrayStructFields is what the nested-
    # schema-pruning rule pushes into a parquet scan — the same query
    # over a stored materials table reads only the touched subfields
    # (asserted in tests/test_plans.py on a parquet fixture; lambda-
    # internal s["z"] access defeats the rule and reads every field).
    return nested.select(
        "material_id",
        F.size("sites").cast("bigint").alias("n_sites"),
        volume.alias("volume"),
        (
            F.aggregate(F.col("sites.z"), F.lit(0.0), lambda a, v: a + v)
            / F.size("sites").cast("double")
        ).alias("mean_z"),
        F.size(
            F.filter(F.col("sites.element"), lambda e: e == F.lit("V"))
        )
        .cast("bigint")
        .alias("n_vanadium"),
    )


@_register(
    "q18_grouped_collect",
    oracle="""
    SELECT l_orderkey,
           COUNT(*) AS n_lines,
           string_agg(CAST(l_linenumber AS VARCHAR), ','
                      ORDER BY l_linenumber) AS linenums
    FROM lineitem
    GROUP BY l_orderkey
    """,
    survey_ids=("Q18",),
)
def q18_grouped_collect(spark, sf_dir):
    """Grouped ordered collection (Q18): the reference gathers the
    (charge, mu, ne) points of each slab into a charge-ordered list
    (my_dag.py:151-160); here each order's line numbers are collected
    and sorted within the group. Emitted as a joined string so the
    cross-engine comparison is representation-independent. Single
    shuffle; collect_list is map-side partial like any aggregate."""
    li = _ld(spark, sf_dir, "lineitem")
    return li.groupBy("l_orderkey").agg(
        F.count("*").alias("n_lines"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.col("l_linenumber"))),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("linenums"),
    )


@_register(
    "x09_interval_merge",
    oracle="""
    WITH iv AS (
        SELECT user_id, event_id, ts AS s,
               ts + (60 + event_id % 240) * INTERVAL '1 second' AS e
        FROM events
    ),
    tagged AS (
        SELECT user_id, event_id, s, e,
               CASE WHEN MAX(e) OVER (PARTITION BY user_id
                        ORDER BY s, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                        IS NULL
                      OR s > MAX(e) OVER (PARTITION BY user_id
                        ORDER BY s, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    THEN 1 ELSE 0 END AS boundary
        FROM iv
    ),
    blocks AS (
        SELECT user_id, s, e,
               CAST(SUM(boundary) OVER (PARTITION BY user_id
                    ORDER BY s, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS block_id
        FROM tagged
    )
    SELECT user_id, block_id,
           COUNT(*) AS n_intervals,
           MIN(s) AS block_start, MAX(e) AS block_end,
           CAST(date_diff('second', MIN(s), MAX(e)) AS BIGINT) AS covered_s
    FROM blocks
    GROUP BY user_id, block_id
    """,
    survey_ids=("X9", "X4"),
)
def x09_interval_merge(spark, sf_dir):
    """Interval-union merge (X9): each event holds a VARIABLE-length
    interval (60 + event_id % 240 seconds — deterministic), and
    overlapping/touching intervals per user collapse into coverage
    blocks via the cumulative-max-end rule. The outage-window /
    availability primitive; distinct from gap sessionization because a
    long early interval can swallow later short ones, which a lag rule
    would wrongly split. operators/sessions.py::merge_intervals."""
    from .operators.sessions import merge_intervals

    ev = _ld(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.col("ts").alias("s"),
        F.expr("ts + make_interval(0, 0, 0, 0, 0, 0, 60 + event_id % 240)")
        .alias("e"),
    )
    blocks = merge_intervals(ev, "user_id", "s", "e", "event_id")
    return blocks.groupBy("user_id", "block_id").agg(
        F.count("*").alias("n_intervals"),
        F.min("s").alias("block_start"),
        F.max("e").alias("block_end"),
        (
            F.unix_timestamp(F.max("e")) - F.unix_timestamp(F.min("s"))
        ).alias("covered_s"),
    )


@_register(
    "x04_rolling_range",
    oracle="""
    WITH e AS (
        SELECT user_id, event_id,
               -- floor, not round: Spark's unix_timestamp truncates
               -- the fractional second
               CAST(FLOOR(epoch(ts)) AS BIGINT) AS epoch_s,
               CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
        FROM events
    )
    SELECT user_id, event_id, epoch_s,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_1h,
           CAST(SUM(cents) OVER w AS BIGINT) AS sum_cents_1h
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_s
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    """,
    survey_ids=("X4", "X7"),
)
def x04_rolling_range(spark, sf_dir):
    """Rolling time-RANGE window features (X4): per event, the count
    and value sum of the same user's events in the trailing hour —
    a RANGE frame over event-time (all peers at equal timestamps
    included, so the result is order-independent under ties), vs the
    ROWS frames in x04_analytic_windows. The per-entity trailing
    aggregate is the feature-engineering staple (velocity / spend-rate
    features); one shuffle+sort on the partition key, frame evaluated
    in a single pass with a sliding aggregate buffer."""
    ev = _ld(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_timestamp("ts").alias("epoch_s"),
        _cents(F.col("value")).alias("cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("epoch_s")
        .rangeBetween(-3600, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        "epoch_s",
        F.count("*").over(w).alias("n_1h"),
        F.sum("cents").over(w).alias("sum_cents_1h"),
    )


@_register(
    "x04_interpolate",
    oracle="""
    WITH daily AS (
        SELECT user_id,
               CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                    AS BIGINT) AS day,
               CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
                 AS cents
        FROM events WHERE user_id % 13 = 0
        GROUP BY 1, 2
    ),
    bounds AS (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1
               FROM daily GROUP BY 1),
    spine AS (SELECT user_id, CAST(unnest(generate_series(d0, d1)) AS BIGINT)
                     AS day
              FROM bounds),
    j AS (SELECT s.user_id, s.day, d.cents
          FROM spine s LEFT JOIN daily d USING (user_id, day)),
    f AS (
        SELECT user_id, day, cents,
               last_value(CASE WHEN cents IS NOT NULL THEN day END
                          IGNORE NULLS) OVER wp AS prev_day,
               last_value(cents IGNORE NULLS) OVER wp AS prev_val,
               first_value(CASE WHEN cents IS NOT NULL THEN day END
                           IGNORE NULLS) OVER wn AS next_day,
               first_value(cents IGNORE NULLS) OVER wn AS next_val
        FROM j
        WINDOW wp AS (PARTITION BY user_id ORDER BY day
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wn AS (PARTITION BY user_id ORDER BY day
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, day,
           CAST(CASE WHEN cents IS NOT NULL THEN cents
                ELSE prev_val * (next_day - day) + next_val * (day - prev_day)
                END AS BIGINT) AS val_num,
           CAST(CASE WHEN cents IS NOT NULL THEN 1
                ELSE next_day - prev_day END AS BIGINT) AS val_den,
           cents IS NOT NULL AS is_observed
    FROM f
    """,
    survey_ids=("X4", "X7"),
)
def x04_interpolate(spark, sf_dir):
    """Linear interpolation of gaps in a per-entity daily series (X4's
    feature-store fill shape): each sampled user's daily spend is
    densified over their own [first, last] day span, and missing days
    are linearly interpolated between the bracketing observations.
    The interpolated value is emitted as an EXACT RATIONAL —
    ``val_num / val_den`` with ``val_num = prev*(next_day - day) +
    next*(day - prev_day)`` and ``val_den = next_day - prev_day`` —
    pure bigint arithmetic, so parity is bit-exact where a float
    division would inherit engine rounding (callers divide at the
    edge). Day arithmetic runs on epoch-day integers for the same
    reason. Plan: per-user bounds aggregate → sequence+explode spine
    (fan-out = span days, calendar-bounded, never a driver loop) →
    one shuffle to join observations → the prev/next carry in TWO
    passes over one user-partitioned sort (forward last + backward
    first, mirrored frames). Spine rows inside a span always have
    both brackets, so no edge NULLs survive."""
    ev = _ld(spark, sf_dir, "events").filter(F.col("user_id") % 13 == 0)
    daily = ev.groupBy(
        "user_id",
        F.datediff(
            F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
        ).cast("bigint").alias("day"),
    ).agg(F.sum(_cents(F.col("value"))).alias("cents"))
    bounds = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    spine = bounds.select(
        "user_id", F.explode(F.sequence("d0", "d1")).alias("day")
    )
    j = spine.join(daily, ["user_id", "day"], "left")
    wp = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col("cents").isNotNull(), F.col("day"))
    f = j.select(
        "user_id",
        "day",
        "cents",
        F.last(obs_day, ignorenulls=True).over(wp).alias("prev_day"),
        F.last("cents", ignorenulls=True).over(wp).alias("prev_val"),
        F.first(obs_day, ignorenulls=True).over(wn).alias("next_day"),
        F.first("cents", ignorenulls=True).over(wn).alias("next_val"),
    )
    observed = F.col("cents").isNotNull()
    return f.select(
        "user_id",
        "day",
        F.when(observed, F.col("cents"))
        .otherwise(
            F.col("prev_val") * (F.col("next_day") - F.col("day"))
            + F.col("next_val") * (F.col("day") - F.col("prev_day"))
        )
        .cast("bigint")
        .alias("val_num"),
        F.when(observed, F.lit(1))
        .otherwise(F.col("next_day") - F.col("prev_day"))
        .cast("bigint")
        .alias("val_den"),
        observed.alias("is_observed"),
    )


@_register(
    "x05_hierarchy_flatten",
    oracle="""
    WITH RECURSIVE walk AS (
        SELECT p_partkey AS node, p_partkey AS cur,
               CAST(0 AS BIGINT) AS depth
        FROM part
        UNION ALL
        SELECT node, cur // 10, depth + 1 FROM walk WHERE cur >= 10
    )
    SELECT node, cur AS root, depth FROM walk WHERE cur < 10
    """,
    survey_ids=("X5",),
)
def x05_hierarchy_flatten(spark, sf_dir):
    """Hierarchy flattening (the WITH RECURSIVE gap): every part is a
    node in a rooted forest (parent = partkey DIV 10 as DATA, keys
    below 10 are roots), and the query resolves each node's root and
    depth by pointer doubling — O(log depth) self-joins of the state,
    vs the O(depth) rounds of a literal recursive-CTE translation. The
    oracle IS DuckDB's native WITH RECURSIVE over the same parent
    relation, so the check proves the iterative plan computes exactly
    the recursive fixpoint.
    operators/components.py::forest_root_depth."""
    from .operators.components import forest_root_depth

    nodes = _ld(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("node"),
        F.expr(
            "IF(p_partkey < 10, NULL, p_partkey DIV 10)"
        ).alias("parent"),
    )
    return forest_root_depth(nodes)


@_register(
    "x07_cohort_retention",
    oracle="""
    WITH act AS (
        SELECT DISTINCT user_id,
               CAST(date_trunc('week', ts) AS DATE) AS week
        FROM events
    ),
    coh AS (
        SELECT user_id, week,
               MIN(week) OVER (PARTITION BY user_id) AS cohort_week
        FROM act
    )
    SELECT cohort_week,
           CAST(date_diff('day', cohort_week, week) / 7 AS BIGINT)
             AS week_offset,
           COUNT(*) AS n_active
    FROM coh GROUP BY cohort_week, week_offset
    """,
    survey_ids=("X7", "X4"),
)
def x07_cohort_retention(spark, sf_dir):
    """Cohort retention (X7+X4): users are cohorted by the ISO week of
    their first event, and each (cohort_week, week_offset) cell counts
    how many of them were active that many weeks later — the standard
    product-analytics retention triangle. Week offsets are exact: both
    engines truncate to the ISO Monday, so the day difference is always
    a multiple of 7 and the integer division is lossless. Plan shape:
    the weekly-activity ``distinct`` collapses the event stream to at
    most |users|x|weeks| rows BEFORE the window pass, the first-week
    window is a single user_id-partitioned sort over that collapsed
    frame (no self-join back to raw events), and the final cell
    aggregate is map-side partial. At 100 TB the distinct is the only
    full-data shuffle; everything after operates on the reduced
    activity matrix."""
    ev = (
        _ld(spark, sf_dir, "events")
        .select(
            "user_id",
            F.date_trunc("week", F.col("ts")).cast("date").alias("week"),
        )
        .distinct()
    )
    coh = ev.withColumn(
        "cohort_week", F.min("week").over(Window.partitionBy("user_id"))
    )
    return coh.groupBy(
        "cohort_week",
        (F.datediff(F.col("week"), F.col("cohort_week")) / 7)
        .cast("bigint")
        .alias("week_offset"),
    ).agg(F.count("*").alias("n_active"))


@_register(
    "x09_funnel_conversion",
    oracle="""
    WITH v AS (SELECT user_id, MIN(ts) AS t1 FROM events
               WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
          JOIN v ON v.user_id = e.user_id
          WHERE e.event_type = 'click' AND e.ts > v.t1
          GROUP BY e.user_id),
    p AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
          JOIN c ON c.user_id = e.user_id
          WHERE e.event_type = 'purchase' AND e.ts > c.t2
          GROUP BY e.user_id)
    SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_view,
           CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_view_click,
           CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_full_funnel
    """,
    survey_ids=("X9", "X5"),
)
def x09_funnel_conversion(spark, sf_dir):
    """Ordered funnel conversion (X9): how many users progressed
    view -> click -> purchase IN TIME ORDER — each stage anchored at
    the first qualifying event strictly after the previous stage's
    anchor (first view, first click after that view, first purchase
    after that click). Order sensitivity is the point: a purchase
    before the first post-view click does not count, which plain
    per-type existence checks get wrong. Every stage is a
    user_id-keyed aggregate joined to the previous stage's anchors on
    the same key, so the whole chain co-partitions on user_id — one
    logical shuffle reused down the funnel, no window over raw events,
    and the final assembly is three single-row counts (broadcast-
    trivially crossed). Timestamps are microsecond-distinct in the
    corpus, so the strict > comparisons are tie-free in both
    engines."""
    ev = _ld(spark, sf_dir, "events").select("user_id", "event_type", "ts")

    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        v.agg(F.count("*").cast("bigint").alias("n_view"))
        .crossJoin(
            c.agg(F.count("*").cast("bigint").alias("n_view_click"))
        )
        .crossJoin(
            p.agg(F.count("*").cast("bigint").alias("n_full_funnel"))
        )
    )


#: Dialect-portable GROUPING SETS text (runs verbatim in both engines):
#: the explicit-sets form X3's rollup/cube rows don't reach — an
#: arbitrary, non-hierarchical collection of grouping columns, with
#: GROUPING() bits disambiguating data NULLs from subtotal NULLs.
_GROUPING_SETS_SQL = """
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS BIGINT) * 2
             + CAST(GROUPING(l_linestatus) AS BIGINT) AS gid,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT))
                AS BIGINT) AS sum_cents
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                            (l_linestatus), ())
    """


@_register(
    "x03_grouping_sets",
    oracle=_GROUPING_SETS_SQL,
    survey_ids=("X3",),
)
def x03_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS (X3): an arbitrary set collection —
    (flag, status), (status), and the grand total — which is neither a
    rollup (not hierarchical) nor a cube (not the full power set),
    plus the GROUPING() indicator that tells subtotal NULLs apart from
    data NULLs (the detail every BI consumer of subtotal rows depends
    on). Spark expands grouping sets with a single Expand node feeding
    ONE hash aggregate — one shuffle for all three sets, with partial
    aggregation still applying — not one pass per set. Identical SQL
    text runs in both engines."""
    from .sources import register_views

    register_views(spark, sf_dir)
    return spark.sql(_GROUPING_SETS_SQL)


@_register(
    "x02_union_by_name",
    oracle="""
    SELECT * FROM (
        SELECT source, COUNT(*) AS n_items,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
               'by_source' AS side
        FROM documents GROUP BY source)
    UNION ALL BY NAME
    SELECT * FROM (
        SELECT lang AS source, COUNT(*) AS n_items,
               'by_lang' AS side
        FROM documents GROUP BY lang)
    """,
    survey_ids=("X2",),
)
def x02_union_by_name(spark, sf_dir):
    """Name-resolved union with missing-column tolerance (X2):
    ``unionByName(allowMissingColumns=True)`` aligns two frames whose
    schemas DIVERGED — the second side lacks ``sum_chars`` and its
    columns sit in a different physical order — matching by NAME and
    null-filling the gap, where positional UNION would silently pair
    the wrong columns or refuse. This is the multi-vintage ingestion
    primitive: at 100 TB a long-lived corpus always has slices written
    before and after a schema change, and the by-name union (like
    s01_schema_evolution's mergeSchema read) is how they combine
    without a rewrite. DuckDB's ``UNION ALL BY NAME`` is the oracle's
    exact counterpart."""
    docs = _ld(spark, sf_dir, "documents")
    by_source = (
        docs.groupBy("source")
        .agg(
            F.count("*").alias("n_items"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .withColumn("side", F.lit("by_source"))
    )
    by_lang = (
        docs.groupBy(F.col("lang").alias("source"))
        .agg(F.count("*").alias("n_items"))
        .withColumn("side", F.lit("by_lang"))
    )
    return by_source.unionByName(by_lang, allowMissingColumns=True)


@_register(
    "s03_scd2_history",
    oracle="""
    WITH ordered AS (
        SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority,
               LAG(o_orderpriority) OVER w AS prev_prio
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey)
    ),
    changes AS (
        SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority
        FROM ordered
        WHERE prev_prio IS NULL OR o_orderpriority <> prev_prio
    )
    SELECT o_custkey,
           CAST(ROW_NUMBER() OVER w AS BIGINT) AS version,
           o_orderpriority AS prio,
           o_orderdate AS valid_from,
           LEAD(o_orderdate) OVER w AS valid_to,
           LEAD(o_orderdate) OVER w IS NULL AS is_current
    FROM changes
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey)
    """,
    survey_ids=("S3", "X4"),
)
def s03_scd2_history(spark, sf_dir):
    """Slowly-changing-dimension Type-2 history build (S3's warehouse
    counterpart to MERGE upsert): each customer's order stream is read
    as successive observations of a tracked attribute (the order
    priority), consecutive no-change observations collapse, and each
    surviving change becomes a version row with a [valid_from,
    valid_to) validity range and a current flag — the standard
    dimension-history shape every warehouse load job produces, built
    here with LAG change detection + LEAD range closing instead of a
    row-at-a-time merge loop. Both windows share one partitioning
    (o_custkey), so the whole history build is a single shuffle and
    two partition-local sorted passes; version order is tie-free
    because (o_orderdate, o_orderkey) is unique per customer."""
    o = _ld(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    changes = (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_orderpriority",
            F.lag("o_orderpriority").over(w).alias("prev_prio"),
        )
        .filter(
            F.col("prev_prio").isNull()
            | (F.col("o_orderpriority") != F.col("prev_prio"))
        )
        .drop("prev_prio")
    )
    return changes.select(
        "o_custkey",
        F.row_number().over(w).cast("bigint").alias("version"),
        F.col("o_orderpriority").alias("prio"),
        F.col("o_orderdate").alias("valid_from"),
        F.lead("o_orderdate").over(w).alias("valid_to"),
        F.lead("o_orderdate").over(w).isNull().alias("is_current"),
    )


@_register(
    "x01_global_rownum",
    oracle="""
    SELECT o_orderkey,
           CAST(ROW_NUMBER() OVER (ORDER BY o_orderkey) AS BIGINT) AS rn
    FROM orders
    """,
    survey_ids=("X1", "X4"),
)
def x01_global_rownum(spark, sf_dir):
    """Globally contiguous row numbering WITHOUT a global-order window
    (X1): ``ROW_NUMBER() OVER (ORDER BY key)`` with no PARTITION BY
    collapses to a single task in Spark — the canonical 100 TB
    scale-killer this query exists to avoid. Two-phase instead:
    (1) bucket keys by a MONOTONE literal pid (quantile cuts collected
    once — a pure expression of the key, so the window branch and the
    counts branch can NEVER observe different assignments; a
    spark_partition_id() after repartitionByRange only agrees across
    branches while exchange reuse happens to fire) and number rows
    WITHIN each bucket via a partition-local window; (2) compute
    per-bucket row counts (a ~num-partitions-row aggregate), convert
    them to cumulative start offsets with a window over that TINY
    frame, and broadcast-join the offsets back. Every full-data pass
    stays parallel; only the offset table — one row per bucket — is
    ever globally ordered. The oracle is the single-task form, so
    parity proves the decomposition is exact.
    operators/scale.py::_monotone_pid."""
    from .operators.scale import _monotone_pid

    o = _ld(spark, sf_dir, "orders").select("o_orderkey")
    part = o.withColumn("pid", _monotone_pid(o, "o_orderkey", 32))
    wp = Window.partitionBy("pid").orderBy("o_orderkey")
    local = part.withColumn("local_rn", F.row_number().over(wp))
    counts = part.groupBy("pid").agg(F.count("*").alias("n"))
    wo = Window.orderBy("pid").rowsBetween(
        Window.unboundedPreceding, Window.currentRow - 1
    )
    offsets = counts.select(
        "pid", F.coalesce(F.sum("n").over(wo), F.lit(0)).alias("offset")
    )
    return local.join(F.broadcast(offsets), "pid").select(
        "o_orderkey",
        (F.col("local_rn") + F.col("offset")).cast("bigint").alias("rn"),
    )


@_register(
    "x02_set_ops_all",
    oracle="""
    WITH a AS (SELECT l_partkey FROM lineitem WHERE l_linenumber <= 2),
         b AS (SELECT l_partkey FROM lineitem WHERE l_linenumber >= 2)
    SELECT 'except_all' AS bucket, l_partkey,
           COUNT(*) AS n
    FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
    GROUP BY 2
    UNION ALL
    SELECT 'intersect_all', l_partkey, COUNT(*)
    FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b)
    GROUP BY 2
    """,
    survey_ids=("X2",),
)
def x02_set_ops_all(spark, sf_dir):
    """Multiset set operations (X2's ALL variants): ``exceptAll`` /
    ``intersectAll`` keep MULTIPLICITY — a part key appearing 5 times
    on one side and 3 on the other survives EXCEPT ALL twice and
    INTERSECT ALL three times — where the distinct forms
    (x02_set_ops) collapse to membership. That difference is load-
    bearing for reconciliation workloads (did every row land exactly
    once?), which is multiset subtraction, not set subtraction. Spark
    plans both as an aggregate computing per-key counts on each side
    and replicating rows min/difference times — one shuffle each, no
    join; the grouped count output keeps the driver-hashed frame
    compact while still pinning every multiplicity."""
    li = _ld(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_linenumber") <= 2).select("l_partkey")
    b = li.filter(F.col("l_linenumber") >= 2).select("l_partkey")
    ex = (
        a.exceptAll(b)
        .groupBy("l_partkey")
        .agg(F.count("*").alias("n"))
        .select(F.lit("except_all").alias("bucket"), "l_partkey", "n")
    )
    it = (
        a.intersectAll(b)
        .groupBy("l_partkey")
        .agg(F.count("*").alias("n"))
        .select(F.lit("intersect_all").alias("bucket"), "l_partkey", "n")
    )
    return ex.unionByName(it)


@_register(
    "s18_fd_violations",
    oracle="""
    WITH batch2 AS (
        SELECT p_partkey,
               CASE WHEN p_partkey % 97 = 0 THEN 'Brand#XX'
                    ELSE p_brand END AS p_brand
        FROM part
    ),
    uni AS (
        SELECT p_partkey, p_brand FROM part
        UNION ALL
        SELECT p_partkey, p_brand FROM batch2
    )
    SELECT p_partkey,
           COUNT(DISTINCT p_brand) AS n_brands,
           MIN(p_brand) AS brand_a,
           MAX(p_brand) AS brand_b
    FROM uni
    GROUP BY p_partkey
    HAVING COUNT(DISTINCT p_brand) > 1
    """,
    survey_ids=("X6", "S3"),
)
def s18_fd_violations(spark, sf_dir):
    """Cross-batch functional-dependency audit (the s18 family's
    consistency check): the claimed invariant partkey → brand is
    validated across two ingest vintages — the original batch and a
    second batch carrying a PLANTED deterministic corruption (every
    97th key re-branded), planted identically in the oracle so the
    driver row exercises a non-empty violation path instead of 0 = 0.
    Exactly the check a multi-batch 100 TB ingest runs before
    publishing: group on the determinant key, count distinct
    dependent values, emit only violators with both witnesses. One
    shuffle (two-phase distinct under the hood); the violation set is
    tiny by construction, so the output never approaches data size."""
    part = _ld(spark, sf_dir, "part")
    batch2 = part.select(
        "p_partkey",
        F.when(F.col("p_partkey") % 97 == 0, F.lit("Brand#XX"))
        .otherwise(F.col("p_brand"))
        .alias("p_brand"),
    )
    uni = part.select("p_partkey", "p_brand").unionByName(batch2)
    return (
        uni.groupBy("p_partkey")
        .agg(
            F.count_distinct(F.col("p_brand")).alias("n_brands"),
            F.min("p_brand").alias("brand_a"),
            F.max("p_brand").alias("brand_b"),
        )
        .filter(F.col("n_brands") > 1)
    )


@_register(
    "x04_missing_ranges",
    oracle="""
    WITH s AS (
        SELECT o_orderkey AS k,
               LEAD(o_orderkey) OVER (ORDER BY o_orderkey) AS nxt
        FROM orders
        WHERE o_orderkey % 100 NOT BETWEEN 7 AND 9
    )
    SELECT k + 1 AS gap_start, nxt - 1 AS gap_end,
           nxt - k - 1 AS n_missing
    FROM s WHERE nxt > k + 1
    """,
    survey_ids=("X4", "X1"),
)
def x04_missing_ranges(spark, sf_dir):
    """Missing-key-range detection (the ingest completeness check: did
    any id block fail to land?) WITHOUT the global-order window the
    SQL form implies — ``LEAD() OVER (ORDER BY k)`` unpartitioned is a
    single task, the same trap x01_global_rownum avoids. Decomposed:
    bucket keys by a monotone literal pid, take each row's bucket-LOCAL
    lead, then close the bucket seams by joining each bucket's LAST row
    to the NEXT bucket's minimum key (a num-partitions-row boundary
    frame, broadcast back). Monotone bucketing guarantees every key in
    bucket i precedes every key in bucket i+1, so local-lead + seam
    handoff is exactly the global lead — which the oracle's
    single-window form proves. Gaps are PLANTED deterministically
    (keys ≡ 7..9 mod 100 withheld in both engines — the synthetic
    corpus ships dense orderkeys, so without planting the gap list is
    empty and parity proves 0=0), giving ~3-wide gaps every 100 keys
    at every SF.
    operators/scale.py::missing_key_ranges (empty-partition seam case
    unit-tested in tests/test_scale.py)."""
    from .operators.scale import missing_key_ranges

    o = _ld(spark, sf_dir, "orders").filter(
        ~(F.col("o_orderkey") % 100).between(7, 9)
    )
    return missing_key_ranges(o, "o_orderkey", num_partitions=32)


@_register(
    "x07_calendar_spine",
    oracle="""
    WITH bounds AS (
        SELECT CAST(MIN(o_orderdate) AS DATE) AS dmin,
               CAST(MAX(o_orderdate) AS DATE) AS dmax
        FROM orders
    ),
    spine AS (
        SELECT CAST(unnest(generate_series(dmin, dmax,
                                           INTERVAL 1 DAY)) AS DATE) AS day
        FROM bounds
    ),
    daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                    AS BIGINT) AS day_cents
        FROM orders GROUP BY 1
    )
    SELECT s.day,
           COALESCE(d.n_orders, 0) AS n_orders,
           COALESCE(d.day_cents, 0) AS day_cents,
           d.day IS NULL AS is_empty_day
    FROM spine s LEFT JOIN daily d ON d.day = s.day
    """,
    survey_ids=("X7", "X5"),
)
def x07_calendar_spine(spark, sf_dir):
    """Calendar-spine densification (X7): every day between the first
    and last order date appears in the output, zero-filled when no
    order landed — the time-series completeness shape every reporting
    layer needs, because a groupBy alone silently OMITS empty periods
    and downstream charts/models read absence as nonexistence rather
    than zero. The spine generates from ONE scalar row
    (min/max bounds → sequence → explode; never a driver-side loop),
    the daily aggregate is one map-side-partial shuffle, and the
    left join broadcasts the DAILY AGGREGATE — the build side of a
    left-outer broadcast join must be the non-preserved (right) side;
    a hint on the preserved spine would be silently ignored (or force
    a nested-loop plan). Both sides are calendar-bounded (a century is
    36,525 rows), so the broadcast is always legal and the join runs
    with zero shuffle."""
    o = _ld(spark, sf_dir, "orders")
    bounds = o.agg(
        F.min(F.col("o_orderdate").cast("date")).alias("dmin"),
        F.max(F.col("o_orderdate").cast("date")).alias("dmax"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence("dmin", "dmax", F.expr("interval 1 day"))
        ).alias("day")
    )
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.count("*").alias("n_orders"),
        F.sum(_cents(F.col("o_totalprice"))).alias("day_cents"),
    )
    return (
        spine
        .join(
            F.broadcast(daily.withColumnRenamed("day", "dday")),
            F.col("day") == F.col("dday"),
            "left",
        )
        .select(
            "day",
            F.coalesce(F.col("n_orders"), F.lit(0)).alias("n_orders"),
            F.coalesce(F.col("day_cents"), F.lit(0)).alias("day_cents"),
            F.col("dday").isNull().alias("is_empty_day"),
        )
    )


@_register(
    "x04_rolling_wau",
    oracle="""
    WITH act AS (
        SELECT DISTINCT user_id,
               CAST(date_trunc('day', ts) AS DATE) AS day
        FROM events
    ),
    sp AS (
        SELECT user_id, day + t.i AS target_day
        FROM act CROSS JOIN unnest([0, 1, 2, 3, 4, 5, 6]) AS t(i)
    )
    SELECT target_day AS day,
           COUNT(DISTINCT user_id) AS wau
    FROM sp GROUP BY target_day
    """,
    survey_ids=("X4", "X6"),
)
def x04_rolling_wau(spark, sf_dir):
    """Trailing-7-day distinct active users per day (rolling WAU):
    COUNT(DISTINCT) over a sliding time frame is not expressible as a
    window in Spark (distinct aggregates are barred from window
    frames) and the naive day-range self-join re-scans the activity
    frame seven times. The scale-safe shape: collapse to the distinct
    (user, day) activity matrix once, then each activity row CASTS
    SEVEN VOTES — one per target day it keeps the user active for —
    via a constant 7-element explode, and a single distinct-count per
    target day finishes it. Fan-out is the window length (a constant),
    not the data; the only full shuffles are the activity distinct and
    the final two-phase distinct-count. Edge days with partial windows
    are reported identically in both engines (no silent trimming).
    Days past the last event accumulate trailing votes too — the
    'users still inside the 7-day window' tail a live dashboard
    shows."""
    ev = _ld(spark, sf_dir, "events")
    act = ev.select(
        "user_id",
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
    ).distinct()
    votes = act.select(
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("i"),
        "day",
    ).select(
        "user_id", F.date_add(F.col("day"), F.col("i")).alias("day")
    )
    return votes.groupBy("day").agg(
        F.count_distinct(F.col("user_id")).alias("wau")
    )


@_register(
    "x06_equidepth_hist",
    oracle="""
    WITH r AS (
      SELECT CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents,
             o_orderkey,
             NTILE(8) OVER (
               ORDER BY CAST(ROUND(o_totalprice * 100, 0) AS BIGINT),
                        o_orderkey) AS bucket
      FROM orders)
    SELECT CAST(bucket AS INTEGER) AS bucket,
           COUNT(*) AS n,
           MIN(cents) AS lo,
           MAX(cents) AS hi
    FROM r GROUP BY bucket
    """,
    survey_ids=("X6", "X1", "X4"),
)
def x06_equidepth_hist(spark, sf_dir):
    """Exact equi-depth histogram (X6's exact-quantile axis: 8 buckets
    of near-equal row count with true value boundaries — what
    optimizer statistics, drift monitors and calibration tables need)
    WITHOUT the single-task global window: ``NTILE(8) OVER (ORDER BY
    ...)`` with no PARTITION BY is the same 100 TB scale-killer as
    global ROW_NUMBER, so this reuses x01_global_rownum's two-phase
    decomposition (monotone range bucketing -> partition-local
    row_number -> tiny offset broadcast) and then maps each global
    rank to its NTILE bucket with the exact integer arithmetic of the
    SQL-standard definition (first N mod B buckets take one extra
    row). The order key (cents, o_orderkey) is total, so bucket
    assignment is deterministic and the oracle — the single-task
    NTILE form — proves the decomposition exact, tie-handling
    included."""
    from .operators.scale import _monotone_pid

    o = _ld(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("cents"),
        "o_orderkey",
    )
    n_total = o.count()
    n_buckets = 8
    q, r = n_total // n_buckets, n_total % n_buckets
    part = o.withColumn("pid", _monotone_pid(o, "cents", 32))
    wp = Window.partitionBy("pid").orderBy("cents", "o_orderkey")
    local = part.withColumn("local_rn", F.row_number().over(wp))
    counts = part.groupBy("pid").agg(F.count("*").alias("n"))
    wo = Window.orderBy("pid").rowsBetween(
        Window.unboundedPreceding, Window.currentRow - 1
    )
    offsets = counts.select(
        "pid", F.coalesce(F.sum("n").over(wo), F.lit(0)).alias("offset")
    )
    rn = (F.col("local_rn") + F.col("offset")).cast("bigint")
    # SQL-standard NTILE: the first r buckets hold q+1 rows, the rest q
    bucket = F.when(
        rn <= r * (q + 1), (rn - 1) / (q + 1)
    ).otherwise(r + (rn - r * (q + 1) - 1) / q if q else F.lit(0))
    return (
        local.join(F.broadcast(offsets), "pid")
        .withColumn("bucket", (F.floor(bucket) + 1).cast("int"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.min("cents").alias("lo"),
            F.max("cents").alias("hi"),
        )
    )
