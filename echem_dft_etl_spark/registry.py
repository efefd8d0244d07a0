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


def all_queries() -> dict[str, QuerySpec]:
    return dict(_REGISTRY)


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
        .orderBy("s_suppkey")
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
           SUM(CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT)
               * (100 - CAST(ROUND(l.l_discount * 100, 0) AS BIGINT)))
             AS revenue_c4
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
           SUM(CAST(l_quantity AS BIGINT)) AS sum_qty,
           SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS sum_base_cents,
           SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
               * (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT))) AS sum_disc_c4,
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
