#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Runs the registry's headline queries on local[$SPARK_GRAFT_CPUS]
(default sf0.1, local[32]) and prints exactly ONE JSON line:

    {"metric": "suite_seconds", "value": <total>, "unit": "sec",
     "queries": {"<name>": <sec>, ...}, "sf": <sf>}

Each query is forced end-to-end with the noop sink (full execution, no
driver collect bottleneck). One warm-up run of a tiny query first so JVM
/ codegen startup isn't attributed to the first query.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: Not timed: the reference e2e composes stages benched individually
#: and spends its time in temp-dir sink setup + subprocess solvers.
EXCLUDE: frozenset[str] = frozenset({"pipeline_reference_e2e"})

#: The r1/r2 headline set, kept FIRST and in this order so
#: round-over-round deltas line up; every other registered query is
#: appended behind it (r3: bench the unbenched half — streaming,
#: UDTF/UDAF surfaces, packing, cube/pivot, ANN variants — so
#: regressions are visible everywhere).
HEADLINE: tuple[str, ...] = (
    "echem_flagship",
    "q01_pushdown_scan",
    "q05_last_match_per_key",
    "q08_scalar_arithmetic",
    "q11_det_sample",
    "q14_group_index",
    "q16_upsert_first_wins",
    "q17_multi_join",
    "q21_pricing_summary",
    # analytics extensions
    "x01_group_topk",
    "x03_rollup",
    "x04_analytic_windows",
    "x06_percentiles_distinct",
    "x09_sessionize",
    # LLM-pipeline operators
    "d11_dedup_exact",
    "d12_minhash_lsh",
    "d13_simhash",
    "s12_cosine_topk",
    "s12_ivf_topk",
    "s12_embed_quantize",
    "t13_token_stats",
    "t13_language_id",
    "t13_fingerprint",
    # reference-shape and surface queries
    "q13_generate_grid",
    "q18_grouped_collect",
    "s15_salted_join",
    "mm_decode_features",
    "x02_set_ops",
    "x08_json_extract",
    "d14_ngram_jaccard",
    "s12_kmeans_refine",
    "s16_asof_join",
    "x03_time_rollup",
    "sql_surface_pricing",
    # r2 additions: the rewritten pair queries (regression guards for the
    # banded/blocked join shapes) and the nested materials model
    "d13_simhash_pairs",
    "s12_cosine_near_pairs",
    "d01_nested_sites",
    # r2: iterative graph exemplar — transitive dedup clusters
    "d12_dup_clusters",
    # r2: ranked retrieval (BM25, lane-expression tf + one-row stats)
    "t13_bm25_topk",
    # r2: eval decontamination + repetition quality gates
    "d15_decontaminate",
    "t13_repetition",
)


def bench_names(specs) -> tuple[str, ...]:
    """Headline order first, then every other registered query."""
    rest = [n for n in specs if n not in HEADLINE and n not in EXCLUDE]
    return tuple(n for n in HEADLINE if n in specs) + tuple(rest)


def main() -> None:
    from echem_dft_etl_spark.registry import all_queries
    from echem_dft_etl_spark.session import get_session

    spark = get_session(app_name="echem-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()
    names = bench_names(specs)

    # Warm up the JVM, then compile every headline plan once against the
    # smallest fixture: whole-stage codegen caches generated classes by
    # source, and the generated code is identical across scale factors,
    # so the timed sf runs measure execution, not javac/JIT.
    spark.range(1000).selectExpr("sum(id)").collect()
    warm_dir = "/root/testdata/sf0.001"
    # one-time fixture materialization (both on-disk binaryFile
    # corpora) happens OUTSIDE the timed loop — fixture generation
    # isn't query execution, and only the first run of a round would
    # ever pay it
    try:
        from echem_dft_etl_spark.operators import multimodal
        from echem_dft_etl_spark.sources import load_table

        docs = load_table(spark, SF_DIR, "documents")
        multimodal.materialize_bmp_files(spark, SF_DIR, docs)
        multimodal.materialize_wav_files(spark, SF_DIR, docs)
    except Exception:
        pass
    for name in names:
        try:
            specs[name].fn(spark, warm_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:
            pass  # warm-up is best-effort; the timed run reports errors

    def release_leftovers() -> None:
        """Between-query storage hygiene (UNTIMED): drop any persistent
        RDDs and cached plans a query left behind so later queries are
        measured against a clean heap, not the accumulated storage of
        everything before them (the whole registry shares this JVM)."""
        try:
            m = spark.sparkContext._jsc.getPersistentRDDs()
            it = m.values().iterator()
            while it.hasNext():
                it.next().unpersist(False)
            spark.catalog.clearCache()
        except Exception:
            pass

    release_leftovers()
    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        df = specs[name].fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)
        release_leftovers()

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "suite_seconds",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )


if __name__ == "__main__":
    main()
