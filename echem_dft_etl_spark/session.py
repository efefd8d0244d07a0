"""SparkSession factory with scale-oriented defaults.

The engine targets large clusters (the design point is ~100 TB on ~1000
executors); tests run on ``local[N]``. The session config is therefore
expressed as *ratios and toggles* that hold at any scale rather than
absolute sizes tuned to the laptop:

- AQE on (runtime shuffle-partition coalescing, skew-join splitting,
  broadcast-join demotion/promotion) so the same logical plans survive a
  100x scale-up without re-tuning.
- Arrow on for every Python<->JVM boundary (pandas UDFs, toPandas).
- Session timezone pinned to UTC so timestamp semantics are identical to
  the DuckDB oracle used by the correctness harness.
- Nested-schema pruning on so struct-heavy tables (the materials model,
  SURVEY.md §1.2) only read the accessed subfields off parquet.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_session(
    app_name: str = "echem-dft-etl-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, falling back
    to ``local[*]``) so tests and bench share one entry point; on a real
    cluster the caller passes its own master / lets spark-submit set it.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        # AQE: coalesce post-shuffle partitions, split skewed ones, and
        # switch join strategies at runtime — the knobs that make one
        # logical plan work from sf0.001 to 100 TB.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # NOTE (r13): the r12 session set
        # spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold=64m
        # (AQE SMJ→SHJ runtime conversion) on a 3-query interleaved
        # win. The r13 suite-wide validation (VERDICT r12 item 2)
        # REMOVED it: a full-registry interleaved A/B (246 queries × 2
        # samples/arm, plans/r13/ab_shj_suite.json) measured 64m-vs-0
        # flat (sum-of-mins ratio 0.987, median 0.990 — the r12 wins
        # were host noise), and post-AQE FINAL plans captured for the
        # motivating queries (x05_pagerank, d16_semdedup,
        # d25_entity_resolution, plus d29/d14/s15/bfs;
        # plans/r13/*_final_shj*.txt, isFinalPlan=true) contain ZERO
        # ShuffledHashJoin under 64m and even under a 1g threshold —
        # the conversion never fires in this deployment, so the conf
        # was a placebo. Spark's default (0 = never) returns.
        # Runtime Bloom-filter join pruning (off by default in Spark):
        # for selective joins the build side's keys prune the probe-side
        # scan before the shuffle. The size thresholds (scan >= 10 GB)
        # keep it dormant on test-scale data and make it kick in exactly
        # where it pays — the 100 TB fact-table joins.
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.optimizer.nestedSchemaPruning.enabled", "true")
        # The corpus stores TIMESTAMP(NANOS) (events.ts); Spark has no
        # nanosecond timestamp type, so read nanos as int64 and let the
        # source layer truncate to microseconds (matching how
        # microsecond-native engines, incl. the DuckDB oracle, read it).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Keep driver results bounded; operators never collect big data.
        .config("spark.driver.maxResultSize", "2g")
        # In local mode the driver JVM IS the executor; Spark's 1g
        # default heap starves 32 task threads (observed: GCLocker
        # retry OOMs on scale probes). Only effective before the JVM
        # launches — an externally created session keeps its own value.
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
        )
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
