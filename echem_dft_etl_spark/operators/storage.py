"""Tracked executor-storage lifecycle for iterative operators.

``DataFrame.localCheckpoint`` pins its result blocks in executor
storage for the SESSION lifetime — ``DataFrame.unpersist`` does not
touch them (it clears plan-cache entries, not the checkpoint RDD). The
only release handle is the persistent-RDD registry. Iterative
operators (connected components, BFS, PageRank, triangle counting),
the reference-pipeline runner and the scale-probe harness all
checkpoint per round; in a long-lived session (the driver's bench runs
the whole registry in one JVM) unreleased rounds accumulate as
suite-wide storage/GC slowdown. These helpers capture the RDD ids a
checkpoint pinned so callers can release exactly what they own — a
public utility so production code never reaches into another module's
underscore internals.

On a real cluster with a reliable checkpoint dir, ``checkpoint``
swaps in for fault tolerance; the tracking discipline is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def persistent_rdd_ids(spark) -> set:
    """Ids of RDDs currently pinned in executor storage."""
    it = spark.sparkContext._jsc.getPersistentRDDs().keySet().iterator()
    out = set()
    while it.hasNext():
        out.add(it.next())
    return out


def tracked_checkpoint(df: DataFrame, owned_ids: list) -> DataFrame:
    """``localCheckpoint`` that records the storage ids it pinned into
    ``owned_ids`` for later :func:`release_rdds`."""
    spark = df.sparkSession
    before = persistent_rdd_ids(spark)
    ck = df.localCheckpoint()
    owned_ids.extend(persistent_rdd_ids(spark) - before)
    return ck


def release_rdds(spark, ids) -> None:
    """Unpersist the given RDD ids (non-blocking); missing ids no-op —
    a superseded checkpoint may already have been released."""
    m = spark.sparkContext._jsc.getPersistentRDDs()
    for i in ids:
        r = m.get(i)
        if r is not None:
            r.unpersist(False)
