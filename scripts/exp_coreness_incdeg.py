#!/usr/bin/env python
"""Experiment (VERDICT r12 item 4): incremental degree maintenance in
the k-core peel — per round, subtract the dropped endpoints'
contributions from the previous round's degree frame (cascade-sized
aggregation) instead of recomputing degrees from the full surviving
edge list.

Correctness argument: for a surviving node v, the edges v loses in a
round are exactly its edges whose OTHER endpoint was dropped, so
    deg'(v) = deg(v) − #{(v,u) ∈ E : u ∈ drop},   v ∉ drop
and nodes whose degree hits 0 are swept into the next round's drop
(anti-joining a zero-degree node is a no-op, so the edge sequence —
and therefore the output — is identical to the recompute form). The
script PROVES output equality (symmetric difference on the full
(v, coreness) result) before timing an interleaved A/B.

Usage: python scripts/exp_coreness_incdeg.py [n_rounds] [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _load1() -> float:
    try:
        with open("/proc/loadavg") as fh:
            return float(fh.read().split()[0])
    except Exception:
        return -1.0


def coreness_grid_incdeg(pairs, ks=(60, 80, 90), rounds=8):
    """coreness_grid with incremental degree maintenance (see module
    docstring). Mirrors operators/components.py::coreness_grid in
    every checkpoint/early-exit decision so the comparison is purely
    the degree-update strategy."""
    from pyspark.sql import functions as F

    from echem_dft_etl_spark.operators.storage import (
        release_rdds,
        scoped_shuffle_width,
        tracked_checkpoint,
    )

    spark = pairs.sparkSession
    keep_ids: list = []
    ok = False

    def _nodes(ed):
        return ed.select(F.explode(F.array("a", "b")).alias("v"))

    try:
        ed = tracked_checkpoint(pairs, keep_ids)
        n_edges = ed.count()
        grades = [_nodes(ed).select("v", F.lit(0).alias("grade"))]
        with scoped_shuffle_width(spark, n_edges):
            for k in ks:
                if n_edges == 0:
                    break
                loop_ids: list = []
                cur = n_edges
                # degrees of the grade's input graph, computed ONCE
                deg = (
                    _nodes(ed)
                    .groupBy("v")
                    .agg(F.count(F.lit(1)).alias("deg"))
                )
                deg = tracked_checkpoint(deg, loop_ids)
                deg.count()
                for i in range(rounds):
                    drop = deg.filter(F.col("deg") < k).select("v")
                    ed_new = ed.join(
                        drop.select(F.col("v").alias("a")), "a", "left_anti"
                    ).join(
                        drop.select(F.col("v").alias("b")), "b", "left_anti"
                    )
                    # losses to SURVIVING endpoints from removed edges
                    loss = (
                        ed.join(
                            drop.select(F.col("v").alias("a")),
                            "a",
                            "left_semi",
                        )
                        .select(F.col("b").alias("v"))
                        .unionAll(
                            ed.join(
                                drop.select(F.col("v").alias("b")),
                                "b",
                                "left_semi",
                            ).select(F.col("a").alias("v"))
                        )
                        .join(drop, "v", "left_anti")
                        .groupBy("v")
                        .agg(F.count(F.lit(1)).alias("lost"))
                    )
                    deg = (
                        deg.join(drop, "v", "left_anti")
                        .join(loss, "v", "left")
                        .select(
                            "v",
                            (
                                F.col("deg")
                                - F.coalesce(F.col("lost"), F.lit(0))
                            ).alias("deg"),
                        )
                    )
                    ed = ed_new
                    if i % 2 == 1 or i == rounds - 1:
                        round_ids: list = []
                        ed = tracked_checkpoint(ed, round_ids)
                        deg = tracked_checkpoint(deg, round_ids)
                        deg.count()
                        release_rdds(spark, loop_ids)
                        loop_ids = round_ids
                        n_now = ed.count()
                        if n_now == cur:
                            break
                        cur = n_now
                keep_ids.extend(loop_ids)
                n_edges = cur
                if cur > 0:
                    grades.append(
                        _nodes(ed).select("v", F.lit(k).alias("grade"))
                    )
            out = grades[0]
            for g in grades[1:]:
                out = out.unionByName(g)
            out = out.groupBy("v").agg(
                F.max("grade").cast("bigint").alias("coreness")
            )
        ok = True
        return out
    finally:
        if not ok:
            release_rdds(spark, keep_ids)


def main() -> int:
    n_rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    out_path = (
        Path(sys.argv[2])
        if len(sys.argv) > 2
        else REPO / "plans/r13/ab_coreness_incdeg.json"
    )

    from pyspark.sql import functions as F

    from echem_dft_etl_spark.operators.components import coreness_grid
    from echem_dft_etl_spark.session import get_session
    from echem_dft_etl_spark.sources import load_table

    spark = get_session(app_name="coreness-incdeg")
    spark.sparkContext.setLogLevel("ERROR")

    def pairs_df():
        li = load_table(spark, SF_DIR, "lineitem")
        grp = li.groupBy("l_orderkey").agg(
            F.collect_set("l_partkey").alias("ps")
        )
        pair_arr = F.flatten(
            F.transform(
                "ps",
                lambda x: F.transform(
                    F.col("ps"),
                    lambda y: F.struct(x.alias("a"), y.alias("b")),
                ),
            )
        )
        return (
            grp.select(F.explode(pair_arr).alias("p"))
            .filter(F.col("p.a") < F.col("p.b"))
            .select("p.a", "p.b")
            .distinct()
        )

    def release_all() -> None:
        try:
            m = spark.sparkContext._jsc.getPersistentRDDs()
            for rdd in m.values():
                rdd.unpersist(False)
            spark.catalog.clearCache()
        except Exception:
            pass

    # equality proof first
    cur = coreness_grid(pairs_df())
    new = coreness_grid_incdeg(pairs_df())
    diff = cur.exceptAll(new).count() + new.exceptAll(cur).count()
    print(f"coreness symmetric difference: {diff}")
    assert diff == 0, "incremental-degree variant differs — DO NOT time"
    release_all()

    arms = {
        "recompute_current": lambda: coreness_grid(pairs_df()),
        "incremental_deg": lambda: coreness_grid_incdeg(pairs_df()),
    }
    results = {k: {"runs": [], "loads": []} for k in arms}
    for fn in arms.values():
        fn().write.format("noop").mode("overwrite").save()
        release_all()
    for r in range(n_rounds):
        order = list(arms.items())
        if r % 2 == 1:
            order.reverse()
        for arm, fn in order:
            la = _load1()
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            results[arm]["runs"].append(round(time.perf_counter() - t0, 3))
            results[arm]["loads"].append(la)
            release_all()

    for arm, r in results.items():
        r["min_seconds"] = min(r["runs"])
        r["median_seconds"] = sorted(r["runs"])[len(r["runs"]) // 2]

    out_path.write_text(
        json.dumps(
            {
                "generated_by": "scripts/exp_coreness_incdeg.py",
                "sf_dir": SF_DIR,
                "n_rounds": n_rounds,
                "symmetric_difference": diff,
                "arms": results,
            },
            indent=1,
        )
        + "\n"
    )
    print(f"wrote {out_path}")
    for arm, r in results.items():
        print(
            f"  {arm}: min={r['min_seconds']} median={r['median_seconds']} "
            f"runs={r['runs']} loads={r['loads']}"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
