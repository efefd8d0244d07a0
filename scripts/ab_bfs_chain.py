#!/usr/bin/env python
"""Interleaved A/B: x05_bfs_distances chain construction (VERDICT r12
item 1) — the r12 one-scan collect_list + in-row successor expansion
(arm A, current code) vs the r11 two-scan (orderkey, linenumber+1)
self-join (arm B). Both feed the identical bfs_distances loop; both are
oracle-exact (proven in r12), so this is purely a speed call. Also
asserts the two chain relations are row-identical before timing.

Usage:
    python scripts/ab_bfs_chain.py [n_rounds] [out.json]
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


def main() -> int:
    n_rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    out_path = (
        Path(sys.argv[2]) if len(sys.argv) > 2 else REPO / "AB_BFS_CHAIN.json"
    )

    from pyspark.sql import functions as F

    from echem_dft_etl_spark.operators.components import bfs_distances
    from echem_dft_etl_spark.registry import all_queries
    from echem_dft_etl_spark.session import get_session
    from echem_dft_etl_spark.sources import load_table

    spark = get_session(app_name="ab-bfs-chain")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()

    def chain_selfjoin():
        li = load_table(spark, SF_DIR, "lineitem")
        l1 = li.select(
            F.col("l_orderkey").alias("k"),
            F.col("l_linenumber").alias("i"),
            F.col("l_partkey").alias("a"),
        )
        l2 = li.select(
            F.col("l_orderkey").alias("k"),
            (F.col("l_linenumber") - 1).alias("i"),
            F.col("l_partkey").alias("b"),
        )
        return (
            l1.join(l2, ["k", "i"])
            .filter(F.col("a") != F.col("b"))
            .select(
                F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
            )
            .distinct()
        )

    def run_current() -> None:
        specs["x05_bfs_distances"].fn(spark, SF_DIR).write.format(
            "noop"
        ).mode("overwrite").save()

    def run_selfjoin() -> None:
        seeds = spark.createDataFrame([(1,), (2,), (3,)], "v bigint")
        bfs_distances(chain_selfjoin(), seeds, max_hops=6).write.format(
            "noop"
        ).mode("overwrite").save()

    def release() -> None:
        try:
            m = spark.sparkContext._jsc.getPersistentRDDs()
            for rdd in m.values():
                rdd.unpersist(False)
            spark.catalog.clearCache()
        except Exception:
            pass

    # Equivalence first: the two chain relations must be row-identical.
    from echem_dft_etl_spark.registry_llm import x05_bfs_distances  # noqa: F401

    li = load_table(spark, SF_DIR, "lineitem")
    grp = li.groupBy("l_orderkey").agg(
        F.collect_list(
            F.struct(
                F.col("l_linenumber").alias("ln"),
                F.col("l_partkey").alias("pk"),
            )
        ).alias("ls")
    )
    pair_arr = F.flatten(
        F.transform(
            "ls",
            lambda x: F.transform(
                F.filter(
                    F.col("ls"),
                    lambda y: (y["ln"] == x["ln"] + 1) & (x["pk"] != y["pk"]),
                ),
                lambda y: F.struct(
                    F.least(x["pk"], y["pk"]).alias("a"),
                    F.greatest(x["pk"], y["pk"]).alias("b"),
                ),
            ),
        )
    )
    chain_onescan = (
        grp.select(F.explode(pair_arr).alias("p")).select("p.a", "p.b").distinct()
    )
    sym_diff = (
        chain_onescan.exceptAll(chain_selfjoin()).count()
        + chain_selfjoin().exceptAll(chain_onescan).count()
    )
    print(f"chain symmetric difference: {sym_diff}")
    assert sym_diff == 0, "chain variants differ — DO NOT compare speed"
    release()

    arms = {"onescan_current": run_current, "selfjoin_r11": run_selfjoin}
    results = {k: {"runs": [], "loads": []} for k in arms}
    for fn in arms.values():  # untimed warmup
        fn()
        release()
    for r in range(n_rounds):
        order = list(arms.items())
        if r % 2 == 1:
            order.reverse()
        for arm, fn in order:
            la = _load1()
            t0 = time.perf_counter()
            fn()
            results[arm]["runs"].append(round(time.perf_counter() - t0, 3))
            results[arm]["loads"].append(la)
            release()

    for arm, r in results.items():
        r["min_seconds"] = min(r["runs"])
        r["median_seconds"] = sorted(r["runs"])[len(r["runs"]) // 2]

    out_path.write_text(
        json.dumps(
            {
                "generated_by": "scripts/ab_bfs_chain.py",
                "sf_dir": SF_DIR,
                "n_rounds": n_rounds,
                "chain_symmetric_difference": sym_diff,
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
