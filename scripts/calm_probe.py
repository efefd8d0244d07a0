#!/usr/bin/env python
"""Calm-host probe: committed min-of-runs evidence for named queries.

The bench suite measures every query behind ~230 others sharing one
JVM — suite context (GC debt, page-cache pressure, the host's own
load ramp) inflates the handful of queries whose VERDICT bars are
tight. This harness is the judge-endorsed "calm re-run" slot (VERDICT
r10 item 2): it WAITS for the 1-min loadavg to drop under a gate,
then times the named queries isolated (fresh session, one untimed
warmup pass each, interleaved samples), recording the loadavg beside
every sample so the artifact carries its own comparability proof.

Usage:
    python scripts/calm_probe.py q1,q2 [n_runs] [gate] [out.json]

Defaults: n_runs=6, gate=1.5, out=CALMPROBE_r{N}.json (N inferred
like verify_local / scale_probe).
"""

from __future__ import annotations

import json
import os
import re
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


def _artifact_path() -> Path:
    if len(sys.argv) > 4:
        return Path(sys.argv[4])
    rounds = [
        int(m.group(1))
        for f in REPO.glob("CORRECTNESS_r*.json")
        if (m := re.match(r"CORRECTNESS_r(\d+)\.json", f.name))
    ]
    n = (max(rounds) + 1) if rounds else 1
    return REPO / f"CALMPROBE_r{n:02d}.json"


def main() -> int:
    names = sys.argv[1].split(",")
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    gate = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5

    # gate BEFORE the JVM exists (it adds its own load)
    t0 = time.time()
    waited = 0.0
    while _load1() > gate and time.time() - t0 < 900:
        time.sleep(10)
    waited = round(time.time() - t0, 1)
    load_at_start = _load1()

    from echem_dft_etl_spark.registry import all_queries
    from echem_dft_etl_spark.session import get_session

    spark = get_session(app_name="calm-probe")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()

    def timed(name: str) -> tuple[float, float]:
        la = _load1()
        t = time.perf_counter()
        specs[name].fn(spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        return round(time.perf_counter() - t, 3), la

    results = {n: {"runs": [], "run_loadavg": [], "warmup": None} for n in names}
    for name in names:  # untimed warmup pass (JIT, page cache, codegen)
        results[name]["warmup"] = timed(name)[0]
    for _ in range(n_runs):  # interleaved samples
        for name in names:
            dt, la = timed(name)
            results[name]["runs"].append(dt)
            results[name]["run_loadavg"].append(la)
    for name in names:
        results[name]["min_seconds"] = min(results[name]["runs"])
        results[name]["median_seconds"] = sorted(results[name]["runs"])[
            len(results[name]["runs"]) // 2
        ]

    artifact = {
        "generated_by": "scripts/calm_probe.py",
        "sf_dir": SF_DIR,
        "gate": gate,
        "gate_wait_seconds": waited,
        "loadavg_at_start": load_at_start,
        "loadavg_at_end": _load1(),
        "n_runs": n_runs,
        "queries": results,
    }
    out = _artifact_path()
    out.write_text(json.dumps(artifact, indent=1) + "\n")
    print(f"wrote {out}")
    for name in names:
        r = results[name]
        print(
            f"  {name}: min={r['min_seconds']} median={r['median_seconds']} "
            f"runs={r['runs']} loads={r['run_loadavg']}"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
