#!/usr/bin/env python
"""Compare two BENCH_DETAIL.json artifacts with host-load awareness.

Usage: python scripts/bench_compare.py OLD.json NEW.json [ratio]

Per-query regression calls on this VM are only meaningful when (a) the
ratio clears a threshold (default 2.0 — same-host identical suites
drift 1.3-1.7x) AND (b) neither run was load-contaminated: round 6
found a single background parity run inflating individual queries
3-8x (d25 6 s → 43 s) and the whole suite 2x, which suite-vs-suite
diffing would have mislabeled as a code regression. The tool prints
the loadavg fingerprints first, flags the comparison as UNRELIABLE
when either side started above a 1-min load of 4, and then lists
regressions/improvements past the threshold using each query's
recorded statistic (headline median / rest min).
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    old = json.load(open(sys.argv[1]))
    new = json.load(open(sys.argv[2]))
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0

    for label, d in (("old", old), ("new", new)):
        print(
            f"{label}: suite {d.get('value')} s, sf {d.get('sf')}, "
            f"load start {d.get('loadavg_start')} end {d.get('loadavg_end')}"
        )
    unreliable = [
        label
        for label, d in (("old", old), ("new", new))
        if (d.get("loadavg_start") or [0])[0] > 4.0
    ]
    if unreliable:
        print(
            f"WARNING: {'/'.join(unreliable)} run(s) started under load — "
            "per-query calls below are UNRELIABLE; re-run on an idle host."
        )

    qo, qn = old.get("queries", {}), new.get("queries", {})
    rows = []
    for name in sorted(set(qo) & set(qn)):
        a, b = qo[name], qn[name]
        if a > 0.3 and b > 0.3:  # sub-300ms queries are pure noise
            rows.append((b / a, name, a, b))
    regressions = [r for r in rows if r[0] >= threshold]
    improvements = [r for r in rows if r[0] <= 1 / threshold]
    for title, group in (
        ("regressions", sorted(regressions, reverse=True)),
        ("improvements", sorted(improvements)),
    ):
        print(f"{title} (>= {threshold}x, both sides > 0.3 s): {len(group)}")
        for ratio, name, a, b in group[:20]:
            print(f"  {ratio:6.2f}x  {name}: {a} -> {b} s")
    only_new = sorted(set(qn) - set(qo))
    if only_new:
        print(f"new queries: {', '.join(only_new)}")
    return 1 if (regressions and not unreliable) else 0


if __name__ == "__main__":
    sys.exit(main())
