#!/usr/bin/env python
"""Dump ``explain("formatted")`` for named queries to files.

Usage:
    python scripts/dump_plans.py <outdir> <suffix> q1,q2,... [sf_dir]

Writes ``<outdir>/<query>_<suffix>.txt`` per query. Iterative
operators truncate lineage at localCheckpoint boundaries; like
scripts/plan_report.py this intercepts ``localCheckpoint`` and
appends the plan of every frame at the moment it is checkpointed, so
the file shows the whole computation, not just the final stitched
frame.
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def _formatted(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    outdir = Path(sys.argv[1])
    suffix = sys.argv[2]
    names = sys.argv[3].split(",")
    sf_dir = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.01"
    outdir.mkdir(parents=True, exist_ok=True)

    from pyspark.sql.classic.dataframe import DataFrame

    from echem_dft_etl_spark.registry import all_queries
    from echem_dft_etl_spark.session import get_session

    spark = get_session(app_name="dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()

    orig_ckpt = DataFrame.localCheckpoint
    for name in names:
        sections: list[str] = []

        def capturing_ckpt(self, eager=True):
            sections.append(
                f"--- plan at localCheckpoint boundary "
                f"#{len(sections) + 1} ---\n" + _formatted(self)
            )
            return orig_ckpt(self, eager=eager)

        DataFrame.localCheckpoint = capturing_ckpt
        try:
            df = specs[name].fn(spark, sf_dir)
            final = _formatted(df)
        finally:
            DataFrame.localCheckpoint = orig_ckpt
        text = "\n".join(sections + [f"--- final frame plan ---\n{final}"])
        (outdir / f"{name}_{suffix}.txt").write_text(text)
        print(f"wrote {name}_{suffix}.txt ({len(sections)} ckpt sections)")


if __name__ == "__main__":
    main()
