"""Local mirror of the driver's correctness gate.

For every registry entry with an oracle: run the Spark query and the
DuckDB SQL on the same parquet tables (sf0.001 for speed; the driver
re-runs at sf0.01), normalize (sort columns by name, sort rows), and
require exact value equality. Queries are authored so results are
bit-identical — no tolerance is applied here, by design.
"""

from __future__ import annotations

import datetime as dt
import math

import pytest

from tests.conftest import SF_SMOKE


def _normalize_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return v
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, dt.date):
        return v.isoformat()
    # numpy scalars -> python
    if hasattr(v, "item"):
        return v.item()
    return v


def _normalize_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_normalize_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


def _spark_result(spark, fn):
    df = fn(spark, SF_SMOKE)
    return [f.lower() for f in df.columns], [tuple(r) for r in df.collect()]


def _duck_result(duck, sql):
    cur = duck.sql(sql)
    cols = [c.lower() for c in cur.columns]
    return cols, [tuple(r) for r in cur.fetchall()]


def _queries_with_oracle():
    from echem_dft_etl_spark.registry import all_queries

    return [(n, s) for n, s in sorted(all_queries().items()) if s.oracle]


@pytest.mark.parametrize(
    "name,spec", _queries_with_oracle(), ids=[n for n, _ in _queries_with_oracle()]
)
def test_oracle_parity(spark, duck, name, spec):
    s_cols, s_rows = _spark_result(spark, spec.fn)
    d_cols, d_rows = _duck_result(duck, spec.oracle)
    s_cols, s_norm = _normalize_rows(s_cols, s_rows)
    d_cols, d_norm = _normalize_rows(d_cols, d_rows)
    assert s_cols == d_cols, f"{name}: column mismatch {s_cols} vs {d_cols}"
    assert len(s_norm) == len(d_norm), (
        f"{name}: row count {len(s_norm)} vs {len(d_norm)}"
    )
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_norm, d_norm)) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == [
        "s_suppkey",
        "s_name",
        "n_name",
        "n_obs",
        "slope_price_per_qty",
        "intercept_price",
        "anchor_price_q1",
    ]


def test_contract_shapes():
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    assert all(callable(f) for f in qs.values())
    assert all(isinstance(s, str) and s.strip() for s in os_.values())
