"""Regression guard for the round-3..5 `s01_sink_roundtrip` driver red.

Root cause (diagnosed round 6 from the per-invocation evidence dump):
DuckDB's ``SUM`` over an integer argument returns HUGEINT (int128).
``fetchall()`` converts HUGEINT to a Python int — so the local parity
mirror compared equal — but the arrow/pandas collection path the
driver's value hash rides widens HUGEINT to ``decimal128(38,0)`` /
float64, so the hash saw ``376931.0`` against Spark's ``376931`` and
went red with numerically identical results, three rounds running.

The fix is an outer ``CAST(SUM(...) AS BIGINT)`` in every oracle whose
output would otherwise carry a HUGEINT column. This test pins the
whole registry: no oracle may emit a decimal/hugeint column on the
arrow path, ever again. DuckDB-only — no SparkSession — so it runs in
seconds and fails fast on any newly-registered oracle with a naked
integer SUM. The deeper family check (int-vs-float/bool/date per
column against the Spark schema) rides test_oracle_parity, which
already holds both results.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def duck():
    import duckdb

    from echem_dft_etl_spark.sources import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'"
        )
    return con


def _oracles():
    from echem_dft_etl_spark.registry import all_queries

    return [(n, s.oracle) for n, s in sorted(all_queries().items()) if s.oracle]


@pytest.mark.parametrize(
    "name,oracle", _oracles(), ids=[n for n, _ in _oracles()]
)
def test_oracle_has_no_hugeint_columns(duck, name, oracle):
    tbl = duck.sql(oracle).arrow()
    hug = {
        f.name: str(f.type)
        for f in tbl.schema
        if str(f.type).startswith("decimal")
    }
    assert not hug, (
        f"{name}: oracle emits HUGEINT/decimal columns {hug} — the driver's "
        "arrow/pandas hash path widens these to float and hash-fails against "
        "Spark's bigint even when values are identical. Wrap the aggregate "
        "in CAST(... AS BIGINT)."
    )
