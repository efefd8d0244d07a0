"""Declarative parquet sources for the test corpus.

The reference pipeline's sources are a remote API queried with pushed
predicates (``my_dag.py:28-29``, ``:69-70``). The Spark-native equivalent
is a parquet scan whose filters/projections Catalyst pushes into the
reader — callers express scans declaratively (``load_table(...).filter``)
and the optimizer produces ``PushedFilters`` / pruned ``ReadSchema``
automatically (verified in tests/test_plans.py).

At the 100 TB design point each "table" would be a partitioned parquet
dataset (or an Iceberg/Delta table); a single ``spark.read.parquet`` on
the root directory keeps that swap a one-liner.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

#: The driver-generated corpus (TESTDATA.md): TPC-H-ish star schema plus
#: event-stream / document / embedding tables.
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def prepare_session(spark: SparkSession) -> SparkSession:
    """Pin the runtime confs the engine's semantics depend on.

    Idempotent and cheap; called from every loader so the engine behaves
    identically under an externally-created (vanilla) SparkSession — the
    driver contract hands us its own session, not ours.
    """
    # Timestamps must compare equal to microsecond-native naive readers.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # events.ts is parquet TIMESTAMP(NANOS); Spark must not refuse it.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one corpus table. Schema-on-read from the parquet footer."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    prepare_session(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        # Parquet TIMESTAMP(NANOS) arrives as int64 nanos (see
        # session.py nanosAsLong); truncate to microseconds exactly as
        # microsecond-native readers (DuckDB, Spark's own µs type) do.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every corpus table as a temp view for ``spark.sql``.

    Mirrors the reference's third-party SQL surface (direct SQL against
    ``dft_echem``, SURVEY.md §3 entry point 3): any SQL client of the
    session can query the same tables the DataFrame API sees.
    """
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
