"""echem_dft_etl_spark — a PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the query and data-processing
capabilities of the reference pipeline ``bolton2710/echem-dft-etl``
(an Airflow TaskFlow ETL, see SURVEY.md), generalized into a reusable
engine:

- ``sources``    — parquet/text/JDBC loaders & sinks with pushdown-friendly
                   declarative scans.
- ``functions``  — column-expression libraries (deterministic cross-engine
                   hashing, vector math via higher-order functions, text
                   normalization/tokenization).
- ``operators``  — relational, sampling, window/sessionization, dedup,
                   similarity-search, text-analysis, reference-specific
                   (echem) and external-process operators. All return lazy
                   DataFrames; Catalyst plans the physical execution.
- ``streaming``  — Structured Streaming forms of the window operators.
- ``plans``      — plan-inspection helpers (pushdown / codegen assertions).

Everything is built on the public Apache Spark DataFrame API; no RDD hot
paths, no row-at-a-time Python UDFs in query paths.
"""

__version__ = "0.1.0"
