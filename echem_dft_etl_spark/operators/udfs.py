"""The engine's Python-UDF surface (SURVEY Q10, X14).

Three exemplars, each the idiomatic Arrow-batched form — never
row-at-a-time Python:

- **Scalar pandas UDF** — the reference's record→text serializer
  ``write_jdftx`` (``dags/utils.py:3-48``): formats a structured record
  into a DFT input deck. Shown both as a pure column expression
  (``serialize_run_expr``, zero Python) and as a ``pandas_udf``
  (``serialize_run_udf``) — the expression form is the hot path; the
  UDF form is the template for logic that genuinely needs Python.
- **Grouped-map applyInPandas** — per-group ``np.polyfit`` exactly as
  ``analyze_electrochem`` does (``my_dag.py:171``), the UDAF surface.
  Matches the relational exact-sum regression (registry
  ``echem_flagship``) — the same oracle checks both.
- **mapInPandas** — the streaming-batch iterator form used by the
  multimodal and external-process operators (see multimodal.py /
  pipe.py).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def serialize_run_expr(
    lattice: Column, charge: Column, ion_names: Column
) -> Column:
    """Record → DFT-input text as a pure column expression (Q10).

    Mirrors ``write_jdftx`` (``utils.py:3-48``): lattice block emitted
    TRANSPOSED (``R[j][i]``, see ``utils.py:11``), one ``ion`` line per
    site, then fixed settings + the per-run ``elec-initial-charge``.
    Numbers are formatted with explicit printf-style patterns so any
    engine reproduces the text byte-for-byte.
    """
    lattice_lines = F.concat_ws(
        "\n",
        F.transform(
            F.sequence(F.lit(0), F.lit(2)),
            lambda i: F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(0), F.lit(2)),
                    # transpose: row i prints R[j][i]
                    lambda j: F.format_string(
                        "%.6f",
                        F.element_at(F.element_at(lattice, (j + 1).cast("int")), (i + 1).cast("int")),
                    ),
                ),
            ),
        ),
    )
    ion_lines = F.concat_ws(
        "\n", F.transform(ion_names, lambda n: F.concat(F.lit("ion "), n))
    )
    return F.concat_ws(
        "\n",
        F.lit("lattice \\"),
        lattice_lines,
        ion_lines,
        F.lit("coords-type Cartesian"),
        F.format_string("elec-initial-charge %.2f", charge),
    )


def make_serialize_run_udf():
    """Arrow-batched pandas UDF form of :func:`serialize_run_expr` —
    bit-identical output, Python implementation. Built lazily (a
    pandas_udf declaration needs an active session to parse its return
    type). The template for serializers too complex for expressions."""

    @pandas_udf("string")
    def serialize_run_udf(
        lattice: pd.Series, charge: pd.Series, ion_names: pd.Series
    ) -> pd.Series:
        def one(lat, chg, ions) -> str:
            lat_txt = "\n".join(
                " ".join(f"{lat[j][i]:.6f}" for j in range(3)) for i in range(3)
            )
            ion_txt = "\n".join(f"ion {n}" for n in ions)
            return (
                "lattice \\"
                + "\n"
                + lat_txt
                + "\n"
                + ion_txt
                + "\ncoords-type Cartesian\n"
                + f"elec-initial-charge {chg:.2f}"
            )

        return pd.Series(
            [one(l, c, n) for l, c, n in zip(lattice, charge, ion_names)]
        )

    return serialize_run_udf


def fit_per_group_pandas(metrics: DataFrame) -> DataFrame:
    """Per-group linear fit via applyInPandas (X14): ``np.polyfit(x, y,
    1)`` per key, exactly the reference's fit (``my_dag.py:171``).

    The grouped-map form buffers one group per call — appropriate when
    the per-group logic is genuinely iterative/np-based. For plain
    least squares the relational exact-sum form (echem_flagship) is
    the scale path; this surface exists for custom science.
    Input: (slab_id, x, y). Output: (slab_id, slope, intercept, n_obs).
    """
    import numpy as np

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        slope, intercept = np.polyfit(pdf["x"], pdf["y"], 1)
        return pd.DataFrame(
            {
                "slab_id": [pdf["slab_id"].iloc[0]],
                "slope": [float(slope)],
                "intercept": [float(intercept)],
                "n_obs": [len(pdf)],
            }
        )

    return metrics.groupBy("slab_id").applyInPandas(
        fit, "slab_id bigint, slope double, intercept double, n_obs bigint"
    )


def char_stats_arrow(docs):
    """Arrow-native map (``mapInArrow``) — the fourth and
    lowest-overhead Python batch surface after scalar pandas_udf,
    grouped-map, and grouped-agg: RecordBatches cross the boundary
    with NO pandas materialization, and the kernels
    (``pyarrow.compute``) are vectorized C++ that releases the GIL.
    Right altitude for byte/string/codepoint work where pandas object
    dtype would dominate the cost; the JVM expression form is still
    preferred when one exists (this exemplar's oracle IS that form)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def stats(batches):
        for batch in batches:
            text = batch.column("text")
            yield pa.record_batch(
                {
                    "doc_id": batch.column("doc_id"),
                    "n_chars": pc.utf8_length(text).cast(pa.int64()),
                    "n_e": pc.count_substring(text, "e").cast(pa.int64()),
                }
            )

    return docs.select("doc_id", "text").mapInArrow(
        stats, "doc_id bigint, n_chars bigint, n_e bigint"
    )


def make_prefix_cols_udtf():
    """Polymorphic Python UDTF (the ``analyze()`` surface): output
    schema computed AT PLAN TIME from the input TABLE argument's
    schema — here, the subset of columns matching a name prefix.
    This is the UDTF quadrant's schema-flexibility story: the static
    form (chunking.chunk_documents_udtf) declares its schema up
    front, while this one adapts to whatever relation it is applied
    to, like a macro. analyze() additionally returns a ``select``
    pruning list so the engine reads ONLY the surviving columns into
    the Python worker — without it a polymorphic UDTF would drag the
    whole row across the boundary at 100 TB. Closure-defined for
    by-value pickling, like every Python-executed class here."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StructType
    from pyspark.sql.udtf import AnalyzeResult, SelectedColumn

    class PrefixCols:
        @staticmethod
        def analyze(t, prefix):
            keep = [
                f for f in t.dataType.fields if f.name.startswith(prefix.value)
            ]
            return AnalyzeResult(
                schema=StructType(keep),
                select=[SelectedColumn(f.name) for f in keep],
            )

        def eval(self, row, prefix: str):
            # the select-pruned row contains exactly the kept columns,
            # in analyze()'s order
            yield tuple(row)

    # pickled-row execution, deliberately: the Arrow-optimized UDTF
    # path measured ~6x SLOWER here (24-37 s vs ~4 s isolated on the
    # 150k-row bench query — per-row Row re-materialization from
    # columnar batches dominates when eval() is a passthrough);
    # useArrow pays off for wide fan-out per input row, not 1:1 maps
    return udtf(PrefixCols)


def make_nation_gaps_udtf():
    """Partitioned TABLE-argument UDTF (Spark 4's grouped table
    function): invoked as ``gaps(TABLE(...) PARTITION BY key ORDER BY
    val)``, the engine guarantees one class instance consumes ALL rows
    of a partition IN ORDER — ``eval`` streams rows O(1)-state,
    ``terminate`` emits the per-partition summary. This is the SQL
    face of custom per-group stateful batch logic (the third grouped
    surface next to applyInPandas and the aggregating UDAF): here the
    largest gap between consecutive ordered balances, a
    sort-dependent statistic a plain UDAF cannot see (it gets rows
    unordered) and plain SQL needs a window + re-aggregate for.

    Scale: PARTITION BY plans one hash exchange + in-partition sort —
    the same shape as the window form; state is O(1) per partition.
    Python-side row iteration is the slow lane (documented on the
    sibling UDTFs); the window+agg expression form remains the 100 TB
    fast path and is exactly what the DuckDB oracle replays.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="s_nationkey bigint, n_rows bigint, max_gap_cents bigint")
    class NationGaps:
        def __init__(self):
            self._key = None
            self._prev = None
            self._n = 0
            self._max_gap = 0

        def eval(self, row):
            self._key = row["s_nationkey"]
            c = row["bal_cents"]
            # NULL tolerance mirrors the window twin exactly:
            # c - LAG(c) is NULL when either side is NULL and MAX
            # ignores it, while LAG still takes the previous ROW's
            # value — so a NULL participates as a prev, never as a gap
            if (
                c is not None
                and self._prev is not None
                and c - self._prev > self._max_gap
            ):
                self._max_gap = c - self._prev
            self._prev = c
            self._n += 1

        def terminate(self):
            if self._n:
                yield self._key, self._n, self._max_gap

    return NationGaps
