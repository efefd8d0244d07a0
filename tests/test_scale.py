"""Scale patterns (operators/scale.py): salting preserves join
semantics while spreading hot keys; bucketed tables join and aggregate
with zero exchanges."""

from __future__ import annotations

from pyspark.sql import functions as F

from echem_dft_etl_spark import plans
from echem_dft_etl_spark.operators.scale import (
    bucketed_join,
    salted_join,
    write_bucketed,
)
from echem_dft_etl_spark.sources import load_table
from tests.conftest import SF_SMOKE


def test_salted_join_equals_plain_join(spark):
    li = load_table(spark, SF_SMOKE, "lineitem").select(
        F.col("l_orderkey").alias("okey"), "l_extendedprice"
    )
    orders = load_table(spark, SF_SMOKE, "orders").select(
        F.col("o_orderkey").alias("okey"), "o_orderpriority"
    )
    salted = salted_join(li, orders, "okey", n_salts=4)
    plain = li.join(orders, "okey")
    assert salted.count() == plain.count()
    a = salted.groupBy("o_orderpriority").count().collect()
    b = plain.groupBy("o_orderpriority").count().collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_salted_join_spreads_hot_key(spark):
    """All rows of one hot key must not share a single salt value."""
    hot = spark.range(0, 10_000).select(
        F.lit(42).alias("k"), F.col("id").alias("payload")
    ).repartition(8)
    dim = spark.createDataFrame([(42, "x")], "k bigint, v string")
    joined = salted_join(hot, dim, "k", n_salts=8)
    assert joined.count() == 10_000
    # inspect the salt distribution the operator would use
    from echem_dft_etl_spark.functions.hashing import det_hash_i64

    salts = (
        hot.withColumn(
            "_salt",
            F.pmod(
                det_hash_i64(F.spark_partition_id() * 31 + F.col("k")),
                F.lit(8),
            ),
        )
        .select("_salt")
        .distinct()
        .count()
    )
    assert salts > 1


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    orders = load_table(spark, SF_SMOKE, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    write_bucketed(li, "li_b", "l_orderkey", 8, path=str(tmp_path / "li_b"))
    write_bucketed(orders, "ord_b", "l_orderkey", 8, path=str(tmp_path / "ord_b"))
    # a dim this small would be broadcast, bypassing the bucketed scans;
    # disable auto-broadcast to exercise the co-located join path the
    # pattern exists for (at scale neither side is broadcastable)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "li_b", "ord_b", "l_orderkey")
        assert plans.exchange_count(joined) == 0, plans.physical_plan(joined)
        assert "Bucketed: true" in plans.physical_plan(joined)
        assert joined.count() == li.join(orders, "l_orderkey").count()
        # aggregation on the bucket key also avoids the shuffle
        agg = spark.table("li_b").groupBy("l_orderkey").agg(
            F.sum("l_extendedprice").alias("s")
        )
        assert plans.exchange_count(agg) == 0, plans.physical_plan(agg)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS ord_b")


def test_aqe_splits_skewed_join_partitions(spark, tmp_path):
    """AQE skew handling, demonstrated: one hot key dominating the fact
    side must be split at runtime (OptimizeSkewedJoin) once the skew
    thresholds are in range for the test data volume."""
    from pyspark.sql import functions as F

    fact = spark.range(0, 200_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 100)
        .cast("bigint").alias("k"),
        F.col("id").alias("payload"),
    )
    dim = spark.range(0, 100).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("v")
    )
    fact.write.mode("overwrite").parquet(str(tmp_path / "fact"))
    dim.write.mode("overwrite").parquet(str(tmp_path / "dim"))

    conf = spark.conf
    keys = (
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.coalescePartitions.enabled",
        "spark.sql.autoBroadcastJoinThreshold",
    )
    saved = {k: conf.get(k) for k in keys}
    try:
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
        conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
        # assert on the bare join: an aggregation directly downstream
        # requires hash distribution on k, which legitimately blocks
        # the skew split (duplicated partitions would break the agg)
        joined = spark.read.parquet(str(tmp_path / "fact")).join(
            spark.read.parquet(str(tmp_path / "dim")), "k"
        )
        # collect() executes THIS DataFrame's QueryExecution, so the
        # inspected plan below is the finalized adaptive plan (count()
        # would wrap a fresh, never-executed plan)
        rows = joined.collect()
        assert len(rows) == 200_000
        final_plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in final_plan
        assert "skew=true" in final_plan, final_plan
    finally:
        for k, v in saved.items():
            conf.set(k, v)


def test_ngram_df_cap_bounds_fanout(spark):
    """The df-cut must bound per-shingle posting lists (join fan-out is
    at most max_df²/2 per shingle) and, at the default cap, change
    nothing at test scale (max observed df is far below it)."""
    from pyspark.sql.window import Window

    from echem_dft_etl_spark.operators.dedup import (
        doc_shingles,
        ngram_jaccard_pairs,
    )

    docs = load_table(spark, SF_SMOKE, "documents")

    # a tiny cap provably bounds surviving posting lists
    cap = 4
    shingled = doc_shingles(docs, 3)
    pruned = (
        shingled.withColumn(
            "_df", F.count("*").over(Window.partitionBy("shingle"))
        )
        .filter(F.col("_df") <= cap)
    )
    max_df = pruned.groupBy("shingle").count().agg(F.max("count")).collect()[0][0]
    assert max_df <= cap

    # the default cap exceeds every df at this scale: capped == uncapped
    capped = ngram_jaccard_pairs(docs, threshold=0.5)
    uncapped = ngram_jaccard_pairs(docs, threshold=0.5, max_df=None)
    assert sorted(map(tuple, capped.collect())) == sorted(
        map(tuple, uncapped.collect())
    )


def test_binned_range_join_equals_theta_join(spark):
    """The binned equi-join must equal the BETWEEN theta-join
    row-for-row (each qualifying pair meets in exactly one bin), and
    must plan WITHOUT a nested loop — the property that makes it the
    large×large range-join path."""
    from echem_dft_etl_spark.operators.scale import binned_range_join

    p = load_table(spark, SF_SMOKE, "part").select("p_partkey", "p_size")
    bands = spark.createDataFrame(
        [(1, 10, "small"), (11, 25, "medium"), (26, 40, "large"), (41, 50, "xl"),
         (5, 45, "overlapping")],  # overlapping interval: pairs still unique
        "lo int, hi int, band string",
    )
    binned = binned_range_join(p, bands, "p_size", "lo", "hi", bin_width=7)
    theta = p.join(
        bands, (p.p_size >= bands.lo) & (p.p_size <= bands.hi)
    ).select("p_partkey", "p_size", "lo", "hi", "band")

    got = sorted(map(tuple, binned.select("p_partkey", "p_size", "lo", "hi", "band").collect()))
    want = sorted(map(tuple, theta.collect()))
    assert got == want and len(got) > 0

    plan = plans.physical_plan(binned)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_percentile_guard_switches_paths_and_stays_close(spark):
    """X6 scale guard: the helper picks exact `percentile` under the
    group-size bound and the bounded-state GK sketch above it; the two
    paths agree within the sketch's rank-error tolerance, and the exact
    path is bit-equal to the plain percentile aggregate."""
    from echem_dft_etl_spark.operators.scale import grouped_percentiles_with_guard

    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100, 0)
        .cast("bigint")
        .alias("cents"),
    )
    qs = [0.25, 0.5, 0.75]

    exact = grouped_percentiles_with_guard(
        li, ["l_returnflag"], "cents", qs, exact_max_group_rows=10**9
    )
    approx = grouped_percentiles_with_guard(
        li, ["l_returnflag"], "cents", qs, exact_max_group_rows=1
    )
    # the guard really switched: sketch path has no exact Percentile agg
    assert "percentile_approx" in approx._jdf.queryExecution().analyzed().toString()
    assert "percentile_approx" not in exact._jdf.queryExecution().analyzed().toString()

    ref = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.percentile("cents", F.array(*[F.lit(q) for q in qs])).alias("p")
        )
        .collect()
    }
    ex = {r["l_returnflag"]: r for r in exact.collect()}
    ap = {r["l_returnflag"]: r for r in approx.collect()}
    assert set(ex) == set(ref) == set(ap)
    for flag, r in ref.items():
        for i, col in enumerate(("p_25", "p_50", "p_75")):
            assert ex[flag][col] == float(r["p"][i])  # exact path: bit-equal
            # GK guarantees rank error <= 1/accuracy; on cents data that
            # lands within a tight relative band of the exact value
            assert abs(ap[flag][col] - float(r["p"][i])) <= 0.01 * abs(
                float(r["p"][i])
            )


def test_connected_components_hub_vertex_converges_fast(spark):
    """Straggler hardening for the iterative CC (VERDICT r2 #6): a
    star graph — one hub vertex on every edge, the worst single-key
    skew a dedup pair graph can produce — must still converge in the
    pointer-jumping round bound (2 rounds + the fixpoint-confirming
    round), with every vertex labeled by the hub."""
    from echem_dft_etl_spark.operators.components import connected_components

    n = 20_000
    vertices = spark.range(0, n + 1).select(F.col("id").alias("doc_id"))
    edges = spark.range(1, n + 1).select(
        F.lit(0).cast("bigint").alias("a"), F.col("id").alias("b")
    )
    stats: list = []
    labels = connected_components(vertices, edges, round_stats=stats)
    got = labels.groupBy("cluster_id").count().collect()
    assert len(got) == 1 and got[0]["cluster_id"] == 0 and got[0]["count"] == n + 1
    assert len(stats) <= 3, stats
    assert stats[-1]["changed"] == 0 and stats[-1]["n_labels"] == 1, stats


def test_cc_round_join_skew_splits_under_aqe(spark):
    """The CC per-round join shape (symmetrized edges joined to labels
    on the vertex id) with a hub vertex: AQE's OptimizeSkewedJoin must
    split the hot partition at runtime — the claim in
    operators/components.py's scale notes, demonstrated."""
    n = 200_000
    sym = (
        spark.range(1, n + 1)
        .select(F.lit(0).cast("bigint").alias("src"), F.col("id").alias("dst"))
        .union(
            spark.range(1, n + 1).select(
                F.col("id").alias("src"), F.lit(0).cast("bigint").alias("dst")
            )
        )
    )
    labels = spark.range(0, n + 1).select(
        F.col("id").alias("v"), F.col("id").alias("lbl")
    )
    conf = spark.conf
    keys = (
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.coalescePartitions.enabled",
        "spark.sql.autoBroadcastJoinThreshold",
    )
    saved = {k: conf.get(k) for k in keys}
    try:
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256KB"
        )
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "256KB")
        conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
        # the min-label round: join keyed on src, agg re-keyed on dst —
        # the downstream agg needs its own exchange anyway, so AQE is
        # free to split the hot src partition
        nb_min = (
            sym.join(labels, sym["src"] == labels["v"])
            .groupBy("dst")
            .agg(F.min("lbl").alias("nb_lbl"))
        )
        rows = nb_min.collect()
        assert len(rows) == n + 1
        final_plan = nb_min._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in final_plan
        assert "skew=true" in final_plan, final_plan
    finally:
        for k, v in saved.items():
            conf.set(k, v)


def test_dynamic_partition_pruning_on_partitioned_sink(spark, tmp_path):
    """S1 sink output is query-able with dynamic partition pruning: a
    fact table written partitionBy(key) joined to a selectively
    filtered dim must plan a dynamicpruning subquery on the fact scan,
    so only the matching partition directories are read — the
    partition-layout half of the 100 TB sink story (SCALE.md scans)."""
    from echem_dft_etl_spark.sources.sinks import write_partitioned

    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_extendedprice"
    )
    write_partitioned(li, str(tmp_path / "fact"), ["l_returnflag"])
    dim = spark.createDataFrame(
        [("R", "returned"), ("A", "accepted"), ("N", "none")],
        "flag string, label string",
    ).filter(F.col("label") == "returned")

    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # DPP's broadcast-reuse path is the interesting one; make sure
        # the dim is broadcast-eligible
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10MB")
        fact = spark.read.parquet(str(tmp_path / "fact"))
        j = fact.join(dim, fact["l_returnflag"] == dim["flag"]).select(
            "l_orderkey", "l_extendedprice", "label"
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        optimized = j._jdf.queryExecution().optimizedPlan().toString()
        assert "dynamicpruning" in (plan + optimized).lower(), plan
        rows = j.count()
        expected = li.filter(F.col("l_returnflag") == "R").count()
        assert rows == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)


def test_bloom_filter_and_zstd_layout(spark, tmp_path):
    """Point-lookup layout knobs the engine exposes for high-cardinality
    keys: parquet bloom filters (row-group skip for equality predicates
    on keys min/max stats can't prune — uniformly distributed ids span
    every row group's min/max) and zstd compression. Verified at the
    FOOTER level through the JVM parquet reader (pyarrow 16 does not
    surface bloom offsets): every row group's key column must carry a
    bloom filter offset and the declared codec."""
    from pathlib import Path

    from echem_dft_etl_spark.sources import load_table
    from tests.conftest import SF_SMOKE

    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    out = tmp_path / "bloom"
    (
        li.coalesce(1)
        .write.mode("overwrite")
        .option("parquet.bloom.filter.enabled#l_orderkey", "true")
        .option("parquet.bloom.filter.expected.ndv#l_orderkey", "100000")
        # dictionary off for the key: parquet-mr drops the bloom filter
        # for fully dictionary-encoded columns (the dictionary already
        # answers membership exactly) — and a true high-cardinality key
        # shouldn't be dictionary-encoded anyway
        .option("parquet.enable.dictionary#l_orderkey", "false")
        .option("compression", "zstd")
        .parquet(str(out))
    )
    files = list(Path(out).glob("*.parquet"))
    assert files
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    inp = jvm.org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        jvm.org.apache.hadoop.fs.Path(str(files[0])), conf
    )
    reader = jvm.org.apache.parquet.hadoop.ParquetFileReader.open(inp)
    try:
        blocks = reader.getFooter().getBlocks()
        assert blocks.size() >= 1
        for b in range(blocks.size()):
            col = blocks.get(b).getColumns().get(0)
            assert col.getPath().toDotString() == "l_orderkey"
            assert col.getCodec().toString() == "ZSTD"
            assert col.getBloomFilterOffset() > 0
    finally:
        reader.close()


def test_missing_ranges_empty_partitions(spark):
    """The seam handoff must survive EMPTY range partitions: 64
    requested partitions over 8 keys guarantees most are empty, and a
    gap spanning an empty partition's key range must still surface.
    Naive pid+1 seam arithmetic returns NULL successors here and
    silently drops gaps."""
    from echem_dft_etl_spark.operators.scale import missing_key_ranges

    keys = [1, 2, 3, 10, 11, 50, 51, 100]
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = {
        (r.gap_start, r.gap_end, r.n_missing)
        for r in missing_key_ranges(df, "k", num_partitions=64).collect()
    }
    assert got == {(4, 9, 6), (12, 49, 38), (52, 99, 48)}, got


def test_semdedup_cell_population_bounded(spark):
    """The SemDeDup in-cell quadratic is safe ONLY while cell
    populations stay bounded — k is the declared scale knob (k grows
    with the corpus so cells stay comparison-sized; SCALE.md). This
    guard pins the contract at the registered geometry: with the
    registry's k over the correctness-scale corpus, the LARGEST cell
    must hold within a small constant of the ideal n/k split, so the
    worst cell's pair count (max_cell²/2) stays within that constant²
    of the design target rather than drifting quadratically toward
    all-pairs. If a testdata regeneration or a k change breaks this,
    the fix is raising k (the production response), not loosening the
    bound."""
    from echem_dft_etl_spark.operators.kmeans import assignments
    from echem_dft_etl_spark.registry_llm import _KM_K
    from tests.conftest import SF_CORRECT

    emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
    n = emb.count()
    cells = assignments(emb, _KM_K, rounds=1).groupBy("cell").count()
    max_cell = cells.agg(F.max("count")).first()[0]
    n_cells = cells.count()
    assert n_cells == _KM_K, f"empty cells collapse the split: {n_cells}"
    # 4x the ideal split: loose enough for real cluster imbalance,
    # tight enough that the in-cell grid stays ~(4n/k)^2/2 not n^2/2.
    assert max_cell <= 4 * n / _KM_K, (max_cell, n, _KM_K)


def test_bloom_prefilter_superset_and_exact_composition(spark):
    """bloom_prefilter must (a) never drop a matching row — the exact
    semi-join's rows survive pruning multiset-for-multiset, (b) prune
    a meaningful share of non-matching rows at the defaults, and
    (c) compose with the exact join back to the plain semi-join."""
    from echem_dft_etl_spark.operators.scale import bloom_prefilter

    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    keys = (
        load_table(spark, SF_SMOKE, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    pruned = bloom_prefilter(li, "l_orderkey", keys, "o_orderkey")
    exact = li.join(keys, li.l_orderkey == keys.o_orderkey, "leftsemi")
    n_all = li.count()
    n_pruned = pruned.count()
    n_exact = exact.count()
    assert n_exact <= n_pruned, "bloom dropped matching rows"
    assert n_pruned < n_all, (
        f"bloom pruned nothing ({n_pruned}/{n_all}) for a ~20% build side"
    )
    missing = exact.select("l_orderkey").exceptAll(
        pruned.select("l_orderkey")
    )
    assert missing.count() == 0, "false negative: exact row lost"
    comp = pruned.join(
        keys, pruned.l_orderkey == keys.o_orderkey, "leftsemi"
    )
    assert comp.count() == n_exact


def test_bloom_prefilter_bitmap_broadcasts_one_row(spark):
    """The bitmap side must reach the probe as a broadcast (one-row
    map), never a shuffle join — the property that makes the prune
    free at 100 TB."""
    from echem_dft_etl_spark.operators.scale import bloom_prefilter

    li = load_table(spark, SF_SMOKE, "lineitem").select("l_orderkey")
    keys = (
        load_table(spark, SF_SMOKE, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .select("o_orderkey")
    )
    pruned = bloom_prefilter(li, "l_orderkey", keys, "o_orderkey")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    # exactly ONE hash exchange is allowed: the build-side bit_or
    # aggregate over the ≤ n_bits/64-row word frame (metadata-sized).
    # The PROBE side must reach the membership filter shuffle-free.
    assert plan.count("Exchange hashpartitioning") <= 1, plan


def test_grid_near_join_exact_pairs_and_boundaries(spark):
    """grid_near_join must be EXACT: inclusive at dist == r, correct
    across cell boundaries and for negative coordinates (floor-div
    cells), one row per unordered pair, no duplicates from the 3x3
    probe stencil."""
    import pytest

    from echem_dft_etl_spark.operators.spatial import grid_near_join

    pts = spark.createDataFrame(
        [
            (1, 0, 0),
            (2, 10, 0),        # dist 10 from p1 — in (r=10, inclusive)
            (3, 11, 0),        # dist 11 from p1 — out; dist 1 from p2 — in
            (4, -3, -4),       # dist 5 from p1 — in, negative coords
            (5, 100, 100),     # isolated
            (6, 19, 0),        # dist 9 from p2's cell-neighbor probe — in
        ],
        "pid long, x long, y long",
    )
    got = {
        (r.id_a, r.id_b): r.dist_sq
        for r in grid_near_join(pts, "pid", "x", "y", radius=10).collect()
    }
    assert got == {
        (1, 2): 100,   # exactly r² — inclusive bound
        (2, 3): 1,
        (1, 4): 25,
        (3, 6): 64,
        (2, 6): 81,
    }

    with pytest.raises(ValueError):
        grid_near_join(pts, "pid", "x", "y", radius=10, cell=5)


def test_spatial_near_join_plan_is_equi_join(spark):
    """The θ-join must lower to a shuffled/broadcast EQUI-join on the
    cell key — never a nested loop or cartesian — with the distance
    check as a post-join filter."""
    from echem_dft_etl_spark import plans
    from echem_dft_etl_spark.registry import all_queries
    from tests.conftest import SF_SMOKE

    df = all_queries()["x05_spatial_near_join"].fn(spark, SF_SMOKE)
    plan = plans.physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_grid_contact_join_time_axis_blocks_and_bounds(spark):
    """The spatio-temporal variant must be inclusive at dt == t_radius,
    exclude pairs that are near in space but far in time (and vice
    versa), and find pairs straddling a time-bucket boundary via the
    third stencil axis."""
    from echem_dft_etl_spark.operators.spatial import grid_contact_join

    pts = spark.createDataFrame(
        [
            # (pid, x, y, t)
            (1, 0, 0, 1000),
            (2, 6, 8, 1010),    # dist 10, dt 10 — in
            (3, 0, 0, 1100),    # dt 100 == t_radius — inclusive bound
            (4, 0, 0, 1101),    # dt 101 — out (time)
            (5, 11, 0, 1000),   # dist 11 — out (space), dt 0
            (6, 0, 5, 1199),    # vs p3: dist 5, dt 99 — in, crosses the
                                # t//100 bucket boundary (11 vs 10)
        ],
        "pid long, x long, y long, t long",
    )
    got = {
        (r.id_a, r.id_b): (r.dist_sq, r.dt)
        for r in grid_contact_join(
            pts, "pid", "x", "y", "t", radius=10, t_radius=100
        ).collect()
    }
    assert got == {
        (1, 2): (100, 10),
        (1, 3): (0, 100),    # exactly t_radius — inclusive
        (2, 3): (100, 90),   # exactly radius² — inclusive
        (2, 4): (100, 91),
        (2, 5): (89, 10),
        (3, 4): (0, 1),
        (3, 6): (25, 99),    # crosses the t//100 bucket boundary
        (4, 6): (25, 98),
    }


def test_grid_contact_join_rejects_undersized_cell(spark):
    """cell < radius would need a wider-than-3x3 stencil — the guard
    must refuse rather than silently lose pairs."""
    import pytest

    from echem_dft_etl_spark.operators.spatial import grid_contact_join

    pts = spark.createDataFrame(
        [(1, 0, 0, 0)], "pid long, x long, y long, t long"
    )
    with pytest.raises(ValueError):
        grid_contact_join(
            pts, "pid", "x", "y", "t", radius=10, t_radius=100, cell=5
        )


def test_interval_overlap_join_equals_theta_join(spark):
    """interval_overlap_join must equal the naive theta join
    row-for-row on a synthetic keyed corpus that exercises every edge:
    touching endpoints (inclusive), containment, multi-bin spans (the
    first-shared-bin rule must emit exactly once), zero-width
    intervals, and cross-key isolation."""
    import random

    from echem_dft_etl_spark.operators.scale import interval_overlap_join

    rng = random.Random(13)
    rows = []
    for i in range(300):
        key = rng.randrange(4)
        lo = rng.randrange(0, 400)
        hi = lo + rng.choice([0, 1, 3, 17, 64, 150])
        rows.append((key, i, lo, hi))
    base = spark.createDataFrame(
        rows, "k int, iid bigint, lo bigint, hi bigint"
    )
    a = base.select(
        "k", F.col("iid").alias("ia"), F.col("lo").alias("a_lo"),
        F.col("hi").alias("a_hi"),
    )
    b = base.select(
        "k", F.col("iid").alias("ib"), F.col("lo").alias("b_lo"),
        F.col("hi").alias("b_hi"),
    )
    got = (
        interval_overlap_join(
            a, b, ["k"], "a_lo", "a_hi", "b_lo", "b_hi", bin_width=10
        )
        .filter(F.col("ia") < F.col("ib"))
        .select("k", "ia", "ib")
        .collect()
    )
    want = (
        a.join(b, "k")
        .filter(
            (F.col("ia") < F.col("ib"))
            & (F.col("a_lo") <= F.col("b_hi"))
            & (F.col("b_lo") <= F.col("a_hi"))
        )
        .select("k", "ia", "ib")
        .collect()
    )
    got_keys = [(r.k, r.ia, r.ib) for r in got]
    assert len(got_keys) == len(set(got_keys)), "pair emitted twice"
    assert sorted(got_keys) == sorted((r.k, r.ia, r.ib) for r in want)
    assert len(want) > 100, "fixture too sparse to prove anything"


def test_binned_joins_reject_zero_bin_width(spark):
    """bin_width 0 floor-divides to NULL bin keys and a silently EMPTY
    join — both binned join owners must fail loudly instead (the
    grid_near_join cell-guard convention)."""
    import pytest

    from echem_dft_etl_spark.operators.scale import (
        binned_range_join,
        interval_overlap_join,
    )

    pts = spark.createDataFrame([(1, 5)], "id bigint, v bigint")
    itv = spark.createDataFrame([(2, 1, 9)], "id2 bigint, lo bigint, hi bigint")
    with pytest.raises(ValueError, match="bin_width"):
        binned_range_join(pts, itv, "v", "lo", "hi", bin_width=0)
    a = spark.createDataFrame([(1, 0, 5)], "ia bigint, a_lo bigint, a_hi bigint")
    b = spark.createDataFrame([(2, 3, 9)], "ib bigint, b_lo bigint, b_hi bigint")
    with pytest.raises(ValueError, match="bin_width"):
        interval_overlap_join(a, b, [], "a_lo", "a_hi", "b_lo", "b_hi", 0)


def test_interval_overlap_handles_negative_coordinates(spark):
    """Negative interval bounds (epoch offsets before a reference
    point, signed coordinates): floor division bins negatives
    correctly, and the first-shared-bin rule still emits exactly
    once."""
    from pyspark.sql import functions as F

    from echem_dft_etl_spark.operators.scale import interval_overlap_join

    rows = [(1, -25, -3), (2, -10, 4), (3, 2, 30), (4, -100, -50)]
    base = spark.createDataFrame(rows, "iid bigint, lo bigint, hi bigint")
    a = base.select(
        F.col("iid").alias("ia"), F.col("lo").alias("a_lo"),
        F.col("hi").alias("a_hi"),
    )
    b = base.select(
        F.col("iid").alias("ib"), F.col("lo").alias("b_lo"),
        F.col("hi").alias("b_hi"),
    )
    got = sorted(
        (r.ia, r.ib)
        for r in interval_overlap_join(
            a, b, [], "a_lo", "a_hi", "b_lo", "b_hi", bin_width=10
        )
        .filter(F.col("ia") < F.col("ib"))
        .collect()
    )
    # overlaps: 1-2 ([-25,-3] x [-10,4]), 2-3 ([-10,4] x [2,30]); 4 isolated
    assert got == [(1, 2), (2, 3)]


def test_binned_joins_raise_on_inverted_interval(spark):
    """lo > hi would make F.sequence emit a silent DESCENDING bin list
    — garbage join candidates. Both binned joins must surface it as a
    runtime error (per-row check folded into the bin expression)."""
    import pytest
    from py4j.protocol import Py4JJavaError

    from echem_dft_etl_spark.operators.scale import (
        binned_range_join,
        interval_overlap_join,
    )

    pts = spark.createDataFrame([(1, 5)], "id bigint, v bigint")
    bad_itv = spark.createDataFrame(
        [(2, 9, 1)], "id2 bigint, lo bigint, hi bigint"
    )
    with pytest.raises((Py4JJavaError, Exception), match="inverted or NULL-bounded"):
        binned_range_join(pts, bad_itv, "v", "lo", "hi", bin_width=4).collect()

    a = spark.createDataFrame([(1, 8, 2)], "ia bigint, a_lo bigint, a_hi bigint")
    b = spark.createDataFrame([(2, 0, 9)], "ib bigint, b_lo bigint, b_hi bigint")
    with pytest.raises((Py4JJavaError, Exception), match="inverted or NULL-bounded"):
        interval_overlap_join(
            a, b, [], "a_lo", "a_hi", "b_lo", "b_hi", 4
        ).collect()

    # NULL bounds are NOT an error: they match nothing under the
    # theta-join semantics this operator replaces (r10 ADVICE made
    # the drop explicit rather than inference-dependent). A valid
    # interval alongside still matches.
    null_itv = spark.createDataFrame(
        [(3, None, 7), (4, 1, 9)], "id2 bigint, lo bigint, hi bigint"
    )
    got = binned_range_join(
        pts, null_itv, "v", "lo", "hi", bin_width=4
    ).collect()
    assert [r["id2"] for r in got] == [4]


def test_binned_joins_preserve_user_bin_column(spark):
    """A pre-existing `_bin` column on either input must pass through
    untouched — the join key is a generated collision-safe name."""
    from echem_dft_etl_spark.operators.scale import (
        binned_range_join,
        interval_overlap_join,
    )

    pts = spark.createDataFrame(
        [(1, 5, "keepme")], "id bigint, v bigint, _bin string"
    )
    itv = spark.createDataFrame(
        [(2, 1, 9, "mine")], "id2 bigint, lo bigint, hi bigint, _bin string"
    )
    out = binned_range_join(pts, itv, "v", "lo", "hi", bin_width=4)
    # both user _bin columns survive (Spark disambiguates on select)
    assert sum(c == "_bin" for c in out.columns) == 2
    row = out.collect()
    assert len(row) == 1

    a = spark.createDataFrame(
        [(1, 0, 5, 77)], "ia bigint, a_lo bigint, a_hi bigint, _bin bigint"
    )
    b = spark.createDataFrame(
        [(2, 3, 9)], "ib bigint, b_lo bigint, b_hi bigint"
    )
    out2 = interval_overlap_join(a, b, [], "a_lo", "a_hi", "b_lo", "b_hi", 4)
    assert "_bin" in out2.columns
    rows = out2.collect()
    assert len(rows) == 1 and rows[0]["_bin"] == 77
