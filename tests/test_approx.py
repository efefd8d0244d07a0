"""Approximate aggregate forms (X6 scale path): sketches are
engine-specific so they are bounded against the exact forms here
rather than oracle-compared (SURVEY §2.6)."""

from __future__ import annotations

from pyspark.sql import functions as F

from echem_dft_etl_spark.sources import load_table
from tests.conftest import SF_SMOKE


def test_approx_count_distinct_within_rsd(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    row = li.agg(
        F.approx_count_distinct("l_suppkey", rsd=0.02).alias("approx"),
        F.count_distinct("l_suppkey").alias("exact"),
    ).first()
    assert abs(row.approx - row.exact) <= max(3, 0.1 * row.exact), row


def test_percentile_approx_brackets_exact(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    row = li.agg(
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("approx"),
        F.percentile("l_extendedprice", F.lit(0.5)).alias("exact"),
    ).first()
    lo, hi = (
        li.agg(
            F.percentile("l_extendedprice", F.lit(0.45)),
            F.percentile("l_extendedprice", F.lit(0.55)),
        ).first()
    )
    assert lo <= row.approx <= hi, row


def test_rolling_distinct_hll_tracks_exact(spark):
    """The mergeable-sketch rolling distinct (daily HLL -> window
    union) must track the exact constant-fan-out form within HLL
    error (lgk=12 => ~1.6% stderr; assert 5%), day by day."""
    from pyspark.sql import functions as F

    from echem_dft_etl_spark.operators.scale import rolling_distinct_hll
    from echem_dft_etl_spark.registry import all_queries
    from tests.conftest import SF_SMOKE
    from echem_dft_etl_spark.sources import load_table

    ev = load_table(spark, SF_SMOKE, "events")
    approx = {
        r.day: r.approx_distinct
        for r in rolling_distinct_hll(
            ev,
            "user_id",
            F.date_trunc("day", F.col("ts")).cast("date"),
            window_days=7,
        ).collect()
    }
    exact = {
        r.day: r.wau
        for r in all_queries()["x04_rolling_wau"].fn(spark, SF_SMOKE).collect()
    }
    assert set(approx) == set(exact)
    for day, n in exact.items():
        assert abs(approx[day] - n) <= max(2, 0.05 * n), (day, approx[day], n)


def test_count_min_sketch_bounds_heavy_hitters(spark):
    """The mergeable Count-Min twin of t13_heavy_hitters: a CMS built
    over the token stream must satisfy the classic guarantee
    ``exact <= estimate <= exact + eps*total`` for every exact heavy
    hitter. The sketch is Spark's own mergeable CountMinSketch (the
    state-bounded path when even the distinct-token aggregate is too
    wide — streams, per-window vocab); probing goes through the JVM
    deserializer, so this pins the real sketch bytes, not a Python
    re-implementation."""
    from echem_dft_etl_spark.functions.text import tokens
    from echem_dft_etl_spark.operators.textstats import heavy_hitters
    from echem_dft_etl_spark.sources import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    toks = docs.select(F.explode(tokens(F.col("text"))).alias("token"))
    eps, conf = 0.001, 0.99
    row = toks.agg(
        F.count_min_sketch(
            "token", F.lit(eps), F.lit(conf), F.lit(42)
        ).alias("sk"),
        F.count("*").alias("total"),
    ).first()
    jvm = spark._jvm
    sk = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        jvm.java.io.ByteArrayInputStream(bytes(row.sk))
    )
    exact = {r.token: r.n for r in heavy_hitters(docs, 500).collect()}
    assert exact, "fixture corpus must have >=1 token at 500 ppm"
    for token, n in exact.items():
        est = sk.estimateCount(token)
        assert n <= est <= n + eps * row.total, (token, n, est)


def test_pq_topk_matches_numpy_replay(spark):
    """pq_topk's codes and ADC ranking replayed exactly in numpy on a
    tiny synthetic corpus (dim 8, 2 subspaces, 4 codewords): integer
    micro-unit arithmetic means the Spark result must match the replay
    bit-for-bit, including argmin and rank tie-breaks."""
    import numpy as np

    from echem_dft_etl_spark.operators.similarity import pq_topk

    rng = np.random.RandomState(7)
    vecs = np.round(rng.uniform(-1, 1, size=(20, 8)), 3)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(20)],
        "vec_id long, embedding array<float>",
    )
    got = {
        (r.query_id, r.rk): (r.vec_id, r.adist_micro2)
        for r in pq_topk(
            emb, [0, 1], k=3, n_sub=2, n_codes=4, dims=8
        ).collect()
    }

    # numpy replay in the same integer micro units
    m = np.round(vecs.astype(np.float32).astype(np.float64) * 1_000_000).astype(np.int64)
    cb = m[:4]
    sub = 4

    def codes(v):
        out = []
        for j in range(2):
            d = [
                int(((v[j * sub:(j + 1) * sub] - c[j * sub:(j + 1) * sub]) ** 2).sum())
                for c in cb
            ]
            out.append(min(range(4), key=lambda i: (d[i], i)))
        return out

    def adist(q, x):
        cx = codes(m[x])
        tot = 0
        for j in range(2):
            c = cb[cx[j]]
            tot += int(((q[j * sub:(j + 1) * sub] - c[j * sub:(j + 1) * sub]) ** 2).sum())
        return tot

    want = {}
    for qid in (0, 1):
        scored = sorted(
            ((adist(m[qid], x), x) for x in range(20) if x != qid)
        )
        for rk, (d, x) in enumerate(scored[:3], start=1):
            want[(qid, rk)] = (x, d)
    assert got == want

def test_ivfpq_prebuilt_index_matches_inline(spark):
    """ivfpq_topk(index=ivfpq_build_index(...)) returns the identical
    result set as the self-contained call — the build/serve split
    (scripts/scale_probe.py's serve-path probe, and the real 100 TB
    deployment shape) must not change a single row or rank."""
    import numpy as np

    from echem_dft_etl_spark.operators.similarity import (
        ivfpq_build_index,
        ivfpq_topk,
    )

    rng = np.random.RandomState(11)
    vecs = np.round(rng.uniform(-1, 1, size=(40, 8)), 3)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    kw = dict(n_cells=4, n_probe=2, n_sub=2, n_codes=4, dims=8)
    inline = ivfpq_topk(emb, [0, 1, 2], k=3, **kw).collect()
    idx = ivfpq_build_index(
        emb, n_cells=4, n_sub=2, n_codes=4, dims=8
    )
    idx = {k: v.localCheckpoint(eager=True) for k, v in idx.items()}
    split = ivfpq_topk(emb, [0, 1, 2], k=3, index=idx, **kw).collect()
    key = lambda r: (r.query_id, r.rk)
    assert sorted(inline, key=key) == sorted(split, key=key)
    assert len(inline) == 9


def test_countmin_never_undercounts(spark):
    """The count-min guarantee: est >= exact for EVERY probed key
    (min over rows of non-negative bucket sums can only overcount),
    and keys absent from the data still satisfy it with exact 0."""
    from echem_dft_etl_spark.registry import all_queries

    rows = all_queries()["x06_countmin_est"].fn(spark, SF_SMOKE).collect()
    assert len(rows) == 40
    for r in rows:
        assert r.overcount >= 0, r
        assert r.est_count == r.exact_count + r.overcount
