#!/usr/bin/env python
"""Scale probe for the quadratic-prone operators: time the near-pair
queries on a corpus scaled K-fold beyond sf0.1 (derived in /tmp by
unioning the base tables with shifted ids — no test data is modified).

Usage: python scripts/scale_probe.py [K]   (default K=4)

This is evidence, not a gate: it answers "does the operator's cost
track its candidate volume, and does it finish with bounded memory, at
a scale the bench never reaches" — the question PLANS.md's static
shapes can't. Run it after touching dedup/similarity join shapes.

Measured (K=4: 20k docs / 8k vectors, local[32], 24g heap; r3 re-run):
  d13_simhash_pairs     36.1M pairs    18.4s  (was 152.1s before the
                        first-agreeing-band filter replaced the
                        distinct over the candidate stream — at this
                        duplicate density the distinct re-shuffled
                        36M+ pair rows; output itself is quadratic in
                        the copy count — cost tracks output, no OOM)
  s12_cosine_near_pairs 32.0M-pair grid 4.0s (kernel cost tracks the
                        pair grid; 12.5M in ~1.2s at sf0.1)
  s12_near_pairs_pruned 12k true dups  2.2s  (banded candidates +
                        Arrow verify beating the 4.0s exact grid; the
                        K-fold union plants 6 copies per original
                        vector at cos 1.0 — identical signatures
                        collide in every band, all 12000 found. 32
                        bands x 16 GAUSSIAN bits: the sequential
                        multiplicative-hash plane family collapsed
                        sig entropy ~300x — 3.2M joined rows instead
                        of ~400k — and took 13.6s; spherically
                        symmetric planes restore the 1-theta/pi bit
                        agreement the banding math assumes)
                        r4 re-run: 3.5s with the NARROW banded join
                        (ids only, distinct over the candidate
                        stream) on a host running the other probes
                        ~1.5-2x faster than r3 — the planted
                        all-cos-1.0 density is the distinct's worst
                        case (every dup pair arrives x64 bands ≈
                        0.8M 16-byte rows, still ~12MB); the narrow
                        shape wins everywhere duplicate mass is a
                        minority because it strips ~512B of sig
                        arrays from EVERY banded row (28x wire on
                        the dominant stream; see similarity.py)
  d14_ngram_jaccard     34.1k pairs    13.0s  (df cap bounds the
                        posting-list blowup from 4x duplication)
  d12_dup_clusters      20k labels     22.8s  (4x duplication fattens
                        every component; pointer jumping converges in
                        2 rounds — per-round stats now printed — edge
                        set checkpointed once, superseded round
                        checkpoints released eagerly)
  t13_bm25_topk         top-25          2.4s  (two scans + 1-row agg)
NOTE: with Spark's default 1g local heap the simhash join OOMs
(GCLocker retries) — get_session now sets spark.driver.memory.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

BASE = "/root/testdata/sf0.1"


def scaled(df, key: str, k: int, stride: int = 10_000_000):
    from functools import reduce

    from pyspark.sql import functions as F

    parts = [
        df.withColumn(key, F.col(key) + F.lit(i * stride)) for i in range(k)
    ]
    return reduce(lambda a, b: a.unionByName(b), parts)


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    from pyspark.sql import functions as F

    from echem_dft_etl_spark.operators import dedup, similarity
    from echem_dft_etl_spark.session import get_session
    from echem_dft_etl_spark.sources import load_table

    spark = get_session(app_name="scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    docs = scaled(load_table(spark, BASE, "documents"), "doc_id", k)
    emb = scaled(load_table(spark, BASE, "embeddings"), "vec_id", k)
    n_docs, n_emb = docs.count(), emb.count()
    print(f"scaled corpus: {n_docs} docs, {n_emb} embeddings (K={k})")

    cc_stats: list = []
    runs = [
        (
            f"d13_simhash_pairs ({n_docs} docs)",
            lambda: dedup.simhash_near_pairs(docs, max_hamming=6),
        ),
        (
            f"s12_cosine_near_pairs ({n_emb} vecs, "
            f"{n_emb * (n_emb - 1) // 2} pairs)",
            lambda: similarity.cosine_near_pairs_blocked_pandas(
                emb, 0.45, n_blocks=max(8, 2 * k)
            ),
        ),
        (
            # every original vector has K-1 shifted exact copies, so
            # the pruned path has (K choose 2)·n_base true cos-1.0
            # pairs to find — identical signatures collide in every
            # band, so missing any would be a correctness bug
            f"s12_near_pairs_pruned ({n_emb} vecs, banded + verify)",
            lambda: similarity.lsh_near_pairs(emb, threshold=0.85),
        ),
        (
            f"d14_ngram_jaccard ({n_docs} docs, df-capped)",
            lambda: dedup.ngram_jaccard_pairs(docs, threshold=0.5),
        ),
        (
            # K-fold duplication multiplies component sizes, not just
            # counts — the probe checks rounds stay logarithmic and the
            # per-round joins absorb the K2 edge growth; cc_stats below
            # records per-round (changed, n_labels) frame sizes
            f"d12_dup_clusters ({n_docs} docs, pointer-jumping CC)",
            lambda: __import__(
                "echem_dft_etl_spark.operators.components",
                fromlist=["duplicate_clusters"],
            ).duplicate_clusters(docs, threshold=0.8, round_stats=cc_stats),
        ),
        (
            f"t13_bm25_topk ({n_docs} docs)",
            lambda: __import__(
                "echem_dft_etl_spark.operators.retrieval",
                fromlist=["bm25_topk"],
            ).bm25_topk(
                docs, ("spark", "merge", "window", "vector", "stream"), 25
            ),
        ),
    ]
    for label, build in runs:
        t0 = time.perf_counter()
        n = build().count()
        print(f"{label}: {n} pairs in {time.perf_counter() - t0:.1f}s")
    if cc_stats:
        print(f"d12_dup_clusters per-round label frames: {cc_stats}")


if __name__ == "__main__":
    main()
