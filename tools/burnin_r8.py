"""Round-8 adversarial-scale burn-ins for the round-7 operators
(VERDICT r7 item 5) plus the round-8 BPE trainer. Run manually:
``python tools/burnin_r8.py [name]`` with name in {pagerank, incdedup,
hardneg, kmeans, bpe} (default: all). Results are transcribed into
PLANS.md scale-validation rows.

Shapes chosen to stress the documented 100-TB funnels:

- **pagerank**: 12M-edge multigraph where ONE dst holds ~5M in-edges
  (a web hub) plus a 2M-node sparse tail and dangling nodes, 10
  iterations — exercises the combinable groupBy(dst) under extreme
  key skew (the partial aggregation must absorb the hub map-side),
  the per-round localCheckpoint + unpersist cycle (cached blocks must
  stay O(1) in iters), and the dangling-mass scalar agg.
- **incdedup**: 2M-doc corpus index on disk, 200k-doc batch (half
  corpus dups, half fresh) probed against it, then an
  ``update_index=True`` accept + full REPLAY of the same batch — the
  crash-retry path: the replay must keep every survivor (self-match
  id guard) and drop every corpus dup, at index scale.
- **hardneg**: hard-negative mining with a 100k-query broadcast —
  where does the broadcast-queries-into-one-corpus-scan design stop
  being right? Stamps the broadcast payload size next to the 10k/100k
  timings.
- **kmeans**: dim-512 vectors, k=16 — the literal-centroid assign
  expression carries k·dim = 8192 literals; checks codegen survives
  (or falls back) and the per-iteration wall time, plus the 2^53
  mean-floor guard arithmetic at this dim.
"""
from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tablite_spark import get_spark


def _t(label, t0):
    dt = time.time() - t0
    print(f"    [{label}] {dt:.1f}s  loadavg={os.getloadavg()[0]:.1f}")
    return time.time()


def burnin_pagerank(spark):
    from tablite_spark.pipeline.graph import pagerank
    print("== pagerank: 12M edges, 5M-in-edge hub, 10 iterations")
    t0 = time.time()
    # 5M edges into hub node 0 from 1M distinct srcs (multigraph x5),
    # 7M sparse tail edges over 2M nodes, 100k dangling-only nodes
    hub = spark.range(5_000_000).select(
        (F.col("id") % 1_000_000 + 1).alias("src"),
        F.lit(0).cast("long").alias("dst"))
    tail = spark.range(7_000_000).select(
        (F.col("id") % 2_000_000 + 1).alias("src"),
        ((F.col("id") * 2654435761) % 2_000_000 + 1).alias("dst"))
    dang = spark.range(100_000).select(
        (F.col("id") + 1).alias("src"),
        (F.col("id") + 3_000_000).alias("dst"))  # dsts have outdeg 0
    edges = hub.unionByName(tail).unionByName(dang)
    t0 = _t("edge gen (lazy)", t0)
    ranks = pagerank(edges, "src", "dst", iters=10)
    n = ranks.count()
    t0 = _t(f"10 iterations, {n} nodes", t0)
    top = ranks.orderBy(F.desc("rank")).limit(3).collect()
    print("    top ranks:", [(r["node"], r["rank"]) for r in top])
    assert top[0]["node"] == 0, "hub must dominate"
    jsc = spark.sparkContext._jsc.sc()
    print(f"    persistent RDDs after run: {jsc.getPersistentRDDs().size()}")


def burnin_incdedup(spark):
    import shutil
    import tempfile

    from tablite_spark.pipeline.dedup import (
        incremental_minhash_dedup, minhash_save_index, shingle_minhash,
    )
    print("== incdedup: 2M-doc index, 200k batch, accept + replay")
    root = tempfile.mkdtemp(prefix="burnin_mh_")
    idx = f"{root}/index"
    try:
        text = F.concat_ws(" ", F.transform(
            F.sequence(F.lit(1), F.lit(30)),
            lambda j: F.concat(F.lit("t"), (F.col("id") * 37 + j * 1009)
                               .cast("string"))))
        corpus = spark.range(2_000_000).select(
            F.col("id").alias("doc_id"), text.alias("text"))
        t0 = time.time()
        minhash_save_index(shingle_minhash(corpus, "text", "doc_id"),
                           "doc_id", idx)
        t0 = _t("index build (2M docs)", t0)
        # dup docs: rebuild the corpus text formula from the SOURCE id
        src = spark.range(100_000).select((F.col("id") * 20).alias("id"))
        dup = src.select((F.col("id") + 10_000_000).alias("doc_id"),
                         text.alias("text"))
        fresh = spark.range(100_000).select(
            (F.col("id") + 20_000_000).alias("doc_id"),
            F.concat_ws(" ", F.transform(
                F.sequence(F.lit(1), F.lit(30)),
                lambda j: F.concat(F.lit("f"),
                                   (F.col("id") * 41 + j * 2003)
                                   .cast("string")))).alias("text"))
        batch = dup.unionByName(fresh)
        out = incremental_minhash_dedup(batch, "text", "doc_id", idx,
                                        update_index=True)
        kept = out.count()
        t0 = _t(f"probe+accept: kept {kept}/200000", t0)
        assert kept == 100_000, kept  # exactly the fresh half
        # crash-retry REPLAY: same batch, index now holds its survivors
        out2 = incremental_minhash_dedup(batch, "text", "doc_id", idx)
        kept2 = out2.count()
        t0 = _t(f"replay: kept {kept2}/200000", t0)
        assert kept2 == 100_000, kept2  # self-match guard holds at scale
    finally:
        shutil.rmtree(root, ignore_errors=True)


def burnin_hardneg(spark):
    """The original shape (catalyst path, 10k queries x 1M corpus)
    answered the burn-in question by FAILING it: the broadcast-NLJ +
    per-pair higher-order-dot plan materializes 10^10 pair rows and
    finished 0/32 tasks in 20 min — the quadratic wall sits near 10^8
    pairs. That finding drove the BLAS-batched kernel
    (similarity._batched_candidates); this burn-in now measures the
    catalyst path at a sub-wall shape (1k x 1M = 10^9... still heavy;
    1k) for a baseline, then the batched path at 10k and 100k."""
    from tablite_spark.pipeline.similarity import hard_negatives
    print("== hardneg: catalyst 1k baseline, batched 10k/100k; 1M corpus")
    dim = 64
    vec = F.transform(F.sequence(F.lit(1), F.lit(dim)),
                      lambda j: ((F.col("id") * 131 + j * 7919) % 1000
                                 / F.lit(500.0) - 1.0))
    corpus = spark.range(1_000_000).select(
        F.col("id").alias("vec_id"), vec.alias("embedding"))

    def run(nq, batched, label):
        q = spark.range(nq).select(
            (F.col("id") + 5_000_000).alias("vec_id"),
            vec.alias("embedding"))
        excl = spark.range(nq).select(
            (F.col("id") + 5_000_000).alias("qid"),
            (F.col("id") % 1_000_000).alias("nid"))
        t0 = time.time()
        out = hard_negatives(corpus, q, k=4, id_col="vec_id",
                             vec_col="embedding", exclude=excl,
                             batched=batched)
        n = out.count()
        bcast_mb = nq * (dim * 8 + 16) / 1e6
        _t(f"{label}: {nq} queries -> {n} rows (bcast ~{bcast_mb:.0f} MB)",
           t0)
        return n

    n_cat = run(1_000, False, "catalyst")
    n_bat = run(1_000, True, "batched")
    assert n_cat == n_bat == 4_000, (n_cat, n_bat)  # same exact output
    run(10_000, True, "batched")
    run(100_000, True, "batched")


def burnin_kmeans(spark):
    from tablite_spark.pipeline.clustering import kmeans_fit
    print("== kmeans: dim 512, k=16, 200k vectors, 3 iterations")
    dim = 512
    vec = F.transform(F.sequence(F.lit(1), F.lit(dim)),
                      lambda j: ((F.col("id") * 97 + j * 31) % 2000
                                 / F.lit(1000.0) - 1.0)
                      .cast("float"))
    df = spark.range(200_000).select(F.col("id").alias("vec_id"),
                                     vec.alias("embedding"))
    t0 = time.time()
    cents = kmeans_fit(df, "embedding", "vec_id", k=16, iters=3)
    _t("fit (3 iters, 16x512 literal centroids/iter)", t0)
    assert len(cents) == 16 and len(cents[0]) == dim
    # mean-floor guard arithmetic at this shape: component sums stay
    # far under 2^53 (2^20 scale x 200k rows ~ 2^38)
    print(f"    max |centroid component| = "
          f"{max(abs(c) for row in cents for c in row)}")


def burnin_bpe(spark):
    """Distributed BPE training at corpus scale: 1M docs x 12 words
    from a 50k-distinct-word population -> the census must reduce
    12M word occurrences to a 50k-row table in one combinable pass,
    then 30 merge rounds must hold a flat per-round cost (pair census
    + argmax + fold + checkpoint over the SMALL table) with O(1)
    cached blocks."""
    from tablite_spark.pipeline.bpe import train_bpe_distributed
    print("== bpe: 1M docs, ~50k distinct words, 30 merges")
    text = F.concat_ws(" ", F.transform(
        F.sequence(F.lit(1), F.lit(12)),
        lambda j: F.concat(F.lit("w"),
                           ((F.col("id") * 31 + j * 7) % 50_000)
                           .cast("string"))))
    docs = spark.range(1_000_000).select(text.alias("text"))
    t0 = time.time()
    merges = train_bpe_distributed(docs, "text", 30)
    rows = merges.collect()
    _t(f"census + 30 merges -> {len(rows)} merges", t0)
    assert len(rows) == 30
    # digits dominate: the first merges glue digit pairs
    print("    first merges:",
          [(r["mleft"], r["mright"]) for r in rows[:5]])
    jsc = spark.sparkContext._jsc.sc()
    print(f"    persistent RDDs after run: {jsc.getPersistentRDDs().size()}")


def burnin_fuzzy(spark):
    """PassJoin fuzzy join at 2M strings (1M originals + 1M planted
    one-edit mutants), d=1: the segment-blocked candidate join must
    stay linear-ish (no cross join) AND find EVERY planted pair — a
    million-pair no-false-negative check of the pigeonhole blocking."""
    from tablite_spark.operators.fuzzy import fuzzy_join
    print("== fuzzy: 2M strings (1M + 1M one-edit mutants), d=1")
    # diverse ~11-char strings: base-26 digits of a spread-out id
    val = (F.col("id") * 2654435761) % 100_000_000_000
    chars = F.transform(
        F.sequence(F.lit(0), F.lit(7)),
        lambda j: F.char(F.lit(97) + ((val / F.pow(F.lit(26), j))
                                      .cast("long") % 26)))
    s = F.concat(F.lit("w"), F.concat_ws("", chars))
    base = spark.range(1_000_000).select(
        F.col("id").alias("sid"), s.alias("w"))
    # mutant: substitute the LAST char with a char outside a-z ('0')
    mut = base.select((F.col("sid") + 5_000_000).alias("sid"),
                      F.concat(F.substring("w", 1, 8), F.lit("0"))
                      .alias("w"))
    both = base.unionByName(mut)
    t0 = time.time()
    out = fuzzy_join(both, both, "w", "w", max_distance=1,
                     left_id="sid", right_id="sid")
    planted = out.filter(
        (F.col("r_id") - F.col("l_id") == 5_000_000)
        & (F.col("dist") == 1)).count()
    _t(f"planted pairs found: {planted}/1000000", t0)
    assert planted == 1_000_000, planted


ALL = {"pagerank": burnin_pagerank, "incdedup": burnin_incdedup,
       "hardneg": burnin_hardneg, "kmeans": burnin_kmeans,
       "bpe": burnin_bpe, "fuzzy": burnin_fuzzy}

if __name__ == "__main__":
    which = sys.argv[1:] or list(ALL)
    spark = get_spark("burnin_r8")
    spark.sparkContext.setLogLevel("ERROR")
    for name in which:
        ALL[name](spark)
    spark.stop()
