"""Round-10 adversarial-edge burn-ins for the round-9 operators
(VERDICT r9 item 5) plus hot-key stress for the round-10 additions.
Run manually: ``python tools/burnin_r10.py [name]`` with name in
{winnow_cliff, winnow_bigdoc, dsir_edge, ema_edge, pca_dim, r10ops}
(default: all). Results are transcribed into PLANS.md.

Shapes chosen to hit the documented contract BOUNDARIES, not just
scale:

- **winnow_cliff**: a shared text in exactly ``max_df`` docs must
  keep all its pairs; the same text in ``max_df + 1`` docs must
  vanish entirely (the census must count DISTINCT docs, not
  fingerprint occurrences). Docs are IDENTICAL text so every doc
  selects the identical fingerprint set and the per-fp df equals
  the doc count exactly. First fixture iteration EMBEDDED the
  passage in per-doc filler and found the real semantics: selection
  is window-context-dependent, so near the cliff a passage-interior
  k-gram selected by only a subset of the sharing docs can carry
  df <= max_df and legitimately surface one pair — max_df cuts
  FP-sharing, not passage-sharing (receipt in PLANS.md).
- **winnow_bigdoc**: multi-MB single documents — the per-doc gram/
  fingerprint arrays are row-local inside one Arrow batch; measures
  the selection kernel's memory shape and verifies a planted
  cross-doc copy still surfaces.
- **dsir_edge**: a near-empty target (ONE one-gram doc) and the
  B = 1e6 λ-collect guard boundary (accepted) vs 1e6 + 1 (raised).
- **ema_edge**: alpha = 1 (degenerates to identity — the recurrence
  must not drift) and ONE GLOBAL KEY over 5M rows (the documented
  worst case: a single sequential chain through one task).
- **pca_dim**: the dim = 1024 driver-collect ceiling (524,800
  covariance cells + a fit) and the dim = 1025 guard.
- **r10ops**: rolling_agg / state_intervals with one key at 20% of
  20M rows; group_quantiles exact on a single 10M-value group (the
  spill-aware buffer path); mutual_information at 100k x-categories
  (the joint stays distributed — no collect anywhere).
"""
from __future__ import annotations

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


def burnin_winnow_cliff(spark):
    from tablite_spark.pipeline.dedup import winnow_matches
    max_df = 8
    print(f"== winnow cliff: planted passages at max_df={max_df} "
          f"and max_df+1 over 100k docs")
    t0 = time.time()
    # keep/cut docs are IDENTICAL texts (so all sharing docs select
    # the identical fingerprint set and per-fp df == doc count);
    # everything else is per-doc-unique filler
    passage_keep = ("the quick brown fox jumped over every lazy dog "
                    "and then did it twice more for good measure")
    passage_cut = ("pack my box with five dozen fresh liquor jugs "
                   "then pack five dozen more boxes after that")
    base = F.concat(
        F.lit("doc body "), F.md5(F.col("id").cast("string")),
        F.lit(" "), F.md5((F.col("id") * 7 + 1).cast("string")))
    text = F.when(F.col("id") < max_df, F.lit(passage_keep)) \
            .when((F.col("id") >= 1000) & (F.col("id") < 1000 + max_df + 1),
                  F.lit(passage_cut)) \
            .otherwise(base)
    df = spark.range(100_000).select(F.col("id").alias("doc_id"),
                                     text.alias("text"))
    out = winnow_matches(df, "text", "doc_id", k=8, window=4,
                         max_df=max_df).collect()
    t0 = _t("winnow 100k docs at the cliff", t0)
    keep_ids = set(range(max_df))
    cut_ids = set(range(1000, 1000 + max_df + 1))
    keep_pairs = {(r["id_a"], r["id_b"]) for r in out
                  if r["id_a"] in keep_ids and r["id_b"] in keep_ids}
    cut_pairs = [(r["id_a"], r["id_b"]) for r in out
                 if r["id_a"] in cut_ids and r["id_b"] in cut_ids]
    want = {(a, b) for a in keep_ids for b in keep_ids if a < b}
    assert keep_pairs == want, (len(keep_pairs), len(want))
    assert not cut_pairs, cut_pairs[:5]
    print(f"    max_df side: all {len(want)} pairs kept; "
          f"max_df+1 side: 0 pairs (cut) — cliff exact")


def burnin_winnow_bigdoc(spark):
    from tablite_spark.pipeline.dedup import winnow_matches
    print("== winnow bigdoc: 200 docs x ~3 MB each, one planted "
          "cross-doc copied paragraph")
    t0 = time.time()
    # ~3 MB of per-doc-unique text: 30k repetitions of a 100-char
    # unique-per-(doc, i) block, built JVM-side
    blocks = F.transform(
        F.sequence(F.lit(0), F.lit(30_000)),
        lambda i: F.md5(F.concat(F.col("id").cast("string"),
                                 F.lit("-"), i.cast("string"))))
    shared = " the same copied paragraph appears in exactly two docs "
    text = F.concat(F.array_join(blocks, " "),
                    F.when(F.col("id").isin(17, 113),
                           F.lit(shared * 3)).otherwise(F.lit("")))
    df = (spark.range(200)
          .select(F.col("id").alias("doc_id"), text.alias("text"))
          .repartition(32))
    # k=16: an 8-char gram over hex filler carries only 32 bits of
    # entropy, and 200 docs x 3M grams genuinely share ~2000
    # substrings PER PAIR (birthday) — the first run correctly
    # reported all 19,900 pairs as true matches. 16-char grams put
    # the space at 1.8e19 (expected incidental pairs ~0.01).
    out = winnow_matches(df, "text", "doc_id", k=16, window=4,
                         max_df=50).collect()
    t0 = _t("winnow 200 x 3MB docs", t0)
    pairs = {(r["id_a"], r["id_b"]) for r in out}
    assert (17, 113) in pairs, pairs
    # md5 filler blocks are per-(doc,i) unique: essentially no
    # incidental pairs should survive
    assert len(pairs) < 10, len(pairs)
    print(f"    planted pair found; {len(pairs)} total pairs; "
          f"~600 MB of text fingerprinted")


def burnin_dsir_edge(spark):
    from tablite_spark.pipeline.selection import dsir_weights
    print("== dsir edge: 1M raw docs vs a ONE-DOC one-gram target; "
          "B=1e6 guard boundary")
    t0 = time.time()
    raw_text = F.concat(F.lit("foo bar baz token"),
                        (F.col("id") % 3).cast("string"))
    raw = spark.range(1_000_000).select(F.col("id").alias("doc_id"),
                                        raw_text.alias("text"))
    target = spark.createDataFrame([(1, "token1")],
                                   "doc_id long, text string")
    w = dsir_weights(raw, target, "text", "doc_id", buckets=1_000_000)
    agg = w.agg(F.count(F.lit(1)).alias("n"),
                F.count_distinct("dsir_micro").alias("d"),
                F.max("dsir_micro").alias("mx")).first()
    t0 = _t("dsir 1M raw / 1-gram target / B=1e6", t0)
    assert agg["n"] == 1_000_000
    # docs containing the single target gram must outrank the rest
    top = (w.orderBy(F.col("dsir_micro").desc()).limit(5)
           .select("doc_id").collect())
    assert all(r["doc_id"] % 3 == 1 for r in top), top
    try:
        dsir_weights(raw, target, "text", "doc_id",
                     buckets=1_000_001)
        raise AssertionError("buckets guard did not fire")
    except ValueError as e:
        assert "buckets" in str(e).lower() or "1" in str(e)
    print(f"    {agg['n']} weights, {agg['d']} distinct, "
          f"max={agg['mx']}; target-gram docs rank top; "
          f"B=1e6+1 correctly rejected")


def burnin_ema_edge(spark):
    from tablite_spark.operators.timeseries import ema_smooth
    print("== ema edge: alpha=1 identity over 5M rows, ONE global key")
    t0 = time.time()
    df = spark.range(5_000_000).select(
        F.lit(0).alias("user_id"),
        F.col("id").alias("event_id"),
        F.timestamp_seconds(F.lit(1_700_000_000)
                            + F.col("id") / 100.0).alias("ts"),
        (F.col("id") % 97).cast("double").alias("value"))
    out = ema_smooth(df, "ts", "value", by=["user_id"], alpha=1.0,
                     tiebreak=["event_id"])
    bad = out.filter(F.col("ema") != F.col("value")).count()
    n = out.count()
    t0 = _t("ema alpha=1, single global key, 5M rows", t0)
    assert n == 5_000_000 and bad == 0, (n, bad)
    print(f"    {n} rows through ONE sequential chain; alpha=1 is an "
          f"exact identity on every row (no recurrence drift)")


def burnin_pca_dim(spark):
    from tablite_spark.pipeline.decomp import (
        covariance_matrix, pca_fit,
    )
    dim = 1024
    print(f"== pca: dim={dim} contract ceiling, 50k vectors "
          f"(524,800 covariance cells), then the dim=1025 guard")
    t0 = time.time()
    vec = F.array(*[
        F.sin(F.col("id") * (0.0001 * (i + 3))) for i in range(dim)])
    df = spark.range(50_000).select(F.col("id").alias("vec_id"),
                                    vec.alias("embedding"))
    comps, vals = pca_fit(df, "embedding", dim, 4)
    t0 = _t("pca_fit 50k x 1024 (one corpus scan + driver eigh)", t0)
    assert comps.shape == (4, dim)
    assert all(vals[i] >= vals[i + 1] for i in range(3))
    import numpy as np
    assert np.allclose(comps @ comps.T, np.eye(4), atol=1e-9)
    try:
        covariance_matrix(df, "embedding", 1025)
        raise AssertionError("dim guard did not fire")
    except ValueError as e:
        assert "1024" in str(e)
    print("    fit orthonormal, eigenvalues ordered; dim=1025 "
          "correctly rejected")


def burnin_r10ops(spark):
    from tablite_spark.operators.stats import (
        group_quantiles, mutual_information,
    )
    from tablite_spark.operators.timeseries import (
        rolling_agg, state_intervals,
    )
    print("== r10 ops: hot keys, one huge exact-quantile group, "
          "100k-category MI")
    t0 = time.time()
    ev = spark.range(20_000_000).select(
        F.when(F.col("id") % 5 == 0, F.lit(0))
         .otherwise(F.col("id") % 100_000 + 1).alias("user_id"),
        F.col("id").alias("event_id"),
        F.timestamp_seconds(F.lit(1_700_000_000)
                            + F.col("id") / 1000.0).alias("ts"),
        (F.col("id") % 221).cast("double").alias("value"),
        (F.col("id") % 7).cast("string").alias("state"))
    r = rolling_agg(ev, "ts", "value", ["user_id"], "1 hour",
                    funcs=("avg", "count"))
    agg = r.agg(F.count(F.lit(1)).alias("n"),
                F.max("roll_count").alias("mx")).first()
    t0 = _t("rolling 20M rows, hot key 4M (1-hour range frame)", t0)
    assert agg["n"] == 20_000_000
    # hot key: 1 row/5ms -> a 1-hour frame holds ~720k hot rows
    assert agg["mx"] > 500_000, agg["mx"]

    si = state_intervals(ev, "user_id", "state", "ts",
                         tiebreak="event_id")
    sagg = si.agg(F.count(F.lit(1)).alias("n_iv"),
                  F.sum("n_obs").alias("n_rows")).first()
    t0 = _t("state_intervals 20M rows, hot key 4M", t0)
    assert sagg["n_rows"] == 20_000_000
    # the hot key cycles states every row -> ~4M single-obs islands
    assert sagg["n_iv"] > 4_000_000

    one = spark.range(10_000_000).select(
        F.lit("g").alias("g"), (F.col("id") % 1_000_003)
        .cast("double").alias("v"))
    q = group_quantiles(one, ["g"], "v", [0.5, 0.99],
                        exact=True).collect()
    t0 = _t("exact quantiles, ONE 10M-value group (buffered+spill)", t0)
    med = [r["value"] for r in q if r["q"] == 0.5][0]
    assert abs(med - 499_999.0) < 2_000, med

    mi_df = spark.range(20_000_000).select(
        (F.col("id") % 100_000).alias("x"),
        (F.col("id") % 4).alias("y"))
    m = mutual_information(mi_df, "x", "y").first()
    t0 = _t("MI 20M rows, 100k x-categories (400k-cell joint)", t0)
    # x mod 100000 determines y = x mod 4 exactly -> MI = H(Y) = ln 4
    import math
    assert abs(m["mi_nats"] - math.log(4)) < 1e-9, m["mi_nats"]
    print(f"    rolling max frame {agg['mx']}, "
          f"{sagg['n_iv']} intervals, median {med}, "
          f"MI exact at 400k joint cells")




def burnin_jaccard(spark):
    from tablite_spark.pipeline.dedup import jaccard_join
    print("== jaccard join: 500k docs (~30 tokens from a 500k vocab "
          "+ universal boilerplate), 1000 planted ~0.82 pairs at "
          "t=0.8")
    t0 = time.time()
    # body: 30 tokens drawn deterministically; boilerplate tokens
    # appear in EVERY doc (df = 500k — must never enter a prefix)
    body = F.transform(
        F.sequence(F.lit(0), F.lit(29)),
        lambda i: F.concat(F.lit("tok"), F.conv(F.substring(
            F.md5(F.concat(F.col("seed").cast("string"), F.lit("-"),
                           i.cast("string"))), 1, 8), 16, 10)
            .cast("long") % 500_000))
    # planted twin: same seed, 3 of 30 tokens perturbed -> jaccard
    # = 27 / 33 = 0.818 >= 0.8
    twin = F.transform(
        F.sequence(F.lit(0), F.lit(29)),
        lambda i: F.when(i < 3, F.concat(F.lit("alt"), i.cast("string"),
                                         F.lit("x"),
                                         F.col("doc_id").cast("string")))
        .otherwise(F.concat(F.lit("tok"), F.conv(F.substring(
            F.md5(F.concat(F.col("seed").cast("string"), F.lit("-"),
                           i.cast("string"))), 1, 8), 16, 10)
            .cast("long") % 500_000)))
    base = spark.range(500_000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") >= 499_000, F.col("id") - 499_000 + 7)
         .otherwise(F.col("id") + 7).alias("seed"))
    text = F.concat(
        F.lit("the of and a to in "),
        F.array_join(F.when(F.col("doc_id") >= 499_000, twin)
                     .otherwise(body), " "))
    df = base.select("doc_id", text.alias("text")).repartition(32)
    out = jaccard_join(df, "text", "doc_id", threshold=0.8)
    planted = out.filter((F.col("id_b") - F.col("id_a")) == 499_000)
    n_planted = planted.count()
    n_total = out.count()
    t0 = _t("jaccard 500k docs, t=0.8 (prefix+length filter)", t0)
    assert n_planted == 1000, n_planted
    # random 30-token bodies from a 500k vocab can't reach 0.8
    assert n_total - n_planted < 20, n_total
    print(f"    {n_planted}/1000 planted pairs found, "
          f"{n_total - n_planted} incidental; boilerplate df=500k "
          f"never entered a prefix")




def burnin_spearman(spark):
    from tablite_spark.operators.stats import spearman_corr
    print("== spearman: 20M rows, one ALL-DISTINCT column (20M-row "
          "rank frame) x one 100-category column")
    t0 = time.time()
    df = spark.range(20_000_000).select(
        (F.col("id") * 2654435761 % 2**31).cast("double").alias("x"),
        (F.col("id") % 100).cast("double").alias("y"),
        # z is a monotone transform of x -> rho(x, z) must be 1.0
        ((F.col("id") * 2654435761 % 2**31) / 7.0 + 3.0)
        .alias("z"))
    out = {(r["col_a"], r["col_b"]): r for r in
           spearman_corr(df, ["x", "y", "z"]).collect()}
    t0 = _t("spearman 20M rows, all-distinct rank frame", t0)
    assert out[("x", "z")]["n"] == 20_000_000
    assert abs(out[("x", "z")]["rho"] - 1.0) < 1e-9, out[("x", "z")]
    # x-hash vs id%100: no monotone relation -> |rho| near 0
    assert abs(out[("x", "y")]["rho"]) < 0.01, out[("x", "y")]
    print(f"    rho(x, monotone(x)) = {out[('x','z')]['rho']:.12f}; "
          f"rho(x, y) = {out[('x','y')]['rho']:.6f}; no global-order "
          f"window anywhere (20M distinct ranks via bucketed prefix "
          f"sums)")


if __name__ == "__main__":
    names = sys.argv[1:] or ["winnow_cliff", "winnow_bigdoc",
                             "dsir_edge", "ema_edge", "pca_dim",
                             "r10ops", "jaccard", "spearman"]
    spark = get_spark("burnin_r10")
    spark.sparkContext.setLogLevel("ERROR")
    for n in names:
        globals()[f"burnin_{n}"](spark)
    print("ALL BURN-INS PASSED")
    spark.stop()
