"""Round-9 adversarial-scale burn-ins for the round-8 operators
(VERDICT r8 item 5). Run manually: ``python tools/burnin_r9.py
[name]`` with name in {trigram, ohlc, funnel, interp} (default: all).
Results are transcribed into PLANS.md / README scale-validation rows.

Shapes chosen to stress the documented 100-TB funnels:

- **trigram**: 10M docs where EVERY doc contains "the" several times
  (a "the"-dominated corpus): the needle's hottest trigram posting
  list is ~10M rows, so the intersection groupBy(doc_id) sees the
  full corpus on that key's postings. Checks index build wall time,
  probe wall time against the durable index, and EXACTNESS vs a
  brute-force contains() scan (count + sum(doc_id) fingerprint).
- **ohlc**: 50M ticks where ONE symbol carries 20% of all events
  (power-law): the (symbol, window) groupBy must absorb the hot
  symbol map-side via partial min_by/max_by — no window functions,
  no per-symbol serialization. Exactness spot-checked per bucket.
- **funnel**: 4-step funnel over 50M events with ONE user at 20% of
  events, parquet source — times the default (per-step scan-pruned)
  plan vs single_scan=True (one source scan into a spilled cache)
  and asserts identical results. The hot user stresses the
  combinable conditional-min groupBy(user).
- **interp**: interpolate_at where 90% of series rows are DUPLICATE
  (group, ts) samples: the asof dedup-to-max must collapse them in
  ONE pass (no pair blowup), and the lerp must stay exact. 20M
  samples / 2M targets.
"""
from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tablite_spark import get_spark


def _t(label, t0):
    dt = time.time() - t0
    print(f"    [{label}] {dt:.1f}s  loadavg={os.getloadavg()[0]:.1f}")
    return time.time()


def burnin_trigram(spark):
    from tablite_spark.pipeline.retrieval import (
        build_trigram_index, load_trigram_index, substring_search,
    )
    print("== trigram: 10M docs, 'the'-dominated corpus, hot posting")
    t0 = time.time()
    # every doc: "the w<id> of the w<id+1> and the end" — 'the'
    # appears 3x per doc; ~0.1% of docs also contain the full needle
    docs = spark.range(10_000_000).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("the w"), F.col("id").cast("string"),
            F.lit(" of the w"), (F.col("id") + 1).cast("string"),
            F.when(F.col("id") % 1000 == 7, F.lit(" on the table "))
             .otherwise(F.lit(" and ")),
            F.lit("the end")).alias("text"))
    tmp = tempfile.mkdtemp(prefix="burnin_trigram_")
    try:
        docs.write.parquet(f"{tmp}/docs")
        d = spark.read.parquet(f"{tmp}/docs")
        t0 = _t("write 10M docs", t0)
        build_trigram_index(d, "text", "doc_id", f"{tmp}/idx")
        t0 = _t("index build", t0)
        postings, tri_df = load_trigram_index(spark, f"{tmp}/idx")
        fp_agg = (F.count(F.lit(1)).alias("n"),
                  F.sum("doc_id").alias("fp"),
                  F.sum("n_occurrences").alias("occ"))
        slow = substring_search(d, "text", "doc_id", "the table",
                                postings=postings).agg(*fp_agg).first()
        t0 = _t("probe UNPRUNED (drags the hot 'the' posting)", t0)
        got = substring_search(d, "text", "doc_id", "the table",
                               postings=postings, tri_df=tri_df,
                               max_probe_trigrams=3) \
            .agg(*fp_agg).first()
        t0 = _t("probe PRUNED (3 rarest trigrams + confirm)", t0)
        assert tuple(slow) == tuple(got), (slow, got)
        want = d.filter(F.col("text").contains("the table")) \
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("doc_id").alias("fp")).first()
        t0 = _t("brute-force contains scan", t0)
        assert (got["n"], got["fp"]) == (want["n"], want["fp"]), \
            (got, want)
        assert got["n"] == 10_000  # id % 1000 == 7
        print(f"    exact: {got['n']} matches, occ={got['occ']}")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def burnin_ohlc(spark):
    from tablite_spark.operators.timeseries import ohlc_resample
    print("== ohlc: 50M ticks, 1 symbol = 20% of events")
    t0 = time.time()
    # symbol 0 takes every 5th tick; the rest spread over 10k symbols
    ticks = spark.range(50_000_000).select(
        F.when(F.col("id") % 5 == 0, F.lit(0))
         .otherwise(F.col("id") % 10_000 + 1).alias("symbol"),
        (F.timestamp_seconds(F.lit(1_700_000_000)
                             + (F.col("id") % 86_400))).alias("ts"),
        (F.col("id") % 997).cast("double").alias("price"))
    out = ohlc_resample(ticks, "ts", "price", by=["symbol"],
                        every="1 hour")
    agg = out.agg(F.count(F.lit(1)).alias("n"),
                  F.sum("n_events").alias("ev")).first()
    t0 = _t("ohlc 50M hot-symbol", t0)
    assert agg["ev"] == 50_000_000
    # hot symbol: exactness of one bucket vs a direct computation
    # over the SAME epoch-aligned window edges F.window produces
    hot = out.filter((F.col("symbol") == 0)).orderBy("bucket_start") \
        .limit(1).first()
    chk = (ticks.filter(F.col("symbol") == 0)
           .withColumn("ws", F.window("ts", "1 hour")["start"])
           .filter(F.col("ws") == F.lit(hot["bucket_start"]))
           .agg(F.max("price").alias("high"),
                F.min("price").alias("low"),
                F.count(F.lit(1)).alias("n")).first())
    assert hot["high"] == chk["high"] and hot["low"] == chk["low"]
    assert hot["n_events"] == chk["n"], (hot, chk)
    print(f"    {agg['n']} (symbol, bucket) rows, hot bucket "
          f"n={hot['n_events']}, exact")


def burnin_retention(spark):
    from tablite_spark.operators.timeseries import retention_cohorts
    print("== retention: 50M events, 1 user = 20% of events")
    t0 = time.time()
    ev = spark.range(50_000_000).select(
        F.when(F.col("id") % 5 == 0, F.lit(0))
         .otherwise(F.col("id") % 1_000_000 + 1).alias("user_id"),
        F.timestamp_seconds(
            F.lit(1_700_000_000)
            + (F.col("id") % (86_400 * 28))).alias("ts"))
    out = retention_cohorts(ev, "ts", "user_id", every="1 week")
    rows = out.collect()
    t0 = _t("retention 50M hot-user", t0)
    total_p0 = sum(r["n_users"] for r in rows if r["period"] == 0)
    # every user cohorts exactly once: sum of period-0 cells ==
    # independent distinct count (800,001 here — 1M ≡ 0 mod 5, so
    # user slots ≡ 0 mod 5 all collapse into the hot user)
    n_users = ev.select("user_id").distinct().count()
    assert total_p0 == n_users, (total_p0, n_users)
    print(f"    {len(rows)} (cohort, period) cells, "
          f"sum(period0)={total_p0} == {n_users} distinct users, exact")


def burnin_funnel(spark):
    from tablite_spark.operators.timeseries import funnel
    print("== funnel: 4 steps, 50M events, 1 user = 20% of events, "
          "parquet source")
    steps = ["view", "click", "cart", "purchase"]
    t0 = time.time()
    ev = spark.range(50_000_000).select(
        F.when(F.col("id") % 5 == 0, F.lit(0))
         .otherwise(F.col("id") % 1_000_000 + 1).alias("user_id"),
        F.element_at(
            F.array(*[F.lit(s) for s in
                      ["view", "click", "cart", "purchase", "noise",
                       "noise2"]]),
            (F.col("id") % 6 + 1).cast("int")).alias("event_type"),
        F.timestamp_seconds(
            F.lit(1_700_000_000) + F.col("id") / 100).alias("ts"))
    tmp = tempfile.mkdtemp(prefix="burnin_funnel_")
    try:
        ev.write.parquet(f"{tmp}/ev")
        src = spark.read.parquet(f"{tmp}/ev")
        t0 = _t("write 50M events", t0)
        lazy = funnel(src, steps).agg(
            F.count(F.lit(1)).alias("n"),
            *[F.count(f"t_{s}").alias(s) for s in steps]).first()
        t0 = _t("default plan (per-step scan, pruned)", t0)
        eager = funnel(src, steps, single_scan=True)
        got = eager.agg(
            F.count(F.lit(1)).alias("n"),
            *[F.count(f"t_{s}").alias(s) for s in steps]).first()
        t0 = _t("single_scan=True (one scan + spilled cache)", t0)
        assert tuple(lazy) == tuple(got), (lazy, got)
        from tablite_spark.plans.lifecycle import (
            unpersist_local_checkpoint,
        )
        unpersist_local_checkpoint(eager)
        print(f"    identical: {lazy['n']} step-0 users, "
              f"completions={[lazy[s] for s in steps]}")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def burnin_interp(spark):
    from tablite_spark.operators.timeseries import interpolate_at
    print("== interp: 20M samples, 90% duplicate (group, ts); "
          "2M targets")
    t0 = time.time()
    # 10 sensors; ts grid of 200k seconds; 10 samples per (sensor, ts)
    # -> 90% duplicates. value encodes ts so the lerp is checkable:
    # max(value) at ts t == 2t (dup index d in 0..9 -> 2t - d).
    series = spark.range(20_000_000).select(
        (F.col("id") % 10).alias("sensor"),
        F.timestamp_seconds(
            F.lit(1_700_000_000)
            + (F.col("id") % 200_000) * 10).alias("ts"),
        ((F.col("id") % 200_000) * 10 * 2
         - F.floor(F.col("id") / 2_000_000)).cast("double")
        .alias("value"))
    targets = spark.range(2_000_000).select(
        F.col("id").alias("tid"),
        (F.col("id") % 10).alias("sensor"),
        F.timestamp_seconds(
            F.lit(1_700_000_000)
            + (F.col("id") % 199_999) * 10 + 5).alias("ts"))
    out = interpolate_at(series, targets, "ts", "value",
                         by=["sensor"], out_col="v")
    # dedup-to-max -> sample at ts t is exactly 2t; target at t+5
    # lerps to 2t+10 == 2*(t+5): v must equal 2 * seconds(target ts)
    agg = out.agg(
        F.sum((F.abs(F.col("v")
                     - (F.unix_timestamp("ts") - 1_700_000_000) * 2.0)
               > 1e-6).cast("long")).alias("bad"),
        F.sum(F.col("v").isNull().cast("long")).alias("nulls"),
        F.count(F.lit(1)).alias("n")).first()
    t0 = _t("interpolate 20M->2M (90% dup ts)", t0)
    # nulls only at each sensor's trailing edge (target past the last
    # sample -> no forward neighbor); everything in-range is exact
    assert (agg["bad"] or 0) == 0 and agg["n"] == 2_000_000, agg
    assert (agg["nulls"] or 0) < 100, agg
    print(f"    {agg['n']} targets, {agg['nulls']} boundary nulls, "
          f"all in-range lerps exact through the dup storm")


def burnin_dsir(spark):
    from tablite_spark.pipeline.selection import dsir_weights
    print("== dsir: 2M raw docs / 100k target docs, B=10k buckets")
    t0 = time.time()
    # two disjoint vocabularies; every 20th raw doc speaks the target
    # vocabulary -> DSIR must rank ALL of them above every other doc
    tgt_text = F.concat(F.lit("alpha beta gamma delta w"),
                        (F.col("id") % 997).cast("string"))
    raw_text = F.when(F.col("id") % 20 == 0, tgt_text).otherwise(
        F.concat(F.lit("foo bar baz qux w"),
                 (F.col("id") % 997).cast("string")))
    raw = spark.range(2_000_000).select(F.col("id").alias("doc_id"),
                                        raw_text.alias("text"))
    target = spark.range(100_000).select(
        (F.col("id") + 10_000_000).alias("doc_id"),
        tgt_text.alias("text"))
    w = dsir_weights(raw, target, "text", "doc_id", buckets=10_000)
    # min weight among planted target-like docs vs max among the rest
    agg = w.agg(
        F.min(F.when(F.col("doc_id") % 20 == 0, F.col("dsir_micro")))
        .alias("min_t"),
        F.max(F.when(F.col("doc_id") % 20 != 0, F.col("dsir_micro")))
        .alias("max_o"),
        F.count(F.lit(1)).alias("n")).first()
    t0 = _t("dsir 2M docs (two corpus passes + scoring pass)", t0)
    assert agg["n"] == 2_000_000
    assert agg["min_t"] > agg["max_o"], agg
    print(f"    separation: min(target-like)={agg['min_t']} > "
          f"max(other)={agg['max_o']} over 2M docs")


def burnin_pca(spark):
    from tablite_spark.pipeline.decomp import covariance_matrix
    print("== pca: covariance of 1M vectors, dim=128 "
          "(Gram partials vs catalyst expressions)")
    t0 = time.time()
    dim = 128
    vec = F.array(*[
        F.sin(F.col("id") * (0.001 * (i + 1))) for i in range(dim)])
    df = spark.range(1_000_000).select(F.col("id").alias("vec_id"),
                                       vec.alias("embedding"))
    cov = {(r["i"], r["j"]): r["cov"] for r in
           covariance_matrix(df, "embedding", dim).collect()}
    t0 = _t("covariance 1M x 128 (8256 cells)", t0)
    assert len(cov) == dim * (dim + 1) // 2
    # exactness of the partial-sum machinery: 3 cells vs a direct
    # catalyst aggregate over the same data
    for (i, j) in [(0, 0), (3, 97), (127, 127)]:
        chk = df.select(
            (F.element_at("embedding", i + 1)
             * F.element_at("embedding", j + 1)).alias("xy"),
            F.element_at("embedding", i + 1).alias("x"),
            F.element_at("embedding", j + 1).alias("y")) \
            .agg((F.avg("xy") - F.avg("x") * F.avg("y"))
                 .alias("c")).first()["c"]
        assert abs(cov[(i, j)] - chk) < 1e-9, (i, j, cov[(i, j)], chk)
    t0 = _t("3-cell catalyst cross-check", t0)
    print("    8256 cells, spot cells match catalyst to <1e-9")


def burnin_ema(spark):
    from tablite_spark.operators.timeseries import ema_smooth
    print("== ema: 20M rows, 1 key = 20% of rows (4M-row sequential "
          "chain through one task)")
    t0 = time.time()
    df = spark.range(20_000_000).select(
        F.when(F.col("id") % 5 == 0, F.lit(0))
         .otherwise(F.col("id") % 100_000 + 1).alias("user_id"),
        F.col("id").alias("event_id"),
        F.timestamp_seconds(F.lit(1_700_000_000)
                            + F.col("id") / 1000.0).alias("ts"),
        (F.col("id") % 221).cast("double").alias("value"))
    out = ema_smooth(df, "ts", "value", by=["user_id"],
                     alpha=0.25, tiebreak=["event_id"])
    agg = out.agg(F.count(F.lit(1)).alias("n"),
                  F.sum("ema").alias("s")).first()
    t0 = _t("ema 20M rows, hot key 4M", t0)
    assert agg["n"] == 20_000_000
    # the steady-state EMA of value=id%221 over the hot key's own
    # subsequence is bounded by the value range — sanity, plus an
    # exact replay of one SMALL key's chain
    small = out.filter(F.col("user_id") == 7).collect()
    rows = (df.filter(F.col("user_id") == 7)
            .orderBy("ts", "event_id").collect())
    e = None
    for r, got in zip(rows, sorted(small, key=lambda x: x["event_id"])):
        e = r["value"] if e is None else 0.75 * e + 0.25 * r["value"]
        assert got["ema"] == e, (r["event_id"], got["ema"], e)
    print(f"    {agg['n']} rows, key-7 chain exact "
          f"({len(small)} steps), hot key absorbed")


def burnin_winnow(spark):
    from tablite_spark.pipeline.dedup import winnow_matches
    print("== winnow: 5M docs, 2500 planted partial-copy pairs "
          "(unique 40+-char shared passage per pair)")
    t0 = time.time()
    n, npairs = 5_000_000, 2_500
    # every doc: unique filler; docs i and i+n/2 (i < npairs) also
    # embed the SAME per-pair passage (>= k+w-1 chars), so winnowing
    # MUST surface exactly those pairs
    half = n // 2
    pid = F.when(F.col("id") < npairs, F.col("id")) \
        .when((F.col("id") >= half) & (F.col("id") < half + npairs),
              F.col("id") - half)
    # the shared passage is fully PAIR-UNIQUE (md5 of the pair id):
    # a template-worded passage ("shared passage number <i>") fails
    # the burn-in legitimately — the winnowing guarantee selects the
    # window-min gram, which lands on a TEMPLATE gram for many pairs,
    # and template grams appear in all 5000 planted docs so the
    # max_df too-common cut removes them (MOSS semantics: matches
    # living entirely in boilerplate are deliberately not reported).
    passage = F.when(pid.isNotNull(), F.concat(
        F.lit(" "), F.md5(F.concat(F.lit("pair"), pid.cast("string"))),
        F.lit(" "))).otherwise(F.lit(" "))
    # filler = two md5 hex blocks per doc (64 high-entropy chars, no
    # shared template): two earlier fixtures used "doc <n> filler <m>"
    # templates, and the TEMPLATE/number-prefix boundary 12-grams were
    # genuinely shared by ≤25 docs each — 26–43M TRUE similar pairs
    # (output size is the data's similarity volume, a correct answer
    # to a bad fixture, with the max_df cut bounding the hot grams as
    # designed). Hex docs share nothing but the planted passages.
    # disjoint hash-input namespaces ("h"/"t" prefixes): a previous
    # fixture used md5(id) and md5(7id+3), so doc i's tail block
    # EQUALLED doc 7i+3's head block — 714,296 (= 5M/7) genuinely
    # shared 32-char blocks reported as pairs, correctly
    text = F.concat(
        F.md5(F.concat(F.lit("h"), F.col("id").cast("string"))),
        passage,
        F.md5(F.concat(F.lit("t"), F.col("id").cast("string"))))
    docs = spark.range(n).select(F.col("id").alias("doc_id"),
                                 text.alias("text"))
    m = winnow_matches(docs, "text", "doc_id", k=12, window=6,
                       max_df=25)
    agg = m.agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(((F.col("id_b") - F.col("id_a") == half)
               & (F.col("id_a") < npairs)).cast("long"))
        .alias("planted")).first()
    t0 = _t("winnow_matches 5M docs", t0)
    assert agg["planted"] == npairs, agg
    print(f"    all {npairs} planted pairs found; "
          f"{agg['total'] - npairs} incidental pairs")


ALL = {"trigram": burnin_trigram, "ohlc": burnin_ohlc,
       "retention": burnin_retention, "funnel": burnin_funnel,
       "interp": burnin_interp, "dsir": burnin_dsir,
       "pca": burnin_pca, "ema": burnin_ema,
       "winnow": burnin_winnow}

if __name__ == "__main__":
    names = sys.argv[1:] or list(ALL)
    spark = get_spark("burnin_r9")
    spark.sparkContext.setLogLevel("ERROR")
    for nm in names:
        ALL[nm](spark)
    print("ALL BURN-INS PASSED")
    spark.stop()
