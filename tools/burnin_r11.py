"""Round-11 adversarial-edge burn-ins (VERDICT r10 item 5) for the
round-10 late operators plus the round-11 additions. Run manually:
``python tools/burnin_r11.py [name]`` with name in {jaccard_floor,
gq_groups, mi_card, pngram8, hh_adversarial, ks_distinct, te_cats,
late_ops, rank_stats} (default: all). Results are transcribed into PLANS.md.

Contract boundaries exercised:

- **jaccard_floor**: jaccard_join threshold sweep t in {0.8, 0.5,
  0.3, 0.2} on 20k docs — PPJoin's prefix length is
  |S| - ceil(t|S|) + 1, so t -> 0 pushes the prefix toward the whole
  set and candidate volume toward all-pairs. Measures candidate-pair
  growth to document the practical floor.
- **gq_groups**: group_quantiles(exact=False) over 2M distinct
  groups — one GK sketch PER GROUP in a combinable agg; verifies the
  state stays map-side-mergeable and the job completes sanely.
- **mi_card**: mutual_information with |X| = 1M joint cells over 20M
  rows — the joint frame is cardinality-bounded, windows run over it,
  no collect anywhere.
- **pngram8**: path_ngrams n=8 over one hot key carrying 20% of 4M
  rows — eight stacked lead() columns in ONE window pass; the hot
  key serializes through one task by contract (documented), must
  finish in minutes, not hours.
- **hh_adversarial**: heavy_hitters on 20M rows / ~1M distinct with
  capacity exactly ceil(1/phi) — constant decrement churn; exactness
  re-verified against a groupBy ground truth.
- **ks_distinct**: ks_test_2sample with ~10M all-distinct values —
  the census is corpus-sized; the distributed prefix sum must hold
  (the spearman discipline at KS's contract edge).
- **te_cats**: target_encode with 1M categories x 5 folds — the
  summary is 5M rows; AQE must pick a sane join (broadcast or keyed)
  and the row join must not collapse.
- **late_ops**: benford over 100M rows (pure-expression bucket agg);
  MAD outliers with one group = 20% of 20M rows (two spill-aware
  percentile passes); ACF at max_lag=20 on a 800k-row hot key (21
  lag columns, ONE window operator); last-touch attribution with a
  hot user = 20% of 20M rows (running O(1) carry).
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


def burnin_jaccard_floor(spark):
    from tablite_spark.pipeline.dedup import jaccard_join
    print("== jaccard_join threshold floor: 20k docs, 30-token docs "
          "from a 2k-token vocab, planted twins ==")
    n = 20_000
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", F.transform(
            F.sequence(F.lit(1), F.lit(30)),
            lambda i: F.concat(F.lit("w"),
                               ((F.col("id") * 37 + i * 101) % 2000)
                               .cast("string")))).alias("text"))
    # plant 100 identical twins (doc i copies doc i+n via same seed)
    twins = docs.filter(F.col("doc_id") < 100).select(
        (F.col("doc_id") + n).alias("doc_id"), "text")
    docs = docs.unionByName(twins).persist()
    print(f"    corpus: {docs.count()} docs")
    for t in (0.8, 0.5, 0.3, 0.2):
        t0 = time.time()
        out = jaccard_join(docs, "text", "doc_id", threshold=t)
        cnt = out.count()
        _t(f"t={t}: {cnt} pairs", t0)
    docs.unpersist()


def burnin_gq_groups(spark):
    from tablite_spark.operators.stats import group_quantiles
    print("== group_quantiles GK sketch over 2M distinct groups, "
          "20M rows ==")
    t0 = time.time()
    df = spark.range(20_000_000).select(
        (F.col("id") % 2_000_000).alias("g"),
        (F.col("id") * 2654435761 % 1_000_003).cast("double")
        .alias("v"))
    out = group_quantiles(df, ["g"], "v", [0.5, 0.9], exact=False)
    n = out.count()
    _t(f"approx quantiles rows={n}", t0)
    assert n == 4_000_000, n


def burnin_mi_card(spark):
    from tablite_spark.operators.stats import mutual_information
    print("== mutual_information, 1M joint cells over 20M rows ==")
    t0 = time.time()
    df = spark.range(20_000_000).select(
        (F.col("id") % 1000).alias("x"),
        ((F.col("id") * 7919) % 1000).alias("y"))
    r = mutual_information(df, "x", "y").collect()[0]
    _t(f"n={r['n']} mi={r['mi_nats']:.4f}", t0)
    assert r["n"] == 20_000_000


def burnin_pngram8(spark):
    from tablite_spark.operators.timeseries import path_ngrams
    print("== path_ngrams n=8, hot key = 20% of 4M rows ==")
    t0 = time.time()
    df = spark.range(4_000_000).select(
        F.when(F.col("id") % 5 == 0, F.lit(0))
        .otherwise(F.col("id") % 40_000).alias("user_id"),
        F.concat(F.lit("s"), (F.col("id") % 7).cast("string"))
        .alias("event_type"),
        F.timestamp_seconds(F.col("id")).alias("ts"),
        F.col("id").alias("event_id"))
    out = path_ngrams(df, "user_id", "event_type", "ts", n=8, k=25,
                      tiebreak="event_id")
    rows = out.collect()
    _t(f"top-{len(rows)} 8-grams", t0)
    # 7 cyclic states yield few DISTINCT 8-grams; the burn-in
    # measures the hot-key window pass, not the top-k fill
    assert 1 <= len(rows) <= 25


def burnin_hh_adversarial(spark):
    from tablite_spark.operators.frequency import heavy_hitters
    print("== heavy_hitters: 20M rows, ~1M distinct tail, "
          "capacity=ceil(1/phi) exactly ==")
    t0 = time.time()
    # 10 planted hitters at ~2% each (> phi=0.01), 80% long tail
    df = spark.range(20_000_000).select(
        F.when(F.col("id") % 5 < 1,
               F.concat(F.lit("hot"),
                        (F.col("id") % 10).cast("string")))
        .otherwise(F.concat(F.lit("t"), (F.col("id") % 997_001)
                            .cast("string"))).alias("tok"))
    out = heavy_hitters(df, "tok", phi=0.01, capacity=100)
    got = sorted(r["value"] for r in out.collect())
    t0 = _t(f"MG two-pass: {len(got)} hitters", t0)
    truth = (df.groupBy("tok").count()
             .filter(F.col("count") > 0.01 * 20_000_000)
             .collect())
    _t(f"groupBy ground truth: {len(truth)} hitters", t0)
    assert got == sorted(r["tok"] for r in truth), got


def burnin_ks_distinct(spark):
    from tablite_spark.operators.stats import ks_test_2sample
    print("== ks_test_2sample: 10M rows, all-distinct values ==")
    t0 = time.time()
    df = spark.range(10_000_000).select(
        F.when(F.col("id") % 2 == 0, F.lit("a")).otherwise("b")
        .alias("g"),
        (F.col("id") * 2654435761 % 4_000_000_063).cast("double")
        .alias("v"))
    r = ks_test_2sample(df, "g", "v", "a", "b").collect()[0]
    _t(f"d={r['d_stat']:.6f} p={r['p_value']:.4f}", t0)
    assert r["n_a"] == 5_000_000 and r["n_b"] == 5_000_000


def burnin_te_cats(spark):
    from tablite_spark.pipeline.features import target_encode
    print("== target_encode: 1M categories x 5 folds over 20M "
          "rows ==")
    t0 = time.time()
    df = spark.range(20_000_000).select(
        F.col("id"),
        F.concat(F.lit("c"), (F.col("id") % 1_000_000)
                 .cast("string")).alias("cat"),
        (F.col("id") % 1009).cast("double").alias("t"))
    out = target_encode(df, "cat", "t", "id", folds=5,
                        smoothing=20.0)
    n = out.filter(F.col("cat_te").isNotNull()).count()
    _t(f"encoded rows={n}", t0)
    assert n == 20_000_000, n


ALL = {
    "jaccard_floor": burnin_jaccard_floor,
    "gq_groups": burnin_gq_groups,
    "mi_card": burnin_mi_card,
    "pngram8": burnin_pngram8,
    "hh_adversarial": burnin_hh_adversarial,
    "ks_distinct": burnin_ks_distinct,
    "te_cats": burnin_te_cats,
}



def burnin_late_ops(spark):
    """Hot-key / volume edges for the r11-late operators."""
    import datetime as dt  # noqa: F401
    from tablite_spark.operators.stats import (
        benford_digits, group_outliers,
    )
    from tablite_spark.operators.timeseries import (
        attribute_conversions, cross_correlation,
    )
    print("== benford over 100M rows (pure-expression 9-bucket "
          "agg) ==")
    t0 = time.time()
    df = spark.range(100_000_000).select(
        ((F.col("id") % 99_991 + 1) * 1.37).alias("v"))
    rows = benford_digits(df, "v").collect()
    t0 = _t(f"{len(rows)} digit rows", t0)

    print("== MAD outliers: 20M rows, one group = 20% (two "
          "spill-aware percentile passes) ==")
    df = spark.range(20_000_000).select(
        F.when(F.col("id") % 5 == 0, F.lit("hot"))
        .otherwise((F.col("id") % 1000).cast("string")).alias("g"),
        (F.col("id") * 2654435761 % 1_000_003).cast("double")
        .alias("v"))
    out = group_outliers(df, ["g"], "v", method="mad",
                         threshold=3.0)
    n = out.filter(F.col("is_outlier")).count()
    t0 = _t(f"mad outliers flagged={n}", t0)

    print("== ACF max_lag=20, hot key = 20% of 4M rows (21 lag "
          "columns, ONE window pass) ==")
    df = spark.range(4_000_000).select(
        F.when(F.col("id") % 5 == 0, F.lit(0))
        .otherwise(F.col("id") % 40_000).alias("u"),
        F.timestamp_seconds(F.col("id")).alias("ts"),
        (F.col("id") % 97).cast("double").alias("v"),
        F.col("id").alias("eid"))
    rows = cross_correlation(df, "u", "ts", "v", "v", max_lag=20,
                             tiebreak="eid").collect()
    t0 = _t(f"{len(rows)} lag rows", t0)
    assert len(rows) == 21

    print("== attribution: hot user = 20% of 20M rows (running "
          "carry, O(1)-incremental) ==")
    df = spark.range(20_000_000).select(
        F.when(F.col("id") % 5 == 0, F.lit(0))
        .otherwise(F.col("id") % 100_000).alias("u"),
        F.timestamp_seconds(F.col("id")).alias("ts"),
        F.element_at(F.array(F.lit("view"), F.lit("click"),
                             F.lit("purchase"), F.lit("idle")),
                     (F.col("id") % 4 + 1).cast("int")).alias("t"),
        (F.col("id") % 13).cast("double").alias("v"),
        F.col("id").alias("eid"))
    out = attribute_conversions(df, "u", "ts", "t", "v",
                                "purchase", ["view", "click"],
                                tiebreak="eid")
    rows = out.collect()
    _t(f"{len(rows)} channels", t0)


ALL["late_ops"] = burnin_late_ops


def burnin_rank_stats(spark):
    """AUC and Kaplan-Meier at corpus-scale distinct values — the
    bucketed-prefix-sum machinery at its contract edge (census is
    corpus-sized, like ks_distinct)."""
    from tablite_spark.operators.stats import km_curve
    from tablite_spark.pipeline.evaluation import binary_auc
    print("== binary_auc: 10M rows, ~all-distinct scores ==")
    t0 = time.time()
    df = spark.range(10_000_000).select(
        ((F.col("id") * 2654435761 % 4_000_000_063)
         .cast("double") / 4e9).alias("s"),
        (F.col("id") % 3 == 0).alias("y"))
    r = binary_auc(df, "s", "y").collect()[0]
    t0 = _t(f"auc={r['auc']:.6f} n_pos={r['n_pos']}", t0)
    print("== km_curve: 10M rows, ~all-distinct durations ==")
    df = spark.range(10_000_000).select(
        (F.col("id") * 2654435761 % 4_000_000_063)
        .cast("double").alias("d"),
        (F.col("id") % 10 != 0).alias("obs"))
    n = km_curve(df, "d", "obs").count()
    _t(f"km event rows={n}", t0)


ALL["rank_stats"] = burnin_rank_stats



def burnin_quality_ops(spark):
    """Round-11 late additions at their contract edges: CUSUM over a
    20M-point all-distinct census (corpus-sized prefix sum);
    expectations with 12 rules over 50M rows (must stay ONE scan);
    feature_scale robust on 20M rows exact vs sketch (the exact
    percentile single-buffer wall vs the 100 TB valve)."""
    import time

    from tablite_spark.operators.expect import expectations
    from tablite_spark.operators.timeseries import cusum_changepoint
    from tablite_spark.pipeline.features import feature_scale
    print("[burnin] quality_ops")
    t0 = time.time()
    big = spark.range(0, 20_000_000, 1, 32).select(
        F.col("id").cast("double").alias("t"),
        (F.sin(F.col("id") / 1e5)
         + F.when(F.col("id") > 12_000_000, 2.0).otherwise(0.0)
         ).alias("x"))
    r = cusum_changepoint(big, "t", "x").collect()[0]
    assert 11_900_000 < r["cp_index"] <= 12_000_001, r
    t0 = _t("cusum 20M distinct census", t0)

    wide = spark.range(0, 50_000_000, 1, 32).select(
        F.col("id"),
        (F.col("id") % 97).cast("double").alias("v"),
        F.concat(F.lit("u"), (F.col("id") % 1000)).alias("s"))
    rules = ([{"rule": f"v_min_{k}", "column": "v", "check": "min",
               "value": float(k)} for k in range(10)]
             + [{"rule": "s_regex", "column": "s", "check": "regex",
                 "pattern": "^u[0-9]+$"},
                {"rule": "id_unique", "column": "id",
                 "check": "unique"}])
    out = expectations(wide, rules).collect()
    assert len(out) == 12
    assert next(o for o in out
                if o["rule"] == "id_unique")["violations"] == 0
    t0 = _t("expectations 12 rules x 50M rows", t0)

    feat = spark.range(0, 20_000_000, 1, 32).select(
        F.col("id"), (F.col("id") % 100_000).cast("double")
        .alias("x"))
    feature_scale(feat, ["x"], method="robust",
                  exact=False).agg(F.avg("x_scaled")).collect()
    t0 = _t("feature_scale robust sketch 20M", t0)
    feature_scale(feat, ["x"], method="robust",
                  exact=True).agg(F.avg("x_scaled")).collect()
    t0 = _t("feature_scale robust EXACT 20M (single-buffer wall)", t0)


ALL["quality_ops"] = burnin_quality_ops


def burnin_quality_ops2(spark):
    """Second r11 late batch at contract edges: weighted quantiles
    over a 10M-distinct census (corpus-sized prefix sum); seasonal
    anomalies over 100M rows (must stay TWO scans); bigram LM over a
    40M-token synthetic corpus (row-local pair build + two censuses
    + keyed scoring joins)."""
    import time

    from tablite_spark.operators.stats import (seasonal_anomalies,
                                               weighted_quantiles)
    from tablite_spark.pipeline.text import bigram_lm_scores
    print("[burnin] quality_ops2")
    t0 = time.time()
    wq = spark.range(0, 10_000_000, 1, 32).select(
        F.col("id").cast("double").alias("v"),
        (F.col("id") % 7 + 1).cast("double").alias("w"))
    rows = weighted_quantiles(wq, "v", "w",
                              [0.25, 0.5, 0.9, 0.99]).collect()
    assert len(rows) == 4
    med = next(r["value"] for r in rows if r["q"] == 0.5)
    assert 4_900_000 < med < 5_100_000, med
    t0 = _t("weighted_quantiles 10M distinct census", t0)

    sa = spark.range(0, 100_000_000, 1, 32).select(
        F.col("id"),
        F.timestamp_seconds(1_700_000_000 + F.col("id") * 60)
        .alias("ts"),
        ((F.col("id") % 24) * 10.0
         + (F.col("id") % 7).cast("double")).alias("x"))
    n = seasonal_anomalies(sa, "ts", "x", period="hour",
                           k=6.0).count()
    assert n == 0, n     # pure seasonal + bounded noise: no 6-sigma
    t0 = _t("seasonal_anomalies 100M rows (2 scans)", t0)

    docs = spark.range(0, 200_000, 1, 32).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", F.transform(
            F.sequence(F.lit(1), F.lit(200)),
            lambda i: F.concat(F.lit("w"),
                               F.conv(F.substring(F.md5(
                                   F.concat(F.col("id"), F.lit("_"),
                                            i)), 1, 4), 16, 10)
                               % 10_000))).alias("text"))
    out = bigram_lm_scores(docs, "text", "doc_id", k=0.5)
    cnt = out.count()
    assert cnt == 200_000, cnt
    t0 = _t("bigram_lm 200k docs x 200 tokens (40M bigrams)", t0)


ALL["quality_ops2"] = burnin_quality_ops2


def burnin_quality_ops3(spark):
    """Fourth-wave burn-ins: log-rank over a 10M-distinct census
    (prefix-sum at-risk counts at the KS contract edge); PSI with a
    100M-row live side (two corpus scans, bounded census); group
    CUSUM with one key carrying 20% of 10M rows (per-key census
    serialization contract); per-column entropy over 5 columns x 20M
    rows in ONE scan; session_summary with a hot user = 20% of 10M
    events; PMI + ranking metrics at 200k docs / 2k queries."""
    import time

    from tablite_spark.operators.stats import (column_entropy,
                                               logrank_test,
                                               psi_drift)
    from tablite_spark.operators.timeseries import (group_cusum,
                                                    session_summary)
    from tablite_spark.pipeline.evaluation import ranking_metrics
    print("[burnin] quality_ops3")
    t0 = time.time()
    lr = spark.range(0, 10_000_000, 1, 32).select(
        (F.col("id") + (F.col("id") % 2) * 0.5).alias("d"),
        (F.col("id") % 10 != 0).alias("obs"),
        (F.col("id") % 2).cast("int").alias("g"))
    r = logrank_test(lr, "d", "obs", "g").collect()[0]
    assert r["n_a"] == 5_000_000 and r["chi2"] is not None
    t0 = _t("logrank 10M distinct census", t0)

    base = spark.range(0, 1_000_000, 1, 32).select(
        (F.col("id") % 1000).cast("double").alias("x"))
    live = spark.range(0, 100_000_000, 1, 32).select(
        ((F.col("id") * 7) % 1000).cast("double").alias("x"))
    p = psi_drift(base, live, "x", bins=10).collect()[0]
    assert abs(p["psi"]) < 0.01, p   # same distribution -> ~0
    t0 = _t("psi 1M baseline vs 100M live", t0)

    gc = spark.range(0, 10_000_000, 1, 32).select(
        F.when(F.col("id") % 5 == 0, "hot")
        .otherwise((F.col("id") % 97).cast("string")).alias("g"),
        F.col("id").cast("double").alias("t"),
        F.when(F.col("id") > 8_000_000, 3.0).otherwise(1.0)
        .alias("x"))
    out = group_cusum(gc, ["g"], "t", "x").count()
    assert out == 98, out
    t0 = _t("group_cusum hot key 20% of 10M", t0)

    ec = spark.range(0, 20_000_000, 1, 32).select(
        *[((F.col("id") * k) % (10 ** k)).cast("string")
          .alias(f"c{k}") for k in range(1, 6)])
    ents = column_entropy(ec, [f"c{k}" for k in range(1, 6)])
    assert ents.count() == 5
    t0 = _t("column_entropy 5 cols x 20M one scan", t0)

    ss = spark.range(0, 10_000_000, 1, 32).select(
        F.when(F.col("id") % 5 == 0, F.lit(7))
        .otherwise(F.col("id") % 100_000).alias("user_id"),
        F.timestamp_seconds(1_700_000_000 + F.col("id") * 3)
        .alias("ts"),
        (F.col("id") % 4).cast("string").alias("event_type"),
        F.col("id").alias("event_id"))
    n = session_summary(ss, "user_id", "ts", "event_type",
                        tiebreak="event_id").count()
    assert n == 4, n
    t0 = _t("session_summary hot user 20% of 10M", t0)

    rk = spark.range(0, 2_000_000, 1, 32).select(
        (F.col("id") % 2000).alias("q"), F.col("id").alias("i"),
        ((F.col("id") * 13) % 9973).cast("double").alias("s"),
        (F.col("id") % 7 == 0).cast("int").alias("rel"))
    m = ranking_metrics(rk, "q", "i", "s", "rel", k=10).collect()[0]
    assert m["n_queries"] == 2000
    t0 = _t("ranking_metrics 2k queries x 1k candidates", t0)


ALL["quality_ops3"] = burnin_quality_ops3


def burnin_quality_ops4(spark):
    """Sixth-wave burn-ins: Poisson bootstrap at 10M rows x 100
    resamples (1B exploded pairs MUST collapse map-side — the
    shuffle carries <=100·tasks rows); association rules with a hot
    basket of 2000 items (4M pair fan-out from ONE basket, bounded
    |basket|² contract); additive seasonal over 100M rows (one
    GROUPING SETS model scan + one residual scan); windowed funnel
    at 20M events."""
    import time

    from tablite_spark.operators.frequency import association_rules
    from tablite_spark.operators.stats import bootstrap_ci
    from tablite_spark.operators.timeseries import (additive_seasonal,
                                                    funnel)
    print("[burnin] quality_ops4")
    t0 = time.time()
    bs = spark.range(0, 10_000_000, 1, 32).select(
        F.col("id"), ((F.col("id") * 13) % 1000).cast("double")
        .alias("x"))
    r = bootstrap_ci(bs, "x", "id", n_resamples=100).collect()[0]
    assert r["lo"] < r["estimate"] < r["hi"]
    assert (r["hi"] - r["lo"]) < 1.0, r   # 10M rows: tight CI
    t0 = _t("bootstrap 10M x 100 resamples (1B weighted rows)", t0)

    # 100k normal baskets each holding items 0..9 (dense pair
    # support) + ONE hot basket with 2000 distinct singleton items
    # (4M-pair fan-out from a single basket — the |basket|² stress;
    # the first fixture accidentally collapsed items mod 2000 to a
    # single value per basket and produced zero rules)
    ar = spark.range(0, 1_000_000, 1, 32).select(
        F.when(F.col("id") < 2000, F.lit(0))
        .otherwise(F.col("id") % 100_000).alias("bk"),
        F.when(F.col("id") < 2000, 1000 + F.col("id"))
        .otherwise(F.floor(F.col("id") / 100_000)).alias("it"))
    n = association_rules(ar, "bk", "it", min_support=3,
                          k=50).count()
    assert n == 50, n
    t0 = _t("association rules, hot basket 2000 items", t0)

    sa = spark.range(0, 100_000_000, 1, 32).select(
        F.col("id"),
        F.timestamp_seconds(1_700_000_000 + F.col("id") * 60)
        .alias("ts"),
        ((F.col("id") % 24) * 5.0 + (F.col("id") % 7) * 2.0
         + (F.col("id") % 11).cast("double")).alias("x"))
    cnt = additive_seasonal(sa, "ts", "x", k=6.0).count()
    assert cnt == 0, cnt
    t0 = _t("additive_seasonal 100M rows (2 scans)", t0)

    fw = spark.range(0, 20_000_000, 1, 32).select(
        (F.col("id") % 1_000_000).alias("user_id"),
        F.timestamp_seconds(1_700_000_000 + F.col("id") * 7)
        .alias("ts"),
        F.element_at(F.array(F.lit("view"), F.lit("click"),
                             F.lit("purchase"), F.lit("other")),
                     (F.col("id") % 4 + 1).cast("int"))
        .alias("event_type"))
    got = funnel(fw, ["view", "click", "purchase"],
                 within_seconds=3600).count()
    assert got > 0
    t0 = _t("windowed funnel 20M events", t0)


ALL["quality_ops4"] = burnin_quality_ops4


def burnin_quality_ops5(spark):
    """Seventh-wave burn-ins: active_users at 30M events / 1M
    users x 30 days (30M distinct pairs x 28 = 840M exploded rows
    must collapse into the per-day count-distinct); category_index
    at a 1M-category vocab (the bounded-census global window at its
    practical edge); quantile_discretize at 50M rows exact vs
    sketch."""
    import time

    from tablite_spark.operators.timeseries import active_users
    from tablite_spark.pipeline.features import (category_index,
                                                 quantile_discretize)
    print("[burnin] quality_ops5", flush=True)
    t0 = time.time()
    # consecutive ids 30k..30k+29 are ONE user's 30 daily events:
    # every user is active every day, so au_1 == 1M users/day
    # (the first fixture mixed user and day through the same id
    # residues and no user hit more than ~3 distinct days)
    au = spark.range(0, 30_000_000, 1, 32).select(
        F.floor(F.col("id") / 30).alias("user_id"),
        F.timestamp_seconds(1_700_000_000
                            + (F.col("id") % 30) * 86_400)
        .alias("ts"))
    rows = active_users(au, "ts", "user_id",
                        windows=(1, 7, 28)).collect()
    assert len(rows) == 30
    assert all(r["au_1"] == 1_000_000 for r in rows), rows[:3]
    t0 = _t("active_users 100M events (840M exploded pairs)", t0)

    ci = spark.range(0, 20_000_000, 1, 32).select(
        F.concat(F.lit("c"), (F.col("id") % 1_000_000))
        .alias("cat"))
    out = category_index(ci, ["cat"])
    n = out.filter(F.col("cat_idx").isNotNull()).count()
    assert n == 20_000_000
    t0 = _t("category_index 1M-category vocab x 20M rows", t0)

    qd = spark.range(0, 50_000_000, 1, 32).select(
        ((F.col("id") * 13) % 100_000).cast("double").alias("x"))
    quantile_discretize(qd, ["x"], bins=10, exact=False) \
        .groupBy("x_bin").count().collect()
    t0 = _t("quantile_discretize 50M sketch", t0)
    quantile_discretize(qd, ["x"], bins=10, exact=True) \
        .groupBy("x_bin").count().collect()
    t0 = _t("quantile_discretize 50M EXACT (single-buffer wall)", t0)


ALL["quality_ops5"] = burnin_quality_ops5

if __name__ == "__main__":
    names = sys.argv[1:] or list(ALL)
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    for nm in names:
        ALL[nm](spark)
    print("BURNIN r11 done")
