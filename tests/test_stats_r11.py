"""Round-11 operators: KS test, chi-squared independence, equi-depth
histogram, exact Misra-Gries heavy hitters, Markov transitions,
out-of-fold target encoding."""

import pytest
from pyspark.sql import functions as F


def _ecdf_ks(a, b):
    import numpy as np
    pooled = np.unique(np.concatenate([a, b]))
    fa = np.searchsorted(np.sort(a), pooled, side="right") / len(a)
    fb = np.searchsorted(np.sort(b), pooled, side="right") / len(b)
    return float(np.max(np.abs(fa - fb)))


def test_ks_matches_numpy_replay_with_ties(spark):
    a = [1.0, 2.0, 2.0, 3.0, 5.0, 8.0, 8.0, 9.0, 2.5, 4.5]
    b = [1.5, 2.0, 3.5, 6.0, 6.0, 7.0, 9.5, 2.0]
    rows = ([("a", v) for v in a] + [("b", v) for v in b]
            + [("a", None), ("c", 99.0)])
    df = spark.createDataFrame(rows, "g string, v double")
    from tablite_spark.operators.stats import ks_test_2sample
    r = ks_test_2sample(df, "g", "v", "a", "b").collect()[0]
    assert r["n_a"] == 10 and r["n_b"] == 8
    assert abs(r["d_stat"] - _ecdf_ks(a, b)) < 1e-15
    # Kolmogorov series replay
    import math
    lam = r["d_stat"] * math.sqrt(10 * 8 / 18)
    p = 2 * sum((1 if j % 2 else -1)
                * math.exp(-2 * j * j * lam * lam)
                for j in range(1, 101))
    assert abs(r["p_value"] - min(1.0, max(0.0, p))) < 1e-12
    # layout-independent (distributed prefix sum)
    r2 = ks_test_2sample(df.repartition(7), "g", "v",
                         "a", "b").collect()[0]
    assert r2["d_stat"] == r["d_stat"]
    with pytest.raises(ValueError, match="no non-null"):
        ks_test_2sample(df, "g", "v", "a", "zzz").collect()


def test_chi2_matches_numpy_replay(spark):
    import numpy as np
    rows = [("x1", "y1")] * 30 + [("x1", "y2")] * 10 \
        + [("x2", "y1")] * 5 + [("x2", "y2")] * 25 \
        + [(None, "y1"), ("x1", None)]
    df = spark.createDataFrame(rows, "x string, y string")
    from tablite_spark.operators.stats import chi2_independence
    r = chi2_independence(df, "x", "y").collect()[0]
    obs = np.array([[30.0, 10.0], [5.0, 25.0]])
    n = obs.sum()
    exp = np.outer(obs.sum(1), obs.sum(0)) / n
    chi2 = float(((obs - exp) ** 2 / exp).sum())
    assert r["n"] == 70 and r["dof"] == 1
    assert abs(r["chi2"] - chi2) < 1e-10
    assert abs(r["cramers_v"]
               - (chi2 / (n * 1)) ** 0.5) < 1e-12
    # perfectly independent layout -> chi2 0
    rows2 = [(i % 2, (i // 2) % 3) for i in range(60)]
    df2 = spark.createDataFrame(rows2, "x int, y int")
    r2 = chi2_independence(df2, "x", "y").collect()[0]
    assert abs(r2["chi2"]) < 1e-10
    # constant column -> dof 0, V NULL (no division error)
    df3 = spark.createDataFrame([(1, i % 3) for i in range(9)],
                                "x int, y int")
    r3 = chi2_independence(df3, "x", "y").collect()[0]
    assert r3["dof"] == 0 and r3["cramers_v"] is None


def test_chi2_single_scan_reused_exchange(spark):
    from tablite_spark.operators.stats import chi2_independence
    df = spark.createDataFrame(
        [(i % 3, i % 5) for i in range(300)], "x int, y int")
    out = chi2_independence(df, "x", "y")
    out.collect()
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))
    assert "isFinalPlan=true" in plan
    assert plan.count("ReusedExchange") >= 1, plan[:2000]


def test_equi_depth_histogram(spark):
    import numpy as np
    vals = [float(v) for v in range(1, 101)]
    df = spark.createDataFrame([(v,) for v in vals] + [(None,)],
                               "v double")
    from tablite_spark.operators.stats import equi_depth_histogram
    out = equi_depth_histogram(df, "v", bins=4).collect()
    assert [r["bin"] for r in out] == [0, 1, 2, 3]
    assert sum(r["n_rows"] for r in out) == 100
    edges = np.percentile(np.array(vals), [25, 50, 75],
                          method="linear")
    # value == edge goes to the LOWER bucket
    for r in out:
        if r["bin"] < 3:
            assert r["hi"] <= edges[r["bin"]] + 1e-12
        if r["bin"] > 0:
            assert r["lo"] > edges[r["bin"] - 1]
    # near-equal depth on a continuous column
    assert all(20 <= r["n_rows"] <= 30 for r in out)
    with pytest.raises(ValueError, match="bins"):
        equi_depth_histogram(df, "v", bins=1)
    empty = spark.createDataFrame([(None,)], "v double")
    with pytest.raises(ValueError, match="no non-null"):
        equi_depth_histogram(empty, "v", bins=4)


def test_heavy_hitters_exact_under_tiny_capacity(spark):
    """Capacity far below the distinct count forces constant MG
    decrement rounds; the result must STILL be exact (two-pass
    guarantee), across partitionings."""
    import collections
    import random
    rng = random.Random(11)
    # zipf-ish: token t_i with weight ~ 1/i over 400 distinct
    pool = [f"t{i}" for i in range(1, 401) for _ in range(400 // i)]
    data = [pool[rng.randrange(len(pool))] for _ in range(20000)]
    truth = collections.Counter(data)
    n = len(data)
    phi = 0.01
    want = sorted((t, c) for t, c in truth.items() if c > phi * n)
    from tablite_spark.operators.frequency import heavy_hitters
    for parts in (3, 17):
        df = spark.createDataFrame([(t,) for t in data],
                                   "tok string").repartition(parts)
        got = sorted((r["value"], r["cnt"]) for r in
                     heavy_hitters(df, "tok", phi,
                                   capacity=100).collect())
        assert got == want, (parts, len(got), len(want))
    # shares are cnt/N
    one = heavy_hitters(spark.createDataFrame(
        [(t,) for t in data] + [(None,)], "tok string"),
        "tok", phi).collect()
    for r in one:
        assert abs(r["share"] - r["cnt"] / n) < 1e-15
    with pytest.raises(ValueError, match="phi"):
        heavy_hitters(df, "tok", 0.0)
    with pytest.raises(ValueError, match="capacity"):
        heavy_hitters(df, "tok", 0.01, capacity=10)


def test_markov_transitions_hand_chain(spark):
    import datetime as dt
    t0 = dt.datetime(2024, 1, 1)
    seq = {"u1": ["a", "b", "a", "b"], "u2": ["a", "a", "c"],
           "u3": ["b", None, "c"]}        # NULL breaks the chain
    rows = [(u, s, t0 + dt.timedelta(minutes=i), i + ord(u[1]))
            for u, states in seq.items()
            for i, s in enumerate(states)]
    df = spark.createDataFrame(
        rows, "u string, s string, ts timestamp, eid int")
    from tablite_spark.operators.timeseries import markov_transitions
    out = {(r["state"], r["next_state"]): (r["n"], r["p"]) for r in
           markov_transitions(df, "u", "s", "ts",
                              tiebreak="eid").collect()}
    # u1: a->b, b->a, a->b ; u2: a->a, a->c ; u3: nothing (NULL)
    assert out[("a", "b")][0] == 2
    assert out[("b", "a")][0] == 1
    assert out[("a", "a")][0] == 1
    assert out[("a", "c")][0] == 1
    assert ("b", None) not in out and (None, "c") not in out
    assert abs(out[("a", "b")][1] - 2 / 4) < 1e-15
    assert abs(out[("b", "a")][1] - 1.0) < 1e-15
    assert sum(n for (s, _), (n, _) in out.items() if s == "a") == 4


def test_target_encode_leakage_free_replay(spark):
    """Encoding must equal the pandas replay of the out-of-fold
    formula and must NOT contain the row's own target."""
    import pandas as pd
    rows = [(i, ["p", "q", "r"][i % 3], float(i * 7 % 23))
            for i in range(60)]
    rows += [(60, None, 5.0), (61, "p", None)]
    df = spark.createDataFrame(rows, "id long, cat string, t double")
    from tablite_spark.pipeline.features import target_encode
    out = target_encode(df, "cat", "t", "id", folds=4,
                        smoothing=10.0)
    got = {r["id"]: r["cat_te"] for r in out.collect()}
    pdf = pd.DataFrame(rows, columns=["id", "cat", "t"])
    pdf["fold"] = pdf["id"] % 4
    for _, row in pdf.iterrows():
        cat, fold = row["cat"], row["fold"]
        own = (pdf["cat"].isna() if pd.isna(cat)
               else pdf["cat"] == cat)
        oof = pdf[own & (pdf["fold"] != fold)]
        pr = pdf[pdf["fold"] != fold]
        prior = pr["t"].sum() / pr["t"].count()
        want = ((oof["t"].sum() + 10.0 * prior)
                / (oof["t"].count() + 10.0))
        assert abs(got[row["id"]] - want) < 1e-12, row["id"]
    # category confined to one fold + smoothing 0 -> NULL, no error
    df2 = spark.createDataFrame(
        [(0, "only", 1.0), (4, "only", 2.0), (1, "z", 3.0),
         (2, "z", 4.0)], "id long, cat string, t double")
    out2 = {r["id"]: r["cat_te"] for r in
            target_encode(df2, "cat", "t", "id", folds=4,
                          smoothing=0.0).collect()}
    assert out2[0] is None and out2[4] is None
    assert out2[1] is not None
    with pytest.raises(ValueError, match="folds"):
        target_encode(df2, "cat", "t", "id", folds=1)


def test_ks_tiny_lambda_branch(spark):
    """Near-identical samples (lambda < 0.2) must report p = 1.0
    exactly — the truncated alternating series is invalid there
    (the 10M burn-in found p=0.59 where truth is ~1)."""
    rows = ([("a", float(i)) for i in range(200)]
            + [("b", float(i) + 0.001) for i in range(200)])
    df = spark.createDataFrame(rows, "g string, v double")
    from tablite_spark.operators.stats import ks_test_2sample
    r = ks_test_2sample(df, "g", "v", "a", "b").collect()[0]
    import math
    lam = r["d_stat"] * math.sqrt(200 * 200 / 400)
    assert lam < 0.2, lam
    assert r["p_value"] == 1.0


def test_mad_outliers_matches_numpy_replay(spark):
    """MAD fence must match a numpy replay; the robust fence flags
    what zscore misses when the outlier inflates sigma."""
    import numpy as np
    base = [10.0, 10.5, 9.5, 10.2, 9.8, 10.1, 9.9, 10.3, 9.7, 500.0]
    rows = ([("a", v) for v in base] + [("b", 5.0)] * 4
            + [("a", None)])
    df = spark.createDataFrame(rows, "g string, v double")
    from tablite_spark.operators.stats import group_outliers
    out = group_outliers(df, ["g"], "v", method="mad",
                         threshold=3.0).collect()
    flags = {(r["g"], r["v"]): r["is_outlier"] for r in out}
    a = np.array(base)
    med = np.percentile(a, 50, method="linear")
    mad = np.percentile(np.abs(a - med), 50, method="linear")
    for v in base:
        want = bool(abs(v - med) > 3.0 * 1.4826 * mad)
        assert flags[("a", v)] == want, v
    assert flags[("a", 500.0)] is True
    assert flags[("b", 5.0)] is False       # MAD 0 -> flags nothing
    assert flags[("a", None)] is None


def test_benford_shares_and_chi2(spark):
    """Digit extraction, shares, Benford expectations and chi2 terms
    must match the closed formula; non-positive values excluded."""
    import math
    vals = ([1.5] * 30 + [2.5] * 18 + [3.5] * 12 + [45.0] * 10
            + [567.0] * 8 + [0.0065] * 7 + [7e3] * 6 + [0.85] * 5
            + [9.1] * 4 + [-5.0, 0.0, None])
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    from tablite_spark.operators.stats import benford_digits
    out = {r["digit"]: r for r in benford_digits(df, "v").collect()}
    assert sorted(out) == list(range(1, 10))
    n = 100
    counts = {1: 30, 2: 18, 3: 12, 4: 10, 5: 8, 6: 7, 7: 6,
              8: 5, 9: 4}
    for d, c in counts.items():
        r = out[d]
        assert r["n_obs"] == c
        assert abs(r["share"] - c / n) < 1e-15
        exp = math.log10(1 + 1 / d)
        assert abs(r["benford_share"] - exp) < 1e-15
        assert abs(r["chi2_term"]
                   - n * (c / n - exp) ** 2 / exp) < 1e-10


def test_cross_correlation_matches_numpy(spark):
    """CCF at each lag must equal numpy corrcoef over the per-key
    aligned pairs; lag 0 of (x, x) is exactly 1."""
    import datetime as dt

    import numpy as np
    t0 = dt.datetime(2024, 1, 1)
    xs = {"k1": [1.0, 3.0, 2.0, 5.0, 4.0, 7.0, 6.0],
          "k2": [2.0, 1.0, 4.0, 3.0, 6.0]}
    rows = [(k, t0 + dt.timedelta(minutes=i), v, i)
            for k, vs in xs.items() for i, v in enumerate(vs)]
    df = spark.createDataFrame(
        rows, "k string, ts timestamp, v double, eid int")
    from tablite_spark.operators.timeseries import cross_correlation
    out = {r["lag"]: r for r in
           cross_correlation(df, "k", "ts", "v", "v", max_lag=2,
                             tiebreak="eid").collect()}
    assert out[0]["n"] == 12 and abs(out[0]["ccf"] - 1.0) < 1e-12
    for lag in (1, 2):
        pairs = [(seq[i], seq[i - lag]) for seq in xs.values()
                 for i in range(lag, len(seq))]
        a = np.array([p[0] for p in pairs])
        b = np.array([p[1] for p in pairs])
        want = float(np.corrcoef(a, b)[0, 1])
        assert out[lag]["n"] == len(pairs)
        assert abs(out[lag]["ccf"] - want) < 1e-12, lag
    import pytest
    with pytest.raises(ValueError, match="max_lag"):
        cross_correlation(df, "k", "ts", "v", "v", max_lag=-1)


def test_attribution_last_touch(spark):
    """Purchases credit the most recent STRICTLY-earlier touch of
    the same user; no prior touch -> NULL channel; later touches
    never leak backwards."""
    import datetime as dt
    t0 = dt.datetime(2024, 1, 1)

    def r(u, m, t, v=0.0):
        return (u, t0 + dt.timedelta(minutes=m), t, v, m)
    rows = [
        r("u1", 0, "view"), r("u1", 1, "click"),
        r("u1", 2, "purchase", 10.0),      # -> click
        r("u1", 3, "purchase", 5.0),       # still click
        r("u1", 4, "view"), r("u1", 5, "purchase", 2.0),  # -> view
        r("u2", 0, "purchase", 7.0),       # no touch -> NULL
        r("u2", 1, "signup"), r("u2", 2, "purchase", 3.0),
        r("u3", 0, "error"), r("u3", 1, "purchase", 1.0),  # -> NULL
    ]
    df = spark.createDataFrame(
        rows, "u string, ts timestamp, t string, v double, eid int")
    from tablite_spark.operators.timeseries import attribute_conversions
    out = {r["channel"]: (r["n_conversions"], r["attributed_value"])
           for r in attribute_conversions(
               df, "u", "ts", "t", "v", "purchase",
               ["view", "click", "signup"], tiebreak="eid").collect()}
    assert out["click"] == (2, 15.0)
    assert out["view"] == (1, 2.0)
    assert out["signup"] == (1, 3.0)
    assert out[None] == (2, 8.0)


def test_binary_auc_matches_sklearn_free_replay(spark):
    """AUC must equal the O(n log n) numpy replay of the tie-aware
    rank-sum identity, across partitionings; perfect separation
    gives 1.0; reversed gives 0.0; a constant score gives 0.5
    (all ties count half)."""
    import numpy as np

    from tablite_spark.pipeline.evaluation import binary_auc

    def replay(scores, labels):
        s = np.asarray(scores, dtype=float)
        y = np.asarray(labels, dtype=bool)
        order = np.argsort(s, kind="mergesort")
        ranks = np.empty(len(s))
        ss = s[order]
        i = 0
        while i < len(s):
            j = i
            while j + 1 < len(s) and ss[j + 1] == ss[i]:
                j += 1
            ranks[order[i:j + 1]] = (i + j) / 2.0 + 1.0
            i = j + 1
        np_, nn_ = y.sum(), (~y).sum()
        return (ranks[y].sum() - np_ * (np_ + 1) / 2) / (np_ * nn_)

    import random
    rng = random.Random(7)
    scores = [rng.choice([0.1, 0.25, 0.25, 0.4, 0.6, 0.6, 0.9])
              for _ in range(500)]
    labels = [rng.random() < s for s in scores]
    if not any(labels):
        labels[0] = True
    if all(labels):
        labels[1] = False
    df = spark.createDataFrame(list(zip(scores, labels)),
                               "s double, y boolean")
    for parts in (1, 9):
        r = binary_auc(df.repartition(parts), "s", "y").collect()[0]
        want = replay(scores, labels)
        assert abs(r["auc"] - want) < 1e-15, parts
        assert r["n_pos"] == sum(labels)
    # perfect / inverted / constant
    d2 = spark.createDataFrame(
        [(0.9, True)] * 5 + [(0.1, False)] * 7, "s double, y boolean")
    assert binary_auc(d2, "s", "y").collect()[0]["auc"] == 1.0
    d3 = spark.createDataFrame(
        [(0.1, True)] * 5 + [(0.9, False)] * 7, "s double, y boolean")
    assert binary_auc(d3, "s", "y").collect()[0]["auc"] == 0.0
    d4 = spark.createDataFrame(
        [(0.5, True)] * 5 + [(0.5, False)] * 7, "s double, y boolean")
    assert binary_auc(d4, "s", "y").collect()[0]["auc"] == 0.5
    import pytest
    d5 = spark.createDataFrame([(0.5, True)], "s double, y boolean")
    with pytest.raises(ValueError, match="both classes"):
        binary_auc(d5, "s", "y")


def test_calibration_and_confusion(spark):
    """Calibration bins, edge fold (score 1.0 -> top bin), the
    out-of-range guard, and the confusion metrics' formulas."""
    import pytest

    from tablite_spark.pipeline.evaluation import (
        calibration_bins, confusion_metrics,
    )
    rows = [(0.05, False), (0.06, False), (0.55, True),
            (0.58, False), (1.0, True), (0.95, True), (None, True),
            (0.5, None)]
    df = spark.createDataFrame(rows, "s double, y boolean")
    out = {r["bin"]: r for r in
           calibration_bins(df, "s", "y", bins=10).collect()}
    assert sorted(out) == [0, 5, 9]
    assert out[0]["n"] == 2 and out[0]["frac_pos"] == 0.0
    assert out[5]["n"] == 2 and out[5]["frac_pos"] == 0.5
    assert out[9]["n"] == 2 and out[9]["frac_pos"] == 1.0   # 1.0 folds
    bad = spark.createDataFrame([(1.5, True), (0.5, False)],
                                "s double, y boolean")
    with pytest.raises(ValueError, match="outside"):
        calibration_bins(bad, "s", "y")

    m = confusion_metrics(df, "s", "y", threshold=0.5).collect()[0]
    assert (m["tp"], m["fp"], m["tn"], m["fn"]) == (3, 1, 2, 0)
    assert abs(m["precision"] - 3 / 4) < 1e-15
    assert m["recall"] == 1.0
    assert abs(m["f1"] - 2 * 0.75 / 1.75) < 1e-15
    assert abs(m["accuracy"] - 5 / 6) < 1e-15
    # degenerate: no predicted positives -> NULL precision/f1
    m2 = confusion_metrics(df, "s", "y", threshold=2.0).collect()[0]
    assert m2["precision"] is None and m2["f1"] is None


def test_group_ols_matches_numpy(spark):
    import numpy as np

    from tablite_spark.operators.stats import group_ols
    x = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]
    y = [2.1, 4.3, 5.8, 8.4, 9.9, 12.2]
    rows = ([("a", xi, yi) for xi, yi in zip(x, y)]
            + [("const", 5.0, 1.0), ("const", 5.0, 2.0)]
            + [("a", None, 9.0), ("a", 7.0, None)])
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = {r["g"]: r for r in
           group_ols(df, ["g"], "x", "y").collect()}
    sl, ic = np.polyfit(np.array(x), np.array(y), 1)
    r = out["a"]
    assert r["n"] == 6
    assert abs(r["slope"] - sl) < 1e-10
    assert abs(r["intercept"] - ic) < 1e-10
    assert abs(r["r2"] - np.corrcoef(x, y)[0, 1] ** 2) < 1e-12
    # constant x -> NULL slope/intercept/r2, no division error
    c = out["const"]
    assert c["slope"] is None and c["intercept"] is None
    assert c["r2"] is None


def test_km_curve_matches_hand_computation(spark):
    """Classic toy cohort: durations with censoring; survival must
    follow the product-limit table; censored-only times emit no row
    but reduce the next n_at_risk; the everyone-dies tail hits
    exactly 0.0."""
    from pyspark.sql import functions as F

    from tablite_spark.operators.stats import km_curve
    # (duration, observed): events at 2 (x2), 5; censored at 3, 8;
    # final event at 10 kills the last subject -> S = 0
    rows = [(2.0, True), (2.0, True), (3.0, False), (5.0, True),
            (8.0, False), (10.0, True), (None, True), (5.0, None)]
    df = spark.createDataFrame(rows, "d double, obs boolean")
    out = {r["duration"]: r for r in
           km_curve(df, "d", "obs").collect()}
    assert sorted(out) == [2.0, 5.0, 10.0]   # censored times absent
    # t=2: n=6 d=2 -> S=4/6; t=5: n=3 d=1 -> S=4/6*2/3=4/9;
    # t=10: n=1 d=1 -> S=0
    assert out[2.0]["n_at_risk"] == 6 and out[2.0]["n_events"] == 2
    assert abs(out[2.0]["survival"] - 4 / 6) < 1e-12
    assert out[5.0]["n_at_risk"] == 3
    assert abs(out[5.0]["survival"] - 4 / 9) < 1e-12
    assert out[10.0]["n_at_risk"] == 1
    assert out[10.0]["survival"] == 0.0
    # layout-independent
    out7 = {r["duration"]: r["survival"] for r in
            km_curve(df.repartition(7), "d", "obs").collect()}
    assert abs(out7[5.0] - 4 / 9) < 1e-12


def test_inequality_metrics_matches_numpy(spark):
    import math

    import numpy as np
    import pytest

    from tablite_spark.operators.stats import inequality_metrics
    vals = [1.0, 1.0, 2.0, 4.0, 10.0, 10.0, 30.0, 0.0]
    df = spark.createDataFrame([(v,) for v in vals] + [(None,)],
                               "v double")
    r = inequality_metrics(df, "v").collect()[0]
    x = np.sort(np.array(vals))
    i = np.arange(1, len(x) + 1)
    g = 2 * np.sum(i * x) / (len(x) * x.sum()) - (len(x) + 1) / len(x)
    assert r["n"] == 8
    assert abs(r["gini"] - g) < 1e-14
    mu = x.mean()
    t = sum(v / mu * math.log(v / mu) for v in x if v > 0) / len(x)
    assert abs(r["theil"] - t) < 1e-12
    # perfectly equal distribution -> gini 0, theil 0
    eq = spark.createDataFrame([(5.0,)] * 10, "v double")
    re = inequality_metrics(eq, "v").collect()[0]
    assert abs(re["gini"]) < 1e-14 and abs(re["theil"]) < 1e-14
    # negative values refuse
    neg = spark.createDataFrame([(1.0,), (-2.0,)], "v double")
    with pytest.raises(ValueError, match="negative"):
        inequality_metrics(neg, "v")
    # layout-independent
    r7 = inequality_metrics(df.repartition(5), "v").collect()[0]
    assert abs(r7["gini"] - r["gini"]) < 1e-14


def test_exact_percentiles_bit_identical(spark):
    """exact_percentiles (r14: the census-free two-level order
    statistic that replaces F.percentile's single-task boxed buffer)
    must be BIT-identical to F.percentile — including the
    (hi-pos)*lower + (pos-lo)*higher interpolation, the equal-key
    shortcut, ties, constants, huge magnitudes, an extreme outlier
    (degenerate range), and the -0.0 < +0.0 raw-bit ordering that
    SQL comparisons erase."""
    import random
    import struct

    from pyspark.sql import functions as F

    from tablite_spark.operators.stats import exact_percentiles

    random.seed(11)
    cases = [
        [random.uniform(-1e6, 1e6) for _ in range(997)] + [3.25] * 13,
        [1e16 + 1, 1e16 + 3, -7.123456789e15, 0.1, 123.456e14],
        [42.5],
        [5.0] * 100 + [7.0] * 3,
        [9.0] * 500,
        [float(i) for i in range(1000)],
        [float(i) for i in range(2000)] + [1e300],
        [-0.0, 0.0, 1.0, -1.0],
        [-0.0] * 3 + [0.0] * 2,
        ([-0.0] * 7 + [0.0] * 11 + [1.5] * 3) * 5,
    ]
    qs = [0.0, 0.01, 0.25, 1 / 3, 0.5, 0.61, 2 / 3, 0.75, 0.9, 1.0]
    for vals in cases:
        df = spark.createDataFrame([(float(v),) for v in vals],
                                   "x double")
        want = df.agg(F.percentile(
            "x", F.array(*[F.lit(q) for q in qs]))).collect()[0][0]
        got = exact_percentiles(df, {"x": qs})["x"]
        assert all(struct.pack("d", a) == struct.pack("d", b)
                   for a, b in zip(want, got)), vals[:5]
    # empty input mirrors Percentile's NULL
    empty = spark.createDataFrame([], "x double")
    assert exact_percentiles(empty, {"x": qs})["x"] is None
