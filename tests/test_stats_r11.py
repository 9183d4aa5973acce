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
