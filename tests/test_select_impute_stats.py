"""column_select cast-with-reject (F9), imputation (F8), statistics,
type inference."""

import pytest
from pyspark.sql import functions as F

from tablite_spark.functions.inference import guess_types
from tablite_spark.operators.imputation import (
    carry_forward, fill_mean, fill_mode, nearest_neighbour,
)
from tablite_spark.operators.select import column_select
from tablite_spark.operators.stats import statistics_dict, type_census


def test_column_select_pass_fail(spark):
    df = spark.createDataFrame(
        [("1", "x"), ("2.0", "y"), ("nope", "z"), ("", "w")],
        "v string, k string")
    p, f = column_select(df, [
        {"column": "v", "type": "int", "rename": "v_int"},
        {"column": "k", "type": "str"},
    ])
    prows = {r["k"]: r["v_int"] for r in p.collect()}
    assert prows == {"x": 1, "y": 2}
    frows = f.collect()
    assert len(frows) == 2
    assert all("failed to convert" in r["reject_reason"] for r in frows)
    assert "reject_reason" in f.columns


def test_column_select_allow_empty(spark):
    df = spark.createDataFrame([("1",), ("",)], "v string")
    p, f = column_select(df, [
        {"column": "v", "type": "int", "allow_empty": True}])
    assert p.count() == 2 and f.count() == 0
    vals = sorted((r["v"] for r in p.collect()), key=lambda x: (x is None, x))
    assert vals == [1, None]


def test_column_select_dates(spark):
    df = spark.createDataFrame(
        [("2023-06-09",), ("09.06.2023",), ("junk",)], "d string")
    p, f = column_select(df, [{"column": "d", "type": "date"}])
    assert p.count() == 2 and f.count() == 1


def test_column_select_time_us(spark):
    """time → µs-since-midnight LongType (SURVEY §1.3 convention)."""
    df = spark.createDataFrame([("09:12:06",)], "t string")
    p, _ = column_select(df, [{"column": "t", "type": "time"}])
    assert p.collect()[0]["t"] == (9 * 3600 + 12 * 60 + 6) * 1_000_000


def test_column_select_eu_numbers(spark):
    """Locale-aware parsing (nimlite/infertypes.nim)."""
    df = spark.createDataFrame(
        [("1.000.000,5",), ("1,000,000",), ("12",)], "v string")
    p, f = column_select(df, [{"column": "v", "type": "float"}])
    vals = sorted(r["v"] for r in p.collect())
    assert vals == [12.0, 1000000.0, 1000000.5]


def test_column_select_bool(spark):
    df = spark.createDataFrame([("true",), ("No",), ("7",)], "b string")
    p, f = column_select(df, [{"column": "b", "type": "bool"}])
    assert p.count() == 2 and f.count() == 1


def test_carry_forward(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, None), (4, 40.0)], "i int, v double")
    out = carry_forward(df, ["v"], order_by=["i"]).collect()
    vals = {r["i"]: r["v"] for r in out}
    assert vals == {1: 10.0, 2: 10.0, 3: 10.0, 4: 40.0}


def test_carry_forward_many_partitions_pandas_equiv(spark):
    """Scale path (range partition + per-partition fill + boundary
    carry) must equal a single-sequence pandas ffill, including runs of
    nulls that span partition boundaries and an all-null prefix."""
    import pandas as pd

    vals = [None, None, 3.0] + [None] * 40 + [7.0] + [None] * 40 + [9.0, None]
    pdf = pd.DataFrame({"i": range(len(vals)), "v": vals})
    df = spark.createDataFrame(pdf).repartition(13)
    out = carry_forward(df, ["v"], order_by=["i"])
    got = {r["i"]: r["v"] for r in out.collect()}
    expect = pdf.set_index("i")["v"].ffill()
    for i in range(len(vals)):
        e = expect.loc[i]
        assert (got[i] is None and pd.isna(e)) or got[i] == e, (i, got[i], e)


def test_carry_forward_multi_target_string(spark):
    df = spark.createDataFrame(
        [(1, "a", None), (2, None, 5.0), (3, None, None), (4, "d", 7.0)],
        "i int, s string, v double").repartition(5)
    out = carry_forward(df, ["s", "v"], order_by=["i"])
    got = {r["i"]: (r["s"], r["v"]) for r in out.collect()}
    assert got == {1: ("a", None), 2: ("a", 5.0), 3: ("a", 5.0), 4: ("d", 7.0)}


def test_fill_mean(spark):
    df = spark.createDataFrame([(1.0,), (3.0,), (None,)], "v double")
    out = fill_mean(df, ["v"])
    assert sorted(r["v"] for r in out.collect()) == [1.0, 2.0, 3.0]


def test_fill_mode(spark):
    df = spark.createDataFrame([("a",), ("a",), ("b",), (None,)], "v string")
    out = fill_mode(df, ["v"])
    assert sorted(r["v"] for r in out.collect()).count("a") == 3


def test_nearest_neighbour(spark):
    """NN picks donor minimizing range-normalized L1 over sources
    (nimlite/funcs/imputation.nim:116-275)."""
    df = spark.createDataFrame(
        [(0.0, 0.0, 100.0), (10.0, 10.0, 200.0), (1.0, 1.0, None)],
        "s1 double, s2 double, t double")
    out = nearest_neighbour(df, ["t"], ["s1", "s2"]).collect()
    filled = [r["t"] for r in out if r["s1"] == 1.0][0]
    assert filled == 100.0  # (0,0) is nearer to (1,1) than (10,10)


def test_statistics(spark):
    df = spark.createDataFrame([(float(i),) for i in range(1, 11)], "v double")
    st = statistics_dict(df, "v")
    assert st["min"] == 1.0 and st["max"] == 10.0
    assert st["mean"] == 5.5 and st["median"] == 5.5
    assert st["distinct"] == 10 and st["sum"] == 55.0


def test_type_census(spark):
    df = spark.createDataFrame([(1, None), (2, "x")], "a int, b string")
    tc = type_census(df)
    assert tc["a"] == {"int": 2}
    assert tc["b"] == {"string": 1, "NoneType": 1}


def test_guess_types(spark):
    df = spark.createDataFrame(
        [("1", "1.5", "2021-01-01", "true", "abc"),
         ("2", "2.5", "2021-06-09", "false", "def")],
        "i string, f string, d string, b string, s string")
    g = guess_types(df)
    assert g == {"i": "int", "f": "float", "d": "date", "b": "bool", "s": "str"}


def test_nearest_neighbour_lsh_matches_exact(spark):
    """On clustered data the LSH path must agree with the exact path
    (true NN shares a bucket), and every null must be filled."""
    import random

    from tablite_spark.operators.imputation import (
        nearest_neighbour, nearest_neighbour_lsh,
    )
    rnd = random.Random(7)
    rows = []
    for k in range(60):
        cx, cy = (0.0, 0.0) if k % 2 == 0 else (100.0, 100.0)
        v = None if k % 10 == 0 else float(k)
        rows.append((k, v, cx + rnd.uniform(-1, 1), cy + rnd.uniform(-1, 1)))
    df = spark.createDataFrame(rows, "k int, v double, x double, y double")
    exact = {r["k"]: r["v"] for r in
             nearest_neighbour(df, ["v"], ["x", "y"]).collect()}
    approx = {r["k"]: r["v"] for r in
              nearest_neighbour_lsh(df, ["v"], ["x", "y"]).collect()}
    assert None not in approx.values()
    agree = sum(exact[k] == approx[k] for k in exact)
    assert agree >= 58, f"only {agree}/60 match exact NN"


def test_profile_columns_bounds_and_exactness(spark):
    """profile_columns: exact fields exactly right (incl. nulls and
    non-numeric mean=None), HLL distinct within 3*rsd of truth on a
    100k-distinct column, and the whole profile is ONE aggregation
    job (no exchange beyond the final agg)."""
    from pyspark.sql import functions as F

    from tablite_spark.operators.stats import profile_columns
    n = 200_000
    df = (spark.range(n)
          .select(F.col("id").alias("k"),
                  (F.col("id") % 1000).alias("small"),
                  F.when(F.col("id") % 10 == 0, None)
                  .otherwise(F.concat(F.lit("v"), F.col("id") % 50))
                  .alias("s")))
    rows = {r["column"]: r for r in
            profile_columns(df, rsd=0.05).collect()}
    assert rows["k"]["n"] == n and rows["k"]["n_nulls"] == 0
    assert rows["s"]["n_nulls"] == n // 10
    assert rows["small"]["min"] == "0" and rows["small"]["max"] == "999"
    assert rows["small"]["mean"] == pytest.approx(499.5)
    assert rows["s"]["mean"] is None
    assert abs(rows["k"]["approx_distinct"] - n) <= 0.15 * n
    assert abs(rows["small"]["approx_distinct"] - 1000) <= 150
    assert abs(rows["s"]["approx_distinct"] - 50) <= 10


def test_ab_welch_matches_manual_formula(spark):
    """Pairwise Welch t/dof must match a hand-rolled numpy
    computation; n<2 groups and null values are excluded."""
    import numpy as np

    from tablite_spark.operators.stats import ab_welch
    rows = ([("a", float(v)) for v in [10, 12, 9, 11, 13]]
            + [("b", float(v)) for v in [20, 19, 22, 21]]
            + [("c", 5.0)]           # n=1 -> dropped
            + [("a", None), ("b", None)])
    df = spark.createDataFrame(rows, "variant string, value double")
    out = {(r["g_a"], r["g_b"]): r for r in
           ab_welch(df, "variant", "value").collect()}
    assert set(out) == {("a", "b")}
    a = np.array([10, 12, 9, 11, 13], float)
    b = np.array([20, 19, 22, 21], float)
    sa, sb = a.var(ddof=1) / len(a), b.var(ddof=1) / len(b)
    t = (a.mean() - b.mean()) / np.sqrt(sa + sb)
    dof = (sa + sb) ** 2 / (sa ** 2 / (len(a) - 1)
                            + sb ** 2 / (len(b) - 1))
    r = out[("a", "b")]
    assert (r["na"], r["nb"]) == (5, 4)
    assert r["t_stat"] == round(t, 4) and r["dof"] == round(dof, 2)
    assert r["mean_a"] == 11.0 and r["mean_b"] == 20.5


def test_ab_welch_degenerate_constant_pair(spark):
    """ADVICE r9: a pair of groups that are EACH constant-valued
    (both sample variances 0) must yield NULL t_stat/dof instead of
    an ANSI DIVIDE_BY_ZERO that aborts the whole query; other pairs
    must survive intact."""
    from tablite_spark.operators.stats import ab_welch
    rows = ([("a", 5.0)] * 3 + [("b", 7.0)] * 4
            + [("c", float(v)) for v in [1, 2, 3, 4]])
    df = spark.createDataFrame(rows, "variant string, value double")
    out = {(r["g_a"], r["g_b"]): r for r in
           ab_welch(df, "variant", "value").collect()}
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}
    deg = out[("a", "b")]
    assert deg["t_stat"] is None and deg["dof"] is None
    assert deg["mean_a"] == 5.0 and deg["mean_b"] == 7.0
    for pair in [("a", "c"), ("b", "c")]:
        assert out[pair]["t_stat"] is not None
        assert out[pair]["dof"] is not None


def test_pairwise_corr_matches_numpy(spark):
    """Correlation matrix must equal numpy corrcoef on the pairwise-
    complete rows; constant columns yield NULL (not NaN); nulls are
    excluded pairwise."""
    import numpy as np

    from tablite_spark.operators.stats import pairwise_corr
    rows = [(1.0, 2.0, 5.0), (2.0, 4.1, 5.0), (3.0, 5.9, 5.0),
            (4.0, 8.2, 5.0), (None, 1.0, 5.0), (5.0, None, 5.0)]
    df = spark.createDataFrame(rows, "x double, y double, z double")
    out = {(r["col_a"], r["col_b"]): r for r in
           pairwise_corr(df, ["x", "y", "z"]).collect()}
    assert set(out) == {("x", "y"), ("x", "z"), ("y", "z")}
    xy = out[("x", "y")]
    a = np.array([1, 2, 3, 4.0]); b = np.array([2, 4.1, 5.9, 8.2])
    assert xy["n"] == 4
    assert abs(xy["corr"] - np.corrcoef(a, b)[0, 1]) < 1e-12
    # z is constant -> zero variance -> NULL, and never NaN
    assert out[("x", "z")]["corr"] is None
    assert out[("y", "z")]["corr"] is None
    assert out[("x", "z")]["n"] == 5


def test_group_quantiles_exact_matches_numpy(spark):
    """exact=True must reproduce numpy's linear interpolation
    (percentile_cont semantics) per group; exact=False (GK sketch)
    must land within the accuracy bound."""
    import numpy as np

    from tablite_spark.operators.stats import group_quantiles
    vals = {"a": [float(v) for v in range(1, 11)],
            "b": [10.0, 30.0, 20.0]}
    rows = [(g, v) for g, vs in vals.items() for v in vs]
    rows += [("a", None)]
    df = spark.createDataFrame(rows, "g string, v double")
    qs = [0.25, 0.5, 0.9]
    out = {(r["g"], r["q"]): r["value"] for r in
           group_quantiles(df, ["g"], "v", qs).collect()}
    for g, vs in vals.items():
        for q in qs:
            want = float(np.percentile(vs, q * 100,
                                       method="linear"))
            assert abs(out[(g, q)] - want) < 1e-12, (g, q)
    approx = {(r["g"], r["q"]): r["value"] for r in
              group_quantiles(df, ["g"], "v", qs,
                              exact=False).collect()}
    for (g, q), v in approx.items():
        # GK returns an actual order statistic whose rank is within
        # the sketch's accuracy bound of the target rank
        assert v in vals[g], (g, q, v)
        rank = sorted(vals[g]).index(v)
        assert abs(rank - q * (len(vals[g]) - 1)) <= 1.0, (g, q, v)


def test_mutual_information_matches_formula(spark):
    """MI and entropies must equal the closed-form replay; an
    independent pair gives MI 0, a deterministic copy gives
    MI == H(X)."""
    import math

    from tablite_spark.operators.stats import mutual_information
    # x uniform over {0,1}, y = x (fully dependent)
    rows = [(i % 2, i % 2) for i in range(8)]
    df = spark.createDataFrame(rows, "x int, y int")
    r = mutual_information(df, "x", "y").first()
    assert r["n"] == 8
    assert abs(r["mi_nats"] - math.log(2)) < 1e-12
    assert abs(r["h_x"] - math.log(2)) < 1e-12
    # independent: every (x, y) cell equally likely
    rows2 = [(i % 2, (i // 2) % 2) for i in range(8)]
    df2 = spark.createDataFrame(rows2, "x int, y int")
    r2 = mutual_information(df2, "x", "y").first()
    assert abs(r2["mi_nats"]) < 1e-12
    # nulls excluded
    rows3 = rows + [(None, 1), (1, None)]
    df3 = spark.createDataFrame(rows3, "x int, y int")
    assert mutual_information(df3, "x", "y").first()["n"] == 8


def test_mutual_information_single_scan_reused_exchange(spark):
    """The N branch must reuse the joint groupBy exchange (the tfidf
    pruning-barrier discipline) — one corpus materialization."""
    from tablite_spark.operators.stats import mutual_information
    df = spark.createDataFrame(
        [(i % 3, i % 5) for i in range(200)], "x int, y int")
    out = mutual_information(df, "x", "y")
    out.collect()
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))
    assert "isFinalPlan=true" in plan
    assert plan.count("ReusedExchange") >= 1, plan[:2000]


def test_group_outliers_zscore_and_iqr(spark):
    """Outlier flags must match a numpy replay for both methods;
    null values flag NULL; degenerate (constant / tiny) groups flag
    nothing rather than dividing by zero."""
    import numpy as np

    from tablite_spark.operators.stats import group_outliers
    base = [1.0, 2.0, 1.5, 2.5, 1.8, 2.2, 1.1, 2.9, 1.7, 60.0]
    rows = ([("a", v) for v in base]          # 60.0 is the outlier
            + [("b", 5.0)] * 4                # constant group
            + [("c", 1.0)]                    # n=1 group
            + [("a", None)])
    df = spark.createDataFrame(rows, "g string, v double")
    for method, thr in (("zscore", 2.0), ("iqr", 1.5)):
        out = group_outliers(df, ["g"], "v", method=method,
                             threshold=thr).collect()
        flags = {(r["g"], r["v"]): r["is_outlier"] for r in out}
        assert len(out) == len(rows)
        a = np.array(base)
        if method == "zscore":
            hot = abs(a - a.mean()) > thr * a.std(ddof=1)
        else:
            q1, q3 = np.percentile(a, [25, 75], method="linear")
            hot = (a < q1 - thr * (q3 - q1)) | (a > q3 + thr * (q3 - q1))
        for v, h in zip(base, hot):
            assert flags[("a", v)] == bool(h), (method, v)
        assert flags[("a", 60.0)] is True
        assert all(flags[("b", 5.0)] is False for _ in [0])
        assert flags[("c", 1.0)] is False
        assert flags[("a", None)] is None
    import pytest
    with pytest.raises(ValueError, match="method"):
        group_outliers(df, ["g"], "v", method="grubbs")


def test_spearman_corr_matches_numpy_with_ties(spark):
    """Spearman rho must equal a numpy tie-average-rank replay
    (pearson of average ranks), with listwise null deletion and a
    perfectly monotone nonlinear pair giving rho == 1."""
    import numpy as np

    def avg_ranks(a):
        order = np.argsort(a, kind="mergesort")
        ranks = np.empty(len(a), dtype=float)
        sa = a[order]
        i = 0
        while i < len(a):
            j = i
            while j + 1 < len(a) and sa[j + 1] == sa[i]:
                j += 1
            ranks[order[i:j + 1]] = (i + j) / 2.0 + 1.0
            i = j + 1
        return ranks

    from tablite_spark.operators.stats import spearman_corr
    x = [1.0, 2.0, 2.0, 3.0, 5.0, 8.0, 8.0, 9.0]
    y = [float(v) ** 3 for v in x]          # monotone -> rho 1
    z = [4.0, 1.0, 7.0, 2.0, 2.0, 9.0, 3.0, 5.0]
    rows = list(zip(x, y, z)) + [(None, 1.0, 1.0), (1.0, None, 2.0)]
    df = spark.createDataFrame(rows, "x double, y double, z double")
    out = {(r["col_a"], r["col_b"]): r for r in
           spearman_corr(df, ["x", "y", "z"]).collect()}
    assert all(r["n"] == 8 for r in out.values())
    assert abs(out[("x", "y")]["rho"] - 1.0) < 1e-12
    xa, za = np.array(x), np.array(z)
    rx, rz = avg_ranks(xa), avg_ranks(za)
    want = (np.cov(rx, rz, ddof=1)[0, 1]
            / (rx.std(ddof=1) * rz.std(ddof=1)))
    assert abs(out[("x", "z")]["rho"] - want) < 1e-12
    # determinism across partitionings (the distributed prefix-sum
    # must not depend on physical layout); same column set — listwise
    # deletion means a different cols list ranks a different
    # population
    out5 = {(r["col_a"], r["col_b"]): r["rho"] for r in
            spearman_corr(df.repartition(5),
                          ["x", "y", "z"]).collect()}
    assert abs(out5[("x", "z")] - want) < 1e-12


def test_group_quantiles_all_null_group_survives(spark):
    """A group whose values are ALL NULL must survive with NULL at
    every requested fraction (SQL percentile_cont / DuckDB
    zipped-unnest padding), not silently disappear — on both the
    exact and the GK-sketch path."""
    from tablite_spark.operators.stats import group_quantiles
    rows = ([("a", float(v)) for v in range(1, 5)]
            + [("dead", None), ("dead", None)])
    df = spark.createDataFrame(rows, "g string, v double")
    qs = [0.25, 0.5, 0.75]
    for exact in (True, False):
        out = group_quantiles(df, ["g"], "v", qs, exact=exact)
        got = {(r["g"], r["q"]): r["value"] for r in out.collect()}
        assert len(got) == 2 * len(qs), (exact, got)
        for q in qs:
            assert got[("dead", q)] is None, (exact, q)
            assert got[("a", q)] is not None, (exact, q)


def test_mutual_information_marginal_product_in_double(spark):
    """The MI log argument's nx*ny product must be computed in
    DOUBLE — a long*long product ARITHMETIC_OVERFLOWs under ANSI
    once marginal counts exceed ~3e9 (nx*ny > 2^63)."""
    from tablite_spark.operators.stats import mutual_information
    df = spark.createDataFrame(
        [(i % 3, i % 5) for i in range(60)], "x int, y int")
    out = mutual_information(df, "x", "y")
    analyzed = out._jdf.queryExecution().analyzed().toString()
    assert "cast(nx" in analyzed.lower(), analyzed[:3000]


def test_spearman_upstream_computed_once(spark):
    """spearman_corr persists its listwise projection: an expensive
    upstream plan must be computed exactly ONCE (cache fill), not
    k+1 times (k censuses + the rank join). Counted behaviorally
    with a per-partition accumulator in a mapInPandas source."""
    from tablite_spark.operators.stats import spearman_corr
    acc = spark.sparkContext.accumulator(0)
    src = spark.range(0, 2000, 1, 4).selectExpr(
        "cast(id % 97 as double) as x",
        "cast((id * 31) % 89 as double) as y",
        "cast((id * 7) % 13 as double) as z")

    def counting(batches):
        acc.add(1)
        for b in batches:
            yield b

    counted = src.mapInPandas(counting, src.schema)
    out = spearman_corr(counted, ["x", "y", "z"]).collect()
    assert len(out) == 3
    # one pass over 4 source partitions — not (k+1)*4 = 16
    assert acc.value == 4, acc.value
