"""Unit tests for cusum_changepoint / expectations / feature_scale —
hand-computed truths, degenerate inputs, and plan-shape gates."""

import math

import pytest
from pyspark.sql import functions as F

from tablite_spark import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark()


# ------------------------------------------------------------------
# cusum_changepoint
# ------------------------------------------------------------------

def test_cusum_level_shift(spark):
    """10 values of 1.0 then 10 of 5.0: mean 3, the CUSUM walk
    bottoms out exactly at the shift (index 10, S = -20)."""
    from tablite_spark.operators.timeseries import cusum_changepoint
    rows = [(float(i), 1.0 if i < 10 else 5.0) for i in range(20)]
    df = spark.createDataFrame(rows, "t double, x double")
    r = cusum_changepoint(df, "t", "x").collect()[0]
    assert r["n"] == 20 and r["mean"] == 3.0
    assert r["cp_index"] == 10 and r["cp_at"] == 9.0
    assert r["cusum"] == -20.0 and r["cusum_abs"] == 20.0


def test_cusum_duplicate_keys_merge_and_nulls_drop(spark):
    """Duplicate order keys collapse into one census point whose
    joint contribution lands there; NULL t or x rows are excluded."""
    from tablite_spark.operators.timeseries import cusum_changepoint
    rows = [(1.0, 0.0), (1.0, 0.0), (2.0, 6.0),
            (None, 99.0), (3.0, None)]
    df = spark.createDataFrame(rows, "t double, x double")
    r = cusum_changepoint(df, "t", "x").collect()[0]
    # mean 2; S(1)=0+0-2*2=-4, S(2)=6-3*2=0 -> peak at t=1, idx 2
    assert r["n"] == 3 and r["mean"] == 2.0
    assert r["cp_at"] == 1.0 and r["cp_index"] == 2
    assert r["cusum"] == -4.0


def test_cusum_tiebreak_smallest_index(spark):
    """Symmetric walk (+1, -1 alternating from mean): several equal
    |S| peaks — the SMALLEST global index must win."""
    from tablite_spark.operators.timeseries import cusum_changepoint
    rows = [(float(i), 1.0 if i % 2 == 0 else -1.0)
            for i in range(8)]
    df = spark.createDataFrame(rows, "t double, x double")
    r = cusum_changepoint(df, "t", "x").collect()[0]
    # mean 0; S = 1,0,1,0,... -> |S|=1 at indices 1,3,5,7 -> pick 1
    assert r["cp_index"] == 1 and r["cp_at"] == 0.0
    assert r["cusum_abs"] == 1.0


def test_cusum_empty_and_layout_independent(spark):
    from tablite_spark.operators.timeseries import cusum_changepoint
    empty = spark.createDataFrame([], "t double, x double")
    assert cusum_changepoint(empty, "t", "x").count() == 0
    rows = [(float(i), float((i * 7) % 13)) for i in range(200)]
    df = spark.createDataFrame(rows, "t double, x double")
    a = cusum_changepoint(df, "t", "x").collect()[0]
    b = cusum_changepoint(df.repartition(7), "t", "x").collect()[0]
    assert a == b


def test_cusum_no_global_order_window(spark):
    """The prefix sum must never serialize the census onto one task:
    no SinglePartition exchange feeding a Window."""
    from tablite_spark.operators.timeseries import cusum_changepoint
    rows = [(float(i), float(i % 5)) for i in range(500)]
    df = spark.createDataFrame(rows, "t double, x double")
    out = cusum_changepoint(df, "t", "x")
    ex = out._jdf.queryExecution().executedPlan().toString()
    # the scalar argmax agg's 1-row SinglePartition reduce is fine;
    # what must NOT exist is a Window whose child exchange is
    # SinglePartition (= the whole census on one task)
    pos = 0
    while True:
        pos = ex.find("Window", pos)
        if pos == -1:
            break
        assert "Exchange SinglePartition" not in ex[pos:pos + 400], \
            ex[pos:pos + 600]
        pos += 6
    assert "Window" in ex  # the in-bucket running sums exist


# ------------------------------------------------------------------
# expectations
# ------------------------------------------------------------------

def _rules():
    return [
        {"rule": "a_not_null", "column": "a", "check": "not_null"},
        {"rule": "a_min", "column": "a", "check": "min",
         "value": 0},
        {"rule": "a_between", "column": "a", "check": "between",
         "low": 0, "high": 10},
        {"rule": "s_in_set", "column": "s", "check": "in_set",
         "values": ["x", "y"]},
        {"rule": "s_regex", "column": "s", "check": "regex",
         "pattern": "^[a-z]$"},
        {"rule": "a_unique", "column": "a", "check": "unique"},
        {"rule": "a_pos_where", "column": "a", "check": "where",
         "condition": F.coalesce(F.col("a") >= -5, F.lit(False))},
    ]


def test_expectations_hand_counts(spark):
    from tablite_spark.operators.expect import expectations
    rows = [(1, "x"), (2, "y"), (2, "zz"), (-3, "x"),
            (None, "Q"), (15, None)]
    df = spark.createDataFrame(rows, "a int, s string")
    out = {r["rule"]: r for r in
           expectations(df, _rules()).collect()}
    assert all(r["n_rows"] == 6 for r in out.values())
    assert out["a_not_null"]["violations"] == 1
    assert out["a_min"]["violations"] == 1          # -3
    assert out["a_between"]["violations"] == 2      # -3, 15
    assert out["s_in_set"]["violations"] == 2       # zz, Q
    assert out["s_regex"]["violations"] == 2        # zz, Q
    assert out["a_unique"]["violations"] == 1       # dup 2
    # where-rules see three-valued logic through the caller's own
    # coalesce: the NULL a coalesces to False -> 1 violation
    assert out["a_pos_where"]["violations"] == 1
    assert out["a_between"]["pass_rate"] == 4 / 6


def test_expectations_validation_and_empty(spark):
    from tablite_spark.operators.expect import expectations
    df = spark.createDataFrame([], "a int, s string")
    out = expectations(df, _rules()).collect()
    assert len(out) == 7
    assert all(r["violations"] == 0 and r["pass_rate"] is None
               for r in out)
    with pytest.raises(ValueError, match="unknown expectation"):
        expectations(df, [{"rule": "r", "column": "a",
                           "check": "nope"}]).collect()
    with pytest.raises(ValueError, match="duplicate"):
        expectations(df, [{"rule": "r", "column": "a",
                           "check": "not_null"}] * 2)
    with pytest.raises(ValueError, match="at least one"):
        expectations(df, [])


def test_expectations_single_pass_plan(spark):
    """k rules must cost ONE scan and ONE aggregate pair — no join,
    no window, no per-rule scans."""
    from tablite_spark.operators.expect import expectations
    rows = [(i, "x") for i in range(100)]
    df = spark.createDataFrame(rows, "a int, s string")
    out = expectations(df, _rules())
    ex = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in ex and "Window" not in ex, ex[:1500]
    assert ex.count("Scan ") <= 1, ex[:1500]


# ------------------------------------------------------------------
# feature_scale
# ------------------------------------------------------------------

def test_feature_scale_zscore_matches_numpy(spark):
    import numpy as np

    from tablite_spark.pipeline.features import feature_scale
    vals = [float((i * 13) % 29) for i in range(100)]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)],
                               "id long, x double")
    out = {r["id"]: r["x_scaled"] for r in
           feature_scale(df, ["x"]).collect()}
    arr = np.array(vals)
    want = (arr - arr.mean()) / arr.std()
    for i in range(100):
        assert abs(out[i] - want[i]) < 1e-12


def test_feature_scale_minmax_and_robust(spark):
    from tablite_spark.pipeline.features import feature_scale
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(11)], "id long, x double")
    mm = {r["id"]: r["x_scaled"] for r in
          feature_scale(df, ["x"], method="minmax").collect()}
    assert mm[0] == 0.0 and mm[10] == 1.0 and mm[5] == 0.5
    rb = {r["id"]: r["x_scaled"] for r in
          feature_scale(df, ["x"], method="robust").collect()}
    # median 5, IQR = 7.5 - 2.5 = 5
    assert rb[5] == 0.0 and rb[10] == 1.0 and rb[0] == -1.0


def test_feature_scale_constant_column_null_and_validation(spark):
    from tablite_spark.pipeline.features import feature_scale
    df = spark.createDataFrame([(i, 3.0) for i in range(5)],
                               "id long, x double")
    for m in ("zscore", "minmax", "robust"):
        out = feature_scale(df, ["x"], method=m).collect()
        assert all(r["x_scaled"] is None for r in out)
    with pytest.raises(ValueError, match="unknown scaling"):
        feature_scale(df, ["x"], method="bogus")


def test_feature_scale_broadcast_stats_plan(spark):
    """The 1-row stats frame must broadcast (never shuffle the row
    side); two scans max (fit + transform)."""
    from tablite_spark.pipeline.features import feature_scale
    df = spark.createDataFrame(
        [(i, float(i), float(i * 2)) for i in range(100)],
        "id long, x double, y double")
    out = feature_scale(df, ["x", "y"])
    ex = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in ex or "BroadcastExchange" \
        in ex, ex[:1500]
    assert "SortMergeJoin" not in ex
