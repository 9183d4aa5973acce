"""Datatype inference/cast format zoo — the same semantic classes the
reference exercises in tests/test_datatype.py (ISO-ish date patterns,
US/EU number locales, boolean words, None sentinels), plus a
hypothesis round-trip property the reference lacks.
"""

from datetime import date, datetime

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tablite_spark.functions.inference import guess_types
from tablite_spark.operators.select import column_select


def _one_col(spark, values):
    return spark.createDataFrame([(v,) for v in values], "v string")


ZOO = [
    # (input strings, target type, expected python values)
    (["2022-01-31", "1999/12/01", "31.12.2000"], "date",
     [date(2022, 1, 31), date(1999, 12, 1), date(2000, 12, 31)]),
    (["2022-01-31 12:30:00", "2022-01-31T12:30:00"], "datetime",
     [datetime(2022, 1, 31, 12, 30), datetime(2022, 1, 31, 12, 30)]),
    (["1,000,000", "1.000.000,5", "-42", "7.25"], "float",
     [1000000.0, 1000000.5, -42.0, 7.25]),
    # ambiguous single-group forms resolve like python float() (US),
    # matching DataTypes.guess; multi-group forms are unambiguous EU
    (["5.125", "1.000", "1.000.000", "2.500,75"], "float",
     [5.125, 1.0, 1000000.0, 2500.75]),
    (["1,000", "44", "16.0"], "int", [1000, 44, 16]),
    (["true", "False", "YES", "no"], "bool", [True, False, True, False]),
    (["12:30:00", "00:00:01", "23:59"], "time",
     [45000000000, 1000000, 86340000000]),  # µs since midnight
]


@pytest.mark.parametrize("values,target,expected", ZOO,
                         ids=[f"{z[1]}{i}" for i, z in enumerate(ZOO)])
def test_cast_zoo(spark, values, target, expected):
    df = _one_col(spark, values)
    p, f = column_select(df, [{"column": "v", "type": target}])
    assert f.count() == 0, f.collect()
    assert [r["v"] for r in p.collect()] == expected


def test_none_sentinels_reject_unless_allowed(spark):
    df = _one_col(spark, ["1", "NULL", "#N/A", "None", ""])
    p, f = column_select(df, [{"column": "v", "type": "int"}])
    assert p.count() == 1 and f.count() == 4
    p2, f2 = column_select(df, [{"column": "v", "type": "int",
                                 "allow_empty": True}])
    assert f2.count() == 0
    assert [r["v"] for r in p2.collect()] == [1, None, None, None, None]


def test_guess_prefers_specific_type(spark):
    df = spark.createDataFrame(
        [("2021-01-01", "5", "1.5", "true"),
         ("2021-06-30", "6", "2", "false")],
        "d string, i string, f string, b string")
    g = guess_types(df)
    assert g == {"d": "date", "i": "int", "f": "float", "b": "bool"}


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.integers(min_value=-10**15, max_value=10**15),
                min_size=1, max_size=50))
@pytest.mark.slow
def test_int_roundtrip_property(spark, xs):
    """Any int64 batch survives str()→column_select('int') exactly."""
    df = _one_col(spark, [str(x) for x in xs])
    p, f = column_select(df, [{"column": "v", "type": "int"}])
    assert f.count() == 0
    assert sorted(r["v"] for r in p.collect()) == sorted(xs)


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.dates(min_value=date(1900, 1, 1),
                         max_value=date(2100, 1, 1)),
                min_size=1, max_size=50))
@pytest.mark.slow
def test_date_roundtrip_property(spark, ds):
    df = _one_col(spark, [d.isoformat() for d in ds])
    p, f = column_select(df, [{"column": "v", "type": "date"}])
    assert f.count() == 0
    assert sorted(r["v"] for r in p.collect()) == sorted(ds)


@pytest.mark.slow
class TestInferenceRoundtripProperty:
    """Hypothesis: any homogeneous column of rendered values must be
    guessed back to its type and cast without data loss (reference
    tests/test_datatype.py's zoo, generated instead of enumerated)."""

    @staticmethod
    def _roundtrip(spark, strings, expect_type, expect_values):
        from tablite_spark.functions.inference import (
            apply_guessed_types, guess_types,
        )
        df = spark.createDataFrame([(s,) for s in strings], "v string")
        assert guess_types(df) == {"v": expect_type}
        out = apply_guessed_types(df)
        got = [r["v"] for r in out.collect()]
        assert sorted(got, key=str) == sorted(expect_values, key=str)

    def test_ints(self, spark):
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        @given(st.lists(st.integers(-2**62, 2**62), min_size=1, max_size=20))
        @settings(max_examples=8, deadline=None,
                  suppress_health_check=list(HealthCheck))
        def run(xs):
            self._roundtrip(spark, [str(x) for x in xs], "int", xs)
        run()

    def test_floats(self, spark):
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        @given(st.lists(st.floats(allow_nan=False, allow_infinity=False,
                                  width=64).filter(
                                      lambda x: x != int(x) or abs(x) > 2**63),
                        min_size=1, max_size=20))
        @settings(max_examples=8, deadline=None,
                  suppress_health_check=list(HealthCheck))
        def run(xs):
            self._roundtrip(spark, [repr(x) for x in xs], "float", xs)
        run()

    def test_dates(self, spark):
        from datetime import date

        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        @given(st.lists(st.dates(date(1900, 1, 1), date(2100, 1, 1)),
                        min_size=1, max_size=20))
        @settings(max_examples=8, deadline=None,
                  suppress_health_check=list(HealthCheck))
        def run(ds):
            self._roundtrip(spark, [d.isoformat() for d in ds], "date", ds)
        run()

    def test_datetimes(self, spark):
        from datetime import datetime

        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        @given(st.lists(
            st.datetimes(datetime(1900, 1, 1), datetime(2100, 1, 1))
            .map(lambda d: d.replace(microsecond=0))
            .filter(lambda d: (d.hour, d.minute, d.second) != (0, 0, 0)),
            min_size=1, max_size=20))
        @settings(max_examples=8, deadline=None,
                  suppress_health_check=list(HealthCheck))
        def run(ds):
            self._roundtrip(spark, [d.isoformat(sep=" ") for d in ds],
                            "datetime", ds)
        run()


def test_xround_numeric(spark):
    """DataTypes.round parity (tablite/datatypes.py:325-371): round to
    arbitrary multiple, up/down/nearest."""
    from pyspark.sql import functions as F

    from tablite_spark.functions.rounding import xround
    df = spark.createDataFrame([(1,), (6,), (11,), (14,), (-7,)], "x int")
    got = df.select(
        xround(F.col("x"), 10).alias("near"),
        xround(F.col("x"), 10, up=True).alias("up"),
        xround(F.col("x"), 10, up=False).alias("down")).collect()
    vals = {r["near"] for r in got}
    by_x = {x: (r["near"], r["up"], r["down"])
            for x, r in zip([1, 6, 11, 14, -7], got)}
    assert by_x[1] == (0, 10, 0)
    assert by_x[6] == (10, 10, 0)
    assert by_x[14] == (10, 20, 10)
    assert by_x[-7] == (-10, 0, -10)
    assert vals <= {-10, 0, 10, 20}


def test_xround_timestamp(spark):
    from pyspark.sql import functions as F

    from tablite_spark.functions.rounding import xround_ts
    df = spark.createDataFrame(
        [("2021-01-01 10:17:00",), ("2021-01-01 10:44:59",)], "s string") \
        .select(F.to_timestamp("s").alias("ts"))
    got = [str(r["b"]) for r in
           df.select(xround_ts(F.col("ts"), 1800).alias("b")).collect()]
    assert got == ["2021-01-01 10:30:00", "2021-01-01 10:30:00"]
