"""Join semantics vs reference fixture F2 (tests/test_join.py:16-41):
null-key matching, collision renaming `_1`, merge_keys, lookup, match."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tablite_spark.operators.joins import join, lookup, match, unique_name

SCHEMA = T.StructType([
    T.StructField("number", T.IntegerType(), True),
    T.StructField("colour", T.StringType(), True),
])


@pytest.fixture()
def numbers(spark):
    return spark.createDataFrame(
        [(1, "black"), (2, "blue"), (3, "white"), (4, "white"), (None, "blue")],
        SCHEMA)


@pytest.fixture()
def letters(spark):
    return spark.createDataFrame(
        [("a", "black"), ("b", "blue"), ("c", "orange"), (None, "blue")],
        "letter string, colour string")


def test_unique_name():
    assert unique_name("x", ["a"]) == "x"
    assert unique_name("x", ["x"]) == "x_1"
    assert unique_name("x", ["x", "x_1"]) == "x_2"


def test_left_join_collision_rename(numbers, letters):
    j = join(numbers, letters, ["colour"], ["colour"], kind="left")
    assert j.columns == ["number", "colour", "letter", "colour_1"]


def test_left_join_null_unjoined(spark, numbers):
    other = spark.createDataFrame([(1, "black")], SCHEMA)
    j = join(numbers, other, ["colour"], ["colour"], kind="left")
    rows = {(r["number"], r["number_1"]) for r in j.collect()}
    assert (1, 1) in rows
    # unmatched left rows keep None on the right
    assert (2, None) in rows


def test_null_keys_match(numbers, spark):
    """None == None in join keys (tablite/joins.py:201-210)."""
    other = spark.createDataFrame([(None, 99), ("black", 1)], "colour string, v int")
    left = numbers.selectExpr("number", "CASE WHEN number = 2 THEN NULL ELSE colour END AS colour")
    j = join(left, other, ["colour"], ["colour"], kind="inner")
    # row with NULL colour must match the NULL key on the right
    assert any(r["v"] == 99 for r in j.collect())


def test_inner_join_cartesian_per_key(numbers, letters):
    j = join(numbers, letters, ["colour"], ["colour"], kind="inner")
    # blue appears 2x left, 2x right → 4 pairs; black 1x1; white unmatched
    assert j.count() == 5


def test_outer_join(numbers, letters):
    j = join(numbers, letters, ["colour"], ["colour"], kind="outer")
    colours = [r["colour"] or r["colour_1"] for r in j.collect()]
    assert "orange" in colours and "white" in colours


def test_merge_keys(numbers, letters):
    j = join(numbers, letters, ["colour"], ["colour"], kind="outer", merge_keys=True)
    assert "colour_1" not in j.columns
    assert sorted(set(r["colour"] for r in j.collect())) == [
        "black", "blue", "orange", "white"]


def test_cross_join(numbers, letters):
    j = join(numbers, letters, None, None, kind="cross")
    assert j.count() == 20


def test_lookup_first_match(spark):
    """F7 bus-timetable fixture: first right row (in right_order)
    satisfying theta criteria; unmatched → nulls."""
    friends = spark.createDataFrame(
        [("Alice", "Downtown"), ("Bob", "Uptown"), ("Eve", "Nowhere")],
        "name string, stop string")
    bus = spark.createDataFrame(
        [(700, "Downtown"), (800, "Downtown"), (730, "Uptown")],
        "time int, stop string")
    out = lookup(friends, bus,
                 ("stop", "==", "stop"), (720, "<=", "time"))
    rows = {r["name"]: r["time"] for r in out.collect()}
    assert rows["Alice"] == 800
    assert rows["Bob"] == 730
    assert rows["Eve"] is None


def test_match_semi(spark, numbers, letters):
    out = match(numbers, letters, [("colour", "colour")],
                keep_left=["number", "colour"], keep_right=[])
    assert sorted(r["colour"] for r in out.collect()) == ["black", "blue", "blue"]


def test_match_attach_first(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b")], "id int, k string")
    right = spark.createDataFrame(
        [("a", 10), ("a", 20), ("b", 30)], "k string, v int")
    out = match(left, right, [("k", "k")])
    assert out.count() == 2  # one right row attached per left row


def test_lookup_any_criteria(spark):
    """all=False combines criteria with OR (tablite/lookup.py:20)."""
    from tablite_spark.operators.joins import lookup
    L = spark.createDataFrame([(1, 5), (2, 99)], "id int, x int")
    R = spark.createDataFrame([(10, 5), (20, 50)], "rid int, y int")
    got = lookup(L, R, ("x", "==", "y"), ("x", ">", "y"), all=False)
    rows = {r["id"]: r["rid"] for r in got.collect()}
    assert rows[1] == 10   # x==y on first right row
    assert rows[2] == 10   # x>y matches both; first right row wins


def test_table_setitem_and_rows(spark):
    from tablite_spark import Table
    t = Table(spark.createDataFrame([(1,), (2,)], "a int"))
    t["b"] = F.col("a") * 10
    t["c"] = 7
    assert sorted(t.rows) == [(1, 10, 7), (2, 20, 7)]
    # positional list assignment (reference README idiom) is supported
    t["d"] = [100, 200]
    assert sorted(t.rows) == [(1, 10, 7, 100), (2, 20, 7, 200)]


def test_asof_join_backward_forward(spark):
    from tablite_spark.operators.joins import asof_join
    left = spark.createDataFrame(
        [(1, "u", 10), (2, "u", 25), (3, "v", 5)], "id int, k string, t int")
    right = spark.createDataFrame(
        [("u", 8, 100.0), ("u", 20, 200.0), ("u", 30, 300.0), ("w", 1, 9.0)],
        "k string, t int, px double")
    back = asof_join(left, right, on="t", by=["k"], right_cols=["px"])
    got = {r["id"]: r["px"] for r in back.collect()}
    # id1 t=10 → px@8; id2 t=25 → px@20; id3 'v' has no rows → null
    assert got == {1: 100.0, 2: 200.0, 3: None}
    fwd = asof_join(left, right, on="t", by=["k"], direction="forward",
                    right_cols=["px"])
    got_f = {r["id"]: r["px"] for r in fwd.collect()}
    assert got_f == {1: 200.0, 2: 300.0, 3: None}


def test_asof_join_equal_time_matches(spark):
    from tablite_spark.operators.joins import asof_join
    left = spark.createDataFrame([(1, 10)], "id int, t int")
    right = spark.createDataFrame([(10, 5.0)], "t int, px double")
    out = asof_join(left, right, on="t", by=[], right_cols=["px"])
    assert out.first()["px"] == 5.0  # <= semantics: same instant matches


def test_asof_join_duplicate_timestamp_deterministic(spark):
    """Tied right timestamps resolve internally to max(payload struct)
    — the same winner regardless of partitioning or input order."""
    from tablite_spark.operators.joins import asof_join
    left = spark.createDataFrame([(1, "u", 10)], "id int, k string, t int")
    rows = [("u", 8, 100.0), ("u", 8, 300.0), ("u", 8, 200.0)]
    for perm in (rows, rows[::-1], [rows[1], rows[2], rows[0]]):
        right = spark.createDataFrame(perm, "k string, t int, px double")
        out = asof_join(left, right.repartition(3), on="t", by=["k"],
                        right_cols=["px"])
        assert out.first()["px"] == 300.0


def test_asof_join_collision_raises(spark):
    import pytest as _pytest

    from tablite_spark.operators.joins import asof_join
    left = spark.createDataFrame([(1, 10, 0.0)], "id int, t int, px double")
    right = spark.createDataFrame([(10, 5.0)], "t int, px double")
    with _pytest.raises(ValueError, match="collide"):
        asof_join(left, right, on="t", by=[], right_cols=["px"])


def test_range_join_containment(spark):
    from tablite_spark.operators.joins import range_join
    left = spark.createDataFrame(
        [(1, 5.0), (2, 15.0), (3, 25.0), (4, 10.0)], "id int, v double")
    right = spark.createDataFrame(
        [(100, 0.0, 10.0), (200, 10.0, 20.0), (300, 50.0, 60.0)],
        "band int, lo double, hi double")
    out = range_join(left, right, "v", "lo", "hi")
    pairs = sorted((r["id"], r["band"]) for r in out.collect())
    # inclusive bounds: v=10 hits both [0,10] and [10,20]
    assert pairs == [(1, 100), (2, 200), (4, 100), (4, 200)]


def test_range_join_by_keys_and_bins(spark):
    from tablite_spark.operators.joins import range_join
    left = spark.createDataFrame(
        [("a", 5.0), ("b", 5.0)], "k string, v double")
    right = spark.createDataFrame(
        [("a", 0.0, 10.0)], "k string, lo double, hi double")
    out = range_join(left, right, "v", "lo", "hi", by=["k"], bin_width=2.5)
    assert [r["k"] for r in out.collect()] == ["a"]


def test_range_join_is_equi_join_plan(spark):
    """The plan must contain a hash/sort-merge EQUI join — never a
    BroadcastNestedLoop/Cartesian — that's the whole point."""
    from tablite_spark.operators.joins import range_join
    from tablite_spark.plans.audit import _formatted
    left = spark.range(1000).select(F.col("id"), (F.col("id") % 97).cast("double").alias("v"))
    right = spark.range(50).select(F.col("id").alias("band"),
                                   (F.col("id") * 2.0).alias("lo"),
                                   (F.col("id") * 2.0 + 3.0).alias("hi"))
    s = _formatted(range_join(left, right, "v", "lo", "hi", bin_width=3.0))
    assert "NestedLoop" not in s and "Cartesian" not in s, s
