"""Table facade parity surface: construction API, writers, sort
aliases (reference: tablite/base.py, core.py)."""

import pytest
from pyspark.sql import functions as F

from tablite_spark import Table


@pytest.fixture()
def t(spark):
    return Table(spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k int, v string"))


def test_add_columns_and_column(spark, t):
    t.add_columns("x", "y")
    assert t.columns == ["k", "v", "x", "y"]
    assert t.df.filter(F.col("x").isNull()).count() == 3
    t.add_column("z", F.col("k") * 10)
    assert [r["z"] for r in sorted(t.df.collect(), key=lambda r: r["k"])] \
        == [10, 20, 30]
    t.add_column("c", 7)
    assert t.df.filter(F.col("c") == 7).count() == 3


def test_setitem_foreign_table_name_collision(spark, t):
    """t['v'] = other['v'] must copy OTHER's data even when the source
    column name collides with one of t's own columns."""
    other = Table(spark.createDataFrame(
        [("X",), ("Y",), ("Z",)], "v string"))
    t["v"] = other["v"]
    assert sorted(r["v"] for r in t.df.collect()) == ["X", "Y", "Z"]
    assert t.df.count() == 3


def test_setitem_own_column_copy(spark, t):
    t["w"] = t["v"]
    rows = sorted(t.df.collect(), key=lambda r: r["k"])
    assert [r["w"] for r in rows] == [r["v"] for r in rows]


def test_table_hashable(spark, t):
    assert len({t, t}) == 1  # identity hash, no Spark job


def test_add_rows(spark, t):
    t.add_rows((4, "d"), {"k": 5, "v": "e"})
    assert t.df.count() == 5
    assert t.df.filter(F.col("v") == "e").first()["k"] == 5


def test_clear_keeps_schema(spark, t):
    t.clear()
    assert t.df.count() == 0
    assert t.columns == ["k", "v"]


def test_items(spark, t):
    d = dict(t.items())
    assert sorted(d["k"]) == [1, 2, 3]
    assert sorted(d["v"]) == ["a", "b", "c"]


def test_nbytes_positive(spark, t):
    assert t.nbytes() > 0


def test_sorted_alias_and_sort_index(spark, t):
    s = t.sorted({"k": True})
    assert [r["k"] for r in s.df.collect()] == [3, 2, 1]
    idx = t.sort_index({"k": True})
    assert idx.columns == ["row_id"]
    assert [r["row_id"] for r in idx.df.collect()] == [2, 1, 0]


def test_ods_writer_roundtrip(spark, t, tmp_path):
    path = str(tmp_path / "t.ods")
    t.to_ods(path)
    from tablite_spark.sources.ods import read_ods
    back = read_ods(spark, path)
    assert back.columns == ["k", "v"]
    rows = sorted(back.collect(), key=lambda r: r["k"])
    assert [r["k"] for r in rows] == [1, 2, 3]
    assert [r["v"] for r in rows] == ["a", "b", "c"]


def test_tsv_text_writers(spark, t, tmp_path):
    from tablite_spark.sources.io import read_csv
    p1, p2 = str(tmp_path / "t_tsv"), str(tmp_path / "t_txt")
    t.to_tsv(p1)
    t.to_text(p2)
    b1 = read_csv(spark, p1 + "/*.csv", delimiter="\t", guess_datatypes=False)
    b2 = read_csv(spark, p2 + "/*.csv", delimiter="|", guess_datatypes=False)
    assert b1.count() == 3 and b1.columns == ["k", "v"]
    assert b2.count() == 3 and b2.columns == ["k", "v"]


def test_list_assignment_positional(spark, t):
    """The reference's flagship idiom (README.md:112):
    t['A'] = [f(x) for x in t['A']]."""
    squares = [r[0] ** 2 for r in t["k"].rows]
    t["sq"] = squares
    rows = sorted(t.df.collect(), key=lambda r: r["k"])
    assert [r["sq"] for r in rows] == [1, 4, 9]
    # overwrite an existing column positionally
    t["v"] = ["x", "y", "z"]
    rows = sorted(t.df.collect(), key=lambda r: r["k"])
    assert [r["v"] for r in rows] == ["x", "y", "z"]


def test_list_assignment_length_mismatch(spark, t):
    with pytest.raises(ValueError, match="length mismatch"):
        t["bad"] = [1, 2]


def test_column_view_surface(spark, t):
    """t['v'] is the reference's Column object: statistics/unique/
    histogram/count/iteration directly on the column."""
    cv = t["v"]
    assert cv.name == "v"
    stats = cv.statistics()
    assert stats["summary_rows"] == 3
    assert stats["min"] == "a" and stats["max"] == "c"
    assert sorted(cv.unique().df.toPandas()["v"]) == ["a", "b", "c"]
    assert cv.count("a") == 1
    hist = cv.histogram().df.collect()
    assert len(hist) == 3
    assert sorted(cv) == ["a", "b", "c"]
    assert sorted(cv.to_list()) == ["a", "b", "c"]


def test_column_view_is_table(spark, t):
    from tablite_spark.table import ColumnView
    cv = t["k"]
    assert isinstance(cv, ColumnView)
    assert cv.df.count() == 3
