"""Bucketed tables: shuffle-free co-located joins, bucket pruning,
cross-session re-registration. Plan assertions ARE the feature here —
the values are ordinary join results; what bucketing buys is the
absence of exchanges at 100 TB."""

import tempfile

import pytest
from pyspark.sql import functions as F

from tablite_spark.operators.bucketing import (
    bucketed_join, forced_bucketed_scan, read_bucketed,
    register_bucketed, save_bucketed,
)
from tablite_spark.plans import plan_report
from tablite_spark.plans.audit import _formatted

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed(spark):
    tmp = tempfile.mkdtemp(prefix="bkt_test_")
    o = spark.read.parquet(f"{SF}/orders.parquet")
    c = spark.read.parquet(f"{SF}/customer.parquet")
    save_bucketed(o, "tb_orders", ["o_custkey"], 4, path=f"{tmp}/o")
    save_bucketed(c, "tb_customer", ["c_custkey"], 4, path=f"{tmp}/c")
    return tmp, o, c


def test_bucketed_join_zero_exchanges(spark, bucketed):
    """The join itself plans NO Exchange on either side: both scans
    report Bucketed: true and SMJ consumes their hash partitioning
    directly."""
    j = bucketed_join(spark, "tb_orders", "tb_customer",
                      on=[F.col("o_custkey") == F.col("c_custkey")])
    s = _formatted(j)
    assert "SortMergeJoin" in s
    assert plan_report(j)["shuffles"] == 0, s
    assert s.count("Bucketed: true") == 2, s


def test_bucketed_join_values_match_plain_join(spark, bucketed):
    _, o, c = bucketed
    j = bucketed_join(spark, "tb_orders", "tb_customer",
                      on=[F.col("o_custkey") == F.col("c_custkey")])
    got = (j.groupBy("c_mktsegment")
           .agg(F.count("*").alias("n"),
                F.round(F.sum("o_totalprice"), 2).alias("rev")))
    exp = (o.join(c, o["o_custkey"] == c["c_custkey"])
           .groupBy("c_mktsegment")
           .agg(F.count("*").alias("n"),
                F.round(F.sum("o_totalprice"), 2).alias("rev")))
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, exp.collect()))


def test_bucket_pruning_point_lookup(spark, bucketed):
    """Equality on the bucket key reads 1-of-n buckets under
    forced_bucketed_scan (the planner otherwise disables bucketed
    scanning for bare scans)."""
    _, o, _ = bucketed
    key = o.select("o_custkey").first()[0]
    lt = read_bucketed(spark, "tb_orders")
    with forced_bucketed_scan(spark):
        flt = lt.filter(F.col("o_custkey") == key)
        s = _formatted(flt)
        assert "SelectedBucketsCount: 1 out of 4" in s, s
        n = flt.count()
    assert n == o.filter(F.col("o_custkey") == key).count()


def test_register_bucketed_survives_catalog_loss(spark, bucketed):
    """Files outlive the in-memory catalog; register_bucketed
    rebuilds the bucket-spec metadata over the existing path and the
    join is exchange-free again (a plain read.parquet of the same
    files would shuffle)."""
    tmp, o, _ = bucketed
    spark.sql("DROP TABLE tb_orders")
    register_bucketed(spark, "tb_orders", f"{tmp}/o",
                      ["o_custkey"], 4)
    lt = read_bucketed(spark, "tb_orders")
    assert lt.count() == o.count()
    j = bucketed_join(spark, "tb_orders", "tb_customer",
                      on=[F.col("o_custkey") == F.col("c_custkey")])
    assert plan_report(j)["shuffles"] == 0
    # the negative control: same files without the spec DO shuffle
    plain = (spark.read.parquet(f"{tmp}/o")
             .join(spark.table("tb_customer").hint("merge"),
                   on=[F.col("o_custkey") == F.col("c_custkey")]))
    assert plan_report(plain)["shuffles"] >= 1
