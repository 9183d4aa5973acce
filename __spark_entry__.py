"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query on sf0.001.
``queries()`` maps every implemented SURVEY §2 operator to a callable
``(spark, sf_dir) -> DataFrame``; ``oracle_sql()`` holds the DuckDB
equivalent. Column names are aliased identically on both sides; money
aggregates are ROUND()ed on both sides so float summation order can't
flip the value-hash.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

SF_SMOKE = "/root/testdata/sf0.001"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from tablite_spark.session import read_table
    return read_table(spark, sf_dir, name)


# --------------------------------------------------------------------
# flagship
# --------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H Q1-style pricing summary on sf0.001."""
    return q1_pricing_summary(spark, SF_SMOKE)


# --------------------------------------------------------------------
# relational queries (SURVEY §2)
# --------------------------------------------------------------------

def _cents(col):
    """Exact-cents summation: round each term to integer cents BEFORE
    summing, so the sum is integer-exact and identical regardless of
    partitioning / summation order (then scale back to currency)."""
    return F.sum(F.round(col * 100, 0)) / 100


def q1_pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    li = _t(spark, sf, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.to_timestamp(F.lit("1998-09-02")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            _cents(F.col("l_extendedprice")).alias("sum_base_price"),
            _cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q3_shipping_revenue(spark: SparkSession, sf: str) -> DataFrame:
    cust = _t(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    j = (cust.join(orders, cust.c_custkey == orders.o_custkey)
         .join(li, orders.o_orderkey == li.l_orderkey))
    return (j.groupBy("o_orderkey")
            .agg(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
            .filter(F.col("revenue") > 100000))


def q5_nation_revenue(spark: SparkSession, sf: str) -> DataFrame:
    region = _t(spark, sf, "region")
    nation = _t(spark, sf, "nation")
    cust = _t(spark, sf, "customer")
    orders = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    supplier = _t(spark, sf, "supplier")
    j = (li.join(orders, li.l_orderkey == orders.o_orderkey)
         .join(cust, orders.o_custkey == cust.c_custkey)
         .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
         .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
         .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey))
    return (j.groupBy("n_name")
            .agg(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")))


def filter_pass(spark: SparkSession, sf: str) -> DataFrame:
    from tablite_spark.operators.filters import filter_pass_fail
    li = _t(spark, sf, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_discount")
    t, _f = filter_pass_fail(li, [
        {"column1": "l_quantity", "criteria": ">=", "value2": 25.0},
        {"column1": "l_discount", "criteria": "<=", "value2": 0.05},
    ], "all")
    return t


def filter_fail(spark: SparkSession, sf: str) -> DataFrame:
    from tablite_spark.operators.filters import filter_pass_fail
    li = _t(spark, sf, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_discount")
    _t_, f = filter_pass_fail(li, [
        {"column1": "l_quantity", "criteria": ">=", "value2": 25.0},
        {"column1": "l_discount", "criteria": "<=", "value2": 0.05},
    ], "all")
    return f


def filter_any(spark: SparkSession, sf: str) -> DataFrame:
    from tablite_spark.operators.filters import filter_pass_fail
    li = _t(spark, sf, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    t, _f = filter_pass_fail(li, [
        {"column1": "l_quantity", "criteria": ">=", "value2": 49.0},
        {"column1": "l_returnflag", "criteria": "==", "value2": "R"},
    ], "any")
    return t


def filter_expression(spark: SparkSession, sf: str) -> DataFrame:
    from tablite_spark.operators.filters import mask_from_string
    li = _t(spark, sf, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    return li.filter(mask_from_string("all((l_quantity >= 30, l_returnflag == 'R'))"))


def filter_substring_in(spark: SparkSession, sf: str) -> DataFrame:
    """tablite's `in` = substring containment (tablite/mp_utils.py:13-18)."""
    from tablite_spark.operators.filters import filter_pass_fail
    p = _t(spark, sf, "part").select("p_partkey", "p_name", "p_type")
    t, _f = filter_pass_fail(p, [
        {"value1": "ECO", "criteria": "in", "column2": "p_type"},
    ], "all")
    return t


def filter_callable(spark: SparkSession, sf: str) -> DataFrame:
    """any/all with a python callable predicate (tablite/core.py:441-481)
    — the row-at-a-time UDF slow path, kept for parity."""
    from tablite_spark.operators.filters import any_all
    o = _t(spark, sf, "orders").select("o_orderkey", "o_totalprice")
    return any_all(o, {"o_orderkey": lambda v: v % 3 == 0}, "all")


def groupby_accumulators(spark: SparkSession, sf: str) -> DataFrame:
    from tablite_spark.operators.groupby import GroupBy, groupby
    li = _t(spark, sf, "lineitem")
    g = groupby(li, ["l_returnflag"], [
        ("l_quantity", GroupBy.sum),
        ("l_quantity", GroupBy.min),
        ("l_quantity", GroupBy.max),
        ("l_quantity", GroupBy.avg),
        ("l_quantity", GroupBy.count),
        ("l_quantity", GroupBy.count_unique),
        ("l_quantity", GroupBy.stdev),
        ("l_quantity", GroupBy.median),
    ])
    return g.select(
        "l_returnflag",
        F.round(F.col("Sum(l_quantity)"), 2).alias("sum_q"),
        F.col("Min(l_quantity)").alias("min_q"),
        F.col("Max(l_quantity)").alias("max_q"),
        F.round(F.col("Average(l_quantity)"), 4).alias("avg_q"),
        F.col("Count(l_quantity)").alias("cnt"),
        F.col("CountUnique(l_quantity)").alias("cntu"),
        F.round(F.col("StandardDeviation(l_quantity)"), 4).alias("stdev_q"),
        F.round(F.col("Median(l_quantity)"), 4).alias("median_q"),
    )


def distinct_keys(spark: SparkSession, sf: str) -> DataFrame:
    from tablite_spark.operators.groupby import groupby
    li = _t(spark, sf, "lineitem")
    return groupby(li, ["l_returnflag", "l_linestatus"], [])


def unique_first(spark: SparkSession, sf: str) -> DataFrame:
    """unique_index: first row per key, by explicit order (base.py:1967-1989)."""
    from tablite_spark.operators.sorting import unique_index
    o = _t(spark, sf, "orders")
    u = unique_index(o, ["o_orderstatus", "o_orderpriority"], order_by=["o_orderkey"])
    return u.select("o_orderstatus", "o_orderpriority", "o_orderkey")


def join_inner(spark: SparkSession, sf: str) -> DataFrame:
    from tablite_spark.operators.joins import join
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    j = join(o, c, ["o_custkey"], ["c_custkey"],
             left_columns=["o_orderkey", "o_totalprice"],
             right_columns=["c_name", "c_mktsegment"], kind="inner")
    return j.filter(F.col("o_totalprice") > 400000)


def join_left(spark: SparkSession, sf: str) -> DataFrame:
    from tablite_spark.operators.joins import join
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders").filter(F.col("o_totalprice") > 450000)
    return join(c, o, ["c_custkey"], ["o_custkey"],
                left_columns=["c_custkey", "c_name"],
                right_columns=["o_orderkey", "o_totalprice"], kind="left")


def join_outer_merge_keys(spark: SparkSession, sf: str) -> DataFrame:
    from tablite_spark.operators.joins import join
    a = _t(spark, sf, "orders").filter(F.col("o_orderkey") % 3 == 0) \
        .select(F.col("o_orderkey").alias("k"), "o_totalprice")
    b = _t(spark, sf, "orders").filter(F.col("o_orderkey") % 3 == 1) \
        .select(F.col("o_orderkey").alias("k"), "o_orderstatus")
    return join(a, b, ["k"], ["k"], kind="outer", merge_keys=True)


def join_cross(spark: SparkSession, sf: str) -> DataFrame:
    from tablite_spark.operators.joins import join
    r = _t(spark, sf, "region")
    s = _t(spark, sf, "supplier")
    return join(r, s, None, None,
                left_columns=["r_regionkey", "r_name"],
                right_columns=["s_suppkey", "s_name"], kind="cross")


def join_semi(spark: SparkSession, sf: str) -> DataFrame:
    """match with keep_right=[] == left-semi (tablite/match.py:6-102)."""
    from tablite_spark.operators.joins import match
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders").filter(F.col("o_totalprice") > 400000)
    return match(c, o, [("c_custkey", "o_custkey")],
                 keep_left=["c_custkey", "c_name"], keep_right=[])


def join_anti(spark: SparkSession, sf: str) -> DataFrame:
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders").filter(F.col("o_totalprice") > 400000)
    return (c.join(o, c.c_custkey == o.o_custkey, "left_anti")
            .select("c_custkey", "c_name"))


def join_nullsafe(spark: SparkSession, sf: str) -> DataFrame:
    """None is a joinable key (tablite/joins.py:201-210)."""
    from tablite_spark.operators.joins import join
    c = _t(spark, sf, "customer").select(
        F.nullif(F.col("c_nationkey") % 5, F.lit(3)).alias("k"),
        "c_custkey")
    s = _t(spark, sf, "supplier").select(
        F.nullif(F.col("s_nationkey") % 5, F.lit(3)).alias("k"),
        "s_suppkey")
    j = join(c, s, ["k"], ["k"], left_columns=["k", "c_custkey"],
             right_columns=["s_suppkey"], kind="inner")
    return j.groupBy("k").agg(F.count(F.lit(1)).alias("n_pairs"),
                              F.sum("s_suppkey").alias("sum_supp"))


def lookup_first_match(spark: SparkSession, sf: str) -> DataFrame:
    """First-match theta join (tablite/lookup.py:14-110): for each order,
    the first lineitem (by shipdate, linenumber) shipped on/after the
    order date."""
    o = _t(spark, sf, "orders").select("o_orderkey", "o_orderdate")
    li = _t(spark, sf, "lineitem").select("l_orderkey", "l_shipdate", "l_linenumber")
    j = o.join(li, (o.o_orderkey == li.l_orderkey) & (li.l_shipdate >= o.o_orderdate), "left")
    # first match as min(struct) — partial-aggregable map-side, unlike a
    # window rank which shuffles every matched pair
    best = F.when(li.l_shipdate.isNotNull(),
                  F.struct(li.l_shipdate.alias("sd"),
                           li.l_linenumber.alias("ln")))
    return (j.groupBy("o_orderkey")
            .agg(F.min(best).alias("b"))
            .select("o_orderkey",
                    F.col("b.sd").cast("date").alias("first_ship"),
                    F.col("b.ln").alias("l_linenumber")))


def pivot_wide(spark: SparkSession, sf: str) -> DataFrame:
    from tablite_spark.operators.groupby import GroupBy, pivot
    li = _t(spark, sf, "lineitem")
    p = pivot(li, ["l_returnflag"], ["l_linestatus"], [("l_quantity", GroupBy.sum)])
    cols = [F.col("l_returnflag")]
    for c in sorted(p.columns):
        if c != "l_returnflag":
            cols.append(F.round(F.col(f"`{c}`"), 2).alias(c))
    return p.select(*cols)


def melt_long(spark: SparkSession, sf: str) -> DataFrame:
    from tablite_spark.operators.groupby import melt
    p = _t(spark, sf, "part").select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        F.col("p_retailprice").alias("p_retailprice"))
    return melt(p, ids=["p_partkey"], values=["p_size", "p_retailprice"],
                variable_name="attr", value_name="val")


def window_topn(spark: SparkSession, sf: str) -> DataFrame:
    c = _t(spark, sf, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc())
    return (c.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 3)
            .select("c_mktsegment", "rn", "c_custkey", "c_acctbal"))


def window_running_sum(spark: SparkSession, sf: str) -> DataFrame:
    o = _t(spark, sf, "orders")
    w = (W.partitionBy("o_custkey")
         .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    return o.select(
        "o_custkey", "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"))


def window_lag(spark: SparkSession, sf: str) -> DataFrame:
    o = _t(spark, sf, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
    return o.select(
        "o_custkey", "o_orderkey",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        (F.datediff(F.col("o_orderdate"),
                    F.lag("o_orderdate").over(w))).alias("days_since_prev"))


def slice_step(spark: SparkSession, sf: str) -> DataFrame:
    """t[10:200:7] over orders ordered by o_orderkey (base.py:1205-1287)."""
    from tablite_spark.operators.sorting import slice_rows
    o = _t(spark, sf, "orders").select("o_orderkey", "o_totalprice")
    return slice_rows(o, 10, 200, 7, order_by=["o_orderkey"])


def concat_tables(spark: SparkSession, sf: str) -> DataFrame:
    from tablite_spark.operators.setops import concat
    li = _t(spark, sf, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity")
    a = li.filter(F.col("l_quantity") < 3)
    b = li.filter(F.col("l_quantity") > 48)
    return concat(a, b)


def stack_tables(spark: SparkSession, sf: str) -> DataFrame:
    from tablite_spark.operators.setops import stack
    a = _t(spark, sf, "nation").select("n_nationkey", "n_name")
    b = _t(spark, sf, "region").select(
        F.col("r_regionkey").alias("n_nationkey"), F.col("r_name").alias("r_name"))
    return stack(a, b)


def repeat_table(spark: SparkSession, sf: str) -> DataFrame:
    from tablite_spark.operators.setops import repeat
    n = _t(spark, sf, "nation").select("n_nationkey", "n_name")
    return repeat(n, 3)


def replace_values_q(spark: SparkSession, sf: str) -> DataFrame:
    from tablite_spark.operators.filters import replace_values
    n = _t(spark, sf, "nation").select("n_nationkey", "n_name")
    return replace_values(n, {"CHINA": "PRC", "UNITED STATES": "USA"}, ["n_name"])


def drop_rows_q(spark: SparkSession, sf: str) -> DataFrame:
    from tablite_spark.operators.filters import drop_rows_with
    li = _t(spark, sf, "lineitem").select("l_orderkey", "l_returnflag", "l_linestatus")
    return drop_rows_with(li, "R", "F")


def column_select_pass(spark: SparkSession, sf: str) -> DataFrame:
    """Cast-with-reject gate (tablite/core.py:704-733)."""
    from tablite_spark.operators.select import column_select
    o = _t(spark, sf, "orders").select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 3 == 0, F.col("o_orderkey").cast("string"))
         .otherwise(F.concat(F.lit("x"), F.col("o_orderkey").cast("string")))
         .alias("v"))
    p, _f = column_select(o, [
        {"column": "o_orderkey", "type": "int", "rename": "okey"},
        {"column": "v", "type": "int", "rename": "v_int"},
    ])
    return p


def column_select_fail(spark: SparkSession, sf: str) -> DataFrame:
    from tablite_spark.operators.select import column_select
    o = _t(spark, sf, "orders").select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 3 == 0, F.col("o_orderkey").cast("string"))
         .otherwise(F.concat(F.lit("x"), F.col("o_orderkey").cast("string")))
         .alias("v"))
    _p, f = column_select(o, [
        {"column": "o_orderkey", "type": "int", "rename": "okey"},
        {"column": "v", "type": "int", "rename": "v_int"},
    ])
    return f.select("o_orderkey", "v", "reject_reason")


def imputation_ffill(spark: SparkSession, sf: str) -> DataFrame:
    """Carry-forward imputation over an explicit order
    (tablite/imputation.py:12-158)."""
    from tablite_spark.operators.imputation import carry_forward
    e = _t(spark, sf, "events").select(
        "event_id",
        F.when(F.col("event_id") % 7 == 0, F.lit(None).cast("double"))
         .otherwise(F.col("value")).alias("value"))
    out = carry_forward(e, ["value"], order_by=["event_id"])
    return out.select("event_id", F.round(F.col("value"), 2).alias("value"))


def imputation_mean(spark: SparkSession, sf: str) -> DataFrame:
    from tablite_spark.operators.imputation import fill_mean
    e = _t(spark, sf, "events").select(
        "event_id",
        F.when(F.col("event_id") % 7 == 0, F.lit(None).cast("double"))
         .otherwise(F.col("value")).alias("value"))
    out = fill_mean(e, ["value"])
    return out.select("event_id", F.round(F.col("value"), 2).alias("value"))


def statistics_summary(spark: SparkSession, sf: str) -> DataFrame:
    li = _t(spark, sf, "lineitem")
    c = F.col("l_quantity")
    return li.agg(
        F.min(c).alias("min"),
        F.max(c).alias("max"),
        F.round(F.avg(c), 4).alias("mean"),
        F.round(F.median(c), 4).alias("median"),
        F.round(F.stddev_samp(c), 4).alias("stdev"),
        F.count_distinct(c).alias("distinct"),
        F.round(F.sum(c), 2).alias("sum"),
        F.count(c).alias("non_null"),
    )


def histogram_q(spark: SparkSession, sf: str) -> DataFrame:
    from tablite_spark.operators.stats import histogram
    o = _t(spark, sf, "orders")
    return histogram(o, "o_orderpriority")


def xround_buckets(spark: SparkSession, sf: str) -> DataFrame:
    """xround: bucket prices to 1000s (tablite/datatypes.py:325-371)."""
    from tablite_spark.functions.rounding import xround
    o = _t(spark, sf, "orders")
    return (o.select(xround(F.col("o_totalprice"), 1000, up=False)
                     .cast("long").alias("bucket"))
            .groupBy("bucket").agg(F.count(F.lit(1)).alias("n")))


def diff_tables(spark: SparkSession, sf: str) -> DataFrame:
    from tablite_spark.operators.setops import table_diff
    a = _t(spark, sf, "nation").filter(F.col("n_nationkey") < 15) \
        .select("n_nationkey", "n_name")
    b = _t(spark, sf, "nation").filter(F.col("n_nationkey") >= 10) \
        .select("n_nationkey", "n_name")
    return table_diff(a, b)


def sessionize_events(spark: SparkSession, sf: str) -> DataFrame:
    """Sessionization: 30-min-gap sessions per user via lag+cumsum —
    the batch form of session windows (additive capability, SURVEY §2.8)."""
    e = _t(spark, sf, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    gap = (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w)))
    new_sess = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    sess = (e.withColumn("new_sess", new_sess)
            .withColumn("session_seq", F.sum("new_sess").over(
                w.rowsBetween(W.unboundedPreceding, W.currentRow))))
    return (sess.groupBy("user_id", "session_seq")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 (F.sum(F.round(F.col("value") * 100, 0)) / 100)
                 .alias("session_value")))


def tumbling_window(spark: SparkSession, sf: str) -> DataFrame:
    """Tumbling 1-hour event-time window aggregation (batch form of
    Structured Streaming's window(); SURVEY §2.8)."""
    e = _t(spark, sf, "events")
    return (e.groupBy(F.date_trunc("hour", F.col("ts")).alias("hour_start"),
                      F.col("event_type"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("value"), 2).alias("total_value"))
            .withColumn("hour_start", F.date_format("hour_start", "yyyy-MM-dd HH:mm:ss")))


def hopping_window(spark: SparkSession, sf: str) -> DataFrame:
    """Batch hopping (sliding) windows — native F.window with slide
    (1h windows every 15min): each event lands in 4 overlapping
    windows via Catalyst's Expand, no self-join."""
    e = _t(spark, sf, "events")
    return (e.groupBy(F.window("ts", "1 hour", "15 minutes"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 (F.sum(F.round(F.col("value") * 100, 0)) / 100).alias("val_sum"))
            .select(F.col("window.start").alias("w_start"),
                    "event_type", "n", "val_sum"))


def merge_where_case(spark: SparkSession, sf: str) -> DataFrame:
    """Table.merge: CASE column merge dropping sources
    (tablite/merge.py:7-50)."""
    from tablite_spark.operators.merge import merge_where
    o = _t(spark, sf, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority", "o_orderstatus")
    m = merge_where(o, "o_orderpriority", "o_orderstatus", "label",
                    F.col("o_totalprice") > 200000)
    return m.select("o_orderkey", "label")


def groupby_mode(spark: SparkSession, sf: str) -> DataFrame:
    """Mode accumulator (nimlite/funcs/groupby.nim:394-441)."""
    from tablite_spark.operators.groupby import GroupBy, groupby
    li = _t(spark, sf, "lineitem")
    g = groupby(li, ["l_returnflag"], [("l_linenumber", GroupBy.mode)])
    return g.select("l_returnflag",
                    F.col("Mode(l_linenumber)").alias("mode_ln"))


def groupby_product(spark: SparkSession, sf: str) -> DataFrame:
    """Product accumulator (nimlite/funcs/groupby.nim:107-152)."""
    from tablite_spark.operators.groupby import GroupBy, groupby
    li = _t(spark, sf, "lineitem").filter(F.col("l_orderkey") < 1000) \
        .withColumn("disc1", 1 + F.col("l_discount"))
    g = groupby(li, ["l_orderkey"], [("disc1", GroupBy.product)])
    return g.select("l_orderkey",
                    F.round(F.col("Product(disc1)"), 4).alias("prod_disc"))


def sort_mixed_excel(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-type 'excel' collation: numeric < text < bool < None
    (tablite/sort_utils.py:152-173) over a string-coded mixed column;
    output position proves the total order."""
    from tablite_spark.operators.sorting import _mixed_sort_key
    o = _t(spark, sf, "orders").filter(F.col("o_orderkey") < 2000).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 4 == 0,
               F.col("o_totalprice").cast("string"))
         .when(F.col("o_orderkey") % 4 == 1, F.col("o_orderpriority"))
         .when(F.col("o_orderkey") % 4 == 2,
               F.when(F.col("o_orderkey") % 8 == 2, F.lit("true")).otherwise(F.lit("false")))
         .alias("v"))
    keys = [k.asc_nulls_last() for k in _mixed_sort_key("v", "excel")]
    keys.append(F.col("o_orderkey").asc())
    return o.select(
        (F.row_number().over(W.orderBy(*keys)) - 1).alias("pos"),
        "o_orderkey", "v")


def transpose_region(spark: SparkSession, sf: str) -> DataFrame:
    """Full matrix rotation, first column becomes header
    (tablite/pivots.py:185-198)."""
    from tablite_spark.operators.groupby import transpose
    r = _t(spark, sf, "region").select("r_regionkey", "r_name").orderBy("r_regionkey")
    return transpose(r)


def reindex_rows(spark: SparkSession, sf: str) -> DataFrame:
    """Reorder rows by integer positions, -1 → null row
    (tablite/core.py:375-392)."""
    from tablite_spark.operators.sorting import reindex
    n = _t(spark, sf, "nation").select("n_nationkey", "n_name")
    return reindex(n, [5, 3, -1, 7, 20], order_by=["n_nationkey"])


def imputation_mode(spark: SparkSession, sf: str) -> DataFrame:
    """Mode imputation (tablite/imputation.py:12-158)."""
    from tablite_spark.operators.imputation import fill_mode
    e = _t(spark, sf, "events").select(
        "event_id",
        F.when(F.col("event_id") % 7 == 0, F.lit(None).cast("string"))
         .otherwise(F.col("event_type")).alias("etype"))
    return fill_mode(e, ["etype"])


def imputation_nn(spark: SparkSession, sf: str) -> DataFrame:
    """Nearest-neighbour imputation: rank-normalized L1 distance over
    source columns (nimlite/funcs/imputation.nim:116-275)."""
    from tablite_spark.operators.imputation import nearest_neighbour
    c = _t(spark, sf, "customer").filter(F.col("c_custkey") < 300).select(
        "c_custkey", "c_nationkey",
        F.when(F.col("c_custkey") % 10 == 0, F.lit(None).cast("double"))
         .otherwise(F.round(F.col("c_acctbal"), 2)).alias("bal"))
    out = nearest_neighbour(c, ["bal"], ["c_custkey", "c_nationkey"],
                            tiebreak=["c_custkey"])
    return out.select("c_custkey", F.round(F.col("bal"), 2).alias("bal"))


def imputation_nn_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """Approximate NN imputation via random-hyperplane LSH buckets —
    the 100 TB path (candidates from (table, bucket) equi joins, exact
    re-rank within buckets, exact fallback).

    EXACT-oracled by construction: every null row (odd custkey) has a
    unique distance-0 donor (its even partner shares the same ``pair``
    source value). Identical source vectors hash to identical buckets
    in every LSH table, so the partner is always a candidate, and the
    exact re-rank makes it the unique winner — LSH == exact NN here,
    which DuckDB reproduces with a self-join on the pair key."""
    from tablite_spark.operators.imputation import nearest_neighbour_lsh
    c = _t(spark, sf, "customer").filter(
        (F.col("c_custkey") >= 2) & (F.col("c_custkey") < 600)).select(
        "c_custkey",
        F.floor(F.col("c_custkey") / 2).cast("long").alias("pair"),
        F.when(F.col("c_custkey") % 2 == 1, F.lit(None).cast("double"))
         .otherwise(F.round(F.col("c_acctbal"), 2)).alias("bal"))
    out = nearest_neighbour_lsh(c, ["bal"], ["pair"])
    return out.select("c_custkey", F.round(F.col("bal"), 2).alias("bal"))


def pivot_long(spark: SparkSession, sf: str) -> DataFrame:
    """pivot(values_as_rows=True): wide pivot melted back to
    (keys, function, value) rows (tablite/pivots.py:11-182)."""
    from tablite_spark.operators.groupby import GroupBy, pivot
    li = _t(spark, sf, "lineitem")
    p = pivot(li, ["l_returnflag"], ["l_linestatus"],
              [("l_quantity", GroupBy.sum)], values_as_rows=True)
    return p.select("l_returnflag", "function",
                    F.round(F.col("value"), 2).alias("value"))


def sort_alphanumeric(spark: SparkSession, sf: str) -> DataFrame:
    """'alphanumeric' collation: everything compared as text
    (tablite/sort_utils.py:210-216)."""
    from tablite_spark.operators.sorting import _mixed_sort_key
    o = _t(spark, sf, "orders").filter(F.col("o_orderkey") < 2000).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 3 == 0,
               F.col("o_totalprice").cast("string"))
         .when(F.col("o_orderkey") % 3 == 1, F.col("o_orderpriority"))
         .alias("v"))
    keys = [k.asc_nulls_first() for k in _mixed_sort_key("v", "alphanumeric")]
    keys.append(F.col("o_orderkey").asc())
    return o.select(
        (F.row_number().over(W.orderBy(*keys)) - 1).alias("pos"),
        "o_orderkey", "v")


def drop_duplicates_q(spark: SparkSession, sf: str) -> DataFrame:
    """Table.drop_duplicates on selected columns
    (tablite/core.py:394-404)."""
    from tablite_spark.operators.filters import drop_duplicates
    li = _t(spark, sf, "lineitem").select("l_returnflag", "l_linestatus", "l_linenumber")
    return drop_duplicates(li, "l_returnflag", "l_linestatus", "l_linenumber")


def groupby_first_last(spark: SparkSession, sf: str) -> DataFrame:
    """First/Last accumulators (nimlite/funcs/groupby.nim:155-182) made
    deterministic over an explicit order: first/last order (by orderkey)
    per customer."""
    o = _t(spark, sf, "orders")
    return (o.groupBy("o_custkey")
            .agg(F.min_by("o_totalprice", "o_orderkey").alias("first_price"),
                 F.max_by("o_totalprice", "o_orderkey").alias("last_price")))


def date_range_expand(spark: SparkSession, sf: str) -> DataFrame:
    """date_range generator (tablite/utils.py:401-409) → F.sequence:
    one row per day between orderdate and first shipdate."""
    o = _t(spark, sf, "orders").filter(F.col("o_orderkey") < 100)
    li = _t(spark, sf, "lineitem").groupBy("l_orderkey").agg(
        F.min("l_shipdate").alias("ship"))
    j = o.join(li, o.o_orderkey == li.l_orderkey)
    od = F.col("o_orderdate").cast("date")
    sd = F.col("ship").cast("date")
    days = F.sequence(F.least(od, sd), F.greatest(od, sd))
    return (j.select("o_orderkey", F.explode(days).alias("day"))
            .withColumn("day", F.date_format("day", "yyyy-MM-dd")))


def statistics_text(spark: SparkSession, sf: str) -> DataFrame:
    """Column.statistics str variant — stats over value lengths
    (tablite/utils.py:188-398: strings are measured by length)."""
    c = F.length(F.col("c_name"))
    cust = _t(spark, sf, "customer")
    return cust.agg(
        F.min(c).alias("min_len"),
        F.max(c).alias("max_len"),
        F.round(F.avg(c), 4).alias("avg_len"),
        F.count_distinct(F.col("c_name")).alias("distinct"),
    )


def statistics_dates(spark: SparkSession, sf: str) -> DataFrame:
    """Column.statistics on a temporal column (tablite/utils.py:188-398
    maps date/time to numeric and back). Exact stats only — mode can
    tie and mean/iqr cross approximate paths."""
    from tablite_spark.operators.stats import statistics
    li = _t(spark, sf, "lineitem")
    s = statistics(li, "l_shipdate")
    return s.select("min", "max", "median", "distinct", "non_null")


def index_rowids(spark: SparkSession, sf: str) -> DataFrame:
    """Table.index: key tuple → row ids (tablite/base.py:1927-1965);
    row-id lists serialized sorted so the value-hash is stable."""
    o = _t(spark, sf, "orders").filter(F.col("o_orderkey") < 500)
    return (o.groupBy("o_orderstatus", "o_orderpriority")
            .agg(F.concat_ws(",", F.sort_array(F.collect_list(
                F.col("o_orderkey").cast("string")))).alias("row_ids")))


def sort_unix_mixed(spark: SparkSession, sf: str) -> DataFrame:
    """'unix' collation: None < bool < numeric < text
    (tablite/sort_utils.py:176-207)."""
    from tablite_spark.operators.sorting import _mixed_sort_key
    o = _t(spark, sf, "orders").filter(F.col("o_orderkey") < 2000).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 4 == 0,
               F.col("o_totalprice").cast("string"))
         .when(F.col("o_orderkey") % 4 == 1, F.col("o_orderpriority"))
         .when(F.col("o_orderkey") % 4 == 2,
               F.when(F.col("o_orderkey") % 8 == 2, F.lit("true")).otherwise(F.lit("false")))
         .alias("v"))
    keys = [k.asc_nulls_first() for k in _mixed_sort_key("v", "unix")]
    keys.append(F.col("o_orderkey").asc())
    return o.select(
        (F.row_number().over(W.orderBy(*keys)) - 1).alias("pos"),
        "o_orderkey", "v")


def xround_time_buckets(spark: SparkSession, sf: str) -> DataFrame:
    """DataTypes.round on datetimes: 30-minute buckets
    (tablite/datatypes.py:325-371)."""
    from tablite_spark.functions.rounding import xround_ts
    e = _t(spark, sf, "events")
    return (e.select(xround_ts(F.col("ts"), 1800, up=False).alias("bucket"))
            .groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))
            .withColumn("bucket", F.date_format("bucket", "yyyy-MM-dd HH:mm:ss")))


def csv_roundtrip_agg(spark: SparkSession, sf: str) -> DataFrame:
    """E2E CSV writer→reader proof (tablite from_file/to_csv,
    tablite/core.py:50-218): export lineitem columns to CSV, re-read
    with schema inference, aggregate — oracled against the parquet
    source data, so any reader/writer corruption breaks the value hash."""
    import tempfile

    from tablite_spark.sources.io import read_csv
    li = _t(spark, sf, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    tmp = tempfile.mkdtemp(prefix="csv_rt_")
    path = f"{tmp}/li_csv"
    li.write.mode("overwrite").option("header", True).csv(path)
    back = read_csv(spark, path)
    return (back.groupBy("l_returnflag")
            .agg(_cents(F.col("l_quantity")).alias("sum_qty"),
                 F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("l_orderkey") + F.col("l_linenumber")).alias("key_sum")))


def json_roundtrip_agg(spark: SparkSession, sf: str) -> DataFrame:
    """E2E JSON-lines writer→reader proof (tablite from_json/to_json,
    tablite/import_utils.py:112-122): export nation to JSON, re-read,
    aggregate against the parquet source."""
    import tempfile
    n = _t(spark, sf, "nation").select("n_nationkey", "n_name", "n_regionkey")
    tmp = tempfile.mkdtemp(prefix="json_rt_")
    path = f"{tmp}/nation_json"
    n.write.mode("overwrite").json(path)
    back = spark.read.json(path)
    return (back.groupBy("n_regionkey")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("n_nationkey").alias("key_sum"),
                 F.min("n_name").alias("first_name"))
            .withColumn("n_regionkey", F.col("n_regionkey").cast("long")))


def parquet_roundtrip_agg(spark: SparkSession, sf: str) -> DataFrame:
    """tpz-equivalent persistence proof (tablite/base.py:1350-1453):
    save→load→aggregate matches the source."""
    import tempfile
    from tablite_spark.sources.io import load, save
    li = _t(spark, sf, "lineitem").select("l_orderkey", "l_quantity", "l_returnflag")
    tmp = tempfile.mkdtemp(prefix="pq_rt_")
    save(li, f"{tmp}/li")
    back = load(spark, f"{tmp}/li")
    return (back.groupBy("l_returnflag")
            .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                 F.count(F.lit(1)).alias("n")))


def xlsx_roundtrip_agg(spark: SparkSession, sf: str) -> DataFrame:
    """E2E xlsx writer→reader proof (stdlib SpreadsheetML,
    tablite/import_utils.py:180-368 analogue): export nation, re-read
    via from_file, aggregate against the parquet source."""
    import tempfile

    from tablite_spark.sources.io import from_file
    from tablite_spark.sources.xlsx import to_xlsx
    n = _t(spark, sf, "nation").select("n_nationkey", "n_name", "n_regionkey")
    tmp = tempfile.mkdtemp(prefix="xlsx_rt_")
    path = f"{tmp}/nation.xlsx"
    to_xlsx(n, path)
    back = from_file(spark, path)
    return (back.groupBy("n_regionkey")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("n_nationkey").alias("key_sum"),
                 F.min("n_name").alias("first_name")))


def sql_script_md5(spark: SparkSession, sf: str) -> DataFrame:
    """SQL script writer (sources/io.py:to_sql_script, the reference's
    export_utils.py:12-48 ANSI-92 CREATE+INSERT export): the script
    for key-ordered region must match, byte for byte, the script DuckDB
    assembles from the same rows (md5 + line count)."""
    from tablite_spark.sources.io import to_sql_script
    import hashlib
    r = _t(spark, sf, "region").orderBy("r_regionkey")
    script = to_sql_script(r, "region_x")
    h = hashlib.md5(script.encode()).hexdigest()
    return spark.createDataFrame(
        [(h, script.count("\n") + 1)], "script_md5 string, n_lines long")


def row_iteration_checksum(spark: SparkSession, sf: str) -> DataFrame:
    """Table.rows driver-side iteration (table.py:189, the reference's
    tablite/base.py:1294-1318 row iterator): stream ordered nation
    rows via toLocalIterator and fold an order-sensitive checksum —
    position-weighted key sum + md5 of the name concatenation — so
    the oracle proves completeness AND iteration order, not just
    row count."""
    import hashlib

    from tablite_spark.table import Table
    t = Table(_t(spark, sf, "nation")
              .select("n_nationkey", "n_name").orderBy("n_nationkey"))
    n, weighted, names = 0, 0, []
    for key, name in t.rows:
        n += 1
        weighted += n * key
        names.append(name)
    md5 = hashlib.md5("|".join(names).encode()).hexdigest()
    return spark.createDataFrame(
        [(n, weighted, md5)], "n long, weighted long, name_md5 string")


def get_headers_nation(spark: SparkSession, sf: str) -> DataFrame:
    """get_headers file peek (sources/io.py:get_headers, the
    reference's tools.py:32-36): header names of a written CSV, as
    (position, column_name) rows — pinned by a hard-assertion oracle."""
    import tempfile

    from tablite_spark.sources.io import get_headers, to_csv
    n = _t(spark, sf, "nation")
    tmp = tempfile.mkdtemp(prefix="hdr_")
    path = f"{tmp}/nation.csv"
    to_csv(n, path)
    headers = get_headers(spark, path, linecount=2)[0]
    return spark.createDataFrame(
        list(enumerate(headers)), "pos long, name string")


def construction_api_agg(spark: SparkSession, sf: str) -> DataFrame:
    """Table construction surface (table.py:add_columns/add_column/
    add_rows/clear): build a frame from nothing via the facade, append
    literal rows, aggregate. The oracle recomputes from VALUES."""
    from tablite_spark.table import Table
    t = Table(spark.createDataFrame([], "k int, v string"))
    t = t.add_rows((1, "a"), (2, "b"), {"k": 3, "v": "a"})
    t = t.add_column("w", F.col("k") * 10)
    return t.df.groupBy("v").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k").alias("k_sum"),
        F.sum("w").alias("w_sum"))


def table_equality_check(spark: SparkSession, sf: str) -> DataFrame:
    """Table ``==`` semantics (table.py:__eq__ →
    setops.frames_equal): a copy must equal its source, a
    value-perturbed twin must not, column order must not matter.
    Hard-assertion oracle — the expected booleans are constants."""
    from tablite_spark.table import Table
    n = Table(_t(spark, sf, "nation"))
    same = n == n.copy()
    reordered = n == Table(n.df.select(*reversed(n.df.columns)))
    perturbed = n == Table(
        n.df.withColumn("n_nationkey", F.col("n_nationkey") + 1))
    return spark.createDataFrame(
        [("same", bool(same)), ("reordered", bool(reordered)),
         ("perturbed", bool(perturbed))], "check string, eq boolean")


def rename_reorder_project(spark: SparkSession, sf: str) -> DataFrame:
    """Rename / reorder / delete column surface (table.py:rename,
    __getitem__ column projection, withColumnsRenamed pass-through) —
    oracled as the equivalent SELECT-with-aliases."""
    from tablite_spark.table import Table
    t = Table(_t(spark, sf, "nation"))
    t = t.rename({"n_name": "nation_name", "n_regionkey": "region_id"})
    t = Table(t.df.select("region_id", "nation_name", "n_nationkey"))
    t = Table(t.df.drop("n_nationkey"))
    return t.df.groupBy("region_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("nation_name").alias("first_name"))


def ods_roundtrip_agg(spark: SparkSession, sf: str) -> DataFrame:
    """E2E OpenDocument writer→reader proof (stdlib zip+XML,
    tablite/import_utils.py OpenDocument analogue): export nation,
    re-read via from_file, aggregate against the parquet source."""
    import tempfile

    from tablite_spark.sources.io import from_file
    from tablite_spark.sources.ods import to_ods
    n = _t(spark, sf, "nation").select("n_nationkey", "n_name", "n_regionkey")
    tmp = tempfile.mkdtemp(prefix="ods_rt_")
    path = f"{tmp}/nation.ods"
    to_ods(n, path)
    back = from_file(spark, path)
    return (back.groupBy("n_regionkey")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("n_nationkey").alias("key_sum"),
                 F.min("n_name").alias("first_name")))


def tpz_roundtrip_agg(spark: SparkSession, sf: str) -> DataFrame:
    """E2E native ``.tpz`` archive proof (reference
    tablite/base.py:1350-1453 Table.save/load — zip of table.yml +
    .npy pages): export nation with a None-bearing string column and
    a float column (mixed page dtypes: long + '<U' unicode + pickled
    object-with-None + float64), re-read via from_file suffix
    dispatch, aggregate against the parquet source."""
    import tempfile

    from tablite_spark.sources.io import from_file
    from tablite_spark.sources.tpz import save_tpz
    n = (_t(spark, sf, "nation")
         .select("n_nationkey", "n_name", "n_regionkey",
                 F.when(F.col("n_nationkey") % 3 != 0,
                        F.upper(F.col("n_name"))).alias("maybe_comment"),
                 (F.col("n_nationkey") * 1.5).alias("score")))
    tmp = tempfile.mkdtemp(prefix="tpz_rt_")
    path = save_tpz(n, f"{tmp}/nation.tpz", page_rows=7)
    back = from_file(spark, path, allow_pickle=True)  # trusted: we wrote it
    return (back.groupBy("n_regionkey")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("n_nationkey").alias("key_sum"),
                 F.count("maybe_comment").alias("comments_kept"),
                 F.sum("score").alias("score_sum"),
                 F.min("n_name").alias("first_name")))


def tpz_reference_read(spark: SparkSession, sf: str) -> DataFrame:
    """Migration-interop proof over an archive our OWN writer did NOT
    produce: ``tests/fixtures/reference_table.tpz`` is byte-assembled
    to the reference writer's exact output (tablite/base.py:1350-1418
    — its yaml.safe_dump manifest, ``{pid}-{n}.npy`` page naming,
    object pages pickled as ``tablite.datatypes.MetaArray`` ndarray
    subclasses, a page repeated within a column and one shared by two
    columns incl. the duplicate zip member; generator:
    tools/make_reference_tpz_fixture.py). Plain ``np.load`` cannot
    open its object pages without tablite installed — reading it
    end-to-end exercises the restricted-unpickler MetaArray shim.
    The oracle is the literal cell values, so every column round-trips
    bit-exact (incl. a 2^60+1 long the float64 fallback would corrupt).
    """
    import pathlib

    from tablite_spark.sources.io import from_file
    fixture = (pathlib.Path(__file__).resolve().parent
               / "tests" / "fixtures" / "reference_table.tpz")
    df = from_file(spark, str(fixture), allow_pickle=True)
    return df.select(
        "n_key", "name", "maybe_note", "amount", "score", "ok",
        "created", F.col("day").alias("day_col"),
        F.col("列 tag").alias("tag"), "dup_a", "dup_b",
    ).orderBy("n_key")


def hdf5_foreign_read(spark: SparkSession, sf: str) -> DataFrame:
    """Foreign-layout HDF5 interop: ``tests/fixtures/foreign_layout.h5``
    is byte-assembled (tools/make_foreign_h5_fixture.py) with the
    structures libhdf5/h5py emit but our own writer never does —
    cache_type-0 root entry, level-1 group B-tree over two SNOD
    leaves, NIL/fill/mtime messages in permuted order, an object
    header split by a continuation block, a two-level chunk B-tree
    under a shuffle+deflate pipeline, null-terminated fixed strings,
    vlen strings spanning two GCOL collections, a deferred-allocation
    dataset, a compact dataset, nested groups and rank-0 attributes.
    Returns one row per dataset (name, n, agg) where agg is an exact
    integer/string digest; the oracle pins all values literally, so a
    reader regression on ANY of those structures flips the hash."""
    import os

    from tablite_spark.sources import hdf5lite
    p = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "tests", "fixtures", "foreign_layout.h5")
    data = hdf5lite.read(p)
    rows = []
    for name in sorted(data):
        arr = data[name]
        if arr.dtype.kind in ("i", "u"):
            agg = str(int(arr.sum()))
        elif arr.dtype.kind == "f":
            agg = str(int(round(float(arr.sum()) * 4)))  # exact quarters
        else:  # fixed S / vlen object bytes
            agg = "|".join(v.decode() for v in arr.tolist())
        rows.append((name, len(arr), agg))
    return spark.createDataFrame(rows, "name string, n long, agg string")


def xls_roundtrip_agg(spark: SparkSession, sf: str) -> DataFrame:
    """E2E legacy-.xls proof via the stdlib xlslite codec (OLE2
    compound file + BIFF8 records, sources/xlslite.py — the
    reference's .xls dispatch is tablite/import_utils.py:633-648):
    write nation with the fixture writer, re-read through from_file
    (xlrd absent in this container → xlslite path), aggregate against
    the parquet source."""
    import tempfile

    from tablite_spark.sources.io import from_file
    from tablite_spark.sources.xlslite import write_xls
    n = _t(spark, sf, "nation").select("n_nationkey", "n_name",
                                       "n_regionkey").orderBy("n_nationkey")
    rows = [["n_nationkey", "n_name", "n_regionkey"]]
    rows += [[float(r["n_nationkey"]), r["n_name"], float(r["n_regionkey"])]
             for r in n.collect()]
    tmp = tempfile.mkdtemp(prefix="xls_rt_")
    path = f"{tmp}/nation.xls"
    write_xls(path, rows)
    back = from_file(spark, path)
    return (back.groupBy(F.col("n_regionkey").cast("long")
                          .alias("n_regionkey"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("n_nationkey").cast("long").alias("key_sum"),
                 F.min("n_name").alias("first_name")))


def hdf5_roundtrip_agg(spark: SparkSession, sf: str) -> DataFrame:
    """E2E HDF5 writer→reader proof. Uses h5py when installed, else
    the stdlib hdf5lite codec (classic superblock-v0 format written
    from the public spec, sources/hdf5lite.py) — reference layout is
    one root dataset per column with stringify fallback + re-guess
    (tablite/import_utils.py:72-109, export_utils.py:63-105)."""
    import tempfile

    from tablite_spark.sources.io import from_file, to_hdf5
    n = _t(spark, sf, "nation").select("n_nationkey", "n_name", "n_regionkey")
    tmp = tempfile.mkdtemp(prefix="hdf5_rt_")
    path = f"{tmp}/nation.h5"
    to_hdf5(n, path)
    back = from_file(spark, path)
    return (back.groupBy("n_regionkey")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("n_nationkey").alias("key_sum"),
                 F.min("n_name").alias("first_name")))


def hdf5_chunked_roundtrip_agg(spark: SparkSession, sf: str) -> DataFrame:
    """E2E proof of the round-5 hdf5lite CHUNKED+deflate path (v1
    chunk B-tree, filter pipeline — sources/hdf5lite.py): orders is
    written with explicit chunk_rows so every dataset spans many
    chunks with a partial tail, compressed, re-read through the
    public reader, and aggregated against the parquet source."""
    import tempfile

    from tablite_spark.sources import hdf5lite
    from tablite_spark.sources.io import read_hdf5
    o = _t(spark, sf, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice")
    pdf = o.toPandas()
    path = tempfile.mkdtemp(prefix="hdf5_ck_") + "/orders.h5"
    hdf5lite.write(path, {c: pdf[c].to_numpy() for c in pdf.columns},
                   chunk_rows=1024, compress=True)
    back = read_hdf5(spark, path)
    return (back.groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("o_orderkey").cast("long")).alias("key_sum"),
                 F.round(F.min("o_totalprice"), 2).alias("min_price"),
                 F.round(F.max("o_totalprice"), 2).alias("max_price")))


def xls_dates_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """E2E proof of the round-5 xlslite XF date handling: order dates
    write as serials under a date XF, read back through from_file as
    a guessed TIMESTAMP column (not floats), and aggregate per year
    against the parquet source."""
    import datetime as dt
    import tempfile

    from tablite_spark.sources.io import from_file
    from tablite_spark.sources.xlslite import write_xls
    o = (_t(spark, sf, "orders")
         .filter(F.col("o_orderkey") % 97 == 0)
         .select("o_orderkey", "o_orderdate").orderBy("o_orderkey"))
    rows: list[list] = [["okey", "odate"]]
    rows += [[float(r["o_orderkey"]),
              dt.datetime(r["o_orderdate"].year, r["o_orderdate"].month,
                          r["o_orderdate"].day)]
             for r in o.collect()]
    path = tempfile.mkdtemp(prefix="xls_dt_") + "/dates.xls"
    write_xls(path, rows)
    back = from_file(spark, path)
    return (back.groupBy(F.year("odate").alias("yr"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.min("odate").alias("first_dt"),
                 F.max("odate").alias("last_dt"),
                 F.sum(F.col("okey").cast("long")).alias("key_sum")))


def html_roundtrip_agg(spark: SparkSession, sf: str) -> DataFrame:
    """E2E HTML writer→reader proof (stdlib html.parser scrape +
    type re-guess; tablite/export_utils.py:108-136 analogue)."""
    import tempfile

    from tablite_spark.sources.io import read_html, to_html
    n = _t(spark, sf, "nation").select("n_nationkey", "n_name", "n_regionkey")
    tmp = tempfile.mkdtemp(prefix="html_rt_")
    path = f"{tmp}/nation.html"
    to_html(n, path)
    back = read_html(spark, path)
    return (back.groupBy("n_regionkey")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("n_nationkey").alias("key_sum"),
                 F.min("n_name").alias("first_name")))


def q6_forecast_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q6-style filter+agg: every predicate must reach the parquet
    scan as PushedFilters (plan-asserted in tests/test_plans.py)."""
    li = _t(spark, sf, "lineitem")
    return (li.filter(
                (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01")))
                & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01")))
                & (F.col("l_discount") >= 0.03) & (F.col("l_discount") <= 0.06)
                & (F.col("l_quantity") < 24))
            .agg(_cents(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
                 F.count(F.lit(1)).alias("n")))


def q14_promo_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q14-style: broadcast dim join + conditional aggregate."""
    li = _t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-06-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-08-01"))))
    part = _t(spark, sf, "part").select("p_partkey", "p_type")
    disc = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0)
    return (li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
            .agg((F.sum(F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0.0))) / 100)
                 .alias("promo_revenue"),
                 (F.sum(disc) / 100).alias("total_revenue")))


def q18_large_orders(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q18-style: agg-then-having, semi-joined back to orders and
    customer. The big-side agg happens BEFORE the joins so only
    qualifying orderkeys shuffle into the join."""
    li = _t(spark, sf, "lineitem")
    orders = _t(spark, sf, "orders")
    cust = _t(spark, sf, "customer").select("c_custkey", "c_name")
    big = (li.groupBy("l_orderkey")
           .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
           .filter(F.col("total_qty") > 250))
    return (big.join(orders, big.l_orderkey == orders.o_orderkey)
            .join(cust, orders.o_custkey == cust.c_custkey)
            .select("c_name", "o_orderkey", "o_totalprice", "total_qty"))


def q4_priority_exists(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q4-style: EXISTS subquery as a left-semi join, then count
    by priority. (Testdata quirk: l_shipdate is mostly < o_orderdate,
    so the predicate keeps the match selective.)"""
    orders = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem").select("l_orderkey", "l_shipdate")
    j = orders.join(li, (orders.o_orderkey == li.l_orderkey)
                    & (li.l_shipdate > orders.o_orderdate), "left_semi")
    return j.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


def q19_disjunctive_filter(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q19-style OR-of-ANDs over a broadcast part join — Catalyst
    must push the common branches and prune the scan."""
    li = _t(spark, sf, "lineitem")
    part = _t(spark, sf, "part").select("p_partkey", "p_brand", "p_size")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size") <= 10)
         & (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 20))
        | ((F.col("p_brand") == "Brand#2") & (F.col("p_size") <= 20)
           & (F.col("l_quantity") >= 10) & (F.col("l_quantity") <= 30))
        | ((F.col("p_brand") == "Brand#3") & (F.col("p_size") <= 30)
           & (F.col("l_quantity") >= 20) & (F.col("l_quantity") <= 40)))
    return (j.filter(cond)
            .agg(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
                 .alias("revenue"),
                 F.count(F.lit(1)).alias("n")))


def groupby_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """ROLLUP hierarchy totals — additive beyond the reference (its
    groupby has no grouping sets; SURVEY §2.4 'not present')."""
    li = _t(spark, sf, "lineitem")
    return (li.rollup("l_returnflag", "l_linestatus")
            .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                 F.count(F.lit(1)).alias("n"))
            .select(F.coalesce("l_returnflag", F.lit("ALL")).alias("rf"),
                    F.coalesce("l_linestatus", F.lit("ALL")).alias("ls"),
                    "sum_qty", "n"))


def groupby_cube(spark: SparkSession, sf: str) -> DataFrame:
    """CUBE over two dims — all four grouping sets in one pass
    (additive beyond the reference, like rollup)."""
    o = _t(spark, sf, "orders")
    return (o.cube("o_orderstatus", "o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"),
                 (F.sum(F.round(F.col("o_totalprice") * 100, 0)) / 100)
                 .alias("price_sum"))
            .select(F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
                    F.coalesce("o_orderpriority", F.lit("ALL")).alias("prio"),
                    "n", "price_sum"))


def window_ntile(spark: SparkSession, sf: str) -> DataFrame:
    """ntile bucketing per partition (analytic-function coverage)."""
    o = _t(spark, sf, "orders")
    w = W.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc())
    return o.select("o_orderkey", "o_orderstatus",
                    F.ntile(4).over(w).alias("quartile"))


def count_value_q(spark: SparkSession, sf: str) -> DataFrame:
    """Column.count(item) — type-strict occurrence count
    (tablite/base.py:1026-1072)."""
    from tablite_spark.operators.stats import count_value
    li = _t(spark, sf, "lineitem")
    n = count_value(li, "l_returnflag", "R")
    return spark.createDataFrame([(n,)], "n bigint")


def unique_values_q(spark: SparkSession, sf: str) -> DataFrame:
    """Column.unique (tablite/base.py:956-979)."""
    from tablite_spark.operators.stats import unique_values
    return unique_values(_t(spark, sf, "part"), "p_brand")


def is_sorted_q(spark: SparkSession, sf: str) -> DataFrame:
    """Table.is_sorted (tablite/sortation.py:165-177): nation is stored
    ordered by n_nationkey (true) but not by n_name (false)."""
    from tablite_spark.operators.sorting import is_sorted
    nation = _t(spark, sf, "nation")
    by_key = is_sorted(nation, {"n_nationkey": False})
    by_name = is_sorted(nation, {"n_name": False})
    return spark.createDataFrame([(by_key, by_name)],
                                 "sorted_by_key boolean, sorted_by_name boolean")


def remove_all_q(spark: SparkSession, sf: str) -> DataFrame:
    """Column.remove_all as row filter (tablite/base.py:870-885)."""
    from tablite_spark.table import Table
    nation = Table(_t(spark, sf, "nation"))
    out = nation.remove_all("n_name", "CHINA", "FRANCE", "KENYA")
    return out.df.groupBy("n_regionkey").agg(F.count(F.lit(1)).alias("n"))


def pandas_roundtrip_agg(spark: SparkSession, sf: str) -> DataFrame:
    """pandas bridge both ways (tablite/import_utils.py:40-69,
    export_utils.py:51-60) — Arrow transfer, then aggregate."""
    from tablite_spark.sources.io import from_pandas, to_pandas
    n = _t(spark, sf, "nation").select("n_nationkey", "n_name", "n_regionkey")
    back = from_pandas(spark, to_pandas(n))
    return (back.groupBy("n_regionkey")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("n_nationkey").alias("key_sum")))


def json_columnar_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """tablite's column-major JSON codec ({"columns": {...}})
    (tablite/import_utils.py:112-122, export_utils.py:139-143)."""
    from tablite_spark.sources.io import read_json_columnar, to_json_columnar
    n = _t(spark, sf, "nation").select("n_nationkey", "n_name", "n_regionkey")
    back = read_json_columnar(spark, to_json_columnar(n))
    return (back.groupBy("n_regionkey")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("n_nationkey").alias("key_sum"),
                 F.min("n_name").alias("first_name")))


# --------------------------------------------------------------------
# pipeline operators (documents / embeddings)
# --------------------------------------------------------------------

def dedup_exact(spark: SparkSession, sf: str) -> DataFrame:
    from tablite_spark.pipeline.dedup import exact_dedup
    d = _t(spark, sf, "documents")
    return exact_dedup(d, ["text"], id_col="doc_id").select("doc_id", "n_chars")


def text_stats(spark: SparkSession, sf: str) -> DataFrame:
    from tablite_spark.pipeline.text import text_statistics
    d = _t(spark, sf, "documents")
    return text_statistics(d, "text").select(
        "doc_id", "n_chars_computed", "n_tokens", "n_uniq_tokens",
        F.round(F.col("avg_token_len"), 4).alias("avg_token_len"))


def doc_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    from tablite_spark.pipeline.text import fingerprint
    d = _t(spark, sf, "documents")
    return fingerprint(d, "text").select("doc_id", "fp")


def quality_score(spark: SparkSession, sf: str) -> DataFrame:
    from tablite_spark.pipeline.text import quality_scores
    d = _t(spark, sf, "documents")
    q = quality_scores(d, "text")
    return q.select("doc_id",
                    F.round(F.col("stopword_ratio"), 4).alias("stopword_ratio"),
                    F.round(F.col("quality"), 4).alias("quality"))


def embedding_topk(spark: SparkSession, sf: str) -> DataFrame:
    from tablite_spark.pipeline.similarity import brute_force_topk
    emb = _t(spark, sf, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 3)
    return brute_force_topk(emb, queries_df, k=5,
                            id_col="vec_id", vec_col="embedding")


def trigram_substring_docs(spark: SparkSession, sf: str) -> DataFrame:
    """Substring search via trigram posting intersection (the pg_trgm
    recipe): candidates = docs containing EVERY needle trigram (one
    combinable groupBy == n_trigrams), then an id-keyed join back for
    the exact contains confirm — never a full-corpus LIKE scan when a
    durable index (build_trigram_index) is supplied. The oracle is a
    brute-force LIKE, so any candidate miss mismatches."""
    from tablite_spark.pipeline.retrieval import substring_search
    return substring_search(_t(spark, sf, "documents"), "text",
                            "doc_id", "the table")


def interpolate_events(spark: SparkSession, sf: str) -> DataFrame:
    """Series alignment: each error event gets the user's click-value
    linearly interpolated at the error's timestamp (two asof passes —
    union + ordered carry, one group-keyed shuffle each — then a
    row-local lerp; null outside the sampled range). Oracled against
    DuckDB's native ASOF joins both directions + the same IEEE lerp."""
    from tablite_spark.operators.timeseries import interpolate_at
    e = _t(spark, sf, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value")
    errors = e.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts")
    out = interpolate_at(clicks, errors, "ts", "value",
                         by=["user_id"], method="linear")
    return out.select("event_id",
                      F.round(F.col("value"), 4).alias("value"))


def ema_events(spark: SparkSession, sf: str) -> DataFrame:
    """Per-user EMA over click values (adjust=False recurrence, seed =
    first value, alpha=0.25 — exactly representable so the float op
    sequence is engine-independent). Grouped applyInPandas with the
    pandas C ewm kernel — the documented custom-op path for an
    order-dependent recurrence with no numerically-safe codegen
    rewrite. Oracle: a DuckDB RECURSIVE CTE running the identical
    0.75*e + 0.25*x recurrence in (ts, event_id) order."""
    from tablite_spark.operators.timeseries import ema_smooth
    e = _t(spark, sf, "events").filter(
        (F.col("event_type") == "click") & F.col("value").isNotNull())
    out = ema_smooth(e, "ts", "value", by=["user_id"], alpha=0.25,
                     tiebreak=["event_id"])
    # UNROUNDED on purpose: the recurrence is bitwise identical across
    # pandas/DuckDB (verified), while ROUND itself is not (Spark
    # HALF_UP on the decimal expansion vs DuckDB's scaled-binary
    # rounding disagree on 4-decimal knife-edges like 28.49125)
    return out.select("user_id", "event_id", "ema")


def dsir_weights_docs(spark: SparkSession, sf: str) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023) of every document
    toward the French-language subset: hashed uni+bigram bag-of-ngram
    log-likelihood ratio, integer micronats. The md5-prefix bucket
    function and the add-1-smoothed log ratios are replayed verbatim
    by the DuckDB oracle."""
    from tablite_spark.pipeline.selection import dsir_weights
    d = _t(spark, sf, "documents")
    return dsir_weights(d, d.filter(F.col("lang") == "fr"),
                        "text", "doc_id", buckets=256)


def dsir_select_docs(spark: SparkSession, sf: str) -> DataFrame:
    """Top-50 most-target-like docs by DSIR weight (deterministic
    rank: weight desc, doc_id asc; salted two-phase top-k — no global
    single-task sort)."""
    from tablite_spark.pipeline.selection import dsir_select
    d = _t(spark, sf, "documents")
    return dsir_select(d, d.filter(F.col("lang") == "fr"),
                       "text", "doc_id", k=50, buckets=256)


def winnow_fps_docs(spark: SparkSession, sf: str) -> DataFrame:
    """Winnowing fingerprints (MOSS, Schleimer et al. 2003) of the
    first 20 documents: char-8-gram md5-prefix hashes, window-4
    rightmost-min selection — every selected (fp, pos) replayed
    bit-for-bit by DuckDB list ops (the hash is the DSIR md5 recipe,
    so selection ORDER is engine-independent)."""
    from tablite_spark.pipeline.dedup import winnow_fingerprints
    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 20)
    return winnow_fingerprints(d, "text", "doc_id", k=8, window=4)


def winnow_matches_docs(spark: SparkSession, sf: str) -> DataFrame:
    """Top-100 partial-copy candidate pairs by shared winnowing
    fingerprints (k=12, window=6, boilerplate fingerprints in >25
    docs dropped before pairing — the MOSS too-common cut, so a hot
    fingerprint can never fan out quadratically). Deterministic rank
    (shared desc, id_a, id_b) via the salted two-phase top-k."""
    from pyspark.sql import Window

    from tablite_spark.pipeline.dedup import winnow_matches
    m = winnow_matches(_t(spark, sf, "documents"), "text", "doc_id",
                       k=12, window=6, max_df=25)
    order = [F.col("shared_fps").desc(), F.col("id_a").asc(),
             F.col("id_b").asc()]
    w1 = Window.partitionBy("__salt__").orderBy(*order)
    w2 = Window.partitionBy(F.lit(1)).orderBy(*order)
    return (m.withColumn("__salt__", F.spark_partition_id())
            .withColumn("__r1__", F.row_number().over(w1))
            .filter(F.col("__r1__") <= 100)
            .withColumn("rank", F.row_number().over(w2))
            .filter(F.col("rank") <= 100)
            .select("id_a", "id_b", "shared_fps", "rank"))


def tfidf_keywords_docs(spark: SparkSession, sf: str) -> DataFrame:
    """Top-3 tf-idf keywords per document: integer-micronat idf per
    TERM (floor(1e6·ln((N+1)/(df+1)))), so the per-doc scores are
    exact integers; the df table derives from the tf frame
    (vocab-bounded — no second corpus scan); the final top-k is a
    doc-partitioned row_number (millions of small partitions, no hot
    key). Oracle: DuckDB replays tf, df, the quantized idf and the
    ranked cut."""
    from tablite_spark.pipeline.text import tfidf_keywords
    return tfidf_keywords(_t(spark, sf, "documents"), "text",
                          "doc_id", k=3)


def ab_welch_events(spark: SparkSession, sf: str) -> DataFrame:
    """Pairwise Welch's t-test between event types over `value`: one
    combinable groupBy pass (n/mean/var_samp) + a broadcast self-join
    of the |groups|-row summary. Oracle: the same closed formula in
    DuckDB SQL."""
    from tablite_spark.operators.stats import ab_welch
    return ab_welch(_t(spark, sf, "events"), "event_type", "value")


def pca_covariance_embeddings(spark: SparkSession, sf: str) -> DataFrame:
    """Upper-triangle covariance matrix of the embedding table via
    per-partition numpy Gram partials (O(dim²) rows emitted per
    partition, one combinable groupBy — no row ever shuffles).
    Oracle: DuckDB avg(e_i·e_j) − avg(e_i)·avg(e_j) per cell with
    float32→double promotion matching numpy's."""
    from tablite_spark.pipeline.decomp import covariance_matrix
    emb = _t(spark, sf, "embeddings")
    return covariance_matrix(emb, "embedding", 64).select(
        "i", "j", F.round(F.col("cov"), 4).alias("cov"))


def pca_project_embeddings(spark: SparkSession, sf: str) -> DataFrame:
    """Top-4 principal components fitted on the driver (64×64 eigh on
    the distributed covariance, sign-normalized) and projected back
    over the corpus in one broadcast matmul pass. Oracle (r10): the
    deterministic fitted components are PINNED as a VALUES table
    (see _pca_project_oracle) and DuckDB recomputes the projection
    as plain SQL dot products — hash-checkable like every other
    entry; component properties additionally pytest-asserted
    (tests/test_selection_decomp.py)."""
    from tablite_spark.pipeline.decomp import pca_fit, pca_project
    emb = _t(spark, sf, "embeddings")
    comps, _ = pca_fit(emb, "embedding", 64, 4)
    p = pca_project(emb, comps, "vec_id", "embedding")
    return p.select("vec_id",
                    *[F.round(F.element_at("proj", i + 1), 4)
                      .alias(f"pc{i}") for i in range(4)])


def corr_matrix_lineitem(spark: SparkSession, sf: str) -> DataFrame:
    """Pearson correlation matrix over lineitem's numeric measures in
    ONE combinable aggregation pass (F.corr partial-merges map-side —
    the PCA Gram discipline, expression-only); the long layout is an
    inline explode of the single agg row. Oracle: DuckDB corr() per
    pair."""
    from tablite_spark.operators.stats import pairwise_corr
    li = _t(spark, sf, "lineitem")
    out = pairwise_corr(li, ["l_quantity", "l_extendedprice",
                             "l_discount", "l_tax"])
    return out.select("col_a", "col_b", "n",
                      F.round(F.col("corr"), 4).alias("corr"))


def group_quantiles_events(spark: SparkSession, sf: str) -> DataFrame:
    """Exact per-event-type quantiles (percentile_cont linear
    interpolation) of `value` — one spill-aware ObjectHashAggregate
    groupBy; the combinable GK-sketch path is the documented 100 TB
    valve (pytest-pinned within its accuracy bound). Oracle: DuckDB
    quantile_cont over the same groups."""
    from tablite_spark.operators.stats import group_quantiles
    ev = _t(spark, sf, "events")
    out = group_quantiles(ev, ["event_type"], "value",
                          [0.25, 0.5, 0.75, 0.95], exact=True)
    return out.select("event_type", "q",
                      F.round(F.col("value"), 4).alias("value"))


def mutual_info_docs(spark: SparkSession, sf: str) -> DataFrame:
    """Mutual information + marginal entropies between the documents
    table's lang and source columns: one combinable groupBy(x, y)
    corpus pass, marginals as window sums OVER THE JOINT (cardinality-
    bounded, never corpus-bounded), N as a lazy reused-exchange
    scalar. Oracle: the same closed formula in DuckDB window SQL."""
    from tablite_spark.operators.stats import mutual_information
    docs = _t(spark, sf, "documents")
    out = mutual_information(docs, "lang", "source")
    return out.select("n",
                      F.round(F.col("mi_nats"), 4).alias("mi_nats"),
                      F.round(F.col("h_x"), 4).alias("h_x"),
                      F.round(F.col("h_y"), 4).alias("h_y"))


def rolling_avg_events(spark: SparkSession, sf: str) -> DataFrame:
    """Trailing 15-minute rolling avg/count/sum of click values per
    user: one hash(user) shuffle, a VALUE-RANGE window frame over
    microsecond epochs (two monotone pointers per partition, O(n)
    amortized, JVM-side) — duplicate timestamps are frame peers so
    the result is deterministic under any tie order. Oracle: DuckDB
    RANGE BETWEEN INTERVAL 15 MINUTES PRECEDING AND CURRENT ROW."""
    from tablite_spark.operators.timeseries import rolling_agg
    ev = _t(spark, sf, "events").filter(F.col("event_type") == "click")
    out = rolling_agg(ev, "ts", "value", ["user_id"], "15 minutes",
                      funcs=("avg", "count", "sum"))
    return out.select("event_id",
                      F.round(F.col("roll_avg"), 4).alias("roll_avg"),
                      F.col("roll_count"),
                      F.round(F.col("roll_sum"), 4).alias("roll_sum"))


def state_intervals_events(spark: SparkSession, sf: str) -> DataFrame:
    """SCD2 gaps-and-islands collapse of each user's event-type runs
    into validity intervals: one hash(user) shuffle reused by both
    windows and the combinable groupBy; revisited states start NEW
    intervals. Oracle: the same lag/running-sum/lead chain in DuckDB
    SQL."""
    from tablite_spark.operators.timeseries import state_intervals
    ev = _t(spark, sf, "events")
    return state_intervals(ev, "user_id", "event_type", "ts",
                           tiebreak="event_id")



def outliers_events(spark: SparkSession, sf: str) -> DataFrame:
    """Per-event-type z-score outliers over `value` (|x - mean| >
    3*stddev_samp): one combinable groupBy collapses the corpus to a
    |groups|-row summary, joined back UNHINTED so AQE broadcasts at
    runtime (and a 100M-group variant degrades to a keyed join
    instead of a forced-broadcast OOM). Oracle: the same fence in
    DuckDB SQL."""
    from tablite_spark.operators.stats import group_outliers
    ev = _t(spark, sf, "events")
    out = group_outliers(ev, ["event_type"], "value",
                         method="zscore", threshold=3.0)
    return (out.filter(F.col("is_outlier"))
            .select("event_id", "event_type",
                    F.round(F.col("value"), 4).alias("value")))


def jaccard_join_docs(spark: SparkSession, sf: str) -> DataFrame:
    """EXACT token-set Jaccard self-join at t=0.8 over a 150-doc
    subset (the full synthetic corpus is template-generated and
    genuinely carries ~30k >=0.8 pairs — the winnow burn-in lesson);
    PPJoin prefix filtering: only each doc's rarest
    |S|-ceil(t|S|)+1 tokens enter the candidate join (pigeonhole-
    complete, no false negatives), exact array_intersect verify.
    jaccard = exact-int division, bit-identical cross-engine, no
    rounding needed. Oracle: brute-force DuckDB list_intersect over
    all pairs of the subset."""
    from tablite_spark.pipeline.dedup import jaccard_join
    docs = _t(spark, sf, "documents").filter(F.col("doc_id") % 10 == 0)
    return jaccard_join(docs, "text", "doc_id", threshold=0.8)


def path_ngrams_events(spark: SparkSession, sf: str) -> DataFrame:
    """Top-20 3-step user journeys: one hash(user) shuffle, n-grams
    built row-locally from lead() (never a per-user collect_list — a
    hot user's history would materialize as one array), combinable
    global path count, ordered limit over the tiny distinct-path
    frame. Oracle: the same lead-window chain in DuckDB."""
    from tablite_spark.operators.timeseries import path_ngrams
    ev = _t(spark, sf, "events")
    return path_ngrams(ev, "user_id", "event_type", "ts", n=3, k=20,
                       tiebreak="event_id")


def ks_test_events(spark: SparkSession, sf: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov test between the click and view
    value distributions: distributed ECDFs via per-value census +
    range-bucketed prefix sums (the spearman discipline — never a
    global-order window), sup-difference as ONE combinable max,
    asymptotic Kolmogorov-series p-value (100 terms, evaluated
    identically by both engines; rounding margin pinned in pytest).
    Oracle: DuckDB window cumulative ECDFs + the same series."""
    from tablite_spark.operators.stats import ks_test_2sample
    ev = _t(spark, sf, "events")
    out = ks_test_2sample(ev, "event_type", "value", "click", "view")
    return out.select("n_a", "n_b",
                      F.round(F.col("d_stat"), 4).alias("d_stat"),
                      F.round(F.col("p_value"), 4).alias("p_value"))


def chi2_docs(spark: SparkSession, sf: str) -> DataFrame:
    """Chi-squared independence test + Cramér's V between documents
    lang and source — the frequentist twin of mutual_info_docs: ONE
    combinable groupBy(x, y) corpus pass, marginals as window sums
    over the cardinality-bounded joint, N/|X|/|Y| on a lazy
    ReusedExchange scalar branch, expected counts formed double*long
    (never the ANSI-overflow long*long). Oracle: the same closed
    formula in DuckDB window SQL."""
    from tablite_spark.operators.stats import chi2_independence
    docs = _t(spark, sf, "documents")
    out = chi2_independence(docs, "lang", "source")
    return out.select("n", "dof",
                      F.round(F.col("chi2"), 4).alias("chi2"),
                      F.round(F.col("cramers_v"), 4)
                      .alias("cramers_v"))


def equidepth_hist_events(spark: SparkSession, sf: str) -> DataFrame:
    """10-bucket equi-depth histogram of events.value: exact
    percentile_cont edges in one spill-aware ObjectHashAggregate
    (GK-sketch valve for 100 TB), bins-1 edges collected driver-side
    (bounded), then a pure JVM O(bins) bucket expression into one
    combinable groupBy. Edge ties go to the LOWER bucket on both
    engines. Oracle: DuckDB quantile_cont edges + the same strict->
    comparisons."""
    from tablite_spark.operators.stats import equi_depth_histogram
    ev = _t(spark, sf, "events")
    out = equi_depth_histogram(ev, "value", bins=10)
    return out.select("bin", F.round(F.col("lo"), 4).alias("lo"),
                      F.round(F.col("hi"), 4).alias("hi"), "n_rows")


def heavy_hitters_docs(spark: SparkSession, sf: str) -> DataFrame:
    """EXACT heavy-hitter tokens (frequency > 1% of corpus tokens)
    via two-pass Misra-Gries: per-partition bounded counters whose
    candidate union is pigeonhole-COMPLETE, then an exact count of
    candidates only — no stage ever shuffles the full token domain
    (the 100 TB story for unbounded-cardinality columns; plain
    groupBy would shuffle every distinct token). Oracle: brute-force
    DuckDB GROUP BY HAVING over all tokens."""
    from tablite_spark.operators.frequency import heavy_hitters
    docs = _t(spark, sf, "documents")
    tok = (docs.select(F.explode(F.split(F.lower(F.col("text")),
                                         "[^a-z0-9]+")).alias("tok"))
           .filter(F.col("tok") != ""))
    out = heavy_hitters(tok, "tok", phi=0.01)
    return out.select(F.col("value").alias("token"), "cnt",
                      F.round(F.col("share"), 6).alias("share"))


def markov_events(spark: SparkSession, sf: str) -> DataFrame:
    """First-order Markov transition matrix of per-user event-type
    sequences: one hash(user) shuffle for the lead() window, then a
    combinable groupBy collapsing to the |states|^2 frame with
    row-normalizing window sums over that bounded frame. Oracle:
    DuckDB lead() + counts."""
    from tablite_spark.operators.timeseries import markov_transitions
    ev = _t(spark, sf, "events")
    out = markov_transitions(ev, "user_id", "event_type", "ts",
                             tiebreak="event_id")
    return out.select("state", "next_state", "n",
                      F.round(F.col("p"), 4).alias("p"))


def target_encode_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Leakage-free 5-fold out-of-fold target encoding of
    o_orderpriority against o_totalprice (smoothing 20 toward the
    fold-excluded global mean; folds = pmod(o_orderkey, 5), engine-
    portable): ONE combinable groupBy(cat, fold) summary, window
    totals over the bounded summary, null-safe AQE-broadcast join
    back. Oracle: the same window algebra in DuckDB SQL."""
    from tablite_spark.pipeline.features import target_encode
    o = _t(spark, sf, "orders")
    out = target_encode(o, "o_orderpriority", "o_totalprice",
                        "o_orderkey", folds=5, smoothing=20.0)
    return out.select("o_orderkey", "o_orderpriority",
                      F.round(F.col("o_orderpriority_te"), 4)
                      .alias("te"))


def outliers_mad_events(spark: SparkSession, sf: str) -> DataFrame:
    """Robust per-event-type outliers via the MAD fence
    (|x - median| > 3 * 1.4826 * MAD) — immune to the outliers
    inflating the fence, unlike the zscore twin: median and the
    nested MAD median are two spill-aware percentile passes on a
    |groups|-row summary, then an AQE-broadcast null-safe join back.
    Oracle: DuckDB median()/mad() (both quantile_cont-interpolated,
    exactly matching F.percentile)."""
    from tablite_spark.operators.stats import group_outliers
    ev = _t(spark, sf, "events")
    out = group_outliers(ev, ["event_type"], "value",
                         method="mad", threshold=3.0)
    return (out.filter(F.col("is_outlier"))
            .select("event_id", "event_type",
                    F.round(F.col("value"), 4).alias("value")))


def benford_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Benford first-significant-digit screen of o_totalprice: the
    digit is a pure row-local expression, the corpus collapses in
    ONE combinable 9-bucket groupBy, N is a window sum over the
    9-row frame. Oracle: the same closed formula in DuckDB."""
    from tablite_spark.operators.stats import benford_digits
    o = _t(spark, sf, "orders")
    out = benford_digits(o, "o_totalprice")
    return out.select("digit", "n_obs",
                      F.round(F.col("share"), 6).alias("share"),
                      F.round(F.col("benford_share"), 6)
                      .alias("benford_share"),
                      F.round(F.col("chi2_term"), 4)
                      .alias("chi2_term"))


def acf_events(spark: SparkSession, sf: str) -> DataFrame:
    """Autocorrelation of per-user event values at lags 0..5: ONE
    hash(user) shuffle drives a single Window operator with all six
    lag() columns (O(1)-incremental frames, no sliding rebuild),
    then ONE combinable agg computes every lag's guarded co-moments
    (ANSI-safe). Oracle: DuckDB lag() + corr() per lag."""
    from tablite_spark.operators.timeseries import cross_correlation
    ev = _t(spark, sf, "events")
    out = cross_correlation(ev, "user_id", "ts", "value", "value",
                            max_lag=5, tiebreak="event_id")
    return out.select("lag", "n",
                      F.round(F.col("ccf"), 4).alias("ccf"))


def attribution_events(spark: SparkSession, sf: str) -> DataFrame:
    """Last-touch attribution of purchase values to the most recent
    preceding view/click/signup touch per user: one hash(user)
    shuffle, a running last(ignorenulls) carry (O(1)-incremental
    UNBOUNDED PRECEDING frame — never an as-of self-join's second
    corpus shuffle), then a |channels|-bounded combinable groupBy.
    Conversions with no prior touch land in the NULL channel.
    Oracle: DuckDB last_value(... IGNORE NULLS) over the same
    running frame."""
    from tablite_spark.operators.timeseries import attribute_conversions
    ev = _t(spark, sf, "events")
    out = attribute_conversions(ev, "user_id", "ts", "event_type",
                                "value", "purchase",
                                ["view", "click", "signup"],
                                tiebreak="event_id")
    return out.select("channel", "n_conversions",
                      F.round(F.col("attributed_value"), 4)
                      .alias("attributed_value"))


def stream_attribution_events(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming twin of attribution_events, driver-oracled with a
    REAL StreamingQuery: the events table splits at its median
    timestamp into two mtime-pinned micro-batches (a global time
    split preserves each user's order across batches — the
    sequential-algebra ingestion contract), drains with availableNow
    through applyInPandasWithState, and the per-user last-touch
    carry CROSSES the batch boundary. Emits row-level attributed
    conversions (event_id, channel, value) — the batch window
    formula reproduces them exactly, which is the oracle."""
    import glob
    import os
    import shutil
    import tempfile

    from tablite_spark.streaming.ops import streaming_attribution
    ev = _t(spark, sf, "events").select(
        "event_id", "ts", "user_id", "event_type", "value")
    # ts is TIMESTAMP_NTZ; unix_micros needs TIMESTAMP (UTC session
    # — the reinterpretation is monotone, the rolling_agg rule)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    cut = ev.agg(F.percentile(us, F.lit(0.5))
                 .alias("m")).collect()[0]["m"]
    root = tempfile.mkdtemp(prefix="attr_stream_")
    src = f"{root}/src"
    os.makedirs(src)
    for i, part in enumerate((
            ev.filter(us <= F.lit(int(cut))),
            ev.filter(us > F.lit(int(cut))))):
        stage = f"{root}/stage{i}"
        part.coalesce(1).write.mode("overwrite").parquet(stage)
        dst = f"{src}/batch{i}.parquet"
        shutil.copy(glob.glob(f"{stage}/part-*.parquet")[0], dst)
        t = 1_700_000_000 + i * 600
        os.utime(dst, (t, t))
    stream = (spark.readStream
              .schema("event_id long, ts timestamp, user_id long, "
                      "event_type string, value double")
              .option("maxFilesPerTrigger", 1)
              .option("latestFirst", "false").parquet(src))
    q = (streaming_attribution(stream)
         .writeStream.format("parquet")
         .option("path", f"{root}/out")
         .option("checkpointLocation", f"{root}/ckpt")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    out = spark.read.parquet(f"{root}/out")
    return out.select("event_id", "channel",
                      F.round(F.col("value"), 4).alias("value"))


def auc_events(spark: SparkSession, sf: str) -> DataFrame:
    """EXACT ROC-AUC (tie-aware Mann-Whitney rank sum) of
    value/500 as a purchase score: per-score census + the
    spearman-style DISTRIBUTED prefix-sum ranks — never a
    global-order rank() window. Average ranks are half-integers
    (exact doubles), so the rank-sum and AUC are BIT-IDENTICAL
    cross-engine — no rounding needed. Oracle: DuckDB rank window
    formula."""
    from tablite_spark.pipeline.evaluation import binary_auc
    ev = _t(spark, sf, "events")
    scored = ev.select((F.col("value") / 500.0).alias("s"),
                       (F.col("event_type") == "purchase")
                       .alias("y"))
    return binary_auc(scored, "s", "y")


def calibration_events(spark: SparkSession, sf: str) -> DataFrame:
    """Reliability diagram of the clamped purchase score over 10
    fixed-width bins: the bin is a row-local expression, ONE
    combinable groupBy. frac_pos is an exact-integer division
    (bit-identical); mean_score rounds (sum-order differs across
    engines). Oracle: the same bucketing in DuckDB."""
    from tablite_spark.pipeline.evaluation import calibration_bins
    ev = _t(spark, sf, "events")
    scored = ev.select(
        F.least(F.col("value") / 500.0, F.lit(1.0)).alias("s"),
        (F.col("event_type") == "purchase").alias("y"))
    out = calibration_bins(scored, "s", "y", bins=10)
    return out.select("bin", "n",
                      F.round(F.col("mean_score"), 4)
                      .alias("mean_score"), "frac_pos")


def confusion_events(spark: SparkSession, sf: str) -> DataFrame:
    """Threshold confusion counts + accuracy/precision/recall/F1 in
    ONE combinable aggregation (guarded divisions — degenerate
    denominators yield NULL, never an ANSI error); every derived
    metric is a division of identical integers, bit-identical
    cross-engine. Oracle: mirrored filters + the same formula
    sequence in DuckDB."""
    from tablite_spark.pipeline.evaluation import confusion_metrics
    ev = _t(spark, sf, "events")
    scored = ev.select((F.col("value") / 500.0).alias("s"),
                       (F.col("event_type") == "purchase")
                       .alias("y"))
    return confusion_metrics(scored, "s", "y", threshold=0.3)


def q7_volume_shipping(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q7 (volume shipping between two nations, adapted to the
    synthetic schema): lineitem joins orders/customer on keys
    (corpus-scale, left to AQE) while supplier and both nation dims
    BROADCAST; the nation-pair disjunction prunes early. One shuffle
    chain, one combinable final groupBy. Oracle: the same SQL in
    DuckDB."""
    li = _t(spark, sf, "lineitem")
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    s = _t(spark, sf, "supplier")
    n = _t(spark, sf, "nation")
    n1 = n.select(F.col("n_nationkey").alias("s_nk"),
                  F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("c_nk"),
                  F.col("n_name").alias("cust_nation"))
    out = (li.filter(F.col("l_shipdate")
                     .between("1996-01-01", "1997-12-31"))
           .join(o, li["l_orderkey"] == o["o_orderkey"])
           .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
           .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
           .join(F.broadcast(n1), s["s_nationkey"] == F.col("s_nk"))
           .join(F.broadcast(n2), c["c_nationkey"] == F.col("c_nk"))
           .filter(((F.col("supp_nation") == "NATION_1")
                    & (F.col("cust_nation") == "NATION_2"))
                   | ((F.col("supp_nation") == "NATION_2")
                      & (F.col("cust_nation") == "NATION_1")))
           .groupBy("supp_nation", "cust_nation",
                    F.year("l_shipdate").alias("l_year"))
           .agg(F.sum(F.col("l_extendedprice")
                      * (1 - F.col("l_discount"))).alias("rev_")))
    return out.select("supp_nation", "cust_nation", "l_year",
                      F.round(F.col("rev_"), 4).alias("revenue"))


def q8_market_share(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q8 (national market share of NATION_5 for PROMO parts
    sold into ASIA): part filters BEFORE the join and broadcasts
    (the classic selective-dim pushdown), supplier/customer/nation/
    region all broadcast; the yearly share is a guarded conditional
    sum over one combinable groupBy. Oracle: same SQL."""
    li = _t(spark, sf, "lineitem")
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    s = _t(spark, sf, "supplier")
    n = _t(spark, sf, "nation")
    r = _t(spark, sf, "region")
    p = _t(spark, sf, "part").filter(F.col("p_type") == "PROMO")
    n1 = n.select(F.col("n_nationkey").alias("s_nk"),
                  F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("c_nk"),
                  F.col("n_regionkey").alias("c_rk"))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    base = (li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
            .join(o, li["l_orderkey"] == o["o_orderkey"])
            .filter(F.col("o_orderdate")
                    .between("1996-01-01", "1997-12-31"))
            .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
            .join(F.broadcast(n2), c["c_nationkey"] == F.col("c_nk"))
            .join(F.broadcast(r), F.col("c_rk") == r["r_regionkey"])
            .filter(F.col("r_name") == "ASIA")
            .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
            .join(F.broadcast(n1), s["s_nationkey"] == F.col("s_nk")))
    out = (base.groupBy(F.year("o_orderdate").alias("o_year"))
           .agg((F.sum(F.when(F.col("supp_nation") == "NATION_5",
                              vol).otherwise(0.0)) / F.sum(vol))
                .alias("share_")))
    return out.select("o_year",
                      F.round(F.col("share_"), 6).alias("mkt_share"))


def q10_returned_items(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q10 (top-20 customers by returned-item revenue in one
    quarter): orders date-prunes before the lineitem join, customer/
    nation broadcast, top-20 via a deterministic (revenue DESC,
    custkey) global sort of the |customers|-bounded aggregate — the
    sort runs on the SUMMARY, never on line items. Oracle: same
    SQL."""
    li = _t(spark, sf, "lineitem")
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    n = _t(spark, sf, "nation")
    out = (li.filter(F.col("l_returnflag") == "R")
           .join(o.filter(F.col("o_orderdate")
                          .between("1995-10-01", "1995-12-31")),
                 li["l_orderkey"] == o["o_orderkey"])
           .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
           .join(F.broadcast(n),
                 c["c_nationkey"] == n["n_nationkey"])
           .groupBy("c_custkey", "c_name", "n_name")
           .agg(F.sum(F.col("l_extendedprice")
                      * (1 - F.col("l_discount"))).alias("rev_"))
           .orderBy(F.col("rev_").desc(), F.col("c_custkey"))
           .limit(20))
    return out.select("c_custkey", "c_name", "n_name",
                      F.round(F.col("rev_"), 4).alias("revenue"))


def q13_customer_distribution(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q13 (customer order-count distribution, comment filter
    omitted — the synthetic orders table carries no comment): LEFT
    join keeps zero-order customers, two combinable groupBys
    (per-customer count, then the bounded count histogram). Oracle:
    same SQL."""
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    per = (c.join(o, c["c_custkey"] == o["o_custkey"], "left")
           .groupBy(c["c_custkey"])
           .agg(F.count("o_orderkey").alias("c_count")))
    return (per.groupBy("c_count")
            .agg(F.count(F.lit(1)).alias("custdist"))
            .orderBy(F.col("custdist").desc(),
                     F.col("c_count").desc()))


def q15_top_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q15 (top supplier by quarterly revenue): the revenue
    view is one combinable groupBy(suppkey); the max is a 1-row
    broadcast joined back (never a global-order window over
    suppliers). Oracle: same SQL with a scalar subquery."""
    li = _t(spark, sf, "lineitem")
    s = _t(spark, sf, "supplier")
    rev = (li.filter(F.col("l_shipdate")
                     .between("1996-01-01", "1996-03-31"))
           .groupBy(F.col("l_suppkey").alias("supplier_no"))
           .agg(F.sum(F.col("l_extendedprice")
                      * (1 - F.col("l_discount")))
                .alias("total_revenue")))
    mx = rev.agg(F.max("total_revenue").alias("mx_"))
    out = (rev.join(F.broadcast(mx),
                    F.col("total_revenue") == F.col("mx_"))
           .join(F.broadcast(s),
                 F.col("supplier_no") == s["s_suppkey"]))
    return out.select("s_suppkey", "s_name",
                      F.round(F.col("total_revenue"), 4)
                      .alias("total_revenue"))


def gini_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Gini coefficient + Theil index of order totals: the tie-safe
    rank formula over the SAME distributed census prefix sum as AUC
    (never a global-order window); Theil folds to the one-pass
    identity sum(x ln x)/(n mu) - ln(mu) and rides the same census
    aggregate — one corpus scan total. Oracle: DuckDB rank-window
    formula."""
    from tablite_spark.operators.stats import inequality_metrics
    o = _t(spark, sf, "orders")
    out = inequality_metrics(o, "o_totalprice")
    return out.select("n", F.round(F.col("mean"), 4).alias("mean"),
                      F.round(F.col("gini"), 6).alias("gini"),
                      F.round(F.col("theil"), 6).alias("theil"))


def ols_lineitem(spark: SparkSession, sf: str) -> DataFrame:
    """Per-returnflag simple linear regression of extendedprice on
    quantity: all five moments in ONE combinable groupBy (map-side
    partials, |groups|-row shuffle, no window/join/second scan);
    guarded degenerate groups. Oracle: DuckDB covar_pop/var_pop
    closed form."""
    from tablite_spark.operators.stats import group_ols
    li = _t(spark, sf, "lineitem")
    out = group_ols(li, ["l_returnflag"], "l_quantity",
                    "l_extendedprice")
    return out.select("l_returnflag", "n",
                      F.round(F.col("slope"), 4).alias("slope"),
                      F.round(F.col("intercept"), 4)
                      .alias("intercept"),
                      F.round(F.col("r2"), 6).alias("r2"))


def km_survival_events(spark: SparkSession, sf: str) -> DataFrame:
    """Kaplan-Meier survival over event values (error rows =
    right-censored): per-duration census + TWO distributed prefix
    sums (counts for n_at_risk, then log-domain survival) over the
    spearman-style range buckets — never a global-order window; the
    everyone-dies-at-the-end ln(0) case uses a finite sentinel whose
    exp is exactly 0.0 on both engines. Oracle: DuckDB window
    cumulative formula."""
    from tablite_spark.operators.stats import km_curve
    ev = _t(spark, sf, "events")
    out = km_curve(ev, "value", F.col("event_type") != "error")
    return out.select("duration", "n_at_risk", "n_events",
                      F.round(F.col("survival"), 4)
                      .alias("survival"))


def q2_min_cost_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q2 (min-cost supplier, adapted: the synthetic schema has
    no partsupp, so the supply offer is the per-(part,supplier)
    MINIMUM observed unit price from lineitem — ref tablite does the
    same correlated-min via groupby+lookup). Offers aggregate ONCE
    (combinable min), the per-part min joins back by exact double
    equality (both engines min over the SAME division results — IEEE
    division is order-free), supplier/nation/region/part all
    broadcast. Never a correlated per-row subquery. Oracle: same
    plan in SQL."""
    li = _t(spark, sf, "lineitem")
    s = _t(spark, sf, "supplier")
    n = _t(spark, sf, "nation")
    r = _t(spark, sf, "region")
    p = _t(spark, sf, "part").filter(
        (F.col("p_type") == "LARGE") & (F.col("p_size") <= 10))
    eu = (s.join(F.broadcast(n),
                 s["s_nationkey"] == n["n_nationkey"])
          .join(F.broadcast(r.filter(F.col("r_name") == "EUROPE")),
                F.col("n_regionkey") == F.col("r_regionkey"))
          .select("s_suppkey", "s_name", "s_acctbal", "n_name"))
    offers = (li.filter(F.col("l_quantity") > 0)
              .groupBy("l_partkey", "l_suppkey")
              .agg(F.min(F.col("l_extendedprice")
                         / F.col("l_quantity")).alias("unit_cost")))
    oe = (offers.join(F.broadcast(eu),
                      F.col("l_suppkey") == F.col("s_suppkey"))
          .join(F.broadcast(p.select("p_partkey")),
                F.col("l_partkey") == F.col("p_partkey")))
    mn = oe.groupBy(F.col("p_partkey").alias("mk")).agg(
        F.min("unit_cost").alias("mn_cost"))
    out = oe.join(F.broadcast(mn),
                  (F.col("p_partkey") == F.col("mk"))
                  & (F.col("unit_cost") == F.col("mn_cost")))
    # unit_cost is emitted UNROUNDED: both engines divide the same
    # doubles (IEEE division is deterministic), so the values are
    # bit-identical — while ROUND would tie-break dyadic quotients
    # like .8125 differently (Spark HALF_UP vs DuckDB), the exact
    # flake class the sf0.1 audit caught.
    return out.select("s_acctbal", "s_name", "n_name", "p_partkey",
                      "unit_cost")


def q9_product_profit(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q9 (product-type profit by nation and year, adapted:
    supply cost proxied as 0.6 * p_retailprice since there is no
    partsupp). The 'red' part filter prunes BEFORE the broadcast
    join; supplier+nation broadcast; one combinable groupBy. profit
    is a row-local expression — stays in whole-stage codegen.
    Oracle: same SQL."""
    li = _t(spark, sf, "lineitem")
    s = _t(spark, sf, "supplier")
    n = _t(spark, sf, "nation")
    p = _t(spark, sf, "part").filter(F.col("p_name").like("%red%"))
    profit = (F.col("l_extendedprice") * (1 - F.col("l_discount"))
              - 0.6 * F.col("p_retailprice") * F.col("l_quantity"))
    out = (li.join(F.broadcast(p.select("p_partkey",
                                        "p_retailprice")),
                   li["l_partkey"] == F.col("p_partkey"))
           .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
           .join(F.broadcast(n),
                 s["s_nationkey"] == n["n_nationkey"])
           .groupBy(F.col("n_name").alias("nation"),
                    F.year("l_shipdate").alias("o_year"))
           .agg(F.sum(profit).alias("p_")))
    return out.select("nation", "o_year",
                      F.round(F.col("p_"), 4).alias("sum_profit"))


def q11_important_parts(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q11 (important stock, adapted: part 'value' is NATION_3
    suppliers' lineitem revenue instead of availqty*supplycost).
    Per-part value is ONE combinable groupBy; the global threshold is
    a 1-row aggregate of the SAME frame crossJoin-broadcast back —
    Catalyst materializes the value aggregate once (ReusedExchange),
    never a second corpus scan. The 2x-mean threshold is
    scale-free (a fixed corpus fraction empties at 10x the parts);
    boundary audited: min |value-thr| is 2e2 at sf0.01 / 0.5 at
    sf0.1, >=1e3x above the ~1e-4 summation noise. Oracle: scalar subquery."""
    li = _t(spark, sf, "lineitem")
    s = _t(spark, sf, "supplier")
    n = _t(spark, sf, "nation")
    sk = (s.join(F.broadcast(n.filter(F.col("n_name")
                                      == "NATION_3")),
                 s["s_nationkey"] == n["n_nationkey"])
          .select("s_suppkey"))
    val = (li.join(F.broadcast(sk),
                   li["l_suppkey"] == F.col("s_suppkey"))
           .groupBy("l_partkey")
           .agg(F.sum(F.col("l_extendedprice")
                      * (1 - F.col("l_discount"))).alias("value_")))
    thr = val.agg((F.avg("value_") * 2.0).alias("thr_"))
    out = (val.crossJoin(F.broadcast(thr))
           .filter(F.col("value_") > F.col("thr_")))
    return out.select(F.col("l_partkey").alias("p_partkey"),
                      F.round(F.col("value_"), 4).alias("value"))


def q12_late_shipments(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q12 (shipping-priority counts, adapted: no
    shipmode/commitdate, so 'late' = shipped >90 days after the
    order date and l_linestatus stands in for shipmode). Date
    arithmetic is a row-local interval add (codegen, both engines
    exact on microsecond timestamps); one combinable conditional-sum
    groupBy after an equi join date-pruned on BOTH sides. Oracle:
    same SQL."""
    li = _t(spark, sf, "lineitem")
    o = _t(spark, sf, "orders")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    out = (li.filter(F.col("l_shipdate")
                     .between("1996-01-01", "1997-12-31"))
           .join(o, li["l_orderkey"] == o["o_orderkey"])
           .filter(F.col("l_shipdate")
                   > F.col("o_orderdate")
                   + F.expr("INTERVAL 90 DAYS"))
           .groupBy("l_linestatus")
           .agg(F.sum(F.when(hi, 1).otherwise(0))
                .alias("high_line_count"),
                F.sum(F.when(hi, 0).otherwise(1))
                .alias("low_line_count")))
    return out


def q16_supplier_part_counts(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q16 (supplier count per part attribute, adapted: the
    part-supplier relation is distinct lineitem pairs; 'complaint'
    suppliers = s_name ending in 7). Anti join the excluded
    suppliers (broadcast — |suppliers| rows), distinct-count per
    bounded (brand,type,size) key; the distinct agg is the classic
    two-phase expand (partial per-key dedup map-side). Oracle: same
    SQL with NOT IN."""
    li = _t(spark, sf, "lineitem")
    s = _t(spark, sf, "supplier")
    p = _t(spark, sf, "part").filter(
        (F.col("p_brand") != "Brand#3")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
    excl = s.filter(F.col("s_name").like("%7")).select("s_suppkey")
    out = (li.join(F.broadcast(p.select("p_partkey", "p_brand",
                                        "p_type", "p_size")),
                   li["l_partkey"] == F.col("p_partkey"))
           .join(F.broadcast(excl),
                 li["l_suppkey"] == F.col("s_suppkey"),
                 "left_anti")
           .groupBy("p_brand", "p_type", "p_size")
           .agg(F.countDistinct("l_suppkey").alias("supplier_cnt")))
    return out


def q17_small_qty_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): the correlated
    per-part avg subquery becomes ONE groupBy over the
    already-part-filtered lineitems joined back broadcast (|parts|
    rows). Quantities are integer-valued doubles, so the avg is
    bit-identical cross-engine (exact integer sums) and the 0.2*avg
    boundary cannot flake. Oracle: correlated scalar subquery —
    validating the join-back reformulation against the literal
    form."""
    li = _t(spark, sf, "lineitem")
    p = _t(spark, sf, "part").filter(
        (F.col("p_brand") == "Brand#23")
        & (F.col("p_type") == "MEDIUM"))
    li2 = li.join(F.broadcast(p.select("p_partkey")),
                  li["l_partkey"] == F.col("p_partkey"))
    lim = (li2.groupBy(F.col("l_partkey").alias("pk"))
           .agg((F.avg("l_quantity") * 0.2).alias("lim_")))
    out = (li2.join(F.broadcast(lim), F.col("l_partkey")
                    == F.col("pk"))
           .filter(F.col("l_quantity") < F.col("lim_"))
           .agg((F.sum("l_extendedprice") / 7.0).alias("a_")))
    return out.select(F.round(F.col("a_"), 4).alias("avg_yearly"))


def q20_promo_suppliers(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q20 (part-promotion suppliers, adapted: 'has excess
    stock' = shipped more than 50 units of one PROMO part in 1996).
    The nested IN-subquery chain becomes groupBy-HAVING -> distinct
    -> LEFT SEMI join (Spark's native EXISTS plan); part + the
    qualifying-supplier set broadcast. Quantity sums are
    integer-exact, so the >50 gate is deterministic. Oracle: IN
    subqueries."""
    li = _t(spark, sf, "lineitem")
    s = _t(spark, sf, "supplier")
    n = _t(spark, sf, "nation")
    p = _t(spark, sf, "part").filter(F.col("p_type") == "PROMO")
    q = (li.filter(F.col("l_shipdate")
                   .between("1996-01-01", "1996-12-31"))
         .join(F.broadcast(p.select("p_partkey")),
               li["l_partkey"] == F.col("p_partkey"))
         .groupBy("l_suppkey", "l_partkey")
         .agg(F.sum("l_quantity").alias("sq"))
         .filter(F.col("sq") > 50)
         .select("l_suppkey").distinct())
    out = (s.join(F.broadcast(q),
                  s["s_suppkey"] == F.col("l_suppkey"),
                  "left_semi")
           .join(F.broadcast(n),
                 F.col("s_nationkey") == n["n_nationkey"]))
    return out.select("s_suppkey", "s_name", "n_name")


def q21_waiting_suppliers(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting, adapted: 'late'
    = l_returnflag R since there is no receipt/commit date). The
    double correlated EXISTS/NOT-EXISTS is reformulated as ONE
    per-order aggregate: the order qualifies iff it has >=2 distinct
    suppliers and EXACTLY ONE distinct late supplier — then min(late
    suppkey) IS that supplier. One shuffle on orderkey, |orders|-row
    second agg, supplier broadcast. The oracle runs the literal
    EXISTS form in DuckDB, so the reformulation itself is what is
    verified. Never a triple self-join of lineitem."""
    li = _t(spark, sf, "lineitem")
    o = _t(spark, sf, "orders").filter(
        F.col("o_orderstatus") == "F").select("o_orderkey")
    s = _t(spark, sf, "supplier")
    late = F.when(F.col("l_returnflag") == "R",
                  F.col("l_suppkey"))
    per = (li.join(o, li["l_orderkey"] == F.col("o_orderkey"))
           .groupBy("l_orderkey")
           .agg(F.countDistinct("l_suppkey").alias("ns"),
                F.countDistinct(late).alias("nl"),
                F.min(late).alias("late_supp")))
    out = (per.filter((F.col("ns") >= 2) & (F.col("nl") == 1))
           .groupBy("late_supp")
           .agg(F.count(F.lit(1)).alias("numwait"))
           .join(F.broadcast(s),
                 F.col("late_supp") == s["s_suppkey"]))
    return out.select("s_name", "numwait")


def q22_dormant_customers(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity, adapted: 'country code'
    = c_nationkey, 'no orders' = no orders since 2000). The
    positive-balance average is a 1-row broadcast; the recent-order
    customer set anti-joins WITHOUT a forced broadcast — at 100 TB
    distinct recent buyers is corpus-sized, so the anti join shuffles
    on custkey and AQE may still demote it to broadcast at small SF.
    Balance sums are pre-rounded synthetic 2-decimal values; the
    >avg boundary margin audited at sf0.01 (min gap 1e-2 vs 1e-12
    ulp). Oracle: same SQL."""
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("ab_"))
    recent = (o.filter(F.col("o_orderdate") >= "2000-01-01")
              .select("o_custkey"))
    out = (c.crossJoin(F.broadcast(avg_bal))
           .filter(F.col("c_acctbal") > F.col("ab_"))
           .join(recent, c["c_custkey"] == F.col("o_custkey"),
                 "left_anti")
           .groupBy(F.col("c_nationkey").alias("cntrycode"))
           .agg(F.count(F.lit(1)).alias("numcust"),
                F.sum("c_acctbal").alias("t_")))
    return out.select("cntrycode", "numcust",
                      F.round(F.col("t_"), 4).alias("totacctbal"))


def cusum_events(spark: SparkSession, sf: str) -> DataFrame:
    """CUSUM changepoint over the events value series (ordered by
    ts): census groupBy + DISTRIBUTED prefix sums (range buckets +
    in-bucket windows + ONE |buckets|-row offset collect) + a single
    max(struct) argmax with the exact integer index as tiebreak —
    never a global-order window. Top-2 |S| gap audited: 37.5 at
    sf0.01 / 3.0 at sf0.1, >=1e9x the cross-engine summation drift,
    so the argmax cannot flip. Oracle: DuckDB window cumsum +
    ORDER BY abs LIMIT 1."""
    from tablite_spark.operators.timeseries import cusum_changepoint
    ev = _t(spark, sf, "events")
    out = cusum_changepoint(ev, "ts", "value")
    return out.select("n", F.round(F.col("mean"), 4).alias("mean"),
                      "cp_index", "cp_at",
                      F.round(F.col("cusum"), 4).alias("cusum"),
                      F.round(F.col("cusum_abs"), 4)
                      .alias("cusum_abs"))


def expectations_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Declarative data-quality audit over orders: six rules
    (not-null key, totalprice range, status membership, priority
    pattern, unique key, positive price) verified in ONE combinable
    aggregation pass — one corpus scan for the whole contract, one
    row per rule. pass_rate is an exact integer ratio
    (bit-identical). Oracle: per-rule CASE sums UNION ALL."""
    from tablite_spark.operators.expect import expectations
    o = _t(spark, sf, "orders")
    rules = [
        {"rule": "custkey_not_null", "column": "o_custkey",
         "check": "not_null"},
        {"rule": "totalprice_range", "column": "o_totalprice",
         "check": "between", "low": 0.0, "high": 1e6},
        {"rule": "status_in_set", "column": "o_orderstatus",
         "check": "in_set", "values": ["F", "O", "P"]},
        {"rule": "priority_pattern", "column": "o_orderpriority",
         "check": "regex", "pattern": "^[1-5]-"},
        {"rule": "orderkey_unique", "column": "o_orderkey",
         "check": "unique"},
        {"rule": "price_positive", "column": "o_totalprice",
         "check": "min", "value": 0.01},
    ]
    return expectations(o, rules)


def feature_scale_lineitem(spark: SparkSession, sf: str) -> DataFrame:
    """Robust (median/IQR) feature scaling of lineitem measures: the
    fit is ONE aggregation (exact percentile interpolation —
    bit-identical cross-engine on identical doubles, the
    group_quantiles precedent), broadcast back as a 1-row crossJoin;
    the transform is row-local codegen arithmetic, emitted UNROUNDED
    because subtraction/division of identical doubles is
    deterministic. Oracle: percentile_cont scalar subqueries."""
    from tablite_spark.pipeline.features import feature_scale
    li = _t(spark, sf, "lineitem")
    out = feature_scale(li, ["l_quantity", "l_extendedprice"],
                        method="robust")
    return out.select("l_orderkey", "l_linenumber",
                      "l_quantity_scaled", "l_extendedprice_scaled")


def weighted_quantiles_lineitem(spark: SparkSession, sf: str) -> DataFrame:
    """Weighted quantiles of extendedprice weighted by quantity:
    census groupBy + the shared distributed prefix-sum primitive +
    one explode-filter argmin per q — never a global-order window.
    Quantities are integer-valued, so cumulative weights are EXACT
    integers and every q·W comparison is bit-identical cross-engine
    (no rounding anywhere). Oracle: DuckDB cumulative-weight window
    formula."""
    from tablite_spark.operators.stats import weighted_quantiles
    li = _t(spark, sf, "lineitem")
    return weighted_quantiles(li, "l_extendedprice", "l_quantity",
                              [0.25, 0.5, 0.75, 0.95])


def seasonal_anomalies_events(spark: SparkSession, sf: str) -> DataFrame:
    """Hour-of-day seasonal anomaly screen over event values: scan 1
    pools within-hour variance from per-hour (n, Σx, Σx²) moments —
    24 rows, no residual materialization pass; scan 2 joins the
    broadcast hour means back and filters |resid| > 3σ row-locally.
    Boundary audited: min ||resid|-3σ| = 0.033 at sf0.01, ~3e7x the
    summation drift. Oracle: same pooled-variance SQL."""
    from tablite_spark.operators.stats import seasonal_anomalies
    ev = _t(spark, sf, "events")
    out = seasonal_anomalies(ev, "ts", "value", period="hour", k=3.0)
    return out.select("event_id", "value",
                      F.round(F.col("expected"), 4).alias("expected"),
                      F.round(F.col("z"), 4).alias("z"))


def winsorize_lineitem(spark: SparkSession, sf: str) -> DataFrame:
    """Winsorization of extendedprice at the [1%, 99%] exact
    percentiles: one fit aggregation broadcast back, row-local clip
    — emitted UNROUNDED (percentile interpolation and
    least/greatest of identical doubles are bit-identical
    cross-engine). Oracle: quantile_cont scalar subqueries +
    least/greatest."""
    from tablite_spark.pipeline.features import winsorize
    li = _t(spark, sf, "lineitem")
    out = winsorize(li, ["l_extendedprice"], 0.01, 0.99)
    return out.select("l_orderkey", "l_linenumber",
                      "l_extendedprice_wins")


def zipf_alpha_docs(spark: SparkSession, sf: str) -> DataFrame:
    """Power-law exponent of the corpus token-frequency distribution
    (the pretraining-corpus health check): whitespace token census
    (explode -> combinable groupBy) then the one-aggregation
    Clauset-Shalizi-Newman MLE over tail tokens with count >= 5.
    Oracle: same census + closed form in DuckDB."""
    from tablite_spark.operators.stats import zipf_fit
    d = _t(spark, sf, "documents")
    toks = (d.select(F.explode(
        F.split(F.lower(F.trim(F.col("text"))), r"\s+"))
        .alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok").agg(F.count(F.lit(1)).alias("f")))
    out = zipf_fit(toks, "f", fmin=5)
    return out.select("n_tail", "fmin", "f_max",
                      F.round(F.col("alpha"), 6).alias("alpha"))


def bigram_lm_docs(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus-trained add-k bigram LM fluency scores per document:
    bigrams build ROW-LOCALLY (arrays_zip of two slices, no window),
    the model is two combinable censuses + a broadcast vocab scalar,
    scoring is two keyed joins + one per-doc fold. Oracle: the same
    model in DuckDB via list indexing."""
    from tablite_spark.pipeline.text import bigram_lm_scores
    d = _t(spark, sf, "documents")
    out = bigram_lm_scores(d, "text", "doc_id", k=0.5)
    return out.select("doc_id", "n_bigrams",
                      F.round(F.col("avg_logprob"), 4)
                      .alias("avg_logprob"))


def stream_zscore_events(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming online z-score anomaly scoring, driver-oracled with
    a REAL StreamingQuery: the events table splits at its median
    timestamp into two mtime-pinned micro-batches, drains with
    availableNow through applyInPandasWithState, and each event's
    Welford (n, mean, M2) prior CROSSES the batch boundary — the
    expanding-frame window formula in DuckDB reproduces every score,
    which is the oracle."""
    import glob
    import os
    import shutil
    import tempfile

    from tablite_spark.streaming.ops import streaming_zscore
    ev = _t(spark, sf, "events").select(
        "event_id", "ts", "user_id", "value")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    cut = ev.agg(F.percentile(us, F.lit(0.5))
                 .alias("m")).collect()[0]["m"]
    root = tempfile.mkdtemp(prefix="zs_stream_")
    src = f"{root}/src"
    os.makedirs(src)
    for i, part in enumerate((
            ev.filter(us <= F.lit(int(cut))),
            ev.filter(us > F.lit(int(cut))))):
        stage = f"{root}/stage{i}"
        part.coalesce(1).write.mode("overwrite").parquet(stage)
        dst = f"{src}/batch{i}.parquet"
        shutil.copy(glob.glob(f"{stage}/part-*.parquet")[0], dst)
        t = 1_700_000_000 + i * 600
        os.utime(dst, (t, t))
    stream = (spark.readStream
              .schema("event_id long, ts timestamp, user_id long, "
                      "value double")
              .option("maxFilesPerTrigger", 1)
              .option("latestFirst", "false").parquet(src))
    q = (streaming_zscore(stream)
         .writeStream.format("parquet")
         .option("path", f"{root}/out")
         .option("checkpointLocation", f"{root}/ckpt")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    out = spark.read.parquet(f"{root}/out")
    return out.select("user_id", "event_id", "n_prior",
                      F.round(F.col("z"), 4).alias("z"))


def isotonic_calibration_events(spark: SparkSession, sf: str) -> DataFrame:
    """Isotonic (PAV) recalibration of the clamped purchase score
    over 20 bins, evaluated through the minimax closed form
    max_k min_j mean(y over bins k..j) — every segment mean is a
    ratio of exact integer counts, so rate AND the monotone fit are
    bit-identical cross-engine with NO rounding. The O(bins²)
    minimax runs over the ≤20-row census only. Oracle: the same
    closed form in SQL."""
    from tablite_spark.pipeline.evaluation import isotonic_calibration
    ev = _t(spark, sf, "events")
    scored = ev.select(
        F.least(F.col("value") / 500.0, F.lit(1.0)).alias("s"),
        (F.col("event_type") == "purchase").alias("y"))
    return isotonic_calibration(scored, "s", "y", bins=20)


def referential_audit_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Foreign-key integrity audit as one-pass left-join indicator
    sums (never anti-join-plus-count): orders→customer must be clean
    (0 orphans) and the reverse part→lineitem coverage reports parts
    that never sold. ok_rate is an exact integer ratio. Oracle:
    mirrored LEFT JOIN CASE sums."""
    from tablite_spark.operators.expect import referential_check
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    p = _t(spark, sf, "part")
    li = _t(spark, sf, "lineitem")
    a = (referential_check(o, "o_custkey", c, "c_custkey")
         .select(F.lit("orders_customer").alias("relation"), "*"))
    b = (referential_check(p, "p_partkey", li, "l_partkey")
         .select(F.lit("part_sold").alias("relation"), "*"))
    return a.unionByName(b)


def json_props_events(spark: SparkSession, sf: str) -> DataFrame:
    """Semi-structured extraction: the events `props` JSON payload
    parses into typed columns via ONE row-local from_json projection
    (schema inferred from a bounded 1000-row sample — the O(sample)
    inference / O(corpus) codegen-parse split that scales); the
    extracted field aggregates per event_type. Oracle: DuckDB
    json_extract."""
    from tablite_spark.sources.io import parse_json_column
    ev = _t(spark, sf, "events")
    parsed = parse_json_column(ev, "props", prefix="p_")
    return (parsed.groupBy("event_type")
            .agg(F.count("p_k").alias("n"),
                 F.sum("p_k").alias("sum_k"),
                 F.min("p_k").alias("min_k"),
                 F.max("p_k").alias("max_k")))


def ranking_metrics_docs(spark: SparkSession, sf: str) -> DataFrame:
    """NDCG@10 + MRR@10 over a deterministic synthetic retrieval task
    (query = lang, candidates ranked by n_chars, relevant = web
    source): per-query windows with the (score DESC, id ASC)
    deterministic tiebreak — candidate lists serialize per query by
    contract, the corpus stays parallel across queries. Oracle: same
    row_number windows in DuckDB."""
    from tablite_spark.pipeline.evaluation import ranking_metrics
    d = _t(spark, sf, "documents")
    cand = d.select(F.col("lang").alias("q"),
                    F.col("doc_id").alias("id"),
                    F.col("n_chars").cast("double").alias("s"),
                    (F.col("source") == "web").cast("int")
                    .alias("rel"))
    out = ranking_metrics(cand, "q", "id", "s", "rel", k=10)
    return out.select("n_queries",
                      F.round(F.col("ndcg"), 6).alias("ndcg"),
                      F.round(F.col("mrr"), 6).alias("mrr"))


def logrank_events(spark: SparkSession, sf: str) -> DataFrame:
    """Two-sample log-rank test between even/odd user cohorts
    (duration = value, censored = error rows): per-duration census
    with per-group at-risk counts via the shared distributed prefix
    sums, then ONE scalar aggregate folds the hypergeometric O−E and
    variance terms. Oracle: the same census + window cumsums in
    DuckDB."""
    from tablite_spark.operators.stats import logrank_test
    ev = _t(spark, sf, "events").withColumn(
        "grp", (F.col("user_id") % 2).cast("int"))
    out = logrank_test(ev, "value", F.col("event_type") != "error",
                       "grp")
    return out.select("n_a", "n_b",
                      F.round(F.col("chi2"), 4).alias("chi2"))


def psi_orders_drift(spark: SparkSession, sf: str) -> DataFrame:
    """Population Stability Index of order totals, pre-1998 baseline
    vs 1998+ live: exact baseline quantile edges broadcast into
    row-local bucket cuts, ONE combinable census per side, PSI over
    the ≤10-row joined census with add-half smoothing. Oracle: same
    edges + formula in DuckDB."""
    from tablite_spark.operators.stats import psi_drift
    o = _t(spark, sf, "orders")
    exp = o.filter(F.col("o_orderdate") < "1998-01-01")
    act = o.filter(F.col("o_orderdate") >= "1998-01-01")
    out = psi_drift(exp, act, "o_totalprice", bins=10)
    return out.select("bins", "n_expected", "n_actual",
                      F.round(F.col("psi"), 6).alias("psi"))


def gains_table_events(spark: SparkSession, sf: str) -> DataFrame:
    """Cumulative gains / lift of the purchase score by decile: one
    exact-percentile fit, one bucket census, cumulative rates over
    the ≤10-row census only — every output an exact integer ratio
    (emitted UNROUNDED). Oracle: same banding in DuckDB."""
    from tablite_spark.pipeline.evaluation import gains_table
    ev = _t(spark, sf, "events")
    scored = ev.select((F.col("value") / 500.0).alias("s"),
                       (F.col("event_type") == "purchase")
                       .alias("y")).filter(F.col("s").isNotNull())
    return gains_table(scored, "s", "y", deciles=10)


def group_cusum_events(spark: SparkSession, sf: str) -> DataFrame:
    """Per-event-type CUSUM changepoints over the value series: one
    (type, ts) census groupBy, per-type expanding windows over the
    census (each type's census serializes by contract — the ACF
    hot-key rule; types stay parallel), one max(struct) argmax per
    type. Oracle: the same per-key window cumsums in DuckDB."""
    from tablite_spark.operators.timeseries import group_cusum
    ev = _t(spark, sf, "events")
    out = group_cusum(ev, ["event_type"], "ts", "value")
    return out.select("event_type", "n",
                      F.round(F.col("mean"), 4).alias("mean"),
                      "cp_index", "cp_at",
                      F.round(F.col("cusum"), 4).alias("cusum"),
                      F.round(F.col("cusum_abs"), 4)
                      .alias("cusum_abs"))


def column_entropy_docs(spark: SparkSession, sf: str) -> DataFrame:
    """Shannon entropy of the documents lang/source columns: both
    columns melt through ONE stack projection into ONE (column,
    value) census groupBy — one corpus scan for k columns; the
    entropy fold uses the numerically-stable ln(n) − Σc·ln(c)/n
    identity over the vocab-bounded census. Oracle: same identity
    in DuckDB."""
    from tablite_spark.operators.stats import column_entropy
    d = _t(spark, sf, "documents")
    out = column_entropy(d, ["lang", "source"])
    return out.select("column", "n", "n_distinct",
                      F.round(F.col("entropy"), 6).alias("entropy"),
                      F.round(F.col("norm_entropy"), 6)
                      .alias("norm_entropy"))


def pmi_collocations_docs(spark: SparkSession, sf: str) -> DataFrame:
    """Top-50 collocations by PMI over the documents corpus: pairs
    build row-locally, two combinable censuses, vocab-keyed joins,
    1-row broadcast N; the PMI log argument is a ratio of exact
    integer counts. Oracle: same censuses + formula in DuckDB."""
    from tablite_spark.pipeline.text import pmi_collocations
    d = _t(spark, sf, "documents")
    out = pmi_collocations(d, "text", k=50, min_count=5)
    return out.select("w1", "w2", "pair_count",
                      F.round(F.col("pmi"), 6).alias("pmi"))


def session_summary_events(spark: SparkSession, sf: str) -> DataFrame:
    """Per-entry-type session analytics (30-min gap sessions): lag+
    cumsum sessionization per user, ONE combinable per-session
    groupBy carrying the entry type via min_by on the portable
    order key, then a bounded per-entry-type fold — bounce rate /
    avg events / avg duration are exact integer ratios, emitted
    UNROUNDED. Oracle: the same lag/cumsum/arg_min chain in
    DuckDB."""
    from tablite_spark.operators.timeseries import session_summary
    ev = _t(spark, sf, "events")
    return session_summary(ev, "user_id", "ts", "event_type",
                           gap_seconds=1800, tiebreak="event_id")


def association_rules_lineitem(spark: SparkSession, sf: str) -> DataFrame:
    """Market-basket association rules over orders as baskets and
    parts as items: basket-keyed self-join (per-basket |items|²
    fan-out, bounded by real basket size — never corpus²), census
    supports joined back, 1-row broadcast N; confidence and lift are
    exact integer ratios, unrounded, ranked (lift DESC, a, b).
    Oracle: the same joins in DuckDB."""
    from tablite_spark.operators.frequency import association_rules
    li = _t(spark, sf, "lineitem")
    return association_rules(li, "l_orderkey", "l_partkey",
                             min_support=3, k=50)


def funnel_window_events(spark: SparkSession, sf: str) -> DataFrame:
    """Windowed view→click→purchase funnel: each hop must land
    within 1 HOUR of the previous step (the attribution-window
    semantics) — same selective-filter + conditional-min + user-key
    join chain as funnel_events, with an integer-microsecond hop
    bound (sub-second exact on both engines). Oracle: the chained
    CTEs with the same epoch_us bound."""
    from tablite_spark.operators.timeseries import funnel
    return funnel(_t(spark, sf, "events"),
                  ["view", "click", "purchase"],
                  within_seconds=3600)


def additive_seasonal_events(spark: SparkSession, sf: str) -> DataFrame:
    """Two-factor (hour + day-of-week) additive seasonal anomaly
    screen: all three factor means from ONE corpus scan via
    GROUPING SETS (Catalyst Expand feeding one combinable agg), the
    ≤32-row model broadcast back, pooled residual σ from a second
    scan — two scans total, no windows. Boundary margin audited:
    0.052 at sf0.01 / 0.011 at sf0.1, >=1e7x the drift. Oracle: the
    same GROUPING SETS model in DuckDB (day-of-week LABELS differ
    across engines but the row partition is identical, and only the
    fitted values are emitted)."""
    from tablite_spark.operators.timeseries import additive_seasonal
    ev = _t(spark, sf, "events")
    out = additive_seasonal(ev, "ts", "value", k=3.0)
    return out.select("event_id", "value",
                      F.round(F.col("expected"), 4).alias("expected"),
                      F.round(F.col("z"), 4).alias("z"))


def interarrival_events(spark: SparkSession, sf: str) -> DataFrame:
    """Per-user inter-arrival rhythm stats (mean/sd gap, CV,
    Goh-Barabási burstiness): one per-key lag window (per-key
    serialization contract) + ONE combinable per-key aggregate;
    gaps are integer microseconds so the moments are deterministic
    up to summation drift (rounded). Oracle: the same lag window +
    stddev_pop in DuckDB."""
    from tablite_spark.operators.timeseries import interarrival_stats
    ev = _t(spark, sf, "events")
    out = interarrival_stats(ev, "user_id", "ts",
                             tiebreak="event_id")
    return out.select("user_id", "n_gaps",
                      F.round(F.col("mean_gap_s"), 4)
                      .alias("mean_gap_s"),
                      F.round(F.col("sd_gap_s"), 4)
                      .alias("sd_gap_s"),
                      F.round(F.col("cv"), 6).alias("cv"),
                      F.round(F.col("burstiness"), 6)
                      .alias("burstiness"))


def bootstrap_ci_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Poisson-bootstrap 95% CI for the mean order total: 100
    deterministic md5-hash resamples — the ×100 explode feeds
    straight into a combinable groupBy(b) so partial aggregation
    collapses each task to ≤100 rows; the CI is one exact-percentile
    pass over the 100-row resample frame. Fully replayed by the
    DuckDB oracle (same hash, same inverse-CDF thresholds, same
    weighted means)."""
    from tablite_spark.operators.stats import bootstrap_ci
    o = _t(spark, sf, "orders")
    out = bootstrap_ci(o, "o_totalprice", "o_orderkey",
                       n_resamples=100, alpha=0.05)
    return out.select("n", F.round(F.col("estimate"), 4)
                      .alias("estimate"),
                      F.round(F.col("lo"), 4).alias("lo"),
                      F.round(F.col("hi"), 4).alias("hi"),
                      "n_resamples")


def active_users_events(spark: SparkSession, sf: str) -> DataFrame:
    """DAU/WAU/MAU + stickiness per day via the explode-window
    trick: distinct (user, day) pairs (bounded by users×days), ≤28
    row-local copies each, ONE count-distinct groupBy per day —
    never a distinct-over-sliding-window. Counts are exact
    integers; stickiness an exact ratio (unrounded). Oracle: the
    same explode in DuckDB."""
    from tablite_spark.operators.timeseries import active_users
    ev = _t(spark, sf, "events")
    return active_users(ev, "ts", "user_id", windows=(1, 7, 28))


def category_index_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic frequency-ordered label indexing of order
    status+priority: vocab-bounded census windows, broadcast join
    back; indices are exact integers. Oracle: the same
    (count DESC, value) ranking in DuckDB."""
    from tablite_spark.pipeline.features import category_index
    o = _t(spark, sf, "orders")
    out = category_index(o, ["o_orderstatus", "o_orderpriority"])
    return (out.groupBy("o_orderstatus", "o_orderstatus_idx",
                        "o_orderpriority", "o_orderpriority_idx")
            .agg(F.count(F.lit(1)).alias("n")))


def quantile_discretize_lineitem(spark: SparkSession, sf: str) -> DataFrame:
    """Equal-frequency discretization of lineitem measures: one
    array-percentile fit for both columns, row-local bucket
    expressions (no join); bucket populations returned as the
    check. Oracle: the same quantile edges + bucket counting in
    DuckDB."""
    from tablite_spark.pipeline.features import quantile_discretize
    li = _t(spark, sf, "lineitem")
    out = quantile_discretize(li, ["l_extendedprice", "l_quantity"],
                              bins=10)
    return (out.groupBy("l_extendedprice_bin", "l_quantity_bin")
            .agg(F.count(F.lit(1)).alias("n")))


def spearman_corr_lineitem(spark: SparkSession, sf: str) -> DataFrame:
    """Spearman rank correlation over lineitem measures: tie-average
    ranks via a DISTRIBUTED prefix sum (deterministic range buckets +
    in-bucket running sums + |buckets|-row driver offsets — never a
    global-order window), then one guarded Pearson-on-ranks agg.
    Oracle: DuckDB rank() + tie-count average ranks and corr()."""
    from tablite_spark.operators.stats import spearman_corr
    li = _t(spark, sf, "lineitem")
    out = spearman_corr(li, ["l_quantity", "l_extendedprice",
                             "l_discount"])
    return out.select("col_a", "col_b", "n",
                      F.round(F.col("rho"), 4).alias("rho"))


def fuzzy_join_customers(spark: SparkSession, sf: str) -> DataFrame:
    """Edit-distance self-join of customer names at d=1 via PassJoin
    segment blocking (`operators/fuzzy.py`): explode to (length,
    segment, text) keys -> equi join -> levenshtein verify — never a
    cross join (plan-gated), no false negatives (pigeonhole). The
    18-char names share a 9-char prefix, the adversarial hot-key
    shape; the oracle recomputes ground truth with a brute-force
    DuckDB cross join, so ANY candidate miss mismatches."""
    from tablite_spark.operators.fuzzy import fuzzy_join
    c = _t(spark, sf, "customer")
    out = fuzzy_join(c, c, "c_name", "c_name", max_distance=1,
                     left_id="c_custkey", right_id="c_custkey")
    return (out.filter(F.col("l_id") < F.col("r_id"))
            .select(F.col("l_id").cast("long").alias("l_id"),
                    F.col("r_id").cast("long").alias("r_id"),
                    F.col("dist").cast("int").alias("dist")))


def bpe_train_docs(spark: SparkSession, sf: str) -> DataFrame:
    """Distributed BPE vocabulary training (`bpe.train_bpe_distributed`
    — corpus-wide word census then one combinable pair-count groupBy +
    one argmax row + a row-local merge fold per round, word table
    localCheckpoint-pinned with deterministic release). Fixture is
    derived-invariant: three single-word doc classes whose merge
    sequence is closed-form, INCLUDING a second-round merge ('a'+'ab')
    whose pair only exists because round 1 created it — the oracle
    replays the counts from the band definition; the interacting
    semantics are additionally pinned against the serial `train_bpe`
    in pytest."""
    from tablite_spark.pipeline.bpe import train_bpe_distributed
    d = _t(spark, sf, "documents")
    fixture = d.select(
        F.when(F.col("doc_id") % 10 < 5, F.lit("aab"))
         .when(F.col("doc_id") % 10 < 8, F.lit("cd"))
         .otherwise(F.lit("pqrs")).alias("text"))
    return train_bpe_distributed(fixture, "text", 3)


def retention_cohorts_events(spark: SparkSession, sf: str) -> DataFrame:
    """Weekly cohort retention matrix over the events table: users
    cohorted by the epoch-aligned week of their first event; each
    (cohort, period) counts distinct users active that many weeks
    later. One combinable min groupBy(user) + a user-keyed join + one
    count_distinct groupBy — no windows, no per-user sequence state
    (a hot cohort never funnels into one task)."""
    from tablite_spark.operators.timeseries import retention_cohorts
    out = retention_cohorts(_t(spark, sf, "events"), "ts", "user_id",
                            "1 week")
    return out.select(F.col("cohort_start").cast("timestamp")
                      .alias("cohort_start"),
                      "period", "n_users")


def batched_topk_embeddings(spark: SparkSession, sf: str) -> DataFrame:
    """Exact cosine top-k via the BLAS-batched kernel
    (`similarity.batched_topk`): one numpy matmul per (arrow batch,
    query block) + boundary-tie-complete per-batch candidate cut +
    the salted two-phase rank — byte-identical contract to
    brute_force_topk but ~100x past 10^8 query-corpus pairs, where
    the pair-materializing catalyst join hits its quadratic wall.
    Distinct query set / k from embedding_topk so the two rows verify
    the two paths independently."""
    from tablite_spark.pipeline.similarity import batched_topk
    emb = _t(spark, sf, "embeddings")
    queries_df = emb.filter((F.col("vec_id") >= 3) & (F.col("vec_id") < 10))
    return batched_topk(emb, queries_df, k=7,
                        id_col="vec_id", vec_col="embedding")


def token_count_bpe(spark: SparkSession, sf: str) -> DataFrame:
    """BPE-ish regex token counting (word pieces + digits + punct)."""
    from tablite_spark.pipeline.text import token_count
    d = _t(spark, sf, "documents")
    return token_count(d, "text", mode="bpe_ish").select("doc_id", "n_tokens")


def language_id_docs(spark: SparkSession, sf: str) -> DataFrame:
    """Stopword-marker language heuristic; argmax over per-language
    marker counts (ties → lexicographically-largest language)."""
    from tablite_spark.pipeline.text import language_id
    d = _t(spark, sf, "documents")
    return language_id(d, "text").select("doc_id", "lang_pred")


def ngram_jaccard_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Exact token-3-gram Jaccard on a restricted pair set."""
    from tablite_spark.pipeline.dedup import ngram_jaccard
    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 40)
    j = ngram_jaccard(d, d, "text", "doc_id", n=3)
    return j.select("id_a", "id_b", F.round(F.col("jaccard"), 4).alias("jaccard"))


def dedup_clusters(spark: SparkSession, sf: str) -> DataFrame:
    """Transitive near-dup clustering: exact n-gram-Jaccard pairs →
    connected components (hash-min label propagation,
    pipeline/dedup.py:connected_components) → every doc labeled with
    the min doc_id of its duplicate cluster (singletons label
    themselves). Oracle reproduces the propagation with a recursive
    CTE — an exact cross-engine check of an iterative graph op."""
    from tablite_spark.pipeline.dedup import connected_components, ngram_jaccard
    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 60)
    pairs = (ngram_jaccard(d, d, "text", "doc_id", n=3)
             .filter(F.col("jaccard") >= 0.2))
    cc = connected_components(pairs)
    return (d.select("doc_id")
            .join(cc.withColumnRenamed("id", "doc_id"), "doc_id", "left")
            .select("doc_id",
                    F.coalesce("component", "doc_id").alias("component")))


def cluster_dedup_keep_best_docs(spark: SparkSession, sf: str) -> DataFrame:
    """Keep-BEST cluster dedup (dedup.cluster_dedup_keep_best —
    production curation keeps the highest-quality member of each
    near-dup cluster, not the min id). Derived-invariant fixture:
    pairwise-token-disjoint base docs (ids 0..59) gain exact
    duplicates at +100 (id%3==0) and +200 (id%5==0), so the true
    clusters are exactly {i} ∪ {i+100}? ∪ {i+200}? and Jaccard pairs
    exist only inside them. Quality (doc_id*7)%13 varies WITHIN a
    cluster (7 and 13 coprime), so the argmax winner is usually NOT
    the min id — keep-min-id would hash-mismatch. DuckDB reproduces
    the winner set arithmetically."""
    from tablite_spark.pipeline.dedup import (
        cluster_dedup_keep_best, ngram_jaccard,
    )
    ids = _t(spark, sf, "documents").select("doc_id") \
        .filter(F.col("doc_id") < 60)
    text = F.concat_ws(" ", F.transform(
        F.sequence(F.lit(1), F.lit(30)),
        lambda j: F.concat(F.lit("tok"),
                           (F.col("doc_id") * 1000 + j).cast("string"))))
    base = ids.select("doc_id", text.alias("text"))
    dup1 = (base.filter(F.col("doc_id") % 3 == 0)
            .select((F.col("doc_id") + 100).alias("doc_id"), "text"))
    dup2 = (base.filter(F.col("doc_id") % 5 == 0)
            .select((F.col("doc_id") + 200).alias("doc_id"), "text"))
    corpus = (base.unionByName(dup1).unionByName(dup2)
              .withColumn("quality", (F.col("doc_id") * 7) % 13))
    pairs = (ngram_jaccard(corpus, corpus, "text", "doc_id", n=3)
             .filter(F.col("jaccard") >= 0.2))
    out = cluster_dedup_keep_best(corpus, pairs, "doc_id", "quality")
    return out.select("doc_id", "quality")


def near_dup_embeddings(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (threshold 0.4), via the
    block-nested-loop BLAS kernel (exact; equivalence with the
    per-pair expression path is tested)."""
    from tablite_spark.pipeline.similarity import embedding_near_dup_blocked
    emb = _t(spark, sf, "embeddings")
    return embedding_near_dup_blocked(emb, "vec_id", "embedding", threshold=0.4)


def multimodal_decode(spark: SparkSession, sf: str) -> DataFrame:
    """Binary media column + mapInPandas decode (deterministic fake
    decoder — the Spark plumbing is the real artifact)."""
    from tablite_spark.pipeline.multimodal import attach_media, decode_images
    d = _t(spark, sf, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))
    m = attach_media(d, "payload", "image/fake").drop("payload")
    return decode_images(m).select("doc_id", "width", "height")


def media_features(spark: SparkSession, sf: str) -> DataFrame:
    """Byte-histogram 'embedding' via mapInPandas (Arrow-batched);
    deterministic stand-in for a real feature extractor."""
    from tablite_spark.pipeline.multimodal import attach_media, extract_image_features
    d = _t(spark, sf, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))
    m = attach_media(d, "payload", "image/fake").drop("payload")
    feats = extract_image_features(m, dim=8)
    return feats.select(
        "doc_id",
        F.round(F.element_at("features", 1).cast("double"), 4).alias("f0"),
        F.round(F.element_at("features", 8).cast("double"), 4).alias("f7"))


def _dup_fixture(spark: SparkSession, sf: str) -> DataFrame:
    """Controlled dedup corpus derived from the documents table: each
    doc_id gets a 30-token text whose tokens are UNIQUE to that doc
    (pairwise token-disjoint docs → true Jaccard 0 between any two
    distinct docs), and every doc_id % 4 == 0 gains an EXACT duplicate
    at doc_id + 10_000_000. On this corpus, near-dup detection
    (MinHash-LSH, SimHash) provably coincides with exact text dedup —
    which DuckDB reproduces verbatim. That turns the hash pipelines
    into exactly-oracle-able queries (the derived-invariant trick)."""
    d = _t(spark, sf, "documents").select("doc_id")
    text = F.concat_ws(" ", F.transform(
        F.sequence(F.lit(1), F.lit(30)),
        lambda j: F.concat(F.lit("tok"),
                           (F.col("doc_id") * 1000 + j).cast("string"))))
    base = d.select("doc_id", text.alias("text"))
    dups = (base.filter(F.col("doc_id") % 4 == 0)
            .select((F.col("doc_id") + 10_000_000).alias("doc_id"), "text"))
    return base.unionByName(dups)


def line_dedup_docs(spark: SparkSession, sf: str) -> DataFrame:
    """Line-level boilerplate removal (dedup.line_dedup — the CCNet
    paragraph-dedup / Dolma line-dedup recipe): docs are given three
    lines, with every doc_id % 3 == 0 sharing an identical footer
    line; line_dedup(min_docs=2) must strip exactly that footer from
    every carrier and keep all unique lines in order. DuckDB builds
    the expected post-dedup text directly (md5 + kept-line count)."""
    from tablite_spark.pipeline.dedup import line_dedup
    d = _t(spark, sf, "documents").select("doc_id")
    sid = F.col("doc_id").cast("string")
    mid = F.when(F.col("doc_id") % 3 == 0, F.lit("-- shared footer --")) \
           .otherwise(F.concat(F.lit("mid-"), sid))
    text = F.concat(F.lit("line-"), sid, F.lit("-a\n"),
                    mid, F.lit("\nline-"), sid, F.lit("-b"))
    docs = d.select("doc_id", text.alias("text"))
    out = line_dedup(docs, "text", "doc_id", min_docs=2)
    return out.select("doc_id",
                      F.md5("text_dedup").alias("text_md5"),
                      F.col("n_lines_kept").cast("long")
                       .alias("n_lines_kept"))


def gopher_quality_docs(spark: SparkSession, sf: str) -> DataFrame:
    """Gopher rule-based quality filter (text.gopher_rules, Rae et
    al. 2021 Appendix A) over the REAL documents table — not a
    synthetic fixture: every rule is integer cross-multiplication
    arithmetic, so DuckDB replays the full computation bit-for-bit
    from the same parquet."""
    from tablite_spark.pipeline.text import gopher_rules
    d = _t(spark, sf, "documents").select("doc_id", "text")
    return gopher_rules(d, "text", "doc_id", min_words=50)


def gopher_repetition_docs(spark: SparkSession, sf: str) -> DataFrame:
    """Gopher repetition signals (text.gopher_repetition) over the
    REAL documents table: duplicate line/para censuses and
    top-{2,3,4}-gram char masses are all integer arithmetic, so
    DuckDB replays the full computation (including the max-struct
    tie-break) from the same parquet."""
    from tablite_spark.pipeline.text import gopher_repetition
    d = _t(spark, sf, "documents").select("doc_id", "text")
    return gopher_repetition(d, "text", "doc_id")


def pretrain_filter_docs(spark: SparkSession, sf: str) -> DataFrame:
    """One-call pretraining gate (text.pretrain_filter): conjunction
    of the Gopher quality / repetition / dup-ngram stages with the
    first-failing-stage reason, over the REAL documents table. The
    oracle composes the three stage SQLs verbatim, so keep/reason are
    hash-exact end-to-end."""
    from tablite_spark.pipeline.text import pretrain_filter
    d = _t(spark, sf, "documents").select("doc_id", "text")
    return pretrain_filter(d, "text", "doc_id")


def gopher_dup_ngrams_docs(spark: SparkSession, sf: str) -> DataFrame:
    """Duplicated-n-gram character coverage (n=5..10,
    text.gopher_dup_ngram_coverage — the second half of Gopher's
    repetition table) over the REAL documents table; DuckDB replays
    the positional-coverage arithmetic (grouping by the gram STRING,
    which is equality-equivalent to the xxhash64 key Spark censuses
    on) from the same parquet."""
    from tablite_spark.pipeline.text import gopher_dup_ngram_coverage
    d = _t(spark, sf, "documents").select("doc_id", "text")
    return gopher_dup_ngram_coverage(d, "text", "doc_id")


def c4_clean_docs(spark: SparkSession, sf: str) -> DataFrame:
    """C4 cleaning rules (text.c4_rules, Raffel et al. 2020 §2.2):
    six constructed lines per doc exercise every line filter
    (terminal punctuation, 3-word minimum, javascript), plus
    doc_id-dependent lorem-ipsum / curly-brace page poisons; DuckDB
    builds the expected cleaned text and flags directly."""
    from tablite_spark.pipeline.text import c4_rules
    d = _t(spark, sf, "documents").select("doc_id")
    sid = F.col("doc_id").cast("string")
    base = F.concat(
        F.lit("The value "), sid, F.lit(" is good.\n"),
        F.lit("short.\n"),
        F.lit("no terminal punct here\n"),
        F.lit("Javascript required to view.\n"),
        F.lit("Totally fine sentence number "), sid, F.lit("!\n"),
        F.lit("Is this kept as well?"))
    poison = F.when(F.col("doc_id") % 5 == 0,
                    F.lit("\ncode block { }"))\
        .when(F.col("doc_id") % 7 == 0, F.lit("\nsee lorem ipsum."))\
        .otherwise(F.lit(""))
    docs = d.select("doc_id", F.concat(base, poison).alias("text"))
    out = c4_rules(docs, "text", "doc_id")
    return out.select("doc_id",
                      F.md5("text_clean").alias("clean_md5"),
                      "n_lines_kept", "keep_page")


def substring_dedup_docs(spark: SparkSession, sf: str) -> DataFrame:
    """Exact substring dedup (dedup.substring_dedup — the Lee et al.
    2022 k-gram-anchor recipe): every doc_id % 3 == 0 embeds the same
    5-token run between otherwise doc-unique tokens;
    substring_dedup(k=5) must excise exactly that run from every
    carrier and leave non-carriers (all-unique 5-token docs)
    untouched. DuckDB builds the expected post-dedup text directly
    (md5 + kept-token count)."""
    from tablite_spark.pipeline.dedup import substring_dedup
    d = _t(spark, sf, "documents").select("doc_id")
    sid = F.col("doc_id").cast("string")
    carrier = F.concat(F.lit("a"), sid, F.lit(" b"), sid,
                       F.lit(" sh0 sh1 sh2 sh3 sh4 c"), sid,
                       F.lit(" d"), sid)
    plain = F.concat(F.lit("a"), sid, F.lit(" b"), sid, F.lit(" c"),
                     sid, F.lit(" d"), sid, F.lit(" e"), sid)
    docs = d.select("doc_id",
                    F.when(F.col("doc_id") % 3 == 0, carrier)
                     .otherwise(plain).alias("text"))
    out = substring_dedup(docs, "text", "doc_id", k=5, min_docs=2)
    return out.select("doc_id",
                      F.md5("text_dedup").alias("text_md5"),
                      F.col("n_tokens_kept").cast("long")
                       .alias("n_tokens_kept"))


def semantic_dedup_embeddings(spark: SparkSession, sf: str) -> DataFrame:
    """SemDeDup-style semantic dedup (similarity.semantic_dedup:
    k-means cells + within-cell cosine, keep-min-id), exactly oracled
    via the derived-invariant trick (_dup_fixture's embedding
    analogue): each vec_id gets a deterministic 3-hot vector in R^96
    — distinct ids share at most 2 of 3 coordinates (cosine <= 2/3 <
    0.9), planted duplicates at vec_id + 10M reuse the ORIGINAL id's
    vector (cosine exactly 1, and identical points always land in the
    same k-means cell) — so survivors provably equal exact
    keep-min-id dedup, which DuckDB computes over the same
    construction."""
    from tablite_spark.pipeline.similarity import semantic_dedup
    e = _t(spark, sf, "embeddings").select("vec_id")
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(95)),
        lambda j: F.when(
            (j.cast("long") == F.col("vec_id") % 32)
            | (j.cast("long") == 32 + F.floor(F.col("vec_id") / 32) % 32)
            | (j.cast("long") == 64 + F.floor(F.col("vec_id") / 1024) % 32),
            F.lit(1.0)).otherwise(F.lit(0.0)))
    base = e.select("vec_id", vec.alias("vec"))
    dups = (base.filter(F.col("vec_id") % 4 == 0)
            .select((F.col("vec_id") + 10_000_000).alias("vec_id"), "vec"))
    corpus = base.unionByName(dups)
    out = semantic_dedup(corpus, "vec_id", "vec",
                         threshold=0.9, n_lists=8)
    return out.select("vec_id")


def perplexity_docs(spark: SparkSession, sf: str) -> DataFrame:
    """Char-trigram LM perplexity quality scoring (text.
    perplexity_score — the CCNet/Wenzek-2020 filter signal re-expressed
    Spark-first: explode + broadcast model join + combinable groupBy,
    no UDF). Scores are quantized to integer millinats
    (floor(1000*ln p) per gram, summed) so distributed float
    summation is order-independent and DuckDB replays the exact
    training + scoring arithmetic."""
    from tablite_spark.pipeline.text import perplexity_score
    d = _t(spark, sf, "documents").select("doc_id", "text")
    return perplexity_score(d, "text", id_col="doc_id")


def vocab_shift_docs(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus-drift monitoring (text.vocab_divergence): JS divergence
    between the token distributions of two document snapshots (docs
    split by doc_id parity), add-alpha smoothed, each per-token term
    quantized to integer micronats so the distributed sum is exact
    and DuckDB replays the whole computation."""
    from tablite_spark.pipeline.text import vocab_divergence
    d = _t(spark, sf, "documents").select("doc_id", "text")
    a = d.filter(F.col("doc_id") % 2 == 0)
    b = d.filter(F.col("doc_id") % 2 == 1)
    return vocab_divergence(a, b, "text")


def minhash_dedup_docs(spark: SparkSession, sf: str) -> DataFrame:
    """MinHash+LSH near-dup removal (shingle → signature → band join →
    est-Jaccard filter → anti-join), exactly oracled on the duplicate
    fixture: exact duplicates have identical signatures (always found,
    est-Jaccard 1), token-disjoint docs share no shingle so no band
    collides — survivors == exact-dedup-keep-min-id, which the oracle
    computes over the same constructed corpus."""
    from tablite_spark.pipeline.dedup import minhash_dedup
    corpus = _dup_fixture(spark, sf)
    return minhash_dedup(corpus, "text", "doc_id",
                         threshold=0.8).select("doc_id")


def incremental_minhash_dedup_docs(spark: SparkSession, sf: str) -> DataFrame:
    """NEW-batch-vs-corpus NEAR-dup dedup against a PERSISTED band
    table (dedup.minhash_save_index / incremental_minhash_dedup — the
    pq_save_index pattern applied to MinHash-LSH). Derived-invariant
    fixture: the corpus is the pairwise-token-disjoint _dup_fixture
    base; the new batch holds (A) exact dups of corpus docs where
    doc_id%5==0 (identical signatures → every band collides → est
    Jaccard 1 → dropped by the CORPUS probe), (B) fresh docs in a
    disjoint token namespace (no shared shingle with anything →
    kept), and (C) exact in-batch dups of B where doc_id%6==0
    (dropped by the in-batch pass, min id wins). Survivors provably ==
    B, which DuckDB reproduces arithmetically. The index round-trips
    through parquet save/load inside the query, so the DURABLE path
    is what gets oracled."""
    import tempfile

    from tablite_spark.pipeline.dedup import (
        incremental_minhash_dedup, minhash_save_index, shingle_minhash,
    )
    corpus = _dup_fixture(spark, sf).filter(F.col("doc_id") < 10_000_000)
    idx = tempfile.mkdtemp(prefix="mh_idx_") + "/index"
    minhash_save_index(shingle_minhash(corpus, "text", "doc_id"),
                       "doc_id", idx)

    base_ids = _t(spark, sf, "documents").select("doc_id")
    corpus_text = F.concat_ws(" ", F.transform(
        F.sequence(F.lit(1), F.lit(30)),
        lambda j: F.concat(F.lit("tok"),
                           (F.col("doc_id") * 1000 + j).cast("string"))))
    fresh_text = F.concat_ws(" ", F.transform(
        F.sequence(F.lit(1), F.lit(30)),
        lambda j: F.concat(F.lit("ntok"),
                           (F.col("doc_id") * 1000 + j).cast("string"))))
    # two-step selects: compute text from the ORIGINAL doc_id first —
    # a same-name alias in one select would shadow it via lateral
    # column alias resolution and silently break the dup construction
    a = (base_ids.filter(F.col("doc_id") % 5 == 0)
         .select("doc_id", corpus_text.alias("text"))
         .select((F.col("doc_id") + 20_000_000).alias("doc_id"), "text"))
    b = (base_ids.select("doc_id", fresh_text.alias("text"))
         .select((F.col("doc_id") + 30_000_000).alias("doc_id"), "text"))
    c = (base_ids.filter(F.col("doc_id") % 6 == 0)
         .select("doc_id", fresh_text.alias("text"))
         .select((F.col("doc_id") + 40_000_000).alias("doc_id"), "text"))
    batch = a.unionByName(b).unionByName(c)
    out = incremental_minhash_dedup(batch, "text", "doc_id", idx,
                                    threshold=0.8)
    return out.select("doc_id")


def stream_incremental_dedup_docs(spark: SparkSession,
                                  sf: str) -> DataFrame:
    """The STREAMING ingestion-loop dedup entry point itself
    (streaming.ops.stream_incremental_dedup), driver-oracled: a real
    file-source stream drains with availableNow through foreachBatch,
    one file per micro-batch in pinned mtime order. Derived-invariant
    fixture across TWO batches:

    - seed index = the pairwise-token-disjoint _dup_fixture corpus;
    - batch 1: (A, +20M) exact dups of corpus docs where id%5==0 →
      dropped by the corpus probe; (B, +30M) fresh docs in a disjoint
      'ntok' namespace → kept; (C, +40M) in-batch dups of B where
      id%6==0 → dropped, min id wins;
    - batch 2: (D, +50M) exact dups of BATCH 1's survivors where
      id%7==0 — droppable ONLY because batch 1's accepted signatures
      were appended to the durable index between micro-batches (the
      cross-batch property that distinguishes the streaming loop from
      its batch twin); (E, +60M) fresh 'mtok' docs → kept.

    Survivors are provably B ∪ E = every doc_id +30M and +60M, which
    DuckDB reproduces arithmetically. Exactly-once shape: survivors
    land in per-batch hive partitions (idempotent overwrite)."""
    import glob
    import os
    import shutil
    import tempfile

    from tablite_spark.pipeline.dedup import (
        minhash_save_index, shingle_minhash,
    )
    from tablite_spark.streaming.ops import stream_incremental_dedup

    corpus = _dup_fixture(spark, sf).filter(F.col("doc_id") < 10_000_000)
    root = tempfile.mkdtemp(prefix="sid_")
    idx = f"{root}/index"
    minhash_save_index(shingle_minhash(corpus, "text", "doc_id"),
                       "doc_id", idx)

    base_ids = _t(spark, sf, "documents").select("doc_id")

    def ns_text(prefix: str):
        return F.concat_ws(" ", F.transform(
            F.sequence(F.lit(1), F.lit(30)),
            lambda j: F.concat(F.lit(prefix),
                               (F.col("doc_id") * 1000 + j)
                               .cast("string"))))

    def shifted(df, text_col, shift):
        return (df.select("doc_id", text_col.alias("text"))
                .select((F.col("doc_id") + shift).alias("doc_id"),
                        "text"))

    a = shifted(base_ids.filter(F.col("doc_id") % 5 == 0),
                ns_text("tok"), 20_000_000)
    b = shifted(base_ids, ns_text("ntok"), 30_000_000)
    c = shifted(base_ids.filter(F.col("doc_id") % 6 == 0),
                ns_text("ntok"), 40_000_000)
    d = shifted(base_ids.filter(F.col("doc_id") % 7 == 0),
                ns_text("ntok"), 50_000_000)
    e = shifted(base_ids, ns_text("mtok"), 60_000_000)
    batch1 = a.unionByName(b).unionByName(c)
    batch2 = d.unionByName(e)

    src = f"{root}/src"
    os.makedirs(src)
    for i, bdf in enumerate([batch1, batch2]):
        stage = f"{root}/stage{i}"
        bdf.coalesce(1).write.mode("overwrite").parquet(stage)
        part = glob.glob(f"{stage}/part-*.parquet")[0]
        dst = f"{src}/batch{i}.parquet"
        shutil.copy(part, dst)
        t = 1_700_000_000 + i * 600  # pin micro-batch order by mtime
        os.utime(dst, (t, t))

    stream = (spark.readStream.schema("doc_id long, text string")
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = stream_incremental_dedup(
        stream, "text", "doc_id", idx, out_path=f"{root}/out",
        checkpoint=f"{root}/ckpt", threshold=0.8)
    q.awaitTermination()
    return spark.read.parquet(f"{root}/out").select("doc_id")


def kmeans_embeddings(spark: SparkSession, sf: str) -> DataFrame:
    """Distributed k-means (pipeline/clustering.py) over the REAL
    embeddings table — Lloyd's with integer-quantized vectors so the
    ENTIRE training trajectory (md5-seeded init, every assignment,
    every floor-mean centroid update, 3 rounds, k=4) is bit-exact
    and engine-neutral. The oracle re-derives seeds, assignments and
    centroid updates itself as unrolled DuckDB CTEs — a wrong
    tie-break, a float drift, or a mis-carried empty cell all
    hash-mismatch. Per iteration the Spark plan is ONE combinable
    aggregation (k×(dim+1) integer sums cross the network); the
    assignment is a pure zero-shuffle expression."""
    from tablite_spark.pipeline.clustering import kmeans_cells
    emb = _t(spark, sf, "embeddings")
    out = kmeans_cells(emb, "embedding", "vec_id", k=4, iters=3)
    return out.select(F.col("cell").cast("long").alias("cell"),
                      "n_points", "centroid_csv")


def _kmeans_oracle_sql(k: int = 4, iters: int = 3, dim: int = 64,
                       scale: int = 1048576) -> str:
    """Unrolled-CTE DuckDB replay of kmeans_cells — the
    quality_classifier pattern (replay every iteration) applied to
    clustering. Must mirror clustering.py exactly: floor(x·scale+.5)
    quantize, (md5(id), id) seed order, struct-min (dist, j)
    tie-break, floor(sum/n) centroid update, empty cells carry."""
    parts = [f"""q AS (
  SELECT vec_id, list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE)*{scale}.0+0.5) AS BIGINT)) AS qv
  FROM embeddings)""",
             f"""c0 AS (
  SELECT (row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)) - 1 AS j,
         qv AS cv
  FROM q QUALIFY (row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)) <= {k})"""]

    def assign(name: str, cin: str) -> str:
        return f"""{name} AS (
  SELECT q.vec_id, min(struct_pack(d := dd.dist, j := c.j)).j AS cell
  FROM q, {cin} c,
  LATERAL (SELECT list_sum(list_transform(list_zip(q.qv, c.cv),
                    p -> (p[1]-p[2])*(p[1]-p[2]))) AS dist) dd
  GROUP BY q.vec_id)"""

    for it in range(iters):
        parts.append(assign(f"a{it}", f"c{it}"))
        parts.append(f"""n{it + 1} AS (
  SELECT cell AS j, list(CAST(floor(sx / n) AS BIGINT) ORDER BY i) AS cv
  FROM (SELECT a.cell, t.i, CAST(sum(q.qv[CAST(t.i AS INT)+1]) AS DOUBLE) AS sx,
               CAST(count(*) AS DOUBLE) AS n
        FROM a{it} a JOIN q USING (vec_id), range({dim}) t(i)
        GROUP BY a.cell, t.i)
  GROUP BY cell)""")
        parts.append(f"""c{it + 1} AS (
  SELECT c{it}.j, COALESCE(n{it + 1}.cv, c{it}.cv) AS cv
  FROM c{it} LEFT JOIN n{it + 1} ON c{it}.j = n{it + 1}.j)""")
    parts.append(assign("af", f"c{iters}"))
    parts.append(
        "cnt AS (SELECT cell, count(*) AS n_points FROM af GROUP BY cell)")
    return ("WITH " + ",\n".join(parts) + f"""
SELECT c{iters}.j AS cell, CAST(COALESCE(cnt.n_points, 0) AS BIGINT) AS n_points,
       array_to_string(list_transform(c{iters}.cv, v -> CAST(v AS VARCHAR)), ',')
         AS centroid_csv
FROM c{iters} LEFT JOIN cnt ON c{iters}.j = cnt.cell""")


def preference_pairs_docs(spark: SparkSession, sf: str) -> DataFrame:
    """DPO preference-pair distillation (pipeline/preference.py) over
    the REAL documents table: responses = documents grouped into
    prompts by doc_id % 97, scored by an exact integer signal
    (length % 997 — ties occur and exercise the tie-break). One
    combinable max/min(struct) groupBy — no window (plan-gated), no
    join-back for texts. The oracle replays the argmax/argmin structs
    and the margin filter; a wrong tie-break or a lost text flips an
    md5."""
    from tablite_spark.pipeline.preference import build_preference_pairs
    d = _t(spark, sf, "documents")
    resp = d.select((F.col("doc_id") % 97).alias("prompt_id"),
                    F.col("doc_id"), "text",
                    (F.length("text") % 997).cast("long").alias("score"))
    pairs = build_preference_pairs(resp, "prompt_id", "doc_id", "text",
                                   "score", margin=50.0)
    return pairs.select(
        "prompt_id", "chosen_id", "rejected_id",
        F.md5("chosen_text").alias("chosen_md5"),
        F.md5("rejected_text").alias("rejected_md5"),
        F.col("pair_margin").cast("long").alias("pair_margin"))


def simhash_docs(spark: SparkSession, sf: str) -> DataFrame:
    """64-bit SimHash invariants, exactly oracled on the duplicate
    fixture: simhash is a pure function of the token stream, so
    duplicate texts share a signature, and (deterministic under the
    fixed hash) pairwise token-disjoint texts get distinct ones —
    distinct signatures == distinct texts."""
    from tablite_spark.pipeline.dedup import simhash
    corpus = _dup_fixture(spark, sf)
    sig = simhash(corpus, "text", "doc_id")
    joined = corpus.join(sig, "doc_id")
    return joined.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("simhash").alias("n_sigs"),
        F.countDistinct("text").alias("n_texts"))


def deterministic_sample_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Hash-membership sampling (pipeline/sampling.py): rerun- and
    engine-stable — the DuckDB oracle reproduces the EXACT same subset
    from the same md5 math."""
    from tablite_spark.pipeline.sampling import deterministic_sample
    o = _t(spark, sf, "orders")
    s = deterministic_sample(o, "o_orderkey", 0.1)
    return s.agg(F.count(F.lit(1)).alias("n"),
                 F.sum("o_orderkey").alias("key_sum"))


def stratified_sample_docs(spark: SparkSession, sf: str) -> DataFrame:
    """Per-stratum deterministic sampling (sampleBy semantics without
    seed-dependence); counts per lang oracled exactly."""
    from tablite_spark.pipeline.sampling import (
        stratified_deterministic_sample,
    )
    docs = _t(spark, sf, "documents")
    s = stratified_deterministic_sample(
        docs, "doc_id", "lang", {"en": 0.5, "de": 0.25}, default=0.1)
    return (s.groupBy("lang").agg(F.count(F.lit(1)).alias("n"),
                                  F.sum("doc_id").alias("id_sum")))


def simhash_near_dup_docs(spark: SparkSession, sf: str) -> DataFrame:
    """SimHash near-dup pairs (pigeonhole chunk banding +
    bit_count(xor) verify), exactly oracled on the duplicate fixture:
    the pair set must be precisely the planted exact-duplicate pairs
    at hamming 0 — token-disjoint docs sit ~32 bits apart and can
    never pass max_hamming=3."""
    from tablite_spark.pipeline.dedup import simhash, simhash_near_dup_pairs
    corpus = _dup_fixture(spark, sf)
    sig = simhash(corpus, "text", "doc_id")
    return simhash_near_dup_pairs(sig, "doc_id", max_hamming=3)


def ivf_topk_embeddings(spark: SparkSession, sf: str) -> DataFrame:
    """IVF ANN (seeded k-means inverted lists + n_probe cell
    scoring). With fixed seeds the approx result is a fixed set; the
    oracle pins those ids and DuckDB recomputes the exact top-5 and
    the overlap itself (_ann_overlap_oracle)."""
    from tablite_spark.pipeline.similarity import (
        brute_force_topk, ivf_topk, topk_recall,
    )
    emb = _t(spark, sf, "embeddings")
    q = emb.filter(F.col("vec_id") < 3)
    approx = ivf_topk(emb, q, k=5, id_col="vec_id", vec_col="embedding",
                      n_lists=8, n_probe=5)
    exact = brute_force_topk(emb, q, k=5, id_col="vec_id",
                             vec_col="embedding")
    rec = topk_recall(approx, exact)
    return (q.select(F.col("vec_id").alias("qid"))
            .join(rec, "qid", "left")
            .select("qid",
                    F.coalesce("n_overlap", F.lit(0)).cast("long")
                     .alias("n_overlap"),
                    (F.coalesce("n_overlap", F.lit(0)) >= 3)
                    .alias("recall_ok")))


def pq_topk_embeddings(spark: SparkSession, sf: str) -> DataFrame:
    """Product-quantization ANN (similarity.pq_topk — Jégou et al.
    2011 codebooks + ADC lookup-table scoring + exact refine).
    Seeded sample-trained codebooks make the approx set a fixed
    function of the data; the oracle pins those ids and DuckDB
    recomputes the exact top-5 and the overlap itself
    (_ann_overlap_oracle)."""
    from tablite_spark.pipeline.similarity import (
        brute_force_topk, pq_topk, topk_recall,
    )
    emb = _t(spark, sf, "embeddings")
    q = emb.filter(F.col("vec_id") < 3)
    approx = pq_topk(emb, q, k=5, id_col="vec_id", vec_col="embedding",
                     m=8, n_codes=256, refine=4)
    exact = brute_force_topk(emb, q, k=5, id_col="vec_id",
                             vec_col="embedding")
    rec = topk_recall(approx, exact)
    return (q.select(F.col("vec_id").alias("qid"))
            .join(rec, "qid", "left")
            .select("qid",
                    F.coalesce("n_overlap", F.lit(0)).cast("long")
                     .alias("n_overlap"),
                    (F.coalesce("n_overlap", F.lit(0)) >= 3)
                    .alias("recall_ok")))


def ivfpq_topk_embeddings(spark: SparkSession, sf: str) -> DataFrame:
    """FAISS-style IVF-PQ (similarity.ivfpq_topk — coarse-cell
    pruning + ADC codes + exact refine). All seeds fixed →
    deterministic approx set; the oracle pins those ids and DuckDB
    recomputes the exact top-5 and the overlap itself
    (_ann_overlap_oracle)."""
    from tablite_spark.pipeline.similarity import (
        brute_force_topk, ivfpq_topk, topk_recall,
    )
    emb = _t(spark, sf, "embeddings")
    q = emb.filter(F.col("vec_id") < 3)
    approx = ivfpq_topk(emb, q, k=5, id_col="vec_id",
                        vec_col="embedding", n_lists=8, n_probe=5,
                        m=8, n_codes=256, refine=4)
    exact = brute_force_topk(emb, q, k=5, id_col="vec_id",
                             vec_col="embedding")
    rec = topk_recall(approx, exact)
    return (q.select(F.col("vec_id").alias("qid"))
            .join(rec, "qid", "left")
            .select("qid",
                    F.coalesce("n_overlap", F.lit(0)).cast("long")
                     .alias("n_overlap"),
                    (F.coalesce("n_overlap", F.lit(0)) >= 3)
                    .alias("recall_ok")))


def lsh_topk_embeddings(spark: SparkSession, sf: str) -> DataFrame:
    """Random-hyperplane LSH approximate top-k. Seeded planes make
    the approx set a fixed function of the data; the oracle pins
    those ids and DuckDB independently recomputes the exact top-5
    and the overlap count (_ann_overlap_oracle)."""
    from tablite_spark.pipeline.similarity import (
        brute_force_topk, lsh_topk, topk_recall,
    )
    emb = _t(spark, sf, "embeddings")
    q = emb.filter(F.col("vec_id") < 3)
    dim = len(emb.select("embedding").first()["embedding"])
    approx = lsh_topk(emb, q, k=5, dim=dim, id_col="vec_id",
                      vec_col="embedding", bits=48, bands=12)
    exact = brute_force_topk(emb, q, k=5, id_col="vec_id",
                             vec_col="embedding")
    rec = topk_recall(approx, exact)
    return (q.select(F.col("vec_id").alias("qid"))
            .join(rec, "qid", "left")
            .select("qid",
                    F.coalesce("n_overlap", F.lit(0)).cast("long")
                     .alias("n_overlap"),
                    (F.coalesce("n_overlap", F.lit(0)) >= 3)
                    .alias("recall_ok")))


def holdout_split_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Hash-disjoint train/holdout split (pipeline/sampling.py:
    train_holdout_split): a row can never migrate between splits as
    the corpus grows. The DuckDB oracle reproduces the exact md5
    membership, so per-split counts and key-sums match hash-exactly."""
    from tablite_spark.pipeline.sampling import train_holdout_split
    o = _t(spark, sf, "orders")
    train, hold = train_holdout_split(o, "o_orderkey", 0.1)
    tagged = (train.select(F.lit("train").alias("split"), "o_orderkey")
              .unionByName(hold.select(F.lit("holdout").alias("split"),
                                       "o_orderkey")))
    return tagged.groupBy("split").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("o_orderkey").alias("key_sum"))


def shuffle_order_docs(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic corpus shuffle
    (pipeline/sampling.py:deterministic_shuffle): the first 20 docs of
    the seeded training order, with their epoch rank. DuckDB replays
    the identical md5 ordering."""
    from tablite_spark.pipeline.sampling import (
        _unit_hash, deterministic_shuffle,
    )
    d = _t(spark, sf, "documents").select("doc_id")
    head = deterministic_shuffle(d, "doc_id", seed="epoch1").limit(20)
    w = W.orderBy(_unit_hash(F.concat(F.lit("epoch1"),
                                      F.col("doc_id").cast("string"))))
    return head.select("doc_id", F.row_number().over(w).alias("rnk"))


def quota_cap_docs(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source quota cap (pipeline/sampling.py:quota_cap): at most
    15 docs survive per source, chosen by md5-rank within the group —
    the DuckDB oracle reproduces the exact same rank, so survivors
    (and their id-sum) match hash-exactly."""
    from tablite_spark.pipeline.sampling import quota_cap
    d = _t(spark, sf, "documents")
    capped = quota_cap(d, "doc_id", "source", 15)
    return capped.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("doc_id").alias("id_sum"))


def normalize_docs(spark: SparkSession, sf: str) -> DataFrame:
    """Canonical text normalization (pipeline/text.py:normalize_text):
    every doc gains a DECOMPOSED-form prefix ('Cafe' + combining acute
    U+0301 + ragged spaces); NFC + lowercase + whitespace collapse must
    fold it to 'café ' exactly. The md5 of the normalized text proves
    byte-exact agreement with DuckDB's nfc_normalize pipeline."""
    from tablite_spark.pipeline.text import normalize_text
    d = _t(spark, sf, "documents")
    aug = d.select(
        "doc_id",
        F.concat(F.lit("Cafe\u0301   "), F.col("text")).alias("text"))
    out = normalize_text(aug, "text")
    return out.select("doc_id", F.md5("text_norm").alias("norm_md5"))


def unicode_sort_rank(spark: SparkSession, sf: str) -> DataFrame:
    """UCA-collated sort (operators/sorting.py:sort collation=...):
    nation names gain accented prefixes, then rank under the ICU 'de'
    collation — Spark's JVM-side ICU collator against DuckDB's ICU
    'de' collation (both implement the Unicode Collation Algorithm the
    reference reaches through pyUCA, sort_utils.py:222-264). The rank
    column materializes the order so the order-insensitive driver
    compare still proves the collation agrees."""
    n = _t(spark, sf, "nation")
    pfx = (F.when(F.col("n_nationkey") % 3 == 0, F.lit("Ä"))
           .when(F.col("n_nationkey") % 3 == 1, F.lit("é"))
           .otherwise(F.lit("a")))
    named = n.select(F.concat(pfx, F.col("n_name")).alias("accented"))
    w = W.orderBy(F.collate(F.col("accented"), "de"))
    return named.select("accented", F.row_number().over(w).alias("rnk"))


def mixture_sample_docs(spark: SparkSession, sf: str) -> DataFrame:
    """Mixture rebalancing (pipeline/sampling.py:mixture_sample): the
    corpus is down-sampled so language shares hit en/de/fr/es =
    50/25/12.5/12.5 (zh dropped; shares exactly representable in
    binary so both engines do identical IEEE arithmetic). Keep-rates
    derive from the group counts; membership is md5-hash-exact, so
    DuckDB reproduces the survivors verbatim."""
    from tablite_spark.pipeline.sampling import mixture_sample
    d = _t(spark, sf, "documents")
    out = mixture_sample(d, "doc_id", "lang",
                         {"en": 0.5, "de": 0.25, "fr": 0.125, "es": 0.125})
    return out.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("doc_id").alias("id_sum"))


def token_budget_docs(spark: SparkSession, sf: str) -> DataFrame:
    """Token-budget cap (pipeline/sampling.py:token_budget_cap): each
    source keeps the strict PREFIX of docs in md5-hash order whose
    running token sum stays <= 600 — once one doc overflows the budget,
    it and everything after it is dropped (no best-fit packing of later
    smaller docs). The DuckDB oracle replays the identical
    cumulative-sum window."""
    from tablite_spark.pipeline.sampling import token_budget_cap
    d = _t(spark, sf, "documents").withColumn(
        "n_tok", F.size(F.split(F.col("text"), " ")))
    capped = token_budget_cap(d, "doc_id", "source", "n_tok", 600)
    return capped.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("doc_id").alias("id_sum"),
        F.sum("n_tok").alias("tok_sum"))


def incremental_dedup_docs(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental (cross-snapshot) dedup
    (pipeline/dedup.py:incremental_dedup): a constructed NEW batch —
    exact re-crawls of every doc_id%5==1 doc (+1M ids), plus fresh
    ' v2' variants of every doc_id%5==2 doc planted TWICE (+2M and +3M
    ids) — is deduped against the full corpus. Survivors must be
    exactly the +2M set: re-crawls die on the seen-hash anti-join,
    the duplicated fresh texts keep their min id. Content-hash
    equality == text equality here, which DuckDB replays verbatim."""
    from tablite_spark.pipeline.dedup import incremental_dedup
    d = _t(spark, sf, "documents")
    recrawl = (d.filter(F.col("doc_id") % 5 == 1)
               .select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text"))
    fresh_lo = (d.filter(F.col("doc_id") % 5 == 2)
                .select((F.col("doc_id") + 2_000_000).alias("doc_id"),
                        F.concat(F.col("text"), F.lit(" v2")).alias("text")))
    fresh_hi = fresh_lo.select((F.col("doc_id") + 1_000_000).alias("doc_id"),
                               "text")
    new_batch = recrawl.unionByName(fresh_lo).unionByName(fresh_hi)
    return incremental_dedup(new_batch, d, "text", "doc_id") \
        .select("doc_id")


def asof_join_events(spark: SparkSession, sf: str) -> DataFrame:
    """As-of join: each error event picks the user's most recent click
    at-or-before it (union + ordered carry — one shuffle, no join;
    the reference's lookup-with-time-inequality shape, lookup.py:14-110).
    Oracled against DuckDB's native ASOF LEFT JOIN."""
    from tablite_spark.operators.joins import asof_join
    e = _t(spark, sf, "events")
    errors = e.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id"),
        F.col("value").alias("click_value"))
    out = asof_join(errors, clicks, on="ts", by=["user_id"],
                    right_cols=["click_id", "click_value"])
    return out.select("event_id", "click_id",
                      F.round(F.col("click_value"), 2).alias("click_value"))


def range_join_prices(spark: SparkSession, sf: str) -> DataFrame:
    """Binned range join: lineitem prices landing inside part retail-
    price bands (equi join on bins + exact containment — never a
    nested-loop). Oracled against DuckDB's BETWEEN join."""
    from tablite_spark.operators.joins import range_join
    li = _t(spark, sf, "lineitem").filter(F.col("l_orderkey") < 2000) \
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
    bands = _t(spark, sf, "part").filter(F.col("p_partkey") <= 200).select(
        "p_partkey",
        (F.col("p_retailprice") * 10 - 50).alias("lo"),
        (F.col("p_retailprice") * 10 + 50).alias("hi"))
    out = range_join(li, bands, "l_extendedprice", "lo", "hi")
    return (out.groupBy("p_partkey")
            .agg(F.count(F.lit(1)).alias("n_hits"),
                 F.sum(F.col("l_orderkey") + F.col("l_linenumber")).alias("key_sum")))


def png_decode_dims(spark: SparkSession, sf: str) -> DataFrame:
    """REAL image decode (pipeline/png.py stdlib PNG codec +
    multimodal.decode_images): each doc gets a genuine PNG whose
    dimensions derive from doc_id; the decoded IHDR dimensions and the
    true mean-red feature must match the arithmetic oracle."""
    import numpy as np
    import pandas as pd

    from tablite_spark.pipeline.multimodal import (
        attach_media, decode_images, extract_image_features,
    )
    from tablite_spark.pipeline.png import png_encode
    d = _t(spark, sf, "documents").select("doc_id")

    def encode(batches):
        for pdf in batches:
            raws = []
            for did in pdf["doc_id"]:
                w, h = 8 + int(did) % 5, 6 + int(did) % 3
                # red channel 0 or 255 -> mean_red is exactly 0.0/1.0
                # in float32, no rounding-boundary ambiguity vs the
                # double-precision oracle
                px = np.zeros((h, w, 3), dtype=np.uint8)
                px[:, :, 0] = 255 * (int(did) % 2)
                raws.append(png_encode(px))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "raw": raws})

    imgs = d.mapInPandas(encode, schema="doc_id long, raw binary")
    media = attach_media(imgs, "raw", "image/png").drop("raw")
    dims = decode_images(media)
    feats = extract_image_features(media, dim=4).select(
        "doc_id", F.element_at("features", 1).cast("double").alias("mean_red"))
    return dims.select("doc_id", "width", "height").join(feats, "doc_id")


def jpeg_decode_dims(spark: SparkSession, sf: str) -> DataFrame:
    """REAL JPEG decode (pipeline/jpeg.py — pure stdlib+numpy ITU-T
    T.81 codec + multimodal.decode_images): each doc gets a genuine
    JFIF whose dimensions derive from doc_id — doc_id % 3 == 0 docs
    PROGRESSIVE 4:2:0 with restart intervals (SOF2: spectral
    selection + successive approximation + EOB runs + subsampled
    non-interleaved chroma scans, round 6), the rest baseline 4:2:0
    with restart intervals. The decoded SOF dimensions and the (quantization-
    rounded) mean-red feature must match the arithmetic oracle —
    which only holds if both entropy paths reconstruct real pixels.
    The dims intentionally straddle 16x16 MCU boundaries (odd
    widths, partial edge blocks) so padding and subsampled
    reconstruction are exercised, not just the header path."""
    import numpy as np
    import pandas as pd

    from tablite_spark.pipeline.jpeg import (
        jpeg_encode, jpeg_encode_progressive,
    )
    from tablite_spark.pipeline.multimodal import (
        attach_media, decode_images, extract_image_features,
    )
    d = _t(spark, sf, "documents").select("doc_id")

    def encode(batches):
        for pdf in batches:
            raws = []
            for did in pdf["doc_id"]:
                w, h = 16 + int(did) % 9, 12 + int(did) % 5
                # red 0 or 255: after quantization the decoded
                # mean-red is within a couple of 1/255 steps of exact,
                # so round() recovers the planted bit losslessly
                px = np.zeros((h, w, 3), dtype=np.uint8)
                px[:, :, 0] = 255 * (int(did) % 2)
                if int(did) % 3 == 0:
                    raws.append(jpeg_encode_progressive(
                        px, quality=90, subsample="420",
                        restart_interval=2))
                else:
                    raws.append(jpeg_encode(px, quality=90,
                                            subsample="420",
                                            restart_interval=2))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "raw": raws})

    imgs = d.mapInPandas(encode, schema="doc_id long, raw binary")
    media = attach_media(imgs, "raw", "image/jpeg").drop("raw")
    dims = decode_images(media)
    feats = extract_image_features(media, dim=4).select(
        "doc_id",
        F.round(F.element_at("features", 1), 0).cast("double")
         .alias("mean_red_bit"))
    return dims.select("doc_id", "width", "height").join(feats, "doc_id")


def gif_decode_dims(spark: SparkSession, sf: str) -> DataFrame:
    """REAL GIF decode (pipeline/gif.py — pure stdlib LZW with
    variable code widths + multimodal dispatch): each doc gets a
    genuine GIF89a whose dimensions derive from doc_id, every third
    doc interlaced (4-pass row order), all pixels the planted red
    bit. Palette decode is LOSSLESS so the mean-red feature recovers
    the bit exactly — no quantization rounding needed."""
    import numpy as np
    import pandas as pd

    from tablite_spark.pipeline.gif import gif_encode
    from tablite_spark.pipeline.multimodal import (
        attach_media, decode_images, extract_image_features,
    )
    d = _t(spark, sf, "documents").select("doc_id")

    def encode(batches):
        for pdf in batches:
            raws = []
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = 16 + did % 9, 12 + did % 5
                px = np.zeros((h, w, 3), dtype=np.uint8)
                px[:, :, 0] = 255 * (did % 2)
                raws.append(gif_encode(px, interlace=(did % 3 == 0)))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "raw": raws})

    imgs = d.mapInPandas(encode, schema="doc_id long, raw binary")
    media = attach_media(imgs, "raw", "image/gif").drop("raw")
    dims = decode_images(media)
    feats = extract_image_features(media, dim=4).select(
        "doc_id",
        F.round(F.element_at("features", 1), 0).cast("double")
         .alias("mean_red_bit"))
    return dims.select("doc_id", "width", "height").join(feats, "doc_id")


def audio_features_meta(spark: SparkSession, sf: str) -> DataFrame:
    """REAL audio DSP features (multimodal.extract_audio_features —
    numpy rfft/RMS/zero-crossings, no audio lib): each doc gets a
    0.2 s 16 kHz sine whose frequency (500·(1+id%8) Hz) and amplitude
    (8000·(1+id%2)) derive from doc_id, phase-offset half a sample so
    no sample quantizes to exactly zero. Invariants verified exact:
    zero-crossings = 200·m − 1, round(centroid/500) = m,
    round(rms·32768·√2/8000) = amplitude bit — all integers the
    arithmetic oracle reproduces."""
    import numpy as np
    import pandas as pd

    from tablite_spark.pipeline.multimodal import (
        attach_media, extract_audio_features, wav_encode,
    )
    d = _t(spark, sf, "documents").select("doc_id")

    def encode(batches):
        for pdf in batches:
            raws = []
            for did in pdf["doc_id"]:
                did = int(did)
                f = 500 * (1 + did % 8)
                amp = 8000 * (1 + did % 2)
                k = np.arange(3200)
                x = np.round(amp * np.sin(
                    2 * np.pi * f * (k + 0.5) / 16000)).astype(np.int16)
                raws.append(wav_encode(x, sample_rate=16000))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "raw": raws})

    clips = d.mapInPandas(encode, schema="doc_id long, raw binary")
    media = attach_media(clips, "raw", "audio/wav").drop("raw")
    feats = extract_audio_features(media)
    sqrt2 = 2.0 ** 0.5
    return feats.select(
        "doc_id",
        F.col("sample_rate"),
        F.col("duration_ms"),
        F.col("zero_crossings"),
        F.round(F.col("spectral_centroid_hz") / 500.0, 0)
         .cast("long").alias("centroid_bucket"),
        F.round(F.col("rms") * 32768.0 * sqrt2 / 8000.0, 0)
         .cast("long").alias("amp_bit"))


def video_frames_meta(spark: SparkSession, sf: str) -> DataFrame:
    """REAL MJPEG-AVI frame sampling (pipeline/avi.py RIFF container
    + pipeline/jpeg.py per-frame decode + multimodal.
    sample_video_frames): every 5th doc gets a genuine AVI whose
    frame count (3..6), dimensions (MCU-straddling, like
    jpeg_decode_dims), and planted per-frame luminance bit derive
    from doc_id; sampling at 200 ms of a 10 fps stream keeps every
    2nd frame. The sampled-frame count, dims, last timestamp, and
    quantization-rounded luma bits must match the arithmetic
    oracle."""
    import numpy as np
    import pandas as pd

    from tablite_spark.pipeline.avi import avi_encode
    from tablite_spark.pipeline.multimodal import (
        attach_media, sample_video_frames,
    )
    d = (_t(spark, sf, "documents").select("doc_id")
         .where(F.col("doc_id") % 5 == 0))

    def encode(batches):
        for pdf in batches:
            raws = []
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = 16 + did % 9, 12 + did % 5
                n = 3 + did % 4
                frames = []
                for i in range(n):
                    px = np.full((h, w, 3),
                                 255 * ((did + i) % 2), dtype=np.uint8)
                    frames.append(px)
                raws.append(avi_encode(frames, fps=10.0, quality=90))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "raw": raws})

    vids = d.mapInPandas(encode, schema="doc_id long, raw binary")
    media = attach_media(vids, "raw", "video/x-msvideo").drop("raw")
    sampled = sample_video_frames(media, every_ms=200)
    return (sampled.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_sampled"),
                 F.max("width").alias("width"),
                 F.max("height").alias("height"),
                 F.max("t_ms").alias("max_t_ms"),
                 F.sum(F.round(F.col("mean_luma") / 255.0, 0))
                  .cast("long").alias("luma_bits")))


def wav_decode_meta(spark: SparkSession, sf: str) -> DataFrame:
    """REAL audio metadata decode (multimodal.decode_audio — RIFF/WAVE
    header parse): each doc gets a genuine mono 16-bit WAV whose length
    derives from doc_id; decoded sample_rate/channels/duration_ms must
    match the arithmetic oracle."""
    import numpy as np
    import pandas as pd

    from tablite_spark.pipeline.multimodal import (
        attach_media, decode_audio, wav_encode,
    )
    d = _t(spark, sf, "documents").select("doc_id")

    def encode(batches):
        for pdf in batches:
            raws = []
            for did in pdf["doc_id"]:
                n = 800 + (int(did) % 10) * 160  # 50ms + k*10ms @16kHz
                raws.append(wav_encode(np.zeros(n, dtype="<i2"), 16_000))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "raw": raws})

    wavs = d.mapInPandas(encode, schema="doc_id long, raw binary")
    media = attach_media(wavs, "raw", "audio/wav").drop("raw")
    return decode_audio(media).select(
        "doc_id", "sample_rate", "channels", "duration_ms")


def resize_images_agg(spark: SparkSession, sf: str) -> DataFrame:
    """REAL resize pipeline proof (multimodal.resize_images, round 6):
    each doc gets a genuine solid-color PNG (red level (doc_id*37)%256,
    size straddling non-integer box ratios), runs decode → numpy
    box-average resize → PNG re-encode inside ONE mapInPandas pass,
    then a SECOND independent decode reads back the output dims and
    mean red. Box-averaging a solid color is exact, so the planted red
    level must survive the full codec→resample→codec chain bit-exactly
    — a constant-only oracle would not catch a channel swap, a
    stride bug, or resample drift; the per-doc varying level does."""
    import numpy as np
    import pandas as pd

    from tablite_spark.pipeline.multimodal import (
        attach_media, decode_images, extract_image_features, resize_images,
    )
    from tablite_spark.pipeline.png import png_encode
    d = _t(spark, sf, "documents").select("doc_id").filter(
        F.col("doc_id") < 2000)

    def encode(batches):
        for pdf in batches:
            raws = []
            for did in pdf["doc_id"]:
                w, h = 9 + int(did) % 5, 7 + int(did) % 3
                px = np.zeros((h, w, 3), dtype=np.uint8)
                px[:, :, 0] = (int(did) * 37) % 256
                raws.append(png_encode(px))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "raw": raws})

    imgs = d.mapInPandas(encode, schema="doc_id long, raw binary")
    media = attach_media(imgs, "raw", "image/png").drop("raw")
    small = resize_images(media, width=4, height=4, out_format="png")
    dims = decode_images(small).select("doc_id", "width", "height")
    red = extract_image_features(small, dim=4).select(
        "doc_id",
        F.round(F.element_at("features", 1).cast("double") * 255)
         .cast("long").alias("red_level"))
    return dims.join(red, "doc_id")


def resample_audio_meta(spark: SparkSession, sf: str) -> DataFrame:
    """REAL resample pipeline proof (multimodal.resample_audio, round
    6): each doc gets a genuine 8 kHz mono PCM WAV holding a constant
    level (doc_id*131)%32768; resample to 16 kHz (np.interp — exact on
    a constant), re-encode, then an independent decode verifies the
    new rate, the doubled duration, and the bit-exact surviving level.
    Catches rate-metadata-only fakes: duration_ms and the level both
    come from the RESAMPLED payload, not the input."""
    import numpy as np
    import pandas as pd

    from tablite_spark.pipeline.multimodal import (
        attach_media, resample_audio, wav_encode, wav_samples,
    )
    d = _t(spark, sf, "documents").select("doc_id").filter(
        F.col("doc_id") < 2000)

    def encode(batches):
        for pdf in batches:
            raws = []
            for did in pdf["doc_id"]:
                n = 160 + (int(did) % 7) * 40  # multiple of 8
                v = (int(did) * 131) % 32768
                raws.append(wav_encode(np.full(n, v, dtype="<i2"), 8_000))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "raw": raws})

    wavs = d.mapInPandas(encode, schema="doc_id long, raw binary")
    media = attach_media(wavs, "raw", "audio/wav").drop("raw")
    out = resample_audio(media, target_rate=16_000)

    def verify(batches):
        for pdf in batches:
            rows = []
            for did, m in zip(pdf["doc_id"], pdf["media"]):
                rate, x = wav_samples(bytes(m["data"]))
                pcm = np.round(x * 32768.0).astype(int)
                rows.append((int(did), int(m["sample_rate"]),
                             int(m["duration_ms"]),
                             int(pcm.max()), int(pcm.min()),
                             len(pcm)))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "sample_rate", "duration_ms",
                "level_max", "level_min", "n_samples"])

    return out.mapInPandas(
        verify, schema="doc_id long, sample_rate long, duration_ms long,"
                       " level_max long, level_min long, n_samples long")


def cluster_holdout_docs(spark: SparkSession, sf: str) -> DataFrame:
    """Leakage-safe cluster holdout (pipeline/sampling.py:266
    cluster_holdout_split): near-dup clusters from n-gram-Jaccard →
    connected components, split hashed on the CLUSTER id so near-twins
    never straddle train/eval. Returns each doc's side — the oracle
    replays the recursive-CTE components AND the md5 cluster-hash
    membership, so a doc-keyed (leaky) split hash-mismatches."""
    from tablite_spark.pipeline.dedup import (
        connected_components, ngram_jaccard,
    )
    from tablite_spark.pipeline.sampling import cluster_holdout_split
    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 60)
    pairs = (ngram_jaccard(d, d, "text", "doc_id", n=3)
             .filter(F.col("jaccard") >= 0.2))
    cc = connected_components(pairs)
    train, hold = cluster_holdout_split(
        d.select("doc_id"), "doc_id", cc, holdout_fraction=0.3)
    return (train.select("doc_id", F.lit("train").alias("side"))
            .unionByName(hold.select("doc_id",
                                     F.lit("holdout").alias("side"))))


def canonical_urls_docs(spark: SparkSession, sf: str) -> DataFrame:
    """URL canonicalization (pipeline/text.py:canonicalize_urls):
    deterministically messy URLs (uppercase scheme/host, default port,
    utm/fbclid params, fragment, trailing slash) built from doc_id
    must canonicalize byte-identically in both engines. ``myfbclid``
    is a boundary trap: a legit param whose name merely CONTAINS a
    tracking-param name must survive (the strip is [?&]-anchored)."""
    from tablite_spark.pipeline.text import canonicalize_urls
    d = _t(spark, sf, "documents")
    did = F.col("doc_id").cast("string")
    url = F.concat(F.lit("HTTPS://Example"), (F.col("doc_id") % 7).cast("string"),
                   F.lit(".COM:443/Path/"), did,
                   F.lit("/?utm_source=x&id="), did,
                   F.lit("&utm_campaign=y&fbclid=abc&myfbclid=keep#frag"))
    aug = d.select("doc_id", url.alias("url"))
    return canonicalize_urls(aug, "url").select("doc_id", "url_canon")


def interval_join_events(spark: SparkSession, sf: str) -> DataFrame:
    """Batch twin of streaming/ops.py:stream_interval_join (the
    dual-watermark stream-stream join): each error event pairs with
    the same user's clicks at most one hour before it. Runs through
    the binned range_join (operators/joins.py:264) — clicks become
    [ts, ts+1h] validity intervals, errors hash to time bins, equi
    join + exact containment. Oracled against DuckDB's BETWEEN join."""
    from tablite_spark.operators.joins import range_join
    e = _t(spark, sf, "events")
    errors = (e.filter(F.col("event_type") == "error")
              .select(F.col("event_id").alias("err_id"), "user_id",
                      F.unix_timestamp("ts").cast("double").alias("err_ts")))
    clicks = (e.filter(F.col("event_type") == "click")
              .select(F.col("event_id").alias("click_id"), "user_id",
                      F.unix_timestamp("ts").cast("double").alias("lo"),
                      (F.unix_timestamp("ts") + 3600).cast("double").alias("hi")))
    out = range_join(errors, clicks, "err_ts", "lo", "hi", by=["user_id"])
    return (out.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_pairs"),
                 F.sum(F.col("err_id") + F.col("click_id")).alias("pair_sum")))


def redact_pii_docs(spark: SparkSession, sf: str) -> DataFrame:
    """PII scrub (emails/URLs/phones → [KIND] tokens). The corpus text
    is synthetic prose, so PII spans are planted deterministically from
    doc_id; md5 of the redacted text proves byte-exact redaction."""
    from tablite_spark.pipeline.text import redact_pii
    d = _t(spark, sf, "documents").select(
        "doc_id",
        F.concat(F.col("text"),
                 F.lit(" contact user"), F.col("doc_id").cast("string"),
                 F.lit("@example.com or https://ex.co/"),
                 F.col("doc_id").cast("string")).alias("text"))
    out = redact_pii(d, "text")
    return out.select("doc_id", F.md5(F.col("text")).alias("redacted_md5"))


def repetition_docs(spark: SparkSession, sf: str) -> DataFrame:
    """Within-doc repetition metrics (Gopher-style dup token / dup
    bigram fractions) — boilerplate/spam signal for corpus filtering."""
    from tablite_spark.pipeline.text import repetition_metrics
    d = _t(spark, sf, "documents")
    out = repetition_metrics(d, "text", n=2)
    return out.select(
        "doc_id",
        F.round(F.col("dup_token_frac"), 4).alias("dup_token_frac"),
        F.round(F.col("dup_ngram_frac"), 4).alias("dup_ngram_frac"))


def vocab_top_ngrams(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus vocabulary: top-50 unigrams by count (explode →
    partial-agg → top-k), deterministic tiebreak on the token."""
    from tablite_spark.pipeline.text import top_k_ngrams
    d = _t(spark, sf, "documents")
    return top_k_ngrams(d, "text", n=1, k=50)


def weighted_sample_docs(spark: SparkSession, sf: str) -> DataFrame:
    """Importance-weighted deterministic sampling (weight = doc length):
    membership is a pure hash function — rerun/engine/append stable —
    and DuckDB reproduces the exact subset."""
    from tablite_spark.pipeline.sampling import weighted_deterministic_sample
    d = _t(spark, sf, "documents").select(
        "doc_id", F.length("text").cast("double").alias("w"))
    out = weighted_deterministic_sample(d, "doc_id", "w", 0.3, salt="ws")
    return out.select("doc_id")


def chunk_docs(spark: SparkSession, sf: str) -> DataFrame:
    """Token-window document chunking (40-token chunks, 8 overlap) —
    single-scan explode, no shuffle; md5 proves byte-exact chunks."""
    from tablite_spark.pipeline.text import chunk_documents
    d = _t(spark, sf, "documents")
    out = chunk_documents(d, "text", "doc_id", chunk_tokens=40, overlap=8)
    return out.select("doc_id", "chunk_id",
                      F.md5(F.col("chunk_text")).alias("chunk_md5"),
                      "chunk_tokens")


def contamination_docs(spark: SparkSession, sf: str) -> DataFrame:
    """Benchmark-decontamination: docs sharing 8-gram spans with a
    probe set (here: the first 5 documents) meet in a posting-list
    hash join on the n-gram — never docs x probes."""
    from tablite_spark.pipeline.text import contamination_check
    d = _t(spark, sf, "documents")
    probes = d.filter(F.col("doc_id") < 5).select(
        F.col("doc_id").alias("probe_id"), F.col("text").alias("probe_text"))
    out = contamination_check(d, probes, "text", "doc_id",
                              "probe_text", "probe_id", n=8)
    return out.select("doc_id", "probe_id", "shared_grams",
                      F.round(F.col("overlap"), 4).alias("overlap"))


def pack_chunks_docs(spark: SparkSession, sf: str) -> DataFrame:
    """Sequence packing: chunked docs assigned to 256-token packs per
    source via a per-group prefix-scan window (distributes across
    sources; deterministic order)."""
    from tablite_spark.pipeline.text import chunk_documents, pack_chunks
    d = _t(spark, sf, "documents")
    ch = chunk_documents(d, "text", "doc_id", chunk_tokens=40, overlap=0)
    src = d.select("doc_id", "source")
    ch = ch.join(F.broadcast(src), "doc_id")
    packed = pack_chunks(ch, "chunk_tokens", budget=256,
                         by=["source"], order_by=["doc_id", "chunk_id"])
    return (packed.groupBy("source", "pack_id")
            .agg(F.count(F.lit(1)).alias("n_chunks"),
                 F.sum("chunk_tokens").alias("pack_tokens")))


def corpus_manifest(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source corpus reporting: docs, chars, tokens, language
    spread — the dataset-card numbers, one partial-agg pass."""
    d = _t(spark, sf, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    return (d.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(F.length("text")).alias("n_chars"),
                 F.sum(F.size(toks)).alias("n_tokens"),
                 F.count_distinct(F.col("lang")).alias("n_langs"),
                 F.min("doc_id").alias("min_doc_id"),
                 F.max("doc_id").alias("max_doc_id")))


def pack_sequences_docs(spark: SparkSession, sf: str) -> DataFrame:
    """Concat-and-chunk sequence packing (text.pack_sequences, round
    6 — the GPT-pretraining layout): documents tokenized by an
    ARITHMETIC id scheme both engines can compute (length*131 +
    1-based position % 127 — BPE ids are pytest-tested separately,
    tokenize_bpe), EOS 0 after each doc, packed into exact 64-token
    windows with documents crossing boundaries. DuckDB rebuilds the
    identical global token stream with a row_number and replays the
    windowing; the array hash pins every token of every sequence,
    and n_docs pins the boundary-crossing accounting."""
    from tablite_spark.pipeline.text import pack_sequences
    d = _t(spark, sf, "documents")
    toks = F.filter(F.split(F.trim(F.col("text")), r"\s+"),
                    lambda t: t != "")
    ids = F.transform(
        toks, lambda t, i: (F.length(t) * 131 + (i + 1) % 127)
        .cast("int"))
    docs = d.select("doc_id", ids.alias("ids"))
    out = pack_sequences(docs, "ids", "doc_id", seq_len=64, eos_id=0)
    # scalarize the array for the driver's value-hash comparator
    return out.select(
        "seq_id",
        F.md5(F.concat_ws(",", F.transform(
            "input_ids", lambda x: x.cast("string")))).alias("ids_md5"),
        "n_docs")


def pack_sequences_sft_docs(spark: SparkSession, sf: str) -> DataFrame:
    """SFT-packing path of text.pack_sequences — ``mask_col`` AND
    ``boundaries`` together (the combined path the round-7 10M-doc
    burn-in exercises; this row makes it driver-gated too): same
    arithmetic token scheme as pack_sequences_docs plus a
    position-parity loss mask and doc-start offsets. DuckDB rebuilds
    the stream and replays windows, masks (EOS slots masked 0) and
    per-window start-offset lists; the three md5 columns pin every
    token, every mask bit, and every boundary of every window."""
    from tablite_spark.pipeline.text import pack_sequences
    d = _t(spark, sf, "documents")
    toks = F.filter(F.split(F.trim(F.col("text")), r"\s+"),
                    lambda t: t != "")
    ids = F.transform(
        toks, lambda t, i: (F.length(t) * 131 + (i + 1) % 127)
        .cast("int"))
    mask = F.transform(toks, lambda t, i: ((i + 1) % 2).cast("int"))
    docs = d.select("doc_id", ids.alias("ids"), mask.alias("mask"))
    out = pack_sequences(docs, "ids", "doc_id", seq_len=64, eos_id=0,
                         boundaries=True, mask_col="mask", eos_mask=0)
    s = lambda c: F.md5(F.concat_ws(",", F.transform(  # noqa: E731
        c, lambda x: x.cast("string"))))
    return out.select("seq_id", s("input_ids").alias("ids_md5"),
                      s("loss_mask").alias("mask_md5"),
                      s("doc_starts").alias("starts_md5"), "n_docs")


def bucketed_join_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Shuffle-free co-located join (operators/bucketing.py, round
    6): orders and customer are written once bucketed on the join
    key (hash(key) % 4 files), then joined with ZERO exchanges —
    the bucketed scans' hash partitioning feeds sort-merge join
    directly (plan-gated in tests/test_bucketing.py). The revenue-
    by-segment values must equal DuckDB's plain join, proving
    co-location changes the PLAN, never the result."""
    import tempfile

    from tablite_spark.operators.bucketing import (
        bucketed_join, save_bucketed,
    )
    tmp = tempfile.mkdtemp(prefix="q_bkt_")
    save_bucketed(_t(spark, sf, "orders"), "q_bkt_orders",
                  ["o_custkey"], 4, path=f"{tmp}/orders")
    save_bucketed(_t(spark, sf, "customer"), "q_bkt_customer",
                  ["c_custkey"], 4, path=f"{tmp}/customer")
    j = bucketed_join(spark, "q_bkt_orders", "q_bkt_customer",
                      on=[F.col("o_custkey") == F.col("c_custkey")])
    return (j.groupBy("c_mktsegment")
            .agg(F.count("*").alias("n_orders"),
                 F.round(F.sum("o_totalprice"), 2).alias("revenue"),
                 F.countDistinct("o_custkey").alias("n_custs")))


def bm25_search_docs(spark: SparkSession, sf: str) -> DataFrame:
    """BM25 keyword retrieval (pipeline/retrieval.py, round 6 —
    beyond reference): top-5 documents for three literal topic
    probes. Posting-list pipeline: ONE token-volume shuffle builds
    (doc, term, tf); query terms and the query-term df subset
    broadcast-join into it, so only docs sharing a probe term are
    scored. Deterministic ranking (score rounded to 6 dp, ties by
    doc_id) lets DuckDB reproduce the exact rows with the same
    Robertson idf / Lucene non-negative form."""
    from tablite_spark.pipeline.retrieval import bm25_search
    d = _t(spark, sf, "documents")
    qs = spark.createDataFrame(
        [(1, "spark window agg"), (2, "customer query batch"),
         (3, "vector scan merge")], "qid long, qtext string")
    return bm25_search(d, qs, k=5)


def hybrid_search_docs(spark: SparkSession, sf: str) -> DataFrame:
    """Hybrid retrieval (retrieval.py:rrf_fuse — beyond reference):
    BM25 top-20 for three literal topic probes FUSED with exact
    dense-cosine top-20 for three embedding probes (qid = vec_id+1,
    vec_id < 3; brute_force_topk's nid != qid self-guard is part of
    the replayed contract) via reciprocal-rank fusion in integer
    micro-units, so the fused score is an exact BIGINT and the
    oracle replays BOTH underlying rankings and the fusion
    arithmetic bit-for-bit. Top-10 per qid, ties by doc_id."""
    from tablite_spark.pipeline.retrieval import bm25_search, rrf_fuse
    from tablite_spark.pipeline.similarity import brute_force_topk
    d = _t(spark, sf, "documents")
    emb = _t(spark, sf, "embeddings")
    qs = spark.createDataFrame(
        [(1, "spark window agg"), (2, "customer query batch"),
         (3, "vector scan merge")], "qid long, qtext string")
    sparse = bm25_search(d, qs, k=20).select("qid", "doc_id", "rank")
    qvec = (emb.filter(F.col("vec_id") < 3)
            .select((F.col("vec_id") + 1).alias("vec_id"), "embedding"))
    dense = (brute_force_topk(emb, qvec, k=20, id_col="vec_id",
                              vec_col="embedding")
             .select("qid", F.col("nid").alias("doc_id"),
                     F.col("rn").alias("rank")))
    return rrf_fuse([sparse, dense], k=10)


def hard_negatives_embeddings(spark: SparkSession, sf: str) -> DataFrame:
    """Hard-negative mining (similarity.py:hard_negatives — beyond
    reference, DPR recipe): per probe vector, the 5 most-similar
    corpus vectors with a DIFFERENT label (same-label = positive,
    null-distinct semantics). Exclusion evaluates inline in the one
    broadcast-join corpus scan; ranking is the salted two-phase
    top-k. The oracle recomputes the full cross-label ranking."""
    from tablite_spark.pipeline.similarity import hard_negatives
    emb = _t(spark, sf, "embeddings")
    probes = emb.filter(F.col("vec_id") < 3)
    return hard_negatives(emb, probes, k=5, id_col="vec_id",
                          vec_col="embedding", label_col="label")


def pagerank_lineitem(spark: SparkSession, sf: str) -> DataFrame:
    """Distributed PageRank (pipeline/graph.py — beyond reference,
    web-graph quality prior): 3 damped power iterations over the
    supplier→part multigraph from lineitem (part nodes offset by 1M
    to disjoin the id spaces; every part node is DANGLING, so the
    uniform redistribution path carries real mass). Integer
    micro-unit ranks make every iteration bit-reproducible; the
    oracle replays all three as unrolled DuckDB CTEs."""
    from tablite_spark.pipeline.graph import pagerank
    li = _t(spark, sf, "lineitem")
    edges = li.select(F.col("l_suppkey").cast("long").alias("src"),
                      (F.col("l_partkey") + 1_000_000).cast("long")
                      .alias("dst"))
    return pagerank(edges, "src", "dst", iters=3)


def _pagerank_oracle_sql(iters: int = 3, damping: float = 0.85,
                         unit: int = 10 ** 12) -> str:
    """Unrolled-CTE DuckDB replay of pagerank_lineitem — must mirror
    graph.py exactly: floor(unit/N) init, per-edge floor(rank/outdeg),
    floor(d·Σ) damping, floor(d·dangling/N) uniform redistribution,
    identical left-assoc float expressions."""
    u = f"{float(unit):.1f}"
    parts = [f"""e AS (SELECT l_suppkey AS src,
                1000000 + l_partkey AS dst FROM lineitem)""",
             """nodes0 AS (SELECT DISTINCT node FROM
                (SELECT src AS node FROM e
                 UNION ALL SELECT dst FROM e))""",
             """odeg AS (SELECT src AS node, COUNT(*) AS outdeg
                FROM e GROUP BY src)""",
             """nodes AS (SELECT n.node, COALESCE(o.outdeg, 0) AS outdeg
                FROM nodes0 n LEFT JOIN odeg o ON n.node = o.node)""",
             "nn AS (SELECT COUNT(*) AS n FROM nodes)",
             f"""r0 AS (SELECT node, outdeg,
                CAST(floor({u} / nn.n) AS BIGINT) AS rank
                FROM nodes, nn)"""]
    for it in range(iters):
        parts.append(f"""d{it} AS (SELECT COALESCE(SUM(rank), 0) AS s
                FROM r{it} WHERE outdeg = 0)""")
        parts.append(f"""c{it} AS (SELECT e.dst AS node,
                SUM(CAST(floor(CAST(r.rank AS DOUBLE) / r.outdeg)
                         AS BIGINT)) AS s
                FROM e JOIN r{it} r ON e.src = r.node
                WHERE r.outdeg > 0 GROUP BY e.dst)""")
        parts.append(f"""r{it + 1} AS (SELECT n.node, n.outdeg,
                CAST(floor((1.0 - {damping}) * {u} / nn.n) AS BIGINT)
                + CAST(floor({damping} * d{it}.s / nn.n) AS BIGINT)
                + CAST(floor({damping} * CAST(COALESCE(c.s, 0)
                                              AS DOUBLE)) AS BIGINT)
                    AS rank
                FROM nodes n LEFT JOIN c{it} c ON n.node = c.node,
                     nn, d{it})""")
    return ("WITH " + ",\n".join(parts)
            + f"\nSELECT node, rank FROM r{iters}")


def snapshot_diff_docs(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus version diff (dedup.snapshot_diff — beyond reference,
    dataset versioning): old = documents; new = documents with
    doc_id%7==0 rewritten, doc_id%11==0 dropped, and a 9000000+ id
    band appended. Content-hash classification over ONE payload-free
    full-outer join; the oracle replays the same construction and
    hash compare. Counts per status are closed-form in the fixture."""
    from tablite_spark.pipeline.dedup import snapshot_diff
    d = _t(spark, sf, "documents")
    old = d.select("doc_id", "text")
    changed = (F.col("doc_id") % 7 == 0)
    new = (d.filter(F.col("doc_id") % 11 != 0)
           .select("doc_id",
                   F.when(changed, F.concat(F.lit("v2 "), F.col("text")))
                   .otherwise(F.col("text")).alias("text"))
           .unionByName(
               d.filter(F.col("doc_id") % 13 == 0)
               .select((F.col("doc_id") + 9_000_000).alias("doc_id"),
                       "text")))
    return snapshot_diff(old, new, "doc_id", "text")


def column_profile(spark: SparkSession, sf: str) -> DataFrame:
    """Single-pass sketch profile (operators/stats.py:
    profile_columns, round 6): n / nulls / HLL++ distinct / min /
    max / mean for four lineitem columns in ONE aggregation job —
    the 100 TB data-profiling pass where per-column exact
    countDistincts would each cost a shuffle. The HLL estimate
    cannot be replayed by another engine, so the oracle contract is:
    exact fields must MATCH DuckDB exactly, and `distinct_ok` is
    computed HONESTLY Spark-side (|HLL − exact| ≤ 3·rsd·exact,
    exact via countDistinct in this validation query only) while
    DuckDB pins the expectation TRUE — a sketch drifting out of
    bound flips the value and reddens the row."""
    from tablite_spark.operators.stats import profile_columns
    li = _t(spark, sf, "lineitem")
    cols = ["l_orderkey", "l_quantity", "l_returnflag",
            "l_linestatus"]
    prof = profile_columns(li, cols, rsd=0.05)
    exact = li.agg(
        *[F.countDistinct(c).alias(c) for c in cols]).first()
    ex_df = spark.createDataFrame(
        [(c, int(exact[c])) for c in cols], "column string, ex long")
    return (prof.join(F.broadcast(ex_df), "column")
            .select("column", "n", "n_nulls", "min", "max",
                    F.round("mean", 6).alias("mean_r"),
                    (F.abs(F.col("approx_distinct") - F.col("ex"))
                     <= 0.15 * F.col("ex")).alias("distinct_ok")))


def quality_classifier_docs(spark: SparkSession, sf: str) -> DataFrame:
    """Learned quality classifier (pipeline/classifier.py, round 6 —
    beyond reference): logistic regression by full-batch GD over
    exactly-replayable integer-derived features, trained
    DISTRIBUTED (one combinable aggregation per iteration, k+1
    numbers cross the network) against the 'long document' label.
    The determinism contract (per-iteration gradients rounded to 6
    dp, lr an exact binary fraction) makes the whole 30-iteration
    trajectory bit-reproducible, so DuckDB replays ALL of training
    as 60 unrolled CTEs and must land on the identical weights —
    verified through the per-document probabilities (rounded 4 dp)
    and hard predictions this query returns. Accuracy ~0.97 at
    sf0.01 (reported per-row so the oracle pins it too)."""
    from tablite_spark.pipeline.classifier import (
        doc_quality_features, logreg_predict, logreg_train,
    )
    d = _t(spark, sf, "documents")
    feats = ["f_words", "f_lines", "f_chars", "f_vocab"]
    fdf = (doc_quality_features(d, "text")
           .withColumn("y", (F.col("n_chars") > 250).cast("int"))
           .select("doc_id", *feats, "y").cache())
    try:
        w = logreg_train(fdf, feats, "y", lr=4.0, iters=30)
        out = logreg_predict(fdf, feats, w)
        return out.select(
            "doc_id", F.round("prob", 4).alias("prob_r"),
            F.col("pred").cast("int").alias("pred"),
            (F.col("pred") == F.col("y")).cast("int").alias("correct"))
    finally:
        fdf.unpersist()


def _logreg_oracle(lr: float = 4.0, iters: int = 30,
                   grad_decimals: int = 6) -> str:
    """Unroll the full GD trajectory as DuckDB CTEs: w0 = zeros;
    g_i aggregates the rounded mean gradient under w_i over the
    feature frame; w_{i+1} updates. The final CTE scores every doc."""
    feats = ["f_words", "f_lines", "f_chars", "f_vocab"]
    fexpr = {
        "f_words": ("len(list_filter(regexp_split_to_array(trim(text),"
                    " '\\s+'), x -> x <> '')) / 100.0"),
        "f_lines": "len(string_split(text, chr(10))) / 10.0",
        "f_chars": "LENGTH(text) / 1000.0",
        "f_vocab": ("len(list_distinct(list_filter("
                    "regexp_split_to_array(trim(text), '\\s+'),"
                    " x -> x <> ''))) / 100.0"),
    }
    f_cols = ",\n                   ".join(
        f"{e} AS {k}" for k, e in fexpr.items())
    ctes = [f"""f AS MATERIALIZED (
                SELECT doc_id,
                   {f_cols},
                   CAST(n_chars > 250 AS INT) AS y
                FROM documents
            ),
            c AS MATERIALIZED (SELECT COUNT(*) AS n FROM f),
            w0 AS MATERIALIZED (SELECT 0.0 AS w0, 0.0 AS w1,
                          0.0 AS w2, 0.0 AS w3, 0.0 AS b)"""]
    z = ("(b + w0*f_words + w1*f_lines + w2*f_chars"
         " + w3*f_vocab)")
    sig = f"(1.0 / (1.0 + EXP(-{z})))"
    for i in range(iters):
        gs = ", ".join(
            f"ROUND(SUM(({sig} - y) * {c}) / MAX(n), {grad_decimals})"
            f" AS g{j}" for j, c in enumerate(feats))
        ctes.append(
            f"g{i} AS MATERIALIZED (SELECT {gs}, "
            f"ROUND(SUM({sig} - y) / MAX(n), {grad_decimals}) AS gb "
            f"FROM f, w{i}, c)")
        ws = ", ".join(f"w{j} - {lr}*g{j} AS w{j}" for j in range(4))
        ctes.append(f"w{i + 1} AS MATERIALIZED (SELECT {ws}, b - {lr}*gb AS b "
                    f"FROM w{i}, g{i})")
    return f"""
            WITH {','.join(ctes)}
            SELECT doc_id, ROUND({sig}, 4) AS prob_r,
                   CAST({sig} >= 0.5 AS INT) AS pred,
                   CAST((CAST({sig} >= 0.5 AS INT) = y) AS INT)
                       AS correct
            FROM f, w{iters}
        """


def pretrain_e2e_docs(spark: SparkSession, sf: str) -> DataFrame:
    """END-TO-END pretraining pipeline as ONE declarative plan
    (round 6 flagship composition): fixture corpus with planted
    quality failures (doc_id%5==0 keeps the raw text, which fails
    the Gopher function-words rule) and planted exact duplicates
    (doc_id%7==3 copies its predecessor's text) → Gopher quality
    gate (min_words=10) → exact-hash dedup (first doc per md5 text
    wins) → arithmetic tokenization → concat-and-chunk packing into
    64-token training windows. Every stage is individually oracled
    elsewhere; THIS oracle replays the whole composition in DuckDB
    and must reproduce every token of every window (per-window md5)
    plus the boundary-crossing n_docs — proving the stages compose
    without order/boundary bugs."""
    from tablite_spark.pipeline.text import (
        _gopher_columns, pack_sequences,
    )
    d = _t(spark, sf, "documents").select("doc_id", "text")
    boost = F.concat(F.col("text"),
                     F.lit(" of the and that have with"))
    c0 = d.select("doc_id",
                  F.when(F.col("doc_id") % 5 == 0, F.col("text"))
                  .otherwise(boost).alias("text"))
    prev = c0.select((F.col("doc_id") + 1).alias("doc_id"),
                     F.col("text").alias("prev_text"))
    c1 = (c0.join(prev.hint("merge"), "doc_id", "left")
          .select("doc_id",
                  F.when((F.col("doc_id") % 7 == 3)
                         & F.col("prev_text").isNotNull(),
                         F.col("prev_text"))
                  .otherwise(F.col("text")).alias("text")))
    # the gopher gate is a NARROW predicate — filter in place, no
    # id-keyed semi-join (one less SMJ sort+exchange pair)
    kept = c1.filter(_gopher_columns("text", 10, 100_000)["passes"])
    firsts = (kept.groupBy(F.md5("text").alias("__h__"))
              .agg(F.min("doc_id").alias("doc_id")))
    corpus = kept.join(firsts.select("doc_id").hint("merge"),
                       "doc_id", "left_semi")
    toks = F.filter(F.split(F.trim(F.col("text")), r"\s+"),
                    lambda t: t != "")
    ids = F.transform(
        toks, lambda t, i: (F.length(t) * 131 + (i + 1) % 127)
        .cast("int"))
    out = pack_sequences(corpus.select("doc_id", ids.alias("ids")),
                         "ids", "doc_id", seq_len=64, eos_id=0)
    return out.select(
        "seq_id",
        F.md5(F.concat_ws(",", F.transform(
            "input_ids", lambda x: x.cast("string")))).alias("ids_md5"),
        "n_docs")


def zorder_events(spark: SparkSession, sf: str) -> DataFrame:
    """Z-order (Morton) clustering key (operators/layout.py, round
    6): the 16-bit interleave of (user_id, event-time) over events,
    normalized by the module's pure bit-shift arithmetic — no float
    division anywhere, so DuckDB replays the identical key
    bit-for-bit from the same parquet (min/max + shift widths
    computed in SQL). Row-level hash match pins every interleaved
    bit of every row."""
    from tablite_spark.operators.layout import zorder_key
    e = _t(spark, sf, "events")
    return (zorder_key(e, ["user_id", "ts"], bits=8, out_col="z")
            .select("event_id", F.col("z").cast("long").alias("z")))


def hdf5_vlen_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """Variable-length-string HDF5 roundtrip (round 6): nation's
    string columns written VLEN (datatype class 9 via GCOL
    global-heap collections — h5py's default layout for str data,
    sources/hdf5lite.py) through to_hdf5(vlen_strings=True), read
    back, aggregated — including a name-length sum so the vlen
    payload bytes themselves are verified, not just the row count."""
    import tempfile

    from tablite_spark.sources.io import read_hdf5, to_hdf5
    n = _t(spark, sf, "nation")
    tmp = tempfile.mkdtemp(prefix="hdf5_vlen_")
    path = f"{tmp}/nation.h5"
    to_hdf5(n, path, vlen_strings=True)
    back = read_hdf5(spark, path)
    return (back.groupBy("n_regionkey")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("n_nationkey").cast("long").alias("key_sum"),
                 F.min("n_name").alias("first_name"),
                 F.sum(F.length("n_name")).cast("long")
                  .alias("name_chars")))


def salted_join_equivalence(spark: SparkSession, sf: str) -> DataFrame:
    """operators.skew.salted_join result-equivalence oracle (VERDICT
    r5 item 4): a power-law fact (90% of lineitem rows share fk=1,
    some fk NULL) left-joined to a dim with DUPLICATE keys — the
    salted rewrite must reproduce DuckDB's plain left join row for
    row, pinning exactly the subtle-rewrite hazards (null keys under
    how='left', duplicate matches, hot-key fan-out/merge)."""
    from tablite_spark.operators.skew import salted_join
    li = _t(spark, sf, "lineitem")
    fact = li.select(
        "l_orderkey", "l_linenumber",
        F.when(F.col("l_orderkey") % 97 == 0,
               F.lit(None).cast("long"))
         .when(F.col("l_orderkey") % 10 < 9, F.lit(1).cast("long"))
         .otherwise(F.col("l_suppkey").cast("long")).alias("fk"))
    sup = _t(spark, sf, "supplier")
    dim = (sup.filter(F.col("s_suppkey") < 100)
           .unionAll(sup.filter(F.col("s_suppkey") < 5))
           .select(F.col("s_suppkey").cast("long").alias("s_suppkey"),
                   "s_name"))
    out = salted_join(fact, dim, "fk", "s_suppkey", n_salts=8,
                      how="left")
    return out.select("l_orderkey", "l_linenumber", "fk", "s_name")


# --------------------------------------------------------------------
# round-8 additions: time-series bars, funnels, phrase search,
# Bloom-prefiltered decontamination
# --------------------------------------------------------------------

def ohlc_resample_events(spark: SparkSession, sf: str) -> DataFrame:
    """Hourly OHLC bars per event_type — ONE combinable groupBy
    (min_by/max_by carry one pair per partial state; no windows, no
    self-joins). Values go through exact integer cents so open/high/
    low/close/sum are order-proof; open/close ties are broken by a
    lexicographic (ts, event_id) key identical in both engines."""
    from tablite_spark.operators.timeseries import ohlc_resample
    e = (_t(spark, sf, "events")
         .withColumn("cents", F.round(F.col("value") * 100, 0)
                     .cast("long")))
    out = ohlc_resample(e, "ts", "cents", every="1 hour",
                        by=["event_type"], tiebreak="event_id")
    return out.select(
        "event_type", "bucket_start",
        (F.col("open") / 100).alias("open"),
        (F.col("high") / 100).alias("high"),
        (F.col("low") / 100).alias("low"),
        (F.col("close") / 100).alias("close"),
        "n_events",
        (F.col("sum_value") / 100).alias("sum_value"))


def funnel_events(spark: SparkSession, sf: str) -> DataFrame:
    """Ordered view→click→purchase funnel: per user the earliest
    completion of each step STRICTLY after the previous step's time.
    Per step: selective filter + combinable conditional-min groupBy +
    user-keyed join — never a window over the event stream."""
    from tablite_spark.operators.timeseries import funnel
    return funnel(_t(spark, sf, "events"),
                  ["view", "click", "purchase"])


def phrase_search_docs(spark: SparkSession, sf: str) -> DataFrame:
    """Exact phrase search ("table table" — the duplicate-word case:
    one posting votes for BOTH phrase indexes, and overlapping
    occurrences each count) via positional-postings anchor voting:
    posexplode cut to the phrase's tokens, then two combinable
    groupBys — no positional join chain, no windows."""
    from tablite_spark.pipeline.retrieval import phrase_search
    out = phrase_search(_t(spark, sf, "documents"), "text", "doc_id",
                        "table table")
    return out.select("doc_id", "n_matches",
                      F.col("first_pos").cast("long").alias("first_pos"))


def bloom_contamination_docs(spark: SparkSession, sf: str) -> DataFrame:
    """Benchmark decontamination with a broadcast Bloom prefilter —
    byte-identical output to the exact gram join (the filter only
    prunes the explode; FPs die in the confirm join), but corpus
    grams are filtered map-side in one Arrow pass BEFORE exploding,
    so the join input is the rare-hit sliver, not the token stream.
    Probes here: docs 5..14 (disjoint from contamination_docs')."""
    from tablite_spark.pipeline.text import bloom_decontaminate
    d = _t(spark, sf, "documents")
    probes = (d.filter((F.col("doc_id") >= 5) & (F.col("doc_id") < 15))
              .select(F.col("doc_id").alias("probe_id"),
                      F.col("text").alias("probe_text")))
    out = bloom_decontaminate(d, probes, "text", "doc_id",
                              "probe_text", "probe_id", n=8)
    return out.select("doc_id", "probe_id", "shared_grams",
                      F.round(F.col("overlap"), 4).alias("overlap"))


# --------------------------------------------------------------------
# driver contract
# --------------------------------------------------------------------

# Round-12 verification window: the driver checks the FIRST 50
# entries of queries(). Registry state at r12 open (CORRECTNESS_r01
# ..r11 merged): 260/260 green at latest check, staleness 50@r11 /
# 50@r10 / 48@r9 / 50@r8 / 9@r7, plus FIFTY-THREE r11-late entries
# never driver-verified (all 53 strict-green in the committed
# SWEEP_r11 at sf0.01 and in the judge's independent r11 re-run).
# The window takes the 50 oldest-registered of those 53 — the
# second wave (outliers_mad .. gini) through the sixth wave
# (.. bootstrap_ci) — in registry order. The three SEVENTH-WAVE
# overflow entries (active_users_events, category_index_orders,
# quantile_discretize_lineitem) plus the nine r7-stale rows
# (pivot_long, preference_pairs_docs, q14_promo_revenue,
# rename_reorder_project, resample_audio_meta, resize_images_agg,
# snapshot_diff_docs, stack_tables, tpz_roundtrip_agg) head the
# r13 window; the oldest r8 rows fill the rest. ALL out-of-window
# entries stay locally oracle-swept green in STRICT hash mode —
# committed as SWEEP_r11.json (sf0.01) and SWEEP_r12_sf01.json
# (sf0.1, the 53 r11-late entries).
_R12_WINDOW = [
    "outliers_mad_events",
    "benford_orders",
    "acf_events",
    "attribution_events",
    "stream_attribution_events",
    "auc_events",
    "calibration_events",
    "confusion_events",
    "ols_lineitem",
    "km_survival_events",
    "q7_volume_shipping",
    "q8_market_share",
    "q10_returned_items",
    "q13_customer_distribution",
    "q15_top_supplier",
    "gini_orders",
    "q2_min_cost_supplier",
    "q9_product_profit",
    "q11_important_parts",
    "q12_late_shipments",
    "q16_supplier_part_counts",
    "q17_small_qty_revenue",
    "q20_promo_suppliers",
    "q21_waiting_suppliers",
    "q22_dormant_customers",
    "cusum_events",
    "expectations_orders",
    "feature_scale_lineitem",
    "weighted_quantiles_lineitem",
    "seasonal_anomalies_events",
    "winsorize_lineitem",
    "zipf_alpha_docs",
    "bigram_lm_docs",
    "stream_zscore_events",
    "isotonic_calibration_events",
    "referential_audit_orders",
    "json_props_events",
    "ranking_metrics_docs",
    "logrank_events",
    "psi_orders_drift",
    "gains_table_events",
    "group_cusum_events",
    "column_entropy_docs",
    "pmi_collocations_docs",
    "session_summary_events",
    "association_rules_lineitem",
    "funnel_window_events",
    "additive_seasonal_events",
    "interarrival_events",
    "bootstrap_ci_orders",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Dict order matters: the driver verifies entries in order with a
    bounded per-round window (50/round). ``_R12_WINDOW`` puts the
    stalest-green queries first; everything else keeps its
    registration order behind them."""
    d = _all_queries()
    ordered = {k: d[k] for k in _R12_WINDOW if k in d}
    ordered.update((k, v) for k, v in d.items() if k not in ordered)
    return ordered


def _all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # --- round-2 additions, never inside the check window yet —
        #     they MUST occupy the first slots this round
        "asof_join_events": asof_join_events,
        "range_join_prices": range_join_prices,
        "redact_pii_docs": redact_pii_docs,
        "weighted_sample_docs": weighted_sample_docs,
        "chunk_docs": chunk_docs,
        "contamination_docs": contamination_docs,
        "pack_chunks_docs": pack_chunks_docs,
        "corpus_manifest": corpus_manifest,
        "repetition_docs": repetition_docs,
        "vocab_top_ngrams": vocab_top_ngrams,
        "dedup_clusters": dedup_clusters,
        # --- red in round 2 (HUGEINT oracle casts fixed this round)
        "sessionize_events": sessionize_events,
        "deterministic_sample_orders": deterministic_sample_orders,
        "stratified_sample_docs": stratified_sample_docs,
        # --- ex-no_oracle rows, re-expressed with exact oracles
        #     (dup-fixture invariants / deterministic recall floors)
        "minhash_dedup_docs": minhash_dedup_docs,
        "semantic_dedup_embeddings": semantic_dedup_embeddings,
        "perplexity_docs": perplexity_docs,
        "line_dedup_docs": line_dedup_docs,
        "substring_dedup_docs": substring_dedup_docs,
        "gopher_quality_docs": gopher_quality_docs,
        "gopher_dup_ngrams_docs": gopher_dup_ngrams_docs,
        "pretrain_filter_docs": pretrain_filter_docs,
        "c4_clean_docs": c4_clean_docs,
        "gopher_repetition_docs": gopher_repetition_docs,
        "vocab_shift_docs": vocab_shift_docs,
        "simhash_docs": simhash_docs,
        "simhash_near_dup_docs": simhash_near_dup_docs,
        "lsh_topk_embeddings": lsh_topk_embeddings,
        "ivf_topk_embeddings": ivf_topk_embeddings,
        "pq_topk_embeddings": pq_topk_embeddings,
        "ivfpq_topk_embeddings": ivfpq_topk_embeddings,
        # --- new in round 3
        "quota_cap_docs": quota_cap_docs,
        "holdout_split_orders": holdout_split_orders,
        "shuffle_order_docs": shuffle_order_docs,
        "mixture_sample_docs": mixture_sample_docs,
        "token_budget_docs": token_budget_docs,
        "incremental_dedup_docs": incremental_dedup_docs,
        "unicode_sort_rank": unicode_sort_rank,
        "normalize_docs": normalize_docs,
        "interval_join_events": interval_join_events,
        "canonical_urls_docs": canonical_urls_docs,
        "png_decode_dims": png_decode_dims,
        "jpeg_decode_dims": jpeg_decode_dims,
        "video_frames_meta": video_frames_meta,
        "audio_features_meta": audio_features_meta,
        "gif_decode_dims": gif_decode_dims,
        "wav_decode_meta": wav_decode_meta,
        "ods_roundtrip_agg": ods_roundtrip_agg,
        "hdf5_roundtrip_agg": hdf5_roundtrip_agg,
        "xls_roundtrip_agg": xls_roundtrip_agg,
        "hdf5_chunked_roundtrip_agg": hdf5_chunked_roundtrip_agg,
        # --- new in round 6
        "hdf5_vlen_roundtrip": hdf5_vlen_roundtrip,
        "salted_join_equivalence": salted_join_equivalence,
        "zorder_events": zorder_events,
        "bucketed_join_revenue": bucketed_join_revenue,
        "bm25_search_docs": bm25_search_docs,
        "column_profile": column_profile,
        "quality_classifier_docs": quality_classifier_docs,
        "pack_sequences_docs": pack_sequences_docs,
        "pretrain_e2e_docs": pretrain_e2e_docs,
        "xls_dates_roundtrip": xls_dates_roundtrip,
        # --- new in round 7
        "tpz_roundtrip_agg": tpz_roundtrip_agg,
        # --- new in round 8
        "tpz_reference_read": tpz_reference_read,
        "stream_incremental_dedup_docs": stream_incremental_dedup_docs,
        "hdf5_foreign_read": hdf5_foreign_read,
        "ohlc_resample_events": ohlc_resample_events,
        "funnel_events": funnel_events,
        "phrase_search_docs": phrase_search_docs,
        "bloom_contamination_docs": bloom_contamination_docs,
        "batched_topk_embeddings": batched_topk_embeddings,
        "retention_cohorts_events": retention_cohorts_events,
        "bpe_train_docs": bpe_train_docs,
        "fuzzy_join_customers": fuzzy_join_customers,
        "interpolate_events": interpolate_events,
        "trigram_substring_docs": trigram_substring_docs,
        # --- round-9 additions
        "winnow_fps_docs": winnow_fps_docs,
        "winnow_matches_docs": winnow_matches_docs,
        "tfidf_keywords_docs": tfidf_keywords_docs,
        "ab_welch_events": ab_welch_events,
        "ema_events": ema_events,
        "dsir_weights_docs": dsir_weights_docs,
        "dsir_select_docs": dsir_select_docs,
        "pca_covariance_embeddings": pca_covariance_embeddings,
        "pca_project_embeddings": pca_project_embeddings,
        # --- round-10 additions
        "corr_matrix_lineitem": corr_matrix_lineitem,
        "group_quantiles_events": group_quantiles_events,
        "mutual_info_docs": mutual_info_docs,
        "rolling_avg_events": rolling_avg_events,
        "state_intervals_events": state_intervals_events,
        "outliers_events": outliers_events,
        "jaccard_join_docs": jaccard_join_docs,
        "path_ngrams_events": path_ngrams_events,
        "spearman_corr_lineitem": spearman_corr_lineitem,
        # --- round-11 additions
        "ks_test_events": ks_test_events,
        "chi2_docs": chi2_docs,
        "equidepth_hist_events": equidepth_hist_events,
        "heavy_hitters_docs": heavy_hitters_docs,
        "markov_events": markov_events,
        "target_encode_orders": target_encode_orders,
        "outliers_mad_events": outliers_mad_events,
        "benford_orders": benford_orders,
        "acf_events": acf_events,
        "attribution_events": attribution_events,
        "stream_attribution_events": stream_attribution_events,
        "auc_events": auc_events,
        "calibration_events": calibration_events,
        "confusion_events": confusion_events,
        "ols_lineitem": ols_lineitem,
        "km_survival_events": km_survival_events,
        "q7_volume_shipping": q7_volume_shipping,
        "q8_market_share": q8_market_share,
        "q10_returned_items": q10_returned_items,
        "q13_customer_distribution": q13_customer_distribution,
        "q15_top_supplier": q15_top_supplier,
        "gini_orders": gini_orders,
        "q2_min_cost_supplier": q2_min_cost_supplier,
        "q9_product_profit": q9_product_profit,
        "q11_important_parts": q11_important_parts,
        "q12_late_shipments": q12_late_shipments,
        "q16_supplier_part_counts": q16_supplier_part_counts,
        "q17_small_qty_revenue": q17_small_qty_revenue,
        "q20_promo_suppliers": q20_promo_suppliers,
        "q21_waiting_suppliers": q21_waiting_suppliers,
        "q22_dormant_customers": q22_dormant_customers,
        "cusum_events": cusum_events,
        "expectations_orders": expectations_orders,
        "feature_scale_lineitem": feature_scale_lineitem,
        "weighted_quantiles_lineitem": weighted_quantiles_lineitem,
        "seasonal_anomalies_events": seasonal_anomalies_events,
        "winsorize_lineitem": winsorize_lineitem,
        "zipf_alpha_docs": zipf_alpha_docs,
        "bigram_lm_docs": bigram_lm_docs,
        "stream_zscore_events": stream_zscore_events,
        "isotonic_calibration_events": isotonic_calibration_events,
        "referential_audit_orders": referential_audit_orders,
        "json_props_events": json_props_events,
        "ranking_metrics_docs": ranking_metrics_docs,
        "logrank_events": logrank_events,
        "psi_orders_drift": psi_orders_drift,
        "gains_table_events": gains_table_events,
        "group_cusum_events": group_cusum_events,
        "column_entropy_docs": column_entropy_docs,
        "pmi_collocations_docs": pmi_collocations_docs,
        "session_summary_events": session_summary_events,
        "association_rules_lineitem": association_rules_lineitem,
        "funnel_window_events": funnel_window_events,
        "additive_seasonal_events": additive_seasonal_events,
        "interarrival_events": interarrival_events,
        "bootstrap_ci_orders": bootstrap_ci_orders,
        "active_users_events": active_users_events,
        "category_index_orders": category_index_orders,
        "quantile_discretize_lineitem": quantile_discretize_lineitem,
        "resize_images_agg": resize_images_agg,
        "incremental_minhash_dedup_docs": incremental_minhash_dedup_docs,
        "kmeans_embeddings": kmeans_embeddings,
        "preference_pairs_docs": preference_pairs_docs,
        "hybrid_search_docs": hybrid_search_docs,
        "hard_negatives_embeddings": hard_negatives_embeddings,
        "pagerank_lineitem": pagerank_lineitem,
        "snapshot_diff_docs": snapshot_diff_docs,
        "cluster_dedup_keep_best_docs": cluster_dedup_keep_best_docs,
        "pack_sequences_sft_docs": pack_sequences_sft_docs,
        "resample_audio_meta": resample_audio_meta,
        "cluster_holdout_docs": cluster_holdout_docs,
        "html_roundtrip_agg": html_roundtrip_agg,
        "table_equality_check": table_equality_check,
        "rename_reorder_project": rename_reorder_project,
        "sql_script_md5": sql_script_md5,
        "get_headers_nation": get_headers_nation,
        "row_iteration_checksum": row_iteration_checksum,
        "construction_api_agg": construction_api_agg,
        # --- green in round 2 (rotate forward of round-1 greens so the
        #     50-window still re-exercises the most recent operators)
        "join_inner": join_inner,
        "join_left": join_left,
        "join_outer_merge_keys": join_outer_merge_keys,
        "join_cross": join_cross,
        "join_semi": join_semi,
        "join_anti": join_anti,
        "join_nullsafe": join_nullsafe,
        "lookup_first_match": lookup_first_match,
        "column_select_pass": column_select_pass,
        "column_select_fail": column_select_fail,
        "concat_tables": concat_tables,
        "stack_tables": stack_tables,
        "repeat_table": repeat_table,
        "diff_tables": diff_tables,
        "slice_step": slice_step,
        "replace_values": replace_values_q,
        "drop_rows": drop_rows_q,
        "pivot_wide": pivot_wide,
        "melt_long": melt_long,
        "window_topn": window_topn,
        "window_running_sum": window_running_sum,
        "window_lag": window_lag,
        "groupby_accumulators": groupby_accumulators,
        "distinct_keys": distinct_keys,
        "unique_first": unique_first,
        "imputation_ffill": imputation_ffill,
        "imputation_mean": imputation_mean,
        "statistics_summary": statistics_summary,
        "histogram": histogram_q,
        "xround_buckets": xround_buckets,
        "tumbling_window": tumbling_window,
        "hopping_window": hopping_window,
        "dedup_exact": dedup_exact,
        "text_stats": text_stats,
        "doc_fingerprint": doc_fingerprint,
        "quality_score": quality_score,
        "embedding_topk": embedding_topk,
        "multimodal_decode": multimodal_decode,
        "media_features": media_features,
        "csv_roundtrip_agg": csv_roundtrip_agg,
        "pandas_roundtrip_agg": pandas_roundtrip_agg,
        "imputation_nn_lsh": imputation_nn_lsh,
        # --- green in round 1 (rotated to the back)
        "q1_pricing_summary": q1_pricing_summary,
        "q3_shipping_revenue": q3_shipping_revenue,
        "q5_nation_revenue": q5_nation_revenue,
        "filter_pass": filter_pass,
        "filter_fail": filter_fail,
        "filter_any": filter_any,
        "filter_expression": filter_expression,
        "filter_substring_in": filter_substring_in,
        "filter_callable": filter_callable,
        "merge_where_case": merge_where_case,
        "groupby_mode": groupby_mode,
        "groupby_product": groupby_product,
        "sort_mixed_excel": sort_mixed_excel,
        "transpose_region": transpose_region,
        "reindex_rows": reindex_rows,
        "imputation_mode": imputation_mode,
        "imputation_nn": imputation_nn,
        "pivot_long": pivot_long,
        "sort_alphanumeric": sort_alphanumeric,
        "drop_duplicates": drop_duplicates_q,
        "groupby_first_last": groupby_first_last,
        "date_range_expand": date_range_expand,
        "statistics_text": statistics_text,
        "statistics_dates": statistics_dates,
        "index_rowids": index_rowids,
        "sort_unix_mixed": sort_unix_mixed,
        "xround_time_buckets": xround_time_buckets,
        "json_roundtrip_agg": json_roundtrip_agg,
        "parquet_roundtrip_agg": parquet_roundtrip_agg,
        "xlsx_roundtrip_agg": xlsx_roundtrip_agg,
        "q6_forecast_revenue": q6_forecast_revenue,
        "q14_promo_revenue": q14_promo_revenue,
        "q18_large_orders": q18_large_orders,
        "q4_priority_exists": q4_priority_exists,
        "q19_disjunctive_filter": q19_disjunctive_filter,
        "groupby_rollup": groupby_rollup,
        "groupby_cube": groupby_cube,
        "window_ntile": window_ntile,
        "count_value": count_value_q,
        "unique_values": unique_values_q,
        "is_sorted": is_sorted_q,
        "remove_all": remove_all_q,
        "json_columnar_roundtrip": json_columnar_roundtrip,
        "token_count_bpe": token_count_bpe,
        "language_id_docs": language_id_docs,
        "ngram_jaccard_pairs": ngram_jaccard_pairs,
        "near_dup_embeddings": near_dup_embeddings,
    }


def _zorder_oracle(bits: int = 8) -> str:
    """DuckDB twin of operators/layout.zorder_key over events
    (user_id, ts): min/max + shift widths computed in SQL
    (ceil(log2(rng+1)) == bit_length(rng) exactly — log2 of a power
    of two is exact in IEEE double), then the identical shift/mask
    bit interleave, term by term. Everything integer/bitwise, so the
    comparison is bit-exact, not tolerance-based."""
    terms = []
    for b in range(bits):
        terms.append(f"(((nu >> {b}) & 1) << {2 * b})")
        terms.append(f"(((nt >> {b}) & 1) << {2 * b + 1})")
    interleave = " | ".join(terms)
    return f"""
        WITH stats AS (
            SELECT MIN(user_id) AS mnu, MAX(user_id) AS mxu,
                   MIN(epoch_us(ts)) AS mnt, MAX(epoch_us(ts)) AS mxt
            FROM events),
        p AS (
            SELECT mnu, mnt,
                   GREATEST(0, CAST(CEIL(LOG2(GREATEST(mxu - mnu, 0) + 1))
                                    AS INT) - {bits}) AS su,
                   GREATEST(0, CAST(CEIL(LOG2(GREATEST(mxt - mnt, 0) + 1))
                                    AS INT) - {bits}) AS sv
            FROM stats),
        n AS (
            SELECT e.event_id,
                   (COALESCE(e.user_id, p.mnu) - p.mnu) >> p.su AS nu,
                   (COALESCE(epoch_us(e.ts), p.mnt) - p.mnt) >> p.sv AS nt
            FROM events e CROSS JOIN p)
        SELECT event_id, CAST({interleave} AS BIGINT) AS z FROM n
    """


def _ann_overlap_oracle(pairs: str) -> str:
    """Independent oracle for the four approximate-NN queries (round
    6, VERDICT r5 item 2): the engine's approximate neighbor ids are
    a deterministic function of the sf0.01 embeddings table (seeded
    hyperplanes / k-means / PQ codebooks — verified stable across
    partition counts and thread counts), so they are PINNED here as
    literals and DuckDB recomputes the exact cosine top-5 AND the
    overlap count itself. A bug that degraded both the engine's
    brute-force and its recall join identically would previously
    have passed the old ``SELECT TRUE`` form; it now fails because
    the exact side is DuckDB's own. The pinned ids apply at sf0.01,
    the driver's correctness scale."""
    return f"""
        WITH approx(qid, nid) AS (VALUES {pairs}),
             q AS (SELECT vec_id AS qid, embedding AS qv
                   FROM embeddings WHERE vec_id < 3),
             scored AS (
                 SELECT q.qid, e.vec_id AS nid,
                        ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY
                            list_dot_product(q.qv, e.embedding)
                            / (SQRT(list_dot_product(q.qv, q.qv))
                               * SQRT(list_dot_product(e.embedding,
                                                       e.embedding))) DESC,
                            e.vec_id ASC) AS rn
                 FROM q CROSS JOIN embeddings e
                 WHERE e.vec_id <> q.qid),
             exact AS (SELECT qid, nid FROM scored WHERE rn <= 5)
        SELECT q.qid,
               CAST(COUNT(e.nid) AS BIGINT) AS n_overlap,
               COUNT(e.nid) >= 3 AS recall_ok
        FROM q
        LEFT JOIN approx a ON a.qid = q.qid
        LEFT JOIN exact e ON e.qid = a.qid AND e.nid = a.nid
        GROUP BY q.qid
    """


_PCA_COMPS_SF001 = [  # pinned r10: pca_fit(embeddings sf0.01, dim=64, k=4)
    [-0.20963933002020224, -0.12057271532723624, 0.03654785815761247, 0.01181956673367579,
     0.07567008238652231, 0.013214628819759669, 0.09058411852537525, 0.2866187923515347,
     0.049546962198392386, 0.4140565264810953, 0.0653049818235748, 0.18207885387703346,
     0.06513224150018769, -0.03653205474591024, 0.17114897510631677, -0.1853497773155225,
     0.08898987448652929, -0.15702655458925904, -0.030136686337288644, 0.03217896951211652,
     0.061213204086392935, -0.11068832311424773, -0.08347512785867203, -0.05543746864805456,
     0.019550012020347562, 0.19912542853517, -0.03751725245021903, 0.14950769892189036,
     -0.17287963096364775, -0.006123114085459264, -0.05871572670346965, 0.06203771797942751,
     0.29653854353776893, 0.10616457882139858, -0.03204193889380879, 0.10414385148185454,
     0.04453875953671088, 0.061464053093950484, 0.013006698200672715, 0.02177120565591314,
     -0.11667898779822866, 0.005524586419046074, -0.24083692028370768, 0.09570759064866091,
     -0.028307708356163336, -0.22512744473516821, 0.00873183591419624, -0.07903750804624604,
     -0.08368084414987481, -0.1184509115331376, 0.12045949820882271, 0.07248325157918552,
     -0.017186482157175637, 0.08160437407065305, -0.015031355628749375, -0.06676477469561941,
     -0.05565063627860118, -0.05137605781699061, 0.06019601767570881, -0.09113914348048607,
     0.12198699564215869, 0.05064983387891537, -0.21821146492315377, -0.10201388636254458],
    [-0.00383712721159228, -0.05443024576702591, -0.01256793348075937, -0.08813365797648723,
     0.17485769775042748, 0.025214365797045207, 0.07494656338562397, -0.06998070108596313,
     0.07744817020896026, 0.030696056195262264, 0.10575814459049988, -0.017882873012907644,
     0.012975656331249082, 0.13369681742755257, 0.014559198307486308, 0.041391919339340666,
     0.1484110007875088, 0.36030985112615704, -0.05418865141456875, -0.050764775917261515,
     0.03254316973478824, 0.03539112685064482, 0.06533467378092302, -0.30912280550529797,
     -0.25768213825837827, -0.23906586362939547, -0.020637632793312308, -0.00022331337887581803,
     -0.08628570371767244, -0.1745329222714361, -0.024067927226899644, -0.21754493603557237,
     0.029463935144022485, 0.061538678908497395, 0.03375332841845152, 0.07921967482014433,
     0.05946710015971199, 0.03649840257323514, 0.18210698156722926, 0.04667388480869496,
     8.626507701305769e-06, 0.0469867556409584, -0.06276704622858954, -0.1791897959437335,
     0.17268649020937124, -0.1888352229469689, -0.046945871315895456, 0.14577948211480055,
     0.1129239775772588, -0.11328063222737855, -0.1574310435011157, -0.0819750107401838,
     0.012979946743257613, -0.016092353749802404, 0.23803515091895253, 0.023384317388539633,
     -0.30282027552250756, 0.01638284010820714, 0.13543364301205718, -0.1215860661032707,
     -0.08367049603064435, 0.08483882908899529, -0.0004431848647373886, -0.07861586992416268],
    [-0.14804403755600964, -0.08512440644804636, -0.06394747372242182, -0.0004575970141697805,
     -0.2043746650888012, -0.04374173501667095, 0.11775529925597408, -0.2844978534972129,
     0.04440239633087662, 0.023717337995782656, -0.051179527614309016, 0.03570203353525708,
     -0.06017956430904858, -0.03455060720145377, 0.009449519103829324, -0.23454575614197243,
     0.17137352710244083, -0.08492758806239417, 0.11604706769064435, 0.07732840317313291,
     0.013131626731481404, 0.17530755090022143, -0.10064801517013948, 0.05337470423494454,
     0.09255730930450934, 0.10008395002175649, 0.09063736311928071, -0.13414209861498091,
     0.010277697050367136, -0.10540482797763767, -0.1228596684339347, 0.09091210819168671,
     0.048252166284900866, -0.18066130225251564, -0.029769890425384592, -0.1021625821320828,
     0.1390784992424739, -0.21255244175464416, -0.0634565230913135, -0.10392899603893548,
     0.18947963434480752, 0.1901101011119268, -0.12585555807026433, -0.20893277874382618,
     0.16586568222613365, 0.05283627633707155, 0.042797574747649114, 0.018020015397847047,
     -0.06832009323144829, -0.051275512977937386, -0.12949844497534707, -0.10645450056137466,
     0.227800315899422, -0.15329476793534857, -0.1791520941574062, -0.001920015218025161,
     -0.005381095587603319, 0.10972460099815146, 0.1827952415741994, -0.05268508458798251,
     -0.06955779386901564, 0.2884306058238582, -0.09008107781606672, -0.07553050141369802],
    [0.06808659692680286, 0.06269221088043901, 0.008780757117711757, 0.17252698585080956,
     -0.25796105063051866, 0.1071292474758533, -0.02320920976768838, 0.17754309288336775,
     -0.11522019045334257, 0.1362019579866682, 0.007640884150524753, 0.2019504757451038,
     -0.06077544466797391, -0.1402193539405949, -0.09311367890541877, 0.0493080657522085,
     0.09682486295851118, 0.07142426949944458, -0.009319477553329202, -0.20316848780447716,
     -0.2254729514027411, 0.1576589813896344, -0.011856441212723485, 0.07323162375883854,
     0.027470748399646895, -0.11908308267720887, 0.11645429213298883, -0.0038352518581288124,
     0.1289244833558475, -0.1045231273232324, 0.1521165649372714, 0.2005753961876462,
     -0.08141318128028943, -0.017677469085165518, -0.11650295044832898, 0.31619012196984614,
     -0.11671862239947879, -0.148434417287364, -0.010252064348209753, -0.048288865420295896,
     -0.01450753729304257, -0.00017919674515583933, -0.0856532247691801, -0.017434761707989868,
     -0.07573379923511613, -0.04152082543952059, -0.01362043137291509, 0.3694044748348245,
     -0.10851089306172991, -0.15344609942067966, 0.06647233910921316, -0.019778009359074953,
     0.009329623098555829, 0.005401021761514492, -0.02191754053855563, 0.10147291470472775,
     -0.17091025495876377, 0.09292951416465972, -0.17072042743327628, -0.07391767730726548,
     -0.19206043423473793, -0.09621918574006269, -0.08404634246068667, 0.02629688584870927],
]


def _pca_project_oracle() -> str:
    """Independent oracle for pca_project_embeddings (round 10,
    VERDICT r9 item 2 — the registry's last no_oracle row): the
    fitted components are a deterministic function of the sf0.01
    embeddings table (sign-normalized eigh on the exactly-oracled
    covariance; eigenvalue gaps ~3e-4 >> the ~1e-16 run-to-run
    aggregation-order noise, so the eigenvectors are stable to
    ~1e-12), so they are PINNED here as literals — the same
    discipline as the ANN pinned ids — and DuckDB recomputes the
    projection itself as plain SQL dot products. Rounding-boundary
    audit at pin time: min distance of any of the 2000 projected
    cells from a 4-decimal rounding boundary is 1.4e-8, four orders
    above cross-engine float noise. '+ 0' folds IEEE -0.0 as in
    pca_covariance. Pins apply at sf0.01, the driver's correctness
    scale."""
    rows = ", ".join(
        f"({k}, {i}, {w!r})"
        for k, row in enumerate(_PCA_COMPS_SF001)
        for i, w in enumerate(row))
    pcs = ",\n               ".join(
        f"ROUND(max(CASE WHEN k = {k} THEN v END), 4) + 0 AS pc{k}"
        for k in range(len(_PCA_COMPS_SF001)))
    return f"""
        WITH comp(k, i, w) AS (VALUES {rows}),
        p AS (
            SELECT e.vec_id, c.k,
                   sum(c.w * CAST(e.embedding[c.i + 1] AS DOUBLE)) AS v
            FROM embeddings e CROSS JOIN comp c
            WHERE e.embedding IS NOT NULL AND len(e.embedding) = 64
            GROUP BY 1, 2
        )
        SELECT vec_id, {pcs}
        FROM p GROUP BY vec_id
    """



def oracle_sql() -> dict[str, str]:
    d = _oracle_sql_base()
    d["pca_project_embeddings"] = _pca_project_oracle()
    # pretrain_filter is the conjunction of three already-oracled
    # stages: compose their SQL verbatim so the oracle stays a single
    # source of truth per rule family
    d["pretrain_filter_docs"] = f"""
        WITH g AS ({d['gopher_quality_docs']}),
             r AS ({d['gopher_repetition_docs']}),
             dn AS ({d['gopher_dup_ngrams_docs']})
        SELECT g.doc_id,
               (g.passes AND r.passes AND dn.passes) AS keep,
               CASE WHEN NOT g.passes THEN 'gopher'
                    WHEN NOT r.passes THEN 'repetition'
                    WHEN NOT dn.passes THEN 'dup_ngrams'
               END AS reason
        FROM g JOIN r ON g.doc_id = r.doc_id
               JOIN dn ON g.doc_id = dn.doc_id
    """
    # end-to-end pipeline: fixture -> gopher gate -> exact dedup ->
    # tokenize -> pack, replaying pack_sequences_docs' windowing SQL
    # over the composed corpus
    pack_sql = d["pack_sequences_docs"].strip()
    assert pack_sql.startswith("WITH ")
    assert pack_sql.count("FROM documents") == 2
    pack_body = pack_sql[len("WITH "):].replace("FROM documents",
                                                "FROM corpus")
    d["pretrain_e2e_docs"] = f"""
        WITH c0 AS MATERIALIZED (
            SELECT doc_id,
                   CASE WHEN doc_id % 5 = 0 THEN text
                        ELSE text || ' of the and that have with'
                   END AS text
            FROM documents
        ),
        c1 AS MATERIALIZED (
            SELECT a.doc_id,
                   CASE WHEN a.doc_id % 7 = 3 AND b.text IS NOT NULL
                        THEN b.text ELSE a.text END AS text
            FROM c0 a LEFT JOIN c0 b ON b.doc_id = a.doc_id - 1
        ),
        g AS MATERIALIZED (
            SELECT doc_id FROM ({_gopher_sql('c1', 10)}) WHERE passes
        ),
        kept AS MATERIALIZED (
            SELECT c1.* FROM c1 JOIN g USING (doc_id)
        ),
        firsts AS MATERIALIZED (
            SELECT MIN(doc_id) AS doc_id FROM kept GROUP BY md5(text)
        ),
        corpus AS MATERIALIZED (
            SELECT kept.* FROM kept JOIN firsts USING (doc_id)
        ),
        {pack_body}
    """
    return d


def _gopher_sql(source: str = "documents",
                min_words: int = 50) -> str:
    """Gopher-rules oracle SQL, parametrized over the source
    relation and word-count floor — single source of truth for
    gopher_quality_docs, the pretrain_filter composition, and the
    end-to-end pipeline oracle."""
    return """
            WITH d AS (
                SELECT doc_id, text,
                       list_filter(regexp_split_to_array(trim(text),
                                                         '\\s+'),
                                   w -> w <> '') AS words,
                       string_split(text, chr(10)) AS lines
                FROM {source}
            ), m AS (
                SELECT doc_id,
                       CAST(len(words) AS BIGINT) AS n_words,
                       CAST(len(lines) AS BIGINT) AS n_lines,
                       CAST(COALESCE(list_sum(list_transform(
                           words, w -> length(w))), 0) AS BIGINT)
                           AS total_chars,
                       CAST(length(text) -
                            length(replace(text, '#', ''))
                            AS BIGINT) AS n_hash,
                       CAST((length(text) -
                             length(replace(text, '...', ''))) / 3
                            + length(text) -
                              length(replace(text, '…', ''))
                            AS BIGINT) AS n_ell,
                       CAST(len(list_filter(lines,
                           l -> starts_with(ltrim(l), '-')
                             OR starts_with(ltrim(l), '*')
                             OR starts_with(ltrim(l), '•')))
                           AS BIGINT) AS bullet,
                       CAST(len(list_filter(lines,
                           l -> rtrim(l) LIKE '%...'
                             OR rtrim(l) LIKE '%…'))
                           AS BIGINT) AS ell_end,
                       CAST(len(list_filter(words,
                           w -> regexp_matches(w, '[A-Za-z]')))
                           AS BIGINT) AS alpha,
                       CAST(len(list_distinct(list_filter(words,
                           w -> lower(w) IN ('the','be','to','of',
                                             'and','that','have',
                                             'with'))))
                           AS BIGINT) AS n_func
                FROM d
            )
            SELECT doc_id, n_words, n_lines,
                   (n_words >= {min_words} AND n_words <= 100000)
                       AS r_word_count,
                   (3 * n_words <= total_chars
                    AND total_chars <= 10 * n_words)
                       AS r_mean_word_len,
                   (10 * (n_hash + n_ell) <= n_words)
                       AS r_symbol_ratio,
                   (10 * bullet <= 9 * n_lines) AS r_bullet_lines,
                   (10 * ell_end <= 3 * n_lines) AS r_ellipsis_lines,
                   (10 * alpha >= 8 * n_words) AS r_alpha_words,
                   (n_func >= 2) AS r_func_words,
                   ((n_words >= {min_words} AND n_words <= 100000)
                    AND (3 * n_words <= total_chars
                         AND total_chars <= 10 * n_words)
                    AND (10 * (n_hash + n_ell) <= n_words)
                    AND (10 * bullet <= 9 * n_lines)
                    AND (10 * ell_end <= 3 * n_lines)
                    AND (10 * alpha >= 8 * n_words)
                    AND (n_func >= 2)) AS passes
            FROM m
        """.format(source=source, min_words=min_words)


def _oracle_sql_base() -> dict[str, str]:
    return {
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   ROUND(SUM(l_quantity), 2) AS sum_qty,
                   SUM(ROUND(l_extendedprice * 100, 0)) / 100 AS sum_base_price,
                   SUM(ROUND(l_extendedprice * (1 - l_discount) * 100, 0)) / 100 AS sum_disc_price,
                   ROUND(AVG(l_quantity), 4) AS avg_qty,
                   ROUND(AVG(l_discount), 4) AS avg_disc,
                   COUNT(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "q3_shipping_revenue": """
            SELECT o_orderkey,
                   SUM(ROUND(l_extendedprice * (1 - l_discount) * 100, 0)) / 100 AS revenue
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON o_orderkey = l_orderkey
            WHERE c_mktsegment = 'BUILDING'
            GROUP BY o_orderkey
            HAVING SUM(ROUND(l_extendedprice * (1 - l_discount) * 100, 0)) / 100 > 100000
        """,
        "q5_nation_revenue": """
            SELECT n_name,
                   SUM(ROUND(l_extendedprice * (1 - l_discount) * 100, 0)) / 100 AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY n_name
        """,
        "filter_pass": """
            SELECT l_orderkey, l_linenumber, l_quantity, l_discount
            FROM lineitem WHERE l_quantity >= 25.0 AND l_discount <= 0.05
        """,
        "filter_fail": """
            SELECT l_orderkey, l_linenumber, l_quantity, l_discount
            FROM lineitem WHERE NOT (l_quantity >= 25.0 AND l_discount <= 0.05)
        """,
        "filter_any": """
            SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
            FROM lineitem WHERE l_quantity >= 49.0 OR l_returnflag = 'R'
        """,
        "filter_expression": """
            SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
            FROM lineitem WHERE l_quantity >= 30 AND l_returnflag = 'R'
        """,
        "filter_substring_in": """
            SELECT p_partkey, p_name, p_type
            FROM part WHERE p_type LIKE '%ECO%'
        """,
        "filter_callable": """
            SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 3 = 0
        """,
        "merge_where_case": """
            SELECT o_orderkey,
                   CASE WHEN o_totalprice > 200000
                        THEN o_orderpriority ELSE o_orderstatus END AS label
            FROM orders
        """,
        "groupby_mode": """
            SELECT l_returnflag, MODE(l_linenumber) AS mode_ln
            FROM lineitem GROUP BY l_returnflag
        """,
        "groupby_product": """
            SELECT l_orderkey, ROUND(PRODUCT(1 + l_discount), 4) AS prod_disc
            FROM lineitem WHERE l_orderkey < 1000 GROUP BY l_orderkey
        """,
        "sort_mixed_excel": """
            WITH m AS (
                SELECT o_orderkey,
                       CASE WHEN o_orderkey % 4 = 0 THEN CAST(o_totalprice AS VARCHAR)
                            WHEN o_orderkey % 4 = 1 THEN o_orderpriority
                            WHEN o_orderkey % 4 = 2 THEN
                                CASE WHEN o_orderkey % 8 = 2 THEN 'true' ELSE 'false' END
                       END AS v
                FROM orders WHERE o_orderkey < 2000
            ), k AS (
                SELECT o_orderkey, v,
                       LOWER(v) IN ('true','false') AS is_bool,
                       TRY_CAST(v AS DOUBLE) AS num
                FROM m
            )
            SELECT ROW_NUMBER() OVER (ORDER BY
                       CASE WHEN v IS NULL THEN 3
                            WHEN is_bool THEN 2
                            WHEN num IS NOT NULL THEN 0
                            ELSE 1 END ASC,
                       CASE WHEN num IS NOT NULL AND NOT is_bool THEN num END ASC NULLS LAST,
                       CASE WHEN is_bool THEN CAST(LOWER(v) = 'true' AS INT) END ASC NULLS LAST,
                       CASE WHEN num IS NULL AND NOT is_bool THEN v END ASC NULLS LAST,
                       o_orderkey ASC) - 1 AS pos,
                   o_orderkey, v
            FROM k
        """,
        "transpose_region": """
            SELECT 'r_name' AS r_regionkey,
                   MAX(CASE WHEN r_regionkey = 0 THEN r_name END) AS "0",
                   MAX(CASE WHEN r_regionkey = 1 THEN r_name END) AS "1",
                   MAX(CASE WHEN r_regionkey = 2 THEN r_name END) AS "2",
                   MAX(CASE WHEN r_regionkey = 3 THEN r_name END) AS "3",
                   MAX(CASE WHEN r_regionkey = 4 THEN r_name END) AS "4"
            FROM region
        """,
        "reindex_rows": """
            SELECT n_nationkey, n_name FROM nation WHERE n_nationkey IN (5, 3, 7, 20)
            UNION ALL
            SELECT NULL, NULL
        """,
        "imputation_mode": """
            SELECT event_id,
                   COALESCE(etype, (SELECT MODE(etype) FROM
                       (SELECT CASE WHEN event_id % 7 = 0 THEN NULL
                                    ELSE event_type END AS etype FROM events))) AS etype
            FROM (SELECT event_id,
                         CASE WHEN event_id % 7 = 0 THEN NULL
                              ELSE event_type END AS etype FROM events)
        """,
        "imputation_nn": """
            WITH c AS (
                SELECT c_custkey, c_nationkey,
                       CASE WHEN c_custkey % 10 = 0 THEN NULL
                            ELSE ROUND(c_acctbal, 2) END AS bal
                FROM customer WHERE c_custkey < 300
            ), rng AS (
                SELECT CAST(MAX(c_custkey) - MIN(c_custkey) AS DOUBLE) AS r_ck,
                       CAST(MAX(c_nationkey) - MIN(c_nationkey) AS DOUBLE) AS r_nk
                FROM c
            ), best AS (
                SELECT n.c_custkey, d.bal AS fill_bal,
                       ROW_NUMBER() OVER (PARTITION BY n.c_custkey ORDER BY
                           ABS(n.c_custkey - d.c_custkey) / rng.r_ck
                           + ABS(n.c_nationkey - d.c_nationkey) / rng.r_nk ASC,
                           d.c_custkey ASC) AS rn
                FROM c n CROSS JOIN rng JOIN c d ON d.bal IS NOT NULL
                WHERE n.bal IS NULL
            )
            SELECT c.c_custkey, ROUND(COALESCE(c.bal, b.fill_bal), 2) AS bal
            FROM c LEFT JOIN (SELECT c_custkey, fill_bal FROM best WHERE rn = 1) b
            ON c.c_custkey = b.c_custkey
        """,
        "asof_join_events": """
            SELECT l.event_id, r.event_id AS click_id,
                   ROUND(r.value, 2) AS click_value
            FROM (SELECT * FROM events WHERE event_type = 'error') l
            ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') r
            ON l.user_id = r.user_id AND r.ts <= l.ts
        """,
        "chunk_docs": """
            WITH t AS (
                SELECT doc_id, string_split_regex(TRIM(text), '\\s+') AS l
                FROM documents WHERE LENGTH(TRIM(text)) > 0
            ), c AS (
                SELECT doc_id, l,
                       GREATEST(CAST(CEIL((len(l) - 8) / 32.0) AS INT), 1) AS nc
                FROM t
            ), e AS (
                SELECT doc_id, l, UNNEST(range(0, nc)) AS cid FROM c
            )
            SELECT doc_id, CAST(cid AS INT) AS chunk_id,
                   MD5(array_to_string(l[CAST(cid*32+1 AS INT) : CAST(cid*32+40 AS INT)], ' '))
                       AS chunk_md5,
                   CAST(len(l[CAST(cid*32+1 AS INT) : CAST(cid*32+40 AS INT)]) AS INT)
                       AS chunk_tokens
            FROM e
        """,
        "contamination_docs": """
            WITH docs AS (
                SELECT doc_id,
                       string_split_regex(LOWER(TRIM(text)), '\\s+') AS l
                FROM documents
            ), gr AS (
                SELECT doc_id,
                       list_distinct(list_transform(
                           range(1, GREATEST(len(l) - 7, 1) + 1),
                           i -> array_to_string(l[CAST(i AS INT) : CAST(i+7 AS INT)], ' ')))
                       AS gs
                FROM docs
            ), dg AS (SELECT doc_id, UNNEST(gs) AS g FROM gr),
            pg AS (SELECT doc_id AS probe_id, UNNEST(gs) AS g
                   FROM gr WHERE doc_id < 5),
            ps AS (SELECT doc_id AS probe_id, len(gs) AS n_probe
                   FROM gr WHERE doc_id < 5)
            SELECT dg.doc_id, pg.probe_id,
                   COUNT(*) AS shared_grams,
                   ROUND(COUNT(*) / CAST(ANY_VALUE(ps.n_probe) AS DOUBLE), 4)
                       AS overlap
            FROM dg JOIN pg USING (g) JOIN ps ON ps.probe_id = pg.probe_id
            GROUP BY dg.doc_id, pg.probe_id
        """,
        "pack_chunks_docs": """
            WITH t AS (
                SELECT doc_id, string_split_regex(TRIM(text), '\\s+') AS l
                FROM documents WHERE LENGTH(TRIM(text)) > 0
            ), c AS (
                SELECT doc_id, l,
                       GREATEST(CAST(CEIL(len(l) / 40.0) AS INT), 1) AS nc
                FROM t
            ), e AS (
                SELECT doc_id, l, UNNEST(range(0, nc)) AS cid FROM c
            ), ch AS (
                SELECT e.doc_id, CAST(cid AS INT) AS chunk_id,
                       CAST(len(l[CAST(cid*40+1 AS INT) : CAST(cid*40+40 AS INT)]) AS INT)
                           AS chunk_tokens,
                       d.source
                FROM e JOIN documents d ON d.doc_id = e.doc_id
            ), packed AS (
                SELECT source, chunk_tokens,
                       CAST(FLOOR((SUM(chunk_tokens) OVER (
                                PARTITION BY source
                                ORDER BY doc_id, chunk_id
                                ROWS UNBOUNDED PRECEDING) - chunk_tokens)
                            / 256.0) AS BIGINT) AS pack_id
                FROM ch
            )
            SELECT source, pack_id, COUNT(*) AS n_chunks,
                   CAST(SUM(chunk_tokens) AS BIGINT) AS pack_tokens
            FROM packed GROUP BY source, pack_id
        """,
        "corpus_manifest": """
            SELECT source, COUNT(*) AS n_docs,
                   CAST(SUM(LENGTH(text)) AS BIGINT) AS n_chars,
                   CAST(SUM(len(string_split_regex(TRIM(text), '\\s+'))) AS BIGINT)
                       AS n_tokens,
                   COUNT(DISTINCT lang) AS n_langs,
                   MIN(doc_id) AS min_doc_id,
                   MAX(doc_id) AS max_doc_id
            FROM documents GROUP BY source
        """,
        "weighted_sample_docs": """
            WITH d AS (
                SELECT doc_id, CAST(LENGTH(text) AS DOUBLE) AS w
                FROM documents
            ), m AS (SELECT AVG(w) AS mw FROM d)
            SELECT doc_id FROM d, m
            WHERE CAST('0x' || substring(md5('ws' || CAST(doc_id AS VARCHAR)), 1, 15)
                       AS UBIGINT) / 1152921504606846976.0
                  < LEAST(1.0, 0.3 * w / mw)
        """,
        "redact_pii_docs": """
            SELECT doc_id,
                   MD5(regexp_replace(regexp_replace(regexp_replace(
                       text || ' contact user' || CAST(doc_id AS VARCHAR)
                            || '@example.com or https://ex.co/'
                            || CAST(doc_id AS VARCHAR),
                       '[A-Za-z0-9._%+\\-]+@[A-Za-z0-9.\\-]+\\.[A-Za-z]{2,}',
                       '[EMAIL]', 'g'),
                       'https?://[^\\s]+', '[URL]', 'g'),
                       '\\+?\\d[\\d\\-\\s]{7,}\\d', '[PHONE]', 'g')
                   ) AS redacted_md5
            FROM documents
        """,
        "repetition_docs": """
            WITH t AS (
                SELECT doc_id,
                       string_split_regex(LOWER(TRIM(text)), '\\s+') AS l
                FROM documents WHERE LENGTH(TRIM(text)) > 0
            ), g AS (
                SELECT doc_id,
                       CAST(len(l) AS DOUBLE) AS n_tok,
                       CAST(len(list_distinct(l)) AS DOUBLE) AS u_tok,
                       CASE WHEN len(l) >= 2 THEN
                           list_transform(range(1, len(l)),
                                          i -> l[i] || ' ' || l[i + 1])
                       ELSE l END AS grams
                FROM t
            )
            SELECT doc_id,
                   ROUND((n_tok - u_tok) / GREATEST(n_tok, 1.0), 4)
                       AS dup_token_frac,
                   ROUND((CAST(len(grams) AS DOUBLE)
                          - CAST(len(list_distinct(grams)) AS DOUBLE))
                         / GREATEST(CAST(len(grams) AS DOUBLE), 1.0), 4)
                       AS dup_ngram_frac
            FROM g
        """,
        "vocab_top_ngrams": """
            SELECT ngram, COUNT(*) AS cnt
            FROM (SELECT UNNEST(string_split_regex(LOWER(TRIM(text)), '\\s+'))
                      AS ngram FROM documents)
            WHERE ngram <> ''
            GROUP BY ngram
            ORDER BY cnt DESC, ngram ASC
            LIMIT 50
        """,
        "range_join_prices": """
            SELECT b.p_partkey,
                   COUNT(*) AS n_hits,
                   CAST(SUM(l.l_orderkey + l.l_linenumber) AS BIGINT) AS key_sum
            FROM (SELECT l_orderkey, l_linenumber, l_extendedprice
                  FROM lineitem WHERE l_orderkey < 2000) l
            JOIN (SELECT p_partkey,
                         p_retailprice * 10 - 50 AS lo,
                         p_retailprice * 10 + 50 AS hi
                  FROM part WHERE p_partkey <= 200) b
            ON l.l_extendedprice BETWEEN b.lo AND b.hi
            GROUP BY b.p_partkey
        """,
        "imputation_nn_lsh": """
            WITH c AS (
                SELECT c_custkey,
                       CASE WHEN c_custkey % 2 = 1 THEN NULL
                            ELSE ROUND(c_acctbal, 2) END AS bal
                FROM customer WHERE c_custkey >= 2 AND c_custkey < 600
            )
            SELECT n.c_custkey, ROUND(COALESCE(n.bal, d.bal), 2) AS bal
            FROM c n LEFT JOIN c d
            ON d.c_custkey = n.c_custkey - (n.c_custkey % 2) AND d.bal IS NOT NULL
        """,
        "pivot_long": """
            SELECT l_returnflag, 'l_linestatus=F' AS function,
                   ROUND(SUM(l_quantity) FILTER (WHERE l_linestatus = 'F'), 2) AS value
            FROM lineitem GROUP BY l_returnflag
            UNION ALL
            SELECT l_returnflag, 'l_linestatus=O' AS function,
                   ROUND(SUM(l_quantity) FILTER (WHERE l_linestatus = 'O'), 2) AS value
            FROM lineitem GROUP BY l_returnflag
        """,
        "sort_alphanumeric": """
            WITH m AS (
                SELECT o_orderkey,
                       CASE WHEN o_orderkey % 3 = 0 THEN CAST(o_totalprice AS VARCHAR)
                            WHEN o_orderkey % 3 = 1 THEN o_orderpriority
                       END AS v
                FROM orders WHERE o_orderkey < 2000
            )
            SELECT ROW_NUMBER() OVER (ORDER BY v ASC NULLS FIRST, o_orderkey ASC) - 1 AS pos,
                   o_orderkey, v
            FROM m
        """,
        "drop_duplicates": """
            SELECT DISTINCT l_returnflag, l_linestatus, l_linenumber FROM lineitem
        """,
        "groupby_first_last": """
            SELECT o_custkey,
                   ARG_MIN(o_totalprice, o_orderkey) AS first_price,
                   ARG_MAX(o_totalprice, o_orderkey) AS last_price
            FROM orders GROUP BY o_custkey
        """,
        "date_range_expand": """
            SELECT o_orderkey, STRFTIME(CAST(day AS DATE), '%Y-%m-%d') AS day
            FROM (
                SELECT o.o_orderkey,
                       UNNEST(generate_series(
                           LEAST(CAST(o.o_orderdate AS DATE), CAST(s.ship AS DATE)),
                           GREATEST(CAST(o.o_orderdate AS DATE), CAST(s.ship AS DATE)),
                           INTERVAL 1 DAY)) AS day
                FROM orders o
                JOIN (SELECT l_orderkey, MIN(l_shipdate) AS ship
                      FROM lineitem GROUP BY l_orderkey) s
                ON o.o_orderkey = s.l_orderkey
                WHERE o.o_orderkey < 100
            )
        """,
        "statistics_text": """
            SELECT MIN(LENGTH(c_name)) AS min_len,
                   MAX(LENGTH(c_name)) AS max_len,
                   ROUND(AVG(LENGTH(c_name)), 4) AS avg_len,
                   COUNT(DISTINCT c_name) AS distinct
            FROM customer
        """,
        "index_rowids": """
            SELECT o_orderstatus, o_orderpriority,
                   array_to_string(list_sort(list(CAST(o_orderkey AS VARCHAR))), ',') AS row_ids
            FROM orders WHERE o_orderkey < 500
            GROUP BY o_orderstatus, o_orderpriority
        """,
        "sort_unix_mixed": """
            WITH m AS (
                SELECT o_orderkey,
                       CASE WHEN o_orderkey % 4 = 0 THEN CAST(o_totalprice AS VARCHAR)
                            WHEN o_orderkey % 4 = 1 THEN o_orderpriority
                            WHEN o_orderkey % 4 = 2 THEN
                                CASE WHEN o_orderkey % 8 = 2 THEN 'true' ELSE 'false' END
                       END AS v
                FROM orders WHERE o_orderkey < 2000
            ), k AS (
                SELECT o_orderkey, v,
                       LOWER(v) IN ('true','false') AS is_bool,
                       TRY_CAST(v AS DOUBLE) AS num
                FROM m
            )
            SELECT ROW_NUMBER() OVER (ORDER BY
                       CASE WHEN v IS NULL THEN 0
                            WHEN is_bool THEN 1
                            WHEN num IS NOT NULL THEN 2
                            ELSE 3 END ASC,
                       CASE WHEN num IS NOT NULL AND NOT is_bool THEN num END ASC NULLS FIRST,
                       CASE WHEN is_bool THEN CAST(LOWER(v) = 'true' AS INT) END ASC NULLS FIRST,
                       CASE WHEN num IS NULL AND NOT is_bool THEN v END ASC NULLS FIRST,
                       o_orderkey ASC) - 1 AS pos,
                   o_orderkey, v
            FROM k
        """,
        "xround_time_buckets": """
            SELECT STRFTIME(time_bucket(INTERVAL 30 MINUTE, ts), '%Y-%m-%d %H:%M:%S') AS bucket,
                   COUNT(*) AS n
            FROM events GROUP BY 1
        """,
        "csv_roundtrip_agg": """
            SELECT l_returnflag,
                   SUM(ROUND(l_quantity * 100, 0)) / 100 AS sum_qty,
                   COUNT(*) AS n,
                   CAST(SUM(l_orderkey + l_linenumber) AS BIGINT) AS key_sum
            FROM lineitem GROUP BY l_returnflag
        """,
        "json_roundtrip_agg": """
            SELECT CAST(n_regionkey AS BIGINT) AS n_regionkey,
                   COUNT(*) AS n,
                   CAST(SUM(n_nationkey) AS BIGINT) AS key_sum,
                   MIN(n_name) AS first_name
            FROM nation GROUP BY n_regionkey
        """,
        "parquet_roundtrip_agg": """
            SELECT l_returnflag,
                   ROUND(SUM(l_quantity), 2) AS sum_qty,
                   COUNT(*) AS n
            FROM lineitem GROUP BY l_returnflag
        """,
        "xlsx_roundtrip_agg": """
            SELECT n_regionkey, COUNT(*) AS n,
                   CAST(SUM(n_nationkey) AS BIGINT) AS key_sum,
                   MIN(n_name) AS first_name
            FROM nation GROUP BY n_regionkey
        """,
        "sql_script_md5": """
            SELECT md5('CREATE TABLE region_x (r_regionkey INTEGER, r_name TEXT);'
                       || chr(10) ||
                       string_agg('INSERT INTO region_x VALUES ('
                                  || CAST(r_regionkey AS VARCHAR) || ', '''
                                  || replace(r_name, '''', '''''') || ''');',
                                  chr(10) ORDER BY r_regionkey)) AS script_md5,
                   CAST(COUNT(*) + 1 AS BIGINT) AS n_lines
            FROM region
        """,
        "get_headers_nation": """
            SELECT * FROM (VALUES
                (CAST(0 AS BIGINT), 'n_nationkey'),
                (CAST(1 AS BIGINT), 'n_name'),
                (CAST(2 AS BIGINT), 'n_regionkey')) AS t(pos, name)
        """,
        "row_iteration_checksum": """
            WITH ordered AS (
                SELECT n_nationkey, n_name,
                       ROW_NUMBER() OVER (ORDER BY n_nationkey) AS rn
                FROM nation)
            SELECT COUNT(*) AS n,
                   CAST(SUM(rn * n_nationkey) AS BIGINT) AS weighted,
                   MD5(STRING_AGG(n_name, '|' ORDER BY n_nationkey))
                       AS name_md5
            FROM ordered
        """,
        "construction_api_agg": """
            WITH t(k, v) AS (VALUES (1, 'a'), (2, 'b'), (3, 'a'))
            SELECT v, COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS k_sum,
                   CAST(SUM(k * 10) AS BIGINT) AS w_sum
            FROM t GROUP BY v
        """,
        "table_equality_check": """
            SELECT 'same' AS check, TRUE AS eq
            UNION ALL SELECT 'reordered', TRUE
            UNION ALL SELECT 'perturbed', FALSE
        """,
        "rename_reorder_project": """
            SELECT n_regionkey AS region_id, COUNT(*) AS n,
                   MIN(n_name) AS first_name
            FROM nation GROUP BY n_regionkey
        """,
        "ods_roundtrip_agg": """
            SELECT n_regionkey, COUNT(*) AS n,
                   CAST(SUM(n_nationkey) AS BIGINT) AS key_sum,
                   MIN(n_name) AS first_name
            FROM nation GROUP BY n_regionkey
        """,
        "incremental_minhash_dedup_docs": """
            SELECT doc_id + 30000000 AS doc_id FROM documents
        """,
        "kmeans_embeddings": _kmeans_oracle_sql(),
        "pagerank_lineitem": _pagerank_oracle_sql(),
        "snapshot_diff_docs": """
            WITH old AS (SELECT doc_id, text FROM documents),
            new AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 7 = 0
                            THEN 'v2 ' || text ELSE text END AS text
                FROM documents WHERE doc_id % 11 <> 0
                UNION ALL
                SELECT doc_id + 9000000 AS doc_id, text
                FROM documents WHERE doc_id % 13 = 0
            ),
            oh AS (SELECT doc_id, md5(text) AS h FROM old),
            nh AS (SELECT doc_id, md5(text) AS h FROM new)
            SELECT COALESCE(oh.doc_id, nh.doc_id) AS doc_id,
                   CASE WHEN oh.h IS NULL THEN 'added'
                        WHEN nh.h IS NULL THEN 'removed'
                        WHEN oh.h = nh.h THEN 'unchanged'
                        ELSE 'changed' END AS status
            FROM oh FULL OUTER JOIN nh ON oh.doc_id = nh.doc_id
        """,
        "hard_negatives_embeddings": """
            WITH q AS (SELECT vec_id AS qid, embedding AS qv,
                              label AS qlabel
                       FROM embeddings WHERE vec_id < 3),
            scored AS (
                SELECT q.qid, e.vec_id AS nid, e.label AS nlabel,
                       list_dot_product(q.qv, e.embedding)
                       / (SQRT(list_dot_product(q.qv, q.qv))
                          * SQRT(list_dot_product(e.embedding,
                                                  e.embedding))) AS cos,
                       ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY
                           list_dot_product(q.qv, e.embedding)
                           / (SQRT(list_dot_product(q.qv, q.qv))
                              * SQRT(list_dot_product(e.embedding,
                                                      e.embedding)))
                               DESC,
                           e.vec_id ASC) AS rn
                FROM q CROSS JOIN embeddings e
                WHERE e.vec_id <> q.qid
                  AND e.label IS DISTINCT FROM q.qlabel
            )
            SELECT qid, nid, ROUND(cos, 4) AS cos, rn, nlabel
            FROM scored WHERE rn <= 5
        """,
        "hybrid_search_docs": """
            WITH q(qid, qtext) AS (
                VALUES (1, 'spark window agg'),
                       (2, 'customer query batch'),
                       (3, 'vector scan merge')),
            toks AS (
                SELECT doc_id,
                       unnest(list_filter(regexp_split_to_array(
                           lower(text), '[^a-z0-9]+'), x -> x <> ''))
                           AS term
                FROM documents
            ),
            tf AS (SELECT doc_id, term, COUNT(*) AS tf
                   FROM toks GROUP BY doc_id, term),
            dl AS (SELECT doc_id, SUM(tf) AS dl
                   FROM tf GROUP BY doc_id),
            consts AS (SELECT COUNT(*) AS n, AVG(dl) AS avgdl FROM dl),
            dft AS (SELECT term, COUNT(*) AS df
                    FROM tf GROUP BY term),
            qt AS (SELECT DISTINCT qid,
                          unnest(list_filter(regexp_split_to_array(
                              lower(qtext), '[^a-z0-9]+'),
                              x -> x <> '')) AS term
                   FROM q),
            bscored AS (
                SELECT qt.qid, tf.doc_id,
                       ROUND(SUM(
                           ln(1 + (consts.n - dft.df + 0.5)
                                  / (dft.df + 0.5))
                           * tf.tf * 2.2
                           / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl
                                             / consts.avgdl))), 6)
                           AS score
                FROM tf
                JOIN qt USING (term)
                JOIN dft USING (term)
                JOIN dl USING (doc_id), consts
                GROUP BY qt.qid, tf.doc_id
            ),
            sparse AS (
                SELECT qid, doc_id, rank
                FROM (SELECT qid, doc_id,
                             ROW_NUMBER() OVER (PARTITION BY qid
                                 ORDER BY score DESC, doc_id) AS rank
                      FROM bscored)
                WHERE rank <= 20
            ),
            qv AS (SELECT vec_id + 1 AS qid, embedding AS qv
                   FROM embeddings WHERE vec_id < 3),
            dscored AS (
                SELECT qv.qid, e.vec_id AS doc_id,
                       ROW_NUMBER() OVER (PARTITION BY qv.qid ORDER BY
                           list_dot_product(qv.qv, e.embedding)
                           / (SQRT(list_dot_product(qv.qv, qv.qv))
                              * SQRT(list_dot_product(e.embedding,
                                                      e.embedding)))
                               DESC,
                           e.vec_id ASC) AS rank
                FROM qv CROSS JOIN embeddings e
                WHERE e.vec_id <> qv.qid
            ),
            dense AS (SELECT qid, doc_id, rank FROM dscored
                      WHERE rank <= 20),
            contrib AS (
                SELECT qid, doc_id,
                       CAST(floor(1000000000000.0 / (60 + rank))
                            AS BIGINT) AS c
                FROM sparse
                UNION ALL
                SELECT qid, doc_id,
                       CAST(floor(1000000000000.0 / (60 + rank))
                            AS BIGINT) AS c
                FROM dense
            ),
            fused AS (SELECT qid, doc_id, SUM(c) AS rrf_score,
                             COUNT(*) AS n_sources
                      FROM contrib GROUP BY qid, doc_id)
            SELECT CAST(qid AS BIGINT) AS qid, doc_id,
                   CAST(rank AS INT) AS rank,
                   CAST(rrf_score AS BIGINT) AS rrf_score,
                   CAST(n_sources AS BIGINT) AS n_sources
            FROM (SELECT qid, doc_id, rrf_score, n_sources,
                         ROW_NUMBER() OVER (PARTITION BY qid
                             ORDER BY rrf_score DESC, doc_id) AS rank
                  FROM fused)
            WHERE rank <= 10
        """,
        "preference_pairs_docs": """
            WITH resp AS (
                SELECT doc_id % 97 AS prompt_id, doc_id, text,
                       CAST(length(text) % 997 AS BIGINT) AS score
                FROM documents
            ),
            agg AS (
                SELECT prompt_id,
                       max(struct_pack(s := score, negid := -doc_id,
                                       t := text)) AS ch,
                       min(struct_pack(s := score, id := doc_id,
                                       t := text)) AS rj
                FROM resp GROUP BY prompt_id
            )
            SELECT prompt_id, -(ch.negid) AS chosen_id,
                   rj.id AS rejected_id,
                   md5(ch.t) AS chosen_md5, md5(rj.t) AS rejected_md5,
                   ch.s - rj.s AS pair_margin
            FROM agg
            WHERE ch.s - rj.s >= 50 AND -(ch.negid) != rj.id
        """,
        "pack_sequences_sft_docs": """
            WITH lists AS (
                SELECT doc_id,
                       list_filter(
                           regexp_split_to_array(trim(text), '\\s+'),
                           x -> x <> '') AS l
                FROM documents
            ),
            toks AS (
                SELECT doc_id, generate_subscripts(l, 1) AS i,
                       CAST(LENGTH(unnest(l)) * 131
                            + (generate_subscripts(l, 1) % 127)
                            AS INT) AS id,
                       CAST(generate_subscripts(l, 1) % 2 AS INT)
                           AS msk
                FROM lists
                UNION ALL
                SELECT doc_id, 2147483647 AS i, 0 AS id, 0 AS msk
                FROM documents
            ),
            stream AS (
                SELECT doc_id, id, msk,
                       ROW_NUMBER() OVER (ORDER BY doc_id, i) - 1
                           AS pos
                FROM toks
            ),
            marked AS (
                SELECT *, CASE WHEN pos = MIN(pos) OVER (
                              PARTITION BY doc_id) THEN 1 ELSE 0
                          END AS is_start
                FROM stream
            )
            SELECT CAST(pos // 64 AS BIGINT) AS seq_id,
                   MD5(string_agg(CAST(id AS VARCHAR), ','
                                  ORDER BY pos)) AS ids_md5,
                   MD5(string_agg(CAST(msk AS VARCHAR), ','
                                  ORDER BY pos)) AS mask_md5,
                   MD5(COALESCE(string_agg(
                       CASE WHEN is_start = 1
                            THEN CAST(pos % 64 AS VARCHAR) END, ','
                       ORDER BY pos), '')) AS starts_md5,
                   CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
            FROM marked
            GROUP BY seq_id
            HAVING COUNT(*) = 64
        """,
        "cluster_dedup_keep_best_docs": """
            WITH base AS (
                SELECT doc_id AS i FROM documents WHERE doc_id < 60
            ), members AS (
                SELECT i, i AS doc_id FROM base
                UNION ALL SELECT i, i + 100 FROM base WHERE i % 3 = 0
                UNION ALL SELECT i, i + 200 FROM base WHERE i % 5 = 0
            ), scored AS (
                SELECT i, doc_id, (doc_id * 7) % 13 AS quality
                FROM members
            ), ranked AS (
                SELECT doc_id, quality, ROW_NUMBER() OVER (
                    PARTITION BY i ORDER BY quality DESC, doc_id ASC
                ) AS rn FROM scored
            )
            SELECT doc_id, quality FROM ranked WHERE rn = 1
        """,
        "resize_images_agg": """
            SELECT doc_id,
                   CAST(4 AS INT) AS width,
                   CAST(4 AS INT) AS height,
                   (doc_id * 37) % 256 AS red_level
            FROM documents WHERE doc_id < 2000
        """,
        "resample_audio_meta": """
            SELECT doc_id,
                   16000 AS sample_rate,
                   20 + (doc_id % 7) * 5 AS duration_ms,
                   (doc_id * 131) % 32768 AS level_max,
                   (doc_id * 131) % 32768 AS level_min,
                   320 + (doc_id % 7) * 80 AS n_samples
            FROM documents WHERE doc_id < 2000
        """,
        "cluster_holdout_docs": """
            WITH RECURSIVE d AS (
                SELECT doc_id,
                       regexp_split_to_array(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS toks
                FROM documents WHERE doc_id < 60
            ), g AS (
                SELECT doc_id,
                       list_distinct(list_transform(
                           generate_series(0, GREATEST(LENGTH(toks) - 2, 1) - 1),
                           i -> array_to_string(toks[i+1:i+3], ' '))) AS grams
                FROM d
            ), pairs AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b
                FROM g a JOIN g b ON a.doc_id < b.doc_id
                WHERE CAST(LENGTH(list_intersect(a.grams, b.grams)) AS DOUBLE)
                      / GREATEST(LENGTH(list_distinct(list_concat(a.grams, b.grams))), 1) >= 0.2
            ), edges AS (
                SELECT id_a AS src, id_b AS dst FROM pairs
                UNION ALL
                SELECT id_b AS src, id_a AS dst FROM pairs
            ), reach(id, label) AS (
                SELECT DISTINCT src, src FROM edges
                UNION
                SELECT e.dst, r.label
                FROM reach r JOIN edges e ON e.src = r.id
            ), labeled AS (
                SELECT d.doc_id,
                       COALESCE(cc.component, d.doc_id) AS component
                FROM d LEFT JOIN (
                    SELECT id, MIN(label) AS component FROM reach GROUP BY id
                ) cc ON cc.id = d.doc_id
            )
            SELECT doc_id,
                   CASE WHEN CAST(('0x' || substring(md5('split' ||
                                  CAST(component AS VARCHAR)), 1, 15))
                             AS UBIGINT) / 1152921504606846976.0 < 0.3
                        THEN 'holdout' ELSE 'train' END AS side
            FROM labeled
        """,
        "hdf5_foreign_read": """
            SELECT * FROM (VALUES
              ('a_long',  10, '55'),
              ('b_float', 10, '45'),
              ('c_chunk', 10, '1045'),
              ('d_str',   10, 'alpha|bee|gamma|dd|epsil|zeta|eta|theta|iota|kappa'),
              ('e_vlen',  10, 'v0-|v1-x|v2-xx|v3-xxx|v4-xxxx|v5-|v6-x|v7-xx|v8-xxx|v9-xxxx'),
              ('f_zero',   7, '0'),
              ('g_compact', 10, '145'),
              ('grp/sub/h_nested', 3, '18')
            ) AS t(name, n, agg)
        """,
        "stream_incremental_dedup_docs": """
            -- survivors of the two-micro-batch streaming dedup loop:
            -- batch1's fresh 'ntok' docs (+30M) and batch2's fresh
            -- 'mtok' docs (+60M); corpus dups, in-batch dups, and
            -- batch2's dups-of-batch1-survivors all drop (the last
            -- only because the index append ran between batches)
            SELECT doc_id + 30000000 AS doc_id FROM documents
            UNION ALL
            SELECT doc_id + 60000000 AS doc_id FROM documents
        """,
        "ohlc_resample_events": """
            WITH e AS (
                SELECT event_type, ts,
                       CAST(ROUND(value * 100, 0) AS BIGINT) AS cents,
                       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') || '|' ||
                           lpad(CAST(event_id AS VARCHAR), 12, '0')
                           AS okey
                FROM events
            )
            SELECT event_type,
                   time_bucket(INTERVAL '1 hour', ts) AS bucket_start,
                   arg_min(cents, okey) / 100.0 AS open,
                   MAX(cents) / 100.0 AS high,
                   MIN(cents) / 100.0 AS low,
                   arg_max(cents, okey) / 100.0 AS close,
                   COUNT(*) AS n_events,
                   SUM(cents) / 100.0 AS sum_value
            FROM e
            GROUP BY event_type, time_bucket(INTERVAL '1 hour', ts)
        """,
        "funnel_events": """
            WITH s0 AS (
                SELECT user_id, MIN(ts) AS t_view FROM events
                WHERE event_type = 'view' GROUP BY user_id
            ), s1 AS (
                SELECT e.user_id, MIN(ts) AS t_click
                FROM events e JOIN s0 USING (user_id)
                WHERE event_type = 'click' AND ts > t_view
                GROUP BY e.user_id
            ), s2 AS (
                SELECT e.user_id, MIN(ts) AS t_purchase
                FROM events e JOIN s1 USING (user_id)
                WHERE event_type = 'purchase' AND ts > t_click
                GROUP BY e.user_id
            )
            SELECT s0.user_id, t_view, t_click, t_purchase
            FROM s0 LEFT JOIN s1 USING (user_id)
                    LEFT JOIN s2 USING (user_id)
        """,
        "phrase_search_docs": """
            WITH t AS (
                SELECT doc_id,
                       list_filter(string_split_regex(LOWER(text),
                                                      '[^a-z0-9]+'),
                                   x -> x <> '') AS toks
                FROM documents
            ), m AS (
                SELECT doc_id,
                       list_filter(range(1, GREATEST(len(toks) - 1, 0) + 1),
                                   a -> toks[a] = 'table'
                                        AND toks[a + 1] = 'table')
                           AS anchors
                FROM t
            )
            SELECT doc_id, len(anchors) AS n_matches,
                   CAST(anchors[1] - 1 AS BIGINT) AS first_pos
            FROM m WHERE len(anchors) > 0
        """,
        "bloom_contamination_docs": """
            WITH docs AS (
                SELECT doc_id,
                       string_split_regex(LOWER(TRIM(text)), '\\s+') AS l
                FROM documents
            ), gr AS (
                SELECT doc_id,
                       list_distinct(list_transform(
                           range(1, GREATEST(len(l) - 7, 1) + 1),
                           i -> array_to_string(l[CAST(i AS INT) : CAST(i+7 AS INT)], ' ')))
                       AS gs
                FROM docs
            ), dg AS (SELECT doc_id, UNNEST(gs) AS g FROM gr),
            pg AS (SELECT doc_id AS probe_id, UNNEST(gs) AS g
                   FROM gr WHERE doc_id >= 5 AND doc_id < 15),
            ps AS (SELECT doc_id AS probe_id, len(gs) AS n_probe
                   FROM gr WHERE doc_id >= 5 AND doc_id < 15)
            SELECT dg.doc_id, pg.probe_id,
                   COUNT(*) AS shared_grams,
                   ROUND(COUNT(*) / CAST(ANY_VALUE(ps.n_probe) AS DOUBLE), 4)
                       AS overlap
            FROM dg JOIN pg USING (g) JOIN ps ON ps.probe_id = pg.probe_id
            GROUP BY dg.doc_id, pg.probe_id
        """,
        "tpz_reference_read": """
            SELECT * FROM (VALUES
              (1, 'alpha',   'x',  1152921504606846977, 0.5,  TRUE,
               TIMESTAMP '2021-01-01 00:00:00', DATE '2020-01-01',
               'red',   10, 10),
              (2, 'bravo',   NULL, NULL,                1.25, FALSE,
               TIMESTAMP '2021-01-01 07:00:00', DATE '2020-01-02',
               'green', 20, 20),
              (3, 'charlie', 'y',  3,                   -3.5, TRUE,
               TIMESTAMP '2021-01-01 14:00:00', DATE '2020-01-03',
               'blue',  30, 30),
              (4, 'delta',   NULL, 4,                   2.0,  FALSE,
               TIMESTAMP '2021-01-01 21:00:00', DATE '2020-01-04',
               'red',   40, 40),
              (5, 'écho',    'z',  NULL,                4.75, TRUE,
               TIMESTAMP '2021-01-02 04:00:00', DATE '2020-01-05',
               'green', 50, 50),
              (6, 'foxtrot', NULL, -7,                  10.0, FALSE,
               TIMESTAMP '2021-01-02 11:00:00', DATE '2020-01-06',
               'blue',  60, 60)
            ) AS t(n_key, name, maybe_note, amount, score, ok,
                   created, day_col, tag, dup_a, dup_b)
            ORDER BY n_key
        """,
        "tpz_roundtrip_agg": """
            SELECT n_regionkey, COUNT(*) AS n,
                   CAST(SUM(n_nationkey) AS BIGINT) AS key_sum,
                   COUNT(CASE WHEN n_nationkey % 3 <> 0
                              THEN UPPER(n_name) END) AS comments_kept,
                   SUM(n_nationkey * 1.5) AS score_sum,
                   MIN(n_name) AS first_name
            FROM nation GROUP BY n_regionkey
        """,
        "hdf5_roundtrip_agg": """
            SELECT n_regionkey, COUNT(*) AS n,
                   CAST(SUM(n_nationkey) AS BIGINT) AS key_sum,
                   MIN(n_name) AS first_name
            FROM nation GROUP BY n_regionkey
        """,
        "xls_roundtrip_agg": """
            SELECT CAST(n_regionkey AS BIGINT) AS n_regionkey,
                   COUNT(*) AS n,
                   CAST(SUM(n_nationkey) AS BIGINT) AS key_sum,
                   MIN(n_name) AS first_name
            FROM nation GROUP BY n_regionkey
        """,
        "gopher_quality_docs": _gopher_sql(),
        "gopher_repetition_docs": """
            WITH w AS (
                SELECT doc_id, text,
                       list_filter(regexp_split_to_array(trim(text),
                                                         '\\s+'),
                                   x -> x <> '') AS words,
                       string_split(text, chr(10)) AS lines,
                       string_split(text, chr(10) || chr(10)) AS paras
                FROM documents
            ), base AS (
                SELECT doc_id,
                       CAST(len(lines) AS BIGINT) AS n_lines,
                       CAST(len(list_distinct(lines)) AS BIGINT)
                           AS n_uniq_lines,
                       CAST(COALESCE(list_sum(list_transform(lines,
                           x -> length(x))), 0) AS BIGINT) AS line_chars,
                       CAST(COALESCE(list_sum(list_transform(
                           list_distinct(lines), x -> length(x))), 0)
                           AS BIGINT) AS uniq_line_chars,
                       CAST(len(paras) AS BIGINT) AS n_paras,
                       CAST(len(list_distinct(paras)) AS BIGINT)
                           AS n_uniq_paras,
                       CAST(COALESCE(list_sum(list_transform(paras,
                           x -> length(x))), 0) AS BIGINT) AS para_chars,
                       CAST(COALESCE(list_sum(list_transform(
                           list_distinct(paras), x -> length(x))), 0)
                           AS BIGINT) AS uniq_para_chars,
                       CAST(length(text) AS BIGINT) AS n_chars
                FROM w
            ), g AS (
                SELECT doc_id, n,
                       array_to_string(words[i:i+n-1], ' ') AS gram
                FROM w, UNNEST([2, 3, 4]) AS t(n),
                     UNNEST(range(1, len(words) - n + 2)) AS r(i)
                WHERE len(words) >= n
            ), cnts AS (
                SELECT doc_id, n, gram, COUNT(*) AS cnt
                FROM g GROUP BY ALL
            ), pertop AS (
                SELECT doc_id, n,
                       max(struct_pack(c := cnt, l := length(gram),
                                       g := gram)) AS t
                FROM cnts GROUP BY doc_id, n
            ), tops AS (
                SELECT doc_id,
                       MAX(CASE WHEN n = 2 THEN
                           CAST(t.c * t.l AS BIGINT) END) AS top2_chars,
                       MAX(CASE WHEN n = 3 THEN
                           CAST(t.c * t.l AS BIGINT) END) AS top3_chars,
                       MAX(CASE WHEN n = 4 THEN
                           CAST(t.c * t.l AS BIGINT) END) AS top4_chars
                FROM pertop GROUP BY doc_id
            )
            SELECT b.doc_id, n_lines, n_uniq_lines, line_chars,
                   uniq_line_chars, n_paras, n_uniq_paras, para_chars,
                   uniq_para_chars, n_chars,
                   COALESCE(top2_chars, 0) AS top2_chars,
                   COALESCE(top3_chars, 0) AS top3_chars,
                   COALESCE(top4_chars, 0) AS top4_chars,
                   (10 * (n_lines - n_uniq_lines) <= 3 * n_lines)
                       AS r_dup_lines,
                   (10 * (n_paras - n_uniq_paras) <= 3 * n_paras)
                       AS r_dup_paras,
                   (5 * (line_chars - uniq_line_chars) <= line_chars)
                       AS r_dup_line_chars,
                   (5 * (para_chars - uniq_para_chars) <= para_chars)
                       AS r_dup_para_chars,
                   (5 * COALESCE(top2_chars, 0) <= n_chars) AS r_top2,
                   (50 * COALESCE(top3_chars, 0) <= 9 * n_chars)
                       AS r_top3,
                   (25 * COALESCE(top4_chars, 0) <= 4 * n_chars)
                       AS r_top4,
                   ((10 * (n_lines - n_uniq_lines) <= 3 * n_lines)
                    AND (10 * (n_paras - n_uniq_paras) <= 3 * n_paras)
                    AND (5 * (line_chars - uniq_line_chars)
                         <= line_chars)
                    AND (5 * (para_chars - uniq_para_chars)
                         <= para_chars)
                    AND (5 * COALESCE(top2_chars, 0) <= n_chars)
                    AND (50 * COALESCE(top3_chars, 0) <= 9 * n_chars)
                    AND (25 * COALESCE(top4_chars, 0) <= 4 * n_chars))
                       AS passes
            FROM base b LEFT JOIN tops USING (doc_id)
        """,
        "gopher_dup_ngrams_docs": """
            WITH w AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(trim(text),
                                                         '\\s+'),
                                   x -> x <> '') AS words
                FROM documents
            ), base AS (
                SELECT doc_id,
                       CAST(COALESCE(list_sum(list_transform(
                           words, x -> length(x))), 0) AS BIGINT)
                           AS word_chars
                FROM w
            ), gstarts AS (
                SELECT doc_id, n, i - 1 AS j,
                       array_to_string(words[i:i+n-1], ' ') AS gram
                FROM w, UNNEST([5, 6, 7, 8, 9, 10]) AS t(n),
                     UNNEST(range(1, len(words) - n + 2)) AS r(i)
                WHERE len(words) >= n
            ), dupkeys AS (
                SELECT doc_id, n, gram
                FROM gstarts GROUP BY ALL HAVING COUNT(*) > 1
            ), dstarts AS (
                SELECT g.doc_id, g.n, g.j
                FROM gstarts g
                JOIN dupkeys USING (doc_id, n, gram)
            ), covered AS (
                SELECT DISTINCT doc_id, n, j + k AS p
                FROM dstarts, UNNEST(range(0, n)) AS u(k)
            ), toks AS (
                SELECT doc_id, i - 1 AS p, length(words[i]) AS l
                FROM w, UNNEST(range(1, len(words) + 1)) AS r(i)
            ), per AS (
                SELECT c.doc_id,
                       SUM(CASE WHEN c.n = 5 THEN t.l ELSE 0 END) d5,
                       SUM(CASE WHEN c.n = 6 THEN t.l ELSE 0 END) d6,
                       SUM(CASE WHEN c.n = 7 THEN t.l ELSE 0 END) d7,
                       SUM(CASE WHEN c.n = 8 THEN t.l ELSE 0 END) d8,
                       SUM(CASE WHEN c.n = 9 THEN t.l ELSE 0 END) d9,
                       SUM(CASE WHEN c.n = 10 THEN t.l ELSE 0 END) d10
                FROM covered c JOIN toks t USING (doc_id, p)
                GROUP BY c.doc_id
            )
            SELECT b.doc_id, word_chars,
                   CAST(COALESCE(d5, 0) AS BIGINT) AS dup5_chars,
                   CAST(COALESCE(d6, 0) AS BIGINT) AS dup6_chars,
                   CAST(COALESCE(d7, 0) AS BIGINT) AS dup7_chars,
                   CAST(COALESCE(d8, 0) AS BIGINT) AS dup8_chars,
                   CAST(COALESCE(d9, 0) AS BIGINT) AS dup9_chars,
                   CAST(COALESCE(d10, 0) AS BIGINT) AS dup10_chars,
                   (100 * COALESCE(d5, 0) <= 15 * word_chars)
                       AS r_dup5,
                   (100 * COALESCE(d6, 0) <= 14 * word_chars)
                       AS r_dup6,
                   (100 * COALESCE(d7, 0) <= 13 * word_chars)
                       AS r_dup7,
                   (100 * COALESCE(d8, 0) <= 12 * word_chars)
                       AS r_dup8,
                   (100 * COALESCE(d9, 0) <= 11 * word_chars)
                       AS r_dup9,
                   (100 * COALESCE(d10, 0) <= 10 * word_chars)
                       AS r_dup10,
                   ((100 * COALESCE(d5, 0) <= 15 * word_chars)
                    AND (100 * COALESCE(d6, 0) <= 14 * word_chars)
                    AND (100 * COALESCE(d7, 0) <= 13 * word_chars)
                    AND (100 * COALESCE(d8, 0) <= 12 * word_chars)
                    AND (100 * COALESCE(d9, 0) <= 11 * word_chars)
                    AND (100 * COALESCE(d10, 0) <= 10 * word_chars))
                       AS passes
            FROM base b LEFT JOIN per ON b.doc_id = per.doc_id
        """,
        "c4_clean_docs": """
            SELECT doc_id,
                   MD5(CASE WHEN doc_id % 5 <> 0 AND doc_id % 7 = 0
                       THEN
                         'The value ' || CAST(doc_id AS VARCHAR) ||
                         ' is good.' || chr(10) ||
                         'Totally fine sentence number ' ||
                         CAST(doc_id AS VARCHAR) || '!' || chr(10) ||
                         'Is this kept as well?' || chr(10) ||
                         'see lorem ipsum.'
                       ELSE
                         'The value ' || CAST(doc_id AS VARCHAR) ||
                         ' is good.' || chr(10) ||
                         'Totally fine sentence number ' ||
                         CAST(doc_id AS VARCHAR) || '!' || chr(10) ||
                         'Is this kept as well?'
                       END) AS clean_md5,
                   CAST(CASE WHEN doc_id % 5 <> 0 AND doc_id % 7 = 0
                        THEN 4 ELSE 3 END AS BIGINT) AS n_lines_kept,
                   (doc_id % 5 <> 0 AND doc_id % 7 <> 0) AS keep_page
            FROM documents
        """,
        "substring_dedup_docs": """
            SELECT doc_id,
                   MD5(CASE WHEN doc_id % 3 = 0 THEN
                         'a' || CAST(doc_id AS VARCHAR) ||
                         ' b' || CAST(doc_id AS VARCHAR) ||
                         ' c' || CAST(doc_id AS VARCHAR) ||
                         ' d' || CAST(doc_id AS VARCHAR)
                       ELSE
                         'a' || CAST(doc_id AS VARCHAR) ||
                         ' b' || CAST(doc_id AS VARCHAR) ||
                         ' c' || CAST(doc_id AS VARCHAR) ||
                         ' d' || CAST(doc_id AS VARCHAR) ||
                         ' e' || CAST(doc_id AS VARCHAR)
                       END) AS text_md5,
                   CAST(CASE WHEN doc_id % 3 = 0 THEN 4 ELSE 5 END
                        AS BIGINT) AS n_tokens_kept
            FROM documents
        """,
        "hdf5_chunked_roundtrip_agg": """
            SELECT o_orderstatus, COUNT(*) AS n,
                   CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
                   ROUND(MIN(o_totalprice), 2) AS min_price,
                   ROUND(MAX(o_totalprice), 2) AS max_price
            FROM orders GROUP BY o_orderstatus
        """,
        "zorder_events": _zorder_oracle(),
        "quality_classifier_docs": _logreg_oracle(),
        "column_profile": """
            SELECT 'l_orderkey' AS "column", COUNT(*) AS n,
                   COUNT(*) - COUNT(l_orderkey) AS n_nulls,
                   CAST(MIN(l_orderkey) AS VARCHAR) AS min,
                   CAST(MAX(l_orderkey) AS VARCHAR) AS max,
                   ROUND(AVG(CAST(l_orderkey AS DOUBLE)), 6) AS mean_r,
                   TRUE AS distinct_ok
            FROM lineitem
            UNION ALL
            SELECT 'l_quantity', COUNT(*),
                   COUNT(*) - COUNT(l_quantity),
                   CAST(MIN(l_quantity) AS VARCHAR),
                   CAST(MAX(l_quantity) AS VARCHAR),
                   ROUND(AVG(CAST(l_quantity AS DOUBLE)), 6), TRUE
            FROM lineitem
            UNION ALL
            SELECT 'l_returnflag', COUNT(*),
                   COUNT(*) - COUNT(l_returnflag),
                   CAST(MIN(l_returnflag) AS VARCHAR),
                   CAST(MAX(l_returnflag) AS VARCHAR),
                   CAST(NULL AS DOUBLE), TRUE
            FROM lineitem
            UNION ALL
            SELECT 'l_linestatus', COUNT(*),
                   COUNT(*) - COUNT(l_linestatus),
                   CAST(MIN(l_linestatus) AS VARCHAR),
                   CAST(MAX(l_linestatus) AS VARCHAR),
                   CAST(NULL AS DOUBLE), TRUE
            FROM lineitem
        """,
        "bm25_search_docs": """
            WITH q(qid, qtext) AS (
                VALUES (1, 'spark window agg'),
                       (2, 'customer query batch'),
                       (3, 'vector scan merge')),
            toks AS (
                SELECT doc_id,
                       unnest(list_filter(regexp_split_to_array(
                           lower(text), '[^a-z0-9]+'), x -> x <> ''))
                           AS term
                FROM documents
            ),
            tf AS (SELECT doc_id, term, COUNT(*) AS tf
                   FROM toks GROUP BY doc_id, term),
            dl AS (SELECT doc_id, SUM(tf) AS dl
                   FROM tf GROUP BY doc_id),
            consts AS (SELECT COUNT(*) AS n, AVG(dl) AS avgdl FROM dl),
            dft AS (SELECT term, COUNT(*) AS df
                    FROM tf GROUP BY term),
            qt AS (SELECT DISTINCT qid,
                          unnest(list_filter(regexp_split_to_array(
                              lower(qtext), '[^a-z0-9]+'),
                              x -> x <> '')) AS term
                   FROM q),
            scored AS (
                SELECT qt.qid, tf.doc_id,
                       ROUND(SUM(
                           ln(1 + (consts.n - dft.df + 0.5)
                                  / (dft.df + 0.5))
                           * tf.tf * 2.2
                           / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl
                                             / consts.avgdl))), 6)
                           AS score
                FROM tf
                JOIN qt USING (term)
                JOIN dft USING (term)
                JOIN dl USING (doc_id), consts
                GROUP BY qt.qid, tf.doc_id
            )
            SELECT CAST(qid AS BIGINT) AS qid, doc_id,
                   CAST(rank AS INT) AS rank, score
            FROM (SELECT qid, doc_id,
                         ROW_NUMBER() OVER (PARTITION BY qid
                             ORDER BY score DESC, doc_id) AS rank,
                         score
                  FROM scored)
            WHERE rank <= 5
        """,
        "bucketed_join_revenue": """
            SELECT c_mktsegment,
                   COUNT(*) AS n_orders,
                   ROUND(SUM(o_totalprice), 2) AS revenue,
                   COUNT(DISTINCT o_custkey) AS n_custs
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment
        """,
        "pack_sequences_docs": """
            WITH lists AS (
                SELECT doc_id,
                       list_filter(
                           regexp_split_to_array(trim(text), '\\s+'),
                           x -> x <> '') AS l
                FROM documents
            ),
            toks AS (
                SELECT doc_id, generate_subscripts(l, 1) AS i,
                       CAST(LENGTH(unnest(l)) * 131
                            + (generate_subscripts(l, 1) % 127)
                            AS INT) AS id
                FROM lists
                UNION ALL
                SELECT doc_id, 2147483647 AS i, 0 AS id
                FROM documents
            ),
            stream AS (
                SELECT doc_id, id,
                       ROW_NUMBER() OVER (ORDER BY doc_id, i) - 1
                           AS pos
                FROM toks
            )
            SELECT CAST(pos // 64 AS BIGINT) AS seq_id,
                   MD5(string_agg(CAST(id AS VARCHAR), ','
                                  ORDER BY pos)) AS ids_md5,
                   CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
            FROM stream
            GROUP BY seq_id
            HAVING COUNT(*) = 64
        """,
        "hdf5_vlen_roundtrip": """
            SELECT n_regionkey, COUNT(*) AS n,
                   CAST(SUM(n_nationkey) AS BIGINT) AS key_sum,
                   MIN(n_name) AS first_name,
                   CAST(SUM(LENGTH(n_name)) AS BIGINT) AS name_chars
            FROM nation GROUP BY n_regionkey
        """,
        "salted_join_equivalence": """
            WITH fact AS (
                SELECT l_orderkey, l_linenumber,
                       CASE WHEN l_orderkey % 97 = 0 THEN NULL
                            WHEN l_orderkey % 10 < 9 THEN 1
                            ELSE l_suppkey END AS fk
                FROM lineitem),
            dim AS (
                SELECT s_suppkey, s_name FROM supplier
                WHERE s_suppkey < 100
                UNION ALL
                SELECT s_suppkey, s_name FROM supplier
                WHERE s_suppkey < 5)
            SELECT f.l_orderkey, f.l_linenumber, f.fk, d.s_name
            FROM fact f LEFT JOIN dim d ON f.fk = d.s_suppkey
        """,
        "xls_dates_roundtrip": """
            SELECT CAST(year(o_orderdate) AS INT) AS yr,
                   COUNT(*) AS n,
                   CAST(MIN(o_orderdate) AS TIMESTAMP) AS first_dt,
                   CAST(MAX(o_orderdate) AS TIMESTAMP) AS last_dt,
                   CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
            FROM orders WHERE o_orderkey % 97 = 0
            GROUP BY yr
        """,
        "html_roundtrip_agg": """
            SELECT n_regionkey, COUNT(*) AS n,
                   CAST(SUM(n_nationkey) AS BIGINT) AS key_sum,
                   MIN(n_name) AS first_name
            FROM nation GROUP BY n_regionkey
        """,
        "q6_forecast_revenue": """
            SELECT SUM(ROUND(l_extendedprice * l_discount * 100, 0)) / 100 AS revenue,
                   COUNT(*) AS n
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate <  TIMESTAMP '1998-01-01'
              AND l_discount >= 0.03 AND l_discount <= 0.06
              AND l_quantity < 24
        """,
        "q14_promo_revenue": """
            SELECT SUM(CASE WHEN p_type = 'PROMO'
                            THEN ROUND(l_extendedprice * (1 - l_discount) * 100, 0)
                            ELSE 0.0 END) / 100 AS promo_revenue,
                   SUM(ROUND(l_extendedprice * (1 - l_discount) * 100, 0)) / 100 AS total_revenue
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE l_shipdate >= TIMESTAMP '1997-06-01'
              AND l_shipdate <  TIMESTAMP '1997-08-01'
        """,
        "q18_large_orders": """
            SELECT c_name, o_orderkey, o_totalprice, total_qty
            FROM (SELECT l_orderkey, ROUND(SUM(l_quantity), 2) AS total_qty
                  FROM lineitem GROUP BY l_orderkey
                  HAVING ROUND(SUM(l_quantity), 2) > 250) big
            JOIN orders ON big.l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
        """,
        "q4_priority_exists": """
            SELECT o_orderpriority, COUNT(*) AS order_count
            FROM orders
            WHERE EXISTS (SELECT 1 FROM lineitem
                          WHERE l_orderkey = o_orderkey
                            AND l_shipdate > o_orderdate)
            GROUP BY o_orderpriority
        """,
        "count_value": """
            SELECT COUNT(*) AS n FROM lineitem WHERE l_returnflag = 'R'
        """,
        "groupby_cube": """
            SELECT COALESCE(o_orderstatus, 'ALL') AS status,
                   COALESCE(o_orderpriority, 'ALL') AS prio,
                   COUNT(*) AS n,
                   SUM(ROUND(o_totalprice * 100, 0)) / 100 AS price_sum
            FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        """,
        "window_ntile": """
            SELECT o_orderkey, o_orderstatus,
                   NTILE(4) OVER (PARTITION BY o_orderstatus
                                  ORDER BY o_totalprice ASC, o_orderkey ASC)
                       AS quartile
            FROM orders
        """,
        "q19_disjunctive_filter": """
            SELECT SUM(ROUND(l_extendedprice * (1 - l_discount) * 100, 0)) / 100 AS revenue,
                   COUNT(*) AS n
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE (p_brand = 'Brand#1' AND p_size <= 10
                   AND l_quantity BETWEEN 1 AND 20)
               OR (p_brand = 'Brand#2' AND p_size <= 20
                   AND l_quantity BETWEEN 10 AND 30)
               OR (p_brand = 'Brand#3' AND p_size <= 30
                   AND l_quantity BETWEEN 20 AND 40)
        """,
        "groupby_rollup": """
            SELECT COALESCE(l_returnflag, 'ALL') AS rf,
                   COALESCE(l_linestatus, 'ALL') AS ls,
                   ROUND(SUM(l_quantity), 2) AS sum_qty,
                   COUNT(*) AS n
            FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        """,
        "hopping_window": """
            SELECT ws AS w_start, event_type, COUNT(*) AS n,
                   SUM(ROUND(value * 100, 0)) / 100 AS val_sum
            FROM (SELECT e.*, u.ws
                  FROM events e,
                       LATERAL UNNEST(generate_series(
                           time_bucket(INTERVAL '15 minutes', ts)
                               - INTERVAL '45 minutes',
                           time_bucket(INTERVAL '15 minutes', ts),
                           INTERVAL '15 minutes')) AS u(ws))
            GROUP BY ws, event_type
        """,
        "deterministic_sample_orders": """
            SELECT COUNT(*) AS n, CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
            FROM orders
            WHERE CAST(('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))
                       AS UBIGINT) / 1152921504606846976.0 < 0.1
        """,
        "stratified_sample_docs": """
            SELECT lang, COUNT(*) AS n, CAST(SUM(doc_id) AS BIGINT) AS id_sum
            FROM documents
            WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                       AS UBIGINT) / 1152921504606846976.0
                  < CASE lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 0.25
                              ELSE 0.1 END
            GROUP BY lang
        """,
        "statistics_dates": """
            SELECT MIN(l_shipdate) AS min,
                   MAX(l_shipdate) AS max,
                   CAST(to_timestamp(MEDIAN(epoch(l_shipdate))) AS TIMESTAMP) AS median,
                   COUNT(DISTINCT l_shipdate) AS distinct,
                   COUNT(l_shipdate) AS non_null
            FROM lineitem
        """,
        "unique_values": """
            SELECT DISTINCT p_brand FROM part
        """,
        "is_sorted": """
            WITH t AS (SELECT n_nationkey, n_name,
                              row_number() OVER () AS rid FROM nation),
                 l AS (SELECT n_nationkey, n_name,
                              LAG(n_nationkey, 1, n_nationkey) OVER (ORDER BY rid) AS pk,
                              LAG(n_name, 1, n_name) OVER (ORDER BY rid) AS pn
                       FROM t)
            SELECT BOOL_AND(n_nationkey >= pk) AS sorted_by_key,
                   BOOL_AND(n_name >= pn) AS sorted_by_name
            FROM l
        """,
        "remove_all": """
            SELECT n_regionkey, COUNT(*) AS n
            FROM nation
            WHERE n_name NOT IN ('CHINA', 'FRANCE', 'KENYA')
            GROUP BY n_regionkey
        """,
        "pandas_roundtrip_agg": """
            SELECT n_regionkey, COUNT(*) AS n,
                   CAST(SUM(n_nationkey) AS BIGINT) AS key_sum
            FROM nation GROUP BY n_regionkey
        """,
        "json_columnar_roundtrip": """
            SELECT n_regionkey, COUNT(*) AS n,
                   CAST(SUM(n_nationkey) AS BIGINT) AS key_sum,
                   MIN(n_name) AS first_name
            FROM nation GROUP BY n_regionkey
        """,
        "token_count_bpe": """
            SELECT doc_id,
                   LENGTH(regexp_extract_all(text, '[A-Za-z]+|\\d+|[^\\sA-Za-z\\d]')) AS n_tokens
            FROM documents
        """,
        "language_id_docs": """
            WITH t AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
                       FROM documents),
            s AS (SELECT doc_id,
               [{'score': LENGTH(list_filter(toks, x -> x IN ('the','and','of','to','is'))), 'lang': 'en'},
                {'score': LENGTH(list_filter(toks, x -> x IN ('der','die','und','das','ist'))), 'lang': 'de'},
                {'score': LENGTH(list_filter(toks, x -> x IN ('le','la','et','les','est'))), 'lang': 'fr'},
                {'score': LENGTH(list_filter(toks, x -> x IN ('el','la','que','los','es'))), 'lang': 'es'}] AS sc
               FROM t)
            SELECT doc_id,
                   CASE WHEN list_max(sc).score > 0 THEN list_max(sc).lang
                        ELSE 'unknown' END AS lang_pred
            FROM s
        """,
        "dedup_clusters": """
            WITH RECURSIVE d AS (
                SELECT doc_id,
                       regexp_split_to_array(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS toks
                FROM documents WHERE doc_id < 60
            ), g AS (
                SELECT doc_id,
                       list_distinct(list_transform(
                           generate_series(0, GREATEST(LENGTH(toks) - 2, 1) - 1),
                           i -> array_to_string(toks[i+1:i+3], ' '))) AS grams
                FROM d
            ), pairs AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b
                FROM g a JOIN g b ON a.doc_id < b.doc_id
                WHERE CAST(LENGTH(list_intersect(a.grams, b.grams)) AS DOUBLE)
                      / GREATEST(LENGTH(list_distinct(list_concat(a.grams, b.grams))), 1) >= 0.2
            ), edges AS (
                SELECT id_a AS src, id_b AS dst FROM pairs
                UNION ALL
                SELECT id_b AS src, id_a AS dst FROM pairs
            ), reach(id, label) AS (
                SELECT DISTINCT src, src FROM edges
                UNION
                SELECT e.dst, r.label
                FROM reach r JOIN edges e ON e.src = r.id
            )
            SELECT d.doc_id,
                   COALESCE(cc.component, d.doc_id) AS component
            FROM d LEFT JOIN (
                SELECT id, MIN(label) AS component FROM reach GROUP BY id
            ) cc ON cc.id = d.doc_id
        """,
        "ngram_jaccard_pairs": """
            WITH d AS (
                SELECT doc_id,
                       regexp_split_to_array(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS toks
                FROM documents WHERE doc_id < 40
            ), g AS (
                SELECT doc_id,
                       list_distinct(list_transform(
                           generate_series(0, GREATEST(LENGTH(toks) - 2, 1) - 1),
                           i -> array_to_string(toks[i+1:i+3], ' '))) AS grams
                FROM d
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   ROUND(CAST(LENGTH(list_intersect(a.grams, b.grams)) AS DOUBLE)
                         / GREATEST(LENGTH(list_distinct(list_concat(a.grams, b.grams))), 1), 4) AS jaccard
            FROM g a JOIN g b ON a.doc_id < b.doc_id
        """,
        "near_dup_embeddings": """
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   ROUND(list_dot_product(a.embedding, b.embedding)
                         / (SQRT(list_dot_product(a.embedding, a.embedding))
                            * SQRT(list_dot_product(b.embedding, b.embedding))), 4) AS cos
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_dot_product(a.embedding, b.embedding)
                  / (SQRT(list_dot_product(a.embedding, a.embedding))
                     * SQRT(list_dot_product(b.embedding, b.embedding))) >= 0.4
        """,
        "multimodal_decode": """
            SELECT doc_id,
                   64 + OCTET_LENGTH(ENCODE(text)) % 512 AS width,
                   64 + (OCTET_LENGTH(ENCODE(text)) * 7) % 512 AS height
            FROM documents
        """,
        "media_features": """
            WITH ex AS (
                SELECT doc_id, LENGTH(text) AS n,
                       UNNEST(RANGE(1, LENGTH(text) + 1)) AS i, text
                FROM documents
            ), b AS (
                SELECT doc_id, n,
                       ORD(SUBSTRING(text, CAST(i AS INT), 1)) % 8 AS bkt
                FROM ex
            )
            SELECT doc_id,
                   ROUND(COUNT(*) FILTER (WHERE bkt = 0)
                         / CAST(ANY_VALUE(n) AS DOUBLE), 4) AS f0,
                   ROUND(COUNT(*) FILTER (WHERE bkt = 7)
                         / CAST(ANY_VALUE(n) AS DOUBLE), 4) AS f7
            FROM b GROUP BY doc_id
        """,
        "groupby_accumulators": """
            SELECT l_returnflag,
                   ROUND(SUM(l_quantity), 2) AS sum_q,
                   MIN(l_quantity) AS min_q,
                   MAX(l_quantity) AS max_q,
                   ROUND(AVG(l_quantity), 4) AS avg_q,
                   COUNT(*) AS cnt,
                   COUNT(DISTINCT l_quantity) AS cntu,
                   ROUND(STDDEV_SAMP(l_quantity), 4) AS stdev_q,
                   ROUND(MEDIAN(l_quantity), 4) AS median_q
            FROM lineitem GROUP BY l_returnflag
        """,
        "distinct_keys": """
            SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        """,
        "unique_first": """
            SELECT o_orderstatus, o_orderpriority, MIN(o_orderkey) AS o_orderkey
            FROM orders GROUP BY o_orderstatus, o_orderpriority
        """,
        "join_inner": """
            SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
            FROM orders JOIN customer ON o_custkey = c_custkey
            WHERE o_totalprice > 400000
        """,
        "join_left": """
            SELECT c_custkey, c_name, o_orderkey, o_totalprice
            FROM customer LEFT JOIN (
                SELECT * FROM orders WHERE o_totalprice > 450000
            ) o ON c_custkey = o_custkey
        """,
        "join_outer_merge_keys": """
            SELECT COALESCE(a.k, b.k) AS k, a.o_totalprice, b.o_orderstatus
            FROM (SELECT o_orderkey AS k, o_totalprice FROM orders WHERE o_orderkey % 3 = 0) a
            FULL OUTER JOIN (SELECT o_orderkey AS k, o_orderstatus FROM orders WHERE o_orderkey % 3 = 1) b
            ON a.k = b.k
        """,
        "join_cross": """
            SELECT r_regionkey, r_name, s_suppkey, s_name
            FROM region CROSS JOIN supplier
        """,
        "join_semi": """
            SELECT c_custkey, c_name FROM customer
            WHERE EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        """,
        "join_anti": """
            SELECT c_custkey, c_name FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        """,
        "join_nullsafe": """
            SELECT c.k, COUNT(*) AS n_pairs, CAST(SUM(s.s_suppkey) AS BIGINT) AS sum_supp
            FROM (SELECT NULLIF(c_nationkey % 5, 3) AS k, c_custkey FROM customer) c
            JOIN (SELECT NULLIF(s_nationkey % 5, 3) AS k, s_suppkey FROM supplier) s
            ON c.k IS NOT DISTINCT FROM s.k
            GROUP BY c.k
        """,
        "lookup_first_match": """
            SELECT o_orderkey, first_ship, l_linenumber FROM (
                SELECT o.o_orderkey,
                       CAST(l.l_shipdate AS DATE) AS first_ship,
                       l.l_linenumber,
                       ROW_NUMBER() OVER (PARTITION BY o.o_orderkey
                           ORDER BY l.l_shipdate ASC NULLS LAST,
                                    l.l_linenumber ASC NULLS LAST) AS rn
                FROM orders o
                LEFT JOIN lineitem l
                  ON o.o_orderkey = l.l_orderkey AND l.l_shipdate >= o.o_orderdate
            ) WHERE rn = 1
        """,
        "pivot_wide": """
            SELECT l_returnflag,
                   ROUND(SUM(l_quantity) FILTER (WHERE l_linestatus = 'F'), 2) AS "l_linestatus=F",
                   ROUND(SUM(l_quantity) FILTER (WHERE l_linestatus = 'O'), 2) AS "l_linestatus=O"
            FROM lineitem GROUP BY l_returnflag
        """,
        "melt_long": """
            SELECT p_partkey, 'p_size' AS attr, CAST(p_size AS DOUBLE) AS val FROM part
            UNION ALL
            SELECT p_partkey, 'p_retailprice' AS attr, p_retailprice AS val FROM part
        """,
        "window_topn": """
            SELECT c_mktsegment, rn, c_custkey, c_acctbal FROM (
                SELECT c_mktsegment, c_custkey, c_acctbal,
                       ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                           ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
                FROM customer
            ) WHERE rn <= 3
        """,
        "window_running_sum": """
            SELECT o_custkey, o_orderkey,
                   ROUND(SUM(o_totalprice) OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_orderdate ASC, o_orderkey ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
            FROM orders
        """,
        "window_lag": """
            SELECT o_custkey, o_orderkey,
                   LAG(o_totalprice) OVER w AS prev_price,
                   DATEDIFF('day', LAG(o_orderdate) OVER w, o_orderdate) AS days_since_prev
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
        """,
        "slice_step": """
            SELECT o_orderkey, o_totalprice FROM (
                SELECT o_orderkey, o_totalprice,
                       ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS idx
                FROM orders
            ) WHERE idx >= 10 AND idx < 200 AND (idx - 10) % 7 = 0
        """,
        "concat_tables": """
            SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_quantity < 3
            UNION ALL
            SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_quantity > 48
        """,
        "stack_tables": """
            SELECT n_nationkey, n_name, NULL AS r_name FROM nation
            UNION ALL
            SELECT r_regionkey AS n_nationkey, NULL AS n_name, r_name FROM region
        """,
        "repeat_table": """
            SELECT n_nationkey, n_name FROM nation
            UNION ALL SELECT n_nationkey, n_name FROM nation
            UNION ALL SELECT n_nationkey, n_name FROM nation
        """,
        "replace_values": """
            SELECT n_nationkey,
                   CASE n_name WHEN 'CHINA' THEN 'PRC'
                               WHEN 'UNITED STATES' THEN 'USA'
                               ELSE n_name END AS n_name
            FROM nation
        """,
        "drop_rows": """
            SELECT l_orderkey, l_returnflag, l_linestatus FROM lineitem
            WHERE NOT (l_returnflag IN ('R','F') OR l_linestatus IN ('R','F'))
        """,
        "column_select_pass": """
            SELECT o_orderkey AS okey,
                   CAST(o_orderkey AS BIGINT) AS v_int
            FROM orders WHERE o_orderkey % 3 = 0
        """,
        "column_select_fail": """
            SELECT o_orderkey,
                   'x' || CAST(o_orderkey AS VARCHAR) AS v,
                   'Column ''v'' failed to convert x' || CAST(o_orderkey AS VARCHAR) || ' to int' AS reject_reason
            FROM orders WHERE o_orderkey % 3 <> 0
        """,
        "imputation_ffill": """
            SELECT event_id,
                   ROUND(last_value(v IGNORE NULLS) OVER (
                       ORDER BY event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS value
            FROM (SELECT event_id,
                         CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS v
                  FROM events)
        """,
        "imputation_mean": """
            SELECT event_id,
                   ROUND(COALESCE(v, AVG(v) OVER ()), 2) AS value
            FROM (SELECT event_id,
                         CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS v
                  FROM events)
        """,
        "statistics_summary": """
            SELECT MIN(l_quantity) AS min, MAX(l_quantity) AS max,
                   ROUND(AVG(l_quantity), 4) AS mean,
                   ROUND(MEDIAN(l_quantity), 4) AS median,
                   ROUND(STDDEV_SAMP(l_quantity), 4) AS stdev,
                   COUNT(DISTINCT l_quantity) AS distinct,
                   ROUND(SUM(l_quantity), 2) AS sum,
                   COUNT(l_quantity) AS non_null
            FROM lineitem
        """,
        "histogram": """
            SELECT o_orderpriority, COUNT(*) AS count FROM orders GROUP BY o_orderpriority
        """,
        "xround_buckets": """
            SELECT CAST(FLOOR(o_totalprice / 1000) * 1000 AS BIGINT) AS bucket,
                   COUNT(*) AS n
            FROM orders GROUP BY 1
        """,
        "diff_tables": """
            WITH a AS (SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 15),
                 b AS (SELECT n_nationkey, n_name FROM nation WHERE n_nationkey >= 10),
                 ca AS (SELECT n_nationkey, n_name, COUNT(*) AS na FROM a GROUP BY 1,2),
                 cb AS (SELECT n_nationkey, n_name, COUNT(*) AS nb FROM b GROUP BY 1,2),
                 m AS (SELECT COALESCE(ca.n_nationkey, cb.n_nationkey) AS n_nationkey,
                              COALESCE(ca.n_name, cb.n_name) AS n_name,
                              COALESCE(na, 0) AS na, COALESCE(nb, 0) AS nb
                       FROM ca FULL OUTER JOIN cb
                       ON ca.n_nationkey IS NOT DISTINCT FROM cb.n_nationkey
                      AND ca.n_name IS NOT DISTINCT FROM cb.n_name)
            SELECT '=' AS marker, n_nationkey, n_name FROM m WHERE LEAST(na, nb) > 0
            UNION ALL
            SELECT '-' AS marker, n_nationkey, n_name FROM m WHERE na - nb > 0
            UNION ALL
            SELECT '+' AS marker, n_nationkey, n_name FROM m WHERE nb - na > 0
        """,
        "sessionize_events": """
            WITH g AS (
                SELECT user_id, value, ts,
                       CASE WHEN LAG(ts) OVER w IS NULL
                                 OR EXTRACT(EPOCH FROM ts) - EXTRACT(EPOCH FROM LAG(ts) OVER w) > 1800
                            THEN 1 ELSE 0 END AS new_sess,
                       event_id
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
            ), s AS (
                SELECT user_id, value,
                       CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
                FROM g
            )
            SELECT user_id, session_seq, COUNT(*) AS n_events,
                   SUM(ROUND(value * 100, 0)) / 100 AS session_value
            FROM s GROUP BY user_id, session_seq
        """,
        "tumbling_window": """
            SELECT STRFTIME(DATE_TRUNC('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
                   event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS total_value
            FROM events GROUP BY 1, 2
        """,
        "dedup_exact": """
            SELECT doc_id, n_chars FROM documents
            WHERE doc_id IN (SELECT MIN(doc_id) FROM documents GROUP BY text)
        """,
        "text_stats": """
            SELECT doc_id,
                   LENGTH(text) AS n_chars_computed,
                   LENGTH(regexp_split_to_array(TRIM(text), '\\s+')) AS n_tokens,
                   LENGTH(list_distinct(regexp_split_to_array(TRIM(text), '\\s+'))) AS n_uniq_tokens,
                   ROUND(LENGTH(REPLACE(TRIM(text), ' ', ''))
                         / LENGTH(regexp_split_to_array(TRIM(text), '\\s+')), 4) AS avg_token_len
            FROM documents WHERE LENGTH(TRIM(text)) > 0
        """,
        "doc_fingerprint": """
            SELECT doc_id,
                   MD5(REGEXP_REPLACE(LOWER(text), '[^a-z0-9 ]', '', 'g')) AS fp
            FROM documents
        """,
        "quality_score": """
            SELECT doc_id,
                   ROUND(sw / GREATEST(n_tok, 1), 4) AS stopword_ratio,
                   ROUND(LEAST(1.0, n_tok / 100.0) * 0.5
                         + LEAST(sw / GREATEST(n_tok, 1) * 5, 1.0) * 0.5, 4) AS quality
            FROM (
                SELECT doc_id,
                       CAST(LENGTH(regexp_split_to_array(TRIM(text), '\\s+')) AS DOUBLE) AS n_tok,
                       CAST(LENGTH(list_filter(regexp_split_to_array(LOWER(TRIM(text)), '\\s+'),
                            x -> x IN ('the','a','an','and','or','of','to','in','is','it')))
                            AS DOUBLE) AS sw
                FROM documents WHERE LENGTH(TRIM(text)) > 0
            )
        """,
        "trigram_substring_docs": """
            SELECT doc_id,
                   CAST((length(text) - length(replace(text,
                        'the table', ''))) / 9 AS BIGINT)
                       AS n_occurrences
            FROM documents
            WHERE contains(text, 'the table')
        """,
        "interpolate_events": """
            WITH s AS (
                SELECT user_id, ts, MAX(value) AS v FROM events
                WHERE event_type = 'click' GROUP BY user_id, ts
            ), t AS (
                SELECT event_id, user_id, ts FROM events
                WHERE event_type = 'error'
            ), b AS (
                SELECT t.event_id, t.ts, s.ts AS pts, s.v AS pv
                FROM t ASOF LEFT JOIN s
                  ON t.user_id = s.user_id AND s.ts <= t.ts
            ), f AS (
                SELECT t.event_id, s.ts AS nts, s.v AS nv
                FROM t ASOF LEFT JOIN s
                  ON t.user_id = s.user_id AND s.ts >= t.ts
            )
            SELECT b.event_id,
                   ROUND(CASE
                       WHEN pts IS NULL OR nts IS NULL THEN NULL
                       WHEN pts = nts THEN pv
                       ELSE pv + (nv - pv) *
                            ((CAST(epoch_us(b.ts) AS DOUBLE)
                              - CAST(epoch_us(pts) AS DOUBLE))
                             / (CAST(epoch_us(nts) AS DOUBLE)
                                - CAST(epoch_us(pts) AS DOUBLE)))
                   END, 4) AS value
            FROM b JOIN f USING (event_id)
        """,
        "fuzzy_join_customers": """
            SELECT a.c_custkey AS l_id, b.c_custkey AS r_id,
                   CAST(levenshtein(a.c_name, b.c_name) AS INTEGER)
                       AS dist
            FROM customer a JOIN customer b
              ON a.c_custkey < b.c_custkey
            WHERE levenshtein(a.c_name, b.c_name) <= 1
        """,
        "winnow_fps_docs": r"""
            WITH nrm AS (
                SELECT doc_id,
                       regexp_replace(lower(text), '\s+', ' ', 'g') AS s
                FROM documents WHERE doc_id < 20
            ), g AS (
                SELECT doc_id, CASE WHEN length(s) >= 8 THEN
                    list_transform(range(1, length(s) - 8 + 2),
                                   i -> substr(s, i, 8))
                    ELSE [] END AS gs
                FROM nrm
            ), h AS (
                SELECT doc_id,
                       list_transform(gs, x ->
                           CAST(('0x' || substr(md5(x), 1, 15))
                                AS UBIGINT)) AS hs
                FROM g
            ), wins AS (
                SELECT doc_id,
                       list_transform(
                           range(0, greatest(len(hs) - 4 + 1, 0)),
                           p -> {
                               'fp': list_min(hs[p+1:p+4]),
                               'pos': p + 4 - list_position(
                                   list_reverse(hs[p+1:p+4]),
                                   list_min(hs[p+1:p+4]))
                           }) AS ws
                FROM h
            )
            SELECT DISTINCT doc_id, CAST(u.w.fp AS BIGINT) AS fp,
                   CAST(u.w.pos AS INTEGER) AS pos
            FROM wins, UNNEST(ws) AS u(w)
        """,
        "winnow_matches_docs": r"""
            WITH nrm AS (
                SELECT doc_id,
                       regexp_replace(lower(text), '\s+', ' ', 'g') AS s
                FROM documents
            ), g AS (
                SELECT doc_id, CASE WHEN length(s) >= 12 THEN
                    list_transform(range(1, length(s) - 12 + 2),
                                   i -> substr(s, i, 12))
                    ELSE [] END AS gs
                FROM nrm
            ), h AS (
                SELECT doc_id,
                       list_transform(gs, x ->
                           CAST(('0x' || substr(md5(x), 1, 15))
                                AS UBIGINT)) AS hs
                FROM g
            ), fps AS (
                SELECT DISTINCT doc_id, CAST(u.f AS BIGINT) AS fp
                FROM h, UNNEST(list_transform(
                    range(0, greatest(len(hs) - 6 + 1, 0)),
                    p -> list_min(hs[p+1:p+6]))) AS u(f)
            ), keep AS (
                SELECT fp FROM fps GROUP BY fp HAVING count(*) <= 25
            ), pruned AS (
                SELECT doc_id, fp FROM fps JOIN keep USING (fp)
            ), pairs AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                       count(*) AS shared_fps
                FROM pruned a JOIN pruned b
                  ON a.fp = b.fp AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            )
            SELECT id_a, id_b, shared_fps, rank FROM (
                SELECT pairs.*, CAST(row_number() OVER (
                    ORDER BY shared_fps DESC, id_a ASC, id_b ASC)
                    AS INTEGER) AS rank
                FROM pairs) WHERE rank <= 100
        """,
        "tfidf_keywords_docs": """
            WITH toks AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(
                           regexp_replace(lower(text),
                                          '[^a-z0-9 ]', ' ', 'g'),
                           ' +'), t -> t != '') AS tk
                FROM documents
            ), tf AS (
                SELECT doc_id, u.t AS term, count(*) AS tf
                FROM toks, unnest(tk) AS u(t)
                GROUP BY 1, 2
            ), dft AS (
                SELECT term, count(*) AS dfc FROM tf GROUP BY 1
            ), n AS (
                -- N = tokenized docs, derived from tf (mirrors the
                -- Spark side's lazy single-scan N)
                SELECT count(DISTINCT doc_id) AS n FROM tf
            ), s AS (
                SELECT tf.doc_id, tf.term,
                       tf.tf * CAST(floor(1e6 * ln(
                           CAST(n.n + 1 AS DOUBLE)
                           / CAST(dft.dfc + 1 AS DOUBLE)))
                           AS BIGINT) AS score_micro
                FROM tf JOIN dft USING (term), n
            )
            SELECT doc_id, term, score_micro, rank FROM (
                SELECT s.*, CAST(row_number() OVER (
                    PARTITION BY doc_id
                    ORDER BY score_micro DESC, term ASC) AS INTEGER)
                    AS rank
                FROM s) WHERE rank <= 3
        """,
        "corr_matrix_lineitem": """
            SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b,
                   count(CASE WHEN l_quantity IS NOT NULL
                              AND l_extendedprice IS NOT NULL THEN 1 END) AS n,
                   ROUND(corr(l_quantity, l_extendedprice), 4) + 0 AS corr
            FROM lineitem
            UNION ALL
            SELECT 'l_quantity' AS col_a, 'l_discount' AS col_b,
                   count(CASE WHEN l_quantity IS NOT NULL
                              AND l_discount IS NOT NULL THEN 1 END) AS n,
                   ROUND(corr(l_quantity, l_discount), 4) + 0 AS corr
            FROM lineitem
            UNION ALL
            SELECT 'l_quantity' AS col_a, 'l_tax' AS col_b,
                   count(CASE WHEN l_quantity IS NOT NULL
                              AND l_tax IS NOT NULL THEN 1 END) AS n,
                   ROUND(corr(l_quantity, l_tax), 4) + 0 AS corr
            FROM lineitem
            UNION ALL
            SELECT 'l_extendedprice' AS col_a, 'l_discount' AS col_b,
                   count(CASE WHEN l_extendedprice IS NOT NULL
                              AND l_discount IS NOT NULL THEN 1 END) AS n,
                   ROUND(corr(l_extendedprice, l_discount), 4) + 0 AS corr
            FROM lineitem
            UNION ALL
            SELECT 'l_extendedprice' AS col_a, 'l_tax' AS col_b,
                   count(CASE WHEN l_extendedprice IS NOT NULL
                              AND l_tax IS NOT NULL THEN 1 END) AS n,
                   ROUND(corr(l_extendedprice, l_tax), 4) + 0 AS corr
            FROM lineitem
            UNION ALL
            SELECT 'l_discount' AS col_a, 'l_tax' AS col_b,
                   count(CASE WHEN l_discount IS NOT NULL
                              AND l_tax IS NOT NULL THEN 1 END) AS n,
                   ROUND(corr(l_discount, l_tax), 4) + 0 AS corr
            FROM lineitem
        """,
        "group_quantiles_events": """
            SELECT event_type, q, ROUND(val, 4) + 0 AS value
            FROM (
                SELECT event_type,
                       unnest([0.25, 0.5, 0.75, 0.95]) AS q,
                       unnest(quantile_cont(value,
                           [0.25, 0.5, 0.75, 0.95])) AS val
                FROM events GROUP BY event_type)
        """,
        "mutual_info_docs": """
            WITH j AS (
                SELECT lang AS x_, source AS y_, count(*) AS nxy
                FROM documents
                WHERE lang IS NOT NULL AND source IS NOT NULL
                GROUP BY 1, 2
            ), m AS (
                SELECT nxy,
                       sum(nxy) OVER (PARTITION BY x_) AS nx,
                       sum(nxy) OVER (PARTITION BY y_) AS ny,
                       sum(nxy) OVER () AS n
                FROM j
            )
            SELECT CAST(max(n) AS BIGINT) AS n,
                   ROUND(sum(CAST(nxy AS DOUBLE) / n
                             * ln(CAST(nxy AS DOUBLE) * n
                                  / (CAST(nx AS DOUBLE) * ny))),
                         4) + 0 AS mi_nats,
                   ROUND(-sum(CAST(nxy AS DOUBLE) / n
                              * ln(CAST(nx AS DOUBLE) / n)),
                         4) + 0 AS h_x,
                   ROUND(-sum(CAST(nxy AS DOUBLE) / n
                              * ln(CAST(ny AS DOUBLE) / n)),
                         4) + 0 AS h_y
            FROM m
        """,
        "rolling_avg_events": """
            SELECT event_id,
                   ROUND(avg(value) OVER w, 4) + 0 AS roll_avg,
                   count(value) OVER w AS roll_count,
                   ROUND(sum(value) OVER w, 4) + 0 AS roll_sum
            FROM events WHERE event_type = 'click'
            WINDOW w AS (PARTITION BY user_id ORDER BY ts
                         RANGE BETWEEN INTERVAL 15 MINUTES PRECEDING
                         AND CURRENT ROW)
        """,
        "state_intervals_events": """
            WITH o AS (
                SELECT user_id, event_type, ts, event_id,
                       CASE WHEN lag(event_type) OVER w
                                 IS NOT DISTINCT FROM event_type
                            THEN 0 ELSE 1 END AS chg
                FROM events
                WINDOW w AS (PARTITION BY user_id
                             ORDER BY ts, event_id)
            ), r AS (
                SELECT user_id, event_type, ts, event_id,
                       sum(chg) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING)
                           AS island
                FROM o
            ), iv AS (
                SELECT user_id, island,
                       min(event_type) AS state,
                       min(ts) AS valid_from,
                       count(*) AS n_obs
                FROM r GROUP BY 1, 2
            )
            SELECT user_id, state, valid_from,
                   lead(valid_from) OVER (PARTITION BY user_id
                                          ORDER BY island)
                       AS valid_to,
                   n_obs
            FROM iv
        """,
        "spearman_corr_lineitem": """
            WITH base AS (
                SELECT l_quantity, l_extendedprice, l_discount
                FROM lineitem
                WHERE l_quantity IS NOT NULL
                  AND l_extendedprice IS NOT NULL
                  AND l_discount IS NOT NULL
            ), r AS (
                SELECT rank() OVER (ORDER BY l_quantity) + (count(*) OVER (PARTITION BY l_quantity) - 1) / 2.0 AS rq,
                       rank() OVER (ORDER BY l_extendedprice) + (count(*) OVER (PARTITION BY l_extendedprice) - 1) / 2.0 AS rp,
                       rank() OVER (ORDER BY l_discount) + (count(*) OVER (PARTITION BY l_discount) - 1) / 2.0 AS rd
                FROM base
            )
            SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b,
                   count(*) AS n,
                   ROUND(corr(rq, rp), 4) + 0 AS rho
            FROM r
            UNION ALL
            SELECT 'l_quantity' AS col_a, 'l_discount' AS col_b,
                   count(*) AS n,
                   ROUND(corr(rq, rd), 4) + 0 AS rho
            FROM r
            UNION ALL
            SELECT 'l_extendedprice' AS col_a, 'l_discount' AS col_b,
                   count(*) AS n,
                   ROUND(corr(rp, rd), 4) + 0 AS rho
            FROM r
        """,
        "ks_test_events": """
            WITH s AS (
                SELECT value AS v,
                       count(*) FILTER (event_type = 'click') AS ca,
                       count(*) FILTER (event_type = 'view') AS cb
                FROM events
                WHERE value IS NOT NULL
                  AND event_type IN ('click', 'view')
                GROUP BY 1
            ), c AS (
                SELECT sum(ca) OVER (ORDER BY v) AS cum_a,
                       sum(cb) OVER (ORDER BY v) AS cum_b,
                       sum(ca) OVER () AS na, sum(cb) OVER () AS nb
                FROM s
            ), d AS (
                SELECT max(abs(cum_a / na - cum_b / nb)) AS dd,
                       max(na) AS na, max(nb) AS nb
                FROM c
            ), lam AS (
                SELECT dd, na, nb,
                       dd * sqrt(CAST(na AS DOUBLE) * nb
                                 / (na + nb)) AS l
                FROM d
            )
            -- lambda < 0.2: truncated-series branch is invalid but
            -- true p = 1 to 5e-13 (mirrors the Spark operator)
            SELECT CAST(na AS BIGINT) AS n_a,
                   CAST(nb AS BIGINT) AS n_b,
                   ROUND(dd, 4) + 0 AS d_stat,
                   ROUND(CASE WHEN l < 0.2 THEN 1.0 ELSE
                       least(1.0, greatest(0.0,
                       2 * (SELECT sum(
                            CASE WHEN j % 2 = 1 THEN 1.0
                                 ELSE -1.0 END
                            * exp(-2.0 * j * j * l * l))
                            FROM range(1, 101) t(j)))) END, 4) + 0
                       AS p_value
            FROM lam
        """,
        "chi2_docs": """
            WITH j AS (
                SELECT lang AS x_, source AS y_, count(*) AS nxy
                FROM documents
                WHERE lang IS NOT NULL AND source IS NOT NULL
                GROUP BY 1, 2
            ), m AS (
                SELECT nxy,
                       sum(nxy) OVER (PARTITION BY x_) AS nx,
                       sum(nxy) OVER (PARTITION BY y_) AS ny,
                       sum(nxy) OVER () AS n,
                       count(DISTINCT x_) OVER () AS kx,
                       count(DISTINCT y_) OVER () AS ky
                FROM j
            )
            SELECT CAST(max(n) AS BIGINT) AS n,
                   CAST((max(kx) - 1) * (max(ky) - 1) AS BIGINT)
                       AS dof,
                   ROUND(sum((nxy - CAST(nx AS DOUBLE) * ny / n)
                             * (nxy - CAST(nx AS DOUBLE) * ny / n)
                             / (CAST(nx AS DOUBLE) * ny / n)),
                         4) + 0 AS chi2,
                   CASE WHEN least(max(kx) - 1, max(ky) - 1) >= 1
                   THEN ROUND(sqrt(
                       sum((nxy - CAST(nx AS DOUBLE) * ny / n)
                           * (nxy - CAST(nx AS DOUBLE) * ny / n)
                           / (CAST(nx AS DOUBLE) * ny / n))
                       / (CAST(max(n) AS DOUBLE)
                          * least(max(kx) - 1, max(ky) - 1))),
                       4) + 0
                   END AS cramers_v
            FROM m
        """,
        "equidepth_hist_events": """
            WITH e AS (
                SELECT quantile_cont(value,
                    [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9])
                    AS ed
                FROM events WHERE value IS NOT NULL
            )
            SELECT CAST(len(list_filter(ed, x -> value > x))
                        AS INTEGER) AS bin,
                   ROUND(min(value), 4) + 0 AS lo,
                   ROUND(max(value), 4) + 0 AS hi,
                   count(*) AS n_rows
            FROM events CROSS JOIN e
            WHERE value IS NOT NULL
            GROUP BY 1
        """,
        "heavy_hitters_docs": """
            WITH t AS (
                SELECT unnest(string_split_regex(lower(text),
                    '[^a-z0-9]+')) AS tok
                FROM documents
            ), f AS (
                SELECT tok, count(*) AS cnt FROM t
                WHERE tok <> '' GROUP BY 1
            ), n AS (SELECT sum(cnt) AS n FROM f)
            SELECT tok AS token, cnt,
                   ROUND(cnt / CAST(n.n AS DOUBLE), 6) + 0 AS share
            FROM f, n
            WHERE cnt > CAST(0.01 AS DOUBLE) * n.n
        """,
        "markov_events": """
            WITH p AS (
                SELECT event_type AS state,
                       lead(event_type) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) AS next_state
                FROM events
            )
            SELECT state, next_state, count(*) AS n,
                   ROUND(count(*) / CAST(sum(count(*)) OVER
                       (PARTITION BY state) AS DOUBLE), 4) + 0 AS p
            FROM p
            WHERE state IS NOT NULL AND next_state IS NOT NULL
            GROUP BY 1, 2
        """,
        "outliers_mad_events": """
            WITH s AS (
                SELECT event_type, median(value) AS med,
                       mad(value) AS mad
                FROM events WHERE value IS NOT NULL
                GROUP BY 1
            )
            SELECT e.event_id, e.event_type,
                   ROUND(e.value, 4) + 0 AS value
            FROM events e JOIN s
              ON e.event_type IS NOT DISTINCT FROM s.event_type
            WHERE e.value IS NOT NULL AND s.mad > 0
              AND abs(e.value - s.med) > 3.0 * 1.4826 * s.mad
        """,
        "benford_orders": """
            WITH o AS (
                SELECT CAST(floor(o_totalprice
                    / power(10, floor(log10(o_totalprice))))
                    AS INT) AS digit
                FROM orders
                WHERE o_totalprice IS NOT NULL AND o_totalprice > 0
            ), g AS (
                SELECT digit, count(*) AS n_obs FROM o GROUP BY 1
            ), w AS (
                SELECT digit, n_obs, sum(n_obs) OVER () AS tot
                FROM g
            )
            SELECT digit, n_obs,
                   ROUND(n_obs / CAST(tot AS DOUBLE), 6) + 0
                       AS share,
                   ROUND(log10(1.0 + 1.0 / digit), 6) + 0
                       AS benford_share,
                   ROUND(CAST(tot AS DOUBLE)
                         * (n_obs / CAST(tot AS DOUBLE)
                            - log10(1.0 + 1.0 / digit))
                         * (n_obs / CAST(tot AS DOUBLE)
                            - log10(1.0 + 1.0 / digit))
                         / log10(1.0 + 1.0 / digit), 4) + 0
                       AS chi2_term
            FROM w
        """,
        "acf_events": """
            WITH l AS (
                SELECT value AS x,
                       lag(value, 1) OVER w AS y1,
                       lag(value, 2) OVER w AS y2,
                       lag(value, 3) OVER w AS y3,
                       lag(value, 4) OVER w AS y4,
                       lag(value, 5) OVER w AS y5
                FROM events
                WINDOW w AS (PARTITION BY user_id
                             ORDER BY ts, event_id)
            )
            SELECT 0 AS lag,
                   count(CASE WHEN x IS NOT NULL THEN 1 END) AS n,
                   ROUND(corr(x, x), 4) + 0 AS ccf FROM l
            UNION ALL SELECT 1,
                   count(CASE WHEN x IS NOT NULL
                              AND y1 IS NOT NULL THEN 1 END),
                   ROUND(corr(y1, x), 4) + 0 FROM l
            UNION ALL SELECT 2,
                   count(CASE WHEN x IS NOT NULL
                              AND y2 IS NOT NULL THEN 1 END),
                   ROUND(corr(y2, x), 4) + 0 FROM l
            UNION ALL SELECT 3,
                   count(CASE WHEN x IS NOT NULL
                              AND y3 IS NOT NULL THEN 1 END),
                   ROUND(corr(y3, x), 4) + 0 FROM l
            UNION ALL SELECT 4,
                   count(CASE WHEN x IS NOT NULL
                              AND y4 IS NOT NULL THEN 1 END),
                   ROUND(corr(y4, x), 4) + 0 FROM l
            UNION ALL SELECT 5,
                   count(CASE WHEN x IS NOT NULL
                              AND y5 IS NOT NULL THEN 1 END),
                   ROUND(corr(y5, x), 4) + 0 FROM l
        """,
        "gini_orders": """
            WITH r AS (
                SELECT o_totalprice AS x,
                       rank() OVER (ORDER BY o_totalprice)
                       + (count(*) OVER
                          (PARTITION BY o_totalprice) - 1) / 2.0
                           AS ar
                FROM orders WHERE o_totalprice IS NOT NULL
            )
            SELECT count(*) AS n,
                   ROUND(avg(x), 4) + 0 AS mean,
                   ROUND(2 * sum(ar * x) / (count(*) * sum(x))
                         - (count(*) + 1.0) / count(*), 6) + 0
                       AS gini,
                   ROUND(sum(CASE WHEN x > 0 THEN x * ln(x)
                                  ELSE 0 END)
                         / (count(*) * avg(x)) - ln(avg(x)), 6) + 0
                       AS theil
            FROM r
        """,
        "q7_volume_shipping": """
            SELECT n1.n_name AS supp_nation,
                   n2.n_name AS cust_nation,
                   CAST(year(l_shipdate) AS INT) AS l_year,
                   ROUND(sum(l_extendedprice * (1 - l_discount)),
                         4) + 0 AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE l_shipdate BETWEEN '1996-01-01' AND '1997-12-31'
              AND ((n1.n_name = 'NATION_1'
                    AND n2.n_name = 'NATION_2')
                   OR (n1.n_name = 'NATION_2'
                       AND n2.n_name = 'NATION_1'))
            GROUP BY 1, 2, 3
        """,
        "q8_market_share": """
            WITH base AS (
                SELECT year(o_orderdate) AS o_year,
                       l_extendedprice * (1 - l_discount)
                           AS volume,
                       n1.n_name AS supp_nation
                FROM lineitem
                JOIN part ON l_partkey = p_partkey
                JOIN orders ON l_orderkey = o_orderkey
                JOIN customer ON o_custkey = c_custkey
                JOIN nation n2 ON c_nationkey = n2.n_nationkey
                JOIN region ON n2.n_regionkey = r_regionkey
                JOIN supplier ON l_suppkey = s_suppkey
                JOIN nation n1 ON s_nationkey = n1.n_nationkey
                WHERE p_type = 'PROMO' AND r_name = 'ASIA'
                  AND o_orderdate BETWEEN '1996-01-01'
                      AND '1997-12-31'
            )
            SELECT CAST(o_year AS INT) AS o_year,
                   ROUND(sum(CASE WHEN supp_nation = 'NATION_5'
                                  THEN volume ELSE 0 END)
                         / sum(volume), 6) + 0 AS mkt_share
            FROM base GROUP BY 1
        """,
        "q10_returned_items": """
            SELECT c_custkey, c_name, n_name,
                   ROUND(sum(l_extendedprice * (1 - l_discount)),
                         4) + 0 AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            WHERE l_returnflag = 'R'
              AND o_orderdate BETWEEN '1995-10-01'
                  AND '1995-12-31'
            GROUP BY 1, 2, 3
            ORDER BY sum(l_extendedprice * (1 - l_discount)) DESC,
                     c_custkey
            LIMIT 20
        """,
        "q13_customer_distribution": """
            WITH per AS (
                SELECT c.c_custkey,
                       count(o.o_orderkey) AS c_count
                FROM customer c LEFT JOIN orders o
                  ON c.c_custkey = o.o_custkey
                GROUP BY 1
            )
            SELECT c_count, count(*) AS custdist
            FROM per GROUP BY 1
            ORDER BY custdist DESC, c_count DESC
        """,
        "q15_top_supplier": """
            WITH rev AS (
                SELECT l_suppkey AS supplier_no,
                       sum(l_extendedprice * (1 - l_discount))
                           AS total_revenue
                FROM lineitem
                WHERE l_shipdate BETWEEN '1996-01-01'
                    AND '1996-03-31'
                GROUP BY 1
            )
            SELECT s_suppkey, s_name,
                   ROUND(total_revenue, 4) + 0 AS total_revenue
            FROM rev JOIN supplier ON supplier_no = s_suppkey
            WHERE total_revenue = (SELECT max(total_revenue)
                                   FROM rev)
        """,
        "q2_min_cost_supplier": """
            WITH offers AS (
                SELECT l_partkey, l_suppkey,
                       min(l_extendedprice / l_quantity)
                           AS unit_cost
                FROM lineitem WHERE l_quantity > 0
                GROUP BY 1, 2
            ), oe AS (
                SELECT o.*, s_acctbal, s_name, n_name
                FROM offers o
                JOIN supplier ON l_suppkey = s_suppkey
                JOIN nation ON s_nationkey = n_nationkey
                JOIN region ON n_regionkey = r_regionkey
                JOIN part ON l_partkey = p_partkey
                WHERE r_name = 'EUROPE' AND p_type = 'LARGE'
                  AND p_size <= 10
            )
            SELECT s_acctbal, s_name, n_name,
                   l_partkey AS p_partkey, unit_cost + 0 AS unit_cost
            FROM oe
            WHERE unit_cost = (SELECT min(unit_cost) FROM oe i
                               WHERE i.l_partkey = oe.l_partkey)
        """,
        "q9_product_profit": """
            SELECT n_name AS nation,
                   CAST(year(l_shipdate) AS INT) AS o_year,
                   ROUND(sum(l_extendedprice * (1 - l_discount)
                             - 0.6 * p_retailprice * l_quantity),
                         4) + 0 AS sum_profit
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE p_name LIKE '%red%'
            GROUP BY 1, 2
        """,
        "q11_important_parts": """
            WITH val AS (
                SELECT l_partkey, sum(l_extendedprice
                                      * (1 - l_discount)) AS value
                FROM lineitem
                JOIN supplier ON l_suppkey = s_suppkey
                JOIN nation ON s_nationkey = n_nationkey
                WHERE n_name = 'NATION_3'
                GROUP BY 1
            )
            SELECT l_partkey AS p_partkey,
                   ROUND(value, 4) + 0 AS value
            FROM val
            WHERE value > (SELECT avg(value) * 2 FROM val)
        """,
        "q12_late_shipments": """
            SELECT l_linestatus,
                   sum(CASE WHEN o_orderpriority IN
                            ('1-URGENT', '2-HIGH') THEN 1
                            ELSE 0 END) AS high_line_count,
                   sum(CASE WHEN o_orderpriority IN
                            ('1-URGENT', '2-HIGH') THEN 0
                            ELSE 1 END) AS low_line_count
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE l_shipdate BETWEEN '1996-01-01' AND '1997-12-31'
              AND l_shipdate > o_orderdate + INTERVAL 90 DAY
            GROUP BY 1
        """,
        "q16_supplier_part_counts": """
            SELECT p_brand, p_type, p_size,
                   count(DISTINCT l_suppkey) AS supplier_cnt
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_brand <> 'Brand#3' AND p_type <> 'PROMO'
              AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
              AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                    WHERE s_name LIKE '%7')
            GROUP BY 1, 2, 3
        """,
        "q17_small_qty_revenue": """
            SELECT ROUND(sum(l_extendedprice) / 7.0, 4) + 0
                       AS avg_yearly
            FROM lineitem l JOIN part ON l_partkey = p_partkey
            WHERE p_brand = 'Brand#23' AND p_type = 'MEDIUM'
              AND l_quantity < (SELECT 0.2 * avg(l_quantity)
                                FROM lineitem i
                                WHERE i.l_partkey = l.l_partkey)
        """,
        "q20_promo_suppliers": """
            SELECT s_suppkey, s_name, n_name
            FROM supplier JOIN nation ON s_nationkey = n_nationkey
            WHERE s_suppkey IN (
                SELECT l_suppkey FROM lineitem
                WHERE l_partkey IN (SELECT p_partkey FROM part
                                    WHERE p_type = 'PROMO')
                  AND l_shipdate BETWEEN '1996-01-01'
                      AND '1996-12-31'
                GROUP BY l_suppkey, l_partkey
                HAVING sum(l_quantity) > 50
            )
        """,
        "q21_waiting_suppliers": """
            WITH w AS (
                SELECT DISTINCT l1.l_orderkey, l1.l_suppkey
                FROM lineitem l1
                JOIN orders ON l1.l_orderkey = o_orderkey
                WHERE o_orderstatus = 'F'
                  AND l1.l_returnflag = 'R'
                  AND EXISTS (SELECT 1 FROM lineitem l2
                              WHERE l2.l_orderkey = l1.l_orderkey
                                AND l2.l_suppkey <> l1.l_suppkey)
                  AND NOT EXISTS (
                      SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
            )
            SELECT s_name, count(*) AS numwait
            FROM w JOIN supplier ON l_suppkey = s_suppkey
            GROUP BY 1
        """,
        "q22_dormant_customers": """
            SELECT c_nationkey AS cntrycode,
                   count(*) AS numcust,
                   ROUND(sum(c_acctbal), 4) + 0 AS totacctbal
            FROM customer c
            WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
                               WHERE c_acctbal > 0)
              AND NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey
                                AND o.o_orderdate >= '2000-01-01')
            GROUP BY 1
        """,
        "cusum_events": """
            WITH c AS (
                SELECT ts AS t, sum(value) AS x, count(*) AS nn
                FROM events
                WHERE ts IS NOT NULL AND value IS NOT NULL
                GROUP BY 1
            ), m AS (
                SELECT sum(x) AS sx, sum(nn) AS sn FROM c
            ), w AS (
                SELECT t, sum(x) OVER (ORDER BY t) AS cx,
                       sum(nn) OVER (ORDER BY t) AS cn
                FROM c
            ), s AS (
                SELECT t, cn,
                       cx - (SELECT sx / sn FROM m) * cn AS s
                FROM w
            )
            SELECT (SELECT sn FROM m) AS n,
                   ROUND((SELECT sx / sn FROM m), 4) + 0 AS mean,
                   cn AS cp_index, t AS cp_at,
                   ROUND(s, 4) + 0 AS cusum,
                   ROUND(abs(s), 4) + 0 AS cusum_abs
            FROM s ORDER BY abs(s) DESC, cn LIMIT 1
        """,
        "expectations_orders": """
            WITH agg AS (
                SELECT count(*) AS n,
                       sum(CASE WHEN o_custkey IS NULL
                           THEN 1 ELSE 0 END) AS v1,
                       sum(CASE WHEN o_totalprice IS NOT NULL
                                AND o_totalprice NOT BETWEEN
                                    0.0 AND 1000000.0
                           THEN 1 ELSE 0 END) AS v2,
                       sum(CASE WHEN o_orderstatus IS NOT NULL
                                AND o_orderstatus NOT IN
                                    ('F', 'O', 'P')
                           THEN 1 ELSE 0 END) AS v3,
                       sum(CASE WHEN o_orderpriority IS NOT NULL
                                AND NOT regexp_matches(
                                    o_orderpriority, '^[1-5]-')
                           THEN 1 ELSE 0 END) AS v4,
                       count(o_orderkey)
                           - count(DISTINCT o_orderkey) AS v5,
                       sum(CASE WHEN o_totalprice IS NOT NULL
                                AND o_totalprice < 0.01
                           THEN 1 ELSE 0 END) AS v6
                FROM orders
            )
            SELECT r.rule, r.col AS column, agg.n AS n_rows,
                   CASE r.rule
                       WHEN 'custkey_not_null' THEN v1
                       WHEN 'totalprice_range' THEN v2
                       WHEN 'status_in_set' THEN v3
                       WHEN 'priority_pattern' THEN v4
                       WHEN 'orderkey_unique' THEN v5
                       ELSE v6 END AS violations,
                   CASE WHEN agg.n > 0 THEN
                       CAST(agg.n - (CASE r.rule
                           WHEN 'custkey_not_null' THEN v1
                           WHEN 'totalprice_range' THEN v2
                           WHEN 'status_in_set' THEN v3
                           WHEN 'priority_pattern' THEN v4
                           WHEN 'orderkey_unique' THEN v5
                           ELSE v6 END) AS DOUBLE) / agg.n
                   END AS pass_rate
            FROM agg, (VALUES
                ('custkey_not_null', 'o_custkey'),
                ('totalprice_range', 'o_totalprice'),
                ('status_in_set', 'o_orderstatus'),
                ('priority_pattern', 'o_orderpriority'),
                ('orderkey_unique', 'o_orderkey'),
                ('price_positive', 'o_totalprice'))
                AS r(rule, col)
        """,
        "feature_scale_lineitem": """
            WITH st AS (
                SELECT quantile_cont(l_quantity, 0.5) AS mq,
                       quantile_cont(l_quantity, 0.75)
                           - quantile_cont(l_quantity, 0.25) AS sq,
                       quantile_cont(l_extendedprice, 0.5) AS mp,
                       quantile_cont(l_extendedprice, 0.75)
                           - quantile_cont(l_extendedprice, 0.25)
                           AS sp
                FROM lineitem
            )
            SELECT l_orderkey, l_linenumber,
                   CASE WHEN sq > 0
                        THEN (l_quantity - mq) / sq END
                       AS l_quantity_scaled,
                   CASE WHEN sp > 0
                        THEN (l_extendedprice - mp) / sp END
                       AS l_extendedprice_scaled
            FROM lineitem, st
        """,
        "weighted_quantiles_lineitem": """
            WITH c AS (
                SELECT l_extendedprice AS v,
                       sum(l_quantity) AS w
                FROM lineitem
                WHERE l_extendedprice IS NOT NULL
                  AND l_quantity IS NOT NULL AND l_quantity > 0
                GROUP BY 1
            ), w2 AS (
                SELECT v, sum(w) OVER (ORDER BY v) AS cw FROM c
            ), t AS (SELECT sum(w) AS tw FROM c)
            SELECT q.q, min(v) AS value
            FROM w2, t,
                 (VALUES (0.25), (0.5), (0.75), (0.95)) q(q)
            WHERE cw >= q.q * t.tw
            GROUP BY 1
        """,
        "seasonal_anomalies_events": """
            WITH m AS (
                SELECT hour(ts) AS p, count(*) AS n,
                       sum(value) AS s,
                       sum(value * value) AS ssq
                FROM events
                WHERE ts IS NOT NULL AND value IS NOT NULL
                GROUP BY 1
            ), g AS (
                SELECT sum(ssq - s * s / n) / sum(n) AS varr FROM m
            )
            SELECT event_id, value,
                   ROUND(s / n, 4) + 0 AS expected,
                   ROUND((value - s / n) / sqrt(varr), 4) + 0 AS z
            FROM events e JOIN m ON hour(e.ts) = m.p, g
            WHERE abs(value - s / n) > 3 * sqrt(varr)
        """,
        "winsorize_lineitem": """
            WITH st AS (
                SELECT quantile_cont(l_extendedprice, 0.01) AS lo,
                       quantile_cont(l_extendedprice, 0.99) AS hi
                FROM lineitem
            )
            SELECT l_orderkey, l_linenumber,
                   CASE WHEN l_extendedprice IS NOT NULL THEN
                       least(greatest(l_extendedprice, lo), hi)
                   END AS l_extendedprice_wins
            FROM lineitem, st
        """,
        "zipf_alpha_docs": """
            WITH c AS (
                SELECT tok, count(*) AS f
                FROM (SELECT UNNEST(string_split_regex(
                          LOWER(TRIM(text)), '\\s+')) AS tok
                      FROM documents)
                WHERE tok <> ''
                GROUP BY 1
            )
            SELECT count(*) AS n_tail, 5 AS fmin,
                   max(f) AS f_max,
                   ROUND(1 + count(*)
                         / sum(ln(CAST(f AS DOUBLE) / 4.5)), 6) + 0
                       AS alpha
            FROM c WHERE f >= 5
        """,
        "bigram_lm_docs": """
            WITH d AS (
                SELECT doc_id,
                       list_filter(string_split_regex(
                           lower(trim(text)), '\\s+'),
                           t -> t <> '') AS toks
                FROM documents
            ), big AS (
                SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
                FROM d, UNNEST(generate_series(1, len(toks) - 1))
                     AS g(i)
                WHERE len(toks) >= 2
            ), bg AS (
                SELECT w1, w2, count(*) AS cbg FROM big GROUP BY 1, 2
            ), uni AS (
                SELECT w, count(*) AS cu FROM (
                    SELECT UNNEST(list_filter(string_split_regex(
                        lower(trim(text)), '\\s+'),
                        t -> t <> '')) AS w
                    FROM documents) GROUP BY 1
            ), v AS (SELECT count(*) AS vv FROM uni)
            SELECT big.doc_id, count(*) AS n_bigrams,
                   ROUND(avg(ln((cbg + 0.5) / (cu + 0.5 * vv))), 4)
                       + 0 AS avg_logprob
            FROM big JOIN bg USING (w1, w2)
            JOIN uni ON big.w1 = uni.w, v
            GROUP BY 1
        """,
        "stream_zscore_events": """
            WITH w AS (
                SELECT user_id, event_id, value AS v,
                       count(value) OVER pre AS np,
                       avg(value) OVER pre AS m,
                       stddev_pop(value) OVER pre AS sd
                FROM events
                WHERE value IS NOT NULL
                WINDOW pre AS (PARTITION BY user_id
                               ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING)
            )
            SELECT user_id, event_id, np AS n_prior,
                   ROUND(CASE WHEN np >= 2 AND sd > 0
                              THEN (v - m) / sd END, 4) + 0 AS z
            FROM w
        """,
        "isotonic_calibration_events": """
            WITH cens AS (
                SELECT least(CAST(floor(least(value / 500.0, 1.0)
                                        * 20) AS INT), 19) AS bin,
                       count(*) AS n,
                       sum(CASE WHEN event_type = 'purchase'
                           THEN 1 ELSE 0 END) AS pos
                FROM events
                WHERE value IS NOT NULL
                  AND least(value / 500.0, 1.0) >= 0
                GROUP BY 1
            ), cum AS (
                SELECT bin, n, pos,
                       sum(n) OVER (ORDER BY bin) AS cn,
                       sum(pos) OVER (ORDER BY bin) AS cp
                FROM cens
            ), seg AS (
                SELECT l.bin AS k, h.bin AS j,
                       CAST(h.cp - (l.cp - l.pos) AS DOUBLE)
                           / (h.cn - (l.cn - l.n)) AS seg_mean
                FROM cum l JOIN cum h ON l.bin <= h.bin
            ), inn AS (
                SELECT i.bin AS i, s.k, min(seg_mean) AS mn
                FROM seg s JOIN cens i
                  ON s.k <= i.bin AND i.bin <= s.j
                GROUP BY 1, 2
            ), fit AS (
                SELECT i AS bin, max(mn) AS calibrated
                FROM inn GROUP BY 1
            )
            SELECT cens.bin, n, pos,
                   CAST(pos AS DOUBLE) / n AS rate, calibrated
            FROM cens JOIN fit USING (bin)
        """,
        "referential_audit_orders": """
            WITH a AS (
                SELECT 'orders_customer' AS relation,
                       count(*) AS n_rows,
                       count(o_custkey) AS n_nonnull_fk,
                       sum(CASE WHEN o_custkey IS NOT NULL
                                AND c_custkey IS NULL
                           THEN 1 ELSE 0 END) AS orphans
                FROM orders LEFT JOIN
                     (SELECT DISTINCT c_custkey FROM customer) c
                     ON o_custkey = c_custkey
            ), b AS (
                SELECT 'part_sold' AS relation,
                       count(*) AS n_rows,
                       count(p_partkey) AS n_nonnull_fk,
                       sum(CASE WHEN p_partkey IS NOT NULL
                                AND l_partkey IS NULL
                           THEN 1 ELSE 0 END) AS orphans
                FROM part LEFT JOIN
                     (SELECT DISTINCT l_partkey FROM lineitem) l
                     ON p_partkey = l_partkey
            )
            SELECT relation, n_rows, n_nonnull_fk, orphans,
                   CASE WHEN n_nonnull_fk > 0 THEN
                       CAST(n_nonnull_fk - orphans AS DOUBLE)
                           / n_nonnull_fk END AS ok_rate
            FROM (SELECT * FROM a UNION ALL SELECT * FROM b)
        """,
        "json_props_events": """
            SELECT event_type,
                   count(CAST(json_extract(props, '$.k')
                              AS BIGINT)) AS n,
                   sum(CAST(json_extract(props, '$.k')
                            AS BIGINT)) AS sum_k,
                   min(CAST(json_extract(props, '$.k')
                            AS BIGINT)) AS min_k,
                   max(CAST(json_extract(props, '$.k')
                            AS BIGINT)) AS max_k
            FROM events GROUP BY 1
        """,
        "ranking_metrics_docs": """
            WITH ranked AS (
                SELECT lang AS q, doc_id AS id,
                       CAST(source = 'web' AS DOUBLE) AS rel,
                       row_number() OVER (PARTITION BY lang
                           ORDER BY CAST(n_chars AS DOUBLE) DESC,
                                    doc_id ASC) AS pos,
                       row_number() OVER (PARTITION BY lang
                           ORDER BY CAST(source = 'web' AS DOUBLE)
                                    DESC, doc_id ASC) AS ipos
                FROM documents
                WHERE lang IS NOT NULL AND doc_id IS NOT NULL
                  AND n_chars IS NOT NULL AND source IS NOT NULL
            ), per_q AS (
                SELECT q,
                       sum(CASE WHEN pos <= 10
                           THEN rel / log2(pos + 1.0)
                           ELSE 0 END) AS dcg,
                       sum(CASE WHEN ipos <= 10
                           THEN rel / log2(ipos + 1.0)
                           ELSE 0 END) AS idcg,
                       max(CASE WHEN pos <= 10 AND rel > 0
                           THEN 1.0 / pos END) AS rr,
                       max(rel) AS maxrel
                FROM ranked GROUP BY 1
            )
            SELECT count(*) AS n_queries,
                   ROUND(avg(dcg / idcg), 6) + 0 AS ndcg,
                   ROUND(avg(coalesce(rr, 0.0)), 6) + 0 AS mrr
            FROM per_q WHERE maxrel > 0
        """,
        "logrank_events": """
            WITH base AS (
                SELECT value AS t,
                       (event_type <> 'error') AS obs,
                       CAST(user_id % 2 AS INT) AS grp
                FROM events
                WHERE value IS NOT NULL AND user_id IS NOT NULL
                  AND event_type IS NOT NULL
            ), cens AS (
                SELECT t,
                       count(*) FILTER (obs AND grp = 0) AS da,
                       count(*) FILTER (obs AND grp = 1) AS db,
                       count(*) FILTER (grp = 0) AS na,
                       count(*) FILTER (grp = 1) AS nb
                FROM base GROUP BY 1
            ), w AS (
                SELECT t, da, db,
                       (SELECT sum(na) FROM cens)
                           - sum(na) OVER (ORDER BY t) + na AS ra,
                       (SELECT sum(nb) FROM cens)
                           - sum(nb) OVER (ORDER BY t) + nb AS rb
                FROM cens
            ), ev AS (
                SELECT sum(da - CAST(ra AS DOUBLE) * (da + db)
                                / (ra + rb)) AS o_e,
                       sum(CASE WHEN ra + rb > 1 THEN
                           CAST(ra AS DOUBLE) * rb * (da + db)
                           * (ra + rb - da - db)
                           / (CAST(ra + rb AS DOUBLE)
                              * (ra + rb) * (ra + rb - 1))
                           ELSE 0 END) AS v
                FROM w WHERE da + db > 0
            )
            SELECT (SELECT sum(na) FROM cens) AS n_a,
                   (SELECT sum(nb) FROM cens) AS n_b,
                   ROUND(CASE WHEN v > 0 THEN o_e * o_e / v END, 4)
                       + 0 AS chi2
            FROM ev
        """,
        "psi_orders_drift": """
            WITH e AS (
                SELECT o_totalprice AS v FROM orders
                WHERE o_orderdate < '1998-01-01'
                  AND o_totalprice IS NOT NULL
            ), a AS (
                SELECT o_totalprice AS v FROM orders
                WHERE o_orderdate >= '1998-01-01'
                  AND o_totalprice IS NOT NULL
            ), ed AS (
                SELECT DISTINCT unnest(quantile_cont(v,
                    [0.1, 0.2, 0.3, 0.4, 0.5,
                     0.6, 0.7, 0.8, 0.9])) AS edge
                FROM e
            ), k AS (SELECT count(*) + 1 AS k FROM ed),
            ce AS (
                SELECT (SELECT count(*) FROM ed WHERE v >= edge)
                           AS bin, count(*) AS ne
                FROM e GROUP BY 1
            ), ca AS (
                SELECT (SELECT count(*) FROM ed WHERE v >= edge)
                           AS bin, count(*) AS na
                FROM a GROUP BY 1
            ), j AS (
                SELECT coalesce(ce.bin, ca.bin) AS bin, ne, na
                FROM ce FULL JOIN ca ON ce.bin = ca.bin
            ), tot AS (
                SELECT sum(ne) AS te, sum(na) AS ta FROM j
            )
            SELECT k.k AS bins, te AS n_expected, ta AS n_actual,
                   ROUND((SELECT sum(
                       ((coalesce(ne, 0) + 0.5) / (te + 0.5 * k.k)
                        - (coalesce(na, 0) + 0.5) / (ta + 0.5 * k.k))
                       * ln(((coalesce(ne, 0) + 0.5)
                             / (te + 0.5 * k.k))
                            / ((coalesce(na, 0) + 0.5)
                               / (ta + 0.5 * k.k)))) FROM j), 6)
                       + 0 AS psi
            FROM tot, k
        """,
        "gains_table_events": """
            WITH b AS (
                SELECT value / 500.0 AS s,
                       (event_type = 'purchase') AS y
                FROM events WHERE value IS NOT NULL
            ), ed AS (
                SELECT DISTINCT unnest(quantile_cont(s,
                    [0.1, 0.2, 0.3, 0.4, 0.5,
                     0.6, 0.7, 0.8, 0.9])) AS edge
                FROM b
            ), c AS (
                SELECT (SELECT count(*) FROM ed)
                       - (SELECT count(*) FROM ed WHERE s >= edge)
                           AS band,
                       count(*) AS n,
                       sum(CASE WHEN y THEN 1 ELSE 0 END) AS pos
                FROM b GROUP BY 1
            ), cum AS (
                SELECT band, n, pos,
                       sum(pos) OVER (ORDER BY band) AS cum_pos,
                       sum(n) OVER (ORDER BY band) AS cum_n
                FROM c
            ), tot AS (
                SELECT max(cum_pos) AS tp, max(cum_n) AS tn FROM cum
            )
            SELECT band, n, pos, cum_pos,
                   CASE WHEN tp > 0 THEN
                       CAST(cum_pos AS DOUBLE) / tp END
                       AS cum_capture,
                   CASE WHEN tp > 0 AND cum_n > 0 THEN
                       (CAST(cum_pos AS DOUBLE) / cum_n)
                       / (CAST(tp AS DOUBLE) / tn) END AS lift
            FROM cum, tot
        """,
        "group_cusum_events": """
            WITH c AS (
                SELECT event_type AS g, ts AS t,
                       sum(value) AS x, count(*) AS nn
                FROM events
                WHERE ts IS NOT NULL AND value IS NOT NULL
                  AND event_type IS NOT NULL
                GROUP BY 1, 2
            ), w AS (
                SELECT g, t,
                       sum(x) OVER (PARTITION BY g ORDER BY t)
                           AS cx,
                       sum(nn) OVER (PARTITION BY g ORDER BY t)
                           AS cn,
                       sum(x) OVER (PARTITION BY g) AS tx,
                       sum(nn) OVER (PARTITION BY g) AS tn
                FROM c
            ), s AS (
                SELECT g, t, cn, tn, tx,
                       cx - (tx / tn) * cn AS s
                FROM w
            ), r AS (
                SELECT g, t, cn, tn, tx, s,
                       row_number() OVER (PARTITION BY g
                           ORDER BY abs(s) DESC, cn ASC) AS rk
                FROM s
            )
            SELECT g AS event_type, tn AS n,
                   ROUND(tx / tn, 4) + 0 AS mean,
                   cn AS cp_index, t AS cp_at,
                   ROUND(s, 4) + 0 AS cusum,
                   ROUND(abs(s), 4) + 0 AS cusum_abs
            FROM r WHERE rk = 1
        """,
        "column_entropy_docs": """
            WITH cens AS (
                SELECT col, val, count(*) AS c
                FROM (
                    SELECT 'lang' AS col, CAST(lang AS VARCHAR)
                        AS val FROM documents
                    UNION ALL
                    SELECT 'source', CAST(source AS VARCHAR)
                    FROM documents
                ) WHERE val IS NOT NULL
                GROUP BY 1, 2
            ), per AS (
                SELECT col, sum(c) AS n, count(*) AS nd,
                       sum(c * ln(CAST(c AS DOUBLE))) AS clc
                FROM cens GROUP BY 1
            )
            SELECT col AS "column", n, nd AS n_distinct,
                   ROUND(ln(CAST(n AS DOUBLE)) - clc / n, 6) + 0
                       AS entropy,
                   ROUND(CASE WHEN nd > 1 THEN
                       (ln(CAST(n AS DOUBLE)) - clc / n)
                       / ln(CAST(nd AS DOUBLE)) END, 6) + 0
                       AS norm_entropy
            FROM per
        """,
        "pmi_collocations_docs": """
            WITH d AS (
                SELECT list_filter(string_split_regex(
                           lower(trim(text)), '\\s+'),
                           t -> t <> '') AS toks
                FROM documents
            ), big AS (
                SELECT toks[i] AS w1, toks[i + 1] AS w2
                FROM d, UNNEST(generate_series(1, len(toks) - 1))
                     AS g(i)
                WHERE len(toks) >= 2
            ), bg AS (
                SELECT w1, w2, count(*) AS pair_count
                FROM big GROUP BY 1, 2 HAVING count(*) >= 5
            ), uni AS (
                SELECT w, count(*) AS cu FROM (
                    SELECT UNNEST(list_filter(string_split_regex(
                        lower(trim(text)), '\\s+'),
                        t -> t <> '')) AS w
                    FROM documents) GROUP BY 1
            ), tot AS (SELECT sum(cu) AS n FROM uni)
            SELECT bg.w1, bg.w2, pair_count,
                   ROUND(ln(CAST(n AS DOUBLE) * pair_count
                            / (CAST(u1.cu AS DOUBLE) * u2.cu)), 6)
                       + 0 AS pmi
            FROM bg
            JOIN uni u1 ON bg.w1 = u1.w
            JOIN uni u2 ON bg.w2 = u2.w, tot
            ORDER BY ln(CAST(n AS DOUBLE) * pair_count
                        / (CAST(u1.cu AS DOUBLE) * u2.cu)) DESC,
                     bg.w1, bg.w2
            LIMIT 50
        """,
        "session_summary_events": """
            WITH o AS (
                SELECT user_id, ts, event_type, event_id,
                       CASE WHEN epoch_us(ts)
                                 - epoch_us(lag(ts) OVER w)
                                 IS NULL
                            OR epoch_us(ts)
                                 - epoch_us(lag(ts) OVER w)
                                 > 1800000000
                            THEN 1 ELSE 0 END AS ns
                FROM events
                WHERE user_id IS NOT NULL AND ts IS NOT NULL
                WINDOW w AS (PARTITION BY user_id
                             ORDER BY ts, event_id)
            ), s AS (
                SELECT user_id, ts, event_type, event_id,
                       sum(ns) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS sid
                FROM o
            ), per AS (
                SELECT user_id, sid, count(*) AS n,
                       arg_min(event_type,
                               strftime(ts, '%Y-%m-%d %H:%M:%S.%f')
                               || '|' || lpad(CAST(event_id
                                                   AS VARCHAR),
                                              12, '0')) AS entry,
                       epoch_us(max(ts)) - epoch_us(min(ts))
                           AS dur
                FROM s GROUP BY 1, 2
            )
            SELECT entry AS entry_type, count(*) AS n_sessions,
                   sum(CASE WHEN n = 1 THEN 1 ELSE 0 END)
                       AS bounces,
                   CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END)
                        AS DOUBLE) / count(*) AS bounce_rate,
                   CAST(sum(n) AS DOUBLE) / count(*) AS avg_events,
                   CAST(sum(dur) AS DOUBLE) / 1e6 / count(*)
                       AS avg_duration_s
            FROM per GROUP BY 1
        """,
        "association_rules_lineitem": """
            WITH base AS (
                SELECT DISTINCT l_orderkey AS bk, l_partkey AS it
                FROM lineitem
                WHERE l_orderkey IS NOT NULL
                  AND l_partkey IS NOT NULL
            ), supp AS (
                SELECT it, count(*) AS s FROM base GROUP BY 1
            ), nb AS (
                SELECT count(DISTINCT bk) AS n FROM base
            ), pairs AS (
                SELECT l.it AS a, r.it AS b, count(*) AS support
                FROM base l JOIN base r
                  ON l.bk = r.bk AND l.it <> r.it
                GROUP BY 1, 2 HAVING count(*) >= 3
            )
            SELECT a, b, support,
                   CAST(support AS DOUBLE) / sa.s AS confidence,
                   CAST(nb.n AS DOUBLE) * support
                       / (CAST(sa.s AS DOUBLE) * sb.s) AS lift
            FROM pairs
            JOIN supp sa ON pairs.a = sa.it
            JOIN supp sb ON pairs.b = sb.it, nb
            ORDER BY CAST(nb.n AS DOUBLE) * support
                     / (CAST(sa.s AS DOUBLE) * sb.s) DESC, a, b
            LIMIT 50
        """,
        "funnel_window_events": """
            WITH s0 AS (
                SELECT user_id, MIN(ts) AS t_view FROM events
                WHERE event_type = 'view' GROUP BY user_id
            ), s1 AS (
                SELECT e.user_id, MIN(ts) AS t_click
                FROM events e JOIN s0 USING (user_id)
                WHERE event_type = 'click' AND ts > t_view
                  AND epoch_us(ts) - epoch_us(t_view)
                      <= 3600000000
                GROUP BY e.user_id
            ), s2 AS (
                SELECT e.user_id, MIN(ts) AS t_purchase
                FROM events e JOIN s1 USING (user_id)
                WHERE event_type = 'purchase' AND ts > t_click
                  AND epoch_us(ts) - epoch_us(t_click)
                      <= 3600000000
                GROUP BY e.user_id
            )
            SELECT s0.user_id, t_view, t_click, t_purchase
            FROM s0 LEFT JOIN s1 USING (user_id)
                    LEFT JOIN s2 USING (user_id)
        """,
        "additive_seasonal_events": """
            WITH m AS (
                SELECT hour(ts) AS h, dayofweek(ts) AS d,
                       avg(value) AS mv
                FROM events
                WHERE ts IS NOT NULL AND value IS NOT NULL
                GROUP BY GROUPING SETS ((hour(ts)),
                                        (dayofweek(ts)), ())
            ), hm AS (
                SELECT h, mv AS hmean FROM m WHERE h IS NOT NULL
            ), dm AS (
                SELECT d, mv AS dmean FROM m
                WHERE d IS NOT NULL AND h IS NULL
            ), gm AS (
                SELECT mv AS grand FROM m
                WHERE h IS NULL AND d IS NULL
            ), j AS (
                SELECT event_id, value,
                       hmean + dmean - grand AS fit
                FROM events JOIN hm ON hour(ts) = h
                JOIN dm ON dayofweek(ts) = d, gm
                WHERE value IS NOT NULL
            ), s AS (
                SELECT *, (SELECT stddev_pop(value - fit) FROM j)
                           AS sd
                FROM j
            )
            SELECT event_id, value,
                   ROUND(fit, 4) + 0 AS expected,
                   ROUND((value - fit) / sd, 4) + 0 AS z
            FROM s WHERE abs(value - fit) > 3 * sd
        """,
        "interarrival_events": """
            WITH g AS (
                SELECT user_id,
                       CAST(epoch_us(ts)
                            - epoch_us(lag(ts) OVER (
                                PARTITION BY user_id
                                ORDER BY ts, event_id)) AS DOUBLE)
                           / 1e6 AS gap
                FROM events
                WHERE user_id IS NOT NULL AND ts IS NOT NULL
            )
            SELECT user_id, count(*) AS n_gaps,
                   ROUND(avg(gap), 4) + 0 AS mean_gap_s,
                   ROUND(stddev_pop(gap), 4) + 0 AS sd_gap_s,
                   ROUND(CASE WHEN avg(gap) > 0 THEN
                       stddev_pop(gap) / avg(gap) END, 6) + 0 AS cv,
                   ROUND(CASE WHEN stddev_pop(gap) + avg(gap) > 0
                       THEN (stddev_pop(gap) - avg(gap))
                            / (stddev_pop(gap) + avg(gap)) END, 6)
                       + 0 AS burstiness
            FROM g WHERE gap IS NOT NULL
            GROUP BY 1
        """,
        "bootstrap_ci_orders": """
            WITH rows_ AS (
                SELECT o_totalprice AS x, o_orderkey AS id, b.b
                FROM orders, (SELECT unnest(range(0, 100)) AS b) b
                WHERE o_totalprice IS NOT NULL
                  AND o_orderkey IS NOT NULL
            ), wtd AS (
                SELECT b, x,
                       CAST(CAST(('0x' || substr(md5(
                           CAST(id AS VARCHAR) || '_'
                           || CAST(b AS VARCHAR)), 1, 8))
                           AS BIGINT) AS DOUBLE) / 4294967296.0
                           AS u
                FROM rows_
            ), w AS (
                SELECT b, x,
                       CASE WHEN u < 0.36787944117144233 THEN 0
                            WHEN u < 0.7357588823428847 THEN 1
                            WHEN u < 0.9196986029286058 THEN 2
                            WHEN u < 0.9810118431238462 THEN 3
                            WHEN u < 0.9963401531726563 THEN 4
                            WHEN u < 0.9994058151824183 THEN 5
                            WHEN u < 0.9999167588507119 THEN 6
                            ELSE 7 END AS wgt
                FROM wtd
            ), per_b AS (
                SELECT b, sum(wgt * x) / sum(wgt) AS m
                FROM w GROUP BY 1
            ), ci AS (
                SELECT quantile_cont(m, 0.025) AS lo,
                       quantile_cont(m, 0.975) AS hi,
                       count(*) AS nb
                FROM per_b
            )
            SELECT (SELECT count(*) FROM orders
                    WHERE o_totalprice IS NOT NULL
                      AND o_orderkey IS NOT NULL) AS n,
                   ROUND((SELECT avg(o_totalprice) FROM orders
                          WHERE o_totalprice IS NOT NULL
                            AND o_orderkey IS NOT NULL), 4) + 0
                       AS estimate,
                   ROUND(lo, 4) + 0 AS lo,
                   ROUND(hi, 4) + 0 AS hi,
                   nb AS n_resamples
            FROM ci
        """,
        "active_users_events": """
            WITH pairs AS (
                SELECT DISTINCT user_id AS u,
                       date_trunc('day', ts) AS d
                FROM events
                WHERE ts IS NOT NULL AND user_id IS NOT NULL
            ), days AS (SELECT DISTINCT d AS day FROM pairs),
            expl AS (
                SELECT u, o.off,
                       d + to_days(CAST(o.off AS INT)) AS day
                FROM pairs, (SELECT unnest(range(0, 28)) AS off) o
            ), per AS (
                SELECT day,
                       count(DISTINCT CASE WHEN off < 1 THEN u END)
                           AS au_1,
                       count(DISTINCT CASE WHEN off < 7 THEN u END)
                           AS au_7,
                       count(DISTINCT CASE WHEN off < 28 THEN u END)
                           AS au_28
                FROM expl GROUP BY 1
            )
            SELECT days.day, au_1, au_7, au_28,
                   CAST(au_1 AS DOUBLE) / au_28 AS stickiness
            FROM days JOIN per ON days.day = per.day
        """,
        "category_index_orders": """
            WITH s AS (
                SELECT o_orderstatus AS v,
                       row_number() OVER (ORDER BY count(*) DESC,
                                          o_orderstatus) - 1 AS i
                FROM orders WHERE o_orderstatus IS NOT NULL
                GROUP BY 1
            ), p AS (
                SELECT o_orderpriority AS v,
                       row_number() OVER (ORDER BY count(*) DESC,
                                          o_orderpriority) - 1 AS i
                FROM orders WHERE o_orderpriority IS NOT NULL
                GROUP BY 1
            )
            SELECT o_orderstatus, s.i AS o_orderstatus_idx,
                   o_orderpriority, p.i AS o_orderpriority_idx,
                   count(*) AS n
            FROM orders
            LEFT JOIN s ON o_orderstatus = s.v
            LEFT JOIN p ON o_orderpriority = p.v
            GROUP BY 1, 2, 3, 4
        """,
        "quantile_discretize_lineitem": """
            WITH ep AS (
                SELECT unnest(quantile_cont(l_extendedprice,
                    [0.1, 0.2, 0.3, 0.4, 0.5,
                     0.6, 0.7, 0.8, 0.9])) AS e
                FROM lineitem
            ), eq AS (
                SELECT DISTINCT e FROM ep
            ), qp AS (
                SELECT unnest(quantile_cont(l_quantity,
                    [0.1, 0.2, 0.3, 0.4, 0.5,
                     0.6, 0.7, 0.8, 0.9])) AS e
                FROM lineitem
            ), qq AS (
                SELECT DISTINCT e FROM qp
            )
            SELECT CASE WHEN l_extendedprice IS NOT NULL THEN
                       CAST((SELECT count(*) FROM eq
                             WHERE l_extendedprice >= e) AS INT)
                   END AS l_extendedprice_bin,
                   CASE WHEN l_quantity IS NOT NULL THEN
                       CAST((SELECT count(*) FROM qq
                             WHERE l_quantity >= e) AS INT)
                   END AS l_quantity_bin,
                   count(*) AS n
            FROM lineitem GROUP BY 1, 2
        """,
        "ols_lineitem": """
            SELECT l_returnflag,
                   count(*) FILTER (l_quantity IS NOT NULL
                       AND l_extendedprice IS NOT NULL) AS n,
                   ROUND(covar_pop(l_extendedprice, l_quantity)
                         / var_pop(l_quantity), 4) + 0 AS slope,
                   ROUND(avg(l_extendedprice)
                         - covar_pop(l_extendedprice, l_quantity)
                           / var_pop(l_quantity)
                           * avg(l_quantity), 4) + 0 AS intercept,
                   ROUND(covar_pop(l_extendedprice, l_quantity)
                         * covar_pop(l_extendedprice, l_quantity)
                         / (var_pop(l_quantity)
                            * var_pop(l_extendedprice)), 6) + 0
                       AS r2
            FROM lineitem GROUP BY 1
        """,
        "km_survival_events": """
            WITH c AS (
                SELECT value AS t,
                       count(*) FILTER (event_type <> 'error')
                           AS d,
                       count(*) FILTER (event_type = 'error')
                           AS cns
                FROM events WHERE value IS NOT NULL GROUP BY 1
            ), w AS (
                SELECT t, d, cns,
                       sum(d + cns) OVER (ORDER BY t) AS cum,
                       (SELECT sum(d + cns) FROM c) AS N
                FROM c
            ), r AS (
                SELECT t, d, N - cum + d + cns AS n_risk FROM w
            ), s AS (
                SELECT t, d, n_risk,
                       exp(sum(CASE WHEN d > 0 AND d < n_risk
                               THEN ln(1 - CAST(d AS DOUBLE)
                                           / n_risk)
                               WHEN d > 0 THEN -1.0e6
                               ELSE 0 END)
                           OVER (ORDER BY t)) AS surv
                FROM r
            )
            SELECT t AS duration, CAST(n_risk AS BIGINT)
                       AS n_at_risk,
                   d AS n_events, ROUND(surv, 4) + 0 AS survival
            FROM s WHERE d > 0
        """,
        "auc_events": """
            WITH b AS (
                SELECT value / 500.0 AS s,
                       CASE WHEN event_type = 'purchase'
                            THEN 1 ELSE 0 END AS y
                FROM events WHERE value IS NOT NULL
            ), r AS (
                SELECT y, rank() OVER (ORDER BY s)
                       + (count(*) OVER (PARTITION BY s) - 1) / 2.0
                       AS ar
                FROM b
            )
            SELECT CAST(sum(y) AS BIGINT) AS n_pos,
                   CAST(count(*) - sum(y) AS BIGINT) AS n_neg,
                   (sum(CASE WHEN y = 1 THEN ar END)
                    - CAST(sum(y) AS DOUBLE) * (sum(y) + 1) / 2.0)
                   / (CAST(sum(y) AS DOUBLE) * (count(*) - sum(y)))
                       AS auc
            FROM r
        """,
        "calibration_events": """
            WITH b AS (
                SELECT least(value / 500.0, 1.0) AS s,
                       CASE WHEN event_type = 'purchase'
                            THEN 1 ELSE 0 END AS y
                FROM events WHERE value IS NOT NULL
            )
            SELECT CAST(least(floor(s * 10), 9) AS INT) AS bin,
                   count(*) AS n,
                   ROUND(avg(s), 4) + 0 AS mean_score,
                   sum(y) / CAST(count(*) AS DOUBLE) AS frac_pos
            FROM b GROUP BY 1
        """,
        "confusion_events": """
            WITH b AS (
                SELECT value / 500.0 AS s,
                       event_type = 'purchase' AS y
                FROM events WHERE value IS NOT NULL
            ), c AS (
                SELECT count(*) FILTER (s >= 0.3 AND y) AS tp,
                       count(*) FILTER (s >= 0.3 AND NOT y) AS fp,
                       count(*) FILTER (s < 0.3 AND NOT y) AS tn,
                       count(*) FILTER (s < 0.3 AND y) AS fn
                FROM b
            ), m AS (
                SELECT tp, fp, tn, fn,
                       CASE WHEN tp + fp > 0
                            THEN tp / CAST(tp + fp AS DOUBLE)
                       END AS prec,
                       CASE WHEN tp + fn > 0
                            THEN tp / CAST(tp + fn AS DOUBLE)
                       END AS rec
                FROM c
            )
            SELECT tp, fp, tn, fn,
                   CASE WHEN tp + fp + tn + fn > 0 THEN
                       (tp + tn)
                       / CAST(tp + fp + tn + fn AS DOUBLE)
                   END AS accuracy,
                   prec AS precision, rec AS recall,
                   CASE WHEN prec IS NOT NULL AND rec IS NOT NULL
                        AND prec + rec > 0
                        THEN 2.0 * prec * rec / (prec + rec)
                   END AS f1
            FROM m
        """,
        "stream_attribution_events": """
            WITH c AS (
                SELECT event_id, event_type AS t, value AS v,
                       last_value(CASE WHEN event_type IN
                           ('view', 'click', 'signup')
                           THEN event_type END IGNORE NULLS)
                       OVER (PARTITION BY user_id
                             ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING) AS channel
                FROM events
            )
            SELECT event_id, channel, ROUND(v, 4) + 0 AS value
            FROM c WHERE t = 'purchase'
        """,
        "attribution_events": """
            WITH c AS (
                SELECT event_type AS t, value AS v,
                       last_value(CASE WHEN event_type IN
                           ('view', 'click', 'signup')
                           THEN event_type END IGNORE NULLS)
                       OVER (PARTITION BY user_id
                             ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING) AS channel
                FROM events
            )
            SELECT channel, count(*) AS n_conversions,
                   ROUND(sum(v), 4) + 0 AS attributed_value
            FROM c WHERE t = 'purchase'
            GROUP BY 1
        """,
        "target_encode_orders": """
            WITH s AS (
                SELECT o_orderpriority AS cat, o_orderkey % 5 AS f,
                       sum(o_totalprice) AS s,
                       count(o_totalprice) AS c
                FROM orders GROUP BY 1, 2
            ), w AS (
                SELECT *,
                       COALESCE(sum(s) OVER (PARTITION BY cat), 0)
                           AS ts,
                       sum(c) OVER (PARTITION BY cat) AS tc,
                       COALESCE(sum(s) OVER (PARTITION BY f), 0)
                           AS fs,
                       sum(c) OVER (PARTITION BY f) AS fc,
                       sum(s) OVER () AS gs, sum(c) OVER () AS gc
                FROM s
            ), e AS (
                SELECT cat, f,
                       ((ts - COALESCE(s, 0))
                        + 20.0 * (CASE WHEN gc - fc > 0 THEN
                            (COALESCE(gs, 0) - fs)
                            / CAST(gc - fc AS DOUBLE)
                            ELSE 0 END))
                       / (CAST(tc - c AS DOUBLE) + 20.0) AS te
                FROM w
            )
            SELECT o.o_orderkey, o.o_orderpriority,
                   ROUND(e.te, 4) + 0 AS te
            FROM orders o LEFT JOIN e
              ON o.o_orderpriority IS NOT DISTINCT FROM e.cat
             AND (o.o_orderkey % 5) IS NOT DISTINCT FROM e.f
        """,
        "path_ngrams_events": """
            WITH p AS (
                SELECT event_type AS s0,
                       lead(event_type, 1) OVER w AS s1,
                       lead(event_type, 2) OVER w AS s2
                FROM events
                WINDOW w AS (PARTITION BY user_id
                             ORDER BY ts, event_id)
            ), c AS (
                SELECT concat_ws(' -> ', s0, s1, s2) AS path,
                       count(*) AS n_occurrences
                FROM p
                WHERE s0 IS NOT NULL AND s1 IS NOT NULL
                  AND s2 IS NOT NULL
                GROUP BY 1
            )
            SELECT path, n_occurrences,
                   CAST(row_number() OVER (
                       ORDER BY n_occurrences DESC, path ASC)
                       AS INTEGER) AS rank
            FROM c
            ORDER BY n_occurrences DESC, path ASC
            LIMIT 20
        """,
        "jaccard_join_docs": """
            WITH s AS (
                SELECT doc_id,
                       list_distinct(list_filter(
                           regexp_split_to_array(
                               regexp_replace(lower(text),
                                              '[^a-z0-9 ]', ' ', 'g'),
                               ' +'), t -> t != '')) AS tk
                FROM documents WHERE doc_id % 10 = 0
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(len(list_intersect(a.tk, b.tk)) AS BIGINT)
                       AS n_common,
                   CAST(len(list_intersect(a.tk, b.tk)) AS DOUBLE)
                   / (len(a.tk) + len(b.tk)
                      - len(list_intersect(a.tk, b.tk))) AS jaccard
            FROM s a JOIN s b ON a.doc_id < b.doc_id
            WHERE len(a.tk) > 0 AND len(b.tk) > 0
              AND CAST(len(list_intersect(a.tk, b.tk)) AS DOUBLE)
                  / (len(a.tk) + len(b.tk)
                     - len(list_intersect(a.tk, b.tk))) >= 0.8
        """,
        "outliers_events": """
            WITH s AS (
                SELECT event_type, avg(value) AS m,
                       stddev_samp(value) AS sd
                FROM events WHERE value IS NOT NULL
                GROUP BY 1
            )
            -- null-safe join: Spark's eqNullSafe gives a NULL-keyed
            -- group real fences, so the oracle must match it rather
            -- than JOIN USING (which drops NULL keys)
            SELECT e.event_id, e.event_type,
                   ROUND(e.value, 4) + 0 AS value
            FROM events e JOIN s
              ON e.event_type IS NOT DISTINCT FROM s.event_type
            WHERE e.value IS NOT NULL AND s.sd > 0
              AND abs(e.value - s.m) > 3.0 * s.sd
        """,
        "ab_welch_events": """
            WITH g AS (
                SELECT event_type AS g, count(*) AS n,
                       avg(value) AS m, var_samp(value) AS v
                FROM events WHERE value IS NOT NULL
                GROUP BY 1 HAVING count(*) >= 2
            )
            -- '+ 0' folds IEEE -0.0 (which DuckDB ROUND preserves
            -- but Spark F.round canonicalizes) to +0.0 so the hash
            -- compare sees identical representations; the CASE
            -- mirrors Spark's NULL-on-degenerate-pair guard.
            SELECT a.g AS g_a, b.g AS g_b, a.n AS na, b.n AS nb,
                   ROUND(a.m, 4) + 0 AS mean_a,
                   ROUND(b.m, 4) + 0 AS mean_b,
                   CASE WHEN a.v / a.n + b.v / b.n > 0 THEN
                       ROUND((a.m - b.m)
                             / sqrt(a.v / a.n + b.v / b.n), 4) + 0
                   END AS t_stat,
                   CASE WHEN a.v / a.n + b.v / b.n > 0 THEN
                       ROUND((a.v / a.n + b.v / b.n)
                             * (a.v / a.n + b.v / b.n)
                             / ((a.v / a.n) * (a.v / a.n) / (a.n - 1)
                                + (b.v / b.n) * (b.v / b.n)
                                  / (b.n - 1)),
                             2) + 0
                   END AS dof
            FROM g a JOIN g b ON a.g < b.g
        """,
        "ema_events": """
            WITH RECURSIVE ordered AS (
                SELECT user_id, event_id, value,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS rn
                FROM events
                WHERE event_type = 'click' AND value IS NOT NULL
            ), ema AS (
                SELECT user_id, event_id, rn, value AS e
                FROM ordered WHERE rn = 1
                UNION ALL
                SELECT o.user_id, o.event_id, o.rn,
                       0.75 * ema.e + 0.25 * o.value
                FROM ema JOIN ordered o
                  ON o.user_id = ema.user_id AND o.rn = ema.rn + 1
            )
            SELECT user_id, event_id, e AS ema FROM ema
        """,
        "dsir_weights_docs": """
            WITH toks AS (
                SELECT doc_id, lang,
                       list_filter(regexp_split_to_array(
                           regexp_replace(lower(text),
                                          '[^a-z0-9 ]', ' ', 'g'),
                           ' +'), t -> t != '') AS tk
                FROM documents
            ), grams AS (
                SELECT doc_id, lang,
                       list_concat(tk, CASE WHEN len(tk) >= 2 THEN
                           list_transform(range(1, len(tk)),
                               i -> tk[i] || ' ' || tk[i + 1])
                           ELSE [] END) AS gs
                FROM toks
            ), g AS (
                SELECT doc_id, lang,
                       CAST(('0x' || substr(md5(u.g), 1, 8)) AS UBIGINT)
                           % 256 AS b
                FROM grams, unnest(gs) AS u(g)
            ), rawc AS (
                SELECT b, count(*) AS c FROM g GROUP BY b
            ), tgtc AS (
                SELECT b, count(*) AS c FROM g WHERE lang = 'fr'
                GROUP BY b
            ), tot AS (
                SELECT (SELECT sum(c) FROM rawc) AS tr,
                       (SELECT coalesce(sum(c), 0) FROM tgtc) AS tt
            ), lam AS (
                SELECT r.b, CAST(floor(1e6 * (
                        ln((coalesce(t.c, 0) + 1)
                           / CAST(tot.tt + 256 AS DOUBLE))
                      - ln((r.c + 1)
                           / CAST(tot.tr + 256 AS DOUBLE))))
                    AS BIGINT) AS lam
                FROM rawc r LEFT JOIN tgtc t USING (b), tot
            ), w AS (
                SELECT g.doc_id, count(*) AS n_grams,
                       sum(lam.lam) AS s
                FROM g JOIN lam USING (b) GROUP BY g.doc_id
            )
            SELECT d.doc_id,
                   coalesce(w.n_grams, 0) AS n_grams,
                   CAST(coalesce(w.s, 0) AS BIGINT) AS dsir_micro
            FROM documents d LEFT JOIN w USING (doc_id)
        """,
        "dsir_select_docs": """
            WITH toks AS (
                SELECT doc_id, lang,
                       list_filter(regexp_split_to_array(
                           regexp_replace(lower(text),
                                          '[^a-z0-9 ]', ' ', 'g'),
                           ' +'), t -> t != '') AS tk
                FROM documents
            ), grams AS (
                SELECT doc_id, lang,
                       list_concat(tk, CASE WHEN len(tk) >= 2 THEN
                           list_transform(range(1, len(tk)),
                               i -> tk[i] || ' ' || tk[i + 1])
                           ELSE [] END) AS gs
                FROM toks
            ), g AS (
                SELECT doc_id, lang,
                       CAST(('0x' || substr(md5(u.g), 1, 8)) AS UBIGINT)
                           % 256 AS b
                FROM grams, unnest(gs) AS u(g)
            ), rawc AS (
                SELECT b, count(*) AS c FROM g GROUP BY b
            ), tgtc AS (
                SELECT b, count(*) AS c FROM g WHERE lang = 'fr'
                GROUP BY b
            ), tot AS (
                SELECT (SELECT sum(c) FROM rawc) AS tr,
                       (SELECT coalesce(sum(c), 0) FROM tgtc) AS tt
            ), lam AS (
                SELECT r.b, CAST(floor(1e6 * (
                        ln((coalesce(t.c, 0) + 1)
                           / CAST(tot.tt + 256 AS DOUBLE))
                      - ln((r.c + 1)
                           / CAST(tot.tr + 256 AS DOUBLE))))
                    AS BIGINT) AS lam
                FROM rawc r LEFT JOIN tgtc t USING (b), tot
            ), w AS (
                SELECT g.doc_id, count(*) AS n_grams,
                       sum(lam.lam) AS s
                FROM g JOIN lam USING (b) GROUP BY g.doc_id
            ), full_w AS (
                SELECT d.doc_id,
                       coalesce(w.n_grams, 0) AS n_grams,
                       CAST(coalesce(w.s, 0) AS BIGINT) AS dsir_micro
                FROM documents d LEFT JOIN w USING (doc_id)
            )
            SELECT doc_id, n_grams, dsir_micro,
                   CAST(row_number() OVER (ORDER BY dsir_micro DESC,
                                           doc_id ASC) AS INTEGER)
                       AS rank
            FROM full_w
            ORDER BY dsir_micro DESC, doc_id ASC
            LIMIT 50
        """,
        "pca_covariance_embeddings": """
            WITH pairs AS (
                SELECT CAST(i.i AS INTEGER) AS i,
                       CAST(j.j AS INTEGER) AS j
                FROM range(0, 64) i(i), range(0, 64) j(j)
                WHERE j.j >= i.i
            )
            -- '+ 0': 64 of the 2080 cells are tiny negatives that
            -- round to zero at 4 decimals; DuckDB ROUND keeps the
            -- IEEE sign (-0.0) while Spark F.round canonicalizes to
            -- +0.0 — numerically equal but hash-different. -0.0 + 0
            -- is +0.0, matching Spark's representation exactly.
            SELECT p.i, p.j,
                   ROUND(avg(CAST(e.embedding[p.i + 1] AS DOUBLE)
                             * CAST(e.embedding[p.j + 1] AS DOUBLE))
                         - avg(CAST(e.embedding[p.i + 1] AS DOUBLE))
                         * avg(CAST(e.embedding[p.j + 1] AS DOUBLE)),
                         4) + 0 AS cov
            FROM pairs p, embeddings e
            GROUP BY p.i, p.j
        """,
        "bpe_train_docs": """
            WITH n AS (
                SELECT COUNT(*) FILTER (WHERE doc_id % 10 < 5) AS n1,
                       COUNT(*) FILTER (WHERE doc_id % 10 >= 5
                                        AND doc_id % 10 < 8) AS n2
                FROM documents
            )
            SELECT CAST(1 AS INTEGER) AS merge_rank, 'a' AS mleft,
                   'b' AS mright, n1 AS pair_count FROM n
            UNION ALL
            SELECT CAST(2 AS INTEGER), 'a', 'ab', n1 FROM n
            UNION ALL
            SELECT CAST(3 AS INTEGER), 'c', 'd', n2 FROM n
        """,
        "retention_cohorts_events": """
            WITH cohort AS (
                SELECT user_id,
                       time_bucket(INTERVAL '7 days', MIN(ts),
                                   TIMESTAMP '1970-01-01') AS cohort_start
                FROM events GROUP BY user_id
            ), active AS (
                SELECT DISTINCT user_id,
                       time_bucket(INTERVAL '7 days', ts,
                                   TIMESTAMP '1970-01-01') AS bucket
                FROM events
            )
            SELECT c.cohort_start,
                   CAST(date_diff('second', c.cohort_start, a.bucket)
                        / 604800 AS BIGINT) AS period,
                   COUNT(DISTINCT a.user_id) AS n_users
            FROM active a JOIN cohort c USING (user_id)
            GROUP BY c.cohort_start, period
        """,
        "batched_topk_embeddings": """
            WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
                       WHERE vec_id >= 3 AND vec_id < 10),
                 scored AS (
                     SELECT q.qid, e.vec_id AS nid,
                            list_dot_product(q.qv, e.embedding)
                            / (SQRT(list_dot_product(q.qv, q.qv))
                               * SQRT(list_dot_product(e.embedding, e.embedding))) AS cos,
                            ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY
                                list_dot_product(q.qv, e.embedding)
                                / (SQRT(list_dot_product(q.qv, q.qv))
                                   * SQRT(list_dot_product(e.embedding, e.embedding))) DESC,
                                e.vec_id ASC) AS rn
                     FROM q CROSS JOIN embeddings e
                     WHERE e.vec_id <> q.qid
                 )
            SELECT qid, nid, ROUND(cos, 4) AS cos, rn
            FROM scored WHERE rn <= 7
        """,
        "embedding_topk": """
            WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 3),
                 scored AS (
                     SELECT q.qid, e.vec_id AS nid,
                            list_dot_product(q.qv, e.embedding)
                            / (SQRT(list_dot_product(q.qv, q.qv))
                               * SQRT(list_dot_product(e.embedding, e.embedding))) AS cos,
                            ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY
                                list_dot_product(q.qv, e.embedding)
                                / (SQRT(list_dot_product(q.qv, q.qv))
                                   * SQRT(list_dot_product(e.embedding, e.embedding))) DESC,
                                e.vec_id ASC) AS rn
                     FROM q CROSS JOIN embeddings e
                     WHERE e.vec_id <> q.qid
                 )
            SELECT qid, nid, ROUND(cos, 4) AS cos, rn
            FROM scored WHERE rn <= 5
        """,
        # Derived-invariant oracles for the hash pipelines: the Spark
        # side runs the real MinHash/SimHash machinery over a corpus
        # where near-dup == exact-dup by construction (_dup_fixture);
        # DuckDB reproduces the construction and the exact-dedup
        # ground truth verbatim.
        "vocab_shift_docs": """
            WITH norm AS (
                SELECT doc_id,
                       lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))
                           AS t
                FROM documents
            ), tk AS (
                SELECT doc_id, tok FROM (
                    SELECT doc_id, unnest(string_split(t, ' ')) AS tok
                    FROM norm)
                WHERE tok <> ''
            ), ca AS (
                SELECT tok, COUNT(*) AS ca FROM tk
                WHERE doc_id % 2 = 0 GROUP BY tok
            ), cb AS (
                SELECT tok, COUNT(*) AS cb FROM tk
                WHERE doc_id % 2 = 1 GROUP BY tok
            ), j AS (
                SELECT COALESCE(ca.ca, 0) AS ca, COALESCE(cb.cb, 0) AS cb
                FROM ca FULL OUTER JOIN cb ON ca.tok = cb.tok
            ), tot AS (
                SELECT SUM(ca) AS na, SUM(cb) AS nb,
                       SUM(CASE WHEN ca > 0 THEN 1 ELSE 0 END) AS va,
                       SUM(CASE WHEN cb > 0 THEN 1 ELSE 0 END) AS vb,
                       COUNT(*) AS vu
                FROM j
            ), terms AS (
                SELECT (j.ca + 0.5) / (t.na + 0.5 * t.vu) AS pa,
                       (j.cb + 0.5) / (t.nb + 0.5 * t.vu) AS pb,
                       (pa + pb) / 2.0 AS m,
                       FLOOR(1000000.0 * (0.5 *
                           (pa * ln(pa / m) + pb * ln(pb / m)))) AS q
                FROM j CROSS JOIN tot t
            )
            SELECT CAST(t.va AS BIGINT) AS vocab_a,
                   CAST(t.vb AS BIGINT) AS vocab_b,
                   CAST(t.vu AS BIGINT) AS vocab_union,
                   CAST(t.na AS BIGINT) AS n_tokens_a,
                   CAST(t.nb AS BIGINT) AS n_tokens_b,
                   CAST((SELECT SUM(q) FROM terms) AS BIGINT)
                       AS js_micronats
            FROM tot t
        """,
        "minhash_dedup_docs": """
            WITH corpus AS (
                SELECT doc_id, doc_id AS text_key FROM documents
                UNION ALL
                SELECT doc_id + 10000000 AS doc_id, doc_id AS text_key
                FROM documents WHERE doc_id % 4 = 0
            )
            SELECT MIN(doc_id) AS doc_id FROM corpus GROUP BY text_key
        """,
        "line_dedup_docs": """
            SELECT doc_id,
                   MD5(CASE WHEN doc_id % 3 = 0 THEN
                         'line-' || CAST(doc_id AS VARCHAR) || '-a' ||
                         chr(10) ||
                         'line-' || CAST(doc_id AS VARCHAR) || '-b'
                       ELSE
                         'line-' || CAST(doc_id AS VARCHAR) || '-a' ||
                         chr(10) || 'mid-' || CAST(doc_id AS VARCHAR) ||
                         chr(10) ||
                         'line-' || CAST(doc_id AS VARCHAR) || '-b'
                       END) AS text_md5,
                   CAST(CASE WHEN doc_id % 3 = 0 THEN 2 ELSE 3 END
                        AS BIGINT) AS n_lines_kept
            FROM documents
        """,
        "semantic_dedup_embeddings": """
            WITH corpus AS (
                SELECT vec_id, vec_id AS vec_key FROM embeddings
                UNION ALL
                SELECT vec_id + 10000000 AS vec_id, vec_id AS vec_key
                FROM embeddings WHERE vec_id % 4 = 0
            )
            SELECT MIN(vec_id) AS vec_id FROM corpus GROUP BY vec_key
        """,
        "perplexity_docs": """
            WITH dd AS (
                SELECT doc_id,
                       lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))
                           AS norm
                FROM documents
            ), dn AS (
                SELECT doc_id, norm FROM dd WHERE length(norm) >= 3
            ), grams AS (
                SELECT doc_id, substr(norm, CAST(i AS INT), 3) AS gram
                FROM (SELECT doc_id, norm,
                             unnest(range(1, length(norm) - 1)) AS i
                      FROM dn)
            ), counts AS (
                SELECT gram, COUNT(*) AS cnt FROM grams GROUP BY gram
            ), prefixes AS (
                SELECT substr(gram, 1, 2) AS pfx, SUM(cnt) AS pcnt
                FROM counts GROUP BY pfx
            ), vocab AS (
                SELECT COUNT(DISTINCT substr(norm, CAST(i AS INT), 1)) AS v
                FROM (SELECT norm,
                             unnest(range(1, length(norm) + 1)) AS i
                      FROM dn)
            )
            SELECT g.doc_id, COUNT(*) AS n_ngrams,
                   CAST(SUM(FLOOR(1000.0 * ln(
                        (c.cnt + 0.5) / (p.pcnt + 0.5 * vocab.v))))
                        AS BIGINT) AS millinats
            FROM grams g
            JOIN counts c ON g.gram = c.gram
            JOIN prefixes p ON substr(g.gram, 1, 2) = p.pfx
            CROSS JOIN vocab
            GROUP BY g.doc_id
        """,
        "simhash_docs": """
            WITH corpus AS (
                SELECT doc_id, doc_id AS text_key FROM documents
                UNION ALL
                SELECT doc_id + 10000000 AS doc_id, doc_id AS text_key
                FROM documents WHERE doc_id % 4 = 0
            )
            SELECT COUNT(*) AS n_docs,
                   COUNT(DISTINCT text_key) AS n_sigs,
                   COUNT(DISTINCT text_key) AS n_texts
            FROM corpus
        """,
        "simhash_near_dup_docs": """
            SELECT doc_id AS id_a, doc_id + 10000000 AS id_b,
                   CAST(0 AS INT) AS hamming
            FROM documents WHERE doc_id % 4 = 0
        """,
        # ANN oracles assert the deterministic recall floor: with
        # seeded hyperplanes / seeded k-means the approximate top-k is
        # a fixed set; since round 6 the oracle is INDEPENDENT — the
        # engine's approx ids are pinned as literals and DuckDB
        # recomputes the exact top-5 and the overlap itself (see
        # _ann_overlap_oracle).
        "lsh_topk_embeddings": _ann_overlap_oracle(
            "(0,73),(0,334),(0,365),(0,387),(0,423),"
            "(1,27),(1,64),(1,195),(1,386),(1,407),"
            "(2,112),(2,117),(2,145),(2,320),(2,418)"),
        "ivf_topk_embeddings": _ann_overlap_oracle(
            "(0,7),(0,73),(0,334),(0,365),(0,423),"
            "(1,27),(1,64),(1,124),(1,386),(1,407),"
            "(2,117),(2,145),(2,188),(2,320),(2,450)"),
        "pq_topk_embeddings": _ann_overlap_oracle(
            "(0,73),(0,334),(0,365),(0,387),(0,423),"
            "(1,27),(1,64),(1,124),(1,386),(1,407),"
            "(2,112),(2,117),(2,145),(2,188),(2,450)"),
        "ivfpq_topk_embeddings": _ann_overlap_oracle(
            "(0,73),(0,320),(0,365),(0,387),(0,423),"
            "(1,64),(1,195),(1,386),(1,402),(1,407),"
            "(2,112),(2,117),(2,145),(2,188),(2,450)"),
        "holdout_split_orders": """
            WITH u AS (
                SELECT o_orderkey,
                       CAST(('0x' || substring(md5('split' || CAST(o_orderkey AS VARCHAR)), 1, 15))
                            AS UBIGINT) / 1152921504606846976.0 AS h
                FROM orders
            )
            SELECT CASE WHEN h < 0.1 THEN 'holdout' ELSE 'train' END AS split,
                   COUNT(*) AS n, CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
            FROM u GROUP BY 1
        """,
        "wav_decode_meta": """
            SELECT doc_id,
                   CAST(16000 AS INT) AS sample_rate,
                   CAST(1 AS INT) AS channels,
                   CAST((800 + (doc_id % 10) * 160) * 1000 / 16000 AS BIGINT)
                       AS duration_ms
            FROM documents
        """,
        "jpeg_decode_dims": """
            SELECT doc_id,
                   CAST(16 + doc_id % 9 AS INT) AS width,
                   CAST(12 + doc_id % 5 AS INT) AS height,
                   CAST(doc_id % 2 AS DOUBLE) AS mean_red_bit
            FROM documents
        """,
        "gif_decode_dims": """
            SELECT doc_id,
                   CAST(16 + doc_id % 9 AS INT) AS width,
                   CAST(12 + doc_id % 5 AS INT) AS height,
                   CAST(doc_id % 2 AS DOUBLE) AS mean_red_bit
            FROM documents
        """,
        "audio_features_meta": """
            SELECT doc_id,
                   CAST(16000 AS INT) AS sample_rate,
                   CAST(200 AS BIGINT) AS duration_ms,
                   CAST(200 * (1 + doc_id % 8) - 1 AS BIGINT)
                       AS zero_crossings,
                   CAST(1 + doc_id % 8 AS BIGINT) AS centroid_bucket,
                   CAST(1 + doc_id % 2 AS BIGINT) AS amp_bit
            FROM documents
        """,
        "video_frames_meta": """
            WITH base AS (
                SELECT doc_id, 3 + doc_id % 4 AS n
                FROM documents WHERE doc_id % 5 = 0
            ), s AS (
                SELECT doc_id, n, CAST((n - 1) // 2 + 1 AS BIGINT)
                           AS n_sampled
                FROM base)
            SELECT doc_id, n_sampled,
                   CAST(16 + doc_id % 9 AS INT) AS width,
                   CAST(12 + doc_id % 5 AS INT) AS height,
                   CAST(200 * (n_sampled - 1) AS BIGINT) AS max_t_ms,
                   CAST(n_sampled * (doc_id % 2) AS BIGINT) AS luma_bits
            FROM s
        """,
        "png_decode_dims": """
            SELECT doc_id,
                   CAST(8 + doc_id % 5 AS INT) AS width,
                   CAST(6 + doc_id % 3 AS INT) AS height,
                   CAST(doc_id % 2 AS DOUBLE) AS mean_red
            FROM documents
        """,
        "canonical_urls_docs": """
            WITH raw AS (
                SELECT doc_id,
                       'HTTPS://Example' || CAST(doc_id % 7 AS VARCHAR)
                       || '.COM:443/Path/' || CAST(doc_id AS VARCHAR)
                       || '/?utm_source=x&id=' || CAST(doc_id AS VARCHAR)
                       || '&utm_campaign=y&fbclid=abc&myfbclid=keep#frag' AS url
                FROM documents
            ), s1 AS (
                SELECT doc_id, regexp_replace(url, '#.*$', '') AS u FROM raw
            ), s2 AS (
                SELECT doc_id,
                       lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.\\-]*://[^/?#]*)', 1))
                       || regexp_replace(u, '^[A-Za-z][A-Za-z0-9+.\\-]*://[^/?#]*', '') AS u
                FROM s1
            ), s3 AS (
                SELECT doc_id,
                       regexp_replace(regexp_replace(u,
                           '^(http://[^/?#:]*):80(/|\\?|$)', '\\1\\2'),
                           '^(https://[^/?#:]*):443(/|\\?|$)', '\\1\\2') AS u
                FROM s2
            ), s4 AS (
                SELECT doc_id,
                       regexp_replace(u,
                           '([?&])(utm_[A-Za-z0-9_]+|fbclid|gclid|msclkid|mc_eid)=[^&#]*',
                           '\\1', 'g') AS u
                FROM s3
            ), s5 AS (
                SELECT doc_id,
                       regexp_replace(regexp_replace(u,
                           '&{2,}', '&', 'g'), '\\?&', '?') AS u
                FROM s4
            )
            SELECT doc_id,
                   regexp_replace(regexp_replace(u,
                       '[?&]+$', ''), '/+$', '') AS url_canon
            FROM s5
        """,
        "interval_join_events": """
            SELECT e.user_id, COUNT(*) AS n_pairs,
                   CAST(SUM(e.event_id + c.event_id) AS BIGINT) AS pair_sum
            FROM events e JOIN events c
              ON e.user_id = c.user_id
             AND e.event_type = 'error' AND c.event_type = 'click'
             AND epoch(e.ts) >= epoch(c.ts)
             AND epoch(e.ts) <= epoch(c.ts) + 3600
            GROUP BY e.user_id
        """,
        "normalize_docs": """
            SELECT doc_id,
                   md5(trim(regexp_replace(
                       lower(nfc_normalize('Cafe' || chr(769) || '   ' || text)),
                       '\\s+', ' ', 'g'))) AS norm_md5
            FROM documents
        """,
        "unicode_sort_rank": """
            WITH named AS (
                SELECT (CASE WHEN n_nationkey % 3 = 0 THEN 'Ä'
                             WHEN n_nationkey % 3 = 1 THEN 'é'
                             ELSE 'a' END) || n_name AS accented
                FROM nation
            )
            SELECT accented,
                   CAST(ROW_NUMBER() OVER (ORDER BY accented COLLATE de)
                        AS INT) AS rnk
            FROM named
        """,
        "mixture_sample_docs": """
            WITH counts AS (
                SELECT lang, COUNT(*) AS cnt FROM documents GROUP BY lang
            ), shares(lang, share) AS (
                VALUES ('en', CAST(0.5 AS DOUBLE)), ('de', CAST(0.25 AS DOUBLE)),
                       ('fr', CAST(0.125 AS DOUBLE)), ('es', CAST(0.125 AS DOUBLE))
            ), n_total AS (
                SELECT MIN(cnt / share) AS nt
                FROM counts JOIN shares USING (lang) WHERE share > 0
            ), rates AS (
                SELECT lang, LEAST(CAST(1.0 AS DOUBLE),
                                   share * (SELECT nt FROM n_total) / cnt) AS rate
                FROM counts JOIN shares USING (lang)
            )
            SELECT d.lang, COUNT(*) AS n,
                   CAST(SUM(d.doc_id) AS BIGINT) AS id_sum
            FROM documents d JOIN rates r ON d.lang = r.lang
            WHERE CAST(('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))
                       AS UBIGINT) / 1152921504606846976.0 < r.rate
            GROUP BY d.lang
        """,
        "token_budget_docs": """
            WITH toks AS (
                SELECT doc_id, source,
                       len(string_split(text, ' ')) AS n_tok,
                       CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                            AS UBIGINT) / 1152921504606846976.0 AS h
                FROM documents
            ), runs AS (
                SELECT source, doc_id, n_tok,
                       SUM(n_tok) OVER (PARTITION BY source
                           ORDER BY h ASC, doc_id ASC
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_tok
                FROM toks
            )
            SELECT source, COUNT(*) AS n,
                   CAST(SUM(doc_id) AS BIGINT) AS id_sum,
                   CAST(SUM(n_tok) AS BIGINT) AS tok_sum
            FROM runs WHERE run_tok <= 600 GROUP BY source
        """,
        "incremental_dedup_docs": """
            WITH new_batch AS (
                SELECT doc_id + 1000000 AS doc_id, text
                FROM documents WHERE doc_id % 5 = 1
                UNION ALL
                SELECT doc_id + 2000000 AS doc_id, text || ' v2' AS text
                FROM documents WHERE doc_id % 5 = 2
                UNION ALL
                SELECT doc_id + 3000000 AS doc_id, text || ' v2' AS text
                FROM documents WHERE doc_id % 5 = 2
            ), fresh AS (
                SELECT n.doc_id, n.text FROM new_batch n
                WHERE NOT EXISTS (
                    SELECT 1 FROM documents s WHERE s.text = n.text)
            )
            SELECT MIN(doc_id) AS doc_id FROM fresh GROUP BY text
        """,
        "shuffle_order_docs": """
            WITH h AS (
                SELECT doc_id,
                       CAST(('0x' || substring(md5('epoch1' || CAST(doc_id AS VARCHAR)), 1, 15))
                            AS UBIGINT) / 1152921504606846976.0 AS u
                FROM documents
            )
            SELECT doc_id,
                   CAST(ROW_NUMBER() OVER (ORDER BY u ASC, doc_id ASC) AS INT) AS rnk
            FROM h
            ORDER BY u ASC, doc_id ASC LIMIT 20
        """,
        "quota_cap_docs": """
            WITH ranked AS (
                SELECT source, doc_id,
                       ROW_NUMBER() OVER (PARTITION BY source ORDER BY
                           CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                                AS UBIGINT) / 1152921504606846976.0 ASC,
                           doc_id ASC) AS rnk
                FROM documents
            )
            SELECT source, COUNT(*) AS n, CAST(SUM(doc_id) AS BIGINT) AS id_sum
            FROM ranked WHERE rnk <= 15 GROUP BY source
        """,
    }
