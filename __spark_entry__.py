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
        {"value1": "BRASS", "criteria": "in", "column2": "p_type"},
    ], "all")
    return t


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
    w = W.partitionBy("o_orderkey").orderBy(
        F.col("l_shipdate").asc_nulls_last(), F.col("l_linenumber").asc_nulls_last())
    return (j.withColumn("__rn__", F.row_number().over(w))
            .filter(F.col("__rn__") == 1)
            .select("o_orderkey",
                    F.col("l_shipdate").cast("date").alias("first_ship"),
                    "l_linenumber"))


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
                 F.round(F.sum("value"), 2).alias("session_value")))


def tumbling_window(spark: SparkSession, sf: str) -> DataFrame:
    """Tumbling 1-hour event-time window aggregation (batch form of
    Structured Streaming's window(); SURVEY §2.8)."""
    e = _t(spark, sf, "events")
    return (e.groupBy(F.date_trunc("hour", F.col("ts")).alias("hour_start"),
                      F.col("event_type"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("value"), 2).alias("total_value"))
            .withColumn("hour_start", F.date_format("hour_start", "yyyy-MM-dd HH:mm:ss")))


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


# --------------------------------------------------------------------
# driver contract
# --------------------------------------------------------------------

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q1_pricing_summary": q1_pricing_summary,
        "q3_shipping_revenue": q3_shipping_revenue,
        "q5_nation_revenue": q5_nation_revenue,
        "filter_pass": filter_pass,
        "filter_fail": filter_fail,
        "filter_any": filter_any,
        "filter_expression": filter_expression,
        "filter_substring_in": filter_substring_in,
        "groupby_accumulators": groupby_accumulators,
        "distinct_keys": distinct_keys,
        "unique_first": unique_first,
        "join_inner": join_inner,
        "join_left": join_left,
        "join_outer_merge_keys": join_outer_merge_keys,
        "join_cross": join_cross,
        "join_semi": join_semi,
        "join_anti": join_anti,
        "join_nullsafe": join_nullsafe,
        "lookup_first_match": lookup_first_match,
        "pivot_wide": pivot_wide,
        "melt_long": melt_long,
        "window_topn": window_topn,
        "window_running_sum": window_running_sum,
        "window_lag": window_lag,
        "slice_step": slice_step,
        "concat_tables": concat_tables,
        "stack_tables": stack_tables,
        "repeat_table": repeat_table,
        "replace_values": replace_values_q,
        "drop_rows": drop_rows_q,
        "column_select_pass": column_select_pass,
        "column_select_fail": column_select_fail,
        "imputation_ffill": imputation_ffill,
        "imputation_mean": imputation_mean,
        "statistics_summary": statistics_summary,
        "histogram": histogram_q,
        "xround_buckets": xround_buckets,
        "diff_tables": diff_tables,
        "sessionize_events": sessionize_events,
        "tumbling_window": tumbling_window,
        "dedup_exact": dedup_exact,
        "text_stats": text_stats,
        "doc_fingerprint": doc_fingerprint,
        "quality_score": quality_score,
        "embedding_topk": embedding_topk,
    }


def oracle_sql() -> dict[str, str]:
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
            FROM part WHERE p_type LIKE '%BRASS%'
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
                       SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
                FROM g
            )
            SELECT user_id, session_seq, COUNT(*) AS n_events,
                   ROUND(SUM(value), 2) AS session_value
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
    }
