"""Column statistics / histogram / type census.

Reference: ``Column.statistics()`` (tablite/base.py:1007-1024,
tablite/utils.py:188-398) — summary dict with min, max, mean, median,
stdev, mode, distinct, iqr bounds, sum. ``Column.histogram``
(base.py:981-1005), ``Column.unique`` (base.py:956-979),
``Column.count(item)`` type-strict counting (base.py:1026-1072).

All single-pass Spark aggregations (one job, partial aggs map-side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


_TEMPORAL = {"date", "timestamp", "timestamp_ntz"}


def statistics(df: DataFrame, column: str) -> DataFrame:
    """One-row frame of summary statistics for a column.

    Temporal columns follow the reference's rule (tablite/utils.py:
    188-398): map to numeric (epoch seconds), aggregate, map the
    order-statistics (min/max/mean/median/mode/iqr bounds) back to
    timestamps; spread measures (stdev/iqr) stay numeric seconds and
    ``sum`` is meaningless for instants so it is omitted (null).
    """
    dtype = dict(df.dtypes).get(column, "")
    if dtype in _TEMPORAL:
        c = F.unix_timestamp(F.col(column)).cast("double")
        qs = F.percentile_approx(c, [0.25, 0.75], 100_000)
        back = F.timestamp_seconds
        return df.agg(
            back(F.min(c)).alias("min"),
            back(F.max(c)).alias("max"),
            back(F.avg(c)).alias("mean"),
            back(F.median(c)).alias("median"),
            F.stddev_samp(c).alias("stdev"),
            back(F.mode(c)).alias("mode"),
            F.count_distinct(c).alias("distinct"),
            back(qs.getItem(0)).alias("iqr_low"),
            back(qs.getItem(1)).alias("iqr_high"),
            (qs.getItem(1) - qs.getItem(0)).alias("iqr"),
            F.lit(None).cast("double").alias("sum"),
            F.count(F.lit(1)).alias("summary_rows"),
            F.count(c).alias("non_null"),
        )
    base = dtype.split("(")[0]
    if base not in {"tinyint", "smallint", "int", "bigint", "float",
                    "double", "decimal"}:
        # text/boolean/binary: order statistics by the type's own
        # ordering; arithmetic measures are meaningless → null
        # (reference utils.py:188-398 branches per-type the same way)
        c = F.col(column)
        null_d = F.lit(None).cast("double")
        return df.agg(
            F.min(c).alias("min"),
            F.max(c).alias("max"),
            null_d.alias("mean"),
            null_d.alias("median"),
            null_d.alias("stdev"),
            F.mode(c).alias("mode"),
            F.count_distinct(c).alias("distinct"),
            null_d.alias("iqr_low"),
            null_d.alias("iqr_high"),
            null_d.alias("iqr"),
            null_d.alias("sum"),
            F.count(F.lit(1)).alias("summary_rows"),
            F.count(c).alias("non_null"),
        )
    c = F.col(column)
    qs = F.percentile_approx(c, [0.25, 0.75], 100_000)
    return df.agg(
        F.min(c).alias("min"),
        F.max(c).alias("max"),
        F.avg(c).alias("mean"),
        F.median(c).alias("median"),
        F.stddev_samp(c).alias("stdev"),
        F.mode(c).alias("mode"),
        F.count_distinct(c).alias("distinct"),
        qs.getItem(0).alias("iqr_low"),
        qs.getItem(1).alias("iqr_high"),
        (qs.getItem(1) - qs.getItem(0)).alias("iqr"),
        F.sum(c).alias("sum"),
        F.count(F.lit(1)).alias("summary_rows"),
        F.count(c).alias("non_null"),
    )


def statistics_dict(df: DataFrame, column: str) -> dict:
    return statistics(df, column).first().asDict()


def histogram(df: DataFrame, column: str) -> DataFrame:
    return df.groupBy(column).agg(F.count(F.lit(1)).alias("count"))


def unique_values(df: DataFrame, column: str) -> DataFrame:
    return df.select(column).distinct()


def count_value(df: DataFrame, column: str, value) -> int:
    """Type-strict occurrence count — with a typed schema, strictness
    is free (True != 1 can't collide in a typed column)."""
    if value is None:
        return df.filter(F.col(column).isNull()).count()
    return df.filter(F.col(column) == F.lit(value)).count()


def type_census(df: DataFrame) -> dict:
    """tablite ``Table.types()`` (base.py:1665-1683): per-column python
    type histogram. A typed Spark schema makes this {type: non-null,
    NoneType: nulls} per column, computed in ONE aggregation pass."""
    aggs = []
    for cname in df.columns:
        aggs.append(F.count(F.col(cname)).alias(f"{cname}__nn"))
        aggs.append(F.count(F.lit(1)).alias(f"{cname}__total"))
    row = df.agg(*aggs).first()
    out = {}
    for field in df.schema.fields:
        nn = row[f"{field.name}__nn"]
        total = row[f"{field.name}__total"]
        census = {field.dataType.simpleString(): nn}
        if total - nn:
            census["NoneType"] = total - nn
        out[field.name] = census
    return out
