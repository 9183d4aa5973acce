"""column_select — typed projection with pass/fail reject routing.

Reference: ``Table.column_select(cols)`` (tablite/core.py:704-733,
tablite/nimlite.py:218-317, nimlite/funcs/column_selector/*): cast
columns to declared types (bool,int,float,str,date,time,datetime),
honoring ``allow_empty`` and ``rename``; any row failing ANY cast is
routed whole to a reject table with a ``reject_reason`` column.

Spark-first plan: one scan → per-column ``try``-cast expressions +
validity mask columns → pass = filter(all valid) with casted columns,
fail = filter(any invalid) with ORIGINAL columns + concat_ws reason.
Everything is built-in expressions (whole-stage codegen); the twin
outputs are two pushed-down filters over the same (cacheable) scan.

Locale-aware string parsing mirrors tablite/datatypes.py:182-265 and
nimlite/infertypes.nim: ISO dates in many patterns, US/EU thousand
separators, boolean words.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tablite_spark.config import Config

# candidate datetime/date formats, mirroring the reference's pattern zoo
# (tablite/datatypes.py:182-265). Tried in order, first hit wins.
DATETIME_FORMATS = [
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSS", "yyyy-MM-dd'T'HH:mm:ss",
    "yyyy-MM-dd HH:mm:ss.SSSSSS", "yyyy-MM-dd HH:mm:ss",
    "yyyy-MM-dd HH:mm", "yyyy/MM/dd HH:mm:ss", "dd-MM-yyyy HH:mm:ss",
    "dd/MM/yyyy HH:mm:ss", "MM/dd/yyyy HH:mm:ss",
]
DATE_FORMATS = [
    "yyyy-MM-dd", "yyyy/MM/dd", "yyyy.MM.dd", "dd-MM-yyyy",
    "dd/MM/yyyy", "dd.MM.yyyy", "MM/dd/yyyy",
]

_TYPES = ("bool", "int", "float", "str", "date", "time", "datetime")


def _clean_number(c: Column) -> Column:
    """Strip US/EU thousand separators: '1,000,000' / '1.000.000,5'
    → castable forms (reference: nimlite/infertypes.nim locale parsing)."""
    s = F.trim(c)
    # EU form: dots as thousands + comma decimal
    eu = F.regexp_replace(F.regexp_replace(s, r"\.(?=\d{3}(\D|$))", ""), ",", ".")
    us = F.regexp_replace(s, r",(?=\d{3}(\D|$))", "")
    # ambiguity rules (reference tries plain float() first,
    # tablite/datatypes.py:453-503, so single-group forms read as US):
    # "1,000" (comma + exactly 3 digits) → US thousands, not EU decimal;
    # "5.125" (single dot + 3 digits) → US decimal, not EU thousands.
    # EU wins only when unambiguous: ≥2 dot-groups, or dot-groups with a
    # comma decimal, or comma with 1-2/4+ fraction digits.
    looks_eu = (s.rlike(r"^-?\d{1,3}(\.\d{3}){2,}$")
                | s.rlike(r"^-?\d{1,3}(\.\d{3})+,\d+$")
                | s.rlike(r"^-?\d+,(\d{1,2}|\d{4,})$"))
    return F.when(looks_eu, eu).otherwise(us)


def _cast_expr(c: Column, target: str) -> Column:
    """try-cast c to target; invalid → NULL (validity judged separately)."""
    if target == "str":
        return c.cast("string")
    if target == "bool":
        s = F.lower(F.trim(c.cast("string")))
        return (F.when(s.isin("true", "yes", "1"), F.lit(True))
                .when(s.isin("false", "no", "0"), F.lit(False)))
    if target == "int":
        s = _clean_number(c.cast("string"))
        # direct long cast first — routing every int through double
        # silently corrupts magnitudes above 2^53 (found by the
        # hypothesis round-trip property in tests/test_datatype_zoo.py)
        d = s.try_cast("double")
        return F.coalesce(
            s.try_cast("long"),
            # floats with zero fraction are acceptable ints (casters.nim)
            F.when(d == F.floor(d), d.try_cast("long")))
    if target == "float":
        return _clean_number(c.cast("string")).try_cast("double")
    if target == "datetime":
        s = F.trim(c.cast("string"))
        attempts = [F.try_to_timestamp(s, F.lit(fmt)) for fmt in DATETIME_FORMATS]
        # the default parser accepts bare digit runs as a year
        # ("25852" → year 25852, "-1000" → year -1000), which would
        # claim integer columns as datetimes (found by hypothesis);
        # only let it see strings with a separator BETWEEN digits
        sep = s.rlike("[0-9][-/:][0-9]")
        attempts.append(F.when(sep, F.try_to_timestamp(s)))
        return F.coalesce(*attempts)
    if target == "date":
        s = F.trim(c.cast("string"))
        attempts = [F.try_to_timestamp(s, F.lit(fmt)).cast("date") for fmt in DATE_FORMATS]
        return F.coalesce(*attempts)
    if target == "time":
        # no Spark TimeType: µs since midnight as long
        # (convention per SURVEY §1.3; reference sorts time the same way,
        # tablite/sort_utils.py:38-39)
        s = F.trim(c.cast("string"))
        t = F.coalesce(
            F.try_to_timestamp(s, F.lit("HH:mm:ss.SSSSSS")),
            F.try_to_timestamp(s, F.lit("HH:mm:ss")),
            F.try_to_timestamp(s, F.lit("HH:mm")),
        )
        return (F.hour(t).cast("long") * 3600_000_000
                + F.minute(t).cast("long") * 60_000_000
                + F.second(t).cast("long") * 1_000_000)
    raise ValueError(f"unknown column_select type {target!r}; expected {_TYPES}")


def column_select(df: DataFrame, cols: list[dict]) -> tuple[DataFrame, DataFrame]:
    """Returns (pass, fail).

    Each selector: {'column': str, 'type': str, 'allow_empty': bool,
    'rename': str|None} — same shape as the reference API.
    """
    sentinels = [s for s in Config.NONE_SENTINELS if s != ""]
    casted, valid_flags, reasons = [], [], []
    for sel in cols:
        col = sel["column"]
        target = sel.get("type", "str")
        allow_empty = sel.get("allow_empty", False)
        rename = sel.get("rename") or col
        src = F.col(col)
        as_str = F.trim(src.cast("string"))
        is_empty = src.isNull() | (as_str == "") | as_str.isin(sentinels)
        cast_c = _cast_expr(src, target)
        value = F.when(is_empty, F.lit(None)).otherwise(cast_c)
        ok = F.when(is_empty, F.lit(allow_empty)).otherwise(cast_c.isNotNull())
        casted.append(value.alias(rename))
        valid_flags.append(ok)
        reasons.append(
            F.when(~ok,
                   F.concat(F.lit(f"Column {col!r} failed to convert "),
                            F.coalesce(as_str, F.lit("None")),
                            F.lit(f" to {target}"))))
    all_ok = reduce(Column.__and__, valid_flags)
    pass_df = df.filter(all_ok).select(*casted)
    fail_df = (df.withColumn("reject_reason",
                             F.concat_ws("; ", *reasons))
               .filter(~F.coalesce(all_ok, F.lit(False))))
    return pass_df, fail_df
