"""Set-ish table operators: concat, stack, repeat, diff, equality.

Reference semantics:
- concat ``t1 += t2`` requires identical column sets, any order
  (tablite/base.py:1493-1537) → ``unionByName``.
- ``stack`` unions tables with different columns, missing filled None
  (tablite/base.py:1640-1663) → ``unionByName(allowMissingColumns=True)``.
- repeat ``t * n`` (tablite/base.py:1464-1491) → explode over a lit
  array (narrow, no shuffle — the Spark analogue of page-pointer copy).
- ``diff`` (tablite/diff.py:8-88) is an order-sensitive LCS diff; the
  scalable form here is a set-style full-outer diff with +/-/= markers
  (exact LCS only makes sense driver-side on small tables).
- equality ``t1 == t2`` content equality (tablite/base.py:1320-1344).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def concat(a: DataFrame, b: DataFrame) -> DataFrame:
    if set(a.columns) != set(b.columns):
        raise ValueError(
            f"concat requires identical column sets: {sorted(set(a.columns) ^ set(b.columns))} differ")
    return a.unionByName(b)


def stack(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.unionByName(b, allowMissingColumns=True)


def repeat(df: DataFrame, n: int) -> DataFrame:
    """``t * n``: each partition emits its rows n times in place —
    no shuffle, no driver round-trip."""
    if n < 0:
        raise ValueError("repeat count must be >= 0")
    if n == 0:
        return df.limit(0)
    return (df.withColumn("__rep__", F.explode(F.array_repeat(F.lit(1), n)))
            .drop("__rep__"))


def table_diff(a: DataFrame, b: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Set-style diff with multiplicity: marker '=' rows in both,
    '-' only in first, '+' only in second (reference markers:
    tablite/diff.py:8-88; its order-sensitive 'r' replace marker is an
    LCS artifact that has no distributed analogue).

    Plan: count rows per tuple on each side (two partial-agg shuffles),
    full-outer join the counts, emit markers with multiplicities.
    """
    columns = columns or [c for c in a.columns if c in b.columns]
    ca = a.select(columns).groupBy(columns).agg(F.count(F.lit(1)).alias("__na__"))
    cb = b.select(columns).groupBy(columns).agg(F.count(F.lit(1)).alias("__nb__"))
    cond = [ca[c].eqNullSafe(cb[c]) for c in columns]
    j = ca.join(cb, on=cond, how="full")
    na = F.coalesce(F.col("__na__"), F.lit(0))
    nb = F.coalesce(F.col("__nb__"), F.lit(0))
    merged = j.select(
        *[F.coalesce(ca[c], cb[c]).alias(c) for c in columns],
        na.alias("__na__"), nb.alias("__nb__"),
    )
    eq = merged.withColumn("__cnt__", F.least(F.col("__na__"), F.col("__nb__"))) \
               .filter(F.col("__cnt__") > 0).withColumn("marker", F.lit("="))
    only_a = merged.withColumn("__cnt__", F.col("__na__") - F.col("__nb__")) \
                   .filter(F.col("__cnt__") > 0).withColumn("marker", F.lit("-"))
    only_b = merged.withColumn("__cnt__", F.col("__nb__") - F.col("__na__")) \
                   .filter(F.col("__cnt__") > 0).withColumn("marker", F.lit("+"))
    out = eq.unionByName(only_a).unionByName(only_b)
    # expand multiplicities back into rows
    out = out.withColumn("__x__", F.explode(F.sequence(F.lit(1), F.col("__cnt__"))))
    return out.select("marker", *columns)


def table_diff_lcs(a: DataFrame, b: DataFrame,
                   columns: list[str] | None = None,
                   max_rows: int = 100_000) -> DataFrame:
    """Order-sensitive LCS diff — exact reference semantics
    (tablite/diff.py:8-88): difflib.SequenceMatcher over row tuples,
    marker columns ``1st``/``2nd`` with values ``=``(equal),
    ``r``(replace, emits the second table's rows), insert → (``-``,
    ``+``), delete → (``+``, ``-``).

    LCS is inherently sequential, so this path collects to the driver
    and is guarded by ``max_rows`` — at scale use :func:`table_diff`
    (hash-join multiplicity diff) instead.
    """
    import difflib

    columns = columns or [c for c in a.columns if c in b.columns]
    for frame in (a, b):
        missing = [c for c in columns if c not in frame.columns]
        if missing:
            raise ValueError(f"column '{missing[0]}' not found")
    na, nb = a.count(), b.count()
    if na > max_rows or nb > max_rows:
        raise ValueError(
            f"table_diff_lcs is driver-side; {max(na, nb)} rows exceeds "
            f"max_rows={max_rows} — use table_diff for large tables")
    t1 = [tuple(r) for r in a.select(columns).collect()]
    t2 = [tuple(r) for r in b.select(columns).collect()]

    def _unique(name: str) -> str:
        while name in columns:
            name += "_1"
        return name

    first, second = _unique("1st"), _unique("2nd")
    out_rows = []
    for opc, t1a, t1b, t2a, t2b in difflib.SequenceMatcher(
            None, t1, t2).get_opcodes():
        if opc == "insert":
            out_rows += [r + ("-", "+") for r in t2[t2a:t2b]]
        elif opc == "delete":
            out_rows += [r + ("+", "-") for r in t1[t1a:t1b]]
        elif opc == "equal":
            out_rows += [r + ("=", "=") for r in t2[t2a:t2b]]
        elif opc == "replace":
            out_rows += [r + ("r", "r") for r in t2[t2a:t2b]]
    spark = a.sparkSession
    fields = [a.select(columns).schema[c] for c in columns]
    from pyspark.sql.types import StringType, StructField, StructType
    schema = StructType(fields + [StructField(first, StringType()),
                                  StructField(second, StringType())])
    return spark.createDataFrame(out_rows, schema)


def frames_equal(a: DataFrame, b: DataFrame) -> bool:
    """``t1 == t2`` — multiset content equality (tablite/base.py:1320-1344).
    The reference compares ``columns.keys()`` as a SET and looks
    columns up by name (order-insensitive), so a column-reordered
    table is equal; rows compare as a multiset (the only stable notion
    on a distributed frame)."""
    if set(a.columns) != set(b.columns):
        return False
    b = b.select(*a.columns)  # align column order before schema/row compare
    if a.schema != b.schema:
        return False
    return a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def hstack_by_position(a: DataFrame, b: DataFrame) -> DataFrame:
    """Column assignment from another table (t['x'] = other['col'],
    tablite/base.py:1161-1203): align by row position. Positional
    alignment requires a total order — we use each frame's current
    order via row index, one narrow shuffle per side. Extra rows on
    either side follow python-zip-longest-with-None (the reference
    pads short columns with None on read)."""
    from tablite_spark.operators.sorting import with_row_index
    ai = with_row_index(a, "__hs_idx__")
    bi = with_row_index(b, "__hs_idx__")
    return ai.join(bi, on="__hs_idx__", how="full").drop("__hs_idx__")
