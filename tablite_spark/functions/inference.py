"""Type inference over string columns — ``DataTypes.guess`` semantics.

Reference: string→type inference tries [datetime, date, time, int,
bool, float, str] in rank-adaptive order (tablite/datatypes.py:453-503,
Rank bubble-sort :729-753; Nim mirror nimlite/ranking.nim:47-99).

Spark-first: instead of per-value python dispatch, compute per-column
match COUNTS for each candidate type in one aggregation pass (all
regex/try_cast expressions are JVM codegen'd), then pick the best type
per column — the distributed analogue of rank-adaptive inference. The
actual cast then goes through operators.select.column_select.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tablite_spark.config import Config
from tablite_spark.operators.select import _cast_expr

# tried most-specific-first, mirroring the reference's rank order
# (datatypes.py:453-503) except date precedes datetime so that pure
# dates don't get widened (Spark's timestamp parser accepts bare
# dates; format-anchored date parse rejects datetimes).
CANDIDATES = ("date", "time", "datetime", "int", "bool", "float")


def guess_types(df: DataFrame, columns: list[str] | None = None) -> dict[str, str]:
    """Return {column: inferred_type} with types from
    (bool,int,float,date,time,datetime,str)."""
    columns = columns or [f.name for f in df.schema.fields
                          if f.dataType.simpleString() == "string"]
    sentinels = [s for s in Config.NONE_SENTINELS if s != ""]
    aggs = []
    for col in columns:
        s = F.trim(F.col(col).cast("string"))
        non_empty = F.col(col).isNotNull() & (s != "") & ~s.isin(sentinels)
        aggs.append(F.sum(non_empty.cast("long")).alias(f"{col}__n"))
        for t in CANDIDATES:
            ok = non_empty & _cast_expr(F.col(col), t).isNotNull()
            aggs.append(F.sum(ok.cast("long")).alias(f"{col}__{t}"))
    row = df.agg(*aggs).first()
    out = {}
    for col in columns:
        n = row[f"{col}__n"] or 0
        chosen = "str"
        if n:
            for t in CANDIDATES:
                if row[f"{col}__{t}"] == n:
                    chosen = t
                    break
            # int wins over float only if float also fully matches;
            # candidate order already encodes specificity.
        out[col] = chosen
    return out


def apply_guessed_types(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Infer + cast in place (values that fail the winning cast become
    null, mirroring the reference's None sentinels)."""
    guessed = guess_types(df, columns)
    out = df
    for col, t in guessed.items():
        if t != "str":
            out = out.withColumn(col, _cast_expr(F.col(col), t))
    return out
