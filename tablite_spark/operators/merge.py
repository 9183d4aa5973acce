"""merge.where — SQL-CASE column merge.

Reference: ``Table.merge(left, right, new, criteria)``
(tablite/core.py:660-702, tablite/merge.py:7-50): new column = left
value where criteria holds else right value; both source columns are
dropped. Pure projection — no shuffle, stays in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def merge_where(df: DataFrame, left: str, right: str, new: str,
                criteria: Column) -> DataFrame:
    """``CASE WHEN criteria THEN left ELSE right END AS new``, dropping
    the source columns (tablite/merge.py:7-50)."""
    out = df.withColumn(new, F.when(criteria, F.col(left)).otherwise(F.col(right)))
    keep = [c for c in out.columns if c not in (left, right)]
    return out.select(*keep)
