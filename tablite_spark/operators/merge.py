"""merge.where — SQL-CASE column merge — and merge_upsert, the CDC
MERGE INTO twin.

Reference: ``Table.merge(left, right, new, criteria)``
(tablite/core.py:660-702, tablite/merge.py:7-50): new column = left
value where criteria holds else right value; both source columns are
dropped. Pure projection — no shuffle, stays in whole-stage codegen.

``merge_upsert`` is beyond-reference: applying a change feed
(insert/update/delete rows keyed like the base table) is how a
100 TB curated corpus stays current without rewriting it from
scratch — the batch half of the SCD2 / incremental-dedup family
already in this package.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["merge_where", "merge_upsert"]


def merge_where(df: DataFrame, left: str, right: str, new: str,
                criteria: Column) -> DataFrame:
    """``CASE WHEN criteria THEN left ELSE right END AS new``, dropping
    the source columns (tablite/merge.py:7-50)."""
    out = df.withColumn(new, F.when(criteria, F.col(left)).otherwise(F.col(right)))
    keep = [c for c in out.columns if c not in (left, right)]
    return out.select(*keep)


def merge_upsert(base: DataFrame, changes: DataFrame,
                 key_cols: list[str], op_col: str = "op",
                 seq_col: str | None = None) -> DataFrame:
    """Apply a change feed to ``base`` — ANSI ``MERGE INTO``
    semantics with last-write-wins:

    - ``changes`` carries the base's columns plus ``op_col`` with
      values ``'U'`` (upsert: replace the keyed row, or insert it if
      absent) and ``'D'`` (delete the keyed row; a delete for an
      absent key is a no-op).
    - With ``seq_col`` (a change-sequence / commit-timestamp column,
      NOT emitted), multiple changes per key collapse to the
      highest-sequence one BEFORE applying — the CDC compaction
      step. Without it, changes must be unique per key (duplicate
      keys would pick an arbitrary winner, so that contract is the
      caller's to uphold; the collapse still makes the result
      deterministic by preferring the row with the greatest struct
      of data columns).

    Returns a frame with exactly the base's schema.

    Scale shape: the change feed (normally ≪ base) collapses with
    ONE combinable ``max_by`` groupBy — never a window over the
    feed — then ONE full-outer keyed join against base; both sides
    shuffle hash(key) once and AQE broadcasts a small collapsed
    feed at runtime. Deletes are a post-join filter; no second scan,
    no anti join + union formulation (which would pay two joins).
    """
    if not key_cols:
        raise ValueError("merge_upsert needs at least one key column")
    data_cols = [c for c in base.columns if c not in key_cols]
    missing = [c for c in base.columns + [op_col]
               if c not in changes.columns]
    if missing:
        raise ValueError(f"changes is missing columns: {missing}")
    # op codes outside {'U','D'} (incl. NULL) fail loudly at scan
    # time — a typo'd 'u'/'delete' must not silently upsert
    op = F.col(op_col)
    valid_op = F.when(op.isin("U", "D"), op).otherwise(
        F.raise_error(F.concat(
            F.lit(f"merge_upsert: {op_col} must be 'U' or 'D', got "),
            F.coalesce(op.cast("string"), F.lit("NULL")))))
    payload = F.struct(valid_op.alias("__op__"),
                       *[F.col(c) for c in data_cols])
    order = F.col(seq_col) if seq_col is not None else payload
    latest = (changes.groupBy(*key_cols)
              .agg(F.max_by(payload, order).alias("__c__")))
    j = base.alias("b").join(latest.alias("c"), key_cols, "full")
    changed = F.col("__c__").isNotNull()
    out = j.filter(
        # a D change kills the row (matched or not); everything else
        # survives: base-only rows, and U upserts/inserts
        ~(changed & (F.col("__c__.__op__") == "D")))
    # the USING-style join already coalesces the key columns
    sel = [F.col(k) for k in key_cols]
    sel += [F.when(changed, F.col(f"__c__.{c}"))
            .otherwise(F.col(f"b.{c}")).alias(c) for c in data_cols]
    return out.select(*sel)
