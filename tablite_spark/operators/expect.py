"""Declarative data-quality expectations — a one-scan constraint
audit over a DataFrame.

Ref parity: tablite validates per-cell on import (``column_select``'s
cast-with-reject, reference ``tablite/redux.py`` filter semantics);
this module is the beyond-reference batch twin a 100 TB ingest
pipeline needs: assert a CONTRACT over a whole table (null rates,
ranges, membership, patterns, uniqueness) and get one auditable row
per rule without re-scanning the corpus per rule.

Scale shape: every row-local rule compiles to a conditional-sum
column of ONE combinable aggregation — k rules cost ONE corpus scan
and a 1-row result, unpivoted driver-side-free via ``stack``.
``unique`` rules ride the same aggregate as ``count - countDistinct``
(two-phase partial distinct, map-side deduped). No collects, no
joins, no windows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["expectations", "referential_check"]


def _violation(rule: dict) -> Column:
    """Row-level violation indicator (1/0) for one rule. NULLs only
    violate ``not_null`` — range/set/pattern checks skip NULL cells
    (compose with a not_null rule to forbid them), mirroring SQL
    three-valued logic so the DuckDB oracle is the same CASE."""
    kind = rule["check"]
    if kind == "where":            # arbitrary boolean Column — may
        return F.sum(               # span several columns, so no
            F.when(~rule["condition"], 1).otherwise(0))  # "column" key
    c = F.col(rule["column"])
    if kind == "not_null":
        cond = c.isNull()
    elif kind == "min":
        cond = c.isNotNull() & (c < F.lit(rule["value"]))
    elif kind == "max":
        cond = c.isNotNull() & (c > F.lit(rule["value"]))
    elif kind == "between":
        lo, hi = rule["low"], rule["high"]
        cond = c.isNotNull() & ~c.between(F.lit(lo), F.lit(hi))
    elif kind == "in_set":
        cond = c.isNotNull() & ~c.isin(*rule["values"])
    elif kind == "regex":
        cond = c.isNotNull() & ~c.rlike(rule["pattern"])
    else:
        raise ValueError(f"unknown expectation check: {kind!r}")
    return F.sum(F.when(cond, 1).otherwise(0))


def expectations(df: DataFrame, rules: list[dict]) -> DataFrame:
    """Audit ``rules`` over ``df`` in one pass. Each rule is a dict:
    ``{"rule": name, "column": col, "check": kind, ...params}`` with
    kinds ``not_null`` / ``min`` / ``max`` / ``between`` / ``in_set``
    / ``regex`` / ``unique`` / ``where``. Returns one row per rule:
    (rule, column, n_rows, violations, pass_rate) — pass_rate an
    exact integer ratio (bit-identical cross-engine). ``where`` rules
    take an arbitrary boolean ``condition`` Column (possibly spanning
    several columns); their ``"column"`` key is optional and defaults
    to ``""`` in the output label.
    """
    if not rules:
        raise ValueError("expectations requires at least one rule")
    names = [r["rule"] for r in rules]
    if len(set(names)) != len(names):
        raise ValueError("duplicate rule names")
    aggs = [F.count(F.lit(1)).alias("__n__")]
    for k, r in enumerate(rules):
        if r["check"] == "unique":
            c = F.col(r["column"])
            v = F.count(c) - F.countDistinct(c)
        else:
            v = _violation(r)
        # sum over an EMPTY table is NULL — an empty table violates
        # nothing, so fold to 0
        aggs.append(F.coalesce(v.cast("long"), F.lit(0))
                    .alias(f"__v{k}__"))
    one = df.agg(*aggs)
    structs = [F.struct(F.lit(r["rule"]).alias("rule"),
                        F.lit(r.get("column", "")).alias("column"),
                        F.col(f"__v{k}__").alias("violations"))
               for k, r in enumerate(rules)]
    out = (one.select(F.col("__n__").alias("n_rows"),
                      F.explode(F.array(*structs)).alias("p"))
           .select("p.rule", F.col("p.column").alias("column"),
                   "n_rows", "p.violations"))
    return out.withColumn(
        "pass_rate",
        F.when(F.col("n_rows") > 0,
               (F.col("n_rows") - F.col("violations")).cast("double")
               / F.col("n_rows")).otherwise(F.lit(None)))


def referential_check(child: DataFrame, fk: str,
                      parent: DataFrame, pk: str) -> DataFrame:
    """Foreign-key integrity audit: count child rows whose non-NULL
    ``fk`` has no match in ``parent.pk``. One row:
    (n_rows, n_nonnull_fk, orphans, ok_rate) — ok_rate an exact
    integer ratio over the non-NULL keys (NULL fk is the not_null
    rule's business, not an orphan).

    Scale shape: parent collapses to its distinct key set (one
    combinable census); ONE left join (keyed shuffle at corpus
    scale, AQE-broadcast when small) + one conditional-sum
    aggregate. Never an anti join PLUS a count — the indicator
    rides a single pass.
    """
    fkc = F.col(fk)
    keys = parent.select(F.col(pk).alias("__pk__")).distinct()
    j = child.join(keys, fkc == F.col("__pk__"), "left")
    return j.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(fkc).alias("n_nonnull_fk"),
        F.coalesce(F.sum(F.when(fkc.isNotNull()
                                & F.col("__pk__").isNull(), 1)
                         .otherwise(0)), F.lit(0)).alias("orphans"),
        F.when(F.count(fkc) > 0,
               (F.count(fkc)
                - F.sum(F.when(fkc.isNotNull()
                               & F.col("__pk__").isNull(), 1)
                        .otherwise(0))).cast("double")
               / F.count(fkc)).alias("ok_rate"))
