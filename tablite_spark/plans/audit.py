"""Physical-plan audit helpers — the 100 TB feedback loop.

The reference engine hand-rolls its physical concerns (pages, process
pools); on Spark the equivalent discipline is *checking the plan
Catalyst produced*: are filters pushed into the parquet scan, are
column projections pruned, did the small side broadcast, how many
shuffles does the plan carry, how wide are the codegen spans?

These helpers parse ``df._jdf.queryExecution()`` formatted output so
tests (tests/test_plans.py) can assert plan shape, not just result
values — a correct-but-unscalable plan fails CI here.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def _explain(df: DataFrame, mode: str) -> str:
    # same path df.explain() prints through; works on Spark 3.4+/4.x
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def _formatted(df: DataFrame) -> str:
    return _explain(df, "formatted")


def _simple(df: DataFrame) -> str:
    return _explain(df, "simple")


def pushed_filters(df: DataFrame) -> list[str]:
    """All non-empty PushedFilters entries from the file scans."""
    out = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", _formatted(df)):
        body = m.group(1).strip()
        if body:
            out.append(body)
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of every parquet scan — shows column pruning."""
    return [m.group(1) for m in
            re.finditer(r"ReadSchema: (\S+)", _formatted(df))]


def broadcast_join_count(df: DataFrame) -> int:
    return len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoopJoin",
                          _simple(df)))


def shuffle_count(df: DataFrame) -> int:
    """Exchange operators in the plan (each is a full shuffle of its
    input). AQE may later coalesce/eliminate some, but plan-time count
    is the upper bound worth minimizing."""
    return len(re.findall(r"Exchange (hashpartitioning|rangepartitioning|"
                          r"RoundRobinPartitioning|SinglePartition)",
                          _simple(df)))


def codegen_stage_count(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans (fewer + wider = better).

    Caveat: under AQE the pre-execution plan hides codegen spans (they
    appear once stages are materialized), so this returns 0 for an
    unexecuted AdaptiveSparkPlan — run the frame first (e.g. noop
    write) and re-explain to see the final spans."""
    ids = set(re.findall(r"WholeStageCodegen \((\d+)\)", _formatted(df)))
    return len(ids)


def plan_report(df: DataFrame) -> dict:
    """One-call scale audit of a DataFrame's physical plan."""
    return {
        "pushed_filters": pushed_filters(df),
        "read_schemas": read_schemas(df),
        "broadcast_joins": broadcast_join_count(df),
        "shuffles": shuffle_count(df),
        "codegen_stages": codegen_stage_count(df),
    }
