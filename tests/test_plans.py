"""Physical-plan shape assertions — the scale gate.

Correct results with a bad plan (full-width scans, missed pushdown,
shuffle-heavy joins) would still pass the value oracle but die at
100 TB; these tests pin the plan properties that matter there.
"""

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from tablite_spark.plans import (
    broadcast_join_count, plan_report, pushed_filters, read_schemas,
    shuffle_count,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def qs():
    return entry_mod.queries()


def test_q1_filter_pushed_to_scan(spark, qs):
    df = qs["q1_pricing_summary"](spark, SF)
    pushed = " ".join(pushed_filters(df))
    assert "l_shipdate" in pushed and "LessThanOrEqual" in pushed


def test_q1_column_pruning(spark, qs):
    """lineitem has 16 columns; q1 must scan only the 6 it touches."""
    df = qs["q1_pricing_summary"](spark, SF)
    schemas = read_schemas(df)
    assert len(schemas) == 1
    n_cols = schemas[0].count(":")
    assert n_cols <= 6, f"scan reads {n_cols} columns: {schemas[0]}"


def test_q1_single_shuffle(spark, qs):
    """Partial (map-side) agg + one exchange + final agg — no more."""
    assert shuffle_count(qs["q1_pricing_summary"](spark, SF)) == 1


def test_q5_broadcasts_small_dims(spark, qs):
    """supplier/nation/region must broadcast, not shuffle."""
    assert broadcast_join_count(qs["q5_nation_revenue"](spark, SF)) >= 3


def test_filter_no_shuffle(spark, qs):
    """A pure filter+project is scan-only: zero exchanges."""
    r = plan_report(qs["filter_pass"](spark, SF))
    assert r["shuffles"] == 0
    assert r["pushed_filters"], "filter not pushed to parquet scan"


def test_topk_broadcasts_queries(spark, qs):
    """brute-force ANN: the small query set broadcasts; the corpus is
    scanned once and never shuffled pre-ranking."""
    assert broadcast_join_count(qs["embedding_topk"](spark, SF)) >= 1


def test_plan_report_keys(spark, qs):
    r = plan_report(qs["q1_pricing_summary"](spark, SF))
    assert set(r) == {"pushed_filters", "read_schemas", "broadcast_joins",
                      "shuffles", "codegen_stages"}


def test_partial_aggregation_happens(spark, qs):
    """Map-side partial agg must precede the exchange (Spark's
    equivalent of the reference's single-pass accumulators)."""
    from tablite_spark.plans.audit import _formatted
    s = _formatted(qs["q1_pricing_summary"](spark, SF))
    assert "partial_sum" in s
    # the partial-agg node is described before the Exchange node
    assert s.index("partial_sum") < s.index("(5) Exchange")
