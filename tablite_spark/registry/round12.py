"""Round-12 query wave: the three new execution paths of the round,
each under the strict DuckDB value-hash gate.

- ``rolling_global_events`` — UNGROUPED trailing rolling aggregates:
  drives the 4x-span time-bucket + trailing-halo shuffle that
  replaced ``coalesce(1)`` (``operators/timeseries.py:_halo_buckets``).
- ``active_users_interval_events`` — a 45-day active-user window:
  ``engine='auto'`` selects the INTERVAL engine (island deltas +
  day-census prefix sum); the oracle deliberately uses the EXPLODE
  formulation in DuckDB, so the two algorithms check each other.
- ``association_rules_capped_lineitem`` — the hot-basket valve:
  baskets with more than 5 distinct items are dropped BEFORE
  pairing, changing supports/lifts vs the uncapped twin; the oracle
  replays the same size cut.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tablite_spark.registry._base import _t


def rolling_global_events(spark: SparkSession, sf: str) -> DataFrame:
    """Trailing 30-minute rolling avg/count/sum over the WHOLE click
    stream (no grouping key): the kernel buckets the time axis at 4x
    the frame span with a trailing-span halo, so no task ever holds
    more than one bucket — never coalesce(1), never a global window.
    Oracle: DuckDB's unpartitioned RANGE frame."""
    from tablite_spark.operators.timeseries import rolling_agg
    ev = (_t(spark, sf, "events")
          .filter(F.col("event_type") == "click")
          # exact-cents discipline: integer-valued doubles sum
          # EXACTLY on both engines (Kahan add/evict of integers is
          # error-free below 2^53), so sum and avg are the same
          # integer arithmetic cross-engine and need NO rounding —
          # the sf0.1 strict sweep caught both the raw-double form
          # (summation-order drift) and a round(…,4) form (exact
          # half-decimals hit Spark-vs-DuckDB ROUND divergence)
          .withColumn("vc", F.round(F.col("value") * 100, 0)))
    out = rolling_agg(ev, "ts", "vc", [], "30 minutes",
                      funcs=("count", "sum"))
    return out.select(
        "event_id",
        (F.col("roll_sum") / F.col("roll_count") / 100)
        .alias("roll_avg"),
        F.col("roll_count"),
        (F.col("roll_sum") / 100).alias("roll_sum"))


def active_users_interval_events(spark: SparkSession,
                                 sf: str) -> DataFrame:
    """Daily actives + trailing-45-day actives + stickiness via the
    INTERVAL engine (auto-selected for windows > 32 days): per-user
    active-day islands emit +-1 deltas, a calendar-bounded day-census
    prefix sum recovers exact distinct counts — O(pairs·|windows|)
    shuffle where the explode form is O(pairs·45). The DuckDB oracle
    uses the EXPLODE formulation, so the two algorithms must agree
    value-exactly."""
    from tablite_spark.operators.timeseries import active_users
    ev = _t(spark, sf, "events")
    return active_users(ev, "ts", "user_id", windows=(1, 45))


def association_rules_capped_lineitem(spark: SparkSession,
                                      sf: str) -> DataFrame:
    """Association rules with the hot-basket valve engaged: baskets
    over 5 distinct parts are dropped before the |basket|² pairing
    (per-basket census + semi-join), so supports, N(baskets) and
    lifts differ from the uncapped twin. Oracle: the same size cut
    in DuckDB."""
    from tablite_spark.operators.frequency import association_rules
    li = _t(spark, sf, "lineitem")
    return association_rules(li, "l_orderkey", "l_partkey",
                             min_support=2, k=50, max_basket_size=5)


ROUND12_ORACLES: dict[str, str] = {
    "rolling_global_events": """
        WITH c AS (
            SELECT event_id, ts, ROUND(value * 100, 0) AS vc
            FROM events WHERE event_type = 'click'
        )
        SELECT event_id,
               sum(vc) OVER w / count(vc) OVER w / 100 AS roll_avg,
               count(vc) OVER w AS roll_count,
               sum(vc) OVER w / 100 AS roll_sum
        FROM c
        WINDOW w AS (ORDER BY ts
                     RANGE BETWEEN INTERVAL 30 MINUTES PRECEDING
                     AND CURRENT ROW)
    """,
    "active_users_interval_events": """
        WITH pairs AS (
            SELECT DISTINCT user_id AS u,
                   date_trunc('day', ts) AS d
            FROM events
            WHERE ts IS NOT NULL AND user_id IS NOT NULL
        ), days AS (SELECT DISTINCT d AS day FROM pairs),
        expl AS (
            SELECT u, o.off,
                   d + to_days(CAST(o.off AS INT)) AS day
            FROM pairs, (SELECT unnest(range(0, 45)) AS off) o
        ), per AS (
            SELECT day,
                   count(DISTINCT CASE WHEN off < 1 THEN u END)
                       AS au_1,
                   count(DISTINCT CASE WHEN off < 45 THEN u END)
                       AS au_45
            FROM expl GROUP BY 1
        )
        SELECT days.day, au_1, au_45,
               CAST(au_1 AS DOUBLE) / au_45 AS stickiness
        FROM days JOIN per ON days.day = per.day
    """,
    "association_rules_capped_lineitem": """
        WITH b0 AS (
            SELECT DISTINCT l_orderkey AS bk, l_partkey AS it
            FROM lineitem
            WHERE l_orderkey IS NOT NULL
              AND l_partkey IS NOT NULL
        ), keep AS (
            SELECT bk FROM b0 GROUP BY bk HAVING count(*) <= 5
        ), base AS (
            SELECT b0.bk, b0.it FROM b0 JOIN keep USING (bk)
        ), supp AS (
            SELECT it, count(*) AS s FROM base GROUP BY 1
        ), nb AS (
            SELECT count(DISTINCT bk) AS n FROM base
        ), pairs AS (
            SELECT l.it AS a, r.it AS b, count(*) AS support
            FROM base l JOIN base r
              ON l.bk = r.bk AND l.it <> r.it
            GROUP BY 1, 2 HAVING count(*) >= 2
        )
        SELECT a, b, support,
               CAST(support AS DOUBLE) / sa.s AS confidence,
               CAST(nb.n AS DOUBLE) * support
                   / (CAST(sa.s AS DOUBLE) * sb.s) AS lift
        FROM pairs
        JOIN supp sa ON pairs.a = sa.it
        JOIN supp sb ON pairs.b = sb.it, nb
        ORDER BY CAST(nb.n AS DOUBLE) * support
                 / (CAST(sa.s AS DOUBLE) * sb.s) DESC, a, b
        LIMIT 50
    """,
}
