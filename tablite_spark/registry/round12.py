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


def merge_upsert_orders(spark: SparkSession, sf: str) -> DataFrame:
    """CDC MERGE INTO over orders: keys ending in 0 are deleted,
    keys ending in 1 get TWO updates (seq 1: +500; seq 2: +1000 and
    status 'X' — the seq collapse must keep the later one), and a
    synthetic insert feed adds keys+1e9 for keys ending in 2. The
    per-status census of the merged table is the check; money rides
    exact integer cents. Oracle: the final state stated directly in
    SQL (the collapse itself is the Spark-side semantics under
    test)."""
    from tablite_spark.operators.merge import merge_upsert
    o = _t(spark, sf, "orders")
    k = F.col("o_orderkey")
    dels = (o.filter(k % 10 == 0)
            .select("*", F.lit("D").alias("op"), F.lit(1).alias("seq")))
    upd1 = (o.filter(k % 10 == 1)
            .withColumn("o_totalprice", F.col("o_totalprice") + 500)
            .select("*", F.lit("U").alias("op"), F.lit(1).alias("seq")))
    upd2 = (o.filter(k % 10 == 1)
            .withColumn("o_totalprice", F.col("o_totalprice") + 1000)
            .withColumn("o_orderstatus", F.lit("X"))
            .select("*", F.lit("U").alias("op"), F.lit(2).alias("seq")))
    ins = (o.filter(k % 10 == 2)
           .withColumn("o_orderkey", k + 1_000_000_000)
           .select("*", F.lit("U").alias("op"), F.lit(1).alias("seq")))
    changes = dels.unionByName(upd1).unionByName(upd2).unionByName(ins)
    merged = merge_upsert(o, changes, ["o_orderkey"], seq_col="seq")
    return (merged.groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"),
                 (F.sum(F.round(F.col("o_totalprice") * 100, 0)) / 100)
                 .alias("sum_price")))


def multi_touch_events(spark: SparkSession, sf: str) -> DataFrame:
    """Linear + U-shaped multi-touch attribution of purchase values
    to view/click touches, paths resetting at each purchase;
    event_id breaks timestamp ties so positions are deterministic.
    Values ride exact integer cents; the per-channel credit sums are
    rounded to 4 on both engines. Oracle: the same path/position
    windows in DuckDB."""
    from tablite_spark.operators.timeseries import (
        multi_touch_attribution,
    )
    ev = (_t(spark, sf, "events")
          .withColumn("vc", F.round(F.col("value") * 100, 0) / 100))
    out = multi_touch_attribution(ev, "user_id", "ts", "event_type",
                                  "vc", "purchase", ["view", "click"],
                                  tiebreak="event_id")
    return out.select("channel", "n_touches",
                      F.round(F.col("linear_value"), 4)
                      .alias("linear_value"),
                      F.round(F.col("ushape_value"), 4)
                      .alias("ushape_value"))


def skew_report_lineitem(spark: SparkSession, sf: str) -> DataFrame:
    """Join-planning skew census of lineitem's supplier key: top-20
    heavy keys + the per-key-count distribution (p50/p99 exact
    percentile_cont, max, skew factor). All integer counts and
    single integer divisions — unrounded, bit-exact cross-engine.
    Oracle: the same census in DuckDB."""
    from tablite_spark.operators.skew import skew_report
    li = _t(spark, sf, "lineitem")
    return skew_report(li, "l_suppkey", top_k=20)


ROUND12_ORACLES.update({
    "merge_upsert_orders": """
        WITH kept AS (
            SELECT o_orderkey, o_orderstatus, o_totalprice
            FROM orders WHERE o_orderkey % 10 NOT IN (0, 1)
        ), upd AS (
            SELECT o_orderkey, 'X' AS o_orderstatus,
                   o_totalprice + 1000 AS o_totalprice
            FROM orders WHERE o_orderkey % 10 = 1
        ), ins AS (
            SELECT o_orderkey + 1000000000 AS o_orderkey,
                   o_orderstatus, o_totalprice
            FROM orders WHERE o_orderkey % 10 = 2
        ), merged AS (
            SELECT * FROM kept UNION ALL
            SELECT * FROM upd UNION ALL
            SELECT * FROM ins
        )
        SELECT o_orderstatus, count(*) AS n,
               SUM(ROUND(o_totalprice * 100, 0)) / 100 AS sum_price
        FROM merged GROUP BY 1
    """,
    "multi_touch_events": """
        WITH e AS (
            SELECT user_id, ts, event_id, event_type,
                   ROUND(value * 100, 0) / 100 AS vc,
                   COALESCE(SUM(CASE WHEN event_type = 'purchase'
                                     THEN 1 ELSE 0 END)
                            OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING), 0) AS p
            FROM events
        ), conv AS (
            SELECT user_id, p, vc AS v FROM e
            WHERE event_type = 'purchase'
        ), tch AS (
            SELECT user_id, p, event_type AS channel,
                   row_number() OVER w AS pos,
                   count(*) OVER (PARTITION BY user_id, p) AS kk
            FROM e WHERE event_type IN ('view', 'click')
            WINDOW w AS (PARTITION BY user_id, p
                         ORDER BY ts, event_id)
        ), credited AS (
            SELECT t.channel, c.v, t.kk, t.pos,
                   CASE WHEN t.kk = 1 THEN 1.0
                        WHEN t.kk = 2 THEN 0.5
                        WHEN t.pos = 1 THEN 0.4
                        WHEN t.pos = t.kk THEN 0.4
                        ELSE 0.2 / (t.kk - 2) END AS u
            FROM tch t JOIN conv c
              ON t.user_id = c.user_id AND t.p = c.p
        ), per AS (
            SELECT channel, count(*) AS n_touches,
                   ROUND(SUM(v / kk), 4) + 0 AS linear_value,
                   ROUND(SUM(v * u), 4) + 0 AS ushape_value
            FROM credited GROUP BY 1
        ), orphan AS (
            SELECT CAST(NULL AS VARCHAR) AS channel,
                   count(*) AS n_touches,
                   ROUND(SUM(v), 4) + 0 AS linear_value,
                   ROUND(SUM(v), 4) + 0 AS ushape_value
            FROM conv c
            WHERE NOT EXISTS (SELECT 1 FROM tch t
                              WHERE t.user_id = c.user_id
                                AND t.p = c.p)
            HAVING count(*) > 0
        )
        SELECT * FROM per UNION ALL SELECT * FROM orphan
    """,
    "skew_report_lineitem": """
        WITH census AS (
            SELECT l_suppkey AS key, count(*) AS cnt
            FROM lineitem WHERE l_suppkey IS NOT NULL
            GROUP BY 1
        ), dist AS (
            SELECT CAST(SUM(cnt) AS BIGINT) AS n_rows,
                   count(*) AS n_keys,
                   quantile_cont(cnt, 0.5) AS p50_cnt,
                   quantile_cont(cnt, 0.99) AS p99_cnt,
                   MAX(cnt) AS max_cnt
            FROM census
        ), top AS (
            SELECT key, cnt,
                   row_number() OVER (ORDER BY cnt DESC, key) AS rank
            FROM census ORDER BY cnt DESC, key LIMIT 20
        )
        SELECT rank, CAST(key AS VARCHAR) AS key, cnt,
               CAST(cnt AS DOUBLE) / n_rows AS share,
               n_rows, n_keys, p50_cnt, p99_cnt, max_cnt,
               CAST(max_cnt AS DOUBLE) / p50_cnt AS skew_factor
        FROM top, dist
    """,
})


def stream_upsert_events(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming CDC compaction twin, driver-oracled with a REAL
    StreamingQuery: events become a change feed (key = user_id,
    seq = event_id, op = D on purchases else U, val =
    NULL-coalesced cents-rounded value), split at the median
    timestamp into two mtime-pinned micro-batches so each user's
    winning change can land in either batch — the last-write-wins
    state and the cumulative change count must CROSS the batch
    boundary. The final per-key state (max cumulative count, seq
    tiebreak) is the check; the batch oracle is one max_by census
    in DuckDB."""
    import tempfile

    from tablite_spark.streaming.fixtures import (
        stage_stream_batches, stream_shuffle_partitions)
    from tablite_spark.streaming.ops import streaming_upsert_compact
    ev = _t(spark, sf, "events").filter(
        F.col("user_id").isNotNull())
    feed = ev.select(
        F.col("user_id").alias("key"),
        F.col("event_id").alias("seq"),
        F.when(F.col("event_type") == "purchase", "D")
        .otherwise("U").alias("op"),
        F.coalesce(F.round(F.col("value"), 2), F.lit(-1.0))
        .alias("val"),
        F.col("ts"))
    # NULL-ts rows must land in SOME batch (the oracle counts every
    # feed row; a bare `us <= cut` / `us > cut` pair drops them from
    # both) — route them to batch 0 via coalesce
    us = F.coalesce(
        F.unix_micros(F.col("ts").cast("timestamp")), F.lit(0))
    cut = feed.agg(F.percentile(us, F.lit(0.5))
                   .alias("m")).collect()[0]["m"]
    root = tempfile.mkdtemp(prefix="upsert_stream_")
    src = stage_stream_batches(root, "src", [
        feed.filter(us <= F.lit(int(cut))).drop("ts"),
        feed.filter(us > F.lit(int(cut))).drop("ts")])
    stream = (spark.readStream
              .schema("key long, seq long, op string, val double")
              .option("maxFilesPerTrigger", 1)
              .option("latestFirst", "false").parquet(src))
    with stream_shuffle_partitions(spark, src):
        q = (streaming_upsert_compact(stream)
             .writeStream.format("parquet")
             .option("path", f"{root}/out")
             .option("checkpointLocation", f"{root}/ckpt")
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination()
    out = spark.read.parquet(f"{root}/out")
    # final state per key = the emission with the greatest
    # cumulative count (ties impossible: n strictly increases per
    # emission)
    final = (out.groupBy("key")
             .agg(F.max_by(F.struct("seq", "op", "val"), "n_changes")
                  .alias("s"),
                  F.max("n_changes").alias("n_changes")))
    return final.select(F.col("key").alias("user_id"),
                        F.col("s.seq").alias("last_seq"),
                        F.col("s.op").alias("last_op"),
                        F.col("s.val").alias("last_val"),
                        "n_changes")


ROUND12_ORACLES.update({
    "stream_upsert_events": """
        WITH feed AS (
            SELECT user_id AS key, event_id AS seq,
                   CASE WHEN event_type = 'purchase'
                        THEN 'D' ELSE 'U' END AS op,
                   COALESCE(ROUND(value, 2), -1.0) AS val
            FROM events WHERE user_id IS NOT NULL
        )
        SELECT key AS user_id,
               max(seq) AS last_seq,
               max_by(op, seq) AS last_op,
               max_by(val, seq) AS last_val,
               count(*) AS n_changes
        FROM feed GROUP BY 1
    """,
})


def top_k_per_group_lineitem(spark: SparkSession, sf: str) -> DataFrame:
    """Top-3 lineitems by extended price per supplier —
    deterministic under price ties via the (orderkey, linenumber)
    tiebreak. Runs the default window engine (supplier groups are
    uniform); the salted skew engine is pytest-verified equal and
    burn-in-documented as the valve for groups a single window task
    cannot sort. Oracle: the row_number window formulation in
    DuckDB."""
    from tablite_spark.operators.groupby import top_k_per_group
    li = _t(spark, sf, "lineitem").select(
        "l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice")
    out = top_k_per_group(li, ["l_suppkey"], "l_extendedprice", 3,
                          tiebreak=["l_orderkey", "l_linenumber"])
    return out.select("l_suppkey", "rank", "l_orderkey",
                      "l_linenumber", "l_extendedprice")


ROUND12_ORACLES.update({
    "top_k_per_group_lineitem": """
        SELECT l_suppkey, rank, l_orderkey, l_linenumber,
               l_extendedprice
        FROM (
            SELECT l_suppkey, l_orderkey, l_linenumber,
                   l_extendedprice,
                   row_number() OVER (
                       PARTITION BY l_suppkey
                       ORDER BY l_extendedprice DESC,
                                l_orderkey, l_linenumber) AS rank
            FROM lineitem
        ) WHERE rank <= 3
    """,
})
