"""Round-13 query wave — four new capabilities, each under the
strict DuckDB value-hash gate AND the dtype-CLASS gate added to
tools/check_oracle.py this round (every integer-valued oracle
aggregate is CAST(... AS BIGINT); every float either exact-by-
construction or ROUND(..., n) + 0 on both sides).

- ``time_weighted_avg_events`` — TWAP per user: exact
  integer-cents × integer-microseconds accumulation in
  decimal(38,0)/HUGEINT, so the single final division is the only
  float op and NO rounding is needed at the oracle boundary.
- ``nelson_aalen_events`` — cumulative-hazard companion to the
  Kaplan-Meier query, on the same distributed census-prefix engine
  (no global-order window over row-level data).
- ``char_entropy_docs`` — per-document code-point entropy, the
  gibberish/binary quality screen; JVM regex and RE2 agree on '.'
  (code-point aware, newline-excluding), so the census is identical
  across engines.
- ``conversion_lag_events`` — first-view → first-subsequent-purchase
  latency per user; combinable min-aggregates + one keyed join, no
  window over the event stream.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tablite_spark.registry._base import _t

ROUND13_ORACLES: dict[str, str] = {}


def time_weighted_avg_events(spark: SparkSession,
                             sf: str) -> DataFrame:
    """Per-user time-weighted average order value over the user's
    event history (each value holds until the user's next event;
    ties broken by event_id). Exact: cents × microseconds accumulate
    in decimal(38,0) (Spark) / HUGEINT (DuckDB), both exact, so the
    final double division is bit-identical on any partitioning —
    twa and span_s ship UNROUNDED."""
    from tablite_spark.operators.timeseries import time_weighted_avg
    ev = _t(spark, sf, "events").filter(F.col("user_id").isNotNull())
    out = time_weighted_avg(ev, ["user_id"], "ts", "value",
                            tiebreak="event_id")
    return out.orderBy("user_id")


ROUND13_ORACLES["time_weighted_avg_events"] = """
    WITH base AS (
        SELECT user_id, epoch_us(ts) AS us,
               CAST(round(value * 100, 0) AS BIGINT) AS vc,
               lead(epoch_us(ts)) OVER (
                   PARTITION BY user_id
                   ORDER BY ts, event_id) AS nxt
        FROM events
        WHERE user_id IS NOT NULL AND ts IS NOT NULL
          AND value IS NOT NULL
    ), seg AS (
        SELECT user_id, vc, nxt - us AS dt
        FROM base WHERE nxt IS NOT NULL
    )
    SELECT user_id,
           count(*) + 1 AS n_obs,
           CAST(sum(dt) AS DOUBLE) / 1000000.0 AS span_s,
           CAST(sum(vc * dt) AS DOUBLE)
               / CAST(sum(dt) AS DOUBLE) / 100.0 AS twa
    FROM seg GROUP BY 1 HAVING sum(dt) > 0
"""


def nelson_aalen_events(spark: SparkSession, sf: str) -> DataFrame:
    """Nelson-Aalen cumulative hazard over event values as durations
    (non-'error' = observed, 'error' = censored) — the additive twin
    of ``km_survival_events``, same census, H(t) = Σ d/n instead of
    Π(1 − d/n). Hazard rounds at the oracle boundary (float addition
    groups differ across engines by construction)."""
    from tablite_spark.operators.stats import nelson_aalen
    ev = _t(spark, sf, "events")
    out = nelson_aalen(ev, "value",
                       F.col("event_type") != F.lit("error"))
    return out.select("duration", "n_at_risk", "n_events",
                      (F.round(F.col("cumhaz"), 6) + 0)
                      .alias("cumhaz"))


ROUND13_ORACLES["nelson_aalen_events"] = """
    WITH c AS (
        SELECT value AS t,
               count(*) FILTER (event_type <> 'error') AS d,
               count(*) FILTER (event_type = 'error') AS cns
        FROM events WHERE value IS NOT NULL GROUP BY 1
    ), w AS (
        SELECT t, d, cns,
               sum(d + cns) OVER (ORDER BY t) AS cum,
               (SELECT sum(d + cns) FROM c) AS N
        FROM c
    ), r AS (
        SELECT t, d, N - cum + d + cns AS n_risk FROM w
    ), s AS (
        SELECT t, d, n_risk,
               sum(CAST(d AS DOUBLE) / n_risk)
                   OVER (ORDER BY t) AS cumhaz
        FROM r
    )
    SELECT t AS duration, CAST(n_risk AS BIGINT) AS n_at_risk,
           d AS n_events, ROUND(cumhaz, 6) + 0 AS cumhaz
    FROM s WHERE d > 0
"""


def char_entropy_docs(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document character-level Shannon entropy (nats) — the
    gibberish/binary screen of a pretraining filter stack. Census by
    code point via regex '.' (JVM and RE2 agree); entropy rounds at
    the oracle boundary."""
    from tablite_spark.pipeline.text import char_entropy
    docs = _t(spark, sf, "documents")
    out = char_entropy(docs, "text", "doc_id")
    return out.select("doc_id", "n_chars_counted",
                      "n_distinct_chars",
                      (F.round(F.col("entropy"), 6) + 0)
                      .alias("entropy"))


ROUND13_ORACLES["char_entropy_docs"] = """
    WITH ch AS (
        SELECT doc_id, unnest(regexp_extract_all(text, '.')) AS c
        FROM documents
    ), cnt AS (
        SELECT doc_id, c, count(*) AS n FROM ch GROUP BY 1, 2
    ), per AS (
        SELECT doc_id, sum(n) AS n, count(*) AS nd,
               sum(n * ln(CAST(n AS DOUBLE))) AS clc
        FROM cnt GROUP BY 1
    )
    SELECT doc_id, CAST(n AS BIGINT) AS n_chars_counted,
           nd AS n_distinct_chars,
           ROUND(ln(CAST(n AS DOUBLE)) - clc / n, 6) + 0 AS entropy
    FROM per
"""


def conversion_lag_events(spark: SparkSession, sf: str) -> DataFrame:
    """First 'view' → first subsequent 'purchase' latency per user:
    the conversion-lag census behind funnel SLAs. Two combinable
    min-aggregates and ONE keyed join — no window over the event
    stream, so a power-user key costs a map-side partial, not a
    single-task sort. Lag is exact integer microseconds."""
    ev = (_t(spark, sf, "events")
          .filter(F.col("user_id").isNotNull()
                  & F.col("ts").isNotNull()))
    fv = (ev.filter(F.col("event_type") == "view")
          .groupBy("user_id")
          .agg(F.min("ts").alias("first_view")))
    pu = (ev.filter(F.col("event_type") == "purchase")
          .join(fv, "user_id")
          .filter(F.col("ts") >= F.col("first_view"))
          .groupBy("user_id", "first_view")
          .agg(F.min("ts").alias("first_purchase")))
    lag_us = (F.unix_micros(F.col("first_purchase").cast("timestamp"))
              - F.unix_micros(F.col("first_view").cast("timestamp")))
    return pu.select("user_id",
                     F.col("first_view").cast("timestamp")
                     .alias("first_view"),
                     F.col("first_purchase").cast("timestamp")
                     .alias("first_purchase"),
                     lag_us.alias("lag_us"))


ROUND13_ORACLES["conversion_lag_events"] = """
    WITH fv AS (
        SELECT user_id, min(ts) AS first_view
        FROM events
        WHERE user_id IS NOT NULL AND ts IS NOT NULL
          AND event_type = 'view'
        GROUP BY 1
    )
    SELECT e.user_id, fv.first_view,
           min(e.ts) AS first_purchase,
           epoch_us(min(e.ts)) - epoch_us(fv.first_view) AS lag_us
    FROM events e JOIN fv ON e.user_id = fv.user_id
    WHERE e.event_type = 'purchase' AND e.ts >= fv.first_view
      AND e.ts IS NOT NULL
    GROUP BY 1, 2
"""


def stream_session_events(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming SESSION windows (30-min inactivity gap), driver-
    oracled with a REAL StreamingQuery: the events split at the
    median timestamp into two mtime-pinned micro-batches, so a
    user's session can OPEN in batch 0 and extend in batch 1 — the
    merge-across-batches state path is the thing under test. Two
    trailing sentinel batches (one far-future row each) push the
    event-time watermark past every real session: Spark applies the
    watermark computed at the END of batch N to batch N+1, so the
    first sentinel finalizes nothing and the second flushes all
    closed sessions in append mode. Values ride as integer cents
    (exact summation in any order); the DuckDB oracle is the
    gaps-and-islands formulation with the session_window boundary
    rule (gap >= 30 min starts a NEW session — an event at exactly
    start+gap is outside the half-open [start, last+gap) window)."""
    import glob
    import os
    import shutil
    import tempfile

    from tablite_spark.streaming.ops import session_aggregate
    ev = (_t(spark, sf, "events")
          .filter(F.col("user_id").isNotNull()
                  & F.col("ts").isNotNull())
          .select("user_id", F.col("ts").cast("timestamp").alias("ts"),
                  F.round(F.col("value") * 100, 0).alias("value")))
    us = F.unix_micros(F.col("ts"))
    cut, hi = ev.agg(
        F.percentile(us, F.lit(0.5)).alias("m"),
        F.max("ts").alias("hi")).collect()[0]
    root = tempfile.mkdtemp(prefix="sess_stream_")
    src = f"{root}/src"
    os.makedirs(src)
    import datetime
    sent = [ev.sparkSession.createDataFrame(
        [(-1, hi + datetime.timedelta(days=30 * (i + 1)), 0.0)],
        "user_id long, ts timestamp, value double") for i in range(2)]
    parts = [ev.filter(us <= F.lit(int(cut))),
             ev.filter(us > F.lit(int(cut))), sent[0], sent[1]]
    for i, part in enumerate(parts):
        stage = f"{root}/stage{i}"
        part.coalesce(1).write.mode("overwrite").parquet(stage)
        dst = f"{src}/batch{i}.parquet"
        shutil.copy(glob.glob(f"{stage}/part-*.parquet")[0], dst)
        t = 1_700_000_000 + i * 600
        os.utime(dst, (t, t))
    stream = (spark.readStream
              .schema("user_id long, ts timestamp, value double")
              .option("maxFilesPerTrigger", 1)
              .option("latestFirst", "false").parquet(src))
    q = (session_aggregate(stream, gap="30 minutes",
                           watermark="2 hours")
         .writeStream.format("parquet")
         .option("path", f"{root}/out")
         .option("checkpointLocation", f"{root}/ckpt")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    out = spark.read.parquet(f"{root}/out")
    return (out.filter(F.col("user_id") >= 0)
            .select("user_id",
                    F.col("session_window.start")
                    .alias("session_start"),
                    "n_events",
                    (F.col("session_value") / 100.0)
                    .alias("session_value")))


ROUND13_ORACLES["stream_session_events"] = """
    WITH o AS (
        SELECT user_id, ts, round(value * 100, 0) AS vc,
               CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w)
                         IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                         >= 1800000000
                    THEN 1 ELSE 0 END AS ns
        FROM events
        WHERE user_id IS NOT NULL AND ts IS NOT NULL
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), s AS (
        SELECT user_id, ts, vc,
               sum(ns) OVER (PARTITION BY user_id
                             ORDER BY ts) AS sid
        FROM o
    )
    SELECT user_id, min(ts) AS session_start,
           count(*) AS n_events,
           CAST(sum(vc) AS DOUBLE) / 100.0 AS session_value
    FROM s GROUP BY user_id, sid
"""
