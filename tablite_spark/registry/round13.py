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
  gibberish/binary quality screen; the census regex is '[^\\n]'
  (code-point aware, newline-excluding) because that is the one
  class JVM regex and RE2 interpret identically — '.' diverges on
  \\r/NEL/LS/PS (r13 ADVICE finding, fixed r14).
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
           CAST(sum(CAST(vc AS HUGEINT) * dt) AS DOUBLE)
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
    code point via regex '[^\\n]' — the newline-excluding class JVM
    regex and RE2 interpret identically (Java '.' also excludes
    \\r/NEL/LS/PS while RE2 '.' excludes only \\n, so '.' diverges on
    CRLF text); entropy rounds at the oracle boundary."""
    from tablite_spark.pipeline.text import char_entropy
    docs = _t(spark, sf, "documents")
    out = char_entropy(docs, "text", "doc_id")
    return out.select("doc_id", "n_chars_counted",
                      "n_distinct_chars",
                      (F.round(F.col("entropy"), 6) + 0)
                      .alias("entropy"))


ROUND13_ORACLES["char_entropy_docs"] = """
    WITH ch AS (
        SELECT doc_id, unnest(regexp_extract_all(text, '[^\n]')) AS c
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
    import datetime
    import tempfile

    import pyarrow as pa

    from tablite_spark.streaming.fixtures import (
        stage_stream_batches, stream_shuffle_partitions)
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
    sent = [pa.table({
        "user_id": [-1],
        "ts": [hi + datetime.timedelta(days=30 * (i + 1))],
        "value": [0.0]}) for i in range(2)]
    src = stage_stream_batches(root, "src", [
        ev.filter(us <= F.lit(int(cut))),
        ev.filter(us > F.lit(int(cut))), sent[0], sent[1]])
    stream = (spark.readStream
              .schema("user_id long, ts timestamp, value double")
              .option("maxFilesPerTrigger", 1)
              .option("latestFirst", "false").parquet(src))
    with stream_shuffle_partitions(spark, src):
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


def mom_growth_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Month-over-month revenue growth per customer nation — the
    period-over-period KPI behind every revenue dashboard. The corpus
    collapses in ONE combinable (nation, month) cents census; the
    lag() window then runs over the CENSUS (|nations| x |months|
    rows), never over row-level data. Revenue is exact cents; growth
    is one division of exact operands, rounded at the oracle
    boundary only because (a-b)/b is a float."""
    from pyspark.sql import Window
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf, "nation").select("n_nationkey", "n_name")
    # customer is a BIG dim at corpus scale — no broadcast hint;
    # AQE picks broadcast at small SF and shuffle-hash at 100 TB.
    # nation (25 rows) is always broadcast.
    cen = (o.join(c, o.o_custkey == c.c_custkey)
           .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
           .groupBy(F.col("n_name").alias("nation"),
                    F.date_trunc("month", F.col("o_orderdate")
                                 .cast("timestamp")).alias("month"))
           .agg((F.sum(F.round(F.col("o_totalprice") * 100, 0))
                 / 100).alias("revenue")))
    w = Window.partitionBy("nation").orderBy("month")
    prev = F.lag("revenue").over(w)
    return cen.select(
        "nation", "month", "revenue",
        (F.round((F.col("revenue") - prev) / prev, 6) + 0)
        .alias("growth"))


ROUND13_ORACLES["mom_growth_orders"] = """
    WITH cen AS (
        SELECT n_name AS nation,
               date_trunc('month', CAST(o_orderdate AS TIMESTAMP))
                   AS month,
               CAST(sum(round(o_totalprice * 100, 0)) AS DOUBLE)
                   / 100 AS revenue
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY 1, 2
    )
    SELECT nation, month, revenue,
           ROUND((revenue - lag(revenue) OVER w)
                 / lag(revenue) OVER w, 6) + 0 AS growth
    FROM cen WINDOW w AS (PARTITION BY nation ORDER BY month)
"""


def hist2d_events(spark: SparkSession, sf: str) -> DataFrame:
    """Bivariate census: event value (25-wide bins, clamped to
    [0, 500)) x hour of day — the 2-D histogram behind density
    heatmaps. Pure integer arithmetic end to end (counts and exact
    integer-ratio shares over a <=480-cell frame), ONE combinable
    groupBy."""
    ev = _t(spark, sf, "events").filter(
        F.col("value").isNotNull() & F.col("ts").isNotNull())
    vbin = F.least(F.floor(F.col("value") / 25).cast("int"),
                   F.lit(19))
    cen = (ev.groupBy(vbin.alias("value_bin"),
                      F.hour(F.col("ts").cast("timestamp"))
                      .alias("hour"))
           .agg(F.count(F.lit(1)).alias("n")))
    total = cen.agg(F.sum("n").alias("__t__"))
    return (cen.crossJoin(F.broadcast(total))
            .select("value_bin", "hour", "n",
                    (F.col("n").cast("double") / F.col("__t__"))
                    .alias("share")))


ROUND13_ORACLES["hist2d_events"] = """
    WITH cen AS (
        SELECT least(CAST(floor(value / 25) AS INT), 19)
                   AS value_bin,
               CAST(hour(CAST(ts AS TIMESTAMP)) AS INT) AS hour,
               count(*) AS n
        FROM events
        WHERE value IS NOT NULL AND ts IS NOT NULL
        GROUP BY 1, 2
    )
    SELECT value_bin, hour, n,
           CAST(n AS DOUBLE) / (SELECT sum(n) FROM cen) AS share
    FROM cen
"""


def fit_apply_scale_events(spark: SparkSession, sf: str) -> DataFrame:
    """Leakage-safe fit/apply standardization: z-score parameters
    (mean, std) FIT on the training period only (events before
    2024-01-15, the midpoint of the generator's 2024-01 event month —
    the r13 cutoff of 1998-06-01 predated the data entirely, making
    the query a vacuous NULL-matches-NULL pass; caught and re-dated
    in r14), APPLIED to the full stream, summarized per event
    type. The fit and every group mean derive from exact integer
    cents sums (Σvc, Σvc², n), so mean/std/avg_z are identical on
    any partitioning and engine — avg_z ships UNROUNDED, computed as
    (Σvc/100 − n·m)/s/n from the exact components rather than a
    float sum of per-row z's. min_z/max_z are order-independent.
    ONE scan per side + a 1-row broadcast: no window, no Python."""
    ev = _t(spark, sf, "events").filter(F.col("value").isNotNull())
    vc = F.round(F.col("value") * 100, 0).cast("long")
    base = ev.select(F.col("event_type"),
                     F.col("ts").cast("timestamp").alias("ts"),
                     vc.alias("vc"))
    fit = (base.filter(F.col("ts") < F.lit("2024-01-15"))
           .agg(F.sum("vc").alias("s1"),
                F.sum(F.col("vc") * F.col("vc")).alias("s2"),
                F.count(F.lit(1)).alias("n")))
    m = F.col("s1").cast("double") / F.col("n") / 100.0
    var = ((F.col("s2").cast("double") / 10000.0
            - F.col("n") * m * m) / (F.col("n") - 1))
    # symmetric empty-train guard (r13 ADVICE): an empty training
    # window leaves Spark's agg with ONE all-NULL row while the
    # oracle's `FROM base, fit` cross join of an empty fit CTE has
    # ZERO rows — dropping the NULL-parameter fit row makes both
    # engines return empty instead of Spark emitting NULL z-scores
    fit = (fit.select(m.alias("__m__"), F.sqrt(var).alias("__s__"))
           .filter(F.col("__m__").isNotNull()))
    g = (base.crossJoin(F.broadcast(fit))
         .groupBy("event_type")
         .agg(F.count(F.lit(1)).alias("n"),
              F.sum("vc").alias("gs"),
              F.min("vc").alias("lo"), F.max("vc").alias("hi"),
              F.first("__m__").alias("__m__"),
              F.first("__s__").alias("__s__")))
    z = lambda c: (c / 100.0 - F.col("__m__")) / F.col("__s__")
    return g.select(
        "event_type", "n",
        ((F.col("gs").cast("double") / 100.0
          - F.col("n") * F.col("__m__"))
         / F.col("__s__") / F.col("n")).alias("avg_z"),
        z(F.col("lo").cast("double")).alias("min_z"),
        z(F.col("hi").cast("double")).alias("max_z"))


ROUND13_ORACLES["fit_apply_scale_events"] = """
    WITH base AS (
        SELECT event_type, CAST(ts AS TIMESTAMP) AS ts,
               CAST(round(value * 100, 0) AS BIGINT) AS vc
        FROM events WHERE value IS NOT NULL
    ), fit AS (
        SELECT CAST(sum(vc) AS DOUBLE) / count(*) / 100.0 AS m,
               sqrt((CAST(sum(vc * vc) AS DOUBLE) / 10000.0
                     - count(*) * (CAST(sum(vc) AS DOUBLE)
                                   / count(*) / 100.0)
                       * (CAST(sum(vc) AS DOUBLE)
                          / count(*) / 100.0))
                    / (count(*) - 1)) AS s
        FROM base WHERE ts < TIMESTAMP '2024-01-15'
    )
    SELECT event_type, count(*) AS n,
           (CAST(sum(vc) AS DOUBLE) / 100.0 - count(*) * m)
               / s / count(*) AS avg_z,
           (CAST(min(vc) AS DOUBLE) / 100.0 - m) / s AS min_z,
           (CAST(max(vc) AS DOUBLE) / 100.0 - m) / s AS max_z
    FROM base, fit GROUP BY event_type, m, s
"""


def item_cosine_lineitem(spark: SparkSession, sf: str) -> DataFrame:
    """Top-5 co-ordered parts per part by basket-cosine (item-based
    collaborative filtering), baskets capped at 5 distinct items —
    the hot-basket valve replayed in the oracle. Cosine is a single
    sqrt of exact integers, so no oracle-boundary rounding; the
    window runs over the min-support pair frame, never the corpus."""
    from tablite_spark.operators.frequency import item_cosine
    li = _t(spark, sf, "lineitem")
    # min_support=2: the part space grows with SF so higher floors
    # empty out (max co-occurrence at sf0.1 is 2) — 2 keeps the
    # output meaningful at every scale (~1.0-1.4k pairs pre-top-k)
    return item_cosine(li, "l_orderkey", "l_partkey",
                       min_support=2, top_k=5, max_basket_size=5)


ROUND13_ORACLES["item_cosine_lineitem"] = """
    WITH base AS (
        SELECT DISTINCT l_orderkey AS bk, l_partkey AS it
        FROM lineitem
        WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL
    ), small AS (
        SELECT bk FROM base GROUP BY 1 HAVING count(*) <= 5
    ), capped AS (
        SELECT base.* FROM base JOIN small USING (bk)
    ), supp AS (
        SELECT it, count(*) AS s FROM capped GROUP BY 1
    ), pairs AS (
        SELECT l.it AS a, r.it AS b, count(*) AS co
        FROM capped l JOIN capped r
          ON l.bk = r.bk AND l.it <> r.it
        GROUP BY 1, 2 HAVING count(*) >= 2
    ), scored AS (
        SELECT a, b, co,
               co / sqrt(CAST(sa.s * sb.s AS DOUBLE)) AS cosine
        FROM pairs
        JOIN supp sa ON pairs.a = sa.it
        JOIN supp sb ON pairs.b = sb.it
    )
    SELECT a, b, co, cosine, CAST(rank AS INT) AS rank FROM (
        SELECT *, row_number() OVER (PARTITION BY a
                      ORDER BY cosine DESC, b ASC) AS rank
        FROM scored
    ) WHERE rank <= 5
"""


def stream_interval_join_events(spark: SparkSession,
                                sf: str) -> DataFrame:
    """Stream-STREAM interval join through TWO real streams:
    purchases (left) join the same user's views (right) within the
    DAY before the purchase. Each side splits at the global median
    timestamp into two mtime-pinned micro-batches, so a view
    arriving in batch 0 must be HELD IN JOIN STATE to match a
    purchase arriving in batch 1 — the cross-batch state retention
    is the thing under test (the 2 h watermark evicts right-side
    state only past watermark − within, which provably retains every
    in-window view). Inner joins emit matches as soon as both sides
    are present, so no sentinel flush is needed. The oracle is the
    plain batch interval join; the result is an exact row set
    (integer-microsecond gap, no floats)."""
    import tempfile

    from tablite_spark.streaming.fixtures import (
        stage_stream_batches, stream_shuffle_partitions)
    from tablite_spark.streaming.ops import stream_interval_join
    ev = (_t(spark, sf, "events")
          .filter(F.col("user_id").isNotNull()
                  & F.col("ts").isNotNull())
          .select("user_id", F.col("ts").cast("timestamp").alias("ts"),
                  "event_id", "event_type"))
    us = F.unix_micros(F.col("ts"))
    cut = ev.agg(F.percentile(us, F.lit(0.5))
                 .alias("m")).collect()[0]["m"]
    root = tempfile.mkdtemp(prefix="sij_stream_")
    sides = {"l": ev.filter(F.col("event_type") == "purchase"),
             "r": ev.filter(F.col("event_type") == "view")}
    streams = {}
    for name, side in sides.items():
        src = stage_stream_batches(root, name, [
            side.filter(us <= F.lit(int(cut))).drop("event_type"),
            side.filter(us > F.lit(int(cut))).drop("event_type")])
        streams[name] = (spark.readStream
                         .schema("user_id long, ts timestamp, "
                                 "event_id long")
                         .option("maxFilesPerTrigger", 1)
                         .option("latestFirst", "false").parquet(src))
    # 1 DAY window: the hour-wide form matches only 3/40 pairs at
    # sf0.001/0.01 — too sparse to exercise cross-batch state; a day
    # gives 80/831 while the 2 h watermark still provably retains
    # every in-window view (eviction floor = watermark − within)
    joined = stream_interval_join(streams["l"], streams["r"],
                                  key="user_id", within="1 day")
    out_cols = joined.select(
        F.col("l.user_id").alias("user_id"),
        F.col("l.event_id").alias("purchase_id"),
        F.col("r.event_id").alias("view_id"),
        (F.unix_micros(F.col("l.ts"))
         - F.unix_micros(F.col("r.ts"))).alias("gap_us"))
    with stream_shuffle_partitions(spark, f"{root}/l", f"{root}/r"):
        q = (out_cols.writeStream.format("parquet")
             .option("path", f"{root}/out")
             .option("checkpointLocation", f"{root}/ckpt")
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination()
    return spark.read.parquet(f"{root}/out")


ROUND13_ORACLES["stream_interval_join_events"] = """
    WITH p AS (
        SELECT user_id, ts, event_id FROM events
        WHERE event_type = 'purchase'
          AND user_id IS NOT NULL AND ts IS NOT NULL
    ), v AS (
        SELECT user_id, ts, event_id FROM events
        WHERE event_type = 'view'
          AND user_id IS NOT NULL AND ts IS NOT NULL
    )
    SELECT p.user_id,
           p.event_id AS purchase_id,
           v.event_id AS view_id,
           epoch_us(p.ts) - epoch_us(v.ts) AS gap_us
    FROM p JOIN v
      ON p.user_id = v.user_id
     AND v.ts <= p.ts
     AND v.ts >= p.ts - INTERVAL 1 DAY
"""
