"""Round-14 scale burn-ins. Run manually:
``python tools/burnin_r14.py [name]`` with name in {session_hot,
outer_sij, dedup_wm, replay_sink, rank_50m, session_timeout_hot}
(default: all). Results are transcribed into PLANS.md.

Contract boundaries exercised:

- **session_hot** (VERDICT r13 task 6): streaming session windows
  with ONE user owning 20% of a 10M-event stream, split into two
  micro-batches so the hot user's sessions OPEN in batch 0 and
  MERGE/extend in batch 1. The question is whether session-merge
  state grows with the hot key's event count: it must not — Spark's
  session state stores one row per OPEN session (merged on update),
  so the hot user costs one state row like everyone else as long as
  its events chain into sessions. Verified against the
  gaps-and-islands batch truth (a different algorithm: lag window +
  cumulative session ids) and the state-store peak is read from the
  query's progress metrics, not guessed.
- **outer_sij**: the LEFT-OUTER stream-stream interval join at
  4M x 4M with a quarter of the lefts UNMATCHED — the state question
  is the outer-specific one: unmatched lefts are held until the
  watermark proves no match, then emitted null-padded via the
  sentinel-flush discipline. Matched AND unmatched counts must equal
  the batch left-join truth exactly.
- **dedup_wm**: ``dropDuplicatesWithinWatermark`` at 10M rows where
  HALF the feed is duplicate pairs straddling the batch boundary;
  output must equal the 5M distinct rows exactly, with bounded
  per-key state (one row per key within the horizon).
- **replay_sink**: the forced batch-replay exactly-once sink at 5M
  rows — after the crash-window simulation (commit marker deleted)
  the restart replays batch 0 idempotently; the final census must be
  exact (zero dupes, zero drops).
- **rank_50m**: ``distributed_row_number`` over 50M rows: the rank
  must be a permutation of 1..N (sum + min/max + per-bucket
  continuity) and must agree with a driver-side sort on a 10k
  sample; wall time is the 100x rehearsal for the RFM/Lorenz shapes.
"""
from __future__ import annotations

import glob
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tablite_spark import get_spark


def _loadavg() -> str:
    return ", ".join(f"{x:.1f}" for x in os.getloadavg())


def _stage_two_batches(root, name, df, cut_us, schema,
                       files_per_batch=4):
    src = f"{root}/{name}"
    os.makedirs(src, exist_ok=True)
    us = F.unix_micros(F.col("ts"))
    for i, part in enumerate((df.filter(us <= cut_us),
                              df.filter(us > cut_us))):
        stage = f"{root}/stage_{name}{i}"
        part.coalesce(files_per_batch).write.mode(
            "overwrite").parquet(stage)
        for j, f in enumerate(sorted(
                glob.glob(f"{stage}/part-*.parquet"))):
            dst = f"{src}/b{i}_{j}.parquet"
            shutil.copy(f, dst)
            t = 1_700_000_000 + i * 600
            os.utime(dst, (t, t))
    return src


def session_hot():
    """10M events, user 0 owns 20% (2M events), 30-min session gap,
    two micro-batches split at the time median so sessions straddle
    the boundary."""
    from tablite_spark.streaming.ops import session_aggregate
    spark = get_spark("burnin_session_hot")
    n = 10_000_000
    # ts advances 1 s per event id; the hot user takes every 5th
    # event (so its events are 5 s apart -> ONE giant session that
    # spans both batches); cold users cycle over 100k ids with
    # ~500 s between consecutive events of the same user (< 30 min
    # gap -> long multi-batch sessions for them too).
    base = (spark.range(n)
            .select(F.when(F.col("id") % 5 == 0, F.lit(0))
                    .otherwise(1 + F.col("id") % 100_000)
                    .alias("user_id"),
                    F.timestamp_micros(
                        F.lit(1_700_000_000_000_000)
                        + F.col("id") * 1_000_000).alias("ts"),
                    (F.col("id") % 100 / 10.0).alias("value")))
    hot_n = base.filter("user_id = 0").count()
    root = tempfile.mkdtemp(prefix="burnin_sess_")
    cut = 1_700_000_000_000_000 + (n // 2) * 1_000_000
    src = _stage_two_batches(root, "src", base, cut,
                             "user_id long, ts timestamp, "
                             "value double")
    stream = (spark.readStream
              .schema("user_id long, ts timestamp, value double")
              .option("maxFilesPerTrigger", 4)
              .option("latestFirst", "false").parquet(src))
    # two sentinel batches flush every closed session (r13 pattern)
    sent_ts = 1_700_000_000_000_000 + (n + 10_000_000) * 1_000_000
    for i in range(2):
        sdf = spark.createDataFrame(
            [(-1, sent_ts // 1_000_000 + i * 86_400, 0.0)],
            "user_id long, ts_s long, value double").select(
            "user_id", F.timestamp_seconds("ts_s").alias("ts"),
            "value")
        stage = f"{root}/sent{i}"
        sdf.coalesce(1).write.mode("overwrite").parquet(stage)
        dst = f"{src}/sent{i}.parquet"
        shutil.copy(glob.glob(f"{stage}/part-*.parquet")[0], dst)
        t = 1_700_000_000 + (2 + i) * 600
        os.utime(dst, (t, t))
    t0 = time.time()
    q = (session_aggregate(stream, gap="30 minutes",
                           watermark="2 hours")
         .writeStream.format("parquet")
         .option("path", f"{root}/out")
         .option("checkpointLocation", f"{root}/ckpt")
         .outputMode("append").trigger(availableNow=True).start())
    state_peak = 0
    while q.isActive:
        p = q.lastProgress
        if p and p.get("stateOperators"):
            state_peak = max(state_peak,
                             p["stateOperators"][0]["numRowsTotal"])
        time.sleep(0.5)
    q.awaitTermination()
    dt = time.time() - t0
    got = (spark.read.parquet(f"{root}/out")
           .filter("user_id >= 0")
           .select("user_id",
                   F.col("session_window.start").alias("s"),
                   "n_events", "session_value"))
    # batch truth: gaps-and-islands (lag + cumulative new-session
    # flags) — a DIFFERENT algorithm than session_window state merge
    from pyspark.sql import Window
    w = Window.partitionBy("user_id").orderBy("ts")
    ns = F.when(
        (F.unix_micros(F.col("ts"))
         - F.unix_micros(F.lag("ts").over(w))).isNull()
        | ((F.unix_micros(F.col("ts"))
            - F.unix_micros(F.lag("ts").over(w)))
           >= 1_800_000_000), 1).otherwise(0)
    truth = (base.withColumn("__ns__", ns)
             .withColumn("__sid__", F.sum("__ns__").over(
                 w.rowsBetween(Window.unboundedPreceding, 0)))
             .groupBy("user_id", "__sid__")
             .agg(F.min("ts").alias("s"),
                  F.count(F.lit(1)).alias("n_events"),
                  F.sum("value").alias("session_value")))
    diff = (got.select("user_id", "s", "n_events")
            .exceptAll(truth.select("user_id", "s", "n_events"))
            .count()
            + truth.select("user_id", "s", "n_events")
            .exceptAll(got.select("user_id", "s", "n_events"))
            .count())
    n_sessions = got.count()
    hot_sessions = got.filter("user_id = 0").count()
    print(f"session_hot: 10M events, hot user {hot_n} "
          f"({hot_n / n:.0%}), 2 batches + 2 sentinels -> "
          f"{n_sessions} sessions ({hot_sessions} hot) in {dt:.1f}s; "
          f"state peak {state_peak} rows; truth diff {diff} "
          f"(loadavg {_loadavg()})")
    assert diff == 0, diff
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


def outer_sij():
    """4M x 3M left-outer interval join: users 0..99,999; every left
    at ts=2k+1 s has its right at 2k s EXCEPT ids where k % 4 == 3
    (right dropped -> unmatched left, ~1M null-padded rows)."""
    from tablite_spark.streaming.ops import stream_interval_join
    spark = get_spark("burnin_outer_sij")
    n = 4_000_000
    base = (spark.range(2 * n)
            .select(((F.col("id") / 2).cast("long") % 100_000)
                    .alias("user_id"),
                    F.timestamp_micros(
                        F.lit(1_700_000_000_000_000)
                        + F.col("id") * 1_000_000).alias("ts"),
                    F.col("id").alias("event_id"),
                    (F.col("id") % 2 == 1).alias("is_left"),
                    ((F.col("id") / 2).cast("long") % 4 == 3)
                    .alias("gap")))
    left_b = base.filter("is_left").drop("is_left", "gap")
    right_b = base.filter("NOT is_left AND NOT gap") \
                  .drop("is_left", "gap")
    root = tempfile.mkdtemp(prefix="burnin_osij_")
    cut = 1_700_000_000_000_000 + n * 1_000_000
    streams = {}
    hi_us = 1_700_000_000_000_000 + 2 * n * 1_000_000
    for name, side in (("l", left_b), ("r", right_b)):
        src = _stage_two_batches(
            root, name, side, cut,
            "user_id long, ts timestamp, event_id long")
        # two sentinel batches per side flush the unmatched lefts
        for i in range(2):
            sdf = spark.createDataFrame(
                [(-1, hi_us // 1_000_000 + (i + 1) * 864_000, -1)],
                "user_id long, ts_s long, event_id long").select(
                "user_id", F.timestamp_seconds("ts_s").alias("ts"),
                "event_id")
            stage = f"{root}/sent_{name}{i}"
            sdf.coalesce(1).write.mode("overwrite").parquet(stage)
            dst = f"{src}/sent{i}.parquet"
            shutil.copy(glob.glob(f"{stage}/part-*.parquet")[0], dst)
            t = 1_700_000_000 + (2 + i) * 600
            os.utime(dst, (t, t))
        streams[name] = (spark.readStream
                         .schema("user_id long, ts timestamp, "
                                 "event_id long")
                         .option("maxFilesPerTrigger", 4)
                         .option("latestFirst", "false").parquet(src))
    t0 = time.time()
    j = stream_interval_join(streams["l"], streams["r"],
                             key="user_id", within="10 minutes",
                             watermark="30 minutes", how="leftOuter")
    out = j.select(F.col("l.event_id").alias("pid"),
                   F.col("r.event_id").alias("vid"),
                   F.col("l.user_id").alias("u"))
    q = (out.writeStream.format("parquet")
         .option("path", f"{root}/out")
         .option("checkpointLocation", f"{root}/ckpt")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    dt = time.time() - t0
    res = spark.read.parquet(f"{root}/out").filter("u >= 0")
    got_m = res.filter("vid IS NOT NULL").count()
    got_u = res.filter("vid IS NULL").count()
    truth = (left_b.alias("l").join(
        right_b.alias("r"),
        (F.col("l.user_id") == F.col("r.user_id"))
        & (F.col("r.ts") <= F.col("l.ts"))
        & (F.col("r.ts") >= F.col("l.ts")
           - F.expr("INTERVAL 10 minutes")), "left"))
    want_m = truth.filter("r.event_id IS NOT NULL").count()
    want_u = truth.filter("r.event_id IS NULL").count()
    print(f"outer_sij: 4M left x 3M right, 2 batches + 2 sentinels "
          f"per side -> {got_m} matched + {got_u} null-padded in "
          f"{dt:.1f}s; batch truth {want_m}/{want_u} "
          f"(loadavg {_loadavg()})")
    assert (got_m, got_u) == (want_m, want_u)
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


def dedup_wm():
    """10M-row feed = 5M distinct rows delivered twice, the second
    copy in the later batch; dropDuplicatesWithinWatermark must emit
    exactly the 5M distinct rows."""
    from tablite_spark.streaming.ops import stream_dedup
    spark = get_spark("burnin_dedup_wm")
    n = 5_000_000
    distinct = (spark.range(n)
                .select(F.col("id").alias("k"),
                        F.timestamp_micros(
                            F.lit(1_700_000_000_000_000)
                            + F.col("id") * 100_000).alias("ts")))
    root = tempfile.mkdtemp(prefix="burnin_ddwm_")
    src = f"{root}/src"
    os.makedirs(src)
    for i, part in enumerate((distinct, distinct)):
        stage = f"{root}/stage{i}"
        part.coalesce(4).write.mode("overwrite").parquet(stage)
        for j, f in enumerate(sorted(
                glob.glob(f"{stage}/part-*.parquet"))):
            dst = f"{src}/b{i}_{j}.parquet"
            shutil.copy(f, dst)
            t = 1_700_000_000 + i * 600
            os.utime(dst, (t, t))
    stream = (spark.readStream.schema("k long, ts timestamp")
              .option("maxFilesPerTrigger", 4)
              .option("latestFirst", "false").parquet(src))
    t0 = time.time()
    q = (stream_dedup(stream, ["k"], watermark="30 days")
         .writeStream.format("parquet")
         .option("path", f"{root}/out")
         .option("checkpointLocation", f"{root}/ckpt")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    dt = time.time() - t0
    got = spark.read.parquet(f"{root}/out").count()
    uniq = spark.read.parquet(f"{root}/out").select("k") \
        .distinct().count()
    print(f"dedup_wm: 10M rows (5M dup pairs across batches) -> "
          f"{got} survivors ({uniq} distinct) in {dt:.1f}s "
          f"(loadavg {_loadavg()})")
    assert got == n and uniq == n, (got, uniq)
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


def replay_sink():
    """5M rows through the exactly-once sink with the forced batch-0
    replay; final census must be exact."""
    from tablite_spark.streaming.ops import exactly_once_parquet_sink
    spark = get_spark("burnin_replay_sink")
    n = 5_000_000
    df = spark.range(n).select(F.col("id"),
                               (F.col("id") % 1000 / 10.0)
                               .alias("v"))
    root = tempfile.mkdtemp(prefix="burnin_e1x_")
    src = f"{root}/src"
    os.makedirs(src)
    halves = [df.filter(F.col("id") < n // 2),
              df.filter(F.col("id") >= n // 2)]

    def land(i, part):
        stage = f"{root}/stage{i}"
        part.coalesce(4).write.mode("overwrite").parquet(stage)
        for j, f in enumerate(sorted(
                glob.glob(f"{stage}/part-*.parquet"))):
            dst = f"{src}/b{i}_{j}.parquet"
            shutil.copy(f, dst)
            t = 1_700_000_000 + i * 600
            os.utime(dst, (t, t))

    def run():
        stream = (spark.readStream.schema("id long, v double")
                  .option("maxFilesPerTrigger", 4).parquet(src))
        q = exactly_once_parquet_sink(stream, f"{root}/out",
                                      f"{root}/ckpt")
        q.awaitTermination()

    t0 = time.time()
    land(0, halves[0])
    run()
    os.remove(f"{root}/ckpt/commits/0")
    crc = f"{root}/ckpt/commits/.0.crc"
    if os.path.exists(crc):
        os.remove(crc)
    land(1, halves[1])
    run()
    dt = time.time() - t0
    out = spark.read.parquet(f"{root}/out")
    got, uniq = out.count(), out.select("id").distinct().count()
    ssum = out.agg(F.sum("id")).collect()[0][0]
    print(f"replay_sink: 5M rows, forced batch-0 replay -> {got} "
          f"rows ({uniq} distinct, id-sum {ssum}) in {dt:.1f}s "
          f"(loadavg {_loadavg()})")
    assert got == uniq == n and ssum == n * (n - 1) // 2
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


def rank_50m():
    """distributed_row_number over 50M rows (key collisions + unique
    tiebreak): permutation checks (sum, min/max, bucket continuity)
    plus a 10k-sample order check against a driver-side sort."""
    from tablite_spark.functions.buckets import distributed_row_number
    spark = get_spark("burnin_rank50m")
    n = 50_000_000
    df = (spark.range(n)
          .select((F.col("id") * 2654435761 % 1_000_000)
                  .alias("k"), F.col("id")))
    t0 = time.time()
    ranked, total = distributed_row_number(df, ["k", "id"], "r")
    agg = ranked.agg(F.sum("r").alias("s"), F.min("r").alias("lo"),
                     F.max("r").alias("hi"),
                     F.count(F.lit(1)).alias("c")).collect()[0]
    dt = time.time() - t0
    assert total == n and agg["c"] == n
    assert agg["lo"] == 1 and agg["hi"] == n
    assert agg["s"] == n * (n + 1) // 2, agg["s"]
    samp = (ranked.sample(False, 10_000 / n, seed=7)
            .select("k", "id", "r").collect())
    samp_by_rank = sorted(samp, key=lambda x: x["r"])
    samp_by_key = sorted(samp, key=lambda x: (x["k"], x["id"]))
    assert samp_by_rank == samp_by_key
    print(f"rank_50m: 50M rows ranked in {dt:.1f}s; sum/min/max/"
          f"sample-order checks pass (loadavg {_loadavg()})")
    spark.stop()


def session_timeout_hot():
    """The EVENT-TIME-TIMEOUT sessionizer at the session_hot shape
    (10M events, one user owning 20%): per-key state is ONE open
    session tuple regardless of the hot key's event count, interior
    sessions emit on the data path, and the trailing ~100k sessions
    flush through actual timeout firings. Truth = the same
    gaps-and-islands batch computation."""
    from tablite_spark.streaming.ops import streaming_session_timeout
    spark = get_spark("burnin_sess_to")
    n = 10_000_000
    base = (spark.range(n)
            .select(F.when(F.col("id") % 5 == 0, F.lit(0))
                    .otherwise(1 + F.col("id") % 100_000)
                    .alias("user_id"),
                    F.timestamp_micros(
                        F.lit(1_700_000_000_000_000)
                        + F.col("id") * 1_000_000).alias("ts"),
                    F.when(F.col("id") % 97 == 0, "purchase")
                    .otherwise("view").alias("event_type")))
    root = tempfile.mkdtemp(prefix="burnin_sessto_")
    cut = 1_700_000_000_000_000 + (n // 2) * 1_000_000
    src = _stage_two_batches(root, "src", base, cut,
                             "user_id long, ts timestamp, "
                             "event_type string")
    sent_us = 1_700_000_000_000_000 + (n + 10_000_000) * 1_000_000
    for i in range(2):
        sdf = spark.createDataFrame(
            [(-1, sent_us // 1_000_000 + i * 86_400, "view")],
            "user_id long, ts_s long, event_type string").select(
            "user_id", F.timestamp_seconds("ts_s").alias("ts"),
            "event_type")
        stage = f"{root}/sent{i}"
        sdf.coalesce(1).write.mode("overwrite").parquet(stage)
        dst = f"{src}/sent{i}.parquet"
        shutil.copy(glob.glob(f"{stage}/part-*.parquet")[0], dst)
        t = 1_700_000_000 + (2 + i) * 600
        os.utime(dst, (t, t))
    stream = (spark.readStream
              .schema("user_id long, ts timestamp, "
                      "event_type string")
              .option("maxFilesPerTrigger", 4)
              .option("latestFirst", "false").parquet(src))
    t0 = time.time()
    q = (streaming_session_timeout(stream)
         .writeStream.format("parquet")
         .option("path", f"{root}/out")
         .option("checkpointLocation", f"{root}/ckpt")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    dt = time.time() - t0
    got = (spark.read.parquet(f"{root}/out")
           .filter("user_id >= 0")
           .select("user_id", F.col("session_start").alias("s"),
                   "n_events", "purchased"))
    from pyspark.sql import Window
    w = Window.partitionBy("user_id").orderBy("ts")
    gap = (F.unix_micros(F.col("ts"))
           - F.unix_micros(F.lag("ts").over(w)))
    ns = F.when(gap.isNull() | (gap >= 1_800_000_000), 1).otherwise(0)
    truth = (base.withColumn("__ns__", ns)
             .withColumn("__sid__", F.sum("__ns__").over(
                 w.rowsBetween(Window.unboundedPreceding, 0)))
             .groupBy("user_id", "__sid__")
             .agg(F.min("ts").alias("s"),
                  F.count(F.lit(1)).alias("n_events"),
                  F.max(F.col("event_type") == "purchase")
                  .alias("purchased")))
    cols = ["user_id", "s", "n_events", "purchased"]
    diff = (got.select(cols).exceptAll(truth.select(cols)).count()
            + truth.select(cols).exceptAll(got.select(cols)).count())
    n_sessions = got.count()
    print(f"session_timeout_hot: 10M events, hot user 20% -> "
          f"{n_sessions} sessions in {dt:.1f}s; truth diff {diff} "
          f"(loadavg {_loadavg()})")
    assert diff == 0, diff
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


ALL = {"session_hot": session_hot, "outer_sij": outer_sij,
       "dedup_wm": dedup_wm, "replay_sink": replay_sink,
       "rank_50m": rank_50m,
       "session_timeout_hot": session_timeout_hot}

if __name__ == "__main__":
    names = sys.argv[1:] or list(ALL)
    for nm in names:
        ALL[nm]()
