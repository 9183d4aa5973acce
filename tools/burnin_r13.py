"""Round-13 scale burn-ins (VERDICT r12 item 5). Run manually:
``python tools/burnin_r13.py [name]`` with name in {cdc_zipf,
stream_zipf, twa_hot, nelson_10m, entropy_bigdocs} (default: all). Results are transcribed into PLANS.md.

Contract boundaries exercised:

- **cdc_zipf**: batch ``merge_upsert`` on a ZIPFIAN change feed —
  10M changes over 1M keys where ONE hot entity carries 1% of the
  whole feed (100k changes; real CDC feeds are power-law, the r12
  burn-in was uniform). The skew lands on the max_by feed-collapse
  groupBy, which is COMBINABLE: partial aggregation absorbs the hot
  key map-side, so each of the 32 tasks ships at most one (key,
  struct) partial upstream and the post-collapse full-outer join
  sees EXACTLY ONE row per key on the change side — the join is
  structurally skew-free and AQE's skew split has nothing to do.
  This script verifies that claim, not just asserts it: it checks
  the collapsed-side row count equals the key count, and the final
  state matches an INDEPENDENT truth (winner row located by a
  (key, max seq) self-join, a different algorithm than the
  single-pass max_by).
- **stream_zipf**: ``streaming_upsert_compact`` over the same hot
  key through a REAL two-batch StreamingQuery — the hot key's 100k
  in-batch changes hash to one state task, but they arrive as ONE
  group whose pandas collapse is O(group); state stays one record
  per key. Final compacted state must match the batch truth on
  every key.
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

N_CHANGES = 10_000_000
N_KEYS = 1_000_000
HOT_SHARE = 100_000            # 1% of the feed on key 0


def _feed(spark, n=N_CHANGES):
    """Deterministic zipfian-ish change feed: first HOT_SHARE
    changes hit key 0, the rest spread uniformly; 5% deletes."""
    return (spark.range(n)
            .select(
                F.when(F.col("id") < HOT_SHARE, F.lit(0))
                .otherwise(F.col("id") % N_KEYS).alias("key"),
                F.col("id").alias("seq"),
                F.when((F.col("id") * 2654435761 % 100) < 5, "D")
                .otherwise("U").alias("op"),
                ((F.col("id") % 10000) / 100.0).alias("val")))


def _base(spark):
    return (spark.range(N_KEYS)
            .select(F.col("id").alias("key"),
                    F.lit(-1.0).alias("val")))


def _truth(spark, base, feed):
    """Independent last-write-wins truth: winner per key located by
    a (key, max seq) equi-join back into the feed — no max_by."""
    win = feed.groupBy("key").agg(F.max("seq").alias("seq"))
    winner = feed.join(win, ["key", "seq"])
    kept = (base.join(winner.select("key", "op", "val")
                      .withColumnRenamed("val", "__nv__")
                      .withColumnRenamed("op", "__op__"),
                      "key", "left")
            .filter(F.coalesce(F.col("__op__"), F.lit("U")) != "D")
            .select("key", F.coalesce("__nv__", "val").alias("val")))
    inserts = (winner.join(base, "key", "left_anti")
               .filter(F.col("op") != "D")
               .select("key", "val"))
    return kept.unionByName(inserts)


def cdc_zipf():
    from tablite_spark.operators.merge import merge_upsert
    spark = get_spark("burnin_cdc_zipf")
    feed = _feed(spark)
    base = _base(spark)
    # claim check 1: the collapse output is |keys|-bounded even with
    # the hot key — the join side can never be skewed
    from pyspark.sql import functions as F2
    n_keys_touched = feed.select("key").distinct().count()
    t0 = time.time()
    out = merge_upsert(base, feed, ["key"], seq_col="seq")
    n_final = out.count()
    dt = time.time() - t0
    truth = _truth(spark, base, feed)
    diff = out.exceptAll(truth).count() + truth.exceptAll(out).count()
    load = ", ".join(f"{x:.1f}" for x in os.getloadavg())
    print(f"cdc_zipf: 10M changes / 1M keys / 1% hot key -> "
          f"{n_final} final rows in {dt:.1f}s (loadavg {load}); "
          f"keys touched {n_keys_touched}; exceptAll diff {diff}")
    assert diff == 0, "final state diverges from independent truth"
    # claim check 2 (why AQE skew-split is not needed): the join's
    # change side is the POST-collapse frame — one row per key
    collapsed = (feed.groupBy("key")
                 .agg(F2.max_by(F2.struct("op", "val"), "seq"))
                 .count())
    assert collapsed == n_keys_touched, (collapsed, n_keys_touched)
    print(f"cdc_zipf: collapsed side rows == keys touched "
          f"({collapsed}) -> join structurally skew-free")
    spark.stop()


def stream_zipf():
    from tablite_spark.operators.merge import merge_upsert
    from tablite_spark.streaming.ops import streaming_upsert_compact
    spark = get_spark("burnin_stream_zipf")
    n = 4_000_000
    feed = _feed(spark, n)
    root = tempfile.mkdtemp(prefix="burnin_stream_zipf_")
    src = f"{root}/src"
    os.makedirs(src)
    for i, part in enumerate((feed.filter(F.col("seq") < n // 2),
                              feed.filter(F.col("seq") >= n // 2))):
        stage = f"{root}/stage{i}"
        part.repartition(4).write.mode("overwrite").parquet(stage)
        for j, f in enumerate(sorted(
                glob.glob(f"{stage}/part-*.parquet"))):
            dst = f"{src}/b{i}_{j}.parquet"
            shutil.copy(f, dst)
            t = 1_700_000_000 + i * 600
            os.utime(dst, (t, t))
    stream = (spark.readStream
              .schema("key long, seq long, op string, val double")
              .option("maxFilesPerTrigger", 4)
              .option("latestFirst", "false").parquet(src))
    t0 = time.time()
    q = (streaming_upsert_compact(stream)
         .writeStream.format("parquet")
         .option("path", f"{root}/out")
         .option("checkpointLocation", f"{root}/ckpt")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    dt = time.time() - t0
    out = spark.read.parquet(f"{root}/out")
    final = (out.groupBy("key")
             .agg(F.max_by(F.struct("seq", "op", "val"),
                           "n_changes").alias("s"))
             .select("key", "s.seq", "s.op", "s.val"))
    # batch truth: one max_by census over the whole feed
    truth = (feed.groupBy("key")
             .agg(F.max_by(F.struct("seq", "op", "val"), "seq")
                  .alias("s"))
             .select("key", "s.seq", "s.op", "s.val"))
    diff = (final.exceptAll(truth).count()
            + truth.exceptAll(final).count())
    load = ", ".join(f"{x:.1f}" for x in os.getloadavg())
    print(f"stream_zipf: 4M changes / 1% hot key, 2 batches -> "
          f"{dt:.1f}s (loadavg {load}); exceptAll diff {diff}")
    assert diff == 0, "streamed state diverges from batch truth"
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()




def twa_hot():
    """time_weighted_avg with a hot entity: 20M observations over
    100k keys, ONE key carrying 20% (4M rows). The lead() window
    partitions by key, so the hot key's 4M-row sort runs through one
    task BY CONTRACT (per-entity order is inherent to TWAP) — this
    measures that the contract cost is minutes-not-hours and the
    decimal accumulation stays exact at 4M segments."""
    from tablite_spark.operators.timeseries import time_weighted_avg
    spark = get_spark("burnin_twa_hot")
    n, keys = 20_000_000, 100_000
    df = (spark.range(n)
          .select(
              F.when(F.col("id") % 5 == 0, F.lit(0))
              .otherwise(F.col("id") % keys).alias("k"),
              F.timestamp_micros(F.lit(1_700_000_000_000_000)
                                 + F.col("id") * 1000).alias("ts"),
              F.col("id").alias("eid"),
              ((F.col("id") % 997) / 10.0).alias("v")))
    t0 = time.time()
    out = time_weighted_avg(df, ["k"], "ts", "v", tiebreak="eid")
    n_out = out.count()
    hot = out.filter(F.col("k") == 0).collect()[0]
    dt = time.time() - t0
    load = ", ".join(f"{x:.1f}" for x in os.getloadavg())
    print(f"twa_hot: 20M obs / 100k keys / 20% hot key -> {n_out} "
          f"rows in {dt:.1f}s (loadavg {load}); hot n_obs="
          f"{hot['n_obs']} twa={hot['twa']:.6f}")
    # keys divisible by 5 route ENTIRELY to the hot key (100k ≡ 0
    # mod 5), so they emit no row of their own: 100k - 20k + hot
    assert n_out == keys - keys // 5 + 1 and hot["n_obs"] == n // 5
    # exactness spot check: the hot key's segments all last 5000 us
    # -> twa = plain mean of its first n/5 - 1 values. The driver
    # mean stays exact in Python ints; the Spark side casts the
    # exact decimal Σv·Δt (~1e17 > 2^53) to double before the
    # division, so agreement is to double precision, not bit-exact
    # at THIS magnitude (the oracle twin computes the identical
    # cast, which is why the registry query needs no rounding).
    vals = [((i * 5) % 997) / 10.0 for i in range(n // 5 - 1)]
    want = sum(round(v * 100) for v in vals) / len(vals) / 100
    assert abs(hot["twa"] - want) < 1e-9 * want, (hot["twa"], want)
    print("twa_hot: hot-key TWA matches exact integer mean")
    spark.stop()


def nelson_10m():
    """nelson_aalen on a 10M-row corpus with ~9M DISTINCT durations:
    the census is corpus-sized, so the distributed prefix must hold
    (the KM/spearman discipline at its contract edge)."""
    from tablite_spark.operators.stats import nelson_aalen
    spark = get_spark("burnin_nelson")
    n = 10_000_000
    df = (spark.range(n)
          .select((F.col("id") % 5_000_000 + (F.col("id") % 7) / 10.0)
                  .alias("t"),
                  (F.col("id") % 10 != 0).alias("obs")))
    t0 = time.time()
    out = nelson_aalen(df, "t", "obs")
    n_rows = out.count()
    tail = out.agg(F.max("cumhaz").alias("h")).collect()[0]["h"]
    dt = time.time() - t0
    load = ", ".join(f"{x:.1f}" for x in os.getloadavg())
    print(f"nelson_10m: 10M rows, {n_rows} event times in {dt:.1f}s "
          f"(loadavg {load}); max cumhaz {tail:.4f}")
    assert n_rows > 4_000_000
    spark.stop()


def entropy_bigdocs():
    """char_entropy on 50k documents of 20k characters each (1B
    code points exploded): the per-doc fan-out must absorb map-side
    in the partial aggregation, not shuffle a billion rows."""
    from tablite_spark.pipeline.text import char_entropy
    spark = get_spark("burnin_entropy")
    docs = (spark.range(50_000)
            .select(F.col("id").alias("doc_id"),
                    F.concat(
                        F.repeat(F.lit("the quick brown fox "), 500),
                        F.repeat(F.lit("0123456789"), 1000))
                    .alias("text")))
    t0 = time.time()
    out = char_entropy(docs, "text", "doc_id")
    row = out.agg(F.count(F.lit(1)).alias("n"),
                  F.min("entropy").alias("lo"),
                  F.max("entropy").alias("hi"),
                  F.min("n_chars_counted").alias("nc")).collect()[0]
    dt = time.time() - t0
    load = ", ".join(f"{x:.1f}" for x in os.getloadavg())
    print(f"entropy_bigdocs: 50k docs x 20k chars -> {row['n']} rows "
          f"in {dt:.1f}s (loadavg {load}); entropy [{row['lo']:.4f}, "
          f"{row['hi']:.4f}], n_chars {row['nc']}")
    assert row["n"] == 50_000 and row["lo"] == row["hi"]
    assert row["nc"] == 20_000
    spark.stop()




def sij_scale():
    """stream-stream interval join at 4M x 4M rows through a REAL
    two-batch-per-side stream: join state is bounded by the
    watermark horizon, not the stream length — the 100 TB question
    for stream-stream joins. Matches are pinned against the batch
    join truth (exact count)."""
    from tablite_spark.streaming.ops import stream_interval_join
    spark = get_spark("burnin_sij")
    n = 4_000_000
    # id pairs (2k, 2k+1) share a user: the EVEN id is the right
    # (view) at ts=2k s, the ODD id the left (purchase) 1 s later —
    # so every left has exactly one in-window right (the user's
    # other events are 200k s away, outside the 10 min window).
    # (A `user = id % K` scheme with even K makes each user's ids
    # single-parity — left and right user sets would be DISJOINT.)
    base = (spark.range(2 * n)
            .select(((F.col("id") / 2).cast("long") % 100_000)
                    .alias("user_id"),
                    F.timestamp_micros(
                        F.lit(1_700_000_000_000_000)
                        + F.col("id") * 1_000_000).alias("ts"),
                    F.col("id").alias("event_id"),
                    (F.col("id") % 2 == 1).alias("is_left")))
    left_b = base.filter("is_left").drop("is_left")
    right_b = base.filter("NOT is_left").drop("is_left")
    root = tempfile.mkdtemp(prefix="burnin_sij_")
    cut = 1_700_000_000_000_000 + n * 1_000_000  # median id ts
    streams = {}
    for name, side in (("l", left_b), ("r", right_b)):
        src = f"{root}/{name}"
        os.makedirs(src)
        us = F.unix_micros(F.col("ts"))
        for i, part in enumerate((side.filter(us <= cut),
                                  side.filter(us > cut))):
            stage = f"{root}/stage_{name}{i}"
            part.coalesce(4).write.mode("overwrite").parquet(stage)
            for j, f in enumerate(sorted(
                    glob.glob(f"{stage}/part-*.parquet"))):
                dst = f"{src}/b{i}_{j}.parquet"
                shutil.copy(f, dst)
                t = 1_700_000_000 + i * 600
                os.utime(dst, (t, t))
        streams[name] = (spark.readStream
                         .schema("user_id long, ts timestamp, "
                                 "event_id long")
                         .option("maxFilesPerTrigger", 4)
                         .option("latestFirst", "false").parquet(src))
    t0 = time.time()
    j = stream_interval_join(streams["l"], streams["r"],
                             key="user_id", within="10 minutes",
                             watermark="30 minutes")
    out = j.select(F.col("l.event_id").alias("pid"),
                   F.col("r.event_id").alias("vid"))
    q = (out.writeStream.format("parquet")
         .option("path", f"{root}/out")
         .option("checkpointLocation", f"{root}/ckpt")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    dt = time.time() - t0
    got = spark.read.parquet(f"{root}/out").count()
    want = (left_b.alias("l").join(
        right_b.alias("r"),
        (F.col("l.user_id") == F.col("r.user_id"))
        & (F.col("r.ts") <= F.col("l.ts"))
        & (F.col("r.ts") >= F.col("l.ts")
           - F.expr("INTERVAL 10 minutes"))).count())
    load = ", ".join(f"{x:.1f}" for x in os.getloadavg())
    print(f"sij_scale: 4M x 4M, 2 batches/side -> {got} matches in "
          f"{dt:.1f}s (loadavg {load}); batch truth {want}")
    assert got == want, (got, want)
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


def cosine_10m():
    """item_cosine on 10M (basket, item) rows with the 5-item valve:
    the pair fan-out is |basket|²-bounded, the top-k window runs
    over the min-support pair frame only."""
    from tablite_spark.operators.frequency import item_cosine
    spark = get_spark("burnin_cosine")
    n = 10_000_000
    # 4 ids per basket (id % 2.5M); the item offset per slot must
    # not be 0 mod 50k (a pure multiplicative hash collapses every
    # basket to ONE item because 2.5M is a multiple of 50k)
    df = (spark.range(n)
          .select((F.col("id") % 2_500_000).alias("bk"),
                  ((F.col("id") % 50_000
                    + (F.col("id") / 2_500_000).cast("long") * 7919)
                   % 50_000).alias("it")))
    t0 = time.time()
    out = item_cosine(df, "bk", "it", min_support=2, top_k=5,
                      max_basket_size=5)
    n_out = out.count()
    dt = time.time() - t0
    load = ", ".join(f"{x:.1f}" for x in os.getloadavg())
    print(f"cosine_10m: 10M rows / 2.5M baskets / 50k items -> "
          f"{n_out} neighbor rows in {dt:.1f}s (loadavg {load})")
    assert n_out > 0
    spark.stop()


if __name__ == "__main__":
    names = sys.argv[1:] or ["cdc_zipf", "stream_zipf", "twa_hot",
                             "nelson_10m", "entropy_bigdocs",
                             "sij_scale", "cosine_10m"]
    for nm in names:
        globals()[nm]()
    print("burnin_r13 OK:", ", ".join(names))
