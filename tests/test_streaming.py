"""Structured Streaming ops: file-source stream with availableNow
trigger, tumbling window, session window, stateful running total."""

import time

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tablite_spark.streaming.ops import (
    session_aggregate, stateful_running_total, stream_from_directory,
    tumbling_counts,
)

SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("value", T.DoubleType()),
])


@pytest.fixture()
def stream_dir(spark, tmp_path):
    rows = [
        (1, "2024-01-01 00:00:00", 1, 10.0),
        (2, "2024-01-01 00:10:00", 1, 5.0),
        (3, "2024-01-01 02:00:00", 1, 1.0),
        (4, "2024-01-01 00:05:00", 2, 7.0),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts string, user_id long, value double") \
        .withColumn("ts", F.to_timestamp("ts"))
    path = str(tmp_path / "events_stream")
    df.write.parquet(path)
    return path


def _run_to_completion(sdf, tmp_path, name):
    q = (sdf.writeStream.format("memory").queryName(name)
         .outputMode("complete" if name != "stateful" else "update")
         .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    return q


def test_tumbling_counts_stream(spark, stream_dir, tmp_path):
    src = stream_from_directory(spark, stream_dir, SCHEMA)
    agg = tumbling_counts(src, window="1 hour")
    _run_to_completion(agg, tmp_path, "tumble")
    out = spark.sql("SELECT * FROM tumble").collect()
    by_start = {str(r["window"]["start"]): r["n"] for r in out}
    assert by_start["2024-01-01 00:00:00"] == 3
    assert by_start["2024-01-01 02:00:00"] == 1


def test_streaming_ohlc_matches_batch_twin(spark, stream_dir, tmp_path):
    """Streaming OHLC bars (complete mode over an availableNow drain)
    must equal the oracled batch twin on the same rows — same
    combinable state, same (ts, event_id) open/close tie key."""
    from tablite_spark.operators.timeseries import ohlc_resample
    from tablite_spark.streaming.ops import streaming_ohlc
    src = stream_from_directory(spark, stream_dir, SCHEMA)
    bars = streaming_ohlc(src, every="1 hour", tiebreak="event_id")
    _run_to_completion(bars, tmp_path, "ohlc")
    got = {str(r["bucket_start"]):
           (r["open"], r["high"], r["low"], r["close"],
            r["n_events"], r["sum_value"])
           for r in spark.sql("SELECT * FROM ohlc").collect()}
    batch = spark.read.parquet(stream_dir)
    want = {str(r["bucket_start"]):
            (r["open"], r["high"], r["low"], r["close"],
             r["n_events"], r["sum_value"])
            for r in ohlc_resample(batch, "ts", "value", "1 hour",
                                   tiebreak="event_id").collect()}
    assert got == want and len(got) == 2
    assert got["2024-01-01 00:00:00"] == (10.0, 10.0, 5.0, 5.0, 3, 22.0)


def test_session_window_stream(spark, stream_dir, tmp_path):
    src = stream_from_directory(spark, stream_dir, SCHEMA)
    agg = session_aggregate(src, gap="30 minutes")
    _run_to_completion(agg, tmp_path, "sessions")
    out = spark.sql("SELECT * FROM sessions").collect()
    u1 = sorted(r["n_events"] for r in out if r["user_id"] == 1)
    assert u1 == [1, 2]  # events 1,2 in one session; 3 alone


def test_stateful_running_total(spark, stream_dir, tmp_path):
    src = stream_from_directory(spark, stream_dir, SCHEMA)
    out_df = stateful_running_total(src)
    q = (out_df.writeStream.format("memory").queryName("stateful")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ckpt_st"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM stateful").collect()
    totals = {r["user_id"]: r["running_total"] for r in rows}
    assert totals[1] == 16.0
    assert totals[2] == 7.0


def test_sliding_counts_stream(spark, stream_dir, tmp_path):
    from tablite_spark.streaming.ops import sliding_counts
    src = stream_from_directory(spark, stream_dir, SCHEMA)
    agg = sliding_counts(src, window="1 hour", slide="30 minutes")
    _run_to_completion(agg, tmp_path, "slide")
    out = spark.sql("SELECT * FROM slide").collect()
    by_start = {str(r["window"]["start"]): r["n"] for r in out}
    # events at 00:00,00:05,00:10 land in both the 23:30 and 00:00 windows
    assert by_start["2024-01-01 00:00:00"] == 3
    assert by_start["2023-12-31 23:30:00"] == 3
    assert by_start["2024-01-01 02:00:00"] == 1


def test_stream_dedup(spark, tmp_path):
    from tablite_spark.streaming.ops import stream_dedup
    rows = [(1, "2024-01-01 00:00:00", 1, 10.0),
            (1, "2024-01-01 00:00:00", 1, 10.0),   # exact dup
            (2, "2024-01-01 00:10:00", 1, 5.0)]
    df = spark.createDataFrame(rows, "event_id long, ts string, user_id long, value double") \
        .withColumn("ts", F.to_timestamp("ts"))
    path = str(tmp_path / "dup_stream")
    df.write.parquet(path)
    src = stream_from_directory(spark, path, SCHEMA)
    out = stream_dedup(src, ["event_id"])
    q = (out.writeStream.format("memory").queryName("dedup")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt_dd"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("SELECT event_id FROM dedup").collect()
    assert sorted(r["event_id"] for r in got) == [1, 2]


def test_stream_interval_join(spark, tmp_path):
    """Bounded stream-stream join: errors pick up clicks within the
    preceding hour for the same user; watermarks bound both states."""
    from tablite_spark.streaming.ops import stream_from_directory, stream_interval_join
    clicks = [(10, "2024-01-01 00:00:00", 1, 1.0),
              (11, "2024-01-01 00:30:00", 1, 2.0),
              (12, "2024-01-01 00:00:00", 2, 3.0)]
    errors = [(20, "2024-01-01 00:45:00", 1, 0.0),
              (21, "2024-01-01 03:00:00", 2, 0.0)]
    for name, rows in (("clicks", clicks), ("errors", errors)):
        df = spark.createDataFrame(
            rows, "event_id long, ts string, user_id long, value double") \
            .withColumn("ts", F.to_timestamp("ts"))
        df.write.parquet(str(tmp_path / name))
    lsrc = stream_from_directory(spark, str(tmp_path / "errors"), SCHEMA)
    rsrc = (stream_from_directory(spark, str(tmp_path / "clicks"), SCHEMA)
            .select(F.col("event_id").alias("click_id"), "ts", "user_id",
                    F.col("value").alias("click_value")))
    j = stream_interval_join(lsrc, rsrc, key="user_id", within="1 hour")
    q = (j.writeStream.format("memory").queryName("sj")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt_sj"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM sj").collect()
    pairs = sorted((r["event_id"], r["click_id"]) for r in out)
    # error 20 (u1, 00:45) matches clicks 10 & 11; error 21 (u2, 03:00)
    # is >1h after click 12 → no match
    assert pairs == [(20, 10), (20, 11)]


@pytest.mark.slow
def test_stateful_state_carries_across_microbatches(spark, tmp_path):
    """applyInPandasWithState continuity: with one file per
    micro-batch, the per-user GroupState must ACCUMULATE across
    batches (update-mode emissions 1 → 3 → 6), not reset — the
    property the single-batch test cannot see."""
    src = str(tmp_path / "st_src")
    for b, v in enumerate([1.0, 2.0, 3.0]):
        (spark.createDataFrame(
            [(b, f"2024-01-01 00:{b:02d}:00", 7, v)],
            "event_id long, ts string, user_id long, value double")
         .withColumn("ts", F.to_timestamp("ts"))
         .coalesce(1).write.mode("append").parquet(src))
        time.sleep(1.1)  # distinct mtimes => deterministic file order
    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(src))
    out = stateful_running_total(stream)
    q = (out.writeStream.format("memory").queryName("st_carry")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ckpt_sc"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    batches = [p for p in q.recentProgress if p["numInputRows"] > 0]
    assert len(batches) == 3  # one micro-batch per file
    rows = spark.sql(
        "SELECT running_total FROM st_carry ORDER BY running_total"
    ).collect()
    assert [r["running_total"] for r in rows] == [1.0, 3.0, 6.0]


@pytest.mark.slow
def test_watermark_bounds_state_across_microbatches(spark, tmp_path):
    """Multi-micro-batch run (maxFilesPerTrigger=1): the watermark
    must advance between batches, EVICT finalized window state (final
    state size << total windows seen), and DROP a late arrival — the
    metrics Spark exposes per batch make all three assertable."""
    src = str(tmp_path / "wm_src")
    for h in range(6):
        rows = [(h * 10 + m, f"2024-01-01 {h:02d}:{m * 20:02d}:00", 1, 1.0)
                for m in range(3)]
        if h == 5:  # far-late arrival: watermark is hours ahead by now
            rows.append((99, "2024-01-01 00:00:00", 1, 1.0))
        (spark.createDataFrame(
            rows, "event_id long, ts string, user_id long, value double")
         .withColumn("ts", F.to_timestamp("ts"))
         .coalesce(1).write.mode("append").parquet(src))
        time.sleep(1.1)  # distinct mtimes => deterministic file order
    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(src))
    agg = tumbling_counts(stream, window="10 minutes",
                          watermark="10 minutes")
    q = (agg.writeStream.format("memory").queryName("wmstate")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt_wm"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    progress = q.recentProgress
    batches = [p for p in progress if p["numInputRows"] > 0]
    assert len(batches) >= 6  # one micro-batch per file
    state_rows = [p["stateOperators"][0]["numRowsTotal"]
                  for p in progress if p["stateOperators"]]
    dropped = sum(p["stateOperators"][0].get("numRowsDroppedByWatermark", 0)
                  for p in progress if p["stateOperators"])
    assert dropped == 1  # the h=5 late row never reached state
    # 18 distinct windows streamed through; eviction keeps final state
    # to the un-finalized tail only
    assert state_rows[-1] <= 4 < 18
    out = spark.sql(
        "SELECT window.start AS s, n FROM wmstate ORDER BY s").collect()
    assert 15 <= len(out) <= 18
    first = [r for r in out if r["s"].strftime("%H:%M") == "00:00"]
    assert first and first[0]["n"] == 1  # late duplicate was dropped


@pytest.mark.slow
def test_stream_outer_interval_join(spark, tmp_path):
    """Left-outer stream-stream interval join with watermark-forced
    null emission (round 6): an unmatched left row must be HELD while
    a match could still arrive, and emitted null-padded only in a
    micro-batch AFTER the watermark passes its horizon — asserted
    per-batch via foreachBatch snapshots across 3 file-per-trigger
    micro-batches."""
    from tablite_spark.streaming.ops import (
        stream_from_directory, stream_interval_join,
    )
    edir, cdir = str(tmp_path / "errors"), str(tmp_path / "clicks")
    batches = [
        # A: e20 matches c10; e21 (u3) has no click anywhere
        ([(20, "2024-01-01 00:45:00", 1, 0.0),
          (21, "2024-01-01 00:50:00", 3, 0.0)],
         [(10, "2024-01-01 00:00:00", 1, 1.0)]),
        # B: hours later — advances both watermarks past e21's horizon
        ([(22, "2024-01-01 05:30:00", 9, 0.0)],
         [(11, "2024-01-01 05:00:00", 9, 2.0)]),
        # C: later still — the batch in which e21's null row can emit
        ([(23, "2024-01-01 09:00:00", 8, 0.0)],
         [(12, "2024-01-01 08:30:00", 8, 3.0)]),
    ]
    for errs, clks in batches:
        for d, rows in ((edir, errs), (cdir, clks)):
            (spark.createDataFrame(
                rows,
                "event_id long, ts string, user_id long, value double")
             .withColumn("ts", F.to_timestamp("ts"))
             .coalesce(1).write.mode("append").parquet(d))
        time.sleep(1.1)  # distinct mtimes => deterministic file order
    lsrc = (spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1).parquet(edir))
    rsrc = (spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1).parquet(cdir)
            .select(F.col("event_id").alias("click_id"), "ts", "user_id",
                    F.col("value").alias("click_value")))
    j = stream_interval_join(lsrc, rsrc, key="user_id",
                             watermark="30 minutes", within="1 hour",
                             how="leftOuter")
    snapshots: list[list[tuple]] = []

    def _capture(batch_df, batch_id):
        snapshots.append(sorted(
            (r["event_id"], r["click_id"])
            for r in batch_df.select("l.event_id", "click_id").collect()))

    q = (j.writeStream.foreachBatch(_capture)
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt_oj"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    nonempty = [s for s in snapshots if s]
    flat = sorted(p for s in snapshots for p in s)
    # every match found, and the unmatched left row emitted null-padded
    assert flat == [(20, 10), (21, None), (22, 11), (23, 12)], snapshots
    # the null-padded row must NOT be in the first emitting batch
    # (its match horizon was still open) ...
    assert (21, None) not in nonempty[0], snapshots
    # ... and must appear only after the batch that advanced the
    # watermark past 00:50 + 30min — i.e. strictly later than the
    # batch that emitted e20's match
    first_match_batch = next(i for i, s in enumerate(snapshots)
                             if (20, 10) in s)
    null_batch = next(i for i, s in enumerate(snapshots)
                      if (21, None) in s)
    assert null_batch > first_match_batch, snapshots


def test_exactly_once_sink_idempotent_on_replay(spark, tmp_path):
    """exactly_once_parquet_sink drains a file stream into
    batch_id=N partitions; REPLAYING a batch (the at-least-once
    hazard foreachBatch exposes) rewrites the same partition instead
    of duplicating rows, and the result reads back as partitioned
    parquet."""
    import glob

    src = tmp_path / "src"
    src.mkdir()
    (src / "a.json").write_text(
        "\n".join('{"k": %d, "v": %d}' % (i, i * 10) for i in range(5)))
    from tablite_spark.streaming.ops import exactly_once_parquet_sink
    stream = (spark.readStream.schema("k long, v long")
              .json(str(src)))
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = exactly_once_parquet_sink(stream, out, ckpt)
    q.awaitTermination(60)
    got = spark.read.parquet(out)
    assert got.count() == 5
    assert "batch_id" in got.columns
    # simulate the replay: re-invoke the same batch write directly
    batch = spark.createDataFrame([(i, i * 10) for i in range(5)],
                                  "k long, v long")
    batch.write.mode("overwrite").parquet(f"{out}/batch_id=0")
    again = spark.read.parquet(out)
    assert again.count() == 5, "replay must not duplicate rows"
    assert sorted(r["k"] for r in again.collect()) == list(range(5))
    # partition pruning on batch_id is available to consumers
    assert spark.read.parquet(out).filter("batch_id = 0").count() == 5
    assert len(glob.glob(f"{out}/batch_id=*")) >= 1


def test_classifier_scores_streams_unchanged(spark, tmp_path):
    """logreg_predict is a pure expression, so the SAME weights gate
    a Structured Stream with no code changes — the quality
    classifier works at ingest time, not just batch."""
    from pyspark.sql import functions as F

    from tablite_spark.pipeline.classifier import (
        logreg_predict, logreg_train,
    )
    batch = (spark.range(500)
             .select((F.col("id") % 100 / 50.0).alias("x1"),
                     ((F.col("id") * 7 % 100) / 50.0).alias("x2"))
             .withColumn("y", (F.col("x1") + F.col("x2") > 2.0)
                         .cast("int")))
    w = logreg_train(batch, ["x1", "x2"], "y", lr=2.0, iters=30)
    src = tmp_path / "clsrc"
    src.mkdir()
    (src / "a.json").write_text("\n".join(
        '{"x1": %f, "x2": %f}' % (i % 100 / 50.0, i * 7 % 100 / 50.0)
        for i in range(200)))
    stream = (spark.readStream.schema("x1 double, x2 double")
              .json(str(src)))
    scored = logreg_predict(stream, ["x1", "x2"], w)
    q = (scored.writeStream.format("memory")
         .queryName("cls_stream").trigger(availableNow=True)
         .option("checkpointLocation", str(tmp_path / "ck")).start())
    q.awaitTermination(60)
    got = spark.sql("SELECT * FROM cls_stream").collect()
    assert len(got) == 200
    exp = logreg_predict(
        spark.read.schema("x1 double, x2 double").json(str(src)),
        ["x1", "x2"], w).collect()
    assert sorted((r["x1"], r["x2"], r["pred"]) for r in got) == \
        sorted((r["x1"], r["x2"], r["pred"]) for r in exp)


@pytest.mark.slow
def test_stream_incremental_dedup(spark, tmp_path):
    """Streaming ingestion dedup against the persisted MinHash index:
    batch 1 drops a corpus dup and appends its survivors' signatures;
    batch 2's dup of a batch-1 survivor is caught only via that
    append; a REPLAY of the drained stream (fresh checkpoint, same
    index) neither drops its own docs (self-match guard) nor changes
    the survivor output (idempotent partition overwrite)."""
    import json

    from tablite_spark.pipeline.dedup import (
        minhash_save_index, shingle_minhash,
    )
    from tablite_spark.streaming.ops import stream_incremental_dedup

    def doc(i, prefix="tok"):
        return " ".join(f"{prefix}{i * 1000 + j}" for j in range(1, 31))

    corpus = spark.createDataFrame(
        [(i, doc(i)) for i in range(10)], "doc_id long, text string")
    idx = str(tmp_path / "index")
    minhash_save_index(shingle_minhash(corpus, "text", "doc_id"),
                       "doc_id", idx)

    src = tmp_path / "src"
    src.mkdir()
    rows1 = [(100, doc(3)),            # corpus dup -> dropped
             (101, doc(500, "new"))]   # fresh -> kept + indexed
    (src / "b1.json").write_text("\n".join(
        json.dumps({"doc_id": i, "text": t}) for i, t in rows1))
    stream = (spark.readStream.schema("doc_id long, text string")
              .option("maxFilesPerTrigger", 1).json(str(src)))
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = stream_incremental_dedup(stream, "text", "doc_id", idx,
                                 out, ckpt)
    q.awaitTermination(120)
    kept1 = sorted(r["doc_id"]
                   for r in spark.read.parquet(out).collect())
    assert kept1 == [101], kept1

    # batch 2: dup of batch-1 survivor (catchable only via append)
    # plus a fresh doc
    rows2 = [(200, doc(500, "new")), (201, doc(501, "new"))]
    (src / "b2.json").write_text("\n".join(
        json.dumps({"doc_id": i, "text": t}) for i, t in rows2))
    q = stream_incremental_dedup(stream, "text", "doc_id", idx,
                                 out, ckpt)
    q.awaitTermination(120)
    kept2 = sorted(r["doc_id"]
                   for r in spark.read.parquet(out).collect())
    assert kept2 == [101, 201], kept2

    # full replay with a FRESH checkpoint: the index already holds
    # 101/201's signatures, but self-matches are id-excluded and the
    # batch partitions overwrite in place -> same survivors
    q = stream_incremental_dedup(stream, "text", "doc_id", idx,
                                 out, str(tmp_path / "ckpt2"))
    q.awaitTermination(120)
    kept3 = sorted(r["doc_id"]
                   for r in spark.read.parquet(out).collect())
    assert kept3 == [101, 201], kept3


def test_streaming_ema_matches_batch_twin(spark, stream_dir, tmp_path):
    """Streaming EMA (stateful, cross-batch continuation) must equal
    the batch ema_smooth on the same rows after a two-batch drain —
    the state seed carries batch 1's final EMA into batch 2."""
    from tablite_spark.operators.timeseries import ema_smooth
    from tablite_spark.streaming.ops import streaming_ema
    # own directory with ONE file per micro-batch and ordered mtimes:
    # the EMA ingestion contract is in-order arrival, so the harness
    # must not let Spark split a batch's rows across arbitrary files
    stream_dir = str(tmp_path / "ema_stream")
    first = [(1, "2024-01-01 00:00:00", 1, 10.0),
             (2, "2024-01-01 00:10:00", 1, 5.0),
             (3, "2024-01-01 02:00:00", 1, 1.0),
             (4, "2024-01-01 00:05:00", 2, 7.0)]
    more = [(5, "2024-01-01 03:00:00", 1, 3.0),
            (6, "2024-01-01 03:30:00", 3, 9.0),
            (7, "2024-01-01 04:00:00", 1, None)]
    mk = lambda rows: spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, value double") \
        .withColumn("ts", F.to_timestamp("ts")).coalesce(1)
    mk(first).write.parquet(stream_dir)
    time.sleep(1.1)  # distinct mtime => deterministic file order
    mk(more).write.mode("append").parquet(stream_dir)

    src = (spark.readStream.schema(SCHEMA)
           .option("maxFilesPerTrigger", 1)
           .option("latestFirst", "false").parquet(stream_dir))
    out_df = streaming_ema(src)
    q = (out_df.writeStream.format("memory").queryName("sema")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ckpt_sema"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r["user_id"], r["event_id"]): r["ema"]
           for r in spark.sql("SELECT * FROM sema").collect()}
    batch = spark.read.parquet(stream_dir)
    want = {(r["user_id"], r["event_id"]): r["ema"]
            for r in ema_smooth(batch, "ts", "value", by=["user_id"],
                                alpha=0.25,
                                tiebreak=["event_id"]).collect()}
    assert got == want and len(got) == 7
    assert got[(1, 7)] is None  # null rides through, state unharmed


def test_streaming_state_changes_matches_batch_twin(spark, tmp_path):
    """Streaming SCD2 interval-close events (stateful, cross-batch
    continuation) must equal the batch state_intervals' CLOSED rows
    after a two-batch drain — including a run that spans the batch
    boundary (batch 1 ends in 'new', batch 2 continues it, so the
    close event carries observations from BOTH batches)."""
    from tablite_spark.operators.timeseries import state_intervals
    from tablite_spark.streaming.ops import streaming_state_changes
    stream_dir = str(tmp_path / "si_stream")
    first = [(1, "2024-01-01 00:00:00", 1, "new"),
             (2, "2024-01-01 00:10:00", 1, "new"),
             (3, "2024-01-01 00:20:00", 1, "active"),
             (4, "2024-01-01 00:05:00", 2, "active")]
    more = [(5, "2024-01-01 01:00:00", 1, "active"),
            (6, "2024-01-01 01:30:00", 1, "new"),
            (7, "2024-01-01 02:00:00", 2, "closed")]
    schema = ("event_id long, ts string, user_id long, "
              "event_type string")
    mk = lambda rows: spark.createDataFrame(rows, schema) \
        .withColumn("ts", F.to_timestamp("ts")).coalesce(1)
    mk(first).write.parquet(stream_dir)
    time.sleep(1.1)
    mk(more).write.mode("append").parquet(stream_dir)

    si_schema = ("event_id long, ts timestamp, user_id long, "
                 "event_type string")
    src = (spark.readStream.schema(si_schema)
           .option("maxFilesPerTrigger", 1)
           .option("latestFirst", "false").parquet(stream_dir))
    q = (streaming_state_changes(src)
         .writeStream.format("memory").queryName("ssi")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt_ssi"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r["user_id"], r["state"], r["valid_from"], r["valid_to"],
            r["n_obs"]) for r in spark.sql("SELECT * FROM ssi").collect()}
    batch = spark.read.parquet(stream_dir)
    closed = {(r["user_id"], r["state"], r["valid_from"],
               r["valid_to"], r["n_obs"]) for r in
              state_intervals(batch, "user_id", "event_type", "ts",
                              tiebreak="event_id").collect()
              if r["valid_to"] is not None}
    assert got == closed and len(got) == 3
    # the cross-batch 'active' run for user 1 closed with n_obs=2
    # (one observation from each batch)
    assert any(u == 1 and s == "active" and n == 2
               for u, s, _, _, n in got)


def test_streaming_attribution_matches_batch_twin(spark, tmp_path):
    """Streaming last-touch attribution (stateful carry across
    micro-batches) must aggregate to exactly the batch operator's
    channel totals after a two-batch drain — including a conversion
    in batch 2 credited to a touch from batch 1, and a pre-touch
    conversion in the NULL channel."""
    from tablite_spark.operators.timeseries import attribute_conversions
    from tablite_spark.streaming.ops import streaming_attribution
    stream_dir = str(tmp_path / "attr_stream")
    first = [(1, "2024-01-01 00:00:00", 1, "purchase", 7.0),
             (2, "2024-01-01 00:10:00", 1, "view", 0.0),
             (3, "2024-01-01 00:20:00", 1, "purchase", 10.0),
             (4, "2024-01-01 00:05:00", 2, "click", 0.0)]
    more = [(5, "2024-01-01 01:00:00", 1, "purchase", 5.0),
            (6, "2024-01-01 01:30:00", 2, "purchase", 3.0),
            (7, "2024-01-01 02:00:00", 2, "signup", 0.0),
            (8, "2024-01-01 02:10:00", 2, "purchase", 2.0)]
    schema = ("event_id long, ts string, user_id long, "
              "event_type string, value double")
    mk = lambda rows: spark.createDataFrame(rows, schema) \
        .withColumn("ts", F.to_timestamp("ts")).coalesce(1)
    mk(first).write.parquet(stream_dir)
    time.sleep(1.1)
    mk(more).write.mode("append").parquet(stream_dir)

    s_schema = ("event_id long, ts timestamp, user_id long, "
                "event_type string, value double")
    src = (spark.readStream.schema(s_schema)
           .option("maxFilesPerTrigger", 1)
           .option("latestFirst", "false").parquet(stream_dir))
    q = (streaming_attribution(src)
         .writeStream.format("memory").queryName("sattr")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt_attr"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM sattr").collect()
    # row-level: one output per conversion, channel carried per user
    got_rows = {(r["event_id"], r["channel"], r["value"])
                for r in rows}
    assert got_rows == {(1, None, 7.0), (3, "view", 10.0),
                        (5, "view", 5.0), (6, "click", 3.0),
                        (8, "signup", 2.0)}
    # aggregated: equals the batch operator's totals exactly
    import collections
    agg = collections.defaultdict(lambda: [0, 0.0])
    for _, ch, v in got_rows:
        agg[ch][0] += 1
        agg[ch][1] += v
    batch = spark.read.parquet(stream_dir)
    want = {r["channel"]: (r["n_conversions"], r["attributed_value"])
            for r in attribute_conversions(
                batch, "user_id", "ts", "event_type", "value",
                "purchase", ["view", "click", "signup"],
                tiebreak="event_id").collect()}
    assert {k: tuple(v) for k, v in agg.items()} == want


@pytest.mark.slow
def test_streaming_zscore_welford_crosses_batches(spark, tmp_path):
    """Online z-score: batch-2 events must score against the Welford
    state accumulated in batch 1 (prior mean/variance carried, not
    reset), matching hand-computed population stats; first two
    events per key emit NULL z; NULL values skip without touching
    state."""
    stream_dir = str(tmp_path / "zs_stream")
    first = [(1, "2024-01-01 00:00:00", 1, 10.0),
             (2, "2024-01-01 00:10:00", 1, 14.0),
             (3, "2024-01-01 00:20:00", 1, None)]
    more = [(4, "2024-01-01 01:00:00", 1, 18.0),
            (5, "2024-01-01 01:30:00", 1, 12.0)]
    schema = "event_id long, ts string, user_id long, value double"
    mk = lambda rows: spark.createDataFrame(rows, schema) \
        .withColumn("ts", F.to_timestamp("ts")).coalesce(1)
    mk(first).write.parquet(stream_dir)
    time.sleep(1.1)
    mk(more).write.mode("append").parquet(stream_dir)

    from tablite_spark.streaming.ops import streaming_zscore
    s_schema = ("event_id long, ts timestamp, user_id long, "
                "value double")
    src = (spark.readStream.schema(s_schema)
           .option("maxFilesPerTrigger", 1)
           .option("latestFirst", "false").parquet(stream_dir))
    q = (streaming_zscore(src)
         .writeStream.format("memory").queryName("szs")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt_zs"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = {r["event_id"]: r for r in
            spark.sql("SELECT * FROM szs").collect()}
    # NULL value (event 3) never emitted, never advanced state
    assert set(rows) == {1, 2, 4, 5}
    assert rows[1]["z"] is None and rows[1]["n_prior"] == 0
    assert rows[2]["z"] is None and rows[2]["n_prior"] == 1
    # event 4 scores against prior {10, 14}: mean 12, popstd 2
    assert rows[4]["n_prior"] == 2
    assert abs(rows[4]["z"] - (18.0 - 12.0) / 2.0) < 1e-9
    # event 5 against {10, 14, 18}: mean 14, popvar 32/3
    import math
    want = (12.0 - 14.0) / math.sqrt(32.0 / 3.0)
    assert rows[5]["n_prior"] == 3
    assert abs(rows[5]["z"] - want) < 1e-9


@pytest.mark.slow
def test_streaming_upsert_compact_crosses_batches(spark, tmp_path):
    """CDC compaction: the per-key last-write-wins state and the
    cumulative change count must carry across micro-batches — a key
    whose batch-2 change has a LOWER seq keeps its batch-1 winner,
    a higher seq replaces it, and n_changes counts both batches."""
    stream_dir = str(tmp_path / "ups_stream")
    first = [(1, 10, "U", 1.0),     # key 1: seq 10 wins batch 1
             (1, 5, "U", 0.5),
             (2, 7, "U", 2.0)]      # key 2: only batch 1
    more = [(1, 3, "D", 9.9),       # LOWER seq: must NOT replace
            (3, 1, "D", 3.0),       # new key in batch 2
            (2, 8, "D", 2.5)]       # higher seq: replaces
    schema = "key long, seq long, op string, val double"
    mk = lambda rows: spark.createDataFrame(rows, schema).coalesce(1)
    mk(first).write.parquet(stream_dir)
    time.sleep(1.1)
    mk(more).write.mode("append").parquet(stream_dir)

    from tablite_spark.streaming.ops import streaming_upsert_compact
    src = (spark.readStream.schema(schema)
           .option("maxFilesPerTrigger", 1)
           .option("latestFirst", "false").parquet(stream_dir))
    q = (streaming_upsert_compact(src)
         .writeStream.format("memory").queryName("sup")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt_up"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM sup").collect()
    # final state per key = max-n_changes emission
    final = {}
    for r in rows:
        if (r["key"] not in final
                or r["n_changes"] > final[r["key"]]["n_changes"]):
            final[r["key"]] = r
    f1, f2, f3 = final[1], final[2], final[3]
    assert (f1["seq"], f1["op"], f1["val"], f1["n_changes"]) == \
        (10, "U", 1.0, 3)          # batch-2 lower seq ignored, n=3
    assert (f2["seq"], f2["op"], f2["val"], f2["n_changes"]) == \
        (8, "D", 2.5, 2)           # batch-2 higher seq replaces
    assert (f3["seq"], f3["op"], f3["val"], f3["n_changes"]) == \
        (1, "D", 3.0, 1)
    # key 1 emitted in BOTH batches (touched twice)
    assert sum(1 for r in rows if r["key"] == 1) == 2
