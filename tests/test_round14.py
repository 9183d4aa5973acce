"""Round-14 unit tests: distributed row-number engine, Mann-Whitney U,
k-fold assignment, dropDuplicatesWithinWatermark TTL semantics, and
the forced-replay exactly-once sink."""

import math
import time

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------------------------
# distributed_row_number
# ------------------------------------------------------------------

def test_distributed_row_number_matches_global(spark):
    """The bucketed rank must equal a plain global row_number over
    the same order, on any input layout."""
    from pyspark.sql import Window

    from tablite_spark.functions.buckets import distributed_row_number
    rows = [((i * 37) % 101, i) for i in range(500)]
    df = spark.createDataFrame(rows, "k long, id long")
    got, n = distributed_row_number(df.repartition(7),
                                    ["k", "id"], "r", n_buckets=8)
    assert n == 500
    truth = df.withColumn(
        "t", F.row_number().over(Window.orderBy("k", "id")))
    j = got.join(truth, ["k", "id"]).collect()
    assert len(j) == 500
    assert all(r["r"] == r["t"] for r in j)


def test_distributed_row_number_ties_and_validation(spark):
    """Heavy ties on the bucket key must still rank deterministically
    through the tiebreak column; empty order list raises."""
    from tablite_spark.functions.buckets import distributed_row_number
    df = spark.createDataFrame([(1, i) for i in range(50)]
                               + [(2, i) for i in range(5)],
                               "k long, id long")
    got, n = distributed_row_number(df, ["k", "id"], "r",
                                    n_buckets=4)
    assert n == 55
    by_id = {(r["k"], r["id"]): r["r"] for r in got.collect()}
    assert by_id[(1, 0)] == 1 and by_id[(1, 49)] == 50
    assert by_id[(2, 0)] == 51 and by_id[(2, 4)] == 55
    with pytest.raises(ValueError, match="order columns"):
        distributed_row_number(df, [], "r")


# ------------------------------------------------------------------
# mann_whitney_u
# ------------------------------------------------------------------

def test_mann_whitney_hand(spark):
    """a=[1,2,2,5], b=[2,3]: avg ranks 1, 3,3, 6 -> R_a=13, U_a=3
    (2U=6); tie term = 24; z = (3-4)/sqrt(8/12*(7-24/30))."""
    from tablite_spark.operators.stats import mann_whitney_u
    rows = ([("a", v) for v in (1.0, 2.0, 2.0, 5.0)]
            + [("b", v) for v in (2.0, 3.0)])
    df = spark.createDataFrame(rows, "g string, v double")
    r = mann_whitney_u(df, "g", "v", "a", "b").collect()[0]
    assert (r["n_a"], r["n_b"], r["u_a_x2"]) == (4, 2, 6)
    var = 4 * 2 / 12 * ((6 + 1) - 24 / (6 * 5))
    assert abs(r["z"] - (3 - 4) / math.sqrt(var)) < 1e-12


def test_mann_whitney_degenerate_and_layout(spark):
    """All-tied values -> zero variance -> NULL z (U still exact);
    an empty group raises; repartitioning changes nothing."""
    from tablite_spark.operators.stats import mann_whitney_u
    tied = spark.createDataFrame(
        [("a", 7.0)] * 3 + [("b", 7.0)] * 2, "g string, v double")
    r = mann_whitney_u(tied, "g", "v", "a", "b").collect()[0]
    assert r["u_a_x2"] == 6 and r["z"] is None  # U = n1*n2/2 = 3
    with pytest.raises(ValueError, match="no non-null"):
        mann_whitney_u(tied.filter("g = 'a'"), "g", "v",
                       "a", "b").collect()
    rows = [("a" if i % 3 else "b", float((i * 13) % 7))
            for i in range(300)]
    df = spark.createDataFrame(rows, "g string, v double")
    one = mann_whitney_u(df, "g", "v", "a", "b").collect()[0]
    two = mann_whitney_u(df.repartition(11), "g", "v",
                         "a", "b").collect()[0]
    assert one == two


def test_mann_whitney_matches_rank_sum_definition(spark):
    """Cross-check 2U against a direct average-rank computation on a
    pseudo-random tied sample."""
    vals = [((i * 29) % 10, "a" if (i * 7) % 3 else "b")
            for i in range(200)]
    from collections import Counter
    pooled = sorted(v for v, _ in vals)
    # average rank per value
    start, avg = {}, {}
    c = Counter(pooled)
    run = 0
    for v in sorted(c):
        avg[v] = run + (c[v] + 1) / 2
        run += c[v]
    ra = sum(avg[v] for v, g in vals if g == "a")
    na = sum(1 for _, g in vals if g == "a")
    u2 = int(2 * ra - na * (na + 1))
    from tablite_spark.operators.stats import mann_whitney_u
    df = spark.createDataFrame([(g, float(v)) for v, g in vals],
                               "g string, v double")
    r = mann_whitney_u(df, "g", "v", "a", "b").collect()[0]
    assert r["u_a_x2"] == u2


# ------------------------------------------------------------------
# kfold_assign
# ------------------------------------------------------------------

def test_kfold_assign_deterministic_and_consistent(spark):
    """Folds are in [0, k), identical across layouts and runs,
    append-consistent (a subset's folds equal the full corpus's),
    salt-sensitive, and k<2 raises. The fold must equal DuckDB's
    md5-mod-k so the oracle is engine-exact."""
    import duckdb

    from tablite_spark.pipeline.sampling import kfold_assign
    df = spark.createDataFrame([(i,) for i in range(400)], "id long")
    out = {r["id"]: r["fold"] for r in
           kfold_assign(df, "id", k=5, salt="s").collect()}
    assert set(out.values()) <= set(range(5))
    again = {r["id"]: r["fold"] for r in
             kfold_assign(df.repartition(13), "id", k=5,
                          salt="s").collect()}
    assert out == again
    sub = {r["id"]: r["fold"] for r in
           kfold_assign(df.filter("id < 100"), "id", k=5,
                        salt="s").collect()}
    assert all(out[i] == sub[i] for i in sub)
    other = {r["id"]: r["fold"] for r in
             kfold_assign(df, "id", k=5, salt="t").collect()}
    assert out != other
    with pytest.raises(ValueError, match="k >= 2"):
        kfold_assign(df, "id", k=1)
    duck = dict(duckdb.execute(
        "SELECT i, CAST(CAST(('0x' || substring(md5('s' || CAST(i AS "
        "VARCHAR)), 1, 15)) AS UBIGINT) % 5 AS INT) "
        "FROM range(400) t(i)").fetchall())
    assert all(out[i] == duck[i] for i in out)


# ------------------------------------------------------------------
# dropDuplicatesWithinWatermark TTL semantics
# ------------------------------------------------------------------

def test_stream_dedup_within_watermark_ttl(spark, tmp_path):
    """Pins the three behaviors that make
    dropDuplicatesWithinWatermark the BOUNDED-state dedup (delay
    30 min):
    - a duplicate whose key state is alive is dropped, across batches;
    - a duplicate arriving after the watermark EVICTED its key's
      state is re-admitted (the bounded-state price, by contract);
    - a row older than the watermark is dropped outright as late.
    Batch plan (the watermark advances to max-seen-ts - 30 min at the
    END of a batch, and state EVICTION also runs at batch end with
    that new watermark — so a key evicted by batch N's close is only
    re-admittable from batch N+1 on; empirically pinned here):
      b0: k1@10:00, adv@12:00 -> both emit; b0's close sets wm=11:30
          but evicts with the PRE-update wm, so k1's state survives b0
      b1: adv@12:00 dup (state alive -> dropped), k2@12:00 (new ->
          emits); b1's close evicts k1 (expiry 10:30 < wm 11:30)
      b2: k1@12:10 (state EVICTED -> re-emitted),
          k2@12:00 dup (state alive: expiry 12:30 > wm -> dropped),
          old@11:00 (< wm 11:30 -> late-dropped)
    Expected emissions: k1 twice, adv once, k2 once, old never."""
    from tablite_spark.streaming.ops import stream_dedup
    batches = [
        [("k1", "2024-01-01 10:00:00"), ("adv", "2024-01-01 12:00:00")],
        [("k2", "2024-01-01 12:00:00"), ("adv", "2024-01-01 12:00:00")],
        [("k1", "2024-01-01 12:10:00"), ("k2", "2024-01-01 12:00:00"),
         ("old", "2024-01-01 11:00:00")],
    ]
    src = str(tmp_path / "src")
    for rows in batches:
        (spark.createDataFrame(rows, "k string, ts string")
         .withColumn("ts", F.to_timestamp("ts"))
         .coalesce(1).write.mode("append").parquet(src))
        time.sleep(1.1)  # distinct mtimes => deterministic order
    stream = (spark.readStream.schema("k string, ts timestamp")
              .option("maxFilesPerTrigger", 1)
              .option("latestFirst", "false").parquet(src))
    q = (stream_dedup(stream, ["k"], watermark="30 minutes")
         .writeStream.format("memory").queryName("dd_ttl")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    out = [(r["k"], str(r["ts"])) for r in
           spark.sql("SELECT * FROM dd_ttl").collect()]
    from collections import Counter
    c = Counter(k for k, _ in out)
    assert c["k1"] == 2, out       # TTL re-admission
    assert c["adv"] == 1, out      # in-state dup dropped
    assert c["k2"] == 1, out       # cross-batch dup dropped
    assert c["old"] == 0, out      # late row dropped
    assert ("k1", "2024-01-01 12:10:00") in out


# ------------------------------------------------------------------
# exactly-once sink forced replay
# ------------------------------------------------------------------

def test_exactly_once_sink_forced_replay(spark, tmp_path):
    """Crash-window simulation: after batch 0 drains, its commit
    marker is deleted (write survived, commit didn't). The restart
    must REPLAY batch 0 from its pinned offsets into the same
    batch_id=0 partition (overwrite, not append) and then process
    batch 1 — zero duplicate rows."""
    import glob
    import os

    from tablite_spark.streaming.ops import exactly_once_parquet_sink
    src = str(tmp_path / "src")
    b0 = [(1, 10.0), (2, 20.0), (3, 30.0)]
    b1 = [(4, 40.0), (5, 50.0)]
    (spark.createDataFrame(b0, "id long, v double")
     .coalesce(1).write.mode("append").parquet(src))

    def run():
        stream = (spark.readStream.schema("id long, v double")
                  .option("maxFilesPerTrigger", 1).parquet(src))
        q = exactly_once_parquet_sink(
            stream, str(tmp_path / "out"), str(tmp_path / "ckpt"))
        q.awaitTermination(120)

    run()
    first_files = sorted(glob.glob(
        str(tmp_path / "out" / "batch_id=0" / "part-*")))
    assert first_files, "batch 0 must have landed"
    os.remove(str(tmp_path / "ckpt" / "commits" / "0"))
    crc = str(tmp_path / "ckpt" / "commits" / ".0.crc")
    if os.path.exists(crc):
        os.remove(crc)
    time.sleep(1.1)
    (spark.createDataFrame(b1, "id long, v double")
     .coalesce(1).write.mode("append").parquet(src))
    run()
    got = sorted((r["id"], r["v"]) for r in
                 spark.read.parquet(str(tmp_path / "out")).collect())
    assert got == sorted(b0 + b1)          # replay added NOTHING
    second_files = sorted(glob.glob(
        str(tmp_path / "out" / "batch_id=0" / "part-*")))
    # overwrite replaced the first attempt's files, never sat beside
    assert first_files != second_files and len(second_files) >= 1


# ------------------------------------------------------------------
# grouped_weighted_quantiles
# ------------------------------------------------------------------

def test_grouped_weighted_quantiles_hand(spark):
    """Lower weighted-quantile convention per group: smallest value
    whose cumulative weight reaches q*W; duplicate values merge
    weights; NULL/non-positive weights and NULL values drop;
    validation guards."""
    from tablite_spark.operators.stats import grouped_weighted_quantiles
    rows = [
        # group a: v=1 w=1, v=2 w=3 (2+1), v=10 w=1 -> W=5
        #   q=.5 -> cw>=2.5 first at v=2; q=.9 -> 4.5 -> v=10
        ("a", 1.0, 1), ("a", 2.0, 2), ("a", 2.0, 1), ("a", 10.0, 1),
        # group b: single value
        ("b", 7.0, 4),
        # excluded rows
        ("a", 99.0, 0), ("a", 99.0, None), ("a", None, 5),
    ]
    df = spark.createDataFrame(rows, "g string, v double, w int")
    out = {(r["g"], r["q"]): r["value"] for r in
           grouped_weighted_quantiles(
               df, ["g"], "v", "w", [0.5, 0.9]).collect()}
    assert out[("a", 0.5)] == 2.0 and out[("a", 0.9)] == 10.0
    assert out[("b", 0.5)] == 7.0 and out[("b", 0.9)] == 7.0
    import pytest as _pt
    with _pt.raises(ValueError, match="grouping keys"):
        grouped_weighted_quantiles(df, [], "v", "w", [0.5])
    with _pt.raises(ValueError, match="at least one"):
        grouped_weighted_quantiles(df, ["g"], "v", "w", [])
    with _pt.raises(ValueError, match="in \\(0, 1\\]"):
        grouped_weighted_quantiles(df, ["g"], "v", "w", [1.5])


def test_grouped_weighted_quantiles_matches_explode(spark):
    """The census form must equal the naive explode-the-weights
    percentile (lower convention) on integer weights."""
    from tablite_spark.operators.stats import grouped_weighted_quantiles
    rows = [("g%d" % (i % 3), float((i * 7) % 11), 1 + i % 4)
            for i in range(120)]
    df = spark.createDataFrame(rows, "g string, v double, w int")
    got = {(r["g"], r["q"]): r["value"] for r in
           grouped_weighted_quantiles(
               df, ["g"], "v", "w", [0.25, 0.5, 0.75]).collect()}
    # naive truth on the driver
    from collections import defaultdict
    series = defaultdict(list)
    for g, v, w in rows:
        series[g].extend([v] * w)
    for g, vals in series.items():
        vals.sort()
        n = len(vals)
        for q in (0.25, 0.5, 0.75):
            # smallest value with cum count >= q*n
            import math as _m
            idx = _m.ceil(q * n) - 1
            assert got[(g, q)] == vals[idx], (g, q)


# ------------------------------------------------------------------
# event-time-timeout sessionizer
# ------------------------------------------------------------------

def test_streaming_session_timeout_paths(spark, tmp_path):
    """The two emission paths must split exactly: an interior
    session (superseded by a later same-key event past the gap)
    emits on the DATA path even with no watermark movement, while a
    trailing session emits ONLY when the event-time timeout fires —
    a drain without sentinel batches must not contain it, and a
    drain with them must."""
    from tablite_spark.streaming.ops import streaming_session_timeout
    rows0 = [(1, "2024-01-01 10:00:00", "view"),
             (1, "2024-01-01 10:10:00", "purchase"),
             (1, "2024-01-01 11:00:00", "view"),   # 50 min gap
             (2, "2024-01-01 10:00:00", "view")]
    sent = [(99, "2024-03-0%d 00:00:00" % (d + 1), "view")
            for d in range(2)]

    def drain(batches, name):
        src = str(tmp_path / name)
        for rows in batches:
            (spark.createDataFrame(
                rows, "user_id long, ts string, event_type string")
             .withColumn("ts", F.to_timestamp("ts"))
             .coalesce(1).write.mode("append").parquet(src))
            time.sleep(1.1)
        stream = (spark.readStream
                  .schema("user_id long, ts timestamp, "
                          "event_type string")
                  .option("maxFilesPerTrigger", 1)
                  .option("latestFirst", "false").parquet(src))
        q = (streaming_session_timeout(stream)
             .writeStream.format("memory").queryName(name)
             .outputMode("append")
             .option("checkpointLocation", str(tmp_path / ("c" + name)))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        return {(r["user_id"], str(r["session_start"]),
                 r["n_events"], r["purchased"])
                for r in spark.sql(f"SELECT * FROM {name}").collect()
                if r["user_id"] != 99}   # sentinel user

    # no sentinels: only u1's INTERIOR session can emit (data path)
    got = drain([rows0], "st_nosent")
    assert got == {(1, "2024-01-01 10:00:00", 2, True)}
    # sentinels advance the watermark -> trailing sessions time out
    got2 = drain([rows0, [sent[0]], [sent[1]]], "st_sent")
    assert got2 == {
        (1, "2024-01-01 10:00:00", 2, True),
        (1, "2024-01-01 11:00:00", 1, False),   # abandoned
        (2, "2024-01-01 10:00:00", 1, False),
    }


# ------------------------------------------------------------------
# triangle_count
# ------------------------------------------------------------------

def test_triangle_count_hand(spark):
    """K4 has 4 triangles, 6 edges, 12 wedges, transitivity 1;
    adding a pendant node adds a wedge-only path; directed dups and
    self-loops canonicalize away."""
    from tablite_spark.pipeline.graph import triangle_count
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    noisy = k4 + [(b, a) for a, b in k4] + [(2, 2), (3, 4)]
    df = spark.createDataFrame(noisy, "src long, dst long")
    r = triangle_count(df, "src", "dst").collect()[0]
    assert (r["n_nodes"], r["n_edges"], r["n_triangles"]) \
        == (5, 7, 4)
    # degrees: 3,3,3,4,1 -> wedges 3+3+3+6+0 = 15
    assert r["n_wedges"] == 15
    assert abs(r["clustering"] - 12 / 15) < 1e-12
    # triangle-free star: 0 triangles, wedges from the hub
    star = spark.createDataFrame([(0, i) for i in range(1, 5)],
                                 "src long, dst long")
    r2 = triangle_count(star, "src", "dst").collect()[0]
    assert r2["n_triangles"] == 0 and r2["n_wedges"] == 6
    assert r2["clustering"] == 0.0


def test_triangle_count_matches_naive(spark):
    """Degree-ordered count equals the naive driver-side census on a
    pseudo-random graph."""
    from itertools import combinations

    from tablite_spark.pipeline.graph import triangle_count
    edges = sorted({(min((i * 7) % 30, (i * 13 + 5) % 30),
                     max((i * 7) % 30, (i * 13 + 5) % 30))
                    for i in range(200)} - {(i, i) for i in range(30)})
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    want = sum(1 for a, b, c in combinations(sorted(adj), 3)
               if b in adj[a] and c in adj[a] and c in adj[b])
    df = spark.createDataFrame(edges, "src long, dst long")
    r = triangle_count(df, "src", "dst").collect()[0]
    assert r["n_triangles"] == want
    assert r["n_edges"] == len(edges)


# ------------------------------------------------------------------
# incremental matview sink
# ------------------------------------------------------------------

def test_incremental_matview_replay_converges(spark, tmp_path):
    """The served view equals the full batch aggregate after a
    forced batch-0 replay (commit marker deleted between drains) —
    the per-batch partial overwrite makes the replay idempotent and
    the compaction is a pure function of the partials."""
    import os

    from tablite_spark.streaming.ops import incremental_matview_sink
    src = str(tmp_path / "src")
    b0 = [("a", 1), ("a", 2), ("b", 10)]
    b1 = [("a", 4), ("c", 7)]
    (spark.createDataFrame(b0, "k string, v long")
     .coalesce(1).write.mode("append").parquet(src))

    def run():
        stream = (spark.readStream.schema("k string, v long")
                  .option("maxFilesPerTrigger", 1).parquet(src))
        q = incremental_matview_sink(
            stream, ["k"], "v", str(tmp_path / "mv"),
            str(tmp_path / "ckpt"))
        q.awaitTermination(120)

    run()
    got0 = {r["k"]: (r["n"], r["s"]) for r in spark.read.parquet(
        str(tmp_path / "mv" / "serve")).collect()}
    assert got0 == {"a": (2, 3), "b": (1, 10)}
    os.remove(str(tmp_path / "ckpt" / "commits" / "0"))
    crc = str(tmp_path / "ckpt" / "commits" / ".0.crc")
    if os.path.exists(crc):
        os.remove(crc)
    time.sleep(1.1)
    (spark.createDataFrame(b1, "k string, v long")
     .coalesce(1).write.mode("append").parquet(src))
    run()
    got = {r["k"]: (r["n"], r["s"]) for r in spark.read.parquet(
        str(tmp_path / "mv" / "serve")).collect()}
    assert got == {"a": (3, 7), "b": (1, 10), "c": (1, 7)}
