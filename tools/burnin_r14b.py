"""Round-14 second-wave scale burn-ins (the fourteenth-wave ops).
Run manually: ``python tools/burnin_r14b.py [name]`` with name in
{skyline_50m, grid_10m, hll_100m, bfs_10m} (default: all). Results
are transcribed into PLANS.md.

Contract boundaries exercised:

- **skyline_50m**: the census-prefix frontier at 50M points with a
  1M-value x-census — verified against a DIFFERENT algorithm
  (driver-side pandas cummin over the collected census, which is
  exactly the bounded frontier-input relation) plus antichain and
  extreme-point invariants.
- **grid_10m**: the 9-neighbor cell join at 10M x 1M points —
  completeness verified against a brute-force broadcast cross join
  for a 1k-left sample (any cell-hop miss shows up as a count
  diff), with a deliberately HOT cell (100k right points in one
  cell) so the skew shape is exercised, not assumed.
- **hll_100m**: the register census at 100M rows / ~10M distinct
  keys x 4 groups — the shuffle is bounded at groups x 1024 rows
  (asserted), the estimate lands within 5% of the exact distinct
  (3-sigma at m=1024 is ~9.7%).
- **bfs_10m**: frontier BFS on a 10M-edge random graph over 1M
  nodes from 1k seeds — correctness characterized DISTRIBUTED by
  the layer conditions (seeds at 0; every edge's endpoint distances
  differ by <= 1; no unreached node borders a node at < max_hops),
  which together pin BFS layers without a driver-side traversal.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tablite_spark import get_spark


def _loadavg() -> str:
    return ", ".join(f"{x:.1f}" for x in os.getloadavg())


def skyline_50m():
    from tablite_spark.operators.skyline import skyline_2d
    spark = get_spark("burnin_skyline50m")
    n = 50_000_000
    # anti-correlated axes (y falls as x rises, plus hash jitter) so
    # the frontier is a THICK diagonal band — the first draft used
    # two independent moduli and a near-origin point collapsed the
    # frontier to ONE row, a near-vacuous pass of the prefix engine
    pts = spark.range(n).select(
        (F.col("id") * 2654435761 % 1_000_000).alias("x"))
    pts = pts.select(
        "x", (1_000_000 - F.col("x")
              + F.pmod(F.xxhash64("x"), F.lit(20_000))).alias("y"))
    t0 = time.time()
    sky = skyline_2d(pts, "x", "y")
    got = sorted((r["x"], r["y"]) for r in sky.collect())
    dt = time.time() - t0
    # truth via a different algorithm: pandas cummin over the
    # collected census (bounded at |distinct x| <= 1M rows)
    import pandas as pd
    cen = (pts.groupBy("x").agg(F.min("y").alias("y"))
           .toPandas().sort_values("x").reset_index(drop=True))
    pm = cen["y"].cummin().shift(1)
    truth = cen[pm.isna() | (pm > cen["y"])]
    truth_set = sorted(zip(truth["x"].tolist(), truth["y"].tolist()))
    assert got == truth_set, (len(got), len(truth_set))
    # antichain: strictly increasing x => strictly decreasing y
    ys = [y for (_, y) in got]
    assert all(a > b for a, b in zip(ys, ys[1:]))
    print(f"skyline_50m: {n/1e6:.0f}M pts -> {len(got)} frontier "
          f"points in {dt:.1f}s, matches census-cummin truth "
          f"(loadavg {_loadavg()})")
    spark.stop()


def grid_10m():
    from tablite_spark.operators.spatial import grid_radius_join
    spark = get_spark("burnin_grid10m")
    nl, nr, r = 10_000_000, 1_000_000, 500
    left = spark.range(nl).select(
        F.col("id").alias("lid"),
        (F.col("id") * 2654435761 % 1_000_000).alias("x"),
        (F.col("id") * 40503 % 1_000_000).alias("y"))
    # right side with a HOT cell: the last 100k points all land in
    # the cell at (1000, 1000) -- a dense city block
    right = spark.range(nr).select(
        F.col("id").alias("rid"),
        F.when(F.col("id") >= nr - 100_000,
               500_000 + F.col("id") % 400)
        .otherwise(F.col("id") * 7919 % 1_000_000).alias("x"),
        F.when(F.col("id") >= nr - 100_000,
               500_000 + (F.col("id") * 13) % 400)
        .otherwise(F.col("id") * 104729 % 1_000_000).alias("y"))
    t0 = time.time()
    pairs = grid_radius_join(left, right, r)
    n_pairs = pairs.count()
    dt = time.time() - t0
    # completeness: brute-force truth for a 1k-left sample
    samp = left.filter(F.col("lid") % 9973 == 0)
    n_samp = samp.count()
    brute = (F.broadcast(samp.select(F.col("lid").alias("blid"),
                                     F.col("x").alias("bx"),
                                     F.col("y").alias("by")))
             .crossJoin(right)
             .filter((F.col("bx") - F.col("x"))
                     * (F.col("bx") - F.col("x"))
                     + (F.col("by") - F.col("y"))
                     * (F.col("by") - F.col("y")) <= r * r)
             .count())
    grid_samp = (pairs.join(samp.select(F.col("lid").alias("lid_l"))
                            .distinct(), "lid_l").count())
    assert grid_samp == brute, (grid_samp, brute)
    print(f"grid_10m: {nl/1e6:.0f}M x {nr/1e6:.0f}M r={r} -> "
          f"{n_pairs} pairs in {dt:.1f}s; {n_samp}-left brute-force "
          f"slice agrees exactly ({brute} pairs), hot cell included "
          f"(loadavg {_loadavg()})")
    spark.stop()


def hll_100m():
    from tablite_spark.functions.sketches import (hll_estimate,
                                                  hll_register_census)
    spark = get_spark("burnin_hll100m")
    n = 100_000_000
    df = spark.range(n).select(
        (F.col("id") % 4).cast("string").alias("g"),
        (F.col("id") * 2654435761 % 10_000_000).alias("k"))
    t0 = time.time()
    cen = hll_register_census(df, "k", ["g"])
    n_cen = cen.count()
    est = {r["g"]: r["hll_estimate"]
           for r in hll_estimate(cen, ["g"]).collect()}
    dt = time.time() - t0
    assert n_cen <= 4 * 1024, n_cen  # the bounded-shuffle claim
    exact = {r["g"]: r["d"] for r in
             df.groupBy("g").agg(F.countDistinct("k").alias("d"))
             .collect()}
    errs = {g: abs(est[g] / exact[g] - 1) for g in exact}
    assert all(e < 0.05 for e in errs.values()), errs
    print(f"hll_100m: {n/1e6:.0f}M rows -> {n_cen} census rows "
          f"(bounded at 4x1024) in {dt:.1f}s; errors "
          f"{ {g: round(e * 100, 2) for g, e in sorted(errs.items())} }% "
          f"vs exact (loadavg {_loadavg()})")
    spark.stop()


def bfs_10m():
    from tablite_spark.pipeline.graph import bfs_hops
    spark = get_spark("burnin_bfs10m")
    ne, nn, mh = 10_000_000, 1_000_000, 3
    # independent hashed endpoints (avg degree ~20) — the first
    # draft's two-moduli generator made dst a FUNCTION of src
    # (1M times 1M == 0 mod 1M), i.e. a union of 2-regular cycles
    # with 9M duplicate edges; xxhash64 with distinct salts gives a
    # genuine sparse random graph
    edges = spark.range(ne).select(
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(nn)).alias("src"),
        F.pmod(F.xxhash64("id", F.lit(2)), F.lit(nn)).alias("dst")) \
        .filter(F.col("src") != F.col("dst"))
    seeds = spark.range(1000).select(
        (F.col("id") * 104729 % nn).alias("node"))
    t0 = time.time()
    dist = bfs_hops(edges, seeds, "src", "dst", max_hops=mh)
    dist = dist.localCheckpoint()
    layers = {r["hops"]: r["c"] for r in
              dist.groupBy("hops").agg(F.count(F.lit(1)).alias("c"))
              .collect()}
    dt = time.time() - t0
    # layer conditions, fully distributed:
    # (1) hops-0 set == distinct seed set
    s0 = dist.filter(F.col("hops") == 0).select("node")
    assert s0.join(seeds.distinct(), "node", "left_anti").isEmpty()
    assert seeds.distinct().join(s0, "node", "left_anti").isEmpty()
    und = (edges.select(F.col("src").alias("a"),
                        F.col("dst").alias("b"))
           .unionByName(edges.select(F.col("dst").alias("a"),
                                     F.col("src").alias("b"))))
    da = dist.select(F.col("node").alias("a"),
                     F.col("hops").alias("ha"))
    db = dist.select(F.col("node").alias("b"),
                     F.col("hops").alias("hb"))
    both = und.join(da, "a").join(db, "b")
    # (2) adjacent reached nodes differ by <= 1 hop
    assert both.filter(F.abs(F.col("ha") - F.col("hb")) > 1).isEmpty()
    # (3) no UNreached node borders a node at < max_hops (else BFS
    # would have reached it)
    unreached_adj = (und.join(da, "a")
                     .filter(F.col("ha") < mh)
                     .join(db, "b", "left_anti"))
    assert unreached_adj.isEmpty()
    print(f"bfs_10m: {ne/1e6:.0f}M edges / {nn/1e6:.0f}M nodes, 1k "
          f"seeds, layers {dict(sorted(layers.items()))} in "
          f"{dt:.1f}s; layer conditions pass (loadavg {_loadavg()})")
    spark.stop()


ALL = {"skyline_50m": skyline_50m, "grid_10m": grid_10m,
       "hll_100m": hll_100m, "bfs_10m": bfs_10m}

if __name__ == "__main__":
    names = sys.argv[1:] or list(ALL)
    for nm in names:
        ALL[nm]()
