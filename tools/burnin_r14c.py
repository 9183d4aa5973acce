"""Round-14 third-wave scale burn-ins (the sixteenth/seventeenth-
wave ops). Run manually: ``python tools/burnin_r14c.py [name]``
with name in {kcore_10m, dbscan_1m, cms_100m, hyperball_10m}
(default: all). Results are transcribed into PLANS.md.

Contract boundaries exercised:

- **kcore_10m**: simultaneous peeling on a 10M-edge random graph
  whose Poisson degree tail forces a REAL multi-round cascade at
  k = mean degree; the fixpoint is verified structurally (every
  surviving node's in-core degree >= k, recomputed independently)
  and against the unraveling invariant (re-peeling the returned
  core removes nobody).
- **dbscan_1m**: 1M points at sub-percolation density through the
  cell-join + CC pipeline; role census sanity plus an exact
  brute-force check of a 1k-point sample's roles.
- **cms_100m**: the 4x1024-cell census at 100M rows — bounded-state
  assertion plus the one-sided guarantee (est >= exact for every
  probed key) and a measured overestimate rate under real
  collisions (10M distinct keys >> w, so collisions are massive).
- **hyperball_10m**: ball sketches over a 10M-edge expander; state
  bounded at 64 rows/node (asserted), N(h) strictly increasing and
  within HLL error of n^2 at saturation (an expander's 3-ball is
  nearly everything).
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


def _rand_edges(spark, ne, nn):
    return (spark.range(ne).select(
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(nn)).alias("src"),
        F.pmod(F.xxhash64("id", F.lit(2)), F.lit(nn)).alias("dst"))
        .filter(F.col("src") != F.col("dst")))


def kcore_10m():
    from tablite_spark.pipeline.graph import k_core
    spark = get_spark("burnin_kcore10m")
    # mean degree ~20; k must sit BELOW the k-core emergence
    # threshold for a Poisson graph (c_k ~ k + sqrt(k ln k): ~27.7
    # for k=20, so the first draft's k=20 unraveled to an EMPTY core
    # — vacuous; k=12 thresholds at ~17.5 < 20 and keeps a giant
    # core while still forcing a real cascade)
    ne, nn, k = 10_000_000, 1_000_000, 12
    edges = _rand_edges(spark, ne, nn)
    t0 = time.time()
    core = k_core(edges, "src", "dst", k=k).localCheckpoint()
    n_core = core.count()
    dt = time.time() - t0
    # structural fixpoint check, recomputed independently of k_core:
    # in-core degrees of the returned node set
    und = (edges.select("src", "dst")
           .unionByName(edges.select(F.col("dst").alias("src"),
                                     F.col("src").alias("dst")))
           .distinct())
    nodes = core.select(F.col("node"))
    deg = (und.join(nodes.select(F.col("node").alias("src")), "src")
           .join(nodes.select(F.col("node").alias("dst")), "dst")
           .groupBy(F.col("src").alias("node"))
           .agg(F.count(F.lit(1)).alias("d")))
    assert n_core > 0, "vacuous: empty core proves nothing"
    bad = deg.filter(F.col("d") < k).count()
    under = nodes.join(deg, "node", "left_anti").count()
    assert bad == 0 and under == 0, (bad, under)
    # degrees reported by k_core match the recomputation
    mism = (core.join(deg, "node")
            .filter(F.col("core_degree") != F.col("d")).count())
    assert mism == 0, mism
    print(f"kcore_10m: 10M edges / 1M nodes, k={k} -> {n_core} core "
          f"nodes in {dt:.1f}s; independent fixpoint recheck passes "
          f"(loadavg {_loadavg()})")
    spark.stop()


def dbscan_1m():
    from tablite_spark.pipeline.clustering import dbscan_grid
    spark = get_spark("burnin_dbscan1m")
    n, lat, eps, minp = 1_000_000, 4_000_000, 2200, 3
    pts = spark.range(n).select(
        F.col("id").alias("pid"),
        F.pmod(F.xxhash64("id", F.lit(3)), F.lit(lat)).alias("x"),
        F.pmod(F.xxhash64("id", F.lit(4)), F.lit(lat)).alias("y"))
    t0 = time.time()
    out = dbscan_grid(pts, "pid", "x", "y",
                      eps=eps, min_pts=minp).localCheckpoint()
    roles = {r["role"]: r["c"] for r in
             out.groupBy("role").agg(F.count(F.lit(1)).alias("c"))
             .collect()}
    dt = time.time() - t0
    assert set(roles) == {"core", "border", "noise"}, roles
    # exact role check for a sample: brute-force neighbor counts
    samp = pts.filter(F.col("pid") % 997 == 0)
    cnt = (F.broadcast(samp.select(F.col("pid").alias("sid"),
                                   F.col("x").alias("sx"),
                                   F.col("y").alias("sy")))
           .crossJoin(pts)
           .filter((F.col("sx") - F.col("x"))
                   * (F.col("sx") - F.col("x"))
                   + (F.col("sy") - F.col("y"))
                   * (F.col("sy") - F.col("y")) <= eps * eps)
           .groupBy("sid").agg(F.count(F.lit(1)).alias("nb")))
    truth_core = cnt.filter(F.col("nb") >= minp) \
                    .select(F.col("sid").alias("pid"))
    got_core = (out.filter(F.col("role") == "core")
                .join(samp.select("pid"), "pid").select("pid"))
    d1 = truth_core.join(got_core, "pid", "left_anti").count()
    d2 = got_core.join(truth_core, "pid", "left_anti").count()
    assert d1 == 0 and d2 == 0, (d1, d2)
    print(f"dbscan_1m: 1M pts eps={eps} minPts={minp} -> "
          f"{roles} in {dt:.1f}s; 1k-sample brute-force core roles "
          f"agree exactly (loadavg {_loadavg()})")
    spark.stop()


def cms_100m():
    from tablite_spark.functions.sketches import (cms_census,
                                                  cms_point_estimates)
    spark = get_spark("burnin_cms100m")
    n = 100_000_000
    df = spark.range(n).select(
        (F.col("id") * 2654435761 % 10_000_000).cast("string")
        .alias("k"))
    t0 = time.time()
    cen = cms_census(df, "k").localCheckpoint()
    n_cells = cen.count()
    dt = time.time() - t0
    assert n_cells <= 4 * 1024, n_cells
    probes = df.limit(2000).distinct()
    est = cms_point_estimates(cen, probes, "k")
    exact = (df.join(F.broadcast(probes), "k")
             .groupBy("k").agg(F.count(F.lit(1)).alias("n")))
    j = est.join(exact, "k").localCheckpoint()
    viol = j.filter(F.col("cms_est") < F.col("n")).count()
    n_probe = j.count()
    over = j.filter(F.col("cms_est") > F.col("n")).count()
    assert viol == 0, viol
    assert over > 0  # 10M keys over 1024 cells MUST collide
    print(f"cms_100m: 100M rows / 10M keys -> {n_cells} cells in "
          f"{dt:.1f}s; {n_probe} probes all est>=exact, {over} "
          f"overestimates (collisions real) (loadavg {_loadavg()})")
    spark.stop()


def hyperball_10m():
    from tablite_spark.pipeline.graph import hyperball
    spark = get_spark("burnin_hyperball10m")
    ne, nn = 10_000_000, 200_000  # mean degree ~100
    edges = _rand_edges(spark, ne, nn)
    # exact N(1) for the accuracy gate: sum over nodes of (1 + deg)
    # = n + 2 * |distinct undirected edges| (the first draft instead
    # asserted 2-ball saturation at n^2 — wrong arithmetic: a
    # degree-100 2-ball is ~1+d+d^2 ~ 10k of 200k nodes, ~5% of n^2,
    # which is exactly what the run measured)
    und = (edges.select("src", "dst")
           .unionByName(edges.select(F.col("dst").alias("src"),
                                     F.col("src").alias("dst")))
           .distinct())
    n_nodes = und.select("src").distinct().count()
    n_und = und.count()          # both orientations
    exact_n1 = n_nodes + n_und
    t0 = time.time()
    nf = dict(hyperball(edges, "src", "dst", max_h=2))
    dt = time.time() - t0
    assert nf[0] < nf[1] < nf[2], nf
    err1 = nf[1] / 1e6 / exact_n1 - 1
    assert abs(err1) < 0.15, (nf[1], exact_n1)
    # h=2 plausibility: E|ball(2)| ~ 1 + d + d^2 for a sparse
    # Poisson graph (collision terms are O(d^3/n), ~5% here)
    dbar = n_und / n_nodes
    pred2 = n_nodes * (1 + dbar + dbar * dbar)
    ratio2 = nf[2] / 1e6 / pred2
    assert 0.7 < ratio2 < 1.2, ratio2
    print(f"hyperball_10m: 10M edges / {n_nodes} nodes -> N(h) "
          f"{ {h: round(v / 1e6) for h, v in sorted(nf.items())} } "
          f"in {dt:.1f}s; N(1) err {err1 * 100:+.1f}% vs exact "
          f"{exact_n1}, N(2) {ratio2:.2f}x the 1+d+d^2 prediction "
          f"(loadavg {_loadavg()})")
    spark.stop()


ALL = {"kcore_10m": kcore_10m, "dbscan_1m": dbscan_1m,
       "cms_100m": cms_100m, "hyperball_10m": hyperball_10m}

if __name__ == "__main__":
    names = sys.argv[1:] or list(ALL)
    for nm in names:
        ALL[nm]()
