"""Distributed PageRank — power iteration, Spark-first and exactly
replayable (the ``kmeans``/``logreg`` determinism discipline applied
to graphs).

Why a training-data engine ships PageRank: web-corpus curation uses
link-graph centrality as a document quality prior (public recipes:
Common Crawl's harmonic-centrality host ranking, OpenWebText's
karma thresholds) — "pages many pages point to" survive the gate,
isolated spam islands don't.

Semantics (standard damped PageRank over a MULTIGRAPH — parallel
edges each carry mass; ``outdeg`` = out-EDGE count):

    r_{t+1}(v) = base + dang_share
                 + floor(d · Σ_{u→v} floor(r_t(u) / outdeg(u)))

with all ranks in integer micro-units of ``unit`` (initial rank
``floor(unit / N)``), ``base = floor((1-d)·unit / N)`` and
``dang_share = floor(d · Σ_{dangling} r_t / N)`` — dangling mass is
redistributed uniformly, the textbook treatment. Every floor() is a
plain IEEE-double op identical in any engine, every sum is an exact
BIGINT sum, so the whole trajectory is bit-reproducible and the
``pagerank_lineitem`` oracle replays all iterations as unrolled
DuckDB CTEs. (Mass is not exactly conserved — each floor sheds
< 1 micro-unit — which is the price of engine-neutral exactness and
irrelevant at unit = 1e12.)

Plan shape per iteration (the industry-standard PageRank shape):
ONE edges ⋈ ranks join on src (edges can be pre-partitioned on src
once and reused every iteration), ONE combinable groupBy(dst), one
tiny scalar agg for dangling mass, and a ranks-rebuild join on the
node frame. State = the (node, outdeg, rank) frame, never the
corpus. Per-iteration results are localCheckpoint-pinned so the
lineage does not grow with ``iters`` (the connected-components
pattern).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tablite_spark.plans.lifecycle import unpersist_local_checkpoint

__all__ = ["pagerank", "triangle_count"]


def pagerank(edges: DataFrame, src_col: str, dst_col: str,
             iters: int = 5, damping: float = 0.85,
             unit: int = 10 ** 12) -> DataFrame:
    """Return (node, rank) in integer micro-units after ``iters``
    damped power iterations. Nodes = distinct(src ∪ dst)."""
    src = F.col(src_col).alias("node")
    dst = F.col(dst_col).alias("node")
    nodes = (edges.select(src).unionByName(edges.select(dst))
             .distinct())
    outdeg = edges.groupBy(src).agg(F.count(F.lit(1)).alias("outdeg"))
    base_nodes = (nodes.join(outdeg, "node", "left")
                  .select("node", F.coalesce("outdeg", F.lit(0))
                          .alias("outdeg"))
                  .localCheckpoint())
    n = base_nodes.count()
    if n == 0:
        return base_nodes.select("node", F.lit(0).alias("rank"))
    d = float(damping)
    base = math.floor((1.0 - d) * unit / n)
    ranks = base_nodes.withColumn(
        "rank", F.lit(int(math.floor(unit / n))).cast("long"))
    e = edges.select(F.col(src_col).alias("src"),
                     F.col(dst_col).alias("dst"))
    prev_ckpt: DataFrame | None = None  # last iteration's checkpoint
    for _ in range(iters):
        dang = ranks.filter(F.col("outdeg") == 0) \
                    .agg(F.sum("rank")).first()[0] or 0
        dang_share = math.floor(d * dang / n)
        per_edge = ranks.filter(F.col("outdeg") > 0).select(
            F.col("node").alias("src"),
            F.floor(F.col("rank") / F.col("outdeg")).cast("long")
            .alias("c"))
        contribs = (e.join(per_edge, "src")
                    .groupBy(F.col("dst").alias("node"))
                    .agg(F.sum("c").alias("s")))
        ranks = (base_nodes.join(contribs, "node", "left")
                 .select("node", "outdeg",
                         (F.lit(base + dang_share)
                          + F.floor(F.lit(d)
                                    * F.coalesce(F.col("s"), F.lit(0))
                                    .cast("double")).cast("long"))
                         .alias("rank"))
                 .localCheckpoint())  # eager: materialized here
        # the new checkpoint no longer references the previous one's
        # blocks — free them DETERMINISTICALLY, or one copy of the
        # rank state stays pinned in executor storage per iteration
        # (DataFrame.unpersist is a silent no-op on checkpointed
        # frames; see plans.lifecycle)
        if prev_ckpt is not None:
            unpersist_local_checkpoint(prev_ckpt)
        prev_ckpt = ranks
    if iters > 0:
        # the final ranks checkpoint is self-contained; base_nodes'
        # blocks are no longer reachable from it (iters=0 returns the
        # initial frame, which still reads base_nodes' blocks)
        unpersist_local_checkpoint(base_nodes)
    return ranks.select("node", "rank")


def triangle_count(edges: DataFrame, src_col: str,
                   dst_col: str) -> DataFrame:
    """Exact triangle census of an undirected simple graph: ONE row
    (n_nodes, n_edges, n_triangles, n_wedges, clustering) where
    ``clustering`` is the global (transitivity) coefficient
    3·triangles / wedges and wedges = Σ deg·(deg−1)/2. Input edges
    may be directed/duplicated — they canonicalize to distinct
    undirected pairs first; self-loops drop.

    Scale shape — the standard degree-ordered orientation: each
    undirected edge points from its LOWER-(degree, id) endpoint to
    the higher, so every node's out-degree is O(sqrt(|E|)) on any
    graph (a hub's edges mostly point INTO it) and the wedge
    self-join fans out by out-degree, never raw degree — the
    classic MapReduce triangle-counting bound. The wedge→edge probe
    is one more equi-join; wedges/degrees are combinable censuses.
    Every count is an exact BIGINT; the one division rounds at the
    caller's boundary.
    """
    a, b = F.col(src_col), F.col(dst_col)
    und = (edges.filter(a.isNotNull() & b.isNotNull() & (a != b))
           .select(F.least(a, b).alias("u"),
                   F.greatest(a, b).alias("v"))
           .distinct())
    deg = (und.select(F.col("u").alias("n"))
           .unionAll(und.select(F.col("v").alias("n")))
           .groupBy("n").agg(F.count(F.lit(1)).alias("d")))
    # orient each edge low-(degree, id) -> high-(degree, id)
    du = deg.select(F.col("n").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("n").alias("v"), F.col("d").alias("dv"))
    e = und.join(du, "u").join(dv, "v")
    lo_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v")))
    ori = e.select(
        F.when(lo_first, F.col("u")).otherwise(F.col("v"))
        .alias("s"),
        F.when(lo_first, F.col("v")).otherwise(F.col("u"))
        .alias("t"))
    # wedges at the low endpoint: (s -> t1), (s -> t2), t1 < t2;
    # a triangle exists iff (t1, t2) is an edge in EITHER orientation
    w1 = ori.select(F.col("s"), F.col("t").alias("t1"))
    w2 = ori.select(F.col("s"), F.col("t").alias("t2"))
    wedges = (w1.join(w2, "s")
              .filter(F.col("t1") < F.col("t2")))
    probe = ori.select(F.col("s").alias("t1"),
                       F.col("t").alias("t2")).unionAll(
        ori.select(F.col("t").alias("t1"), F.col("s").alias("t2")))
    tri = wedges.join(probe, ["t1", "t2"]).agg(
        F.count(F.lit(1)).alias("n_triangles"))
    stats = (deg.agg(F.count(F.lit(1)).alias("n_nodes"),
                     F.sum(F.col("d") * (F.col("d") - 1) / 2)
                     .cast("long").alias("n_wedges")))
    nedges = und.agg(F.count(F.lit(1)).alias("n_edges"))
    return (stats.crossJoin(F.broadcast(nedges))
            .crossJoin(F.broadcast(tri))
            .select("n_nodes", "n_edges", "n_triangles", "n_wedges",
                    F.when(F.col("n_wedges") > 0,
                           3.0 * F.col("n_triangles")
                           / F.col("n_wedges"))
                    .alias("clustering")))
